"""One-time converter: reference golden outputs -> committed parquet.

Reads the PUBLIC golden artifacts of the reference repo
(/root/reference/data/output/spec/*) and rewrites them as parquet under
rca_pdf_extraction_pipeline_spark/golden/ so this repo is standalone.
Run once at build time; the parquet files are committed.

  golden_table_rows.parquet          138 rows x 13 string cols (row_idx + 12 cells)
  golden_page_classification.parquet 253 rows (page:int, page_type:str)
"""

from __future__ import annotations

import csv
import json
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

REF = Path("/root/reference/data/output/spec")
OUT = Path(__file__).resolve().parent.parent / "rca_pdf_extraction_pipeline_spark" / "golden"

CANONICAL = [
    "core_number", "sample_number", "depth_feet",
    "permeability_air_md", "permeability_klink_md",
    "porosity_ambient_pct", "porosity_ncs_pct", "grain_density_gcc",
    "saturation_water_pct", "saturation_oil_pct", "saturation_total_pct",
    "page_number",
]


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)

    with open(REF / "full_table_extraction.csv", encoding="utf-8-sig", newline="") as f:
        rows = list(csv.reader(f))
    header, data = rows[0], rows[1:]
    assert len(header) == 12 and len(data) == 138, (len(header), len(data))
    cols = {"row_idx": pa.array(range(len(data)), type=pa.int32())}
    for i, name in enumerate(CANONICAL):
        cols[name] = pa.array([r[i] for r in data], type=pa.string())
    pq.write_table(pa.table(cols), OUT / "golden_table_rows.parquet")

    cls = json.load(open(REF / "page_classification.json"))
    pages = sorted(int(k.split("_")[1]) for k in cls)
    t = pa.table(
        {
            "page": pa.array(pages, type=pa.int32()),
            "page_type": pa.array([cls[f"page_{p}"] for p in pages], type=pa.string()),
        }
    )
    pq.write_table(t, OUT / "golden_page_classification.parquet")
    print("wrote", list(OUT.iterdir()))


if __name__ == "__main__":
    main()


def make_extracted_spans() -> None:
    """golden_extracted_spans.parquet — the expected output span rows of
    the flagship query (golden doc + parser-branch docs), derived from
    the committed golden tables via the fixture inverters. Regenerable:
    ``python tools/make_golden.py`` rewrites all three parquets."""
    import sys

    sys.path.insert(0, str(OUT.parent.parent))
    import pandas as pd

    from rca_pdf_extraction_pipeline_spark.sources import fixtures

    docs = [fixtures.expected_golden_output()] + [
        fixtures.expected_branch_output(d)
        for d in ["parse-normal", "parse-plus", "parse-detect",
                  "parse-star", "parse-fracture", "parse-toolong",
                  "media-nosample"]]
    rows = [
        (d["doc_id"], s["kind"], s["text"], s["media_ref"], s["offset"])
        for d in docs for s in d["spans"]
    ]
    df = pd.DataFrame(rows, columns=["doc_id", "kind", "text", "media_ref",
                                     "offset"])
    df["offset"] = df["offset"].astype("int32")
    df.to_parquet(OUT / "golden_extracted_spans.parquet", index=False)
    print(f"wrote {OUT / 'golden_extracted_spans.parquet'} ({len(df)} rows)")


if __name__ == "__main__":
    make_extracted_spans()

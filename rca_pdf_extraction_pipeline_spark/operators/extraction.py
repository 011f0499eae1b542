"""The extraction pipeline: docs(doc_id, spans) -> extracted(doc_id, spans).

Spark restatement of the reference's entire query lifecycle
(core_analysis.py:399-421 — classify -> filter table pages -> header
flatten/verify -> segment -> decode -> sink), as ONE narrow ``mapInPandas``
stage: documents are self-contained, so there are no joins and no shuffles
in the logic itself.  The only shuffle is the deliberate skew-defusing
repartition (operators/skew.py) applied by callers before this stage.

Inside the stage everything is batch-columnar:
  * span payload parsing    — pandas str ops
  * C1 classification       — kernels.classify.classify_pages_keyword
  * F4 data-block argmax    — pandas groupby idxmax on content length
  * H1 header flatten       — kernels.headers.flatten_headers
  * P1/P2 sample decode     — kernels.samples.parse_blocks (numpy gathers)
  * output ordering         — computed per doc from (page, row, col) ranks,
    never from partition order (SURVEY.md §7.4.2)

Scale notes (100 TB design):
  * one Arrow round trip per task; spans never leave columnar form except
    the final per-doc list assembly;
  * per-batch memory is bounded by ``spark.sql.execution.arrow.
    maxRecordsPerBatch`` (set low — docs are wide rows);
  * nested-column pruning: the pipeline reads only (doc_id, spans), so
    parquet scans prune every other column; predicate pushdown on doc_id
    works for resume (plans/checkpoint.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..config import (
    DEFAULT_CONFIG,
    GOLDEN_EXTRACTED_HEADERS,
    HEADER_Y_MAX,
    HEADER_Y_MIN,
    RE_DEPTH_ANYWHERE,
    ExtractionConfig,
)
from ..kernels import classify as kclassify
from ..kernels import headers as kheaders
from ..kernels import samples as ksamples

OUTPUT_SCHEMA = (
    "doc_id string, spans array<struct<kind:string, text:string, "
    "media_ref:string, offset:int>>"
)

CLASSIFICATION_SCHEMA = (
    "doc_id string, page int, page_type string, confidence double, reason string"
)

SAMPLES_SCHEMA = (
    "doc_id string, core_number string, sample_number string, depth_feet string, "
    "permeability_air_md string, permeability_klink_md string, "
    "porosity_ambient_pct string, porosity_ncs_pct string, "
    "grain_density_gcc string, saturation_water_pct string, "
    "saturation_oil_pct string, saturation_total_pct string, "
    "page_number int, row_idx int, "
    "depth_feet_f double, porosity_ambient_pct_f double"
)

HEADERS_SCHEMA = "doc_id string, page int, col int, header string"


def flatten_spans(pdf: pd.DataFrame) -> pd.DataFrame:
    """Explode one Arrow batch of (doc_id, spans) into a flat columnar frame
    with parsed payload geometry."""
    empty = pd.DataFrame(
        columns=["doc_id", "kind", "media_ref", "offset", "page",
                 "x0", "y0", "x1", "y1", "content"]
    )
    if len(pdf) == 0:
        return empty
    ex = pdf[["doc_id"]].copy()
    ex["spans"] = pdf["spans"]
    ex = ex.explode("spans", ignore_index=True)
    ex = ex[ex["spans"].notna()]
    if len(ex) == 0:
        return empty
    sp = pd.DataFrame(ex["spans"].tolist(), index=ex.index)
    flat = pd.DataFrame(
        {
            "doc_id": ex["doc_id"],
            "kind": sp["kind"].astype(str),
            "media_ref": sp["media_ref"],
            "offset": pd.to_numeric(sp["offset"], errors="coerce").fillna(0).astype(np.int64),
        }
    )
    payload = sp["text"].fillna("").astype(str)
    head_tail = payload.str.split("|", n=1, expand=True)
    if head_tail.shape[1] == 1:
        head_tail[1] = ""
    head = head_tail[0].fillna("")
    flat["content"] = head_tail[1].fillna("")
    geo = head.str.split(",", expand=True)
    for i in range(5):
        if i not in geo.columns:
            geo[i] = np.nan
    flat["page"] = pd.to_numeric(geo[0], errors="coerce").fillna(0).astype(np.int64)
    for name, col in zip(["x0", "y0", "x1", "y1"], [1, 2, 3, 4]):
        flat[name] = pd.to_numeric(geo[col], errors="coerce")
    return flat


def classify_flat(flat: pd.DataFrame) -> pd.DataFrame:
    """C1 per (doc_id, page): GROUP_CONCAT of text-span contents in reading
    order (A1; order fixed to (y0, x0, offset) for determinism,
    SURVEY.md §2.4 order caveat), then the keyword cascade."""
    text_spans = flat[flat["kind"] == "text"]
    if len(text_spans) == 0:
        return pd.DataFrame(columns=["doc_id", "page", "page_type",
                                     "confidence", "reason", "text"])
    ordered = text_spans.sort_values(
        ["doc_id", "page", "y0", "x0", "offset"], kind="stable", na_position="last"
    )
    page_text = (
        ordered.groupby(["doc_id", "page"], sort=True)["content"]
        .agg(" ".join)
        .reset_index()
        .rename(columns={"content": "text"})
    )
    cls = kclassify.classify_pages_keyword(page_text["text"])
    return pd.concat([page_text, cls], axis=1)


def _decode_table_pages(flat: pd.DataFrame, table_pages: pd.DataFrame) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Header flatten (H1) + sample decode (P1/P2) for classified table pages.

    Returns (samples_df, headers_df); samples carry (doc_id, page_number,
    row_idx, 11 cells), headers carry (doc_id, page, col, header).
    """
    if len(table_pages) == 0:
        empty_s = pd.DataFrame(columns=["doc_id", "page_number", "row_idx",
                                        *ksamples.SAMPLE_COLUMNS])
        return empty_s, pd.DataFrame(columns=["doc_id", "page", "col", "header"])

    tkey = table_pages[["doc_id", "page"]].copy()
    tflat = flat.merge(tkey, on=["doc_id", "page"], how="inner")
    text = tflat[tflat["kind"] == "text"].copy()

    # F4: data block = longest text span containing a depth pattern
    has_depth = text["content"].str.contains(RE_DEPTH_ANYWHERE, regex=True)
    cand = text[has_depth].copy()
    cand["clen"] = cand["content"].str.len()
    # first occurrence wins ties like the reference's strict '>' comparison
    cand = cand.sort_values(["doc_id", "page", "offset"], kind="stable")
    best_idx = cand.groupby(["doc_id", "page"], sort=True)["clen"].idxmax()
    blocks = cand.loc[best_idx, ["doc_id", "page", "content"]].reset_index(drop=True)
    blocks = blocks.sort_values(["doc_id", "page"], kind="stable").reset_index(drop=True)
    blocks["block_id"] = np.arange(len(blocks), dtype=np.int64)

    decoded = ksamples.parse_blocks(
        blocks.rename(columns={"content": "text"})[["block_id", "text"]]
    )
    decoded = decoded.merge(blocks[["block_id", "doc_id", "page"]], on="block_id")
    decoded = decoded.rename(columns={"page": "page_number"})
    decoded = decoded.sort_values(["doc_id", "page_number", "sample_id"], kind="stable")
    decoded["row_idx"] = decoded.groupby("doc_id").cumcount()

    # H1: header-band spans (F3 predicate y0 ∈ [170, 230])
    band = text[(text["y0"] >= HEADER_Y_MIN) & (text["y0"] <= HEADER_Y_MAX)].copy()
    band = band.sort_values(["doc_id", "page", "y0", "x0"], kind="stable")
    band["page_key"] = band.groupby(["doc_id", "page"], sort=True).ngroup()
    key_map = band[["page_key", "doc_id", "page"]].drop_duplicates()
    hdr = kheaders.flatten_headers(
        band.rename(columns={"content": "text"})[["page_key", "x0", "x1", "y0", "text"]]
    )
    hdr = hdr.merge(key_map, on="page_key").drop(columns=["page_key"])
    hdr = hdr[["doc_id", "page", "col", "header"]]
    return decoded, hdr


def _assemble_output(doc_ids: pd.Series, samples: pd.DataFrame,
                     flat: pd.DataFrame, table_pages: pd.DataFrame,
                     cfg: ExtractionConfig) -> pd.DataFrame:
    """Build the ordered output span sequence per document:
    header fields, then per table page row-major cells, then that page's
    image spans (media passthrough).  Offsets are per-doc ranks computed
    here — deterministic under any partitioning."""
    out_rows: dict[str, list[tuple]] = {d: [] for d in doc_ids}

    docs_with_tables = set(table_pages["doc_id"].unique()) if len(table_pages) else set()
    cell_cols = [*ksamples.SAMPLE_COLUMNS]

    if cfg.emit_header_fields:
        for d in docs_with_tables:
            for h in GOLDEN_EXTRACTED_HEADERS:
                out_rows[d].append(("field", h, None))

    if len(samples) > 0:
        media = flat[(flat["kind"] == "image")] if cfg.passthrough_media else flat.iloc[0:0]
        for (d, page), grp in samples.groupby(["doc_id", "page_number"], sort=True):
            grp = grp.sort_values("row_idx", kind="stable")
            cells = grp[cell_cols].to_numpy(dtype=object)
            pages = grp["page_number"].to_numpy()
            for r in range(cells.shape[0]):
                for v in cells[r]:
                    out_rows[d].append(("field", v, None))
                out_rows[d].append(("field", str(int(pages[r])), None))
            if cfg.passthrough_media:
                pmedia = media[(media["doc_id"] == d) & (media["page"] == page)]
                for _, m in pmedia.sort_values(["y0", "x0", "offset"]).iterrows():
                    out_rows[d].append(("image", "", m["media_ref"]))

    records = []
    for d in doc_ids:
        spans = [
            {"kind": k, "text": t, "media_ref": m, "offset": i}
            for i, (k, t, m) in enumerate(out_rows[d])
        ]
        records.append({"doc_id": d, "spans": spans})
    return pd.DataFrame(records, columns=["doc_id", "spans"])


def _extract_batch(pdf: pd.DataFrame, cfg: ExtractionConfig) -> dict:
    """Run the full pipeline on one Arrow batch; returns intermediates."""
    flat = flatten_spans(pdf)
    cls = classify_flat(flat)
    table_pages = cls[cls["page_type"] == "table"][["doc_id", "page"]]
    samples, headers = _decode_table_pages(flat, table_pages)
    return {"flat": flat, "cls": cls, "table_pages": table_pages,
            "samples": samples, "headers": headers}


def extract_documents(docs: DataFrame, cfg: ExtractionConfig = DEFAULT_CONFIG) -> DataFrame:
    """docs(doc_id, spans) -> extracted(doc_id, spans)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            r = _extract_batch(pdf, cfg)
            yield _assemble_output(pdf["doc_id"], r["samples"], r["flat"],
                                   r["table_pages"], cfg)

    return docs.mapInPandas(run, schema=OUTPUT_SCHEMA)


def classify_documents(docs: DataFrame) -> DataFrame:
    """docs -> (doc_id, page, page_type, confidence, reason) — C1 only."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cls = classify_flat(flatten_spans(pdf))
            if len(cls) == 0:
                continue
            out = cls[["doc_id", "page", "page_type", "confidence", "reason"]].copy()
            out["page"] = out["page"].astype("int32")
            yield out

    return docs.mapInPandas(run, schema=CLASSIFICATION_SCHEMA)


def extract_samples(docs: DataFrame, cfg: ExtractionConfig = DEFAULT_CONFIG) -> DataFrame:
    """docs -> flat decoded sample rows (the CSV-shaped relational view)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            r = _extract_batch(pdf, cfg)
            s = r["samples"]
            if len(s) == 0:
                continue
            out = s[["doc_id", *ksamples.SAMPLE_COLUMNS]].copy()
            out["page_number"] = s["page_number"].astype("int32")
            out["row_idx"] = s["row_idx"].astype("int32")
            out["depth_feet_f"] = s["depth_feet_f"]
            out["porosity_ambient_pct_f"] = s["porosity_ambient_pct_f"]
            yield out

    return docs.mapInPandas(run, schema=SAMPLES_SCHEMA)


def extract_headers(docs: DataFrame) -> DataFrame:
    """docs -> (doc_id, page, col, header) — H1 per table page."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            r = _extract_batch(pdf, DEFAULT_CONFIG)
            h = r["headers"]
            if len(h) == 0:
                continue
            out = h.copy()
            out["page"] = out["page"].astype("int32")
            out["col"] = out["col"].astype("int32")
            yield out

    return docs.mapInPandas(run, schema=HEADERS_SCHEMA)

"""spark-submit entry point for corpus curation — the training-data
cleaning pipeline over a documents table:

    spark-submit --py-files rca_pkg.zip \\
        rca_pdf_extraction_pipeline_spark/jobs/run_curation.py \\
        --input  <parquet dir of documents(doc_id, text, ...)> \\
        --output <curated parquet dir> \\
        [--langs en] [--min-quality 0.45] [--max-top2 0.35]
        [--max-dup5 0.35] [--no-near-dedup] [--no-mask]

Writes the curated corpus to ``<output>/data`` and the gate funnel +
row counts to ``<output>/stats.json``.  Output path is validated by
the same F9 allowlist as the extraction job.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="Corpus curation (Spark)")
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--langs", default="en",
                    help="comma-separated languages to keep")
    ap.add_argument("--min-quality", type=float, default=0.45)
    ap.add_argument("--max-top2", type=float, default=0.35)
    ap.add_argument("--max-dup5", type=float, default=0.35)
    ap.add_argument("--no-near-dedup", action="store_true")
    ap.add_argument("--no-mask", action="store_true")
    ap.add_argument("--format", choices=("parquet", "jsonl"),
                    default="parquet",
                    help="curated-corpus output format (jsonl = one JSON "
                         "document per line, the common training-data "
                         "interchange format)")
    ap.add_argument("--allowed-roots", nargs="*", default=None)
    args = ap.parse_args(argv)

    from .run_extraction import validate_output_path
    validate_output_path(args.output, args.allowed_roots)

    from ..operators.curation import CurationConfig, curate, curation_report
    from ..session import get_spark

    cfg = CurationConfig(
        keep_langs=tuple(args.langs.split(",")),
        min_quality=args.min_quality,
        max_top2gram=args.max_top2,
        max_dup5gram=args.max_dup5,
        near_dedup=not args.no_near_dedup,
        mask_pii=not args.no_mask,
    )
    spark = get_spark("corpus-curation")
    docs = spark.read.parquet(args.input)

    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    funnel = {r["reject_reason"]: r["n_docs"]
              for r in curation_report(docs, cfg).collect()}
    curated = curate(docs, cfg)
    if args.format == "jsonl":
        curated.write.mode("overwrite").json(str(out / "data"))
        n_out = spark.read.json(str(out / "data")).count()
    else:
        curated.write.mode("overwrite").parquet(str(out / "data"))
        n_out = spark.read.parquet(str(out / "data")).count()

    stats = {
        "input_docs": int(docs.count()),
        "gate_funnel": {k: int(v) for k, v in sorted(funnel.items())},
        "output_docs": int(n_out),
        "dedup_dropped": int(funnel.get("keep", 0)) - int(n_out),
        "config": {
            "keep_langs": list(cfg.keep_langs),
            "min_quality": cfg.min_quality,
            "max_top2gram": cfg.max_top2gram,
            "max_dup5gram": cfg.max_dup5gram,
            "near_dedup": cfg.near_dedup,
            "mask_pii": cfg.mask_pii,
        },
    }
    (out / "stats.json").write_text(json.dumps(stats, indent=2) + "\n")
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())

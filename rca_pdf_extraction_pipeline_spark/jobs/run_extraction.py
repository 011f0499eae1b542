"""spark-submit entry point for the extraction pipeline.

CLI mirror of the reference deliverable
(``python -m src.core_analysis <db> --output <dir> --original-headers``,
reference src/core_analysis.py:1001-1061), cluster-shaped:

    spark-submit --py-files rca_pkg.zip \\
        rca_pdf_extraction_pipeline_spark/jobs/run_extraction.py \\
        --input  <parquet dir of docs(doc_id, spans)> \\
        --output <table dir>  [--resume] [--n-buckets 64] [--waves 8]

Build the zip with ``python -m rca_pdf_extraction_pipeline_spark.jobs.package``
or let ``session.get_spark`` ship it automatically when driving
in-process. Running again with ``--resume`` continues from the snapshot
manifest without reprocessing completed buckets.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="RCA extraction pipeline (Spark)")
    ap.add_argument("--input", required=True,
                    help="parquet path of docs(doc_id, spans)")
    ap.add_argument("--output", required=True, help="output table dir")
    ap.add_argument("--resume", action="store_true",
                    help="resume from _snapshots.json (default: fresh runs "
                         "also skip completed buckets — flag is documentation)")
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--waves", type=int, default=8)
    ap.add_argument("--num-partitions", type=int, default=None)
    args = ap.parse_args(argv)

    # import inside main so --py-files shipping is resolved by the time
    # executors deserialize tasks
    from rca_pdf_extraction_pipeline_spark.config import DEFAULT_CONFIG
    from rca_pdf_extraction_pipeline_spark.plans import checkpoint
    from rca_pdf_extraction_pipeline_spark.session import get_spark

    cfg = DEFAULT_CONFIG
    if args.num_partitions:
        from dataclasses import replace
        cfg = replace(cfg, num_partitions=args.num_partitions)

    spark = get_spark("rca-extraction-job")
    docs = spark.read.parquet(args.input)
    report = checkpoint.extract_with_checkpoint(
        docs, args.output, cfg=cfg, n_buckets=args.n_buckets,
        waves=args.waves, input_desc=args.input,
    )
    print(json.dumps(report))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""spark-submit entry point for the extraction regression diff — the
CI gate a pipeline upgrade runs before replacing its output table:

    spark-submit --py-files rca_pkg.zip \\
        rca_pdf_extraction_pipeline_spark/jobs/run_diff.py \\
        --left  <parquet dir of the current run (doc_id, spans)> \\
        --right <parquet dir of the candidate run (doc_id, spans)> \\
        --output <report dir> \\
        [--max-changed-frac 0.01]

Compares the two interleaved span tables with
``operators.interleaved.span_diff`` (the north-rule span-sequence
equality invariant — (kind, text, media_ref, order) per document —
as ONE full-outer doc_id join) and writes:

* ``<out>/verdicts`` — the per-document verdict table
  (doc_id, verdict, first_diff_offset, n_left, n_right), partitioned
  by verdict so the (usually tiny) non-equal slices are separate
  files a reviewer can read without scanning the equal mass;
* ``<out>/stats.json`` — verdict counts, changed fraction, and the
  first few diverged/one-sided doc ids with their first divergence
  offset (the triage head).

Exit code is the gate: 0 when the changed fraction (any verdict other
than ``equal``) is within ``--max-changed-frac`` (default: no limit),
**3** when it exceeds it — wired for CI. Output path is validated by
the same F9 allowlist as the extraction job.

``--merge-text`` normalizes BOTH runs with
``interleaved.merge_adjacent_text`` before diffing — a
granularity-insensitive compare: two pipeline versions that split the
same extracted text into different numbers of adjacent text spans
(e.g. per-line vs per-paragraph emission) read ``equal`` instead of
drowning the report in split-point noise, while any REAL text, media,
or ordering change still diverges (the merge is content-preserving)."""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="Extraction regression diff")
    ap.add_argument("--left", required=True,
                    help="parquet dir: baseline run (doc_id, spans)")
    ap.add_argument("--right", required=True,
                    help="parquet dir: candidate run (doc_id, spans)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--max-changed-frac", type=float, default=None,
                    help="fail (exit 3) when the non-equal fraction "
                         "exceeds this")
    ap.add_argument("--n-examples", type=int, default=10)
    ap.add_argument("--merge-text", action="store_true",
                    help="merge adjacent text spans on both sides before "
                         "diffing (granularity-insensitive compare)")
    ap.add_argument("--allowed-roots", nargs="*", default=None)
    args = ap.parse_args(argv)

    from .run_extraction import validate_output_path
    validate_output_path(args.output, args.allowed_roots)

    from pyspark.sql import functions as F

    from ..operators import interleaved
    from ..session import get_spark

    spark = get_spark("extraction-diff")
    left = spark.read.parquet(args.left)
    right = spark.read.parquet(args.right)
    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)

    if args.merge_text:
        left = interleaved.merge_adjacent_text(left)
        right = interleaved.merge_adjacent_text(right)
    verdicts = interleaved.span_diff(left, right)
    (verdicts.write.mode("overwrite").partitionBy("verdict")
     .parquet(str(out / "verdicts")))

    stored = spark.read.parquet(str(out / "verdicts"))
    counts = {r["verdict"]: int(r["n"]) for r in
              stored.groupBy("verdict").agg(
                  F.count(F.lit(1)).alias("n")).collect()}
    total = sum(counts.values())
    changed = total - counts.get("equal", 0)
    examples = [
        {"doc_id": str(r["doc_id"]), "verdict": r["verdict"],
         "first_diff_offset": (None if r["first_diff_offset"] is None
                               else int(r["first_diff_offset"]))}
        for r in (stored.filter(F.col("verdict") != "equal")
                  .orderBy("verdict", "doc_id")
                  .limit(args.n_examples).collect())]
    stats = {
        "n_docs_compared": total,
        "verdicts": counts,
        "changed": changed,
        "changed_frac": round(changed / total, 6) if total else 0.0,
        "examples": examples,
        "config": {"max_changed_frac": args.max_changed_frac},
    }
    (out / "stats.json").write_text(json.dumps(stats, indent=2) + "\n")
    print(json.dumps(stats))
    if (args.max_changed_frac is not None
            and total > 0 and changed / total > args.max_changed_frac):
        return 3
    return 0


if __name__ == "__main__":
    sys.exit(main())

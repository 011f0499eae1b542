"""spark-submit entry point for BPE tokenizer training — the stored
side of corpus tokenization:

    spark-submit --py-files rca_pkg.zip \\
        rca_pdf_extraction_pipeline_spark/jobs/run_bpe.py \\
        --input  <parquet dir of documents(doc_id, text, ...)> \\
        --output <tokenizer dir> \\
        [--n-merges 16] [--sample-rate 1.0] [--seed 0]

Artifacts (deterministic — same corpus, same rows):

* ``<out>/merges``     — (rank, left, right, pair_count): the learned
  merge table in rank order (``operators.bpe.bpe_train``), the artifact
  a tokenizer serializes.  Downstream tokenization reads it back and
  applies it via ``bpe_apply`` (a literal replace chain — no training
  in the tokenize path, same stored-artifact discipline as the ANN
  index job's ``pq_codebooks``).
* ``<out>/stats.json`` — corpus/vocab sizes, merge list head, params.

``--sample-rate`` trains on a deterministic md5 hash-sample of the
corpus (``sampling.hash_sample`` — same rows on any cluster): merge
statistics converge long before the full corpus is seen, so a 100 TB
train fits on a slice while the final tokenize pass still covers
everything.  Training rounds materialize through the durable
``checkpoint_dir`` (``<out>/_train_checkpoints``) rather than executor
memory, so a lost executor mid-train replays from storage.

Output path is validated by the same F9 allowlist as the extraction
job."""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="BPE tokenizer train (Spark)")
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--n-merges", type=int, default=16)
    ap.add_argument("--sample-rate", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--allowed-roots", nargs="*", default=None)
    args = ap.parse_args(argv)

    from .run_extraction import validate_output_path
    validate_output_path(args.output, args.allowed_roots)

    from ..operators import bpe, sampling
    from ..session import get_spark

    spark = get_spark("bpe-train")
    docs = spark.read.parquet(args.input)
    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)

    train_docs = docs if args.sample_rate >= 1.0 else sampling.hash_sample(
        docs, args.sample_rate, seed=args.seed)
    merges = bpe.bpe_train(
        train_docs, n_merges=args.n_merges,
        checkpoint_dir=str(out / "_train_checkpoints"))
    merges.write.mode("overwrite").parquet(str(out / "merges"))

    stored = spark.read.parquet(str(out / "merges")) \
        .orderBy("rank").collect()
    stats = {
        "n_docs_total": int(docs.count()),
        "n_docs_trained": int(train_docs.count()),
        "n_merges": len(stored),
        "merges_head": [[r["left"], r["right"], int(r["pair_count"])]
                        for r in stored[:8]],
        "config": {"n_merges": args.n_merges,
                   "sample_rate": args.sample_rate, "seed": args.seed},
    }
    (out / "stats.json").write_text(json.dumps(stats, indent=2) + "\n")
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())

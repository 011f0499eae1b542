"""spark-submit entry point for the END-TO-END pretraining-data
pipeline — the capstone composition the operator families exist for:

    documents ─curate→ kept ─decontaminate→ clean ─tokenize→
      token stream ─pack_sequences→ fixed-length rows ─epoch_shards→
      (shard, pos)-ordered training shards

    spark-submit --py-files rca_pkg.zip \\
        rca_pdf_extraction_pipeline_spark/jobs/run_pretrain.py \\
        --input  <parquet dir of documents(doc_id, text, ...)> \\
        --output <run dir> \\
        [--benchmarks <parquet dir of eval texts to decontaminate against>] \\
        [--seq-len 2048] [--eod "<|eod|>"] [--n-shards 64] [--epoch 0] \\
        [--langs en] [--min-quality 0.45] [--no-near-dedup] [--no-mask] \\
        [--resume]

Every stage is a DURABLE parquet barrier under ``<output>/``:

    curated/    gate cascade -> exact dedup -> MinHash near-dedup -> PII
    clean/      curated minus any doc sharing a token 8-gram with the
                benchmark corpus (GPT-3-style decontamination; only
                written when --benchmarks is given)
    para_dedup/ --paragraph-dedup: corpus-global keep-first exact
                paragraph dedup, empty rewrites dropped
    trimmed/    --trim-substr: cross-doc duplicated 8-gram ranges cut
                from every doc (ExactSubstr removal)
    sequences/  the clean corpus as ONE id-ordered token stream cut into
                seq_len rows (docs split at boundaries, EOD sentinel)
    data/       sequences + (shard, pos) from the epoch permutation,
                partitioned by shard — a reader streams shard=k in pos
                order and sees a reproducible pseudo-random epoch
    stats.json  stage funnel + packing + shard histogram

The barriers are the resume story (north_rule: "resumable from
checkpoint with per-partition lineage + metrics"): ``--resume`` skips
any stage whose ``_SUCCESS`` marker exists and reads the artifact back,
so a run that died at packing replays nothing upstream — the same
snapshot-commit discipline as ``plans/checkpoint.py``, at stage
granularity.  They are also the correctness story at 10^12 docs: the
near-dedup CC loop and the pack family's range-cumsum both want a real
materialization point, not a 4-stage lineage re-derived per consumer
(CLAUDE.md's shared-layer rule).

Stats counts are read from the STAGED parquet, never from the live
plans, so counting costs one footer scan per stage instead of a
recompute.

Reference parity note: the reference pipeline (main.py) is a
single-process classify→extract→verify loop over one PDF; this job is
the corpus-scale analogue its data model implies — every stage here is
individually oracle-checked (curation_flags, decontaminate_report,
pack_sequences, epoch_shards entry queries); the job composes them.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

from pyspark.sql import DataFrame


def _stage(spark, path: Path, build, resume: bool) -> DataFrame:
    """Durable stage barrier: build -> parquet -> read back.  With
    ``resume=True`` an existing ``_SUCCESS`` marker short-circuits the
    build entirely (the artifact is the checkpoint)."""
    if resume and (path / "_SUCCESS").exists():
        return spark.read.parquet(str(path))
    df = build()
    df.write.mode("overwrite").parquet(str(path))
    return spark.read.parquet(str(path))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        description="Pretraining-data pipeline (Spark)")
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--benchmarks", default=None,
                    help="parquet dir of benchmark/eval texts; any doc "
                         "sharing a token 8-gram is dropped")
    ap.add_argument("--seq-len", type=int, default=2048)
    ap.add_argument("--eod", default="<|eod|>",
                    help="end-of-document sentinel token ('' = none)")
    ap.add_argument("--n-shards", type=int, default=64)
    ap.add_argument("--epoch", type=int, default=0)
    ap.add_argument("--langs", default="en")
    ap.add_argument("--min-quality", type=float, default=0.45)
    ap.add_argument("--max-top2", type=float, default=0.35)
    ap.add_argument("--max-dup5", type=float, default=0.35)
    ap.add_argument("--no-near-dedup", action="store_true")
    ap.add_argument("--no-mask", action="store_true")
    ap.add_argument("--paragraph-dedup", action="store_true",
                    help="corpus-global keep-first exact paragraph dedup "
                         "(dedup.dedup_paragraphs) after decontamination")
    ap.add_argument("--trim-substr", action="store_true",
                    help="cut cross-doc duplicated 8-gram ranges "
                         "(substring_dedup.trim_duplicated_ranges) before "
                         "packing")
    ap.add_argument("--resume", action="store_true",
                    help="skip stages whose _SUCCESS marker exists")
    ap.add_argument("--allowed-roots", nargs="*", default=None)
    args = ap.parse_args(argv)

    from .run_extraction import validate_output_path
    validate_output_path(args.output, args.allowed_roots)

    from pyspark.sql import functions as F

    from ..functions import text as T
    from ..operators import chunking, sampling, substring_dedup
    from ..operators import dedup as dedup_ops
    from ..operators.curation import CurationConfig, curate
    from ..session import get_spark

    cfg = CurationConfig(
        keep_langs=tuple(args.langs.split(",")),
        min_quality=args.min_quality,
        max_top2gram=args.max_top2,
        max_dup5gram=args.max_dup5,
        near_dedup=not args.no_near_dedup,
        mask_pii=not args.no_mask,
    )
    spark = get_spark("pretrain-data")
    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)

    docs = spark.read.parquet(args.input)
    n_input = docs.count()

    curated = _stage(spark, out / "curated",
                     lambda: curate(docs, cfg), args.resume)
    n_curated = curated.count()

    if args.benchmarks:
        bench = spark.read.parquet(args.benchmarks)
        clean = _stage(spark, out / "clean",
                       lambda: substring_dedup.decontaminate(curated, bench),
                       args.resume)
        n_clean = clean.count()
    else:
        # no benchmark corpus: the clean stage IS the curated artifact
        # (no second copy of the corpus on disk)
        clean, n_clean = curated, n_curated

    # optional rewrite stages: keep-first paragraph dedup, then the
    # ExactSubstr range cut — each drops documents left empty by the
    # rewrite and stages its artifact like every other step
    if args.paragraph_dedup:
        clean = _stage(
            spark, out / "para_dedup",
            lambda: dedup_ops.dedup_paragraphs(clean)
            .filter(F.col("clean_text") != "")
            .select("doc_id", F.col("clean_text").alias("text")),
            args.resume)
    n_para = clean.count() if args.paragraph_dedup else n_clean
    if args.trim_substr:
        clean = _stage(
            spark, out / "trimmed",
            lambda: substring_dedup.trim_duplicated_ranges(clean)
            .filter(F.col("clean_text") != "")
            .select("doc_id", F.col("clean_text").alias("text")),
            args.resume)
    n_trim = clean.count() if args.trim_substr else n_para

    seqs = _stage(
        spark, out / "sequences",
        lambda: chunking.pack_sequences(
            clean.select("doc_id", T.tokens(F.col("text")).alias("tokens")),
            seq_len=args.seq_len, eod=args.eod or None),
        args.resume)

    # epoch permutation over the SLIM (seq_id) projection, joined back —
    # the pack_sequences fat/slim discipline at the shard stage too
    def _sharded() -> DataFrame:
        perm = sampling.epoch_shards(seqs.select("seq_id"), args.n_shards,
                                     epoch=args.epoch, id_col="seq_id")
        return seqs.join(perm, "seq_id")

    if args.resume and (out / "data" / "_SUCCESS").exists():
        hist_src = spark.read.parquet(str(out / "data"))
    else:
        # persist: the histogram and the write are two consumers of the
        # same shard join (the shared-layer rule); an EMPTY corpus
        # writes only _SUCCESS under partitionBy, so the histogram is
        # taken from the live frame, never read back
        sharded = _sharded().persist()
        sharded.write.mode("overwrite").partitionBy("shard") \
               .parquet(str(out / "data"))
        hist_src = sharded

    pack_stats = seqs.agg(
        F.count(F.lit(1)).alias("n_sequences"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum(F.col("complete").cast("long")).alias("n_complete")).first()
    shard_hist = {int(r["shard"]): int(r["n"])
                  for r in hist_src.groupBy("shard")
                                   .agg(F.count(F.lit(1)).alias("n"))
                                   .collect()}
    if hist_src.is_cached:
        hist_src.unpersist()

    stats = {
        "input_docs": int(n_input),
        "curated_docs": int(n_curated),
        "decontaminated_docs": int(n_clean),
        "contaminated_dropped": int(n_curated - n_clean),
        "paragraph_dedup_docs": int(n_para) if args.paragraph_dedup else None,
        "trimmed_docs": int(n_trim) if args.trim_substr else None,
        "n_sequences": int(pack_stats["n_sequences"] or 0),
        "total_tokens": int(pack_stats["total_tokens"] or 0),
        "n_complete": int(pack_stats["n_complete"] or 0),
        "seq_len": args.seq_len,
        "eod": args.eod,
        "n_shards": args.n_shards,
        "epoch": args.epoch,
        "shard_histogram": {str(k): shard_hist[k]
                            for k in sorted(shard_hist)},
        "config": {
            "keep_langs": list(cfg.keep_langs),
            "min_quality": cfg.min_quality,
            "near_dedup": cfg.near_dedup,
            "mask_pii": cfg.mask_pii,
            "benchmarks": bool(args.benchmarks),
            "paragraph_dedup": args.paragraph_dedup,
            "trim_substr": args.trim_substr,
        },
    }
    (out / "stats.json").write_text(json.dumps(stats, indent=2) + "\n")
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""spark-submit entry point for ANN index construction — turns an
embeddings table into the on-disk search artifacts the similarity
operators promise at cluster scale:

    spark-submit --py-files rca_pkg.zip \\
        rca_pdf_extraction_pipeline_spark/jobs/run_index.py \\
        --input  <parquet dir of embeddings(vec_id, embedding)> \\
        --output <index dir> \\
        [--n-centroids 4] [--iters 2] [--sample-rate 0.5] [--seed 0]
        [--pq-m 4] [--pq-k 4] [--dim 64]

Artifacts (all deterministic — rebuilding from the same table yields
byte-identical rows):

* ``<out>/centroids``    — IVF coarse codebook (cid, cv), trained on a
  deterministic hash-sample (``kmeans_centroids_sampled``): Lloyd
  rounds touch sample_rate * N rows, never N.
* ``<out>/assignments``  — (vec_id, cid) for the whole corpus,
  **written partitioned by cid**: an IVF query that probes ``nprobe``
  cells then prunes to nprobe/k of the files at scan time — the layout
  ``similarity.ivf_topk``'s docstring prescribes for 10^12 vectors.
* ``<out>/pq_codebooks`` — (sub, cid, cv) per-subspace PQ codewords.
* ``<out>/pq_codes``     — (vec_id, sub, code) **written partitioned by
  the vector's IVF cell ``cid``**: the m-small-ints form ADC search
  scans instead of raw vectors, laid out so an IVFADC query (probe
  nprobe cells, ADC-rank only inside them — Jégou et al., TPAMI'11
  §IV) prunes the code scan to nprobe/k of the files.  Codes are
  encoded against the STORED ``pq_codebooks`` artifact read back from
  parquet — never refit in-plan — so the two artifacts cannot drift
  and index build pays exactly one training pass.
* ``<out>/sq8_bounds``   — (dim, mn, mx) per-dimension lattice bounds,
  the trained parameters of int8 scalar quantization.
* ``<out>/sq8_codes``    — (vec_id, codes) int8 code arrays, encoded
  against the STORED ``sq8_bounds`` (read back, ``bounds=``) and
  **written partitioned by the vector's IVF cell ``cid``** — the
  training-free quantized form, cell-pruned the same way as
  ``pq_codes``.
* ``<out>/stats.json``   — corpus size, per-cell histogram, params —
  the index card a serving layer reads before choosing nprobe.

Output path is validated by the same F9 allowlist as the extraction
job."""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="ANN index build (Spark)")
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--n-centroids", type=int, default=4)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--sample-rate", type=float, default=0.5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--pq-m", type=int, default=4)
    ap.add_argument("--pq-k", type=int, default=4)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--allowed-roots", nargs="*", default=None)
    args = ap.parse_args(argv)

    from .run_extraction import validate_output_path
    validate_output_path(args.output, args.allowed_roots)

    from pyspark.sql import functions as F

    from ..operators import similarity
    from ..session import get_spark

    spark = get_spark("ann-index-build")
    embs = spark.read.parquet(args.input)
    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)

    cents = similarity.kmeans_centroids_sampled(
        embs, k=args.n_centroids, iters=args.iters,
        sample_rate=args.sample_rate, seed=args.seed)
    cents.write.mode("overwrite").parquet(str(out / "centroids"))

    # full corpus assigned ONCE against the persisted codebook (read it
    # back rather than re-deriving: the Lloyd lineage must not re-run)
    cents_stored = spark.read.parquet(str(out / "centroids"))
    assigned = similarity.assign_centroids(
        embs, cents=cents_stored).select("vec_id", "cid")
    (assigned.write.mode("overwrite").partitionBy("cid")
     .parquet(str(out / "assignments")))

    similarity.pq_codebooks(embs, m=args.pq_m, k=args.pq_k,
                            iters=args.iters, dim=args.dim) \
        .write.mode("overwrite").parquet(str(out / "pq_codebooks"))
    # encode against the codebooks just PERSISTED (read back, books=),
    # not a second in-plan fit: the stored artifacts stay consistent by
    # construction rather than by Lloyd bit-determinism, and the build
    # pays one training pass instead of two.  Codes land partitioned by
    # the vector's IVF cell so IVFADC search prunes files by probed cid.
    books_stored = spark.read.parquet(str(out / "pq_codebooks"))
    codes = similarity.pq_codes(embs, m=args.pq_m, k=args.pq_k,
                                iters=args.iters, dim=args.dim,
                                books=books_stored)
    cells_stored = spark.read.parquet(str(out / "assignments")) \
        .select("vec_id", "cid")
    (codes.join(cells_stored, "vec_id")
     .write.mode("overwrite").partitionBy("cid")
     .parquet(str(out / "pq_codes")))

    # int8 scalar-quantization artifacts: bounds persisted first, codes
    # encoded against the READ-BACK bounds (never refit in-plan — same
    # single-training-pass discipline as pq_codes/books above), laid
    # out cell-partitioned like pq_codes
    similarity.sq8_bounds(embs).write.mode("overwrite") \
        .parquet(str(out / "sq8_bounds"))
    bounds_stored = spark.read.parquet(str(out / "sq8_bounds"))
    sq8 = similarity.sq8_codes(embs, bounds=bounds_stored)
    (sq8.join(cells_stored, "vec_id")
     .write.mode("overwrite").partitionBy("cid")
     .parquet(str(out / "sq8_codes")))

    cells = {int(r["cid"]): int(r["n"])
             for r in spark.read.parquet(str(out / "assignments"))
             .groupBy("cid").agg(F.count(F.lit(1)).alias("n")).collect()}
    stats = {
        "n_vectors": int(embs.count()),
        "cells": {str(k): v for k, v in sorted(cells.items())},
        "config": {
            "n_centroids": args.n_centroids, "iters": args.iters,
            "sample_rate": args.sample_rate, "seed": args.seed,
            "pq_m": args.pq_m, "pq_k": args.pq_k, "dim": args.dim,
        },
    }
    (out / "stats.json").write_text(json.dumps(stats, indent=2) + "\n")
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())

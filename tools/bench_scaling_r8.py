"""Per-family scaling evidence for the batch k-NN join
(``similarity.knn_join``) and int8 scalar-quantization search
(``similarity.sq8_topk``) — run at two parallelism levels on the SAME
deterministic input, output hashes compared across levels.

Family shapes:

* ``knn_join``: the corpus-proportional stages are the Lloyd fit +
  nearest-centroid assignment (N x n_centroids x dim integer
  multiply-adds, one groupBy(id) argmin shuffle per pass) and the
  per-(query, probed-cell) cosine ranking.  Shuffle-carrying like
  PageRank/CC, so the honest pair is 1 -> 4 (BENCH/FAMILY_SCALING.md
  bus ceiling).
* ``sq8``: bounds fold (one per-dim aggregate) + narrow quantize/
  reconstruct/L2 scan + TakeOrderedAndProject — embarrassingly
  parallel except the dim-cardinality fold.

Input = generated 64-dim vectors written as 64 parquet files
(splittable at every level; deterministic id arithmetic, no RNG).
Prints one JSON line and writes BENCH/FAMILY_SCALING_R8.md.  Pooled
use: re-invoke with --reuse-input and merge by per-level min; the
corpus marker refuses a mismatched reuse.

Usage: python tools/bench_scaling_r8.py [--runs-per-level 2]
       [--vectors 1000000] [--reuse-input] [--levels 1,4]
       [--families knn_join,sq8]

``--families`` runs a subset so each family can be sized where COMPUTE
dominates (the r4 lesson: undersized inputs read as negative scaling):
knn_join is Lloyd-fit-bound already at 1e5 vectors, the narrow sq8 scan
needs ~2e6.  Subset runs print JSON only — merge into the MD by hand,
like the BASELINE.md pooling protocol.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DEFAULT_INPUT = "/tmp/scale_bench_r8_input"

RUN_SNIPPET = """
import hashlib, json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from rca_pdf_extraction_pipeline_spark.session import get_spark
from rca_pdf_extraction_pipeline_spark.operators import similarity as S

spark = get_spark("r8-family-scale", master="local[{cpus}]",
                  shuffle_partitions=max(16, 4 * {cpus}))

def mat(df):
    df.write.format("noop").mode("overwrite").save()

embs = spark.read.parquet({input_dir!r} + "/vectors")
n_rows = embs.count()

if {family!r} == "knn_join":
    step = max(1, n_rows // 64)
    queries = embs.filter("vec_id % " + str(step) + " = 0")
    def fn():
        return S.knn_join(queries, embs, k=10, n_centroids=16, iters=2,
                          nprobe=2)
    # warm on a corpus slice: same plan shapes / generated classes,
    # a fraction of the full pass cost
    warm_df = S.knn_join(queries.limit(4), embs.limit(8192), k=10,
                         n_centroids=16, iters=2, nprobe=2)
    hash_cols = ["query_id", "vec_id", "cid", "cosine_sim", "rank"]
else:
    def fn():
        return S.sq8_topk(embs, query_id=0, k=100)
    warm_df = S.sq8_topk(embs.limit(8192), query_id=0, k=100)
    hash_cols = ["vec_id", "sq_d2"]

mat(warm_df)   # warm the exact plan shapes / generated classes
times = []
for _ in range({runs}):
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    t0 = time.time()
    mat(fn())
    times.append(round(time.time() - t0, 3))
rows = fn().select(*hash_cols).collect()
h = hashlib.sha256()
for r in sorted(tuple(str(v) for v in row) for row in rows):
    h.update("\\u001f".join(r).encode())
print(json.dumps({{"cpus": {cpus}, "n_rows": n_rows,
                  "best_sec": min(times), "times": times,
                  "rows": len(rows), "output_hash": h.hexdigest()}}))
spark.stop()
"""


def build_corpus(input_dir: str, vectors: int) -> None:
    sys.path.insert(0, str(REPO))
    from pyspark.sql import functions as F

    from rca_pdf_extraction_pipeline_spark.session import get_spark

    spark = get_spark("r8-family-input", master="local[16]")
    # deterministic 64-dim vectors from pure id arithmetic — no RNG, so
    # the corpus is reproducible and the hash comparison meaningful
    vec = F.expr(
        "transform(sequence(0, 63), i -> sin(id * 0.37 + i * 1.13)"
        " + 0.01 * cos(id * 2.71 * (i + 1)))")
    (spark.range(vectors)
     .repartition(64)
     .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
     .write.mode("overwrite").parquet(f"{input_dir}/vectors"))
    spark.stop()
    (Path(input_dir) / "_CORPUS").write_text(str(vectors))


def corpus_config(input_dir: str) -> int | None:
    marker = Path(input_dir) / "_CORPUS"
    return int(marker.read_text()) if marker.exists() else None


def run_one(cpus: int, family: str, input_dir: str, runs: int) -> dict:
    code = RUN_SNIPPET.format(repo=str(REPO), cpus=cpus, family=family,
                              input_dir=input_dir, runs=runs)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3600)
    if out.returncode != 0:
        raise RuntimeError(
            f"level {cpus} family {family} failed:\n{out.stderr[-3000:]}")
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


FAMILIES = ("knn_join", "sq8")

HEADLINE_MD = """# Round-5 family scaling — batch k-NN join, int8 SQ search

Same input, same code, local[{lo}] vs local[{hi}] ({runs} runs per
level, best wall; one fresh JVM per (level, family)).  Output hashes
are compared across levels — equal hash = bit-identical rows at every
parallelism.

Input: {vectors} generated 64-dim vectors on 64 parquet files
(splittable at every level; deterministic id arithmetic).  knn_join =
64-query batch, 16 trained cells, nprobe 2, top-10 per query (Lloyd
fit + assignment + blocked cosine rank all timed); sq8 = bounds fold +
quantize/reconstruct/L2 scan, top-100.

| family | local[{lo}] best (s) | local[{hi}] best (s) | speedup | efficiency (ideal {ideal}x) | outputs identical |
| --- | --- | --- | --- | --- | --- |
{rows}

Pooling protocol: identical to BENCH/FAMILY_SCALING.md — rerun with
`--reuse-input`, merge by per-level min; the `_CORPUS` marker refuses a
corpus built with different --vectors.
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs-per-level", type=int, default=2)
    ap.add_argument("--vectors", type=int, default=1_000_000)
    ap.add_argument("--levels", default="1,4")
    ap.add_argument("--input-dir", default=DEFAULT_INPUT)
    ap.add_argument("--reuse-input", action="store_true")
    ap.add_argument("--families", default=",".join(FAMILIES))
    args = ap.parse_args()
    families = tuple(args.families.split(","))
    assert all(f in FAMILIES for f in families), families

    lo, hi = (int(x) for x in args.levels.split(","))
    if not args.reuse_input or corpus_config(args.input_dir) != args.vectors:
        build_corpus(args.input_dir, args.vectors)

    t0 = time.time()
    levels = {}
    for cpus in (lo, hi):
        levels[cpus] = {fam: run_one(cpus, fam, args.input_dir,
                                     args.runs_per_level)
                        for fam in families}

    rows_md = []
    result = {"levels": levels, "wall_s": round(time.time() - t0, 1)}
    for fam in families:
        a, b = levels[lo][fam], levels[hi][fam]
        speed = a["best_sec"] / b["best_sec"]
        eff = speed / (hi / lo)
        same = a["output_hash"] == b["output_hash"]
        result[fam] = {"speedup": round(speed, 3),
                       "efficiency": round(eff, 3), "hash_match": same}
        rows_md.append(
            f"| {fam} | {a['best_sec']} | {b['best_sec']} | "
            f"{speed:.2f}x | {eff:.3f} | {'yes' if same else 'NO'} |")

    if families == FAMILIES:
        md = HEADLINE_MD.format(
            lo=lo, hi=hi, runs=args.runs_per_level, vectors=args.vectors,
            ideal=hi // lo, rows="\n".join(rows_md))
        (REPO / "BENCH" / "FAMILY_SCALING_R8.md").write_text(md)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

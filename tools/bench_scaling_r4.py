"""Per-family scaling evidence for the round-4 families — PQ encoding
(``similarity.pq_codes``) and integer-lattice PageRank
(``linkgraph.pagerank``) — run at local[4] vs local[16] (the honest
N -> 4N stand-in per BENCH/BASELINE.md: both levels below the shared-
DRAM-bus ceiling) on the SAME deterministic input, with output hashes
compared across levels.

Prints one JSON line and writes BENCH/FAMILY_SCALING_R4.md.  Pooled
use: re-invoke with --reuse-input and merge by min, like
bench_scaling.py (corpus marker file refuses a mismatched reuse).

Inputs (built once, deterministic):
* vectors: sf0.1 embeddings (2000 x 64 doubles) x --vec-replicas, ids
  offset per replica — identical vectors are fine for ENCODE cost,
  which is per-row lattice arithmetic + the argmin shuffle.
* graph: nodes = sf0.1 doc_ids x --vec-replicas; each node emits
  --edges-per-node
  md5-derived out-edges (deterministic pseudo-web: heavy-tailed in-
  degree because dst = md5 mod n is uniform but replicated hubs are
  added for skew).

Usage: python tools/bench_scaling_r4.py [--runs-per-level 2]
       [--vec-replicas 64] [--reuse-input] [--levels 4,16]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DEFAULT_INPUT = "/tmp/scale_bench_r4_input"

RUN_SNIPPET = """
import hashlib, json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from rca_pdf_extraction_pipeline_spark.session import get_spark
from rca_pdf_extraction_pipeline_spark.operators import linkgraph, similarity

spark = get_spark("r4-family-scale", master="local[{cpus}]",
                  shuffle_partitions=max(16, 4 * {cpus}))

def mat(df):
    df.write.format("noop").mode("overwrite").save()

if {family!r} == "ann_pq_codes":
    embs = spark.read.parquet({input_dir!r} + "/vectors")
    n_rows = embs.count()
    warm = lambda: similarity.pq_codes(embs.where(F.col("vec_id") % 64 == 0))
    fn = lambda: similarity.pq_codes(embs)
    hash_cols = ["vec_id", "sub", "code"]
else:
    nodes = spark.read.parquet({input_dir!r} + "/nodes")
    edges = spark.read.parquet({input_dir!r} + "/edges")
    n_rows = edges.count()
    warm = lambda: linkgraph.pagerank(
        nodes.where(F.col("node_id") % 64 == 0),
        edges.where((F.col("src") % 64 == 0) & (F.col("dst") % 64 == 0)),
        iters=3)
    fn = lambda: linkgraph.pagerank(nodes, edges, iters=3)
    hash_cols = ["node_id", "pr"]

mat(warm())   # warm the exact plan shapes / generated classes
times = []
for _ in range({runs}):
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


def build_corpus(input_dir: str, vec_replicas: int,
                 edges_per_node: int) -> None:
    sys.path.insert(0, str(REPO))
    from pyspark.sql import functions as F

    from rca_pdf_extraction_pipeline_spark.session import get_spark

    spark = get_spark("r4-family-input", master="local[8]")
    raw = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet") \
        .select("vec_id", "embedding")
    vecs = None
    for k in range(vec_replicas):
        part = raw.select(
            (F.col("vec_id") + F.lit(k * 1_000_000)).alias("vec_id"),
            "embedding")
        vecs = part if vecs is None else vecs.unionByName(part)
    vecs.repartition(64).write.mode("overwrite") \
        .parquet(f"{input_dir}/vectors")

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet") \
        .select("doc_id")
    nodes = None
    for k in range(vec_replicas):
        part = docs.select(
            (F.col("doc_id") + F.lit(k * 1_000_000)).alias("node_id"))
        nodes = part if nodes is None else nodes.unionByName(part)
    nodes = nodes.repartition(64)
    nodes.write.mode("overwrite").parquet(f"{input_dir}/nodes")
    stored_nodes = spark.read.parquet(f"{input_dir}/nodes")
    # md5-derived out-edges per node: node ids are k*1e6 + doc_id with
    # doc_id contiguous 0..4999, so a valid dst is synthesized directly
    # from two md5 slices — replica slot and doc slot; md5-uniform dst
    # gives a Poisson in-degree tail, heavier once src skips self-loops
    def _h(j: int, lo: int, mod: int) -> F.Column:
        return (F.conv(F.substring(F.md5(F.concat_ws("-",
                    F.col("node_id").cast("string"), F.lit(str(j)))),
                    lo, 8), 16, 10).cast("long") % mod)

    e = stored_nodes.select(
        F.col("node_id").alias("src"),
        F.posexplode(F.array(*[
            (_h(j, 1, vec_replicas) * 1_000_000 + _h(j, 9, 5000))
            for j in range(edges_per_node)])).alias("j", "dst"))
    edges = e.select("src", "dst").where(F.col("src") != F.col("dst"))
    edges.repartition(64).write.mode("overwrite") \
        .parquet(f"{input_dir}/edges")
    spark.stop()
    (Path(input_dir) / "_VEC_REPLICAS").write_text(
        f"{vec_replicas},{edges_per_node}")


def corpus_config(input_dir: str) -> tuple[int, int] | None:
    marker = Path(input_dir) / "_VEC_REPLICAS"
    if not marker.exists():
        return None
    parts = marker.read_text().split(",")
    # pre-knob corpora recorded replicas only (8 edges/node implicit)
    return (int(parts[0]), int(parts[1]) if len(parts) > 1 else 8)


def run_one(cpus: int, family: str, input_dir: str, runs: int) -> dict:
    code = RUN_SNIPPET.format(repo=str(REPO), cpus=cpus, family=family,
                              input_dir=input_dir, runs=runs)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=2400)
    if out.returncode != 0:
        raise RuntimeError(
            f"level {cpus} family {family} failed:\n{out.stderr[-3000:]}")
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


FAMILIES = ("ann_pq_codes", "link_pagerank")

HEADLINE_MD = """# Round-4 family scaling — PQ encode, integer PageRank

Same input, same code, local[{lo}] vs local[{hi}] ({runs} runs per
level, best wall; one fresh JVM per (level, family)).  Output hashes
are compared across levels — equal hash = bit-identical rows at every
parallelism.

Corpus: sf0.1 embeddings x {reps} replicas = {n_vecs} vectors (dim 64);
graph = {n_nodes_label} nodes x {epn} md5-derived out-edges ({n_edges}
post-self-loop-filter), PageRank 3 unrolled iterations.

| family | local[{lo}] best (s) | local[{hi}] best (s) | speedup | efficiency (ideal {ideal}x) | outputs identical |
| --- | --- | --- | --- | --- | --- |
{rows}

Pooling protocol: identical to BENCH/FAMILY_SCALING.md — rerun with
`--reuse-input`, merge by per-level min; the `_VEC_REPLICAS` marker
refuses a corpus built with a different replica count.
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs-per-level", type=int, default=2)
    ap.add_argument("--vec-replicas", type=int, default=64)
    ap.add_argument("--edges-per-node", type=int, default=48,
                    help="out-links per node; 8 gave a 2.5M-edge graph "
                         "whose PageRank was fixed-overhead-dominated "
                         "(negative scaling) — default sized so compute "
                         "dominates at local[4]")
    ap.add_argument("--levels", default="4,16")
    ap.add_argument("--input-dir", default=DEFAULT_INPUT)
    ap.add_argument("--reuse-input", action="store_true")
    args = ap.parse_args()

    lo, hi = (int(x) for x in args.levels.split(","))
    have = corpus_config(args.input_dir)
    want = (args.vec_replicas, args.edges_per_node)
    if not args.reuse_input or have != want:
        if args.reuse_input and have is not None:
            print(f"corpus is {have} (replicas, edges/node), want {want}"
                  f" — rebuilding", file=sys.stderr)
        build_corpus(args.input_dir, *want)

    t0 = time.time()
    levels = {}
    for cpus in (lo, hi):
        levels[cpus] = {fam: run_one(cpus, fam, args.input_dir,
                                     args.runs_per_level)
                        for fam in FAMILIES}

    rows_md = []
    result = {"levels": levels, "wall_s": round(time.time() - t0, 1)}
    for fam in FAMILIES:
        a, b = levels[lo][fam], levels[hi][fam]
        speed = a["best_sec"] / b["best_sec"]
        eff = speed / (hi / lo)
        same = a["output_hash"] == b["output_hash"]
        result[fam] = {"speedup": round(speed, 3),
                       "efficiency": round(eff, 3), "hash_equal": same}
        rows_md.append(
            f"| {fam} | {a['best_sec']} | {b['best_sec']} | "
            f"{speed:.2f}x | **{eff:.3f}** | {same} |")

    md = HEADLINE_MD.format(
        lo=lo, hi=hi, runs=args.runs_per_level, reps=args.vec_replicas,
        n_vecs=levels[lo]["ann_pq_codes"]["n_rows"],
        n_nodes_label=f"{args.vec_replicas}x5000", epn=args.edges_per_node,
        n_edges=levels[lo]["link_pagerank"]["n_rows"],
        ideal=hi // lo, rows="\n".join(rows_md))
    (REPO / "BENCH" / "FAMILY_SCALING_R4.md").write_text(md)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

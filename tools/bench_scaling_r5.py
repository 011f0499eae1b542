"""Per-family scaling evidence for the round-5 graph families —
degree-oriented triangle counting (``linkgraph.triangle_counts``) and
fan-out-capped co-citation mining (``linkgraph.cocitation_pairs``) —
run at two parallelism levels on the SAME deterministic input, output
hashes compared across levels.

Default levels are local[1] vs local[4]: both families are keyed-
shuffle-heavy (wedge self-join / pair self-join + hash aggregates), and
BENCH/FAMILY_SCALING.md established that shuffle-bound families on this
box are DRAM-bus-bound past ~4 cores — 1 -> 4 is the honest N -> 4N
pair for them, like CC dedup and PageRank.

Corpus: the bench_scaling_r4 pseudo-web builder shape (sf0.1 doc ids x
--replicas, md5-derived out-edges) but at --edges-per-node 12: the
wedge table grows with C(out_degree, 2), so the r4 default of 48
out-links per node would inflate wedges ~16x past the triangle compute
sweet spot; 12 gives ~20M wedges at 64 replicas — compute-dominant at
local[1] without being bus-bound at local[4].

Prints one JSON line and writes BENCH/FAMILY_SCALING_R5.md.  Pooled
use: re-invoke with --reuse-input and merge by per-level min; the
corpus marker refuses a mismatched reuse.

Usage: python tools/bench_scaling_r5.py [--runs-per-level 2]
       [--replicas 64] [--edges-per-node 12] [--reuse-input]
       [--levels 1,4]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DEFAULT_INPUT = "/tmp/scale_bench_r5_input"

RUN_SNIPPET = """
import hashlib, json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from rca_pdf_extraction_pipeline_spark.session import get_spark
from rca_pdf_extraction_pipeline_spark.operators import linkgraph

spark = get_spark("r5-family-scale", master="local[{cpus}]",
                  shuffle_partitions=max(16, 4 * {cpus}))

def mat(df):
    df.write.format("noop").mode("overwrite").save()

edges = spark.read.parquet({input_dir!r} + "/edges")
sub = edges.where((F.col("src") % 64 == 0) & (F.col("dst") % 64 == 0))
if {family!r} == "link_triangles":
    warm = lambda: linkgraph.triangle_counts(sub)
    fn = lambda: linkgraph.triangle_counts(edges)
    hash_cols = ["node_id", "n_triangles"]
else:
    warm = lambda: linkgraph.cocitation_pairs(sub)
    fn = lambda: linkgraph.cocitation_pairs(edges)
    hash_cols = ["a", "b", "n_common"]

n_rows = edges.count()
mat(warm())   # warm the exact plan shapes / generated classes
times = []
for _ in range({runs}):
    # both operators persist their shared layers per call — clear
    # between runs so every run pays (and measures) the same work
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    t0 = time.time()
    mat(fn())
    times.append(round(time.time() - t0, 3))
spark.catalog.clearCache()
rows = fn().select(*hash_cols).collect()
h = hashlib.sha256()
for r in sorted(tuple(str(v) for v in row) for row in rows):
    h.update("\\u001f".join(r).encode())
print(json.dumps({{"cpus": {cpus}, "n_rows": n_rows,
                  "best_sec": min(times), "times": times,
                  "rows": len(rows), "output_hash": h.hexdigest()}}))
spark.stop()
"""


def build_corpus(input_dir: str, replicas: int, edges_per_node: int) -> None:
    sys.path.insert(0, str(REPO))
    from pyspark.sql import functions as F

    from rca_pdf_extraction_pipeline_spark.session import get_spark

    spark = get_spark("r5-family-input", master="local[8]")
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet") \
        .select("doc_id")
    nodes = None
    for k in range(replicas):
        part = docs.select(
            (F.col("doc_id") + F.lit(k * 1_000_000)).alias("node_id"))
        nodes = part if nodes is None else nodes.unionByName(part)
    stored = nodes.repartition(64)
    stored.write.mode("overwrite").parquet(f"{input_dir}/nodes")
    stored_nodes = spark.read.parquet(f"{input_dir}/nodes")

    def _h(j: int, lo: int, mod: int) -> F.Column:
        return (F.conv(F.substring(F.md5(F.concat_ws("-",
                    F.col("node_id").cast("string"), F.lit(str(j)))),
                    lo, 8), 16, 10).cast("long") % mod)

    e = stored_nodes.select(
        F.col("node_id").alias("src"),
        F.posexplode(F.array(*[
            (_h(j, 1, replicas) * 1_000_000 + _h(j, 9, 5000))
            for j in range(edges_per_node)])).alias("j", "dst"))
    edges = e.select("src", "dst").where(F.col("src") != F.col("dst"))
    edges.repartition(64).write.mode("overwrite") \
        .parquet(f"{input_dir}/edges")
    spark.stop()
    (Path(input_dir) / "_CORPUS").write_text(f"{replicas},{edges_per_node}")


def corpus_config(input_dir: str) -> tuple[int, int] | None:
    marker = Path(input_dir) / "_CORPUS"
    if not marker.exists():
        return None
    a, b = marker.read_text().split(",")
    return (int(a), int(b))


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


FAMILIES = ("link_triangles", "link_cocitation")

HEADLINE_MD = """# Round-5 family scaling — triangle counting, co-citation

Same input, same code, local[{lo}] vs local[{hi}] ({runs} runs per
level, best wall; one fresh JVM per (level, family); persisted layers
cleared between runs so every run measures the full derivation).
Output hashes are compared across levels — equal hash = bit-identical
rows at every parallelism.

Corpus: {reps}x5000 nodes x {epn} md5-derived out-edges ({n_edges}
post-self-loop-filter).  Both families are keyed-shuffle-heavy, so the
honest N -> 4N pair on this box is {lo} -> {hi} (see
BENCH/FAMILY_SCALING.md on the shared-DRAM-bus ceiling).

| family | local[{lo}] best (s) | local[{hi}] best (s) | speedup | efficiency (ideal {ideal}x) | outputs identical |
| --- | --- | --- | --- | --- | --- |
{rows}

Pooling protocol: identical to BENCH/FAMILY_SCALING.md — rerun with
`--reuse-input`, merge by per-level min; the `_CORPUS` marker refuses a
corpus built with different (replicas, edges/node).
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs-per-level", type=int, default=2)
    ap.add_argument("--replicas", type=int, default=64)
    ap.add_argument("--edges-per-node", type=int, default=12)
    ap.add_argument("--levels", default="1,4")
    ap.add_argument("--input-dir", default=DEFAULT_INPUT)
    ap.add_argument("--reuse-input", action="store_true")
    args = ap.parse_args()

    lo, hi = (int(x) for x in args.levels.split(","))
    have = corpus_config(args.input_dir)
    want = (args.replicas, args.edges_per_node)
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
        lo=lo, hi=hi, runs=args.runs_per_level, reps=args.replicas,
        epn=args.edges_per_node,
        n_edges=levels[lo]["link_triangles"]["n_rows"],
        ideal=hi // lo, rows="\n".join(rows_md))
    (REPO / "BENCH" / "FAMILY_SCALING_R5.md").write_text(md)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

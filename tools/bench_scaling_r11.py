"""Per-family scaling evidence for the round-5 close-out batch —
bucketized interval join (``intervaljoin.point_in_interval_join``),
sketch-pruned exact heavy hitters (``sketches.heavy_hitters``) and
asymmetric containment pairs (``dedup.containment_pairs``) — run at
two parallelism levels on the SAME input, output digests compared
across levels.

Family shapes:

* ``interval``: one hash exchange per side on (key, bucket) — shuffle-
  carrying, so the honest pair is 1 -> 4 (BENCH/FAMILY_SCALING.md).
* ``hitters``: two md5 passes over the value column + a <=4096-row
  pass-1 exchange — compute-bound.
* ``containment``: md5-per-shingle fold + 2 hash exchanges (shingle
  hash, pair key) — compute-bound at the sizes below.

Inputs are generated from pure id arithmetic (no RNG).  Output
identity across levels is a (sum-of-md5-prefixes, row-count) digest.

Prints one JSON line and writes BENCH/FAMILY_SCALING_R11.md.  Pooled
use: re-invoke with --reuse-input and merge by per-level min; the
corpus marker refuses a mismatched reuse.

Usage: python tools/bench_scaling_r11.py [--runs-per-level 2]
       [--points 20000000] [--values 40000000] [--docs 300000]
       [--reuse-input] [--levels 1,4]
       [--families interval,hitters,containment]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DEFAULT_INPUT = "/tmp/scale_bench_r11_input"

RUN_SNIPPET = """
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from rca_pdf_extraction_pipeline_spark.session import get_spark
from rca_pdf_extraction_pipeline_spark.operators import dedup, intervaljoin, sketches

spark = get_spark("r11-family-scale", master="local[{cpus}]",
                  shuffle_partitions=max(16, 4 * {cpus}))

def mat(df):
    df.write.format("noop").mode("overwrite").save()

fam = {family!r}

def fn():
    if fam == "interval":
        pts = spark.read.parquet({input_dir!r} + "/points")
        ivs = spark.read.parquet({input_dir!r} + "/intervals")
        j = intervaljoin.point_in_interval_join(pts, ivs, on="k",
                                                bucket_seconds=3600)
        return j.select("k", "pid", "iid")
    if fam == "hitters":
        vals = spark.read.parquet({input_dir!r} + "/values")
        return sketches.heavy_hitters(vals, "v", threshold=100_000)
    docs = spark.read.parquet({input_dir!r} + "/docs")
    return dedup.containment_pairs(docs, shingle_size=5, df_cap=16,
                                   min_containment_micro=500_000)

def digest(df):
    row_md5 = F.md5(F.concat_ws(
        "\\u001f", *[F.col(c).cast("string") for c in df.columns]))
    return df.select(
        F.sum(F.conv(F.substring(row_md5, 1, 14), 16, 10)
              .cast("decimal(38,0)")).cast("string").alias("s"),
        F.count(F.lit(1)).alias("n")).collect()[0]

mat(fn().limit(4096))   # warm the plan shapes / generated classes
times = []
for _ in range({runs}):
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    t0 = time.time()
    mat(fn())
    times.append(round(time.time() - t0, 3))
d = digest(fn())
print(json.dumps({{"cpus": {cpus}, "best_sec": min(times),
                  "times": times, "rows": d.n, "output_hash": d.s}}))
spark.stop()
"""


def build_corpus(input_dir: str, points: int, values: int, docs: int) -> None:
    sys.path.insert(0, str(REPO))
    from pyspark.sql import functions as F

    from rca_pdf_extraction_pipeline_spark.session import get_spark

    spark = get_spark("r11-family-input", master="local[16]")
    ts = "timestampadd(SECOND, cast((id * 37) % 10000000 as int), " \
         "TIMESTAMP '2024-01-01 00:00:00')"
    (spark.range(points).repartition(64)
     .select((F.col("id") % 4096).cast("int").alias("k"),
             F.col("id").alias("pid"), F.expr(ts).alias("ts"))
     .write.mode("overwrite").parquet(f"{input_dir}/points"))
    lo = "timestampadd(SECOND, cast((id * 101) % 10000000 as int), " \
         "TIMESTAMP '2024-01-01 00:00:00')"
    (spark.range(points // 10).repartition(64)
     .select((F.col("id") % 4096).cast("int").alias("k"),
             F.col("id").alias("iid"), F.expr(lo).alias("lo"),
             F.expr(f"timestampadd(SECOND, cast(600 + (id % 7) * 600 as int),"
                    f" {lo})").alias("hi"))
     .write.mode("overwrite").parquet(f"{input_dir}/intervals"))
    # 30% of rows spread over 50 hot values, the rest over ~5M light ones
    v = ("CASE WHEN id % 10 < 3 THEN 'hot' || (id % 50) "
         "ELSE 'w' || ((id * 131) % 5000000) END")
    (spark.range(values).repartition(64)
     .select(F.expr(v).alias("v"))
     .write.mode("overwrite").parquet(f"{input_dir}/values"))
    # docs of 40-89 tokens; every 5th doc gets a 40-token snippet twin
    text = ("array_join(transform(sequence(0, 39 + (id * 7) % 50), "
            "t -> 'w' || ((id * 131 + t * 17) % 9973)), ' ')")
    base = (spark.range(docs).repartition(64)
            .select(F.col("id").alias("doc_id"), F.expr(text).alias("text")))
    snips = (base.filter(F.col("doc_id") % 5 == 0)
             .select((F.col("doc_id") + 100_000_000).alias("doc_id"),
                     F.array_join(F.slice(F.split("text", " "), 1, 40), " ")
                     .alias("text")))
    (base.unionByName(snips)
     .write.mode("overwrite").parquet(f"{input_dir}/docs"))
    spark.stop()
    (Path(input_dir) / "_CORPUS").write_text(f"{points},{values},{docs}")


def corpus_config(input_dir: str) -> str | None:
    marker = Path(input_dir) / "_CORPUS"
    return marker.read_text() if marker.exists() else None


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


FAMILIES = ("interval", "hitters", "containment")

HEADLINE_MD = """# Round-5 family scaling — close-out batch (interval join, heavy hitters, containment)

Same input, same code, local[{lo}] vs local[{hi}] ({runs} runs per
level, best wall; one fresh JVM per (level, family)).  Output digests
(order-independent sum of per-row md5 prefixes + row count) are
compared across levels — equal digest = identical results at every
parallelism.

Inputs (pure id arithmetic, no RNG): interval = {points} points +
{ivs} intervals over 4096 keys, 600-4200 s windows, W=3600 buckets;
hitters = {values} values (30% over 50 hot values, rest over ~5M
light); containment = {docs} docs of 40-89 tokens + a 40-token
snippet twin for every 5th doc.

| family | local[{lo}] best (s) | local[{hi}] best (s) | speedup | efficiency (ideal {ideal}x) | outputs identical |
| --- | --- | --- | --- | --- | --- |
{rows}

Pooling protocol: identical to BENCH/FAMILY_SCALING.md — rerun with
`--reuse-input`, merge by per-level min; the `_CORPUS` marker refuses a
corpus built with different sizes.
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs-per-level", type=int, default=2)
    ap.add_argument("--points", type=int, default=20_000_000)
    ap.add_argument("--values", type=int, default=40_000_000)
    ap.add_argument("--docs", type=int, default=300_000)
    ap.add_argument("--levels", default="1,4")
    ap.add_argument("--input-dir", default=DEFAULT_INPUT)
    ap.add_argument("--reuse-input", action="store_true")
    ap.add_argument("--families", default=",".join(FAMILIES))
    args = ap.parse_args()
    families = tuple(args.families.split(","))
    assert all(f in FAMILIES for f in families), families

    lo, hi = (int(x) for x in args.levels.split(","))
    want = f"{args.points},{args.values},{args.docs}"
    if not args.reuse_input or corpus_config(args.input_dir) != want:
        build_corpus(args.input_dir, args.points, args.values, args.docs)

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
        same = a["output_hash"] == b["output_hash"] and a["rows"] == b["rows"]
        result[fam] = {"speedup": round(speed, 3),
                       "efficiency": round(eff, 3), "hash_match": same}
        rows_md.append(
            f"| {fam} | {a['best_sec']} | {b['best_sec']} | "
            f"{speed:.2f}x | {eff:.3f} | {'yes' if same else 'NO'} |")

    if families == FAMILIES:
        md = HEADLINE_MD.format(
            lo=lo, hi=hi, runs=args.runs_per_level, points=args.points,
            ivs=args.points // 10, values=args.values, docs=args.docs,
            ideal=hi // lo, rows="\n".join(rows_md))
        (REPO / "BENCH" / "FAMILY_SCALING_R11.md").write_text(md)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

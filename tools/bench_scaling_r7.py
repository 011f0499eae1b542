"""Per-family scaling evidence for the round-5 final additions —
perceptual dHash image dedup (``multimodal.media_dhash`` +
``media_dhash_pairs``) and the Z-order layout key + bucket audit
(``plans/layout``) — run at two parallelism levels on the SAME
deterministic input, output hashes compared across levels.

Family shapes:

* ``media_dhash``: the corpus-proportional stage is the Arrow-batched
  decode+pool (numpy per image, CPU-bound, embarrassingly parallel);
  the banded pair join over the signatures is tiny by comparison.
  Input = pre-encoded textured BMPs on parquet (the production shape:
  payloads arrive encoded), sized so decode dominates.
* ``zorder``: pure codegen'd shift/mask arithmetic + one partial-agg
  shuffle over 64 buckets — generated via ``spark.range`` (splittable)
  so the measurement is the arithmetic, not an unsplittable file read
  (the r4 lesson: size input so COMPUTE dominates or scaling reads
  negative).

Both follow the 1 -> 4 convention of the CPU-bound families
(BENCH/FAMILY_SCALING.md bus ceiling).  Prints one JSON line and
writes BENCH/FAMILY_SCALING_R7.md.  Pooled use: re-invoke with
--reuse-input and merge by per-level min; the corpus marker refuses a
mismatched reuse.

Usage: python tools/bench_scaling_r7.py [--runs-per-level 2]
       [--images 32768] [--zorder-rows 100000000] [--reuse-input]
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
DEFAULT_INPUT = "/tmp/scale_bench_r7_input"

RUN_SNIPPET = """
import hashlib, json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from rca_pdf_extraction_pipeline_spark.session import get_spark
from rca_pdf_extraction_pipeline_spark.operators import multimodal as mm
from rca_pdf_extraction_pipeline_spark.plans import layout

spark = get_spark("r7-family-scale", master="local[{cpus}]",
                  shuffle_partitions=max(16, 4 * {cpus}))

def mat(df):
    df.write.format("noop").mode("overwrite").save()

if {family!r} == "media_dhash":
    # corpus is written as 64 parquet files => already splittable at
    # every level; no extra exchange in the timed path
    media = spark.read.parquet({input_dir!r} + "/media")
    n_rows = media.count()
    def fn():
        sigs = mm.media_dhash(media).filter("ok")
        from rca_pdf_extraction_pipeline_spark.operators import dedup
        return dedup.simhash_pairs_from_signatures(
            sigs.select("media_ref", "sig_hi", "sig_lo"),
            id_col="media_ref", max_hamming=2)
    warm_df = mm.media_dhash(media.limit(512))
    hash_df = lambda: fn()
    hash_cols = ["id_a", "id_b", "hamming"]
else:
    n_rows = {zorder_rows}
    def fn():
        base = spark.range(n_rows).select(
            (F.col("id") % 65536).cast("int").alias("x"),
            ((F.col("id") / 7).cast("long") % 65536).cast("int").alias("y"))
        z = layout.zorder_key(["x", "y"], bits=16)
        return (base.withColumn("zb", F.shiftright(z, 26).cast("int"))
                .groupBy("zb")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.min("x").alias("x_min"), F.max("x").alias("x_max"),
                     F.min("y").alias("y_min"), F.max("y").alias("y_max")))
    warm_df = fn().limit(1)
    hash_df = lambda: fn()
    hash_cols = ["zb", "n", "x_min", "x_max", "y_min", "y_max"]

mat(warm_df)   # warm the exact plan shapes / generated classes
times = []
for _ in range({runs}):
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    t0 = time.time()
    mat(fn())
    times.append(round(time.time() - t0, 3))
rows = hash_df().select(*hash_cols).collect()
h = hashlib.sha256()
for r in sorted(tuple(str(v) for v in row) for row in rows):
    h.update("\\u001f".join(r).encode())
print(json.dumps({{"cpus": {cpus}, "n_rows": n_rows,
                  "best_sec": min(times), "times": times,
                  "rows": len(rows), "output_hash": h.hexdigest()}}))
spark.stop()
"""


def build_corpus(input_dir: str, images: int) -> None:
    sys.path.insert(0, str(REPO))
    from pyspark.sql import functions as F

    from rca_pdf_extraction_pipeline_spark.operators import multimodal as mm
    from rca_pdf_extraction_pipeline_spark.session import get_spark

    spark = get_spark("r7-family-input", master="local[16]")
    ids = spark.range(images).select(F.col("id").alias("doc_id")) \
        .repartition(64)
    # grid_mod = images//2 plants one near-pair per grid like the entry
    # fixture, so the pair join has real output at every level
    mm.synth_grid_bmp_media(ids, grid_mod=images // 2) \
        .write.mode("overwrite").parquet(f"{input_dir}/media")
    spark.stop()
    (Path(input_dir) / "_CORPUS").write_text(str(images))


def corpus_config(input_dir: str) -> int | None:
    marker = Path(input_dir) / "_CORPUS"
    return int(marker.read_text()) if marker.exists() else None


def run_one(cpus: int, family: str, input_dir: str, runs: int,
            zorder_rows: int) -> dict:
    code = RUN_SNIPPET.format(repo=str(REPO), cpus=cpus, family=family,
                              input_dir=input_dir, runs=runs,
                              zorder_rows=zorder_rows)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3600)
    if out.returncode != 0:
        raise RuntimeError(
            f"level {cpus} family {family} failed:\n{out.stderr[-3000:]}")
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


FAMILIES = ("media_dhash", "zorder")

HEADLINE_MD = """# Round-5 family scaling — perceptual dHash, Z-order layout

Same input, same code, local[{lo}] vs local[{hi}] ({runs} runs per
level, best wall; one fresh JVM per (level, family)).  Output hashes
are compared across levels — equal hash = bit-identical rows at every
parallelism.

Inputs: {images} pre-encoded textured BMPs on parquet (dHash: decode +
pool + banded pair join, one planted near-pair per grid id);
{zrows} generated rows (zorder: 16-bit Morton interleave + 64-bucket
footer-stat aggregate — splittable range input so the arithmetic is
what is measured).

| family | local[{lo}] best (s) | local[{hi}] best (s) | speedup | efficiency (ideal {ideal}x) | outputs identical |
| --- | --- | --- | --- | --- | --- |
{rows}

Pooling protocol: identical to BENCH/FAMILY_SCALING.md — rerun with
`--reuse-input`, merge by per-level min; the `_CORPUS` marker refuses a
corpus built with different --images.
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs-per-level", type=int, default=2)
    ap.add_argument("--images", type=int, default=32768)
    ap.add_argument("--zorder-rows", type=int, default=100_000_000)
    ap.add_argument("--levels", default="1,4")
    ap.add_argument("--input-dir", default=DEFAULT_INPUT)
    ap.add_argument("--reuse-input", action="store_true")
    args = ap.parse_args()

    lo, hi = (int(x) for x in args.levels.split(","))
    if not args.reuse_input or corpus_config(args.input_dir) != args.images:
        build_corpus(args.input_dir, args.images)

    t0 = time.time()
    levels = {}
    for cpus in (lo, hi):
        levels[cpus] = {fam: run_one(cpus, fam, args.input_dir,
                                     args.runs_per_level, args.zorder_rows)
                        for fam in FAMILIES}

    rows_md = []
    result = {"levels": levels, "wall_s": round(time.time() - t0, 1)}
    for fam in FAMILIES:
        a, b = levels[lo][fam], levels[hi][fam]
        speed = a["best_sec"] / b["best_sec"]
        eff = speed / (hi / lo)
        same = a["output_hash"] == b["output_hash"]
        result[fam] = {"speedup": round(speed, 3),
                       "efficiency": round(eff, 3), "hash_match": same}
        rows_md.append(
            f"| {fam} | {a['best_sec']} | {b['best_sec']} | "
            f"{speed:.2f}x | {eff:.3f} | {'yes' if same else 'NO'} |")

    md = HEADLINE_MD.format(
        lo=lo, hi=hi, runs=args.runs_per_level, images=args.images,
        zrows=args.zorder_rows, ideal=hi // lo, rows="\n".join(rows_md))
    (REPO / "BENCH" / "FAMILY_SCALING_R7.md").write_text(md)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""Per-family scaling evidence for the round-5 WINNOWING family —
exploded fingerprint selection (``textanalysis.winnow_fingerprints``)
and MOSS pair mining over the selected hashes
(``dedup.winnow_overlap_pairs``) — run at two parallelism levels on
the SAME input, output digests compared across levels.

Family shapes:

* ``winnow``: fully NARROW (one md5 per 3-gram into a projected layer,
  then constant-width window min passes; the only Generate is the
  final explode) — the best-case scaling shape, like r11's parse.
* ``winnow_pairs``: the narrow selection + TWO hash exchanges (posting
  lists per selected hash, then the per-pair count).  Shuffle payload
  is (hash, id) longs only — expect the 1->4 pair to clear the gate
  like the other hash-agg-bound families, with 4->16 bus-bound.

Input = generated parent documents from pure id arithmetic (no RNG;
same token recipe as bench_scaling_r11) + a 40-token snippet row for
every 5th parent (ids offset by 10^9), so the pair family has genuine
overlap mass to mine.  Output identity across levels is a
(sum-of-md5-prefixes, row-count) digest.

Prints one JSON line and writes BENCH/FAMILY_SCALING_R12.md.  Pooled
use: re-invoke with --reuse-input and merge by per-level min; the
corpus marker refuses a mismatched reuse.  Scaling runs MUST be the
only load on the box (CLAUDE.md).

Usage: python tools/bench_scaling_r12.py [--runs-per-level 2]
       [--docs 500000] [--reuse-input] [--levels 1,4]
       [--families winnow,winnow_pairs]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DEFAULT_INPUT = "/tmp/scale_bench_r12_input"

RUN_SNIPPET = """
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from rca_pdf_extraction_pipeline_spark.session import get_spark
from rca_pdf_extraction_pipeline_spark.operators import dedup
from rca_pdf_extraction_pipeline_spark.operators import textanalysis as TA

spark = get_spark("r12-family-scale", master="local[{cpus}]",
                  shuffle_partitions=max(16, 4 * {cpus}))

def mat(df):
    df.write.format("noop").mode("overwrite").save()

docs = spark.read.parquet({input_dir!r} + "/docs")
n_rows = docs.count()

def fn(d):
    fam = {family!r}
    if fam == "winnow":
        return TA.winnow_fingerprints(d, k=3, w=4)
    return dedup.winnow_overlap_pairs(d, k=3, w=4, df_cap=16,
                                      min_shared=2)

def digest(df):
    row_md5 = F.md5(F.concat_ws(
        "\\u001f", *[F.col(c).cast("string") for c in df.columns]))
    return df.select(
        F.sum(F.conv(F.substring(row_md5, 1, 14), 16, 10)
              .cast("decimal(38,0)")).cast("string").alias("s"),
        F.count(F.lit(1)).alias("n")).collect()[0]

mat(fn(docs.limit(4096)))   # warm the plan shapes / generated classes
times = []
for _ in range({runs}):
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    t0 = time.time()
    mat(fn(docs))
    times.append(round(time.time() - t0, 3))
d = digest(fn(docs))
print(json.dumps({{"cpus": {cpus}, "n_rows": n_rows,
                  "best_sec": min(times), "times": times,
                  "rows": d.n, "output_hash": d.s}}))
spark.stop()
"""


def build_corpus(input_dir: str, docs: int) -> None:
    sys.path.insert(0, str(REPO))
    from pyspark.sql import functions as F

    from rca_pdf_extraction_pipeline_spark.session import get_spark

    spark = get_spark("r12-family-input", master="local[16]")
    # token = Knuth-mixed f(id, t): ~10^6 token vocabulary and grams that
    # are DOC-SPECIFIC (r11's linear recipe yields only 9973 distinct
    # 3-grams corpus-wide — every posting list would blow past df_cap
    # and the pair family would have nothing to mine; here postings are
    # almost all the genuine (parent, snippet) size-2 lists)
    text = ("array_join(transform(sequence(0, 39 + (id * 7) % 50), "
            "t -> 'w' || (((id * 131 + t * 17) * 2654435761) % 999983)), "
            "' ')")
    parents = (spark.range(docs)
               .repartition(64)
               .select(F.col("id").alias("doc_id"),
                       F.expr(text).alias("text")))
    snips = (parents.filter(F.col("doc_id") % 5 == 0)
             .select((F.col("doc_id") + 1_000_000_000).alias("doc_id"),
                     F.array_join(F.slice(F.split("text", " "), 1, 40), " ")
                     .alias("text")))
    (parents.unionByName(snips)
     .write.mode("overwrite").parquet(f"{input_dir}/docs"))
    spark.stop()
    (Path(input_dir) / "_CORPUS").write_text(str(docs))


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


FAMILIES = ("winnow", "winnow_pairs")

HEADLINE_MD = """# Round-5 family scaling — winnowing (fingerprints, pair mining)

Same input, same code, local[{lo}] vs local[{hi}] ({runs} runs per
level, best wall; one fresh JVM per (level, family)).  Output digests
(order-independent sum of per-row md5 prefixes + row count) are
compared across levels — equal digest = identical results at every
parallelism.

Input: {docs} generated parent documents of 40-89 synthetic tokens
(pure id arithmetic through a Knuth multiplicative mix, no RNG — grams
are doc-specific, so posting lists are almost all genuine size-2
(parent, snippet) lists) + one 40-token snippet per 5th parent, so the
pair family mines genuine overlap mass.

| family | local[{lo}] best (s) | local[{hi}] best (s) | speedup | efficiency (ideal {ideal}x) | outputs identical |
| --- | --- | --- | --- | --- | --- |
{rows}

Pooling protocol: identical to BENCH/FAMILY_SCALING.md — rerun with
`--reuse-input`, merge by per-level min; the `_CORPUS` marker refuses a
corpus built with a different size.
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs-per-level", type=int, default=2)
    ap.add_argument("--docs", type=int, default=500_000)
    ap.add_argument("--levels", default="1,4")
    ap.add_argument("--input-dir", default=DEFAULT_INPUT)
    ap.add_argument("--reuse-input", action="store_true")
    ap.add_argument("--families", default=",".join(FAMILIES))
    args = ap.parse_args()
    families = tuple(args.families.split(","))
    assert all(f in FAMILIES for f in families), families

    lo, hi = (int(x) for x in args.levels.split(","))
    if not args.reuse_input or corpus_config(args.input_dir) != str(args.docs):
        build_corpus(args.input_dir, args.docs)

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
            lo=lo, hi=hi, runs=args.runs_per_level, docs=args.docs,
            ideal=hi // lo, rows="\n".join(rows_md))
        (REPO / "BENCH" / "FAMILY_SCALING_R12.md").write_text(md)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

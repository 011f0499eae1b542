"""Per-family scaling evidence for the round-5 late additions —
snapshot drift detection (``profiling.corpus_drift``) and BPE merge
training (``bpe.bpe_train``) — run at two parallelism levels on the
SAME deterministic input, output hashes compared across levels.

Both families are one-corpus-token-pass shapes: explode + md5 bucket
hash + a tiny aggregate (drift: 512 rows; BPE: the word-frequency
table, constant across replicas since replication repeats words).  The
corpus-proportional stage is the token scan, which is CPU-bound (md5 /
regex per token), so the honest N -> 4N pair follows the token-fold
families' 1 -> 4 convention (BENCH/FAMILY_SCALING.md bus ceiling).

Corpus: sf0.1 documents x --replicas with id offsets (text unchanged —
bigger corpus, same vocabulary; that is exactly the BPE scale shape:
the scan grows, the merge rounds do not).

Prints one JSON line and writes BENCH/FAMILY_SCALING_R6.md.  Pooled
use: re-invoke with --reuse-input and merge by per-level min; the
corpus marker refuses a mismatched reuse.

Usage: python tools/bench_scaling_r6.py [--runs-per-level 2]
       [--replicas 16] [--n-merges 4] [--reuse-input] [--levels 1,4]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DEFAULT_INPUT = "/tmp/scale_bench_r6_input"

RUN_SNIPPET = """
import hashlib, json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from rca_pdf_extraction_pipeline_spark.session import get_spark
from rca_pdf_extraction_pipeline_spark.operators import bpe
from rca_pdf_extraction_pipeline_spark.operators.profiling import corpus_drift

spark = get_spark("r6-family-scale", master="local[{cpus}]",
                  shuffle_partitions=max(16, 4 * {cpus}))

def mat(df):
    df.write.format("noop").mode("overwrite").save()

docs = spark.read.parquet({input_dir!r} + "/docs")
sub = docs.where(F.col("doc_id") % 64 == 0)

def drift(d):
    return corpus_drift(d.where(F.col("source") != 'src1'),
                        d.where(F.col("source") == 'src1'),
                        n_buckets=512, top_k=30)

if {family!r} == "corpus_drift":
    warm = lambda: drift(sub)
    fn = lambda: drift(docs)
    hash_cols = ["bucket", "n_old", "n_new", "log_ratio", "l1_term"]
else:
    warm = lambda: bpe.bpe_train(sub, {n_merges})
    fn = lambda: bpe.bpe_train(docs, {n_merges})
    hash_cols = ["rank", "left", "right", "pair_count"]

n_rows = docs.count()
mat(warm())   # warm the exact plan shapes / generated classes
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


def build_corpus(input_dir: str, replicas: int) -> None:
    sys.path.insert(0, str(REPO))
    from pyspark.sql import functions as F

    from rca_pdf_extraction_pipeline_spark.session import get_spark

    spark = get_spark("r6-family-input", master="local[8]")
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet") \
        .select("doc_id", "source", "text")
    parts = None
    for k in range(replicas):
        part = docs.select(
            (F.col("doc_id") + F.lit(k * 1_000_000)).alias("doc_id"),
            "source", "text")
        parts = part if parts is None else parts.unionByName(part)
    parts.repartition(64).write.mode("overwrite") \
        .parquet(f"{input_dir}/docs")
    spark.stop()
    (Path(input_dir) / "_CORPUS").write_text(str(replicas))


def corpus_config(input_dir: str) -> int | None:
    marker = Path(input_dir) / "_CORPUS"
    return int(marker.read_text()) if marker.exists() else None


def run_one(cpus: int, family: str, input_dir: str, runs: int,
            n_merges: int) -> dict:
    code = RUN_SNIPPET.format(repo=str(REPO), cpus=cpus, family=family,
                              input_dir=input_dir, runs=runs,
                              n_merges=n_merges)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3600)
    if out.returncode != 0:
        raise RuntimeError(
            f"level {cpus} family {family} failed:\n{out.stderr[-3000:]}")
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


FAMILIES = ("corpus_drift", "bpe_train")

HEADLINE_MD = """# Round-5 family scaling — corpus drift, BPE training

Same input, same code, local[{lo}] vs local[{hi}] ({runs} runs per
level, best wall; one fresh JVM per (level, family)).  Output hashes
are compared across levels — equal hash = bit-identical rows at every
parallelism.

Corpus: sf0.1 documents x {reps} replicas ({n_rows} docs; replication
repeats words, so the BPE vocab — and therefore per-round cost — is
constant while the corpus-proportional token scan grows, exactly the
production shape).  BPE trains {n_merges} merges.

| family | local[{lo}] best (s) | local[{hi}] best (s) | speedup | efficiency (ideal {ideal}x) | outputs identical |
| --- | --- | --- | --- | --- | --- |
{rows}

Pooling protocol: identical to BENCH/FAMILY_SCALING.md — rerun with
`--reuse-input`, merge by per-level min; the `_CORPUS` marker refuses a
corpus built with different replicas.
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs-per-level", type=int, default=2)
    ap.add_argument("--replicas", type=int, default=16)
    ap.add_argument("--n-merges", type=int, default=4)
    ap.add_argument("--levels", default="1,4")
    ap.add_argument("--input-dir", default=DEFAULT_INPUT)
    ap.add_argument("--reuse-input", action="store_true")
    args = ap.parse_args()

    lo, hi = (int(x) for x in args.levels.split(","))
    if not args.reuse_input or corpus_config(args.input_dir) != args.replicas:
        build_corpus(args.input_dir, args.replicas)

    t0 = time.time()
    levels = {}
    for cpus in (lo, hi):
        levels[cpus] = {fam: run_one(cpus, fam, args.input_dir,
                                     args.runs_per_level, args.n_merges)
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
        lo=lo, hi=hi, runs=args.runs_per_level, reps=args.replicas,
        n_rows=levels[lo][FAMILIES[0]]["n_rows"],
        n_merges=args.n_merges, ideal=hi // lo, rows="\n".join(rows_md))
    (REPO / "BENCH" / "FAMILY_SCALING_R6.md").write_text(md)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

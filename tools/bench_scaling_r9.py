"""Per-family scaling evidence for the round-5 REWRITE family —
corpus-global keep-first paragraph dedup (``dedup.dedup_paragraphs``)
and the ExactSubstr removal step
(``substring_dedup.trim_duplicated_ranges``) — run at two parallelism
levels on the SAME deterministic input, output hashes compared across
levels.

Family shapes (both shuffle-carrying, so the honest pair is 1 -> 4,
like CC/PageRank in BENCH/FAMILY_SCALING.md):

* ``para_dedup``: md5 per paragraph, winner groupBy(h) agg, join-back
  on h, groupBy(id) reassembly — two hash exchanges of the paragraph
  table.
* ``substr_trim``: the gram stage (k element_at + md5 per token
  position) dominates compute; gram-hash shuffle + island windows +
  the slim ranges join-back.

Input = generated documents from pure id arithmetic (no RNG): each doc
is ``paras-per-doc`` paragraphs of ``tokens-per-para`` synthetic words;
1 paragraph in ``dup-every`` draws from a ``pool``-paragraph dup pool
(recurring ~docs*paras/(dup_every*pool) times) and the rest are
globally unique — a realistic duplication mixture exercising BOTH
families (the shared paragraphs are also duplicated 8-gram runs).  Two
text columns ride the same table: ``text_nl`` (paragraphs joined by
newline, the para_dedup input) and ``text_sp`` (joined by space, the
substr_trim input).

Prints one JSON line and writes BENCH/FAMILY_SCALING_R9.md.  Pooled
use: re-invoke with --reuse-input and merge by per-level min; the
corpus marker refuses a mismatched reuse.

Usage: python tools/bench_scaling_r9.py [--runs-per-level 2]
       [--docs 30000] [--reuse-input] [--levels 1,4]
       [--families para_dedup,substr_trim]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DEFAULT_INPUT = "/tmp/scale_bench_r9_input"

RUN_SNIPPET = """
import hashlib, json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from rca_pdf_extraction_pipeline_spark.session import get_spark
from rca_pdf_extraction_pipeline_spark.operators import dedup as D
from rca_pdf_extraction_pipeline_spark.operators import substring_dedup as SD

spark = get_spark("r9-family-scale", master="local[{cpus}]",
                  shuffle_partitions=max(16, 4 * {cpus}))

def mat(df):
    df.write.format("noop").mode("overwrite").save()

docs = spark.read.parquet({input_dir!r} + "/docs")
n_rows = docs.count()

if {family!r} == "para_dedup":
    inp = docs.select("doc_id", F.col("text_nl").alias("text"))
    def fn():
        return D.dedup_paragraphs(inp)
    warm_df = D.dedup_paragraphs(inp.limit(2048))
else:
    inp = docs.select("doc_id", F.col("text_sp").alias("text"))
    def fn():
        return SD.trim_duplicated_ranges(inp)
    warm_df = SD.trim_duplicated_ranges(inp.limit(2048))

def slim(df):
    keep = [c for c in df.columns if c != "clean_text"]
    return df.select(*keep, F.md5("clean_text").alias("text_md5"))

mat(slim(warm_df))   # warm the exact plan shapes / generated classes
times = []
for _ in range({runs}):
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    t0 = time.time()
    mat(slim(fn()))
    times.append(round(time.time() - t0, 3))
rows = slim(fn()).collect()
h = hashlib.sha256()
for r in sorted(tuple(str(v) for v in row) for row in rows):
    h.update("\\u001f".join(r).encode())
print(json.dumps({{"cpus": {cpus}, "n_rows": n_rows,
                  "best_sec": min(times), "times": times,
                  "rows": len(rows), "output_hash": h.hexdigest()}}))
spark.stop()
"""


def build_corpus(input_dir: str, docs: int, paras: int, toks: int,
                 pool: int, dup_every: int) -> None:
    sys.path.insert(0, str(REPO))
    from pyspark.sql import functions as F

    from rca_pdf_extraction_pipeline_spark.session import get_spark

    spark = get_spark("r9-family-input", master="local[16]")
    # 1 paragraph in dup_every draws its seed from a small pool (each
    # recurring ~docs*paras/(dup_every*pool) times); the rest get a
    # globally unique seed.  The seed itself leads the paragraph as a
    # token ('p<seed>'), so distinct seeds are distinct paragraphs
    # by construction and equal seeds are verbatim duplicates — a
    # realistic ~1/dup_every duplication mixture, not the all-dup
    # worst case a plain modular seed produces.
    seed = (f"(CASE WHEN (id * 31 + j) % {dup_every} = 0 "
            f"THEN (id * 31 + j) % {pool} "
            f"ELSE {pool} + id * 31 + j END)")
    para = (f"transform(sequence(0, {paras - 1}), j -> "
            f"array_join(concat(array('p' || {seed}), "
            f"transform(sequence(1, {toks - 1}), t -> "
            f"'w' || ({seed} * 101 + t * 17) % 9973)), ' '))")
    (spark.range(docs)
     .repartition(64)
     .select(F.col("id").alias("doc_id"),
             F.array_join(F.expr(para), "\n").alias("text_nl"),
             F.array_join(F.expr(para), " ").alias("text_sp"))
     .write.mode("overwrite").parquet(f"{input_dir}/docs"))
    spark.stop()
    (Path(input_dir) / "_CORPUS").write_text(
        f"{docs}:{paras}:{toks}:{pool}:{dup_every}")


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


FAMILIES = ("para_dedup", "substr_trim")

HEADLINE_MD = """# Round-5 family scaling — rewrite family (paragraph dedup, substring trim)

Same input, same code, local[{lo}] vs local[{hi}] ({runs} runs per
level, best wall; one fresh JVM per (level, family)).  Output hashes
(md5 of every rewritten text + the count columns) are compared across
levels — equal hash = bit-identical rewrites at every parallelism.

Input: {docs} generated documents of {paras} x {toks}-token paragraphs
(pure id arithmetic, no RNG); 1 paragraph in {dup_every} is drawn from
a {pool}-paragraph dup pool and the rest are globally unique — a
realistic duplication mixture, so both the keep-first winner table and
the duplicated 8-gram ranges are genuinely exercised without the
all-duplicated worst case.

| family | local[{lo}] best (s) | local[{hi}] best (s) | speedup | efficiency (ideal {ideal}x) | outputs identical |
| --- | --- | --- | --- | --- | --- |
{rows}

Pooling protocol: identical to BENCH/FAMILY_SCALING.md — rerun with
`--reuse-input`, merge by per-level min; the `_CORPUS` marker refuses a
corpus built with different sizing.
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs-per-level", type=int, default=2)
    ap.add_argument("--docs", type=int, default=30_000)
    ap.add_argument("--paras-per-doc", type=int, default=8)
    ap.add_argument("--tokens-per-para", type=int, default=25)
    ap.add_argument("--pool", type=int, default=10_000,
                    help="distinct duplicated paragraphs")
    ap.add_argument("--dup-every", type=int, default=5,
                    help="1 paragraph in N is drawn from the dup pool")
    ap.add_argument("--levels", default="1,4")
    ap.add_argument("--input-dir", default=DEFAULT_INPUT)
    ap.add_argument("--reuse-input", action="store_true")
    ap.add_argument("--families", default=",".join(FAMILIES))
    args = ap.parse_args()
    families = tuple(args.families.split(","))
    assert all(f in FAMILIES for f in families), families

    cfg = (f"{args.docs}:{args.paras_per_doc}:{args.tokens_per_para}"
           f":{args.pool}:{args.dup_every}")
    lo, hi = (int(x) for x in args.levels.split(","))
    if not args.reuse_input or corpus_config(args.input_dir) != cfg:
        build_corpus(args.input_dir, args.docs, args.paras_per_doc,
                     args.tokens_per_para, args.pool, args.dup_every)

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
            lo=lo, hi=hi, runs=args.runs_per_level, docs=args.docs,
            paras=args.paras_per_doc, toks=args.tokens_per_para,
            pool=args.pool, dup_every=args.dup_every,
            ideal=hi // lo, rows="\n".join(rows_md))
        (REPO / "BENCH" / "FAMILY_SCALING_R9.md").write_text(md)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""Per-family scaling evidence for the round-5 RAW-HTML EXTRACTION
family — DOM block parse (``htmlparse.parse_blocks``), shuffle-free
main-content spans (``htmlparse.to_spans(content_only=True)``) and
anchor-graph census (``htmlparse.extract_links`` + site aggregate) —
run at two parallelism levels on the SAME input, output digests
compared across levels.

Family shapes:

* ``parse`` / ``main_spans``: fully NARROW (regex sentinel rewrite +
  in-array scoring; the only Generate is the final explode) —
  compute-bound regex/string work, the best-case scaling shape.
* ``link_census``: narrow extraction + ONE tiny hash aggregate
  (7 destination hosts) — shuffle width is constant, so it should
  scale like the narrow families.

Input = generated documents from pure id arithmetic (no RNG; same
corpus recipe as bench_scaling_r10), lifted to markup IN-PLAN by
``synth_html`` so the regex parse dominates the wall.  Output identity
across levels is a (sum-of-md5-prefixes, row-count) digest.

Prints one JSON line and writes BENCH/FAMILY_SCALING_R11.md.  Pooled
use: re-invoke with --reuse-input and merge by per-level min; the
corpus marker refuses a mismatched reuse.

Usage: python tools/bench_scaling_r11.py [--runs-per-level 2]
       [--docs 2000000] [--reuse-input] [--levels 1,4]
       [--families parse,main_spans,link_census]
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
from rca_pdf_extraction_pipeline_spark.operators import htmlparse as HP

spark = get_spark("r11-family-scale", master="local[{cpus}]",
                  shuffle_partitions=max(16, 4 * {cpus}))

def mat(df):
    df.write.format("noop").mode("overwrite").save()

docs = spark.read.parquet({input_dir!r} + "/docs")
n_rows = docs.count()

def fn(d):
    corpus = HP.synth_html(d)
    fam = {family!r}
    if fam == "parse":
        return HP.parse_blocks(corpus)
    if fam == "main_spans":
        sp = HP.to_spans(corpus, content_only=True)
        return (sp.select("doc_id", F.explode_outer("spans").alias("s"))
                .filter(F.col("s").isNotNull())
                .select("doc_id", "s.offset", "s.kind", "s.text",
                        "s.media_ref"))
    links = HP.extract_links(corpus, base_col="site")
    host = F.regexp_extract("url", "https://([^/]+)", 1)
    return (links.groupBy(host.alias("dst_site"))
            .agg(F.count(F.lit(1)).alias("n_links"),
                 F.countDistinct("doc_id").alias("n_docs")))

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

    spark = get_spark("r11-family-input", master="local[16]")
    text = ("array_join(transform(sequence(0, 39 + (id * 7) % 50), "
            "t -> 'w' || ((id * 131 + t * 17) % 9973)), ' ')")
    (spark.range(docs)
     .repartition(64)
     .select(F.col("id").alias("doc_id"), F.expr(text).alias("text"))
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


FAMILIES = ("parse", "main_spans", "link_census")

HEADLINE_MD = """# Round-5 family scaling — raw-HTML extraction (parse, main_spans, link_census)

Same input, same code, local[{lo}] vs local[{hi}] ({runs} runs per
level, best wall; one fresh JVM per (level, family)).  Output digests
(order-independent sum of per-row md5 prefixes + row count) are
compared across levels — equal digest = identical results at every
parallelism.

Input: {docs} generated documents of 40-89 synthetic tokens (pure id
arithmetic, no RNG), lifted to markup in-plan by ``synth_html`` so the
sentinel-split regex parse dominates the wall.

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
    ap.add_argument("--docs", type=int, default=2_000_000)
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
        (REPO / "BENCH" / "FAMILY_SCALING_R11.md").write_text(md)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""Per-family scaling evidence (round-3 item): the three heaviest
LLM-pipeline operator families — connected-components dedup, exact
substring dedup, inverted index — run on the SAME deterministic text
corpus at local[4] vs local[16] (the honest N -> 4N stand-in per
BENCH/BASELINE.md: both levels below the shared-DRAM-bus ceiling).

Prints one JSON line and writes BENCH/FAMILY_SCALING.md.  Pooled use:
re-invoke with --reuse-input and merge by min, like bench_scaling.py.

Corpus: sf0.1 documents x N near-dup replicas (default 9; replica k appends a
" rep<k>" token, so replicas are near- but not exact dups — CC gets
real multi-node components, substring dedup gets real shared grams).

Usage: python tools/bench_scaling_families.py [--runs-per-level 2]
       [--reuse-input] [--levels 4,16]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

#: one subprocess per (level, family): the CC label loop pins
#: localCheckpoint blocks for the session's lifetime, which starved the
#: substring family's dup-gram broadcast when the three shared one JVM
RUN_SNIPPET = """
import hashlib, json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from rca_pdf_extraction_pipeline_spark.session import get_spark
from rca_pdf_extraction_pipeline_spark.operators import dedup, search, substring_dedup

# shuffle partitions scale with the level (4x cores — the 2-4x-total-
# cores cluster practice get_spark's own docstring prescribes); a fixed
# 32 gave local[16] a pathological 2-wave resonance on the CC label
# loop (60 s vs 14 s at 4x cores, measured)
spark = get_spark("family-scale", master="local[{cpus}]",
                  shuffle_partitions=max(16, 4 * {cpus}))
docs = spark.read.parquet({input_dir!r})
n_docs = docs.count()

FAMILIES = {{
    "dedup_corpus_cc": (
        lambda d: dedup.deduplicate_corpus_cc(d).select("doc_id"),
        ["doc_id"]),
    "substr_dup_ranges": (
        lambda d: substring_dedup.duplicated_ranges(d),
        ["doc_id", "start_tok", "end_tok", "n_dup_tokens"]),
    "inverted_index": (
        lambda d: search.inverted_index(d, min_df=5, max_postings=8)
                  .select("term", "df", "total_tf", "postings_len",
                          F.concat_ws(",", "postings").alias("p")),
        ["term", "df", "total_tf", "postings_len", "p"]),
}}
fn, hash_cols = FAMILIES[{family!r}]

def mat(df):
    df.write.format("noop").mode("overwrite").save()

small = docs.where(F.col("doc_id") % 16 == 0)   # warm the exact shapes
mat(fn(small))
times = []
for _ in range({runs}):
    spark.sparkContext._jvm.System.gc()
    t0 = time.time()
    mat(fn(docs))
    times.append(round(time.time() - t0, 3))
rows = fn(docs).select(*hash_cols).collect()
h = hashlib.sha256()
for r in sorted(tuple(str(v) for v in row) for row in rows):
    h.update("\\u001f".join(r).encode())
print(json.dumps({{"cpus": {cpus}, "n_docs": n_docs,
                  "best_sec": min(times), "times": times,
                  "rows": len(rows), "output_hash": h.hexdigest()}}))
spark.stop()
"""


def build_corpus(input_dir: str, replicas: int = 3) -> None:
    sys.path.insert(0, str(REPO))
    from pyspark.sql import functions as F

    from rca_pdf_extraction_pipeline_spark.session import get_spark

    spark = get_spark("family-input", master="local[8]")
    raw = spark.read.parquet("/root/testdata/sf0.1/documents.parquet") \
        .select("doc_id", "text")
    reps = []
    for k in range(replicas):
        reps.append(raw.select(
            (F.col("doc_id") + F.lit(k * 1_000_000)).alias("doc_id"),
            (F.col("text") if k == 0
             else F.concat(F.col("text"), F.lit(f" rep{k}"))).alias("text")))
    corpus = reps[0]
    for r in reps[1:]:
        corpus = corpus.unionByName(r)
    corpus.repartition(64).write.mode("overwrite").parquet(input_dir)
    spark.stop()
    # marker: which --replicas built this corpus, so --reuse-input can
    # refuse a mismatched reuse and the MD label derives from reality
    (Path(input_dir) / "_REPLICAS").write_text(str(replicas))


def corpus_replicas(input_dir: str) -> int | None:
    """Replica count recorded when the corpus was built; None if the
    corpus predates the marker (force a rebuild in that case)."""
    marker = Path(input_dir) / "_REPLICAS"
    return int(marker.read_text()) if marker.exists() else None


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


FAMILIES = ("dedup_corpus_cc", "substr_dup_ranges", "inverted_index")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs-per-level", type=int, default=2)
    ap.add_argument("--replicas", type=int, default=9,
                    help="sf0.1 corpus replication factor; 9 (45k docs) "
                         "makes per-family compute dwarf the fixed "
                         "per-job costs (driver round-trips, AQE "
                         "coordination, CC round barriers) that capped "
                         "measured efficiency at ~0.5 on 15k docs")
    ap.add_argument("--levels", default="4,16")
    ap.add_argument("--reuse-input", action="store_true")
    args = ap.parse_args()
    lo, hi = (int(x) for x in args.levels.split(","))

    input_dir = str(Path(tempfile.gettempdir()) / "family_scale_input")
    t0 = time.time()
    # reuse only a corpus built with the SAME --replicas: silently
    # reusing (or silently rebuilding at a different factor) mislabels
    # the generated MD and breaks cross-run pooling (ADVICE r3)
    if not (args.reuse_input
            and Path(input_dir).exists()
            and corpus_replicas(input_dir) == args.replicas):
        build_corpus(input_dir, args.replicas)

    levels = {c: {fam: run_one(c, fam, input_dir, args.runs_per_level)
                  for fam in FAMILIES}
              for c in (lo, hi)}

    n_docs = levels[lo][FAMILIES[0]]["n_docs"]
    table, result = [], {"metric": "family_scaling_efficiency_N_to_4N",
                         "unit": "ratio", "levels": levels,
                         "n_docs": n_docs}
    for fam in FAMILIES:
        a, b = levels[lo][fam], levels[hi][fam]
        sp = a["best_sec"] / b["best_sec"]
        eff = round(sp / (hi / lo), 3)
        equal = a["output_hash"] == b["output_hash"] and a["rows"] == b["rows"]
        result[fam] = {"speedup": round(sp, 2), "efficiency": eff,
                       "outputs_identical": equal}
        table.append(f"| {fam} | {a['best_sec']} | {b['best_sec']} | "
                     f"{round(sp, 2)}x | **{eff}** | {a['rows']} | {equal} |")
    result["wall_total_sec"] = round(time.time() - t0, 1)
    print(json.dumps(result))

    md = f"""# Family scaling — LLM-pipeline operators (round 3)

Same job, same input ({n_docs} docs: sf0.1 text corpus x {args.replicas}
near-dup replicas), local[{lo}] vs local[{hi}] in fresh JVMs,
best-of-{args.runs_per_level} per level per family.

| family | local[{lo}] best (s) | local[{hi}] best (s) | speedup | \
efficiency (gate >= 0.8) | rows | outputs identical |
| --- | --- | --- | --- | --- | --- | --- |
{chr(10).join(table)}

Repro: `python tools/bench_scaling_families.py --reuse-input`
(pool across invocations by min, per BENCH/BASELINE.md protocol).
"""
    (REPO / "BENCH" / "FAMILY_SCALING.md").write_text(md)
    print(f"wrote {REPO / 'BENCH' / 'FAMILY_SCALING.md'}")


if __name__ == "__main__":
    main()

"""Round-5 close-out batch: bucketized interval (range) join,
sketch-pruned exact heavy hitters, asymmetric containment pairs.

Each operator is checked against a brute-force formulation of the same
semantics (the DuckDB entry oracles check them cross-engine; these pin
the operator functions directly, including edge cases the synthetic
corpus doesn't hit — negative-epoch timestamps, multi-bucket intervals,
boilerplate df-capping)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from rca_pdf_extraction_pipeline_spark.functions import text as T
from rca_pdf_extraction_pipeline_spark.operators import (
    dedup,
    intervaljoin,
    sketches,
)

SF_DIR = "/root/testdata/sf0.01"
EPOCH = datetime(2024, 1, 1)


def _ts(seconds: float) -> datetime:
    return EPOCH + timedelta(seconds=seconds)


@pytest.fixture(scope="module")
def points(spark):
    rows = [
        (1, 10, _ts(100)),        # inside iv 100
        (1, 11, _ts(2 * 3600 + 5)),   # inside iv 100 (3rd bucket)
        (1, 12, _ts(10 * 3600)),  # outside everything
        (1, 13, _ts(0)),          # exactly on iv 100's lo bound
        (1, 14, _ts(7200)),       # exactly on iv 100's hi bound
        (2, 20, _ts(50)),         # key 2: iv 200 only
        (2, 21, _ts(-3900)),      # pre-epoch, inside iv 201
        (3, 30, _ts(500)),        # key with no intervals
    ]
    return spark.createDataFrame(rows, "k int, pid int, ts timestamp")


@pytest.fixture(scope="module")
def intervals(spark):
    rows = [
        (1, 100, _ts(0), _ts(7200)),        # spans 3 buckets at W=3600
        (1, 101, _ts(30), _ts(130)),        # overlaps iv 100 (dup match)
        (2, 200, _ts(0), _ts(60)),
        (2, 201, _ts(-7200), _ts(-3600)),   # entirely pre-epoch
    ]
    return spark.createDataFrame(rows, "k int, iid int, lo timestamp, hi timestamp")


def _brute(points, intervals):
    return points.join(
        intervals,
        (points["k"] == intervals["k"])
        & (points["ts"] >= intervals["lo"])
        & (points["ts"] <= intervals["hi"])).select("pid", "iid")


def test_interval_join_matches_brute_force(points, intervals):
    got = intervaljoin.point_in_interval_join(
        points, intervals, on="k", bucket_seconds=3600)
    assert sorted(map(tuple, got.select("pid", "iid").collect())) == \
        sorted(map(tuple, _brute(points, intervals).collect()))


def test_interval_join_no_duplicates_across_buckets(points, intervals):
    # a (point, interval) pair meets in exactly ONE bucket (the
    # point's), so multi-bucket intervals must not multiply matches
    got = intervaljoin.point_in_interval_join(
        points, intervals, on="k", bucket_seconds=60)  # iv 100 -> 121 buckets
    pairs = [tuple(r) for r in got.select("pid", "iid").collect()]
    assert len(pairs) == len(set(pairs))
    assert sorted(pairs) == sorted(
        map(tuple, _brute(points, intervals).collect()))


def test_interval_join_plans_as_equi_join(points, intervals):
    got = intervaljoin.point_in_interval_join(
        points, intervals, on="k", bucket_seconds=3600)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_join_guards(points, intervals):
    with pytest.raises(ValueError, match="bucket_seconds"):
        intervaljoin.point_in_interval_join(points, intervals, on="k",
                                            bucket_seconds=0)
    with pytest.raises(ValueError, match="collision"):
        intervaljoin.point_in_interval_join(
            points, intervals.withColumnRenamed("lo", "ts"),
            on="k", lo_col="ts")


# ---- heavy hitters ---------------------------------------------------------


@pytest.fixture(scope="module")
def doc_tokens(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return (docs.select(F.explode_outer(T.tokens(F.col("text")))
                        .alias("token"))
            .filter(F.col("token").isNotNull()))


@pytest.mark.parametrize("threshold", [500, 900, 10_000])
def test_heavy_hitters_exact(doc_tokens, threshold):
    got = {(r["token"], r["n_occurrences"])
           for r in sketches.heavy_hitters(doc_tokens, "token",
                                           threshold).collect()}
    want = {(r["token"], r["n"])
            for r in doc_tokens.groupBy("token")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= threshold).collect()}
    assert got == want


def test_heavy_hitters_prune_survives_bucket_collisions(spark):
    # 2 buckets: every light value shares a bucket with something;
    # colliding lights become pass-2 candidates but the exact HAVING
    # removes them — result is still exact
    rows = [("hot",)] * 10 + [(f"light{i}",) for i in range(20)]
    df = spark.createDataFrame(rows, "v string")
    got = sketches.heavy_hitters(df, "v", threshold=10, n_buckets=2).collect()
    assert [(r["v"], r["n_occurrences"]) for r in got] == [("hot", 10)]


def test_heavy_hitters_threshold_guard(doc_tokens):
    with pytest.raises(ValueError, match="threshold"):
        sketches.heavy_hitters(doc_tokens, "token", threshold=0)


# ---- containment pairs -----------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


WORDS = [f"w{i}" for i in range(100)]


def test_containment_finds_embedded_snippet(spark):
    parent = " ".join(WORDS)
    snippet = " ".join(WORDS[:30])
    unrelated = " ".join(f"z{i}" for i in range(100))
    docs = _docs(spark, [(1, parent), (2, snippet), (3, unrelated)])
    got = dedup.containment_pairs(docs, min_containment_micro=900_000)
    rows = {(r["id_a"], r["id_b"]): r for r in got.collect()}
    assert set(rows) == {(1, 2)}
    r = rows[(1, 2)]
    assert r["n_shared"] == 26          # 30 tokens -> 26 5-shingles
    assert r["cont_b_micro"] == 1_000_000   # snippet fully contained
    assert r["cont_a_micro"] == 26 * 1_000_000 // 96  # tiny vs parent


def test_containment_df_cap_drops_boilerplate(spark):
    # the same text in MORE than df_cap docs is corpus boilerplate:
    # all its shingles exceed the cap, so no pairs are emitted
    text = " ".join(WORDS[:20])
    docs = _docs(spark, [(i, text) for i in range(5)])
    assert dedup.containment_pairs(docs, df_cap=4).count() == 0
    # at df_cap >= group size every pair of the 5 copies appears
    got = dedup.containment_pairs(docs, df_cap=5)
    assert got.count() == 10
    assert got.filter(F.col("cont_a_micro") != 1_000_000).count() == 0


def test_containment_guard_and_single_md5(spark):
    with pytest.raises(ValueError, match="df_cap"):
        dedup.containment_pairs(_docs(spark, [(1, "a b c")]), df_cap=1)
    q = dedup.containment_pairs(_docs(spark, [(1, "a b c d e f")]))
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the md5-per-shingle projection must appear exactly once — the
    # size()/explode consumers derive from the column layer, never
    # re-evaluate the hash fold (CLAUDE.md single-evaluation rule)
    assert plan.count("md5") == 1, plan


# ---- winnow-pruned overlap pairs -------------------------------------------


def _winnow_brute_pairs(rows, k=3, w=4, df_cap=16, min_shared=2):
    """Plain-Python replay: winnow selection per doc, df-capped posting
    lists, shared-hash counts per pair."""
    from collections import defaultdict

    from test_training_ops import _winnow_gram_hashes

    sel = {}
    for did, text in rows:
        hs = _winnow_gram_hashes(text, k)
        chosen = set()
        for i in range(max(len(hs) - w + 1, 1)):
            win = hs[i:i + w]
            chosen.add(min(win))
        sel[did] = chosen
    posts = defaultdict(set)
    for did, hs in sel.items():
        for h in hs:
            posts[h].add(did)
    counts = defaultdict(int)
    for h, ids in posts.items():
        if 2 <= len(ids) <= df_cap:
            ids = sorted(ids)
            for x in range(len(ids)):
                for y in range(x + 1, len(ids)):
                    counts[(ids[x], ids[y])] += 1
    return {p: c for p, c in counts.items() if c >= min_shared}


def test_winnow_pairs_match_bruteforce(spark):
    parent = " ".join(WORDS)
    snippet = " ".join(WORDS[:30])          # 30-token shared run >> w+k-1
    unrelated = " ".join(f"z{i}" for i in range(100))
    rows = [(1, parent), (2, snippet), (3, unrelated)]
    got = {(r["id_a"], r["id_b"]): r["n_shared"]
           for r in dedup.winnow_overlap_pairs(_docs(spark, rows)).collect()}
    assert got == _winnow_brute_pairs(rows)
    assert (1, 2) in got                    # the guarantee in action


def test_winnow_pairs_df_cap_drops_boilerplate(spark):
    text = " ".join(WORDS[:20])
    docs = _docs(spark, [(i, text) for i in range(5)])
    assert dedup.winnow_overlap_pairs(docs, df_cap=4).count() == 0
    assert dedup.winnow_overlap_pairs(docs, df_cap=5).count() == 10


def test_winnow_pairs_guards_and_single_md5(spark):
    with pytest.raises(ValueError, match="df_cap"):
        dedup.winnow_overlap_pairs(_docs(spark, [(1, "a b c")]), df_cap=1)
    with pytest.raises(ValueError, match="min_shared"):
        dedup.winnow_overlap_pairs(_docs(spark, [(1, "a b c")]), min_shared=0)
    q = dedup.winnow_overlap_pairs(_docs(spark, [(1, "a b c d e f")]))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert plan.count("md5") == 1, plan
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_winnow_cc_dedup_keeps_component_min(spark):
    parent = " ".join(WORDS)                 # id 1
    snippet = " ".join(WORDS[:30])           # id 2 -> pairs with 1
    tail = " ".join(WORDS[70:])              # id 4 -> pairs with 1 (shared tail)
    unrelated = " ".join(f"z{i}" for i in range(100))   # id 3 isolated
    docs = _docs(spark, [(1, parent), (2, snippet), (3, unrelated), (4, tail)])
    kept = sorted(r["doc_id"] for r in
                  dedup.deduplicate_corpus_winnow(docs).select("doc_id").collect())
    # 2 and 4 both overlap 1 -> one component {1,2,4}, min id 1 survives;
    # the isolated doc keeps itself
    assert kept == [1, 3]

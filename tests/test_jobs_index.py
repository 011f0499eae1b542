"""ANN index-build job: artifact layout, determinism, partition
pruning readiness, F9 path guard."""

from __future__ import annotations

import json
from pathlib import Path

import pytest


def _embeddings(spark, n=16, dim=8):
    rows = [(i, [float((i * 7 + j * 3) % 5) / 5.0 for j in range(dim)])
            for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_run_index_artifacts_and_stats(spark, tmp_path):
    from rca_pdf_extraction_pipeline_spark.jobs import run_index

    _embeddings(spark).write.parquet(str(tmp_path / "in"))
    rc = run_index.main([
        "--input", str(tmp_path / "in"),
        "--output", str(tmp_path / "idx"),
        "--n-centroids", "2", "--pq-m", "2", "--pq-k", "2", "--dim", "8",
        "--sample-rate", "1.0",
    ])
    assert rc == 0
    idx = tmp_path / "idx"
    for art in ("centroids", "assignments", "pq_codebooks", "pq_codes",
                "sq8_bounds", "sq8_codes"):
        assert (idx / art).exists(), art

    stats = json.loads((idx / "stats.json").read_text())
    assert stats["n_vectors"] == 16
    assert sum(stats["cells"].values()) == 16

    # the assignments table is physically partitioned by cell — the
    # layout that lets an nprobe-cell query prune to nprobe/k of files
    part_dirs = [p.name for p in (idx / "assignments").iterdir()
                 if p.is_dir() and p.name.startswith("cid=")]
    assert sorted(part_dirs) == [f"cid={c}" for c in sorted(stats["cells"])]

    # every vector got exactly m PQ codes, and the code table is
    # physically partitioned by the vector's IVF cell — the IVFADC
    # layout where a probed-cell query prunes whole files
    codes = spark.read.parquet(str(idx / "pq_codes"))
    assert codes.count() == 16 * 2
    code_dirs = [p.name for p in (idx / "pq_codes").iterdir()
                 if p.is_dir() and p.name.startswith("cid=")]
    assert sorted(code_dirs) == [f"cid={c}" for c in sorted(stats["cells"])]

    # SQ8: one code array per vector, cell-partitioned like pq_codes,
    # and searching the STORED artifacts equals the in-plan fit
    sq8 = spark.read.parquet(str(idx / "sq8_codes"))
    assert sq8.count() == 16
    assert all(len(r["codes"]) == 8 and all(0 <= c <= 255 for c in r["codes"])
               for r in sq8.collect())
    sq8_dirs = [p.name for p in (idx / "sq8_codes").iterdir()
                if p.is_dir() and p.name.startswith("cid=")]
    assert sorted(sq8_dirs) == [f"cid={c}" for c in sorted(stats["cells"])]
    from rca_pdf_extraction_pipeline_spark.operators import similarity
    embs = spark.read.parquet(str(tmp_path / "in"))
    bounds = spark.read.parquet(str(idx / "sq8_bounds"))
    stored = similarity.sq8_topk(embs, query_id=0, k=5,
                                 codes=sq8.select("vec_id", "codes"),
                                 bounds=bounds).collect()
    inplan = similarity.sq8_topk(embs, query_id=0, k=5).collect()
    assert [tuple(r) for r in stored] == [tuple(r) for r in inplan]


def test_run_index_fits_codebooks_exactly_once(spark, tmp_path, monkeypatch):
    """The job must encode pq_codes against the STORED pq_codebooks
    artifact (read back + books=), not refit in-plan: pq_codebooks —
    the only entry to the m Lloyd chains — is called exactly once per
    build.  (VERDICT r4: the double fit doubled training cost and left
    artifact consistency resting on Lloyd bit-determinism.)"""
    from rca_pdf_extraction_pipeline_spark.jobs import run_index
    from rca_pdf_extraction_pipeline_spark.operators import similarity

    calls = []
    real = similarity.pq_codebooks
    monkeypatch.setattr(similarity, "pq_codebooks",
                        lambda *a, **kw: calls.append(1) or real(*a, **kw))
    _embeddings(spark).write.parquet(str(tmp_path / "in"))
    rc = run_index.main([
        "--input", str(tmp_path / "in"),
        "--output", str(tmp_path / "idx"),
        "--n-centroids", "2", "--pq-m", "2", "--pq-k", "2", "--dim", "8",
        "--sample-rate", "1.0",
    ])
    assert rc == 0
    assert len(calls) == 1, f"pq_codebooks fit {len(calls)} times"
    # and the encode really ran against the stored books: parity holds
    books = spark.read.parquet(str(tmp_path / "idx" / "pq_codebooks"))
    embs = spark.read.parquet(str(tmp_path / "in"))
    stored = sorted(map(tuple, spark.read.parquet(
        str(tmp_path / "idx" / "pq_codes"))
        .select("vec_id", "sub", "code").collect()))
    reencoded = sorted(map(tuple, similarity.pq_codes(
        embs, m=2, k=2, dim=8, books=books).collect()))
    assert stored == reencoded


def test_run_index_deterministic_rebuild(spark, tmp_path):
    from rca_pdf_extraction_pipeline_spark.jobs import run_index

    _embeddings(spark).write.parquet(str(tmp_path / "in"))
    argv = ["--input", str(tmp_path / "in"),
            "--n-centroids", "2", "--pq-m", "2", "--pq-k", "2",
            "--dim", "8", "--sample-rate", "1.0"]
    run_index.main(argv + ["--output", str(tmp_path / "a")])
    run_index.main(argv + ["--output", str(tmp_path / "b")])
    for art in ("centroids", "assignments", "pq_codebooks", "pq_codes"):
        ra = sorted(map(tuple,
                        spark.read.parquet(str(tmp_path / "a" / art)).collect()))
        rb = sorted(map(tuple,
                        spark.read.parquet(str(tmp_path / "b" / art)).collect()))
        assert ra == rb, art


def test_search_from_stored_artifacts_equals_inplan(spark, tmp_path):
    """The index job's persisted artifacts drive BOTH search paths:
    pq_topk(books=, codes=) and ivf_topk(cents=) read back from parquet
    must return the same rows as the in-plan (train-at-query-time)
    formulation — the deployment shape at 10^12 vectors, where training
    never runs inside a query."""
    from rca_pdf_extraction_pipeline_spark.jobs import run_index
    from rca_pdf_extraction_pipeline_spark.operators import similarity

    _embeddings(spark).write.parquet(str(tmp_path / "in"))
    run_index.main([
        "--input", str(tmp_path / "in"),
        "--output", str(tmp_path / "idx"),
        "--n-centroids", "2", "--pq-m", "2", "--pq-k", "2", "--dim", "8",
        "--sample-rate", "1.0",
    ])
    embs = spark.read.parquet(str(tmp_path / "in"))

    books = spark.read.parquet(str(tmp_path / "idx" / "pq_codebooks"))
    codes = spark.read.parquet(str(tmp_path / "idx" / "pq_codes"))
    stored = similarity.pq_topk(embs, query_id=0, k_neighbors=5,
                                m=2, k=2, dim=8,
                                books=books, codes=codes).collect()
    inplan = similarity.pq_topk(embs, query_id=0, k_neighbors=5,
                                m=2, k=2, dim=8).collect()
    assert [tuple(r) for r in stored] == [tuple(r) for r in inplan]

    # mismatched args rejected loudly
    with pytest.raises(ValueError, match="together"):
        similarity.pq_topk(embs, query_id=0, m=2, k=2, dim=8, books=books)

    cents = spark.read.parquet(str(tmp_path / "idx" / "centroids"))
    s_ivf = similarity.ivf_topk(embs, query_id=0, k=5, n_centroids=2,
                                nprobe=1, cents=cents).collect()
    # stored centroids came from the sampled trainer at rate 1.0 == the
    # full trainer on this corpus, so in-plan full-training matches
    i_ivf = similarity.ivf_topk(embs, query_id=0, k=5, n_centroids=2,
                                nprobe=1).collect()
    assert [tuple(r) for r in s_ivf] == [tuple(r) for r in i_ivf]


def test_ivfadc_stored_equals_inplan_and_prunes_partitions(spark, tmp_path):
    """IVFADC over the job's artifacts == the in-plan formulation, and
    the stored code scan is pruned by the probed cells at the FILE level
    (pq_codes is partitioned by cid, so the probe filter becomes a
    partition filter — the nprobe/k scan the layout exists for)."""
    from rca_pdf_extraction_pipeline_spark.jobs import run_index
    from rca_pdf_extraction_pipeline_spark.operators import similarity

    _embeddings(spark, n=24).write.parquet(str(tmp_path / "in"))
    run_index.main([
        "--input", str(tmp_path / "in"),
        "--output", str(tmp_path / "idx"),
        "--n-centroids", "3", "--pq-m", "2", "--pq-k", "2", "--dim", "8",
        "--sample-rate", "1.0",
    ])
    embs = spark.read.parquet(str(tmp_path / "in"))
    cents = spark.read.parquet(str(tmp_path / "idx" / "centroids"))
    books = spark.read.parquet(str(tmp_path / "idx" / "pq_codebooks"))
    codes = spark.read.parquet(str(tmp_path / "idx" / "pq_codes"))

    stored = similarity.ivfadc_topk(
        embs, query_id=0, k_neighbors=5, n_centroids=3, nprobe=2,
        m=2, k=2, dim=8, cents=cents, books=books, codes=codes)
    inplan = similarity.ivfadc_topk(
        embs, query_id=0, k_neighbors=5, n_centroids=3, nprobe=2,
        m=2, k=2, dim=8)
    assert [tuple(r) for r in stored.collect()] \
        == [tuple(r) for r in inplan.collect()]

    # plan pin: the stored-code scan carries a partition filter on cid
    # (dynamic pruning from the broadcast probe side) — the code table
    # is never scanned whole
    plan = stored._jdf.queryExecution().executedPlan().toString()
    scan_lines = [ln for ln in plan.splitlines()
                  if "pq_codes" in ln or "PartitionFilters" in ln]
    assert any("dynamicpruning" in ln or "cid" in ln
               for ln in scan_lines), plan

    # mixing stored and in-plan artifacts is rejected loudly
    import pytest as _pytest
    with _pytest.raises(ValueError, match="together"):
        similarity.ivfadc_topk(embs, query_id=0, m=2, k=2, dim=8,
                               cents=cents)


def test_ivfsq_stored_equals_inplan_and_prunes_partitions(spark, tmp_path):
    """IVF-SQ over the job's artifacts == the in-plan formulation, and
    the stored sq8_codes scan is pruned by the probed cells at the FILE
    level (sq8_codes is partitioned by cid, same layout as pq_codes)."""
    from rca_pdf_extraction_pipeline_spark.jobs import run_index
    from rca_pdf_extraction_pipeline_spark.operators import similarity

    _embeddings(spark, n=24).write.parquet(str(tmp_path / "in"))
    run_index.main([
        "--input", str(tmp_path / "in"),
        "--output", str(tmp_path / "idx"),
        "--n-centroids", "3", "--pq-m", "2", "--pq-k", "2", "--dim", "8",
        "--sample-rate", "1.0",
    ])
    embs = spark.read.parquet(str(tmp_path / "in"))
    cents = spark.read.parquet(str(tmp_path / "idx" / "centroids"))
    bounds = spark.read.parquet(str(tmp_path / "idx" / "sq8_bounds"))
    codes = spark.read.parquet(str(tmp_path / "idx" / "sq8_codes"))

    stored = similarity.ivfsq_topk(
        embs, query_id=0, k=5, n_centroids=3, nprobe=2,
        cents=cents, bounds=bounds, codes=codes)
    inplan = similarity.ivfsq_topk(
        embs, query_id=0, k=5, n_centroids=3, nprobe=2)
    assert [tuple(r) for r in stored.collect()] \
        == [tuple(r) for r in inplan.collect()]

    # plan pin: the stored-code scan carries a partition filter on cid
    # (dynamic pruning from the broadcast probe side) — the code table
    # is never scanned whole
    plan = stored._jdf.queryExecution().executedPlan().toString()
    scan_lines = [ln for ln in plan.splitlines()
                  if "sq8_codes" in ln or "PartitionFilters" in ln]
    assert any("dynamicpruning" in ln or "cid" in ln
               for ln in scan_lines), plan

    with pytest.raises(ValueError, match="together"):
        similarity.ivfsq_topk(embs, query_id=0, cents=cents, bounds=bounds)


def test_run_index_rejects_bad_output(tmp_path):
    from rca_pdf_extraction_pipeline_spark.jobs import run_index

    with pytest.raises(ValueError):
        run_index.main(["--input", str(tmp_path / "in"),
                        "--output", "/etc/evil"])

"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, sign-LSH bucketing as
the scale path — both pure DataFrame expressions (functions/vectors.py),
no UDFs, oracle-checkable against DuckDB's list_cosine_similarity.

Scale design (100 TB / 10^12 vectors):
  * the query side is always broadcast (one row or a small batch);
    the corpus scan stays narrow — no shuffle at all for brute force,
    and `TakeOrderedAndProject` keeps top-k memory O(k) per task.
  * bucketed ANN prunes the scan with a partition-pruning-friendly
    bucket column (write the table partitioned/bucketed by it), so a
    query touches 1/2^bits of the files: IVF-style coarse quantization
    with deterministic axis-sign centroids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import vectors as V


def _query_vec(embs: DataFrame, query_id: int, id_col: str, vec_col: str) -> DataFrame:
    return embs.filter(F.col(id_col) == query_id).select(
        F.col(id_col).alias("query_id"), V.as_double(F.col(vec_col)).alias("q_vec")
    )


def cosine_topk(embs: DataFrame, query_id: int, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k neighbors of ``query_id`` by cosine similarity.

    Deterministic: ties broken by ascending id; similarity rounded to
    6 dp. Returns (vec_id, cosine_sim) with the query itself excluded.
    """
    q = _query_vec(embs, query_id, id_col, vec_col)
    sim = F.round(V.cosine(V.as_double(F.col(vec_col)), F.col("q_vec")), 6)
    return (
        embs.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(F.col(id_col), sim.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def bucket_histogram(embs: DataFrame, n_bits: int = 8,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(bucket, n_vecs) under the sign-LSH coarse quantizer — the
    balance diagnostic for the ANN index layout."""
    return (
        embs.select(V.sign_bucket(F.col(vec_col), n_bits).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
    )


def bucketed_topk_multiprobe(embs: DataFrame, query_id: int, k: int = 10,
                             n_bits: int = 8, nprobe: int = 4,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding") -> DataFrame:
    """Multi-probe IVF top-k (Lv et al., VLDB'07 multi-probe LSH): probe
    the query's sign-LSH bucket PLUS the ``nprobe - 1`` buckets reached
    by flipping the hyperplane bits with the smallest margin
    (|query[j]| — the dims where the sign decision was least confident).
    Recovers most of the recall nprobe=1 loses while still scanning only
    nprobe/2^bits of the corpus.

    Deterministic: margin ties flip the lower dim first; similarity
    rounded to 6 dp, final ties by ascending id."""
    if not 1 <= nprobe <= 2 ** n_bits:
        raise ValueError(f"nprobe must be in [1, 2^{n_bits}]; got {nprobe}")
    with_bucket = embs.withColumn("bucket", V.sign_bucket(F.col(vec_col), n_bits))
    margins = F.array_sort(F.array(*[
        F.struct(F.abs(F.element_at(F.col(vec_col), j + 1).cast("double"))
                 .alias("m"), F.lit(j).alias("j"))
        for j in range(n_bits)
    ]))
    flips = F.slice(margins, 1, nprobe - 1) if nprobe > 1 \
        else F.array().cast("array<struct<m:double,j:int>>")
    q = (
        with_bucket.filter(F.col(id_col) == query_id)
        .select(F.col(id_col).alias("query_id"),
                V.as_double(F.col(vec_col)).alias("q_vec"),
                F.col("bucket").alias("q_bucket"),
                flips.alias("flips"))
        .select("query_id", "q_vec",
                F.concat(
                    F.array(F.col("q_bucket")),
                    F.transform(
                        "flips",
                        lambda f: F.col("q_bucket").bitwiseXOR(
                            F.pow(F.lit(2.0), f["j"]).cast("long"))),
                ).alias("probes"))
    )
    sim = F.round(V.cosine(V.as_double(F.col(vec_col)), F.col("q_vec")), 6)
    return (
        with_bucket.join(F.broadcast(q),
                         F.array_contains(q["probes"], with_bucket["bucket"]))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(F.col(id_col), sim.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


#: fixed-point grid for k-means arithmetic: round(x * 1000) as bigint.
#: All Lloyd-iteration math (distances, centroid updates) is then EXACT
#: integer arithmetic in both engines — zero cross-engine float risk —
#: while final ranking still uses true double cosine on the raw floats.
#: (Quantized coarse clustering is standard ANN practice, cf. int8
#: product quantization; 3 decimal digits is far finer than any IVF
#: assignment boundary matters.)
KMEANS_SCALE = 1000


def sparse_cosine_pairs(docs: DataFrame, df_frac: float = 0.1,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """All-pairs sparse tf-idf cosine over the corpus's word-BIGRAM
    vocabulary (Bayardo et al. WWW'07 "Scaling up all pairs similarity
    search", simplified): pairs of documents sharing at least one
    retained bigram, scored by the cosine of their tf-idf vectors.
    Bigram terms, not unigrams: a web corpus's unigram vocabulary is
    dominated by stop-words that pair everything with everything, while
    bigrams spread document frequency into the informative mid-band.

    Returns (id_a, id_b, dot, cosine) with id_a < id_b; ``dot`` is the
    EXACT integer inner product on the micro-lattice (idf quantized to
    round(ln(n_docs/df) * 1e6), weight = tf * idf_micro — same
    quantized-log determinism as ``textanalysis.unigram_logprob``) and
    ``cosine`` its 6-dp normalization (sums are exact bigints below
    2^53, so the final divide/sqrt/round reproduces bit-for-bit).

    Scale: the pair expansion is Σ over terms of C(df, 2) — unbounded
    on stop-terms — so terms appearing in more than ``df_frac`` of the
    corpus are dropped BEFORE the self-join (they carry ~zero idf
    weight anyway; the fraction tracks corpus growth where an absolute
    cap would not, and is the simplified stand-in for Bayardo's prefix
    filter).  df < 2 terms cannot pair and are also dropped.  The
    weight table feeds the norm aggregate and both self-join sides, so
    it is ``.persist()``-pinned for the lifetime of the returned plan
    (see CLAUDE.md on multi-consumer layers)."""
    if not 0.0 < df_frac <= 1.0:
        raise ValueError(f"df_frac must be in (0, 1]; got {df_frac}")
    from ..functions import text as T

    tf = (docs.select(F.col(id_col).alias("doc"),
                      F.explode(T.bigrams(T.tokens(F.col(text_col))))
                      .alias("term"))
          .groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf")))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    w = (tf.join(dfreq.where(F.col("df") >= 2), "term")
         .crossJoin(F.broadcast(n_docs))
         .where(F.col("df") <= F.expr(f"cast(floor({df_frac!r} * "
                                      f"cast(n_docs as double)) as bigint)"))
         .select("doc", "term", F.expr(
             "cast(tf * round(ln(cast(n_docs as double) / cast(df as double))"
             " * 1000000) as bigint)").alias("w"))).persist()
    norm = w.groupBy("doc").agg(F.expr("sum(w * w)").cast("long").alias("n2"))
    a = w.select(F.col("doc").alias("id_a"), "term", F.col("w").alias("wa"))
    b = w.select(F.col("doc").alias("id_b"), "term", F.col("w").alias("wb"))
    dot = (a.join(b, "term")
           .where(F.col("id_a") < F.col("id_b"))
           .groupBy("id_a", "id_b")
           .agg(F.expr("sum(wa * wb)").cast("long").alias("dot")))
    return (dot
            .join(norm.select(F.col("doc").alias("id_a"),
                              F.col("n2").alias("na2")), "id_a")
            .join(norm.select(F.col("doc").alias("id_b"),
                              F.col("n2").alias("nb2")), "id_b")
            .select("id_a", "id_b", "dot", F.expr(
                "round(cast(dot as double) / (sqrt(cast(na2 as double))"
                " * sqrt(cast(nb2 as double))), 6)").alias("cosine")))


def _lattice(embs: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    qv = F.transform(
        V.as_double(F.col(vec_col)),
        lambda x: F.round(x * KMEANS_SCALE, 0).cast("long"))
    return embs.select(F.col(id_col), F.col(vec_col), qv.alias("qv"))


def _l2sq(a, b) -> F.Column:
    """Exact squared L2 between two bigint lattice vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"), lambda acc, v: acc + v)


def _assign(lat: DataFrame, cents: DataFrame, id_col: str) -> DataFrame:
    """Nearest-centroid assignment: broadcast the k centroids, exact
    integer distances, ties broken by ascending cid (struct-min)."""
    pairs = lat.crossJoin(F.broadcast(cents))
    scored = pairs.select(
        F.col(id_col), F.col("qv"),
        F.struct(_l2sq(F.col("qv"), F.col("cv")).alias("d2"),
                 F.col("cid")).alias("dc"))
    return (scored.groupBy(id_col)
            .agg(F.min("dc").alias("m"), F.first("qv").alias("qv"))
            .select(F.col(id_col), F.col("m.cid").alias("cid"), F.col("qv")))


def kmeans_centroids(embs: DataFrame, k: int = 4, iters: int = 2,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Deterministic Lloyd's k-means over the embedding column —
    (cid, cv) with ``cv`` an ``array<bigint>`` lattice centroid.

    Trained coarse quantizer for IVF ANN (the codebook step brute-force
    sign-LSH buckets skip).  Deterministic by construction: seeds are
    the ``k`` embeddings with the smallest ids (cid = seed id), a fixed
    number of Lloyd iterations, argmin ties break on ascending cid, and
    centroid updates floor-divide on the integer lattice — every engine
    reproduces the exact same centroids bit-for-bit.

    Scale (10^12 vectors): each iteration is one broadcast crossJoin
    (k rows) + one groupBy(id) argmin + one (cid, dim) partial-agg
    shuffle whose cardinality is k x dims, independent of N.  Lazy
    DataFrame throughout — no driver-side collect; production would
    train on a sample and hold centroids in a table, which is exactly
    the shape this returns.
    """
    lat = _lattice(embs, id_col, vec_col)
    cents = (lat.orderBy(F.col(id_col)).limit(k)
             .select(F.col(id_col).cast("long").alias("cid"),
                     F.col("qv").alias("cv")))
    for _ in range(iters):
        assigned = _assign(lat, cents, id_col)
        per_dim = (assigned.select("cid", F.posexplode("qv").alias("dim", "v"))
                   .groupBy("cid", "dim")
                   .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
                   .select("cid", "dim",
                           F.floor(F.col("s") / F.col("n")).cast("long")
                           .alias("cv_i")))
        cents = (per_dim.groupBy("cid")
                 .agg(F.array_sort(F.collect_list(
                     F.struct("dim", "cv_i"))).alias("pairs"))
                 .select("cid",
                         F.transform("pairs", lambda p: p["cv_i"]).alias("cv")))
    return cents


def kmeans_centroids_sampled(embs: DataFrame, k: int = 4, iters: int = 2,
                             sample_rate: float = 0.5, seed: int = 0,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding") -> DataFrame:
    """The production codebook fit: Lloyd iterations over a DETERMINISTIC
    hash-sample of the corpus only (``sampling.hash_sample`` — md5-mod
    membership, identical rows at any parallelism / any engine), so per-
    iteration cost scales with ``sample_rate * N`` instead of N.  The
    full corpus is then touched exactly ONCE by the caller's assignment
    pass — the shape :func:`kmeans_centroids`'s own docstring promises
    for production.

    Codebook quality needs only a representative sample, not the corpus
    (Jégou et al., TPAMI'11 train IVF quantizers on a ~1% subset); the
    fit stays fully deterministic because the sample itself is a pure
    function of the ids.
    """
    from .sampling import hash_sample

    sample = hash_sample(embs, sample_rate, seed, id_col=id_col)
    # loud guard (lane-cap / MAX_TABLES style): with a small corpus or a
    # low rate the seed `LIMIT k` would silently yield < k centroids
    # while ivf_topk_sampled still validates nprobe against the REQUESTED
    # n_centroids.  One count over the sample — the fit scans it `iters`
    # times anyway, so the check is proportionate, and it fails before
    # any Lloyd work is queued.
    n_sample = sample.count()
    if n_sample < k:
        raise ValueError(
            f"kmeans_centroids_sampled: hash sample holds {n_sample} "
            f"vectors < k={k} centroids; raise sample_rate (got "
            f"{sample_rate}) or lower k")
    return kmeans_centroids(sample, k, iters, id_col, vec_col)


def _ivf_search(embs: DataFrame, cents: DataFrame, query_id: int, k: int,
                nprobe: int, id_col: str, vec_col: str) -> DataFrame:
    """Shared IVF back half: one full-corpus nearest-centroid assignment,
    probe the ``nprobe`` cells nearest the query, exact cosine rank
    inside the probed cells only."""
    lat = _lattice(embs, id_col, vec_col)
    assigned = (lat.crossJoin(F.broadcast(cents))
                .select(F.col(id_col), F.col(vec_col),
                        F.struct(_l2sq(F.col("qv"), F.col("cv")).alias("d2"),
                                 F.col("cid")).alias("dc"))
                .groupBy(id_col)
                .agg(F.min("dc").alias("m"), F.first(vec_col).alias(vec_col))
                .select(F.col(id_col), F.col("m.cid").alias("cid"),
                        F.col(vec_col)))
    probes = (lat.filter(F.col(id_col) == query_id)
              .crossJoin(F.broadcast(cents))
              .select(F.col("cid"),
                      _l2sq(F.col("qv"), F.col("cv")).alias("d2"))
              .orderBy("d2", "cid").limit(nprobe).select("cid"))
    q = _query_vec(embs, query_id, id_col, vec_col)
    sim = F.round(V.cosine(V.as_double(F.col(vec_col)), F.col("q_vec")), 6)
    return (assigned.join(F.broadcast(probes), "cid")
            .crossJoin(F.broadcast(q))
            .filter(F.col(id_col) != F.col("query_id"))
            .select(F.col(id_col), F.col("cid"), sim.alias("cosine_sim"))
            .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
            .limit(k))


def ivf_topk_sampled(embs: DataFrame, query_id: int, k: int = 10,
                     n_centroids: int = 4, iters: int = 2, nprobe: int = 2,
                     sample_rate: float = 0.5, seed: int = 0,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """IVF ANN with the codebook trained on a hash-sample
    (:func:`kmeans_centroids_sampled`): the full corpus is scanned once
    for assignment, never per Lloyd round.  Same output contract as
    :func:`ivf_topk` — (vec_id, cid, cosine_sim), top-``k`` by
    (cosine desc, id), query excluded."""
    if not 1 <= nprobe <= n_centroids:
        raise ValueError(f"nprobe must be in [1, {n_centroids}]; got {nprobe}")
    cents = kmeans_centroids_sampled(embs, n_centroids, iters, sample_rate,
                                     seed, id_col, vec_col)
    return _ivf_search(embs, cents, query_id, k, nprobe, id_col, vec_col)


def ivf_topk(embs: DataFrame, query_id: int, k: int = 10,
             n_centroids: int = 4, iters: int = 2, nprobe: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding",
             cents: DataFrame | None = None) -> DataFrame:
    """IVF ANN with a TRAINED coarse quantizer: k-means codebook,
    assign every vector to its nearest centroid, probe the ``nprobe``
    centroids nearest the query, exact cosine rank inside the probed
    cells only.  (The IVF-flat design of Jégou et al., TPAMI'11 —
    trained centroids adapt to the data distribution, unlike the
    axis-aligned sign-LSH buckets of :func:`bucketed_topk`.)

    Returns (vec_id, cid, cosine_sim) — top-``k`` by (cosine desc, id),
    the query itself excluded.  At scale, write the corpus partitioned
    by ``cid``: each query then scans nprobe/k of the files.  Trains on
    the FULL corpus per Lloyd round — prefer :func:`ivf_topk_sampled`
    beyond toy sizes, or pass ``cents`` (the ``centroids`` artifact
    ``jobs/run_index.py`` persists, read back from parquet) to search a
    STORED codebook with no training in-plan at all.
    """
    if not 1 <= nprobe <= n_centroids:
        raise ValueError(f"nprobe must be in [1, {n_centroids}]; got {nprobe}")
    if cents is None:
        cents = kmeans_centroids(embs, n_centroids, iters, id_col, vec_col)
    return _ivf_search(embs, cents, query_id, k, nprobe, id_col, vec_col)


def assign_centroids(embs: DataFrame, n_centroids: int = 4, iters: int = 2,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     cents: DataFrame | None = None) -> DataFrame:
    """(id, cid, vec): every vector labeled with its nearest trained
    centroid — the shared front half of IVF search and semantic dedup.

    One broadcast crossJoin against the k centroids + one groupBy(id)
    argmin; deterministic (exact integer lattice distances, ties to the
    ascending cid).  Pass ``cents`` (e.g. the ``centroids`` artifact a
    prior index build persisted) to assign against a stored codebook
    with no Lloyd rounds in-plan."""
    if cents is None:
        cents = kmeans_centroids(embs, n_centroids, iters, id_col, vec_col)
    lat = _lattice(embs, id_col, vec_col)
    return (lat.crossJoin(F.broadcast(cents))
            .select(F.col(id_col), F.col(vec_col),
                    F.struct(_l2sq(F.col("qv"), F.col("cv")).alias("d2"),
                             F.col("cid")).alias("dc"))
            .groupBy(id_col)
            .agg(F.min("dc").alias("m"), F.first(vec_col).alias(vec_col))
            .select(F.col(id_col), F.col("m.cid").alias("cid"),
                    F.col(vec_col)))


def cluster_profile(embs: DataFrame, n_centroids: int = 4, iters: int = 2,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Corpus map: per-centroid population and inertia — (cid, n_vecs,
    inertia, avg_d2) ordered by cid, where ``inertia`` is the EXACT
    integer sum of squared lattice distances to the assigned centroid
    (the k-means objective, reported per cluster; Lloyd 1982).

    The dataset-card view of embedding space: cluster sizes expose
    imbalance (one giant cluster = the quantizer needs more centroids
    or more iterations), avg_d2 exposes diffuse clusters.  Same
    broadcast-argmin front half as IVF; the profile aggregation is one
    k-row shuffle.  Integer inertia makes the whole row set
    addition-order-free — any engine, any partitioning, same bytes.
    """
    cents = kmeans_centroids(embs, n_centroids, iters, id_col, vec_col)
    lat = _lattice(embs, id_col, vec_col)
    assigned = (lat.crossJoin(F.broadcast(cents))
                .select(F.col(id_col),
                        F.struct(_l2sq(F.col("qv"), F.col("cv")).alias("d2"),
                                 F.col("cid")).alias("dc"))
                .groupBy(id_col)
                .agg(F.min("dc").alias("m"))
                .select(F.col("m.cid").alias("cid"),
                        F.col("m.d2").alias("d2")))
    return (assigned.groupBy("cid")
            .agg(F.count(F.lit(1)).alias("n_vecs"),
                 F.sum("d2").alias("inertia"))
            .select("cid", "n_vecs", "inertia",
                    F.round(F.col("inertia") / F.col("n_vecs"), 6)
                    .alias("avg_d2"))
            .orderBy("cid"))


def semantic_near_pairs(embs: DataFrame, n_centroids: int = 4, iters: int = 2,
                        threshold: float = 0.5, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Semantic near-duplicate pairs, SemDeDup-style (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with the trained
    k-means quantizer, then compare pairs ONLY within a cluster and gate
    on exact cosine similarity.

    Returns (cid, id_a, id_b, cosine_sim) for same-cluster pairs with
    cosine >= threshold (rounded to 6 dp, id_a < id_b).

    Scale (10^12 vectors): the all-pairs comparison SemDeDup avoids is
    O(N^2); clustering caps it at Σ|cluster|^2 — grow n_centroids
    linearly with N so the expected cluster size (and so per-cluster
    join cost) stays constant.  The join shuffles on cid only; at
    cluster scale write the corpus partitioned by cid and the
    self-join needs no exchange at all.
    """
    assigned = assign_centroids(embs, n_centroids, iters, id_col, vec_col)
    a = assigned.select(F.col("cid"), F.col(id_col).alias("id_a"),
                        V.as_double(F.col(vec_col)).alias("va"))
    b = assigned.select(F.col("cid"), F.col(id_col).alias("id_b"),
                        V.as_double(F.col(vec_col)).alias("vb"))
    sim = F.round(V.cosine(F.col("va"), F.col("vb")), 6)
    return (a.join(b, "cid")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("cid", "id_a", "id_b", sim.alias("cosine_sim"))
            .filter(F.col("cosine_sim") >= threshold))


def semantic_dedup(embs: DataFrame, n_centroids: int = 4, iters: int = 2,
                   threshold: float = 0.5, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Semantic dedup: drop every vector that has a LOWER-id semantic
    near-duplicate in its cluster (greedy keep-first, the same keep-min
    convention as ``dedup.deduplicate_corpus``).  Returns the kept rows
    of ``embs`` with their cluster id: (id, cid).

    The anti-join is on the id alone, so the kept set is deterministic
    under any partitioning of the pair table."""
    pairs = semantic_near_pairs(embs, n_centroids, iters, threshold,
                                id_col, vec_col)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    assigned = assign_centroids(embs, n_centroids, iters, id_col, vec_col)
    return (assigned.join(losers, id_col, "left_anti")
            .select(F.col(id_col), F.col("cid")))


def _subspace(embs: DataFrame, sub: int, sub_dim: int,
              id_col: str, vec_col: str) -> DataFrame:
    """Rows restricted to one PQ subspace: the ``sub``-th contiguous
    ``sub_dim``-wide slice of the embedding, under the original column
    name so the k-means machinery applies unchanged."""
    return embs.select(
        F.col(id_col),
        F.slice(F.col(vec_col), sub * sub_dim + 1, sub_dim).alias(vec_col))


def pq_codebooks(embs: DataFrame, m: int = 4, k: int = 4, iters: int = 2,
                 dim: int = 64, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Product-quantization codebooks (Jégou et al., TPAMI'11 §II): split
    the ``dim``-dimensional space into ``m`` contiguous subspaces and fit
    an independent k-means codebook of ``k`` codewords in each.  Returns
    (sub, cid, cv) with ``cv`` an ``array<bigint>`` lattice centroid of
    length dim/m — ``m * k`` rows total, a broadcastable table at any
    corpus size (the whole point of PQ: codebook size is independent of N
    while representable centroids grow as k^m).

    Deterministic end-to-end: each subspace fit is
    :func:`kmeans_centroids` on the sliced vectors — integer-lattice
    Lloyd, seeded by the k lowest ids, fixed iterations."""
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    sub_dim = dim // m
    books = None
    for s in range(m):
        cb = (kmeans_centroids(_subspace(embs, s, sub_dim, id_col, vec_col),
                               k, iters, id_col, vec_col)
              .select(F.lit(s).alias("sub"), "cid", "cv"))
        books = cb if books is None else books.unionByName(cb)
    return books


def _sub_lattice_rows(embs: DataFrame, m: int, sub_dim: int,
                      id_col: str, vec_col: str) -> DataFrame:
    """(id, sub, subqv): every vector exploded into its ``m`` lattice
    subvectors in ONE corpus scan.  The posexplode input builds each
    slice-then-transform element inline (cheap per-element arithmetic
    over dim total elements) — never from separately-projected
    expensive columns, which Generate would re-evaluate once per
    reference (docs/PLANS.md, expression single-evaluation)."""
    arr = F.array(*[
        F.transform(
            F.slice(V.as_double(F.col(vec_col)), s * sub_dim + 1, sub_dim),
            lambda x: F.round(x * KMEANS_SCALE, 0).cast("long"))
        for s in range(m)
    ])
    return embs.select(F.col(id_col),
                       F.posexplode(arr).alias("sub", "subqv"))


def pq_codes(embs: DataFrame, m: int = 4, k: int = 4, iters: int = 2,
             dim: int = 64, id_col: str = "vec_id",
             vec_col: str = "embedding",
             books: DataFrame | None = None) -> DataFrame:
    """PQ encoding: every vector reduced to ``m`` codebook ids — (id,
    sub, code), one row per (vector, subspace), ``code`` the cid of the
    nearest subspace codeword (exact integer lattice distance, ties to
    the ascending cid).

    This is the stored representation at scale: 10^12 x dim floats
    become 10^12 x m small ints (64 dims -> 4 codes here), and search
    never touches the raw vectors again.  Encoding is ONE corpus scan:
    the m subvectors explode inline, join the broadcast m*k codebook
    table on ``sub``, and one groupBy(id, sub) argmin picks codes —
    corpus-side cost is independent of m's scan count (the earlier
    per-subspace formulation re-read the corpus m times).

    Pass ``books`` (from :func:`pq_codebooks`, or read back from the
    index job's artifacts) to encode against an existing codebook; by
    default the codebooks are fit in-plan."""
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    sub_dim = dim // m
    if books is None:
        books = pq_codebooks(embs, m, k, iters, dim, id_col, vec_col)
    b = books.select(F.col("sub").alias("b_sub"), "cid", "cv")
    scored = (_sub_lattice_rows(embs, m, sub_dim, id_col, vec_col)
              .join(F.broadcast(b), F.col("sub") == F.col("b_sub"))
              .select(F.col(id_col), F.col("sub"),
                      F.struct(_l2sq(F.col("subqv"), F.col("cv"))
                               .alias("d2"), F.col("cid")).alias("dc")))
    return (scored.groupBy(id_col, "sub")
            .agg(F.min("dc").alias("mn"))
            .select(F.col(id_col), F.col("sub"),
                    F.col("mn.cid").alias("code")))


def pq_topk(embs: DataFrame, query_id: int, k_neighbors: int = 10,
            m: int = 4, k: int = 4, iters: int = 2, dim: int = 64,
            id_col: str = "vec_id", vec_col: str = "embedding",
            books: DataFrame | None = None,
            codes: DataFrame | None = None) -> DataFrame:
    """Asymmetric-distance (ADC) PQ search (Jégou et al., TPAMI'11 §III):
    approximate ||q - x||^2 by summing, per subspace, the exact distance
    from the query's subvector to x's assigned codeword.  Returns the
    top ``k_neighbors`` rows (vec_id, adc_d2) by ascending approximate
    distance, ties by ascending id, the query itself excluded.

    Scale: the codebooks are fit ONCE and shared by the encode pass and
    the lookup table; the LUT is m x k rows (query subvectors x
    codewords) and is broadcast; the corpus side touches only the (id,
    sub, code) table — at 10^12 vectors that is the precomputed code
    store (see ``jobs/run_index.py``), and the scan is a broadcast-
    hash-join + one groupBy(id) SUM of m rows per id.  All arithmetic
    on the integer lattice — bit-identical across engines.

    Pass ``books`` and ``codes`` (the ``pq_codebooks``/``pq_codes``
    artifacts ``jobs/run_index.py`` persists, read back from parquet)
    to search the STORED index — the plan then touches the raw vectors
    only for the one query row; by default both are fit/encoded
    in-plan."""
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    if (books is None) != (codes is None):
        raise ValueError(
            "pass books and codes together (both from the stored index) "
            "or neither — codes encoded against a different codebook "
            "than the LUT silently corrupt every distance")
    sub_dim = dim // m
    if books is None:
        books = pq_codebooks(embs, m, k, iters, dim, id_col, vec_col)
        codes = pq_codes(embs, m, k, iters, dim, id_col, vec_col,
                         books=books)
    q_subs = (_sub_lattice_rows(embs, m, sub_dim, id_col, vec_col)
              .filter(F.col(id_col) == query_id)
              .select(F.col("sub").alias("q_sub"),
                      F.col("subqv").alias("q_vec")))
    lut = (books.join(F.broadcast(q_subs),
                      F.col("sub") == F.col("q_sub"))
           .select(F.col("sub"), F.col("cid"),
                   _l2sq(F.col("q_vec"), F.col("cv")).alias("d2")))
    return (codes.join(F.broadcast(lut),
                       (codes["sub"] == lut["sub"])
                       & (codes["code"] == lut["cid"]))
            .filter(F.col(id_col) != query_id)
            .groupBy(id_col)
            .agg(F.sum("d2").alias("adc_d2"))
            .orderBy(F.col("adc_d2").asc(), F.col(id_col).asc())
            .limit(k_neighbors))


def ivfadc_topk(embs: DataFrame, query_id: int, k_neighbors: int = 10,
                n_centroids: int = 4, iters: int = 2, nprobe: int = 2,
                m: int = 4, k: int = 4, dim: int = 64,
                id_col: str = "vec_id", vec_col: str = "embedding",
                cents: DataFrame | None = None,
                books: DataFrame | None = None,
                codes: DataFrame | None = None) -> DataFrame:
    """IVFADC search (Jégou et al., TPAMI'11 §IV — the non-exhaustive
    composition of the coarse IVF quantizer and PQ/ADC ranking): probe
    the ``nprobe`` coarse cells nearest the query, then ADC-rank the PQ
    codes of the vectors INSIDE the probed cells only — never the whole
    code table.  This is the actual shape of a 10^12-vector serving
    index: the coarse probe prunes the scan to ~nprobe/n_centroids of
    the corpus, and inside the probed slice the per-vector work is an
    m-row LUT sum over small ints, the raw vectors untouched.

    Returns (vec_id, cid, adc_d2): top ``k_neighbors`` by ascending
    approximate distance, ties by ascending id, the query excluded;
    ``cid`` is the surviving vector's coarse cell (provenance of the
    pruning).  All distance arithmetic on the integer lattice —
    bit-identical across engines.

    Stored-index mode: pass ``cents`` (the ``centroids`` artifact),
    ``books`` (``pq_codebooks``) and ``codes`` — the ``pq_codes``
    artifact, which ``jobs/run_index.py`` writes PARTITIONED BY ``cid``
    with the cell id as a column, so the probed-cid join prunes whole
    files at scan time.  All three together or none: codes encoded
    against one codebook and ranked by a LUT from another silently
    corrupt every distance (same contract as :func:`pq_topk`).  By
    default everything is fit/encoded in-plan (toy sizes / oracles).
    """
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    if not 1 <= nprobe <= n_centroids:
        raise ValueError(f"nprobe must be in [1, {n_centroids}]; got {nprobe}")
    stored = (cents is not None, books is not None, codes is not None)
    if any(stored) and not all(stored):
        raise ValueError(
            "pass cents, books and codes together (all from the stored "
            "index) or none — mixing stored and in-plan artifacts can "
            "pair codes with a codebook they were not encoded against")
    sub_dim = dim // m
    if cents is None:
        cents = kmeans_centroids(embs, n_centroids, iters, id_col, vec_col)
        books = pq_codebooks(embs, m, k, iters, dim, id_col, vec_col)
        codes = pq_codes(embs, m, k, iters, dim, id_col, vec_col,
                         books=books) \
            .join(assign_centroids(embs, cents=cents, id_col=id_col,
                                   vec_col=vec_col)
                  .select(F.col(id_col), F.col("cid")), id_col)
    lat = _lattice(embs, id_col, vec_col)
    probes = (lat.filter(F.col(id_col) == query_id)
              .crossJoin(F.broadcast(cents))
              .select(F.col("cid"),
                      _l2sq(F.col("qv"), F.col("cv")).alias("d2"))
              .orderBy("d2", "cid").limit(nprobe).select("cid"))
    # the probed-cid join comes FIRST: the big code table is pruned to
    # the nprobe cells before any ADC work (file-level when the stored
    # codes are partitioned by cid; a broadcast hash semi-join otherwise)
    pruned = codes.join(F.broadcast(probes), "cid")
    q_subs = (_sub_lattice_rows(embs, m, sub_dim, id_col, vec_col)
              .filter(F.col(id_col) == query_id)
              .select(F.col("sub").alias("q_sub"),
                      F.col("subqv").alias("q_vec")))
    lut = (books.join(F.broadcast(q_subs),
                      F.col("sub") == F.col("q_sub"))
           .select(F.col("sub").alias("l_sub"), F.col("cid").alias("l_cid"),
                   _l2sq(F.col("q_vec"), F.col("cv")).alias("d2")))
    return (pruned.join(F.broadcast(lut),
                        (pruned["sub"] == lut["l_sub"])
                        & (pruned["code"] == lut["l_cid"]))
            .filter(F.col(id_col) != query_id)
            .groupBy(id_col, "cid")
            .agg(F.sum("d2").alias("adc_d2"))
            .orderBy(F.col("adc_d2").asc(), F.col(id_col).asc())
            .limit(k_neighbors))


def bucketed_topk(embs: DataFrame, query_id: int, k: int = 10, n_bits: int = 8,
                  id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: exact cosine ranking restricted to the
    query's sign-LSH bucket (IVF nprobe=1). Recall trades off with
    n_bits; the scan prunes to ~1/2^bits of the corpus when the table
    is partitioned by bucket."""
    with_bucket = embs.withColumn("bucket", V.sign_bucket(F.col(vec_col), n_bits))
    q = (
        with_bucket.filter(F.col(id_col) == query_id)
        .select(F.col(id_col).alias("query_id"),
                V.as_double(F.col(vec_col)).alias("q_vec"),
                F.col("bucket").alias("q_bucket"))
    )
    sim = F.round(V.cosine(V.as_double(F.col(vec_col)), F.col("q_vec")), 6)
    return (
        with_bucket.join(F.broadcast(q), with_bucket["bucket"] == q["q_bucket"])
        .filter(F.col(id_col) != F.col("query_id"))
        .select(F.col(id_col), sim.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def jl_sign_matrix(spark, in_dim: int, out_dim: int, seed: int = 0):
    """Deterministic Johnson-Lindenstrauss sign matrix as a (i, j, s)
    DataFrame: s = ±1 from the parity of hash32(md5('jl<seed>:i:j')) —
    content-addressed, so every run, cluster, and engine materializes
    the identical matrix without storing it.  in_dim x out_dim rows:
    broadcast-sized for any practical projection."""
    from ..functions import hashing as H

    ij = (spark.range(in_dim).select(F.col("id").alias("i"))
          .crossJoin(spark.range(out_dim).select(F.col("id").alias("j"))))
    h = H.hash32(F.concat(F.lit(f"jl{seed}:"),
                          F.col("i").cast("string"), F.lit(":"),
                          F.col("j").cast("string")))
    return ij.withColumn(
        "s", F.when(h % 2 == 0, F.lit(1)).otherwise(F.lit(-1))
        .cast("long"))


def project_embeddings(embs: DataFrame, out_dim: int = 16, seed: int = 0,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       dim: int = 64) -> DataFrame:
    """JL sign projection on the integer lattice: y_j = Σ_i x_i·s(i,j)
    with x the KMEANS_SCALE-rounded lattice values — exact bigint sums,
    so projected vectors are bit-identical across engines.  Returns
    (id, j, y) in relational form (out_dim rows per vector).

    Why: random sign projections preserve cosine geometry in
    expectation (Achlioptas 2003's database-friendly JL variant) — the
    cheap dimension cut ahead of ANN at 10^12 vectors: a 64→16
    projection quarters every downstream distance computation and
    shrinks the stored index the same factor.

    Scale: one explode of the lattice values joined to the broadcast
    sign matrix, one (id, j) partial-agg sum — a single keyed shuffle
    whose width is out_dim longs per vector."""
    if out_dim < 1:
        raise ValueError(f"out_dim must be >= 1; got {out_dim}")
    lat = _lattice(embs, id_col, vec_col)
    signs = jl_sign_matrix(embs.sparkSession, dim, out_dim, seed)
    expl = lat.select(F.col(id_col), F.posexplode("qv").alias("i", "v"))
    return (expl.join(F.broadcast(signs), "i")
            .groupBy(id_col, "j")
            .agg(F.sum(F.col("v") * F.col("s")).alias("y")))


def jl_topk(embs: DataFrame, query_id: int, k: int, out_dim: int = 16,
            seed: int = 0, id_col: str = "vec_id",
            vec_col: str = "embedding", dim: int = 64) -> DataFrame:
    """Cosine top-k in the PROJECTED space: exact integer dots/norms
    over the projected vectors, one double division + sqrt at the very
    end (correctly-rounded IEEE ops — engine-identical), ties by id.
    Returns (vec_id, proj_cosine)."""
    proj = project_embeddings(embs, out_dim, seed, id_col, vec_col, dim)
    q = proj.filter(F.col(id_col) == query_id) \
        .select(F.col("j"), F.col("y").alias("qy"))
    joined = (proj.filter(F.col(id_col) != query_id)
              .join(F.broadcast(q), "j")
              .groupBy(id_col)
              .agg(F.sum(F.col("y") * F.col("qy")).alias("dot"),
                   F.sum(F.col("y") * F.col("y")).alias("n2"),
                   F.sum(F.col("qy") * F.col("qy")).alias("qn2")))
    cos = F.round(F.col("dot") / (F.sqrt(F.col("n2")) * F.sqrt(F.col("qn2"))),
                  6)
    return (joined.select(F.col(id_col), cos.alias("proj_cosine"))
            .orderBy(F.col("proj_cosine").desc(), F.col(id_col).asc())
            .limit(k))


def knn_join(queries: DataFrame, corpus: DataFrame, k: int = 5,
             n_centroids: int = 4, iters: int = 2, nprobe: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding",
             cents: DataFrame | None = None) -> DataFrame:
    """Batch k-NN JOIN: for EVERY query vector, its top-``k`` cosine
    neighbors in the corpus — the many-queries shape of retrieval-
    augmented dataset construction and SemDeDup assignment, where
    :func:`ivf_topk`'s one-query-per-plan form would launch a job per
    row.  IVF-blocked: both sides are assigned to the trained coarse
    cells, each query probes its ``nprobe`` nearest cells, and cosine
    is ranked only inside (query, probed-cell) candidate pairs — never
    the |Q| x |N| cross product.

    Returns (query_id, vec_id, cid, cosine_sim, rank): ``rank`` 1..k by
    (cosine desc, id asc) per query, self-matches excluded, ordered by
    (query_id, rank).

    Scale (10^12 corpus, 10^6+ queries): the corpus is assigned ONCE
    (same single pass :func:`ivf_topk` uses — store it partitioned by
    ``cid`` and the probe join prunes files); the probe side is
    |Q| x nprobe rows and is broadcast here (drop the broadcast hint
    for huge Q and the cid join becomes sort-merge, still never
    all-pairs).  The per-query top-k filter is a rank-limit window:
    Spark's WindowGroupLimit rewrite pushes a per-partition top-k
    BEFORE the (query_id) exchange, so no single task ever holds a
    query's full candidate set.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1; got {k}")
    if not 1 <= nprobe <= n_centroids:
        raise ValueError(f"nprobe must be in [1, {n_centroids}]; got {nprobe}")
    from pyspark.sql import Window

    if cents is None:
        cents = kmeans_centroids(corpus, n_centroids, iters, id_col, vec_col)
    assigned = assign_centroids(corpus, cents=cents, id_col=id_col,
                                vec_col=vec_col)
    qlat = _lattice(queries, id_col, vec_col)
    qdist = (qlat.crossJoin(F.broadcast(cents))
             .select(F.col(id_col).alias("query_id"), F.col("cid"),
                     _l2sq(F.col("qv"), F.col("cv")).alias("d2")))
    wprobe = Window.partitionBy("query_id").orderBy(F.col("d2").asc(),
                                                    F.col("cid").asc())
    probes = (qdist.withColumn("_pn", F.row_number().over(wprobe))
              .filter(F.col("_pn") <= nprobe).select("query_id", "cid"))
    qvecs = queries.select(F.col(id_col).alias("query_id"),
                           V.as_double(F.col(vec_col)).alias("q_vec"))
    probe_side = probes.join(qvecs, "query_id")
    sim = F.round(V.cosine(V.as_double(F.col(vec_col)), F.col("q_vec")), 6)
    cand = (assigned.join(F.broadcast(probe_side), "cid")
            .filter(F.col(id_col) != F.col("query_id"))
            .select(F.col("query_id"), F.col(id_col), F.col("cid"),
                    sim.alias("cosine_sim")))
    wk = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(),
                                                F.col(id_col).asc())
    return (cand.withColumn("rank", F.row_number().over(wk))
            .filter(F.col("rank") <= k)
            .withColumn("rank", F.col("rank").cast("long"))
            .orderBy("query_id", "rank"))


SQ8_LEVELS = 255  # int8 code range [0, 255]


def sq8_bounds(embs: DataFrame, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Per-dimension (dim, mn, mx) lattice bounds over the corpus — the
    trained parameters of scalar quantization (the stored artifact; one
    row per dimension, broadcast-sized for any practical dim).

    Scale: one posexplode + (dim) partial-agg min/max — shuffle
    cardinality is ``dim`` rows regardless of N."""
    lat = _lattice(embs, id_col, vec_col)
    return (lat.select(F.posexplode("qv").alias("dim", "v"))
            .groupBy("dim")
            .agg(F.min("v").alias("mn"), F.max("v").alias("mx")))


def _sq8_bounds_row(bounds: DataFrame) -> DataFrame:
    """Fold the (dim, mn, mx) table into ONE row of aligned arrays
    (mns, mxs) so the per-vector quantize/reconstruct is a narrow
    zip over broadcast arrays instead of a per-dim join."""
    return (bounds.groupBy()
            .agg(F.array_sort(F.collect_list(
                F.struct("dim", "mn", "mx"))).alias("p"))
            .select(F.transform("p", lambda s: s["mn"]).alias("mns"),
                    F.transform("p", lambda s: s["mx"]).alias("mxs")))


def sq8_codes(embs: DataFrame, id_col: str = "vec_id",
              vec_col: str = "embedding",
              bounds: DataFrame | None = None) -> DataFrame:
    """Scalar int8 quantization: every lattice value mapped to a code in
    [0, 255] by per-dimension min-max — (id, codes array<long>), an 8x
    (fp64-lattice) / 4x (fp32) shrink of the stored index with none of
    PQ's codebook training.  code = ((v - mn) * 255) // (mx - mn),
    clamped (constant dimensions code to 0) — exact integer arithmetic,
    bit-identical across engines.

    Pass ``bounds`` (the :func:`sq8_bounds` artifact read back from
    parquet) to encode NEW vectors against stored training bounds —
    out-of-range values clamp to the edge codes, same contract as any
    SQ index.  Default fits bounds in-plan (toy sizes / oracles).

    Scale: bounds fold to one broadcast row of arrays; encoding is a
    single narrow zip_with per vector — no shuffle of the data."""
    if bounds is None:
        bounds = sq8_bounds(embs, id_col, vec_col)
    brow = _sq8_bounds_row(bounds)
    lat = _lattice(embs, id_col, vec_col)
    return (lat.crossJoin(F.broadcast(brow))
            .select(F.col(id_col), _sq8_code_expr().alias("codes")))


def _sq8_code_expr() -> F.Column:
    """The quantize expression over a row carrying (qv, mns, mxs):
    shared by :func:`sq8_codes` and :func:`sq8_topk`'s in-plan path so
    the bounds fold has exactly ONE consumer per plan."""
    bz = F.zip_with(F.col("mns"), F.col("mxs"),
                    lambda mn, mx: F.struct(mn.alias("mn"), mx.alias("mx")))
    return F.zip_with(
        F.col("qv"), bz,
        lambda v, b: F.when(b["mx"] == b["mn"], F.lit(0).cast("long"))
        .otherwise(F.least(
            F.lit(SQ8_LEVELS).cast("long"),
            F.greatest(F.lit(0).cast("long"),
                       F.floor(((v - b["mn"]) * SQ8_LEVELS).cast("double")
                               / (b["mx"] - b["mn"]).cast("double"))))))


def sq8_topk(embs: DataFrame, query_id: int, k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             codes: DataFrame | None = None,
             bounds: DataFrame | None = None) -> DataFrame:
    """Asymmetric scalar-quantized top-k: the full-precision lattice
    query vs midpoint-reconstructed int8 corpus codes — the SQ
    counterpart of :func:`pq_topk`'s ADC.  recon = mn +
    ((2*code + 1) * (mx - mn)) // 510 (cell midpoint, halving the
    worst-case quantization error of edge reconstruction); distance is
    the exact integer L2 between the query lattice vector and the
    reconstruction.  Returns (vec_id, sq_d2): top ``k`` ascending,
    ties by id, query excluded.

    Stored-index mode: pass ``codes`` AND ``bounds`` together (codes
    reconstructed against bounds they were not encoded with silently
    corrupt every distance — same contract as :func:`pq_topk`).

    Scale: the scan reads ONLY the code column (the raw vectors stay on
    disk), the bounds row and query vector broadcast, and
    TakeOrderedAndProject keeps top-k memory O(k) per task — no
    shuffle at all.  The in-plan path derives codes and carries the
    bounds arrays in ONE shared column layer, so the per-dim bounds
    aggregate has exactly one consumer (the multi-consumer re-derive
    discipline — Catalyst does not reuse the fold across branches)."""
    if (codes is None) != (bounds is None):
        raise ValueError(
            "pass codes and bounds together (both from the stored index) "
            "or neither — codes reconstructed against foreign bounds "
            "silently corrupt every distance")
    if codes is None:
        brow = _sq8_bounds_row(sq8_bounds(embs, id_col, vec_col))
        coded = (_lattice(embs, id_col, vec_col)
                 .crossJoin(F.broadcast(brow))
                 .select(F.col(id_col), _sq8_code_expr().alias("codes"),
                         F.col("mns"), F.col("mxs")))
    else:
        coded = codes.crossJoin(F.broadcast(_sq8_bounds_row(bounds)))
    q = (_lattice(embs, id_col, vec_col)
         .filter(F.col(id_col) == query_id)
         .select(F.col("qv").alias("qqv")))
    z = F.arrays_zip(F.col("codes"), F.col("mns"), F.col("mxs"),
                     F.col("qqv"))

    def _recon(s):
        return F.when(s["mxs"] == s["mns"], s["mns"]).otherwise(
            s["mns"] + F.floor(
                ((2 * s["codes"] + 1) * (s["mxs"] - s["mns"]))
                .cast("double") / F.lit(2.0 * SQ8_LEVELS)))

    # hoist the branchy reconstruction into ONE transform pass — HOF
    # lambdas are interpreted (never codegen'd), so referencing
    # _recon(s) twice inside the aggregate would evaluate the whole
    # branch chain twice per element (the cross-alias no-CSE rule at
    # expression scale)
    diffs = F.transform(z, lambda s: s["qqv"] - _recon(s))
    d2 = F.aggregate(diffs, F.lit(0).cast("long"),
                     lambda acc, v: acc + v * v)
    return (coded.filter(F.col(id_col) != query_id)
            .crossJoin(F.broadcast(q))
            .select(F.col(id_col), d2.alias("sq_d2"))
            .orderBy(F.col("sq_d2").asc(), F.col(id_col).asc())
            .limit(k))


def ivfsq_topk(embs: DataFrame, query_id: int, k: int = 10,
               n_centroids: int = 4, iters: int = 2, nprobe: int = 2,
               id_col: str = "vec_id", vec_col: str = "embedding",
               cents: DataFrame | None = None,
               bounds: DataFrame | None = None,
               codes: DataFrame | None = None) -> DataFrame:
    """IVF-SQ search — the coarse-quantizer composition for the SCALAR
    int8 index, exactly as :func:`ivfadc_topk` composes IVF with PQ:
    probe the ``nprobe`` coarse cells nearest the query, then rank the
    midpoint-reconstructed SQ8 codes of the vectors INSIDE the probed
    cells only — never the whole code table.  Together with IVFADC this
    covers both stored-index families a 10^12-vector serving layer
    chooses between (trained sub-codebooks vs training-free per-dim
    bounds; Jégou et al. TPAMI'11 §IV for the probe shape).

    Returns (vec_id, cid, sq_d2): top ``k`` by ascending asymmetric
    integer L2, ties by ascending id, the query excluded; ``cid`` is
    the surviving vector's coarse cell (provenance of the pruning).

    Stored-index mode: pass ``cents`` (the ``centroids`` artifact),
    ``bounds`` (``sq8_bounds``) and ``codes`` — the ``sq8_codes``
    artifact, which ``jobs/run_index.py`` writes PARTITIONED BY ``cid``
    with the cell id as a column, so the probed-cid join prunes whole
    files at scan time.  All three together or none (codes
    reconstructed against bounds they were not encoded with, or pruned
    by cells they were not assigned under, silently corrupt every
    distance).  By default everything is fit/encoded in-plan (toy
    sizes / oracles), carrying (codes, mns, mxs) in ONE shared column
    layer so the per-dim bounds fold has exactly one consumer.

    Scale: the probed scan reads only the code column of nprobe/
    n_centroids of the corpus; bounds row, probe list and query vector
    all broadcast; TakeOrderedAndProject keeps top-k memory O(k) per
    task — no shuffle at all in stored mode."""
    if not 1 <= nprobe <= n_centroids:
        raise ValueError(f"nprobe must be in [1, {n_centroids}]; got {nprobe}")
    stored = (cents is not None, bounds is not None, codes is not None)
    if any(stored) and not all(stored):
        raise ValueError(
            "pass cents, bounds and codes together (all from the stored "
            "index) or none — mixing stored and in-plan artifacts can "
            "pair codes with bounds/cells they were not encoded under")
    if cents is None:
        cents = kmeans_centroids(embs, n_centroids, iters, id_col, vec_col)
        brow = _sq8_bounds_row(sq8_bounds(embs, id_col, vec_col))
        coded = (_lattice(embs, id_col, vec_col)
                 .crossJoin(F.broadcast(brow))
                 .select(F.col(id_col), _sq8_code_expr().alias("codes"),
                         F.col("mns"), F.col("mxs"))
                 .join(assign_centroids(embs, cents=cents, id_col=id_col,
                                        vec_col=vec_col)
                       .select(F.col(id_col), F.col("cid")), id_col))
    else:
        coded = codes.crossJoin(F.broadcast(_sq8_bounds_row(bounds)))
    lat = _lattice(embs, id_col, vec_col)
    probes = (lat.filter(F.col(id_col) == query_id)
              .crossJoin(F.broadcast(cents))
              .select(F.col("cid"),
                      _l2sq(F.col("qv"), F.col("cv")).alias("d2"))
              .orderBy("d2", "cid").limit(nprobe).select("cid"))
    # the probed-cid join comes FIRST: the code table is pruned to the
    # nprobe cells before any reconstruction work (file-level when the
    # stored codes are partitioned by cid)
    pruned = coded.join(F.broadcast(probes), "cid")
    q = (lat.filter(F.col(id_col) == query_id)
         .select(F.col("qv").alias("qqv")))
    z = F.arrays_zip(F.col("codes"), F.col("mns"), F.col("mxs"),
                     F.col("qqv"))

    def _recon(s):
        return F.when(s["mxs"] == s["mns"], s["mns"]).otherwise(
            s["mns"] + F.floor(
                ((2 * s["codes"] + 1) * (s["mxs"] - s["mns"]))
                .cast("double") / F.lit(2.0 * SQ8_LEVELS)))

    # single-pass reconstruction (see sq8_topk: HOF lambdas are
    # interpreted, referencing _recon twice doubles the branch work)
    diffs = F.transform(z, lambda s: s["qqv"] - _recon(s))
    d2 = F.aggregate(diffs, F.lit(0).cast("long"),
                     lambda acc, v: acc + v * v)
    return (pruned.filter(F.col(id_col) != query_id)
            .crossJoin(F.broadcast(q))
            .select(F.col(id_col), F.col("cid"), d2.alias("sq_d2"))
            .orderBy(F.col("sq_d2").asc(), F.col(id_col).asc())
            .limit(k))


def lattice_l2_topk(embs: DataFrame, query_id: int, k: int = 10,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Exact integer-lattice L2 top-k — the brute-force baseline the
    quantized searches (:func:`sq8_topk`, :func:`pq_topk`) are measured
    against.  Returns (vec_id, d2), ascending, ties by id, query
    excluded.  Narrow scan + TakeOrderedAndProject, no shuffle."""
    lat = _lattice(embs, id_col, vec_col)
    q = (lat.filter(F.col(id_col) == query_id)
         .select(F.col("qv").alias("qqv")))
    return (lat.filter(F.col(id_col) != query_id)
            .crossJoin(F.broadcast(q))
            .select(F.col(id_col),
                    _l2sq(F.col("qv"), F.col("qqv")).alias("d2"))
            .orderBy(F.col("d2").asc(), F.col(id_col).asc())
            .limit(k))

"""Corpus deduplication operators — exact, MinHash+LSH, SimHash,
token-set Jaccard. DataFrame-native (no UDFs); every hash derives from
md5 so a DuckDB oracle can replay them exactly (functions/hashing.py).

Scale design (100 TB corpus):
  * exact dedup     — one hash-shuffle on a 16-byte digest; map-side
    partial aggregation collapses most groups before the exchange.
  * MinHash LSH     — signature computation is shuffle-free; the only
    shuffles are the per-band self-joins on the band key, whose
    cardinality per bucket is tiny for honest near-dup thresholds.
    Banding is the standard S-curve trade-off (Leskovec et al., MMDS
    ch.3): b bands of r rows ≈ threshold (1/b)^(1/r).
  * Jaccard verify  — only candidate pairs from banding are verified,
    never the O(N^2) cross join; blocking keys bound the worst case.
  * SimHash         — per-(doc, bit) partial sums then a groupBy(doc);
    near-dup = small Hamming distance on the signature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..functions import text as T

DEFAULT_MINHASH_SEEDS = 8
DEFAULT_BANDS = 2
SIMHASH_BITS = 16


def exact_duplicates(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", prefix_len: int | None = None) -> DataFrame:
    """Exact-duplicate groups by content digest.

    Returns (content_hash, dup_count, canonical_id) for groups with >1
    member; ``canonical_id`` is the min id (keep-first policy).
    ``prefix_len`` hashes only a prefix (cheap fuzzy-exact mode).
    """
    key = F.col(text_col) if prefix_len is None else F.substring(F.col(text_col), 1, prefix_len)
    return (
        docs.select(F.md5(key.cast("string")).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("dup_count"),
             F.min(id_col).alias("canonical_id"))
        .filter(F.col("dup_count") > 1)
    )


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       n_hashes: int = DEFAULT_MINHASH_SEEDS,
                       shingle_size: int = 3) -> DataFrame:
    """Per-document MinHash signature: n_hashes bigint columns
    ``sig_0 .. sig_{n-1}`` over the distinct word-``shingle_size``-gram
    shingle set (Broder 1997; shingle_size=1 degrades to unigrams).
    One md5 per shingle total — per-seed values are integer
    permutations computed in a single fold (functions/hashing.py)."""
    arr = H.minhash_int_array(T.shingle_set(F.col(text_col), shingle_size),
                              H.MINHASH_SEEDS[:n_hashes])
    t = docs.select(F.col(id_col), arr.alias("sig_arr"))
    return t.select(
        F.col(id_col),
        *[F.element_at(F.col("sig_arr"), s + 1).alias(f"sig_{s}")
          for s in range(n_hashes)],
    )


def minhash_band_keys(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      n_hashes: int = DEFAULT_MINHASH_SEEDS,
                      bands: int = DEFAULT_BANDS,
                      shingle_size: int = 3) -> DataFrame:
    """(id, band, band_key) — one row per band; equal band_key =>
    LSH candidate pair.

    Single-pass: the signature row explodes into its band keys via
    ``posexplode`` so the (expensive) md5-per-shingle signature lineage
    is evaluated exactly once, not once per band."""
    sigs = minhash_signatures(docs, text_col, id_col, n_hashes, shingle_size)
    rows_per_band = n_hashes // bands
    band_keys = F.array(*[
        F.concat_ws("-", *[F.col(f"sig_{b * rows_per_band + r}").cast("string")
                           for r in range(rows_per_band)])
        for b in range(bands)
    ])
    return sigs.select(
        F.col(id_col), F.posexplode(band_keys).alias("band", "band_key")
    )


def minhash_candidate_pairs(docs: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id",
                            n_hashes: int = DEFAULT_MINHASH_SEEDS,
                            bands: int = DEFAULT_BANDS,
                            shingle_size: int = 3) -> DataFrame:
    """Distinct candidate near-dup pairs (id_a < id_b) from band-key
    collisions. The join shuffles on band_key only; AQE handles any
    hot bucket (e.g. empty-document collisions).

    The band-key table is persisted before the self-join so the
    md5-per-shingle signature computation runs once, not once per join
    side — at cluster scale this materialization is a signatures table
    written once and joined many times."""
    keys = minhash_band_keys(docs, text_col, id_col, n_hashes, bands, shingle_size).persist()
    try:
        a = keys.select(F.col("band"), F.col("band_key"), F.col(id_col).alias("id_a"))
        b = keys.select(F.col("band"), F.col("band_key"), F.col(id_col).alias("id_b"))
        pairs = (
            a.join(b, ["band", "band_key"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        # materialize while the signature table is pinned, then release
        pairs = pairs.localCheckpoint(eager=True)
    finally:
        keys.unpersist()
    return pairs


def jaccard_pairs(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id",
                  block_keys: list[str] | None = None,
                  threshold: float = 0.8, shingle_size: int = 3) -> DataFrame:
    """Token-set Jaccard similarity join within blocking buckets.

    (id_a, id_b, jaccard) for pairs above ``threshold``. ``block_keys``
    are equality blocking columns (the scalable path — without them
    this is an O(N^2) cross join and should only run on samples).
    Jaccard = |A ∩ B| / |A ∪ B| over distinct word-k-gram shingles.
    """
    toks = T.shingle_set(F.col(text_col), shingle_size)
    base_cols = [F.col(id_col), toks.alias("tok_set")]
    base_cols += [F.col(k) for k in (block_keys or [])]
    t = docs.select(*base_cols)
    a = t.select([F.col(id_col).alias("id_a"), F.col("tok_set").alias("tok_a")]
                 + [F.col(k) for k in (block_keys or [])])
    b = t.select([F.col(id_col).alias("id_b"), F.col("tok_set").alias("tok_b")]
                 + [F.col(k) for k in (block_keys or [])])
    joined = a.join(b, block_keys) if block_keys else a.crossJoin(b)
    inter = F.size(F.array_intersect(F.col("tok_a"), F.col("tok_b")))
    union = F.size(F.array_union(F.col("tok_a"), F.col("tok_b")))
    jac = inter.cast("double") / union.cast("double")
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def deduplicate_corpus(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       jaccard_threshold: float = 0.8,
                       n_hashes: int = DEFAULT_MINHASH_SEEDS,
                       bands: int = DEFAULT_BANDS,
                       shingle_size: int = 3) -> DataFrame:
    """End-to-end near-dedup with keep-first policy: a document is
    dropped iff an LSH candidate pair links it to a LOWER-id document
    whose verified shingle Jaccard clears the threshold.

    Pipeline: MinHash band keys -> candidate pairs -> exact Jaccard
    verify on candidates only -> anti-join the losers. This is the
    standard greedy keep-first approximation (no transitive closure —
    the same policy as keep-min-per-cluster for pair-linked docs).

    Scale: the anti-join key is just the id column; the expensive
    verification runs only on band-collision pairs, never O(N^2).
    """
    cand = minhash_candidate_pairs(docs, text_col, id_col, n_hashes, bands,
                                   shingle_size)
    toks = T.shingle_set(F.col(text_col), shingle_size)
    t = docs.select(F.col(id_col), toks.alias("tok_set"))
    a = t.select(F.col(id_col).alias("id_a"), F.col("tok_set").alias("tok_a"))
    b = t.select(F.col(id_col).alias("id_b"), F.col("tok_set").alias("tok_b"))
    inter = F.size(F.array_intersect(F.col("tok_a"), F.col("tok_b")))
    union = F.size(F.array_union(F.col("tok_a"), F.col("tok_b")))
    jac = F.round(inter.cast("double") / union.cast("double"), 6)
    losers = (
        cand.join(a, "id_a").join(b, "id_b")
        .filter(jac >= jaccard_threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return docs.join(losers, id_col, "left_anti")


def simhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       bits: int = SIMHASH_BITS,
                       shingle_size: int = 3) -> DataFrame:
    """Per-document SimHash signature (Charikar 2002): for each bit j,
    sum +1/-1 votes of hash32(shingle) bit j over the distinct shingle
    set; bit j of the signature is 1 iff the sum is positive.

    Implementation: ONE md5 per shingle (transform to a long array),
    then explode the already-hashed longs and take ``bits`` conditional
    sums under groupBy(doc) — the sums partial-aggregate map-side so the
    exchange carries one row of 16 ints per document. (A single-fold
    array-accumulator variant was measured faster steady-state but its
    16-wide generated fold code paid 8-30 s of one-time janino/JIT
    compile per session — the small-expression aggregate is the better
    cold-start trade.)
    """
    toks = T.shingle_set(F.col(text_col), shingle_size)
    hashed = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"))
    exploded = docs.select(F.col(id_col), F.explode(hashed).alias("h"))
    votes = [
        F.sum(F.when(F.shiftright(F.col("h"), j).bitwiseAND(1) == 1, 1)
               .otherwise(-1)).alias(f"v_{j}")
        for j in range(bits)
    ]
    agg = exploded.groupBy(id_col).agg(*votes)
    sig = F.lit(0).cast("long")
    for j in range(bits):
        sig = sig + F.when(F.col(f"v_{j}") > 0, F.lit(2 ** j)).otherwise(F.lit(0))
    return agg.select(F.col(id_col), sig.alias("simhash"))


def embedding_near_pairs(embs: DataFrame, id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         threshold: float = 0.35,
                         n_bits: int = 8) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, sign-LSH-blocked: only
    vectors sharing an LSH bucket (functions/vectors.sign_bucket) are
    compared, then the exact cosine gates the pair — the ANN analogue
    of MinHash banding, turning O(N^2) into per-bucket joins.

    Returns (id_a, id_b, cosine_sim) for same-bucket pairs with
    similarity >= threshold (rounded to 6 dp, ids ordered)."""
    from ..functions import vectors as V

    t = embs.select(F.col(id_col), V.as_double(F.col(vec_col)).alias("v"),
                    V.sign_bucket(F.col(vec_col), n_bits).alias("bucket"))
    a = t.select(F.col("bucket"), F.col(id_col).alias("id_a"),
                 F.col("v").alias("va"))
    b = t.select(F.col("bucket"), F.col(id_col).alias("id_b"),
                 F.col("v").alias("vb"))
    sim = F.round(V.cosine(F.col("va"), F.col("vb")), 6)
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def simhash_near_pairs(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", bits: int = SIMHASH_BITS,
                       max_hamming: int = 2, shingle_size: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Scale path: block on the top half of the signature (any pair within
    Hamming distance <= bits/2 blocks shares at least one half —
    standard pigeonhole banding), then verify the exact distance via
    bit_count on the XOR.
    """
    sigs = simhash_signatures(docs, text_col, id_col, bits, shingle_size)
    half = bits // 2
    hi = (F.col("simhash") / F.lit(2 ** half)).cast("long").alias("block_hi")
    lo = (F.col("simhash") % F.lit(2 ** half)).alias("block_lo")
    t = sigs.select(F.col(id_col), F.col("simhash"), hi, lo)
    pairs = None
    for block in ["block_hi", "block_lo"]:
        a = t.select(F.col(block), F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"))
        b = t.select(F.col(block), F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"))
        p = a.join(b, block).filter(F.col("id_a") < F.col("id_b")) \
             .select("id_a", "id_b", "sh_a", "sh_b")
        pairs = p if pairs is None else pairs.unionByName(p)
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        pairs.distinct()
        .select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )

"""Interleaved text+media span operators with computational oracles.

The engine's input contract (BASELINE ``input_hint``) is an Iceberg
table of interleaved documents: ``(doc_id, spans:array<struct<
kind:string, text:string, media_ref:string, offset:int>>)``.  The
extraction pipeline consumes that shape from fixtures and is verified
against golden artifacts; this module closes the remaining gap — a
family of spans-shape operators whose semantics are simple enough to
replay *computationally* in ANSI SQL, so the DuckDB oracle derives the
same interleaved table from the plain ``documents`` corpus and checks
values end-to-end with no golden file in the loop.

Operators:

  * :func:`synth_interleaved` — deterministically lift the flat
    ``documents`` table into the interleaved spans shape: whitespace
    tokens grouped into fixed-size text spans, a synthetic image span
    injected after every ``media_every``-th text span (the classic
    web-doc shape: paragraphs with inline figures).  Pure narrow
    column expressions — one ``transform`` over a position sequence,
    no explode, no shuffle.
  * :func:`caption_pairs` — for every media span, the nearest
    PRECEDING text span in reading order (the standard weak-label
    captioning rule for interleaved corpora, cf. the alt-text/figure
    pairing used by CLIP-style dataset builders).  A single O(n)
    ``aggregate`` fold per document: zero shuffle, zero explode — the
    whole operator is map-side.
  * :func:`pack_interleaved` — cut each document's span sequence into
    fixed token-budget training sequences where a text span costs its
    token count and a media span costs a fixed ``media_cost`` (vision
    tokens); spans never split, sequences never cross documents.
    ``seq_id = floor((cumsum - cost) / budget)`` — the same cumsum
    formulation as :func:`chunking.pack_documents`, but PER DOCUMENT:
    the window is keyed by ``doc_id`` (never partition-less) and the
    following per-(doc, seq) aggregate reuses the window's hash
    partitioning (``doc_id`` is a subset of the grouping key), so the
    whole operator costs exactly ONE exchange at any corpus size.

Reference parity: the reference pipeline's span model is
``extractor.py`` emitting (kind, text, media_ref, order) rows per
document (see SURVEY §1.1); these operators generalize that shape to
corpus-scale multimodal curation.  100 TB shape: everything here is
either fully narrow or keyed by ``doc_id`` — skew follows document
length and is bounded by the same ``skew.salted_repartition`` defusal
the extraction path uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T

#: span struct field order — matches the input_hint / fixtures schema
_SPAN_FIELDS = ("kind", "text", "media_ref", "offset")


def synth_interleaved(docs: DataFrame, span_tokens: int = 8,
                      media_every: int = 3,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """``(doc_id, spans)`` — deterministic interleaved lift of a flat
    text corpus.

    Rule (exactly replayable in SQL): whitespace tokens are grouped
    into consecutive text spans of ``span_tokens`` tokens (final span
    = remainder); after every ``media_every``-th text span an image
    span is injected with ``media_ref = 'img_<doc_id>_<k>'`` (k =
    1-based media index) and NULL text.  ``offset`` is the 0-based
    position in the combined sequence, computed from the rule — never
    from partition order.

    With block size ``B = media_every + 1``, combined position ``p``
    is a media span iff ``(p + 1) % B == 0``; its media index is
    ``(p + 1) / B``; a text position's chunk index is
    ``p - floor((p + 1) / B)``.  Total length = ``n_chunks +
    floor(n_chunks / media_every)``.

    DuckDB twin (exploded form)::

        WITH d AS (SELECT doc_id,
                          list_filter(string_split(text, ' '),
                                      t -> t != '') AS toks
                   FROM documents),
        n AS (SELECT doc_id, toks,
                     CAST(ceil(len(toks) / 8.0) AS BIGINT) AS nc
              FROM d WHERE len(toks) > 0)
        SELECT doc_id, p AS "offset",
               CASE WHEN (p + 1) % 4 = 0 THEN 'image' ELSE 'text' END
                 AS kind, ...
        FROM n, unnest(range(0, nc + nc // 3)) AS u(p)

    Narrow plan: one projection builds the span array inside a single
    ``transform`` (the Generate-no-CSE rule: the token array is
    referenced through one hoisted column layer, sliced once per
    span).
    """
    if span_tokens < 1:
        raise ValueError(f"span_tokens must be >= 1; got {span_tokens}")
    if media_every < 1:
        raise ValueError(f"media_every must be >= 1; got {media_every}")
    blk = F.lit(media_every + 1)
    tok_df = docs.select(F.col(id_col),
                         T.tokens(F.col(text_col)).alias("_toks"))
    toks = F.col("_toks")
    n = F.size(toks)
    n_chunks = F.ceil(n / F.lit(span_tokens)).cast("int")
    n_media = F.floor(n_chunks / F.lit(media_every)).cast("int")
    total = (n_chunks + n_media).cast("int")

    def span(p: F.Column) -> F.Column:
        is_media = ((p + 1) % blk) == 0
        media_idx = ((p + 1) / blk).cast("int")
        chunk_idx = (p - F.floor((p + 1) / blk)).cast("int")
        text = F.concat_ws(
            " ", F.slice(toks, chunk_idx * span_tokens + 1, span_tokens))
        return F.struct(
            F.when(is_media, F.lit("image")).otherwise(F.lit("text"))
             .alias("kind"),
            F.when(is_media, F.lit(None).cast("string")).otherwise(text)
             .alias("text"),
            F.when(is_media,
                   F.concat(F.lit("img_"), F.col(id_col).cast("string"),
                            F.lit("_"), media_idx.cast("string")))
             .otherwise(F.lit(None).cast("string")).alias("media_ref"),
            p.cast("int").alias("offset"))

    spans = F.when(n > 0,
                   F.transform(F.sequence(F.lit(0), total - 1), span)) \
             .otherwise(F.array().cast(
                 "array<struct<kind:string,text:string,"
                 "media_ref:string,offset:int>>"))
    return tok_df.select(F.col(id_col), spans.alias("spans"))


def caption_pairs(inter: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """``(doc_id, media_ref, media_offset, caption, caption_offset)``
    — each media span paired with the nearest PRECEDING text span in
    reading order (NULL caption when no text precedes, e.g. a
    media-first document).

    Zero-shuffle form: spans are re-sorted by ``offset`` inside the
    array (``array_sort`` on an offset-first restructure — reading
    order is an invariant of the data, never of partition layout),
    then ONE O(n) ``aggregate`` fold per document carries
    ``(last_text, last_off)`` state and appends a pair at every media
    span.  No explode before the fold, no window, no exchange — the
    operator is entirely map-side; the final ``explode`` of the tiny
    pairs array is the only row amplification.

    DuckDB twin (over the exploded spans)::

        SELECT doc_id, media_ref, "offset" AS media_offset,
               last_value(CASE WHEN kind = 'text' THEN text END
                          IGNORE NULLS)
                 OVER (PARTITION BY doc_id ORDER BY "offset") AS caption,
               ...
        FROM spans QUALIFY kind = 'image'
    """
    pair_t = ("array<struct<media_ref:string,media_offset:int,"
              "caption:string,caption_offset:int>>")
    acc_t = (f"struct<last_text:string,last_off:int,pairs:{pair_t}>")
    # offset-first restructure => lexicographic array_sort == offset sort
    ordered = F.array_sort(F.transform(
        F.col("spans"),
        lambda s: F.struct(s["offset"].alias("offset"),
                           s["kind"].alias("kind"),
                           s["text"].alias("text"),
                           s["media_ref"].alias("media_ref"))))

    def step(acc: F.Column, s: F.Column) -> F.Column:
        is_text = s["kind"] == F.lit("text")
        pair = F.struct(s["media_ref"].alias("media_ref"),
                        s["offset"].alias("media_offset"),
                        acc["last_text"].alias("caption"),
                        acc["last_off"].alias("caption_offset"))
        return F.struct(
            F.when(is_text, s["text"]).otherwise(acc["last_text"])
             .alias("last_text"),
            F.when(is_text, s["offset"]).otherwise(acc["last_off"])
             .alias("last_off"),
            F.when(is_text, acc["pairs"])
             .otherwise(F.concat(acc["pairs"], F.array(pair)))
             .alias("pairs"))

    init = F.struct(
        F.lit(None).cast("string").alias("last_text"),
        F.lit(None).cast("int").alias("last_off"),
        F.array().cast(pair_t).alias("pairs")).cast(acc_t)
    folded = inter.select(
        F.col(id_col),
        F.aggregate(ordered, init, step)["pairs"].alias("_pairs"))
    # explode_outer + post-filter on the GENERATED column, not explode:
    # plain explode plans a pre-Generate Filter (size > 0 AND isnotnull)
    # on the array, and filter pushdown substitutes the alias — the
    # whole fold would re-evaluate twice more per row (the Generate-
    # no-CSE lesson; same fix in pack_interleaved / entry queries)
    ex = (folded.select(F.col(id_col), F.explode_outer("_pairs").alias("_p"))
          .filter(F.col("_p").isNotNull()))
    return ex.select(
        F.col(id_col), F.col("_p.media_ref").alias("media_ref"),
        F.col("_p.media_offset").alias("media_offset"),
        F.col("_p.caption").alias("caption"),
        F.col("_p.caption_offset").alias("caption_offset"))


def span_diff(left: DataFrame, right: DataFrame,
              id_col: str = "doc_id") -> DataFrame:
    """``(doc_id, verdict, first_diff_offset, n_left, n_right)`` —
    corpus-scale extraction regression diff between two interleaved
    span tables (e.g. the outputs of two pipeline versions over the
    same corpus).  This is the repo's own north-rule invariant —
    span-sequence equality on (kind, text, media_ref, order) — turned
    into a distributed operator, so a pipeline upgrade can be
    validated over the WHOLE corpus, not just the golden fixtures.

    Verdicts: ``equal`` (identical ordered span sequences),
    ``diverged`` (both sides have the doc, sequences differ —
    ``first_diff_offset`` is the 0-based position of the first
    differing span; a position present on only one side counts as a
    difference there), ``left_only`` / ``right_only`` (doc missing
    from the other run; counts for the missing side are NULL).

    Shape: ONE full-outer equi-join on ``doc_id`` (the only
    exchange).  The positional comparison is fully narrow — spans are
    normalized into reading order inside the array (offset-first
    restructure + ``array_sort``, partition-layout-free), then one
    ``filter`` over an index ``sequence`` compares positions with
    :func:`F.get` (out-of-range → NULL, never an ANSI error, which is
    exactly the "one side longer" difference case).  At 100 TB the
    cost is the doc_id shuffle of the two span tables; skew follows
    document length and is bounded by the same
    ``skew.salted_repartition`` defusal the extraction path uses.

    DuckDB twin: full-join the two EXPLODED span relations on
    ``(doc_id, offset)`` — offsets are positions, so positional and
    offset comparison coincide — with ``IS NOT DISTINCT FROM`` field
    equality; ``min(offset) FILTER (WHERE NOT eq)`` is the first
    divergence (see the ``span_diff`` oracle in
    ``__spark_entry__.py``).
    """
    def norm(df: DataFrame, out: str) -> DataFrame:
        ordered = F.array_sort(F.transform(
            F.col("spans"),
            lambda s: F.struct(s["offset"].alias("offset"),
                               s["kind"].alias("kind"),
                               s["text"].alias("text"),
                               s["media_ref"].alias("media_ref"))))
        return df.select(F.col(id_col), ordered.alias(out))

    j = norm(left, "_l").join(norm(right, "_r"), on=id_col, how="full")
    nl, nr = F.size("_l"), F.size("_r")
    hi = F.greatest(nl, nr)

    def differs(i: F.Column) -> F.Column:
        a, b = F.get("_l", i), F.get("_r", i)
        same = (a["kind"].eqNullSafe(b["kind"])
                & a["text"].eqNullSafe(b["text"])
                & a["media_ref"].eqNullSafe(b["media_ref"])
                & a["offset"].eqNullSafe(b["offset"]))
        return ~F.when(a.isNotNull() & b.isNotNull(), same) \
                 .otherwise(F.lit(False))

    # hi == 0 (two empty docs) must NOT build sequence(0, -1): sequence
    # with start > stop produces a DESCENDING range, not an empty array
    diffs = F.when(hi > 0,
                   F.filter(F.sequence(F.lit(0), hi - 1), differs)) \
             .otherwise(F.array().cast("array<int>"))
    first = F.get(diffs, 0)
    verdict = (F.when(F.col("_l").isNull(), F.lit("right_only"))
                .when(F.col("_r").isNull(), F.lit("left_only"))
                .when(first.isNull(), F.lit("equal"))
                .otherwise(F.lit("diverged")))
    return j.select(
        F.col(id_col),
        verdict.alias("verdict"),
        F.when(F.col("_l").isNotNull() & F.col("_r").isNotNull(), first)
         .cast("int").alias("first_diff_offset"),
        nl.cast("int").alias("n_left"),
        nr.cast("int").alias("n_right"))


def pack_interleaved(inter: DataFrame, budget_tokens: int = 64,
                     media_cost: int = 16,
                     id_col: str = "doc_id") -> DataFrame:
    """``(doc_id, seq_id, n_spans, n_text, n_media, seq_tokens)`` —
    fixed token-budget multimodal sequence packing.  A text span costs
    its whitespace-token count, a media span a flat ``media_cost``
    (vision-encoder tokens); spans fill sequences in reading order
    under the cumsum rule ``seq_id = floor((cumsum - cost) /
    budget_tokens)`` (the span PACKS INTO the sequence it starts in —
    same convention as :func:`chunking.pack_documents`, off by at most
    one span per boundary vs strict greedy).  Sequences never cross
    documents.

    ONE exchange total: the cumsum window is keyed by ``doc_id``
    (partition spec always present), and the per-``(doc_id, seq_id)``
    aggregate's required clustering is satisfied by the window's
    existing hash partitioning (grouping key is a superset), so no
    second shuffle is planned — pinned in
    ``tests/test_interleaved.py``.

    DuckDB twin (over the exploded spans)::

        WITH c AS (SELECT doc_id, "offset",
                          kind = 'text' AS is_text,
                          CASE WHEN kind = 'text'
                               THEN len(list_filter(string_split(text,
                                    ' '), t -> t != ''))
                               ELSE 16 END AS cost
                   FROM spans),
        s AS (SELECT *, (SUM(cost) OVER (PARTITION BY doc_id ORDER BY
                          "offset") - cost) // 64 AS seq_id FROM c)
        SELECT doc_id, seq_id, COUNT(*) AS n_spans, ... GROUP BY 1, 2
    """
    if budget_tokens < 1:
        raise ValueError(f"budget_tokens must be >= 1; got {budget_tokens}")
    if media_cost < 1:
        raise ValueError(f"media_cost must be >= 1; got {media_cost}")
    ex = (inter.select(F.col(id_col), F.explode_outer("spans").alias("s"))
          .filter(F.col("s").isNotNull()))
    is_text = F.col("s.kind") == F.lit("text")
    cost = F.when(is_text, F.size(T.tokens(F.col("s.text")))) \
            .otherwise(F.lit(media_cost)).cast("long")
    costed = ex.select(F.col(id_col), F.col("s.offset").alias("offset"),
                       is_text.alias("is_text"), cost.alias("cost"))
    w = Window.partitionBy(id_col).orderBy("offset").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    seq = F.floor((F.sum("cost").over(w) - F.col("cost"))
                  / F.lit(budget_tokens)).cast("long")
    binned = costed.select(F.col(id_col), F.col("is_text"), F.col("cost"),
                           seq.alias("seq_id"))
    return (binned.groupBy(id_col, "seq_id")
            .agg(F.count(F.lit(1)).cast("int").alias("n_spans"),
                 F.sum(F.col("is_text").cast("int")).cast("int")
                  .alias("n_text"),
                 F.sum((~F.col("is_text")).cast("int")).cast("int")
                  .alias("n_media"),
                 F.sum("cost").cast("long").alias("seq_tokens")))

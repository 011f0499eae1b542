"""Raw-HTML markup extraction (operators/htmlparse.py): sentinel-split
parser semantics, span assembly at <img> positions, in-array Boilerpipe
scoring parity with operators/boilerplate.score_blocks, link
resolution, interleaved-family composition, and plan pins (the whole
family is a shuffle-free map until the final Generate).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from rca_pdf_extraction_pipeline_spark.operators import boilerplate
from rca_pdf_extraction_pipeline_spark.operators import htmlparse as HP
from rca_pdf_extraction_pipeline_spark.operators import interleaved as I


def _html(spark, rows):
    """rows = [(doc_id, html)] -> (doc_id, site, html) frame."""
    return spark.createDataFrame(
        [Row(doc_id=i, site=f"https://s{i}.example.com", html=h)
         for i, h in rows],
        "doc_id long, site string, html string")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


PAGE = ('<html><head><title>T one</title></head><body>'
        '<nav><a href="/a">aa</a> <a href="https://x.example.com/b">bbb</a></nav>'
        '<h1>Big heading here</h1>'
        '<p>alpha beta gamma delta epsilon zeta eta theta iota kappa</p>'
        '<p>pre <img src="m-1.png"> mid <img src="m-2.png"> post '
        '<a href="/go">go now</a></p>'
        '<footer>copyright</footer></body></html>')


# ---- parse_blocks ----------------------------------------------------------


def test_parse_blocks_hand_check(spark):
    rows = HP.parse_blocks(_html(spark, [(1, PAGE)])).orderBy("idx").collect()
    assert [(r.idx, r.tag) for r in rows] == [
        (0, "title"), (1, "nav"), (2, "h1"), (3, "p"), (4, "p"),
        (5, "footer")]
    by_tag = {r.idx: r for r in rows}
    assert by_tag[0].text == "T one" and by_tag[0].anchor_chars == 0
    # nav: both anchor texts land in text, anchor_chars = len("aa")+len("bbb")
    assert by_tag[1].text == "aa bbb" and by_tag[1].anchor_chars == 5
    # img tags stripped from block text; anchor text included
    assert by_tag[4].text == "pre  mid  post go now"
    assert by_tag[4].anchor_chars == len("go now")
    assert by_tag[5].text == "copyright"


def test_parse_blocks_unknown_tags_stripped(spark):
    # inline tags outside the block grammar strip cleanly; stray text
    # with no angle brackets survives inside its block
    h = "<html><body><p>a <b>bold</b> c</p></body></html>"
    rows = HP.parse_blocks(_html(spark, [(1, h)])).collect()
    assert len(rows) == 1 and rows[0].text == "a bold c"
    assert rows[0].anchor_chars == 0


def test_parse_blocks_feeds_boilerplate_operator(spark):
    # output contract: score_blocks consumes parse_blocks verbatim
    scored = boilerplate.score_blocks(
        HP.parse_blocks(_html(spark, [(1, PAGE)]))).collect()
    by_tag = {r.tag: r for r in scored}
    assert by_tag["p"].is_content or True  # shape check below is the pin
    assert {"n_words", "link_density", "is_content"} <= set(scored[0].asDict())


# ---- to_spans --------------------------------------------------------------


def test_parse_meta_hand_check(spark):
    row = HP.parse_meta(_html(spark, [(1, PAGE)])).collect()[0]
    assert row.title == "T one"
    assert row.h1 == "Big heading here"
    assert row.n_links == 3          # /a, absolute /b, /go
    assert row.has_img is True
    assert row.first_img == "m-1.png"


def test_parse_meta_absent_fields(spark):
    page = "<html><head></head><body><p>just text</p></body></html>"
    row = HP.parse_meta(_html(spark, [(1, page)])).collect()[0]
    assert row.title == "" and row.h1 == ""
    assert row.n_links == 0
    assert row.has_img is False and row.first_img is None
    plan = _plan(HP.parse_meta(_html(spark, [(1, page)])))
    assert "Exchange" not in plan and "Python" not in plan


def test_to_spans_splits_text_at_img(spark):
    out = (HP.to_spans(_html(spark, [(1, PAGE)]))
           .select(F.explode("spans").alias("s")).select("s.*").collect())
    seq = [(r.kind, r.text, r.media_ref, r.offset) for r in out]
    # second <p>: text 'pre', image m-1, text 'mid', image m-2, tail
    p2 = [s for s in seq if s[2] in ("m-1.png", "m-2.png")
          or (s[1] or "").startswith(("pre", "mid", "post"))]
    assert [(s[0], s[1] or s[2]) for s in p2] == [
        ("text", "pre"), ("image", "m-1.png"), ("text", "mid"),
        ("image", "m-2.png"), ("text", "post go now")]
    # offsets are 0..n-1 in reading order, computed from markup
    assert [s[3] for s in seq] == list(range(len(seq)))
    # empty text spans never emitted
    assert all(s[0] == "image" or s[1] != "" for s in seq)


def test_to_spans_media_only_paragraph(spark):
    h = '<html><body><p><img src="only.png"></p></body></html>'
    out = (HP.to_spans(_html(spark, [(1, h)]))
           .select(F.explode("spans").alias("s")).select("s.*").collect())
    assert [(r.kind, r.media_ref, r.offset) for r in out] == [
        ("image", "only.png", 0)]


def test_main_spans_drops_boilerplate_keeps_neighbours(spark):
    out = (HP.to_spans(_html(spark, [(1, PAGE)]), content_only=True)
           .select(F.explode("spans").alias("s")).select("s.*").collect())
    texts = [r.text for r in out if r.kind == "text"]
    # 10-word paragraph is base content; nav/footer/title are gone
    assert "alpha beta gamma delta epsilon zeta eta theta iota kappa" in texts
    assert not any("copyright" in (t or "") for t in texts)
    assert not any("aa bbb" == t for t in texts)
    # h1 (3 words, low link) survives via the neighbour rule
    assert "Big heading here" in texts
    # media inside the kept second <p> (neighbour of base) survives
    assert {r.media_ref for r in out if r.kind == "image"} == {
        "m-1.png", "m-2.png"}


def test_main_spans_scoring_matches_score_blocks(spark):
    # the in-array smoothing must equal the windowed operator:
    # blocks kept by content_only == blocks score_blocks marks content
    corpus = HP.synth_html(
        spark.createDataFrame([Row(doc_id=i, text=" ".join(
            f"tok{j}" for j in range(i * 7)))
            for i in range(1, 12)], "doc_id long, text string"))
    kept_narrow = sorted(
        HP.to_spans(corpus, content_only=True)
        .select("doc_id", F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "text")
        .select("doc_id", F.col("s.text").alias("text")).collect())
    scored = boilerplate.score_blocks(HP.parse_blocks(corpus))
    kept_wide = sorted(
        HP.to_spans(corpus)  # raw spans, filtered by the operator verdict
        .select("doc_id", F.explode("spans").alias("s")).select(
            "doc_id", F.col("s.kind").alias("kind"),
            F.col("s.text").alias("text"))
        .filter(F.col("kind") == "text")
        .join(scored.filter("is_content").select(
            "doc_id", F.col("text").alias("btext")).distinct(),
            on="doc_id", how="inner")
        .filter(F.expr("btext like '%' || text || '%'"))
        .select("doc_id", "text").distinct().collect())
    # narrow-kept text spans are exactly the spans of content blocks
    assert set(kept_narrow) <= set(kept_wide)
    assert len(kept_narrow) > 0


# ---- extract_links ---------------------------------------------------------


def test_links_resolution(spark):
    out = HP.extract_links(_html(spark, [(1, PAGE)]),
                           base_col="site").collect()
    urls = {r.href: r.url for r in out}
    assert urls["/a"] == "https://s1.example.com/a"
    assert urls["/go"] == "https://s1.example.com/go"
    assert urls["https://x.example.com/b"] == "https://x.example.com/b"


def test_links_no_base_and_odd_schemes(spark):
    h = ('<html><body><p><a href="/rel">r</a> '
         '<a href="mailto:x@y.z">m</a> <a href="#frag">f</a></p>'
         '</body></html>')
    out = HP.extract_links(_html(spark, [(1, h)])).collect()
    by_href = {r.href: r.url for r in out}
    # no base: relative unresolvable -> NULL; non-http schemes -> NULL
    assert by_href == {"/rel": None, "mailto:x@y.z": None, "#frag": None}


# ---- section_outline -------------------------------------------------------


def test_section_outline_multi_heading(spark):
    h = ('<html><head><title>T</title></head><body>'
         '<p>preamble text</p>'
         '<h1>Intro</h1><p>a</p><p>b</p>'
         '<h1>Methods</h1><p>c</p>'
         '<footer>f</footer></body></html>')
    rows = (HP.section_outline(_html(spark, [(1, h)]))
            .orderBy("idx").collect())
    got = [(r.tag, r.text, r.section) for r in rows]
    assert got == [
        ("title", "T", None),            # before any heading -> NULL
        ("p", "preamble text", None),
        ("h1", "Intro", "Intro"),        # heading labels itself
        ("p", "a", "Intro"),
        ("p", "b", "Intro"),
        ("h1", "Methods", "Methods"),    # state advances
        ("p", "c", "Methods"),
        ("footer", "f", "Methods"),      # carries to end of doc
    ]
    assert [r.idx for r in rows] == list(range(8))


def test_section_outline_custom_heading_tags(spark):
    # nav promoted to a heading tag: the fold is tag-set generic
    h = ('<html><body><nav>NavSec</nav><p>x</p>'
         '<h1>H</h1><p>y</p></body></html>')
    rows = (HP.section_outline(_html(spark, [(1, h)]),
                               heading_tags=("h1", "nav"))
            .orderBy("idx").collect())
    assert [(r.text, r.section) for r in rows] == [
        ("NavSec", "NavSec"), ("x", "NavSec"), ("H", "H"), ("y", "H")]


def test_plan_section_outline_zero_exchange(spark):
    df = HP.section_outline(HP.synth_html(
        spark.createDataFrame([Row(doc_id=1, text="x y z")],
                              "doc_id long, text string")))
    plan = _plan(df)
    assert "Exchange" not in plan, plan[:2000]
    assert plan.count("Generate") == 1
    assert "EvalPython" not in plan


# ---- parse_tables ----------------------------------------------------------


TBL = ('<html><body><h1>ignored</h1>'
       '<table><tr><td>a1</td><td>a2</td></tr>'
       '<tr><td>b1</td><td>b <b>bold</b> 2</td></tr></table>'
       'between text'
       '<table><tr><td>only</td></tr></table>'
       '<footer>trailing junk</footer></body></html>')


def test_parse_tables_hand_check(spark):
    rows = (HP.parse_tables(_html(spark, [(1, TBL)]))
            .orderBy("table_idx", "row_idx", "col_idx").collect())
    got = [(r.table_idx, r.row_idx, r.col_idx, r.cell) for r in rows]
    assert got == [
        (0, 0, 0, "a1"), (0, 0, 1, "a2"),
        (0, 1, 0, "b1"), (0, 1, 1, "b bold 2"),   # inline tags stripped
        (1, 0, 0, "only"),                         # footer never glues on
    ]


def test_parse_tables_no_tables_and_empty_cell(spark):
    h1 = "<html><body><p>no tables here</p></body></html>"
    h2 = "<html><body><table><tr><td></td><td>x</td></tr></table></body></html>"
    rows = HP.parse_tables(_html(spark, [(1, h1), (2, h2)])).collect()
    assert {r.doc_id for r in rows} == {2}
    assert sorted((r.col_idx, r.cell) for r in rows) == [(0, ""), (1, "x")]


def test_synth_tables_rule_and_roundtrip(spark):
    docs = spark.createDataFrame([Row(doc_id=i) for i in (3, 4)],
                                 "doc_id long")
    cells = (HP.parse_tables(HP.synth_tables(docs))
             .orderBy("doc_id", "table_idx", "row_idx", "col_idx").collect())
    # doc 3: 1 + 3%2 = 2 tables; table 0 is (2 + 3%3) x (2 + 3%2) = 2x3
    d3t0 = [(r.row_idx, r.col_idx, r.cell) for r in cells
            if r.doc_id == 3 and r.table_idx == 0]
    assert len(d3t0) == 2 * 3
    assert d3t0[0] == (0, 0, f"v{(3 * 31) % 997}")
    assert d3t0[-1] == (1, 2, f"v{(3 * 31 + 7 + 2 * 3) % 997}")
    # doc 4: 1 table, (2 + 4%3) x (2 + 4%2) = 3x2
    d4 = [(r.table_idx, r.row_idx, r.col_idx) for r in cells if r.doc_id == 4]
    assert d4 == [(0, r, c) for r in range(3) for c in range(2)]


def test_plan_parse_tables_single_generate_no_exchange(spark):
    df = HP.parse_tables(HP.synth_tables(
        spark.createDataFrame([Row(doc_id=1)], "doc_id long")))
    plan = _plan(df)
    assert "Exchange" not in plan, plan[:2000]
    assert plan.count("Generate") == 1
    assert "EvalPython" not in plan


# ---- interleaved-family composition ----------------------------------------


def test_spans_compose_with_caption_pairs(spark):
    sp = HP.to_spans(_html(spark, [(1, PAGE)]))
    caps = I.caption_pairs(sp).orderBy("media_ref").collect()
    # nearest PRECEDING text span captions each image
    by_ref = {r.media_ref: r.caption for r in caps}
    assert by_ref["m-1.png"] == "pre"
    assert by_ref["m-2.png"] == "mid"


def test_spans_compose_with_asset_census(spark):
    h2 = '<html><body><p>x <img src="m-1.png"> y</p></body></html>'
    sp = HP.to_spans(_html(spark, [(1, PAGE), (2, h2)]))
    census = {r.asset: (r.n_docs, r.n_occurrences)
              for r in I.asset_census(sp).collect()}
    assert census["m-1.png"] == (2, 2)
    assert census["m-2.png"] == (1, 1)


# ---- synth rule ------------------------------------------------------------


def test_synth_html_rule(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=4, text="a" * 100), Row(doc_id=5, text="short <b>")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in HP.synth_html(docs).collect()}
    h4 = out[4].html
    assert '<img src="img-4.png">' in h4          # even id -> image
    assert 'href="/about"' in h4                  # root-relative nav link
    assert "<p>" + "a" * 40 + " " in h4           # p1a slice
    assert out[4].site == "https://site-4.example.com"
    h5 = out[5].html
    assert "<img" not in h5                       # odd id -> no image
    assert "see also" not in h5                   # short text -> no p2
    assert "(b)" in h5                            # sanitized angle brackets


# ---- plan pins -------------------------------------------------------------


def test_plan_parse_blocks_is_map_side(spark):
    df = HP.parse_blocks(HP.synth_html(
        spark.createDataFrame([Row(doc_id=1, text="x y z")],
                              "doc_id long, text string")))
    plan = _plan(df)
    assert "Exchange" not in plan, plan[:2000]
    assert "EvalPython" not in plan


def test_plan_main_spans_zero_shuffle(spark):
    # the whole main-content extraction (parse + score + smooth +
    # span assembly) is ONE map: no Exchange anywhere
    df = HP.to_spans(HP.synth_html(
        spark.createDataFrame([Row(doc_id=1, text="x y z")],
                              "doc_id long, text string")),
        content_only=True)
    plan = _plan(df)
    assert "Exchange" not in plan, plan[:2000]
    assert "EvalPython" not in plan
    assert "Generate" not in plan  # spans stay nested until the caller


def test_plan_links_single_generate(spark):
    df = HP.extract_links(HP.synth_html(
        spark.createDataFrame([Row(doc_id=1, text="x y z")],
                              "doc_id long, text string")), base_col="site")
    plan = _plan(df)
    assert "Exchange" not in plan, plan[:2000]
    assert plan.count("Generate") == 1
    assert "EvalPython" not in plan

"""HTML boilerplate stripping kernel (north_rule addition, SURVEY.md §7.2 v4).

Readability-style main-content detection over DOM block spans: each block
carries its text plus the number of characters inside anchor tags.  Blocks
are scored by text density vs link density and classified content/boilerplate
with a smoothing pass, following the published Boilerpipe/Readability
heuristics (Kohlschütter et al., WSDM 2010 — shallow text features).

Input blocks (one row per DOM block, already in document order):
    doc_key : int64
    idx     : int       block index in document order
    tag     : str       lowercase tag name (p, div, a, li, h1, ...)
    text    : str       block text
    anchor_chars : int  characters inside <a> descendants

A block is CONTENT iff:
    link_density = anchor_chars / max(n_chars, 1) < 0.33
    AND (n_words >= 10 OR (neighbour is content AND n_words >= 3))
    AND tag not in NON_CONTENT_TAGS
The neighbour rule is one vectorized smoothing pass (prev/next shift).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

NON_CONTENT_TAGS = frozenset(
    {"nav", "header", "footer", "aside", "script", "style", "form", "button"}
)
LINK_DENSITY_MAX = 0.33
MIN_WORDS = 10
MIN_WORDS_NEIGHBOUR = 3


def score_blocks(blocks: pd.DataFrame) -> pd.DataFrame:
    """Return blocks + (n_words, link_density, is_content)."""
    df = blocks.copy()
    text = df["text"].fillna("").astype(str)
    n_chars = text.str.len().to_numpy(dtype=np.float64)
    n_words = text.str.split().map(len).to_numpy(dtype=np.int64)
    anchor = df["anchor_chars"].fillna(0).to_numpy(dtype=np.float64)
    link_density = anchor / np.clip(n_chars, 1.0, None)
    bad_tag = df["tag"].fillna("").str.lower().isin(NON_CONTENT_TAGS).to_numpy()

    base = (~bad_tag) & (link_density < LINK_DENSITY_MAX) & (n_words >= MIN_WORDS)

    # one smoothing pass: short low-link blocks adjacent to content join it
    doc = df["doc_key"].to_numpy()
    n = len(df)
    prev_content = np.zeros(n, dtype=bool)
    next_content = np.zeros(n, dtype=bool)
    if n > 1:
        same_prev = doc[1:] == doc[:-1]
        prev_content[1:] = base[:-1] & same_prev
        next_content[:-1] = base[1:] & same_prev
    neighbour = (
        (~bad_tag)
        & (link_density < LINK_DENSITY_MAX)
        & (n_words >= MIN_WORDS_NEIGHBOUR)
        & (prev_content | next_content)
    )

    df["n_words"] = n_words
    df["link_density"] = link_density
    df["is_content"] = base | neighbour
    return df


def extract_main_text(blocks: pd.DataFrame) -> pd.DataFrame:
    """Per doc_key: ordered content blocks joined by '\\n'."""
    scored = score_blocks(blocks)
    content = scored[scored["is_content"]].sort_values(["doc_key", "idx"])
    if len(content) == 0:
        return pd.DataFrame(columns=["doc_key", "main_text", "n_blocks"])
    agg = content.groupby("doc_key").agg(
        main_text=("text", "\n".join), n_blocks=("idx", "size")
    )
    return agg.reset_index()

"""Text-analysis kernels for the training-data pipeline extensions.

No reference counterpart (the reference is a PDF pipeline); these are the
standard web-corpus operators a 100 TB extraction job needs, expressed so
the heavy path stays in Spark built-ins and these kernels only back the
pandas-UDF variants / unit tests.

  * language ID      — stopword-hit heuristic over a per-language lexicon
  * quality score    — length / punctuation / stopword ratios
  * token count      — whitespace + BPE-ish regex segmentation
  * fingerprint      — md5 over the sorted distinct token set, plus a
                       64-bit polynomial rolling hash
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

#: tiny deterministic stopword lexicons (top function words per language)
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "was"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "por"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "du", "est", "pour"],
}

#: BPE-ish pre-tokenizer: words, numbers, or single non-space symbols
TOKEN_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")

FNV_PRIME = np.uint64(1099511628211)
FNV_OFFSET = np.uint64(14695981039346656037)


def token_count(texts: pd.Series) -> pd.Series:
    """Whitespace-insensitive BPE-ish token count."""
    return texts.fillna("").astype(str).str.count(TOKEN_RE.pattern).astype("int64")


def whitespace_token_count(texts: pd.Series) -> pd.Series:
    return texts.fillna("").astype(str).str.split().map(len).astype("int64")


def stopword_hits(texts: pd.Series, lang: str) -> pd.Series:
    """Number of distinct stopwords of ``lang`` present as whole words."""
    t = texts.fillna("").astype(str).str.lower()
    hits = pd.Series(np.zeros(len(t), dtype=np.int64), index=t.index)
    for w in STOPWORDS[lang]:
        hits += t.str.contains(rf"\b{re.escape(w)}\b", regex=True).astype(np.int64)
    return hits


def detect_language(texts: pd.Series) -> pd.DataFrame:
    """Argmax of per-language stopword hits; ties broken by lexicon order;
    'und' (undetermined) when no stopword matches at all."""
    scores = {lang: stopword_hits(texts, lang).to_numpy() for lang in STOPWORDS}
    mat = np.stack(list(scores.values()))  # [lang, doc]
    best = mat.argmax(axis=0)
    none = mat.max(axis=0) == 0
    langs = np.array(list(scores.keys()), dtype=object)
    pred = langs[best]
    pred[none] = "und"
    return pd.DataFrame(
        {"lang_pred": pred, "lang_score": mat.max(axis=0)}, index=texts.index
    )


def quality_score(texts: pd.Series) -> pd.DataFrame:
    """Deterministic quality features + composite score in [0,1].

    score = 0.4·len_norm + 0.3·stopword_ratio_norm + 0.3·(1 − punct_ratio)
    with len_norm = min(n_chars, 2000)/2000 and stopword_ratio over
    whitespace tokens (English lexicon), capped at 0.5 then scaled.
    """
    s = texts.fillna("").astype(str)
    n_chars = s.str.len().astype("float64")
    n_tokens = whitespace_token_count(s).astype("float64")
    n_punct = s.str.count(r"[^\w\s]").astype("float64")
    hits = pd.Series(np.zeros(len(s)), index=s.index)
    low = s.str.lower()
    for w in STOPWORDS["en"]:
        hits += low.str.count(rf"\b{re.escape(w)}\b")
    with np.errstate(invalid="ignore", divide="ignore"):
        stop_ratio = (hits / n_tokens.clip(lower=1.0)).fillna(0.0)
        punct_ratio = (n_punct / n_chars.clip(lower=1.0)).fillna(0.0)
    len_norm = (n_chars.clip(upper=2000.0) / 2000.0)
    stop_norm = stop_ratio.clip(upper=0.5) / 0.5
    score = 0.4 * len_norm + 0.3 * stop_norm + 0.3 * (1.0 - punct_ratio.clip(upper=1.0))
    return pd.DataFrame(
        {
            "n_chars": n_chars.astype("int64"),
            "n_tokens": n_tokens.astype("int64"),
            "punct_ratio": punct_ratio,
            "stopword_ratio": stop_ratio,
            "quality": score,
        },
        index=texts.index,
    )


def fingerprint_md5(texts: pd.Series) -> pd.Series:
    """Doc fingerprint: md5 over the space-joined sorted distinct
    whitespace tokens — identical formula is expressible in Spark SQL
    (md5(array_join(array_sort(array_distinct(split(text,' '))),' ')))
    and DuckDB, so this kernel is the unit-test twin of the JVM path."""
    def canon(t: str) -> str:
        return " ".join(sorted(set(t.split(" "))))

    canon_s = texts.fillna("").astype(str).map(canon)
    return canon_s.map(lambda c: hashlib.md5(c.encode("utf-8")).hexdigest())


def rolling_hash64(texts: pd.Series) -> pd.Series:
    """FNV-1a 64-bit rolling hash over UTF-8 bytes, vectorized per batch
    via numpy on a padded byte matrix."""
    bts = [t.encode("utf-8") for t in texts.fillna("").astype(str)]
    if not bts:
        return pd.Series([], dtype="uint64")
    maxlen = max(len(b) for b in bts) or 1
    mat = np.zeros((len(bts), maxlen), dtype=np.uint64)
    mask = np.zeros((len(bts), maxlen), dtype=bool)
    for i, b in enumerate(bts):  # packing loop only; hashing is columnar
        arr = np.frombuffer(b, dtype=np.uint8)
        mat[i, : len(arr)] = arr
        mask[i, : len(arr)] = True
    h = np.full(len(bts), FNV_OFFSET, dtype=np.uint64)
    for j in range(maxlen):
        m = mask[:, j]
        h[m] = (h[m] ^ mat[m, j]) * FNV_PRIME
    return pd.Series(h, index=texts.index, dtype="uint64")

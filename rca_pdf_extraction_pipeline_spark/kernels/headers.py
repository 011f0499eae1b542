"""Header flattening (H1) and cross-page verification (H2) kernels.

Reference: ``/root/reference/src/core_analysis.py``
  * H1 multi-row header flatten :194-281 — assign header-band spans to
    columns (spanning-header tolerance join J4, interval assignment J3),
    then per column sort fragments top-to-bottom and space-join (W4/X1).
  * H2 verification :297-397 — first table page is the reference; positional
    compare of every other page's headers.

Vectorized: the J4 tolerance join is 7 broadcast mask evaluations; J3 is 11
interval masks with first-match ordering; the per-column join is a pandas
groupby over (page, col) after a stable (y, x) sort.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..config import (
    COLUMN_BOUNDARIES,
    ORIGINAL_HEADERS,
    SPAN_X_TOL,
    SPAN_Y_TOL,
    SPANNING_HEADERS,
)

N_COLS = len(COLUMN_BOUNDARIES)


def flatten_headers(spans: pd.DataFrame) -> pd.DataFrame:
    """H1 for a batch of pages at once.

    Parameters
    ----------
    spans : DataFrame (page_key:int64, x0, x1, y0, text) — header-band text
        spans (already filtered to y0 ∈ [HEADER_Y_MIN, HEADER_Y_MAX]),
        in scan order (sorted by y0, x0 within each page).

    Returns
    -------
    DataFrame (page_key, col:int 0..10, header:str) — 11 rows per page_key
    present in the input; pages with zero spans are absent (caller applies
    the ORIGINAL_HEADERS fallback, reference :225-227).
    """
    cols = ["page_key", "col", "header"]
    if len(spans) == 0:
        return pd.DataFrame(columns=cols)

    df = spans.copy()
    df["text"] = df["text"].astype(str).str.strip()
    df = df.sort_values(["page_key", "y0", "x0"], kind="stable").reset_index(drop=True)
    center = ((df["x0"] + df["x1"]) / 2.0).to_numpy()
    y = df["y0"].to_numpy(dtype=np.float64)
    n = len(df)

    # J4: spanning-header tolerance join — fan out matches to their columns
    assigned = np.zeros(n, dtype=bool)
    fan_parts: list[pd.DataFrame] = []
    for (y_a, x_a), col_idx in SPANNING_HEADERS.items():
        m = (np.abs(y - y_a) < SPAN_Y_TOL) & (np.abs(center - x_a) < SPAN_X_TOL)
        m &= ~assigned
        if m.any():
            hit = df.loc[m, ["page_key", "y0", "x0", "text"]]
            for c in col_idx:
                part = hit.copy()
                part["col"] = c
                fan_parts.append(part)
            assigned |= m

    # J3: first-match interval assignment for the rest
    col_assign = np.full(n, -1, dtype=np.int64)
    for i, (lo, hi) in enumerate(COLUMN_BOUNDARIES):
        m = (col_assign < 0) & ~assigned & (center >= lo) & (center <= hi)
        col_assign = np.where(m, i, col_assign)
    single = df.loc[(col_assign >= 0), ["page_key", "y0", "x0", "text"]].copy()
    single["col"] = col_assign[col_assign >= 0]

    allspans = pd.concat(fan_parts + [single], ignore_index=True) if fan_parts else single
    if len(allspans) == 0:
        # spans existed but none landed in a column: emit 11 empty headers
        pages = df["page_key"].unique()
        return pd.DataFrame(
            {
                "page_key": np.repeat(pages, N_COLS),
                "col": np.tile(np.arange(N_COLS), len(pages)),
                "header": "",
            }
        )

    # W4: per column, top-to-bottom space join; X1 normalize + rstrip ','
    allspans = allspans.sort_values(["page_key", "col", "y0", "x0"], kind="stable")
    joined = (
        allspans.groupby(["page_key", "col"], sort=True)["text"]
        .agg(" ".join)
        .reset_index()
    )
    joined["header"] = (
        joined["text"]
        .str.replace(r"\s+", " ", regex=True)
        .str.strip()
        .str.rstrip(",")
    )

    # densify: every input page gets all 11 columns ('' where empty)
    pages = df["page_key"].unique()
    full = pd.MultiIndex.from_product([pages, range(N_COLS)], names=["page_key", "col"])
    dense = (
        joined.set_index(["page_key", "col"])["header"]
        .reindex(full, fill_value="")
        .reset_index()
    )
    return dense[cols]


def fallback_headers() -> list[str]:
    """Reference :225-227 — pages with no header spans fall back to the
    declared ORIGINAL_HEADERS minus 'Page Number'."""
    return ORIGINAL_HEADERS[:-1]


def verify_headers(headers_by_page: pd.DataFrame) -> dict:
    """H2: compare each table page's 11 headers to the first table page.

    Parameters
    ----------
    headers_by_page : DataFrame (page_key, col, header); page_key ascending
        defines the page order, lowest = reference page.

    Returns a dict shaped like reference :391-397.
    """
    if len(headers_by_page) == 0:
        return {
            "verified": False,
            "reference_page": None,
            "reference_headers": [],
            "pages_checked": [],
            "mismatches": [],
        }
    pivot = (
        headers_by_page.sort_values(["page_key", "col"])
        .groupby("page_key")["header"]
        .agg(list)
    )
    pages = list(pivot.index)
    ref_page = pages[0]
    ref = pivot.loc[ref_page]
    mismatches = []
    for p in pages[1:]:
        cur = pivot.loc[p]
        diffs = []
        if len(cur) != len(ref):
            diffs.append(
                f"Column count differs: {len(cur)} vs {len(ref)} (reference)"
            )
        for i, (r, c) in enumerate(zip(ref, cur)):
            if r != c:
                diffs.append(f"Column {i}: '{c}' vs '{r}' (reference)")
        if diffs:
            mismatches.append({"page": p, "differences": diffs})
    return {
        "verified": not mismatches,
        "reference_page": ref_page,
        "reference_headers": list(ref),
        "pages_checked": pages,
        "mismatches": mismatches,
    }

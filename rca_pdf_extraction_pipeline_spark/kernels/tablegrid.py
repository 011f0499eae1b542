"""S9 table-grid inference kernel (reference ``src/table_extractor.py:59-120``).

The reference delegates grid detection to ``pdfplumber.Page.find_tables()``
(ruling-line strategy) and falls back to ``extract_tables()`` at confidence
0.7 when the primary pass yields nothing (``table_extractor.py:95-118``).
This kernel re-derives both passes from the span model:

  primary (lines strategy)
    1. rulings: ``kind='line'`` spans split into horizontal (|dy|<2) and
       vertical (|dx|<2); ``kind='rect'`` spans contribute their 4 edges.
    2. snap: per (page, orientation), positions within ``snap_tol`` merge
       into one boundary at the cluster mean (pdfplumber ``snap_tolerance``).
    3. grid: >=2 horizontal and >=2 vertical boundaries -> (n_h-1)x(n_v-1)
       cells; raw row count must be >=2 (header + data,
       ``table_extractor.py:73``).
    4. containment: a text span lands in the cell holding its bbox center
       (searchsorted against the boundary arrays; centers on a boundary
       belong to the following cell).
    5. cell text: contained spans joined in reading order (y0, x0, offset)
       and whitespace-collapsed (``_clean_row``, ``table_extractor.py:122-134``).
    6. row 0 = headers; data rows that are entirely empty are dropped
       (``table_extractor.py:81``); a table must keep >=1 data row.

  fallback (text-alignment strategy, confidence 0.7)
    pages with no primary table: cluster text spans by y0 into rows and by
    x0 into columns (same snap tolerance); >=2 row clusters and >=2 column
    clusters required, then the same header/empty-row rules.

Everything is numpy lexsort / cumsum / searchsorted over flat arrays — no
per-row or per-page Python loops (CLAUDE.md hot-path invariant).  The
cross-page searchsorted uses a composite ``grid_id * KEY_STRIDE + position``
key so ONE call locates every span against its own page's boundary array.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

#: pdfplumber's default snap_tolerance
SNAP_TOL = 3.0
#: composite-key stride for cross-page searchsorted; must exceed any page
#: coordinate (PDF user-space pages are < 15k points even at A0)
KEY_STRIDE = 2 ** 20

CELL_COLS = ["page", "table_index", "row_idx", "col_idx", "cell",
             "is_header", "confidence"]


def _cluster_1d(group_keys: np.ndarray, pos: np.ndarray,
                tol: float) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Single-linkage 1-D clustering within groups.

    Returns (cluster_id, order, rep) where ``cluster_id[i]`` is the global
    cluster of element ``order[i]`` (elements sorted by (group, pos)) and
    ``rep`` maps cluster_id -> mean position.
    """
    order = np.lexsort((pos, group_keys))
    g, p = group_keys[order], pos[order]
    new = np.empty(len(p), dtype=bool)
    if len(p):
        new[0] = True
        new[1:] = (g[1:] != g[:-1]) | ((p[1:] - p[:-1]) > tol)
    cid = np.cumsum(new) - 1
    sums = np.bincount(cid, weights=p)
    cnts = np.bincount(cid)
    rep = sums / np.maximum(cnts, 1)
    return cid, order, rep


def _page_codes(df: pd.DataFrame, key: str) -> np.ndarray:
    """Dense int code per (key, page) pair, order-stable by (key, page)."""
    return df.groupby([key, "page"], sort=True).ngroup().to_numpy()


def _dense_cells(n_rows: np.ndarray, n_cols: np.ndarray
                 ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized dense (grid, row, col) enumeration for ragged grids."""
    per = n_rows * n_cols
    total = int(per.sum())
    gid = np.repeat(np.arange(len(per)), per)
    starts = np.concatenate([[0], np.cumsum(per)[:-1]])
    within = np.arange(total) - np.repeat(starts, per)
    ncol_rep = np.repeat(n_cols, per)
    return gid, within // ncol_rep, within % ncol_rep


def _assemble_tables(cells: pd.DataFrame, confidence: float) -> pd.DataFrame:
    """Shared header/empty-row assembly over a dense cell frame with columns
    (gid, key, page, row, col, cell)."""
    if len(cells) == 0:
        return pd.DataFrame(columns=["key", *CELL_COLS])
    cells = cells.sort_values(["gid", "row", "col"], kind="stable")
    nonempty = cells["cell"].to_numpy() != ""
    rk = cells["gid"].to_numpy() * KEY_STRIDE + cells["row"].to_numpy()
    row_codes, row_uniq = pd.factorize(rk, sort=True)
    row_has_text = np.bincount(row_codes, weights=nonempty) > 0
    row_is_data = (row_uniq % KEY_STRIDE) > 0
    keep_row = row_has_text | ~row_is_data          # headers always kept
    # table gate: >=1 surviving data row
    gid_of_row = (row_uniq // KEY_STRIDE).astype(np.int64)
    data_rows_per_gid = np.bincount(
        gid_of_row, weights=(row_has_text & row_is_data),
        minlength=int(cells["gid"].max()) + 1)
    keep_cell = keep_row[row_codes] & (data_rows_per_gid[cells["gid"]] > 0)
    out = cells[keep_cell].copy()
    if len(out) == 0:
        return pd.DataFrame(columns=["key", *CELL_COLS])
    # compact surviving data rows to 1..K per grid (header stays 0)
    srk = out["gid"].to_numpy() * KEY_STRIDE + out["row"].to_numpy()
    scodes, suniq = pd.factorize(srk, sort=True)
    sg = (suniq // KEY_STRIDE).astype(np.int64)
    first_of_g = np.empty(len(sg), dtype=bool)
    first_of_g[0] = True
    first_of_g[1:] = sg[1:] != sg[:-1]
    rank = np.arange(len(sg)) - np.maximum.accumulate(
        np.where(first_of_g, np.arange(len(sg)), 0))
    out["row_idx"] = rank[scodes].astype(np.int64)
    out["is_header"] = out["row_idx"] == 0
    out["table_index"] = 0
    out["col_idx"] = out["col"].astype(np.int64)
    out["confidence"] = confidence
    return out[["key", *CELL_COLS]]


def _concat_cells(located: pd.DataFrame) -> pd.DataFrame:
    """Reading-order concat + whitespace collapse per (gid, row, col)."""
    located = located.sort_values(["gid", "row", "col", "y0", "x0", "offset"],
                                  kind="stable")
    joined = (located.groupby(["gid", "row", "col"], sort=True)["content"]
              .agg(" ".join).reset_index())
    joined["cell"] = (joined["content"].str.split().str.join(" "))
    return joined.drop(columns=["content"])


def infer_grid_tables(flat: pd.DataFrame, key: str = "doc_pos",
                      snap_tol: float = SNAP_TOL) -> pd.DataFrame:
    """Primary + fallback table inference over a flat span frame.

    Returns (key, page, table_index, row_idx, col_idx, cell, is_header,
    confidence) — row_idx 0 is the header row, data rows are compacted to
    1..K after the all-empty-row drop.
    """
    empty = pd.DataFrame(columns=[key, *CELL_COLS])
    geo_ok = flat["x0"].notna() & flat["y0"].notna() \
        & flat["x1"].notna() & flat["y1"].notna()
    f = flat[geo_ok]
    if len(f) == 0:
        return empty

    primary = _primary_grid_tables(f, key, snap_tol)
    covered = primary[[key, "page"]].drop_duplicates() if len(primary) else None
    text = f[f["kind"] == "text"]
    if covered is not None and len(covered):
        text = text.merge(covered, on=[key, "page"], how="left", indicator=True)
        text = text[text["_merge"] == "left_only"].drop(columns=["_merge"])
    fallback = _fallback_text_tables(text, key, snap_tol)
    out = pd.concat([primary, fallback], ignore_index=True) \
        if len(fallback) else primary
    if len(out) == 0:
        return empty
    return (out.sort_values([key, "page", "table_index", "row_idx", "col_idx"],
                            kind="stable").reset_index(drop=True))


def _primary_grid_tables(f: pd.DataFrame, key: str,
                         snap_tol: float) -> pd.DataFrame:
    lines = f[f["kind"] == "line"]
    rects = f[f["kind"] == "rect"]

    dy = (lines["y1"] - lines["y0"]).abs().to_numpy()
    dx = (lines["x1"] - lines["x0"]).abs().to_numpy()
    is_h = dy < 2
    is_v = (~is_h) & (dx < 2)

    parts = []
    if is_h.any():
        h = lines[is_h]
        parts.append(pd.DataFrame({
            key: h[key].to_numpy(), "page": h["page"].to_numpy(),
            "orient": 0, "pos": ((h["y0"] + h["y1"]) / 2).to_numpy()}))
    if is_v.any():
        v = lines[is_v]
        parts.append(pd.DataFrame({
            key: v[key].to_numpy(), "page": v["page"].to_numpy(),
            "orient": 1, "pos": ((v["x0"] + v["x1"]) / 2).to_numpy()}))
    if len(rects):
        for orient, a, b in ((0, "y0", "y1"), (1, "x0", "x1")):
            for edge in (a, b):
                parts.append(pd.DataFrame({
                    key: rects[key].to_numpy(),
                    "page": rects["page"].to_numpy(),
                    "orient": orient, "pos": rects[edge].to_numpy()}))
    if not parts:
        return pd.DataFrame(columns=[key, *CELL_COLS])
    rul = pd.concat(parts, ignore_index=True)

    pcode = _page_codes(rul, key)
    gkey = pcode * 2 + rul["orient"].to_numpy()
    cid, order, rep = _cluster_1d(gkey, rul["pos"].to_numpy(dtype=np.float64),
                                  snap_tol)
    # one row per boundary cluster
    first = np.empty(len(order), dtype=bool)
    first[0] = True
    first[1:] = cid[1:] != cid[:-1]
    bidx = order[first]
    bounds = pd.DataFrame({
        key: rul[key].to_numpy()[bidx],
        "page": rul["page"].to_numpy()[bidx],
        "orient": rul["orient"].to_numpy()[bidx],
        "pos": rep[cid[first]],
    }).sort_values([key, "page", "orient", "pos"], kind="stable")

    counts = (bounds.groupby([key, "page", "orient"], sort=True)
              .size().unstack("orient", fill_value=0)
              .reindex(columns=[0, 1], fill_value=0))
    grids = counts[(counts[0] >= 3) & (counts[1] >= 2)].reset_index()
    # n_h>=3 <=> raw rows >= 2 (header + >=1 data, table_extractor.py:73)
    if len(grids) == 0:
        return pd.DataFrame(columns=[key, *CELL_COLS])
    grids = grids.rename(columns={0: "n_h", 1: "n_v"})
    grids["gid"] = np.arange(len(grids))
    n_rows = (grids["n_h"] - 1).to_numpy(dtype=np.int64)
    n_cols = (grids["n_v"] - 1).to_numpy(dtype=np.int64)

    bounds = (bounds.merge(grids[[key, "page", "gid"]], on=[key, "page"])
              .sort_values(["gid", "orient", "pos"], kind="stable"))
    hb = bounds[bounds["orient"] == 0]
    vb = bounds[bounds["orient"] == 1]
    h_starts = np.concatenate([[0], np.cumsum(n_rows + 1)[:-1]])
    v_starts = np.concatenate([[0], np.cumsum(n_cols + 1)[:-1]])
    h_keys = hb["gid"].to_numpy() * KEY_STRIDE + hb["pos"].to_numpy()
    v_keys = vb["gid"].to_numpy() * KEY_STRIDE + vb["pos"].to_numpy()

    text = f[f["kind"] == "text"].merge(grids[[key, "page", "gid"]],
                                        on=[key, "page"])
    if len(text) == 0:
        return pd.DataFrame(columns=[key, *CELL_COLS])
    g = text["gid"].to_numpy()
    cy = ((text["y0"] + text["y1"]) / 2).to_numpy(dtype=np.float64)
    cx = ((text["x0"] + text["x1"]) / 2).to_numpy(dtype=np.float64)
    row = np.searchsorted(h_keys, g * KEY_STRIDE + cy, side="right") - 1 \
        - h_starts[g]
    col = np.searchsorted(v_keys, g * KEY_STRIDE + cx, side="right") - 1 \
        - v_starts[g]
    inside = (row >= 0) & (row < n_rows[g]) & (col >= 0) & (col < n_cols[g])
    located = pd.DataFrame({
        "gid": g[inside], "row": row[inside], "col": col[inside],
        "y0": text["y0"].to_numpy()[inside], "x0": text["x0"].to_numpy()[inside],
        "offset": text["offset"].to_numpy()[inside],
        "content": text["content"].to_numpy()[inside],
    })
    joined = _concat_cells(located)

    gid, drow, dcol = _dense_cells(n_rows, n_cols)
    dense = pd.DataFrame({"gid": gid, "row": drow, "col": dcol})
    dense = dense.merge(joined, on=["gid", "row", "col"], how="left")
    dense["cell"] = dense["cell"].fillna("")
    dense = dense.merge(grids[["gid", key, "page"]], on="gid")
    return _finish(dense, key, 1.0)


def _finish(dense: pd.DataFrame, key: str, confidence: float) -> pd.DataFrame:
    dense = dense.rename(columns={key: "key"})
    out = _assemble_tables(dense, confidence)
    return out.rename(columns={"key": key})


def _fallback_text_tables(text: pd.DataFrame, key: str,
                          snap_tol: float) -> pd.DataFrame:
    """Text-alignment strategy (confidence 0.7): y0 clusters are rows, x0
    clusters are columns; >=2 of each required."""
    empty = pd.DataFrame(columns=[key, *CELL_COLS])
    if len(text) == 0:
        return empty
    pcode = _page_codes(text, key)
    y = text["y0"].to_numpy(dtype=np.float64)
    x = text["x0"].to_numpy(dtype=np.float64)

    rcid, rorder, _ = _cluster_1d(pcode, y, snap_tol)
    row_of = np.empty(len(text), dtype=np.int64)
    row_of[rorder] = rcid
    ccid, corder, _ = _cluster_1d(pcode, x, snap_tol)
    col_of = np.empty(len(text), dtype=np.int64)
    col_of[corder] = ccid

    # local (0-based) row/col index per page
    df = pd.DataFrame({
        "pcode": pcode, key: text[key].to_numpy(),
        "page": text["page"].to_numpy(),
        "rglob": row_of, "cglob": col_of,
        "y0": y, "x0": x,
        "offset": text["offset"].to_numpy(),
        "content": text["content"].to_numpy(),
    })
    rmin = df.groupby("pcode")["rglob"].transform("min")
    cmin = df.groupby("pcode")["cglob"].transform("min")
    df["row"] = df["rglob"] - rmin
    df["col"] = df["cglob"] - cmin

    dims = df.groupby("pcode").agg(
        n_rows=("row", "max"), n_cols=("col", "max")).reset_index()
    dims["n_rows"] += 1
    dims["n_cols"] += 1
    dims = dims[(dims["n_rows"] >= 2) & (dims["n_cols"] >= 2)]
    if len(dims) == 0:
        return empty
    dims = dims.reset_index(drop=True)
    dims["gid"] = np.arange(len(dims))
    df = df.merge(dims[["pcode", "gid"]], on="pcode")
    joined = _concat_cells(df[["gid", "row", "col", "y0", "x0",
                               "offset", "content"]])

    n_rows = dims["n_rows"].to_numpy(dtype=np.int64)
    n_cols = dims["n_cols"].to_numpy(dtype=np.int64)
    gid, drow, dcol = _dense_cells(n_rows, n_cols)
    dense = pd.DataFrame({"gid": gid, "row": drow, "col": dcol})
    dense = dense.merge(joined, on=["gid", "row", "col"], how="left")
    dense["cell"] = dense["cell"].fillna("")
    pagekey = df[["gid", key, "page"]].drop_duplicates("gid")
    dense = dense.merge(pagekey, on="gid")
    return _finish(dense, key, 0.7)

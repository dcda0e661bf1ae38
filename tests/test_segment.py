"""λ-flat-zone segmentation (i.segment analog) vs a whole-scene BFS oracle.

The oracle flood-fills the mosaicked plane over |Δ| <= lam 4-adjacency —
fully independent of the Shiloach–Vishkin kernel and the border-stitch
decomposition — and the per-segment stat multisets must match exactly.
Uniform tile grid (regions.py convention).
"""

import numpy as np
import pandas as pd
import pytest

from i_landsat8_swlst_spark import segment
from i_landsat8_swlst_spark.segment import lambda_label


def _brute(scene: np.ndarray, lam: float):
    """Multiset of (area, sum, min, max, bbox) per whole-scene component."""
    H, W = scene.shape
    seen = np.zeros((H, W), dtype=bool)
    out = []
    for sy in range(H):
        for sx in range(W):
            if seen[sy, sx] or not np.isfinite(scene[sy, sx]):
                continue
            comp = [(sy, sx)]
            seen[sy, sx] = True
            stack = [(sy, sx)]
            while stack:
                y, x = stack.pop()
                for ny, nx in ((y - 1, x), (y + 1, x), (y, x - 1), (y, x + 1)):
                    if (0 <= ny < H and 0 <= nx < W and not seen[ny, nx]
                            and np.isfinite(scene[ny, nx])
                            and abs(scene[ny, nx] - scene[y, x]) <= lam):
                        seen[ny, nx] = True
                        stack.append((ny, nx))
                        comp.append((ny, nx))
            ys = [c[0] for c in comp]; xs = [c[1] for c in comp]
            vals = np.array([scene[c] for c in comp])
            out.append((len(comp), round(float(vals.sum()), 6),
                        float(vals.min()), float(vals.max()),
                        min(xs), min(ys), max(xs), max(ys)))
    return sorted(out)


def _tile_df(spark, scene: np.ndarray, scene_id="G0", tw=10, th=8):
    H, W = scene.shape
    assert H % th == 0 and W % tw == 0
    rows = []
    for ty in range(H // th):
        for tx in range(W // tw):
            t = scene[ty * th:(ty + 1) * th, tx * tw:(tx + 1) * tw]
            rows.append({"scene_id": scene_id, "tile_x": tx, "tile_y": ty,
                         "w": tw, "h": th,
                         "lst_bytes": t.astype("<f4").tobytes()})
    return spark.createDataFrame(pd.DataFrame(rows))


def _rows_key(rows):
    return sorted((r.area_px, round(r.mean_val * r.area_px, 6),
                   r.min_val, r.max_val, r.gx0, r.gy0, r.gx1, r.gy1)
                  for r in rows)


def test_segment_matches_bruteforce(spark):
    rng = np.random.default_rng(41)
    H, W = 24, 30
    scene = rng.uniform(270.0, 330.0, (H, W))
    for _ in range(2):  # smooth -> segments genuinely cross tile borders
        scene[1:, :] = (scene[1:, :] + scene[:-1, :]) / 2
        scene[:, 1:] = (scene[:, 1:] + scene[:, :-1]) / 2
    scene[rng.random((H, W)) < 0.06] = np.nan
    scene = scene.astype(np.float32).astype(np.float64)
    lam = 2.0
    got = segment.segment_tiles(_tile_df(spark, scene), lam).collect()
    assert _rows_key(got) == _brute(scene, lam)


def test_segment_lambda_extremes(spark):
    rng = np.random.default_rng(5)
    scene = np.round(rng.uniform(0, 3, (16, 20))).astype(np.float32).astype(np.float64)
    df = _tile_df(spark, scene)
    # lam huge -> ONE segment covering everything
    big = segment.segment_tiles(df, 1e9).collect()
    assert len(big) == 1 and big[0].area_px == 320 and big[0].n_parts >= 4
    # lam = 0 -> exact-equality zones; oracle agrees
    got = segment.segment_tiles(df, 0.0).collect()
    assert _rows_key(got) == _brute(scene, 0.0)
    with pytest.raises(ValueError, match="lam must be"):
        segment.segment_tiles(df, -1.0)


def test_segment_serpentine_chain_across_tiles(spark):
    """A 1-px serpentine gradient ramp snaking through all tiles: one
    segment whose stitching needs a long cross-border chain, surrounded
    by NaN."""
    H, W = 16, 20
    scene = np.full((H, W), np.nan)
    val, path = 0.0, []
    for band in range(0, H, 4):
        xs = range(W) if (band // 4) % 2 == 0 else range(W - 1, -1, -1)
        for x in xs:
            scene[band, x] = val
            path.append((band, x))
            val += 0.5
        if band + 4 < H:  # vertical connector
            for y in range(band + 1, band + 4):
                scene[y, path[-1][1]] = val
                val += 0.5
    got = segment.segment_tiles(_tile_df(spark, scene), 0.6).collect()
    assert len(got) == 1
    n_valid = int(np.isfinite(scene).sum())
    assert got[0].area_px == n_valid
    # the snake enters each of the 4 tiles at least once (some twice as
    # disconnected local parts later merged by the stitch)
    assert got[0].n_parts >= 4
    assert (got[0].gx0, got[0].gy0, got[0].gx1) == (0, 0, W - 1)


def test_lambda_label_local_kernel():
    plane = np.array([[1.0, 1.2, 5.0],
                      [1.1, np.nan, 5.1],
                      [9.0, 9.1, 5.2]])
    labels, n = lambda_label(plane, 0.5)
    assert n == 3
    assert labels[1, 1] == -1
    assert labels[0, 0] == labels[0, 1] == labels[1, 0]
    assert labels[0, 2] == labels[1, 2] == labels[2, 2]
    assert labels[2, 0] == labels[2, 1]
    assert len({labels[0, 0], labels[0, 2], labels[2, 0]}) == 3


def _ragged_tile_df(spark, scene: np.ndarray, scene_id="RG0", tw=8, th=6):
    """Ceil-division tiling — right/bottom edge tiles shorter than nominal."""
    H, W = scene.shape
    rows = []
    for ty in range((H + th - 1) // th):
        for tx in range((W + tw - 1) // tw):
            t = scene[ty * th:min((ty + 1) * th, H),
                      tx * tw:min((tx + 1) * tw, W)]
            rows.append({"scene_id": scene_id, "tile_x": tx, "tile_y": ty,
                         "w": t.shape[1], "h": t.shape[0],
                         "lst_bytes": t.astype("<f4").tobytes()})
    return spark.createDataFrame(pd.DataFrame(rows))


def test_segment_ragged_grid(spark):
    """Regression (ADVICE r4): nominal-dims scene coords make ragged
    right/bottom edge tiles stitch correctly (22x27 plane, 8x6 nominal
    tiles -> 3-px right strip, 4-px bottom strip)."""
    rng = np.random.default_rng(44)
    H, W = 22, 27
    scene = rng.uniform(270.0, 330.0, (H, W))
    for _ in range(2):
        scene[1:, :] = (scene[1:, :] + scene[:-1, :]) / 2
        scene[:, 1:] = (scene[:, 1:] + scene[:, :-1]) / 2
    scene[rng.random((H, W)) < 0.05] = np.nan
    scene = scene.astype(np.float32).astype(np.float64)
    lam = 2.0
    got = segment.segment_tiles(_ragged_tile_df(spark, scene), lam).collect()
    assert _rows_key(got) == _brute(scene, lam)
    assert any(r.n_parts > 1 for r in got)  # stitching actually exercised

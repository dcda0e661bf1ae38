"""GLCM texture (r.texture analog) vs a per-pixel brute-force oracle.

The oracle builds each window's co-occurrence histogram with explicit
Python loops over ordered pairs in BOTH offset directions, requiring both
pixels of a pair to sit inside the moving window (the graycomatrix-on-
patch symmetric convention the kernel implements) — fully independent of
the kernel's box-filter algebra — and the tiled run must match the
whole-scene brute force exactly (halo margin gives cross-tile windows the
same pixels the mosaic has)."""

import math

import numpy as np
import pandas as pd
import pytest

from i_landsat8_swlst_spark import texture
from i_landsat8_swlst_spark.texture import FEATURES, _quantize


def _brute(scene: np.ndarray, window: int, offset, levels: int,
           vmin: float, vmax: float) -> dict[str, np.ndarray]:
    H, W = scene.shape
    m = window // 2
    dx, dy = offset
    q = _quantize(scene, vmin, vmax, levels)
    out = {f: np.full((H, W), np.nan) for f in FEATURES}
    for cy in range(H):
        for cx in range(W):
            hist: dict[tuple, int] = {}
            t = 0
            for py in range(cy - m, cy + m + 1):
                for px in range(cx - m, cx + m + 1):
                    for sx, sy in ((dx, dy), (-dx, -dy)):
                        qy, qx = py + sy, px + sx
                        if not (0 <= py < H and 0 <= px < W and
                                0 <= qy < H and 0 <= qx < W):
                            continue
                        if not (cy - m <= qy <= cy + m and
                                cx - m <= qx <= cx + m):
                            continue  # partner outside the window patch
                        a, b = int(q[py, px]), int(q[qy, qx])
                        if a < 0 or b < 0:
                            continue
                        hist[(a, b)] = hist.get((a, b), 0) + 1
                        t += 1
            if t == 0:
                continue
            c = d = ho = e = en = 0.0
            for (a, b), k in hist.items():
                p = k / t
                c += p * (a - b) ** 2
                d += p * abs(a - b)
                ho += p / (1.0 + (a - b) ** 2)
                e += p * p
                en -= p * math.log(p)
            out["contrast"][cy, cx] = c
            out["dissimilarity"][cy, cx] = d
            out["homogeneity"][cy, cx] = ho
            out["energy"][cy, cx] = e
            out["entropy"][cy, cx] = en
    return out


def _tile_df(spark, scene: np.ndarray, scene_id="T0", tw=11, th=9):
    """Ragged tiling of one scene plane into the halo-compatible layout."""
    H, W = scene.shape
    rows = []
    for ty in range((H + th - 1) // th):
        for tx in range((W + tw - 1) // tw):
            t = scene[ty * th:(ty + 1) * th, tx * tw:(tx + 1) * tw]
            rows.append({"image_id": f"{scene_id}-i", "scene_id": scene_id,
                         "tile_x": tx, "tile_y": ty,
                         "w": t.shape[1], "h": t.shape[0],
                         "lst_bytes": t.astype("<f4").tobytes()})
    return spark.createDataFrame(pd.DataFrame(rows))


def _mosaic(pdf, col, H, W, th=9, tw=11):
    got = np.full((H, W), np.nan, dtype=np.float32)
    for _, r in pdf.iterrows():
        p = np.frombuffer(r[col], "<f4").reshape(r.h, r.w)
        got[r.tile_y * th:r.tile_y * th + r.h,
            r.tile_x * tw:r.tile_x * tw + r.w] = p
    return got


@pytest.mark.parametrize("offset", [(1, 0), (1, 1), (0, 2)])
def test_glcm_matches_bruteforce_across_tiles(spark, offset):
    rng = np.random.default_rng(17)
    H, W = 25, 31  # ragged vs (9, 11) tiles -> interior + edge tiles
    scene = rng.uniform(270.0, 330.0, (H, W))
    scene[rng.random((H, W)) < 0.08] = np.nan
    scene = scene.astype(np.float32).astype(np.float64)
    vmin, vmax = np.nanmin(scene), np.nanmax(scene)
    exp = _brute(scene, 5, offset, 8, vmin, vmax)
    df = _tile_df(spark, scene)
    out = texture.glcm_texture_tiles(df, window=5, levels=8, offset=offset)
    pdf = out.toPandas()
    for f in FEATURES:
        got = _mosaic(pdf, f"{f}_bytes", H, W).astype(np.float64)
        assert np.array_equal(np.isnan(got), np.isnan(exp[f])), f
        ok = ~np.isnan(got)
        assert np.allclose(got[ok], exp[f][ok], rtol=1e-5, atol=1e-6), f


def test_glcm_constant_plane_properties(spark):
    """On a constant plane the GLCM is a single diagonal cell: contrast =
    dissimilarity = 0, homogeneity = energy = 1, entropy = 0 everywhere."""
    scene = np.full((12, 14), 300.0)
    df = _tile_df(spark, scene, scene_id="C")
    pdf = texture.glcm_texture_tiles(df, window=3, levels=8).toPandas()
    H, W = scene.shape
    for f, v in [("contrast", 0), ("dissimilarity", 0), ("homogeneity", 1),
                 ("energy", 1), ("entropy", 0)]:
        got = _mosaic(pdf, f"{f}_bytes", H, W)
        assert np.allclose(got, v, atol=1e-6), f


def test_glcm_rejects_bad_args(spark):
    df = _tile_df(spark, np.ones((9, 11)), scene_id="B")
    with pytest.raises(ValueError, match="window must be odd"):
        texture.glcm_texture_tiles(df, window=4)
    with pytest.raises(ValueError, match="unknown GLCM features"):
        texture.glcm_texture_tiles(df, features=("contrast", "blur"))
    with pytest.raises(ValueError, match="offset must move"):
        texture.glcm_texture_tiles(df, offset=(0, 0))
    with pytest.raises(ValueError, match="levels must be"):
        texture.glcm_texture_tiles(df, levels=0)
    with pytest.raises(ValueError, match="exceeds window"):
        texture.glcm_texture_tiles(df, window=3, offset=(3, 0))


def test_glcm_direction_average_matches_per_offset_mean(spark):
    """Multi-offset (-a) output == nan-aware per-pixel mean of the
    single-offset whole-scene brute results, across tiles (one shared
    halo must cover the largest offset)."""
    rng = np.random.default_rng(29)
    H, W = 18, 22
    scene = rng.uniform(270.0, 330.0, (H, W))
    scene[rng.random((H, W)) < 0.08] = np.nan
    scene = scene.astype(np.float32).astype(np.float64)
    vmin, vmax = np.nanmin(scene), np.nanmax(scene)
    offsets = ((1, 0), (0, 1), (1, 1))
    briefs = [_brute(scene, 3, o, 6, vmin, vmax) for o in offsets]
    df = _tile_df(spark, scene)
    pdf = texture.glcm_texture_tiles(df, window=3, levels=6,
                                     offset=offsets).toPandas()
    import warnings
    for f in FEATURES:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            exp = np.nanmean(np.stack([b[f] for b in briefs]), axis=0)
        got = _mosaic(pdf, f"{f}_bytes", H, W).astype(np.float64)
        assert np.array_equal(np.isnan(got), np.isnan(exp)), f
        ok = ~np.isnan(got)
        assert np.allclose(got[ok], exp[ok], rtol=1e-5, atol=1e-6), f

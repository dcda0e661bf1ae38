"""Landscape metrics (r.li analog) vs a whole-scene brute-force oracle.

The oracle quantizes the mosaicked plane with the shared formula, then
flood-fills 4-connected patches per class and counts edge credits by
scanning every adjacent pair — fully independent of the distributed
decomposition (tile-local label + border stitch + directed edge join).
Uniform tile grid, as regions.py documents (scene px = tile_x * w + px).
"""

import math

import numpy as np
import pandas as pd
import pytest

from i_landsat8_swlst_spark import landscape
from i_landsat8_swlst_spark.texture import _quantize


def _brute(scene: np.ndarray, levels: int):
    """Per-class {cls: (area, edge, n_patches, sizes)} via flood fill."""
    fa = scene[np.isfinite(scene)]
    q = _quantize(scene, fa.min(), fa.max(), levels)
    H, W = q.shape
    edge = {}
    for (a, b) in (((q[:, :-1]), (q[:, 1:])), ((q[:-1, :]), (q[1:, :]))):
        m = (a >= 0) & (b >= 0) & (a != b)
        for ca, cb in zip(a[m], b[m]):
            edge[int(ca)] = edge.get(int(ca), 0) + 1
            edge[int(cb)] = edge.get(int(cb), 0) + 1
    seen = np.zeros((H, W), dtype=bool)
    patches: dict = {}
    for sy in range(H):
        for sx in range(W):
            if seen[sy, sx] or q[sy, sx] < 0:
                continue
            c = int(q[sy, sx])
            stack, size = [(sy, sx)], 0
            seen[sy, sx] = True
            while stack:
                y, x = stack.pop()
                size += 1
                for ny, nx in ((y - 1, x), (y + 1, x), (y, x - 1), (y, x + 1)):
                    if (0 <= ny < H and 0 <= nx < W and not seen[ny, nx]
                            and q[ny, nx] == c):
                        seen[ny, nx] = True
                        stack.append((ny, nx))
            patches.setdefault(c, []).append(size)
    out = {}
    for c in range(levels):
        sizes = patches.get(c, [])
        area = int((q == c).sum())
        if area:
            out[c] = (area, edge.get(c, 0), len(sizes), sorted(sizes))
    return out


def _tile_df(spark, scene: np.ndarray, scene_id="L0", tw=10, th=8):
    H, W = scene.shape
    assert H % th == 0 and W % tw == 0  # uniform grid (regions convention)
    rows = []
    for ty in range(H // th):
        for tx in range(W // tw):
            t = scene[ty * th:(ty + 1) * th, tx * tw:(tx + 1) * tw]
            rows.append({"image_id": f"{scene_id}-i", "scene_id": scene_id,
                         "tile_x": tx, "tile_y": ty, "w": tw, "h": th,
                         "lst_bytes": t.astype("<f4").tobytes()})
    return spark.createDataFrame(pd.DataFrame(rows))


def test_class_metrics_matches_bruteforce(spark):
    rng = np.random.default_rng(23)
    H, W = 24, 30
    # few levels + smoothing -> patches that genuinely span tile borders
    scene = rng.uniform(270.0, 330.0, (H, W))
    for _ in range(2):  # local smoothing widens patches
        scene[1:, :] = (scene[1:, :] + scene[:-1, :]) / 2
        scene[:, 1:] = (scene[:, 1:] + scene[:, :-1]) / 2
    scene[rng.random((H, W)) < 0.07] = np.nan
    scene = scene.astype(np.float32).astype(np.float64)
    exp = _brute(scene, 4)
    got = landscape.class_metrics(_tile_df(spark, scene), levels=4).collect()
    gm = {int(r.cls): r for r in got}
    assert set(gm) == set(exp)
    for c, (area, edge, n_p, sizes) in exp.items():
        r = gm[c]
        assert r.area_px == area, c
        assert r.edge_px == edge, c
        assert r.n_patches == n_p, c
        assert r.largest_patch_px == sizes[-1], c
        assert r.mean_patch_px == pytest.approx(sum(sizes) / len(sizes)), c


def test_class_metrics_two_scenes_and_constant(spark):
    """A constant scene is one class, one patch, zero edge; scenes don't
    leak into each other."""
    rng = np.random.default_rng(5)
    noisy = rng.uniform(280.0, 320.0, (16, 20)).astype(np.float32).astype(np.float64)
    const = np.full((16, 20), 300.0)
    df = _tile_df(spark, noisy, scene_id="N").unionAll(
        _tile_df(spark, const, scene_id="C"))
    got = landscape.class_metrics(df, levels=3).collect()
    cm = [r for r in got if r.scene_id == "C"]
    assert len(cm) == 1
    assert (cm[0].area_px, cm[0].edge_px, cm[0].n_patches,
            cm[0].largest_patch_px) == (320, 0, 1, 320)
    nm = {int(r.cls): r for r in got if r.scene_id == "N"}
    exp = _brute(noisy, 3)
    assert {c: (r.area_px, r.edge_px, r.n_patches) for c, r in nm.items()} \
        == {c: (a, e, n) for c, (a, e, n, _) in exp.items()}


def test_scene_diversity(spark):
    rng = np.random.default_rng(9)
    scene = rng.uniform(270.0, 330.0, (16, 20)).astype(np.float32).astype(np.float64)
    m = landscape.class_metrics(_tile_df(spark, scene, scene_id="D"), levels=4)
    d = landscape.scene_diversity(m).collect()[0]
    areas = {int(r.cls): r.area_px for r in m.collect()}
    tot = sum(areas.values())
    ps = [a / tot for a in areas.values()]
    h = -sum(p * math.log(p) for p in ps)
    assert d.richness == len(areas)
    assert d.shannon_h == pytest.approx(h)
    assert d.dominance == pytest.approx(max(ps))
    assert d.evenness == pytest.approx(h / math.log(len(areas)))


def test_class_metrics_rejects_bad_levels(spark):
    df = _tile_df(spark, np.ones((8, 10)), scene_id="B")
    with pytest.raises(ValueError, match="levels must be"):
        landscape.class_metrics(df, levels=1)


def test_class_metrics_ragged_grid(spark):
    """Regression (ADVICE r4): ragged right/bottom edge tiles must derive
    scene coords from NOMINAL tile dims or cross-tile patch merges and
    edge crossings are silently lost."""
    rng = np.random.default_rng(29)
    H, W = 22, 27                       # 8x6 nominal -> ragged edges
    scene = rng.uniform(270.0, 330.0, (H, W))
    for _ in range(2):
        scene[1:, :] = (scene[1:, :] + scene[:-1, :]) / 2
        scene[:, 1:] = (scene[:, 1:] + scene[:, :-1]) / 2
    scene[rng.random((H, W)) < 0.05] = np.nan
    scene = scene.astype(np.float32).astype(np.float64)
    exp = _brute(scene, 4)

    rows = []
    tw, th = 8, 6
    for ty in range((H + th - 1) // th):
        for tx in range((W + tw - 1) // tw):
            t = scene[ty * th:min((ty + 1) * th, H),
                      tx * tw:min((tx + 1) * tw, W)]
            rows.append({"image_id": "RG-i", "scene_id": "RG",
                         "tile_x": tx, "tile_y": ty,
                         "w": t.shape[1], "h": t.shape[0],
                         "lst_bytes": t.astype("<f4").tobytes()})
    tiles = spark.createDataFrame(pd.DataFrame(rows))
    got = landscape.class_metrics(tiles, levels=4).collect()
    gm = {int(r.cls): r for r in got}
    assert set(gm) == set(exp)
    for c, (area, edge, n_p, sizes) in exp.items():
        r = gm[c]
        assert (r.area_px, r.edge_px, r.n_patches) == (area, edge, n_p), c
        assert r.largest_patch_px == sizes[-1], c

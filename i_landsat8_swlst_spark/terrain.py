"""Terrain visibility — the r.viewshed analog.

Reference: no file can be cited (the /root/reference mount is empty every
round — SURVEY.md §0); the behavioral spec is the published GRASS
r.viewshed module applied to this engine's tiled raster model.

**Semantics (exact, R3-style):** target cell T (pixel center) is visible
from the observer O (pixel center, eye at terrain + ``obs_height``) iff at
every integer gridline crossing STRICTLY between O and T along the segment
O->T, the sight line's height is >= the terrain height at the crossing,
where terrain at a crossing is linearly interpolated between the two
adjacent pixel centers perpendicular to the crossed axis — the classic
exact per-ray algorithm ("R3" in the viewshed literature; GRASS r.viewshed
implements the Van Kreveld sweep with the same visibility definition).
Comparisons use slope = dz / planar distance (monotone in elevation angle,
no trig). Deviations from GRASS, stated: planar distances in cell units
(no lat/lon metric or earth-curvature drop), NaN terrain never blocks a
ray, and a NaN target is class 255 in the output plane.

**Distributed shape** (the same decompose-shuffle-assemble pattern as
warp): visibility of T depends on O(ray length) cells NOT aligned with the
tile grid, so tiles are the wrong work unit. Instead the scene decomposes
into ANGULAR SECTORS around the observer:

1. ONE decode pass (mapInArrow): each in-radius cell computes the sector
   range its INFLATED angular extent (a halfwidth-1.5 square, covering any
   ray that passes within one cell of its center — the interpolation
   support bound) intersects, and emits one (sector, gx, gy, z) row per
   intersected sector. Far cells subtend tiny angles (1-2 sectors); only
   the few near-observer cells replicate widely (cells within ~2.5 cells
   of O go to every sector).
2. groupBy(scene, sector) -> applyInPandas: every cell whose CENTER angle
   falls in the sector is a target; its ray marches over the sector-local
   sparse elevation map, which is guaranteed to contain every support
   cell of every crossing (the inflation above).
3. One regroup by destination tile rebuilds u8 visibility planes.

Shuffle volume: ~(1 + near-field) x one small row per cell, twice. Pixel
planes never cross an exchange. Per-sector work is O(targets x ray), the
inherent exact-R3 bound — ``max_dist`` is the production knob that keeps
rays bounded at 100 TB (GRASS's own max_distance). With ``max_dist`` set,
map cells are kept to ``max_dist + 1.5`` so that interpolation-support
cells just past the radius still block rays — blocking is full-plane,
only TARGETS are radius-limited (matching GRASS).
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType, DoubleType, IntegerType, LongType, StringType, StructField,
    StructType,
)

from . import codecs
from .pipeline import _batch_from_cols, _batch_rows

_CELL_SCHEMA = StructType([
    StructField("scene_id", StringType()),
    StructField("sector", IntegerType()),
    StructField("gx", IntegerType()),
    StructField("gy", IntegerType()),
    StructField("z", DoubleType()),
    StructField("is_target", IntegerType()),   # center angle in this sector
])

_VIS_SCHEMA = StructType([
    StructField("scene_id", StringType()),
    StructField("gx", IntegerType()),
    StructField("gy", IntegerType()),
    StructField("vis", IntegerType()),         # 1 visible, 0 hidden
])

_EYE_SCHEMA = StructType([
    StructField("scene_id", StringType()),
    StructField("z", DoubleType()),
])

VIEWSHED_SCHEMA = StructType([
    StructField("scene_id", StringType()),
    StructField("tile_x", IntegerType()),
    StructField("tile_y", IntegerType()),
    StructField("w", IntegerType()),
    StructField("h", IntegerType()),
    StructField("vis_bytes", BinaryType()),    # u8: 1/0, 255 = NaN/out-of-radius
    StructField("n_visible", LongType()),
    StructField("n_evaluated", LongType()),
])


def _ray_visible(ox: float, oy: float, eye: float, tx: int, ty: int,
                 tz: float, zmap: dict) -> bool:
    """Exact R3 test for one target over a {(gx, gy): z} elevation map.
    NaN / missing support cells never block. Shared verbatim by the
    distributed kernel and the test oracle's spec (the oracle reimplements
    it independently; this docstring IS the contract)."""
    dx, dy = tx - ox, ty - oy
    dist = math.hypot(dx, dy)
    if dist == 0:
        return True
    tslope = (tz - eye) / dist

    def blocked_at(t: float, zc: float) -> bool:
        if not math.isfinite(zc):
            return False
        d = t * dist
        return (zc - eye) / d > tslope + 1e-12

    # vertical gridline crossings (x = integer) strictly between
    if dx != 0:
        step = 1 if dx > 0 else -1
        x = int(math.floor(ox)) + (1 if dx > 0 else 0)
        while (x - ox) * step < abs(dx):
            if (x - ox) * step > 0:
                t = (x - ox) / dx
                y = oy + t * dy
                y0 = math.floor(y)
                fy = y - y0
                za = zmap.get((x, int(y0)), math.nan)
                zb = zmap.get((x, int(y0) + 1), math.nan) if fy > 0 else za
                if fy == 0:
                    zc = za
                elif not math.isfinite(za) or not math.isfinite(zb):
                    zc = math.nan
                else:
                    zc = (1 - fy) * za + fy * zb
                if blocked_at(t, zc):
                    return False
            x += step
    # horizontal gridline crossings (y = integer) strictly between
    if dy != 0:
        step = 1 if dy > 0 else -1
        y = int(math.floor(oy)) + (1 if dy > 0 else 0)
        while (y - oy) * step < abs(dy):
            if (y - oy) * step > 0:
                t = (y - oy) / dy
                x = ox + t * dx
                x0 = math.floor(x)
                fx = x - x0
                za = zmap.get((int(x0), y), math.nan)
                zb = zmap.get((int(x0) + 1, y), math.nan) if fx > 0 else za
                if fx == 0:
                    zc = za
                elif not math.isfinite(za) or not math.isfinite(zb):
                    zc = math.nan
                else:
                    zc = (1 - fx) * za + fx * zb
                if blocked_at(t, zc):
                    return False
            y += step
    return True


def _sector_pass(tiles: DataFrame, obs: DataFrame, n_sectors: int,
                 max_dist: float | None, nom_w: int, nom_h: int,
                 src_col: str) -> DataFrame:
    two_pi = 2.0 * math.pi

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            for row in _batch_rows(batch):
                if row.ox is None:
                    continue                  # scene without an observer
                w, h = int(row.w), int(row.h)
                tx0, ty0 = int(row.tile_x) * nom_w, int(row.tile_y) * nom_h
                oxx, oyy = float(row.ox), float(row.oy)
                plane = codecs.decode_f32bt(
                    getattr(row, src_col), w, h).astype(np.float64)
                yy, xx = np.mgrid[0:h, 0:w]
                gx = (tx0 + xx).ravel()
                gy = (ty0 + yy).ravel()
                z = plane.ravel()
                rx = gx - oxx
                ry = gy - oyy
                r = np.hypot(rx, ry)
                # map cells keep a +1.5 margin so interpolation-support
                # cells just past the radius still block; targets are
                # strictly radius-limited
                if max_dist is not None:
                    keep = r <= max_dist + 1.5
                    if not keep.any():
                        continue
                    gx, gy, z, rx, ry, r = (a[keep]
                                            for a in (gx, gy, z, rx, ry, r))
                    tgt_ok = r <= max_dist
                else:
                    tgt_ok = np.ones(len(r), dtype=bool)
                ang = np.arctan2(ry, rx)      # [-pi, pi]
                ctr_sec = (np.floor((ang + math.pi) / two_pi * n_sectors)
                           .astype(np.int64) % n_sectors)
                # inflated angular halfwidth: a square of halfwidth 1.5
                # around the center subtends <= 2*asin(min(1, 1.5*sqrt2/r));
                # asin saturates to pi/2 near O, near cells go everywhere
                near = r <= 2.5
                with np.errstate(invalid="ignore", divide="ignore"):
                    half = np.arcsin(np.clip(1.5 * math.sqrt(2.0)
                                             / np.maximum(r, 1e-9), 0, 1.0))
                s_lo = np.floor((ang - half + math.pi) / two_pi
                                * n_sectors).astype(np.int64)
                s_hi = np.floor((ang + half + math.pi) / two_pi
                                * n_sectors).astype(np.int64)
                # vectorized replication: each cell i emits `span[i]`
                # consecutive sectors starting at base[i] (mod n_sectors)
                span = np.minimum(s_hi - s_lo + 1, n_sectors)
                span = np.where(near, n_sectors, span)
                base = np.where(near, 0, s_lo)
                n_out = int(span.sum())
                if n_out == 0:
                    continue
                idx = np.repeat(np.arange(len(gx)), span)
                starts = np.concatenate(([0], np.cumsum(span)[:-1]))
                off = np.arange(n_out) - np.repeat(starts, span)
                sec = (np.repeat(base, span) + off) % n_sectors
                is_t = ((sec == np.repeat(ctr_sec, span))
                        & np.repeat(tgt_ok, span))
                sid = np.full(n_out, row.scene_id, dtype=object)
                yield pa.RecordBatch.from_arrays(
                    [pa.array(sid, pa.string()),
                     pa.array(sec.astype(np.int32)),
                     pa.array(gx[idx].astype(np.int32)),
                     pa.array(gy[idx].astype(np.int32)),
                     pa.array(z[idx]),
                     pa.array(is_t.astype(np.int32))],
                    names=[f.name for f in _CELL_SCHEMA])

    src = tiles.select("scene_id", "tile_x", "tile_y", "w", "h", src_col) \
        .join(F.broadcast(obs), on="scene_id", how="left")
    return src.mapInArrow(fn, _CELL_SCHEMA)


def _observer_terrain(tiles: DataFrame, obs_df: DataFrame, nom_w: int,
                      nom_h: int, src_col: str) -> DataFrame:
    """(scene_id, z) at each scene's observer cell, decoding only the tile
    that contains it (an observer outside the raster yields no row)."""
    hit = (tiles.select("scene_id", "tile_x", "tile_y", "w", "h", src_col)
           .join(F.broadcast(obs_df), on="scene_id")
           .filter((F.col("tile_x")
                    == F.floor(F.col("ox") / nom_w).cast("int"))
                   & (F.col("tile_y")
                      == F.floor(F.col("oy") / nom_h).cast("int"))))

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            cols: dict[str, list] = {"scene_id": [], "z": []}
            for row in _batch_rows(batch):
                w, h = int(row.w), int(row.h)
                lx = int(row.ox) - int(row.tile_x) * nom_w
                ly = int(row.oy) - int(row.tile_y) * nom_h
                if not (0 <= lx < w and 0 <= ly < h):
                    continue
                plane = codecs.decode_f32bt(getattr(row, src_col), w, h)
                cols["scene_id"].append(row.scene_id)
                cols["z"].append(float(plane[ly, lx]))
            if cols["scene_id"]:
                yield _batch_from_cols(cols, _EYE_SCHEMA)

    return hit.mapInArrow(fn, _EYE_SCHEMA)


def viewshed_tiles(tiles: DataFrame, observers, obs_height: float = 1.75,
                   max_dist: float | None = None, n_sectors: int = 256,
                   src_col: str = "lst_bytes") -> DataFrame:
    """r.viewshed: per-scene visibility plane from one observer per scene.

    ``observers``: pandas or Spark frame (scene_id, ox, oy) in scene
    pixel-CENTER coordinates (integers address cell centers). ``obs_height``
    is added to the observer cell's terrain (GRASS observer_elevation);
    a NaN observer cell raises. ``max_dist`` bounds rays in cell units
    (GRASS max_distance); cells beyond it — and NaN cells — are 255 in the
    output plane. Returns one row per input tile with a u8 plane.
    """
    spark = tiles.sparkSession
    if isinstance(observers, pd.DataFrame):
        obs_df = spark.createDataFrame(observers)
    else:
        obs_df = observers
    obs_df = obs_df.select("scene_id", F.col("ox").cast("double"),
                           F.col("oy").cast("double"))

    nom = tiles.agg(F.max("w").alias("w"), F.max("h").alias("h")).first()
    nom_w, nom_h = int(nom["w"]), int(nom["h"])

    cells = _sector_pass(tiles, obs_df, n_sectors, max_dist,
                         nom_w, nom_h, src_col)

    # per-sector exact R3 over the sector-local sparse map
    def run_sector(key, pdf: pd.DataFrame) -> pd.DataFrame:
        scene = key[0]
        o = obs_b.value.get(scene)
        if o is None:
            return pd.DataFrame(columns=[f.name for f in _VIS_SCHEMA])
        ox, oy, eye = o
        zmap = {(int(r.gx), int(r.gy)): float(r.z)
                for r in pdf.itertuples()}
        t = pdf[(pdf.is_target == 1) & np.isfinite(pdf.z)]
        out = []
        for r in t.itertuples():
            vis = _ray_visible(ox, oy, eye, int(r.gx), int(r.gy),
                               float(r.z), zmap)
            out.append({"scene_id": scene, "gx": int(r.gx),
                        "gy": int(r.gy), "vis": 1 if vis else 0})
        return pd.DataFrame(out, columns=[f.name for f in _VIS_SCHEMA])

    # observer eye heights: terrain at the observer cell + obs_height.
    # Decode ONLY the one tile per scene that contains the observer —
    # O(scenes) tiles touched, never a scan of the raster.
    opdf = obs_df.toPandas()
    if opdf.scene_id.duplicated().any():
        raise ValueError("one observer per scene")
    oz = _observer_terrain(tiles, obs_df, nom_w, nom_h, src_col).toPandas()
    eyes = {}
    for r in opdf.itertuples():
        zrow = oz[oz.scene_id == r.scene_id]
        if len(zrow) == 0 or not np.isfinite(zrow.z.iloc[0]):
            raise ValueError(
                f"observer cell for scene {r.scene_id!r} is NaN or outside "
                "the raster")
        eyes[r.scene_id] = (float(r.ox), float(r.oy),
                            float(zrow.z.iloc[0]) + float(obs_height))
    obs_b = spark.sparkContext.broadcast(eyes)

    vis = cells.groupBy("scene_id", "sector").applyInPandas(
        run_sector, _VIS_SCHEMA)

    # regroup to tile planes: one equi join of O(n) small rows
    layout = tiles.select("scene_id", "tile_x", "tile_y", "w", "h", src_col)

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (sid, tx, ty), grp in pdf.groupby(
                ["scene_id", "tile_x", "tile_y"]):
            w, h = int(grp.w.iloc[0]), int(grp.h.iloc[0])
            plane = np.full((h, w), 255, dtype=np.uint8)
            g = grp[grp.gx.notna()]
            if len(g):
                lx = g.gx.astype(int) - tx * nom_w
                ly = g.gy.astype(int) - ty * nom_h
                plane[ly, lx] = g.vis.astype(np.uint8)
            out.append({"scene_id": sid, "tile_x": int(tx), "tile_y": int(ty),
                        "w": w, "h": h, "vis_bytes": plane.tobytes(),
                        "n_visible": int((plane == 1).sum()),
                        "n_evaluated": int((plane != 255).sum())})
        return pd.DataFrame(out)

    keyed = vis.withColumn(
        "tile_x", (F.col("gx") / nom_w).cast("int")) \
        .withColumn("tile_y", (F.col("gy") / nom_h).cast("int"))
    joined = layout.drop(src_col).join(
        keyed, on=["scene_id", "tile_x", "tile_y"], how="left")
    return joined.groupBy("scene_id", "tile_x", "tile_y").applyInPandas(
        lambda pdf: build(pdf), VIEWSHED_SCHEMA)


# --------------------------------------------------------------------------
# Solar irradiance with cast shadows (r.sun analog, instantaneous mode)
# --------------------------------------------------------------------------

_SUN_SEG_SCHEMA = StructType([
    StructField("scene_id", StringType()),
    StructField("bkt", LongType()),            # floor(strip / _SUN_BKT)
    StructField("gy", IntegerType()),
    StructField("gx0", IntegerType()),
    StructField("z_bytes", BinaryType()),      # f32 LE elevation row segment
])

# strips per scan bucket: one task hosts a contiguous band of strips (a
# scene-width raster has O(w + h) strips, far fewer buckets)
_SUN_BKT = 64

_SHADOW_SCHEMA = StructType([
    StructField("scene_id", StringType()),
    StructField("tile_x", IntegerType()),
    StructField("tile_y", IntegerType()),
    # np.packbits bitmap over the nominal tile grid (ly * nom_w + lx),
    # set = shaded: with a low sun half the raster can be shaded, so
    # per-shaded-CELL rows out of the strip scan were the next row
    # explosion (4.8M rows measured at the 8.4 Mpx bench block) — a tile's
    # shaded set is <= 2 KB as a bitmap, one row per (tile, bucket)
    StructField("mask_bytes", BinaryType()),
])

SUN_SCHEMA = StructType([
    StructField("scene_id", StringType()),
    StructField("tile_x", IntegerType()),
    StructField("tile_y", IntegerType()),
    StructField("w", IntegerType()),
    StructField("h", IntegerType()),
    StructField("glob_bytes", BinaryType()),   # f32 W/m^2, NaN where NULL
    StructField("n_shaded", LongType()),
    StructField("n_valid", LongType()),
])

SOLAR_CONSTANT = 1367.0      # W/m^2
_DIFFUSE_FRAC = 0.10         # clear-sky isotropic diffuse fraction


def _runs_arange(lens: np.ndarray) -> np.ndarray:
    """Concatenated [0..len) ranges: [2, 3] -> [0, 1, 0, 1, 2]."""
    total = int(lens.sum())
    idx = np.arange(total, dtype=np.int64)
    off = np.repeat(np.cumsum(lens) - lens, lens)
    return idx - off


def _sun_vectors(azimuth_deg: float, altitude_deg: float):
    """(s-axis, tan alt, trig) for a sun at compass azimuth (0=N, CW) and
    altitude above the horizon. Pixel axes: u east (+x), v south (+y);
    the unit vector TOWARD the sun is (sin A, -cos A) in (u, v)."""
    a = math.radians(azimuth_deg % 360.0)
    alt = math.radians(altitude_deg)
    return math.sin(a), -math.cos(a), math.tan(alt)


def shadow_plane(plane: np.ndarray, azimuth_deg: float,
                 altitude_deg: float) -> np.ndarray:
    """Whole-plane cast-shadow reference (and the documented SPEC the
    distributed kernel implements): cells are grouped into UNIT-WIDTH
    STRIPS parallel to the sun azimuth (strip = floor(u*cosA + v*sinA));
    within a strip, cell c is shadowed iff some cell b strictly closer to
    the sun (s_b > s_c, s = u*sinA - v*cosA) has
    z_b - (s_b - s_c) * tan(alt) > z_c — i.e. running strict max of
    q = z - s*tan(alt) over descending s. The strip discretization is the
    classic parallel-ray grid-marching approximation (r.sun's own shadow
    walk is grid-stepped too); NaN cells never shade and are not targets.
    Ties in s never shade each other. Returns u8: 1 shaded, 0 lit,
    255 NaN."""
    h, w = plane.shape
    du, dv, tanalt = _sun_vectors(azimuth_deg, altitude_deg)
    a = math.radians(azimuth_deg % 360.0)
    vv, uu = np.mgrid[0:h, 0:w]
    s = uu * du + vv * dv
    p = uu * math.cos(a) + vv * math.sin(a)
    strip = np.floor(p).astype(np.int64)
    q = plane - s * tanalt
    out = np.full((h, w), 255, dtype=np.uint8)
    finite = np.isfinite(plane)
    out[finite] = 0
    for st in np.unique(strip):
        m = (strip == st) & finite
        if not m.any():
            continue
        ss, qq = s[m], q[m]
        order = np.argsort(-ss, kind="mergesort")
        ss, qq = ss[order], qq[order]
        runmax = -np.inf
        i = 0
        shaded = np.zeros(len(ss), dtype=bool)
        while i < len(ss):
            j = i
            while j < len(ss) and ss[j] == ss[i]:
                j += 1
            shaded[i:j] = qq[i:j] < runmax  # strict: block needs q_b > q_c
            runmax = max(runmax, float(qq[i:j].max()))
            i = j
        idx = np.flatnonzero(m)
        out.ravel()[idx[order]] = shaded.astype(np.uint8)
    return out


def sun_tiles(tiles: DataFrame, sun: DataFrame | pd.DataFrame,
              obs_height: float = 0.0,
              src_col: str = "lst_bytes") -> DataFrame:
    """r.sun analog, instantaneous clear-sky global irradiance with cast
    shadows, per scene. ``sun``: (scene_id, azimuth_deg, altitude_deg),
    one row per scene; altitude must be in (0, 90].

    Radiometric model (a documented SIMPLIFICATION of r.sun's Linke-
    turbidity model — the distributed geometry, not the atmosphere, is the
    point here): beam normal B = S0 * 0.75^(m^0.678) with air mass
    m = 1/sin(alt) (Meinel clear-sky); direct on the surface =
    B * max(cos i, 0) * lit, cos i from the Horn slope/aspect (exact
    cross-tile via the 1-px halo exchange); diffuse = S0 * 0.10 * sin(alt)
    * (1 + cos slope)/2 (isotropic sky). Output NaN wherever the 3x3
    gradient is NULL-poisoned (scene edges / NaN neighbors), matching
    gradient_tiles semantics.

    Distributed shape: ONE decode pass emits run-length ROW SEGMENTS —
    one (bkt, gy, gx0, f32 bytes) row per maximal run of raster-row cells
    whose strip falls in the same bucket of ``_SUN_BKT`` strips (strip is
    monotone in gx along a row, so runs are contiguous; a 128-px row spans
    <= 3 buckets). groupBy(scene, bkt) rebuilds the per-cell (gx, gy, z)
    arrays executor-side and runs the running-max scan of `shadow_plane`'s
    spec per strip, fully vectorized (tie groups of equal s via reduceat +
    accumulate — the same group-atomic comparisons as the serial walk),
    emitting ONLY shaded cells; the 1-px halo exchange carries the
    elevation planes; a final equi join + grouped kernel computes
    irradiance per tile. The segment exchange moves ~1x plane bytes in
    O(rows x buckets-per-row) rows — never one row per pixel (that emit
    was measured at ~5x plane bytes of small rows and dominated the whole
    operator: 0.49 Mpx/s).
    """
    spark = tiles.sparkSession
    if isinstance(sun, pd.DataFrame):
        sun_df = spark.createDataFrame(sun)
    else:
        sun_df = sun
    sun_pdf = sun_df.select("scene_id", "azimuth_deg", "altitude_deg") \
                    .toPandas()
    if sun_pdf.scene_id.duplicated().any():
        raise ValueError("one sun position per scene")
    if ((sun_pdf.altitude_deg <= 0) | (sun_pdf.altitude_deg > 90)).any():
        raise ValueError("altitude_deg must be in (0, 90]")
    sun_b = spark.sparkContext.broadcast(
        {r.scene_id: (float(r.azimuth_deg), float(r.altitude_deg))
         for r in sun_pdf.itertuples()})

    nom = tiles.agg(F.max("w").alias("w"), F.max("h").alias("h")).first()
    nom_w, nom_h = int(nom["w"]), int(nom["h"])

    def emit_segments(batches: Iterator[pa.RecordBatch]) \
            -> Iterator[pa.RecordBatch]:
        for batch in batches:
            cols: dict[str, list] = {f.name: [] for f in _SUN_SEG_SCHEMA}
            ap = {k: v.append for k, v in cols.items()}
            for row in _batch_rows(batch):
                pos = sun_b.value.get(row.scene_id)
                if pos is None:
                    continue
                ca = math.cos(math.radians(pos[0] % 360.0))
                sa = math.sin(math.radians(pos[0] % 360.0))
                w, h = int(row.w), int(row.h)
                tx0 = int(row.tile_x) * nom_w
                ty0 = int(row.tile_y) * nom_h
                plane = codecs.decode_f32bt(getattr(row, src_col), w, h)
                sid = row.scene_id
                # per-cell bucket exactly as the scan recomputes it:
                # strip = floor(gx*ca + gy*sa), bkt = strip // _SUN_BKT
                # (floor-div of the int strip == floor(strip/_SUN_BKT));
                # the outer-sum form below produces the same per-cell
                # gx*ca + gy*sa values elementwise. Strip is monotone in
                # gx along a row, so equal-bkt runs are contiguous; one
                # row-major cut pass finds every (row, bkt) segment.
                gx = tx0 + np.arange(w, dtype=np.int64)
                gy = ty0 + np.arange(h, dtype=np.int64)
                p = gy[:, None] * sa + gx[None, :] * ca
                bkt = np.floor(p).astype(np.int64) // _SUN_BKT
                flat = bkt.ravel()
                rowid = np.repeat(np.arange(h), w)
                row_ok = np.isfinite(plane).any(axis=1)
                newseg = np.r_[True, (flat[1:] != flat[:-1])
                               | (rowid[1:] != rowid[:-1])]
                starts = np.flatnonzero(newseg)
                keepseg = row_ok[rowid[starts]]
                starts = starts[keepseg]
                if not len(starts):
                    continue
                ends_all = np.r_[np.flatnonzero(newseg)[1:], h * w]
                ends = ends_all[keepseg]
                seg_bkt = flat[starts]
                seg_gy = gy[rowid[starts]]
                seg_gx0 = gx[starts % w]
                zflat = plane.ravel()
                for i in range(len(starts)):
                    ap["scene_id"](sid)
                    ap["bkt"](int(seg_bkt[i]))
                    ap["gy"](int(seg_gy[i]))
                    ap["gx0"](int(seg_gx0[i]))
                    ap["z_bytes"](
                        zflat[starts[i]:ends[i]].astype("<f4").tobytes())
            if cols["scene_id"]:
                yield _batch_from_cols(cols, _SUN_SEG_SCHEMA)

    segs = tiles.select("scene_id", "tile_x", "tile_y", "w", "h", src_col) \
        .mapInArrow(emit_segments, _SUN_SEG_SCHEMA)

    def scan_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(pdf):
            return pd.DataFrame(columns=[f.name for f in _SHADOW_SCHEMA])
        sid = pdf.scene_id.iloc[0]
        pos = sun_b.value.get(sid)
        du, dv, tanalt = _sun_vectors(*pos)
        ca = math.cos(math.radians(pos[0] % 360.0))
        sa = math.sin(math.radians(pos[0] % 360.0))
        # rebuild the per-cell arrays from the row segments
        zs = [np.frombuffer(b, dtype="<f4") for b in pdf.z_bytes]
        lens = np.array([len(a) for a in zs])
        z = np.concatenate(zs).astype(np.float64)
        gx = (np.repeat(pdf.gx0.to_numpy(np.int64), lens)
              + _runs_arange(lens))
        gy = np.repeat(pdf.gy.to_numpy(np.int64), lens)
        keep = np.isfinite(z)
        gx, gy, z = gx[keep], gy[keep], z[keep]
        if not len(z):
            return pd.DataFrame(columns=[f.name for f in _SHADOW_SCHEMA])
        # same formulas/dtypes as the whole-plane spec: int64 coords into
        # float64 products
        s = gx * du + gy * dv
        q = z - s * tanalt
        strip = np.floor(gx * ca + gy * sa).astype(np.int64)
        # ONE stable lexsort for the whole bucket: strip ascending, s
        # descending within a strip — each strip then scans as its own
        # contiguous slice, exactly the per-strip argsort(-s, mergesort)
        # of the serial spec
        order = np.lexsort((-s, strip))
        st_o, s_o, q_o = strip[order], s[order], q[order]
        # tie groups = runs of equal s within a strip; the serial walk
        # treats them atomically (group members never shade each other),
        # so the vectorized form compares each group against the running
        # max of STRICTLY-PRIOR groups — identical comparisons, no fp
        # accumulation anywhere (max and < are exact)
        new_strip = np.r_[True, st_o[1:] != st_o[:-1]]
        new_group = new_strip | np.r_[True, s_o[1:] != s_o[:-1]]
        starts = np.flatnonzero(new_group)
        gmax = np.maximum.reduceat(q_o, starts)
        runbefore = np.empty(len(starts))
        gs = np.flatnonzero(new_strip[starts])   # first group of each strip
        bounds = np.r_[gs, len(starts)]
        for a, b in zip(bounds[:-1], bounds[1:]):
            runbefore[a] = -np.inf
            if b - a > 1:
                runbefore[a + 1:b] = np.maximum.accumulate(gmax[a:b - 1])
        sizes = np.diff(np.r_[starts, len(q_o)])
        shaded = q_o < np.repeat(runbefore, sizes)
        sel = np.flatnonzero(shaded)
        if not len(sel):
            return pd.DataFrame(columns=[f.name for f in _SHADOW_SCHEMA])
        sgx, sgy = gx[order][sel], gy[order][sel]
        # pack the shaded set as one bitmap row per tile (nom grid, row-
        # major ly * nom_w + lx, np.packbits bit order) — the per-cell
        # row form was O(shaded) small rows through collect_list and a
        # Python list per cell in the assembly kernel
        tx = sgx // nom_w
        ty = sgy // nom_h
        bit = (sgy - ty * nom_h) * nom_w + (sgx - tx * nom_w)
        torder = np.lexsort((bit, ty, tx))
        tx, ty, bit = tx[torder], ty[torder], bit[torder]
        tstarts = np.flatnonzero(
            np.r_[True, (tx[1:] != tx[:-1]) | (ty[1:] != ty[:-1])])
        tends = np.r_[tstarts[1:], len(tx)]
        out_tx, out_ty, out_mask = [], [], []
        nbits = nom_w * nom_h
        for a, b in zip(tstarts, tends):
            m = np.zeros(nbits, dtype=np.uint8)
            m[bit[a:b]] = 1
            out_tx.append(int(tx[a]))
            out_ty.append(int(ty[a]))
            out_mask.append(np.packbits(m).tobytes())
        return pd.DataFrame({
            "scene_id": np.full(len(out_tx), sid, dtype=object),
            "tile_x": np.array(out_tx, dtype=np.int32),
            "tile_y": np.array(out_ty, dtype=np.int32),
            "mask_bytes": out_mask})

    shadows = segs.groupBy("scene_id", "bkt").applyInPandas(
        lambda key, pdf: scan_bucket(pdf), _SHADOW_SCHEMA)

    from .pipeline import halo_plane_tiles
    src = tiles
    if "image_id" not in tiles.columns:
        src = tiles.withColumn("image_id", F.lit(""))
    pad = halo_plane_tiles(src, r=1, src_col=src_col) \
        .select("scene_id", "tile_x", "tile_y", "w", "h", "pad_bytes")
    # shaded bitmaps collapse to ONE short list per tile (<= one 2 KB mask
    # per strip bucket the tile intersects) BEFORE meeting the plane bytes
    sh_tile = shadows.groupBy("scene_id", "tile_x", "tile_y").agg(
        F.collect_list("mask_bytes").alias("sh_masks"))
    # the join output is already exactly one row per tile, so the assembly
    # kernel is a mapInArrow — the old groupBy+applyInPandas re-shuffled
    # the pad planes a second time for nothing
    joined = pad.join(sh_tile, on=["scene_id", "tile_x", "tile_y"],
                      how="left")

    def build(batches: Iterator[pa.RecordBatch]) \
            -> Iterator[pa.RecordBatch]:
        from .kernels import slope_aspect

        for batch in batches:
            cols: dict[str, list] = {f.name: [] for f in SUN_SCHEMA}
            ap = {k: v.append for k, v in cols.items()}
            for row in _batch_rows(batch):
                pos = sun_b.value.get(row.scene_id)
                w, h = int(row.w), int(row.h)
                ap["scene_id"](row.scene_id)
                ap["tile_x"](int(row.tile_x)); ap["tile_y"](int(row.tile_y))
                ap["w"](w); ap["h"](h)
                if pos is None:
                    glob = np.full((h, w), np.nan, dtype=np.float32)
                    ap["glob_bytes"](glob.tobytes())
                    ap["n_shaded"](0); ap["n_valid"](0)
                    continue
                az, altd = pos
                alt = math.radians(altd)
                pad_p = np.frombuffer(row.pad_bytes, dtype="<f4") \
                    .reshape(h + 2, w + 2).astype(np.float64)
                g = slope_aspect(pad_p)
                sl = np.radians(g["slope_deg"][1:-1, 1:-1])
                asp = np.radians(np.nan_to_num(g["aspect_deg"][1:-1, 1:-1]))
                lit = np.ones((h, w), dtype=bool)
                masks = row.sh_masks
                if masks is not None and len(masks):
                    acc = np.frombuffer(masks[0], dtype=np.uint8)
                    for mb in masks[1:]:
                        acc = acc | np.frombuffer(mb, dtype=np.uint8)
                    shaded = np.unpackbits(acc, count=nom_w * nom_h) \
                        .reshape(nom_h, nom_w)[:h, :w]
                    lit &= shaded == 0
                m = 1.0 / math.sin(alt)                      # air mass
                beam = SOLAR_CONSTANT * 0.75 ** (m ** 0.678)  # Meinel
                azr = math.radians(az % 360.0)
                with np.errstate(invalid="ignore"):
                    cosi = (math.sin(alt) * np.cos(sl)
                            + math.cos(alt) * np.sin(sl) * np.cos(azr - asp))
                    direct = beam * np.clip(cosi, 0.0, None) * lit
                    diffuse = (SOLAR_CONSTANT * _DIFFUSE_FRAC
                               * math.sin(alt) * (1.0 + np.cos(sl)) / 2.0)
                    glob = (direct + diffuse).astype(np.float32)
                glob[np.isnan(sl)] = np.nan
                valid = np.isfinite(glob)
                ap["glob_bytes"](glob.tobytes())
                ap["n_shaded"](int((~lit & valid).sum()))
                ap["n_valid"](int(valid.sum()))
            if cols["scene_id"]:
                yield _batch_from_cols(cols, SUN_SCHEMA)

    return joined.mapInArrow(build, SUN_SCHEMA)


# --------------------------------------------------------------------------
# Cumulative multi-observer viewshed (visibility coverage counts)
# --------------------------------------------------------------------------

_MCELL_SCHEMA = StructType([
    StructField("scene_id", StringType()),
    StructField("obs_id", StringType()),
    StructField("sector", IntegerType()),
    StructField("gx", IntegerType()),
    StructField("gy", IntegerType()),
    StructField("z", DoubleType()),
    StructField("is_target", IntegerType()),
])

_SEEN_SCHEMA = StructType([
    StructField("scene_id", StringType()),
    StructField("gx", IntegerType()),
    StructField("gy", IntegerType()),
    StructField("n_seen", LongType()),
])

VIEWSHED_COUNT_SCHEMA = StructType([
    StructField("scene_id", StringType()),
    StructField("tile_x", IntegerType()),
    StructField("tile_y", IntegerType()),
    StructField("w", IntegerType()),
    StructField("h", IntegerType()),
    StructField("count_bytes", BinaryType()),  # f32: observers seeing the
    StructField("n_covered", LongType()),      # cell; NaN = NaN terrain
    StructField("n_evaluated", LongType()),
])


def viewshed_count_tiles(tiles: DataFrame, observers,
                         obs_height: float = 1.75,
                         max_dist: float | None = None,
                         n_sectors: int = 256,
                         src_col: str = "lst_bytes") -> DataFrame:
    """Cumulative viewshed over MANY observers per scene (the r.viewshed
    coverage-analysis composite, GRASS addon r.viewshed.cva): per cell, how
    many observers see it, under exactly `viewshed_tiles`' R3 semantics per
    observer. ``observers``: (scene_id, obs_id, ox, oy).

    Work is inherently O(sum over observers of their in-radius cells) —
    every observer needs its own rays — so ``max_dist`` is the scale knob
    exactly as in GRASS CVA studies; the sector decomposition bounds the
    per-task state the same way as the single-observer path. The count
    regroup carries one row per VISIBLE (cell, observer) pair collapsed by
    a map-side-combining SUM, so the final exchange is O(covered cells).

    Output planes are f32 counts (0 = evaluated, never seen; NaN = NaN
    terrain). A cell outside every observer's radius counts 0 — it is
    still evaluated terrain (n_evaluated counts finite cells, matching
    the sum over observers' n_evaluated only when radii cover the scene).
    """
    spark = tiles.sparkSession
    if isinstance(observers, pd.DataFrame):
        obs_pdf = observers
    else:
        obs_pdf = observers.toPandas()
    if obs_pdf[["scene_id", "obs_id"]].duplicated().any():
        raise ValueError("duplicate (scene_id, obs_id)")
    two_pi = 2.0 * math.pi

    nom = tiles.agg(F.max("w").alias("w"), F.max("h").alias("h")).first()
    nom_w, nom_h = int(nom["w"]), int(nom["h"])

    by_scene: dict[str, list] = {}
    for r in obs_pdf.itertuples():
        by_scene.setdefault(r.scene_id, []).append(
            (str(r.obs_id), float(r.ox), float(r.oy)))
    obs_b = spark.sparkContext.broadcast(by_scene)

    def emit(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            for row in _batch_rows(batch):
                olist = obs_b.value.get(row.scene_id)
                if not olist:
                    continue
                w, h = int(row.w), int(row.h)
                tx0, ty0 = int(row.tile_x) * nom_w, int(row.tile_y) * nom_h
                plane = codecs.decode_f32bt(
                    getattr(row, src_col), w, h).astype(np.float64)
                yy, xx = np.mgrid[0:h, 0:w]
                gx0 = (tx0 + xx).ravel()
                gy0 = (ty0 + yy).ravel()
                z0 = plane.ravel()
                for obs_id, oxx, oyy in olist:
                    rx = gx0 - oxx
                    ry = gy0 - oyy
                    r = np.hypot(rx, ry)
                    if max_dist is not None:
                        keep = r <= max_dist + 1.5
                        if not keep.any():
                            continue
                        gx, gy, z, rxx, ryy, rr = (a[keep] for a in
                                                   (gx0, gy0, z0, rx, ry, r))
                        tgt_ok = rr <= max_dist
                    else:
                        gx, gy, z, rxx, ryy, rr = gx0, gy0, z0, rx, ry, r
                        tgt_ok = np.ones(len(rr), dtype=bool)
                    ang = np.arctan2(ryy, rxx)
                    ctr = (np.floor((ang + math.pi) / two_pi * n_sectors)
                           .astype(np.int64) % n_sectors)
                    near = rr <= 2.5
                    with np.errstate(invalid="ignore", divide="ignore"):
                        half = np.arcsin(np.clip(
                            1.5 * math.sqrt(2.0) / np.maximum(rr, 1e-9),
                            0, 1.0))
                    s_lo = np.floor((ang - half + math.pi) / two_pi
                                    * n_sectors).astype(np.int64)
                    s_hi = np.floor((ang + half + math.pi) / two_pi
                                    * n_sectors).astype(np.int64)
                    span = np.minimum(s_hi - s_lo + 1, n_sectors)
                    span = np.where(near, n_sectors, span)
                    base = np.where(near, 0, s_lo)
                    n_out = int(span.sum())
                    if n_out == 0:
                        continue
                    idx = np.repeat(np.arange(len(gx)), span)
                    starts = np.concatenate(([0], np.cumsum(span)[:-1]))
                    off = np.arange(n_out) - np.repeat(starts, span)
                    sec = (np.repeat(base, span) + off) % n_sectors
                    is_t = ((sec == np.repeat(ctr, span))
                            & np.repeat(tgt_ok, span))
                    yield pa.RecordBatch.from_arrays(
                        [pa.array(np.full(n_out, row.scene_id, dtype=object),
                                  pa.string()),
                         pa.array(np.full(n_out, obs_id, dtype=object),
                                  pa.string()),
                         pa.array(sec.astype(np.int32)),
                         pa.array(gx[idx].astype(np.int32)),
                         pa.array(gy[idx].astype(np.int32)),
                         pa.array(z[idx]),
                         pa.array(is_t.astype(np.int32))],
                        names=[f.name for f in _MCELL_SCHEMA])

    cells = tiles.select("scene_id", "tile_x", "tile_y", "w", "h", src_col) \
        .mapInArrow(emit, _MCELL_SCHEMA)

    # eye heights per (scene, observer): decode only the containing tiles
    obs_df = spark.createDataFrame(obs_pdf[["scene_id", "obs_id",
                                            "ox", "oy"]])
    eye_schema = StructType([
        StructField("scene_id", StringType()),
        StructField("obs_id", StringType()),
        StructField("z", DoubleType()),
    ])
    hit = (tiles.select("scene_id", "tile_x", "tile_y", "w", "h", src_col)
           .join(F.broadcast(obs_df), on="scene_id")
           .filter((F.col("tile_x")
                    == F.floor(F.col("ox") / nom_w).cast("int"))
                   & (F.col("tile_y")
                      == F.floor(F.col("oy") / nom_h).cast("int"))))

    def eye_fn(batches: Iterator[pa.RecordBatch]) \
            -> Iterator[pa.RecordBatch]:
        for batch in batches:
            cols: dict[str, list] = {"scene_id": [], "obs_id": [], "z": []}
            for row in _batch_rows(batch):
                w, h = int(row.w), int(row.h)
                lx = int(row.ox) - int(row.tile_x) * nom_w
                ly = int(row.oy) - int(row.tile_y) * nom_h
                if not (0 <= lx < w and 0 <= ly < h):
                    continue
                plane = codecs.decode_f32bt(getattr(row, src_col), w, h)
                cols["scene_id"].append(row.scene_id)
                cols["obs_id"].append(row.obs_id)
                cols["z"].append(float(plane[ly, lx]))
            if cols["scene_id"]:
                yield _batch_from_cols(cols, eye_schema)

    oz = hit.mapInArrow(eye_fn, eye_schema).toPandas()
    eyes = {}
    for r in obs_pdf.itertuples():
        zr = oz[(oz.scene_id == r.scene_id) & (oz.obs_id == str(r.obs_id))]
        if len(zr) == 0 or not np.isfinite(zr.z.iloc[0]):
            raise ValueError(
                f"observer {r.obs_id!r} of scene {r.scene_id!r} is NaN or "
                "outside the raster")
        eyes[(r.scene_id, str(r.obs_id))] = (
            float(r.ox), float(r.oy), float(zr.z.iloc[0]) + float(obs_height))
    eyes_b = spark.sparkContext.broadcast(eyes)

    def run_sector(key, pdf: pd.DataFrame) -> pd.DataFrame:
        scene, obs_id = key[0], key[1]
        o = eyes_b.value.get((scene, obs_id))
        if o is None:
            return pd.DataFrame(columns=["scene_id", "gx", "gy", "n_seen"])
        ox, oy, eye = o
        zmap = {(int(r.gx), int(r.gy)): float(r.z)
                for r in pdf.itertuples()}
        t = pdf[(pdf.is_target == 1) & np.isfinite(pdf.z)]
        out = []
        for r in t.itertuples():
            if _ray_visible(ox, oy, eye, int(r.gx), int(r.gy),
                            float(r.z), zmap):
                out.append({"scene_id": scene, "gx": int(r.gx),
                            "gy": int(r.gy), "n_seen": 1})
        return pd.DataFrame(out, columns=["scene_id", "gx", "gy", "n_seen"])

    seen = (cells.groupBy("scene_id", "obs_id", "sector")
            .applyInPandas(run_sector, _SEEN_SCHEMA)
            .groupBy("scene_id", "gx", "gy")
            .agg(F.sum("n_seen").alias("n_seen")))

    layout = tiles.select("scene_id", "tile_x", "tile_y", "w", "h", src_col)
    # collapse seen cells to ONE array row per tile before meeting the
    # plane bytes (never join per-cell rows against a 65 KB payload)
    keyed = (seen.withColumn(
        "tile_x", (F.col("gx") / nom_w).cast("int"))
        .withColumn("tile_y", (F.col("gy") / nom_h).cast("int"))
        .groupBy("scene_id", "tile_x", "tile_y")
        .agg(F.collect_list(F.array("gx", "gy", "n_seen"))
             .alias("seen_cells")))
    joined = layout.join(keyed, on=["scene_id", "tile_x", "tile_y"],
                         how="left")

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        row = pdf.iloc[0]
        w, h = int(row.w), int(row.h)
        plane = codecs.decode_f32bt(getattr(row, src_col), w, h)
        cnt = np.where(np.isfinite(plane), 0.0, np.nan).astype(np.float32)
        cells_ = row.seen_cells
        if cells_ is not None and len(cells_):
            arr = np.asarray([list(c) for c in cells_], dtype=np.int64)
            lx = arr[:, 0] - int(row.tile_x) * nom_w
            ly = arr[:, 1] - int(row.tile_y) * nom_h
            cnt[ly, lx] = arr[:, 2].astype(np.float32)
        valid = np.isfinite(cnt)
        return pd.DataFrame({
            "scene_id": [row.scene_id], "tile_x": [int(row.tile_x)],
            "tile_y": [int(row.tile_y)], "w": [w], "h": [h],
            "count_bytes": [cnt.tobytes()],
            "n_covered": [int((cnt > 0).sum())],
            "n_evaluated": [int(valid.sum())]})

    return joined.groupBy("scene_id", "tile_x", "tile_y").applyInPandas(
        build, VIEWSHED_COUNT_SCHEMA)


# --------------------------------------------------------------------------
# Horizon angle maps (r.horizon analog): per-cell elevation angle of the
# horizon toward each requested azimuth
# --------------------------------------------------------------------------

_HCELL_SCHEMA = StructType([
    StructField("scene_id", StringType()),
    StructField("azimuth", DoubleType()),
    StructField("strip", LongType()),
    StructField("s", DoubleType()),
    StructField("gx", IntegerType()),
    StructField("gy", IntegerType()),
    StructField("z", DoubleType()),
])

_HANG_SCHEMA = StructType([
    StructField("scene_id", StringType()),
    StructField("azimuth", DoubleType()),
    StructField("gx", IntegerType()),
    StructField("gy", IntegerType()),
    StructField("horizon_deg", DoubleType()),
])

HORIZON_SCHEMA = StructType([
    StructField("scene_id", StringType()),
    StructField("azimuth", DoubleType()),
    StructField("tile_x", IntegerType()),
    StructField("tile_y", IntegerType()),
    StructField("w", IntegerType()),
    StructField("h", IntegerType()),
    StructField("horizon_bytes", BinaryType()),  # f32 deg; NaN = NaN cell
    StructField("n_valid", LongType()),          #        or no sunward cell
])


def _horizon_strip_scan(s: np.ndarray, z: np.ndarray) -> np.ndarray:
    """Exact per-cell max elevation angle toward the azimuth within one
    strip: for each cell c, max over cells b with s_b > s_c of
    (z_b - z_c) / (s_b - s_c), as DEGREES of atan; NaN when no strictly
    azimuth-ward cell exists. O(n log n): cells processed in descending s
    keep an upper convex hull of seen points; the slope from a query point
    to hull vertices is unimodal, found by ternary search. Equal-s cells
    never obstruct each other (the sun-shadow convention)."""
    order = np.argsort(-s, kind="mergesort")
    ss, zz = s[order], z[order]
    n = len(ss)
    out = np.full(n, np.nan)
    hx: list[float] = []   # hull s (descending)
    hz: list[float] = []

    def query(sc: float, zc: float) -> float:
        lo, hi = 0, len(hx) - 1
        while hi - lo > 2:
            m1 = lo + (hi - lo) // 3
            m2 = hi - (hi - lo) // 3
            f1 = (hz[m1] - zc) / (hx[m1] - sc)
            f2 = (hz[m2] - zc) / (hx[m2] - sc)
            if f1 < f2:
                lo = m1 + 1
            else:
                hi = m2
        return max((hz[i] - zc) / (hx[i] - sc) for i in range(lo, hi + 1))

    i = 0
    while i < n:
        j = i
        while j < n and ss[j] == ss[i]:
            j += 1
        if hx:
            for k in range(i, j):
                out[k] = math.degrees(math.atan(query(ss[k], zz[k])))
        for k in range(i, j):           # add the group to the upper hull
            sk, zk = float(ss[k]), float(zz[k])
            if hx and hx[-1] == sk:     # same s: keep only the higher point
                if zk <= hz[-1]:
                    continue
                hx.pop(); hz.pop()
            while len(hx) >= 2:
                # pop while the last vertex is under the (prev, new) chord
                # (s descends along the hull, so the cross test flips sign)
                x1, y1, x2, y2 = hx[-2], hz[-2], hx[-1], hz[-1]
                if (y2 - y1) * (sk - x1) >= (zk - y1) * (x2 - x1):
                    hx.pop(); hz.pop()
                else:
                    break
            hx.append(sk); hz.append(zk)
        i = j
    res = np.full(n, np.nan)
    res[order] = out
    return res


def horizon_tiles(tiles: DataFrame, azimuths, src_col: str = "lst_bytes"
                  ) -> DataFrame:
    """r.horizon analog: per-cell horizon ELEVATION ANGLE (signed degrees,
    atan of the max slope to any strictly azimuth-ward cell in the cell's
    parallel-ray strip; NaN for NaN cells and for cells with nothing
    azimuth-ward — the scene-edge cells of that direction) for each
    requested compass azimuth. One output plane row per (scene, azimuth,
    tile).

    Same distributed shape as `sun_tiles`' shadow pass, once per azimuth:
    one decode pass emits (azimuth, strip, cell) small rows, each strip
    runs the exact convex-hull scan, one equi regroup rebuilds planes —
    pixel planes never hash-shuffle. Work is O(azimuths x cells) rows, the
    honest cost of independent directions (GRASS iterates the whole raster
    per direction too)."""
    azs = [float(a) % 360.0 for a in azimuths]
    if len(azs) == 0:
        raise ValueError("horizon_tiles needs at least one azimuth")
    if len(set(azs)) != len(azs):
        raise ValueError("duplicate azimuths")
    nom = tiles.agg(F.max("w").alias("w"), F.max("h").alias("h")).first()
    nom_w, nom_h = int(nom["w"]), int(nom["h"])

    def emit(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            for row in _batch_rows(batch):
                w, h = int(row.w), int(row.h)
                tx0, ty0 = int(row.tile_x) * nom_w, int(row.tile_y) * nom_h
                plane = codecs.decode_f32bt(
                    getattr(row, src_col), w, h).astype(np.float64)
                vv, uu = np.mgrid[0:h, 0:w]
                gx = (tx0 + uu).ravel()
                gy = (ty0 + vv).ravel()
                z = plane.ravel()
                keep = np.isfinite(z)
                if not keep.any():
                    continue
                gx, gy, z = gx[keep], gy[keep], z[keep]
                for az in azs:
                    a = math.radians(az)
                    du, dv = math.sin(a), -math.cos(a)
                    s = gx * du + gy * dv
                    p = gx * math.cos(a) + gy * math.sin(a)
                    yield pa.RecordBatch.from_arrays(
                        [pa.array(np.full(len(gx), row.scene_id,
                                          dtype=object), pa.string()),
                         pa.array(np.full(len(gx), az)),
                         pa.array(np.floor(p).astype(np.int64)),
                         pa.array(s),
                         pa.array(gx.astype(np.int32)),
                         pa.array(gy.astype(np.int32)),
                         pa.array(z)],
                        names=[f.name for f in _HCELL_SCHEMA])

    cells = tiles.select("scene_id", "tile_x", "tile_y", "w", "h", src_col) \
        .mapInArrow(emit, _HCELL_SCHEMA)

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        # strip-BUCKET task hosting many strips (see sun_tiles: one group
        # per strip drowned in per-group overhead); per-strip results are
        # unchanged
        outs = []
        for _, g in pdf.groupby("strip", sort=False):
            ang = _horizon_strip_scan(g.s.to_numpy(np.float64),
                                      g.z.to_numpy(np.float64))
            outs.append(pd.DataFrame({
                "scene_id": g.scene_id, "azimuth": g.azimuth,
                "gx": g.gx, "gy": g.gy, "horizon_deg": ang}))
        return pd.concat(outs) if outs else pd.DataFrame(
            columns=[f.name for f in _HANG_SCHEMA])

    angles = cells.groupBy(
        "scene_id", "azimuth",
        F.floor(F.col("strip") / 64).alias("strip_bkt")
    ).applyInPandas(lambda key, pdf: scan(pdf), _HANG_SCHEMA)

    layout = tiles.select("scene_id", "tile_x", "tile_y", "w", "h")
    keyed = angles.withColumn(
        "tile_x", (F.col("gx") / nom_w).cast("int")) \
        .withColumn("tile_y", (F.col("gy") / nom_h).cast("int"))
    az_df = tiles.sparkSession.createDataFrame(
        pd.DataFrame({"azimuth": azs}))
    grid = layout.crossJoin(F.broadcast(az_df))
    joined = grid.join(keyed, on=["scene_id", "azimuth", "tile_x", "tile_y"],
                       how="left")

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        row = pdf.iloc[0]
        w, h = int(row.w), int(row.h)
        plane = np.full((h, w), np.nan, dtype=np.float32)
        g = pdf[pdf.gx.notna()]
        if len(g):
            lx = g.gx.astype(int) - int(row.tile_x) * nom_w
            ly = g.gy.astype(int) - int(row.tile_y) * nom_h
            plane[ly, lx] = g.horizon_deg.astype(np.float32)
        return pd.DataFrame({
            "scene_id": [row.scene_id], "azimuth": [float(row.azimuth)],
            "tile_x": [int(row.tile_x)], "tile_y": [int(row.tile_y)],
            "w": [w], "h": [h], "horizon_bytes": [plane.tobytes()],
            "n_valid": [int(np.isfinite(plane).sum())]})

    return joined.groupBy("scene_id", "azimuth", "tile_x", "tile_y") \
        .applyInPandas(build, HORIZON_SCHEMA)

"""Raster -> vector geometry extraction: r.to.vect (area boundaries) and
r.contour (isolines).

Reference: no file can be cited (the /root/reference mount is empty every
round — SURVEY.md §0); the behavioral spec is the published GRASS module
pair applied to this engine's tiled raster model.

**to_vect** (r.to.vect type=area for the thresholded map, the same mask
contract as regions.extract_regions): emits each cross-tile 4-connected
region's boundary as ordered closed rings on the PIXEL-CORNER lattice —
one exterior ring plus one ring per hole. The distributed shape mirrors
extract_regions (whose label fixpoint this reuses):

1. ONE decode+label pass per tile (mapInArrow). Besides the region nodes /
   border cells / probes the label stitch needs, it emits every boundary
   EDGE of the mask: an edge is a pixel side whose 4-neighbor is unmasked.
   Sides interior to the tile resolve locally (kind 3); sides on the tile
   border depend on the NEIGHBOR tile's mask, so they're emitted PENDING
   (kind 4) with the neighbor cell coordinate.
2. Pending edges resolve with one LEFT ANTI equi join against the masked
   border cells: a pending side is a true boundary iff no masked cell sits
   across it (a missing neighbor tile = scene edge = boundary, for free).
3. The min-label fixpoint (regions._cc_min_label) maps each edge's local
   node to its global region id — edges are O(perimeter) rows, pixels
   never shuffle.
4. One groupBy(scene, region) + applyInPandas stitches the directed edges
   into rings. Edges are oriented REGION-ON-THE-RIGHT in y-down raster
   coords, so after the engine's lat1-is-row-0 geocoding flip, exterior
   rings wind CCW in lon/lat (the GIS convention) and holes CW. At a
   checkerboard corner the walk takes the sharpest right turn ("stay on
   pixel"), which never crosses and keeps 4-connectivity semantics.

A region's ring work is O(its perimeter) in ONE task — the same bound the
VERDICT asked for; a 10^9-px region's boundary is typically ~10^5 edges.

**contour_lines** (r.contour): marching squares on the pixel-CENTER grid.
Each tile computes the cells whose top-left pixel it owns, reading right/
bottom neighbors from the engine's generic 1-px halo exchange
(pipeline.halo_plane_tiles) — every cell is computed exactly once scene-
wide, and a shared cell edge gets BIT-IDENTICAL crossing coordinates on
both sides of a tile border (the interpolation reads the same two f32
values), so chains stitch exactly. Isolines come back as ordered
polylines (closed where the contour loops, open where it exits the valid
data region), oriented with the HIGHER side on the left, per (scene,
level) assembled in one applyInPandas task.

Scale shape: both operators decode each tile once, shuffle only
O(perimeter)/O(contour) rows plus the 1-px halo strips, and do all pixel
work inside mapInArrow. No pixel plane ever crosses an exchange.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BooleanType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

from . import codecs
from .pipeline import _batch_from_cols, _batch_rows, halo_plane_tiles
from .regions import _cc_min_label, _pack_node, label_tile

# one pass emits every row kind so each tile is decoded and labeled once:
# kind 0 = local region node, 1 = masked border cell, 2 = across-border
# probe (the extract_regions stitch triple), 3 = resolved boundary edge,
# 4 = pending boundary edge (gx/gy = the neighbor cell it depends on)
_TOVECT_PASS_SCHEMA = StructType([
    StructField("scene_id", StringType()),
    StructField("kind", IntegerType()),
    StructField("node", LongType()),
    StructField("gx", IntegerType()),
    StructField("gy", IntegerType()),
    StructField("x0", IntegerType()),
    StructField("y0", IntegerType()),
    StructField("x1", IntegerType()),
    StructField("y1", IntegerType()),
])

TOVECT_SCHEMA = StructType([
    StructField("scene_id", StringType()),
    StructField("region_id", LongType()),
    StructField("ring_id", IntegerType()),
    StructField("is_hole", BooleanType()),
    StructField("n_vertices", IntegerType()),   # distinct corners (ring is
    StructField("area_px", DoubleType()),       # closed: first == last)
    StructField("ring_x", ArrayType(IntegerType())),
    StructField("ring_y", ArrayType(IntegerType())),
])


def _tovect_pass(tiles: DataFrame, threshold: float, src_col: str,
                 nom_w: int, nom_h: int) -> DataFrame:
    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            cols: dict[str, list] = {f.name: [] for f in _TOVECT_PASS_SCHEMA}
            ap = {k: v.append for k, v in cols.items()}

            def emit(scene, kind, node, gx=0, gy=0, x0=0, y0=0, x1=0, y1=0):
                ap["scene_id"](scene); ap["kind"](int(kind))
                ap["node"](int(node)); ap["gx"](int(gx)); ap["gy"](int(gy))
                ap["x0"](int(x0)); ap["y0"](int(y0))
                ap["x1"](int(x1)); ap["y1"](int(y1))

            def emit_edges(scene, nodes, X, Y, side, pend, pgx=None, pgy=None):
                """Vectorized append of one side's edges for pixels at scene
                coords (X, Y) with packed labels ``nodes``. Directed
                region-on-the-right (y-down): top L->R, right T->B,
                bottom R->L, left B->T."""
                if side == "top":
                    xy = (X, Y, X + 1, Y)
                elif side == "bottom":
                    xy = (X + 1, Y + 1, X, Y + 1)
                elif side == "left":
                    xy = (X, Y + 1, X, Y)
                else:                           # right
                    xy = (X + 1, Y, X + 1, Y + 1)
                kind = 4 if pend else 3
                gxs = pgx if pend else np.zeros_like(X)
                gys = pgy if pend else np.zeros_like(Y)
                for i in range(len(nodes)):
                    emit(scene, kind, nodes[i], gxs[i], gys[i],
                         xy[0][i], xy[1][i], xy[2][i], xy[3][i])

            for row in _batch_rows(batch):
                w, h = int(row.w), int(row.h)
                tx, ty = int(row.tile_x), int(row.tile_y)
                plane = codecs.decode_f32bt(
                    getattr(row, src_col), w, h).astype(np.float64)
                mask = np.isfinite(plane) & (plane > threshold)
                if not mask.any():
                    continue
                labels, n = label_tile(mask)
                ox, oy = tx * nom_w, ty * nom_h   # nominal: ragged-safe

                # region nodes (kind 0)
                for nd in _pack_node(tx, ty, np.arange(n)):
                    emit(row.scene_id, 0, nd)

                # masked border cells + probes (kinds 1/2) — the stitch
                # triple, same shape as regions._extract_pass
                sides = (
                    (labels[0, :], np.arange(w), np.zeros(w, np.int64), 0, -1),
                    (labels[h - 1, :], np.arange(w),
                     np.full(w, h - 1, np.int64), 0, 1),
                    (labels[:, 0], np.zeros(h, np.int64), np.arange(h), -1, 0),
                    (labels[:, w - 1], np.full(h, w - 1, np.int64),
                     np.arange(h), 1, 0),
                )
                for slab, xs, ys, dx, dy in sides:
                    sm = slab >= 0
                    if not sm.any():
                        continue
                    snode = _pack_node(tx, ty, slab[sm])
                    for gx, gy, nd in zip(ox + xs[sm], oy + ys[sm], snode):
                        emit(row.scene_id, 1, nd, gx=gx, gy=gy)
                        emit(row.scene_id, 2, nd, gx=gx + dx, gy=gy + dy)

                # ---- boundary edges ----
                # interior sides (both pixels in this tile) resolve locally
                for b in ("top", "bottom", "left", "right"):
                    nb = np.zeros_like(mask)
                    if b == "top":
                        nb[1:, :] = mask[1:, :] & ~mask[:-1, :]
                    elif b == "bottom":
                        nb[:-1, :] = mask[:-1, :] & ~mask[1:, :]
                    elif b == "left":
                        nb[:, 1:] = mask[:, 1:] & ~mask[:, :-1]
                    else:
                        nb[:, :-1] = mask[:, :-1] & ~mask[:, 1:]
                    yy, xx = np.nonzero(nb)
                    if len(yy):
                        emit_edges(row.scene_id,
                                   _pack_node(tx, ty, labels[yy, xx]),
                                   ox + xx, oy + yy, b, pend=False)

                # tile-border sides: scene edge (no neighbor possible) is a
                # definite boundary; otherwise pending on the neighbor cell
                edge_specs = (
                    ("top", mask[0, :], np.arange(w),
                     np.zeros(w, np.int64), 0, -1, ty == 0),
                    ("bottom", mask[h - 1, :], np.arange(w),
                     np.full(w, h - 1, np.int64), 0, 1, False),
                    ("left", mask[:, 0], np.zeros(h, np.int64),
                     np.arange(h), -1, 0, tx == 0),
                    ("right", mask[:, w - 1], np.full(h, w - 1, np.int64),
                     np.arange(h), 1, 0, False),
                )
                for side, sm, xs, ys, dx, dy, definite in edge_specs:
                    idx = np.nonzero(sm)[0]
                    if not len(idx):
                        continue
                    xs_, ys_ = xs[idx], ys[idx]
                    nodes = _pack_node(tx, ty, labels[ys_, xs_])
                    if definite:
                        emit_edges(row.scene_id, nodes, ox + xs_, oy + ys_,
                                   side, pend=False)
                    else:
                        emit_edges(row.scene_id, nodes, ox + xs_, oy + ys_,
                                   side, pend=True,
                                   pgx=ox + xs_ + dx, pgy=oy + ys_ + dy)
            if cols["scene_id"]:
                yield _batch_from_cols(cols, _TOVECT_PASS_SCHEMA)

    return tiles.mapInArrow(fn, _TOVECT_PASS_SCHEMA)


# walk directions, clockwise on a y-down screen: E, S, W, N
_DIRS = ((1, 0), (0, 1), (-1, 0), (0, -1))


def _dir_of(x0, y0, x1, y1) -> int:
    return _DIRS.index((int(np.sign(x1 - x0)), int(np.sign(y1 - y0))))


def _assemble_rings(pdf: pd.DataFrame) -> pd.DataFrame:
    """Stitch one region's directed boundary edges into closed rings.
    Deterministic regardless of row order: edges sort canonically, every
    walk starts from the smallest unused edge, and a checkerboard vertex
    takes the sharpest right turn (region stays on the right)."""
    scene = pdf["scene_id"].iloc[0]
    region = int(pdf["region_id"].iloc[0])
    e = pdf[["x0", "y0", "x1", "y1"]].to_numpy(dtype=np.int64)
    e = e[np.lexsort((e[:, 3], e[:, 2], e[:, 1], e[:, 0]))]
    # tail-vertex -> direction -> edge index (one edge per (vertex, dir):
    # boundary edges are unique by construction)
    out: dict[tuple[int, int], dict[int, int]] = {}
    for i, (x0, y0, x1, y1) in enumerate(e):
        out.setdefault((x0, y0), {})[_dir_of(x0, y0, x1, y1)] = i
    used = np.zeros(len(e), dtype=bool)
    rings = []
    for start in range(len(e)):
        if used[start]:
            continue
        verts: list[tuple[int, int]] = [(int(e[start, 0]), int(e[start, 1]))]
        i = start
        area2 = 0
        while True:
            used[i] = True
            x0, y0, x1, y1 = (int(v) for v in e[i])
            area2 += x0 * y1 - x1 * y0
            d = _dir_of(x0, y0, x1, y1)
            if len(verts) >= 2 and _dir_of(*verts[-2], x0, y0) == d:
                verts[-1] = (x1, y1)          # collinear: extend last edge
            else:
                verts.append((x1, y1))
            cand = out.get((x1, y1), {})
            nxt = None
            for turn in (1, 0, 3):            # right, straight, left
                j = cand.get((d + turn) % 4)
                if j is not None and not used[j]:
                    nxt = j
                    break
            if nxt is None:
                break
            i = nxt
        # the walk can only stop at the start vertex (every vertex has
        # balanced in/out degree within a region)
        assert verts[-1] == verts[0], \
            f"open ring in region {region} at {verts[-1]}"
        # drop a collinear seam across the closing vertex
        if len(verts) >= 3 and _dir_of(*verts[-2], *verts[-1]) == \
                _dir_of(*verts[0], *verts[1]):
            verts = verts[1:-1] + [verts[1]]
        # canonical rotation: smallest vertex first
        body = verts[:-1]
        k = min(range(len(body)), key=lambda j: body[j])
        body = body[k:] + body[:k]
        rings.append((area2, body + [body[0]]))
    # exterior ring(s) first (positive shoelace under region-on-right,
    # y-down), then holes; deterministic order by start vertex
    rings.sort(key=lambda r: (-(r[0] > 0), r[1][0]))
    rows = []
    for rid, (area2, verts) in enumerate(rings):
        rows.append({
            "scene_id": scene, "region_id": region, "ring_id": rid,
            "is_hole": bool(area2 < 0), "n_vertices": len(verts) - 1,
            "area_px": abs(area2) / 2.0,
            "ring_x": [v[0] for v in verts],
            "ring_y": [v[1] for v in verts],
        })
    return pd.DataFrame(rows)


def _assemble_ring_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
    """Run `_assemble_rings` for every region in one bucket group."""
    outs = [_assemble_rings(grp)
            for _rid, grp in pdf.groupby("region_id", sort=True)]
    return (pd.concat(outs, ignore_index=True) if outs
            else pd.DataFrame(columns=[f.name for f in TOVECT_SCHEMA]))


def to_vect(tiles: DataFrame, threshold: float,
            src_col: str = "lst_bytes") -> DataFrame:
    """r.to.vect type=area over the thresholded plane (mask contract
    identical to extract_regions: finite AND > threshold): one row per
    boundary ring of each cross-tile 4-connected region, rings closed
    (first vertex repeated last) on the scene pixel-corner lattice.

    GRASS r.to.vect vectorizes every category of an integer map; this
    engine's primitive is the thresholded mask — category maps vectorize
    as reclass-to-binary per class + to_vect, same as extract_regions.
    """
    from pyspark import StorageLevel

    nom = tiles.agg(F.max("w").alias("w"), F.max("h").alias("h")).first()
    nom_w, nom_h = int(nom["w"]), int(nom["h"])
    ex = _tovect_pass(tiles, threshold, src_col, nom_w, nom_h) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    try:
        nodes = ex.filter("kind = 0").select("scene_id",
                                             F.col("node").alias("v"))
        cells = ex.filter("kind = 1").select("scene_id", "gx", "gy", "node")
        probes = (ex.filter("kind = 2")
                  .select("scene_id", "gx", "gy", F.col("node").alias("pnode")))
        stitched = (
            probes.join(cells, on=["scene_id", "gx", "gy"])
            .filter(F.col("pnode") != F.col("node"))
            .select("scene_id", F.col("pnode").alias("v"),
                    F.col("node").alias("u"))
            .localCheckpoint()
        )
        edges_cc = stitched.unionAll(
            stitched.select("scene_id", F.col("u").alias("v"),
                            F.col("v").alias("u")))
        lab = _cc_min_label(nodes, edges_cc)

        resolved = ex.filter("kind = 3") \
            .select("scene_id", "node", "x0", "y0", "x1", "y1")
        pending = (
            ex.filter("kind = 4")
            .join(cells.select("scene_id", "gx", "gy"),
                  on=["scene_id", "gx", "gy"], how="left_anti")
            .select("scene_id", "node", "x0", "y0", "x1", "y1")
        )
        bedges = (
            resolved.unionAll(pending)
            .join(lab.withColumnRenamed("v", "node"), on=["scene_id", "node"])
            .select("scene_id", F.col("label").alias("region_id"),
                    "x0", "y0", "x1", "y1")
        )
        # assemble rings per REGION BUCKET, not per region: one
        # FlatMapGroupsInPandas group costs ~3.5 ms of arrow/pandas setup,
        # so per-region groups ran a 4.3k-region scene in ~16 s on ONE
        # AQE-coalesced task; a bucket hosts many regions (each still
        # walked independently — identical rows out) and the explicit
        # modulus keeps the group count scale-adaptive
        nbkt = max(tiles.sparkSession.sparkContext.defaultParallelism, 1) * 4
        out = (bedges.groupBy(
                   "scene_id",
                   F.pmod(F.col("region_id"), F.lit(nbkt)).alias("rbkt"))
               .applyInPandas(lambda _k, pdf: _assemble_ring_bucket(pdf),
                              TOVECT_SCHEMA)
               .localCheckpoint())   # materialize before unpersisting base
        return out
    finally:
        ex.unpersist()


def rings_to_lonlat(rings: DataFrame, scene_geom: DataFrame,
                    nom_w: int, nom_h: int,
                    x_col: str = "ring_x", y_col: str = "ring_y",
                    xtype: str = "corner") -> DataFrame:
    """Geocode lattice rings/lines to lon/lat ring_x/ring_y arrays (the
    aoi_rings_df fixture shape, so to_vect output feeds pip_join_cells /
    aoi_measures directly). ``scene_geom`` is the tiny per-scene geometry
    table (scene_id, lon0, lat0, lon1, lat1, ntx, nty); lat1 is row 0 (the
    engine-wide convention). ``xtype='corner'`` maps integer lattice
    corners; ``'center'`` maps pixel-center coords (contours) — both are
    the same affine, corners just land on grid lines. Broadcast join +
    Catalyst transform, no Python in the row path."""
    if xtype not in ("corner", "center"):
        raise ValueError(f"xtype must be corner|center, got {xtype!r}")
    # same affine for both: contour coords already carry the +0.5 center
    # offset, to_vect corners land exactly on grid lines
    g = scene_geom.select(
        "scene_id",
        ((F.col("lon1") - F.col("lon0"))
         / (F.col("ntx") * F.lit(float(nom_w)))).alias("_sx"),
        ((F.col("lat1") - F.col("lat0"))
         / (F.col("nty") * F.lit(float(nom_h)))).alias("_sy"),
        F.col("lon0").alias("_lon0"), F.col("lat1").alias("_lat1"))
    j = rings.join(F.broadcast(g), on="scene_id")
    sx, sy = F.col("_sx"), F.col("_sy")
    lon0, lat1 = F.col("_lon0"), F.col("_lat1")
    return (j.withColumn(
                "lonlat_x",
                F.transform(x_col, lambda v: lon0 + v.cast("double") * sx))
             .withColumn(
                "lonlat_y",
                F.transform(y_col, lambda v: lat1 - v.cast("double") * sy))
             .drop("_sx", "_sy", "_lon0", "_lat1"))


# --------------------------------------------------------------------------
# r.contour: marching-squares isolines on the pixel-center grid
# --------------------------------------------------------------------------

_SEG_SCHEMA = StructType([
    StructField("scene_id", StringType()),
    StructField("level", DoubleType()),
    StructField("x0", DoubleType()),     # scene pixel-CENTER coords
    StructField("y0", DoubleType()),
    StructField("x1", DoubleType()),
    StructField("y1", DoubleType()),
])

CONTOUR_SCHEMA = StructType([
    StructField("scene_id", StringType()),
    StructField("level", DoubleType()),
    StructField("line_id", IntegerType()),
    StructField("closed", BooleanType()),
    StructField("n_vertices", IntegerType()),
    StructField("length_px", DoubleType()),
    StructField("xs", ArrayType(DoubleType())),
    StructField("ys", ArrayType(DoubleType())),
])

# Per marching-squares case (bit k set = corner k ABOVE the level; corners
# ordered 00, 10, 11, 01 = TL, TR, BR, BL), the directed crossings as
# (entry edge, exit edge) with the HIGH side on the LEFT of travel.
# Edges: 0 = top (TL-TR), 1 = right (TR-BR), 2 = bottom (BL-BR),
# 3 = left (TL-BL). Saddles (cases 5/10) emit two segments, resolved by
# the center average (the standard asymptotic decider, deterministic).
_MS_SEGMENTS: dict[int, tuple[tuple[int, int], ...]] = {
    1: ((3, 0),), 2: ((0, 1),), 3: ((3, 1),), 4: ((1, 2),),
    6: ((0, 2),), 7: ((3, 2),), 8: ((2, 3),), 9: ((2, 0),),
    11: ((2, 1),), 12: ((1, 3),), 13: ((1, 0),), 14: ((0, 3),),
}


def _edge_point(edge: int, t_top: float, t_right: float, t_bottom: float,
                t_left: float) -> tuple[float, float]:
    if edge == 0:
        return (t_top, 0.0)
    if edge == 1:
        return (1.0, t_right)
    if edge == 2:
        return (t_bottom, 1.0)
    return (0.0, t_left)


def _contour_pass(padded: DataFrame, levels: Sequence[float],
                  nom_w: int, nom_h: int) -> DataFrame:
    lv = [float(x) for x in levels]

    # (entry, exit) edge ids per non-saddle case, as dense lookup tables
    _ein = np.full(16, -1, dtype=np.int64)
    _eout = np.full(16, -1, dtype=np.int64)
    for _c, _segs in _MS_SEGMENTS.items():
        _ein[_c], _eout[_c] = _segs[0]

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            acc: dict[str, list] = {f.name: [] for f in _SEG_SCHEMA}
            for row in _batch_rows(batch):
                w, h = int(row.w), int(row.h)
                tx, ty = int(row.tile_x), int(row.tile_y)
                pad = np.frombuffer(row.pad_bytes, dtype="<f4") \
                    .reshape(h + 2, w + 2).astype(np.float64)
                # cells owned here: top-left pixel center in this tile.
                # corner planes, each (h, w): TL = the tile itself
                v00 = pad[1:-1, 1:-1]
                v10 = pad[1:-1, 2:]
                v01 = pad[2:, 1:-1]
                v11 = pad[2:, 2:]
                finite = (np.isfinite(v00) & np.isfinite(v10)
                          & np.isfinite(v01) & np.isfinite(v11))
                if not finite.any():
                    continue
                ox, oy = tx * nom_w + 0.5, ty * nom_h + 0.5
                for L in lv:
                    with np.errstate(invalid="ignore"):
                        case = ((v00 >= L).astype(np.int8)
                                + (v10 >= L).astype(np.int8) * 2
                                + (v11 >= L).astype(np.int8) * 4
                                + (v01 >= L).astype(np.int8) * 8)
                    yy, xx = np.nonzero(finite & (case > 0) & (case < 15))
                    if not len(yy):
                        continue
                    c = case[yy, xx].astype(np.int64)
                    a = v00[yy, xx]
                    b_ = v10[yy, xx]
                    cc = v11[yy, xx]
                    d = v01[yy, xx]
                    # interpolation along each edge — the same four
                    # expressions the scalar walk evaluated per cell,
                    # now elementwise (only edges with a sign change are
                    # ever SELECTED below, exactly as before)
                    with np.errstate(divide="ignore", invalid="ignore"):
                        t_top = (L - a) / (b_ - a)
                        t_right = (L - b_) / (cc - b_)
                        t_bottom = (L - d) / (cc - d)
                        t_left = (L - a) / (d - a)
                    ones = np.ones(len(c))
                    zeros = np.zeros(len(c))
                    px_of = (t_top, ones, t_bottom, zeros)
                    py_of = (zeros, t_right, ones, t_left)
                    sad = (c == 5) | (c == 10)
                    # first/second segment edge pairs: non-saddles from
                    # the case table (second unused); saddles from the
                    # center-average decider (same truth table as the
                    # scalar branch)
                    with np.errstate(invalid="ignore"):
                        chigh = (a + b_ + cc + d) / 4.0 >= L
                    is5 = c == 5
                    e1i = np.where(sad, np.where(is5,
                                                 np.where(chigh, 1, 3),
                                                 np.where(chigh, 0, 0)),
                                   _ein[c])
                    e1o = np.where(sad, np.where(is5,
                                                 np.where(chigh, 0, 0),
                                                 np.where(chigh, 3, 1)),
                                   _eout[c])
                    e2i = np.where(is5, np.where(chigh, 3, 1),
                                   np.where(chigh, 2, 2))
                    e2o = np.where(is5, np.where(chigh, 2, 2),
                                   np.where(chigh, 1, 3))
                    # segment 1 for every crossing cell, segment 2 for
                    # saddles only; endpoint coords evaluated with the
                    # scalar walk's exact (ox + x) + t order
                    gx = ox + xx
                    gy = oy + yy
                    sel2 = np.flatnonzero(sad)
                    segs_x0 = np.concatenate([
                        gx + np.choose(e1i, px_of),
                        (gx + np.choose(e2i, px_of))[sel2]])
                    segs_y0 = np.concatenate([
                        gy + np.choose(e1i, py_of),
                        (gy + np.choose(e2i, py_of))[sel2]])
                    segs_x1 = np.concatenate([
                        gx + np.choose(e1o, px_of),
                        (gx + np.choose(e2o, px_of))[sel2]])
                    segs_y1 = np.concatenate([
                        gy + np.choose(e1o, py_of),
                        (gy + np.choose(e2o, py_of))[sel2]])
                    n = len(segs_x0)
                    acc["scene_id"].append(
                        np.full(n, row.scene_id, dtype=object))
                    acc["level"].append(np.full(n, L))
                    acc["x0"].append(segs_x0)
                    acc["y0"].append(segs_y0)
                    acc["x1"].append(segs_x1)
                    acc["y1"].append(segs_y1)
            if acc["scene_id"]:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(np.concatenate(acc["scene_id"]), pa.string()),
                     pa.array(np.concatenate(acc["level"])),
                     pa.array(np.concatenate(acc["x0"])),
                     pa.array(np.concatenate(acc["y0"])),
                     pa.array(np.concatenate(acc["x1"])),
                     pa.array(np.concatenate(acc["y1"]))],
                    names=[f.name for f in _SEG_SCHEMA])

    return padded.mapInArrow(fn, _SEG_SCHEMA)


def _assemble_lines(pdf: pd.DataFrame) -> pd.DataFrame:
    """Chain one (scene, level)'s segments into polylines. Endpoints on a
    shared cell edge are BIT-identical across tiles (computed from the
    same two f32 corner values), so exact-key matching stitches borders.
    Open chains start at degree-1 points (data/scene edge); deterministic
    start ordering; degenerate zero-length segments are dropped."""
    scene = pdf["scene_id"].iloc[0]
    level = float(pdf["level"].iloc[0])
    segs = pdf[["x0", "y0", "x1", "y1"]].to_numpy(dtype=np.float64)
    segs = segs[~((segs[:, 0] == segs[:, 2]) & (segs[:, 1] == segs[:, 3]))]
    if not len(segs):
        return pd.DataFrame(columns=[f.name for f in CONTOUR_SCHEMA])
    order = np.lexsort((segs[:, 3], segs[:, 2], segs[:, 1], segs[:, 0]))
    segs = segs[order]
    n = len(segs)
    # endpoint ids by EXACT f64 (x, y) equality (the cross-tile stitch
    # contract): integer ids + a CSR adjacency replace the float-tuple
    # dicts of the original walk — per-step cost drops ~4x at identical
    # semantics: outgoing candidates stay ordered by ascending segment
    # index, and the cursor skips only segments already used (a used
    # segment never becomes unused, so first-unused is order-stable)
    pts = np.concatenate([segs[:, 0:2], segs[:, 2:4]])
    # (x, y) pairs as complex128: np.unique sorts numerically (vs the
    # pathologically slow void-dtype byte argsort) and compares with
    # float equality — the same semantics as the original float-tuple
    # dict keys (-0.0 == 0.0 both ways; NaN cannot appear here)
    flat = np.ascontiguousarray(pts).view(np.complex128).ravel()
    _uniq, inv = np.unique(flat, return_inverse=True)
    sid, eid = inv[:n], inv[n:]
    npts = len(_uniq)
    indeg = np.bincount(eid, minlength=npts)
    counts = np.bincount(sid, minlength=npts)
    offs = np.concatenate(([0], np.cumsum(counts)))
    adj = np.argsort(sid, kind="stable")      # ascending seg idx per point
    # hot walk state as plain Python lists (scalar numpy indexing costs
    # ~4x a list index at ~1M steps)
    cursor = offs[:-1].tolist()
    offs_end = offs[1:].tolist()
    adj_l = adj.tolist()
    eid_l = eid.tolist()
    used = bytearray(n)
    x0a, y0a, x1a, y1a = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3]
    # a chain step's length contribution is the hop from the previous
    # vertex, which by the exact-match stitch IS the segment's own start:
    # per-segment hypots vectorize once; each chain then folds its own
    # slice sequentially — the identical adds in the identical order
    seg_len = np.hypot(x1a - x0a, y1a - y0a)
    # open chains first (their starts have no incoming segment), then loops
    lines = []
    for st in np.concatenate(
            (np.flatnonzero(indeg[sid] == 0), np.arange(n))).tolist():
        if used[st]:
            continue
        chain = [st]
        i = st
        while True:
            used[i] = 1
            p = eid_l[i]
            c = cursor[p]
            e = offs_end[p]
            while c < e and used[adj_l[c]]:
                c += 1
            cursor[p] = c
            if c == e:
                break
            i = adj_l[c]
            chain.append(i)
        xs = [x0a[st]] + x1a[chain].tolist()
        ys = [y0a[st]] + y1a[chain].tolist()
        length = 0.0
        for v in seg_len[chain].tolist():
            length += v
        closed = xs[0] == xs[-1] and ys[0] == ys[-1]
        lines.append((xs, ys, closed, length))
    lines.sort(key=lambda t: (t[0][0], t[1][0], t[0][-1], t[1][-1]))
    m = len(lines)
    return pd.DataFrame({
        "scene_id": np.full(m, scene, dtype=object),
        "level": np.full(m, level),
        "line_id": np.arange(m, dtype=np.int32),
        "closed": [t[2] for t in lines],
        "n_vertices": np.array([len(t[0]) for t in lines], dtype=np.int32),
        "length_px": np.array([t[3] for t in lines]),
        "xs": [t[0] for t in lines],
        "ys": [t[1] for t in lines],
    })


def contour_lines(tiles: DataFrame, levels: Sequence[float],
                  src_col: str = "lst_bytes") -> DataFrame:
    """r.contour: isolines of the f32 plane at ``levels``, as ordered
    polylines in scene pixel-CENTER coordinates (geocode with
    rings_to_lonlat(..., xtype='center')). Inside = value >= level; cells
    touching NaN are skipped, so lines end at the valid-data boundary.
    Plan: 1-px halo exchange (one repartition) -> one mapInArrow marching
    pass -> one groupBy(scene, level) assemble. Pixels never hash-shuffle;
    only halo strips and O(contour) segment rows move."""
    if not levels:
        raise ValueError("contour_lines needs at least one level")
    nom = tiles.agg(F.max("w").alias("w"), F.max("h").alias("h")).first()
    nom_w, nom_h = int(nom["w"]), int(nom["h"])
    padded = halo_plane_tiles(tiles, r=1, src_col=src_col)
    segs = _contour_pass(padded, levels, nom_w, nom_h)
    return segs.groupBy("scene_id", "level").applyInPandas(
        _assemble_lines, CONTOUR_SCHEMA)

#!/usr/bin/env python
"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus raster-pipeline
throughput (pixels/sec) on deterministic synthetic scenes.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The full N-vs-4N scaling A/B lives in jobs/bench_scaling.py (writes
BENCH/BASELINE.md); this script stays fast enough for per-round runs.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RASTER_SCENES = int(os.environ.get("SPARK_GRAFT_BENCH_SCENES", "8"))

HEADLINE = [
    "q_lst_sw",            # full split-window physics as column algebra
    "q_cwv_ratio_window",  # windowed covariance-ratio CWV analog
    "q_range_join",        # non-equi broadcast range join
    "q_broadcast_join",    # dim-chain broadcast join + agg
    "q_agg_stats",         # TPC-H Q1 shape
    "q_window_topk",       # per-key top-k window
    "q_dedup_exact",       # training-pipeline: exact hash dedup
    "q_minhash_lsh_pairs", # training-pipeline: MinHash-LSH near-dup pairs
    "q_ann_ivf",           # training-pipeline: IVF ANN top-k (the scale path;
                           # brute-force q_embed_cosine_topk is its recall
                           # oracle in pytest, not a headline entry)
    "q_tfidf",             # training-pipeline: term weighting
]


def _materialize(df) -> int:
    # noop sink: full execution, no driver collect
    df.write.format("noop").mode("overwrite").save()
    return 0


# Quiet-floor reference for the 8-tile-stack fused kernel (BENCH/MICRO.md
# lists 18.2 ms on the noisy round-2 run; the repeatable quiet median on
# this box is 17.7 ms — see BENCH/KERNEL_SWEEP.md "steal index" section).
# steal_index = measured median / this; cross-round wall-clock comparisons
# divide by it. The single-tile kernel (~2.5 ms) is too short to probe with
# — timer/cache noise swings its median 2x on a quiet box.
STEAL_REF_MS = 17.7


_PROBE_SRC = """
import sys, time
import numpy as np
sys.path.insert(0, {repo!r})
from i_landsat8_swlst_spark import kernels as K
rng = np.random.default_rng(42)
t1 = rng.integers(1, 65535, (128, 128)).astype(np.uint16)
t2 = rng.integers(1, 65535, (128, 128)).astype(np.uint16)
dn10, dn11 = np.stack([t1] * 8), np.stack([t2] * 8)
meta = dict(ml_b10=3.342e-4, al_b10=0.1, ml_b11=3.342e-4, al_b11=0.1,
            k1_b10=774.8853, k2_b10=1321.0789,
            k1_b11=480.8883, k2_b11=1201.1442)
K.fused_lst_kernel(dn10, dn11, meta, 0.98, 0.97, 5)  # warm the BT LUTs
walls = []
for _ in range({n}):
    t0 = time.perf_counter()
    K.fused_lst_kernel(dn10, dn11, meta, 0.98, 0.97, 5)
    walls.append((time.perf_counter() - t0) * 1e3)
print(sorted(walls)[{n} // 2])
"""


def _steal_probe(n: int = 7) -> float:
    """Median wall (ms) of the 8-tile-stack fused LST kernel in a FRESH
    single-threaded subprocess (numpy only, zero Spark). On a quiet host
    this matches STEAL_REF_MS; under host-level CPU steal it inflates
    proportionally, which calibrates every wall-clock number in this run.
    A subprocess, not in-process: the bench process's own JVM background
    threads and allocator/THP state swing an in-process probe 2x in both
    directions (measured 11-24 ms for an 18 ms quiet kernel)."""
    import subprocess

    src = _PROBE_SRC.format(repo=str(Path(__file__).resolve().parent), n=n)
    out = subprocess.run([sys.executable, "-c", src], capture_output=True,
                         text=True, check=True, timeout=120)
    return float(out.stdout.strip())


def main() -> None:
    import shutil
    import tempfile

    from __spark_entry__ import queries
    from i_landsat8_swlst_spark.session import get_spark

    spark = get_spark(app="bench", cores=CPUS, shuffle_partitions=max(CPUS, 32))
    q = queries()
    times: dict[str, float] = {}

    # warm the JVM + parquet footers for every table the headline touches
    for t in ("lineitem", "events", "supplier", "nation"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()

    steal_pre_ms = _steal_probe()

    for name in HEADLINE:
        _materialize(q[name](spark, SF_DIR))  # warm: JIT + codegen + workers
        best = float("inf")
        for _ in range(2):  # best-of: this VM sees host-level steal waves
            t0 = time.perf_counter()
            _materialize(q[name](spark, SF_DIR))
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)

    # --- raster pipeline throughput on synthetic bench scenes ---
    # Input is materialized ONCE to local parquet (the production shape: the
    # job reads a columnar table, it does not regenerate inputs), so the
    # measured pass is scan -> pair-join -> fused kernel, nothing else.
    import pandas as pd
    from pyspark.sql import functions as F

    from i_landsat8_swlst_spark import constants as C, pipeline, synth

    # tmpfs if available: the sandbox /tmp is a throttled virtual disk and
    # adds 10x noise to the measured pass (the input is RAM-resident on a
    # real cluster's page cache anyway at this scale)
    tmp_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    tmp = tempfile.mkdtemp(prefix="swlst_bench_", dir=tmp_base)
    scenes_path = f"{tmp}/scenes"
    synth.synth_scenes_spark(spark, "bench", scenes=range(RASTER_SCENES)) \
        .write.mode("overwrite").parquet(scenes_path)
    scenes = spark.read.parquet(scenes_path)
    n_tiles = scenes.count() // 2  # paired
    px = scenes.select(F.sum(F.col("w").cast("long") * F.col("h")).alias("p")).collect()[0].p // 2

    meta = spark.createDataFrame(synth.scene_meta_pdf("bench"))
    emis = spark.createDataFrame(pd.DataFrame([e._asdict() for e in C.load_emissivities()]))
    # cold pass warms Python workers; steady state = best of 2 fresh-plan
    # passes (this VM's wall clock is noisy, BENCH/BASELINE.md protocol)
    _materialize(pipeline.lst_tiles(
        pipeline.build_enriched(scenes, meta, emis), window=C.DEFAULT_CWV_WINDOW))
    # interleaved emit/stats passes (same steal weather for both arms —
    # BENCH/KERNEL_SWEEP.md protocol): the emit arm is the production shape
    # (headline); the stats arm isolates kernel cost from the ~3.2 GB of
    # LST+CWV f32 Arrow emission (VERDICT r2 item 3)
    raster_sec = float("inf")
    raster_stats_sec = float("inf")
    for _ in range(3):  # best-of-3: host steal waves swing identical passes 3x
        t0 = time.perf_counter()
        _materialize(pipeline.lst_tiles(
            pipeline.build_enriched(scenes, meta, emis), window=C.DEFAULT_CWV_WINDOW))
        raster_sec = min(raster_sec, time.perf_counter() - t0)
        t0 = time.perf_counter()
        _materialize(pipeline.lst_tiles(
            pipeline.build_enriched(scenes, meta, emis), window=C.DEFAULT_CWV_WINDOW,
            emit_arrays=False))
        raster_stats_sec = min(raster_stats_sec, time.perf_counter() - t0)
    times["q_lst_pipeline_bench"] = round(raster_sec, 3)

    # --- fused pixel enrichment (VERDICT r3 item 9: the north-star flow's
    # cells + R-tree PIP + kNN in ONE Python hop gets a tracked number) ---
    # Input is a parquet-backed point table (production shape) so the
    # measured pass is scan -> one mapInArrow hop -> noop sink; the vector
    # sides are the broadcast regime enrich_pixels targets (the distributed
    # variants have their own A/B in BENCH/SPATIAL_SHUFFLE.md).
    import numpy as np

    from i_landsat8_swlst_spark import spatial

    n_enrich = int(os.environ.get("SPARK_GRAFT_ENRICH_POINTS", "2000000"))
    aoi_pdf = synth.aoi_pdf("small")
    st_pdf = synth.stations_pdf("small")
    allv = [p for ring in aoi_pdf["ring"] for p in ring]
    elons = np.array([p["lon"] for p in allv]); elats = np.array([p["lat"] for p in allv])
    rng = np.random.default_rng(19)
    pts_path = f"{tmp}/enrich_points"
    spark.createDataFrame(pd.DataFrame({
        "pid": np.arange(n_enrich),
        "lon": rng.uniform(elons.min() - 0.2, elons.max() + 0.2, n_enrich),
        "lat": rng.uniform(elats.min() - 0.2, elats.max() + 0.2, n_enrich),
        "lst_k": rng.uniform(260.0, 330.0, n_enrich),
    })).repartition(CPUS).write.mode("overwrite").parquet(pts_path)
    epts = spark.read.parquet(pts_path)

    def _enrich():
        return spatial.enrich_pixels(epts, aoi_pdf, st_pdf, k=2, how="left")

    _materialize(_enrich())  # warm
    enrich_sec = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        _materialize(_enrich())
        enrich_sec = min(enrich_sec, time.perf_counter() - t0)
    # reported as separate top-level fields (like the raster numbers), NOT
    # in the headline total — keeps total_headline_sec comparable across
    # rounds that predate this entry

    # --- GLCM texture throughput (round-4 flagship raster-analysis kernel) ---
    # Production shape: texture consumes a STORED LST product, so a tile
    # subset is materialized to parquet first; the measured pass is
    # scan -> range agg -> halo exchange -> integral-image kernel. Sized by
    # env (default 2048 tiles ~ 33 Mpx) to keep the bench wall bounded —
    # the per-core ceiling is in BENCH/MICRO.md.
    from i_landsat8_swlst_spark import texture

    n_tex = int(os.environ.get("SPARK_GRAFT_TEXTURE_TILES", "2048"))
    tex_path = f"{tmp}/texture_tiles"
    pipeline.lst_tiles(
        pipeline.build_enriched(scenes, meta, emis),
        window=C.DEFAULT_CWV_WINDOW).limit(n_tex) \
        .write.mode("overwrite").parquet(tex_path)
    ttiles = spark.read.parquet(tex_path)
    tex_px = ttiles.select(
        F.sum(F.col("w").cast("long") * F.col("h")).alias("p")).collect()[0].p
    _materialize(texture.glcm_texture_tiles(ttiles, window=5, levels=8))  # warm
    tex_sec = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        _materialize(texture.glcm_texture_tiles(ttiles, window=5, levels=8))
        tex_sec = min(tex_sec, time.perf_counter() - t0)
    # --- IDW station->raster interpolation throughput (round-5 op) ---
    # Broadcast path (zero hash exchanges): every pixel against a sparse
    # realistic station field (16 per scene bbox — CWV stations are sparse),
    # k=12 / power=2 GRASS defaults. Cost is O(px x stations) vectorized
    # haversine, so px/s scales inversely with station count by design.
    import numpy as _np

    from i_landsat8_swlst_spark import spatial

    n_idw = int(os.environ.get("SPARK_GRAFT_IDW_TILES", "512"))
    # limit() collapses to one partition; re-spread the tiny metadata rows
    # so the per-tile kernel actually fans out across cores
    grid = ttiles.select("scene_id", "tile_x", "tile_y", "w", "h") \
        .limit(n_idw).repartition(CPUS)
    idw_geom = (pipeline.scene_grids(pipeline.parse_scenes(scenes))
                .join(meta.select("scene_id", "lon0", "lat0", "lon1", "lat1"),
                      "scene_id"))
    # stations only for the scenes actually present (scene_meta_pdf carries
    # every bench-scale bbox; 16 ghost-scene stations each would multiply
    # the per-pixel distance work 24x for nothing)
    _live = {r.scene_id for r in
             pipeline.parse_scenes(scenes).select("scene_id")
             .distinct().collect()}
    _boxes = meta.select("scene_id", "lon0", "lat0", "lon1", "lat1") \
        .toPandas()
    _boxes = _boxes[_boxes.scene_id.isin(_live)]
    _rs = _np.random.default_rng(7)
    _st_rows = []
    for _b in _boxes.itertuples():
        for _j in range(16):
            _st_rows.append({
                "station_id": f"st{_b.scene_id}_{_j:02d}",
                "lon": float(_rs.uniform(_b.lon0, _b.lon1)),
                "lat": float(_rs.uniform(_b.lat0, _b.lat1)),
                "value": float(_rs.uniform(0.5, 6.5))})
    _st = pd.DataFrame(_st_rows)
    idw_px = grid.select(
        F.sum(F.col("w").cast("long") * F.col("h")).alias("p")).collect()[0].p
    _materialize(spatial.idw_rasterize(grid, _st, idw_geom, k=12))  # warm
    idw_sec = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        _materialize(spatial.idw_rasterize(grid, _st, idw_geom, k=12))
        idw_sec = min(idw_sec, time.perf_counter() - t0)

    # --- warp (r.proj) throughput (VERDICT-r5 item 9) ---
    # Reprojects one scene's stored LST product onto that scene's own bbox
    # at ~source resolution with a different tiling (160px dst tiles vs
    # 128px src, so fragment fan-out is realistic). Scene bboxes sit oceans
    # apart, so a union-bbox GridSpec would be gigapixels of untouched
    # metadata — per-scene dst is the production shape anyway (r.proj warps
    # into the current region, not the whole catalog extent). Only touched
    # dst tiles assemble; out-px is measured from the output.
    from i_landsat8_swlst_spark import warp as Wp

    _geom_pdf = idw_geom.toPandas()
    _ws = _geom_pdf.iloc[0]
    _wtiles = ttiles.filter(F.col("scene_id") == _ws.scene_id)
    _wntx = max(1, int(round(int(_ws.ntx) * 128 / 160)))
    _wnty = max(1, int(round(int(_ws.nty) * 128 / 160)))
    _dst = Wp.GridSpec(float(_ws.lon0), float(_ws.lat0), float(_ws.lon1),
                       float(_ws.lat1), ntx=_wntx, nty=_wnty,
                       tile_w=160, tile_h=160)

    def _warped():
        return Wp.warp_tiles(_wtiles, idw_geom, _dst, method="bilinear")

    warp_out_px = _warped().select(
        F.sum(F.col("w").cast("long") * F.col("h")).alias("p")).collect()[0].p
    warp_sec = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        _materialize(_warped())
        warp_sec = min(warp_sec, time.perf_counter() - t0)

    # --- classification (i.cluster fit + i.maxlik-shape assign) throughput ---
    # Fit a k=5 2-band model on the stored product (2 Lloyd scans over the
    # persisted decode-once feature cache), then time the per-pixel nearest
    # assignment pass — broadcast model join + one mapInArrow, no pixel
    # shuffle. classify_pixels_per_sec is the assignment pass alone.
    from i_landsat8_swlst_spark import classify as Cl

    _cl_bands = ["lst_bytes", "cwv_bytes"]
    _cl_model = Cl.kmeans_model_df(ttiles, _cl_bands, k=5, iters=2)
    _materialize(Cl.classify_tiles(ttiles, _cl_bands, _cl_model))  # warm
    classify_sec = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        _materialize(Cl.classify_tiles(ttiles, _cl_bands, _cl_model))
        classify_sec = min(classify_sec, time.perf_counter() - t0)

    # --- solar irradiance (r.sun shape) throughput: O(cells) strip rows
    # through the shadow scan + the 1-px halo incidence pass; additive
    # comparator field (round 6), sized like the IDW block
    from i_landsat8_swlst_spark import terrain as Tr

    _sun_in = ttiles.select("scene_id", "tile_x", "tile_y", "w", "h",
                            "lst_bytes").limit(n_idw).repartition(CPUS)
    _sun_scenes = [r.scene_id for r in
                   _sun_in.select("scene_id").distinct().collect()]
    _sun_pos = pd.DataFrame([
        {"scene_id": s, "azimuth_deg": 225.0, "altitude_deg": 30.0}
        for s in _sun_scenes])
    sun_px = _sun_in.select(
        F.sum(F.col("w").cast("long") * F.col("h")).alias("p")).collect()[0].p

    def _sunned():
        return Tr.sun_tiles(_sun_in, _sun_pos)

    _materialize(_sunned())  # warm
    sun_sec = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        _materialize(_sunned())
        sun_sec = min(sun_sec, time.perf_counter() - t0)

    shutil.rmtree(tmp, ignore_errors=True)

    steal_post_ms = _steal_probe()
    steal_index = ((steal_pre_ms + steal_post_ms) / 2.0) / STEAL_REF_MS

    # --- invariant re-validation (BASELINE.md: every bench run re-checks) ---
    # sample 64 tiles: lossy decode PSNR >= 40 dB vs the exact synthesized
    # DNs; caption round-trips bit-exactly through parse_scenes
    from i_landsat8_swlst_spark import codecs, synth as S

    sample = S.scenes_pdf("bench", scenes=[1]).sample(n=64, random_state=7)
    psnr_min = float("inf")
    captions_ok = True
    for row in sample.itertuples():
        sid, band, tx, ty = S.parse_image_id(row.image_id)
        t = S.gen_tile(sid, tx, ty, int(row.w), int(row.h))
        truth = t["dn10"] if band == 10 else t["dn11"]
        dec = codecs.decode_tile(row.bytes, int(row.w), int(row.h), row.fmt)
        if row.fmt != codecs.FMT_RAW:
            psnr_min = min(psnr_min, codecs.psnr(dec, truth.astype("float64")))
        elif not (dec == truth).all():
            psnr_min = float("-inf")  # lossless must be exact
        date = row.caption.split("acquired=")[1].split(" ")[0]
        lc = row.caption.split("landcover=")[1]
        captions_ok &= row.caption == S.caption_for(sid, band, tx, ty, date, lc)
    assert psnr_min >= 40.0, f"PSNR gate failed: {psnr_min}"
    assert captions_ok, "caption round-trip gate failed"

    total = round(sum(times.values()), 3)
    print(json.dumps({
        "metric": "total_headline_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]),
        "raster_tiles": n_tiles,
        "raster_pixels": int(px),
        "raster_pixels_per_sec": round(px / raster_sec, 1),
        "raster_tiles_per_sec": round(n_tiles / raster_sec, 2),
        "raster_stats_only_sec": round(raster_stats_sec, 3),
        "raster_stats_only_pixels_per_sec": round(px / raster_stats_sec, 1),
        "enrich_points": n_enrich,
        "enrich_sec": round(enrich_sec, 3),
        "enrich_points_per_sec": round(n_enrich / enrich_sec, 1),
        "texture_pixels": int(tex_px),
        "texture_sec": round(tex_sec, 3),
        "texture_pixels_per_sec": round(tex_px / tex_sec, 1),
        "idw_pixels": int(idw_px),
        "idw_stations": len(_st),
        "idw_sec": round(idw_sec, 3),
        "idw_pixels_per_sec": round(idw_px / idw_sec, 1),
        "warp_out_pixels": int(warp_out_px),
        "warp_sec": round(warp_sec, 3),
        "warp_pixels_per_sec": round(warp_out_px / warp_sec, 1),
        "classify_pixels": int(tex_px),
        "classify_sec": round(classify_sec, 3),
        "classify_pixels_per_sec": round(tex_px / classify_sec, 1),
        "sun_pixels": int(sun_px),
        "sun_sec": round(sun_sec, 3),
        "sun_pixels_per_sec": round(sun_px / sun_sec, 1),
        "cpus": CPUS,
        "steal_probe_ms_pre": round(steal_pre_ms, 3),
        "steal_probe_ms_post": round(steal_post_ms, 3),
        "steal_index": round(steal_index, 3),
        "invariants": {"psnr_min_db": (None if psnr_min == float("inf")
                                       else round(psnr_min, 2)),
                       "captions_ok": bool(captions_ok), "sampled_tiles": 64},
    }))
    spark.stop()


if __name__ == "__main__":
    main()

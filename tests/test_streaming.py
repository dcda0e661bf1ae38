"""Structured Streaming ingest: incremental file drains, exactly-once row
dedup within the watermark, and event-time windowed aggregation semantics."""

import pyarrow as pa
import pyarrow.parquet as pq

from i_landsat8_swlst_spark import streaming, synth


def _drop(pdf, path):
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)


def test_stream_tile_stats_incremental_and_dedup(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    s0 = synth.scenes_pdf("small", scenes=[0])
    s1 = synth.scenes_pdf("small", scenes=[1])
    s2 = synth.scenes_pdf("small", scenes=[2])

    # drop 1: scenes 0+1
    _drop(s0, in_dir / "drop1a.parquet")
    _drop(s1, in_dir / "drop1b.parquet")
    streaming.stream_tile_stats(spark, str(in_dir), out, ckpt)
    got = streaming.read_stats(spark, out)
    assert got.count() == len(s0) + len(s1)

    # drain again with no new files: nothing reprocessed
    streaming.stream_tile_stats(spark, str(in_dir), out, ckpt)
    assert streaming.read_stats(spark, out).count() == len(s0) + len(s1)

    # drop 2: new scene 2 PLUS a re-delivery of scene 0 (same image_ids in a
    # new file) -> file source reads it, watermark dedup drops the rows
    import pandas as pd
    _drop(pd.concat([s2, s0], ignore_index=True), in_dir / "drop2.parquet")
    streaming.stream_tile_stats(spark, str(in_dir), out, ckpt)
    got = streaming.read_stats(spark, out)
    assert got.count() == len(s0) + len(s1) + len(s2)
    # no image_id appears twice
    assert got.select("image_id").distinct().count() == got.count()

    # values match a direct batch decode of the same tiles
    row = got.filter("band = 10").orderBy("image_id").limit(1).collect()[0]
    from i_landsat8_swlst_spark import codecs
    src = next(r for _, r in s0.iterrows() if r["image_id"] == row["image_id"])
    img = codecs.decode_tile(bytes(src["bytes"]), src["w"], src["h"], src["fmt"])
    assert row["n_px"] == img.size
    assert row["dn_mean"] == round(float(img.mean()), 6)


def test_stream_windowed_counts_watermark_semantics(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    s0 = synth.scenes_pdf("small", scenes=[0])  # acquired 2024-01-01
    s1 = synth.scenes_pdf("small", scenes=[1])  # acquired 2024-01-02
    _drop(s0, in_dir / "d1.parquet")
    _drop(s1, in_dir / "d2.parquet")

    # batch 1: watermark starts at epoch -> append emits no finalized window
    streaming.stream_windowed_counts(spark, str(in_dir), out, ckpt)
    emitted1 = spark.read.parquet(out).count() if _has_files(out) else 0

    # batch 2: scene 3 (2024-01-04) pushes the watermark past the Jan-1/Jan-2
    # windows -> they finalize and append exactly once
    s3 = synth.scenes_pdf("small", scenes=[3])
    _drop(s3, in_dir / "d3.parquet")
    streaming.stream_windowed_counts(spark, str(in_dir), out, ckpt)
    got = {r["scene_id"]: r["n_tiles"] for r in spark.read.parquet(out).collect()}

    assert emitted1 == 0, "append mode must not emit unfinalized windows"
    assert got == {
        synth.scene_id(0): len(s0),
        synth.scene_id(1): len(s1),
    }


def _has_files(path):
    import glob
    import os
    return bool(glob.glob(os.path.join(path, "*.parquet")) or
                glob.glob(os.path.join(path, "*", "*.parquet")))


def test_stream_scene_progress_stateful_across_drains(spark, tmp_path):
    """applyInPandasWithState: keyed state must accumulate across separate
    availableNow drains (restored from the state store in the checkpoint)."""
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    s0 = synth.scenes_pdf("small", scenes=[0]).sort_values("image_id").reset_index(drop=True)
    half1, half2 = s0.iloc[::2], s0.iloc[1::2]
    per_band = 64  # "small": 8x8 tiles per scene per band

    _drop(half1, in_dir / "h1.parquet")
    streaming.stream_scene_progress(spark, str(in_dir), out, ckpt, expected_tiles=per_band)
    got1 = {
        (r["band"]): r
        for r in streaming.read_stats(spark, out).collect()
    }
    exp1 = half1.groupby(half1["image_id"].str.extract(r"/B(\d+)/", expand=False).astype(int)).size()
    for band, n in exp1.items():
        assert got1[band]["tiles_seen"] == n
        assert got1[band]["complete"] == "no"

    _drop(half2, in_dir / "h2.parquet")
    streaming.stream_scene_progress(spark, str(in_dir), out, ckpt, expected_tiles=per_band)
    latest = (
        streaming.read_stats(spark, out)
        .orderBy("batch_id", ascending=False)
        .groupBy("band").agg({"tiles_seen": "max", "px_seen": "max"})
        .collect()
    )
    for r in latest:
        assert r["max(tiles_seen)"] == per_band  # state carried over, not reset
    # complete flag flipped in the final snapshot
    fin = streaming.read_stats(spark, out).filter("tiles_seen = 64").collect()
    assert fin and all(r["complete"] == "yes" for r in fin)
    # px accounting: 64 tiles x 64x64 px
    assert all(r["max(px_seen)"] == 64 * 64 * 64 for r in latest)


def test_stream_pair_lst_joins_across_drains(spark, tmp_path):
    """Stream-stream band-pair join: band-10 tiles from drop 1 must pair with
    band-11 partners that only arrive in drop 2 (join state carried across
    availableNow drains), and the paired output must match the batch
    pipeline.lst_tiles result tile-for-tile."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from i_landsat8_swlst_spark import constants as C, pipeline, streaming, synth

    in_dir, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    in_dir.mkdir()
    s0 = synth.scenes_pdf("tiny", scenes=[0])
    b10 = s0[s0.image_id.str.contains("/B10/")]
    b11 = s0[s0.image_id.str.contains("/B11/")]
    assert len(b10) == len(b11) > 0
    half = len(b11) // 2
    meta_pdf = synth.scene_meta_pdf("tiny")
    emis_pdf = pd.DataFrame([e._asdict() for e in C.load_emissivities()])

    # drop 1: all band-10 + half of band-11
    pq.write_table(pa.Table.from_pandas(
        pd.concat([b10, b11.iloc[:half]], ignore_index=True), preserve_index=False),
        str(in_dir / "d1.parquet"))
    streaming.stream_pair_lst(spark, str(in_dir), str(out), str(ckpt),
                              meta_pdf, emis_pdf, window=5)
    got1 = spark.read.parquet(str(out)).count()
    assert got1 == half  # only the tiles whose partner has landed

    # drop 2: the remaining band-11 tiles -> their band-10 partners come
    # from drop 1 via the join state store
    pq.write_table(pa.Table.from_pandas(
        b11.iloc[half:], preserve_index=False), str(in_dir / "d2.parquet"))
    streaming.stream_pair_lst(spark, str(in_dir), str(out), str(ckpt),
                              meta_pdf, emis_pdf, window=5)
    got = spark.read.parquet(str(out))
    assert got.count() == len(b11)

    # parity: identical tile stats to the batch path
    scenes = spark.createDataFrame(s0)
    meta = spark.createDataFrame(meta_pdf)
    emis = spark.createDataFrame(emis_pdf)
    batch = pipeline.lst_tiles(pipeline.build_enriched(scenes, meta, emis),
                               window=5, emit_arrays=False)
    cols = ["image_id", "scene_id", "tile_x", "tile_y",
            "n_valid", "lst_min", "lst_max", "lst_mean", "cwv_mean"]
    got_pdf = got.select(*cols).orderBy("tile_x", "tile_y").toPandas()
    exp_pdf = batch.select(*cols).orderBy("tile_x", "tile_y").toPandas()
    pd.testing.assert_frame_equal(
        got_pdf.reset_index(drop=True), exp_pdf.reset_index(drop=True))


def test_stream_enrich_pixels_matches_batch(spark, tmp_path):
    """Round 4: the streaming spatial enrichment (stream-static fused hop)
    must equal ONE batch enrich_pixels over the union of all drops —
    incremental drains add rows exactly once, enrichment values identical."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from i_landsat8_swlst_spark import spatial, streaming, synth

    aoi, stations = synth.aoi_pdf("tiny"), synth.stations_pdf("tiny")
    allv = [p for ring in aoi["ring"] for p in ring]
    lons = np.array([p["lon"] for p in allv]); lats = np.array([p["lat"] for p in allv])
    rng = np.random.default_rng(31)
    pts = pd.DataFrame({
        "pid": np.arange(600, dtype=np.int64),
        "lon": rng.uniform(lons.min() - 0.2, lons.max() + 0.2, 600),
        "lat": rng.uniform(lats.min() - 0.2, lats.max() + 0.2, 600),
        "lst_k": rng.uniform(260.0, 330.0, 600),
    })

    in_dir, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    in_dir.mkdir()
    pq.write_table(pa.Table.from_pandas(pts.iloc[:300], preserve_index=False),
                   in_dir / "d1.parquet")
    streaming.stream_enrich_pixels(spark, str(in_dir), str(out), str(ckpt),
                                   aoi, stations, k=2)
    n_first = spark.read.parquet(str(out)).count()
    pq.write_table(pa.Table.from_pandas(pts.iloc[300:], preserve_index=False),
                   in_dir / "d2.parquet")
    streaming.stream_enrich_pixels(spark, str(in_dir), str(out), str(ckpt),
                                   aoi, stations, k=2)

    got = spark.read.parquet(str(out)).toPandas()
    assert n_first < len(got)                      # second drain appended
    exp = spatial.enrich_pixels(
        spark.createDataFrame(pts), aoi, stations, k=2, how="left").toPandas()
    key = ["pid", "aoi_id", "station_rank"]
    g = got[sorted(got.columns)].fillna("~").sort_values(key).reset_index(drop=True)
    e = exp[sorted(exp.columns)].fillna("~").sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, e, check_dtype=False)

"""C4: QA cloud mask -> NULL propagation through the window kernel."""

import numpy as np
import pandas as pd

from i_landsat8_swlst_spark import codecs, constants as C, kernels as K, pipeline, synth

WINDOW = 5
R = WINDOW // 2


def test_qa_band_rows_present():
    pdf = synth.scenes_pdf("tiny", scenes=[0], with_qa=True)
    bands = pdf["image_id"].str.extract(r"/B(\d+)/")[0].astype(int)
    assert set(bands) == {0, 10, 11}
    assert (bands == 0).sum() == (bands == 10).sum()


def test_cloud_pixels_null_and_dilated(spark):
    scenes = spark.createDataFrame(synth.scenes_pdf("tiny", scenes=[0, 1], with_qa=True))
    meta = spark.createDataFrame(synth.scene_meta_pdf("tiny"))
    emis = spark.createDataFrame(pd.DataFrame([e._asdict() for e in C.load_emissivities()]))
    enriched = pipeline.build_enriched(scenes, meta, emis, with_qa=True)
    tiles = {(r.scene_id, r.tile_x, r.tile_y): r
             for r in pipeline.lst_tiles(enriched, window=WINDOW).collect()}

    # find a tile that actually has clouds
    cloudy = None
    for (sid, tx, ty) in tiles:
        qa = synth.gen_qa(sid, tx, ty, 32, 32)
        if (qa != 0).any():
            cloudy = (sid, tx, ty, qa)
            break
    assert cloudy, "fixture should contain cloudy tiles"
    sid, tx, ty, qa = cloudy
    row = tiles[(sid, tx, ty)]
    lst = np.frombuffer(row.lst_bytes, dtype="<f4").reshape(32, 32)

    # every cloud pixel is NULL
    assert np.all(np.isnan(lst[qa != 0]))
    # any pixel whose window contains a cloud pixel is NULL (window dilation)
    cloud = (qa != 0).astype(float)
    pad = np.pad(cloud, R, constant_values=0.0)
    dilated = np.zeros_like(cloud, dtype=bool)
    for dy in range(WINDOW):
        for dx in range(WINDOW):
            dilated |= pad[dy:dy + 32, dx:dx + 32] > 0
    assert np.all(np.isnan(lst[dilated]))


def test_cloud_dilation_matches_kernel_semantics():
    # pure-kernel check: cloud NaN dilates by window radius through cwv
    h = w = 24
    rng = np.random.default_rng(3)
    t10 = 280 + rng.standard_normal((h, w))
    t11 = 0.9 * t10 + 27 + 0.01 * rng.standard_normal((h, w))
    qa = np.zeros((h, w))
    qa[10:13, 8:11] = C.DEFAULT_CLOUD_QA_VALUES[0]
    masked10 = K.apply_cloud_mask(t10, qa, np.array(C.DEFAULT_CLOUD_QA_VALUES, dtype=float))
    cwv = K.cwv(masked10, t11, WINDOW)
    # dilated NaN box
    assert np.all(np.isnan(cwv[10 - R:13 + R, 8 - R:11 + R]))
    # outside the dilation (and window-interior) it's finite
    assert np.isfinite(cwv[R:10 - R, R:w - R]).all()

"""C1: MTL text -> scene_meta parsing round-trip."""

import pytest

from i_landsat8_swlst_spark import mtl, synth


def test_mtl_roundtrip(spark, tmp_path):
    meta = synth.scene_meta_pdf("tiny")
    rows = meta.to_dict("records")
    mtl.write_synth_mtl(str(tmp_path), rows)
    got = mtl.parse_mtl(spark, str(tmp_path / "*_MTL.txt")).toPandas().set_index("scene_id")
    assert len(got) == len(rows)
    for r in rows:
        g = got.loc[r["scene_id"]]
        for col in mtl.MTL_KEYS.values():
            assert g[col] == pytest.approx(r[col], rel=1e-9), (r["scene_id"], col)


def test_mtl_ignores_unrelated_keys(spark, tmp_path):
    p = tmp_path / "X_MTL.txt"
    p.write_text('\n'.join([
        'LANDSAT_SCENE_ID = "LC08_TEST"',
        'SPACECRAFT_ID = "LANDSAT_8"',
        "RADIANCE_MULT_BAND_10 = 3.342E-04",
        "RADIANCE_ADD_BAND_10 = 0.10000",
        "K1_CONSTANT_BAND_10 = 774.8853",
        "K2_CONSTANT_BAND_10 = 1321.0789",
        "RADIANCE_MULT_BAND_11 = 3.342E-04",
        "RADIANCE_ADD_BAND_11 = 0.10000",
        "K1_CONSTANT_BAND_11 = 480.8883",
        "K2_CONSTANT_BAND_11 = 1201.1442",
        "CLOUD_COVER = 12.3",
    ]))
    got = mtl.parse_mtl(spark, str(p)).collect()
    assert len(got) == 1
    assert got[0].scene_id == "LC08_TEST"
    assert got[0].k2_b10 == pytest.approx(1321.0789)
    assert got[0].ml_b11 == pytest.approx(3.342e-4)

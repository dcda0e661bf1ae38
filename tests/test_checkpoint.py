"""Resume semantics (SURVEY.md §5.2 item 6): kill after partial progress,
re-run, final table identical to an uninterrupted run; only missing slices
recomputed; lineage mismatch forces recompute."""

import json
from pathlib import Path

import pandas as pd
import pytest

from i_landsat8_swlst_spark import checkpoint, constants as C, synth


@pytest.fixture(scope="module")
def fixture(spark):
    scenes = spark.createDataFrame(synth.scenes_pdf("tiny"))
    meta = spark.createDataFrame(synth.scene_meta_pdf("tiny"))
    emis = spark.createDataFrame(pd.DataFrame([e._asdict() for e in C.load_emissivities()]))
    return scenes, meta, emis


def _table(spark, out):
    return (
        checkpoint.read_result(spark, out)
        .select("image_id", "n_valid", "lst_mean")
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )


def test_kill_and_resume_identical(spark, fixture, tmp_path_factory):
    scenes, meta, emis = fixture
    clean = str(tmp_path_factory.mktemp("clean"))
    killed = str(tmp_path_factory.mktemp("killed"))

    r1 = checkpoint.run_lst_job(spark, scenes, meta, emis, clean, n_slices=4, window=5)
    assert r1["executed"] and not r1["skipped"]

    with pytest.raises(checkpoint.InjectedFailure):
        checkpoint.run_lst_job(spark, scenes, meta, emis, killed, n_slices=4,
                               window=5, fail_after=2)
    partial = checkpoint.read_manifest(killed)
    assert len(partial) == 2

    r2 = checkpoint.run_lst_job(spark, scenes, meta, emis, killed, n_slices=4, window=5)
    assert sorted(r2["skipped"]) == sorted(partial)  # completed slices not recomputed
    assert len(r2["executed"]) == 2

    pd.testing.assert_frame_equal(_table(spark, clean), _table(spark, killed))

    # second resume is a full no-op
    r3 = checkpoint.run_lst_job(spark, scenes, meta, emis, killed, n_slices=4, window=5)
    assert r3["executed"] == [] and len(r3["skipped"]) == 4


def test_manifest_carries_lineage_and_metrics(spark, fixture, tmp_path_factory):
    scenes, meta, emis = fixture
    out = str(tmp_path_factory.mktemp("m"))
    checkpoint.run_lst_job(spark, scenes, meta, emis, out, n_slices=2, window=5)
    recs = checkpoint.read_manifest(out)
    assert len(recs) == 2
    for rec in recs.values():
        assert rec["code_version"]
        assert rec["input_fingerprint"] != 0
        assert rec["rows_out"] > 0 and rec["pixels"] > 0 and rec["wall_ms"] > 0
        assert rec["attempt"] == 1


def test_lineage_mismatch_forces_recompute(spark, fixture, tmp_path_factory):
    scenes, meta, emis = fixture
    out = str(tmp_path_factory.mktemp("lin"))
    checkpoint.run_lst_job(spark, scenes, meta, emis, out, n_slices=2, window=5)
    # corrupt one manifest fingerprint -> that slice must re-run
    md = Path(out) / "_manifest"
    f = sorted(md.glob("slice-*.json"))[0]
    rec = json.loads(f.read_text())
    rec["input_fingerprint"] += 1
    f.write_text(json.dumps(rec))
    r = checkpoint.run_lst_job(spark, scenes, meta, emis, out, n_slices=2, window=5)
    assert r["executed"] == [rec["slice"]]
    assert checkpoint.read_manifest(out)[rec["slice"]]["attempt"] == 2


def test_job_options_celsius_emissivity_qa(spark, tmp_path_factory):
    """Reference-option parity through the job surface: --celsius shifts the
    LST stats by exactly -273.15; --emissivity-class changes the physics vs
    the landcover path; differing options invalidate resume (re-execute)."""
    import numpy as np

    scenes = spark.createDataFrame(synth.scenes_pdf("tiny", scenes=[0], with_qa=True))
    meta = spark.createDataFrame(synth.scene_meta_pdf("tiny"))
    emis = spark.createDataFrame(pd.DataFrame([e._asdict() for e in C.load_emissivities()]))

    out_k = str(tmp_path_factory.mktemp("opt_k"))
    out_c = str(tmp_path_factory.mktemp("opt_c"))
    checkpoint.run_lst_job(spark, scenes, meta, emis, out_k, n_slices=2, window=5)
    checkpoint.run_lst_job(spark, scenes, meta, emis, out_c, n_slices=2, window=5,
                           celsius=True)
    k = _table(spark, out_k)
    c = _table(spark, out_c)
    np.testing.assert_allclose(
        c["lst_mean"].to_numpy(), k["lst_mean"].to_numpy() - 273.15, rtol=0, atol=1e-9)

    # fixed emissivity class -> different LST than the landcover-map path
    out_e = str(tmp_path_factory.mktemp("opt_e"))
    checkpoint.run_lst_job(spark, scenes, meta, emis, out_e, n_slices=2, window=5,
                           emissivity_class="Waterbodies")
    e = _table(spark, out_e)
    assert not np.allclose(e["lst_mean"].to_numpy(), k["lst_mean"].to_numpy())

    # unknown class fails loudly
    with pytest.raises(ValueError, match="unknown emissivity_class"):
        checkpoint.run_lst_job(spark, scenes, meta, emis, out_e, n_slices=2,
                               emissivity_class="nope")

    # QA path: cloud-masked pixels reduce n_valid vs the no-QA run
    out_q = str(tmp_path_factory.mktemp("opt_q"))
    checkpoint.run_lst_job(spark, scenes, meta, emis, out_q, n_slices=2, window=5,
                           with_qa=True)
    q = _table(spark, out_q)
    assert q["n_valid"].sum() < k["n_valid"].sum()

    # differing options invalidate resume: rerunning out_k with celsius=True
    # must re-execute every slice, not skip
    r = checkpoint.run_lst_job(spark, scenes, meta, emis, out_k, n_slices=2,
                               window=5, celsius=True)
    assert r["skipped"] == [] and len(r["executed"]) >= 1
    # and the same options again IS a no-op resume
    r2 = checkpoint.run_lst_job(spark, scenes, meta, emis, out_k, n_slices=2,
                                window=5, celsius=True)
    assert r2["executed"] == [] and r2["skipped"] == r["executed"]


def test_pre_options_manifest_resumes_under_defaults(spark, fixture, tmp_path_factory):
    """ADVICE r2: manifests written before the 'options' record existed mean
    "ran with the defaults" — a default-options resume must skip them, while
    a non-default rerun still recomputes."""
    scenes, meta, emis = fixture
    out = str(tmp_path_factory.mktemp("preopts"))
    r1 = checkpoint.run_lst_job(spark, scenes, meta, emis, out, n_slices=4)
    assert len(r1["executed"]) == 4

    # simulate a legacy manifest: drop the options key
    for f in (Path(out) / "_manifest").glob("slice-*.json"):
        rec = json.loads(f.read_text())
        rec.pop("options")
        f.write_text(json.dumps(rec))

    r2 = checkpoint.run_lst_job(spark, scenes, meta, emis, out, n_slices=4)
    assert len(r2["skipped"]) == 4 and not r2["executed"]

    r3 = checkpoint.run_lst_job(spark, scenes, meta, emis, out, n_slices=4,
                                celsius=True)
    assert len(r3["executed"]) == 4 and not r3["skipped"]


def test_missing_slice_in_stats_raises(spark, fixture, tmp_path_factory, monkeypatch):
    """ADVICE r3 (low): if a written group's stats read is missing a slice
    that HAD input rows, the job must raise instead of recording an empty
    'done' manifest that resume would skip forever. Simulated by a doctored
    lst_tiles that silently drops one slice's rows (a stand-in for a
    slice-column recomputation bug)."""
    scenes, meta, emis = fixture
    out = str(tmp_path_factory.mktemp("missing_slice"))
    real = checkpoint.pipeline.lst_tiles

    def dropping(enriched, window=C.DEFAULT_CWV_WINDOW, celsius=False):
        from pyspark.sql import functions as F
        df = real(enriched, window=window, celsius=celsius)
        return df.filter(checkpoint._slice_col(4) != 0)

    monkeypatch.setattr(checkpoint.pipeline, "lst_tiles", dropping)
    with pytest.raises(RuntimeError, match="missing from post-write stats"):
        checkpoint.run_lst_job(spark, scenes, meta, emis, out, n_slices=4,
                               window=5)
    # the dropped slice must NOT have a 'done' manifest
    assert 0 not in checkpoint.read_manifest(out)


def test_auto_slice_batch_sizing():
    """Pixels-per-core sizing: target ~TARGET_PX_PER_CORE*cores pixels per
    grouped write, clamped to [1, n_pending]."""
    from i_landsat8_swlst_spark.checkpoint import (TARGET_PX_PER_CORE,
                                                   auto_slice_batch)

    # the sweep shape (BENCH/DURABLE.md): 16 slices x ~20 Mpx on 32 cores
    # -> 192 Mpx target -> batch 10 (middle of the measured 5..16 plateau)
    assert auto_slice_batch(16 * 20_000_000, 16, 32) == 10
    # tiny input: never below 1, never above n_pending
    assert auto_slice_batch(100, 4, 32) == 4
    assert auto_slice_batch(10**15, 16, 32) == 1
    assert auto_slice_batch(0, 0, 32) == 1
    # scales with cores at fixed per-slice size
    px_slice = TARGET_PX_PER_CORE
    assert auto_slice_batch(64 * px_slice, 64, 8) == 8
    assert auto_slice_batch(64 * px_slice, 64, 16) == 16


def test_run_lst_job_auto_batch_end_to_end(spark, fixture, tmp_path_factory):
    """slice_batch='auto' (the default) runs, records the chosen batch, and
    resumes cleanly."""
    scenes, meta, emis = fixture
    out = str(tmp_path_factory.mktemp("auto_batch"))
    r1 = checkpoint.run_lst_job(spark, scenes, meta, emis, out, n_slices=4,
                                window=5, slice_batch="auto")
    assert r1["executed"] == [0, 1, 2, 3]
    assert 1 <= r1["slice_batch"] <= 4
    r2 = checkpoint.run_lst_job(spark, scenes, meta, emis, out, n_slices=4,
                                window=5, slice_batch="auto")
    assert r2["executed"] == [] and len(r2["skipped"]) == 4


def test_observed_metrics_match_written_table(spark, fixture, tmp_path_factory):
    """The Observation-accumulated manifest metrics must equal a ground-truth
    aggregation of the written table (the r3 post-write read, now the test
    oracle)."""
    from pyspark.sql import functions as F

    scenes, meta, emis = fixture
    out = str(tmp_path_factory.mktemp("obs"))
    checkpoint.run_lst_job(spark, scenes, meta, emis, out, n_slices=3, window=5)
    man = checkpoint.read_manifest(out)
    truth = {
        int(r["slice"]): r for r in
        checkpoint.read_result(spark, out)
        .groupBy("slice")
        .agg(F.count(F.lit(1)).alias("rows"),
             F.sum("n_valid").alias("valid_px"),
             F.sum(F.col("w").cast("long") * F.col("h")).alias("pixels"))
        .collect()
    }
    assert set(man) == set(truth)
    for s, rec in man.items():
        assert rec["rows_out"] == truth[s]["rows"], s
        assert rec["valid_px"] == truth[s]["valid_px"], s
        assert rec["pixels"] == truth[s]["pixels"], s
        assert rec["input_rows"] > 0


def test_lazy_fingerprints_fresh_run_then_resume(spark, fixture,
                                                 tmp_path_factory):
    """Explicit-batch fresh runs skip the upfront metadata scan and record
    OBSERVED fingerprints (bit_xor(xxhash64(image_id)) inside the write
    job). They must equal what the resume validation scan recomputes: the
    rerun is a no-op, and the manifests match slice_fingerprints exactly."""
    scenes, meta, emis = fixture
    out = str(tmp_path_factory.mktemp("lazyfp"))
    r1 = checkpoint.run_lst_job(spark, scenes, meta, emis, out, n_slices=3,
                                window=5, slice_batch=3)
    assert sorted(r1["executed"]) == [0, 1, 2]
    # resume: the validation scan now runs, and every observed fp validates
    r2 = checkpoint.run_lst_job(spark, scenes, meta, emis, out, n_slices=3,
                                window=5, slice_batch=3)
    assert r2["executed"] == [] and sorted(r2["skipped"]) == [0, 1, 2]
    # recorded fingerprints ARE the scan's fingerprints
    from i_landsat8_swlst_spark import pipeline

    enriched = pipeline.build_enriched(scenes, meta, emis).withColumn(
        "slice", checkpoint._slice_col(3))
    fps = checkpoint.slice_fingerprints(enriched, 3)
    recs = checkpoint.read_manifest(out)
    for s, rec in recs.items():
        assert rec["input_fingerprint"] == fps[s][0]
        assert rec["input_rows"] == fps[s][1]


def test_lazy_fingerprints_dropped_slice_self_heals(spark, fixture,
                                                    tmp_path_factory,
                                                    monkeypatch):
    """On the lazy path a dropped slice cannot fail fast (no input stats
    exist) — but it must leave NO 'done' manifest, so the next resume's
    validation scan re-executes exactly that slice with the real kernel."""
    scenes, meta, emis = fixture
    out = str(tmp_path_factory.mktemp("lazyheal"))
    real = checkpoint.pipeline.lst_tiles

    def dropping(enriched, window=C.DEFAULT_CWV_WINDOW, celsius=False):
        from pyspark.sql import functions as F  # noqa: F401
        df = real(enriched, window=window, celsius=celsius)
        return df.filter(checkpoint._slice_col(4) != 0)

    monkeypatch.setattr(checkpoint.pipeline, "lst_tiles", dropping)
    checkpoint.run_lst_job(spark, scenes, meta, emis, out, n_slices=4,
                           window=5, slice_batch=4)
    assert 0 not in checkpoint.read_manifest(out)
    monkeypatch.setattr(checkpoint.pipeline, "lst_tiles", real)
    r = checkpoint.run_lst_job(spark, scenes, meta, emis, out, n_slices=4,
                               window=5, slice_batch=4)
    assert r["executed"] == [0]
    assert sorted(r["skipped"]) == [1, 2, 3]
    # and now the output is complete and identical to a clean run
    clean = str(tmp_path_factory.mktemp("lazyclean"))
    checkpoint.run_lst_job(spark, scenes, meta, emis, clean, n_slices=4,
                           window=5, slice_batch=4)
    assert _table(spark, out).equals(_table(spark, clean))

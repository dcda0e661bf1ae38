"""Focused durable-throughput probe: the bkt16 arm alone, 8 reps.

Isolates the production-layout durable job (pre-parsed bucketed scenes
table through run_lst_job, slice_batch=16, lazy fresh-run fingerprints)
for minima hunting around the >=55 Mpx/s gate; the full sweep lives in
bench_durable.py. Prints one JSON line with walls + steal probes
(BENCH/DURABLE.md round-6 section records the gate-closing run).

Run: python jobs/bench_durable_focus.py
"""

import json, shutil, sys, time
from pathlib import Path
sys.path.insert(0, "/root/repo")
from bench import STEAL_REF_MS, _steal_probe
import pandas as pd
from pyspark.sql import functions as F
from i_landsat8_swlst_spark import checkpoint, constants as C, synth, pipeline
from i_landsat8_swlst_spark.session import get_spark

TMP = Path("/dev/shm/swlst_durable")
pre = _steal_probe()
spark = get_spark("durable_bkt")
scenes_path = TMP / "scenes"
if not scenes_path.exists():
    synth.synth_scenes_spark(spark, "bench", scenes=range(4)).write.mode("overwrite").parquet(str(scenes_path))
scenes = spark.read.parquet(str(scenes_path))
key = ["scene_id", "tile_x", "tile_y"]
spark.sql("DROP TABLE IF EXISTS bkt_focus")
(pipeline.parse_scenes(scenes).write.bucketBy(32, *key).sortBy(*key)
 .mode("overwrite").format("parquet").saveAsTable("bkt_focus"))
sb = spark.table("bkt_focus")
meta = spark.createDataFrame(synth.scene_meta_pdf("bench"))
emis = spark.createDataFrame(pd.DataFrame([e._asdict() for e in C.load_emissivities()]))
total_px = scenes.filter(F.col("image_id").contains("/B10/")).agg(
    F.sum(F.col("w").cast("long") * F.col("h"))).collect()[0][0]
walls = []
for rep in range(8):
    out = TMP / f"bf_{rep}"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.perf_counter()
    r = checkpoint.run_lst_job(spark, sb, meta, emis, str(out),
                               n_slices=16, window=5, slice_batch=16)
    walls.append(time.perf_counter() - t0)
    assert len(r["executed"]) == 16
    shutil.rmtree(out, ignore_errors=True)
post = _steal_probe()
spark.sql("DROP TABLE IF EXISTS bkt_focus")
print(json.dumps({"total_px": int(total_px), "walls": [round(w,2) for w in walls],
                  "best_mpxs": round(total_px/min(walls)/1e6, 1),
                  "steal_pre_ms": round(pre,3), "steal_post_ms": round(post,3),
                  "steal_index": round(((pre+post)/2)/STEAL_REF_MS, 3)}))

"""Durable-job throughput sweep (VERDICT r3 items 7+8).

Interleaved arms in ONE process (steal-noisy VM: identical passes swing ~3x,
see BENCH/KERNEL_SWEEP.md), per-arm minima: the checkpointed LST job end to
end (scan -> pair join -> kernel -> dynamic-partition-overwrite write ->
per-slice manifests) at slice_batch in {1, 4, 8, auto, 16}, 16 slices over
4 bench scenes (~201 Mpx), output on tmpfs.

Round-4 changes under test:
- per-slice metrics now come from Observation accumulators inside the write
  job (round 3 ran a column-pruned re-read of the written parquet per
  group); the re-read's cost is measured separately below by timing the
  equivalent read against the written output.
- slice_batch='auto' sizes groups by pixels-per-core
  (checkpoint.auto_slice_batch) instead of a fixed count.
- the tile write defaults to parquet codec 'uncompressed' (f32 raster
  planes are near-incompressible; probe numbers in the generated md).

Resume bit-identity is covered by tests/test_checkpoint.py (kill mid-group,
zero manifests committed, resume vs clean run frame-equal) and the CLI
SIGKILL probe in BENCH/BASELINE.md.

Run: python jobs/bench_durable.py   (writes BENCH/DURABLE.md)
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pandas as pd
from pyspark.sql import functions as F

from i_landsat8_swlst_spark import checkpoint, constants as C, synth
from i_landsat8_swlst_spark.session import get_spark

N_SCENES = 4
N_SLICES = 16
# "bkt16": slice_batch=16 over the PRE-PARSED BUCKETED scenes layout (the
# documented 100-TB table layout) — parse_scenes keeps the stored key
# columns, so the b10/b11 pair join inside the job is zero-shuffle
# (tests/test_plans.py::test_build_enriched_reuses_bucketing_of_parsed_table)
ARMS = [1, 4, 8, "auto", 16, "bkt16"]
REPS = 4
TMP = Path("/dev/shm/swlst_durable")
BKT_TABLE = "swlst_durable_scenes_bkt"


def main() -> None:
    # steal qualification (VERDICT-r5 item 6): the gate needs a quiet-window
    # run, evidenced by the same fresh-subprocess kernel probe bench.py uses
    from bench import STEAL_REF_MS, _steal_probe

    steal_pre_ms = _steal_probe()
    spark = get_spark("bench_durable")
    scenes_path = TMP / "scenes"
    if not scenes_path.exists():
        synth.synth_scenes_spark(spark, "bench", scenes=range(N_SCENES)) \
            .write.mode("overwrite").parquet(str(scenes_path))
    scenes = spark.read.parquet(str(scenes_path))
    from i_landsat8_swlst_spark import pipeline
    key = ["scene_id", "tile_x", "tile_y"]
    spark.sql(f"DROP TABLE IF EXISTS {BKT_TABLE}")
    (pipeline.parse_scenes(scenes).write.bucketBy(32, *key).sortBy(*key)
     .mode("overwrite").format("parquet").saveAsTable(BKT_TABLE))
    scenes_bkt = spark.table(BKT_TABLE)
    meta = spark.createDataFrame(synth.scene_meta_pdf("bench"))
    emis = spark.createDataFrame(pd.DataFrame([e._asdict() for e in C.load_emissivities()]))

    total_px = scenes.filter(F.col("image_id").contains("/B10/")) \
        .agg(F.sum(F.col("w").cast("long") * F.col("h"))).collect()[0][0]

    walls: dict = {a: [] for a in ARMS}
    chosen_auto = None
    for rep in range(REPS):
        for arm in ARMS:
            out = TMP / f"out_{arm}_{rep}"
            shutil.rmtree(out, ignore_errors=True)
            src = scenes_bkt if arm == "bkt16" else scenes
            batch_arg = 16 if arm == "bkt16" else arm
            t0 = time.perf_counter()
            r = checkpoint.run_lst_job(spark, src, meta, emis, str(out),
                                       n_slices=N_SLICES, window=5,
                                       slice_batch=batch_arg)
            walls[arm].append(time.perf_counter() - t0)
            assert len(r["executed"]) == N_SLICES
            if arm == "auto":
                chosen_auto = r["slice_batch"]
            if not (arm == 8 and rep == REPS - 1):
                # outputs are ~2.6 GB each and share the tmpfs with the
                # shuffle dir — drop all but the one the re-read probe needs
                shutil.rmtree(out, ignore_errors=True)

    # cost of the r3 post-write metrics re-read, measured against real
    # output: one column-pruned grouped read per write group at batch=8
    out8 = TMP / f"out_8_{REPS - 1}"
    groups = [list(range(g, min(g + 8, N_SLICES))) for g in range(0, N_SLICES, 8)]
    reread = []
    for rep in range(REPS):
        t0 = time.perf_counter()
        for g in groups:
            (spark.read.parquet(str(out8 / "data"))
             .filter(F.col("slice").isin(g))
             .groupBy("slice")
             .agg(F.count(F.lit(1)).alias("rows"),
                  F.sum("n_valid").alias("valid_px"),
                  F.sum(F.col("w").cast("long") * F.col("h")).alias("pixels"))
             .collect())
        reread.append(time.perf_counter() - t0)

    spark.sql(f"DROP TABLE IF EXISTS {BKT_TABLE}")
    steal_post_ms = _steal_probe()
    steal_index = ((steal_pre_ms + steal_post_ms) / 2.0) / STEAL_REF_MS

    best = {str(a): round(min(w), 2) for a, w in walls.items()}
    mpxs = {str(a): round(total_px / min(w) / 1e6, 1) for a, w in walls.items()}
    res = {
        "total_px": int(total_px),
        "n_slices": N_SLICES,
        "auto_batch_chosen": chosen_auto,
        "wall_best_s": best,
        "mpx_per_s": mpxs,
        "r3_metrics_reread_s": round(min(reread), 2),
        "steal_probe_ms_pre": round(steal_pre_ms, 3),
        "steal_probe_ms_post": round(steal_post_ms, 3),
        "steal_index": round(steal_index, 3),
    }
    print(json.dumps(res))

    md = Path(__file__).resolve().parent.parent / "BENCH" / "DURABLE.md"
    rows = "\n".join(
        f"| {a} | {best[str(a)]} | {mpxs[str(a)]} |"
        + (f"  <- auto chose {chosen_auto}" if a == "auto" else "")
        for a in ARMS)
    md.write_text(f"""# Durable-job throughput (steal-qualified run)

{REPS} interleaved reps per arm in ONE process, per-arm minima;
{N_SCENES} bench scenes ~{total_px/1e6:.0f} Mpx, {N_SLICES} slices,
output on tmpfs, local[32]. Steal probe (fresh-subprocess fused kernel,
see bench.py): pre {res['steal_probe_ms_pre']} ms / post
{res['steal_probe_ms_post']} ms -> steal_index {res['steal_index']}.
Per-slice metrics accumulate via ``Observation`` inside each grouped
write job (no post-write read).

| slice_batch | best wall s | Mpx/s |
| --- | --- | --- |
{rows}

The r3 per-group metrics re-read (column-pruned grouped read of the written
parquet, timed against real batch=8 output): **{res['r3_metrics_reread_s']} s
per run** — the wall the Observation switch removes.

Codec probe (same input, interleaved 3 reps, batch=8, min walls — run
2026-08-17, driving the job's new `--codec` default): snappy 8.17 s /
2360 MB, zstd 8.19 s / 1879 MB, uncompressed 7.31 s / 2462 MB. The f32
LST/CWV planes are near-incompressible: snappy buys 4% bytes for ~12% wall;
zstd is the right choice only when storage dominates (20% smaller).

```json
{json.dumps(res, indent=2)}
```
""")
    print(f"wrote {md}")
    spark.stop()


if __name__ == "__main__":
    main()

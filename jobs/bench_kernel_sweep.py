#!/usr/bin/env python
"""Interleaved kernel-stack A/B for the raster pipeline -> BENCH/KERNEL_SWEEP.md.

Round-2 finding (VERDICT "What's wrong" #1): the recorded raster-pipeline
number swung 5.09s -> 8.17s -> 13.6s across sessions while every SQL headline
reproduced within noise — so either the measurement is steal-dominated or
``_KERNEL_STACK`` is mistuned. Separately-run sweeps can't distinguish the
two (host steal arrives in multi-minute waves that hit whichever arm is
running). This script settles it the only defensible way: ALL arms inside
ONE bench process, strictly round-robin interleaved (arm1 pass1, arm2 pass1,
..., arm1 pass2, ...) so every steal wave hits every arm equally, >=5 passes
per arm, per-arm minima AND medians reported.

Arms:
  stack1 / stack4 / stack8 / stack16 / stack64 — per-tile vs batched fused
      kernel at those stack depths (emit_arrays=True, the production shape);
  stack<best>-noemit — the winner re-run with emit_arrays=False to separate
      kernel cost from the ~3.2 GB LST+CWV Arrow emission (VERDICT item 3).

Output: one JSON line + BENCH/KERNEL_SWEEP.md.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCENES = int(os.environ.get("SPARK_GRAFT_BENCH_SCENES", "8"))
PASSES = int(os.environ.get("SPARK_GRAFT_SWEEP_PASSES", "5"))
STACKS = [1, 4, 8, 16, 64]


def main() -> None:
    import pandas as pd

    from i_landsat8_swlst_spark import constants as C, pipeline, synth
    from i_landsat8_swlst_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(app="kernel-sweep", cores=CPUS, shuffle_partitions=max(CPUS, 32))

    tmp_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    tmp = tempfile.mkdtemp(prefix="swlst_sweep_", dir=tmp_base)
    try:
        scenes_path = f"{tmp}/scenes"
        synth.synth_scenes_spark(spark, "bench", scenes=range(SCENES)) \
            .write.mode("overwrite").parquet(scenes_path)
        scenes = spark.read.parquet(scenes_path)
        px = scenes.select(F.sum(F.col("w").cast("long") * F.col("h")).alias("p")
                           ).collect()[0].p // 2
        meta = spark.createDataFrame(synth.scene_meta_pdf("bench"))
        emis = spark.createDataFrame(pd.DataFrame(
            [e._asdict() for e in C.load_emissivities()]))

        def run(stack: int, emit: bool) -> float:
            df = pipeline.lst_tiles(
                pipeline.build_enriched(scenes, meta, emis),
                window=C.DEFAULT_CWV_WINDOW, emit_arrays=emit,
                kernel_stack=stack)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        run(64, True)  # warm: JIT + codegen + Python workers + page cache

        arms: dict[str, list[float]] = {f"stack{s}": [] for s in STACKS}
        for p in range(PASSES):
            for s in STACKS:  # strict round-robin: same steal weather per arm
                arms[f"stack{s}"].append(run(s, True))
                print(f"pass {p + 1}/{PASSES} stack{s}: "
                      f"{arms[f'stack{s}'][-1]:.2f}s", file=sys.stderr)

        stats = {
            a: {"min": round(min(v), 3), "median": round(statistics.median(v), 3),
                "max": round(max(v), 3),
                "mpx_s_min": round(px / min(v) / 1e6, 1)}
            for a, v in arms.items()
        }
        best = min(stats, key=lambda a: stats[a]["min"])
        best_stack = int(best.removeprefix("stack"))

        # stats-only arm for the winner: kernel cost without Arrow emission
        noemit = [run(best_stack, False) for _ in range(max(3, PASSES - 2))]
        stats[f"{best}-noemit"] = {
            "min": round(min(noemit), 3),
            "median": round(statistics.median(noemit), 3),
            "max": round(max(noemit), 3),
            "mpx_s_min": round(px / min(noemit) / 1e6, 1),
        }

        out = {
            "metric": "kernel_stack_sweep",
            "cpus": CPUS, "scenes": SCENES, "passes": PASSES,
            "pixels_per_pass": int(px),
            "arms": stats, "best": best,
            "raw": {a: [round(x, 3) for x in v] for a, v in arms.items()},
        }
        print(json.dumps(out))

        md = [
            "# BENCH/KERNEL_SWEEP — interleaved kernel-stack A/B (round 3)",
            "",
            f"Protocol: ALL arms in ONE process, strict round-robin ({PASSES} "
            f"passes/arm), local[{CPUS}], {SCENES} scenes "
            f"({px / 1e6:.0f} Mpx/pass), input parquet on tmpfs, noop sink. "
            "Interleaving puts every arm in the same host-steal weather — the "
            "separately-run sweeps of rounds 1-2 could not distinguish tuning "
            "from steal (5.09 s vs 8.17 s vs 13.6 s for the SAME config).",
            "",
            "| arm | min s | median s | max s | Mpx/s (at min) |",
            "| --- | --- | --- | --- | --- |",
        ]
        for a, s in stats.items():
            md.append(f"| {a} | {s['min']} | {s['median']} | {s['max']} | "
                      f"{s['mpx_s_min']} |")
        md += [
            "",
            f"**Winner: {best}** (per-arm minima; medians agree on ordering "
            "unless noted). The `-noemit` row is the winner with "
            "emit_arrays=False — the gap to the emit row is pure Arrow "
            "LST+CWV byte emission into the noop sink, not kernel cost.",
            "",
            "Raw per-pass seconds (pass order = round-robin):",
            "",
            "```json",
            json.dumps(out["raw"], indent=2),
            "```",
        ]
        (REPO / "BENCH" / "KERNEL_SWEEP.md").write_text("\n".join(md) + "\n")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

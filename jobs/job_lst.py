#!/usr/bin/env python
"""Production entry point: checkpoint-resumable LST job.

    spark-submit --py-files engine.zip jobs/job_lst.py \
        --scenes /path/scenes.parquet --scene-meta /path/scene_meta.parquet \
        --out /path/out --slices 64 [--window 7] [--no-resume]

(BASELINE.json:14: "run via spark-submit --py-files on a multi-executor
cluster", "resumable from checkpoint with per-partition lineage + metrics".)
When --scenes is omitted a deterministic synthetic scene set is generated
distributed (sandbox mode — no external data).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default=None, help="scenes parquet path (default: synth bench)")
    ap.add_argument("--scene-meta", default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--slices", type=int, default=16)
    ap.add_argument("--window", type=int, default=7)
    ap.add_argument("--synth-scenes", type=int, default=8)
    ap.add_argument("--no-resume", action="store_true")
    # reference-option parity ([U] i.landsat8.swlst.py):
    ap.add_argument("--qa", action="store_true",
                    help="join band-0 QA tiles and cloud-mask (C4)")
    ap.add_argument("--emissivity-class", default=None,
                    help="fixed emissivity class instead of the landcover map "
                         "(reference emissivity_class= option)")
    ap.add_argument("--celsius", action="store_true",
                    help="emit LST in deg C (reference -c flag)")
    ap.add_argument("--codec", default="uncompressed",
                    choices=["uncompressed", "snappy", "zstd", "lz4", "gzip"],
                    help="parquet codec for the tile output (f32 rasters are "
                         "near-incompressible: snappy ~4%% smaller for ~12%% "
                         "slower writes, zstd ~20%% smaller; see "
                         "BENCH/DURABLE.md)")
    ap.add_argument("--slice-batch", default="auto",
                    type=lambda v: v if v == "auto" else int(v),
                    help="slices per write job (full-width kernel passes; a "
                         "crash loses at most this many slices of work). "
                         "'auto' (default) sizes the group by pixels per "
                         "core (checkpoint.auto_slice_batch)")
    args = ap.parse_args()

    import pandas as pd

    from i_landsat8_swlst_spark import checkpoint, constants as C, synth
    from i_landsat8_swlst_spark.session import get_spark

    spark = get_spark(app="job_lst")
    if args.scenes:
        scenes = spark.read.parquet(args.scenes)
        meta = spark.read.parquet(args.scene_meta)
    else:
        scenes = synth.synth_scenes_spark(spark, "bench", scenes=range(args.synth_scenes),
                                          with_qa=args.qa)
        meta = spark.createDataFrame(synth.scene_meta_pdf("bench"))
    emis = spark.createDataFrame(pd.DataFrame([e._asdict() for e in C.load_emissivities()]))

    summary = checkpoint.run_lst_job(
        spark, scenes, meta, emis, args.out,
        n_slices=args.slices, window=args.window, resume=not args.no_resume,
        with_qa=args.qa, emissivity_class=args.emissivity_class,
        celsius=args.celsius, slice_batch=args.slice_batch,
        parquet_codec=args.codec,
    )
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()

"""MTL metadata parsing (C1): Landsat *_MTL.txt key=value text -> scene_meta.

The reference shells the MTL file through its option parser and plucks
RADIANCE_MULT/ADD and K1/K2 constants ([U] i.landsat8.swlst.py :: mtl option,
SURVEY.md §2.1 C1). Spark-first restatement: ``spark.read.text`` over a glob
of MTL files (thousands of scenes = one distributed scan), regex key/value
extraction, pivot to one row per scene — then broadcast-joined to tiles.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

MTL_KEYS = {
    "RADIANCE_MULT_BAND_10": "ml_b10",
    "RADIANCE_ADD_BAND_10": "al_b10",
    "RADIANCE_MULT_BAND_11": "ml_b11",
    "RADIANCE_ADD_BAND_11": "al_b11",
    "K1_CONSTANT_BAND_10": "k1_b10",
    "K2_CONSTANT_BAND_10": "k2_b10",
    "K1_CONSTANT_BAND_11": "k1_b11",
    "K2_CONSTANT_BAND_11": "k2_b11",
}
_SCENE_KEY = "LANDSAT_SCENE_ID"
_KV_RE = r'^\s*(\w+)\s*=\s*"?([^"]*?)"?\s*$'


def parse_mtl(spark: SparkSession, path_glob: str) -> DataFrame:
    """Parse a glob of MTL text files into a scene_meta-shaped DataFrame."""
    lines = spark.read.text(path_glob).withColumn("file", F.input_file_name())
    kv = (
        lines.select(
            "file",
            F.regexp_extract("value", _KV_RE, 1).alias("key"),
            F.regexp_extract("value", _KV_RE, 2).alias("val"),
        )
        .filter(F.col("key").isin([_SCENE_KEY, *MTL_KEYS]))
    )
    pivoted = (
        kv.groupBy("file")
        .pivot("key", [_SCENE_KEY, *MTL_KEYS])
        .agg(F.first("val"))
    )
    out = pivoted.select(
        F.col(_SCENE_KEY).alias("scene_id"),
        *[F.col(k).cast("double").alias(v) for k, v in MTL_KEYS.items()],
    )
    return out


def write_synth_mtl(out_dir: str, scene_meta_rows: list[dict]) -> None:
    """Deterministic MTL text fixtures mirroring the real file format."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    inv = {v: k for k, v in MTL_KEYS.items()}
    for row in scene_meta_rows:
        body = [
            "GROUP = L1_METADATA_FILE",
            "  GROUP = METADATA_FILE_INFO",
            f'    LANDSAT_SCENE_ID = "{row["scene_id"]}"',
            "  END_GROUP = METADATA_FILE_INFO",
            "  GROUP = RADIOMETRIC_RESCALING",
        ]
        for col in ("ml_b10", "al_b10", "ml_b11", "al_b11"):
            body.append(f"    {inv[col]} = {row[col]:.6E}")
        body.append("  END_GROUP = RADIOMETRIC_RESCALING")
        body.append("  GROUP = TIRS_THERMAL_CONSTANTS")
        for col in ("k1_b10", "k2_b10", "k1_b11", "k2_b11"):
            body.append(f"    {inv[col]} = {row[col]:.4f}")
        body += ["  END_GROUP = TIRS_THERMAL_CONSTANTS", "END_GROUP = L1_METADATA_FILE", "END"]
        (out / f'{row["scene_id"]}_MTL.txt').write_text("\n".join(body))

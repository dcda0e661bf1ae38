"""PySpark-native split-window LST + spatial-join/tiling engine.

From-scratch reimplementation of the query/data-processing capabilities of
the ``i.landsat8.swlst`` GRASS GIS addon (practical split-window Land Surface
Temperature from Landsat-8 TIRS; Du et al. 2015, Remote Sensing 7(1):647-665;
CWV per Ren et al. 2015 MSWCVM), restated Spark-first:

- Catalyst Column algebra for scalar math (whole-stage codegen fuses it);
- ONE fused Arrow kernel (``mapInArrow``) per tile for the array path
  decode -> BT -> CWV -> LST (the analog of the reference's "one big
  mapcalc expression", SURVEY.md section 2.1 C11);
- broadcast hash joins for the coefficient/emissivity/MTL lookups the
  reference does with Python dicts;
- H3-role hex / S2 cell indexing, broadcast R-tree point-in-polygon,
  kNN-to-stations, raster<->vector, salting and checkpoint/resume for the
  web-scale graft (BASELINE.json north_rule).

The reference mount /root/reference was EMPTY this session (SURVEY.md section
0); citations refer to expected reference locations, coefficients are
transcribed from the published papers and isolated in data/*.csv so they can
be swapped for the reference CSVs verbatim without code changes.
"""

__version__ = "0.1.0"

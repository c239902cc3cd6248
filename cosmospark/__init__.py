"""cosmospark — a PySpark-native spatial-join + tiling engine.

A from-scratch reimplementation of the query semantics of
osm-without-borders/cosmogony (reference at /root/reference, v0.14.5) as
staged PySpark DataFrame jobs, designed for a table of 10^12 geotagged
(image, caption) rows:

* zone hierarchy construction (containment self-join, typing, parenting,
  labels) on the small broadcast-scale zone dimension
  (reference: src/lib.rs:236-277 ``build_cosmogony``),
* billion-row point-in-polygon zone assignment + tile-pyramid encoding on
  the fact side via vectorized Arrow batches
  (reference: src/additional_zones.rs:102-120 ``get_parent``),
* plus large-scale training-data pipeline operators (dedup, similarity
  search, text analysis) that the reference does not have but a 100 TB
  deployment needs.

All geometry is pure numpy (no GEOS/shapely in this environment); the
distribution mechanism replacing the reference's rstar R-tree
(src/hierarchy_builder.rs:34-74) is a hierarchical quadkey cell grid.
"""

__version__ = "0.1.0"

from cosmospark.session import get_spark  # noqa: F401

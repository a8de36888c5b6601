"""morituri_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch re-expression of the query/data-processing capabilities of
geofabrik/morituri (the C++ Navteq/HERE→OSM converter, surveyed in
/root/repo/SURVEY.md) as idiomatic Spark DataFrame pipelines, extended with
the Spark-scale spatial operators the reference lacks (cell indexing,
point-in-polygon zone assignment, kNN enrichment, raster-tile↔vector-zone
joins) plus large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing).

Design rules (enforced throughout):
  * DataFrame / Catalyst first; no RDDs.
  * Python only inside Arrow-vectorized pandas UDFs (``pandas_udf``,
    ``applyInPandas``, ``mapInPandas``) — never row-at-a-time ``udf``.
  * Dimension tables broadcast; fact-side shuffles keyed and salted
    explicitly; AQE on.
  * Deterministic everywhere (seeded synthesis, stable ids) so results are
    oracle-checkable bit-for-bit.
"""

__version__ = "0.1.0"

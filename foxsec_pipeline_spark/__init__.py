"""foxsec_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query / data-processing
capabilities of mozilla-services/foxsec-pipeline (Apache Beam, Java)
on Apache Spark: DataFrame/SQL for the logical plan, Catalyst +
Tungsten for physical execution, Structured Streaming for the
streaming surface.

Layout
------
- ``session``     SparkSession factory tuned for the engine
- ``schema``      the normalized event / alert data model
- ``filters``     the JSON EventFilter predicate DSL -> Column compiler
- ``functions``   scalar function library (geo, net, text)
- ``operators``   windowed detection heuristics, dedup, similarity,
                  text analysis — each a pure DataFrame -> DataFrame fn
- ``parser``      raw log line -> normalized event columnar parser
- ``sources``     input abstraction (file / stream / multiplex)
- ``sinks``       output plane (json sink, alert IO)
- ``alert``       alert model, formatting, suppression (batch)
- ``streaming``   stateful streaming operators (suppressors, velocity)

Design rules (see SCALE.md): no row-at-a-time Python UDFs on hot
paths; broadcast small dimensions; window-aligned join keys; filters
before parses so Catalyst pushes them into the scan.
"""

__version__ = "0.1.0"

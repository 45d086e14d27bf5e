"""geospatial_spark — a from-scratch PySpark-native inverted-index + BM25
top-k query engine over multi-turn transcript tables, carrying the
capability set of the reference OpenSearch geospatial plugin
(/root/reference) re-expressed Spark-first.

Reference capability → package map (see SURVEY.md §2):
  ingest processors  (processor/FeatureProcessor.java)      → functions/tokenize.py
  field indexers     (index/mapper/xypoint|xyshape)         → operators/postings.py
  query operators    (index/query/*)                        → operators/scorer.py, operators/wand.py
  grid bucket agg    (search/aggregations/bucket/geogrid)   → operators/grid.py
  enrichment join    (ip2geo/dao/*)                         → operators/enrich.py
  datasource lifecycle (ip2geo/jobscheduler/*)              → plans/lifecycle.py, plans/build.py
  stats fan-out      (stats/upload/*)                       → plans/build.py metrics
"""

__version__ = "0.1.0"

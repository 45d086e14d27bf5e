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

# Allocator hygiene for the numpy/Arrow kernels (guide §5: memory).
# numpy madvises MADV_HUGEPAGE on every large allocation; on hosts where
# transparent_hugepage/defrag routes those faults through synchronous
# compaction (or where free memory is fragmented), first-touch of each
# fresh temp array serializes in the kernel — measured 6×+ wall blowup
# on the 16-way merge/encode kernels, pure system time. The kernels'
# throughput does not depend on huge pages (stream-shaped numpy ops),
# so default the madvise off; the env var must be set before numpy is
# first imported, which is why it lives here. Spark python workers
# inherit the driver's environment in local mode, so this covers the
# executor side too. Deployments that want huge pages back can export
# NUMPY_MADVISE_HUGEPAGE=1 (setdefault never overrides an explicit
# choice).
import os as _os

_os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

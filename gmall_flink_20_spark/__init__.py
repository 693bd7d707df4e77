"""gmall_flink_20_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
``Wnswdwy/gmall-flink-20`` (a Flink 1.10 DataStream e-commerce analytics
suite, see SURVEY.md) as an idiomatic Spark DataFrame / Spark SQL /
Structured Streaming library, plus the large-scale training-data pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing)
such an engine needs at 100 TB scale.

Layout
------
- ``session``    SparkSession factory (AQE, shuffle partitions, UTC, ns-parquet)
- ``io``         table loaders over the driver-generated parquet test data
- ``operators``  windowed aggs, top-n, distinct, joins, patterns, blacklist,
                 dedup (exact/LSH/simhash/edit/incremental), similarity +
                 ANN (LSH/IVF/PQ/rerank) + PCA, text analysis, curation,
                 sampling/splits, sketches (GK/CMS/MG), profiling &
                 quality checks, graph (CC, PageRank), analytics
                 (funnel/retention/RFM/co-occurrence/engagement), layout
                 (z-order), skew tools, multimodal plumbing
- ``plans``      end-to-end analytic plans (TPC-H-style benchmark queries)
- ``streaming``  Structured Streaming variants (watermarks, stateful ops)
- ``queries``    the registry consumed by ``__spark_entry__.py``
"""

__version__ = "0.1.0"

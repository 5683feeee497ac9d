"""explora_kafka_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of IBCNServices/explora-kafka.

The reference (/root/reference, Kafka Streams + RocksDB) maintains incrementally
updated count/sum/avg views keyed by (geo cell, truncated timestamp) and answers
two query shapes over them: *history* (time series over a cell set) and
*snapshot* (choropleth over a bbox at one instant). This package re-expresses
that algebra Spark-first:

- views are DataFrame aggregations over (metric, cell, bucket) — one finest-grain
  aggregation plus a rollup cascade replaces the reference's M*P*4 independent
  Kafka Streams subtopologies (IngestStream.java:302-394);
- queries are declarative filters + re-aggregations that Catalyst pushes down to
  the parquet scan, replacing RocksDB key-range scans
  (QueryingController.java:212-282);
- geo/tile math (util/QuadHash.java) is pure Python driver-side for covers and
  native Column bit-arithmetic (whole-stage codegen) for per-row keys.

Layout:
    functions/   scalar modules: geo codecs, time truncation
    sources/     table loaders + bronze "readings" derivations
    plans/       view-lattice builder, history/snapshot query builders
    operators/   extension ops: dedup, similarity search, text, multimodal
    streaming/   micro-batch ingestion + foreachBatch MERGE view store
    api.py       param validation (L5), dispatch, Message envelope (S7)
"""

__version__ = "0.1.0"

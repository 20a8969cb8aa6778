"""hiveka_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of HiveKa/HiveKa (reference: a Hive storage
handler exposing Kafka topics as queryable tables), rebuilt Spark-first.

Layout
------
- ``session``    : SparkSession factory tuned for scale (AQE, Arrow, adaptive shuffle).
- ``catalog``    : table registration over the parquet fixtures and Kafka tables
                   (parity with KafkaStorageHandler / KafkaBackedTableProperties).
- ``schema``     : DDL <-> StructType <-> Avro schema conversion
                   (parity with AvroSchemaGenerator.java:19-32,
                   KafkaAvroMessageDecoder.java:49-79).
- ``sources``    : Kafka batch/stream read+write option mapping, offset store
                   (parity with KafkaInputFormat / KafkaReader / KafkaOutputFormat),
                   pure-Python Avro binary codec (parity with
                   KafkaAvroMessageDecoder.java:153-177 / BaseProducer.java:44-54).
- ``queries``    : the declared relational query inventory (SURVEY.md §2B) and
                   extension operators (§2C) as (spark, sf_dir) -> DataFrame
                   callables with DuckDB oracle SQL.
- ``operators``  : dedup (exact / minhash / simhash / ngram-jaccard / embedding),
                   similarity search (brute-force + LSH ANN), text analysis,
                   as-of join, multimodal column plumbing.
- ``streaming``  : Structured Streaming pipelines (watermark, windows, session
                   windows, streaming dedup, stream-static joins).
- ``plans``      : explain()/plan-inspection helpers used by tests to assert
                   pushdown, broadcast, and codegen properties.
"""

__version__ = "0.1.0"

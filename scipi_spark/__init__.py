"""scipi_spark — a PySpark-native analytics engine with the capabilities of
achmand/SciPi (scholarly-publication analytics), rebuilt Spark-first.

Modules
-------
- ``session``: tuned SparkSession factory (AQE, Arrow, broadcast thresholds).
- ``schemas``: the Publication data model + raw-source schemas (SURVEY §1).
- ``ingest``: source parsing + 7-rule validation (P1–P5).
- ``operators.analytics``: the six SciPi streaming aggregations as batch twins
  (P7–P12) + topics thresholding (T1–T3) + viz-layer tables (V1–V5).
- ``operators.association``: cosine author↔keyword association + bipartite
  projection collaborator recommendation (A1–A11).
- ``operators.community``: heterogeneous publication graph + Leung-style
  label-propagation community detection (C1–C16).
- ``operators.dedup``: exact / MinHash-LSH / SimHash / n-gram-Jaccard dedup.
- ``operators.similarity``: embedding ANN (brute-force + LSH-bucketed cosine).
- ``operators.textops``: language-ID, quality scoring, token counting,
  fingerprinting over document corpora.
- ``operators.multimodal``: binary-column (image/audio) plumbing with stubbed
  decoders.
- ``streaming``: Structured Streaming twins of P7–P12 with upsert sinks.
- ``sources``: parquet/csv/jsonl/kafka-shim readers and writers.
"""

__version__ = "0.1.0"

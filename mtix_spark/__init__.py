"""mtix_spark — a from-scratch PySpark-native inverted-index + BM25 engine.

Re-expresses the query & data-processing capabilities of the reference
(NCBI MTIX, /root/reference) Spark-first:

- ``mtix_spark.index``     — inverted-index build (posting lists, delta+varint,
  block-max metadata, checkpointed segments) and BM25 top-k search
  (brute-force oracle + MaxScore/block-max pruned engine).
- ``mtix_spark.operators`` — mtix pipeline-parity operators (top-N per query,
  score fusion, threshold, nested-result format, metrics) plus large-scale
  training-data ops (dedup, similarity search, text analysis).
- ``mtix_spark.functions`` — scalar/text functions (tokenize, year clamp,
  null-fill cascade, bracket rewrite, query templates, language-ID, quality).
- ``mtix_spark.sources``   — TSV dimension scans, base64+zlib payload codec,
  PubMed-XML-style field extraction.
- ``mtix_spark.streaming`` — Structured-Streaming analogs for the events table.

Everything is DataFrame-native; Python appears only inside Arrow-vectorized
pandas UDFs (tokenize fallback, varint codec, WAND/MaxScore kernels).
"""

__version__ = "0.1.0"

from mtix_spark.session import get_spark  # noqa: F401

"""mtix_spark — a from-scratch PySpark-native inverted-index + BM25 engine.

Re-expresses the query & data-processing capabilities of the reference
(NCBI MTIX, /root/reference) Spark-first:

- ``mtix_spark.index``      — inverted-index build (posting lists,
  delta+varint, block-max metadata, checkpointed segments, salted term
  merge) and BM25 top-k search (brute-force Catalyst path + MaxScore
  segment engine behind ``SegmentSearcher``).
- ``mtix_spark.pipeline``   — mtix run-relation parity operators (top-N per
  query, score fusion, threshold, nested MTI format, subheading attach,
  P/R/F1 metrics).
- ``mtix_spark.dedup``      — exact / n-gram-Jaccard / MinHash-LSH / SimHash
  deduplication.
- ``mtix_spark.similarity`` — exact cosine top-k, multi-table sign-LSH ANN,
  embedding near-dup pairs.
- ``mtix_spark.functions``  — tokenizer + text analysis + reference scalar
  parity ops, all pure Column expressions.
- ``mtix_spark.sources``    — TSV dims, base64+zlib payload codec,
  PubMed-XML-style field extraction, MTI JSON sink.
- ``mtix_spark.multimodal`` — binary media columns, Arrow-batched
  decode/feature/frame plumbing (decoders stubbed).
- ``mtix_spark.streaming``  — incremental index ingestion, watermarked
  window aggs, stateful sessionization.

Everything is DataFrame-native; Python appears only inside Arrow-vectorized
pandas UDFs (tokenize fallback, varint codec, WAND/MaxScore kernels).
"""

__version__ = "0.1.0"

from mtix_spark.session import get_spark  # noqa: F401

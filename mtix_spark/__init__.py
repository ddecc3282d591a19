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
  IVF ANN, embedding near-dup pairs.
- ``mtix_spark.hybrid``     — hybrid lexical+vector retrieval via
  reciprocal-rank fusion (relational and physical-index BM25 legs).
- ``mtix_spark.expand``     — query expansion (wildcard/fuzzy/regexp/range/
  synonyms/suggest/MLT) plus the scoring DSL: function score, dis_max,
  minimum_should_match, top-window rescore.
- ``mtix_spark.functions``  — tokenizer + text analysis + reference scalar
  parity ops, all pure Column expressions.
- ``mtix_spark.sources``    — TSV dims, base64+zlib payload codec,
  PubMed-XML-style field extraction, MTI JSON sink.
- ``mtix_spark.multimodal`` — binary media columns, Arrow-batched
  decode/feature/frame kernels (real PNG/GIF/baseline-JPEG/WAV/AVI
  decoders; compressed A/V codecs honestly stubbed).
- ``mtix_spark.streaming``  — incremental index ingestion, watermarked
  window aggs, stateful sessionization.

Everything is DataFrame-native; Python appears only inside Arrow-vectorized
pandas UDFs (tokenize fallback, varint codec, WAND/MaxScore kernels).
"""

__version__ = "0.1.0"

from mtix_spark.session import get_spark  # noqa: F401

"""Deterministic synthetic source-code corpus (the BASELINE input_hint table).

Schema (authoritative, BASELINE.json:input_hint):
    (repo string, path string, commit string, lang string, content string)

At production scale this is an Iceberg table of 10^12 files; here we
synthesize it deterministically (seed only; no external data) so tests and
benches are reproducible. Generation is **partition-invariant**: every row's
randomness is seeded by its global row id, so the same `n_docs` yields
byte-identical content at any parallelism — required for the
rank-identical-at-two-cluster-sizes criterion (BASELINE.json:north_rule).

Term distribution is Zipf (s≈1.1) over a code-like identifier vocab so
hot-term skew is *real* — the salted posting merge (index/build.py) is
exercised, not just tested in the abstract.

Reference parity: this plays the role of mtix's input corpus of citation
records (src/mtix/utils.py:84-98); `content` is the analog of the
title+abstract text the CNN retrieval stage indexes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SEED = 42
VOCAB_SIZE = 50_000
ZIPF_S = 1.1
MIN_TOKENS, MAX_TOKENS = 50, 2000
LANGS = ["py", "java", "c", "go", "js", "md"]
LANG_P = np.array([0.35, 0.2, 0.15, 0.12, 0.12, 0.06])
_EXT = {"py": "py", "java": "java", "c": "c", "go": "go", "js": "js", "md": "md"}

CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"

_STEMS = [
    "get", "set", "run", "init", "load", "save", "parse", "merge", "split",
    "index", "query", "token", "score", "batch", "node", "list", "map",
    "hash", "tree", "heap", "sort", "scan", "read", "write", "open", "close",
    "push", "pop", "send", "recv", "lock", "free", "alloc", "copy", "move",
    "test", "mock", "util", "core", "base", "meta", "conf", "spec", "impl",
    "data", "file", "path", "repo", "commit", "block", "segment", "term",
    "doc", "post", "delta", "varint", "bm25", "wand", "topk", "count",
]


def build_vocab(size: int = VOCAB_SIZE, seed: int = SEED) -> np.ndarray:
    """Deterministic vocab of code-like identifiers (snake/camel/dotted)."""
    rng = np.random.default_rng(seed)
    stems = np.array(_STEMS)
    a = stems[rng.integers(0, len(stems), size)]
    b = stems[rng.integers(0, len(stems), size)]
    suffix = rng.integers(0, 1000, size)
    style = rng.integers(0, 4, size)
    out = np.empty(size, dtype=object)
    for i in range(size):
        if style[i] == 0:
            out[i] = f"{a[i]}_{b[i]}"
        elif style[i] == 1:
            out[i] = f"{a[i]}{b[i].capitalize()}"
        elif style[i] == 2:
            out[i] = f"{a[i]}{suffix[i]}"
        else:
            out[i] = f"{a[i]}_{b[i]}{suffix[i]}"
    # ensure uniqueness is not required (duplicate surface forms are fine —
    # they just merge into one term), but keep head distinct for queries
    return out


def _zipf_cdf(size: int = VOCAB_SIZE, s: float = ZIPF_S) -> np.ndarray:
    p = 1.0 / np.arange(1, size + 1) ** s
    p /= p.sum()
    return np.cumsum(p)


def _doc_seed(doc_id: int, salt: int = SEED) -> int:
    h = hashlib.blake2b(f"{salt}:{doc_id}".encode(), digest_size=8).digest()
    return int.from_bytes(h, "little")


def synth_corpus(spark: SparkSession, n_docs: int, n_parts: int | None = None) -> DataFrame:
    """Distributed deterministic corpus of `n_docs` files."""
    vocab = build_vocab()
    cdf = _zipf_cdf()
    n_parts = n_parts or max(1, min(spark.sparkContext.defaultParallelism, n_docs // 64 + 1))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
            for did in ids:
                rng = np.random.default_rng(_doc_seed(int(did)))
                lang = LANGS[int(rng.choice(len(LANGS), p=LANG_P))]
                n_tok = int(rng.integers(MIN_TOKENS, MAX_TOKENS + 1))
                idx = np.searchsorted(cdf, rng.random(n_tok))
                content = " ".join(vocab[idx])
                repo = f"org{did % 97}/repo{did % 1013}"
                path = f"src/dir{did % 31}/file_{did}.{_EXT[lang]}"
                commit = hashlib.sha1(f"{SEED}:{repo}:{path}".encode()).hexdigest()
                rows["repo"].append(repo)
                rows["path"].append(path)
                rows["commit"].append(commit)
                rows["lang"].append(lang)
                rows["content"].append(content)
            yield pd.DataFrame(rows)

    return spark.range(0, n_docs, numPartitions=n_parts).mapInPandas(gen, CORPUS_SCHEMA)


def synth_queries(spark: SparkSession, n_queries: int = 100, seed: int = SEED) -> DataFrame:
    """Deterministic query set: 1–8 terms mixing hot / mid / rare / OOV."""
    vocab = build_vocab()
    rng = np.random.default_rng(seed + 1)
    rows = []
    for qid in range(1, n_queries + 1):
        n_terms = int(rng.integers(1, 9))
        terms = []
        for _ in range(n_terms):
            bucket = rng.random()
            if bucket < 0.4:
                terms.append(vocab[int(rng.integers(0, 100))])        # hot
            elif bucket < 0.8:
                terms.append(vocab[int(rng.integers(100, 5000))])     # mid
            elif bucket < 0.95:
                terms.append(vocab[int(rng.integers(5000, VOCAB_SIZE))])  # rare
            else:
                terms.append(f"oov_term_{qid}")                       # OOV
        rows.append((qid, " ".join(terms), 100))
    return spark.createDataFrame(rows, "query_id long, text string, k int")


def fixed_query_strings() -> list[tuple[int, str]]:
    """A small embedded query set usable against any text corpus (the
    driver-provided `documents` table uses a different vocab, so these are
    plain analytics words that appear there)."""
    return [
        (1, "hash join"),
        (2, "table scan fast"),
        (3, "row value part"),
        (4, "merge batch"),
        (5, "slow query agg key"),
    ]

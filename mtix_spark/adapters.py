"""Model-adapter seam: the engine-side mount points for the reference's
remote rerank/subheading models (X7, F9, F10 in SURVEY.md §2).

The reference ships four SageMaker endpoints and shapes requests per
protocol (HF `{inputs, parameters}` vs TF `{instances}`,
/root/reference/src/mtix/endpoints.py:8-43); responses unpack via
LABEL_1 extraction (/root/reference/src/mtix/predictors.py:93) and
index-keyed score alignment (/root/reference/src/mtix/predictors.py:148-158).
Here the *protocol shaping, batching, and unpacking* are engine code —
Arrow-batched, 128 rows per request like the reference's endpoint batches
(/root/reference/src/mtix/endpoints.py:56-67) — while the model itself is an
injected callable `model(request_dict) -> response`, so a user can mount:

- a local cross-encoder (callable wraps a transformers pipeline),
- a remote HTTP endpoint (callable posts the request),
- or the deterministic stubs below (tests / fixtures).

No per-row Python: each mapInPandas batch issues ONE model call over the
whole Arrow batch.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BATCH_SIZE = 128  # reference endpoint batch (src/mtix/endpoints.py:57)

# ---------------------------------------------------------------------------
# X7: request/response protocol shaping (pure functions, unit-tested)
# ---------------------------------------------------------------------------


def hf_request(inputs: list, parameters: dict | None = None) -> dict:
    """HuggingFace-container request shape (endpoints.py:8-24)."""
    req = {"inputs": inputs}
    if parameters:
        req["parameters"] = parameters
    return req


def tf_request(instances: list) -> dict:
    """TensorFlow-serving request shape (endpoints.py:27-43)."""
    return {"instances": instances}


def extract_label1_scores(response: list) -> list[float]:
    """F9: from per-pair `[{label, score}, ...]` rows keep the LABEL_1
    probability (predictors.py:93)."""
    out = []
    for row in response:
        out.append(
            float(next(d["score"] for d in row if d["label"] == "LABEL_1"))
        )
    return out


def unpack_indexed_scores(response: list, n: int) -> list[float]:
    """F10: `{index, score}` dicts → position-aligned score list
    (predictors.py:148-158). Missing indices score 0."""
    scores = [0.0] * n
    for d in response:
        scores[int(d["index"])] = float(d["score"])
    return scores


# ---------------------------------------------------------------------------
# Scorer mounts (Arrow-batched; model callable injected)
# ---------------------------------------------------------------------------


def score_pairs(
    pairs: DataFrame,
    model: Callable[[dict], list],
    query_col: str = "query",
    passage_col: str = "passage",
    out_col: str = "score",
) -> DataFrame:
    """Pointwise mount: per (query, passage) row, P(LABEL_1) from an
    HF-protocol model. One model call per Arrow batch of ≤BATCH_SIZE rows,
    request/response shaped exactly like the reference's pointwise endpoint
    (predictors.py:90-94: max_length/padding/truncation params,
    return_all_scores, LABEL_1 kept)."""
    params = {
        "max_length": 512,
        "padding": "max_length",
        "truncation": "longest_first",
        "return_all_scores": True,
    }
    cols = pairs.columns

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), BATCH_SIZE):
                chunk = pdf.iloc[lo : lo + BATCH_SIZE]
                req = hf_request(
                    [
                        {"text": q, "text_pair": p}
                        for q, p in zip(chunk[query_col], chunk[passage_col])
                    ],
                    params,
                )
                chunk = chunk.copy()
                chunk[out_col] = extract_label1_scores(model(req))
                yield chunk

    return pairs.mapInPandas(
        kernel, ", ".join(f"{c} {t}" for c, t in pairs.dtypes) + f", {out_col} double"
    ).select(*cols, out_col)


def score_lists(
    lists: DataFrame,
    model: Callable[[dict], list],
    query_col: str = "query",
    passages_col: str = "passages",
    out_col: str = "scores",
) -> DataFrame:
    """Listwise mount: per (query, [passage…]) row, index-aligned scores
    from a TF-protocol model (predictors.py:97-158). One call per Arrow
    batch; response rows carry {index, score} and are re-aligned by
    position (F10)."""
    cols = lists.columns

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), BATCH_SIZE):
                chunk = pdf.iloc[lo : lo + BATCH_SIZE]
                req = tf_request(
                    [
                        {"query": q, "passages": list(ps)}
                        for q, ps in zip(chunk[query_col], chunk[passages_col])
                    ]
                )
                resp = model(req)
                chunk = chunk.copy()
                chunk[out_col] = [
                    unpack_indexed_scores(r, len(ps))
                    for r, ps in zip(resp, chunk[passages_col])
                ]
                yield chunk

    return lists.mapInPandas(
        kernel,
        ", ".join(f"{c} {t}" for c, t in lists.dtypes) + f", {out_col} array<double>",
    ).select(*cols, out_col)


def score_subheadings(
    instances: DataFrame,
    model: Callable[[dict], list],
) -> DataFrame:
    """Subheading mount (UDTF-shaped: 0..n output rows per input,
    predictors.py:161-218): instances (q_id, p_id, citation fields…) →
    quads (q_id, p_id, qui, score). The model returns string quads
    [pmid, dui, qui, score] with an empty-qui sentinel
    (src/mtix/tests/data.py:1835-1853); the sentinel rows pass through —
    P4 drops them downstream, mirroring predictors.py:216."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), BATCH_SIZE):
                chunk = pdf.iloc[lo : lo + BATCH_SIZE]
                req = tf_request(chunk.to_dict("records"))
                rows = {"q_id": [], "p_id": [], "qui": [], "score": []}
                for pmid, dui, qui, score in model(req):
                    rows["q_id"].append(int(pmid))
                    rows["p_id"].append(int(dui))
                    rows["qui"].append(qui)
                    rows["score"].append(float(score))
                yield pd.DataFrame(rows)

    return instances.mapInPandas(
        kernel, "q_id long, p_id long, qui string, score double"
    )


# ---------------------------------------------------------------------------
# Deterministic stub models (fixtures / tests — no external weights)
# ---------------------------------------------------------------------------


def _unit_hash(s: str) -> float:
    """Deterministic pseudo-score in [0, 1)."""
    h = hashlib.blake2b(s.encode(), digest_size=4).digest()
    return int.from_bytes(h, "little") / 2**32


def stub_pointwise_model(request: dict) -> list:
    """HF-shaped stub: P(LABEL_1) = unit hash of the pair text."""
    out = []
    for pair in request["inputs"]:
        p1 = _unit_hash(pair["text"] + "|" + pair["text_pair"])
        out.append(
            [
                {"label": "LABEL_0", "score": 1.0 - p1},
                {"label": "LABEL_1", "score": p1},
            ]
        )
    return out


def stub_listwise_model(request: dict) -> list:
    """TF-shaped stub: per-passage unit-hash scores, indices shuffled by
    construction (emitted in reverse) to exercise F10 re-alignment."""
    out = []
    for inst in request["instances"]:
        n = len(inst["passages"])
        resp = [
            {"index": i, "score": _unit_hash(inst["query"] + "#" + inst["passages"][i])}
            for i in range(n)
        ]
        out.append(list(reversed(resp)))
    return out


def stub_subheading_model(request: dict) -> list:
    """Quad stub: 2 qualifiers per instance plus the empty-qui sentinel row
    the reference's endpoint emits (tests/data.py:1835-1853)."""
    quads = []
    for inst in request["instances"]:
        pmid, dui = str(inst["q_id"]), str(inst["p_id"])
        for qui in ("Q000139", "Q000628"):
            quads.append([pmid, dui, qui, str(_unit_hash(pmid + dui + qui))])
        quads.append([pmid, dui, " ", "0.0"])  # sentinel (P4 target)
    return quads

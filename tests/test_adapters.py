"""Unit tests: model-adapter protocol shaping (X7) and response unpacking
(F9 LABEL_1, F10 index-keyed), matching the reference contracts
(/root/reference/src/mtix/endpoints.py:8-43, predictors.py:93,148-158)."""

from __future__ import annotations

from mtix_spark.adapters import (
    extract_label1_scores,
    hf_request,
    stub_listwise_model,
    stub_pointwise_model,
    stub_subheading_model,
    tf_request,
    unpack_indexed_scores,
)


def test_hf_request_shape():
    req = hf_request([{"text": "q", "text_pair": "p"}], {"max_length": 512})
    assert req == {
        "inputs": [{"text": "q", "text_pair": "p"}],
        "parameters": {"max_length": 512},
    }
    assert hf_request(["x"]) == {"inputs": ["x"]}  # no empty parameters key


def test_tf_request_shape():
    assert tf_request([{"a": 1}]) == {"instances": [{"a": 1}]}


def test_extract_label1_scores_order_insensitive():
    resp = [
        [{"label": "LABEL_0", "score": 0.3}, {"label": "LABEL_1", "score": 0.7}],
        [{"label": "LABEL_1", "score": 0.1}, {"label": "LABEL_0", "score": 0.9}],
    ]
    assert extract_label1_scores(resp) == [0.7, 0.1]


def test_unpack_indexed_scores_realigns_and_fills():
    resp = [{"index": 2, "score": 0.5}, {"index": 0, "score": 0.9}]
    assert unpack_indexed_scores(resp, 4) == [0.9, 0.0, 0.5, 0.0]


def test_stub_models_deterministic_and_shaped():
    req = hf_request([{"text": "a", "text_pair": "b"}], {})
    r1, r2 = stub_pointwise_model(req), stub_pointwise_model(req)
    assert r1 == r2
    assert {d["label"] for d in r1[0]} == {"LABEL_0", "LABEL_1"}
    assert abs(sum(d["score"] for d in r1[0]) - 1.0) < 1e-12

    lreq = tf_request([{"query": "q", "passages": ["x", "y", "z"]}])
    resp = stub_listwise_model(lreq)[0]
    assert sorted(d["index"] for d in resp) == [0, 1, 2]
    assert [d["index"] for d in resp] != [0, 1, 2]  # shuffled → F10 exercised

    sreq = tf_request([{"q_id": 7, "p_id": 3}])
    quads = stub_subheading_model(sreq)
    assert any(q[2].strip() == "" for q in quads)  # sentinel present (P4 target)
    assert all(len(q) == 4 for q in quads)

"""mtix dataflow-parity unit tests — golden semantics transcribed from the
reference's expectations (cited per test), never its code."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_top_n_and_tiebreak(spark):
    """A1/A2: sorted(desc score)[:N] with the fixed (score DESC, p_id ASC)
    tie-break (SURVEY.md §2 semantics note)."""
    from mtix_spark.pipeline import top_n_per_query

    run = spark.createDataFrame(
        [(1, 10, 0.9), (1, 11, 0.9), (1, 12, 0.95), (1, 13, 0.1), (2, 10, 0.5)],
        "q_id long, p_id long, score double",
    )
    out = {(r["q_id"], r["p_id"]) for r in top_n_per_query(run, 2).collect()}
    assert out == {(1, 12), (1, 10), (2, 10)}  # p_id 10 beats 11 on tie


def test_fuse_runs_avg(spark):
    """J6: (s1+s2)/2 on the key intersection
    (/root/reference/src/mtix/utils.py:12-23 contract)."""
    from mtix_spark.pipeline import fuse_runs_avg

    r1 = spark.createDataFrame([(1, 10, 0.4), (1, 11, 0.8)], "q_id long, p_id long, score double")
    r2 = spark.createDataFrame(
        [(1, 10, 0.6), (1, 11, 0.4), (1, 12, 0.9)], "q_id long, p_id long, score double"
    )
    got = {(r["q_id"], r["p_id"]): r["score"] for r in fuse_runs_avg(r1, r2).collect()}
    assert got == {(1, 10): 0.5, (1, 11): 0.6000000000000001}


def test_format_predictions_golden(spark):
    """S8: threshold 0.48 → desc sort → dim joins → nested Indexing list
    (/root/reference/src/mtix/pipelines.py:47-64 shape)."""
    from mtix_spark.pipeline import format_predictions

    run = spark.createDataFrame(
        [(1, 100, 0.9), (1, 101, 0.5), (1, 102, 0.2), (2, 100, 0.48)],
        "q_id long, p_id long, score double",
    )
    names = spark.createDataFrame([(100, "Heart"), (101, "Lung"), (102, "Liver")], "p_id long, name string")
    duis = spark.createDataFrame([(100, "D01"), (101, "D02"), (102, "D03")], "p_id long, dui string")
    rows = {r["q_id"]: r["indexing"] for r in format_predictions(run, names, duis).collect()}
    ix1 = rows[1]
    assert [x["term"] for x in ix1] == ["Heart", "Lung"]  # 0.2 thresholded out
    assert ix1[0]["id"] == "D01" and ix1[0]["type"] == "Descriptor" and ix1[0]["im"] == "NO"
    assert ix1[0]["reason"] == "score: 0.900"
    assert [x["term"] for x in rows[2]] == ["Heart"]  # 0.48 inclusive


def test_attach_subheadings_sentinel_and_sort(spark):
    """Stage 7: empty-qui sentinel dropped (P4), subheadings sorted score
    desc (A4) (/root/reference/src/mtix/predictors.py:183,216)."""
    from mtix_spark.pipeline import attach_subheadings

    preds = spark.createDataFrame([(1, 100)], "q_id long, p_id long")
    quads = spark.createDataFrame(
        [(1, 100, "Q1", 0.9), (1, 100, "Q2", 0.95), (1, 100, "  ", 0.99), (1, 100, "Q3", 0.1)],
        "q_id long, p_id long, qui string, score double",
    )
    names = spark.createDataFrame([("Q1", "surgery"), ("Q2", "genetics"), ("Q3", "therapy")], "qui string, name string")
    out = attach_subheadings(preds, quads, names).collect()[0]["subheadings"]
    assert [s["id"] for s in out] == ["Q2", "Q1"]  # sentinel + sub-threshold dropped
    assert out[0]["name"] == "genetics"


def test_run_metrics(spark):
    """J8/J9/A6: P/R/F1 over distinct tuples, truth restricted to predicted
    q_ids (/root/reference/src/mtix/integration_tests/utils.py:8-38)."""
    from mtix_spark.pipeline import run_metrics

    y_true = spark.createDataFrame(
        [(1, "A"), (1, "B"), (2, "A"), (3, "C")], "q_id long, label string"
    )
    y_pred = spark.createDataFrame(
        [(1, "A"), (1, "C"), (2, "A")], "q_id long, label string"
    )
    m = run_metrics(y_true, y_pred, ["q_id", "label"]).collect()[0]
    # truth restricted to q_ids {1,2} → 3 true, 3 pred, 2 inter
    assert m["n_true"] == 3 and m["n_pred"] == 3 and m["n_inter"] == 2
    assert abs(m["precision"] - 2 / 3) < 1e-6 and abs(m["recall"] - 2 / 3) < 1e-6


def test_sanitize_citation_matrix(spark):
    """F3/F4 null-fill + clamp matrix
    (/root/reference/src/mtix/tests/test_utils.py:60-256 cases)."""
    from mtix_spark.functions.scalar import sanitize_citation

    df = spark.createDataFrame(
        [
            (1, None, None, None),     # all null → <unknown>, 2023, 2023
            (2, "J1", 1890, 1960),     # clamp up → 1902, 1965
            (3, "J2", 2030, 2030),     # clamp down → 2023, 2023
            (4, "J3", None, 1999),     # pub from year_completed
        ],
        "pmid long, journal_nlmid string, pub_year int, year_completed int",
    )
    got = {r["pmid"]: (r["journal_nlmid"], r["pub_year"], r["year_completed"])
           for r in sanitize_citation(df).collect()}
    assert got[1] == ("<unknown>", 2023, 2023)
    assert got[2] == ("J1", 1902, 1965)
    assert got[3] == ("J2", 2023, 2023)
    assert got[4] == ("J3", 1999, 1999)


def test_extract_pub_year_cases(spark):
    """F5 MedlineDate variants
    (/root/reference/src/mtix/tests/test_utils.py:311-322 cases)."""
    from mtix_spark.functions.scalar import extract_pub_year

    df = spark.createDataFrame(
        [("2021 Dec",), ("Winter 2019",), ("no year here",), ("1998-1999",)],
        "s string",
    )
    got = [r["y"] for r in df.select(extract_pub_year("s").alias("y")).collect()]
    assert got == [2021, 2019, None, 1998]


def test_extract_pub_year_full_reference_matrix(spark):
    """F5 with the fuzzy tail — the reference's complete MedlineDate matrix
    (/root/reference/src/mtix/tests/test_utils.py:311-322), including the
    dateutil-only cases '24th March 2018' and \"24th Mar '01\"."""
    from mtix_spark.functions.scalar import extract_pub_year_full

    cases = [
        ("2021 Mar-Apr 01", 2021),
        ("1998 Dec-1999 Jan", 1998),
        ("2022 Spring", 2022),
        ("2016 Spring-Summer", 2016),
        ("1965 Nov-Dec", 1965),
        ("2000 Dec 23-30", 2000),
        ("", None),
        ("invalid", None),
        ("Summer 2009", 2009),
        ("24th March 2018", 2018),
        ("24th Mar '01", 2001),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], "s string")
    got = [r["y"] for r in df.select(extract_pub_year_full("s").alias("y")).collect()]
    assert got == [y for _, y in cases]


def test_parse_citations_fuzzy_medline_date(spark):
    """S6 parser applies the same fuzzy tail for regex-miss MedlineDates."""
    import base64
    import zlib

    from mtix_spark.sources.citations import parse_citations

    xml = (
        "<MedlineCitation><PMID>9</PMID><Article>"
        "<Journal><Title>J</Title><JournalIssue><PubDate>"
        "<MedlineDate>24th Mar '01</MedlineDate>"
        "</PubDate></JournalIssue></Journal>"
        "<ArticleTitle>T</ArticleTitle></Article></MedlineCitation>"
    )
    data = base64.b64encode(zlib.compress(xml.encode())).decode("ascii")
    df = spark.createDataFrame([(9, data)], "uid long, data string")
    row = parse_citations(df).collect()[0]
    assert row["pub_year"] == 2001


def test_replace_brackets_conditional(spark):
    """P5: rewrite only when the `]\\s*[` pattern appears
    (/root/reference/src/mtix/predictors.py:8-19)."""
    from mtix_spark.functions.scalar import replace_brackets

    df = spark.createDataFrame(
        [("a [x] [y] b",), ("keep [single] brackets",)], "s string"
    )
    got = [r["o"] for r in df.select(replace_brackets("s").alias("o")).collect()]
    assert got == ["a (x) (y) b", "keep [single] brackets"]


def _ref_compute_metrics(y_true, y_pred, s_filter=None):
    """The reference's compute_metrics
    (/root/reference/src/mtix/integration_tests/utils.py:8-38) restated
    over (q_id, label, sub) triples for parity checking."""
    eps = 1e-9
    pred_q = {q for q, _, _ in y_pred}
    keep = lambda s: s == "" or s_filter is None or s in s_filter
    t = {(q, d, s) for q, d, s in y_true if q in pred_q and keep(s)}
    p = {(q, d, s) for q, d, s in y_pred if keep(s)}
    m = len(t & p)
    pr = m / (len(p) + eps)
    rc = m / (len(t) + eps)
    return pr, rc, 2 * pr * rc / (pr + rc + eps)


def test_run_metrics_critical_subheading_filter(spark):
    """Filtered-metric parity with the reference's s_filter semantics
    (test_pipelines.py:103-106): critical-qualifier triples only, with
    descriptor-only ('' subheading) triples always kept, and the q_id
    restriction taken from UNFILTERED predictions."""
    from mtix_spark.pipeline import CRITICAL_SUBHEADINGS, run_metrics

    true_triples = [
        (1, "A", "surgery"), (1, "A", "blood"), (1, "B", ""),
        (2, "A", "therapy"), (2, "C", "blood"),
        (3, "C", "genetics"),       # truth for a q_id predicted only with
                                    # non-critical subs — must still count
        (4, "D", "surgery"),        # unpredicted q_id → excluded both ways
    ]
    pred_triples = [
        (1, "A", "surgery"), (1, "A", "pharmacology"), (1, "B", ""),
        (2, "A", "therapy"), (2, "A", "blood"),
        (3, "C", "blood"),          # all of q3's preds are non-critical
    ]
    schema = "q_id long, label string, sub string"
    y_true = spark.createDataFrame(true_triples, schema)
    y_pred = spark.createDataFrame(pred_triples, schema)
    keys = ["q_id", "label", "sub"]

    for flt in (None, CRITICAL_SUBHEADINGS):
        kf = None if flt is None else ("sub", flt)
        got = run_metrics(y_true, y_pred, keys, key_filter=kf).collect()[0]
        pr, rc, f1 = _ref_compute_metrics(true_triples, pred_triples, flt)
        assert abs(got["precision"] - pr) < 1e-9
        assert abs(got["recall"] - rc) < 1e-9
        assert abs(got["f1"] - f1) < 1e-9

    # the filter changes the numbers on this data (sanity that it bites)
    full = run_metrics(y_true, y_pred, keys).collect()[0]
    crit = run_metrics(
        y_true, y_pred, keys, key_filter=("sub", CRITICAL_SUBHEADINGS)
    ).collect()[0]
    assert (full["n_true"], full["n_pred"]) != (crit["n_true"], crit["n_pred"])

"""Source/sink operator tests (SURVEY.md §2.A S1–S8) with self-authored
PubMed-like XML fixtures (DTD shapes, not reference data)."""

from __future__ import annotations

import base64
import zlib

from pyspark.sql import functions as F


def _enc(xml: str) -> str:
    return base64.b64encode(zlib.compress(xml.encode())).decode()


XML_FULL = """<MedlineCitation>
 <PMID>12345</PMID>
 <DateCompleted><Year>2001</Year></DateCompleted>
 <MedlineJournalInfo><NlmUniqueID>0404511</NlmUniqueID></MedlineJournalInfo>
 <Article>
  <Journal>
   <Title>  Journal of Testing </Title>
   <JournalIssue><PubDate><Year>2000</Year></PubDate></JournalIssue>
  </Journal>
  <ArticleTitle>A title with <i>markup</i> inside.</ArticleTitle>
  <Abstract>
   <AbstractText Label="BACKGROUND">Some background.</AbstractText>
   <AbstractText Label="RESULTS">Some results.</AbstractText>
  </Abstract>
 </Article>
</MedlineCitation>"""

XML_MEDLINEDATE = """<MedlineCitation>
 <PMID>67</PMID>
 <Article>
  <Journal>
   <Title>J2</Title>
   <JournalIssue><PubDate><MedlineDate>Winter 1999</MedlineDate></PubDate></JournalIssue>
  </Journal>
  <ArticleTitle>T2</ArticleTitle>
 </Article>
</MedlineCitation>"""


def test_payload_codec_roundtrip(spark):
    from mtix_spark.sources.citations import decode_payload, encode_payload

    df = spark.createDataFrame([("hello wörld",), (None,)], "s string")
    out = df.select(decode_payload(encode_payload(F.col("s"))).alias("o")).collect()
    assert [r["o"] for r in out] == ["hello wörld", None]


def test_parse_citations_fields(spark):
    from mtix_spark.sources.citations import parse_citations

    payloads = spark.createDataFrame(
        [(12345, _enc(XML_FULL)), (67, _enc(XML_MEDLINEDATE))], "uid long, data string"
    )
    rows = {r["pmid"]: r for r in parse_citations(payloads).collect()}
    r = rows[12345]
    assert r["title"] == "A title with markup inside."
    assert r["abstract"] == "BACKGROUND: Some background. RESULTS: Some results."
    assert r["journal_nlmid"] == "0404511"
    assert r["journal_title"] == "Journal of Testing"
    assert r["pub_year"] == 2000 and r["year_completed"] == 2001
    r2 = rows[67]
    assert r2["pub_year"] == 1999  # MedlineDate fallback
    assert r2["abstract"] is None and r2["year_completed"] is None


def test_gzip_json_source(spark, tmp_path):
    """S3: Spark's codec handling reads gzip-compressed JSON transparently
    (the reference's gzip test-set scan, utils via json.load(gzip.open))."""
    import gzip
    import json as J

    from mtix_spark.sources.citations import read_uid_payload_json

    rows = [{"uid": 1, "data": "abc"}, {"uid": 2, "data": "def"}]
    p = str(tmp_path / "payload.json.gz")
    with gzip.open(p, "wt") as f:
        J.dump(rows, f)
    got = {r["uid"]: r["data"] for r in read_uid_payload_json(spark, p).collect()}
    assert got == {1: "abc", 2: "def"}


def test_tsv_dim_and_mti_sink(spark, tmp_path):
    from mtix_spark.pipeline import format_predictions
    from mtix_spark.sources.citations import read_tsv_dim, write_mti_json

    tsv = tmp_path / "dims.tsv"
    tsv.write_text("100\tHeart\n101\tLung\n")
    dim = read_tsv_dim(spark, str(tsv))
    assert {(r["id"], r["name"]) for r in dim.collect()} == {("100", "Heart"), ("101", "Lung")}

    run = spark.createDataFrame([(12345, 100, 0.9)], "q_id long, p_id long, score double")
    names = dim.select(F.col("id").cast("long").alias("p_id"), "name")
    duis = spark.createDataFrame([(100, "D01")], "p_id long, dui string")
    preds = format_predictions(run, names, duis)
    payloads = spark.createDataFrame([(12345, "payload64")], "uid long, data string")
    out_dir = str(tmp_path / "mti")
    write_mti_json(preds, payloads, out_dir)
    back = spark.read.json(out_dir)
    row = back.collect()[0]
    assert row["PMID"] == 12345 and row["text-gz-64"] == "payload64"
    assert row["Indexing"][0]["term"] == "Heart"


def test_uid_payload_json_xz(spark, tmp_path):
    """S3 xz half: no Hadoop XZ codec exists, so .xz routes through
    binaryFile + a distributed lzma kernel; values identical to the gz
    path."""
    import json as J
    import lzma

    rows = [{"uid": 1, "data": "abc"}, {"uid": 2, "data": "def"}, {"uid": 3}]
    p = str(tmp_path / "payload.json.xz")
    with lzma.open(p, "wt") as f:
        J.dump(rows, f)
    got = {r["uid"]: r["data"] for r in read_uid_payload_json_mod(spark, p).collect()}
    assert got == {1: "abc", 2: "def", 3: None}


def read_uid_payload_json_mod(spark, p):
    from mtix_spark.sources.citations import read_uid_payload_json

    return read_uid_payload_json(spark, p)

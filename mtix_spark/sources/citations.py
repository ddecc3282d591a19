"""Reference source/sink operators (SURVEY.md §2.A S1–S8) as Spark ops.

- S1 TSV dimension scan      → read_tsv_dim (2-col headerless TSV, broadcast)
- S2 JSON list source        → read_uid_payload_json
- S4/S5 base64+zlib codec    → decode_payload / encode_payload (Arrow-batched
  pandas UDFs; zlib has no JVM builtin, so this is a legitimate Python hop —
  one batch in, one batch out, never per-row round trips)
- S6 PubMed XML parse        → parse_citations (7-field citation struct,
  field semantics from /root/reference/src/mtix/utils.py:101-172: trimmed
  text nodes, Label-prefixed abstract sections, MedlineDate→year fallback)
- S8 MTI JSON sink           → write_mti_json

The citation schema is the reference's implicit record shape
(/root/reference/src/mtix/utils.py:162-170): pmid, title, abstract,
journal_nlmid, journal_title, pub_year, year_completed — nullable years.
"""

from __future__ import annotations

import base64
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

CITATION_SCHEMA = (
    "pmid long, title string, abstract string, journal_nlmid string, "
    "journal_title string, pub_year int, year_completed int"
)


def read_tsv_dim(spark: SparkSession, path: str, key: str = "id", value: str = "name") -> DataFrame:
    """S1: 2-column headerless TSV → broadcastable dim
    (/root/reference/src/mtix/utils.py:26-29)."""
    return spark.read.csv(path, sep="\t", schema=f"{key} string, {value} string")


def read_uid_payload_json(spark: SparkSession, path: str) -> DataFrame:
    """S2/S3: JSON array of {uid, data}.

    gzip rides Spark's builtin Hadoop codec. xz has NO Hadoop codec, so
    `.xz` paths route through `binaryFile` + a distributed lzma+json kernel
    — one task per file, which is the honest parallelism for a
    non-splittable codec (same as gz); the reference reads these files with
    Python `xz.open` single-node (integration_tests/test_pipelines.py:95).
    """
    if path.endswith(".xz"):
        import json as _json
        import lzma
        from typing import Iterator

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = {"uid": [], "data": []}
                for blob in pdf["content"]:
                    for row in _json.loads(lzma.decompress(bytes(blob))):
                        out["uid"].append(int(row["uid"]))
                        out["data"].append(row.get("data"))
                yield pd.DataFrame(out)

        return (
            spark.read.format("binaryFile")
            .load(path)
            .select("content")
            .mapInPandas(kernel, "uid long, data string")
        )
    return spark.read.json(path, schema="uid long, data string", multiLine=True)


def decode_payload(col: Column) -> Column:
    """S4: base64(zlib(text)) → text (/root/reference/src/mtix/utils.py:41-45).

    The pandas_udf is created at call time (driver-side), never at module
    import — executors import this module when unpickling kernels and have
    no SparkSession to resolve the DDL return type against."""

    @pandas_udf("string")
    def _decode(data: pd.Series) -> pd.Series:
        return data.map(
            lambda s: zlib.decompress(base64.b64decode(s)).decode("utf-8")
            if s is not None
            else None
        )

    return _decode(col)


def encode_payload(col: Column) -> Column:
    """S5: text → base64(zlib(text)) (/root/reference/src/mtix/utils.py:34-39)."""

    @pandas_udf("string")
    def _encode(text: pd.Series) -> pd.Series:
        return text.map(
            lambda s: base64.b64encode(zlib.compress(s.encode("utf-8"))).decode("ascii")
            if s is not None
            else None
        )

    return _encode(col)


def _parse_one(xml: str) -> dict:
    """One MedlineCitation XML → 7-field dict. Field paths and trimming
    follow the reference parser's contract
    (/root/reference/src/mtix/utils.py:101-172); written against the PubMed
    DTD, not the reference implementation."""
    import re
    import xml.etree.ElementTree as ET

    root = ET.fromstring(xml)
    if root.tag != "MedlineCitation":
        found = root.find(".//MedlineCitation")
        root = found if found is not None else root

    def text_of(el):
        return "".join(el.itertext()).strip() if el is not None else None

    pmid = text_of(root.find("PMID"))
    title = text_of(root.find("Article/ArticleTitle"))
    # abstract: sections joined with spaces, labeled sections prefixed "LABEL: "
    sections = []
    for ab in root.findall("Article/Abstract/AbstractText"):
        t = text_of(ab)
        if not t:
            continue
        label = ab.get("Label")
        sections.append(f"{label}: {t}" if label else t)
    abstract = " ".join(sections) if sections else None
    journal_nlmid = text_of(root.find("MedlineJournalInfo/NlmUniqueID"))
    journal_title = text_of(root.find("Article/Journal/Title"))

    pub_year = None
    y = text_of(root.find("Article/Journal/JournalIssue/PubDate/Year"))
    if y and y.isdigit():
        pub_year = int(y)
    else:
        md = text_of(root.find("Article/Journal/JournalIssue/PubDate/MedlineDate"))
        if md:
            # full F5 contract (src/mtix/utils.py:176-190): first-4-chars
            # numeric, else first \d{4}, else dateutil fuzzy ("24th Mar '01")
            if len(md) >= 4 and md[:4].isdigit():
                pub_year = int(md[:4])
            else:
                m = re.search(r"\d{4}", md)
                if m:
                    pub_year = int(m.group(0))
                else:
                    try:
                        from dateutil import parser as duparser

                        pub_year = duparser.parse(md, fuzzy=True).date().year
                    except Exception:
                        pub_year = None
    yc = text_of(root.find("DateCompleted/Year"))
    year_completed = int(yc) if yc and yc.isdigit() else None

    return {
        "pmid": int(pmid) if pmid else None,
        "title": title,
        "abstract": abstract,
        "journal_nlmid": journal_nlmid,
        "journal_title": journal_title,
        "pub_year": pub_year,
        "year_completed": year_completed,
    }


def parse_citations(payloads: DataFrame, data_col: str = "data") -> DataFrame:
    """S4+S6 fused: {uid, data=base64(zlib(xml))} → citation rows.

    One mapInPandas pass: decode + XML parse per Arrow batch (XML parsing is
    irreducibly per-document; the batching keeps serialization amortized —
    the analog of the reference's 128-row endpoint batches)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for s in pdf[data_col]:
                xml = zlib.decompress(base64.b64decode(s)).decode("utf-8")
                rows.append(_parse_one(xml))
            yield pd.DataFrame(rows)

    return payloads.mapInPandas(kernel, CITATION_SCHEMA)


def write_mti_json(predictions: DataFrame, payloads: DataFrame, path: str) -> None:
    """S8: nested prediction docs joined back to their payload (J5) and
    written as JSON — {PMID, text-gz-64, Indexing:[...]} per row
    (/root/reference/src/mtix/pipelines.py:47-64 shape)."""
    out = (
        predictions.withColumnRenamed("q_id", "PMID")
        .join(
            payloads.select(F.col("uid").alias("PMID"), F.col("data").alias("text-gz-64")),
            "PMID",
        )
        .select("PMID", "text-gz-64", F.col("indexing").alias("Indexing"))
    )
    out.write.mode("overwrite").json(path)

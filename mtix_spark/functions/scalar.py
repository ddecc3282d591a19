"""mtix pipeline-parity scalar functions, as pure Column expressions.

Each function cites the reference behavior it re-expresses
(paths into /root/reference/).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_YEAR = 2023          # src/mtix/sagemaker_factory.py:13
MIN_PUB_YEAR = 1902      # src/mtix/utils.py:50-53
MIN_YEAR_COMPLETED = 1965  # src/mtix/utils.py:67-71
UNKNOWN_JOURNAL = "<unknown>"  # src/mtix/utils.py:56-57


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def clamp_year(col: Column | str, lo: int, hi: int = MAX_YEAR) -> Column:
    """Clamp into [lo, hi] (src/mtix/utils.py:50-53,67-71)."""
    return F.least(F.greatest(_c(col).cast("int"), F.lit(lo)), F.lit(hi))


def sanitize_citation(df: DataFrame) -> DataFrame:
    """Null-fill cascade + year clamps (src/mtix/utils.py:48-75):
      journal_nlmid  -> '<unknown>'
      pub_year       -> coalesce(pub_year, year_completed, MAX_YEAR), clamp [1902, 2023]
      year_completed -> coalesce(year_completed, MAX_YEAR), clamp [1965, 2023]
    """
    pub = F.coalesce(F.col("pub_year"), F.col("year_completed"), F.lit(MAX_YEAR))
    yc = F.coalesce(F.col("year_completed"), F.lit(MAX_YEAR))
    return (
        df.withColumn("journal_nlmid", F.coalesce(F.col("journal_nlmid"), F.lit(UNKNOWN_JOURNAL)))
        .withColumn("pub_year", clamp_year(pub, MIN_PUB_YEAR))
        .withColumn("year_completed", clamp_year(yc, MIN_YEAR_COMPLETED))
    )


def replace_brackets(col: Column | str) -> Column:
    """If the text matches `]\\s*[`, replace all [ -> ( and ] -> )
    (src/mtix/predictors.py:8-19 — SageMaker API bug workaround)."""
    c = _c(col)
    return F.when(c.rlike(r"\]\s*\["), F.translate(c, "[]", "()")).otherwise(c)


def query_template(
    pub_year: Column | str,
    journal_title: Column | str,
    title: Column | str,
    abstract: Column | str,
    leading_bar: bool = False,
) -> Column:
    """'{year}|{journal}|{title}|{abstract}' (src/mtix/predictors.py:5);
    the listwise variant prepends '|' (src/mtix/predictors.py:122)."""
    body = F.concat_ws(
        "|", _c(pub_year).cast("string"), _c(journal_title), _c(title), _c(abstract)
    )
    return F.concat(F.lit("|"), body) if leading_bar else body


def score_reason(score: Column | str) -> Column:
    """'score: %.3f' (src/mtix/pipelines.py:63)."""
    return F.format_string("score: %.3f", _c(score).cast("double"))


def extract_pub_year(col: Column | str) -> Column:
    """MedlineDate year extraction, fast path (src/mtix/utils.py:176-184):
    first 4 chars if numeric, else first \\d{4} match, else null. Pure
    Column expression — use `extract_pub_year_full` for exact reference
    parity including the fuzzy-date tail ('24th Mar '01'-class strings)."""
    c = _c(col)
    head4 = F.substring(c, 1, 4)
    rx = F.regexp_extract(c, r"(\d{4})", 1)
    return (
        F.when(head4.rlike(r"^\d{4}$"), head4.cast("int"))
        .when(rx != "", rx.cast("int"))
        .otherwise(F.lit(None).cast("int"))
    )


def extract_pub_year_full(col: Column | str) -> Column:
    """F5 with full reference parity (src/mtix/utils.py:176-190): the two
    regex tiers run vectorized over the whole Arrow batch; the dateutil
    fuzzy parse — the reference's last resort — executes ONLY on the
    residue rows both tiers miss (<0.01% of real MedlineDates, e.g.
    "24th Mar '01" → 2001). Cases: src/mtix/tests/test_utils.py:311-322."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def _full(s: pd.Series) -> pd.Series:
        out = pd.Series([None] * len(s), index=s.index, dtype="object")
        txt = s.fillna("")
        # tier 1: first-4-chars numeric (reference tolerates int()'s strip)
        head4 = txt.str[:4].str.strip()
        t1 = head4.str.fullmatch(r"[+-]?\d+") & (txt.str.len() >= 1)
        out[t1] = head4[t1].astype("int64")
        # tier 2: first \d{4} anywhere
        miss = ~t1
        rx = txt[miss].str.extract(r"(\d{4})", expand=False)
        hit2 = rx.notna()
        out.loc[rx[hit2].index] = rx[hit2].astype("int64")
        # tier 3: dateutil fuzzy, residue rows only
        residue = out.isna() & s.notna()
        if residue.any():
            from dateutil import parser as duparser

            def fuzzy(t):
                try:
                    return duparser.parse(t, fuzzy=True).date().year
                except Exception:
                    return None

            out[residue] = [fuzzy(t) for t in s[residue]]
        return out.astype("Int32")

    return _full(_c(col))

"""Join operators beyond Spark's built-in set.

The reference has only hash equi-joins (SURVEY.md §2 J1–J9); these extend
the engine with the time-series joins a training-data/event pipeline needs.

`asof_join` — nearest-prior match — is implemented as the union-and-carry
pattern rather than a range join: tag both inputs, union, and carry the
right side's values forward with a cumulative `last(..., ignorenulls)`
window per key. One shuffle on (keys, ts); no range-condition explosion
(a theta/range join materializes |L|·|R| candidate pairs per key before
filtering — this materializes |L|+|R| rows, period). That is the plan shape
that survives 100×: the window is a linear scan per key partition, and
skewed keys split cleanly under AQE because the union is a plain exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_s: int = 0,
    upper_s: int = 3600,
) -> DataFrame:
    """Interval join: pairs where right_ts ∈ [left_ts + lower_s,
    left_ts + upper_s] per equi-key. With non-empty `on`, Catalyst plans a
    hash/sort-merge join on the keys with the range as a join filter —
    candidate pairs are bounded by the per-key cross size, never a
    cartesian. (A keyless range join would need a broadcast-nested-loop;
    this operator requires keys by design.)"""
    assert on, "range_join requires equi-keys; keyless ranges do not scale"
    lt = left[left_ts].cast("timestamp").cast("long")
    rt = right[right_ts].cast("timestamp").cast("long")
    cond = [left[k] == right[k] for k in on]
    cond.append(rt >= lt + lower_s)
    cond.append(rt <= lt + upper_s)
    c = cond[0]
    for x in cond[1:]:
        c = c & x
    return left.join(right, c)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """For each left row, attach the right row's `value_cols` from the
    latest right event with right_ts <= left_ts (per `on` key); null when
    no prior right row exists. Ties at equal timestamps match (the right
    row sorts first at the same instant).

    Returns the left relation plus one `asof_<col>` column per value col
    and `asof_ts` (the matched right timestamp).
    """
    value_cols = value_cols or []
    lcols = left.columns
    ltypes, rtypes = dict(left.dtypes), dict(right.dtypes)
    l = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__src"),
        F.lit(None).cast(rtypes[right_ts]).alias("__rts"),
        *[F.lit(None).cast(rtypes[c]).alias(f"__v_{c}") for c in value_cols],
    )
    r = right.select(
        *on,  # join keys come through as-is
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in lcols if c not in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__src"),
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__src").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *lcols,
        "__src",
        F.last("__rts", ignorenulls=True).over(w).alias("asof_ts"),
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("__src") == 1).drop("__src")

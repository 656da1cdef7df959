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


def type_error_expr(col: str, dtype: str):
    """1 where the value is present but NOT representable as ``dtype``
    (try_cast returns NULL), else 0 — the columnar form of the reference's
    per-row isinstance() walk (src/quality/checks.py:213-267). NULLs are not
    type errors (they are the completeness check's business)."""
    c = F.col(col)
    return (c.isNotNull() & c.try_cast(dtype).isNull()).cast("int")


def full_quality_report(df: DataFrame, required_cols: list[str],
                        key_cols: list[str],
                        type_specs: dict[str, str] | None = None,
                        null_threshold: float = 0.05,
                        type_threshold: float = 0.95) -> DataFrame:
    """Reference-parity quality report as ONE aggregation row
    (src/quality/checks.py run_all_checks + QualityReport.score :40-45):

    * completeness — null rate per required column (pass: <= null_threshold)
    * uniqueness — duplicate-key rate (pass: == 0)
    * type correctness — 1 - type_errors/(rows * specs)
      (pass: >= type_threshold, the reference's 95% bar)
    * score — passed_checks / total_checks * 100, the reference formula.

    Everything is a single scan with partial aggregation; returns a
    one-row DataFrame so it can feed dashboards or the driver's oracle."""
    specs = type_specs or {}
    n = F.count("*")
    aggs = [n.alias("total_rows")]
    null_checks = []
    for c in required_cols:
        rate = F.round(F.avg(F.col(c).isNull().cast("int")), 6)
        aggs.append(rate.alias(f"null_rate_{c}"))
        null_checks.append((rate <= null_threshold).cast("int"))
    dup_rate = F.round(
        F.coalesce(F.try_divide(
            n - F.count_distinct(*[F.col(k) for k in key_cols]), n),
            F.lit(0.0)), 6)
    aggs.append(dup_rate.alias("dup_rate"))
    if specs:
        errs = sum(F.sum(type_error_expr(c, t)) for c, t in specs.items())
        type_rate = F.round(
            F.lit(1.0) - F.coalesce(
                F.try_divide(errs, n * len(specs)), F.lit(0.0)), 6)
    else:
        type_rate = F.lit(1.0)
    aggs.append(type_rate.alias("type_correctness"))
    checks = (null_checks
              + [(dup_rate <= 0).cast("int"),
                 (type_rate >= type_threshold).cast("int")])
    n_checks = len(checks)
    passed = checks[0]
    for ch in checks[1:]:
        passed = passed + ch
    aggs.append(passed.alias("checks_passed"))
    aggs.append(F.round(passed * 100.0 / n_checks, 2).alias("score"))
    return df.agg(*aggs)


def validate_coerce(df: DataFrame, required: dict[str, str],
                    optional: dict[str, str] | None = None) -> DataFrame:
    """Pydantic-validator analogue, columnar
    (src/quality/validators.py:46-84): listed columns are coerced with
    try_cast (the string-id -> int rule of ProductRecord.coerce_id), rows
    whose REQUIRED columns are NULL/uncoercible are dropped (the reference
    raises ValidationError and skips the record), and extra columns pass
    through untouched (model_config extra="allow").

    Key hygiene (matches the reference's ValidationError semantics instead of
    an unresolved-column AnalysisException): a REQUIRED column absent from
    the DataFrame means every record fails validation — the result is empty,
    with the missing column present as a typed NULL so the output schema
    stays stable; a typo'd OPTIONAL key is rejected up front (it would
    otherwise be silently ignored)."""
    opt = optional or {}
    missing_opt = sorted(set(opt) - set(df.columns))
    if missing_opt:
        raise ValueError(
            f"optional columns not in DataFrame: {missing_opt} "
            f"(have: {sorted(df.columns)})")
    missing_req = sorted(set(required) - set(df.columns))
    if missing_req:
        # reference behavior: required-field-missing fails EVERY record
        # (validators.py raises ValidationError per record -> all skipped)
        pad = df.select(
            *df.columns,
            *[F.lit(None).cast(required[c]).alias(c) for c in missing_req])
        return validate_coerce(pad, required, optional)  # all-NULL -> empty
    out = []
    for c in df.columns:
        if c in required:
            out.append(F.col(c).try_cast(required[c]).alias(c))
        elif c in opt:
            out.append(F.col(c).try_cast(opt[c]).alias(c))
        else:
            out.append(F.col(c))
    coerced = df.select(*out)
    cond = None
    for c in required:
        k = F.col(c).isNotNull()
        cond = k if cond is None else (cond & k)
    return coerced.filter(cond) if cond is not None else coerced


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

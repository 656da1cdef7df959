"""Columnar ports of the reference's per-row Python transforms (SURVEY.md §2.2).

Every function here returns Column expressions or DataFrames built purely from
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd, zero per-row
Python — replacing the reference's dict-walking loops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def flatten_struct(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Struct flatten as a pure Catalyst projection.

    ``mapping``: output column -> dotted source path, e.g.
    ``{"customer_id": "customer.id", "payment_cash_amount": "payment.cash.amount"}``.
    Port of the reference's per-row `_flatten_bill`
    (src/features/nhanh/bills/components/loader.py:42-156) and its SQL twin
    (sql/query_flatten.sql:7-41): 23 columns of (doubly-)nested struct fields
    pulled into a flat row. Missing nested structs yield NULL, matching the
    reference's `.get()` chains (loader.py:104-155).
    """
    return df.select(*[F.col(src).alias(dst) for dst, src in mapping.items()])


def explode_children(
    df: DataFrame,
    array_col: str,
    parent_cols: dict[str, str],
    child_cols: dict[str, str],
    pos_fallback_id: str | None = None,
) -> DataFrame:
    """Array explode with parent FK injection and positional-id fallback.

    Port of the reference's product explode loop
    (src/features/nhanh/bills/components/extractor.py:217-282): one child row
    per array element, parent keys stamped on, and — when the element id is
    NULL — a positional index used as the id (extractor.py:258-262).
    Uses ``posexplode_outer`` so parents with empty/NULL arrays still emit
    nothing (outer semantics match the reference's skip).
    """
    exploded = df.select(
        *[F.col(src).alias(dst) for dst, src in parent_cols.items()],
        F.posexplode_outer(F.col(array_col)).alias("_pos", "_child"),
    ).filter(F.col("_child").isNotNull())
    sel = [F.col(d) for d in parent_cols]
    for dst, src in child_cols.items():
        c = F.col(f"_child.{src}")
        if pos_fallback_id is not None and dst == pos_fallback_id:
            c = F.coalesce(c.cast("string"), F.concat(F.lit("idx_"), F.col("_pos")))
        sel.append(c.alias(dst))
    return exploded.select(*sel)


def safe_cast(col: Column | str, dtype: str) -> Column:
    """NULL-on-failure cast. Port of safe_int/safe_float/safe_str
    (one_office/components/loader.py:64-89): empty string and uncastable
    values become NULL instead of raising. Built on ``try_cast`` so the
    semantics hold under ANY session config — including ANSI mode (the
    Spark 4 default), where a plain cast would throw."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.trim(c.cast("string")) == "", None).otherwise(
        c.try_cast(dtype))


def widen_money(col: Column | str) -> Column:
    """The forced INT64->FLOAT64 widening rule for money/quantity fields
    ("Critical: always float64, never int64" — schemas.py:30-34,
    extractor.py:244-280)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("double")


def parse_date_iso(col: Column | str) -> Column:
    """ISO date parse, NULL on failure — identical semantics to the reference's
    strptime('%Y-%m-%d') with try/except (loader.py:89-101) and BigQuery
    SAFE.PARSE_DATE (query_flatten.sql:10). ``try_to_timestamp`` (not
    ``to_date``) so malformed input yields NULL even under ANSI mode."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(c.cast("string"), F.lit("yyyy-MM-dd")).cast("date")


def parse_date_ddmmyyyy(col: Column | str) -> Column:
    """Guarded dd/mm/yyyy parser — port of
    one_office/components/loader.py:16-61: strip; reject annotated values
    (anything beyond the bare date, e.g. "(dự kiến) 01/01/2025"); validate
    day/month/year ranges 1900-2100; emit DATE or NULL.

    ANSI-safe by construction: each group is pulled with its own
    ``regexp_extract`` (empty string on no match) and ``try_cast`` to int
    (NULL on empty), and the final parse is ``try_to_timestamp`` so calendar-
    invalid dates (31/02/...) yield NULL instead of raising. ``when`` does
    NOT short-circuit in Spark, so no sub-expression here may ever throw."""
    c = F.trim((F.col(col) if isinstance(col, str) else col).cast("string"))
    pat = r"^(\d{1,2})/(\d{1,2})/(\d{4})$"
    day = F.regexp_extract(c, pat, 1).try_cast("int")
    mon = F.regexp_extract(c, pat, 2).try_cast("int")
    yr = F.regexp_extract(c, pat, 3).try_cast("int")
    in_range = (
        (day >= 1) & (day <= 31) & (mon >= 1) & (mon <= 12)
        & (yr >= 1900) & (yr <= 2100)
    )
    return F.when(
        in_range,
        F.try_to_timestamp(
            F.concat_ws("-", yr.cast("string"),
                        F.lpad(mon.cast("string"), 2, "0"),
                        F.lpad(day.cast("string"), 2, "0")),
            F.lit("yyyy-MM-dd")).cast("date"),
    )


def null_pad_to_schema(df: DataFrame, columns: dict[str, str]) -> DataFrame:
    """Add any missing schema columns as typed NULLs, drop extras, order to
    schema — the reference's write-path schema enforcement
    (gcs/loader.py:307-345). ``columns``: name -> spark type string."""
    out = []
    for name, dtype in columns.items():
        if name in df.columns:
            out.append(F.col(name).cast(dtype).alias(name))
        else:
            out.append(F.lit(None).cast(dtype).alias(name))
    return df.select(*out)


def audit_columns(df: DataFrame, event_ts_col: str = "event_ts") -> DataFrame:
    """Audit/lineage columns derived from EVENT time, not wall clock — the
    reference stamps utcnow() (loader.py:758) which breaks replay determinism
    (SURVEY.md §7.5 item 1); we derive from the envelope instead."""
    return (df
            .withColumn("ingest_date", F.to_date(F.col(event_ts_col)))
            .withColumn("raw_record", F.to_json(F.struct(*df.columns))))

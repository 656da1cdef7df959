"""Gold-layer aggregates — the reference's silver→gold spec, reconstructed.

The reference's gold module was deleted but its integration tests name five
tables (tests/integration/test_gold_aggregation.py:42-113): daily revenue
summary, customer lifetime value, product sales metrics (+ summary), and
inventory analytics. These are plain groupBy/agg pipelines over the silver
fact tables; at 100 TB they are single-shuffle partial-aggregated jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_revenue_summary(orders: DataFrame,
                          date_col: str = "o_orderdate",
                          amount_col: str = "o_totalprice") -> DataFrame:
    return (orders.groupBy(F.to_date(date_col).alias("day"))
            .agg(F.round(F.sum(amount_col), 2).alias("revenue"),
                 F.count("*").alias("n_orders"),
                 F.round(F.avg(amount_col), 2).alias("avg_order_value")))


def customer_lifetime_value(orders: DataFrame, customers: DataFrame,
                            custkey: str = "o_custkey") -> DataFrame:
    agg = orders.groupBy(custkey).agg(
        F.round(F.sum("o_totalprice"), 2).alias("ltv"),
        F.count("*").alias("n_orders"),
        F.min(F.to_date("o_orderdate")).alias("first_order"),
        F.max(F.to_date("o_orderdate")).alias("last_order"))
    return agg.join(F.broadcast(customers),
                    agg[custkey] == customers["c_custkey"])


def product_sales_metrics(lineitem: DataFrame, part: DataFrame,
                          keep_exact: bool = False) -> DataFrame:
    j = lineitem.join(F.broadcast(part),
                      lineitem["l_partkey"] == part["p_partkey"])
    # money arithmetic fully in DECIMAL: the inputs are nominally-2dp doubles,
    # so quantize EXPLICITLY in the double domain (round to 2) BEFORE the
    # decimal cast — double->decimal cast-rounding is engine-specific
    # (Spark HALF_UP vs DuckDB half-even) on .xx5-edge doubles and flaked the
    # round-1 value hash; round-then-cast is unambiguous because a rounded
    # double is never at a cast midpoint. After the cast everything is exact
    # decimal arithmetic — bit-stable at any parallelism (double summation is
    # order-dependent, and task order is nondeterministic on a real cluster).
    # Result type decimal(38,4): sum over 10^10 rows of decimal(26,4) terms
    # cannot overflow 38 digits (a silent-NULL hazard at 18,4 under
    # ansi=false; an error under ANSI).
    # Precisions are kept as NARROW as the value bounds allow so every
    # per-row decimal stays in Spark's compact-long representation
    # (precision <= 18): price < 10^7 fits (9,2), 1-discount in [0,1] fits
    # (3,2) so the difference is (5,2), and the product is (15,4) — the
    # per-row multiply and the partial-aggregation adds are then long
    # arithmetic, not BigDecimal (the round-3 form used (12,2) operands whose
    # product was a (26,4) BigDecimal on every row — measured 17% slower).
    price = F.round(F.col("l_extendedprice"), 2).cast("decimal(9,2)")
    disc = F.round(F.col("l_discount"), 2).cast("decimal(4,2)")
    rev = price * (F.lit(1).cast("decimal(3,2)") - disc)   # decimal(15,4)
    # The SUM stays exact decimal (order-independent at any parallelism);
    # sum((15,4)) -> (25,4) cannot overflow under 10^10 rows of < 10^7
    # terms. Only the final projection casts to double. The decimal value is
    # exact, so decimal->double is a single deterministic rounding that any
    # engine performs identically — this keeps the cross-engine value hash
    # stable (decimal object reprs differ between engines; doubles do not).
    # ``keep_exact`` additionally carries the exact decimal as
    # ``_revenue_dec`` for downstream roll-ups (product_summary must NOT sum
    # doubles — double addition is order-dependent).
    agg = (j.groupBy("p_partkey", "p_name", "p_brand")
           .agg(F.sum(rev).cast("decimal(38,4)").alias("_revenue_dec"),
                F.round(F.sum("l_quantity"), 2).alias("units_sold"),
                F.count("*").alias("n_lines")))
    cols = ["p_partkey", "p_name", "p_brand",
            F.col("_revenue_dec").cast("double").alias("revenue"),
            "units_sold", "n_lines"]
    if keep_exact:
        cols.append("_revenue_dec")
    return agg.select(*cols)


def product_summary(metrics: DataFrame) -> DataFrame:
    """The fifth gold table (test_gold_aggregation.py:42-113): per-brand
    roll-up of product_sales_metrics. Aggregates in exact decimal
    (``_revenue_dec`` when the caller passed ``keep_exact=True``; otherwise
    the double ``revenue`` is re-quantized — exact only while values stay
    well inside double's 15-digit precision), then projects doubles for a
    stable cross-engine representation."""
    rev = (F.col("_revenue_dec") if "_revenue_dec" in metrics.columns
           else F.col("revenue").cast("decimal(38,4)"))
    return (metrics.groupBy("p_brand")
            .agg(F.sum(rev).cast("decimal(38,4)").cast("double")
                 .alias("brand_revenue"),
                 F.count("*").alias("n_products"),
                 F.max(rev).cast("double").alias("top_product_revenue")))


def inventory_analytics(lineitem: DataFrame, supplier: DataFrame) -> DataFrame:
    j = lineitem.join(F.broadcast(supplier),
                      lineitem["l_suppkey"] == supplier["s_suppkey"])
    return (j.groupBy("s_suppkey", "s_name")
            .agg(F.round(F.sum("l_quantity"), 2).alias("units_shipped"),
                 F.count_distinct("l_partkey").alias("distinct_parts"),
                 F.count("*").alias("n_lines")))

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
    # money arithmetic fully in DECIMAL: the inputs are nominally-2dp doubles,
    # so quantize EXPLICITLY in the double domain (round to 2) BEFORE the
    # decimal cast — double->decimal cast-rounding is engine-specific
    # (Spark HALF_UP vs DuckDB half-even) on .xx5-edge doubles and flaked the
    # round-1 value hash; round-then-cast is unambiguous because a rounded
    # double is never at a cast midpoint. After the cast everything is exact
    # decimal arithmetic — bit-stable at any parallelism (double summation is
    # order-dependent, and task order is nondeterministic on a real cluster).
    # The per-row terms use compact decimals (precision <= 18 = long-backed):
    # price < 10^7 fits (9,2), discount in [0,1] fits (4,2). They are then
    # converted to EXACT integer 1e-4 currency units in a plain long —
    # (price_cents) * (100 - disc_cents) < 10^11 — because Spark's SUM over
    # any decimal widens the accumulator to precision+10 > 18 digits, which
    # drops every partial add onto the BigDecimal slow path. (Narrowing the
    # operand decimals alone — the round-3 -> round-4 first attempt — was
    # measured a no-op for exactly this reason: the accumulator, not the
    # operand, is what leaves the compact representation.)
    price_c = (F.round(F.col("l_extendedprice"), 2)
               .cast("decimal(9,2)") * 100).cast("long")
    disc_c = (F.round(F.col("l_discount"), 2)
              .cast("decimal(4,2)") * 100).cast("long")
    rev = price_c * (F.lit(100) - disc_c)   # exact long, 1e-4 units, < 2^44
    # Exact order-independent SUM on the long-arithmetic fast path: split
    # each term into three 22-bit chunks and sum the chunks as longs. Each
    # chunk < 2^22, so a per-group chunk sum stays under long-max for up to
    # ~2.2 * 10^12 rows PER GROUP — far beyond any real key's row count at
    # 100 TB. The chunks recombine into an exact decimal(38,4) after the
    # aggregation (20k groups, not 10^10 rows), so the final value is
    # bit-identical to the all-decimal form at ~2x the aggregation speed.
    # Aggregate BEFORE the dimension join (round-5): group the fact table by
    # the bare join key, then broadcast-join `part` onto the ~|part| grouped
    # rows for the descriptive columns. Join-then-aggregate probed the
    # broadcast hash for every fact row and dragged the p_name/p_brand
    # strings through the whole aggregation as group-key payload;
    # aggregate-then-join probes once per GROUP and keeps the hash-agg key a
    # single long. Same result under any input (a fact row without a
    # matching part is dropped by the inner join either way — it just gets
    # dropped as a group instead of as rows), and the classic plan shape a
    # 100 TB fact x 100 GB dim join wants.
    mask = F.lit((1 << 22) - 1)
    agg = (lineitem.groupBy("l_partkey")
           .agg(F.sum(rev.bitwiseAND(mask)).alias("_s_lo"),
                F.sum(F.shiftright(rev, 22).bitwiseAND(mask)).alias("_s_mid"),
                F.sum(F.shiftright(rev, 44)).alias("_s_hi"),
                F.round(F.sum("l_quantity"), 2).alias("units_sold"),
                F.count("*").alias("n_lines"))
           .join(F.broadcast(part.select("p_partkey", "p_name", "p_brand")),
                 F.col("l_partkey") == F.col("p_partkey")))
    # Recombine: exact integer total in 1e-4 units -> decimal(38,4). The
    # division by 10^4 is exact (result scale >= 4), so decimal->double is a
    # single deterministic rounding any engine performs identically — this
    # keeps the cross-engine value hash stable (decimal object reprs differ
    # between engines; doubles do not). ``keep_exact`` additionally carries
    # the exact decimal as ``_revenue_dec`` for downstream roll-ups
    # (product_summary must NOT sum doubles — double addition is
    # order-dependent).
    rev_dec = ((F.col("_s_hi").cast("decimal(38,0)") * F.lit(1 << 44)
                + F.col("_s_mid").cast("decimal(38,0)") * F.lit(1 << 22)
                + F.col("_s_lo").cast("decimal(38,0)"))
               / 10000).cast("decimal(38,4)")
    agg = agg.withColumn("_revenue_dec", rev_dec)
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
    # aggregate-then-join, same rationale as product_sales_metrics
    return (lineitem.groupBy("l_suppkey")
            .agg(F.round(F.sum("l_quantity"), 2).alias("units_shipped"),
                 F.count_distinct("l_partkey").alias("distinct_parts"),
                 F.count("*").alias("n_lines"))
            .join(F.broadcast(supplier.select("s_suppkey", "s_name")),
                  F.col("l_suppkey") == F.col("s_suppkey"))
            .select("s_suppkey", "s_name", "units_shipped",
                    "distinct_parts", "n_lines"))

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


def product_sales_metrics(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    j = lineitem.join(F.broadcast(part),
                      lineitem["l_partkey"] == part["p_partkey"])
    # money arithmetic fully in DECIMAL: the inputs are exact 2dp values, so
    # price(2dp) x (1 - discount(2dp)) is exact at 4dp and the sum is exact
    # and associative — bit-stable at any parallelism (double summation is
    # order-dependent, and task order is nondeterministic on a real cluster)
    rev = (F.col("l_extendedprice").cast("decimal(12,2)")
           * (F.lit(1) - F.col("l_discount").cast("decimal(12,2)")))
    return (j.groupBy("p_partkey", "p_name", "p_brand")
            .agg(F.sum(rev).cast("decimal(18,4)").alias("revenue"),
                 F.round(F.sum("l_quantity"), 2).alias("units_sold"),
                 F.count("*").alias("n_lines")))


def product_summary(metrics: DataFrame) -> DataFrame:
    return (metrics.groupBy("p_brand")
            .agg(F.round(F.sum("revenue"), 2).alias("brand_revenue"),
                 F.count("*").alias("n_products"),
                 F.round(F.max("revenue"), 2).alias("top_product_revenue")))


def inventory_analytics(lineitem: DataFrame, supplier: DataFrame) -> DataFrame:
    j = lineitem.join(F.broadcast(supplier),
                      lineitem["l_suppkey"] == supplier["s_suppkey"])
    return (j.groupBy("s_suppkey", "s_name")
            .agg(F.round(F.sum("l_quantity"), 2).alias("units_shipped"),
                 F.count_distinct("l_partkey").alias("distinct_parts"),
                 F.count("*").alias("n_lines")))

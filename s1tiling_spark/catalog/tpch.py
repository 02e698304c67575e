"""Classic analytics shapes (TPC-H-inspired q1/q3/q6 analogs) over the
driver tables — exercising multi-column grouped aggregation, join +
top-k, and selective-scan aggregation with exact integer-cents sums."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s1tiling_spark.registry import register
from s1tiling_spark.sources.tables import load_table


def _cents(col):
    return F.round(col * 100).cast("long")


# q1-style pricing summary: grouped agg with several measures
@register(
    "pricing_summary",
    oracle=(
        "SELECT l_returnflag, l_linestatus, "
        "CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT)/100.0 AS sum_qty, "
        "CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)/100.0 AS sum_base, "
        "CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT)"
        "/100.0 AS sum_disc, "
        "CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*(1+l_tax)*100) AS BIGINT)) "
        "AS BIGINT)/100.0 AS sum_charge, "
        "count(*) AS n FROM lineitem "
        "WHERE l_shipdate <= TIMESTAMP '2000-09-01 00:00:00' "
        "GROUP BY l_returnflag, l_linestatus"
    ),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate") <= "2000-09-01 00:00:00"
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        (F.sum(_cents(F.col("l_quantity"))) / 100.0).alias("sum_qty"),
        (F.sum(_cents(F.col("l_extendedprice"))) / 100.0).alias("sum_base"),
        (F.sum(_cents(disc)) / 100.0).alias("sum_disc"),
        (F.sum(_cents(disc * (1 + F.col("l_tax")))) / 100.0).alias("sum_charge"),
        F.count("*").alias("n"),
    )


# q3-style: join + grouped revenue + top-k
@register(
    "top_unshipped_orders",
    oracle=(
        "SELECT o_orderkey, o_orderdate, "
        "CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) "
        "AS BIGINT)/100.0 AS revenue "
        "FROM orders JOIN lineitem ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01' "
        "AND l_shipdate > TIMESTAMP '1998-01-01' "
        "GROUP BY o_orderkey, o_orderdate "
        "ORDER BY revenue DESC, o_orderkey ASC LIMIT 10"
    ),
)
def top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderdate") < "1998-01-01")
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_shipdate") > "1998-01-01")
    c = load_table(spark, "customer", sf_dir).filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            (
                F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
                / 100.0
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# q6-style: selective scan + single aggregate (pushdown showcase)
@register(
    "forecast_revenue_change",
    oracle=(
        "SELECT CAST(sum(CAST(round(l_extendedprice*l_discount*100) AS BIGINT)) "
        "AS BIGINT)/100.0 AS revenue, count(*) AS n FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1997-01-01' "
        "AND l_shipdate < TIMESTAMP '1998-01-01' "
        "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
    ),
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    sel = li.filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return sel.agg(
        (F.sum(_cents(F.col("l_extendedprice") * F.col("l_discount"))) / 100.0).alias(
            "revenue"
        ),
        F.count("*").alias("n"),
    )

"""Deeper TPC-H shapes: Q7, Q8, Q10, Q13, Q15, and an adapted Q19.

Round-4 widening of the join/agg surface beyond the headliners in
``queries_tpch.py``. The reference (ETL.py:150-162) has one equi-join;
these are the remaining classic decision-support shapes expressible on
the driver's star schema (no ``partsupp`` table and no
``l_shipmode``/``l_commitdate`` columns exist in the testdata, so
Q2/Q11/Q12/Q16/Q20/Q21 have no faithful form and are intentionally
absent; Q19 is adapted to the available part attributes).

Scale notes (same rules as queries_tpch.py):
- nation/region carry explicit broadcast hints (spec-bounded); bigger
  dims are left to size stats + AQE so they demote above threshold;
- money aggregates use exact integer-cents sums so Spark and DuckDB
  agree bit-for-bit under any partitioning;
- disjunctive predicates (Q19) stay as one OR expression so Catalyst
  pushes the whole thing into the parquet scan instead of unioning
  three scans of the fact table;
- nested "share" aggregates (Q8) compute numerator and denominator in
  ONE grouped pass (conditional sum), not a self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import load_table
from .registry import QuerySpec, register


def _cents(col: str) -> F.Column:
    return F.round(F.col(col) * 100).cast("long")


# Discounted revenue ext*(1-disc), exact in scaled integers: both
# factors are 2-dp fixed decimals so ext_c*(100-disc_c) is an exact
# integer in 10^-4 currency units.
def _disc_rev(alias: str) -> F.Column:
    return (
        F.sum(_cents("l_extendedprice") * (100 - _cents("l_discount")))
        / 10000.0
    ).alias(alias)


_DISC_REV_SQL = (
    "SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)"
    " * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) / 10000.0"
)


# --- Q7: volume shipping between two nations --------------------------------

_Q7_NATIONS = ("NATION_2", "NATION_11")
_Q7_LO, _Q7_HI = "1996-01-01", "1997-12-31"


def _q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral trade volume: revenue shipped from supplier-nation A
    to customer-nation B (and B->A), by ship year.

    Plan shape: the two-nation filter lands on the (broadcast) nation
    dim on BOTH sides, so the supplier/customer fan-out is pruned
    before the fact join -- at 100 TB only lineitems of the two
    nations' suppliers survive into the shuffle.
    """
    n1, n2 = _Q7_NATIONS
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q7_LO).cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit(_Q7_HI).cast("timestamp"))
    )
    nation = load_table(spark, sf_dir, "nation")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation.filter(F.col("n_name").isin(*_Q7_NATIONS))),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nation.filter(F.col("n_name").isin(*_Q7_NATIONS))),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(
            ((F.col("supp_nation") == n1) & (F.col("cust_nation") == n2))
            | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
        )
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(_disc_rev("revenue"))
    )


register(QuerySpec(
    name="volume_shipping",
    spark_fn=_q7,
    oracle=f"""
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INTEGER) AS l_year,
               {_DISC_REV_SQL} AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        WHERE l_shipdate BETWEEN TIMESTAMP '{_Q7_LO} 00:00:00'
                             AND TIMESTAMP '{_Q7_HI} 00:00:00'
          AND ((sn.n_name = '{_Q7_NATIONS[0]}'
                AND cn.n_name = '{_Q7_NATIONS[1]}')
               OR (sn.n_name = '{_Q7_NATIONS[1]}'
                   AND cn.n_name = '{_Q7_NATIONS[0]}'))
        GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
    """,
    covers=("tpch-q7", "bilateral-dim-filter", "multi-join-5way"),
    extended=True,
))


# --- Q8: national market share within a region ------------------------------

_Q8_REGION = "REGION_1"
_Q8_NATION = "NATION_5"


def _q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of revenue into region customers supplied by one nation,
    per order year. Numerator and denominator come from the SAME
    grouped pass (conditional cents sum) -- no self-join, one shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    # customers in the target region (nation x region both broadcast)
    cust_in_region = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.filter(F.col("r_name") == _Q8_REGION)),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp_nation = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    vol_c = _cents("l_extendedprice") * (100 - _cents("l_discount"))
    target_c = F.when(F.col("supp_nation") == _Q8_NATION, vol_c).otherwise(
        F.lit(0).cast("long")
    )
    return (
        li.join(orders.select("o_orderkey", "o_custkey", "o_orderdate"),
                li.l_orderkey == F.col("o_orderkey"))
        .join(cust_in_region, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp_nation, li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (F.sum(target_c) / 10000.0).alias("nation_volume"),
            (F.sum(vol_c) / 10000.0).alias("total_volume"),
            (
                F.sum(target_c).cast("double") / F.sum(vol_c).cast("double")
            ).alias("mkt_share"),
        )
    )


register(QuerySpec(
    name="national_market_share",
    spark_fn=_q8,
    oracle=f"""
        WITH vol AS (
            SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
                   CAST(ROUND(l_extendedprice*100) AS BIGINT)
                     * (100 - CAST(ROUND(l_discount*100) AS BIGINT)) AS v_c,
                   n2.n_name AS supp_nation
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region ON n1.n_regionkey = r_regionkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = '{_Q8_REGION}'
        )
        SELECT o_year,
               SUM(CASE WHEN supp_nation = '{_Q8_NATION}' THEN v_c
                        ELSE 0 END) / 10000.0 AS nation_volume,
               SUM(v_c) / 10000.0 AS total_volume,
               CAST(SUM(CASE WHEN supp_nation = '{_Q8_NATION}' THEN v_c
                             ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(v_c) AS DOUBLE) AS mkt_share
        FROM vol GROUP BY o_year
    """,
    covers=("tpch-q8", "conditional-share-one-pass"),
    extended=True,
))


# --- Q10: returned item reporting -------------------------------------------

_Q10_LO, _Q10_HI = "1996-01-01", "1996-06-30"


def _q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by revenue lost to returns in a half-year.

    The 'R' filter and the order-date window are both pushed to the
    scans; the customer join happens AFTER the per-customer aggregate,
    so only ~20*fanout grouped rows meet the dim -- at scale the
    pre-agg is the whole game (aggregate 100 TB of lineitems down to
    |customers| rows before touching customer attributes).
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q10_LO).cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit(_Q10_HI).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    per_cust = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(_disc_rev("revenue"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        per_cust.join(cust, per_cust.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


register(QuerySpec(
    name="returned_item_customers",
    spark_fn=_q10,
    oracle=f"""
        SELECT c_custkey, c_name, revenue, c_acctbal, n_name
        FROM (
            SELECT o_custkey, {_DISC_REV_SQL} AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE l_returnflag = 'R'
              AND o_orderdate BETWEEN TIMESTAMP '{_Q10_LO} 00:00:00'
                                  AND TIMESTAMP '{_Q10_HI} 00:00:00'
            GROUP BY o_custkey
        ) r
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    covers=("tpch-q10", "agg-before-dim-join", "topn"),
    extended=True,
))


# --- Q13: customer order-count distribution ---------------------------------

def _q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of orders-per-customer including zero-order customers
    (left join). Two cheap shuffles over key-only projections; the
    second groupBy runs on |customers| rows, not the fact table."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


register(QuerySpec(
    name="customer_order_distribution",
    spark_fn=_q13,
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        ) co
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    covers=("tpch-q13", "left-join-count-histogram"),
    extended=True,
))


# --- Q15: top supplier by quarterly revenue ----------------------------------

_Q15_LO, _Q15_HI = "1996-01-01", "1996-03-31"


def _q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) achieving the max revenue in a quarter. The max is
    a 1-row aggregate over the (already tiny) per-supplier rollup,
    broadcast back -- never a global sort, ties kept (per spec)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q15_LO).cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit(_Q15_HI).cast("timestamp"))
    )
    # integer cents end-to-end so the max-equality test is exact
    rev_c = F.sum(
        _cents("l_extendedprice") * (100 - _cents("l_discount"))
    ).alias("rev_c")
    per_supp = li.groupBy("l_suppkey").agg(rev_c)
    max_rev = per_supp.agg(F.max("rev_c").alias("max_c"))
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        per_supp.join(F.broadcast(max_rev), F.col("rev_c") == F.col("max_c"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name",
            (F.col("rev_c") / 10000.0).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


register(QuerySpec(
    name="top_supplier_revenue",
    spark_fn=_q15,
    oracle=f"""
        WITH rev AS (
            SELECT l_suppkey,
                   SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                       * (100 - CAST(ROUND(l_discount*100) AS BIGINT)))
                       AS rev_c
            FROM lineitem
            WHERE l_shipdate BETWEEN TIMESTAMP '{_Q15_LO} 00:00:00'
                                 AND TIMESTAMP '{_Q15_HI} 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, rev_c / 10000.0 AS total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE rev_c = (SELECT MAX(rev_c) FROM rev)
        ORDER BY s_suppkey
    """,
    covers=("tpch-q15", "argmax-scalar-subquery"),
    extended=True,
))


# --- Q19 (adapted): disjunctive brand/size/quantity revenue ------------------

# The true Q19 predicates use p_container/l_shipmode/l_shipinstruct,
# none of which exist in the testdata schema; this keeps the SHAPE
# (OR of three brand+range conjunctions spanning both join sides).
_Q19_ARMS = (
    ("Brand#1", 1, 15, 1, 15),
    ("Brand#2", 10, 30, 10, 25),
    ("Brand#3", 25, 50, 20, 35),
)


def _q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive-predicate revenue. Kept as ONE boolean OR so
    Catalyst splits it: part-only conjuncts (brand+size) push into the
    part scan, lineitem-only conjuncts (quantity bounds derived as the
    OR-envelope) push into the fact scan, and the full residual
    evaluates post-join -- vs. the naive 3x UNION ALL which scans the
    fact table three times."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    arm = None
    for brand, slo, shi, qlo, qhi in _Q19_ARMS:
        a = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(slo, shi)
            & F.col("l_quantity").between(qlo, qhi)
        )
        arm = a if arm is None else (arm | a)
    return joined.filter(arm).agg(_disc_rev("revenue"))


def _q19_arm_sql(brand: str, slo: int, shi: int, qlo: int, qhi: int) -> str:
    return (
        f"(p_brand = '{brand}' AND p_size BETWEEN {slo} AND {shi}"
        f" AND l_quantity BETWEEN {qlo} AND {qhi})"
    )


register(QuerySpec(
    name="disjunctive_brand_revenue",
    spark_fn=_q19,
    oracle=f"""
        SELECT {_DISC_REV_SQL} AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE {" OR ".join(_q19_arm_sql(*a) for a in _Q19_ARMS)}
    """,
    covers=("tpch-q19", "disjunctive-pushdown"),
    extended=True,
))


# --- GROUPING SETS + grouping_id (non-hierarchical multi-agg) ----------------

def _grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two independent slices of the same aggregate in ONE pass
    (rollup/cube can't express non-hierarchical sets): per-returnflag
    and per-linestatus revenue. grouping_id disambiguates the NULLs
    Spark injects for the inactive columns of each set; both engines
    use the same (returnflag, linestatus) bit order."""
    from ..functions.exact import exact_sum

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"]],
            "l_returnflag", "l_linestatus",
        )
        .agg(
            exact_sum("l_extendedprice").alias("sum_base"),
            F.count(F.lit(1)).alias("n_items"),
            F.grouping_id().alias("gid"),
        )
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


register(QuerySpec(
    name="grouping_sets_revenue",
    spark_fn=_grouping_sets,
    oracle="""
        SELECT l_returnflag, l_linestatus,
               SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0
                   AS sum_base,
               COUNT(*) AS n_items,
               GROUPING(l_returnflag, l_linestatus) AS gid
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        ORDER BY gid, l_returnflag, l_linestatus
    """,
    covers=("grouping-sets", "grouping-id"),
    extended=True,
))


# --- Q22 (adapted): rich-but-inactive customers ------------------------------

def _q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with above-average positive balance and NO orders,
    grouped by nation: the classic scalar-subquery + anti-join combo.
    The average is a 1-row aggregate broadcast into the filter (no
    second scan of customer at the filter site thanks to plan reuse),
    and the anti-join ships only custkeys. (True Q22 derives country
    codes from phone prefixes; the schema has no phone column, so the
    nation key plays that role.)"""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        # exact cents avg: sum(cents)/n, one deterministic division
        (F.sum(_cents("c_acctbal")).cast("double")
         / F.count(F.lit(1))).alias("avg_c")
    )
    rich = (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(_cents("c_acctbal").cast("double") > F.col("avg_c"))
    )
    return (
        rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum(_cents("c_acctbal")) / 100.0).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


register(QuerySpec(
    name="rich_inactive_customers",
    spark_fn=_q22,
    oracle="""
        WITH avg_bal AS (
            SELECT CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT))
                        AS DOUBLE) / COUNT(*) AS avg_c
            FROM customer WHERE c_acctbal > 0
        )
        SELECT c_nationkey,
               COUNT(*) AS numcust,
               SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) / 100.0
                   AS totacctbal
        FROM customer, avg_bal
        WHERE CAST(CAST(ROUND(c_acctbal*100) AS BIGINT) AS DOUBLE)
                  > avg_c
          AND c_custkey NOT IN (SELECT o_custkey FROM orders)
        GROUP BY c_nationkey
        ORDER BY c_nationkey
    """,
    covers=("tpch-q22", "scalar-subquery-anti-join"),
    extended=True,
))

"""TPC-H family completion — the remaining decision-support shapes.

The reference's batch surface is TPC-H-flavoured (generator.py emits the
slimmed region/nation/customer/supplier/part/orders/lineitem schema), and
rounds 1-3 already cover q1/q3/q5/q6/q7/q10/q12/q14/q15/q18/q19/q22. This
module adds the remaining query *shapes* of the 22-query family, adapted to
the slimmed schema (no partsupp table, no commit/receipt dates, no
p_container/o_comment columns — each docstring names the substitution):

- q4  EXISTS-per-order           -> left-semi join on the fact key
- q8  market share               -> two-ratio 8-table join with dim snowflake
- q9  product-type profit        -> multi-fact join + (nation, year) rollup
- q13 outer-join distribution    -> count-of-counts over a left join
- q16 supplier-part variety      -> count-distinct + NOT-IN anti join
- q17 small-quantity lines       -> per-key scalar subquery vs global fact
- q21 waiting supplier           -> semi + anti self-joins on one fact key

All money arithmetic routes through decimal (dsum) so distributed sums are
exact and order-free; q17's 0.2*avg comparison is rewritten in pure integer
arithmetic so the threshold cannot diverge between engines.

Scale notes: every join here shuffles on a fact key (orderkey/partkey) or
is a dimension join left to AQE (customer/supplier/part carry no broadcast
hint — they scale with SF; nation/region keep explicit hints). No
collect(), no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.readers import load_table
from .registry import dsum, query


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("J3", "A1", "P2"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-style priority check: orders in one quarter that have at
    least one problem line (the slimmed lineitem has no commit/receipt
    dates, so ``l_returnflag = 'R'`` stands in for "received late"),
    counted per priority. The EXISTS compiles to a left-semi hash join on
    l_orderkey — one shuffle, no row duplication however many lines match
    — and both the quarter filter and the flag filter push to the scans,
    so the join sees ~1/20 of orders and ~1/3 of lineitem."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    flagged = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(flagged, o.o_orderkey == flagged.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           round(CAST(sum(CASE WHEN nation = 'NATION_7'
                               THEN CAST(volume AS DECIMAL(38,6)) ELSE 0 END) AS DOUBLE)
                 / CAST(sum(CAST(volume AS DECIMAL(38,6))) AS DOUBLE), 6) AS mkt_share,
           CAST(sum(CASE WHEN nation = 'NATION_7'
                         THEN CAST(volume AS DECIMAL(38,6)) ELSE 0 END) AS DOUBLE) AS nation_volume,
           CAST(sum(CAST(volume AS DECIMAL(38,6))) AS DOUBLE) AS total_volume
    FROM (
      SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS nation
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      JOIN part p     ON l.l_partkey = p.p_partkey
      WHERE r.r_name = 'ASIA'
        AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("J7", "J1", "A3", "F1", "F5"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8-style national market share: of all ECONOMY-part revenue
    sold into ASIA-region customers over two years, what fraction came
    from NATION_7 suppliers, per year. The 8-table join is the family's
    widest: lineitem shuffles once on orderkey (against orders) — every
    other input is a dimension-side hash join. nation/region are O(1)
    tables and keep explicit broadcast hints; customer/supplier/part scale
    with SF so they carry none (AQE converts to broadcast when runtime
    size allows). Both sums are decimal-exact; the ratio is rounded to 6
    so the one double division cannot diverge between engines."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)")
    nation_vol = F.when(F.col("nation") == "NATION_7", F.col("volume")).otherwise(
        F.lit(0).cast("decimal(38,6)")
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sn_key"))
        .join(p, F.col("l_partkey") == p.p_partkey)
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), "nation")
    )
    return (
        joined.groupBy("o_year")
        .agg(
            F.round(
                F.sum(nation_vol).cast("double") / F.sum(F.col("volume")).cast("double"), 6
            ).alias("mkt_share"),
            F.sum(nation_vol).cast("double").alias("nation_volume"),
            F.sum("volume").cast("double").alias("total_volume"),
        )
        .orderBy("o_year")
    )


@query(
    "q9_profit_by_nation",
    oracle="""
    SELECT n.n_name AS nation, EXTRACT(year FROM o.o_orderdate) AS o_year,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                         - 0.1 * p.p_retailprice * l.l_quantity
                         AS DECIMAL(38,6))) AS DOUBLE) AS sum_profit,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year
    """,
    tags=("J7", "A3", "F1", "F4"),
)
def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9-style product profit by supplier nation and order year.
    The slimmed schema has no partsupp/ps_supplycost, so cost is modelled
    as 10% of p_retailprice per unit — same shape (revenue minus a
    part-priced cost term), same join graph minus partsupp. The p_name
    LIKE filter prunes part (and, through the join, lineitem) before the
    orderkey shuffle; the per-addend decimal cast keeps the mixed
    product-difference sum exact. Grouping is (nation, year) — 25*7 groups,
    so the final agg is trivially small however big the input."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(38,6)")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(profit).cast("double").alias("sum_profit"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("nation", "o_year")
    )


@query(
    "q13_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("J6", "A1", "O1"),
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-style customer order-count distribution (how many
    customers placed 0, 1, 2, ... orders), excluding urgent orders via a
    predicate *inside* the left join (the slimmed orders has no o_comment,
    so priority plays the NOT-LIKE role — customers with only urgent
    orders must still appear with count 0, which an ON-clause filter
    preserves and a WHERE filter would destroy). Two shuffles: custkey
    join+count, then a count-of-counts over at most a few hundred distinct
    values. count(o_orderkey) counts non-null matches only — identical
    semantics both engines."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q16_part_supplier_variety",
    oracle="""
    SELECT p.p_brand, p.p_size, count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_type <> 'PROMO'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_size
    """,
    tags=("A4", "J2", "P2", "O1"),
)
def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16-style supplier variety: how many distinct suppliers ship
    each (brand, size) of non-PROMO parts in eight target sizes. The
    slimmed schema has no partsupp, so lineitem *is* the part-supplier
    association, and no s_comment, so a negative account balance stands in
    for "customer complaints" — excluded with a left-anti join (the
    excluded set is tiny and data-dependent, so no broadcast hint; AQE
    decides). Both engines treat NOT IN over a NULL-free subquery as
    anti-join semantics. The distinct-count shuffles on the group key with
    partial de-dup map-side."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") != "PROMO") & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH per_part AS (
      SELECT l_partkey,
             count(*) AS cnt,
             sum(CAST(l_quantity AS BIGINT)) AS sum_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0, 6)
             AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN per_part a ON l.l_partkey = a.l_partkey
    WHERE p.p_brand = 'Brand#23' AND p.p_type = 'MEDIUM'
      AND 5 * CAST(l.l_quantity AS BIGINT) * a.cnt < a.sum_qty
    """,
    tags=("J7", "A3", "A9", "F4"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-style small-quantity revenue: lines of one brand/type
    (p_type stands in for the missing p_container) whose quantity is below
    20% of that part's average quantity. The correlated AVG subquery is a
    per-partkey pre-aggregation joined back to lineitem — both sides hash
    on l_partkey, so the join adds no extra shuffle beyond the agg's. The
    threshold ``qty < 0.2 * avg`` is rewritten as the integer inequality
    ``5*qty*cnt < sum_qty`` (quantities are integral), so no engine's
    division rounding can flip a borderline row; only the final single
    /7.0 is floating, and it is rounded."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_type") == "MEDIUM")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(per_part, li.l_partkey == F.col("a_partkey"))
        .filter(
            5 * F.col("l_quantity").cast("bigint") * F.col("cnt") < F.col("sum_qty")
        )
        .agg(
            F.round(dsum("l_extendedprice") / 7.0, 6).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q21_waiting_supplier",
    oracle="""
    SELECT s.s_name, count(*) AS numwait
    FROM lineitem l1
    JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN orders o   ON l1.l_orderkey = o.o_orderkey
    WHERE l1.l_returnflag = 'R'
      AND o.o_orderstatus = 'F'
      AND n.n_name = 'NATION_3'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    """,
    tags=("J3", "J2", "J7", "A1", "O1"),
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21-style sole problem supplier: on finished multi-supplier
    orders, suppliers of one nation who were the *only* supplier with a
    returned line ('R' replaces the missing receipt>commit predicate).
    The correlated EXISTS / NOT EXISTS pair becomes a left-semi then a
    left-anti self-join of lineitem, both hashed on l_orderkey with the
    suppkey inequality as a residual condition — so all three passes over
    lineitem co-partition on the same key and AQE can reuse the exchange.
    No broadcast hints: every side scales with SF."""
    li = load_table(spark, sf_dir, "lineitem")
    l1 = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    others = li.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    others_r = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    cand = (
        l1.join(
            others,
            (l1.l_orderkey == F.col("o2_orderkey"))
            & (l1.l_suppkey != F.col("o2_suppkey")),
            "left_semi",
        ).join(
            others_r,
            (l1.l_orderkey == F.col("o3_orderkey"))
            & (l1.l_suppkey != F.col("o3_suppkey")),
            "left_anti",
        )
    )
    return (
        cand.join(o, cand.l_orderkey == o.o_orderkey, "left_semi")
        .join(s, cand.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


@query(
    "rfm_segmentation",
    oracle="""
    WITH gmax AS (SELECT CAST(max(o_orderdate) AS DATE) AS maxd FROM orders),
    agg AS (
      SELECT o_custkey AS custkey,
             date_diff('day', CAST(max(o_orderdate) AS DATE), g.maxd) AS recency_days,
             count(*) AS frequency,
             sum(CAST(round(o_totalprice, 2) AS DECIMAL(38,2))) AS mon
      FROM orders, gmax g
      GROUP BY o_custkey, g.maxd),
    scored AS (
      SELECT custkey, recency_days, frequency,
             CAST(mon AS DOUBLE) AS monetary,
             CAST(ntile(5) OVER (ORDER BY recency_days ASC, custkey) AS BIGINT) AS r_score,
             CAST(ntile(5) OVER (ORDER BY frequency DESC, custkey) AS BIGINT) AS f_score,
             CAST(ntile(5) OVER (ORDER BY mon DESC, custkey) AS BIGINT) AS m_score
      FROM agg)
    SELECT custkey, recency_days, frequency, monetary,
           r_score, f_score, m_score,
           r_score * 100 + f_score * 10 + m_score AS segment
    FROM scored
    """,
    tags=("A3", "W4", "F1"),
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — the classic marketing-analytics
    operator: recency (days since last order, measured against the
    corpus max date so the result is time-travel stable), frequency
    (order count), monetary (decimal-exact revenue sum), each cut into
    ntile(5) quintiles with a custkey tie-break so bucket boundaries
    are deterministic in both engines; segment = RFM digit code
    (1=best R by construction here). One shuffle: the per-customer
    aggregate; the three quintile windows are unpartitioned rank scans
    over the CUSTOMER-sized aggregate (dimension-sized, not fact-
    sized) — at 100 TB the fact scan reduces first, and if even the
    customer aggregate outgrows one reducer the ntile swaps for a
    percentile-bucket join (filter_by_quantile's pattern) with the
    same output contract. Monetary ranks on the exact decimal, not
    the double, so distributed sum order can't flip a boundary."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    glob = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("maxd"))
    agg = (
        o.crossJoin(F.broadcast(glob))
        .groupBy(F.col("o_custkey").alias("custkey"), "maxd")
        .agg(
            F.datediff(F.first("maxd"), F.max(F.col("o_orderdate").cast("date"))).alias(
                "recency_days"
            ),
            F.count("*").alias("frequency"),
            F.sum(F.round("o_totalprice", 2).cast("decimal(38,2)")).alias("mon"),
        )
        .drop("maxd")
    )
    r_score = F.ntile(5).over(W.orderBy(F.asc("recency_days"), "custkey"))
    f_score = F.ntile(5).over(W.orderBy(F.desc("frequency"), "custkey"))
    m_score = F.ntile(5).over(W.orderBy(F.desc("mon"), "custkey"))
    scored = agg.select(
        "custkey",
        "recency_days",
        "frequency",
        F.col("mon").cast("double").alias("monetary"),
        r_score.cast("long").alias("r_score"),
        f_score.cast("long").alias("f_score"),
        m_score.cast("long").alias("m_score"),
    )
    return scored.withColumn(
        "segment",
        F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score"),
    )


_BASKET_TOP = 20


@query(
    "basket_copurchase_pairs",
    oracle=f"""
    WITH dp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_orders
      FROM dp a JOIN dp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2)
    SELECT CAST(row_number() OVER (ORDER BY n_orders DESC, part_a, part_b) AS BIGINT) AS rank,
           part_a, part_b, n_orders
    FROM pairs
    QUALIFY rank <= {_BASKET_TOP}
    """,
    tags=("J7", "A1", "O2"),
)
def basket_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-purchase mining — the frequent-pair core of
    association-rule analysis: parts appearing in the same order,
    counted across orders, top-{_BASKET_TOP}. The pair generation is a
    self-equi-join on the ORDER key of the per-order distinct part set,
    so the blow-up is bounded by basket size squared (max basket here
    is 13 parts -> <=78 pairs per order), never corpus-sized; the pair
    count shuffles on (part_a, part_b) with map-side combine, and the
    top-k is TakeOrderedAndProject. At 100 TB the one hazard is a
    mega-basket (a B2B order with 10^4 parts -> 10^8 pairs): cap or
    salt baskets above a size threshold before pairing — the same
    bound-the-block rule every pairwise stage in this repo follows
    (dedup_jaccard_prefix's DF cap, geo_radius_join_salted's hot
    cells)."""
    from pyspark.sql import Window as W

    dp = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = dp.alias("a")
    b = dp.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("n_orders"))
    )
    top = pairs.orderBy(F.desc("n_orders"), "part_a", "part_b").limit(_BASKET_TOP)
    return top.select(
        F.row_number()
        .over(W.orderBy(F.desc("n_orders"), "part_a", "part_b"))
        .cast("long")
        .alias("rank"),
        "part_a",
        "part_b",
        "n_orders",
    )


_COSINE_TOP = 20


def _basket_pairs(spark: SparkSession, sf_dir: str):
    """(dp, supp, pairs) — the distinct basket-membership table, per-item
    supports, and the a<b co-occurrence pair counts, shared by
    rec_item_cosine and assoc_rules_lift so the pair semantics (distinct
    membership, canonical ordering, decimal lifts) cannot drift between
    the two recommenders. dp is lazily checkpointed: supports and the
    self-join both consume it."""
    dp = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=False)
    )
    supp = dp.groupBy("l_partkey").agg(
        F.count("*").cast("decimal(38,0)").alias("n")
    )
    a = dp.alias("a")
    b = dp.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").cast("decimal(38,0)").alias("n_both"))
    )
    return dp, supp, pairs


@query(
    "rec_item_cosine",
    oracle=f"""
    WITH dp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    supp AS (SELECT l_partkey, CAST(count(*) AS HUGEINT) AS n
             FROM dp GROUP BY 1),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             CAST(count(*) AS HUGEINT) AS n_both
      FROM dp a JOIN dp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2),
    scored AS (
      SELECT p.part_a, p.part_b, p.n_both,
             CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
             CAST(p.n_both * p.n_both * 1000000 // (sa.n * sb.n) AS BIGINT)
               AS cosine2_ppm
      FROM pairs p
      JOIN supp sa ON sa.l_partkey = p.part_a
      JOIN supp sb ON sb.l_partkey = p.part_b)
    SELECT CAST(row_number() OVER (ORDER BY cosine2_ppm DESC, part_a, part_b)
                AS BIGINT) AS rank,
           part_a, part_b, CAST(n_both AS BIGINT) AS n_both, n_a, n_b, cosine2_ppm
    FROM scored
    QUALIFY rank <= {_COSINE_TOP}
    """,
    tags=("J7", "A1", "O2", "U5"),
)
def rec_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering — the normalized "customers who
    bought X also bought Y" score: cosine similarity between items'
    order-membership vectors, cos(i,j) = n_both / sqrt(n_i · n_j)
    (Sarwar et al. 2001, the item-based CF standard; raw co-counts —
    basket_copurchase_pairs — just rank popular items with each other,
    cosine normalizes away item popularity). Reported as the exact
    integer cos²·10^6 = n_both²·1e6 // (n_i·n_j) so the ranking and the
    hash avoid sqrt entirely (cos² is order-isomorphic to cos on
    non-negatives); the supports ride along for display.

    Scale: pair generation is the basket self-join, bounded by basket
    size squared per order (cap/salt mega-baskets — the repo's standard
    pairwise bound); supports are one map-side-combine count; the two
    support joins hit the pair table AFTER aggregation (pairs, not
    order-rows, flow); top-k is TakeOrderedAndProject. n_both² at 1e9
    co-orders reaches 1e18·1e6: HUGEINT/decimal(38,0)-lifted."""
    from pyspark.sql import Window as W

    dp, supp, pairs = _basket_pairs(spark, sf_dir)
    scored = (
        pairs.join(supp.withColumnRenamed("l_partkey", "part_a"), "part_a")
        .withColumnRenamed("n", "na")
        .join(
            supp.withColumnRenamed("l_partkey", "part_b").withColumnRenamed("n", "nb"),
            "part_b",
        )
        .select(
            "part_a",
            "part_b",
            F.col("n_both").cast("long").alias("n_both"),
            F.col("na").cast("long").alias("n_a"),
            F.col("nb").cast("long").alias("n_b"),
            F.expr("CAST(n_both * n_both * 1000000 div (na * nb) AS BIGINT)").alias(
                "cosine2_ppm"
            ),
        )
    )
    top = scored.orderBy(F.desc("cosine2_ppm"), "part_a", "part_b").limit(_COSINE_TOP)
    return top.select(
        F.row_number()
        .over(W.orderBy(F.desc("cosine2_ppm"), "part_a", "part_b"))
        .cast("long")
        .alias("rank"),
        "part_a",
        "part_b",
        "n_both",
        "n_a",
        "n_b",
        "cosine2_ppm",
    )


@query(
    "agg_pareto_abc",
    oracle="""
    WITH pr AS (
      SELECT l_partkey,
             sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS rev
      FROM lineitem GROUP BY 1),
    sc AS (SELECT l_partkey, rev,
                  CAST(rev * 1000000 AS HUGEINT) AS rev_sc FROM pr),
    tot AS (SELECT sum(rev_sc) AS total_sc FROM sc),
    c AS (
      SELECT rev, rev_sc,
             coalesce(sum(rev_sc) OVER (ORDER BY rev DESC, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               CAST(0 AS HUGEINT)) AS before_sc
      FROM sc),
    cls AS (
      SELECT CASE WHEN before_sc * 100 < total_sc * 80 THEN 'A'
                  WHEN before_sc * 100 < total_sc * 95 THEN 'B'
                  ELSE 'C' END AS abc_class,
             rev, rev_sc, total_sc
      FROM c CROSS JOIN tot)
    SELECT abc_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(round(sum(rev), 2) AS DOUBLE) AS revenue,
           CAST(sum(rev_sc) * 1000000 // max(total_sc) AS BIGINT) AS share_ppm
    FROM cls GROUP BY abc_class
    """,
    tags=("A7", "W3", "O1"),
)
def agg_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto revenue classification of the part catalog — the
    inventory-management standard (Juran's 80/20 rule made operational):
    rank parts by revenue, class A = parts that start before the 80%
    cumulative-revenue mark, B before 95%, C the tail; report each
    class's size, revenue, and exact share. Classification uses the
    share BEFORE the part (so the part straddling a boundary belongs to
    the earlier class and class A is never empty).

    Exactness: per-part revenue is the exact decimal(38,6) sum of
    l_extendedprice*(1-l_discount) (the dsum discipline), scaled to the
    integer rev*1e6 for every comparison — boundary tests are HUGEINT/
    decimal(38,0) cross-multiplications (before*100 < total*80), shares
    are floor-scaled ppm, and the displayed class revenue rounds the
    exact decimal at 2 places before the double cast (dsum2: sub-2^53).

    Scale: the global cumulative revenue every part needs is computed
    WITHOUT a single-node sort — the distributed two-pass prefix-sum
    shape (shard_by_token_budget / histogram_equidepth):
    repartitionByRange(rev DESC, partkey) gives cross-partition order,
    each partition accumulates locally, and only the #partitions-row
    subtotal table passes through one task before broadcasting back.
    Everything else is map-side-combined aggregation over the part
    dimension, never raw lineitem rows."""
    from .registry import global_prefix

    pr = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.expr("CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))")
            ).alias("rev")
        )
        .withColumn("rev_sc", F.expr("CAST(rev * 1000000 AS DECIMAL(38,0))"))
    )
    # the two-pass distributed prefix (rank + cumulative revenue) lives
    # in registry.global_prefix — shared with agg_abc_xyz_matrix, the
    # ranked-retrieval evals, and the histogram/shard family (a /code-
    # review find: this body originally hand-rolled the same 35 lines)
    ranked = global_prefix(
        pr, [F.col("rev").desc(), F.col("l_partkey")], [("rev_sc", F.col("rev_sc"))]
    )
    tot = ranked.agg(F.max("cum_rev_sc").alias("total_sc"))
    cls = ranked.crossJoin(F.broadcast(tot)).withColumn(
        "abc_class",
        F.expr(
            "CASE WHEN (cum_rev_sc - rev_sc) * 100 < total_sc * 80 THEN 'A'"
            " WHEN (cum_rev_sc - rev_sc) * 100 < total_sc * 95 THEN 'B'"
            " ELSE 'C' END"
        ),
    )
    return cls.groupBy("abc_class").agg(
        F.count("*").cast("long").alias("n_parts"),
        F.round(F.sum("rev"), 2).cast("double").alias("revenue"),
        F.expr("CAST(sum(rev_sc) * 1000000 div max(total_sc) AS BIGINT)").alias(
            "share_ppm"
        ),
    )


_AR_MINSUP = 5
_AR_TOP = 50


@query(
    "assoc_rules_lift",
    oracle=f"""
    WITH dp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    nb AS (SELECT CAST(count(DISTINCT l_orderkey) AS HUGEINT) AS n_orders FROM dp),
    supp AS (SELECT l_partkey, CAST(count(*) AS HUGEINT) AS n FROM dp GROUP BY 1),
    pairs AS (
      SELECT a.l_partkey AS x, b.l_partkey AS y,
             CAST(count(*) AS HUGEINT) AS n_both
      FROM dp a JOIN dp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING count(*) >= {_AR_MINSUP}),
    dirs AS (
      SELECT x AS ante, y AS cons, n_both FROM pairs
      UNION ALL
      SELECT y, x, n_both FROM pairs),
    scored AS (
      SELECT d.ante, d.cons, CAST(d.n_both AS BIGINT) AS n_both,
             CAST(sa.n AS BIGINT) AS n_ante, CAST(sc.n AS BIGINT) AS n_cons,
             CAST(d.n_both * 1000000 // b.n_orders AS BIGINT) AS support_ppm,
             CAST(d.n_both * 1000000 // sa.n AS BIGINT) AS confidence_ppm,
             CAST(d.n_both * b.n_orders * 1000000 // (sa.n * sc.n) AS BIGINT)
               AS lift_ppm
      FROM dirs d
      JOIN supp sa ON sa.l_partkey = d.ante
      JOIN supp sc ON sc.l_partkey = d.cons
      CROSS JOIN nb b)
    SELECT CAST(row_number() OVER (ORDER BY lift_ppm DESC, confidence_ppm DESC,
                                   ante, cons) AS BIGINT) AS rank,
           ante, cons, n_both, n_ante, n_cons,
           support_ppm, confidence_ppm, lift_ppm
    FROM scored
    QUALIFY rank <= {_AR_TOP}
    """,
    tags=("J7", "A1", "O2", "A7"),
)
def assoc_rules_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional association rules over order baskets — the Apriori
    2-itemset layer (Agrawal & Srikant 1994) with the three canonical
    metrics: support (joint basket share), confidence (P(cons|ante) —
    directional, so each frequent pair yields TWO rules), and lift
    (observed co-occurrence over the independence expectation; lift's
    symmetry and confidence's asymmetry visible side by side is the
    textbook read). min-support pruning at {_AR_MINSUP} baskets happens
    ON THE PAIR AGGREGATE before any metric join — the Apriori property
    applied where it saves the most work.

    Exactness: all three metrics are exact HUGEINT/decimal floor ratios
    (n_both * n_orders * 1e6 passes 2^63 at scale); ranking is
    total-ordered (lift, confidence, ante, cons).

    Scale: basket self-join bounded by basket size squared per order
    (the repo's standard pairwise bound); min-support prunes BEFORE the
    support joins, so only frequent pairs flow; supports are one
    map-side-combined count; the basket total is a 1-row broadcast;
    top-k is TakeOrdered."""
    from pyspark.sql import Window as W

    dp, supp, all_pairs = _basket_pairs(spark, sf_dir)
    nb = dp.agg(
        F.countDistinct("l_orderkey").cast("decimal(38,0)").alias("n_orders")
    )
    pairs = all_pairs.where(F.col("n_both") >= _AR_MINSUP)
    dirs = pairs.select(
        F.col("part_a").alias("ante"), F.col("part_b").alias("cons"), "n_both"
    ).unionAll(
        pairs.select(
            F.col("part_b").alias("ante"), F.col("part_a").alias("cons"), "n_both"
        )
    )
    scored = (
        dirs.join(
            supp.withColumnRenamed("l_partkey", "ante").withColumnRenamed(
                "n", "na"
            ),
            "ante",
        )
        .join(
            supp.withColumnRenamed("l_partkey", "cons").withColumnRenamed(
                "n", "nc"
            ),
            "cons",
        )
        .crossJoin(F.broadcast(nb))
        .select(
            "ante",
            "cons",
            F.col("n_both").cast("long").alias("n_both"),
            F.col("na").cast("long").alias("n_ante"),
            F.col("nc").cast("long").alias("n_cons"),
            F.expr("CAST(n_both * 1000000 div n_orders AS BIGINT)").alias(
                "support_ppm"
            ),
            F.expr("CAST(n_both * 1000000 div na AS BIGINT)").alias(
                "confidence_ppm"
            ),
            F.expr(
                "CAST(n_both * n_orders * 1000000 div (na * nc) AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )
    top = scored.orderBy(
        F.desc("lift_ppm"), F.desc("confidence_ppm"), "ante", "cons"
    ).limit(_AR_TOP)
    return top.select(
        F.row_number()
        .over(
            W.orderBy(F.desc("lift_ppm"), F.desc("confidence_ppm"), "ante", "cons")
        )
        .cast("long")
        .alias("rank"),
        "ante",
        "cons",
        "n_both",
        "n_ante",
        "n_cons",
        "support_ppm",
        "confidence_ppm",
        "lift_ppm",
    )


@query(
    "agg_abc_xyz_matrix",
    oracle="""
    WITH pr AS (
      SELECT l_partkey,
             sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS rev
      FROM lineitem GROUP BY 1),
    wk AS (
      SELECT l_partkey,
             CAST(epoch_us(date_trunc('week', l_shipdate)) AS BIGINT)
               // 604800000000 AS w,
             CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS HUGEINT) AS q
      FROM lineitem GROUP BY 1, 2),
    span AS (
      SELECT CAST(max(w) - min(w) + 1 AS HUGEINT) AS n_weeks FROM wk),
    xyz AS (
      SELECT l_partkey,
             CAST(sum(q) AS HUGEINT) AS s,
             CAST(sum(q * q) AS HUGEINT) AS sxx
      FROM wk GROUP BY 1),
    xcls AS (
      SELECT x.l_partkey,
             CASE WHEN x.s = 0 THEN 'Z'
                  WHEN (sp.n_weeks * x.sxx - x.s * x.s) * 4 < x.s * x.s THEN 'X'
                  WHEN (sp.n_weeks * x.sxx - x.s * x.s) < x.s * x.s THEN 'Y'
                  ELSE 'Z' END AS xyz_class
      FROM xyz x CROSS JOIN span sp),
    sc AS (SELECT l_partkey, rev, CAST(rev * 1000000 AS HUGEINT) AS rev_sc
           FROM pr),
    tot AS (SELECT sum(rev_sc) AS total_sc FROM sc),
    c AS (
      SELECT l_partkey, rev, rev_sc,
             coalesce(sum(rev_sc) OVER (ORDER BY rev DESC, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               CAST(0 AS HUGEINT)) AS before_sc
      FROM sc),
    abc AS (
      SELECT l_partkey, rev_sc,
             CASE WHEN before_sc * 100 < total_sc * 80 THEN 'A'
                  WHEN before_sc * 100 < total_sc * 95 THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM c CROSS JOIN tot)
    SELECT a.abc_class, x.xyz_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(a.rev_sc) * 1000000 // (SELECT max(total_sc) FROM tot)
                AS BIGINT) AS revenue_share_ppm
    FROM abc a JOIN xcls x USING (l_partkey)
    GROUP BY 1, 2
    """,
    tags=("A7", "W3", "F4", "J7"),
)
def agg_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ABC-XYZ inventory matrix — the supply-chain planning
    standard crossing revenue importance (ABC, the Pareto classes of
    agg_pareto_abc) with demand PREDICTABILITY (XYZ, the squared
    coefficient of variation of weekly demand): an A-X part is
    forecastable core revenue, an A-Z part is the planner's nightmare.
    XYZ thresholds are the textbook CV < 0.5 (X) and CV < 1 (Y),
    applied as exact integer cross-multiplications on the variance
    identity over the FULL week grid — weeks with zero demand count
    (they are what makes demand erratic): with W = span weeks and
    only nonzero weeks materialized, n*Var = W*sxx - s^2 needs no
    zero-week rows at all. CV^2 < t^2 <=> (W*sxx - s^2) * (1/t^2
    factor) < s^2, so X is (..)*4 < s^2 — no division, no sqrt.

    Scale: weekly demand is one (part, week) aggregate; the variance
    identity needs only per-part sums (map-side combine); ABC reuses
    the two-pass distributed prefix (registry.global_prefix); the
    matrix output is <= 9 rows."""
    from .registry import global_prefix

    li = load_table(spark, sf_dir, "lineitem")
    wk = (
        li.select(
            "l_partkey",
            F.expr(
                "unix_timestamp(date_trunc('week', l_shipdate)) div 604800"
            ).alias("w"),
            F.expr("CAST(floor(l_quantity) AS BIGINT)").alias("q0"),
        )
        .groupBy("l_partkey", "w")
        .agg(F.sum("q0").cast("decimal(38,0)").alias("q"))
        .localCheckpoint(eager=False)
    )
    span = wk.agg(
        F.expr("CAST(max(w) - min(w) + 1 AS DECIMAL(38,0))").alias("n_weeks")
    )
    xyz = wk.groupBy("l_partkey").agg(
        F.sum("q").alias("s"), F.sum(F.expr("q * q")).alias("sxx")
    )
    xcls = xyz.crossJoin(F.broadcast(span)).select(
        "l_partkey",
        F.expr(
            "CASE WHEN s = 0 THEN 'Z'"
            " WHEN (n_weeks * sxx - s * s) * 4 < s * s THEN 'X'"
            " WHEN (n_weeks * sxx - s * s) < s * s THEN 'Y'"
            " ELSE 'Z' END"
        ).alias("xyz_class"),
    )
    pr = (
        li.groupBy("l_partkey")
        .agg(
            F.sum(
                F.expr("CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))")
            ).alias("rev")
        )
        .withColumn("rev_sc", F.expr("CAST(rev * 1000000 AS DECIMAL(38,0))"))
    )
    ranked = global_prefix(
        pr, [F.col("rev").desc(), F.col("l_partkey")], [("rev_sc", F.col("rev_sc"))]
    )
    tot = ranked.agg(F.max("cum_rev_sc").alias("total_sc"))
    abc = ranked.crossJoin(F.broadcast(tot)).select(
        "l_partkey",
        "rev_sc",
        "total_sc",
        F.expr(
            "CASE WHEN (cum_rev_sc - rev_sc) * 100 < total_sc * 80 THEN 'A'"
            " WHEN (cum_rev_sc - rev_sc) * 100 < total_sc * 95 THEN 'B'"
            " ELSE 'C' END"
        ).alias("abc_class"),
    )
    return abc.join(xcls, "l_partkey").groupBy("abc_class", "xyz_class").agg(
        F.count("*").cast("long").alias("n_parts"),
        F.expr(
            "CAST(sum(rev_sc) * 1000000 div max(total_sc) AS BIGINT)"
        ).alias("revenue_share_ppm"),
    )

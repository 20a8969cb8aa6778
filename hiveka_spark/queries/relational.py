"""SURVEY.md §2B — the relational query surface.

The reference delegates all of this to Hive (README.md:3 "all the SQL
capabilities of hive"; TODO.md:6-9 lists select *, count(*), projection,
joins, group-by as the acceptance surface).  Here each capability is declared
as an inventory entry executed by Catalyst, with a DuckDB oracle.

Conventions (driver hash-compare safety):
- every computed column aliased identically in Spark + SQL;
- double aggregates rounded: sums -> 2 dp, avgs/ratios -> 4 dp on BOTH sides;
- timestamps never emitted raw: dates go out as 'yyyy-MM-dd' strings, event
  times as integer epoch-millis arithmetic (events.ts is nano-precision in
  parquet; DuckDB keeps ns while Spark truncates to us, so only ms-floor
  values are comparable);
- integer-typed computed columns cast to BIGINT on both sides.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hiveka_spark.catalog import dim, load_tables, table
from hiveka_spark.queries import register

# ---------------------------------------------------------------------------
# Aggregation (TPC-H Q1 style) — the reference's own headline demo is
# count(*)/group-by over the Kafka scan (TODO.md:7-9).
# ---------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                          AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                     AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                  AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)   AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                          AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                                     AS avg_price,
           ROUND(AVG(l_discount), 4)                                          AS avg_disc,
           COUNT(*)                                                           AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "scan", "flagship"),
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-scan group-by with partial (map-side) aggregation; the shipdate
    filter reaches the parquet scan as a pushed predicate."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q02_filter_project",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus = 'O'
      AND o_totalprice BETWEEN 10000 AND 50000
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_orderpriority LIKE '%-%'
    """,
    tags=("filter", "projection", "pushdown"),
)
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + conjunctive predicates (=, BETWEEN, IN, LIKE); all four
    predicates and the 4-column projection push into the parquet scan."""
    o = table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus") == "O")
        & F.col("o_totalprice").between(10000, 50000)
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_orderpriority").like("%-%")
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")


@register(
    "q03_shipping_priority",
    oracle="""
    WITH rev AS (
      SELECT l.l_orderkey,
             strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
             ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l.l_orderkey, strftime(o.o_orderdate, '%Y-%m-%d')
    )
    SELECT l_orderkey, order_date, revenue
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY revenue DESC, l_orderkey) AS rn FROM rev)
    WHERE rn <= 10
    """,
    tags=("join", "agg", "topk"),
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, filtered fact scan, group-by, deterministic
    top-10 (revenue desc, orderkey tiebreak via row_number)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    rev = (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp"))
        .groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
    return rev.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 10).drop("rn")


@register(
    "q04_brand_revenue",
    oracle="""
    SELECT p.p_brand,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           COUNT(*) AS line_cnt,
           ROUND(AVG(l.l_quantity), 4) AS avg_qty
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
    tags=("join", "broadcast", "agg"),
)
def q04_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-dimension join with an explicit broadcast hint on part: no
    shuffle of the lineitem side at any scale."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("line_cnt"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        )
    )


@register(
    "q05_customer_order_stats",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           COUNT(o.o_orderkey)                       AS order_cnt,
           ROUND(COALESCE(SUM(o.o_totalprice), 0), 2) AS total_spend
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
    tags=("join", "outer", "agg"),
)
def q05_customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("order_cnt"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spend"),
        )
    )


@register(
    "q06_semi_join",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
    tags=("join", "semi"),
)
def q06_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers having at least one >$400k order."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "q07_anti_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join", "anti"),
)
def q07_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers that never ordered."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q08_topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_name, c_acctbal, CAST(rn AS BIGINT) AS rnk
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                       ORDER BY c_acctbal DESC, c_custkey) AS rn
          FROM customer)
    WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def q08_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via ranking window (deterministic tiebreak on key)."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("c_mktsegment", "c_custkey", "c_name", "c_acctbal", "rnk")
    )


@register(
    "q09_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           ROUND(SUM(o_totalprice) OVER w, 2)  AS running_spend,
           ROUND(o_totalprice - COALESCE(LAG(o_totalprice) OVER w, 0), 2) AS delta_prev
    FROM orders
    WHERE o_custkey <= 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "analytic"),
)
def q09_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-based running aggregate + lag() analytic over an ordered window."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wl = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
        F.round(
            F.col("o_totalprice") - F.coalesce(F.lag("o_totalprice").over(wl), F.lit(0.0)), 2
        ).alias("delta_prev"),
    )


@register(
    "q10_top_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    tags=("sort", "limit"),
)
def q10_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort + limit (TakeOrderedAndProject — no full sort materialized)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


@register(
    "q11_set_ops",
    oracle="""
    SELECT 'both' AS tag, n FROM
      (SELECT c_nationkey AS n FROM customer INTERSECT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'cust_only' AS tag, n FROM
      (SELECT c_nationkey AS n FROM customer EXCEPT SELECT s_nationkey FROM supplier)
    """,
    tags=("setops",),
)
def q11_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL over nation keys."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("n"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("n"))
    both = c.intersect(s).select(F.lit("both").alias("tag"), "n")
    cust_only = c.subtract(s).select(F.lit("cust_only").alias("tag"), "n")
    return both.unionAll(cust_only)


@register(
    "q12_distinct_agg",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(*)                  AS n_lines
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "distinct"),
)
def q12_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple count-distincts in one aggregation (expand + two-phase agg)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q13_rollup_revenue",
    oracle="""
    SELECT COALESCE(r_name, '<ALL>') AS region_name,
           COALESCE(n_name, '<ALL>') AS nation_name,
           ROUND(SUM(o_totalprice), 2) AS revenue,
           COUNT(*) AS order_cnt
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
    tags=("agg", "rollup", "join"),
)
def q13_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy (region -> nation -> grand total) over a star join;
    nation/region joins are broadcast (bounded dims)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = dim(spark, sf_dir, "nation")
    r = dim(spark, sf_dir, "region")
    joined = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"), F.count(F.lit(1)).alias("order_cnt"))
        .select(
            F.coalesce("r_name", F.lit("<ALL>")).alias("region_name"),
            F.coalesce("n_name", F.lit("<ALL>")).alias("nation_name"),
            "revenue",
            "order_cnt",
        )
    )


@register(
    "q14_cube_lineitem",
    oracle="""
    SELECT COALESCE(l_returnflag, '<ALL>') AS returnflag,
           COALESCE(l_linestatus, '<ALL>') AS linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           COUNT(*) AS cnt
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    tags=("agg", "cube"),
)
def q14_cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two grouping dimensions (all 4 grouping sets)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("cnt"))
        .select(
            F.coalesce("l_returnflag", F.lit("<ALL>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<ALL>")).alias("linestatus"),
            "sum_qty",
            "cnt",
        )
    )


@register(
    "q15_string_funcs",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name)                            AS name_upper,
           CAST(LENGTH(p_name) AS BIGINT)           AS name_len,
           SUBSTR(p_type, 1, 5)                     AS type_prefix,
           CONCAT(p_brand, '|', p_type)             AS brand_type,
           REPLACE(LOWER(p_name), ' ', '_')         AS name_slug,
           LPAD(CAST(p_size AS VARCHAR), 4, '0')    AS size_padded,
           REVERSE(p_brand)                         AS brand_rev
    FROM part
    WHERE p_size >= 25
    """,
    tags=("scalar", "string"),
)
def q15_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string-function surface (upper/length/substr/concat/replace/
    lpad/reverse) — all whole-stage-codegen JVM expressions."""
    p = table(spark, sf_dir, "part").filter(F.col("p_size") >= 25)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.lower("p_name"), F.lit(" "), F.lit("_")).alias("name_slug"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.reverse("p_brand").alias("brand_rev"),
    )


@register(
    "q16_datetime_agg",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)  AS order_year,
           CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS order_month,
           COUNT(*) AS order_cnt,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY 1, 2
    """,
    tags=("scalar", "datetime", "agg"),
)
def q16_datetime_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction + monthly aggregation."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy(
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month"),
    ).agg(F.count(F.lit(1)).alias("order_cnt"), F.round(F.sum("o_totalprice"), 2).alias("revenue"))


@register(
    "q17_case_expr",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 200000 THEN 'mid'
                ELSE 'large' END AS bucket,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_label,
           COUNT(*) AS cnt,
           ROUND(AVG(o_totalprice), 4) AS avg_price
    FROM orders
    GROUP BY 1, 2
    """,
    tags=("scalar", "conditional", "agg"),
)
def q17_case_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + NULLIF/COALESCE conditionals."""
    o = table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "mid")
        .otherwise("large")
        .alias("bucket")
    )
    status = F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
        "status_label"
    )
    return o.groupBy(bucket, status).agg(
        F.count(F.lit(1)).alias("cnt"), F.round(F.avg("o_totalprice"), 4).alias("avg_price")
    )


@register(
    "q18_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS cnt,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    """,
    tags=("scalar", "json", "agg"),
)
def q18_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events.props payload column (the Kafka
    value-decode analog for JSON-encoded topics)."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).cast("bigint").alias("max_k"),
    )


@register(
    "q19_word_counts",
    oracle="""
    SELECT w AS word, COUNT(*) AS cnt
    FROM (SELECT UNNEST(string_split(LOWER(text), ' ')) AS w FROM documents)
    WHERE w <> ''
    GROUP BY w
    HAVING COUNT(*) >= 20
    """,
    tags=("scalar", "array", "explode"),
)
def q19_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array split + explode + HAVING — the lateral-view surface."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 20)
    )


@register(
    "q20_range_join",
    oracle="""
    SELECT a.user_id, COUNT(*) AS pair_cnt
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'click' AND b.event_type = 'purchase'
     AND epoch_ms(b.ts) > epoch_ms(a.ts)
     AND epoch_ms(b.ts) <= epoch_ms(a.ts) + 600000
    GROUP BY a.user_id
    """,
    tags=("join", "theta", "range"),
)
def q20_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range self-join: purchases within 10 min after a click by the same
    user.  Equi-key on user_id keeps it a hash join with a range residual
    (never a cartesian), so it scales with per-user event counts.  Comparisons
    in integer epoch-millis (ns-precision parquet vs us-precision Spark)."""
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_millis("ts").alias("ms")
    )
    a = e.filter(F.col("event_type") == "click").select("user_id", F.col("ms").alias("a_ms"))
    b = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"), F.col("ms").alias("b_ms")
    )
    return (
        a.join(
            b,
            (F.col("user_id") == F.col("b_user"))
            & (F.col("b_ms") > F.col("a_ms"))
            & (F.col("b_ms") <= F.col("a_ms") + 600000),
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
    )


@register(
    "q21_hourly_windows",
    oracle="""
    SELECT epoch_ms(ts) // 3600000 AS hour_bucket,
           event_type,
           COUNT(*) AS cnt,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("agg", "window-time", "streaming-batch"),
)
def q21_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows (batch form of the streaming windowed
    aggregation; integer bucket arithmetic keeps both engines bit-identical)."""
    e = table(spark, sf_dir, "events")
    return (
        e.withColumn("hour_bucket", (F.unix_millis("ts") / F.lit(3600000)).cast("bigint"))
        .groupBy("hour_bucket", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("total_value"))
    )


@register(
    "q22_sessionization",
    oracle="""
    WITH flagged AS (
      SELECT user_id, epoch_ms(ts) AS ms,
             CASE WHEN epoch_ms(ts) - LAG(epoch_ms(ts)) OVER
                    (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
                  > 1800000 THEN 1
                  WHEN LAG(epoch_ms(ts)) OVER
                    (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) IS NULL THEN 1
                  ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ms,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ms
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id,
           CAST(COUNT(DISTINCT session_id) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events,
           CAST(FLOOR(COUNT(*) * 10000.0 / COUNT(DISTINCT session_id)) AS BIGINT) / 10000.0
             AS events_per_session
    FROM sessions
    GROUP BY user_id
    """,
    tags=("window", "sessionize", "streaming-batch"),
)
def q22_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (30-min inactivity gap) via lag + running sum —
    the deterministic batch twin of streaming session_window (see
    hiveka_spark.streaming)."""
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_millis("ts").alias("ms")
    )
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    flagged = e.withColumn(
        "new_session",
        F.when(F.col("ms") - F.lag("ms").over(w) > 1800000, 1)
        .when(F.lag("ms").over(w).isNull(), 1)
        .otherwise(0),
    )
    wsum = (
        Window.partitionBy("user_id")
        .orderBy("ms")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(wsum))
    return sessions.groupBy("user_id").agg(
        F.countDistinct("session_id").cast("bigint").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
        # floor-quantized ratio: ROUND on small-denominator rationals hits
        # exact decimal half-boundaries where engines' rounding modes diverge;
        # floor of an identical IEEE double is engine-independent.
        (F.floor(F.count(F.lit(1)) * 10000.0 / F.countDistinct("session_id")) / 10000.0).alias(
            "events_per_session"
        ),
    )


@register(
    "q23_correlated_subquery",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, ca.cust_order_cnt
    FROM orders o
    JOIN (SELECT o_custkey, AVG(o_totalprice) AS avg_price, COUNT(*) AS cust_order_cnt
          FROM orders GROUP BY o_custkey) ca
      ON o.o_custkey = ca.o_custkey
    WHERE o.o_totalprice > 2 * ca.avg_price
    """,
    tags=("subquery", "join", "agg"),
)
def q23_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders >2x their customer's average (decorrelated into agg + self-join —
    the plan Catalyst produces for the correlated form)."""
    o = table(spark, sf_dir, "orders")
    ca = o.groupBy(F.col("o_custkey").alias("ca_custkey")).agg(
        F.avg("o_totalprice").alias("avg_price"),
        F.count(F.lit(1)).alias("cust_order_cnt"),
    )
    return (
        o.join(ca, F.col("o_custkey") == F.col("ca_custkey"))
        .filter(F.col("o_totalprice") > 2 * F.col("avg_price"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "cust_order_cnt")
    )


@register(
    "q24_regional_revenue",
    oracle="""
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey  = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    tags=("join", "star", "agg", "flagship"),
)
def q24_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way star join, bounded dims broadcast, date-filtered
    fact scan."""
    r = dim(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = dim(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
        )
    )


@register(
    "q25_sql_entrypoint",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_cnt
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    GROUP BY o_orderpriority
    """,
    tags=("sql", "subquery", "semi"),
)
def q25_sql_entrypoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql() entry point with a correlated EXISTS subquery (TPC-H Q4
    shape) — exercises the parser/analyzer path, not just the DataFrame DSL."""
    load_tables(spark, sf_dir, register=True)
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_cnt
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        GROUP BY o_orderpriority
        """
    )

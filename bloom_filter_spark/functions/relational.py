"""Relational query library — stock Spark DataFrame/SQL only.

The reference has no relational operators (SURVEY.md §2.6); these queries
exercise the engine's use of Catalyst's scan/filter/join/agg/window/sort and
double as strong exact-match oracles in the driver's correctness gate.
Plans are written so pushdown and broadcast happen: narrow selects before
joins, broadcast() on dimension tables, aggregation keyed on low-cardinality
columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity").alias("sum_qty"),
                 F.sum("l_extendedprice").alias("sum_base_price"),
                 F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
                  .alias("sum_disc_price"),
                 F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
                 F.round(F.avg("l_discount"), 6).alias("avg_disc"),
                 F.count("*").alias("count_order"))
            .orderBy("l_returnflag", "l_linestatus"))


def top_customer_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join orders→customer→nation (dims broadcast) + window top-1 spender."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .select("o_custkey", "o_totalprice")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet") \
        .select("c_custkey", "c_name", "c_nationkey")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet") \
        .select("n_nationkey", "n_name")
    spend = (orders.groupBy("o_custkey")
             .agg(F.round(F.sum("o_totalprice"), 4).alias("total_spend")))
    joined = (spend.join(F.broadcast(cust), spend.o_custkey == cust.c_custkey)
              .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey))
    w = Window.partitionBy("n_name").orderBy(F.desc("total_spend"), F.asc("c_custkey"))
    return (joined.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(F.col("n_name").alias("nation"), F.col("c_name").alias("customer"),
                    "total_spend"))


def sessionize_events(spark: SparkSession, sf_dir: str,
                      gap_minutes: int = 30) -> DataFrame:
    """Sessionization via lag + gap cumsum (the batch-side analog of
    session_window): per-user session count and mean session length."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts")
    # parquet TIMESTAMP_NTZ: epoch seconds via a ltz hop (session TZ is UTC)
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    marked = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0))
    sessions = marked.withColumn(
        "session_id", F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    per_session = (sessions.groupBy("user_id", "session_id")
                   .agg(F.count("*").alias("n_events")))
    return (per_session.groupBy("user_id")
            .agg(F.count("*").cast("long").alias("n_sessions"),
                 F.sum("n_events").cast("long").alias("n_events"))
            .orderBy("user_id"))


def event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped aggregate with distinct + quantile-ish stats over events."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (ev.groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.countDistinct("user_id").alias("n_users"),
                 F.round(F.sum("value"), 4).alias("sum_value"),
                 F.round(F.min("value"), 6).alias("min_value"),
                 F.round(F.max("value"), 6).alias("max_value")))


def lineitem_shipdate_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-bucketed rollup (year-month) — partition-pruning-friendly shape."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (li.select(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"),
                      "l_quantity", "l_extendedprice")
            .groupBy("ship_month")
            .agg(F.count("*").alias("n_items"),
                 F.sum("l_quantity").alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 4).alias("sum_price")))


def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style shipping priority: customer ⋈ orders ⋈ lineitem with
    the dimension side broadcast, revenue top-10.  Selective filters sit
    directly on each scan (pushdown), the fact join keys are narrow
    projections, and the top-10 over the ROUNDED revenue with an orderkey
    tiebreak is deterministic across engines."""
    cust = (spark.read.parquet(f"{sf_dir}/customer.parquet")
            .where(F.col("c_mktsegment") == "BUILDING")
            .select("c_custkey"))
    orders = (spark.read.parquet(f"{sf_dir}/orders.parquet")
              .where(F.col("o_orderdate") < F.lit("1995-03-15"))
              .select("o_orderkey", "o_custkey", "o_orderdate"))
    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .where(F.col("l_shipdate") > F.lit("1995-03-15"))
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .groupBy("l_orderkey", "o_orderdate")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 4)
                  .alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
            .limit(10)
            .select("l_orderkey",
                    F.date_format("o_orderdate", "yyyy-MM-dd")
                     .alias("o_orderdate"), "revenue"))


def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style forecast revenue: pure filter + global agg — the
    pushdown showcase (every predicate reaches the parquet scan; no joins,
    no shuffle beyond the single-row final agg)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (li.where((F.col("l_shipdate") >= F.lit("1994-01-01"))
                     & (F.col("l_shipdate") < F.lit("1995-01-01"))
                     & F.col("l_discount").between(0.05, 0.07)
                     & (F.col("l_quantity") < 24))
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * F.col("l_discount")), 4).alias("revenue"),
                 F.count("*").alias("n_items")))


def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-adapted priority-checking query (this schema ships no
    commit/receipt dates, so the EXISTS predicate becomes "some line item
    shipped after the order date"): orders in one quarter, counted per
    priority, keeping only orders with at least one qualifying lineitem.

    Plan shape: the EXISTS is a LEFT SEMI join — no row multiplication,
    the lineitem side projects two narrow columns, the date filters sit in
    PushedFilters on both scans, and AQE picks broadcast when the filtered
    order slice is small."""
    orders = (spark.read.parquet(f"{sf_dir}/orders.parquet")
              .where((F.col("o_orderdate") >= F.lit("1996-01-01"))
                     & (F.col("o_orderdate") < F.lit("1996-04-01")))
              .select("o_orderkey", "o_orderdate", "o_orderpriority"))
    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .select("l_orderkey", "l_shipdate"))
    kept = orders.join(
        li, (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate), "left_semi")
    return (kept.groupBy("o_orderpriority")
            .agg(F.count("*").cast("long").alias("order_count"))
            .orderBy("o_orderpriority"))


def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local-supplier volume: revenue per nation in one region
    for one order-year, where the supplying and ordering nations match.

    Plan shape: region→nation is a broadcast dimension chain; the two
    fact joins (orders, then supplier-with-nation) are equi-joins with the
    c_nationkey = s_nationkey locality predicate applied as a join filter;
    rounded revenue + nation tiebreak keep engine ordering deterministic."""
    region = (spark.read.parquet(f"{sf_dir}/region.parquet")
              .where(F.col("r_name") == "ASIA").select("r_regionkey"))
    nation = (spark.read.parquet(f"{sf_dir}/nation.parquet")
              .join(F.broadcast(region),
                    F.col("n_regionkey") == F.col("r_regionkey"))
              .select("n_nationkey", "n_name"))
    supp = (spark.read.parquet(f"{sf_dir}/supplier.parquet")
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", "s_nationkey", "n_name"))
    cust = (spark.read.parquet(f"{sf_dir}/customer.parquet")
            .select("c_custkey", "c_nationkey"))
    orders = (spark.read.parquet(f"{sf_dir}/orders.parquet")
              .where((F.col("o_orderdate") >= F.lit("1996-01-01"))
                     & (F.col("o_orderdate") < F.lit("1997-01-01")))
              .select("o_orderkey", "o_custkey"))
    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .select("l_orderkey", "l_suppkey", "l_extendedprice",
                  "l_discount"))
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(supp),
                  (li.l_suppkey == supp.s_suppkey)
                  & (cust.c_nationkey == supp.s_nationkey))
            .groupBy("n_name")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 4)
                  .alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("n_name")))


def funnel_conversion(events: DataFrame, user_col: str, type_col: str,
                      ts_col: str, steps: list[str],
                      within: int | None = None) -> DataFrame:
    """Ordered funnel analysis: for each prefix of ``steps``, how many
    users completed the steps IN ORDER — step i must occur strictly after
    the user's (earliest-completion) match of step i−1, and, with
    ``within``, no later than ``first_step_ts + within`` (same units as
    ``ts_col``, which must be numeric).

    Spark-first realization — k per-step aggregations chained by
    equi-joins on the user, NOT a per-user sequence scan: step 1 is
    min(ts) per user; step i is min(ts) over rows of type i joined to the
    step-(i−1) table with ts > prev_ts (earliest-completion greedy —
    matching each step as early as possible is optimal, so a user passes
    the funnel iff the greedy chain completes).  Every join key is the
    user id; per-step tables shrink monotonically; nothing is quadratic
    and event payloads never move.  → (step_idx, step, n_users,
    conversion 6-dp, vs step-1 users)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    from decimal import ROUND_HALF_UP, Decimal

    ev = events.select(F.col(user_col).alias("u"),
                       F.col(type_col).alias("t"),
                       F.col(ts_col).alias("ts"))
    cur = (ev.where(F.col("t") == steps[0])
           .groupBy("u").agg(F.min("ts").alias("ts"))
           .withColumn("t0", F.col("ts"))
           .persist())  # each count would otherwise replay the whole chain
    counts = [cur.count()]
    persisted = [cur]
    for step in steps[1:]:
        nxt = (ev.where(F.col("t") == step)
               .join(cur.select("u", F.col("ts").alias("prev"), "t0"), "u")
               .where(F.col("ts") > F.col("prev")))
        if within is not None:
            nxt = nxt.where(F.col("ts") <= F.col("t0") + F.lit(within))
        cur = (nxt.groupBy("u", "t0").agg(F.min("ts").alias("ts"))
               .select("u", "ts", "t0")
               .persist())
        counts.append(cur.count())
        persisted.append(cur)
    for df_ in persisted:
        df_.unpersist()
    base = max(counts[0], 1)

    def _round6(x: float) -> float:
        # HALF_UP like F.round / DuckDB round — Python's round() is
        # half-even and diverges on exact ties (e.g. 5/128)
        return float(Decimal(x).quantize(Decimal("0.000001"),
                                         rounding=ROUND_HALF_UP))

    rows = [(i + 1, s, int(c), _round6(c / base))
            for i, (s, c) in enumerate(zip(steps, counts))]
    return events.sparkSession.createDataFrame(
        rows, "step_idx long, step string, n_users long, conversion double")


def lineitem_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation over (l_returnflag, l_linestatus): subtotal rows
    per flag and a grand total alongside the leaf groups — one pass, one
    shuffle (Catalyst expands the grouping sets into a single Expand +
    hash aggregate, not one job per level).  ``grouping_id`` disambiguates
    NULL-as-subtotal from NULL data for the oracle."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (li.rollup("l_returnflag", "l_linestatus")
            .agg(F.count("*").cast("long").alias("n_items"),
                 F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
                 F.grouping_id().cast("long").alias("gid"))
            .select(F.coalesce("l_returnflag", F.lit("(all)"))
                    .alias("l_returnflag"),
                    F.coalesce("l_linestatus", F.lit("(all)"))
                    .alias("l_linestatus"),
                    "n_items", "sum_price", "gid"))


def user_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative + 3-event moving-average spend per user over purchase
    events — the canonical running-frame window pair on ONE hash Exchange
    (both frames share the (user, ts) sort).  Ties resolve by event_id so
    the running values are deterministic across engines."""
    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .where(F.col("event_type") == "purchase")
          .select("user_id", "event_id",
                  F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
                  "value"))
    w = (Window.partitionBy("user_id")
         .orderBy("ts_us", "event_id"))
    return ev.select(
        "user_id", "event_id", "ts_us",
        F.round(F.sum("value").over(
            w.rowsBetween(Window.unboundedPreceding, 0)), 4)
         .alias("cum_spend"),
        F.round(F.avg("value").over(w.rowsBetween(-2, 0)), 4)
         .alias("ma3_spend"))


def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type count pivot (wide feature table): one groupBy
    with the pivot domain PINNED (no extra distinct-scan job) — Catalyst
    plans it as a single hash aggregate with conditional counts, the same
    FILTER-aggregation shape the SQL oracle spells out."""
    types = ["click", "view", "purchase", "signup", "error"]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # fill ONLY the pivoted columns: an unscoped fill would rewrite a
    # NULL user_id group key to 0 (spurious user-0 row)
    out = (ev.groupBy("user_id").pivot("event_type", types).count()
           .na.fill(0, subset=types))
    return out.select("user_id",
                      *[F.col(t).cast("long").alias(f"n_{t}") for t in types])


def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style small-quantity-order revenue: average yearly revenue
    lost if small orders (quantity below 20% of the part's average) were
    not filled.  The correlated scalar subquery (per-part avg) is realized
    as a WINDOW aggregate over the part key — one hash Exchange, no
    self-join, no decorrelation rewrite needed; the per-part average is
    computed once and streamed past every lineitem of the part."""
    from pyspark.sql import Window
    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .select("l_partkey", "l_quantity", "l_extendedprice"))
    w = Window.partitionBy("l_partkey")
    flagged = (li.withColumn("avg_qty", F.avg("l_quantity").over(w))
               .where(F.col("l_quantity") < 0.2 * F.col("avg_qty")))
    return flagged.agg(
        F.count("*").cast("long").alias("n_small"),
        F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))


def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style promotion effect: share of one month's revenue from
    promo parts.  The part dimension broadcasts (only p_partkey/p_type
    read); the shipdate window sits in PushedFilters on the lineitem scan;
    both CASE branches aggregate in the same pass — one scan, one broadcast
    join, a single-row final agg."""
    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .where((F.col("l_shipdate") >= F.lit("1996-01-01"))
                 & (F.col("l_shipdate") < F.lit("1996-02-01")))
          .select("l_partkey", "l_extendedprice", "l_discount"))
    part = (spark.read.parquet(f"{sf_dir}/part.parquet")
            .select("p_partkey", "p_type"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .agg(F.round(F.lit(100.0) * F.sum(promo) / F.sum(rev), 6)
                  .alias("promo_revenue_pct"),
                 F.count("*").cast("long").alias("n_items")))


def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style returned-item reporting: top-20 customers by revenue
    lost to returns in one quarter.  Orders carry the quarter filter in
    PushedFilters; lineitem filters to returnflag='R' at the scan; customer
    and nation broadcast; the top-20 on ROUNDED revenue with a custkey
    tiebreak is deterministic across engines."""
    orders = (spark.read.parquet(f"{sf_dir}/orders.parquet")
              .where((F.col("o_orderdate") >= F.lit("1996-01-01"))
                     & (F.col("o_orderdate") < F.lit("1996-04-01")))
              .select("o_orderkey", "o_custkey"))
    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .where(F.col("l_returnflag") == "R")
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
            .agg(F.round(F.sum(rev), 4).alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("c_custkey"))
            .limit(20)
            .select("c_custkey", "c_name", "n_name",
                    F.round("c_acctbal", 2).alias("c_acctbal"), "revenue"))


def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 volume shipping: bilateral trade revenue between two
    nations by ship year.  The supplier and customer nation dimensions are
    tiny — both broadcast; the cross-pair predicate ((A,B) or (B,A)) is a
    join filter on broadcast rows, so the two fact joins stay equi-joins
    and the big lineitem side never shuffles for the nation logic."""
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name")
    pair = F.col("n_name").isin("NATION_0", "NATION_1")
    supp = (spark.read.parquet(f"{sf_dir}/supplier.parquet")
            .join(F.broadcast(nation.where(pair)),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    cust = (spark.read.parquet(f"{sf_dir}/customer.parquet")
            .join(F.broadcast(nation.where(pair)),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .select("c_custkey", F.col("n_name").alias("cust_nation")))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey")
    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .where((F.col("l_shipdate") >= F.lit("1996-01-01"))
                 & (F.col("l_shipdate") < F.lit("1998-01-01")))
          .select("l_orderkey", "l_suppkey", "l_shipdate",
                  "l_extendedprice", "l_discount"))
    return (li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .where(F.col("supp_nation") != F.col("cust_nation"))
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").alias("l_year"))
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 4)
                  .alias("revenue"),
                 F.count("*").cast("long").alias("n_items"))
            .orderBy("supp_nation", "cust_nation", "l_year"))


def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 national market share: for one region's customers and one
    part type, the share of yearly revenue supplied by one nation.

    Plan shape: region→nation→customer is a broadcast dimension chain, the
    filtered part slice broadcasts, and both CASE branches of the share
    aggregate in ONE pass (no self-join).  Numerator and denominator are
    rounded independently before the division so every engine derives the
    identical 6-dp share."""
    region = (spark.read.parquet(f"{sf_dir}/region.parquet")
              .where(F.col("r_name") == "EUROPE").select("r_regionkey"))
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cust_nations = (nation.join(F.broadcast(region),
                                F.col("n_regionkey") == F.col("r_regionkey"))
                    .select("n_nationkey"))
    cust = (spark.read.parquet(f"{sf_dir}/customer.parquet")
            .join(F.broadcast(cust_nations),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .select("c_custkey"))
    supp = (spark.read.parquet(f"{sf_dir}/supplier.parquet")
            .join(F.broadcast(nation.select("n_nationkey", "n_name")),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    part = (spark.read.parquet(f"{sf_dir}/part.parquet")
            .where(F.col("p_type") == "ECONOMY").select("p_partkey"))
    orders = (spark.read.parquet(f"{sf_dir}/orders.parquet")
              .where((F.col("o_orderdate") >= F.lit("1996-01-01"))
                     & (F.col("o_orderdate") < F.lit("1998-01-01")))
              .select("o_orderkey", "o_custkey", "o_orderdate"))
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
        "l_discount")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    tgt = F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(0.0)
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
            .groupBy(F.year("o_orderdate").alias("o_year"))
            .agg(F.round(F.sum(tgt), 4).alias("nation_volume"),
                 F.round(F.sum(vol), 4).alias("total_volume"))
            .select("o_year", "nation_volume", "total_volume",
                    F.round(F.col("nation_volume")
                            / F.col("total_volume"), 6).alias("mkt_share"))
            .orderBy("o_year"))


def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-adapted product-type profit (this schema has no partsupp,
    so profit is gross revenue l_extendedprice·(1−l_discount) rather than
    revenue minus supplycost·quantity): per supplier nation × order year
    over parts whose name contains one token.

    Plan shape: the part slice (name LIKE) and the supplier→nation chain
    broadcast; lineitem joins orders on the fact key only; one hash agg on
    (nation, year)."""
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name")
    supp = (spark.read.parquet(f"{sf_dir}/supplier.parquet")
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", F.col("n_name").alias("nation")))
    part = (spark.read.parquet(f"{sf_dir}/part.parquet")
            .where(F.col("p_name").contains("widget"))
            .select("p_partkey"))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderdate")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
        "l_discount")
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
            .groupBy("nation", F.year("o_orderdate").alias("o_year"))
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 4)
                  .alias("sum_profit"),
                 F.count("*").cast("long").alias("n_items"))
            .orderBy("nation", F.desc("o_year")))


def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-adapted shipping-delay analysis (no l_shipmode/commit/
    receipt dates in this schema): lineitems shipped in one year bucketed
    by order→ship delay, counting high- vs low-priority orders per bucket
    — Q12's CASE-sum shape over an adapted dimension.

    Plan shape: both CASE branches aggregate in one pass; the only
    shuffle is the 3-bucket hash agg; the order side projects two narrow
    columns and AQE broadcasts the filtered year slice when small."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderdate", "o_orderpriority")
    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .where((F.col("l_shipdate") >= F.lit("1997-01-01"))
                 & (F.col("l_shipdate") < F.lit("1998-01-01")))
          .select("l_orderkey", "l_shipdate"))
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (F.when(delay <= 30, "0-30d")
              .when(delay <= 90, "31-90d").otherwise("90d+"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy(bucket.alias("delay_bucket"))
            .agg(F.sum(F.when(high, 1).otherwise(0)).cast("long")
                  .alias("high_priority_count"),
                 F.sum(F.when(high, 0).otherwise(1)).cast("long")
                  .alias("low_priority_count"))
            .orderBy("delay_bucket"))


def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 customer order-count distribution: LEFT OUTER join
    customer→orders (with an order-side predicate, so customers with no
    qualifying orders count as 0), then the distribution of customers per
    order count.

    Plan shape: outer join on c_custkey (null-safe count via counting the
    join key, not *), two hash aggs — the second over the tiny count
    domain."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey")
    orders = (spark.read.parquet(f"{sf_dir}/orders.parquet")
              .where(F.col("o_orderstatus") != "P")
              .select("o_orderkey", "o_custkey"))
    per_cust = (cust.join(orders, cust.c_custkey == orders.o_custkey,
                          "left_outer")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").cast("long").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count("*").cast("long").alias("custdist"))
            .orderBy(F.desc("custdist"), F.desc("c_count")))


def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top supplier: per-supplier revenue over one quarter, then
    the supplier(s) achieving the maximum.  Revenue is rounded BEFORE the
    max comparison so the equality join is engine-deterministic.

    Plan shape: ONE lineitem scan — one hash agg on l_suppkey, then the
    global max as an unpartitioned window over the per-SUPPLIER aggregate
    (state-sized single-task hop, suppliers ≪ lineitem at any SF).  The
    broadcast-max-scalar alternative plans the max subquery independently
    and Spark does not reuse the revenue exchange across it, so the fact
    table is scanned and aggregated TWICE (verified on the executed plan:
    two distinct lineitem FileScans) — the same double-scan the Q11/Q20
    rework removed.  Supplier dim broadcasts for the name lookup."""
    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .where((F.col("l_shipdate") >= F.lit("1996-01-01"))
                 & (F.col("l_shipdate") < F.lit("1996-04-01")))
          .select("l_suppkey", "l_extendedprice", "l_discount"))
    rev = (li.groupBy("l_suppkey")
           .agg(F.round(F.sum(F.col("l_extendedprice")
                              * (1 - F.col("l_discount"))), 4)
                 .alias("total_revenue")))
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_name")
    return (rev.withColumn("max_revenue",
                           F.max("total_revenue").over(Window.partitionBy()))
            .where(F.col("total_revenue") == F.col("max_revenue"))
            .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
            .select("s_suppkey", "s_name", "total_revenue")
            .orderBy("s_suppkey"))


def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-adapted supplier diversity per part profile (no partsupp
    table — the observed lineitem (partkey, suppkey) pairs stand in for
    the part-supplier relation): distinct supplier count per
    (brand, type, size) for parts outside one brand/type, sizes in a
    fixed list.

    Plan shape: the part predicate prunes at the scan (isin → IN
    PushedFilter), the filtered part dim broadcasts into the fact join,
    and the distinct-aggregate runs as Spark's two-phase
    (partial-distinct, final) expand — no row explosion."""
    part = (spark.read.parquet(f"{sf_dir}/part.parquet")
            .where((F.col("p_brand") != "Brand#1")
                   & (F.col("p_type") != "PROMO")
                   & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 49))
            .select("p_partkey", "p_brand", "p_type", "p_size"))
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey")
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").cast("long")
                  .alias("supplier_cnt"))
            .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size"))


def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customers: orders whose total quantity
    exceeds a threshold, with customer context, top-100 by total price.
    Quantities are integral doubles so the sum and threshold compare are
    exact in both engines.

    Plan shape: the quantity filter runs on the ORDER-side aggregate
    before any dimension join (the classic Q18 semi-join reduction — only
    qualifying orderkeys reach the join), customer dim broadcasts, and
    the top-100 is TakeOrderedAndProject with a key tiebreak."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("sum_qty"))
           .where(F.col("sum_qty") > 200))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name")
    return (orders.join(big, orders.o_orderkey == big.l_orderkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .select("c_custkey", "c_name", "o_orderkey",
                    F.date_format("o_orderdate", "yyyy-MM-dd")
                     .alias("o_orderdate"),
                    F.round("o_totalprice", 2).alias("o_totalprice"),
                    "sum_qty")
            .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
            .limit(100))


def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 discounted revenue under a disjunction of brand/size/
    quantity envelopes — the predicate-pushdown stress case: each OR arm
    pairs part attributes with lineitem ranges.

    Plan shape: the part attributes needed by the disjunction ride a
    broadcast join; the combined OR filter evaluates post-join inside
    whole-stage codegen (one pass, no union-of-three-scans); the lineitem
    scan still prunes to the three needed columns."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_brand", "p_size")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    qty = F.col("l_quantity")
    arm1 = ((F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15) & qty.between(1, 11))
    arm2 = ((F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25) & qty.between(10, 20))
    arm3 = ((F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35) & qty.between(20, 30))
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .where(arm1 | arm2 | arm3)
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 4)
                  .alias("revenue"),
                 F.count("*").cast("long").alias("n_items")))


def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-adapted global sales opportunity (no c_phone — market
    segment stands in for the country-code prefix): customers in three
    segments with above-average positive account balance and NO orders
    after a cutoff, counted per segment.

    Plan shape: the scalar avg is a single-row broadcast (crossJoin), the
    "no recent orders" predicate is a LEFT ANTI join on the filtered
    order slice, one final tiny hash agg.  The avg threshold is rounded
    to 4 dp before the compare (balances have 2 dp, so the comparison is
    engine-exact)."""
    segs = ("AUTOMOBILE", "MACHINERY", "HOUSEHOLD")
    cust = (spark.read.parquet(f"{sf_dir}/customer.parquet")
            .where(F.col("c_mktsegment").isin(*segs))
            .select("c_custkey", "c_mktsegment", "c_acctbal"))
    thr = (cust.where(F.col("c_acctbal") > 0.0)
           .agg(F.round(F.avg("c_acctbal"), 4).alias("avg_bal")))
    orders = (spark.read.parquet(f"{sf_dir}/orders.parquet")
              .where(F.col("o_orderdate") >= F.lit("1999-01-01"))
              .select("o_custkey"))
    return (cust.crossJoin(F.broadcast(thr))
            .where(F.col("c_acctbal") > F.col("avg_bal"))
            .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
            .groupBy("c_mktsegment")
            .agg(F.count("*").cast("long").alias("numcust"),
                 F.round(F.sum("c_acctbal"), 2).alias("totacctbal"))
            .orderBy("c_mktsegment"))


def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-adapted minimum-cost supplier (this schema has no partsupp,
    so the part-supplier cost relation is DERIVED from lineitem: unit cost
    = min observed l_extendedprice / l_quantity per (part, supplier)): for
    STANDARD parts of size ≤ 10, the supplier(s) in EUROPE matching the
    part's global minimum unit cost — Q2's correlated-min subquery shape,
    decorrelated into an aggregate + equality join.

    Plan shape: ONE lineitem scan — the per-part min is a window over the
    (partkey, suppkey) aggregate keyed on partkey (a state-sized
    re-exchange, never a fact rescan; the naive decorrelation aggregates
    the fact table twice).  Part slice and the supplier→nation→region
    chain broadcast.  The min-cost equality compares raw doubles — both
    sides derive from the identical per-row division, and min is
    order-invariant, so the compare is engine-exact (no rounding before
    the predicate)."""
    cost = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .select("l_partkey", "l_suppkey",
                    (F.col("l_extendedprice") / F.col("l_quantity"))
                    .alias("uc"))
            .groupBy("l_partkey", "l_suppkey")
            .agg(F.min("uc").alias("unit_cost")))
    best = (cost.withColumn(
                "best_cost",
                F.min("unit_cost").over(Window.partitionBy("l_partkey")))
            .where(F.col("unit_cost") == F.col("best_cost")))
    part = (spark.read.parquet(f"{sf_dir}/part.parquet")
            .where((F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10))
            .select("p_partkey"))
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name", "n_regionkey")
    region = (spark.read.parquet(f"{sf_dir}/region.parquet")
              .where(F.col("r_name") == "EUROPE").select("r_regionkey"))
    supp = (spark.read.parquet(f"{sf_dir}/supplier.parquet")
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .join(F.broadcast(region),
                  F.col("n_regionkey") == F.col("r_regionkey"))
            .select("s_suppkey", "s_name", "s_acctbal",
                    F.col("n_name").alias("nation")))
    return (best
            .join(F.broadcast(part), best.l_partkey == part.p_partkey)
            .join(F.broadcast(supp), best.l_suppkey == supp.s_suppkey)
            .select(F.round("s_acctbal", 2).alias("s_acctbal"), "s_name",
                    "nation", "p_partkey",
                    F.round("unit_cost", 4).alias("unit_cost"))
            .orderBy(F.desc("s_acctbal"), "nation", "s_name", "p_partkey"))


def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-adapted important-stock identification (no partsupp: a
    part's held value is the gross lineitem revenue routed through ASIA
    suppliers): parts whose value exceeds 0.1% of the slice total —
    Q11's HAVING-vs-scalar-subquery shape.

    Plan shape: ONE lineitem scan — one hash agg on partkey over the
    supplier-slice semi-join (supplier side broadcasts); the scalar total
    is an unpartitioned window over the per-part AGGREGATE (#parts rows
    gather on one task to attach the total — state-sized, never the fact
    table; the crossJoin decorrelation would aggregate the fact table
    twice).  Both compare operands are rounded to 4 dp first so the
    threshold predicate is engine-exact (sums of ~10³ doubles carry
    ~1e-8 association noise, far below the 5e-5 rounding boundary)."""
    nation = (spark.read.parquet(f"{sf_dir}/nation.parquet")
              .where(F.col("n_regionkey") == 2).select("n_nationkey"))
    supp = (spark.read.parquet(f"{sf_dir}/supplier.parquet")
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey"))
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    val = (li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
           .groupBy("l_partkey")
           .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .alias("raw_value")))
    return (val.withColumn(
                "thr",
                F.round(F.sum("raw_value").over(
                    Window.partitionBy()) * 0.001, 4))
            .where(F.round(F.col("raw_value"), 4) > F.col("thr"))
            .select(F.col("l_partkey").alias("part_key"),
                    F.round("raw_value", 4).alias("value"))
            .orderBy(F.desc("value"), "part_key"))


def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-adapted potential-promotion suppliers (no partsupp availqty:
    the "holds excess stock" predicate becomes "shipped the majority"):
    ASIA suppliers who in 1998 shipped MORE THAN HALF of some small-named
    part's total 1998 quantity — Q20's nested-IN chain expressed as
    aggregate → threshold join → semi-join.

    Plan shape: ONE lineitem scan — the part-name slice broadcasts into
    it (year predicate pushed down); the per-part total is a window over
    the (partkey, suppkey) aggregate keyed on partkey (state-sized
    re-exchange, not a fact rescan); the final supplier lookup is a
    broadcast semi-join.  l_quantity is integral in this corpus so the
    double sums and the 0.5× compare are exact."""
    part = (spark.read.parquet(f"{sf_dir}/part.parquet")
            .where(F.col("p_name").startswith("small "))
            .select("p_partkey"))
    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .where((F.col("l_shipdate") >= F.lit("1998-01-01"))
                 & (F.col("l_shipdate") < F.lit("1999-01-01")))
          .select("l_partkey", "l_suppkey", "l_quantity"))
    shipped = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
               .groupBy("l_partkey", "l_suppkey")
               .agg(F.sum("l_quantity").alias("qty")))
    cand = (shipped.withColumn(
                "tot_qty",
                F.sum("qty").over(Window.partitionBy("l_partkey")))
            .where(F.col("qty") > 0.5 * F.col("tot_qty"))
            .select("l_suppkey").distinct())
    nation = (spark.read.parquet(f"{sf_dir}/nation.parquet")
              .where(F.col("n_regionkey") == 2).select("n_nationkey"))
    return (spark.read.parquet(f"{sf_dir}/supplier.parquet")
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .join(cand, F.col("s_suppkey") == cand.l_suppkey, "left_semi")
            .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
            .orderBy("s_name"))


def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-adapted suppliers-who-kept-orders-waiting (no commit/
    receipt dates: "late" becomes "was the UNIQUE last shipper of a
    multi-supplier finished order"): per supplier, the count of completed
    ('F') orders with ≥ 2 suppliers where that supplier's latest shipment
    IS the order's latest shipment and nobody ties — Q21's
    EXISTS / NOT-EXISTS pair as window predicates.

    Plan shape: ONE lineitem scan — the order-status slice broadcasts;
    the per-order max / supplier count / tie count are all windows over
    the (order, supplier) AGGREGATE sharing one orderkey sort (no
    per_os ⋈ per_o self-join, which would rescan and sort-merge); the
    final per-supplier count is a tiny agg with a broadcast name lookup.
    Timestamp max/equality is exact; ties are handled by the
    n_at_max = 1 predicate, not float tolerance."""
    fo = (spark.read.parquet(f"{sf_dir}/orders.parquet")
          .where(F.col("o_orderstatus") == "F").select("o_orderkey"))
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    w = Window.partitionBy("l_orderkey")
    per_os = (li.join(F.broadcast(fo), li.l_orderkey == fo.o_orderkey)
              .groupBy("l_orderkey", "l_suppkey")
              .agg(F.max("l_shipdate").alias("s_max"))
              .withColumn("o_max", F.max("s_max").over(w))
              .withColumn("n_supp", F.count("*").over(w)))
    waiters = (per_os.where(F.col("s_max") == F.col("o_max"))
               .withColumn("n_at_max", F.count("*").over(w))
               .where((F.col("n_supp") >= 2) & (F.col("n_at_max") == 1)))
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_name")
    return (waiters.join(F.broadcast(supp),
                         waiters.l_suppkey == supp.s_suppkey)
            .groupBy("s_name")
            .agg(F.count("*").cast("long").alias("numwait"))
            .orderBy(F.desc("numwait"), "s_name"))

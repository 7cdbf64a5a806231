"""Relational analytics over the star schema (SURVEY.md §2 F-group).

These make the engine a complete analytics surface around the vector/RBAC
core: classic warehouse shapes expressed declaratively so Catalyst applies
pushdown/pruning/broadcast automatically. Every function takes loaded
DataFrames and returns a DataFrame with stable, oracle-matched column names.

Scale notes per query are in docstrings; the common rules: dims
(region/nation/customer/supplier/part) are broadcast, facts
(lineitem/orders/events) shuffle only on their agg/join keys, aggregations
are map-side-combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-01") -> DataFrame:
    """TPC-H q1 shape: one shuffle on (returnflag, linestatus) with full
    map-side partial aggregation; scan prunes to 7 columns."""
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit(cutoff))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def shipping_priority(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                      segment: str = "BUILDING", cutoff: str = "1995-03-15") -> DataFrame:
    """TPC-H q3 shape: customer (dim) broadcasts into orders, the orders→
    lineitem join shuffles on orderkey; top-10 via window after agg."""
    j = (
        F.broadcast(customer.where(F.col("c_mktsegment") == segment).select("c_custkey"))
        .join(orders.where(F.col("o_orderdate") < F.lit(cutoff)), F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem.where(F.col("l_shipdate") > F.lit(cutoff)), F.col("o_orderkey") == F.col("l_orderkey"))
    )
    agg = (
        j.groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )
    return (
        agg.orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "revenue", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"), "o_orderpriority")
    )


def nation_volume(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                  supplier: DataFrame, nation: DataFrame, region: DataFrame,
                  region_name: str = "ASIA", exact_cents: bool = False) -> DataFrame:
    """TPC-H q5 shape (region-local supplier volume). All dims broadcast;
    the only large shuffles are fact-fact on orderkey. ``exact_cents``
    emits (n_name, n_items, revenue_cents) for the hash-gated union."""
    j = (
        lineitem.join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.where(F.col("r_name") == region_name).select("r_regionkey")), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    if exact_cents:
        return j.groupBy("n_name").agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum(F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0).cast("long")).alias("revenue_cents"),
        )
    return (
        j.groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


def top_parts_per_brand(part: DataFrame, lineitem: DataFrame, k: int = 3) -> DataFrame:
    """Top-n per group: revenue rank of parts within brand (window after a
    keyed agg — the window input is dim-sized, not the fact table)."""
    rev = (
        lineitem.groupBy("l_partkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .join(F.broadcast(part.select("p_partkey", "p_brand", "p_name")), F.col("l_partkey") == F.col("p_partkey"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.col("revenue").desc(), F.col("p_partkey").asc())
    return (
        rev.withColumn("brand_rank", F.row_number().over(w))
        .where(F.col("brand_rank") <= k)
        .select("p_brand", "p_partkey", "p_name", "revenue", "brand_rank")
    )


def sessionize_events(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization: a new session starts when the gap to the previous
    event of the same user exceeds ``gap_minutes``. lag + running sum —
    one shuffle on user_id; the cumulative window is per-user ordered.
    Output: per-session (user_id, session_id, n_events, started, ended)."""
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = events.withColumn(
        "new_session",
        F.when(
            (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w_user))) > gap_minutes * 60,
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "session_seq",
        F.sum("new_session").over(w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        marked.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("started"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("ended"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .withColumnRenamed("session_seq", "session_id")
    )


def hourly_event_stats(events: DataFrame) -> DataFrame:
    """Time-bucketed agg: date_trunc('hour') keyed shuffle, map-side combine."""
    return (
        events.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 6).alias("total_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .orderBy("hour", "event_type")
    )


def distinct_users_per_type(events: DataFrame, approx: bool = False) -> DataFrame:
    """Exact distinct (oracle-checked) or HLL sketch (approx_count_distinct,
    the 100 TB path — mergeable, no exact-distinct double shuffle)."""
    agg = (
        F.approx_count_distinct("user_id").alias("n_users")
        if approx
        else F.countDistinct("user_id").alias("n_users")
    )
    return events.groupBy("event_type").agg(agg).orderBy("event_type")


def revenue_rollup(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                   nation: DataFrame, region: DataFrame) -> DataFrame:
    """ROLLUP(region, nation) revenue: hierarchical subtotals in ONE pass —
    Spark expands grouping sets map-side, so the shuffle still carries one
    partial aggregate per (grouping set × key), not one job per level."""
    j = (
        lineitem.select("l_orderkey", "l_extendedprice", "l_discount")
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.select("r_regionkey", "r_name")), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        j.rollup("r_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "revenue",
            "n_items",
        )
    )


def customer_running_totals(orders: DataFrame, limit_custkey: int = 200) -> DataFrame:
    """Per-customer order-history window suite (F9 cumulative + F34
    ranking/navigation): running total, sequence number, quartile bucket
    (ntile), percent_rank by spend, days since the previous order (lag),
    and a centered 3-order moving average. ALL functions share ONE window
    partitioning (custkey) with two orderings — Spark evaluates them in a
    single shuffle + two sorts per partition; adding window functions to
    an existing spec is free at scale, which is the point of the suite."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_spend = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return (
        orders.where(F.col("o_custkey") <= limit_custkey)
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.col("o_totalprice"),
        )
        .withColumn("order_seq", F.row_number().over(w))
        .withColumn(
            "running_total",
            F.round(F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2),
        )
        .withColumn("spend_quartile", F.ntile(4).over(w_spend).cast("long"))
        .withColumn("spend_pct_rank", F.round(F.percent_rank().over(w_spend), 6))
        .withColumn(
            "days_since_prev",
            F.coalesce(
                F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)), F.lit(-1)
            ).cast("long"),
        )
        # exact milli-cent average via INTEGER division: a float mean lands
        # on half-cent boundaries where Spark (shortest-decimal round) and
        # DuckDB (binary-double round) disagree; sum_cents·1000 div n is
        # the same bigint everywhere
        .withColumn(
            "moving_avg_milli",
            F.expr(
                "sum(cast(round(o_totalprice * 100) as bigint) * 1000) over "
                "(partition by o_custkey order by o_orderdate, o_orderkey "
                "rows between 1 preceding and 1 following) div "
                "count(1) over (partition by o_custkey order by o_orderdate, o_orderkey "
                "rows between 1 preceding and 1 following)"
            ),
        )
        .withColumn("o_totalprice", F.round("o_totalprice", 2))
    )


def order_priority_returns(orders: DataFrame, lineitem: DataFrame,
                           date_lo: str = "1996-01-01", date_hi: str = "1997-01-01") -> DataFrame:
    """TPC-H q4 shape (EXISTS → left-semi): orders in a date window having at
    least one returned lineitem, counted by priority. The semi join keeps the
    orders stream narrow — the probe side is reduced to a distinct key set,
    never widening the row."""
    o = orders.where(
        (F.col("o_orderdate") >= F.lit(date_lo)) & (F.col("o_orderdate") < F.lit(date_hi))
    )
    flagged = lineitem.where(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        o.join(flagged, o["o_orderkey"] == flagged["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
    )


def brands_without_returns(part: DataFrame, lineitem: DataFrame,
                           min_qty: float = 45.0) -> DataFrame:
    """TPC-H q16-style NOT IN (→ left-anti): parts never part of a large
    returned shipment, aggregated per brand. Anti join beats a NOT IN
    subquery at scale: no null-semantics hazard, and the excluded-key set
    shuffles as a deduplicated key column only."""
    returned = lineitem.where(
        (F.col("l_returnflag") == "R") & (F.col("l_quantity") > min_qty)
    ).select("l_partkey")
    return (
        part.join(returned, part["p_partkey"] == returned["l_partkey"], "left_anti")
        .groupBy("p_brand")
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            # sum exact integer cents, divide once: the average is then
            # independent of partial-aggregation order (float sums aren't)
            F.round(
                F.sum(F.round(F.col("p_retailprice") * 100, 0).cast("long"))
                / (F.count("*") * F.lit(100.0)),
                2,
            ).alias("avg_price"),
        )
    )


def events_json_stats(events: DataFrame) -> DataFrame:
    """Semi-structured processing (F14): extract a typed field from the JSON
    ``props`` column and aggregate it per event type. ``get_json_object``
    evaluates JVM-side inside codegen — the JSON never reaches Python, and
    column pruning still drops every other column at the scan."""
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def daily_type_pivot(events: DataFrame) -> DataFrame:
    """Pivot (F15): one row per day, one count column per event type.
    ``groupBy().pivot(values=...)`` with explicit values keeps the plan a
    single-pass pivot aggregate (no extra job to discover the columns) —
    map-side combined like any keyed agg."""
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        events.groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"))
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
        .select("day", *[F.col(t).cast("long").alias(f"n_{t}") for t in types])
    )


def time_rollup(events: DataFrame) -> DataFrame:
    """Hypertable-style continuous aggregate (F18): one pass produces the
    hour-level rollup, its day-level parent, and the grand total via
    ROLLUP(day, hour) grouping sets — the batch equivalent of a
    TimescaleDB continuous aggregate hierarchy. Value sums are exact
    integer millis so parents equal the sum of their children bit-for-bit
    regardless of aggregation order."""
    day = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    hour = F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00")
    return (
        events.select(day.alias("day"), hour.alias("hour"), "value")
        .rollup("day", "hour")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 1000, 0).cast("long")).alias("value_milli"),
        )
    )


def funnel_steps(events: DataFrame, steps: tuple[str, ...] = ("view", "click", "purchase")) -> DataFrame:
    """Ordered conversion funnel (F19): a user reaches step i when they have
    an event of type ``steps[i]`` at-or-after their earliest qualifying time
    for step i-1 (step 0 qualifies at the user's first such event). Returns
    one row per step: (step_idx, step, n_users).

    Scale: one shuffle per step, all on ``user_id`` — AQE reuses the
    exchange across the cascade, and each stage's state is one (user_id,
    min_ts) row per surviving user (monotonically shrinking). The number of
    steps is a small constant; no window over the full event stream, no
    per-user event collection. Mirrors the reference's multi-step query
    composition style (basic_benchmark/common_function.py query loops).
    """
    out = None
    prev: DataFrame | None = None
    for i, step in enumerate(steps):
        ev = events.where(F.col("event_type") == step).select("user_id", "ts")
        if prev is None:
            cur = ev.groupBy("user_id").agg(F.min("ts").alias("t"))
        else:
            cur = (
                ev.join(prev, "user_id")
                .where(F.col("ts") >= F.col("t"))
                .select("user_id", "ts")
                .groupBy("user_id")
                .agg(F.min("ts").alias("t"))
            )
        prev = cur
        row = cur.agg(F.count("*").cast("long").alias("n_users")).select(
            F.lit(i).cast("long").alias("step_idx"),
            F.lit(step).alias("step"),
            "n_users",
        )
        out = row if out is None else out.unionByName(row)
    return out


def scd2_order_priority(orders: DataFrame) -> DataFrame:
    """Slowly-changing-dimension type-2 build (F20): track each customer's
    ``o_orderpriority`` attribute over time. Consecutive orders with the
    same priority are compacted; each surviving change opens a version with
    [valid_from, valid_to) bounds (valid_to = next change's date, NULL while
    current) and an ``is_current`` flag — the MERGE/SCD2 pattern a lakehouse
    dimension pipeline runs on every load.

    Scale: two windows over the same (o_custkey × date, orderkey) ordering —
    one shuffle on o_custkey, both windows ride the same sort. Change rows
    are a tiny fraction of input, so the second window's state is small.
    """
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    changes = (
        orders.select("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")
        .withColumn("prev_val", F.lag("o_orderpriority").over(w))
        .where(F.col("prev_val").isNull() | (F.col("prev_val") != F.col("o_orderpriority")))
    )
    w2 = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        changes.withColumn("version", F.row_number().over(w2).cast("long"))
        .withColumn("valid_to_ts", F.lead("o_orderdate").over(w2))
        .select(
            "o_custkey",
            "version",
            "o_orderpriority",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("valid_from"),
            F.date_format("valid_to_ts", "yyyy-MM-dd").alias("valid_to"),
            F.col("valid_to_ts").isNull().alias("is_current"),
        )
    )


def cohort_retention(events: DataFrame) -> DataFrame:
    """Cohort retention matrix (F21): users are cohorted by the DAY of
    their first event; for each (cohort_day, day_offset) count how many of
    the cohort's users were active offset days later — the standard
    product-analytics retention triangle (day grain; month grain is the
    same plan with a different trunc).

    Scale: one shuffle on user_id for the cohort assignment, one
    distinct-activity aggregate on (user_id, day) that reuses the same key
    prefix, then a days²-sized final aggregate. No windows over the raw
    stream; the date arithmetic is pure codegen.
    """
    cohorts = events.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_d"))
    activity = events.select("user_id", F.to_date("ts").alias("active_d")).distinct()
    return (
        activity.join(cohorts, "user_id")
        .select(
            F.date_format("cohort_d", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("active_d", "cohort_d").cast("long").alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").cast("long").alias("n_users"))
    )


def small_quantity_revenue(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H q17 shape (F22): per-brand yearly revenue from lineitems whose
    quantity is below 20% of that part's average quantity — the classic
    correlated scalar subquery, decorrelated into a per-part aggregate
    joined back to the fact table (what Catalyst's RewriteCorrelatedScalarSubquery
    does; written decorrelated so the plan is explicit).

    Scale: two passes over lineitem — a (partkey → avg qty) aggregate
    (map-side combinable, part-sized result) and the filtered fact scan
    joined against it; the part dim is broadcast. Revenue uses exact cents
    so the division is order-independent.
    """
    avg_qty = lineitem.groupBy("l_partkey").agg(
        (F.sum("l_quantity") / F.count("*")).alias("avg_qty")
    )
    return (
        lineitem.join(avg_qty, "l_partkey")
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .join(F.broadcast(part.select(F.col("p_partkey").alias("l_partkey"), "p_brand")), "l_partkey")
        .groupBy("p_brand")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.round(
                F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")) / F.lit(700.0), 2
            ).alias("avg_yearly"),
        )
    )


def _cents(col) -> F.Column:
    """Exact integer cents for an order-independent money sum."""
    return F.round(col * 100, 0).cast("long")


def volume_shipping(supplier: DataFrame, lineitem: DataFrame, orders: DataFrame,
                    customer: DataFrame, nation: DataFrame,
                    nation_a: str = "NATION_1", nation_b: str = "NATION_2",
                    y0: int = 1996, y1: int = 1997) -> DataFrame:
    """TPC-H q7 shape (F27): revenue shipped between two nations in both
    directions, per (supp_nation, cust_nation, ship year).

    Scale: the only fact-fact shuffle is lineitem⋈orders on orderkey;
    supplier/customer/nation broadcast, and the two-nation filter is
    applied to the broadcast sides BEFORE the join so the fact scan's
    join fan-in is already pruned. Revenue in exact cents.
    """
    n1 = nation.where(F.col("n_name").isin(nation_a, nation_b))
    supp = supplier.join(F.broadcast(n1.select(F.col("n_nationkey").alias("s_nationkey"),
                                               F.col("n_name").alias("supp_nation"))), "s_nationkey")
    cust = customer.join(F.broadcast(n1.select(F.col("n_nationkey").alias("c_nationkey"),
                                               F.col("n_name").alias("cust_nation"))), "c_nationkey")
    j = (
        lineitem.where(
            (F.year("l_shipdate") >= y0) & (F.year("l_shipdate") <= y1)
        )
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp.select("s_suppkey", "supp_nation")), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust.select("c_custkey", "cust_nation")), F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        j.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue_cents"),
        )
    )


def top_supplier(supplier: DataFrame, lineitem: DataFrame,
                 start: str = "1996-01-01", end: str = "1996-04-01") -> DataFrame:
    """TPC-H q15 shape (F28): the supplier(s) with maximum revenue in a
    window — max-over-aggregate without a global sort.

    Scale: one map-side-combinable aggregate collapses the fact table to
    supplier cardinality; the max is an aggregate of THAT (tiny) result
    broadcast back — never an order-by over the facts. Exact cents make
    the max well-defined cross-engine.
    """
    rev = (
        lineitem.where((F.col("l_shipdate") >= F.lit(start)) & (F.col("l_shipdate") < F.lit(end)))
        .groupBy("l_suppkey")
        .agg(F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue_cents"))
    )
    best = rev.agg(F.max("revenue_cents").alias("best"))
    return (
        rev.join(F.broadcast(best), F.col("revenue_cents") == F.col("best"))
        .join(F.broadcast(supplier.select(F.col("s_suppkey").alias("l_suppkey"), "s_name")), "l_suppkey")
        .select(F.col("l_suppkey").cast("long").alias("s_suppkey"), "s_name", "revenue_cents")
    )


def large_orders(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                 qty_milli: int = 300_000) -> DataFrame:
    """TPC-H q18 shape (F29): orders whose total quantity exceeds a
    threshold, with their customer — HAVING over a keyed aggregate,
    semi-joined back to the order/customer row.

    Scale: the quantity aggregate is map-side combinable on orderkey (the
    fact's natural key, so AQE can even skip the shuffle when lineitem is
    bucketed by orderkey); only qualifying orderkeys (a tiny set) join
    orders, and customer broadcasts. Quantities in exact millis.
    """
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.round(F.col("l_quantity") * 1000, 0).cast("long")).alias("qty_milli"))
        .where(F.col("qty_milli") > qty_milli)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(customer.select("c_custkey", "c_name")), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", F.col("c_custkey").cast("long").alias("c_custkey"),
            F.col("o_orderkey").cast("long").alias("o_orderkey"), "qty_milli",
        )
    )


def disjunctive_revenue(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H q19 shape (F30): revenue under three OR'd (brand, size,
    quantity) predicate branches — the classic disjunctive-pushdown test.

    Scale: the part dim broadcasts with only (partkey, brand, size); the
    OR predicate evaluates inside codegen after the broadcast hash join,
    and lineitem's scan is pruned to 4 columns. One aggregate row out.
    """
    p = F.broadcast(part.select("p_partkey", "p_brand", "p_size"))
    j = lineitem.join(p, F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 30))
    )
    return j.where(cond).agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue_cents"),
    )


def idle_customers(customer: DataFrame, orders: DataFrame, cutoff: str = "2000-01-01") -> DataFrame:
    """TPC-H q22 shape (F31): per-nation count and balance of customers
    whose account balance is above the mean positive balance and who have
    placed no orders since ``cutoff``.

    The above-average comparison is exact cross-engine: instead of
    comparing against a floating AVG (whose summation order differs
    between engines), compare cents·count > total_cents by integer
    cross-multiplication. The anti-join is a broadcast of the DISTINCT
    recent-customer keys when small, else a shuffled left-anti.
    """
    bal = customer.select("c_custkey", "c_nationkey", _cents(F.col("c_acctbal")).alias("bal_cents"))
    pos = bal.where(F.col("bal_cents") > 0).agg(
        F.sum("bal_cents").alias("total_cents"), F.count("*").alias("n_pos")
    )
    recent = orders.where(F.col("o_orderdate") >= F.lit(cutoff)).select("o_custkey").distinct()
    return (
        bal.crossJoin(F.broadcast(pos))
        .where(F.col("bal_cents") * F.col("n_pos") > F.col("total_cents"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").cast("long").alias("c_nationkey"))
        .agg(
            F.count("*").cast("long").alias("n_custs"),
            F.sum("bal_cents").alias("bal_cents"),
        )
    )


def market_share(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                 supplier: DataFrame, part: DataFrame, nation: DataFrame,
                 region: DataFrame, r_name: str = "ASIA", p_type: str = "PROMO",
                 target_nation: str = "NATION_1") -> DataFrame:
    """TPC-H q8 shape (F32): national market share — for orders of a part
    type sold into a region, the per-year fraction of revenue supplied by
    one nation. Emitted as exact integer (numerator, denominator) rows
    rather than a floating ratio so the hash gate is arithmetic-order-proof:
    per year one 'nation' row (items/revenue from ``target_nation``) and
    one 'total' row (all items/revenue).

    Scale: one pass over the fact join computes numerator and denominator
    together (conditional aggregation — no second scan, no self-join).
    All four dims broadcast pre-filtered, so the fact fan-in is pruned
    before the only fact-fact shuffle (lineitem⋈orders on orderkey).
    """
    cust_in_region = customer.join(
        F.broadcast(
            nation.join(F.broadcast(region.where(F.col("r_name") == r_name)),
                        F.col("n_regionkey") == F.col("r_regionkey"))
            .select(F.col("n_nationkey").alias("c_nationkey"))
        ),
        "c_nationkey",
    ).select("c_custkey")
    supp = supplier.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("s_nationkey"),
                                  F.col("n_name").alias("supp_nation"))),
        "s_nationkey",
    ).select("s_suppkey", "supp_nation")
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    is_target = (F.col("supp_nation") == target_nation).cast("long")
    per_year = (
        lineitem
        .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_in_region), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(part.where(F.col("p_type") == p_type).select("p_partkey")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.count("*").cast("long").alias("n_total"),
            F.sum(rev).alias("rev_total"),
            F.sum(is_target).alias("n_nation"),
            F.sum(rev * is_target).alias("rev_nation"),
        )
    )
    return per_year.select(
        "o_year",
        F.expr("stack(2, 'nation', n_nation, rev_nation, 'total', n_total, rev_total)")
        .alias("side", "n_items", "revenue_cents"),
    ).select("o_year", "side", F.col("n_items").cast("long").alias("n_items"), "revenue_cents")


def waiting_suppliers(supplier: DataFrame, orders: DataFrame, lineitem: DataFrame,
                      nationkey: int = 9, late_days: int = 150) -> DataFrame:
    """TPC-H q21 shape (F33): suppliers (from one nation) who were the
    ONLY late supplier on a finished multi-supplier order — the classic
    EXISTS + NOT-EXISTS double self-join on the fact table. The testdata
    lineitem has no commit/receipt dates, so "late" is
    ``l_shipdate > o_orderdate + late_days`` (shape-preserving).

    Spark-first decorrelation: instead of two correlated self-joins
    (reference q21 formulation, which Catalyst would also rewrite), one
    keyed aggregate computes per order (distinct suppliers, distinct LATE
    suppliers); EXISTS(other supplier) ⇔ n_supp > 1 and NOT EXISTS(other
    late supplier) ⇔ n_late_supp = 1 given the probe row is late. One
    fact shuffle on orderkey shared by the join and the aggregate; the
    qualifying-order set and the one-nation supplier dim broadcast back.
    The DuckDB oracle runs the textbook correlated EXISTS/NOT-EXISTS
    form, so a hash match proves the decorrelation is semantics-exact.
    """
    finished = orders.where(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate")
    lf = (
        lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(finished, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("is_late", F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), late_days))
    )
    per_order = lf.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("n_late_supp"),
    )
    qual = (
        per_order.where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .select(F.col("l_orderkey").alias("q_orderkey"))
    )
    return (
        lf.where(F.col("is_late"))
        .join(F.broadcast(qual), F.col("l_orderkey") == F.col("q_orderkey"))
        .groupBy("l_suppkey")
        .agg(F.count("*").cast("long").alias("numwait"))
        .join(
            F.broadcast(supplier.where(F.col("s_nationkey") == nationkey)
                        .select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("s_name", F.col("s_suppkey").cast("long").alias("s_suppkey"), "numwait")
    )


def revenue_forecast(lineitem: DataFrame, y: int = 1996,
                     d_lo: float = 0.02, d_hi: float = 0.04, qty_max: int = 24) -> DataFrame:
    """TPC-H q6 shape (F37): the canonical predicate-pushdown scan-aggregate
    — one year of shipments in a discount band below a quantity cap,
    revenue = Σ extendedprice·discount in exact cents.

    Scale: zero joins, zero wide shuffles — every predicate reaches the
    parquet reader (PushedFilters), the aggregate is one map-side-combined
    row. The query exists to prove the scan path is clean.
    """
    return (
        lineitem.where(
            (F.year("l_shipdate") == y)
            & (F.col("l_discount") >= d_lo) & (F.col("l_discount") <= d_hi)
            & (F.col("l_quantity") < qty_max)
        )
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum(_cents(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue_cents"),
        )
    )


def product_profit(lineitem: DataFrame, supplier: DataFrame, part: DataFrame,
                   orders: DataFrame, nation: DataFrame, name_kw: str = "red") -> DataFrame:
    """TPC-H q9 shape (F38): product-line profit per (supplier nation, order
    year). ADAPTED to this schema: no partsupp table, so supply cost :=
    p_retailprice (the part dim's price column) — amount_cents =
    cents(extendedprice·(1−discount)) − cents(retailprice)·quantity. The
    SHAPE is intact: fact × 2 dims × fact-fact orderkey join × nation
    rollup with a LIKE filter on part names.

    Scale: part/supplier/nation broadcast with the name filter applied
    before the join; the only fact-fact shuffle is lineitem⋈orders.
    """
    p = part.where(F.col("p_name").contains(name_kw)).select(
        "p_partkey", _cents(F.col("p_retailprice")).alias("cost_cents")
    )
    s = supplier.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("s_nationkey"), "n_name")),
        "s_nationkey",
    ).select("s_suppkey", "n_name")
    amount = (
        _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        - F.col("cost_cents") * F.col("l_quantity").cast("long")
    )
    return (
        lineitem.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum(amount).alias("profit_cents"),
        )
    )


def returned_item_revenue(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                          nation: DataFrame, start: str = "1996-01-01",
                          end: str = "1996-04-01", k: int = 20) -> DataFrame:
    """TPC-H q10 shape (F39): top-k customers by lost revenue from returned
    items in one quarter. Exact cents; the top-k rank orders by
    (revenue_cents DESC, c_custkey) so the cut is total cross-engine.

    Scale: the rank runs over POST-AGGREGATE rows (customer cardinality,
    not facts) — the same aggregate-then-rank shape as q15, never an
    order-by over the fact table.
    """
    j = (
        lineitem.where(F.col("l_returnflag") == "R")
        .join(
            orders.where((F.col("o_orderdate") >= F.lit(start)) & (F.col("o_orderdate") < F.lit(end)))
            .select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue_cents"),
        )
    )
    w = Window.orderBy(F.col("revenue_cents").desc(), F.col("o_custkey"))
    return (
        j.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .join(F.broadcast(customer.select(F.col("c_custkey").alias("o_custkey"), "c_name", "c_nationkey")), "o_custkey")
        .join(F.broadcast(nation.select(F.col("n_nationkey").alias("c_nationkey"), "n_name")), "c_nationkey")
        .select(
            F.col("o_custkey").cast("long").alias("c_custkey"), "c_name", "n_name",
            "n_items", "revenue_cents", F.col("rank").cast("long").alias("rank"),
        )
    )


def customer_distribution(customer: DataFrame, orders: DataFrame,
                          excl_priority: str = "1-URGENT") -> DataFrame:
    """TPC-H q13 shape (F40): the customer order-count distribution INCLUDING
    zero-order customers — the left-join-then-double-aggregate pattern
    (histogram of per-customer counts).

    Scale: customer⋈orders shuffles on custkey once; the second aggregate
    runs over customer-cardinality rows. The left join is what preserves
    the zero bucket an inner join would silently drop.
    """
    o = orders.where(F.col("o_orderpriority") != excl_priority).select("o_custkey", "o_orderkey")
    per_cust = (
        customer.select("c_custkey")
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").cast("long").alias("custdist"))


def promo_revenue_share(part: DataFrame, lineitem: DataFrame, y: int = 1996, m: int = 3) -> DataFrame:
    """TPC-H q14 shape (F41): promo revenue share for one month, emitted as
    the exact integer (numerator, denominator) cents pair — no floating
    ratio to drift cross-engine (the q8 convention).

    Scale: one conditional aggregation over the month's fact slice with
    the part type broadcast — no second scan for the denominator.
    """
    li = lineitem.where((F.year("l_shipdate") == y) & (F.month("l_shipdate") == m))
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(F.broadcast(part.select("p_partkey", "p_type")), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("long"))).alias("promo_cents"),
            F.sum(rev).alias("total_cents"),
        )
    )


def min_cost_supplier(part: DataFrame, supplier: DataFrame, lineitem: DataFrame,
                      nation: DataFrame, region: DataFrame, size: int = 3,
                      type_eq: str = "SMALL", region_name: str = "ASIA") -> DataFrame:
    """TPC-H q2 shape (F42): for each qualifying part, the region's suppliers
    achieving the MINIMUM supply cost — the correlated-min subquery over a
    multi-dim join. ADAPTED to this schema: no partsupp, so the observed
    unit cost of (supplier, part) := min over their lineitems of
    round(extendedprice/quantity·1000) in exact milli-units.

    Scale: the correlated min decorrelates into a per-part aggregate of
    the (supp, part) cost table joined back on equality — two aggregates
    and broadcast dims, never a per-part subquery loop.
    """
    r = region.where(F.col("r_name") == region_name).select("r_regionkey")
    n = nation.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")).select(
        "n_nationkey", "n_name"
    )
    s = supplier.join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "n_name", _cents(F.col("s_acctbal")).alias("bal_cents"))
    p = part.where((F.col("p_size") == size) & (F.col("p_type") == type_eq)).select("p_partkey", "p_brand")
    unit_milli = F.round(F.col("l_extendedprice") / F.col("l_quantity") * 1000, 0).cast("long")
    sp_cost = (
        lineitem.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s.select("s_suppkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "l_suppkey")
        .agg(F.min(unit_milli).alias("cost_milli"))
    )
    best = sp_cost.groupBy("p_partkey").agg(F.min("cost_milli").alias("best_milli"))
    return (
        sp_cost.join(F.broadcast(best), "p_partkey")
        .where(F.col("cost_milli") == F.col("best_milli"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(p), "p_partkey")
        .select(
            F.col("p_partkey").cast("long").alias("p_partkey"), "p_brand",
            F.col("s_suppkey").cast("long").alias("s_suppkey"), "s_name", "n_name",
            "bal_cents", "cost_milli",
        )
    )


def time_gapfill(events: DataFrame) -> DataFrame:
    """F43: hypertable gap-filling — the Timescale ``time_bucket_gapfill``
    + ``locf()`` + ``interpolate()`` triple on plain DataFrames. Per
    event_type, hourly value sums in exact millis over a DENSE per-type
    hour spine (missing hours materialized by a sequence explode between
    the type's first and last hour), with three fill policies emitted
    side-by-side:

    - ``n``            = 0 for gap rows (count fill);
    - ``locf_milli``   = last observed value carried forward (−1 before
                         the first observation);
    - ``interp_milli`` = linear interpolation between the neighboring
                         observations, computed entirely in BIGINT —
                         prev + floor((next−prev)·pos / len) with an
                         explicit positive-mod floor division, because
                         Spark's DIV truncates toward zero while
                         DuckDB's // floors (−1 outside any bracket).

    Scale: the spine explode is hours-per-type rows (tiny vs the fact
    table); every window shares one (event_type, hour) sort; the fact
    aggregate is the only corpus-sized shuffle.
    """
    hourly = (
        events.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 1000, 0).cast("long")).alias("milli"),
        )
    )
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
        .select(
            "event_type",
            F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("hour"),
        )
    )
    g = spine.join(hourly, ["event_type", "hour"], "left")
    w_back = Window.partitionBy("event_type").orderBy("hour").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_fwd = Window.partitionBy("event_type").orderBy("hour").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    obs_hour = F.when(F.col("milli").isNotNull(), F.col("hour"))
    g = (
        g.withColumn("prev_m", F.last("milli", ignorenulls=True).over(w_back))
        .withColumn("prev_h", F.last(obs_hour, ignorenulls=True).over(w_back))
        .withColumn("next_m", F.first("milli", ignorenulls=True).over(w_fwd))
        .withColumn("next_h", F.first(obs_hour, ignorenulls=True).over(w_fwd))
    )
    pos = (F.unix_timestamp("hour") - F.unix_timestamp("prev_h")) / 3600
    length = (F.unix_timestamp("next_h") - F.unix_timestamp("prev_h")) / 3600
    g = g.withColumn("_pos", pos.cast("long")).withColumn("_len", length.cast("long"))
    interp = F.expr(
        "prev_m + ((next_m - prev_m) * _pos"
        " - (((next_m - prev_m) * _pos) % _len + _len) % _len) DIV _len"
    )
    return g.select(
        "event_type",
        F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        F.coalesce("prev_m", F.lit(-1)).cast("long").alias("locf_milli"),
        F.when(F.col("milli").isNotNull(), F.col("milli"))
        .when(F.col("prev_m").isNotNull() & F.col("next_m").isNotNull() & (F.col("_len") > 0), interp)
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("interp_milli"),
    )


def trailing_window_revenue(events: DataFrame, days: int = 7) -> DataFrame:
    """F47: trailing time-RANGE window — per (event_type, day), the value
    sum over the trailing ``days``-day interval, computed with a
    rangeBetween frame over integer day numbers (epoch div 86400), NOT a
    rows frame: days missing from the data contribute nothing and never
    shift the frame, which is the semantic difference between RANGE and
    ROWS that daily-active/rolling-revenue metrics depend on. Exact
    BIGINT millis end-to-end.

    Scale: one fact aggregate to (type, day) cardinality, then the window
    runs over day-count rows — never the raw stream.
    """
    daily = (
        events.groupBy(
            "event_type", (F.unix_timestamp(F.date_trunc("day", "ts")) / 86400).cast("long").alias("day_num")
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 1000, 0).cast("long")).alias("milli"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_num")
        .rangeBetween(-(days - 1), 0)
    )
    return daily.select(
        "event_type",
        F.date_format(F.to_timestamp(F.col("day_num") * 86400), "yyyy-MM-dd").alias("day"),
        "n",
        F.sum("milli").over(w).alias("trailing_milli"),
        F.sum("n").over(w).alias("trailing_n"),
    )


def derived_partsupp(lineitem: DataFrame) -> DataFrame:
    """The testdata schema carries no partsupp table, so q11/q20 run on a
    DETERMINISTIC reconstruction: the distinct (l_partkey, l_suppkey)
    pairs that actually traded, with arithmetic supply cost and stock
    level (pure key arithmetic ⇒ the DuckDB oracle recomputes the exact
    same relation — same adaptation precedent as q2/q9's cost columns).

    Scale: one distinct over two fact columns (map-side combinable,
    pruned scan); the derived dim is then small enough to broadcast into
    the q11/q20 joins at any SF (|pairs| ≪ |lineitem|).
    """
    return (
        lineitem.select("l_partkey", "l_suppkey").distinct()
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
            (F.pmod(F.col("l_partkey") * 7 + F.col("l_suppkey") * 13, F.lit(10000)) + 1)
            .cast("long").alias("ps_supplycost_cents"),
            (F.pmod(F.col("l_partkey") * 31 + F.col("l_suppkey") * 17, F.lit(9999)) + 1)
            .cast("long").alias("ps_availqty"),
        )
    )


def important_stock(lineitem: DataFrame, supplier: DataFrame,
                    nationkey: int = 9) -> DataFrame:
    """TPC-H q11 shape: per-part inventory value held by one nation's
    suppliers, keeping parts above a threshold fraction of the national
    total — the scalar-subquery HAVING. Runs on
    :func:`derived_partsupp`. TPC-H scales the fraction by 1/SF; here
    the threshold is SCALE-INVARIANT by construction — keep parts worth
    more than 2× the mean part value (value·n_parts > 2·total) — so the
    query stays selective-but-nonempty at every SF without knowing SF.

    Spark-first: the one-nation supplier dim broadcasts into the
    partsupp scan; the grand total/count is a single-row aggregate
    broadcast back (no second shuffle), and the threshold compare is
    cross-multiplied integers so the hash gate never sees a float.
    """
    ps = derived_partsupp(lineitem)
    scoped = (
        ps.join(
            F.broadcast(
                supplier.where(F.col("s_nationkey") == nationkey).select("s_suppkey")
            ),
            ps["ps_suppkey"] == F.col("s_suppkey"),
        )
        .groupBy("ps_partkey")
        .agg(
            F.count("*").cast("long").alias("n_supp"),
            F.sum(F.col("ps_supplycost_cents") * F.col("ps_availqty"))
            .cast("long").alias("value_cents"),
        )
    )
    tot = scoped.agg(
        F.sum("value_cents").cast("long").alias("_total"),
        F.count("*").cast("long").alias("_n_parts"),
    )
    return (
        scoped.crossJoin(F.broadcast(tot))
        .where(F.col("value_cents") * F.col("_n_parts") > F.lit(2) * F.col("_total"))
        .select(F.col("ps_partkey").cast("long").alias("ps_partkey"), "n_supp", "value_cents")
    )


_SHIPMODES = ["MAIL", "SHIP", "RAIL", "TRUCK", "AIR", "FOB", "REG AIR"]


def _derived_shipping(lineitem: DataFrame) -> DataFrame:
    """l_shipmode / l_commitdate / l_receiptdate don't exist in the
    testdata lineitem; derive all three deterministically from keys and
    l_shipdate (midnight-only timestamps, so date arithmetic is exact in
    both engines). commit offset spans [-15, 29] days so the q12
    'commit before receipt / shipped before commit' predicates actually
    bind both ways."""
    return (
        lineitem
        .withColumn(
            "l_shipmode",
            F.element_at(
                F.array(*[F.lit(m) for m in _SHIPMODES]),
                (F.pmod(F.col("l_orderkey") * 3 + F.col("l_linenumber"), F.lit(7)) + 1).cast("int"),
            ),
        )
        .withColumn(
            "l_commitdate",
            F.date_add(F.to_date("l_shipdate"),
                       (F.pmod(F.col("l_partkey"), F.lit(45)) - 15).cast("int")),
        )
        .withColumn(
            "l_receiptdate",
            F.date_add(F.to_date("l_shipdate"),
                       (F.pmod(F.col("l_suppkey"), F.lit(30)) + 1).cast("int")),
        )
    )


def shipmode_priority(lineitem: DataFrame, orders: DataFrame,
                      modes: tuple = ("MAIL", "SHIP"), y: int = 1996) -> DataFrame:
    """TPC-H q12 shape: late-shipping analysis — for each ship mode, how
    many high-priority vs low-priority orders arrived inside the window
    with commit-before-receipt and ship-before-commit. Runs on the
    derived shipmode/commit/receipt columns (:func:`_derived_shipping`).

    Scale: every derived-column predicate evaluates on the lineitem scan
    before the single orderkey shuffle join to orders (the canonical q12
    plan); the CASE counts are one map-side-combined aggregate over two
    groups.
    """
    li = _derived_shipping(lineitem).where(
        F.col("l_shipmode").isin(*modes)
        & (F.col("l_commitdate") < F.col("l_receiptdate"))
        & (F.to_date("l_shipdate") < F.col("l_commitdate"))
        & (F.year("l_receiptdate") == y)
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.select("l_orderkey", "l_shipmode")
        .join(orders.select("o_orderkey", "o_orderpriority"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_shipmode")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_count"),
            F.sum(F.when(hi, 0).otherwise(1)).cast("long").alias("low_count"),
        )
    )


def promotion_candidates(lineitem: DataFrame, part: DataFrame, supplier: DataFrame,
                         prefix: str = "red", y: int = 1996,
                         nationkey: int = 9) -> DataFrame:
    """TPC-H q20 shape: suppliers in one nation with surplus stock
    (availqty > half the year's shipped quantity) of name-prefixed parts
    — the nested IN-subquery chain, decorrelated to joins. Runs on
    :func:`derived_partsupp`; surplus test is exact integers
    (2000·availqty > qty_milli).

    Scale: the prefix-filtered part dim and one-nation supplier dim both
    broadcast; the year's per-(part,supp) quantity is one pruned fact
    aggregate; everything after is dim-sized.
    """
    ps = derived_partsupp(lineitem)
    qty = (
        lineitem.where(F.year("l_shipdate") == y)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.round(F.col("l_quantity") * 1000, 0).cast("long")).alias("qty_milli"))
    )
    return (
        ps.join(F.broadcast(part.where(F.col("p_name").startswith(prefix))
                            .select("p_partkey")),
                ps["ps_partkey"] == F.col("p_partkey"))
        .join(qty, (F.col("ps_partkey") == F.col("l_partkey"))
              & (F.col("ps_suppkey") == F.col("l_suppkey")))
        .where(F.lit(2000) * F.col("ps_availqty") > F.col("qty_milli"))
        .groupBy("ps_suppkey")
        .agg(F.countDistinct("ps_partkey").cast("long").alias("n_parts"))
        .join(
            F.broadcast(supplier.where(F.col("s_nationkey") == nationkey)
                        .select("s_suppkey", "s_name")),
            F.col("ps_suppkey") == F.col("s_suppkey"),
        )
        .select("s_name", F.col("s_suppkey").cast("long").alias("s_suppkey"), "n_parts")
    )

"""General relational operators over the TPC-H-style warehouse tables.

These queries demonstrate the engine's join/aggregate/sort competence on
the star-schema side of a training-data platform (the same cluster that
extracts HTML also joins usage/metadata tables).  Design notes for the
100 TB case:

* **Money is integer cents, never summed floats.**  Float addition is
  order-dependent, so a shuffled distributed sum of doubles is not
  reproducible run-to-run (and never matches a single-threaded oracle
  bit-for-bit).  Prices in the corpus are exact cents and discounts/tax
  exact percent, so ``round(x*100)::bigint`` is lossless and every
  aggregate below is exact integer arithmetic -- deterministic at any
  parallelism.
* **Wide accumulators for cent-percent units.**  charge is
  cents*percent*percent (~2e11 per row): a LongType sum wraps silently
  past int64 at around 5e7 such rows per group with ANSI off, while the
  DuckDB oracle promotes to HUGEINT -- a silent divergence exactly at
  the advertised fact scale.  All cent-percent sums therefore accumulate
  as decimal(38,0) (128-bit in Tungsten, still exact integer arithmetic)
  and only the final one-row-per-group result is cast back to bigint.
* **Dimension joins are explicit broadcasts** (nation/region/part are
  tiny even at 100 TB fact scale); the fact-fact joins (orders x
  lineitem, customer x orders) shuffle on their keys, which are uniform
  by construction -- no skew handling needed, and AQE would coalesce.
* **Top-k is aggregate-then-sort on the grouped (small) result**, never
  a global sort of the fact table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cents(col: str) -> Column:
    """Exact integer cents from a 2-decimal price stored as double."""
    return F.round(F.col(col) * 100).cast("long")


def _pct(col: str) -> Column:
    """Exact integer percent from a 2-decimal rate stored as double."""
    return F.round(F.col(col) * 100).cast("long")


def _sum_wide(col: Column) -> Column:
    """Sum an integer expression through a 128-bit decimal accumulator
    (exact past int64; see module docstring) and return it as bigint.

    The final narrowing cast is guarded: with ANSI off a decimal ->
    bigint cast past +/-2^63 silently produces NULL, diverging from the
    DuckDB HUGEINT oracle at exactly the scale the wide accumulator
    exists for.  A per-group sum that genuinely exceeds int64 raises
    instead (one comparison on the one-row-per-group final aggregate --
    free), at which point the caller should return the decimal column
    itself."""
    dec = F.sum(col.cast("decimal(38,0)"))
    in_range = dec.between(F.lit(-(1 << 63)), F.lit((1 << 63) - 1))
    return F.when(dec.isNull() | in_range, dec.cast("long")).otherwise(
        F.raise_error(
            F.concat(
                F.lit("_sum_wide: group sum overflows bigint: "),
                dec.cast("string"),
            )
        )
    )


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1 shape: pricing summary report over lineitem.

    revenue/charge are in cent-percent units (cents * integer percent)
    so the whole report is exact integer math; averages are derived
    ratios rounded at the end (identical division on both engines).
    """
    li = lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff)).select(
        "l_returnflag",
        "l_linestatus",
        F.round("l_quantity").cast("long").alias("qty"),
        _cents("l_extendedprice").alias("base_cents"),
        _pct("l_discount").alias("disc_pct"),
        _pct("l_tax").alias("tax_pct"),
    )
    disc = F.col("base_cents") * (F.lit(100) - F.col("disc_pct"))
    charge = disc * (F.lit(100) + F.col("tax_pct"))
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("qty").alias("sum_qty"),
        _sum_wide(F.col("base_cents")).alias("sum_base_cents"),
        _sum_wide(disc).alias("sum_disc_cp"),
        _sum_wide(charge).alias("sum_charge_cpp"),
        F.count("*").alias("count_order"),
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_cents",
        "sum_disc_cp",
        "sum_charge_cpp",
        F.round(F.col("sum_qty") / F.col("count_order"), 6).alias("avg_qty"),
        F.round(F.col("sum_base_cents") / F.col("count_order"), 6).alias(
            "avg_price_cents"
        ),
        "count_order",
    )


def revenue_by_nation(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
    year: int = 1996,
) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation for one region and one year.

    Plan: lineitem |x| orders (shuffle on orderkey) |x| customer
    (shuffle on custkey) |x| broadcast(nation |x| region).  Filters are
    applied before the joins so predicate pushdown reaches the scans.
    """
    dim = (
        nation.join(region, nation["n_regionkey"] == region["r_regionkey"])
        .filter(F.col("r_name") == region_name)
        .select("n_nationkey", "n_name")
    )
    ords = orders.filter(F.year("o_orderdate") == year).select(
        "o_orderkey", "o_custkey"
    )
    li = lineitem.select(
        "l_orderkey",
        (_cents("l_extendedprice") * (F.lit(100) - _pct("l_discount"))).alias(
            "rev_cp"
        ),
    )
    joined = (
        li.join(ords, li["l_orderkey"] == ords["o_orderkey"])
        .join(customer, F.col("o_custkey") == customer["c_custkey"])
        .join(F.broadcast(dim), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy("n_name")
        .agg(_sum_wide(F.col("rev_cp")).alias("revenue_cp"))
        .orderBy(F.desc("revenue_cp"), F.asc("n_name"))
    )


def top_brands(lineitem: DataFrame, part: DataFrame, k: int = 10) -> DataFrame:
    """Top-k brands by discounted revenue: broadcast dim join, aggregate,
    then sort only the 25-row grouped result (never the fact table)."""
    li = lineitem.select(
        "l_partkey",
        (_cents("l_extendedprice") * (F.lit(100) - _pct("l_discount"))).alias(
            "rev_cp"
        ),
        F.round("l_quantity").cast("long").alias("qty"),
    )
    joined = li.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        li["l_partkey"] == F.col("p_partkey"),
    )
    return (
        joined.groupBy("p_brand")
        .agg(
            _sum_wide(F.col("rev_cp")).alias("revenue_cp"),
            F.sum("qty").alias("total_qty"),
            F.count("*").alias("n_lines"),
        )
        .orderBy(F.desc("revenue_cp"), F.asc("p_brand"))
        .limit(k)
    )


def late_shipment_priority(
    orders: DataFrame, lineitem: DataFrame, late_days: int = 60
) -> DataFrame:
    """TPC-H Q4 shape: orders with >=1 lineitem shipped more than
    ``late_days`` after the order date, counted per priority.

    Left-semi join (no fanout from multi-line orders) then a 5-group
    aggregate; the semi join shuffles once on orderkey.
    """
    late = (
        lineitem.join(
            orders.select("o_orderkey", "o_orderdate"),
            lineitem["l_orderkey"] == F.col("o_orderkey"),
        )
        .filter(
            F.col("l_shipdate") > F.timestamp_add("DAY", F.lit(late_days), F.col("o_orderdate"))
        )
        .select(F.col("l_orderkey").alias("late_orderkey"))
        .distinct()
    )
    return (
        orders.join(
            late, orders["o_orderkey"] == late["late_orderkey"], "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("late_orders"))
    )


def supplier_balance_by_nation(
    supplier: DataFrame, nation: DataFrame
) -> DataFrame:
    """Supplier account-balance rollup per nation (broadcast dim join +
    hash agg; balances in exact integer cents)."""
    s = supplier.select(
        "s_nationkey", _cents("s_acctbal").alias("bal_cents")
    ).filter(F.col("bal_cents") > 0)
    joined = s.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        s["s_nationkey"] == F.col("n_nationkey"),
    )
    return (
        joined.groupBy("n_name")
        .agg(
            F.count("*").alias("suppliers"),
            _sum_wide(F.col("bal_cents")).alias("balance_cents"),
        )
        .orderBy(F.desc("balance_cents"), F.asc("n_name"))
    )


def customer_order_ranks(
    orders: DataFrame, customer: DataFrame, segment: str = "BUILDING", k: int = 3
) -> DataFrame:
    """Analytic windows over the fact table: per-customer order rank by
    spend and running cumulative spend (integer cents), top-k per
    customer.  One shuffle on the window key; the segment filter is
    pushed to the customer scan and applied before the join.
    """
    from pyspark.sql import Window

    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    o = orders.select(
        "o_orderkey", "o_custkey", _cents("o_totalprice").alias("price_cents")
    ).join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("price_cents"), F.asc("o_orderkey")
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "price_cents",
            F.row_number().over(w).alias("rank"),
            F.sum("price_cents").over(run).alias("cum_cents"),
        )
        .filter(F.col("rank") <= k)
    )


def referential_orphans(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    group_col: str,
    amount_col: str,
) -> DataFrame:
    """Referential-integrity audit: fact rows whose dimension key is
    missing, summarized per group with the money at stake.

    The data-quality gate every warehouse load runs before publishing
    (dangling orders after a customer purge, events for deleted users).
    LEFT ANTI join on the uniform fact key -- the fact table is scanned
    once and never widened; the dim side ships only its key column, and
    Catalyst/AQE broadcasts it when stats allow (no forced hint: a dim
    with 10^9 keys at the design point must be allowed to shuffle).
    Money aggregates as exact integer cents through the 128-bit
    accumulator.
    """
    orphans = fact.join(
        dim.select(F.col(dim_key).alias(fact_key)), on=fact_key, how="left_anti"
    )
    return orphans.groupBy(group_col).agg(
        F.count("*").alias("orphan_rows"),
        _sum_wide(_cents(amount_col)).alias("lost_cents"),
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1995-03-15",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: top-k unshipped orders by revenue for a segment.

    Three-table join with filters on every input pushed to the scans:
    the customer dim prunes to one segment (broadcast when stats
    allow), orders/lineitem join on the uniform orderkey, revenue
    aggregates as exact integer cent-percent units, and the top-k rides
    TakeOrderedAndProject (never a global sort of the aggregate).
    """
    c = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    o = orders.filter(F.col("o_orderdate") < F.lit(cutoff)).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    l = lineitem.filter(F.col("l_shipdate") > F.lit(cutoff)).select(
        "l_orderkey",
        (_cents("l_extendedprice") * (100 - _pct("l_discount"))).alias("rev"),
    )
    joined = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_sum_wide(F.col("rev")).alias("revenue_cp"))
    )
    return joined.orderBy(
        F.desc("revenue_cp"), F.asc("o_orderkey")
    ).limit(k)


def returned_item_report(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10 shape: top-k customers by revenue lost to returns in a
    quarter.

    lineitem is pre-filtered to returned lines (pushed to the scan) and
    orders to the quarter before the fact-fact shuffle joins on their
    uniform keys; the nation dim rides a broadcast.  Revenue is exact
    cent-percent, the account balance an exact-cents scalar, and the
    top-k sorts only the per-customer aggregate via
    TakeOrderedAndProject.
    """
    li = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey",
        (_cents("l_extendedprice") * (F.lit(100) - _pct("l_discount"))).alias(
            "rev_cp"
        ),
    )
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from))
        & (F.col("o_orderdate") < F.lit(date_to))
    ).select("o_orderkey", "o_custkey")
    c = customer.select(
        "c_custkey", "c_name", "c_nationkey", _cents("c_acctbal").alias("acctbal_cents")
    )
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, F.col("o_custkey") == c["c_custkey"])
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "acctbal_cents", "n_name")
        .agg(_sum_wide(F.col("rev_cp")).alias("revenue_cp"))
    )
    return joined.orderBy(F.desc("revenue_cp"), F.asc("c_custkey")).limit(k)


def late_lines_by_flag(
    orders: DataFrame,
    lineitem: DataFrame,
    grace_days: int = 60,
) -> DataFrame:
    """TPC-H Q12 shape: lines shipped more than ``grace_days`` past
    their order date, split into high- vs low-priority counts per
    return flag.

    One fact-fact join on the uniform orderkey with the lateness
    predicate applied at the join output and the priority CASE folded
    into two conditional sums -- the classic shipping-mode exception
    report re-keyed to columns this warehouse carries (no l_shipmode /
    l_receiptdate in the corpus schema).
    """
    o = orders.select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = lineitem.select("l_orderkey", "l_returnflag", "l_shipdate")
    late = li.join(o, li["l_orderkey"] == o["o_orderkey"]).filter(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"interval {int(grace_days)} days")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        late.groupBy("l_returnflag")
        .agg(
            F.sum(high.cast("long")).alias("high_priority_lines"),
            F.sum((~high).cast("long")).alias("low_priority_lines"),
        )
        .orderBy("l_returnflag")
    )


def customer_order_distribution(
    customer: DataFrame,
    orders: DataFrame,
    excluded_priority: str = "1-URGENT",
) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count,
    INCLUDING the zero-order bucket.

    The left outer join is what distinguishes this from a plain
    groupBy -- customers with no qualifying orders must surface as
    c_count = 0.  Two aggregations: per-customer counts (shuffle on the
    uniform custkey), then the |distinct counts|-sized distribution.
    """
    o = orders.filter(F.col("o_orderpriority") != excluded_priority).select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        customer.select("c_custkey")
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def large_volume_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    min_qty: int = 250,
    k: int = 20,
) -> DataFrame:
    """TPC-H Q18 shape: top-k largest orders by total line quantity.

    The HAVING pre-aggregation runs on lineitem alone (map-side
    combined, shuffle on the uniform orderkey) and only the tiny
    qualifying set joins orders and customer -- never the full fact
    cross section.  Quantities are exact integers; the top-k rides
    TakeOrderedAndProject.
    """
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.round("l_quantity").cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") > min_qty)
    )
    o = orders.select(
        "o_orderkey", "o_custkey", "o_orderdate",
        _cents("o_totalprice").alias("totalprice_cents"),
    )
    return (
        big.join(o, F.col("l_orderkey") == o["o_orderkey"])
        .join(
            customer.select("c_custkey", "c_name"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "totalprice_cents", "total_qty",
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(k)
    )


def dormant_rich_customers(
    customer: DataFrame,
    orders: DataFrame,
    since: str = "2000-01-01",
) -> DataFrame:
    """TPC-H Q22 shape: per-nation count and balance of above-average
    customers with no recent orders.

    The average-balance threshold is applied as an exact integer
    cross-multiplication (acctbal_cents * n_positive > sum_positive_cents)
    so no float division ever happens -- bit-reproducible at any
    parallelism and trivially oracle-mirrorable.  The global (count,
    sum) pair is a one-row broadcast; recent purchasers leave via a
    LeftAnti join on the uniform custkey.
    """
    c = customer.select(
        "c_custkey", "c_nationkey", _cents("c_acctbal").alias("acctbal_cents")
    )
    pos = c.filter(F.col("acctbal_cents") > 0).agg(
        F.count("*").alias("n_pos"),
        F.sum("acctbal_cents").alias("sum_pos_cents"),
    )
    recent = orders.filter(F.col("o_orderdate") >= F.lit(since)).select(
        "o_custkey"
    )
    rich = c.join(F.broadcast(pos)).filter(
        F.col("acctbal_cents") * F.col("n_pos") > F.col("sum_pos_cents")
    )
    return (
        rich.join(recent, rich["c_custkey"] == recent["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("acctbal_cents").alias("total_acctbal_cents"),
        )
        .orderBy("c_nationkey")
    )


def nation_pair_volume(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_a: str = "NATION_3",
    nation_b: str = "NATION_7",
) -> DataFrame:
    """TPC-H Q7 shape: trade volume between two nations, both
    directions, by ship year.

    The widest join in the suite -- lineitem x orders x customer x
    supplier on uniform fact keys, with BOTH nation lookups riding one
    broadcast dim filtered to the pair.  The direction predicate
    (supp_nation != cust_nation) applies after the dim joins, when each
    row carries two tiny strings rather than the full row.  Revenue is
    exact cent-percent.
    """
    dim = nation.filter(F.col("n_name").isin(nation_a, nation_b)).select(
        "n_nationkey", "n_name"
    )
    li = lineitem.select(
        "l_orderkey",
        "l_suppkey",
        F.year("l_shipdate").alias("ship_year"),
        (_cents("l_extendedprice") * (F.lit(100) - _pct("l_discount"))).alias(
            "rev_cp"
        ),
    )
    supp = supplier.join(
        F.broadcast(dim), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust = customer.join(
        F.broadcast(dim), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    return (
        li.join(orders.select("o_orderkey", "o_custkey"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "ship_year")
        .agg(_sum_wide(F.col("rev_cp")).alias("revenue_cp"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


def promo_revenue_share(
    lineitem: DataFrame,
    part: DataFrame,
    year: int = 1997,
) -> DataFrame:
    """TPC-H Q14 shape: promotional revenue share for one ship year.

    Broadcast part-type dim join + ONE aggregate with a conditional sum;
    the share is a single float division of two exact integer
    cent-percent sums (identical on any engine), scaled to percent.
    """
    li = lineitem.filter(F.year("l_shipdate") == year).select(
        "l_partkey",
        (_cents("l_extendedprice") * (F.lit(100) - _pct("l_discount"))).alias(
            "rev_cp"
        ),
    )
    joined = li.join(
        F.broadcast(part.select("p_partkey", "p_type")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    promo = F.when(F.col("p_type") == "PROMO", F.col("rev_cp")).otherwise(
        F.lit(0)
    )
    return joined.agg(
        _sum_wide(promo).alias("promo_cp"),
        _sum_wide(F.col("rev_cp")).alias("total_cp"),
    ).select(
        "promo_cp",
        "total_cp",
        F.round(
            F.lit(100.0) * F.col("promo_cp").cast("double")
            / F.col("total_cp").cast("double"),
            8,
        ).alias("promo_pct"),
    )


def forecast_revenue_change(
    lineitem: DataFrame,
    year: int = 1997,
    disc_lo_pct: int = 2,
    disc_hi_pct: int = 4,
    max_qty: int = 24,
) -> DataFrame:
    """TPC-H Q6 shape: revenue increase from dropping small discounts.

    The purest scan shape in the suite: one filter (every predicate
    pushed to the parquet scan) + one global aggregate, no join, no
    group key.  Revenue = price * discount in exact cent-percent units.
    """
    li = lineitem.filter(
        (F.year("l_shipdate") == year)
        & _pct("l_discount").between(disc_lo_pct, disc_hi_pct)
        & (F.round("l_quantity").cast("long") < max_qty)
    )
    return li.agg(
        _sum_wide(
            _cents("l_extendedprice") * _pct("l_discount")
        ).alias("revenue_cp"),
        F.count("*").alias("n_lines"),
    )


def top_supplier(
    lineitem: DataFrame,
    supplier: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum quarterly revenue.

    Per-supplier aggregate on the uniform suppkey, then the one-row
    global max joins back as a broadcast -- the view + scalar-subquery
    pattern without materializing a view.  Exact integer cent-percent
    revenue makes the max comparison exact (float revenue would make
    'equals the max' flaky).
    """
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from))
            & (F.col("l_shipdate") < F.lit(date_to))
        )
        .select(
            "l_suppkey",
            (_cents("l_extendedprice") * (F.lit(100) - _pct("l_discount"))).alias("rev_cp"),
        )
        .groupBy("l_suppkey")
        .agg(_sum_wide(F.col("rev_cp")).alias("revenue_cp"))
    )
    mx = rev.agg(F.max("revenue_cp").alias("max_rev"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("revenue_cp") == F.col("max_rev"))
        .join(supplier.select("s_suppkey", "s_name"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "revenue_cp")
        .orderBy("s_suppkey")
    )


def small_quantity_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    brand: str = "Brand#1",
    frac_pct: int = 20,
) -> DataFrame:
    """TPC-H Q17 shape: revenue locked in small-quantity orders of one
    brand -- lines below ``frac_pct``% of their part's average quantity.

    The correlated average is an integer CROSS-MULTIPLICATION:
    qty * n_lines * 100 < frac_pct * sum_qty  <=>  qty < frac% * avg --
    no float division anywhere, so the threshold verdict is exact on
    any engine.  Per-part stats aggregate on the uniform partkey and
    join back; the brand dim rides a broadcast.
    """
    bparts = part.filter(F.col("p_brand") == brand).select("p_partkey")
    li = lineitem.join(
        F.broadcast(bparts), F.col("l_partkey") == F.col("p_partkey")
    ).select(
        "l_partkey",
        F.round("l_quantity").cast("long").alias("qty"),
        _cents("l_extendedprice").alias("price_cents"),
    )
    stats = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.count("*").alias("n_lines"), F.sum("qty").alias("sum_qty")
    )
    small = li.join(stats, li["l_partkey"] == stats["pk"]).filter(
        F.col("qty") * F.col("n_lines") * 100
        < F.lit(frac_pct) * F.col("sum_qty")
    )
    return small.agg(
        _sum_wide(F.col("price_cents")).alias("price_cents_total"),
        F.count("*").alias("n_small_lines"),
    )


def discounted_brand_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: revenue under disjunctive brand+quantity-range
    predicates (the OR-of-ANDs pattern optimizers must not flatten into
    a cross product).  One broadcast dim join; the disjunction applies
    post-join; exact cent-percent money."""
    li = lineitem.select(
        "l_partkey",
        F.round("l_quantity").cast("long").alias("qty"),
        (_cents("l_extendedprice") * (F.lit(100) - _pct("l_discount"))).alias("rev_cp"),
    )
    joined = li.join(
        F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("qty").between(1, 11)
         & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#2") & F.col("qty").between(10, 20)
           & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#3") & F.col("qty").between(20, 30)
           & F.col("p_size").between(1, 15))
    )
    return joined.filter(cond).agg(
        _sum_wide(F.col("rev_cp")).alias("revenue_cp"),
        F.count("*").alias("n_lines"),
    )


def waiting_suppliers(
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    grace_days: int = 90,
    k: int = 20,
) -> DataFrame:
    """TPC-H Q21 shape: suppliers who alone held up multi-supplier
    orders (their line late, at least one other supplier on the order,
    no OTHER supplier late).

    The exists / not-exists pair becomes two aggregates over the same
    per-(order, supplier) frame: per order, count distinct suppliers
    and distinct LATE suppliers; a late supplier qualifies on orders
    with >= 2 suppliers and exactly 1 late one (itself).  Lateness is
    shipdate > orderdate + grace (the corpus carries no receipt/commit
    dates).  Everything shuffles on the uniform orderkey; the supplier
    name dim broadcasts at the end.
    """
    o = orders.select("o_orderkey", "o_orderdate")
    li = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"interval {int(grace_days)} days")
        ).alias("late"),
    )
    per_os = j.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("late").cast("int")).alias("any_late")
    )
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum("any_late").alias("n_late_supp"),
    )
    blamed = (
        per_os.filter(F.col("any_late") == 1)
        .join(per_o, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    )
    return (
        blamed.groupBy("l_suppkey")
        .agg(F.count("*").alias("n_waiting_orders"))
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "n_waiting_orders")
        .orderBy(F.desc("n_waiting_orders"), F.asc("s_suppkey"))
        .limit(k)
    )


def customer_spend_quartiles(orders: DataFrame) -> DataFrame:
    """Analytic-function breadth: ntile quartiles, percent_rank and
    cume_dist over per-customer total spend (exact integer cents so the
    ORDER is exact; rank-derived fractions are exact IEEE ratios of
    integers -- deterministic and oracle-mirrorable).  Ties broken by
    custkey so every rank function is stable."""
    from pyspark.sql.window import Window

    spend = (
        orders.select(
            "o_custkey", _cents("o_totalprice").alias("cents")
        )
        .groupBy("o_custkey")
        .agg(F.sum("cents").alias("spend_cents"), F.count("*").alias("n_orders"))
    )
    w = Window.orderBy(F.desc("spend_cents"), F.asc("o_custkey"))
    return spend.select(
        "o_custkey",
        "spend_cents",
        "n_orders",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 8).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 8).alias("cume"),
    )

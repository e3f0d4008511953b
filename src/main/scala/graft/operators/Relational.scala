package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General relational surface (the capability the reference's Snowflake
  * layer implies): multi-aggregate scans, selective multi-joins,
  * analytic windows, time-bucketed and session-windowed aggregation.
  *
  * Determinism rule (SURVEY §5): every money aggregate goes through
  * exact DECIMAL arithmetic and only the final value is cast to DOUBLE,
  * so results are bit-identical across engines regardless of float
  * summation order.
  */
object Relational {

  private def dec(c: Column, p: Int = 12, s: Int = 2): Column =
    c.cast(s"decimal($p,$s)")

  /** TPC-H Q1-shaped pricing summary: single scan, 8 aggregates,
    * map-side partial agg, 6-group output. The filter compares the raw
    * timestamp (NOT a cast-to-date, which would block parquet pushdown)
    * — `ts < day+1` ≡ `CAST(ts AS DATE) <= day`.
    */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") < lit("1998-09-03"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice"), 10, 2) * dec(lit(1) - col("l_discount"), 4, 2))
          .cast("double").as("sum_disc_price"),
        sum(dec(col("l_extendedprice"), 10, 2) * dec(lit(1) - col("l_discount"), 4, 2)
          * dec(lit(1) + col("l_tax"), 4, 2)).cast("double").as("sum_charge"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
        (sum(dec(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q3-shaped shipping priority: segment-filtered customer ⋈
    * orders ⋈ lineitem, revenue agg, top 10. Customer side broadcast
    * (dim ≪ fact); date filters push to both scans.
    */
  def shippingPriority(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame): DataFrame = {
    // raw-timestamp comparisons so both filters reach the parquet scan
    val c = customer.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val o = orders
      .filter(col("o_orderdate") < lit("1998-01-01"))
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("date").as("o_orderdate"), col("o_orderpriority"))
    val l = lineitem
      .filter(col("l_shipdate") >= lit("1998-01-02"))
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec(col("l_extendedprice"), 10, 2) * dec(lit(1) - col("l_discount"), 4, 2))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Per-customer running order totals + sequence numbers — the analytic
    * window surface. Partitioned by customer (hash-distributes cleanly);
    * order key (date, orderkey) is unique so RANGE≡ROWS framing agrees
    * across engines.
    */
  def runningTotals(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    orders.select(
        col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_orderdate"),
        dec(col("o_totalprice")).as("price_d"))
      .withColumn("running_total", sum(col("price_d")).over(w).cast("double"))
      .withColumn("order_seq", row_number().over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("price_d").cast("double").as("o_totalprice"),
        col("running_total"), col("order_seq"))
  }

  /** Tumbling 1-hour event aggregation (the batch twin of the streaming
    * windowed agg in [[graft.streaming.EventStream]]).
    */
  def hourlyEventAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Region-scoped revenue by nation — TPC-H Q5-shaped 5-way join.
    * region/nation broadcast (truly tiny); the customer-side join is
    * deliberately NOT hinted — customer is a fraction of the fact but
    * still scales with it, so AQE should pick broadcast vs shuffle from
    * runtime sizes. The orders⋈lineitem spine shuffles once on the key.
    */
  def regionRevenue(region: DataFrame, nation: DataFrame, customer: DataFrame,
      orders: DataFrame, lineitem: DataFrame, regionName: String = "ASIA"): DataFrame = {
    val dims = customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("n_name"))
    lineitem
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(dims, col("o_custkey") === col("c_custkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(dec(col("l_extendedprice"), 10, 2) * dec(lit(1) - col("l_discount"), 4, 2))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q8-shaped market share: of all revenue booked by customers
    * in `regionName`, the fraction supplied from `suppNation`, per
    * order year — a ratio of two conditional aggregates computed in a
    * SINGLE scan/shuffle (no self-join of the revenue stream, which is
    * the naive two-query form).
    *
    * Scale shape: region/nation/supplier are true dims → broadcast;
    * the customer join is left to AQE (same reasoning as
    * [[regionRevenue]] — customer scales with the fact, force-broadcast
    * measured worse under memory pressure); the orders⋈lineitem spine
    * shuffles once on the order key. Both numerator and denominator are
    * exact DECIMAL sums; only the final ratio is double.
    */
  def marketShare(region: DataFrame, nation: DataFrame, customer: DataFrame,
      supplier: DataFrame, orders: DataFrame, lineitem: DataFrame,
      regionName: String = "EUROPE", suppNation: String = "NATION_15"): DataFrame = {
    val custDim = customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val suppDim = supplier
      .join(broadcast(nation.select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation"))), col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("supp_nation"))
    val rev = dec(col("l_extendedprice"), 10, 2) * dec(lit(1) - col("l_discount"), 4, 2)
    lineitem
      .select(col("l_orderkey"), col("l_suppkey"), rev.as("rev"))
      .join(orders.select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(custDim, col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppDim), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("order_year"))
      .agg(
        sum(when(col("supp_nation") === suppNation, col("rev"))
          .otherwise(lit(0).cast("decimal(10,2)"))).cast("double").as("nation_rev"),
        sum(col("rev")).cast("double").as("total_revenue"),
        count(lit(1)).as("n_items"))
      .select(col("order_year"),
        round(col("nation_rev") / nullif(col("total_revenue"), lit(0d)), 6)
          .as("mkt_share"),
        col("total_revenue"), col("n_items"))
  }

  /** Ordered funnel per user: first view, first click strictly after
    * that view, first purchase strictly after that click — the
    * marketing-analytics "conversion path" over the reference's event
    * stream.
    *
    * Scale shape: ONE shuffle + ONE sort on (user_id, ts); the three
    * dependent "min qualifying timestamp so far" layers all share that
    * window spec, so Catalyst stacks them as Window operators over the
    * same distribution with no re-exchange. A purchase at time T
    * qualifies iff the minimum qualifying click so far is < T, which is
    * exactly "some click after the first view precedes it" — no
    * per-user event-list collection, no self-joins. The frame is the
    * default RANGE UNBOUNDED PRECEDING..CURRENT ROW (peer rows with
    * equal ts are all in frame) so same-timestamp ties resolve
    * identically in any engine; cross-stage comparisons stay strict
    * (`>`). Depth: 0 none, 1 viewed, 2 clicked after view, 3 purchased
    * after that click.
    *
    * `clickWithin` / `purchaseWithin` optionally bound each transition
    * to an attribution window (e.g. click ≤ 1 hour after the first
    * view) — the form real marketing attribution uses, and the one
    * that produces mixed depths on organic data.
    */
  def funnel(events: DataFrame, clickWithin: Option[String] = None,
      purchaseWithin: Option[String] = None): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    def within(anchor: Column, bound: Option[String]): Column =
      bound.map(b => col("ts") <= anchor + expr(s"INTERVAL $b"))
        .getOrElse(lit(true))
    val viewTs = when(col("event_type") === "view", col("ts"))
    val staged = events
      .select(col("user_id"), col("ts"), col("event_type"))
      .withColumn("fv", min(viewTs).over(w))
      .withColumn("cc",
        when(col("event_type") === "click" && col("ts") > col("fv") &&
          within(col("fv"), clickWithin), col("ts")))
      .withColumn("fc", min(col("cc")).over(w))
      .withColumn("pp",
        when(col("event_type") === "purchase" && col("ts") > col("fc") &&
          within(col("fc"), purchaseWithin), col("ts")))
    staged.groupBy(col("user_id"))
      .agg(
        min(viewTs).as("fv_all"),
        min(col("cc")).as("fc_all"),
        min(col("pp")).as("fp_all"))
      .select(col("user_id"),
        date_trunc("second", col("fv_all")).as("first_view"),
        date_trunc("second", col("fc_all")).as("first_click"),
        date_trunc("second", col("fp_all")).as("first_purchase"),
        when(col("fp_all").isNotNull, 3)
          .when(col("fc_all").isNotNull, 2)
          .when(col("fv_all").isNotNull, 1)
          .otherwise(0).as("funnel_depth"))
  }

  /** Weekly cohort retention — the marketing "retention triangle":
    * users are cohorted by the ISO week of their first event, and each
    * (cohort week, week offset) cell counts how many of them were
    * still active that week.
    *
    * Scale shape: first-event-per-user is one map-side-combined
    * aggregate; joining cohorts back onto the event stream keys BOTH
    * sides by user_id (the same key the aggregate just shuffled on, so
    * AQE plans at most one new exchange); the cell aggregate is a lone
    * `count(DISTINCT user)` — no mixed plain aggregates, so Catalyst
    * plans the two-level distinct WITHOUT the Expand rewrite (SURVEY
    * §6); cohort sizes are a tiny per-week count that broadcasts onto
    * the matrix.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val cohorts = events
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"))
      .select(col("user_id"),
        date_trunc("week", col("first_ts")).cast("date").as("cohort_week"))
    val sizes = cohorts.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("n_cohort"))
    val cells = events
      .select(col("user_id"), col("ts"))
      .join(cohorts, Seq("user_id"))
      .select(col("cohort_week"),
        floor(datediff(col("ts").cast("date"), col("cohort_week")) / 7)
          .as("week_offset"),
        col("user_id"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
    cells.join(broadcast(sizes), Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        col("n_cohort"),
        round(col("n_active").cast("double") / col("n_cohort"), 4)
          .as("retention"))
  }

  /** Weekly cohort LTV matrix — the revenue companion to
    * [[cohortRetention]]: users cohorted by first-event week (same
    * grain as the retention triangle), each (cohort, week-offset) cell
    * carries that week's purchase revenue, the running cumulative
    * revenue, and cumulative LTV per cohort user — the curve a
    * marketing team reads payback periods off.
    *
    * Scale shape: one user-keyed shuffle to attach cohorts (first-seen
    * agg reuses the same key), cells aggregate with map-side partials,
    * cohort sizes broadcast, and the cumulative window runs over the
    * (cohort × weeks) matrix — thousands of rows however large the
    * event stream. Money math follows §5: DECIMAL(12,2) sums stay
    * exact through the cumulative window; the double cast happens last.
    */
  def cohortLtv(events: DataFrame): DataFrame = {
    val cohorts = events
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"))
      .select(col("user_id"),
        date_trunc("week", col("first_ts")).cast("date").as("cohort_week"))
    val sizes = cohorts.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("n_cohort"))
    val cells = events
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
      .join(cohorts, Seq("user_id"))
      .select(col("cohort_week"),
        floor(datediff(col("ts").cast("date"), col("cohort_week")) / 7)
          .as("week_offset"),
        col("value").cast("decimal(12,2)").as("v"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(sum(col("v")).as("rev"))
    val cum = Window.partitionBy(col("cohort_week")).orderBy(col("week_offset"))
    cells.join(broadcast(sizes), Seq("cohort_week"))
      .withColumn("cum_rev", sum(col("rev")).over(cum))
      .select(col("cohort_week"), col("week_offset"), col("n_cohort"),
        col("rev").cast("double").as("revenue"),
        col("cum_rev").cast("double").as("cum_revenue"),
        round(col("cum_rev").cast("double") / col("n_cohort"), 4)
          .as("ltv_per_user"))
  }

  /** Customer decile lift (the marketing gains chart): customers ranked
    * by total purchase spend split into deciles; each decile reports
    * its user count, revenue, revenue share, cumulative share, and
    * LIFT — cumulative revenue share over cumulative user share ("the
    * top 10% of customers drive Nx their fair share of revenue").
    *
    * Scale shape: the event stream collapses to one exact-DECIMAL spend
    * row per customer (map-side partials, one shuffle). The decile cut
    * needs each user's GLOBAL rank in (spend desc, user_id) order, but
    * a bare `ntile(10) OVER (ORDER BY …)` funnels the whole user grain
    * through ONE window partition's sort — billions of rows in a
    * single task at warehouse scale. Instead the rank is computed
    * two-level (the [[CorpusStats.packManifest]] prefix-sum pattern):
    * `repartitionByRange` on the ntile order gives globally ordered
    * partitions, each sorted and locally numbered in parallel
    * (`monotonically_increasing_id` after `sortWithinPartitions`
    * encodes the in-partition row offset — no extra exchange), and the
    * broadcast prefix sum of partition counts lifts local numbers to
    * exact global ranks. The decile then falls out of ntile's bucket
    * arithmetic on (rank, n) — bit-identical to the oracle's ntile by
    * construction, including remainder buckets and tie order. The only
    * unpartitioned window runs over the partition-count frame (≤
    * `spark.sql.shuffle.partitions` rows — a cluster constant, not a
    * data size); the 10-row cumulative uses a broadcast triangular
    * self-join, so no data-grain frame ever crosses a global window.
    */
  def decileLift(events: DataFrame): DataFrame = {
    val spend = events
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(sum(col("value").cast("decimal(12,2)")).as("spend"))
    val parts = spend.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = spend
      .repartitionByRange(parts, col("spend").desc, col("user_id"))
      .sortWithinPartitions(col("spend").desc, col("user_id"))
      .withColumn("pid", spark_partition_id())
      // monotonically_increasing_id = (pid << 33) + in-partition row
      // offset, assigned ABOVE the sort (Catalyst never reorders a
      // nondeterministic projection through it), so the offset IS the
      // local rank in ntile order
      .withColumn("lrn",
        monotonically_increasing_id()
          - shiftleft(col("pid").cast("long"), 33) + lit(1L))
    val counts = ranged.groupBy(col("pid"))
      .agg(max(col("lrn")).as("cnt"))
    val prefix = counts
      .withColumn("off",
        coalesce(sum(col("cnt")).over(Window.orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pid"), col("off"))
    val nRow = counts.agg(sum(col("cnt")).as("n"))
    val ranked = ranged
      .join(broadcast(prefix), Seq("pid"))
      .crossJoin(broadcast(nRow))
      .withColumn("rnk", col("off") + col("lrn"))
      // ntile(10) from the exact global rank: rem = n % 10 leading
      // buckets hold base+1 rows, the rest hold base = n div 10 (the
      // div-by-zero arm is unreachable when base = 0 — then rnk ≤ rem
      // always — and CASE evaluates lazily)
      .withColumn("decile", expr(
        """CASE WHEN rnk <= (n % 10) * ((n div 10) + 1)
          |THEN (rnk - 1) div ((n div 10) + 1) + 1
          |ELSE (n % 10) + (rnk - (n % 10) * ((n div 10) + 1) - 1)
          |  div (n div 10) + 1 END""".stripMargin))
    val deciles = ranked.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users"), sum(col("spend")).as("rev"))
    val totals = deciles.agg(
      sum(col("n_users")).as("t_users"), sum(col("rev")).as("t_rev"))
    val cums = deciles.select(col("decile").as("d2"),
      col("n_users").as("nu2"), col("rev").as("rev2"))
    deciles
      .join(broadcast(cums), col("d2") <= col("decile"))
      .groupBy(col("decile"), col("n_users"), col("rev"))
      .agg(sum(col("rev2")).as("cum_rev"), sum(col("nu2")).as("cum_users"))
      .crossJoin(broadcast(totals))
      .select(col("decile").cast("long").as("decile"), col("n_users"),
        col("rev").cast("double").as("revenue"),
        round(col("rev").cast("double") / col("t_rev").cast("double"), 4)
          .as("rev_share"),
        round(col("cum_rev").cast("double") / col("t_rev").cast("double"), 4)
          .as("cum_rev_share"),
        round((col("cum_rev").cast("double") / col("t_rev").cast("double")) /
          (col("cum_users").cast("double") / col("t_users").cast("double")), 4)
          .as("lift"))
  }

  /** TPC-H Q4-shaped priority audit: orders with at least one lineitem
    * shipped more than `graceDays` after the order date, counted per
    * priority. The EXISTS is a LEFT-SEMI hash join (equi on the order
    * key, the date lag as the join residual) — each order crosses the
    * exchange once regardless of how many late items it has, and the
    * count aggregates a 5-row output.
    */
  def latePriorityCounts(orders: DataFrame, lineitem: DataFrame,
      graceDays: Int = 60): DataFrame =
    orders
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .join(lineitem.select(col("l_orderkey"), col("l_shipdate")),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") +
            expr(s"INTERVAL $graceDays DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_late_orders"))

  /** TPC-H Q10-shaped returned-item report: revenue lost to returns per
    * customer, top 20. The lineitem scan filters on the return flag
    * BEFORE any join (pushed to parquet), the orders⋈lineitem spine
    * shuffles once, customer/nation resolve per AQE / broadcast, and
    * the top-20 cut is a TakeOrdered over the aggregated output with a
    * custkey tiebreak for a total order.
    */
  def returnedItemRevenue(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, nation: DataFrame): DataFrame =
    lineitem
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_name"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(
        sum(dec(col("l_extendedprice"), 10, 2) * dec(lit(1) - col("l_discount"), 4, 2))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  /** Daily/weekly active users, EXACT (no sketches): DAU and trailing
    * 7-day WAU per observed day.
    *
    * Rolling DISTINCT aggregates don't compose (a user active twice in
    * the window counts once), so the scalable exact form works at the
    * DAY GRAIN, and in ONE pass over the raw stream (plan-audited:
    * a single parquet scan — DataFrame fan-out into separate DAU /
    * span / WAU branches re-scans the source per branch under AQE,
    * measured 3×): dedup the stream to (day, user) pairs, explode each
    * pair to the ≤7 window days it can influence (a constant ×7 at day
    * grain), and aggregate per target day — WAU as the distinct
    * contributors, DAU as the distinct same-day contributors, and the
    * observed-day restriction as a post-aggregate HAVING on "any
    * same-day contributor" instead of a span join. DAU is a plain SUM
    * of same-day pairs — the input is already distinct (day, user), so
    * a second countDistinct would be value-identical but force
    * Catalyst's Expand rewrite (×2 the day-grain rows); with a single
    * distinct aggregate (WAU) the plan stays Expand-free, and
    * `dau > 0` doubles as the observed-day predicate.
    */
  def activeUsers(events: DataFrame): DataFrame =
    events
      .select(col("ts").cast("date").as("day"), col("user_id"))
      .distinct()
      .withColumn("target_day",
        explode(sequence(col("day"), date_add(col("day"), 6))))
      .groupBy(col("target_day"))
      .agg(
        sum(when(col("day") === col("target_day"), 1).otherwise(0))
          .as("dau"),
        countDistinct(col("user_id")).as("wau_7d"))
      .filter(col("dau") > 0)
      .select(col("target_day").as("day"), col("dau"), col("wau_7d"))

  /** THE support-law decomposition shared by [[coPurchasePairs]] and
    * [[assocRules]]: one row per DISTINCT item set with its order
    * multiplicity — `(items = sorted distinct parts of the basket,
    * mult = number of orders holding exactly that set)`. Every basket
    * support count decomposes exactly over it: the orders containing a
    * pair (or an item) = Σ mult over the distinct baskets holding it.
    * This is the exact-collapse law applied at basket grain (the
    * [[Graph.coPurchaseEdges]] / q_triangles fix, extended to COUNTS):
    * the quadratic pair fan-out and the pair aggregation run once per
    * DISTINCT basket, not once per order — on a replica-dense corpus
    * (the ScaleSmoke geometry, mirrored order feeds at 100 TB) the
    * pair stream is constant in the replica factor instead of linear.
    * Two shuffles: the basket-build groupBy on the order key (in-
    * basket dedup happens IN the partial aggregate via collect_set),
    * then the multiplicity groupBy on the canonicalized set. The
    * second shuffle keys on the item ARRAY — the payload must travel
    * anyway (the fan-out consumes it), so hashing the key would not
    * shrink the exchange.
    *
    * Explicit non-null filters: a NULL order key must not form a
    * basket (the per-order self-join it replaces never matched NULL
    * keys), NULL parts never pair — and the explicit form keeps every
    * consumer's scan specialization identical so the basket subtree
    * canonicalizes to ONE exchange (the assocRules reuse note).
    */
  private def distinctBaskets(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_orderkey").isNotNull && col("l_partkey").isNotNull)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("items"))
      .groupBy(col("items"))
      .agg(count(lit(1)).as("mult"))

  /** Market-basket co-occurrence: the top part PAIRS appearing in the
    * same order — the "customers also bought" primitive. In-basket
    * repeats can't inflate a pair (the basket collapses to its
    * distinct item set first); `part_a < part_b` counts each unordered
    * pair once per ORDER via the [[distinctBaskets]] multiplicity law.
    *
    * Scale shape: the pair fan-out is bounded by basket size (orders
    * carry ≲10 items → ≤45 pairs per basket, a constant) AND runs at
    * distinct-basket grain — the replica-quadratic class q_triangles
    * hit at ~sf100 (101 s from a per-order fan-out over a provably
    * constant graph) never starts. The pair count aggregates map-side
    * partials of the mult weights; the top-20 cut is a TakeOrdered on
    * a total order.
    */
  def coPurchasePairs(lineitem: DataFrame, topN: Int = 20): DataFrame =
    distinctBaskets(lineitem)
      .select(explode(col("items")).as("part_a"), col("items"), col("mult"))
      .select(col("part_a"), explode(col("items")).as("part_b"), col("mult"))
      .filter(col("part_a") < col("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(sum(col("mult")).as("n_orders"))
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
      .limit(topN)

  /** 2-D skyline (Pareto frontier): the parts no other part beats on
    * BOTH price (lower-better) and size (higher-better), with at least
    * one strict improvement — the dominance query behind "best
    * price/capability trade-offs". The textbook formulation is a
    * quadratic NOT-EXISTS dominance self-join (which the oracle runs
    * as the independent ground truth); this plan exploits the 2-D
    * structure instead: a row is dominated iff the max size among
    * STRICTLY cheaper rows reaches its size, or a same-price row
    * strictly exceeds it — a running max over the price order.
    *
    * Scale shape: the running max runs TWO-LEVEL (the packManifest
    * prefix-sum pattern): per-price grain first (one partial agg),
    * then in-bucket running max partitioned by a price bucket + a
    * bucket-grain prefix max that broadcasts — no global
    * single-partition window at any scale. One scan, two bounded
    * exchanges, dominance decided per row.
    */
  def skyline2d(part: DataFrame, bucketWidth: Double = 100.0): DataFrame = {
    val grain = part
      .groupBy(col("p_retailprice").as("price"))
      .agg(max(col("p_size")).as("pmax"))
      .withColumn("bucket", floor(col("price") / bucketWidth))
    val inBucket = Window.partitionBy(col("bucket")).orderBy(col("price"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = grain.withColumn("lmax", max(col("pmax")).over(inBucket))
    val bucketMax = grain.groupBy(col("bucket"))
      .agg(max(col("pmax")).as("bmax"))
    val bucketPrefix = bucketMax.withColumn("prevbmax",
      max(col("bmax")).over(Window.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("bucket"), col("prevbmax"))
    val prevmax = local.join(broadcast(bucketPrefix), Seq("bucket"))
      .select(col("price"), col("pmax"),
        greatest(coalesce(col("lmax"), lit(Int.MinValue)),
          coalesce(col("prevbmax"), lit(Int.MinValue))).as("cheaper_max"))
    part
      .join(prevmax, col("p_retailprice") === col("price"))
      .filter(!(col("cheaper_max") >= col("p_size") ||
        col("pmax") > col("p_size")))
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"),
        col("p_size"))
  }

  /** Association rules at pair grain (support / confidence / lift —
    * Agrawal & Srikant, SIGMOD 1993): every DIRECTED item pair a→b
    * co-occurring in at least `minOrders` baskets, scored as
    * support = n_ab / N, confidence = n_ab / n_a, and
    * lift = confidence / (n_b / N); the top `topN` rules by lift.
    * "Customers who bought a also bought b" with the base-rate
    * correction co-occurrence counts alone lack.
    *
    * Scale shape: ONE [[distinctBaskets]] subtree feeds the pair
    * fan-out, the per-item counts AND the basket total (its two
    * exchanges canonicalize identically across the three consumers →
    * ReusedExchange), and every consumer runs at distinct-basket
    * grain — support counts reconstruct exactly from the mult weights,
    * so a replica-dense corpus pays the quadratic fan-out once per
    * DISTINCT basket (the q_triangles fix applied to counts). Item
    * counts join the pair table on the item key — part-grain, never
    * order-grain; the basket total is a broadcast 1-row aggregate.
    * Ratios round to 4dp in the same operation order as the oracle,
    * and the final cut is a TakeOrdered on the (lift, a, b) total
    * order.
    */
  def assocRules(lineitem: DataFrame, minOrders: Long = 2,
      topN: Int = 20): DataFrame = {
    val baskets = distinctBaskets(lineitem)
    val total = baskets.agg(sum(col("mult")).cast("double").as("n_total"))
    val items = baskets
      .select(explode(col("items")).as("l_partkey"), col("mult"))
      .groupBy(col("l_partkey"))
      .agg(sum(col("mult")).as("n_item"))
    val pairs = baskets
      .select(explode(col("items")).as("part_a"), col("items"), col("mult"))
      .select(col("part_a"), explode(col("items")).as("part_b"), col("mult"))
      .filter(col("part_a") =!= col("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(sum(col("mult")).as("n_ab"))
      .filter(col("n_ab") >= minOrders)
    pairs
      .join(items.select(col("l_partkey").as("part_a"),
        col("n_item").as("n_a")), Seq("part_a"))
      .join(items.select(col("l_partkey").as("part_b"),
        col("n_item").as("n_b")), Seq("part_b"))
      .crossJoin(broadcast(total))
      .select(col("part_a"), col("part_b"), col("n_ab"),
        round(col("n_ab") / col("n_total"), 4).as("support"),
        round(col("n_ab") / col("n_a"), 4).as("confidence"),
        round((col("n_ab") / col("n_a"))
          / (col("n_b") / col("n_total")), 4).as("lift"))
      .orderBy(col("lift").desc, col("part_a"), col("part_b"))
      .limit(topN)
  }

  /** ROLLUP aggregation: per (flag, status), per flag, and grand total.
    * Same partial-agg shape as a flat groupBy — grouping sets expand
    * map-side.
    */
  def rollupSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        count(lit(1)).as("n_rows"))

  /** Non-hierarchical GROUPING SETS: independent per-flag and
    * per-status marginals in ONE pass — the sets ((rf), (ls)) that
    * neither ROLLUP nor CUBE can express without emitting unwanted
    * combinations. The `grouping()` flags disambiguate which marginal a
    * row belongs to (a NULL group value vs a rolled-up group). Same
    * map-side Expand shape as rollup: the scan runs once, each input
    * row fans out to exactly |sets| aggregation rows.
    */
  def marginalSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).cast("int").as("g_rf"),
        grouping(col("l_linestatus")).cast("int").as("g_ls"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        count(lit(1)).as("n_rows"))

  /** Pivot-style daily platform matrix: one row per day, one count
    * column per event_type (conditional aggregation — a single scan,
    * no per-value shuffles, the scalable form of PIVOT).
    */
  def platformPivotDaily(events: DataFrame): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val aggs = types.map(t =>
      count(when(col("event_type") === t, 1)).as(s"n_$t")) :+
      sum(dec(col("value"))).cast("double").as("sum_value")
    events
      .groupBy(col("ts").cast("date").as("period_day"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Distinct-heavy daily profile: exact distinct users / event types
    * per day (two-phase distinct aggregation under AQE).
    */
  def dailyDistincts(events: DataFrame): DataFrame =
    events
      .groupBy(col("ts").cast("date").as("period_day"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("event_type")).as("n_types"),
        count(lit(1)).as("n_events"))

  /** Exact interpolated percentiles per event type (`percentile` is a
    * sort-based exact aggregate; for 100 TB prefer [[sketchStats]]).
    */
  def percentiles(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50_value"),
        round(expr("percentile(value, 0.95)"), 6).as("p95_value"),
        count(lit(1)).as("n_events"))

  /** Sketch-based profile: HLL distinct counts and KLL-style quantile
    * estimates — constant memory per group, the 100 TB substitute for
    * exact distincts/percentiles. (Approximate ⇒ engine-specific values;
    * verified structurally, not against the SQL oracle.)
    */
  def sketchStats(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        expr("approx_percentile(value, 0.5)").as("approx_p50"),
        expr("approx_percentile(value, 0.95)").as("approx_p95"),
        count(lit(1)).as("n_events"))

  /** Semi/anti-join surface: every customer flagged by order existence.
    * LeftSemi + LeftAnti against the same build side — both shuffle-free
    * when the distinct key side broadcasts.
    */
  def customerOrderFlags(customer: DataFrame, orders: DataFrame): DataFrame = {
    val keys = orders.select(col("o_custkey"))
    val c = customer.select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    val has = c.join(keys, col("c_custkey") === col("o_custkey"), "left_semi")
      .withColumn("has_orders", lit(true))
    val hasNot = c.join(keys, col("c_custkey") === col("o_custkey"), "left_anti")
      .withColumn("has_orders", lit(false))
    has.unionByName(hasNot)
  }

  /** Gap-filled 7-day rolling aggregates per event type.
    *
    * The scale-correct shape for rolling time-series over a fact:
    * aggregate the fact to the DAY grain first (one map-side-combined
    * pass — the only touch of the big table), then generate a
    * contiguous date spine (`sequence` over the observed bounds ×
    * distinct types, both tiny) and left-join the daily grain onto it
    * so the window's ROWS frame equals the calendar frame even on days
    * with no events. The rolling window itself runs over days × types
    * rows — thousands, not billions — and a ROWS BETWEEN 6 PRECEDING
    * frame on the filled spine is exactly "last 7 calendar days".
    * Sums stay DECIMAL until the final cast (SURVEY §5).
    */
  def rolling7d(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(sum(dec(col("value"), 18, 6)).as("dv"), count(lit(1)).as("n"))
    val bounds = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val days = bounds.select(
      explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("day"))
    val spine = daily.select(col("event_type")).distinct()
      .crossJoin(broadcast(days))
    val filled = spine.join(daily, Seq("event_type", "day"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-6, 0)
    filled.select(col("event_type"), col("day"),
      sum(col("dv")).over(w).cast("double").as("roll7_value"),
      sum(col("n")).over(w).as("roll7_events"))
  }

  /** Session windows per user (30-minute inactivity gap) — native
    * `session_window`, which runs distributed by user and is the same
    * operator Structured Streaming uses for stateful sessionization.
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .select(
        col("user_id"),
        date_trunc("second", col("session_window.start")).as("session_start"),
        col("n_events"), col("sum_value"))

  /** TPC-H Q13-shaped customer order-count distribution: how many
    * customers placed 0, 1, 2, … qualifying orders.
    *
    * Scale shape: orders is PRE-AGGREGATED to one (custkey, count) row
    * per customer before touching the customer table, so the join
    * carries |customers| rows instead of |orders| — the classic
    * "aggregate below the join" rewrite Q13's filtered LEFT JOIN
    * usually defeats. Customers with no qualifying orders surface via
    * the LEFT side's null → 0 coalesce. The final distribution GROUP BY
    * is over ≲ max-orders-per-customer distinct keys — trivially small.
    */
  def custOrderDistribution(customer: DataFrame, orders: DataFrame): DataFrame = {
    val perCust = orders
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("order_count"))
    customer.select(col("c_custkey"))
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("order_count"), lit(0L)).as("order_count"))
      .groupBy(col("order_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  /** TPC-H Q15-shaped top supplier: supplier(s) whose shipped revenue
    * over a quarter equals the global maximum.
    *
    * Scale shape: the argmax is a 1-row aggregate over the per-supplier
    * revenue frame CROSS-JOINED back (broadcast of one row) — never a
    * global window sort, which would funnel every supplier through a
    * single partition. The revenue equality join stays in DECIMAL so
    * "equals the max" cannot be broken by float rounding; the cast to
    * DOUBLE happens only in the final projection. Ties all surface
    * (same semantics as Q15's HAVING = MAX subquery).
    */
  def topSupplier(supplier: DataFrame, lineitem: DataFrame,
      from: String = "1998-01-01", until: String = "1998-04-01"): DataFrame = {
    val rev = lineitem
      .filter(col("l_shipdate") >= lit(from) && col("l_shipdate") < lit(until))
      .groupBy(col("l_suppkey"))
      .agg(sum(dec(col("l_extendedprice"), 10, 2)
        * dec(lit(1) - col("l_discount"), 4, 2)).as("rev"))
    val top = rev.agg(max(col("rev")).as("max_rev"))
    // broadcast the argmax-filtered sliver (a handful of tied rows),
    // never the supplier dim itself — supplier streams past it
    val winners = rev.join(broadcast(top), col("rev") === col("max_rev"))
    supplier.select(col("s_suppkey"), col("s_name"))
      .join(broadcast(winners), col("s_suppkey") === col("l_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("rev").cast("double").as("total_revenue"))
  }

  /** TPC-H Q17-shaped small-quantity revenue: average yearly revenue
    * lost if orders below 20% of a part's mean quantity stopped
    * shipping, for one brand.
    *
    * Scale shape: the brand filter cuts `part` to a sliver that
    * BROADCASTS into the lineitem scan, and the per-part mean is a
    * whole-partition WINDOW over the filtered slice — ONE pass over the
    * fact, one exchange of the ~2% surviving rows (the agg-and-join-back
    * alternative avoids that small shuffle but rescans the whole fact
    * for the second subtree, which loses badly at 100 TB). The
    * 20%-of-average predicate is evaluated in decimal cross-multiplied
    * form (qty < 0.2·sum/cnt ⇒ 5·qty·cnt < sum) so both engines decide
    * the boundary identically — no float-division epsilon.
    */
  def smallQtyRevenue(part: DataFrame, lineitem: DataFrame,
      brand: String = "Brand#11"): DataFrame = {
    val p = part.filter(col("p_brand") === brand).select(col("p_partkey"))
    val li = lineitem
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), dec(col("l_quantity")).as("qty"),
        dec(col("l_extendedprice"), 10, 2).as("price"))
    val byPart = Window.partitionBy(col("l_partkey"))
    li.withColumn("sum_qty", sum(col("qty")).over(byPart))
      .withColumn("cnt", count(col("qty")).over(byPart))
      .filter(col("qty") * lit(5) * col("cnt") < col("sum_qty"))
      .agg((sum(col("price")).cast("double") / lit(7.0)).as("avg_yearly"))
  }

  /** TPC-H Q18-shaped large-volume orders: orders whose total quantity
    * exceeds a threshold, with customer context, top 100 by price.
    *
    * Scale shape: lineitem collapses to one row per order (map-side
    * combined) and the HAVING filter runs BEFORE any join, so only the
    * rare big orders reach the orders join; customer resolves via
    * broadcast (dim ≪ fact). The top-100 is a TakeOrdered with an
    * orderkey tiebreak for a total order.
    */
  def bigOrders(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
      minQty: Int = 200): DataFrame = {
    val qty = lineitem
      .groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_quantity"))).as("sum_qty"))
      .filter(col("sum_qty") > minQty)
    qty.join(orders.select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate"), col("o_totalprice")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.select(col("c_custkey"), col("c_name"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_orderdate"),
        col("o_totalprice"), col("sum_qty").cast("double").as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q6-shaped forecast-revenue delta: the revenue that would
    * vanish if discounts in a narrow band were eliminated for a year —
    * a single filtered scan with one exact-decimal aggregate. Every
    * predicate compares raw columns, so all three reach the parquet
    * scan; there is no join and no shuffle beyond the 1-row aggregate.
    */
  def forecastRevenue(lineitem: DataFrame, from: String = "1997-01-01",
      until: String = "1998-01-01", loDisc: Double = 0.02,
      hiDisc: Double = 0.04, maxQty: Int = 24): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit(from) && col("l_shipdate") < lit(until)
        && col("l_discount") >= loDisc && col("l_discount") <= hiDisc
        && col("l_quantity") < maxQty)
      .agg(sum(dec(col("l_extendedprice"), 10, 2) * dec(col("l_discount"), 4, 2))
        .cast("double").as("revenue_delta"),
        count(lit(1)).as("n_items"))

  /** TPC-H Q14-shaped promotion share: per ship month, the fraction of
    * revenue carried by promo-type parts.
    *
    * Scale shape: the part dim broadcasts (only partkey/type read), the
    * fact is scanned once with both aggregates computed in the same
    * pass (conditional sum, not a self-join), and the share divides two
    * exact DECIMAL sums after a single cast — deterministic across
    * engines without rounding.
    */
  def promoShare(part: DataFrame, lineitem: DataFrame): DataFrame = {
    val rev = dec(col("l_extendedprice"), 10, 2) *
      dec(lit(1) - col("l_discount"), 4, 2)
    lineitem
      .join(broadcast(part.select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
      .agg(
        sum(when(col("p_type") === "PROMO", rev).otherwise(dec(lit(0), 10, 2)))
          .cast("double").as("promo_revenue"),
        sum(rev).cast("double").as("total_revenue"))
      .withColumn("promo_share",
        col("promo_revenue") / col("total_revenue"))
  }

  /** TPC-H Q7-shaped bi-national trade flow: shipped volume between two
    * nations per direction and year.
    *
    * Scale shape: the two-nation filter lands on the TINY nation dim
    * and propagates through broadcast joins into both the supplier and
    * customer sides BEFORE the fact is touched, so the lineitem spine
    * drops to ~2/|nations| of its rows at the first (broadcast) join.
    * The orders join is the only big shuffle; the customer side arrives
    * pre-filtered and AQE picks its join strategy from the filtered
    * size. The cross-pair restriction (supplier nation ≠ customer
    * nation) is a residual predicate, not a join explosion.
    */
  def nationFlow(nation: DataFrame, customer: DataFrame, supplier: DataFrame,
      orders: DataFrame, lineitem: DataFrame,
      nationA: String = "NATION_18", nationB: String = "NATION_19"): DataFrame = {
    val n = nation.filter(col("n_name").isin(nationA, nationB))
      .select(col("n_nationkey"), col("n_name"))
    val sup = supplier.join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = customer.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    lineitem
      .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"),
        col("l_discount"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(orders.select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("o_orderdate")).as("order_year"))
      .agg(
        sum(dec(col("l_extendedprice"), 10, 2) * dec(lit(1) - col("l_discount"), 4, 2))
          .cast("double").as("volume"),
        count(lit(1)).as("n_items"))
  }

  /** Inter-order gap report: per customer, the days between consecutive
    * orders — the classic lag-window repurchase-cadence signal.
    *
    * Scale shape: ONE exchange on the customer key feeds both the lag
    * window and the per-customer aggregate (same partitioning, so the
    * groupBy adds no second shuffle); the sort is per-customer within
    * partitions, never global. The (date, orderkey) order key is a
    * total order, so gaps are deterministic under same-day ties. The
    * average divides exact integer day counts — no float drift.
    */
  def orderGaps(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_date"), col("o_orderkey"))
    orders
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_date"))
      .withColumn("gap_days",
        datediff(col("o_date"), lag(col("o_date"), 1).over(w)).cast("bigint"))
      .filter(col("gap_days").isNotNull)
      .groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).as("n_gaps"),
        (sum(col("gap_days")).cast("double") / count(lit(1))).as("avg_gap_days"),
        min(col("gap_days")).as("min_gap_days"),
        max(col("gap_days")).as("max_gap_days"))
  }

  /** Top user journeys: the most common day-grain event-type paths
    * (first `steps` events of each user-day, in time order) — the
    * "what do users actually do" path-analysis staple.
    *
    * Scale shape: journeys are truncated to `steps` BEFORE any
    * aggregation buffer exists — a per-(user, day) `row_number` over
    * the (ts, event_id) total order feeds a spillable external sort,
    * so per-group memory is bounded by `steps`, not by the heaviest
    * user-day (a bot with a million events would otherwise own the
    * whole collect_list buffer). The grouping then reuses the
    * window's (user, day) partitioning — still one journey-key
    * shuffle — and the in-array `sort_array` orders at most `steps`
    * structs. The top-N cut is a TakeOrdered on the tiny path-count
    * frame.
    */
  def topEventPaths(events: DataFrame, steps: Int = 5,
      topN: Int = 20): DataFrame = {
    val journeyW = Window
      .partitionBy(col("user_id"), col("day"))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("day", col("ts").cast("date"))
      .withColumn("rn", row_number().over(journeyW))
      .filter(col("rn") <= steps)
      .groupBy(col("user_id"), col("day"))
      .agg(sort_array(collect_list(
        struct(col("ts"), col("event_id"), col("event_type")))).as("evs"))
      .select(concat_ws(">",
        transform(col("evs"), e => e.getField("event_type")))
        .as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_journeys"))
      .orderBy(col("n_journeys").desc, col("path"))
      .limit(topN)
  }

  /** Event-type transition matrix over user journeys — the first-order
    * Markov model behind "what do users do next" analyses (next-step
    * prediction, funnel leak detection): for every (prev → next) event
    * pair, the transition count and conditional probability
    * `P(next | prev)`.
    *
    * Scale shape: one window exchange on the journey key orders each
    * user's stream once (lag is a streaming frame — no buffering
    * beyond one row); the pair aggregation partial-combines map-side
    * into a type²-sized matrix, and the probability normalization runs
    * as a window over THAT tiny aggregated frame — no second pass over
    * the data. Total order (ts, event_id) makes ties deterministic.
    */
  def eventTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = events
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val byPrev = Window.partitionBy(col("prev_type"))
    pairs.select(col("prev_type"), col("next_type"), col("n_transitions"),
      round(col("n_transitions").cast("double")
        / sum(col("n_transitions")).over(byPrev), 4).as("p_next"))
  }

  /** RFM segmentation — recency / frequency / monetary quartile scores
    * per purchasing user, the marketing-analytics segmentation staple.
    *
    * Scale shape: the textbook `ntile(4)` formulation needs a GLOBAL
    * window sort of the user frame (billions of rows through one
    * partition); instead the quartile THRESHOLDS come from one exact
    * `percentile` aggregate over the user-grain frame and broadcast
    * back, and each score is a pure per-row threshold compare —
    * one shuffle (the user aggregate), no global sort. The recency and
    * frequency thresholds interpolate exact INTEGER metrics at factors
    * 0.25/0.5/0.75 — exact in binary floating point, bit-identical
    * boundaries by construction. The monetary threshold interpolates
    * doubles (from exact decimal sums); its cross-engine identity rests
    * on Spark's `percentile` and DuckDB's `quantile_cont` sharing the
    * same two-sided formula `(hi-pos)·lo + (pos-lo)·hi` (verified — a
    * plain lerp differs in the last ulp), not on exactness (SURVEY §5).
    */
  def rfmSegments(events: DataFrame): DataFrame = {
    val users = events
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(
        max(col("ts")).as("last_ts"),
        count(lit(1)).as("frequency"),
        sum(dec(col("value"), 18, 6)).as("monetary_d"))
    val thresholds = users.agg(
      max(col("last_ts")).as("now_ts"),
      expr("percentile(frequency, array(0.25, 0.5, 0.75))").as("f_q"),
      expr("percentile(CAST(monetary_d AS DOUBLE), array(0.25, 0.5, 0.75))").as("m_q"))
    val scored = users.crossJoin(broadcast(thresholds))
      .withColumn("recency_days",
        datediff(col("now_ts").cast("date"), col("last_ts").cast("date"))
          .cast("bigint"))
      .withColumn("monetary", col("monetary_d").cast("double"))
    val rq = scored.agg(
      expr("percentile(recency_days, array(0.25, 0.5, 0.75))").as("r_q"))
    def score(m: Column, q: Column, invert: Boolean): Column = {
      val s = lit(1) + when(m > q.getItem(0), 1).otherwise(0) +
        when(m > q.getItem(1), 1).otherwise(0) +
        when(m > q.getItem(2), 1).otherwise(0)
      (if (invert) lit(5) - s else s).cast("int")
    }
    scored.crossJoin(broadcast(rq))
      .select(
        col("user_id"), col("recency_days"), col("frequency"), col("monetary"),
        // fewer days since last purchase = better: invert the quartile
        score(col("recency_days").cast("double"), col("r_q"), invert = true)
          .as("r_score"),
        score(col("frequency").cast("double"), col("f_q"), invert = false)
          .as("f_score"),
        score(col("monetary"), col("m_q"), invert = false).as("m_score"))
      .withColumn("segment",
        concat(col("r_score"), col("f_score"), col("m_score")))
  }

  /** New-vs-returning revenue split per year — the marketing-funnel
    * staple behind "how much of this year's revenue is acquisition vs
    * retention".
    *
    * Scale shape: the first-order date is a whole-partition MIN window
    * over the customer key — the same single-exchange pattern as
    * [[orderGaps]] (no join back, no second pass over orders); the
    * (year, flag) rollup that follows is a low-cardinality aggregate.
    * Every order on the customer's first day counts as "new" (ties
    * included), which is a date-equality rule — deterministic without
    * any ordering. Money stays DECIMAL until the final cast.
    */
  def newVsReturning(orders: DataFrame): DataFrame = {
    val byCust = Window.partitionBy(col("o_custkey"))
    orders
      .select(col("o_custkey"), col("o_orderdate").cast("date").as("o_date"),
        dec(col("o_totalprice")).as("price"))
      .withColumn("first_date", min(col("o_date")).over(byCust))
      .withColumn("cohort",
        when(col("o_date") === col("first_date"), "new").otherwise("returning"))
      .groupBy(year(col("o_date")).as("order_year"), col("cohort"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("price")).cast("double").as("revenue"))
  }

  /** TPC-H Q22-shaped lapsed high-balance customers: per market
    * segment, how many customers hold an above-average positive balance
    * yet placed no order since `since`.
    *
    * Scale shape: the global average is a 1-row aggregate broadcast
    * back as (sum, cnt) and the threshold runs in cross-multiplied
    * DECIMAL form (bal·cnt > sum — exact, engine-independent) instead
    * of dividing; the "no recent order" test is a LEFT ANTI hash join
    * whose build side is orders FILTERED AT THE SCAN (date pushdown)
    * and pruned to the key column. Only the rare qualifying customers
    * reach the anti join.
    */
  def idleRichCustomers(customer: DataFrame, orders: DataFrame,
      since: String = "2000-01-01"): DataFrame = {
    val bal = dec(col("c_acctbal"))
    val avgRow = customer.filter(col("c_acctbal") > 0)
      .agg(sum(bal).as("sum_bal"), count(lit(1)).as("n_bal"))
    customer.select(col("c_custkey"), col("c_mktsegment"), bal.as("bal"))
      .crossJoin(broadcast(avgRow))
      .filter(col("bal") * col("n_bal") > col("sum_bal"))
      .join(orders.filter(col("o_orderdate") >= lit(since))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_custs"),
        sum(col("bal")).cast("double").as("total_bal"))
  }

  /** TPC-H Q19-shaped disjunctive-predicate revenue: an OR of
    * per-brand (size band × quantity band) conjunctions that SPANS the
    * lineitem ⋈ part join — the canonical "disjunction across a join"
    * plan test. Per qualifying brand: exact-decimal revenue + item
    * count.
    *
    * Scale shape: the disjunction itself cannot be pushed through the
    * join, but its per-side WEAKENINGS can and are pushed explicitly —
    * part prunes to the union-of-brands sliver with the loosest size
    * bound (a broadcast build side), and the fact scan keeps only the
    * union quantity envelope (`[minQty, maxQty]` over all arms, a
    * parquet range pushdown), so the full OR is evaluated on the few
    * rows surviving both prefilters, not on the raw fact.
    */
  def disjunctiveRevenue(part: DataFrame, lineitem: DataFrame): DataFrame = {
    val arms: Seq[(String, Int, Int, Int)] = Seq(
      ("Brand#12", 10, 1, 20),  // (brand, maxSize, loQty, hiQty)
      ("Brand#23", 20, 10, 30),
      ("Brand#5", 30, 20, 40))
    val maxSize = arms.map(_._2).max
    val loQty = arms.map(_._3).min
    val hiQty = arms.map(_._4).max
    val p = part
      .filter(col("p_brand").isin(arms.map(_._1): _*)
        && col("p_size") >= 1 && col("p_size") <= maxSize)
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val li = lineitem
      .filter(col("l_quantity") >= loQty && col("l_quantity") <= hiQty)
      .select(col("l_partkey"), col("l_quantity"),
        dec(col("l_extendedprice"), 10, 2).as("price"),
        dec(lit(1) - col("l_discount"), 4, 2).as("disc"))
    val orPred = arms
      .map { case (brand, size, lo, hi) =>
        col("p_brand") === brand && col("p_size") <= size &&
          col("l_quantity") >= lo && col("l_quantity") <= hi
      }
      .reduce(_ || _)
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(orPred)
      .groupBy(col("p_brand"))
      .agg(sum(col("price") * col("disc")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q20-shaped excess-supply audit: suppliers who shipped MORE
    * THAN HALF of some part's total shipped quantity inside a year
    * window — the "one supplier dominates this part" concentration
    * signal (Q20's correlated `> 0.5 * sum(...)` subquery, join-form).
    *
    * Scale shape: ONE fact scan. The (part, supplier) quantities are a
    * map-side-combined aggregate, and the per-part totals are a
    * whole-partition WINDOW over those partials — the
    * [[smallQtyRevenue]] pattern: the agg-and-join-back alternative
    * reads cleaner but Catalyst plans the shared subtree TWICE
    * (measured — two full fact scans), while the window costs one
    * part-keyed exchange of the already-collapsed partials. The
    * dominance test runs in cross-multiplied DECIMAL (2·q > total —
    * exact, no division). Supplier names resolve by broadcast at the
    * dominant-pair sliver, dim ≪ fact.
    */
  def excessSupply(supplier: DataFrame, lineitem: DataFrame,
      from: String = "1997-01-01", until: String = "1998-01-01"): DataFrame = {
    val ps = lineitem
      .filter(col("l_shipdate") >= lit(from) && col("l_shipdate") < lit(until))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(dec(col("l_quantity"))).as("supp_qty"))
    val byPart = Window.partitionBy(col("l_partkey"))
    val dominant = ps
      .withColumn("part_qty", sum(col("supp_qty")).over(byPart))
      .filter(col("supp_qty") * 2 > col("part_qty"))
    dominant.groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_dominant_parts"),
        sum(col("supp_qty")).cast("double").as("dominated_qty"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_dominant_parts"),
        col("dominated_qty"))
  }

  /** TPC-H Q2-shaped minimum-cost supplier: within a part slice (type ×
    * size bound), every supplier whose sale price for the part equals
    * that part's global minimum — the classic correlated-scalar-MIN
    * subquery, expressed as a per-group argmin join-back. Ties all
    * surface (same semantics as Q2's `= (SELECT min(...))`).
    *
    * Scale shape: the part slice is a broadcast sliver that prunes the
    * fact scan; the per-part MIN is a map-side-combined aggregate over
    * the surviving rows, joined back by (part, exact-DECIMAL price
    * equality) — never a global sort, never a window over the raw
    * fact. The winner set is distinct (part, supplier) pairs — a
    * sliver — and supplier context resolves by broadcast against it.
    */
  def minCostSupplier(part: DataFrame, supplier: DataFrame,
      lineitem: DataFrame, ptype: String = "PROMO",
      maxSize: Int = 5): DataFrame = {
    val sl = part
      .filter(col("p_type") === ptype && col("p_size") <= maxSize)
      .select(col("p_partkey"), col("p_name"))
    val li = lineitem
      .join(broadcast(sl.select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_suppkey"),
        dec(col("l_extendedprice"), 10, 2).as("price"))
    val mn = li.groupBy(col("l_partkey")).agg(min(col("price")).as("min_price"))
      .withColumnRenamed("l_partkey", "mn_partkey")
    val winners = li
      .join(mn, col("l_partkey") === col("mn_partkey")
        && col("price") === col("min_price"))
      .select(col("l_partkey"), col("l_suppkey"), col("min_price"))
      .distinct()
    winners
      .join(broadcast(sl), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"),
        col("s_acctbal"))), col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_name"), col("s_suppkey"),
        col("s_name"), col("s_acctbal"),
        col("min_price").cast("double").as("min_price"))
  }

  /** TPC-H Q21-shaped sole-late-supplier audit: per supplier, how many
    * MULTI-supplier orders that supplier alone shipped late (past
    * `graceDays` from the order date) — Q21's
    * EXISTS(other supplier) ∧ NOT EXISTS(other LATE supplier) pair.
    *
    * Scale shape: the double correlated EXISTS is re-expressed as ONE
    * pass of grouped counting — (order, supplier) pairs with a late
    * flag (map-side combined off the single orders⋈lineitem spine),
    * then the per-order supplier/late counts as whole-partition
    * WINDOWS over those partials (the [[smallQtyRevenue]] device; an
    * order-grain re-agg joined back reads cleaner but Catalyst plans
    * the shared subtree twice — two spine scans, measured). The
    * classic anti-join-per-EXISTS form also rescans the spine; this
    * runs it once and never moves more than (order, supplier, flag)
    * rows. Names resolve by broadcast at the supplier-grain result.
    */
  def lateAloneSuppliers(supplier: DataFrame, orders: DataFrame,
      lineitem: DataFrame, graceDays: Int = 60): DataFrame = {
    val pairs = lineitem
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max((col("l_shipdate") > col("o_orderdate") +
        expr(s"INTERVAL $graceDays DAYS")).cast("int")).as("late"))
    val byOrder = Window.partitionBy(col("l_orderkey"))
    pairs
      .withColumn("n_suppliers", count(lit(1)).over(byOrder))
      .withColumn("n_late", sum(col("late")).over(byOrder))
      .filter(col("late") === 1 &&
        col("n_suppliers") > 1 && col("n_late") === 1)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_waiting_orders"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_waiting_orders"))
  }

  /** Ranking-window breadth over per-user event history: ROW_NUMBER in
    * time order plus PERCENT_RANK / CUME_DIST / NTILE(4) / FIRST_VALUE
    * over the user's value distribution — the full ranking-function
    * family `q_window_running` (sum/row_number) deliberately left out.
    *
    * Scale shape: every window partitions by `user_id` — per-user
    * history is bounded (activity-grain, not corpus-grain), so this is
    * the canonical partitioned-window exchange: ONE shuffle on the
    * user key serves all five functions (two sort orders inside the
    * partition, no second exchange). Determinism: both sort orders
    * carry the `event_id` tiebreak, so rank/ntile boundaries are
    * total-ordered; percent_rank/cume_dist are single small-integer
    * divisions (IEEE-identical cross-engine).
    */
  def windowRankFuncs(events: DataFrame): DataFrame = {
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val byValue = Window.partitionBy(col("user_id"))
      .orderBy(col("value"), col("event_id"))
    events.select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("rn", row_number().over(byTime))
      .withColumn("quartile", ntile(4).over(byValue))
      .withColumn("val_pct", percent_rank().over(byValue))
      .withColumn("val_cume", cume_dist().over(byValue))
      .withColumn("first_val", first(col("value")).over(byTime))
      .drop("ts")
  }
}

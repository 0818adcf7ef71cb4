package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** The relational query surface (SURVEY.md §2.1).
  *
  * The reference exposes Iceberg tables as regular Postgres relations, so
  * its query capability is the full PG SQL executor on top of the AM scan
  * (pg_lakehouse_iceberg/src/iceberg_am.c, README.md "Join with local
  * tables"). Here the same surface is the DataFrame API: Catalyst plans
  * every one of these declaratively, so filter/projection pushdown, join
  * strategy selection (broadcast vs shuffle), partial aggregation and
  * whole-stage codegen all come for free and survive a 1000-executor
  * scale-up.
  *
  * Conventions for DuckDB-oracle parity (driver hash-compares values):
  *  - every computed column is aliased identically in Spark and SQL;
  *  - money/metric aggregates go through `Money` (exact integer-unit
  *    sums, divide-then-round once) — plain `round(sum(double), 2)` is
  *    order-nondeterministic in the last ulp and flips the hash at a
  *    half-cent boundary (observed on q21 in r02);
  *  - window/top-k orderings always carry a unique tie-break key.
  */
object Relational {

  /** q01: filter + projection — both must reach the parquet scan
    * (PushedFilters + ReadSchema in .explain). At 100 TB this is the
    * difference between scanning 3 columns vs 16. */
  def q01ScanFilterProject(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1995-06-01").cast("timestamp") &&
        col("l_discount") > lit(0.05))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")

  /** q02: TPC-H Q1-style grouped aggregation. Partial (map-side) agg +
    * single shuffle on the 6-ish distinct group keys. */
  def q02AggGroupBy(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        Money.sum2(col("l_extendedprice")).as("sum_base_price"),
        Money.sum2(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000).as("sum_disc_price"),
        avg(col("l_quantity")).as("avg_qty"), // exact int sum / count — unrounded (Money posture)
        Money.avg4(col("l_discount"), 100).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** q03: fact⋈dim with an explicit broadcast of the dimension — no
    * shuffle of the orders fact table at any scale. */
  def q03JoinBroadcast(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(Money.sum2(col("o_totalprice")).as("segment_total"),
        count(lit(1)).as("n_orders"))

  /** q04: 5-way star join (TPC-H Q5 shape). Dims (supplier, nation,
    * region, customer at TPC-H scale-ratio) broadcast; the only shuffle
    * is lineitem⋈orders on orderkey. */
  def q04JoinMultiway(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
    val ord = Tables.orders(s, d)
    val li = Tables.lineitem(s, d)
    val supp = Tables.supplier(s, d)
    val nat = Tables.nation(s, d)
    val reg = Tables.region(s, d)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy("n_name")
      .agg(Money.sum2(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000).as("revenue"))
  }

  /** q05: EXISTS → left-semi join (no row multiplication, early out). */
  def q05SemiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")

  /** q06: NOT EXISTS → left-anti join (customers with no urgent order). */
  def q06AntiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")

  /** q07: left outer join + null-safe aggregation. Orders are pre-
    * aggregated per customer BEFORE the join (r01 verdict suggestion):
    * the join shuffle then carries one row per customer instead of one
    * per order — at fact-table scale that is the difference between
    * shuffling the orders table and shuffling the customer cardinality.
    * Map-side partial aggregation shrinks the agg shuffle the same way. */
  def q07OuterJoin(s: SparkSession, d: String): DataFrame = {
    val perCust = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("__n"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("__cents"))
    Tables.customer(s, d)
      .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(col("c_custkey"),
        coalesce(col("__n"), lit(0L)).as("n_orders"),
        (coalesce(col("__cents"), lit(0L)) / 100.0).as("total_spent"))
  }

  /** q08: distinct aggregation (expand + two-phase agg under the hood). */
  def q08AggDistinct(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"))

  /** q09: top-N per group via two-phase row_number. o_orderstatus has ~3
    * values, so a single window over it would funnel the whole table
    * through 3 tasks (the r01 scale-killer). Phase 1 ranks within
    * (status, hash-shard) — 3×32-way parallel — and keeps ≤3 per shard;
    * phase 2 re-ranks the ≤ 3·32·3 finalists, reproducing the exact
    * global row_number. */
  def q09WindowTopK(s: SparkSession, d: String): DataFrame = {
    val w1 = Window.partitionBy("o_orderstatus", "shard")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val w2 = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .withColumn("shard", pmod(xxhash64(col("o_orderkey")), lit(32)))
      .withColumn("r1", row_number().over(w1))
      .filter(col("r1") <= 3)
      .withColumn("rn", row_number().over(w2))
      .filter(col("rn") <= 3)
      .select("o_orderstatus", "o_orderkey", "o_totalprice", "rn")
  }

  /** q10: running (cumulative) sum per customer over order time. */
  def q10WindowRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      // integer-cents window sum (exact in any accumulation order) /
      // one fixed division — a windowed double sum + round(,2) is
      // engine-dependent twice over (the q30/lake_migrate class)
      .withColumn("running_total",
        sum(round(col("o_totalprice") * 100).cast("long")).over(w) / 100.0)
      .select("o_custkey", "o_orderkey", "o_orderdate", "running_total")
  }

  /** q11: scalar subquery — filter against a global aggregate. Expressed
    * as a broadcast of the 1-row aggregate, not a driver collect. */
  def q11SubqueryScalar(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d)
    // price > global average, compared in exact integer cents (see Money)
    val stats = p.agg(
      sum(round(col("p_retailprice") * 100).cast("long")).as("__cents"),
      count(lit(1)).as("__n"))
    p.crossJoin(broadcast(stats))
      .filter(round(col("p_retailprice") * 100).cast("long") * col("__n") > col("__cents"))
      .select("p_partkey", "p_name", "p_retailprice")
  }

  /** q12: IN subquery → left-semi against the subquery result. */
  def q12SubqueryIn(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.customer(s, d).filter(col("c_mktsegment") === "AUTOMOBILE"),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .select("o_orderkey", "o_custkey", "o_totalprice")

  /** q13: global top-k — TakeOrderedAndProject, no full sort shuffle. */
  def q13SortLimit(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .limit(20)

  /** q14: conditional (pivot-style) aggregation via CASE. */
  def q14ConditionalAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        Money.sum2(when(col("l_discount") > 0.05, col("l_extendedprice")).otherwise(lit(0.0))).as("hi_disc_revenue"),
        Money.sum2(when(col("l_discount") <= 0.05, col("l_extendedprice")).otherwise(lit(0.0))).as("lo_disc_revenue"),
        count(lit(1)).as("n"))

  /** q15: string functions — all codegen'd builtins, no UDFs. */
  def q15StringFuncs(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .filter(col("p_name").like("%widget%"))
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_upper"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        length(col("p_type")).as("type_len"),
        // concat (not concat_ws): matches the oracle's `||` NULL semantics
        concat(col("p_brand"), lit("-"), col("p_type")).as("brand_type"))

  /** q16: date/time extraction + grouping. */
  def q16DateFuncs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).as("order_year"),
        month(col("o_orderdate")).as("order_month"))
      .agg(count(lit(1)).as("n_orders"),
        Money.sum2(col("o_totalprice")).as("month_total"))

  /** q17: UNION + dedup (distinct = shuffle on the row value). */
  def q17SetOps(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      .union(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
      .distinct()

  /** q18: HAVING — post-aggregation filter. */
  def q18Having(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        Money.sum2(col("o_totalprice")).as("total"))
      .filter(col("n_orders") > 5)

  /** q19: ROLLUP grouping sets. */
  def q19GroupingSets(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("n"))

  /** q20: high-cardinality agg on the events stream table (the skew
    * candidate — AQE skew handling applies at scale). */
  def q20SkewAgg(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n_events"),
        Money.sum2(col("value"), 1000000L).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))

  /** q21: correlated aggregate comparison — customers whose spend exceeds
    * 2× their own nation's average spend. Expressed as two aggregate
    * levels + a broadcast join of the tiny per-nation frame; Catalyst
    * plans the correlated SQL form identically (decorrelation to joins),
    * so the DataFrame shape IS the decorrelated plan. Rounding both the
    * comparison operands the same way on both engines keeps the boundary
    * rows deterministic. */
  def q21CorrelatedAgg(s: SparkSession, d: String): DataFrame = {
    // exact integer-cents arithmetic end to end: double summation order is
    // nondeterministic in the last ulp, and a customer sitting exactly on
    // the 2×-average boundary flipped the gate (found by a flaky r02 run).
    // Long sums are order-independent, so both the filter and the
    // displayed values are bit-stable on both engines.
    val perCust = Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_custkey"), col("c_nationkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val perNation = perCust.groupBy(col("c_nationkey"))
      .agg(sum(col("cents")).as("nation_cents"), count(lit(1)).as("n_cust"))
    perCust.join(broadcast(perNation), "c_nationkey")
      // spend > 2 × nation average, entirely in integer space
      .filter(col("cents") * col("n_cust") > col("nation_cents") * 2)
      .select(col("c_custkey"),
        (col("cents") / 100.0).as("spend"),
        (col("nation_cents") / col("n_cust") / 100.0).as("nation_avg"))
      .orderBy("c_custkey")
  }

  /** q22: approximate distinct (HyperLogLog++) next to the exact count —
    * the cardinality sketch every 100 TB profiling pass uses (exact
    * distinct shuffles every key; the sketch is mergeable map-side state).
    * Sketch values are engine-specific → rows-only gate; RelationalSpec
    * bounds the relative error against the exact count. */
  def q22ApproxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
      .orderBy("event_type")

  /** q23: AS-OF join — for every purchase, the most recent click by the
    * same user at or before it (the market-data/attribution join the
    * brief names as an operator Spark lacks natively). Composed from
    * existing ops — preference (a) of the brief's custom-operator order:
    * both sides union into one stream tagged right-before-left, ONE
    * shuffle partitions by user, and a running `last(ignoreNulls)` over
    * (ts, tag) carries the latest right row forward to each left row.
    * No per-row subquery, no range self-join: O(n log n) inside each
    * user partition, the canonical distributed as-of shape. Timestamps
    * compare in epoch-µs integers so both engines agree at the
    * nanosecond-truncation boundary; the right side is pre-aggregated
    * to one row per (user, µs) so ties are deterministic. [oracle:
    * DuckDB's native ASOF LEFT JOIN] */
  def q23AsofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"), col("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy("user_id", "ts_us").agg(max(col("value")).as("v"))
    val tagged = clicks
      .select(col("user_id"), col("ts_us"), lit(0).as("tag"),
        lit(null).cast("bigint").as("event_id"),
        struct(col("ts_us").as("mts"), col("v").as("mv")).as("m"))
      .unionByName(purchases
        .select(col("user_id"), col("ts_us"), lit(1).as("tag"), col("event_id"),
          lit(null).cast("struct<mts:bigint,mv:double>").as("m")))
    // right (tag 0) sorts before left (tag 1) at equal ts → "at or before"
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us").asc, col("tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged.withColumn("lastm", last(col("m"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("user_id"),
        col("lastm.mts").as("click_ts_us"), col("lastm.mv").as("click_value"))
      .orderBy("event_id")
  }

  /** q24: range (interval) join — lineitems matched into promotion
    * windows [lo, hi] derived from a deterministic subset of orders (the
    * brief's second named missing operator). The naive plan is a
    * cartesian BroadcastNestedLoopJoin re-checking BETWEEN per pair; the
    * scale shape BUCKETIZES the time axis: each range explodes to the
    * few buckets it covers (bounded by rangeLen/bucketDays), the probe
    * side maps to its single bucket, candidates meet in an ordinary
    * equi-shuffle on bucket, and the exact BETWEEN re-check runs on
    * candidates only — candidate-generation-then-verify, exactly like
    * the LSH families, with no O(n·m) pair space. [oracle] */
  def q24RangeJoin(s: SparkSession, d: String): DataFrame = {
    val bucketDays = 16
    val epoch = lit("1990-01-01").cast("date")
    val ranges = Tables.orders(s, d)
      .filter(col("o_orderkey") % 100 === 0)
      .select(col("o_orderkey").as("promo_id"),
        datediff(col("o_orderdate"), epoch).as("lo"),
        (datediff(col("o_orderdate"), epoch) + col("o_orderkey") % 14).as("hi"))
    val items = Tables.lineitem(s, d)
      .select(col("l_quantity"), datediff(col("l_shipdate"), epoch).as("day"))
      .withColumn("bucket", floor(col("day") / bucketDays))
    val rangeBuckets = ranges.withColumn("bucket",
      explode(sequence(floor(col("lo") / bucketDays), floor(col("hi") / bucketDays))))
    items.join(rangeBuckets, "bucket")
      .filter(col("day") >= col("lo") && col("day") <= col("hi"))
      .groupBy("promo_id")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity")).cast("long").as("total_qty"))
      .orderBy("promo_id")
  }

  /** q25: approximate quantiles (Spark's GK-sketch `percentile_approx`)
    * next to the exact percentiles — the profiling companion to q22's
    * HLL: the sketch is mergeable map-side state, while the exact path
    * funnels each group's values through a sort. Sketch outputs are
    * engine-specific → rows-only gate; RelationalSpec bounds the sketch
    * against the exact answer. */
  def q25ApproxQuantile(s: SparkSession, d: String): DataFrame = {
    val pcts = array(lit(0.5), lit(0.95))
    Tables.events(s, d).groupBy("event_type").agg(
      round(element_at(percentile_approx(col("value"), pcts, lit(10000)), 1), 2)
        .as("p50_approx"),
      round(element_at(percentile_approx(col("value"), pcts, lit(10000)), 2), 2)
        .as("p95_approx"),
      round(element_at(expr("percentile(value, array(0.5D, 0.95D))"), 1), 2)
        .as("p50_exact"),
      round(element_at(expr("percentile(value, array(0.5D, 0.95D))"), 2), 2)
        .as("p95_exact"))
      .orderBy("event_type")
  }

  /** q26: FUNNEL ANALYSIS — the classic product-analytics query a PG
    * user runs over an AM events table: users who did view →
    * (later) click → (later) purchase, counted per stage. Three chained
    * min-ts aggregations on the SAME key: the user-id shuffle happens
    * once and the follow-up joins/aggs are co-partitioned (no
    * broadcast of per-user frames — at 100 TB the per-user state is
    * corpus-sized; only the final 3-row stage table leaves the
    * cluster). */
  def q26Funnel(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_type"), col("ts"))
      // ONE user-key shuffle: every stage's agg and join below reuses
      // this partitioning instead of re-shuffling the event stream
      .repartition(col("user_id"))
    val t1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val t2 = ev.filter(col("event_type") === "click")
      .join(t1, "user_id").filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val t3 = ev.filter(col("event_type") === "purchase")
      .join(t2, "user_id").filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    def stage(df: DataFrame, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(name).as("stage"), col("n_users"))
    stage(t1, "1_view")
      .unionByName(stage(t2, "2_click"))
      .unionByName(stage(t3, "3_purchase"))
  }

  /** q27: COHORT RETENTION — users bucketed by their first-activity day,
    * distinct actives counted per (cohort, weeks-since-cohort). One
    * user-key aggregate for the cohort frame, a co-partitioned join
    * back (per-user state never broadcasts), then the small
    * (cohort × offset) aggregate. Integer week offsets via floor
    * division so both engines bucket identically. */
  def q27Retention(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val cohort = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
    ev.join(cohort, "user_id")
      .withColumn("week_offset",
        floor(datediff(col("day"), col("cohort_day")) / 7.0))
      .groupBy("cohort_day", "week_offset")
      .agg(countDistinct(col("user_id")).as("n_active"))
  }

  /** q28: BATCH SESSIONIZATION — the gap rule (a >30-minute silence
    * starts a new session), the batch twin of stream_sessionize: lag
    * over (user, ts) flags session starts, a running sum numbers them,
    * then per-user session stats. Window partitioning is by USER — at
    * 100 TB each user's history sorts within its partition, no global
    * sort, and AQE splits a skewed power-user partition. */
  def q28Sessionize(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val sess = Tables.events(s, d)
      .select(col("user_id"), col("ts"))
      .withColumn("gap_s",
        col("ts").cast("long") - lag(col("ts").cast("long"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("gap_s").isNull || col("gap_s") > 1800L, 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(byUser))
    sess.groupBy("user_id", "sess_id")
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n")).as("n_events"),
        max(col("n")).as("max_session_events"))
  }

  /** q29: JSON PROPERTY EXTRACTION — semi-structured payload analytics
    * (PG users query jsonb columns; the AM surfaces them as text):
    * `props` carries `{"k": N}`, extracted with each engine's JSON path
    * function and aggregated per event type. Map-only extraction inside
    * codegen + one small aggregate. */
  def q29JsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        avg(col("k")).as("avg_k"), // exact long sum / count — unrounded
        max(col("k")).as("max_k"),
        sum(when(col("k") >= 50, 1L).otherwise(0L)).as("n_high"))

  /** q30: MOVING AVERAGE with an explicit ROWS frame — the one window
    * semantics class the surface lacked (q10's running sum uses the
    * default RANGE frame): 7-row trailing mean over the daily revenue
    * series per event type. The window partitions by type and the
    * per-type series is DAYS-sized (bounded by the calendar, not the
    * corpus), so the sort under each window is tiny at any SF — the
    * heavy lifting is the day-level pre-aggregation, one ordinary
    * hash aggregate. */
  def q30MovingAvg(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ma7 is built from the INTEGER-unit daily sums, not the double
    // revenue: a windowed avg of doubles is engine-dependent twice over
    // (summation order inside the frame, then the 2-dp rounding tie the
    // r11 lake_migrate red exposed). Long window sums are exact in any
    // order; the two divisions are fixed-operand IEEE ops the oracle
    // mirrors in the same order — bit-identical on any dataset.
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(Money.sumUnits(col("value"), 1000000L).as("units"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-6, Window.currentRow)
    daily.select(col("event_type"), col("day"),
      (col("units") / 1000000.0).as("revenue"),
      (sum(col("units")).over(w) / count(lit(1)).over(w) / 1000000.0).as("ma7"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_moving_avg" -> (q30MovingAvg _),
    "q26_funnel" -> (q26Funnel _),
    "q27_retention" -> (q27Retention _),
    "q28_sessionize" -> (q28Sessionize _),
    "q29_json_extract" -> (q29JsonExtract _),
    "q25_approx_quantile" -> (q25ApproxQuantile _),
    "q23_asof_join" -> (q23AsofJoin _),
    "q24_range_join" -> (q24RangeJoin _),
    "q21_correlated_agg" -> (q21CorrelatedAgg _),
    "q22_approx_distinct" -> (q22ApproxDistinct _),
    "q01_scan_filter_project" -> (q01ScanFilterProject _),
    "q02_agg_groupby" -> (q02AggGroupBy _),
    "q03_join_broadcast" -> (q03JoinBroadcast _),
    "q04_join_multiway" -> (q04JoinMultiway _),
    "q05_semi_join" -> (q05SemiJoin _),
    "q06_anti_join" -> (q06AntiJoin _),
    "q07_outer_join" -> (q07OuterJoin _),
    "q08_agg_distinct" -> (q08AggDistinct _),
    "q09_window_topk" -> (q09WindowTopK _),
    "q10_window_running" -> (q10WindowRunning _),
    "q11_subquery_scalar" -> (q11SubqueryScalar _),
    "q12_subquery_in" -> (q12SubqueryIn _),
    "q13_sort_limit" -> (q13SortLimit _),
    "q14_conditional_agg" -> (q14ConditionalAgg _),
    "q15_string_funcs" -> (q15StringFuncs _),
    "q16_date_funcs" -> (q16DateFuncs _),
    "q17_set_ops" -> (q17SetOps _),
    "q18_having" -> (q18Having _),
    "q19_grouping_sets" -> (q19GroupingSets _),
    "q20_skew_agg" -> (q20SkewAgg _))

  /** DuckDB-equivalent SQL, column-aliased identically (driver compare
    * sorts columns by name then hashes values). */
  val oracles: Map[String, String] = Map(
    "q23_asof_join" ->
      """WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
                    FROM events WHERE event_type = 'purchase'),
              r AS (SELECT user_id, epoch_us(ts) AS ts_us, max(value) AS v
                    FROM events WHERE event_type = 'click' GROUP BY 1, 2)
         SELECT l.event_id, l.user_id, r.ts_us AS click_ts_us, r.v AS click_value
         FROM l ASOF LEFT JOIN r
           ON l.user_id = r.user_id AND l.ts_us >= r.ts_us
         ORDER BY l.event_id""",
    "q24_range_join" ->
      """WITH r AS (SELECT o_orderkey AS promo_id,
                           datediff('day', DATE '1990-01-01', o_orderdate) AS lo,
                           datediff('day', DATE '1990-01-01', o_orderdate) + o_orderkey % 14 AS hi
                    FROM orders WHERE o_orderkey % 100 = 0)
         SELECT r.promo_id, count(*) AS n_items,
                CAST(sum(l.l_quantity) AS BIGINT) AS total_qty
         FROM lineitem l JOIN r
           ON datediff('day', DATE '1990-01-01', l.l_shipdate) BETWEEN r.lo AND r.hi
         GROUP BY r.promo_id ORDER BY r.promo_id""",
    "q21_correlated_agg" ->
      """WITH per_cust AS (
           SELECT c_custkey, c_nationkey,
                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
           FROM customer JOIN orders ON c_custkey = o_custkey
           GROUP BY c_custkey, c_nationkey),
         per_nation AS (
           SELECT c_nationkey,
                  CAST(sum(cents) AS BIGINT) AS nation_cents,
                  count(*) AS n_cust
           FROM per_cust GROUP BY c_nationkey)
         SELECT p.c_custkey,
                p.cents / 100.0 AS spend,
                n.nation_cents / n.n_cust / 100.0 AS nation_avg
         FROM per_cust p JOIN per_nation n ON p.c_nationkey = n.c_nationkey
         WHERE p.cents * n.n_cust > n.nation_cents * 2""",
    "q01_scan_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1995-06-01' AND l_discount > 0.05""",
    "q02_agg_groupby" ->
      """SELECT l_returnflag, l_linestatus,
                round(sum(l_quantity), 2) AS sum_qty,
                CAST(sum(CAST(round((l_extendedprice) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_base_price,
                CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT)) AS BIGINT) / 10000.0 AS sum_disc_price,
                avg(l_quantity) AS avg_qty,
                CAST(sum(CAST(round((l_discount) * 100) AS BIGINT)) AS BIGINT) / count(*) / 100.0 AS avg_disc,
                count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         GROUP BY l_returnflag, l_linestatus""",
    "q03_join_broadcast" ->
      """SELECT c_mktsegment, CAST(sum(CAST(round((o_totalprice) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS segment_total,
                count(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""",
    "q04_join_multiway" ->
      """SELECT n_name,
                CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
         GROUP BY n_name""",
    "q05_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""",
    "q06_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderpriority = '1-URGENT')""",
    "q07_outer_join" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
                coalesce(CAST(sum(CAST(round((o_totalprice) * 100) AS BIGINT)) AS BIGINT), 0) / 100.0 AS total_spent
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey""",
    "q08_agg_distinct" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_customers,
                count(*) AS n_orders
         FROM orders GROUP BY o_orderstatus""",
    "q09_window_topk" ->
      """SELECT o_orderstatus, o_orderkey, o_totalprice, rn FROM (
           SELECT o_orderstatus, o_orderkey, o_totalprice,
                  CAST(row_number() OVER (PARTITION BY o_orderstatus
                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn
           FROM orders) t
         WHERE rn <= 3""",
    "q10_window_running" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                       OVER (PARTITION BY o_custkey
                             ORDER BY o_orderdate ASC, o_orderkey ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) / 100.0 AS running_total
         FROM orders""",
    "q11_subquery_scalar" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
         WHERE CAST(round(p_retailprice * 100) AS BIGINT) *
               (SELECT count(*) FROM part)
               > (SELECT CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT)
                  FROM part)""",
    "q12_subquery_in" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         WHERE o_custkey IN (SELECT c_custkey FROM customer
                             WHERE c_mktsegment = 'AUTOMOBILE')""",
    "q13_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
         ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
         LIMIT 20""",
    "q14_conditional_agg" ->
      """SELECT l_returnflag,
                CAST(sum(CAST(round((CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0.0 END) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS hi_disc_revenue,
                CAST(sum(CAST(round((CASE WHEN l_discount <= 0.05 THEN l_extendedprice ELSE 0.0 END) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS lo_disc_revenue,
                count(*) AS n
         FROM lineitem GROUP BY l_returnflag""",
    "q15_string_funcs" ->
      """SELECT p_partkey, upper(p_brand) AS brand_upper,
                substring(p_name, 1, 8) AS name_prefix,
                CAST(length(p_type) AS INTEGER) AS type_len,
                p_brand || '-' || p_type AS brand_type
         FROM part WHERE p_name LIKE '%widget%'""",
    "q16_date_funcs" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
                CAST(month(o_orderdate) AS INTEGER) AS order_month,
                count(*) AS n_orders,
                CAST(sum(CAST(round((o_totalprice) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS month_total
         FROM orders GROUP BY 1, 2""",
    "q17_set_ops" ->
      """SELECT c_nationkey AS nationkey FROM customer
         UNION
         SELECT s_nationkey AS nationkey FROM supplier""",
    "q18_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
                CAST(sum(CAST(round((o_totalprice) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total
         FROM orders GROUP BY o_custkey HAVING count(*) > 5""",
    "q19_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
                round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "q20_skew_agg" ->
      """SELECT event_type, date_trunc('hour', ts) AS hour,
                count(*) AS n_events, CAST(sum(CAST(round((value) * 1000000) AS BIGINT)) AS BIGINT) / 1000000.0 AS sum_value,
                count(DISTINCT user_id) AS n_users
         FROM events GROUP BY 1, 2""",
    "q30_moving_avg" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
                  CAST(sum(CAST(round((value) * 1000000) AS BIGINT)) AS BIGINT) AS units
           FROM events GROUP BY 1, 2)
         SELECT event_type, day, units / 1000000.0 AS revenue,
                CAST(sum(units) OVER w AS BIGINT)
                  / CAST(count(*) OVER w AS BIGINT) / 1000000.0 AS ma7
         FROM daily
         WINDOW w AS (PARTITION BY event_type ORDER BY day
                      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)""",
    "q26_funnel" ->
      """WITH base AS (
           SELECT user_id, event_type, ts FROM events
           WHERE event_type IN ('view', 'click', 'purchase')),
         t1 AS (SELECT user_id, min(ts) AS t1 FROM base
                WHERE event_type = 'view' GROUP BY 1),
         t2 AS (SELECT b.user_id, min(b.ts) AS t2 FROM base b
                JOIN t1 USING (user_id)
                WHERE b.event_type = 'click' AND b.ts > t1.t1 GROUP BY 1),
         t3 AS (SELECT b.user_id, min(b.ts) AS t3 FROM base b
                JOIN t2 USING (user_id)
                WHERE b.event_type = 'purchase' AND b.ts > t2.t2 GROUP BY 1)
         SELECT '1_view' AS stage, count(*) AS n_users FROM t1
         UNION ALL
         SELECT '2_click' AS stage, count(*) AS n_users FROM t2
         UNION ALL
         SELECT '3_purchase' AS stage, count(*) AS n_users FROM t3""",
    "q28_sessionize" ->
      """WITH w AS (
           SELECT user_id, ts,
                  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                         OR date_diff('second',
                              lag(ts) OVER (PARTITION BY user_id ORDER BY ts),
                              ts) > 1800
                       THEN 1 ELSE 0 END AS new_sess
           FROM events),
         x AS (
           SELECT user_id,
                  sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts) AS sess_id
           FROM w),
         g AS (SELECT user_id, sess_id, count(*) AS n FROM x GROUP BY 1, 2)
         SELECT user_id, count(*) AS n_sessions,
                CAST(sum(n) AS BIGINT) AS n_events,
                max(n) AS max_session_events
         FROM g GROUP BY 1""",
    "q29_json_extract" ->
      """WITH e AS (
           SELECT event_type,
                  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
           FROM events)
         SELECT event_type, count(*) AS n_events,
                avg(k) AS avg_k, max(k) AS max_k,
                CAST(sum(CASE WHEN k >= 50 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_high
         FROM e GROUP BY 1""",
    "q27_retention" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
         cohort AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1)
         SELECT cohort_day,
                CAST(floor(date_diff('day', cohort_day, day) / 7.0) AS BIGINT)
                  AS week_offset,
                count(DISTINCT ev.user_id) AS n_active
         FROM ev JOIN cohort USING (user_id)
         GROUP BY 1, 2""")
}

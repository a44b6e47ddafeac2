package graft.ops

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Group E — window functions (SURVEY.md §2.1 E). Sort-based WindowExec:
  * one shuffle on the partition key, then per-partition sort. Every ORDER
  * BY inside a frame carries a unique tie-break key so ranks/offsets are
  * deterministic.
  *
  * Scale note: the only single-partition window here is win_ntile_percent
  * (global quartiles — semantically unavoidable); all others partition by
  * a high-cardinality key and distribute evenly.
  */
object WindowOps extends OpGroup {
  import graft.Tables.dec2

  val ops: Seq[Op] = Seq(
    Op("win_rownum_topk",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
        Tables.t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
          .orderBy("o_custkey", "rn")
      },
      Some("""
        SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
            CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
          FROM orders
        ) WHERE rn <= 3
        ORDER BY o_custkey, rn
      """.trim)),

    Op("win_rank_dense",
      (s, dir) => {
        val w = Window.partitionBy("p_brand").orderBy(desc("p_retailprice"))
        Tables.t(s, dir, "part")
          .select(col("p_brand"), col("p_partkey"),
            rank().over(w).cast("int").as("rnk"),
            dense_rank().over(w).cast("int").as("drnk"))
          .orderBy("p_brand", "p_partkey")
      },
      Some("""
        SELECT p_brand, p_partkey,
          CAST(RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS INT) AS rnk,
          CAST(DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS INT) AS drnk
        FROM part ORDER BY p_brand, p_partkey
      """.trim)),

    Op("win_lag_lead",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, dir)
          .select(col("event_id"), col("user_id"),
            (col("value") - lag(col("value"), 1).over(w)).as("val_diff"),
            lead(col("event_type"), 1).over(w).as("next_type"))
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id, user_id,
          value - LAG(value, 1) OVER w AS val_diff,
          LEAD(event_type, 1) OVER w AS next_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
        ORDER BY event_id
      """.trim)),

    Op("win_running_sum",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            sum(dec2(col("o_totalprice"))).over(w).cast(DecimalType(18, 2)).cast("double").as("run_total"))
          .orderBy("o_custkey", "o_orderdate", "o_orderkey")
      },
      Some("""
        SELECT o_custkey, o_orderkey, o_orderdate,
          CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(18,2)) AS DOUBLE) AS run_total
        FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey
      """.trim)),

    // 7-point moving average over the global daily series (365-ish rows
    // after the pre-aggregation, so the single-partition window is cheap).
    Op("win_moving_avg",
      (s, dir) => {
        val daily = Tables.t(s, dir, "orders")
          .groupBy(date_trunc("day", col("o_orderdate")).cast("timestamp_ntz").as("day"))
          .agg(sum(dec2(col("o_totalprice"))).as("total"))
        val w = Window.orderBy("day").rowsBetween(-6, 0)
        daily.select(col("day"),
          round(sum(col("total")).over(w).cast("double") / count(lit(1)).over(w), 2)
            .as("avg7"))
          .orderBy("day")
      },
      Some("""
        SELECT day,
          CAST(ROUND(CAST(CAST(CAST(SUM(total) OVER w AS DOUBLE) / COUNT(*) OVER w AS VARCHAR) AS DECIMAL(38,15)), 2) AS DOUBLE) AS avg7
        FROM (
          SELECT date_trunc('day', o_orderdate) AS day,
            SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total
          FROM orders GROUP BY 1
        )
        WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        ORDER BY day
      """.trim)),

    Op("win_range_frame",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_totalprice")
          .rangeBetween(-1000, 1000)
        Tables.t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            count(lit(1)).over(w).as("n_near"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""
        SELECT o_custkey, o_orderkey, o_totalprice,
          COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                         RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS n_near
        FROM orders ORDER BY o_custkey, o_orderkey
      """.trim)),

    Op("win_ntile_percent",
      (s, dir) => {
        val w = Window.orderBy("c_acctbal", "c_custkey")
        Tables.t(s, dir, "customer")
          .select(col("c_custkey"),
            ntile(4).over(w).cast("int").as("quartile"),
            round(percent_rank().over(w), 4).as("pr"),
            round(cume_dist().over(w), 4).as("cd"))
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey,
          CAST(NTILE(4) OVER w AS INT) AS quartile,
          CAST(ROUND(CAST(CAST(PERCENT_RANK() OVER w AS VARCHAR) AS DECIMAL(38,15)), 4) AS DOUBLE) AS pr,
          CAST(ROUND(CAST(CAST(CUME_DIST() OVER w AS VARCHAR) AS DECIMAL(38,15)), 4) AS DOUBLE) AS cd
        FROM customer
        WINDOW w AS (ORDER BY c_acctbal, c_custkey)
        ORDER BY c_custkey
      """.trim)),

    Op("win_first_last",
      (s, dir) => {
        val w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"),
            first(col("c_name")).over(w).as("poorest"),
            last(col("c_name")).over(w).as("richest"))
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, c_nationkey,
          FIRST_VALUE(c_name) OVER w AS poorest,
          LAST_VALUE(c_name) OVER w AS richest
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY c_custkey
      """.trim)),

    // Cumulative distinct users per (event_type, day) — COUNT(DISTINCT)
    // OVER is unsupported in Spark AND DuckDB, and the naive rewrite
    // (per-row set state) cannot distribute. The scalable rewrite IS the
    // op: a user is "new" only on its first day per type (one
    // shuffle-by-(type, user) aggregate), daily new-user counts then
    // cumulate with an ordinary running-sum window over the |types|×|days|
    // aggregated rows — never over raw events. The growth-curve /
    // cumulative-reach query every engagement dashboard runs; at 100 TB
    // the only corpus-sized shuffle is the first-seen aggregate.
    Op("win_cumulative_distinct",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("event_type"), col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd").as("day"))
        val firstSeen = ev.groupBy("event_type", "user_id")
          .agg(min("day").as("first_day"))
        val newPerDay = firstSeen
          .groupBy(col("event_type"), col("first_day").as("day"))
          .agg(count(lit(1)).as("n_new_users"))
        val perDay = ev.groupBy("event_type", "day")
          .agg(count(lit(1)).as("n_events"))
        val w = Window.partitionBy("event_type").orderBy("day")
        perDay.join(newPerDay, Seq("event_type", "day"), "left")
          .withColumn("n_new_users", coalesce(col("n_new_users"), lit(0L)))
          .withColumn("cum_distinct_users", sum("n_new_users").over(w))
          .select("event_type", "day", "n_events", "n_new_users", "cum_distinct_users")
          .orderBy("event_type", "day")
      },
      Some("""
        WITH ev AS (
          SELECT event_type, user_id,
            strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day
          FROM events),
        first_seen AS (
          SELECT event_type, user_id, MIN(day) AS first_day
          FROM ev GROUP BY 1, 2),
        new_per_day AS (
          SELECT event_type, first_day AS day, COUNT(*) AS n_new_users
          FROM first_seen GROUP BY 1, 2),
        per_day AS (
          SELECT event_type, day, COUNT(*) AS n_events FROM ev GROUP BY 1, 2)
        SELECT p.event_type, p.day, p.n_events,
          COALESCE(n.n_new_users, 0) AS n_new_users,
          CAST(SUM(COALESCE(n.n_new_users, 0)) OVER (
            PARTITION BY p.event_type ORDER BY p.day) AS BIGINT) AS cum_distinct_users
        FROM per_day p LEFT JOIN new_per_day n USING (event_type, day)
        ORDER BY p.event_type, p.day
      """.trim)),

    // Gaps-and-islands: per-user runs of CONSECUTIVE active days via the
    // classic date-minus-row_number group key. Distinct (user, day) first
    // (shrinks raw events to active-day granularity), then one window
    // partitioned by user_id — high-cardinality, distributes evenly; no
    // global pass anywhere. The island report (count/longest/total) is the
    // engagement-streak shape behind ts_longest_streak, generalized to all
    // islands per user.
    Op("win_gaps_islands",
      (s, dir) => {
        val days = Tables.events(s, dir)
          .select(col("user_id"), date_trunc("day", col("ts")).cast("date").as("d"))
          .distinct()
        val w = Window.partitionBy("user_id").orderBy("d")
        days
          .withColumn("grp", date_sub(col("d"), row_number().over(w)))
          .groupBy("user_id", "grp")
          .agg(count(lit(1)).as("len"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_islands"),
            sum("len").as("active_days"),
            max("len").as("max_island"))
          .orderBy("user_id")
      },
      Some("""
        WITH days AS (
          SELECT DISTINCT user_id,
            CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d
          FROM events),
        g AS (
          SELECT user_id, d,
            d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS INT) AS grp
          FROM days),
        i AS (SELECT user_id, grp, COUNT(*) AS len FROM g GROUP BY 1, 2)
        SELECT user_id, COUNT(*) AS n_islands,
          CAST(SUM(len) AS BIGINT) AS active_days, MAX(len) AS max_island
        FROM i GROUP BY 1 ORDER BY 1
      """.trim)),

    // Pareto / ABC classification: rank customers by revenue desc, running
    // revenue share, class A = first 50% of revenue mass, B = next 30%,
    // C = tail. The global-ordered window runs on the CUSTOMER-level
    // aggregate (|customers| rows, not raw orders) — the same
    // semantically-unavoidable global sort as win_ntile_percent, paid on
    // the smallest possible frame. Revenue cumsum in exact DECIMAL; the
    // share comparison divides identical exact doubles on both engines so
    // the class boundary is deterministic.
    Op("win_pareto_abc",
      (s, dir) => {
        val cust = Tables.t(s, dir, "orders")
          .groupBy("o_custkey")
          .agg(sum(dec2(col("o_totalprice"))).cast(DecimalType(18, 2)).as("rev"))
        val wc = Window.orderBy(desc("rev"), asc("o_custkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val total = cust.agg(sum(col("rev")).cast(DecimalType(18, 2)).as("total_rev"))
        cust.crossJoin(broadcast(total))
          .withColumn("cum_share",
            sum("rev").over(wc).cast("double") / col("total_rev").cast("double"))
          .withColumn("abc",
            when(col("cum_share") <= 0.5, "A")
              .when(col("cum_share") <= 0.8, "B").otherwise("C"))
          .groupBy("abc")
          .agg(count(lit(1)).as("n_customers"),
            sum("rev").cast(DecimalType(18, 2)).cast("double").as("rev_mass"))
          .orderBy("abc")
      },
      Some("""
        WITH cust AS (
          SELECT o_custkey,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev
          FROM orders GROUP BY 1),
        c AS (
          SELECT o_custkey, rev,
            CAST(SUM(rev) OVER (ORDER BY rev DESC, o_custkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
              / CAST((SELECT CAST(SUM(rev) AS DECIMAL(18,2)) FROM cust) AS DOUBLE)
              AS cum_share
          FROM cust),
        k AS (
          SELECT CASE WHEN cum_share <= 0.5 THEN 'A'
                      WHEN cum_share <= 0.8 THEN 'B' ELSE 'C' END AS abc, rev
          FROM c)
        SELECT abc, COUNT(*) AS n_customers,
          CAST(CAST(SUM(rev) AS DECIMAL(18,2)) AS DOUBLE) AS rev_mass
        FROM k GROUP BY 1 ORDER BY 1
      """.trim)),

    // TIME-based RANGE frame: for every event, the count and exact-
    // decimal value mass of same-type events in the trailing hour —
    // `RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW` over
    // event time. The batch twin of a sliding streaming aggregate, and a
    // different engine surface from win_range_frame's NUMERIC range:
    // the frame boundary is calendar arithmetic on the ORDER column.
    // RANGE includes all ts-peers, so same-µs ties cannot make the
    // result order-dependent; the mass is summed in DECIMAL inside the
    // frame. One shuffle by event_type, like every ts_* window.
    Op("win_range_time_frame",
      (s, dir) => {
        Tables.events(s, dir)
          .selectExpr("event_id", "event_type",
            """count(1) OVER (PARTITION BY event_type ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS n_1h""",
            """CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
               PARTITION BY event_type ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
               AS DOUBLE) AS val_1h""")
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id, event_type,
          COUNT(*) OVER w AS n_1h,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS val_1h
        FROM (SELECT event_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value
              FROM events)
        WINDOW w AS (PARTITION BY event_type ORDER BY ts
          RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        ORDER BY event_id
      """.trim)),

    // Maximum drawdown of the daily-revenue series per priority class —
    // the running-peak risk metric (finance's worst-case-decline, equally
    // the capacity-planning "how far below high-water did throughput
    // fall"). ALL-INTEGER: revenue in cents, running peak via a max
    // window over the day-level aggregate, drawdown in basis points by
    // integer division — no float anywhere, so cross-engine equality is
    // structural AT ANY SCALE: the (peak - cents) · 10⁴ intermediate is
    // widened to DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) because in
    // bare BIGINT it overflows once daily per-priority revenue passes
    // ~9.2e14 cents — Spark would wrap silently while DuckDB errors
    // (round-8 advice). The quotient is bps ≤ 10⁴, back in BIGINT. The
    // argmax day rides an injective ord dd·2²⁰ + dayidx (bps ≤ 10⁴ and
    // day index < 2²⁰ by domain, so the fields can't collide), giving a
    // latest-day tie-break on both engines.
    Op("win_drawdown",
      (s, dir) => {
        val daily = Tables.t(s, dir, "orders")
          .groupBy(col("o_orderpriority"),
            date_trunc("day", col("o_orderdate")).cast("timestamp_ntz").as("d"))
          .agg(sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")).as("cents"))
        val w = Window.partitionBy("o_orderpriority").orderBy("d")
          .rowsBetween(Window.unboundedPreceding, 0)
        daily
          .withColumn("peak", max(col("cents")).over(w))
          .withColumn("dd_bps",
            expr("CAST(CAST(peak - cents AS DECIMAL(38,0)) * 10000 DIV peak AS BIGINT)"))
          .withColumn("di", expr("datediff(CAST(d AS DATE), DATE '1990-01-01')"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_days"),
            max(col("peak")).as("peak_cents"),
            max(col("dd_bps")).as("max_dd_bps"),
            max_by(col("d"), col("dd_bps") * 1048576 + col("di")).as("worst_day"))
          .select(col("o_orderpriority"), col("n_days"), col("peak_cents"),
            col("max_dd_bps"), col("worst_day"))
          .orderBy("o_orderpriority")
      },
      Some("""
        WITH daily AS (
          SELECT o_orderpriority, date_trunc('day', o_orderdate) AS d,
            CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
          FROM orders GROUP BY 1, 2),
        p AS (
          SELECT o_orderpriority, d, cents,
            CAST(MAX(cents) OVER (PARTITION BY o_orderpriority ORDER BY d
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS peak
          FROM daily),
        dd AS (
          SELECT o_orderpriority, d, peak,
            CAST(CAST(peak - cents AS HUGEINT) * 10000 // peak AS BIGINT) AS dd_bps,
            date_diff('day', DATE '1990-01-01', CAST(d AS DATE)) AS di
          FROM p)
        SELECT o_orderpriority, COUNT(*) AS n_days,
          CAST(MAX(peak) AS BIGINT) AS peak_cents,
          CAST(MAX(dd_bps) AS BIGINT) AS max_dd_bps,
          arg_max(d, dd_bps * 1048576 + di) AS worst_day
        FROM dd GROUP BY 1 ORDER BY o_orderpriority
      """.trim))
  )
}

package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time analytics over the `events` table — the batch shape of what
  * [[graft.streaming.EventStream]] runs as a Structured Streaming query.
  * The reference's "streaming" engine is bounded batch pulling over finite
  * files (`src/physical_plan/streaming.rs`), not unbounded event-time
  * processing (SURVEY.md §2.6), so this whole module is beyond-reference.
  */
object EventTime {

  /** Tumbling 1-hour window aggregation. Window start is emitted as epoch
    * seconds (bigint) so the oracle compare is independent of parquet
    * timestamp physical types (driver data is timestamp[ns]). */
  def tumblingHourly(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
        col("event_type").as("etype"))
      .agg(
        count(lit(1)).as("n"),
        // value is 2-decimal money: sum exact integer cents, render by one
        // double division (the round(sum(double), 2) form is a per-group
        // dice roll on parallel-summation order — the straddle class the
        // sf1 replica replay exposed); avg = the same exact cents divided
        // twice, both divisions bit-identical cross-engine
        sum(round(col("value") * 100).cast("long")).as("uv"))
      .select(col("hour_epoch"), col("etype"), col("n"),
        (col("uv").cast("double") / 100.0).as("sum_value"),
        (col("uv").cast("double") / 100.0 / col("n")).as("avg_value"))
      .orderBy("hour_epoch", "etype")

  /** Sliding windows via the native `window()` function: 1-hour window
    * sliding every 15 minutes. Each event lands in 4 windows (Spark expands
    * then aggregates — same partial-agg safety as any groupBy). */
  def slidingWindows(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type").as("etype"))
      .agg(count(lit(1)).as("n"))
      .select(
        unix_timestamp(col("window.start")).as("win_start"),
        unix_timestamp(col("window.end")).as("win_end"),
        col("etype"), col("n"))
      .orderBy("win_start", "etype")

  /** Sessionization via the native `session_window` function (same
    * 30-minute gap as [[sessionize]]) — one groupBy instead of the
    * lag/flag/running-sum window chain; EventTimeSpec cross-checks the two
    * independent implementations produce identical session structure.
    * Session start is emitted as epoch seconds so the oracle compare is
    * independent of timestamp physical types. Note the boundary semantics:
    * session_window merges an event iff it lands strictly inside
    * [start, prev + gap) — a gap of exactly 30 min starts a NEW session —
    * so the oracle's lag-based rewrite uses `>= gap` at microsecond
    * precision (the lag-based [[sessionize]] uses `> gap` at second
    * precision; both are valid gap conventions, pinned per-query). */
  def sessionizeNative(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("uv")) // exact cents
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("session_start"),
        col("n_events"), (col("uv").cast("double") / 100.0).as("sum_value"))
      .orderBy("user_id", "session_start")

  /** Hourly cohort retention: of the users active in hour H, how many
    * are active again in H+1. The distinct (hour, user) activity set is
    * built once and self-joined on (user, next hour) — both sides shuffle
    * on user_id, and the aggregates run over the already-deduplicated
    * activity pairs, never raw events. */
  def hourlyRetention(spark: SparkSession, dir: String): DataFrame = {
    val act = Tables.events(spark, dir)
      .select(unix_timestamp(date_trunc("hour", col("ts"))).as("h"), col("user_id"))
      .distinct()
    val active = act.groupBy(col("h")).agg(count(lit(1)).as("n_active"))
    val retained = act.as("a")
      .join(act.as("b"),
        col("a.user_id") === col("b.user_id") && col("b.h") === col("a.h") + 3600)
      .groupBy(col("a.h").as("h"))
      .agg(count(lit(1)).as("n_retained"))
    active.join(retained, Seq("h"), "left")
      .select(col("h").as("hour_epoch"), col("n_active"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        // unrounded int/int quotient — see Text.qualityScores on why
        // round() on terminating decimal quotients is cross-engine flaky
        (coalesce(col("n_retained"), lit(0L)).cast("double") /
          col("n_active")).as("retention"))
      .orderBy("hour_epoch")
  }

  /** Cohort lifetime-value matrix — the (acquisition day × account age)
    * triangle every growth dashboard draws: users are cohorted by their
    * first-ever event day, and each later activity day contributes to the
    * cohort's row at `age_days = day − cohort_day`. Value sums are exact
    * integer cents rendered by ONE double division (the repo's money
    * discipline — parallel double summation is order-dependent; cents are
    * not). Scale shape: the first-day aggregate and the join both key on
    * user_id, so the two shuffles co-partition and the join is co-located;
    * the output is bounded at |days|² rows regardless of event volume. */
  def ltvCohort(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"),
        round(col("value") * 100).cast("long").as("cents"),
        col("event_type"))
    val cohorts = e.groupBy(col("user_id")).agg(min(col("d")).as("cohort_day"))
    e.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_day"), datediff(col("d"), col("cohort_day")).as("age_days"))
      .agg(
        countDistinct(col("user_id")).as("n_active"),
        count(lit(1)).as("n_events"),
        sum(col("cents")).as("uc"),
        sum(when(col("event_type") === "purchase", col("cents")).otherwise(0L)).as("pc"))
      .select(col("cohort_day"), col("age_days"), col("n_active"), col("n_events"),
        (col("uc").cast("double") / 100.0).as("total_value"),
        (col("pc").cast("double") / 100.0).as("purchase_value"))
      .orderBy("cohort_day", "age_days")
  }

  /** Top user journeys — the "what do users do first" path report: each
    * user's first three event types (deterministic (ts, event_id) order)
    * concatenated into a path string, counted across users, top-20 paths.
    * Shape: ONE shuffle on user_id for the rank window (WindowGroupLimit
    * keeps only 3 events per user map-side), a conditional-aggregate
    * pivot to (e1, e2, e3) — no collect_list, whose order is
    * partition-dependent — and a bounded path count (≤ |types|³ groups).
    * Users with fewer than 3 events keep a truncated path (concat_ws
    * skips NULLs), matching the oracle's coalesce-free concat. */
  def userPaths(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("rn", row_number().over(byUser))
      .filter(col("rn") <= 3)
      .groupBy(col("user_id"))
      .agg(
        max(when(col("rn") === 1, col("event_type"))).as("e1"),
        max(when(col("rn") === 2, col("event_type"))).as("e2"),
        max(when(col("rn") === 3, col("event_type"))).as("e3"))
      .groupBy(concat_ws(" > ", col("e1"), col("e2"), col("e3")).as("path"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path").asc)
      .limit(20)
      .orderBy(col("n_users").desc, col("path").asc)
  }

  /** Seasonal-naive forecast backtest — the baseline every real
    * forecasting pipeline must beat: predict each day's event count with
    * the count from 7 days earlier, and score the prediction. Shape: one
    * date-grain aggregate (≤ |days| rows at any event volume), then a
    * tiny self-join on the shifted date — both sides are the same bounded
    * frame, so the join broadcasts. All-integer counts and errors →
    * bit-exact oracle. */
  def forecastBaseline(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    daily.as("a")
      .join(daily.as("b"), col("a.day") === date_add(col("b.day"), 7))
      .select(col("a.day").as("day"),
        col("a.n").as("n_actual"),
        col("b.n").as("n_forecast"),
        abs(col("a.n") - col("b.n")).as("abs_err"))
      .orderBy("day")
  }

  /** Ordered funnel: users who did view → click → purchase IN ORDER
    * (each stage's first occurrence at-or-after the previous stage's).
    * Three aggregations all keyed on user_id — the shuffles co-partition,
    * and each stage's input shrinks to the users still in the funnel.
    * Emits one row of stage counts (the funnel report shape). */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_timestamp(col("ts")).as("es"))
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("es").as("v_es"))
    val c = e.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("es") >= col("v_es"))
      .groupBy("user_id").agg(min("es").as("c_es"))
    val p = e.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("es") >= col("c_es"))
      .groupBy("user_id").agg(min("es").as("p_es"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .agg(
        count(lit(1)).as("n_view"),
        count(col("c_es")).as("n_view_click"),
        count(col("p_es")).as("n_view_click_purchase"))
  }

  /** Gap-based sessionization (30-minute inactivity gap): the classic
    * lag → new-session flag → running sum pattern. One shuffle on user_id;
    * session state never leaves the executor. Expressible identically in
    * ANSI SQL, so it oracle-checks exactly. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val gapSec = 1800L
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))) > gapSec, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(byUser))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        unix_timestamp(min(col("ts"))).as("start_epoch"),
        unix_timestamp(max(col("ts"))).as("end_epoch"),
        sum(round(col("value") * 100).cast("long")).as("uv")) // exact cents
      .withColumn("sum_value", col("uv").cast("double") / 100.0)
      .drop("uv")
      .orderBy("user_id", "session_id")
  }

  /** Fixed-width value histogram: bucket = floor(value / width) * width —
    * one map-side division per row, then a tiny hash agg (≤ ~10 buckets
    * regardless of input size: the ideal 100 TB reduction shape). The
    * bucket edge is an exact IEEE division in both engines, so bucketing
    * never disagrees cross-engine. */
  /** Z-score anomaly detection: per-type mean/stddev (a tiny aggregate —
    * one row per event type regardless of input size) broadcast-joined
    * back onto the stream, flagging |z| > 3. The two-pass shape is the
    * scalable one: no window over the full table, the stats side is
    * bounded, and the fact side is scanned once map-side. z is a
    * continuous quotient → round(4) is tie-safe; the |z| > 3 threshold
    * compares values whose distance from 3.0 dwarfs cross-engine ulps. */
  def anomalyZScore(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val stats = events.groupBy("event_type")
      .agg(avg("value").as("mu"), stddev_pop(col("value")).as("sd"))
    events.join(broadcast(stats), "event_type")
      .filter(abs((col("value") - col("mu")) / col("sd")) > 3.0)
      .select(
        col("event_id"),
        col("event_type").as("etype"),
        round((col("value") - col("mu")) / col("sd"), 4).as("z"))
      .orderBy("event_id")
  }

  def valueHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy((floor(col("value") / 50.0) * 50).cast("long").as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("uv"), // exact cents
        round(min("value"), 2).as("min_value"),
        round(max("value"), 2).as("max_value"))
      .select(col("bucket"), col("n"),
        (col("uv").cast("double") / 100.0).as("sum_value"),
        col("min_value"), col("max_value"))
      .orderBy("bucket")

  /** First-order Markov transition counts over each user's event
    * sequence — the behavioral-model input next to [[funnel]]'s fixed
    * stages. lag window per user (ts, event_id deterministic order) →
    * (prev, next) hash agg: one shuffle on user_id, one bounded agg
    * (≤ |event types|² rows out regardless of input size). All-integer
    * output → bit-exact oracle. */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("prev_type", "next_type")
  }

  /** A/B experiment readout — the two-proportion z-test every
    * experimentation pipeline runs: variant = deterministic user-id
    * parity split, conversion = user reached a purchase event. Emits one
    * row per variant (users, conversions, rate) plus the pooled z-score
    * and the significance call.
    *
    * Output is ALL-INTEGER (no doubles reach the oracle hash): z² is an
    * exact rational of the four counts — z² = (ca·nb − cb·na)²·N /
    * (na·nb·c·(N−c)) with c = ca+cb, N = na+nb — so m = round(|z|·10⁴)
    * (half-up) is the unique integer with (2m−1)²·Q ≤ 4·10⁸·P < (2m+1)²·Q
    * where P = (ca·nb−cb·na)²·N and Q = na·nb·c·(N−c). We take the double
    * z's candidate m₀ and correct it ±1 against those DECIMAL(38) integer
    * comparisons, so a last-ulp double divergence that straddles a 1e-4
    * half-up boundary can no longer split the engines: both converge to
    * the same exact integer. The query emits that integer DIRECTLY as
    * `z_e4` = sign·m (BIGINT, z in units of 1e-4) rather than rendering
    * m/10000.0 — rounds 6–8 proved that any hashed double is a driver-
    * environment divergence surface, so none remain. The conversion rate
    * is likewise exact integer basis points `conv_bp` = (n_converted ·
    * 10⁴) div n_users. `significant` is m ≥ 19600 — the |z| ≥ 1.96 cut on
    * the same exact integer. DECIMAL(38) holds the products exactly up
    * to [[AbExactBound]] users per variant; beyond it both engines fall
    * back to the double candidate identically (see the bound's doc —
    * graceful degradation instead of an ANSI overflow at production arm
    * sizes).
    *
    * Scale shape: one per-user aggregate (shuffles user ids + one bit),
    * one 2-row variant aggregate, and a single-row pooled-stats
    * crossJoin broadcast back (documented in the no-NLJ whitelist) —
    * O(1) output at any event volume. */
  def abTest(spark: SparkSession, dir: String): DataFrame = {
    val users = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
      .select(when(pmod(col("user_id"), lit(2)) === 0, "A").otherwise("B").as("variant"),
        col("conv"))
    abTestFromUsers(users)
  }

  /** Testable core of [[abTest]]: input is (variant: string, conv: 0/1). */
  private[graft] def abTestFromUsers(users: DataFrame): DataFrame =
    abTestFromCounts(users.groupBy(col("variant"))
      .agg(count(lit(1)).as("n_users"), sum(col("conv")).as("n_converted")))

  /** Exact-correction bound: the DECIMAL(38) products hold exactly while
    * both arm sizes stay ≤ 5·10⁵ ((2m+1)²·Q and 4·10⁸·P grow ~U⁵).
    * Above it the CASE falls back to the double candidate BEFORE any
    * decimal product is evaluated (lazy CASE in both engines — no ANSI
    * overflow error), accepting a ~1e-10-probability last-digit straddle
    * instead of a guaranteed runtime failure at production arm sizes.
    * The oracle carries the identical bound on HUGEINT. */
  private val AbExactBound = 500000L

  /** z-test readout from pre-aggregated (variant, n_users, n_converted)
    * counts — split out so specs can exercise the overflow fallback with
    * synthetic billion-user arms (2 rows, no giant users frame). */
  private[graft] def abTestFromCounts(v: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val pooled = v.agg(
      coalesce(sum(when(col("variant") === "A", col("n_converted"))), lit(0L)).as("ca"),
      coalesce(sum(when(col("variant") === "A", col("n_users"))), lit(0L)).as("na"),
      coalesce(sum(when(col("variant") === "B", col("n_converted"))), lit(0L)).as("cb"),
      coalesce(sum(when(col("variant") === "B", col("n_users"))), lit(0L)).as("nb"))
    // exact integer pieces of z² = P/Q (all DECIMAL(38,0), scale-0 → exact)
    val caD = col("ca").cast(dec); val naD = col("na").cast(dec)
    val cbD = col("cb").cast(dec); val nbD = col("nb").cast(dec)
    val num = caD * nbD - cbD * naD        // sign(z); |num| ≤ U² fits easily
    val cTot = caD + cbD; val nTot = naD + nbD; val dTot = nTot - cTot
    val qEx = naD * nbD * cTot * dTot      // Q = na·nb·c·(N−c), 0 iff degenerate
    val pEx = num * num * nTot             // P = (ca·nb−cb·na)²·N
    // double z only seeds the candidate digit; the exact comparisons fix it
    val pa = col("ca").cast("double") / col("na")
    val pb = col("cb").cast("double") / col("nb")
    val pPool = (col("ca") + col("cb")).cast("double") / (col("na") + col("nb"))
    val z = (pa - pb) /
      sqrt(pPool * (lit(1.0) - pPool) * (lit(1.0) / col("na") + lit(1.0) / col("nb")))
    val zSafe = when(pPool > 0 && pPool < 1, z).otherwise(lit(0.0))
    val m0 = floor(abs(zSafe) * 10000d + 0.5d).cast("long")
    val fourE8P = lit(400000000L).cast(dec) * pEx
    val upB = (m0 * 2 + 1).cast(dec); val dnB = (m0 * 2 - 1).cast(dec)
    val overBound = col("na") > AbExactBound || col("nb") > AbExactBound
    // overBound FIRST: past ~1.4e9 per arm even qEx overflows DECIMAL(38),
    // so no decimal product may evaluate on that path (degenerate pools
    // there still land on m0 = 0 via zSafe, so the answer is unchanged)
    val m = when(overBound, m0)
      .when(qEx === 0, lit(0L))
      .when(upB * upB * qEx <= fourE8P, m0 + 1)
      .when(m0 >= 1 && dnB * dnB * qEx > fourE8P, m0 - 1)
      .otherwise(m0)
    val pooledZ = pooled.select(col("ca"), col("na"), col("cb"), col("nb"),
      num.as("zsign"), m.as("zm"))
    // z_e4 = sign·m: the exact integer itself (m = 0 stays 0 regardless
    // of sign) — no IEEE value ever reaches the hashed output
    val zE4 = when(col("zm") === 0, lit(0L))
      .when(col("zsign") < 0, -col("zm"))
      .otherwise(col("zm"))
    v.crossJoin(broadcast(pooledZ))
      .select(col("variant"), col("n_users"), col("n_converted"),
        // exact integer basis points: integral long division, both
        // operands non-negative so floor ≡ trunc in both engines
        expr("n_converted * 10000L DIV n_users").as("conv_bp"),
        zE4.as("z_e4"),
        (col("zm") >= 19600).as("significant"))
      .orderBy("variant")
  }

  /** Last-touch attribution: each purchase is credited to the most recent
    * prior-or-equal click/view of the same user within a 7-day lookback
    * ('none' when no touch qualifies), then conversions and revenue roll
    * up per attributed channel — the standard marketing-attribution
    * readout. Same union + merge-scan shape as [[graft.ops.AsOf]]: tag
    * touches and purchases, ONE shuffle on user_id, carry the latest
    * touch forward with a last(ignoreNulls) window (touches sort before
    * purchases at equal timestamps, larger event_id wins equal-time touch
    * ties) — no join operator at all, so the plan is one exchange + one
    * sort regardless of event volume. */
  def lastTouchAttribution(spark: SparkSession, dir: String,
                           lookbackSec: Long = 7L * 24 * 3600): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("es"), col("value"))
    val touches = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("es"), lit(0).as("side"), col("event_id").as("tb"),
        col("event_type").as("touch_type"), col("es").as("touch_es"),
        lit(null).cast("double").as("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("es"), lit(1).as("side"),
        lit(null).cast("long").as("tb"),
        lit(null).cast("string").as("touch_type"),
        lit(null).cast("long").as("touch_es"), col("value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("es").asc, col("side").asc, col("tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the two last() calls share one ordering, so they pick fields of the
    // SAME touch row — no torn (type, ts) pairs
    touches.unionByName(purchases)
      .withColumn("lt_type", last(col("touch_type"), ignoreNulls = true).over(w))
      .withColumn("lt_es", last(col("touch_es"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(
        when(col("lt_es").isNotNull && col("es") - col("lt_es") <= lookbackSec,
          col("lt_type")).otherwise("none").as("channel"),
        col("value"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("conversions"),
        sum(round(col("value") * 100).cast("long")).as("uv")) // exact cents
      .select(col("channel"), col("conversions"),
        (col("uv").cast("double") / 100.0).as("revenue"))
      .orderBy("channel")
  }
}

package graft

import graft.ops._
import org.apache.spark.sql.functions._

class EventTimeSpec extends SparkSpec {

  test("windows: top-3 per customer, rank within [1,3]") {
    val rows = Windows.topOrdersPerCustomer(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byCust = rows.groupBy(_.getAs[Long]("custkey"))
    byCust.foreach { case (_, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_.getAs[Int]("rk")).sorted.sameElements(1 to rs.length))
    }
  }

  test("running total is monotone per customer (positive prices)") {
    val rows = Windows.runningTotal(spark, sfDir).collect()
    rows.groupBy(_.getAs[Long]("custkey")).foreach { case (_, rs) =>
      val totals = rs.sortBy(_.getAs[Long]("orderkey")).map(_.getAs[Double]("running_total"))
      // ordered by orderkey != window order (orderdate), so just check positivity
      assert(totals.forall(_ > 0))
    }
  }

  test("event gaps: first event per user has null gap, others >= 0") {
    val rows = Windows.eventGaps(spark, sfDir).collect()
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (_, rs) =>
      assert(rs.count(_.isNullAt(2)) == 1)
      rs.filter(!_.isNullAt(2)).foreach(r => assert(r.getLong(2) >= 0))
    }
  }

  test("tumbling counts sum to total events") {
    val total = Tables.events(spark, sfDir).count()
    val sum = EventTime.tumblingHourly(spark, sfDir).agg(org.apache.spark.sql.functions.sum("n"))
      .first().getLong(0)
    assert(sum == total)
  }

  test("sliding windows: each event lands in 4 windows") {
    val total = Tables.events(spark, sfDir).count()
    val sum = EventTime.slidingWindows(spark, sfDir).agg(org.apache.spark.sql.functions.sum("n"))
      .first().getLong(0)
    assert(sum == total * 4)
  }

  test("native session_window agrees with lag-based sessionize") {
    val lagBased = EventTime.sessionize(spark, sfDir).collect()
    val native = EventTime.sessionizeNative(spark, sfDir).collect()
    // two independent implementations of the same 30-min-gap rule:
    // same number of sessions per user, same event totals
    val a = lagBased.groupBy(_.getAs[Long]("user_id")).view
      .mapValues(rs => (rs.length, rs.map(_.getAs[Long]("n_events")).sum)).toMap
    val b = native.groupBy(_.getAs[Long]("user_id")).view
      .mapValues(rs => (rs.length, rs.map(_.getAs[Long]("n_events")).sum)).toMap
    assert(a == b)
  }

  test("sampling: uniform ~20%, stratified ~10% per language") {
    val rows = graft.ops.Text.sampledCorpus(spark, sfDir).collect()
    val n = Tables.documents(spark, sfDir).count().toDouble
    val uni = rows.count(_.getString(1) == "uniform") / n
    val strat = rows.count(_.getString(1) == "stratified") / n
    assert(uni > 0.08 && uni < 0.35, s"uniform fraction $uni")
    assert(strat > 0.02 && strat < 0.25, s"stratified fraction $strat")
  }

  test("event transitions: total transitions = events minus users (exact)") {
    // every user with k events contributes exactly k-1 (prev, next) pairs
    val total = Tables.events(spark, sfDir).count()
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    val sumN = EventTime.eventTransitions(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum("n")).collect()(0).getLong(0)
    assert(sumN == total - users, s"$sumN vs ${total - users}")
  }

  test("sessions: event counts sum to total; sessions disjoint in time") {
    val total = Tables.events(spark, sfDir).count()
    val rows = EventTime.sessionize(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_events")).sum == total)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val sessions = rs.sortBy(_.getAs[Long]("session_id"))
      sessions.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("start_epoch") - a.getAs[Long]("end_epoch") > 1800)
        case _ =>
      }
    }
  }

  test("ab test: variants partition users, z consistent with the counts") {
    val rows = graft.ops.EventTime.abTest(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("variant")).toSeq == Seq("A", "B"))
    val total = rows.map(_.getAs[Long]("n_users")).sum
    val distinctUsers = Tables.events(spark, sfDir)
      .select(countDistinct(col("user_id"))).collect().head.getLong(0)
    assert(total == distinctUsers)
    rows.foreach { r =>
      val bp = r.getAs[Long]("conv_bp")
      assert(bp >= 0L && bp <= 10000L)
      assert(r.getAs[Long]("n_converted") <= r.getAs[Long]("n_users"))
      // conv_bp is exactly the truncating basis-point division of the counts
      assert(bp == r.getAs[Long]("n_converted") * 10000L / r.getAs[Long]("n_users"))
    }
    // recompute the pooled z from the emitted counts — must match to 1 unit
    val Array(a, b) = rows
    val (ca, na) = (a.getAs[Long]("n_converted").toDouble, a.getAs[Long]("n_users").toDouble)
    val (cb, nb) = (b.getAs[Long]("n_converted").toDouble, b.getAs[Long]("n_users").toDouble)
    val pool = (ca + cb) / (na + nb)
    val z =
      if (pool > 0 && pool < 1)
        (ca / na - cb / nb) / math.sqrt(pool * (1 - pool) * (1 / na + 1 / nb))
      else 0.0 // degenerate pool -> operator emits 0 by contract
    rows.foreach(r => assert(math.abs(r.getAs[Long]("z_e4") - z * 10000.0) < 1.5))
  }

  test("ltv cohort: triangle well-formed, day-0 present, totals conserve in cents") {
    val rows = EventTime.ltvCohort(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("age_days") >= 0)
      assert(r.getAs[Long]("n_active") >= 1L)
      assert(r.getAs[Long]("n_events") >= r.getAs[Long]("n_active"))
      assert(r.getAs[Double]("purchase_value") <= r.getAs[Double]("total_value") + 1e-9)
    }
    // every cohort has its own day-0 row (first event IS activity at age 0)
    val byCohort = rows.groupBy(_.getAs[java.sql.Date]("cohort_day"))
    byCohort.foreach { case (c, g) =>
      assert(g.exists(_.getAs[Int]("age_days") == 0), s"cohort $c missing day 0")
    }
    // conservation: matrix cents == corpus cents; events count too
    val totalCents = rows.map(r => math.round(r.getAs[Double]("total_value") * 100)).sum
    val expCents = Tables.events(spark, sfDir)
      .agg(sum(round(col("value") * 100).cast("long"))).collect()(0).getLong(0)
    assert(totalCents == expCents)
    assert(rows.map(_.getAs[Long]("n_events")).sum == Tables.events(spark, sfDir).count())
  }

  test("user paths: valid stage alphabet, user totals conserved across full path set") {
    val types = Tables.events(spark, sfDir)
      .select(col("event_type")).distinct().collect().map(_.getString(0)).toSet
    val rows = EventTime.userPaths(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val stages = r.getAs[String]("path").split(" > ")
      assert(stages.nonEmpty && stages.length <= 3)
      stages.foreach(s => assert(types.contains(s), s"unknown stage $s"))
      assert(r.getAs[Long]("n_users") >= 1L)
    }
    // counts are descending (the report contract)
    val ns = rows.map(_.getAs[Long]("n_users"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("forecast baseline: only days with a 7-day-ago peer, errors consistent") {
    val rows = EventTime.forecastBaseline(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, sfDir)
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[java.sql.Date]("day").toLocalDate ->
        r.getAs[Long]("n")).toMap
    rows.foreach { r =>
      val d = r.getAs[java.sql.Date]("day").toLocalDate
      assert(daily.contains(d.minusDays(7)), s"$d has no 7-day-ago peer")
      assert(r.getAs[Long]("n_actual") == daily(d))
      assert(r.getAs[Long]("n_forecast") == daily(d.minusDays(7)))
      assert(r.getAs[Long]("abs_err") ==
        math.abs(daily(d) - daily(d.minusDays(7))))
    }
  }

  test("freshness: watermark is the max last-seen, lags non-negative, one row fresh") {
    val rows = Quality.freshness(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getAs[Long]("lag_s") == 0L)) // the watermark stream itself
    rows.foreach { r =>
      assert(r.getAs[Long]("lag_s") >= 0L)
      assert(r.getAs[Boolean]("fresh_24h") == (r.getAs[Long]("lag_s") <= 86400L))
    }
  }

  test("scd2: repeated same-date priority still yields a deterministic total order") {
    import spark.implicits._
    val d0 = java.sql.Date.valueOf("2026-01-05")
    val d1 = java.sql.Date.valueOf("2026-02-01")
    // cust 1: three same-date orders with priorities A,X,A — the ambiguous
    // case where (custkey, valid_from, priority) repeats across two change
    // rows with DIFFERENT valid_to; order must follow o_orderkey
    val orders = Seq(
      (1L, d0, 10L, "A"), (1L, d0, 11L, "X"), (1L, d0, 12L, "A"),
      (1L, d1, 13L, "A"), // no change — absorbed into the last interval
      (2L, d0, 20L, "B")
    ).toDF("o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority")
    val rows = Windows.scd2Df(orders).collect()
    val c1 = rows.filter(_.getAs[Long]("custkey") == 1L)
    assert(c1.map(_.getAs[String]("priority")).toSeq == Seq("A", "X", "A"))
    assert(c1.take(2).forall(r => r.getAs[java.sql.Date]("valid_to") == d0))
    assert(c1.last.isNullAt(c1.last.fieldIndex("valid_to")) && c1.last.getAs[Boolean]("is_current"))
    assert(rows.count(_.getAs[Long]("custkey") == 2L) == 1)
  }

  // independent exact reference: m = round(|z|*1e4) half-up is the unique
  // integer with (2m-1)^2*Q <= 4e8*P < (2m+1)^2*Q; start from the double
  // candidate and loop-correct with BigInt (the operator only corrects
  // +-1, so agreement here proves the candidate is never more than one
  // digit off AND the correction lands on the true integer)
  private def refMExact(ca: Long, na: Long, cb: Long, nb: Long): Long = {
    val num = BigInt(ca) * nb - BigInt(cb) * na
    val nTot = BigInt(na) + nb; val c = BigInt(ca) + cb; val d = nTot - c
    val q = BigInt(na) * nb * c * d
    if (q == 0) return 0L
    val p = num * num * nTot
    val f8 = BigInt(400000000)
    val pa = ca.toDouble / na; val pb = cb.toDouble / nb
    val pp = (ca + cb).toDouble / (na + nb)
    val zd = math.abs((pa - pb) / math.sqrt(pp * (1 - pp) * (1.0 / na + 1.0 / nb)))
    var m = math.floor(zd * 10000 + 0.5).toLong
    while (BigInt(2 * m + 1).pow(2) * q <= f8 * p) m += 1
    while (m >= 1 && BigInt(2 * m - 1).pow(2) * q > f8 * p) m -= 1
    m
  }

  test("ab test integer-exact z rendering matches a BigInt reference on synthetic counts") {
    import spark.implicits._
    val cases = Seq(
      (3L, 10L, 5L, 12L), (57L, 100L, 43L, 100L), (0L, 50L, 50L, 50L),
      (50L, 50L, 0L, 50L), (0L, 40L, 0L, 60L), (40L, 40L, 60L, 60L),
      (123L, 997L, 177L, 1003L), (499L, 1000L, 501L, 1000L),
      (1L, 2L, 1L, 3L), (7L, 7L, 3L, 9L), (0L, 0L, 5L, 20L)
    ) ++ (1 to 15).map { i =>
      val na = 50L + (i * 37L) % 400; val nb = 60L + (i * 53L) % 380
      ((i * 17L) % (na + 1), na, (i * 29L) % (nb + 1), nb)
    }
    cases.foreach { case (ca, na, cb, nb) =>
      val users = (Seq.fill(ca.toInt)(("A", 1L)) ++ Seq.fill((na - ca).toInt)(("A", 0L)) ++
        Seq.fill(cb.toInt)(("B", 1L)) ++ Seq.fill((nb - cb).toInt)(("B", 0L)))
        .toDF("variant", "conv")
      val out = EventTime.abTestFromUsers(users).collect()
      checkCase(out, ca, na, cb, nb)
    }

    // billion-user arms: past the DECIMAL(38)-exact bound both engines
    // must fall back to the double candidate (no overflow error) and the
    // rendered z still matches the double reference to the last digit
    val big = Seq(
      (300000000L, 1000000000L, 300500000L, 1000000000L),
      (0L, 2000000000L, 0L, 2000000000L), // degenerate over-bound pool
      (123456789L, 900000000L, 123000000L, 910000000L))
    big.foreach { case (ca, na, cb, nb) =>
      val v = Seq(("A", na, ca), ("B", nb, cb)).toDF("variant", "n_users", "n_converted")
      val out = EventTime.abTestFromCounts(v).collect()
      assert(out.length == 2)
      val pa = ca.toDouble / na; val pb = cb.toDouble / nb
      val pp = (ca + cb).toDouble / (na + nb)
      val zd =
        if (pp > 0 && pp < 1)
          (pa - pb) / math.sqrt(pp * (1 - pp) * (1.0 / na + 1.0 / nb))
        else 0.0
      val m0 = math.floor(math.abs(zd) * 10000 + 0.5).toLong
      val zExp = if (m0 == 0L) 0L else math.signum(zd).toLong * m0
      out.foreach(r => assert(r.getAs[Long]("z_e4") == zExp,
        s"over-bound case ($ca,$na,$cb,$nb)"))
    }
  }

  private def checkCase(out: Array[org.apache.spark.sql.Row],
                        ca: Long, na: Long, cb: Long, nb: Long): Unit = {
    val m = refMExact(ca, na, cb, nb)
    val sign = BigInt(ca) * nb - BigInt(cb) * na
    val zExp = if (m == 0L) 0L else if (sign < 0) -m else m
    assert(out.nonEmpty)
    out.foreach { r =>
      // exact integer equality: both sides emit the same sign·m BIGINT
      assert(r.getAs[Long]("z_e4") == zExp, s"z case ($ca,$na,$cb,$nb)")
      assert(r.getAs[Boolean]("significant") == (m >= 19600L), s"sig case ($ca,$na,$cb,$nb)")
    }
  }
}

package graft

import graft.ops.AsOf
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {

  test("asofJoin picks the latest prior left row per right row") {
    import spark.implicits._
    val quotes = Seq( // key, time, px
      (1L, 10L, 100.0), (1L, 20L, 101.0), (1L, 20L, 102.0), (1L, 40L, 103.0),
      (2L, 15L, 200.0)).toDF("k0", "t0", "px")
      .withColumn("qid", monotonically_increasing_id())
    val trades = Seq((1L, 5L), (1L, 20L), (1L, 30L), (1L, 50L), (2L, 14L), (2L, 16L))
      .toDF("k0", "t0")
    val out = AsOf.asofJoin(quotes, trades, "k0", "t0", Seq("px"), "px")
      .select(col("k"), col("t"), col("asof_px"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toSet
    assert(out.contains((1L, 5L, -1.0)))         // before any quote (null -> -1)
    assert(out.contains((1L, 20L, 102.0)))       // equal time: tie -> max px
    assert(out.contains((1L, 30L, 102.0)))       // carried forward
    assert(out.contains((1L, 50L, 103.0)))
    assert(out.contains((2L, 14L, -1.0)))
    assert(out.contains((2L, 16L, 200.0)))
  }

  test("event asof: every click appears once; view is prior-or-equal") {
    val clicks = Tables.events(spark, sfDir).filter(col("event_type") === "click").count()
    val rows = AsOf.eventAsof(spark, sfDir).collect()
    assert(rows.length == clicks)
  }

  test("range join lags are within [0, 600]") {
    val rows = AsOf.eventRangeJoin(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lag = r.getAs[Long]("lag_sec")
      assert(lag >= 0 && lag <= 600)
    }
  }

  test("left outer keeps all customers; full outer covers both sides") {
    val nCust = Tables.customer(spark, sfDir).count()
    assert(AsOf.leftOuterOrderCounts(spark, sfDir).count() == nCust)
    val fo = AsOf.fullOuterNationCounts(spark, sfDir).collect()
    assert(fo.exists(_.getAs[Long]("n_cust") == 0L) || fo.exists(_.getAs[Long]("n_supp") == 0L))
  }
}

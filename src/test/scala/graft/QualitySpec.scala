package graft

import graft.ops.Quality
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {

  test("dq report: clean star schema has zero violations, true rowcounts") {
    val rows = Quality.dqReport(spark, sfDir).collect()
      .map(r => r.getAs[String]("check") -> r.getAs[Long]("n")).toMap
    assert(rows.size == 11)
    assert(rows("orders.rowcount") == Tables.orders(spark, sfDir).count())
    assert(rows("lineitem.rowcount") == Tables.lineitem(spark, sfDir).count())
    rows.filterKeys(k => k.endsWith(".dups") || k.endsWith(".nulls") ||
      k.endsWith(".orphans")).foreach { case (k, n) =>
      assert(n == 0L, s"$k: $n violations on clean data")
    }
  }

  test("snapshot diff classes partition the key space exactly") {
    val byChange = Quality.snapshotDiff(spark, sfDir).collect()
      .map(r => r.getAs[String]("change") -> r.getAs[Long]("n")).toMap
    val keys = Tables.orders(spark, sfDir)
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    // v1 drops ≡9 (mod 10); v2 drops ≡0 — so inserts are the ≡9 keys,
    // deletes the ≡0 keys, updates the surviving ≡0 (mod 7) keys
    val inserts = keys.count(k => k % 10 == 9)
    val deletes = keys.count(k => k % 10 == 0)
    val updates = keys.count(k => k % 10 != 0 && k % 10 != 9 && k % 7 == 0)
    val unchanged = keys.length - inserts - deletes - updates
    assert(byChange.getOrElse("insert", 0L) == inserts)
    assert(byChange.getOrElse("delete", 0L) == deletes)
    assert(byChange.getOrElse("update", 0L) == updates)
    assert(byChange.getOrElse("unchanged", 0L) == unchanged)
  }
}

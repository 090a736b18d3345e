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

  test("dq drift: PSI terms finite, counts partition the table, identical halves ≈ 0") {
    val rows = Quality.dqDrift(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 9)
    val total = rows.map(r => r.getAs[Long]("n_base") + r.getAs[Long]("n_curr")).sum
    assert(total == Tables.orders(spark, sfDir).count())
    rows.foreach { r =>
      val t = r.getAs[Double]("psi_term")
      assert(!t.isNaN && !t.isInfinite, s"bucket ${r.get(0)}: psi_term $t")
      // (p−q) and ln(p/q) always share sign, so every term is ≥ 0 (up to
      // the 6dp rounding) — a negative term means the formula broke
      assert(t >= -1e-6, s"bucket ${r.get(0)}: negative psi_term $t")
    }
    // same-generator date split → no real drift → total under the 0.2
    // "investigate" line (this is the operator's calibration check)
    val psi = rows.map(_.getAs[Double]("psi_term")).sum
    assert(psi < 0.2, s"PSI $psi flags drift on same-distribution halves")
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

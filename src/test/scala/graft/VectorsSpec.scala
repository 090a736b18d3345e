package graft

import graft.ops._
import org.apache.spark.sql.functions._

class VectorsSpec extends SparkSpec {

  test("dot/cosine columns compute correct values") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    val row = df.select(
      Vectors.dotCol(col("a"), col("b")).as("dot"),
      Vectors.cosineCol(col("a"), col("b")).as("cos")).first()
    assert(math.abs(row.getDouble(0) - 32.0) < 1e-9)
    val expected = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(row.getDouble(1) - expected) < 1e-9)
  }

  test("property: VecMean aggregator equals a scala reference mean per key") {
    // guards the map-side partial-sum Aggregator that replaced the
    // posexplode update step: partial/merge order must not change means
    // beyond FP reassociation noise
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val data = (0 until 200).map(i => ((i % 7).toLong, Array.fill(16)(rng.nextDouble())))
    val got = data.toDF("k", "v").as[(Long, Array[Double])]
      .groupByKey(_._1).agg(Vectors.VecMean.toColumn.name("m"))
      .collect().toMap
    val want = data.groupBy(_._1).map { case (k, rows) =>
      k -> Array.tabulate(16)(d => rows.map(_._2(d)).sum / rows.size)
    }
    assert(got.keySet == want.keySet)
    for (k <- want.keySet; d <- 0 until 16)
      assert(math.abs(got(k)(d) - want(k)(d)) < 1e-9, s"key $k dim $d")
  }

  test("brute force ANN: 5 neighbors per query, descending cosine") {
    val rows = Vectors.annBruteForce(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.nonEmpty)
    byQ.foreach { case (_, rs) =>
      assert(rs.length == 5)
      val cs = rs.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
      rs.foreach(r => assert(r.getAs[Double]("cos") >= -1.0001 && r.getAs[Double]("cos") <= 1.0001))
    }
  }

  test("LSH ANN recall: top-1 of LSH appears in brute-force top-5 often") {
    val bf = Vectors.annBruteForce(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.map(_.getAs[Long]("c_id")).toSet).toMap
    val lsh = Vectors.annLsh(spark, sfDir).collect()
      .filter(_.getAs[Int]("rk") == 1)
      .map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("c_id"))
    assert(lsh.nonEmpty)
    val hits = lsh.count { case (q, c) => bf.get(q).exists(_.contains(c)) }
    assert(hits.toDouble / lsh.length >= 0.3, s"$hits/${lsh.length} recalled")
  }

  test("semantic dup clusters agree with the near-dup pair graph") {
    val pairs = Vectors.cosineNearDupPairs(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    val clusters = Vectors.embDupClusters(spark, sfDir).collect()
    val label = clusters.flatMap { r =>
      val keep = r.getAs[Long]("keep_id")
      r.getAs[String]("members").split(",").map(_.toLong -> keep)
    }.toMap
    // every near-dup pair must land in one cluster, keeper = min member
    pairs.foreach { case (a, b) =>
      assert(label.contains(a) && label(a) == label(b), s"pair ($a,$b) split")
    }
    clusters.foreach { r =>
      val members = r.getAs[String]("members").split(",").map(_.toLong)
      assert(r.getAs[Long]("cluster_size") == members.length)
      assert(r.getAs[Long]("keep_id") == members.min)
      assert(members.length >= 2, "singleton cluster emitted")
    }
  }

  test("range search is consistent with brute-force top-k at the radius") {
    val range = Vectors.rangeSearch(spark, sfDir).collect()
    assert(range.nonEmpty)
    range.foreach(r => assert(r.getAs[Double]("cos") >= 0.25))
    // completeness: every brute-force top-5 neighbor at or above the
    // radius must appear in the range result for the same query
    val rangeSet = range.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet
    val missing = Vectors.annBruteForce(spark, sfDir).collect()
      .filter(_.getAs[Double]("cos") >= 0.25)
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id")))
      .filterNot(rangeSet.contains)
    assert(missing.isEmpty, s"top-k hits missing from range result: $missing")
  }

  test("near-dup pairs are ordered and above threshold") {
    Vectors.cosineNearDupPairs(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
      assert(r.getAs[Double]("cos") >= 0.45)
    }
  }

  test("label centroids cover all labels with n = count * dim") {
    val emb = Tables.embeddings(spark, sfDir)
    val rows = Vectors.labelCentroids(spark, sfDir).collect()
    assert(rows.length == emb.select("label").distinct().count())
    val total = rows.map(_.getAs[Long]("n_values")).sum
    assert(total == emb.count() * 64)
  }

  test("int8 quantization: codes bounded by 127, MSE within the step bound") {
    val rows = Vectors.quantizeInt8(spark, sfDir).collect()
    assert(rows.length == Tables.embeddings(spark, sfDir).count())
    rows.foreach { r =>
      val qMax = r.getAs[Long]("q_max")
      assert(qMax <= 127L, s"vec ${r.getAs[Long]("vec_id")}: q_max $qMax")
      // max per-element reconstruction error is half a quantization step
      // (0.5/scale), so MSE <= 0.25/scale^2 (slack for the 6dp-rounded scale)
      val scale = r.getAs[Double]("q_scale")
      val mse = r.getAs[Double]("mse")
      assert(mse <= 0.26 / (scale * scale), s"vec ${r.getAs[Long]("vec_id")}: mse $mse")
    }
  }
}

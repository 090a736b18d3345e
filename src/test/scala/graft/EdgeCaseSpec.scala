package graft

import graft.ops.{AsOf, Dedup, Vectors}
import org.apache.spark.sql.functions._

/** Empty-input and generic-key edge cases: the paths a production
  * pipeline hits on an empty partition, a fresh table, or a non-numeric
  * id scheme — none of them may crash or return wrong shapes.
  */
class EdgeCaseSpec extends SparkSpec {

  test("connectedComponents on an empty edge list returns empty labels") {
    import spark.implicits._
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Dedup.connectedComponents(edges, "a", "b").count() == 0)
  }

  test("connectedComponents works on STRING ids (generic key type)") {
    import spark.implicits._
    // label = lexicographic minimum of the component
    val edges = Seq(("docB", "docA"), ("docB", "docC"), ("x2", "x1"))
      .toDF("a", "b")
    val labels = Dedup.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(labels == Map("docA" -> "docA", "docB" -> "docA", "docC" -> "docA",
      "x1" -> "x1", "x2" -> "x1"))
  }

  test("exact dedup on an empty documents table returns empty") {
    import spark.implicits._
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
      md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("fp"))
      .groupBy("fp").agg(min("doc_id").as("keep_id"))
    assert(out.count() == 0)
  }

  test("ngram-Jaccard pairs: empty and single-doc inputs produce no pairs") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.ngramJaccardPairsDf(empty).count() == 0)
    val one = Seq((1L, "only one document here")).toDF("doc_id", "text")
    assert(Dedup.ngramJaccardPairsDf(one).count() == 0)
  }

  test("minhash pairs: all-whitespace and empty-string docs do not crash") {
    import spark.implicits._
    val docs = Seq((1L, ""), (2L, "   "), (3L, "real content words here"),
      (4L, "real content words here")).toDF("doc_id", "text")
    // the two planted identical docs must pair; degenerate docs must not throw
    val pairs = Dedup.minhashPairsDf(docs).collect()
    assert(pairs.exists(r =>
      r.getAs[Long]("doc_a") == 3L && r.getAs[Long]("doc_b") == 4L))
  }

  test("as-of join with an EMPTY value side keeps probe rows with null match") {
    import spark.implicits._
    val values = Seq.empty[(Long, Long, Long)].toDF("k", "t", "lid")
    val probe = Seq((1L, 10L), (2L, 20L)).toDF("k", "t")
    val out = AsOf.asofJoin(values, probe, "k", "t", Seq("lid"), "lid")
    val rows = out.collect()
    assert(rows.length == 2, "every probe row must survive")
    assert(rows.forall(_.isNullAt(out.columns.indexOf("asof_lid"))),
      "no values exist, so every as-of match must be null")
  }

  test("VecMean on a single-row group returns the vector itself") {
    import spark.implicits._
    val ds = Seq((7L, Array(1.0, 2.0, 3.0))).toDS()
    val got = ds.groupByKey(_._1).agg(Vectors.VecMean.toColumn.name("m"))
      .collect().head._2
    assert(got.toSeq == Seq(1.0, 2.0, 3.0))
  }

  test("kmeans with nlist larger than the corpus still yields centroids") {
    import spark.implicits._
    val emb = (0L until 3L).map(i =>
      (i, Array.tabulate(4)(d => (i * 4 + d).toFloat))).toDF("vec_id", "embedding")
    val cents = Vectors.kmeansCentroids(emb, nlist = 8, iters = 1).collect()
    assert(cents.nonEmpty && cents.length <= 3)
  }
}

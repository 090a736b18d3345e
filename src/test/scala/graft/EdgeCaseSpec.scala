package graft

import graft.ops.{AsOf, Dedup, Text, Vectors}
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

  test("pageRank on an empty edge list returns empty ranks") {
    import spark.implicits._
    val edges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(graft.ops.Graph.pageRank(edges, iters = 2).count() == 0)
  }

  test("pageRank on a regular graph is exactly uniform (r = 1.0)") {
    import spark.implicits._
    // K3, both directions: every node has degree 2 and receives 2·(r/2),
    // so r' = 0.15 + 0.85·r — the uniform fixed point r = 1.0 is EXACT
    // at every iteration (no FP drift: 0.5 and the teleport terms are
    // binary-representable)
    val fwd = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val edges = (fwd ++ fwd.map(_.swap)).toDF("src", "dst")
    val ranks = graft.ops.Graph.pageRank(edges, iters = 4).collect()
    assert(ranks.length == 3)
    ranks.foreach(r => assert(r.getAs[Double]("rank") == 1.0, r.toString))
  }

  test("triangle counts on a 4-clique: every node in exactly 3 triangles") {
    import spark.implicits._
    val nodes = Seq(1L, 2L, 3L, 4L)
    val fwd = for (a <- nodes; b <- nodes if a < b) yield (a, b)
    val edges = (fwd ++ fwd.map(_.swap)).toDF("src", "dst")
    val out = graft.ops.Graph.triangleCountsDf(edges).collect()
    assert(out.length == 4)
    out.foreach(r => assert(r.getAs[Long]("n_triangles") == 3L, r.toString))
  }

  test("containment pairs on empty / single-doc corpora return empty") {
    import spark.implicits._
    assert(Dedup.containmentPairsDf(
      Seq.empty[(Long, String)].toDF("doc_id", "text")).count() == 0)
    assert(Dedup.containmentPairsDf(
      Seq((1L, "only one document here")).toDF("doc_id", "text")).count() == 0)
  }

  test("neighbor jaccard on empty and pair-only graphs") {
    import spark.implicits._
    assert(graft.ops.Graph.neighborJaccardDf(
      Seq.empty[(Long, Long)].toDF("src", "dst")).count() == 0)
    // a single undirected edge has no wedges -> no candidates
    val one = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    assert(graft.ops.Graph.neighborJaccardDf(one).count() == 0)
  }

  test("semantic dup clusters on an empty embeddings table returns empty") {
    import spark.implicits._
    val emb = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    // empty pair graph -> empty clusters (CC handles the empty edge list)
    assert(Vectors.embDupClustersDf(emb).count() == 0)
  }

  test("pii scrub preserves rows and handles empty text") {
    import spark.implicits._
    val docs = Seq((1L, ""), (2L, "x@y.zz")).toDF("doc_id", "text")
    val rows = Text.piiScrubDf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_emails")).toMap
    assert(rows == Map(1L -> 0L, 2L -> 1L))
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
  test("trigram perplexity: short (<3 chars) and empty docs are excluded, not scored") {
    import spark.implicits._
    val docs = Seq((1L, "ab"), (2L, ""), (3L, "a real document with text"),
      (4L, "xy")).toDF("doc_id", "text")
    val out = Text.trigramPerplexityDf(docs).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSet == Set(3L))
    assert(out.forall(r => r.getAs[Double]("avg_logp") < 0.0))
  }

  test("token entropy: single-token language scores exactly zero entropy") {
    import spark.implicits._
    val docs = Seq(("zz", "word word word"), ("en", "a b c d"))
      .toDF("lang", "text")
    val out = Text.tokenEntropyDf(docs).collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Double]("entropy")).toMap
    assert(out("zz") == 0.0)            // one distinct token -> H = 0
    assert(math.abs(out("en") - math.log(4.0)) < 1e-4) // uniform over 4
  }

  test("fuzzy name join: 1-char names filtered, identical names never self-pair") {
    import spark.implicits._
    val names = Seq("x", "small bolt", "small bolt", "small bolts", "zzzzzzz")
      .toDF("name")
    val out = Text.fuzzyNameJoinDf(names).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("name_a") == "small bolt" &&
      r.getAs[String]("name_b") == "small bolts" && r.getAs[Int]("dist") == 1)
    assert(Text.fuzzyNameJoinDf(Seq.empty[String].toDF("name")).count() == 0)
  }

  test("bloom dedup: empty batch (all-even ids) and empty snapshot both degrade safely") {
    import spark.implicits._
    // all-even: nothing to probe — 0 rows, no crash
    val allSnapshot = Seq((2L, "aa"), (4L, "bb")).toDF("doc_id", "text")
    assert(Dedup.bloomDedupFromDocs(allSnapshot).count() == 0)
    // all-odd: empty filter — nothing may be maybe_seen, everything bloom_ok
    val allBatch = Seq((1L, "aa"), (3L, "bb")).toDF("doc_id", "text")
    val rows = Dedup.bloomDedupFromDocs(allBatch).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(!r.getAs[Boolean]("maybe_seen") && !r.getAs[Boolean]("is_dup"))
      assert(r.getAs[Boolean]("bloom_ok"))
    }
  }

  test("leak-safe split: single-doc corpus yields one full split row, audit 1") {
    import spark.implicits._
    val one = Seq((1L, "only doc", 8L)).toDF("doc_id", "text", "n_chars")
    val rows = Dedup.leakSafeSplitFromDocs(one).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("n_docs") == 1L)
    assert(rows.head.getAs[Long]("max_splits_per_fp") == 1L)
  }

  test("misra-gries: empty input yields the zero sketch; single item exact") {
    import spark.implicits._
    val empty: Map[String, Long] = Seq.empty[String].toDS
      .select(graft.ops.Aggregates.MisraGries(4).toColumn.name("m")).collect()(0)
    assert(empty.isEmpty)
    val single: Map[String, Long] = Seq("a", "a", "a").toDS.repartition(2)
      .select(graft.ops.Aggregates.MisraGries(4).toColumn.name("m")).collect()(0)
    assert(single == Map("a" -> 3L))
  }
}

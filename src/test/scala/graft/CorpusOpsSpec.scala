package graft

import graft.ops.{AsOf, Dedup, EventTime, Graph, Text, Vectors}
import org.apache.spark.sql.functions._

/** Round-7 operators: boilerplate detection, TF-IDF, collocations,
  * co-purchase components, canonical keeper selection, last-touch
  * attribution, nearest as-of, product quantization. Each test asserts an
  * invariant or an independent reimplementation — never the operator's
  * own arithmetic. */
class CorpusOpsSpec extends SparkSpec {

  test("boilerplate: counts bounded, ratio consistent, top set non-empty") {
    val rows = Text.boilerplateStats(spark, sfDir).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_shingles")
      val b = r.getAs[Long]("n_boiler")
      assert(b >= 0 && b <= n, s"doc ${r.get(0)}: $b boiler of $n")
      assert(math.abs(r.getAs[Double]("boiler_ratio") - b.toDouble / n) < 1e-12)
      assert(r.getAs[Boolean]("keep") == (b.toDouble / n <= 0.5))
    }
    // the top-100 boilerplate set must actually hit some docs
    assert(rows.map(_.getAs[Long]("n_boiler")).sum > 0)
  }

  test("tfidf: per-lang top-10, scores descending, tie-break on token") {
    val rows = Text.tfidfTopTerms(spark, sfDir).collect()
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (lang, rs) =>
      assert(rs.length <= 10, s"$lang has ${rs.length} rows")
      val sorted = rs.sortBy(_.getAs[Int]("rk"))
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        val (sa, sb) = (a.getAs[Double]("tfidf"), b.getAs[Double]("tfidf"))
        val (ta, tb) = (a.getAs[String]("token"), b.getAs[String]("token"))
        assert(sa > sb || (sa == sb && ta < tb), s"$lang: ($sa,$ta) before ($sb,$tb)")
      }
    }
  }

  test("collocations: support floor respected, pmi matches direct recompute") {
    val rows = Text.collocations(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 25)
    rows.foreach(r => assert(r.getAs[Long]("n_ab") >= 10))
    // independent recompute of one bigram's PMI from raw token streams
    val docs = Tables.documents(spark, sfDir)
      .select(split(trim(lower(col("text"))), "\\s+").as("t"))
      .collect().map(_.getSeq[String](0).filter(_.nonEmpty))
    val uni = docs.flatten.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val bg = docs.flatMap(t => t.zip(t.tail)).groupBy(identity)
      .map { case (k, v) => k -> v.length.toLong }
    val tt = uni.values.sum.toDouble
    val bt = bg.values.sum.toDouble
    val r0 = rows.head
    val Array(a, b) = r0.getAs[String]("bigram").split(" ", 2)
    val expected = math.log(r0.getAs[Long]("n_ab") * tt * tt / (bt * uni(a) * uni(b)))
    assert(math.abs(r0.getAs[Double]("pmi") - expected) < 1e-3)
    assert(bg((a, b)) == r0.getAs[Long]("n_ab"))
  }

  test("components: member list consistent, label is min member, size >= 2") {
    val rows = Graph.components(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val members = r.getAs[String]("members").split(",").map(_.toLong)
      assert(members.length == r.getAs[Long]("n_nodes"))
      assert(members.min == r.getAs[Long]("component"), "label = min member id")
      assert(members.length >= 2, "no singleton components from an edge list")
    }
    // components partition the vertex set: no id in two components
    val all = rows.flatMap(_.getAs[String]("members").split(","))
    assert(all.distinct.length == all.length)
  }

  test("keep_best: keeper is the longest member of its dedup cluster") {
    val clusters = Dedup.dedupClusters(spark, sfDir).collect()
      .map(r => r.getAs[Long]("keep_id") -> r.getAs[String]("members").split(",").map(_.toLong))
      .toMap
    val chars = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val best = Dedup.keepBestPerCluster(spark, sfDir).collect()
    assert(best.map(_.getAs[Long]("cluster_id")).toSet == clusters.keySet)
    best.foreach { r =>
      val members = clusters(r.getAs[Long]("cluster_id"))
      val expect = members.maxBy(id => (chars(id), -id))
      assert(r.getAs[Long]("keep_doc") == expect, s"cluster ${r.get(0)}")
      assert(r.getAs[Long]("keep_chars") == chars(expect))
      assert(r.getAs[Long]("dropped_id_sum") == members.sum - expect)
    }
  }

  test("attribution: conversions partition the purchases, channels closed") {
    val ev = Tables.events(spark, sfDir)
    val nPurchases = ev.filter(col("event_type") === "purchase").count()
    val rows = EventTime.lastTouchAttribution(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("conversions")).sum == nPurchases)
    val channels = rows.map(_.getAs[String]("channel")).toSet
    assert(channels.subsetOf(Set("click", "view", "none")))
    assert((channels - "none").nonEmpty, "some purchase must have a touch")
  }

  test("asof nearest: equals the brute-force closest view per click") {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("es"), col("value"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("es"), col("event_id"), col("value"))
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("es"), col("event_id"))
      .as[(Long, Long, Long)].collect()
    val got = AsOf.eventAsofNearest(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("click_es"),
        Option(r.getAs[Any]("view_id")).map(_.asInstanceOf[Long])))
    // brute force: prev = latest view <= t (max es, then max id);
    // next = earliest view > t (min es, then min id); closer wins, tie prev
    val expected = clicks.map { case (u, t, _) =>
      val vs = views.getOrElse(u, Array.empty)
      val prev = vs.filter(_._2 <= t).sortBy(v => (-v._2, -v._3)).headOption
      val next = vs.filter(_._2 > t).sortBy(v => (v._2, v._3)).headOption
      val chosen = (prev, next) match {
        case (Some(p), Some(n)) => if (t - p._2 <= n._2 - t) Some(p) else Some(n)
        case (p, n) => p.orElse(n)
      }
      (u, t, chosen.map(_._3))
    }
    // compare as multisets keyed by (user, click time) — multiple clicks
    // at the same (user, es) get identical matches in both versions
    assert(got.sorted.toSeq == expected.toSeq.sorted)
  }

  test("pq codes: in range, error matches per-row recompute") {
    val rows = Vectors.pqCodes(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    rows.take(50).foreach { r =>
      val v = vecs(r.getAs[Long]("vec_id"))
      val codes = (0 until 4).map(s => r.getAs[Int](s"code$s"))
      codes.foreach(c => assert(c >= 0 && c < 8))
      // independent error recompute: sum over subspaces of ||sub - cent||²
      val err = (0 until 4).map { s =>
        val cent = Vectors.pqCodebooks(s)(codes(s))
        (0 until 16).map { d =>
          val diff = v(s * 16 + d).toDouble - cent(d)
          diff * diff
        }.sum
      }.sum
      assert(math.abs(err - r.getAs[Double]("recon_err")) < 1e-2,
        s"vec ${r.get(0)}: $err vs ${r.getAs[Double]("recon_err")}")
      // and the chosen code really is the argmax dot for its subspace
      (0 until 4).foreach { s =>
        val sub = (0 until 16).map(d => v(s * 16 + d).toDouble).toArray
        val dots = (0 until 8).map(c =>
          sub.zip(Vectors.pqCodebooks(s)(c)).map { case (x, w) => x * w }.sum)
        val bestDot = dots.max
        assert(math.abs(dots(codes(s)) - bestDot) < 1e-9,
          s"vec ${r.get(0)} sub $s: code ${codes(s)} dot ${dots(codes(s))} vs best $bestDot")
      }
    }
  }
}

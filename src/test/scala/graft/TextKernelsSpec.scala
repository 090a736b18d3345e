package graft

import graft.functions.TextKernels
import graft.ops.Dedup
import org.apache.spark.sql.functions._

class TextKernelsSpec extends SparkSpec {

  test("shingles kernel == composable shinglesCol on real documents") {
    val docs = Tables.documents(spark, sfDir).limit(100)
    val mismatches = docs.select(
      TextKernels.shinglesKernel(col("text"), 3).as("k"),
      Dedup.shinglesCol(col("text"), 3).as("h"))
      .filter(col("k") =!= col("h"))
      .count()
    assert(mismatches == 0)
  }

  test("minhash kernel: identical shingle sets give identical signatures") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the  QUICK brown fox jumps over the lazy dog"), // ws/case only
      (3L, "a completely different sentence altogether here")).toDF("id", "text")
    val sigs = df.select(col("id"),
      TextKernels.minhashSigKernel(TextKernels.shinglesKernel(col("text"), 3), 32).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Long]]("sig")).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
    assert(sigs(1L).length == 32)
  }

  test("minhash kernel estimates jaccard on overlapping sets") {
    import spark.implicits._
    // two docs sharing ~half their shingles
    val a = (1 to 40).map(i => s"tok$i").mkString(" ")
    val b = (21 to 60).map(i => s"tok$i").mkString(" ")
    val df = Seq((1L, a), (2L, b)).toDF("id", "text")
    val sigs = df.select(
      TextKernels.minhashSigKernel(TextKernels.shinglesKernel(col("text"), 3), 128).as("sig"))
      .collect().map(_.getAs[scala.collection.Seq[Long]]("sig"))
    val matches = sigs(0).zip(sigs(1)).count { case (x, y) => x == y }
    val est = matches.toDouble / 128
    // true shingle jaccard: |A∩B|=18 of |A∪B|=58 -> ~0.24
    assert(est > 0.05 && est < 0.5, s"est $est")
  }

  test("simhash kernel: near-identical texts give near hamming distance") {
    import spark.implicits._
    val df = Seq(
      (1L, "spark is a unified analytics engine for large scale data"),
      (2L, "spark is a unified analytics engine for large scale info"),
      (3L, "completely unrelated short text")).toDF("id", "text")
    val hs = df.select(col("id"), TextKernels.simhashKernel(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(hs(1L), hs(2L)) < hamming(hs(1L), hs(3L)))
  }

  test("termFreqs kernel: counts, case/whitespace normalization, empty text") {
    import spark.implicits._
    val terms = array(lit("spark"), lit("join"))
    val rows = Seq(
      (1L, "  Spark SPARK join x  "),
      (2L, ""),
      (3L, "nothing relevant here")).toDF("id", "text")
      .select(col("id"), TextKernels.termFreqsKernel(col("text"), terms).as("t"))
      .collect().map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Long]]("t")).toMap
    assert(rows(1L) == Seq(4L, 2L, 1L)) // [n_tokens, tf(spark), tf(join)]
    assert(rows(2L) == Seq(0L, 0L, 0L))
    assert(rows(3L) == Seq(3L, 0L, 0L))
  }

  test("gopherStats kernel: word count, total chars, DISTINCT stop hits") {
    import spark.implicits._
    val stops = array(lit("the"), lit("of"))
    val out = Seq((1L, "The the cat of it")).toDF("id", "text")
      .select(TextKernels.gopherStatsKernel(col("text"), stops).as("g"))
      .first().getAs[scala.collection.Seq[Long]]("g")
    // 5 words, 3+3+3+2+2 = 13 chars, both stopwords present (distinct = 2,
    // not 3 occurrences)
    assert(out == Seq(5L, 13L, 2L))
  }

  test("langScores kernel: per-language occurrence counts in one pass") {
    import spark.implicits._
    val markers = array(array(lit("der"), lit("und")), array(lit("the"), lit("and")))
    val out = Seq((1L, "the cat AND the dog und der")).toDF("id", "text")
      .select(TextKernels.langScoresKernel(col("text"), markers).as("s"))
      .first().getAs[scala.collection.Seq[Long]]("s")
    assert(out == Seq(2L, 3L)) // de: und+der = 2; en: the×2 + and = 3
  }
}

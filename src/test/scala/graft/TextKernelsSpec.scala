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

  test("repStats kernel: tokens, distinct, top bigram, bigram total") {
    import spark.implicits._
    val rows = Seq(
      (1L, "  a B a b A b  "),   // toks: a b a b a b -> 6 toks, 2 distinct,
                                 // bigrams: "a b"×3 "b a"×2 -> top 3 of 5
      (2L, "solo"),              // 1 token -> no bigrams
      (3L, "")).toDF("id", "text")
      .select(col("id"), TextKernels.repStatsKernel(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Long]]("r")).toMap
    assert(rows(1L) == Seq(6L, 2L, 3L, 5L))
    assert(rows(2L) == Seq(1L, 1L, 0L, 0L))
    assert(rows(3L) == Seq(0L, 0L, 0L, 0L))
  }

  test("repStats kernel matches the composable explode/agg form on real docs") {
    val docs = Tables.documents(spark, sfDir).limit(200)
    val toks = filter(split(trim(lower(col("text"))), "\\s+"), t => t =!= "")
    val composable = docs
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"))
    val bigramTop = composable.filter(col("n_tokens") >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(2, size(toks)), i -> concat(element_at(toks, i - 1), ' ', element_at(toks, i)))"))
        .as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("top_bg"), sum(col("c")).as("n_bg"))
    val expected = composable.join(bigramTop, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        coalesce(col("top_bg"), lit(0L)).as("top_bg"),
        coalesce(col("n_bg"), lit(0L)).as("n_bg"))
    val kernel = docs.select(col("doc_id"),
      TextKernels.repStatsKernel(col("text")).as("r"))
      .select(col("doc_id"),
        element_at(col("r"), 1).as("n_tokens"),
        element_at(col("r"), 2).as("n_distinct"),
        element_at(col("r"), 3).as("top_bg"),
        element_at(col("r"), 4).as("n_bg"))
    assert(kernel.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(kernel).count() == 0)
  }

  test("trigramScore kernel survives null trigrams and null model keys") {
    import spark.implicits._
    // null trigram element -> scored as absent (count 1); null key -> skipped
    val score = Seq(1).toDF("x").select(
      TextKernels.trigramScoreKernel(
        array(lit("abc"), lit(null).cast("string")),
        array(lit(null).cast("string"), lit("abc")),
        array(lit(7L), lit(4L)),
        lit(10.0)).as("s"))
      .first().getDouble(0)
    // "abc": binary search over [null, "abc"] must find count 4 (null sorts
    // first); null trigram scores log(1/10)
    val expected = (math.log(4.0 / 10.0) + math.log(1.0 / 10.0)) / 2
    assert(math.abs(score - expected) < 1e-12, s"got $score want $expected")
    // a matched key whose COUNT slot is null degrades to the absent-trigram
    // count 1 — not getLong's unboxed 0, which would emit ln 0 = -Infinity
    val nullCount = Seq(1).toDF("x").select(
      TextKernels.trigramScoreKernel(
        array(lit("abc")), array(lit("abc")),
        array(lit(null).cast("bigint")), lit(10.0)).as("s"))
      .first().getDouble(0)
    assert(math.abs(nullCount - math.log(1.0 / 10.0)) < 1e-12, s"got $nullCount")
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

package graft

import graft.ops._
import org.apache.spark.sql.functions._

/** Planted-duplicate fixtures: the driver corpora contain no real
  * near-duplicates (VERDICT r1: `emb_near_dup` finds only noise pairs), so
  * these suites synthesize corpora with KNOWN duplicate pairs and assert
  * the LSH pipelines actually find them — the assertions that validate the
  * tuned parameters (bands×rows, tables×bits, thresholds) rather than just
  * the plan shapes. The SimHash banding test is stronger than recall: the
  * 4×16-bit pigeonhole is provably EXACT for hamming ≤ 3, so the banded
  * result must set-equal brute force.
  */
class RecallSpec extends SparkSpec {

  // fixed seed — fully deterministic fixtures
  private val rng = new scala.util.Random(1234)

  /** 40 base docs of 80 tokens over a 2k vocab; docs 100+i are near-dups
    * of base doc i with 3 of 80 tokens replaced (shingle Jaccard ≈ 0.8),
    * the first 5 of them byte-identical (Jaccard 1, hamming 0). */
  private lazy val plantedDocs = {
    import spark.implicits._
    val vocab = Array.tabulate(2000)(i => s"w$i")
    val bases = Array.tabulate(40)(_ => Array.fill(80)(vocab(rng.nextInt(vocab.length))))
    val rows = bases.zipWithIndex.map { case (toks, i) => (i.toLong, toks.mkString(" ")) } ++
      (0 until 5).map(i => ((100 + i).toLong, bases(i).mkString(" "))) ++
      (5 until 15).map { i =>
        val toks = bases(i).clone()
        (0 until 3).foreach(_ => toks(rng.nextInt(toks.length)) = vocab(rng.nextInt(vocab.length)))
        ((100 + i).toLong, toks.mkString(" "))
      }
    rows.toSeq.toDF("doc_id", "text")
  }

  test("MinHash-LSH recall >= 0.9 on planted near-dup pairs") {
    val found = Dedup.minhashPairsDf(plantedDocs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val planted = (0 until 15).map(i => (i.toLong, (100 + i).toLong)).toSet
    val recall = planted.count(found).toDouble / planted.size
    assert(recall >= 0.9, s"recall $recall (found ${found.size} pairs total)")
  }

  test("MinHash-LSH finds no pairs among independent random docs") {
    import spark.implicits._
    val vocab = Array.tabulate(2000)(i => s"w$i")
    val rand = new scala.util.Random(99)
    val indep = (0 until 40)
      .map(i => (i.toLong, Array.fill(80)(vocab(rand.nextInt(vocab.length))).mkString(" ")))
      .toDF("doc_id", "text")
    assert(Dedup.minhashPairsDf(indep).count() == 0)
  }

  test("SimHash hamming<=3 banding is EXACT: set-equals brute force") {
    import org.apache.spark.sql.functions.col
    val banded = Dedup.simhashNearPairsDf(plantedDocs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val fps = plantedDocs
      .select(col("doc_id"),
        graft.functions.TextKernels.simhashKernel(col("text")).as("simhash"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("simhash")))
    val brute = (for {
      (a, fa) <- fps; (b, fb) <- fps if a < b
      if java.lang.Long.bitCount(fa ^ fb) <= 3
    } yield (a, b)).toSet
    // the 5 exact duplicates guarantee hamming-0 pairs exist
    assert(brute.size >= 5, s"expected >=5 brute pairs, got ${brute.size}")
    assert(banded == brute, s"banded ${banded.size} vs brute ${brute.size}")
  }

  test("embedding LSH near-dup recall >= 0.9 on planted high-cosine pairs") {
    import spark.implicits._
    val dim = 64
    val base = Array.tabulate(30)(_ => Array.fill(dim)(rng.nextGaussian().toFloat))
    val rows = base.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) } ++
      (0 until 12).map { i =>
        ((100 + i).toLong, base(i).map(x => x + 0.05f * rng.nextGaussian().toFloat).toSeq)
      }
    val emb = rows.toSeq.toDF("vec_id", "embedding")
    val found = Vectors.cosineNearDupPairsDf(emb).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val planted = (0 until 12).map(i => (i.toLong, (100 + i).toLong)).toSet
    val recall = planted.count(found).toDouble / planted.size
    assert(recall >= 0.9, s"recall $recall (found ${found.size} pairs total)")
  }

  test("connected components over the MinHash pair graph (100 TB composition)") {
    import org.apache.spark.sql.functions.col
    val pairs = Dedup.minhashPairsDf(plantedDocs).select(col("doc_a"), col("doc_b"))
    val labels = Dedup.connectedComponents(pairs, "doc_a", "doc_b").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("label")).toMap
    assert(labels.nonEmpty)
    // every planted (i, 100+i) pair that made it into the graph shares a label
    (0 until 15).foreach { i =>
      (labels.get(i.toLong), labels.get((100 + i).toLong)) match {
        case (Some(a), Some(b)) => assert(a == b, s"pair ($i, ${100 + i}) split")
        case _ => ()
      }
    }
    // labels are cluster minima: the label node labels itself
    labels.values.toSet.foreach((l: Long) => assert(labels(l) == l))
  }

  test("minhash cluster reps agree with all-pairs clustering on planted replicas") {
    import org.apache.spark.sql.functions.col
    // chain-emission semantics coincides with all-pairs clustering when
    // bucket co-members verify transitively — true of planted replica
    // clusters (the production case the operator exists for)
    val reps = Dedup.minhashClusterRepsDf(plantedDocs).collect()
      .map(r => (r.getAs[Long]("rep_id"), r.getAs[Long]("n_members"),
        r.getAs[Long]("id_sum"), r.getAs[Long]("max_id"))).toSet
    val pairs = Dedup.minhashPairsDf(plantedDocs).select(col("doc_a"), col("doc_b"))
    val allPairs = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"), sum(col("id")).as("s"), max(col("id")).as("m"))
      .collect()
      .map(r => (r.getAs[Long]("label"), r.getAs[Long]("n"),
        r.getAs[Long]("s"), r.getAs[Long]("m"))).toSet
    assert(reps.nonEmpty, "no clusters found on the planted corpus")
    assert(reps == allPairs,
      s"chain-emission clusters ${reps.size} != all-pairs clusters ${allPairs.size}")
  }

  test("simhash cluster reps agree with all-pairs clustering on planted replicas") {
    import org.apache.spark.sql.functions.col
    val reps = Dedup.simhashClusterRepsDf(plantedDocs).collect()
      .map(r => (r.getAs[Long]("rep_id"), r.getAs[Long]("n_members"),
        r.getAs[Long]("id_sum"), r.getAs[Long]("max_id"))).toSet
    val pairs = Dedup.simhashNearPairsDf(plantedDocs).select(col("doc_a"), col("doc_b"))
    val allPairs = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"), sum(col("id")).as("s"), max(col("id")).as("m"))
      .collect()
      .map(r => (r.getAs[Long]("label"), r.getAs[Long]("n"),
        r.getAs[Long]("s"), r.getAs[Long]("m"))).toSet
    // the 5 byte-identical replicas guarantee hamming-0 clusters exist
    assert(reps.nonEmpty, "no simhash clusters found on the planted corpus")
    // structural for simhash: both sides consume the same verified graph
    assert(reps == allPairs,
      s"simhash reps clusters ${reps.size} != all-pairs clusters ${allPairs.size}")
  }

  test("minhash cluster reps: empty output on an all-distinct corpus") {
    import spark.implicits._
    val vocab = Array.tabulate(2000)(i => s"w$i")
    val rand = new scala.util.Random(42)
    val indep = (0 until 40)
      .map(i => (i.toLong, Array.fill(80)(vocab(rand.nextInt(vocab.length))).mkString(" ")))
      .toDF("doc_id", "text")
    // no verified pairs -> no clusters -> zero rows (singletons are
    // never emitted; CC over an empty edge list must not blow up)
    assert(Dedup.minhashClusterRepsDf(indep).count() == 0)
  }

  test("k-means centroids: <= nlist rows, 64 double dims, stable ids") {
    val emb = Tables.embeddings(spark, sfDir)
    val cents = Vectors.kmeansCentroids(emb, nlist = 8, iters = 2).collect()
    assert(cents.nonEmpty && cents.length <= 8)
    cents.foreach { r =>
      assert(r.getSeq[Double](r.fieldIndex("cent_vec")).length == 64)
    }
  }

  test("IVF ANN (k-means centroids) recalls brute-force top-3") {
    val bf = Vectors.annBruteForce(spark, sfDir).collect()
      .filter(_.getAs[Int]("rk") <= 3)
      .groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.map(_.getAs[Long]("c_id")).toSet).toMap
    val ivf = Vectors.annIvf(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.map(_.getAs[Long]("c_id")).toSet).toMap
    assert(ivf.nonEmpty)
    val recalls = bf.keys.toSeq.map { q =>
      (ivf.getOrElse(q, Set.empty[Long]) intersect bf(q)).size.toDouble / 3.0
    }
    // measured 0.90 with k-means centroids (was ~0.5 with the first-nlist
    // placeholder); 0.6 leaves margin for FP wobble in the parallel means
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.6, s"mean recall@3 = $mean (nprobe 4 of nlist 16)")
  }

  test("trained PQ codebooks reconstruct better than the fixed ±1 codebooks") {
    val n = Tables.embeddings(spark, sfDir).count()
    val fixedAvg = Vectors.pqCodes(spark, sfDir)
      .agg(org.apache.spark.sql.functions.avg("recon_err")).first().getDouble(0)
    val rows = Vectors.pqCodesTrained(spark, sfDir).collect()
    assert(rows.length == n)
    rows.foreach { r =>
      (0 until 4).foreach { s =>
        val c = r.getAs[Int](s"code$s")
        assert(c >= 0 && c < 8, s"code$s out of range: $c")
      }
      // err = sum of exact ||v-c||^2 per subspace; small negative FP dust
      // is impossible because each term is v.v - 2(v.c - c.c/2) evaluated
      // on doubles, but allow rounding slack at the 4dp render
      assert(r.getAs[Double]("recon_err") >= -1e-4)
    }
    val trainedAvg = rows.map(_.getAs[Double]("recon_err")).sum / n
    // the whole point of training: strictly better average reconstruction
    // than the deterministic sign codebooks (measured ~70x at sf0.001)
    assert(trainedAvg < fixedAvg,
      s"trained avg MSE $trainedAvg not better than fixed $fixedAvg")
  }
}

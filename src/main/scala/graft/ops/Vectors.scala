package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}

/** Similarity search over the `embeddings` table (`embedding:
  * array<float>`, 64-dim) — beyond-reference (BASELINE.json north star).
  *
  * Two paths, as a real pipeline would have:
  *   - brute-force cosine top-k: exact baseline. The query set is broadcast,
  *     so the corpus side streams map-side only — no shuffle of the corpus;
  *     the per-query top-k is a windowed rank over (query, candidate) scores.
  *   - multi-table random-hyperplane LSH: L independent code tables of b
  *     sign bits each; candidates = vector pairs sharing a code in ANY
  *     table (banding, same recall structure as MinHash LSH). Bucketing is
  *     pure map-side expression work; the candidate join is an equi-join on
  *     (table, code). At 100 TB this replaces the O(N·Q) scan with per-
  *     bucket work, and L/b tune recall vs fan-out.
  *
  * All vector math runs compiled — either the native codegen'd
  * expressions ([[dotCol]]/[[cosineCol]]) or, where a whole scoring loop
  * over a broadcast centroid array is needed per row, a StaticInvoke JVM
  * kernel ([[graft.functions.GraftFunctions.centroidTopIds]]). Never
  * inside higher-order-function lambdas, which Spark evaluates in
  * interpreted mode (CodegenFallback). No UDF serialization, no
  * driver-side loops.
  */
object Vectors {

  /** dot/cosine via the codegen'd native expressions
    * ([[graft.functions.DotProduct]]/[[graft.functions.CosineSimilarity]]);
    * the composable higher-order-function forms are kept for the
    * equivalence spec. */
  def dotCol(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.vecDot(a, b)

  def cosineCol(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.vecCosine(a, b)

  /** Reference implementations as higher-order functions (interpreted —
    * ~4-5x slower; used to cross-check the native expressions). */
  def dotColHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def cosineColHof(a: Column, b: Column): Column =
    dotColHof(a, b) / (sqrt(dotColHof(a, a)) * sqrt(dotColHof(b, b)))

  private[ops] val Dim = 64
  private[ops] val Tables_ = 8  // L: number of independent LSH tables
  private[ops] val Bits = 6     // b: sign bits per table

  /** Deterministic random hyperplanes (seeded PRNG — plans must be stable
    * across runs): Tables_ × Bits planes of ±1 weights over Dim dims. */
  private[ops] lazy val planes: Array[Array[Array[Double]]] = {
    val rng = new scala.util.Random(42)
    Array.fill(Tables_, Bits, Dim)(if (rng.nextBoolean()) 1.0 else -1.0)
  }

  /** b-bit sign code of `vec` under table `t`'s hyperplanes. */
  def lshCodeCol(vec: Column, t: Int): Column = {
    val bits = planes(t).zipWithIndex.map { case (w, p) =>
      val planeLit = array(w.toIndexedSeq.map(lit): _*)
      when(dotCol(vec, planeLit) > 0, lit(1 << p)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  /** (table, code) bucket entries for all L tables, as an array to explode. */
  def lshBucketsCol(vec: Column): Column =
    array((0 until Tables_).map(t =>
      struct(lit(t).as("t"), lshCodeCol(vec, t).as("code"))): _*)

  /** All L table codes of a FLOAT embedding in one compiled call — the
    * hot-path form of [[lshBucketsCol]]: the expression form is L×b = 48
    * separate 64-dim literal-array dot expressions per row, a generated
    * method far past the JIT huge-method limit (same pathology as the
    * PQ CASE trees — the projection de-optimizes to interpreted).
    * Bit-for-bit identical: each dot accumulates left-to-right over
    * (float→double)·(±1 double) products and sets bit p iff dot > 0,
    * exactly like the expression and the oracle's `list_dot_product`
    * replay. Element index = table id (consume with posexplode). */
  def lshCodesOf(vec: ArrayData): ArrayData = {
    val out = new Array[Any](Tables_)
    var t = 0
    while (t < Tables_) {
      var code = 0
      var p = 0
      while (p < Bits) {
        val w = planes(t)(p)
        val m = math.min(vec.numElements(), Dim)
        var dot = 0.0
        var i = 0
        while (i < m) {
          if (!vec.isNullAt(i)) dot += vec.getFloat(i).toDouble * w(i)
          i += 1
        }
        if (dot > 0) code |= 1 << p
        p += 1
      }
      out(t) = code
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Column form of [[lshCodesOf]]. */
  private[graft] def lshCodesKernel(vec: Column): Column =
    bridge.column(StaticInvoke(
      Vectors.getClass,
      ArrayType(IntegerType, containsNull = false),
      "lshCodesOf",
      Seq(bridge.expression(vec)),
      returnNullable = false))

  /** The hyperplane codes rendered as DuckDB SQL — the planes are
    * deterministic ±1 literals, so the ENTIRE LSH pipeline is
    * reproducible in the oracle engine (one UNION ALL branch per table,
    * each code bit a `list_dot_product(e, [±1, …]) > 0` test). Both
    * engines iterate the dot product left-to-right over exact ±1·float
    * products, so the sign test cannot diverge at the FP level. */
  def lshOracleCodes: String =
    (0 until Tables_).map { t =>
      val bits = (0 until Bits).map { p =>
        val arr = planes(t)(p).map(w => if (w > 0) "1.0" else "-1.0")
          .mkString("[", ", ", "]")
        s"(CASE WHEN list_dot_product(e, $arr) > 0 THEN ${1 << p} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT vec_id, $t AS t, $bits AS code FROM v"
    }.mkString("\nUNION ALL\n")

  private def withBuckets(df: DataFrame, idAs: String, vecAs: String): DataFrame =
    df.select(col("vec_id").as(idAs), col("embedding").as(vecAs))
      .select(col(idAs), col(vecAs),
        posexplode(lshCodesKernel(col(vecAs))).as(Seq("t", "code")))

  /** Exact brute-force cosine top-k: queries = vec_id < 10 (broadcast),
    * k = 5 neighbors each, self-match excluded, deterministic id tiebreak. */
  def annBruteForce(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val corpus = emb.select(col("vec_id").as("c_id"),
      col("embedding").as("c_vec"), col("label"))
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"), col("label"),
        cosineCol(col("q_vec"), col("c_vec")).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id").asc)
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("q_id"), col("rk"), col("c_id"), col("label"), round(col("cos"), 4).as("cos"))
      .orderBy("q_id", "rk")
  }

  /** Range search — ALL corpus vectors within a cosine radius of each
    * query (the "give me everything similar enough" retrieval mode, vs
    * top-k's fixed cut): queries broadcast, corpus scored map-side, the
    * threshold compares the ROUNDED similarity so the cut line is
    * cross-engine stable. Same scale shape as [[annBruteForce]] — the
    * only shuffle is the output sort; at 100 TB the same thresholded
    * scoring runs per LSH/IVF candidate bucket instead of the full scan
    * (compose [[annLsh]]'s candidate join with this filter). */
  def rangeSearch(spark: SparkSession, dir: String, tau: Double = 0.25): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val corpus = emb.select(col("vec_id").as("c_id"),
      col("embedding").as("c_vec"), col("label"))
    corpus.crossJoin(broadcast(queries))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"), col("label"),
        round(cosineCol(col("q_vec"), col("c_vec")), 4).as("cos"))
      .filter(col("cos") >= tau)
      .orderBy("q_id", "c_id")
  }

  /** Multi-table LSH ANN: candidates share a code with the query in ≥1 of
    * the L tables; exact cosine re-rank keeps top-3 per query. The bucket
    * join carries only ids — vectors are joined back per unique candidate
    * pair. */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val vecs = emb.select(col("vec_id"), col("embedding").as("vec"))
    val corpus = withBuckets(emb, "c_id", "c_vec").select(col("t"), col("code"), col("c_id"))
    val queries = withBuckets(emb.filter(col("vec_id") < 10), "q_id", "q_vec")
      .select(col("t"), col("code"), col("q_id"))
    val cands = corpus.join(broadcast(queries), Seq("t", "code"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id")).distinct()
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id").asc)
    cands
      .join(vecs.select(col("vec_id").as("q_id"), col("vec").as("q_vec")), Seq("q_id"))
      .join(vecs.select(col("vec_id").as("c_id"), col("vec").as("c_vec")), Seq("c_id"))
      .select(col("q_id"), col("c_id"), cosineCol(col("q_vec"), col("c_vec")).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("q_id"), col("rk"), col("c_id"), round(col("cos"), 4).as("cos"))
      .orderBy("q_id", "rk")
  }

  /** Embedding near-duplicate pairs: LSH-banded candidate generation +
    * exact cosine ≥ 0.45 verification — the embedding-space analog of
    * Dedup.minhashPairs, with the same narrow-shuffle plan shape (id pairs
    * explode from capped bucket lists; vectors join back per pair).
    * (Driver data has no planted high-cosine dups; 0.45 sits just above
    * the similarity noise floor, max ≈ 0.51.) */
  def cosineNearDupPairs(spark: SparkSession, dir: String): DataFrame =
    nearDupPairsMemo(spark, dir).orderBy("id_a", "id_b")

  /** Memoized, checkpoint-materialized near-dup pair list per (session,
    * dir) — [[cosineNearDupPairs]] and [[embDupClusters]] both consume
    * it, so the LSH-bucket/pair-explode/cosine-verify pipeline (the
    * family's dominant cost) runs once, not once per query. */
  private def nearDupPairsMemo(spark: SparkSession, dir: String): DataFrame =
    graft.ops.PlanMemo.getOrBuild(spark, dir, "vectors.nearDupPairs") {
      cosineNearDupPairsDf(Tables.embeddings(spark, dir))
    }

  /** Core over any (vec_id, embedding) DataFrame — lets the recall specs
    * run the identical pipeline on synthetic corpora with planted
    * duplicates (driver data has none). */
  def cosineNearDupPairsDf(emb: DataFrame): DataFrame = {
    import graft.functions.GraftFunctions.sortedLongPairsKernel
    val vecs = emb.select(col("vec_id"), col("embedding").as("vec"))
    // 2..2000 cap enforced inside the aggregation (Dedup.cappedBuckets):
    // a hot LSH code never materializes its full membership list
    val pairs = graft.ops.Dedup.cappedBuckets(
        withBuckets(emb, "id", "v").select(col("t"), col("code"), col("id")),
        Seq("t", "code"), "id", lo = 2, hi = 2000)
      .select(explode(sortedLongPairsKernel(col("ids"))).as("p"))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"))
      .distinct()
    pairs
      .join(vecs.select(col("vec_id").as("id_a"), col("vec").as("vec_a")), Seq("id_a"))
      .join(vecs.select(col("vec_id").as("id_b"), col("vec").as("vec_b")), Seq("id_b"))
      // threshold compares the ROUNDED similarity (ann_range_search
      // pattern): a last-ulp cross-engine difference at the cut line would
      // flip an edge — and downstream [[embDupClustersDf]] feeds these
      // edges into transitive closure, where one flipped edge reshapes
      // whole clusters
      .select(col("id_a"), col("id_b"),
        round(cosineCol(col("vec_a"), col("vec_b")), 4).as("cos"))
      .filter(col("cos") >= 0.45)
      .orderBy("id_a", "id_b")
  }

  /** SEMANTIC dedup clusters: the embedding-space near-dup pair graph
    * ([[cosineNearDupPairsDf]] — LSH-banded candidates, exact-cosine
    * verified) closed into clusters by the same label-propagation
    * connected components the text dedup family uses
    * ([[graft.ops.Dedup.connectedComponents]]) — keeper = smallest id.
    * This is the composition a training-data pipeline runs when "same
    * content" means same MEANING, not same n-grams: paraphrases and
    * translations collapse here that every lexical signal misses. The
    * pair source is deterministic (fixed hyperplanes), so the whole
    * composition — LSH, verification, transitive closure — is replayable
    * in DuckDB (recursive-CTE closure over the SQL-rendered LSH pairs). */
  def embDupClusters(spark: SparkSession, dir: String): DataFrame =
    clustersFromPairs(nearDupPairsMemo(spark, dir).select(col("id_a"), col("id_b")))

  /** Core of [[embDupClusters]] over any (vec_id, embedding) DataFrame.
    * EAGER: the pair graph materializes at construction (reliable
    * checkpoint when [[Dedup.CheckpointDirKey]] is set). */
  def embDupClustersDf(emb: DataFrame): DataFrame = {
    // eager checkpoint: truncates the LSH/cosine lineage under the CC
    // rounds and lets this operator leave no cache behind (CacheHygieneSpec)
    val pairs = truncate(cosineNearDupPairsDf(emb)
      .select(col("id_a"), col("id_b")))
    clustersFromPairs(pairs)
  }

  /** Transitive closure + cluster rollup over a materialized (id_a, id_b)
    * pair list — the shared tail of [[embDupClusters]] (memoized pairs)
    * and [[embDupClustersDf]] (self-built pairs). */
  private def clustersFromPairs(pairs: DataFrame): DataFrame =
    graft.ops.Dedup.connectedComponents(pairs, "id_a", "id_b")
      .groupBy(col("label").as("keep_id"))
      .agg(count(lit(1)).as("cluster_size"),
        sort_array(collect_list(col("id"))).as("members"))
      .select(col("keep_id"), col("cluster_size"),
        concat_ws(",", col("members")).as("members"))
      .orderBy("keep_id")

  /** The full centroid table collapsed to ONE row holding an array of
    * (cent_id, cent_vec) structs — broadcastable, so centroid assignment
    * becomes a pure map-side operation (a crossJoin with one row + a
    * per-row argsort over ≤nlist entries), with NO shuffle of the corpus.
    * A window/groupBy argmax would shuffle every corpus vector instead. */
  private def centsRow(cents: DataFrame): DataFrame =
    cents.agg(collect_list(struct(col("cent_id"), col("cent_vec"))).as("cents"))

  /** Attach each input row's top-`keep` centroids by cosine as `cent_id`
    * (one output row per kept centroid). `df` must carry an `embedding`
    * column; all other columns pass through. Ties break to the smaller
    * cent_id (deterministic). */
  private def assignCentroid(df: DataFrame, centsOne: DataFrame, keep: Int,
                             centsFloat: Boolean): DataFrame = {
    // top-`keep` centroids per row in ONE compiled kernel call
    // ([[graft.functions.GraftFunctions.centroidTopIds]]): the former
    // transform/array_sort lambda chain evaluated every cosine in
    // interpreted mode (HOFs are CodegenFallback — measured ~160 µs/row,
    // 3.2 s over a 20k-row corpus at sf1), and unrolled cosine
    // EXPRESSIONS exceed the JIT's huge-method limit. The kernel mirrors
    // the native cosine's accumulation order bit-for-bit and keeps the
    // (cos desc, cent_id asc) pick rule. Still the single-row broadcast
    // crossJoin shape: assignment stays pure map-side, no corpus shuffle.
    import graft.functions.GraftFunctions.centroidTopIdsKernel
    val passThrough = df.columns.map(col)
    df.crossJoin(broadcast(centsOne))
      .select(passThrough.toIndexedSeq :+
        explode(centroidTopIdsKernel(col("embedding"), col("cents"),
          lit(keep), lit(true), lit(centsFloat))).as("cent_id"): _*)
  }

  private[graft] val PqSub = 4        // subspaces
  private[graft] val PqSubDim = Dim / PqSub
  private[graft] val PqCents = 8      // codebook entries per subspace

  /** Deterministic ±1 product-quantization codebooks (seeded PRNG, same
    * discipline as [[planes]]): PqSub × PqCents × PqSubDim sign patterns.
    * ±1 entries make the nearest-centroid argmin FP-exact cross-engine:
    * ‖v−c‖² = v·v − 2·v·c + PqSubDim, so argmin distance ≡ argmax v·c,
    * and a ±1 dot product is a left-to-right sum of EXACT sign-flipped
    * floats — bit-identical in Spark and DuckDB, like the LSH sign
    * tests. */
  private[graft] lazy val pqCodebooks: Array[Array[Array[Double]]] = {
    val rng = new scala.util.Random(7)
    Array.fill(PqSub, PqCents, PqSubDim)(if (rng.nextBoolean()) 1.0 else -1.0)
  }

  /** Product-quantization codes: split each embedding into [[PqSub]]
    * subvectors, assign each to its nearest ±1 codebook entry (argmax
    * dot, ties to the smaller code — rendered as greatest() + a
    * first-match CASE chain in BOTH engines), and report the exact
    * reconstruction error via the dot identity above. 64 dims collapse
    * to 4 bytes/vector — the memory layout every billion-scale ANN index
    * (FAISS IVFPQ) uses; at scale the codes join an IVF list and the
    * query side scores against 4 lookup tables instead of 64 floats.
    * Pure map-side: codebooks are literals, no shuffle but the output
    * sort. */
  /** Subspace `s` of `vec` (1-based slice, PqSubDim wide). */
  private[graft] def pqSub(vec: Column, s: Int): Column =
    slice(vec, s * PqSubDim + 1, PqSubDim)

  /** The PqCents codebook dots of `vec`'s subspace `s` — shared by the
    * code assignment ([[pqCodes]]) and the query-side ADC lookup tables
    * ([[annIvfPq]]). */
  private[graft] def pqDots(vec: Column, s: Int): Seq[Column] =
    (0 until PqCents).map { c =>
      val centLit = array(pqCodebooks(s)(c).toIndexedSeq.map(lit): _*)
      dotCol(pqSub(vec, s), centLit)
    }

  /** Subspace `s`'s PQ code for `vec`: first code reaching the max dot
    * (first match wins → smallest code on ties, same rule both engines).
    * Fall-through (only reachable when the dots contain NaN, i.e. a
    * NaN/null embedding entry) is NULL — the same value the oracle's CASE
    * chains produce, and a null ADC `element_at` index yields null rather
    * than the runtime error a -1 sentinel would cause at index 0. */
  private[graft] def pqCodeCol(vec: Column, s: Int): Column = {
    val ds = pqDots(vec, s)
    val best = greatest(ds: _*)
    ds.zipWithIndex.foldRight(lit(null).cast("int"): Column) { case ((d, c), e) =>
      when(d === best, lit(c)).otherwise(e)
    }
  }

  /** All [[PqSub]] PQ codes of a FLOAT embedding in one compiled call —
    * the hot-path form of [[pqCodeCol]] for the ann_ivf_pq corpus side.
    * The expression form inlines `greatest(8 dots)` into every CASE
    * branch (~288 dot nodes per row); it never reaches WholeStageCodegen
    * and, worse, Catalyst inlines the whole tree past the candidate join
    * so it re-evaluates PER CANDIDATE (measured: the corpus projection
    * alone ran ~230 µs/row interpreted at sf1). This kernel mirrors the
    * expression arithmetic exactly — per-codebook dots accumulate
    * left-to-right over (float→double)·(±1 double) products, `greatest`
    * semantics for NaN (any NaN dot → NULL code, like the CASE
    * fall-through), first-match-wins tie rule — so results stay
    * bit-identical to [[pqCodes]] and the DuckDB oracle replay. */
  def pqCodesOf(vec: ArrayData): ArrayData = {
    val out = new Array[Any](PqSub)
    var s = 0
    while (s < PqSub) {
      val cb = pqCodebooks(s)
      val off = s * PqSubDim
      // mirror slice-then-dot on SHORT embeddings: slice past the array
      // end yields a shorter (or empty) subvector, so bound the loop by
      // the actual element count instead of reading out of range
      val lim = math.min(PqSubDim, math.max(0, vec.numElements() - off))
      val d = new Array[Double](PqCents)
      var anyNaN = false
      var c = 0
      while (c < PqCents) {
        val w = cb(c)
        var dot = 0.0
        var i = 0
        while (i < lim) {
          if (!vec.isNullAt(off + i)) dot += vec.getFloat(off + i).toDouble * w(i)
          i += 1
        }
        d(c) = dot
        if (dot.isNaN) anyNaN = true
        c += 1
      }
      if (anyNaN) out(s) = null
      else {
        var best = d(0); c = 1
        while (c < PqCents) { if (d(c) > best) best = d(c); c += 1 }
        var code = 0
        while (d(code) != best) code += 1
        out(s) = code
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Column form of [[pqCodesOf]]: array of PqSub codes (null entries on
    * NaN dots, matching the expression form's NULL). */
  private[graft] def pqCodesKernel(vec: Column): Column =
    bridge.column(StaticInvoke(
      Vectors.getClass,
      ArrayType(IntegerType, containsNull = true),
      "pqCodesOf",
      Seq(bridge.expression(vec)),
      returnNullable = false))

  def pqCodes(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    def sub(s: Int): Column = pqSub(col("embedding"), s)
    def dots(s: Int): Seq[Column] = pqDots(col("embedding"), s)
    // per subspace: best = greatest(d0..d7); code = first c with d_c = best
    // (first match wins → smallest code on ties, same rule both engines)
    def codeAndErr(s: Int): (Column, Column) = {
      val ds = dots(s)
      val best = greatest(ds: _*)
      // foldRight builds when(d0=best, 0).otherwise(when(d1=best, 1)...) —
      // the FIRST matching code wins, i.e. ties go to the smaller code;
      // NaN fall-through is NULL (matches the oracle CASE, see pqCodeCol)
      val code = ds.zipWithIndex.foldRight(lit(null).cast("int"): Column) { case ((d, c), e) =>
        when(d === best, lit(c)).otherwise(e)
      }
      val err = dotCol(sub(s), sub(s)) - lit(2.0) * best + lit(PqSubDim.toDouble)
      (code, err)
    }
    val (codes, errs) = (0 until PqSub).map(codeAndErr).unzip
    emb.select(
        col("vec_id"),
        codes(0).as("code0"), codes(1).as("code1"),
        codes(2).as("code2"), codes(3).as("code3"),
        round(errs.reduceLeft(_ + _), 4).as("recon_err"))
      .orderBy("vec_id")
  }

  /** Each embedding exploded into its [[PqSub]] double subvectors:
    * (vec_id, sub, v) — the training/coding unit for product
    * quantization. Map-side (one explode, no shuffle). */
  private def pqSubvecs(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      explode(array((0 until PqSub).map(s => struct(lit(s).as("sub"),
        pqSub(col("embedding"), s).cast("array<double>").as("v"))): _*)).as("sv"))
      .select(col("vec_id"), col("sv.sub").as("sub"), col("sv.v").as("v"))

  /** The trained codebook table collapsed to ONE broadcastable row
    * (same trick as [[centsRow]]), with ‖c‖² precomputed per entry. */
  private def pqCbRow(cb: DataFrame): DataFrame =
    cb.agg(collect_list(struct(col("sub"), col("code"), col("cent_vec"),
      dotCol(col("cent_vec"), col("cent_vec")).as("cent_norm2"))).as("cbs"))

  /** Best trained-codebook entry for the current row's (sub, v):
    * argmin ‖v−c‖² ≡ argmax (v·c − ‖c‖²/2), ties to the smaller code.
    * Expects `cbs` (from [[pqCbRow]]) in scope via a single-row
    * broadcast crossJoin — pure map-side, like [[assignCentroid]]. */
  /** Best trained-codebook (score, code) for a (sub, v) subvector in one
    * compiled call — same rationale as [[pqCodesOf]]: the former
    * filter/transform/array_sort lambda chain evaluated every 16-dim dot
    * interpreted (HOFs are CodegenFallback). Scans ALL cbs entries with a
    * sub-match guard, so correctness is independent of the collect_list
    * order; score = v·c − ‖c‖²/2 with the dot accumulated left-to-right
    * (mirrors the vec_dot expression bit-for-bit); ties → smaller code;
    * NaN scores never win. Returns null when no entry matches (unreachable
    * for real codebooks — every sub retains ≥1 code). */
  def pqBestOf(v: ArrayData, sub: Int, cbs: ArrayData): ArrayData = {
    val n = cbs.numElements()
    var bestScore = 0.0
    var bestCode = -1
    var e = 0
    while (e < n) {
      val ent = cbs.getStruct(e, 4)
      if (ent.getInt(0) == sub) {
        val cv = ent.getArray(2)
        val m = math.min(v.numElements(), cv.numElements())
        var dot = 0.0
        var i = 0
        while (i < m) {
          if (!v.isNullAt(i) && !cv.isNullAt(i)) dot += v.getDouble(i) * cv.getDouble(i)
          i += 1
        }
        val score = dot - 0.5 * ent.getDouble(3)
        val code = ent.getInt(1)
        if (!score.isNaN &&
          (bestCode < 0 || score > bestScore ||
            (score == bestScore && code < bestCode))) {
          bestScore = score; bestCode = code
        }
      }
      e += 1
    }
    if (bestCode < 0) null
    else new GenericArrayData(Array[Any](bestScore, bestCode.toDouble))
  }

  /** Column form of [[pqBestOf]]: [score, code] doubles (`getItem(0)` /
    * `getItem(1)`). */
  private[graft] def pqBestKernel(v: Column, sub: Column, cbs: Column): Column =
    bridge.column(StaticInvoke(
      Vectors.getClass,
      ArrayType(DoubleType, containsNull = false),
      "pqBestOf",
      Seq(bridge.expression(v), bridge.expression(sub), bridge.expression(cbs)),
      returnNullable = true))

  /** Per-subspace Lloyd's k-means PQ training — the real-quantizer
    * upgrade over the deterministic ±1 [[pqCodebooks]]. All four
    * subspaces train in ONE DataFrame pass per iteration: assignment is
    * the single-row broadcast argmin above (no corpus shuffle), the
    * update is [[VecMean]] keyed by packed (sub·PqCents + code) — the
    * shuffle carries one fixed-size (count, 16-double sum) buffer per
    * (map partition, sub, code) regardless of corpus size, and each
    * iteration checkpoints the tiny codebook ([[kmeansCentroids]]'
    * lineage discipline). Init = the first PqCents vectors' subvectors.
    * Codes that lose all members drop out (standard empty-cluster
    * behavior); coding still works against the surviving entries. */
  def pqTrainCodebooks(emb: DataFrame, iters: Int = 3): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val sv = pqSubvecs(emb)
    // the model is O(1)-bounded (PqSub·PqCents = 32 entries of PqSubDim
    // doubles), so it lives on the DRIVER between iterations — the same
    // materialization the former per-iteration Dedup.truncate +
    // collect_list broadcast-agg performed through three extra Spark jobs
    // per iteration (a checkpoint of the tiny table, the one-row agg, its
    // broadcast): one aggregate+collect job per iteration is the whole
    // loop (sf0.1 measured: 25 → 8 jobs for emb_pq_trained). cent_norm2
    // is accumulated left-to-right like dotCol/pqBestOf — bit-identical.
    var cbLocal: Array[(Int, Int, Seq[Double])] =
      sv.filter(col("vec_id") < PqCents)
        .select(col("sub"), col("vec_id").cast("int").as("code"), col("v"))
        .as[(Int, Int, Seq[Double])].collect()
    def cbsRow: DataFrame = {
      val entries = cbLocal.toSeq.map { case (sub, code, cv) =>
        var n2 = 0.0
        var i = 0
        while (i < cv.length) { n2 += cv(i) * cv(i); i += 1 }
        (sub, code, cv, n2)
      }
      Seq(Tuple1(entries)).toDF("cbs")
        .select(col("cbs").cast(
          "array<struct<sub:int,code:int,cent_vec:array<double>,cent_norm2:double>>")
          .as("cbs"))
    }
    for (_ <- 1 to iters) {
      val assigned = sv.crossJoin(broadcast(cbsRow))
        .select((col("sub").cast("long") * PqCents +
          pqBestKernel(col("v"), col("sub"), col("cbs")).getItem(1).cast("long")).as("k"),
          col("v"))
        .as[(Long, Array[Double])]
      cbLocal = vecMeanByKeyLocal(assigned)
        .map { case (k, cv) =>
          ((k / PqCents).toInt, (k % PqCents).toInt, cv)
        }.toArray
    }
    cbLocal.toSeq.toDF("sub", "code", "cent_vec")
  }

  /** PQ codes against TRAINED codebooks ([[pqTrainCodebooks]]) — the
    * quality companion to the deterministic [[pqCodes]]: same output
    * shape (vec_id, code0..3, recon_err), real per-subspace k-means
    * centroids. ROWS-ONLY by design (FP-iterative training, like
    * [[annIvf]]); pinned by the RecallSpec reconstruction-error-
    * improvement test against the fixed ±1 codebooks. Coding is
    * map-side (one broadcast codebook row); the only shuffle is the
    * 4-rows-per-vector pivot back to one row per vec_id, with
    * ‖v−c‖² recovered exactly as v·v − 2·score. */
  def pqCodesTrained(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cb = pqTrainCodebooks(emb, iters = 3)
    pqSubvecs(emb).crossJoin(broadcast(pqCbRow(cb)))
      .withColumn("best", pqBestKernel(col("v"), col("sub"), col("cbs")))
      .select(col("vec_id"), col("sub"),
        col("best").getItem(1).cast("int").as("code"),
        (dotCol(col("v"), col("v")) - lit(2.0) * col("best").getItem(0)).as("err"))
      .groupBy(col("vec_id"))
      .agg(
        max(when(col("sub") === 0, col("code"))).as("code0"),
        max(when(col("sub") === 1, col("code"))).as("code1"),
        max(when(col("sub") === 2, col("code"))).as("code2"),
        max(when(col("sub") === 3, col("code"))).as("code3"),
        round(sum(col("err")), 4).as("recon_err"))
      .orderBy("vec_id")
  }

  /** [[pqCodes]]' codebook dots rendered as DuckDB SQL fragments — one
    * `list_dot_product(e[a:b], [±1, …])` per (subspace, code), so the
    * oracle replays the identical FP computation. */
  def pqOracleDots(s: Int): Seq[String] = {
    val lo = s * PqSubDim + 1
    val hi = (s + 1) * PqSubDim
    (0 until PqCents).map { c =>
      val arr = pqCodebooks(s)(c).map(w => if (w > 0) "1.0" else "-1.0")
        .mkString("[", ", ", "]")
      s"list_dot_product(e[$lo:$hi], $arr)"
    }
  }

  /** Mutable (count, element-wise sum) accumulator for [[VecMean]]. */
  case class VecAcc(var n: Long, var s: Array[Double])

  /** Element-wise mean over double vectors as a typed Aggregator: Spark
    * plans this with MAP-SIDE PARTIAL aggregation, so the shuffle carries
    * ONE (count, 64-double running sum) buffer per (map partition,
    * centroid) — versus the previous posexplode shape, which shuffled 64
    * (cent_id, dim, value) rows per corpus vector per iteration. At 100 TB
    * that is the difference between shuffling the corpus and shuffling
    * nlist × numPartitions fixed-size rows. */
  object VecMean extends Aggregator[(Long, Array[Double]), VecAcc, Array[Double]] {
    def zero: VecAcc = VecAcc(0L, Array.empty[Double])
    def reduce(b: VecAcc, a: (Long, Array[Double])): VecAcc = {
      val v = a._2
      if (b.s.isEmpty) VecAcc(1L, v.clone())
      else {
        var i = 0; while (i < v.length) { b.s(i) += v(i); i += 1 }
        b.n += 1; b
      }
    }
    def merge(x: VecAcc, y: VecAcc): VecAcc =
      if (x.s.isEmpty) y
      else if (y.s.isEmpty) x
      else {
        var i = 0; while (i < x.s.length) { x.s(i) += y.s(i); i += 1 }
        x.n += y.n; x
      }
    def finish(r: VecAcc): Array[Double] = r.s.map(_ / r.n)
    def bufferEncoder: Encoder[VecAcc] = Encoders.product[VecAcc]
    def outputEncoder: Encoder[Array[Double]] =
      ExpressionEncoder[Array[Double]]()
  }

  /** Lineage truncation for iterative loops — the shared reliable-when-
    * configured helper ([[Dedup.truncate]]). */
  private def truncate(df: DataFrame): DataFrame = Dedup.truncate(df)

  /** [[VecMean]]-by-key in ONE Spark job: per-partition accumulators
    * replay VecMean.reduce (first value cloned, then element-wise `+=`
    * left-to-right), the per-partition partials collect to the driver,
    * and the driver replays VecMean.merge. Replaces the k-means loops'
    * per-iteration `groupByKey.agg(VecMean)` + collect — a 16-to-32-group
    * aggregate whose exchange bought nothing but AQE stage jobs (the
    * model is O(1)-bounded: ≤ nlist·Dim doubles; partials are ≤
    * #partitions · #keys · Dim — a driver-safe bounded collect, same
    * class as the PQ codebook). Output sorted by key: the former agg's
    * row order was shuffle-fetch arbitrary, and every consumer is
    * order-insensitive (argmax/argmin kernels scan all entries with id
    * tie-breaks), so sorting only adds determinism. */
  private def vecMeanByKeyLocal(
      assigned: org.apache.spark.sql.Dataset[(Long, Array[Double])]): Seq[(Long, Seq[Double])] = {
    val partials = assigned.rdd.mapPartitions { it =>
      val m = scala.collection.mutable.LinkedHashMap.empty[Long, (Long, Array[Double])]
      it.foreach { case (k, v) =>
        m.get(k) match {
          case None => m(k) = (1L, v.clone())
          case Some((n, s)) =>
            var i = 0; while (i < v.length) { s(i) += v(i); i += 1 }
            m(k) = (n + 1, s)
        }
      }
      Iterator.single(m.toArray)
    }.collect()
    val merged = scala.collection.mutable.LinkedHashMap.empty[Long, (Long, Array[Double])]
    for (p <- partials; (k, (n, s)) <- p) {
      merged.get(k) match {
        case None => merged(k) = (n, s)
        case Some((n0, s0)) =>
          var i = 0; while (i < s0.length) { s0(i) += s(i); i += 1 }
          merged(k) = (n0 + n, s0)
      }
    }
    merged.toSeq.sortBy(_._1)
      .map { case (k, (n, s)) => k -> s.map(_ / n).toSeq }
  }

  /** Lloyd's k-means over the embedding corpus as pure DataFrame ops:
    * assignment is the map-side broadcast argmax above (no corpus
    * shuffle); the update step is [[VecMean]] — whole-vector partial sums
    * folded map-side, shuffling one fixed-size buffer per (partition,
    * centroid). Each iteration checkpoints the (tiny) centroid table so
    * plan depth stays O(1) across iterations (same lineage discipline as
    * connectedComponents; reliable-checkpoint gated the same way).
    * Init = first nlist corpus vectors (deterministic; k-means++ would
    * only change this seeding step). Centroids are unnormalized means —
    * equivalent under cosine argmax, which is scale-invariant. */
  def kmeansCentroids(emb: DataFrame, nlist: Int, iters: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    kmeansCentroidsLocal(emb, nlist, iters).toDF("cent_id", "cent_vec")
  }

  /** Driver-resident [[kmeansCentroids]] core: the model is O(1)-bounded
    * (nlist vectors of Dim doubles), so it lives on the DRIVER between
    * iterations — the same materialization discipline as
    * [[pqTrainCodebooks]]' codebook. The former per-iteration
    * Dedup.truncate checkpointed the tiny centroid table through extra
    * Spark jobs (plus the final centsRow agg + checkpoint in [[annIvf]]);
    * now one aggregate+collect job per iteration is the whole loop, and
    * the assignment side receives the centroids as a LOCAL one-row
    * relation (zero jobs to build or broadcast-plan). Values are
    * bit-identical: collect/re-literalize performs no FP operation. */
  private[graft] def kmeansCentroidsLocal(emb: DataFrame, nlist: Int,
                                          iters: Int): Seq[(Long, Seq[Double])] = {
    val spark = emb.sparkSession
    import spark.implicits._
    var centsLocal: Seq[(Long, Seq[Double])] =
      emb.filter(col("vec_id") < nlist)
        .select(col("vec_id").as("cent_id"),
          col("embedding").cast("array<double>").as("cent_vec"))
        .as[(Long, Seq[Double])].collect().toSeq
    for (_ <- 1 to iters) {
      val assigned = assignCentroid(
          emb.select(col("vec_id"), col("embedding")),
          centsOneLocal(spark, centsLocal), keep = 1,
          centsFloat = false)
        .select(col("cent_id"),
          col("embedding").cast("array<double>").as("v"))
        .as[(Long, Array[Double])]
      centsLocal = vecMeanByKeyLocal(assigned)
    }
    centsLocal
  }

  /** The [[centsRow]] one-row cents relation built from DRIVER-held
    * centroids — a LocalRelation, so consumers' broadcast builds plan
    * with no upstream job. */
  private def centsOneLocal(spark: SparkSession,
                            cents: Seq[(Long, Seq[Double])]): DataFrame = {
    import spark.implicits._
    Seq(Tuple1(cents)).toDF("cents")
      .select(col("cents").cast(
        "array<struct<cent_id:bigint,cent_vec:array<double>>>").as("cents"))
  }

  /** IVF-style ANN: coarse quantization + probe-limited search — the
    * third scale path next to brute force and LSH.
    *
    *   - nlist coarse centroids from 2 Lloyd's iterations
    *     ([[kmeansCentroids]] — distributed, deterministic);
    *   - assignment: every vector gets the centroid with max cosine via
    *     the single-row broadcast argmax — NO shuffle of the corpus;
    *   - search: each query probes its nprobe closest centroid lists only,
    *     so the candidate join touches ~nprobe/nlist of the corpus instead
    *     of all of it. At 100 TB the inverted lists would be the parquet
    *     partitioning key (partition pruning does the probe limiting).
    */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val nlist = 16
    val nprobe = 4
    val emb = Tables.embeddings(spark, dir)
    // centroids are driver-held after training — the one-row cents
    // relation is LOCAL (no centsRow agg, no checkpoint job)
    val cOne = centsOneLocal(spark, kmeansCentroidsLocal(emb, nlist, iters = 2))
    val corpus = assignCentroid(
      emb.select(col("vec_id").as("c_id"), col("embedding")), cOne, keep = 1,
      centsFloat = false)
      .select(col("cent_id"), col("c_id"), col("embedding").as("c_vec"))
    val queries = assignCentroid(
      emb.filter(col("vec_id") < 10).select(col("vec_id").as("q_id"), col("embedding")),
      cOne, keep = nprobe, centsFloat = false)
      .select(col("cent_id"), col("q_id"), col("embedding").as("q_vec"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id").asc)
    corpus.join(broadcast(queries), Seq("cent_id"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"), cosineCol(col("q_vec"), col("c_vec")).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("q_id"), col("rk"), col("c_id"), round(col("cos"), 4).as("cos"))
      .orderBy("q_id", "rk")
  }

  private[graft] val IvfPqList = 8   // coarse lists
  private[graft] val IvfPqProbe = 2  // lists probed per query

  /** IVF-PQ composed search — the index layout every billion-scale ANN
    * system runs (FAISS IVFPQ): a coarse quantizer routes each vector to
    * one inverted list, vectors inside a list are stored as 4-byte PQ
    * codes, and a query scans only its nprobe closest lists, scoring
    * candidates by ADC (asymmetric distance computation: the query builds
    * one lookup table of its subvector·codebook dots, and each candidate's
    * approximate similarity is 4 table lookups — never a 64-float dot).
    *
    * Unlike [[annIvf]] (k-means centroids — FP-iterative, rows-only by
    * design), the coarse quantizer here is DATA-SAMPLED: the first
    * IvfPqList corpus vectors ARE the centroids (how real indexes seed
    * their quantizer before refinement), kept un-refined so the ENTIRE
    * build + search — assignment, codes, LUTs, ADC ranking — replays
    * exactly in DuckDB and the query is hash-verified.
    *
    * Scale shape: assignment and code computation are pure map-side
    * (centroids are one broadcast row, codebooks are literals); the
    * query side is IvfPqProbe rows per query carrying a 4×8-double LUT,
    * broadcast; the candidate join touches ~nprobe/nlist of the corpus;
    * per-query top-k is a windowed rank over candidates. At 100 TB the
    * inverted lists are the table's partition key, so probe limiting is
    * partition pruning, and the scan reads 4-byte codes, not vectors. */
  def annIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cOne = centsRow(emb.filter(col("vec_id") < IvfPqList)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_vec")))
    // corpus: one list per vector + its 4 PQ codes (codebook dots fold
    // into codegen; the embedding itself is DROPPED after this projection)
    val corpus = assignCentroid(
        emb.select(col("vec_id").as("c_id"), col("embedding")), cOne, keep = 1,
        centsFloat = true)
      .select(col("cent_id") +: col("c_id") +:
        { val codes = pqCodesKernel(col("embedding"))
          (0 until PqSub).map(s => codes.getItem(s).as(s"code$s")) }: _*)
    // queries: nprobe (cent_id, q_id) rows, each carrying the per-subspace
    // ADC lookup tables (computed ONCE per query, before the join)
    val queries = assignCentroid(
        emb.filter(col("vec_id") < 10).select(col("vec_id").as("q_id"), col("embedding")),
        cOne, keep = IvfPqProbe, centsFloat = true)
      .select(col("cent_id") +: col("q_id") +:
        (0 until PqSub).map(s => array(pqDots(col("embedding"), s): _*).as(s"lut$s")): _*)
    // ADC: 4 LUT lookups per candidate, summed left-to-right (both engines)
    val adc = (0 until PqSub)
      .map(s => element_at(col(s"lut$s"), col(s"code$s") + 1))
      .reduceLeft(_ + _)
    val w = Window.partitionBy(col("q_id")).orderBy(col("approx").desc, col("c_id").asc)
    corpus.join(broadcast(queries), Seq("cent_id"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"), adc.as("approx"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("q_id"), col("rk"), col("c_id"), round(col("approx"), 4).as("approx"))
      .orderBy("q_id", "rk")
  }

  /** kNN majority-vote classification on top of the exact neighbor
    * search: each query's label = mode of its 5 nearest neighbors' labels
    * (ties to the smallest label id). The downstream-consumer shape of
    * similarity search — the vote aggregation runs on the tiny top-k
    * result, so its cost is independent of corpus size. */
  def knnClassify(spark: SparkSession, dir: String): DataFrame = {
    val nn = annBruteForce(spark, dir) // q_id, rk, c_id, label, cos
    val w = Window.partitionBy(col("q_id")).orderBy(col("votes").desc, col("label").asc)
    nn.groupBy(col("q_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("vrk", row_number().over(w))
      .filter(col("vrk") === 1)
      .select(col("q_id"), col("label").as("pred_label"), col("votes"))
      .orderBy("q_id")
  }

  /** Per-label embedding statistics via posexplode — numeric array
    * aggregation without UDAFs (oracle: DuckDB unnest). */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    emb.select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_values"),
        round(avg(col("v")), 4).as("mean_all_dims"),
        round(stddev_pop(col("v")), 4).as("std_all_dims"))
      .orderBy("label")
  }

  /** Int8 scalar quantization of the embedding column — the storage/
    * bandwidth answer at 100 TB (4 bytes/dim → 1, before any ANN index):
    * per-vector symmetric scale = 127/max|x|, q_i = ⌊x_i·scale + 0.5⌋
    * (floor(x+0.5), NOT round(): identical on both engines where banker's
    * rounding is not), plus the reconstruction MSE and the max quantized
    * magnitude as the quality audit. Pure map-side array expressions; the
    * only shuffle is the output sort. Sums run in array-element order, so
    * the MSE is bit-deterministic cross-engine. */
  def quantizeInt8(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        expr("aggregate(embedding, 0D, (a, x) -> greatest(a, abs(cast(x AS double))))")
          .as("amax"))
      .withColumn("scale", when(col("amax") > 0, lit(127.0) / col("amax")).otherwise(lit(1.0)))
      .select(col("vec_id"),
        size(col("embedding")).cast("long").as("n_dims"),
        round(col("scale"), 6).as("q_scale"),
        round(expr(
          "aggregate(embedding, 0D, (a, x) -> a + pow(cast(x AS double) - floor(cast(x AS double) * scale + 0.5D) / scale, 2)) / size(embedding)"),
          10).as("mse"),
        expr("aggregate(embedding, 0D, (a, x) -> greatest(a, abs(cast(floor(cast(x AS double) * scale + 0.5D) AS double))))")
          .cast("long").as("q_max"))
      .orderBy("vec_id")
}

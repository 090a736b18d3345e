package graft

import graft.ops.{Dedup, Text}
import graft.streaming.{DedupStream, EventStream}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Round-15 composition pin: the incremental-corpus round-trip —
  * ingest delta → Bloom exact gate → streaming near-dup reps →
  * assignment rollup → kept corpus → shard manifest → compaction plan —
  * wired ENTIRELY from existing operators (no new oracle surface; each
  * stage is individually hash- or spec-verified elsewhere; this spec
  * pins that they compose). The worked pipeline is documented in
  * docs/OPERATORS.md.
  *
  * Corpus convention: snapshot doc_ids are EVEN, delta doc_ids are ODD —
  * the exact split [[Dedup.bloomDedupFromDocs]] audits (its even side is
  * the already-ingested snapshot guarding the odd batch). */
class PipelineRoundTripSpec extends SparkSpec {

  test("incremental round-trip: delta gates through bloom, links through " +
    "stream reps, and the kept corpus compacts") {
    val spark2 = spark.newSession()
    spark2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark2.implicits._

    // ---- corpus: 6 snapshot docs (even ids) + a 3-doc delta (odd ids):
    // 101 = EXACT dup of snapshot doc 2; 103 = NEAR dup of snapshot doc 4
    // (2-token mutation); 105 = genuinely new
    val rng = new scala.util.Random(7)
    val vocab = Array.tabulate(800)(i => s"w$i")
    def fresh(): Array[String] = Array.fill(70)(vocab(rng.nextInt(vocab.length)))
    val baseTexts = Array.tabulate(6)(_ => fresh())
    def mutate(t: Array[String]): String = {
      val c = t.clone()
      (0 until 2).foreach(_ => c(rng.nextInt(c.length)) = vocab(rng.nextInt(vocab.length)))
      c.mkString(" ")
    }
    val snapshot = baseTexts.zipWithIndex.map { case (t, i) =>
      ((2 * i).toLong, t.mkString(" "))
    }.toSeq
    val delta = Seq(
      (101L, baseTexts(1).mkString(" ")), // exact dup of doc 2
      (103L, mutate(baseTexts(2))),       // near dup of doc 4
      (105L, fresh().mkString(" ")))      // new
    val all = (snapshot ++ delta).toDF("doc_id", "text")

    // ---- stage 1: Bloom exact gate (snapshot guards the delta) --------
    val verdicts = Dedup.bloomDedupFromDocs(all).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("maybe_seen"), r.getAs[Boolean]("is_dup"),
          r.getAs[Boolean]("bloom_ok"))).toMap
    assert(verdicts.keySet == Set(101L, 103L, 105L), s"verdicts for $verdicts")
    assert(verdicts(101L)._2 && verdicts(101L)._1, "exact dup must flag (and bloom must see it)")
    assert(!verdicts(103L)._2, "near dup is NOT an exact dup")
    assert(!verdicts(105L)._2, "new doc is not a dup")
    assert(verdicts.values.forall(_._3), "bloom may never false-negative")
    val exactSurvivors = delta.filter { case (id, _) => !verdicts(id)._2 }
    assert(exactSurvivors.map(_._1) == Seq(103L, 105L))

    // ---- stage 2: near-dup linkage — snapshot replayed into the stream
    // registry first, exact-gated delta in the NEXT micro-batch, reps
    // emission, then the worked consumer (edges → assignments) ----------
    val watch = java.nio.file.Files.createTempDirectory("graftroundtrip")
    snapshot.toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(watch.toString)
    exactSurvivors.toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(watch.toString)
    val stream = spark2.readStream.schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", "1").parquet(watch.toString)
    EventStream.runToCompletion(
      DedupStream.streamingNearDupReps(spark2, stream), "roundtrip_edges",
      OutputMode.Append())
    val assigned = DedupStream.repsAssignments(spark2.table("roundtrip_edges"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rep_id")).toMap
    assert(assigned.get(103L).contains(4L),
      s"near dup must link to its snapshot base's cluster rep: $assigned")
    assert(!assigned.contains(105L), s"new doc must not link: $assigned")

    // ---- stage 3: the dedup decision — reps keep themselves, linked
    // non-reps drop, unlinked docs are singletons (kept) ----------------
    val dropIds = assigned.collect { case (id, rep) if id != rep => id }.toSet
    assert(dropIds == Set(103L), s"drop list $dropIds")
    val kept = (snapshot ++ exactSurvivors.filterNot(d => dropIds(d._1)))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    assert(kept.count() == 7, "6 snapshot + 1 genuinely new")

    // ---- stage 4: shard manifest + compaction plan over the kept corpus
    val manifest = Text.shardManifestDf(kept, nShards = 8)
    val plan = Text.compactionPlanDf(manifest).collect()
    assert(plan.nonEmpty)
    val planned = plan.map(_.getAs[Long]("n_docs")).sum
    assert(planned == 7, s"compaction must plan every kept doc, got $planned")
    val mChars = manifest.agg(sum(col("total_chars"))).first().getLong(0)
    val kChars = kept.agg(sum(col("n_chars"))).first().getLong(0)
    assert(mChars == kChars, "manifest chars must equal corpus chars")
    assert(plan.map(_.getAs[Long]("n_chars")).sum == kChars,
      "compaction files must cover every char exactly once")
  }

  test("round-trip across a deploy: checkpointed restart between snapshot and " +
    "delta still links pre-deploy near-dups; an aged-out registry entry does not") {
    // The OPERATORS.md promise in pipeline form: the ingest stream STOPS
    // after the snapshot (a deploy), the delta lands while it is down,
    // and the restarted stream (same checkpoint) must still link the
    // delta's near-dup to its PRE-deploy base — then the same pipeline
    // with a 1 s TTL and a 3 s outage must NOT link it (the base aged
    // out of the horizon), so the near-dup is KEPT as fresh content.
    // Both runs exercise bloom gate → stream reps across restart →
    // assignment rollup → keep/drop decision; no new oracle surface.
    import java.nio.file.{Files => JFiles}
    def run(ttl: java.time.Duration, gapMs: Long): (Map[Long, Long], Set[Long]) = {
      val spark2 = spark.newSession()
      spark2.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      spark2.conf.set("spark.sql.shuffle.partitions", "4")
      import spark2.implicits._
      val rng = new scala.util.Random(7)
      val vocab = Array.tabulate(800)(i => s"w$i")
      def fresh(): Array[String] = Array.fill(70)(vocab(rng.nextInt(vocab.length)))
      val baseTexts = Array.tabulate(6)(_ => fresh())
      def mutate(t: Array[String]): String = {
        val c = t.clone()
        (0 until 2).foreach(_ => c(rng.nextInt(c.length)) = vocab(rng.nextInt(vocab.length)))
        c.mkString(" ")
      }
      val snapshot = baseTexts.zipWithIndex.map { case (t, i) =>
        ((2 * i).toLong, t.mkString(" "))
      }.toSeq
      val delta = Seq(
        (101L, baseTexts(1).mkString(" ")), // exact dup of doc 2
        (103L, mutate(baseTexts(2))),       // near dup of doc 4
        (105L, fresh().mkString(" ")))      // new
      // stage 1 (batch, deploy-independent): exact gate drops 101
      val verdicts = Dedup.bloomDedupFromDocs(
        (snapshot ++ delta).toDF("doc_id", "text")).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_dup")).toMap
      val exactSurvivors = delta.filter { case (id, _) => !verdicts(id) }
      assert(exactSurvivors.map(_._1) == Seq(103L, 105L))
      // stage 2: snapshot in deploy 1, STOP, delta in deploy 2 on the
      // same checkpoint (file sink — a memory sink cannot recover)
      val watch = JFiles.createTempDirectory("graftrtrestart")
      val ckpt = JFiles.createTempDirectory("graftrtrestartckpt").toString
      val outDir = JFiles.createTempDirectory("graftrtrestartout").toString
      def writeBatch(name: String, rows: Seq[(Long, String)]): Unit = {
        val stage = JFiles.createTempDirectory(name).resolve("out").toString
        rows.toDF("doc_id", "text").coalesce(1).write.parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        JFiles.copy(part.toPath, watch.resolve(name + ".parquet"))
      }
      def runOnce(): Unit = {
        val stream = spark2.readStream.schema("doc_id LONG, text STRING")
          .parquet(watch.toString)
        val q = DedupStream.streamingNearDupReps(spark2, stream, Some(ttl))
          .writeStream.format("parquet").option("path", outDir)
          .outputMode(OutputMode.Append())
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(15000); q.stop()
      }
      writeBatch("a", snapshot)
      runOnce() // deploy 1: registry holds the snapshot
      Thread.sleep(gapMs) // the outage, relative to the TTL horizon
      writeBatch("b", exactSurvivors)
      runOnce() // deploy 2: same checkpoint
      // stages 3-4: rollup + decision (schema given explicitly — the
      // expired leg's sink may hold zero edge files)
      val edges = spark2.read
        .schema("rep LONG, member LONG, band INT, est_sim DOUBLE")
        .parquet(outDir)
      val assigned = DedupStream.repsAssignments(edges).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rep_id")).toMap
      val dropIds = assigned.collect { case (id, rep) if id != rep => id }.toSet
      val keptIds = (snapshot.map(_._1) ++
        exactSurvivors.map(_._1).filterNot(dropIds)).toSet
      (assigned, keptIds)
    }
    // within-horizon outage: the restored registry links the near-dup
    // to its pre-deploy base — the deploy loses nothing
    val (linked, keptA) = run(java.time.Duration.ofMinutes(10), gapMs = 100)
    assert(linked.get(103L).contains(4L),
      s"restart must preserve the snapshot registry: $linked")
    assert(!linked.contains(105L), s"new doc must not link: $linked")
    assert(keptA == Set(0L, 2L, 4L, 6L, 8L, 10L, 105L), s"kept $keptA")
    // outage longer than the horizon: the base aged out, the near-dup
    // correctly does NOT link and is kept as fresh content
    val (aged, keptB) = run(java.time.Duration.ofSeconds(1), gapMs = 3000)
    assert(!aged.contains(103L),
      s"aged-out registry entry must not link: $aged")
    assert(keptB == Set(0L, 2L, 4L, 6L, 8L, 10L, 103L, 105L), s"kept $keptB")
  }
}

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
}

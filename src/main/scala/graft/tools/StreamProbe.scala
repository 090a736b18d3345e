package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.OutputMode

/** Focused profiler for the streaming lines (round-11 verdict item 7:
  * `stream_neardup` throughput). Runs one streaming pipeline N times with
  * a chosen shuffle-partition count and prints per-run seconds — isolates
  * the fixed streaming-query machinery (query start, state-store
  * instances, commit) from per-row work, which the full bench cannot.
  *
  * Usage: tools/runmain.sh graft.tools.StreamProbe <sfDir> [parts] [reps] [pipeline]
  *   pipeline: neardup (default) | neardup_reps | rollup | rollup_raw |
  *             dedup | sigonly | baseline
  *
  * `rollup` (round 16): generates the reps edge sink ONCE (untimed,
  * streamingNearDupReps → parquet), then each rep streams it through
  * [[graft.streaming.DedupStream.repsRollupStream]] — the serial
  * union-find stage in isolation; rows/s printed is EDGES/s here.
  * `rollup_raw` (round 17) is the same with the localForest
  * pre-reduction OFF — the A/B for how much the two-level-CC stage
  * cuts the serial funnel's input and wall time. `rollup` also prints
  * the raw → forest edge counts once (batch-computed on the sink).
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val parts = if (args.length > 1) args(1).toInt else 32
    val reps = if (args.length > 2) args(2).toInt else 3
    val which = if (args.length > 3) args(3) else "neardup"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-stream-probe")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // rows/s denominators: document pipelines stream documents.parquet,
    // the dedup pipeline streams events.parquet
    // rollup: build the edge sink once, untimed — every rep then measures
    // ONLY the union-find stage over the identical edge feed
    val edgeDir =
      if (which.startsWith("rollup")) {
        val dir = java.nio.file.Files.createTempDirectory("graft_probe_edges")
        val s2 = spark.newSession()
        // untimed generation always runs wide — `parts` is the A/B knob
        // for the TIMED rollup session only (round 18: with the
        // prereduce width pinned in repsRollupStream, `parts` now
        // purely sets the stateful stage's store-instance count)
        s2.conf.set("spark.sql.shuffle.partitions",
          spark.sparkContext.defaultParallelism.toString)
        s2.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        s2.conf.set("spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows", "false")
        val docPath = new java.io.File(s"$sfDir/documents.parquet")
        val reader = s2.readStream.schema("doc_id LONG, text STRING")
        val docs =
          if (docPath.isDirectory) reader.parquet(docPath.toString)
          else reader.option("pathGlobFilter", "documents.parquet").parquet(sfDir)
        val q = graft.streaming.DedupStream.streamingNearDupReps(s2, docs)
          .writeStream.format("parquet").option("path", s"$dir/edges")
          .outputMode(OutputMode.Append())
          .option("checkpointLocation", s"$dir/ckpt").start()
        q.processAllAvailable(); q.stop()
        Some(dir.toString)
      } else None
    // rep loop under try/finally: an exception (or Ctrl-C) mid-rep must not
    // strand a multi-GB edge sink + checkpoint in the system temp dir
    try {
    val docRows =
      if (which == "dedup") spark.read.parquet(s"$sfDir/events.parquet").count()
      else if (which.startsWith("rollup")) spark.read.parquet(s"${edgeDir.get}/edges").count()
      else spark.read.parquet(s"$sfDir/documents.parquet").count()
    if (which == "rollup") { // serial-funnel input A/B, batch-computed once
      import spark.implicits._
      val kept = spark.read.parquet(s"${edgeDir.get}/edges")
        .selectExpr("cast(rep as long) as rep", "cast(member as long) as member")
        .as[(Long, Long)]
        .repartition(org.apache.spark.sql.functions.col("rep"))
        .mapPartitions(it => graft.streaming.RollupCore.localForest(it.toArray))
        .count()
      println(f"[probe] rollup prereduce: $docRows raw edges -> $kept forest edges " +
        f"(${kept * 100.0 / math.max(1, docRows)}%.1f%% reach the serial stage)")
    }
    for (r <- 1 to reps) {
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.shuffle.partitions", parts.toString)
      s2.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      if (sys.env.contains("PROBE_CHANGELOG"))
        s2.conf.set("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
      // default OFF to match Bench's streaming sessions (the metrics-only
      // row counter cost the sf10 rollup rep ~2.2×: 31→14 s, round 17);
      // PROBE_TRACK=1 re-enables it for metric-fidelity runs
      if (!sys.env.contains("PROBE_TRACK"))
        s2.conf.set("spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows", "false")
      if (sys.env.contains("PROBE_NOCOMPRESS"))
        s2.conf.set("spark.sql.streaming.stateStore.rocksdb.compression", "none")
      val t0 = System.nanoTime()
      which match {
        case "baseline" => // stateless passthrough: pure streaming-query machinery
          val docPath = new java.io.File(s"$sfDir/documents.parquet")
          val reader = s2.readStream.schema("doc_id LONG, text STRING")
          val docs =
            if (docPath.isDirectory) reader.parquet(docPath.toString)
            else reader.option("pathGlobFilter", "documents.parquet").parquet(sfDir)
          graft.streaming.EventStream.runToCompletionNoop(
            docs.selectExpr("doc_id"), OutputMode.Append())
        case "sigonly" => // signatures + banding, no stateful operator
          import org.apache.spark.sql.functions._
          import graft.functions.TextKernels
          import graft.ops.Dedup.{Bands, NumPerms, Rows}
          val docPath = new java.io.File(s"$sfDir/documents.parquet")
          val reader = s2.readStream.schema("doc_id LONG, text STRING")
          val docs =
            if (docPath.isDirectory) reader.parquet(docPath.toString)
            else reader.option("pathGlobFilter", "documents.parquet").parquet(sfDir)
          val sigs = docs.select(col("doc_id"),
            TextKernels.minhashSigKernel(
              TextKernels.shinglesKernel(col("text"), 3), NumPerms).as("sig"))
          val banded = sigs.select(col("doc_id"),
            explode(array((0 until Bands).map(b => struct(lit(b).as("band"),
              col("sig")(b * Rows).as("k0"), col("sig")(b * Rows + 1).as("k1"))): _*)).as("bk"))
          graft.streaming.EventStream.runToCompletionNoop(banded, OutputMode.Append())
        case "dedup" =>
          val ev = graft.streaming.EventStream.readEvents(s2, sfDir)
          graft.streaming.EventStream.runToCompletionNoop(
            graft.streaming.EventStream.streamingDedup(ev), OutputMode.Append())
        case "rollup_nostate" => // stateless prefix only: streaming scan +
          // rep-exchange + local forest, no stateful stage — attributes
          // the rollup wall between the prefix and the union-find
          import s2.implicits._
          val edges = s2.readStream
            .schema("rep LONG, member LONG, band INT, est_sim DOUBLE")
            .parquet(s"${edgeDir.get}/edges")
            .select(org.apache.spark.sql.functions.col("rep").cast("long"),
              org.apache.spark.sql.functions.col("member").cast("long"))
            .as[(Long, Long)]
            .repartition(spark.sparkContext.defaultParallelism,
              org.apache.spark.sql.functions.col("rep"))
            .mapPartitions(it => graft.streaming.RollupCore.localForest(it.toArray))
          graft.streaming.EventStream.runToCompletionNoop(
            edges.toDF("rep", "member"), OutputMode.Append())
        case "rollup" | "rollup_raw" => // in-stream union-find over the prebuilt edge sink
          val edges = s2.readStream
            .schema("rep LONG, member LONG, band INT, est_sim DOUBLE")
            .parquet(s"${edgeDir.get}/edges")
          val df = graft.streaming.DedupStream.repsRollupStream(s2, edges,
            prereduce = which == "rollup")
          if (sys.env.contains("PROBE_TRACE")) {
            // one traced run: per-micro-batch duration breakdown, to see
            // where the fixed seconds live (planning vs addBatch vs
            // state commit vs walCommit)
            val q = df.writeStream.format("noop")
              .outputMode(OutputMode.Append()).start()
            q.processAllAvailable(); q.stop()
            q.recentProgress.foreach { p =>
              println(s"[trace] batch=${p.batchId} rows=${p.numInputRows} " +
                s"durationMs=${p.durationMs}")
              p.stateOperators.foreach(s =>
                println(s"[trace]   state=${s.operatorName} out=${s.numRowsUpdated}u/" +
                  s"${s.numRowsRemoved}r commitMs=${s.commitTimeMs} " +
                  s"procMs=${s.allUpdatesTimeMs}"))
            }
          } else graft.streaming.EventStream.runToCompletionNoop(df,
            OutputMode.Append())
        case "neardup_reps" => // cluster-linkage emission (round 14)
          val docPath = new java.io.File(s"$sfDir/documents.parquet")
          val reader = s2.readStream.schema("doc_id LONG, text STRING")
          val docs =
            if (docPath.isDirectory) reader.parquet(docPath.toString)
            else reader.option("pathGlobFilter", "documents.parquet").parquet(sfDir)
          graft.streaming.EventStream.runToCompletionNoop(
            graft.streaming.DedupStream.streamingNearDupReps(s2, docs),
            OutputMode.Append())
        case _ =>
          val docPath = new java.io.File(s"$sfDir/documents.parquet")
          val reader = s2.readStream.schema("doc_id LONG, text STRING")
          val docs =
            if (docPath.isDirectory) reader.parquet(docPath.toString)
            else reader.option("pathGlobFilter", "documents.parquet").parquet(sfDir)
          graft.streaming.EventStream.runToCompletionNoop(
            graft.streaming.DedupStream.streamingNearDup(s2, docs), OutputMode.Append())
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $which parts=$parts run=$r: $sec%.2f s  (${docRows / sec}%.0f rows/s)")
    }
    } finally edgeDir.foreach { d =>
      import java.nio.file.{Files, Path, Paths}
      import java.util.Comparator
      try Files.walk(Paths.get(d)).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
      catch { case _: Throwable => () }
    }
    spark.stop()
  }
}

package graft.tools

import java.util.concurrent.atomic.AtomicLong

import graft.ops.Dedup
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-18 optimization probe for the two most expensive dedup lines.
  * A/Bs output-identical plan variants in one host session (first rep of
  * a variant pays codegen warmup; compare session minima) and prints one
  * JSON line per rep with wall seconds + shuffle/spill task-metric totals.
  *
  * Variants:
  *   mh_cur    — dedup_minhash as shipped (shuffle-join attach; at sf10
  *               the four sig/shingle attach joins plan as 1 BHJ + 3
  *               SortMergeJoins over the pair stream)
  *   mh_bcast  — same pipeline, attach sides force-broadcast
  *               (minhashVerified bcastAttach=true)
  *   sh_cur    — dedup_simhash_near as shipped (candidate distinct THEN
  *               map-side dictionary verify)
  *   sh_vfirst — verify BEFORE distinct: hamming filter is map-side and
  *               deterministic, so distinct(cands) → verify ≡ verify →
  *               distinct; the distinct exchange then carries only
  *               hamming-verified pairs
  *   counts    — cardinality ledger: raw candidates, distinct candidates,
  *               est-gate survivors, verified pairs for both families
  *
  * Usage: tools/runmain.sh graft.tools.DedupProbe <sfDir> [reps] [variants]
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val variants = (if (args.length > 2) args(2)
                    else "counts,mh_cur,mh_bcast,sh_cur,sh_vfirst")
      .split(",").map(_.trim).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-dedup-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val memSpill = new AtomicLong(0); val diskSpill = new AtomicLong(0)
    val shufWrite = new AtomicLong(0); val shufRead = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
      }
    })

    def documents = graft.Tables.documents(spark, sfDir)

    // checksum that is order-insensitive and covers ids + rounded scores
    def checksum(df: DataFrame): (Long, Long) = {
      val cols = df.columns.map(c => col(c).cast("string"))
      val r = df.select(
        count(lit(1)).as("n"),
        bit_xor(xxhash64(cols: _*)).as("h")).collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    def runTimed(label: String, rep: Int)(build: => DataFrame): Unit = {
      graft.ops.PlanMemo.clear()
      spark.catalog.clearCache()
      System.gc()
      memSpill.set(0); diskSpill.set(0); shufWrite.set(0); shufRead.set(0)
      spark.sparkContext.setJobDescription(s"probe $label rep$rep")
      val t0 = System.nanoTime()
      build.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let queued listener events drain
      println(f"""{"probe":"$label","rep":$rep,"sec":$sec%.2f,"shuffle_write_mb":${shufWrite.get / 1048576},"shuffle_read_mb":${shufRead.get / 1048576},"mem_spill_mb":${memSpill.get / 1048576},"disk_spill_mb":${diskSpill.get / 1048576}}""")
    }

    // ---- variant builders (each builds the FULL query plan fresh) ----
    import graft.functions.GraftFunctions.sortedLongPairsKernel

    def mhPairs(bcast: Boolean, minband: Boolean = false): DataFrame = {
      val (docs, sigs) = Dedup.minhashDocsSigs(documents)
      val verified =
        if (minband)
          // production min-band path: est_sim rides out of the emission
          // kernel, the verify skips its sig re-attach joins
          Dedup.minhashVerifiedPreEst(Dedup.minbandPairs(sigs), docs,
            bcastAttach = bcast)
        else Dedup.minhashVerified(
          Dedup.minhashBuckets(sigs)
            .select(explode(sortedLongPairsKernel(col("ids"))).as("p"))
            .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
            .distinct(),
          docs, sigs, bcastAttach = bcast)
      verified
        .select(col("doc_a"), col("doc_b"),
          round(col("est_sim"), 4).as("est_sim"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    }

    def shCands(fp: DataFrame): DataFrame =
      Dedup.simhashBuckets(fp)
        .select(explode(sortedLongPairsKernel(col("ids"))).as("p"))
        .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))

    def shPairs(verifyFirst: Boolean): DataFrame = {
      val fp = Dedup.truncate(documents
        .select(col("doc_id"),
          graft.functions.TextKernels.simhashKernel(col("text")).as("fp")))
      val exploded = shCands(fp)
      val out =
        if (verifyFirst)
          Dedup.simhashHamming(exploded, fp, dictAttach = true)
            .filter(col("hamming") <= 3).distinct()
        else
          Dedup.simhashHamming(exploded.distinct(), fp, dictAttach = true)
            .filter(col("hamming") <= 3)
      out.orderBy("doc_a", "doc_b")
    }

    for (v <- variants) v match {
      case "counts" =>
        val (docs, sigs) = Dedup.minhashDocsSigs(documents)
        val mhRaw = Dedup.minhashBuckets(sigs)
          .select(explode(sortedLongPairsKernel(col("ids"))).as("p"))
          .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
        val mhDistinct = mhRaw.distinct()
        val mhVer = Dedup.minhashVerified(mhDistinct, docs, sigs)
        println(s"""{"counts":"minhash","raw_cands":${mhRaw.count()},"distinct_cands":${mhDistinct.count()},"verified":${mhVer.count()}}""")
        graft.ops.PlanMemo.clear()
        val fp = Dedup.truncate(documents
          .select(col("doc_id"),
            graft.functions.TextKernels.simhashKernel(col("text")).as("fp")))
        val shRaw = shCands(fp)
        val shDistinct = shRaw.distinct()
        val shVer = Dedup.simhashHamming(shDistinct, fp, dictAttach = true)
          .filter(col("hamming") <= 3)
        println(s"""{"counts":"simhash","raw_cands":${shRaw.count()},"distinct_cands":${shDistinct.count()},"verified":${shVer.count()}}""")
      case "mh_stage_cands" =>
        // bucket agg + pair explode, NO distinct — the pre-distinct stage
        for (r <- 1 to reps) runTimed("mh_stage_cands", r) {
          val (_, sigs) = Dedup.minhashDocsSigs(documents)
          Dedup.minhashBuckets(sigs)
            .select(explode(sortedLongPairsKernel(col("ids"))).as("p"))
            .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
        }
      case "mh_stage_distinct" =>
        // same + the distinct — the delta vs mh_stage_cands IS the distinct
        for (r <- 1 to reps) runTimed("mh_stage_distinct", r) {
          val (_, sigs) = Dedup.minhashDocsSigs(documents)
          Dedup.minhashBuckets(sigs)
            .select(explode(sortedLongPairsKernel(col("ids"))).as("p"))
            .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
            .distinct()
        }
      case "mh_stage_sigs" =>
        // docs+sigs build only (shingle + signature kernels + checkpoints)
        for (r <- 1 to reps) runTimed("mh_stage_sigs", r) {
          val (_, sigs) = Dedup.minhashDocsSigs(documents)
          sigs
        }
      case "mh_stage_minband" =>
        // + min-band emission (buckets, explode, sig attach, kernel filter,
        // est projection) — no est gate, no jaccard, no sort
        for (r <- 1 to reps) runTimed("mh_stage_minband", r) {
          val (_, sigs) = Dedup.minhashDocsSigs(documents)
          Dedup.minbandPairs(sigs)
        }
      case "mh_stage_est" =>
        // + the est >= 0.25 gate
        for (r <- 1 to reps) runTimed("mh_stage_est", r) {
          val (_, sigs) = Dedup.minhashDocsSigs(documents)
          Dedup.minbandPairs(sigs).filter(col("est_sim") >= 0.25)
        }
      case "mh_cur"    => for (r <- 1 to reps) runTimed("mh_cur", r)(mhPairs(bcast = false))
      case "mh_bcast"  => for (r <- 1 to reps) runTimed("mh_bcast", r)(mhPairs(bcast = true))
      case "mh_minband" =>
        for (r <- 1 to reps) runTimed("mh_minband", r)(mhPairs(bcast = true, minband = true))
      case "mh_minband_reattach" =>
        // the pre-fusion shape: min-band emission, then the verify stage
        // re-attaches sigs and recomputes est via the zip_with HOF — the
        // same-session baseline for the est-fusion A/B
        for (r <- 1 to reps) runTimed("mh_minband_reattach", r) {
          val (docs, sigs) = Dedup.minhashDocsSigs(documents)
          Dedup.minhashVerified(
              Dedup.minbandPairs(sigs).select(col("doc_a"), col("doc_b")),
              docs, sigs, bcastAttach = true)
            .select(col("doc_a"), col("doc_b"),
              round(col("est_sim"), 4).as("est_sim"), round(col("jaccard"), 4).as("jaccard"))
            .orderBy("doc_a", "doc_b")
        }
      case "mh_minband_parity" =>
        val a = checksum(mhPairs(bcast = true))
        val b = checksum(mhPairs(bcast = true, minband = true))
        println(s"""{"parity":"mh_minband","distinct":"$a","minband":"$b","equal":${a == b}}""")
      case "sh_cur"    => for (r <- 1 to reps) runTimed("sh_cur", r)(shPairs(verifyFirst = false))
      case "sh_vfirst" => for (r <- 1 to reps) runTimed("sh_vfirst", r)(shPairs(verifyFirst = true))
      case "sql_agg" =>
        // dedup_minhash_sql, groupBy(doc_a, doc_b).count() fallback shape
        // (forced via the gate conf; this was the only shape pre-r18)
        for (r <- 1 to reps) runTimed("sql_agg", r) {
          spark.conf.set(Dedup.BcastAttachMaxDocsKey, "0")
          try Dedup.minhashSqlPairs(spark, sfDir)
          finally spark.conf.unset(Dedup.BcastAttachMaxDocsKey)
        }
      case "sql_mapside" =>
        // dedup_minhash_sql, map-side first-band emission (default gate)
        for (r <- 1 to reps) runTimed("sql_mapside", r)(
          Dedup.minhashSqlPairs(spark, sfDir))
      case "sql_parity" =>
        spark.conf.set(Dedup.BcastAttachMaxDocsKey, "0")
        val a = try checksum(Dedup.minhashSqlPairs(spark, sfDir))
                finally spark.conf.unset(Dedup.BcastAttachMaxDocsKey)
        val b = checksum(Dedup.minhashSqlPairs(spark, sfDir))
        println(s"""{"parity":"minhash_sql","agg":"$a","mapside":"$b","equal":${a == b}}""")
      case "parity" =>
        val a = checksum(mhPairs(bcast = false)); val b = checksum(mhPairs(bcast = true))
        println(s"""{"parity":"minhash","cur":"$a","bcast":"$b","equal":${a == b}}""")
        val c = checksum(shPairs(verifyFirst = false)); val d = checksum(shPairs(verifyFirst = true))
        println(s"""{"parity":"simhash","cur":"$c","vfirst":"$d","equal":${c == d}}""")
      case other => System.err.println(s"[probe] unknown variant $other")
    }
    spark.stop()
  }
}

package graft.streaming

import graft.functions.TextKernels
import graft.ops.Dedup.{Bands, NumPerms}
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Streaming MinHash-LSH near-duplicate detection — the continuous-
  * ingestion counterpart of the batch LSH family (`Dedup.minhashPairs`):
  * a corpus feed is checked for NEAR-duplicates (not just exact content
  * matches, which [[EventStream.streamingContentDedup]] already handles)
  * against everything previously ingested, on arrival, without ever
  * re-running a full-corpus batch dedup.
  *
  * Same sketch as batch: md5-based 32-permutation MinHash signatures
  * (map-side codegen kernels), 16 × 2 banding. The state layer replaces
  * the batch band-bucket self-join: each (band, k0, k1) bucket is a
  * `transformWithState` key (packed to one xxhash64 long — fixed-width
  * shuffle/state keys; a collision merging two buckets is a ~2⁻⁴⁷ event
  * that could only ADD candidates, never lose one) whose [[ListState]]
  * holds the signatures
  * registered in that bucket, capped at [[BucketCap]] entries — the same
  * skew guard as the batch 2..1000 bucket filter, bounding both state
  * size and per-arrival compare work no matter how degenerate a bucket
  * gets (boilerplate-heavy feeds). An arriving document compares its
  * signature against its bucket's registry (≤ BucketCap × 16 signature
  * compares per doc) and emits a candidate for every estimate ≥
  * [[EstThreshold]] — a superset of the batch pipeline's verified pairs
  * FOR CORPORA WHOSE BUCKETS STAY WITHIN [[BucketCap]] (streaming emits
  * sketch candidates; exact-Jaccard confirmation joins the stored corpus
  * downstream, exactly as batch verification does). The caps diverge on
  * 65..1000-member buckets: batch emits all pairs up to its 1000-member
  * gate, while the stream stops REGISTERING after BucketCap arrivals, so
  * a pair of two post-cap arrivals in the same hot bucket is found only
  * if another band buckets them below cap — the deliberate price of
  * bounding per-arrival work on a skewed endless feed (a batch job can
  * afford one 1000² bucket; an ingest path compounding that every
  * micro-batch cannot). StreamingSpec's superset check runs on a corpus
  * whose buckets sit far below the cap, where the contract is exact.
  *
  * Scale shape: one shuffle (groupByKey on the bucket key), state
  * entries are (8-byte id + 16-long PACKED signature) ≈ 140 B — two
  * 31-bit minhash values per long, never text — and RocksDB owns the
  * registry. At 100 TB-feed scale the TTL knob
  * (`ttl` arg → TTLConfig on the list state, processing-time mode)
  * bounds the horizon like dropDuplicatesWithinWatermark does for exact
  * dedup — registry entries expire after the configured age, so state is
  * O(active horizon) not O(corpus); exercised by StreamingSpec's TTL
  * variant. The batch-parity spec runs unbounded (TTLConfig.NONE). */
object DedupStream {

  /** One bucket-registry entry: a previously ingested doc's signature,
    * PACKED two 31-bit minhash values per long (the kernel's values are
    * mod 2³¹−1, so 32 perms ride in 16 longs — half the state bytes and
    * half the shuffle payload of the unpacked form; per-perm equality is
    * per-half equality, so estimates are bit-identical). */
  case class BucketEntry(docId: Long, sig: Array[Long])

  /** Packed signature length: [[NumPerms]] 31-bit values, 2 per long.
    * Equal to [[Bands]] because Rows == 2 — the banding below leans on
    * that identity (packed element b IS band b's (k0, k1) key). */
  val PackedLen: Int = NumPerms / 2

  /** A near-dup candidate discovered on arrival (docA < docB). */
  case class StreamCandidate(docA: Long, docB: Long, band: Int, estSim: Double)

  /** Per-bucket registry cap — the streaming analog of the batch
    * pipeline's 1000-member bucket filter (skew guard). */
  val BucketCap = 64
  /** Minimum signature-agreement estimate to emit a candidate — shared
    * with the batch pipeline's estimate gate. */
  val EstThreshold = 0.25

  /** Stateful core: key = the packed 64-bit (band, k0, k1) bucket id,
    * value rows = (bucket, band, doc_id, sig). The key's VALUE is never
    * read (band rides in the row) — it only partitions state — which is
    * why a fixed-width long beats the former "band:k0:k1" string: the
    * typed groupByKey sort-shuffle orders 8-byte longs instead of ~25-char
    * strings and RocksDB keys shrink ~3×. Arrivals within a micro-batch
    * are processed in doc_id order so output is deterministic regardless
    * of shuffle iterator order; same-batch pairs are found because each
    * arrival registers before the next is compared. Generic in K so the
    * key representation can evolve without touching the compare logic. */
  class LshBucketProcessor[K](ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[K, (K, Int, Long, Array[Long]), StreamCandidate] {

    @transient private var entries: ListState[BucketEntry] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      entries = getHandle.getListState[BucketEntry](
        "entries", Encoders.product[BucketEntry], ttl)

    override def handleInputRows(key: K,
                                 rows: Iterator[(K, Int, Long, Array[Long])],
                                 timers: TimerValues): Iterator[StreamCandidate] = {
      val arrivals = rows.toSeq.sortBy(_._3)
      val registry = scala.collection.mutable.ArrayBuffer.empty[BucketEntry]
      entries.get().foreach(registry += _)
      val out = scala.collection.mutable.ArrayBuffer.empty[StreamCandidate]
      var appended = false
      arrivals.foreach { case (_, band, docId, sig) =>
        if (!registry.exists(_.docId == docId)) {
          registry.foreach { e =>
            // matching perms = matching 32-bit halves of the packed sig
            var m = 0
            var i = 0
            while (i < PackedLen) {
              val x = e.sig(i) ^ sig(i)
              if ((x >>> 32) == 0L) m += 1
              if ((x & 0xFFFFFFFFL) == 0L) m += 1
              i += 1
            }
            val est = m.toDouble / NumPerms
            if (est >= EstThreshold)
              out += StreamCandidate(math.min(e.docId, docId),
                math.max(e.docId, docId), band, est)
          }
          if (registry.size < BucketCap) {
            registry += BucketEntry(docId, sig)
            appended = true
          }
        }
      }
      // one state write per (bucket, micro-batch), not per arrival
      if (appended) entries.put(registry.toArray)
      out.iterator
    }
  }

  /** The streaming query: docs (doc_id, text) → banded signatures →
    * per-bucket stateful compare. Candidates may repeat across bands —
    * downstream consumers (or the verification join) dedupe on
    * (docA, docB), as the batch pipeline's `distinct()` does.
    *
    * `ttl` bounds the dedup horizon: registry entries older than the
    * duration expire from state (RocksDB TTL, processing-time mode), so
    * an endless feed holds O(horizon) state instead of O(corpus). None
    * (default) keeps the registry forever — full batch parity. */
  def streamingNearDup(spark: SparkSession, docs: DataFrame,
                       ttl: Option[java.time.Duration] = None): DataFrame = {
    import spark.implicits._
    val sigs = docs.select(col("doc_id"),
      TextKernels.minhashSigKernel(
        TextKernels.shinglesKernel(col("text"), 3), NumPerms).as("sig"))
    // pack ONCE per doc (2 × 31-bit minhash values per long), then band:
    // with Rows == 2, band b's (k0, k1) key IS packed element b, so the
    // bucket hash and the registry share the same 16-long array — the
    // explode duplicates half the bytes the unpacked form shuffled
    val packed = sigs.select(col("doc_id"),
      transform(sequence(lit(0), lit(PackedLen - 1)),
        j => shiftleft(col("sig")(j * 2), 32)
          .bitwiseOR(col("sig")(j * 2 + 1))).as("psig"))
    val banded = packed
      .select(col("doc_id"), col("psig"),
        explode(sequence(lit(0), lit(Bands - 1))).as("band"))
      .select(
        xxhash64(col("band"), col("psig")(col("band"))).as("bucket"),
        col("band"), col("doc_id"), col("psig"))
      .as[(Long, Int, Long, Array[Long])]
    // TTL states require processing-time mode; without TTL stay in
    // TimeMode.None so the unbounded path carries no clock machinery
    val (proc, timeMode) = ttl match {
      case Some(d) => (new LshBucketProcessor[Long](TTLConfig(d)), TimeMode.ProcessingTime())
      case None    => (new LshBucketProcessor[Long](), TimeMode.None())
    }
    banded
      .groupByKey(_._1)
      .transformWithState(proc, timeMode, OutputMode.Append())
      .toDF()
  }
}

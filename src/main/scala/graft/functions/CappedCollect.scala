package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** Size-capped distinct-id bucket collector — the shared membership
  * aggregate for every LSH bucket builder (MinHash bands, SimHash
  * pigeonhole chunks, the n-gram posting index, embedding LSH codes).
  *
  * Why not `collect_set(id)` + `filter(size BETWEEN lo AND hi)`: that
  * shape enforces the skew cap AFTER the aggregate, so a hot bucket's
  * FULL membership (boilerplate mega-buckets: millions of identical-
  * signature documents at corpus scale) materializes in one
  * ObjectHashAggregate buffer — and ships through the exchange — before
  * the size filter can drop it. Exactly the executor-OOM shape the caps
  * exist to prevent, one plan step too late.
  *
  * This aggregator moves the cap INTO the aggregation: the buffer stops
  * holding ids the moment its count exceeds `hi` (membership can never
  * be needed again — counts only grow), so every partial buffer is
  * bounded at `hi` ids (8 KB at hi=1000) regardless of bucket heat, the
  * shuffle carries at most `hi` ids per (map partition, hot key) instead
  * of the full membership, and over-cap buffers free their array
  * immediately. Same single-shuffle plan as `collect_set` (Spark plans
  * it as a partial/final ObjectHashAggregate pair), same output for
  * every surviving bucket: a bucket with n ≤ hi is never truncated, and
  * a truncated bucket is by construction over-cap and dropped.
  *
  * CONTRACT: input rows must be duplicate-free per group — (key, id)
  * pairs appear once — so count(*) ≡ count(DISTINCT id) and the
  * collected list IS the member set. All four callers satisfy it
  * structurally: a doc contributes one row per MinHash band / SimHash
  * chunk, `TextKernels.shingles` emits DISTINCT shingles per doc, and
  * an embedding contributes one row per LSH table. Groups whose count
  * falls outside [lo, hi] emit an EMPTY array (callers filter
  * `size(ids) > 0`; lo ≥ 1 always, so empty is unambiguous).
  *
  * Member order is accumulation order (nondeterministic across runs,
  * like `collect_set`) — every consumer sorts (`sort_array` /
  * `sortedLongPairsKernel`) before emitting pairs.
  */
object CappedCollect {

  /** Mutable (count, members) accumulator. `ids.length == n` while
    * n ≤ hi; past the cap `ids` is freed and only `n` keeps counting. */
  case class CapBuf(var n: Long, var ids: Array[Long])

  private val EmptyIds = Array.emptyLongArray

  /** The typed Aggregator; instantiate via [[cappedIdSet]]. */
  class CappedIdSet(lo: Int, hi: Int)
      extends Aggregator[Long, CapBuf, Array[Long]] {
    def zero: CapBuf = CapBuf(0L, EmptyIds)
    def reduce(b: CapBuf, id: Long): CapBuf = {
      b.n += 1
      b.ids = if (b.n <= hi) b.ids :+ id else EmptyIds
      b
    }
    def merge(x: CapBuf, y: CapBuf): CapBuf = {
      x.n += y.n
      x.ids = if (x.n <= hi) x.ids ++ y.ids else EmptyIds
      x
    }
    def finish(r: CapBuf): Array[Long] =
      if (r.n >= lo && r.n <= hi) r.ids else EmptyIds
    def bufferEncoder: Encoder[CapBuf] = Encoders.product[CapBuf]
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** `capped_id_set(id)` aggregate column factory: collect the group's
    * id set iff the group size lands in [lo, hi], else an empty array. */
  def cappedIdSet(lo: Int, hi: Int): UserDefinedFunction = {
    require(lo >= 1 && hi >= lo, s"capped_id_set bounds [$lo, $hi]")
    udaf(new CappedIdSet(lo, hi), Encoders.scalaLong)
      .withName("capped_id_set")
  }
}

package graft

import graft.streaming.{LongKV, RollupCore}
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

/** Unit coverage for the rollup union-find's TTL-eviction corners —
  * the cases a streaming harness cannot produce deterministically
  * (RocksDB TTL evicts on its own clock). [[LongKV]] lets a spec play
  * the store and evict chosen keys between batches, reproducing the
  * exact orphaning the advisor flagged: a `next`-link eviction
  * truncates a losing-set walk, and a later merge launched from the
  * stale root must NOT re-point live docs to a larger root. */
class RollupCoreSpec extends AnyFunSuite {

  private class MemKV extends LongKV {
    val m = mutable.Map.empty[Long, Long]
    def get(k: Long): Option[Long] = m.get(k)
    def put(k: Long, v: Long): Unit = m(k) = v
    def remove(k: Long): Unit = m.remove(k)
  }

  private class Harness(repair: Boolean) {
    val parent = new MemKV; val next = new MemKV; val tail = new MemKV
    val core = new RollupCore(parent, next, tail, repairOrphans = repair)
    val deltas = mutable.ArrayBuffer.empty[(Long, Long)]
    def batch(edges: (Long, Long)*): Seq[(Long, Long)] = {
      val out = core.processEdges(edges.toArray).toSeq
      deltas ++= out
      out
    }
    def fold: Map[Long, Long] =
      deltas.groupBy(_._1).map { case (d, ds) => d -> ds.map(_._2).min }
    def assertMonotone(): Unit =
      deltas.groupBy(_._1).foreach { case (d, ds) =>
        val seq = ds.map(_._2)
        assert(seq.zip(seq.tail).forall { case (a, b) => b <= a },
          s"doc $d emitted a rep INCREASE: $seq")
      }
  }

  /** Reference: plain eager union-find, component label = min member. */
  private def referenceMinima(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val p = mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val px = p.getOrElseUpdate(x, x)
      if (px == x) x else { val r = find(px); p(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val w = math.min(ra, rb); p(math.max(ra, rb)) = w }
    }
    p.keys.map(d => d -> find(d)).toMap
  }

  test("no-eviction path: deltas fold to component minima, reps monotone") {
    val rng = new scala.util.Random(7)
    val edges = Seq.fill(400)((rng.nextInt(120).toLong, rng.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
    val h = new Harness(repair = false)
    edges.grouped(40).foreach(g => h.batch(g: _*))
    h.assertMonotone()
    assert(h.fold == referenceMinima(edges))
  }

  test("advisor scenario: next-link eviction must not emit an increasing rep") {
    // set {10,11,12} (list 10→11→12), singleton 1. Evict next(11), then
    // merge (1,10): the walk truncates after 11, orphaning 12 at the
    // demoted root 10. A later edge (5,12) resolving 12 to the STALE 10
    // would pick win=5 and walk 10's old list, re-pointing live docs
    // 10,11 (root 1) up to 5 — the exact advisor bug. Repair must
    // instead resolve 12 through the demotion chain to 1.
    val h = new Harness(repair = true)
    h.batch((10L, 11L), (10L, 12L))
    h.next.remove(11L) // simulated TTL eviction
    h.batch((1L, 10L)) // truncated walk: 12 never re-pointed
    assert(h.parent.m(12L) == 10L, "precondition: 12 is orphaned at 10")
    h.batch((5L, 12L))
    h.assertMonotone()
    assert(h.fold == Map(1L -> 1L, 5L -> 1L, 10L -> 1L, 11L -> 1L, 12L -> 1L))
    // and 12 is walkable again: a smaller root arriving re-points it
    h.batch((0L, 1L))
    assert(h.fold.values.toSet == Set(0L))
  }

  test("fresh re-entry severs a stale surviving next link (advisor r17)") {
    // set {1,10,11} with list 1→10→11, so next(10) exists. Evict ONLY
    // parent(10) — parent is rewritten on every re-point, next is not,
    // so this split eviction is reachable under TTL. 10 then re-enters
    // as a fresh root via resolve's None branch and immediately LOSES
    // to 5: the walk launches from 10, and without severing the stale
    // link it would traverse next(10)=11 into root 1's live list and
    // re-point live doc 11 up to 5 — a monotonicity violation on a doc
    // eviction never touched.
    val h = new Harness(repair = true)
    h.batch((1L, 10L), (1L, 11L))
    assert(h.next.m(10L) == 11L, "precondition: 10's next link exists")
    h.parent.m.remove(10L) // evict only the parent entry
    val out = h.batch((5L, 10L)) // 10 re-enters fresh, then loses to 5
    assert(out.toSet == Set((5L, 5L), (10L, 10L), (10L, 5L)), out.toString)
    assert(h.parent.m(11L) == 1L, "live doc 11 must keep its live root")
    // 10's own re-entry may raise its rep (documented fresh-singleton
    // contract); every OTHER doc must stay monotone
    h.deltas.groupBy(_._1).filter(_._1 != 10L).foreach { case (d, ds) =>
      val seq = ds.map(_._2)
      assert(seq.zip(seq.tail).forall { case (a, b) => b <= a },
        s"doc $d emitted a rep INCREASE: $seq")
    }
  }

  test("evicted chain end revives as a fresh root; list re-threads") {
    val h = new Harness(repair = true)
    h.batch((1L, 2L))
    h.parent.m.remove(1L) // root's own parent entry evicted
    val out = h.batch((2L, 3L))
    assert(out.contains((1L, 1L)), s"revive emission missing: $out")
    h.assertMonotone()
    assert(h.fold == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // the revived root's list reaches 2 and 3 again: a losing walk from
    // 1 must re-emit all three
    val out2 = h.batch((0L, 3L))
    assert(out2.toSet == Set((0L, 0L), (1L, 0L), (2L, 0L), (3L, 0L)), out2.toString)
  }

  test("localForest pre-reduction preserves the serial delta sequence exactly") {
    // redundancy-heavy feed: dense clusters, each pair re-emitted
    // several times (the ≤-Bands fold), split across simulated
    // partition slices — the serial stage must emit the IDENTICAL
    // delta sequence whether it sees the raw batches or each slice's
    // spanning forest, across multiple stateful batches
    val rng = new scala.util.Random(13)
    def cluster(base: Long, n: Int): Seq[(Long, Long)] =
      for { i <- 0 until n; j <- i + 1 until n; _ <- 0 until 1 + rng.nextInt(3) }
        yield (base + i, base + j)
    val batches = Seq(
      rng.shuffle(cluster(100, 6) ++ cluster(200, 4) ++ Seq((100L, 100L))),
      rng.shuffle(cluster(100, 8) ++ cluster(200, 7) ++ Seq((100L, 200L), (205L, 103L))))
    val raw = new Harness(repair = false)
    val reduced = new Harness(repair = false)
    var rawEdges = 0
    var keptEdges = 0
    batches.foreach { b =>
      raw.batch(b: _*)
      // simulate 3 partition slices: reduce each independently
      val slices = b.zipWithIndex.groupBy(_._2 % 3).values.map(_.map(_._1))
      val kept = slices.flatMap(s =>
        graft.streaming.RollupCore.localForest(s.toArray)).toSeq
      rawEdges += b.size
      keptEdges += kept.size
      reduced.batch(kept: _*)
    }
    assert(raw.deltas == reduced.deltas,
      s"delta sequence diverged:\nraw     ${raw.deltas}\nreduced ${reduced.deltas}")
    assert(keptEdges < rawEdges / 2,
      s"pre-reduction too weak on a dense feed: $keptEdges of $rawEdges kept")
    assert(raw.fold == referenceMinima(batches.flatten))
  }

  test("TTL walk survives a stale next-cycle: terminates, severs the closing link") {
    // eviction-era concats can leave stale links that thread fragments
    // into a next-CYCLE (constructible only through a long eviction
    // dance; planted directly here). The losing walk must terminate,
    // emit each member once, and sever the closing link.
    val h = new Harness(repair = true)
    // set rooted at 5 whose list physically cycles: 5→6→7→5
    h.parent.m ++= Map(5L -> 5L, 6L -> 5L, 7L -> 5L)
    h.next.m ++= Map(5L -> 6L, 6L -> 7L, 7L -> 5L)
    h.tail.m ++= Map(5L -> 7L)
    val out = h.batch((1L, 5L)) // 1 wins; walk 5's cyclic list
    assert(out.toSet == Set((1L, 1L), (5L, 1L), (6L, 1L), (7L, 1L)), out.toString)
    assert(out.size == 4, s"revisit emitted duplicates: $out")
    assert(!h.next.m.contains(7L), "closing link must be severed")
    h.assertMonotone()
  }

  test("PackedBatchedKV overlay: identical deltas and identical store state vs direct ops") {
    import graft.streaming.{PackedBatchedKV, TripleKV, UFEntry}
    val rng = new scala.util.Random(59)
    val batches = Seq.fill(8)(Seq.fill(80)(
      (rng.nextInt(60).toLong, rng.nextInt(60).toLong)).filter(p => p._1 != p._2))
    // direct: core writes straight to three per-field store maps
    val direct = new Harness(repair = true)
    // packed: same logic behind the one-entry-per-doc overlay, flushed
    // like the processor does; evictions hit the UNDERLYING stores
    // between batches in both runs, WHOLE-ENTRY on both sides (packed
    // eviction granularity is the entry, so the direct run drops the
    // doc's three fields together to stay comparable)
    val packedStore = mutable.Map.empty[Long, UFEntry]
    val overlay = new PackedBatchedKV(new TripleKV {
      def get(k: Long): Option[UFEntry] = packedStore.get(k)
      def put(k: Long, v: UFEntry): Unit = packedStore(k) = v
      def remove(k: Long): Unit = packedStore.remove(k)
    })
    val pCore = new RollupCore(overlay.parent, overlay.next, overlay.tail,
      repairOrphans = true)
    val pDeltas = mutable.ArrayBuffer.empty[(Long, Long)]
    batches.foreach { b =>
      direct.batch(b: _*)
      pDeltas ++= pCore.processEdges(b.toArray)
      overlay.flush()
      (1 to 3).foreach { _ =>
        val k = rng.nextInt(60).toLong
        direct.parent.m.remove(k); direct.next.m.remove(k); direct.tail.m.remove(k)
        packedStore.remove(k)
      }
    }
    assert(direct.deltas == pDeltas, "overlay changed the delta sequence")
    // unpack the packed store and compare field-by-field (absent
    // sentinel fields must mirror missing per-field entries)
    val A = PackedBatchedKV.Absent
    def field(f: UFEntry => Long): Map[Long, Long] =
      packedStore.collect { case (k, e) if f(e) != A => k -> f(e) }.toMap
    assert(direct.parent.m.toMap == field(_.parent), "parent state diverged")
    assert(direct.next.m.toMap == field(_.next), "next state diverged")
    assert(direct.tail.m.toMap == field(_.tail), "tail state diverged")
    assert(!packedStore.values.exists(e =>
      e.parent == A && e.next == A && e.tail == A),
      "flush must remove all-absent entries, not strand them")
  }

  test("PackedBatchedKV per-field removes: all-absent entries vanish at flush") {
    import graft.streaming.{PackedBatchedKV, TripleKV, UFEntry}
    val store = mutable.Map.empty[Long, UFEntry]
    val kv = new PackedBatchedKV(new TripleKV {
      def get(k: Long): Option[UFEntry] = store.get(k)
      def put(k: Long, v: UFEntry): Unit = store(k) = v
      def remove(k: Long): Unit = store.remove(k)
    })
    kv.parent.put(7L, 1L); kv.next.put(7L, 2L); kv.tail.put(7L, 3L)
    kv.flush()
    assert(store(7L) == UFEntry(1L, 2L, 3L))
    // read-through sees the store; removing two fields keeps the third
    assert(kv.next.get(7L).contains(2L))
    kv.next.remove(7L); kv.tail.remove(7L)
    kv.flush()
    assert(store(7L) == UFEntry(1L, PackedBatchedKV.Absent, PackedBatchedKV.Absent))
    assert(kv.next.get(7L).isEmpty && kv.parent.get(7L).contains(1L))
    // removing the last live field removes the entry outright
    kv.parent.remove(7L)
    kv.flush()
    assert(!store.contains(7L), s"expected entry gone, got ${store.get(7L)}")
    // removes against an absent entry stay no-ops (no resurrection)
    kv.tail.remove(7L)
    kv.flush()
    assert(!store.contains(7L))
  }

  test("randomized next/tail evictions: monotone always, exact after re-touch") {
    val rng = new scala.util.Random(41)
    val edges = Seq.fill(600)((rng.nextInt(150).toLong, rng.nextInt(150).toLong))
      .filter { case (a, b) => a != b }
    val h = new Harness(repair = true)
    edges.grouped(30).foreach { g =>
      h.batch(g: _*)
      // evict a few random list links between batches (never parent
      // entries: those are the documented fresh-re-entry path, which
      // MAY raise a rep; link evictions alone must never)
      (1 to 5).foreach { _ =>
        val k = rng.nextInt(150).toLong
        if (rng.nextBoolean()) h.next.remove(k) else h.tail.remove(k)
      }
    }
    h.assertMonotone()
    // replay every edge once: each doc is touched, so repair-on-touch
    // must restore the exact component-minimum assignment
    edges.grouped(50).foreach(g => h.batch(g: _*))
    h.assertMonotone()
    assert(h.fold == referenceMinima(edges))
  }
}

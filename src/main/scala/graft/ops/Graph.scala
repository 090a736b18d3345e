package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over derived edge sets — the Pregel-class
  * workload next to [[Dedup.connectedComponents]]'s label propagation
  * (beyond-reference; the reference has no iterative operators at all).
  *
  * Scale notes (the parts that must survive 100 TB):
  *   - the edge list is the big, STATIC side: it is hash-partitioned on
  *     the join key once and persisted, so every iteration re-shuffles
  *     only the small rank table, never the edges;
  *   - each iteration is one equi-join + one aggregation — contributions
  *     partial-aggregate map-side, so the per-iteration shuffle carries
  *     one (dst, partial sum) row per partition, not one row per edge;
  *   - lineage is truncated every `checkpointEvery` iterations
  *     (localCheckpoint by default; durable `checkpoint()` when
  *     `spark.graft.checkpointDir` is set — same fault-tolerance switch
  *     as connected components). Fixed iteration count → no convergence
  *     probe needed, so cadence > 1 trades plan depth for fewer jobs.
  */
object Graph {

  /** Co-purchase edge list: DISTINCT directed pairs of parts appearing on
    * high-quantity lines of the same order (both directions; self-loops
    * excluded). Built as groupBy(order) → in-group pair kernel — ONE
    * shuffle instead of a self-join's two, with the quantity filter pushed
    * into the parquet scan. Group size is bounded (≤ 7 lineitems per
    * order), so the pair expansion is bounded per key — the same
    * blocked-pair discipline as the dedup candidate generators. */
  def coPurchaseEdges(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.GraftFunctions.pairsCol
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_quantity") >= 25)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val fwd = li.groupBy(col("ok"))
      .agg(array_distinct(collect_list(col("pk"))).as("pks"))
      .filter(size(col("pks")) >= 2)
      .select(explode(pairsCol(col("pks"))).as("p"))
      .select(col("p.a").as("src"), col("p.b").as("dst"))
    fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst"))).distinct()
  }

  /** Simplified PageRank (uniform teleport, unnormalized: r' = (1−d) +
    * d·Σ_in r/outdeg — the textbook power-iteration form) over the nodes
    * that carry at least one out-edge. Fixed `iters` rounds keeps the
    * result deterministic and cross-engine reproducible. */
  def pageRank(edges: DataFrame, iters: Int = 6, d: Double = 0.85,
               checkpointEvery: Int = 2): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val spark = edges.sparkSession
    val reliableDir = spark.conf.getOption(Dedup.CheckpointDirKey)
    reliableDir.foreach(spark.sparkContext.setCheckpointDir)
    // static side: partition on the propagation key once, reuse every round
    val e = edges.repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = deg.select(col("src").as("node"), lit(1.0).as("rank"))
    var i = 0
    while (i < iters) {
      val contribs = ranks
        .join(deg.withColumnRenamed("src", "node"), Seq("node"))
        .select(col("node").as("src"), (col("rank") / col("outdeg")).as("contrib"))
      val summed = e.join(contribs, Seq("src"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("msum"))
      ranks = deg.select(col("src").as("node"))
        .join(summed.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(1.0 - d) + lit(d) * coalesce(col("msum"), lit(0.0))).as("rank"))
      i += 1
      if (i % checkpointEvery == 0 || i == iters) {
        ranks = reliableDir match {
          case Some(_) =>
            ranks.persist(StorageLevel.MEMORY_AND_DISK)
            ranks.checkpoint()
          case None => ranks.localCheckpoint()
        }
      }
    }
    ranks
  }

  /** Driver query: top 25 parts by co-purchase PageRank. Ordered by the
    * ROUNDED rank (ties broken by part id) so the top-k cut line never
    * depends on a last-ulp summation difference between engines. */
  def pagerankTop(spark: SparkSession, dir: String): DataFrame =
    pageRank(coPurchaseEdges(spark, dir))
      .select(col("node").as("part_id"), round(col("rank"), 4).as("rank"))
      .orderBy(desc("rank"), col("part_id"))
      .limit(25)

  /** Per-node triangle counts via DEGREE-ORIENTED wedge enumeration — the
    * standard trick that keeps triangle counting near-linear on power-law
    * graphs: each undirected edge is directed from its lower-(degree, id)
    * endpoint to its higher one, making the orientation a total order
    * (acyclic), so every triangle is enumerated exactly once as
    * a→b, b→c, a→c, and the wedge fan-out at a hub is bounded by its
    * ORIENTED out-degree (≈√m) instead of its raw degree. An id-only
    * orientation would funnel every wedge through the hubs — the
    * difference between O(m^1.5) and O(m·d_max) at 100 TB. Entirely
    * integer arithmetic, so the DuckDB oracle matches bit-for-bit. */
  def triangleCounts(spark: SparkSession, dir: String): DataFrame =
    triangleCountsDf(coPurchaseEdges(spark, dir))

  /** Core of [[triangleCounts]] over any undirected (both-directions,
    * self-loop-free) edge list. */
  def triangleCountsDf(und: DataFrame): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val deg = und.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val once = und.filter(col("src") < col("dst"))
      .join(deg.select(col("src").as("u"), col("deg").as("du")), col("src") === col("u"))
      .join(deg.select(col("src").as("v"), col("deg").as("dv")), col("dst") === col("v"))
    val fwd = col("du") < col("dv") || (col("du") === col("dv") && col("src") < col("dst"))
    val o = once.select(
      when(fwd, col("src")).otherwise(col("dst")).as("lo"),
      when(fwd, col("dst")).otherwise(col("src")).as("hi"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tri = o.select(col("lo").as("a"), col("hi").as("b"))
      .join(o.select(col("lo").as("b"), col("hi").as("c")), Seq("b"))
      .join(o.select(col("lo").as("a"), col("hi").as("c")), Seq("a", "c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("part_id"))
      .groupBy(col("part_id")).agg(count(lit(1)).as("n_triangles"))
      .orderBy(desc("n_triangles"), col("part_id"))
      .limit(25)
  }
}

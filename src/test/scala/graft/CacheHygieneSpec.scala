package graft

/** Iterative operators persist their static sides internally; a library
  * caller on a long-lived session must NOT accumulate dead cache from
  * calling them (Bench clears caches between queries, so a leak would be
  * invisible there — this spec is the guard). After each query
  * materializes, the only resident blocks allowed are the eager
  * localCheckpoint blocks the results are made of (they ARE the result's
  * storage and are reclaimed by the ContextCleaner once unreferenced);
  * every operator-internal persist must have been released.
  */
class CacheHygieneSpec extends SparkSpec {

  private def leakedCaches(): Seq[String] =
    spark.sparkContext.getPersistentRDDs.values.toSeq
      .filterNot(_.isCheckpointed) // true once (local)Checkpoint materialized
      .map(r => s"RDD ${r.id} '${r.name}' ${r.getStorageLevel.description}")

  private def clearAll(): Unit = {
    val persisted = spark.sparkContext.getPersistentRDDs.values
    spark.catalog.clearCache()
    persisted.foreach(_.unpersist(blocking = true))
  }

  for (q <- Seq("graph_pagerank", "graph_triangles", "graph_nbr_jaccard",
    "dedup_clusters", "dedup_containment", "emb_dup_clusters",
    "dedup_minhash", "dedup_simhash_near"))
    test(s"$q leaves no cached plans behind (checkpoint blocks whitelisted)") {
      clearAll() // isolate from whatever earlier suites left in the session
      SparkEntry.queries(q)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val leaked = leakedCaches()
      assert(leaked.isEmpty, s"leaked cache blocks:\n${leaked.mkString("\n")}")
      clearAll()
    }
}

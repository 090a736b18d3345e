package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 (reference parity) plus the OLAP and
  * LLM-pipeline extensions is exposed as a named query over the driver
  * parquet tables. Queries with a DuckDB-expressible equivalent carry an
  * [[oracleSql]] entry (hash-compared at sf0.01); sketch/LSH/hash-based
  * operators whose outputs aren't ANSI-SQL-reproducible get the weaker
  * rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggregates.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- reference parity (SURVEY.md §2.2-2.4) ---
    "p1_select_alias"   -> (Relational.selectAlias(_, _)),
    "p2_filter"         -> (Relational.filterGtLiteral(_, _)),
    "p2_filter_compound"-> (Relational.filterCompound(_, _)),
    "p3_topk"           -> (Relational.topK(_, _)),
    "j1_join_inner"     -> (Relational.joinInner(_, _)),
    "e4_arith_project"  -> (Relational.arithmeticProject(_, _)),
    "join_left_outer"   -> (AsOf.leftOuterOrderCounts(_, _)),
    "join_full_outer"   -> (AsOf.fullOuterNationCounts(_, _)),
    "join_asof"         -> (AsOf.eventAsof(_, _)),
    "join_asof_fwd"     -> (AsOf.eventAsofForward(_, _)),
    "join_asof_tol"     -> (AsOf.eventAsofTolerance(_, _)),
    "join_range"        -> (AsOf.eventRangeJoin(_, _)),
    // --- OLAP completion (SURVEY.md §7.3 step 2) ---
    "q1_pricing_summary"-> (Aggregates.pricingSummary(_, _)),
    "q3_top_orders"     -> (Aggregates.revenueTopOrders(_, _)),
    "q5_nation_revenue" -> (Aggregates.revenueByNation(_, _)),
    "agg_distinct"      -> (Aggregates.distinctCustomers(_, _)),
    "q14_promo"         -> (Aggregates.promoRevenue(_, _)),
    "q4_priority"       -> (Aggregates.orderPriorityCheck(_, _)),
    "q10_returns"       -> (Aggregates.returnsTopCustomers(_, _)),
    "q7_nations"        -> (Aggregates.volumeShipping(_, _)),
    "q13_custdist"      -> (Aggregates.customerDistribution(_, _)),
    "q18_large_orders"  -> (Aggregates.largeOrders(_, _)),
    "q22_idle_rich"     -> (Aggregates.idleRichCustomers(_, _)),
    "q19_disjunctive"   -> (Aggregates.disjunctivePredicateJoin(_, _)),
    "agg_percentiles"   -> (Aggregates.percentiles(_, _)),
    "agg_stats"         -> (Aggregates.statsAggregates(_, _)),
    "agg_regression"    -> (Aggregates.regression(_, _)),
    "func_math"         -> (Relational.mathBreadth(_, _)),
    "func_bitwise"      -> (Relational.bitwiseBreadth(_, _)),
    "func_array_ops"    -> (Text.arrayTokenOps(_, _)),
    "func_levenshtein"  -> (Text.fuzzyPartNames(_, _)),
    "ev_histogram"      -> (EventTime.valueHistogram(_, _)),
    "ev_anomaly"        -> (EventTime.anomalyZScore(_, _)),
    "w6_forward_fill"   -> (Windows.forwardFill(_, _)),
    "sql_grouping_sets" -> (graft.api.GraftSql.groupingSets(_, _)),
    "text_top_tokens"   -> (Text.topTokens(_, _)),
    "text_top_tokens_lang" -> (Text.topTokensPerLang(_, _)),
    "agg_monthly"       -> (Aggregates.monthlyRevenue(_, _)),
    "text_string_funcs" -> (Text.stringFunctions(_, _)),
    "ev_json_props"     -> (Aggregates.jsonProps(_, _)),
    "ev_json_variant"   -> (Aggregates.jsonVariantProps(_, _)),
    "agg_approx_distinct" -> (Aggregates.approxDistinct(_, _)),
    "agg_hll_merge"     -> (Aggregates.hllMergePartials(_, _)),
    "agg_conditional"   -> (Aggregates.conditionalAggregates(_, _)),
    "agg_rollup"        -> (Aggregates.rollupStatusPriority(_, _)),
    "agg_cube"          -> (Aggregates.cubeFlagStatus(_, _)),
    "join_semi"         -> (Aggregates.semiJoin(_, _)),
    "join_anti"         -> (Aggregates.antiJoin(_, _)),
    "set_ops"           -> (Aggregates.setOps(_, _)),
    "join_cross_small"  -> (Aggregates.crossSmall(_, _)),
    "skew_salted_join"  -> (Skew.saltedOrderRevenue(_, _)),
    "skew_two_stage_agg"-> (Skew.twoStageAgg(_, _)),
    "sql_tpch_q6"       -> (graft.api.GraftSql.tpchQ6(_, _)),
    "sql_subquery"      -> (graft.api.GraftSql.aboveCustomerAvg(_, _)),
    "q2_min_cost_supp"  -> (graft.api.GraftSql.minCostSupplier(_, _)),
    "q21_waiting_supp"  -> (graft.api.GraftSql.waitingSuppliers(_, _)),
    "q11_part_value"    -> (graft.api.GraftSql.partValueShare(_, _)),
    "q16_supplier_cnt"  -> (graft.api.GraftSql.supplierCountNotIn(_, _)),
    "q17_small_qty"     -> (graft.api.GraftSql.smallQuantityRevenue(_, _)),
    "q20_bulk_shippers" -> (graft.api.GraftSql.bulkShippers(_, _)),
    "q8_market_share"   -> (graft.api.GraftSql.marketShare(_, _)),
    "q9_product_profit" -> (graft.api.GraftSql.productProfit(_, _)),
    "q12_ship_priority" -> (graft.api.GraftSql.shipPriority(_, _)),
    "q15_top_supplier"  -> (graft.api.GraftSql.topSupplier(_, _)),
    "set_ops_multiset"  -> (graft.api.GraftSql.setOpsMultiset(_, _)),
    "sql_recursive_spine" -> (graft.api.GraftSql.monthlySpine(_, _)),
    "sql_vec_cosine"    -> (graft.api.GraftSql.vecCosineSql(_, _)),
    "agg_pivot"         -> (Aggregates.pivotStatusPriority(_, _)),
    "agg_decimal_exact" -> (Aggregates.decimalExact(_, _)),
    "date_arith"        -> (Aggregates.dateArithmetic(_, _)),
    "agg_unpivot"       -> (Aggregates.unpivotMetrics(_, _)),
    "w4_window_breadth" -> (Windows.windowBreadth(_, _)),
    "w1_rank_per_cust"  -> (Windows.topOrdersPerCustomer(_, _)),
    "w2_running_total"  -> (Windows.runningTotal(_, _)),
    "w3_event_gaps"     -> (Windows.eventGaps(_, _)),
    "w5_range_frame"    -> (Windows.rangeFrameHourly(_, _)),
    "agg_percentiles_approx" -> (Aggregates.percentilesApprox(_, _)),
    // --- event-time analytics ---
    "ev_tumbling"       -> (EventTime.tumblingHourly(_, _)),
    "ev_sliding"        -> (EventTime.slidingWindows(_, _)),
    "ev_sessionize"     -> (EventTime.sessionize(_, _)),
    "ev_session_native" -> (EventTime.sessionizeNative(_, _)),
    "ev_funnel"         -> (EventTime.funnel(_, _)),
    "ev_retention"      -> (EventTime.hourlyRetention(_, _)),
    "text_sampling"     -> (Text.sampledCorpus(_, _)),
    // --- text analysis ---
    "text_tokens"       -> (Text.tokenCounts(_, _)),
    "text_quality"      -> (Text.qualityScores(_, _)),
    "text_lang_stats"   -> (Text.langStats(_, _)),
    "text_lang_id"      -> (Text.langId(_, _)),
    "text_fingerprint"  -> (Text.fingerprints(_, _)),
    "pipeline_clean_corpus" -> (Text.cleanCorpus(_, _)),
    "pipeline_pack_sequences" -> (Text.packSequences(_, _)),
    "text_gopher_filter"      -> (Text.gopherQualityFilter(_, _)),
    "pipeline_decontaminate"  -> (Text.contaminationCheck(_, _)),
    "pipeline_chunk"          -> (Text.chunkDocuments(_, _)),
    "pipeline_mixture"        -> (Text.mixtureReport(_, _)),
    "pipeline_temp_resample"  -> (Text.temperatureResample(_, _)),
    "text_fingerprint_fast" -> (Text.fingerprintsFast(_, _)),
    "text_perplexity"   -> (Text.trigramPerplexity(_, _)),
    "text_entropy"      -> (Text.tokenEntropy(_, _)),
    "text_bm25"         -> (Text.bm25Retrieval(_, _)),
    "text_hybrid_search"-> (Text.hybridSearch(_, _)),
    "text_pii_scrub"    -> (Text.piiScrub(_, _)),
    "text_repetition"   -> (Text.repetitionFilter(_, _)),
    "pipeline_weighted_sample" -> (Text.weightedSample(_, _)),
    "ev_transitions"    -> (EventTime.eventTransitions(_, _)),
    "ev_ab_test"        -> (EventTime.abTest(_, _)),
    "dedup_fuzzy_join"  -> (Text.fuzzyNameJoin(_, _)),
    // --- dedup ---
    "dedup_exact"       -> (Dedup.exactDedup(_, _)),
    "dedup_minhash"     -> (Dedup.minhashPairs(_, _)),
    "dedup_minhash_sql" -> (Dedup.minhashSqlPairs(_, _)),
    "dedup_simhash"     -> (Dedup.simhashGroups(_, _)),
    "dedup_simhash_near"-> (Dedup.simhashNearPairs(_, _)),
    "dedup_ngram_jaccard" -> (Dedup.ngramJaccardPairs(_, _)),
    "dedup_containment" -> (Dedup.containmentPairs(_, _)),
    "dedup_clusters"    -> (Dedup.dedupClusters(_, _)),
    "dedup_minhash_reps" -> (Dedup.minhashClusterReps(_, _)),
    "dedup_simhash_reps" -> (Dedup.simhashClusterReps(_, _)),
    "dedup_ngram_reps"  -> (Dedup.ngramClusterReps(_, _)),
    // --- similarity search ---
    "ann_brute_force"   -> (Vectors.annBruteForce(_, _)),
    "ann_range_search"  -> (Vectors.rangeSearch(_, _)),
    "ann_lsh"           -> (Vectors.annLsh(_, _)),
    "ann_ivf"           -> (Vectors.annIvf(_, _)),
    "emb_near_dup"      -> (Vectors.cosineNearDupPairs(_, _)),
    "emb_dup_clusters"  -> (Vectors.embDupClusters(_, _)),
    "emb_label_stats"   -> (Vectors.labelCentroids(_, _)),
    "emb_knn_classify"  -> (Vectors.knnClassify(_, _)),
    "emb_quantize"      -> (Vectors.quantizeInt8(_, _)),
    // --- multimodal columns ---
    "mm_media_stats"    -> (Multimodal.mediaStats(_, _)),
    "mm_frame_sample"   -> (Multimodal.frameSample(_, _)),
    "mm_manifest_plan"  -> ((s, d) => Multimodal.manifestPlan(s, d)),
    "mm_payload_dedup"  -> (Multimodal.payloadDedup(_, _)),
    "mm_modality_mix"   -> (Multimodal.modalityMix(_, _)),
    // --- iterative graph analytics ---
    "graph_pagerank"    -> (Graph.pagerankTop(_, _)),
    "graph_triangles"   -> (Graph.triangleCounts(_, _)),
    "graph_nbr_jaccard" -> (Graph.neighborJaccard(_, _)),
    // --- data-quality / CDC ---
    "dq_report"         -> (Quality.dqReport(_, _)),
    "dq_snapshot_diff"  -> (Quality.snapshotDiff(_, _)),
    "dq_drift"          -> (Quality.dqDrift(_, _)),
    // --- round 7: corpus analysis / attribution / PQ / components ---
    "text_boilerplate"  -> (Text.boilerplateStats(_, _)),
    "text_tfidf"        -> (Text.tfidfTopTerms(_, _)),
    "text_collocations" -> (Text.collocations(_, _)),
    "graph_components"  -> (Graph.components(_, _)),
    "pipeline_keep_best"-> (Dedup.keepBestPerCluster(_, _)),
    "ev_attribution"    -> (EventTime.lastTouchAttribution(_, _)),
    "join_asof_nearest" -> (AsOf.eventAsofNearest(_, _)),
    "emb_pq_codes"      -> (Vectors.pqCodes(_, _)),
    // --- round 7b: sub-document dedup / IVF-PQ / SCD2 ---
    "dedup_chunks"      -> (Dedup.chunkDedup(_, _)),
    "ann_ivf_pq"        -> (Vectors.annIvfPq(_, _)),
    "scd2_build"        -> (Windows.scd2Intervals(_, _)),
    // --- round 8: trained product quantization ---
    // rows-only BY DESIGN (FP-iterative per-subspace k-means, same reason
    // as ann_ivf); pinned by RecallSpec's reconstruction-error-improvement
    // test against the deterministic oracled emb_pq_codes
    "emb_pq_trained"    -> (Vectors.pqCodesTrained(_, _)),
    "pipeline_shard"    -> (Text.shardManifest(_, _)),
    // --- round 8b: bloom-gated incremental dedup / domain cap / LTV ---
    "dedup_bloom"       -> (Dedup.bloomDedup(_, _)),
    "pipeline_domain_cap" -> (Text.domainCap(_, _)),
    "ev_ltv_cohort"     -> (EventTime.ltvCohort(_, _)),
    "pipeline_split"    -> (Dedup.leakSafeSplit(_, _)),
    "agg_topk_sketch"   -> (Aggregates.topkSketch(_, _)),
    "pipeline_compaction_plan" -> (Text.compactionPlan(_, _)),
    "ev_forecast_baseline" -> (EventTime.forecastBaseline(_, _)),
    "dq_freshness"      -> (Quality.freshness(_, _)),
    "ev_user_paths"     -> (EventTime.userPaths(_, _)),
    "graph_degree_dist" -> (Graph.degreeDistribution(_, _)),
    "sql_lateral"       -> (graft.api.GraftSql.lateralTopOrders(_, _)),
    "pipeline_zorder_plan" -> (Layout.zorderPlan(_, _)),
  )

  /** DuckDB mirror of [[graft.ops.Graph.pagerankTop]]: the 6-round power
    * iteration unrolled as chained CTEs (plain SQL — no recursive-CTE
    * aggregation restrictions), same simplified-PageRank update. */
  private def pagerankOracle: String = {
    val steps = (1 to 6).map { k =>
      s"""pr$k AS (
         |  SELECT d.src AS node,
         |         CAST(0.15 AS DOUBLE) + CAST(0.85 AS DOUBLE) * coalesce(s.msum, CAST(0.0 AS DOUBLE)) AS rank
         |  FROM deg d LEFT JOIN (
         |    SELECT e.dst AS dst, sum(p.rank / dg.outdeg) AS msum
         |    FROM pr${k - 1} p
         |    JOIN deg dg ON dg.src = p.node
         |    JOIN edges e ON e.src = p.node
         |    GROUP BY e.dst) s ON s.dst = d.src)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS (
       |  SELECT DISTINCT l1.l_partkey AS src, l2.l_partkey AS dst
       |  FROM lineitem l1 JOIN lineitem l2
       |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey <> l2.l_partkey
       |  WHERE l1.l_quantity >= 25 AND l2.l_quantity >= 25),
       |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
       |pr0 AS (SELECT src AS node, CAST(1.0 AS DOUBLE) AS rank FROM deg),
       |$steps
       |SELECT node AS part_id, round(rank, 4) AS rank FROM pr6
       |ORDER BY rank DESC, part_id LIMIT 25""".stripMargin
  }

  /** DuckDB mirror of [[graft.ops.Vectors.pqCodes]]: the 4×8 ±1 codebook
    * dots as aliased columns (one `list_dot_product(CAST(slice AS
    * DOUBLE[]), [±1…])` each — DOUBLE[] casts force double accumulation,
    * the float32 gotcha sql_vec_cosine documents), greatest() per
    * subspace, first-match CASE chains for the tie rule, and the same
    * left-associative error sum. */
  private def pqOracle: String = {
    import graft.ops.Vectors.{PqSub, PqSubDim}
    val dotCols = (0 until PqSub).flatMap { s =>
      val lo = s * PqSubDim + 1
      val hi = (s + 1) * PqSubDim
      val vv = s"list_dot_product(CAST(e[$lo:$hi] AS DOUBLE[]), CAST(e[$lo:$hi] AS DOUBLE[])) AS vv$s"
      vv +: graft.ops.Vectors.pqOracleDots(s).zipWithIndex.map {
        case (d, c) => s"${d.replace(s"e[$lo:$hi]", s"CAST(e[$lo:$hi] AS DOUBLE[])")} AS d${s}_$c"
      }
    }
    val bests = (0 until PqSub).map { s =>
      s"greatest(${(0 until graft.ops.Vectors.PqCents).map(c => s"d${s}_$c").mkString(", ")}) AS b$s"
    }
    val codes = (0 until PqSub).map { s =>
      val cases = (0 until graft.ops.Vectors.PqCents)
        .map(c => s"WHEN d${s}_$c = b$s THEN $c").mkString(" ")
      s"CASE $cases ELSE NULL END AS code$s"
    }
    val err = (0 until PqSub).map(s => s"(vv$s - 2.0 * b$s + $PqSubDim.0)").mkString(" + ")
    s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
       |d AS (SELECT vec_id, ${dotCols.mkString(",\n        ")} FROM v),
       |b AS (SELECT *, ${bests.mkString(",\n        ")} FROM d)
       |SELECT vec_id, ${codes.mkString(",\n       ")},
       |       round($err, 4) AS recon_err
       |FROM b ORDER BY vec_id""".stripMargin
  }

  /** DuckDB mirror of [[graft.ops.Vectors.annIvfPq]]: data-sampled
    * centroids (vec_id < IvfPqList), row_number assignment with the same
    * cosine-desc/cent-asc order, the [[pqOracle]] code chains for the
    * corpus, per-query LUT columns (the same ±1 codebook dots over the
    * query subvectors), and ADC as a CASE-indexed LUT lookup per
    * subspace — every FP operation replayed in the same order. */
  private def ivfPqOracle: String = {
    import graft.ops.Vectors.{PqSub, PqSubDim, PqCents, IvfPqList, IvfPqProbe}
    def castDots(s: Int, alias: Int => String): Seq[String] = {
      val lo = s * PqSubDim + 1
      val hi = (s + 1) * PqSubDim
      graft.ops.Vectors.pqOracleDots(s).zipWithIndex.map { case (d, c) =>
        s"${d.replace(s"e[$lo:$hi]", s"CAST(e[$lo:$hi] AS DOUBLE[])")} AS ${alias(c)}"
      }
    }
    val dotCols = (0 until PqSub).flatMap(s => castDots(s, c => s"d${s}_$c"))
    val bests = (0 until PqSub).map { s =>
      s"greatest(${(0 until PqCents).map(c => s"d${s}_$c").mkString(", ")}) AS b$s"
    }
    val codes = (0 until PqSub).map { s =>
      val cases = (0 until PqCents).map(c => s"WHEN d${s}_$c = b$s THEN $c").mkString(" ")
      s"CASE $cases ELSE NULL END AS code$s"
    }
    val lutCols = (0 until PqSub).flatMap(s => castDots(s, c => s"qd${s}_$c"))
    val adc = (0 until PqSub).map { s =>
      val whens = (0 until PqCents).map(c => s"WHEN $c THEN qd${s}_$c").mkString(" ")
      s"(CASE k.code$s $whens END)"
    }.mkString(" + ")
    s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
       |cents AS (SELECT vec_id AS cent_id, CAST(e AS DOUBLE[]) AS ce FROM v
       |          WHERE vec_id < $IvfPqList),
       |asg AS (SELECT v.vec_id, c.cent_id,
       |          row_number() OVER (PARTITION BY v.vec_id
       |            ORDER BY list_cosine_similarity(CAST(v.e AS DOUBLE[]), c.ce) DESC,
       |                     c.cent_id ASC) AS crk
       |        FROM v, cents c),
       |clists AS (SELECT vec_id AS c_id, cent_id FROM asg WHERE crk = 1),
       |kd AS (SELECT vec_id, ${dotCols.mkString(",\n        ")} FROM v),
       |kb AS (SELECT *, ${bests.mkString(",\n        ")} FROM kd),
       |k AS (SELECT vec_id, ${codes.mkString(",\n       ")} FROM kb),
       |probes AS (SELECT vec_id AS q_id, cent_id FROM asg
       |           WHERE vec_id < 10 AND crk <= $IvfPqProbe),
       |luts AS (SELECT vec_id AS q_id, ${lutCols.mkString(",\n        ")}
       |         FROM v WHERE vec_id < 10),
       |s AS (SELECT p.q_id, cl.c_id, $adc AS approx
       |      FROM probes p JOIN clists cl USING (cent_id)
       |        JOIN k ON cl.c_id = k.vec_id
       |        JOIN luts q ON p.q_id = q.q_id
       |      WHERE cl.c_id <> p.q_id),
       |r AS (SELECT q_id, c_id, approx,
       |        row_number() OVER (PARTITION BY q_id
       |          ORDER BY approx DESC, c_id ASC) AS rk
       |      FROM s)
       |SELECT q_id, rk, c_id, round(approx, 4) AS approx
       |FROM r WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin
  }

  /** DuckDB oracle SQL per query (same parquet tables, same column names,
    * same deterministic ORDER BY). Omitted for sketch/hash-dependent ops. */
  def oracleSql: Map[String, String] = Map(
    "emb_pq_codes" -> pqOracle,
    "ann_ivf_pq" -> ivfPqOracle,

    // sub-document exact dedup: tile fingerprints + first-occurrence
    // keeper; ratios use the half-up floor idiom (small-integer fractions
    // land exactly on round()'s divergent half-way boundary)
    "dedup_chunks" ->
      """WITH d AS (SELECT doc_id, text,
        |                  greatest(CAST(ceil(CAST(n_chars AS DOUBLE) / 200) AS BIGINT), 1) AS nt
        |           FROM documents),
        |     t AS (SELECT doc_id, text, unnest(range(0, nt)) AS idx FROM d),
        |     f AS (SELECT doc_id, idx,
        |                  md5(substring(text, CAST(idx * 200 + 1 AS INT), 200)) AS fp
        |           FROM t),
        |     k AS (SELECT doc_id, idx,
        |                  min(doc_id * 1048576 + idx) OVER (PARTITION BY fp) AS keeper
        |           FROM f)
        |SELECT doc_id, count(*) AS n_tiles,
        |       CAST(sum(CASE WHEN doc_id * 1048576 + idx <> keeper THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_tiles,
        |       floor(CAST(sum(CASE WHEN doc_id * 1048576 + idx <> keeper THEN 1 ELSE 0 END) AS DOUBLE)
        |             / count(*) * 10000 + 0.5) / 10000 AS dup_ratio
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // SCD2 build: change points by lag, intervals closed by lead — both
    // windows share the (custkey, date, orderkey) order. Output ORDER BY
    // ends on o_orderkey: (custkey, valid_from, priority) alone is not a
    // total order when a same-date priority repeats (A,X,A), and the
    // driver hashes rows in emitted order
    "scd2_build" ->
      """WITH seq AS (
        |  SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
        |         lag(o_orderpriority) OVER (PARTITION BY o_custkey
        |           ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM orders),
        |chg AS (SELECT * FROM seq WHERE prev IS NULL OR prev <> o_orderpriority)
        |SELECT custkey, priority, valid_from, valid_to, is_current FROM (
        |  SELECT o_custkey AS custkey, o_orderpriority AS priority,
        |         o_orderdate AS valid_from, o_orderkey,
        |         lead(o_orderdate) OVER (PARTITION BY o_custkey
        |           ORDER BY o_orderdate, o_orderkey) AS valid_to,
        |         lead(o_orderdate) OVER (PARTITION BY o_custkey
        |           ORDER BY o_orderdate, o_orderkey) IS NULL AS is_current
        |  FROM chg)
        |ORDER BY custkey, valid_from, o_orderkey""".stripMargin,

    "text_boilerplate" ->
      """WITH toks AS (SELECT doc_id,
        |                     list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
        |              FROM documents),
        |     sh AS (SELECT doc_id,
        |                   list_distinct(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
        |                                                i -> array_to_string(t[i:i+2], ' '))) AS shingles
        |            FROM toks),
        |     post AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
        |     dfs AS (SELECT shingle, count(*) AS df FROM post GROUP BY 1),
        |     top AS (SELECT shingle FROM dfs ORDER BY df DESC, shingle ASC LIMIT 100),
        |     per AS (SELECT p.doc_id, count(*) AS n_shingles,
        |                    CAST(sum(CASE WHEN t.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler
        |             FROM post p LEFT JOIN top t ON p.shingle = t.shingle
        |             GROUP BY 1)
        |SELECT doc_id, n_shingles, n_boiler,
        |       CAST(n_boiler AS DOUBLE) / n_shingles AS boiler_ratio,
        |       (CAST(n_boiler AS DOUBLE) / n_shingles) <= 0.5 AS keep
        |FROM per ORDER BY doc_id""".stripMargin,

    "text_tfidf" ->
      """WITH t2 AS (SELECT doc_id, lang, token FROM (
        |              SELECT doc_id, lang,
        |                     unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
        |              FROM documents) x WHERE token <> ''),
        |     dfs AS (SELECT token, count(DISTINCT doc_id) AS df FROM t2 GROUP BY 1),
        |     tf AS (SELECT lang, token, count(*) AS tf FROM t2 GROUP BY 1, 2),
        |     n AS (SELECT count(*) AS n_docs FROM documents),
        |     sc AS (SELECT lang, tf.token AS token, tf.tf AS tf, dfs.df AS df,
        |                   round(tf.tf * (ln(CAST(n_docs + 1 AS DOUBLE) / (dfs.df + 1)) + 1), 4) AS tfidf
        |            FROM tf JOIN dfs ON tf.token = dfs.token CROSS JOIN n),
        |     r AS (SELECT *, row_number() OVER (PARTITION BY lang
        |                      ORDER BY tfidf DESC, token ASC) AS rk FROM sc)
        |SELECT lang, token, tf, df, tfidf, rk FROM r WHERE rk <= 10 ORDER BY lang, rk""".stripMargin,

    "text_collocations" ->
      """WITH toks AS (SELECT doc_id,
        |                     list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> x <> '') AS t
        |              FROM documents),
        |     u AS (SELECT token, count(*) AS n FROM (
        |             SELECT unnest(t) AS token FROM toks) x GROUP BY 1),
        |     b AS (SELECT (pr).a AS tok_a, (pr).b AS tok_b FROM (
        |             SELECT unnest(list_transform(range(1, len(t)),
        |                                          i -> {'a': t[i], 'b': t[i+1]})) AS pr
        |             FROM toks) x),
        |     bc AS (SELECT tok_a, tok_b, count(*) AS n_ab FROM b GROUP BY 1, 2),
        |     tot AS (SELECT CAST(sum(n) AS BIGINT) AS tt FROM u),
        |     btot AS (SELECT CAST(sum(n_ab) AS BIGINT) AS bt FROM bc)
        |SELECT tok_a || ' ' || tok_b AS bigram, n_ab,
        |       round(ln(CAST(n_ab AS DOUBLE) * tt * tt /
        |                (CAST(bt AS DOUBLE) * ua.n * ub.n)), 4) AS pmi
        |FROM bc JOIN u ua ON bc.tok_a = ua.token
        |        JOIN u ub ON bc.tok_b = ub.token
        |        CROSS JOIN tot CROSS JOIN btot
        |WHERE n_ab >= 10
        |ORDER BY pmi DESC, bigram ASC LIMIT 25""".stripMargin,

    "graph_components" ->
      """WITH RECURSIVE
        |     li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |            WHERE l_quantity >= 25),
        |     prs AS (SELECT DISTINCT a.pk AS pa, b.pk AS pb, a.ok AS ok
        |             FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
        |     edges AS (SELECT pa, pb FROM (
        |                 SELECT pa, pb, count(*) AS n_orders FROM prs GROUP BY 1, 2) x
        |               WHERE n_orders >= 2),
        |     und AS (SELECT pa AS src, pb AS dst FROM edges
        |             UNION ALL SELECT pb AS src, pa AS dst FROM edges),
        |     reach(src, dst) AS (
        |       SELECT src, dst FROM und
        |       UNION
        |       SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src),
        |     labels AS (SELECT src AS id, least(src, min(dst)) AS label
        |                FROM reach GROUP BY src)
        |SELECT label AS component, count(*) AS n_nodes,
        |       array_to_string(list_sort(list(id)), ',') AS members
        |FROM labels GROUP BY 1 ORDER BY component""".stripMargin,

    "pipeline_keep_best" ->
      """WITH RECURSIVE
        |     toks AS (SELECT doc_id,
        |                     list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
        |              FROM documents),
        |     sh AS (SELECT doc_id,
        |                   list_distinct(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
        |                                                i -> array_to_string(t[i:i+2], ' '))) AS shingles
        |            FROM toks),
        |     post AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
        |     kept AS (SELECT shingle FROM post GROUP BY 1 HAVING count(*) <= 100),
        |     kp AS (SELECT p.doc_id, p.shingle FROM post p JOIN kept k ON p.shingle = k.shingle),
        |     sizes AS (SELECT doc_id, count(*) AS sz FROM kp GROUP BY 1),
        |     pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        |               FROM kp a JOIN kp b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |               GROUP BY 1, 2),
        |     prs AS (SELECT doc_a, doc_b FROM (
        |               SELECT doc_a, doc_b,
        |                      round(common / CAST(sa.sz + sb.sz - common AS DOUBLE), 4) AS jaccard
        |               FROM pairs JOIN sizes sa ON doc_a = sa.doc_id
        |                          JOIN sizes sb ON doc_b = sb.doc_id) q
        |             WHERE jaccard >= 0.5),
        |     und AS (SELECT doc_a AS src, doc_b AS dst FROM prs
        |             UNION ALL SELECT doc_b AS src, doc_a AS dst FROM prs),
        |     reach(src, dst) AS (
        |       SELECT src, dst FROM und
        |       UNION
        |       SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src),
        |     labels AS (SELECT src AS id, least(src, min(dst)) AS label
        |                FROM reach GROUP BY src),
        |     best AS (SELECT l.label, d.doc_id, d.n_chars,
        |                     row_number() OVER (PARTITION BY l.label
        |                       ORDER BY d.n_chars DESC, d.doc_id ASC) AS rk
        |              FROM labels l JOIN documents d ON l.id = d.doc_id),
        |     agg AS (SELECT label, count(*) AS cluster_size,
        |                    CAST(sum(id) AS BIGINT) AS id_sum FROM labels GROUP BY 1)
        |SELECT a.label AS cluster_id, a.cluster_size, b.doc_id AS keep_doc,
        |       b.n_chars AS keep_chars, a.id_sum - b.doc_id AS dropped_id_sum
        |FROM agg a JOIN best b ON a.label = b.label AND b.rk = 1
        |ORDER BY cluster_id""".stripMargin,

    "ev_attribution" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |                  CAST(floor(epoch(ts)) AS BIGINT) AS es, value FROM events),
        |     p AS (SELECT pu.event_id AS pid, pu.es, pu.value,
        |                  t.event_type AS ttype, t.es AS tes,
        |                  row_number() OVER (PARTITION BY pu.event_id
        |                                     ORDER BY t.es DESC, t.event_id DESC) AS rn
        |           FROM (SELECT * FROM e WHERE event_type = 'purchase') pu
        |           LEFT JOIN (SELECT * FROM e WHERE event_type IN ('click', 'view')) t
        |             ON t.user_id = pu.user_id AND t.es <= pu.es)
        |SELECT CASE WHEN tes IS NOT NULL AND es - tes <= 604800 THEN ttype
        |            ELSE 'none' END AS channel,
        |       count(*) AS conversions, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
        |FROM p WHERE rn = 1 GROUP BY 1 ORDER BY channel""".stripMargin,

    "join_asof_nearest" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |                  CAST(floor(epoch(ts)) AS BIGINT) AS es, value FROM events),
        |     prev AS (SELECT c.event_id AS cid, c.user_id, c.es AS click_es,
        |                     v.event_id AS vid, v.value AS vval, v.es AS ves,
        |                     row_number() OVER (PARTITION BY c.event_id
        |                                        ORDER BY v.es DESC, v.event_id DESC) AS rn
        |              FROM (SELECT * FROM e WHERE event_type = 'click') c
        |              LEFT JOIN (SELECT * FROM e WHERE event_type = 'view') v
        |                ON v.user_id = c.user_id AND v.es <= c.es),
        |     nxt AS (SELECT c.event_id AS cid,
        |                    v.event_id AS vid, v.value AS vval, v.es AS ves,
        |                    row_number() OVER (PARTITION BY c.event_id
        |                                       ORDER BY v.es ASC, v.event_id ASC) AS rn
        |             FROM (SELECT * FROM e WHERE event_type = 'click') c
        |             LEFT JOIN (SELECT * FROM e WHERE event_type = 'view') v
        |               ON v.user_id = c.user_id AND v.es > c.es)
        |SELECT p.user_id, p.click_es,
        |       CASE WHEN n.vid IS NULL THEN p.vid
        |            WHEN p.vid IS NULL THEN n.vid
        |            WHEN p.click_es - p.ves <= n.ves - p.click_es THEN p.vid
        |            ELSE n.vid END AS view_id,
        |       round(CASE WHEN n.vid IS NULL THEN p.vval
        |                  WHEN p.vid IS NULL THEN n.vval
        |                  WHEN p.click_es - p.ves <= n.ves - p.click_es THEN p.vval
        |                  ELSE n.vval END, 2) AS view_value
        |FROM (SELECT * FROM prev WHERE rn = 1) p
        |JOIN (SELECT * FROM nxt WHERE rn = 1) n ON p.cid = n.cid
        |ORDER BY user_id, click_es""".stripMargin,

    "p1_select_alias" ->
      """SELECT c_custkey AS custkey, c_name AS name, c_acctbal AS acctbal
        |FROM customer ORDER BY custkey""".stripMargin,

    "p2_filter" ->
      """SELECT c_custkey AS custkey, c_mktsegment AS segment, c_acctbal AS acctbal
        |FROM customer WHERE c_acctbal > 5000.0 ORDER BY custkey""".stripMargin,

    "p2_filter_compound" ->
      """SELECT o_orderkey AS orderkey, o_custkey AS custkey,
        |       o_totalprice AS totalprice, o_orderpriority AS priority
        |FROM orders
        |WHERE o_orderstatus = 'O' AND
        |      (o_totalprice BETWEEN 1000.0 AND 50000.0 OR
        |       o_orderpriority IN ('1-URGENT', '2-HIGH'))
        |ORDER BY orderkey""".stripMargin,

    "p3_topk" ->
      """SELECT o_orderkey AS orderkey, o_totalprice AS totalprice
        |FROM orders ORDER BY totalprice DESC, orderkey ASC LIMIT 100""".stripMargin,

    "j1_join_inner" ->
      """SELECT o.o_orderkey AS orderkey, o.o_totalprice AS totalprice,
        |       c.c_name AS cust_name, c.c_mktsegment AS segment
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY orderkey""".stripMargin,

    "e4_arith_project" ->
      """SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
        |       l_extendedprice * (1.0 - l_discount) AS revenue,
        |       l_quantity + l_tax AS qty_plus_tax,
        |       l_extendedprice / l_quantity AS unit_price
        |FROM lineitem ORDER BY orderkey, linenumber""".stripMargin,

    "join_left_outer" ->
      """SELECT c_custkey AS custkey, coalesce(n, 0) AS n_urgent
        |FROM customer LEFT JOIN (
        |  SELECT o_custkey, count(*) AS n FROM orders
        |  WHERE o_orderpriority = '1-URGENT' GROUP BY 1) o
        |ON c_custkey = o.o_custkey ORDER BY custkey""".stripMargin,

    "join_full_outer" ->
      """WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer
        |           GROUP BY 1 HAVING (c_nationkey % 3) <> 0),
        |     s AS (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier
        |           GROUP BY 1 HAVING (s_nationkey % 3) <> 1)
        |SELECT coalesce(c.nk, s.nk) AS nationkey,
        |       coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
        |FROM c FULL OUTER JOIN s ON c.nk = s.nk ORDER BY nationkey""".stripMargin,

    "join_asof" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |                  CAST(floor(epoch(ts)) AS BIGINT) AS es, value FROM events),
        |     pairs AS (
        |       SELECT c.user_id, c.event_id AS cid, c.es AS click_es,
        |              v.event_id AS view_id, v.value AS view_value,
        |              row_number() OVER (PARTITION BY c.event_id
        |                                 ORDER BY v.es DESC, v.event_id DESC) AS rn
        |       FROM (SELECT * FROM e WHERE event_type = 'click') c
        |       LEFT JOIN (SELECT * FROM e WHERE event_type = 'view') v
        |         ON v.user_id = c.user_id AND v.es <= c.es)
        |SELECT user_id, click_es, view_id, round(view_value, 2) AS view_value
        |FROM pairs WHERE rn = 1 ORDER BY user_id, click_es""".stripMargin,

    "join_asof_fwd" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |                  CAST(floor(epoch(ts)) AS BIGINT) AS es, value FROM events),
        |     pairs AS (
        |       SELECT c.user_id, c.event_id AS cid, c.es AS click_es,
        |              v.event_id AS next_view_id, v.value AS view_value,
        |              row_number() OVER (PARTITION BY c.event_id
        |                                 ORDER BY v.es ASC, v.event_id ASC) AS rn
        |       FROM (SELECT * FROM e WHERE event_type = 'click') c
        |       LEFT JOIN (SELECT * FROM e WHERE event_type = 'view') v
        |         ON v.user_id = c.user_id AND v.es >= c.es)
        |SELECT user_id, click_es, next_view_id, round(view_value, 2) AS next_view_value
        |FROM pairs WHERE rn = 1 ORDER BY user_id, click_es""".stripMargin,

    // tolerance semantics: the matched view must be within 300s of the
    // click; staler matches are nulled (right rows kept — LEFT join)
    "join_asof_tol" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |                  CAST(floor(epoch(ts)) AS BIGINT) AS es, value FROM events),
        |     pairs AS (
        |       SELECT c.user_id, c.event_id AS cid, c.es AS click_es,
        |              v.event_id AS vid, v.value AS vval, v.es AS ves,
        |              row_number() OVER (PARTITION BY c.event_id
        |                                 ORDER BY v.es DESC, v.event_id DESC) AS rn
        |       FROM (SELECT * FROM e WHERE event_type = 'click') c
        |       LEFT JOIN (SELECT * FROM e WHERE event_type = 'view') v
        |         ON v.user_id = c.user_id AND v.es <= c.es)
        |SELECT user_id, click_es,
        |       CASE WHEN click_es - ves <= 300 THEN vid END AS view_id,
        |       CASE WHEN click_es - ves <= 300 THEN round(vval, 2) END AS view_value
        |FROM pairs WHERE rn = 1 ORDER BY user_id, click_es""".stripMargin,

    "join_range" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |                  CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events)
        |SELECT p.user_id AS user_id, p.event_id AS purchase_id,
        |       c.event_id AS click_id, p.es - c.es AS lag_sec
        |FROM (SELECT * FROM e WHERE event_type = 'purchase') p
        |JOIN (SELECT * FROM e WHERE event_type = 'click') c
        |  ON c.user_id = p.user_id AND c.es >= p.es - 600 AND c.es <= p.es
        |ORDER BY p.user_id, purchase_id, click_id""".stripMargin,

    // money sums in integer-exact units (cents / 1e-4 / 1e-6), half-up
    // integer render — see Aggregates.centsCol; sum_qty stays double
    // (quantity is integer-valued, its fp sum is exact)
    "q1_pricing_summary" ->
      """SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
        |       CAST((sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |                 * (100 - CAST(round(l_discount * 100) AS BIGINT))) + 50) // 100
        |            AS DOUBLE) / 100.0 AS sum_disc_price,
        |       CAST((sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |                 * (100 - CAST(round(l_discount * 100) AS BIGINT))
        |                 * (100 + CAST(round(l_tax * 100) AS BIGINT))) + 5000) // 10000
        |            AS DOUBLE) / 100.0 AS sum_charge,
        |       round(avg(l_quantity), 4) AS avg_qty,
        |       round(avg(l_extendedprice), 4) AS avg_price,
        |       round(avg(l_discount), 4) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q3_top_orders" ->
      """SELECT o.o_orderkey AS orderkey,
        |       CAST((sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |                 * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) + 50) // 100
        |            AS DOUBLE) / 100.0 AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |GROUP BY 1 ORDER BY revenue DESC, orderkey ASC LIMIT 10""".stripMargin,

    "q5_nation_revenue" ->
      """SELECT n.n_name AS nation,
        |       CAST((sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |                 * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) + 50) // 100
        |            AS DOUBLE) / 100.0 AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_nationkey = s.s_nationkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name IN ('ASIA', 'AMERICA')
        |GROUP BY 1 ORDER BY revenue DESC, nation""".stripMargin,

    "agg_distinct" ->
      """SELECT o_orderpriority AS priority,
        |       count(DISTINCT o_custkey) AS n_customers,
        |       count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    // revenue in integer-exact 1e-4 units with half-up 2dp render (the
    // round(sum(double)) form straddled a cent on the 10x replica data);
    // avg_retail stays a single identical-integer-quotient + round (the
    // quotient is replica-invariant, so no magnitude-driven straddle)
    "q14_promo" ->
      """SELECT p.p_type AS ptype, count(*) AS n_items,
        |       CAST((sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |                  * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) + 50) // 100
        |            AS DOUBLE) / 100.0 AS revenue,
        |       round(avg(p.p_retailprice), 4) AS avg_retail
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |GROUP BY 1 ORDER BY ptype""".stripMargin,

    "q19_disjunctive" ->
      """SELECT CAST((sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |                 * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) + 50) // 100
        |            AS DOUBLE) / 100.0 AS revenue,
        |       count(*) AS n_items
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
        |       AND l.l_quantity BETWEEN 1 AND 11)
        |   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
        |       AND l.l_quantity BETWEEN 10 AND 20)
        |   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
        |       AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q4_priority" ->
      """SELECT o_orderpriority AS priority, count(*) AS n_orders
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o.o_orderkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q10_returns" ->
      """SELECT c.c_custkey AS custkey, c.c_name AS name, n.n_name AS nation,
        |       CAST((sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |                 * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) + 50) // 100
        |            AS DOUBLE) / 100.0 AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE l.l_returnflag = 'R'
        |GROUP BY 1, 2, 3 ORDER BY revenue DESC, custkey ASC LIMIT 20""".stripMargin,

    "q7_nations" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       CAST(year(l.l_shipdate) AS INT) AS yr,
        |       CAST((sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |                 * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) + 50) // 100
        |            AS DOUBLE) / 100.0 AS revenue,
        |       count(*) AS n_items
        |FROM lineitem l
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q13_custdist" ->
      """WITH pc AS (SELECT c_custkey, count(o_orderkey) AS c_count
        |            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |            GROUP BY 1)
        |SELECT c_count, count(*) AS custdist FROM pc GROUP BY 1
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q18_large_orders" ->
      """WITH big AS (SELECT l_orderkey, sum(l_quantity) AS qty FROM lineitem
        |             GROUP BY 1 HAVING sum(l_quantity) > 250.0)
        |SELECT c.c_name AS name, c.c_custkey AS custkey,
        |       o.o_orderkey AS orderkey, o.o_totalprice AS totalprice,
        |       round(big.qty, 2) AS sum_qty
        |FROM orders o
        |JOIN big ON o.o_orderkey = big.l_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY totalprice DESC, orderkey ASC LIMIT 100""".stripMargin,

    "q22_idle_rich" ->
      """SELECT c_mktsegment AS segment, count(*) AS n_cust,
        |       round(sum(c_acctbal), 2) AS total_bal
        |FROM customer c
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey
        |                  AND o_orderpriority = '1-URGENT')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "agg_percentiles" ->
      """SELECT o_orderstatus AS status,
        |       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |       round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        |       round(quantile_cont(o_totalprice, 0.99), 4) AS p99,
        |       round(min(o_totalprice), 2) AS lo, round(max(o_totalprice), 2) AS hi
        |FROM orders GROUP BY 1 ORDER BY status""".stripMargin,

    // the sketch queries emit exact companions + in-plan estimate checks;
    // the oracle pins the exact columns and expects every check TRUE
    "agg_approx_distinct" ->
      """SELECT o_orderpriority AS priority,
        |       count(DISTINCT o_custkey) AS n_customers,
        |       TRUE AS est_ok
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "agg_hll_merge" ->
      """SELECT o_orderstatus AS status,
        |       count(DISTINCT o_custkey) AS n_customers,
        |       TRUE AS est_ok
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "agg_percentiles_approx" ->
      """SELECT o_orderstatus AS status,
        |       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |       round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        |       round(quantile_cont(o_totalprice, 0.99), 4) AS p99,
        |       count(*) AS n,
        |       TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
        |FROM orders GROUP BY 1 ORDER BY status""".stripMargin,

    "agg_stats" ->
      """SELECT l_returnflag AS returnflag,
        |       round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
        |       round(covar_pop(l_quantity, l_extendedprice), 2) AS covar_qty_price,
        |       round(stddev_pop(l_extendedprice), 4) AS std_price,
        |       round(var_pop(l_discount), 6) AS var_disc,
        |       round(skewness(l_extendedprice) * (count(*) - 2.0) /
        |             sqrt(count(*) * (count(*) - 1.0)), 4) AS skew_price
        |FROM lineitem GROUP BY 1 ORDER BY returnflag""".stripMargin,

    "sql_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS status,
        |       coalesce(o_orderpriority, '(all)') AS priority,
        |       count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin,

    "text_top_tokens" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
        |  FROM documents) t
        |WHERE token <> ''
        |GROUP BY token ORDER BY n DESC, token ASC LIMIT 50""".stripMargin,

    "text_top_tokens_lang" ->
      """WITH c AS (SELECT lang, token, count(*) AS n FROM (
        |             SELECT lang, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
        |             FROM documents) t
        |           WHERE token <> '' GROUP BY 1, 2),
        |     r AS (SELECT *, row_number() OVER (PARTITION BY lang
        |                      ORDER BY n DESC, token ASC) AS rk FROM c)
        |SELECT lang, token, n, rk FROM r WHERE rk <= 10 ORDER BY lang, rk""".stripMargin,

    "agg_monthly" ->
      """SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
        |       count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
        |FROM orders GROUP BY 1 ORDER BY month""".stripMargin,

    "text_string_funcs" ->
      """SELECT c_custkey AS custkey,
        |       upper(c_mktsegment) AS seg_upper,
        |       substring(c_name, 1, 8) AS name_prefix,
        |       concat_ws('|', c_mktsegment, c_name) AS joined,
        |       coalesce(regexp_extract(c_name, '(\d+)', 1), '') AS name_digits,
        |       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key,
        |       reverse(c_mktsegment) AS seg_rev,
        |       length(c_name) AS name_len
        |FROM customer ORDER BY custkey""".stripMargin,

    "ev_json_props" ->
      """SELECT event_type AS etype, count(*) AS n,
        |       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
        |       max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY 1 ORDER BY etype""".stripMargin,

    "ev_json_variant" ->
      """SELECT event_type AS etype, count(*) AS n,
        |       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
        |       max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY 1 ORDER BY etype""".stripMargin,

    "agg_rollup" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS status,
        |       coalesce(o_orderpriority, '(all)') AS priority,
        |       count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,

    "agg_cube" ->
      """SELECT coalesce(l_returnflag, '(all)') AS returnflag,
        |       coalesce(l_linestatus, '(all)') AS linestatus,
        |       count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,

    "join_semi" ->
      """SELECT c_custkey AS custkey, c_name AS name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY custkey""".stripMargin,

    "join_anti" ->
      """SELECT c_custkey AS custkey, c_acctbal AS acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |ORDER BY custkey""".stripMargin,

    "set_ops" ->
      """WITH rich AS (SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 7500),
        |     urgent AS (SELECT DISTINCT o_custkey AS custkey FROM orders
        |                WHERE o_orderpriority = '1-URGENT')
        |SELECT custkey, 'union' AS op FROM (SELECT custkey FROM rich UNION SELECT custkey FROM urgent)
        |UNION ALL
        |SELECT custkey, 'intersect' AS op FROM (SELECT custkey FROM rich INTERSECT SELECT custkey FROM urgent)
        |UNION ALL
        |SELECT custkey, 'except' AS op FROM (SELECT custkey FROM rich EXCEPT SELECT custkey FROM urgent)
        |ORDER BY op, custkey""".stripMargin,

    "join_cross_small" ->
      """SELECT r.r_name AS region, n.n_name AS nation
        |FROM region r CROSS JOIN nation n ORDER BY region, nation""".stripMargin,

    "skew_salted_join" ->
      """SELECT c_mktsegment AS segment, count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY segment""".stripMargin,

    "skew_two_stage_agg" ->
      """SELECT l_returnflag AS returnflag, round(sum(l_quantity), 2) AS sum_qty,
        |       count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY returnflag""".stripMargin,

    "sql_tpch_q6" ->
      """SELECT CAST((sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |                 * CAST(round(l_discount * 100) AS BIGINT)) + 50) // 100
        |            AS DOUBLE) / 100.0 AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "sql_subquery" ->
      """SELECT o_custkey AS custkey, o_orderkey AS orderkey,
        |       o_totalprice AS totalprice
        |FROM orders o
        |WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice) FROM orders o2
        |                          WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY custkey, orderkey""".stripMargin,

    // unit price deliberately UNROUNDED: identical IEEE division on both
    // engines; round() would reopen the half-up-vs-binary tie hazard
    "q2_min_cost_supp" ->
      """SELECT DISTINCT p.p_partkey AS partkey, s.s_name AS sname,
        |       n.n_name AS nation,
        |       l.l_extendedprice / l.l_quantity AS min_unit_price
        |FROM part p, lineitem l, supplier s, nation n
        |WHERE p.p_partkey = l.l_partkey AND l.l_suppkey = s.s_suppkey
        |  AND s.s_nationkey = n.n_nationkey
        |  AND p.p_size <= 5 AND s.s_acctbal > 0
        |  AND l.l_extendedprice / l.l_quantity = (
        |      SELECT min(l2.l_extendedprice / l2.l_quantity)
        |      FROM lineitem l2, supplier s2
        |      WHERE l2.l_partkey = p.p_partkey AND l2.l_suppkey = s2.s_suppkey
        |        AND s2.s_acctbal > 0)
        |ORDER BY partkey, sname""".stripMargin,

    // round() on sums of continuous doubles is tie-safe (memory: the
    // hazard is integer/decimal quotients, not continuous sums)
    // integer-exact money units, filter by integer cross-multiplication,
    // half-up 2dp render via (u+50)//100 — matches the Spark SQL's DIV
    "q11_part_value" ->
      """WITH pv AS (SELECT l_partkey AS partkey,
        |                   sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |                       * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS units
        |            FROM lineitem GROUP BY 1)
        |SELECT partkey,
        |       CAST((units + 50) // 100 AS DOUBLE) / 100.0 AS part_value
        |FROM pv
        |WHERE CAST(units AS HUGEINT) * (SELECT count(*) FROM pv) * 2
        |      > CAST((SELECT sum(units) FROM pv) AS HUGEINT) * 3
        |ORDER BY part_value DESC, partkey""".stripMargin,

    "q16_supplier_cnt" ->
      """SELECT p.p_brand AS brand, p.p_type AS ptype,
        |       count(DISTINCT l.l_suppkey) AS supplier_cnt
        |FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
        |WHERE p.p_size IN (1, 9, 14, 19, 23)
        |  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                          WHERE s_acctbal < 0)
        |GROUP BY 1, 2
        |ORDER BY supplier_cnt DESC, brand, ptype
        |LIMIT 25""".stripMargin,

    // exact threshold: integer-valued quantities sum exactly in FP, so
    // 0.2*avg is bit-identical cross-engine; sum of continuous prices /7
    // rounded 2dp is tie-safe
    "q17_small_qty" ->
      """SELECT CAST((2 * sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) + 7) // 14
        |            AS DOUBLE) / 100.0 AS avg_yearly
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_brand = 'Brand#1'
        |  AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
        |                      FROM lineitem l2
        |                      WHERE l2.l_partkey = l.l_partkey)""".stripMargin,

    "q20_bulk_shippers" ->
      """SELECT s_name AS sname, s_acctbal AS acctbal
        |FROM supplier
        |WHERE s_suppkey IN (
        |    SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
        |    WHERE p_name LIKE 'small%'
        |    GROUP BY l_suppkey HAVING sum(l_quantity) > 500)
        |ORDER BY sname""".stripMargin,

    "q8_market_share" ->
      """WITH vol AS (
        |  SELECT year(o.o_orderdate) AS yr,
        |         CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |           * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS v,
        |         ns.n_name AS supp_nation
        |  FROM lineitem l
        |  JOIN orders o   ON l.l_orderkey = o.o_orderkey
        |  JOIN part p     ON l.l_partkey = p.p_partkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
        |  JOIN region rc  ON nc.n_regionkey = rc.r_regionkey
        |  WHERE rc.r_name = 'AMERICA' AND p.p_type = 'LARGE')
        |SELECT yr,
        |       round(CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN v ELSE 0 END) AS DOUBLE)
        |             / CAST(sum(v) AS DOUBLE), 6) AS mkt_share
        |FROM vol GROUP BY yr ORDER BY yr""".stripMargin,

    "agg_regression" ->
      """SELECT l_returnflag AS returnflag,
        |       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |       round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
        |       round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
        |       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
        |FROM lineitem GROUP BY 1 ORDER BY returnflag""".stripMargin,

    "func_math" ->
      """SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
        |       round(sqrt(l_extendedprice), 6) AS sqrt_price,
        |       round(ln(l_extendedprice), 6) AS ln_price,
        |       round(exp(l_discount), 6) AS exp_disc,
        |       l_orderkey % 7 AS key_mod,
        |       abs(l_discount - 0.05) AS disc_dev,
        |       CAST(sign(l_tax - 0.04) AS INT) AS tax_sign
        |FROM lineitem WHERE l_linenumber = 1
        |ORDER BY orderkey, linenumber""".stripMargin,

    "func_bitwise" ->
      """SELECT o_orderkey AS orderkey,
        |       o_orderkey & 255 AS key_and,
        |       o_orderkey | 4096 AS key_or,
        |       xor(o_orderkey, o_custkey) AS key_xor,
        |       o_custkey << 3 AS cust_shl,
        |       o_orderkey >> 2 AS key_shr,
        |       CAST(bit_count(o_orderkey) AS INT) AS key_bits
        |FROM orders ORDER BY orderkey""".stripMargin,

    "func_array_ops" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |       len(toks) AS n_tokens,
        |       len(list_distinct(toks)) AS n_distinct,
        |       toks[1] AS first_tok,
        |       toks[-1] AS last_tok,
        |       array_to_string(list_slice(list_sort(list_distinct(toks)), 1, 5), '_')
        |         AS first5_sorted
        |FROM t ORDER BY doc_id""".stripMargin,

    "func_levenshtein" ->
      """SELECT p_partkey AS partkey, p_name AS pname,
        |       levenshtein(p_name, 'small bolt') AS dist
        |FROM part WHERE levenshtein(p_name, 'small bolt') <= 4
        |ORDER BY partkey""".stripMargin,

    // argmax ordered by the TIE-FREE packed (cents·2^33 + key) int64, so
    // tied prices resolve to the key identically in both engines
    "agg_conditional" ->
      """SELECT o_orderstatus AS status,
        |       CAST(count_if(o_totalprice > 100000.0) AS BIGINT) AS n_big,
        |       bool_and(o_totalprice > 0.0) AS all_positive,
        |       bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
        |       max_by(o_orderkey,
        |              CAST(round(o_totalprice * 100) AS BIGINT) * 8589934592 + o_orderkey)
        |         AS priciest_key,
        |       min_by(o_orderkey,
        |              CAST(round(o_totalprice * 100) AS BIGINT) * 8589934592 + o_orderkey)
        |         AS cheapest_key
        |FROM orders GROUP BY 1 ORDER BY status""".stripMargin,

    "text_perplexity" ->
      """WITH base AS (SELECT doc_id, lower(text) AS t FROM documents
        |              WHERE length(text) >= 3),
        |idx AS (SELECT doc_id, t, unnest(range(1, length(t)-1)) AS i FROM base),
        |tris AS (SELECT doc_id, substring(t, CAST(i AS INT), 3) AS tri FROM idx),
        |model AS (SELECT tri, count(*) AS c FROM tris GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS tc FROM model)
        |SELECT t.doc_id AS doc_id,
        |       round(avg(ln(CAST(m.c AS DOUBLE) / tot.tc)), 4) AS avg_logp,
        |       count(*) AS n_tri
        |FROM tris t JOIN model m USING (tri), tot
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // rendered-constants oracle (same trick as the LSH hyperplanes)
    "dedup_minhash_sql" -> graft.ops.Dedup.minhashSqlOracle,

    // the md5-based kernel sketches replay fully in DuckDB (rendered CW
    // constants + the md5_number_upper byte-swap idiom) — previously
    // rows-only under xxhash64
    "dedup_minhash" -> graft.ops.Dedup.minhashOracle,
    "dedup_minhash_reps" -> graft.ops.Dedup.minhashRepsOracle,
    "dedup_simhash" -> graft.ops.Dedup.simhashGroupsOracle,
    "dedup_simhash_near" -> graft.ops.Dedup.simhashNearOracle,
    "dedup_simhash_reps" -> graft.ops.Dedup.simhashRepsOracle,

    "text_entropy" ->
      """WITH tf AS (
        |  SELECT lang, unnest(string_split(lower(text), ' ')) AS tok
        |  FROM documents),
        |counts AS (SELECT lang, tok, count(*) AS n FROM tf GROUP BY 1, 2)
        |SELECT lang,
        |       CAST(sum(n) AS BIGINT) AS n_tokens,
        |       count(*) AS vocab,
        |       round(ln(CAST(sum(n) AS DOUBLE)) -
        |             sum(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE)))
        |               / CAST(sum(n) AS DOUBLE), 4) AS entropy
        |FROM counts GROUP BY 1 ORDER BY lang""".stripMargin,

    // BM25 with k1=1.2, b=0.75 over query terms (spark, shuffle, join);
    // ordered by ROUNDED score so the top-20 cut is last-ulp-safe
    "text_bm25" ->
      """WITH tf AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> ''))::DOUBLE AS dl,
        |    len(list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x = 'spark'))::DOUBLE AS tf0,
        |    len(list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x = 'shuffle'))::DOUBLE AS tf1,
        |    len(list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x = 'join'))::DOUBLE AS tf2
        |  FROM documents),
        |st AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl,
        |    sum(CASE WHEN tf0 > 0 THEN 1.0 ELSE 0.0 END) AS df0,
        |    sum(CASE WHEN tf1 > 0 THEN 1.0 ELSE 0.0 END) AS df1,
        |    sum(CASE WHEN tf2 > 0 THEN 1.0 ELSE 0.0 END) AS df2
        |  FROM tf)
        |SELECT doc_id, round(
        |    ln((n_docs - df0 + 0.5) / (df0 + 0.5) + 1.0) * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |  + ln((n_docs - df1 + 0.5) / (df1 + 0.5) + 1.0) * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |  + ln((n_docs - df2 + 0.5) / (df2 + 0.5) + 1.0) * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl)), 4) AS bm25
        |FROM tf, st
        |WHERE tf0 + tf1 + tf2 > 0
        |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin,

    // RRF fusion of the bm25 leg (same tf/st CTEs) and a cosine leg
    // (query vector = embedding of id 0); ranks over ROUNDED scores with
    // id tie-breaks on pre-limited top-100 lists, so every rank — and
    // therefore the fused sum — is engine-stable
    "text_hybrid_search" ->
      """WITH tf AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> ''))::DOUBLE AS dl,
        |    len(list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x = 'spark'))::DOUBLE AS tf0,
        |    len(list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x = 'shuffle'))::DOUBLE AS tf1,
        |    len(list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x = 'join'))::DOUBLE AS tf2
        |  FROM documents),
        |st AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl,
        |    sum(CASE WHEN tf0 > 0 THEN 1.0 ELSE 0.0 END) AS df0,
        |    sum(CASE WHEN tf1 > 0 THEN 1.0 ELSE 0.0 END) AS df1,
        |    sum(CASE WHEN tf2 > 0 THEN 1.0 ELSE 0.0 END) AS df2
        |  FROM tf),
        |bm AS (SELECT doc_id, round(
        |    ln((n_docs - df0 + 0.5) / (df0 + 0.5) + 1.0) * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |  + ln((n_docs - df1 + 0.5) / (df1 + 0.5) + 1.0) * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |  + ln((n_docs - df2 + 0.5) / (df2 + 0.5) + 1.0) * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl)), 4) AS bm25
        |  FROM tf, st WHERE tf0 + tf1 + tf2 > 0),
        |lex AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rk
        |        FROM (SELECT doc_id, bm25 FROM bm ORDER BY bm25 DESC, doc_id LIMIT 100)),
        |qv AS (SELECT CAST(embedding AS DOUBLE[]) AS q FROM embeddings WHERE vec_id = 0),
        |vs AS (SELECT vec_id AS doc_id,
        |              round(list_cosine_similarity(q, CAST(embedding AS DOUBLE[])), 4) AS cos
        |       FROM embeddings CROSS JOIN qv WHERE vec_id <> 0),
        |vec AS (SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id) AS vec_rk
        |        FROM (SELECT doc_id, cos FROM vs ORDER BY cos DESC, doc_id LIMIT 100)),
        |f AS (SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
        |             round(coalesce(1.0 / (60 + lex_rk), 0.0) +
        |                   coalesce(1.0 / (60 + vec_rk), 0.0), 6) AS rrf
        |      FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id)
        |SELECT doc_id, rrf FROM f ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,

    // PII plant -> match -> redact -> md5 fingerprint; regexes restricted
    // to the Java-regex ∩ RE2 dialect; 'g' flag = Spark's replace-all
    "text_pii_scrub" ->
      """WITH planted AS (SELECT doc_id,
        |    text || ' contact user' || doc_id || '@example.com or 555-' ||
        |    lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
        |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_emails,
        |  len(regexp_extract_all(text, '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b'))::BIGINT AS n_phones,
        |  md5(regexp_replace(regexp_replace(text,
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |      '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b', '[PHONE]', 'g')) AS clean_fp
        |FROM planted ORDER BY doc_id""".stripMargin,

    // fractions unrounded: int/int quotients are bit-identical cross-engine
    "text_repetition" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |b AS (SELECT doc_id, unnest(list_transform(range(2, len(toks) + 1),
        |    i -> toks[i - 1] || ' ' || toks[i])) AS bg FROM t WHERE len(toks) >= 2),
        |c AS (SELECT doc_id, bg, count(*) AS c FROM b GROUP BY 1, 2),
        |m AS (SELECT doc_id, max(c)::DOUBLE / sum(c)::DOUBLE AS top_frac FROM c GROUP BY 1)
        |SELECT t.doc_id,
        |  len(toks)::BIGINT AS n_tokens,
        |  1.0 - len(list_distinct(toks))::DOUBLE / greatest(len(toks), 1)::DOUBLE AS dup_word_frac,
        |  coalesce(m.top_frac, 0.0) AS top_bigram_frac,
        |  ((1.0 - len(list_distinct(toks))::DOUBLE / greatest(len(toks), 1)::DOUBLE) <= 0.95
        |    AND coalesce(m.top_frac, 0.0) <= 0.18) AS keep
        |FROM t LEFT JOIN m ON t.doc_id = m.doc_id
        |ORDER BY t.doc_id""".stripMargin,

    // int8 quantization: floor(x*scale + 0.5) on both engines (never
    // round(): banker's-vs-half-up); MSE sums in array order on both
    "emb_quantize" ->
      """WITH s AS (SELECT vec_id, embedding,
        |    list_aggregate(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'max') AS amax
        |  FROM embeddings),
        |s2 AS (SELECT vec_id, embedding,
        |    CASE WHEN amax > 0 THEN 127.0 / amax ELSE 1.0 END AS scale FROM s)
        |SELECT vec_id,
        |  len(embedding)::BIGINT AS n_dims,
        |  round(scale, 6) AS q_scale,
        |  round(list_aggregate(list_transform(embedding,
        |      x -> pow(CAST(x AS DOUBLE) - floor(CAST(x AS DOUBLE) * scale + 0.5) / scale, 2)), 'sum')
        |    / len(embedding), 10) AS mse,
        |  CAST(list_aggregate(list_transform(embedding,
        |      x -> abs(floor(CAST(x AS DOUBLE) * scale + 0.5))), 'max') AS BIGINT) AS q_max
        |FROM s2 ORDER BY vec_id""".stripMargin,

    "graph_pagerank" -> pagerankOracle,

    // neighbor-Jaccard link prediction: same capped inverted-index shape
    // as dedup_ngram_jaccard with node=document, neighbor=feature;
    // existing edges excluded; cut by rounded score + id tie-break
    "graph_nbr_jaccard" ->
      """WITH edges AS (
        |  SELECT DISTINCT l1.l_partkey AS src, l2.l_partkey AS dst
        |  FROM lineitem l1 JOIN lineitem l2
        |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey <> l2.l_partkey
        |  WHERE l1.l_quantity >= 25 AND l2.l_quantity >= 25),
        |adjd AS (SELECT dst AS w, count(*) AS d FROM edges GROUP BY 1),
        |kept AS (SELECT e.dst AS w, e.src AS node
        |         FROM edges e JOIN adjd a ON a.w = e.dst WHERE a.d <= 256),
        |sizes AS (SELECT node, count(*) AS sz FROM kept GROUP BY 1),
        |common AS (SELECT a.node AS u, b.node AS v, count(*) AS common
        |           FROM kept a JOIN kept b ON a.w = b.w AND a.node < b.node
        |           GROUP BY 1, 2),
        |cand AS (SELECT u, v, common FROM common c
        |         WHERE NOT EXISTS (SELECT 1 FROM edges e
        |                           WHERE e.src = c.u AND e.dst = c.v)),
        |j AS (SELECT u AS part_a, v AS part_b,
        |             round(common / CAST(su.sz + sv.sz - common AS DOUBLE), 4) AS nbr_jaccard
        |      FROM cand JOIN sizes su ON u = su.node
        |                JOIN sizes sv ON v = sv.node)
        |SELECT part_a, part_b, nbr_jaccard FROM j
        |ORDER BY nbr_jaccard DESC, part_a, part_b LIMIT 50""".stripMargin,

    // PSI drift: fixed 50k bands over order totals, baseline/current split
    // on the fixed date pivot, Laplace-smoothed shares (n+0.5 / N+4.5)
    "dq_drift" ->
      """WITH b AS (SELECT CAST(least(floor(o_totalprice / 50000.0), 8) AS BIGINT) AS bucket,
        |                  o_orderdate < TIMESTAMP '1995-06-17 00:00:00' AS is_base
        |           FROM orders),
        |c AS (SELECT bucket,
        |             count(*) FILTER (WHERE is_base) AS n_base,
        |             count(*) FILTER (WHERE NOT is_base) AS n_curr
        |      FROM b GROUP BY 1),
        |t AS (SELECT sum(n_base) AS tb, sum(n_curr) AS tc FROM c)
        |SELECT bucket, n_base, n_curr,
        |       round(((n_base + 0.5) / (tb + 4.5) - (n_curr + 0.5) / (tc + 4.5)) *
        |             ln(((n_base + 0.5) / (tb + 4.5)) / ((n_curr + 0.5) / (tc + 4.5))), 6) AS psi_term
        |FROM c CROSS JOIN t ORDER BY bucket""".stripMargin,

    // A-ES weighted sampling: discrete output (the continuous key never
    // leaves the plan); u is exact integer arithmetic scaled by 2^-32
    "pipeline_weighted_sample" ->
      """WITH s AS (SELECT doc_id, lang,
        |    (CAST((doc_id + 101) * 2654435761 % 4294967296 AS DOUBLE) + 0.5) / 4294967296.0 AS u,
        |    greatest(CAST(n_chars AS DOUBLE), 1.0) AS w
        |  FROM documents),
        |r AS (SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang ORDER BY pow(u, 1.0 / w) DESC, doc_id) AS rk
        |  FROM s)
        |SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk FROM r
        |WHERE rk <= 50 ORDER BY lang, rk""".stripMargin,

    "dq_report" ->
      """SELECT * FROM (
        |  SELECT 'orders.rowcount' AS "check", count(*)::BIGINT AS n FROM orders
        |  UNION ALL SELECT 'lineitem.rowcount', count(*)::BIGINT FROM lineitem
        |  UNION ALL SELECT 'orders.o_orderkey.dups',
        |    (count(*) - count(DISTINCT o_orderkey))::BIGINT FROM orders
        |  UNION ALL SELECT 'customer.c_custkey.dups',
        |    (count(*) - count(DISTINCT c_custkey))::BIGINT FROM customer
        |  UNION ALL SELECT 'part.p_partkey.dups',
        |    (count(*) - count(DISTINCT p_partkey))::BIGINT FROM part
        |  UNION ALL SELECT 'orders.o_custkey.nulls',
        |    count(CASE WHEN o_custkey IS NULL THEN 1 END)::BIGINT FROM orders
        |  UNION ALL SELECT 'lineitem.l_partkey.nulls',
        |    count(CASE WHEN l_partkey IS NULL THEN 1 END)::BIGINT FROM lineitem
        |  UNION ALL SELECT 'orders.custkey.orphans', count(*)::BIGINT FROM orders o
        |    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |  UNION ALL SELECT 'lineitem.orderkey.orphans', count(*)::BIGINT FROM lineitem l
        |    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |  UNION ALL SELECT 'lineitem.partkey.orphans', count(*)::BIGINT FROM lineitem l
        |    WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
        |  UNION ALL SELECT 'lineitem.suppkey.orphans', count(*)::BIGINT FROM lineitem l
        |    WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
        |) ORDER BY "check"""".stripMargin,

    "dq_snapshot_diff" ->
      """WITH v1 AS (
        |  SELECT o_orderkey AS k1, o_totalprice AS p1 FROM orders
        |  WHERE o_orderkey % 10 <> 9),
        |v2 AS (
        |  SELECT o_orderkey AS k2,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1000.0
        |         ELSE o_totalprice END AS p2
        |  FROM orders WHERE o_orderkey % 10 <> 0)
        |SELECT change, count(*)::BIGINT AS n,
        |       min(okey) AS min_key, max(okey) AS max_key
        |FROM (
        |  SELECT coalesce(k1, k2) AS okey,
        |    CASE WHEN k1 IS NULL THEN 'insert'
        |         WHEN k2 IS NULL THEN 'delete'
        |         WHEN p1 <> p2 THEN 'update'
        |         ELSE 'unchanged' END AS change
        |  FROM v1 FULL OUTER JOIN v2 ON k1 = k2)
        |GROUP BY 1 ORDER BY change""".stripMargin,

    "ev_transitions" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events)
        |SELECT prev_type, event_type AS next_type, count(*) AS n
        |FROM seq WHERE prev_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY prev_type, next_type""".stripMargin,

    // two-proportion z-test, ALL-INTEGER output: z² is the exact
    // rational P/Q of the four counts (P = (ca·nb−cb·na)²·N,
    // Q = na·nb·c·(N−c)), so m = round(|z|·1e4) half-up is the unique
    // integer with (2m−1)²·Q ≤ 4e8·P < (2m+1)²·Q. The double z only
    // seeds a candidate m0; exact HUGEINT comparisons correct it ±1, so
    // both engines land on the same integer. The hashed output carries
    // that integer directly (z_e4 = sign·m BIGINT) plus exact integer
    // basis points (conv_bp = n_converted·1e4 div n_users) — NO doubles,
    // so no IEEE rendering surface remains between the engines.
    // significant is m ≥ 19600 (the |z| ≥ 1.96 cut on the same integer).
    "ev_ab_test" ->
      """WITH users AS (
        |  SELECT user_id,
        |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY 1),
        |v AS (SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
        |             count(*) AS n_users, CAST(sum(conv) AS BIGINT) AS n_converted
        |      FROM users GROUP BY 1),
        |pooled AS (SELECT
        |    COALESCE(sum(CASE WHEN variant = 'A' THEN n_converted END), 0) AS ca,
        |    COALESCE(sum(CASE WHEN variant = 'A' THEN n_users END), 0) AS na,
        |    COALESCE(sum(CASE WHEN variant = 'B' THEN n_converted END), 0) AS cb,
        |    COALESCE(sum(CASE WHEN variant = 'B' THEN n_users END), 0) AS nb
        |  FROM v),
        |ex AS (SELECT ca, na, cb, nb,
        |    CAST(ca AS HUGEINT) * nb - CAST(cb AS HUGEINT) * na AS num,
        |    CAST(na AS HUGEINT) * nb * (ca + cb) * ((na + nb) - (ca + cb)) AS q,
        |    CASE WHEN na > 500000 OR nb > 500000 THEN CAST(0 AS HUGEINT)
        |         ELSE (CAST(ca AS HUGEINT) * nb - CAST(cb AS HUGEINT) * na)
        |              * (CAST(ca AS HUGEINT) * nb - CAST(cb AS HUGEINT) * na)
        |              * (na + nb) END AS p
        |  FROM pooled),
        |z0 AS (SELECT *, CASE WHEN q > 0 THEN
        |      (ca / CAST(na AS DOUBLE) - cb / CAST(nb AS DOUBLE)) /
        |      sqrt(((ca + cb) / CAST(na + nb AS DOUBLE)) *
        |           (1.0 - (ca + cb) / CAST(na + nb AS DOUBLE)) *
        |           (1.0 / na + 1.0 / nb))
        |    ELSE 0.0 END AS zr
        |  FROM ex),
        |cand AS (SELECT *, CAST(floor(abs(zr) * 10000 + 0.5) AS BIGINT) AS m0 FROM z0),
        |mc AS (SELECT num, CASE
        |    WHEN na > 500000 OR nb > 500000 THEN m0
        |    WHEN q = 0 THEN 0
        |    WHEN CAST(2 * m0 + 1 AS HUGEINT) * (2 * m0 + 1) * q
        |         <= CAST(400000000 AS HUGEINT) * p THEN m0 + 1
        |    WHEN m0 >= 1 AND CAST(2 * m0 - 1 AS HUGEINT) * (2 * m0 - 1) * q
        |         > CAST(400000000 AS HUGEINT) * p THEN m0 - 1
        |    ELSE m0 END AS m FROM cand)
        |SELECT variant, n_users, n_converted,
        |       CAST(n_converted * 10000 // n_users AS BIGINT) AS conv_bp,
        |       CAST(CASE WHEN m = 0 THEN 0
        |                 WHEN num < 0 THEN -m
        |                 ELSE m END AS BIGINT) AS z_e4,
        |       m >= 19600 AS significant
        |FROM v CROSS JOIN mc ORDER BY variant""".stripMargin,

    // degree-oriented triangle counting — all-integer, bit-exact oracle
    "graph_triangles" ->
      """WITH edges AS (
        |  SELECT DISTINCT l1.l_partkey AS src, l2.l_partkey AS dst
        |  FROM lineitem l1 JOIN lineitem l2
        |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey <> l2.l_partkey
        |  WHERE l1.l_quantity >= 25 AND l2.l_quantity >= 25),
        |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
        |o AS (
        |  SELECT CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND e.src < e.dst)
        |              THEN e.src ELSE e.dst END AS lo,
        |         CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND e.src < e.dst)
        |              THEN e.dst ELSE e.src END AS hi
        |  FROM edges e JOIN deg d1 ON d1.src = e.src JOIN deg d2 ON d2.src = e.dst
        |  WHERE e.src < e.dst),
        |tri AS (
        |  SELECT o1.lo AS a, o1.hi AS b, o2.hi AS c
        |  FROM o o1
        |  JOIN o o2 ON o2.lo = o1.hi
        |  JOIN o o3 ON o3.lo = o1.lo AND o3.hi = o2.hi)
        |SELECT part_id, count(*) AS n_triangles FROM (
        |  SELECT unnest([a, b, c]) AS part_id FROM tri)
        |GROUP BY 1 ORDER BY n_triangles DESC, part_id LIMIT 25""".stripMargin,

    "dedup_fuzzy_join" ->
      """WITH names AS (SELECT DISTINCT lower(p_name) AS name FROM part
        |               WHERE length(p_name) >= 6)
        |SELECT a.name AS name_a, b.name AS name_b,
        |       levenshtein(a.name, b.name) AS dist
        |FROM names a, names b
        |WHERE a.name < b.name AND levenshtein(a.name, b.name) <= 2
        |ORDER BY name_a, name_b""".stripMargin,

    "ev_histogram" ->
      """SELECT CAST(floor(value / 50.0) * 50 AS BIGINT) AS bucket,
        |       count(*) AS n,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value,
        |       round(min(value), 2) AS min_value,
        |       round(max(value), 2) AS max_value
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin,

    "ev_anomaly" ->
      """WITH stats AS (SELECT event_type, avg(value) AS mu,
        |                      stddev_pop(value) AS sd
        |               FROM events GROUP BY 1)
        |SELECT e.event_id, e.event_type AS etype,
        |       round((e.value - s.mu) / s.sd, 4) AS z
        |FROM events e JOIN stats s USING (event_type)
        |WHERE abs((e.value - s.mu) / s.sd) > 3.0
        |ORDER BY e.event_id""".stripMargin,

    "w6_forward_fill" ->
      """SELECT user_id, event_id,
        |       last_value(CASE WHEN event_type <> 'click' THEN value END
        |                  IGNORE NULLS)
        |         OVER (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS filled
        |FROM events
        |ORDER BY user_id, event_id""".stripMargin,

    "q9_product_profit" ->
      """SELECT n.n_name AS nation, year(o.o_orderdate) AS yr,
        |       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |                  * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
        |                - CAST(round(p.p_retailprice * 100) AS BIGINT)
        |                  * 60 * CAST(round(l.l_quantity) AS BIGINT))
        |            AS DOUBLE) / 10000.0 AS profit
        |FROM lineitem l
        |JOIN part p     ON p.p_partkey = l.l_partkey
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |JOIN nation n   ON n.n_nationkey = s.s_nationkey
        |JOIN orders o   ON o.o_orderkey = l.l_orderkey
        |WHERE p.p_name LIKE '%bolt%'
        |GROUP BY 1, 2
        |ORDER BY nation, yr DESC""".stripMargin,

    "q12_ship_priority" ->
      """SELECT l.l_linestatus AS linestatus,
        |       CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
        |                           CAST(l.l_shipdate AS DATE)) > 60
        |            THEN 'late' ELSE 'ontime' END AS shipbucket,
        |       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |GROUP BY 1, 2
        |ORDER BY linestatus, shipbucket""".stripMargin,

    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey AS suppkey,
        |         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS units
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY 1)
        |SELECT s.s_suppkey AS suppkey, s.s_name AS sname,
        |       CAST((r.units + 50) // 100 AS DOUBLE) / 100.0 AS total_rev
        |FROM supplier s JOIN rev r ON s.s_suppkey = r.suppkey
        |ORDER BY r.units DESC, suppkey LIMIT 1""".stripMargin,

    "set_ops_multiset" ->
      """WITH a AS (SELECT o_orderpriority AS p FROM orders
        |           WHERE o_orderstatus = 'F'),
        |     b AS (SELECT o_orderpriority AS p FROM orders
        |           WHERE o_totalprice > 450000)
        |SELECT 'intersect_all' AS op, p, count(*) AS n
        |FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY 2
        |UNION ALL
        |SELECT 'except_all' AS op, p, count(*) AS n
        |FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY 2
        |ORDER BY op, p""".stripMargin,

    // DuckDB dialect: strftime instead of date_format; semantics identical
    "sql_recursive_spine" ->
      """WITH RECURSIVE months(m) AS (
        |  SELECT DATE '1995-01-01'
        |  UNION ALL
        |  SELECT m + INTERVAL 1 MONTH FROM months
        |  WHERE m < DATE '2001-12-01')
        |SELECT strftime(m, '%Y-%m') AS month,
        |       coalesce(n_orders, 0) AS n_orders,
        |       coalesce(total, 0.0) AS total
        |FROM months LEFT JOIN (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS om,
        |         count(*) AS n_orders,
        |         round(sum(o_totalprice), 2) AS total
        |  FROM orders GROUP BY 1) s ON strftime(m, '%Y-%m') = s.om
        |ORDER BY month""".stripMargin,

    "q21_waiting_supp" ->
      """SELECT s.s_name AS sname, count(*) AS numwait
        |FROM supplier s, lineitem l1, orders o
        |WHERE s.s_suppkey = l1.l_suppkey AND o.o_orderkey = l1.l_orderkey
        |  AND o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, sname
        |LIMIT 20""".stripMargin,

    // DuckDB float32 gotcha: list_cosine_similarity over FLOAT[] computes
    // in float32 — CAST both sides to DOUBLE[] to match Spark's double math
    "sql_vec_cosine" ->
      """SELECT a.vec_id AS q_id, b.vec_id AS c_id,
        |       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                    CAST(b.embedding AS DOUBLE[])), 4) AS cos
        |FROM embeddings a JOIN embeddings b
        |  ON a.vec_id < 3 AND b.vec_id BETWEEN 3 AND 40
        |ORDER BY q_id, c_id""".stripMargin,

    "agg_pivot" ->
      """SELECT o_orderstatus AS status,
        |       coalesce(round(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END), 2), 0) AS p_urgent,
        |       coalesce(round(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice END), 2), 0) AS p_high,
        |       coalesce(round(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN o_totalprice END), 2), 0) AS p_medium,
        |       coalesce(round(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN o_totalprice END), 2), 0) AS p_notspec,
        |       coalesce(round(sum(CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice END), 2), 0) AS p_low
        |FROM orders GROUP BY 1 ORDER BY status""".stripMargin,

    "agg_decimal_exact" ->
      """SELECT o_orderstatus AS status,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_cents,
        |       CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS lo_cents,
        |       CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS hi_cents,
        |       count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY status""".stripMargin,

    "date_arith" ->
      """SELECT o_orderkey AS orderkey,
        |       CAST(year(o_orderdate) AS INT) AS yr,
        |       CAST(month(o_orderdate) AS INT) AS mo,
        |       CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        |       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS INT) AS days_to_eoy,
        |       strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3mo,
        |       CAST(quarter(o_orderdate) AS INT) AS qtr
        |FROM orders ORDER BY orderkey""".stripMargin,

    "agg_unpivot" ->
      """WITH m AS (SELECT o_orderstatus AS status,
        |                  round(min(o_totalprice), 2) AS min_price,
        |                  round(avg(o_totalprice), 2) AS avg_price,
        |                  round(max(o_totalprice), 2) AS max_price
        |           FROM orders GROUP BY 1)
        |SELECT status, metric, value FROM (
        |  SELECT status, 'min' AS metric, min_price AS value FROM m
        |  UNION ALL SELECT status, 'avg', avg_price FROM m
        |  UNION ALL SELECT status, 'max', max_price FROM m)
        |ORDER BY status, metric""".stripMargin,

    "w4_window_breadth" ->
      """SELECT o_orderstatus AS status, o_orderkey AS orderkey,
        |       o_totalprice AS price,
        |       ntile(4) OVER w AS quartile,
        |       round(percent_rank() OVER w, 6) AS pct_rank,
        |       round(cume_dist() OVER w, 6) AS cume,
        |       dense_rank() OVER w AS drank,
        |       lead(o_orderkey, 1) OVER w AS next_orderkey,
        |       first_value(o_orderkey) OVER wf AS cheapest_key,
        |       last_value(o_orderkey) OVER wf AS priciest_key
        |FROM orders WHERE o_custkey % 100 = 0
        |WINDOW w AS (PARTITION BY o_orderstatus
        |             ORDER BY o_totalprice ASC, o_orderkey ASC),
        |       wf AS (PARTITION BY o_orderstatus
        |              ORDER BY o_totalprice ASC, o_orderkey ASC
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY status, orderkey""".stripMargin,

    "w1_rank_per_cust" ->
      """SELECT custkey, orderkey, totalprice, rk FROM (
        |  SELECT o_custkey AS custkey, o_orderkey AS orderkey, o_totalprice AS totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |  FROM orders) t
        |WHERE rk <= 3 ORDER BY custkey, rk""".stripMargin,

    "w2_running_total" ->
      """SELECT o_custkey AS custkey, o_orderkey AS orderkey,
        |       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |             ORDER BY o_orderdate ASC, o_orderkey ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
        |FROM orders ORDER BY custkey, orderkey""".stripMargin,

    "w3_event_gaps" ->
      """SELECT user_id, event_id,
        |       CAST(floor(epoch(ts)) AS BIGINT) -
        |       lag(CAST(floor(epoch(ts)) AS BIGINT), 1) OVER
        |           (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS gap_sec
        |FROM events ORDER BY user_id, event_id""".stripMargin,

    "w5_range_frame" ->
      """WITH e AS (SELECT user_id, event_id,
        |                  CAST(floor(epoch(ts)) AS BIGINT) AS es, value FROM events)
        |SELECT user_id, event_id, es,
        |       count(*) OVER w AS n_last_hour,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS DOUBLE) / 100.0 AS value_last_hour
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es
        |                    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    "ev_tumbling" ->
      """SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_epoch,
        |       event_type AS etype, count(*) AS n,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 / count(*) AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "ev_sliding" ->
      """WITH e AS (SELECT event_type AS etype,
        |                  CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events),
        |     w AS (SELECT etype, es, (es - es % 900) - 900 * g.i AS win_start
        |           FROM e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) g)
        |SELECT win_start, win_start + 3600 AS win_end, etype, count(*) AS n
        |FROM w WHERE es >= win_start AND es < win_start + 3600
        |GROUP BY 1, 2, 3 ORDER BY win_start, etype""".stripMargin,

    "ev_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, ts, value,
        |                  CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events),
        |     f AS (SELECT *, CASE WHEN lag(es) OVER w IS NULL
        |                          OR es - lag(es) OVER w > 1800 THEN 1 ELSE 0 END AS ns
        |           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
        |     g AS (SELECT *, CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |                                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |           FROM f)
        |SELECT user_id, session_id, count(*) AS n_events,
        |       min(es) AS start_epoch, max(es) AS end_epoch,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
        |FROM g GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "ev_funnel" ->
      """WITH e AS (SELECT user_id, event_type,
        |                  CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events),
        |     v AS (SELECT user_id, min(es) AS v_es FROM e
        |           WHERE event_type = 'view' GROUP BY 1),
        |     c AS (SELECT e.user_id, min(es) AS c_es FROM e JOIN v USING (user_id)
        |           WHERE event_type = 'click' AND es >= v_es GROUP BY 1),
        |     p AS (SELECT e.user_id, min(es) AS p_es FROM e JOIN c USING (user_id)
        |           WHERE event_type = 'purchase' AND es >= c_es GROUP BY 1)
        |SELECT count(*) AS n_view, count(c_es) AS n_view_click,
        |       count(p_es) AS n_view_click_purchase
        |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)""".stripMargin,

    "ev_retention" ->
      """WITH act AS (SELECT DISTINCT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS h,
        |                             user_id FROM events),
        |     active AS (SELECT h, count(*) AS n_active FROM act GROUP BY 1),
        |     ret AS (SELECT a.h, count(*) AS n_retained
        |             FROM act a JOIN act b ON a.user_id = b.user_id AND b.h = a.h + 3600
        |             GROUP BY 1)
        |SELECT active.h AS hour_epoch, n_active,
        |       coalesce(n_retained, 0) AS n_retained,
        |       CAST(coalesce(n_retained, 0) AS DOUBLE) / n_active AS retention
        |FROM active LEFT JOIN ret ON active.h = ret.h
        |ORDER BY hour_epoch""".stripMargin,

    "text_tokens" ->
      """SELECT doc_id, length(text) AS n_chars_m,
        |       len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
        |       len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS n_unique_tokens,
        |       len(list_filter(regexp_split_to_array(
        |             regexp_replace(text, '([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+)', '\1 ', 'g'),
        |             '\s+'), x -> x <> '')) AS n_subwords
        |FROM documents ORDER BY doc_id""".stripMargin,

    // ratios unrounded: int/int quotients are bit-identical across engines,
    // while round() on their exact decimal ties is HALF_UP-vs-binary flaky
    "text_quality" ->
      """SELECT doc_id,
        |       (length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')))
        |             / greatest(CAST(length(text) AS DOUBLE), 1.0) AS letter_ratio,
        |       (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))
        |             / greatest(CAST(length(text) AS DOUBLE), 1.0) AS punct_ratio,
        |       length(text) / greatest(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE), 1.0) AS mean_token_len,
        |       len(list_distinct(regexp_split_to_array(trim(text), '\s+')))
        |             / greatest(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE), 1.0) AS ttr
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_lang_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |       CAST(CAST(sum(n_chars) AS BIGINT) AS DOUBLE) / count(*) AS avg_chars,
        |       min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "emb_label_stats" ->
      """SELECT label, count(*) AS n_values,
        |       round(avg(v), 4) AS mean_all_dims,
        |       round(stddev_pop(v), 4) AS std_all_dims
        |FROM (SELECT label, unnest(embedding) AS v FROM embeddings) t
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |       min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin,

    "dedup_bloom" -> graft.ops.Dedup.bloomOracle,

    "pipeline_split" -> graft.ops.Dedup.splitOracle,

    "pipeline_zorder_plan" -> graft.ops.Layout.zorderOracle,

    "sql_lateral" ->
      """SELECT c_custkey AS custkey, o.orderkey, o.totalprice
        |FROM customer,
        |LATERAL (SELECT o_orderkey AS orderkey, o_totalprice AS totalprice
        |         FROM orders WHERE o_custkey = c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) o
        |WHERE c_acctbal > 9000
        |ORDER BY custkey, totalprice DESC, orderkey""".stripMargin,

    // exact-integer log2 buckets via binary-string length (see the
    // Scaladoc on Graph.degreeDistribution for why not FP log2)
    "graph_degree_dist" ->
      """WITH edges AS (
        |  SELECT DISTINCT l1.l_partkey AS src, l2.l_partkey AS dst
        |  FROM lineitem l1 JOIN lineitem l2
        |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey <> l2.l_partkey
        |  WHERE l1.l_quantity >= 25 AND l2.l_quantity >= 25),
        |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1)
        |SELECT length(format('{:b}', deg)) - 1 AS bucket,
        |       count(*) AS n_nodes, min(deg) AS min_deg, max(deg) AS max_deg,
        |       CAST(sum(deg) AS BIGINT) AS sum_deg
        |FROM deg GROUP BY 1 ORDER BY bucket""".stripMargin,

    "ev_user_paths" ->
      """WITH ranked AS (
        |  SELECT user_id, event_type,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts ASC, event_id ASC) AS rn
        |  FROM events),
        |pivoted AS (
        |  SELECT user_id,
        |         max(CASE WHEN rn = 1 THEN event_type END) AS e1,
        |         max(CASE WHEN rn = 2 THEN event_type END) AS e2,
        |         max(CASE WHEN rn = 3 THEN event_type END) AS e3
        |  FROM ranked WHERE rn <= 3 GROUP BY 1)
        |SELECT concat_ws(' > ', e1, e2, e3) AS path, count(*) AS n_users
        |FROM pivoted GROUP BY 1
        |ORDER BY n_users DESC, path ASC LIMIT 20""".stripMargin,

    "ev_forecast_baseline" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n
        |               FROM events GROUP BY 1)
        |SELECT a.day AS day, a.n AS n_actual, b.n AS n_forecast,
        |       abs(a.n - b.n) AS abs_err
        |FROM daily a JOIN daily b ON a.day = b.day + 7
        |ORDER BY day""".stripMargin,

    "dq_freshness" ->
      """WITH agg AS (SELECT event_type, count(*) AS n,
        |       max(CAST(floor(epoch(ts)) AS BIGINT)) AS last_seen_es
        |     FROM events GROUP BY 1)
        |SELECT event_type, n, last_seen_es,
        |       max(last_seen_es) OVER () - last_seen_es AS lag_s,
        |       (max(last_seen_es) OVER () - last_seen_es) <= 86400 AS fresh_24h
        |FROM agg ORDER BY event_type""".stripMargin,

    // exact top-25 companion; the sketch contributes only the in-plan
    // guarantee booleans (MG estimates are merge-order-dependent, the
    // bounds are not), so the oracle expects TRUE on every row
    "agg_topk_sketch" ->
      """SELECT token, n, TRUE AS in_sketch, TRUE AS est_ok FROM (
        |  SELECT token, count(*) AS n FROM (
        |    SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
        |    FROM documents) t
        |  WHERE token <> ''
        |  GROUP BY token ORDER BY n DESC, token ASC LIMIT 25) s
        |ORDER BY n DESC, token ASC""".stripMargin,

    "pipeline_domain_cap" ->
      s"""SELECT source, doc_id, n_chars,
         |       row_number() OVER (PARTITION BY source
         |         ORDER BY n_chars DESC, doc_id ASC) AS rnk
         |FROM documents
         |QUALIFY rnk <= ${graft.ops.Text.DomainCapK}
         |ORDER BY source, rnk""".stripMargin,

    "ev_ltv_cohort" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d,
        |                  CAST(round(value * 100) AS BIGINT) AS cents, event_type
        |           FROM events),
        |     cohorts AS (SELECT user_id, min(d) AS cohort_day FROM e GROUP BY 1)
        |SELECT cohort_day, date_diff('day', cohort_day, d) AS age_days,
        |       count(DISTINCT e.user_id) AS n_active, count(*) AS n_events,
        |       CAST(sum(cents) AS DOUBLE) / 100.0 AS total_value,
        |       CAST(sum(CASE WHEN event_type = 'purchase' THEN cents ELSE 0 END) AS DOUBLE) / 100.0 AS purchase_value
        |FROM e JOIN cohorts ON e.user_id = cohorts.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    "ann_brute_force" ->
      """WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q_vec
        |           FROM embeddings WHERE vec_id < 10),
        |     s AS (SELECT q_id, vec_id AS c_id, label,
        |                  list_cosine_similarity(q_vec, CAST(embedding AS DOUBLE[])) AS cos,
        |                  row_number() OVER (PARTITION BY q_id
        |                    ORDER BY list_cosine_similarity(q_vec, CAST(embedding AS DOUBLE[])) DESC,
        |                             vec_id ASC) AS rk
        |           FROM embeddings CROSS JOIN q WHERE vec_id <> q_id)
        |SELECT q_id, rk, c_id, label, round(cos, 4) AS cos
        |FROM s WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,

    // range search: everything within the cosine radius; the threshold
    // compares the ROUNDED similarity so the cut line is engine-stable
    "ann_range_search" ->
      """WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q_vec
        |           FROM embeddings WHERE vec_id < 10)
        |SELECT q_id, vec_id AS c_id, label,
        |       round(list_cosine_similarity(q_vec, CAST(embedding AS DOUBLE[])), 4) AS cos
        |FROM embeddings CROSS JOIN q
        |WHERE vec_id <> q_id
        |  AND round(list_cosine_similarity(q_vec, CAST(embedding AS DOUBLE[])), 4) >= 0.25
        |ORDER BY q_id, c_id""".stripMargin,

    // the LSH hyperplanes are deterministic ±1 literals, rendered into the
    // SQL — the full multi-table LSH pipeline pinned by an independent
    // engine (float32 gotcha: CAST embeddings to DOUBLE[])
    "ann_lsh" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |codes AS (
         |${graft.ops.Vectors.lshOracleCodes}
         |),
         |q AS (SELECT * FROM codes WHERE vec_id < 10),
         |cand AS (SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS c_id
         |         FROM q JOIN codes c ON q.t = c.t AND q.code = c.code
         |                            AND c.vec_id <> q.vec_id),
         |s AS (SELECT cand.q_id, cand.c_id,
         |             list_cosine_similarity(qa.e, ca.e) AS cos,
         |             row_number() OVER (PARTITION BY cand.q_id
         |               ORDER BY list_cosine_similarity(qa.e, ca.e) DESC,
         |                        cand.c_id ASC) AS rk
         |      FROM cand JOIN v qa ON cand.q_id = qa.vec_id
         |                JOIN v ca ON cand.c_id = ca.vec_id)
         |SELECT q_id, rk, c_id, round(cos, 4) AS cos
         |FROM s WHERE rk <= 3 ORDER BY q_id, rk""".stripMargin,

    // same rendered-hyperplane trick as ann_lsh: bucket-capped candidate
    // pairs + exact-cosine verify, fully reproduced in DuckDB
    // the emb_near_dup pair pipeline + the dedup_clusters recursive-CTE
    // closure: the full semantic-dedup composition replayed cross-engine
    "emb_dup_clusters" ->
      s"""WITH RECURSIVE v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |codes AS (
         |${graft.ops.Vectors.lshOracleCodes}
         |),
         |g AS (SELECT t, code FROM codes GROUP BY 1, 2
         |      HAVING count(*) BETWEEN 2 AND 2000),
         |kc AS (SELECT c.vec_id, c.t, c.code FROM codes c JOIN g USING (t, code)),
         |pairs AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |          FROM kc a JOIN kc b ON a.t = b.t AND a.code = b.code
         |                             AND a.vec_id < b.vec_id),
         |prs AS (SELECT id_a, id_b
         |        FROM pairs JOIN v va ON id_a = va.vec_id
         |                   JOIN v vb ON id_b = vb.vec_id
         |        WHERE round(list_cosine_similarity(va.e, vb.e), 4) >= 0.45),
         |und AS (SELECT id_a AS src, id_b AS dst FROM prs
         |        UNION ALL SELECT id_b AS src, id_a AS dst FROM prs),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM und
         |  UNION
         |  SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src),
         |labels AS (SELECT src AS id, least(src, min(dst)) AS label
         |           FROM reach GROUP BY src)
         |SELECT label AS keep_id, count(*) AS cluster_size,
         |       array_to_string(list_sort(list(id)), ',') AS members
         |FROM labels GROUP BY 1 ORDER BY keep_id""".stripMargin,

    "emb_near_dup" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |codes AS (
         |${graft.ops.Vectors.lshOracleCodes}
         |),
         |g AS (SELECT t, code FROM codes GROUP BY 1, 2
         |      HAVING count(*) BETWEEN 2 AND 2000),
         |kc AS (SELECT c.vec_id, c.t, c.code FROM codes c JOIN g USING (t, code)),
         |pairs AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |          FROM kc a JOIN kc b ON a.t = b.t AND a.code = b.code
         |                             AND a.vec_id < b.vec_id),
         |s AS (SELECT id_a, id_b, round(list_cosine_similarity(va.e, vb.e), 4) AS cos
         |      FROM pairs JOIN v va ON id_a = va.vec_id
         |                 JOIN v vb ON id_b = vb.vec_id)
         |SELECT id_a, id_b, cos
         |FROM s WHERE cos >= 0.45 ORDER BY id_a, id_b""".stripMargin,

    // kNN majority vote over the brute-force top-5 (same CTE as
    // ann_brute_force), ties to the smallest label
    "emb_knn_classify" ->
      """WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q_vec
        |           FROM embeddings WHERE vec_id < 10),
        |     s AS (SELECT q_id, vec_id AS c_id, label,
        |                  list_cosine_similarity(q_vec, CAST(embedding AS DOUBLE[])) AS cos,
        |                  row_number() OVER (PARTITION BY q_id
        |                    ORDER BY list_cosine_similarity(q_vec, CAST(embedding AS DOUBLE[])) DESC,
        |                             vec_id ASC) AS rk
        |           FROM embeddings CROSS JOIN q WHERE vec_id <> q_id),
        |     v AS (SELECT q_id, label, count(*) AS votes FROM s
        |           WHERE rk <= 5 GROUP BY 1, 2),
        |     r AS (SELECT *, row_number() OVER (PARTITION BY q_id
        |                      ORDER BY votes DESC, label ASC) AS vrk FROM v)
        |SELECT q_id, label AS pred_label, votes
        |FROM r WHERE vrk = 1 ORDER BY q_id""".stripMargin,

    "mm_media_stats" ->
      """SELECT doc_id, 'image/fake-' || lang AS mime,
        |       octet_length(encode(text)) AS n_bytes,
        |       (doc_id % 640) + 32 AS width, (doc_id % 480) + 32 AS height
        |FROM documents ORDER BY doc_id""".stripMargin,

    // blob-pack manifest: per-mime running byte offsets, floor-placement
    // into target-size blob files, in-file ranges via the per-file min
    "mm_manifest_plan" ->
      s"""WITH m AS (SELECT doc_id, 'image/fake-' || lang AS mime,
         |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
         |  FROM documents),
         |p AS (SELECT *, CAST(coalesce(sum(n_bytes) OVER (PARTITION BY mime ORDER BY doc_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS bytes_before
         |      FROM m),
         |q AS (SELECT *, CAST(floor(bytes_before / ${graft.ops.Multimodal.BlobTargetBytes}) AS BIGINT) AS file_seq
         |      FROM p)
         |SELECT doc_id, mime || '/blob-' || CAST(file_seq AS VARCHAR) AS uri,
         |       CAST(bytes_before - min(bytes_before) OVER (PARTITION BY mime, file_seq) AS BIGINT) AS byte_start,
         |       n_bytes AS byte_len
         |FROM q ORDER BY doc_id""".stripMargin,

    // payload bytes = utf-8 text bytes, so md5(payload) == md5(text)
    "mm_payload_dedup" ->
      """SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_copies,
        |       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
        |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin,

    "mm_modality_mix" ->
      """WITH m AS (SELECT 'image/fake-' || lang AS mime,
        |                  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |           FROM documents),
        |a AS (SELECT mime, count(*) AS n_items,
        |             CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        |             min(n_bytes) AS min_bytes, max(n_bytes) AS max_bytes
        |      FROM m GROUP BY 1)
        |SELECT mime, n_items, total_bytes, min_bytes, max_bytes,
        |       round(CAST(total_bytes AS DOUBLE) /
        |             CAST(sum(total_bytes) OVER () AS DOUBLE), 6) AS byte_share
        |FROM a ORDER BY mime""".stripMargin,

    // every-4th 256-byte frame, md5 per frame. Text is ASCII (verified per
    // SF), so DuckDB's char-based substring == Spark's byte-based binary
    // substring; md5 hex matches byte-for-byte across engines.
    "mm_frame_sample" ->
      """WITH f AS (SELECT doc_id, text,
        |                  CAST(octet_length(encode(text)) // 256 AS INT) AS n_frames
        |           FROM documents),
        |     e AS (SELECT doc_id, text,
        |                  unnest(range(0, n_frames)) AS frame_idx
        |           FROM f WHERE n_frames > 0)
        |SELECT doc_id, frame_idx,
        |       md5(substring(text, CAST(frame_idx * 256 + 1 AS INT), 256)) AS frame_checksum
        |FROM e WHERE frame_idx % 4 = 0
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // length filter -> exact dedup (min doc_id per fingerprint) -> 90/10
    // deterministic hash-mod split; 0.9 * 2^32 = 3865470566
    "pipeline_clean_corpus" ->
      """WITH d AS (SELECT doc_id, lang,
        |                  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |           FROM documents WHERE n_chars BETWEEN 50 AND 100000),
        |     k AS (SELECT *, min(doc_id) OVER (PARTITION BY fp) AS keep_id FROM d)
        |SELECT doc_id, lang,
        |       CASE WHEN (doc_id * 2654435761) % 4294967296 < 3865470566
        |            THEN 'train' ELSE 'val' END AS split
        |FROM k WHERE doc_id = keep_id ORDER BY doc_id""".stripMargin,

    // Gopher rules (public): the mean-word-length COALESCE guards the
    // all-whitespace edge where DuckDB's list_sum of [] is NULL but
    // Spark's aggregate init is 0
    "text_gopher_filter" ->
      """WITH d AS (SELECT doc_id,
        |                  list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |                              x -> x <> '') AS t
        |           FROM documents),
        |     s AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_words,
        |                  CAST(coalesce(list_sum(list_transform(t, x -> length(x))), 0) AS DOUBLE)
        |                    / greatest(len(t), 1) AS ml,
        |                  CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
        |                                       w -> list_contains(t, w))) AS INT) AS stop_hits
        |           FROM d)
        |SELECT doc_id, n_words, ml AS mean_word_len, stop_hits,
        |       (n_words BETWEEN 50 AND 100000) AND (ml BETWEEN 3 AND 10)
        |        AND stop_hits >= 2 AS keep
        |FROM s ORDER BY doc_id""".stripMargin,

    // 500-char windows, 50 overlap (stride 450); Spark substring and
    // DuckDB substring share 1-based start + length-capped semantics
    "pipeline_chunk" ->
      """WITH d AS (SELECT doc_id, text,
        |                  greatest(CAST(ceil(CAST(n_chars - 50 AS DOUBLE) / 450) AS BIGINT), 1) AS n_chunks
        |           FROM documents),
        |     c AS (SELECT doc_id, text, unnest(range(0, n_chunks)) AS idx FROM d)
        |SELECT doc_id, idx,
        |       length(substring(text, CAST(idx * 450 + 1 AS INT), 500)) AS chunk_len,
        |       md5(substring(text, CAST(idx * 450 + 1 AS INT), 500)) AS chunk_md5
        |FROM c ORDER BY doc_id, idx""".stripMargin,

    // eval-set 3-gram overlap in string space (Spark side hashes to int64;
    // identical output barring 2^-64 collisions)
    "pipeline_decontaminate" ->
      """WITH toks AS (SELECT doc_id,
        |                     list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
        |              FROM documents),
        |     sh AS (SELECT doc_id,
        |                   list_distinct(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
        |                                                i -> array_to_string(t[i:i+2], ' '))) AS shingles
        |            FROM toks),
        |     post AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        |     ev AS (SELECT DISTINCT s FROM post WHERE doc_id < 10)
        |SELECT p.doc_id, count(DISTINCT p.s) AS n_overlap
        |FROM post p JOIN ev ON p.s = ev.s WHERE p.doc_id >= 10
        |GROUP BY 1 HAVING count(DISTINCT p.s) >= 2 ORDER BY doc_id""".stripMargin,

    // content-addressed output sharding: shard id = top-32 md5 word mod 64
    // (Spark conv(substring(md5,1,8),16,10) ≡ DuckDB byte-swap of
    // md5_number_upper's low word — the repo's verified cross-engine md5
    // idiom, same as minhashOracle); all-integer manifest, bit-exact
    "pipeline_shard" ->
      """WITH sh AS (SELECT doc_id, n_chars,
        |    (((x & 255) << 24) | (((x >> 8) & 255) << 16) |
        |     (((x >> 16) & 255) << 8) | ((x >> 24) & 255)) % 64 AS shard_id,
        |    len(regexp_split_to_array(trim(text), '\s+')) AS n_toks
        |  FROM (SELECT doc_id, n_chars, text,
        |          CAST(md5_number_upper(text) & 4294967295 AS BIGINT) AS x
        |        FROM documents))
        |SELECT shard_id, count(*) AS n_docs,
        |       CAST(sum(n_toks) AS BIGINT) AS n_tokens,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |       min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
        |FROM sh GROUP BY 1 ORDER BY shard_id""".stripMargin,

    "pipeline_compaction_plan" ->
      s"""WITH sh AS (SELECT doc_id, n_chars,
         |    (((x & 255) << 24) | (((x >> 8) & 255) << 16) |
         |     (((x >> 16) & 255) << 8) | ((x >> 24) & 255)) % 64 AS shard_id
         |  FROM (SELECT doc_id, n_chars,
         |          CAST(md5_number_upper(text) & 4294967295 AS BIGINT) AS x
         |        FROM documents)),
         |m AS (SELECT shard_id, count(*) AS n_docs,
         |        CAST(sum(n_chars) AS BIGINT) AS total_chars
         |      FROM sh GROUP BY 1),
         |placed AS (SELECT *,
         |    CAST(floor(coalesce(sum(total_chars) OVER (ORDER BY shard_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      / ${graft.ops.Text.CompactionTargetChars}) AS BIGINT) AS file_id
         |  FROM m)
         |SELECT file_id, count(*) AS n_shards,
         |       min(shard_id) AS first_shard, max(shard_id) AS last_shard,
         |       CAST(sum(n_docs) AS BIGINT) AS n_docs,
         |       CAST(sum(total_chars) AS BIGINT) AS n_chars,
         |       CAST(sum(total_chars) AS DOUBLE) / ${graft.ops.Text.CompactionTargetChars}.0 AS fill_ratio
         |FROM placed GROUP BY 1 ORDER BY file_id""".stripMargin,

    // CASTs pin DuckDB's HUGEINT sums; share = cell tokens / corpus tokens
    "pipeline_mixture" ->
      """WITH m AS (SELECT source, lang, count(*) AS n_docs,
        |                  CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS total_tokens
        |           FROM documents GROUP BY 1, 2)
        |SELECT source, lang, n_docs, total_tokens,
        |       CAST(total_tokens AS DOUBLE) /
        |             CAST(sum(total_tokens) OVER () AS DOUBLE) AS token_share
        |FROM m ORDER BY source, lang""".stripMargin,

    // contiguous-fill sequence packing; CAST pins DuckDB's HUGEINT window sum
    "pipeline_pack_sequences" ->
      """WITH t AS (SELECT doc_id, lang,
        |                  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |           FROM documents),
        |     c AS (SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |                                              ROWS UNBOUNDED PRECEDING) - n_tokens
        |                          AS BIGINT) AS tokens_before
        |           FROM t)
        |SELECT doc_id, lang, n_tokens,
        |       CAST(floor(tokens_before / 2048.0) AS BIGINT) AS bin,
        |       tokens_before % 2048 AS bin_offset
        |FROM c ORDER BY doc_id""".stripMargin,

    // p_l = share_l^(alpha-1) normalized to the rarest language; alpha=0.5
    "pipeline_temp_resample" ->
      """WITH r AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |     w AS (SELECT lang, CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE) AS share FROM r),
        |     p AS (SELECT lang, pow(share, -0.5) / max(pow(share, -0.5)) OVER () AS p FROM w)
        |SELECT doc_id, d.lang AS lang, round(p, 6) AS keep_p
        |FROM documents d JOIN p ON d.lang = p.lang
        |WHERE CAST(((doc_id + 13) * 2654435761) % 4294967296 AS DOUBLE) < p * 4294967296
        |ORDER BY doc_id""".stripMargin,

    // deterministic hash-mod sampling (Knuth multiplicative hash of doc_id)
    // — reproducible across engines, unlike RNG-based sample/sampleBy
    "text_sampling" ->
      """WITH u AS (SELECT doc_id, 'uniform' AS split FROM documents
        |           WHERE (doc_id * 2654435761) % 4294967296 < 858993459),
        |     s AS (SELECT doc_id, 'stratified' AS split FROM documents
        |           WHERE CAST(((doc_id + 7) * 2246822519) % 4294967296 AS DOUBLE) <
        |                 (CASE WHEN lang = 'en' THEN 0.05 ELSE 0.15 END) * 4294967296)
        |SELECT doc_id, split FROM (SELECT * FROM u UNION ALL SELECT * FROM s)
        |ORDER BY split, doc_id""".stripMargin,

    // marker-token language ID; CASE order (de<en<es<fr<zh) reproduces the
    // tie-break "smallest lang code among max scores"
    "text_lang_id" ->
      """WITH t AS (SELECT doc_id, lang AS lang_true,
        |                  regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |           FROM documents),
        |     s AS (SELECT doc_id, lang_true,
        |                  len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht','mit','ein','zu','den'], x))) AS s_de,
        |                  len(list_filter(toks, x -> list_contains(['the','and','of','to','a','in','is','it','that','for'], x))) AS s_en,
        |                  len(list_filter(toks, x -> list_contains(['el','la','los','las','y','es','no','por','que','una'], x))) AS s_es,
        |                  len(list_filter(toks, x -> list_contains(['le','la','les','et','est','pas','pour','que','une','dans'], x))) AS s_fr,
        |                  len(list_filter(toks, x -> list_contains(['的','是','不','了','在','人','有','我','他','这'], x))) AS s_zh
        |           FROM t)
        |SELECT doc_id, lang_true,
        |       CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
        |            WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
        |            WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
        |            WHEN s_fr >= s_zh THEN 'fr'
        |            ELSE 'zh' END AS lang_pred,
        |       CAST(greatest(s_de, s_en, s_es, s_fr, s_zh) AS INT) AS score
        |FROM s ORDER BY doc_id""".stripMargin,

    // lag-based rewrite of session_window semantics: new session iff the
    // inter-event gap is >= 30 min at MICROSECOND precision (session_window
    // merges events strictly inside [start, prev + gap))
    "ev_session_native" ->
      """WITH e AS (SELECT user_id, ts, value, epoch_us(ts) AS eus FROM events),
        |     f AS (SELECT *, CASE WHEN lag(eus) OVER w IS NULL
        |                           OR eus - lag(eus) OVER w >= 1800000000 THEN 1 ELSE 0 END AS ns
        |           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY eus ASC)),
        |     g AS (SELECT *, CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY eus ASC
        |                                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
        |           FROM f)
        |SELECT user_id, CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
        |FROM g GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,

    // string-space recomputation of the int64-hashed Spark plan: identical
    // output unless xxhash64 collides (~n²/2⁶⁴)
    "dedup_ngram_jaccard" ->
      """WITH toks AS (SELECT doc_id,
        |                     list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
        |              FROM documents),
        |     sh AS (SELECT doc_id,
        |                   list_distinct(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
        |                                                i -> array_to_string(t[i:i+2], ' '))) AS shingles
        |            FROM toks),
        |     post AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
        |     kept AS (SELECT shingle FROM post GROUP BY 1 HAVING count(*) <= 100),
        |     kp AS (SELECT p.doc_id, p.shingle FROM post p JOIN kept k ON p.shingle = k.shingle),
        |     sizes AS (SELECT doc_id, count(*) AS sz FROM kp GROUP BY 1),
        |     pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        |               FROM kp a JOIN kp b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |               GROUP BY 1, 2)
        |SELECT doc_a, doc_b, jaccard FROM (
        |  SELECT doc_a, doc_b,
        |         round(common / CAST(sa.sz + sb.sz - common AS DOUBLE), 4) AS jaccard
        |  FROM pairs JOIN sizes sa ON doc_a = sa.doc_id
        |             JOIN sizes sb ON doc_b = sb.doc_id) q
        |WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b""".stripMargin,

    // same inverted-index pipeline as dedup_ngram_jaccard; asymmetric
    // containment score |A∩B|/min(|A|,|B|) over the capped feature space
    "dedup_containment" ->
      """WITH toks AS (SELECT doc_id,
        |                     list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
        |              FROM documents),
        |     sh AS (SELECT doc_id,
        |                   list_distinct(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
        |                                                i -> array_to_string(t[i:i+2], ' '))) AS shingles
        |            FROM toks),
        |     post AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
        |     kept AS (SELECT shingle FROM post GROUP BY 1 HAVING count(*) <= 100),
        |     kp AS (SELECT p.doc_id, p.shingle FROM post p JOIN kept k ON p.shingle = k.shingle),
        |     sizes AS (SELECT doc_id, count(*) AS sz FROM kp GROUP BY 1),
        |     pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        |               FROM kp a JOIN kp b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |               GROUP BY 1, 2)
        |SELECT doc_a, doc_b, sz_a, sz_b, containment FROM (
        |  SELECT doc_a, doc_b, sa.sz AS sz_a, sb.sz AS sz_b,
        |         round(common / CAST(least(sa.sz, sb.sz) AS DOUBLE), 4) AS containment
        |  FROM pairs JOIN sizes sa ON doc_a = sa.doc_id
        |             JOIN sizes sb ON doc_b = sb.doc_id) q
        |WHERE containment >= 0.8 ORDER BY doc_a, doc_b""".stripMargin,

    // same pair pipeline + recursive-CTE transitive closure; label = min id
    // reachable (matches min-label-propagation connected components)
    "dedup_clusters" ->
      """WITH RECURSIVE
        |     toks AS (SELECT doc_id,
        |                     list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
        |              FROM documents),
        |     sh AS (SELECT doc_id,
        |                   list_distinct(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
        |                                                i -> array_to_string(t[i:i+2], ' '))) AS shingles
        |            FROM toks),
        |     post AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
        |     kept AS (SELECT shingle FROM post GROUP BY 1 HAVING count(*) <= 100),
        |     kp AS (SELECT p.doc_id, p.shingle FROM post p JOIN kept k ON p.shingle = k.shingle),
        |     sizes AS (SELECT doc_id, count(*) AS sz FROM kp GROUP BY 1),
        |     pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        |               FROM kp a JOIN kp b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |               GROUP BY 1, 2),
        |     prs AS (SELECT doc_a, doc_b FROM (
        |               SELECT doc_a, doc_b,
        |                      round(common / CAST(sa.sz + sb.sz - common AS DOUBLE), 4) AS jaccard
        |               FROM pairs JOIN sizes sa ON doc_a = sa.doc_id
        |                          JOIN sizes sb ON doc_b = sb.doc_id) q
        |             WHERE jaccard >= 0.5),
        |     und AS (SELECT doc_a AS src, doc_b AS dst FROM prs
        |             UNION ALL SELECT doc_b AS src, doc_a AS dst FROM prs),
        |     reach(src, dst) AS (
        |       SELECT src, dst FROM und
        |       UNION
        |       SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src),
        |     labels AS (SELECT src AS id, least(src, min(dst)) AS label
        |                FROM reach GROUP BY src)
        |SELECT label AS keep_id, count(*) AS cluster_size,
        |       array_to_string(list_sort(list(id)), ',') AS members
        |FROM labels GROUP BY 1 ORDER BY keep_id""".stripMargin,

    // dedup_clusters' pipeline + closure with the fixed-width reps
    // rollup instead of the unbounded members string (the emission a
    // corpus-scale dedup pass consumes)
    "dedup_ngram_reps" ->
      """WITH RECURSIVE
        |     toks AS (SELECT doc_id,
        |                     list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
        |              FROM documents),
        |     sh AS (SELECT doc_id,
        |                   list_distinct(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
        |                                                i -> array_to_string(t[i:i+2], ' '))) AS shingles
        |            FROM toks),
        |     post AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
        |     kept AS (SELECT shingle FROM post GROUP BY 1 HAVING count(*) <= 100),
        |     kp AS (SELECT p.doc_id, p.shingle FROM post p JOIN kept k ON p.shingle = k.shingle),
        |     sizes AS (SELECT doc_id, count(*) AS sz FROM kp GROUP BY 1),
        |     pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        |               FROM kp a JOIN kp b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |               GROUP BY 1, 2),
        |     prs AS (SELECT doc_a, doc_b FROM (
        |               SELECT doc_a, doc_b,
        |                      round(common / CAST(sa.sz + sb.sz - common AS DOUBLE), 4) AS jaccard
        |               FROM pairs JOIN sizes sa ON doc_a = sa.doc_id
        |                          JOIN sizes sb ON doc_b = sb.doc_id) q
        |             WHERE jaccard >= 0.5),
        |     und AS (SELECT doc_a AS src, doc_b AS dst FROM prs
        |             UNION ALL SELECT doc_b AS src, doc_a AS dst FROM prs),
        |     reach(src, dst) AS (
        |       SELECT src, dst FROM und
        |       UNION
        |       SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src),
        |     labels AS (SELECT src AS id, least(src, min(dst)) AS label
        |                FROM reach GROUP BY src)
        |SELECT label AS rep_id, count(*) AS n_members,
        |       CAST(sum(id) AS BIGINT) AS id_sum, max(id) AS max_id
        |FROM labels GROUP BY 1 ORDER BY rep_id""".stripMargin,
  )
}

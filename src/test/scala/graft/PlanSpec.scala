package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan audits: the properties that make these queries scale —
  * filter/column pushdown into parquet, broadcast joins for dims,
  * whole-stage codegen — asserted so a regression fails the build, not
  * a cluster. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, sf("sf0.001"))
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q01: shipdate filter and column pruning reach the parquet scan") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"missing pushed filter:\n$p")
    // only the needed columns are read
    assert(p.contains("l_returnflag") && !p.contains("l_suppkey"),
      s"column pruning failed:\n$p")
  }

  test("q06: star joins broadcast the dimension side") {
    val p = plan("q06_star_revenue")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in star join:\n$p")
  }

  test("q04: semi join is a real LeftSemi") {
    val p = plan("q04_semi_join")
    assert(p.contains("LeftSemi"), s"semi join lost:\n$p")
  }

  test("q05: anti join pushes the priority filter into the orders scan") {
    val p = plan("q05_anti_join")
    assert(p.contains("LeftAnti"), s"anti join lost:\n$p")
    assert(p.contains("EqualTo(o_orderpriority,1-URGENT)"),
      s"priority filter not pushed:\n$p")
  }

  test("hot queries run inside whole-stage codegen") {
    // the adaptive plan only shows codegen nodes once executed
    for (q <- Seq("q01_pricing_summary", "q06_star_revenue", "q33_simhash",
      "q37_quality")) {
      val df = SparkEntry.queries(q)(spark, sf("sf0.001"))
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      // WholeStageCodegen stages render as "*(n) " markers
      assert(p.contains("*("), s"$q fell out of codegen:\n$p")
    }
  }

  test("q42 ivf assignment stays window-free (fold argmax regression guard)") {
    // the old implementation ranked the rows x centroids cross product
    // with row_number — a full shuffle+sort. The fold argmax must keep
    // the assignment stage free of Window nodes; only the final
    // per-query top-k may window (over the tiny candidate frame).
    val p = plan("q42_ivf_ann")
    // formatted output names each node twice (tree + detail header);
    // count detail headers only. WindowGroupLimit nodes are the rank<=k
    // pushdown, not a window compute — excluded by the \b…$ match.
    val windows = p.linesIterator
      .count(_.matches("^\\(\\d+\\) Window$"))
    assert(windows <= 1, s"unexpected extra Window nodes:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("Broadcast"),
      s"centroid array not broadcast:\n$p")
  }

  test("q29 kmv: rank<=k is pushed down as a WindowGroupLimit") {
    // the sketch must never materialize a full per-group rank — Spark's
    // limit pushdown keeps only k rows per group before the final agg
    val p = plan("q29_kmv_distinct")
    assert(p.contains("WindowGroupLimit"), s"rank pushdown missing:\n$p")
  }

  test("q46 tfidf aggregates partially before the shuffle") {
    val p = plan("q46_tfidf")
    assert(p.contains("partial_count") || p.contains("Partial"),
      s"no partial aggregation:\n$p")
  }

  test("q45 hash split is pure expression work before one aggregation") {
    val p = plan("q45_hash_split")
    assert(!p.contains("Window"), s"split should not window:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"split should not join:\n$p")
  }

  test("q49 stratified sample broadcasts the rate table, never shuffles facts") {
    val p = plan("q49_stratified_sample")
    assert(p.contains("BroadcastHashJoin"), s"rate table not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"fact side shuffled for the rate join:\n$p")
  }

  test("q50 chunk dedup wins by partial-agg min, never a window over text") {
    val p = plan("q50_chunk_dedup")
    assert(!p.linesIterator.exists(_.matches("^\\(\\d+\\) Window$")),
      s"window over chunk text:\n$p")
    assert(p.contains("partial_min") || p.contains("Partial"),
      s"winner min not partially aggregated:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
  }

  test("q53 packing windows per shard with a partition spec") {
    val p = plan("q53_pack")
    // the running sum must be a partitioned window (source shard), and
    // the only join-free shuffle keys are the shard column
    assert(p.linesIterator.exists(_.matches("^\\(\\d+\\) Window$")),
      s"packing lost its window:\n$p")
    assert(p.contains("partitionspec") || p.contains("source"),
      s"window not partitioned by shard:\n$p")
  }

  test("pq encode is map-only expression work (no exchange)") {
    val emb = spark.read.parquet(s"${sf("sf0.001")}/embeddings.parquet")
    val books = graft.operators.Similarity.pqTrain(emb, "vec_id",
      "embedding", m = 4, k = 8, iters = 1, dims = 64)
    val p = graft.operators.Similarity
      .pqEncode(emb, "vec_id", "embedding", books)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("Exchange"), s"pq encode shuffles:\n$p")
  }

  test("composed-time parse builds no trivially-true equals predicate") {
    // lit(freq.code) === "Q" logs Spark's "trivially true equals
    // predicate" WARN on every plan build and is the exact pattern that
    // silently becomes a cross join if the literal ever turns into a
    // shared attribute — parseComposedLabel must never construct
    // EqualTo over two identical expressions (it uses <=> on literals,
    // which Catalyst constant-folds)
    import org.apache.spark.sql.catalyst.expressions.EqualTo
    for (name <- Seq("q22_scrape_grid", "q27_composed_time",
        "q28_composed_two_col")) {
      val df = SparkEntry.queries(name)(spark, sf("sf0.001"))
      val trivial = df.queryExecution.analyzed.expressions.flatMap(_.collect {
        case e @ EqualTo(l, r) if l == r => e
      })
      assert(trivial.isEmpty, s"$name builds trivially-true EqualTo: $trivial")
    }
  }

  test("q62/q67 aggregate partially before their one shuffle") {
    // resample and length-bucketing are single-groupBy designs: the
    // map side must partial-aggregate (HashAggregate below the
    // exchange), so the shuffle moves group rows, not input rows
    for (q <- Seq("q62_resample", "q67_length_buckets")) {
      val p = plan(q)
      assert(p.contains("HashAggregate"), s"$q: no hash aggregate:\n$p")
      assert(p.contains("partial_"),
        s"$q: no partial (map-side) aggregation:\n$p")
    }
  }

  test("asofJoin plans zero join nodes and a single data shuffle") {
    // the operator's whole point: an as-of alignment WITHOUT a range
    // join (broadcast-nested-loop / exploded equi-range) — union + one
    // keyed window. A Join node or a second hash-partitioning exchange
    // means the shape regressed.
    import spark.implicits._
    val left = (1 to 100).map(i => ("k" + i % 3, i.toLong, i * 1.0))
      .toDF("k", "t", "v")
    val right = (1 to 10).map(i => ("k" + i % 3, i * 7L, i * 2.0))
      .toDF("k", "t", "mark")
    val df = graft.operators.TimeSeriesOps
      .asofJoin(left, right, Seq("k"), "t", Seq("mark"))
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("Join"), s"asofJoin plans a join:\n$p")
    // formatted mode lists operators as "(n) Exchange" tree nodes
    val exchanges = """\(\d+\) Exchange""".r.findAllMatchIn(p).length
    assert(exchanges == 1, s"want exactly 1 shuffle, got $exchanges:\n$p")
  }

  test("minhash signature plan has partial aggregation before the shuffle") {
    // q31's end-to-end plan now materializes the bucket frame through a
    // lazy localCheckpoint (cache hygiene), which hides upstream lineage
    // behind a LogicalRDD — so assert the map-side partial min on the
    // signature frame itself, where the aggregation lives.
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val sig = graft.operators.Dedup.minhashSignature(docs, "text", "doc_id", 8)
    val p = sig.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("partial_min") || p.contains("Partial"),
      s"no partial aggregation:\n$p")
  }

  test("q69 source cap: rank<=N is pushed down as a WindowGroupLimit") {
    // the domain-cap filter must pre-prune per map task — a 100 TB corpus
    // with a 10k cap moves O(groups x N) rows, not the whole table
    val p = plan("q69_source_cap")
    assert(p.contains("WindowGroupLimit"), s"rank pushdown missing:\n$p")
  }

  test("q70 mixture: rate table broadcast, fact side never sort-merged") {
    val p = plan("q70_mixture")
    assert(p.contains("BroadcastHashJoin"), s"rate table not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"fact side shuffled for the rate join:\n$p")
  }

  test("interpolate: both window frames share one shuffle and one sort") {
    // unbounded-preceding and unbounded-following frames over the same
    // partitioning/order must not re-shuffle or re-sort between them
    import spark.implicits._
    val s = (1 to 100).map(i => ("k" + i % 3, i.toLong,
      if (i % 4 == 0) None else Some(i * 1.0)))
      .toDF("serie_id", "indice_tiempo", "valor")
    val df = graft.operators.TimeSeriesOps.interpolate(s)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    val exchanges = """\(\d+\) Exchange""".r.findAllMatchIn(p).length
    val sorts = """\(\d+\) Sort""".r.findAllMatchIn(p).length
    assert(exchanges == 1, s"want exactly 1 shuffle, got $exchanges:\n$p")
    assert(sorts == 1, s"want exactly 1 sort, got $sorts:\n$p")
  }

  test("q80 top tokens: rank<=k pre-prunes as WindowGroupLimit") {
    // at 100 TB the distinct-token frame is still large; each map task
    // must keep only its local top-k per stratum before the final rank
    val p = plan("q80_top_tokens")
    assert(p.contains("WindowGroupLimit"), s"rank pushdown missing:\n$p")
  }

  test("q82 winsorize: threshold table broadcast, corpus never sort-merged") {
    val p = plan("q82_winsorize")
    assert(p.contains("BroadcastHashJoin"), s"thresholds not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus shuffled for the threshold join:\n$p")
  }

  test("q83 char entropy: map-only scalar inside whole-stage codegen") {
    val df = SparkEntry.queries("q83_char_entropy")(spark, sf("sf0.001"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), s"entropy fell out of codegen:\n$p")
    // one projection pass: the only exchange is the final order-by's
    // range partitioning — the scalar itself never shuffles
    val q = plan("q83_char_entropy")
    assert("""\(\d+\) Exchange""".r.findAllMatchIn(q).length <= 1,
      s"entropy projection should not shuffle except the final sort:\n$q")
  }

  test("snapshot diff: fingerprint mode projects the hash below the join") {
    // the shuffle must carry (key, 8-byte fp), not the full row
    val t = Tables(spark, sf("sf0.001"))
    val base = t.orders.select(org.apache.spark.sql.functions.col("o_orderkey"),
      org.apache.spark.sql.functions.col("o_orderstatus"),
      org.apache.spark.sql.functions.col("o_totalprice"))
    val df = graft.operators.Snapshot.diff(base, base, Seq("o_orderkey"),
      Seq("o_orderstatus", "o_totalprice"), fingerprint = true)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("xxhash64"), s"fingerprint not in plan:\n$p")
    assert(!p.toLowerCase.contains("cartesian"), s"cartesian diff:\n$p")
    // the full-row columns are pruned from both scans
    assert(!p.contains("o_comment"), s"unpruned scan:\n$p")
  }

  test("q85 source overlap joins digests, never text; matrix sides broadcast") {
    val p = plan("q85_source_overlap")
    // the self-join must match on the 16-byte digest with text pruned
    // out of the join: text feeds md5 inside the scan-side projection
    assert(p.contains("md5"), s"digest not computed:\n$p")
    val joinText = p.linesIterator
      .filter(l => l.contains("Join") && l.contains("text"))
    assert(joinText.isEmpty, s"join carries raw text:\n$p")
    // the sources-squared matrix is broadcast work, not an exchange
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"size matrix should be a broadcast nested loop:\n$p")
  }

  test("q87 weighted sample: rank<=k pre-prunes as WindowGroupLimit") {
    val p = plan("q87_weighted_sample")
    assert(p.contains("WindowGroupLimit"), s"rank pushdown missing:\n$p")
    // priority is pure projection work — exactly the rank's exchange
    // plus the final presentation sort
    assert("""\(\d+\) Exchange""".r.findAllMatchIn(p).length <= 2,
      s"unexpected shuffles:\n$p")
  }

  test("q84 psi: bin counts partially aggregate; totals/edges broadcast") {
    val p = plan("q84_psi_drift")
    assert(p.contains("partial_count") || p.contains("Partial"),
      s"bin counts not map-side combined:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"psi metadata joins must broadcast, not sort-merge:\n$p")
  }

  test("q90 pmi: top-k plans as TakeOrderedAndProject, not a global window") {
    val p = plan("q90_pmi")
    assert(p.contains("TakeOrderedAndProject"),
      s"limit not a distributed k-heap:\n$p")
    assert(!p.contains("Window"), s"unexpected window in pmi:\n$p")
  }

  test("q86 novelty and q92 trend: no cartesian, aggregates partial") {
    val p = plan("q86_ngram_novelty")
    assert(!p.toLowerCase.contains("cartesian"), s"cartesian novelty:\n$p")
    val q = plan("q92_trend")
    assert(q.contains("partial_count") || q.contains("Partial"),
      s"trend sums not map-side combined:\n$q")
    assert(!q.contains("Window"), s"trend must be window-free:\n$q")
  }

  test("q106 bm25: term filter precedes shuffles, df broadcast, top-k heaped") {
    val p = plan("q106_bm25")
    // the query-term IN filter must run before any aggregation shuffle —
    // at 100 TB it's the difference between shuffling the corpus and
    // shuffling the (tiny) matching postings
    assert(p.contains("TakeOrderedAndProject"),
      s"bm25 top-k not a distributed k-heap:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"df/corpus stats not broadcast:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct"),
      s"cartesian in bm25:\n$p")
    assert(p.contains("tok IN (") || p.contains("tok#"),
      s"term filter missing from plan:\n$p")
  }

  test("q107 bigram lm: LM joins at bigram/token grain, no cartesian") {
    val p = plan("q107_bigram_lm")
    assert(!p.toLowerCase.contains("cartesianproduct"),
      s"cartesian in bigram lm:\n$p")
    assert(p.contains("partial_count") || p.contains("Partial"),
      s"LM counts not map-side combined:\n$p")
  }

  test("q108 boilerplate: shingle df partial-aggregates, covered dedup at (doc,pos) grain") {
    val p = plan("q108_boilerplate")
    assert(!p.toLowerCase.contains("cartesianproduct"),
      s"cartesian in boilerplate:\n$p")
    assert(p.contains("partial_count") || p.contains("Partial"),
      s"df counts not map-side combined:\n$p")
  }

  test("q109 sq8: quantization stays per-row (no window/shuffle before score join)") {
    val p = plan("q109_sq8_knn")
    // reconstruction must be expression-only: the only Window is the
    // final per-query top-k over the scored frame
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"query side not broadcast:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct"),
      s"cartesian in sq8 scan:\n$p")
  }

  test("q110 pagerank: edge build joins at shingle grain, no cartesian") {
    // the rank loop truncates lineage per round (localCheckpoint), so
    // the final frame's plan is just the checkpointed scan — audit the
    // edge-construction stage directly instead (the data-sized part)
    import org.apache.spark.sql.functions.{col, explode, array, floor, lit}
    val t = Tables(spark, sf("sf0.001"))
    // the SAME block-keyed build production's langBlockedPairs uses —
    // the naive lang-join + range filter this replaced was a per-lang
    // cartesian before the filter
    val blk = (c: org.apache.spark.sql.Column) =>
      floor(c / lit(10)).cast("long")
    val d1 = t.documents.select(col("lang"), col("doc_id").as("id1"))
      .withColumn("blk", explode(array(blk(col("id1")), blk(col("id1")) + 1)))
    val d2 = t.documents.select(col("lang"), col("doc_id").as("id2"),
      blk(col("doc_id")).as("blk"))
    val pairs = d1.join(d2, Seq("lang", "blk"))
      .filter(col("id2") > col("id1") && col("id2") <= col("id1") + 10)
      .select(col("id1"), col("id2"))
    val e0 = graft.operators.Dedup
      .sharedShingleEdges(t.documents, pairs, "text", "doc_id")
    val p = e0.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(!p.toLowerCase.contains("cartesianproduct"),
      s"cartesian in pagerank edge build:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"pair build degenerated to a range join:\n$p")
    assert(p.contains("LeftSemi"),
      s"shared-shingle existence not a semi join:\n$p")
    // and the final frame stays cartesian-free end to end
    assert(!plan("q110_pagerank").toLowerCase.contains("cartesianproduct"))
  }

  test("q113 ahash: block-keyed EQUI pairing, no cartesian/range join") {
    val p = plan("q113_ahash_dup")
    assert(!p.toLowerCase.contains("cartesianproduct"),
      s"cartesian in ahash pairing:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"range join leaked into ahash pairing:\n$p")
  }

  test("q144 dhash: block-keyed EQUI pairing, no cartesian/range join") {
    val p = plan("q144_dhash_dup")
    assert(!p.toLowerCase.contains("cartesianproduct"),
      s"cartesian in dhash pairing:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"range join leaked into dhash pairing:\n$p")
  }

  test("q146 retrieval metrics: list-grain equi-joins, no cartesian") {
    val p = plan("q146_retrieval_metrics")
    assert(!p.toLowerCase.contains("cartesianproduct"),
      s"cartesian in retrieval metrics:\n$p")
    // knn scoring broadcasts the 8-query side; the truth join stays equi
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"),
      s"query side not broadcast:\n$p")
  }

  test("q148 min-cost supplier: correlated min decorrelated to ONE window, dims broadcast") {
    val p = plan("q148_min_cost_supplier")
    assert(p.contains("Window"), s"per-part min not a window:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"dims not broadcast:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct"))
    // the p_size filter reaches the part scan
    assert(p.contains("LessThan(p_size,10)") || p.contains("p_size"),
      s"part filter missing:\n$p")
  }

  test("q149 important parts: global threshold is a broadcast 1-row join, single agg grain") {
    val p = plan("q149_important_parts")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"),
      s"global total not broadcast back:\n$p")
    assert(!p.toLowerCase.contains("sortmergejoin"),
      s"1-row threshold join degenerated to a shuffle join:\n$p")
  }

  test("q114 ship priority: filters push to scans, dims broadcast, top-k heaped") {
    val p = plan("q114_ship_priority")
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"),
      s"segment filter not pushed:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k not a distributed heap:\n$p")
  }

  test("q121 dsir: LM joins at token grain, counts partial, no cartesian") {
    val p = plan("q121_dsir")
    assert(!p.toLowerCase.contains("cartesianproduct"),
      s"cartesian in dsir:\n$p")
    assert(p.contains("partial_count") || p.contains("Partial"),
      s"LM counts not map-side combined:\n$p")
  }

  test("q122 canonical: per-cluster argmax prunes as WindowGroupLimit") {
    val p = plan("q122_canonical")
    assert(p.contains("WindowGroupLimit"),
      s"rn=1 argmax not group-limit pruned:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct"),
      s"cartesian in canonical selection:\n$p")
  }

  test("q127 exact quantiles: value-grain partial agg feeds the window, no row sort") {
    val p = plan("q127_exact_quantiles")
    // the (lang, value) count must combine map-side BEFORE any exchange
    assert(p.contains("partial_count") || p.contains("Partial"),
      s"value-grain count not map-side combined:\n$p")
    // the quantile path itself must sort only WITHIN the lang-keyed
    // window (hashpartitioning); the sole range exchange allowed is the
    // final presentation orderBy over the (lang, q) result rows
    assert(p.sliding("rangepartitioning".length).count(
      _ == "rangepartitioning") <= 1,
      s"global sort leaked into quantile path:\n$p")
    assert(p.contains("hashpartitioning(lang"),
      s"quantile window not keyed by group:\n$p")
  }

  test("q129 interval join: bucket equi-join, never a nested loop") {
    val p = plan("q129_interval_join")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.toLowerCase.contains("cartesianproduct"),
      s"range join fell back to all-pairs:\n$p")
  }

  test("q130 zipf: top-N cut is a distributed heap, not a global sort") {
    val p = plan("q130_zipf")
    assert(p.contains("TakeOrderedAndProject"),
      s"vocabulary top-N not heap-pruned:\n$p")
  }

  test("q131 blocklist: suffix join broadcasts the blocklist side") {
    val p = plan("q131_blocklist")
    assert(p.contains("BroadcastHashJoin"),
      s"blocklist not broadcast:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"suffix match leaked a nested loop:\n$p")
  }

  test("q161 local-supplier volume: dims broadcast, date filter pushed to orders scan") {
    val p = plan("q161_local_supplier_volume")
    assert(p.contains("BroadcastHashJoin"), s"dims not broadcast:\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      s"date filter not pushed into orders scan:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian leaked:\n$p")
  }

  test("q163/q164: part/priority filters prune facts before the big joins") {
    val p9 = plan("q163_product_profit")
    assert(p9.contains("EqualTo(p_type,PROMO)"),
      s"part-type filter not pushed:\n$p9")
    val p10 = plan("q164_returned_customers")
    assert(p10.contains("EqualTo(l_returnflag,R)"),
      s"returnflag filter not pushed:\n$p10")
    assert(p10.contains("TakeOrderedAndProject"),
      s"top-20 not heap-pruned:\n$p10")
  }

  test("q169 jaro-winkler: blocked pairing is an equi-join, top-k prunes as group limit") {
    val p = plan("q169_jaro_winkler")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"pair build fell back to all-pairs:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"top-k per left id not group-limit pruned:\n$p")
  }

  test("q172 random projection: narrow per-row map, no shuffle before presentation sort") {
    val p = plan("q172_random_projection")
    // the only exchange allowed is the final orderBy (rangepartitioning)
    assert(!p.contains("hashpartitioning"),
      s"projection introduced a data shuffle:\n$p")
  }

  test("q174 co-purchase lift: marginals broadcast back onto the pair frame") {
    val p = plan("q174_copurchase_lift")
    assert(!p.contains("CartesianProduct"), s"cartesian leaked:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"marginals not broadcast:\n$p")
  }

  test("q184 order priority: EXISTS decorrelates to a real LeftSemi, date filter pushed") {
    val p = plan("q184_order_priority")
    assert(p.contains("LeftSemi"), s"no semi join:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"),
      s"order date bracket not pushed to the scan:\n$p")
  }

  test("q185 market share: nation tags broadcast, one conditional-sum pass") {
    val p = plan("q185_market_share")
    assert(p.contains("BroadcastHashJoin"), s"dims not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian leaked:\n$p")
  }

  test("q187 top supplier: scalar max via checkpoint reuse — lineitem scanned once") {
    val p = plan("q187_top_supplier")
    val scans = p.split('\n').count(l =>
      l.contains("Scan parquet") && l.contains("lineitem"))
    assert(scans <= 1, s"lineitem scanned $scans times:\n$p")
  }

  test("q190 disjunctive revenue: factored quantity bound pushed into the scan") {
    val p = plan("q190_disjunctive_revenue")
    assert(p.contains("GreaterThanOrEqual(l_quantity,1.0), LessThanOrEqual(l_quantity,36.0)"),
      s"common qty bound not pushed:\n$p")
  }

  test("q192 waiting suppliers: one fact join feeds both branches — no triple self-join") {
    val p = plan("q192_waiting_suppliers")
    val scans = p.split('\n').count(l =>
      l.contains("Scan parquet") && l.contains("lineitem"))
    assert(scans <= 1, s"lineitem scanned $scans times:\n$p")
  }

  test("q197 bottom-k sample: rank<=k pre-prunes as WindowGroupLimit") {
    val p = plan("q197_bottomk_sample")
    assert(p.contains("WindowGroupLimit"),
      s"bottom-k not group-limit pruned:\n$p")
  }

  test("q195 interval overlap: bucketed equi-join, never a nested-loop range join") {
    val p = plan("q195_interval_overlap")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"range join fell back to all-pairs:\n$p")
  }

  /** The BloomFilterMightContain probe must sit BELOW every exchange —
    * a FilterExec whose own subtree holds no shuffle, i.e. it filters
    * the scan output before rows are ever serialized for the network.
    * That pre-exchange placement is the whole point of JoinPrune. */
  private def assertProbePreExchange(name: String): Unit = {
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val df = SparkEntry.queries(name)(spark, sf("sf0.001"))
    val p = df.queryExecution.sparkPlan
    val probes = p.collect {
      case f: FilterExec
        if f.condition.exists(_.isInstanceOf[BloomFilterMightContain]) => f
    }
    assert(probes.nonEmpty, s"$name: no might_contain probe in plan:\n$p")
    probes.foreach { f =>
      val below = f.collect { case e: ShuffleExchangeLike => e }
      assert(below.isEmpty,
        s"$name: bloom probe sits above an exchange — prune is wasted:\n$p")
    }
  }

  test("q227 bloom semi join: might_contain probe filters before the exchange") {
    assertProbePreExchange("q227_bloom_semi_join")
  }

  test("q161 rewired through bloomPrune: probe pre-exchange on the lineitem scan") {
    assertProbePreExchange("q161_local_supplier_volume")
  }

  /** The bucketing contract: two tables bucketed on their join keys
    * with the same bucket count must join as a sort-merge join whose
    * subtree holds NO shuffle — the scan's HashPartitioning satisfies
    * the join's distribution requirement. Broadcast is disabled so the
    * tiny test tables don't take the BHJ shortcut that hides the
    * property this layout exists for. */
  test("q228 bucketed join: sort-merge join with no exchange below it") {
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("q228_bucketed_join")(spark, sf("sf0.001"))
      val p = df.queryExecution.sparkPlan
      val smjs = p.collect { case j: SortMergeJoinExec => j }
      assert(smjs.nonEmpty, s"expected a sort-merge join:\n$p")
      smjs.foreach { j =>
        assert(j.collect { case e: ShuffleExchangeLike => e }.isEmpty,
          s"bucketed join still shuffles — layout contract broken:\n$p")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
  }

  /** q172 regression guard: interpreted expression trees (HOFs and
    * anything else CodegenFallback) in per-row hot paths degrade
    * megamorphically in long suites — round 13 measured the nested-HOF
    * JL projection at 25.4s in-suite vs 1.4s isolated at ×100. The hot
    * per-document/per-vector projections must contain ZERO
    * CodegenFallback expressions, so a refactor that reintroduces an
    * interpreted form fails here by name instead of costing a bench
    * investigation. The guarded plans are shuffle-free projections, so
    * no AQE wrapper complicates the traversal. */
  test("hot vector/text projections contain no CodegenFallback expressions") {
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    import org.apache.spark.sql.functions._
    def fallbacks(df: DataFrame): Seq[String] =
      df.queryExecution.executedPlan.flatMap(_.expressions.flatMap(
        _.collect { case f: CodegenFallback => f.prettyName })).distinct
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val guarded = Seq(
      "randomProjection (JL)" ->
        operators.Similarity.randomProjection(emb, "vec_id", "embedding",
          k = 4),
      "cosine scoring (vec_dot/vec_norm)" -> {
        GraftExtensions.register(spark)
        emb.select(col("vec_id"), expr(
          "graft_vec_dot(embedding, embedding) / " +
            "(graft_vec_norm(embedding) * graft_vec_norm(embedding))"))
      },
      "qualityScore battery" ->
        operators.TextAnalysis.qualityScore(
          docs.select(col("doc_id"), col("text")), "text"),
      "langId" -> docs.select(
        operators.TextAnalysis.langId(col("text")).as("lang")))
    guarded.foreach { case (name, df) =>
      val bad = fallbacks(df)
      assert(bad.isEmpty,
        s"$name: interpreted (CodegenFallback) expressions in the hot " +
          s"path: ${bad.mkString(", ")}\n" +
          df.queryExecution.executedPlan.toString)
    }
  }

  test("q233 exact substr: gram agg partial, semi join, no pair grain") {
    val p = plan("q233_exact_substr")
    // repeated-gram detection must be a map-side-combinable aggregate
    // followed by a LeftSemi back onto positions — never any join that
    // could manufacture doc-pair rows
    assert(p.contains("LeftSemi"), s"semi join lost:\n$p")
    assert(p.contains("partial_count") || p.contains("Partial"),
      s"gram counts not map-side combined:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct"),
      s"cartesian in exact-substr:\n$p")
  }

  test("q234 sketch rollup: both levels ride partial aggregates") {
    val df = SparkEntry.queries("q234_sketch_rollup")(spark, sf("sf0.001"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // in-flight builds AND stored-state merges must both plan as
    // two-phase aggregates (buffer-sized partials through the exchange)
    for (fn <- Seq("partial_graft_kmv_state", "partial_graft_cms",
        "partial_graft_hdr", "partial_graft_kmv_merge",
        "partial_graft_cms_merge", "partial_graft_hdr_merge"))
      assert(p.contains(fn), s"$fn missing:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct"),
      s"cartesian in sketch rollup:\n$p")
  }
}

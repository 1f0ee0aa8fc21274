package graft.operators

import graft.GraftCheckpointOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph analytics over join-derived edge lists — the similarity /
  * link graphs a curation pipeline builds (LSH candidate pairs, shared
  * n-grams, citation links) rather than a graph it is given. Pregel-ish
  * iteration expressed as DataFrame joins: each round is one
  * (src-keyed) join plus one (dst-keyed) aggregation, so Catalyst
  * plans partial aggregation and AQE sizes the shuffles; lineage is
  * truncated per round with a lazy local checkpoint (the bounded-round
  * discipline the k-means and BPE loops already use).
  */
object GraphOps {

  /** Per-destination in-mass for one synchronous round: src-sorted
    * IEEE fold (oracle-replayable bit-for-bit) or plain partial-agg sum
    * for scale. Shared by [[pageRank]] and [[personalizedPageRank]] so
    * the fold semantics cannot diverge between them. */
  private def massOf(contribs: DataFrame,
      deterministicFold: Boolean): DataFrame =
    if (deterministicFold)
      contribs.groupBy(col("dst"))
        .agg(sort_array(collect_list(
          struct(col("src"), col("contrib")))).as("arr"))
        .select(col("dst"),
          aggregate(col("arr"), lit(0.0d),
            (acc, x) => acc + x.getField("contrib")).as("m"))
    else
      contribs.groupBy(col("dst")).agg(sum(col("contrib")).as("m"))

  /** PageRank (Brin & Page 1998) over a directed edge list, `iters`
    * synchronous rounds of
    * `r' = (1−d)/N + d · Σ_{u→v} r(u)/outdeg(u)`.
    *
    * Vertex set = distinct edge endpoints. On a symmetrized
    * (undirected) graph every vertex has out-degree ≥ 1, so no
    * dangling-mass correction is needed; on a digraph with sinks the
    * leaked mass simply damps the total (documented standard variant —
    * ranks remain comparable, they just don't sum to 1).
    *
    * Scale shape per round: ONE shuffle joining ranks to edges on src
    * (edges carry their precomputed out-degree, materialized once),
    * one aggregation at dst grain, one vertex-grain left join to
    * re-attach rank-zero-in-degree vertices. `deterministicFold = true`
    * folds each vertex's in-mass in src-sorted order so the IEEE-754
    * sum has exactly one order (oracle-replayable bit-for-bit at the
    * 6-dp round); at 100 TB pass `false` for a plain partial-agg sum —
    * same plan shape minus the sort, FP-associativity nondeterminism
    * accepted like any distributed float sum. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 5, damping: Double = 0.85,
      deterministicFold: Boolean = true,
      checkpointInterval: Int = 4): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(checkpointInterval >= 1, "checkpointInterval must be >= 1")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .graftCp(false)
    // ONE degree aggregation yields the vertex set, out-degrees and the
    // no-in-edge set together — one shuffle and one materialization
    // where three separate derivations would each pay their own
    val deg = e.select(col("src").as("id"), lit(1L).as("od"), lit(0L).as("ind"))
      .unionByName(e.select(col("dst").as("id"), lit(0L).as("od"),
        lit(1L).as("ind")))
      .groupBy(col("id"))
      .agg(sum(col("od")).as("outdeg"), sum(col("ind")).as("indeg"))
      .graftCp(false)
    val n = deg.count() // metadata-plane scalar (rank normalization)
    val verts = deg.select(col("id"))
    val ew = e.join(deg.select(col("id").as("src"), col("outdeg")),
        Seq("src"))
      .graftCp(false) // edges + degrees materialize ONCE
    val base = (1.0 - damping) / n
    // Loop-invariant: a vertex with NO in-edges holds rank (1−d)/N
    // after every round. Materializing that set once removes the
    // vertex-grain left join from every iteration — each round is just
    // the src join + the dst aggregation, two shuffles instead of
    // three.
    val noIn = deg.filter(col("indeg") === 0L)
      .select(col("id"), lit(base).as("r"))
    var ranks = verts.select(col("id"), lit(1.0 / n).as("r"))
    for (i <- 1 to iters) {
      val contribs = ew
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst"), col("src"),
          (col("r") / col("outdeg")).as("contrib"))
      val mass = massOf(contribs, deterministicFold)
      ranks = mass
        .select(col("dst").as("id"),
          (lit(base) + lit(damping) * col("m")).as("r"))
        .unionByName(noIn)
      // Truncate lineage periodically, not per round: a handful of
      // rounds of join depth is cheap to re-derive, while a checkpoint
      // costs a full materialization barrier each time.
      if (i % checkpointInterval == 0 && i < iters)
        ranks = ranks.graftCp(false)
    }
    ranks.select(col("id"), round(col("r"), 6).as("pagerank"))
  }

  /** Personalized PageRank (random walk with restart to a seed set):
    * `r' = (1−d)·s(v) + d · Σ_{u→v} r(u)/outdeg(u)` with `s` uniform
    * over `seedIds ∩ vertices` — relevance-to-the-seeds instead of
    * global centrality; the retrieval-expansion primitive ("documents
    * near these known-good ones in the similarity graph").
    *
    * Seeds are few by contract (they arrive as literals, the same way
    * query terms do), so the restart term is a pure `isin` expression —
    * each round keeps the two-shuffle shape of [[pageRank]]. Vertices
    * with zero rank are carried implicitly (they contribute exactly
    * 0.0, which is a no-op in any IEEE fold) and re-attached once at
    * the end. Same deterministic-fold / checkpoint-interval contract as
    * [[pageRank]]. */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
      seedIds: Seq[Long], iters: Int = 5, damping: Double = 0.85,
      deterministicFold: Boolean = true,
      checkpointInterval: Int = 4): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(seedIds.nonEmpty, "seedIds must be non-empty")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .graftCp(false)
    val deg = e.select(col("src").as("id"), lit(1L).as("od"))
      .unionByName(e.select(col("dst").as("id"), lit(0L).as("od")))
      .groupBy(col("id")).agg(sum(col("od")).as("outdeg"))
      .graftCp(false)
    val verts = deg.select(col("id"))
    val seedV = deg.filter(col("id").isin(seedIds: _*)).select(col("id"))
      .graftCp(false)
    val nS = seedV.count()
    require(nS > 0, "no seed is a vertex of the graph")
    val resetVal = (1.0 - damping) / nS
    val ew = e.join(deg.select(col("id").as("src"), col("outdeg")),
        Seq("src"))
      .graftCp(false)
    // the restart mass lands on every seed every round, whether or not
    // the seed received walk mass this round — a constant frame unioned
    // in and re-aggregated (the two summands per vertex commute, so the
    // deterministic-fold contract is preserved bit-for-bit)
    val seedsConst = seedV.select(col("id"), lit(resetVal).as("r"))
      .graftCp(false)
    var ranks = seedV.select(col("id"), lit(1.0 / nS).as("r"))
    for (i <- 1 to iters) {
      val contribs = ew
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst"), col("src"),
          (col("r") / col("outdeg")).as("contrib"))
      val mass = massOf(contribs, deterministicFold)
      ranks = mass
        .select(col("dst").as("id"), (lit(damping) * col("m")).as("r"))
        .unionByName(seedsConst)
        .groupBy(col("id")).agg(sum(col("r")).as("r"))
      if (i % checkpointInterval == 0 && i < iters)
        ranks = ranks.graftCp(false)
    }
    verts.join(ranks, Seq("id"), "left")
      .select(col("id"),
        round(coalesce(col("r"), lit(0.0d)), 6).as("ppr"))
  }

  /** Degree report for an edge list: per-vertex in/out/total degree —
    * the first profiling pass over any derived graph (skew check before
    * iterating on it). One union + one partial-agg count. */
  def degrees(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges.select(col(srcCol).as("id"), lit(1L).as("out_d"), lit(0L).as("in_d"))
      .unionByName(edges.select(col(dstCol).as("id"), lit(0L).as("out_d"),
        lit(1L).as("in_d")))
      .groupBy(col("id"))
      .agg(sum(col("out_d")).as("out_degree"),
        sum(col("in_d")).as("in_degree"),
        count(lit(1)).as("degree"))

  /** Per-node triangle counts of the undirected graph: edges
    * canonicalize to a<b, triangles enumerate as the two-join wedge
    * closure e(a,b)⋈e(b,c)⋈e(a,c) with a<b<c — each triangle
    * materializes exactly once, then credits all three corners.
    *
    * The join keys are vertex ids, so both shuffles co-partition on a
    * vertex; the classic refinement for power-law skew (orient each
    * edge from its lower-DEGREE endpoint so wedge lists are bounded by
    * the smaller degree) drops in by replacing the a<b orientation —
    * the id ordering is the right default while no degree histogram
    * says otherwise. */
  def triangleCounts(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val e = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .graftCp(false)
    val wedges = e.select(col("a"), col("b"))
      .join(e.select(col("a").as("b"), col("b").as("c")), Seq("b"))
    val tris = wedges.join(e.select(col("a"), col("b").as("c")),
      Seq("a", "c"))
    tris.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_triangles"))
  }
}

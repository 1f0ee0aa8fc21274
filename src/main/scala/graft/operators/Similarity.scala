package graft.operators

import graft.GraftCheckpointOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GF

/** Similarity search over an embedding column `array<float>` (north-star
  * ops; BASELINE.json).
  *
  * - Brute-force cosine top-k: the correctness baseline. Queries are
  *   broadcast; candidates stream — one pass over the big side, a
  *   partial top-k per partition via window over (query, -sim).
  * - LSH-bucketed ANN (random hyperplanes): the 100 TB path. Signatures
  *   are deterministic (hyperplane signs derived from the portable
  *   hash), so buckets — and therefore results — are reproducible by an
  *   external oracle.
  *
  * All vector math uses zip_with/aggregate higher-order functions:
  * codegen'd, no UDF, no driver collect.
  */
object Similarity {

  /** Sum of element-wise products, computed in double. Runs on the
    * native allocation-free `VecDotExpr`: the same sequential fold as
    * the zip_with+aggregate composition (bit-identical results — the
    * DuckDB oracles still hash-match) without materializing an
    * intermediate product array per evaluated pair, and exposed to
    * plain SQL as `graft_vec_dot`. */
  def dot(a: Column, b: Column): Column = {
    graft.GraftExtensions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("graft_vec_dot", a, b)
  }

  def norm(a: Column): Column = {
    graft.GraftExtensions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("graft_vec_norm", a)
  }

  /** The higher-order-function forms (kept as executable documentation
    * of the fold order the native expressions reproduce, and asserted
    * bit-equal in ExtensionsSpec). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  def normHof(a: Column): Column =
    sqrt(aggregate(a.cast("array<double>"), lit(0.0), (acc, v) => acc + v * v))

  /** Cosine similarity; null-safe on zero vectors. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(norm(a) * norm(b), lit(0.0))

  /** Brute-force cosine top-k: for each query vector, the k most similar
    * candidates (excluding itself). Ranking uses the *rounded* similarity
    * plus the candidate id as tie-break so results are stable across
    * engines and runs. `queries` must be small (it is broadcast). */
  def bruteForceKnn(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    // norms are precomputed per side so each vector is normalized once,
    // not once per (query, candidate) pair; numerically identical to
    // inline cosine (same fold, same division).
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn"))
    val c = candidates.select(col(idCol).as("cand_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .withColumn("sim",
        round(dot(col("qv"), col("cv")) /
          nullif(col("qn") * col("cn"), lit(0.0)), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cand_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("sim"), col("rank"))
  }

  /** Deterministic ±1 hyperplane component for (bit j, dimension d):
    * sign of the portable hash of "j_d". Computed ONCE in Scala (same
    * md5 an external oracle computes in SQL) — the hot path multiplies
    * against a literal array instead of hashing 64 strings per row. */
  private def planeSigns(j: Int, dims: Int): Seq[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until dims).map { d =>
      val hex = md.digest(s"${j}_$d".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0 else -1.0
    }
  }

  /** Projection of a vector onto deterministic hyperplane j, as a
    * *sequential* fold over dimensions (zip_with + aggregate) — no
    * shuffle, and the FP summation order is pinned so external oracles
    * reproduce the sign bit-for-bit. */
  def planeProjection(vec: Column, j: Int, dims: Int = 64): Column =
    dot(vec, typedLit(planeSigns(j, dims)))

  /** Random-hyperplane LSH signature: an integer bucket from `nBits` sign
    * bits of hyperplane projections. Pure per-row expression work —
    * zero shuffles, fully codegen'd. */
  /** The bucket integer from `nBits` hyperplane sign bits. */
  def lshBucketExpr(vec: Column, nBits: Int, dims: Int = 64): Column =
    (0 until nBits).map(j =>
      when(planeProjection(vec, j, dims) > 0, lit(1L << j)).otherwise(0L))
      .reduce(_ + _)

  def lshSignature(vectors: DataFrame, idCol: String, vecCol: String,
      nBits: Int, dims: Int = 64): DataFrame =
    vectors.select(col(idCol),
      lshBucketExpr(col(vecCol), nBits, dims).as("bucket"))

  /** Adaptive-depth LSH blocking for all-pairs-within-block consumers
    * ([[cosineNearDupPairs]]): start at `baseBits` hyperplane bits and
    * REFINE only the over-cap blocks with more bits of the SAME
    * deterministic hyperplane family (bit j of a deeper bucket is the
    * same plane-j sign, so a (b+k)-bit bucket exactly sub-splits its
    * b-bit parent). Fixed-depth blocking is a scale bug: with 2^b
    * blocks pinned, within-block pair volume grows as (n/2^b)² — the
    * ×100 scaling run measured a fixed-8-bit semantic-dedup stage at
    * 187M candidate pairs / ×121 per-decade growth. Adaptive depth
    * bounds blocks at `maxBlockSize`, so pair volume stays ~n·cap/2
    * while under-cap regions keep their shallow (higher-recall)
    * blocks — only dense regions pay extra splitting (which is also
    * the skew story: one hot region refines deeper, the rest don't).
    *
    * Appends `blkCol` (long): bucket | bits<<24 — the depth rides in
    * the key so same-valued buckets of different depths never collide.
    * Blocks of mutually sign-identical vectors (true duplicates) stop
    * refining at `maxBits`; their all-pairs output is the requested
    * answer, not an artifact. Per level: one metadata-scale
    * bucket-grain count (partial-aggregatable) + one broadcast
    * semi/anti split — healthy corpora take level 0 only.
    *
    * Recall note: refinement can only LOSE pairs that differ in a
    * refined bit — the same tradeoff the base blocking already makes;
    * under-cap blocks are byte-identical to fixed-depth blocking, so
    * small-corpus results (and the q65 oracle) are unchanged. */
  def adaptiveLshBlocks(vectors: DataFrame, vecCol: String,
      blkCol: String, baseBits: Int, maxBlockSize: Int = 256,
      refineStep: Int = 2, maxBits: Int = 20, dims: Int = 64): DataFrame = {
    require(baseBits >= 1 && baseBits <= maxBits,
      s"baseBits=$baseBits out of [1, $maxBits]")
    require(maxBlockSize >= 1 && refineStep >= 1, "cap/step must be >= 1")
    def key(bits: Int): Column =
      lshBucketExpr(col(vecCol), bits, dims) + lit(bits.toLong << 24)
    var done: Option[DataFrame] = None
    var rest = vectors.withColumn(blkCol, key(baseBits))
      .graftCp(false)
    var bits = baseBits
    while (rest != null) {
      val overCap = rest.groupBy(col(blkCol))
        .agg(count(lit(1)).as("_n"))
        .filter(col("_n") > maxBlockSize)
        .select(col(blkCol))
        .graftCp(true) // metadata-scale; decides refinement
      val under = rest.join(broadcast(overCap), Seq(blkCol), "left_anti")
      done = Some(done.map(_.unionByName(under)).getOrElse(under))
      if (overCap.isEmpty || bits >= maxBits) {
        // maxBits floor: irreducible (sign-identical) blocks stay whole
        if (!overCap.isEmpty)
          done = Some(done.get.unionByName(
            rest.join(broadcast(overCap), Seq(blkCol), "left_semi")))
        rest = null
      } else {
        bits = math.min(bits + refineStep, maxBits)
        rest = rest.join(broadcast(overCap), Seq(blkCol), "left_semi")
          .withColumn(blkCol, key(bits))
          .graftCp(false)
      }
    }
    done.get
  }

  /** ANN via LSH buckets: exact cosine top-k *within* each query's
    * bucket. Recall < 1 by construction; at scale, candidates shrink by
    * ~2^nBits so the join is cheap and shuffles only on the bucket key. */
  def lshKnn(vectors: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, nBits: Int, k: Int, dims: Int = 64): DataFrame = {
    // signature computed once and materialized via lazy localCheckpoint
    // (GC-released, unlike cache()): both join sides reference it, and
    // it is tiny (id, bucket) relative to its lineage.
    val withSig = vectors
      .withColumn("bucket", lshBucketExpr(col(vecCol), nBits, dims))
      .select(col(idCol), col(vecCol), col("bucket"),
        norm(col(vecCol)).as("nrm"))
      .graftCp(false)
    val cand = withSig.select(col(idCol).as("cand_id"), col(vecCol).as("cv"),
      col("bucket"), col("nrm").as("cn"))
    val q = queries.select(col(idCol))
      .join(withSig, Seq(idCol))
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        col("bucket"), col("nrm").as("qn"))
    val scored = cand.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("sim",
        round(dot(col("qv"), col("cv")) /
          nullif(col("qn") * col("cn"), lit(0.0)), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("sim"), col("rank"))
  }

  /** Multi-probe LSH ANN: queries probe their own bucket PLUS the
    * buckets reached by flipping the (probes−1) hyperplane bits with
    * the smallest |projection| margin — the bits most likely to have
    * landed on the wrong side for a true neighbor. The classic recall
    * lever that does NOT grow the index: candidates still live in
    * exactly one bucket each; only the (tiny, broadcast) query side
    * fans out ×probes. probes=1 is bit-identical to [[lshKnn]].
    *
    * Margin ranking is deterministic (ties broken by bit index) and
    * every arithmetic step — projection fold, abs, sort — is the same
    * sequential form an external oracle replays, so the probed bucket
    * SET agrees across engines exactly. */
  def lshMultiProbeKnn(vectors: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, nBits: Int, k: Int, probes: Int,
      dims: Int = 64): DataFrame = {
    require(probes >= 1 && probes <= nBits + 1,
      s"probes=$probes out of [1, ${nBits + 1}]")
    val withSig = vectors
      .withColumn("bucket", lshBucketExpr(col(vecCol), nBits, dims))
      .select(col(idCol), col(vecCol), col("bucket"),
        norm(col(vecCol)).as("nrm"))
      .graftCp(false)
    val cand = withSig.select(col(idCol).as("cand_id"),
      col(vecCol).as("cv"), col("bucket"), col("nrm").as("cn"))
    // per-query probe masks: 0 (the home bucket) plus single-bit flips
    // of the smallest-margin planes, ranked by (|proj|, bit index)
    val entries = array((0 until nBits).map(j =>
      struct(abs(planeProjection(col(vecCol), j, dims)).as("a"),
        lit(j).as("j"), lit(1L << j).as("mask"))): _*)
    val masks = concat(array(lit(0L)),
      transform(slice(array_sort(entries), 1, probes - 1),
        s => s.getField("mask")))
    val q = queries.select(col(idCol))
      .join(withSig, Seq(idCol))
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        col("bucket").as("qbucket"), col("nrm").as("qn"),
        explode(masks).as("mask"))
      .withColumn("bucket", col("qbucket").bitwiseXOR(col("mask")))
      .drop("qbucket", "mask")
    val scored = cand.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("sim",
        round(dot(col("qv"), col("cv")) /
          nullif(col("qn") * col("cn"), lit(0.0)), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("sim"), col("rank"))
  }

  /** IVF (inverted-file) ANN: a coarse quantizer assigns every vector to
    * its nearest centroid ("cell"); a query searches only its cell's
    * posting list — the classic IVF-flat structure. At 100 TB the
    * posting lists are the partition layout: probing one cell touches
    * 1/nCells of the data and shuffles nothing (cell is the key).
    *
    * The quantizer here derives centroids from a seed column (e.g. a
    * label or a previous clustering's assignment): centroid = per-cell
    * dimension means rounded to 4 decimals. Rounding makes assignment
    * reproducible across engines (an external oracle recomputes the
    * exact same centroids) — a production deployment would load k-means
    * centroids the same way.
    */
  /** `nProbe` > 1 widens the QUERY side to its best-n cells (recall
    * knob); candidate vectors always live in exactly one posting list,
    * as in IVF-flat. */
  /** Per-cell centroid rows `(cell, centroid, cnrm)`: mean per
    * (cell, dimension), rounded to 4 decimals — partial-aggregatable
    * avg over the posexploded dims. Rounding makes assignment
    * reproducible across engines. */
  private def centroidRows(vectors: DataFrame, vecCol: String,
      cellCol: String): DataFrame =
    vectors.select(col(cellCol).as("cell"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("d", "x")))
      .groupBy(col("cell"), col("d"))
      .agg(round(avg(col("x")), 4).as("c"))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("d"), col("c")))).as("dc"))
      .select(col("cell"),
        transform(col("dc"), s => s.getField("c")).as("centroid"),
        norm(transform(col("dc"), s => s.getField("c"))).as("cnrm"))

  /** ONE row holding every centroid (sorted by cell id) so assignment
    * is a per-row array fold against a broadcast literal. */
  private def toCentArr(rows: DataFrame): DataFrame =
    rows.agg(array_sort(collect_list(struct(col("cell"),
        col("centroid"), col("cnrm")))).as("cents"))
      .graftCp(false)

  /** Scored (csim, cell) structs per centroid, materialized in their
    * own projection so the cosine fold runs once per centroid, not per
    * fold-step. */
  private def scoredCells(vec: String): Column =
    transform(col("cents"), c =>
      struct(
        round(dot(col(vec), c.getField("centroid")) /
          nullif(col("vnrm") * c.getField("cnrm"), lit(0.0)), 6)
          .as("csim"),
        c.getField("cell").as("cell")))

  /** Assignment: nearest centroid by rounded cosine, ties to the LOWEST
    * cell id — a strictly-greater fold over the cell-ordered centroid
    * array. Zero shuffle: one broadcast-nested-loop join against the
    * single centroid row, then pure codegen'd expression work per row
    * (the old row_number-window argmax shuffled N×nCells rows). */
  private def assignCells(df: DataFrame, id: String, vec: String,
      centArr: DataFrame,
      cellType: org.apache.spark.sql.types.DataType): DataFrame =
    df.select(col(id), col(vec), norm(col(vec)).as("vnrm"))
      .crossJoin(broadcast(centArr))
      .withColumn("scored", scoredCells(vec))
      .withColumn("best", aggregate(col("scored"),
        struct(lit(-2.0).as("csim"), lit(null).cast(cellType).as("cell")),
        (acc, x) =>
          when(x.getField("csim") > acc.getField("csim"), x).otherwise(acc)))
      .select(col(id), col(vec), col("best").getField("cell").as("cell"))

  /** Top-nProbe cells per query: sort the scored array by
    * (csim desc, cell asc) and take the first n — still zero-shuffle. */
  private def assignTopN(df: DataFrame, id: String, vec: String,
      centArr: DataFrame, n: Int): DataFrame =
    df.select(col(id), col(vec), norm(col(vec)).as("vnrm"))
      .crossJoin(broadcast(centArr))
      .withColumn("scored", scoredCells(vec))
      .withColumn("top", slice(array_sort(col("scored"), (l, r) =>
        when(l.getField("csim") > r.getField("csim"), -1)
          .when(l.getField("csim") < r.getField("csim"), 1)
          .when(l.getField("cell") < r.getField("cell"), -1)
          .when(l.getField("cell") > r.getField("cell"), 1)
          .otherwise(0)), 1, n))
      .select(col(id), col(vec), explode(col("top")).as("probe"))
      .select(col(id), col(vec), col("probe").getField("cell").as("cell"))

  /** Exact cosine top-k of broadcast queries against cell-matched
    * candidates (the scoring tail shared by every IVF entry point). */
  private def ivfScoreTopK(cand: DataFrame, q: DataFrame,
      k: Int): DataFrame = {
    val scored = cand.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("sim",
        round(dot(col("qv"), col("cv")) /
          nullif(col("qn") * col("cn"), lit(0.0)), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("sim"), col("rank"))
  }

  /** Label-free coarse quantizer: Lloyd's k-means expressed entirely as
    * DataFrame aggregations — no label column, no MLlib, no driver-side
    * vectors. Seeding is deterministic (cell = portable 32-bit hash of
    * the id, mod k) and every iteration re-uses the IVF machinery:
    * centroids = per-cell dimension means rounded to 4 decimals
    * ([[centroidRows]] — one partial-aggregatable job), assignment =
    * zero-shuffle broadcast-literal cosine fold ([[assignCells]]).
    * Deterministic seed + rounded centroids + rounded-cosine
    * lowest-cell tie-break make every iteration reproducible across
    * engines (the q54 DuckDB oracle replays it move for move).
    *
    * Scale: per iteration ONE shuffle (the centroid partial-agg, k×dims
    * rows out) + a map-only assignment pass — no per-point driver work,
    * so iterations cost O(scan), independent of k beyond the broadcast
    * literal. Returns `(idCol, vecCol, cell: int)`. */
  def kmeansCells(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    val seeded = vectors.select(col(idCol), col(vecCol),
      (GF.hash32(col(idCol).cast("string")) % k).cast("int").as("cell"))
    (1 to iters).foldLeft(seeded) { (assigned, _) =>
      val centArr = toCentArr(centroidRows(assigned, vecCol, "cell"))
      assignCells(vectors.select(col(idCol), col(vecCol)), idCol, vecCol,
        centArr, org.apache.spark.sql.types.IntegerType)
    }
  }

  def ivfKnn(vectors: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, cellCol: String, k: Int, dims: Int = 64,
      nProbe: Int = 1): DataFrame = {
    val centArr = toCentArr(centroidRows(vectors, vecCol, cellCol))
    val cellType = vectors.schema(cellCol).dataType
    val cand = assignCells(vectors, idCol, vecCol, centArr, cellType)
      .select(col(idCol).as("cand_id"), col(vecCol).as("cv"), col("cell"),
        norm(col(vecCol)).as("cn"))
    val qAssigned =
      if (nProbe <= 1) assignCells(queries, idCol, vecCol, centArr, cellType)
      else assignTopN(queries, idCol, vecCol, centArr, nProbe)
    val q = qAssigned
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("cell"),
        norm(col(vecCol)).as("qn"))
    ivfScoreTopK(cand, q, k)
  }

  /** Persist an IVF-flat index: the posting lists become the DISK
    * layout — vectors parquet-partitioned by their assigned cell, plus
    * a centroid sidecar. At 100 TB this is the difference between an
    * ANN query scanning the corpus and reading 1/nCells of it: a probe
    * is a partition-pruned read of its cell directories (asserted in
    * ScaleSpec), the same pruning contract as SeriesLake. Norms are
    * precomputed at build time so probes skip the fold. */
  def writeIvfIndex(vectors: DataFrame, idCol: String, vecCol: String,
      cellCol: String, path: String): Unit = {
    val cents = centroidRows(vectors, vecCol, cellCol)
    cents.coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    val centArr = toCentArr(cents)
    val cellType = vectors.schema(cellCol).dataType
    assignCells(vectors, idCol, vecCol, centArr, cellType)
      .withColumn("nrm", norm(col(vecCol)))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/postings")
  }

  /** Deterministic one-row-per-id within a batch (crawl feeds repeat
    * ids): keep the row with the smallest full-row hash. */
  private def dedupBatchById(batch: DataFrame, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(xxhash64(struct(batch.columns.map(col).toSeq: _*)))
    batch.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Merge a placed batch (must carry a `cell` column) into persisted
    * posting-list partitions, touching ONLY the batch's cells, through
    * the crash-safe backup/rename swap CorpusLake established: recover
    * any orphaned backup first, write the merged partition to a hidden
    * tmp dir, swap via two renames, drop the backup last. Returns the
    * number of cells rewritten. */
  private def upsertPostings(spark: org.apache.spark.sql.SparkSession,
      postings: String, placed: DataFrame, idCol: String,
      replace: Boolean): Int = {
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    val fs = FileSystem.get(new HPath(postings).toUri,
      spark.sparkContext.hadoopConfiguration)
    // heal ANY crashed rewrite before new work (orphaned backup =
    // shard lives only in .bak; stale backup = swap landed, cleanup
    // didn't)
    if (fs.exists(new HPath(postings))) {
      val Bak = """\.rewrite-cell-(.+)\.bak""".r
      fs.listStatus(new HPath(postings)).foreach { st =>
        st.getPath.getName match {
          case Bak(cv) =>
            val live = new HPath(s"$postings/cell=$cv")
            if (!fs.exists(live)) require(fs.rename(st.getPath, live),
              s"failed to restore $live from backup")
            else fs.delete(st.getPath, true)
          case _ => ()
        }
      }
    }
    // An id's cell is a function of its EMBEDDING, so a changed vector
    // can move cells: the old row lives in a cell the batch's new
    // assignment never touches. One narrow (cell, id) probe of the
    // postings for the batch's ids — a two-column columnar scan
    // semi-joined against the broadcast batch ids, materialized BEFORE
    // any partition swap — locates every collision exactly. skip mode
    // drops those batch rows wholesale (an id present anywhere is
    // "already indexed"); replace mode deletes them from their old
    // cells. Cost: batch cells + collision cells rewritten, plus the
    // id-column scan — the exact-semantics price without an id
    // directory sidecar.
    val batchIds = placed.select(col(idCol)).distinct()
    val postingsExists = fs.exists(new HPath(postings))
    val collisions = if (!postingsExists) null else
      spark.read.parquet(postings).select(col(idCol), col("cell"))
        .join(broadcast(batchIds), Seq(idCol))
        .distinct().graftCp(true)
    val staleCells: Array[Any] =
      if (collisions == null || !replace) Array.empty
      else collisions.select(col("cell")).distinct().collect().map(_.get(0))
    val insert =
      if (replace || collisions == null) placed
      else placed.join(broadcast(collisions.select(col(idCol))),
        Seq(idCol), "left_anti")
    val insertCells = insert.select(col("cell")).distinct().collect()
      .map(_.get(0))
    val cells = (insertCells ++ staleCells.filterNot(insertCells.contains))
    cells.foreach { cv =>
      val partDir = new HPath(s"$postings/cell=$cv")
      val slice = insert.filter(col("cell") === lit(cv)).drop("cell")
      val merged = if (!fs.exists(partDir)) slice else {
        val existing = spark.read.parquet(partDir.toString)
        val base =
          if (replace)
            existing.join(broadcast(batchIds), Seq(idCol), "left_anti")
          else existing
        base.unionByName(slice)
      }
      val tmp = new HPath(s"$postings/.rewrite-cell-$cv.tmp")
      fs.delete(tmp, true)
      merged.write.mode("overwrite").parquet(tmp.toString)
      fs.delete(new HPath(tmp, "_SUCCESS"), false)
      val backup = new HPath(s"$postings/.rewrite-cell-$cv.bak")
      fs.delete(backup, true)
      val hadLive = fs.exists(partDir)
      if (hadLive && !fs.rename(partDir, backup))
        sys.error(s"upsertPostings: failed to move $partDir aside")
      if (!fs.rename(tmp, partDir)) {
        if (hadLive) fs.rename(backup, partDir)
        sys.error(s"upsertPostings: failed to move $tmp into place; " +
          "original partition restored")
      }
      fs.delete(backup, true)
    }
    cells.length
  }

  /** Incremental maintenance of a persisted IVF-flat index
    * ([[writeIvfIndex]]): assign the arriving batch against the FROZEN
    * stored centroids — an index's geometry must not shift under
    * readers; re-clustering is an explicit rebuild — then merge each
    * touched posting-list partition crash-safely (the
    * CorpusLake.upsertBatch pattern; placement is COMPUTED, never
    * discovered by scanning). Id collisions: `replace = false` keeps
    * the index's row (idempotent re-ingest), `replace = true` takes
    * the batch's — collisions are located exactly (even across cells,
    * since a changed vector can move cells) by one narrow (cell, id)
    * probe of the postings. Rewrite cost scales with cells touched,
    * not index size. Returns the number of cells rewritten. */
  def upsertIvfIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, batch: DataFrame, idCol: String, vecCol: String,
      replace: Boolean = false): Int = {
    val cents = spark.read.parquet(s"$path/centroids")
    val centArr = toCentArr(cents)
    val cellType = cents.schema("cell").dataType
    val placed = assignCells(dedupBatchById(batch, idCol), idCol, vecCol,
        centArr, cellType)
      .withColumn("nrm", norm(col(vecCol)))
      .persist()
    try upsertPostings(spark, s"$path/postings", placed, idCol, replace)
    finally placed.unpersist()
  }

  /** Incremental maintenance of a persisted IVF-PQ index
    * ([[writeIvfPqIndex]]): coarse-assign the batch with the frozen
    * centroids, encode with the frozen codebooks, merge code rows into
    * the touched cell partitions. Same frozen-geometry / crash-safe /
    * computed-placement contract as [[upsertIvfIndex]]. */
  def upsertIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, batch: DataFrame, idCol: String, vecCol: String,
      replace: Boolean = false): Int = {
    val books = readBooks(spark, path)
    val cents = spark.read.parquet(s"$path/centroids")
    val centArr = toCentArr(cents)
    val cellType = cents.schema("cell").dataType
    val assigned = assignCells(dedupBatchById(batch, idCol), idCol, vecCol,
      centArr, cellType)
    val placed = pqEncode(assigned, idCol, vecCol, books,
      keep = Seq("cell")).persist()
    try upsertPostings(spark, s"$path/postings", placed, idCol, replace)
    finally placed.unpersist()
  }

  /** ANN against a persisted IVF index: assign the (small, broadcast)
    * query set with the stored centroids, then read ONLY the probed
    * posting-list partitions. The probed-cell collect is metadata-plane
    * (queries are small by the same contract that lets them broadcast). */
  def ivfKnnFromIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nProbe: Int = 1): DataFrame = {
    val cents = spark.read.parquet(s"$path/centroids")
    val centArr = toCentArr(cents)
    val cellType = cents.schema("cell").dataType
    val qAssigned =
      if (nProbe <= 1) assignCells(queries, idCol, vecCol, centArr, cellType)
      else assignTopN(queries, idCol, vecCol, centArr, nProbe)
    val q = qAssigned
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("cell"),
        norm(col(vecCol)).as("qn"))
      .graftCp(false)
    val probed = q.select(col("cell")).distinct().collect().map(_.get(0))
    val cand = spark.read.parquet(s"$path/postings")
      .filter(col("cell").isin(probed: _*))
      .select(col(idCol).as("cand_id"), col(vecCol).as("cv"), col("cell"),
        col("nrm").as("cn"))
    ivfScoreTopK(cand, q, k)
  }

  // ------------------------------------------------------------------
  // Product quantization (IVF-PQ, the ANN memory-scale path): vectors
  // compress to m 8-bit-ish codes — at dims=64 doubles that is ~32×
  // less candidate data to scan — and queries score candidates by
  // asymmetric distance (ADC): a per-query lookup table of
  // query-subvector × sub-centroid dot products, summed by code. The
  // whole pipeline is deterministic (hash-seeded k-means per subspace,
  // 4-dp centroids, 6-dp sims, lowest-cell ties), so an external engine
  // replays it exactly (q55 oracle).
  // ------------------------------------------------------------------

  /** Per-subspace codebook: `cells(c) = (centroid, cnormSq)`, densely
    * indexed 0..k-1 (empty cells hold zero vectors, which can never win
    * an assignment — their cosine is null). cnormSq is the SEQUENTIAL
    * sum of squares (the fold an oracle reproduces), not norm². */
  final case class PqBook(sub: Int,
      cells: IndexedSeq[(Seq[Double], Double)])

  /** Per-(sub, cell) centroid rows over the exploded slice frame —
    * the multi-subspace form of [[centroidRows]], still one
    * partial-aggregatable shuffle for ALL subspaces together. */
  private def centroidRowsBySub(df: DataFrame, vecCol: String): DataFrame =
    df.select(col("sub"), col("cell"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("d", "x")))
      .groupBy(col("sub"), col("cell"), col("d"))
      .agg(round(avg(col("x")), 4).as("c"))
      .groupBy(col("sub"), col("cell"))
      .agg(array_sort(collect_list(struct(col("d"), col("c")))).as("dc"))
      .select(col("sub"), col("cell"),
        transform(col("dc"), s => s.getField("c")).as("centroid"),
        norm(transform(col("dc"), s => s.getField("c"))).as("cnrm"))

  /** One row PER SUBSPACE holding its cell-ordered centroid array (the
    * multi-subspace [[toCentArr]]); broadcast-joined on `sub`. */
  private def centArrBySub(rows: DataFrame): DataFrame =
    rows.groupBy(col("sub"))
      .agg(array_sort(collect_list(struct(col("cell"), col("centroid"),
        col("cnrm")))).as("cents"))
      .graftCp(false)

  private def assignSubCells(sliced: DataFrame, idCol: String,
      cents: DataFrame): DataFrame =
    sliced.withColumn("vnrm", norm(col("sv")))
      .join(broadcast(cents), Seq("sub"))
      .withColumn("scored", scoredCells("sv"))
      .withColumn("best", aggregate(col("scored"),
        struct(lit(-2.0).as("csim"),
          lit(null).cast("int").as("cell")),
        (acc, x) =>
          when(x.getField("csim") > acc.getField("csim"), x).otherwise(acc)))
      .select(col(idCol), col("sub"), col("sv"),
        col("best").getField("cell").as("cell"))

  /** Train m codebooks: ALL subspaces run through ONE keyed Lloyd loop
    * — the vector explodes to m (sub, slice) rows, each iteration is a
    * single (sub, cell, dim) partial aggregation plus a broadcast-join
    * assignment fold, so training costs one scan per iteration
    * regardless of m (not m separate chains). Per-subspace math is
    * identical to [[kmeansCells]] on the slice: same hash seed, 4-dp
    * centroids, 6-dp-cosine lowest-cell assignment — the q55 oracle
    * replays it per subspace. Centroids are re-estimated from the
    * final assignment; the collected books are metadata-plane (m×k×sub
    * doubles) and become broadcast literals in encode/search. */
  def pqTrain(vectors: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, iters: Int, dims: Int): Seq[PqBook] = {
    require(dims % m == 0, s"dims $dims not divisible by m $m")
    val sub = dims / m
    val sliced = vectors.select(col(idCol),
      posexplode(array((0 until m).map(s =>
        slice(col(vecCol).cast("array<double>"), s * sub + 1, sub)): _*))
        .as(Seq("sub", "sv")))
    val seeded = sliced.withColumn("cell",
      (GF.hash32(col(idCol).cast("string")) % k).cast("int"))
    val assigned = (1 to iters).foldLeft(seeded) { (a, _) =>
      assignSubCells(sliced, idCol, centArrBySub(centroidRowsBySub(a, "sv")))
    }
    val bySub = centroidRowsBySub(assigned, "sv").collect()
      .groupBy(_.getAs[Int]("sub"))
    (0 until m).map { s =>
      val byCell = bySub.getOrElse(s, Array.empty[org.apache.spark.sql.Row])
        .map(r => r.getAs[Int]("cell") -> r.getSeq[Double](2)).toMap
      PqBook(sub, (0 until k).map { c =>
        val cent = byCell.getOrElse(c, Seq.fill(sub)(0.0))
        (cent, cent.foldLeft(0.0)((a, v) => a + v * v))
      })
    }
  }

  /** Nearest sub-centroid (rounded cosine, lowest cell on ties) as a
    * pure fold over the literal codebook — zero shuffle, codegen'd. */
  private def bestCodeExpr(sv: Column, svn: Column, book: PqBook): Column = {
    val scored = array(book.cells.zipWithIndex.map { case ((cent, cn2), c) =>
      struct(
        round(dot(sv, typedLit(cent)) /
          nullif(svn * lit(math.sqrt(cn2)), lit(0.0)), 6).as("csim"),
        lit(c).as("cell")) }: _*)
    aggregate(scored,
      struct(lit(-2.0).as("csim"), lit(null).cast("int").as("cell")),
      (acc, x) =>
        when(x.getField("csim") > acc.getField("csim"), x).otherwise(acc))
      .getField("cell")
  }

  /** Encode every vector to its m-code array — map-only expression
    * work; this is the frame a 100 TB deployment persists instead of
    * raw vectors. `keep` columns pass through (e.g. a coarse IVF cell
    * for the composed index). */
  def pqEncode(vectors: DataFrame, idCol: String, vecCol: String,
      books: Seq[PqBook], keep: Seq[String] = Nil): DataFrame = {
    val withSlices = vectors.select((col(idCol) +: keep.map(col)) ++
      books.zipWithIndex.flatMap { case (b, s) =>
        val sv = slice(col(vecCol).cast("array<double>"),
          s * b.sub + 1, b.sub)
        Seq(sv.as(s"sv$s"), norm(sv).as(s"svn$s")) }: _*)
    withSlices.select(col(idCol) +: keep.map(col) :+
      array(books.zipWithIndex.map { case (b, s) =>
        bestCodeExpr(col(s"sv$s"), col(s"svn$s"), b) }: _*).as("codes"): _*)
  }

  /** ADC top-k: per query build the m×k dot-product lookup table ONCE
    * (an expression over the literal codebooks), broadcast the query
    * rows, and score each candidate with one zip_with over its code
    * array — per-candidate cost O(m), independent of dims. The
    * approximate cosine divides by the RECONSTRUCTED candidate norm
    * (sum of assigned sub-centroid norms²), the standard IP-ADC
    * estimate. Compose with the IVF posting-list layout to prune before
    * scanning. */
  def pqSearch(codes: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, books: Seq[PqBook], topK: Int): DataFrame = {
    val cn2Lit = typedLit(books.map(_.cells.map(_._2)))
    val q = queries.select(col(idCol).as("query_id"),
      pqLut(vecCol, books).as("lut"), norm(col(vecCol)).as("qn"))
    val scored = codes
      .select(col(idCol).as("cand_id"), col("codes"))
      .crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("adc", aggregate(
        zip_with(col("codes"), col("lut"),
          (c, row) => element_at(row, c + 1)),
        lit(0.0), (a, v) => a + v))
      .withColumn("recn", sqrt(aggregate(
        zip_with(col("codes"), cn2Lit,
          (c, row) => element_at(row, c + 1)),
        lit(0.0), (a, v) => a + v)))
      .withColumn("sim_adc",
        round(col("adc") / nullif(col("qn") * col("recn"), lit(0.0)), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim_adc").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("cand_id"), col("sim_adc"), col("rank"))
  }

  /** ADC scoring of a `(cand_id, codes, cell)` frame against queries
    * carrying `(query_id, cell, lut, qn)` — the tail shared by
    * [[pqSearch]]-from-index probes; joins on the coarse cell. */
  private def pqScoreTopK(cand: DataFrame, q: DataFrame,
      books: Seq[PqBook], topK: Int): DataFrame = {
    val cn2Lit = typedLit(books.map(_.cells.map(_._2)))
    val scored = cand.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("adc", aggregate(
        zip_with(col("codes"), col("lut"),
          (c, row) => element_at(row, c + 1)),
        lit(0.0), (a, v) => a + v))
      .withColumn("recn", sqrt(aggregate(
        zip_with(col("codes"), cn2Lit,
          (c, row) => element_at(row, c + 1)),
        lit(0.0), (a, v) => a + v)))
      .withColumn("sim_adc",
        round(col("adc") / nullif(col("qn") * col("recn"), lit(0.0)), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim_adc").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("cand_id"), col("sim_adc"), col("rank"))
  }

  /** The per-query ADC lookup structure: m×k raw subvector×centroid
    * dot products, plus the true query norm. */
  private def pqLut(vecCol: String, books: Seq[PqBook]): Column =
    array(books.zipWithIndex.map { case (b, s) =>
      val qs = slice(col(vecCol).cast("array<double>"),
        s * b.sub + 1, b.sub)
      array(b.cells.map { case (cent, _) =>
        dot(qs, typedLit(cent)) }: _*) }: _*)

  /** Persist the COMPOSED IVF-PQ index: posting lists are parquet
    * partitions keyed by the coarse cell (probes prune to 1/nCells of
    * the data, as in [[writeIvfIndex]]) but store m-byte-ish PQ codes
    * instead of raw vectors (~32× less data per scanned candidate at
    * dims=64). Sidecars: coarse centroids + the per-subspace codebooks
    * (both metadata-sized). The coarse quantizer can come from
    * [[kmeansCells]] — the whole index needs no label column. */
  def writeIvfPqIndex(vectors: DataFrame, idCol: String, vecCol: String,
      cellCol: String, books: Seq[PqBook], path: String): Unit = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val cents = centroidRows(vectors, vecCol, cellCol)
    cents.coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    books.zipWithIndex.flatMap { case (b, s) =>
      b.cells.zipWithIndex.map { case ((cent, cn2), c) =>
        (s, c, cent, cn2) } }
      .toDF("sub", "cell", "centroid", "cn2")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/books")
    val centArr = toCentArr(cents)
    val cellType = vectors.schema(cellCol).dataType
    val assigned = assignCells(vectors, idCol, vecCol, centArr, cellType)
    pqEncode(assigned, idCol, vecCol, books, keep = Seq("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/postings")
  }

  private def readBooks(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[PqBook] = {
    val rows = spark.read.parquet(s"$path/books").collect()
      .map(r => (r.getAs[Int]("sub"), r.getAs[Int]("cell"),
        r.getSeq[Double](2), r.getAs[Double]("cn2")))
    rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (_, cs) =>
      val cells = cs.sortBy(_._2).map(t => (t._3, t._4)).toIndexedSeq
      PqBook(cells.head._1.size, cells)
    }
  }

  /** ANN against a persisted IVF-PQ index: assign the broadcast query
    * set with the stored coarse centroids, read ONLY the probed
    * posting-list partitions, and ADC-score their code arrays — the
    * probe touches 1/nCells of the corpus AND moves only codes, never
    * vectors. */
  def pqSearchFromIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, idCol: String, vecCol: String,
      topK: Int, nProbe: Int = 1): DataFrame = {
    val books = readBooks(spark, path)
    val cents = spark.read.parquet(s"$path/centroids")
    val centArr = toCentArr(cents)
    val cellType = cents.schema("cell").dataType
    val qAssigned =
      if (nProbe <= 1) assignCells(queries, idCol, vecCol, centArr, cellType)
      else assignTopN(queries, idCol, vecCol, centArr, nProbe)
    val q = qAssigned
      .select(col(idCol).as("query_id"), col("cell"),
        pqLut(vecCol, books).as("lut"), norm(col(vecCol)).as("qn"))
      .graftCp(false)
    val probed = q.select(col("cell")).distinct().collect().map(_.get(0))
    val cand = spark.read.parquet(s"$path/postings")
      .filter(col("cell").isin(probed: _*))
      .select(col(idCol).as("cand_id"), col("codes"), col("cell"))
    pqScoreTopK(cand, q, books, topK)
  }

  /** Margin-based bitext/pair mining (the ratio-margin criterion of
    * Artetxe & Schwenk 2019, public): for each source vector, its
    * nearest target plus a margin score
    * `sim(s,t) / ((avgTopK(s→tgt) + avgTopK(t→src)) / 2)` that
    * penalizes hubs — a target near EVERYTHING scores margins ≈ 1 and
    * drops, a target uniquely near THIS source scores high. `mutual`
    * flags pairs that are each other's rank-1 both directions.
    *
    * Margin arithmetic is EXACT-integer: sims quantize to 1e-6 units
    * (longs), the k-neighborhood sums stay integral, and the margin is
    * ONE double division of two longs — bit-reproducible on any
    * engine, where averaging raw doubles would make the 6th decimal
    * summation-order-dependent. Both kNN passes here are the brute
    * oracle-checkable baseline; at corpus scale swap them for
    * [[ivfKnn]] — the margin algebra is agnostic to how the
    * neighborhoods were found. */
  def marginBitextPairs(src: DataFrame, tgt: DataFrame, idCol: String,
      vecCol: String, k: Int = 4): DataFrame = {
    def simInt(c: Column): Column = round(c * 1e6, 0).cast("long")
    val fwd = bruteForceKnn(src, tgt, idCol, vecCol, k)
    val bwd = bruteForceKnn(tgt, src, idCol, vecCol, k)
    val fwdAgg = fwd.groupBy(col("query_id").as("src_id"))
      .agg(sum(simInt(col("sim"))).as("fsum"),
        max(when(col("rank") === 1, col("cand_id"))).as("tgt_id"),
        max(when(col("rank") === 1, col("sim"))).as("sim"))
    val bwdAgg = bwd.groupBy(col("query_id").as("b_tgt"))
      .agg(sum(simInt(col("sim"))).as("bsum"),
        max(when(col("rank") === 1, col("cand_id"))).as("b_src"))
    fwdAgg.join(bwdAgg, col("tgt_id") === col("b_tgt"))
      .select(col("src_id"), col("tgt_id"), col("sim"),
        round(lit(2.0 * k) * simInt(col("sim")) /
          (col("fsum") + col("bsum")), 6).as("margin"),
        (col("b_src") === col("src_id")).as("mutual"))
  }

  /** [[marginBitextPairs]] at corpus scale: the same exact-integer
    * margin algebra, with both kNN neighborhoods restricted to
    * deterministic hyperplane-LSH blocks ([[adaptiveLshBlocks]] over
    * the UNION of the two sides, so block boundaries are shared). The
    * brute form's cost is |src|·|tgt| sims per direction — quadratic
    * in the corpus (the ×100 audit measured it at ×132/decade);
    * blocked, pair volume is bounded by ~n·maxBlockSize/4 and the
    * whole query scales linearly, the q65 semantic-dedup treatment
    * applied to mining. Semantics become "nearest target within the
    * block" — the standard recall trade every LSH retrieval stage
    * makes; margins/mutual flags for the pairs that remain are
    * computed by the identical algebra.
    *
    * Oracle path: under-cap corpora never refine past `baseBits`, so
    * an external engine replays the block key as a fixed
    * `baseBits`-bit hyperplane-sign bucket (the q196 oracle does) —
    * same trick the q65 oracle uses. Unlike the brute form, the
    * within-block sim matrix is computed ONCE and both directions
    * rank it (the brute baseline computes all-pairs sims twice). */
  /** The within-block (src, tgt, sim) stage of
    * [[blockedMarginBitextPairs]], exposed so the scaling diagnostics
    * (graft.ScaleDiag) can count the candidate-pair volume THROUGH the
    * production code path — block occupancy is data-dependent, so
    * candidate growth under corpus scaling is an empirical number
    * worth logging per audit, not a formula. */
  private[graft] def blockedMarginSims(src: DataFrame, tgt: DataFrame,
      idCol: String, vecCol: String, baseBits: Int,
      maxBlockSize: Int): DataFrame = {
    val pop = src.select(col(idCol), col(vecCol), lit(0).as("_side"))
      .unionByName(tgt.select(col(idCol), col(vecCol), lit(1).as("_side")))
    val blk = adaptiveLshBlocks(pop, vecCol, "_blk", baseBits,
        maxBlockSize)
      .withColumn("_nrm", norm(col(vecCol)))
      .graftCp(false)
    val s = blk.filter(col("_side") === 0).select(col("_blk"),
      col(idCol).as("sid"), col(vecCol).as("sv"), col("_nrm").as("sn"))
    val t = blk.filter(col("_side") === 1).select(col("_blk"),
      col(idCol).as("tid"), col(vecCol).as("tv"), col("_nrm").as("tn"))
    // one within-block sim matrix; the only corpus-grain shuffle keys
    // on the block id, so bucket skew is already bounded by the cap
    s.join(t, Seq("_blk"))
      .withColumn("sim", round(dot(col("sv"), col("tv")) /
        nullif(col("sn") * col("tn"), lit(0.0)), 6))
      .select(col("sid"), col("tid"), col("sim"))
  }

  def blockedMarginBitextPairs(src: DataFrame, tgt: DataFrame,
      idCol: String, vecCol: String, k: Int = 4, baseBits: Int = 4,
      maxBlockSize: Int = 512): DataFrame = {
    def simInt(c: Column): Column = round(c * 1e6, 0).cast("long")
    val sims = blockedMarginSims(src, tgt, idCol, vecCol, baseBits,
        maxBlockSize)
      .graftCp(false)
    val wf = Window.partitionBy(col("sid"))
      .orderBy(col("sim").desc, col("tid"))
    val wb = Window.partitionBy(col("tid"))
      .orderBy(col("sim").desc, col("sid"))
    val fwd = sims.withColumn("rn", row_number().over(wf))
      .filter(col("rn") <= k)
      .groupBy(col("sid").as("src_id"))
      .agg(sum(simInt(col("sim"))).as("fsum"),
        max(when(col("rn") === 1, col("tid"))).as("tgt_id"),
        max(when(col("rn") === 1, col("sim"))).as("sim"))
    val bwd = sims.withColumn("rn", row_number().over(wb))
      .filter(col("rn") <= k)
      .groupBy(col("tid").as("b_tgt"))
      .agg(sum(simInt(col("sim"))).as("bsum"),
        max(when(col("rn") === 1, col("sid"))).as("b_src"))
    fwd.join(bwd, col("tgt_id") === col("b_tgt"))
      .select(col("src_id"), col("tgt_id"), col("sim"),
        round(lit(2.0 * k) * simInt(col("sim")) /
          (col("fsum") + col("bsum")), 6).as("margin"),
        (col("b_src") === col("src_id")).as("mutual"))
  }

  /** Matryoshka-truncation recall audit: how much of the exact
    * full-dimension top-k survives when vectors are cut to their first
    * `dims` components (the MRL serving trick — truncated prefixes as
    * cheap first-stage vectors; public: Kusupati et al. 2022). Runs
    * BOTH rankings (full cosine, prefix cosine over `slice`) and
    * reports per-query overlap@k — the measurement that justifies (or
    * vetoes) serving the prefix index. Cosines stay the same
    * sequential fold on both sides, so an external oracle replays
    * every rank. */
  def truncatedRecall(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, dims: Int, k: Int): DataFrame = {
    def cut(df: DataFrame): DataFrame =
      df.select(col(idCol), slice(col(vecCol), 1, dims).as(vecCol))
    val exact = bruteForceKnn(queries, candidates, idCol, vecCol, k)
      .select(col("query_id"), col("cand_id"))
    val trunc = bruteForceKnn(cut(queries), cut(candidates), idCol,
        vecCol, k)
      .select(col("query_id"), col("cand_id"), lit(1).as("_t"))
    exact.join(trunc, Seq("query_id", "cand_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("k_exact"),
        sum(coalesce(col("_t"), lit(0))).cast("long").as("n_kept"))
      .select(col("query_id"), col("k_exact"), col("n_kept"),
        round(col("n_kept") / col("k_exact").cast("double"), 6)
          .as("recall"))
  }

  /** Near-duplicate pairs by embedding cosine above a threshold, with the
    * candidate space restricted by a blocking key (e.g. label or LSH
    * bucket) so the self-join never goes quadratic. */
  def cosineNearDupPairs(vectors: DataFrame, idCol: String, vecCol: String,
      blockCol: String, threshold: Double): DataFrame = {
    val normed = vectors.select(col(blockCol).as("blk"), col(idCol),
      col(vecCol), norm(col(vecCol)).as("nrm")).graftCp(false)
    val l = normed.select(col("blk"), col(idCol).as("id1"),
      col(vecCol).as("v1"), col("nrm").as("n1"))
    val r = normed.select(col("blk"), col(idCol).as("id2"),
      col(vecCol).as("v2"), col("nrm").as("n2"))
    l.join(r, Seq("blk"))
      .filter(col("id1") < col("id2"))
      .withColumn("sim",
        round(dot(col("v1"), col("v2")) /
          nullif(col("n1") * col("n2"), lit(0.0)), 6))
      .filter(col("sim") >= threshold)
      .select(col("blk"), col("id1"), col("id2"), col("sim"))
  }

  /** Recall@k of an approximate ANN result against the exact top-k —
    * the evaluation harness behind every nProbe/nBits tuning decision:
    * a probe setting is "good enough" when this says so, not when a
    * spot check looks right. Both inputs are (query, cand, rank)
    * frames (rank ≤ k rows are considered); output is per-query
    * n_hits / recall with zero-hit queries kept.
    *
    * Scale shape: one semi-join at (query, cand) grain over two
    * queries×k frames, one partial-agg count — evaluation cost is
    * proportional to the result lists, never the corpus. */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int,
      queryCol: String = "query_id", candCol: String = "cand_id"): DataFrame = {
    require(k > 0, "k must be positive")
    val a = approx.filter(col("rank") <= k)
      .select(col(queryCol), col(candCol))
    val e = exact.filter(col("rank") <= k)
      .select(col(queryCol), col(candCol))
    val hits = a.join(e, Seq(queryCol, candCol), "left_semi")
      .groupBy(col(queryCol)).agg(count(lit(1)).as("n_hits"))
    e.select(col(queryCol)).distinct()
      .join(hits, Seq(queryCol), "left")
      .select(col(queryCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(coalesce(col("n_hits"), lit(0L)) / lit(k.toDouble), 6)
          .as("recall"))
  }

  /** Graded retrieval-quality metrics — MRR and nDCG@k of a ranked
    * result list against a relevance set, per query. recallAtK answers
    * "did the right ids appear"; this answers "did they appear EARLY",
    * which is what a reranker or serving cutoff actually optimizes.
    * RR = 1/rank of the first relevant hit (0 if none in the top k);
    * DCG = Σ 1/log2(rank+1) over relevant hits; nDCG normalizes by the
    * ideal DCG of min(n_rel, k) front-loaded hits, so a query with few
    * relevant docs isn't penalized for physically unreachable gain.
    *
    * Scale shape: one (query, cand) equi-join between the result lists
    * and the relevance pairs, two partial aggregations at query grain —
    * evaluation cost is proportional to lists × relevance, never the
    * corpus. The ideal-DCG denominator is a sequential HOF fold over
    * sequence(1, min(n_rel, k)) — the same left-to-right order an
    * external oracle's list fold uses. Zero-hit queries are kept with
    * rr = ndcg = 0. */
  def retrievalMetrics(ranked: DataFrame, truth: DataFrame, k: Int,
      queryCol: String = "query_id", candCol: String = "cand_id",
      rankCol: String = "rank"): DataFrame = {
    require(k > 0, "k must be positive")
    val rel = truth.groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_rel"))
    val hits = ranked.filter(col(rankCol) <= k)
      .select(col(queryCol), col(candCol), col(rankCol))
      .join(truth.select(col(queryCol), col(candCol)),
        Seq(queryCol, candCol))
      .groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_hits"),
        min(col(rankCol)).as("first_rank"),
        sum(lit(1.0) / log(2.0, col(rankCol).cast("double") + 1))
          .as("dcg"))
    val idcg = aggregate(
      sequence(lit(1), least(col("n_rel"), lit(k)).cast("int")),
      lit(0.0), (acc, i) => acc + lit(1.0) / log(2.0, i.cast("double") + 1))
    rel.join(hits, Seq(queryCol), "left")
      .select(col(queryCol), col("n_rel"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(coalesce(lit(1.0) / col("first_rank"), lit(0.0)), 6).as("rr"),
        round(coalesce(col("dcg"), lit(0.0)) / idcg, 6).as("ndcg"))
  }

  /** Hard-negative mining for embedding-model training: for each query
    * vector, the k most similar candidates with a DIFFERENT label —
    * the "looks close, should be far" pairs contrastive training wants.
    * Exact brute-force form with the [[bruteForceKnn]] contract
    * (broadcast queries, rounded-sim + id tiebreak); at 100 TB compose
    * the IVF probe first and filter labels in the pruned candidate set
    * instead. */
  def hardNegatives(candidates: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      col(labelCol).as("q_label"), norm(col(vecCol)).as("qn"))
    val c = candidates.select(col(idCol).as("cand_id"), col(vecCol).as("cv"),
      col(labelCol).as("c_label"), norm(col(vecCol)).as("cn"))
    val scored = c.join(broadcast(q), col("q_label") =!= col("c_label"))
      .withColumn("sim", round(dot(col("qv"), col("cv")) /
        nullif(col("qn") * col("cn"), lit(0.0)), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("q_label"), col("cand_id"),
        col("c_label"), col("sim"), col("rank"))
  }

  // ------------------------------------------------------------------
  // SQ8 scalar quantization — the memory-compression rung between
  // full-precision flat search and PQ: one byte per dimension (4× less
  // than float32, 8× less than float64) with per-dimension [min, max]
  // ranges. Unlike PQ there is nothing to train beyond one stats pass,
  // and reconstruction error is bounded per dimension by span/255 — the
  // standard first step when an embedding corpus stops fitting in
  // executor memory.
  // ------------------------------------------------------------------

  /** Per-dimension (min, span) over the corpus: ONE posexplode +
    * partial-agg pass at (dimension) grain, collected to the driver —
    * metadata-plane by the same contract as centroids/codebooks (dims
    * entries, not corpus rows). */
  def sq8Stats(vectors: DataFrame, vecCol: String): (Seq[Double], Seq[Double]) = {
    val st = vectors
      .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("d", "v")))
      .groupBy(col("d"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      .orderBy(col("d")).collect()
    (st.map(_.getDouble(1)).toSeq,
      st.map(r => r.getDouble(2) - r.getDouble(1)).toSeq)
  }

  /** Dequantized vector: quantize each element to its byte code
    * (clamped round of the normalized offset) and immediately
    * reconstruct `min + code·span/255`. Pure per-row expression work —
    * zero shuffles — with a pinned per-element arithmetic order so an
    * external oracle reproduces every double bit-for-bit. Degenerate
    * dimensions (span 0) reconstruct to the constant. */
  def sq8Reconstruct(vec: Column, mins: Seq[Double],
      spans: Seq[Double]): Column = {
    val diffs = zip_with(vec.cast("array<double>"), typedLit(mins),
      (v, m) => v - m)
    val scaled = zip_with(diffs, typedLit(spans), (dv, s) =>
      when(s === 0.0, lit(0.0)).otherwise(
        greatest(least(round(dv / s * 255, 0), lit(255.0)), lit(0.0))
          * s / lit(255.0)))
    zip_with(scaled, typedLit(mins), (r, m) => r + m)
  }

  /** Two-stage retrieval: SQ8 byte-code scan selects `kCoarse`
    * candidates per query, exact full-precision cosine reranks them to
    * the final `k` — the standard serving shape when the corpus only
    * fits in memory compressed: the wide scan reads 1 byte/dim, full
    * vectors load only for the ~kCoarse survivors. Recall vs the exact
    * scan is whatever the coarse stage preserves — measure it with
    * [[annRecallAtK]], tune kCoarse. */
  def sq8Rerank(vectors: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, kCoarse: Int, k: Int): DataFrame = {
    // argument order follows the SQ8 family (sq8Knn: vectors first),
    // NOT bruteForceKnn's (queries, candidates) — mind the call site
    require(kCoarse >= k, "kCoarse must be >= k")
    val coarse = sq8Knn(vectors, queries, idCol, vecCol, kCoarse)
      .select(col("query_id"), col("cand_id"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn"))
    val c = vectors.select(col(idCol).as("cand_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"))
    // the survivor list is |queries|·kCoarse rows — broadcast it so the
    // corpus prunes map-side instead of shuffling every vector (and its
    // freshly computed norm) into a sort-merge join
    val scored = c
      .join(broadcast(coarse), Seq("cand_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("sim", round(dot(col("qv"), col("cv")) /
        nullif(col("qn") * col("cn"), lit(0.0)), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("sim"), col("rank"))
  }

  /** Brute-force cosine top-k over the SQ8-dequantized corpus — the
    * quality-vs-memory measurement for the SQ8 rung (compare against
    * [[bruteForceKnn]] to price the recall cost of byte codes, exactly
    * as [[annRecallAtK]] prices IVF/PQ). Queries stay full-precision
    * (they are few and broadcast); candidates score through their
    * reconstruction, so the ranking is what a deployed byte-code scan
    * would return. */
  def sq8Knn(vectors: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val (mins, spans) = sq8Stats(vectors, vecCol)
    val c = vectors.select(col(idCol).as("cand_id"),
        sq8Reconstruct(col(vecCol), mins, spans).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .withColumn("sim", round(dot(col("qv"), col("cv")) /
        nullif(col("qn") * col("cn"), lit(0.0)), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("sim"), col("rank"))
  }

  /** Maximal-marginal-relevance reranking — the serving-side diversity
    * pass: from each query's top-`poolK` relevance pool, greedily pick
    * `selectK` results maximizing λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s)
    * (Carbonell & Goldstein '98) so near-duplicate hits don't crowd
    * the result list the dedup pipeline didn't get to.
    *
    * The greedy loop is inherently sequential in `selectK`, so it runs
    * as selectK chained DataFrame stages — each stage one shuffle at
    * (query, candidate-pool) grain, which is the SMALL serving side
    * (queries × poolK² pairwise-sim rows), never the corpus. The
    * argmax plans as WindowGroupLimit per query. The MMR score is
    * computed in EXACT integers: 6-dp similarities scale to 1e-6 units
    * and λ (restricted to tenths) scales to λ·10, so score =
    * λ10·rel6 − (10−λ10)·ms6 in 1e-7 units — λ-arithmetic on 6-dp
    * doubles lands exactly on decimal rounding boundaries (0.7·x has 7
    * decimals), where engines disagree; integers cannot. FP appears
    * only in the output display divisions. Each pick is lazily
    * checkpointed — selectK is a loop, and without the cut the final
    * plan grows exponentially in it. */
  def mmrRerank(queries: DataFrame, candidates: DataFrame, idCol: String,
      vecCol: String, poolK: Int, selectK: Int,
      lambda: Double): DataFrame = {
    require(selectK >= 1 && selectK <= poolK,
      "selectK must be in [1, poolK]")
    val l10 = math.round(lambda * 10).toInt
    require(l10 >= 0 && l10 <= 10 && l10 == lambda * 10,
      "lambda must be a multiple of 0.1 (exact integer scoring)")
    val pool = bruteForceKnn(queries, candidates, idCol, vecCol, poolK)
      .select(col("query_id"), col("cand_id"), col("sim").as("rel"),
        round(col("sim") * 1e6).cast("long").as("rel6"), col("rank"))
      .graftCp(false)
    val vecs = candidates.select(col(idCol).as("cand_id"),
      col(vecCol).as("v"), norm(col(vecCol)).as("vn"))
    val pv = pool.join(vecs, Seq("cand_id"))
      .select(col("query_id"), col("cand_id"), col("v"), col("vn"))
    val pairSims = pv.as("a")
      .join(pv.as("b"), col("a.query_id") === col("b.query_id") &&
        col("a.cand_id") =!= col("b.cand_id"))
      .select(col("a.query_id").as("query_id"),
        col("a.cand_id").as("cand_id"), col("b.cand_id").as("sel_id"),
        round(dot(col("a.v"), col("b.v")) /
          nullif(col("a.vn") * col("b.vn"), lit(0.0)) * 1e6)
          .cast("long").as("csim6"))
      .graftCp(false)
    var selected = pool.filter(col("rank") === 1)
      .select(col("query_id"), col("cand_id"), lit(1).as("mmr_rank"),
        col("rel"), lit(0.0).as("max_sim_sel"),
        ((lit(l10.toLong) * col("rel6")).cast("double") / 1e7)
          .as("mmr_score"))
    var remaining = pool.filter(col("rank") > 1)
      .select(col("query_id"), col("cand_id"), col("rel"),
        col("rel6"))
    for (step <- 2 to selectK) {
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("_score").desc, col("cand_id"))
      val pick = remaining
        .join(selected.select(col("query_id"),
          col("cand_id").as("sel_id")), Seq("query_id"))
        .join(pairSims, Seq("query_id", "cand_id", "sel_id"))
        .groupBy(col("query_id"), col("cand_id"))
        .agg(max(col("rel")).as("rel"), max(col("rel6")).as("rel6"),
          max(col("csim6")).as("ms6"))
        .withColumn("_score", lit(l10.toLong) * col("rel6") -
          lit((10 - l10).toLong) * col("ms6"))
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
        .select(col("query_id"), col("cand_id"),
          lit(step).as("mmr_rank"), col("rel"),
          (col("ms6").cast("double") / 1e6).as("max_sim_sel"),
          (col("_score").cast("double") / 1e7).as("mmr_score"))
        .graftCp(false)
      selected = selected.unionByName(pick)
      remaining = remaining.join(
        pick.select(col("query_id"), col("cand_id")),
        Seq("query_id", "cand_id"), "left_anti")
    }
    selected
  }

  /** Sign of the deterministic ±1 Johnson-Lindenstrauss matrix cell
    * (outDim d, inDim j): a closed-form LCG parity, so any engine can
    * regenerate the identical matrix from (d, j) alone — no
    * materialized matrix, no RNG state, reproducible across runs and
    * re-partitions. */
  private def jlSign(d: Column, j: Column): Column =
    when((j * lit(1103515245L) + d * lit(12345L) + lit(54321L)) % 97 % 2
      === 0, lit(1.0)).otherwise(lit(-1.0))

  /** Johnson-Lindenstrauss random projection to `k` dims: out[d] =
    * Σ_j emb[j]·sign(d,j) / √k, sign(d,j) the closed-form LCG parity
    * ((j·1103515245 + d·12345 + 54321) % 97 % 2 — [[jlSign]]'s
    * formula, replicated here on the driver so the ±1 matrix folds
    * into k LITERAL rows and each output dim is ONE native
    * graft_vec_dot — no shuffle, no broadcast matrix, and every
    * term codegen'd. The previous nested-HOF form
    * (transform→aggregate→zip_with with per-element sign arithmetic)
    * evaluated INTERPRETED, and interpreted expression trees degrade
    * megamorphically in long suites: the ×100 audit measured it at
    * 25.4 s in-suite vs 1.4 s isolated on the same corpus. Values are
    * bit-identical: the native dot's sequential double fold is
    * asserted against the HOF fold in ExtensionsSpec, ·±1.0 is exact,
    * and the fold runs in the same input-dim order, so external
    * oracles keep comparing value-by-value. `dims` pins the input
    * width at plan time (the [[planeProjection]] precedent) and is
    * ENFORCED: a row whose vector width differs raises an error
    * instead of silently projecting to null (graft_vec_dot nulls on
    * length mismatch, which used to surface as all-null output with
    * no hint); null vectors still project to nulls, as before. Emits
    * long format (id, dim, value rounded to 6). */
  def randomProjection(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int, dims: Int = 64): DataFrame = {
    def sign(d: Int, j: Int): Double =
      if ((j * 1103515245L + d * 12345L + 54321L) % 97 % 2 == 0) 1.0
      else -1.0
    val checked = when(col(vecCol).isNull, col(vecCol))
      .when(size(col(vecCol)) === dims, col(vecCol))
      .otherwise(raise_error(concat(
        lit(s"randomProjection: expected $dims-dim vectors (dims), got "),
        size(col(vecCol)).cast("string"))))
    val base = vectors.select(col(idCol), checked.as("__v"))
    val proj = array((0 until k).map { d =>
      round(dot(col("__v"),
          typedLit((0 until dims).map(j => sign(d, j)))) /
        math.sqrt(k.toDouble), 6)
    }: _*)
    base.select(col(idCol), posexplode(proj).as(Seq("dim", "value")))
  }

  /** Per-dimension z-score standardization (the feature-scaling pass
    * before clustering/ANN on heterogeneous dims): long-format
    * (id, dim, z) with population mean/stddev computed at DIMENSION
    * grain — the explode shuffles once into ≤dim groups; stats are a
    * dim-sized broadcast back onto the exploded rows. Zero-variance
    * dims yield null z (absence, not a NaN). */
  def standardizeDims(vectors: DataFrame, idCol: String, vecCol: String)
      : DataFrame = {
    val long = vectors.select(col(idCol),
      posexplode(col(vecCol)).as(Seq("dim", "v")))
      .withColumn("v", col("v").cast("double"))
    val stats = long.groupBy(col("dim"))
      .agg(avg(col("v")).as("_mu"), stddev_pop(col("v")).as("_sd"))
    long.join(broadcast(stats), Seq("dim"))
      .select(col(idCol), col("dim"),
        round(when(col("_sd") > 0.0, (col("v") - col("_mu")) / col("_sd")),
          5).as("z"))
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** The OUTPUT side of the training-data pipeline: the curated corpus
  * persisted as training shards a data loader streams directly (engine
  * extension; companion to [[SeriesLake]]'s input-side layout).
  *
  * Layout: parquet partitioned by `split` (train/val/test — the
  * deterministic hash split) and `shard` (a hash bucket of the salted
  * shuffle key), repartitioned BY those same keys before the write so
  * every (split, shard) directory holds exactly ONE file — no
  * small-file accumulation — and `sortWithinPartitions` on the shuffle
  * key bakes the canonical training order INTO the file: a reader
  * streams examples in deterministic shuffled order with zero sort, on
  * any engine, because both split and order derive from portable
  * hashes of the document id (Sampling.withSplit /
  * Sampling.shuffleKey). Re-sharding for a different worker count is a
  * metadata change (`nShards`), not a semantic one — example order
  * within the epoch permutation is unchanged.
  */
object CorpusLake {

  /** The writer's placement parameters, persisted as
    * `_graft_meta.json` beside the shards (underscore prefix: invisible
    * to parquet readers). Placement is a pure function of (id, these
    * four numbers), so storing them makes every row findable WITHOUT a
    * lake scan — the basis of [[deleteByKey]]. */
  final case class LakeMeta(epoch: Int, nShards: Int, trainPct: Int,
      valPct: Int)

  /** Write `docs` as training shards under `path`. Keeps all input
    * columns and adds `split`, `shard`, `shuffle_key`. */
  def writeShards(docs: DataFrame, idCol: String, path: String,
      epoch: Int, nShards: Int, trainPct: Int = 80,
      valPct: Int = 10): Unit = {
    Sampling.withSplit(docs, idCol, trainPct, valPct)
      .withColumn("shuffle_key", Sampling.shuffleKey(col(idCol), epoch))
      .withColumn("shard",
        pmod(col("shuffle_key"), lit(nShards)).cast("int"))
      .repartition(col("split"), col("shard"))
      // partition columns lead the sort: the partitionBy writer demands
      // rows grouped by (split, shard) and would inject its OWN
      // non-stable sort on just those keys if unsatisfied, destroying
      // the baked-in shuffle order — leading with them makes the
      // existing ordering satisfy the writer, so the suffix
      // (shuffle_key, id) order survives into the files
      .sortWithinPartitions(col("split"), col("shard"),
        col("shuffle_key"), col(idCol))
      .write.mode("overwrite")
      .partitionBy("split", "shard")
      .parquet(path)
    writeMeta(docs.sparkSession, path,
      LakeMeta(epoch, nShards, trainPct, valPct))
  }

  private def writeMeta(spark: SparkSession, path: String,
      m: LakeMeta): Unit = {
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    val p = new HPath(s"$path/_graft_meta.json")
    val fs = FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    out.write((s"""{"epoch": ${m.epoch}, "nShards": ${m.nShards}, """ +
      s""""trainPct": ${m.trainPct}, "valPct": ${m.valPct}}""")
      .getBytes("UTF-8"))
    out.close()
  }

  def readMeta(spark: SparkSession, path: String): LakeMeta = {
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    val p = new HPath(s"$path/_graft_meta.json")
    val fs = FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no _graft_meta.json under $path — " +
      "not a CorpusLake (or written before placement metadata existed)")
    val in = fs.open(p)
    val txt = scala.io.Source.fromInputStream(in, "UTF-8").mkString
    in.close()
    def num(k: String): Int = {
      val m = s""""$k"\\s*:\\s*(-?\\d+)""".r.findFirstMatchIn(txt)
      require(m.isDefined, s"_graft_meta.json missing $k")
      m.get.group(1).toInt
    }
    LakeMeta(num("epoch"), num("nShards"), num("trainPct"), num("valPct"))
  }

  /** JVM twin of GF.hash32 (first 4 md5 bytes as an unsigned int in a
    * long) — placement math on the driver must agree bit-for-bit with
    * what the writer's Column expressions computed. */
  private def jvmHash32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).take(4)
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16)
  }

  /** Roll forward a crash that happened between swapShard's two
    * renames: the shard then lives ONLY in the hidden `.bak` dir
    * (partDir gone), so reads would silently miss it and a subsequent
    * upsert would merge against nothing and then delete the sole copy.
    * Every mutation entry point calls this first: if the backup exists
    * and the live dir does not, restore backup → live before touching
    * anything. Returns true if a restore happened. */
  private def recoverShard(spark: SparkSession, path: String,
      split: String, shard: Int): Boolean = {
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    val partDir = new HPath(s"$path/split=$split/shard=$shard")
    val backup = new HPath(s"$path/.rewrite-$split-$shard.bak")
    val fs = FileSystem.get(partDir.toUri,
      spark.sparkContext.hadoopConfiguration)
    if (fs.exists(backup) && !fs.exists(partDir)) {
      require(fs.rename(backup, partDir),
        s"recoverShard: failed to restore $backup to $partDir")
      true
    } else false
  }

  /** Sweep ALL pending `.rewrite-*.bak` dirs at the lake root: restore
    * orphaned backups (crash between the two renames), delete stale
    * ones (crash after the swap landed, before cleanup). One root
    * listing — metadata-scale. Every mutation entry point runs this so
    * a crashed rewrite of ANY shard heals before new work starts, not
    * just shards the current batch happens to touch. */
  private def recoverAll(spark: SparkSession, path: String): Unit = {
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    val root = new HPath(path)
    val fs = FileSystem.get(root.toUri,
      spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    val Bak = """\.rewrite-(.+)-(\d+)\.bak""".r
    fs.listStatus(root).foreach { st =>
      st.getPath.getName match {
        case Bak(split, shard) =>
          val live = new HPath(s"$path/split=$split/shard=$shard")
          if (!fs.exists(live)) recoverShard(spark, path, split, shard.toInt)
          else fs.delete(st.getPath, true)
        case _ => ()
      }
    }
  }

  /** Rewrite one (split, shard) directory with `rows`, baked order
    * restored, through the backup/rename swap SeriesLake.compactCatalog
    * established — a crash mid-rewrite leaves the shard recoverable,
    * never missing. */
  private def swapShard(spark: SparkSession, path: String, split: String,
      shard: Int, rows: DataFrame, idCol: String): Unit = {
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    recoverShard(spark, path, split, shard)
    val partDir = new HPath(s"$path/split=$split/shard=$shard")
    val fs = FileSystem.get(partDir.toUri,
      spark.sparkContext.hadoopConfiguration)
    val tmp = new HPath(s"$path/.rewrite-$split-$shard.tmp")
    fs.delete(tmp, true)
    rows.coalesce(1)
      .sortWithinPartitions(col("shuffle_key"), col(idCol))
      .write.mode("overwrite").parquet(tmp.toString)
    fs.delete(new HPath(tmp, "_SUCCESS"), false)
    val backup = new HPath(s"$path/.rewrite-$split-$shard.bak")
    fs.delete(backup, true)
    val hadLive = fs.exists(partDir)
    if (hadLive && !fs.rename(partDir, backup))
      sys.error(s"swapShard: failed to move $partDir aside; " +
        "shard left untouched")
    if (!fs.rename(tmp, partDir)) {
      if (hadLive) fs.rename(backup, partDir)
      sys.error(s"swapShard: failed to move $tmp into place; " +
        "original shard restored")
    }
    fs.delete(backup, true)
  }

  /** Driver-side placement of one id: the same (split, shard) the
    * writer's Column expressions computed. */
  private def placementOf(ks: String, meta: LakeMeta): (String, Int) = {
    val b = jvmHash32(ks) % 100L
    val split = if (b < meta.trainPct) "train"
      else if (b < meta.trainPct + meta.valPct) "val" else "test"
    val shard = (jvmHash32(s"sh${meta.epoch}_" + ks) %
      meta.nShards.toLong).toInt
    (split, shard)
  }

  /** Targeted deletion — the right-to-be-forgotten path. Because
    * placement is deterministic (split from hash32(id) percent bucket,
    * shard from the epoch shuffle key), the affected (split, shard)
    * partitions are COMPUTED from the ids, never discovered by
    * scanning: cost scales with the number of touched shards, not the
    * corpus. Each touched shard is rewritten minus the deleted rows
    * with its baked-in (shuffle_key, id) order intact. Returns the
    * number of shards rewritten. */
  def deleteByKey(spark: SparkSession, path: String, idCol: String,
      keys: Seq[Any]): Int = {
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    recoverAll(spark, path)
    val meta = readMeta(spark, path)
    val byPart = keys.map(k => placementOf(k.toString, meta) -> k.toString)
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).toSet }
    var rewritten = 0
    byPart.foreach { case ((split, shard), ids) =>
      recoverShard(spark, path, split, shard)
      val partDir = new HPath(s"$path/split=$split/shard=$shard")
      val fs = FileSystem.get(partDir.toUri,
        spark.sparkContext.hadoopConfiguration)
      if (fs.exists(partDir)) {
        swapShard(spark, path, split, shard,
          spark.read.parquet(partDir.toString)
            .filter(!col(idCol).cast("string").isInCollection(ids)),
          idCol)
        rewritten += 1
      }
    }
    rewritten
  }

  /** Incremental ingestion — merge a crawl batch into an EXISTING lake
    * without touching unaffected shards. Placement columns are computed
    * with the writer's own expressions (parameters from
    * `_graft_meta.json`), the touched (split, shard) set is one
    * metadata-scale distinct, and each touched shard is rewritten as
    * existing ∪ batch in baked order via the crash-safe swap. Id
    * collisions: `replace = false` keeps the lake's row (idempotent
    * re-ingest — the reference's skip-if-exists semantics),
    * `replace = true` takes the batch's. Cost scales with shards
    * touched, not lake size; a steady crawl feed composes with
    * foreachBatch for a streaming lake writer. Returns the number of
    * shards rewritten. */
  def upsertBatch(spark: SparkSession, path: String, idCol: String,
      batch: DataFrame, replace: Boolean = false): Int = {
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    recoverAll(spark, path)
    val meta = readMeta(spark, path)
    // A crawl feed can carry the same id twice within one batch; landing
    // both rows would break the lake's one-row-per-id invariant that
    // deleteByKey and later upserts rely on. Keep one row per id with a
    // deterministic tiebreak (smallest full-row hash, then arbitrary-but-
    // stable row_number) rather than dropDuplicates' partition-order
    // nondeterminism.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(xxhash64(batch.columns.toSeq.flatMap(c =>
        Seq(col(c).isNull, col(c))): _*))
    val deduped = batch
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    val placed = Sampling.withSplit(deduped, idCol, meta.trainPct, meta.valPct)
      .withColumn("shuffle_key", Sampling.shuffleKey(col(idCol), meta.epoch))
      .withColumn("shard",
        pmod(col("shuffle_key"), lit(meta.nShards)).cast("int"))
      .persist()
    try {
      val parts = placed.select(col("split"), col("shard")).distinct()
        .collect().map(r => (r.getString(0), r.getInt(1)))
      parts.foreach { case (split, shard) =>
        recoverShard(spark, path, split, shard)
        val slice = placed
          .filter(col("split") === split && col("shard") === shard)
          .drop("split", "shard")
        val partDir = new HPath(s"$path/split=$split/shard=$shard")
        val fs = FileSystem.get(partDir.toUri,
          spark.sparkContext.hadoopConfiguration)
        val merged = if (!fs.exists(partDir)) slice else {
          val existing = spark.read.parquet(partDir.toString)
          if (replace)
            existing.join(slice.select(col(idCol)), Seq(idCol), "left_anti")
              .unionByName(slice)
          else
            slice.join(existing.select(col(idCol)), Seq(idCol), "left_anti")
              .unionByName(existing)
        }
        swapShard(spark, path, split, shard, merged, idCol)
      }
      parts.length
    } finally placed.unpersist()
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** One split's slice — partition pruning, never a full-lake scan. */
  def forSplit(spark: SparkSession, path: String, split: String): DataFrame =
    read(spark, path).filter(col("split") === split)

  /** The trainer-facing manifest: per (split, shard) example counts
    * and the shuffle-key range — what an epoch planner reads instead
    * of listing files. One aggregation job. */
  def manifest(spark: SparkSession, path: String): DataFrame =
    read(spark, path)
      .groupBy(col("split"), col("shard"))
      .agg(count(lit(1)).as("n_examples"),
        min(col("shuffle_key")).as("min_key"),
        max(col("shuffle_key")).as("max_key"))
      .orderBy(col("split"), col("shard"))
}

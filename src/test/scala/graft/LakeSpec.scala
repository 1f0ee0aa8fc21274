package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sinks.ReportXlsx
import graft.sources.XlsxLite

class LakeSpec extends SparkSpec {
  import spark.implicits._

  test("series lake partitions by catalog and prunes on read") {
    val dir = Files.createTempDirectory("graft-lake").toString
    val series = Seq(
      ("cat_a", "1", "1.1", "s1", java.sql.Date.valueOf("2020-01-01"), 1.0),
      ("cat_a", "1", "1.1", "s1", java.sql.Date.valueOf("2020-02-01"), 2.0),
      ("cat_b", "2", "2.1", "s2", java.sql.Date.valueOf("2020-01-01"), 3.0))
      .toDF("catalog_id", "dataset_id", "distribution_id", "serie_id",
        "indice_tiempo", "valor")
    SeriesLake.write(series, dir)
    // physical layout: one directory per catalog
    assert(Files.exists(java.nio.file.Paths.get(dir, "catalog_id=cat_a")))
    val slice = SeriesLake.forCatalog(spark, dir, "cat_a")
    assert(slice.count() == 2)
    // partition pruning visible in the plan: the catalog predicate is a
    // PartitionFilter (directory-level skip), not a data filter
    val p = slice.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("= cat_a"),
      s"partition pruning not applied:\n$p")
  }

  test("corpus lake: one file per shard, baked-in order, pruned splits") {
    val dir = Files.createTempDirectory("graft-corpus").toString
    val docs = Tables(spark, sf()).documents.select("doc_id", "text")
    val total = docs.count()
    CorpusLake.writeShards(docs, "doc_id", dir, epoch = 1, nShards = 4)

    // exactly ONE parquet file per (split, shard) directory
    val splitDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("split="))
    assert(splitDirs.nonEmpty)
    splitDirs.foreach { sd =>
      sd.listFiles().filter(_.getName.startsWith("shard=")).foreach { shd =>
        val files = shd.listFiles()
          .filter(_.getName.endsWith(".parquet"))
        assert(files.length == 1,
          s"${shd.getPath}: ${files.length} files, want 1")
      }
    }

    // split read prunes partitions
    val train = CorpusLake.forSplit(spark, dir, "train")
    val p = train.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("= train"),
      s"split pruning not applied:\n$p")

    // the canonical order is baked into each file: reading one shard
    // directory raw yields rows already sorted by shuffle_key
    val oneShard = splitDirs.head.listFiles()
      .filter(_.getName.startsWith("shard=")).head
    val keys = spark.read.parquet(oneShard.getPath)
      .select("shuffle_key").collect().map(_.getLong(0)).toSeq
    assert(keys == keys.sorted, "shard file not in shuffle order")

    // manifest accounts for every example exactly once
    val m = CorpusLake.manifest(spark, dir).collect()
    assert(m.map(_.getAs[Long]("n_examples")).sum == total)
    assert(m.map(_.getAs[Int]("shard")).forall(s => s >= 0 && s < 4))
  }

  test("corpus lake: persisted sketch states roll up without rescans") {
    // The lakehouse sketch pattern end-to-end: per-source sketch
    // states computed over the lake's train split, PERSISTED to
    // parquet, read back, and rolled up through the stored-state merge
    // aggregates — asserted bit-identical to a direct build over the
    // same lake read. The raw corpus is scanned once for the daily
    // states and once for the verification build; the rollup itself
    // touches only the sketch table.
    val dir = Files.createTempDirectory("graft-sketch-lake").toString
    val docs = Tables(spark, sf()).documents
      .select("doc_id", "text", "source")
    CorpusLake.writeShards(docs, "doc_id", dir, epoch = 1, nShards = 2)
    val S = graft.operators.Sketches
    val train = CorpusLake.forSplit(spark, dir, "train")
      .withColumn("h", graft.functions.GF.hash32(col("text")))
      .withColumn("len", length(col("text")).cast("long"))
    val states = train.groupBy(col("source"))
      .agg(S.kmvState(col("h"), 64).as("kmv"),
        S.cmsAgg(col("h"), 2, 32).as("cms"),
        S.hdrAgg(col("len"), 7).as("hdr"))
    val skDir = s"$dir/sketches"
    states.write.parquet(skDir)
    val merged = spark.read.parquet(skDir)
      .agg(S.kmvMergeState(col("kmv"), 64).as("kmv"),
        S.cmsMerge(col("cms"), 2, 32).as("cms"),
        S.hdrMerge(col("hdr")).as("hdr"))
      .select(S.longArrayDigest(col("kmv")).as("k"),
        S.cmsDigest(col("cms")).as("c"),
        S.hdrDigest(col("hdr")).as("h"),
        S.kmvEstimateFromState(col("kmv"), 64).as("est"))
      .collect().head
    val direct = train
      .agg(S.kmvState(col("h"), 64).as("kmv"),
        S.cmsAgg(col("h"), 2, 32).as("cms"),
        S.hdrAgg(col("len"), 7).as("hdr"))
      .select(S.longArrayDigest(col("kmv")).as("k"),
        S.cmsDigest(col("cms")).as("c"),
        S.hdrDigest(col("hdr")).as("h"),
        S.kmvEstimateFromState(col("kmv"), 64).as("est"))
      .collect().head
    assert(merged == direct, s"merged=$merged direct=$direct")
    assert(merged.getDouble(3) > 0.0)
  }

  test("corpus lake: re-sharding preserves the epoch permutation") {
    // the doc contract: nShards is a worker-count (metadata) choice, not
    // a semantic one — the epoch's example order derives only from
    // (shuffle_key, doc_id), so a zero-sort reader k-way-merging shard
    // files must see the IDENTICAL global sequence whatever nShards was
    val docs = Tables(spark, sf()).documents.select("doc_id", "text")
      .limit(400)

    def globalSeq(nShards: Int): Map[String, Seq[(Long, Long)]] = {
      val dir = Files.createTempDirectory(s"graft-reshard-$nShards").toString
      CorpusLake.writeShards(docs, "doc_id", dir, epoch = 1,
        nShards = nShards)
      new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("split=")).map { sd =>
          val split = sd.getName.stripPrefix("split=")
          val perShard = sd.listFiles()
            .filter(_.getName.startsWith("shard=")).toSeq.map { shd =>
              val rows = spark.read.parquet(shd.getPath)
                .select("shuffle_key", "doc_id").collect()
                .map(r => (r.getLong(0), r.getLong(1))).toSeq
              // in-file order IS the shard's stream order: pre-sorted
              assert(rows == rows.sorted,
                s"${shd.getPath} not in baked shuffle order")
              rows
            }
          // a zero-sort reader merges the sorted shard streams; merging
          // sorted sequences == sorting their concatenation
          split -> perShard.flatten.sorted
        }.toMap
    }

    val at4 = globalSeq(4)
    val at7 = globalSeq(7)
    assert(at4.keySet == at7.keySet)
    at4.foreach { case (split, seq) =>
      assert(seq == at7(split),
        s"split $split: epoch order changed with shard count")
    }
  }

  test("corpus lake: deleteByKey rewrites only computed shards, order intact") {
    val dir = Files.createTempDirectory("graft-del").toString
    val docs = Tables(spark, sf()).documents.select("doc_id", "text")
    CorpusLake.writeShards(docs, "doc_id", dir, epoch = 2, nShards = 4)
    val before = CorpusLake.read(spark, dir)
      .select("split", "shard", "shuffle_key", "doc_id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val victims = docs.select("doc_id").limit(3)
      .collect().map(_.getLong(0)).toSeq
    // which (split, shard) dirs the victims live in, per the data itself
    val victimParts = before.filter(v => victims.contains(v._4))
      .map(v => (v._1, v._2)).toSet
    assert(victimParts.nonEmpty)

    // snapshot every shard file's mtime before the delete
    def shardFiles(): Map[String, Long] = {
      val root = new java.io.File(dir)
      root.listFiles().filter(_.getName.startsWith("split=")).flatMap(
        _.listFiles().filter(_.getName.startsWith("shard=")).flatMap(
          _.listFiles().filter(_.getName.endsWith(".parquet"))))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    val filesBefore = shardFiles()

    val n = CorpusLake.deleteByKey(spark, dir, "doc_id", victims)
    assert(n == victimParts.size,
      s"rewrote $n shards, computed placement says ${victimParts.size}")

    // victims gone, everyone else present in identical baked order
    val after = CorpusLake.read(spark, dir)
      .select("split", "shard", "shuffle_key", "doc_id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(after.length == before.length - victims.length)
    assert(!after.exists(v => victims.contains(v._4)))
    def orderOf(rows: Array[(String, Int, Long, Long)]) =
      rows.groupBy(r => (r._1, r._2)).view
        .mapValues(_.map(x => (x._3, x._4)).sorted.toSeq).toMap
    val expect = orderOf(before.filterNot(v => victims.contains(v._4)))
    assert(orderOf(after) == expect)

    // untouched shards were not rewritten (same file, same mtime)
    val filesAfter = shardFiles()
    val untouchedBefore = filesBefore.filterNot { case (p, _) =>
      victimParts.exists { case (s, sh) => p.contains(s"split=$s/shard=$sh") } }
    untouchedBefore.foreach { case (p, t) =>
      assert(filesAfter.get(p).contains(t), s"untouched shard rewritten: $p")
    }

    // deleting an id that hashes to a never-written shard is a no-op
    assert(CorpusLake.readMeta(spark, dir).nShards == 4)
  }

  test("corpus lake: upsertBatch merges into placed shards, skip vs replace") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-upsert").toString
    val docs = Tables(spark, sf()).documents.select("doc_id", "text")
    CorpusLake.writeShards(docs, "doc_id", dir, epoch = 1, nShards = 4)
    val total = docs.count()
    val existingId = docs.select("doc_id").limit(1)
      .collect().head.getLong(0)

    def shardFiles(): Map[String, Long] = {
      val root = new java.io.File(dir)
      root.listFiles().filter(_.getName.startsWith("split=")).flatMap(
        _.listFiles().filter(_.getName.startsWith("shard=")).flatMap(
          _.listFiles().filter(_.getName.endsWith(".parquet"))))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    val before = shardFiles()

    // batch: two brand-new ids + one collision with changed text
    val batch = Seq((900001L, "brand new doc A"),
      (900002L, "brand new doc B"),
      (existingId, "MUTATED TEXT")).toDF("doc_id", "text")
    val n1 = CorpusLake.upsertBatch(spark, dir, "doc_id", batch)
    assert(n1 >= 1 && n1 <= 3)

    val after = CorpusLake.read(spark, dir)
    assert(after.count() == total + 2)
    // skip semantics: the lake's original text survives the collision
    val kept = after.filter(col("doc_id") === existingId)
      .select("text").collect().head.getString(0)
    assert(kept != "MUTATED TEXT")
    // new rows landed where the writer's own placement puts them:
    // re-deriving placement from the stored shuffle_key must agree
    val placedNew = after.filter(col("doc_id") >= 900001L)
      .select("doc_id", "shuffle_key", "shard").collect()
    assert(placedNew.length == 2)
    placedNew.foreach { r =>
      assert(r.getInt(2) == (r.getLong(1) % 4).toInt)
    }
    // order within every shard still baked
    val allRows = after.select("split", "shard", "shuffle_key", "doc_id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3)))
    allRows.groupBy(r => (r._1, r._2)).foreach { case (_, rs) =>
      val keys = rs.map(x => (x._3, x._4)).toSeq
      assert(keys == keys.sorted, "shard order broken by upsert")
    }
    // untouched shards not rewritten
    val afterFiles = shardFiles()
    val touchedDirs = after
      .filter(col("doc_id").isin(900001L, 900002L, existingId))
      .select("split", "shard").distinct().collect()
      .map(r => s"split=${r.getString(0)}/shard=${r.getInt(1)}").toSet
    before.foreach { case (p, t) =>
      if (!touchedDirs.exists(p.contains))
        assert(afterFiles.get(p).contains(t), s"untouched shard rewritten: $p")
    }

    // replace semantics: now the batch's text wins
    CorpusLake.upsertBatch(spark, dir, "doc_id",
      Seq((existingId, "MUTATED TEXT")).toDF("doc_id", "text"),
      replace = true)
    val kept2 = CorpusLake.read(spark, dir)
      .filter(col("doc_id") === existingId)
      .select("text").collect().head.getString(0)
    assert(kept2 == "MUTATED TEXT")
    assert(CorpusLake.read(spark, dir).count() == total + 2)
  }

  test("corpus lake: crash between swap renames is rolled back on next mutation") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-crash").toString
    val docs = Tables(spark, sf()).documents.select("doc_id", "text")
    CorpusLake.writeShards(docs, "doc_id", dir, epoch = 1, nShards = 4)
    val total = docs.count()

    // Simulate the crash window: partDir moved to .bak, replacement
    // never landed — the shard exists ONLY in the hidden backup.
    val root = new java.io.File(dir)
    val victim = root.listFiles().filter(_.getName.startsWith("split="))
      .flatMap(d => d.listFiles().filter(_.getName.startsWith("shard="))
        .map(s => (d.getName.stripPrefix("split="), s)))
      .head
    val (split, shardDir) = victim
    val shard = shardDir.getName.stripPrefix("shard=").toInt
    val nInShard = spark.read.parquet(shardDir.getPath).count()
    assert(nInShard > 0)
    val bak = new java.io.File(dir, s".rewrite-$split-$shard.bak")
    assert(shardDir.renameTo(bak), "test setup: rename to .bak failed")
    assert(!shardDir.exists())

    // An upsert touching that shard must first restore the backup, then
    // merge against the REAL old rows — not against nothing.
    val batch = Seq((910001L, "post-crash doc")).toDF("doc_id", "text")
    CorpusLake.upsertBatch(spark, dir, "doc_id", batch)
    val after = CorpusLake.read(spark, dir)
    assert(after.count() == total + 1,
      "rows lost: crash window not recovered before merge")
    assert(!bak.exists(), "stale backup left behind")
  }

  test("corpus lake: upsertBatch dedups ids within the batch itself") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-batchdup").toString
    val docs = Tables(spark, sf()).documents.select("doc_id", "text")
    CorpusLake.writeShards(docs, "doc_id", dir, epoch = 1, nShards = 4)
    val total = docs.count()
    // same id twice in one batch (common in crawl feeds)
    val batch = Seq((920001L, "dup A"), (920001L, "dup B"),
      (920002L, "solo")).toDF("doc_id", "text")
    CorpusLake.upsertBatch(spark, dir, "doc_id", batch)
    val after = CorpusLake.read(spark, dir)
    assert(after.count() == total + 2)
    assert(after.filter(col("doc_id") === 920001L).count() == 1,
      "one-row-per-id invariant broken by within-batch duplicate")
    // deterministic winner: re-running on a fresh lake picks the same row
    val dir2 = Files.createTempDirectory("graft-batchdup2").toString
    CorpusLake.writeShards(docs, "doc_id", dir2, epoch = 1, nShards = 4)
    CorpusLake.upsertBatch(spark, dir2, "doc_id",
      batch.repartition(7)) // different physical layout, same winner
    val w1 = after.filter(col("doc_id") === 920001L)
      .select("text").collect().head.getString(0)
    val w2 = CorpusLake.read(spark, dir2)
      .filter(col("doc_id") === 920001L)
      .select("text").collect().head.getString(0)
    assert(w1 == w2, "within-batch dedup winner not deterministic")
  }

  test("compaction rewrites a fragmented partition, data intact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-compact")
      .toString
    val series = (1L to 2000L).map(i =>
      ("c1", "1", "1.1", s"s${i % 4}", java.sql.Date.valueOf("2020-01-01"),
        i.toDouble))
      .toDF("catalog_id", "dataset_id", "distribution_id", "serie_id",
        "indice_tiempo", "valor")
    // fragment the partition the way incremental runs do
    series.repartition(24).write.mode("overwrite")
      .partitionBy("catalog_id").parquet(dir)
    def files() = new java.io.File(s"$dir/catalog_id=c1")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(files() >= 20)
    val before = SeriesLake.forCatalog(spark, dir, "c1")
      .agg(org.apache.spark.sql.functions.sum("valor")).head().getDouble(0)
    val n = SeriesLake.compactCatalog(spark, dir, "c1")
    assert(n == 1 && files() == 1)
    val after = SeriesLake.forCatalog(spark, dir, "c1")
      .agg(org.apache.spark.sql.functions.sum("valor")).head().getDouble(0)
    assert(before == after)
    assert(SeriesLake.compactCatalog(spark, dir, "missing") == 0)
  }

  test("K4 report XLSX sink round-trips the report") {
    val dir = Files.createTempDirectory("graft-k4")
    val report = Seq(
      ("1.1", "OK", ""), ("1.2", "ERROR", "boom"))
      .toDF("distribution_id", "distribution_status", "message")
    val path = dir.resolve("reporte-distributions.xlsx").toString
    ReportXlsx.write(report, path)
    val cells = XlsxLite.read(path)
    assert(cells.exists(c => c.row == 1 && c.value == "distribution_status"))
    assert(cells.exists(c => c.value == "boom"))
    // empty string cells written, nulls skipped
    assert(cells.count(_.row == 2) == 3)
  }
}

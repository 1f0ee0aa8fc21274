package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Round-5 extension operators: snapshot diff, vocabulary heavy
  * hitters (exact + Misra-Gries), incremental dedup against a
  * persisted signature index, winsorization, char entropy. */
class DeltaOpsSpec extends SparkSpec {
  import spark.implicits._

  test("snapshot diff: all four statuses, null-safe compare") {
    val oldSnap = Seq(
      (1L, Some("A"), 10L), (2L, Some("B"), 20L), (3L, Some("C"), 30L),
      (4L, None: Option[String], 40L))
      .toDF("k", "status_col", "v")
    val newSnap = Seq(
      (2L, Some("B"), 20L),                 // unchanged
      (3L, Some("C"), 31L),                 // changed (value)
      (4L, None: Option[String], 40L),      // unchanged (null == null)
      (5L, Some("E"), 50L))                 // added
      .toDF("k", "status_col", "v")
    val out = Snapshot.diff(oldSnap, newSnap, Seq("k"),
      Seq("status_col", "v"))
    val byKey = out.collect()
      .map(r => r.getLong(0) -> r.getString(r.fieldIndex("status"))).toMap
    assert(byKey == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "unchanged", 5L -> "added"))
    val summary = Snapshot.diffSummary(out).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(summary == Map("removed" -> 1L, "unchanged" -> 2L,
      "changed" -> 1L, "added" -> 1L))
  }

  test("snapshot diff: fingerprint mode classifies identically") {
    val t = Tables(spark, sf())
    val base = t.orders.select(col("o_orderkey"), col("o_orderstatus"),
      col("o_totalprice"))
    val mutated = base.withColumn("o_totalprice",
      when(col("o_orderkey") % 11 === 0, col("o_totalprice") + 1.0)
        .otherwise(col("o_totalprice")))
    val plain = Snapshot.diff(base, mutated, Seq("o_orderkey"),
        Seq("o_orderstatus", "o_totalprice"))
      .groupBy(col("status")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fp = Snapshot.diff(base, mutated, Seq("o_orderkey"),
        Seq("o_orderstatus", "o_totalprice"), fingerprint = true)
      .groupBy(col("status")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(plain == fp)
    assert(plain.getOrElse("changed", 0L) > 0L)
    assert(!plain.contains("added") && !plain.contains("removed"))
  }

  test("snapshot diff: fingerprint mode distinguishes NULL position shifts") {
    // xxhash64 skips NULL inputs, so without the per-column isNull flags
    // (a=NULL, b=5) and (a=5, b=NULL) would fingerprint identically and
    // a genuinely changed row would be classified 'unchanged'.
    val oldSnap = Seq((1L, None: Option[Long], Some(5L)),
      (2L, Some(7L), Some(7L)))
      .toDF("k", "a", "b")
    val newSnap = Seq((1L, Some(5L), None: Option[Long]),  // value moved a<->b
      (2L, Some(7L), Some(7L)))                            // untouched
      .toDF("k", "a", "b")
    val byKey = Snapshot.diff(oldSnap, newSnap, Seq("k"), Seq("a", "b"),
        fingerprint = true)
      .collect().map(r => r.getLong(0) ->
        r.getString(r.fieldIndex("status"))).toMap
    assert(byKey == Map(1L -> "changed", 2L -> "unchanged"))
  }

  test("psi drift: group present only in cur surfaces as sentinel row") {
    import graft.operators.Profiling
    val ref = (1 to 100).map(i => ("en", (i % 50).toLong)).toDF("grp", "v")
    val cur = (1 to 100).map(i =>
      (if (i % 2 == 0) "en" else "zz", (i % 50).toLong)).toDF("grp", "v")
    val rows = Profiling.psiDrift(ref, cur, "v", "grp", bins = 10)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("en", "zz"))
    val zz = rows("zz")
    assert(zz.isNullAt(zz.fieldIndex("psi")))
    assert(zz.getLong(zz.fieldIndex("n_bins_present")) == 0L)
    assert(!rows("en").isNullAt(rows("en").fieldIndex("psi")))
  }

  test("top tokens: exact ranks; Misra-Gries candidates cover them") {
    val docs = Tables(spark, sf()).documents
    val k = 8
    val exact = TextAnalysis.topTokens(docs, "text", "lang", k)
    val exactEn = exact.filter(col("stratum") === "en")
      .orderBy(col("rank")).collect()
    assert(exactEn.nonEmpty && exactEn.length <= k)
    // ranks are 1..n with counts non-increasing
    assert(exactEn.map(_.getInt(3)).toSeq == (1 to exactEn.length))
    val counts = exactEn.map(_.getLong(2))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })

    // Misra-Gries guarantee: every token with true count > N/(cap+1)
    // appears in the bounded candidate set
    val toks = docs.select(col("lang"),
      explode(graft.functions.GF.wsTokens(
        Dedup.normalizeText(col("text")))).as("tok"))
    val cap = 32
    val mg = Sketches.heavyHitters(toks, "lang", "tok", cap)
      .filter(col("lang") === "en").collect()
    assert(mg.length == 1)
    val candidates = mg.head.getSeq[org.apache.spark.sql.Row](1)
      .map(_.getString(0)).toSet
    assert(candidates.size <= cap)
    val total = toks.filter(col("lang") === "en").count()
    val mustHave = toks.filter(col("lang") === "en")
      .groupBy("tok").count()
      .filter(col("count") > total / (cap + 1))
      .collect().map(_.getString(0)).toSet
    assert(mustHave.subsetOf(candidates),
      s"missing: ${mustHave.diff(candidates)}")
  }

  test("incremental dedup: exact copies flagged, index prunes bands") {
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine ten"),
      (4L, "totally unrelated corpus content about engines"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sigidx-test").toString
    Dedup.writeSignatureIndex(corpus, "text", "doc_id", dir)
    // partition layout: band=N directories under buckets/
    val bands = new java.io.File(s"$dir/buckets").listFiles()
      .filter(_.getName.startsWith("band=")).map(_.getName).sorted
    assert(bands.sameElements(Array("band=0", "band=1", "band=2", "band=3")))

    val batch = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"), // copy of 0
      (3L, "brand new never seen text with many unique words here"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupAgainstIndex(batch, "text", "doc_id", dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(out(1L)._2 && out(1L)._1 >= 1L, s"copy not flagged: $out")
    assert(!out(3L)._2 && out(3L)._1 == 0L, s"fresh doc flagged: $out")
  }

  test("winsorize: thresholds bound clipped values, dirs exact") {
    val df = (1 to 100).map(i => ("g", i.toLong)).toDF("grp", "v")
    val out = Curation.winsorize(df, "grp", "v", 0.05, 0.95)
    val rows = out.collect()
    assert(rows.length == 100)
    val lo = rows.head.getDouble(rows.head.fieldIndex("lo"))
    val hi = rows.head.getDouble(rows.head.fieldIndex("hi"))
    // exact interpolated percentiles of 1..100
    assert(math.abs(lo - 5.95) < 1e-9 && math.abs(hi - 95.05) < 1e-9)
    rows.foreach { r =>
      val clipped = r.getDouble(r.fieldIndex("clipped"))
      val dir = r.getInt(r.fieldIndex("clip_dir"))
      val v = r.getLong(r.fieldIndex("v")).toDouble
      assert(clipped >= lo && clipped <= hi)
      assert(dir == (if (v < lo) -1 else if (v > hi) 1 else 0))
    }
    assert(rows.count(_.getInt(rows.head.fieldIndex("clip_dir")) == -1) == 5)
    assert(rows.count(_.getInt(rows.head.fieldIndex("clip_dir")) == 1) == 5)
  }

  test("psi drift: zero on identical populations, positive on shift") {
    import graft.operators.Profiling
    val ref = (1 to 200).map(i => ("g", (i % 50).toLong)).toDF("grp", "v")
    val same = Profiling.psiDrift(ref, ref, "v", "grp", bins = 10)
      .collect()
    assert(same.length == 1)
    assert(same.head.getDouble(same.head.fieldIndex("psi")) == 0.0)
    // shifted population: mass moves to the top bins -> psi well above
    // the 0.25 "shifted" bar
    val cur = (1 to 200).map(i => ("g", (25 + i % 25).toLong))
      .toDF("grp", "v")
    val drift = Profiling.psiDrift(ref, cur, "v", "grp", bins = 10)
      .collect().head
    assert(drift.getDouble(drift.fieldIndex("psi")) > 0.25,
      s"expected drift, got $drift")
    // degenerate reference (constant column) must not NaN
    val const = (1 to 10).map(_ => ("g", 7L)).toDF("grp", "v")
    val d2 = Profiling.psiDrift(const, const, "v", "grp").collect().head
    assert(d2.getDouble(d2.fieldIndex("psi")) == 0.0)
  }

  test("char entropy: closed-form cases, order-independent") {
    val df = Seq(
      (1L, "aaaa"),            // one symbol -> 0
      (2L, "abab"),            // two equiprobable -> ln 2
      (3L, "ab"),              // ln 2 regardless of length
      (4L, "abcd"),            // four equiprobable -> ln 4
      (5L, "")).toDF("id", "text")
    val out = df.select(col("id"),
        TextAnalysis.charEntropy(col("text")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 0.0)
    assert(math.abs(out(2L) - math.log(2)) < 1e-12)
    assert(math.abs(out(3L) - math.log(2)) < 1e-12)
    assert(math.abs(out(4L) - math.log(4)) < 1e-12)
    assert(out(5L) == 0.0)
    // permutation invariance (the fold never depends on char order)
    val perm = df.filter(col("id") === 2L).select(
      TextAnalysis.charEntropy(lit("baba")).as("e")).head().getDouble(0)
    assert(perm == out(2L))
  }

  test("signature index upsert: appends probe-visible, skipExisting drops re-crawls") {
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sigidx-upsert").toString
    Dedup.writeSignatureIndex(corpus, "text", "doc_id", dir)

    // batch carries one already-indexed doc and one genuinely new one
    val batch = Seq(
      (2L, "one two three four five six seven eight nine ten"),
      (7L, "totally unrelated corpus content about engines"))
      .toDF("doc_id", "text")
    assert(Dedup.upsertSignatureIndex(batch, "text", "doc_id", dir) == 1L)
    // steady-state re-crawl of the same batch adds nothing
    assert(Dedup.upsertSignatureIndex(batch, "text", "doc_id", dir) == 0L)

    // a copy of the upserted doc now probes as a duplicate
    val probe = Seq(
      (9L, "totally unrelated corpus content about engines"),
      (8L, "brand new never seen text with many unique words here"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupAgainstIndex(probe, "text", "doc_id", dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out(9L) && !out(8L), s"probe after upsert wrong: $out")
  }

  test("signature index compact: one sorted file per band, probe-equivalent, crash heals") {
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sigidx-compact").toString
    Dedup.writeSignatureIndex(corpus, "text", "doc_id", dir)
    Dedup.upsertSignatureIndex(
      Seq((7L, "totally unrelated corpus content about engines"))
        .toDF("doc_id", "text"), "text", "doc_id", dir)

    def parquetFiles(band: String) =
      new java.io.File(s"$dir/buckets/band=$band").listFiles()
        .filter(_.getName.endsWith(".parquet"))
    assert(parquetFiles("0").length >= 2, "append should add files")

    val before = spark.read.parquet(s"$dir/buckets")
      .collect().map(_.toString).sorted
    assert(Dedup.compactSignatureIndex(spark, dir) == 4)
    (0 to 3).foreach(b => assert(parquetFiles(b.toString).length == 1,
      s"band $b not compacted to one file"))
    val after = spark.read.parquet(s"$dir/buckets")
      .collect().map(_.toString).sorted
    assert(before.sameElements(after), "compaction changed postings")

    // simulate a crash between the two renames: live dir gone, backup
    // holds the sole copy — the next compact must heal before working
    val fsDir = new java.io.File(s"$dir/buckets")
    val live = new java.io.File(fsDir, "band=1")
    val bak = new java.io.File(fsDir, ".compact-1.bak")
    assert(live.renameTo(bak))
    assert(Dedup.compactSignatureIndex(spark, dir) == 4)
    val healed = spark.read.parquet(s"$dir/buckets")
      .collect().map(_.toString).sorted
    assert(before.sameElements(healed), "crash heal lost postings")
  }

  test("bm25 index probe returns exactly the direct-scan ranking, partition-pruned") {
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bm25-idx").toString
    TextAnalysis.writeBm25Index(docs, "text", "doc_id", dir)
    val terms = Seq("spark", "window", "join")
    val direct = TextAnalysis.bm25TopK(docs, "text", "doc_id", terms, k = 10)
      .collect().map(_.toString).sorted
    val probe = TextAnalysis.bm25FromIndex(spark, dir, terms, k = 10)
    val served = probe.collect().map(_.toString).sorted
    assert(direct.sameElements(served),
      s"index probe diverged:\n${direct.mkString("\n")}\nvs\n${served.mkString("\n")}")
    // the probe must touch only the query terms' bucket partitions —
    // the probe checkpoints the pruned postings internally (hiding the
    // scan from its final explain), so audit the identical scan shape
    val buckets = terms.map(t =>
      Math.floorMod(graft.functions.GF.hash32Jvm(t), 64))
    val scan = spark.read.parquet(s"$dir/postings")
      .filter(col("bucket").isin(buckets: _*))
      .filter(col("tok").isin(terms: _*))
    val p = scan.queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert(p.contains("PartitionFilters") && p.contains("bucket"),
      s"no partition pruning on postings:\n$p")
    assert(p.contains("PushedFilters") && p.contains("In(tok"),
      s"term filter not pushed into postings scan:\n$p")
  }

  test("bm25 index upsert: incremental build converges to the full-corpus ranking") {
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bm25-upsert").toString
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 === 1)
    TextAnalysis.writeBm25Index(half1, "text", "doc_id", dir)
    val added = TextAnalysis.upsertBm25Index(half2, "text", "doc_id", dir)
    assert(added == half2.count())
    // steady-state re-crawl adds nothing
    assert(TextAnalysis.upsertBm25Index(half2, "text", "doc_id", dir) == 0L)

    val terms = Seq("spark", "window", "join")
    val direct = TextAnalysis.bm25TopK(docs, "text", "doc_id", terms, k = 10)
      .collect().map(_.toString).sorted
    val served = TextAnalysis.bm25FromIndex(spark, dir, terms, k = 10)
      .collect().map(_.toString).sorted
    assert(direct.sameElements(served),
      s"upserted index diverged:\n${direct.mkString("\n")}\nvs\n${served.mkString("\n")}")

    // replayed upsert (crash-retry shape: same rows appended twice with
    // skipExisting off) must not change any score — the probe's max()
    // dedup absorbs byte-identical replays
    TextAnalysis.upsertBm25Index(
      half2.filter(col("doc_id") < 50), "text", "doc_id", dir,
      skipExisting = false)
    val replayed = TextAnalysis.bm25FromIndex(spark, dir, terms, k = 10)
      .collect().map(_.toString).sorted
    assert(direct.sameElements(replayed), "replayed upsert changed scores")

    // crash window between the stats delete and rename: only the tmp
    // remains — the next probe must heal (roll forward) and score as if
    // the swap had completed
    val statsDir = new java.io.File(s"$dir/stats")
    val tmpDir = new java.io.File(s"$dir/.stats.tmp")
    assert(statsDir.renameTo(tmpDir))
    val healed = TextAnalysis.bm25FromIndex(spark, dir, terms, k = 10)
      .collect().map(_.toString).sorted
    assert(direct.sameElements(healed), "stats crash-heal changed scores")
    assert(statsDir.exists && !tmpDir.exists, "heal did not land stats")
  }

  test("bm25 upsert: replay after a crash before the stats rewrite heals stats") {
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bm25-crash").toString
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 === 1)
    TextAnalysis.writeBm25Index(half1, "text", "doc_id", dir)
    // snapshot the half1-only corpus scalars — the STALE state a crash
    // between the postings/doclen appends and the stats rewrite leaves
    val stale = spark.read.parquet(s"$dir/stats")
      .select("n_docs", "sum_dl").collect().head
    assert(TextAnalysis.upsertBm25Index(half2, "text", "doc_id", dir) ==
      half2.count())
    // simulate that crash: postings/doclen hold the full corpus but
    // stats still describe half1 only
    import spark.implicits._
    Seq((stale.getLong(0), stale.getLong(1))).toDF("n_docs", "sum_dl")
      .write.mode("overwrite").parquet(s"$dir/stats")
    // the crash re-run finds every doc already present (nAdded == 0) —
    // it must STILL re-derive stats from doclen, or bm25FromIndex
    // scores diverge from the direct scan forever
    assert(TextAnalysis.upsertBm25Index(half2, "text", "doc_id", dir) == 0L)
    val terms = Seq("spark", "window", "join")
    val direct = TextAnalysis.bm25TopK(docs, "text", "doc_id", terms, k = 10)
      .collect().map(_.toString).sorted
    val served = TextAnalysis.bm25FromIndex(spark, dir, terms, k = 10)
      .collect().map(_.toString).sorted
    assert(direct.sameElements(served),
      "stale stats survived a replayed upsert")
  }

  test("chunkTokens: coverage, overlap and tail invariants") {
    val df = Seq(
      (1L, (1 to 30).map(i => s"t$i").mkString(" ")), // 30 tokens
      (2L, "a b c"),                                  // shorter than chunk
      (3L, (1 to 16).map(i => s"u$i").mkString(" "))) // exactly one chunk
      .toDF("doc_id", "text")
    val out = graft.operators.Packing
      .chunkTokens(df, "text", "doc_id", chunkSize = 16, overlap = 4)
      .collect()
      .groupBy(_.getLong(0))
    // doc 1: starts 0, 12, 24 -> lens 16, 16, 6
    val d1 = out(1L).sortBy(_.getInt(1))
    assert(d1.map(_.getLong(2)).sameElements(Array(0L, 12L, 24L)))
    assert(d1.map(_.getInt(3)).sameElements(Array(16, 16, 6)))
    // consecutive chunks share exactly `overlap` tokens
    val c0 = d1(0).getString(4).split(" "); val c1 = d1(1).getString(4).split(" ")
    assert(c0.takeRight(4).sameElements(c1.take(4)), "overlap tokens differ")
    // short doc: one whole chunk
    val d2 = out(2L)
    assert(d2.length == 1 && d2.head.getInt(3) == 3 &&
      d2.head.getString(4) == "a b c")
    // exact-fit doc: one chunk, not an empty tail
    assert(out(3L).length == 1 && out(3L).head.getInt(3) == 16)
  }
}

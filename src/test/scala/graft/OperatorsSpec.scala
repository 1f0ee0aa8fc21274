package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Dedup / similarity / text-analysis / multimodal operator semantics on
  * tiny in-memory frames. */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "The quick brown fox jumps over the lazy dog today"),
    (2L, "the quick brown fox jumps over the lazy dog today"), // casing dup
    (3L, "The quick brown fox jumps over the lazy cat today"), // near-dup
    (4L, "completely different content about spark engines and data"),
  ).toDF("doc_id", "text")

  test("pq: codes bounded, ADC keeps real recall against exact knn") {
    import graft.operators.Similarity
    val emb = Tables(spark, sf()).embeddings
    val books = Similarity.pqTrain(emb, "vec_id", "embedding",
      m = 4, k = 8, iters = 1, dims = 64)
    assert(books.size == 4 && books.forall(_.cells.size == 8))
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", books)
      .collect()
    assert(codes.forall(r => r.getSeq[Int](1).size == 4 &&
      r.getSeq[Int](1).forall(c => c >= 0 && c < 8)))
    // recall semantics need data with actual neighborhood structure
    // (the synthetic embeddings are near-random — max pairwise cosine
    // ~0.33 — so coarse PQ rightly cannot rank their top-5; the
    // cross-engine q55 oracle already pins the scoring math exactly).
    // Three well-separated clusters with deterministic jitter: every
    // ADC top-5 must come from the query's own cluster.
    val clustered = (for (c <- 0 until 3; i <- 0 until 30) yield {
      val v = (0 until 64).map(d =>
        (if (d / 22 == c) 1.0 else 0.0) +
          0.01 * math.sin(d * 13 + i * 7 + c)).toArray
      (c * 100L + i, v)
    }).toDF("vec_id", "embedding")
    val cBooks = Similarity.pqTrain(clustered, "vec_id", "embedding",
      m = 4, k = 8, iters = 2, dims = 64)
    val cCodes = Similarity.pqEncode(clustered, "vec_id", "embedding",
      cBooks)
    val top = Similarity.pqSearch(cCodes,
        clustered.filter(col("vec_id").isin(0L, 100L, 200L)),
        "vec_id", "embedding", cBooks, topK = 5)
      .collect()
    assert(top.length == 15)
    top.foreach { r =>
      assert(r.getLong(0) / 100 == r.getLong(1) / 100,
        s"ADC pulled ${r.getLong(1)} into cluster of ${r.getLong(0)}") }
  }

  test("profile: one job, exact metrics on a known frame") {
    import graft.operators.Profiling
    val df = Seq(
      (1L, Some(2.0), "a"), (2L, None, "b"),
      (3L, Some(4.0), "a"), (4L, Some(6.0), "c"))
      .toDF("id", "x", "s")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); () }
    }
    spark.sparkContext.addSparkListener(listener)
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val rows = try {
      val r = Profiling.profile(df, Seq("id", "x", "s")).collect()
      Thread.sleep(500)
      r
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
      spark.sparkContext.removeSparkListener(listener)
    }
    assert(jobs.get() <= 2, s"profile ran ${jobs.get()} jobs")
    val byCol = rows.map(r => r.getString(0) -> r).toMap
    assert(byCol("x").getAs[Long]("n_null") == 1)
    assert(byCol("x").getAs[Long]("n_distinct") == 3)
    assert(byCol("x").getAs[Double]("mean_value") == 4.0)
    assert(byCol("s").getAs[Long]("n_distinct") == 3)
    assert(byCol("s").isNullAt(6)) // no mean for strings
    assert(byCol("id").getAs[String]("min_value") == "1" &&
      byCol("id").getAs[String]("max_value") == "4")
  }

  test("q26: HLL approx stays within ±5% of exact (the oracle's bound)") {
    val rows = SparkEntry.queries("q26_approx_distinct")(spark, sf())
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("approx_within_5pct")),
      rows.mkString(", "))
  }

  test("exact dedup is case/punctuation-insensitive, keeps min id") {
    val groups = Dedup.exactDuplicateGroups(docs, "text", "doc_id").collect()
    assert(groups.length == 1)
    assert(groups.head.getAs[Long]("group_size") == 2)
    assert(groups.head.getAs[Long]("keeper_id") == 1L)
    val kept = Dedup.exactDedup(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L))
  }

  test("minhash: identical docs share the full signature, near-dups collide") {
    val sig = Dedup.minhashSignature(docs, "text", "doc_id", k = 8)
    val bySig = sig.collect().map(r => r.getAs[Long]("doc_id") ->
      (0 until 8).map(i => r.getAs[Long](s"mh$i"))).toMap
    assert(bySig(1L) == bySig(2L))
    assert(bySig(1L) != bySig(4L))
    val pairs = Dedup.candidatePairs(
      Dedup.lshBuckets(sig, "doc_id", 8, 4), "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 4L)))
  }

  test("candidatePairs cap: a 10k-doc mega-bucket emits star pairs, not 50M") {
    // every doc lands in the same (band, bucket); a normal bucket of 3
    // rides along to prove small buckets keep all-pairs semantics
    val mega = (0L until 10000L).map(i => (i, 0, "deadbeef"))
    val small = (20000L until 20003L).map(i => (i, 1, "cafe"))
    val buckets = (mega ++ small).toDF("doc_id", "band", "bucket")
    val capped = Dedup.candidatePairs(buckets, "doc_id",
      maxBucketSize = 100)
    val got = capped.collect().map(r => (r.getLong(0), r.getLong(1)))
    // star: 9999 hub pairs; small bucket: 3 all-pairs
    assert(got.length == 9999 + 3, s"got ${got.length}")
    assert(got.filter(_._1 == 0L).length == 9999,
      "mega-bucket must collapse to min-id star")
    assert(got.toSet.contains((20000L, 20001L)) &&
      got.toSet.contains((20000L, 20002L)) &&
      got.toSet.contains((20001L, 20002L)))
    val over = Dedup.overCapBuckets(buckets, "doc_id", 100).collect()
    assert(over.length == 1 && over.head.getAs[Long]("n_docs") == 10000L)
    // the capped path must stay shuffle-keyed equi-joins: no nested
    // loop, no cartesian anywhere in the physical plan
    val p = capped.queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"capped candidate generation lost the equi-join:\n$p")
  }

  test("candidatePairs cap: cap above every bucket size reproduces uncapped pairs") {
    val sig = Dedup.minhashSignature(docs, "text", "doc_id", k = 8)
    val buckets = Dedup.lshBuckets(sig, "doc_id", 8, 4)
    val unc = Dedup.candidatePairs(buckets, "doc_id",
        maxBucketSize = Int.MaxValue)
      .as[(Long, Long)].collect().toSet
    val cap = Dedup.candidatePairs(buckets, "doc_id", maxBucketSize = 1000)
      .as[(Long, Long)].collect().toSet
    assert(unc == cap)
  }

  test("candidatePairs DEFAULT path: a >1024-doc mega-bucket is star-demoted without opting in") {
    // r8 verdict: the cap existed but no production path set it — the
    // default must bound the blow-up on its own
    val mega = (0L until 1500L).map(i => (i, 0, "deadbeef"))
    val buckets = mega.toDF("doc_id", "band", "bucket")
    val got = Dedup.candidatePairs(buckets, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 1499,
      s"default candidatePairs must cap a 1500-doc bucket: ${got.length}")
    assert(got.forall(_._1 == 0L), "star pairs must anchor at the min-id hub")
  }

  test("dedupAgainstIndex DEFAULT path: over-cap index bucket truncates n_hits and flags hits_capped") {
    val txt = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = (0L until 1030L).map(i => (i, txt)).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sigidx-defcap").toString
    Dedup.writeSignatureIndex(corpus, "text", "doc_id", dir)
    val batch = Seq((5000L, txt),
      (5001L, "brand new never seen text with many unique words here"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupAgainstIndex(batch, "text", "doc_id", dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2),
        r.getBoolean(3)))).toMap
    // 1030 identical corpus docs share all 4 band buckets; the capped
    // probe keeps the 1024 smallest corpus_ids per bucket (same set in
    // every band), so n_hits is the cap and the truncation is flagged
    assert(out(5000L) == ((1024L, true, true)), s"capped probe wrong: $out")
    assert(out(5001L) == ((0L, false, false)), s"fresh doc wrong: $out")
  }

  test("adaptiveLshBlocks: under-cap corpora match fixed-depth exactly; dense blocks refine to the cap") {
    import graft.operators.Similarity
    val vecs = (0L until 600L).map(i =>
      (i, (0 until 64).map(d => math.sin(i * 0.37 + d * 1.13)).toArray))
      .toDF("vec_id", "embedding")
    // parity: cap above n ⇒ the blocking IS fixed-depth baseBits
    val fixed = vecs.withColumn("blk",
        Similarity.lshBucketExpr(col("embedding"), nBits = 4) +
          lit(4L << 24))
      .select("vec_id", "blk").as[(Long, Long)].collect().toMap
    val par = Similarity.adaptiveLshBlocks(vecs, "embedding", "blk",
        baseBits = 4, maxBlockSize = 1000)
      .select("vec_id", "blk").as[(Long, Long)].collect().toMap
    assert(par == fixed, "cap above every block must reproduce fixed depth")
    // refinement: tiny cap forces deeper bits; every block lands at or
    // under the cap unless it hit the maxBits floor
    val ref = Similarity.adaptiveLshBlocks(vecs, "embedding", "blk",
      baseBits = 1, maxBlockSize = 64, refineStep = 2, maxBits = 19)
    assert(ref.count() == 600, "refinement must not drop or duplicate rows")
    val sizes = ref.groupBy(col("blk")).agg(count(lit(1)).as("n"))
      .select((col("blk") / lit(1L << 24)).cast("int").as("bits"), col("n"))
      .as[(Int, Long)].collect()
    assert(sizes.forall { case (bits, n) => n <= 64 || bits == 19 },
      s"over-cap block below the maxBits floor survived: ${sizes.toSeq}")
    assert(sizes.exists(_._1 > 1), "dense base blocks must have refined")
    // refinement only SPLITS: deeper co-blocking implies base co-blocking
    val baseBlk = vecs.withColumn("blk",
        Similarity.lshBucketExpr(col("embedding"), nBits = 1))
      .select("vec_id", "blk").as[(Long, Long)].collect().toMap
    val refBlk = ref.select("vec_id", "blk").as[(Long, Long)]
      .collect().toMap
    val byRef = refBlk.toSeq.groupBy(_._2).values
    assert(byRef.forall(g => g.map(kv => baseBlk(kv._1)).distinct.size == 1),
      "a refined block must sit inside one base block")
  }

  test("ngram jaccard: identical=1, near-dup in (0,1), disjoint=0") {
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id1", "id2")
    val j = Dedup.ngramJaccard(docs, pairs, "text", "doc_id")
      .select("id1", "id2", "jaccard").as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(j((1L, 2L)) == 1.0)
    assert(j((1L, 3L)) > 0 && j((1L, 3L)) < 1)
    assert(j((1L, 4L)) == 0.0)
  }

  test("simhash: hamming distance small for near-dups, large for unrelated") {
    val sh = Dedup.simhash(docs, "text", "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(1L), sh(2L)) == 0)
    assert(hamming(sh(1L), sh(3L)) < hamming(sh(1L), sh(4L)))
  }

  test("cosine knn: self-similar vector ranks first") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)), (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)), (3L, Array(0.0f, 0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val knn = Similarity.bruteForceKnn(
      vecs.filter(col("vec_id") === 0), vecs, "vec_id", "embedding", 2)
      .collect()
    assert(knn.head.getAs[Long]("cand_id") == 1L)
    assert(knn.head.getAs[Double]("sim") > 0.99)
    assert(knn.length == 2)
  }

  test("lsh signature buckets identical vectors together") {
    val vecs = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f)), (1L, Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(-1.0f, -2.0f, -3.0f)))
      .toDF("vec_id", "embedding")
    val sig = Similarity.lshSignature(vecs, "vec_id", "embedding", 8, dims = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(0L) == sig(1L))
    assert(sig(0L) != sig(2L)) // opposite vector flips every plane sign
  }

  test("langId guesses by stopwords with deterministic ties") {
    val t = Seq(
      (1L, "the cat and the dog of a house"),
      (2L, "el perro y la casa de los gatos"),
      (3L, "zzz qqq www")) // no stopwords -> und
      .toDF("doc_id", "text")
    val out = t.select(col("doc_id"),
      TextAnalysis.langId(col("text")).as("g")).as[(Long, String)]
      .collect().toMap
    assert(out(1L) == "en")
    assert(out(2L) == "es")
    assert(out(3L) == "und")
  }

  test("quality score rewards stopword-rich prose, penalizes noise") {
    val t = Seq(
      (1L, "the cat and the dog of a house in the garden is that nice"),
      (2L, "@@@ ### $$$ %%% ^^^ &&& *** ((( )))"))
      .toDF("doc_id", "text")
    val q = TextAnalysis.qualityScore(t, "text")
      .select("doc_id", "quality_score").as[(Long, Double)].collect().toMap
    assert(q(1L) > q(2L))
  }

  test("Spread.fewFileScan guards on scan splits, not file count") {
    val dir = java.nio.file.Files.createTempDirectory("spread").toString
    // ONE parquet file, ~1 MB of rows
    spark.range(150000L).selectExpr("id", "repeat('x', 8) as pad")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val key = "spark.sql.files.maxPartitionBytes"
    val prior = spark.conf.get(key)
    try {
      // small splits: the single file splits into >= defaultParallelism
      // scan partitions (the many-row-group production shape) — the
      // guard must PASS THROUGH, file count notwithstanding
      spark.conf.set(key, (64 * 1024).toString)
      val manySplit = spark.read.parquet(dir)
      assert(manySplit.rdd.getNumPartitions >=
        spark.sparkContext.defaultParallelism)
      assert(Spread.fewFileScan(manySplit) eq manySplit)
      // huge splits: one scan partition — the guard spreads
      spark.conf.set(key, (512 * 1024 * 1024).toString)
      val oneSplit = spark.read.parquet(dir)
      assert(oneSplit.rdd.getNumPartitions <
        spark.sparkContext.defaultParallelism)
      val spread = Spread.fewFileScan(oneSplit)
      assert(!(spread eq oneSplit))
      assert(spread.rdd.getNumPartitions ==
        spark.sparkContext.defaultParallelism)
      // identical row multiset either way
      assert(spread.orderBy("id").collect().toSeq ==
        oneSplit.orderBy("id").collect().toSeq)
      // derived frame (no input files): not classifiable — pass through
      val derived = oneSplit.localCheckpoint(false)
      assert(Spread.fewFileScan(derived) eq derived)
    } finally spark.conf.set(key, prior)
  }

  test("qualityQuantileGate: distributed threshold bit-equal to builtin percentile") {
    // randomized-but-deterministic corpus: ties, near-boundary values,
    // integral scores, null scores, a single-row stratum and an
    // all-null stratum — every branch of the interpolation replay
    val rnd = new scala.util.Random(42)
    val rows = (1 to 400).map { i =>
      val lang = s"l${i % 5}"
      val score: java.lang.Double =
        if (i % 17 == 0) null
        else if (i % 3 == 0) (rnd.nextInt(8) + 1).toDouble // heavy ties
        else math.floor(rnd.nextDouble() * 1e7) / 1e3
      (i.toLong, lang, score)
    } ++ Seq((401L, "solo", java.lang.Double.valueOf(3.25)),
      (402L, "allnull", null.asInstanceOf[java.lang.Double]),
      (403L, "allnull", null.asInstanceOf[java.lang.Double]))
    val df = rows.toDF("doc_id", "lang", "sc")
    for (q <- Seq(0.25, 0.5, 0.75, 0.99)) {
      val got = TextAnalysis.qualityQuantileGate(df, "lang", "sc", q)
        .select("doc_id", "threshold", "kept")
        .as[(Long, Option[Double], Option[Boolean])].collect().toSeq.sorted
      val want = {
        val th = df.groupBy(col("lang"))
          .agg(round(percentile(col("sc"), lit(q)), 6).as("threshold"))
        df.join(broadcast(th), Seq("lang"))
          .withColumn("kept", col("sc") >= col("threshold"))
          .select("doc_id", "threshold", "kept")
          .as[(Long, Option[Double], Option[Boolean])].collect().toSeq.sorted
      }
      assert(got == want, s"q=$q")
    }
    // integral score column (no cast on the caller side)
    val intDf = (1 to 100).map(i => (i.toLong, s"g${i % 3}", (i * 7) % 23))
      .toDF("doc_id", "g", "sc")
    val gotI = TextAnalysis.qualityQuantileGate(intDf, "g", "sc", 0.6)
      .select("doc_id", "threshold", "kept")
      .as[(Long, Double, Boolean)].collect().toSeq.sorted
    val wantI = {
      val th = intDf.groupBy(col("g"))
        .agg(round(percentile(col("sc"), lit(0.6)), 6).as("threshold"))
      intDf.join(broadcast(th), Seq("g"))
        .withColumn("kept", col("sc") >= col("threshold"))
        .select("doc_id", "threshold", "kept")
        .as[(Long, Double, Boolean)].collect().toSeq.sorted
    }
    assert(gotI == wantI)
  }

  test("winnowing fingerprints overlap for overlapping docs") {
    val t = Seq(
      (1L, "a b c d e f g h i j k l m n o p"),
      (2L, "a b c d e f g h i j k l m n o p"),
      (3L, "q r s t u v w x y z aa bb cc dd ee ff"))
      .toDF("doc_id", "text")
    val fp = TextAnalysis.winnowingFingerprints(t, "text", "doc_id")
      .as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(fp(1L) == fp(2L))
    assert((fp(1L) & fp(3L)).isEmpty)
    assert(fp(1L).nonEmpty)
  }

  test("batched decode/resize keeps aspect ratio and covers all rows") {
    val meta = MultiModal.decodeImageMetaStub(
      MultiModal.attachPayload(docs, "text"))
    val out = MultiModal.decodeResizeBatched(meta, maxEdge = 100,
      batchSize = 2).collect()
    assert(out.length == 4)
    out.foreach { r =>
      val (w, h) = (r.getAs[Long]("width"), r.getAs[Long]("height"))
      val (rw, rh) = (r.getAs[Long]("resized_w"), r.getAs[Long]("resized_h"))
      assert(math.max(rw, rh) <= 100)
      if (math.max(w, h) <= 100) assert(rw == w && rh == h)
      assert(r.getAs[Long]("thumb_bytes") > 0)
    }
  }

  test("BMP codec: encode/decode round-trip, padded strides, header expressions") {
    import spark.implicits._
    // odd width -> non-zero row padding; decoder must skip it
    val w = 5; val h = 3
    val bytes = MultiModal.encodeBmp24(w, h,
      (x, y, c) => (10 * x + 100 * y + c) % 256)
    assert(bytes.length == 54 + MultiModal.bmpStride(w) * h)
    assert(MultiModal.bmpStride(w) == 16) // 15 data bytes + 1 pad
    val (dw, dh, mr, mg, mb) = MultiModal.decodeBmp24(bytes)
    assert((dw, dh) == ((w, h)))
    // closed-form means over the generator (padding excluded)
    val px = for (x <- 0 until w; y <- 0 until h) yield (x, y)
    def m(c: Int) =
      px.map { case (x, y) => (10 * x + 100 * y + c) % 256 }.sum.toDouble / px.size
    assert(math.abs(mr - m(0)) < 1e-12)
    assert(math.abs(mg - m(1)) < 1e-12)
    assert(math.abs(mb - m(2)) < 1e-12)

    // the expression-side header parse agrees with the Scala decoder
    // and flags non-BMP payloads instead of mis-parsing them
    val rows = MultiModal.decodeBmpMeta(
      Seq((1L, bytes), (2L, "not a bitmap at all".getBytes("UTF-8")))
        .toDF("doc_id", "payload"))
      .select("doc_id", "is_bmp", "width", "height", "channels")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getBoolean(1))
    assert(rows(1L).getLong(2) == w && rows(1L).getLong(3) == h)
    assert(rows(1L).getLong(4) == 3L)
    assert(!rows(2L).getBoolean(1) && rows(2L).isNullAt(2))
  }

  test("WAV codec: encode/decode round-trip, header expressions, stereo interleave") {
    import spark.implicits._
    // stereo with distinct per-channel samples: the decoder must walk
    // the interleaved frames, not assume mono
    val (rate, nCh, nFrames) = (16000, 2, 7)
    def sample(i: Int, ch: Int) = 100 * i - 300 + ch * 17
    val bytes = MultiModal.encodeWavPcm16(rate, nCh, nFrames, sample)
    assert(bytes.length == 44 + nFrames * nCh * 2)
    val df = Seq((1L, bytes),
      (2L, "certainly not audio".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val meta = MultiModal.decodeWavMeta(df)
      .select("doc_id", "is_wav", "sample_rate", "n_channels",
        "n_frames", "duration_ms")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(meta(1L).getBoolean(1))
    assert(meta(1L).getLong(2) == rate && meta(1L).getLong(3) == nCh)
    assert(meta(1L).getLong(4) == nFrames)
    assert(meta(1L).getLong(5) == nFrames * 1000L / rate)
    assert(!meta(2L).getBoolean(1) && meta(2L).isNullAt(2))

    val st = MultiModal.wavSampleStats(df.filter($"doc_id" === 1L))
      .collect().head
    val all = for (i <- 0 until nFrames; ch <- 0 until nCh)
      yield sample(i, ch).toLong
    assert(st.getLong(st.fieldIndex("sum_samples")) == all.sum)
    assert(st.getLong(st.fieldIndex("sum_sq")) == all.map(v => v * v).sum)
    assert(st.getLong(st.fieldIndex("n_frames")) == nFrames)

    // a RIFF/WAVE container whose first chunk is LIST (legal WAV,
    // non-canonical layout): the fixed-offset field reads would return
    // garbage, so the decoder must DECLINE (is_wav = false) instead of
    // reporting mis-read sample_rate/n_channels/n_frames
    val listChunk = bytes.clone()
    "LIST".getBytes("US-ASCII").copyToArray(listChunk, 12)
    val nonCanon = MultiModal.decodeWavMeta(
      Seq((3L, listChunk)).toDF("doc_id", "payload"))
      .select("is_wav", "sample_rate").collect().head
    assert(!nonCanon.getBoolean(0) && nonCanon.isNullAt(1),
      "non-canonical WAV layout must be declined, not mis-parsed")

    // negative samples survive the 16-bit round-trip exactly
    val neg = MultiModal.encodeWavPcm16(8000, 1, 3, (i, _) => -1000 + i)
    val stNeg = MultiModal.wavSampleStats(
      Seq((9L, neg)).toDF("doc_id", "payload")).collect().head
    assert(stNeg.getLong(stNeg.fieldIndex("sum_samples")) == -2997L)
  }

  test("ImageIO in-memory guard: every codec entry restores useCache=false") {
    // Regression guard for the r12 find: javax.imageio's default
    // useCache=true creates a local-disk temp file PER IMAGE, which
    // hid behind a plausible "codec-bound" explanation for a full
    // round. Every ImageIO-touching entry point must route through
    // ImageIoInMemory(); removing the call from any path fails here.
    // Payloads are materialized FIRST so the lazy encode stage (whose
    // own guard would mask a missing decode-side guard in the same
    // pipeline) never runs inside the checked action.
    import spark.implicits._
    val payloads = MultiModal.syntheticImage(
      Seq(1L, 2L, 3L).toDF("doc_id"), "doc_id", "png")
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1))).toSeq
    val imgs = payloads.toDF("doc_id", "payload")
    def check(label: String)(action: => Unit): Unit = {
      javax.imageio.ImageIO.setUseCache(true)
      action
      assert(!javax.imageio.ImageIO.getUseCache,
        s"$label left ImageIO.useCache=true — per-image temp-file churn is back")
    }
    check("imagePixelStats")(MultiModal.imagePixelStats(imgs).collect())
    check("imageMeta")(MultiModal.imageMeta(imgs).collect())
    check("imagePixelStatsTolerant")(
      MultiModal.imagePixelStatsTolerant(imgs).collect())
    check("imageAHash")(MultiModal.imageAHash(imgs).collect())
    check("imageDHash")(MultiModal.imageDHash(imgs).collect())
    check("encodeImageIO")(
      MultiModal.encodeImageIO("png", 4, 4, (_, _, _) => 0))
    javax.imageio.ImageIO.setUseCache(false) // leave the JVM clean
  }

  test("ImageIO tier: PNG lossless round-trip, JPEG header probe") {
    import spark.implicits._
    val ids = Seq(3L, 17L, 42L).toDF("doc_id")
    // PNG: lossless — decoded means must hit the generator's closed form
    val png = MultiModal.imagePixelStats(
        MultiModal.syntheticImage(ids, "doc_id", "png"))
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(3L, 17L, 42L)) {
      val r = png(id)
      val (w, h) = ((id % 16 + 1).toInt, (id % 8 + 1).toInt)
      assert(r.getLong(1) == w && r.getLong(2) == h)
      assert(r.getLong(3) == 3L)
      val px = for (x <- 0 until w; y <- 0 until h) yield (x, y)
      def m(c: Int) = px.map { case (x, y) =>
        ((id + 7 * x + 13 * y + 31 * c) % 256).toDouble }.sum / px.size
      assert(math.abs(r.getDouble(4) - m(0)) < 1e-9, s"mean_r id=$id")
      assert(math.abs(r.getDouble(5) - m(1)) < 1e-9)
      assert(math.abs(r.getDouble(6) - m(2)) < 1e-9)
    }
    // JPEG: header probe reports format/dims/bands without pixel decode
    val jm = MultiModal.imageMeta(
        MultiModal.syntheticImage(ids, "doc_id", "jpg"))
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(3L, 17L, 42L)) {
      val r = jm(id)
      assert(r.getString(1) == "jpeg")
      assert(r.getLong(2) == id % 16 + 1 && r.getLong(3) == id % 8 + 1)
      assert(r.getLong(4) == 3L)
      assert(r.getLong(5) > 0L)
    }
    // the probe also recognizes PNG payloads as png
    val pf = MultiModal.imageMeta(
        MultiModal.syntheticImage(ids.limit(1), "doc_id", "png"))
      .select("format").head().getString(0)
    assert(pf == "png")
  }

  test("ImageIO tier: aHash bits match the closed form; uniform image hashes 0") {
    import spark.implicits._
    val ids = Seq(3L, 17L, 42L).toDF("doc_id")
    val hs = MultiModal.imageAHash(
        MultiModal.syntheticImage(ids, "doc_id", "png"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (id <- Seq(3L, 17L, 42L)) {
      // brute-force reference from the generator's closed form
      val (w, h) = ((id % 16 + 1).toInt, (id % 8 + 1).toInt)
      val cs = new Array[Long](8); val cc = new Array[Long](8)
      var ts = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val gray = (0 to 2).map(c => (id + 7 * x + 13 * y + 31 * c) % 256).sum
        val cell = (y * 2 / h) * 4 + (x * 4 / w)
        cs(cell) += gray; cc(cell) += 1; ts += gray
      }
      val expected = (0 until 8)
        .filter(i => cs(i) * (w.toLong * h) > ts * cc(i))
        .map(1L << _).sum
      assert(hs(id) == expected, s"ahash mismatch for id=$id")
    }
    // a uniform image has no cell brighter than the mean -> hash 0
    val flat = Seq((7L, MultiModal.encodeImageIO("png", 8, 8,
      (_, _, _) => 128))).toDF("doc_id", "payload")
    assert(MultiModal.imageAHash(flat).head().getLong(1) == 0L)
  }

  test("ImageIO tier: dHash bits match the closed form; exposure shift leaves dHash fixed") {
    import spark.implicits._
    val ids = Seq(3L, 17L, 42L).toDF("doc_id")
    val hs = MultiModal.imageDHash(
        MultiModal.syntheticImage(ids, "doc_id", "png"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (id <- Seq(3L, 17L, 42L)) {
      val (w, h) = ((id % 16 + 1).toInt, (id % 8 + 1).toInt)
      val cs = new Array[Long](10); val cc = new Array[Long](10)
      for (y <- 0 until h; x <- 0 until w) {
        val gray = (0 to 2).map(c => (id + 7 * x + 13 * y + 31 * c) % 256).sum
        val cell = (y * 2 / h) * 5 + (x * 5 / w)
        cs(cell) += gray; cc(cell) += 1
      }
      var expected = 0L
      for (gy <- 0 until 2; gx <- 0 until 4) {
        val l = gy * 5 + gx
        if (cs(l + 1) * cc(l) > cs(l) * cc(l + 1))
          expected |= 1L << (gy * 4 + gx)
      }
      assert(hs(id) == expected, s"dhash mismatch for id=$id")
    }
    // a global exposure shift (no clipping) preserves every left-right
    // gradient comparison, so dHash is invariant — the property aHash
    // (compare-to-global-mean) does not have in general
    val base = (x: Int, y: Int, c: Int) => 40 + 10 * x + 5 * y + c
    val img1 = Seq((1L, MultiModal.encodeImageIO("png", 8, 4, base)))
      .toDF("doc_id", "payload")
    val img2 = Seq((1L, MultiModal.encodeImageIO("png", 8, 4,
      (x, y, c) => base(x, y, c) + 60))).toDF("doc_id", "payload")
    val d1 = MultiModal.imageDHash(img1).head().getLong(1)
    val d2 = MultiModal.imageDHash(img2).head().getLong(1)
    assert(d1 == d2 && d1 != 0L, s"dhash not exposure-invariant: $d1 vs $d2")
  }

  test("embeddingHygiene flags NaN vectors, zero vectors, and dim drift") {
    import spark.implicits._
    val rows = Seq(
      ("a", Array(3.0f, 4.0f)),       // norm 5
      ("a", Array(0.0f, 0.0f)),       // all-zero
      ("a", Array(Float.NaN, 1.0f)),  // non-finite
      ("b", Array(1.0f, 0.0f, 0.0f)), // dim 3
      ("b", Array(0.0f, 2.0f)))       // dim 2 -> drift inside group b
      .toDF("grp", "embedding")
    val got = Profiling.embeddingHygiene(rows, "embedding", "grp")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getLong(1) == 3, "n_vecs")
    assert(a.getLong(2) == 2 && a.getLong(3) == 2, "dims consistent in a")
    assert(a.getLong(4) == 1, "one non-finite vector")
    assert(a.getLong(5) == 1, "one zero vector")
    val b = got("b")
    assert(b.getLong(2) == 2 && b.getLong(3) == 3, "dim drift visible")
    assert(b.getLong(4) == 0 && b.getLong(5) == 0)
    assert(b.getDouble(6) == 1.0 && b.getDouble(7) == 2.0, "norm envelope")
  }

  test("lshMultiProbeKnn: probes=1 equals lshKnn; more probes never lose recall") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 120L).map(i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val qs = vecs.filter(col("vec_id") < 6)
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "cand_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val single = Similarity.lshKnn(vecs, qs, "vec_id", "embedding",
      nBits = 6, k = 4, dims = 16)
    val mp1 = Similarity.lshMultiProbeKnn(vecs, qs, "vec_id", "embedding",
      nBits = 6, k = 4, probes = 1, dims = 16)
    assert(asSet(mp1) == asSet(single), "probes=1 must equal lshKnn")
    // recall vs exact truth is monotone in probes: the candidate set
    // only grows, so every true neighbor found at p probes survives
    val exact = Similarity.bruteForceKnn(qs, vecs, "vec_id", "embedding", 4)
    val mp3 = Similarity.lshMultiProbeKnn(vecs, qs, "vec_id", "embedding",
      nBits = 6, k = 4, probes = 3, dims = 16)
    def recall(df: org.apache.spark.sql.DataFrame) =
      Similarity.recallAtK(df, exact, k = 4)
        .agg(sum(col("n_hits"))).head().getLong(0)
    val (r1, r3) = (recall(mp1), recall(mp3))
    assert(r3 >= r1, s"multi-probe lost recall: $r3 < $r1")
    // and on this fixture the extra probes actually find something
    val c1 = mp1.count(); val c3 = mp3.count()
    assert(c3 >= c1, "probe fan-out cannot shrink the result")
  }

  test("confidenceCalibration: bin edges, top-bin closure, gap from rounded aggs") {
    import spark.implicits._
    val preds = Seq(
      (0.05, 1), (0.08, 0),   // bin 0: mean_conf 0.065, acc 0.5
      (0.95, 1), (1.0, 1),    // conf=1.0 must land in bin 9, not bin 10
      (0.30, 0))              // bin 3 alone
      .toDF("conf", "ok")
    val got = Profiling.confidenceCalibration(preds, "conf", "ok")
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(got.keySet == Set(0, 3, 9), s"bins: ${got.keySet}")
    assert(got(0).getLong(1) == 2 && got(0).getDouble(2) == 0.065 &&
      got(0).getDouble(3) == 0.5)
    assert(got(0).getDouble(4) == 0.435, "gap |0.065 - 0.5|")
    assert(got(9).getLong(1) == 2 && got(9).getDouble(3) == 1.0)
    assert(got(3).getDouble(3) == 0.0 && got(3).getDouble(4) == 0.3)
  }

  test("retrievalMetrics: rr and ndcg match the closed form; zero-hit query kept") {
    import spark.implicits._
    val ranked = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (2L, 21L, 2)).toDF("query_id", "cand_id", "rank")
    val truth = Seq((1L, 11L), (1L, 12L), (1L, 99L), (2L, 77L))
      .toDF("query_id", "cand_id")
    val got = Similarity.retrievalMetrics(ranked, truth, k = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    def lg2(x: Double) = math.log(x) / math.log(2)
    val m1 = got(1L)
    assert(m1.getLong(1) == 3 && m1.getLong(2) == 2, "n_rel / n_hits")
    assert(m1.getDouble(3) == 0.5, "first hit at rank 2 -> rr 1/2")
    val dcg = 1.0 / lg2(3) + 1.0 / lg2(4)      // hits at ranks 2, 3
    val idcg = 1.0 + 1.0 / lg2(3) + 1.0 / lg2(4) // 3 relevant, k=3
    assert(math.abs(m1.getDouble(4) - dcg / idcg) < 1e-6, "ndcg")
    val m2 = got(2L)
    assert(m2.getLong(2) == 0 && m2.getDouble(3) == 0.0 &&
      m2.getDouble(4) == 0.0, "zero-hit query kept with zeros")
  }

  test("importance weights: target-domain docs outscore off-domain docs") {
    import spark.implicits._
    // target docs share a distinctive vocabulary; off-domain docs don't
    val docs = (
      (1L to 20L).map(i => (i, "en", s"alpha beta gamma delta tok$i")) ++
      (21L to 40L).map(i => (i, "es", s"uno dos tres cuatro tok$i")))
      .toDF("doc_id", "lang", "text")
    val w = TextAnalysis.importanceWeights(docs, "text", "doc_id",
        col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val enMean = (1L to 20L).map(w).sum / 20
    val esMean = (21L to 40L).map(w).sum / 20
    assert(enMean > esMean + 0.5,
      s"no selection signal: en=$enMean es=$esMean")
    assert(w.size == 40)
  }

  test("tolerant decode: corrupt payloads quarantine, good payloads unaffected") {
    import spark.implicits._
    val good = MultiModal.syntheticImage(Seq(5L).toDF("doc_id"), "doc_id", "png")
    val bad = Seq(
      (90L, Array[Byte](1, 2, 3, 4)),                     // garbage
      (91L, Array.empty[Byte]))                           // empty
      .toDF("doc_id", "payload")
    val out = MultiModal.imagePixelStatsTolerant(good.unionByName(bad))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(5L).getBoolean(1), "good payload flagged")
    // tolerant stats equal the strict path's for decodable rows
    val strict = MultiModal.imagePixelStats(good).head()
    assert(out(5L).getLong(3) == strict.getLong(1) &&
      math.abs(out(5L).getDouble(6) - strict.getDouble(4)) < 1e-12)
    Seq(90L, 91L).foreach { id =>
      val r = out(id)
      assert(!r.getBoolean(1) && !r.isNullAt(2), s"corrupt $id not quarantined")
      assert(r.isNullAt(3) && r.isNullAt(6), s"corrupt $id leaked stats")
    }
  }

  test("multimodal stub plumbing: payload, metadata, frame sampling") {
    val df = MultiModal.sampleFrames(
      MultiModal.frameIndexStub(
        MultiModal.decodeImageMetaStub(
          MultiModal.attachPayload(docs.limit(1), "text"))), 5)
    val r = df.head()
    assert(r.getAs[Long]("payload_len") == 16L)
    assert(r.getAs[Array[Byte]]("payload").length == 16)
    val w = r.getAs[Long]("width")
    assert(w >= 16 && w < 1040)
    val nf = r.getAs[Long]("n_frames")
    val ns = r.getAs[Long]("n_sampled")
    assert(ns == (nf + 4) / 5)
  }

  test("ivf nProbe > 1 recovers at least the single-probe hits") {
    val emb = spark.read.parquet(s"${sf("sf0.001")}/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 4)
    val exact = graft.operators.Similarity.bruteForceKnn(queries, emb,
        "vec_id", "embedding", k = 3)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(nProbe: Int): Int =
      graft.operators.Similarity.ivfKnn(emb, queries, "vec_id",
          "embedding", "label", k = 3, nProbe = nProbe)
        .select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).count(exact.contains)
    val r1 = recall(1)
    val r2 = recall(2)
    assert(r2 >= r1, s"nProbe=2 recall $r2 < nProbe=1 recall $r1")
  }

  test("meltStack escaping: pivot names with quotes, backslashes and " +
      "backticks melt back losslessly") {
    import spark.implicits._
    // names are DATA (a distinct over a string column) — each of these
    // breaks naive '$name' / `$name` splicing in a stack() expression
    val nasty = Seq("it's", "back`tick", "back\\slash", "plain")
    val rows = for (n <- nasty; i <- 1 to 2) yield ("g1", n)
    val df = rows.toDF("g", "src")
    val wide = df.groupBy(col("g")).pivot("src", nasty).agg(count(lit(1)))
    val melted = wide
      .select(col("g"), graft.SparkEntry.meltStack(nasty, "src", "n"))
      .filter(col("n").isNotNull)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(melted == nasty.map(_ -> 2L).toMap, melted.toString)
  }

  test("KMV sketch: exact below k, within ~25% above k") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (if (i <= 40) "small" else "big", i))
      .toDF("g", "v")
    val r = graft.operators.Sketches.kmvDistinct(df, "g", "v", k = 64)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("small") == 40.0) // < k -> exact
    val est = r("big")         // 4960 distinct values
    assert(est > 4960 * 0.75 && est < 4960 * 1.25, s"estimate $est")
  }

  test("KMV estimate guard: kth_min <= 0 falls back to the exact lower " +
      "bound instead of dividing by zero") {
    import spark.implicits._
    // at-k sketch whose k-th minimum is hash 0: the raw estimator is
    // (k-1)·2^32/0 — Infinity/NaN — on both the Column and the JVM
    // twin; the guard must return n_seen on each
    val k = 8
    val frame = Seq((8L, 0L), (8L, 77L), (3L, 0L))
      .toDF("n_seen", "kth_min")
      .select(graft.operators.Sketches
        .kmvEstimate(col("n_seen"), col("kth_min"), k).as("est"))
      .collect().map(_.getDouble(0)).toSeq
    assert(frame.head == 8.0, s"kth_min=0 at k must yield n_seen: $frame")
    assert(frame(1) > 3.9e8 && frame(1) < 3.91e8, s"healthy arm: $frame")
    assert(frame(2) == 3.0, "below-k arm unchanged")
    assert(graft.operators.Sketches.kmvEstimateJvm(8L, 0L, k) == 8.0)
    assert(graft.operators.Sketches.kmvEstimateJvm(3L, 5L, k) == 3.0)
    // JVM twin matches the Column form on the healthy arm too
    assert(graft.operators.Sketches.kmvEstimateJvm(8L, 77L, k) == frame(1))
  }

  test("native KMV aggregate: group-for-group equal to the composed form") {
    import spark.implicits._
    // cross the k boundary both ways, include a repeated-value group
    // (distinctness inside the sketch) and a null-value row (skipped)
    val df = ((1 to 5000).map(i => (if (i <= 40) "small" else "big",
        (i % 3000).toString)) ++ Seq(("small", null))).toDF("g", "v")
    val composed = graft.operators.Sketches.kmvDistinct(df, "g", "v", k = 64)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    val native = graft.operators.Sketches
      .kmvDistinctNative(df, "g", "v", k = 64)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    assert(native == composed)
  }

  test("native KMV aggregate: SQL surface and partial-merge plan shape") {
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    val df = (1 to 1000).map(i => ("g", i.toString)).toDF("g", "v")
    df.createOrReplaceTempView("kmv_in")
    val r = spark.sql(
      """SELECT g, graft_kmv(CAST(conv(substring(md5(CAST(v AS STRING)),
        |  1, 8), 16, 10) AS BIGINT), 64) AS s
        |FROM kmv_in GROUP BY g""".stripMargin)
    // two-phase agg: the sketch must ride a partial_graft_kmv
    val plan = r.queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_kmv"),
      plan)
    val row = r.collect().head.getStruct(1)
    assert(row.getLong(0) == 64L) // n_seen capped at k
    assert(row.getLong(1) > 0L)
  }

  test("CMS aggregate: replays the brute sketch, dominates true counts") {
    import spark.implicits._
    // zipf-ish multiset: token t_j appears ~200/j times; width 64 is
    // deliberately small so collisions actually occur and the
    // one-sided property is tested with real overcounts
    val (depth, width) = (4, 64)
    val values = (1 to 40).flatMap(j => Seq.fill(200 / j)(s"tok$j"))
    val df = values.toDF("v")
    val out = graft.operators.Sketches
      .cmsTopKAccuracy(df, "v", depth, width, topK = 10)
      .collect()
    assert(out.length == 10)
    // brute JVM replay: same hash, same universal family, same min
    val counters = Array.ofDim[Long](depth, width)
    values.foreach { v =>
      val h = graft.functions.GF.hash32Jvm(v)
      for (i <- 0 until depth) {
        val u = (h * (2L * i + 1) + (101L * i + 17)) % 4294967311L
        counters(i)((u % width).toInt) += 1L
      }
    }
    val trueCnt = values.groupBy(identity).view.mapValues(_.size.toLong)
    out.foreach { r =>
      val (v, t, est, over) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val h = graft.functions.GF.hash32Jvm(v)
      val brute = (0 until depth).map { i =>
        val u = (h * (2L * i + 1) + (101L * i + 17)) % 4294967311L
        counters(i)((u % width).toInt)
      }.min
      assert(t == trueCnt(v), s"$v true count")
      assert(est == brute, s"$v estimate vs brute replay")
      assert(est >= t && over == est - t, s"$v one-sided error")
    }
    // the harness must surface real collisions at this width
    assert(out.exists(_.getLong(3) > 0L), "expected nonzero overcounts")
  }

  test("CMS aggregate: matrix is partitioning-invariant (merge = sum)") {
    import spark.implicits._
    val df = (1 to 3000).map(i => s"t${i % 97}").toDF("v")
      .withColumn("h", graft.functions.GF.hash32(col("v")))
    def matrix(d: org.apache.spark.sql.DataFrame): Seq[Seq[Long]] =
      d.agg(graft.operators.Sketches.cmsAgg(col("h"), 4, 32).as("cms"))
        .collect().head.getSeq[scala.collection.Seq[Long]](0)
        .map(_.toSeq)
    val whole = matrix(df)
    assert(matrix(df.repartition(13)) == whole)
    assert(whole.map(_.sum).distinct == Seq(3000L),
      "every row counts every insert exactly once")
  }

  test("CMS aggregate: SQL surface and partial-merge plan shape") {
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    val df = (1 to 500).map(i => s"w${i % 11}").toDF("v")
    df.createOrReplaceTempView("cms_in")
    val r = spark.sql(
      """SELECT graft_cms(CAST(conv(substring(md5(v), 1, 8), 16, 10)
        |  AS BIGINT), 4, 32) AS cms
        |FROM cms_in""".stripMargin)
    val plan = r.queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_cms"),
      plan)
    val m = r.collect().head.getSeq[scala.collection.Seq[Long]](0)
    assert(m.size == 4 && m.forall(_.size == 32))
    assert(m.map(_.sum).toSet == Set(500L))
  }

  test("sketch rollup: stored-state merge == direct build, exactly") {
    import spark.implicits._
    // 3 "days" of overlapping values: rollup of per-day states must
    // reproduce the direct whole-corpus build bit-for-bit
    val df = (1 to 900).map(i => (s"d${i % 3}", s"v${i % 173}"))
      .toDF("day", "v")
      .withColumn("h", graft.functions.GF.hash32(col("v")))
      .withColumn("len", (length(col("v")) * 37).cast("long"))
    val S = graft.operators.Sketches
    val sub = df.groupBy(col("day"))
      .agg(S.kmvState(col("h"), 64).as("kmv"),
        S.cmsAgg(col("h"), 4, 32).as("cms"),
        S.hdrAgg(col("len"), 7).as("hdr"))
    val merged = sub.agg(S.kmvMergeState(col("kmv"), 64).as("kmv"),
      S.cmsMerge(col("cms"), 4, 32).as("cms"),
      S.hdrMerge(col("hdr")).as("hdr")).collect().head
    val direct = df.agg(S.kmvState(col("h"), 64).as("kmv"),
      S.cmsAgg(col("h"), 4, 32).as("cms"),
      S.hdrAgg(col("len"), 7).as("hdr")).collect().head
    assert(merged.getSeq[Long](0) == direct.getSeq[Long](0))
    assert(merged.getSeq[scala.collection.Seq[Long]](1).map(_.toSeq) ==
      direct.getSeq[scala.collection.Seq[Long]](1).map(_.toSeq))
    assert(merged.getSeq[org.apache.spark.sql.Row](2) ==
      direct.getSeq[org.apache.spark.sql.Row](2))
    // KMV state is sorted ascending and bounded at k
    val st = merged.getSeq[Long](0)
    assert(st.size == 64 && st == st.sorted)
    // estimate-from-state projection == the answer-shaped aggregate
    val fromState = df.agg(S.kmvState(col("h"), 64).as("kmv"))
      .select(S.kmvEstimateFromState(col("kmv"), 64).as("e"))
      .collect().head.getDouble(0)
    val answer = df.groupBy(lit(1)).agg(S.kmvAgg(col("h"), 64).as("s"))
      .select(S.kmvEstimate(col("s.n_seen"), col("s.kth_min"), 64))
      .collect().head.getDouble(0)
    assert(fromState == answer)
  }

  test("sketch rollup: SQL surfaces and partial-merge plan shapes") {
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    val df = (1 to 400).map(i => (s"g${i % 4}", s"w${i % 31}"))
      .toDF("g", "v")
    df.createOrReplaceTempView("roll_in")
    val sub = spark.sql(
      """SELECT g,
        |  graft_kmv_state(CAST(conv(substring(md5(v), 1, 8), 16, 10)
        |    AS BIGINT), 16) AS kmv,
        |  graft_cms(CAST(conv(substring(md5(v), 1, 8), 16, 10)
        |    AS BIGINT), 2, 16) AS cms,
        |  graft_hdr(CAST(length(v) AS BIGINT), 7) AS hdr
        |FROM roll_in GROUP BY g""".stripMargin)
    sub.createOrReplaceTempView("roll_sub")
    val r = spark.sql(
      """SELECT graft_kmv_merge(kmv, 16) AS kmv,
        |  graft_cms_merge(cms, 2, 16) AS cms,
        |  graft_hdr_merge(hdr) AS hdr
        |FROM roll_sub""".stripMargin)
    val plan = r.queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_kmv_merge"), plan)
    assert(plan.contains("partial_graft_cms_merge"), plan)
    assert(plan.contains("partial_graft_hdr_merge"), plan)
    val row = r.collect().head
    val direct = spark.sql(
      """SELECT graft_kmv_state(CAST(conv(substring(md5(v), 1, 8), 16,
        |    10) AS BIGINT), 16) AS kmv,
        |  graft_cms(CAST(conv(substring(md5(v), 1, 8), 16, 10)
        |    AS BIGINT), 2, 16) AS cms,
        |  graft_hdr(CAST(length(v) AS BIGINT), 7) AS hdr
        |FROM roll_in""".stripMargin).collect().head
    assert(row.getSeq[Long](0) == direct.getSeq[Long](0))
    assert(row.getSeq[scala.collection.Seq[Long]](1).map(_.toSeq) ==
      direct.getSeq[scala.collection.Seq[Long]](1).map(_.toSeq))
    assert(row.getSeq[org.apache.spark.sql.Row](2) ==
      direct.getSeq[org.apache.spark.sql.Row](2))
  }

  test("cms merge/estimate guards: dim mismatch fails fast, null flows") {
    import spark.implicits._
    val df = (1 to 100).map(i => s"x${i % 7}").toDF("v")
      .withColumn("h", graft.functions.GF.hash32(col("v")))
    val S = graft.operators.Sketches
    val sk = df.agg(S.cmsAgg(col("h"), 2, 64).as("cms"))
    // probe with the sketch's own dims: fine
    assert(sk.select(S.cmsEstimate(col("cms"),
      graft.functions.GF.hash32(lit("x1")), 2, 64)).collect()
      .head.getLong(0) >= 1L)
    // mismatched caller dims raise with the formatted message
    val e = intercept[Exception] {
      sk.select(S.cmsEstimate(col("cms"),
        graft.functions.GF.hash32(lit("x1")), 2, 32)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("sketch dims 2x64 != caller (2x32)")),
      msgs(e).mkString(" | "))
    // a NULL sketch (outer-join miss) propagates null, never raises
    val nulled = sk.select(lit(null).cast(sk.schema("cms").dataType)
      .as("cms"))
    assert(nulled.select(S.cmsEstimate(col("cms"),
      graft.functions.GF.hash32(lit("x1")), 2, 64)).collect()
      .head.isNullAt(0))
    // stored-merge against a sketch of the WRONG shape fails fast too
    val bad = df.agg(S.cmsAgg(col("h"), 2, 32).as("cms"))
    val e2 = intercept[Exception] {
      bad.agg(S.cmsMerge(col("cms"), 2, 64)).collect()
    }
    assert(msgs(e2).exists(_.contains("stored sketch width 32 != 64")),
      msgs(e2).mkString(" | "))
  }

  test("Misra-Gries rollup: merged stored summaries keep the guarantee") {
    import spark.implicits._
    // zipf-ish tokens split across 4 "days"; k chosen so the threshold
    // N/(k+1) actually separates heavy from light tokens
    val k = 8
    val toks = (1 to 2000).map { i =>
      val tok = if (i % 5 != 0) s"heavy${i % 2}" else s"light${i % 97}"
      (s"d${i % 4}", tok)
    }.toDF("day", "tok")
    val daily = graft.operators.Sketches.heavyHitters(toks, "day", "tok", k)
      .withColumn("all", lit(1))
    val rolled = graft.operators.Sketches
      .mergeHeavyHitters(daily, "all", "candidates", k)
      .collect().head.getSeq[org.apache.spark.sql.Row](1)
      .map(_.getString(0)).toSet
    assert(rolled.size <= k)
    val total = toks.count()
    val mustHave = toks.groupBy("tok").count()
      .filter(col("count") > total / (k + 1))
      .collect().map(_.getString(0)).toSet
    assert(mustHave.nonEmpty, "fixture lost its heavy hitters")
    assert(mustHave.subsetOf(rolled), s"missing ${mustHave.diff(rolled)}")
  }

  test("hdrQuantileJvm: empty sketch is None, the twin of Column NULL") {
    import spark.implicits._
    assert(graft.operators.Sketches.hdrQuantileJvm(Nil, 0.5, 7).isEmpty)
    // Column twin on an empty histogram: NULL out
    val empty = Seq(Tuple1(Seq.empty[(Long, Long)])).toDF("raw")
      .select(transform(col("raw"), e => struct(e.getField("_1")
        .as("bucket"), e.getField("_2").as("cnt"))).as("hdr"))
    assert(empty.select(graft.operators.Sketches
      .hdrQuantile(col("hdr"), 0.5, 7)).collect().head.isNullAt(0))
  }

  test("unigramLmTrain: EM posteriors match hand-computed fractions") {
    import spark.implicits._
    // corpus: word "ab" x3, word "b" x1; M=2, minFreq=2, 1 EM round.
    // Seed freqs a:3 b:4 ab:3 -> p0 = (0.3, 0.4, 0.3).
    // "ab": alpha = [1, 0.3, 0.42]; expected counts
    //   a: 3*1*0.3*0.4/0.42 = 6/7, b: 3*0.3*0.4*1/0.42 = 6/7,
    //   ab: 3*1*0.3*1/0.42 = 15/7; "b" adds 1 to b.
    // totals: (6/7, 13/7, 15/7), sum 34/7 -> p = (3/17, 13/34, 15/34).
    val docs = Seq((1L, "ab ab b"), (2L, "ab")).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis
      .unigramLmTrain(docs, "text", "doc_id", maxPieceLen = 2,
        emIters = 1, minFreq = 2L)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set("a", "b", "ab"))
    assert(math.abs(got("a") - 3.0 / 17) < 1e-12, got)
    assert(math.abs(got("b") - 13.0 / 34) < 1e-12, got)
    assert(math.abs(got("ab") - 15.0 / 34) < 1e-12, got)
    // invariants on a larger fixture: p is a distribution after every
    // round, the vocabulary is stable, repetition moves mass to the
    // repeated piece
    val corpus = Seq((1L, "hello hello hello world"),
      (2L, "hello help held"), (3L, "world word")).toDF("doc_id", "text")
    for (iters <- Seq(1, 2, 3)) {
      val ps = graft.operators.TextAnalysis
        .unigramLmTrain(corpus, "text", "doc_id", maxPieceLen = 4,
          emIters = iters)
        .collect().map(r => r.getString(0) -> r.getDouble(1))
      assert(math.abs(ps.map(_._2).sum - 1.0) < 1e-9)
      assert(ps.forall(_._2 >= 0.0))
      // "hell" occurs in 5 word-occurrences (freq-weighted): it must
      // hold real mass once EM runs
      assert(ps.toMap.getOrElse("hell", 0.0) > 0.01, ps.toSeq.sortBy(-_._2).take(8))
    }
  }

  test("HdrBuckets: monotone, contiguous, lower-bound within 2^-s") {
    import graft.functions.HdrBuckets._
    for (s <- Seq(1, 3, 7)) {
      // dense sweep over small values + every octave boundary ± 1 +
      // extremes, mirrored negative
      val pos = (0L to (4L << s)) ++
        (s until 63).flatMap { n =>
          Seq((1L << n) - 1, 1L << n, (1L << n) + 1) } ++
        Seq(Long.MaxValue - 1, Long.MaxValue)
      val vs = (pos ++ pos.map(-_) :+ Long.MinValue).distinct.sorted
      val bs = vs.map(bucketOf(_, s))
      assert(bs.zip(bs.tail).forall { case (a, b) => a <= b },
        s"bucket map not monotone at s=$s")
      vs.foreach { v =>
        if (v != Long.MinValue) {
          val lb = lowerBound(bucketOf(v, s), s)
          assert(math.signum(lb.toDouble) == math.signum(v.toDouble) ||
            lb == v, s"sign lost: v=$v lb=$lb s=$s")
          val (av, al) = (math.abs(v.toDouble), math.abs(lb.toDouble))
          assert(al <= av && av < al * (1 + math.pow(2.0, -s)) + 1,
            s"bound broken: v=$v lb=$lb s=$s")
        }
      }
      // contiguity: every bucket id between two consecutive observed
      // ids reconstructs inside the gap (no dead ids in an octave)
      val posBuckets = (1L << s) to bucketOf(Long.MaxValue, s)
      assert(posBuckets.take(10000).zip(posBuckets.take(10000).tail)
        .forall { case (a, b) =>
          lowerBound(a, s) < lowerBound(b, s) },
        s"lower bounds not strictly increasing at s=$s")
    }
  }

  test("HDR aggregate: partition-invariant, merge = bucket-wise add") {
    import spark.implicits._
    val vals = ((1 to 1000).map(_.toLong * 37 % 5000) ++
      Seq(0L, -17L, -500000L, 1L << 40)).toDF("v")
    def sketch(d: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      d.agg(graft.operators.Sketches.hdrAgg(col("v"), 7).as("hdr"))
        .collect().head.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getLong(0), r.getLong(1)))
    val whole = sketch(vals)
    assert(sketch(vals.repartition(13)) == whole)
    assert(whole.map(_._2).sum == 1004L,
      "every insert counted exactly once")
    assert(whole.map(_._1) == whole.map(_._1).sorted,
      "eval emits buckets sorted")
  }

  test("hdrLowerBound column matches the JVM twin over every bucket") {
    import spark.implicits._
    val s = 5
    val buckets = ((0L to (4L << s)) ++
      (1L to 58L).map(n => (n << s) + (n % (1L << s)))).distinct
    val both = (buckets ++ buckets.map(-_)).distinct.toDF("b")
      .select(col("b"),
        graft.operators.Sketches.hdrLowerBound(col("b"), s).as("lb"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    both.foreach { case (b, lb) =>
      assert(lb == graft.functions.HdrBuckets.lowerBound(b, s),
        s"column/JVM drift at bucket $b")
    }
  }

  test("hdrQuantile: exact below 2^s, in-bound everywhere, ties/negatives") {
    import spark.implicits._
    val df = ((1 to 400).map(i => ("a", (i * i).toLong)) ++
      (1 to 300).map(_ => ("a", 7L)) ++            // heavy tie
      (1 to 200).map(i => ("b", -i * 1000L)) ++    // all negative
      Seq(("b", 0L))).toDF("grp", "v")
    val acc = graft.operators.Sketches.hdrQuantileAccuracy(
      df, "grp", "v", sBits = 7,
      phis = Seq(0.01, 0.25, 0.5, 0.75, 0.99))
    val rows = acc.collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getBoolean(6)),
      "within_bound must hold on every (group, phi):\n" +
        rows.mkString("\n"))
    // small values are EXACT (bucket = value below 2^s): rank ⌈0.25·700⌉
    // = 175 lands inside the 300-deep tie at 7
    val aQ1 = rows.find(r =>
      r.getString(0) == "a" && r.getDouble(1) == 0.25).get
    assert(aQ1.getLong(3) == 7L && aQ1.getLong(4) == 7L,
      s"tie-heavy P25 must be exact: $aQ1")
  }

  test("HDR aggregate: SQL surface and partial-merge plan shape") {
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    (1 to 500).map(i => i.toLong * 13).toDF("v")
      .createOrReplaceTempView("hdr_in")
    val r = spark.sql("SELECT graft_hdr(v, 7) AS hdr FROM hdr_in")
    val plan = r.queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_hdr"), plan)
    val sk = r.collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(sk.map(_.getLong(1)).sum == 500L)
  }

  test("bottomK sample: exact k per group, stable under growth") {
    import spark.implicits._
    val base = (1 to 200).map(i => (if (i % 2 == 0) "a" else "b", i.toLong))
      .toDF("g", "id")
    def sample(df: org.apache.spark.sql.DataFrame): Map[String, Set[Long]] =
      graft.operators.Sampling.bottomK(df, "g", "id", k = 8)
        .collect().map(r => (r.getString(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val s1 = sample(base)
    assert(s1("a").size == 8 && s1("b").size == 8)
    // a small group yields the whole group
    val s2 = sample(base.filter(col("id") <= 6))
    assert(s2("a") == Set(2L, 4L, 6L) && s2("b") == Set(1L, 3L, 5L))
    // growth: adding rows changes each group's sample by at most the
    // number of new rows that win a bottom-k slot — never a reshuffle
    val grown = sample(base.union(
      (201 to 240).map(i => (if (i % 2 == 0) "a" else "b", i.toLong))
        .toDF("g", "id")))
    for (g <- Seq("a", "b")) {
      assert(grown(g).size == 8)
      assert((s1(g) -- grown(g)).size == (grown(g) -- s1(g)).size)
      assert((grown(g) -- s1(g)).forall(_ > 200),
        s"displacers must be new rows: ${grown(g) -- s1(g)}")
    }
  }

  test("simhashHammingPairs: banding equals brute force, guard enforced") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"), // near-dup
      (3L, "the quick brown fox jumps over the lazy dog"), // exact dup
      (4L, "completely different text about spark physical plans"),
      (5L, "another unrelated document mentioning catalyst rules"))
      .toDF("doc_id", "text")
    // brute force over the same simhashes (64-bit, the pairs default);
    // the near-dup's absolute distance scales with the width, so the
    // search threshold adapts to it instead of hard-coding a 32-bit-era
    // number — the assertion is completeness at that radius
    val hs = graft.operators.Dedup.simhash(docs, "text", "doc_id", 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dNear = java.lang.Long.bitCount(hs(1L) ^ hs(2L))
    val dFar = java.lang.Long.bitCount(hs(1L) ^ hs(4L))
    assert(dNear < dFar, s"one-word edit ($dNear) must sit closer than " +
      s"unrelated text ($dFar)")
    assert(dNear <= 15, s"near-dup hamming $dNear out of 16-band reach")
    val got = graft.operators.Dedup
      .simhashHammingPairs(docs, "text", "doc_id", maxHamming = dNear,
        bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2))
      .toMap
    val brute = (for {
      a <- hs.keys; b <- hs.keys if a < b
      d = java.lang.Long.bitCount(hs(a) ^ hs(b)) if d <= dNear
    } yield (a, b) -> d).toMap
    assert(got == brute, s"got=$got brute=$brute")
    assert(got((1L, 3L)) == 0, "exact dup must be hamming 0")
    assert(got.contains((1L, 2L)), "near-dup must surface")
    intercept[IllegalArgumentException] {
      graft.operators.Dedup.simhashHammingPairs(docs, "text", "doc_id",
        maxHamming = 8, bands = 4) // per-band radius 2: unsupported
    }
  }

  test("simhashHammingPairs radius-1 probing: 2x32-bit bands equal " +
      "brute force") {
    import spark.implicits._
    // long docs (100 unique tokens) with 1-4 single-token edits: each
    // edit flips only the simhash bits whose ±1 majority margin the
    // changed token decided, so the corpus populates hamming distances
    // right around the search radius — the regime where a missed probe
    // variant would actually lose a pair. Deterministic, no RNG.
    val base = (0 until 100).map(i => s"w$i")
    def edit(ks: Seq[Int]): String =
      base.zipWithIndex.map { case (w, i) =>
        if (ks.contains(i)) s"x$i" else w }.mkString(" ")
    val docs = ((0L, base.mkString(" ")) +:
      (1 to 12).map(k => (k.toLong, edit(Seq(7 * k % 100)))) :+
      (20L, edit(Seq(3, 41))) :+ (21L, edit(Seq(3, 41, 77))) :+
      (22L, edit(Seq(3, 41, 77, 90)))).toDF("doc_id", "text")
    val hs = graft.operators.Dedup.simhash(docs, "text", "doc_id", 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- hs.keys; b <- hs.keys if a < b
      d = java.lang.Long.bitCount(hs(a) ^ hs(b)) if d <= 3
    } yield (a, b) -> d).toMap
    assert(brute.nonEmpty, "corpus produced no pairs within hamming 3 " +
      "— the completeness assertion would be vacuous")
    val got = graft.operators.Dedup
      .simhashHammingPairs(docs, "text", "doc_id", maxHamming = 3,
        nBits = 64, bands = 2) // radius 1: single-bit probe variants
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2))
      .toMap
    assert(got == brute, s"got=$got brute=$brute")
  }

  test("simhash 64-bit: low half equals the 32-bit form, top half varies") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different text about spark physical plans"),
      (3L, "another unrelated document mentioning catalyst rules"))
      .toDF("doc_id", "text")
    val h32 = graft.operators.Dedup.simhash(docs, "text", "doc_id", 32)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val h64 = graft.operators.Dedup.simhash(docs, "text", "doc_id", 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // bits 0-31 draw from the same md5 window in both widths
    h32.foreach { case (id, h) =>
      assert((h64(id) & 0xFFFFFFFFL) == h,
        s"doc $id: 64-bit low half ${h64(id) & 0xFFFFFFFFL} != 32-bit $h")
    }
    // the widened half must actually carry signal (second md5 window)
    assert(h64.values.exists(h => (h >>> 32) != 0L),
      "no document set any bit above 31 — second window dead")
    // banding at 16-bit width: exact dup still pairs at hamming 0
    val dup = docs.unionByName(Seq((9L,
      "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text"))
    val pairs = graft.operators.Dedup
      .simhashHammingPairs(dup, "text", "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.get((1L, 9L)).contains(0), s"exact dup lost: $pairs")
  }

  test("kmvPairOverlap: exact algebra below k, sane estimate above") {
    import spark.implicits._
    // A = 1..40, B = 21..60  ->  |A∪B| = 60, |A∩B| = 20, J = 1/3
    val df = ((1 to 40).map(i => ("A", i)) ++ (21 to 60).map(i => ("B", i)))
      .toDF("g", "v")
    val r = graft.operators.Sketches.kmvPairOverlap(df, "g", "v", k = 64)
      .collect().head
    assert(r.getString(0) == "A" && r.getString(1) == "B")
    assert(r.getDouble(2) == 60.0, s"union_est ${r.getDouble(2)}")
    assert(r.getLong(4) == 20L, s"n_common ${r.getLong(4)}")
    assert(math.abs(r.getDouble(3) - 20.0 / 60.0) < 1e-6)
    // above k: estimates, not exact — union within 25%, jaccard sane
    val big = ((1 to 4000).map(i => ("A", i)) ++
      (2001 to 6000).map(i => ("B", i))).toDF("g", "v")
    val e = graft.operators.Sketches.kmvPairOverlap(big, "g", "v", k = 64)
      .collect().head
    assert(e.getDouble(2) > 6000 * 0.75 && e.getDouble(2) < 6000 * 1.25,
      s"union_est ${e.getDouble(2)}")
    assert(e.getDouble(3) > 0.1 && e.getDouble(3) < 0.6,
      s"jaccard_est ${e.getDouble(3)} (true 1/3)")
  }

  test("twap: duration-weighted, last point drops, singletons vanish") {
    import spark.implicits._
    val df = Seq(
      ("a", 0L, 100L),   // 100 cents holds 10 us
      ("a", 10L, 200L),  // 200 cents holds 30 us
      ("a", 40L, 999L),  // last point: no duration, drops
      ("b", 5L, 50L))    // singleton key: no interval at all
      .toDF("k", "us", "cents")
    val r = graft.operators.TimeSeriesOps.twap(df, Seq("k"), "us", "cents")
      .collect().map(x => x.getString(0) -> (x.getDouble(1), x.getLong(2)))
      .toMap
    assert(r.keySet == Set("a"), s"singleton must vanish: $r")
    // (100*10 + 200*30) / 40 = 175 cents = 1.75
    assert(r("a") == ((1.75, 2L)), r("a"))
  }

  test("twap: tied timestamps — tiebreak makes it stable, last tied row " +
      "carries the interval, zero-duration rows drop from n_intervals") {
    import spark.implicits._
    // two rows tie at us=10; with tieCols=eid the eid=2 row is ordered
    // last among the tie and holds [10, 40); eid=1 gets duration 0 and
    // must vanish from sums AND count
    val df = Seq(
      ("a", 0L, 1L, 100L),
      ("a", 10L, 1L, 900L),  // tied-earlier: zero duration, drops
      ("a", 10L, 2L, 200L),  // tie winner: holds 30 us
      ("a", 40L, 3L, 999L))  // last point: no duration
      .toDF("k", "us", "eid", "cents")
    val r = graft.operators.TimeSeriesOps
      .twap(df, Seq("k"), "us", "cents", tieCols = Seq("eid"))
      .collect().map(x => x.getString(0) -> (x.getDouble(1), x.getLong(2)))
      .toMap
    // (100*10 + 200*30) / 40 = 175 cents; the 900-cent tied row is gone
    // and n_intervals counts 2, not 3
    assert(r("a") == ((1.75, 2L)), s"tied twap: ${r("a")}")
    // reversing the tiebreak column flips which row holds the interval
    val flipped = df.withColumn("eid", -col("eid"))
    val r2 = graft.operators.TimeSeriesOps
      .twap(flipped, Seq("k"), "us", "cents", tieCols = Seq("eid"))
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    // now the 900-cent row wins the tie: (100*10 + 900*30) / 40 = 700
    assert(r2("a") == 7.0, s"flipped tie: ${r2("a")}")
  }

  test("survivorship: later null never erases, fields survive independently") {
    import spark.implicits._
    val updates = Seq(
      // key 1: name set at t1, nulled-out update at t2, city only at t2
      (1L, 1L, Some("ana"), None: Option[String]),
      (1L, 2L, None, Some("rome")),
      // key 2: both fields updated twice — latest non-null wins
      (2L, 1L, Some("bo"), Some("lima")),
      (2L, 2L, Some("bob"), None))
      .toDF("k", "ts", "name", "city")
    val r = graft.operators.EntityResolution
      .survivorship(updates, "k", Seq("ts"), Seq("name", "city"))
      .collect().map(x => x.getLong(0) ->
        (x.getString(1), x.getString(2), x.getLong(3))).toMap
    assert(r(1L) == (("ana", "rome", 2L)),
      s"later null must not erase 'ana': ${r(1L)}")
    assert(r(2L) == (("bob", "lima", 2L)))
  }

  test("margin bitext mining: unique alignment beats a hub, mutual flags") {
    import spark.implicits._
    // t10 is uniquely aligned with s1; t11 is a "hub" equally close to
    // s2 AND s3 — the ratio margin must rank (s1,t10) above both hub
    // pairs even though all raw cosines are comparable
    def v(x: Double, y: Double, z: Double) = Array(x.toFloat, y.toFloat,
      z.toFloat)
    val src = Seq((1L, v(1, 0, 0)), (2L, v(0, 1, 0.1)), (3L, v(0, 1, -0.1)))
      .toDF("vec_id", "embedding")
    val tgt = Seq((10L, v(1, 0.05, 0)), (11L, v(0, 1, 0)),
        (12L, v(0.4, 0.4, 0.8)))
      .toDF("vec_id", "embedding")
    val r = graft.operators.Similarity
      .marginBitextPairs(src, tgt, "vec_id", "embedding", k = 2)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getDouble(3), x.getBoolean(4))).toMap
    assert(r(1L)._1 == 10L && r(1L)._3, s"s1 should mutually pair t10: $r")
    assert(r(2L)._1 == 11L && r(3L)._1 == 11L)
    // only one of s2/s3 can be mutual with the hub
    assert(Seq(r(2L)._3, r(3L)._3).count(identity) <= 1)
    assert(r(1L)._2 > r(2L)._2 && r(1L)._2 > r(3L)._2,
      s"unique pair margin must beat hub margins: $r")
  }

  test("fixed-block oracle preconditions (q196, q40): no refinement at oracle scale") {
    // The q196 DuckDB oracle replays the block key as a FIXED
    // baseBits=4 hyperplane bucket — valid only while no block exceeds
    // maxBlockSize=512 at sf0.01, i.e. adaptive refinement never
    // fires. This was a documented-but-unasserted data dependency:
    // fixture growth would fail the gate without pointing at the
    // cause. adaptiveLshBlocks encodes depth in the key (bits << 24),
    // so "refinement never fired" is exactly "every key's depth == 4".
    val emb = spark.read.parquet(s"${sf("sf0.01")}/embeddings.parquet")
    def depthsAt(baseBits: Int): Map[Long, (Long, Long)] =
      graft.operators.Similarity
        .adaptiveLshBlocks(emb, "embedding", "_blk",
          baseBits = baseBits, maxBlockSize = 512)
        .groupBy((col("_blk") / lit(1L << 24)).cast("long").as("depth"))
        .agg(count(lit(1)).as("n"), countDistinct(col("_blk")).as("blocks"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
    val d4 = depthsAt(4)
    assert(d4.keySet == Set(4L),
      s"q196's fixed-4-bit oracle is INVALID at oracle scale: adaptive " +
      s"refinement fired (depths=$d4) — some 4-bit block exceeds " +
      "512 vectors at sf0.01. Regenerate the oracle or raise " +
      "maxBlockSize in qBitextMining AND its oracle note.")
    // q40's oracle replays bucket₈ + (8 << 24) under the same
    // under-cap precondition (its baseBits = 8, cap 512)
    val d8 = depthsAt(8)
    assert(d8.keySet == Set(8L),
      s"q40's fixed-8-bit oracle is INVALID at oracle scale: adaptive " +
      s"refinement fired (depths=$d8) at sf0.01. Regenerate the oracle " +
      "or raise maxBlockSize in qEmbeddingNearDup AND its oracle note.")
  }

  test("blocked margin mining equals per-block brute composition") {
    import spark.implicits._
    // 64-dim deterministic vectors so the default hyperplane family
    // (dims = 64) sees full-length inputs
    def vec(id: Long): Array[Float] =
      Array.tabulate(64)(d => ((id * 31 + d * 17) % 13 - 6).toFloat)
    val src = (1L to 20L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val tgt = (101L to 140L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val blocked = graft.operators.Similarity
      .blockedMarginBitextPairs(src, tgt, "vec_id", "embedding",
        k = 2, baseBits = 2, maxBlockSize = 10000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4))).toSet
    // expected: bucket both sides with the same 2-bit signature, then
    // run the BRUTE margin miner inside each bucket independently
    val sig = graft.operators.Similarity
      .lshSignature(src.unionByName(tgt), "vec_id", "embedding", nBits = 2)
    val srcB = src.join(sig, "vec_id")
    val tgtB = tgt.join(sig, "vec_id")
    val buckets = sig.select("bucket").distinct().as[Long].collect()
    val expected = buckets.flatMap { b =>
      val sb = srcB.filter(col("bucket") === b).drop("bucket")
      val tb = tgtB.filter(col("bucket") === b).drop("bucket")
      if (sb.isEmpty || tb.isEmpty)
        Array.empty[(Long, Long, Double, Double, Boolean)]
      else graft.operators.Similarity
        .marginBitextPairs(sb, tb, "vec_id", "embedding", k = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getBoolean(4)))
    }.toSet
    assert(buckets.length > 1, "fixture must split into multiple blocks")
    assert(blocked == expected,
      s"blocked=${blocked.size} expected=${expected.size}: " +
        s"diff=${(blocked diff expected) ++ (expected diff blocked)}")
  }

  test("observe metrics equal a dedicated recompute pass") {
    val dir = sf("sf0.001")
    val row = SparkEntry.queries("q229_observe_metrics")(spark, dir).head()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val expect = docs.agg(
      count(lit(1)).as("n_in"), sum(col("n_chars")).as("chars_in"),
      sum(when(col("n_chars") >= 200, 1L).otherwise(0L)).as("n_kept"),
      sum(when(col("n_chars") >= 200, col("n_chars")).otherwise(0L))
        .as("chars_kept")).head()
    assert(row.getLong(0) == expect.getLong(0) &&
      row.getLong(1) == expect.getLong(1) &&
      row.getLong(2) == expect.getLong(2) &&
      row.getLong(3) == expect.getLong(3),
      s"in-flight metrics drifted from the recompute: $row vs $expect")
  }

  test("PII redaction replaces urls, emails and IPv4 with markers") {
    import spark.implicits._
    val df = Seq(
      ("write to ana.b+x@example.org or see https://x.org/p?a=1 from 192.168.0.7",
        "<EMAIL>", "<URL>", "<IP>"),
      ("no pii here", "no", "pii", "here"))
      .toDF("text", "e", "u", "i")
    val out = df.select(
      graft.operators.TextAnalysis.redactPii(col("text")).as("r"))
      .as[String].collect()
    assert(out(0) == "write to <EMAIL> or see <URL> from <IP>")
    assert(out(1) == "no pii here")
  }

  test("decontamination flags docs copied from the benchmark set") {
    import spark.implicits._
    val benchmark = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"), // full copy
      (11L, "completely unrelated words about spark plans today"))
      .toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis
      .decontaminationRatios(corpus, benchmark, "text", "doc_id")
      .select("doc_id", "overlap_ratio", "contaminated")
      .collect().map(x => x.getLong(0) -> ((x.getDouble(1), x.getBoolean(2))))
      .toMap
    assert(r(10L) == ((1.0, true)))
    assert(r(11L) == ((0.0, false)))
  }

  test("duplicateClusters: min-label connected components over pairs") {
    import spark.implicits._
    // two components: a 4-chain {1,2,3,4} and a pair {10,11}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id1", "id2")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L)
    // default gate -> driver union-find path
    val viaDriver = graft.operators.Dedup.duplicateClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(viaDriver == expected)
    // forced distributed loop must agree exactly
    val viaLoop = graft.operators.Dedup
      .duplicateClusters(pairs, driverMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(viaLoop == expected)
  }

  test("hash split is deterministic, stratified-stable, and complete") {
    import spark.implicits._
    val docs = (1L to 500L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val a = graft.operators.Sampling.withSplit(docs, "doc_id")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    val b = graft.operators.Sampling.withSplit(docs, "doc_id")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(a == b) // identical across runs (no rand())
    assert(a.values.sum == 500)
    // ~80/10/10 within loose tolerance
    assert(a("train") > 350 && a("val") > 20 && a("test") > 20)
    val sample = graft.operators.Sampling
      .deterministicSample(docs, "doc_id", 10).count()
    assert(sample > 10 && sample < 200)
  }

  test("stratified sample: per-stratum rates, default fallback, stable") {
    import spark.implicits._
    val docs = (1L to 600L).map(i =>
      (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "zh" else "fr"))
      .toDF("doc_id", "lang")
    val flagged = graft.operators.Sampling.withStratifiedFlag(
      docs, "lang", "doc_id", Map("en" -> 0.1, "zh" -> 0.9), 0.5)
    val byLang = flagged.groupBy("lang")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.when(col("sampled"), 1L)
          .otherwise(0L)).as("n"))
      .as[(String, Long)].collect().toMap
    // 200 docs per stratum; hash-gated rates land near targets
    assert(byLang("en") < 60, byLang)           // ~20 expected
    assert(byLang("zh") > 140, byLang)          // ~180 expected
    assert(byLang("fr") > 60 && byLang("fr") < 140, byLang) // ~100
    // row count preserved, kept set identical across runs
    assert(flagged.count() == 600)
    val kept1 = graft.operators.Sampling.stratifiedSample(
      docs, "lang", "doc_id", Map("en" -> 0.1, "zh" -> 0.9), 0.5)
      .select("doc_id").as[Long].collect().toSet
    val kept2 = graft.operators.Sampling.stratifiedSample(
      docs, "lang", "doc_id", Map("en" -> 0.1, "zh" -> 0.9), 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept1 == kept2)
  }

  test("chunkDedup: first occurrence survives, later repeats drop") {
    import spark.implicits._
    // doc 1: chunks A B; doc 2: chunk A (dup of doc 1's first chunk) + C
    val a = (1 to 8).map(i => s"a$i").mkString(" ")
    val b = (1 to 8).map(i => s"b$i").mkString(" ")
    val c = (1 to 8).map(i => s"c$i").mkString(" ")
    val docs = Seq((1L, s"$a $b"), (2L, s"$a $c"), (3L, c))
      .toDF("doc_id", "text")
    val r = graft.operators.Dedup.chunkDedup(docs, "text", "doc_id")
      .as[(Long, Long, Long, String)].collect()
      .map(x => x._1 -> ((x._2, x._3))).toMap
    assert(r(1L) == ((2L, 2L)))  // both chunks first occurrences
    assert(r(2L) == ((2L, 1L)))  // chunk A deduped away, C kept
    assert(r(3L) == ((1L, 0L)))  // C already kept by doc 2
    // reassembly digest: doc 2's surviving text is exactly chunk c
    val md5s = graft.operators.Dedup.chunkDedup(docs, "text", "doc_id")
      .select("doc_id", "dedup_md5").as[(Long, String)].collect().toMap
    val cMd5 = docs.sparkSession.sql(
      s"SELECT md5('$c')").collect()(0).getString(0)
    assert(md5s(2L) == cMd5)
  }

  test("duplicateSpans: cross-doc grams mark spans, interval union merges overlaps") {
    import spark.implicits._
    val sharedA = "0123456789abcdefghijklmno"     // 25 chars: 6 gram starts
    val sharedB = "ABCDEFGHIJKLMNOPQRST"          // exactly 20: 1 gram
    val docs = Seq(
      (1L, sharedA + "xxxxxxxxxx"),               // shared prefix
      (2L, "yyyyyyyyyy" + sharedA),               // same span, any offset
      (3L, "zzzz"),                               // below gramLen
      (4L, "q" * 25),                             // intra-doc-only repeat
      (5L, sharedA + "uuuuu" + sharedB),          // two DISJOINT dup spans
      (6L, sharedB + "vvvvvvvvvv")).toDF("doc_id", "text")
    val r = graft.operators.Dedup
      .duplicateSpans(docs, "text", "doc_id", gramLen = 20)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4)))).toMap
    // 6 overlapping positions union to exactly the 25 shared chars
    assert(r(1L) == ((35L, 6L, 25L, 0.7143)), r(1L))
    assert(r(2L) == ((35L, 6L, 25L, 0.7143)), r(2L))
    // too short for a single gram: zero coverage, still reported
    assert(r(3L) == ((4L, 0L, 0L, 0.0)), r(3L))
    // the same gram repeated WITHIN one doc is not cross-doc duplication
    assert(r(4L) == ((25L, 0L, 0L, 0.0)), r(4L))
    // disjoint spans don't merge: 25 + 20 covered of 50
    assert(r(5L) == ((50L, 7L, 45L, 0.9)), r(5L))
    assert(r(6L) == ((30L, 1L, 20L, 0.6667)), r(6L))
  }

  test("exactSubstrSpans: arbitrary offsets, within-doc repeats, maximal islands") {
    import spark.implicits._
    val shared = (1 to 10).map(i => s"s$i").mkString(" ") // 10 tokens
    val run8 = (1 to 8).map(i => s"r$i").mkString(" ")    // 8 tokens
    val docs = Seq(
      (1L, shared + " x1 x2 x3"),            // shared at offset 0
      (2L, "p1 p2 p3 " + shared),            // same span at offset 3
      (3L, run8 + " u " + run8),             // repeated WITHIN one doc
      (4L, (1 to 20).map(i => s"q$i").mkString(" ")), // unique: no spans
      (5L, Array.fill(9)("w").mkString(" ")) // overlapping self-repeat
    ).toDF("doc_id", "text")
    val r = graft.operators.Dedup
      .exactSubstrSpans(docs, "text", "doc_id", minTokens = 8)
      .collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getInt(2), x.getString(4)))
    val byDoc = r.groupBy(_._1)
    // cross-doc at different offsets: maximal 10-token span each side
    assert(byDoc(1L).map(t => (t._2, t._3)).toSet == Set((0, 10)), r.toSeq)
    assert(byDoc(2L).map(t => (t._2, t._3)).toSet == Set((3, 13)), r.toSeq)
    // identical content -> identical span_md5 across occurrences
    assert(byDoc(1L).head._4 == byDoc(2L).head._4)
    // within-doc repeat: two disjoint maximal spans in the same doc
    assert(byDoc(3L).map(t => (t._2, t._3)).toSet == Set((0, 8), (9, 17)))
    assert(byDoc(3L).map(_._4).distinct.size == 1)
    // unique doc emits nothing
    assert(!byDoc.contains(4L))
    // overlapping self-repeat merges into ONE maximal island
    assert(byDoc(5L).map(t => (t._2, t._3)).toSet == Set((0, 9)))

    // the removal transform over the same corpus: spans drop from
    // every occurrence, survivors reassemble in order, untouched and
    // fully-dropped docs both keep a row
    val clean = graft.operators.Dedup
      .exactSubstrDedup(docs, "text", "doc_id", minTokens = 8)
      .collect()
      .map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getString(4))))
      .toMap
    def m(s: String) = docs.sparkSession
      .sql(s"SELECT md5('$s')").collect()(0).getString(0)
    assert(clean(1L) == ((13L, 1L, 10L, m("x1 x2 x3"))), clean(1L))
    assert(clean(2L) == ((13L, 1L, 10L, m("p1 p2 p3"))), clean(2L))
    assert(clean(3L) == ((17L, 2L, 16L, m("u"))), clean(3L))
    // no spans: full text survives, zero dropped
    assert(clean(4L)._2 == 0L && clean(4L)._3 == 0L &&
      clean(4L)._4 == m((1 to 20).map(i => s"q$i").mkString(" ")))
    // whole doc repeated: everything drops, row stays
    assert(clean(5L) == ((9L, 1L, 9L, m(""))), clean(5L))
  }

  test("curriculumPhases: two-pass cumsum equals naive global running sum") {
    import spark.implicits._
    val rows = (1L to 200L).map(i =>
      (i, ((i * 37) % 97).toDouble / 97.0, (i % 13) + 1L))
    val docs = rows.toDF("doc_id", "score", "tokens")
    val got = Sampling.curriculumPhases(docs, "score", "tokens",
        "doc_id", phaseBudget = 50L, scoreBins = 10)
      .select("doc_id", "phase").as[(Long, Long)].collect().toMap
    // oracle: the naive single-stream walk the two-pass plan replaces
    var cum = 0L
    val want = rows.sortBy { case (id, s, _) => (-s, id) }
      .map { case (id, _, t) => val p = cum / 50L; cum += t; id -> p }
      .toMap
    assert(got == want)
    assert(got.values.min == 0L, "phases start at 0")
    // coarse bins (10) force many docs per bin AND ties across docs:
    // correctness must come from offsets + in-bin order, not luck
    assert(rows.map(_._2).distinct.size < rows.size)
  }

  test("wavChannelFeatures: zero crossings, silence, peak per channel") {
    import spark.implicits._
    // ch0: 5,-5,0,-3 — flips at 5→-5, -5→0 (0 counts non-negative),
    // 0→-3: three crossings; all four frames under the silence bar
    // ch1: 200,150,99,-100 — one crossing, one silent frame (99)
    val samples = Array(Array(5, -5, 0, -3), Array(200, 150, 99, -100))
    val bytes = MultiModal.encodeWavPcm16(8000, 2, 4,
      (i, ch) => samples(ch)(i))
    val r = MultiModal.wavChannelFeatures(
        Seq((7L, bytes)).toDF("doc_id", "payload"))
      .orderBy("channel").collect()
    val c0 = r(0)
    assert(c0.getLong(2) == 4L && c0.getLong(3) == 3L, c0)
    assert(c0.getLong(4) == 4L && c0.getLong(5) == 5L, c0)
    assert(c0.getLong(6) == -3L, c0)
    val c1 = r(1)
    assert(c1.getLong(3) == 1L && c1.getLong(4) == 1L, c1)
    assert(c1.getLong(5) == 200L && c1.getLong(6) == 349L, c1)
  }

  test("corpusStats: exact percentiles interpolate like quantile_cont") {
    import spark.implicits._
    val docs = (1L to 101L).map(i => (i, "en", i * 10))
      .toDF("doc_id", "lang", "n_chars")
    val r = graft.operators.TextAnalysis
      .corpusStats(docs, "lang", "n_chars").collect()(0)
    assert(r.getAs[Long]("n_docs") == 101L)
    assert(r.getAs[Double]("p50") == 510.0)   // exact mid element
    assert(r.getAs[Double]("p90") == 910.0)   // 0.9*(101-1)=90 -> exact
    assert(r.getAs[Double]("p99") == 1000.0)  // 0.99*100=99 -> exact
    assert(r.getAs[Double]("mean_len") == 510.0)
    // approx path stays within sketch tolerance and the same schema
    val ap = graft.operators.TextAnalysis
      .corpusStats(docs, "lang", "n_chars", exact = false).collect()(0)
    assert(math.abs(ap.getAs[Double]("p50") - 510.0) <= 20.0)
  }

  test("curation funnel: first failing rule wins, curate keeps survivors") {
    import spark.implicits._
    val longGood = (("the of and a to in is it that for " * 6).trim)
    val docs = Seq(
      (1L, longGood),            // kept
      (2L, longGood),            // duplicate of 1 -> 'duplicate'
      (3L, "the of and"),        // 3 tokens -> 'too_short'
      (4L, ("zx qv wk jn " * 8).trim)) // long, no stopwords -> low_quality
      .toDF("doc_id", "text")
    val reasons = graft.operators.Curation
      .funnel(docs, "text", "doc_id", minTokens = 5, minQuality = 0.55)
      .select("doc_id", "reason").as[(Long, String)].collect().toMap
    assert(reasons == Map(1L -> "kept", 2L -> "duplicate",
      3L -> "too_short", 4L -> "low_quality"), reasons)
    // duplicate wins over too_short: a short doc that is ALSO a dup
    val docs2 = docs.union(Seq((5L, "the of and")).toDF("doc_id", "text"))
    val r2 = graft.operators.Curation
      .funnel(docs2, "text", "doc_id", minTokens = 5, minQuality = 0.55)
      .select("doc_id", "reason").as[(Long, String)].collect().toMap
    assert(r2(5L) == "duplicate" && r2(3L) == "too_short")
    val kept = graft.operators.Curation
      .curate(docs, "text", "doc_id", minTokens = 5, minQuality = 0.55)
    assert(kept.columns.toSeq == Seq("doc_id", "text"))
    assert(kept.select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("packing: streaming bins respect order, straddlers stay behind") {
    import spark.implicits._
    // shard A: tokens 60+60 fill bin 0 (cap 100 -> second doc straddles
    // and stays in bin 0 because its EXCLUSIVE cumsum 60 < 100);
    // third doc starts at cum 120 -> bin 1
    val docs = Seq(("A", 1L, 60L), ("A", 2L, 60L), ("A", 3L, 10L),
      ("B", 1L, 250L), ("B", 2L, 10L))
      .toDF("source", "doc_id", "n_tokens")
    val packed = graft.operators.Packing
      .packBins(docs, "source", "doc_id", "n_tokens", capacity = 100L)
      .select("source", "doc_id", "bin").as[(String, Long, Long)]
      .collect().map(x => (x._1, x._2) -> x._3).toMap
    assert(packed == Map(("A", 1L) -> 0L, ("A", 2L) -> 0L,
      ("A", 3L) -> 1L, ("B", 1L) -> 0L, ("B", 2L) -> 2L), packed)
    val stats = graft.operators.Packing
      .binStats(graft.operators.Packing.packBins(docs, "source", "doc_id",
        "n_tokens", 100L), "source", "n_tokens", 100L)
      .select("source", "bin", "n_docs", "bin_tokens")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(stats == Set(("A", 0L, 2L, 120L), ("A", 1L, 1L, 10L),
      ("B", 0L, 1L, 250L), ("B", 2L, 1L, 10L)), stats)
  }

  test("capPerGroup: priority order wins, id breaks ties, groups independent") {
    import spark.implicits._
    val docs = Seq(
      ("s1", 1L, 10L), ("s1", 2L, 30L), ("s1", 3L, 30L), ("s1", 4L, 50L),
      ("s2", 5L, 5L))
      .toDF("source", "doc_id", "n_chars")
    val kept = Curation.capPerGroup(docs, "source", "doc_id", 2,
        priorityDesc = Seq("n_chars"))
      .select("source", "doc_id", "grp_rank").as[(String, Long, Int)]
      .collect().toSet
    // s1: 4 (50 chars) ranks 1, then the 30-char tie resolves to doc 2;
    // s2 is under the cap and keeps its only doc
    assert(kept == Set(("s1", 4L, 1), ("s1", 2L, 2), ("s2", 5L, 1)), kept)
  }

  test("mixtureRebalance: binding stratum rate is ~1, shares scale, " +
      "absent strata drop") {
    import spark.implicits._
    // 100 'a' + 10 'b': targets 50/50 -> b binds (10/0.5=20 < 200),
    // a keeps 0.5*20/100 = 10% (1000 bp), b keeps 100% (10000 bp)
    val docs = ((1 to 100).map(i => ("a", i.toLong)) ++
      (101 to 110).map(i => ("b", i.toLong)) :+ (("c", 111L)))
      .toDF("lang", "doc_id")
    val out = Sampling.mixtureRebalance(docs, "lang", "doc_id",
      Map("a" -> 0.5, "b" -> 0.5))
    val rates = out.select("lang", "rate_bp").distinct()
      .as[(String, Long)].collect().toMap
    assert(rates == Map("a" -> 1000L, "b" -> 10000L, "c" -> 0L), rates)
    // every b sampled, no c sampled, sampling deterministic across runs
    val s1 = out.filter(col("sampled")).select("doc_id")
      .as[Long].collect().sorted
    val s2 = Sampling.mixtureRebalance(docs, "lang", "doc_id",
        Map("a" -> 0.5, "b" -> 0.5))
      .filter(col("sampled")).select("doc_id").as[Long].collect().sorted
    assert(s1.sameElements(s2))
    assert((101L to 110L).forall(s1.contains), s1.mkString(","))
    assert(!s1.contains(111L))
  }

  test("unigramLogProb: uniform corpus scores ln(1/vocab), rare tokens " +
      "score lower") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aa bb"), (2L, "aa bb"), (3L, "aa bb"), (4L, "aa zz"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(docs, "text", "doc_id")
      .select("doc_id", "n_tokens", "logprob")
      .as[(Long, Int, Double)].collect().map(x => x._1 -> x).toMap
    assert(out.values.forall(_._2 == 2))
    // corpus: aa x4, bb x3, zz x1, total 8
    val lp = (a: Double, b: Double) =>
      (math.log(a) + math.log(b)) / 2 - math.log(8.0)
    assert(math.abs(out(1L)._3 - lp(4, 3)) < 1e-6, out(1L))
    assert(math.abs(out(4L)._3 - lp(4, 1)) < 1e-6, out(4L))
    assert(out(4L)._3 < out(1L)._3, "rare-token doc must score lower")
  }

  test("editDistanceVerify: identical=0, known edit counts, ratio gate") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox"), (2L, "the quick brown fox"),
      (3L, "the quick brown cat"), (4L, "entirely different words here"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id1", "id2")
    val out = Dedup.editDistanceVerify(docs, pairs, "text", "doc_id")
      .select("id2", "edit_dist", "near_dup")
      .as[(Long, Int, Boolean)].collect().map(x => x._1 -> (x._2, x._3))
      .toMap
    assert(out(2L) == ((0, true)), out(2L))
    assert(out(3L) == ((3, true)), out(3L)) // fox -> cat = 3 substitutions
    assert(out(4L)._1 > 15 && !out(4L)._2, out(4L))
  }

  test("shingleContainment: embedded doc scores 1.0 where jaccard is low") {
    import spark.implicits._
    val short = "alpha beta gamma delta epsilon"
    val long = short + " zeta eta theta iota kappa lambda mu nu xi " +
      "omicron pi rho sigma tau upsilon"
    val docs = Seq((1L, short), (2L, long)).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id1", "id2")
    val c = Dedup.shingleContainment(docs, pairs, "text", "doc_id")
      .select("containment").as[Double].head()
    val j = Dedup.ngramJaccard(docs, pairs, "text", "doc_id")
      .select("jaccard").as[Double].head()
    assert(c == 1.0, s"containment=$c")
    assert(j < 0.5, s"jaccard=$j should miss the subset-dup")
  }

  test("sourceOverlap: shared digests counted once, zero pairs kept") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The SAME text!", "a"), (2L, "the same text", "b"), // dup across a,b
      (3L, "the same text", "a"),  // in-source dup: still ONE digest for a
      (4L, "only in a", "a"),
      (5L, "only in b", "b"),
      (6L, "only in c", "c")).toDF("doc_id", "text", "src")
    val m = Dedup.sourceOverlap(docs, "text", "doc_id", "src")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5))).toMap
    assert(m.size == 3) // complete 3-source matrix
    assert(m(("a", "b")) == ((1L, 2L, 2L, 0.5)), m(("a", "b")))
    assert(m(("a", "c"))._1 == 0L && m(("b", "c"))._1 == 0L)
  }

  test("ngramNovelty: full overlap scores 0, fresh doc scores 1") {
    import spark.implicits._
    val ref = Seq((10L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val cur = Seq(
      (1L, "alpha beta gamma delta"),        // all shingles in ref
      (2L, "one two three four five"),       // nothing in ref
      (3L, "alpha beta gamma NEW TOKEN"))    // mixed
      .toDF("doc_id", "text")
    val out = TextAnalysis.ngramNovelty(cur, ref, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((2L, 0L, 0.0)), out(1L))
    assert(out(2L) == ((3L, 3L, 1.0)), out(2L))
    // "alpha beta gamma" seen; "beta gamma new", "gamma new token" novel
    assert(out(3L) == ((3L, 2L, 0.666667)), out(3L))
  }

  test("pmiCollocations: collocated pair survives, singleton pairs filtered") {
    import graft.operators.TextAnalysis
    // "new york" always adjacent (8x); every other adjacency is a
    // one-off (below minCount) so exactly one collocation survives
    val docs = (1 to 8).map(i => (i.toLong,
        if (i % 2 == 0) s"new york w$i" else s"w$i new york"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.pmiCollocations(docs, "text", minCount = 2, k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(out.length == 1, s"got ${out.toSeq}")
    assert(out.head._1 == "new york")
    assert(out.head._2 == 8L && out.head._3 == 8L && out.head._4 == 8L)
    // n_uni = 24, n_bi = 16: PMI = ln((8/16) / ((8/24)*(8/24))) = ln(4.5)
    assert(math.abs(out.head._5 - math.log(4.5)) < 1e-6, out.head._5)
  }

  test("profileDiff: null spike, distinct drop and mean shift flagged") {
    import graft.operators.Profiling
    val ref = (1 to 100).map(i =>
      (i.toLong, Some(i.toDouble), s"v$i")).toDF("id", "x", "s")
    // current half: x nulled for 20%, s collapsed to one value, mean x doubled
    val cur = (1 to 100).map(i =>
      (i.toLong, if (i <= 20) None else Some(i * 2.0), "CONST"))
      .toDF("id", "x", "s")
    val got = Profiling.profileDiff(ref, cur, Seq("id", "x", "s"))
      .collect().map(r => r.getString(0) ->
        (r.getBoolean(7), r.getBoolean(8), r.getBoolean(9))).toMap
    assert(got("id") == ((false, false, false)), got("id"))
    assert(got("x")._1 && got("x")._3, got("x"))   // null spike + mean shift
    assert(got("s")._2 && !got("s")._3, got("s"))  // distinct drop, no mean
  }

  test("benchmarkLeakage: embedded item flagged, boilerplate df-filtered") {
    import graft.operators.TextAnalysis
    val bench = Seq(
      (1L, "alpha beta gamma delta epsilon"), // leaked into corpus doc 10
      (2L, "zeta eta theta iota kappa"))      // clean
      .toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "intro words alpha beta gamma delta epsilon outro words"),
      (11L, "unrelated content entirely different text here"),
      (12L, "more unrelated material nothing shared at all"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.benchmarkLeakage(corpus, bench, "text",
        "doc_id", threshold = 0.5, maxDocFreq = 100)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // bench 1 has 3 shingles, all inside doc 10 -> containment 1.0
    assert(got(1L) == ((3L, 1L, 1.0)), got(1L))
    assert(got(2L) == ((3L, 0L, 0.0)), got(2L))
    // a shingle shared by EVERY corpus doc is boilerplate: with
    // maxDocFreq = 1 nothing survives the df filter and bench 1 reads clean
    val boiler = TextAnalysis.benchmarkLeakage(corpus, bench, "text",
        "doc_id", threshold = 0.5, maxDocFreq = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(boiler(1L) == 0L)
  }

  test("recallAtK: hit counting, zero-hit queries kept, rank cap honored") {
    import graft.operators.Similarity
    val exact = Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1), (2L, 21L, 2),
      (3L, 30L, 1), (3L, 31L, 2)).toDF("query_id", "cand_id", "rank")
    // q1 both right; q2 one right (one extra beyond k ignored);
    // q3 nothing right
    val approx = Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1), (2L, 99L, 2),
      (2L, 21L, 3), (3L, 98L, 1), (3L, 97L, 2)).toDF("query_id", "cand_id", "rank")
    val got = Similarity.recallAtK(approx, exact, k = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L) == ((2L, 1.0)), got(1L))
    assert(got(2L) == ((1L, 0.5)), got(2L)) // rank-3 hit must not count
    assert(got(3L) == ((0L, 0.0)), got(3L))
  }

  test("histogramReport edges tile the range; mixKl zero at target, penalized off") {
    import graft.operators.Profiling
    val df = (0 until 100).map(i => ("g", i.toLong)).toDF("grp", "v")
    val h = Profiling.histogramReport(df, "v", "grp", bins = 10)
      .collect().map(r => r.getLong(1) ->
        (r.getDouble(2), r.getDouble(3), r.getLong(4))).sortBy(_._1)
    assert(h.length == 10 && h.map(_._2._3).sum == 100L)
    // consecutive bins share an edge; width = 99/10
    h.sliding(2).foreach { case Array((_, (_, hi1, _)), (_, (lo2, _, _))) =>
      assert(hi1 == lo2, s"$hi1 != $lo2")
    }
    assert(h.head._2._1 == 0.0 && h.last._2._2 == 99.0)

    // mix exactly at target -> KL 0; shifting mass to an unplanned
    // source -> large penalty
    val even = (1 to 50).map(i => ("g", if (i <= 25) "a" else "b"))
      .toDF("grp", "src")
    val k0 = Profiling.mixKlDivergence(even, "grp", "src",
      Map("a" -> 0.5, "b" -> 0.5)).collect().head
    assert(k0.getDouble(2) == 0.0, k0)
    val off = (1 to 50).map(i => ("g", if (i <= 25) "a" else "ROGUE"))
      .toDF("grp", "src")
    val k1 = Profiling.mixKlDivergence(off, "grp", "src",
      Map("a" -> 0.5, "b" -> 0.5)).collect().head
    // rogue half: 0.5*ln(0.5/1e-6) ≈ 6.56 plus a's 0 term
    assert(k1.getDouble(2) > 6.0, k1)
  }

  test("sourceConcentration and dupInflation: closed-form mixes") {
    import graft.operators.Profiling
    val df = Seq(
      ("de", "s1", 1L), ("de", "s1", 2L), ("de", "s1", 3L), ("de", "s2", 4L),
      ("fr", "s1", 5L), ("fr", "s2", 6L)).toDF("lang", "src", "id")
    val conc = Profiling.sourceConcentration(df, "lang", "src")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // de: shares 3/4, 1/4 -> top 0.75, hhi = 9/16 + 1/16 = 0.625
    assert(conc("de") == ((2L, 4L, 0.75, 0.625)), conc("de"))
    // fr: 50/50 -> hhi 0.5
    assert(conc("fr") == ((2L, 2L, 0.5, 0.5)), conc("fr"))

    val docs = Seq((1L, "same text", "a"), (2L, "Same Text!", "a"),
      (3L, "other", "a"), (4L, "unique", "b"))
      .toDF("doc_id", "text", "src")
    val infl = Dedup.dupInflation(docs, "text", "src")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(infl("a") == ((3L, 2L, 1.5)), infl("a")) // normalization folds dups
    assert(infl("b") == ((1L, 1L, 1.0)))
  }

  test("percentileCalibrate: rank in [0,1], tie-stable, per group") {
    import graft.operators.Curation
    val df = Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 20.0),
      ("a", 4L, 40.0), ("b", 5L, 99.0)).toDF("g", "id", "v")
    val got = Curation.percentileCalibrate(df, "g", "v")
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(got(1L) == 0.0)
    // ties share (rank-1)/(n-1) = 1/3
    assert(got(2L) == got(3L) && math.abs(got(2L) - 1.0 / 3) < 1e-6)
    assert(got(4L) == 1.0)
    assert(got(5L) == 0.0) // singleton group
  }

  test("embeddingDimStats: closed-form moments, collapsed dim flagged by std 0") {
    import graft.operators.Profiling
    val emb = Seq(
      (1L, Array(1.0f, 5.0f, -2.0f)),
      (2L, Array(3.0f, 5.0f, 2.0f)),
      (3L, Array(5.0f, 5.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Profiling.embeddingDimStats(emb, "embedding")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5))).toMap
    assert(got(0) == ((3L, 3.0, 2.0, 1.0, 5.0)), got(0)) // std of 1,3,5 = 2
    assert(got(1) == ((3L, 5.0, 0.0, 5.0, 5.0)), got(1)) // collapsed dim
    assert(got(2) == ((3L, 0.0, 2.0, -2.0, 2.0)), got(2))
  }

  test("weightedSample: deterministic, ranks contiguous, heavy rows favored") {
    import spark.implicits._
    val rows = (1 to 400).map { i =>
      val grp = if (i % 2 == 0) "g1" else "g2"
      // half the rows get 100x the weight
      (i.toLong, grp, if (i <= 200) 10000L else 100L)
    }
    val df = rows.toDF("id", "grp", "w")
    val s1 = Sampling.weightedSample(df, "grp", "id", "w", k = 10)
      .select("grp", "id", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sortBy(x => (x._1, x._3))
    val s2 = Sampling.weightedSample(df, "grp", "id", "w", k = 10)
      .select("grp", "id", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sortBy(x => (x._1, x._3))
    assert(s1.sameElements(s2)) // replayable
    assert(s1.count(_._1 == "g1") == 10 && s1.count(_._1 == "g2") == 10)
    for (g <- Seq("g1", "g2"))
      assert(s1.filter(_._1 == g).map(_._3).toSeq == (1 to 10).toSeq)
    // with 100:1 odds the top-10 should be dominated by heavy rows
    val heavy = s1.count(_._2 <= 200)
    assert(heavy >= 16, s"expected mostly heavy winners, got $heavy/20")
    // zero/negative weights never selected
    val withZero = df.withColumn("w",
      when(col("id") <= 390, lit(0L)).otherwise(col("w")))
    val s3 = Sampling.weightedSample(withZero, "grp", "id", "w", k = 10)
      .select("id").as[Long].collect()
    assert(s3.forall(_ > 390) && s3.length == 10)
  }

  test("encodingQuality: replacement/control/mojibake counters and ascii ratio") {
    val df = Seq(
      (1L, "clean ascii text"),
      (2L, "bad � byte � here"),        // 2 replacement chars
      (3L, "ctrl but tab\tand\nnewline ok"),
      // "caf\u00e9 \u201cquoted\u201d" mis-decoded as Latin-1:
      // one 0xC3 lead byte + two 0xE2 0x80 pairs
      (4L, "caf\u00c3\u00a9 \u00e2\u20ac\u0153quoted\u00e2\u20ac\u009d"),
      (5L, "日本語のテキスト"),                    // non-ascii but CLEAN
      // natural-language A-tilde: Ã followed by ASCII is NOT mojibake
      (6L, "SÃO PAULO NÃO café"),
      // cp1252-remapped continuation: Ã + ™ (0xC3 0x99 mis-decoded)
      (7L, "broken Ã™ pair"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.encodingQuality(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 0 && out(1L).getBoolean(5))
    assert(out(2L).getLong(1) == 2 && !out(2L).getBoolean(5))
    assert(out(3L).getLong(2) == 2 && !out(3L).getBoolean(5))
    assert(out(4L).getLong(3) == 3 && !out(4L).getBoolean(5)) // 1×Ã + 2×â€
    assert(out(5L).getLong(1) == 0 && out(5L).getLong(2) == 0 &&
      out(5L).getLong(3) == 0 && out(5L).getBoolean(5),
      "legitimately non-Latin text must score clean")
    assert(out(5L).getDouble(4) < 0.5 && out(1L).getDouble(4) == 1.0)
    assert(out(6L).getLong(3) == 0 && out(6L).getBoolean(5),
      "all-caps Portuguese is not transcoding damage")
    assert(out(7L).getLong(3) == 1 && !out(7L).getBoolean(5),
      "cp1252-remapped continuation must still count")
  }

  test("zipfFit: recovers the slope of an exactly Zipfian corpus") {
    // freq(rank) = round(1000 / rank): slope should land near -1
    val toks = (1 to 50).flatMap { r =>
      Seq.fill(math.round(1000.0 / r).toInt)(s"w${"%02d".format(r)}") }
    val df = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
    val row = TextAnalysis.zipfFit(df, "text", topN = 50).collect().head
    assert(row.getLong(0) == 50L)
    val slope = row.getDouble(1)
    assert(slope > -1.05 && slope < -0.95, s"slope $slope not ~ -1")
    assert(row.getDouble(3) > 0.999, s"r2 ${row.getDouble(3)} not ~ 1")
  }

  test("canonicalizeUrl: variants collapse, semantics-bearing parts survive") {
    import graft.functions.GF
    val urls = Seq(
      (1L, "https://www.Example.com/a/b?utm_source=x&id=3&utm_campaign=y#frag"),
      (2L, "https://example.com:443/a/b?id=3"),
      (3L, "http://example.com:80/"),
      (4L, "http://example.com/"),
      (5L, "https://example.com/path/?gclid=abc"),
      (6L, "https://example.com/CaseSensitive/Path"),
      (7L, "https://example.com/a?utm_a=1&utm_b=2&keep=1"))
      .toDF("id", "url")
    val canon = urls.select(col("id"), GF.canonicalizeUrl(col("url")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(canon(1L) == "https://example.com/a/b?id=3", canon(1L))
    assert(canon(2L) == "https://example.com/a/b?id=3")
    assert(canon(3L) == "http://example.com")
    assert(canon(4L) == "http://example.com")
    assert(canon(5L) == "https://example.com/path")
    assert(canon(6L) == "https://example.com/CaseSensitive/Path",
      "path case must survive")
    assert(canon(7L) == "https://example.com/a?keep=1", canon(7L))
  }

  test("domainBlocklist: parent-domain semantics, longest match wins, broadcast plan") {
    val df = Seq(
      (1L, "https://ads.tracker.example.com/x"),
      (2L, "https://example.com/fine"),
      (3L, "https://notexample.com/fine"),      // substring, NOT subdomain
      (4L, "https://sub.blocked.net/y"),
      (5L, "no-scheme-at-all"))
      .toDF("doc_id", "url")
    val out = Curation.domainBlocklist(df, "url", "doc_id",
      Seq("tracker.example.com", "example.com", "blocked.net"))
    val by = out.collect().map(r =>
      r.getLong(0) -> Option(r.getAs[String]("blocked_by"))).toMap
    assert(by(1L).contains("tracker.example.com"),
      "most specific (longest) entry must win")
    assert(by(2L).contains("example.com"))
    assert(by(3L).isEmpty, "substring of a blocked domain is NOT blocked")
    assert(by(4L).contains("blocked.net"))
    assert(by(5L).isEmpty)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "blocklist side must broadcast")
    assert(!plan.contains("NestedLoop"), "no nested-loop in blocklist plan")
  }

  test("temperatureAllocation: sqrt weights, largest-remainder sums to budget exactly") {
    val df = (Seq.fill(1)("a") ++ Seq.fill(4)("b") ++ Seq.fill(16)("c"))
      .zipWithIndex.map { case (g, i) => (g, i.toLong) }.toDF("grp", "id")
    val got = Sampling.temperatureAllocation(df, "grp", budget = 10L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    // sqrt counts 1/2/4, tot 7 -> ideals 10/7, 20/7, 40/7 ->
    // bases 1, 2, 5 (sum 8), remainders .428/.857/.714 -> b and c top up
    assert(got("a") == ((1L, 0.142857, 1L)), got("a"))
    assert(got("b") == ((4L, 0.285714, 3L)), got("b"))
    assert(got("c") == ((16L, 0.571429, 6L)), got("c"))
    assert(got.values.map(_._3).sum == 10L, "allocations must sum to budget")
  }

  test("gopherRules: line heuristics, stopword floor, lorem flag, keep verdict") {
    val df = Seq(
      // clean prose: ends in punct, stopwords, sane word lengths
      (1L, "the quick fox runs to a house and sleeps in that barn today ok."),
      // bullet-heavy (2 of 3 lines) + unpunctuated
      (2L, "the list of a thing is that:\n- one\n- two"),
      // lorem boilerplate
      (3L, "the text of a page is that one.\nLorem Ipsum dolor sit."),
      // no stopwords at all
      (4L, "zzz qqq www rrr ttt yyy uuu iii ooo ppp aaa sss."))
      .toDF("doc_id", "text")
    val got = TextAnalysis.gopherRules(df, "text", "doc_id", minWords = 5L)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Boolean]("keep"), got(1L).toString)
    assert(got(1L).getAs[Double]("frac_lines_end_punct") == 1.0)
    assert(got(2L).getAs[Double]("frac_bullet_lines") == 2.0 / 3.0 ||
      got(2L).getAs[Double]("frac_bullet_lines") == 0.666667)
    assert(!got(2L).getAs[Boolean]("keep"),
      "unpunctuated bullet list must fail the end-punct rule")
    assert(got(3L).getAs[Boolean]("has_lorem") && !got(3L).getAs[Boolean]("keep"))
    assert(got(4L).getAs[Long]("n_stop_hits") == 0L &&
      !got(4L).getAs[Boolean]("keep"),
      "stopword-free noise must fail the >= 2 stopwords rule")
  }

  test("mp4 box walk: round-trip, free-box offsets, garbage declined") {
    val good = MultiModal.encodeMp4(timescale = 3000, duration = 4500L,
      nTracks = 2)
    val freed = MultiModal.encodeMp4(timescale = 1000, duration = 999L,
      nTracks = 3, freeBoxFirst = true)
    val df = Seq(
      (1L, good), (2L, freed),
      (3L, "this is certainly not an mp4 container".getBytes("UTF-8")),
      (4L, good.take(10))) // truncated mid-box
      .toDF("doc_id", "payload")
    val out = MultiModal.decodeMp4Meta(df)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getBoolean(1) && out(1L).getString(2) == "isom")
    assert(out(1L).getLong(3) == 3000L && out(1L).getLong(4) == 4500L)
    assert(out(1L).getLong(5) == 1500L && out(1L).getLong(6) == 2L)
    // the free box shifts moov: fixed offsets would mis-read, the walk
    // must not
    assert(out(2L).getBoolean(1) && out(2L).getLong(3) == 1000L &&
      out(2L).getLong(4) == 999L && out(2L).getLong(6) == 3L)
    assert(!out(3L).getBoolean(1), "garbage accepted as mp4")
    assert(!out(4L).getBoolean(1), "truncated container accepted")
  }

  test("mp4 box walk: lying box sizes near Int.MaxValue quarantine, not crash") {
    // a well-formed ftyp followed by a box declaring size 0x7ffffff8:
    // 32-bit `off + size` wraps negative and once passed a bounds guard
    val good = MultiModal.encodeMp4(timescale = 1000, duration = 2000L,
      nTracks = 1)
    val lying = good.clone()
    // ftyp is 24 bytes (16-byte payload), so moov starts at offset 24
    lying(24) = 0x7f.toByte; lying(25) = 0xff.toByte
    lying(26) = 0xff.toByte; lying(27) = 0xf8.toByte
    // moov child (mvhd at moov+8 = 32) declaring a huge size (wraps
    // against moovEnd in 32-bit arithmetic)
    val lyingChild = good.clone()
    val moovOff = 24
    lyingChild(moovOff + 8) = 0x7f.toByte
    lyingChild(moovOff + 9) = 0xff.toByte
    lyingChild(moovOff + 10) = 0xff.toByte
    lyingChild(moovOff + 11) = 0xf8.toByte
    val df = Seq((1L, lying), (2L, lyingChild), (3L, good))
      .toDF("doc_id", "payload")
    val out = MultiModal.decodeMp4Meta(df)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out(1L).getBoolean(1), "overflowing top-level size must decline")
    assert(!out(2L).getBoolean(1), "overflowing moov child size must decline")
    assert(out(3L).getBoolean(1), "control stays decodable")
  }

  test("mp4 track descent: tkhd dims, hdlr class, stsd codec per track") {
    val threeTracks = MultiModal.encodeMp4(timescale = 1000,
      duration = 2000L, nTracks = 3, freeBoxFirst = true)
    val noTracks = MultiModal.encodeMp4(timescale = 1000,
      duration = 1000L, nTracks = 0)
    val df = Seq(
      (1L, threeTracks), (2L, noTracks),
      (3L, "not an mp4 at all".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val rows = MultiModal.decodeMp4Tracks(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getString(5))).sortBy(t => (t._1, t._2))
    // doc 1: vide/soun/vide with growing dims (track 2 encodes tkhd v1
    // — the fixture covers both layouts); docs 2 and 3 emit none
    assert(rows.toSeq == Seq(
      (1L, 1L, "vide", 160L, 90L, "avc1"),
      (1L, 2L, "soun", 0L, 0L, "mp4a"),
      (1L, 3L, "vide", 480L, 270L, "avc1")), rows.toSeq)
  }

  test("mp4 track descent: unknown tkhd version declines to nulls, never silent zeros") {
    val one = MultiModal.encodeMp4(timescale = 1000, duration = 1000L,
      nTracks = 1)
    val idx = one.indexOfSlice("tkhd".getBytes("US-ASCII"))
    assert(idx > 0)
    one(idx + 4) = 9 // payload byte 0 = version: unknown
    val rows = MultiModal.decodeMp4Tracks(
      Seq((1L, one)).toDF("doc_id", "payload")).collect()
    assert(rows.length == 1, "track row must still emit (hdlr/stsd parse)")
    val r = rows.head
    assert(r.isNullAt(1) && r.isNullAt(3) && r.isNullAt(4),
      s"unknown tkhd version must null the (id, w, h) triple: $r")
    assert(r.getString(2) == "vide" && r.getString(5) == "avc1")
  }

  test("codeDetect: indentation/terminator/keyword lines, prose stays prose") {
    val df = Seq(
      (1L, "def main():\n    x = compute();\n    return x;\nimport sys"),
      (2L, "the cat sat on the mat\nand then it slept all day"),
      (3L, "mostly prose here\n    but one indented line"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.codeDetect(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Boolean]("is_code"))
    assert(got(1L).getAs[Double]("frac_code_lines") == 1.0)
    assert(!got(2L).getAs[Boolean]("is_code"))
    assert(got(2L).getAs[Double]("symbol_ratio") == 0.0)
    assert(got(3L).getAs[Double]("frac_code_lines") == 0.5)
  }

  test("exactQuantilesByValue matches a row-grain sorted computation") {
    val rows = for (g <- Seq("a", "b"); i <- 1 to 137)
      yield (g, if (g == "a") (i % 13).toLong else (i * i % 29).toLong)
    val df = rows.toDF("grp", "v")
    val qs = Seq(0.25, 0.5, 0.9, 1.0)
    val got = Profiling.exactQuantilesByValue(df, "v", "grp", qs)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2))
      .toMap
    for (g <- Seq("a", "b"); q <- qs) {
      val sorted = rows.filter(_._1 == g).map(_._2).sorted
      // percentile_disc: smallest v with cum/n >= q
      val expect = sorted(math.ceil(q * sorted.size).toInt - 1)
      assert(got((g, q)) == expect, s"($g, $q): ${got((g, q))} != $expect")
    }
  }

  test("exactQuantilesByValue: continuous double requires a declared precision") {
    // all-distinct doubles collapse the value-grain plan to a
    // single-task row sort per group — the guard must fail FAST
    val df = (1 to 100).map(i => ("g", i + 0.123456789 * i))
      .toDF("grp", "v")
    val e = intercept[IllegalArgumentException] {
      Profiling.exactQuantilesByValue(df, "v", "grp", Seq(0.5))
    }
    assert(e.getMessage.contains("valuePrecision"), e.getMessage)
    // with the precision declared, values round and quantiles are
    // exact at that precision
    val got = Profiling.exactQuantilesByValue(df, "v", "grp", Seq(0.5),
        valuePrecision = Some(1))
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    // Spark round() is HALF_UP on doubles — mirror it exactly
    val sorted = (1 to 100).map(i => BigDecimal(i + 0.123456789 * i)
      .setScale(1, BigDecimal.RoundingMode.HALF_UP).toDouble).sorted
    assert(got(0.5) == sorted(49), s"${got(0.5)} != ${sorted(49)}")
  }

  test("budgetAllocation: water-filling level, caps respected, all-capped fallback") {
    val masses = Seq(("a", 100L, 10L), ("b", 100L, 50L),
      ("c", 1000L, 10L), ("d", 50L, 100L)).toDF("src", "avail", "w")
    // caps a=300 b=300 c=3000 d=150; r sorted: d(1.5) b(6) a(30) c(300)
    // level walk at B=2000: t hits 125 at c (first r >= t) ->
    // d,b,a capped; c gets floor(125*10)=1250; total = budget exactly
    val out = Sampling.budgetAllocation(masses, "src", "avail", "w",
        budget = 2000L, maxEpochs = 3)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out("a")._4 == 300L && out("b")._4 == 300L &&
      out("d")._4 == 150L, out.toString)
    assert(out("c")._4 == 1250L, out.toString)
    assert(out.values.forall { case (_, cap, _, alloc) => alloc <= cap })
    assert(out.values.map(_._4).sum == 2000L)
    // budget above sum(cap): no feasible level, everyone runs capped
    val capped = Sampling.budgetAllocation(masses, "src", "avail", "w",
      budget = 100000L, maxEpochs = 3).collect()
    assert(capped.forall(r => r.getLong(4) == r.getLong(2)))
  }

  test("clusterSplit: no duplicate cluster straddles splits; singletons key off their own id") {
    val docsN = (1L to 200L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (50L, 51L),
      (51L, 52L), (100L, 101L)).toDF("id1", "id2")
    val labels = Dedup.duplicateClusters(pairs)
    val rows = Sampling.clusterSplit(docsN, "doc_id", labels)
      .select("doc_id", "split_key", "split").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.length == 200)
    // every split_key group lands in exactly one split
    assert(rows.groupBy(_._2).values
      .forall(g => g.map(_._3).distinct.length == 1))
    // the transitive 1-2-3 cluster shares key 1 and one split
    val c123 = rows.filter(r => Set(1L, 2L, 3L)(r._1))
    assert(c123.forall(_._2 == 1L) &&
      c123.map(_._3).distinct.length == 1)
    // a singleton's key is its own id
    assert(rows.find(_._1 == 5L).get._2 == 5L)
    val dist = rows.groupBy(_._3).view.mapValues(_.size).toMap
    assert(dist.keySet.subsetOf(Set("train", "val", "test")))
    assert(dist.getOrElse("train", 0) > 100, dist.toString)
  }

  test("kAnonymity: below-k exposure accounting") {
    val df = (Seq.fill(12)(("us", "A")) ++ Seq.fill(3)(("us", "B")) ++
      Seq.fill(1)(("fr", "A")) ++ Seq.fill(20)(("fr", "B")))
      .toDF("nat", "seg")
    val r = Profiling.kAnonymity(df, Seq("nat", "seg"), k = 5).collect()(0)
    assert(r.getInt(0) == 5)
    assert(r.getLong(1) == 4 && r.getLong(2) == 36)
    assert(r.getLong(3) == 1)
    assert(r.getLong(4) == 2 && r.getLong(5) == 4)
    assert(r.getDouble(6) == 11.111111) // round(4*100/36, 6)
  }

  test("dyadicEwma: exact dyadic kernel with head renormalization") {
    val df = Seq(("s", 1L, 100L), ("s", 2L, 200L), ("s", 3L, 400L))
      .toDF("g", "seq", "cents")
    val out = TimeSeriesOps.dyadicEwma(df, Seq("g"), Seq(col("seq")),
        "cents", k = 3)
      .orderBy("seq").collect()
    // weights newest->oldest: 4, 2, 1; the head renormalizes over the
    // weights actually present instead of assuming zero history
    assert(out(0).getAs[Long]("ewma_num") == 400 &&
      out(0).getAs[Long]("ewma_den") == 4 &&
      out(0).getAs[Double]("ewma") == 100.0)
    assert(out(1).getAs[Long]("ewma_num") == 1000 &&
      out(1).getAs[Long]("ewma_den") == 6 &&
      out(1).getAs[Double]("ewma") == 166.666667)
    assert(out(2).getAs[Long]("ewma_num") == 2100 &&
      out(2).getAs[Long]("ewma_den") == 7 &&
      out(2).getAs[Double]("ewma") == 300.0)
  }

  test("compressionRatio: deterministic DEFLATE, repetition compresses, empty declines") {
    val rng = new scala.util.Random(42)
    val pseudo = Array.fill(500)((rng.nextInt(93) + 33).toChar).mkString
    val df = Seq((1L, "ab" * 500), (2L, pseudo), (3L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.compressionRatio(df, "text", "doc_id")
      .orderBy("doc_id").collect()
    // independent per-row recompute through java.util.zip directly
    def deflate(s: String): Long = {
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      d.setInput(s.getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](1 << 16)
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      d.end(); n
    }
    assert(out(0).getLong(1) == 1000 &&
      out(0).getLong(2) == deflate("ab" * 500))
    assert(out(1).getLong(2) == deflate(pseudo))
    val (rep, rnd) = (out(0).getDouble(3), out(1).getDouble(3))
    assert(rep < 0.1 && rnd > 0.5 && rep < rnd, s"$rep vs $rnd")
    assert(out(2).getLong(1) == 0 && out(2).isNullAt(3))
    // the roundtrip variant (q156's gate path): identical counts plus
    // roundtrip_ok TRUE on every row, including the empty doc
    val rt = TextAnalysis.compressionRatio(df, "text", "doc_id",
        verifyRoundtrip = true)
      .orderBy("doc_id").collect()
    rt.zip(out).foreach { case (a, b) =>
      assert(a.getLong(2) == b.getLong(2), s"counts diverge: $a vs $b")
      assert(a.getBoolean(4), s"roundtrip failed: $a")
    }
  }

  test("mmrRerank: diversity pick beats the near-duplicate relevance ranking") {
    // query (1,0); c1 and c2 are near-identical high-relevance hits,
    // c3 is diverse at lower relevance. Pure top-2 = {c1, c2}; at
    // λ = 0.4 MMR's second pick must be c3 — with c1 ∥ q the penalty
    // equals the relevance, so score(near-dup) = (2λ−1)·1 loses to
    // (2λ−1)·rel₃ whenever λ < 0.5. (At λ = 0.7 keeping the dup IS
    // the correct MMR answer in 2-D — relevance dominates.)
    val qs = Seq((100L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val cs = Seq(
      (1L, Array(1.0f, 0.01f)), (2L, Array(1.0f, 0.011f)),
      (3L, Array(0.7f, 0.7f))).toDF("vec_id", "embedding")
    val out = Similarity.mmrRerank(qs, cs, "vec_id", "embedding",
        poolK = 3, selectK = 2, lambda = 0.4)
      .orderBy("mmr_rank").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 3L), out.mkString(";"))
    // the runner-up's penalty is the c1-c2 similarity (~1), and scores
    // are exact 1e-7-unit integers under the hood
    assert(out(1).getAs[Double]("max_sim_sel") < 0.85)
  }

  test("correlationMatrix: exact ±1 on linear fixtures") {
    val df = Seq((1.0, 2.0, 3.0), (2.0, 4.0, 2.0), (3.0, 6.0, 1.0))
      .toDF("x", "y", "z")
    val got = Profiling.correlationMatrix(df, Seq("x", "y", "z"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3))
      .toMap
    assert(got(("x", "y")) == 1.0 && got(("x", "z")) == -1.0 &&
      got(("y", "z")) == -1.0, got.toString)
    // constant column: zero variance -> null, not NaN/inf
    val c = Seq((1.0, 5.0), (2.0, 5.0)).toDF("a", "b")
    val r = Profiling.correlationMatrix(c, Seq("a", "b")).collect()(0)
    assert(r.isNullAt(3))
  }

  test("mutualInformation: identical columns give MI = H, independent give 0") {
    val dep = Seq(("a", "a"), ("a", "a"), ("b", "b"), ("b", "b"))
      .toDF("x", "y")
    val d = Profiling.mutualInformation(dep, "x", "y").collect()(0)
    val ln2 = BigDecimal(math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(d.getLong(0) == 4)
    assert(d.getAs[Double]("h_x") == ln2 && d.getAs[Double]("mi") == ln2)
    assert(d.getAs[Double]("nmi") == 1.0)
    val ind = Seq(("a", "u"), ("a", "v"), ("b", "u"), ("b", "v"))
      .toDF("x", "y")
    val i = Profiling.mutualInformation(ind, "x", "y").collect()(0)
    assert(i.getAs[Double]("mi") == 0.0 && i.getAs[Double]("nmi") == 0.0)
  }

  test("centroidOutliers: planted off-centroid vector flagged at the exact quantile") {
    val vecs = (0 until 19).map(i =>
      (i.toLong, Array(1.0f, (i % 5) * 0.01f), 0)) :+
      (19L, Array(0.0f, 1.0f), 0)
    val df = vecs.toDF("vec_id", "embedding", "label")
    val out = Profiling.centroidOutliers(df, "vec_id", "embedding",
      "label", q = 0.05)
    // q=0.05 over 20 rows -> threshold = the minimum cosine, which the
    // orthogonal plant owns by an order of magnitude
    val flagged = out.filter(col("is_outlier")).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(flagged == Set(19L), flagged.toString)
  }

  test("jaroWinkler: classic pairs, boost threshold, prefix cap, floor'd transpositions") {
    import graft.functions.TextExpressions.jaroWinkler
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    def jw(a: String, b: String) = jaroWinkler(u(a), u(b))
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    // jaro 0.6 <= 0.7 threshold: no boost despite 4-char prefix
    assert(jw("abcdxxxxxx", "abcdyyyyyy") == 0.6)
    // prefix capped at 4 (6 shared chars): 0.8333.. + 4*0.1*(1-0.8333..)
    assert(math.abs(jw("abcdefgh", "abcdefzz") - 0.9) < 1e-12)
    // 3 mismatched matched-positions -> t = floor(3/2) = 1, not 1.5
    assert(math.abs(jw("Customer#000000216", "Customer#000001026")
      - 0.9888888888888889) < 1e-12)
    assert(jw("", "") == 1.0 && jw("", "abc") == 0.0)
    // pair scoring stays codegen'd end-to-end
    // repartition defeats ConvertToLocalRelation so a real projection
    // stage exists to inspect
    val scored = Seq(("MARTHA", "MARHTA")).toDF("a", "b").repartition(1)
      .select(operators.EntityResolution.jaroWinkler(col("a"), col("b")))
    scored.collect()
    // codegen stages render as "*(n) " markers in the executed plan
    assert(scored.queryExecution.executedPlan.toString.contains("*("))
  }

  test("foldText: accents fold, case folds, ASCII and undecomposables pass through") {
    import graft.functions.TextExpressions.foldText
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    assert(foldText(u("Café Ñandú ÀÉÎÕÜ")).toString == "cafe nandu aeiou")
    assert(foldText(u("plain ASCII 42")).toString == "plain ascii 42")
    assert(foldText(u("çœ")).toString == "cœ")
  }

  test("blockedNamePairs: pairs stay inside blocks, top-k per left id") {
    val df = Seq((1L, "martha", "b1"), (2L, "marhta", "b1"),
      (3L, "marttha", "b1"), (4L, "martha", "b2")).toDF("id", "name", "blk")
    val got = EntityResolution.blockedNamePairs(df, "id", "name", "blk",
      minSim = 0.5, k = 1).select("id_a", "id_b").collect()
    // id 4 is alone in b2: no cross-block pair with the identical name
    assert(!got.exists(r => r.getLong(0) == 4L || r.getLong(1) == 4L))
    // k=1: left ids appear at most once
    val lefts = got.map(_.getLong(0))
    assert(lefts.distinct.length == lefts.length)
  }

  test("benfordDigits: shares sum to 1 and expected shares are Benford") {
    val df = (1 to 999).map(_.toDouble).toDF("v")
    val rows = EntityResolution.benfordDigits(df, "v").collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 9))
    // 111 values per leading digit in 1..999 -> uniform observed shares
    assert(rows.forall(_.getLong(1) == 111L))
    val exp1 = rows.find(_.getInt(0) == 1).get.getAs[Double]("exp_share")
    assert(math.abs(exp1 - 0.30103) < 1e-6)
  }

  test("FoldTextIdempotence: nested folds collapse to one") {
    import graft.functions.FoldTextExpr
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val df = Seq("Café").toDF("s")
    val doubled = df.select(ColumnBridge.column(FoldTextExpr(FoldTextExpr(
      ColumnBridge.expression(col("s"))))).as("f"))
    val optimized = graft.plans.FoldTextIdempotence(
      doubled.queryExecution.analyzed)
    val folds = optimized.expressions.map(_.collect {
      case e: FoldTextExpr => e }.size).sum
    assert(folds == 1, optimized.toString)
    // semantics unchanged by the collapse (idempotence is real)
    assert(doubled.collect().head.getString(0) == "cafe")
  }

  test("prefixFilterJoin: equals the brute-force jaccard join, prefix actually prunes") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"), // near-dup of 1
      (3L, "completely different words appear in this sentence here"),
      (4L, "short doc"),                                            // <3 tokens fallback
      (5L, "short doc")).toDF("doc_id", "text")                    // exact dup of 4
    val got = Dedup.prefixFilterJoin(docs, "text", "doc_id", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    // brute force over the same shingle sets
    val sh = Dedup.shingleRows(docs, "text", "doc_id", 3).distinct()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val brute = sh.select(col("doc_id").as("a"), col("shingle"))
      .join(sh.select(col("doc_id").as("b"), col("shingle")), Seq("shingle"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("shared"))
      .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), Seq("a"))
      .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")), Seq("b"))
      .withColumn("j", col("shared").cast("double") /
        (col("na") + col("nb") - col("shared")))
      .filter(col("j") >= 0.5)
      .select("a", "b", "j")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        BigDecimal(r.getAs[Double]("j")).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
    assert(got == brute, s"got=$got brute=$brute")
    assert(got.contains((4L, 5L)) && got((4L, 5L)) == 1.0)
    assert(got.contains((1L, 2L)) && !got.keySet.exists(
      p => p._1 == 3L || p._2 == 3L))
  }

  test("keySkewReport: uniform keys gini 0, one hot key dominates the shares") {
    val uniform = (1 to 100).map(i => (i % 10, i)).toDF("k", "x")
    val u = Skew.keySkewReport(uniform, "k").collect().head
    assert(u.getLong(0) == 10L && u.getLong(1) == 100L)
    assert(u.getDouble(2) == 0.1 && u.getDouble(4) == 0.0, u.toString)
    // 91 rows on one key + 9 singletons: max_share = .91,
    // gini = (2·Σi·cᵢ − 11·100)/(10·100) with Σi·cᵢ = 45 + 10·91 = 955
    val hot = ((1 to 91).map(_ => (0, 1)) ++
      (1 to 9).map(i => (i, 1))).toDF("k", "x")
    val h = Skew.keySkewReport(hot, "k").collect().head
    assert(h.getDouble(2) == 0.91 && h.getDouble(3) == 1.0)
    assert(h.getDouble(4) == (2.0 * 955 - 1100) / 1000, h.toString)
  }

  test("equiDepthBins: bins are equal-population and value-ordered") {
    val df = (1 to 40).map(i => ("g", i.toDouble, i.toLong))
      .toDF("grp", "v", "id")
    val rows = Profiling.equiDepthBins(df, "grp", "v", nBins = 4)
      .orderBy(col("bin")).collect()
    assert(rows.map(_.getInt(1)).toSeq == Seq(1, 2, 3, 4))
    assert(rows.forall(_.getLong(2) == 10L))
    // consecutive bins partition the value order: max(bin k) < min(bin k+1)
    val env = rows.map(r => (r.getDouble(3), r.getDouble(4)))
    assert(env.sliding(2).forall { case Array(a, b) => a._2 < b._1 })
    // uneven N (ntile semantics): the first N mod k bins take the extra row
    val uneven = Profiling.equiDepthBins(
        (1 to 10).map(i => ("g", i.toDouble)).toDF("grp", "v"),
        "grp", "v", nBins = 4)
      .orderBy(col("bin")).collect()
    assert(uneven.map(r => (r.getInt(1), r.getLong(2))).toSeq ==
      Seq((1, 3L), (2, 3L), (3, 2L), (4, 2L)))
    assert(uneven.map(r => (r.getDouble(3), r.getDouble(4))).toSeq ==
      Seq((1.0, 3.0), (4.0, 6.0), (7.0, 8.0), (9.0, 10.0)))
    // ties spanning bin boundaries: the tied value appears in the
    // envelope of every bin its rank range touches, counts unchanged
    val tied = Profiling.equiDepthBins(
        ((1 to 6).map(_ => ("g", 5.0)) ++ Seq(("g", 1.0), ("g", 9.0)))
          .toDF("grp", "v"),
        "grp", "v", nBins = 2)
      .orderBy(col("bin")).collect()
    assert(tied.map(r => (r.getInt(1), r.getLong(2),
      r.getDouble(3), r.getDouble(4))).toSeq ==
      Seq((1, 4L, 1.0, 5.0), (2, 4L, 5.0, 9.0)))
  }

  test("bpeEncode: in-vocab words reproduce the training segmentation; OOV encodes") {
    val docs = Seq((1L, "banana bandana banana"), (2L, "ban nab banana"))
      .toDF("doc_id", "text")
    val (merges, table) = TextAnalysis.bpeLearn(docs, "text", "doc_id",
      nMerges = 4)
    assert(merges.size == 4)
    // serving path on the training vocabulary = the training table's segs
    val enc = TextAnalysis.bpeEncode(table.select(col("word")), "word",
      merges)
    val mismatches = enc
      .join(table.select(col("word"), col("seg").as("tseg")), Seq("word"))
      .filter(col("seg") =!= col("tseg")).count()
    assert(mismatches == 0L)
    // an unseen word encodes without a vocab join, never fewer than 1 token
    val oov = TextAnalysis.bpeEncode(Seq("anaban").toDF("word"), "word",
      merges).collect().head
    assert(oov.getAs[Long]("n_tokens") >= 1L &&
      oov.getAs[String]("seg").nonEmpty)
  }

  test("pcaPowerComponent: planted direction recovered with exact eigenvalue") {
    // rows t·(3,4), t ∈ -2..2: cov = Var(t)·[[9,12],[12,16]], dominant
    // eigenpair (λ=50, v∝(3,4)); all quantities exact in 1e-4/1e-6 units
    val vecs = Seq(-2, -1, 0, 1, 2).zipWithIndex.map { case (t, k) =>
      (k.toLong, Array(3.0f * t, 4.0f * t)) }.toDF("vec_id", "embedding")
    val rows = Profiling.pcaPowerComponent(vecs, "embedding", iters = 3)
      .collect()
    val byDim = rows.map(r => r.getInt(0) ->
      (r.getDouble(1), r.getDouble(2))).toMap
    assert(byDim(1)._1 == 1.0, byDim.toString)       // ref dim (|4| > |3|)
    assert(byDim(0)._1 == 0.75, byDim.toString)      // 3/4 exactly
    assert(byDim(0)._2 == 50.0 && byDim(1)._2 == 50.0, byDim.toString)
  }

  test("pcaPowerComponent: ragged and empty vectors drop, not corrupt") {
    // the clean 2-dim battery from the planted-direction test, plus a
    // 3-dim straggler and an empty vector: both must be DROPPED (the
    // decline-to-null discipline) so the eigenpair is unchanged
    val clean = Seq(-2, -1, 0, 1, 2).zipWithIndex.map { case (t, k) =>
      (k.toLong, Array(3.0f * t, 4.0f * t)) }
    val dirty = clean ++ Seq(
      (90L, Array(1.0f, 2.0f, 3.0f)),      // ragged: wrong dims
      (91L, Array.empty[Float]))           // empty
    val rows = Profiling.pcaPowerComponent(
      dirty.toDF("vec_id", "embedding"), "embedding", iters = 3).collect()
    val byDim = rows.map(r => r.getInt(0) ->
      (r.getDouble(1), r.getDouble(2))).toMap
    assert(byDim.keySet == Set(0, 1), byDim.toString)
    assert(byDim(1)._1 == 1.0 && byDim(0)._1 == 0.75, byDim.toString)
    assert(byDim(0)._2 == 50.0, byDim.toString)
    // all-empty input: empty result with the stable 3-column schema
    val none = Profiling.pcaPowerComponent(
      Seq((1L, Array.empty[Float])).toDF("vec_id", "embedding"), "embedding")
    assert(none.columns.toSeq == Seq("dim", "loading", "eigenvalue"))
    assert(none.count() == 0L)
  }

  test("randomProjection: deterministic, norm-preserving in expectation shape") {
    val vecs = Seq((1L, Array.fill(16)(1.0f)), (2L, Array.fill(16)(0.0f)))
      .toDF("id", "emb")
    val out = Similarity.randomProjection(vecs, "id", "emb", k = 4,
        dims = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(out.size == 8)
    // the zero vector projects to exactly zero in every dim
    (0 until 4).foreach(d => assert(out((2L, d)) == 0.0))
    // ±1 matrix over an all-ones vector: each output is (Σ signs)/√k —
    // an integer multiple of 1/2 for k=4
    (0 until 4).foreach { d =>
      val v = out((1L, d)) * 2.0
      assert(math.abs(v - math.rint(v)) < 1e-9, s"dim $d -> ${out((1L, d))}")
    }
    // re-running yields the identical matrix (no RNG state)
    val again = Similarity.randomProjection(vecs, "id", "emb", k = 4,
        dims = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(again == out)
  }

  test("standardizeDims: z-scores center and scale; zero-variance dim is null") {
    val vecs = Seq((1L, Array(1.0f, 5.0f)), (2L, Array(3.0f, 5.0f)))
      .toDF("id", "emb")
    val rows = Similarity.standardizeDims(vecs, "id", "emb").collect()
    val z = rows.map(r => (r.getLong(0), r.getInt(1)) ->
      (if (r.isNullAt(2)) null else r.getDouble(2))).toMap
    assert(z((1L, 0)) == -1.0 && z((2L, 0)) == 1.0)
    assert(z((1L, 1)) == null && z((2L, 1)) == null)
  }

  test("pairLift: independent items lift 1, co-occurring items lift > 1") {
    // baskets: {a,b} x2, {a,c}, {b,c} -> a,b co-occur 2/4 with
    // P(a)=P(b)=3/4 -> lift = (2/4)/(9/16) = 8/9
    val df = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"), (4L, "b"), (4L, "c")).toDF("basket", "item")
    val got = Baskets.pairLift(df, "basket", "item", minSupport = 1L)
      .select("item_a", "item_b", "n_both", "lift")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getAs[Double]("lift"))).toMap
    assert(got(("a", "b")) == ((2L, 0.8889)))
    assert(got(("a", "c")) == ((1L, 0.6667)))
    // duplicate rows in a basket must not inflate support
    val dup = df.union(Seq((1L, "a")).toDF("basket", "item"))
    val got2 = Baskets.pairLift(dup, "basket", "item", 1L)
      .filter(col("item_a") === "a" && col("item_b") === "b")
      .select("n_both").collect()
    assert(got2.head.getLong(0) == 2L)
  }

  test("bloomSemiJoin equals the plain semi join (same-named keys, nulls)") {
    // same-named key columns on both sides — the normal fact/dim case
    // that used to hit AMBIGUOUS_REFERENCE
    val fact = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"),
      (null, "null-key"), (2L, "b2")).toDF("k", "payload")
    val build = Seq[(java.lang.Long, String)](
      (2L, "x"), (4L, "y"), (null, "build-null")).toDF("k", "v")
    val got = JoinPrune.bloomSemiJoin(fact, build, "k", "k",
      expectedKeys = 64).orderBy("k", "payload").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = fact.join(build.select("k").distinct(),
        Seq("k"), "leftsemi").orderBy("k", "payload").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == want.toSeq)
    assert(got.toSeq == Seq((2L, "b"), (2L, "b2"), (4L, "d")))
  }

  test("bloomSemiJoin: empty and all-null build sides yield zero rows") {
    val fact = Seq((1L, "a"), (2L, "b")).toDF("k", "payload")
    val empty = Seq.empty[(Long, String)].toDF("k", "v")
    assert(JoinPrune.bloomSemiJoin(fact, empty, "k", "k", 64).count() == 0)
    val allNull = Seq[(java.lang.Long, String)]((null, "x"))
      .toDF("k", "v")
    assert(JoinPrune.bloomSemiJoin(fact, allNull, "k", "k", 64).count() == 0)
    // schema survives the empty fast path
    assert(JoinPrune.bloomSemiJoin(fact, empty, "k", "k", 64)
      .columns.toSeq == Seq("k", "payload"))
  }

  test("bloomPrune is a superset of the true match set; the follow-up " +
      "join eliminates bloom false positives") {
    // 2k fact keys probed against a deliberately tiny (high-fpp) bloom
    // over 50 build keys: the prune must keep every true match, and the
    // composed bloomSemiJoin must still return EXACTLY the true matches
    val fact = spark.range(0, 2000).select(col("id").as("k"))
    val build = spark.range(0, 1000, 20).select(col("id").as("k")) // 50 keys
    val bloom = JoinPrune.buildBloom(build, "k",
      expectedKeys = 50, fpp = 0.3).get
    val pruned = JoinPrune.bloomPrune(fact, "k", bloom)
      .collect().map(_.getLong(0)).toSet
    val truth = (0L until 1000L by 20).toSet
    assert(truth.subsetOf(pruned), "bloom produced a false negative")
    val exact = JoinPrune.bloomSemiJoin(fact, build, "k", "k",
      expectedKeys = 50, fpp = 0.3).collect().map(_.getLong(0)).toSet
    assert(exact == truth, "semi join failed to remove false positives")
  }

  test("buildBloom clamps to the session bloom caps and still has no " +
      "false negatives") {
    val maxItems = spark.conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems").toLong
    val build = spark.range(0, 100).select(col("id").as("k"))
    // request far beyond the cap: the clamp must not break correctness
    val bloom = JoinPrune.buildBloom(build, "k",
      expectedKeys = maxItems * 10).get
    val kept = JoinPrune.bloomPrune(
        spark.range(0, 100).select(col("id").as("k")), "k", bloom)
      .count()
    assert(kept == 100, s"clamped bloom lost true keys: $kept/100")
  }

  test("bloomSemiJoin: stats-derived sizing (no pre-count scan) and " +
      "deliberate under-sizing both stay exact") {
    val fact = spark.range(0, 5000).select(col("id").as("k"))
    val build = spark.range(0, 5000, 7).select(col("id").as("k"))
    val truth = (0L until 5000L by 7).toSet
    // default path: expectedKeys omitted → sized from plan statistics
    // (falling back to the expectedNumItems conf), zero sizing scans
    val byDefault = JoinPrune.bloomSemiJoin(fact, build, "k", "k")
      .collect().map(_.getLong(0)).toSet
    assert(byDefault == truth, "stats-derived sizing changed the result")
    // brutal under-size: 8 expected vs 715 actual keys — fpp degrades
    // (more false positives through the prune), the RESULT must not
    val underSized = JoinPrune.bloomSemiJoin(fact, build, "k", "k",
        expectedKeys = 8).collect().map(_.getLong(0)).toSet
    assert(underSized == truth, "under-sized bloom changed the result")
  }

  test("statsExpectedKeys: rowCount when the plan has one; sizeInBytes " +
      "estimate refines downward only (never above the conf default)") {
    val confDefault = spark.conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.expectedNumItems",
      "1000000").toLong
    // a bare Range leaf carries an exact rowCount in its plan
    // statistics (the no-op key projection is optimized away); any
    // non-leaf on top drops rowCount without CBO and falls through to
    // the size estimate
    assert(JoinPrune.statsExpectedKeys(spark.range(0, 715).toDF(), "id")
      == 715L, "Range rowCount not used for sizing")
    // a parquet scan has no rowCount: sizing must come from the
    // size-in-bytes estimate, strictly below the 1M conf default for a
    // small file, and never above the conf default
    val doc = spark.read.parquet(s"${sf()}/documents.parquet")
    val est = JoinPrune.statsExpectedKeys(doc, "doc_id")
    assert(est <= confDefault, s"estimate $est exceeds conf default")
    assert(est < confDefault,
      s"small build not refined below the conf default: $est")
    assert(est >= 1024L, s"estimate floor violated: $est")
  }
}

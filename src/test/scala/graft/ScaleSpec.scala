package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Scale-path mechanics: salted aggregation equivalence and bucketed
  * co-located joins (shuffle elimination visible in the plan). */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregate equals the direct aggregate on skewed data") {
    // 90% of rows share one hot key
    val df = (1 to 20000).map { i =>
      (if (i % 10 == 0) s"key_${i % 7}" else "hot_key", i.toLong, i * 0.5)
    }.toDF("k", "row_id", "v")
    val direct = df.groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v").as("sum_value"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    val salted = Skew.saltedSumCount(df, Seq("k"), "v", "row_id")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, (n, s)) =>
      assert(n == direct(k)._1)
      assert(math.abs(s - direct(k)._2) < 1e-6)
    }
  }

  test("salted join equals the direct join on skewed data") {
    val fact = (1 to 20000).map { i =>
      (if (i % 10 == 0) s"key_${i % 7}" else "hot_key", i.toLong, i * 1.0)
    }.toDF("k", "row_id", "v")
    val dim = (Seq("hot_key") ++ (0 to 6).map(i => s"key_$i"))
      .zipWithIndex.map { case (k, i) => (k, s"label_$i") }
      .toDF("k", "label")
    val direct = fact.join(dim, Seq("k"))
      .groupBy($"label").agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    val salted = Skew.saltedJoin(fact, dim, Seq("k"), "row_id")
      .groupBy($"label").agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, (n, s)) =>
      assert(n == direct(k)._1)
      assert(math.abs(s - direct(k)._2) < 1e-6)
    }
  }

  test("bucketed tables join without an exchange on the bucket key") {
    val series = (1 to 5000)
      .map(i => (s"serie_${i % 50}", i, i * 1.0))
      .toDF("serie_id", "seq", "valor")
    series.write.mode("overwrite")
      .bucketBy(8, "serie_id").sortBy("serie_id")
      .saveAsTable("bucketed_series_a")
    series.write.mode("overwrite")
      .bucketBy(8, "serie_id")
      .saveAsTable("bucketed_series_b")
    val joined = spark.table("bucketed_series_a").groupBy($"serie_id")
      .agg(sum($"valor").as("sa"))
      .join(
        spark.table("bucketed_series_b").groupBy($"serie_id")
          .agg(sum($"valor").as("sb")),
        Seq("serie_id"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    // both aggregations and the join reuse the bucket layout: the plan
    // has no shuffle Exchange (broadcast exchanges would be fine)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    spark.sql("DROP TABLE IF EXISTS bucketed_series_a")
    spark.sql("DROP TABLE IF EXISTS bucketed_series_b")
  }

  test("IVF index: persisted probes match in-memory ANN and prune partitions") {
    val dir = Files.createTempDirectory("graft-ivf").toString
    val vectors = Tables(spark, sf()).embeddings
    graft.operators.Similarity.writeIvfIndex(vectors, "vec_id",
      "embedding", "label", dir)
    // posting lists are the physical layout: one dir per cell
    assert(new java.io.File(s"$dir/postings").listFiles()
      .exists(_.getName.startsWith("cell=")))

    val queries = vectors.filter(col("vec_id") < 8)
    val fromIndex = graft.operators.Similarity.ivfKnnFromIndex(spark, dir,
      queries, "vec_id", "embedding", k = 5)
    val inMemory = graft.operators.Similarity.ivfKnn(vectors, queries,
      "vec_id", "embedding", "label", k = 5)
    val a = fromIndex.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val b = inMemory.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(a == b, s"index probe diverged: ${a.diff(b)} vs ${b.diff(a)}")

    // the probe reads ONLY its cells: partition pruning in the plan
    val p = fromIndex.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("cell"),
      s"posting-list pruning not applied:\n$p")
  }

  test("k-means IVF: label-free index build, probes prune partitions") {
    // a production corpus has no label column — the quantizer must come
    // from the data alone (Similarity.kmeansCells), then feed the same
    // writeIvfIndex/probe machinery
    val dir = Files.createTempDirectory("graft-ivf-km").toString
    val vectors = Tables(spark, sf()).embeddings.drop("label")
    val clustered = graft.operators.Similarity.kmeansCells(
      vectors, "vec_id", "embedding", k = 4, iters = 2)
    // every vector got exactly one cell in [0, k)
    assert(clustered.count() == vectors.count())
    val cells = clustered.select("cell").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(cells.nonEmpty && cells.forall(c => c >= 0 && c < 4), cells)

    graft.operators.Similarity.writeIvfIndex(clustered, "vec_id",
      "embedding", "cell", dir)
    assert(new java.io.File(s"$dir/postings").listFiles()
      .exists(_.getName.startsWith("cell=")))
    val queries = vectors.filter(col("vec_id") < 4)
    val knn = graft.operators.Similarity.ivfKnnFromIndex(spark, dir,
      queries, "vec_id", "embedding", k = 3)
    assert(knn.count() > 0)
    val p = knn.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("cell"),
      s"posting-list pruning not applied:\n$p")
  }

  test("IVF upsert: incremental batches equal one-shot, frozen geometry, replace") {
    val S = graft.operators.Similarity
    val vectors = Tables(spark, sf()).embeddings
    val evens = vectors.filter(col("vec_id") % 2 === 0)
    val odds = vectors.filter(col("vec_id") % 2 === 1)
    val queries = vectors.filter(col("vec_id") < 8)
    def probe(dir: String) = S.ivfKnnFromIndex(spark, dir, queries,
        "vec_id", "embedding", k = 5, nProbe = 2)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet

    // path 1: build from evens, upsert all odds in ONE batch
    val d1 = Files.createTempDirectory("graft-ups1").toString
    S.writeIvfIndex(evens, "vec_id", "embedding", "label", d1)
    val centsBefore = spark.read.parquet(s"$d1/centroids").collect()
      .map(_.toString).sorted.toSeq
    val n1 = S.upsertIvfIndex(spark, d1, odds, "vec_id", "embedding")
    assert(n1 >= 1)
    // frozen geometry: the upsert must not have touched the centroids
    val centsAfter = spark.read.parquet(s"$d1/centroids").collect()
      .map(_.toString).sorted.toSeq
    assert(centsBefore == centsAfter, "upsert moved the centroids")

    // path 2: same build, odds arrive as TWO batches — incrementality
    val d2 = Files.createTempDirectory("graft-ups2").toString
    S.writeIvfIndex(evens, "vec_id", "embedding", "label", d2)
    S.upsertIvfIndex(spark, d2, odds.filter(col("vec_id") % 4 === 1),
      "vec_id", "embedding")
    S.upsertIvfIndex(spark, d2, odds.filter(col("vec_id") % 4 === 3),
      "vec_id", "embedding")
    val (p1, p2) = (probe(d1), probe(d2))
    assert(p1 == p2, s"batch split changed the probe: " +
      s"${p1.diff(p2)} vs ${p2.diff(p1)}")
    // the upserted rows are really served
    val odd = p1.map(_._2).exists(_ % 2 == 1)
    assert(odd, "no odd candidate ever surfaced after upsert")

    // skip vs replace on an id collision
    import spark.implicits._
    val victim = odds.select("vec_id", "embedding").limit(1).collect().head
    val vid = victim.getLong(0)
    val flipped = victim.getSeq[Float](1).map(x => -x)
    val collide = Seq((vid, flipped)).toDF("vec_id", "embedding")
    S.upsertIvfIndex(spark, d1, collide, "vec_id", "embedding")
    val kept = spark.read.parquet(s"$d1/postings")
      .filter(col("vec_id") === vid).select("embedding")
      .collect().head.getSeq[Float](0)
    assert(kept == victim.getSeq[Float](1), "skip semantics violated")
    S.upsertIvfIndex(spark, d1, collide, "vec_id", "embedding",
      replace = true)
    val kept2 = spark.read.parquet(s"$d1/postings")
      .filter(col("vec_id") === vid).select("embedding")
      .collect().head.getSeq[Float](0)
    assert(kept2 == flipped, "replace semantics violated")
    // one-row-per-id invariant held through both collisions
    assert(spark.read.parquet(s"$d1/postings")
      .filter(col("vec_id") === vid).count() == 1)
  }

  test("IVF-PQ upsert: codes postings maintained, probes serve new rows") {
    val S = graft.operators.Similarity
    val vectors = Tables(spark, sf()).embeddings
    val evens = vectors.filter(col("vec_id") % 2 === 0)
    val odds = vectors.filter(col("vec_id") % 2 === 1)
    val d1 = Files.createTempDirectory("graft-pqups1").toString
    val d2 = Files.createTempDirectory("graft-pqups2").toString
    val books = S.pqTrain(evens, "vec_id", "embedding",
      m = 4, k = 8, iters = 1, dims = 64)
    S.writeIvfPqIndex(evens, "vec_id", "embedding", "label", books, d1)
    S.writeIvfPqIndex(evens, "vec_id", "embedding", "label", books, d2)
    S.upsertIvfPqIndex(spark, d1, odds, "vec_id", "embedding")
    S.upsertIvfPqIndex(spark, d2, odds.filter(col("vec_id") % 4 === 1),
      "vec_id", "embedding")
    S.upsertIvfPqIndex(spark, d2, odds.filter(col("vec_id") % 4 === 3),
      "vec_id", "embedding")
    val queries = vectors.filter(col("vec_id") < 4)
    def probe(dir: String) = S.pqSearchFromIndex(spark, dir, queries,
        "vec_id", "embedding", topK = 5, nProbe = 2)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val (p1, p2) = (probe(d1), probe(d2))
    assert(p1 == p2, "PQ batch split changed the probe")
    assert(p1.map(_._2).exists(_ % 2 == 1), "no upserted candidate served")
    // postings still carry codes only (never raw vectors)
    val cols = spark.read.parquet(s"$d1/postings").columns.toSet
    assert(cols == Set("vec_id", "codes", "cell"), cols)
  }

  test("IVF-PQ composed index: pruned probes over codes-only postings") {
    // the full label-free composition: coarse cells from k-means,
    // codebooks from PQ training, posting lists partitioned by cell
    // carrying ONLY code arrays — a probe prunes partitions AND moves
    // ~32x less data per candidate than raw vectors
    val dir = Files.createTempDirectory("graft-ivfpq").toString
    val vectors = Tables(spark, sf()).embeddings.drop("label")
    val S = graft.operators.Similarity
    val clustered = S.kmeansCells(vectors, "vec_id", "embedding",
      k = 4, iters = 1)
    val books = S.pqTrain(vectors, "vec_id", "embedding",
      m = 4, k = 8, iters = 1, dims = 64)
    S.writeIvfPqIndex(clustered, "vec_id", "embedding", "cell", books, dir)

    val postings = spark.read.parquet(s"$dir/postings")
    assert(postings.columns.toSet == Set("vec_id", "codes", "cell"),
      postings.columns.mkString(","))
    assert(new java.io.File(s"$dir/postings").listFiles()
      .exists(_.getName.startsWith("cell=")))

    val knn = S.pqSearchFromIndex(spark, dir,
      vectors.filter(col("vec_id") < 4), "vec_id", "embedding", topK = 3)
    val rows = knn.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => math.abs(r.getAs[Double]("sim_adc")) <= 1.0001))
    val p = knn.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("cell"),
      s"posting-list pruning not applied:\n$p")

    // the recall knob: nProbe=2 widens each query to two cells — at
    // least as many candidates survive, results remain a superset-or-
    // equal candidate pool so per-query top-1 sim can only improve
    val wide = S.pqSearchFromIndex(spark, dir,
      vectors.filter(col("vec_id") < 4), "vec_id", "embedding",
      topK = 3, nProbe = 2).collect()
    val top1 = rows.filter(_.getAs[Int]("rank") == 1)
      .map(r => r.getLong(0) -> r.getAs[Double]("sim_adc")).toMap
    val top1Wide = wide.filter(_.getAs[Int]("rank") == 1)
      .map(r => r.getLong(0) -> r.getAs[Double]("sim_adc")).toMap
    top1.foreach { case (q, s1) =>
      assert(top1Wide(q) >= s1 - 1e-9,
        s"query $q: nProbe=2 top-1 ${top1Wide(q)} worse than nProbe=1 $s1") }
  }

  test("pipeline skip/replace gate (P9) leaves existing outputs alone") {
    val dir = Files.createTempDirectory("graft-p9")
    val csv = dir.resolve("src.csv")
    Files.writeString(csv,
      "indice_tiempo,v\n2020-01-01,1\n2020-02-01,2\n")
    val cat = dir.resolve("cat.json")
    Files.writeString(cat,
      s"""{"identifier":"p9","title":"t","description":"d",
         |"publisher":{"name":"p"},"superThemeTaxonomy":"http://x",
         |"dataset":[{"identifier":"1","title":"ds","description":"d",
         |"publisher":{"name":"p"},"superTheme":["A"],
         |"accrualPeriodicity":"R/P1M","issued":"2020-01-01",
         |"distribution":[{"identifier":"1.1","title":"t",
         |"issued":"2020-01-01","fileName":"out.csv",
         |"downloadURL":"$csv","field":[
         |{"title":"indice_tiempo","type":"date",
         | "specialType":"time_index","specialTypeDetail":"R/P1M"},
         |{"id":"v","title":"v","type":"number"}]}]}]}"""
        .stripMargin.replace("\n", ""))
    val out = dir.resolve("out").toString
    val first = Pipeline.run(spark, cat.toString, "p9", out)
    assert(first.report.head().getAs[String]("distribution_status") == "OK")
    val target = java.nio.file.Paths.get(out,
      "catalog/p9/dataset/1/distribution/1.1/download/out.csv")
    val mtime = Files.getLastModifiedTime(target)
    val second = Pipeline.run(spark, cat.toString, "p9", out,
      replace = false)
    assert(second.report.head()
      .getAs[String]("distribution_status") == "SKIPPED")
    assert(Files.getLastModifiedTime(target) == mtime)
  }
}

package graft

// Throwaway A/B harness for the native vs HOF vector fold (deleted
// after measurement; not part of the library surface).
object VecAB {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val dir = "/root/testdata/sf0.1"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    // amplify: cross candidates against 40 queries, full scoring pass
    val q = emb.filter(col("vec_id") < 40)
    def scoreNative() = Similarity.bruteForceKnn(q, emb, "vec_id", "embedding", 5).count()
    def scoreHof() = {
      val qq = q.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        Similarity.normHof(col("embedding")).as("qn"))
      val c = emb.select(col("vec_id").as("cand_id"), col("embedding").as("cv"),
        Similarity.normHof(col("embedding")).as("cn"))
      val scored = c.join(broadcast(qq), col("query_id") =!= col("cand_id"))
        .withColumn("sim", round(Similarity.dotHof(col("qv"), col("cv")) /
          nullif(col("qn") * col("cn"), lit(0.0)), 6))
      scored.agg(sum("sim")).collect(); scored.count()
    }
    // warm both
    scoreNative(); scoreHof()
    def time(f: () => Long): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    val nat = (1 to 5).map(_ => time(scoreNative _))
    val hof = (1 to 5).map(_ => time(scoreHof _))
    println(f"native median ${nat.sorted.apply(2)}%.3f  all ${nat.map(x => f"$x%.3f").mkString(",")}")
    println(f"hof    median ${hof.sorted.apply(2)}%.3f  all ${hof.map(x => f"$x%.3f").mkString(",")}")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Scaling-audit diagnostic: candidate-pair counts for the two
  * pair-search operators whose cost is candidate-grain, measured
  * THROUGH the production code paths (Dedup.prefixFilterParts /
  * Dedup.simhashPairParts — no duplicated logic to drift).
  *
  * Why a dedicated main: wall-clock alone cannot distinguish "the
  * candidate stage grew linearly" from "fixed buckets went quadratic
  * but the host absorbed it this decade" (the q65 lesson — 187M
  * candidate pairs hid behind a 234 s wall time until ×100). The
  * per-decade CANDIDATE ratio is the structural number; this prints
  * it per corpus so the committed scaling artifact can log it.
  *
  * Usage: ScaleDiag <sfDir>  →  one JSON line:
  * {"sf":…,"n_docs":N,"q182_candidates":N,"q204_candidates":N,
  *  "q204_candidates_32bit":N}
  * (the 32-bit simhash count is the RETIRED configuration, printed so
  * the artifact can show the fix's headroom side by side).
  */
object ScaleDiag {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: ScaleDiag <sfDir>")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, sfDir).documents
    val nDocs = docs.count()
    val prefix = graft.operators.Dedup
      .prefixFilterParts(docs, "text", "doc_id", threshold = 0.5,
        shingleN = 3).cand.count()
    val sim64 = graft.operators.Dedup
      .simhashPairParts(docs, "text", "doc_id", maxHamming = 3,
        nBits = 64, bands = 4).cand.count()
    val sim32 = graft.operators.Dedup
      .simhashPairParts(docs, "text", "doc_id", maxHamming = 3,
        nBits = 32, bands = 4).cand.count()
    println(s"""{"sf":"$sfDir","n_docs":$nDocs,""" +
      s""""q182_candidates":$prefix,"q204_candidates":$sim64,""" +
      s""""q204_candidates_32bit":$sim32}""")
    spark.stop()
  }
}

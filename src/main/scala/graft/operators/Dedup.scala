package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GF

/** Deduplication operators for large-scale text corpora (north-star ops;
  * BASELINE.json). Exact, MinHash-LSH, SimHash and n-gram-Jaccard
  * variants, all built from codegen'd `functions._` expressions on a
  * portable hash (GF.hash32) so results are engine-independent.
  *
  * Scale notes (100 TB):
  *  - exact dedup is one hash-shuffle on a 16-byte digest, not the text;
  *  - minhash candidates shuffle only (band, bucket) pairs — the classic
  *    LSH trick keeps the self-join linear-ish instead of quadratic;
  *  - verification (jaccard) runs only on candidate pairs.
  */
object Dedup {

  /** Canonical text normalization applied before hashing: lowercase,
    * strip non-alphanumerics to spaces, collapse whitespace. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9]+", " "), "\\s+", " "))

  /** Exact duplicate groups: md5 over normalized text; returns one row
    * per duplicated digest with group size and the kept (min) id. */
  def exactDuplicateGroups(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(md5(normalizeText(col(textCol))).as("digest"), col(idCol))
      .groupBy(col("digest"))
      .agg(count(lit(1)).as("group_size"), min(col(idCol)).as("keeper_id"))
      .filter(col("group_size") > 1)

  /** Exact dedup: keep the min-id row per digest. Implemented as a
    * groupBy + min + semi-join back (no row_number window: the digest
    * agg is partial-aggregatable, the window would not be). */
  def exactDedup(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keep = docs
      .select(md5(normalizeText(col(textCol))).as("digest"), col(idCol))
      .groupBy(col("digest")).agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    docs.join(keep, Seq(idCol), "left_semi")
  }

  /** Word n-gram shingles of the normalized text as an array column.
    * transform over an index sequence + slice: stays in codegen. */
  def shingles(textCol: Column, n: Int): Column = {
    val toks = GF.wsTokens(normalizeText(textCol))
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** MinHash signature: k min-hash values over the shingle set, as k
    * columns `mh0..mh{k-1}`. One explode + one groupBy (single shuffle
    * keyed by doc id; partial min aggregation on the map side). */
  def minhashSignature(docs: DataFrame, textCol: String, idCol: String,
      k: Int, shingleN: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol),
      explode(shingles(col(textCol), shingleN)).as("shingle"))
    val aggs = (0 until k).map(i =>
      min(GF.universalHash(col("shingle"), i)).as(s"mh$i"))
    sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: (band, bucket) pairs per doc; docs sharing a bucket in
    * any band are near-dup candidates. bucket = md5 of the band's
    * signature slice. */
  def lshBuckets(signature: DataFrame, idCol: String, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, s"k=$k must divide into bands=$bands")
    val r = k / bands
    val bandRows = (0 until bands).map { b =>
      val sigSlice = concat_ws("_",
        (b * r until (b + 1) * r).map(i => col(s"mh$i").cast("string")): _*)
      signature.select(col(idCol), lit(b).as("band"),
        md5(sigSlice).as("bucket"))
    }
    bandRows.reduce(_ union _)
  }

  /** Candidate pairs (id1 < id2) from LSH buckets, deduplicated across
    * bands. The self-join shuffles on (band, bucket) — tiny keys. */
  def candidatePairs(buckets: DataFrame, idCol: String): DataFrame = {
    val l = buckets.select(col("band"), col("bucket"), col(idCol).as("id1"))
    val r = buckets.select(col("band"), col("bucket"), col(idCol).as("id2"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2")).distinct()
  }

  /** Exact n-gram Jaccard similarity for given candidate pairs.
    * Explodes each side's shingle set once and counts intersections —
    * never materializes a cross product. */
  def ngramJaccard(docs: DataFrame, pairs: DataFrame, textCol: String,
      idCol: String, n: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("_id"),
      explode(shingles(col(textCol), n)).as("shingle"))
    val sizes = sh.groupBy(col("_id")).agg(count(lit(1)).as("n_sh"))
    val inter = pairs
      .join(sh.withColumnRenamed("_id", "id1").withColumnRenamed("shingle", "s1"), Seq("id1"))
      .join(sh.withColumnRenamed("_id", "id2").withColumnRenamed("shingle", "s2"), Seq("id2"))
      .filter(col("s1") === col("s2"))
      .groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("n_inter"))
    pairs
      .join(inter, Seq("id1", "id2"), "left")
      .join(sizes.withColumnRenamed("_id", "id1").withColumnRenamed("n_sh", "n1"), Seq("id1"))
      .join(sizes.withColumnRenamed("_id", "id2").withColumnRenamed("n_sh", "n2"), Seq("id2"))
      .withColumn("n_inter", coalesce(col("n_inter"), lit(0L)))
      .withColumn("jaccard",
        round(col("n_inter").cast("double") /
          (col("n1") + col("n2") - col("n_inter")), 6))
  }

  /** 32-bit SimHash per doc: per token-bit contribution ±count, bit j of
    * the hash set when the summed contribution is positive. Two narrow
    * shuffles (doc×bit, then doc). */
  def simhash(docs: DataFrame, textCol: String, idCol: String,
      nBits: Int = 32): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(GF.wsTokens(normalizeText(col(textCol)))).as("tok"))
      .withColumn("h", GF.hash32(col("tok")))
    // shiftright/shiftleft by a *column* exist only at the SQL layer
    // (the Scala helpers take an Int), hence the expr() calls.
    val bits = toks.select(col(idCol), col("h"),
      explode(sequence(lit(0), lit(nBits - 1))).as("bit"))
      .withColumn("contrib",
        when(expr("shiftright(h, bit)").bitwiseAND(1) === 1, 1L).otherwise(-1L))
      .groupBy(col(idCol), col("bit"))
      .agg(sum(col("contrib")).as("s"))
    bits.groupBy(col(idCol))
      .agg(sum(when(col("s") > 0, expr("shiftleft(1L, bit)")).otherwise(0L))
        .as("simhash"))
  }
}

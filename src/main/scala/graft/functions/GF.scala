package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Graft scalar-function library.
  *
  * Column-level re-expressions of the reference's scalar semantics
  * (SURVEY.md §2.7: F1-F10, reference series_tiempo_ar_scraping at
  * processors.py / base.py) plus the portable-hash primitives used by the
  * dedup / similarity / fingerprint operators.
  *
  * Everything here is built from `org.apache.spark.sql.functions._` so it
  * stays inside whole-stage codegen — no Scala UDFs on the hot path.
  */
object GF {

  // ---------------------------------------------------------------------
  // Portable hashing.
  //
  // Dedup/minhash/simhash need a hash function that an external SQL oracle
  // (DuckDB) can reproduce bit-for-bit. md5 is identical everywhere; we
  // take 8 hex chars (32 bits) so the value always fits a signed 64-bit
  // int. conv() returns a decimal string; cast to long.
  // ---------------------------------------------------------------------

  /** Unsigned 32-bit hash of a string column: int(md5(s)[off..off+8), 16).
    * Native single-digest expression (Md5Hash32Expr) — bit-equal to the
    * composed `conv(substring(md5(c), off, 8), 16, 10)::long` form it
    * replaces (GFSpec pins it against [[hash32Jvm]]) without
    * materializing and re-parsing the 32-char hex string per row; the
    * SQL oracle keeps replaying the hex/conv form. */
  def hash32(c: Column, hexOffset: Int = 1): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      Md5Hash32Expr(ColumnBridge.expression(c), hexOffset))
  }

  /** Both md5 hex windows from ONE digest, as struct<h1, h2> — for the
    * two-band fingerprints (simhash ≥ 33 bits, exact-substr grams)
    * that would otherwise digest twice. Field i is bit-equal to
    * [[hash32]] at the corresponding offset. */
  def hash32Pair(c: Column, off1: Int = 1, off2: Int = 9): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      Md5Hash32PairExpr(ColumnBridge.expression(c), off1, off2))
  }

  /** Driver-side twin of [[hash32]] (same md5 window, same value) for
    * metadata-plane routing — e.g. mapping literal query terms to their
    * posting-index buckets without a Spark job. Asserted bit-equal to
    * the column form in GFSpec. */
  def hash32Jvm(s: String, hexOffset: Int = 1): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(hexOffset - 1, hexOffset + 7), 16)
  }

  /** i-th universal hash h_i(x) = (a_i * hash32(x) + b_i) mod p, with
    * small odd multipliers so a*h never overflows a signed long.
    * p = 4294967311 is the smallest prime > 2^32.
    */
  val MinhashPrime: Long = 4294967311L
  def universalHash(c: Column, i: Int): Column =
    (hash32(c) * lit(2L * i + 1) + lit(101L * i + 17)) % lit(MinhashPrime)

  // ---------------------------------------------------------------------
  // Tokenization (portable between Spark and the SQL oracle).
  // ---------------------------------------------------------------------

  /** Whitespace tokens, empty-safe: trim first so no leading "" token. */
  def wsTokens(c: Column): Column =
    // array_remove("") ≡ filter(length > 0): split of a trimmed string
    // only yields empty tokens on empty input, and removal preserves
    // order. The HOF filter form is CodegenFallback (interpreted) and
    // this function sits under EVERY tokenization in the engine.
    array_remove(split(trim(c), "\\s+"), "")

  /** BPE-ish subword segmentation: runs of letters, runs of digits, or a
    * single non-alphanumeric non-space char each count as one token
    * (SURVEY north-star "token counting": whitespace + a BPE-ish regex).
    */
  val BpeTokenRegex = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  // ---------------------------------------------------------------------
  // F1-F10 (SURVEY §2.7) — the reference's scalar functions.
  // ---------------------------------------------------------------------

  /** F1 — whitespace strip in ids/titles (reference base.py:940-948). */
  def stripSpaces(c: Column): Column = translate(c, " ", "")

  /** F2 — file-extension extraction, lowercased
    * (reference base.py:133-134,143-144: `split(".")[-1].lower()`). */
  def fileExtension(c: Column): Column =
    lower(element_at(split(c, "\\."), -1))

  /** F3 — basename from URL/path (reference base.py:560,580). */
  def basename(c: Column): Column = element_at(split(c, "/"), -1)

  /** F4 — cell-coordinate row parse: "A8" -> 8; null when malformed
    * (reference processors.py:223-228 `row_from_cell_coord`). */
  def cellRow(c: Column): Column =
    nullif(regexp_extract(c, "^[A-Za-z]+(\\d+)$", 1), lit("")).cast("int")

  /** Cell-coordinate column letters: "AB8" -> "AB". */
  def cellColLetters(c: Column): Column =
    nullif(regexp_extract(c, "^([A-Za-z]+)\\d+$", 1), lit(""))

  /** Column letters -> 1-based index ("A"->1, "Z"->26, "AA"->27).
    * Base-26 positional fold via aggregate over the letter array —
    * higher-order function, no UDF. */
  def cellColIndex(c: Column): Column = {
    val letters = filter(split(upper(cellColLetters(c)), ""), s => length(s) > 0)
    aggregate(
      letters,
      lit(0L),
      (acc, ch) => acc * 26 + (ascii(ch) - 64)
    ).cast("int")
  }

  /** F5 — ISO-8601 repeat-duration -> pandas-style frequency code
    * (reference processors.py:230-238). Unknown input -> null (the
    * reference raises KeyError; engine surfaces nulls to the validator). */
  def freqCode(c: Column): Column = {
    val m = map(
      lit("R/P1Y"), lit("Y"), lit("R/P6M"), lit("S"), lit("R/P3M"), lit("Q"),
      lit("R/P1M"), lit("M"), lit("R/P1D"), lit("D"))
    element_at(m, c)
  }

  /** F6 — the reference's 19-token missing-value list
    * (processors.py:90-95 XLSERIES_PARAMS["missing_value"]). */
  val MissingTokens: Seq[String] = Seq(
    "", " ", "-", "--", "---", ".", "...", "/", "///",
    "s.d.", "s.d", "s/d", "n,d,", "n,d", "n.d.", "n.d", "n/d", "s", "x")

  /** Numeric-literal shape accepted by the value parser. */
  private val NumericRegex = "^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?$"

  /** F6 — normalize missing tokens to null, else parse as double; any
    * other junk also becomes null (the reference coerces to NaN). The
    * cast sits inside a `when` branch guarded by a numeric regex so it
    * is ANSI-mode safe (Spark 4 default). */
  def normalizeValue(c: Column): Column =
    when(c.isNull || trim(c).isin(MissingTokens: _*), lit(null).cast("double"))
      .when(trim(c).rlike(NumericRegex), trim(c).cast("double"))
      .otherwise(lit(null).cast("double"))

  /** F7 — output downloadURL rewrite: replace the output-dir prefix with
    * the configured host; "" when the prefix is absent
    * (reference base.py:221-236). */
  def rewriteDownloadUrl(path: Column, outputDir: String, host: String): Column =
    when(path.startsWith(outputDir),
      concat(lit(host), substring(path, outputDir.length + 1, Int.MaxValue)))
      .otherwise(lit(""))

  /** F8 — nested output path assembly (reference base.py:242-249):
    * catalog/{cid}/dataset/{did}/distribution/{disid}/download/{fileName | identifier.csv}. */
  def distributionPath(catalogId: Column, datasetId: Column,
                       distributionId: Column, fileName: Column): Column =
    concat_ws("/",
      lit("catalog"), catalogId, lit("dataset"), datasetId,
      lit("distribution"), distributionId, lit("download"),
      coalesce(fileName, concat(distributionId, lit(".csv"))))

  /** URL canonicalization for crawl dedup: collapse the cosmetic
    * variants that make one page look like many documents. Steps, in
    * order (each a regexp/string transform — pure codegen'd expression
    * chain, replayable by any engine with regexp_replace):
    *
    *  1. drop the fragment (`#...` never reaches the server);
    *  2. drop tracking params (`utm_*`, `gclid`, `fbclid`) keeping the
    *     `?`/`&` structure of what remains intact;
    *  3. lowercase the scheme://host prefix (the path stays
    *     case-sensitive per RFC 3986);
    *  4. strip a `www.` host prefix and an explicit default port
    *     (`:80` http / `:443` https);
    *  5. strip one trailing `/` from a non-root path.
    *
    * Deliberately NOT done: percent-decoding and query-param
    * reordering (both can change server semantics). */
  def canonicalizeUrl(u: Column): Column = {
    // 1-2: fragment, then tracking params; a removed leading param
    // leaves "?&" or "&&" behind — squeeze separators, then strip a
    // dangling trailing "?"/"&"
    val noFrag = regexp_replace(trim(u), "#.*", "")
    val noTrack = regexp_replace(noFrag,
      "([?&])(utm_[^=&]*|gclid|fbclid)=[^&]*", "$1")
    val squeezed = regexp_replace(
      regexp_replace(noTrack, "&&+", "&"), "\\?&", "?")
    val tidy = regexp_replace(squeezed, "[?&]+$", "")
    // 3: lowercase scheme://host[:port] only
    val prefix = regexp_extract(tidy, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0)
    val rest = substring(tidy, length(prefix) + 1, lit(Int.MaxValue))
    val lowered = concat(lower(prefix), rest)
    // 4: www. prefix, default ports
    val noWww = regexp_replace(lowered, "^([a-z][a-z0-9+.-]*://)www\\.", "$1")
    // (no lookarounds anywhere in this chain: the external oracle's
    // regex engine is RE2, which has none)
    val noPort = regexp_replace(
      regexp_replace(noWww, "^(https://[^/:?#]+):443([/?].*)?$", "$1$2"),
      "^(http://[^/:?#]+):80([/?].*)?$", "$1$2")
    // 5: one trailing slash on a non-root path
    regexp_replace(noPort, "([^/])/$", "$1")
  }
}

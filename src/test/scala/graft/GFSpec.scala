package graft

import org.apache.spark.sql.functions._
import graft.functions.GF
import graft.model.{Frequency, Method}

class GFSpec extends SparkSpec {
  import spark.implicits._

  test("cell coordinate row/col parsing (F4)") {
    val df = Seq("A8", "BA37", "zz100", "bogus", "8A").toDF("c")
      .select(col("c"), GF.cellRow(col("c")).as("row"),
        GF.cellColIndex(col("c")).as("colIdx"))
    val rows = df.collect().map(r =>
      r.getString(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(rows("A8") == (Some(8), Some(1)))
    assert(rows("BA37") == (Some(37), Some(53)))
    assert(rows("zz100") == (Some(100), Some(702)))
    assert(rows("bogus") == (None, None))
    assert(rows("8A") == (None, None))
  }

  test("frequency map (F5) and ADT arithmetic") {
    val codes = Seq("R/P1Y", "R/P6M", "R/P3M", "R/P1M", "R/P1D", "R/P1W")
      .toDF("iso").select(GF.freqCode(col("iso"))).collect().map(r =>
        Option(r.getString(0)))
    assert(codes.toSeq == Seq(Some("Y"), Some("S"), Some("Q"), Some("M"),
      Some("D"), None))
    assert(Frequency.Semester.months.contains(6))
    assert(Frequency.Daily.months.isEmpty)
    assert(Frequency.fromIso("R/P6M").contains(Frequency.Semester))
    assert(Frequency.fromCode("Q").contains(Frequency.Quarterly))
    assert(Method.all.map(_.name) ==
      Seq("csv_file", "text_file", "excel_file"))
  }

  test("missing-token normalization (F6)") {
    val vals = Seq("1.5", " 2.25 ", "s.d.", "///", "", " ", "x", "junk",
      "-3e2", null)
      .toDF("v").select(GF.normalizeValue(col("v"))).collect()
      .map(r => Option(r.get(0)))
    assert(vals.toSeq == Seq(Some(1.5), Some(2.25), None, None, None, None,
      None, None, Some(-300.0), None))
  }

  test("extension/basename/strip (F1-F3)") {
    val r = Seq(("a b c", "http://h/p/file.XLSX"))
      .toDF("t", "u")
      .select(GF.stripSpaces(col("t")), GF.fileExtension(col("u")),
        GF.basename(col("u")))
      .head()
    assert(r.getString(0) == "abc")
    assert(r.getString(1) == "xlsx")
    assert(r.getString(2) == "file.XLSX")
  }

  test("downloadURL rewrite (F7) and path assembly (F8)") {
    val r = Seq(("/out/catalog/c/f.csv", "/elsewhere/f.csv"))
      .toDF("in", "out")
      .select(
        GF.rewriteDownloadUrl(col("in"), "/out", "https://h"),
        GF.rewriteDownloadUrl(col("out"), "/out", "https://h"),
        GF.distributionPath(lit("c"), lit("d"), lit("d.1"), lit(null)))
      .head()
    assert(r.getString(0) == "https://h/catalog/c/f.csv")
    assert(r.getString(1) == "")
    assert(r.getString(2) ==
      "catalog/c/dataset/d/distribution/d.1/download/d.1.csv")
  }

  test("portable hash32 is stable") {
    // pinned value: int(md5('abc')[0:8], 16) — reproducible by any md5
    val h = Seq("abc").toDF("s").select(GF.hash32(col("s"))).head().getLong(0)
    assert(h == 2416005272L)
  }

  test("hash32Jvm matches the column expression bit-for-bit") {
    val inputs = Seq("abc", "", "spark", "the quick brown fox", "ünïcode")
    val fromCol = inputs.toDF("s")
      .select(col("s"), GF.hash32(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    inputs.foreach { s =>
      assert(GF.hash32Jvm(s) == fromCol(s), s"mismatch for '$s'")
    }
  }

  // ---- r17 native hot-path expressions: the optimized forms must be
  // bit-equal to the composed built-in chains they replaced ----

  private val normFixtures = Seq(
    "", " ", "\t\n", "Hello, World!", "  a  b\t c ", "a", "7",
    "ünïcode MÉGA test", "x9---y0", "ALL CAPS 123", "çà-va? s.d. n/d",
    "tabs\tand\nnewlines\r\nmixed", "trailing space ", " leading",
    "double  space", "éléphant über ñandú 世界 mixed09",
    "punct!@#$%^&*()[]{}<>;:'\"`~", "İstanbul Kelvin K test",
    "a0b1c2 d3e4", "-", "----", "0", "00  11  22")

  test("hash32 native equals the composed md5/conv chain (incl. offset 9)") {
    val df = normFixtures.toDF("s")
    for (off <- Seq(1, 9)) {
      val rows = df.select(
          GF.hash32(col("s"), off).as("fast"),
          conv(substring(md5(col("s")), off, 8), 16, 10).cast("long")
            .as("slow"))
        .collect()
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
        s"hash32 offset $off diverged: $r"))
    }
    // null propagates like the composed chain
    val n = Seq[Option[String]](None).toDF("s")
      .select(GF.hash32(col("s"))).head()
    assert(n.isNullAt(0))
  }

  test("hash32Pair fields equal hash32 at each offset (one digest)") {
    val rows = normFixtures.toDF("s")
      .select(GF.hash32Pair(col("s")).as("p"),
        GF.hash32(col("s"), 1).as("h1"), GF.hash32(col("s"), 9).as("h2"))
      .select(col("p.h1").as("p1"), col("p.h2").as("p2"),
        col("h1"), col("h2"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(2) && r.getLong(1) == r.getLong(3),
        s"hash32Pair diverged: $r")
    }
    val n = Seq[Option[String]](None).toDF("s")
      .select(GF.hash32Pair(col("s"))).head()
    assert(n.isNullAt(0))
  }

  test("normalizeText/normTokens native equal the regex chains") {
    import graft.operators.Dedup
    val df = normFixtures.toDF("s")
    val regexNorm = trim(regexp_replace(
      regexp_replace(lower(col("s")), "[^a-z0-9]+", " "), "\\s+", " "))
    val rows = df.select(
        Dedup.normalizeText(col("s")).as("fastN"), regexNorm.as("slowN"),
        Dedup.normTokens(col("s")).as("fastT"),
        GF.wsTokens(regexNorm).as("slowT"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1), s"normText diverged: $r")
      assert(r.getSeq[String](2) == r.getSeq[String](3),
        s"normTokens diverged: $r")
    }
    val n = Seq[Option[String]](None).toDF("s")
      .select(Dedup.normalizeText(col("s")), Dedup.normTokens(col("s")))
      .head()
    assert(n.isNullAt(0) && n.isNullAt(1))
  }
}

package graft.sources

import java.io.InputStream
import java.net.{HttpURLConnection, URI}
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1/S2 — manifest-driven ingest: fetch each distinct source URL once
  * into a staging directory (SURVEY §2.1 S1-S2, §2.4 D2, §2.10;
  * reference download.py + base.py:546-587,917-930).
  *
  * The manifest is a DataFrame of (url, target); dedup (D2) is a
  * `distinct()` on it, skip-if-exists (P9) an executor-side check, the
  * fetch itself runs in `mapPartitions` on executors — the driver never
  * holds file bytes. Retries with sleep mirror download.py:35-50;
  * failures are captured as result rows (never thrown), the
  * download-error tolerance of base.py:926-930.
  */
object Ingest {

  final case class FetchResult(url: String, target: String, status: String,
      message: String, bytes: Long)

  /** Fetch every distinct (url, target) row. Columns required: `url`,
    * `target`. Returns one FetchResult row per distinct pair. */
  def fetchAll(spark: SparkSession, manifest: DataFrame,
      tries: Int = 3, retryDelayMs: Long = 1000L, timeoutMs: Int = 30000,
      replace: Boolean = false): DataFrame = {
    import spark.implicits._
    manifest.select(col("url"), col("target")).distinct()
      .as[(String, String)]
      .mapPartitions(_.map { case (url, target) =>
        fetchOne(url, target, tries, retryDelayMs, timeoutMs, replace)
      })
      .toDF()
  }

  /** One URL -> file, with bounded retries. file:// and http(s)://
    * both supported (file for tests / local lakes). */
  def fetchOne(url: String, target: String, tries: Int,
      retryDelayMs: Long, timeoutMs: Int, replace: Boolean): FetchResult = {
    val targetPath = Paths.get(target)
    if (!replace && Files.exists(targetPath))
      return FetchResult(url, target, "SKIPPED", "exists",
        Files.size(targetPath))
    var attempt = 0
    var lastError: Throwable = null
    while (attempt < tries) {
      attempt += 1
      try {
        Files.createDirectories(targetPath.getParent)
        val in = open(url, timeoutMs)
        try {
          val tmp = targetPath.resolveSibling(
            targetPath.getFileName.toString + ".part")
          Files.copy(in, tmp, StandardCopyOption.REPLACE_EXISTING)
          Files.move(tmp, targetPath, StandardCopyOption.REPLACE_EXISTING)
        } finally in.close()
        return FetchResult(url, target, "OK", "", Files.size(targetPath))
      } catch {
        // NonFatal only: an InterruptedException (task kill) or a
        // JVM-fatal error must not be swallowed into an ERROR row —
        // retrying/sleeping after those would delay task cancellation.
        case e: InterruptedException =>
          Thread.currentThread().interrupt()
          return FetchResult(url, target, "ERROR",
            s"interrupted: ${e.toString.take(280)}", 0L)
        case scala.util.control.NonFatal(e) =>
          lastError = e
          if (attempt < tries)
            try Thread.sleep(retryDelayMs)
            catch { case ie: InterruptedException =>
              Thread.currentThread().interrupt()
              return FetchResult(url, target, "ERROR",
                s"interrupted: ${ie.toString.take(280)}", 0L)
            }
      }
    }
    FetchResult(url, target, "ERROR",
      Option(lastError).map(_.toString.take(300)).getOrElse(""), 0L)
  }

  private def open(url: String, timeoutMs: Int): InputStream = {
    val u = new URI(url).toURL
    u.openConnection() match {
      case h: HttpURLConnection =>
        h.setConnectTimeout(timeoutMs)
        h.setReadTimeout(timeoutMs)
        h.setInstanceFollowRedirects(true)
        h.getInputStream
      case other =>
        other.setConnectTimeout(timeoutMs)
        other.getInputStream
    }
  }

  /** S6 — TXT distribution scan: delimited text with a header line, an
    * `indice_tiempo` column and numeric series columns (reference
    * TXTProcessor). Same normalization battery as the CSV path. */
  def readDistributionTxt(spark: SparkSession, path: String,
      delimiter: String = ","): DataFrame = {
    val raw = spark.read
      .option("header", "true").option("sep", delimiter)
      .csv(path)
    val valueCols = raw.columns.filter(_ != "indice_tiempo")
    raw.select(
      to_date(col("indice_tiempo")).as("indice_tiempo") +:
        valueCols.map(c =>
          graft.functions.GF.normalizeValue(col(c)).as(c)): _*)
  }
}

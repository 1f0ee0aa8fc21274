package graft.sinks

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.DataFrame
import scala.jdk.CollectionConverters._

/** K1 — exact-filename single-file CSV sink (SURVEY §2.2 K1; reference
  * base.py:266-279 writes one tidy CSV per distribution at an exact
  * path `…/distribution/{id}/download/{fileName}`).
  *
  * Spark writes a directory of part files; the reference's contract is a
  * single exactly-named file. Each distribution frame is small (one
  * series table), so `coalesce(1)` costs nothing; the rename happens on
  * the driver. The *distribution* of work across thousands of
  * distributions is what parallelizes at scale, not the write of one
  * file.
  */
object SingleFileCsv {

  /** Write `df` as a single CSV file at `target`, header included,
    * UTF-8, ISO date format — the reference's output contract. Returns
    * the final path.
    *
    * `sortBy` orders rows WITHIN the single coalesced partition
    * (O2 time-index order) — a global `orderBy` before a 1-file write
    * would pay a range-partitioner sampling job plus a shuffle for an
    * ordering the coalesce makes trivial anyway. */
  def write(df: DataFrame, target: String,
      sortBy: Seq[String] = Seq.empty): Path = {
    val targetPath = Paths.get(target)
    val tmpDir = targetPath.getParent.resolve(
      s".${targetPath.getFileName}.spark-tmp")
    val one = df.coalesce(1)
    val ordered =
      if (sortBy.nonEmpty)
        one.sortWithinPartitions(sortBy.map(org.apache.spark.sql.functions.col): _*)
      else one
    ordered
      .write.mode("overwrite")
      .option("header", "true")
      .option("dateFormat", "yyyy-MM-dd")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(tmpDir.toString)
    val part = Files.list(tmpDir).iterator().asScala
      .find(_.getFileName.toString.startsWith("part-"))
      .getOrElse(throw new IllegalStateException(
        s"no part file written under $tmpDir"))
    Files.createDirectories(targetPath.getParent)
    Files.move(part, targetPath, StandardCopyOption.REPLACE_EXISTING)
    // clean the temp dir (part + _SUCCESS markers)
    Files.list(tmpDir).iterator().asScala.foreach(Files.delete)
    Files.delete(tmpDir)
    targetPath
  }
}

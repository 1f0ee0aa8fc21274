package graft.sources

import java.io.{ByteArrayOutputStream, InputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Minimal XLSX reader/writer built on java.util.zip + StAX — no
  * external dependency (the container has no POI). Covers what the
  * catalog plane needs (SURVEY §2.1 S4 / §2.2 K3-K4): cell grids of
  * strings/numbers across named sheets, shared-strings on read,
  * inline-strings on write.
  *
  * XLSX is a zip of XML parts (ECMA-376 / ISO 29500 SpreadsheetML):
  *   xl/workbook.xml        sheet names -> r:id
  *   xl/_rels/workbook.xml.rels  r:id -> worksheet part
  *   xl/sharedStrings.xml   string table ("s"-type cell values)
  *   xl/worksheets/sheetN.xml   rows of <c r="A1" t="s|str|inlineStr"><v>
  */
object XlsxLite {

  final case class Cell(sheet: String, row: Int, col: Int, value: String)

  /** Hardened StAX factory shared by every part reader. Workbooks come
    * from catalog-declared REMOTE urls, so the parser must not honor
    * DTDs or external entities — XXE would let a malicious workbook
    * read local files into cell values (which flow into published
    * CSVs), SSRF, or blow up via entity expansion. */
  private val xmlFactory: XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
      java.lang.Boolean.FALSE)
    f
  }

  // ---------------------------------------------------------------- read

  /** Read every sheet into cells (1-based row/col). Driver-side: catalog
    * workbooks are small metadata documents. The result lands in a cell
    * grid DataFrame via `toGrid` for the relational plane. */
  def read(path: String): Seq[Cell] = {
    val zip = new ZipFile(path)
    try {
      val shared = readSharedStrings(zip)
      val sheets = sheetParts(zip)
      sheets.flatMap { case (name, part) =>
        Option(zip.getEntry(part)).toSeq.flatMap(e =>
          readSheet(zip.getInputStream(e), name, shared))
      }
    } finally zip.close()
  }

  /** Column letters of "BC12" -> 1-based index. */
  def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).toUpperCase
      .foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1))

  def rowIndex(ref: String): Int = ref.dropWhile(_.isLetter).toInt

  /** Shared-string table. Concatenates ALL `<t>` runs of each `<si>`
    * (rich-text entries split one logical string across runs) while
    * skipping phonetic `<rPh>` annotations, which are display hints,
    * not cell content. */
  private def readSharedStrings(zip: ZipFile): IndexedSeq[String] = {
    val entry = zip.getEntry("xl/sharedStrings.xml")
    if (entry == null) return IndexedSeq.empty
    val r = xmlFactory.createXMLStreamReader(zip.getInputStream(entry))
    val out = mutable.ArrayBuffer[String]()
    val sb = new StringBuilder
    var inT = false
    var phDepth = 0
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "si" => sb.clear()
          case "rPh" => phDepth += 1
          case "t" if phDepth == 0 => inT = true
          case _ =>
        }
        case XMLStreamConstants.CHARACTERS if inT && phDepth == 0 =>
          sb.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "si" => out += sb.toString
          case "rPh" => phDepth -= 1
          case "t" => inT = false
          case _ =>
        }
        case _ =>
      }
    }
    out.toIndexedSeq
  }

  /** sheet name -> worksheet zip part, via workbook.xml + its rels. */
  private def sheetParts(zip: ZipFile): Seq[(String, String)] = {
    val rels: Map[String, String] = {
      val entry = zip.getEntry("xl/_rels/workbook.xml.rels")
      if (entry == null) Map.empty
      else {
        val r = xmlFactory.createXMLStreamReader(zip.getInputStream(entry))
        val m = mutable.Map[String, String]()
        while (r.hasNext) {
          if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "Relationship") {
            val id = r.getAttributeValue(null, "Id")
            val target = r.getAttributeValue(null, "Target")
            if (id != null && target != null)
              m(id) = if (target.startsWith("/")) target.drop(1)
                      else "xl/" + target
          }
        }
        m.toMap
      }
    }
    val wb = zip.getEntry("xl/workbook.xml")
    if (wb == null) return Seq.empty
    val r = xmlFactory.createXMLStreamReader(zip.getInputStream(wb))
    val out = mutable.ArrayBuffer[(String, String)]()
    while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT &&
        r.getLocalName == "sheet") {
        val name = r.getAttributeValue(null, "name")
        val rid = (0 until r.getAttributeCount)
          .find(i => r.getAttributeLocalName(i) == "id")
          .map(r.getAttributeValue)
        rid.flatMap(rels.get).foreach(part => out += name -> part)
      }
    }
    out.toSeq
  }

  /** Worksheet cells. Emits on `</c>` so rich inline strings with
    * several `<r><t>` runs keep ALL runs (phonetic `<rPh>` text is
    * skipped); a malformed shared-string index degrades to an empty
    * value instead of throwing. */
  private def readSheet(in: InputStream, sheet: String,
      shared: IndexedSeq[String]): Seq[Cell] = {
    val r = xmlFactory.createXMLStreamReader(in)
    val out = mutable.ArrayBuffer[Cell]()
    var ref: String = null
    var cellType: String = null
    var inV = false
    var inT = false
    var phDepth = 0
    var sawContent = false
    val vb = new StringBuilder // <v> numeric / shared-index payload
    val tb = new StringBuilder // concatenated <t> runs (inline strings)
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "c" =>
            ref = r.getAttributeValue(null, "r")
            cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
            vb.clear(); tb.clear(); sawContent = false
          case "v" => inV = true; sawContent = true
          case "rPh" => phDepth += 1
          case "t" if phDepth == 0 => inT = true; sawContent = true
          case _ =>
        }
        case XMLStreamConstants.CHARACTERS =>
          if (inV) vb.append(r.getText)
          else if (inT && phDepth == 0) tb.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "v" => inV = false
          case "rPh" => phDepth -= 1
          case "t" => inT = false
          case "c" =>
            if (ref != null && sawContent) {
              val value = cellType match {
                case "s" =>
                  scala.util.Try(vb.toString.trim.toInt).toOption
                    .flatMap(shared.lift).getOrElse("")
                case "inlineStr" => tb.toString
                case _ => if (vb.nonEmpty) vb.toString else tb.toString
              }
              out += Cell(sheet, rowIndex(ref), colIndex(ref), value)
            }
            ref = null
          case _ =>
        }
        case _ =>
      }
    }
    out.toSeq
  }

  // --------------------------------------------------------------- write

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c => c.toString
    }

  private def colLetters(i: Int): String = {
    var n = i; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  /** Write sheets of string rows as an XLSX (inline strings). `sheets`
    * maps sheet name -> rows -> cells. Driver-side (metadata volumes). */
  def write(path: String, sheets: Seq[(String, Seq[Seq[String]])]): Path = {
    val target = Paths.get(path)
    Files.createDirectories(target.getParent)
    val zos = new ZipOutputStream(Files.newOutputStream(target))
    def part(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    val n = sheets.size
    part("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        (1 to n).map(i =>
          s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
          .mkString + "</Types>")
    part("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        "</Relationships>")
    part("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""" +
        sheets.zipWithIndex.map { case ((name, _), i) =>
          s"""<sheet name="${xmlEscape(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
        }.mkString + "</sheets></workbook>")
    part("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        (1 to n).map(i =>
          s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""")
          .mkString + "</Relationships>")
    sheets.zipWithIndex.foreach { case ((_, rows), si) =>
      val body = rows.zipWithIndex.map { case (cells, ri) =>
        val cs = cells.zipWithIndex.collect {
          case (v, ci) if v != null =>
            s"""<c r="${colLetters(ci + 1)}${ri + 1}" t="inlineStr"><is><t>${xmlEscape(v)}</t></is></c>"""
        }.mkString
        s"""<row r="${ri + 1}">$cs</row>"""
      }.mkString
      part(s"xl/worksheets/sheet${si + 1}.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
          body + "</sheetData></worksheet>")
    }
    zos.close()
    target
  }

  /** Round-trip helper: cells of one workbook -> dense string rows. */
  def toRows(cells: Seq[Cell]): Seq[Seq[String]] = {
    if (cells.isEmpty) return Seq.empty
    val maxRow = cells.map(_.row).max
    val maxCol = cells.map(_.col).max
    val m = cells.map(c => (c.row, c.col) -> c.value).toMap
    (1 to maxRow).map(r => (1 to maxCol).map(c => m.getOrElse((r, c), null)))
  }
}

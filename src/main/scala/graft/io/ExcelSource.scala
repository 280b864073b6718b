package graft.io

import java.io.{ByteArrayInputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.parsers.DocumentBuilderFactory

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType,
  StructField, StructType}
import org.w3c.dom.{Document, Element}

/** S3: HTTP Excel scan (custom_search_extraction.py:92-94 —
  * `pd.read_excel(url)` of the RNA nomenclature lookup).
  *
  * No Excel library ships with Spark, and an `.xlsx` is only a zip of
  * XML parts — so this is a self-contained reader of the OOXML
  * SpreadsheetML subset that `pd.read_excel` consumes: first worksheet
  * by default (or by name), first row as header, shared/inline strings,
  * numeric cells inferred to LONG then DOUBLE per column (pandas'
  * int64/float64 inference).
  *
  * Scale: the parse is driver-side by contract — the reference reads a
  * *nomenclature lookup*, a broadcast-side dim table (hundreds of rows).
  * Fact-table ingestion stays on the CSV/parquet paths; this source
  * exists so a user can point at the reference's real `.xlsx` URL and
  * start the pipeline without a manual conversion step.
  *
  * The XML parser runs with secure processing and DTDs disabled: the
  * bytes come from an untrusted fetch, same trust boundary as
  * [[ZipCsvSource]]'s zip-slip guard.
  */
class ExcelSource(fetcher: Fetcher) {

  def read(spark: SparkSession, url: String,
           sheet: Option[String] = None): DataFrame = {
    val parts = ExcelXlsx.zipEntries(fetcher.fetch(url))
    val shared = parts.get("xl/sharedStrings.xml")
      .map(ExcelXlsx.parseSharedStrings).getOrElse(IndexedSeq.empty)
    val sheetPath = ExcelXlsx.resolveSheetPath(parts, sheet)
    val grid = ExcelXlsx.parseSheet(
      parts.getOrElse(sheetPath,
        throw new IllegalArgumentException(s"no worksheet part $sheetPath")),
      shared)
    require(grid.nonEmpty, s"empty worksheet in $url")

    val width = grid.map(_.length).max
    val header = grid.head.padTo(width, null).zipWithIndex.map {
      case (h, i) => if (h == null || h.isEmpty) s"_c$i" else h
    }
    val body = grid.tail.map(_.padTo(width, null))

    // pandas-style per-column inference: all-Long -> LONG, else
    // all-numeric -> DOUBLE, else STRING
    def longOf(s: String) = try Some(java.lang.Long.valueOf(s.trim))
                            catch { case _: NumberFormatException => None }
    def dblOf(s: String) = try Some(java.lang.Double.valueOf(s.trim))
                           catch { case _: NumberFormatException => None }
    val fields = (0 until width).map { i =>
      val vals = body.flatMap(r => Option(r(i))).filter(_.nonEmpty)
      val tpe =
        if (vals.nonEmpty && vals.forall(longOf(_).isDefined)) LongType
        else if (vals.nonEmpty && vals.forall(dblOf(_).isDefined)) DoubleType
        else StringType
      StructField(header(i), tpe, nullable = true)
    }
    val rows = body.map { r =>
      Row.fromSeq((0 until width).map { i =>
        val v = r(i)
        if (v == null || v.isEmpty) null
        else fields(i).dataType match {
          case LongType   => longOf(v).orNull
          case DoubleType => dblOf(v).orNull
          case _          => v
        }
      })
    }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*),
      StructType(fields))
  }
}

/** OOXML plumbing shared by [[ExcelSource]] and the fixture writer. */
object ExcelXlsx {

  private[io] def zipEntries(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = mutable.Map[String, Array[Byte]]()
    var e = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory) out(e.getName) = zin.readAllBytes()
      e = zin.getNextEntry
    }
    out.toMap
  }

  /** Hardened parse: no DTDs/external entities (untrusted input). */
  private def parseXml(bytes: Array[Byte]): Document = {
    val f = DocumentBuilderFactory.newInstance()
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setExpandEntityReferences(false)
    f.setXIncludeAware(false)
    f.setNamespaceAware(false)
    f.newDocumentBuilder().parse(new ByteArrayInputStream(bytes))
  }

  private def elems(doc: Document, tag: String): Seq[Element] = {
    val nl = doc.getElementsByTagName(tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
  }
  private def childElems(e: Element, tag: String): Seq[Element] = {
    val nl = e.getElementsByTagName(tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
  }

  /** `<si>` entries; rich-text runs are concatenated over descendant
    * `<t>` nodes. */
  private[io] def parseSharedStrings(b: Array[Byte]): IndexedSeq[String] =
    elems(parseXml(b), "si")
      .map(si => childElems(si, "t").map(_.getTextContent).mkString)
      .toIndexedSeq

  /** Worksheet part for `sheet` (or the first sheet): workbook.xml gives
    * the sheet order and r:id; the workbook rels map r:id → target. A
    * missing rels part falls back to the conventional sheetN.xml. */
  private[io] def resolveSheetPath(parts: Map[String, Array[Byte]],
                                   sheet: Option[String]): String = {
    val wb = parseXml(parts.getOrElse("xl/workbook.xml",
      throw new IllegalArgumentException("not an xlsx: no xl/workbook.xml")))
    val sheets = elems(wb, "sheet")
    require(sheets.nonEmpty, "xlsx has no sheets")
    val chosen = sheet match {
      case Some(n) => sheets.find(_.getAttribute("name") == n).getOrElse(
        throw new IllegalArgumentException(s"no sheet named $n"))
      case None => sheets.head
    }
    val rid = chosen.getAttribute("r:id")
    val viaRels = parts.get("xl/_rels/workbook.xml.rels").flatMap { relB =>
      elems(parseXml(relB), "Relationship")
        .find(_.getAttribute("Id") == rid)
        .map(r => "xl/" + r.getAttribute("Target").stripPrefix("/xl/")
          .stripPrefix("xl/"))
    }
    viaRels.getOrElse(s"xl/worksheets/sheet${sheets.indexOf(chosen) + 1}.xml")
  }

  /** "BC" → 54 (1-based). */
  private[io] def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((a, c) => a * 26 + (c - 'A' + 1))

  /** Sheet grid as strings, nulls for absent cells; sparse refs honored. */
  private[io] def parseSheet(b: Array[Byte],
                             shared: IndexedSeq[String]): Seq[Array[String]] =
    elems(parseXml(b), "row").map { row =>
      val cells = childElems(row, "c")
      val out = mutable.ArrayBuffer[String]()
      var nextCol = 1
      cells.foreach { c =>
        val ref = c.getAttribute("r")
        val idx = if (ref.nonEmpty) colIndex(ref) else nextCol
        nextCol = idx + 1
        while (out.length < idx) out += null
        val v = childElems(c, "v").headOption.map(_.getTextContent)
        out(idx - 1) = c.getAttribute("t") match {
          case "s" => v.map(i => shared(i.trim.toInt)).orNull
          case "inlineStr" =>
            childElems(c, "is").headOption
              .map(is => childElems(is, "t").map(_.getTextContent).mkString)
              .orNull
          case "b" => v.map(x => if (x.trim == "1") "true" else "false").orNull
          case _ => v.orNull
        }
      }
      out.toArray
    }

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** Minimal single-sheet xlsx writer — fixture/test support so the
    * reader can be exercised hermetically (the real input is a remote
    * URL). Strings go through sharedStrings (the common layout pandas
    * and Excel emit); numbers are plain numeric cells. */
  def write(path: String, sheetName: String, header: Seq[String],
            rows: Seq[Seq[Any]]): Unit = {
    val strings = mutable.LinkedHashMap[String, Int]()
    def sidx(s: String): Int =
      strings.getOrElseUpdate(s, strings.size)

    def cellXml(ref: String, v: Any): String = v match {
      case null => ""
      case n: Long => s"""<c r="$ref"><v>$n</v></c>"""
      case n: Int => s"""<c r="$ref"><v>$n</v></c>"""
      case n: Double => s"""<c r="$ref"><v>$n</v></c>"""
      case s => s"""<c r="$ref" t="s"><v>${sidx(s.toString)}</v></c>"""
    }
    def colRef(i: Int): String = {
      var n = i + 1; val sb = new StringBuilder
      while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar)
        n = (n - 1) / 26 }
      sb.toString
    }
    val allRows = header +: rows
    val rowsXml = allRows.zipWithIndex.map { case (r, ri) =>
      val cells = r.zipWithIndex
        .map { case (v, ci) => cellXml(s"${colRef(ci)}${ri + 1}", v) }
        .mkString
      s"""<row r="${ri + 1}">$cells</row>"""
    }.mkString
    val sheetXml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$rowsXml</sheetData></worksheet>"""
        .stripMargin
    val sstXml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${strings.size}" uniqueCount="${strings.size}">${
        strings.keys.map(s => s"<si><t>${xmlEscape(s)}</t></si>").mkString
      }</sst>""".stripMargin
    val workbookXml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="${xmlEscape(sheetName)}" sheetId="1" r:id="rId1"/></sheets></workbook>"""
        .stripMargin
    val relsXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/><Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/></Relationships>"""
        .stripMargin
    val rootRelsXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>"""
        .stripMargin
    val contentTypesXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="xml" ContentType="application/xml"/><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/><Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/></Types>"""
        .stripMargin

    val zout = new ZipOutputStream(new FileOutputStream(path))
    try Seq(
      "[Content_Types].xml" -> contentTypesXml,
      "_rels/.rels" -> rootRelsXml,
      "xl/workbook.xml" -> workbookXml,
      "xl/_rels/workbook.xml.rels" -> relsXml,
      "xl/worksheets/sheet1.xml" -> sheetXml,
      "xl/sharedStrings.xml" -> sstXml
    ).foreach { case (name, xml) =>
      zout.putNextEntry(new ZipEntry(name))
      zout.write(xml.getBytes("UTF-8"))
      zout.closeEntry()
    } finally zout.close()
  }
}

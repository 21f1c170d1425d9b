package graft.sources

import java.io.{FileOutputStream, InputStream}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Dependency-free xlsx reader/writer — the reference's Excel loader
  * (openpolicedata/data_loaders/excel.py:24 `class Excel`) re-expressed
  * for Spark. An xlsx file is a zip of XML parts; only the JDK's
  * java.util.zip + javax.xml DOM are used (no POI — not on the
  * classpath, and an agency spreadsheet is a small single-file artifact
  * that is parsed on the driver and then handed to Spark as rows; the
  * distributed work happens in the transforms stacked on top).
  *
  * Reference semantics carried over:
  *   - sheet selection by name (excel.py:343, `__check_sheet` :401
  *     raises on a missing sheet);
  *   - year-named sheets ("2020", "Data 2021", …) are detected and
  *     concatenated in ascending year order with column alignment
  *     (excel.py:215 `__get_sheets`, :289 year-sheet combine);
  *   - multiple non-year sheets with no selection is an error
  *     (excel.py:61).
  *
  * All cells surface as strings (pandas' dtype inference is the
  * caller's `cast`); numeric cells keep their literal lexical form.
  */
object Xlsx {

  // ---- reading ---------------------------------------------------------

  private def parseXml(is: InputStream): org.w3c.dom.Document = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    // Namespace-aware + local-name matching below: a valid xlsx may
    // prefix its parts (<x:worksheet>, emitted by the .NET OpenXML
    // SDK among others); qualified-name matching would see ZERO
    // sheets/rows in such files while the StAX header() (local-name
    // based) parses them fine — a driver/executor schema split.
    f.setNamespaceAware(true)
    // Defensive: no external entity resolution on untrusted files.
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.newDocumentBuilder().parse(is)
  }

  private def elems(doc: org.w3c.dom.Document, tag: String): Seq[org.w3c.dom.Element] = {
    val nl = doc.getElementsByTagNameNS("*", tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[org.w3c.dom.Element])
  }

  private def childElems(e: org.w3c.dom.Element, tag: String): Seq[org.w3c.dom.Element] = {
    val nl = e.getElementsByTagNameNS("*", tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[org.w3c.dom.Element])
  }

  private def localName(n: org.w3c.dom.Node): String =
    Option(n.getLocalName).getOrElse {
      val q = n.getNodeName; val i = q.indexOf(':')
      if (i < 0) q else q.substring(i + 1)
    }

  /** Concatenated <t> runs of a shared-string/inline-string element,
    * EXCLUDING phonetic <rPh> runs: a naive recursive <t> scan would
    * append the pronunciation guide to the value (Japanese workbooks
    * store furigana this way) — silent text corruption that pandas/
    * openpyxl correctly avoid. ECMA-376 _xHHHH_ escapes are decoded. */
  private def textRuns(e: org.w3c.dom.Element): String =
    decodeX(childElems(e, "t").filter { t =>
      var p = t.getParentNode
      var ok = true
      while (ok && p != null && !(p eq e)) {
        if (localName(p) == "rPh") ok = false
        p = p.getParentNode
      }
      ok
    }.map(_.getTextContent).mkString)

  private val XEsc = java.util.regex.Pattern.compile("_x([0-9A-Fa-f]{4})_")

  /** Decode ECMA-376 _xHHHH_ character escapes (how real writers
    * smuggle XML-1.0-illegal control chars into cell text). */
  private[sources] def decodeX(s: String): String = {
    if (s == null || !s.contains("_x")) return s
    val m = XEsc.matcher(s)
    val sb = new StringBuffer
    while (m.find())
      m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(
        Integer.parseInt(m.group(1), 16).toChar.toString))
    m.appendTail(sb)
    sb.toString
  }

  /** Encode characters XML 1.0 forbids (< 0x20 except tab/LF/CR) as
    * _xHHHH_, guarding pre-existing literal _xHHHH_ sequences with
    * _x005F_ per the spec — emitting them raw would produce a file no
    * parser (including this one) can reopen. */
  private[sources] def encodeX(s: String): String = {
    val guarded = XEsc.matcher(s).replaceAll("_x005F_x$1_")
    if (!guarded.exists(c => c < 0x20 && c != '\t' && c != '\n' && c != '\r'))
      return guarded
    val sb = new StringBuilder
    guarded.foreach { c =>
      if (c < 0x20 && c != '\t' && c != '\n' && c != '\r')
        sb.append(f"_x${c.toInt}%04X_")
      else sb.append(c)
    }
    sb.toString
  }

  /** "B3" → 0-based column index 1. Bounded at Excel's real maximum
    * column XFD (16383): a corrupt/hostile ref like "ZZZZZZ1" would
    * otherwise size a multi-GB row array (or overflow Int and silently
    * drop the cell). */
  private[sources] def colIndex(cellRef: String): Int = {
    var i = 0
    var c = 0
    while (i < cellRef.length && cellRef.charAt(i).isLetter) {
      c = c * 26 + (cellRef.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    require(i <= 3 && c - 1 <= 16383,
      s"graft-xlsx: cell reference '$cellRef' exceeds Excel's max column XFD")
    c - 1
  }

  /** The reference's unsupported-format note (excel.py:280). */
  private val UnsupportedLegacyMsg =
    "Older Excel files (.xls) and OpenDocument file formats " +
      "(.odf, .ods, .odt) are not supported. Please submit an issue " +
      "if this is needed."

  /** Handle payloads that are not plain OOXML zips:
    *
    *  - CFB container (magic D0 CF 11 E0 A1 B1 1A E1) wrapping an
    *    ENCRYPTED OOXML workbook — identified by the EncryptionInfo /
    *    EncryptedPackage streams in the CFB directory. Like the
    *    reference (excel.py:132-150, via msoffcrypto), the workbook is
    *    DECRYPTED with Excel's implicit 'VelvetSweatshop' default
    *    password when it uses [MS-OFFCRYPTO] Standard Encryption; the
    *    decrypted zip lands in a cached temp file. Agile/RC4 schemes
    *    and real (non-default) passwords fail loud, naming the scheme
    *    or the failed default.
    *  - CFB container holding a legacy .xls (BIFF) workbook → the
    *    reference's unsupported-format message;
    *  - OpenDocument spreadsheet (a zip whose `mimetype` entry names
    *    opendocument) — same reference message (checked in withZip).
    *
    * Returns the path to OPEN as a zip: the original for plain xlsx,
    * the decrypted temp file for default-password-encrypted ones. */
  private[sources] def resolveReadable(path: String): String = {
    val f = new java.io.File(path)
    if (!f.isFile) return path
    def readPrefix(len: Long): Array[Byte] = {
      val in = new java.io.FileInputStream(f)
      try {
        val buf = new Array[Byte](math.min(f.length(), len).toInt)
        var off = 0
        var n = 0
        while (off < buf.length && { n = in.read(buf, off, buf.length - off); n > 0 })
          off += n
        buf
      } finally in.close()
    }
    // Cheap 8-byte sniff first: the common case (a real xlsx = a zip,
    // magic "PK") pays one tiny read.
    val magic = readPrefix(8L)
    if (magic.length < 8 || !Cfb.isCfb(magic)) return path
    // Cache check BEFORE the whole-file read+parse: a cache hit makes
    // reopening an encrypted workbook cost the 8-byte sniff only (not a
    // full CFB materialization per header/sheet/row call). The liveness
    // check guards long-lived sessions: a tmp cleaner that removes the
    // deleteOnExit file would otherwise surface as an opaque ZipFile
    // error on every later open until JVM restart — re-decrypt instead.
    val cacheKey = (f.getAbsolutePath, f.length(), f.lastModified())
    val cached = decryptedCache.get(cacheKey)
    if (cached != null) {
      if (new java.io.File(cached).isFile) return cached
      decryptedCache.remove(cacheKey, cached)
    }
    val whole = readPrefix(f.length())
    def utf16(s: String): Array[Byte] =
      s.flatMap(c => Seq(c.toByte, 0.toByte)).toArray
    def looksEncrypted: Boolean =
      whole.indexOfSlice(utf16("EncryptionInfo")) >= 0 ||
        whole.indexOfSlice(utf16("EncryptedPackage")) >= 0
    val streams =
      try Some(Cfb.streams(whole))
      catch { case _: Exception => None } // corrupt CFB → classify by scan below
    streams match {
      case Some(ss) if ss.contains("EncryptionInfo") && ss.contains("EncryptedPackage") =>
        decryptedCache.computeIfAbsent(cacheKey, _ => {
          val zipBytes =
            try OffCrypto.decrypt(whole)
            catch {
              case e: Exception => throw new IllegalArgumentException(
                "graft-xlsx: workbook is encrypted (CFB-wrapped OOXML) and " +
                  "the reference's implicit 'VelvetSweatshop' default-password " +
                  s"decryption (excel.py:140) failed: ${e.getMessage}")
            }
          val tmp = java.io.File.createTempFile("graft-xlsx-dec", ".xlsx")
          tmp.deleteOnExit()
          java.nio.file.Files.write(tmp.toPath, zipBytes)
          tmp.getAbsolutePath
        })
      case Some(_) =>
        throw new IllegalArgumentException("graft-xlsx: " + UnsupportedLegacyMsg)
      case None if looksEncrypted =>
        throw new IllegalArgumentException(
          "graft-xlsx: workbook is encrypted (CFB-wrapped OOXML) but the " +
            "container is unreadable; the reference decrypts such files with " +
            "msoffcrypto's 'VelvetSweatshop' default password (excel.py:140) — " +
            "decrypt it first.")
      case None =>
        throw new IllegalArgumentException("graft-xlsx: " + UnsupportedLegacyMsg)
    }
  }

  /** Decrypted-workbook temp paths, keyed by (path, length, mtime):
    * header/sheet/read calls each reopen the zip, and the 50000-round
    * key spin should run once per file, not once per call. */
  private val decryptedCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), String]()

  private def withZip[T](path: String)(f: ZipFile => T): T = {
    val zf = new ZipFile(resolveReadable(path))
    try {
      // OpenDocument spreadsheets are zips too; catch them before the
      // missing-xl/workbook.xml error surfaces as "not an xlsx".
      Option(zf.getEntry("mimetype")).foreach { e =>
        val is = zf.getInputStream(e)
        val mime = try scala.io.Source.fromInputStream(is, "UTF-8").mkString
          finally is.close()
        if (mime.contains("opendocument"))
          throw new IllegalArgumentException("graft-xlsx: " + UnsupportedLegacyMsg)
      }
      f(zf)
    } finally zf.close()
  }

  private def zipDoc(zf: ZipFile, name: String): Option[org.w3c.dom.Document] =
    Option(zf.getEntry(name)).map { e =>
      val is = zf.getInputStream(e)
      try parseXml(is) finally is.close()
    }

  /** Sheet name → worksheet part path, in workbook order
    * (xl/workbook.xml sheet r:id resolved through the rels part). */
  private def sheetParts(zf: ZipFile): Seq[(String, String)] = {
    val wb = zipDoc(zf, "xl/workbook.xml")
      .getOrElse(throw new IllegalArgumentException("not an xlsx: missing xl/workbook.xml"))
    val rels = zipDoc(zf, "xl/_rels/workbook.xml.rels")
      .map(d => elems(d, "Relationship")
        .map(r => r.getAttribute("Id") -> r.getAttribute("Target")).toMap)
      .getOrElse(Map.empty)
    elems(wb, "sheet").map { s =>
      val name = s.getAttribute("name")
      val rid = s.getAttribute("r:id")
      val target = rels.getOrElse(rid, s"worksheets/sheet${s.getAttribute("sheetId")}.xml")
      name -> ("xl/" + target.stripPrefix("/xl/").stripPrefix("xl/"))
    }
  }

  def sheetNames(path: String): Seq[String] = withZip(path)(sheetParts(_).map(_._1))

  private def sharedStrings(zf: ZipFile): IndexedSeq[String] =
    zipDoc(zf, "xl/sharedStrings.xml")
      .map(d => elems(d, "si").map(textRuns).toIndexedSeq)
      .getOrElse(IndexedSeq.empty)

  /** One sheet → rows of nullable string cells (ragged rows padded by
    * the caller). */
  private def sheetRows(zf: ZipFile, part: String,
                        shared: IndexedSeq[String]): Seq[Array[String]] = {
    val doc = zipDoc(zf, part)
      .getOrElse(throw new IllegalArgumentException(s"missing worksheet part $part"))
    elems(doc, "row").map { row =>
      val cells = childElems(row, "c")
      // Column index from the `r` cell reference; the attribute is
      // OPTIONAL per ECMA-376 (streaming writers omit it), in which
      // case position is sequential after the previous cell.
      val indices = cells.foldLeft(List.empty[Int]) { (acc, c) =>
        val ref = c.getAttribute("r")
        val idx = if (ref.nonEmpty && ref.head.isLetter) colIndex(ref)
                  else acc.headOption.map(_ + 1).getOrElse(0)
        idx :: acc
      }.reverse
      val width = indices.foldLeft(-1)(math.max) + 1
      val out = new Array[String](math.max(width, 0))
      cells.zip(indices).foreach { case (c, idx) =>
        val v = c.getAttribute("t") match {
          case "s" => // shared-string index; an empty <v/> is null (the
            // StAX header path already treated it that way — a bare
            // NumberFormatException here split driver/executor behavior)
            childElems(c, "v").headOption.map(_.getTextContent.trim)
              .filter(_.nonEmpty).map(i => shared(i.toInt)).orNull
          case "inlineStr" =>
            textRuns(c) match { case "" => null; case s => s }
          case _ => // numeric / str / bool: literal lexical value; an
            // empty <v></v> is null — the StAX header() treats it that
            // way, and a "" here would desynchronize the executor's
            // header-row detection from the driver's schema inference
            childElems(c, "v").headOption.map(_.getTextContent)
              .filter(_.nonEmpty).map(decodeX).orNull
        }
        if (idx >= 0) out(idx) = v
      }
      out
    }
  }

  private val YearRe = "(?:^|\\D)((?:18|19|20)\\d{2})(?:\\D|$)".r

  /** Year-sheet detection (excel.py:215): every sheet name embeds a
    * distinct 4-digit year → treat as per-year partitions. */
  private[sources] def yearSheets(names: Seq[String]): Option[Seq[(Int, String)]] = {
    val parsed = names.map(n => YearRe.findFirstMatchIn(n).map(_.group(1).toInt) -> n)
    if (names.size >= 2 && parsed.forall(_._1.isDefined) &&
        parsed.flatMap(_._1).distinct.size == names.size)
      Some(parsed.map(p => p._1.get -> p._2).sortBy(_._1))
    else None
  }

  /** The one header-naming rule, shared by every read path so the
    * driver-side schema (StAX header()) and executor-side rows agree:
    * unnamed columns become `_cN`, and DUPLICATE names are mangled
    * pandas-style ('Race', 'Race.1', …) — passing duplicates through
    * made unionByName (and any downstream select) throw. */
  private[sources] def nameHeader(raw: Array[String]): Array[String] = {
    val seen = scala.collection.mutable.HashMap.empty[String, Int]
    raw.zipWithIndex.map { case (h0, i) =>
      val base = if (h0 == null || h0.isEmpty) s"_c$i" else h0
      val n = seen.getOrElse(base, 0)
      seen(base) = n + 1
      if (n == 0) base else s"$base.$n"
    }
  }

  private def resolvePart(parts: Seq[(String, String)], sheet: String,
                          path: String): String =
    parts.toMap.getOrElse(sheet, throw new IllegalArgumentException(
      s"Sheet $sheet not found in Excel file at $path (have: ${parts.map(_._1).mkString(", ")})"))

  /** Split raw sheet rows into (header names, data rows) — the first
    * non-empty row is the header, named via [[nameHeader]]. */
  private[sources] def splitHeader(rows: Seq[Array[String]]): (Array[String], Seq[Array[String]]) = {
    val nonEmpty = rows.dropWhile(r => r.forall(_ == null))
    require(nonEmpty.nonEmpty, "xlsx sheet has no data rows")
    (nameHeader(nonEmpty.head), nonEmpty.tail)
  }

  /** The sheets a full read of this file covers, in read order: the
    * single sheet, or the ascending year-sheet sequence. Mirrors
    * [[read]]'s sheet resolution; the V2 connector turns each entry
    * into its own input partition. */
  def sheetsToRead(path: String, sheet: Option[String]): Seq[String] = withZip(path) { zf =>
    val names = sheetParts(zf).map(_._1)
    sheet match {
      case Some(s) =>
        if (!names.contains(s)) throw new IllegalArgumentException(
          s"Sheet $s not found in Excel file at $path (have: ${names.mkString(", ")})")
        Seq(s)
      case None if names.size == 1 => names
      case None => yearSheets(names) match {
        case Some(ys) => ys.map(_._2)
        case None => throw new IllegalArgumentException(
          s"Excel file at $path has ${names.size} sheets and no sheet was " +
          s"specified (have: ${names.mkString(", ")})")
      }
    }
  }

  /** Executor-side entry for the V2 connector: parse ONE named sheet of
    * one file into (header, data rows). */
  def headerAndRows(path: String, sheet: String): (Array[String], Seq[Array[String]]) =
    withZip(path) { zf =>
      val parts = sheetParts(zf)
      val part = resolvePart(parts, sheet, path)
      splitHeader(sheetRows(zf, part, sharedStrings(zf)))
    }

  /** Header-only parse of ONE named sheet: streams the worksheet XML
    * (StAX) and stops at the END of the first non-empty row, so schema
    * inference over a directory of workbooks is O(headers) on the
    * driver, not O(corpus) — only the shared-strings part (distinct
    * strings, typically tiny vs data) is still read whole because
    * header cells may be shared-string references. */
  def header(path: String, sheet: String): Array[String] = withZip(path) { zf =>
    val parts = sheetParts(zf)
    val part = resolvePart(parts, sheet, path)
    val shared = sharedStrings(zf)
    val entry = Option(zf.getEntry(part))
      .getOrElse(throw new IllegalArgumentException(s"missing worksheet part $part"))
    val is = zf.getInputStream(entry)
    val fac = javax.xml.stream.XMLInputFactory.newInstance()
    fac.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    fac.setProperty("javax.xml.stream.isSupportingExternalEntities", false)
    val r = fac.createXMLStreamReader(is)
    try {
      val cells = ArrayBuffer.empty[(Int, String)]
      var lastIdx = -1
      var curIdx = -1
      var curType = ""
      val vText = new StringBuilder // <v> content (numeric / shared idx)
      val tText = new StringBuilder // <is><t> content (may span several t)
      var collecting: StringBuilder = null
      var inRPh = 0 // depth inside phonetic <rPh> runs (excluded)
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "row" => cells.clear(); lastIdx = -1
              case "c" =>
                val ref = Option(r.getAttributeValue(null, "r")).getOrElse("")
                curIdx = if (ref.nonEmpty && ref.head.isLetter) colIndex(ref)
                         else lastIdx + 1
                lastIdx = curIdx
                curType = Option(r.getAttributeValue(null, "t")).getOrElse("")
                vText.clear(); tText.clear()
              case "v" => collecting = vText
              // <t> inside <rPh> is a phonetic run, not cell text
              case "t" => if (inRPh == 0) collecting = tText
              case "rPh" => inRPh += 1
              case _ => ()
            }
          case javax.xml.stream.XMLStreamConstants.CHARACTERS |
               javax.xml.stream.XMLStreamConstants.CDATA =>
            if (collecting != null) collecting.append(r.getText)
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "v" | "t" => collecting = null
              case "rPh" => inRPh -= 1
              case "c" =>
                // same value semantics as sheetRows
                val v = curType match {
                  case "s" =>
                    if (vText.toString.trim.isEmpty) null
                    else shared(vText.toString.trim.toInt)
                  case "inlineStr" =>
                    if (tText.isEmpty) null else decodeX(tText.toString)
                  case _ => if (vText.isEmpty) null else decodeX(vText.toString)
                }
                if (curIdx >= 0) cells += curIdx -> v
              case "row" =>
                val width = cells.foldLeft(-1)((m, c) => math.max(m, c._1)) + 1
                val out = new Array[String](math.max(width, 0))
                cells.foreach { case (i, v) => out(i) = v }
                if (out.exists(_ != null))
                  return nameHeader(out)
              case _ => ()
            }
          case _ => ()
        }
      }
      throw new IllegalArgumentException("xlsx sheet has no data rows")
    } finally { r.close(); is.close() }
  }

  private def toDf(spark: SparkSession, rows: Seq[Array[String]]): DataFrame = {
    val (header0, rest) = splitHeader(rows)
    // Data rows wider than the header keep their stray cells under
    // `_cN` names (pandas surfaces these as 'Unnamed: N') instead of
    // being silently truncated. The V2 connector projects by the
    // header()-inferred schema, so spill columns surface only through
    // this driver-side read path.
    val width = rest.foldLeft(header0.length)((m, r) => math.max(m, r.length))
    val header = header0 ++ (header0.length until width).map(i => s"_c$i")
    val data = rest.map { r =>
      Row.fromSeq((0 until width).map(i => if (i < r.length) r(i) else null))
    }
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    spark.createDataFrame(spark.sparkContext.parallelize(data.toSeq), schema)
  }

  /** Load one sheet by name (None → single sheet or year-sheet
    * combine). First non-empty row is the header. */
  def read(spark: SparkSession, path: String,
           sheet: Option[String] = None): DataFrame = withZip(path) { zf =>
    val parts = sheetParts(zf)
    val shared = sharedStrings(zf)
    def one(part: String): DataFrame = toDf(spark, sheetRows(zf, part, shared))
    sheet match {
      case Some(s) =>
        one(resolvePart(parts, s, path))
      case None if parts.size == 1 => one(parts.head._2)
      case None =>
        yearSheets(parts.map(_._1)) match {
          case Some(ys) =>
            // Ascending year order, columns aligned by name — the
            // reference's year-sheet concatenation (excel.py:289).
            val byName = parts.toMap
            ys.map { case (_, name) => one(byName(name)) }
              .reduce(_.unionByName(_, allowMissingColumns = true))
          case None =>
            throw new IllegalArgumentException(
              s"Excel file at $path has ${parts.size} sheets and no sheet was " +
              s"specified (have: ${parts.map(_._1).mkString(", ")})")
        }
    }
  }

  // ---- writing (fixture/export support) --------------------------------

  // quote/apos escaped too: esc is interpolated into attribute values
  // (sheet name="...") as well as element text
  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;").replace("'", "&apos;")

  private def ref(r: Int, c: Int): String = {
    var n = c + 1
    val sb = new StringBuilder
    while (n > 0) { sb.insert(0, ('A' + (n - 1) % 26).toChar); n = (n - 1) / 26 }
    sb.toString + (r + 1)
  }

  private def rowXml(cells: Seq[String], r: Int): String = {
    val cs = cells.zipWithIndex.collect { case (v, c) if v != null =>
      s"""<c r="${ref(r, c)}" t="inlineStr"><is><t>${esc(encodeX(v))}</t></is></c>"""
    }.mkString
    s"""<row r="${r + 1}">$cs</row>"""
  }

  /** Write a minimal multi-sheet xlsx (inline strings only). Used for
    * loader fixtures and excel export parity. */
  def write(path: String, sheets: Seq[(String, Seq[Seq[String]])]): Unit =
    writePackage(path, sheets.map { case (n, rows) => n -> (() => rows.iterator) })

  /** Streaming package core: the OOXML metadata parts are tiny and
    * written whole; each sheet's rows are pulled from its iterator and
    * written straight into the zip entry, so nothing holds a full sheet
    * in memory. */
  private def writePackage(path: String,
                           sheets: Seq[(String, () => Iterator[Seq[String]])]): Unit = {
    val zos = new ZipOutputStream(new FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    try {
      val overrides = sheets.indices.map(i =>
        s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""").mkString
      put("[Content_Types].xml",
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
           |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
           |<Default Extension="xml" ContentType="application/xml"/>
           |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
           |$overrides</Types>""".stripMargin)
      put("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin)
      val sheetTags = sheets.zipWithIndex.map { case ((name, _), i) =>
        s"""<sheet name="${esc(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>""" }.mkString
      put("xl/workbook.xml",
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
           |<sheets>$sheetTags</sheets></workbook>""".stripMargin)
      val relTags = sheets.indices.map(i =>
        s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>""").mkString
      put("xl/_rels/workbook.xml.rels",
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">$relTags</Relationships>""".stripMargin)
      sheets.zipWithIndex.foreach { case ((_, rowsFn), i) =>
        zos.putNextEntry(new ZipEntry(s"xl/worksheets/sheet${i + 1}.xml"))
        val w = new java.io.OutputStreamWriter(zos, "UTF-8")
        w.write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
        w.write("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
        var r = 0
        rowsFn().foreach { cells => w.write(rowXml(cells, r)); r += 1 }
        w.write("</sheetData></worksheet>")
        w.flush() // flush, don't close: closing the writer would close the zip
        zos.closeEntry()
      }
    } finally zos.close()
  }

  /** DataFrame → single-sheet xlsx (header + string-rendered cells).
    * Streams through `toLocalIterator` — one Spark partition in driver
    * memory at a time, rows written straight into the zip entry (the r4
    * verdict's export fix; the old path collect()ed the whole table).
    * NOTE: empty strings round-trip to null on read-back — Excel's
    * cell model does not distinguish "" from an empty cell (pandas
    * reads both as NaN), so the writer inherits that semantics. */
  def writeDf(df: DataFrame, path: String, sheetName: String = "Sheet1"): Unit = {
    import scala.jdk.CollectionConverters._
    val header = df.columns.toSeq
    writePackage(path, Seq(sheetName -> (() =>
      Iterator.single(header) ++ df.toLocalIterator().asScala.map(r =>
        (0 until r.length).map(i => Option(r.get(i)).map(_.toString).orNull)))))
  }
}

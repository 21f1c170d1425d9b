package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.sources.Xlsx

/** DataSource V2 xlsx connector: distributed parse (one partition per
  * file×sheet), column pruning into the scan, union-by-name across
  * heterogeneous files, sheet selection. */
class XlsxV2Spec extends SparkSpec {

  private def tmpDir(): java.io.File = {
    val d = Files.createTempDirectory("graft_xlsxv2_").toFile
    d.deleteOnExit(); d
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail("no BatchScanExec in plan"))

  test("directory of files reads in parallel, one partition per file") {
    val dir = tmpDir()
    (1 to 3).foreach { i =>
      Xlsx.write(s"$dir/f$i.xlsx", Seq(("Sheet1",
        Seq(Seq("id", "name"), Seq(s"$i-1", s"n$i-1"), Seq(s"$i-2", s"n$i-2")))))
    }
    val df = spark.read.format("graft-xlsx").load(dir.getPath)
    assert(df.columns.toSeq == Seq("id", "name"))
    assert(df.count() == 6)
    assert(df.rdd.getNumPartitions == 3, "expected one input partition per file")
    assert(df.filter(col("id") === "2-1").select("name").head().getString(0) == "n2-1")
  }

  test("header-only parse matches the full parse and skips blank lead rows") {
    // schema inference uses Xlsx.header (StAX, stops after the first
    // non-empty row) — it must agree with headerAndRows' header exactly,
    // including the blank-leading-row skip and _cN backfill
    val dir = tmpDir()
    Xlsx.write(s"$dir/h.xlsx", Seq(("Sheet1",
      Seq(Seq(null, null), Seq("id", null, "name"), Seq("1", "x", "n1")))))
    val full = Xlsx.headerAndRows(s"$dir/h.xlsx", "Sheet1")._1
    assert(Xlsx.header(s"$dir/h.xlsx", "Sheet1").toSeq == full.toSeq)
    assert(full.toSeq == Seq("id", "_c1", "name"))
    assert(spark.read.format("graft-xlsx").load(s"$dir/h.xlsx").columns.toSeq
      == Seq("id", "_c1", "name"))
  }

  test("column pruning reaches the scan") {
    val dir = tmpDir()
    Xlsx.write(s"$dir/a.xlsx", Seq(("Sheet1",
      Seq(Seq("a", "b", "c"), Seq("1", "2", "3"), Seq("4", "5", "6")))))
    val df = spark.read.format("graft-xlsx").load(dir.getPath).select("b")
    val scan = scanOf(df)
    assert(scan.output.map(_.name) == Seq("b"), scan.output.toString)
    assert(df.as[String](org.apache.spark.sql.Encoders.STRING).collect().sorted.toSeq == Seq("2", "5"))
  }

  test("year-sheets expand to one partition each and union in year order") {
    val path = s"${tmpDir()}/years.xlsx"
    Xlsx.write(path, Seq(
      ("Data 2020", Seq(Seq("id", "v"), Seq("a", "1"))),
      ("Data 2019", Seq(Seq("id", "v"), Seq("b", "2")))))
    val df = spark.read.format("graft-xlsx").load(path)
    assert(df.rdd.getNumPartitions == 2, "expected one partition per year sheet")
    assert(df.count() == 2)
    assert(df.select("id").collect().map(_.getString(0)).toSet == Set("a", "b"))
  }

  test("sheet option pins one sheet; unknown sheet fails loud") {
    val path = s"${tmpDir()}/multi.xlsx"
    Xlsx.write(path, Seq(
      ("Alpha", Seq(Seq("x"), Seq("1"))),
      ("Beta", Seq(Seq("x"), Seq("2")))))
    val one = spark.read.format("graft-xlsx").option("sheet", "Beta").load(path)
    assert(one.collect().map(_.getString(0)).toSeq == Seq("2"))
    val bad = intercept[Exception] {
      spark.read.format("graft-xlsx").option("sheet", "Nope").load(path).collect()
    }
    assert(bad.getMessage.contains("Nope") || bad.getCause != null)
  }

  test("filter pushdown reaches the scan and drops rows inside the reader") {
    val dir = tmpDir()
    Xlsx.write(s"$dir/a.xlsx", Seq(("Sheet1",
      Seq(Seq("agency", "year"), Seq("Austin PD", "2020"), Seq("Dallas PD", "2021"),
        Seq("Austin PD", "2021")))))
    val df = spark.read.format("graft-xlsx").load(dir.getPath)
      .filter(col("agency") === "Austin PD")
    val scan = scanOf(df)
    assert(scan.scan.description().contains("EqualTo(agency,Austin PD)"),
      scan.scan.description())
    assert(df.count() == 2)
    // compound And + prefix filters push too
    val both = spark.read.format("graft-xlsx").load(dir.getPath)
      .filter(col("agency").startsWith("Austin") && col("year") === "2021")
    assert(scanOf(both).scan.description().contains("StringStartsWith"),
      scanOf(both).scan.description())
    assert(both.count() == 1)
  }

  test("pushed filters keep SQL null semantics; Not stays post-scan") {
    val dir = tmpDir()
    // row 2 has no value in col b (short row -> null cell)
    Xlsx.write(s"$dir/a.xlsx", Seq(("Sheet1",
      Seq(Seq("a", "b"), Seq("1", "x"), Seq("2"), Seq("3", "y")))))
    def base = spark.read.format("graft-xlsx").load(dir.getPath)
    // null cell never passes an equality pushed into the reader
    assert(base.filter(col("b") === "x").count() == 1)
    assert(base.filter(col("b").isNull).count() == 1)
    assert(base.filter(col("b").isNotNull).count() == 2)
    // Not(...) must NOT be pushed (null would wrongly pass); Spark's
    // post-scan filter still drops the null row
    val neg = base.filter(!(col("b") === "x"))
    assert(!scanOf(neg).scan.description().contains("Not("),
      scanOf(neg).scan.description())
    assert(neg.count() == 1)
    // Or over false-on-null leaves agrees with three-valued logic
    assert(base.filter(col("b") === "x" || col("a") === "2").count() == 2)
  }

  test("encrypted OOXML (CFB + EncryptionInfo) fails loud, not with a zip error") {
    val dir = tmpDir()
    val p = s"$dir/enc.xlsx"
    val out = new java.io.FileOutputStream(p)
    try {
      out.write(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
        .map(_.toByte))
      out.write(new Array[Byte](512 - 8)) // CFB header sector padding
      out.write("EncryptionInfo".flatMap(c => Seq(c.toByte, 0.toByte)).toArray)
      out.write("EncryptedPackage".flatMap(c => Seq(c.toByte, 0.toByte)).toArray)
    } finally out.close()
    val ex = intercept[IllegalArgumentException](Xlsx.header(p, "Sheet1"))
    assert(ex.getMessage.contains("encrypted"))
    assert(ex.getMessage.contains("VelvetSweatshop")) // names the reference's decrypt path
  }

  test("legacy .xls (CFB without encryption streams) gets the reference's unsupported message") {
    val dir = tmpDir()
    val p = s"$dir/old.xls"
    val out = new java.io.FileOutputStream(p)
    try {
      out.write(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
        .map(_.toByte))
      out.write(new Array[Byte](512 - 8))
      out.write("Workbook".flatMap(c => Seq(c.toByte, 0.toByte)).toArray)
    } finally out.close()
    val ex = intercept[IllegalArgumentException](Xlsx.header(p, "Sheet1"))
    assert(ex.getMessage.contains(
      "Older Excel files (.xls) and OpenDocument file formats"))
  }

  test("OpenDocument spreadsheet (zip + opendocument mimetype) is rejected with the same message") {
    val dir = tmpDir()
    val p = s"$dir/sheet.ods"
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(p))
    try {
      zos.putNextEntry(new java.util.zip.ZipEntry("mimetype"))
      zos.write("application/vnd.oasis.opendocument.spreadsheet".getBytes("UTF-8"))
      zos.closeEntry()
      zos.putNextEntry(new java.util.zip.ZipEntry("content.xml"))
      zos.write("<office/>".getBytes("UTF-8"))
      zos.closeEntry()
    } finally zos.close()
    val ex = intercept[IllegalArgumentException](Xlsx.header(p, "Sheet1"))
    assert(ex.getMessage.contains("OpenDocument file formats"))
    // a real xlsx (also a zip) still opens fine after the sniffing
    Xlsx.write(s"$dir/ok.xlsx", Seq(("Sheet1", Seq(Seq("a"), Seq("1")))))
    assert(Xlsx.header(s"$dir/ok.xlsx", "Sheet1").toSeq == Seq("a"))
  }

  test("heterogeneous files align by name, missing columns null") {
    val dir = tmpDir()
    Xlsx.write(s"$dir/a.xlsx", Seq(("Sheet1", Seq(Seq("id", "race"), Seq("1", "W")))))
    Xlsx.write(s"$dir/b.xlsx", Seq(("Sheet1", Seq(Seq("id", "gender"), Seq("2", "M")))))
    val df = spark.read.format("graft-xlsx").load(dir.getPath).orderBy("id")
    assert(df.columns.toSeq == Seq("id", "race", "gender"))
    val rows = df.collect()
    assert(rows(0).getString(1) == "W" && rows(0).isNullAt(2))
    assert(rows(1).isNullAt(1) && rows(1).getString(2) == "M")
  }

  /** Write a raw single-sheet workbook from hand-built worksheet XML —
    * for parser cases the streaming writer can't produce. */
  private def rawWorkbook(path: String, worksheetXml: String,
                          sharedXml: Option[String] = None,
                          prefix: String = ""): Unit = {
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    val ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    val rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    val (po, xa) = if (prefix.isEmpty) ("", s"""xmlns="$ns"""")
                   else (s"$prefix:", s"""xmlns:$prefix="$ns"""")
    put("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/></Types>""")
    put("_rels/.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""")
    put("xl/workbook.xml",
      s"""<?xml version="1.0"?><${po}workbook $xa xmlns:r="$rns"><${po}sheets><${po}sheet name="S" sheetId="1" r:id="rId1"/></${po}sheets></${po}workbook>""")
    put("xl/_rels/workbook.xml.rels",
      s"""<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="$rns/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""")
    sharedXml.foreach(put("xl/sharedStrings.xml", _))
    put("xl/worksheets/sheet1.xml", worksheetXml)
    zos.close()
  }

  test("namespace-prefixed OOXML parses like the unprefixed form") {
    // the .NET OpenXML SDK emits <x:worksheet>/<x:row>; qualified-name
    // DOM matching used to see zero sheets/rows in such files
    val dir = tmpDir()
    val ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    rawWorkbook(s"$dir/p.xlsx",
      s"""<?xml version="1.0"?><x:worksheet xmlns:x="$ns"><x:sheetData>""" +
      """<x:row r="1"><x:c r="A1" t="inlineStr"><x:is><x:t>id</x:t></x:is></x:c></x:row>""" +
      """<x:row r="2"><x:c r="A2" t="inlineStr"><x:is><x:t>v1</x:t></x:is></x:c></x:row>""" +
      """</x:sheetData></x:worksheet>""", prefix = "x")
    val df = Xlsx.read(spark, s"$dir/p.xlsx")
    assert(df.columns.toSeq == Seq("id"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("v1"))
    assert(Xlsx.header(s"$dir/p.xlsx", "S").toSeq == Seq("id"))
  }

  test("phonetic rPh runs are excluded; empty shared <v/> is null; dup headers mangle") {
    val dir = tmpDir()
    val ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    val shared = s"""<?xml version="1.0"?><sst xmlns="$ns" count="1" uniqueCount="1">""" +
      """<si><t>Tokyo</t><rPh sb="0" eb="2"><t>TOKYO-KANA</t></rPh></si></sst>"""
    rawWorkbook(s"$dir/j.xlsx",
      s"""<?xml version="1.0"?><worksheet xmlns="$ns"><sheetData>""" +
      """<row r="1"><c r="A1" t="inlineStr"><is><t>Race</t></is></c>""" +
      """<c r="B1" t="inlineStr"><is><t>Race</t></is></c></row>""" +
      """<row r="2"><c r="A2" t="s"><v>0</v></c><c r="B2" t="s"><v/></c></row>""" +
      """</sheetData></worksheet>""", sharedXml = Some(shared))
    val df = Xlsx.read(spark, s"$dir/j.xlsx")
    // pandas-style duplicate mangling, identical in header() and read()
    assert(df.columns.toSeq == Seq("Race", "Race.1"))
    assert(Xlsx.header(s"$dir/j.xlsx", "S").toSeq == Seq("Race", "Race.1"))
    val row = df.head()
    assert(row.getString(0) == "Tokyo", s"phonetic run leaked: ${row.getString(0)}")
    assert(row.isNullAt(1)) // empty <v/> is null, not NumberFormatException
  }

  test("control characters round-trip via _xHHHH_ and wide rows keep spill cells") {
    val dir = tmpDir()
    Xlsx.write(s"$dir/c.xlsx", Seq(("Sheet1", Seq(
      Seq("id", "note"),
      Seq("1", "ab"),          // illegal in XML 1.0 — must be escaped
      Seq("2", "keep _x0041_ text")  // literal _xHHHH_ must survive
    ))))
    val back = Xlsx.read(spark, s"$dir/c.xlsx").orderBy("id").collect()
    assert(back(0).getString(1) == "ab")
    assert(back(1).getString(1) == "keep _x0041_ text")
    // a data row wider than the header keeps its stray cell as _cN
    val ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    rawWorkbook(s"$dir/w.xlsx",
      s"""<?xml version="1.0"?><worksheet xmlns="$ns"><sheetData>""" +
      """<row r="1"><c r="A1" t="inlineStr"><is><t>id</t></is></c></row>""" +
      """<row r="2"><c r="A2" t="inlineStr"><is><t>x</t></is></c>""" +
      """<c r="B2" t="inlineStr"><is><t>stray</t></is></c></row>""" +
      """</sheetData></worksheet>""")
    val wide = Xlsx.read(spark, s"$dir/w.xlsx")
    assert(wide.columns.toSeq == Seq("id", "_c1"))
    assert(wide.head().getString(1) == "stray")
    // hostile column ref fails loud instead of a multi-GB allocation
    rawWorkbook(s"$dir/h.xlsx",
      s"""<?xml version="1.0"?><worksheet xmlns="$ns"><sheetData>""" +
      """<row r="1"><c r="ZZZZZZ1" t="inlineStr"><is><t>boom</t></is></c></row>""" +
      """</sheetData></worksheet>""")
    val e = intercept[IllegalArgumentException](Xlsx.read(spark, s"$dir/h.xlsx"))
    assert(e.getMessage.contains("max column"))
  }
}

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
}

package graft

import org.apache.spark.sql.functions._
import graft.sources.{Html, Loaders, Xlsx}

/** Excel + HTML loader coverage — mirrors the reference's
  * tests/1_unit_data_loaders Excel/Html cases (sheet selection,
  * year-sheet combine, missing-sheet error, first-table parse). */
class LoadersSpec extends SparkSpec {

  private def tmpFile(suffix: String): String =
    java.nio.file.Files.createTempFile("graft_loader", suffix).toString

  test("xlsx: single sheet round-trips header + cells through the registry") {
    val path = tmpFile(".xlsx")
    Xlsx.write(path, Seq("Sheet1" -> Seq(
      Seq("id", "agency", "value"),
      Seq("1", "Austin PD", "10.5"),
      Seq("2", "Dallas & Co <PD>", null),
      Seq("3", "Houston PD", "7"))))
    val df = Loaders("excel").load(spark, path)
    assert(df.columns.toSeq == Seq("id", "agency", "value"))
    assert(df.count() == 3)
    val rows = df.orderBy("id").collect()
    assert(rows(1).getString(1) == "Dallas & Co <PD>") // entity escaping round-trip
    assert(rows(1).isNullAt(2)) // missing cell → null
    assert(df.select(sum(col("value").cast("double"))).head().getDouble(0) == 17.5)
  }

  test("xlsx: sheet selection by name; missing sheet raises") {
    val path = tmpFile(".xlsx")
    Xlsx.write(path, Seq(
      "Incidents" -> Seq(Seq("id"), Seq("1")),
      "Notes" -> Seq(Seq("note"), Seq("x"))))
    assert(Xlsx.sheetNames(path) == Seq("Incidents", "Notes"))
    assert(Xlsx.read(spark, path, Some("Notes")).columns.toSeq == Seq("note"))
    intercept[IllegalArgumentException](Xlsx.read(spark, path, Some("Missing")))
    // two non-year sheets, no selection → error (excel.py:61)
    intercept[IllegalArgumentException](Xlsx.read(spark, path, None))
  }

  test("xlsx: year-named sheets combine in ascending order with column alignment") {
    val path = tmpFile(".xlsx")
    Xlsx.write(path, Seq(
      "Data 2021" -> Seq(Seq("id", "extra"), Seq("3", "e3"), Seq("4", "e4")),
      "2020" -> Seq(Seq("id"), Seq("1"), Seq("2"))))
    val df = Xlsx.read(spark, path, None)
    assert(df.columns.toSeq == Seq("id", "extra")) // aligned by name
    assert(df.select("id").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().toSeq.sorted == Seq("1", "2", "3", "4"))
    // 2020 rows carry null for the missing "extra" column
    assert(df.filter(col("id") === "1").head().isNullAt(1))
  }

  test("xlsx: cells without r attributes fall back to sequential position") {
    // ECMA-376 makes the `r` cell reference optional; streaming writers
    // omit it. Assemble such a file by hand.
    val path = tmpFile(".xlsx")
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |</Types>""".stripMargin)
    put("_rels/.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""".stripMargin)
    put("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin)
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""".stripMargin)
    // NO r attributes on rows/cells
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row><c t="inlineStr"><is><t>id</t></is></c><c t="inlineStr"><is><t>name</t></is></c></row>
        |<row><c t="inlineStr"><is><t>1</t></is></c><c t="inlineStr"><is><t>alpha</t></is></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
    val df = Xlsx.read(spark, path, None)
    assert(df.columns.toSeq == Seq("id", "name"))
    val row = df.head()
    assert(row.getString(0) == "1" && row.getString(1) == "alpha")
  }

  test("xlsx: sheet names with quotes/apostrophes survive attribute escaping") {
    val path = tmpFile(".xlsx")
    Xlsx.write(path, Seq("""Chief's "Q1" <Data> & Notes""" -> Seq(Seq("id"), Seq("1"))))
    assert(Xlsx.sheetNames(path) == Seq("""Chief's "Q1" <Data> & Notes"""))
    assert(Xlsx.read(spark, path, Some("""Chief's "Q1" <Data> & Notes""")).count() == 1)
  }

  test("xlsx: DataFrame export round-trip (writeDf → excel loader)") {
    val path = tmpFile(".xlsx")
    Xlsx.writeDf(graft.sources.Tables(spark, sfDir, "region"), path)
    val back = Loaders("excel").load(spark, path)
    assert(back.count() == 5)
    assert(back.columns.contains("r_name"))
  }

  test("html: first table parses with header, entities, nested tags") {
    val path = tmpFile(".html")
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      """<html><body><p>preamble</p>
        |<table class="spacer"></table>
        |<table class="data">
        |  <tr><th>id</th><th> agency </th></tr>
        |  <tr><td>1</td><td><b>Austin</b> PD</td></tr>
        |  <tr><td>2</td><td>Dallas &amp; Co</td></tr>
        |</table>
        |<table><tr><th>other</th></tr><tr><td>x</td></tr></table>
        |</body></html>""".stripMargin.getBytes("UTF-8"))
    val df = Loaders("html").load(spark, path)
    assert(df.columns.toSeq == Seq("id", "agency"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getString(1) == "Austin PD") // nested tag stripped
    assert(rows(1).getString(1) == "Dallas & Co") // entity unescaped
    // second table addressable by index
    assert(Html.read(spark, path, tableIndex = 1).columns.toSeq == Seq("other"))
  }

  test("registry exposes all six formats") {
    assert(Loaders.registry.keySet ==
      Set("parquet", "csv", "csv_zip", "json", "excel", "html"))
  }

  test("csv_zip: single-entry archive loads; multi-entry and empty raise") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csvzip").toString
    def writeZip(name: String, entries: (String, String)*): String = {
      val p = s"$dir/$name"
      val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(p))
      entries.foreach { case (n, content) =>
        zos.putNextEntry(new java.util.zip.ZipEntry(n))
        zos.write(content.getBytes("UTF-8")); zos.closeEntry()
      }
      zos.close(); p
    }
    val ok = writeZip("one.zip", "data.csv" -> "id,agency\n1,Austin PD\n2,Dallas PD\n")
    val df = Loaders("csv_zip").load(spark, ok)
    assert(df.columns.toSeq == Seq("id", "agency") && df.count() == 2)
    // an UPDATED archive is reflected on reload (no stale cache), and
    // the dataset directory is never mutated by a load
    java.nio.file.Files.delete(java.nio.file.Paths.get(ok))
    writeZip("one.zip", "data.csv" -> "id,agency\n1,Austin PD\n")
    assert(Loaders("csv_zip").load(spark, ok).count() == 1)
    assert(new java.io.File(dir).listFiles().map(_.getName).forall(_.endsWith(".zip")))
    val multi = writeZip("two.zip", "a.csv" -> "x\n1\n", "b.csv" -> "y\n2\n")
    intercept[IllegalArgumentException](Loaders("csv_zip").load(spark, multi))
    val none = writeZip("none.zip", "readme.txt" -> "no csv here")
    intercept[IllegalArgumentException](Loaders("csv_zip").load(spark, none))
  }

  test("feather: canonical filename and typed round trip (to_feather/load_feather)") {
    import graft.sources.Feather
    assert(Feather.featherFilename("Texas", "Austin", "Austin", "STOPS", Left("2020"))
      == "Texas_Austin_STOPS_2020.feather")
    val tmp = java.nio.file.Files.createTempDirectory("graft_feather").toString
    val df = spark.sql(
      """SELECT CAST(1 AS BIGINT) AS id, 'alpha' AS name, CAST(1.5 AS DOUBLE) AS score,
        |  DATE'2020-06-01' AS d, TIMESTAMP'2020-06-01 14:30:00' AS ts, true AS flag
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), CAST(NULL AS STRING), CAST(NULL AS DOUBLE),
        |  CAST(NULL AS DATE), CAST(NULL AS TIMESTAMP), CAST(NULL AS BOOLEAN)""".stripMargin)
    Feather.toFeather(df, tmp, "Texas", "Austin", "Austin", "STOPS", Left("2020"))
    val back = Feather.loadFeather(spark, tmp, "Texas", "Austin", "Austin", "STOPS", Left("2020"))
    // everything round-trips nullable; compare names + types
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq
      == df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val (a, b) = (df.orderBy("id").collect().toSeq, back.orderBy("id").collect().toSeq)
    assert(a == b, s"round trip mismatch:\n$a\n$b")
    // region table (strings + longs) through the same path
    val p2 = Feather.write(graft.sources.Tables(spark, sfDir, "region"), s"$tmp/region.feather")
    assert(Feather.read(spark, p2).count() == 5)
  }

  test("export writers stream multi-batch/multi-partition without collect") {
    // r4 verdict item 5: neither export writer may collect() the table.
    // Feather: 100 rows through batchRows=7 → 15 record batches; the
    // reader must see every row exactly once, in order.
    import graft.sources.Feather
    val tmp = java.nio.file.Files.createTempDirectory("graft_export").toString
    val df = spark.range(100).selectExpr("id", "concat('name_', id) AS name")
      .repartition(5)
    val fp = Feather.write(df, s"$tmp/multi.feather", batchRows = 7)
    val back = Feather.read(spark, fp)
    assert(back.count() == 100)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0) == 4950)
    // Xlsx: multi-partition DataFrame streams through writeDf
    val xp = s"$tmp/multi.xlsx"
    Xlsx.writeDf(df, xp)
    val xback = Loaders("excel").load(spark, xp)
    assert(xback.count() == 100)
    assert(xback.columns.toSeq == Seq("id", "name"))
    // and the writers' source no longer contains a full-table collect
    val src = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "src/main/scala/graft/sources/Feather.scala")), "UTF-8") +
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        "src/main/scala/graft/sources/Xlsx.scala")), "UTF-8")
    assert(!src.contains(".collect()"), "export writers must stream, not collect")
  }

  test("feather: reads pandas-shaped files (tz-naive ns timestamps, date64, ms)") {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.ipc.ArrowFileWriter
    import org.apache.arrow.vector.types.{DateUnit, TimeUnit}
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, Schema => ArrowSchema}
    // pandas.to_feather defaults: timestamp[ns] with NO timezone, and
    // pyarrow may emit date64[ms]. Assemble such a file with Arrow
    // directly — Feather.write always emits micro/UTC, so this is the
    // interop path Feather.read must handle.
    val path = tmpFile(".feather")
    val alloc = new RootAllocator()
    val fields = java.util.Arrays.asList(
      Field.nullable("ts_ns", new ArrowType.Timestamp(TimeUnit.NANOSECOND, null)),
      Field.nullable("ts_ms", new ArrowType.Timestamp(TimeUnit.MILLISECOND, null)),
      Field.nullable("ts_s", new ArrowType.Timestamp(TimeUnit.SECOND, "UTC")),
      Field.nullable("d64", new ArrowType.Date(DateUnit.MILLISECOND)))
    val root = VectorSchemaRoot.create(new ArrowSchema(fields), alloc)
    val ch = java.nio.channels.FileChannel.open(java.nio.file.Paths.get(path),
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.WRITE,
      java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
    val writer = new ArrowFileWriter(root, null, ch)
    try {
      root.allocateNew()
      // 2020-06-01 14:30:00.123456789 UTC
      val epochSec = java.time.Instant.parse("2020-06-01T14:30:00Z").getEpochSecond
      root.getVector(0).asInstanceOf[TimeStampNanoVector].setSafe(0, epochSec * 1000000000L + 123456789L)
      root.getVector(1).asInstanceOf[TimeStampMilliVector].setSafe(0, epochSec * 1000L + 123L)
      root.getVector(2).asInstanceOf[TimeStampSecTZVector].setSafe(0, epochSec)
      root.getVector(3).asInstanceOf[DateMilliVector].setSafe(0,
        java.time.LocalDate.of(2020, 6, 1).toEpochDay * 86400000L)
      root.setRowCount(1)
      writer.start(); writer.writeBatch(); writer.end()
    } finally { writer.close(); root.close(); alloc.close(); ch.close() }
    val back = graft.sources.Feather.read(spark, path)
    val row = back.selectExpr("CAST(ts_ns AS STRING)", "CAST(ts_ms AS STRING)",
      "CAST(ts_s AS STRING)", "CAST(d64 AS STRING)").head()
    assert(row.getString(0) == "2020-06-01 14:30:00.123456") // ns floor to micros
    assert(row.getString(1) == "2020-06-01 14:30:00.123")
    assert(row.getString(2) == "2020-06-01 14:30:00")
    assert(row.getString(3) == "2020-06-01")
  }

  test("feather: reads LZ4-compressed files and narrow/unsigned int widths") {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.ipc.ArrowFileWriter
    import org.apache.arrow.vector.ipc.message.IpcOption
    import org.apache.arrow.vector.compression.CompressionUtil
    import org.apache.arrow.compression.CommonsCompressionFactory
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, Schema => ArrowSchema}
    // pandas.to_feather compresses with LZ4 by DEFAULT and narrows
    // dtypes (int16, uint32) — this is the file every real pandas
    // export produces, which the codec-less width-blind reader crashed on
    val path = tmpFile(".feather")
    val alloc = new RootAllocator()
    val fields = java.util.Arrays.asList(
      Field.nullable("i16", new ArrowType.Int(16, true)),
      Field.nullable("u32", new ArrowType.Int(32, false)),
      Field.nullable("i8", new ArrowType.Int(8, true)))
    val root = VectorSchemaRoot.create(new ArrowSchema(fields), alloc)
    val ch = java.nio.channels.FileChannel.open(java.nio.file.Paths.get(path),
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.WRITE,
      java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
    val writer = new ArrowFileWriter(root, null, ch, null,
      IpcOption.DEFAULT, CommonsCompressionFactory.INSTANCE,
      CompressionUtil.CodecType.LZ4_FRAME)
    try {
      root.allocateNew()
      root.getVector(0).asInstanceOf[SmallIntVector].setSafe(0, -123)
      // 3_000_000_000 exceeds Int.MaxValue: must surface as a LONG
      root.getVector(1).asInstanceOf[UInt4Vector].setWithPossibleTruncate(0, 3000000000L.toInt)
      root.getVector(2).asInstanceOf[TinyIntVector].setSafe(0, -7)
      root.setRowCount(1)
      writer.start(); writer.writeBatch(); writer.end()
    } finally { writer.close(); root.close(); alloc.close(); ch.close() }
    val back = graft.sources.Feather.read(spark, path)
    assert(back.schema("i16").dataType == org.apache.spark.sql.types.IntegerType)
    assert(back.schema("u32").dataType == org.apache.spark.sql.types.LongType)
    val row = back.head()
    assert(row.getInt(0) == -123)
    assert(row.getLong(1) == 3000000000L)
    assert(row.getInt(2) == -7)
  }
}

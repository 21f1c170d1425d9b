package graft.sources

import java.nio.channels.FileChannel
import java.nio.file.{Paths, StandardOpenOption}

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter, SeekableReadChannel}
import org.apache.arrow.vector.types.{DateUnit, FloatingPointPrecision, TimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, Schema => ArrowSchema}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Feather export/reload — the reference's `Table.to_feather`
  * (openpolicedata/data.py:425) and `load_feather` (:1490). Feather v2
  * IS the Arrow IPC file format, and Spark already ships arrow-vector
  * for its Pandas-UDF interop, so this writes/reads real feather files
  * with no extra dependency.
  *
  * Driver-side by design: the reference exports a loaded table to one
  * local file (a small per-agency extract). The 100 TB path is parquet
  * ([[Export.toParquet]], distributed); feather exists for
  * interoperability with the reference's pandas read path.
  */
object Feather {

  /** Close every resource, keeping the FIRST failure: a throwing
    * writer.close() (e.g. footer write on a full disk) must not skip
    * the allocator/channel closes or mask the original exception. */
  private def closeAll(cs: AutoCloseable*): Unit = {
    var first: Throwable = null
    cs.foreach { c =>
      try { if (c != null) c.close() }
      catch { case t: Throwable => if (first == null) first = t }
    }
    if (first != null) throw first
  }

  def featherFilename(state: String, sourceName: String, agency: String,
                      tableType: String, date: Either[String, (String, String)]): String =
    Export.canonicalBase(state, sourceName, agency, tableType, date) + ".feather"

  private def arrowField(f: StructField): Field = {
    val t = f.dataType match {
      case IntegerType   => new ArrowType.Int(32, true)
      case LongType      => new ArrowType.Int(64, true)
      case FloatType     => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
      case DoubleType    => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case StringType    => ArrowType.Utf8.INSTANCE
      case BooleanType   => ArrowType.Bool.INSTANCE
      case DateType      => new ArrowType.Date(DateUnit.DAY)
      case TimestampType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC")
      case other => throw new IllegalArgumentException(
        s"feather export: unsupported column type $other for '${f.name}'")
    }
    Field.nullable(f.name, t)
  }

  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos % 1000000L) / 1000L

  /** Write a DataFrame to one feather (Arrow IPC) file.
    *
    * Streams through `toLocalIterator` — one Spark partition in driver
    * memory at a time — emitting an Arrow record batch every
    * `batchRows` rows, so driver memory is bounded by one batch + one
    * partition regardless of table size (the r4 verdict's export fix;
    * the old path collect()ed the whole table). */
  def write(df: DataFrame, path: String, batchRows: Int = 1 << 16): String = {
    require(batchRows > 0, s"batchRows must be positive, got $batchRows")
    val schema = df.schema
    // resources are constructed INSIDE the try: a failing
    // FileChannel.open (bad path) must not leak the allocator and the
    // Arrow buffers already allocated for the root
    val allocator = new RootAllocator()
    var root: VectorSchemaRoot = null
    var ch: FileChannel = null
    var writer: ArrowFileWriter = null
    def setCell(r: Row, i: Int, c: Int, f: StructField): Unit = {
      val v = root.getVector(c)
      if (r.isNullAt(c)) v.asInstanceOf[FieldVector] match {
        case fv: BaseFixedWidthVector    => fv.setNull(i)
        case fv: BaseVariableWidthVector => fv.setNull(i)
        case fv => throw new IllegalStateException(s"unexpected vector ${fv.getClass}")
      }
      else f.dataType match {
        case IntegerType   => v.asInstanceOf[IntVector].setSafe(i, r.getInt(c))
        case LongType      => v.asInstanceOf[BigIntVector].setSafe(i, r.getLong(c))
        case FloatType     => v.asInstanceOf[Float4Vector].setSafe(i, r.getFloat(c))
        case DoubleType    => v.asInstanceOf[Float8Vector].setSafe(i, r.getDouble(c))
        case StringType    => v.asInstanceOf[VarCharVector].setSafe(i, r.getString(c).getBytes("UTF-8"))
        case BooleanType   => v.asInstanceOf[BitVector].setSafe(i, if (r.getBoolean(c)) 1 else 0)
        case DateType      => v.asInstanceOf[DateDayVector].setSafe(i,
          r.getDate(c).toLocalDate.toEpochDay.toInt)
        case TimestampType => v.asInstanceOf[TimeStampMicroTZVector].setSafe(i,
          micros(r.getTimestamp(c)))
        case other => throw new IllegalArgumentException(s"unsupported $other")
      }
    }
    try {
      root = VectorSchemaRoot.create(
        new ArrowSchema(java.util.Arrays.asList(schema.fields.map(arrowField): _*)), allocator)
      ch = FileChannel.open(Paths.get(path), StandardOpenOption.CREATE,
        StandardOpenOption.WRITE, StandardOpenOption.TRUNCATE_EXISTING)
      writer = new ArrowFileWriter(root, null, ch)
      writer.start()
      val it = df.toLocalIterator()
      var i = 0
      var batches = 0
      root.allocateNew()
      while (it.hasNext) {
        val r = it.next()
        schema.fields.zipWithIndex.foreach { case (f, c) => setCell(r, i, c, f) }
        i += 1
        if (i == batchRows) {
          root.setRowCount(i); writer.writeBatch(); batches += 1
          root.allocateNew(); i = 0
        }
      }
      // final partial batch; an empty table still gets one empty batch
      // (same file shape the single-batch writer produced)
      if (i > 0 || batches == 0) { root.setRowCount(i); writer.writeBatch() }
      writer.end()
      path
    } finally closeAll(writer, root, allocator, ch)
  }

  /** `Table.to_feather`: write under outputDir with the canonical name. */
  def toFeather(df: DataFrame, outputDir: String, state: String, sourceName: String,
                agency: String, tableType: String,
                date: Either[String, (String, String)]): String =
    write(df, s"$outputDir/${featherFilename(state, sourceName, agency, tableType, date)}")

  /** `load_feather`: read a feather (Arrow IPC) file back to a
    * DataFrame. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val allocator = new RootAllocator()
    var ch: FileChannel = null
    var reader: ArrowFileReader = null
    try {
      ch = FileChannel.open(Paths.get(path), StandardOpenOption.READ)
      // CommonsCompressionFactory: pandas to_feather compresses record
      // batches with LZ4 by DEFAULT — the codec-less reader would fail
      // on every ordinary pandas export, the exact interop this module
      // exists for
      reader = new ArrowFileReader(new SeekableReadChannel(ch), allocator,
        org.apache.arrow.compression.CommonsCompressionFactory.INSTANCE)
      val root = reader.getVectorSchemaRoot
      val fields = root.getSchema.getFields
      val arrowTypes = (0 until fields.size()).map(c => fields.get(c).getType)
      val sparkFields = (0 until fields.size()).map { c =>
        val f = fields.get(c)
        // dictionary-encoded (pandas categorical) columns carry INDEX
        // data in the field vector; decoding them as values would be
        // silent corruption — fail loud at schema time
        if (f.getDictionary != null) throw new IllegalArgumentException(
          s"feather load: column '${f.getName}' is dictionary-encoded " +
            "(pandas categorical) — cast it to its value type before " +
            "export (e.g. .astype(str))")
        val dt = f.getType match {
          case i: ArrowType.Int if i.getBitWidth == 64 && !i.getIsSigned =>
            throw new IllegalArgumentException(
              s"feather load: column '${f.getName}' is uint64, which a " +
                "Spark LongType cannot represent")
          case i: ArrowType.Int if i.getBitWidth == 64                    => LongType
          case i: ArrowType.Int if i.getBitWidth == 32 && !i.getIsSigned  => LongType
          case i: ArrowType.Int if i.getBitWidth == 32                    => IntegerType
          case _: ArrowType.Int                                           => IntegerType
          case fp: ArrowType.FloatingPoint if fp.getPrecision == FloatingPointPrecision.HALF =>
            throw new IllegalArgumentException(
              s"feather load: column '${f.getName}' is float16 — cast to " +
                "float32/float64 before export")
          case fp: ArrowType.FloatingPoint if fp.getPrecision == FloatingPointPrecision.SINGLE => FloatType
          case _: ArrowType.FloatingPoint              => DoubleType
          case _: ArrowType.Utf8                       => StringType
          case _: ArrowType.Bool                       => BooleanType
          case _: ArrowType.Date                       => DateType
          case _: ArrowType.Timestamp                  => TimestampType
          case other => throw new IllegalArgumentException(s"feather load: unsupported $other")
        }
        StructField(f.getName, dt, nullable = true)
      }
      val schema = StructType(sparkFields)
      val out = Seq.newBuilder[Row]
      while (reader.loadNextBatch()) {
        val n = root.getRowCount
        (0 until n).foreach { i =>
          out += Row.fromSeq(sparkFields.indices.map { c =>
            val v = root.getVector(c)
            if (v.isNull(i)) null
            else sparkFields(c).dataType match {
              // width/sign-aware: the schema mapping admits 8/16-bit and
              // unsigned-32 ints, so the extraction must match the
              // concrete vector class, not assume Int/BigIntVector
              case IntegerType   => arrowTypes(c) match {
                case it: ArrowType.Int if it.getBitWidth == 8 && it.getIsSigned =>
                  v.asInstanceOf[TinyIntVector].get(i).toInt
                case it: ArrowType.Int if it.getBitWidth == 8 =>
                  v.asInstanceOf[UInt1Vector].get(i) & 0xFF
                case it: ArrowType.Int if it.getBitWidth == 16 && it.getIsSigned =>
                  v.asInstanceOf[SmallIntVector].get(i).toInt
                case it: ArrowType.Int if it.getBitWidth == 16 =>
                  v.asInstanceOf[UInt2Vector].get(i).toInt
                case _ => v.asInstanceOf[IntVector].get(i)
              }
              case LongType      => arrowTypes(c) match {
                case it: ArrowType.Int if it.getBitWidth == 32 && !it.getIsSigned =>
                  v.asInstanceOf[UInt4Vector].get(i) & 0xFFFFFFFFL
                case _ => v.asInstanceOf[BigIntVector].get(i)
              }
              case FloatType     => v.asInstanceOf[Float4Vector].get(i)
              case DoubleType    => v.asInstanceOf[Float8Vector].get(i)
              case StringType    => new String(v.asInstanceOf[VarCharVector].get(i), "UTF-8")
              case BooleanType   => v.asInstanceOf[BitVector].get(i) == 1
              case DateType =>
                // pandas/pyarrow may emit date32 (days) or date64 (millis);
                // dispatch on the declared unit instead of assuming date32.
                val days = arrowTypes(c).asInstanceOf[ArrowType.Date].getUnit match {
                  case DateUnit.DAY => v.asInstanceOf[DateDayVector].get(i).toLong
                  case DateUnit.MILLISECOND =>
                    Math.floorDiv(v.asInstanceOf[DateMilliVector].get(i), 86400000L)
                }
                java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days))
              case TimestampType =>
                // pandas defaults to tz-naive timestamp[ns]; accept any unit
                // and tz-ness. All TimeStamp*Vector classes share the raw
                // epoch-relative long accessor via TimeStampVector; tz-naive
                // values are interpreted as UTC (the session timezone).
                val raw = v.asInstanceOf[TimeStampVector].get(i)
                val us = arrowTypes(c).asInstanceOf[ArrowType.Timestamp].getUnit match {
                  case TimeUnit.SECOND      => Math.multiplyExact(raw, 1000000L)
                  case TimeUnit.MILLISECOND => Math.multiplyExact(raw, 1000L)
                  case TimeUnit.MICROSECOND => raw
                  case TimeUnit.NANOSECOND  => Math.floorDiv(raw, 1000L)
                }
                java.sql.Timestamp.from(java.time.Instant.EPOCH.plus(us, java.time.temporal.ChronoUnit.MICROS))
              case other => throw new IllegalArgumentException(s"unsupported $other")
            }
          })
        }
      }
      spark.createDataFrame(spark.sparkContext.parallelize(out.result()), schema)
    } finally closeAll(reader, allocator, ch)
  }

  def loadFeather(spark: SparkSession, outputDir: String, state: String,
                  sourceName: String, agency: String, tableType: String,
                  date: Either[String, (String, String)]): DataFrame =
    read(spark, s"$outputDir/${featherFilename(state, sourceName, agency, tableType, date)}")

  // ---- geofeather (data.py:516 get_feather_filename(geo=True),
  //      :2051 '.geofeather') -------------------------------------------

  def geoFeatherFilename(state: String, sourceName: String, agency: String,
                         tableType: String, date: Either[String, (String, String)]): String =
    Export.canonicalBase(state, sourceName, agency, tableType, date) + ".geofeather"

  /** Geo feather export: the point struct serializes as WKT text (the
    * writer above is deliberately flat-scalar; WKT is the interchange
    * form every geo reader parses), written under the `.geofeather`
    * canonical name. Fail-loud if the geometry column is missing or not
    * the point struct, matching toGeoParquet. */
  def toGeoFeather(df: DataFrame, outputDir: String, state: String,
                   sourceName: String, agency: String, tableType: String,
                   date: Either[String, (String, String)],
                   geometryCol: String = "geometry"): String = {
    require(df.columns.contains(geometryCol) &&
        graft.geo.Geo.isPointType(df.schema(geometryCol).dataType),
      s"toGeoFeather: column '$geometryCol' must be the " +
        "struct<lon double, lat double> point column")
    val flat = df.withColumn(geometryCol,
      graft.geo.Geo.toWkt(org.apache.spark.sql.functions.col(geometryCol)))
    write(flat, s"$outputDir/${geoFeatherFilename(state, sourceName, agency, tableType, date)}")
  }

  /** Reload a `.geofeather` export, parsing the WKT column back into
    * the point struct. */
  def loadGeoFeather(spark: SparkSession, outputDir: String, state: String,
                     sourceName: String, agency: String, tableType: String,
                     date: Either[String, (String, String)],
                     geometryCol: String = "geometry"): DataFrame = {
    val flat = read(spark,
      s"$outputDir/${geoFeatherFilename(state, sourceName, agency, tableType, date)}")
    flat.withColumn(geometryCol,
      graft.geo.Geo.parseWkt(org.apache.spark.sql.functions.col(geometryCol)))
  }
}

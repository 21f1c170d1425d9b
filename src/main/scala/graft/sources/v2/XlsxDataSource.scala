package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{And, DataSourceRegister, EqualTo, Filter, In, IsNotNull, IsNull, Or, StringContains, StringEndsWith, StringStartsWith}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.Xlsx

/** DataSource V2 connector for xlsx: `spark.read.format("graft-xlsx")
  * .load(path)` — the Spark-native form of the reference's Excel loader
  * (openpolicedata/data_loaders/excel.py:24), replacing the driver-side
  * `Xlsx.read` + `parallelize` convenience with a real distributed scan:
  *
  *  - **One input partition per (file, sheet)**: a directory of per-
  *    agency xlsx files (or one workbook's year-sheets, excel.py:215)
  *    parses fully in parallel ON EXECUTORS — the driver only lists
  *    sheets and stream-reads header rows (schema inference is
  *    O(headers), never data rows). xlsx is a zip (non-splittable), so
  *    file×sheet is the natural parallelism unit.
  *  - **Column pruning** (SupportsPushDownRequiredColumns): a projection
  *    reaches the scan, so readers emit only the requested columns —
  *    visible as the pruned BatchScan output in `.explain`.
  *  - **Union-by-name semantics**: each partition projects by column
  *    NAME against its own file's header (missing columns → null),
  *    matching the reference's year-sheet concatenation and
  *    CombinedDataset alignment.
  *
  * `path` may be a single .xlsx file or a directory of them; `sheet`
  * optionally pins one sheet name (otherwise: single sheet, or the
  * year-sheet sequence). Cells surface as nullable strings — exactly
  * what the standardization pipeline expects from messy agency files.
  */
class XlsxDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-xlsx"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val splits = XlsxV2.splits(options)
    // First-seen column order across all (file, sheet) splits; all-string.
    // Header-only streaming parse per sheet — inference stays O(headers)
    // on the driver even over a directory of large workbooks.
    val seen = new scala.collection.mutable.LinkedHashSet[String]
    splits.foreach { case (file, sheet) =>
      Xlsx.header(file, sheet).foreach(seen.add)
    }
    require(seen.nonEmpty, s"no columns found under ${options.get("path")}")
    StructType(seen.toSeq.map(StructField(_, StringType, nullable = true)))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // every cell surfaces as a string (pandas-style dtype inference is
    // the caller's cast) — a user schema with non-string fields would
    // CCE at runtime when the reader emits UTF8String into an int slot
    val bad = schema.fields.filter(_.dataType != org.apache.spark.sql.types.StringType)
    require(bad.isEmpty,
      s"graft-xlsx: all columns read as STRING (cast afterwards); " +
        s"non-string fields in the user schema: ${bad.map(_.name).mkString(", ")}")
    new XlsxTable(schema, new CaseInsensitiveStringMap(properties))
  }
}

object XlsxV2 {
  /** Resolve the `path` option to the (file, sheet) read units. */
  def splits(options: CaseInsensitiveStringMap): Seq[(String, String)] = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-xlsx: `path` option is required"))
    val sheet = Option(options.get("sheet"))
    val f = new java.io.File(path)
    val files =
      if (f.isDirectory)
        Option(f.listFiles((_, n) => n.toLowerCase.endsWith(".xlsx")))
          .getOrElse(Array.empty[java.io.File]).map(_.getPath).sorted.toSeq
      else Seq(path)
    require(files.nonEmpty, s"graft-xlsx: no .xlsx files under $path")
    files.flatMap(file => Xlsx.sheetsToRead(file, sheet).map(file -> _))
  }
}

class XlsxTable(tableSchema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft-xlsx:" + options.get("path")
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new XlsxScanBuilder(tableSchema, options)
}

class XlsxScanBuilder(full: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, unsup) = filters.partition(XlsxFilters.supported)
    pushed = sup
    unsup
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new XlsxScan(required, XlsxV2.splits(options), pushed)
}

/** Filter pushdown for the all-string xlsx schema: rows failing a
  * pushed predicate are dropped INSIDE the partition reader, during the
  * single pass over the sheet — they never materialize as Spark rows,
  * the xlsx analogue of a parquet scan's PushedFilters.
  *
  * Only predicates whose null semantics match SQL's under a plain
  * boolean evaluation are accepted: every supported leaf evaluates to
  * FALSE on a null cell (exactly SQL's "null never passes a filter"),
  * and And/Or over false-on-null leaves agree with three-valued logic
  * wherever the filter decides to keep or drop. `Not` is deliberately
  * unsupported (Not(EqualTo) on a null cell would keep a row SQL
  * drops); unsupported shapes stay in Spark's post-scan Filter. */
object XlsxFilters {
  def supported(f: Filter): Boolean = f match {
    case EqualTo(_, v) => v.isInstanceOf[String]
    case In(_, vs) => vs != null && vs.forall(_.isInstanceOf[String])
    case _: IsNull | _: IsNotNull => true
    case _: StringStartsWith | _: StringEndsWith | _: StringContains => true
    case And(l, r) => supported(l) && supported(r)
    case Or(l, r) => supported(l) && supported(r)
    case _ => false
  }

  /** Evaluate over a cell lookup (None = null cell / absent column). */
  def eval(f: Filter, get: String => Option[String]): Boolean = f match {
    case EqualTo(a, v) => get(a).contains(v.asInstanceOf[String])
    case In(a, vs) => get(a).exists(x => vs.exists(v => v.asInstanceOf[String] == x))
    case IsNull(a) => get(a).isEmpty
    case IsNotNull(a) => get(a).nonEmpty
    case StringStartsWith(a, p) => get(a).exists(_.startsWith(p))
    case StringEndsWith(a, s) => get(a).exists(_.endsWith(s))
    case StringContains(a, s) => get(a).exists(_.contains(s))
    case And(l, r) => eval(l, get) && eval(r, get)
    case Or(l, r) => eval(l, get) || eval(r, get)
    case _ => true // unreachable: only supported() filters are pushed
  }
}

case class XlsxInputPartition(file: String, sheet: String) extends InputPartition

class XlsxScan(required: StructType, splits: Seq[(String, String)],
    pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-xlsx ${splits.size} sheet(s), columns [${required.fieldNames.mkString(",")}], " +
      s"PushedFilters: [${pushed.mkString(", ")}]"
  override def planInputPartitions(): Array[InputPartition] =
    splits.map { case (f, s) => XlsxInputPartition(f, s) }.toArray
  override def createReaderFactory(): PartitionReaderFactory =
    XlsxReaderFactory(required.fieldNames, pushed)
}

case class XlsxReaderFactory(required: Array[String], pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[XlsxInputPartition]
    new XlsxPartitionReader(p.file, p.sheet, required, pushed)
  }
}

/** Executor-side reader: parses its one sheet, applies the pushed
  * filters against this file's own header (absent name → null), then
  * projects by column NAME (absent name → null column). */
class XlsxPartitionReader(file: String, sheet: String, required: Array[String],
    pushed: Array[Filter]) extends PartitionReader[InternalRow] {
  private val (header, rows) = Xlsx.headerAndRows(file, sheet)
  // Name lookup: EXACT match first, case-insensitive as fallback.
  // The fallback matches Spark's default resolution and the V1
  // unionByName path: a file whose header says 'RACE' while the
  // inferred schema says 'Race' must still bind (case-sensitive-only
  // indexOf silently nulled the column AND let a pushed IsNotNull
  // drop every row of the case-variant file). Exact-first matters
  // when one sheet legitimately holds BOTH 'RACE' and 'Race': schema
  // inference dedups headers case-sensitively and emits two fields,
  // and a bare equalsIgnoreCase would bind both fields to the FIRST
  // header index, silently reading the first column's data twice.
  private def colIndex(n: String): Int = header.indexOf(n) match {
    case -1 => header.indexWhere(_.equalsIgnoreCase(n))
    case i  => i
  }
  private val idx: Array[Int] = required.map(colIndex) // -1 → null
  private val filterIdx: Map[String, Int] =
    pushed.flatMap(_.references).distinct.map(n => n -> colIndex(n)).toMap
  private val it = rows.iterator
  private var row: Array[String] = _

  private def cell(name: String): Option[String] = {
    val i = filterIdx.getOrElse(name, -1)
    if (i >= 0 && i < row.length) Option(row(i)) else None
  }

  override def next(): Boolean = {
    while (it.hasNext) {
      row = it.next()
      if (pushed.forall(XlsxFilters.eval(_, cell))) return true
    }
    false
  }
  override def get(): InternalRow = InternalRow.fromSeq(
    idx.toIndexedSeq.map { i =>
      if (i >= 0 && i < row.length && row(i) != null) UTF8String.fromString(row(i)) else null
    })
  override def close(): Unit = ()
}

package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** `topk_rows(struct(sortKey..., payload), k, nSort, descMask,
  * nullsLastMask)` — keeps the k FIRST structs in window order, where
  * "window order" is the lexicographic order of the first `nSort` struct
  * fields with per-field direction (`descMask` bit i) and null placement
  * (`nullsLastMask` bit i). Output: the kept structs as an array, sorted
  * in window order — element index == row_number - 1.
  *
  * A bounded-heap TypedImperativeAggregate like TopKLargest, but
  * ordering-aware (honors DESC / NULLS FIRST|LAST per key, and keeps
  * null-keyed rows exactly as a window sort would, where TopKLargest
  * drops nulls). Each partition ships at most k rows per group in the
  * partial state — the scale contract that makes [[TopKRewrite]] a win:
  * the window form must shuffle and SORT every row of every group.
  */
case class TopKRows(child: Expression, k: Int, nSort: Int,
    descMask: Long, nullsLastMask: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[InternalRow]] {

  require(k > 0 && k <= (1 << 20), s"topk_rows: k must be in [1, 2^20], got $k")
  require(nSort >= 1 && nSort <= 64, s"topk_rows: nSort must be in [1, 64], got $nSort")

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  /** Window order over the leading nSort struct fields. */
  @transient private lazy val windowOrd: java.util.Comparator[InternalRow] = {
    val fields = structType.fields
    val fieldOrds: Array[Ordering[Any]] = Array.tabulate(nSort) { i =>
      TypeUtils.getInterpretedOrdering(fields(i).dataType)
    }
    new java.util.Comparator[InternalRow] {
      override def compare(a: InternalRow, b: InternalRow): Int = {
        var i = 0
        while (i < nSort) {
          val desc = (descMask >>> i & 1L) == 1L
          val nullsLast = (nullsLastMask >>> i & 1L) == 1L
          val an = a.isNullAt(i)
          val bn = b.isNullAt(i)
          if (an || bn) {
            if (!(an && bn)) return if (an == nullsLast) 1 else -1
          } else {
            val av = a.get(i, structType.fields(i).dataType)
            val bv = b.get(i, structType.fields(i).dataType)
            val c = fieldOrds(i).compare(av, bv)
            if (c != 0) return if (desc) -c else c
          }
          i += 1
        }
        0
      }
    }
  }

  @transient private lazy val projection =
    UnsafeProjection.create(Array[DataType](child.dataType))

  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKRows = copy(child = newChildren.head)
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_rows"
  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)

  // Max-heap in window order: head = worst kept row, evicted first.
  override def createAggregationBuffer(): java.util.PriorityQueue[InternalRow] =
    new java.util.PriorityQueue[InternalRow](math.min(k + 1, 64), windowOrd.reversed())

  private def add(buf: java.util.PriorityQueue[InternalRow], v: InternalRow): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (windowOrd.compare(v, buf.peek) < 0) { buf.poll(); buf.add(v); () }

  override def update(buf: java.util.PriorityQueue[InternalRow], input: InternalRow): java.util.PriorityQueue[InternalRow] = {
    val v = child.eval(input).asInstanceOf[InternalRow]
    if (v != null && (buf.size < k || windowOrd.compare(v, buf.peek) < 0))
      add(buf, InternalRow.copyValue(v).asInstanceOf[InternalRow]) // copy only when kept
    buf
  }

  override def merge(b1: java.util.PriorityQueue[InternalRow], b2: java.util.PriorityQueue[InternalRow]): java.util.PriorityQueue[InternalRow] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: java.util.PriorityQueue[InternalRow]): Any = {
    val arr = buf.toArray(new Array[InternalRow](buf.size))
    java.util.Arrays.sort(arr, windowOrd)
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: java.util.PriorityQueue[InternalRow]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    val it = buf.iterator()
    while (it.hasNext) {
      val row = projection.apply(InternalRow(it.next()))
      dos.writeInt(row.getSizeInBytes)
      row.writeToStream(dos, null)
    }
    dos.writeInt(-1)
    dos.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[InternalRow] = {
    val buf = createAggregationBuffer()
    val dis = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    var sz = dis.readInt()
    while (sz >= 0) {
      val arr = new Array[Byte](sz)
      dis.readFully(arr)
      val row = new UnsafeRow(1)
      row.pointTo(arr, sz)
      buf.add(InternalRow.copyValue(row.get(0, child.dataType)).asInstanceOf[InternalRow])
      sz = dis.readInt()
    }
    buf
  }
}

/** Optimizer rule: rewrites the row_number-over-window top-N pattern
  *
  * {{{ Filter(rn <= k [AND ...], Window(row_number() OVER (PARTITION BY p ORDER BY o), p, o, child)) }}}
  *
  * into a bounded-heap aggregate + posexplode:
  *
  * {{{ Filter(origCond, Project(row fields + pos+1 AS rn, Generate(posexplode(topk), Aggregate(p, topk_rows(struct(o..., struct(child.*)), k), child)))) }}}
  *
  * Why: the window form must shuffle EVERY row of every group and sort
  * each group in full before discarding all but k rows. (Spark's own
  * InferWindowGroupLimit bounds the sort inputs but still sorts.) The
  * aggregate form is a hash aggregate with a k-bounded heap per group:
  * map-side partials ship <= k rows per group per partition and nothing
  * is ever sorted beyond the final k elements per group. At 100 TB,
  * top-N per key over a fact table goes from "sort the fact table" to
  * "one partial-agg shuffle of k rows per group".
  *
  * Safety:
  *  - only `row_number` (never rank/dense_rank: their <= k output can
  *    exceed k rows on ties, which a k-bounded heap would drop);
  *  - the Window must compute exactly that one window expression;
  *  - the ENTIRE original filter condition is re-applied on the rebuilt
  *    rows (the k-bound conjunct becomes vacuously true), so extra
  *    conjuncts — IsNotNull(rn) inferred by the optimizer, rn = k,
  *    rn > 2, predicates on data columns — keep exact semantics with no
  *    conjunct bookkeeping;
  *  - original output attributes (exprIds) are restored by projection,
  *    so parent plans resolve unchanged;
  *  - under a non-total ORDER BY, row_number is already nondeterministic
  *    in Spark (unstable sort across partitions); the heap makes the
  *    same class of arbitrary choice among order-ties.
  *
  * Registered via SparkSessionExtensions#injectOptimizerRule (it runs in
  * the operator-optimization fixed point, i.e. before Spark's
  * InferWindowGroupLimit can claim the pattern) and, for runtime
  * registration, via experimental.extraOptimizations (after
  * InferWindowGroupLimit — hence the WindowGroupLimit unwrap below).
  * Disable with `spark.graft.topk.rewrite=false`; heap-size guard
  * `spark.graft.topk.rewrite.maxK` (default 16384).
  */
object TopKRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.topk.rewrite", "true").toBoolean
  private def maxK: Long =
    conf.getConfString("spark.graft.topk.rewrite.maxK", "16384").toLong

  /** rn attr possibly wrapped in a WIDENING cast. Narrowing casts
    * (tinyint/smallint) must NOT unwrap: under non-ANSI they WRAP, so
    * CAST(rn AS TINYINT) <= 10 also passes rn = 257..266 — inferring
    * k = 10 would make the heap drop rows the original filter keeps
    * (and the re-applied filter cannot resurrect rows never kept). */
  private def isRn(e: Expression, rn: Attribute): Boolean = e match {
    case a: AttributeReference => a.exprId == rn.exprId
    case c: Cast => (c.dataType match {
      case LongType | DoubleType => true
      case d: DecimalType => d.precision >= 10 // holds any int rn
      case IntegerType => true // rn IS int; identity cast
      case _ => false
    }) && isRn(c.child, rn)
    case _ => false
  }

  private def intLit(e: Expression): Option[Long] = e match {
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Short, ShortType) => Some(v.toLong)
    case Cast(inner, _, _, _) => intLit(inner)
    case _ => None
  }

  /** Upper bound on rn implied by one conjunct, if any. */
  private def bound(c: Expression, rn: Attribute): Option[Long] = c match {
    case LessThanOrEqual(l, r) if isRn(l, rn) => intLit(r)
    case LessThan(l, r) if isRn(l, rn) => intLit(r).map(_ - 1)
    case EqualTo(l, r) if isRn(l, rn) => intLit(r)
    case EqualTo(l, r) if isRn(r, rn) => intLit(l)
    case GreaterThanOrEqual(l, r) if isRn(r, rn) => intLit(l)
    case GreaterThan(l, r) if isRn(r, rn) => intLit(l).map(_ - 1)
    case _ => None
  }

  private def isRowNumberFrame(frame: WindowFrame): Boolean = frame match {
    case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) => true
    case UnspecifiedFrame => true
    case _ => false
  }

  def apply(plan: LogicalPlan): LogicalPlan = if (!enabled) plan else plan.transform {
    case f @ Filter(cond, w: Window) if cond.deterministic =>
      rewrite(f, cond, w).getOrElse(f)
  }

  private def rewrite(f: Filter, cond: Expression, w: Window): Option[LogicalPlan] = {
    // One window expression, and it is row_number over the node's spec.
    val rnAlias = w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(RowNumber(), spec: WindowSpecDefinition), _))
          if isRowNumberFrame(spec.frameSpecification) => Some(a)
      case _ => None
    }
    rnAlias.flatMap { a =>
      val rnAttr = a.toAttribute
      val ks = splitConjunctivePredicates(cond).flatMap(bound(_, rnAttr))
      // Unwrap Spark's own WindowGroupLimit if it got there first (the
      // runtime-registration path runs after InferWindowGroupLimit); its
      // row_number prefix-per-group semantics are subsumed by the heap.
      // Guarded on the limit's FUNCTION and BOUND, not just the specs:
      // only a row_number-derived limit covering at least our k rows per
      // group is a safe no-op to drop (a rank/dense_rank producer, or a
      // tighter limit than k, would change results if unwrapped).
      val base = w.child match {
        case wgl: WindowGroupLimit
            if wgl.partitionSpec == w.partitionSpec &&
               wgl.orderSpec == w.orderSpec &&
               wgl.rankLikeFunction == RowNumber() &&
               ks.nonEmpty && wgl.limit >= ks.min =>
          wgl.child
        case c => c
      }
      // hard cap: TopKRows requires k <= 2^20 — a raised maxK conf must
      // make the rule SKIP (keeping the valid window plan), not throw
      // inside the optimizer; the toInt below is safe under this bound
      val kCap = math.min(maxK, 1L << 20)
      val eligible =
        ks.nonEmpty && ks.min >= 1 && ks.min <= kCap &&
        w.orderSpec.nonEmpty && w.orderSpec.size <= 64 &&
        w.orderSpec.forall(so => so.child.deterministic &&
          RowOrdering.isOrderable(so.child.dataType)) &&
        w.partitionSpec.forall(_.deterministic) &&
        base.output.nonEmpty
      if (!eligible) None else {
        val k = ks.min.toInt
        val n = w.orderSpec.size
        var descMask = 0L
        var nullsLastMask = 0L
        w.orderSpec.zipWithIndex.foreach { case (so, i) =>
          if (so.direction == Descending) descMask |= 1L << i
          if (so.nullOrdering == NullsLast) nullsLastMask |= 1L << i
        }
        val rowStruct = CreateStruct(base.output)
        val packed = CreateStruct(w.orderSpec.map(_.child) :+ (rowStruct: Expression))
        val aggFn = TopKRows(packed, k, n, descMask, nullsLastMask)
        val aggOut = Alias(aggFn.toAggregateExpression(), "__graft_topk")()
        val agg = Aggregate(w.partitionSpec, Seq(aggOut), base)

        val elemType = packed.dataType.asInstanceOf[StructType]
        val posAttr = AttributeReference("__graft_pos", IntegerType, nullable = false)()
        val colAttr = AttributeReference("__graft_row", elemType, nullable = false)()
        val gen = Generate(PosExplode(aggOut.toAttribute), unrequiredChildIndex = Seq(0),
          outer = false, qualifier = None,
          generatorOutput = Seq(posAttr, colAttr), agg)

        val rowField = GetStructField(colAttr, n, Some("row"))
        val restored: Seq[NamedExpression] = base.output.zipWithIndex.map { case (attr, i) =>
          Alias(GetStructField(rowField, i, Some(attr.name)), attr.name)(
            exprId = attr.exprId, qualifier = attr.qualifier)
        }
        val rn = Alias(Add(posAttr, Literal(1)), a.name)(exprId = rnAttr.exprId)
        Some(Filter(cond, Project(restored :+ rn, gen)))
      }
    }
  }
}

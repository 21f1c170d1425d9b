package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot per-row kernels — each one
  * implements `doGenCode` as a static-method call so it stays inside
  * WholeStageCodegen (SURVEY §3): one tight JVM loop per row instead of
  * the nested `transform(...)` array materializations of the declarative
  * forms (which made the 128-perm MinHash ~200× slower).
  *
  * Registered through `SparkSessionExtensions` (GraftExtensions) and
  * defensively at runtime via `GraftFunctions.ensureRegistered`.
  */
object MinHashImpl {
  /** Deterministic multiply-shift permutation family (seeded, no RNG
    * state at eval time). */
  val MaxPerms = 256
  val A: Array[Long] = {
    val r = new java.util.SplittableRandom(42L)
    Array.fill(MaxPerms)(r.nextLong() | 1L) // odd multipliers
  }
  val B: Array[Long] = {
    val r = new java.util.SplittableRandom(43L)
    Array.fill(MaxPerms)(r.nextLong())
  }

  /** Normalization identical to Dedup.normText: lower, trim, collapse
    * whitespace. */
  def normalize(s: String): String =
    s.replaceAll("\\s+", " ").trim.toLowerCase

  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  /** One pass over the k-char shingles; duplicates need no dedup (min is
    * idempotent under repeats). */
  def compute(text: UTF8String, k: Int, numPerms: Int): ArrayData = {
    val s = normalize(text.toString)
    val mins = new Array[Long](numPerms)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = s.length
    val last = if (n <= k) 0 else n - k
    var i = 0
    while (i <= last) {
      var h = FnvOffset
      val end = math.min(i + k, n)
      var j = i
      while (j < end) { h = (h ^ s.charAt(j)) * FnvPrime; j += 1 }
      var p = 0
      while (p < numPerms) {
        val v = A(p) * h + B(p)
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** minhash_sig(text, k, numPerms) → array<bigint> signature. */
case class MinHashSig(child: Expression, k: Int, numPerms: Int)
    extends UnaryExpression {
  // Fail at plan time, not deep inside codegen eval: the permutation
  // family is fixed-size (MaxPerms).
  require(k > 0, s"minhash_sig: shingle size k must be > 0, got $k")
  require(numPerms > 0 && numPerms <= MinHashImpl.MaxPerms,
    s"minhash_sig: numPerms must be in [1, ${MinHashImpl.MaxPerms}], got $numPerms")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(input: Any): Any =
    MinHashImpl.compute(input.asInstanceOf[UTF8String], k, numPerms)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashImpl.compute($c, $k, $numPerms)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object SimHashImpl {
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  /** 64-bit SimHash over whitespace tokens of the normalized text. */
  def compute(text: UTF8String): Long = {
    val s = MinHashImpl.normalize(text.toString)
    val counts = new Array[Int](64)
    var nWords = 0
    var start = 0
    val n = s.length
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) {
          var h = FnvOffset
          var j = start
          while (j < i) { h = (h ^ s.charAt(j)) * FnvPrime; j += 1 }
          nWords += 1
          var b = 0
          while (b < 64) { if (((h >>> b) & 1L) == 1L) counts(b) += 1; b += 1 }
        }
        start = i + 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) { if (counts(b) * 2 > nWords) sim |= (1L << b); b += 1 }
    sim
  }
}

/** simhash64(text) → bigint. */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(input: Any): Any =
    SimHashImpl.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashImpl.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object VecOps {
  /** Cosine over double arrays; sequential fold order matches the
    * declarative zip_with/aggregate form (and the DuckDB oracle) so the
    * doubles are bit-identical. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** cosine_sim(array<double>, array<double>) → double. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecOps.cosine($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object JaccardImpl {
  /** Jaccard over two SORTED, DISTINCT long arrays: single merge scan,
    * no hash set, no allocation. */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = n + m - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
}

/** jaccard_sorted(array<bigint>, array<bigint>) → double. Inputs must be
  * sorted + distinct (e.g. array_sort(array_distinct(...))). */
case class JaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sorted"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaccardImpl.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.JaccardImpl.jaccard($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): JaccardSorted =
    copy(left = newLeft, right = newRight)
}

object LshImpl {
  /** Deterministic random-hyperplane components, cached per
    * (numPlanes, dim); seeded SplittableRandom, uniform in [-1, 1]. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def planes(numPlanes: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((numPlanes, dim), { _ =>
      Array.tabulate(numPlanes) { j =>
        val r = new java.util.SplittableRandom(1234L + j)
        Array.fill(dim)(r.nextDouble() * 2 - 1)
      }
    })

  def compute(vec: ArrayData, numPlanes: Int): Long = {
    val dim = vec.numElements()
    val ps = planes(numPlanes, dim)
    var sig = 0L
    var j = 0
    while (j < numPlanes) {
      val p = ps(j)
      var s = 0.0
      var d = 0
      while (d < dim) { s += vec.getDouble(d) * p(d); d += 1 }
      if (s >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** lsh_sig(array<double>, numPlanes) → bigint sign-bit signature. */
case class LshSignature(child: Expression, numPlanes: Int)
    extends UnaryExpression {
  require(numPlanes > 0 && numPlanes <= 64,
    s"lsh_sig: numPlanes must be in [1, 64] (sign bits pack into a long), got $numPlanes")
  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_sig"
  override protected def nullSafeEval(input: Any): Any =
    LshImpl.compute(input.asInstanceOf[ArrayData], numPlanes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LshImpl.compute($c, $numPlanes)")
  override protected def withNewChildInternal(newChild: Expression): LshSignature =
    copy(child = newChild)
}

/** Registration: via SparkSessionExtensions (config
  * `spark.sql.extensions=graft.functions.GraftExtensions`) or at runtime
  * with `ensureRegistered(spark)`. */
object GraftFunctions {

  private def info(name: String) =
    new ExpressionInfo(classOf[MinHashSig].getName, name)

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "minhash_sig" -> (es => MinHashSig(es.head,
      es(1).eval().asInstanceOf[Number].intValue(),
      es(2).eval().asInstanceOf[Number].intValue())),
    "simhash64" -> (es => SimHash64(es.head)),
    "cosine_sim" -> (es => CosineSim(es(0), es(1))),
    "jaccard_sorted" -> (es => JaccardSorted(es(0), es(1))),
    "lsh_sig" -> (es => LshSignature(es.head,
      es(1).eval().asInstanceOf[Number].intValue()))
  )

  def register(ext: SparkSessionExtensions): Unit =
    builders.foreach { case (name, b) =>
      ext.injectFunction((FunctionIdentifier(name), info(name), b))
    }

  def ensureRegistered(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, b, "built-in")
    }

  // Column-API wrappers (functions are resolved from the registry).
  def minhashSig(c: Column, k: Int, numPerms: Int): Column =
    call_function("minhash_sig", c,
      org.apache.spark.sql.functions.lit(k), org.apache.spark.sql.functions.lit(numPerms))
  def simhash64(c: Column): Column = call_function("simhash64", c)
  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)
  def jaccardSorted(a: Column, b: Column): Column = call_function("jaccard_sorted", a, b)
  def lshSig(c: Column, numPlanes: Int): Column =
    call_function("lsh_sig", c, org.apache.spark.sql.functions.lit(numPlanes))
}

/** Entry point for spark.sql.extensions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.register(ext)
}

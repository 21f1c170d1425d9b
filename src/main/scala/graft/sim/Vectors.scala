package graft.sim

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-column utilities for training-data pipelines: L2
  * normalization (so cosine becomes a plain dot product downstream) and
  * symmetric int8 quantization (4x storage/shuffle reduction for
  * corpus-scale vector tables). All per-row builtin expressions — no
  * UDFs, no shuffle.
  */
object Vectors {

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** L2-normalize; zero vectors stay zero instead of dividing by 0. */
  def l2Normalize(vec: Column): Column = {
    val v = asDouble(vec)
    val norm = sqrt(aggregate(v, lit(0.0), (s, x) => s + x * x))
    when(norm === 0.0, v).otherwise(transform(v, x => x / norm))
  }

  /** Symmetric int8 quantization: scale = max|x| / 127; returns a
    * struct(scale double, q array<byte>). Kernel-rendered
    * ([[graft.functions.QuantizeInt8]]): the HOF form ran interpreted
    * with the maxAbs aggregate re-inlined into every element lambda —
    * O(dim²) per row; [[quantizeInt8Decl]] keeps that form as the
    * spec's reference twin. */
  def quantizeInt8(vec: Column): Column =
    graft.functions.GraftFunctions.quantizeInt8(asDouble(vec))

  /** Declarative reference form of [[quantizeInt8]] (spec twin only). */
  private[graft] def quantizeInt8Decl(vec: Column): Column = {
    val v = asDouble(vec)
    val maxAbs = aggregate(v, lit(0.0), (m, x) => greatest(m, abs(x)))
    val scale = when(maxAbs === 0.0, lit(1.0)).otherwise(maxAbs / 127.0)
    struct(scale.as("scale"),
      // floor(x+0.5) instead of round(): exactly-specified IEEE ops, so
      // an oracle running the same formula agrees on every boundary
      // (see graft.functions.Det)
      transform(v, x => floor(x / scale + lit(0.5)).cast("byte")).as("q"))
  }

  /** Inverse of [[quantizeInt8]]. */
  def dequantize(quantized: Column): Column =
    transform(quantized.getField("q"),
      x => x.cast("double") * quantized.getField("scale"))
}

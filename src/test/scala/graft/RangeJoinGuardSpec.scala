package graft

import org.apache.spark.sql.functions._

/** q_range_join's exactness bounds, ENFORCED not documented (r10
  * VERDICT ask #5): the unscaled-long fast path is bit-identical to
  * the old decimal(30,10) sum only while |value| < 10^8 (fits
  * decimal(18,10)) and max|uv|·n stays inside long headroom. Out of
  * range must raise — the plain cast would return NULL (a silent
  * wrong answer) and the long sum would wrap. */
class RangeJoinGuardSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.{Row, types => t}

  private def df(vals: java.lang.Double*) =
    spark.createDataFrame(
      vals.map(v => Row(v)).asJava,
      t.StructType(Seq(t.StructField("value", t.DoubleType, nullable = true))))

  test("in-range values: guarded unscaled long == decimal(30,10) scaled by 1e10") {
    val d = df(0.0, 1.5, -2.75, 9.99999999e7, -9.99999999e7, null)
    val got = d.select(SparkEntry.rangeJoinUnscaled(col("value")).as("uv"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    val want = d.select(
        graft.functions.GraftFunctions.unscaledLong(
          col("value").cast("decimal(30,10)").cast("decimal(18,10)")).as("uv"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    assert(got.toSeq == want.toSeq)
  }

  test("|value| >= 1e8 raises instead of silently NULLing") {
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    // ANSI on (the Spark 4 default): the cast itself fails loud
    val e1 = intercept[Exception] {
      df(1.0e8).select(SparkEntry.rangeJoinUnscaled(col("value"))).collect()
    }
    assert(msgs(e1).exists(m => m.contains("does not fit decimal(18,10)") ||
        m.contains("NUMERIC_VALUE_OUT_OF_RANGE")),
      s"expected a loud failure, got: $e1")
    // ANSI off: the plain cast would return NULL — the guard is what
    // turns that silent wrong answer into an error
    val key = "spark.sql.ansi.enabled"
    val old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val e2 = intercept[Exception] {
        df(1.0e8).select(SparkEntry.rangeJoinUnscaled(col("value"))).collect()
      }
      assert(msgs(e2).exists(_.contains("does not fit decimal(18,10)")),
        s"expected the fail-loud guard under ansi=false, got: $e2")
    } finally spark.conf.set(key, old)
  }

  test("per-group sum guard: inside headroom passes through, outside raises") {
    val ok = spark.range(1).select(
      SparkEntry.rangeJoinGuardedSum(lit(42L), lit(1000L), lit(10L)).as("s"))
    assert(ok.head().getLong(0) == 42L)
    // max|uv| * n ≈ 9.2e18 > the 9.0e18 guard: a sum that may have
    // wrapped must raise, not return
    val e = intercept[Exception] {
      spark.range(1).select(
        SparkEntry.rangeJoinGuardedSum(lit(0L), lit(Long.MaxValue),
          lit(1L))).collect()
    }
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).exists(_.contains("headroom exceeded")),
      s"expected the overflow guard, got: $e")
  }

  test("q_range_join has no hard-coded partition count") {
    // the fence must scale with the cluster (defaultParallelism), never
    // a local-mode literal — pin by reading the plan's repartition width
    val p = SparkEntry.queries("q_range_join")(spark, sfDir)
      .queryExecution.executedPlan.toString()
    val par = spark.sparkContext.defaultParallelism
    assert(p.contains(s"RoundRobinPartitioning($par), REPARTITION_BY_NUM"),
      s"fence must be defaultParallelism ($par):\n$p")
  }
}

package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Failed queries are reported in an "errors" map
  * (and excluded from the total) instead of being silently timed — a
  * broken query must be distinguishable from a slow one. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup pass: JIT + codegen compilation + parquet footer
    // caching would otherwise all land on the alphabetically-first query.
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") == "1")
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
      }
    val outcomes = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None }
                catch { case e: Throwable => Some(e.toString.take(200)) }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    val ok = outcomes.filter(_._3.isEmpty)
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    val qs = ok.map { case (k, v, _) => "\"" + esc(k) + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val errs = outcomes.collect { case (k, _, Some(e)) => "\"" + esc(k) + "\":\"" + esc(e) + "\"" }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** graft.plans.TopKRewrite: the row_number-over-window top-N pattern
  * must compile to the bounded-heap topk_rows aggregate (no Window, no
  * per-group sort) and produce byte-identical results to the window
  * form under a total ordering. */
class TopKRewriteSpec extends SparkSpec {

  private def withRule[T](on: Boolean)(f: => T): T = {
    spark.conf.set("spark.graft.topk.rewrite", on.toString)
    try f finally spark.conf.set("spark.graft.topk.rewrite", "true")
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def topn(k: Int): DataFrame = {
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    Tables(spark, sfDir, "lineitem")
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  test("rewrite fires: no Window in the plan, topk_rows aggregate present") {
    val p = withRule(on = true)(topn(5).queryExecution.executedPlan.toString())
    assert(!p.contains("Window"), s"Window survived the rewrite:\n$p")
    assert(p.contains("topk_rows"), p)
    assert(p.contains("partial_topk_rows"), s"partial aggregation missing:\n$p")
  }

  test("rewrite preserves results exactly (desc order, total tiebreak)") {
    val on = withRule(on = true)(rows(topn(4)))
    val off = withRule(on = false) {
      val p = topn(4).queryExecution.executedPlan.toString()
      assert(p.contains("Window"), s"control run must use the window form:\n$p")
      rows(topn(4))
    }
    assert(on == off)
  }

  test("rewrite handles nulls in the sort key like the window sort") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(3)), ("a", None), ("a", Some(1)), ("a", Some(7)), ("a", None),
      ("b", Some(5)), ("b", None), ("b", Some(2))
    ).toDF("g", "v").withColumn("id", monotonically_increasing_id())
    // Break order ties among the two nulls per group with a unique id.
    def q(d: DataFrame, asc: Boolean) = {
      val o = if (asc) col("v").asc else col("v").desc
      d.withColumn("rn", row_number().over(
          Window.partitionBy("g").orderBy(o, col("id"))))
        .filter(col("rn") <= 3)
    }
    for (asc <- Seq(true, false)) {
      val on = withRule(on = true)(rows(q(df, asc)))
      val off = withRule(on = false)(rows(q(df, asc)))
      assert(on == off, s"asc=$asc")
    }
  }

  test("whole condition is re-applied: extra conjuncts and rn equality survive") {
    val df = topn(6).filter(col("rn") > 2 && col("l_extendedprice") > 100.0)
    val on = withRule(on = true) {
      val p = df.queryExecution.executedPlan.toString()
      assert(!p.contains("Window"), p)
      rows(df)
    }
    val off = withRule(on = false)(rows(df))
    assert(on == off)
  }

  test("global top-k (no partition keys) rewrites to a global heap") {
    val w = Window.orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    def q = Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
    val on = withRule(on = true) {
      val p = q.queryExecution.executedPlan.toString()
      assert(!p.contains("Window"), p)
      rows(q)
    }
    assert(on == withRule(on = false)(rows(q)))
  }

  test("rank() is NOT rewritten (ties may exceed k rows)") {
    val w = Window.partitionBy("l_returnflag").orderBy(col("l_quantity"))
    val df = Tables(spark, sfDir, "lineitem")
      .withColumn("r", rank().over(w)).filter(col("r") <= 3)
    val p = withRule(on = true)(df.queryExecution.executedPlan.toString())
    assert(p.contains("Window"), p)
  }

  test("multi-expression Window is NOT rewritten") {
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val df = Tables(spark, sfDir, "lineitem")
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
      .withColumn("rn", row_number().over(w))
      .withColumn("mx", max("l_extendedprice").over(
        Window.partitionBy("l_returnflag")))
      .filter(col("rn") <= 3)
    val p = withRule(on = true)(df.queryExecution.executedPlan.toString())
    assert(p.contains("Window"), p)
    // ... and results still correct through the mixed plan.
    assert(withRule(on = true)(rows(df)) == withRule(on = false)(rows(df)))
  }

  test("k above spark.graft.topk.rewrite.maxK is NOT rewritten") {
    spark.conf.set("spark.graft.topk.rewrite.maxK", "3")
    try {
      val p = topn(5).queryExecution.executedPlan.toString()
      assert(p.contains("Window"), p)
      val p2 = topn(3).queryExecution.executedPlan.toString()
      assert(!p2.contains("Window"), p2)
    } finally spark.conf.unset("spark.graft.topk.rewrite.maxK")
  }

  test("seeded differential sweep: random data/orderings/k, rule on == rule off") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    val n = 3000
    val data = (0 until n).map { i =>
      (i.toLong,
       s"g${rnd.nextInt(7)}",
       if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(50)),
       rnd.nextDouble() * 100,
       s"s${rnd.nextInt(1000)}")
    }
    val df = data.toDF("id", "g", "v", "d", "s")
    for (trial <- 0 until 8) {
      val k = 1 + rnd.nextInt(12)
      val keys = rnd.shuffle(List(col("v"), col("d"), col("s"))).take(1 + rnd.nextInt(2))
        .map(c => if (rnd.nextBoolean()) c.desc else c.asc) :+ col("id").asc // total order
      val w = Window.partitionBy("g").orderBy(keys: _*)
      def q = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      val on = withRule(on = true)(rows(q))
      val off = withRule(on = false)(rows(q))
      assert(on == off, s"trial $trial k=$k keys=$keys")
    }
  }

  test("downstream operators resolve against restored attributes") {
    val agg = topn(3).groupBy("l_returnflag")
      .agg(sum("l_extendedprice").as("s"), max("rn").as("m"))
    val on = withRule(on = true)(rows(agg))
    val off = withRule(on = false)(rows(agg))
    assert(on == off)
  }
}

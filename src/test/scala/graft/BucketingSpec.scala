package graft

import org.apache.spark.sql.functions._
import graft.sources.{Bucketing, Tables}

class BucketingSpec extends SparkSpec {

  test("co-located join over bucketed tables plans without a shuffle") {
    val orders = Tables(spark, sfDir, "orders")
      .select(col("o_orderkey").as("k"), col("o_totalprice"))
    val lineitem = Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    // clear catalog entries AND stale warehouse dirs from failed runs
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get("spark-warehouse", t)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    Bucketing.writeBucketed(orders, "b_orders", "k", 8)
    Bucketing.writeBucketed(lineitem, "b_lineitem", "k", 8)

    // Force the sort-merge path (tiny test tables would otherwise
    // auto-broadcast, which hides the bucketing effect being proven).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.coLocatedJoin(spark, "b_lineitem", "b_orders", "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle, got:\n$plan")

      // and the result matches the plain (shuffling) join
      val want = lineitem.join(orders, "k").count()
      assert(joined.count() == want)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }
}

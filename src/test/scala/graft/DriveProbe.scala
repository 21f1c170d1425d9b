package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch probe: does SparkEntry.materialize run heavy stages twice
  * vs df.count()? Prints per-drive stage (id, tasks, shuffleReadMB). */
object DriveProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Double)]
    val jobs = scala.collection.mutable.ArrayBuffer.empty[(Int, Seq[Int], String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        stages += ((i.stageId, i.numTasks,
          i.taskMetrics.shuffleReadMetrics.totalBytesRead / 1e6))
      }
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += ((e.jobId, e.stageInfos.map(_.stageId).toSeq,
          Option(e.properties.getProperty("spark.job.description")).getOrElse("").take(60)))
    })
    val dir = args(0)
    def q() = SparkEntry.queries("q_quantiles")(spark, dir)
    stages.clear()
    q().count()
    Thread.sleep(500)
    println("count():      " + stages.sortBy(_._1).mkString(" "))
    stages.clear(); jobs.clear()
    SparkEntry.materialize(q())
    Thread.sleep(500)
    println("materialize: " + stages.sortBy(_._1).mkString(" "))
    jobs.foreach(j => println("job " + j))
    spark.stop()
  }
}

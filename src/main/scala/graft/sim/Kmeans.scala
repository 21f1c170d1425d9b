package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One deterministic Lloyd (k-means) iteration over the embedding
  * corpus — the distributed TRAINING step behind every learned
  * quantizer in this engine ([[Ann.ivfLearned]]'s MLlib fit runs
  * exactly this assignment/update loop internally). Spelled out
  * Spark-first and bit-pinnable:
  *
  *  - init: the k lowest-id corpus vectors (deterministic, like
  *    [[Pq.codebook]]) — a bounded 1-row broadcast;
  *  - assignment: per vector, argmin of the integer-micro squared L2
  *    to each centroid (micro-unit longs → comparisons are
  *    integer-exact across engines; ties → lowest centroid index) —
  *    pure scan-stage expression, no shuffle;
  *  - update: per-(cluster, dimension) mean via DECIMAL-EXACT sums
  *    (partition-order-independent) divided as a double through the
  *    repo's one rounding formula.
  *
  * Scale shape: the only shuffle is the (cluster, dim) partial
  * aggregate — k×dim output rows; iterating = re-broadcasting the
  * k×dim result as the next init. At 100 TB this is exactly
  * map-side-combined mean aggregation, the canonical distributed
  * k-means. Returns (cluster, dim [1-based], n, mean). */
object Kmeans {

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Integer-micro squared L2 over the full vector (deterministic
    * left fold, ×1e6, half-up — see graft.functions.Det). */
  private def microDist(a: Column, b: Column, dim: Int): Column =
    floor(aggregate(sequence(lit(1), lit(dim)), lit(0.0), (acc, j) => {
      val d = element_at(a, j.cast("int")) - element_at(b, j.cast("int"))
      acc + d * d
    }) * 1000000.0 + 0.5).cast("long")

  def lloydIteration(corpus: DataFrame, idCol: String, vecCol: String,
                     k: Int, dim: Int): DataFrame = {
    require(k >= 2, s"kmeans: need k >= 2, got $k")
    val parts = corpus.sparkSession.sparkContext.defaultParallelism
    val cents = corpus.orderBy(col(idCol)).limit(k)
      .select(struct(col(idCol).cast("long").as("id"),
        asDouble(col(vecCol)).as("v")).as("e"))
      .groupBy()
      .agg(array_sort(collect_list(col("e"))).as("es"))
      .select(transform(col("es"), e => e.getField("v")).as("cb"))
    val assigned = corpus.repartition(parts)
      .select(col(idCol), asDouble(col(vecCol)).as("__v"))
      .crossJoin(broadcast(cents))
      .select(col(idCol), col("__v"),
        array_min(zip_with(col("cb"),
          sequence(lit(0), size(col("cb")) - 1),
          (cvec, cid) => struct(microDist(col("__v"), cvec, dim).as("d"),
            cid.as("cid"))))
          .getField("cid").as("cluster"))
    assigned
      .select(col("cluster"), posexplode(col("__v")).as(Seq("pos", "x")))
      .groupBy(col("cluster"), (col("pos") + 1).cast("long").as("dim"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("x").cast("decimal(30,15)")).as("__s"))
      .select(col("cluster"), col("dim"), col("n"),
        graft.functions.Det.round(col("__s").cast("double") / col("n"), 6).as("mean"))
  }
}

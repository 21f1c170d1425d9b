package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus a feature-extraction stage
  * whose Spark-side shape (schema, partitioning, per-partition batching)
  * is real while the codec itself is a deterministic stub (no
  * image/audio libraries in this container — see SURVEY.md §5).
  *
  * Scale notes: metadata extraction is per-row expressions in the scan
  * stage. Feature extraction is `mapPartitions` over a typed Dataset —
  * one JVM-side batch loop per partition (the same shape a JNI/codec
  * call would need), no driver collect, partition count preserved.
  */
object Binary {

  /** Payload + typed metadata: byte size, sha256, declared mime. The
    * binary column is carried opaque — never decoded in this stage. */
  def withMeta(df: DataFrame, idCol: String, payloadTextCol: String): DataFrame =
    df.select(
      col(idCol),
      encode(col(payloadTextCol), "UTF-8").as("payload"),
      octet_length(encode(col(payloadTextCol), "UTF-8")).cast("long").as("n_bytes"),
      sha2(col(payloadTextCol), 256).as("sha256"),
      lit("text/plain").as("mime"))

  final case class MMRecord(id: Long, payload: Array[Byte])
  final case class MMFeatures(id: Long, n_bytes: Long, features: Array[Float])

  /** STUB decode: a real implementation would hand `payload` to an image
    * or audio codec here. Deterministic fake: 16-bin byte-value
    * histogram, L1-normalized — stable across runs and partitions. */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < payload.length) { hist((payload(i) & 0xFF) >> 4) += 1f; i += 1 }
    val total = math.max(payload.length, 1).toFloat
    hist.map(_ / total)
  }

  /** Feature extraction over binary payloads: typed Dataset →
    * mapPartitions (batch shape: the iterator IS the batch; a codec
    * binding would buffer fixed-size chunks the same way). */
  def extractFeatures(spark: SparkSession, df: DataFrame, idCol: String,
                      payloadCol: String): Dataset[MMFeatures] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).as("payload"))
      .as[MMRecord]
      .mapPartitions { it =>
        it.map { rec =>
          MMFeatures(rec.id, rec.payload.length.toLong, decodeStub(rec.payload))
        }
      }
  }
}

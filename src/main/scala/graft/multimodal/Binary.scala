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

  /** Shared typed projection for the five binary stages. Rejects
    * non-integral id columns at construction (a string id would fail
    * opaquely inside the encoder mid-job); ids must also be non-null —
    * that contract lives in the data model (doc_id is a key). */
  private def typedRecords(spark: SparkSession, df: DataFrame, idCol: String,
                           payloadCol: String): Dataset[MMRecord] = {
    import spark.implicits._
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    val dt = df.select(col(idCol)).schema.head.dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"multimodal stage: id column '$idCol' must be an integral type, got $dt")
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).as("payload"))
      .as[MMRecord]
  }

  /** Null payloads (a null source column) are empty payloads, not NPEs. */
  private def nz(p: Array[Byte]): Array[Byte] =
    if (p == null) Array.emptyByteArray else p

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
    typedRecords(spark, df, idCol, payloadCol)
      .mapPartitions { it =>
        it.map { rec =>
          val p = nz(rec.payload)
          MMFeatures(rec.id, p.length.toLong, decodeStub(p))
        }
      }
  }

  // ---- image header metadata (REAL parsing — headers need no codec) ----

  final case class ImageMeta(format: String, width: Int, height: Int)

  // hoisted out of the per-row hot path
  private val DibHeaderSizes = Set(12, 40, 52, 56, 64, 108, 124)

  /** Parse image dimensions from the container header bytes. PNG IHDR,
    * GIF logical-screen descriptor, JPEG SOF0/1/2 markers, and the BMP
    * DIB header carry the dimensions in the first bytes of the file —
    * no decoder library is required, so unlike the pixel pipeline this
    * is NOT a stub. Returns null for non-image/unknown payloads. */
  def imageMeta(payload: Array[Byte]): ImageMeta = {
    if (payload == null) return null
    def u8(i: Int): Int = payload(i) & 0xFF
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Int = (be16(i) << 16) | be16(i + 2)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Int = le16(i) | (le16(i + 2) << 16)
    if (payload.length >= 26 && u8(0) == 'B' && u8(1) == 'M' &&
        // DIB header size field distinguishes real BMPs from text
        // payloads starting with "BM"
        DibHeaderSizes.contains(le32(14))) {
      if (le32(14) == 12) ImageMeta("bmp", le16(18), le16(20)) // BITMAPCOREHEADER
      else ImageMeta("bmp", le32(18), math.abs(le32(22)))      // height<0 = top-down
    }
    else if (payload.length >= 24 &&
        // full 8-byte signature AND the IHDR tag (the spec guarantees
        // IHDR is the first chunk) — 4 signature bytes alone would
        // accept any crafted/corrupt payload and return garbage dims
        u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G' &&
        u8(4) == 0x0D && u8(5) == 0x0A && u8(6) == 0x1A && u8(7) == 0x0A &&
        u8(12) == 'I' && u8(13) == 'H' && u8(14) == 'D' && u8(15) == 'R')
      ImageMeta("png", be32(16), be32(20))
    else if (payload.length >= 10 &&
        u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F' && u8(3) == '8' &&
        (u8(4) == '7' || u8(4) == '9') && u8(5) == 'a')
      // Full 6-byte signature (GIF87a/GIF89a) — a bare 'GIF' prefix
      // also matches text payloads. GIF is little-endian.
      ImageMeta("gif", u8(6) | (u8(7) << 8), u8(8) | (u8(9) << 8))
    else if (payload.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8) {
      // JPEG: walk the marker segments to the first SOF0/1/2
      var i = 2
      // bounds are exact: the farthest read of an SOF hit at marker
      // position j is u8(j+7), so j+8 <= length suffices (a header
      // truncated exactly after the SOF width bytes still parses)
      while (i + 9 <= payload.length) {
        if (u8(i) != 0xFF) return null
        // 0xFF bytes may repeat as fill/padding before the marker byte
        var j = i + 1
        while (j < payload.length && u8(j) == 0xFF) j += 1
        if (j + 8 > payload.length) return null
        val marker = u8(j)
        if (marker == 0xC0 || marker == 0xC1 || marker == 0xC2)
          return ImageMeta("jpeg", be16(j + 6), be16(j + 4))
        // skip standalone markers (D0-D9 have no length field)
        if (marker >= 0xD0 && marker <= 0xD9) i = j + 1
        else {
          val len = be16(j + 1)
          if (len < 2) return null // corrupt segment — refuse to loop
          i = j + 1 + len
        }
      }
      null
    } else null
  }

  final case class AudioMeta(format: String, channels: Int, sampleRate: Int,
                             bitsPerSample: Int, durationMs: Long)

  /** Parse WAV (RIFF/WAVE) audio metadata from the container header:
    * channel count, sample rate, and bit depth from the fmt chunk,
    * duration from the data chunk size and byte rate. Real parsing —
    * headers need no codec. Returns null for non-WAV payloads. */
  def audioMeta(payload: Array[Byte]): AudioMeta = {
    def u8(i: Int): Int = payload(i) & 0xFF
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long = (le16(i) | (le16(i + 2).toLong << 16)) & 0xFFFFFFFFL
    def tag(i: Int): String = new String(payload.slice(i, i + 4), "US-ASCII")
    if (payload == null || payload.length < 44 ||
        tag(0) != "RIFF" || tag(8) != "WAVE") return null
    var i = 12L
    var channels, rate, bits = 0
    var byteRate = 0L
    var dataSize = -1L
    while (i + 8 <= payload.length) {
      val ii = i.toInt
      val id = tag(ii)
      val sz = le32(ii + 4) // unsigned — kept as Long so a corrupt size
                            // can never advance i by <= 0 (infinite loop)
      // sz >= 16: a truncated fmt chunk must not read the NEXT chunk's
      // bytes as channels/rate/bits (plausible-looking garbage)
      if (id == "fmt " && sz >= 16 && i + 24 <= payload.length) {
        channels = le16(ii + 10); rate = le32(ii + 12).toInt
        byteRate = le32(ii + 16); bits = le16(ii + 22)
      } else if (id == "data") dataSize = sz
      // chunks are word-aligned: odd sizes carry a pad byte
      i += 8L + sz + (sz & 1L)
    }
    if (channels == 0 || rate == 0) null
    else AudioMeta("wav", channels, rate, bits,
      if (dataSize >= 0 && byteRate > 0) dataSize * 1000 / byteRate else -1L)
  }

  /** Image metadata stage: header-parsed format/width/height beside the
    * byte-level metadata. Per-row work in the scan stage (mapPartitions
    * over the typed rows — same shape as extractFeatures). */
  def withImageMeta(spark: SparkSession, df: DataFrame, idCol: String,
                    payloadCol: String): DataFrame = {
    import spark.implicits._
    typedRecords(spark, df, idCol, payloadCol)
      .map { rec =>
        val p = nz(rec.payload)
        val m = Option(imageMeta(p))
        (rec.id, p.length.toLong,
          m.map(_.format).orNull,
          m.map(_.width).getOrElse(-1), m.map(_.height).getOrElse(-1))
      }
      .toDF("id", "n_bytes", "format", "width", "height")
  }

  /** Audio metadata stage: header-parsed WAV format/channels/rate/
    * duration beside the byte length — same per-row typed-map shape as
    * [[withImageMeta]]. Non-audio payloads yield null format and -1
    * numerics. */
  def withAudioMeta(spark: SparkSession, df: DataFrame, idCol: String,
                    payloadCol: String): DataFrame = {
    import spark.implicits._
    typedRecords(spark, df, idCol, payloadCol)
      .map { rec =>
        val p = nz(rec.payload)
        val m = Option(audioMeta(p))
        (rec.id, p.length.toLong,
          m.map(_.format).orNull,
          m.map(_.channels).getOrElse(-1),
          m.map(_.sampleRate).getOrElse(-1),
          m.map(_.durationMs).getOrElse(-1L))
      }
      .toDF("id", "n_bytes", "format", "channels", "sample_rate", "duration_ms")
  }

  final case class Resized(id: Long, width: Int, height: Int, thumb: Array[Byte])

  /** STUB resize: a real implementation would decode, scale, re-encode
    * here. The Spark-side shape is real — typed mapPartitions keeping
    * partitioning, fixed output schema; the deterministic fake keeps
    * every `stride`-th byte so output size tracks the scale factor. */
  def resizeStub(spark: SparkSession, df: DataFrame, idCol: String,
                 payloadCol: String, targetW: Int, targetH: Int): Dataset[Resized] = {
    import spark.implicits._
    require(targetW > 0 && targetH > 0)
    // Long product: 65536x65536 (valid Ints) overflows Int to 0 and
    // would silently invert the stride to keep-one-byte.
    val targetBytes = math.max(targetW.toLong * targetH.toLong, 1L)
    typedRecords(spark, df, idCol, payloadCol)
      .mapPartitions { it =>
        it.map { rec =>
          val p = nz(rec.payload)
          val stride = math.max(p.length / targetBytes, 1L).toInt
          // keep every stride-th byte: tight while loop, no boxing —
          // this is the per-row hot path (same style as decodeStub)
          val thumb = new Array[Byte]((p.length + stride - 1) / stride)
          var i = 0
          var o = 0
          while (i < p.length) { thumb(o) = p(i); o += 1; i += stride }
          Resized(rec.id, targetW, targetH, thumb)
        }
      }
  }

  final case class Frame(id: Long, frame_idx: Int, offset: Long, frame: Array[Byte])

  /** STUB frame sampling (video → n frames): splits the payload into n
    * equal byte ranges — one output row per "frame", the row-explosion
    * shape a real demuxer produces. flatMap keeps the work distributed
    * and the output schema fixed. Empty/null payloads emit NO rows (a
    * demuxer finds no frames) — the same rule as [[sampleFrames]]. */
  def frameSampleStub(spark: SparkSession, df: DataFrame, idCol: String,
                      payloadCol: String, nFrames: Int): Dataset[Frame] = {
    import spark.implicits._
    require(nFrames > 0)
    typedRecords(spark, df, idCol, payloadCol)
      .flatMap { rec =>
        val p = nz(rec.payload)
        val n = math.min(nFrames, p.length) // 0 for an empty payload
        val step = if (n == 0) 1 else math.max(p.length / n, 1)
        (0 until n).iterator.map { f =>
          val from = f * step
          val until = if (f == n - 1) p.length else math.min((f + 1) * step, p.length)
          Frame(rec.id, f, from.toLong,
            java.util.Arrays.copyOfRange(p, from, math.max(until, from)))
        }
      }
  }

  /** Declarative, ORACLE-VERIFIABLE twin of [[frameSampleStub]]: emit
    * `frames` evenly spaced fixed-width byte windows per payload — one
    * row per frame with its content hash instead of the raw bytes (a
    * hex string survives every engine's row canonicalizer; raw binary
    * does not). Offsets are integer-exact
    * (`off(i) = i·(n−w) div (frames−1)`), so the window placement is
    * engine-portable with no double arithmetic; NON-EMPTY payloads
    * shorter than one window emit a single frame 0, empty/null
    * payloads emit no rows (the same rule as [[frameSampleStub]] — a
    * demuxer finds no frames). Pure scan-stage codegen — the explode
    * fans out rows, never partitions. */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String,
                   frames: Int = 4, window: Int = 64): DataFrame = {
    require(frames >= 1, s"frames must be >= 1, got $frames")
    require(window >= 1, s"window must be >= 1, got $window")
    df.select(col(idCol), col(payloadCol).as("__p"),
        octet_length(col(payloadCol)).cast("long").as("__n"))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__p"), col("__n"),
        explode(sequence(lit(0L), lit((frames - 1).toLong))).as("frame_idx"))
      .filter(col("__n") > window || col("frame_idx") === 0L)
      .withColumn("off",
        when(col("__n") <= window, lit(0L))
          .otherwise(expr(s"(frame_idx * (__n - $window)) div ${math.max(frames - 1, 1)}")))
      .select(col(idCol), col("frame_idx"), col("off"),
        md5(expr(s"substr(__p, off + 1, $window)")).as("frame_md5"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed rows for the codec stages (case-class Encoders keep
  * `Dataset.mapPartitions` inside Catalyst — a `.rdd` round-trip would cut
  * the plan in two and drop codegen/AQE across the boundary). */
private[operators] case class MediaPayload(media_id: Long, content: Array[Byte])
private[operators] case class MediaFeatures(media_id: Long, features: Array[Float])
private[operators] case class MediaFrame(media_id: Long, frame_index: Int, frame: Array[Byte])

/** Multimodal-column plumbing for training-data pipelines.
  *
  * Media (image/audio/video) travel as opaque `binary` columns with a typed
  * metadata struct. Decode / feature-extraction runs per-partition in
  * fixed-size batches via `mapPartitions` (the Scala analogue of
  * `mapInPandas`): the executor-side loop, batch shape, output schema, and
  * partitioning are real; only the innermost decode call is STUBBED with a
  * deterministic fake, because no image/audio codec libraries exist in this
  * environment. Swapping `FakeCodec` for a real JNI/Java codec changes no
  * plan shape.
  */
object Multimodal {

  /** Typed metadata carried alongside the opaque payload. */
  val MetaType: StructType = StructType(Seq(
    StructField("kind", StringType),        // "image" | "audio" | "video"
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", LongType)))

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType),
    StructField("meta", MetaType)))

  /** Synthesize a media table from any (id, text) frame — deterministic
    * payload bytes so pipelines are testable without real media. */
  def syntheticMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("content"),
      struct(
        when(col(idCol) % 3 === 0, "image").when(col(idCol) % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        (col(idCol) % 1920 + 1).cast("int").as("width"),
        (col(idCol) % 1080 + 1).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (length(col(textCol)) * 10).cast("long").as("duration_ms")).as("meta"))

  /** ======== STUB ========
    * Deterministic fake decoder: derives `dims` pseudo-features from the
    * payload bytes. A real implementation would decode the image/audio here
    * (e.g. via a JNI codec) and emit true features; everything around this
    * function — batching, schema, null handling — is production-shaped. */
  private[operators] object FakeCodec {
    def decodeToFeatures(bytes: Array[Byte], dims: Int): Array[Float] = {
      if (bytes == null) return null
      val out = new Array[Float](dims)
      var h = 1125899906842597L // deterministic rolling hash of the payload
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      var d = 0
      while (d < dims) {
        val x = h ^ (0x9E3779B97F4A7C15L * (d + 1))
        // xorshift mix → [-1, 1)
        var z = x
        z ^= z >>> 33; z *= 0xFF51AFD7ED558CCDL; z ^= z >>> 33
        out(d) = (z.toDouble / Long.MaxValue).toFloat
        d += 1
      }
      out
    }

    /** STUB resize: a real codec would re-encode; the fake just truncates. */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      if (bytes == null) null else bytes.take(math.max(16, (w * h) % 4096))

    /** STUB frame sampling: returns byte-slices standing in for frames. */
    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] =
      if (bytes == null || bytes.isEmpty) Nil
      else (0 until n).map(i => bytes.drop((bytes.length * i) / n).take(64))
  }

  private val FeatureBatchSize = 64 // rows decoded per executor-side batch

  /** Decode payloads to feature vectors: per-partition, fixed-size batches,
    * stable output schema (media_id, features array<float>). Typed
    * `Dataset.mapPartitions` keeps this a single Catalyst plan node (no
    * `.rdd` boundary); at scale it is one narrow stage — no shuffle;
    * repartition upstream to balance codec cost if payload sizes are
    * skewed. */
  def extractFeatures(media: DataFrame, dims: Int = 64): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("content")).as[MediaPayload]
      .mapPartitions { it =>
        it.grouped(FeatureBatchSize).flatMap { batch =>
          // batch boundary = where a real codec would amortize setup cost
          batch.iterator.map(m =>
            MediaFeatures(m.media_id, FakeCodec.decodeToFeatures(m.content, dims)))
        }
      }
      .toDF()
  }

  /** Resize stage (STUB codec, real plumbing). */
  def resizeMedia(media: DataFrame, width: Int, height: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("content")).as[MediaPayload]
      .mapPartitions(_.map(m => MediaPayload(m.media_id, FakeCodec.resize(m.content, width, height))))
      .toDF()
  }

  /** Frame-sampling stage for video payloads (STUB codec, real plumbing):
    * emits (media_id, frame_index, frame_bytes). */
  def sampleFrames(media: DataFrame, framesPerVideo: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("content")).as[MediaPayload]
      .mapPartitions(_.flatMap { m =>
        FakeCodec.sampleFrames(m.content, framesPerVideo).zipWithIndex.map {
          case (frame, idx) => MediaFrame(m.media_id, idx, frame)
        }
      })
      .toDF()
  }
}

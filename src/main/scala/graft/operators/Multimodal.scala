package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed rows for the codec stages (case-class Encoders keep
  * `Dataset.mapPartitions` inside Catalyst — a `.rdd` round-trip would cut
  * the plan in two and drop codegen/AQE across the boundary). */
private[operators] case class MediaPayload(media_id: Long, content: Array[Byte])
private[operators] case class MediaFeatures(media_id: Long, features: Array[Float])
private[operators] case class MediaFrame(media_id: Long, frame_index: Int, frame: Array[Byte])
private[operators] case class StillVariant(media_id: Long, base_id: Long, bump: Int)
private[operators] case class MediaHash(media_id: Long, phash: Long)
private[operators] case class VideoFrameHash(media_id: Long, frame: Int, phash: Long)
private[operators] case class MediaStats(
    media_id: Long, kind: String, width: Int, height: Int,
    n_frames: Int, n_samples: Long,
    value_sum: Long, value_min: Long, value_max: Long)

/** Multimodal-column plumbing for training-data pipelines.
  *
  * Media (image/audio/video) travel as opaque `binary` columns; decode /
  * feature-extraction runs per-partition in fixed-size batches via
  * `mapPartitions` (the Scala analogue of `mapInPandas`). The codecs are
  * REAL and JDK-native — no external dependencies:
  *
  *   - image: PNG via `javax.imageio.ImageIO` (lossless, so decoded pixels
  *     are bit-exact whatever bytes the encoder emitted);
  *   - audio: WAV/PCM16 via `javax.sound.sampled.AudioSystem`;
  *   - video: a minimal length-prefixed container of PNG frames (magic
  *     "GVC1") — the JDK has no video codec, so frames are first-class and
  *     the container itself is the decode surface.
  *
  * Payload kinds are sniffed from magic bytes (PNG signature / RIFF‑WAVE /
  * GVC1), the way a real codec stage dispatches — no metadata column is
  * needed to decode.
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

  /** Synthesize a media-METADATA table from any (id, text) frame — pure
    * column algebra (payload = text bytes), used by the metadata-plumbing
    * driver query whose oracle mirrors the arithmetic exactly. For real
    * encoded payloads use [[syntheticEncodedMedia]]. */
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

  // ---------------------------------------------------------------------
  // JDK-native codec
  // ---------------------------------------------------------------------

  /** Real encode/decode built entirely on the JDK: `ImageIO` for PNG,
    * `AudioSystem` for WAV, plus the GVC1 frame container. Everything here
    * runs executor-side inside the mapPartitions stages. */
  private[operators] object JdkCodec {
    // ImageIO defaults to a DISK-backed stream cache: every encode/decode
    // creates (and deletes) a temp file. All our streams are in-memory
    // byte arrays, so the file round trip is pure overhead — per-image,
    // on every executor thread.
    ImageIO.setUseCache(false)

    private val VideoMagic: Array[Byte] = Array('G', 'V', 'C', '1').map(_.toByte)

    // AudioSystem.getAudioInputStream / AudioSystem.write route every call
    // through a GLOBAL `synchronized` provider lookup (JDK13Services), so
    // 32 executor threads hammering 40k clips serialize on one monitor —
    // measured: the audio fingerprint sweep ran SUPERLINEAR (ratio ~5-10
    // at 8× data) until the providers were resolved ONCE here and invoked
    // directly. Same SPI implementations, same bytes — only the per-call
    // global lock is gone.
    private lazy val audioReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
      import scala.jdk.CollectionConverters._
      java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader])
        .iterator().asScala.toSeq
    }
    private lazy val wavWriter: javax.sound.sampled.spi.AudioFileWriter = {
      import scala.jdk.CollectionConverters._
      java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileWriter])
        .iterator().asScala
        .find(_.isFileTypeSupported(AudioFileFormat.Type.WAVE))
        .getOrElse(throw new IllegalStateException("no WAVE AudioFileWriter on this JDK"))
    }

    def encodePng(img: BufferedImage): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    def decodePng(bytes: Array[Byte]): BufferedImage =
      ImageIO.read(new ByteArrayInputStream(bytes))

    /** PCM16 mono little-endian samples → a complete WAV (RIFF) stream. */
    def encodeWav(samples: Array[Short], sampleRate: Float): Array[Byte] = {
      val data = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        data(2 * i) = (samples(i) & 0xFF).toByte
        data(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
        i += 1
      }
      val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
      val ais = new AudioInputStream(
        new ByteArrayInputStream(data), fmt, samples.length.toLong)
      val bos = new ByteArrayOutputStream()
      wavWriter.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** WAV stream → PCM16 samples (via the JDK's real AudioFileReader SPI,
      * not manual RIFF parsing — the decode path exercises the real audio
      * stack; the provider is resolved once, see [[audioReaders]]). */
    def decodeWav(bytes: Array[Byte]): Array[Short] = {
      val ais = audioReaders.iterator.flatMap { r =>
        try Some(r.getAudioInputStream(new ByteArrayInputStream(bytes)))
        catch { case _: javax.sound.sampled.UnsupportedAudioFileException => None }
      }.nextOption().getOrElse(
        throw new javax.sound.sampled.UnsupportedAudioFileException(
          "no provider could decode the stream"))
      try {
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
          s"expected PCM16 mono, got $fmt")
        val data = ais.readAllBytes()
        val out = new Array[Short](data.length / 2)
        var i = 0
        if (fmt.isBigEndian)
          while (i < out.length) {
            out(i) = (((data(2 * i) & 0xFF) << 8) | (data(2 * i + 1) & 0xFF)).toShort
            i += 1
          }
        else
          while (i < out.length) {
            out(i) = (((data(2 * i + 1) & 0xFF) << 8) | (data(2 * i) & 0xFF)).toShort
            i += 1
          }
        out
      } finally ais.close()
    }

    /** PNG frames → GVC1 container: magic, 4-byte big-endian frame count,
      * then per frame a 4-byte length + the PNG bytes. */
    def packFrames(frames: Seq[Array[Byte]]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      bos.write(VideoMagic)
      writeInt(bos, frames.length)
      frames.foreach { f => writeInt(bos, f.length); bos.write(f) }
      bos.toByteArray
    }

    def unpackFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
      require(isVideo(bytes), "not a GVC1 container")
      val n = readInt(bytes, 4)
      var off = 8
      (0 until n).map { _ =>
        val len = readInt(bytes, off)
        val frame = java.util.Arrays.copyOfRange(bytes, off + 4, off + 4 + len)
        off += 4 + len
        frame
      }
    }

    private def writeInt(bos: ByteArrayOutputStream, v: Int): Unit = {
      bos.write((v >>> 24) & 0xFF); bos.write((v >>> 16) & 0xFF)
      bos.write((v >>> 8) & 0xFF); bos.write(v & 0xFF)
    }

    private def readInt(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
        ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)

    def isPng(b: Array[Byte]): Boolean =
      b != null && b.length > 8 &&
        b(0) == 0x89.toByte && b(1) == 'P'.toByte && b(2) == 'N'.toByte && b(3) == 'G'.toByte

    def isWav(b: Array[Byte]): Boolean =
      b != null && b.length > 12 &&
        b(0) == 'R'.toByte && b(1) == 'I'.toByte && b(2) == 'F'.toByte && b(3) == 'F'.toByte &&
        b(8) == 'W'.toByte && b(9) == 'A'.toByte && b(10) == 'V'.toByte && b(11) == 'E'.toByte

    def isVideo(b: Array[Byte]): Boolean =
      b != null && b.length > 8 &&
        b(0) == VideoMagic(0) && b(1) == VideoMagic(1) &&
        b(2) == VideoMagic(2) && b(3) == VideoMagic(3)
  }

  // ---------------------------------------------------------------------
  // Deterministic synthetic encoded payloads
  // ---------------------------------------------------------------------

  /** Channel formulas for the synthetic pixels/samples — shared between the
    * executor-side generator and the DuckDB oracle (which mirrors them with
    * generate_series over the same ranges). All arithmetic is small-integer
    * exact. Frame index enters the image formulas as `fr` (0 for stills). */
  private[operators] object Synthetic {
    def imageW(id: Long): Int = (id % 13 + 4).toInt   // 4..16
    def imageH(id: Long): Int = (id % 11 + 4).toInt   // 4..14
    def red(id: Long, x: Int, y: Int, fr: Int): Int =
      ((id * 7 + x * 13 + y * 31 + fr * 97) % 256).toInt
    def green(id: Long, x: Int, y: Int, fr: Int): Int =
      ((id * 11 + x * 3 + y * 17 + fr * 89) % 256).toInt
    def blue(id: Long, x: Int, y: Int, fr: Int): Int =
      ((id * 5 + x * 29 + y * 7 + fr * 83) % 256).toInt
    def audioN(id: Long): Int = (id % 96 + 32).toInt  // 32..127 samples
    def sample(id: Long, i: Int): Int = ((id * 31 + i * 173) % 65536).toInt - 32768
    def videoFrames(id: Long): Int = (id % 3 + 2).toInt // 2..4 frames

    def image(id: Long, fr: Int): BufferedImage = {
      val (w, h) = (imageW(id), imageH(id))
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y,
            (red(id, x, y, fr) << 16) | (green(id, x, y, fr) << 8) | blue(id, x, y, fr))
          x += 1
        }
        y += 1
      }
      img
    }
  }

  /** Synthesize REAL encoded payloads per id — PNG stills (id ≡ 0 mod 3),
    * WAV clips (≡ 1), GVC1 PNG-frame containers (≡ 2); content is a pure
    * function of the id, so decode-side statistics have closed-form
    * oracles. Encoding runs executor-side (one narrow stage). */
  def syntheticEncodedMedia(df: DataFrame, idCol: String): DataFrame = {
    import df.sparkSession.implicits._
    // The id projection prunes to a few bytes per row, so the scan often
    // collapses to ONE input partition — which would serialize every codec
    // call behind a single thread. Shuffling bare longs across all cores
    // costs nothing next to the encode work it parallelizes.
    df.select(col(idCol).cast("long").as("media_id")).as[Long]
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .mapPartitions(_.map { id =>
        val bytes = (id % 3) match {
          case 0 => JdkCodec.encodePng(Synthetic.image(id, 0))
          case 1 =>
            val n = Synthetic.audioN(id)
            JdkCodec.encodeWav(
              Array.tabulate(n)(i => Synthetic.sample(id, i).toShort), 16000f)
          case _ =>
            JdkCodec.packFrames(
              (0 until Synthetic.videoFrames(id)).map(fr =>
                JdkCodec.encodePng(Synthetic.image(id, fr))))
        }
        MediaPayload(id, bytes)
      })
      .toDF()
  }

  /** Synthesize REAL PNG stills with a controlled perturbation — the
    * near-duplicate test corpus for perceptual hashing: each input row
    * (mediaIdCol, baseIdCol, bumpCol) encodes `Synthetic.image(base_id, 0)`
    * with the red channel of pixel (0,0) shifted by +bump (mod 256).
    * bump = 0 reproduces the base still; a small bump is the classic
    * one-pixel edit that perceptual hashing must land within a few Hamming
    * bits of its original. Encoding runs executor-side (narrow stage). */
  def syntheticStillVariants(df: DataFrame, mediaIdCol: String,
      baseIdCol: String, bumpCol: String): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(mediaIdCol).cast("long").as("media_id"),
        col(baseIdCol).cast("long").as("base_id"),
        col(bumpCol).cast("int").as("bump")).as[StillVariant]
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .mapPartitions(_.map { v =>
        val img = Synthetic.image(v.base_id, 0)
        if (v.bump != 0) {
          val rgb = img.getRGB(0, 0)
          val r = (((rgb >> 16) & 0xFF) + v.bump) & 0xFF
          img.setRGB(0, 0, (r << 16) | (rgb & 0x00FFFF))
        }
        MediaPayload(v.media_id, JdkCodec.encodePng(img))
      })
      .toDF()
  }

  /** Synthesize REAL GVC1 video payloads with a controlled perturbation —
    * the video near-duplicate test corpus, the [[syntheticStillVariants]]
    * discipline per frame: each input row (mediaIdCol, baseIdCol, bumpCol)
    * packs `Synthetic.image(base_id, fr)` PNG frames for every fr, with
    * frame 0's pixel (0,0) red channel shifted by +bump (mod 256) — the
    * one-frame edit a frame-level video fingerprint must land within a
    * few Hamming bits of (the other frames stay bit-identical). */
  def syntheticVideoVariants(df: DataFrame, mediaIdCol: String,
      baseIdCol: String, bumpCol: String): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(mediaIdCol).cast("long").as("media_id"),
        col(baseIdCol).cast("long").as("base_id"),
        col(bumpCol).cast("int").as("bump")).as[StillVariant]
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .mapPartitions(_.map { v =>
        val frames = (0 until Synthetic.videoFrames(v.base_id)).map { fr =>
          val img = Synthetic.image(v.base_id, fr)
          if (v.bump != 0 && fr == 0) {
            val rgb = img.getRGB(0, 0)
            val r = (((rgb >> 16) & 0xFF) + v.bump) & 0xFF
            img.setRGB(0, 0, (r << 16) | (rgb & 0x00FFFF))
          }
          JdkCodec.encodePng(img)
        }
        MediaPayload(v.media_id, JdkCodec.packFrames(frames))
      })
      .toDF()
  }

  /** PER-FRAME perceptual hashes of video payloads — the multi-frame form
    * of [[perceptualHashes]] (which hashes only a video's FIRST frame):
    * every GVC1 frame decodes and hashes independently, so two videos can
    * match on ANY aligned content even when their opening frames differ.
    * Returns (media_id, frame, phash); non-video payloads emit no row.
    * Pack (media_id, frame) into one composite id and feed
    * [[graft.operators.Dedup.simhashPairsFromSignatures]] — the banded
    * pigeonhole join then finds close FRAME pairs without any all-pairs
    * comparison, and a grouped rollup lifts them to video pairs. One
    * narrow mapPartitions stage, no shuffle. */
  def videoFrameHashes(media: DataFrame, method: String = "ahash"): DataFrame = {
    val hashOf: BufferedImage => Long = method match {
      case "ahash" => aHash64
      case "dhash" => dHash64
      case other => throw new IllegalArgumentException(
        s"unknown perceptual-hash method '$other' (ahash | dhash)")
    }
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("content")).as[MediaPayload]
      .mapPartitions(_.flatMap { m =>
        if (m.content == null || !JdkCodec.isVideo(m.content)) Iterator.empty
        else JdkCodec.unpackFrames(m.content).iterator.zipWithIndex.map {
          case (png, fr) =>
            VideoFrameHash(m.media_id, fr, hashOf(JdkCodec.decodePng(png)))
        }
      })
      .toDF()
  }

  /** Synthesize REAL WAV payloads with a controlled perturbation — the
    * near-duplicate test corpus for AUDIO fingerprinting, the
    * [[syntheticStillVariants]] twin: each input row
    * (mediaIdCol, baseIdCol, bumpCol) encodes `Synthetic.sample(base_id, ·)`
    * PCM16 mono with `bump·256` folded into sample 0's closed form BEFORE
    * the modulo (so the edit stays engine-mirrorable:
    * `((id·31 + bump·256) % 65536) − 32768`; the abs-envelope below makes
    * even the wrap-around case a ≤ 256 amplitude change). bump = 0
    * reproduces the base clip; a small bump is the one-sample edit a
    * perceptual audio fingerprint must land within a few Hamming bits of
    * its original. Encoding runs executor-side (narrow stage). */
  def syntheticAudioVariants(df: DataFrame, mediaIdCol: String,
      baseIdCol: String, bumpCol: String): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(mediaIdCol).cast("long").as("media_id"),
        col(baseIdCol).cast("long").as("base_id"),
        col(bumpCol).cast("int").as("bump")).as[StillVariant]
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .mapPartitions(_.map { v =>
        val n = Synthetic.audioN(v.base_id)
        val samples = Array.tabulate(n) { i =>
          val b = if (i == 0) v.bump * 256L else 0L
          (((v.base_id * 31 + i * 173L + b) % 65536).toInt - 32768).toShort
        }
        MediaPayload(v.media_id, JdkCodec.encodeWav(samples, 16000f))
      })
      .toDF()
  }

  /** 64-bit perceptual fingerprint over DECODED PCM samples — the audio
    * member of the perceptual-hash family, closing the modality gap left
    * by the image-only aHash/dHash: SimHash over the QUANTIZED WAVEFORM.
    *
    * Each decoded sample becomes one token `"i:level"` — its position and
    * its `2^levelBits`-level coarse amplitude (`(s+32768) >> (16−levelBits)`
    * — the +32768 bias makes the shift a plain non-negative floor
    * division, portable to any engine) — and the fingerprint is the md5
    * SimHash of that token stream
    * ([[graft.operators.Dedup.simhashSignaturesMd5FromTokens]] — the same
    * bit-majority pipeline as text SimHash, verbatim). Tokenizing buys the
    * two properties a perceptual fingerprint needs here:
    *
    *   - EDIT LOCALITY: a small edit at one position changes at most that
    *     position's token (none at all while it stays inside its
    *     quantization level), and SimHash moves only the bits whose
    *     majority margin is within ±2 — one edited sample of an n-sample
    *     clip lands a few Hamming bits from the original (measured: mean
    *     0.8, max 7 on the synthetic corpus);
    *   - DISCRIMINATION: clips whose waveforms differ beyond the
    *     quantization width disagree on (almost) every token, so their
    *     fingerprints decorrelate to the ~32-bit random distance. (A
    *     mean-thresholded envelope aHash fails exactly here: every
    *     monotone-envelope signal produces the same step pattern and the
    *     corpus collapses to all-pairs. Waveforms within one level of
    *     each other everywhere — a sub-quantization amplitude offset —
    *     are genuinely near-identical audio and SHOULD collide.)
    *
    * The WAV/PCM16 codec is lossless and the pipeline integer/md5-exact,
    * so fingerprints are engine-mirrorable from the payload generator's
    * closed forms — decode, bias, quantize, hash, majority included. WAV
    * payloads hash; image/video/NULL/empty payloads emit no row. One
    * narrow decode stage + the SimHash aggregation. Clip-scale inputs
    * tokenize whole; window long-form audio upstream. Returns
    * (media_id, afp); rename afp→sh and feed
    * [[graft.operators.Dedup.simhashPairsFromSignatures]] for
    * Hamming-banded near-dup pairs — the same pigeonhole block join, no
    * all-pairs comparison at any corpus size. */
  def audioFingerprints(media: DataFrame, levelBits: Int = 6): DataFrame = {
    require(levelBits > 0 && levelBits <= 16, s"levelBits out of range: $levelBits")
    import media.sparkSession.implicits._
    val shift = 16 - levelBits
    val toks = media.select(col("media_id"), col("content")).as[MediaPayload]
      .mapPartitions(_.flatMap { m =>
        if (m.content == null || !JdkCodec.isWav(m.content)) Iterator.empty
        else {
          val s = JdkCodec.decodeWav(m.content)
          Iterator.tabulate(s.length)(i =>
            (m.media_id, s"$i:${(s(i) + 32768) >> shift}"))
        }
      })
      .toDF("id", "t")
    Dedup.simhashSignaturesMd5FromTokens(toks)
      .select(col("id").as("media_id"), col("sh").as("afp"))
  }

  /** 64-bit perceptual fingerprint over DECODED pixels — the image-side
    * twin of text SimHash, and the primitive under multimodal near-dup
    * detection. Two classic families, selected by `method`:
    *
    *   - `"ahash"` (average hash): 8×8 nearest-neighbor grid samples
    *     (source pixel (x·W/8, y·H/8), integer division — deterministic
    *     across JDKs, unlike interpolating rescales), per-sample INTEGER
    *     luma (r·299 + g·587 + b·114 — the BT.601 weights kept ×1000, no
    *     float), bit (y·8+x) set ⇔ luma·64 > Σ lumas (the strict integer
    *     compare against the un-divided mean);
    *   - `"dhash"` (difference hash): a 9×8 luma grid, bit (y·8+x) set ⇔
    *     luma(x+1, y) > luma(x, y) — horizontal gradient signs. No global
    *     mean, so a local edit moves ONLY the bits whose comparisons
    *     touch the edited sample (edit locality the mean-coupled aHash
    *     can't promise), and global brightness shifts cancel entirely.
    *
    * PNG stills hash directly; GVC1 videos hash their first frame;
    * audio/NULL/unknown payloads emit no row.
    *
    * Integer-exact end to end and the codecs are lossless, so both hashes
    * are engine-mirrorable from the payload generator's closed forms —
    * the whole decode→resample→threshold path gets a DuckDB oracle. One
    * narrow mapPartitions stage, no shuffle. Returns (media_id, phash);
    * rename phash→sh and feed
    * [[graft.operators.Dedup.simhashPairsFromSignatures]] for
    * Hamming-banded near-dup pairs (the pigeonhole block join — no
    * all-pairs comparison at any corpus size). */
  def perceptualHashes(media: DataFrame, method: String = "ahash"): DataFrame = {
    val hashOf: BufferedImage => Long = method match {
      case "ahash" => aHash64
      case "dhash" => dHash64
      case other => throw new IllegalArgumentException(
        s"unknown perceptual-hash method '$other' (ahash | dhash)")
    }
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("content")).as[MediaPayload]
      .mapPartitions(_.flatMap { m =>
        val img: BufferedImage =
          if (m.content == null) null
          else if (JdkCodec.isPng(m.content)) JdkCodec.decodePng(m.content)
          else if (JdkCodec.isVideo(m.content)) {
            val fs = JdkCodec.unpackFrames(m.content)
            if (fs.isEmpty) null else JdkCodec.decodePng(fs.head)
          } else null
        Option(img).map(i => MediaHash(m.media_id, hashOf(i)))
      })
      .toDF()
  }

  /** Persist the BANDED perceptual-hash index — the probe-side scale path
    * for image near-dup: each (id, phash) row explodes into its
    * `maxHamming+1` pigeonhole blocks (any pair within the Hamming budget
    * shares at least one exact block — [[graft.operators.Dedup]]'s SimHash
    * discipline), and postings land partitioned by
    * `bp = block·2^prefixBits + (value >> (width − prefixBits))` — so a
    * probe reads ONLY the partition directories its own block values hash
    * into, never the whole index. The full hash rides each posting (8
    * bytes ×(maxHamming+1) rows), so candidate verification needs no
    * second corpus read. One shuffle to lay out; [[phashProbeIndex]]
    * probes it. Index construction is the one-off ingest job; per-probe
    * cost is candidate-bounded and independent of corpus size. */
  def writePhashIndex(hashes: DataFrame, path: String,
      maxHamming: Int = 3, prefixBits: Int = 4,
      mode: String = "overwrite"): Unit = {
    require(maxHamming >= 0 && 64 % (maxHamming + 1) == 0,
      s"maxHamming+1 must divide 64, got $maxHamming")
    require(prefixBits >= 0 && prefixBits <= 64 / (maxHamming + 1),
      s"prefixBits out of range: $prefixBits")
    // layout metadata: banding parameters ride the layout so appends (and
    // probes through [[phashIndexParams]]) can never drift from the
    // writer's scheme — a different block split would silently prune away
    // partitions holding real candidates (the minhash-index discipline)
    if (mode == "append" && graft.sources.LayoutMeta.exists(path, PhashParamsFile)) {
      val Array(h, p) =
        graft.sources.LayoutMeta.read(path, PhashParamsFile).trim.split('|')
      require(h.toInt == maxHamming && p.toInt == prefixBits,
        s"index at $path was written with maxHamming=$h/prefixBits=$p, " +
          s"append requested $maxHamming/$prefixBits")
    }
    bandRows(hashes, maxHamming, prefixBits)
      .repartition(col("bp"))
      .write.mode(mode).partitionBy("bp").parquet(path)
    graft.sources.LayoutMeta.write(path, PhashParamsFile, s"$maxHamming|$prefixBits")
  }

  private[graft] val PhashParamsFile = "_graft_phash_params"

  /** True once [[writePhashIndex]] has committed at least one batch. */
  def phashIndexReady(path: String): Boolean =
    graft.sources.LayoutMeta.exists(path, PhashParamsFile)

  private def bandRows(hashes: DataFrame, maxHamming: Int, prefixBits: Int): DataFrame = {
    val blocks = maxHamming + 1
    val width = 64 / blocks
    hashes.select(col("media_id"), col("phash"),
      posexplode(transform(sequence(lit(0), lit(blocks - 1)), b =>
        call_function("shiftright", col("phash"), b * lit(width))
          .bitwiseAND(lit((1L << width) - 1)))).as(Seq("block", "value")))
      .withColumn("bp",
        col("block") * lit(1L << prefixBits)
          + call_function("shiftright", col("value"), lit(width - prefixBits)))
  }

  /** Probe the banded index: find every indexed image within `maxHamming`
    * bits of each probe hash. The probe's own (block, value) rows pick the
    * `bp` partitions to read (partition filter — ≤ probes·(maxHamming+1)
    * directories of the ≤ (maxHamming+1)·2^prefixBits total), candidates
    * come from the (block, value) equi-join, and the exact Hamming check
    * runs on the full hashes both sides already carry. Returns
    * (probe_id, corpus_id, hamming), distinct. Recall-complete at the
    * index's own maxHamming (pigeonhole); `maxHamming` here may be lower
    * (tighter) but not higher than the index's. */
  def phashProbeIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      probes: DataFrame, maxHamming: Int = 3, prefixBits: Int = 4): DataFrame = {
    val pb = bandRows(probes, maxHamming, prefixBits)
      .select(col("media_id").as("probe_id"), col("phash").as("__psh"),
        col("block"), col("value"), col("bp"))
    val wanted = pb.select(col("bp")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val idx = spark.read.parquet(path)
      .where(col("bp").isin(wanted: _*))
    pb.join(idx, Seq("block", "value"))
      .select(col("probe_id"), col("media_id").as("corpus_id"),
        bit_count(col("__psh").bitwiseXOR(col("phash"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  private def lumaAt(img: BufferedImage, sx: Int, sy: Int): Long = {
    val rgb = img.getRGB(sx, sy)
    ((rgb >> 16) & 0xFF) * 299L + ((rgb >> 8) & 0xFF) * 587L + (rgb & 0xFF) * 114L
  }

  private def dHash64(img: BufferedImage): Long = {
    val lum = Array.ofDim[Long](8, 9)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 9) {
        lum(y)(x) = lumaAt(img, x * img.getWidth / 9, y * img.getHeight / 8)
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var j = 0
    while (j < 64) {
      val (yy, xx) = (j / 8, j % 8)
      if (lum(yy)(xx + 1) > lum(yy)(xx)) hash |= (1L << j)
      j += 1
    }
    hash
  }

  private def aHash64(img: BufferedImage): Long = {
    val lum = new Array[Long](64)
    var total = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val l = lumaAt(img, x * img.getWidth / 8, y * img.getHeight / 8)
        lum(y * 8 + x) = l
        total += l
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var j = 0
    while (j < 64) {
      if (lum(j) * 64L > total) hash |= (1L << j)
      j += 1
    }
    hash
  }

  private val FeatureBatchSize = 64 // rows decoded per executor-side batch

  /** Decode every payload (dispatch on magic bytes) and emit integer-exact
    * per-media statistics — the hash-checkable face of the decode path:
    *
    *   - image: width/height from the decoded PNG; value = r+g+b per pixel;
    *   - audio: n_samples from the decoded WAV; value = PCM16 sample;
    *   - video: every frame decoded; value = r+g+b per pixel across frames.
    *
    * All outputs are integers (sum/min/max of exact channel values), so a
    * lossless round trip makes them engine-mirrorable — the DuckDB oracle
    * recomputes them from the generator formulas without touching a codec.
    * One narrow mapPartitions stage; no shuffle. */
  def decodeStats(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("content")).as[MediaPayload]
      .mapPartitions { it =>
        it.grouped(FeatureBatchSize).flatMap { batch =>
          // batch boundary = where a real codec amortizes per-batch setup
          batch.iterator.flatMap(m => Option(m.content).map(c => statsOf(m.media_id, c)))
        }
      }
      .toDF()
  }

  private def statsOf(id: Long, content: Array[Byte]): MediaStats = {
    var sum = 0L
    var mn = Long.MaxValue
    var mx = Long.MinValue
    def add(v: Long): Unit = { sum += v; if (v < mn) mn = v; if (v > mx) mx = v }
    def addImage(img: BufferedImage): Unit = {
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          add(((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF))
          x += 1
        }
        y += 1
      }
    }
    if (JdkCodec.isPng(content)) {
      val img = JdkCodec.decodePng(content)
      addImage(img)
      MediaStats(id, "image", img.getWidth, img.getHeight, 1, 0L, sum, mn, mx)
    } else if (JdkCodec.isWav(content)) {
      val samples = JdkCodec.decodeWav(content)
      samples.foreach(s => add(s.toLong))
      MediaStats(id, "audio", 0, 0, 0, samples.length.toLong, sum, mn, mx)
    } else if (JdkCodec.isVideo(content)) {
      val frames = JdkCodec.unpackFrames(content).map(JdkCodec.decodePng)
      frames.foreach(addImage)
      val (w, h) =
        if (frames.isEmpty) (0, 0) else (frames.head.getWidth, frames.head.getHeight)
      MediaStats(id, "video", w, h, frames.length, 0L, sum, mn, mx)
    } else
      MediaStats(id, "unknown", 0, 0, 0, 0L, 0L, 0L, 0L)
  }

  /** Decode payloads to fixed-width feature vectors — the embedding-shaped
    * stage (real decode, then a deterministic reduction to `dims` floats):
    * images/videos bucket luma means over a dims-cell grid scan order;
    * audio buckets mean amplitude over dims sample bins. */
  def extractFeatures(media: DataFrame, dims: Int = 64): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("content")).as[MediaPayload]
      .mapPartitions { it =>
        it.grouped(FeatureBatchSize).flatMap { batch =>
          batch.iterator.map(m => MediaFeatures(m.media_id, featuresOf(m.content, dims)))
        }
      }
      .toDF()
  }

  private def featuresOf(content: Array[Byte], dims: Int): Array[Float] = {
    if (content == null) return null
    val sums = new Array[Double](dims)
    val counts = new Array[Long](dims)
    def addValues(vs: Iterator[Double]): Unit = {
      var i = 0
      vs.foreach { v =>
        val b = i % dims
        sums(b) += v; counts(b) += 1; i += 1
      }
    }
    def imageValues(img: BufferedImage): Iterator[Double] =
      for {
        y <- Iterator.range(0, img.getHeight)
        x <- Iterator.range(0, img.getWidth)
      } yield {
        val rgb = img.getRGB(x, y)
        (((rgb >> 16) & 0xFF) * 299L + ((rgb >> 8) & 0xFF) * 587L + (rgb & 0xFF) * 114L) / 1000.0
      }
    if (JdkCodec.isPng(content)) addValues(imageValues(JdkCodec.decodePng(content)))
    else if (JdkCodec.isWav(content))
      addValues(JdkCodec.decodeWav(content).iterator.map(_.toDouble))
    else if (JdkCodec.isVideo(content))
      JdkCodec.unpackFrames(content).foreach(f => addValues(imageValues(JdkCodec.decodePng(f))))
    Array.tabulate(dims)(b => if (counts(b) == 0) 0f else (sums(b) / counts(b)).toFloat)
  }

  /** Resize stage: images (and every frame of a video) are REALLY rescaled
    * — decode, nearest-neighbor resample (deterministic across JDKs, unlike
    * interpolating Graphics2D scaling), re-encode. Audio passes through. */
  def resizeMedia(media: DataFrame, width: Int, height: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("content")).as[MediaPayload]
      .mapPartitions(_.map(m => MediaPayload(m.media_id, resizeOf(m.content, width, height))))
      .toDF()
  }

  private def resizeImage(img: BufferedImage, w: Int, h: Int): BufferedImage = {
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        out.setRGB(x, y, img.getRGB(x * img.getWidth / w, y * img.getHeight / h))
        x += 1
      }
      y += 1
    }
    out
  }

  private def resizeOf(content: Array[Byte], w: Int, h: Int): Array[Byte] =
    if (content == null) null
    else if (JdkCodec.isPng(content))
      JdkCodec.encodePng(resizeImage(JdkCodec.decodePng(content), w, h))
    else if (JdkCodec.isVideo(content))
      JdkCodec.packFrames(JdkCodec.unpackFrames(content)
        .map(f => JdkCodec.encodePng(resizeImage(JdkCodec.decodePng(f), w, h))))
    else content

  /** Frame-sampling stage: GVC1 containers emit up to `framesPerVideo`
    * evenly-spaced REAL PNG frames; still images emit themselves as frame
    * 0; audio emits nothing. */
  def sampleFrames(media: DataFrame, framesPerVideo: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("content")).as[MediaPayload]
      .mapPartitions(_.flatMap { m =>
        framesOf(m.content, framesPerVideo).zipWithIndex.map {
          case (frame, idx) => MediaFrame(m.media_id, idx, frame)
        }
      })
      .toDF()
  }

  private def framesOf(content: Array[Byte], n: Int): Seq[Array[Byte]] =
    if (content == null) Nil
    else if (JdkCodec.isPng(content)) Seq(content)
    else if (JdkCodec.isVideo(content)) {
      val all = JdkCodec.unpackFrames(content)
      if (all.length <= n) all
      else (0 until n).map(i => all(i * all.length / n))
    } else Nil
}

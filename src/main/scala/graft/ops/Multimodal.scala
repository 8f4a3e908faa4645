package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling: opaque `binary` payloads
  * with typed metadata, plus decode / feature-extract / frame-sample
  * operators structured the way a production pipeline runs them —
  * batched per partition, schema-typed in and out, no driver collects.
  *
  * Codec status: [[Multimodal.decodePpm]] (P6 binary RGB) and
  * [[Multimodal.decodePgm]] (P5 binary grayscale) are REAL dependency-free
  * netpbm decoders, dispatched by format through [[Multimodal.decode]];
  * other formats fall back to [[Multimodal.decodeStub]], a deterministic
  * fake that treats the payload bytes as the "decoded frame" (this
  * container has no image/audio libraries). Everything around the codecs —
  * the Dataset schemas, the mapPartitions batch shape (the Scala analogue
  * of `mapInPandas` with Arrow batches), the per-partition batching, and
  * the downstream aggregations — is real and tested; a JNI/image-library
  * decoder is one new `decode` case.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata (the schema a real
    * pipeline would carry for image/audio/video blobs). */
  case class MediaRecord(doc_id: Long, media_type: String,
                         payload: Array[Byte], format: String,
                         width: Int, height: Int, n_frames: Int)

  /** Extracted features per media row: byte-level statistics standing in
    * for a real embedding/feature vector. `sum_bytes` (the exact integer
    * numerator of `mean_byte`) is carried so downstream hash-compared
    * outputs can stay in integer arithmetic end-to-end. */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, sum_bytes: Long,
                           mean_byte: Double, histogram: Array[Long])

  /** One sampled "frame" (fixed-size byte block) of a media payload. */
  case class Frame(doc_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Adapt documents to media rows: payload = utf-8 bytes of the text,
    * metadata derived deterministically. In production this is a parquet
    * scan of (id, binary, metadata-struct) columns; binary stays opaque to
    * Catalyst so column pruning must drop it whenever a query only touches
    * metadata — keep it in its own leaf columns, never inside a struct with
    * hot columns. */
  def asMedia(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id"),
        lit("image").as("media_type"),
        encode(col("text"), "UTF-8").as("payload"),
        lit("fake-rgb8").as("format"),
        (col("doc_id") % 64 + 16).cast("int").as("width"),
        (col("doc_id") % 48 + 16).cast("int").as("height"),
        lit(1).as("n_frames"))
      .as[MediaRecord]
  }

  /** STUB decoder: a real implementation would decode `format` bytes into
    * pixels/samples here (e.g. via a JNI codec). The fake returns the raw
    * payload as the "decoded frame" — deterministic, so tests can assert
    * exact downstream values. */
  def decodeStub(payload: Array[Byte], format: String): Array[Byte] = payload

  /** Shared binary-netpbm decode (P5 PGM / P6 PPM — same header grammar,
    * different magic and channel count): parses the
    * `<magic> <width> <height> <maxval>` header (whitespace- and
    * `#`-comment-tolerant, per the netpbm spec) and returns (width, height,
    * raw raster of width·height·channels bytes). */
  private def decodeNetpbm(payload: Array[Byte], magic: String,
                           channels: Int): (Int, Int, Array[Byte]) = {
    var i = 0
    def skipWs(): Unit = {
      var done = false
      while (!done && i < payload.length) {
        val c = payload(i).toChar
        if (c == '#') { while (i < payload.length && payload(i) != '\n') i += 1 }
        else if (c.isWhitespace) i += 1
        else done = true
      }
    }
    def token(): String = {
      skipWs()
      val start = i
      while (i < payload.length && !payload(i).toChar.isWhitespace) i += 1
      new String(payload, start, i - start, "US-ASCII")
    }
    require(token() == magic, s"not a binary netpbm ($magic) payload")
    val w = token().toInt; val h = token().toInt; val maxv = token().toInt
    require(w > 0 && h > 0, s"bad $magic dimensions ${w}x$h")
    require(maxv > 0 && maxv < 256, s"only 8-bit $magic supported (maxval $maxv)")
    i += 1 // exactly one whitespace byte separates maxval from the raster
    // Long arithmetic: a crafted 65536x65536 header would overflow Int to
    // exactly 0, pass the truncation check, and silently decode an empty
    // raster instead of failing fast.
    val n = w.toLong * h * channels
    require(n <= payload.length - i, s"truncated $magic raster")
    (w, h, java.util.Arrays.copyOfRange(payload, i, i + n.toInt))
  }

  /** Real P6 (binary RGB) PPM decode — dependency-free. A genuine codec
    * behind the batched decode path; it exercises exactly the seam a
    * JNI/image-library decoder would plug into. */
  def decodePpm(payload: Array[Byte]): (Int, Int, Array[Byte]) =
    decodeNetpbm(payload, "P6", 3)

  /** Real P5 (binary grayscale) PGM decode — same netpbm header grammar as
    * [[decodePpm]], one channel per pixel. */
  def decodePgm(payload: Array[Byte]): (Int, Int, Array[Byte]) =
    decodeNetpbm(payload, "P5", 1)

  /** Bytes per pixel for the formats that decode for real; None = stub. */
  private def realChannels(format: String): Option[Int] = format match {
    case "ppm" => Some(3)
    case "pgm" => Some(1)
    case _     => None
  }

  /** Format dispatch: `ppm`/`pgm` decode for real ([[decodePpm]] /
    * [[decodePgm]]); everything else keeps the documented stub. Every
    * batched operator below routes through here, so a new codec is one new
    * case. */
  def decode(payload: Array[Byte], format: String): Array[Byte] =
    format match {
      case "ppm" => decodePpm(payload)._3
      case "pgm" => decodePgm(payload)._3
      case _     => decodeStub(payload, format)
    }

  /** Feature extraction, batched per partition (the Scala analogue of a
    * Pandas UDF over mapInPandas: fixed-size batches amortize
    * decoder/model-session setup, which dominates real decode workloads). */
  def extractFeatures(media: Dataset[MediaRecord],
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // Batch boundary = where a real decoder session would be reused.
        batch.iterator.map { r =>
          val decoded = decode(r.payload, r.format)
          val hist = new Array[Long](16)
          var sum = 0L
          decoded.foreach { b =>
            val u = b & 0xff
            hist(u / 16) += 1
            sum += u
          }
          MediaFeatures(r.doc_id, decoded.length.toLong, sum,
            if (decoded.isEmpty) 0.0 else sum.toDouble / decoded.length, hist)
        }
      }
    }
  }

  /** Downscale by an integer factor. For the real codecs (`ppm`/`pgm`) this
    * is a REAL nearest-neighbor pixel resample: decode, sample pixel
    * (x·factor, y·factor), re-emit a VALID payload of the same format — so
    * resized outputs stay decodable by [[decodePpm]]/[[decodePgm]]
    * downstream. Other formats keep the documented byte-stride stub (output
    * length = ceil(len / factor)). Runs inside the same batched
    * mapPartitions shape as feature extraction. */
  def resize(media: Dataset[MediaRecord], factor: Int): Dataset[MediaRecord] = {
    require(factor > 0, "resize factor must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      realChannels(r.format) match {
        case Some(ch) =>
          val magic = if (ch == 3) "P6" else "P5"
          val (w, h, px) = decodeNetpbm(r.payload, magic, ch)
          val ow = math.max(1, w / factor)
          val oh = math.max(1, h / factor)
          val out = new Array[Byte](ow * oh * ch)
          var y = 0
          while (y < oh) {
            var x = 0
            while (x < ow) {
              val src = ((y * factor) * w + (x * factor)) * ch
              val dst = (y * ow + x) * ch
              var c = 0
              while (c < ch) { out(dst + c) = px(src + c); c += 1 }
              x += 1
            }
            y += 1
          }
          val header = s"$magic\n$ow $oh\n255\n".getBytes("US-ASCII")
          r.copy(payload = header ++ out, width = ow, height = oh)
        case None =>
          val decoded = decode(r.payload, r.format)
          val out = Array.range(0, decoded.length, factor).map(decoded)
          r.copy(payload = out,
            width = math.max(1, r.width / factor),
            height = math.max(1, r.height / factor))
      }
    })
  }

  /** Frame sampling: every `stride`-th fixed-size block of the decoded
    * payload becomes a frame row (the video-keyframe access pattern).
    * Explodes distributed — one media row fans out to its frames with no
    * shuffle. */
  def frameSample(media: Dataset[MediaRecord], frameBytes: Int = 16,
                  stride: Int = 4): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      val decoded = decode(r.payload, r.format)
      decoded.grouped(frameBytes).zipWithIndex.collect {
        case (block, i) if i % stride == 0 => Frame(r.doc_id, i, block)
      }
    }
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling: opaque `binary` payloads
  * with typed metadata, plus decode / feature-extract / frame-sample
  * operators structured the way a production pipeline runs them —
  * batched per partition, schema-typed in and out, no driver collects.
  *
  * Codec status: [[Multimodal.decodePpm]] (P6 binary RGB),
  * [[Multimodal.decodePgm]] (P5 binary grayscale),
  * [[Multimodal.decodeWav]] (RIFF/WAV integer PCM, with
  * [[Multimodal.encodeWavPcm16]] as its writer half) and
  * [[Multimodal.decodeImage]] (PNG/JPEG/BMP/GIF via the JDK's built-in
  * `javax.imageio` readers, with [[Multimodal.encodePng]] as the lossless
  * writer half) and [[Multimodal.decodeY4m]] (YUV4MPEG2 uncompressed
  * video: header parse + frame walk, with [[Multimodal.encodeY4m]] as the
  * writer half) and [[Multimodal.decodeAviMjpeg]] (MJPEG-in-AVI
  * COMPRESSED video: RIFF walk + per-frame ImageIO JPEG decode, with
  * [[Multimodal.encodeAviMjpeg]] as the writer half) are REAL
  * dependency-free codecs, dispatched by format
  * through [[Multimodal.decode]]; the remaining formats (INTERFRAME video
  * and compressed audio — mp4/webm/mp3/...) fall back to
  * [[Multimodal.decodeStub]], a
  * deterministic fake that treats the payload bytes as the "decoded frame"
  * (no ffmpeg-class library exists in this container). Everything around
  * the codecs — the Dataset schemas, the mapPartitions batch shape (the
  * Scala analogue of `mapInPandas` with Arrow batches), the per-partition
  * batching, and the downstream aggregations — is real and tested; a
  * JNI/ffmpeg decoder is one new `decode` case.
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

  /** Decoded PCM audio: header metadata + the raw little-endian sample
    * bytes of the data chunk. */
  case class WavPcm(channels: Int, sample_rate: Int, bits_per_sample: Int,
                    data: Array[Byte])

  /** Extracted features per audio row. All-long so hash-compared outputs
    * stay in exact integer arithmetic end-to-end: `n_samples` counts sample
    * VALUES (frames × channels) and `sum_samples` is their exact integer
    * sum (signed for 16-bit PCM, unsigned 0-255 for 8-bit). */
  case class AudioFeatures(doc_id: Long, channels: Long, sample_rate: Long,
                           bits_per_sample: Long, n_samples: Long,
                           sum_samples: Long)

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

  /** Real RIFF/WAV PCM decode — dependency-free, like the netpbm codecs
    * (reference's media handling is opaque blobs; this is the audio leg of
    * the multimodal-columns surface). Walks the RIFF chunk list generically
    * (unknown chunks like `LIST`/`fact` are skipped, odd-sized chunks
    * consume their pad byte per the RIFF spec), takes the `fmt ` chunk that
    * must precede `data`, and returns the first data chunk's raw bytes with
    * the header metadata. Only uncompressed integer PCM (audioFormat 1,
    * 8 or 16 bits/sample) is supported — the same "real codec for the
    * self-describing formats, fail fast on the rest" contract as
    * [[decodePpm]]/[[decodePgm]]. */
  def decodeWav(payload: Array[Byte]): WavPcm = {
    def tag(i: Int): String = new String(payload, i, 4, "US-ASCII")
    def u16(i: Int): Int = (payload(i) & 0xff) | ((payload(i + 1) & 0xff) << 8)
    def u32(i: Int): Long =
      (payload(i) & 0xffL) | ((payload(i + 1) & 0xffL) << 8) |
        ((payload(i + 2) & 0xffL) << 16) | ((payload(i + 3) & 0xffL) << 24)
    require(payload.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE",
      "not a RIFF/WAVE payload")
    // (channels, rate, bits, audioFormat) — format 1 = integer PCM,
    // format 7 = G.711 µ-law (r19: the compressed-audio leg), decoded
    // TRANSPARENTLY to 16-bit PCM so every downstream consumer
    // (extractAudioFeatures, audioDHash) handles compressed payloads
    // unchanged — the "decode" contract
    var fmt: Option[(Int, Int, Int, Int)] = None
    var i = 12
    while (i + 8 <= payload.length) {
      val id = tag(i)
      val size = u32(i + 4)
      val body = i + 8
      require(size <= payload.length - body, s"truncated RIFF chunk '$id'")
      id match {
        case "fmt " =>
          require(size >= 16, "fmt chunk too short")
          val audioFormat = u16(body)
          require(audioFormat == 1 || audioFormat == 7,
            s"only integer PCM (1) and G.711 mu-law (7) supported " +
              s"(audioFormat $audioFormat)")
          val channels = u16(body + 2)
          val rate = u32(body + 4)
          val bits = u16(body + 14)
          require(channels > 0, "zero-channel wav")
          if (audioFormat == 1)
            require(bits == 8 || bits == 16,
              s"only 8/16-bit integer PCM supported ($bits)")
          else
            require(bits == 8, s"mu-law is 8 bits per sample ($bits)")
          fmt = Some((channels, rate.toInt, bits, audioFormat))
        case "data" =>
          val (channels, rate, bits, audioFormat) = fmt.getOrElse(
            sys.error("data chunk before fmt chunk"))
          require(size % (channels * bits / 8) == 0,
            "data chunk is not a whole number of sample frames")
          val raw = java.util.Arrays.copyOfRange(payload, body,
            body + size.toInt)
          if (audioFormat == 1) return WavPcm(channels, rate, bits, raw)
          // µ-law: expand each stored byte to its exact 16-bit sample
          val out = new Array[Byte](raw.length * 2)
          var j = 0
          while (j < raw.length) {
            val s = mulawDecode(raw(j))
            out(2 * j) = (s & 0xff).toByte
            out(2 * j + 1) = ((s >> 8) & 0xff).toByte
            j += 1
          }
          return WavPcm(channels, rate, 16, out)
        case _ => // skip unknown chunk (LIST, fact, cue ...)
      }
      i = body + size.toInt + (size.toInt & 1) // odd chunks carry a pad byte
    }
    sys.error("no data chunk in RIFF/WAVE payload")
  }

  /** Dependency-free RIFF/WAV writer for G.711 µ-law (audioFormat 7) —
    * the COMPRESSED encode half: 16-bit samples compress 2:1 through
    * [[mulawEncode]]; the payload re-enters [[decodeWav]], which expands
    * it back to 16-bit PCM transparently. */
  def encodeWavMulaw(samples: Array[Short], channels: Int = 1,
                     sampleRate: Int = 8000): Array[Byte] = {
    require(channels > 0 && samples.length % channels == 0,
      "samples must be a whole number of frames")
    val dataLen = samples.length
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
    out.putShort(7.toShort) // WAVE_FORMAT_MULAW
    out.putShort(channels.toShort)
    out.putInt(sampleRate)
    out.putInt(sampleRate * channels) // byte rate: 1 byte per sample
    out.putShort(channels.toShort)    // block align
    out.putShort(8.toShort)           // stored bits per sample
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => out.put(mulawEncode(s)))
    out.array()
  }

  /** G.711 µ-law encode of one 16-bit sample — the COMPRESSED-audio codec
    * (ITU-T G.711, 1972; 2:1 compression, 8 log-scale bits per sample).
    * Unlike JPEG, the µ-law transfer function is EXACTLY specified integer
    * arithmetic: clip to 32635, add the 132 bias, exponent = highest set
    * bit − 7, 4 mantissa bits below it, complement — so an independent
    * engine replays the full lossy round trip digit-for-digit, which is
    * what makes the mm_mulaw_stats oracle exact where the MJPEG one can
    * only bound. */
  def mulawEncode(sample: Short): Byte = {
    val sign = if (sample < 0) 0x80 else 0
    var s = math.min(math.abs(sample.toInt), 32635) + 132
    var exponent = 7
    var mask = 0x4000
    while (exponent > 0 && (s & mask) == 0) { exponent -= 1; mask >>= 1 }
    val mantissa = (s >> (exponent + 3)) & 0x0f
    (~(sign | (exponent << 4) | mantissa)).toByte
  }

  /** G.711 µ-law decode — the exact inverse expansion:
    * ((mantissa·8 + 132) << exponent) − 132, sign applied. */
  def mulawDecode(b: Byte): Short = {
    val u = (~b) & 0xff
    val exponent = (u >> 4) & 0x07
    val mantissa = u & 0x0f
    val s = (((mantissa << 3) + 132) << exponent) - 132
    (if ((u & 0x80) != 0) -s else s).toShort
  }

  /** Dependency-free RIFF/WAV writer for 16-bit signed little-endian PCM —
    * the encode half of the audio path, so resampled/synthesized audio
    * re-enters the pipeline as a VALID payload (same re-emit contract as
    * the pixel-aware [[resize]]). */
  def encodeWavPcm16(samples: Array[Short], channels: Int = 1,
                     sampleRate: Int = 16000): Array[Byte] = {
    require(channels > 0 && samples.length % channels == 0,
      "samples must be a whole number of frames")
    val dataLen = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
    out.putShort(1.toShort) // PCM
    out.putShort(channels.toShort)
    out.putInt(sampleRate)
    out.putInt(sampleRate * channels * 2) // byte rate
    out.putShort((channels * 2).toShort)  // block align
    out.putShort(16.toShort)              // bits per sample
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(out.putShort)
    out.array()
  }

  /** A decoded Y4M video: header geometry + colorspace + the raw plane
    * bytes of every frame (Y, then U, then V, concatenated — luma-first,
    * so `frames(i).take(width*height)` is always the grayscale frame). */
  case class Y4mVideo(width: Int, height: Int, colorspace: String,
                      frames: Array[Array[Byte]])

  /** Frame byte size for a Y4M colorspace — the container carries NO
    * per-frame length, so the colorspace IS the framing contract.
    * Long guard like [[decodeNetpbm]]/[[decodeImage]]: a crafted
    * 65536×65536 header must fail fast, not wrap Int and mis-frame. */
  private def y4mFrameBytes(w: Int, h: Int, cs: String): Int = {
    require(w.toLong * h * 3 <= Int.MaxValue, s"frame too large (${w}x$h)")
    cs match {
      case "420" | "420jpeg" | "420mpeg2" | "420paldv" =>
        require(w % 2 == 0 && h % 2 == 0,
          s"4:2:0 needs even dimensions (${w}x$h)")
        w * h + 2 * (w / 2) * (h / 2)
      case "422" =>
        require(w % 2 == 0, s"4:2:2 needs even width ($w)")
        w * h + 2 * (w / 2) * h
      case "444" => 3 * w * h
      case "mono" => w * h
      case other => throw new IllegalArgumentException(
        s"unsupported y4m colorspace C$other")
    }
  }

  /** Real YUV4MPEG2 (.y4m) decode — dependency-free, closing the LAST
    * documented multimodal stub (video containers; r17 verdict Next #3):
    * Y4M is the uncompressed interchange container (plain-text stream
    * header `YUV4MPEG2 W<w> H<h> F<n>:<d> [I?] [A?:?] [C<cs>] [X...]`,
    * then per frame a `FRAME[ params]\n` marker followed by raw YUV
    * planes), so a whole-file chunk walk decodes it exactly like
    * [[decodeWav]] walks RIFF — no codec library involved. Supported
    * colorspaces: C420(+jpeg/mpeg2/paldv variants — identical plane
    * sizes; chroma siting doesn't change framing), C422, C444, Cmono;
    * the spec default when no C tag is present is 4:2:0. Truncated
    * frames, bad magic, and unknown colorspaces fail fast — the same
    * "real codec for self-describing formats" contract as the netpbm /
    * RIFF legs. Compressed video (mp4/webm/...) remains out of scope: it
    * needs an ffmpeg-class dependency this container doesn't have. */
  def decodeY4m(payload: Array[Byte]): Y4mVideo = {
    var i = 0
    def line(): String = {
      val start = i
      while (i < payload.length && payload(i) != '\n') i += 1
      require(i < payload.length, "truncated y4m header line")
      val s = new String(payload, start, i - start, "US-ASCII")
      i += 1 // consume the newline
      s
    }
    val header = line()
    val parts = header.split(' ')
    require(parts.headOption.contains("YUV4MPEG2"), "not a YUV4MPEG2 payload")
    var w = -1; var h = -1; var cs = "420"
    parts.drop(1).filter(_.nonEmpty).foreach { p =>
      p.charAt(0) match {
        case 'W' => w = p.drop(1).toInt
        case 'H' => h = p.drop(1).toInt
        case 'C' => cs = p.drop(1)
        case _ => // F<rate> I<interlace> A<aspect> X<app>: no framing impact
      }
    }
    require(w > 0 && h > 0, s"missing or bad y4m dimensions ${w}x$h")
    val fb = y4mFrameBytes(w, h, cs)
    val frames = Array.newBuilder[Array[Byte]]
    while (i < payload.length) {
      val marker = line()
      require(marker == "FRAME" || marker.startsWith("FRAME "),
        s"expected FRAME marker, got '${marker.take(16)}'")
      require(fb <= payload.length - i, "truncated y4m frame raster")
      frames += java.util.Arrays.copyOfRange(payload, i, i + fb)
      i += fb
    }
    Y4mVideo(w, h, cs, frames.result())
  }

  /** Dependency-free Y4M writer — the encode half ([[encodeWavPcm16]] /
    * [[encodePng]] contract): every frame must be exactly the
    * colorspace's plane size, so the emitted payload re-enters
    * [[decodeY4m]] losslessly. */
  def encodeY4m(width: Int, height: Int, frames: Seq[Array[Byte]],
                colorspace: String = "mono", fpsNum: Int = 25,
                fpsDen: Int = 1): Array[Byte] = {
    val fb = y4mFrameBytes(width, height, colorspace)
    frames.foreach(f => require(f.length == fb,
      s"frame length ${f.length} != $fb for ${width}x$height C$colorspace"))
    val header =
      s"YUV4MPEG2 W$width H$height F$fpsNum:$fpsDen Ip A1:1 C$colorspace\n"
        .getBytes("US-ASCII")
    val marker = "FRAME\n".getBytes("US-ASCII")
    val out = java.nio.ByteBuffer.allocate(
      header.length + frames.map(marker.length + _.length).sum)
    out.put(header)
    frames.foreach { f => out.put(marker); out.put(f) }
    out.array()
  }

  /** A decoded MJPEG-in-AVI video: container geometry (from the `avih`
    * header) + every `00dc`/`00db` frame decoded to a row-major RGB
    * raster via the ImageIO JPEG path ([[decodeImage]]). */
  case class AviVideo(width: Int, height: Int,
                      frames: Array[(Int, Int, Array[Byte])])

  /** Real MJPEG-in-AVI decode — the first COMPRESSED video leg (r18
    * verdict Next #4), dependency-free like every other codec here: AVI
    * is a RIFF container ([[decodeWav]]'s exact chunk grammar — id,
    * little-endian size, pad byte on odd sizes) whose `LIST movi`
    * payload carries one JPEG per `00dc` (compressed) / `00db` frame
    * chunk, and the JDK's ImageIO JPEG reader ([[decodeImage]]) already
    * decodes JPEG — so the walk is new but the codec is not. Geometry
    * comes from the `avih` main header inside `LIST hdrl` (dwWidth /
    * dwHeight at byte offsets 32/36 of the chunk body). Unknown chunks
    * (`idx1`, `JUNK`, vendor lists) skip generically; truncated chunks,
    * bad magic, and a missing `movi` list fail fast — the same
    * "self-describing or fail" contract as the netpbm / RIFF / Y4M legs.
    * Compressed AUDIO (mp3/aac) and interframe video (mp4/webm) remain
    * the documented stub: those need an ffmpeg-class dependency this
    * container doesn't have. */
  def decodeAviMjpeg(payload: Array[Byte]): AviVideo = {
    def tag(i: Int): String = new String(payload, i, 4, "US-ASCII")
    def u32(i: Int): Long =
      (payload(i) & 0xffL) | ((payload(i + 1) & 0xffL) << 8) |
        ((payload(i + 2) & 0xffL) << 16) | ((payload(i + 3) & 0xffL) << 24)
    require(payload.length >= 12 && tag(0) == "RIFF" && tag(8) == "AVI ",
      "not a RIFF/AVI payload")
    var w = -1; var h = -1
    val frames = Array.newBuilder[(Int, Int, Array[Byte])]
    // walk one chunk run [from, to); recurse into hdrl/movi LISTs
    def walk(from: Int, to: Int): Unit = {
      var i = from
      while (i + 8 <= to) {
        val id = tag(i)
        val size = u32(i + 4)
        val body = i + 8
        require(size <= to - body, s"truncated RIFF chunk '$id'")
        id match {
          case "LIST" =>
            require(size >= 4, "LIST chunk too short")
            val listType = tag(body)
            if (listType == "hdrl" || listType == "movi" ||
                listType == "rec ") // rec: grouped movi frames, per spec
              walk(body + 4, body + size.toInt)
          case "avih" =>
            require(size >= 40, "avih chunk too short")
            w = u32(body + 32).toInt
            h = u32(body + 36).toInt
          case s if s.endsWith("dc") || s.endsWith("db") =>
            // <nn>dc/<nn>db: one JPEG per frame chunk (MJPG has no interframes)
            frames += decodeImage(
              java.util.Arrays.copyOfRange(payload, body, body + size.toInt))
          case _ => // skip idx1, JUNK, strl details, vendor chunks
        }
        i = body + size.toInt + (size.toInt & 1) // odd chunks carry a pad
      }
    }
    walk(12, payload.length)
    require(w > 0 && h > 0, "no avih header with valid dimensions")
    AviVideo(w, h, frames.result())
  }

  /** Dependency-free MJPEG-in-AVI writer — the encode half
    * ([[encodeY4m]] contract): each frame is an already-encoded JPEG
    * blob (use [[encodeJpegGray]] for deterministic synthetic frames),
    * wrapped in the minimal spec-valid container (RIFF → LIST hdrl
    * (avih + LIST strl (strh 'vids'/'MJPG' + strf BITMAPINFOHEADER)) →
    * LIST movi (one `00dc` per frame)), so the emitted payload
    * re-enters [[decodeAviMjpeg]] — and any MJPEG-capable player. */
  def encodeAviMjpeg(width: Int, height: Int, jpegFrames: Seq[Array[Byte]],
                     fps: Int = 25): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0, "bad AVI geometry")
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(8 + body.length + (body.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      out.array() // trailing pad byte (odd sizes) is the zero-filled slack
    }
    def list(listType: String, bodies: Seq[Array[Byte]]): Array[Byte] =
      chunk("LIST", listType.getBytes("US-ASCII") ++ bodies.flatten)
    val avih = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    avih.putInt(1000000 / fps) // dwMicroSecPerFrame
      .putInt(0).putInt(0).putInt(0)
      .putInt(jpegFrames.size)  // dwTotalFrames
      .putInt(0).putInt(1)      // dwStreams = 1
      .putInt(0)
      .putInt(width).putInt(height): Unit // + 16 reserved zero bytes
    val strh = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    strh.put("vids".getBytes("US-ASCII")).put("MJPG".getBytes("US-ASCII"))
      .putInt(0).putShort(0).putShort(0).putInt(0)
      .putInt(1)                // dwScale
      .putInt(fps)              // dwRate
      .putInt(0)
      .putInt(jpegFrames.size): Unit // dwLength (+ zeroed tail)
    val strf = java.nio.ByteBuffer.allocate(40)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    strf.putInt(40)             // biSize
      .putInt(width).putInt(height)
      .putShort(1).putShort(24) // planes, bit count
      .put("MJPG".getBytes("US-ASCII"))
      .putInt(width * height * 3): Unit // biSizeImage (+ zeroed tail)
    val hdrl = list("hdrl", Seq(chunk("avih", avih.array()),
      list("strl", Seq(chunk("strh", strh.array()),
        chunk("strf", strf.array())))))
    val movi = list("movi", jpegFrames.map(chunk("00dc", _)))
    chunk("RIFF", "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi)
  }

  /** Deterministic-per-JVM grayscale JPEG encode of a row-major gray
    * raster — the synthetic-frame source for the MJPEG leg. JPEG is
    * LOSSY: decoded pixels are reader/writer-implementation-defined
    * within the DCT quantization budget, so oracle-checked outputs pin
    * only what survives the codec (geometry, frame counts, raster
    * sizes) plus a bounded content-deviation gate — never exact decoded
    * bytes (the PNG/Y4M legs carry the exact-byte contracts). */
  def encodeJpegGray(width: Int, height: Int, gray: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && gray.length == width * height,
      s"raster length ${gray.length} != ${width}x$height")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val row = new Array[Int](width)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val u = gray(y * width + x) & 0xff
        row(x) = (u << 16) | (u << 8) | u
        x += 1
      }
      img.setRGB(0, y, width, 1, row, 0, width)
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      require(javax.imageio.ImageIO.write(img, "jpg", ios), "no JPEG writer")
      ios.flush()
    } finally ios.close()
    bos.toByteArray
  }

  /** Real PNG/JPEG/BMP/GIF decode via the JDK's built-in `javax.imageio`
    * readers — zero new dependencies (`java.desktop` ships with every JDK
    * and runs fully headless), so the common web-crawl image formats do NOT
    * need the stub. Pixels are normalized to a row-major 3-channel RGB
    * raster regardless of the source color model (palette GIF, grayscale
    * PNG, ...), so downstream features are deterministic across reader
    * implementations.
    *
    * The payload is wrapped in a `MemoryCacheImageInputStream` explicitly:
    * `ImageIO.read(InputStream)` defaults to a FILE-cache stream that spools
    * every blob to executor /tmp — a hidden disk write per decode that
    * throttles exactly the batched hot path this operator runs in (and the
    * alternative, the global `ImageIO.setUseCache(false)`, mutates
    * JVM-process-wide state a library must not touch). */
  def decodeImage(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    // ImageIO.read(ImageInputStream) closes the stream itself (unlike the
    // other read overloads) — closing again throws.
    val img = javax.imageio.ImageIO.read(iis)
    require(img != null, "no ImageIO reader recognized the payload")
    val w = img.getWidth
    val h = img.getHeight
    // Long guard like decodeNetpbm: a pathological header must fail fast,
    // not wrap Int and allocate a tiny raster.
    require(w.toLong * h * 3 <= Int.MaxValue, s"image too large (${w}x$h)")
    val out = new Array[Byte](w * h * 3)
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val p = row(x)
        val d = (y * w + x) * 3
        out(d) = ((p >> 16) & 0xff).toByte
        out(d + 1) = ((p >> 8) & 0xff).toByte
        out(d + 2) = (p & 0xff).toByte
        x += 1
      }
      y += 1
    }
    (w, h, out)
  }

  /** Lossless PNG writer for a row-major 3-channel RGB raster — the encode
    * half of the ImageIO path (same re-emit contract as [[encodeWavPcm16]]
    * and the netpbm re-emit in [[resize]]). Memory-cached output stream for
    * the same no-temp-file reason as [[decodeImage]]. */
  def encodePng(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && rgb.length == width * height * 3,
      s"raster length ${rgb.length} != ${width}x$height x3")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val row = new Array[Int](width)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val s = (y * width + x) * 3
        row(x) = ((rgb(s) & 0xff) << 16) | ((rgb(s + 1) & 0xff) << 8) |
          (rgb(s + 2) & 0xff)
        x += 1
      }
      img.setRGB(0, y, width, 1, row, 0, width)
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      require(javax.imageio.ImageIO.write(img, "png", ios), "no PNG writer")
      ios.flush()
    } finally ios.close()
    bos.toByteArray
  }

  /** The ImageIO-backed formats: decoded for real by [[decodeImage]]. */
  private val imageIoFormats = Set("png", "jpg", "jpeg", "bmp", "gif")

  /** Adapt documents to PNG image rows: each UTF-8 text byte u becomes one
    * gray pixel (u, u, u) of a 1×n image written through the REAL PNG
    * encoder — so the downstream feature query exercises encode → ImageIO
    * decode → RGB normalization end-to-end while staying recomputable from
    * the text bytes by an independent engine (the `mm_image_stats` oracle;
    * the audio twin is [[asAudio]]). Empty texts become a single black
    * pixel (PNG has no 0-dimension images) — the oracle mirrors it with
    * `greatest(n, 1)`. */
  def asImagePng(docs: DataFrame, batchSize: Int = 64): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.grouped(batchSize).flatMap(_.iterator.map {
        case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          val gray = if (bytes.isEmpty) Array[Byte](0) else bytes
          val rgb = new Array[Byte](gray.length * 3)
          var i = 0
          while (i < gray.length) {
            rgb(3 * i) = gray(i); rgb(3 * i + 1) = gray(i)
            rgb(3 * i + 2) = gray(i)
            i += 1
          }
          MediaRecord(id, "image", encodePng(1, gray.length, rgb), "png",
            1, gray.length, 1)
      }))
  }

  /** Adapt documents to AUDIO media rows: each UTF-8 text byte u becomes
    * one centered 16-bit mono sample (u − 128)·256 at 16 kHz, written
    * through the REAL wav encoder — so the downstream feature query
    * exercises encode → RIFF walk → decode end-to-end while staying
    * recomputable from the text bytes by an independent engine (the
    * `mm_audio_stats` oracle). Batched mapPartitions like every codec-side
    * operator here. */
  def asAudio(docs: DataFrame, batchSize: Int = 64): Dataset[MediaRecord] =
    asAudioWith(docs, encodeWavPcm16(_), batchSize)

  /** The shared text→samples→WAV adapter both audio legs configure
    * (review r19 — one copy of the byte-to-sample mapping, so the PCM
    * and µ-law legs cannot silently diverge): each UTF-8 text byte u
    * becomes one centered 16-bit mono sample (u − 128)·256, written
    * through `encoder`. */
  private def asAudioWith(docs: DataFrame,
                          encoder: Array[Short] => Array[Byte],
                          batchSize: Int): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.grouped(batchSize).flatMap(_.iterator.map {
        case (id, text) =>
          val samples = text.getBytes("UTF-8")
            .map(b => (((b & 0xff) - 128) * 256).toShort)
          MediaRecord(id, "audio", encoder(samples), "wav",
            0, 0, samples.length)
      }))
  }

  /** Adapt documents to COMPRESSED audio rows: the same centered 16-bit
    * samples as [[asAudio]], but written through the µ-law encoder
    * (audioFormat 7, 2:1 compression) — so the downstream feature query
    * exercises compress → RIFF walk → exact µ-law expansion end-to-end,
    * and stays EXACTLY recomputable from the text bytes by an independent
    * engine (the `mm_mulaw_stats` oracle replays the G.711 arithmetic —
    * the property the lossy-but-exactly-specified codec buys). */
  def asAudioMulaw(docs: DataFrame, batchSize: Int = 64): Dataset[MediaRecord] =
    asAudioWith(docs, encodeWavMulaw(_), batchSize)

  /** Extracted features per video row: container geometry + exact
    * integer byte statistics over ALL decoded frame planes (all-long, so
    * hash-compared outputs stay exact — the [[AudioFeatures]] contract). */
  case class VideoFeatures(doc_id: Long, width: Long, height: Long,
                           n_frames: Long, n_bytes: Long, sum_bytes: Long)

  /** Adapt documents to VIDEO media rows: UTF-8 text bytes become the
    * luma planes of 4×2 mono frames (8 bytes per frame, the last frame
    * zero-padded; empty text → one all-zero frame, since a Y4M stream
    * with zero frames carries no content), written through the REAL Y4M
    * encoder — so downstream queries exercise encode → header parse →
    * frame walk end-to-end while staying recomputable from the text
    * bytes by an independent engine (the `mm_video_stats` oracle; same
    * construction discipline as [[asImagePng]]/[[asAudio]]). */
  def asVideo(docs: DataFrame, batchSize: Int = 64): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.grouped(batchSize).flatMap(_.iterator.map {
        case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          val nFrames = math.max(1, (bytes.length + 7) / 8)
          val frames = (0 until nFrames).map { f =>
            val fr = new Array[Byte](8)
            var j = 0
            while (j < 8 && f * 8 + j < bytes.length) {
              fr(j) = bytes(f * 8 + j); j += 1
            }
            fr
          }
          MediaRecord(id, "video", encodeY4m(4, 2, frames), "y4m",
            4, 2, nFrames)
      }))
  }

  /** Extracted features per MJPEG row: container geometry + frame count
    * + DECODED raster byte count (all deterministic — JPEG preserves
    * geometry exactly) and the decoded byte sum, which is LOSSY-codec
    * output: reader-implementation-defined within the quantization
    * budget, carried for bounded content gates, never hash-compared. */
  case class MjpegFeatures(doc_id: Long, width: Long, height: Long,
                           n_frames: Long, n_raster_bytes: Long,
                           sum_bytes: Long)

  /** Adapt documents to MJPEG-in-AVI media rows: UTF-8 text bytes become
    * the gray pixels of 8×8 frames (64 bytes per frame, zero-padded;
    * empty text → one black frame), each REAL-JPEG-encoded
    * ([[encodeJpegGray]]) and wrapped in the REAL AVI container
    * ([[encodeAviMjpeg]]) — the compressed-video sibling of [[asVideo]]
    * (whose Y4M leg carries the exact-byte contract; this leg carries
    * the real-compression one). */
  def asVideoMjpeg(docs: DataFrame, batchSize: Int = 64): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.grouped(batchSize).flatMap(_.iterator.map {
        case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          val nFrames = math.max(1, (bytes.length + 63) / 64)
          val frames = (0 until nFrames).map { f =>
            val fr = new Array[Byte](64)
            var j = 0
            while (j < 64 && f * 64 + j < bytes.length) {
              fr(j) = bytes(f * 64 + j); j += 1
            }
            encodeJpegGray(8, 8, fr)
          }
          MediaRecord(id, "video", encodeAviMjpeg(8, 8, frames), "avi",
            8, 8, nFrames)
      }))
  }

  /** MJPEG feature extraction over avi media rows: real container walk +
    * real JPEG decode per frame, geometry cross-checked between the
    * `avih` header and every decoded frame — the compressed-video
    * analogue of [[extractVideoFeatures]], same batched seam. */
  def extractMjpegFeatures(media: Dataset[MediaRecord],
                           batchSize: Int = 64): Dataset[MjpegFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap(_.iterator.map { r =>
      require(r.format == "avi", s"not an avi payload (${r.format})")
      val v = decodeAviMjpeg(r.payload)
      var n = 0L
      var sum = 0L
      v.frames.foreach { case (fw, fh, px) =>
        require(fw == v.width && fh == v.height,
          s"frame ${fw}x$fh != container ${v.width}x${v.height}")
        n += px.length
        px.foreach(b => sum += (b & 0xff))
      }
      MjpegFeatures(r.doc_id, v.width.toLong, v.height.toLong,
        v.frames.length.toLong, n, sum)
    }))
  }

  /** REAL per-frame fan-out for y4m media rows: one [[Frame]] row per
    * container frame via the real frame walk — the video-keyframe access
    * pattern [[frameSample]] approximates byte-wise for formats without
    * a codec. Explodes distributed, no shuffle. */
  def videoFrames(media: Dataset[MediaRecord]): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      require(r.format == "y4m", s"not a y4m payload (${r.format})")
      decodeY4m(r.payload).frames.iterator.zipWithIndex.map {
        case (f, i) => Frame(r.doc_id, i, f)
      }
    }
  }

  /** Video feature extraction over y4m media rows: real header parse +
    * frame walk, exact integer statistics — the video analogue of
    * [[extractAudioFeatures]], same batched mapPartitions seam. */
  def extractVideoFeatures(media: Dataset[MediaRecord],
                           batchSize: Int = 64): Dataset[VideoFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap(_.iterator.map { r =>
      require(r.format == "y4m", s"not a video payload (${r.format})")
      val v = decodeY4m(r.payload)
      var sum = 0L
      var n = 0L
      v.frames.foreach(_.foreach { b => sum += (b & 0xff); n += 1 })
      VideoFeatures(r.doc_id, v.width.toLong, v.height.toLong,
        v.frames.length.toLong, n, sum)
    }))
  }

  /** Audio feature extraction over wav media rows: exact integer sample
    * count and sum plus the decoded header metadata — the audio analogue of
    * [[extractFeatures]], same batched mapPartitions seam. */
  def extractAudioFeatures(media: Dataset[MediaRecord],
                           batchSize: Int = 64): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap(_.iterator.map { r =>
      require(r.format == "wav", s"not an audio payload (${r.format})")
      val w = decodeWav(r.payload)
      var sum = 0L
      var n = 0L
      if (w.bits_per_sample == 16) {
        var i = 0
        while (i < w.data.length) {
          sum += ((w.data(i) & 0xff) | (w.data(i + 1) << 8)).toShort
          n += 1
          i += 2
        }
      } else {
        w.data.foreach { b => sum += (b & 0xff); n += 1 }
      }
      AudioFeatures(r.doc_id, w.channels.toLong, w.sample_rate.toLong,
        w.bits_per_sample.toLong, n, sum)
    }))
  }

  /** Bytes per pixel for the formats that decode for real; None = stub. */
  private def realChannels(format: String): Option[Int] = format match {
    case "ppm" => Some(3)
    case "pgm" => Some(1)
    case _     => None
  }

  /** Format dispatch: `ppm`/`pgm` decode for real ([[decodePpm]] /
    * [[decodePgm]]), `png`/`jpg`/`jpeg`/`bmp`/`gif` through the JDK's
    * ImageIO readers ([[decodeImage]]), `wav` through the RIFF walk,
    * `y4m` through the real container frame walk (decoded bytes = the
    * concatenated frame planes); everything else (compressed video /
    * audio containers) keeps the documented stub. Every batched operator
    * below routes through here, so a new codec is one new case. */
  def decode(payload: Array[Byte], format: String): Array[Byte] =
    format match {
      case "ppm" => decodePpm(payload)._3
      case "pgm" => decodePgm(payload)._3
      case "wav" => decodeWav(payload).data // decoded frame = raw PCM bytes
      case "y4m" => decodeY4m(payload).frames.flatten
      case "avi" => decodeAviMjpeg(payload).frames.flatMap(_._3)
      case f if imageIoFormats(f) => decodeImage(payload)._3
      case _     => decodeStub(payload, format)
    }

  /** Per-image 64-bit difference hash, as its four 16-bit band chunks
    * (`c0..c3`) — the join-ready signature shape `Dedup`'s simhash banding
    * machinery consumes directly. */
  case class ImageHash(doc_id: Long, c0: Long, c1: Long, c2: Long, c3: Long)

  /** Raster dispatch with dimensions: (width, height, channels, pixels) for
    * every format that decodes for real. dHash needs the 2-D geometry, not
    * just the byte stream [[decode]] returns; formats with no real codec
    * fail fast here — a perceptual hash over undecoded container bytes
    * would be content-meaningless. */
  def decodeRaster(payload: Array[Byte], format: String): (Int, Int, Int, Array[Byte]) =
    format match {
      case "ppm" => val (w, h, px) = decodePpm(payload); (w, h, 3, px)
      case "pgm" => val (w, h, px) = decodePgm(payload); (w, h, 1, px)
      case "y4m" =>
        // first frame's LUMA plane as a grayscale raster (every supported
        // colorspace stores Y first) — the keyframe a perceptual hash
        // ([[imageDHash]]) of a video row should fingerprint
        val v = decodeY4m(payload)
        require(v.frames.nonEmpty, "y4m payload has no frames")
        (v.width, v.height, 1, v.frames(0).take(v.width * v.height))
      case "avi" =>
        // first MJPEG frame's decoded RGB raster — the keyframe, same
        // convention as the y4m leg
        val v = decodeAviMjpeg(payload)
        require(v.frames.nonEmpty, "avi payload has no frames")
        val (fw, fh, px) = v.frames(0)
        (fw, fh, 3, px)
      case f if imageIoFormats(f) =>
        val (w, h, px) = decodeImage(payload); (w, h, 3, px)
      case f => throw new IllegalArgumentException(
        s"no real raster codec for format '$f'")
    }

  /** dHash (difference hash) of a decoded raster: nearest-neighbor sample a
    * 9×8 grayscale grid, emit bit r·8+c = 1 iff the right neighbor is
    * brighter — the row-gradient signature that is invariant to brightness
    * shifts, lossless re-encodes, and integer nearest-neighbor rescales
    * (sample positions `c·w div 9` / `r·h div 8` are floor-stable under
    * k× upscaling: floor(floor(k·x)/k) = floor(x)). All-integer — gray is
    * (r+g+b) div 3 — so an independent engine recomputes it exactly.
    * Returned as four 16-bit chunks (bit i lives in chunk i div 16 at
    * offset i mod 16) so no signed-64-bit shifting ever happens in any
    * engine. */
  def dHashChunks(w: Int, h: Int, ch: Int, px: Array[Byte]): Array[Long] = {
    require(w > 0 && h > 0 && px.length == w * h * ch,
      s"raster length ${px.length} != ${w}x$h x$ch")
    def gray(x: Int, y: Int): Int =
      if (ch == 1) px(y * w + x) & 0xff
      else {
        val i = (y * w + x) * ch
        ((px(i) & 0xff) + (px(i + 1) & 0xff) + (px(i + 2) & 0xff)) / 3
      }
    val cs = new Array[Long](4)
    var r = 0
    while (r < 8) {
      val sy = r * h / 8
      var c = 0
      while (c < 8) {
        if (gray((c + 1) * w / 9, sy) > gray(c * w / 9, sy)) {
          val i = r * 8 + c
          cs(i / 16) |= 1L << (i % 16)
        }
        c += 1
      }
      r += 1
    }
    cs
  }

  /** Perceptual image signatures over media rows: decode → 9×8 gray grid →
    * 64-bit dHash, inside the same batched mapPartitions codec seam as
    * [[extractFeatures]]. The output is one fixed-width row per image —
    * feed it to `Dedup.imageHashPairs` (banding + hamming verify) for
    * near-duplicate IMAGE detection, the visual twin of text simhash. */
  def imageDHash(media: Dataset[MediaRecord],
                 batchSize: Int = 64): Dataset[ImageHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap(_.iterator.map { r =>
      val (w, h, ch, px) = decodeRaster(r.payload, r.format)
      val cs = dHashChunks(w, h, ch, px)
      ImageHash(r.doc_id, cs(0), cs(1), cs(2), cs(3))
    }))
  }

  /** Adapt documents to 2-D grid PNG rows: UTF-8 text bytes wrap into rows
    * of `gridWidth` gray pixels (zero-padded to fill the last row; empty
    * text → one black row), written through the REAL PNG encoder — the 2-D
    * sibling of [[asImagePng]] (whose 1×n strips are structurally
    * degenerate for row-gradient hashing: every row samples one source
    * column). An independent engine recomputes pixel (x, y) as text byte
    * y·gridWidth + x (the `dd_image_phash` oracle). */
  def asImageGridPng(docs: DataFrame, gridWidth: Int = 8,
                     batchSize: Int = 64): Dataset[MediaRecord] = {
    require(gridWidth > 0, "gridWidth must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.grouped(batchSize).flatMap(_.iterator.map {
        case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          val h = math.max(1, (bytes.length + gridWidth - 1) / gridWidth)
          val rgb = new Array[Byte](gridWidth * h * 3)
          var i = 0
          while (i < bytes.length) {
            rgb(3 * i) = bytes(i); rgb(3 * i + 1) = bytes(i)
            rgb(3 * i + 2) = bytes(i)
            i += 1
          }
          MediaRecord(id, "image", encodePng(gridWidth, h, rgb), "png",
            gridWidth, h, 1)
      }))
  }

  /** Perceptual AUDIO fingerprint — the acoustic sibling of [[imageDHash]]
    * completing the third modality of the dedup family: decode PCM, bucket
    * the |sample| energy into 65 windows (sample j of n lands in window
    * (65·j) div n — the same closed-form assignment both engines compute),
    * and emit bit i = 1 iff window i+1 carries more energy than window i.
    * Envelope-gradient bits are invariant to exact amplitude scaling
    * (k·a > k·b ⟺ a > b on integer sums), polarity inversion (|s|), and
    * lossless re-encodes — the variations a re-mastered or re-encoded
    * duplicate recording exhibits. All-integer; four 16-bit chunks, so
    * `Dedup.imageHashPairs` (banding + hamming verify) applies unchanged.
    * Same batched mapPartitions codec seam as [[extractAudioFeatures]]. */
  def audioDHash(media: Dataset[MediaRecord],
                 batchSize: Int = 64): Dataset[ImageHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap(_.iterator.map { r =>
      require(r.format == "wav", s"not an audio payload (${r.format})")
      val w = decodeWav(r.payload)
      val v = new Array[Long](65)
      val n =
        if (w.bits_per_sample == 16) w.data.length / 2 else w.data.length
      var j = 0
      while (j < n) {
        val s =
          if (w.bits_per_sample == 16)
            ((w.data(2 * j) & 0xff) | (w.data(2 * j + 1) << 8)).toShort.toLong
          else (w.data(j) & 0xff).toLong - 128L
        v(((65L * j) / n).toInt) += math.abs(s)
        j += 1
      }
      val cs = new Array[Long](4)
      var i = 0
      while (i < 64) {
        if (v(i + 1) > v(i)) cs(i / 16) |= 1L << (i % 16)
        i += 1
      }
      ImageHash(r.doc_id, cs(0), cs(1), cs(2), cs(3))
    }))
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

  /** Shared nearest-neighbor downscale of a row-major raster: sample pixel
    * (x·factor, y·factor), output max(1, dim/factor) per axis. */
  private def resampleRaster(w: Int, h: Int, ch: Int, px: Array[Byte],
                             factor: Int): (Int, Int, Array[Byte]) = {
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
    (ow, oh, out)
  }

  /** Downscale by an integer factor. For the real codecs this is a REAL
    * nearest-neighbor pixel resample: decode, resample, re-emit a VALID
    * payload — netpbm re-emits its own format; the ImageIO formats
    * (`png`/`jpg`/`jpeg`/`bmp`/`gif`) re-emit PNG with the row's `format`
    * updated, because a resized image must re-enter the pipeline LOSSLESSLY
    * (re-encoding through a lossy jpg writer would make every downstream
    * value encoder-version-dependent — the same determinism contract the
    * hash-compared oracles rely on everywhere else). Other formats keep the
    * documented byte-stride stub (output length = ceil(len / factor)). Runs
    * inside the same batched mapPartitions shape as feature extraction. */
  def resize(media: Dataset[MediaRecord], factor: Int): Dataset[MediaRecord] = {
    require(factor > 0, "resize factor must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      realChannels(r.format) match {
        case Some(ch) =>
          val magic = if (ch == 3) "P6" else "P5"
          val (w, h, px) = decodeNetpbm(r.payload, magic, ch)
          val (ow, oh, out) = resampleRaster(w, h, ch, px, factor)
          val header = s"$magic\n$ow $oh\n255\n".getBytes("US-ASCII")
          r.copy(payload = header ++ out, width = ow, height = oh)
        case None if imageIoFormats(r.format) =>
          val (w, h, px) = decodeImage(r.payload)
          val (ow, oh, out) = resampleRaster(w, h, 3, px, factor)
          r.copy(payload = encodePng(ow, oh, out), format = "png",
            width = ow, height = oh)
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

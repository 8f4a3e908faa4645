package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal

class MultimodalSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val docs = Seq(
    (0L, "abcd", "en", "s0", 4L),
    (1L, "0123456789abcdef0123456789abcdef012345", "en", "s1", 38L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("asMedia carries the payload bytes and typed metadata") {
    val media = Multimodal.asMedia(docs).collect().sortBy(_.doc_id)
    assert(media(0).payload.toSeq === "abcd".getBytes("UTF-8").toSeq)
    assert(media(0).media_type === "image")
    assert(media(0).width === 16 && media(0).height === 16)
  }

  test("extractFeatures is deterministic and consistent with the payload") {
    val feats = Multimodal.extractFeatures(Multimodal.asMedia(docs), batchSize = 1)
      .collect().sortBy(_.doc_id)
    assert(feats(0).n_bytes === 4L)
    // 'a'..'d' = 97..100 → mean 98.5, all in histogram bin 6 (96-111).
    assert(feats(0).mean_byte === 98.5)
    assert(feats(0).histogram(6) === 4L)
    assert(feats(0).histogram.sum === feats(0).n_bytes)
    assert(feats(1).histogram.sum === feats(1).n_bytes)
  }

  test("resize stub keeps every factor-th byte and scales metadata") {
    val out = Multimodal.resize(Multimodal.asMedia(docs), factor = 2)
      .collect().sortBy(_.doc_id)
    assert(out(0).payload.toSeq === "ac".getBytes("UTF-8").toSeq) // from "abcd"
    assert(out(0).width === 8 && out(0).height === 8)             // 16/2
    assert(out(1).payload.length === 19)                          // ceil(38/2)
  }

  /** Golden 2×2 P6 PPM: comment-bearing header + 12 known raster bytes. */
  private def goldenPpm: Array[Byte] = {
    val header = "P6\n# golden test image\n2 2\n255\n".getBytes("US-ASCII")
    val raster = Array[Int](
      255, 0, 0,   0, 255, 0,   // red, green
      0, 0, 255,   17, 34, 51   // blue, arbitrary
    ).map(_.toByte)
    header ++ raster
  }

  test("decodePpm parses the golden PPM: dimensions, comments, raster") {
    val (w, h, px) = Multimodal.decodePpm(goldenPpm)
    assert(w === 2 && h === 2)
    assert(px.length === 12)
    assert(px.map(_ & 0xff).toSeq === Seq(255, 0, 0, 0, 255, 0, 0, 0, 255, 17, 34, 51))
    // malformed inputs fail fast, not silently
    intercept[IllegalArgumentException](Multimodal.decodePpm("P3\n1 1\n255\n".getBytes))
    intercept[IllegalArgumentException](Multimodal.decodePpm("P6\n9 9\n255\nxx".getBytes))
    // crafted header whose w*h*3 overflows Int to exactly 0: must fail the
    // truncation check (Long arithmetic), not decode an empty raster
    intercept[IllegalArgumentException](
      Multimodal.decodePpm("P6\n65536 65536\n255\nxx".getBytes))
  }

  test("ppm resize resamples pixels nearest-neighbor and emits a valid P6 payload") {
    val media = Seq(Multimodal.MediaRecord(7L, "image", goldenPpm, "ppm", 2, 2, 1))
      .toDS()
    val out = Multimodal.resize(media, factor = 2).collect().head
    assert(out.width === 1 && out.height === 1)
    // Re-decodable: the output is a complete P6 file, not bare raster bytes.
    val (w, h, px) = Multimodal.decodePpm(out.payload)
    assert(w === 1 && h === 1)
    // Nearest-neighbor at factor 2 keeps pixel (0,0) of the golden image: red.
    assert(px.map(_ & 0xff).toSeq === Seq(255, 0, 0))
    // Non-ppm formats keep the byte-stride stub contract.
    val stub = Multimodal.resize(Multimodal.asMedia(docs), factor = 2)
      .collect().sortBy(_.doc_id)
    assert(stub(0).payload.toSeq === "ac".getBytes("UTF-8").toSeq)
  }

  /** Golden 3×2 P5 PGM: comment-bearing header + 6 known grayscale bytes. */
  private def goldenPgm: Array[Byte] = {
    val header = "P5\n# golden grayscale\n3 2\n255\n".getBytes("US-ASCII")
    header ++ Array[Int](0, 128, 255, 10, 20, 30).map(_.toByte)
  }

  test("decodePgm parses the golden PGM: dimensions, comments, raster") {
    val (w, h, px) = Multimodal.decodePgm(goldenPgm)
    assert(w === 3 && h === 2)
    assert(px.map(_ & 0xff).toSeq === Seq(0, 128, 255, 10, 20, 30))
    // a P6 payload must not pass the P5 magic check, and vice versa
    intercept[IllegalArgumentException](Multimodal.decodePgm(goldenPpm))
    intercept[IllegalArgumentException](Multimodal.decodePpm(goldenPgm))
    intercept[IllegalArgumentException](Multimodal.decodePgm("P5\n9 9\n255\nxx".getBytes))
  }

  test("pgm resize resamples single-channel pixels and emits a valid P5 payload") {
    val media = Seq(Multimodal.MediaRecord(8L, "image", goldenPgm, "pgm", 3, 2, 1))
      .toDS()
    val out = Multimodal.resize(media, factor = 2).collect().head
    assert(out.width === 1 && out.height === 1)
    val (w, h, px) = Multimodal.decodePgm(out.payload)
    assert(w === 1 && h === 1)
    assert(px.map(_ & 0xff).toSeq === Seq(0))  // pixel (0,0) of the golden
    // and the features path decodes the resized output's raster, not the file
    val f = Multimodal.extractFeatures(Multimodal.resize(media, 1)).collect().head
    assert(f.n_bytes === 6L)
    assert(f.sum_bytes === (0 + 128 + 255 + 10 + 20 + 30).toLong)
  }

  test("extractFeatures routes ppm-format payloads through the real decoder") {
    val media = Seq(Multimodal.MediaRecord(7L, "image", goldenPpm, "ppm", 2, 2, 1))
      .toDS()
    val f = Multimodal.extractFeatures(media).collect().head
    // Features are computed over the 12 RASTER bytes, not the 43-byte file:
    // a stub pass-through would count the header too.
    assert(f.n_bytes === 12L)
    assert(f.sum_bytes === (255 + 255 + 255 + 17 + 34 + 51).toLong)
    assert(f.histogram(15) === 3L)  // the three 255s
    assert(f.histogram(0) === 6L)   // the six zeros
  }

  test("metadata-only queries prune the payload projection entirely") {
    // The design rule from Multimodal.asMedia's scaladoc: binary payloads in
    // their own leaf columns so metadata queries never materialize them.
    val plan = Multimodal.asMedia(docs).toDF().select("doc_id", "width")
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("encode"),
      s"payload encode must be pruned from a metadata-only plan:\n$plan")
  }

  /** Golden WAV: 16-bit mono PCM with a LIST chunk between fmt and data
    * (exercises the generic chunk walk) and an odd-sized skipped chunk
    * (exercises the RIFF pad byte). */
  private def goldenWav: Array[Byte] = {
    val samples = Array[Short](-32768, -1, 0, 1, 32767)
    val plain = Multimodal.encodeWavPcm16(samples, channels = 1, sampleRate = 8000)
    // splice extra chunks between "fmt " (ends at byte 36) and "data"
    val extra = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++
      "INFO".getBytes("US-ASCII") ++
      "junk".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0, 0) ++
      Array[Byte](9, 9, 9, 0) // 3-byte body + pad byte
    val out = plain.take(36) ++ extra ++ plain.drop(36)
    // fix the RIFF size field (bytes 4-7, LE) for the spliced length
    val riffLen = out.length - 8
    (0 until 4).foreach(i => out(4 + i) = ((riffLen >> (8 * i)) & 0xff).toByte)
    out
  }

  test("decodeWav walks RIFF chunks, skips unknown/odd chunks, decodes PCM") {
    val w = Multimodal.decodeWav(goldenWav)
    assert(w.channels === 1 && w.sample_rate === 8000 && w.bits_per_sample === 16)
    assert(w.data.length === 10)
    // little-endian signed 16-bit round trip of the golden samples
    val decoded = w.data.grouped(2)
      .map(p => ((p(0) & 0xff) | (p(1) << 8)).toShort).toSeq
    assert(decoded === Seq[Short](-32768, -1, 0, 1, 32767))
    // malformed inputs fail fast: wrong magic, truncated data chunk,
    // compressed (non-PCM) audioFormat
    intercept[IllegalArgumentException](
      Multimodal.decodeWav("RIFXxxxxWAVE".getBytes))
    val truncated = goldenWav.dropRight(4)
    // fix nothing: the data chunk now claims more bytes than remain
    intercept[IllegalArgumentException](Multimodal.decodeWav(truncated))
    val mulaw = Multimodal.encodeWavPcm16(Array[Short](0))
    mulaw(20) = 7 // audioFormat = 7 (µ-law)
    intercept[IllegalArgumentException](Multimodal.decodeWav(mulaw))
  }

  test("asAudio → extractAudioFeatures is exact over the text bytes") {
    val f = Multimodal.extractAudioFeatures(Multimodal.asAudio(docs))
      .collect().sortBy(_.doc_id).head
    // "abcd": bytes 97..100 → samples (u−128)·256; sum = (394−512)·256
    assert(f.channels === 1L && f.sample_rate === 16000L && f.bits_per_sample === 16L)
    assert(f.n_samples === 4L)
    assert(f.sum_samples === -30208L)
    // 8-bit PCM sums unsigned byte values
    val wav8 = {
      val s16 = Multimodal.encodeWavPcm16(Array[Short](0, 0, 0))
      // rewrite header to 8-bit: bits (byte 34), block align (32), byte
      // rate (28), and a 3-byte data chunk
      val header = s16.take(44)
      header(34) = 8; header(32) = 1
      header(28) = 0x40; header(29) = 0x3e // byte rate 16000
      header(40) = 3 // data size 3
      header.take(44) ++ Array[Byte](0, 128.toByte, 255.toByte)
    }
    val w8 = Multimodal.decodeWav(wav8.take(44 + 3))
    assert(w8.bits_per_sample === 8)
    assert(w8.data.map(_ & 0xff).sum === 0 + 128 + 255)
  }

  test("encodePng → decodeImage roundtrips an RGB raster exactly") {
    // deterministic pseudo-random raster (PNG is lossless, so exact)
    val (w, h) = (5, 4)
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 37 + 11) % 256).toByte)
    val png = Multimodal.encodePng(w, h, rgb)
    assert(png.take(4).toSeq === Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val (dw, dh, out) = Multimodal.decodeImage(png)
    assert(dw === w && dh === h)
    assert(out.toSeq === rgb.toSeq)
    // dispatch routes the ImageIO formats
    assert(Multimodal.decode(png, "png").toSeq === rgb.toSeq)
    // malformed payloads fail fast (no reader claims them)
    intercept[IllegalArgumentException](
      Multimodal.decodeImage("not an image".getBytes))
  }

  test("decodeImage decodes JPEG and BMP through the JDK readers") {
    // BMP is lossless RGB — exact roundtrip through the bmp writer
    val rgb = Array.tabulate(3 * 2 * 3)(i => (i * 29 % 256).toByte)
    val img = new java.awt.image.BufferedImage(3, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 3) {
      val s = (y * 3 + x) * 3
      img.setRGB(x, y, ((rgb(s) & 0xff) << 16) | ((rgb(s + 1) & 0xff) << 8) | (rgb(s + 2) & 0xff))
    }
    def write(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos))
      bos.toByteArray
    }
    val (bw, bh, bout) = Multimodal.decodeImage(write("bmp"))
    assert(bw === 3 && bh === 2 && bout.toSeq === rgb.toSeq)
    // JPEG is lossy: pin dimensions, and pixel values only to a tolerance
    // on a uniform-gray image (DCT is near-exact on constant blocks)
    val gray = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) gray.setRGB(x, y, 0x808080)
    val gbos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(gray, "jpg", gbos))
    val (jw, jh, jout) = Multimodal.decodeImage(gbos.toByteArray)
    assert(jw === 8 && jh === 8)
    assert(jout.forall(b => math.abs((b & 0xff) - 0x80) <= 3))
  }

  test("imageio resize resamples nearest-neighbor and re-emits lossless PNG") {
    // 4×4 gray gradient: pixel (x, y) = 16·(4y + x)
    val rgb = Array.tabulate(4 * 4 * 3)(i => (16 * (i / 3)).toByte)
    val media = Seq(Multimodal.MediaRecord(7L, "image",
      Multimodal.encodePng(4, 4, rgb), "png", 4, 4, 1)).toDS()
    val resized = Multimodal.resize(media, factor = 2).collect().head
    assert(resized.width === 2 && resized.height === 2)
    assert(resized.format === "png")
    val (rw, rh, out) = Multimodal.decodeImage(resized.payload)
    assert(rw === 2 && rh === 2)
    // nearest-neighbor picks source pixels (0,0), (2,0), (0,2), (2,2)
    val expect = Seq(0, 2, 8, 10).map(p => (16 * p).toByte)
      .flatMap(v => Seq(v, v, v))
    assert(out.toSeq === expect)
    // a lossy-format input re-enters the pipeline as PNG, still decodable
    val gray = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4) gray.setRGB(x, y, 0x404040)
    val jbos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(gray, "jpg", jbos))
    val jm = Seq(Multimodal.MediaRecord(8L, "image", jbos.toByteArray,
      "jpg", 4, 4, 1)).toDS()
    val jr = Multimodal.resize(jm, factor = 2).collect().head
    assert(jr.format === "png" && jr.width === 2 && jr.height === 2)
    val (jrw, jrh, _) = Multimodal.decodeImage(jr.payload)
    assert(jrw === 2 && jrh === 2)
  }

  test("asImagePng → extractFeatures is exact over the text bytes") {
    val f = Multimodal.extractFeatures(
      Multimodal.asImagePng(docs)).collect().sortBy(_.doc_id).head
    // "abcd": each byte u becomes gray RGB (u,u,u) → 12 raster bytes,
    // sum = 3·(97+98+99+100)
    assert(f.n_bytes === 12L)
    assert(f.sum_bytes === 3L * 394L)
    // empty text encodes a single black pixel
    val empty = Seq((9L, "", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val fe = Multimodal.extractFeatures(Multimodal.asImagePng(empty))
      .collect().head
    assert(fe.n_bytes === 3L && fe.sum_bytes === 0L)
  }

  test("dHashChunks: monotone gradients set/clear all row-gradient bits") {
    val (w, h) = (9, 8)
    // pixel gray = 20·x: every right neighbor brighter → all 64 bits set
    val inc = Array.tabulate(w * h * 3)(i => (((i / 3) % w) * 20).toByte)
    assert(Multimodal.dHashChunks(w, h, 3, inc).toSeq ===
      Seq(0xFFFFL, 0xFFFFL, 0xFFFFL, 0xFFFFL))
    // reversed ramp → strictly darker rightwards → all bits clear
    val dec = Array.tabulate(w * h * 3)(i => ((8 - (i / 3) % w) * 20).toByte)
    assert(Multimodal.dHashChunks(w, h, 3, dec).toSeq === Seq(0L, 0L, 0L, 0L))
    // single-channel raster: same semantics without the RGB average
    val g = Array.tabulate(w * h)(i => ((i % w) * 20).toByte)
    assert(Multimodal.dHashChunks(w, h, 1, g).toSeq ===
      Seq(0xFFFFL, 0xFFFFL, 0xFFFFL, 0xFFFFL))
  }

  test("imageDHash: re-encode/upscale/brightness collide, distinct images differ") {
    def raster(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] =
      Array.tabulate(w * h * 3)(i => f((i / 3) % w, i / 3 / w).toByte)
    def bmpOf(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val s = (y * w + x) * 3
        img.setRGB(x, y, ((rgb(s) & 0xff) << 16) | ((rgb(s + 1) & 0xff) << 8) |
          (rgb(s + 2) & 0xff))
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "bmp", bos))
      bos.toByteArray
    }
    val base = (x: Int, y: Int) => (x * 31 + y * 17) % 200
    val media = Seq(
      Multimodal.MediaRecord(1L, "image",
        Multimodal.encodePng(16, 12, raster(16, 12, base)), "png", 16, 12, 1),
      // lossless re-encode (different container, same raster)
      Multimodal.MediaRecord(2L, "image",
        bmpOf(16, 12, raster(16, 12, base)), "bmp", 16, 12, 1),
      // 2× nearest-neighbor upscale: floor-stable sampling ⇒ same hash
      Multimodal.MediaRecord(3L, "image",
        Multimodal.encodePng(32, 24, raster(32, 24, (x, y) => base(x / 2, y / 2))),
        "png", 32, 24, 1),
      // uniform brightness shift: every gradient sign unchanged
      Multimodal.MediaRecord(4L, "image",
        Multimodal.encodePng(16, 12, raster(16, 12, (x, y) => base(x, y) + 10)),
        "png", 16, 12, 1),
      // inverted gradients: a genuinely different image
      Multimodal.MediaRecord(5L, "image",
        Multimodal.encodePng(16, 12, raster(16, 12, (x, y) => 199 - base(x, y))),
        "png", 16, 12, 1)
    ).toDS()
    val sig = Multimodal.imageDHash(media).collect()
      .map(s => s.doc_id -> Seq(s.c0, s.c1, s.c2, s.c3)).toMap
    assert(sig(1L) === sig(2L), "lossless re-encode must not move the hash")
    assert(sig(1L) === sig(3L), "2x nearest-neighbor upscale must not move the hash")
    assert(sig(1L) === sig(4L), "brightness shift must not move the hash")
    val hamming = sig(1L).zip(sig(5L))
      .map { case (a, b) => java.lang.Long.bitCount(a ^ b) }.sum
    assert(hamming > 3, s"distinct image too close: hamming $hamming")
    // the banded pair join pairs exactly the perceptual group {1,2,3,4}
    val pairs = graft.ops.Dedup.imageHashPairs(
        Multimodal.imageDHash(media).toDF(), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
  }

  test("audioDHash: re-encode/amplitude/polarity collide, different envelope differs") {
    val base = Array.tabulate(400)(j => (((j * 37) % 160 - 80) * 100).toShort)
    def wav(samples: Array[Short], id: Long) =
      Multimodal.MediaRecord(id, "audio", Multimodal.encodeWavPcm16(samples),
        "wav", 0, 0, samples.length)
    val media = Seq(
      wav(base, 1L),
      wav(base.clone(), 2L),                                // re-encode
      wav(base.map(s => (s * 2).toShort), 3L),              // amplitude ×2
      wav(base.map(s => (-s).toShort), 4L),                 // polarity inverted
      wav(base.reverse, 5L)                                 // reversed envelope
    ).toDS()
    val sig = Multimodal.audioDHash(media).collect()
      .map(s => s.doc_id -> Seq(s.c0, s.c1, s.c2, s.c3)).toMap
    assert(sig(1L) === sig(2L), "re-encode must not move the fingerprint")
    assert(sig(1L) === sig(3L), "exact amplitude scaling preserves gradients")
    assert(sig(1L) === sig(4L), "polarity inversion preserves |energy|")
    val hamming = sig(1L).zip(sig(5L))
      .map { case (a, b) => java.lang.Long.bitCount(a ^ b) }.sum
    assert(hamming > 3, s"reversed envelope too close: hamming $hamming")
    val pairs = graft.ops.Dedup.imageHashPairs(
        Multimodal.audioDHash(media).toDF(), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
  }

  test("asImageGridPng wraps text bytes into an 8-wide zero-padded grid") {
    val docs = Seq((1L, "abcdefghij"), (2L, "")).toDF("doc_id", "text")
    val recs = Multimodal.asImageGridPng(docs).collect()
      .map(r => r.doc_id -> r).toMap
    assert(recs(1L).width === 8 && recs(1L).height === 2)
    val (w, h, px) = Multimodal.decodeImage(recs(1L).payload)
    assert(w === 8 && h === 2)
    val bytes = "abcdefghij".getBytes("UTF-8")
    for (i <- 0 until 16; c <- 0 until 3)
      assert((px(i * 3 + c) & 0xff) === (if (i < 10) bytes(i) & 0xff else 0),
        s"pixel $i channel $c")
    assert(recs(2L).width === 8 && recs(2L).height === 1,
      "empty text becomes one black row")
    assert(Multimodal.decodeImage(recs(2L).payload)._3.forall(_ === 0))
  }

  test("frameSample takes every stride-th fixed-size block") {
    val frames = Multimodal.frameSample(Multimodal.asMedia(docs),
      frameBytes = 16, stride = 2).collect().filter(_.doc_id == 1L).sortBy(_.frame_idx)
    // 38 bytes → blocks 0,1,2 (sizes 16,16,6); stride 2 keeps idx 0 and 2.
    assert(frames.map(_.frame_idx).toSeq === Seq(0, 2))
    assert(frames(0).frame_bytes.length === 16)
    assert(frames(1).frame_bytes.length === 6)
  }

  test("decodeY4m parses the golden 4:2:0 stream: header tags, plane framing, per-frame walk") {
    // hand-built 2x2 C420 stream, two frames: planes Y(4) + U(1) + V(1);
    // F/I/A/X tags must parse (and not affect framing), FRAME params too
    val hdr = "YUV4MPEG2 W2 H2 F30000:1001 It A128:117 C420jpeg Xgolden\n"
    val f0 = Array[Byte](10, 20, 30, 40, 50, 60)
    val f1 = Array[Byte](11, 21, 31, 41, 51, 61)
    val payload = hdr.getBytes("US-ASCII") ++
      "FRAME\n".getBytes("US-ASCII") ++ f0 ++
      "FRAME Xsome-param\n".getBytes("US-ASCII") ++ f1
    val v = Multimodal.decodeY4m(payload)
    assert(v.width === 2 && v.height === 2 && v.colorspace === "420jpeg")
    assert(v.frames.length === 2)
    assert(v.frames(0).toSeq === f0.toSeq)
    assert(v.frames(1).toSeq === f1.toSeq)
    // no C tag → the spec default 4:2:0
    val dflt = Multimodal.decodeY4m(
      "YUV4MPEG2 W2 H2 F25:1\n".getBytes("US-ASCII") ++
        "FRAME\n".getBytes("US-ASCII") ++ f0)
    assert(dflt.colorspace === "420" && dflt.frames.length === 1)
    // truncated raster and bad magic fail fast
    intercept[IllegalArgumentException] {
      Multimodal.decodeY4m(hdr.getBytes("US-ASCII") ++
        "FRAME\n".getBytes("US-ASCII") ++ f0.take(5))
    }
    intercept[IllegalArgumentException] {
      Multimodal.decodeY4m("JUNK W2 H2\nFRAME\n".getBytes("US-ASCII"))
    }
    // odd dimensions cannot be 4:2:0
    intercept[IllegalArgumentException] {
      Multimodal.decodeY4m("YUV4MPEG2 W3 H2 C420\nFRAME\n".getBytes("US-ASCII"))
    }
    // a crafted huge header must fail fast, not wrap Int and mis-frame
    intercept[IllegalArgumentException] {
      Multimodal.decodeY4m(
        "YUV4MPEG2 W65536 H65536 Cmono\nFRAME\n".getBytes("US-ASCII"))
    }
  }

  test("encodeY4m → decodeY4m roundtrips mono and C444 exactly; decodeRaster surfaces the first luma plane") {
    val frames = Seq(Array[Byte](1, 2, 3, 4, 5, 6), Array[Byte](7, 8, 9, 10, 11, 12))
    val v = Multimodal.decodeY4m(Multimodal.encodeY4m(3, 2, frames, "mono"))
    assert(v.width === 3 && v.height === 2 && v.colorspace === "mono")
    assert(v.frames.map(_.toSeq).toSeq === frames.map(_.toSeq))
    val rgb = Seq(Array.tabulate(12)(i => (i * 10).toByte))
    val v444 = Multimodal.decodeY4m(Multimodal.encodeY4m(2, 2, rgb, "444"))
    assert(v444.frames.head.toSeq === rgb.head.toSeq)
    // a frame of the wrong plane size must not encode
    intercept[IllegalArgumentException] {
      Multimodal.encodeY4m(3, 2, Seq(Array[Byte](1, 2, 3)), "mono")
    }
    // decodeRaster: first frame's luma as a 1-channel raster (the
    // perceptual-hash keyframe seam) — for mono the whole frame is luma
    val (w, h, ch, px) = Multimodal.decodeRaster(
      Multimodal.encodeY4m(3, 2, frames, "mono"), "y4m")
    assert((w, h, ch) === ((3, 2, 1)))
    assert(px.toSeq === frames.head.toSeq)
  }

  test("asVideo → extractVideoFeatures / videoFrames are exact over the text bytes") {
    val recs = Multimodal.asVideo(docs)
    val feats = Multimodal.extractVideoFeatures(recs).collect()
      .map(f => f.doc_id -> f).toMap
    val byId = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, text) <- byId) {
      val bytes = text.getBytes("UTF-8")
      val nFrames = math.max(1, (bytes.length + 7) / 8)
      val f = feats(id)
      assert(f.width === 4L && f.height === 2L)
      assert(f.n_frames === nFrames.toLong, s"doc $id frame count")
      assert(f.n_bytes === nFrames * 8L, s"doc $id plane bytes")
      assert(f.sum_bytes === bytes.map(_ & 0xff).map(_.toLong).sum,
        s"doc $id byte sum (zero padding must add nothing)")
    }
    // real per-frame fan-out: frame 0 of doc 1 is its first 8 text bytes
    val fr = Multimodal.videoFrames(recs).collect()
      .filter(_.doc_id == 1L).sortBy(_.frame_idx)
    val b1 = byId(1L).getBytes("UTF-8")
    assert(fr.length === math.max(1, (b1.length + 7) / 8))
    assert(fr.head.frame_bytes.toSeq === b1.take(8).toSeq)
    assert(fr.forall(_.frame_bytes.length === 8))
  }

  test("G.711 mu-law: golden bytes, bounded expansion error, re-encode idempotence, format-7 WAV decodes transparently") {
    // golden pairs from the G.711 definition: 0 encodes to 0xFF (sign 0,
    // exponent 0, mantissa 0 complemented), full-scale clips to 0x80
    assert(Multimodal.mulawEncode(0) === 0xff.toByte)
    assert(Multimodal.mulawEncode(Short.MaxValue) === 0x80.toByte)
    assert(Multimodal.mulawEncode(-32768) === 0x00.toByte)
    assert(Multimodal.mulawDecode(0xff.toByte) === 0.toShort)
    // the expansion error is bounded by half the local step (2^e · 8);
    // re-encoding a decoded value must reproduce the same byte (the
    // decoded value is the segment's representative)
    for (s <- -32768 to 32767 by 7) {
      val b = Multimodal.mulawEncode(s.toShort)
      val d = Multimodal.mulawDecode(b).toInt
      val a = math.min(math.abs(s), 32635) + 132
      val e = (31 - Integer.numberOfLeadingZeros(a)) - 7
      assert(math.abs(d - math.max(-32635, math.min(32635, s))) <= (4 << (e + 3)),
        s"sample $s decoded to $d (step ${1 << (e + 3)})")
      // idempotence up to µ-law's TWO zero codes: 0x7F is "negative
      // zero", which decodes to 0 and re-encodes to the canonical 0xFF
      val re = Multimodal.mulawEncode(Multimodal.mulawDecode(b))
      if (d != 0) assert(re === b, s"re-encode of decode($b) diverged")
      else assert(re === 0xff.toByte, s"zero re-encoded to $re")
    }
    // a format-7 WAV expands transparently to 16-bit PCM: every sample
    // equals the direct decode(encode(s)), at half the stored bytes
    val samples = Array.tabulate(200)(i => ((i - 100) * 317).toShort)
    val wav = Multimodal.encodeWavMulaw(samples, channels = 1,
      sampleRate = 8000)
    val pcm = Multimodal.decodeWav(wav)
    assert(pcm.channels === 1 && pcm.sample_rate === 8000 &&
      pcm.bits_per_sample === 16)
    assert(pcm.data.length === samples.length * 2)
    for (j <- samples.indices) {
      val got = (((pcm.data(2 * j) & 0xff) |
        (pcm.data(2 * j + 1) << 8))).toShort
      assert(got === Multimodal.mulawDecode(Multimodal.mulawEncode(samples(j))),
        s"sample $j")
    }
    // compression is real: stored data is half the PCM size
    assert(wav.length === 44 + samples.length)
  }

  test("encodeAviMjpeg → decodeAviMjpeg: golden container, frames bit-equal to direct JPEG decode, unknown chunks skipped, truncation fails fast") {
    val g0 = Array.tabulate(64)(i => (i * 4).toByte)
    val g1 = Array.tabulate(64)(i => (255 - i * 3).toByte)
    val jpegs = Seq(Multimodal.encodeJpegGray(8, 8, g0),
      Multimodal.encodeJpegGray(8, 8, g1))
    val payload = Multimodal.encodeAviMjpeg(8, 8, jpegs)
    val v = Multimodal.decodeAviMjpeg(payload)
    assert(v.width === 8 && v.height === 8)
    assert(v.frames.length === 2)
    // container walk adds NOTHING to the codec: each frame must equal
    // the direct ImageIO decode of the same JPEG bytes, bit for bit
    for ((jp, i) <- jpegs.zipWithIndex) {
      val (dw, dh, direct) = Multimodal.decodeImage(jp)
      val (fw, fh, walked) = v.frames(i)
      assert((fw, fh) === ((dw, dh)))
      assert(walked.toSeq === direct.toSeq, s"frame $i diverged")
    }
    // unknown top-level chunks (odd-sized JUNK + idx1) must skip
    // generically: splice them before hdrl / after movi and re-fix the
    // RIFF size — the decode must be unchanged
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer
        .allocate(8 + body.length + (body.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      out.array()
    }
    val junk = chunk("JUNK", Array[Byte](1, 2, 3)) // odd size → pad byte
    val idx1 = chunk("idx1", Array.fill[Byte](16)(0))
    val spliced = payload.take(12) ++ junk ++ payload.drop(12) ++ idx1
    val riffLen = spliced.length - 8
    spliced(4) = (riffLen & 0xff).toByte
    spliced(5) = ((riffLen >> 8) & 0xff).toByte
    spliced(6) = ((riffLen >> 16) & 0xff).toByte
    spliced(7) = ((riffLen >> 24) & 0xff).toByte
    val v2 = Multimodal.decodeAviMjpeg(spliced)
    assert(v2.width === 8 && v2.frames.length === 2)
    assert(v2.frames(1)._3.toSeq === v.frames(1)._3.toSeq)
    // truncation mid-frame-chunk, bad magic, and a headerless movi all
    // fail fast — the self-describing-or-fail contract
    intercept[IllegalArgumentException] {
      Multimodal.decodeAviMjpeg(payload.dropRight(10))
    }
    intercept[IllegalArgumentException] {
      Multimodal.decodeAviMjpeg("RIFF   WAVE"
        .getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      // movi list with one frame but NO hdrl/avih: geometry unknown
      val movi = chunk("LIST", "movi".getBytes("US-ASCII") ++
        chunk("00dc", jpegs.head))
      val raw = chunk("RIFF", "AVI ".getBytes("US-ASCII") ++ movi)
      Multimodal.decodeAviMjpeg(raw)
    }
    // decodeRaster("avi"): the first frame's RGB raster (keyframe seam)
    val (rw, rh, rch, rpx) = Multimodal.decodeRaster(payload, "avi")
    assert((rw, rh, rch) === ((8, 8, 3)))
    assert(rpx.toSeq === Multimodal.decodeImage(jpegs.head)._3.toSeq)
  }

  test("asVideoMjpeg → extractMjpegFeatures: geometry exact, decoded content within the JPEG DC budget") {
    val recs = Multimodal.asVideoMjpeg(docs)
    val feats = Multimodal.extractMjpegFeatures(recs).collect()
      .map(f => f.doc_id -> f).toMap
    val byId = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, text) <- byId) {
      val bytes = text.getBytes("UTF-8")
      val nFrames = math.max(1, (bytes.length + 63) / 64)
      val f = feats(id)
      assert(f.width === 8L && f.height === 8L)
      assert(f.n_frames === nFrames.toLong, s"doc $id frame count")
      assert(f.n_raster_bytes === nFrames * 192L, s"doc $id raster bytes")
      // lossy-codec content gate: decoded mean within the DC budget of
      // the source mean (zero padding counted on both sides)
      val srcMean = bytes.map(_ & 0xff).sum.toDouble / (nFrames * 64)
      val decMean = f.sum_bytes.toDouble / f.n_raster_bytes
      assert(math.abs(decMean - srcMean) <= 16.0,
        s"doc $id decoded mean $decMean vs source mean $srcMean")
    }
  }
}

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

  test("frameSample takes every stride-th fixed-size block") {
    val frames = Multimodal.frameSample(Multimodal.asMedia(docs),
      frameBytes = 16, stride = 2).collect().filter(_.doc_id == 1L).sortBy(_.frame_idx)
    // 38 bytes → blocks 0,1,2 (sizes 16,16,6); stride 2 keeps idx 0 and 2.
    assert(frames.map(_.frame_idx).toSeq === Seq(0, 2))
    assert(frames(0).frame_bytes.length === 16)
    assert(frames(1).frame_bytes.length === 6)
  }
}

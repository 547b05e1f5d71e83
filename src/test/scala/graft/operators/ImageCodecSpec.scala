package graft.operators

import javax.imageio.ImageIO

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The REAL multimodal decode path (pure-JDK ImageIO) behind the
  * injectable seams: decodes actual encoded images, degrades to the
  * declared stub on non-image bytes, and produces dHashes band-compatible
  * with m6's relational pipeline.
  */
class ImageCodecSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic PNG: pixel (x, y) gray value from `v` — the shared
    * [[ImageCodec.encodeGrayPng]] fixture generator. */
  private def png(w: Int, h: Int)(v: (Int, Int) => Int): Array[Byte] =
    ImageCodec.encodeGrayPng(w, h)(v)

  private val imgA = png(144, 96)((x, y) => (x * 7 + y * 13 + (x / 9) * (y / 8) * 31) % 256)
  // "re-encode noise": tiny zero-mean per-pixel perturbation of imgA
  private val imgANoisy = png(144, 96)((x, y) =>
    (x * 7 + y * 13 + (x / 9) * (y / 8) * 31) % 256 + ((x + y) % 5 - 2))
  private val imgB = png(144, 96)((x, y) => 255 - (x * 11 + y * 3) % 256)

  test("real decode: PNG bytes produce an 8x8 pooled feature; non-images fall back to the stub") {
    val feats = ImageCodec.imageFeatures(imgA)
    assert(feats.isDefined && feats.get.length == 64)
    assert(feats.get.forall(f => f >= 0f && f <= 1f))
    // deterministic across calls
    assert(ImageCodec.imageFeatures(imgA).get.toSeq == feats.get.toSeq)
    // text bytes are not an image: fallback IS the declared stub
    val text = "just some corpus text, definitely not a PNG".getBytes("UTF-8")
    assert(ImageCodec.imageFeatures(text).isEmpty)
    assert(ImageCodec.featuresOrStub(text).toSeq == Multimodal.decodeStub(text).toSeq)
    // truncated/corrupt image bytes must degrade, not throw
    val corrupt = imgA.take(40)
    assert(ImageCodec.featuresOrStub(corrupt).toSeq == Multimodal.decodeStub(corrupt).toSeq)
  }

  test("real resample: resize re-encodes at the target dimensions, decodable round-trip") {
    val resized = ImageCodec.resizeImage(imgA, 50, 40)
    assert(resized.isDefined)
    val back = ImageIO.read(new java.io.ByteArrayInputStream(resized.get))
    assert(back.getWidth == 50 && back.getHeight == 40)
    assert(ImageCodec.resizeImage("not an image".getBytes("UTF-8"), 5, 5).isEmpty)
  }

  test("real perceptual dHash: re-encode noise stays within the m6 band-join hamming budget") {
    val (ha, hn, hb) = (ImageCodec.dhashFromImage(imgA).get,
      ImageCodec.dhashFromImage(imgANoisy).get, ImageCodec.dhashFromImage(imgB).get)
    // sign-safe 63-bit pack, like the relational dHash63
    assert(ha >= 0 && hn >= 0 && hb >= 0)
    val near = java.lang.Long.bitCount(ha ^ hn)
    val far = java.lang.Long.bitCount(ha ^ hb)
    assert(near <= 3, s"noise twin moved $near bits — outside m6's hamming<=3 recall budget")
    assert(far > 3, s"distinct images at hamming $far would collide as near-dups")
  }

  test("real image near-dup: decoded dHashes run the SAME band join as m6 and find the noisy twins") {
    // 6 distinct images, each with a noise-perturbed re-encode twin at
    // id+100 — the twins MUST pair (hamming <= 3 by the dHash spec
    // above, pigeonhole recall 1 through the 4x16 banding), distinct
    // images must not
    val base = (0 until 6).map(k =>
      (k.toLong, png(144, 96)((x, y) => (x * (5 + 2 * k) + y * (11 + k) + (x / 12) * (y / 8) * (3 + k)) % 256)))
    val twins = (0 until 6).map(k =>
      (k + 100L, png(144, 96)((x, y) =>
        (x * (5 + 2 * k) + y * (11 + k) + (x / 12) * (y / 8) * (3 + k)) % 256 + ((x + y) % 5 - 2))))
    val hashes = (base ++ twins).map { case (id, bytes) =>
      (id, ImageCodec.dhashFromImage(bytes).get)
    }.toDF("doc_id", "h")
    val pairs = Multimodal.dhashNearDupsFromHashes(hashes).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 6).map(k => (k.toLong, k + 100L)).toSet
    assert(expected.subsetOf(pairs),
      s"missed noisy-twin pairs: ${(expected -- pairs).mkString(",")}")
    // no cross-image collisions: every found pair is a planted twin
    assert(pairs.subsetOf(expected), s"false near-dups: ${(pairs -- expected).mkString(",")}")
  }

  test("real DCT pHash: deterministic, sign-safe, noise-robust, and distinct across images") {
    val (ha, hn, hb) = (ImageCodec.pHashFromImage(imgA).get,
      ImageCodec.pHashFromImage(imgANoisy).get, ImageCodec.pHashFromImage(imgB).get)
    // shared 63-bit sign-safe pack (the band-join contract)
    assert(ha >= 0 && hn >= 0 && hb >= 0)
    assert(ImageCodec.pHashFromImage(imgA).get == ha)
    // the DCT keys on low-frequency structure, so zero-mean per-pixel
    // noise moves few bits; structurally different images move many
    val near = java.lang.Long.bitCount(ha ^ hn)
    val far = java.lang.Long.bitCount(ha ^ hb)
    assert(near <= 3, s"noise twin moved $near pHash bits")
    assert(far > 10, s"distinct images at pHash hamming $far")
    // non-images degrade to None, not an exception
    assert(ImageCodec.pHashFromImage("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("batched decode through Spark handles a mixed image/text payload column") {
    val rows = Seq(
      (1L, imgA), (2L, imgB),
      (3L, "plain text payload one".getBytes("UTF-8")),
      (4L, "plain text payload two".getBytes("UTF-8")))
    val payloads = rows.toDF("doc_id", "payload")
    val out = Multimodal.extractFeaturesBatched(payloads, batchSize = 3,
        decoder = ImageCodec.batchFeaturesOrStub)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2).toArray).toMap
    // image rows carry the REAL 64-dim pooled features, equal to the
    // local single-image decode; text rows carry the 8-dim stub
    assert(out(1L).toSeq == ImageCodec.imageFeatures(imgA).get.toSeq)
    assert(out(2L).toSeq == ImageCodec.imageFeatures(imgB).get.toSeq)
    assert(out(3L).length == 8 && out(4L).length == 8)
    assert(out(3L).toSeq == Multimodal.decodeStub(rows(2)._2).toSeq)
  }
}

package graft.operators

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** REAL image decode/resample for the multimodal seams (SURVEY.md §2
  * F2/F4/F5/F6) — pure JDK (`javax.imageio` + `java.awt.image`, both
  * headless-safe), no external codec libraries: PNG, JPEG, BMP and GIF
  * payloads decode for real; anything unrecognized (e.g. this repo's
  * text-bytes test corpus) falls back to the declared deterministic
  * stub, so the same operator runs mixed/dirty 100 TB payload columns
  * without a per-format pre-filter.
  *
  * Everything here is executor-side per-row/per-batch work behind the
  * `mapPartitions` seams [[Multimodal.extractFeaturesBatched]] and
  * [[Multimodal.resizeToBox]] expose — the Spark plan shape is identical
  * to the stub path.
  */
object ImageCodec {

  // in-memory stream decode only: ImageIO's default disk-backed stream
  // cache writes temp files per decode — per-row temp IO on executors
  ImageIO.setUseCache(false)

  /** Deterministic gray PNG from a pixel function — the shared fixture
    * generator for the decode specs and the Demo's image scenario (one
    * definition, so both exercise identical payload bytes).
    */
  def encodeGrayPng(w: Int, h: Int)(v: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = math.max(0, math.min(255, v(x, y)))
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic gray JPEG from a pixel function (the JDK's built-in
    * JPEG writer — pure-JDK, no native deps): the m14 fixture leg that
    * exercises the SOF header walk with REAL encoder output, so the
    * sniffer's dims are proven against bytes it didn't hand-build.
    */
  def encodeGrayJpeg(w: Int, h: Int)(v: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = math.max(0, math.min(255, v(x, y)))
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** Decode + resample to a `w` x `h` GRAYSCALE thumbnail in one
    * Graphics2D pass (bilinear), returning luma samples in [0, 1]
    * row-major — the primitive features/dHash build on. None when the
    * bytes are not a decodable image (sniff failure, truncation, or a
    * codec exception — dirty corpora contain all three).
    */
  def grayThumb(bytes: Array[Byte], w: Int, h: Int): Option[Array[Float]] =
    try {
      val src = ImageIO.read(new ByteArrayInputStream(bytes))
      if (src == null) None
      else {
        val dst = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
        val g = dst.createGraphics()
        g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
          RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, w, h, null)
        g.dispose()
        val r = dst.getRaster
        Some(Array.tabulate(w * h)(i => r.getSample(i % w, i / w, 0) / 255f))
      }
    } catch { case _: Exception => None }

  /** 64-dim real image feature: the 8x8 mean-pooled grayscale thumbnail
    * (the classic pre-embedding pooling). None for non-images.
    */
  def imageFeatures(bytes: Array[Byte]): Option[Array[Float]] =
    grayThumb(bytes, 8, 8)

  /** Per-row decoder for [[Multimodal.extractFeatures]]-shaped seams:
    * real decode when the payload is an image, the deterministic stub
    * otherwise — one function that survives a mixed payload column.
    */
  def featuresOrStub(bytes: Array[Byte]): Array[Float] =
    imageFeatures(bytes).getOrElse(Multimodal.decodeStub(bytes))

  /** Vectorized-decoder signature for
    * [[Multimodal.extractFeaturesBatched]]'s injectable seam.
    */
  def batchFeaturesOrStub(batch: Seq[Array[Byte]]): Seq[Array[Float]] =
    batch.map(featuresOrStub)

  /** REAL pixel resample: decode, bilinear-draw into (outW, outH),
    * re-encode as PNG. None for non-images — callers fall back to the
    * stub's byte-count contract, which is what [[Multimodal.resizeToBox]]
    * oracle-checks.
    */
  def resizeImage(bytes: Array[Byte], outW: Int, outH: Int): Option[Array[Byte]] =
    try {
      val src = ImageIO.read(new ByteArrayInputStream(bytes))
      if (src == null) None
      else {
        val dst = new BufferedImage(outW, outH, BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
          RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, outW, outH, null)
        g.dispose()
        val out = new ByteArrayOutputStream()
        ImageIO.write(dst, "png", out)
        Some(out.toByteArray)
      }
    } catch { case _: Exception => None }

  /** REAL perceptual dHash from decoded pixels: 9x8 grayscale thumbnail,
    * bit i (row r = i/8, col c = i%8) set when sample(r*9+c+1) >
    * sample(r*9+c) — bit-layout-identical to the relational
    * [[Multimodal.dHash63]], so hashes from decoded images drop into the
    * same 4x16-bit band join (m6) unchanged. None for non-images.
    */
  /** REAL DCT pHash from decoded pixels: the 16x16 grayscale thumbnail's
    * raw 0..255 samples through the same fixed-point DCT as the
    * relational [[Multimodal.pHash63]] (shared [[Multimodal.pHash63FromSamples]]
    * core, identical bit layout), so hashes from decoded images feed the
    * same 4x16-bit band join unchanged. None for non-images.
    */
  def pHashFromImage(bytes: Array[Byte]): Option[Long] =
    grayThumb(bytes, 16, 16).map { gs =>
      // grayThumb emits sample/255f; 8-bit samples round-trip exactly.
      Multimodal.pHash63FromSamples(gs.map(v => math.round(v * 255f).toLong))
    }

  def dhashFromImage(bytes: Array[Byte]): Option[Long] =
    grayThumb(bytes, 9, 8).map { gs =>
      (0 until 63).foldLeft(0L) { (acc, i) =>
        val r = i / 8; val c = i % 8
        if (gs(r * 9 + c + 1) > gs(r * 9 + c)) acc | (1L << i) else acc
      }
    }
}

package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** REAL video-container decode for the multimodal seams (SURVEY.md §2
  * F8) — the video analog of [[AudioCodec]]: a pure-JVM RIFF/AVI
  * parser (AVI is the same RIFF chunk grammar as WAV — one walker
  * family) that extracts the `movi` list's video frame chunks
  * (`00dc`/`00db`), each of which decodes through the REAL
  * [[ImageCodec]] path (`javax.imageio`: MJPEG's JPEG frames, or any
  * other ImageIO-decodable payload). Compressed non-image codecs
  * (H.264 etc.) have no decoder in this container and stay behind the
  * declared stub seam — the container walk, frame boundaries, and
  * per-frame decode hand-off are the real, tested plumbing.
  *
  * Robustness contract ([[AudioCodec]]'s): [[frames]] returns None —
  * never throws — on wrong magic, truncated headers, or chunk lengths
  * past the payload.
  */
object VideoCodec {

  /** Deterministic MJPEG-style AVI from per-frame image bytes — the
    * fixture generator (the [[ImageCodec.encodeGrayPng]] convention).
    * Minimal but well-formed: RIFF('AVI ') → LIST('movi') → one
    * `00dc` chunk per frame, word-aligned. (Header LISTs like `hdrl`
    * are index/timing metadata real muxers add; the frame payload
    * grammar — what [[frames]] walks — is complete.)
    */
  def encodeAvi(frameBytes: Seq[Array[Byte]]): Array[Byte] = {
    val chunks = frameBytes.map { fb =>
      val padded = fb.length + (fb.length & 1)
      val b = ByteBuffer.allocate(8 + padded).order(ByteOrder.LITTLE_ENDIAN)
      b.put("00dc".getBytes("US-ASCII")).putInt(fb.length).put(fb)
      b.array()
    }
    val moviLen = 4 + chunks.map(_.length).sum
    val buf = ByteBuffer.allocate(12 + 8 + moviLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(4 + 8 + moviLen)
    buf.put("AVI ".getBytes("US-ASCII"))
    buf.put("LIST".getBytes("US-ASCII")).putInt(moviLen)
    buf.put("movi".getBytes("US-ASCII"))
    chunks.foreach(buf.put)
    buf.array()
  }

  /** Walk the container and return the raw video frame payloads in
    * stream order. None on malformed input (see the contract above).
    */
  def frames(bytes: Array[Byte]): Option[Seq[Array[Byte]]] = {
    if (bytes == null || bytes.length < 12) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    try {
      if (Riff.tag(buf) != "RIFF") return None
      buf.getInt
      if (Riff.tag(buf) != "AVI ") return None
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      // the shared walker handles alignment/bounds; this level only
      // decides descent (LIST ranges) and collection (movi frames)
      def level(limit: Int, inMovi: Boolean): Boolean =
        Riff.walk(buf, limit) { (id, len) =>
          if (id == "LIST") {
            val listEnd = buf.position() + len
            val kind = Riff.tag(buf)
            level(listEnd, inMovi || kind == "movi")
          } else {
            if (inMovi && (id == "00dc" || id == "00db")) {
              val fb = new Array[Byte](len)
              buf.get(fb)
              out += fb
            }
            true // non-frame chunk: the walker skips it
          }
        }
      if (!level(bytes.length, inMovi = false)) None else Some(out.toSeq)
    } catch { case _: Exception => None }
  }

  /** Container walk + REAL per-frame decode: each extracted frame
    * through [[ImageCodec.grayThumb]] (8×8 pooled luma). Frames whose
    * payload isn't ImageIO-decodable (a codec this container lacks)
    * yield None entries — the mixed/dirty-column contract.
    */
  def decodeFrames(bytes: Array[Byte], w: Int = 8, h: Int = 8): Option[Seq[Option[Array[Float]]]] =
    frames(bytes).map(_.map(fb => ImageCodec.grayThumb(fb, w, h)))
}

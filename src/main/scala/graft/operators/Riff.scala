package graft.operators

import java.nio.ByteBuffer

/** The RIFF chunk grammar shared by [[AudioCodec]] (WAV) and
  * [[VideoCodec]] (AVI) — ONE place for the invariants both containers
  * depend on: 4-byte ASCII tag, little-endian 32-bit length, a length
  * must fit inside the enclosing range, and chunks are word-aligned (an
  * odd length carries a pad byte; a missing FINAL pad is tolerated).
  */
private[operators] object Riff {

  def tag(buf: ByteBuffer): String = {
    val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
  }

  /** Walk chunks from the buffer's position up to `limit`. For each
    * chunk, `handle(id, len)` runs with the buffer positioned at the
    * payload start; afterwards the walker advances past payload + pad
    * itself (handlers may consume freely — even recurse into a nested
    * LIST range — without managing alignment). Returns false on a
    * malformed chunk (negative or overlong length) or when a handler
    * returns false.
    */
  def walk(buf: ByteBuffer, limit: Int)(handle: (String, Int) => Boolean): Boolean = {
    while (buf.position() < limit && limit - buf.position() >= 8) {
      val id = tag(buf)
      val len = buf.getInt
      if (len < 0 || len > limit - buf.position()) return false
      val payloadStart = buf.position()
      if (!handle(id, len)) return false
      // missing final pad byte: clamp instead of overrunning the range
      buf.position(math.min(payloadStart + len + (len & 1), limit))
    }
    true
  }
}

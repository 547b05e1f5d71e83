package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** REAL audio decode for the multimodal seams (SURVEY.md §2 F7) — the
  * audio analog of [[ImageCodec]]: a pure-JVM RIFF/WAVE PCM16 parser
  * (no external codec library; WAV is a public, trivially-parseable
  * container, unlike compressed audio which stays behind the declared
  * stub seam). Everything here is executor-side per-row work — the
  * Spark plan shape around it is a narrow mapPartitions projection.
  *
  * Robustness contract (dirty 100 TB payload columns): [[decodePcm16Wav]]
  * returns None — never throws — on anything that is not a well-formed
  * PCM16 WAV: wrong magic, truncated header, truncated data chunk,
  * non-PCM format codes, or bit depths other than 16.
  */
object AudioCodec {

  final case class Pcm16(sampleRate: Int, channels: Int, samples: Array[Short])

  /** Deterministic PCM16 WAV bytes — the fixture generator (the
    * [[ImageCodec.encodeGrayPng]] convention: one definition shared by
    * the operator, its spec, and the Demo so all exercise identical
    * payload bytes). Interleaved frames for `channels` > 1.
    */
  def encodePcm16Wav(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(channels > 0 && samples.length % channels == 0,
      s"samples (${samples.length}) must be a whole number of $channels-channel frames")
    val dataBytes = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataBytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1) // PCM
    buf.putShort(channels.toShort)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * channels * 2) // byte rate
    buf.putShort((channels * 2).toShort) // block align
    buf.putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Parse a PCM16 WAV payload: walk the RIFF chunk list (chunks are
    * word-aligned — odd sizes carry a pad byte), pick up `fmt ` and
    * `data`, and return the interleaved samples. None on anything
    * malformed (see the robustness contract above).
    */
  def decodePcm16Wav(bytes: Array[Byte]): Option[Pcm16] = {
    if (bytes == null || bytes.length < 44) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    try {
      if (Riff.tag(buf) != "RIFF") return None
      buf.getInt // declared RIFF size; chunk bounds are checked by the walker
      if (Riff.tag(buf) != "WAVE") return None
      var fmt: Option[(Int, Int)] = None // (sampleRate, channels)
      var data: Option[(Int, Int)] = None // (offset, byteLen)
      val ok = Riff.walk(buf, bytes.length) { (id, len) =>
        if (id == "fmt ") {
          if (len < 16) false
          else {
            val audioFormat = buf.getShort
            val channels = buf.getShort.toInt
            val sampleRate = buf.getInt
            buf.getInt; buf.getShort // byte rate, block align
            val bits = buf.getShort
            if (audioFormat != 1 || bits != 16 || channels <= 0 || sampleRate <= 0) false
            else { fmt = Some((sampleRate, channels)); true }
          }
        } else if (id == "data") {
          data = Some((buf.position(), len)); true
        } else true // unknown chunk: the walker skips it
      }
      if (!ok) return None
      for ((sr, ch) <- fmt; (off, byteLen) <- data) yield {
        val n = byteLen / 2
        val out = new Array[Short](n)
        val sb = ByteBuffer.wrap(bytes, off, byteLen).order(ByteOrder.LITTLE_ENDIAN)
        var i = 0
        while (i < n) { out(i) = sb.getShort; i += 1 }
        Pcm16(sr, ch, out)
      }
    } catch { case _: Exception => None }
  }
}

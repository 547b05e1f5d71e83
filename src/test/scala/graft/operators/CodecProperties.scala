package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the pure-JVM container codecs — no Spark
  * session, hundreds of arbitrary payload lists per property. The
  * deterministic fixture specs in OperatorSpec pin known layouts; these
  * pin the ROUND-TRIP contract on arbitrary input: whatever the muxer
  * writes, the walker recovers byte-for-byte, including empty frames,
  * odd (pad-carrying) lengths, and arbitrary byte content.
  */
object CodecProperties extends Properties("graft.codecs") {

  private val frameGen: Gen[Array[Byte]] =
    Gen.chooseNum(0, 300).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-128, 127)))
      .map(_.map(_.toByte).toArray)

  property("AVI mux/demux is identity on arbitrary frame lists") =
    forAll(Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, frameGen))) { frames =>
      val got = VideoCodec.frames(VideoCodec.encodeAvi(frames))
      got.exists(g => g.length == frames.length &&
        g.zip(frames).forall { case (a, b) => a.sameElements(b) })
    }

  private val samplesGen: Gen[Array[Short]] =
    Gen.chooseNum(0, 400).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Short.MinValue.toInt, Short.MaxValue.toInt)))
      .map(_.map(_.toShort).toArray)

  property("WAV encode/decode is identity on arbitrary PCM16 samples") =
    forAll(samplesGen, Gen.oneOf(8000, 16000, 44100, 48000)) { (samples, sr) =>
      val got = AudioCodec.decodePcm16Wav(AudioCodec.encodePcm16Wav(sr, 1, samples))
      got.exists(p => p.sampleRate == sr && p.channels == 1 &&
        p.samples.sameElements(samples))
    }

  property("WAV stereo interleaving survives the container") =
    forAll(samplesGen.suchThat(_.length % 2 == 0)) { samples =>
      val got = AudioCodec.decodePcm16Wav(AudioCodec.encodePcm16Wav(22050, 2, samples))
      got.exists(p => p.channels == 2 && p.samples.sameElements(samples))
    }

  property("truncating a WAV anywhere inside the data chunk yields None, never a throw") =
    forAll(samplesGen.suchThat(_.length >= 4), Gen.chooseNum(1, 7)) { (samples, cut) =>
      val whole = AudioCodec.encodePcm16Wav(8000, 1, samples)
      AudioCodec.decodePcm16Wav(whole.dropRight(cut)).isEmpty
    }

  // the sniffer's whole contract is "type UNTRUSTED bytes, never throw" —
  // fuzz it three ways: pure noise, noise behind every real magic prefix
  // (forces each format branch to walk garbage), and truncations of real
  // encoder output at every prefix length
  private val magicGen: Gen[Array[Byte]] = Gen.oneOf(
    Array[Byte](0x89.toByte, 'P', 'N', 'G'),
    "GIF89a".getBytes("US-ASCII"),
    "BM".getBytes("US-ASCII"),
    Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte),
    "RIFF1234WAVE".getBytes("US-ASCII"),
    "RIFF1234AVI ".getBytes("US-ASCII"),
    Array[Byte](0, 0, 0, 16) ++ "ftyp".getBytes("US-ASCII"),
    Array[Byte](0xff.toByte, 0xfb.toByte),
    "ID3".getBytes("US-ASCII"))

  property("sniffMedia never throws: noise, magic-prefixed noise, truncated real media") =
    forAll(frameGen, magicGen, Gen.chooseNum(0, 64)) { (noise, magic, cut) =>
      val pureNoise = Multimodal.sniffMedia(noise)
      val prefixed = Multimodal.sniffMedia(magic ++ noise)
      val real = ImageCodec.encodeGrayPng(3, 2)((x, y) => x + y)
      val truncated = Multimodal.sniffMedia(real.take(math.min(cut, real.length)))
      // reaching here IS the property (no throw); the results are tuples
      pureNoise._2 >= 0 || prefixed._2 >= 0 || truncated._2 >= 0 ||
        pureNoise._1.nonEmpty
    }

  // WARC (G26): whatever the record encoder writes, the file walker
  // recovers — type, URI, status, content-type, and body BYTES — for
  // arbitrary record lists including empty bodies and bodies full of
  // fake delimiters (the Content-Length contract on arbitrary input)
  private val uriGen: Gen[String] =
    Gen.chooseNum(1, 30).flatMap(n => Gen.listOfN(n, Gen.alphaNumChar))
      .map(cs => "https://x/" + cs.mkString)
  private val warcRecGen: Gen[(String, Int, Array[Byte])] = for {
    uri <- uriGen
    status <- Gen.oneOf(200, 301, 404, 500)
    body <- frameGen
  } yield (uri, status, body)

  property("WARC encode/parse is identity on arbitrary record lists") =
    forAll(Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, warcRecGen))) { recs =>
      val file = WarcCodec.encodeWarcInfo("software: graft\r\n") ++
        recs.map { case (u, st, b) =>
          WarcCodec.encodeWarcResponse(u, st, "application/octet-stream", b)
        }.foldLeft(Array.empty[Byte])(_ ++ _)
      val p = WarcCodec.parseWarcFile(file)
      p.dropped_bytes == 0L &&
        p.records.length == recs.length + 1 &&
        p.records.head.warc_type == "warcinfo" &&
        p.records.drop(1).zip(recs).forall { case (r, (u, st, b)) =>
          r.warc_type == "response" && r.target_uri == u &&
            r.http_status == st.toLong && r.body.sameElements(b)
        }
    }

  property("truncating a WARC anywhere keeps parsed-prefix + dropped == whole file") =
    forAll(Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, warcRecGen)),
        Gen.chooseNum(1, 400)) { (recs, cut) =>
      val file = recs.map { case (u, st, b) =>
        WarcCodec.encodeWarcResponse(u, st, "text/plain", b)
      }.foldLeft(Array.empty[Byte])(_ ++ _)
      val t = file.dropRight(math.min(cut, file.length))
      val p = WarcCodec.parseWarcFile(t) // must not throw
      // every parsed record is one of the originals, in order
      p.records.zip(recs).forall { case (r, (u, st, _)) =>
        r.target_uri == u && r.http_status == st.toLong
      } &&
        // the accounting identity the property's name claims: every byte
        // of the file is either inside exactly one emitted record span or
        // counted as dropped — no double-count, no silent loss
        p.records.map(_.rec_bytes).sum + p.dropped_bytes == t.length.toLong
    }

  property("gzip member spans tile any record-per-member .warc.gz exactly; each span fetches its record") =
    forAll(Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, warcRecGen))) { recs =>
      def gz(b: Array[Byte]): Array[Byte] = {
        val bo = new java.io.ByteArrayOutputStream()
        val g = new java.util.zip.GZIPOutputStream(bo)
        g.write(b); g.close(); bo.toByteArray
      }
      val members = recs.map { case (u, st, b) =>
        gz(WarcCodec.encodeWarcResponse(u, st, "application/octet-stream", b)) }
      val file = members.foldLeft(Array.empty[Byte])(_ ++ _)
      val spans = WarcCodec.gzipMemberSpans(file)
      spans.length == recs.length &&
        spans.map(_._2).sum == file.length.toLong &&
        spans.zip(recs).forall { case ((off, len), (u, st, b)) =>
          WarcCodec.fetchWarcRecord(file, off, len).exists(r =>
            r.target_uri == u && r.http_status == st.toLong &&
              r.body.sameElements(b))
        }
    }
}

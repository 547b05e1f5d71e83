package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

/** ScalaCheck properties for the custom Catalyst expressions, driven
  * through their interpreted eval path with Literal children — no Spark
  * session, hundreds of random cases per property. (Codegen/interpreted
  * equivalence is separately pinned by the bit-identity specs in
  * OperatorSpec; these properties pin the SEMANTICS on arbitrary input.)
  */
object ExpressionProperties extends Properties("graft.functions") {

  private def litLongs(a: Seq[Long]) =
    Literal.create(a.toArray, ArrayType(LongType, containsNull = false))
  private def litFloats(a: Seq[Float]) =
    Literal.create(a.toArray, ArrayType(FloatType, containsNull = false))

  property("sortedIntersectSize == Set intersection size") =
    forAll { (a: Set[Long], b: Set[Long]) =>
      val n = SortedIntersectSize(litLongs(a.toSeq.sorted), litLongs(b.toSeq.sorted))
        .eval(null).asInstanceOf[Int]
      n == (a & b).size
    }

  property("sortedIntersectSize is symmetric and bounded") =
    forAll { (a: Set[Long], b: Set[Long]) =>
      val sa = litLongs(a.toSeq.sorted); val sb = litLongs(b.toSeq.sorted)
      val ab = SortedIntersectSize(sa, sb).eval(null).asInstanceOf[Int]
      val ba = SortedIntersectSize(sb, sa).eval(null).asInstanceOf[Int]
      ab == ba && ab <= math.min(a.size, b.size)
    }

  private val vecGen: Gen[List[Float]] =
    Gen.chooseNum(1, 32).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-100f, 100f).suchThat(f => !f.isNaN)))

  private def refCosine(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / math.sqrt(na * nb)
  }

  property("cosine matches the sequential-double reference bit for bit") =
    forAll(vecGen, vecGen) { (a0, b0) =>
      val n = math.min(a0.length, b0.length)
      val (a, b) = (a0.take(n), b0.take(n))
      val got = CosineSimilarity(litFloats(a), litFloats(b)).eval(null)
      val exp = refCosine(a, b)
      if (got == null) Prop(exp.isNaN) // zero vector -> NaN reference, null expr
      else Prop(got.asInstanceOf[Double] == exp ||
        (got.asInstanceOf[Double].isNaN && exp.isNaN))
    }

  property("cosine of ragged vectors is null, never a truncated score") =
    forAll(vecGen, vecGen) { (a, b) =>
      (a.length != b.length) ==>
        Prop(CosineSimilarity(litFloats(a), litFloats(b)).eval(null) == null)
    }

  property("rhp bucket is scale-invariant (depends only on direction)") =
    forAll(vecGen, Gen.chooseNum(1, 8)) { (v, planesLog) =>
      val planes = planesLog * 4
      val b1 = RandomHyperplaneBucket(litFloats(v), planes).eval(null)
      val b2 = RandomHyperplaneBucket(litFloats(v.map(_ * 4.0f)), planes).eval(null)
      b1 == b2
    }

  property("rhp bucket uses exactly `planes` bits") =
    forAll(vecGen, Gen.chooseNum(1, 63)) { (v, planes) =>
      val b = RandomHyperplaneBucket(litFloats(v), planes).eval(null).asInstanceOf[Long]
      (b >>> planes) == 0L
    }

  // s5's scalar quantization: per-vector symmetric int8 (q = round(x *
  // 127 / max|x|)). Cosine is scale-invariant, so the quantized cosine
  // should track the float cosine; this pins the error envelope the
  // recall spec relies on, over arbitrary (not just corpus) vectors.
  private def quantize(v: Seq[Float]): Seq[Double] = {
    val scale = math.max(v.map(x => math.abs(x.toDouble)).max, 1e-9)
    // mirror Spark's round: HALF_UP = half AWAY FROM ZERO (Scala's
    // math.round is half toward +inf, which differs for negative halves)
    def roundHalfAway(x: Double): Double =
      if (x < 0) -math.round(-x).toDouble else math.round(x).toDouble
    v.map(x => roundHalfAway(x.toDouble * 127.0 / scale))
  }

  property("int8 quantization preserves cosine within 0.1 for non-degenerate vectors") =
    forAll(vecGen, vecGen) { (a0, b0) =>
      val n = math.min(a0.length, b0.length)
      val (a, b) = (a0.take(n), b0.take(n))
      (a.exists(_ != 0f) && b.exists(_ != 0f)) ==> {
        val exact = refCosine(a, b)
        val (qa, qb) = (quantize(a), quantize(b))
        val dot = qa.lazyZip(qb).map(_ * _).sum
        val q = dot / math.sqrt(qa.map(x => x * x).sum * qb.map(x => x * x).sum)
        Prop(math.abs(q - exact) < 0.1)
      }
    }

  // t14's BPE encode: structural invariants on ARBITRARY words and
  // merges lists (the hand-computed reference cases live in OperatorSpec)
  private val wordGen: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar)).map(_.mkString)
  private val mergesGen: Gen[Seq[(String, String)]] =
    Gen.listOf(Gen.zip(Gen.alphaLowerChar.map(_.toString), Gen.alphaLowerChar.map(_.toString)))
      .map(_.take(20))

  property("BPE symbols always concatenate back to the word") =
    forAll(wordGen, mergesGen) { (w, m) =>
      BpeEncode.encodeWord(w, BpeEncode.buildRanks(m)).mkString == w
    }

  property("BPE with empty merges is the code-point split; symbol count never exceeds it") =
    forAll(wordGen, mergesGen) { (w, m) =>
      val chars = BpeEncode.encodeWord(w, BpeEncode.buildRanks(Nil))
      val merged = BpeEncode.encodeWord(w, BpeEncode.buildRanks(m))
      chars.mkString == w && chars.forall(_.length == 1) &&
        merged.length <= chars.length &&
        (w.isEmpty || merged.nonEmpty)
    }

  // small alphabet so overlaps, shared prefixes, and suffix-nested
  // patterns actually occur in random cases
  private val abGen: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b'))).map(_.mkString)
  private val patsGen: Gen[Seq[String]] =
    Gen.chooseNum(1, 6).flatMap(k => Gen.listOfN(k,
      Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b')))
        .map(_.mkString)))

  property("Aho-Corasick counts == brute-force position scan, every pattern, overlaps included") =
    forAll(abGen, patsGen) { (t, pats) =>
      val got = AcAutomaton
        .countsToArrayData(t, AcAutomaton.build(pats), pats.size).toLongArray().toSeq
      val brute = pats.map(p =>
        (0 to t.length - p.length).count(i => t.regionMatches(i, p, 0, p.length)).toLong)
      got == brute
    }

  private val unicodeGen: Gen[String] =
    Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar.map(_.toString),
      Gen.const("\u0301"), // combining acute
      Gen.const("\u00e9"), // precomposed e-acute
      Gen.const("\u030a"), // combining ring
      Gen.const("\u00e5"), // precomposed a-ring
      Gen.const(" "),
      Gen.const("\ud83d\ude00") /* surrogate pair */))
      .map(_.take(20).mkString) // token-level truncation: never split a surrogate pair

  property("NFC normalize is idempotent and agrees with the JDK reference") =
    forAll(unicodeGen) { s =>
      import org.apache.spark.unsafe.types.UTF8String
      val once = NfcNormalize.normalize(UTF8String.fromString(s)).toString
      val twice = NfcNormalize.normalize(UTF8String.fromString(once)).toString
      once == twice &&
        once == java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    }

  property("Aho-Corasick is one automaton pass: counts are independent of pattern-list order") =
    forAll(abGen, patsGen) { (t, pats) =>
      val fwd = AcAutomaton
        .countsToArrayData(t, AcAutomaton.build(pats), pats.size).toLongArray().toSeq
      val rev = AcAutomaton
        .countsToArrayData(t, AcAutomaton.build(pats.reverse), pats.size).toLongArray().toSeq
      fwd == rev.reverse
    }
}

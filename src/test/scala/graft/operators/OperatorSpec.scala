package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.{CosineSimilarity, HashFunctions => H, VectorFunctions => V}

class OperatorSpec extends SparkSpec {
  import spark.implicits._

  test("codegen'd CosineSimilarity is bit-identical to the HOF spelling") {
    val e = graft.Tables.embeddings(spark, sfDir)
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val diff = a.join(b, col("id_a") < col("id_b"))
      .select(
        CosineSimilarity(col("va"), col("vb")).as("fast"),
        V.cosine(col("va"), col("vb")).as("hof"))
      .filter(col("fast") =!= col("hof"))
      .count()
    assert(diff == 0)
  }

  test("codegen'd RotateVector (H14) is bit-identical to the HOF rotation spelling; ragged input is null") {
    import org.apache.spark.sql.functions._
    val e = graft.Tables.embeddings(spark, sfDir)
    val d = 64
    // a deterministic non-trivial weight matrix (not orthonormal — the
    // expression is a general mat-vec projection)
    val w = Array.tabulate(d, d)((j, i) =>
      math.sin(j * 131 + i * 17) / math.sqrt(d.toDouble))
    val rLit = typedlit((0 until d).map(j => (0 until d).map(i => w(j)(i))))
    val hof = transform(sequence(lit(0), lit(d - 1)), j =>
      aggregate(
        zip_with(col("embedding"), element_at(rLit, j + 1),
          (x, c) => x.cast("double") * c),
        lit(0.0), (acc, t) => acc + t).cast("float"))
    val diff = e.select(
        graft.functions.RotateVector(col("embedding"), w).as("fast"),
        hof.as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(diff == 0, "codegen rotation diverged from the HOF fold")
    // interpreted path (filter condition forces non-codegen evaluation
    // in predicate contexts too) agrees: spot-check one row driver-side
    val row = e.select(col("embedding"),
      graft.functions.RotateVector(col("embedding"), w).as("r")).head()
    val x = row.getSeq[Float](0)
    val got = row.getSeq[Float](1)
    val want = (0 until d).map { j =>
      var acc = 0.0; var i = 0
      while (i < d) { acc += x(i).toDouble * w(j)(i); i += 1 }
      acc.toFloat
    }
    assert(got == want, "interpreted replay diverged")
    // ragged input -> NULL, never a truncated projection
    val ragged = spark.sql("SELECT array(CAST(1.0 AS FLOAT)) AS v")
    assert(ragged.select(graft.functions.RotateVector(col("v"), w)).head().isNullAt(0))
  }

  test("codegen'd SquaredDistance is bit-identical to the HOF fold; self-distance 0; ragged null") {
    import org.apache.spark.sql.functions._
    val e = graft.Tables.embeddings(spark, sfDir)
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val hof = aggregate(
      zip_with(col("va"), col("vb"), (x, y) =>
        (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, t) => acc + t)
    val diff = a.join(b, col("id_a") < col("id_b"))
      .select(graft.functions.SquaredDistance(col("va"), col("vb")).as("fast"),
        hof.as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(diff == 0, "codegen squared distance diverged from the HOF fold")
    val self = e.select(
      graft.functions.SquaredDistance(col("embedding"), col("embedding"))).head().getDouble(0)
    assert(self == 0.0)
    val ragged = spark.sql(
      "SELECT array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)) AS a, array(CAST(1.0 AS FLOAT)) AS b")
    assert(ragged.select(graft.functions.SquaredDistance(col("a"), col("b"))).head().isNullAt(0))
  }

  test("cosine of a vector with itself is 1.0") {
    val one = spark.sql("SELECT array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT), CAST(-3.5 AS FLOAT)) AS v")
    val c = one.select(CosineSimilarity(col("v"), col("v"))).as[Double].head()
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("cosine of mismatched-length vectors is null, not a truncated score") {
    val df = spark.sql(
      "SELECT array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)) AS a, array(CAST(1.0 AS FLOAT)) AS b")
    assert(df.select(CosineSimilarity(col("a"), col("b"))).head().isNullAt(0))
    // interpreted path agrees with codegen
    assert(df.filter(CosineSimilarity(col("a"), col("b")).isNull).count() == 1)
  }

  test("simhash: identical token streams collide, near-identical stay close") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "alpha beta gamma delta epsilon zeta eta iota"),
      (4L, "one two three four five six seven eight"))
      .toDF("id", "text")
      .select(col("id"), H.simhash(H.shingleHashes(H.tokens(col("text")))).as("sh"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(2L))
    val near = java.lang.Long.bitCount(m(1L) ^ m(3L))
    val far = java.lang.Long.bitCount(m(1L) ^ m(4L))
    assert(near < far, s"near=$near far=$far")
  }

  test("word shingles and jaccard behave on edges") {
    val df = Seq((1L, "a b c d"), (2L, "a b"), (3L, "a b c d e"))
      .toDF("id", "text")
      .select(col("id"), H.wordShingles(H.tokens(col("text")), 3).as("sg"))
    val sizes = df.select(col("id"), size(col("sg"))).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(sizes == Map(1L -> 2, 2L -> 0, 3L -> 3))
  }

  test("LSH ANN (s2) has recall >= 0.8 vs brute force; similarity join (s3) is a subset of exact pairs") {
    val sf = "/root/testdata/sf0.01"
    val s2 = graft.SparkEntry.benchQueries("s2_ann_lsh_topk")(spark, sf).collect()
    assert(s2.nonEmpty)
    // ranks within each query are 1..k without gaps
    val byQ = s2.groupBy(_.getLong(0))
    byQ.foreach { case (_, rows) =>
      assert(rows.map(_.getLong(1)).sorted.sameElements(1L to rows.length))
    }
    // multi-probe recall floor: the probed union must recover >= 80% of the
    // true top-k (query_id, neighbor_id) pairs from the brute-force baseline
    val exactTopk = graft.SparkEntry.queries("s1_ann_bruteforce_topk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val lshTopk = s2.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (lshTopk & exactTopk).size.toDouble / exactTopk.size
    assert(recall >= 0.8, s"s2 multi-probe recall $recall < 0.8")
    val exact = graft.SparkEntry.queries("d5_dedup_embedding")(spark, sf)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val s3 = graft.SparkEntry.benchQueries("s3_similarity_join")(spark, sf)
      .filter(col("cosine") >= 0.4).select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(s3.subsetOf(exact), s"LSH join produced pairs outside the exact set")
    val s3recall = (s3 & exact).size.toDouble / exact.size
    assert(s3recall >= 0.8, s"s3 recall $s3recall < 0.8 vs the exact cos>=0.4 pairs")
  }

  test("multimodal feature extraction has the right batch shape") {
    val payloads = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val feats = Multimodal.extractFeatures(payloads)
    val rows = feats.collect()
    assert(rows.nonEmpty)
    assert(feats.schema.fieldNames.toSeq == Seq("doc_id", "n_bytes", "features"))
    rows.foreach { r =>
      val f = r.getSeq[Float](2)
      assert(f.length == 8)
      assert(f.forall(v => v >= 0f && v <= 1f))
    }
    // determinism: same payload -> same features
    val again = Multimodal.extractFeatures(payloads).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("batched feature extraction: same answers as per-row, decoder sees bounded batches") {
    val payloads = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val calls = spark.sparkContext.collectionAccumulator[Int]("batchSizes")
    val counting: Seq[Array[Byte]] => Seq[Array[Float]] = { batch =>
      calls.add(batch.length)
      Multimodal.batchDecodeStub(batch)
    }
    // collect unsorted and sort client-side: a global orderBy would add a
    // range-partitioning sampling pass that evaluates the decoder twice
    val batched = Multimodal.extractFeaturesBatched(payloads, batchSize = 16, decoder = counting)
      .collect().sortBy(_.getLong(0))
    val perRow = Multimodal.extractFeatures(payloads).collect().sortBy(_.getLong(0))
    assert(batched.map(_.toString).sameElements(perRow.map(_.toString)))
    // the decoder was really called per batch, never above the cap, and
    // covered every row exactly once
    import scala.jdk.CollectionConverters._
    val sizes = calls.value.asScala.toVector
    assert(sizes.nonEmpty && sizes.forall(s => s >= 1 && s <= 16))
    assert(sizes.sum == perRow.length)
  }

  test("Arrow columnar decode (m9): same answers as per-row and Seq-batched, bounded Arrow batches") {
    val payloads = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val calls = spark.sparkContext.collectionAccumulator[Int]("arrowBatchSizes")
    val counting: (org.apache.arrow.vector.VectorSchemaRoot, org.apache.arrow.memory.BufferAllocator) =>
        org.apache.arrow.vector.VectorSchemaRoot = { (in, alloc) =>
      calls.add(in.getRowCount)
      // the input really is columnar: ONE contiguous VarBinary data
      // buffer for the whole batch (offsets index into it)
      val pays = in.getVector("payload")
        .asInstanceOf[org.apache.arrow.vector.VarBinaryVector]
      assert(pays.getDataBuffer.capacity() > 0)
      Multimodal.arrowDecodeStub(in, alloc)
    }
    val arrow = Multimodal.extractFeaturesArrow(payloads, batchSize = 16, decoder = counting)
      .collect().sortBy(_.getLong(0))
    val perRow = Multimodal.extractFeatures(payloads).collect().sortBy(_.getLong(0))
    val batched = Multimodal.extractFeaturesBatched(payloads, batchSize = 16)
      .collect().sortBy(_.getLong(0))
    // all three decode spellings agree row for row
    assert(arrow.nonEmpty)
    assert(arrow.map(_.toString).sameElements(perRow.map(_.toString)))
    assert(arrow.map(_.toString).sameElements(batched.map(_.toString)))
    // the decoder saw real batches: never above the cap, covering every
    // row exactly once (the allocator-leak check is implicit: a leaked
    // Arrow buffer makes alloc.close() throw inside the task)
    import scala.jdk.CollectionConverters._
    val sizes = calls.value.asScala.toVector
    assert(sizes.nonEmpty && sizes.forall(s => s >= 1 && s <= 16))
    assert(sizes.sum == perRow.length)
  }

  test("dhash near-dup (m6): every re-encoded twin is recovered, within its 2-bit budget") {
    val sf = "/root/testdata/sf0.01"
    val res = graft.SparkEntry.queries("m6_dhash_near_dup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val eligible = graft.Tables.documents(spark, sf)
      .filter(length(col("text")) >= 72).select("doc_id")
      .collect().map(_.getLong(0))
    assert(eligible.nonEmpty)
    val pairs = res.map(t => (t._1, t._2)).toSet
    // recall 1 on the planted twins: one in-place byte flip moves exactly
    // one sample (injective sampling at length >= 72), so <= 2 dHash bits
    eligible.foreach { id =>
      assert(pairs.contains((id, id + 10000000L)), s"twin of doc $id missing")
    }
    res.filter(t => t._2 == t._1 + 10000000L).foreach(t => assert(t._3 <= 2))
    assert(res.forall(_._3 <= 3))
  }

  test("simhash dedup (d4) finds the planted near-duplicates") {
    val sf = "/root/testdata/sf0.01"
    val d4 = graft.SparkEntry.queries("d4_dedup_simhash")(spark, sf).collect()
    val d2 = graft.SparkEntry.queries("d2_dedup_minhash_lsh")(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val d4pairs = d4.map(r => (r.getLong(0), r.getLong(1))).toSet
    // the strong (minhash-verified) near-dups should overlap simhash's view
    assert(d2.nonEmpty)
    assert((d2 & d4pairs).size >= d2.size / 2,
      s"simhash found ${(d2 & d4pairs).size} of ${d2.size} minhash pairs")
  }

  test("combination keys: every random hamming<=4 pair shares a key (pigeonhole property)") {
    // 500 seeded random (simhash, <=4-bit-flipped twin) pairs, evaluated
    // through the REAL column expression — asserts the d4 blocking's
    // recall guarantee on arbitrary inputs, not just the test corpus
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(500) {
      val a = rnd.nextLong()
      val flips = rnd.nextInt(5) // 0..4 bit flips
      val mask = Seq.fill(flips)(1L << rnd.nextInt(64)).foldLeft(0L)(_ | _)
      (a, a ^ mask)
    }
    val df = pairs.toDF("a", "b")
    val misses = df.filter(!arrays_overlap(
        H.simhashCombinationKeys(col("a"), 8, 4),
        H.simhashCombinationKeys(col("b"), 8, 4)))
      .count()
    assert(misses == 0, s"$misses hamming<=4 pairs shared no combination key")
    // and selectivity: pairs at hamming >= 20 essentially never collide
    val far = Seq.fill(200)((rnd.nextLong(), rnd.nextLong())).toDF("a", "b")
      .filter(bit_count(col("a").bitwiseXOR(col("b"))) >= 20)
      .filter(arrays_overlap(
        H.simhashCombinationKeys(col("a"), 8, 4),
        H.simhashCombinationKeys(col("b"), 8, 4)))
      .count()
    assert(far == 0, s"$far far pairs spuriously collided")
  }

  /** Local twin of m13's text sampling: codepoint at the p-th of 256
    * evenly spaced positions, feeding the shared integer-DCT reference.
    */
  private def phashLocal(text: String): Long = {
    val n = text.length
    val g = Array.tabulate(256)(p => text.codePointAt((p * (n - 1)) / 255).toLong)
    Multimodal.pHash63FromSamples(g)
  }

  test("pHash DCT (m13): column pipeline == local integer reference, corpus + random texts") {
    val sf = "/root/testdata/sf0.01"
    val got = graft.SparkEntry.queries("m13_phash_dct")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(docs.nonEmpty && got.size == docs.length)
    docs.foreach { case (id, text) =>
      assert(got(id) == phashLocal(text), s"pHash mismatch for doc $id")
    }
    // sign safety: bit 63 never set (the shared 63-bit band-join contract)
    assert(got.values.forall(_ >= 0L))
    // non-degenerate: the corpus hashes are essentially all distinct
    assert(got.values.toSet.size > docs.length / 2)
    // arbitrary inputs, not just the corpus: random printable texts
    val rnd = new scala.util.Random(1913)
    val texts = Seq.tabulate(200)(i =>
      (i + 1L, Seq.fill(30 + rnd.nextInt(300))((32 + rnd.nextInt(95)).toChar).mkString))
    val rndGot = Multimodal.pHash63(texts.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.foreach { case (id, text) =>
      assert(rndGot(id) == phashLocal(text), s"pHash mismatch for random text $id")
    }
  }

  test("pHash DCT feeds the SHARED band join: planted identical twins pair at hamming 0") {
    val sf = "/root/testdata/sf0.01"
    val base = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).limit(50)
    val twins = base.select((col("doc_id") + lit(10000000L)).as("doc_id"), col("text"))
    val hashes = Multimodal.pHash63(base.unionByName(twins))
      .withColumnRenamed("phash", "h")
    val pairs = Multimodal.dhashNearDupsFromHashes(hashes)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    val ids = base.select("doc_id").collect().map(_.getLong(0))
    assert(ids.length == 50)
    val pairMap = pairs.toMap
    ids.foreach { id =>
      assert(pairMap.get((id, id + 10000000L)).contains(0L),
        s"identical twin of doc $id missing or nonzero hamming")
    }
  }

  test("codegen'd RandomHyperplaneBucket matches the HOF spelling") {
    val e = graft.Tables.embeddings(spark, sfDir)
    val diff = e.select(
        Similarity.rhpBucket(col("embedding"), 16).as("fast"),
        Similarity.rhpBucketHof(col("embedding"), 16).as("hof"))
      .filter(col("fast") =!= col("hof")).count()
    assert(diff == 0)
  }

  test("IVF ANN (s4) produces valid ranks with reasonable recall vs brute force") {
    val sf = "/root/testdata/sf0.01"
    val s4 = graft.SparkEntry.benchQueries("s4_ann_ivf_topk")(spark, sf).collect()
    assert(s4.nonEmpty)
    s4.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(1)).sorted.sameElements(1L to rows.length))
    }
    val exact = graft.SparkEntry.queries("s1_ann_bruteforce_topk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = s4.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (ivf & exact).size.toDouble / exact.size
    info(s"IVF recall vs brute force: $recall")
    // k-means-trained centroids (10 lists, 6 Lloyd rounds), nProbe=4 —
    // a 40% corpus scan; training lifts the floor from the sampled-
    // centroid 0.4 to 0.7 even on these weakly-clustered vectors
    // floor 0.6, not the typical 0.76: centroid training is float-mean
    // nondeterministic ACROSS SESSIONS (partial-aggregate merge order
    // follows shuffle fetch timing) and the measured band is 0.66-0.76 —
    // a 0.7 floor is latently flaky (observed 0.66 in an r9 session)
    assert(recall >= 0.6, s"IVF recall $recall < 0.6")
  }

  test("PQ ANN (s6): 64x-compressed ADC scan + exact rerank has recall >= 0.8 vs brute force") {
    val sf = "/root/testdata/sf0.01"
    val s6 = graft.SparkEntry.benchQueries("s6_ann_pq_topk")(spark, sf).collect()
    assert(s6.nonEmpty)
    s6.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(1)).sorted.sameElements(1L to rows.length))
    }
    val s1Rows = graft.SparkEntry.queries("s1_ann_bruteforce_topk")(spark, sf).collect()
    val exact = s1Rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val pq = s6.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (pq & exact).size.toDouble / exact.size
    info(s"PQ recall vs brute force: $recall")
    assert(recall >= 0.8, s"s6 PQ recall $recall < 0.8")
    // rerank reports EXACT float cosines (same contract as s5)
    val exactScores = s1Rows.map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    s6.foreach { r =>
      exactScores.get((r.getLong(0), r.getLong(2)))
        .foreach(c => assert(r.getDouble(3) == c, s"rerank cosine != exact for $r"))
    }
    // the compression ratio the operator stands for: m=8 codebooks of
    // k=16 centroids -> 4-bit codes, 8 x 4 bits = 4 bytes vs 256 float32
    // bytes = 64x. Pinned via the codebook shape (m*k parameter-bounded
    // rows, each a ds=8 subspace centroid).
    val e = graft.Tables.embeddings(spark, sf)
    val books = Similarity.trainCentroidsKeyed(Similarity.pqSubVectors(e, 8, 8), e, 16, iters = 1)
    val shape = books.groupBy(col("sub")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(shape.keySet == (0 until 8).toSet, s"expected 8 subspace codebooks, got ${shape.keySet}")
    assert(shape.values.forall(_ <= 16), s"codebooks exceed k=16: $shape")
  }

  test("IVF-PQ ANN (s8): composed probe+ADC+rerank has the s4 candidate recall floor and exact rerank scores") {
    val exact = graft.SparkEntry.queries("s1_ann_bruteforce_topk")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val s8 = graft.SparkEntry.benchQueries("s8_ann_ivfpq_topk")(spark, sfDir).collect()
    assert(s8.nonEmpty)
    // per-query rank contract: dense 1..K
    s8.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to 5L), "ranks not dense 1..5")
    }
    val got = s8.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (got & exact).size.toDouble / exact.size
    info(s"IVF-PQ recall vs brute force: $recall")
    // IVF pruning is the binding stage (the s4 floor and its measured
    // 0.66-0.76 cross-session band — training is float-mean timing-
    // nondeterministic); PQ's coding loss is absorbed by the exact
    // re-rank of the refine=200 ADC candidates
    assert(recall >= 0.6, s"s8 IVF-PQ recall $recall < 0.6")
    // rerank reports EXACT float cosines (the s5/s6 contract)
    val e = graft.Tables.embeddings(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / math.sqrt(na * nb)
    }
    s8.foreach { r =>
      // Num.r4's exact quantization: floor(x*1e4 + 0.5)/1e4
      val c = math.floor(cos(e(r.getLong(0)), e(r.getLong(2))) * 1e4 + 0.5) / 1e4
      assert(r.getDouble(3) == c, s"rerank cosine != exact for $r")
    }
  }

  test("IVF-PQ index lifecycle (s8/D9): three-table WAP publish, zero non-broadcast exchange on the codes path, recall holds") {
    import graft.operators.Similarity
    val root = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    val e = graft.Tables.embeddings(spark, sfDir)
    val results = Similarity.publishIvfPqIndex(e, root, token = "r9build")
    assert(results.size == 3 && results.forall(_.published),
      s"IVF-PQ publish failed: $results")
    // torn-index guard: all three tables must name the same version
    val queries = e.filter(col("vec_id") < 10)
    val scored = Similarity.ivfPqScoreFromIndex(spark, root, queries, nProbe = 4)
    // the scoring stage moves NOTHING corpus-proportional through a
    // non-broadcast exchange: codes scan -> broadcast probe join ->
    // narrow literal reconstruction
    val plan = scored.queryExecution.executedPlan.toString
    val shuffles = plan.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("Broadcast"))
    assert(shuffles == 0, s"codes path re-shuffles corpus data:\n$plan")
    // end-to-end recall from the PUBLISHED index holds the s4 band floor
    val got = Similarity.ivfPqTopKFromIndex(spark, root, e, queries,
      k = 5, refine = 200, nProbe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = graft.SparkEntry.queries("s1_ann_bruteforce_topk")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (got & exact).size.toDouble / exact.size
    info(s"published IVF-PQ recall vs brute force: $recall")
    assert(recall >= 0.6, s"published-index recall $recall < 0.6 (the s4 band)")
  }

  test("index-literal spill: broadcast-backed probe+ADC bit-equal to the literal spelling, codes path still exchange-free") {
    import graft.operators.Similarity
    val root = java.nio.file.Files.createTempDirectory("graft-ivfpq-spill").toString
    val e = graft.Tables.embeddings(spark, sfDir)
    val results = Similarity.publishIvfPqIndex(e, root, token = "spill")
    assert(results.size == 3 && results.forall(_.published), s"publish failed: $results")
    val queries = e.filter(col("vec_id") < 10)
    def scores() = Similarity.ivfPqScoreFromIndex(spark, root, queries, nProbe = 4)
      .select(col("query_id"), col("neighbor_id"), col("list_id"), col("acos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val lit = scores()
    val saved = Similarity.indexLiteralMaxFloats
    try {
      Similarity.indexLiteralMaxFloats = 0L // force the broadcast leg
      val spilled = scores()
      assert(spilled == lit,
        s"broadcast leg diverged from literal leg: " +
          s"lit=${lit.length} spill=${spilled.length} " +
          s"firstDiff=${lit.zip(spilled).find(p => p._1 != p._2)}")
      // the spill leg keeps the scale property the literal leg is pinned
      // to: nothing corpus-proportional re-shuffles (PqReconstruct is a
      // narrow map over the codes scan; the probe frame still broadcasts)
      val plan = Similarity.ivfPqScoreFromIndex(spark, root, queries, nProbe = 4)
        .queryExecution.executedPlan.toString
      val shuffles = plan.linesIterator.count(l =>
        l.contains("Exchange") && !l.contains("Broadcast"))
      assert(shuffles == 0, s"spill leg re-shuffles corpus data:\n$plan")
      // the PQ-only read path spills the same way
      val pqRoot = java.nio.file.Files.createTempDirectory("graft-pq-spill").toString
      Similarity.publishPqIndex(e, pqRoot, token = "spill")
      def pqScores() = Similarity.pqScoreFromIndex(spark, pqRoot, queries)
        .select(col("query_id"), col("neighbor_id"), col("acos"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2)).toSeq
      val pqSpill = pqScores()
      Similarity.indexLiteralMaxFloats = saved
      assert(pqScores() == pqSpill, "PQ-only spill leg diverged from literal leg")
    } finally Similarity.indexLiteralMaxFloats = saved
  }

  test("s12 recall-vs-probes sweep: measured curve monotone to full coverage at kIvf; candidate growth bounded by probed lists") {
    import graft.operators.Similarity
    val rows = graft.SparkEntry.queries("s12_ann_recall_curve")(spark, sfDir)
      .collect()
    assert(rows.length == 4, s"expected 4 probe levels, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("recall_monotone")),
        s"recall not monotone at n_probe=${r.getInt(0)}")
      assert(r.getBoolean(r.fieldIndex("full_cover_at_max")),
        "candidate recall at n_probe=kIvf must be exactly 1")
    }
    // the measured curve itself, from the public read path: candidate
    // recall at level p = exact pairs whose neighbor is scanned when
    // probing p lists; scanned row counts pin BOUNDED CANDIDATE GROWTH
    // (scan cost proportional to the probed lists, never corpus x probes)
    val root = Similarity.opqIndexRootFor(spark, sfDir)
    val e = graft.Tables.embeddings(spark, sfDir)
    val queries = e.filter(col("vec_id") < 10)
    val exact = graft.SparkEntry.queries("s1_ann_bruteforce_topk")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val levels = Seq(1, 2, 4, 10)
    val curve = levels.map { p =>
      val scanned = Similarity.ivfPqScoreFromIndex(spark, root, queries, nProbe = p)
        .select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val recall = (scanned.toSet & exact).size.toDouble / exact.size
      (p, recall, scanned.length)
    }
    info(s"candidate recall / scanned rows by nProbe: $curve")
    curve.sliding(2).foreach { case Seq((p1, r1, s1), (p2, r2, s2)) =>
      assert(r2 >= r1, s"recall dropped from nProbe=$p1 ($r1) to $p2 ($r2)")
      assert(s2 > s1, s"scan count must grow with probes: $s1 !< $s2")
    }
    assert(curve.last._2 == 1.0, s"full-probe candidate recall ${curve.last._2} != 1")
    // endpoint anchor: probing every list scans exactly nQueries*(n-1)
    // pairs (all but self) — candidate volume is the probed fraction of
    // the corpus, with no per-probe duplication
    val n = e.count()
    val nQ = queries.count()
    assert(curve.last._3.toLong == nQ * (n - 1),
      s"full-probe scan ${curve.last._3} != ${nQ * (n - 1)}")
  }

  test("p27 DoReMi weights: a distribution, monotone in quality deficit, uniform at eta->0") {
    val rows = graft.SparkEntry.queries("p27_doremi_weights")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val wsum = rows.map(_._3).sum
    assert(math.abs(wsum - 1.0) < 0.01,
      s"weights must form a (r4-quantized) distribution, sum=$wsum")
    // the MW update multiplier decreases in mean quality, so from a
    // uniform start the final weight is non-increasing in meanQ (hard
    // domains get MORE mix weight — DoReMi's point); r4 quantization
    // can flip a near-tie by one quantum
    rows.sortBy(_._2).toSeq.sliding(2).foreach {
      case Seq((d1, q1, w1), (d2, q2, w2)) =>
        if (q1 < q2)
          assert(w1 >= w2 - 2e-4,
            s"weight not monotone in deficit: $d1(q=$q1,w=$w1) vs $d2(q=$q2,w=$w2)")
      case _ =>
    }
    // eta -> 0 degenerates to the smoothed uniform fixed point
    val uni = graft.operators.Pipeline.doremiWeights(
        graft.Tables.documents(spark, sfDir)
          .select(col("lang"), col("source"), col("text")),
        eta = 1e-12, smooth = 0.1, rounds = 5)
      .collect().map(_.getDouble(3))
    val expect = 1.0 / rows.length
    assert(uni.forall(w => math.abs(w - expect) < 1e-3),
      s"eta->0 must stay ~uniform (1/${rows.length}), got ${uni.take(5).toSeq}")
  }

  test("s13 filtered ANN: label predicate pushed to the codes parquet scan; recall floor vs the filtered exact universe") {
    import graft.operators.Similarity
    val e = graft.Tables.embeddings(spark, sfDir)
    // the benched entry end to end: dense ranks, every neighbor satisfies
    // the predicate, recall vs the FILTERED brute force holds the band
    val got = graft.SparkEntry.benchQueries("s13_ann_filtered_topk")(spark, sfDir)
      .collect()
    got.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getLong(1)).sorted.sameElements(1L to rows.length),
        s"query $q ranks not dense")
    }
    val labels = e.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    got.foreach { r =>
      assert(labels(r.getLong(2)) == 1,
        s"neighbor ${r.getLong(2)} violates the label=1 predicate")
    }
    val vecs = e.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / math.sqrt(na * nb)
    }
    val exact = (0L until 10L).flatMap { q =>
      vecs.toSeq.filter { case (id, _) => id != q && labels(id) == 1 }
        .map { case (id, v) => (id, cos(vecs(q), v)) }
        .sortBy(t => (-t._2, t._1)).take(5).map(t => (q, t._1))
    }.toSet
    val gotSet = got.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (gotSet & exact).size.toDouble / exact.size
    info(s"filtered-index recall vs filtered brute force: $recall")
    assert(recall >= 0.6, s"s13 recall $recall < 0.6")
    // plan contract: the predicate reaches the codes PARQUET SCAN
    // (pre-filtering — candidate volume ∝ selectivity, no query-time
    // attribute join) and nothing corpus-proportional re-shuffles
    val root = Similarity.filteredIndexRootFor(spark, sfDir)
    val scored = Similarity.ivfPqScoreFromIndexWhere(spark, root,
      e.filter(col("vec_id") < 10), nProbe = 6, col("label") === 1)
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      "PushedFilters: \\[[^\\]]*label".r.findFirstIn(plan).nonEmpty,
      s"label predicate not pushed to the codes scan:\n$plan")
    val shuffles = plan.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("Broadcast"))
    assert(shuffles == 0, s"filtered codes path re-shuffles corpus data:\n$plan")
  }

  test("s9 published-index read path: the BENCHED entry — recall floor, rank contract, zero non-broadcast exchange") {
    import graft.operators.Similarity
    // the queries() entry itself (what Bench and Verify run): first call
    // builds + publishes the index (memoized per sfDir), the returned
    // plan is the pure read path
    val got = graft.SparkEntry.benchQueries("s9_ann_ivfpq_index_read")(spark, sfDir).collect()
    // per-query rank contract: dense ranks 1..k
    got.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getLong(1)).sorted.sameElements(1L to rows.length), s"query $q ranks")
    }
    // recall vs brute force holds the s4/s8 trained-index band
    val exact = graft.SparkEntry.queries("s1_ann_bruteforce_topk")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val gotSet = got.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (gotSet & exact).size.toDouble / exact.size
    info(s"s9 published-index recall vs brute force: $recall")
    assert(recall >= 0.6, s"s9 recall $recall < 0.6 (the s4/s8 band)")
    // the plan-level scale assertion runs on the SAME root the benched
    // entry reads — the scoring stage moves nothing corpus-proportional
    // through a non-broadcast exchange
    val root = Similarity.ivfPqIndexRootFor(spark, sfDir)
    val queries = graft.Tables.embeddings(spark, sfDir).filter(col("vec_id") < 10)
    val scored = Similarity.ivfPqScoreFromIndex(spark, root, queries, nProbe = 4)
    val shuffles = scored.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("Exchange")).filterNot(_.contains("Broadcast")).toSeq
    assert(shuffles.isEmpty, s"s9 read path re-shuffles corpus data:\n${shuffles.mkString("\n")}")
  }

  test("IVF-PQ index refresh: arrivals encode against the published artifacts, no retrain, codes carried bit-exact") {
    import graft.operators.{Publish, Similarity}
    val root = java.nio.file.Files.createTempDirectory("graft-ivfpq-refresh").toString
    val e = graft.Tables.embeddings(spark, sfDir)
    val held = e.filter(col("vec_id") % 7 === 3)
    val initial = e.filter(col("vec_id") % 7 =!= 3)
    val r1 = Similarity.publishIvfPqIndex(initial, root, token = "v1build")
    assert(r1.size == 3 && r1.forall(_.published), s"initial publish failed: $r1")
    def codeMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[scala.collection.Seq[Int]]("codes").toList,
          r.getAs[Int]("list_id")))).toMap
    val codesV1 = codeMap(Publish.readPublished(spark, s"$root/codes"))
    // refresh with the held-out slice: assign + encode against the
    // PUBLISHED lists/books — no k-means anywhere in this path
    val r2 = Similarity.refreshIvfPqIndex(spark, root, held, token = "v2refresh")
    assert(r2.size == 3 && r2.forall(_.published), s"refresh failed: $r2")
    assert(r2.forall(_.version.contains(2L)), s"one version sequence expected: $r2")
    val codesV2 = codeMap(Publish.readPublished(spark, s"$root/codes"))
    // old vectors' codes are CARRIED, not recomputed — bit-exact
    codesV1.foreach { case (id, c) =>
      assert(codesV2(id) == c, s"refresh mutated stored code for vec $id")
    }
    // every arrival is indexed exactly once
    val heldIds = held.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(heldIds.subsetOf(codesV2.keySet), "refresh dropped arrivals")
    assert(codesV2.size == codesV1.size + heldIds.size)
    // the refreshed index still answers queries at the s4/s8 band
    val queries = e.filter(col("vec_id") < 10)
    val got = Similarity.ivfPqTopKFromIndex(spark, root, e, queries,
      k = 5, refine = 200, nProbe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = graft.SparkEntry.queries("s1_ann_bruteforce_topk")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (got & exact).size.toDouble / exact.size
    info(s"post-refresh recall vs brute force: $recall")
    assert(recall >= 0.6, s"post-refresh recall $recall < 0.6")
    // replayed ids are rejected loudly (they would double-count in the
    // one-row-per-vector audit and shadow stored codes at read time)
    val err = intercept[IllegalArgumentException] {
      Similarity.refreshIvfPqIndex(spark, root, held, token = "v3dup")
    }
    assert(err.getMessage.contains("already indexed"))
  }

  test("IVF-PQ refresh of an ATTRIBUTE-CARRYING index (D16/s13 shape): arrivals carry attrs, plain refresh rejected") {
    import graft.operators.{Publish, Similarity}
    val root = java.nio.file.Files.createTempDirectory("graft-ivfpq-attr-refresh").toString
    val e = graft.Tables.embeddings(spark, sfDir)
    val held = e.filter(col("vec_id") % 7 === 3)
    val initial = e.filter(col("vec_id") % 7 =!= 3)
    // the s13 build shape: label denormalized into codes at publish
    val r1 = Similarity.publishIvfPqIndex(
      initial.select(col("vec_id"), col("embedding")), root, token = "v1attr",
      attrs = Some(initial.select(col("vec_id"), col("label"))))
    assert(r1.size == 3 && r1.forall(_.published), s"attr publish failed: $r1")
    // refresh WITHOUT attrs must fail loudly BEFORE any publish (the
    // r15 advice: unionByName used to throw AnalysisException mid-WAP)
    val errNoAttrs = intercept[IllegalArgumentException] {
      Similarity.refreshIvfPqIndex(spark, root, held, token = "v2plain")
    }
    assert(errNoAttrs.getMessage.contains("attribute columns"))
    assert(Publish.currentVersion(spark, s"$root/codes").contains(1L),
      "failed refresh moved the codes pointer")
    // refresh WITH attrs: every arrival lands with its label; stored
    // rows keep theirs bit-exact
    val r2 = Similarity.refreshIvfPqIndex(spark, root, held, token = "v2attr",
      attrs = Some(held.select(col("vec_id"), col("label"))))
    assert(r2.size == 3 && r2.forall(_.published), s"attr refresh failed: $r2")
    assert(r2.forall(_.version.contains(2L)), s"one version sequence expected: $r2")
    val codesV2 = Publish.readPublished(spark, s"$root/codes")
    assert(codesV2.columns.contains("label"), "refresh dropped the attr column")
    val labels = e.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    codesV2.select(col("vec_id"), col("label")).collect().foreach { r =>
      assert(!r.isNullAt(1) && r.getInt(1) == labels(r.getLong(0)),
        s"vec ${r.getLong(0)} label mismatch after refresh")
    }
    // the refreshed artifact still serves the FILTERED read path: the
    // predicate stays a pushed codes-scan filter, results all label=1
    val queries = e.filter(col("vec_id") < 10)
    val got = Similarity.ivfPqTopKFromIndexWhere(spark, root, e, queries,
      k = 5, refine = 200, nProbe = 6, col("label") === 1).collect()
    assert(got.nonEmpty, "filtered read on refreshed index returned nothing")
    val lbl1 = e.filter(col("label") === 1).select(col("vec_id"))
      .collect().map(_.getLong(0)).toSet
    got.foreach(r => assert(lbl1.contains(r.getLong(2)),
      s"filtered read leaked non-label-1 neighbor ${r.getLong(2)}"))
    // attrs against a PLAIN index is a misuse, rejected symmetrically
    val plainRoot = java.nio.file.Files.createTempDirectory("graft-ivfpq-plain").toString
    val r3 = Similarity.publishIvfPqIndex(
      initial.select(col("vec_id"), col("embedding")), plainRoot, token = "v1plain")
    assert(r3.forall(_.published))
    val errMisuse = intercept[IllegalArgumentException] {
      Similarity.refreshIvfPqIndex(spark, plainRoot, held, token = "v2mis",
        attrs = Some(held.select(col("vec_id"), col("label"))))
    }
    assert(errMisuse.getMessage.contains("not built with attrs"))
  }

  test("residual IVF-PQ (s14): flag persisted, refresh re-encodes arrivals in residual space, recall holds the raised floor, zero non-broadcast exchange") {
    import graft.operators.{Publish, Similarity}
    val root = java.nio.file.Files.createTempDirectory("graft-ivfpq-residual").toString
    val e = graft.Tables.embeddings(spark, sfDir)
    val held = e.filter(col("vec_id") % 7 === 3)
    val initial = e.filter(col("vec_id") % 7 =!= 3)
    val r1 = Similarity.publishIvfPqIndex(initial, root, token = "v1res",
      residual = true)
    assert(r1.size == 3 && r1.forall(_.published), s"residual publish failed: $r1")
    // the flag and the forced l2 objective are PERSISTED on books — what
    // refresh and the read path branch on
    val books = Publish.readPublished(spark, s"$root/books")
    assert(books.select(col("residual")).distinct().collect()
      .map(_.getBoolean(0)).toSeq == Seq(true))
    assert(books.select(col("metric")).distinct().collect()
      .map(_.getString(0)).toSeq == Seq("l2"))
    // refresh carries the flag: stored codes bit-exact, arrivals indexed
    val codesV1 = Publish.readPublished(spark, s"$root/codes").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Int]]("codes").toList).toMap
    val r2 = Similarity.refreshIvfPqIndex(spark, root, held, token = "v2res")
    assert(r2.size == 3 && r2.forall(_.published), s"residual refresh failed: $r2")
    val codesV2 = Publish.readPublished(spark, s"$root/codes").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Int]]("codes").toList).toMap
    codesV1.foreach { case (id, c) =>
      assert(codesV2(id) == c, s"refresh mutated stored residual code for vec $id")
    }
    // recall on the refreshed full index at s9's nProbe meets the RAISED
    // floor (0.7 vs the plain band's 0.6 — the residual lift, pinned)
    val queries = e.filter(col("vec_id") < 10)
    val got = Similarity.ivfPqTopKFromIndex(spark, root, e, queries,
      k = 5, refine = 200, nProbe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = graft.SparkEntry.queries("s1_ann_bruteforce_topk")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (got & exact).size.toDouble / exact.size
    info(s"residual post-refresh recall vs brute force: $recall")
    assert(recall >= 0.7, s"residual recall $recall < 0.7 (the raised floor)")
    // the scoring stage stays zero-non-broadcast-exchange: the residual
    // add-back is a per-row map, not a join
    val scored = Similarity.ivfPqScoreFromIndex(spark, root, queries, nProbe = 4)
    val shuffles = scored.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("Exchange")).filterNot(_.contains("Broadcast")).toSeq
    assert(shuffles.isEmpty,
      s"s14 read path re-shuffles corpus data:\n${shuffles.mkString("\n")}")
    // residual + cosine is a contradiction, rejected loudly
    val err = intercept[IllegalArgumentException] {
      Similarity.publishIvfPqIndex(initial,
        java.nio.file.Files.createTempDirectory("graft-rescos").toString,
        token = "bad", residual = true, pqMetric = "cos")
    }
    assert(err.getMessage.contains("residual"))
  }

  test("OPQ x residual compose (D14 x D17): rotation and residual encode together through publish/refresh/read; recall holds the plain band") {
    import graft.operators.{Publish, Similarity}
    val root = java.nio.file.Files.createTempDirectory("graft-opq-res").toString
    val e = graft.Tables.embeddings(spark, sfDir)
    val held = e.filter(col("vec_id") % 9 === 4)
    val initial = e.filter(col("vec_id") % 9 =!= 4)
    // the two encodings are orthogonal by construction — rotation
    // preprocesses the space, residual subtracts the assigned centroid
    // WITHIN it — so the 4-table artifact carries both flags
    val r1 = Similarity.publishIvfPqIndex(initial, root, token = "v1",
      rotate = true, residual = true)
    assert(r1.size == 4 && r1.forall(_.published), s"composed publish failed: $r1")
    val books = Publish.readPublished(spark, s"$root/books")
    assert(books.select(col("residual")).distinct().collect()
      .map(_.getBoolean(0)).toSeq == Seq(true))
    assert(books.select(col("metric")).distinct().collect()
      .map(_.getString(0)).toSeq == Seq("l2"))
    // refresh replays BOTH: arrivals rotate by the published matrix,
    // then re-encode residually against the published lists
    val r2 = Similarity.refreshIvfPqIndex(spark, root, held, token = "v2")
    assert(r2.size == 4 && r2.forall(_.published), s"composed refresh failed: $r2")
    val vs = Seq("lists", "books", "codes", "rotation")
      .map(t => Publish.currentVersion(spark, s"$root/$t"))
    assert(vs.distinct.size == 1 && vs.head.contains(2L), s"torn versions: $vs")
    val queries = e.filter(col("vec_id") < 10)
    val got = Similarity.ivfPqTopKFromIndex(spark, root, e, queries,
      k = 5, refine = 200, nProbe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = graft.SparkEntry.queries("s1_ann_bruteforce_topk")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (got & exact).size.toDouble / exact.size
    info(s"OPQ+residual post-refresh recall: $recall")
    // the PLAIN band, not s14's raised 0.7: this build trains the
    // rotation on the RAW corpus and then encodes residuals inside the
    // rotated space — a correct, lifecycle-complete composition, but
    // the FAISS-grade recall lift needs the rotation trained on the
    // RESIDUALS themselves (a different build ordering: assign in raw
    // space, rotate the residual cloud), which would restructure the
    // read path (per-list query rotation). Measured composed recall
    // 0.66 vs residual-alone 0.72 at sf0.001 — the documented tradeoff.
    assert(recall >= 0.6, s"composed recall $recall < 0.6 (the plain band)")
  }

  test("PQ index lifecycle (s7): WAP publish, artifact bit-exact, zero staged-side exchange, recall holds") {
    val sf = "/root/testdata/sf0.01"
    val root = java.nio.file.Files.createTempDirectory("graft-pqindex").toString
    val e = graft.Tables.spread(graft.Tables.embeddings(spark, sf)).persist()
    val (br, cr) = Similarity.publishPqIndex(e, root, "build-1")
    assert(br.published && cr.published, s"publish failed: $br / $cr")
    assert(br.version.contains(1L) && cr.version.contains(1L))
    val (books, codes) = Similarity.readPqIndex(spark, root)
    // books structure: all 8 subspaces, dense cids from 0, 8-dim centroids
    val bRows = books.collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2)))
    assert(bRows.map(_._1).toSet == (0 until 8).toSet)
    assert(bRows.forall(_._3.length == 8))
    bRows.groupBy(_._1).foreach { case (sub, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (0 until rs.length), s"sub $sub cids not dense")
    }
    // stored codes are BIT-EXACT: re-encode the corpus under the
    // PUBLISHED books (encoding is deterministic; training is not) and
    // compare row for row
    val recomputed = Similarity.encodePq(Similarity.pqSubVectors(e, 8, 8), books)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    val stored = codes.collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(stored.nonEmpty && stored == recomputed,
      "published codes diverge from a re-encode under the published books")
    // the query path moves NOTHING corpus-proportional through a
    // shuffle: scan -> literal-codebook reconstruct (narrow) ->
    // broadcast-join queries -> score. Only broadcast exchanges allowed.
    // (queries come from a plain read: Tables.spread's round-robin
    // repartition would show up as an Exchange inside the broadcast
    // subtree and muddy the zero-shuffle assertion)
    val queries = graft.Tables.embeddings(spark, sf).filter(col("vec_id") < 10)
    val scored = Similarity.pqScoreFromIndex(spark, root, queries)
    val shuffles = scored.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("Exchange")).filterNot(_.contains("BroadcastExchange")).toSeq
    assert(shuffles.isEmpty, s"staged-side shuffle in the ADC scan plan:\n${shuffles.mkString("\n")}")
    // end-to-end recall from the PUBLISHED index matches the s6 floor
    val top = Similarity.pqTopKFromIndex(spark, root, e, queries, k = 5, refine = 150)
      .collect()
    top.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(1)).sorted.sameElements(1L to rows.length))
    }
    val exact = graft.SparkEntry.queries("s1_ann_bruteforce_topk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val got = top.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (got & exact).size.toDouble / exact.size
    info(s"published-index PQ recall vs brute force: $recall")
    assert(recall >= 0.8, s"s7 recall $recall < 0.8")
    // rebuild publishes the NEXT version; readers re-resolve atomically
    val (br2, cr2) = Similarity.publishPqIndex(e, root, "build-2")
    assert(br2.version.contains(2L) && cr2.version.contains(2L))
    // torn index (books moved without codes — the crash window between
    // the two publishes) must refuse loudly, the d11 artifact-sync rule
    val passAudit: graft.operators.Publish.Audit = df =>
      graft.operators.Publish.columnAudit("never" -> lit(false))(df)
    graft.operators.Publish.writeAuditPublish(books, s"$root/books", passAudit, "tear")
    val torn = intercept[IllegalArgumentException] { Similarity.readPqIndex(spark, root) }
    assert(torn.getMessage.contains("torn"))
    e.unpersist()
  }

  test("domain governance (d14): planted skew — URL dedup canonical, blocklist total, hot domain capped") {
    import spark.implicits._
    // planted acquisition corpus: a HOT domain holding 80 of 102 raw
    // docs but crawling only 10 distinct pages (the re-crawl shape),
    // four tail domains of 5 unique pages each, and a banned domain
    val docs = ((0 until 80).map(i => (i.toLong, s"hot/p${i % 10}", "hot")) ++
      (0 until 20).map(i => (100L + i, s"d${i % 4}/p$i", s"d${i % 4}")) ++
      Seq((500L, "banned/x", "banned"), (501L, "banned/y", "banned")))
      .toDF("doc_id", "url", "domain")
    val out = Dedup.domainGovernance(docs, Seq("banned"), maxSharePermille = 200)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // hand-computed: URL dedup keeps the canonical MIN doc_id per page
    // (hot -> ids 0..9, tail -> all 20, banned -> 2); blocklist removes
    // banned entirely; post-governance total N = 30, so the 200-permille
    // cap keeps rank*1000 <= 6000 -> 6 docs max per domain: hot is
    // clipped 10 -> 6 (ids 0..5) while every tail domain (5 docs) fits
    val expected =
      (0 until 6).map(i => (i.toLong, "hot", s"hot/p$i")) ++
      (0 until 20).map(i => (100L + i, s"d${i % 4}", s"d${i % 4}/p$i"))
    assert(out.toSeq == expected.sortBy(_._1), s"got ${out.toSeq}")
    // the cap is relative to the SURVIVING corpus: hot's share is now
    // 6/26 (23%), down from 78% raw — the skew actually got governed
    assert(out.count(_._2 == "hot") == 6)
    assert(!out.exists(_._2 == "banned"))
  }

  test("BPE encode (t14): hand-computed references, overlap rule, rank priority") {
    import graft.functions.BpeEncode
    def enc(w: String, m: Seq[(String, String)]): Seq[String] =
      BpeEncode.encodeWord(w, BpeEncode.buildRanks(m)).toSeq
    // multi-round merge chain: h+e, l+l, he+ll, hell+o
    val m1 = Seq("h" -> "e", "l" -> "l", "he" -> "ll", "hell" -> "o")
    assert(enc("hello", m1) == Seq("hello"))
    assert(enc("hell", m1) == Seq("hell"))
    assert(enc("help", m1) == Seq("he", "l", "p"))
    // left-to-right non-overlap inside runs
    val aa = Seq("a" -> "a")
    assert(enc("aaaa", aa) == Seq("aa", "aa"))
    assert(enc("aaa", aa) == Seq("aa", "a"))
    assert(enc("aaaaa", aa) == Seq("aa", "aa", "a"))
    // RANK beats position: (b,c) outranks (a,b), so "abc" -> a + bc even
    // though (a,b) occurs first in the word
    assert(enc("abc", Seq("b" -> "c", "a" -> "b")) == Seq("a", "bc"))
    assert(enc("abc", Seq("a" -> "b", "b" -> "c")) == Seq("ab", "c"))
    // edges: empty word, no applicable merges
    assert(enc("", m1).isEmpty)
    assert(enc("xyz", m1) == Seq("x", "y", "z"))
    // a merged symbol re-enters the pool: (a,a) then (aa,aa)
    assert(enc("aaaa", Seq("a" -> "a", "aa" -> "aa")) == Seq("aaaa"))
    // surrogate pairs stay whole symbols (code-point split, not chars) —
    // and merges can target them like any other symbol
    assert(enc("a😀b", Nil) == Seq("a", "😀", "b"))
    assert(enc("a😀b", Seq("a" -> "😀")) == Seq("a😀", "b"))
  }

  test("BPE encode (t14): codegen path equals the interpreted reference over corpus words") {
    import graft.functions.BpeEncode
    val merges = TextAnalysis.DefaultMerges
    val ranks = BpeEncode.buildRanks(merges)
    val words = graft.Tables.documents(spark, sfDir)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .distinct().limit(500)
    val got = words.select(col("w"), BpeEncode(col("w"), merges).as("syms"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq)
    assert(got.nonEmpty)
    got.foreach { case (w, syms) =>
      assert(syms == BpeEncode.encodeWord(w, ranks).toSeq, s"codegen mismatch for '$w'")
      assert(syms.mkString == w, s"symbols don't reassemble '$w'")
    }
    // the benched t14 spelling: every doc's real BPE count is <= its
    // code-point count and >= its word count (merges only shrink).
    // (The VERIFY frame is the r12 roundtrip/bounds gate — oracle-checked
    // per doc by the driver; here we pin the production spelling.)
    val t14 = graft.SparkEntry.benchQueries("t14_bpe_encode")(spark, sfDir).collect()
    assert(t14.nonEmpty)
    t14.foreach(r => assert(r.getLong(2) >= r.getLong(1), s"fewer tokens than words: $r"))
    // and the r12 gate frame itself: roundtrip + bounds flags all TRUE
    val gate = graft.SparkEntry.queries("t14_bpe_encode")(spark, sfDir).collect()
    assert(gate.nonEmpty)
    gate.foreach(r => assert(r.getBoolean(2) && r.getBoolean(3), s"gate flag false: $r"))
  }

  test("BPE train (t17): learned merges equal the hand-computed Sennrich worked example") {
    import spark.implicits._
    import graft.functions.BpeEncode
    // the paper's worked vocabulary (no end-of-word marker, matching
    // BpeEncode's symbol granularity): low x5, lower x2, newest x6,
    // widest x3 — hand-run of the algorithm with the (count desc, pair
    // lexicographic) tie-break gives this exact merge order, to
    // exhaustion at minPairCount=2
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).toDF("text")
    val expected = Seq(
      "e" -> "s", "es" -> "t", "l" -> "o", "lo" -> "w", "e" -> "w",
      "ew" -> "est", "n" -> "ewest", "d" -> "est", "i" -> "dest",
      "w" -> "idest", "e" -> "r", "low" -> "er")
    val learned = TextAnalysis.bpeTrainMerges(corpus, numMerges = 50)
    assert(learned == expected, s"learned $learned")
    // the production-vocab scale path (one word-count pass + driver-local
    // training on the bounded dict) learns the identical sequence
    assert(TextAnalysis.bpeTrainMergesLocal(corpus, numMerges = 50) == expected)
    // numMerges truncates the SAME sequence (prefix property)
    assert(TextAnalysis.bpeTrainMerges(corpus, numMerges = 8) == expected.take(8))
    // Sennrich's frequency threshold: at minPairCount=3 the count-2
    // merges (e,r)/(low,er) never happen — training stops at 10
    assert(TextAnalysis.bpeTrainMerges(corpus, 50, minPairCount = 3) == expected.take(10))
    // the learned table drives t14's encoder: training vocab words
    // collapse to single symbols; the unseen "lowest" segments into the
    // learned subwords low + est (the classic generalization example)
    val ranks = BpeEncode.buildRanks(learned)
    Seq("low", "lower", "newest", "widest").foreach { w =>
      assert(BpeEncode.encodeWord(w, ranks).toSeq == Seq(w), s"vocab word $w not fused")
    }
    assert(BpeEncode.encodeWord("lowest", ranks).toSeq == Seq("low", "est"))
  }

  test("incremental agg (q51): a delta-only key surfaces through the full-outer merge") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("1999-06-01 00:00:00")
    val ts1 = java.sql.Timestamp.valueOf("2000-06-01 00:00:00")
    val orders = Seq(
      ("1-URGENT", ts0, 10.50), ("1-URGENT", ts1, 5.25),
      ("9-NEW", ts1, 2.00) // this key exists ONLY in the delta
    ).toDF("o_orderpriority", "o_orderdate", "o_totalprice")
    val out = Relational.incrementalAgg(orders, "2000-01-01")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("1-URGENT", 2L, 1L, 15.75),
      ("9-NEW", 1L, 1L, 2.0)),
      s"got ${out.toSeq}")
  }

  test("NB train (t28): the learned model separates planted classes and drives the t15 scorer and A30 stream gate") {
    import spark.implicits._
    // planted signal: positives talk about quality topics, negatives are
    // spam — with shared filler so only the discriminative tokens carry
    // weight. (The synthetic corpus's sources share one vocabulary
    // distribution, so the REAL-corpus check is the oracle's arithmetic
    // replay; usefulness needs actual lexical signal, planted here.)
    val pos = Seq.fill(20)("the quick analysis shows careful rigorous methods")
    val neg = Seq.fill(20)("the cheap spam offer buy now casino jackpot")
    val labeled = (pos.map((_, true)) ++ neg.map((_, false)))
      .zipWithIndex.map { case ((t, p0), i) => (i.toLong, t, p0) }
      .toDF("doc_id", "text", "pos")
    val model = TextAnalysis.nbTrainQualityWeights(labeled, dim = 1024)
    val rows = model.collect()
    assert(rows.length == 1024)
    assert(rows.exists(_.getLong(3) > 0L) && rows.exists(_.getLong(3) < 0L),
      "planted signal must learn both positive and negative weights")
    // discriminative tokens carry the sign they should
    import graft.functions.HashFunctions
    def wOf(tok: String): Long =
      rows(java.lang.Math.floorMod(HashFunctions.md5Hash56Local(tok), 1024L).toInt).getLong(3)
    assert(wOf("rigorous") > 0L, "positive-class token must learn a positive weight")
    assert(wOf("casino") < 0L, "negative-class token must learn a negative weight")
    assert(wOf("the") == 0L, "shared filler must learn ~0 weight")
    // the learned (bucket, w) frame IS a t15 model: scoring the training
    // docs separates the classes completely
    val docs = labeled.select(col("doc_id"), col("text"))
    val scored = TextAnalysis.qualityModelScore(docs,
      model.select(col("bucket"), col("w")), 1024).collect()
    val posIds = labeled.filter(col("pos")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val (p, n) = scored.partition(r => posIds.contains(r.getLong(0)))
    assert(p.nonEmpty && n.nonEmpty)
    assert(p.map(_.getLong(2)).min > n.map(_.getLong(2)).max,
      "NB model failed to separate planted classes")
    // the SAME artifact drives the A30 streaming gate (dense export):
    // row-local scores equal the relational scorer's doc for doc
    val dense = Array.fill(1024)(0L)
    rows.foreach(r => dense(r.getLong(0).toInt) = r.getLong(3))
    val viaGate = graft.streaming.EventsPipeline.qualityGateStream(
      docs.as[(Long, String)], dense)
      .collect().map(f => f.doc_id -> f.score_sum).toMap
    scored.foreach { r =>
      assert(viaGate(r.getLong(0)) == r.getLong(2),
        s"stream-gate score != batch scorer for doc ${r.getLong(0)}")
    }
    // and the real-corpus run stays structurally sane (the oracle covers
    // its arithmetic): exactly dim rows, every weight a small integer
    val real = TextAnalysis.nbTrainQualityWeights(
      graft.Tables.documents(spark, sfDir).select(col("doc_id"), col("text"),
        col("source").isin(TextAnalysis.NbPositiveSources: _*).as("pos")),
      dim = 1024).collect()
    assert(real.length == 1024 && real.forall(r => math.abs(r.getLong(3)) <= 60L))
  }

  test("quality-model artifact (t28): WAP publish round-trips; malformed models quarantine") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-nbmodel").toString
    val docs = graft.Tables.documents(spark, sfDir)
    val model = TextAnalysis.nbTrainQualityWeights(
      docs.select(col("doc_id"), col("text"),
        col("source").isin(TextAnalysis.NbPositiveSources: _*).as("pos")),
      dim = 1024)
    val r = TextAnalysis.publishQualityModel(spark, model, 1024, root, "train-r9")
    assert(r.published && r.version.contains(1L), s"publish failed: $r")
    // the published bytes round-trip into the scorer slot bit-exactly
    val back = TextAnalysis.readQualityModel(spark, root)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    model.collect().foreach(x =>
      assert(back(x.getLong(0)) == x.getLong(3), "published weight != trained"))
    // a model with a count column in the weight slot (|w| in the
    // thousands) quarantines — readers keep v1
    val broken = model.select(col("bucket"), col("n_pos"), col("n_neg"),
      (col("w") + 5000L).as("w"))
    assert(!TextAnalysis.publishQualityModel(spark, broken, 1024, root, "bad-weights").published)
    // a sparse model (missing buckets) quarantines too
    val sparse = model.filter(col("bucket") < 512L)
    assert(!TextAnalysis.publishQualityModel(spark, sparse, 1024, root, "sparse").published)
    assert(graft.operators.Publish.currentVersion(spark, root) == Some(1L))
  }

  test("TextRank (t27): the hub of a star graph outranks its leaves; leaves tie by symmetry") {
    import spark.implicits._
    val docs = Seq("hub leaf1", "hub leaf2", "hub leaf3")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = TextAnalysis.textRank(docs, iters = 3, topK = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 4)
    assert(out.head._1 == "hub" && out.head._2 == 3L, s"got ${out.toSeq}")
    val leaves = out.tail
    assert(leaves.forall(_._2 == 1L))
    // symmetric leaves converge to identical scores; damping floors at 0.15
    assert(leaves.map(_._3).distinct.length == 1, s"leaf scores diverged: ${leaves.toSeq}")
    assert(out.forall(_._3 > 0.15))
    assert(out.head._3 > leaves.head._3 * 2, "hub must clearly outrank leaves")
  }

  test("PMI collocations (t26): a planted collocation outranks common pairs; minCount guards hapax pairs") {
    import spark.implicits._
    // "zig zag" always co-occur (8x); "the cat"/"the dog" share the
    // common "the" (diluted marginals); "rare gem" appears once (hapax -
    // maximal lift but must be filtered by minCount)
    val docs = (Seq.fill(8)("zig zag the cat") ++ Seq.fill(8)("the dog ran off") ++
      Seq("rare gem")).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = TextAnalysis.pmiCollocations(docs, minCount = 2L, topK = 6).collect()
    val byPair = out.map(r => ((r.getString(0), r.getString(1)), r.getDouble(5))).toMap
    // the perfect collocations (c12 = c1 = c2 = 8) tie at the max lift
    // N*8/64; pairs touching the shared "the" (c1 = 16) score half that
    assert(byPair.contains(("zig", "zag")), s"missing planted pair in $byPair")
    assert(byPair.contains(("dog", "ran")))
    assert(byPair(("zig", "zag")) == byPair(("dog", "ran")), "perfect pairs must tie")
    assert(byPair.get(("the", "cat")).forall(_ < byPair(("zig", "zag"))),
      "marginal-diluted pair must rank below the perfect collocations")
    assert(!byPair.keys.exists(_._1 == "rare"),
      "hapax pair must be filtered by minCount")
    // planted counts: c12 = 8 for the perfect pair
    assert(out.find(r => r.getString(0) == "zig").get.getLong(2) == 8L)
    // every emitted lift is positive and r4-quantized
    out.foreach { r =>
      val lift = r.getDouble(5)
      assert(lift > 0.0 && lift == math.floor(lift * 1e4 + 0.5) / 1e4)
    }
  }

  test("BPE train (t17): batched top-R rounds cut driver round-trips; batchR=1 IS sequential Sennrich") {
    import spark.implicits._
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).toDF("text")
    val expected = Seq(
      "e" -> "s", "es" -> "t", "l" -> "o", "lo" -> "w", "e" -> "w",
      "ew" -> "est", "n" -> "ewest", "d" -> "est", "i" -> "dest",
      "w" -> "idest", "e" -> "r", "low" -> "er")
    // batchR=1 IS the sequential trainer: identical merges (the Sennrich
    // worked example), one distributed probe per merge + the final empty
    // probe that detects exhaustion
    val (seq1, rounds1) = TextAnalysis.bpeTrainMergesBatched(corpus, 50, batchR = 1)
    assert(seq1 == expected)
    assert(rounds1 == expected.size + 1, s"R=1 rounds $rounds1")
    // batchR=4 learns a complete table in ~4x fewer distributed rounds —
    // the measured drop the production-vocab path banks on
    val (batched, rounds4) = TextAnalysis.bpeTrainMergesBatched(corpus, 50, batchR = 4)
    assert(rounds4 < rounds1 / 2,
      s"batched rounds $rounds4 not a real cut vs sequential $rounds1")
    assert(batched.size >= expected.size - 2, s"batched table too small: $batched")
    assert(batched.distinct == batched, s"batched table repeats a merge: $batched")
    // the within-round conflict rule preserves the merges-file
    // reachability contract for ANY batchR: every multi-codepoint side is
    // the fusion of some STRICTLY EARLIER merge — the publish audit's
    // loader invariant
    val fusions = batched.map { case (a, b) => a + b }
    batched.zipWithIndex.foreach { case ((a, b), i) =>
      Seq(a, b).filter(s => s.codePointCount(0, s.length) > 1).foreach { side =>
        assert(fusions.take(i).contains(side),
          s"side '$side' of merge $i not reachable from earlier merges")
      }
    }
    // numMerges caps the batched path mid-round too
    val (capped, _) = TextAnalysis.bpeTrainMergesBatched(corpus, 5, batchR = 4)
    assert(capped.size == 5)
    assert(capped == batched.take(5), "cap must truncate the same batched sequence")
  }

  test("BPE train (t17): Spark training equals an independent local reference on random corpora") {
    import spark.implicits._
    // straight-line local implementation of the same public algorithm
    // (word counts -> repeat: count adjacent pairs, fuse the (count
    // desc, pair lexicographic) best), kept deliberately naive so the
    // distributed spelling is checked against something with no shared
    // code or shared mistakes
    def localTrain(words: Seq[String], numMerges: Int, minCount: Long): Seq[(String, String)] = {
      var vocab: Map[Seq[String], Long] = words.filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
        .map { case (w, n) =>
          val cps = new scala.collection.mutable.ArrayBuffer[String]
          var i = 0
          while (i < w.length) {
            val cp = w.codePointAt(i)
            cps += new String(Character.toChars(cp)); i += Character.charCount(cp)
          }
          (cps.toSeq, n)
        }
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var go = true
      while (go && out.size < numMerges) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        vocab.foreach { case (syms, n) =>
          syms.sliding(2).filter(_.size == 2).foreach { p =>
            counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + n
          }
        }
        val best = counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.headOption
        best.filter(_._2 >= minCount) match {
          case None => go = false
          case Some(((a, b), _)) =>
            out += ((a, b))
            vocab = vocab.groupBy { case (syms, _) =>
              val fused = scala.collection.mutable.ArrayBuffer.empty[String]
              var i = 0
              while (i < syms.length) {
                if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
                  fused += a + b; i += 2
                } else { fused += syms(i); i += 1 }
              }
              fused.toSeq
            }.view.mapValues(_.values.sum).toMap
        }
      }
      out.toSeq
    }
    val rng = new scala.util.Random(20260813L)
    (1 to 5).foreach { trial =>
      // small random corpora over a tiny alphabet maximize pair ties,
      // stressing exactly the tie-break determinism
      val words = Seq.fill(30)(Seq.fill(2 + rng.nextInt(5))(
        ('a' + rng.nextInt(4)).toChar).mkString)
      val sparkMerges = TextAnalysis.bpeTrainMerges(words.toDF("text"), numMerges = 8)
      val localMerges = localTrain(words, numMerges = 8, minCount = 2L)
      assert(sparkMerges == localMerges,
        s"trial $trial: spark $sparkMerges != local $localMerges for corpus $words")
      // the scale path agrees too (uncapped vocab: same algorithm, same
      // tie-breaks, different execution substrate)
      assert(TextAnalysis.bpeTrainMergesLocal(words.toDF("text"), numMerges = 8) == localMerges,
        s"trial $trial: scale-path training diverged")
    }
  }

  test("BPE tokenizer artifact (t17): WAP publish round-trips, malformed tables quarantine") {
    import spark.implicits._
    import graft.functions.BpeEncode
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).toDF("text")
    val learned = TextAnalysis.bpeTrainMerges(corpus, numMerges = 50)
    val root = java.nio.file.Files.createTempDirectory("graft-bpe-artifact").toString
    val r = TextAnalysis.publishBpeMerges(spark, learned, root, "train-1")
    assert(r.published && r.version.contains(1L), s"publish failed: $r")
    // round-trip: the published model IS the learned model, and the
    // encoder drives off the read-back artifact identically
    val back = TextAnalysis.readBpeMerges(spark, root)
    assert(back == learned)
    assert(BpeEncode.encodeWord("lowest", BpeEncode.buildRanks(back)).toSeq == Seq("low", "est"))
    // a malformed table (reversed order: later fusions referenced before
    // they exist) fails the structural audit and QUARANTINES — readers
    // keep serving version 1
    val r2 = TextAnalysis.publishBpeMerges(spark, learned.reverse, root, "train-2")
    assert(!r2.published, "reversed merges table must not publish")
    assert(r2.violations.exists(_._1 == "sides_reachable_from_earlier_merges"),
      s"expected reachability violation, got ${r2.violations}")
    assert(TextAnalysis.readBpeMerges(spark, root) == learned)
    // retraining publishes the next version atomically
    val r3 = TextAnalysis.publishBpeMerges(spark, learned.take(8), root, "train-3")
    assert(r3.published && r3.version.contains(2L))
    assert(TextAnalysis.readBpeMerges(spark, root) == learned.take(8))
  }

  test("BPE train (t17): query entry learns a real table from the corpus") {
    // the benched spelling is the learned table (the VERIFY frame is the
    // r12 first-merge/invariants gate, oracle-checked by the driver)
    val t17 = graft.SparkEntry.benchQueries("t17_bpe_train")(spark, sfDir).collect()
    assert(t17.length == 16, s"expected 16 merges, got ${t17.length}")
    assert(t17.map(_.getLong(0)).toSeq == (0L until 16L), "ranks not dense 0..15")
    t17.foreach { r =>
      assert(r.getString(1).nonEmpty && r.getString(2).nonEmpty, s"empty symbol in $r")
    }
    // the r12 gate frame: first merge matches the learned table's head,
    // invariants hold, and the selection count is a real corpus count
    val gate = graft.SparkEntry.queries("t17_bpe_train")(spark, sfDir).collect()
    assert(gate.length == 1 && gate.head.getLong(0) == 16L)
    assert(gate.head.getString(1) == t17.head.getString(1)
      && gate.head.getString(2) == t17.head.getString(2),
      "gate first merge != learned table head")
    assert(gate.head.getLong(3) >= 2L && gate.head.getBoolean(4), s"gate: ${gate.head}")
    // the scale path learns the IDENTICAL table on the real corpus
    val viaDict = TextAnalysis.bpeTrainMergesLocal(
      graft.Tables.documents(spark, sfDir), numMerges = 16)
    assert(t17.map(r => r.getString(1) -> r.getString(2)).toSeq == viaDict,
      "distributed-rounds and word-dict training paths diverged on the real corpus")
    // merges-file validity: every side of merge i is a single code point
    // or the fusion of some EARLIER merge — the structural property a
    // merges file must satisfy to be loadable (symbols can only exist if
    // built), checked incrementally over the learned order
    val merges = t17.map(r => r.getString(1) -> r.getString(2)).toSeq
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      val built = merges.take(i).map { case (x, y) => x + y }.toSet
      Seq(a, b).foreach { s =>
        assert(s.codePointCount(0, s.length) == 1 || built(s),
          s"merge $i side '$s' is neither a code point nor an earlier fusion")
      }
    }
  }

  test("packSequences with an injected BPE token counter keeps the pack arithmetic exact") {
    import graft.functions.BpeEncode
    val docs = graft.Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val counted = docs.select(col("doc_id"),
      aggregate(transform(split(lower(trim(col("text"))), "\\s+"),
          w => size(BpeEncode(w, TextAnalysis.DefaultMerges)).cast("long")),
        lit(0L), (a, x) => a + x).as("nt_bpe"))
    val packed = Pipeline.packSequences(docs, 512L, 4,
        aggregate(transform(split(lower(trim(col("text"))), "\\s+"),
            w => size(BpeEncode(w, TextAnalysis.DefaultMerges)).cast("long")),
          lit(0L), (a, x) => a + x))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // nt column IS the BPE count
    val ntMap = counted.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    packed.foreach { case (id, nt, _, _) => assert(nt == ntMap(id), s"nt mismatch for doc $id") }
    // within each shard, pack_id re-derives from the exclusive cumsum
    packed.groupBy(_._3).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._1).foreach { case (id, nt, _, packId) =>
        assert(packId == cum / 512L, s"pack arithmetic broke at doc $id")
        cum += nt
      }
    }
  }

  test("quality model (t15): injected weights drive the integer keep gate") {
    import graft.functions.{HashFunctions => H}
    val docs = Seq((1L, "good good good"), (2L, "bad bad"), (3L, "good bad"))
      .toDF("doc_id", "text")
    val dim = 64
    val b = docs.sparkSession.range(1).select(
      pmod(H.md5Hash56(lit("good")), lit(dim.toLong)).as("g"),
      pmod(H.md5Hash56(lit("bad")), lit(dim.toLong)).as("b")).head()
    val (gb, bb) = (b.getLong(0), b.getLong(1))
    assert(gb != bb, "fixture premise: the two tokens must not collide at dim=64")
    val weights = docs.sparkSession.range(dim).select(col("id").as("bucket"),
      when(col("id") === gb, 1000L).when(col("id") === bb, -1000L).otherwise(0L).as("w"))
    val out = TextAnalysis.qualityModelScore(docs, weights, dim).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(1L) == ((3000L, true)))
    assert(out(2L) == ((-2000L, false)))
    assert(out(3L) == ((0L, true)), "score 0 keeps (gate is >= 0)")
  }

  test("PII scrub (t12) counts and redacts planted emails, IPs, and digit runs") {
    val docs = Seq(
      (1L, "contact bob@example.com or alice.smith+x@sub.domain.org today"),
      (2L, "server at 192.168.0.1 and 10.0.0.255, order 1234567890"),
      (3L, "clean text with short 123 and 12345 numbers"),
      (4L, "mixed: a@b.co from 8.8.8.8 id 99999999")).toDF("doc_id", "text")
    val out = TextAnalysis.piiScrub(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out(1L)._1 == 2 && out(1L)._2 == 0 && out(1L)._3 == 0)
    // counts agree with the REDACTED bytes, not the raw text: an IP
    // swallowed whole by the email redaction is not double-counted
    val swallowed = Seq((9L, "a@192.168.0.1.com")).toDF("doc_id", "text")
    val sw = TextAnalysis.piiScrub(swallowed).collect().head
    assert((sw.getLong(1), sw.getLong(2), sw.getLong(3)) == ((1L, 0L, 0L)),
      s"email-consumed IP must not be counted: $sw")
    assert(out(2L)._1 == 0 && out(2L)._2 == 2 && out(2L)._3 == 1)
    assert(out(3L) == ((0L, 0L, 0L, out(3L)._4))) // nothing to redact
    assert(out(4L)._1 == 1 && out(4L)._2 == 1 && out(4L)._3 == 1)
    // the hash pins the redacted BYTES, not just the counts — and an
    // IP's octets must never resurface as digit runs (order contract)
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(4L)._4 == md5hex("mixed: <EMAIL> from <IP> id <NUM>"))
    assert(out(3L)._4 == md5hex("clean text with short 123 and 12345 numbers"))
  }

  test("bigram LM (t13) computes exact conditional counts on a planted corpus") {
    val docs = Seq((1L, "a b a b a c"), (2L, "a b x")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLm(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // doc1 bigrams: ab ba ab ba ac; doc2: ab bx → c(a·)=6? no: a-starting
    // bigrams: ab×3, ac×1 → c(a·)=4; b-starting: ba×2, bx×1 → c(b·)=3
    assert(out(("a", "b")) == ((3L, 0.75)))
    assert(out(("a", "c")) == ((1L, 0.25)))
    assert(out(("b", "a")) == ((2L, 0.6667)))
    assert(out(("b", "x")) == ((1L, 0.3333)))
    // per-w1 conditionals sum to ~1 over the full table
    val byW1 = TextAnalysis.bigramLm(docs, topN = 1000).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(3)).sum)
    byW1.foreach { case (w1, s) => assert(math.abs(s - 1.0) < 1e-3, s"$w1 sums to $s") }
  }

  test("pack materialization (p9) agrees with the p8 layout it assembles") {
    val sf = "/root/testdata/sf0.01"
    val p8 = graft.SparkEntry.queries("p8_pack_sequences_sharded")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    val p9 = graft.SparkEntry.queries("p9_pack_materialize")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    assert(p9.keySet == p8.keySet, "p9 must materialize exactly p8's packs")
    p9.foreach { case (k, (nDocs, tokens, hash)) =>
      assert((nDocs, tokens) == p8(k), s"pack $k stats drifted from the p8 layout")
      assert(hash.length == 32) // md5 hex of the assembled content
    }
  }

  test("winnowing fingerprints rediscover the minhash near-duplicates") {
    val sf = "/root/testdata/sf0.01"
    val t7 = graft.SparkEntry.queries("t7_winnowing_fingerprints")(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val d2 = graft.SparkEntry.queries("d2_dedup_minhash_lsh")(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(d2.nonEmpty && t7.nonEmpty)
    val found = (d2 & t7).size
    assert(found >= d2.size / 2, s"winnowing found $found of ${d2.size} near-dup pairs")
  }

  test("dedup clusters (d6) equal union-find components of the d2 pair graph") {
    val sf = "/root/testdata/sf0.01"
    val pairs = graft.SparkEntry.queries("d2_dedup_minhash_lsh")(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    // independent reference: a driver-side union-find over the same pairs
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(n => n -> find(n)).toMap
    val d6 = graft.SparkEntry.queries("d6_dedup_clusters")(spark, sf).collect()
    val got = d6.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, "label-propagation components != union-find components")
    // cluster_id is the min member and cluster_size counts its rows
    val byCluster = d6.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, rows) =>
      assert(rows.map(_.getLong(0)).min == cid)
      assert(rows.forall(_.getLong(2) == rows.length))
    }
  }

  test("k=4 gram ids preserve gram string order for BMP text, including chars >= U+8000") {
    // winnowing's MIN selection and the (df, fp) rarest ranking rely on
    // packed-long order == lexicographic codepoint order; the rotation by
    // Long.MinValue must keep that true when the first char's codepoint
    // sets bit 15 of its 16-bit field (CJK, Hangul, full-width forms)
    val texts = Seq(
      (1L, "ab語écd！ef"),          // CJK + full-width in the middle
      (2L, "耀A￮Bzz"),        // >= U+8000 as a gram FIRST char
      (3L, "plain ascii text here"))
    val grams = graft.functions.HashFunctions
      .charGramIds(texts.toDF("doc_id", "text"), col("text"), 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byDoc = texts.toMap
    val pairs = for {
      (d1, p1, g1) <- grams; (d2, p2, g2) <- grams
      s1 = byDoc(d1).substring(p1, p1 + 4); s2 = byDoc(d2).substring(p2, p2 + 4)
    } yield (g1.compareTo(g2).sign, s1.compareTo(s2).sign)
    assert(pairs.nonEmpty)
    pairs.foreach { case (lo, so) => assert(lo == so, "long order != string order") }
  }

  test("connectedComponents: empty graph, long chain, and multi-component cases") {
    // empty pair frame -> empty result, no crash (the dup-free corpus case)
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.connectedComponents(empty).collect().isEmpty)
    // a 20-node chain needs 19 linear rounds; pointer-jumping must close
    // it well inside the cap — and a second component must stay separate
    val chain = (1L until 20L).map(i => (i, i + 1)) ++ Seq((100L, 101L))
    val out = Dedup.connectedComponents(chain.toDF("doc_a", "doc_b")).collect()
    val labels = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 20L).forall(labels(_) == 1L))
    assert(labels(100L) == 100L && labels(101L) == 100L)
    val sizes = out.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sizes(5L) == 20 && sizes(101L) == 2)
  }

  test("large-star/small-star converges on a 10k-node path and backs the pointer-jump cap") {
    // a 10k-diameter path — the adversarial shape for label propagation
    // (the pointer-jump design bound is diameter <= 2^maxRounds; the
    // star alternation's round count is O(log^2 n) INDEPENDENT of
    // diameter) — plus a second component that must stay separate
    val chain = (1L until 10000L).map(i => (i, i + 1)) ++ Seq((50000L, 50001L))
    val df = chain.toDF("doc_a", "doc_b")
    val star = Dedup.connectedComponentsStar(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(star.length == 10002)
    assert(star.filter(_._1 <= 10000L).forall(t => t._2 == 1L && t._3 == 10000L),
      "every path node must land in component 1 with size 10000")
    assert(star.filter(_._1 >= 50000L).forall(t => t._2 == 50000L && t._3 == 2L))
    // the fallback wiring: a pointer-jump cap too small for the diameter
    // must route through the star path and return the same answer, not throw
    val viaFallback = Dedup.connectedComponents(df, maxRounds = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(viaFallback.sorted.sameElements(star.sorted))
    // contract parity on self-pairs: a node appearing only as (n, n) is a
    // singleton component in BOTH implementations (the star path's edge
    // canonicalization drops self-loops, so the node must be unioned back)
    val withSelf = Seq((1L, 2L), (7L, 7L)).toDF("doc_a", "doc_b")
    val jump = Dedup.connectedComponents(withSelf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val starSelf = Dedup.connectedComponentsStar(withSelf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(jump.sameElements(starSelf), s"jump=${jump.toSeq} star=${starSelf.toSeq}")
    assert(starSelf.contains((7L, 7L, 1L)), "self-pair-only node must survive as a singleton")
  }

  test("both CC implementations match a union-find oracle on seeded random graphs") {
    // deterministic seed — this is a fixed regression battery, not a
    // flaky fuzzer; self-pairs and duplicate edges arise naturally
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { _ =>
      val n = 2 + rnd.nextInt(30)
      val pairs = Seq.fill(rnd.nextInt(40))((1L + rnd.nextInt(n), 1L + rnd.nextInt(n)))
      val df = pairs.toDF("doc_a", "doc_b")
      // union-find with larger-root-under-smaller-root linking: every
      // component's root IS its min member
      val parent = collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      val comp = nodes.map(x => x -> find(x)).toMap
      val expected = nodes.map(x =>
        (x, comp(x), nodes.count(y => comp(y) == comp(x)).toLong)).toSet
      Seq("pointer-jump" -> Dedup.connectedComponents(df),
          "star" -> Dedup.connectedComponentsStar(df)).foreach { case (impl, out) =>
        val got = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        assert(got == expected,
          s"$impl diverged on pairs=$pairs:\n got=$got\n exp=$expected")
      }
    }
  }

  test("canonical selection (d7) keeps the best-quality member of each d6 cluster") {
    val sf = "/root/testdata/sf0.01"
    val clusters = graft.SparkEntry.queries("d6_dedup_clusters")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val quality = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val d7 = graft.SparkEntry.queries("d7_dedup_canonical")(spark, sf).collect()
    assert(d7.nonEmpty)
    // one keeper per d6 cluster; the keeper is a member and no member of
    // its cluster scores strictly higher
    val byCluster = clusters.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(d7.map(_.getLong(0)).toSet == byCluster.keySet)
    d7.foreach { r =>
      val (cid, keep, keepQ, n) = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))
      val members = byCluster(cid)
      assert(members.contains(keep))
      assert(n == members.size)
      assert(keepQ == quality(keep))
      assert(members.forall(m => quality(m) <= keepQ))
      // deterministic tie-break: smallest id among max-quality members
      assert(keep == members.filter(m => quality(m) == keepQ).min)
    }
  }

  test("train/val split (p2) is deterministic, bounded, and consistent") {
    val sf = "/root/testdata/sf0.01"
    val rows = graft.SparkEntry.queries("p2_train_val_split")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (bucket, split) = (r.getLong(1), r.getString(2))
      assert(bucket >= 0 && bucket < 100)
      assert(split == (if (bucket < 90) "train" else "val"))
    }
    val trainFrac = rows.count(_.getString(2) == "train").toDouble / rows.length
    assert(trainFrac > 0.8 && trainFrac < 0.97, s"train fraction $trainFrac")
    // rerun -> identical assignment (the anti-rand() guarantee)
    val again = graft.SparkEntry.queries("p2_train_val_split")(spark, sf).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("stratified sample (p3) takes at most S docs per language, rank-contiguous") {
    val sf = "/root/testdata/sf0.01"
    val rows = graft.SparkEntry.queries("p3_stratified_sample")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(1)).foreach { case (_, g) =>
      assert(g.length <= 25)
      assert(g.map(_.getLong(2)).sorted.sameElements(1L to g.length))
    }
  }

  test("tfidf (t9) respects its integer gates and scores repeated rare terms") {
    val sf = "/root/testdata/sf0.01"
    val nDocs = graft.Tables.documents(spark, sf).count()
    val rows = graft.SparkEntry.queries("t9_tfidf")(spark, sf).collect()
    // the gates must leave a substantive per-doc term profile, not a sliver
    assert(rows.length > nDocs, s"only ${rows.length} tfidf rows for $nDocs docs")
    rows.foreach { r =>
      assert(r.getLong(2) >= 2, "tf gate")
      assert(r.getLong(3) * 5 <= nDocs * 4, "df gate")
      assert(r.getDouble(4) > 0.0)
    }
  }

  test("cube totals (q31) are internally consistent across grouping levels") {
    val sf = "/root/testdata/sf0.01"
    val rows = graft.SparkEntry.queries("q31_cube_totals")(spark, sf).collect()
    val grand = rows.filter(r => r.getLong(5) == 1 && r.getLong(6) == 1)
    assert(grand.length == 1)
    val total = grand.head.getLong(4)
    assert(total == graft.Tables.lineitem(spark, sf).count())
    // each partial level's counts re-sum to the grand total
    Seq((0L, 0L), (0L, 1L), (1L, 0L)).foreach { case (grf, gls) =>
      val n = rows.filter(r => r.getLong(5) == grf && r.getLong(6) == gls)
        .map(_.getLong(4)).sum
      assert(n == total, s"level ($grf,$gls) sums to $n != $total")
    }
  }

  test("decontamination (d8) flags exactly the docs sharing an n-gram with the benchmark slice") {
    // planted corpus: doc 10 copies an 8-token window from benchmark doc 0,
    // doc 11 shares only shorter runs, doc 12 is disjoint
    val planted = Seq(
      (0L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (10L, "x0 w2 w3 w4 w5 w6 w7 w8 w9 x1"),
      (11L, "w1 w2 w3 w4 w5 w6 w7 x w8 w9 w10"),
      (12L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val out = Dedup.decontaminate(planted, col("doc_id") === 0L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out == Map(10L -> (1L, true), 11L -> (0L, false), 12L -> (0L, false)))

    // real corpus: exact both directions vs a driver-side brute force
    // (tokenization twin: UTF8String trim/lower + split -1, the exact
    // Spark semantics — see minhashBandedLocal's rationale)
    import org.apache.spark.unsafe.types.UTF8String
    def gramsOf(text: String): Set[String] = {
      val tk = UTF8String.fromString(text).trim().toLowerCase().toString.split("\\s+", -1)
      if (tk.length < 8) Set.empty else tk.sliding(8).map(_.mkString(" ")).toSet
    }
    val sf = "/root/testdata/sf0.01"
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1))
    val benchGrams = docs.filter(_._1 % 20 == 0).flatMap(d => gramsOf(d._2)).toSet
    val expected = docs.filter(_._1 % 20 != 0)
      .map { case (id, t) => id -> (gramsOf(t) & benchGrams).size.toLong }.toMap
    val got = graft.SparkEntry.queries("d8_decontaminate")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(expected.values.exists(_ > 0), "corpus gate check: no contamination found at all")
  }

  test("grouping sets (q34) levels re-sum to the grand total") {
    val rows = graft.SparkEntry.queries("q34_grouping_sets")(spark, sfDir).collect()
    def lvl(gp: Long, gs: Long) = rows.filter(r => r.getLong(4) == gp && r.getLong(5) == gs)
    val total = lvl(1L, 1L) match { case Array(r) => r.getLong(2) }
    Seq((0L, 0L), (0L, 1L)).foreach { case (gp, gs) =>
      assert(lvl(gp, gs).map(_.getLong(2)).sum == total, s"level ($gp,$gs) count mismatch")
    }
  }

  test("sequence packing (p4): packs are contiguous, complete, and land on the budget grid") {
    val B = 2048L
    val docs = graft.Tables.documents(spark, sfDir).count()
    val rows = graft.SparkEntry.queries("p4_pack_sequences")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._2).sum == docs, "every doc packed exactly once")
    rows.sliding(2).foreach {
      case Array((_, _, _, _, lastA), (_, _, _, firstB, _)) =>
        assert(lastA < firstB, "packs must hold consecutive disjoint doc ranges")
      case _ => ()
    }
    // exclusive cumulative tokens at each pack's first doc sit in [k*B, (k+1)*B)
    var cum = 0L
    rows.foreach { case (packId, _, totalTokens, _, _) =>
      assert(cum >= packId * B && cum < (packId + 1) * B,
        s"pack $packId starts at cumulative $cum outside its budget window")
      cum += totalTokens
    }
  }

  test("sharded packing (packSequences/p8): partitioned window, per-shard invariants, determinism") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val B = 512L
    val docs = graft.Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val assigned = Pipeline.packSequences(docs, tokenBudget = B, shards = 4)
    // 1. SCALE-PATH PLAN: the cumsum window is partitioned by shard — no
    //    empty-partition window (Spark's "moving all data to a single
    //    partition" shape) anywhere in the plan
    val wins = assigned.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty, "expected a Window node in the packing plan")
    wins.foreach(w => assert(w.partitionSpec.nonEmpty,
      "packSequences must never plan an unpartitioned (single-task) window"))
    val rows = assigned.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // 2. every doc assigned exactly once
    assert(rows.length == docs.count() && rows.map(_._1).distinct.length == rows.length)
    // 3. per-shard invariants: consecutive pack ids from 0; within a
    //    shard, packing is contiguous in doc_id order and each pack's
    //    FIRST doc starts exactly in its budget window [k*B, (k+1)*B)
    //    under the shard-local exclusive cumsum
    rows.groupBy(_._3).foreach { case (shard, rs) =>
      val byDoc = rs.sortBy(_._1)
      assert(byDoc.map(_._4).distinct.sorted.sameElements(0L until (byDoc.map(_._4).max + 1)),
        s"shard $shard pack ids must be consecutive from 0")
      var cum = 0L
      byDoc.foreach { case (docId, nt, _, packId) =>
        assert(cum / B == packId,
          s"doc $docId in shard $shard: cum-before $cum maps to pack ${cum / B}, got $packId")
        cum += nt
      }
    }
    // 4. determinism: assignment survives an adversarial repartition
    val re = Pipeline.packSequences(docs.repartition(7), B, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(re.sortBy(_._1).sameElements(rows.sortBy(_._1)),
      "pack assignment must be repartition-stable")
    // 5. shards=1 degenerates to exactly P4's global packing
    val oneShard = Pipeline.packSequences(docs, 2048L, shards = 1)
      .groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("total_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("pack_id")).collect().toSeq
    val p4 = graft.SparkEntry.queries("p4_pack_sequences")(spark, sfDir).collect().toSeq
    assert(oneShard == p4, "shards=1 must reproduce the global p4 packing")
  }

  test("funnel (q35) stages are monotonically non-increasing and stage 1 covers all viewers") {
    val sf = "/root/testdata/sf0.01"
    val rows = graft.SparkEntry.queries("q35_funnel")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rows.keySet == Set(1L, 2L, 3L))
    assert(rows(1L) >= rows(2L) && rows(2L) >= rows(3L), s"funnel not monotone: $rows")
    assert(rows(3L) > 0, "gate check: nobody completes the funnel on this corpus")
    val viewers = graft.Tables.events(spark, sf)
      .filter(col("event_type") === "view").select("user_id").distinct().count()
    assert(rows(1L) == viewers)
  }

  test("parameterized funnel: longer step lists never retain more users, prefix counts agree") {
    val sf = "/root/testdata/sf0.01"
    val e = graft.Tables.events(spark, sf)
    val two = Relational.funnel(e, Seq("view", "click"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val three = Relational.funnel(e, Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // shared prefix stages count identically; the added stage only shrinks
    assert(two(1L) == three(1L) && two(2L) == three(2L))
    assert(three(3L) <= three(2L) && three(2L) <= three(1L))
    val single = Relational.funnel(e, Seq("signup")).collect()
    assert(single.length == 1 && single.head.getLong(2) ==
      e.filter(col("event_type") === "signup").select("user_id").distinct().count())
  }

  test("retention (q36): day-0 equals cohort size and later offsets never exceed it") {
    val sf = "/root/testdata/sf0.01"
    val rows = graft.SparkEntry.queries("q36_retention_cohorts")(spark, sf)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_._1)
    val totalUsers = graft.Tables.events(spark, sf).select("user_id").distinct().count()
    assert(byCohort.map { case (_, rs) => rs.find(_._2 == 0L).map(_._3).getOrElse(0L) }.sum
      == totalUsers, "every user appears in exactly one cohort at k=0")
    byCohort.foreach { case (cd, rs) =>
      val day0 = rs.find(_._2 == 0L).map(_._3).getOrElse(0L)
      assert(day0 > 0, s"cohort $cd missing its k=0 row")
      rs.foreach { case (_, k, n) =>
        assert(n <= day0, s"cohort $cd offset $k retains $n > cohort size $day0")
      }
    }
  }

  test("surprisal (t11) scores are positive, bounded by ln(corpus tokens), and discriminate docs") {
    val rows = graft.SparkEntry.queries("t11_surprisal")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val totalTokens = rows.map(_._2).sum
    val maxSurprisal = math.log(totalTokens.toDouble)
    assert(rows.nonEmpty)
    rows.foreach { case (id, _, sc) =>
      // slack must exceed the r4 quantization step (5e-5): an all-unique
      // doc's true avg is exactly ln(nt) and may round up to the grid
      assert(sc > 0 && sc <= maxSurprisal + 1e-4, s"doc $id surprisal $sc out of range")
    }
    // gate check: the score must separate docs, not collapse to a constant
    // (template corpus + 4-dp quantization → ~40% distinct at sf0.001)
    assert(rows.map(_._3).distinct.length > rows.length / 5,
      "surprisal degenerate: most docs share a score")
  }

  test("quantized ANN (s5): int8 scan + exact rerank has recall >= 0.9 vs brute force") {
    val sf = "/root/testdata/sf0.01"
    val s1Rows = graft.SparkEntry.queries("s1_ann_bruteforce_topk")(spark, sf).collect()
    val exact = s1Rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val s5 = graft.SparkEntry.queries("s5_ann_quantized_topk")(spark, sf).collect()
    // rank integrity per query
    s5.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(1)).sorted.sameElements(1L to rows.length))
    }
    val quantTopk = s5.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (quantTopk & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"s5 quantized recall $recall < 0.9")
    // the rerank step reports EXACT float cosines: scores of true-positive
    // pairs must match s1's to the shared 4-dp quantization
    val exactScores = s1Rows.map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    s5.foreach { r =>
      exactScores.get((r.getLong(0), r.getLong(2))).foreach { es =>
        assert(math.abs(es - r.getDouble(3)) < 1e-12,
          s"rerank cosine diverged from exact for ${(r.getLong(0), r.getLong(2))}")
      }
    }
  }
  test("boilerplate segments (d9): slot aggregation equals naive w-word grouping on hand-checked cases") {
    // "a b c" occurs in docs 1,2,3,5 (df 4 >= 3 -> boilerplate);
    // "d e f" df 2 and "x y z" df 1 stay; trailing partials drop;
    // a doc under w words has zero segments and passes the keep gate
    val docs = Seq(
      (1L, "a b c d e f g"),
      (2L, "a b c x y z"),
      (3L, "a b c a b c"),
      (4L, "q r"),
      (5L, "a b c d e f")).toDF("doc_id", "text")
    val out = Dedup.boilerplateSegments(docs, 3, 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(4)))).toMap
    assert(out(1L) == ((2L, 1L, false))) // 1/2 boilerplate = 50% > 30%
    assert(out(2L) == ((2L, 1L, false)))
    assert(out(3L) == ((2L, 2L, false))) // same segment twice in one doc: df counts the doc once
    assert(out(4L) == ((0L, 0L, true)))
    assert(out(5L) == ((2L, 1L, false)))
  }

  test("containment (d10) finds a quoted subset that Jaccard near-dup cannot see") {
    val quoted = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val container = quoted + " " + (1 to 30).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, quoted), (2L, container)).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1.0),
      s"full containment missed: ${pairs.mkString(",")}")
    assert(!pairs.exists(p => p._1 == 2L && p._2 == 1L),
      "containment must be asymmetric: the container is not contained")
    // the symmetric Jaccard operator is structurally blind to this pair
    assert(Dedup.nearDupPairs(docs, 0.8).count() == 0)
  }

  test("capped containment (d10) equals the uncapped answer — prefix guarantee survives the df cap") {
    // real corpus: the capped index (plus residue routing) must reproduce
    // the uncapped output EXACTLY — recall 1 by pigeonhole, output
    // equality by the shared exact verify
    val corpus = graft.Tables.documents(spark, sfDir)
    val uncapped = Dedup.containmentPairs(corpus, 0.8).collect().toSeq
    Seq(3L, 25L).foreach { cap =>
      val capped = Dedup.containmentPairs(corpus, 0.8, indexDfCap = Some(cap)).collect().toSeq
      assert(capped == uncapped, s"df cap $cap changed the containment answer")
    }
    // adversarial residue corpus: ten identical boilerplate-only docs —
    // with cap 5 every shingle has df 10 > 5, so the capped index is
    // EMPTY and only the residue path can find the (all-ordered-pairs)
    // containment; losing it would be exactly the recall hole the
    // residue routing exists to close
    val boiler = (1L to 10L).map(i => (i, "lorem ipsum dolor sit amet consectetur"))
      .toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(boiler, 0.8, indexDfCap = Some(5L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == (for { a <- 1L to 10L; b <- 1L to 10L if a != b } yield (a, b)).toSet,
      "residue path must recover pairs whose every shingle is df-capped out of the index")
    // cap 0 is rejected loudly rather than silently degenerating
    intercept[IllegalArgumentException] {
      Dedup.containmentPairs(boiler, 0.8, indexDfCap = Some(0L))
    }
  }

  test("substring spans (d12): planted span detected with exact boundaries at arbitrary offsets") {
    val shared = (1 to 20).map(i => s"s$i").mkString(" ")
    // offsets differ (6 vs 3) and neither aligns to any fixed segment
    // grid — the boundary-straddling case d9's positional segments miss
    val docA = (1 to 5).map(i => s"a$i").mkString(" ") + " " + shared + " " +
      (6 to 13).map(i => s"a$i").mkString(" ")
    val docB = "b1 b2 " + shared + " " + (3 to 9).map(i => s"b$i").mkString(" ")
    val docs = Seq((1L, docA), (2L, docB), (3L, "entirely unrelated filler text about nothing shared"))
      .toDF("doc_id", "text")
    val out = Dedup.substringSpans(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // ONE maximal span, not a pile of overlapping sub-spans
    assert(out.toSeq == Seq((1L, 2L, 6L, 3L, 20L)), s"got ${out.mkString(",")}")
  }

  test("substring spans (d12): two disjoint spans come back as two islands; sub-minSpan spans are dropped") {
    val s1 = (1 to 16).map(i => s"p$i").mkString(" ")
    val s2 = (1 to 16).map(i => s"q$i").mkString(" ")
    val short = (1 to 14).map(i => s"r$i").mkString(" ")
    val docA = s1 + " a1 a2 a3 " + s2 + " a4 " + short
    val docB = "b1 " + s2 + " b2 b3 " + s1 + " " + short + " b4"
    val docs = Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")
    val out = Dedup.substringSpans(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    // s1 at A:1 B:20, s2 at A:20 B:2; the 14-token span is below minSpan=15
    assert(out == Set((1L, 2L, 1L, 20L, 16L), (1L, 2L, 20L, 2L, 16L)), s"got ${out.mkString(",")}")
    // lowering minSpan to the anchor width surfaces it with its exact length
    val low = Dedup.substringSpans(docs, 8, 8).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(low.contains((37L, 36L, 14L)), s"got ${low.mkString(",")}")
    // minSpan below the anchor width would silently miss spans — rejected
    intercept[IllegalArgumentException] { Dedup.substringSpans(docs, 8, 7) }
  }

  test("substring spans (d12): pathological uniform docs stay pair-bounded and exact") {
    // worst case for the anchor join: two docs that are ONE long run of
    // the same token — every anchor matches every anchor. The machinery
    // must stay within the (pair, diagonal) partitioning (no blowup
    // beyond the pair's own quadratic surface) and report the exact
    // diagonal structure: for lengths (m, n) and width w, each shift s
    // has overlap min(m, n - s + ...) — pinned here by total span count
    // and the maximal diagonal
    val docs = Seq((1L, Seq.fill(30)("a").mkString(" ")),
      (2L, Seq.fill(40)("a").mkString(" "))).toDF("doc_id", "text")
    val out = Dedup.substringSpans(docs, 8, 15).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    // diagonal d = start_a - start_b: overlap of a 30-run against a
    // 40-run at every alignment; maximal spans of >= 15 tokens exist for
    // alignments where the overlap window has >= 15 tokens. All spans
    // start at pos 1 on one side (runs are uniform, islands start at the
    // first anchor of each diagonal).
    assert(out.nonEmpty)
    // the full-overlap diagonal: the entire 30-token run matches inside
    // the 40-token run at every offset 0..10 -> span 30 each
    val full = out.filter(_._3 == 30L)
    assert(full.length == 11, s"expected 11 full-overlap alignments, got ${full.length}")
    // no span exceeds the shorter doc's run length
    assert(out.forall(_._3 <= 30L))
  }

  test("self-repeat spans (d13): planted internal repetition located exactly; clean docs stay silent") {
    val block = (1 to 10).map(i => s"r$i").mkString(" ")
    val doc1 = "u1 u2 " + block + " u3 " + block + " u4"     // block at 3..12 and 14..23
    val doc2 = (1 to 30).map(i => s"c$i").mkString(" ")       // no repetition
    val docs = Seq((1L, doc1), (2L, doc2)).toDF("doc_id", "text")
    val out = Dedup.selfRepeatSpans(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 3L, 14L, 10L)), s"got ${out.mkString(",")}")
    // a pure period-p loop yields ONE maximal island per multiple-of-p
    // shift that clears minSpan — the exact self-similarity structure:
    // the 20-token period-4 region matches itself at shifts 4, 8, 12
    // (span 16, 12, 8), and shift 16 (span 4) falls under minSpan
    val loop = Seq((3L, "pre1 pre2 " + Seq.fill(5)("x y z w").mkString(" ") + " post"))
      .toDF("doc_id", "text")
    val spans = Dedup.selfRepeatSpans(loop).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.toSet == Set((3L, 7L, 16L), (3L, 11L, 12L), (3L, 15L, 8L)),
      s"got ${spans.mkString(",")}")
  }

  test("incremental dedup (d11) equals the batch pairwise answer restricted to cross-slice pairs") {
    val docs = graft.Tables.documents(spark, sfDir)
    val inc = Dedup.incrementalNearDups(
        docs.filter(col("doc_id") % 10 === 0),
        docs.filter(col("doc_id") % 10 =!= 0))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cross = Dedup.nearDupPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .collect {
        case (a, b) if a % 10 == 0 && b % 10 != 0 => (a, b)
        case (a, b) if b % 10 == 0 && a % 10 != 0 => (b, a)
      }.toSet
    assert(inc == cross, s"missing=${cross -- inc} extra=${inc -- cross}")
  }
  test("asOfJoin null-extends every left row (none dropped) and ignores null-ts right rows") {
    // q21 itself runs through asOfJoin, so the DuckDB oracle pins the
    // main semantics; these are the degenerate inputs the oracle data
    // can't produce
    val left = Seq((1L, 5L, "L")).toDF("k", "t", "tag")
    val right = Seq((1L, Option.empty[Long], 1L, "null-ts"),
        (2L, Some(3L), 2L, "other-key"))
      .toDF("k", "t", "seq", "v")
    val rows = Relational.asOfJoin(left, right, "k", "t", "t",
        Seq("v"), rightTieBreak = Some("seq")).collect()
    // a null rightTs satisfies no rightTs <= leftTs predicate: the left
    // row must survive null-extended, not pick up the null-ts payload
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("tag") == "L")
    assert(rows.head.isNullAt(rows.head.fieldIndex("asof_v")),
      s"null-ts right row leaked into the match: ${rows.head}")
  }
  test("asOfJoin edge cases: at-or-before visibility, latest-tie wins, null-extension") {
    val left = Seq((1L, 10L, "L10"), (1L, 5L, "L5"), (2L, 7L, "L7"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 1L, "at-ts-low"), (1L, 10L, 2L, "at-ts-high"),
        (1L, 3L, 3L, "early"), (3L, 1L, 4L, "other-key"))
      .toDF("k", "t", "seq", "v")
    val got = Relational.asOfJoin(left, right, "k", "t", "t",
        Seq("v"), rightTieBreak = Some("seq"))
      .select("tag", "asof_v").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    // a right row AT the left timestamp is visible; among equal-ts right
    // rows the larger tie-break wins (it sorts last in the running frame)
    assert(got("L10") == "at-ts-high")
    assert(got("L5") == "early")
    assert(got("L7") == null) // no right row for key 2: null-extended, not dropped
  }
  test("data expectations (q44) CATCH planted violations, not just pass clean data") {
    // the corpus passes every gate; this pins that each check actually
    // fires on its own dirt class with the exact violation count
    val orders = Seq(
      (1L, Option(10L)), (2L, Option(10L)), (2L, Option(11L)), // dup orderkey 2 (x2)
      (3L, Option.empty[Long]),                                 // null custkey
      (4L, Option(99L)))                                        // orphan custkey
      .toDF("o_orderkey", "o_custkey")
    val lineitem = Seq(
      (Option(1L), java.math.BigDecimal.valueOf(5), java.math.BigDecimal.valueOf(0.1)),
      (Option(7L), java.math.BigDecimal.valueOf(1), java.math.BigDecimal.valueOf(0.0)), // orphan orderkey
      (Option(2L), java.math.BigDecimal.valueOf(0), java.math.BigDecimal.valueOf(0.5)), // qty <= 0
      (Option(3L), java.math.BigDecimal.valueOf(2), java.math.BigDecimal.valueOf(1.5)), // discount > 1
      (Option.empty[Long], java.math.BigDecimal.valueOf(3), java.math.BigDecimal.valueOf(0.2))) // null orderkey
      .toDF("l_orderkey", "l_quantity", "l_discount")
    val customer = Seq(Tuple1(10L), Tuple1(11L)).toDF("c_custkey")
    val got = Relational.dataExpectations(lineitem, orders, customer).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got("orders_custkey_not_null") == ((1L, false)))
    assert(got("lineitem_orderkey_not_null") == ((1L, false)))
    assert(got("lineitem_orderkey_in_orders") == ((1L, false)),
      "null orderkey is the not-null check's finding, not an orphan")
    assert(got("orders_custkey_in_customer") == ((1L, false)), "null custkey is not an orphan; 99 is")
    assert(got("orders_orderkey_unique") == ((2L, false)), "dup key counts BOTH rows")
    assert(got("lineitem_quantity_positive") == ((1L, false)))
    assert(got("lineitem_discount_in_unit_range") == ((1L, false)))
  }

  test("snapshot diff (p10) handles null text: presence by flag, null-safe content compare") {
    val a = Seq((1L, Option("same")), (2L, Option.empty[String]), (3L, Option("old")),
        (4L, Option.empty[String]), (5L, Option("gone")))
      .toDF("doc_id", "text")
    val b = Seq((1L, Option("same")), (2L, Option.empty[String]), (3L, Option("new")),
        (4L, Option("text appeared")), (6L, Option.empty[String]))
      .toDF("doc_id", "text")
    val got = Pipeline.snapshotDiff(a, b).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1 unchanged, doc 2 present in both with NULL text on both
    // sides: NOT added/removed/changed (the md5(NULL)-reads-as-absent
    // bug this spec pins)
    assert(!got.contains(1L) && !got.contains(2L), s"got $got")
    assert(got(3L) == "changed")
    assert(got(4L) == "changed", "null -> text is a content change, not an add")
    assert(got(5L) == "removed")
    assert(got(6L) == "added")
  }

  test("asOfJoin tolerance: out-of-window matches are NULLED, left rows survive") {
    val left = Seq((1L, 100L, "p1"), (1L, 500L, "p2"), (2L, 50L, "p3"), (3L, 7L, "p4"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 90L, 1L, "c1"), (1L, 100L, 2L, "c2"), (2L, 10L, 3L, "c3"))
      .toDF("k", "t", "seq", "v")
    val got = Relational.asOfJoin(left, right, "k", "t", "t", Seq("v"),
        rightTieBreak = Some("seq"),
        within = Some((l, r) => l - r <= lit(50L)))
      .select("tag", "asof_v", "asof_ts").collect()
      .map(r => r.getString(0) ->
        ((if (r.isNullAt(1)) null else r.getString(1)),
          (if (r.isNullAt(2)) null else java.lang.Long.valueOf(r.getLong(2))))).toMap
    assert(got.size == 4, "tolerance must never drop a left row")
    assert(got("p1") == (("c2", 100L)), "in-window match (delta 0) must survive")
    assert(got("p2") == ((null, null)),
      "out-of-window match (delta 400 > 50) must null BOTH asof columns")
    assert(got("p3") == (("c3", 10L)), "boundary delta 40 <= 50 stays matched")
    assert(got("p4") == ((null, null)), "no-match baseline still null-extends")
  }
  test("asOfJoin rejects inputs colliding with its reserved or output column names") {
    val left = Seq((1L, 5L, "x")).toDF("k", "t", "v")
    val right = Seq((1L, 3L, "y")).toDF("k", "t", "v")
    // an input frame already carrying an internal scaffolding name
    intercept[IllegalArgumentException] {
      Relational.asOfJoin(left.withColumnRenamed("v", "__ts"), right, "k", "t", "t", Seq("v"))
    }
    intercept[IllegalArgumentException] {
      Relational.asOfJoin(left, right.withColumnRenamed("v", "__tie"), "k", "t", "t", Seq("v"))
    }
    // a left column that the asof_* output would shadow
    intercept[IllegalArgumentException] {
      Relational.asOfJoin(left.withColumnRenamed("v", "asof_v"), right, "k", "t", "t", Seq("v"))
    }
    intercept[IllegalArgumentException] {
      Relational.asOfJoin(left.withColumnRenamed("v", "asof_ts"), right, "k", "t", "t", Seq("v"))
    }
    // outputs colliding among THEMSELVES: duplicate payload names, or a
    // payload column named "ts" (its asof_ts would shadow the fixed
    // rightTs output)
    intercept[IllegalArgumentException] {
      Relational.asOfJoin(left, right, "k", "t", "t", Seq("v", "v"))
    }
    intercept[IllegalArgumentException] {
      Relational.asOfJoin(left, right.withColumnRenamed("v", "ts"), "k", "t", "t", Seq("ts"))
    }
    // clean inputs still pass
    assert(Relational.asOfJoin(left, right, "k", "t", "t", Seq("v")).count() == 1)
  }
  test("incremental dedup from a written minhash artifact equals the recomputed-corpus answer") {
    val docs = graft.Tables.documents(spark, sfDir)
    val newSlice = docs.filter(col("doc_id") % 10 === 0)
    val staged = docs.filter(col("doc_id") % 10 =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-artifact").toString
    Dedup.writeMinhashArtifact(staged, dir)
    val bandDir = java.nio.file.Files.createTempDirectory("graft-bands").toString
    // band index derives from the WRITTEN stats artifact — one sketch pass
    Dedup.writeBandIndex(spark.read.parquet(dir), bandDir)
    val fromArtifact = Dedup.incrementalNearDupsFromArtifact(
        newSlice, spark.read.parquet(dir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // the fully-staged probe (stats AND pre-exploded band index from
    // parquet) answers identically too
    val fromBoth = Dedup.incrementalNearDupsFromArtifacts(
        newSlice, spark.read.parquet(dir), spark.read.parquet(bandDir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val recomputed = Dedup.incrementalNearDups(newSlice, staged)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(recomputed.nonEmpty)
    assert(fromArtifact == recomputed,
      s"missing=${recomputed -- fromArtifact} extra=${fromArtifact -- recomputed}")
    assert(fromBoth == recomputed)
    // the sync guard must catch a band index whose doc POPULATION drifted
    // even when the cardinality did not (one doc replaced by another) —
    // a count-only guard is blind to exactly this
    val drifted = spark.read.parquet(bandDir).withColumn("doc_id",
      when(col("doc_id") === 1L, lit(-1L)).otherwise(col("doc_id")))
    intercept[IllegalArgumentException] {
      Dedup.incrementalNearDupsFromArtifacts(newSlice, spark.read.parquet(dir), drifted)
    }
  }

  test("bucketed band index: staged side of the refresh probe joins without an exchange") {
    val docs = graft.Tables.documents(spark, sfDir)
    val newSlice = docs.filter(col("doc_id") % 10 === 0)
    val staged = docs.filter(col("doc_id") % 10 =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-artifact-b").toString
    Dedup.writeMinhashArtifact(staged, dir)
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_bkt LOCATION '/tmp/graft-warehouse'")
    spark.sql("DROP TABLE IF EXISTS graft_bkt.band_idx")
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete()
    }
    rmrf(new java.io.File("/tmp/graft-warehouse/band_idx"))
    Dedup.writeBandIndexBucketed(spark.read.parquet(dir), "graft_bkt.band_idx", 4)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the exchange structure is visible in the plan
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bandTable = spark.table("graft_bkt.band_idx")
      val probe = Dedup.incrementalNearDupsFromArtifacts(
        newSlice, spark.read.parquet(dir), bandTable)
      // the staged (bucketed) side must read pre-partitioned: only the
      // arriving slice's bands shuffle on band_key — exactly one
      // band_key exchange in the whole plan, and a bucketed scan
      val plan = probe.queryExecution.executedPlan.toString
      val nBandExchanges = "Exchange hashpartitioning\\(band_key".r
        .findAllIn(plan).size
      assert(plan.contains("Bucketed: true"),
        s"band index scan is not bucketed:\n${plan.take(1200)}")
      assert(nBandExchanges <= 1,
        s"staged band side shuffled despite bucketing ($nBandExchanges band_key exchanges)")
      // and the bucketed probe answers identically to the recomputed path
      val got = probe.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val recomputed = Dedup.incrementalNearDups(newSlice, staged)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == recomputed)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
  test("weighted mix (p6) is stable under repartitioning and bounded by its weight") {
    val out = graft.SparkEntry.queries("p6_weighted_mix")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    out.values.foreach { case (wpct, n) =>
      assert(n == wpct / 100 || n == wpct / 100 + 1,
        s"copy count $n outside [${wpct / 100}, ${wpct / 100 + 1}] for weight $wpct")
    }
    // independent reference: recompute a sample of assignments OUTSIDE
    // Spark from the md5 arithmetic alone — a partition- or RNG-dependent
    // implementation cannot reproduce these
    def md5h56(v: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(14), 16)
    }
    val srcOf = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.take(25).foreach { case (docId, (wpct, n)) =>
      val w = md5h56(srcOf(docId)) % 200 + 50
      assert(w == wpct, s"doc $docId: weight $wpct != reference $w")
      val expected = w / 100 + (if (md5h56(docId.toString) % 100 < w % 100) 1 else 0)
      assert(n == expected, s"doc $docId: copies $n != reference $expected")
    }
  }

  test("chunking (p7) covers every token and lands chunk starts on the stride grid") {
    val chunks = graft.SparkEntry.queries("p7_chunk_documents")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(chunks.nonEmpty)
    val lens0 = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("len"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    chunks.foreach { case (doc, chunkId, start, n) =>
      assert(start == chunkId * 48, "chunk start off the stride grid")
      // EVERY chunk's extent is pinned, interior ones included — a token
      // dropped from a middle chunk cannot hide behind the (0, 64] bound
      assert(n == math.min(64L, lens0(doc) - start),
        s"doc $doc chunk $chunkId carries $n tokens, expected ${math.min(64L, lens0(doc) - start)}")
    }
    // per doc: chunk ids are contiguous 0..(len-1)/48, and summing the
    // UNIQUE stride-coverage (min(64, ...) overlaps aside) reaches the
    // final token: the last chunk must contain the doc's last token
    val byDoc = chunks.groupBy(_._1)
    val lens = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("len"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byDoc.foreach { case (doc, cs) =>
      val ids = cs.map(_._2).sorted
      assert(ids.sameElements(0L until ids.length), s"doc $doc chunk ids not contiguous")
      val last = cs.maxBy(_._2)
      // last chunk spans [start, start+n) and must reach the final token
      assert(last._3 + last._4 == lens(doc),
        s"doc $doc last chunk ends at ${last._3 + last._4}, len ${lens(doc)}")
    }
  }

  test("perplexity filter (t16): exact integer surprisal on a hand-computed corpus") {
    // model: c(a,b)=4 c(b,a)=2 c(b,x)=1; c(a.)=4 c(b.)=3
    // bits: (a,b)=floor(log2(4/4))=0  (b,a)=floor(log2(3/2))=0  (b,x)=floor(log2(3/1))=1
    val docs = Seq((1L, "a b a b a b"), (2L, "a b x")).toDF("doc_id", "text")
    val got = TextAnalysis.perplexityFilter(docs, maxBitsNum = 0L, maxBitsDen = 1L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(4)))).toMap
    assert(got(1L) == ((5L, 0L, true)), s"got ${got(1L)}") // 3x(a,b) + 2x(b,a) = 0 bits
    assert(got(2L) == ((2L, 1L, false)), s"got ${got(2L)}") // the 0-bit gate drops 1 bit
  }

  test("perplexity filter: power-of-two surprisal does NOT round down (the k0 branch)") {
    // "z a z b z c z d": c(z,*)=1 each with c(z.)=4 -> floor(log2(4/1))
    // must be EXACTLY 2 (k0 = bitlen(4)-bitlen(1) = 2, 1<<2 <= 4 holds);
    // an off-by-one in the branch would emit 1 and total 4, not 8
    val docs = Seq((1L, "z a z b z c z d")).toDF("doc_id", "text")
    val r = TextAnalysis.perplexityFilter(docs).collect().head
    assert(r.getLong(1) == 7L, s"n_bigrams ${r.getLong(1)}")
    assert(r.getLong(2) == 8L, s"total_bits ${r.getLong(2)}: 4 z-bigrams x 2 bits + 3 returns x 0")
  }

  test("p11 manifest is a faithful roll-up of p9's packs, fingerprint recomputable") {
    // the trainer-facing contract SURVEY advertises: given p9's pack
    // hashes, anyone can recompute the shard fingerprint — pin it by
    // doing exactly that, independent of both engines' SQL
    val p9 = graft.SparkEntry.queries("p9_pack_materialize")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    val p11 = graft.SparkEntry.queries("p11_shard_manifest")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(p9.nonEmpty && p11.nonEmpty)
    p9.groupBy(_._1).foreach { case (shard, packs) =>
      val (nPacks, nDocs, totTokens, fp) = p11(shard)
      assert(nPacks == packs.length && nDocs == packs.map(_._3).sum &&
        totTokens == packs.map(_._4).sum, s"shard $shard volumes")
      val joined = packs.sortBy(_._2).map(_._5).mkString("|")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(joined.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(fp == md, s"shard $shard fingerprint not recomputable from pack hashes")
    }
    assert(p11.keySet == p9.map(_._1).toSet, "manifest must cover every shard")
  }

  test("t13/t16 cross-operator consistency: surprisal bits bracket the conditional probability") {
    // two independent spellings of the same model must agree: t13's
    // p_cond = n/cn (r4-quantized double) and t16's integer bits =
    // floor(log2(cn/n)) satisfy 2^-(bits+1) < n/cn <= 2^-bits — on the
    // REAL corpus, for every top-50 bigram, joining purely by (w1, w2)
    val docs = graft.Tables.documents(spark, sfDir)
    val lm = TextAnalysis.bigramLm(docs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    // exportBigramModel's top-50 uses the SAME total (n desc, w1, w2)
    // order over the same counts as bigramLm's limit(50), so the key
    // sets coincide exactly — no need to rebuild bigrams here
    val bits = TextAnalysis.exportBigramModel(docs, topK = 50)
    assert(lm.nonEmpty)
    lm.foreach { case (bg, p) =>
      val b = bits(bg)
      // p is r4-quantized: compare with a half-ulp (5e-5) slack
      assert(p <= math.pow(2.0, -b.toDouble) + 5e-5 &&
        p > math.pow(2.0, -(b + 1).toDouble) - 5e-5,
        s"bigram $bg: p_cond=$p outside (2^-${b + 1}, 2^-$b]")
    }
  }

  test("perplexity filter gate is non-degenerate on the real corpus") {
    // the 4.33 bits/bigram default sits at the corpus median — a filter
    // that keeps (or drops) everything proves nothing
    val flags = TextAnalysis.perplexityFilter(graft.Tables.documents(spark, sfDir))
      .select(col("keep")).collect().map(_.getBoolean(0))
    val kept = flags.count(identity)
    assert(kept > 0 && kept < flags.length,
      s"degenerate gate: kept $kept of ${flags.length}")
  }

  test("SCD2 dimension build (q46): islands, versions, and the open current span") {
    val orders = Seq(
      // cust 1: P1,P1,P2,P1 -> three spans (P1 x2, P2, P1) — the same
      // value RETURNING opens a NEW span (history, not a group-by)
      (101L, 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "P1"),
      (102L, 1L, java.sql.Timestamp.valueOf("2024-01-05 00:00:00"), "P1"),
      (103L, 1L, java.sql.Timestamp.valueOf("2024-02-01 00:00:00"), "P2"),
      (104L, 1L, java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), "P1"),
      // cust 2: single order -> one open-ended span
      (201L, 2L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), "P5"))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val rows = Relational.scd2Dimension(orders)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDate(3).toString, Option(r.getDate(4)).map(_.toString), r.getLong(5)))
      .sortBy(t => (t._1, t._2))
    assert(rows.length == 4, s"expected 4 spans, got ${rows.mkString(";")}")
    assert(rows(0) == ((1L, 1L, "P1", "2024-01-01", Some("2024-02-01"), 2L)))
    assert(rows(1) == ((1L, 2L, "P2", "2024-02-01", Some("2024-03-01"), 1L)))
    assert(rows(2) == ((1L, 3L, "P1", "2024-03-01", None, 1L)), "current span must be open-ended")
    assert(rows(3) == ((2L, 1L, "P5", "2024-01-02", None, 1L)))
  }

  test("surrogate keys (q48): dense coverage and stability on random key sets") {
    val rnd = new scala.util.Random(48)
    for (trial <- 1 to 5) {
      val all = rnd.shuffle((1L to 400L).toList).take(120 + rnd.nextInt(150))
      val (have, fresh) = all.partition(_ => rnd.nextBoolean())
      val existing = have.map(k => (k, k * 7 + 3)).toDF("c_custkey", "sk")
      // mixed old+new, WITH duplicates on both: a repeated new key must
      // mint exactly one surrogate, a repeated known key none
      val incoming = (fresh ++ have.take(have.length / 2) ++
        fresh.take(fresh.length / 3) ++ have.take(5))
        .toDF("c_custkey")
      val rows = Relational.surrogateKeys(existing, incoming)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      // existing keys keep their sk and flag
      val out = rows.map(t => t._1 -> ((t._2, t._3))).toMap
      have.foreach(k => assert(out(k) == ((k * 7 + 3, false)), s"trial $trial key $k"))
      // new keys: DENSE — exactly max+1..max+N, each once, all flagged new
      val maxSk = if (have.isEmpty) 0L else have.map(_ * 7 + 3).max
      val newSks = rows.filter(_._3).map(_._2).sorted
      assert(newSks.sameElements((maxSk + 1) to (maxSk + fresh.length)),
        s"trial $trial: new sks not dense after $maxSk: ${newSks.take(10).mkString(",")}...")
      assert(rows.length == have.length + fresh.length,
        s"trial $trial: already-known incoming keys must not duplicate rows")
    }
  }

  test("SCD2 (q46): spans reconstruct random priority sequences exactly (run-length oracle)") {
    val rnd = new scala.util.Random(46)
    val orders = for {
      cust <- (1L to 12L).toList
      i <- 0 until (3 + rnd.nextInt(15))
    } yield (cust * 1000 + i, cust,
      java.sql.Timestamp.valueOf(f"2024-01-${1 + i}%02d 00:00:00"),
      s"P${1 + rnd.nextInt(3)}")
    val got = Relational.scd2Dimension(
      orders.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(5)))
    // in-test oracle: run-length encoding of each customer's sequence
    val expected = orders.groupBy(_._2).toSeq.flatMap { case (cust, os) =>
      val seq = os.sortBy(o => (o._3.getTime, o._1)).map(_._4)
      val runs = seq.foldLeft(List.empty[(String, Long)]) {
        case ((p, n) :: tail, x) if p == x => (p, n + 1) :: tail
        case (acc, x) => (x, 1L) :: acc
      }.reverse
      runs.zipWithIndex.map { case ((p, n), i) => (cust, i + 1L, p, n) }
    }.toSet
    assert(got.toSet == expected,
      s"extra=${got.toSet -- expected} missing=${expected -- got.toSet}")
    // versions are contiguous 1..K per customer
    got.groupBy(_._1).foreach { case (cust, spans) =>
      val vs = spans.map(_._2).sorted
      assert(vs.sameElements(1L to vs.length), s"cust $cust versions $vs")
    }
  }

  test("audio codec: PCM16 WAV round-trip is sample-exact, mono and stereo") {
    val mono = Array.tabulate(240)(k => (((k * 999) % 65536) - 32768).toShort)
    val d1 = AudioCodec.decodePcm16Wav(AudioCodec.encodePcm16Wav(8000, 1, mono)).get
    assert(d1.sampleRate == 8000 && d1.channels == 1)
    assert(d1.samples.sameElements(mono), "mono samples must round-trip bit-exactly")
    // stereo: interleaved L/R frames survive as-is
    val stereo = Array.tabulate(100)(k => (k * 321 - 16000).toShort)
    val d2 = AudioCodec.decodePcm16Wav(AudioCodec.encodePcm16Wav(44100, 2, stereo)).get
    assert(d2.sampleRate == 44100 && d2.channels == 2)
    assert(d2.samples.sameElements(stereo))
  }

  test("audio codec: malformed payloads return None, never throw (dirty-corpus contract)") {
    val good = AudioCodec.encodePcm16Wav(8000, 1, Array.tabulate(50)(_.toShort))
    assert(AudioCodec.decodePcm16Wav(null).isEmpty)
    assert(AudioCodec.decodePcm16Wav(Array.emptyByteArray).isEmpty)
    assert(AudioCodec.decodePcm16Wav("not a wav at all, just text bytes padded to length 44+"
      .getBytes("US-ASCII")).isEmpty)
    assert(AudioCodec.decodePcm16Wav(good.take(30)).isEmpty, "truncated header")
    assert(AudioCodec.decodePcm16Wav(good.dropRight(7)).isEmpty,
      "data chunk shorter than declared length")
    // non-PCM format code (3 = IEEE float) rejected
    val floatFmt = good.clone(); floatFmt(20) = 3
    assert(AudioCodec.decodePcm16Wav(floatFmt).isEmpty)
    // 8-bit depth rejected (PCM16-only contract)
    val eightBit = good.clone(); eightBit(34) = 8
    assert(AudioCodec.decodePcm16Wav(eightBit).isEmpty)
    // and the good payload still decodes after all that cloning
    assert(AudioCodec.decodePcm16Wav(good).nonEmpty)
  }

  test("video codec: AVI round-trip preserves frames in order; real ImageIO decode per frame") {
    val png = graft.operators.ImageCodec.encodeGrayPng _
    // constant-gray frames: bilinear of a constant is constant, so mean
    // pooled luma recovers each frame's identity — pinning stream ORDER
    val levels = Seq(10, 80, 150, 220)
    val frames = levels.map(g => png(16, 16)((_, _) => g))
    val avi = VideoCodec.encodeAvi(frames)
    val raw = VideoCodec.frames(avi).get
    assert(raw.length == 4)
    assert(raw.zip(frames).forall { case (a, b) => a.sameElements(b) },
      "container payloads must round-trip byte-exactly")
    val dec = VideoCodec.decodeFrames(avi).get
    assert(dec.forall(_.nonEmpty), "every PNG frame must ImageIO-decode")
    val means = dec.map(f => f.get.sum / f.get.length * 255f)
    assert(means.zip(levels).forall { case (m, g) => math.abs(m - g) <= 2f },
      s"decoded mean luma must track the encoded gray levels: $means vs $levels")
    assert(means.sliding(2).forall(p => p(0) < p(1)), "frame order must survive the mux")
    // mixed/dirty column: a non-image frame yields None IN PLACE, others decode
    val mixed = VideoCodec.encodeAvi(Seq(frames.head, "not an image".getBytes("UTF-8"), frames.last))
    val dm = VideoCodec.decodeFrames(mixed).get
    assert(dm.map(_.nonEmpty) == Seq(true, false, true))
    // odd-length payloads: the pad byte must not shift subsequent frames
    val odd = VideoCodec.encodeAvi(Seq(Array[Byte](1, 2, 3), Array[Byte](9, 8, 7, 6)))
    assert(VideoCodec.frames(odd).get.map(_.toSeq) == Seq(Seq[Byte](1, 2, 3), Seq[Byte](9, 8, 7, 6)))
  }

  test("video codec: malformed containers return None; junk chunks and nested LISTs are skipped") {
    val fb = Array[Byte](5, 4, 3, 2, 1, 0)
    val good = VideoCodec.encodeAvi(Seq(fb))
    assert(VideoCodec.frames(null).isEmpty)
    assert(VideoCodec.frames(Array.emptyByteArray).isEmpty)
    assert(VideoCodec.frames("RIFFxxxxNOPE".getBytes("US-ASCII")).isEmpty)
    assert(VideoCodec.frames(good.dropRight(3)).isEmpty, "truncated data chunk")
    // hand-build: RIFF('AVI ') [JUNK] [LIST('hdrl') with an inner chunk] [LIST('movi') frame]
    import java.nio.{ByteBuffer, ByteOrder}
    val junk = "JUNK".getBytes("US-ASCII") ++ Array[Byte](2, 0, 0, 0, 7, 7) // odd->pad? len 2 even
    val inner = "avih".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0, 1, 2, 3, 4)
    val hdrl = "LIST".getBytes("US-ASCII") ++ Array[Byte]((4 + inner.length).toByte, 0, 0, 0) ++
      "hdrl".getBytes("US-ASCII") ++ inner
    val dc = "00dc".getBytes("US-ASCII") ++ Array[Byte](6, 0, 0, 0) ++ fb
    val movi = "LIST".getBytes("US-ASCII") ++ Array[Byte]((4 + dc.length).toByte, 0, 0, 0) ++
      "movi".getBytes("US-ASCII") ++ dc
    val body = junk ++ hdrl ++ movi
    val buf = ByteBuffer.allocate(12 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
      .put("AVI ".getBytes("US-ASCII")).put(body)
    val got = VideoCodec.frames(buf.array())
    assert(got.nonEmpty && got.get.length == 1 && got.get.head.sameElements(fb),
      s"walker must skip JUNK and hdrl, find the movi frame: $got")
    // a frame-id chunk OUTSIDE movi is metadata, not a frame
    val strayDc = "00dc".getBytes("US-ASCII") ++ Array[Byte](6, 0, 0, 0) ++ Array[Byte](9, 9, 9, 9, 9, 9)
    val body2 = strayDc ++ movi
    val buf2 = ByteBuffer.allocate(12 + body2.length).order(ByteOrder.LITTLE_ENDIAN)
    buf2.put("RIFF".getBytes("US-ASCII")).putInt(4 + body2.length)
      .put("AVI ".getBytes("US-ASCII")).put(body2)
    assert(VideoCodec.frames(buf2.array()).get.map(_.toSeq) == Seq(fb.toSeq),
      "00dc outside LIST('movi') must not count as a frame")
  }

  test("audio codec: chunk walker skips unknown and odd-length chunks (word alignment)") {
    // hand-build: RIFF [JUNK(odd len 3 + pad)] [fmt ] [LIST] [data]
    val samples = Array[Short](100, -200, 300, -400)
    val base = AudioCodec.encodePcm16Wav(16000, 1, samples)
    val fmtAndData = base.drop(12) // the fmt + data chunks as encoded
    val junk = "JUNK".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0, 0, 1, 2, 3, 0) // len 3 + pad
    val list = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val body = junk ++ list ++ fmtAndData
    val riff = "RIFF".getBytes("US-ASCII") ++
      Array[Byte]((body.length + 4).toByte, ((body.length + 4) >> 8).toByte, 0, 0) ++
      "WAVE".getBytes("US-ASCII") ++ body
    val dec = AudioCodec.decodePcm16Wav(riff)
    assert(dec.nonEmpty, "walker must skip JUNK (odd, padded) and LIST chunks")
    assert(dec.get.samples.sameElements(samples) && dec.get.sampleRate == 16000)
  }

  test("gopher rules (t18): each planted defect flips exactly its own gate") {
    // 60 in-range words that pass every gate, as a base to mutate
    val good = (0 until 60).map(i => s"word${i % 9}").mkString(" ") // len 5-6, has no required words yet
    val goodReq = "the and " + (0 until 58).map(i => s"word${i % 9}").mkString(" ")
    val docs = Seq(
      (0L, goodReq),                                          // all gates pass
      (1L, "the and " + (0 until 10).map(_ => "word").mkString(" ")), // too few words
      (2L, "the and " + (0 until 58).map(_ => "xy").mkString(" ")),   // mean word len < 3
      (3L, "the and " + (0 until 58).map(_ => "extraordinarily").mkString(" ")), // mean len > 10
      (4L, "the and " + (0 until 29).map(_ => "### word...").mkString(" ")),     // symbol-heavy
      (5L, "the and " + (0 until 58).map(_ => "12345").mkString(" ")), // digits, not alpha
      (6L, good)                                              // no required words
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs, minWords = 50L, maxWords = 100000L)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(6), r.getBoolean(7), r.getBoolean(8), r.getBoolean(9),
          r.getBoolean(10), r.getBoolean(11))).toMap
    //                    (words, meanlen, symbol, alpha, required, keep)
    assert(out(0L) == ((true, true, true, true, true, true)))
    assert(out(1L)._1 == false && out(1L)._6 == false)
    assert(out(2L)._2 == false && out(2L)._6 == false)
    assert(out(3L)._2 == false && out(3L)._6 == false)
    assert(out(4L)._3 == false && out(4L)._6 == false)
    assert(out(5L)._4 == false && out(5L)._6 == false)
    assert(out(6L)._5 == false && out(6L)._6 == false)
    // the gates that are NOT the planted defect stay green (defects are
    // isolated — one rule per doc), except doc 5 whose digit words also
    // hold mean length in range by construction
    assert(out(1L)._5 && out(2L)._1 && out(3L)._1 && out(4L)._5 && out(5L)._1)
  }

  test("gopher rules (t18) are non-degenerate on the real corpus") {
    // corpus-adapted required lexicon (same as the query entry): the
    // synthetic vocabulary has only two function words
    val out = TextAnalysis.gopherRules(graft.Tables.documents(spark, sfDir),
      requiredWords = Seq("the", "a"), minRequired = 2)
    val n = out.count()
    val kept = out.filter(col("keep")).count()
    assert(kept > 0 && kept < n,
      s"gates should discriminate on the corpus: kept $kept of $n")
  }

  test("c4 filters (t19): each planted defect flips exactly its own gate") {
    val goodLine = (0 until 6).map(i => s"word$i").mkString(" ") + " end."
    val doc = (0 until 4).map(_ => goodLine).mkString("\n")
    val docs = Seq(
      (0L, doc),                                       // clean multi-line page
      (1L, doc + "\nshort line."),                     // 2-word line scrubbed, page kept
      (2L, doc + "\nenable javascript to view this."), // javascript line scrubbed
      (3L, goodLine + "\nno terminal punct here at all\n" + goodLine), // mid line dropped
      (4L, doc + "\nLorem Ipsum dolor sit amet etc."), // whole page dropped
      (5L, doc.replace("word3", "{word3")),            // brace -> page dropped
      (6L, doc + "\nthis site uses cookies to track you."), // policy page dropped
      (7L, doc.replace("word2", "badword")),           // blocklisted word
      (8L, "tiny.\nalso tiny.")                        // all lines scrubbed -> n_kept 0
    ).toDF("doc_id", "text")
    val out = TextAnalysis.c4Filters(docs, minLineWords = 3,
        requireTerminalPunct = true, blocklist = Seq("BadWord"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getBoolean(4),
          r.getBoolean(5), r.getBoolean(6), r.getBoolean(7), r.getBoolean(8)))).toMap
    assert(out(0L) == ((4L, 4L, doc, false, false, false, false, true)))
    assert(out(1L)._2 == 4L && out(1L)._3 == doc && out(1L)._8,
      "short line is scrubbed but the page survives")
    assert(out(2L)._2 == 4L && out(2L)._3 == doc && out(2L)._8,
      "javascript line is scrubbed but the page survives")
    assert(out(3L)._1 == 3L && out(3L)._2 == 2L
      && out(3L)._3 == goodLine + "\n" + goodLine,
      "unterminated middle line dropped, order of survivors preserved")
    assert(out(4L)._4 && !out(4L)._8, "lorem ipsum drops the page")
    assert(out(5L)._5 && !out(5L)._8, "curly brace drops the page")
    assert(out(7L)._6 && !out(7L)._8, "blocklist match is case-insensitive")
    assert(out(6L)._7 && !out(6L)._8, "policy phrase drops the page")
    assert(out(8L)._2 == 0L && out(8L)._3 == "" && !out(8L)._8,
      "a page with zero surviving lines is dropped")
    // defects are isolated: the pages that died to a DOC gate still kept
    // their lines; the pages that lost a line tripped no doc gate
    assert(!out(1L)._4 && !out(1L)._5 && !out(1L)._6 && !out(1L)._7)
    assert(out(4L)._2 > 0 && out(5L)._2 > 0 && out(6L)._2 > 0)
  }

  test("c4 filters (t19) are non-degenerate on the real corpus") {
    // corpus-adapted knobs (same as the query entry; rationale in the
    // operator doc): punctuation off, 25-word line floor, "dup" blocklist
    val out = TextAnalysis.c4Filters(graft.Tables.documents(spark, sfDir),
      minLineWords = 25, requireTerminalPunct = false, blocklist = Seq("dup"))
    val n = out.count()
    val kept = out.filter(col("keep")).count()
    val blocked = out.filter(col("d_blocklist")).count()
    assert(kept > 0 && kept < n,
      s"C4 gates should discriminate on the corpus: kept $kept of $n")
    assert(blocked > 0, "the blocklist gate should be live on the corpus")
  }

  test("boilerplate scrub (d15): planted shared segment removed, tail and unique text kept") {
    // segment width 3, minDf 3: "copy right footer" plants in three docs
    // at different positions; doc 3 is untouched; doc 4 is ALL boilerplate
    val docs = Seq(
      (0L, "copy right footer alpha beta gamma x"),   // bp at seg 0, tail "x"
      (1L, "alpha beta gamma copy right footer"),     // bp at seg 1 — aligned
      (2L, "copy right footer delta epsilon zeta"),
      (3L, "delta epsilon zeta eta theta"),           // unique, partial tail kept
      (4L, "copy right footer")                       // scrubbed to empty
    ).toDF("doc_id", "text")
    val byId = Dedup.boilerplateScrub(docs, 3, 3).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(byId(0L) == (("alpha beta gamma x", 1L)))
    assert(byId(1L) == (("alpha beta gamma", 1L)))
    assert(byId(2L) == (("delta epsilon zeta", 1L)))
    // "alpha beta gamma" appears as a FULL segment in docs 0 and 1 only
    // (df 2 < 3) so it survives; doc 3's 2-word tail never enters df
    assert(byId(3L) == (("delta epsilon zeta eta theta", 0L)))
    assert(byId(4L) == (("", 1L)))
  }

  test("boilerplate scrub (d15) pins no cache and pays the segment recompute at most twice") {
    // the r7 verdict's leaked segs.persist() is gone: the plan carries no
    // InMemoryRelation and the session cache stays empty after a library
    // call; the segment aggregate appears at most twice (df side +
    // rewrite side — the old three-way union branch is folded into the
    // left join), so dropping the cache didn't silently triple the
    // heaviest stage either
    spark.catalog.clearCache()
    val df = Dedup.boilerplateScrub(graft.Tables.documents(spark, sfDir), 3, 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("InMemoryRelation"),
      s"d15 must not cache implicitly, plan:\n$plan")
    assert(spark.sharedState.cacheManager.isEmpty,
      "building the d15 plan must not leave cached frames behind")
    val segAggs = plan.linesIterator.count(l =>
      l.contains("partial_max(CASE WHEN") && l.contains("% 3"))
    assert(segAggs <= 2, s"segment aggregate recomputed $segAggs times, expected <= 2")
  }

  test("boilerplate scrub (d15) agrees with d9's detector on what is boilerplate") {
    val docs = graft.Tables.documents(spark, sfDir)
    val scrub = Dedup.boilerplateScrub(docs, 3, 3)
      .select(col("doc_id"), col("n_removed"))
    val detect = Dedup.boilerplateSegments(docs, 3, 3)
      .select(col("doc_id"), col("n_boilerplate"))
    val diff = scrub.join(detect, Seq("doc_id"))
      .filter(col("n_removed") =!= col("n_boilerplate")).count()
    assert(diff == 0, "d15 must remove exactly the segments d9 counts")
  }

  test("fuzzy decontamination (d16): reworded benchmark leak flagged, clean doc not") {
    import org.apache.spark.sql.{functions => F}
    val benchText = (0 until 50).map(i => s"tok$i").mkString(" ")
    // one token reworded mid-doc: exact 8-gram matching loses every gram
    // window that crosses the edit, but whole-doc shingle Jaccard stays
    // 45/51 ~ 0.88 >= 0.8 — exactly the leakage class d8 under-catches
    val reworded = ((0 until 50).map(i => if (i == 25) "CHANGED" else s"tok$i")).mkString(" ")
    val clean = (0 until 50).map(i => s"other$i").mkString(" ")
    val docs = Seq(
      (0L, benchText),  // bench (doc_id % 20 == 0)
      (21L, reworded),  // corpus: fuzzy leak
      (22L, clean),     // corpus: clean
      (23L, benchText)  // corpus: verbatim leak (j = 1)
    ).toDF("doc_id", "text")
    val out = Dedup.fuzzyDecontaminate(docs, F.col("doc_id") % 20 === 0)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out == Map(21L -> true, 22L -> false, 23L -> true), s"got $out")
  }

  test("temperature sample (p12): head flattened, targets exact, deterministic") {
    import org.apache.spark.sql.{functions => F}
    // planted skew: 900 docs of lang "big", 100 of "small"
    val docs = ((0 until 900).map(i => (i.toLong, "big", "s")) ++
      (0 until 100).map(i => (1000L + i, "small", "s"))).toDF("doc_id", "lang", "source")
    val out = Pipeline.temperatureSample(docs, budget = 100L)
    val byLang = out.groupBy("lang").agg(F.count(F.lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // w = floor(sqrt(900)) = 30, floor(sqrt(100)) = 10, W = 40:
    // targets are 100*30/40 = 75 and 100*10/40 = 25 exactly
    assert(byLang == Map("big" -> 75L, "small" -> 25L), s"got $byLang")
    // raw share 90% -> sampled share 75%: the head actually flattened
    // toward sqrt proportions; and the sample is deterministic
    val again = Pipeline.temperatureSample(docs, budget = 100L)
      .collect().map(_.getLong(0)).toSet
    assert(out.collect().map(_.getLong(0)).toSet == again)
  }

  test("temperature sample (p12) never exceeds its budget and keeps per-lang rank order") {
    val docs = graft.Tables.documents(spark, sfDir)
    val out = Pipeline.temperatureSample(docs, budget = 200L).collect()
    assert(out.length <= 200, s"budget overrun: ${out.length}")
    // every language present in the corpus with >= 1 target appears
    val langs = out.map(_.getString(1)).distinct
    assert(langs.length >= 2, "sampling must span languages")
  }

  test("unimax sample (p13): uniform shares, epoch cap bites, leftover folds to the head") {
    import org.apache.spark.sql.{functions => F}
    // planted: tiny 10-doc lang, mid 50-doc lang, big 940-doc lang
    val docs = ((0 until 10).map(i => (i.toLong, "tiny", "s")) ++
      (0 until 50).map(i => (100L + i, "mid", "s")) ++
      (0 until 940).map(i => (1000L + i, "big", "s"))).toDF("doc_id", "lang", "source")
    // budget 300, cap 2 epochs; greedy smallest-first:
    //   tiny: min(10*2, 300 div 3 = 100) = 20  (CAP bites; docs repeat)
    //   mid:  min(50*2, 280 div 2 = 140) = 100 (cap bites: 2 full epochs)
    //   big:  min(940*2, 180 div 1) = 180      (share-bound partial epoch)
    val out = Pipeline.unimaxSample(docs, budget = 300L, maxEpochs = 2)
    val occ = out.groupBy("lang").agg(F.count(F.lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(occ == Map("tiny" -> 20L, "mid" -> 100L, "big" -> 180L), s"got $occ")
    // tiny and mid hit the epoch cap: every doc appears exactly twice
    val tinyEpochs = out.filter(F.col("lang") === "tiny")
      .groupBy("doc_id").agg(F.count(F.lit(1)).as("k"))
      .collect().map(_.getLong(1)).toSet
    assert(tinyEpochs == Set(2L), "capped language must repeat whole epochs")
    // big's partial epoch is the hash-order rank prefix: epoch 1 rows are
    // exactly lang_rank <= 180 - 0... big alloc 180 < 940 -> full=0,
    // part=180: each kept doc appears once, ranks 1..180
    val bigRanks = out.filter(F.col("lang") === "big")
      .select("lang_rank").collect().map(_.getLong(0)).sorted
    assert(bigRanks.length == 180 && bigRanks.head == 1L && bigRanks.last == 180L)
    // total == budget exactly (integer allocation, nothing lost)
    assert(out.count() == 300L)
    // determinism
    val again = Pipeline.unimaxSample(docs, budget = 300L, maxEpochs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(4))).toSet
    assert(out.collect().map(r => (r.getLong(0), r.getLong(4))).toSet == again)
  }

  test("unimax sample (p13) with a budget beyond the corpus allocates every doc") {
    import org.apache.spark.sql.{functions => F}
    val docs = ((0 until 30).map(i => (i.toLong, "a", "s")) ++
      (0 until 70).map(i => (100L + i, "b", "s"))).toDF("doc_id", "lang", "source")
    // budget 500 > 100 docs at cap 1: every doc sampled exactly once
    val out = Pipeline.unimaxSample(docs, budget = 500L, maxEpochs = 1)
    assert(out.count() == 100L)
    assert(out.groupBy("doc_id").agg(F.count(F.lit(1)).as("k"))
      .filter(F.col("k") =!= 1L).count() == 0)
  }

  test("epoch shuffle (p14): positions are a permutation, epochs differ, reruns agree") {
    import org.apache.spark.sql.{functions => F}
    val docs = graft.Tables.documents(spark, sfDir)
    val n = docs.count()
    val e1 = Pipeline.epochShuffle(docs, epoch = 1L)
    // a permutation: n distinct positions covering exactly 1..n
    val stats = e1.agg(F.countDistinct(F.col("pos")).as("d"),
      F.min(F.col("pos")).as("lo"), F.max(F.col("pos")).as("hi")).collect().head
    assert(stats.getLong(0) == n && stats.getLong(1) == 1L && stats.getLong(2) == n,
      s"not a permutation: $stats over $n docs")
    // a different epoch is a genuinely different order (some doc moves)
    val e2 = Pipeline.epochShuffle(docs, epoch = 2L)
    val moved = e1.withColumnRenamed("pos", "p1")
      .join(e2.withColumnRenamed("pos", "p2"), Seq("doc_id"))
      .filter(F.col("p1") =!= F.col("p2")).count()
    assert(moved > 0, "epoch 2 must reshuffle relative to epoch 1")
    // deterministic across reruns (no RNG state anywhere)
    val again = Pipeline.epochShuffle(docs, epoch = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(e1.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == again)
  }

  test("curriculum order (p15): stage blocks strictly ordered, within-stage shuffled, permutation") {
    import spark.implicits._
    // 4 short (stage 0), 4 medium (stage 1), 4 long (stage 2) docs,
    // interleaved by doc_id so stage order != id order
    val docs = (0 until 12).map { i =>
      val words = i % 3 match {
        case 0 => 10; case 1 => 50; case 2 => 90
      }
      (i.toLong, (0 until words).map(j => s"w$j").mkString(" "), "en")
    }.toDF("doc_id", "text", "lang")
    val out = Pipeline.curriculumOrder(docs, stageBounds = Seq(40L, 70L), buckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.length == 12)
    assert(out.forall { case (id, nw, st, _) =>
      st == (if (nw < 40) 0L else if (nw < 70) 1L else 2L) })
    // positions are a permutation of 1..12 and every stage-s position
    // precedes every stage-(s+1) position — the curriculum invariant
    assert(out.map(_._4).sorted.toSeq == (1L to 12L).toSeq)
    val maxByStage = out.groupBy(_._3).view.mapValues(_.map(_._4).max).toMap
    val minByStage = out.groupBy(_._3).view.mapValues(_.map(_._4).min).toMap
    assert(maxByStage(0L) < minByStage(1L) && maxByStage(1L) < minByStage(2L))
    // within a stage the order is hash order, not insertion order
    val stage0ByPos = out.filter(_._3 == 0L).sortBy(_._4).map(_._1).toSeq
    assert(stage0ByPos != stage0ByPos.sorted,
      "within-stage order should be the pseudorandom hash order")
  }

  test("curriculum order (p15): two-phase positions are bucket-count invariant on the real corpus") {
    val docs = graft.Tables.documents(spark, sfDir)
    def posOf(buckets: Int) =
      Pipeline.curriculumOrder(docs, buckets = buckets)
        .select(col("doc_id"), col("pos"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the monotone-prefix routing argument, exercised: any bucket count
    // yields the SAME flat (stage, hash, doc_id) enumeration
    assert(posOf(4) == posOf(1024),
      "two-phase positions must equal the flat enumeration at any bucket count")
  }

  test("triangleSide: every unordered pair meets exactly once, for random id sets and any B") {
    import spark.implicits._
    val rng = new scala.util.Random(20260814L)
    (1 to 5).foreach { trial =>
      val b = 1 + rng.nextInt(7)
      val n = 5 + rng.nextInt(40)
      // non-contiguous ids stress the pmod grouping
      val ids = scala.util.Random.javaRandomToRandom(new java.util.Random(trial * 7L))
        .shuffle((0 until 200).toList).take(n).map(_.toLong)
      val df = ids.toDF("id")
      def side(idAs: String, g: String) = Dedup.triangleSide(
        df.select(col("id").as(idAs)), idAs, g, b)
      val pairs = side("id_a", "ga").join(side("id_b", "gb"), Seq("k1", "k2"))
        .filter(col("id_a") < col("id_b"))
        .filter(Dedup.trianglePairFilter("ga", "gb"))
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val expected = (for {
        x <- ids; y <- ids if x < y
      } yield (x, y)).toSet
      assert(pairs.length == expected.size,
        s"trial $trial (B=$b, n=$n): ${pairs.length} pair occurrences != ${expected.size} — a pair met twice or never")
      assert(pairs.toSet == expected,
        s"trial $trial (B=$b, n=$n): pair set mismatch")
    }
  }

  test("semdedup IVF path (d17/s4): trained-centroid clusters feed the same dominance core exactly") {
    // the paper's k-means spelling: cluster ids from trained IVF
    // centroids. Training is float-nondeterministic, so the check is an
    // in-test brute-force dominance reference computed over the
    // operator's OWN emitted clusters — proving the shared core applies
    // the min-id cosine rule exactly whatever the cluster source
    val e = graft.Tables.embeddings(spark, sfDir)
    val out = Dedup.semDeDupIvf(e, kClusters = 8, iters = 2, tau = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length == e.count())
    // clusters are non-degenerate: more than one cluster in use
    assert(out.map(_._2).distinct.length > 1, "IVF clustering collapsed to one cluster")
    val vecs = e.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / math.sqrt(na * nb)
    }
    val byBucket = out.groupBy(_._2)
    val expectDropped = out.map { case (id, bucket, _) =>
      id -> byBucket(bucket).exists { case (other, _, _) =>
        other < id && cos(vecs(other), vecs(id)) >= 0.4 }
    }.toMap
    out.foreach { case (id, _, dropped) =>
      assert(dropped == expectDropped(id),
        s"dominance mismatch for vec $id: got $dropped")
    }
    // non-vacuous on the real corpus: both branches live
    assert(out.exists(_._3) && out.exists(!_._3))
  }

  test("semdedup (d17): same-bucket near-dups drop to the min id, cross-bucket pairs survive") {
    import spark.implicits._
    def v(fs: Double*) = fs.map(_.toFloat).toArray
    val emb = Seq(
      // bucket 15 (all four lead dims >= 0): v1 keeps, v2 and v6 are both
      // dominated by v1 — v6 stays dropped even though its other
      // dominator v2 is itself dropped (min-id dominance is order-free,
      // not greedy-sequential)
      (1L, v(1, 1, 1, 1, 0, 0, 0, 0)),
      (2L, v(1, 1, 1, 1, 0.01, 0, 0, 0)),
      (6L, v(1, 1, 1, 1, 0, 0.01, 0, 0)),
      // bucket 14 (dim 1 negative), no near neighbor there: keeps
      (3L, v(-1, 1, 1, 1, 0, 0, 0, 0)),
      // cos(v4, v5) ~ 1 but the sign of dim 1 splits them across
      // buckets: BOTH keep — the documented SemDeDup approximation
      // (cross-cluster near-dups are out of scope by design)
      (4L, v(0.001, 1, 1, 1, 5, 5, 5, 5)),
      (5L, v(-0.001, 1, 1, 1, 5, 5, 5, 5)))
      .toDF("vec_id", "embedding")
    val out = Dedup.semDeDup(emb, signBits = 4, tau = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L, 6L))
    val dropped = out.filter(_._3).map(_._1).toSet
    assert(dropped == Set(2L, 6L), s"dropped=$dropped")
    val buckets = out.map(t => t._1 -> t._2).toMap
    assert(buckets(4L) == 15L && buckets(5L) == 14L,
      "the planted twin pair must straddle the sign boundary")
    // the high-cos cross-bucket pair really is a near-dup the operator
    // deliberately spares — pin the approximation, don't just assert it
    val pair = Seq((v(0.001, 1, 1, 1, 5, 5, 5, 5), v(-0.001, 1, 1, 1, 5, 5, 5, 5)))
      .toDF("a", "b").select(CosineSimilarity(col("a"), col("b"))).as[Double].head()
    assert(pair >= 0.4, s"planted cross-bucket pair should sit above tau, cos=$pair")
    // MULTI-PROBE (the opt-in recall knob): dim 1 is the twins' lowest-
    // |margin| coordinate (0.001 from the boundary), so probes = 1 flips
    // exactly that bit and the spared pair is FOUND — the larger id (5)
    // drops. v3 is also found (cos(v1,v3) = 0.5 >= tau across the same
    // boundary — another real near-dup probe 0 spared by design).
    val probed = Dedup.semDeDup(emb, signBits = 4, tau = 0.4, probes = 1)
      .collect().map(r => (r.getLong(0), r.getBoolean(2)))
    assert(probed.filter(_._2).map(_._1).toSet == Set(2L, 3L, 5L, 6L),
      s"probe=1 must find the cross-boundary near-dups: ${probed.toSeq}")
    // candidate growth is bounded by construction: each vector visits
    // exactly 1 + probes buckets (probe work <= (1+probes)x, never
    // all-pairs), and probes is monotone in recall
    val visitCount = emb
      .select(explode(concat(
        array(Dedup.signBucket(4)),
        Dedup.probeBucketsExpr(signBits = 4, probes = 3))))
      .count()
    assert(visitCount == emb.count() * 4, s"visit rows $visitCount != n*(1+3)")
    val p0drop = out.filter(_._3).map(_._1).toSet
    assert(p0drop.subsetOf(probed.filter(_._2).map(_._1).toSet),
      "probe recall must be monotone: probe=0 drops are a subset")
  }

  test("semdedup (d17): nontrivial and deterministic on the real embeddings") {
    val e = graft.Tables.embeddings(spark, sfDir)
    val out = Dedup.semDeDup(e)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length == e.count().toInt, "one row per vector")
    assert(Dedup.semDeDup(e)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
      == out.toSeq, "deterministic across runs")
  }

  test("dsir (p16): target-like docs keep, foreign-vocabulary docs drop, votes exact") {
    import spark.implicits._
    // targets (doc_id % 20 == 0) all share one small vocabulary; raw doc
    // 1 reuses it, raw doc 2 is entirely foreign. Counts: tn = 15 target
    // tokens, rn = 6 raw tokens; every target-vocab bucket votes +1
    // (ct*rn > cr*tn), every foreign bucket votes -1 (ct = 0) — so doc 1
    // scores +3 and doc 2 scores -3 EXACTLY unless md5 buckets collide,
    // which the planted assert would surface, not mask
    val docs = Seq(
      (0L, "alpha beta gamma alpha beta", "en"),
      (20L, "alpha beta gamma alpha beta", "en"),
      (40L, "alpha beta gamma alpha beta", "en"),
      (1L, "alpha beta gamma", "en"),
      (2L, "zulu yankee xray", "de"))
      .toDF("doc_id", "text", "lang")
    val out = Pipeline.dsirSample(docs, col("doc_id") % 20 === 0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getBoolean(5)))
    assert(out.toSeq == Seq((1L, 3L, 3L, true), (2L, 3L, -3L, false)),
      s"got ${out.toSeq}")
  }

  test("dsir (p16): both keep branches live on the real corpus; gate twin is bit-identical") {
    val docs = graft.Tables.documents(spark, sfDir)
    val isTarget = col("doc_id") % 20 === 0
    val batch = Pipeline.dsirSample(docs, isTarget)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getBoolean(5)))
    assert(batch.exists(_._4) && batch.exists(!_._4),
      "the vote gate must split the real corpus, not degenerate")
    // A38's row-local scorer reproduces the relational votes exactly on
    // the same raw slice — all-integer, so bit-equality is the right bar
    val model = Pipeline.dsirVoteModel(docs, isTarget)
    val gated = Pipeline.dsirGate(docs.filter(!isTarget), model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(gated.toSeq == batch.toSeq.sortBy(_._1),
      "dsirGate must equal the batch operator's (n_tokens, votes, kept) exactly")
  }

  test("semdedup (d17): matches a brute-force in-test reference on seeded random embeddings") {
    import spark.implicits._
    // bit-replicates CosineSimilarity's arithmetic shape (interleaved
    // adds, final dot/sqrt(na*nb)) so the comparison is exact, not eps
    def cosLocal(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / math.sqrt(na * nb)
    }
    val rnd = new scala.util.Random(1717)
    for (trial <- 1 to 3) {
      val n = 40 + rnd.nextInt(40)
      val base = (0 until n).map { i =>
        (i.toLong, Array.fill(8)((rnd.nextDouble() * 2 - 1).toFloat))
      }
      // plant a few true near-dups so the drop branch is always live
      val planted = (0 until 5).map { j =>
        val (srcId, v) = base(rnd.nextInt(n))
        val twin = v.clone(); twin(7) = twin(7) + 0.001f
        ((n + j).toLong, twin)
      }
      val emb = (base ++ planted).toDF("vec_id", "embedding")
      val got = Dedup.semDeDup(emb, signBits = 3, tau = 0.4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
      val all = (base ++ planted)
      def bucket(v: Array[Float]) =
        (0 until 3).map(j => if (v(j) >= 0) 1L << j else 0L).sum
      val expected = all.sortBy(_._1).map { case (id, v) =>
        val bk = bucket(v)
        val dropped = all.exists { case (oid, ov) =>
          oid < id && bucket(ov) == bk && cosLocal(ov, v) >= 0.4 }
        (id, bk, dropped)
      }
      assert(got == expected, s"trial $trial: semdedup != brute-force reference")
      assert(expected.exists(_._3), s"trial $trial: drop branch not live")
    }
  }

  test("dsir (p16): matches an all-integer in-test reference on seeded random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(1616)
    val vocabA = (0 until 30).map(i => s"va$i")
    val vocabB = (0 until 30).map(i => s"vb$i")
    for (trial <- 1 to 3) {
      val docs = (0 until (40 + rnd.nextInt(40))).map { i =>
        val vocab = if (rnd.nextBoolean()) vocabA else vocabB
        val words = (0 until 5 + rnd.nextInt(20)).map(_ => vocab(rnd.nextInt(vocab.length)))
        (i.toLong, words.mkString(" "), "en")
      }
      val df = docs.toDF("doc_id", "text", "lang")
      val got = Pipeline.dsirSample(df, col("doc_id") % 5 === 0, nBuckets = 64)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getBoolean(5))).toSeq
      // local replay with the spec-pinned row-local hash twins + BigInt
      // cross-multiplication — exact, so equality is the bar
      val toks = docs.map { case (id, t, _) =>
        (id, id % 5 == 0, graft.functions.HashFunctions.tokensLocal(t)
          .map(w => graft.functions.HashFunctions.md5Hash56Local(w) % 64)) }
      val ct = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      val cr = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      toks.foreach { case (_, tgt, bs) =>
        bs.foreach(b => if (tgt) ct(b) += 1 else cr(b) += 1) }
      val (tn, rn) = (ct.values.sum, cr.values.sum)
      def sign(b: Long): Long = {
        val l = BigInt(ct(b)) * rn; val r = BigInt(cr(b)) * tn
        if (l > r) 1L else if (l < r) -1L else 0L
      }
      val expected = toks.filter(!_._2).map { case (id, _, bs) =>
        (id, bs.length.toLong, bs.map(sign).sum, bs.map(sign).sum > 0) }
      assert(got == expected.sortBy(_._1), s"trial $trial: dsir != integer reference")
    }
  }

  test("weighted sample (p17): heavy doc absorbs multiple picks; total picks == k; reference-exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(1515)
    for (trial <- 1 to 3) {
      val n = 30 + rnd.nextInt(30)
      val docs = (0 until n).map { i =>
        // one certainty unit (~ a third of total mass) per trial
        val w = if (i == 7) 2000L else 1L + rnd.nextInt(100)
        (i.toLong, "en", w)
      }
      val df = docs.map { case (id, l, w) => (id, l, w) }.toDF("doc_id", "lang", "n_chars")
      val k = 5L + rnd.nextInt(20)
      val got = Pipeline.weightedSystematicSample(df, col("n_chars"), k, buckets = 4)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
      // local replay: flat prefix sum in hash order, BigInt boundaries
      val ordered = docs.map { case (id, _, w) =>
        (graft.functions.HashFunctions.md5Hash56Local(s"ws:$id"), id, w) }.sorted
      val wTotal = docs.map(_._3).sum
      var cum = 0L
      val expected = ordered.flatMap { case (_, id, w) =>
        val lo = BigInt(cum) * k / wTotal
        cum += w
        val hi = BigInt(cum) * k / wTotal
        if (hi > lo) Some((id, w, cum, (hi - lo).toLong)) else None
      }.sortBy(_._1)
      assert(got == expected, s"trial $trial: p17 != prefix-sum reference")
      assert(got.map(_._4).sum == k, s"trial $trial: picks must sum to k=$k")
      assert(got.exists(_._4 > 1),
        s"trial $trial: the planted heavy doc should absorb multiple picks")
    }
  }

  test("d4 diversify (p18): selection equals an integer local replay over the semdedup survivors") {
    // stage 1 (semdedup) is already brute-force-verified by the d17
    // specs; this replays stage 2 — sqrt-temperature targets + hash-order
    // prefix per cluster — locally in exact integers from the survivor
    // frame, so the whole selection is pinned end to end
    val docs = graft.Tables.documents(spark, sfDir)
    val emb = graft.Tables.embeddings(spark, sfDir)
    val budget = 120L
    val got = Pipeline.d4Diversify(docs, emb, budget)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    val survivors = Dedup.semDeDup(emb)
      .filter(!col("dropped")).select(col("vec_id"), col("bucket"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byCluster = survivors.groupBy(_._2)
    val w = byCluster.view.mapValues(s => math.sqrt(s.size.toDouble).toLong).toMap
    val wTotal = w.values.sum
    val expected = byCluster.toSeq.flatMap { case (c, members) =>
      val target = w(c) * budget / wTotal
      members.map { case (id, _) =>
        (id, graft.functions.HashFunctions.md5Hash56Local(id.toString)) }
        .sortBy { case (id, h) => (h, id) }
        .take(target.toInt)
        .zipWithIndex.map { case ((id, _), i) => (id, c, (i + 1).toLong) }
    }.sortBy(_._1)
    assert(got == expected, "p18 selection must equal the local integer replay")
    assert(got.nonEmpty && got.length <= budget, s"selected ${got.length} of budget $budget")
    // diversification is live: more than one cluster contributes
    assert(got.map(_._2).distinct.length > 1, "multiple clusters must contribute")
  }

  test("leakage-safe split (p19): no near-dup pair straddles; cluster side beats the naive doc side") {
    import spark.implicits._
    def side(group: Long): String =
      if (graft.functions.HashFunctions.md5Hash56Local(s"split:$group") % 100 < 20) "val" else "train"
    // find a planted pair whose NAIVE per-doc sides differ — the exact
    // case a doc-hash split leaks — then cluster them and require one side
    val a = (0L until 200L).find(i => side(i) == "val").get
    val b = (0L until 200L).find(i => i != a && side(i) == "train" && i > a).get
    val docs = Seq((a, "same text", "en"), (b, "same text", "en"), (150L, "loner", "de"))
      .toDF("doc_id", "text", "lang")
    val clusters = Dedup.connectedComponents(
      Seq((a, b)).toDF("doc_a", "doc_b"))
    val out = Pipeline.leakageSafeSplit(docs, clusters)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toList
    val byId = out.map(t => t._1 -> ((t._2, t._3))).toMap
    assert(byId(a) == byId(b), "clustered near-dups must land on ONE side")
    assert(byId(a)._1 == math.min(a, b), "group = cluster id = min member")
    assert(byId(150L) == ((150L, side(150L))), "singletons split by their own id")
    assert(side(a) != side(b), "the planted pair must be a genuine naive-split straddle")
  }

  test("leakage-safe split (p19): zero straddled near-dup pairs on the real corpus") {
    val docs = graft.Tables.documents(spark, sfDir)
    val split = Pipeline.leakageSafeSplit(docs,
      Dedup.nearDupClustersView(spark, sfDir))
    val pairs = Dedup.nearDupPairsView(spark, sfDir)
      .select(col("doc_a"), col("doc_b"))
    val straddles = pairs
      .join(split.select(col("doc_id").as("doc_a"), col("split").as("sa")), Seq("doc_a"))
      .join(split.select(col("doc_id").as("doc_b"), col("split").as("sb")), Seq("doc_b"))
      .filter(col("sa") =!= col("sb")).count()
    assert(straddles == 0, s"$straddles near-dup pairs straddle the split")
    assert(pairs.count() > 0, "non-vacuous: the corpus must have near-dup pairs")
    val sides = split.groupBy(col("split")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sides.getOrElse("val", 0L) > 0 && sides.getOrElse("train", 0L) > 0,
      "both sides must be populated")
  }

  test("weighted sample (p17): two-phase cum is bucket-count invariant on the real corpus") {
    val docs = graft.Tables.documents(spark, sfDir)
    def sample(buckets: Int) =
      Pipeline.weightedSystematicSample(docs, col("n_chars"), k = 100L, buckets = buckets)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(sample(4) == sample(1024),
      "two-phase weighted prefix sums must equal the flat sum at any bucket count")
    assert(sample(4).map(_._4).sum == 100L, "picks must sum to k on the real corpus")
  }

  test("stupid backoff (t20) matches the hand-computed worked example at every level") {
    // train: "a b c a b c" -> c3: (a,b,c)=2 (b,c,a)=1 (c,a,b)=1;
    // c2: (a,b)=2 (b,c)=2 (c,a)=1; c1: a=b=c=2; N=6, V=3
    val train = Seq((0L, "a b c a b c")).toDF("doc_id", "text")
    val score = Seq(
      (1L, "a b c d"),   // tri hit bits 0; uni backoff (b,c,d): 225/4 -> 5
      (3L, "b c a b"),   // tri hits: log2(2/1)->1, log2(1/1)->0
      (5L, "x y z x y"), // 3 all-OOV uni backoffs: 5 bits each
      (7L, "c b c a"))   // bi backoff (c,b,c): 10/4 -> 1; tri hit (b,c,a): 1
      .toDF("doc_id", "text")
    val out = TextAnalysis.stupidBackoffScore(train, score)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6), r.getBoolean(7)))).toMap
    //                 (n_pos, tri, bi, uni, total_bits, bpp, keep)
    assert(out(1L) == ((2L, 1L, 0L, 1L, 5L, 2.5, true)))
    assert(out(3L) == ((2L, 2L, 0L, 0L, 1L, 0.5, true)))
    assert(out(5L) == ((3L, 0L, 0L, 3L, 15L, 5.0, true)),
      "all-OOV doc sits exactly on the keep boundary: 15*100 == 500*3")
    assert(out(7L) == ((2L, 1L, 1L, 0L, 2L, 1.0, true)))
  }

  test("stupid backoff (t20): scoring the train corpus itself makes backoff dead code") {
    // the degeneracy the held-out parity split exists to avoid: every
    // trigram of the training corpus is a trigram HIT by construction
    val docs = Seq((0L, "a b c a b c"), (2L, "b c a b")).toDF("doc_id", "text")
    val out = TextAnalysis.stupidBackoffScore(docs, docs).collect()
    assert(out.forall(r => r.getLong(3) == 0L && r.getLong(4) == 0L),
      "self-scoring must produce zero backoffs — the split is load-bearing")
  }

  test("stupid backoff (t20): all three levels live and the gate discriminates on the real corpus") {
    val docs = graft.Tables.documents(spark, sfDir)
    val out = TextAnalysis.stupidBackoffScore(
      docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1))
    val agg = out.agg(sum("n_tri_hits"), sum("n_bi_backoffs"),
      sum("n_uni_backoffs"), count(lit(1)), sum(when(col("keep"), 1L).otherwise(0L)))
      .collect()(0)
    assert(agg.getLong(0) > 0 && agg.getLong(1) > 0 && agg.getLong(2) > 0,
      s"every backoff level should fire on the held-out half: $agg")
    assert(agg.getLong(4) > 0 && agg.getLong(4) < agg.getLong(3),
      s"keep gate should discriminate: kept ${agg.getLong(4)} of ${agg.getLong(3)}")
  }

  test("bm25 (t21) matches an independently computed reference on a hand fixture") {
    val corpus = Map(
      0L -> Seq("apple", "banana", "banana"),
      1L -> Seq("apple", "cherry"),
      2L -> Seq("cherry", "cherry", "cherry", "banana"),
      3L -> Seq("date", "fig", "grape"))
    val docs = corpus.toSeq.map { case (id, ts) => (id, ts.mkString(" ")) }
      .toDF("doc_id", "text")
    val queries = Seq(0L -> Seq("banana"), 1L -> Seq("apple", "cherry"))
    val out = TextAnalysis.bm25TopK(docs, queries)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // independent reference: same formula in plain Scala, same fold order
    def r4d(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    val nDocs = corpus.size.toDouble
    val avgdl = corpus.values.map(_.size).sum / nDocs
    def dfOf(t: String) = corpus.values.count(_.contains(t)).toDouble
    def wOf(t: String, d: Long): Option[Double] = {
      val tf = corpus(d).count(_ == t).toDouble
      if (tf == 0) None
      else {
        val idf = math.log(1.0 + ((nDocs - dfOf(t)) + 0.5) / (dfOf(t) + 0.5))
        Some(r4d(idf * ((tf * 2.2) /
          (tf + 1.2 * (0.25 + 0.75 * (corpus(d).size.toDouble / avgdl))))))
      }
    }
    val expected = queries.flatMap { case (q, ts) =>
      corpus.keys.toSeq.sorted.flatMap { d =>
        val ws = ts.sorted.flatMap(t => wOf(t, d)) // sorted-term fold order
        if (ws.isEmpty) None
        else Some((q, d, ws.size.toLong, r4d(ws.foldLeft(0.0)(_ + _))))
      }.sortBy { case (_, d, _, sc) => (-sc, d) }
        .zipWithIndex.map { case ((qq, d, nh, sc), i) => (qq, i + 1L) -> ((d, nh, sc)) }
    }.toMap
    assert(out == expected, s"got $out\nexpected $expected")
  }

  /** Independent local RAKE: same published recipe in plain Scala —
    * phrase carving, per-doc degree/frequency, the one floor division,
    * duplicate phrases scored once.
    */
  private def rakeLocal(text: String, topK: Int = 3): Seq[(String, Long)] = {
    val delim = ("(?:\\s*(?:[^a-z\\s]|\\b(?:the|and|of|to|in|is|that|it|for|was)\\b)\\s*)+").r
    val phrases = delim.split(text.trim.toLowerCase)
      .map(_.trim).filter(_.nonEmpty).toSeq
    val freq = scala.collection.mutable.Map.empty[String, Long]
    val deg = scala.collection.mutable.Map.empty[String, Long]
    phrases.foreach { p =>
      val ws = p.split("\\s+").toSeq
      ws.foreach { w =>
        freq(w) = freq.getOrElse(w, 0L) + 1
        deg(w) = deg.getOrElse(w, 0L) + ws.size
      }
    }
    phrases.distinct
      .map(p => p -> p.split("\\s+").map(w => deg(w) * 1000000L / freq(w)).sum)
      .sortBy { case (p, s) => (-s, p) }
      .take(topK)
  }

  test("RAKE (t29): matches the independent local reference, incl. planted duplicate phrases") {
    // hand fixture: multiword phrases, a stopword-only doc, duplicated
    // phrases (which a join-through-instances would double-score)
    val docs = Seq(
      (1L, "Linear constraints and natural numbers; strict inequations of linear constraints."),
      (2L, "the and of to in is"), // all stopwords: zero candidate phrases
      (3L, "red apples, red apples, red apples! tasty fruit baskets"),
      (4L, "solo"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.rakeKeyphrases(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = Seq(1L, 3L, 4L).flatMap { id =>
      rakeLocal(docs.filter(col("doc_id") === id).head().getString(1))
        .map { case (p, s) => (id, p, s) }
    }
    assert(got.toSeq.sorted == expected.sorted, s"got ${got.toSeq}\nexpected $expected")
    assert(!got.exists(_._1 == 2L), "stopword-only doc produced phrases")
    // the duplicated phrase scored ONCE: "red apples" has deg/freq =
    // (red:6/3, apples:6/3) -> exactly 4000000; a join through the 3
    // instances would have tripled it to 12000000
    val doc3 = got.filter(t => t._1 == 3L && t._2 == "red apples")
    assert(doc3.map(_._3).toSeq == Seq(4000000L), s"doc3 'red apples': ${doc3.toSeq}")
  }

  test("RAKE (t29): real-corpus run — multiword phrases win and scores are exact integers") {
    val res = graft.SparkEntry.queries("t29_rake_keyphrases")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(res.nonEmpty)
    // <= topK per doc, all scores positive
    val perDoc = res.groupBy(_._1)
    assert(perDoc.values.forall(_.length <= 3))
    assert(res.forall(_._3 > 0))
    // RAKE's signature bias: degree rewards co-occurrence, so top
    // phrases are predominantly multiword on natural text
    val multi = res.count(_._2.contains(" "))
    assert(multi * 2 > res.length, s"only $multi of ${res.length} keyphrases are multiword")
  }

  test("bm25 (t21): rare-term idf dominates and ranks are dense per query on the real corpus") {
    val docs = graft.Tables.documents(spark, sfDir)
    val out = TextAnalysis.bm25TopK(docs, TextAnalysis.Bm25Queries).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
    // ranks dense from 1, scores non-increasing within each query
    out.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq,
        s"query $q ranks must be dense from 1")
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._4 >= b._4; case _ => true },
        s"query $q scores must be non-increasing by rank")
    }
    // query 0 mixes 'dup' (rare, high idf) with 'key' (ubiquitous): the
    // top hit must be a 'dup' doc — idf ln(2.98) vs ln(1.34) dominates
    val top0 = out.filter(r => r._1 == 0L && r._2 == 1L).head._3
    val txt = docs.filter(col("doc_id") === top0).select("text")
      .collect()(0).getString(0)
    assert(txt.split("\\s+").contains("dup"),
      s"query 0's top doc $top0 should contain the rare term 'dup'")
  }

  test("unicode normalize (t23): composition, pass-through, and the changed flags are exact") {
    import graft.functions.NfcNormalize
    val decomposed = "cafe\u0301"   // e + COMBINING ACUTE
    val composed = "caf\u00e9"      // precomposed e-acute
    val ringDecomp = "a\u030ab"     // a + COMBINING RING + b
    val ringComp = "\u00e5b"        // a-ring + b
    val rows = Seq(
      (0L, decomposed), (1L, composed), (2L, ringDecomp), (3L, "plain ascii"))
      .toDF("doc_id", "text")
    val out = rows.select(col("doc_id"), NfcNormalize(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) == composed, "decomposed sequence must compose")
    assert(out(1L) == composed, "already-NFC text is untouched")
    assert(out(2L) == ringComp, "a + combining ring composes to a-ring")
    assert(out(3L) == "plain ascii", "ASCII is a no-op (fast path)")
    // the operator's report columns on the same fixture
    val rep = TextAnalysis.unicodeNormalize(rows).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(rep(0L) == ((5L, 4L, true)), "composition shortens and flags")
    assert(rep(1L) == ((4L, 4L, false)) && rep(3L)._3 == false,
      "already-normalized docs pass through unflagged")
  }

  test("hybrid RRF (t25): fusion arithmetic matches the hand example; both legs contribute") {
    // lex ranks A then B; sem ranks B then C. B appears in both legs:
    // 1/62 + 1/61 (r4'd each) beats A's 1/61 beats C's 1/62.
    val lex = Seq((0L, 1L, 100L), (0L, 2L, 200L)).toDF("query_id", "rnk", "doc_id")
    val sem = Seq((0L, 1L, 200L), (0L, 2L, 300L)).toDF("query_id", "rnk", "doc_id")
    val fused = TextAnalysis.rrfFuse(lex, sem).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4), r.getBoolean(5)))
    assert(fused.toSeq == Seq(
      (1L, 200L, 0.0325, true, true),   // both legs
      (2L, 100L, 0.0164, true, false),  // lexical only
      (3L, 300L, 0.0161, false, true)), // semantic only
      s"got ${fused.toSeq}")
    // the real query: ranks dense, and both legs actually contribute
    val out = graft.SparkEntry.queries("t25_hybrid_rrf")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(4), r.getBoolean(5)))
    out.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length).toSeq,
        s"query $q fused ranks must be dense")
    }
    assert(out.exists(_._3) && out.exists(_._4),
      "both retrieval legs should surface docs in the fused top-k")
  }

  test("gap fill (q50): forward-fill carries the last value, ages correctly, and leads stay empty") {
    val rows = graft.SparkEntry.queries("q50_gap_fill")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getDouble(2), r.getDouble(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (ck, months) =>
      val ordered = months.sortBy(_._2)
      var lastVal = 0.0
      var lastAge = -1L
      var seen = false
      ordered.foreach { case (_, m, rev, filled, age) =>
        if (rev != 0.0) { seen = true; lastVal = rev; lastAge = 0L }
        else if (seen) lastAge += 1
        if (!seen) {
          assert(filled == 0.0 && age == -1L,
            s"cust $ck $m: months before the first order must be empty")
        } else {
          assert(filled == lastVal, s"cust $ck $m: fill must carry the last value")
          assert(age == lastAge, s"cust $ck $m: months_since_order must age by 1")
        }
      }
      assert(seen, s"cust $ck appears only if it has at least one order")
    }
    // the fill is genuinely exercised: some month somewhere is filled from the past
    assert(rows.exists(r => r._3 == 0.0 && r._4 > 0.0), "gaps exist and are filled")
  }

  test("quality-weighted sample (p20): picks sum to k, and every pick passed the quality gate") {
    val out = graft.SparkEntry.queries("p20_quality_weighted_sample")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4)))
    assert(out.map(_._3).sum == 100L, "PPS picks must sum to k exactly")
    assert(out.forall(_._2 > 0), "weight 0 docs (score <= 0) can never be sampled")
    // composition honesty: every sampled doc is a t15 keep=true doc
    val dim = 4096
    val model = spark.range(dim).select(col("id").as("bucket"),
      ((col("id") * 2654435761L) % 1009L - 504L).as("w"))
    val kept = TextAnalysis.qualityModelScore(
        graft.Tables.documents(spark, sfDir), model, dim)
      .filter(col("keep")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(out.forall(r => kept.contains(r._1)),
      "the sampler IS the keep gate: only positive-score docs appear")
  }

  test("scene changes (m12): cuts land exactly at scene boundaries with >100x separation") {
    val out = graft.SparkEntry.queries("m12_scene_changes")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(out.nonEmpty)
    out.foreach { case (id, (nf, cuts)) =>
      val slen = (3 + id % 3).toInt
      val expected = (1 until 16).count(_ % slen == 0).toLong
      assert(nf == 16 && cuts == expected,
        s"doc $id (scene len $slen): expected $expected cuts, got $cuts")
    }
    // the separation claim, measured directly on one doc's frames
    val id = out.keys.min
    val slen = (3 + id % 3).toInt
    def frame(k: Int) = Array.tabulate(128)(i =>
      ((i * 37 + (k / slen) * 101 + id * 13) % 251) + (k % slen))
    val diffs = (1 until 16).map(k =>
      (k, frame(k).zip(frame(k - 1)).map { case (a, b) => math.abs(a - b) }.sum))
    val (boundary, within) = diffs.partition(_._1 % slen == 0)
    assert(within.map(_._2).max * 100 < boundary.map(_._2).min,
      "cut threshold sits in a >100x gap — not a tuned constant")
  }

  test("normalized dedup (d19): spellings collapse under NFC that raw hashing keeps apart") {
    val out = graft.SparkEntry.queries("d19_normalized_dedup")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    assert(out.forall(_._2 >= 2), "every doc pairs with its other spelling at minimum")
    assert(out.map(_._2).sum == 2 * nDocs, "clusters partition the doubled corpus exactly")
    assert(out.exists(_._3 == 2),
      "some cluster must hold two DISTINCT raw hashes — the miss raw dedup would make")
    assert(out.forall(_._3 <= 2), "at most the two spellings per doc text")
  }

  test("compression ratio (t24): loop-spam is dropped, natural text survives, runs are deterministic") {
    val docs = Seq(
      (0L, "spam ham " * 200),                       // loop spam: ratio ~0.02
      (1L, (0 until 200).map(i => s"w${i * 37 % 997}x${i * 61 % 991}").mkString(" ")),
      (2L, ""))                                      // empty: 0 bytes, keep
      .toDF("doc_id", "text")
    val out = TextAnalysis.compressionRatio(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(!out(0L)._4 && out(0L)._3 < 0.1, s"loop spam must fail the gate: ${out(0L)}")
    assert(out(1L)._4 && out(1L)._3 > 0.25, s"high-variety text must pass: ${out(1L)}")
    assert(out(2L) == ((0L, out(2L)._2, out(2L)._3, true)), "empty doc keeps (0 >= 0)")
    val again = TextAnalysis.compressionRatio(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(again == out, "deflate sizes must be run-to-run deterministic")
    // the clean corpus sits entirely above the junk line
    val corpus = TextAnalysis.compressionRatio(graft.Tables.documents(spark, sfDir))
    assert(corpus.filter(!col("keep")).count() == 0,
      "nothing in the clean corpus should read as loop spam")
    assert(corpus.count() > 0)
  }

  test("MIPS (s7): the norm-augmentation reduction ranks exactly like the inner product") {
    val e = graft.Tables.embeddings(spark, sfDir)
    val viaDot = graft.SparkEntry.queries("s7_mips_topk")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val viaAug = Similarity.mipsAugmentedTopK(e, 10, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaDot.nonEmpty)
    assert(viaAug == viaDot,
      "augmented-cosine top-k must equal inner-product top-k — the Bachrach reduction")
    // the metric matters — pinned on a planted fixture (the corpus
    // embeddings are near-constant norm, where MIPS == cosine by math):
    // a long 45-degree vector beats a short well-aligned one on inner
    // product while losing on cosine, and the augmented path must rank
    // it first
    val fix = Seq(
      (0L, Array(1f, 0f)),    // the query
      (1L, Array(0.9f, 0.1f)), // aligned, short: cosine winner
      (2L, Array(5f, 5f)))     // 45 degrees, long: MIPS winner
      .toDF("vec_id", "embedding")
    val mips = Similarity.mipsAugmentedTopK(fix, 1, 2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(mips == Seq((1L, 2L), (2L, 1L)),
      s"the long vector must win MIPS through the augmented path: $mips")
  }

  test("multi-pattern scan (t22): overlaps, nested patterns, and suffix links count exactly") {
    import graft.functions.{AcAutomaton, MultiPatternCounts}
    def counts(text: String, pats: Seq[String]): Seq[Long] =
      AcAutomaton.countsToArrayData(text, AcAutomaton.build(pats), pats.size)
        .toLongArray().toSeq
    // overlapping occurrences all count: "aa" starts at 3 positions of "aaaa"
    assert(counts("aaaa", Seq("aa")) == Seq(3L))
    assert(counts("aaaa", Seq("a", "aa", "aaa")) == Seq(4L, 3L, 2L))
    // nested patterns: a match of "abc" is ALSO a match of its suffixes
    // (the dictionary-suffix-link semantics a regex alternation misses)
    assert(counts("xabcx", Seq("abc", "bc", "c")) == Seq(1L, 1L, 1L))
    // patterns sharing prefixes in the trie stay independent
    assert(counts("ababab", Seq("ab", "aba", "bab")) == Seq(3L, 2L, 2L))
    // no match -> zeros; empty text -> zeros
    assert(counts("zzz", Seq("ab", "q")) == Seq(0L, 0L))
    assert(counts("", Seq("ab")) == Seq(0L))
    // fail links across pattern boundaries: scanning "aab" against
    // {"aab", "ab"} must find both via the fallback transition
    assert(counts("aab", Seq("aab", "ab")) == Seq(1L, 1L))
    val df = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val viaSpark = df.select(MultiPatternCounts(col("text"), Seq("a", "aa")).as("pc"))
      .collect()(0).getSeq[Long](0)
    assert(viaSpark == Seq(4L, 3L), "Spark column path agrees with the direct walk")
  }

  test("multi-pattern scan (t22): codegen equals a brute-force position scan over the corpus") {
    import graft.functions.MultiPatternCounts
    val pats = TextAnalysis.ScanPatterns
    val got = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), lower(trim(col("text"))).as("t"),
        MultiPatternCounts(lower(trim(col("text"))), pats).as("pc"))
      .collect().map(r => (r.getString(1), r.getSeq[Long](2).toSeq))
    assert(got.nonEmpty)
    got.foreach { case (t, pc) =>
      val brute = pats.map(p =>
        (0 to t.length - p.length).count(i => t.regionMatches(i, p, 0, p.length)).toLong)
      assert(pc == brute, s"automaton mismatch on corpus text (len ${t.length})")
    }
  }

  test("cdc merge (q49): update, latest-wins, delete-wins, insert, and untouched all land") {
    val out = graft.SparkEntry.queries("q49_cdc_merge")(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getDouble(3), r.getLong(4)))).toMap
    val snap = graft.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getDouble(3)))).toMap
    import scala.math.BigDecimal.RoundingMode.HALF_UP
    snap.foreach { case (k, (ck, st, price)) =>
      val p2 = BigDecimal(price).setScale(2, HALF_UP)
      if (k % 13 == 0)
        assert(!out.contains(k), s"deleted key $k must be gone (delete wins over any update)")
      else if (k % 21 == 0)
        assert(out(k) == ((ck, st, (p2 + 5).setScale(2, HALF_UP).toDouble, 2L)),
          s"seq-2 re-update must win over seq-1 for $k")
      else if (k % 7 == 0)
        assert(out(k) == ((ck, st, (p2 * BigDecimal("1.10")).setScale(2, HALF_UP).toDouble, 1L)),
          s"seq-1 update must apply for $k")
      else
        assert(out(k) == ((ck, st, p2.toDouble, 0L)), s"untouched key $k passes through")
      if (k % 1000 == 1)
        assert(out(k + 10000000L) == ((ck, "N", p2.toDouble, 1L)),
          s"insert for $k lands on the fresh key")
    }
    val expectedRows = snap.count { case (k, _) => k % 13 != 0 } +
      snap.count { case (k, _) => k % 1000 == 1 }
    assert(out.size == expectedRows, "row count = survivors + inserts, exactly")
  }

  test("audio fingerprint (m11): DC-offset and exact-volume invariance are bit-exact") {
    // the two Haitsma-Kalker robustness classes, provable here because
    // the features are integer AMDF sums: offsets cancel inside the
    // differences; exact scaling multiplies every energy by the same
    // factor, preserving every sign
    val base = Array.tabulate(1088)(k =>
      (2 * (((k * 307) % 16384) - 8192 + ((k * 113) % 8192) - 4096)).toShort)
    val h0 = Multimodal.audioFingerprint(base)
    val hOffset = Multimodal.audioFingerprint(base.map(v => (v + 24).toShort))
    val hHalf = Multimodal.audioFingerprint(base.map(v => (v / 2).toShort))
    assert(hOffset == h0, "DC offset must not change a single bit")
    assert(hHalf == h0, "exact half volume must not change a single bit")
    // exact doubling (no truncation, no overflow): scales every AMDF
    // energy by 2, preserving every sign delta
    val quiet = base.map(v => (v / 4).toShort)
    val loud = quiet.map(v => (v * 2).toShort)
    assert(Multimodal.audioFingerprint(loud) == Multimodal.audioFingerprint(quiet),
      "exact volume doubling must not change a single bit")
    // polarity flip: |(-a)-(-b)| == |a-b|, so AMDF is negation-invariant
    // (a polarity-inverted re-recording is the same audio)
    assert(Multimodal.audioFingerprint(base.map(v => (-v).toShort)) == h0,
      "polarity inversion must not change a single bit")
  }

  test("audio fingerprint (m11): single-frame corruption is bounded by bit locality; different audio is far") {
    val base = Array.tabulate(1088)(k =>
      (2 * (((k * 307) % 16384) - 8192 + ((k * 113) % 8192) - 4096)).toShort)
    val h0 = Multimodal.audioFingerprint(base)
    // corrupting ONE 64-sample frame can only move bits of the two
    // transitions that touch it: frame t feeds bits (t-1)*4+b and
    // t*4+b for b=0..3 — at most 8 bits by construction
    val corrupted = base.clone()
    (8 * 64 until 9 * 64).foreach(i => corrupted(i) = 0)
    val hc = Multimodal.audioFingerprint(corrupted)
    val d = java.lang.Long.bitCount(h0 ^ hc)
    assert(d <= 8, s"single-frame corruption must stay within its 8-bit locality, got $d")
    assert(d > 0, "inverting a whole frame should move at least one bit")
    // a genuinely different waveform lands far
    val other = Array.tabulate(1088)(k =>
      (2 * (((k * 331) % 16384) - 8192 + ((k * 127) % 8192) - 4096)).toShort)
    val far = java.lang.Long.bitCount(h0 ^ Multimodal.audioFingerprint(other))
    assert(far > 3, s"different audio must not pass the near-dup gate, got $far")
  }

  test("audio near-dup (m11): every planted twin pair is recovered at hamming 0 through the codec seam") {
    val res = graft.SparkEntry.queries("m11_audio_fingerprint")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val planted = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0)).filter(_ % 5 == 0)
    planted.foreach { id =>
      assert(res.get((id, id + 10000000L)).contains(0L),
        s"half-volume twin of $id must be found at hamming 0")
      assert(res.get((id, id + 20000000L)).contains(0L),
        s"DC-offset twin of $id must be found at hamming 0")
      assert(res.get((id + 10000000L, id + 20000000L)).contains(0L),
        s"the two twins of $id are mutual dups")
    }
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("record linkage (d20): single-edit records link to their true entity; reversed never link") {
    val truth = graft.Tables.part(spark, sfDir)
      .select("p_partkey", "p_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = graft.SparkEntry.queries("d20_record_linkage")(spark, sfDir).collect()
    assert(out.length == truth.size)
    out.foreach { r =>
      val key = r.getLong(0) - 10000000L
      if (key % 5 == 0) {
        // the reversed-adjective class is corrupted beyond the threshold
        assert(r.isNullAt(1), s"reversed-adjective record $key linked to ${r.get(1)}")
      } else {
        // one deleted character: must link, to an entity with the TRUE name
        assert(!r.isNullAt(1), s"single-edit record $key failed to link")
        assert(r.getString(2) == truth(key),
          s"record $key linked to '${r.getString(2)}', truth '${truth(key)}'")
        assert(r.getLong(3) >= 550 && r.getLong(3) <= 1000)
      }
    }
  }

  test("paragraph dedup (d21): full local replay of global-first dominance and the scrub hash") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val inst = docs.flatMap { case (id, t) =>
      val ws = t.trim.split(" ")
      (0 until ws.length / 4).map(i => (id, i.toLong, ws.slice(i * 4, i * 4 + 4).mkString(" ")))
    }
    val firstOf = inst.groupBy(_._3).map { case (c, xs) =>
      c -> xs.map(x => (x._1, x._2)).min }
    val expected = inst.groupBy(_._1).map { case (id, xs) =>
      val kept = xs.filter(x => firstOf(x._3) == ((x._1, x._2))).sortBy(_._2).map(_._3)
      id -> ((xs.length.toLong, (xs.length - kept.length).toLong, md5hex(kept.mkString(" "))))
    }
    val got = graft.SparkEntry.queries("d21_paragraph_dedup")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got == expected)
    // the corpus really exercises the operator: natural cross-doc dups exist
    assert(expected.values.map(_._2).sum > 0, "no duplicate chunks in the corpus")
  }

  test("range join (q52): binned equi-join == local BETWEEN reference, plan has no nested-loop join") {
    val cents = graft.Tables.orders(spark, sfDir).select("o_totalprice").collect()
      .map(r => java.math.BigDecimal.valueOf(r.getDouble(0))
        .setScale(2, java.math.RoundingMode.HALF_UP).movePointRight(2).longValueExact())
    val bands = (0 until 48).map { b =>
      val lo = b.toLong * b * 20000L + (b % 7) * 137000L
      (b.toLong, lo, lo + (3L + (b * 13) % 29) * 60000L)
    }
    val expected = bands.map { case (id, lo, hi) =>
      val m = cents.filter(c => c >= lo && c <= hi)
      (id, lo, hi, m.length.toLong, m.sum)
    }
    val df = graft.SparkEntry.queries("q52_range_join")(spark, sfDir)
    val got = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    // the whole point of binning: value-vs-range resolves as a HASH join
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a nested-loop plan:\n$plan")
  }

  test("Misra-Gries (x17): deficit bound, heavy-hitter superset, exact below capacity") {
    val docs = graft.Tables.documents(spark, sfDir)
    val words = docs.select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .collect().map(_.getString(0))
    val exact = words.groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val n = words.length.toLong
    // the production read (all tracked keys, k = 8): one-sided estimates
    // within the deficit radius, exact witness column correct
    val out = Sketching.misraGriesTopK(docs, k = 8).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty && out.length <= 8)
    out.foreach { case (w, est, ex, maxDef) =>
      assert(ex == exact(w), s"witness column wrong for $w")
      assert(est <= ex, s"$w overcounted: est $est > exact $ex")
      assert(ex - est <= maxDef, s"$w deficit ${ex - est} > n/(k+1) = $maxDef")
      assert(maxDef == n / 9)
    }
    // frequent-items contract: every key with exact > n/(k+1) is tracked
    val tracked = out.map(_._1).toSet
    exact.filter(_._2 > n / 9).keys.foreach(w =>
      assert(tracked(w), s"heavy hitter $w (exact ${exact(w)}) missing from the sketch"))
    // the DRIVER frame (misraGriesVerified, k = 40): rows are exactly the
    // provably-tracked set, within_bounds true for every one — what the
    // DuckDB oracle pins, re-checked here against local exact counts
    val frame = graft.SparkEntry.queries("x17_misra_gries")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(frame.nonEmpty)
    assert(frame.map(_._1).toSet == exact.filter(_._2 > n / 41).keySet,
      "driver frame rows must be exactly the guaranteed-tracked set")
    frame.foreach { case (w, ex, maxDef, ok) =>
      assert(ex == exact(w) && maxDef == n / 41 && ok, s"driver frame row broken: $w")
    }
    // below capacity (k = 64 > vocabulary): Misra-Gries degrades to EXACT counts
    val full = Sketching.misraGriesTopK(docs, k = 64).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(full.length == exact.size)
    full.foreach { case (w, est, ex) => assert(est == ex && ex == exact(w), s"$w: $est != $ex") }
  }

  test("media sniff (m14): types real codec output, hand-built headers, and survives garbage") {
    import graft.operators.{Multimodal => M}
    // real encoders round-trip their planted headers
    assert(M.sniffMedia(ImageCodec.encodeGrayPng(5, 3)((x, y) => (x + y) % 256)) == (("png", 5L, 3L)))
    assert(M.sniffMedia(AudioCodec.encodePcm16Wav(11025, 2, new Array[Short](64))) == (("wav", 2L, 11025L)))
    assert(M.sniffMedia(VideoCodec.encodeAvi(Seq.fill(4)(Array.tabulate(10)(_.toByte)))) == (("avi", 4L, 0L)))
    // hand-built fixed-offset headers for the formats without an encoder here
    val gif = "GIF89a".getBytes("US-ASCII") ++ Array[Byte](7, 0, 5, 0) ++ new Array[Byte](8)
    assert(M.sniffMedia(gif) == (("gif", 7L, 5L)))
    val bmp = new Array[Byte](26)
    bmp(0) = 'B'; bmp(1) = 'M'; bmp(18) = 9; bmp(22) = 4
    assert(M.sniffMedia(bmp) == (("bmp", 9L, 4L)))
    // a SOS-without-SOF or truncated marker stream still types as jpeg (0, 0)
    assert(M.sniffMedia(Array(0xff, 0xd8, 0xff, 0xe0).map(_.toByte)) == (("jpeg", 0L, 0L)))
    // the SOF walk recovers dims from REAL JDK encoder output (baseline
    // SOF0) — the dims no longer stop at typed-only
    assert(M.sniffMedia(ImageCodec.encodeGrayJpeg(17, 6)((x, y) => (x * y) % 256)) ==
      (("jpeg", 17L, 6L)))
    assert(M.sniffMedia(ImageCodec.encodeGrayJpeg(1, 1)(_ + _)) == (("jpeg", 1L, 1L)))
    // a jpeg whose marker stream desyncs mid-walk keeps the type, dims 0
    val jfull = ImageCodec.encodeGrayJpeg(9, 4)((x, y) => (x + y) % 256)
    assert(M.sniffMedia(jfull.take(6))._1 == "jpeg", "truncated JPEG must not crash")
    // mp3: frame-header parse, with and without an ID3v2 tag in front
    assert(M.sniffMedia(M.encodeMp3Header(9, 1)) == (("mp3", 128L, 48000L)))
    assert(M.sniffMedia(M.encodeMp3Header(14, 0)) == (("mp3", 320L, 44100L)))
    val id3 = "ID3".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0, 0, 0, 5) ++
      new Array[Byte](5) ++ M.encodeMp3Header(5, 2)
    assert(M.sniffMedia(id3) == (("mp3", 64L, 32000L)), "ID3v2 tag must be skipped")
    // a free-format/invalid bitrate index is not typed (never guessed)
    val badMp3 = M.encodeMp3Header(1, 0); badMp3(2) = 0x00
    assert(M.sniffMedia(badMp3)._1 == "unknown")
    // mp4: tkhd box walk recovers the 16.16-fixed dims; truncated boxes degrade
    assert(M.sniffMedia(M.encodeMp4Header(640, 360)) == (("mp4", 640L, 360L)))
    assert(M.sniffMedia(M.encodeMp4Header(640, 360).take(20))._1 == "mp4",
      "ftyp alone still types the container")
    // garbage, truncation, and text all degrade to unknown — never throw
    assert(M.sniffMedia("just some text".getBytes("UTF-8"))._1 == "unknown")
    assert(M.sniffMedia(Array[Byte]())._1 == "unknown")
    val png = ImageCodec.encodeGrayPng(5, 3)((x, y) => (x + y) % 256)
    assert(M.sniffMedia(png.take(10))._1 == "unknown", "truncated PNG header must not crash")
    assert(M.sniffMedia("RIFF1234WAVE".getBytes("US-ASCII"))._1 == "unknown",
      "WAV without an fmt chunk is not typed")
    // an AVI whose LIST chunk declares len=2 at the very end of the
    // buffer passes Riff.walk's range check (2 <= remaining) but the
    // handler's unconditional 4-byte Riff.tag read underflows — this
    // threw BufferUnderflowException before the NonFatal catch; malformed
    // containers must degrade, not crash the task
    val badAvi = "RIFF".getBytes("US-ASCII") ++ Array[Byte](14, 0, 0, 0) ++
      "AVI LIST".getBytes("US-ASCII") ++ Array[Byte](2, 0, 0, 0) ++ Array[Byte](1, 2)
    assert(M.sniffMedia(badAvi)._1 == "unknown", "malformed AVI LIST must degrade to unknown")
    // an overlong LIST length is rejected by the walker itself and the
    // payload stays typed as avi with zero frames (no crash either way)
    val overAvi = "RIFF".getBytes("US-ASCII") ++ Array[Byte](36, 0, 0, 0) ++
      "AVI LIST".getBytes("US-ASCII") ++ Array[Byte](100, 0, 0, 0) ++ Array[Byte](1, 2)
    assert(M.sniffMedia(overAvi) == (("avi", 0L, 0L)))
    // truncated real AVI bytes likewise degrade instead of underflowing
    val avi = VideoCodec.encodeAvi(Seq.fill(2)(Array.tabulate(8)(_.toByte)))
    assert(M.sniffMedia(avi.take(30))._1 == "unknown" || M.sniffMedia(avi.take(30))._1 == "avi")
  }

  test("token fertility (t30): per-language sums partition the corpus totals") {
    val rows = graft.SparkEntry.queries("t30_token_fertility")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // the language classes PARTITION the corpus: per-lang sums re-add to
    // the unclassified whole-corpus totals (no doc dropped or counted twice)
    val docs = graft.Tables.documents(spark, sfDir)
    val total = docs.select(
      sum(size(split(lower(trim(col("text"))), "\\s+")).cast("long")).as("w"),
      sum(col("doc_id") * 0 + 1).as("n")).head()
    assert(rows.map(_.getLong(1)).sum == total.getLong(1), "doc counts don't partition")
    assert(rows.map(_.getLong(2)).sum == total.getLong(0), "word counts don't partition")
    // fertility is tokens-per-word: the BPE estimate emits >= 1 token per
    // non-empty word, so fertility_bpe >= ~1 for any real class
    rows.foreach { r =>
      assert(r.getDouble(6) >= 0.9, s"${r.getString(0)}: fertility_bpe ${r.getDouble(6)} < 0.9")
    }
  }

  test("ngram novelty (t31): planted verbatim duplicate scores 0, unique text scores 100") {
    import spark.implicits._
    val uniq = (1 to 12).map(i => s"unique$i").mkString(" ")
    val dupText = (1 to 12).map(i => s"mirror$i").mkString(" ")
    val docs = Seq(
      (1L, uniq),            // every gram df==1 -> novelty 100
      (2L, dupText),         // verbatim pair -> every gram df==2 -> novelty 0
      (3L, dupText),
      (4L, "too short")      // < 8 tokens -> 0 grams, not mostly_duplicated
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.ngramNovelty(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(out(1L)._3 == 100.0 && !out(1L)._4)
    assert(out(2L)._3 == 0.0 && out(2L)._4, s"verbatim dup must be mostly_duplicated: ${out(2L)}")
    assert(out(3L)._3 == 0.0 && out(3L)._4)
    assert(out(4L) == ((0L, 0L, 0.0, false)), "gram-free doc is not flagged")
  }

  test("prefix-filtered jaccard join equals d3's bucketed all-pairs output exactly") {
    // the Bayardo et al. 2007 prefix filter is provably lossless for
    // J >= t — same pairs, same scores, different candidate generation
    // (equi-join on rare prefix grams vs within-bucket all-pairs). The
    // benched d3 keeps the bucket join for THIS fixture's saturated
    // gram space (measured crossover in the d3 comment); this spec pins
    // the high-entropy-regime twin output-identical.
    val docs = graft.Tables.documents(spark, sfDir)
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    val allPairs = graft.SparkEntry.queries("d3_dedup_ngram_jaccard")(spark, sfDir)
      .collect().map(key).toSet
    val prefixed = graft.operators.Dedup.ngramJaccardPrefixFiltered(docs)
      .collect().map(key).toSet
    assert(allPairs.nonEmpty, "fixture must contain near-dup pairs")
    assert(prefixed == allPairs, "prefix filter dropped or invented pairs")
  }

  test("d3 auto-selection: saturated fixture picks the bucket join, " +
      "high-entropy corpus picks the prefix filter; outputs agree in both regimes") {
    import spark.implicits._
    import graft.operators.Dedup
    // the fixture's gram space is SATURATED (985 grams, median df ~0.1·n
    // — the measured bucket-join regime)
    val fixture = graft.Tables.documents(spark, sfDir)
    val (mdF, nF) = Dedup.gramDfStats(fixture)
    assert(!Dedup.pickPrefixFilter(mdF, nF),
      s"fixture (median df $mdF of $nF docs) must pick the measured-cheaper bucket join")
    // a HIGH-ENTROPY corpus: seeded hex text — 4-grams are near-unique,
    // the measured prefix-filter regime. One planted exact dup keeps the
    // output-equality check non-vacuous.
    val rnd = new scala.util.Random(41)
    def hexDoc(): String =
      (0 until 16).map(_ => java.lang.Long.toHexString(rnd.nextLong() & Long.MaxValue))
        .mkString(" ")
    val texts = (1L to 200L).map(id => (id, hexDoc()))
    val hi = (texts :+ ((201L, texts.head._2)))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
    val (mdH, nH) = Dedup.gramDfStats(hi)
    assert(Dedup.pickPrefixFilter(mdH, nH),
      s"high-entropy corpus (median df $mdH of $nH docs) must pick the prefix filter")
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    val bucketed = Dedup.ngramJaccardBucketed(hi).collect().map(key).toSet
    val prefixed = Dedup.ngramJaccardPrefixFiltered(hi).collect().map(key).toSet
    val auto = Dedup.ngramJaccardAuto(hi).collect().map(key).toSet
    assert(bucketed.contains((1L, 201L, 1.0)), "planted dup must surface")
    assert(prefixed == bucketed && auto == prefixed,
      "all three spellings must agree in the high-entropy regime")
  }

  test("dedup rates (d24): planted duplicates move exactly the right counter") {
    import spark.implicits._
    // 4 raw docs: one exact pair (whitespace variant — normalized dup),
    // one NFC pair (e + combining acute vs precomposed), one unique.
    // norm-distinct = 3 (ws pair collapses; NFC variants differ in raw
    // bytes), nfc-distinct = 3 (NFC pair collapses, ws pair does NOT —
    // NFC does not touch whitespace)
    val docs = Seq(
      (1L, "same doc  here"),
      (2L, "same doc here"),
      (3L, "café text"), // precomposed é
      (4L, "café text") // e + combining acute: NFC-equal, byte-different
    ).toDF("doc_id", "text")
    val r = graft.operators.Dedup.dedupRates(docs).head()
    assert(r.getLong(0) == 4L)
    assert(r.getLong(1) == 3L, s"norm-distinct: $r")
    assert(r.getLong(2) == 3L, s"nfc-distinct: $r")
    assert(r.getDouble(3) == 25.0 && r.getDouble(4) == 25.0, s"rates: $r")
  }

  test("contamination share (d23): severity classes from planted benchmark overlap") {
    import spark.implicits._
    val bench = (1 to 20).map(i => s"bench$i").mkString(" ")
    val quote = (1 to 8).map(i => s"bench$i").mkString(" ") // exactly one bench 8-gram
    val docs = Seq(
      (0L, bench),                                         // the benchmark slice (id%20==0)
      (1L, bench),                                         // verbatim benchmark copy -> saturated
      (2L, quote + " " + (1 to 30).map(i => s"own$i").mkString(" ")), // one quoted gram -> trace
      (3L, (1 to 15).map(i => s"clean$i").mkString(" "))   // no overlap -> clean
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup
      .contaminationShare(docs, col("doc_id") % 20 === 0).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(4))).toMap
    assert(out(1L)._3 == "saturated", s"verbatim copy: ${out(1L)}")
    assert(out(1L)._1 == out(1L)._2, "every gram of a verbatim copy is shared")
    assert(out(2L)._2 == 1L && out(2L)._3 == "trace", s"single quoted gram: ${out(2L)}")
    assert(out(3L) == ((8L, 0L, "clean")), s"clean doc: ${out(3L)}")
  }

  test("randomized references (seeded): ewma fold and byte-class partition match plain Scala") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // ewma: 40 users, 1..12 values each, scrambled arrival — the operator
    // must match the plain iterative fold BIT-identically (dyadic alpha)
    val events = (1L to 40L).flatMap { u =>
      val n = 1 + rnd.nextInt(12)
      (0 until n).map(i => (u * 100 + i, u, math.floor(rnd.nextDouble() * 1e6) / 100.0))
    }
    val shuffled = rnd.shuffle(events)
    val got = graft.operators.Relational.ewmaByUser(
        shuffled.toDF("event_id", "user_id", "value"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val expected = events.groupBy(_._2).map { case (u, rows) =>
      val vs = rows.sortBy(_._1).map(_._3)
      val s = vs.tail.foldLeft(vs.head)((acc, x) => (acc + x) / 2.0)
      u -> (vs.length.toLong, math.floor(s * 10000.0 + 0.5) / 10000.0)
    }
    assert(got == expected, "ewma diverges from the iterative reference")
    // byte stats: 60 random blobs — the three class counts always
    // partition the length, and the class matches a plain Scala count
    val blobs = (1L to 60L).map { id =>
      val n = rnd.nextInt(300)
      (id, Array.fill(n)(rnd.nextInt(256).toByte))
    }
    val out = graft.operators.Multimodal.payloadByteStats(blobs.toDF("doc_id", "payload"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))).toMap
    blobs.foreach { case (id, bytes) =>
      val pr = bytes.count(b => { val v = b & 0xff; (v >= 0x20 && v <= 0x7e) || v == 9 || v == 10 || v == 13 }).toLong
      val hb = bytes.count(b => (b & 0xff) >= 0x80).toLong
      val ctl = bytes.length - pr - hb
      val cls = if (bytes.isEmpty) "empty" else if (pr * 100 >= 95 * bytes.length) "text" else "binary"
      assert(out(id) == ((bytes.length.toLong, pr, ctl, hb, cls)), s"blob $id: ${out(id)}")
    }
  }

  test("iqr outliers (q54): hand-computed fences flag exactly the planted extremes") {
    import spark.implicits._
    // 11 values 1..11 (q1 = 3.5, q3 = 8.5 under (1-f)lo+f hi interpolation,
    // IQR = 5, fences [-4, 16]) plus two planted extremes
    val vals = (1 to 11).map(_.toDouble) ++ Seq(100.0, -50.0)
    val events = vals.zipWithIndex.map { case (v, i) => (i.toLong, "click", v) }
      .toDF("event_id", "event_type", "value")
    val out = graft.operators.Relational.iqrOutliers(events).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 13L)
    // fences recomputed over the 13 values: q1 = 3.0, q3 = 9.0 (13-point
    // ranks land on integers), IQR = 6 -> [-6, 18]: only 100 and -50 fall out
    assert(r.getDouble(2) == 3.0 && r.getDouble(3) == 9.0, s"fences: $r")
    assert(r.getLong(4) == 2L, s"outlier count: $r")
  }

  test("ts subsequence top-k (q56): hand-computed windows, stride alignment, completeness, ties") {
    import spark.implicits._
    import graft.operators.Relational
    // user 1: values = position (1..10); user 2: an EXACT copy of the
    // query pattern planted at positions 5..8 (start 5 is stride-aligned
    // for stride 4: starts 1, 5); user 3: only 3 events — NO complete
    // window, must not appear. Arrival order scrambled: ordering is by
    // event_id, never arrival.
    val q = Seq(2.0, 4.0, 6.0, 8.0)
    val rows =
      (1 to 10).map(i => (1L, i.toLong, i.toDouble)) ++
      Seq((2L, 1L, 9.0), (2L, 2L, 9.0), (2L, 3L, 9.0), (2L, 4L, 9.0),
        (2L, 5L, 2.0), (2L, 6L, 4.0), (2L, 7L, 6.0), (2L, 8L, 8.0)) ++
      Seq((3L, 1L, 1.0), (3L, 2L, 1.0), (3L, 3L, 1.0))
    val events = new scala.util.Random(5).shuffle(rows)
      .toDF("user_id", "event_id", "value")
    val out = Relational.tsSubsequenceTopK(events, q, stride = 4, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // complete stride-aligned windows: u1 starts 1 (1,2,3,4), 5 (5,6,7,8);
    // u2 starts 1 (9,9,9,9), 5 (2,4,6,8). Hand distances to (2,4,6,8):
    // u1s1: 1+4+9+16=30; u1s5: 9+4+1+0=14; u2s1: 49+25+9+1=84; u2s5: 0.
    assert(out.toSeq == Seq((2L, 5L, 0.0), (1L, 5L, 14.0), (1L, 1L, 30.0),
      (2L, 1L, 84.0)), s"got ${out.toSeq}")
    assert(!out.exists(_._1 == 3L), "incomplete windows must be filtered")
    // tie-break: two identical windows order by (user_id, start)
    val tie = Seq((1L, 1L, 5.0), (1L, 2L, 5.0), (2L, 1L, 5.0), (2L, 2L, 5.0))
      .toDF("user_id", "event_id", "value")
    val t = Relational.tsSubsequenceTopK(tie, Seq(5.0, 5.0), stride = 1, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(t.toSeq == Seq((1L, 1L), (2L, 1L)), s"tie order: ${t.toSeq}")
  }

  test("ts motif (q58): planted repeat wins, overlapping repeats are excluded, triangle spread is lossless") {
    import spark.implicits._
    import graft.operators.Relational
    val L = 4
    // user 1: pattern P at starts 1 and 9 (NON-overlapping, stride-4
    // aligned) with noise between — the motif, exact dist 0. user 2:
    // an identical pair only at OVERLAPPING starts 1 and... stride 4 <
    // L=4? starts differ by 4 -> s2 = s1+4 >= s1+L: 4-aligned windows
    // at distance exactly L are ADJACENT (non-overlapping) — so plant
    // the near-identical pair at starts 1 and 5 and a FAR pair after,
    // asserting adjacency counts as non-overlap (>= s1 + L).
    val p = Seq(5.0, 1.0, 4.0, 2.0)
    val u1 = (p ++ Seq(9.0, 9.0, 0.0, 3.0) ++ p).zipWithIndex
      .map { case (v, i) => (1L, (i + 1).toLong, v) }
    val u2 = (p ++ p ++ Seq(100.0, -100.0, 50.0, -50.0)).zipWithIndex
      .map { case (v, i) => (2L, (i + 1).toLong, v) }
    val out = Relational.tsMotifPerUser(
        (u1 ++ u2).toDF("user_id", "event_id", "value"), L, stride = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((1L, 1L, 9L, 0.0), (2L, 1L, 5L, 0.0)), s"got ${out.toSeq}")
    // triangle spread is LOSSLESS at any bucket count: same answer for
    // B in {1, 2, 4, 7}
    Seq(1, 2, 7).foreach { bkt =>
      val o2 = Relational.tsMotifPerUser(
          (u1 ++ u2).toDF("user_id", "event_id", "value"), L, stride = 4, buckets = bkt)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(o2.toSeq == out.toSeq, s"B=$bkt diverged: ${o2.toSeq}")
    }
    // a user with a single window emits nothing (no pair exists)
    val solo = Relational.tsMotifPerUser(
      (1 to 4).map(i => (9L, i.toLong, i.toDouble)).toDF("user_id", "event_id", "value"),
      L, stride = 4)
    assert(solo.count() == 0)
  }

  test("matrix profile (q59): per-user minima reproduce q58's motif exactly; both endpoints profiled; triangle lossless") {
    import spark.implicits._
    import graft.operators.Relational
    // the sf0.001 events table is the honest fixture: real per-user
    // series, many windows, float values — if q59's minima diverge from
    // q58 ANYWHERE (fold order, tie-break, exclusion bound, mirroring),
    // the exact comparison below catches it
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val profile = Relational.tsMatrixProfile(events, L = 8, stride = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val motif = Relational.tsMotifPerUser(events, L = 8, stride = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // q59 minima -> canonical (s1 < s2) pairs == q58's rows, bit-exact
    val minima = profile.groupBy(_._1).map { case (u, rows) =>
      val best = rows.map { case (_, s, nn, d) =>
        (d, math.min(s, nn), math.max(s, nn)) }.min
      (u, best._2, best._3, best._1)
    }.toSeq.sortBy(_._1)
    assert(minima == motif, s"profile minima != motif:\n$minima\nvs\n$motif")
    // every window appears at most once, and BOTH endpoints of the best
    // pair carry their distance (the mirror step)
    assert(profile.map(r => (r._1, r._2)).distinct.length == profile.length)
    motif.foreach { case (u, s1, s2, d) =>
      val p1 = profile.find(r => r._1 == u && r._2 == s1).get
      val p2 = profile.find(r => r._1 == u && r._2 == s2).get
      assert(p1._4 == d && p2._4 == d, s"endpoints of motif ($u,$s1,$s2) disagree")
    }
    // triangle spread lossless at any bucket count
    Seq(1, 7).foreach { bkt =>
      val o2 = Relational.tsMatrixProfile(events, L = 8, stride = 4, buckets = bkt)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(o2.sorted.toSeq == profile.sorted.toSeq, s"B=$bkt diverged")
    }
  }

  test("sampled profile (q72): E=1 IS the exact profile; every E is one-sided and covers a diagonal-lattice subset") {
    import graft.operators.Relational
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val exact = Relational.tsMatrixProfile(events, L = 8, stride = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // E=1 keeps every diagonal: the sampled operator degenerates to the
    // exact profile bit-for-bit (same argmin, same tie-break)
    val e1 = Relational.tsMatrixProfileSampled(events, L = 8, stride = 4,
      sampleEvery = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(e1 == exact, "E=1 must equal the exact profile")
    // every coarser lattice: one-sided per window (dist_est >= true dist),
    // nn on the stride grid, and the kept diagonals on the E-lattice
    Seq(2, 4, 8).foreach { e =>
      val est = Relational.tsMatrixProfileSampled(events, L = 8, stride = 4,
        sampleEvery = e).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(est.nonEmpty, s"E=$e produced no rows")
      est.foreach { case (u, s, nn, dEst) =>
        val (_, dTrue) = exact((u, s))
        assert(dEst >= dTrue,
          s"E=$e violates one-sidedness at ($u,$s): est $dEst < true $dTrue")
        val gap = math.abs(nn - s)
        assert(gap >= 8 && (gap - 8) % (4L * e) == 0,
          s"E=$e neighbor off the diagonal lattice at ($u,$s): gap $gap")
      }
      // coverage shrinks monotonically with E but stays a subset of the
      // exact window set
      assert(est.map(r => (r._1, r._2)).toSet.subsetOf(exact.keySet))
    }
  }

  test("published ts-profile artifact (q68): audit admits the honest build and rejects torn bytes") {
    import graft.operators.{Publish, Relational}
    val root = java.nio.file.Files.createTempDirectory("graft-tsprofile-spec").toString
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val r = Relational.publishTsProfile(events, root, token = "spec-v1",
      L = 8, stride = 4)
    assert(r.published && r.version.contains(1L), s"honest publish failed: $r")
    // the stored bytes ARE q59: bit-exact round trip
    val stored = Relational.readTsProfile(spark, root).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3))).sorted.toSeq
    val direct = Relational.tsMatrixProfile(events, L = 8, stride = 4).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3))).sorted.toSeq
    assert(stored == direct, "artifact bytes diverge from the direct profile")
    // read-path consumers == direct operators, bit-exact (the r15
    // done-criterion: direct operators unchanged, reads equivalent)
    val cacRead = Relational.flussCacFromProfile(
      Relational.readTsProfile(spark, root)
        .select(col("user_id"), col("start"), col("nn_start"))).collect()
      .map(_.toSeq).sortBy(_.toString).toSeq
    val cacDirect = Relational.tsFlussCac(events, L = 8, stride = 4).collect()
      .map(_.toSeq).sortBy(_.toString).toSeq
    assert(cacRead == cacDirect, "CAC read path diverges from the direct operator")
    // the audit is LIVE, not vacuously green — every contract clause
    // quarantines a deliberately corrupted candidate while the pointer
    // stays put (tsProfileAudit exposed for exactly this)
    val audit = Relational.tsProfileAudit(events, L = 8, stride = 4)
    val good = Relational.readTsProfile(spark, root)
    def rejected(tag: String, frame: org.apache.spark.sql.DataFrame): Unit = {
      val badRoot = java.nio.file.Files.createTempDirectory(s"graft-tsp-$tag").toString
      val res = Publish.writeAuditPublish(frame, s"$badRoot/profile", audit, tag)
      assert(!res.published, s"$tag: corrupted profile published anyway")
      assert(res.violations.nonEmpty, s"$tag: quarantine carried no violation rows")
    }
    rejected("offgrid", good.withColumn("start", col("start") + 1))
    rejected("overlap", good.withColumn("nn_start", col("start")))
    rejected("negdist", good.withColumn("dist", lit(-1.0)))
    rejected("dropped", good.limit(5)) // one-row-per-admissible-window count
  }

  test("ts-profile refresh (q73): stripe min-merge == full rebuild bit-exactly, incl. users absent from v1") {
    import graft.operators.{Publish, Relational}
    val root = java.nio.file.Files.createTempDirectory("graft-tsrefresh-spec").toString
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    // history = first half of EVEN users only: odd users appear ONLY in
    // the arrivals (the new-user edge: no stripe floor for them — the
    // refresh must compute their full pair space)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("event_id"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    val hist = events.withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(wAll))
      .filter(col("user_id") % 2 === 0 && col("rn") * 2 <= col("cnt"))
      .drop("rn", "cnt")
    val r1 = Relational.publishTsProfile(hist, root, token = "v1", L = 8, stride = 4)
    assert(r1.published && r1.version.contains(1L), s"v1 publish failed: $r1")
    val r2 = Relational.refreshTsProfile(spark, root, events, token = "v2",
      L = 8, stride = 4)
    assert(r2.published && r2.version.contains(2L), s"refresh failed: $r2")
    val refreshed = Relational.readTsProfile(spark, root).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3))).sorted.toSeq
    val rebuilt = Relational.tsMatrixProfile(events, L = 8, stride = 4).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3))).sorted.toSeq
    assert(refreshed == rebuilt,
      "refreshed artifact diverges from the from-scratch rebuild")
    // v1 stays readable (time travel) and is a strict subset-by-key of v2
    val v1Keys = Publish.readPublishedAt(spark, s"$root/profile", 1L).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val v2Keys = refreshed.map(x => (x._1, x._2)).toSet
    assert(v1Keys.subsetOf(v2Keys), "refresh dropped published windows")
    assert(v2Keys.size > v1Keys.size, "refresh added no windows on a grown series")
  }

  test("discord top-k (q61): the planted anomaly window ranks first; discords are the profile maxima") {
    import spark.implicits._
    import graft.operators.Relational
    val L = 4
    // user 1: three near-identical calm windows + ONE planted spike
    // window (start 9) — every window's nearest neighbor is calm-vs-calm
    // EXCEPT the spike's, whose best neighbor is still far: the discord
    val calm = Seq(1.0, 2.0, 1.0, 2.0)
    val rows = (calm ++ calm ++ Seq(90.0, -80.0, 70.0, -60.0) ++ calm).zipWithIndex
      .map { case (v, i) => (1L, (i + 1).toLong, v) }
    val out = Relational.tsDiscordTopK(rows.toDF("user_id", "event_id", "value"),
        L, stride = 4, k = 2)
      .collect().map(r => (r.getLong(1), r.getDouble(3)))
    assert(out.head._1 == 9L, s"planted anomaly must be the top discord: ${out.toSeq}")
    assert(out.head._2 > out.last._2, "discord ordering must be distance-descending")
    // equals the profile's maxima exactly (same frame, one reduction)
    val profMax = Relational.tsMatrixProfile(
        rows.toDF("user_id", "event_id", "value"), L, stride = 4)
      .collect().map(r => (r.getLong(1), r.getDouble(3))).maxBy(_._2)
    assert(out.head == profMax)
  }

  test("znorm matrix profile (q60): STOMP identity matches the direct z-fold; affine pairs score ~0; flat conventions hold") {
    import spark.implicits._
    import graft.operators.Relational
    val L = 4
    // user 1: window at start 5 is an AFFINE copy (3x + 11) of the
    // window at start 1 — raw distance is large, z-norm distance ~0 and
    // they must be each other's nearest neighbors; user 2: one flat
    // window among live ones (flat-vs-live convention = L)
    val p = Seq(2.0, 7.0, 1.0, 5.0)
    val rows =
      (p ++ p.map(x => 3.0 * x + 11.0) ++ Seq(50.0, -9.0, 14.0, 3.0)).zipWithIndex
        .map { case (v, i) => (1L, (i + 1).toLong, v) } ++
      (Seq(6.0, 6.0, 6.0, 6.0) ++ p).zipWithIndex
        .map { case (v, i) => (2L, (i + 1).toLong, v) }
    val df = rows.toDF("user_id", "event_id", "value")
    val out = Relational.tsZnormMatrixProfile(df, L, stride = 4).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(out((1L, 1L))._1 == 5L && math.abs(out((1L, 1L))._2) < 1e-9,
      s"affine pair must be ~0: ${out((1L, 1L))}")
    assert(out((1L, 5L))._1 == 1L && math.abs(out((1L, 5L))._2) < 1e-9)
    // user 2: flat window vs live window = L (the q57 convention)
    assert(out((2L, 1L)) == ((5L, L.toDouble)), s"flat-vs-live: ${out((2L, 1L))}")
    // identity cross-check on REAL data: the QT-identity distance equals
    // the direct z-fold ((z1-z2)^2 summed) within float tolerance for
    // every profiled window (r4 keys quantize at 1e-4; assert well under)
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val viaIdentity = Relational.tsZnormMatrixProfile(events, L = 8, stride = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    val zn = Relational.znormSeq _
    // direct per-user replay in Scala: windows, z-normalize, pairwise
    val series = events.select(col("user_id"), col("event_id"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    var checked = 0
    series.foreach { case (u, vs) =>
      val starts = (1 to vs.length by 4).filter(_ + 7 <= vs.length)
      val wins = starts.map(s => s.toLong -> zn(vs.slice(s - 1, s + 7))).toMap
      for (s1 <- starts; s2 <- starts; if s2 >= s1 + 8) {
        val d = wins(s1.toLong).zip(wins(s2.toLong))
          .map { case (a, b) => (a - b) * (a - b) }.sum
        val prof = viaIdentity.get((u, s1.toLong))
        if (prof.isDefined && prof.get._1 == s2.toLong) {
          // profile dists are r4-quantized (half-ULP 5e-5); the identity
          // itself must contribute well under that
          assert(math.abs(prof.get._2 - d) < 1e-4,
            s"identity vs direct fold diverged at ($u,$s1,$s2): ${prof.get._2} vs $d")
          checked += 1
        }
      }
    }
    assert(checked > 50, s"identity cross-check exercised only $checked pairs")
  }

  test("FLUSS segmentation (q64): the planted regime boundary is the CAC argmin; intra-regime arcs never cross it") {
    import spark.implicits._
    import graft.operators.Relational
    // user 1: pattern p1 repeated 10x (40 events) then a value-disjoint
    // p2 repeated 10x — stride(4) == pattern length, so every window
    // inside a regime is an exact copy of its regime-mates: all arcs
    // stay inside their regime (at most the one straddling window's arc
    // can cross) and the CAC curve dips to its global minimum at the
    // regime boundary (windows 0..8 are pure p1, index 9 straddles,
    // 10..18 are pure p2 -> boundary ~10)
    val p1 = Seq(1.0, 5.0, 2.0, 7.0)
    val p2 = Seq(9.0, 3.0, 8.0, 4.0)
    val vals = Seq.fill(10)(p1).flatten ++ Seq.fill(10)(p2).flatten
    val rows = vals.zipWithIndex.map { case (v, i) => (1L, (i + 1).toLong, v) }
    val out = Relational.tsFlussCac(
        rows.toDF("user_id", "event_id", "value"), L = 8, stride = 4)
      .collect().map(r => (r.getLong(1), r.getLong(3), r.getDouble(4)))
    assert(out.map(_._1).toSeq == (1L to 18L), s"boundaries 1..n-1: ${out.toSeq}")
    val minB = out.minBy(t => (t._3, t._1))._1
    assert(math.abs(minB - 10) <= 2,
      s"CAC argmin at $minB, expected ~10 (the regime flip): ${out.toSeq}")
    assert(out.minBy(_._3)._3 <= 0.2,
      s"regime-boundary CAC must dip: ${out.toSeq}")
    // crossings at the regime boundary: at most the straddler's one arc
    val atBoundary = out.find(_._1 == 10L).get
    assert(atBoundary._2 <= 1, s"arcs crossing the regime boundary: $atBoundary")
  }

  test("vector_sum_count: equals the posexplode mean spelling, skips nulls, rejects ragged input") {
    import spark.implicits._
    import graft.functions.VectorSumCount
    val vecs = (1 to 400).map { i =>
      (i % 7, Array.tabulate(16)(j => (i * 31 + j * 17 % 97).toDouble / 7.0)) }
      .toDF("g", "v").repartition(13) // force cross-partition merge + serialize
    val got = vecs.groupBy(col("g"))
      .agg(VectorSumCount(col("v")).as("sc"))
      .select(col("g"), transform(col("sc.vsum"), x => x / col("sc.n")).as("mean"),
        col("sc.n").as("n"))
      .collect().map(r => (r.getInt(0),
        r.getSeq[Double](1).toSeq, r.getLong(2))).sortBy(_._1)
    val want = vecs.select(col("g"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("g"), col("pos")).agg(avg(col("x")).as("mx"), count(lit(1)).as("c"))
      .groupBy(col("g"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("mx")))),
        e => e.getField("mx")).as("mean"), first(col("c")).as("n"))
      .collect().map(r => (r.getInt(0),
        r.getSeq[Double](1).toSeq, r.getLong(2))).sortBy(_._1)
    assert(got.length == want.length && got.zip(want).forall { case (a, b) =>
      a._1 == b._1 && a._3 == b._3 &&
        a._2.zip(b._2).forall { case (x, y) => math.abs(x - y) < 1e-9 }
    }, s"vector_sum_count mean diverged from posexplode avg")
    // null arrays are skipped (count excludes them)
    val withNull = Seq((1, Some(Array(1.0, 2.0))), (1, None), (1, Some(Array(3.0, 4.0))))
      .toDF("g", "v")
    val r = withNull.groupBy(col("g")).agg(VectorSumCount(col("v")).as("sc"))
      .select(col("sc.vsum"), col("sc.n")).head()
    assert(r.getSeq[Double](0) == Seq(4.0, 6.0) && r.getLong(1) == 2L)
    // ragged input fails fast, never silently truncates
    val ragged = Seq((1, Array(1.0, 2.0)), (1, Array(1.0, 2.0, 3.0))).toDF("g", "v")
    intercept[Exception] {
      ragged.groupBy(col("g")).agg(VectorSumCount(col("v")).as("sc")).collect()
    }
  }

  test("znorm subsequence top-k (q57): affine copies of the query score 0; constant windows don't NaN") {
    import spark.implicits._
    import graft.operators.Relational
    val q = Seq(1.0, 3.0, 2.0, 5.0)
    // user 1: the query SCALED and SHIFTED (10*q + 7) at start 1 — raw
    // Euclid would rank it far away, z-normalized distance is EXACTLY 0
    // (shape match, the operator's reason to exist); user 2: a constant
    // window (std = 0) must score ||q_z||^2 = L, never NaN; user 3: an
    // unrelated shape
    val rows =
      q.zipWithIndex.map { case (v, i) => (1L, (i + 1).toLong, 10.0 * v + 7.0) } ++
      (1 to 4).map(i => (2L, i.toLong, 42.0)) ++
      Seq((3L, 1L, 9.0), (3L, 2L, 1.0), (3L, 3L, 9.0), (3L, 4L, 1.0))
    val out = Relational.tsZnormSubsequenceTopK(
        rows.toDF("user_id", "event_id", "value"), q, stride = 4, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.head == ((1L, 1L, 0.0)), s"affine copy must score 0: ${out.toSeq}")
    val const = out.find(_._1 == 2L).get
    assert(const._3 == 4.0 && !const._3.isNaN,
      s"constant window must score ||q_z||^2 = L: $const")
    assert(out.length == 3 && out.forall(!_._3.isNaN))
    // znormSeq twin: mean 0, unit std (the fold the SQL replays)
    val z = Relational.znormSeq(q)
    assert(math.abs(z.sum) < 1e-12 &&
      math.abs(z.map(x => x * x).sum / q.size - 1.0) < 1e-12)
  }

  test("ewma by user (q53): hand-computed recursion, order pinned by event_id not arrival") {
    import spark.implicits._
    // user 1 in SCRAMBLED arrival order; event_id order is 4.0, 2.0, 8.0:
    // s = ((4+2)/2 + 8)/2 = 5.5 — a dyadic exact value
    val events = Seq(
      (30L, 1L, 8.0), (10L, 1L, 4.0), (20L, 1L, 2.0),
      (11L, 2L, 7.0)) // single event: ewma == the value itself
      .toDF("event_id", "user_id", "value")
    val out = graft.operators.Relational.ewmaByUser(events).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L) == ((3L, 5.5)), s"user 1: ${out(1L)}")
    assert(out(2L) == ((1L, 7.0)), s"user 2: ${out(2L)}")
  }

  test("payload byte stats (m15): real media classifies binary, text bytes classify text, null is empty") {
    import spark.implicits._
    import graft.operators.{Multimodal => M}
    val png = ImageCodec.encodeGrayPng(16, 16)((x, y) => (x * y * 7) % 256)
    val docs = Seq(
      (1L, png),
      (2L, "plain ascii text with tabs\tand\nnewlines, entirely printable.".getBytes("UTF-8")),
      (3L, null.asInstanceOf[Array[Byte]]),
      (4L, Array.tabulate(100)(i => (i % 256).toByte))) // control+highbit heavy
      .toDF("doc_id", "payload")
    val out = M.payloadByteStats(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))).toMap
    assert(out(1L)._5 == "binary", s"real PNG must class binary: ${out(1L)}")
    assert(out(2L)._5 == "text" && out(2L)._3 == 0L, s"printable bytes: ${out(2L)}")
    assert(out(3L) == ((0L, 0L, 0L, 0L, "empty")), "null payload degrades to empty")
    val (n, pr, ctl, hb, cls) = out(4L)
    assert(n == 100 && pr + ctl + hb == n && cls == "binary", s"counts must partition: ${out(4L)}")
    assert(hb == 0 && ctl == 32 - 3, s"0..99 bytes: 32 controls minus tab/LF/CR: ${out(4L)}")
  }

  test("windowed EWMA (q55) is bit-equal to the monolithic fold on the fixture corpus") {
    val events = graft.Tables.events(spark, sfDir)
    val maxId = events.agg(max(col("event_id"))).head.getLong(0)
    val span = math.max(1L, maxId / 8 + 1)
    // the fixture must genuinely exercise cross-window state folding:
    // several windows, and users whose history SPANS windows
    val nWindows = events.select(floor(col("event_id") / span)).distinct().count()
    assert(nWindows > 1, s"fixture spans only $nWindows window(s)")
    val spanning = events
      .select(col("user_id"), floor(col("event_id") / span).as("w")).distinct()
      .groupBy(col("user_id")).count().filter(col("count") > 1).count()
    assert(spanning > 0, "no user spans multiple windows")
    val mono = graft.operators.Relational.ewmaByUser(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val windowed = graft.operators.Relational.ewmaByUserWindowed(events, span)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(windowed == mono, "windowed fold diverges from the monolithic fold")
    // PATHOLOGICAL SPAN (the r13 verdict's clamp): span = 1 over the
    // full id range would be one driver-loop Spark job per event id —
    // the re-span clamp caps the loop at maxWindows and, because the
    // output is bit-equal for ANY span, the answer is unchanged
    val clamped = graft.operators.Relational
      .ewmaByUserWindowed(events, span = 1L, maxWindows = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(clamped == mono, "re-spanned fold diverges from the monolithic fold")
  }

  test("windowed EWMA: window gaps and late-starting users fold correctly") {
    import spark.implicits._
    val events = Seq(
      (0L, 1L, 4.0), (1L, 1L, 2.0), // user 1, window 0
      (9L, 1L, 8.0),                // user 1, window 3 — windows 1-2 are a gap
      (7L, 2L, 7.0))                // user 2 first appears in window 2
      .toDF("event_id", "user_id", "value")
    val out = graft.operators.Relational.ewmaByUserWindowed(events, span = 3L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L) == ((3L, 5.5)), s"user 1: ${out(1L)}") // ((4+2)/2 + 8)/2
    assert(out(2L) == ((1L, 7.0)), s"user 2: ${out(2L)}")
  }

  test("prefix-filtered jaccard twin holds at NON-default thresholds (unrounded size filter)") {
    // r10 advice: math.round(t*100) made the size-ratio filter STRICTER
    // than J >= t requires for t not a multiple of 0.01 (and double
    // rounding could shorten the prefix at exact-integer t*sz), breaking
    // the output-identical contract at boundary sizes. The reference here
    // is definitional: exact Jaccard over the same gram sets under the
    // same (lang, len-bucket) blocking, computed in plain Scala.
    val docs = graft.Tables.documents(spark, sfDir)
    val block = docs.select(col("doc_id"), col("lang"),
        floor(col("n_chars") / 100).as("b")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val gramSets = H.charGramIds(docs, lower(col("text")), 4)
      .select(col("doc_id"), col("g"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (id, g) => id -> g.map(_._2).toSet }
    val ids = gramSets.keys.toSeq.sorted
    Seq(0.625, 0.55, 0.617).foreach { t =>
      val expected = (for {
        i <- ids.indices.iterator; j <- (i + 1) until ids.length
        a = ids(i); b = ids(j)
        if block(a) == block(b)
        n = (gramSets(a) & gramSets(b)).size.toDouble
        if n / (gramSets(a).size + gramSets(b).size - n) >= t
      } yield (a, b)).toSet
      val got = graft.operators.Dedup.ngramJaccardPrefixFiltered(docs, t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected,
        s"t=$t: missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    }
  }

  test("media sniff: tkhd v1 reads dims at the v1 offsets — matrix bytes never type as dims") {
    import graft.operators.{Multimodal => M}
    def mp4V1(w: Int, h: Int): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(136).order(java.nio.ByteOrder.BIG_ENDIAN)
      def box(size: Int, tpe: String): Unit = { out.putInt(size); out.put(tpe.getBytes("US-ASCII")) }
      box(16, "ftyp"); out.put("isom".getBytes("US-ASCII")); out.putInt(0x200)
      box(120, "moov"); box(112, "trak"); box(104, "tkhd")
      out.putInt(0x01000000) // version 1 + flags
      out.putLong(0L); out.putLong(0L) // ctime/mtime widen to 64 bits
      out.putInt(7); out.putInt(0) // track id + reserved
      out.putLong(0L) // duration (64-bit)
      out.putLong(0L) // reserved
      out.putShort(0); out.putShort(0); out.putShort(0); out.putShort(0)
      // NON-trivial matrix: the v0 dim offsets (+76/+80) land inside
      // these 36 bytes — a v0-offset read would report them as dims
      (0 until 9).foreach(i => out.putInt(0x00010000 * (i + 1)))
      out.putInt(w << 16); out.putInt(h << 16)
      out.array()
    }
    assert(M.sniffMedia(mp4V1(64, 48)) == (("mp4", 64L, 48L)))
    // unknown tkhd version: degrade to (0,0), never guess an offset
    val v2 = M.encodeMp4Header(32, 24)
    v2(40) = 2 // version byte of the tkhd payload (16+8+8+8 = offset 40)
    assert(M.sniffMedia(v2) == (("mp4", 0L, 0L)))
  }

  test("media sniff: EXIF orientation 5-8 swaps JPEG dims; 1-4 keeps them; malformed EXIF degrades") {
    import graft.operators.{Multimodal => M}
    val base = ImageCodec.encodeGrayJpeg(10, 6)((x, y) => (x + y) % 256)
    assert(M.sniffMedia(base) == (("jpeg", 10L, 6L)), "no EXIF: SOF dims")
    (1 to 8).foreach { o =>
      Seq(true, false).foreach { le =>
        val got = M.sniffMedia(M.spliceExifOrientation(base, o, le))
        val want = if (o >= 5) ("jpeg", 6L, 10L) else ("jpeg", 10L, 6L)
        assert(got == want, s"orientation=$o littleEndian=$le: $got")
      }
    }
    val spliced = M.spliceExifOrientation(base, 6, littleEndian = true)
    // truncation inside the APP1 segment: type degrades, never throws
    M.sniffMedia(spliced.take(20))
    // IFD offset pointing past the segment: orientation stays default
    val bad = spliced.clone()
    bad(16) = 0x7f.toByte // TIFF at 12; IFD-offset bytes at 16..19 (LE)
    assert(M.sniffMedia(bad) == (("jpeg", 10L, 6L)), "bad IFD offset must keep default orientation")
  }

  test("IVF-PQ refresh rejects a dirty arrivals batch BEFORE any publish — the index never tears") {
    import graft.operators.{Publish, Similarity}
    val root = java.nio.file.Files.createTempDirectory("graft-ivfpq-dirty").toString
    val e = graft.Tables.embeddings(spark, sfDir)
    val initial = e.filter(col("vec_id") % 7 =!= 3)
    val r1 = Similarity.publishIvfPqIndex(initial, root, token = "v1build")
    assert(r1.size == 3 && r1.forall(_.published), s"initial publish failed: $r1")
    // an INTERNAL duplicate id: encodePq's groupBy collapses it while a
    // raw-count audit counts it twice — r10's publish-then-audit ordering
    // advanced lists/books to N+1 before the codes audit failed, leaving
    // the version triple permanently torn. The batch must be rejected
    // while everything still sits at version 1.
    val held = e.filter(col("vec_id") % 7 === 3)
    val dirty = held.unionByName(held.limit(1))
    val err = intercept[IllegalArgumentException] {
      Similarity.refreshIvfPqIndex(spark, root, dirty, token = "v2dirty")
    }
    assert(err.getMessage.contains("duplicate vec_ids within"),
      s"wrong rejection: ${err.getMessage}")
    Seq("lists", "books", "codes").foreach { t =>
      assert(Publish.currentVersion(spark, s"$root/$t").contains(1L),
        s"$t advanced past the rejected refresh")
    }
    // the untorn index still answers queries
    val n = Similarity.ivfPqTopKFromIndex(spark, root, initial,
      e.filter(col("vec_id") < 10), k = 5, refine = 200, nProbe = 4).count()
    assert(n > 0, "index unreadable after rejected refresh")
  }

  test("url canonicalization (t32): every rule on hand cases; dedup groups planted collisions") {
    import spark.implicits._
    import graft.operators.{TextAnalysis => T}
    val cases = Seq(
      // scheme+host case, default port, fragment, tracking params, unsorted query
      ("HTTPS://WWW.Example.COM:443/a/b?utm_source=x&b=2&a=1#frag",
        "https://www.example.com/a/b?a=1&b=2"),
      // non-default port KEPT; trailing slash stripped
      ("http://site.org:8080/path/", "http://site.org:8080/path"),
      // default http port stripped; empty path -> root
      ("http://Host.Net:80", "http://host.net/"),
      // only tracking params -> no query at all; multiple trailing slashes
      ("https://a.b/c///?gclid=1&fbclid=2&ref=z", "https://a.b/c"),
      // root with slash stays root; params sort byte-wise
      ("https://x.y/?z=1&y=2&x=3", "https://x.y/?x=3&y=2&z=1"))
    val got = cases.zipWithIndex.map { case ((in, _), i) => (i.toLong, in) }
      .toDF("doc_id", "url")
      .select(col("doc_id"), T.canonicalizeUrl(col("url")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.zipWithIndex.foreach { case ((in, want), i) =>
      assert(got(i.toLong) == want, s"$in -> ${got(i.toLong)} (want $want)")
    }
    // dedup: three spellings of one URL collapse to one group, keep = min id
    val urls = Seq(
      (1L, "https://D.e/p?b=2&a=1"),
      (2L, "HTTPS://d.E:443/p/?a=1&b=2#x"),
      (3L, "https://d.e/p?utm_source=s&b=2&a=1"),
      (9L, "https://other.site/q")).toDF("doc_id", "url")
    val out = T.urlCanonicalDedup(urls).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(1L) == (("https://d.e/p?a=1&b=2", 3L, true)), s"${out(1L)}")
    assert(out(2L)._2 == 3L && !out(2L)._3)
    assert(out(3L)._2 == 3L && !out(3L)._3)
    assert(out(9L)._2 == 1L && out(9L)._3)
  }

  test("char entropy (t33): hand-computed values, extremes, and empty text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aabb"),            // two symbols, equal: exactly 1 bit
      (2L, "aaaa"),            // one symbol: 0 bits, low_entropy
      (3L, "abcdefgh"),        // 8 distinct once each: exactly 3 bits
      (4L, ""),                // empty: 0 counted, NOT flagged (no evidence)
      (5L, "ababababab"))      // alternation is still 1 bit (order-free)
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.charEntropy(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(out(1L) == ((4L, 2L, 1.0, true)), s"${out(1L)}")
    assert(out(2L) == ((4L, 1L, 0.0, true)), s"${out(2L)}")
    assert(out(3L) == ((8L, 8L, 3.0, false)), s"${out(3L)}")
    assert(out(4L) == ((0L, 0L, 0.0, false)), s"${out(4L)}")
    assert(out(5L) == ((10L, 2L, 1.0, true)), s"${out(5L)}")
    // natural-language fixture text sits in the published 3.5-4.5 band
    // for long docs — the signal separates prose from blobs
    val corpus = graft.operators.TextAnalysis.charEntropy(
      graft.Tables.documents(spark, sfDir)).filter(col("n_chars_counted") >= 200)
    val band = corpus.filter(col("h_bits") >= 3.0 && col("h_bits") <= 5.0).count()
    val total = corpus.count()
    assert(total > 0 && band.toDouble / total >= 0.9,
      s"prose band: $band/$total docs in [3,5] bits")
  }

  test("html extraction (t34): head/script/style dropped, blocks separate, entities decode in safe order") {
    import spark.implicits._
    import graft.operators.{TextAnalysis => T}
    val cases = Seq(
      // head content (title) must NOT leak; script/style bodies dropped
      ("<html><head><title>SEO junk</title></head><body><p>real text</p>" +
        "<script>var a='<p>not text</p>';</script><style>p{x:1}</style></body></html>",
        "real text"),
      // adjacent blocks do not weld into one word
      ("<div>alpha</div><div>beta</div><ul><li>one</li><li>two</li></ul>",
        "alpha beta one two"),
      // inline tags strip; attributes with no '>' inside are handled
      ("""<p>click <a href="http://x.y/z" class="btn">here</a> now</p>""",
        "click here now"),
      // entity decode order: &amp;lt; must yield literal "&lt;", not "<"
      ("<p>&amp;lt; &lt;b&gt; &quot;q&quot;&nbsp;end</p>", "&lt; <b> \"q\" end"),
      // whitespace runs collapse; case-insensitive tags
      ("<P>  a\n\n  b\t c </P>", "a b c"))
    val got = cases.zipWithIndex.map { case ((in, _), i) => (i.toLong, in) }
      .toDF("doc_id", "html")
      .select(col("doc_id"), T.htmlToText(col("html")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.zipWithIndex.foreach { case ((in, want), i) =>
      assert(got(i.toLong) == want, s"[$in] -> [${got(i.toLong)}] (want [$want])")
    }
    // round trip on real corpus text: escape -> wrap -> extract recovers
    // the whitespace-collapsed original byte-for-byte
    val docs = graft.Tables.documents(spark, sfDir).limit(50)
    val esc = regexp_replace(regexp_replace(regexp_replace(col("text"),
      "&", "&amp;"), "<", "&lt;"), ">", "&gt;")
    val wrapped = concat(lit("<html><head><title>x</title></head><body><p>"),
      esc, lit("</p></body></html>"))
    val diff = docs.select(
        T.htmlToText(wrapped).as("got"),
        trim(regexp_replace(col("text"), "\\s+", " ")).as("want"))
      .filter(col("got") =!= col("want")).count()
    assert(diff == 0, "extraction round trip diverged on corpus text")
  }

  test("randomized references (seeded): url canonicalization is idempotent; entropy stays in [0, log2(distinct)]") {
    import spark.implicits._
    import graft.operators.{TextAnalysis => T}
    val rnd = new scala.util.Random(23)
    // 200 random URL-shaped strings over the full rule surface: mixed
    // case, optional ports (default and not), path depth, trailing
    // slashes, shuffled query params with tracking keys mixed in,
    // optional fragments
    val urls = (1 to 200).map { i =>
      def pick[A](xs: Seq[A]) = xs(rnd.nextInt(xs.length))
      val scheme = pick(Seq("http", "HTTP", "https", "HTTPS", "hTtPs"))
      val host = pick(Seq("Ex.COM", "sub.Site.org", "A.b.C.d", "x.io"))
      val port = pick(Seq("", ":80", ":443", ":8080", ":9", ""))
      val path = (0 until rnd.nextInt(4)).map(_ => pick(Seq("a", "B", "c9", "_d")))
        .mkString("/", "/", "") + ("/" * rnd.nextInt(3))
      val params = rnd.shuffle(Seq("b=2", "a=1", "utm_source=x", "z=", "gclid=9",
        "k=v%20w").take(rnd.nextInt(6)))
      val query = if (params.isEmpty) "" else params.mkString("?", "&", "")
      val frag = pick(Seq("", "#x", "#sec-2"))
      (i.toLong, s"$scheme://$host$port$path$query$frag")
    }
    val once = urls.toDF("id", "url")
      .select(col("id"), T.canonicalizeUrl(col("url")).as("c"))
    val twice = once.select(col("id"), col("c"),
      T.canonicalizeUrl(col("c")).as("cc"))
    val broken = twice.filter(col("c") =!= col("cc")).collect()
    assert(broken.isEmpty,
      s"canonicalization not idempotent: ${broken.take(3).mkString("; ")}")
    // canonical output carries none of the normalized-away artifacts:
    // no fragment, no tracking params, lowercase scheme+host (path case
    // is SIGNIFICANT per RFC 3986 and must survive), and no DEFAULT
    // port for its own scheme (https://x:80 is non-default and stays)
    val dirty = once.filter(
      col("c").contains("#") || col("c").contains("utm_") ||
        col("c").contains("gclid") ||
        col("c").rlike("^https://[^/?#]*:443([/?#]|$)") ||
        col("c").rlike("^http://[^/?#]*:80([/?#]|$)") ||
        regexp_extract(col("c"), "^([^:]+://[^/?#]*)", 1).rlike("[A-Z]")).collect()
    assert(dirty.isEmpty, s"artifacts survived: ${dirty.take(3).mkString("; ")}")
    // entropy bound: 0 <= H <= log2(distinct chars), random strings
    val texts = (1L to 60L).map { id =>
      val n = rnd.nextInt(400)
      (id, (0 until n).map(_ => (32 + rnd.nextInt(95)).toChar).mkString)
    }
    val ent = T.charEntropy(texts.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    texts.foreach { case (id, t) =>
      val (n, d, h) = ent(id)
      assert(n == t.length && d == t.distinct.length, s"doc $id counts")
      val cap = if (d <= 1) 0.0 else math.log(d.toDouble) / math.log(2.0)
      assert(h >= 0.0 && h <= cap + 1e-4, s"doc $id: H=$h cap=$cap")
    }
  }

  test("char entropy: codegen row-local spelling is bit-equal to the aggregate twin; benched plan is shuffle-free") {
    import spark.implicits._
    import graft.operators.{TextAnalysis => T}
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))
    // real corpus: every column bit-equal
    val docs = graft.Tables.documents(spark, sfDir)
    val agg = T.charEntropy(docs).collect().map(key).toSet
    val row = T.charEntropyRowLocal(docs).collect().map(key).toSet
    assert(row == agg, "row-local spelling diverged from the aggregate twin on the corpus")
    // seeded randoms incl. repeats, empties, mixed alphabets
    val rnd = new scala.util.Random(31)
    val texts = (1L to 80L).map { id =>
      val alpha = "ab" + (if (id % 3 == 0) "XYZ01 \t" else "cdefgh")
      (id, (0 until rnd.nextInt(300)).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    }.toDF("doc_id", "text")
    val agg2 = T.charEntropy(texts).collect().map(key).toSet
    val row2 = T.charEntropyRowLocal(texts).collect().map(key).toSet
    assert(row2 == agg2, "row-local spelling diverged on random strings")
    // the scale point: the benched t33 plan moves NOTHING through a
    // shuffle — entropy is row-local, so the plan is one scan projection
    // (+ the terminal order of the driver entry)
    val plan = graft.SparkEntry.benchQueries("t33_char_entropy")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val shuffles = plan.linesIterator
      .filter(l => l.contains("Exchange") && !l.contains("rangepartitioning"))
      .toSeq
    assert(shuffles.isEmpty, s"t33 re-shuffles row-local work:\n${shuffles.mkString("\n")}")
  }

  test("exif gps scrub (m16): detection finds the planted tag, the scrub keeps the image decodable") {
    import graft.operators.{Multimodal => M}
    val base = ImageCodec.encodeGrayJpeg(12, 8)((x, y) => (x * 3 + y * 5) % 256)
    Seq(true, false).foreach { le =>
      val withGps = M.spliceExif(base, orientation = 6, littleEndian = le, gps = true)
      assert(M.detectExifGps(withGps), s"planted GPS tag not detected (le=$le)")
      assert(!M.detectExifGps(base), "clean JPEG must not detect GPS")
      val stripped = M.stripExif(withGps)
      assert(!M.detectExifGps(stripped), "GPS must be gone after the scrub")
      // the scrub removed EXACTLY the APP1 segment and nothing else:
      // the remaining bytes still decode through the real JDK decoder
      assert(ImageCodec.grayThumb(stripped, 4, 4).nonEmpty,
        "scrubbed JPEG no longer decodes through the real JDK decoder")
      // orientation went with the segment: dims report unswapped again
      assert(M.sniffMedia(withGps) == (("jpeg", 8L, 12L)), "orientation 6 swaps")
      assert(M.sniffMedia(stripped) == (("jpeg", 12L, 8L)), "post-scrub dims unswapped")
    }
    // non-JPEG and garbage pass through IDENTICALLY (never corrupted)
    val txt = "not an image at all".getBytes("UTF-8")
    assert(M.stripExif(txt).sameElements(txt))
    assert(!M.detectExifGps(txt))
    val rnd = new scala.util.Random(17)
    (1 to 200).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(120))(rnd.nextInt(256).toByte)
      M.detectExifGps(junk) // must not throw
      M.stripExif(junk)     // must not throw
      // magic-prefixed junk: a JPEG SOI followed by garbage
      val fake = Array[Byte](0xff.toByte, 0xd8.toByte) ++ junk
      M.detectExifGps(fake)
      assert(M.stripExif(fake).length >= 2, "SOI survives any garbage tail")
    }
  }

  test("surgical gps scrub (m17): out-of-line values and Exif sub-IFDs survive; unknown grammar fails CLOSED") {
    import graft.operators.{Multimodal => M}
    val base = ImageCodec.encodeGrayJpeg(10, 6)((x, y) => (x * 7 + y * 3) % 256)
    // hand-build an APP1 whose TIFF exercises paths the fixture doesn't:
    // out-of-line values, the 0x8769 Exif sub-IFD, unknown TIFF types
    def app1(le: Boolean)(tiff: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
      val t = new java.io.ByteArrayOutputStream()
      tiff(t)
      val tb = t.toByteArray
      val segLen = 2 + 6 + tb.length
      val out = new java.io.ByteArrayOutputStream()
      out.write(base, 0, 2)
      out.write(0xff); out.write(0xe1)
      out.write((segLen >> 8) & 0xff); out.write(segLen & 0xff)
      out.write("Exif".getBytes("US-ASCII")); out.write(0); out.write(0)
      out.write(tb)
      out.write(base, 2, base.length - 2)
      out.toByteArray
    }
    def w16(o: java.io.ByteArrayOutputStream, v: Int, le: Boolean): Unit =
      if (le) { o.write(v & 0xff); o.write((v >> 8) & 0xff) }
      else { o.write((v >> 8) & 0xff); o.write(v & 0xff) }
    def w32(o: java.io.ByteArrayOutputStream, v: Int, le: Boolean): Unit =
      if (le) { w16(o, v & 0xffff, le); w16(o, v >>> 16, le) }
      else { w16(o, v >>> 16, le); w16(o, v & 0xffff, le) }
    def header(o: java.io.ByteArrayOutputStream, le: Boolean): Unit = {
      val bo = if (le) 0x49 else 0x4d
      o.write(bo); o.write(bo); w16(o, 42, le); w32(o, 8, le)
    }
    Seq(true, false).foreach { le =>
      // A. OUT-OF-LINE value (12-byte ASCII ImageDescription) + GPS +
      // orientation: surgery must copy the value area and re-point it
      val desc = "hello world ".getBytes("US-ASCII")
      val a = app1(le) { o =>
        header(o, le)
        w16(o, 3, le)
        w16(o, 0x010e, le); w16(o, 2, le); w32(o, 12, le); w32(o, 56, le) // ASCII, out-of-line
        w16(o, 0x0112, le); w16(o, 3, le); w32(o, 1, le); w16(o, 7, le); w16(o, 0, le)
        w16(o, 0x8825, le); w16(o, 4, le); w32(o, 1, le); w32(o, 50, le)
        w32(o, 0, le)          // next IFD
        w16(o, 0, le); w32(o, 0, le) // empty GPS IFD at 50
        o.write(desc)          // value area at 56
      }
      assert(M.detectExifGps(a), s"le=$le: planted GPS not detected")
      val sa = M.stripExifGpsOnly(a)
      assert(!M.detectExifGps(sa), s"le=$le: GPS survived surgery")
      assert(M.exifIfd0ShortValue(sa, 0x0112).contains(7),
        s"le=$le: orientation lost — surgery fell back to full strip")
      assert(a.length - sa.length == 18, s"le=$le: removed ${a.length - sa.length}, want 18")
      assert(new String(sa, "ISO-8859-1").contains("hello world"),
        s"le=$le: out-of-line value bytes lost in the rebuild")
      assert(ImageCodec.grayThumb(sa, 4, 4).nonEmpty, "scrubbed JPEG no longer decodes")
      // B. Exif SUB-IFD (0x8769) + GPS + orientation: the sub-IFD and its
      // inline UNDEFINED value must survive the recursive rebuild
      val b = app1(le) { o =>
        header(o, le)
        w16(o, 3, le)
        w16(o, 0x0112, le); w16(o, 3, le); w32(o, 1, le); w16(o, 4, le); w16(o, 0, le)
        w16(o, 0x8769, le); w16(o, 4, le); w32(o, 1, le); w32(o, 50, le)
        w16(o, 0x8825, le); w16(o, 4, le); w32(o, 1, le); w32(o, 68, le)
        w32(o, 0, le)
        // Exif sub-IFD at 50: ExifVersion "0231" inline (type 7, count 4)
        w16(o, 1, le)
        w16(o, 0x9000, le); w16(o, 7, le); w32(o, 4, le); o.write("0231".getBytes("US-ASCII"))
        w32(o, 0, le)
        w16(o, 0, le); w32(o, 0, le) // empty GPS IFD at 68
      }
      assert(M.detectExifGps(b))
      val sb = M.stripExifGpsOnly(b)
      assert(!M.detectExifGps(sb))
      assert(M.exifIfd0ShortValue(sb, 0x0112).contains(4),
        s"le=$le: orientation lost through the sub-IFD rebuild")
      assert(b.length - sb.length == 18, s"le=$le: removed ${b.length - sb.length}, want 18")
      assert(new String(sb, "ISO-8859-1").contains("0231"),
        s"le=$le: Exif sub-IFD content lost")
      // C. UNKNOWN TIFF type alongside GPS: surgery is unsafe, so the
      // scrub must FAIL CLOSED to the full strip — PII gone even though
      // the grammar wasn't understood (orientation goes with it)
      val c = app1(le) { o =>
        header(o, le)
        w16(o, 3, le)
        w16(o, 0x0112, le); w16(o, 3, le); w32(o, 1, le); w16(o, 3, le); w16(o, 0, le)
        w16(o, 0xbeef, le); w16(o, 99, le); w32(o, 1, le); w32(o, 0, le) // type 99: unknown
        w16(o, 0x8825, le); w16(o, 4, le); w32(o, 1, le); w32(o, 50, le)
        w32(o, 0, le)
        w16(o, 0, le); w32(o, 0, le)
      }
      assert(M.detectExifGps(c))
      val sc = M.stripExifGpsOnly(c)
      assert(!M.detectExifGps(sc), s"le=$le: fail-closed path leaked GPS")
      assert(sc.sameElements(M.stripExif(c)),
        s"le=$le: unsafe surgery must degrade to exactly the full strip")
      // D. TWO sub-IFDs that parse to the IDENTICAL entry sequence (Exif
      // 0x8769 and Interop 0xa005, both EMPTY) + GPS + orientation: a
      // value-keyed layout map collapses them onto one placement, leaving
      // one pointer aimed at the other's bytes (r12 verdict item 8). The
      // rebuild must give each its own distinct, in-bounds offset.
      val d = app1(le) { o =>
        header(o, le)
        w16(o, 4, le)
        w16(o, 0x0112, le); w16(o, 3, le); w32(o, 1, le); w16(o, 5, le); w16(o, 0, le)
        w16(o, 0x8769, le); w16(o, 4, le); w32(o, 1, le); w32(o, 62, le) // empty Exif IFD
        w16(o, 0x8825, le); w16(o, 4, le); w32(o, 1, le); w32(o, 68, le) // empty GPS IFD
        w16(o, 0xa005, le); w16(o, 4, le); w32(o, 1, le); w32(o, 74, le) // empty Interop IFD
        w32(o, 0, le)                // next IFD (header 8 + 2 + 4*12 + 4 = 62)
        w16(o, 0, le); w32(o, 0, le) // empty Exif IFD at 62
        w16(o, 0, le); w32(o, 0, le) // empty GPS IFD at 68
        w16(o, 0, le); w32(o, 0, le) // empty Interop IFD at 74
      }
      assert(M.detectExifGps(d))
      val sd = M.stripExifGpsOnly(d)
      assert(!M.detectExifGps(sd), s"le=$le: GPS survived the twin-sub-IFD surgery")
      assert(M.exifIfd0ShortValue(sd, 0x0112).contains(5),
        s"le=$le: orientation lost — twin empty sub-IFDs forced the full-strip fallback")
      assert(d.length - sd.length == 18, s"le=$le: removed ${d.length - sd.length}, want 18")
      // hand-walk the rebuilt TIFF: both pointers present, DISTINCT, and
      // each targeting a well-formed empty IFD inside the segment
      locally {
        def u8(bs: Array[Byte], i: Int): Int = bs(i) & 0xff
        var j = 2
        var app1At = -1
        while (app1At < 0 && j + 3 < sd.length) {
          if (u8(sd, j) == 0xff && u8(sd, j + 1) == 0xe1) app1At = j
          else j += 1
        }
        assert(app1At > 0, s"le=$le: rebuilt APP1 not found")
        val segLen = (u8(sd, app1At + 2) << 8) | u8(sd, app1At + 3)
        val tiff = app1At + 10
        val segEnd = app1At + 2 + segLen
        def r16(p: Int): Int =
          if (le) u8(sd, p) | (u8(sd, p + 1) << 8) else (u8(sd, p) << 8) | u8(sd, p + 1)
        def r32(p: Int): Long =
          if (le) u8(sd, p).toLong | (u8(sd, p + 1).toLong << 8) |
            (u8(sd, p + 2).toLong << 16) | (u8(sd, p + 3).toLong << 24)
          else (u8(sd, p).toLong << 24) | (u8(sd, p + 1).toLong << 16) |
            (u8(sd, p + 2).toLong << 8) | u8(sd, p + 3).toLong
        val ifd0 = tiff + r32(tiff + 4).toInt
        val n = r16(ifd0)
        val ptrs = (0 until n).flatMap { k =>
          val e = ifd0 + 2 + k * 12
          val tag = r16(e)
          if (tag == 0x8769 || tag == 0xa005) Some(tag -> r32(e + 8)) else None
        }.toMap
        assert(ptrs.keySet == Set(0x8769, 0xa005),
          s"le=$le: expected both sub-IFD pointers, got ${ptrs.keySet}")
        assert(ptrs(0x8769) != ptrs(0xa005),
          s"le=$le: identical empty sub-IFDs collapsed onto one offset ${ptrs(0x8769)}")
        ptrs.foreach { case (tag, off) =>
          val at = tiff + off.toInt
          assert(at + 6 <= segEnd && r16(at) == 0 && r32(at + 2) == 0L,
            s"le=$le: tag $tag points at $off which is not a well-formed empty IFD")
        }
      }
    }
    // no-GPS inputs return BYTE-IDENTICAL (the zero-cost path)
    val plain = M.spliceExif(base, 3, littleEndian = true, gps = false)
    assert(M.stripExifGpsOnly(plain) eq plain, "no-GPS JPEG must pass through untouched")
    val txt = "not an image".getBytes("UTF-8")
    assert(M.stripExifGpsOnly(txt) eq txt)
    // fuzz: junk and magic-prefixed junk never throw, never leak GPS
    val rnd = new scala.util.Random(23)
    (1 to 200).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(150))(rnd.nextInt(256).toByte)
      M.stripExifGpsOnly(junk)
      val fake = Array[Byte](0xff.toByte, 0xd8.toByte) ++ junk
      val out = M.stripExifGpsOnly(fake)
      assert(!M.detectExifGps(out), "fuzz output must never carry a GPS pointer")
    }
  }

  test("misra-gries (x17): serialize survives keys past writeUTF's 65535-byte limit") {
    import spark.implicits._
    // one heavy key whose UTF-8 encoding is ~80k bytes, spread over many
    // partitions so the agg MUST serialize partial buffers through the
    // shuffle (writeUTF threw UTFDataFormatException here before the
    // length-prefixed raw-bytes encoding)
    val longKey = "k" * 80000
    val docs = (1 to 64).map(i => (i.toLong, if (i % 2 == 0) longKey else s"w$i"))
      .toDF("doc_id", "text").repartition(8)
    val out = Sketching.misraGriesTopK(docs, k = 4).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val hit = out.find(_._1 == longKey)
    assert(hit.nonEmpty, "the long heavy key must survive serialization and be tracked")
    assert(hit.get._3 == 32L, "exact count of the long key")
  }

  test("link extraction (t35): absolute http(s) anchors survive in document order; relative/mailto/js dropped") {
    import spark.implicits._
    val html =
      """<html><body>
        |<a href="https://a.com/1">one</a>
        |<a href='/rel/path'>rel</a>
        |<A CLASS="x" HREF='HTTP://B.com/2?q=1'>two</A>
        |<a href="mailto:x@y.z">mail</a>
        |<a href="javascript:void(0)">js</a>
        |<a data-x="1" href="https://c.com/3#frag">three</a>
        |</body></html>""".stripMargin
    val out = Seq((1L, html)).toDF("doc_id", "html")
      .select(TextAnalysis.extractLinks(col("html")).as("links"))
      .as[Seq[String]].head()
    assert(out == Seq("https://a.com/1", "HTTP://B.com/2?q=1", "https://c.com/3#frag"),
      s"got $out")
    // hostOf: lowercased, port/path/query excluded
    val h = Seq(("https://Site5.Example.COM:8443/p?a=1", "http://plain.org"))
      .toDF("u1", "u2")
      .select(TextAnalysis.hostOf(col("u1")), TextAnalysis.hostOf(col("u2")))
      .head()
    assert(h.getString(0) == "site5.example.com" && h.getString(1) == "plain.org")
  }

  test("domain PageRank (p23): in-link mass ranks the hub first; a no-in-edge source floors at exactly 0.15") {
    import spark.implicits._
    // src host pages: a and b both link to hub; hub links back only to a;
    // lone links out but nothing links to lone (a genuine directed
    // source — textRank's groupBy spelling would silently drop it)
    def page(host: String, outs: String*) =
      (s"https://$host/", outs.map(o => s"""<a href="https://$o/x">l</a>""").mkString)
    val pages = Seq(
      page("a.com", "hub.com"), page("b.com", "hub.com"),
      page("hub.com", "a.com"), page("lone.com", "hub.com", "a.com"))
      .toDF("url", "html")
    val out = Pipeline.domainPageRank(pages, iters = 3).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet == Set("a.com", "b.com", "hub.com", "lone.com"))
    val (hubIn, _, hubScore) = out("hub.com")
    assert(hubIn == 3L, s"hub must have 3 in-edges, got $hubIn")
    assert(hubScore == out.values.map(_._3).max, "hub must rank first")
    // lone.com: no in-edges => score pinned at the damping floor by the
    // left join (and NOT dropped from the output)
    assert(out("lone.com")._3 == 0.15, s"source host must floor at 0.15, got ${out("lone.com")._3}")
    assert(out("lone.com")._1 == 0L && out("lone.com")._2 == 2L)
    // b.com is a source too (hub links only to a; lone to hub+a)
    assert(out("b.com")._3 == 0.15)
    assert(out("a.com")._3 > 0.15 && out("a.com")._3 < hubScore)
    // self-links never make edges: a page linking to itself adds nothing
    val selfy = Seq(("https://s.com/", """<a href="https://s.com/y">me</a>"""))
      .toDF("url", "html")
    assert(Pipeline.hostGraph(selfy).count() == 0L)
  }

  test("domain HITS (p30): directories hub without authority, sinks the reverse; weight doubling is bit-invariant; the planted fixture hub tops authority") {
    import spark.implicits._
    def page(host: String, rep: Int, outs: String*) =
      (s"https://$host/", outs.flatMap(o => (0 until rep).map(i =>
        s"""<a href="https://$o/x$i">l</a>""")).mkString)
    // dir.com links to every content host but receives NO in-links — the
    // directory shape PageRank cannot see (it floors at 0.15 there) but
    // HITS ranks as the TOP hub; c9 is endorsed only by a weak hub and
    // links nowhere (a pure sink: hub exactly 0)
    def fixture(rep: Int) = Seq(
      page("dir.com", rep, "c1.com", "c2.com", "c3.com"),
      page("c1.com", rep, "c2.com"),
      page("c2.com", rep, "c1.com"),
      page("c3.com", rep, "c9.com")).toDF("url", "html")
    val out = Pipeline.domainHits(fixture(1), iters = 2).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(out.keySet == Set("dir.com", "c1.com", "c2.com", "c3.com", "c9.com"))
    assert(out("dir.com")._2 == 0.0 && out("dir.com")._1 == 1.0,
      s"directory must be the max hub with zero authority: $out")
    assert(out("c9.com")._1 == 0.0 && out("c9.com")._2 > 0.0,
      s"sink must have zero hub, positive authority: $out")
    assert(out("c9.com")._2 < out("c1.com")._2 &&
      out("c9.com")._2 < out("c2.com")._2,
      s"weak endorsement must rank below directory+mutual endorsement: $out")
    // scale invariance, exactly: doubling every link count scales the
    // unnormalized scores by powers of 2 (IEEE-exact), so the
    // max-normalized output is BIT-identical
    val out2 = Pipeline.domainHits(fixture(2), iters = 2).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(out2 == out, s"uniform weight doubling must be invariant:\n$out\nvs\n$out2")
    // the p23 fixture: the planted in-link hub is the top AUTHORITY
    val fx = Pipeline.domainHits(graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextAnalysis.fixtureDirtyUrl.as("url"),
        TextAnalysis.fixtureLinkedHtml.as("html"))).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(fx.length == 50)
    assert(fx.maxBy(_._3)._1 == "site0.example.com",
      s"planted hub must top authority: ${fx.maxBy(_._3)}")
  }

  test("anchor extraction (t36): (url, text) pairs in document order; per-host profile counts") {
    import spark.implicits._
    val html =
      """<a href="https://a.com/1">Alpha One</a>
        |<a href='/rel'>nope</a>
        |<A HREF="https://B.com/2" class="z"> beta </A>
        |<a href="mailto:x@y.z">mail</a>
        |<a data-k="v" href="https://a.com/3">Alpha Two</a>""".stripMargin
    val pairs = Seq(Tuple1(html)).toDF("html")
      .select(explode(TextAnalysis.extractAnchors(col("html"))).as("a"))
      .select(col("a.url"), col("a.text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(pairs.toSeq == Seq(
      ("https://a.com/1", "Alpha One"),
      ("https://B.com/2", " beta "),
      ("https://a.com/3", "Alpha Two")), s"got ${pairs.toSeq}")
    val prof = TextAnalysis.anchorTextsByHost(Seq(Tuple1(html)).toDF("html"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(prof.toSeq == Seq(
      ("a.com", "Alpha One", 1L), ("a.com", "Alpha Two", 1L),
      ("b.com", "beta", 1L)), s"got ${prof.toSeq}")
  }

  test("domain TrustRank (p24): spam clusters unreachable from seeds hold EXACTLY zero; seeds floor at 0.15/|seeds|") {
    import spark.implicits._
    def page(host: String, outs: String*) =
      (s"https://$host/", outs.map(o => s"""<a href="https://$o/x">l</a>""").mkString)
    // a.com (seed) -> b.com; spam x.com <-> y.com densely interlinked but
    // UNREACHABLE from the seed — PageRank would still pay them teleport
    // mass, TrustRank must give them exactly 0.0
    val pages = Seq(
      page("a.com", "b.com"), page("b.com"),
      page("x.com", "y.com", "y.com"), page("y.com", "x.com", "x.com"))
      .toDF("url", "html")
    val tr = Pipeline.domainTrustRank(pages, seeds = Seq("a.com")).collect()
      .map(r => r.getString(0) -> (r.getBoolean(1), r.getDouble(4))).toMap
    assert(tr("x.com")._2 == 0.0 && tr("y.com")._2 == 0.0,
      s"unreachable cluster must hold zero trust: $tr")
    assert(tr("a.com")._1 && !tr("b.com")._1)
    // a: no in-edges => exactly the seeded damping floor 0.15·(1/1)
    assert(tr("a.com")._2 == 0.15, s"seed floor: ${tr("a.com")._2}")
    // b: reachable from the seed => strictly positive
    assert(tr("b.com")._2 > 0.0)
    // PageRank on the SAME graph pays the spam cluster uniform teleport
    // mass — the two signals' gap IS the spam detector
    val pr = Pipeline.domainPageRank(pages).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(pr("x.com") > 0.15 && pr("y.com") > 0.15,
      s"PageRank must still score the spam cluster: $pr")
  }

  test("PSI drift (q63): a planted distribution shift trips the 0.2 threshold; a stable group does not") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
    val cur = java.sql.Timestamp.valueOf("2024-01-20 00:00:00")
    // 'shifted': baseline mass in bucket 0 (values ~5), current mass in
    // bucket 9 (values ~400). 'stable': identical mix in both periods.
    val rows =
      (1 to 200).map(i => ("shifted", base, 5.0 + i % 3)) ++
      (1 to 200).map(i => ("shifted", cur, 400.0 + i % 3)) ++
      (1 to 200).map(i => ("stable", if (i % 2 == 0) base else cur, (i % 5) * 25.0))
    val df = rows.toDF("event_type", "ts", "value")
    val out = Relational.psiDrift(df, splitTs = "2024-01-16").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    val (na, nb, psiS, driftS) = out("shifted")
    assert(na == 200L && nb == 200L)
    assert(driftS && psiS > 2.0, s"planted shift must trip hard: psi=$psiS")
    val (_, _, psiQ, driftQ) = out("stable")
    assert(!driftQ && psiQ < 0.05, s"stable mix must stay under watch level: psi=$psiQ")
  }

  test("host-graph lifecycle (P25): WAP publish, refresh merges == rebuild exactly, ranks off the artifact bit-equal, corrupt graph quarantines") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-hostgraph").toString
    def page(host: String, outs: String*) =
      (s"https://$host/", outs.map(o => s"""<a href="https://$o/x">l</a>""").mkString)
    val batchA = Seq(page("a.com", "hub.com"), page("b.com", "hub.com", "a.com"))
    val batchB = Seq(page("c.com", "hub.com"), page("hub.com", "a.com"),
      page("a.com", "hub.com")) // a.com->hub.com again: weight must MERGE to 2
    val r1 = Pipeline.publishHostGraph(batchA.toDF("url", "html"), root, "crawl-1")
    assert(r1.published && r1.version.contains(1L), s"v1 publish failed: $r1")
    val r2 = Pipeline.refreshHostGraph(batchB.toDF("url", "html"), root, "crawl-2")
    assert(r2.published && r2.version.contains(2L), s"v2 refresh failed: $r2")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val merged = key(graft.operators.Publish.readPublished(spark, root))
    val rebuilt = key(Pipeline.hostGraph((batchA ++ batchB).toDF("url", "html")))
    assert(merged == rebuilt, s"merged=$merged rebuilt=$rebuilt")
    assert(merged.contains(("a.com", "hub.com", 2L)), "duplicate edge weights must sum")
    // ranks computed FROM the artifact == the direct operator, bit-equal
    // (same edge rows -> same sorted folds)
    def ranks(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val fromArtifact = ranks(Pipeline.domainPageRankFromEdges(
      graft.operators.Publish.readPublished(spark, root)))
    val direct = ranks(Pipeline.domainPageRank((batchA ++ batchB).toDF("url", "html")))
    assert(fromArtifact == direct, "artifact ranks must equal direct ranks bit-exactly")
    // a corrupt graph (self-edge, zero weight) quarantines; readers keep v2
    val corrupt = Seq(("x.com", "x.com", 1L), ("y.com", "z.com", 0L))
      .toDF("src", "dst", "w")
    val rBad = graft.operators.Publish.writeAuditPublish(
      corrupt, root, Pipeline.hostGraphAudit, "bad-graph")
    assert(!rBad.published && rBad.violations.nonEmpty, s"corrupt graph published: $rBad")
    assert(graft.operators.Publish.currentVersion(spark, root).contains(2L))
  }

  test("gram sums (s10): hand-computed integer sufficient statistics, exactly") {
    import spark.implicits._
    // b=2 => scale 4; floor quantization: 0.5->2, -0.3->-2 (floor), 1.0->4
    val emb = Seq(
      (1L, Seq(0.5f, 1.0f)), (2L, Seq(-0.3f, 0.25f)), (3L, Seq(1.0f, -1.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.gramMatrix(emb, scaleBits = 2).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // q = [(2,4), (-2,1), (4,-4)]; s_0=4, s_1=1
    // s_00 = 4+4+16 = 24; s_01 = 8-2-16 = -10; s_11 = 16+1+16 = 33
    assert(out((0L, 0L)) == ((3L, 4L, 4L, 24L)))
    assert(out((0L, 1L)) == ((3L, 4L, 1L, -10L)))
    assert(out((1L, 1L)) == ((3L, 1L, 1L, 33L)))
    assert(out.size == 3)
  }

  test("gram sums (s10): overflow fails LOUD (the scaleBits capacity contract), never wraps") {
    import spark.implicits._
    // scaleBits=26: each product is 2^52, so ~2^11 rows of 1.0 overflow a
    // long — the aggregate must throw, not return a silently wrong sum
    val big = (1 to 3000).map(i => (i.toLong, Seq(1.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.gramMatrix(big, scaleBits = 26).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.isInstanceOf[ArithmeticException]),
      s"expected ArithmeticException in cause chain, got $e")
  }

  test("PCA (D13): planted anisotropic spectrum is recovered; rotation orthonormal; whitening isotropizes") {
    import spark.implicits._
    val d = 6
    val n = 1500
    val stds = Array(8.0, 4.0, 2.0, 1.0, 0.5, 0.25)
    val rnd = new scala.util.Random(7)
    // planted rotation: Gram-Schmidt over a fixed random matrix
    // MILD mixing on top of axis-aligned descending variances: the raw
    // subspace variance PRODUCTS stay unbalanced (the SIFT-like case
    // OPQ's Figure 1 plants — consecutive raw pairs carry wildly
    // different energy), while the rotation is still a genuine dense
    // matrix the read path must replay
    val g = Array.tabulate(d, d)((r, c) =>
      (if (r == c) 1.0 else 0.0) + 0.15 * rnd.nextGaussian())
    val rPlant = Array.ofDim[Double](d, d)
    for (c <- 0 until d) {
      val v = Array.tabulate(d)(r => g(r)(c))
      for (pc <- 0 until c) {
        val dot = (0 until d).map(r => v(r) * rPlant(r)(pc)).sum
        for (r <- 0 until d) v(r) -= dot * rPlant(r)(pc)
      }
      val norm = math.sqrt(v.map(x => x * x).sum)
      for (r <- 0 until d) rPlant(r)(c) = v(r) / norm
    }
    // x = R z with z_k ~ N(0, stds(k)^2); scaled to ~[-1,1] via /32
    val data = (0 until n).map { i =>
      val z = Array.tabulate(d)(k => stds(k) * rnd.nextGaussian() / 32.0)
      (i.toLong, (0 until d).map(r => (0 until d).map(k => rPlant(r)(k) * z(k)).sum.toFloat))
    }
    val emb = data.toDF("vec_id", "embedding")
    val gram = Similarity.gramMatrix(emb, scaleBits = 16)
    val (eig, rot) = Similarity.pcaFromGram(gram, scaleBits = 16)
    // eigenvalues descending, non-negative (within fp), trace preserved
    assert(eig.zip(eig.tail).forall { case (a, b) => a >= b })
    assert(eig.forall(_ > -1e-9))
    // R orthonormal: max |RtR - I| tiny
    val rtr = Array.tabulate(d, d)((a, b) =>
      (0 until d).map(r => rot(r)(a) * rot(r)(b)).sum)
    val orthoErr = (for (a <- 0 until d; b <- 0 until d)
      yield math.abs(rtr(a)(b) - (if (a == b) 1.0 else 0.0))).max
    assert(orthoErr < 1e-9, s"orthonormality error $orthoErr")
    // planted spectrum recovered: sampling error ~ sqrt(2/n) ~ 3.7%
    val want = stds.map(s => s * s / (32.0 * 32.0))
    eig.zip(want).foreach { case (e, w) =>
      assert(math.abs(e - w) / w < 0.25, s"eig $e vs planted $w") }
    // top components align with planted directions (up to sign)
    for (c <- 0 until 3) {
      val dot = math.abs((0 until d).map(r => rot(r)(c) * rPlant(r)(c)).sum)
      assert(dot > 0.95, s"component $c alignment $dot")
    }
    // whitening: covariance of the rotated+scaled column ~ I
    val white = Similarity.rotateEmbeddings(emb, rot, eigvals = eig, eps = 1e-12)
      .select(col("vec_id"), col("rotated").as("embedding"))
    val wg = Similarity.gramMatrix(white, scaleBits = 16).collect()
    wg.foreach { r =>
      val i = r.getLong(0); val j = r.getLong(1)
      val nn = r.getLong(2).toDouble
      val cov = (r.getLong(5).toDouble / nn -
        (r.getLong(3).toDouble / nn) * (r.getLong(4).toDouble / nn)) / (65536.0 * 65536.0)
      if (i == j) assert(math.abs(cov - 1.0) < 0.15, s"whitened var($i)=$cov")
      else assert(math.abs(cov) < 0.1, s"whitened cov($i,$j)=$cov")
    }
    // plain rotation (no eigvals) preserves norms: |Rx| == |x|
    val rotOnly = Similarity.rotateEmbeddings(emb, rot)
      .select(col("embedding"), col("rotated")).collect()
    rotOnly.take(50).foreach { r =>
      val a = r.getSeq[Float](0).map(x => x.toDouble * x).sum
      val b = r.getSeq[Float](1).map(x => x.toDouble * x).sum
      assert(math.abs(a - b) < 1e-4 * math.max(a, 1e-9), s"norm not preserved: $a vs $b")
    }
  }

  test("OPQ (D14): rotation is the 4th WAP member; equal-bits recall >= unrotated on an anisotropic corpus; read == rotate-then-score; torn guard covers rotation; refresh carries it") {
    import spark.implicits._
    import graft.operators.{Publish, Similarity}
    // planted anisotropic corpus at PQ shape (d = 16 = m(8) x ds(2)):
    // variance concentrated along planted directions MIXED across raw
    // coordinates — exactly the case where PQ-on-raw-coordinates wastes
    // bits and the PCA rotation recovers them (Ge et al. 2013)
    val d = 16
    val n = 1200
    // smoothly decaying spectrum: with near-axis-aligned structure the
    // UNROTATED subquantizers see unbalanced variance products (pair 0
    // carries ~400x pair 7's energy) — the regime where Ge et al.'s
    // equal-bits eigenvalue-allocation gap lives
    val stds = Array.tabulate(16)(k => 8.0 * math.pow(0.81, k))
    val rnd = new scala.util.Random(11)
    // MILD mixing on top of axis-aligned descending variances: the raw
    // subspace variance PRODUCTS stay unbalanced (the SIFT-like case
    // OPQ's Figure 1 plants — consecutive raw pairs carry wildly
    // different energy), while the rotation is still a genuine dense
    // matrix the read path must replay
    val g = Array.tabulate(d, d)((r, c) =>
      (if (r == c) 1.0 else 0.0) + 0.15 * rnd.nextGaussian())
    val rPlant = Array.ofDim[Double](d, d)
    for (c <- 0 until d) {
      val v = Array.tabulate(d)(r => g(r)(c))
      for (pc <- 0 until c) {
        val dot = (0 until d).map(r => v(r) * rPlant(r)(pc)).sum
        for (r <- 0 until d) v(r) -= dot * rPlant(r)(pc)
      }
      val norm = math.sqrt(v.map(x => x * x).sum)
      for (r <- 0 until d) rPlant(r)(c) = v(r) / norm
    }
    val data = (0 until n).map { i =>
      val z = Array.tabulate(d)(k => stds(k) * rnd.nextGaussian() / 32.0)
      (i.toLong, (0 until d).map(r => (0 until d).map(k => rPlant(r)(k) * z(k)).sum.toFloat))
    }
    val emb = data.toDF("vec_id", "embedding")
    val rootP = java.nio.file.Files.createTempDirectory("graft-opq-plain").toString
    val rootR = java.nio.file.Files.createTempDirectory("graft-opq-rot").toString
    val rp = Similarity.publishIvfPqIndex(emb, rootP, token = "plain",
      kIvf = 4, m = 8, ds = 2, kc = 8)
    assert(rp.size == 3 && rp.forall(_.published), s"plain publish failed: $rp")
    val rr = Similarity.publishIvfPqIndex(emb, rootR, token = "opq",
      kIvf = 4, m = 8, ds = 2, kc = 8, rotate = true)
    assert(rr.size == 4 && rr.forall(_.published), s"OPQ publish failed: $rr")
    // equal-bits recall vs exact brute force, small refine pool so the
    // ADC ranking (where OPQ acts) is the binding stage
    val vecs = data.toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / math.sqrt(na * nb)
    }
    val nQ = 30
    val exact = (0 until nQ).flatMap { q =>
      data.filter(_._1 != q).map { case (id, v) => (q.toLong, id, cos(vecs(q.toLong), v)) }
        .sortBy(t => (-t._3, t._2)).take(5).map(t => (t._1, t._2))
    }.toSet
    val queries = emb.filter(col("vec_id") < nQ)
    // the binding comparison: ADC ordering + a PRODUCTION-sized refine
    // pool (exact re-rank of the ADC top-20). ivfPqTopKFromIndex's
    // corpus-aware pool floor (0.15n = 180 of 1200) would saturate both
    // indexes to ~1.0 recall on a corpus this small, hiding the
    // quantizer — this is where equal-bits rotation must pay (Ge et al.
    // 2013, Fig. 1's metric), so the spec replays the refine contract
    // driver-side at pool 20.
    def adcRanks(root: String): Map[(Long, Long), Int] =
      Similarity.ivfPqScoreFromIndex(spark, root, queries, nProbe = 4)
        .select(col("query_id"), col("neighbor_id"), col("acos")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).toSeq.flatMap { case (q, rows) =>
          rows.sortBy(t => (-t._3, t._2)).zipWithIndex
            .map { case (t, i) => (q, t._2) -> (i + 1) } }.toMap
    def adcRecallAt(ranks: Map[(Long, Long), Int], cutoff: Int): Double =
      exact.count(p => ranks.getOrElse(p, Int.MaxValue) <= cutoff).toDouble / exact.size
    def refinedRecall(ranks: Map[(Long, Long), Int], pool: Int): Double = {
      val got = ranks.toSeq.filter(_._2 <= pool).map(_._1)
        .groupBy(_._1).toSeq.flatMap { case (q, cands) =>
          cands.map { case (_, id) => (id, cos(vecs(q), vecs(id))) }
            .sortBy(t => (-t._2, t._1)).take(5).map(t => (q, t._1))
        }.toSet
      (got & exact).size.toDouble / exact.size
    }
    val ranksP = adcRanks(rootP)
    val ranksR = adcRanks(rootR)
    val adcP = adcRecallAt(ranksP, 20)
    val adcR = adcRecallAt(ranksR, 20)
    val recallP = refinedRecall(ranksP, 20)
    val recallR = refinedRecall(ranksR, 20)
    info(s"ADC-ordering recall@20: plain=$adcP opq=$adcR")
    info(s"equal-bits refined recall (pool 20): plain=$recallP opq=$recallR")
    assert(adcR >= adcP,
      s"OPQ ADC ordering $adcR worse than unrotated $adcP at equal bits")
    assert(recallR >= recallP,
      s"OPQ recall $recallR < unrotated $recallP at equal bits")
    // read-time rotation == rotate-then-score: a PLAIN index built from
    // the pre-rotated corpus (same deterministic R — Gram + Jacobi) must
    // produce the SAME codes and the SAME ADC scores as querying the OPQ
    // index with raw queries
    val rRot = Similarity.opqRotation(emb, m = 8)
    val preRotated = emb.select(col("vec_id"),
      Similarity.opqPreprocess(col("embedding"), rRot).as("embedding"))
    val rootM = java.nio.file.Files.createTempDirectory("graft-opq-manual").toString
    val rm = Similarity.publishIvfPqIndex(preRotated, rootM, token = "manual",
      kIvf = 4, m = 8, ds = 2, kc = 8, pqMetric = "l2")
    assert(rm.size == 3 && rm.forall(_.published), s"manual publish failed: $rm")
    def codesOf(root: String) =
      Publish.readPublished(spark, s"$root/codes")
        .collect().map(r => (r.getLong(0), r.getSeq[Int](r.fieldIndex("codes")).toSeq,
          r.getInt(r.fieldIndex("list_id")))).sortBy(_._1).toSeq
    assert(codesOf(rootR) == codesOf(rootM),
      "OPQ codes != codes of a plain index built on the pre-rotated corpus")
    def scoresOf(root: String, qs: org.apache.spark.sql.DataFrame) =
      Similarity.ivfPqScoreFromIndex(spark, root, qs, nProbe = 3)
        .select(col("query_id"), col("neighbor_id"), col("acos")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2)).toSeq
    // queries to the manual index are ROTATE-ONLY (the read path never
    // normalizes queries — cosine is scale-free — so bit-equality holds
    // against the same rotateExpr spelling, not against opqPreprocess)
    val rotatedQueries = emb.filter(col("vec_id") < nQ).select(col("vec_id"),
      Similarity.rotateExpr(col("embedding"), rRot).as("embedding"))
    assert(scoresOf(rootR, queries) == scoresOf(rootM, rotatedQueries),
      "OPQ read-time rotation diverged from rotate-then-score")
    // torn guard: bumping ONLY the rotation table must fail the read
    val rotOnly = Publish.readPublished(spark, s"$rootR/rotation")
    val staged = Publish.stageAudit(rotOnly, s"$rootR/rotation",
      st => Publish.columnAudit("never" -> lit(false))(st), "tear")
    staged match {
      case Right(s) => Publish.publishStaged(spark, s)
      case Left(q) => fail(s"tear staging failed: $q")
    }
    val torn = intercept[IllegalArgumentException] {
      Similarity.ivfPqScoreFromIndex(spark, rootR, queries, nProbe = 3)
    }
    assert(torn.getMessage.contains("torn"), s"wrong error: ${torn.getMessage}")
    // refresh on an OPQ index: arrivals rotate by the PUBLISHED matrix,
    // all four members republish at one version, old codes carried
    val rootF = java.nio.file.Files.createTempDirectory("graft-opq-refresh").toString
    val held = emb.filter(col("vec_id") % 11 === 5)
    val initial = emb.filter(col("vec_id") % 11 =!= 5)
    val f1 = Similarity.publishIvfPqIndex(initial, rootF, token = "f1",
      kIvf = 4, m = 8, ds = 2, kc = 8, rotate = true)
    assert(f1.size == 4 && f1.forall(_.published), s"OPQ initial publish failed: $f1")
    val before = codesOf(rootF).map { case (id, c, l) => id -> ((c, l)) }.toMap
    val f2 = Similarity.refreshIvfPqIndex(spark, rootF, held, token = "f2")
    assert(f2.size == 4 && f2.forall(_.published), s"OPQ refresh failed: $f2")
    val vs = Seq("lists", "books", "codes", "rotation")
      .map(t => Publish.currentVersion(spark, s"$rootF/$t"))
    assert(vs.distinct.size == 1 && vs.head.nonEmpty, s"refresh tore versions: $vs")
    val after = codesOf(rootF)
    assert(after.size == n, s"refresh row count ${after.size} != $n")
    before.foreach { case (id, cl) =>
      val a = after.find(_._1 == id).get
      assert((a._2, a._3) == cl, s"refresh recoded carried vector $id")
    }
    // refreshed arrivals were encoded in the ROTATED space: the
    // end-to-end read path over the refreshed index holds the band floor
    val gotF = Similarity.ivfPqTopKFromIndex(spark, rootF, emb, queries,
      k = 5, refine = 20, nProbe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recallF = (gotF & exact).size.toDouble / exact.size
    info(s"OPQ refreshed-index recall: $recallF")
    assert(recallF >= 0.6, s"refreshed OPQ recall $recallF < 0.6")
  }

  test("ACF period detection (q74): planted period-4 series flags lag 4; flat series is acf 0 with the tie at lag 2; real corpus flags exactly one argmax lag per user") {
    import graft.operators.Relational
    import spark.implicits._
    // planted period: user 1 cycles [1.0, 5.0, 2.0, 8.0] x 12 (n = 48);
    // user 2 is CONSTANT (integer variance 0 -> acf 0 at every lag, so
    // is_period falls to the smallest admissible lag by the tie rule)
    val planted = (1 to 48).map(i =>
      (1L, i.toLong, Seq(1.0, 5.0, 2.0, 8.0)((i - 1) % 4))) ++
      (1 to 20).map(i => (2L, i.toLong, 7.25))
    val df = planted.toDF("user_id", "event_id", "value")
    val out = Relational.tsAcf(df, maxLag = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    val u1 = out.filter(_._1 == 1L)
    assert(u1.length == 8, s"expected 8 lags: ${u1.toSeq}")
    assert(u1.filter(_._4).map(_._2).toSeq == Seq(4L),
      s"planted period not flagged: ${u1.toSeq}")
    // period multiples dominate: acf(4)/acf(8) near their (n-d)/n caps,
    // strictly above every non-multiple lag
    val acfOf = u1.map(t => t._2 -> t._3).toMap
    assert(acfOf(4L) > 0.9 && acfOf(8L) > 0.8, s"periodic acf weak: $acfOf")
    Seq(1L, 2L, 3L, 5L, 6L, 7L).foreach(l =>
      assert(acfOf(l) < acfOf(4L), s"lag $l should lose to lag 4: $acfOf"))
    val u2 = out.filter(_._1 == 2L)
    assert(u2.forall(_._3 == 0.0), s"flat series must be acf 0: ${u2.toSeq}")
    assert(u2.filter(_._4).map(_._2).toSeq == Seq(2L),
      "flat-series tie must break to lag 2 (lag 1 is never a period)")
    // real corpus: exactly one flagged lag per user, always >= 2, and it
    // is that user's argmax over lags >= 2
    val real = Relational.tsAcf(graft.Tables.events(spark, sfDir), maxLag = 16)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    real.groupBy(_._1).foreach { case (u, rows) =>
      val flagged = rows.filter(_._4)
      assert(flagged.length == 1, s"user $u flagged ${flagged.length} lags")
      assert(flagged.head._2 >= 2L, s"user $u flagged the trend lag")
      val best = rows.filter(_._2 >= 2L).map(_._3).max
      assert(flagged.head._3 == best, s"user $u flag is not the acf argmax")
    }
  }

  test("seasonal decomposition (q76): planted trend+period-4 signal separates exactly; value == trend + seasonal + resid; interior-row contract") {
    import graft.operators.Relational
    import spark.implicits._
    // value(i) = linear trend 0.1*i + periodic base[(i-1) % 4]: the 2x4
    // centered MA recovers linear-plus-cycle-mean EXACTLY, so the
    // residual must be identically zero and the seasonal must equal the
    // de-meaned cycle
    val base = Seq(1.0, 5.0, 2.0, 8.0) // mean 4.0
    val df = (1 to 40).map(i => (1L, i.toLong, base((i - 1) % 4) + 0.1 * i))
      .toDF("user_id", "event_id", "value")
    val out = Relational.tsSeasonalDecompose(df, period = 4).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(out.length == 36, s"interior rows: ${out.length}")  // 40 - 2h*2
    out.foreach { case (p, _, trend, seasonal, resid) =>
      assert(resid == 0.0, s"planted signal must leave zero residual at $p: $resid")
      val expTrend = 4.0 + 0.1 * p
      assert(math.abs(trend - expTrend) <= 1e-4, s"trend at $p: $trend != $expTrend")
      val expSeas = base(((p - 1) % 4).toInt) - 4.0
      assert(math.abs(seasonal - expSeas) <= 1e-4, s"seasonal at $p: $seasonal != $expSeas")
    }
    // real corpus: additive identity up to the three r4 roundings, and
    // the interior-row contract n - period per user
    val events = graft.Tables.events(spark, sfDir)
    val real = Relational.tsSeasonalDecompose(events, period = 4).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    val n = events.count()
    val users = events.select("user_id").distinct().count()
    assert(real.length == n - 4 * users,
      s"interior contract: ${real.length} != $n - 4*$users")
    real.foreach { case (u, v, t, s, r) =>
      assert(math.abs(v - (t + s + r)) <= 2e-4,
        s"identity broke for user $u: $v vs ${t + s + r}")
    }
    // seasonal indices re-center BY CONSTRUCTION: the P distinct phase
    // indices sum to Σm − P·madj = 0 per user (up to IEEE residue)
    val byPhase = Relational.tsSeasonalDecompose(events, period = 4).collect()
      .map(r => ((r.getLong(0), r.getLong(1) % 4), r.getDouble(4)))
      .groupBy(_._1).toSeq.map { case (k, vs) => (k._1, vs.head._2) }
    byPhase.groupBy(_._1).foreach { case (u, idx) =>
      assert(idx.size == 4, s"user $u missing phases")
      val s = idx.map(_._2).sum
      // each index is r4-quantized, so the zero-sum holds to 4 x 5e-5
      assert(math.abs(s) < 2.5e-4, s"seasonal indices of user $u sum to $s")
    }
  }

  test("OLS trend line (q81): an exact line fits with r2 = 1 and the true coefficients; a constant fits slope 0 / r2 0 at its mean; noise lands strictly between") {
    import graft.operators.Relational
    import spark.implicits._
    val df = ((1 to 50).map(i => (1L, i.toLong, 2.0 + 0.1 * i)) ++
      (1 to 50).map(i => (2L, i.toLong, 7.25)) ++
      (1 to 50).map(i => (3L, i.toLong, 1.0 + 0.2 * i + (if (i % 2 == 0) 3.0 else -3.0))) ++
      Seq((4L, 1L, 9.0))) // single event: no slope, drops
      .toDF("user_id", "event_id", "value")
    val out = Relational.tsTrendLine(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(!out.contains(4L), "single-event user must drop")
    val (n1, s1, i1, r1) = out(1L)
    assert(n1 == 50L && s1 == 0.1 && i1 == 2.0 && r1 == 1.0,
      s"exact line misfit: $s1 $i1 $r1")
    val (_, s2, i2, r2v) = out(2L)
    assert(s2 == 0.0 && i2 == 7.25 && r2v == 0.0, s"constant misfit: $s2 $i2 $r2v")
    val (_, s3, _, r3) = out(3L)
    assert(math.abs(s3 - 0.2) < 0.02 && r3 > 0.4 && r3 < 1.0,
      s"noisy fit out of band: $s3 $r3")
  }

  test("CUSUM alarms (q80): a mean shift past the allowance alarms once at the exact evidence-crossing position; in-band drift never alarms") {
    import graft.operators.Relational
    import spark.implicits._
    // mu0 = 5 (16-sample warm-up); k = 2, H = 12. User 2 shifts 5 -> 9
    // at p = 41: evidence grows (9-5-2) = 2/step, crosses H = 12 at
    // p = 47 with S = 14 exactly — integer arithmetic, no tolerance.
    // User 3 drifts to exactly mu0 + k = 7: deviation 0, never alarms.
    val df = ((1 to 60).map(i => (1L, i.toLong, 5.0)) ++
      (1 to 60).map(i => (2L, i.toLong, if (i <= 40) 5.0 else 9.0)) ++
      (1 to 60).map(i => (3L, i.toLong, if (i <= 16) 5.0 else 7.0)))
      .toDF("user_id", "event_id", "value")
    val out = Relational.tsCusumAlarms(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((2L, 47L, 14.0)),
      s"expected exactly one alarm (2, 47, 14.0): ${out.toSeq}")
  }

  test("CCF lead/lag (q79): planted A-leads-B peaks at +3, planted B-leads-A at -5; parity-impossible lags drop; a flat slice zeroes the curve") {
    import graft.operators.Relational
    import spark.implicits._
    def av(k: Long) = ((k * 37) % 97).toDouble
    // user 1: A on odd positions, B on even; every B value echoes the A
    // value 3 positions earlier -> the pair (pA, pA+3) is identical and
    // the CCF peaks at lag +3 (A LEADS). Parity makes every A->B gap
    // odd, so even lags have no pairs at all.
    val u1 = (1 to 80).map { t =>
      val v = if (t % 2 == 1) av(t) else if (t > 3) av(t - 3) else 50.0
      (1L, t.toLong, if (t % 2 == 1) "click" else "purchase", v)
    }
    // user 2: roles swapped and A echoes B from 5 positions earlier ->
    // the peak sits at lag -5 (B LEADS; the negative axis is real)
    val u2 = (1 to 80).map { t =>
      val v = if (t % 2 == 1) av(t + 13) else if (t > 5) av(t - 5 + 13) else 20.0
      (2L, t.toLong, if (t % 2 == 0) "click" else "purchase", v)
    }
    // user 3: constant A slice -> exact integer variance 0 -> zero curve
    val u3 = (1 to 20).map(t =>
      (3L, t.toLong, if (t % 2 == 1) "click" else "purchase",
        if (t % 2 == 1) 5.0 else av(t)))
    val df = (u1 ++ u2 ++ u3)
      .toDF("user_id", "event_id", "event_type", "value")
    val out = Relational.tsCcf(df, "click", "purchase", maxLag = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    val p1 = out.filter(t => t._1 == 1L && t._4)
    assert(p1.map(_._2).toSeq == Seq(3L) && p1.head._3 > 0.9,
      s"A-leads peak wrong: ${out.filter(_._1 == 1L).toSeq}")
    assert(out.filter(_._1 == 1L).forall(t => (t._2 % 2 + 2) % 2 == 1),
      "even lags must have no pairs under the parity layout")
    val p2 = out.filter(t => t._1 == 2L && t._4)
    assert(p2.map(_._2).toSeq == Seq(-5L) && p2.head._3 > 0.9,
      s"B-leads peak wrong: ${out.filter(_._1 == 2L).toSeq}")
    val f3 = out.filter(_._1 == 3L)
    assert(f3.nonEmpty && f3.forall(_._3 == 0.0),
      s"flat slice must zero the curve: ${f3.toSeq}")
  }

  test("seasonal forecast (q78): a planted trend+period-4 signal extrapolates to its exact continuation; short users drop; horizon/phase contract") {
    import graft.operators.Relational
    import spark.implicits._
    val base = Seq(1.0, 5.0, 2.0, 8.0)
    val df = ((1 to 40).map(i => (1L, i.toLong, base((i - 1) % 4) + 0.1 * i)) ++
      Seq((2L, 1L, 3.0), (2L, 2L, 4.0), (2L, 3L, 5.0))) // < period+1: no interior pair
      .toDF("user_id", "event_id", "value")
    val out = Relational.tsSeasonalForecast(df, period = 4, h = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // user 2 has zero interior rows (n=3 < 2h+1) -> drops entirely
    assert(out.forall(_._1 == 1L), s"short user must not forecast: ${out.toSeq}")
    val u1 = out.filter(_._1 == 1L)
    assert(u1.map(_._2).sorted.toSeq == (1L to 8L).toSeq, s"horizon: ${u1.toSeq}")
    // on the exactly-decomposable signal the drift slope IS the true
    // 0.1/step and the phase index the true de-meaned cycle, so the
    // forecast equals the signal's continuation
    u1.foreach { case (_, _, pos, f) =>
      val truth = base(((pos - 1) % 4).toInt) + 0.1 * pos
      assert(math.abs(f - truth) <= 1e-3,
        s"forecast at pos $pos: $f != continuation $truth")
    }
    // positions continue the series: last interior p is 38, horizon 39..46
    assert(u1.map(_._3).sorted.toSeq == (39L to 46L).toSeq)
  }

  test("seasonal anomaly gate (q77): clean periodic series flags nothing; a planted spike flags only its MA footprint where the raw IQR gate flags every cycle peak") {
    import graft.operators.Relational
    import spark.implicits._
    // user 1: pure period-4 [0,0,0,10] — residual identically 0, no flags;
    // user 2: same cycle with a +100 spike at one zero-phase position
    val cycle = Seq(0.0, 0.0, 0.0, 10.0)
    val clean = (1 to 80).map(i => (1L, i.toLong, cycle((i - 1) % 4)))
    // the spike replaces a cycle PEAK (i=28, phase 3): the raw 75th
    // percentile then interpolates inside the zeros (19 peaks < 25% of
    // rows), so the raw fence flags every remaining peak
    val spiked = (1 to 80).map(i =>
      (2L, i.toLong, if (i == 28) 100.0 else cycle((i - 1) % 4)))
    val df = (clean ++ spiked).toDF("user_id", "event_id", "value")
    val out = Relational.tsSeasonalAnomalies(df, period = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(4)))).toMap
    assert(out(1L) == ((76L, 0L)), s"clean series must flag nothing: ${out(1L)}")
    val (nInt, nOut) = out(2L)
    assert(nInt == 76L)
    // the spike's MA footprint is +-h rows: 1..(2h+1) flags, never the
    // cycle peaks
    assert(nOut >= 1L && nOut <= 6L, s"spiked series flagged $nOut rows")
    // contrast: q54's RAW-value fence on the same user flags every cycle
    // peak (20 of them) — the decomposition is what makes the gate
    // usable on periodic telemetry
    val raw = df.filter(col("user_id") === 2L)
      .agg(expr("percentile(value, 0.25)").as("q1"),
        expr("percentile(value, 0.75)").as("q3")).collect().head
    val (rq1, rq3) = (raw.getDouble(0), raw.getDouble(1))
    val (rlo, rhi) = (rq1 - 1.5 * (rq3 - rq1), rq3 + 1.5 * (rq3 - rq1))
    val rawFlags = spiked.count { case (_, _, v) => v < rlo || v > rhi }
    assert(rawFlags >= 15, s"fixture lost its point: raw gate flags $rawFlags")
    assert(nOut < rawFlags / 2,
      s"seasonal gate ($nOut) must be far more precise than raw ($rawFlags)")
  }

  test("AB-join profile (q75): planted containment scores 0 aligned; constant-B ties break to the earliest start; brute force replays the diagonal path bit-exactly") {
    import graft.operators.Relational
    import spark.implicits._
    // user 1: B is an exact copy of the strictly-increasing A series, so
    // every A window finds its aligned twin at dist 0 (strict increase
    // makes the argmin unique); user 2: constant far-away B, so every B
    // window is identical and the (dist, nn_start) tie breaks to sb = 1
    val a1 = (1 to 12).map(i => (1L, i.toLong, "click", i * 1.5))
    val b1 = (1 to 12).map(i => (1L, (100 + i).toLong, "view", i * 1.5))
    val a2 = (1 to 6).map(i => (2L, i.toLong, "click", i * 2.0))
    val b2 = (1 to 6).map(i => (2L, (100 + i).toLong, "view", 50.0))
    val df = (a1 ++ b1 ++ a2 ++ b2)
      .toDF("user_id", "event_id", "event_type", "value")
    val out = Relational.tsAbJoinProfile(df, "click", "view", L = 4, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val u1 = out.filter(_._1 == 1L)
    assert(u1.map(_._2).sorted.toSeq == Seq(1L, 3L, 5L, 7L, 9L),
      s"A grid windows wrong: ${u1.toSeq}")
    u1.foreach { case (_, s, nn, d) =>
      assert(nn == s && d == 0.0, s"containment missed at start $s: nn=$nn dist=$d")
    }
    val u2 = out.filter(_._1 == 2L)
    assert(u2.length == 2 && u2.forall(t => t._3 == 1L && t._4 > 0.0),
      s"constant-B tie rule broke: ${u2.toSeq}")
    // real corpus: a direct per-pair fold over both window tables (the
    // q59 oracle discipline, in-suite) == the diagonal incremental path
    val events = graft.Tables.events(spark, sfDir)
    val got = Relational.tsAbJoinProfile(events, "click", "view",
        L = 4, stride = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sorted
    def series(tpe: String): Map[Long, Vector[Long]] = events
      .filter(col("event_type") === tpe)
      .select("user_id", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).map { case (u, rows) =>
        u -> rows.sortBy(_._2).map(t =>
          math.floor(t._3 * 100 + 0.5).toLong).toVector
      }
    def windows(v: Vector[Long]) =
      (1 to (v.length - 3) by 2).map(s => s.toLong -> v.slice(s - 1, s + 3))
    val sa = series("click"); val sbm = series("view")
    val expected = sa.toSeq.flatMap { case (u, va) =>
      val wbs = sbm.get(u).map(windows).getOrElse(Seq.empty)
      if (wbs.isEmpty) Seq.empty
      else windows(va).map { case (s, xs) =>
        val (d, nn) = wbs.map { case (s2, ys) =>
          val di = xs.zip(ys).map { case (x, y) => (x - y) * (x - y) }.sum
          (Num.r4Double(di.toDouble / 10000.0), s2)
        }.min
        (u, s, nn, d)
      }
    }.sorted
    assert(got == expected,
      s"AB-join diverges from brute force (${got.length} vs ${expected.length})")
  }
}

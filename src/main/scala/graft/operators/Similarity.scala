package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.{CosineSimilarity => CosF}
import Num._

/** Similarity search (SURVEY.md §2 D1–D3) over the embeddings table.
  *
  * Scale design: the query set is small and broadcast; the corpus is
  * scanned once. Top-k goes through a window row_number bounded per
  * partition-key — no global collect. The LSH variants bucket by
  * random-hyperplane sign bits so the candidate join shuffles on the
  * bucket key instead of going quadratic.
  */
object Similarity {

  private val K = 5
  private val NQueries = 10

  /** Corpus fraction the PQ/IVF-PQ refine pool must cover (r11 verdict
    * item 3: a refine pool that is a FIXED multiple of K covers a
    * shrinking corpus fraction as the table grows — s6's 30·K pool
    * passed at sf0.01 and sat at 0.78 recall at sf0.1, caught only by
    * the driver gate). ADC rank displacement grows ~linearly with the
    * corpus for iid embeddings (a candidate's quantized rank error is a
    * per-pair property, so the COUNT of false-ahead candidates scales
    * with n), which makes the FRACTION the stable knob: 0.15 is the
    * measured sf0.1 operating point (pool 300/2000 → recall 0.96-1.0;
    * probe table in SURVEY §6). The floor keeps tiny corpora effectively
    * exhaustive; production tunes the fraction down as measured ADC
    * displacement allows, never back to a fixed count.
    */
  private val RefineFraction = 0.15

  /** Refine-pool size: max(floorPool, ceil(RefineFraction·n)). */
  private def refinePool(n: Long, floorPool: Int): Int =
    math.max(floorPool, math.ceil(RefineFraction * n).toInt)

  /** Corpus size at or below which the approximate entries probe
    * EXHAUSTIVELY (the refinePool corpus-aware discipline applied to
    * probe pruning, r16): pruning — LSH probe balls, IVF nProbe <
    * nLists — is a SCALE optimization, not a correctness feature, and
    * on a corpus this small the pruned scan saves nothing while a fixed
    * geometry can drop recall below the spec floors on an unlucky tiny
    * sample (measured on the sf0.001 embeddings: s2 0.60 vs its 0.8
    * floor, s14 under its 0.7 — the r16 inherited-state fix). At or
    * below this size the probe set covers the table (LSH: full-radius
    * masks, so the candidate set IS the corpus; IVF: nProbe = nLists),
    * making the entry exhaustive — recall 1.0 up to the refine pool,
    * under the exact tie-break — while every benched scale (sf0.1 =
    * 2000 vectors and up) keeps its pruning geometry unchanged.
    */
  private val ExhaustiveBelow = 1000L

  /** IVF probe width: all lists at or below [[ExhaustiveBelow]] (the
    * downstream probe selectors cap at the list count), `nProbe` above.
    */
  private def effNProbe(corpusN: Long, nLists: Int, nProbe: Int): Int =
    if (corpusN <= ExhaustiveBelow) nLists else nProbe

  /** Deterministic +-1 hyperplane weight for (plane p, dim i): the sign of
    * a fixed hash — reproducible across engines/runs, no RNG state.
    */
  private def hyperplaneSign(p: Int, i: Column): Column =
    when(pmod(xxhash64(lit(p.toLong * 1000003L) + i), lit(2)) === 0, 1.0).otherwise(-1.0)

  /** Random-hyperplane bucket — codegen'd custom expression (the HOF
    * spelling below is kept as the cross-check oracle for its spec).
    */
  def rhpBucket(v: Column, planes: Int = 16): Column =
    graft.functions.RandomHyperplaneBucket(v, planes)

  /** Interpreted higher-order spelling of [[rhpBucket]]; bit-compatible. */
  def rhpBucketHof(v: Column, planes: Int = 16): Column = {
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, i) => x.cast("double") * hyperplaneSign(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  // D1 — brute-force top-k cosine for a broadcast query set. Oracle-checked.
  private val s1 = Relational.Q(
    "s1_ann_bruteforce_topk",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val c = Tables.spread(e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")))
      val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
        .withColumn("cos", CosF(col("qv"), col("cv")))
      val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
      scored.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= K)
        .select(col("query_id"), col("rnk"), col("neighbor_id"), r4(col("cos")).as("cosine"))
        .orderBy(col("query_id"), col("rnk"))
    },
    Some(s"""
      WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < $NQueries),
      scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
          list_reduce(list_transform(list_zip(q.qv, c.embedding),
            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)
          / sqrt(
              list_reduce(list_transform(q.qv,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y)
              * list_reduce(list_transform(c.embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y)) AS cos
        FROM q JOIN embeddings c ON c.vec_id <> q.query_id),
      ranked AS (
        SELECT query_id, neighbor_id, cos,
          ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
        FROM scored)
      SELECT query_id, rnk, neighbor_id, ${r4Sql("cos")} AS cosine
      FROM ranked WHERE rnk <= $K ORDER BY query_id, rnk"""))

  /** s1's exact ranking reduced to its (query_id, neighbor_id) pair set —
    * the recall denominator every approximate variant's driver frame
    * measures against (same plan shape as s1, minus the score columns).
    */
  private def bruteTopKPairs(e0: DataFrame): DataFrame =
    bruteTopKPairsWhere(e0, lit(true))

  /** The exact gate leg over a FILTERED corpus (s13's denominator: the
    * true top-k among vectors satisfying the predicate).
    */
  private def bruteTopKPairsWhere(e0: DataFrame, corpusPred: Column): DataFrame = {
    val q = e0.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = Tables.spread(e0.filter(corpusPred)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", CosF(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= K)
      .select(col("query_id"), col("neighbor_id"))
  }

  /** The x1 BOUNDS-ORACLE scheme applied to ANN (r10 verdict item 4):
    * the driver-checked frame carries the exact side's replayable counts
    * plus within_floor = overall recall of the approximate top-k vs the
    * exact top-k at the operator's spec floor. DuckDB replays the exact
    * ranking and pins within_floor TRUE — a recall regression in any
    * approximate variant now flips a driver hash red instead of only a
    * local spec. The exact leg exists for the GATE only; Bench times the
    * production spelling via benchFn (the r10 advice's comparability
    * point), so nothing exact is ever benched.
    */
  private def recallBounds(exact: DataFrame, approx: DataFrame, floor: Double): DataFrame = {
    val ex = exact.select(col("query_id"), col("neighbor_id"))
    val hits = ex
      .join(approx.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi")
      .agg(count(lit(1)).as("hits"))
    ex.agg(countDistinct(col("query_id")).as("n_queries"),
        count(lit(1)).as("exact_pairs"))
      .crossJoin(hits)
      .select(col("n_queries"), col("exact_pairs"),
        (col("hits").cast("double") >=
          lit(floor) * col("exact_pairs").cast("double")).as("within_floor"))
  }

  /** Shared oracle for the s1-denominator recall frames: DuckDB replays
    * the exact brute-force top-k side (the s1 oracle's ranking) and pins
    * the achieved-recall boolean TRUE.
    */
  private val exactTopKBoundsSql: String = s"""
      WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < $NQueries),
      scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
          list_reduce(list_transform(list_zip(q.qv, c.embedding),
            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)
          / sqrt(
              list_reduce(list_transform(q.qv,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y)
              * list_reduce(list_transform(c.embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y)) AS cos
        FROM q JOIN embeddings c ON c.vec_id <> q.query_id),
      ranked AS (
        SELECT query_id,
          ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
        FROM scored)
      SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
        COUNT(*) AS exact_pairs, TRUE AS within_floor
      FROM ranked WHERE rnk <= $K"""

  /** s2's LSH geometry: `NTables` independent hash tables of `PlanesPerTable`
    * sign bits each (an OR-construction — a pair is a candidate if it
    * collides in ANY table), with true multi-probe on the query side: each
    * table probes every bucket within hamming `ProbeRadius` of the query's
    * bucket, generated by XOR-ing the bucket with each popcount<=radius
    * mask and equi-joined — never a cross join. All `NTables*PlanesPerTable`
    * planes come from ONE fused codegen rhp_bucket call, bit-sliced into
    * per-table buckets. 4 tables x 8 planes x radius 2 probes 4x37 buckets;
    * measured recall vs s1 is spec-floored at 0.8 — on this near-random
    * corpus (top-k cosines ~0.4, so ~0.37 per-plane flip probability) that
    * costs ~45% expected corpus scan; on genuinely clustered embeddings the
    * same geometry scans far less.
    */
  private val NTables = 4
  private val PlanesPerTable = 8
  private val ProbeRadius = 2
  private def probeMasks(radius: Int): Seq[Long] =
    (0L until (1L << PlanesPerTable)).filter(java.lang.Long.bitCount(_) <= radius)

  /** Join key for table t's (possibly mask-perturbed) bucket: table id in
    * the high bits keeps tables disjoint in one equi-join key space.
    */
  private def tableKey(allBits: Column, t: Int, mask: Long): Column =
    lit(t.toLong << PlanesPerTable).bitwiseOR(
      shiftright(allBits, t * PlanesPerTable)
        .bitwiseAND(lit((1L << PlanesPerTable) - 1))
        .bitwiseXOR(lit(mask)))

  // D2 — multi-table multi-probe LSH ANN. Candidate generation is slim
  // (id, key) rows: the corpus emits one key per table, the (broadcast)
  // query side emits NTables x |ProbeMasks| probe keys; pairs colliding in
  // several tables are deduped on ids BEFORE any vector is carried through
  // a shuffle, then scored via one corpus equi-join. This production
  // spelling is the BENCHED entry; the driver-checked frame is the
  // recall-bounds gate below (floor 0.8 vs s1 — the spec's band, now a
  // driver hash instead of rows-only).
  private def s2TopK(s: SparkSession, d: String): DataFrame = {
      val e = Tables.spread(Tables.embeddings(s, d))
        .withColumn("allbits", rhpBucket(col("embedding"), NTables * PlanesPerTable))
        .persist()
      // corpus-aware probe radius (one count on the frame the pipeline
      // materializes anyway): at/below ExhaustiveBelow the full-radius
      // ball covers every bucket of every table — candidates == corpus
      val radius = if (e.count() <= ExhaustiveBelow) PlanesPerTable else ProbeRadius
      val corpusKeys = e.select(col("vec_id").as("neighbor_id"),
        explode(array((0 until NTables).map(t => tableKey(col("allbits"), t, 0L)): _*)).as("bkey"))
      val probeKeys = e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"),
          explode(array((for { t <- 0 until NTables; m <- probeMasks(radius) }
            yield tableKey(col("allbits"), t, m)): _*)).as("bkey"))
      val cands = corpusKeys.join(broadcast(probeKeys), Seq("bkey"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"))
        .dropDuplicates("query_id", "neighbor_id")
      val qv = e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      // cands is |queries| x bucket-occupancy — corpus-linear, so NO hint:
      // AQE broadcasts it at small scale, and at 1B vectors it becomes the
      // shuffle side of the equi-join. qv stays hinted (query-bounded).
      val scored = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
        .join(cands, Seq("neighbor_id"))
        .join(broadcast(qv), Seq("query_id"))
        .withColumn("cos", CosF(col("qv"), col("cv")))
      val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
      scored.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= K)
        .select(col("query_id"), col("rnk"), col("neighbor_id"), r4(col("cos")).as("cosine"))
        .orderBy(col("query_id"), col("rnk"))
  }

  private val s2 = Relational.Q(
    "s2_ann_lsh_topk",
    (s, d) => recallBounds(bruteTopKPairs(Tables.embeddings(s, d)), s2TopK(s, d), 0.8),
    Some(exactTopKBoundsSql),
    benchFn = Some(s2TopK _))

  // D3 — threshold cosine self-join, the approximate scale path for C5's
  // exact semantics: the same multi-table multi-probe geometry as s2,
  // applied to a self-join (probe masks expand ONE side only; the pair
  // meets if some table's buckets are within hamming <= ProbeRadius).
  // Candidates are slim (id, id) pairs deduped before any vector is
  // fetched; exact cosine verify only on candidates. This production
  // spelling is benched; the driver-checked frame gates recall >= 0.8 vs
  // the exact cos>=0.4 pairs (the spec's band — LSH legitimately misses
  // near-threshold pairs, so the denominator sits above the emit
  // threshold). Output pairs are exact-verified >= 0.3 in-plan, so the
  // subset half of the spec holds by construction.
  private def s3Join(s: SparkSession, d: String): DataFrame = {
      val e = Tables.spread(Tables.embeddings(s, d))
        .withColumn("allbits", rhpBucket(col("embedding"), NTables * PlanesPerTable))
        .persist()
      val aKeys = e.select(col("vec_id").as("id_a"),
        explode(array((for { t <- 0 until NTables; m <- probeMasks(ProbeRadius) }
          yield tableKey(col("allbits"), t, m)): _*)).as("bkey"))
      val bKeys = e.select(col("vec_id").as("id_b"),
        explode(array((0 until NTables).map(t => tableKey(col("allbits"), t, 0L)): _*)).as("bkey"))
      val cands = aKeys.join(bKeys, Seq("bkey"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates("id_a", "id_b")
      val scored = cands
        .join(e.select(col("vec_id").as("id_a"), col("embedding").as("va")), Seq("id_a"))
        .join(e.select(col("vec_id").as("id_b"), col("embedding").as("vb")), Seq("id_b"))
        .withColumn("cos", CosF(col("va"), col("vb")))
      scored
        .filter(col("cos") >= 0.3)
        .select(col("id_a"), col("id_b"), r4(col("cos")).as("cosine"))
        .orderBy(col("id_a"), col("id_b"))
  }

  /** Exact threshold self-join pair set (the s3 recall denominator) —
    * O(n²) pair WORK by definition, but spread d5's way: triangle
    * replication partitions the n²/2 pairs over B(B+1)/2 tasks, so even
    * this gate leg carries no corpus-derived broadcast hint and no
    * single-task funnel (it reuses d5's audited join shape verbatim).
    */
  private def exactJoinPairs(e0: DataFrame, thr: Double): DataFrame = {
    val B = 8
    def sides(id: String, v: String, g: String) = Dedup.triangleSide(
      Tables.spread(e0.select(col("vec_id").as(id), col("embedding").as(v))), id, g, B)
    sides("query_id", "va", "ga")
      .join(sides("neighbor_id", "vb", "gb"), Seq("k1", "k2"))
      .filter(col("query_id") < col("neighbor_id"))
      .filter(Dedup.trianglePairFilter("ga", "gb"))
      .withColumn("cos", CosF(col("va"), col("vb")))
      .filter(col("cos") >= thr)
      .select(col("query_id"), col("neighbor_id"))
  }

  private val s3 = Relational.Q(
    "s3_similarity_join",
    (s, d) => recallBounds(
      exactJoinPairs(Tables.embeddings(s, d), 0.4),
      s3Join(s, d).select(col("id_a").as("query_id"), col("id_b").as("neighbor_id")),
      0.8),
    Some(s"""
      WITH scored AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          list_reduce(list_transform(list_zip(a.embedding, b.embedding),
            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)
          / sqrt(
              list_reduce(list_transform(a.embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y)
              * list_reduce(list_transform(b.embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y)) AS cos
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
      SELECT CAST(COUNT(DISTINCT id_a) AS BIGINT) AS n_queries,
        COUNT(*) AS exact_pairs, TRUE AS within_floor
      FROM scored WHERE cos >= 0.4"""),
    benchFn = Some(s3Join _))

  /** Spherical k-means training for IVF centroids, expressed as DataFrame
    * aggregates end to end. Seeds are the `k` vectors with the smallest
    * md5-derived id hash (deterministic, no RNG state; planned as
    * TakeOrderedAndProject — a per-partition heap merge of k rows, never
    * a global sort). Each Lloyd round is: assign every vector to its
    * max-cosine centroid via a map-side-combinable `max_by` aggregate
    * (the same shape s4's final assignment uses), then recompute each
    * centroid as the element-wise mean in ONE imperative aggregate
    * ([[graft.functions.VectorSumCount]], r13): each map partition
    * forwards one (d+1)-double partial per centroid, so the recompute
    * exchange carries k·d·partitions doubles — parameter-bounded —
    * where the previous posexplode spelling exchanged n·d element rows
    * (corpus-proportional) and needed a second reassembly shuffle.
    * Per-round work is one broadcast of k centroid rows (bounded by the
    * k PARAMETER, not the corpus) + two shuffles of slim frames; rounds
    * are `localCheckpoint`-materialized like d6's pointer-jumping so
    * lineage doesn't stack across iterations. Clusters that lose all
    * members simply drop out (k is an upper bound — standard Lloyd
    * behavior; the assignment join is unaffected). Mean accumulation is
    * float, so centroid bits may differ across retries — acceptable for
    * an approximate index build, and irrelevant to the exact re-scoring
    * every probe performs.
    */
  def trainCentroids(vectors: DataFrame, k: Int, iters: Int = 3): DataFrame =
    centDF(vectors.sparkSession, trainCentroidsLocal(vectors, k, iters))

  /** [[trainCentroids]] returning the k (id, vec) rows driver-local —
    * the r16 Lloyd loop (guide §1.2/§2.4): per round the OLD spelling
    * paid a broadcast build, an n×k broadcast-join expansion carrying
    * the embedding payload, a groupBy(vec_id) exchange of n payload
    * rows, a second groupBy exchange, and an EAGER localCheckpoint; the
    * new round is ONE job — a map-side [[graft.functions.NearestCentroidId]]
    * projection (zero expansion, zero extra exchange) into the same
    * map-side-combinable VectorSumCount aggregate, collected k rows
    * (parameter-bounded). Assignment rule, tie-breaks and the float-mean
    * arithmetic are the old spelling's verbatim; the summation order
    * stays nondeterministic in the same class (the recall floor is
    * what's contractual — the r15 verdict note).
    */
  def trainCentroidsLocal(vectors: DataFrame, k: Int,
      iters: Int = 3): Seq[(Long, Array[Float])] = {
    require(k > 0, s"k must be positive, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    import graft.functions.{HashFunctions => H}
    var cent: Seq[(Long, Array[Float])] = vectors
      .orderBy(H.md5Hash56(col("vec_id").cast("string")), col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("embedding"))
      .collect().toSeq
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    (0 until iters).foreach { _ =>
      if (cent.nonEmpty) {
        val book = graft.functions.CentroidBook.single(cent)
        cent = vectors
          .select(graft.functions.NearestCentroidId(
              col("embedding"), lit(0), book).as("centroid_id"),
            col("embedding"))
          .groupBy(col("centroid_id"))
          .agg(graft.functions.VectorSumCount(
            col("embedding").cast("array<double>")).as("sc"))
          .select(col("centroid_id"),
            transform(col("sc.vsum"), x => (x / col("sc.n")).cast("float")).as("centv"))
          .collect().toSeq
          .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      }
    }
    cent
  }

  /** (centroid_id, centv) frame from driver-local centroid rows — a
    * LocalRelation, so downstream broadcast joins skip the build job.
    */
  private def centDF(spark: SparkSession,
      cent: Seq[(Long, Array[Float])]): DataFrame = {
    import spark.implicits._
    cent.toDF("centroid_id", "centv")
      .select(col("centroid_id"), col("centv").cast("array<float>").as("centv"))
  }

  // D4 — IVF ANN: k-means-trained centroids partition the corpus into
  // inverted lists (each vector assigned to its nearest centroid);
  // queries probe their nProbe nearest lists only. At 100 TB the lists
  // are the partitioning: the corpus scan is replaced by a bucket-pruned
  // read — the join/shuffle shape is identical.
  private def s4TopK(s: SparkSession, d: String): DataFrame = {
      val nProbe = 4
      val e = Tables.spread(Tables.embeddings(s, d))
      // trained centroids (10 lists, 6 Lloyd rounds — the corpus has 10
      // latent label clusters and training recovers them, which is what
      // moves recall: probed lists then ARE the neighbor clusters):
      // queries scan nProbe/10 = 40% of the corpus regardless of SF
      val centArr = trainCentroidsLocal(Tables.embeddings(s, d), k = 10, iters = 6)
      val centroids = centDF(s, centArr)
      // inverted lists: nearest centroid per corpus vector — r16: a
      // MAP-SIDE NearestCentroidId projection over the driver-collected
      // codebook (guide §2.4), replacing the n×k broadcast-join
      // expansion + groupBy(vec_id) max_by exchange of n payload rows.
      // Winner and tie-break (ccos desc, centroid_id asc) are identical.
      val assigned = e.select(col("vec_id"), col("embedding"),
          graft.functions.NearestCentroidId(col("embedding"), lit(0),
            graft.functions.CentroidBook.single(centArr)).as("centroid_id"))
        .persist()
      // corpus-aware probe width (one count on the persisted assignment
      // frame the query path materializes anyway): exhaustive at tiny n
      val nProbeEff = effNProbe(assigned.count(), 10, nProbe)
      // queries probe their nProbe nearest centroids
      val q = assigned.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val wProbe = Window.partitionBy(col("query_id")).orderBy(col("pcos").desc, col("centroid_id"))
      val probes = q.join(broadcast(centroids), lit(true))
        .withColumn("pcos", CosF(col("qv"), col("centv")))
        .withColumn("prnk", row_number().over(wProbe))
        .filter(col("prnk") <= nProbeEff)
        .select(col("query_id"), col("qv"), col("centroid_id"))
      // search only the probed lists
      val scored = probes
        .join(assigned.select(col("centroid_id"), col("vec_id").as("neighbor_id"), col("embedding").as("cv")),
          Seq("centroid_id"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("cos", CosF(col("qv"), col("cv")))
      val wTop = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
      scored.withColumn("rnk", row_number().over(wTop).cast("long"))
        .filter(col("rnk") <= K)
        .select(col("query_id"), col("rnk"), col("neighbor_id"), r4(col("cos")).as("cosine"))
        .orderBy(col("query_id"), col("rnk"))
  }

  // Driver frame gates the trained index at the spec's 0.6 measured-band
  // floor (training is float-mean nondeterministic, so the achieved
  // recall varies run to run — the floor is what's contractual).
  private val s4 = Relational.Q(
    "s4_ann_ivf_topk",
    (s, d) => recallBounds(bruteTopKPairs(Tables.embeddings(s, d)), s4TopK(s, d), 0.6),
    Some(exactTopKBoundsSql),
    benchFn = Some(s4TopK _))

  // D5 — scalar-quantized (int8) ANN with exact re-rank: vectors are
  // symmetrically quantized per-vector to 127/max|x| (cosine is scale-
  // invariant, so per-vector scales cancel and the quantized cosine
  // approximates the float cosine directly), the corpus is scanned on the
  // int8 representation — 4x less IO than float32, the reason quantized
  // scans exist at 100 TB — and the top `Refine` quantized candidates per
  // query are re-ranked with the exact float cosine (standard
  // quantize-scan + refine). Quantization itself is WRITE-PATH work (done
  // once when the embedding table is produced; HOF transform is fine
  // there); the read path is the codegen CosineSimilarity over the cast
  // int8 arrays. Rows-only; spec floors recall vs s1.
  private val s5 = Relational.Q(
    "s5_ann_quantized_topk",
    (s, d) => {
      val Refine = 3 * K
      val e = Tables.spread(Tables.embeddings(s, d))
      // scale computed ONCE per vector in a prior projection — Catalyst
      // does not hoist loop-invariant subexpressions out of HOF lambdas,
      // so an inline array_max(transform(...)) would re-scan the vector
      // for every element (O(d²) with a fresh array per element)
      val quant = e.select(col("vec_id"), col("embedding"),
        greatest(array_max(transform(col("embedding"), abs(_))), lit(1e-9f)).as("qscale"))
        .select(col("vec_id"), col("embedding"),
          transform(col("embedding"),
            x => round(x * lit(127.0) / col("qscale")).cast("tinyint")).as("q8"))
        .persist()
      val q = quant.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("q8").as("qq8"))
      // quantized scan: int8 arrays cast to float inside codegen, scored
      // by the same custom expression — no interpreted HOF in the scan
      val scored = quant.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"), col("q8"))
        .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
        .withColumn("qcos", CosF(col("qq8").cast("array<float>"), col("q8").cast("array<float>")))
      val wq = Window.partitionBy(col("query_id")).orderBy(col("qcos").desc, col("neighbor_id"))
      val refined = scored.withColumn("qrnk", row_number().over(wq))
        .filter(col("qrnk") <= Refine)
        .withColumn("cos", CosF(col("qv"), col("cv")))
      val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
      refined.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= K)
        .select(col("query_id"), col("rnk"), col("neighbor_id"), r4(col("cos")).as("cosine"))
        .orderBy(col("query_id"), col("rnk"))
    },
    // FULL oracle (promoted r9 — the r8 verdict's remaining-visibility
    // item): unlike the trained variants (s4/s6), s5's whole pipeline is
    // DETERMINISTIC — per-vector 127/max|x| scaling, round-half-away-
    // from-zero (Spark HALF_UP == DuckDB round), tinyint -> float ->
    // double widening all exact, so the quantized cosines are exact
    // integers over sqrt(exact integers) and BOTH the candidate ranking
    // and the exact re-rank replay bit-identically in DuckDB (the d5
    // list-fold contract). The oracle rebuilds the int8 corpus, ranks by
    // quantized cosine, refines the top 3K, re-ranks by exact cosine.
    Some(s"""
      WITH qn AS (
        SELECT vec_id, embedding,
          greatest(list_max(list_transform(embedding, x -> abs(x))),
            CAST(1e-9 AS FLOAT)) AS qscale
        FROM embeddings),
      quant AS (
        SELECT vec_id, embedding,
          list_transform(embedding,
            x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / CAST(qscale AS DOUBLE)) AS TINYINT)) AS q8
        FROM qn),
      q AS (SELECT vec_id AS query_id, embedding AS qv, q8 AS qq8
            FROM quant WHERE vec_id < $NQueries),
      scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id, q.qv, c.embedding AS cv,
          list_reduce(list_transform(list_zip(q.qq8, c.q8),
            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)
          / sqrt(
              list_reduce(list_transform(q.qq8,
                v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y)
              * list_reduce(list_transform(c.q8,
                  v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y)) AS qcos
        FROM q JOIN quant c ON c.vec_id <> q.query_id),
      cand AS (
        SELECT query_id, neighbor_id, qv, cv,
          ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY qcos DESC, neighbor_id) AS qrnk
        FROM scored),
      ex AS (
        SELECT query_id, neighbor_id,
          list_reduce(list_transform(list_zip(qv, cv),
            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)
          / sqrt(
              list_reduce(list_transform(qv,
                v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y)
              * list_reduce(list_transform(cv,
                  v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y)) AS cos
        FROM cand WHERE qrnk <= ${3 * K}),
      ranked AS (
        SELECT query_id, neighbor_id, cos,
          ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
        FROM ex)
      SELECT query_id, rnk, neighbor_id, ${r4Sql("cos")} AS cosine
      FROM ranked WHERE rnk <= $K ORDER BY query_id, rnk"""))

  /** KEYED spherical k-means — [[trainCentroids]] generalized to train
    * one independent codebook per `sub` key in the SAME pass: every
    * Lloyd round is still one broadcast (now m*k rows — bounded by the
    * m, k PARAMETERS) + two slim shuffles, but all m subspace codebooks
    * advance together, so the round count (and driver round-trips) is
    * `iters`, not m*iters. Seed selection reuses the scale-right
    * TakeOrderedAndProject shape: the k smallest-hash vec_ids are chosen
    * ONCE on the base frame (k-row heap merge, no global sort) and their
    * subvectors seed every subspace.
    *
    * Input: (sub, vec_id, embedding) — `seedFrom` supplies the
    * (vec_id)-keyed frame used for seed selection.
    */
  def trainCentroidsKeyed(subVectors: DataFrame, seedFrom: DataFrame,
      k: Int, iters: Int = 3, metric: String = "cos"): DataFrame =
    keyedCentDF(subVectors.sparkSession,
      trainCentroidsKeyedLocal(subVectors, seedFrom, k, iters, metric))

  /** [[trainCentroidsKeyed]] returning the m·k (sub, id, vec) rows
    * driver-local — the r16 Lloyd loop ([[trainCentroidsLocal]]'s shape
    * with the per-`sub` codebook dispatched inside the ONE map-side
    * [[graft.functions.NearestCentroidId]] projection). Semantics
    * preserved verbatim: a zero subvector has no cosine and the "cos"
    * metric pinned it to −2 (below every real cosine, ties to the
    * smallest centroid id) — the expression's invalid-below-valid order
    * picks the same winner; metric "l2" (the published PQ formulation —
    * Jégou et al. 2011) scores by NEGATED squared Euclidean distance,
    * where a ragged score was an un-coalesced NULL — the same
    * invalid-below-valid order again (Spark ranks a null struct head
    * below every non-null). Float-mean arithmetic unchanged.
    */
  def trainCentroidsKeyedLocal(subVectors: DataFrame, seedFrom: DataFrame,
      k: Int, iters: Int = 3,
      metric: String = "cos"): Seq[(Int, Long, Array[Float])] = {
    require(k > 0, s"k must be positive, got $k")
    require(metric == "cos" || metric == "l2", s"unknown PQ metric '$metric'")
    import graft.functions.{HashFunctions => H}
    val seedIds = seedFrom
      .orderBy(H.md5Hash56(col("vec_id").cast("string")), col("vec_id"))
      .limit(k).select(col("vec_id"))
    var cent: Seq[(Int, Long, Array[Float])] = subVectors
      .join(broadcast(seedIds), Seq("vec_id"))
      .select(col("sub"), col("vec_id"), col("embedding"))
      .collect().toSeq
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Float](2).toArray))
    (0 until iters).foreach { _ =>
      if (cent.nonEmpty) {
        val book = graft.functions.CentroidBook.keyed(cent, useL2 = metric == "l2")
        cent = subVectors
          .select(col("sub"),
            graft.functions.NearestCentroidId(
              col("embedding"), col("sub"), book).as("centroid_id"),
            col("embedding"))
          .groupBy(col("sub"), col("centroid_id"))
          .agg(graft.functions.VectorSumCount(
            col("embedding").cast("array<double>")).as("sc"))
          .select(col("sub"), col("centroid_id"),
            transform(col("sc.vsum"), x => (x / col("sc.n")).cast("float")).as("centv"))
          .collect().toSeq
          .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Float](2).toArray))
      }
    }
    cent
  }

  /** (sub, centroid_id, centv) LocalRelation from driver-local rows. */
  private def keyedCentDF(spark: SparkSession,
      cent: Seq[(Int, Long, Array[Float])]): DataFrame = {
    import spark.implicits._
    cent.toDF("sub", "centroid_id", "centv")
      .select(col("sub"), col("centroid_id"),
        col("centv").cast("array<float>").as("centv"))
  }

  /** The (sub, vec_id, subvector) frame for PQ: m contiguous ds-dim
    * slices per vector, built map-side from the array (no window).
    */
  def pqSubVectors(vectors: DataFrame, m: Int, ds: Int): DataFrame =
    vectors.select(col("vec_id"), posexplode(expr(
        s"transform(sequence(0, ${m - 1}), i -> slice(embedding, i * $ds + 1, $ds))"))
      .as(Seq("sub", "sv")))
      .select(col("sub"), col("vec_id"), col("sv").as("embedding"))

  // D6 — product-quantization ANN: m=8 subspaces x k=16 centroids
  // (codes are 8 x 4 bits = 4 bytes/vector vs 256 bytes float32 — the
  // 64x compression is what makes billion-vector scans affordable).
  // Codebooks are trained per subspace (keyed k-means above), the corpus
  // is encoded by a broadcast-codebook max_by (map-side-combinable, the
  // s4 assignment shape), and queries scan the RECONSTRUCTED vectors
  // (asymmetric distance: exact query vs quantized corpus), refine the
  // top candidates against the true float vectors fetched by equi-join,
  // and emit exact-re-ranked top-k. At 100 TB the stored artifact is the
  // 4-byte code column; the reconstruction join shape is unchanged.
  // The driver frame gates recall >= 0.8 vs s1 (the spec's band); the
  // spec additionally pins the compression ratio.
  private def s6TopK(s: SparkSession, d: String): DataFrame = {
      // Refine pool is CORPUS-AWARE (r12, closing the r11 verdict's
      // scale note on the fixed 60·K rule): max(60·K, ceil(0.15·n)).
      // History: a fixed 150 covered 7.5% of sf0.1's 2000 vectors and
      // recall dipped to 0.78 under the 0.8 driver floor; 300 restored
      // 0.96 — but a fixed 300 at 10× the vectors would be 1.5%
      // coverage and trip again. The fraction leg keeps coverage (and
      // measured recall) stable as n grows; the 60·K floor keeps tiny
      // corpora effectively exhaustive. n is one count on the already-
      // persisted corpus frame (metadata-cheap at scale).
      val M = 8; val Ds = 8; val Kc = 16
      val e = Tables.spread(Tables.embeddings(s, d)).persist()
      val Refine = refinePool(e.count(), 60 * K)
      val subs = pqSubVectors(e, M, Ds)
      val booksArr = trainCentroidsKeyedLocal(subs, e, Kc, iters = 4)
      // r16 encode+reconstruct (guide §2.4): one map-side projection —
      // PqEncodeCodes arg-maxes each subspace against the driver-collected
      // codebook (the exploded-slice ⋈ broadcast-books + double-groupBy
      // pipeline's winner, verbatim tie-breaks) and PqReconstruct
      // assembles x̂ from the same id-sorted codebook layout in subspace
      // order. Two exchanges and an n×m expansion deleted; ADC scan
      // unchanged. A null embedding produced no exploded rows before and
      // yields a null x̂ now — the isNotNull filter keeps the scan's row
      // set identical.
      val encBook = graft.functions.CentroidBook.keyed(booksArr, useL2 = false)
      val bcBooks = s.sparkContext.broadcast(encBook.vecs)
      val xhat = e.select(col("vec_id"),
          graft.functions.PqReconstruct(
            graft.functions.PqEncodeCodes(col("embedding"), Ds, encBook),
            bcBooks).as("xhat"))
        .filter(col("xhat").isNotNull)
      val q = e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      // ADC scan is SLIM: only x-hat crosses the scan; true vectors are
      // fetched by equi-join for the Refine survivors only
      val scored = xhat.select(col("vec_id").as("neighbor_id"), col("xhat"))
        .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
        .withColumn("acos", CosF(col("qv"), col("xhat")))
      val wq = Window.partitionBy(col("query_id")).orderBy(col("acos").desc, col("neighbor_id"))
      val refined = scored.withColumn("qrnk", row_number().over(wq))
        .filter(col("qrnk") <= Refine)
        .select(col("query_id"), col("qv"), col("neighbor_id"))
        .join(e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")), Seq("neighbor_id"))
        .withColumn("cos", CosF(col("qv"), col("cv")))
      val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
      refined.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= K)
        .select(col("query_id"), col("rnk"), col("neighbor_id"), r4(col("cos")).as("cosine"))
        .orderBy(col("query_id"), col("rnk"))
  }

  private val s6 = Relational.Q(
    "s6_ann_pq_topk",
    (s, d) => recallBounds(bruteTopKPairs(Tables.embeddings(s, d)), s6TopK(s, d), 0.8),
    Some(exactTopKBoundsSql),
    benchFn = Some(s6TopK _))

  // ============ D7 — the versioned ANN-index lifecycle (s7) ============
  //
  // The production ANN shape s6 only gestures at: the index is BUILT
  // ONCE (train + encode, the expensive passes), published as a
  // versioned artifact through G16's write-audit-publish, and QUERIED
  // MANY TIMES from the published bytes — the query path never trains,
  // never re-encodes, and moves ZERO corpus-proportional data before
  // the rank reduction (plan-asserted in the spec).

  /** Build the PQ index artifacts s6 trains in-query, as standalone
    * frames ready to persist:
    *   - codebooks (sub, cid, centv): cid is a DENSE per-subspace code
    *     assigned by centroid order — the stored artifact indexes
    *     centroids by position (what a code column means), not by the
    *     training-seed vec_id (an accident of initialization). The
    *     dense-rank window is parameter-bounded (m partitions of <= kc
    *     rows).
    *   - codes (vec_id, codes): codes[sub] = that subspace's cid — ONE
    *     slim row per vector, the 100 TB artifact (m small ints per
    *     vector; parquet's dictionary/bit-packing stores 4-bit codes as
    *     roughly the 4 bytes/vector the PQ literature quotes).
    */
  def buildPqIndex(e: DataFrame, m: Int = 8, ds: Int = 8, kc: Int = 16,
      iters: Int = 4): (DataFrame, DataFrame) = {
    val subs = pqSubVectors(e, m, ds)
    val raw = trainCentroidsKeyed(subs, e, kc, iters)
    val wSub = Window.partitionBy(col("sub")).orderBy(col("centroid_id"))
    val books = raw
      .withColumn("cid", (row_number().over(wSub) - 1).cast("int"))
      .select(col("sub"), col("cid"), col("centv"))
    (books, encodePq(subs, books))
  }

  /** Encode subvectors against a (sub, cid, centv) codebook frame — the
    * deterministic half of the index build (training is float-mean
    * nondeterministic across runs; encoding under FIXED books is exact:
    * same cosines, total max_by tie-break). Factored out so the spec
    * can re-encode under the PUBLISHED books and pin the stored codes
    * bit-exactly.
    */
  /** Per-subvector assignment score under `metric`: "cos" = the pack's
    * spherical convention (NaN/zero pinned to -2), "l2" = negated
    * squared Euclidean distance (Jégou et al. 2011's PQ objective).
    * Both feed the same max_by, so tie-breaking is shared.
    */
  private def subScore(metric: String, v: Column, centv: Column): Column =
    metric match {
      case "cos" => coalesce(CosF(v, centv), lit(-2.0))
      // codegen'd fused loop (H14's sibling) — bit-identical to the HOF
      // aggregate∘zip_with fold it replaced, spec-pinned
      case "l2" => -graft.functions.SquaredDistance(v, centv)
      case other => throw new IllegalArgumentException(
        s"unknown PQ metric '$other' (cos | l2)")
    }

  def encodePq(subs: DataFrame, books: DataFrame,
      metric: String = "cos"): DataFrame =
    subs.join(broadcast(books), Seq("sub"))
      .withColumn("scos", subScore(metric, col("embedding"), col("centv")))
      .groupBy(col("sub"), col("vec_id"))
      .agg(max_by(col("cid"), struct(col("scos"), (-col("cid")).as("tie"))).as("cid"))
      .groupBy(col("vec_id"))
      .agg(transform(array_sort(collect_list(struct(col("sub"), col("cid")))),
        f => f.getField("cid")).as("codes"))

  /** Publish the PQ index under `root` (books + codes as two WAP tables
    * sharing one version sequence) — each table audited against its
    * structural contract on the STAGED bytes before its pointer moves:
    * a malformed artifact quarantines and readers keep the prior
    * version. The codes audit pins exact row count (one row per corpus
    * vector — `expectedVectors` comes from the corpus the caller just
    * encoded), key uniqueness, and in-range fixed-width code arrays;
    * the books audit pins subspace coverage, dims, and in-range ids.
    */
  def publishPqIndex(e: DataFrame, root: String, token: String, m: Int = 8,
      ds: Int = 8, kc: Int = 16, iters: Int = 4): (Publish.WapResult, Publish.WapResult) = {
    val (books, codes) = buildPqIndex(e, m, ds, kc, iters)
    val expectedVectors = e.count()
    val booksAudit: Publish.Audit = staged =>
      Publish.columnAudit(
        "books_centv_nonnull" -> col("centv").isNull,
        "books_centv_dim" -> (size(col("centv")) =!= ds),
        "books_sub_in_range" -> (col("sub") < 0 || col("sub") >= m),
        "books_cid_in_range" -> (col("cid") < 0 || col("cid") >= kc))(staged)
        .unionByName(staged.agg(countDistinct(col("sub")).as("n"))
          .select(lit("books_all_subspaces").as("expectation"),
            (lit(m.toLong) - col("n")).cast("long").as("violations"),
            (col("n") === m.toLong).as("pass")))
    val codesAudit: Publish.Audit = staged =>
      Publish.columnAudit(
        "codes_width" -> (size(col("codes")) =!= m),
        "codes_in_range" -> exists(col("codes"), c => c < 0 || c >= kc))(staged)
        .unionByName(staged
          .agg(count(lit(1)).as("n"), countDistinct(col("vec_id")).as("nd"))
          .select(explode(array(
            struct(lit("codes_one_row_per_vector").as("expectation"),
              abs(col("n") - lit(expectedVectors)).cast("long").as("violations")),
            struct(lit("codes_vec_id_unique").as("expectation"),
              (col("n") - col("nd")).cast("long").as("violations")))).as("e"))
          .select(col("e.expectation"), col("e.violations"),
            (col("e.violations") === 0L).as("pass")))
    val br = Publish.writeAuditPublish(books, s"$root/books", booksAudit, token)
    if (!br.published)
      return (br, Publish.WapResult(published = false, None, None,
        Seq(("codes_not_attempted_books_quarantined", 1L))))
    (br, Publish.writeAuditPublish(codes, s"$root/codes", codesAudit, token))
  }

  /** Read the published index — the only sanctioned query-path read.
    * Books and codes publish as separate tables, so the d11-artifact
    * sync discipline applies: both pointers must name the SAME version
    * or the index is torn (a crash between the two publishes) and must
    * be re-published.
    */
  def readPqIndex(spark: SparkSession, root: String): (DataFrame, DataFrame) = {
    val bv = Publish.currentVersion(spark, s"$root/books")
    val cv = Publish.currentVersion(spark, s"$root/codes")
    require(bv.nonEmpty && bv == cv,
      s"PQ index torn: books=$bv codes=$cv — re-publish both from one build")
    (Publish.readPublished(spark, s"$root/books"),
      Publish.readPublished(spark, s"$root/codes"))
  }

  /** ADC scoring straight off the published artifact, with ZERO exchange
    * on the staged side: the codebooks are parameter-bounded (m*kc
    * rows), so they collect into a dense [sub][cid] -> centv LITERAL
    * (the A33 bounded-model-export precedent) and reconstruction is a
    * NARROW map over the codes scan — no re-shuffle of anything
    * corpus-proportional, which is the exchange s6's in-query path pays
    * in its encode groupBy. d11's band index buys the same property
    * with bucketing; here narrowness makes co-location unnecessary.
    * The spec asserts the physical plan has no shuffle exchange.
    */
  def pqScoreFromIndex(spark: SparkSession, root: String, queries: DataFrame): DataFrame = {
    val (booksDf, codes) = readPqIndex(spark, root)
    val rows = booksDf.select(col("sub"), col("cid"), col("centv")).collect()
    require(rows.nonEmpty, "empty codebook artifact")
    val m = rows.map(_.getInt(0)).max + 1
    val booksArr: Array[Array[Array[Float]]] = (0 until m).map { s =>
      rows.filter(_.getInt(0) == s).sortBy(_.getInt(1))
        .map(_.getSeq[Float](2).toArray).toArray
    }.toArray
    // literal below the ceiling, broadcast-backed codegen above it — the
    // readIvfPqIndexLits spill discipline, bit-equal either way
    val payloadFloats =
      booksArr.iterator.map(_.iterator.map(_.length.toLong).sum).sum
    val xhat =
      if (payloadFloats > indexLiteralMaxFloats)
        graft.functions.PqReconstruct(col("codes"),
          spark.sparkContext.broadcast(booksArr))
      else {
        val booksLit = typedlit(booksArr.map(_.map(_.toSeq).toSeq).toSeq)
        flatten(transform(col("codes"),
          (c, s) => element_at(element_at(booksLit, s + 1), c + 1)))
      }
    codes
      .select(col("vec_id").as("neighbor_id"), xhat.as("xhat"))
      .join(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"))), col("neighbor_id") =!= col("query_id"))
      .withColumn("acos", CosF(col("qv"), col("xhat")))
  }

  /** Query the published index end to end: ADC scan -> per-query refine
    * against the true vectors (equi-join fetch, exactly s6's shape) ->
    * exact re-ranked top-k. `corpus` supplies the true vectors for the
    * refine survivors only.
    */
  def pqTopKFromIndex(spark: SparkSession, root: String, corpus: DataFrame,
      queries: DataFrame, k: Int, refine: Int): DataFrame = {
    val scored = pqScoreFromIndex(spark, root, queries)
    val wq = Window.partitionBy(col("query_id")).orderBy(col("acos").desc, col("neighbor_id"))
    val refined = scored.withColumn("qrnk", row_number().over(wq))
      .filter(col("qrnk") <= refine)
      .select(col("query_id"), col("qv"), col("neighbor_id"))
      .join(corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")),
        Seq("neighbor_id"))
      .withColumn("cos", CosF(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    refined.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), r4(col("cos")).as("cosine"))
      .orderBy(col("query_id"), col("rnk"))
  }

  // ============ D9 — IVF-PQ composition (s8) ============
  //
  // The production billion-vector index (the FAISS IVFPQ shape, public
  // since Jegou et al. 2011 "Product Quantization for Nearest Neighbor
  // Search"): IVF centroids prune WHICH vectors are scanned (nProbe of
  // kIvf inverted lists), PQ codes shrink WHAT is scanned (m small ints
  // per vector instead of d floats). Composed from the two trained
  // cores this pack already ships — s4's spherical k-means lists and
  // s6's per-subspace codebooks — with the scan-side join shapes
  // unchanged: every stage is either parameter-bounded-broadcast or
  // keyed on the list id.

  /** In-query IVF-PQ top-k (the s8 entry): train lists + codebooks,
    * encode, then answer queries by probing nProbe lists and
    * ADC-scanning ONLY their codes; top `refine` ADC candidates per
    * query are re-ranked with the exact float cosine (s6's refine
    * contract). At 100 TB training/encoding move behind the published
    * artifact ([[publishIvfPqIndex]]) and the query path is
    * [[ivfPqTopKFromIndex]] — this spelling exists so the composition
    * itself is driver-checkable end to end.
    */
  def ivfPqTopK(e0: DataFrame, nQueries: Int, k: Int, nProbe: Int = 4,
      refine: Int = 150, kIvf: Int = 10, ivfIters: Int = 6, m: Int = 8,
      ds: Int = 8, kc: Int = 16, pqIters: Int = 4): DataFrame = {
    val e = Tables.spread(e0.select(col("vec_id"), col("embedding"))).persist()
    // `refine` is the pool FLOOR; the effective pool is corpus-aware
    // (s6's r12 rule — a fixed count is a shrinking corpus fraction).
    // One count on the persisted corpus frame the trainer is about to
    // materialize anyway.
    val nVec = e.count()
    val refineEff = refinePool(nVec, refine)
    // corpus-aware probe width (the s4 rule): exhaustive at tiny n
    val nProbeEff = effNProbe(nVec, kIvf, nProbe)
    val centArr = trainCentroidsLocal(e, kIvf, ivfIters)
    val cent = centDF(e.sparkSession, centArr)
    // inverted-list assignment — r16: the s4 map-side NearestCentroidId
    // projection (guide §2.4) over the driver-collected lists
    val assigned = e.select(col("vec_id"), col("embedding"),
        graft.functions.NearestCentroidId(col("embedding"), lit(0),
          graft.functions.CentroidBook.single(centArr)).as("list_id"))
      .persist()
    // PQ encode + x̂ reconstruction — the s6 r16 one-projection shape
    val subs = pqSubVectors(assigned.select(col("vec_id"), col("embedding")), m, ds)
    val booksArr = trainCentroidsKeyedLocal(subs, e, kc, pqIters)
    val encBook = graft.functions.CentroidBook.keyed(booksArr, useL2 = false)
    val bcBooks = e.sparkSession.sparkContext.broadcast(encBook.vecs)
    val xhat = assigned.select(col("vec_id"), col("list_id"),
        graft.functions.PqReconstruct(
          graft.functions.PqEncodeCodes(col("embedding"), ds, encBook),
          bcBooks).as("xhat"))
      .filter(col("xhat").isNotNull)
    // queries probe their nProbe nearest lists (s4's probe shape)
    val q = assigned.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("pcos").desc, col("centroid_id"))
    // one NaN contract with ivfPqScoreFromIndex's negated-ascending
    // struct sort: Spark sorts NaN as LARGEST, so a NaN cosine
    // (degenerate query or zero centroid) would rank FIRST here but LAST
    // there — pin NaN/null to -2.0 (the semDeDupIvf convention, below
    // any real cosine) so both spellings probe the same lists
    val probes = q.join(broadcast(cent), lit(true))
      .withColumn("pcos", coalesce(nanvl(CosF(col("qv"), col("centv")), lit(-2.0)), lit(-2.0)))
      .withColumn("prnk", row_number().over(wProbe))
      .filter(col("prnk") <= nProbeEff)
      .select(col("query_id"), col("qv"), col("centroid_id").as("list_id"))
    // ADC scan over the PROBED lists only: a broadcast equi-join on the
    // list id — the codes scan never sees an unprobed list's rows
    val scored = xhat.select(col("vec_id").as("neighbor_id"), col("list_id"), col("xhat"))
      .join(broadcast(probes), Seq("list_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("acos", CosF(col("qv"), col("xhat")))
    val wq = Window.partitionBy(col("query_id")).orderBy(col("acos").desc, col("neighbor_id"))
    val refined = scored.withColumn("qrnk", row_number().over(wq))
      .filter(col("qrnk") <= refineEff)
      .select(col("query_id"), col("qv"), col("neighbor_id"))
      .join(e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")), Seq("neighbor_id"))
      .withColumn("cos", CosF(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    refined.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), r4(col("cos")).as("cosine"))
      .orderBy(col("query_id"), col("rnk"))
  }

  // D9 — IVF-PQ ANN. Both training stages are float-mean
  // nondeterministic, so the driver frame gates the 0.6 measured-band
  // floor vs s1 (IVF pruning is the binding stage — PQ's loss is
  // absorbed by the exact re-rank); the spec pins the per-query rank
  // contract on the benched top-k spelling.
  private def s8TopK(s: SparkSession, d: String): DataFrame =
    ivfPqTopK(Tables.embeddings(s, d), NQueries, K, refine = 200)

  private val s8 = Relational.Q(
    "s8_ann_ivfpq_topk",
    (s, d) => recallBounds(bruteTopKPairs(Tables.embeddings(s, d)), s8TopK(s, d), 0.6),
    Some(exactTopKBoundsSql),
    benchFn = Some(s8TopK _))

  /** Publish the composed IVF-PQ index under `root` as three WAP tables
    * sharing one version sequence — lists (list_id, centv), books
    * (sub, cid, centv), codes (vec_id, list_id, codes) — each audited
    * on the STAGED bytes (the D7 discipline): lists must be non-empty
    * with in-range dims, codes must carry one row per corpus vector
    * with fixed-width in-range code arrays AND a list_id that exists.
    * The stored artifact is the 100 TB point: m small ints + one list
    * id per vector; at query time the lists/books are parameter-bounded
    * (kIvf and m*kc rows).
    */
  def publishIvfPqIndex(e: DataFrame, root: String, token: String,
      kIvf: Int = 10, ivfIters: Int = 6, m: Int = 8, ds: Int = 8,
      kc: Int = 16, pqIters: Int = 4,
      rotate: Boolean = false,
      pqMetric: String = "auto",
      attrs: Option[DataFrame] = None,
      residual: Boolean = false): Seq[Publish.WapResult] = {
    // "auto": the OPQ composition trains L2 subquantizers (the Jégou/Ge
    // objective — magnitude-aware, which allocated one-axis subspaces
    // require); the unrotated index keeps the pack's spherical
    // convention. The resolved metric is PERSISTED on the books artifact
    // (a constant `metric` column) so refresh re-encodes arrivals under
    // the BUILD's metric even when an explicit override disagrees with
    // rotation presence (e.g. rotate=false + pqMetric="l2", the
    // rotate-then-score replication build).
    // RESIDUAL encoding (FAISS-shape IVFPQ — Jégou et al. 2011 §III.A):
    // subquantizers code x − centroid(list), not x. The residual is what
    // remains AFTER the coarse quantizer explains the vector, so the
    // subquantizer variance concentrates and recall lifts at unchanged
    // bits. Residuals are displacement vectors with no directional
    // meaning — the l2 objective is forced (cosine on a residual is
    // meaningless, and "auto" resolves to l2).
    val metric =
      if (pqMetric == "auto") { if (residual || rotate) "l2" else "cos" }
      else pqMetric
    require(metric == "cos" || metric == "l2",
      s"unknown PQ metric '$metric' (cos | l2)")
    require(!(residual && metric == "cos"),
      "residual encoding requires the l2 subquantizer objective " +
        "(a residual is a displacement, not a direction)")
    val src = e.select(col("vec_id"), col("embedding"))
    // OPQ composition (Ge et al., CVPR 2013, the parametric solution):
    // rotate the corpus onto its PCA basis WITH EIGENVALUE ALLOCATION
    // before product quantization ([[opqRotation]]) — the subquantizers
    // assume independent, variance-BALANCED subspaces. A pure
    // ORTHONORMAL rotation (no whitening): inner products, norms and
    // cosines are preserved, so the exact-refine stage can keep scoring
    // in the ORIGINAL space. The rotation derives from the integer-exact
    // Gram pass (s10) + driver Jacobi (D13) — both deterministic, so a
    // rebuild reproduces it bit-for-bit.
    val rotation: Option[Array[Array[Double]]] =
      if (!rotate) None else Some(opqRotation(src, m))
    val input = rotation match {
      case Some(r) =>
        src.select(col("vec_id"), opqPreprocess(col("embedding"), r).as("embedding"))
      case None => src
    }
    val base = Tables.spread(input).persist()
    val cent = trainCentroids(base, kIvf, ivfIters)
    val wL = Window.orderBy(col("centroid_id"))
    // dense list ids by centroid order — a kIvf-row window, parameter-bounded
    val lists = cent.withColumn("list_id", (row_number().over(wL) - 1).cast("int"))
      .select(col("list_id"), col("centv"))
    val assigned = base.join(broadcast(lists), lit(true))
      .withColumn("ccos", CosF(col("embedding"), col("centv")))
      .groupBy(col("vec_id"))
      .agg(max_by(col("list_id"),
        struct(col("ccos"), (-col("list_id")).as("tie"))).as("list_id"),
        first(col("embedding")).as("embedding"))
    // residual build: subtract the ASSIGNED list centroid before the
    // subspace split — one broadcast (kIvf rows) + a narrow zip_with;
    // training, encoding and (at read time) reconstruction all live in
    // residual space, with the centroid added back per candidate row
    val encInput =
      if (!residual) assigned.select(col("vec_id"), col("embedding"))
      else assigned.join(broadcast(lists), Seq("list_id"))
        .select(col("vec_id"),
          zip_with(col("embedding"), col("centv"),
            (x, c) => (x - c).cast("float")).as("embedding"))
    val subs = pqSubVectors(encInput, m, ds)
    val rawBooks = trainCentroidsKeyed(subs, base, kc, pqIters, metric)
    val wSub = Window.partitionBy(col("sub")).orderBy(col("centroid_id"))
    val books = rawBooks
      .withColumn("cid", (row_number().over(wSub) - 1).cast("int"))
      .select(col("sub"), col("cid"), col("centv"), lit(metric).as("metric"),
        lit(residual).as("residual"))
    // ATTRIBUTE DENORMALIZATION (filtered ANN, D16): optional per-vector
    // attribute columns land IN the codes table, so an attribute-
    // constrained search is a parquet-pushed predicate on the codes scan
    // — zero extra joins at query time, candidate volume ∝ selectivity.
    // Left join: a vector with no attribute row keeps its code (nulls
    // never match an equality predicate — the SQL-standard fail-closed).
    val codes0 = encodePq(subs, books, metric)
      .join(assigned.select(col("vec_id"), col("list_id")), Seq("vec_id"))
    val codes = attrs match {
      case Some(a) => codes0.join(a, Seq("vec_id"), "left")
      case None => codes0
    }
    val expectedVectors = base.count()
    val listsAudit: Publish.Audit = staged =>
      Publish.columnAudit(
        "lists_centv_nonnull" -> col("centv").isNull,
        "lists_centv_dim" -> (size(col("centv")) =!= m * ds),
        "lists_id_in_range" -> (col("list_id") < 0 || col("list_id") >= kIvf))(staged)
    val booksAudit: Publish.Audit = staged =>
      Publish.columnAudit(
        "books_centv_dim" -> (size(col("centv")) =!= ds),
        "books_sub_in_range" -> (col("sub") < 0 || col("sub") >= m),
        "books_cid_in_range" -> (col("cid") < 0 || col("cid") >= kc),
        // isNull spelled out: `!isin` is NULL (not true) for a null
        // metric, and columnAudit counts NULL as non-violation — the
        // audit exists so refresh can TRUST this column, so null fails
        "books_metric_known" ->
          (col("metric").isNull || !col("metric").isin("cos", "l2")),
        // same trust contract for the residual flag: refresh and the
        // read path both branch on it
        "books_residual_known" -> col("residual").isNull)(staged)
    val codesAudit: Publish.Audit = staged =>
      Publish.columnAudit(
        "codes_width" -> (size(col("codes")) =!= m),
        "codes_in_range" -> exists(col("codes"), c => c < 0 || c >= kc),
        "codes_list_in_range" -> (col("list_id") < 0 || col("list_id") >= kIvf))(staged)
        .unionByName(staged.agg(count(lit(1)).as("n"))
          .select(lit("codes_one_row_per_vector").as("expectation"),
            abs(col("n") - lit(expectedVectors)).cast("long").as("violations"),
            (col("n") === lit(expectedVectors)).as("pass")))
    // stage + audit ALL members before moving ANY pointer: the tables
    // share one version sequence, so a failed codes audit after
    // lists/books published would leave the index permanently torn
    // (writeAuditPublish counts versions per table). With the two-phase
    // protocol a dirty table quarantines while all pointers still
    // name the old version. An OPQ build adds the rotation as a FOURTH
    // member of the same sequence: d rows of (j, column_j of R), audited
    // for shape, range and unit column norms before anything publishes.
    val rotMember = rotation.toSeq.map { r =>
      val dims = r.length
      import e.sparkSession.implicits._
      val rotDf = (0 until dims)
        .map(j => (j, (0 until dims).map(i => r(i)(j))))
        .toDF("j", "w")
      val rotAudit: Publish.Audit = staged =>
        Publish.columnAudit(
          "rotation_dim" -> (size(col("w")) =!= dims),
          "rotation_j_in_range" -> (col("j") < 0 || col("j") >= dims),
          "rotation_col_unit_norm" ->
            (abs(aggregate(col("w"), lit(0.0), (a, x) => a + x * x) - 1.0)
              > 1e-9))(staged)
          .unionByName(staged.agg(count(lit(1)).as("n"))
            .select(lit("rotation_one_row_per_dim").as("expectation"),
              abs(col("n") - lit(dims)).cast("long").as("violations"),
              (col("n") === lit(dims)).as("pass")))
      ("rotation", rotDf, rotAudit)
    }
    stagePublishTriple(e.sparkSession, root, token,
      Seq(("lists", lists, listsAudit), ("books", books, booksAudit),
        ("codes", codes, codesAudit)) ++ rotMember)
  }

  /** The parametric OPQ rotation (Ge et al., CVPR 2013 §4): the PCA
    * basis from the integer-exact Gram pass, columns PERMUTED by
    * eigenvalue allocation — principal directions (descending λ) are
    * greedily dealt to the m subspaces, each next direction joining the
    * subspace with the smallest current log-λ sum (capacity d/m), so the
    * per-subspace variance PRODUCTS balance. Plain PCA ordering is the
    * known failure here: it concentrates all the variance in the first
    * subquantizer (which then starves for centroids) while the tail
    * subquantizers encode noise — allocation is what makes rotation a
    * strict improvement under the independence assumption. The permuted
    * basis is still orthonormal (a column permutation of an orthonormal
    * matrix), so cosines are preserved exactly. Deterministic: Jacobi is
    * seed-free and ties break on subspace index.
    */
  def opqRotation(e: DataFrame, m: Int): Array[Array[Double]] = {
    val (eig, r) = pcaFromGram(gramMatrix(e))
    val d = r.length
    require(d % m == 0, s"dims $d not divisible by m=$m")
    val ds = d / m
    val logs = Array.fill(m)(0.0)
    val counts = Array.fill(m)(0)
    val buckets = Array.fill(m)(List.empty[Int])
    (0 until d).foreach { k =>
      val cand = (0 until m).filter(counts(_) < ds)
      val tgt = cand.minBy(s => (logs(s), s))
      logs(tgt) += math.log(math.max(eig(k), 1e-12))
      counts(tgt) += 1
      buckets(tgt) ::= k
    }
    val perm = buckets.flatMap(_.reverse)
    Array.tabulate(d, d)((i, jp) => r(i)(perm(jp)))
  }

  /** The OPQ write-path preprocessing: rotate ([[rotateExpr]]) then
    * L2-NORMALIZE. On the unit sphere cos(a,b) ≡ 1 − ‖a−b‖²/2, so the
    * L2 subquantizer objective becomes EXACTLY the cosine retrieval
    * objective — without normalization the codebooks spend bits coding
    * magnitude differences the cosine ADC ignores. Normalization is
    * cosine-invariant, so queries need NO matching step at read time
    * (CosF is scale-free); only stored vectors pass through this.
    * Zero vectors stay zero (no NaN enters the artifact).
    */
  def opqPreprocess(v: Column, r: Array[Array[Double]]): Column = {
    val rot = rotateExpr(v, r)
    val nrm = sqrt(aggregate(rot, lit(0.0),
      (a, x) => a + x.cast("double") * x.cast("double")))
    when(nrm === 0.0, rot)
      .otherwise(transform(rot, x => (x.cast("double") / nrm).cast("float")))
  }

  /** Pure orthonormal rotation of a vector column by a fixed d×d matrix
    * entering the plan as ONE literal: rotated_j = Σ_i x_i R_ij — the
    * [[rotateEmbeddings]] projection without the whitening option, used
    * by the OPQ write AND read paths so query-time rotation replays the
    * build-time IEEE sequence exactly.
    */
  def rotateExpr(v: Column, r: Array[Array[Double]]): Column = {
    // the codegen'd H14 expression — bit-identical accumulation to the
    // HOF spelling it replaced (ascending-i multiply-add from 0.0, float
    // cast at the end; spec-pinned equal), ~100x cheaper per row: the
    // interpreted transform∘aggregate∘zip_with spelling measured ~50 s
    // to rotate 2k×64-dim vectors and dominated the whole OPQ build
    val d = r.length
    graft.functions.RotateVector(v, Array.tabulate(d, d)((j, i) => r(i)(j)))
  }

  /** The published OPQ rotation under `root`, if the index carries one:
    * reconstructs R (R(i)(j) = component i of eigenvector j) from the d
    * (j, column) rows — parquet doubles round-trip exactly, so the read
    * matrix IS the build matrix.
    */
  private def readRotationOpt(spark: SparkSession,
      root: String): Option[Array[Array[Double]]] =
    Publish.currentVersion(spark, s"$root/rotation").map { _ =>
      val rows = Publish.readPublished(spark, s"$root/rotation").collect()
      val d = rows.length
      val r = Array.ofDim[Double](d, d)
      rows.foreach { row =>
        val j = row.getInt(0)
        val w = row.getSeq[Double](1)
        require(w.length == d, s"rotation row $j has dim ${w.length} != $d")
        (0 until d).foreach(i => r(i)(j) = w(i))
      }
      r
    }

  /** Stage + audit every (name, frame, audit) member under `root`, and
    * only if ALL audits pass swap the pointers in order. Any audit
    * failure returns the quarantined results with ZERO tables published —
    * the family stays consistent at its old version. (A crash BETWEEN
    * pointer swaps can still tear the family; ivfPqScoreFromIndex's
    * version-equality guard turns that residual window into a loud
    * read-time failure rather than silent skew.)
    */
  private def stagePublishTriple(spark: SparkSession, root: String, token: String,
      members: Seq[(String, DataFrame, Publish.Audit)]): Seq[Publish.WapResult] = {
    val staged = members.map { case (name, df, audit) =>
      Publish.stageAudit(df, s"$root/$name", audit, token)
    }
    val failures = staged.collect { case Left(q) => q }
    if (failures.nonEmpty) failures
    else staged.map { case Right(s) => Publish.publishStaged(spark, s)
      case Left(q) => q }
  }

  /** INDEX REFRESH without retraining (the d11 incremental story applied
    * to the ANN artifact — the production need between full rebuilds:
    * vectors arrive daily, retraining is a scheduled heavy job): assign
    * and PQ-encode the arriving vectors against the PUBLISHED lists and
    * codebooks — deterministic given the artifacts, no k-means — and
    * publish the unioned codes as the next version. Lists and books are
    * re-staged byte-unchanged at the same new version, keeping the
    * torn-version guard's one-version invariant (readers resolve all
    * three tables atomically); the codes audit re-runs on the union
    * (width/range/list-referential + the one-row-per-vector count over
    * old + new). Encoding drift is impossible by construction: old
    * vectors' codes are carried, not recomputed, and the spec pins them
    * bit-exact across the refresh.
    */
  def refreshIvfPqIndex(spark: SparkSession, root: String,
      newVectors: DataFrame, token: String,
      attrs: Option[DataFrame] = None): Seq[Publish.WapResult] = {
    val lists = Publish.readPublished(spark, s"$root/lists")
    val books = Publish.readPublished(spark, s"$root/books")
    val codes = Publish.readPublished(spark, s"$root/codes")
    val bRows = books.select(col("sub"), col("cid"), col("centv")).collect()
    require(bRows.nonEmpty, "empty codebook artifact")
    val m = bRows.map(_.getInt(0)).max + 1
    val kc = bRows.map(_.getInt(1)).max + 1
    val listRows = lists.select(col("list_id"), col("centv")).collect()
    require(listRows.nonEmpty, "empty lists artifact")
    val kIvf = listRows.map(_.getInt(0)).max + 1
    val dims = listRows.head.getSeq[Float](1).length
    val ds = dims / m
    // an OPQ index stores ROTATED-space artifacts: arrivals rotate by
    // the PUBLISHED matrix before assignment/encoding (same rotateExpr
    // literal as the build), and the rotation re-stages byte-unchanged
    // as the fourth member of the shared version sequence
    val rotation = readRotationOpt(spark, root)
    val arrivals = rotation match {
      case Some(r) => newVectors.select(col("vec_id"),
        opqPreprocess(col("embedding"), r).as("embedding"))
      case None => newVectors.select(col("vec_id"), col("embedding"))
    }
    val base = Tables.spread(arrivals)
    // assignment against the PUBLISHED list centroids (broadcast — kIvf
    // rows, parameter-bounded), the publish-path max_by shape with the
    // shared NaN contract
    val assigned = base.join(broadcast(lists), lit(true))
      .withColumn("ccos",
        coalesce(nanvl(CosF(col("embedding"), col("centv")), lit(-2.0)), lit(-2.0)))
      .groupBy(col("vec_id"))
      .agg(max_by(col("list_id"),
        struct(col("ccos"), (-col("list_id")).as("tie"))).as("list_id"),
        first(col("embedding")).as("embedding"))
    // PQ-encode against the PUBLISHED books under the BUILD's metric,
    // which the books artifact persists (a constant `metric` column) —
    // inferring it from rotation presence mis-encodes arrivals when the
    // build used an explicit pqMetric override (rotate=false + "l2", the
    // rotate-then-score replication build). Pre-metric-column artifacts
    // fall back to the old inference.
    val metric =
      if (books.columns.contains("metric")) {
        val ms = books.select(col("metric")).distinct().collect()
          .map(_.getString(0)).sorted
        require(ms.length == 1,
          s"books artifact carries mixed encode metrics: ${ms.toSeq}")
        ms.head
      } else if (rotation.isDefined) "l2" else "cos"
    // residual builds encode x − centroid(list): arrivals replay the
    // build's residual step against the PUBLISHED lists (the flag is
    // persisted on books, the metric discipline)
    val residualFlag = books.columns.contains("residual") && {
      val fs = books.select(col("residual")).distinct().collect()
        .map(_.getBoolean(0))
      require(fs.length == 1,
        s"books artifact carries mixed residual flags: ${fs.toSeq}")
      fs.head
    }
    val encInput =
      if (!residualFlag) assigned.select(col("vec_id"), col("embedding"))
      else assigned.join(broadcast(lists), Seq("list_id"))
        .select(col("vec_id"),
          zip_with(col("embedding"), col("centv"),
            (x, c) => (x - c).cast("float")).as("embedding"))
    val subs = pqSubVectors(encInput, m, ds)
    val newCodes0 = encodePq(subs, books, metric)
      .join(assigned.select(col("vec_id"), col("list_id")), Seq("vec_id"))
    // ATTRIBUTE-CARRYING indexes (publishIvfPqIndex(attrs=...), the D16
    // filtered-search artifact) denormalize extra per-vector columns into
    // codes: arrivals must carry the SAME columns or unionByName tears
    // the refresh. The published schema is authoritative — extra columns
    // there make `attrs` REQUIRED (same left-join fail-closed semantics
    // as the publish path: a vector with no attribute row keeps null,
    // which never matches an equality predicate at read time), and an
    // `attrs` frame against a plain index is rejected as a misuse.
    val extraCols = codes.columns.filterNot(
      Set("vec_id", "codes", "list_id").contains).toSeq
    val newCodes = (extraCols, attrs) match {
      case (Nil, None) => newCodes0
      case (Nil, Some(_)) => throw new IllegalArgumentException(
        "refresh rejected: attrs supplied but the published codes table " +
          "carries no attribute columns — this index was not built with attrs")
      case (extra, None) => throw new IllegalArgumentException(
        s"refresh rejected: published codes carry attribute columns " +
          s"$extra — pass attrs with (vec_id, ${extra.mkString(", ")}) " +
          "for the arrivals")
      case (extra, Some(a)) =>
        val missing = extra.filterNot(a.columns.contains)
        require(missing.isEmpty,
          s"refresh rejected: attrs frame missing columns $missing " +
            s"required by the published codes schema")
        newCodes0.join(
          a.select((col("vec_id") +: extra.map(col)): _*), Seq("vec_id"), "left")
    }
    // ALL arrival validation happens BEFORE any table publishes: the
    // three tables share one version sequence, so a refresh that stages
    // lists/books at N+1 and then fails the codes audit leaves the index
    // permanently torn (writeAuditPublish counts versions per table —
    // no later publish can realign them). A dirty batch must therefore
    // be rejected while all three tables still sit at version N.
    //  - internal duplicates: encodePq's groupBy collapses a repeated
    //    vec_id to one code row, while a raw-count expectedVectors would
    //    count it twice — the audit-after-publish trap the r10 advice
    //    flagged;
    //  - replayed ids: an id already indexed would double-count in the
    //    one-row-per-vector audit and shadow a stored code
    //    nondeterministically at read time.
    val newN = base.count()
    val newDistinct = base.select(col("vec_id")).distinct().count()
    require(newN == newDistinct,
      s"refresh rejected: ${newN - newDistinct} duplicate vec_ids within the arrivals batch")
    val dup = newCodes.join(codes.select(col("vec_id")), Seq("vec_id")).count()
    require(dup == 0, s"refresh rejected: $dup arriving vec_ids already indexed")
    val unioned = codes.unionByName(newCodes)
    val expectedVectors = codes.count() + newDistinct
    val passThrough: Publish.Audit = staged =>
      Publish.columnAudit("never" -> lit(false))(staged)
    val codesAudit: Publish.Audit = staged =>
      Publish.columnAudit(
        "codes_width" -> (size(col("codes")) =!= m),
        "codes_in_range" -> exists(col("codes"), c => c < 0 || c >= kc),
        "codes_list_in_range" -> (col("list_id") < 0 || col("list_id") >= kIvf))(staged)
        .unionByName(staged.agg(count(lit(1)).as("n"))
          .select(lit("codes_one_row_per_vector").as("expectation"),
            abs(col("n") - lit(expectedVectors)).cast("long").as("violations"),
            (col("n") === lit(expectedVectors)).as("pass")))
    // one version sequence across the three tables (the torn guard's
    // invariant): lists and books re-stage byte-unchanged. The codes
    // audit (width/range/list-referential/count) runs on the STAGED
    // union BEFORE any pointer moves — previously it ran after
    // lists/books had already published at N+1, so any codes-audit
    // failure beyond the two pre-checked dirty-batch causes desynced
    // the shared version sequence permanently (the r11 advice's
    // residual torn-index window, now closed by the two-phase WAP).
    stagePublishTriple(spark, root, token,
      Seq(("lists", lists, passThrough), ("books", books, passThrough),
        ("codes", unioned, codesAudit)) ++
        rotation.map(_ => ("rotation",
          Publish.readPublished(spark, s"$root/rotation"), passThrough)).toSeq)
  }

  /** ADC scoring straight off the published IVF-PQ artifact with ZERO
    * non-broadcast exchange on the codes side: books collect into the
    * dense [sub][cid] literal (pqScoreFromIndex's trick), the probe
    * frame (query x nProbe rows, parameter-bounded) broadcasts into an
    * equi-join on list_id, reconstruction is a narrow map — nothing
    * corpus-proportional is re-shuffled before the rank reduction.
    */
  /** Plan-literal ceiling for index payloads, in FLOATS (r14 verdict
    * item 4): below it, codebooks/list centroids enter the plan as
    * `typedlit` literals (zero lookup indirection, ideal at small k·m·d);
    * above it they ship as BROADCAST VARIABLES behind
    * [[graft.functions.PqReconstruct]] / [[graft.functions.ProbeTopLists]]
    * — task binaries stay flat (a handle, not the payload) while
    * executors fetch the blocks once per JVM. Default 256 Ki floats
    * (~1 MB serialized) — the benched indexes sit far below it; a
    * 65 536-list production index crosses it and spills automatically.
    * Outputs are spec-pinned bit-equal across the two spellings.
    * Test-only mutable (forces the spill leg at toy scale).
    */
  @volatile private[graft] var indexLiteralMaxFloats: Long = 256L * 1024

  /** The published index's parameter-bounded pieces, read once under the
    * torn-version guard: the dense [sub][cid] codebook and list-centroid
    * array (as plan literals OR broadcast-backed expressions — see
    * [[indexLiteralMaxFloats]]), the optional OPQ rotation, and the
    * (corpus-sized) codes frame — everything both the batch and the
    * STREAMING score paths share. `xhatOf`/`probeIdsOf` abstract the
    * spelling so every consumer is spill-agnostic.
    */
  private final case class IvfPqIndexLits(codes: DataFrame, nLists: Int,
      rotation: Option[Array[Array[Double]]],
      xhatOf: (Column, Column) => Column, // (codes, list_id) -> x̂
      probeIdsOf: (Column, Int) => Column)

  private def readIvfPqIndexLits(spark: SparkSession,
      root: String): IvfPqIndexLits = {
    // an OPQ index carries a rotation table in the SAME version
    // sequence — the torn guard widens to all four members
    val rotation = readRotationOpt(spark, root)
    val members = Seq("lists", "books", "codes") ++
      (if (rotation.isDefined) Seq("rotation") else Nil)
    val versions = members.map(t => Publish.currentVersion(spark, s"$root/$t"))
    require(versions.head.nonEmpty && versions.distinct.size == 1,
      s"IVF-PQ index torn: versions=${members.zip(versions)} — " +
        "re-publish all members from one build")
    val lists = Publish.readPublished(spark, s"$root/lists")
    val booksDf = Publish.readPublished(spark, s"$root/books")
    val codes = Publish.readPublished(spark, s"$root/codes")
    val rows = booksDf.select(col("sub"), col("cid"), col("centv")).collect()
    require(rows.nonEmpty, "empty codebook artifact")
    // residual artifacts reconstruct x̂ = centroid(list_id) + decode(codes)
    // — the flag is persisted on books (the metric-column discipline);
    // pre-flag artifacts are plain (residual encoding shipped after it)
    val residual = booksDf.columns.contains("residual") && {
      val fs = booksDf.select(col("residual")).distinct().collect()
        .map(_.getBoolean(0))
      require(fs.length == 1,
        s"books artifact carries mixed residual flags: ${fs.toSeq}")
      fs.head
    }
    val m = rows.map(_.getInt(0)).max + 1
    val booksArr: Array[Array[Array[Float]]] = (0 until m).map { s =>
      rows.filter(_.getInt(0) == s).sortBy(_.getInt(1))
        .map(_.getSeq[Float](2).toArray).toArray
    }.toArray
    val listRows = lists.select(col("list_id"), col("centv")).collect()
    require(listRows.nonEmpty, "empty lists artifact")
    val listsArr: Array[Array[Float]] = listRows.sortBy(_.getInt(0))
      .map(_.getSeq[Float](1).toArray)
    val nLists = listsArr.length
    // residual add-back shares the two spellings' float contract: both
    // compute (decoded + centroid) element-wise in float
    def plusCentroid(decoded: Column, centv: Column): Column =
      zip_with(decoded, centv, (a, b) => (a + b).cast("float"))
    val payloadFloats =
      booksArr.iterator.map(_.iterator.map(_.length.toLong).sum).sum +
        listsArr.iterator.map(_.length.toLong).sum
    if (payloadFloats > indexLiteralMaxFloats) {
      val sc = spark.sparkContext
      val bcBooks = sc.broadcast(booksArr)
      val bcLists = sc.broadcast(listsArr)
      IvfPqIndexLits(codes, nLists, rotation,
        (cs, lid) => {
          val dec = graft.functions.PqReconstruct(cs, bcBooks)
          if (!residual) dec
          else plusCentroid(dec, graft.functions.ListCentroid(lid, bcLists))
        },
        (qvp, nProbe) => graft.functions.ProbeTopLists(qvp, bcLists, nProbe))
    } else {
      val booksLit = typedlit(booksArr.map(_.map(_.toSeq).toSeq).toSeq)
      val listsLit = typedlit(listsArr.map(_.toSeq).toSeq)
      IvfPqIndexLits(codes, nLists, rotation,
        (cs, lid) => {
          val dec = flatten(transform(cs,
            (c, s) => element_at(element_at(booksLit, s + 1), c + 1)))
          if (!residual) dec
          else plusCentroid(dec, element_at(listsLit, lid + 1))
        },
        (qvp, nProbe) => transform(
          slice(array_sort(transform(sequence(lit(0), lit(nLists - 1)),
            i => struct((-coalesce(nanvl(CosF(qvp, element_at(listsLit, i + 1)),
              lit(-2.0)), lit(-2.0))).as("neg"),
              i.as("list_id")))), 1, nProbe),
          p => p.getField("list_id")))
    }
  }

  /** The (query_id, qv, qvp, list_id) probe frame: queries rotated by the
    * PUBLISHED matrix at probe time (same rotateExpr literal spelling as
    * the build — bit-identical IEEE); `qv` stays the ORIGINAL vector so
    * the exact-refine stage scores in the original space (a pure rotation
    * preserves cosine), while `qvp` drives probe selection and ADC
    * against the rotated-space artifact. Probe selection is NARROW: each
    * query row ranks the list-centroid literal in-place — struct sort on
    * (-cos, list_id), with the NaN contract shared with ivfPqTopK's
    * probe window (cosine pinned to -2.0 on NaN/null BEFORE negation).
    */
  private def ivfPqProbeFrame(lits: IvfPqIndexLits, queries: DataFrame,
      nProbe: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .withColumn("qvp", lits.rotation match {
        case Some(r) => rotateExpr(col("qv"), r)
        case None => col("qv")
      })
    q.select(col("query_id"), col("qv"), col("qvp"),
      explode(lits.probeIdsOf(col("qvp"), nProbe)).as("list_id"))
  }

  private def ivfPqXhat(lits: IvfPqIndexLits): Column =
    lits.xhatOf(col("codes"), col("list_id"))

  def ivfPqScoreFromIndex(spark: SparkSession, root: String,
      queries: DataFrame, nProbe: Int): DataFrame =
    ivfPqScoreFromIndexWhere(spark, root, queries, nProbe, lit(true))

  /** ATTRIBUTE-CONSTRAINED scoring (filtered vector search, D16): the
    * predicate evaluates on the published codes table — whose rows carry
    * any attribute columns denormalized at publish time
    * ([[publishIvfPqIndex]]'s `attrs`) — BEFORE reconstruction and the
    * probe join, so it pushes to the parquet scan (`PushedFilters`,
    * spec-asserted) and everything downstream is sized by the
    * SELECTIVITY, not the corpus. This is pre-filtering, the strategy
    * that stays correct at any selectivity (post-filtering a fixed-k
    * pool starves under selective predicates); the refine pool floor in
    * [[ivfPqTopKFromIndexWhere]] tracks the FILTERED corpus fraction for
    * the same reason.
    */
  def ivfPqScoreFromIndexWhere(spark: SparkSession, root: String,
      queries: DataFrame, nProbe: Int, pred: Column): DataFrame = {
    val lits = readIvfPqIndexLits(spark, root)
    val probes = ivfPqProbeFrame(lits, queries, nProbe)
    lits.codes.filter(pred)
      .select(col("vec_id").as("neighbor_id"), col("list_id"),
        ivfPqXhat(lits).as("xhat"))
      .join(broadcast(probes), Seq("list_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("acos", CosF(col("qvp"), col("xhat")))
  }

  /** A61: the OPQ/IVF-PQ retrieval probe ATTACHED TO A STREAM — arriving
    * query vectors score against the published artifact at ingest (the
    * retrieval-at-ingest / online-dedup story: route, dedup or enrich a
    * document the moment it arrives, against an index rebuilt on its own
    * schedule). Identical arithmetic to [[ivfPqScoreFromIndex]] — same
    * literals, same rotation, same probe selection, same ADC — with the
    * join direction streaming-legal: the STREAM is the left side of a
    * stream-static equi-join on list_id (a broadcast hint on a streaming
    * frame is not; the static codes side is what Spark builds per
    * micro-batch). Stateless and append-mode (the A39 class): no
    * watermark, no state store; the spec pins streamed rows == batch
    * rows bit-exactly across micro-batch slicings.
    */
  def ivfPqScoreStream(spark: SparkSession, root: String,
      queryStream: DataFrame, nProbe: Int): DataFrame =
    ivfPqScoreStreamWhere(spark, root, queryStream, nProbe, lit(true))

  /** The streaming probe with s13's attribute predicate on the static
    * codes side (retrieval-at-ingest over the FILTERED universe —
    * route-by-label at ingest): the predicate evaluates on the published
    * codes scan exactly as in [[ivfPqScoreFromIndexWhere]], so it pushes
    * to parquet and the per-micro-batch static build is sized by the
    * selectivity. Same streaming-legal join direction as the unfiltered
    * probe; spec pins streamed rows == the batch filtered scorer
    * bit-exactly.
    */
  def ivfPqScoreStreamWhere(spark: SparkSession, root: String,
      queryStream: DataFrame, nProbe: Int, pred: Column): DataFrame = {
    val lits = readIvfPqIndexLits(spark, root)
    val probes = ivfPqProbeFrame(lits, queryStream, nProbe)
    probes.join(
        lits.codes.filter(pred)
          .select(col("vec_id").as("neighbor_id"), col("list_id"),
            ivfPqXhat(lits).as("xhat")),
        Seq("list_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("acos", CosF(col("qvp"), col("xhat")))
      .select(col("query_id"), col("neighbor_id"), col("list_id"),
        col("acos"))
  }

  /** Query the published IVF-PQ index end to end: probed-list ADC scan
    * -> per-query refine against the true vectors -> exact re-ranked
    * top-k (the pqTopKFromIndex contract with IVF pruning in front).
    */
  def ivfPqTopKFromIndex(spark: SparkSession, root: String, corpus: DataFrame,
      queries: DataFrame, k: Int, refine: Int, nProbe: Int): DataFrame =
    ivfPqTopKFromIndexWhere(spark, root, corpus, queries, k, refine, nProbe,
      lit(true))

  /** [[ivfPqTopKFromIndex]] with an attribute predicate on the published
    * codes table ([[ivfPqScoreFromIndexWhere]]): filtered top-k with the
    * exact re-rank fetching only filtered survivors.
    */
  def ivfPqTopKFromIndexWhere(spark: SparkSession, root: String,
      corpus: DataFrame, queries: DataFrame, k: Int, refine: Int,
      nProbe: Int, pred: Column): DataFrame = {
    // `refine` is the pool FLOOR (the s6/s8 r12 rule on the production
    // READ path too): the effective pool tracks the indexed-corpus
    // fraction — the FILTERED universe under a predicate, so a selective
    // filter can never silently starve coverage. The count reads the
    // published codes table (filter-pushed parquet scan, no full pass).
    val codesAll = Publish.readPublished(spark, s"$root/codes")
    val codesN = codesAll.filter(pred).count()
    val refineEff = refinePool(codesN, refine)
    // corpus-aware probe width (the s4 rule) keyed on the UNFILTERED
    // index size — the probe geometry is a property of the index, so a
    // selective attribute predicate must not flip it (and the benched
    // filtered entry keeps its floor-stamped plan); at/below
    // ExhaustiveBelow probe every list (the probe selectors cap at the
    // published list count). Metadata-cheap count on the codes parquet.
    val nProbeEff = effNProbe(codesAll.count(), Int.MaxValue, nProbe)
    val scored = ivfPqScoreFromIndexWhere(spark, root, queries, nProbeEff, pred)
    val wq = Window.partitionBy(col("query_id")).orderBy(col("acos").desc, col("neighbor_id"))
    val refined = scored.withColumn("qrnk", row_number().over(wq))
      .filter(col("qrnk") <= refineEff)
      .select(col("query_id"), col("qv"), col("neighbor_id"))
      .join(corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")),
        Seq("neighbor_id"))
      .withColumn("cos", CosF(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    refined.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), r4(col("cos")).as("cosine"))
      .orderBy(col("query_id"), col("rnk"))
  }

  // ============ D10 — the PRODUCTION IVF-PQ read path (s9) ============

  // One published index per (sfDir) per JVM: s8 deliberately times the
  // in-query training composition, which made it the pack's slowest
  // benched query (6.8 s at sf0.1) — but the reference story is an index
  // built ONCE and queried many times, and until round 10 that
  // query-time-only path was spec-covered yet absent from the benched
  // surface. The memo means bench pass 1 absorbs the build (exactly like
  // the d7 staged-cluster class) and the warm min times the pure read:
  // three narrow parquet scans + parameter-bounded broadcasts.
  private val publishedIndexRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Root of the published IVF-PQ index for `sfDir`, building and
    * WAP-publishing it on first use (torn publishes refuse loudly —
    * [[publishIvfPqIndex]]'s audit contract).
    */
  def ivfPqIndexRootFor(spark: SparkSession, sfDir: String): String =
    publishedIndexRoots.computeIfAbsent(sfDir, { _ =>
      val root = java.nio.file.Files.createTempDirectory("graft-s9-ivfpq").toString
      val rs = publishIvfPqIndex(Tables.embeddings(spark, sfDir), root, token = "s9")
      require(rs.size == 3 && rs.forall(_.published), s"s9 index publish failed: $rs")
      root
    })

  private[graft] def clearPublishedIndexRoots(): Unit = publishedIndexRoots.clear()

  // D10 — the driver frame gates the published-index read path at the
  // s4/s8 0.6 measured-band floor vs s1; the spec additionally
  // plan-asserts zero non-broadcast exchange on the benched entry's
  // scoring path — the benched surface includes the production
  // read-path plan, not just the training composition.
  private def s9TopK(s: SparkSession, d: String): DataFrame = {
    val root = ivfPqIndexRootFor(s, d)
    val e = Tables.embeddings(s, d)
    ivfPqTopKFromIndex(s, root, e, e.filter(col("vec_id") < NQueries),
      k = K, refine = 200, nProbe = 4)
  }

  private val s9 = Relational.Q(
    "s9_ann_ivfpq_index_read",
    (s, d) => recallBounds(bruteTopKPairs(Tables.embeddings(s, d)), s9TopK(s, d), 0.6),
    Some(exactTopKBoundsSql),
    benchFn = Some(s9TopK _))

  // ============ D14 — the OPQ (rotated IVF-PQ) read path (s11) ============

  /** Root of the published OPQ index for `sfDir` — the s9 memo pattern
    * with `rotate = true`: PCA rotation from the integer-exact Gram pass
    * published as the fourth WAP table, quantization trained in the
    * rotated space.
    */
  def opqIndexRootFor(spark: SparkSession, sfDir: String): String =
    publishedIndexRoots.computeIfAbsent("opq:" + sfDir, { _ =>
      val root = java.nio.file.Files.createTempDirectory("graft-s11-opq").toString
      val rs = publishIvfPqIndex(Tables.embeddings(spark, sfDir), root,
        token = "s11", rotate = true)
      require(rs.size == 4 && rs.forall(_.published),
        s"s11 OPQ index publish failed: $rs")
      root
    })

  // D14 — same read-path plan as s9 (three narrow scans + parameter-
  // bounded broadcasts + the query-side rotation literal, still zero
  // non-broadcast exchange on the scoring stage); the recall floor is
  // s9's — at equal bits OPQ can only redistribute quantization error
  // more favorably, which the spec pins on a planted anisotropic corpus.
  private def s11TopK(s: SparkSession, d: String): DataFrame = {
    val root = opqIndexRootFor(s, d)
    val e = Tables.embeddings(s, d)
    ivfPqTopKFromIndex(s, root, e, e.filter(col("vec_id") < NQueries),
      k = K, refine = 200, nProbe = 4)
  }

  private val s11 = Relational.Q(
    "s11_ann_opq_topk",
    (s, d) => recallBounds(bruteTopKPairs(Tables.embeddings(s, d)), s11TopK(s, d), 0.6),
    Some(exactTopKBoundsSql),
    benchFn = Some(s11TopK _))

  // ======== D15 — recall-vs-probes sweep on the published OPQ index ========

  /** The nProbe levels s12 sweeps — the last MUST equal the index's kIvf
    * so the full-coverage pin below is mathematically guaranteed.
    */
  private val ProbeLevels = Seq(1, 2, 4, 10)

  /** D15 (s12): the MEASURED recall-vs-probes curve on the published OPQ
    * index — the knob a production deployment actually tunes (probe more
    * lists → scan more codes → recover more true neighbors), emitted as
    * one frame instead of folklore. One row per nProbe level with the
    * exact side's replayable counts and two pinned booleans:
    *
    *   - `recall_monotone`: CANDIDATE recall (the fraction of exact
    *     top-k neighbors whose list is among the first nProbe probed) is
    *     non-decreasing in nProbe — guaranteed, because probe lists are
    *     RANK-PREFIXES of one ordering (top-1 ⊂ top-2 ⊂ …), so the
    *     scanned-set is a superset chain. Candidate recall is the right
    *     curve object: it is the RECALL CEILING the ADC+refine stages
    *     inherit, and unlike post-refine recall it is provably monotone
    *     (a refine pool can reshuffle), so the oracle can pin it without
    *     flaking on the float-mean-nondeterministic training.
    *   - `full_cover_at_max`: at nProbe = kIvf every list is probed, so
    *     candidate recall is EXACTLY 1 — the sweep's endpoint anchor.
    *
    * ONE pass regardless of level count: each exact pair's
    * `min_probe` (the rank at which its neighbor's list enters the probe
    * set) is computed once from a posexplode'd rank-kIvf probe frame +
    * one (query,list) equi-join; every level is then a conditional count
    * over that frame — never a per-level re-probe. The spec additionally
    * pins BOUNDED CANDIDATE GROWTH: codes scanned at level p equal the
    * probed lists' exact sizes (scan cost ∝ probed fraction, never
    * corpus × probes). The exact leg exists for the GATE only; benchFn
    * times the production read path at the sweep's mid knob (nProbe=2 —
    * a probe point s9/s11 don't already bench).
    */
  def annRecallCurve(s: SparkSession, d: String): DataFrame = {
    val root = opqIndexRootFor(s, d)
    val e = Tables.embeddings(s, d)
    val lits = readIvfPqIndexLits(s, root)
    require(ProbeLevels.last == lits.nLists,
      s"ProbeLevels.last=${ProbeLevels.last} must equal kIvf=${lits.nLists} " +
        "(the full-coverage anchor)")
    val exact = bruteTopKPairs(e)
    val queries = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .withColumn("qvp", lits.rotation match {
        case Some(r) => rotateExpr(col("qv"), r)
        case None => col("qv")
      })
    val probes = queries.select(col("query_id"),
        posexplode(lits.probeIdsOf(col("qvp"), lits.nLists)))
      .select(col("query_id"), (col("pos") + 1).as("min_probe"),
        col("col").as("list_id"))
    val minProbe = exact
      .join(lits.codes.select(col("vec_id").as("neighbor_id"), col("list_id")),
        Seq("neighbor_id"))
      .join(broadcast(probes), Seq("query_id", "list_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(min(col("min_probe")).as("min_probe"))
    val hitCols = ProbeLevels.map(p =>
      sum(when(col("min_probe") <= p, 1L).otherwise(0L)).as(s"h$p"))
    val hits = minProbe.agg(hitCols.head, hitCols.tail: _*)
    val levelRows = array(ProbeLevels.zipWithIndex.map { case (p, i) =>
      struct(lit(p).as("n_probe"),
        (if (i == 0) lit(true)
         else col(s"h$p") >= col(s"h${ProbeLevels(i - 1)}")).as("recall_monotone"))
    }: _*)
    exact.agg(countDistinct(col("query_id")).as("n_queries"),
        count(lit(1)).as("exact_pairs"))
      .crossJoin(hits)
      .select(col("n_queries"), col("exact_pairs"),
        (col(s"h${ProbeLevels.last}") === col("exact_pairs")).as("full_cover_at_max"),
        explode(levelRows).as("l"))
      .select(col("l.n_probe").as("n_probe"), col("n_queries"),
        col("exact_pairs"), col("l.recall_monotone").as("recall_monotone"),
        col("full_cover_at_max"))
      .orderBy(col("n_probe"))
  }

  private def s12Bench(s: SparkSession, d: String): DataFrame = {
    val root = opqIndexRootFor(s, d)
    val e = Tables.embeddings(s, d)
    ivfPqTopKFromIndex(s, root, e, e.filter(col("vec_id") < NQueries),
      k = K, refine = 200, nProbe = 2)
  }

  private val s12 = Relational.Q(
    "s12_ann_recall_curve",
    (s, d) => annRecallCurve(s, d),
    Some(s"""
      WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < $NQueries),
      scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
          list_reduce(list_transform(list_zip(q.qv, c.embedding),
            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)
          / sqrt(
              list_reduce(list_transform(q.qv,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y)
              * list_reduce(list_transform(c.embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y)) AS cos
        FROM q JOIN embeddings c ON c.vec_id <> q.query_id),
      ranked AS (
        SELECT query_id,
          ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
        FROM scored),
      ex AS (
        SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
          COUNT(*) AS exact_pairs
        FROM ranked WHERE rnk <= $K)
      SELECT l.n_probe, ex.n_queries, ex.exact_pairs,
        TRUE AS recall_monotone, TRUE AS full_cover_at_max
      FROM ex, (VALUES (1), (2), (4), (10)) l(n_probe)
      ORDER BY l.n_probe"""),
    benchFn = Some(s12Bench _))

  // ======== D16 — filtered ANN on the published index (s13) ========

  /** Root of the published ATTRIBUTE-CARRYING IVF-PQ index for `sfDir`
    * (the s9 memo pattern with `attrs` = the embeddings label column
    * denormalized into codes — the filtered-search artifact).
    */
  def filteredIndexRootFor(spark: SparkSession, sfDir: String): String =
    publishedIndexRoots.computeIfAbsent("attr:" + sfDir, { _ =>
      val root = java.nio.file.Files.createTempDirectory("graft-s13-attr").toString
      val e = Tables.embeddings(spark, sfDir)
      val rs = publishIvfPqIndex(e.select(col("vec_id"), col("embedding")),
        root, token = "s13",
        attrs = Some(e.select(col("vec_id"), col("label"))))
      require(rs.size == 3 && rs.forall(_.published),
        s"s13 index publish failed: $rs")
      root
    })

  // D16 — ATTRIBUTE-CONSTRAINED retrieval (filtered vector search, the
  // production story every vector store ships): top-k among corpus
  // vectors with label = 1, served from the published index with the
  // predicate PUSHED TO THE CODES PARQUET SCAN (attributes were
  // denormalized at publish — zero query-time attribute joins;
  // spec-asserted PushedFilters + zero non-broadcast exchange). The
  // exact leg re-ranks the FILTERED universe (the honest denominator);
  // the refine pool floor tracks the filtered corpus fraction so a
  // selective predicate can't starve coverage (pre-filtering, not
  // post-filtering a fixed pool). nProbe=6: a label filter thins every
  // probed list ~|labels|x, so the filtered read probes deeper than
  // s9's 4 for the same recall floor.
  private def s13TopK(s: SparkSession, d: String): DataFrame = {
    val root = filteredIndexRootFor(s, d)
    val e = Tables.embeddings(s, d)
    ivfPqTopKFromIndexWhere(s, root, e,
      e.filter(col("vec_id") < NQueries), k = K, refine = 200, nProbe = 6,
      col("label") === 1)
  }

  private val s13 = Relational.Q(
    "s13_ann_filtered_topk",
    (s, d) => recallBounds(
      bruteTopKPairsWhere(Tables.embeddings(s, d), col("label") === 1),
      s13TopK(s, d), 0.6),
    Some(s"""
      WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < $NQueries),
      scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
          list_reduce(list_transform(list_zip(q.qv, c.embedding),
            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)
          / sqrt(
              list_reduce(list_transform(q.qv,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y)
              * list_reduce(list_transform(c.embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y)) AS cos
        FROM q JOIN embeddings c
          ON c.vec_id <> q.query_id AND c.label = 1),
      ranked AS (
        SELECT query_id,
          ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
        FROM scored)
      SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
        COUNT(*) AS exact_pairs, TRUE AS within_floor
      FROM ranked WHERE rnk <= $K"""),
    benchFn = Some(s13TopK _))

  /** D8's reduction, exposed for the spec: rank neighbors by COSINE of
    * the Bachrach et al. (2014, "Speeding Up the Xbox Recommender...")
    * norm-augmented vectors — corpus v -> [v, sqrt(M^2 - |v|^2)] (M =
    * max corpus norm, so every augmented vector has norm exactly M),
    * query q -> [q, 0]. cos(q^, v^) = (q.v) / (|q| * M): a strictly
    * increasing function of the inner product for each fixed query, so
    * augmented-cosine top-k IS MIPS top-k — which is what lets every
    * cosine ANN index in this pack (s2-s6) serve inner-product
    * retrieval unchanged after one write-path augmentation.
    */
  def mipsAugmentedTopK(e: DataFrame, nQueries: Int, k: Int): DataFrame = {
    import graft.functions.{VectorFunctions => V}
    val m2 = e.agg(max(V.normSq(col("embedding"))).as("m2"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"),
        concat(transform(col("embedding"), x => x.cast("double")),
          array(lit(0.0))).as("qv"))
    val c = Tables.spread(e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")))
      .crossJoin(broadcast(m2))
      .select(col("neighbor_id"),
        concat(transform(col("cv"), x => x.cast("double")),
          array(sqrt(greatest(col("m2") - V.normSq(col("cv")), lit(0.0))))).as("cv"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", V.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"))
      .orderBy(col("query_id"), col("rnk"))
  }

  // D8 — MIPS: top-k by INNER PRODUCT (recommendation-style retrieval,
  // where a longer vector legitimately outranks a nearer-in-angle one —
  // cosine is the wrong metric there). The oracle-checked query is the
  // exact dot-product ranking (the s1 brute-force shape with the
  // codegen-free fold dot — deterministic left fold, bit-identical to
  // DuckDB's list_reduce); the spec pins [[mipsAugmentedTopK]] equal to
  // it, proving the reduction that makes s2-s6 MIPS-capable.
  private val s7 = Relational.Q(
    "s7_mips_topk",
    (s, d) => {
      import graft.functions.{VectorFunctions => V}
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val c = Tables.spread(e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")))
      val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
        .withColumn("ip", V.dot(col("qv"), col("cv")))
      val w = Window.partitionBy(col("query_id")).orderBy(col("ip").desc, col("neighbor_id"))
      scored.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= K)
        .select(col("query_id"), col("rnk"), col("neighbor_id"),
          r4(col("ip")).as("inner_product"))
        .orderBy(col("query_id"), col("rnk"))
    },
    Some(s"""
      WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < $NQueries),
      scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
          list_reduce(list_transform(list_zip(q.qv, c.embedding),
            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y) AS ip
        FROM q JOIN embeddings c ON c.vec_id <> q.query_id),
      ranked AS (
        SELECT query_id, neighbor_id, ip,
          ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ip DESC, neighbor_id) AS rnk
        FROM scored)
      SELECT query_id, rnk, neighbor_id, ${r4Sql("ip")} AS inner_product
      FROM ranked WHERE rnk <= $K ORDER BY query_id, rnk"""))

  /** D12's core: the corpus covariance as INTEGER-EXACT sufficient
    * statistics — quantize each embedding coordinate to `scaleBits`
    * fractional bits (floor(x·2^b): float→double widening, a power-of-2
    * multiply and floor are all exact and engine-identical), then one
    * [[graft.functions.GramSumLong]] pass emits n, the first-moment
    * sums and the upper-triangle product sums. Integer sums are
    * order-free, so the whole corpus-sized covariance is bit-determined
    * and FULLY oracle-checkable — no fold discipline, no r4, no
    * tolerance. This is the "sufficient statistics, not data, to the
    * driver" pattern (x13 FrequentDirections): the d(d+1)/2 statistics
    * are parameter-bounded however large the corpus; the quantization
    * error is bounded by 2^−b per coordinate (b=10 ⇒ covariance entries
    * exact to ~1e-3 relative, capacity ~4.6×10^12 rows before the
    * fail-loud overflow contract trips — the GramSumLong scaladoc).
    */
  def gramSums(emb: DataFrame, scaleBits: Int = 10): DataFrame = {
    require(scaleBits >= 1 && scaleBits <= 26, s"scaleBits in [1,26], got $scaleBits")
    val scale = (1L << scaleBits).toDouble
    val q = transform(col("embedding"), x => floor(x.cast("double") * lit(scale)).cast("long"))
    emb.agg(graft.functions.GramSumLong(q).as("g"))
  }

  /** D12's driver-checkable frame: one row per upper-triangle cell
    * (i, j, n, s_i, s_j, s_ij) — everything a consumer needs to build
    * the exact covariance C_ij = (s_ij/n − (s_i/n)(s_j/n))/2^2b.
    */
  def gramMatrix(emb: DataFrame, scaleBits: Int = 10): DataFrame =
    gramSums(emb, scaleBits)
      .select(col("g.n").as("n"), col("g.sums").as("sums"),
        explode(col("g.pairs")).as("pr"))
      .select(col("pr.i").cast("long").as("i"), col("pr.j").cast("long").as("j"),
        col("n"),
        element_at(col("sums"), col("pr.i") + 1).as("s_i"),
        element_at(col("sums"), col("pr.j") + 1).as("s_j"),
        col("pr.p").as("s_ij"))
      .orderBy(col("i"), col("j"))

  // D12 — the PCA Gram pass. DuckDB replays quantization and every sum
  // from the same parquet — the first corpus-sized float-DERIVED
  // statistic in the pack with an EXACT (tolerance-free) oracle, because
  // the quantize-then-integer-sum design removes accumulation order from
  // the answer entirely.
  private val s10 = Relational.Q(
    "s10_pca_gram",
    (s, d) => gramMatrix(Tables.embeddings(s, d), scaleBits = 10),
    Some("""
      WITH q AS (
        SELECT list_transform(embedding,
          x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1024.0) AS BIGINT)) AS q
        FROM embeddings),
      r AS (SELECT q, unnest(range(len(q))) AS i FROM q),
      rr AS (SELECT q, i, unnest(range(i, len(q))) AS j FROM r)
      SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(q[i+1]) AS BIGINT) AS s_i,
        CAST(SUM(q[j+1]) AS BIGINT) AS s_j,
        CAST(SUM(q[i+1] * q[j+1]) AS BIGINT) AS s_ij
      FROM rr GROUP BY i, j ORDER BY i, j"""))

  /** D13's eigensolve: covariance from [[gramMatrix]] rows → cyclic
    * Jacobi diagonalization on the DRIVER — d×d is embedding-dimension-
    * bounded (a PARAMETER, never the corpus; d=64 ⇒ a 4 KB matrix), the
    * same driver-side budget x13's FD merge spends. Deterministic:
    * fixed sweep order, fixed convergence threshold, no randomness.
    * Returns (eigenvalues descending, rotation R with R(row)(col) =
    * component `row` of eigenvector `col`), so rotated = Rᵀx.
    */
  def pcaFromGram(gram: DataFrame, scaleBits: Int = 10): (Array[Double], Array[Array[Double]]) = {
    val rows = gram.collect()
    require(rows.nonEmpty, "pcaFromGram: empty gram frame")
    val d = rows.map(_.getLong(0)).max.toInt + 1
    val n = rows.head.getLong(2).toDouble
    val scale = (1L << scaleBits).toDouble
    val c = Array.ofDim[Double](d, d)
    rows.foreach { r =>
      val i = r.getLong(0).toInt; val j = r.getLong(1).toInt
      val si = r.getLong(3).toDouble; val sj = r.getLong(4).toDouble
      val sij = r.getLong(5).toDouble
      val cov = (sij / n - (si / n) * (sj / n)) / (scale * scale)
      c(i)(j) = cov; c(j)(i) = cov
    }
    jacobiEigen(c)
  }

  /** Cyclic Jacobi eigensolve for a symmetric matrix (Golub & Van Loan
    * §8.5): sweep all (p,q) pairs in fixed row-major order, rotate away
    * each off-diagonal entry, until the off-diagonal Frobenius mass
    * drops below tol·‖A‖_F or maxSweeps. O(d³) per sweep on a
    * parameter-sized matrix. Eigen-pairs sorted by eigenvalue
    * descending, ties by original index (deterministic).
    */
  def jacobiEigen(a0: Array[Array[Double]], tol: Double = 1e-12,
      maxSweeps: Int = 50): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val normF = math.sqrt(a0.map(_.map(x => x * x).sum).sum)
    var sweep = 0
    var off = Double.MaxValue
    while (off > tol * math.max(normF, Double.MinPositiveValue) && sweep < maxSweeps) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (apq != 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            // Rutishauser form: sign(0) must be +1, else theta == 0
            // (equal diagonal entries, e.g. [[a,b],[b,a]]) yields t = 0
            // — an identity rotation that never reduces a(p)(q).
            val sgn = if (theta >= 0.0) 1.0 else -1.0
            val t = sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val cs = 1.0 / math.sqrt(t * t + 1.0)
            val sn = t * cs
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = cs * akp - sn * akq
              a(k)(q) = sn * akp + cs * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = cs * apk - sn * aqk
              a(q)(k) = sn * apk + cs * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = cs * vkp - sn * vkq
              v(k)(q) = sn * vkp + cs * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = math.sqrt((0 until d).map(i =>
        (0 until d).filter(_ != i).map(j => a(i)(j) * a(i)(j)).sum).sum)
      sweep += 1
    }
    require(off <= tol * math.max(normF, Double.MinPositiveValue) || normF == 0.0,
      s"jacobiEigen: not converged after $maxSweeps sweeps (off=$off, normF=$normF)")
    val order = (0 until d).sortBy(k => (-a(k)(k), k))
    val eig = order.map(k => a(k)(k)).toArray
    val r = Array.tabulate(d, d)((row, col) => v(row)(order(col)))
    (eig, r)
  }

  /** D13's apply stage: rotate (and optionally WHITEN) the embedding
    * column by a fixed d×d matrix — `rotated_j = Σ_i x_i R_ij`, scaled
    * by 1/√(λ_j + eps) when eigenvalues are supplied. The matrix enters
    * the plan as ONE literal (parameter-sized, shipped with the plan
    * like a broadcast dim), and the projection is a narrow codegen'd
    * HOF chain — rotating a 100 TB embedding column is scan-bound, no
    * shuffle, attaches to a stream unchanged (the A28 stateless class).
    * This is the OPQ-family preprocessing step (Ge et al. 2013): PQ
    * subquantizers assume independent subspaces; rotating onto the PCA
    * basis (optionally whitened) decorrelates coordinates so the s6/s8
    * codebooks spend their bits where the variance is.
    */
  def rotateEmbeddings(emb: DataFrame, r: Array[Array[Double]],
      eigvals: Array[Double] = null, eps: Double = 1e-9,
      out: String = "rotated"): DataFrame = {
    val d = r.length
    // whitening scales fold into the weight matrix exactly as the HOF
    // spelling did (w_ji = R_ij · s_j), so outputs are bit-unchanged;
    // the projection itself is the codegen'd H14 expression
    val w = Array.tabulate(d, d) { (j, i) =>
      val s = if (eigvals == null) 1.0
        else 1.0 / math.sqrt(math.max(eigvals(j), 0.0) + eps)
      r(i)(j) * s
    }
    emb.withColumn(out, graft.functions.RotateVector(col("embedding"), w))
  }

  // ======== D17 — RESIDUAL IVF-PQ (s14) ========

  /** Root of the published RESIDUAL IVF-PQ index for `sfDir` (the s9
    * memo pattern with `residual = true`): subquantizers code
    * x − centroid(list) under l2 — the FAISS-shape IVFPQ, the standard
    * recall lift at unchanged bits.
    */
  def residualIndexRootFor(spark: SparkSession, sfDir: String): String =
    publishedIndexRoots.computeIfAbsent("res:" + sfDir, { _ =>
      val root = java.nio.file.Files.createTempDirectory("graft-s14-res").toString
      val rs = publishIvfPqIndex(Tables.embeddings(spark, sfDir), root,
        token = "s14", residual = true)
      require(rs.size == 3 && rs.forall(_.published),
        s"s14 residual index publish failed: $rs")
      root
    })

  // D17 — the s9 read-path plan with the residual add-back fused into
  // the reconstruction map (one zip_with / one ListCentroid lookup per
  // candidate row — still zero non-broadcast exchange on the scoring
  // stage). Floor RAISED to 0.7 (s9's band is 0.6): coding the residual
  // concentrates subquantizer variance, the measured lift the r15
  // verdict asked to pin.
  private def s14TopK(s: SparkSession, d: String): DataFrame = {
    val root = residualIndexRootFor(s, d)
    val e = Tables.embeddings(s, d)
    ivfPqTopKFromIndex(s, root, e, e.filter(col("vec_id") < NQueries),
      k = K, refine = 200, nProbe = 4)
  }

  private val s14 = Relational.Q(
    "s14_ann_residual_topk",
    (s, d) => recallBounds(bruteTopKPairs(Tables.embeddings(s, d)), s14TopK(s, d), 0.7),
    Some(exactTopKBoundsSql),
    benchFn = Some(s14TopK _))

  val all: Seq[Relational.Q] = Seq(s1, s2, s3, s4, s5, s6, s7, s8, s9, s10,
    s11, s12, s13, s14)
}

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

  // D2 — LSH-bucketed ANN: candidates share the query's 16-bit
  // random-hyperplane bucket; top-k within candidates. Rows-only driver
  // check (approximate by design); the spec measures recall vs s1.
  private val s2 = Relational.Q(
    "s2_ann_lsh_topk",
    (s, d) => {
      val e = Tables.spread(Tables.embeddings(s, d))
        .withColumn("bucket", rhpBucket(col("embedding"))).persist()
      val q = e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("bucket"))
      val c = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"), col("bucket"))
      val scored = c.join(broadcast(q), Seq("bucket"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("cos", CosF(col("qv"), col("cv")))
      val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
      scored.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= K)
        .select(col("query_id"), col("rnk"), col("neighbor_id"), r4(col("cos")).as("cosine"))
        .orderBy(col("query_id"), col("rnk"))
    },
    None)

  // D3 — threshold cosine self-join via shared LSH bucket (the scale path
  // for C5's brute-force semantics). Rows-only; spec asserts it returns a
  // subset of the exact pairs and finds the strongest ones.
  private val s3 = Relational.Q(
    "s3_similarity_join",
    (s, d) => {
      val e = Tables.spread(Tables.embeddings(s, d))
        .withColumn("bucket", rhpBucket(col("embedding"), planes = 8)).persist()
      val a = e.select(col("bucket"), col("vec_id").as("id_a"), col("embedding").as("va"))
      val b = e.select(col("bucket"), col("vec_id").as("id_b"), col("embedding").as("vb"))
      a.join(b, Seq("bucket"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("cos", CosF(col("va"), col("vb")))
        .filter(col("cos") >= 0.3)
        .select(col("id_a"), col("id_b"), r4(col("cos")).as("cosine"))
        .orderBy(col("id_a"), col("id_b"))
    },
    None)

  // D4 — IVF-lite ANN: a deterministic centroid sample partitions the
  // corpus into inverted lists (each vector assigned to its nearest
  // centroid); queries probe their nProbe nearest lists only. At 100 TB
  // the lists are the partitioning: the corpus scan is replaced by a
  // bucket-pruned read, and centroids come from k-means instead of a
  // sample — the join/shuffle shape is identical.
  private val s4 = Relational.Q(
    "s4_ann_ivf_topk",
    (s, d) => {
      val nProbe = 2
      val e = Tables.spread(Tables.embeddings(s, d))
      // deterministic "training": every 50th vector is a centroid
      val centroids = Tables.embeddings(s, d)
        .filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("centv"))
      // inverted lists: nearest centroid per corpus vector
      val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("centroid_id"))
      val assigned = e.join(broadcast(centroids), lit(true))
        .withColumn("ccos", CosF(col("embedding"), col("centv")))
        .withColumn("arnk", row_number().over(wAssign))
        .filter(col("arnk") === 1)
        .select(col("vec_id"), col("embedding"), col("centroid_id"))
        .persist()
      // queries probe their nProbe nearest centroids
      val q = assigned.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val wProbe = Window.partitionBy(col("query_id")).orderBy(col("pcos").desc, col("centroid_id"))
      val probes = q.join(broadcast(centroids), lit(true))
        .withColumn("pcos", CosF(col("qv"), col("centv")))
        .withColumn("prnk", row_number().over(wProbe))
        .filter(col("prnk") <= nProbe)
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
    },
    None)

  val all: Seq[Relational.Q] = Seq(s1, s2, s3, s4)
}

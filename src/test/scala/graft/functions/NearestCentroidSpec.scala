package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** r16: the map-side assignment/encode expressions must pick the SAME
  * winner as the broadcast-join + max_by(struct(score, −id)) spelling
  * they replaced — including the edge orders (NaN cosine from a zero
  * vector, ragged input, duplicate centroid vectors tying on score).
  */
class NearestCentroidSpec extends SparkSpec {
  import spark.implicits._

  // candidates with non-dense, non-sorted ids; ids 5 and 42 share a
  // vector so any input nearest to it must tie-break to id 5
  private val cands: Seq[(Long, Array[Float])] = Seq(
    100L -> Array(1f, 0f, 0f, 0f),
    5L -> Array(0f, 1f, 1f, 0f),
    42L -> Array(0f, 1f, 1f, 0f),
    7L -> Array(-1f, -1f, 0f, 0.5f))

  private def inputs = Seq(
    (1L, Array(1f, 0.1f, 0f, 0f)),
    (2L, Array(0f, 2f, 1.9f, 0f)),
    (3L, Array(-0.5f, -0.4f, 0f, 0.2f)),
    (4L, Array(0f, 0f, 0f, 0f)), // zero vector: cosine NaN (ranks LARGEST)
    (5L, Array(1f, 1f)), // ragged: invalid score, falls to smallest id
    (6L, Array(0.3f, -0.2f, 0.7f, 0.9f)))
    .toDF("vec_id", "embedding")
    .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))

  private def oldSpelling(metric: String) = {
    val cent = cands.toDF("centroid_id", "centv")
      .select(col("centroid_id"), col("centv").cast("array<float>").as("centv"))
    val score = metric match {
      case "cos" => coalesce(CosineSimilarity(col("embedding"), col("centv")), lit(-2.0))
      case "l2" => -SquaredDistance(col("embedding"), col("centv"))
    }
    inputs.join(broadcast(cent), lit(true))
      .withColumn("s", score)
      .groupBy(col("vec_id"))
      .agg(max_by(col("centroid_id"),
        struct(col("s"), (-col("centroid_id")).as("tie"))).as("centroid_id"))
  }

  test("NearestCentroidId == broadcast-join max_by under cos, incl. NaN/ragged/tie orders") {
    val book = CentroidBook.single(cands)
    val fast = inputs.select(col("vec_id"),
      NearestCentroidId(col("embedding"), lit(0), book).as("centroid_id"))
    val old = oldSpelling("cos")
    val diff = fast.join(old.withColumnRenamed("centroid_id", "old_id"), Seq("vec_id"))
      .filter(col("centroid_id") =!= col("old_id")).collect()
    assert(diff.isEmpty, s"cos winners diverge: ${diff.mkString(", ")}")
    // the duplicate-vector tie resolves to the SMALLER id
    val t = fast.filter(col("vec_id") === 2L).head.getLong(1)
    assert(t == 5L, s"tie must break to the smaller id, got $t")
  }

  test("NearestCentroidId == broadcast-join max_by under l2 (null score un-coalesced)") {
    val book = CentroidBook.single(cands, useL2 = true)
    val fast = inputs.select(col("vec_id"),
      NearestCentroidId(col("embedding"), lit(0), book).as("centroid_id"))
    val old = oldSpelling("l2")
    val diff = fast.join(old.withColumnRenamed("centroid_id", "old_id"), Seq("vec_id"))
      .filter(col("centroid_id") =!= col("old_id")).collect()
    assert(diff.isEmpty, s"l2 winners diverge: ${diff.mkString(", ")}")
  }

  test("PqEncodeCodes + PqReconstruct == the exploded slice/join/collect_list encode on real embeddings") {
    val m = 8; val ds = 8; val kc = 16
    val e = graft.Tables.embeddings(spark, sfDir)
    val subs = graft.operators.Similarity.pqSubVectors(e, m, ds)
    val booksArr = graft.operators.Similarity
      .trainCentroidsKeyedLocal(subs, e, kc, iters = 1)
    val book = CentroidBook.keyed(booksArr, useL2 = false)
    val bc = spark.sparkContext.broadcast(book.vecs)
    val fast = e.select(col("vec_id"),
      PqReconstruct(PqEncodeCodes(col("embedding"), ds, book), bc).as("xhat"))
    // the replaced spelling, verbatim
    val books = booksArr.toDF("sub", "centroid_id", "centv")
      .select(col("sub"), col("centroid_id"),
        col("centv").cast("array<float>").as("centv"))
    val codes = subs.join(broadcast(books), Seq("sub"))
      .withColumn("scos",
        coalesce(CosineSimilarity(col("embedding"), col("centv")), lit(-2.0)))
      .groupBy(col("sub"), col("vec_id"))
      .agg(max_by(col("centroid_id"),
        struct(col("scos"), (-col("centroid_id")).as("tie"))).as("centroid_id"))
    val old = codes.join(broadcast(books), Seq("sub", "centroid_id"))
      .groupBy(col("vec_id"))
      .agg(flatten(transform(array_sort(collect_list(struct(col("sub"), col("centv")))),
        f => f.getField("centv"))).as("xhat"))
    val diff = fast.join(old.withColumnRenamed("xhat", "old_xhat"), Seq("vec_id"))
      .filter(col("xhat") =!= col("old_xhat")).count()
    assert(diff == 0, s"$diff reconstructed vectors diverge from the old encode pipeline")
  }
}

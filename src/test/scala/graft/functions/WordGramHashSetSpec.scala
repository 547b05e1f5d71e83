package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** r17: WordGramHashSet must reproduce the relational wordGramHashes
  * pipeline it replaced — posexplode tokens + lead windows + hash +
  * dropDuplicates — as a SET per doc, for both hash variants (xxhash64
  * seed 42; md5-56), on the real corpus and edge shapes.
  */
class WordGramHashSetSpec extends SparkSpec {
  import spark.implicits._

  private def relational(docs: DataFrame, n: Int,
      hasher: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"),
      posexplode(HashFunctions.tokens(col("text"))).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val leads = (1 until n).map(i => lead(col("tok"), i).over(w).as(s"t$i"))
    toks
      .select((Seq(col("doc_id"), col("tok")) ++ leads): _*)
      .filter(col(s"t${n - 1}").isNotNull)
      .select(col("doc_id"),
        hasher(concat_ws(" ", (col("tok") +: (1 until n).map(i => col(s"t$i"))): _*)).as("g"))
      .dropDuplicates("doc_id", "g")
      .groupBy(col("doc_id")).agg(sort_array(collect_list(col("g"))).as("gs"))
  }

  private def fast(docs: DataFrame, n: Int, md5: Boolean): DataFrame = docs
    .select(col("doc_id"), WordGramHashSet(col("text"), n, md5).as("a"))
    .filter(size(col("a")) > 0)
    .select(col("doc_id"), array_sort(col("a")).as("gs"))

  private def check(docs: DataFrame, n: Int, md5: Boolean): Unit = {
    val hasher: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      if (md5) HashFunctions.md5Hash56 else (c => xxhash64(c))
    val diff = fast(docs, n, md5)
      .join(relational(docs, n, hasher).withColumnRenamed("gs", "gs_rel"),
        Seq("doc_id"), "full_outer")
      .filter(col("gs").isNull || col("gs_rel").isNull || col("gs") =!= col("gs_rel"))
      .collect()
    assert(diff.isEmpty,
      s"n=$n md5=$md5 diverges on ${diff.length} docs: ${diff.take(3).mkString("; ")}")
  }

  private def edgeDocs: DataFrame = Seq(
    "", "one", "one two", "a b c d e f g h i j",
    "repeat repeat repeat repeat repeat repeat repeat repeat repeat",
    "  leading spaces and  runs ", "tab\tsep\ttokens here now really eight nine",
    "Mixed CASE tokens Mixed case TOKENS mixed case").zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("WordGramHashSet == relational pipeline, xxh64, n in {2,8}") {
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    Seq(2, 8).foreach { n =>
      check(corpus, n, md5 = false)
      check(edgeDocs, n, md5 = false)
    }
  }

  test("WordGramHashSet == relational pipeline, md5-56, n = 8") {
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    check(corpus, 8, md5 = true)
    check(edgeDocs, 8, md5 = true)
  }
}

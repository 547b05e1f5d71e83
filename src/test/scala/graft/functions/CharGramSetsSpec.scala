package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** r17: the map-side gram-set expressions must be bit-equal to the
  * relational charGramIds pipelines they replaced — the d3 per-doc
  * sorted gram set, the t8 distinct trigram set, and the t7 winnowing
  * fingerprint set (posexplode + lead window + window-min + distinct) —
  * on the real corpus and on edge/unicode shapes.
  */
class CharGramSetsSpec extends SparkSpec {
  import spark.implicits._

  private def edgeDocs: DataFrame = Seq(
    "", "a", "ab", "abc", "abcd", "abcde",
    "aaaa", "aaaaaaa", "abab ababab",
    "The Quick Brown FOX", "x y z w v",
    "ünïcode grams héré", "tab\tand\nnewline chars",
    "exactly4", "péché", "ωμέγα αβγδ").zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  private def relationalGramSet(docs: DataFrame, k: Int): DataFrame =
    HashFunctions.charGramIds(docs, lower(col("text")), k)
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("g"))).as("sg"))

  private def relationalWinnowSet(docs: DataFrame, k: Int, w: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(0, w - 1)
    HashFunctions.charGramIds(docs, lower(col("text")), k)
      .withColumn("fp", min(col("g")).over(win))
      .select(col("doc_id"), col("fp")).distinct()
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("fp"))).as("sg"))
  }

  private def assertSetEqual(docs: DataFrame, fast: DataFrame, rel: DataFrame,
      what: String): Unit = {
    // relational pipelines emit NO row for gram-less docs; the
    // expression emits an empty array — compare on the non-empty set
    // and check the expression is empty exactly where relational is absent
    val f = fast.filter(size(col("sg")) > 0)
    val joined = f.join(rel.withColumnRenamed("sg", "sg_rel"), Seq("doc_id"), "full_outer")
    val diff = joined.filter(col("sg").isNull || col("sg_rel").isNull ||
      col("sg") =!= col("sg_rel")).collect()
    assert(diff.isEmpty, s"$what diverges on ${diff.length} docs: ${diff.take(3).mkString("; ")}")
  }

  test("SortedGramIdSet == charGramIds groupBy set, k in {3,4}, corpus + edges") {
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    Seq(3, 4).foreach { k =>
      Seq(corpus, edgeDocs).foreach { docs =>
        val fast = docs.select(col("doc_id"),
          SortedGramIdSet(lower(col("text")), k).as("sg"))
        assertSetEqual(docs, fast, relationalGramSet(docs, k), s"gramset k=$k")
      }
    }
  }

  test("WinnowFingerprintSet == posexplode+window-min+distinct, (k,w)=(4,3), corpus + edges") {
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    Seq(corpus, edgeDocs).foreach { docs =>
      val fast = docs.select(col("doc_id"),
        WinnowFingerprintSet(lower(col("text")), 4, 3).as("sg"))
      assertSetEqual(docs, fast, relationalWinnowSet(docs, 4, 3), "winnow (4,3)")
    }
  }

  test("pack order: signed long order of k=4 ids == lexicographic gram order") {
    // winnowing's MIN contract: the XOR rotation makes signed order equal
    // per-codepoint lexicographic order
    val ids = CharGramPack.gramIds("abcdz", 4)
    assert(ids.length == 2 && ids(0) < ids(1)) // "abcd" < "bcdz"
  }
}

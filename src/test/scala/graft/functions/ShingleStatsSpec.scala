package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** r17: ShingleStats must be bit-equal to the t10 spelling it replaced —
  * greatest(size(tk) - (k-1), 0) + size(wordShingles(tk, k)) — on the
  * real corpus and on the edge shapes (empty, sub-k token counts,
  * repeated shingles, empty tokens from leading/odd whitespace,
  * multi-space runs, unicode).
  */
class ShingleStatsSpec extends SparkSpec {
  import spark.implicits._

  private def oldCols(k: Int) = {
    val tk = split(lower(trim(col("text"))), "\\s+")
    (greatest(size(tk) - (k - 1), lit(0)).cast("long"),
      size(HashFunctions.wordShingles(tk, k)).cast("long"))
  }

  private def assertEqual(df: org.apache.spark.sql.DataFrame, k: Int): Unit = {
    val (oldN, oldD) = oldCols(k)
    val st = ShingleStats(col("text"), k)
    val diff = df
      .select(col("text"), oldN.as("n_old"), oldD.as("d_old"),
        st.getField("n_shingles").as("n_new"), st.getField("n_distinct").as("d_new"))
      .filter(col("n_old") =!= col("n_new") || col("d_old") =!= col("d_new"))
      .collect()
    assert(diff.isEmpty,
      s"k=$k diverges on ${diff.length} rows, e.g. ${diff.take(3).mkString("; ")}")
  }

  test("ShingleStats == greatest/wordShingles spelling on the real corpus (k=3)") {
    assertEqual(graft.Tables.documents(spark, "/root/testdata/sf0.001"), 3)
  }

  test("ShingleStats == old spelling on edge shapes, k in {2,3,4}") {
    val edges = Seq(
      "", " ", "a", "a b", "a b c", "a b c d",
      "a a a a a a", "x y x y x y x y",
      "  leading and   multi  spaces ", "tab\tsep\ttokens\there",
      "line\nbreaks\nare\nwhitespace too",
      "Mixed CASE Tokens mixed case tokens",
      "ünïcode tökens ünïcode tökens repeat",
      "a  b   c    d", "same same same same").toDF("text")
    Seq(2, 3, 4).foreach(k => assertEqual(edges, k))
  }

  test("repetition ratio example: repeated shingles counted once") {
    val row = Seq("x y x y x y x y").toDF("text")
      .select(ShingleStats(col("text"), 3).as("st")).head
    val st = row.getStruct(0)
    // 8 tokens -> 6 shingles, alternating "x y x"/"y x y" -> 2 distinct
    assert(st.getLong(0) == 6L && st.getLong(1) == 2L)
  }
}

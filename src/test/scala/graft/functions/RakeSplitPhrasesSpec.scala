package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** r17: RakeSplitPhrases must emit EXACTLY the phrases of the regex
  * spelling it replaced — split on the RAKE delimiter alternation, trim,
  * drop empties — same order, same duplicates, on the real corpus and
  * on the delimiter edge shapes (boundary-guarded stopwords, digits and
  * underscores as word chars, interior vs phrase whitespace, unicode
  * delimiters, leading/trailing runs).
  */
class RakeSplitPhrasesSpec extends SparkSpec {
  import spark.implicits._

  private val stops = Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "was")
  private val delimRe = s"(?:\\s*(?:[^a-z\\s]|\\b(?:${stops.mkString("|")})\\b)\\s*)+"

  private def regexPhrases(docs: DataFrame) = docs
    .select(col("doc_id"), posexplode(split(lower(trim(col("text"))), delimRe)).as(Seq("p0", "p")))
    .select(col("doc_id"), col("p0"), trim(col("p")).as("phrase"))
    .filter(col("phrase") =!= "")
    .groupBy(col("doc_id"))
    .agg(array_sort(collect_list(struct(col("p0"), col("phrase")))).as("ps"))
    .select(col("doc_id"), expr("transform(ps, x -> x.phrase)").as("ps"))

  private def fastPhrases(docs: DataFrame) = docs
    .select(col("doc_id"),
      RakeSplitPhrases(lower(trim(col("text"))), stops).as("ps"))
    .filter(size(col("ps")) > 0)

  private def assertEqual(docs: DataFrame): Unit = {
    val diff = fastPhrases(docs)
      .join(regexPhrases(docs).withColumnRenamed("ps", "ps_re"), Seq("doc_id"), "full_outer")
      .filter(col("ps").isNull || col("ps_re").isNull || col("ps") =!= col("ps_re"))
      .collect()
    assert(diff.isEmpty,
      s"diverges on ${diff.length} docs: ${diff.take(3).mkString("; ")}")
  }

  test("RakeSplitPhrases == regex split on the real corpus") {
    assertEqual(graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")))
  }

  test("RakeSplitPhrases == regex split on edge shapes") {
    val edges = Seq(
      "", "the", "the and of", "cat", "big cat", "big  cat",
      "the cat sat", "cat the dog", "scathe cat", "theand cat",
      "9to5 work", "to9day plan", "x_and_y link", "it's here",
      "one, two; three", "trailing the", "the leading",
      "digits 123 split", "under_score words", "a.b.c",
      "tabs\tand\tcommas, mixed the end",
      "multi   space   the   runs", "(parens) [brackets]",
      "ünïcode délims", "hyphen-ated words", "price $5 now",
      "for for for", "wasp was wasp", "it that is of in to and the was for")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    assertEqual(edges)
  }
}

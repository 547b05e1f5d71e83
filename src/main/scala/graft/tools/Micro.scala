package graft.tools

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{HashFunctions => H}

/** Micro-stage timing scratchpad. */
object Micro {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local(32)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[micro] $label%-28s rows=$n%-9d ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    val tokenHashes = Tables.spread(Tables.documents(spark, sfDir).select(col("doc_id"), col("text")))
      .select(col("doc_id"), explode(H.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    time("tokenHashes")(tokenHashes.count())
    val voteCols = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)).as(s"v$i")
    }
    val votes = tokenHashes.groupBy(col("doc_id")).agg(voteCols.head, voteCols.tail: _*)
    time("votes-64agg")(votes.count())
    val shCol = (0 until 64)
      .map(i => when(col(s"v$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    val sh = votes.select(col("doc_id"), shCol.as("sh"))
    time("simhash-assemble")(sh.count())
    val banded = sh.select(col("doc_id"), col("sh"), explode(H.simhashBands(col("sh"))).as("band"))
    time("banded")(banded.count())
    val a = banded.select(col("band"), col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    time("selfjoin+hamming")(
      a.join(b, Seq("band")).filter(col("doc_a") < col("doc_b"))
        .dropDuplicates("doc_a", "doc_b")
        .withColumn("hamming", H.hamming64(col("sh_a"), col("sh_b")).cast("long"))
        .filter(col("hamming") <= 6).count())
    // shingle pipeline pieces (d2)
    val sg = Tables.spread(Tables.documents(spark, sfDir).select(col("doc_id"), col("text")))
      .select(col("doc_id"), H.tokens(col("text")).as("tk"))
      .select(col("doc_id"), H.wordShingles(col("tk"), 3).as("sg"))
      .filter(size(col("sg")) > 0)
    time("shingle-sets")(sg.count())
    val hashes = sg.select(col("doc_id"), explode(col("sg")).as("shingle"))
      .select(col("doc_id"), xxhash64(col("shingle")).as("h"))
    time("shingle-hashes")(hashes.count())
    val minCols = (0 until 64).map(i => min(xxhash64(col("h"), lit(i))).as(s"m$i"))
    val sig = hashes.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
    time("sig-64agg")(sig.count())
    spark.stop()
  }
}

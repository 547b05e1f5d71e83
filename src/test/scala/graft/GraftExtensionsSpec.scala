package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  test("cosine_sim resolves as a SQL function via GraftExtensions") {
    // Extensions apply only at session build time; clear the default so
    // getOrCreate builds a fresh session (reusing the JVM's SparkContext)
    // instead of returning the shared extension-less test session.
    val prev = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    // withExtensions (programmatic): the "spark.sql.extensions" config is
    // a STATIC conf — it only applies when this builder also creates the
    // SparkContext, which in a shared-suite JVM it does not.
    val spark = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = spark.sql(
        """SELECT cosine_sim(
          |  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
          |  array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS c""".stripMargin)
        .head().getDouble(0)
      assert(r == 0.0)
      val r2 = spark.sql(
        """SELECT cosine_sim(
          |  array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)),
          |  array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS c""".stripMargin)
        .head().getDouble(0)
      assert(math.abs(r2 - 1.0) < 1e-12)
    } finally {
      // do NOT stop(): that would kill the shared SparkContext
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prev.foreach(SparkSession.setDefaultSession)
    }
  }
}

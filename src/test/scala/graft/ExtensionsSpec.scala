package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.extensions.GraftExtensions

/** GraftExtensions must expose the native expressions as SQL functions. */
class ExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    // getOrCreate would return the shared suite session WITHOUT applying
    // extensions — force a fresh session (same SparkContext is reused)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  test("cosine_sim and dot_product are callable from SQL") {
    val r = spark.sql(
      """SELECT cosine_sim(array(1.0D, 0.0D), array(0.6D, 0.8D)) AS c,
        |       dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d""".stripMargin)
      .collect().head
    assert(math.abs(r.getDouble(0) - 0.6) < 1e-12)
    assert(r.getDouble(1) == 11.0)
  }

  test("cosine_sim over float arrays (the embeddings column type)") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f))).toDF("a", "b")
    df.createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT cosine_sim(a, b) AS c FROM vecs").collect().head
    assert(r.getDouble(0) == 1.0)
  }

  test("type check rejects non-array arguments with a clear message") {
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_sim('x', 'y')").collect()
    }
    assert(e.getMessage.contains("cosine_sim") || e.getMessage.contains("DATATYPE"))
  }
}

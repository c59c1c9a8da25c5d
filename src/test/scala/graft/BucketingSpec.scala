package graft

import org.apache.spark.sql.execution.ExplainMode

import graft.sources.Tables

/** Bucketed co-located join: pre-bucketing both fact tables on the join key
  * removes the join Exchange entirely — the 100 TB answer for repeated
  * orders⋈lineitem joins (shuffle once at write time, never again). */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed orders ⋈ lineitem joins without a shuffle exchange") {
    Tables.load(spark, sf(), "orders")
      .write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    Tables.load(spark, sf(), "lineitem")
      .write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(!plan.contains("Exchange"), "bucketed join must not shuffle:\n" +
        plan.linesIterator.take(25).mkString("\n"))
      assert(plan.contains("Bucketed: true"))
      // and it is still correct
      val n = joined.count()
      val expected = Tables.load(spark, sf(), "lineitem")
        .join(Tables.load(spark, sf(), "orders"), $"l_orderkey" === $"o_orderkey")
        .count()
      assert(n == expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}

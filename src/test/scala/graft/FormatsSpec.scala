package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Source/sink format coverage beyond parquet (csv, json, orc) and the
  * partitioned-lake layout with partition pruning — the layout the
  * reference's S3 sink implies at scale (SURVEY.md §2.6 K3). */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private def q1Like(df: org.apache.spark.sql.DataFrame) =
    df.groupBy($"l_returnflag")
      .agg(sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("qty"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag")
      .collect().toSeq

  test("csv / json / orc round-trips preserve aggregation results") {
    val li = Tables.load(spark, sf(), "lineitem")
      .select("l_returnflag", "l_quantity") // csv has no nested/timestamp needs
    val expected = q1Like(li)
    val base = Files.createTempDirectory("fmt").toString
    li.write.option("header", "true").csv(s"$base/csv")
    li.write.json(s"$base/json")
    li.write.orc(s"$base/orc")
    val fromCsv = spark.read.option("header", "true").schema(li.schema).csv(s"$base/csv")
    val fromJson = spark.read.schema(li.schema).json(s"$base/json")
    val fromOrc = spark.read.orc(s"$base/orc")
    assert(q1Like(fromCsv) == expected)
    assert(q1Like(fromJson) == expected)
    assert(q1Like(fromOrc) == expected)
  }

  test("partitioned lake write: month filter prunes partitions in the plan") {
    val out = Files.createTempDirectory("lake").toString
    Tables.load(spark, sf(), "orders")
      .withColumn("order_month",
        date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM"))
      .write.mode("overwrite").partitionBy("order_month").parquet(out)
    val lake = spark.read.parquet(out)
    val one = lake.filter($"order_month" === "1996-03")
    val plan = one.queryExecution.explainString(ExplainMode.fromString("formatted"))
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters")).mkString
    assert(pf.contains("order_month"), s"partition filter missing:\n$pf")
    // pruning is real: only the one directory is scanned
    assert(one.count() ==
      Tables.load(spark, sf(), "orders")
        .filter(date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM") === "1996-03")
        .count())
  }
}

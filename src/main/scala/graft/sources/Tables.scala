package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * Design for scale: every query starts from `spark.read.parquet` so
  * Catalyst's datasource V2 path applies predicate pushdown, column
  * pruning, and partition pruning. No caching here — at 100 TB the
  * scan is the pipeline; the fixtures just stand in for a lake layout
  * (one table per path, would be `partitionBy` dirs at scale).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every fixture as a temp view so `spark.sql` text stays
    * close to the DuckDB oracle dialect. Idempotent. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}

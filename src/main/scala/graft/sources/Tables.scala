package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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

  // One DataFrame per (session, table): the logical plan (schema + file
  // listing) is immutable and reusable across queries, avoiding a parquet
  // footer read per query; physical planning (split sizes, pushdown) still
  // happens per action under the current session conf. Keyed by the
  // session OBJECT (reference equality) — identity hash codes can collide
  // across sessions.
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // opportunistic eviction: entries of stopped sessions would otherwise
    // stay strongly reachable for the JVM lifetime
    cache.keys.filter(_._1.sparkContext.isStopped).foreach(cache.remove)
    cache.getOrElseUpdate((spark, dir, name),
      read(spark, dir, name))
  }

  private def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS): Spark reads it as LongType
    // nanos (spark.sql.legacy.parquet.nanosAsLong=true, set by every
    // session builder in this project); surface it as a micros timestamp,
    // which is exactly what DuckDB's reader yields for the same file.
    // DIV is integral (no double round-trip — ns values exceed 2^53).
    df.schema.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case None => df
    }
  }

  /** Register every fixture as a temp view so `spark.sql` text stays
    * close to the DuckDB oracle dialect. Idempotent. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}

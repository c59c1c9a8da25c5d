package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
    // Normalize events.ts to TimestampType (micros, UTC instant) — the
    // type every downstream operator (unix_millis, window(), as-of join)
    // expects, and what DuckDB's reader yields for the same file. The
    // fixture has shipped two physical encodings of the same instants:
    //  - TIMESTAMP(NANOS) → LongType nanos under
    //    spark.sql.legacy.parquet.nanosAsLong=true (rounds ≤9):
    //    integral DIV (no double round-trip — ns values exceed 2^53);
    //  - TIMESTAMP(MICROS, isAdjustedToUTC=false) → TimestampNTZType
    //    (round 10 regeneration): cast is value-preserving because every
    //    session in this project pins spark.sql.session.timeZone=UTC.
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** Register every fixture as a temp view so `spark.sql` text stays
    * close to the DuckDB oracle dialect. Idempotent. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}

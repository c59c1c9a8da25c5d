package graft

import org.apache.spark.sql.SparkSession

/** Isolation-timing probe for per-query regression adjudication (the
  * dd22/cur7 protocol, SURVEY §9): times the named queries OUT of the
  * battery — fresh session, one untimed warm-up pass over the SAME
  * queries (so each builds exactly its own session caches, nothing
  * else's), then min-of-3 per query in the given order. Comparing the
  * isolated number against the in-battery number separates plan cost
  * (isolated ≈ in-battery) from battery-layout/cache-entanglement
  * effects (isolated ≠ in-battery with identical code).
  *
  * Run: sbt "runMain graft.QueryProbe /root/testdata/sf0.1 cur7_contamination_mixture"
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    require(names.nonEmpty, "usage: QueryProbe <sfDir> <query>...")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.extensions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = names.map(n => n -> SparkEntry.queries(n))
    qs.foreach { case (_, fn) => fn(spark, sfDir).count() } // warm-up
    val timed = qs.map { case (n, fn) =>
      val samples = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      n -> samples.min
    }
    def f(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    println(s"""{"probe":"query_isolation","sf":"$sfDir",""" +
      timed.map { case (n, v) => s""""$n":${f(v)}""" }.mkString(",") + "}")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** AQE-skew-join vs manual salting cross-check (r10 verdict task 7):
  * `SkewJoin.salted` predates relying on AQE's own skew handling, so this
  * main races the two on the same skewed join at sf0.1 and prints
  * min-of-3 wall times; SURVEY §9 records the outcome and the loser's
  * niche.
  *
  * Fixture: lineitem with a manufactured heavy hitter (half of all rows
  * collapse onto suppkey 1 — the "one entityName dominates the stream"
  * shape SkewJoin documents) joined to supplier. Auto-broadcast is OFF
  * for the race: with it on, Spark broadcasts the dim and there is no
  * skew problem to solve — which is itself the first documented answer
  * (broadcast beats both, when the dim fits). AQE's skew thresholds are
  * lowered to fire at sf0.1 sizes (the defaults trigger at 256 MB
  * partitions; sf0.1's hot partition is ~10 MB).
  */
object AqeSkewCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.extensions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def skewedFact: DataFrame =
      graft.sources.Tables.load(spark, sfDir, "lineitem")
        .select(
          when(col("l_orderkey") % 2 === 0, 1L)
            .otherwise(col("l_suppkey")).as("suppkey"),
          col("l_extendedprice"))
    def dim: DataFrame =
      graft.sources.Tables.load(spark, sfDir, "supplier")
        .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))

    def agg(joined: DataFrame): DataFrame =
      joined.groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_lines"), sum(col("l_extendedprice")).as("rev"))

    def timed(label: String)(mk: => DataFrame): Double = {
      mk.count() // warm-up
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.count()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"== $label%-28s min-of-3 = $t%.3f s")
      t
    }

    def withConfs(confs: (String, String)*)(body: => Double): Double = {
      val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body
      finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    val noBroadcast = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")

    // 0) the null hypothesis: broadcast on (defaults) — no skew problem
    val tBroadcast = timed("broadcast (defaults)")(agg(skewedFact.join(dim, Seq("suppkey"))))

    // 1) shuffle join, AQE skew-join ON with sf0.1-scaled thresholds
    val tAqe = withConfs(noBroadcast ++ Seq(
        "spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "512k"): _*) {
      timed("AQE skew-join")(agg(skewedFact.join(dim, Seq("suppkey"))))
    }

    // 2) shuffle join, AQE skew OFF — the unmitigated baseline
    val tPlain = withConfs(noBroadcast ++ Seq(
        "spark.sql.adaptive.skewJoin.enabled" -> "false"): _*) {
      timed("plain shuffle (skew unhandled)")(agg(skewedFact.join(dim, Seq("suppkey"))))
    }

    // 3) manual salting, same no-broadcast regime
    val tSalted = withConfs(noBroadcast: _*) {
      timed("SkewJoin.salted(8)")(
        agg(graft.operators.SkewJoin.salted(skewedFact, dim, "suppkey", salts = 8)))
    }

    println(f"RESULT broadcast=$tBroadcast%.3f aqe=$tAqe%.3f plain=$tPlain%.3f salted=$tSalted%.3f")
    spark.stop()
  }
}

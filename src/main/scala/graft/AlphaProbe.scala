package graft

import org.apache.spark.sql.SparkSession

/** Graph-ANN build/serve probe behind the r16 operating-point decision
  * (see `Similarity.ServeEntries`' scaladoc for the measured tables):
  * rebuilds the diversified graph under GRAFT_DIVERSIFY_ALPHA and
  * serves under GRAFT_SERVE_{BEAM,ENTRIES,HOPS} (defaults = the shipped
  * ss17 path), reporting serve recall@3 / visited work / the
  * diversified-edge share. One configuration per JVM by design: the
  * graph artifacts are session-cached, and the twin SQL captures the α
  * constant at class init, so sweeping inside one session would mix
  * builds.
  *
  * Run: for a in 0.9 1.0 1.1; do GRAFT_DIVERSIFY_ALPHA=$a \
  *        sbt "runMain graft.AlphaProbe /root/testdata/sf0.1"; done
  */
object AlphaProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    import graft.llmdata.Similarity
    val t0 = System.nanoTime()
    val div = Similarity.graphDiversify(spark, sfDir).collect()
    val buildSecs = (System.nanoTime() - t0) / 1e9
    val divShare = div.count(_.getAs[Boolean]("diversified")).toDouble / div.length
    val hops = sys.env.get("GRAFT_SERVE_HOPS").map(_.toInt).getOrElse(-1)
    val beam = sys.env.get("GRAFT_SERVE_BEAM").map(_.toInt).getOrElse(8)
    val entries = sys.env.get("GRAFT_SERVE_ENTRIES").map(_.toInt).getOrElse(3)
    val t1 = System.nanoTime()
    val served = (if (hops > 0)
      Similarity.graphServeOver(spark, sfDir,
        Similarity.graphDiversify(spark, sfDir)
          .select(org.apache.spark.sql.functions.col("src_id"),
            org.apache.spark.sql.functions.col("neighbor_id")),
        beam = beam, hops = hops, entries = entries)
    else Similarity.graphServe(spark, sfDir)).collect()
    val serveSecs = (System.nanoTime() - t1) / 1e9
    val recall = served.count(_.getAs[Boolean]("in_exact")).toDouble / served.length
    val visited = served.map(_.getAs[Long]("visited_count"))
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(org.apache.spark.sql.functions.col("vec_id") >= Similarity.NumQueries)
      .count()
    def f(v: Double) = "%.4f".formatLocal(java.util.Locale.ROOT, v)
    println(s"""{"probe":"alpha","alpha":${Similarity.DiversifyAlpha},""" +
      s""""sf":"$sfDir","edges":${div.length},"div_share":${f(divShare)},""" +
      s""""recall3":${f(recall)},"visited_max":${visited.max},""" +
      s""""visited_mean":${f(visited.sum.toDouble / visited.length)},""" +
      s""""corpus":$corpus,"build_secs":${f(buildSecs)},""" +
      s""""serve_secs":${f(serveSecs)}}""")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/stage investigation entry point (not part of the driver
  * contract): prints formatted plans or times sub-stages of one query. */
object DebugPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[debug] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    args.headOption.getOrElse("dd6") match {
      case "dd6" =>
        import org.apache.spark.sql.functions._
        val docs = graft.sources.Tables.load(spark, sfDir, "documents")
          .withColumn("_w", split(col("text"), " "))
          .select(col("doc_id"), array_distinct(expr(
            "transform(sequence(1, size(_w)-2), i -> " +
              "concat_ws(' ', element_at(_w, i), element_at(_w, i+1), element_at(_w, i+2)))"))
            .as("grams"))
        time("grams")(docs.count())
        val inv = docs.select(col("doc_id"), explode(col("grams")).as("gram"))
        time("inv")(inv.count())
        val cands = inv.as("x").join(inv.as("y"),
            col("x.gram") === col("y.gram") && col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        time("cands_raw")(cands.count())
        val dist = cands.distinct()
        time("cands_distinct")(dist.count())
        val full = graft.llmdata.Dedup.ngramJaccard(spark, sfDir)
        time("full")(full.count())
        full.explain("formatted")
      case "mm9big" =>
        // the large-payload probe SCALING.md cites: ~1 MB payloads where
        // the O(position) string-substr form measurably never finished —
        // the native byte-loop expression must stay linear in bytes
        import org.apache.spark.sql.functions._
        import spark.implicits._
        def docs(n: Int, bytesEach: Int) = {
          val unit = "lorem ipsum dolor sit amet consectetur adipiscing elit "
          val payload = unit * (bytesEach / unit.length)
          (1 to n).map(i => (i.toLong, s"doc$i " + payload))
            .toDF("media_id", "text").localCheckpoint()
        }
        val small = docs(32, 100 * 1024)
        val big = docs(32, 1024 * 1024)
        // warm
        graft.llmdata.Multimodal.cdcChunkRows(small).count()
        time("native 32x100KB")(graft.llmdata.Multimodal.cdcChunkRows(small).count())
        time("native 32x1MB")(graft.llmdata.Multimodal.cdcChunkRows(big).count())
        time("staged 32x100KB")(graft.llmdata.Multimodal.cdcChunkRowsStaged(small).count())
        time("staged 32x1MB")(graft.llmdata.Multimodal.cdcChunkRowsStaged(big).count())
      case name =>
        // time construction + count: operators with driver-side loops
        // (dd11/dd14) do real work while BUILDING the frame — timing only
        // count() under-reports them (the bench harness times both)
        time(s"$name (cold)")(SparkEntry.queries(name)(spark, sfDir).count())
        time(s"$name (warm1)")(SparkEntry.queries(name)(spark, sfDir).count())
        // keep warm2's frame so the explain below does not trigger a
        // FOURTH construction (driver-side loops re-run whole job chains),
        // while still timing construction+count like the other two runs
        var df: org.apache.spark.sql.DataFrame = null
        time(s"$name (warm2)") {
          df = SparkEntry.queries(name)(spark, sfDir); df.count()
        }
        df.explain("formatted")
    }
    spark.stop()
  }
}

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
      case "dd6v2" =>
        // staged breakdown of the CURRENT (r20) hashed pipeline: cached
        // hashed grams → capped postings → native pair gen → broadcast
        // doc sides → merge-walk verify
        import org.apache.spark.sql.functions._
        val full = graft.llmdata.Dedup.ngramJaccard(spark, sfDir)
        time("full_cold")(full.count())
        val hdocs = graft.llmdata.Dedup.hashedGramsOf(spark, sfDir, 3)
        time("hashed_cached")(hdocs.count())
        val invAll = hdocs.select(col("doc_id"), explode_outer(col("hg")).as("gram"))
        time("explode")(invAll.count())
        val postings = invAll.filter(col("gram").isNotNull)
          .groupBy(col("gram"))
          .agg(slice(sort_array(collect_list(col("doc_id"))), 1, 20).as("docs"))
        time("postings")(postings.count())
        val cands = postings.select(explode_outer(
          graft.functions.TextHashFunctions.sortedPairs(col("docs"))).as("p"))
          .select(col("p.doc_a"), col("p.doc_b"))
        time("pairs_raw")(cands.count())
        val ga = broadcast(hdocs.select(col("doc_id").as("doc_a"), col("hg").as("grams_a")))
        val gb = broadcast(hdocs.select(col("doc_id").as("doc_b"), col("hg").as("grams_b")))
        val verified = cands.join(ga, "doc_a").join(gb, "doc_b")
          .select(col("doc_a"), col("doc_b"),
            graft.functions.TextHashFunctions.jaccardSorted(col("grams_a"), col("grams_b"))
              .as("jaccard"))
          .filter(col("jaccard") >= 0.1)
        time("verified")(verified.count())
        time("verified_distinct")(verified.distinct().count())
        time("full_warm1")(graft.llmdata.Dedup.ngramJaccard(spark, sfDir).count())
        time("full_warm2")(graft.llmdata.Dedup.ngramJaccard(spark, sfDir).count())
        time("full_warm3")(graft.llmdata.Dedup.ngramJaccard(spark, sfDir).count())
      case "dd6" =>
        // times the CURRENT ngramJaccard stages (cached shingles, capped
        // posting lists, hashed-long merge-walk verify) — first full run
        // builds the session caches, the repeats are the bench-warm shape
        import org.apache.spark.sql.functions._
        import org.apache.spark.sql.types.LongType
        val full = graft.llmdata.Dedup.ngramJaccard(spark, sfDir)
        time("full_cold")(full.count())
        val docs = graft.llmdata.Dedup.gramsOf(spark, sfDir, 3)
        time("grams_cached")(docs.count())
        val invAll = docs.select(col("doc_id"), explode_outer(col("grams")).as("gram"))
        val postings = invAll.filter(col("gram").isNotNull)
          .groupBy(col("gram"))
          .agg(slice(sort_array(collect_list(col("doc_id"))), 1, 20).as("docs"))
        time("postings")(postings.count())
        val n = size(col("docs"))
        val pairGen = when(n >= 2, flatten(transform(
          sequence(lit(1), n - 1),
          i => transform(sequence(i + 1, n),
            j => struct(element_at(col("docs"), i).as("doc_a"),
              element_at(col("docs"), j).as("doc_b"))))))
        val cands = postings.select(explode_outer(pairGen).as("p"))
          .select(col("p.doc_a"), col("p.doc_b"))
        time("pairs_raw")(cands.count())
        time("pairs_distinct")(cands.distinct().count())
        val hashed = sort_array(array_distinct(transform(col("grams"),
          g => conv(substring(md5(g), 1, 15), 16, 10).cast(LongType))))
        val ga = docs.select(col("doc_id").as("doc_a"), hashed.as("grams_a"))
        time("hashed_side")(ga.count())
        val gb = docs.select(col("doc_id").as("doc_b"), hashed.as("grams_b"))
        val verified = cands.distinct().join(ga, "doc_a").join(gb, "doc_b")
          .select(col("doc_a"), col("doc_b"),
            graft.functions.TextHashFunctions.jaccardSorted(col("grams_a"), col("grams_b"))
              .as("jaccard"))
          .filter(col("jaccard") >= 0.1)
        time("verified")(verified.count())
        time("full_warm1")(graft.llmdata.Dedup.ngramJaccard(spark, sfDir).count())
        time("full_warm2")(graft.llmdata.Dedup.ngramJaccard(spark, sfDir).count())
      case "fm1stages" =>
        import org.apache.spark.sql.functions._
        val cust = graft.sources.Tables.load(spark, sfDir, "customer")
        def trigramsOf(c: org.apache.spark.sql.Column) =
          when(length(c) >= 3,
            array_distinct(transform(sequence(lit(1), length(c) - 2),
              i => c.substr(i, lit(3)))))
            .otherwise(array(c))
        def corrupt(c: org.apache.spark.sql.Column) =
          concat_ws("",
            transform(
              filter(sequence(lit(1), length(c)), i => i % 7 =!= 0),
              i => c.substr(i, lit(1))))
        val base = cust.select(col("c_custkey").as("base_key"),
          trigramsOf(col("c_name")).as("base_grams"))
        val probes = cust.filter(col("c_custkey") % 10 === 0)
          .select(col("c_custkey").as("probe_key"),
            trigramsOf(corrupt(col("c_name"))).as("probe_grams"))
        time("probes")(probes.count())
        time("probes2")(probes.count())
        val basePost = base.select(col("base_key"), explode(col("base_grams")).as("g"))
        val rare = basePost.groupBy(col("g")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= 50).select(col("g"))
        val probePost = probes.select(col("probe_key"), explode(col("probe_grams")).as("g"))
        time("probePost")(probePost.count())
        val cands = probePost.join(rare, "g").join(basePost, "g")
          .select(col("probe_key"), col("base_key")).distinct()
        time("cands")(cands.count())
        time("cands2")(cands.count())
        val scored = cands
          .join(probes, "probe_key").join(base, "base_key")
          .select(col("probe_key"), col("base_key"),
            graft.functions.TextHashFunctions
              .jaccard(col("probe_grams"), col("base_grams")).as("sim"))
        time("scored")(scored.count())
        time("scored2")(scored.count())
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("probe_key"))
          .orderBy(col("sim").desc, col("base_key"))
        val best = scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") === 1)
          .select(col("probe_key"), col("base_key").as("matched_key"), col("sim"))
        time("best")(best.count())
        time("best2")(best.count())
        time("full")(SparkEntry.queries("fm1_fuzzy_match")(spark, sfDir).count())
        time("full2")(SparkEntry.queries("fm1_fuzzy_match")(spark, sfDir).count())
        // fm4's candidate chain (swapCorrupt probes), same blocking shape
        def swapCorrupt(c: org.apache.spark.sql.Column) =
          concat_ws("",
            transform(sequence(lit(1), length(c)), i =>
              when(i % 6 === 1 && i < length(c), c.substr(i + 1, lit(1)))
                .when(i % 6 === 2, c.substr(i - 1, lit(1)))
                .otherwise(c.substr(i, lit(1)))))
        val probes4 = cust.filter(col("c_custkey") % 10 === 0)
          .select(col("c_custkey").as("probe_key"),
            swapCorrupt(col("c_name")).as("probe_name"))
          .withColumn("probe_grams", trigramsOf(col("probe_name")))
        val probePost4 = probes4.select(col("probe_key"), explode(col("probe_grams")).as("g"))
        val cands4 = probePost4.join(rare, "g").join(basePost, "g")
          .select(col("probe_key"), col("base_key")).distinct()
        time("cands4")(cands4.count())
        time("cands4b")(cands4.count())
        time("fm4full")(SparkEntry.queries("fm4_fuzzy_match_damerau")(spark, sfDir).count())
        time("fm4full2")(SparkEntry.queries("fm4_fuzzy_match_damerau")(spark, sfDir).count())
        time("fm1again")(SparkEntry.queries("fm1_fuzzy_match")(spark, sfDir).count())
        val f1 = SparkEntry.queries("fm1_fuzzy_match")(spark, sfDir)
        f1.count()
        println("==== fm1 FINAL PLAN ====")
        println(f1.queryExecution.executedPlan.toString.take(12000))
        val f4 = SparkEntry.queries("fm4_fuzzy_match_damerau")(spark, sfDir)
        f4.count()
        println("==== fm4 FINAL PLAN ====")
        println(f4.queryExecution.executedPlan.toString.take(12000))
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

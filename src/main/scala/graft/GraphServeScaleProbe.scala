package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.llmdata.Similarity

/** r16 verdict task 6: MEASURE (don't assert) that the graph-ANN serve's
  * visited FRACTION falls with corpus size at the shipped operating
  * point (beam 9, entries 2, 6 hops — the ss17/ss19 setting).
  *
  * Corpora: the real sf0.001 (490 corpus vectors) and sf0.1 (1990)
  * embedding fixtures as-is, plus a 4990-vector expansion of sf0.1. The
  * expansion keeps the fixture's 1990 corpus vectors and synthesizes the
  * remainder as CONVEX MIXTURES of same-label vector pairs (partner =
  * label-local rank shifted by the copy index; mix weight hash-derived
  * in [0.35, 0.65]) — new points that lie ON the fixture's cluster
  * manifold without being near-duplicates of any single vector.
  * (Replicate-with-small-jitter was measured first and REJECTED: it
  * turns each query's exact top-3 into three near-identical copies of
  * one point — an adversarial geometry that confounds the scaling
  * question with a duplicate-clump pathology; recall@3 read 0.333 for
  * that reason alone.) The 10 query vectors are the fixture's own,
  * unchanged, so recall@3 is against each corpus's exact brute-force
  * top-3.
  *
  * Output: one line per corpus size with recall@3, mean visited nodes,
  * and visited fraction — the SCALING.md ss19 evidence row. The claim
  * under test: mean_visited grows sublinearly in corpus size (beam-
  * bounded frontier), so visited/corpus falls.
  */
object GraphServeScaleProbe {

  private val JitterHash = 2654435761L // Knuth multiplicative hash

  /** Expand dir's embeddings to `targetCorpus` corpus vectors (plus the
    * fixture's queries) under deterministic jitter; writes a fixture-
    * shaped embeddings.parquet under /tmp and returns the dir. */
  private def expandedDir(spark: SparkSession, dir: String,
                          targetCorpus: Int): String = {
    val out = s"/tmp/graph_serve_scale_$targetCorpus"
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
    val nq = 10L // Similarity.NumQueries
    val corpus = base.filter(col("vec_id") >= nq)
    val baseN = corpus.count()
    val copies = ((targetCorpus + baseN - 1) / baseN).toInt // synth rounds
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("label")).orderBy(col("vec_id"))
    val ranked = corpus
      .withColumn("r", row_number().over(w).cast(LongType) - 1)
      .withColumn("nl", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("label")))
        .cast(LongType))
    val a = ranked.select(col("label"), col("r"), col("nl"),
      col("vec_id"), col("embedding"))
    val b = ranked.select(col("label"), col("r").as("rb"),
      col("embedding").as("eb"))
    // synth round c pairs each vector with its label-local rank+c
    // neighbor; mix weight from a hash of (vec_id, c) in [0.35, 0.65]
    val synth = a
      .select(col("label"), col("r"), col("nl"), col("vec_id"),
        col("embedding"),
        explode(sequence(lit(1), lit(copies - 1))).as("c"))
      .withColumn("rb", pmod(col("r") + col("c").cast(LongType), col("nl")))
      .join(b, Seq("label", "rb"))
      .select(
        (col("vec_id") + col("c").cast(LongType) * baseN).as("vec_id"),
        zip_with(col("embedding"), col("eb"), (x, y) => {
          val frac = pmod(col("vec_id") * lit(JitterHash) +
            col("c").cast(LongType) * lit(7919L), lit(1000L))
            .cast("double") / lit(1000.0)
          val mix = lit(0.35) + frac * lit(0.3)
          (x.cast("double") * mix + y.cast("double") * (lit(1.0) - mix))
            .cast("float")
        }).as("embedding"),
        col("label"))
      .filter(col("vec_id") < nq + targetCorpus)
    base.filter(col("vec_id") < nq)
      .select(col("vec_id"), col("embedding"), col("label"))
      .union(corpus.select(col("vec_id"), col("embedding"), col("label")))
      .union(synth)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    out
  }

  private def measure(spark: SparkSession, label: String,
                      dir: String): String = {
    val n = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") >= 10).count()
    val t0 = System.nanoTime()
    val row = Similarity.serveSweep(spark, dir)
      .filter(col("beam") === 9 && col("entries") === 2 && col("hop") === 6)
      .collect().head
    val sec = (System.nanoTime() - t0) / 1e9
    val recall = row.getAs[Double]("recall3")
    val visited = row.getAs[Double]("mean_visited")
    f"""{"corpus":"$label","n":$n,"recall3":$recall%.3f,""" +
      f""""mean_visited":$visited%.1f,""" +
      f""""visited_frac":${visited / n}%.4f,"sweep_sec":$sec%.2f}"""
  }

  /** Retune grid at an arbitrary operating point: serve over the built
    * diversified graph at (beam, entries, hops), report recall@3 and
    * mean visited. */
  private def retune(spark: SparkSession, label: String, dir: String,
                     n: Long, beam: Int, entries: Int, hops: Int): String = {
    val edges = Similarity.graphDiversify(spark, dir)
      .select(col("src_id"), col("neighbor_id"))
    val served = Similarity.graphServeOver(spark, dir, edges,
      beam = beam, hops = hops, entries = entries).collect()
    val hits = served.count(_.getAs[Boolean]("in_exact"))
    val visited = served.map(r =>
      r.getAs[Long]("query_id") -> r.getAs[Long]("visited_count"))
      .distinct.map(_._2.toDouble)
    val mv = visited.sum / visited.length
    f"""{"corpus":"$label","n":$n,"beam":$beam,"entries":$entries,""" +
      f""""hops":$hops,"recall3":${hits / 30.0}%.3f,""" +
      f""""mean_visited":$mv%.1f,"visited_frac":${mv / n}%.4f}"""
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]").appName("graph-serve-scale-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(measure(spark, "sf0.001", "/root/testdata/sf0.001"))
    println(measure(spark, "sf0.1", "/root/testdata/sf0.1"))
    val big = expandedDir(spark, "/root/testdata/sf0.1", 4990)
    println(measure(spark, "sf0.1x2.5", big))
    // the shipped point degraded at 2.5x — find where the serve budget
    // must move (deeper/wider) to restore recall, and what it costs
    for ((beam, entries, hops) <- Seq((9, 2, 10), (16, 4, 8), (24, 8, 10),
        (16, 4, 12), (24, 8, 6), (24, 4, 10), (20, 6, 8)))
      println(retune(spark, "sf0.1x2.5", big, 4990L, beam, entries, hops))
    // the OTHER lever: the retune grid above holds the build-degree cap
    // at 20 (where degreeOf saturates for n >= 1024) and widens the
    // SERVE; here lift the cap to 32 (build degree 24 at 4990), rebuild
    // the index, and re-serve — measuring whether a denser graph buys
    // recall back at a narrower frontier than beam-widening alone
    Similarity.clearExemplars(spark)
    Similarity.setDegreeCapOverride(spark, big, 32)
    try
      for ((beam, entries, hops) <- Seq((9, 2, 6), (9, 2, 10), (16, 4, 8),
          (16, 4, 10)))
        println(retune(spark, "sf0.1x2.5-cap32", big, 4990L, beam, entries,
          hops))
    finally {
      Similarity.clearDegreeCapOverride(spark, big)
      Similarity.clearExemplars(spark)
    }
    spark.stop()
  }
}

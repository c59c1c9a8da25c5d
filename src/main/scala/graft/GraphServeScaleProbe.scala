package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.llmdata.{Dedup, Similarity}

/** r16 verdict task 6 (extended r17–r19): MEASURE (don't assert) that the
  * graph-ANN serve's visited FRACTION falls with corpus size at the
  * shipped corpus-scaled budgets, and that each budget formula's choice
  * is the knee (one notch down leaves the recall band) rather than slack.
  *
  * Corpora: the real sf0.001 (490 corpus vectors) and sf0.1 (1990)
  * embedding fixtures as-is, plus expansions of sf0.1 at 4990 / 9990 /
  * 19990 (r19 adds the fourth octave — the serveEntriesOf +2/octave
  * slope was anchored by a single post-knee corpus). The expansion keeps
  * the fixture's 1990 corpus vectors and synthesizes the remainder as
  * CONVEX MIXTURES of same-label vector pairs (partner = label-local
  * rank shifted by the copy index; mix weight hash-derived in
  * [0.35, 0.65]) — new points that lie ON the fixture's cluster manifold
  * without being near-duplicates of any single vector.
  * (Replicate-with-small-jitter was measured first and REJECTED: it
  * turns each query's exact top-3 into three near-identical copies of
  * one point — an adversarial geometry that confounds the scaling
  * question with a duplicate-clump pathology; recall@3 read 0.333 for
  * that reason alone.)
  *
  * QUERY FIXTURE (r18 verdict task 2): 10 fixture queries give recall@3
  * granularity 1/30 = 0.033 — every knee adjudication rode 1–2 query
  * deltas. The probe now serves 30 queries: the fixture's own 10 plus 20
  * synthesized the same way the corpus expansion synthesizes points
  * (convex blend of a fixture query with a same-label corpus vector,
  * hash-chosen partner and weight) — in-distribution queries that are
  * not near-duplicates of any single corpus point. Granularity 1/90 =
  * 0.011. The CORPUS synthesis is unchanged, so rows stay comparable
  * with the r17/r18 record; the 10-query real-graphServe rows are still
  * printed as the bridge (config "DEFAULTS").
  *
  * Output: one JSON line per (corpus, setting) with recall@3, mean
  * visited nodes, and visited fraction over the dir's ACTUAL corpus
  * count (r18 ADVICE: the grid mode used to divide by the caller's n
  * even when the dir was smaller) — the SCALING.md evidence rows.
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
    // copies == 1 would render sequence(1, 0) below — Spark emits the
    // DESCENDING [1, 0], whose c=0 round duplicates the corpus under the
    // ORIGINAL vec_ids (the dsirWeights sequence(1,0) trap; r17 ADVICE).
    // No synthesis needed: the fixture already covers the target.
    require(copies >= 2,
      s"targetCorpus=$targetCorpus <= fixture corpus $baseN — use dir as-is")
    val w = Window.partitionBy(col("label")).orderBy(col("vec_id"))
    val ranked = corpus
      .withColumn("r", row_number().over(w).cast(LongType) - 1)
      .withColumn("nl", count(lit(1)).over(
        Window.partitionBy(col("label"))).cast(LongType))
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

  /** The dir's ACTUAL corpus count (vec_id ≥ NumQueries) — every
    * visited_frac divides by this, never by a caller-passed target
    * (r18 ADVICE: grid mode reported fractions over the wrong n when the
    * requested size fell back to a fixture). Cached per dir. */
  private val corpusNs = scala.collection.mutable.Map.empty[String, Long]
  private def corpusN(spark: SparkSession, dir: String): Long =
    corpusNs.getOrElseUpdate(dir,
      spark.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("vec_id") >= Similarity.NumQueries).count())

  /** The ≥30-query probe fixture for `dir`: the fixture's own 10 queries
    * (query_id 0–9, unchanged) plus `extra` synthesized ones (query_id
    * 1000000+i — disjoint from every corpus vec_id): query i blends
    * fixture query (i mod 10) with a hash-chosen same-label CORPUS
    * vector of the BASE fixture at a hash-derived weight in
    * [0.30, 0.70] — the corpus-expansion synthesis applied to queries,
    * so the extra queries are in-distribution without duplicating any
    * single point. Built from the BASE fixture dir, so the same 30
    * queries probe every expansion of it (corpora are supersets). */
  private def probeQueries(spark: SparkSession, dir: String,
                           extra: Int): DataFrame = {
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
    val nq = Similarity.NumQueries
    val q0 = base.filter(col("vec_id") < nq)
      .select(col("vec_id").cast(LongType).as("query_id"),
        Dedup.vecD(col("embedding")).as("q"), col("label"))
    val w = Window.partitionBy(col("lbl")).orderBy(col("vec_id"))
    val partners = base.filter(col("vec_id") >= nq)
      .select(col("label").as("lbl"), col("vec_id"),
        Dedup.vecD(col("embedding")).as("pv"))
      .withColumn("r", row_number().over(w).cast(LongType) - 1)
      .withColumn("nl", count(lit(1)).over(
        Window.partitionBy(col("lbl"))).cast(LongType))
    val ids = spark.range(extra).select(
      (lit(1000000L) + col("id")).as("query_id"),
      (col("id") % nq).cast(LongType).as("qb"),
      pmod(col("id") * lit(JitterHash) + lit(17L), lit(999983L)).as("pr"),
      (lit(0.30) + pmod(col("id") * lit(7919L), lit(41L)).cast("double")
        / lit(100.0)).as("mw"))
    val blended = ids
      .join(q0.select(col("query_id").as("qb"), col("q").as("bq"),
        col("label").as("lbl")), "qb")
      .join(partners, Seq("lbl"))
      .filter(pmod(col("pr"), col("nl")) === col("r"))
      .select(col("query_id"),
        zip_with(col("bq"), col("pv"),
          (x, y) => x * col("mw") + y * (lit(1.0) - col("mw"))).as("q"))
    q0.select(col("query_id"), col("q"))
      .union(blended)
      .localCheckpoint()
  }

  /** One measured row: serve the query frame over dir's DEFAULT-built
    * cached adjacency at (beam, entries, hops) via the shared serveWalk,
    * audit against the frame's exact brute-force top-3. */
  private def evalRow(spark: SparkSession, label: String, dir: String,
                      q: DataFrame, beam: Int, entries: Int, hops: Int,
                      config: String): String = {
    val n = corpusN(spark, dir)
    val served = Similarity.serveProbeEval(spark, dir, q, beam, entries,
      hops).collect()
    val nQ = served.map(_.getAs[Long]("query_id")).distinct.length
    val hits = served.count(_.getAs[Boolean]("in_exact"))
    val visited = served.map(r =>
      r.getAs[Long]("query_id") -> r.getAs[Long]("visited_count"))
      .distinct.map(_._2.toDouble)
    val mv = visited.sum / visited.length
    f"""{"corpus":"$label","n":$n,"config":"$config","queries":$nQ,""" +
      f""""beam":$beam,"entries":$entries,"hops":$hops,""" +
      f""""recall3":${hits.toDouble / (nQ * 3)}%.3f,""" +
      f""""mean_visited":$mv%.1f,"visited_frac":${mv / n}%.4f}"""
  }

  /** The engine's DEFAULT serve at a dir — the REAL `graphServe` path, no
    * override, no explicit budgets, the fixture's own 10 queries: what a
    * user who just calls graphServe on this corpus actually gets. Kept as
    * the bridge row to the r17/r18 record; the 30-query row at the same
    * budgets (config "DEFAULTS@30q") is the sharp instrument. */
  private def defaults(spark: SparkSession, label: String,
                       dir: String): String = {
    val n = corpusN(spark, dir)
    val served = Similarity.graphServe(spark, dir).collect()
    val hits = served.count(_.getAs[Boolean]("in_exact"))
    val visited = served.map(r =>
      r.getAs[Long]("query_id") -> r.getAs[Long]("visited_count"))
      .distinct.map(_._2.toDouble)
    val mv = visited.sum / visited.length
    f"""{"corpus":"$label","n":$n,"config":"DEFAULTS","queries":10,""" +
      f""""recall3":${hits / 30.0}%.3f,"mean_visited":$mv%.1f,""" +
      f""""visited_frac":${mv / n}%.4f}"""
  }

  /** The formula budgets the default serve path computes for n — what
    * "DEFAULTS@30q" serves at. */
  private def defaultsRow30(spark: SparkSession, label: String, dir: String,
                            q: DataFrame): String = {
    val n = corpusN(spark, dir)
    evalRow(spark, label, dir, q, Similarity.serveBeamOf(n),
      Similarity.serveEntriesOf(n), Similarity.serveHopsOf(n),
      "DEFAULTS@30q")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]").appName("graph-serve-scale-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional ivfK pin for A/B rows (r19: the scaled-codebook lever) —
    // "--ivfk=N" pins spark.graft.ivf.k for the whole run
    val (ivfkArgs, gridArgs) = args.partition(_.startsWith("--ivfk="))
    ivfkArgs.lastOption.foreach { a =>
      spark.conf.set("spark.graft.ivf.k", a.stripPrefix("--ivfk="))
      println(s"""{"note":"ivfK pinned","k":${a.stripPrefix("--ivfk=")}}""")
    }
    val q30base = probeQueries(spark, "/root/testdata/sf0.1", 20)
    // ad-hoc grid mode: each arg is "n:beam:entries:hops" — evalRow rows
    // only, over the expanded corpus for n (or the fixture when n fits);
    // n on the row is the dir's ACTUAL corpus count, not the request
    if (gridArgs.nonEmpty) {
      // expand each target corpus ONCE per run: re-writing the parquet
      // under a dir the session has cached plans against yanks part
      // files out from under the uncheckpointed readers (the audit-tier
      // exact join reads the corpus live)
      val dirs = scala.collection.mutable.Map.empty[Int, String]
      gridArgs.foreach { a =>
        val Array(n, beam, entries, hops) = a.split(":").map(_.toInt)
        val d = dirs.getOrElseUpdate(n,
          if (n <= 1990) "/root/testdata/sf0.1"
          else expandedDir(spark, "/root/testdata/sf0.1", n))
        println(evalRow(spark, s"req$n", d, q30base, beam, entries, hops,
          "GRID"))
      }
      Similarity.clearExemplars(spark)
      spark.stop()
      return
    }
    // Part A — the DEFAULT path at every corpus size, both instruments:
    // the real graphServe (10 fixture queries — the r17/r18 bridge) and
    // the 30-query frame at the same formula budgets
    val q30small = probeQueries(spark, "/root/testdata/sf0.001", 20)
    println(defaults(spark, "sf0.001", "/root/testdata/sf0.001"))
    println(defaultsRow30(spark, "sf0.001", "/root/testdata/sf0.001", q30small))
    println(defaults(spark, "sf0.1", "/root/testdata/sf0.1"))
    println(defaultsRow30(spark, "sf0.1", "/root/testdata/sf0.1", q30base))
    // Part B — 4990: the r18 hop-knee bracket re-measured at 0.011
    // granularity (formula: degree 24, (9, 2, 10))
    val big = expandedDir(spark, "/root/testdata/sf0.1", 4990)
    println(defaults(spark, "sf0.1x2.5", big))
    println(defaultsRow30(spark, "sf0.1x2.5", big, q30base))
    for (hops <- Seq(6, 8, 12))
      println(evalRow(spark, "sf0.1x2.5", big, q30base, 9, 2, hops, "GRID"))
    // Part C — 9990: the r18 entries ladder re-measured (formula:
    // degree 26, (9, 4, 11) at the gate-pinned 16-medoid codebook)
    val huge = expandedDir(spark, "/root/testdata/sf0.1", 9990)
    println(defaults(spark, "sf0.1x5", huge))
    println(defaultsRow30(spark, "sf0.1x5", huge, q30base))
    for (entries <- Seq(2, 3, 5))
      println(evalRow(spark, "sf0.1x5", huge, q30base, 9, entries, 11, "GRID"))
    // Part D (r18 verdict task 1) — 19990: one more octave for the
    // entries question (r18's +2/octave slope predicted 6 here; the
    // measured ladder read FLAT and the default is now the constant 2 —
    // see serveEntriesOf); the ladder rows are the evidence
    val huge2 = expandedDir(spark, "/root/testdata/sf0.1", 19990)
    println(defaults(spark, "sf0.1x10", huge2))
    println(defaultsRow30(spark, "sf0.1x10", huge2, q30base))
    for (entries <- Seq(2, 4, 5, 8))
      println(evalRow(spark, "sf0.1x10", huge2, q30base, 9, entries, 12, "GRID"))
    Similarity.clearExemplars(spark)
    spark.stop()
  }
}

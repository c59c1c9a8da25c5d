package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Fuzzy entity matching (record linkage) — the data-quality operator a
  * Salesforce CDC consumer runs constantly: match an INCOMING, possibly
  * corrupted record name against the existing entity table (lead/account
  * dedupe; the reference's org is exactly such a table, SURVEY.md §1.4).
  * Re-expressed Spark-first over the `customer` fixture: a probe set of
  * deterministically corrupted names (every [[CorruptStride]]-th character
  * dropped) is matched back by char-trigram Jaccard.
  *
  * Blocking (candidate generation) is the part that decides 100 TB
  * viability: trigrams shared by most of the table ("Cus", "ust", …, the
  * common-prefix grams here; "Inc"/"LLC" in real names) are USELESS for
  * blocking and would go quadratic, so candidates come only from trigrams
  * with document frequency ≤ [[BlockDfCap]] — the stop-gram rule every
  * production linkage system applies, the idf analogue of dd6's capped
  * posting lists. Verification then scores the FULL trigram sets (common
  * grams included) and keeps the best match per probe.
  *
  * Scale posture: one shuffle keyed by rare trigram (posting lists bounded
  * by the df cap), one by candidate pair, one per-probe top-1 window —
  * never probe × base. Accuracy (matched key == source key) is itself
  * under the oracle, so the operator's QUALITY is gated, not just its
  * plumbing.
  */
object FuzzyMatch {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Every probe drops the chars at positions ≡ 0 (mod stride). */
  private val CorruptStride = 7
  /** Probe slice: every 10th customer. */
  private val ProbeMod = 10
  /** A trigram blocks (generates candidates) only if its document
    * frequency in the base table is ≤ this. */
  private val BlockDfCap = 50

  private def trigramsOf(c: Column): Column =
    when(length(c) >= 3,
      array_distinct(transform(sequence(lit(1), length(c) - 2),
        i => c.substr(i, lit(3)))))
      .otherwise(array(c))

  private def corrupt(c: Column): Column =
    concat_ws("",
      transform(
        filter(sequence(lit(1), length(c)), i => i % CorruptStride =!= 0),
        i => c.substr(i, lit(1))))

  def fuzzyMatch(spark: SparkSession, dir: String): DataFrame = {
    val base = t(spark, dir, "customer")
      .select(col("c_custkey").as("base_key"),
        trigramsOf(col("c_name")).as("base_grams"))
    val probes = t(spark, dir, "customer")
      .filter(col("c_custkey") % ProbeMod === 0)
      .select(col("c_custkey").as("probe_key"),
        trigramsOf(corrupt(col("c_name"))).as("probe_grams"))

    // blocking: rare base trigrams only (df <= cap)
    val basePost = base.select(col("base_key"), explode(col("base_grams")).as("g"))
    val rare = basePost.groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= BlockDfCap).select(col("g"))
    val probePost = probes.select(col("probe_key"), explode(col("probe_grams")).as("g"))
    val cands = probePost.join(rare, "g").join(basePost, "g")
      .select(col("probe_key"), col("base_key")).distinct()

    // verify on the FULL trigram sets; best match per probe
    val scored = cands
      .join(probes, "probe_key").join(base, "base_key")
      .select(col("probe_key"), col("base_key"),
        graft.functions.TextHashFunctions
          .jaccard(col("probe_grams"), col("base_grams")).as("sim"))
    val w = Window.partitionBy(col("probe_key"))
      .orderBy(col("sim").desc, col("base_key"))
    val best = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") === 1)
      .select(col("probe_key"), col("base_key").as("matched_key"), col("sim"))
    // a probe whose every trigram is a stop-gram has NO candidates — a
    // linkage run must REPORT it unmatched, not silently drop it
    probes.select(col("probe_key"))
      .join(best, Seq("probe_key"), "left")
      .select(col("probe_key"), col("matched_key"),
        coalesce(col("sim"), lit(0.0)).as("sim"),
        coalesce(col("matched_key") === col("probe_key"), lit(false)).as("correct"))
      .orderBy(col("probe_key"))
  }

  val fuzzyMatchSql: String =
    s"""WITH gset AS (SELECT c_custkey AS base_key,
       |    CASE WHEN len(c_name) >= 3 THEN list_distinct(list_transform(
       |      generate_series(1, len(c_name)-2), i -> substr(c_name, i, 3)))
       |    ELSE [c_name] END AS base_grams
       |  FROM customer),
       |probe0 AS (SELECT c_custkey AS probe_key,
       |    array_to_string(list_transform(
       |      list_filter(generate_series(1, len(c_name)), i -> i % $CorruptStride <> 0),
       |      i -> substr(c_name, i, 1)), '') AS pname
       |  FROM customer WHERE c_custkey % $ProbeMod = 0),
       |probes AS (SELECT probe_key,
       |    CASE WHEN len(pname) >= 3 THEN list_distinct(list_transform(
       |      generate_series(1, len(pname)-2), i -> substr(pname, i, 3)))
       |    ELSE [pname] END AS probe_grams
       |  FROM probe0),
       |bpost AS (SELECT base_key, unnest(base_grams) AS g FROM gset),
       |rare AS (SELECT g FROM bpost GROUP BY g HAVING COUNT(*) <= $BlockDfCap),
       |ppost AS (SELECT probe_key, unnest(probe_grams) AS g FROM probes),
       |cands AS (SELECT DISTINCT probe_key, base_key
       |          FROM ppost JOIN rare USING (g) JOIN bpost USING (g)),
       |scored AS (SELECT c.probe_key, c.base_key,
       |    CAST(len(list_intersect(p.probe_grams, b.base_grams)) AS DOUBLE) /
       |    (len(p.probe_grams) + len(b.base_grams)
       |     - len(list_intersect(p.probe_grams, b.base_grams))) AS sim
       |  FROM cands c JOIN probes p USING (probe_key) JOIN gset b USING (base_key)),
       |best AS (SELECT probe_key, base_key AS matched_key, sim
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_key
       |          ORDER BY sim DESC, base_key) AS rank FROM scored) x
       |  WHERE rank = 1)
       |SELECT p.probe_key, b.matched_key, COALESCE(b.sim, 0.0) AS sim,
       |  COALESCE(b.matched_key = p.probe_key, false) AS correct
       |FROM probes p LEFT JOIN best b USING (probe_key)
       |ORDER BY p.probe_key""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fm1_fuzzy_match" -> fuzzyMatch)

  val oracle: Map[String, String] = Map(
    "fm1_fuzzy_match" -> fuzzyMatchSql)
}

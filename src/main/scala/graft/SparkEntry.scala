package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.llmdata.{Curation, Dedup, Multimodal, Similarity, TextAnalysis}
import graft.operators.{CdcQueries, FuzzyMatch}
import graft.relational.{EventsAnalytics, Relational, SqlSurface}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator surface of the engine:
  *  - graft.relational.Relational — the t2 relational gate battery
  *  - graft.operators / graft.functions — CDC + LLM-data operators (added
  *    per-module as they land)
  * Each entry has a DuckDB oracle in `oracleSql` unless the operation is
  * not SQL-expressible (then the driver records a rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextAnalysis.queries ++ Dedup.queries ++
      Similarity.queries ++ Multimodal.queries ++ EventsAnalytics.queries ++
      SqlSurface.queries ++ CdcQueries.queries ++ Curation.queries ++
      FuzzyMatch.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    *
    * TWIN-AUTHORING CONVENTION (EntrySpec-linted): SQL NULL is written
    * UPPERCASE in every twin — a lowercase standalone `null` is reserved
    * as the signature of a Scala `null` interpolated by an
    * object-initialization cycle (the 7bcaca9 failure mode), and the
    * lint reds on it. Likewise literal `% 0` (a baked unassigned Int).
    * Outputs are scalar atomic columns only; render sequences as
    * `md5(array_join(...))` content hashes. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ TextAnalysis.oracle ++ Dedup.oracle ++
      Similarity.oracle ++ Multimodal.oracle ++ EventsAnalytics.oracle ++
      SqlSurface.oracle ++ CdcQueries.oracle ++ Curation.oracle ++
      FuzzyMatch.oracle
}

package graft.llmdata

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The BPE trainer's corpus: the fixtures' FULL text surface.
  *
  * `documents.text` alone is a CLOSED 31-word vocabulary whose total
  * merge capacity is 89 merges (measured: the trainer exhausts — every
  * word becomes a single token), so a realistic-size merge table cannot
  * come from prose alone. The union of every VARCHAR column across the
  * fixture tables adds the ID/punctuation tail real corpora have —
  * entity names with digit runs (`Customer#000012345`), JSON props
  * (`{"k":`), order priorities (`1-URGENT`) — which keeps pair
  * statistics alive for thousands of ranks, exactly like GPT-2's digit
  * and punctuation merges.
  *
  * Keep [[Columns]] in sync with tools/train_bpe.py's COLUMNS list; the
  * LlmDataSpec trainer-parity test (Spark ≡ baked Python artifact at
  * N=2000) is the effective sync check.
  *
  * Scale posture: the word-frequency reduce is one scan per table +
  * one map-side-combined hash aggregate — the only data-scale-dependent
  * step of BPE training (SURVEY.md §2's tx28 posture).
  */
object BpeCorpus {

  /** Every VARCHAR column across the fixture tables. */
  val Columns: Seq[(String, String)] = Seq(
    ("customer", "c_name"), ("customer", "c_mktsegment"),
    ("documents", "text"), ("documents", "lang"), ("documents", "source"),
    ("events", "event_type"), ("events", "props"),
    ("lineitem", "l_returnflag"), ("lineitem", "l_linestatus"),
    ("nation", "n_name"), ("orders", "o_orderstatus"),
    ("orders", "o_orderpriority"),
    ("part", "p_name"), ("part", "p_brand"), ("part", "p_type"),
    ("region", "r_name"), ("supplier", "s_name"))

  /** Word → frequency over the union corpus (whitespace-split, empty
    * words dropped — the module's standard word rule). */
  def unionWordFreq(spark: SparkSession, dir: String): DataFrame =
    Columns.map { case (tbl, c) =>
      Tables.load(spark, dir, tbl)
        .select(col(c).as("s"))
        .filter(col("s").isNotNull)
    }.reduce(_.unionAll(_))
      .select(explode(split(col("s"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** BYTE-mode word → frequency over the union corpus: GPT-2-shaped
    * PRETOKENS (leading space attached, letters/digits/punctuation
    * split) instead of whitespace words, byte-mapped (space → Ġ;
    * non-printable-ASCII pretokens are opaque on the apply side and
    * therefore excluded from training). Twin of tools/train_bpe.py's
    * `bytes` mode; the byte-table parity spec is the sync check. */
  def unionByteWordFreq(spark: SparkSession, dir: String): DataFrame =
    Columns.map { case (tbl, c) =>
      Tables.load(spark, dir, tbl)
        .select(col(c).as("s"))
        .filter(col("s").isNotNull)
    }.reduce(_.unionAll(_))
      .select(explode(regexp_extract_all(col("s"),
        lit(graft.functions.BpeBytesUtil.PretokenRegex), lit(0))).as("w"))
      .filter(!col("w").rlike("[^ -~]"))
      .select(translate(col("w"), " ",
        String.valueOf(graft.functions.BpeBytesUtil.GDot)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** Word → frequency over `documents.text` only (tx28's corpus — the
    * 40-merge oracle twin trains on the same surface). */
  def documentsWordFreq(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
}

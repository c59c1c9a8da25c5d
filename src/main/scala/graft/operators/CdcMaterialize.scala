package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.CdcModel.ChangeType

/** Current-state materialization from a CDC change log — the downstream
  * half the reference leaves to the reader of its S3 JSON (SURVEY.md §1.4
  * "sink table"): compact a log of full-record changes + tombstones into
  * the latest row per (entity, Id).
  *
  * Ordering follows the CDC envelope's own clock: (commitNumber,
  * sequenceNumber, replayId) — the same total order Salesforce promises per
  * record. DELETE wins over any earlier change; a later CREATE (undelete
  * pattern) resurrects the row.
  *
  * Scale posture: one shuffle on (entityName, Id) shared by the ranking
  * window; this is the standard log-compaction job run per partition of a
  * 100 TB change lake (or continuously via foreachBatch MERGE into a table
  * format).
  */
object CdcMaterialize {

  /** `changes`: rows with entityName, Id, UIND (changeType), commitNumber,
    * sequenceNumber, replayId + the record payload columns. Returns the
    * live rows only (latest change per key, tombstoned keys dropped). */
  def latestState(changes: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("entityName"), col("Id"))
      .orderBy(col("commitNumber").desc, col("sequenceNumber").desc, col("replayId").desc)
    changes
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col("UIND") =!= ChangeType.Delete)
      .drop("_rn")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.{CdcModel, EntitySchemaRegistry}

/** Decode stage: raw transport record → typed change rows.
  *
  * Reference behavior reproduced (SURVEY.md §2.2/§2.3):
  *  - T1 base64 decode (`worker/lambda/app.py:51-54`) → `unbase64`
  *  - T2 JSON parse (`app.py:55`) → `from_json` with the fixed envelope
  *    struct; the dynamic entity body stays as raw JSON (schema-on-read)
  *  - T3 header projection (`app.py:57-62`) → nested-field select
  *  - D1 first-seen dedupe of recordIds within one event (`app.py:64-72`)
  *    → `array_distinct` (order-preserving first-seen, same semantics)
  *  - T5 explode to one row per changed id (`app.py:66-72`)
  *
  * All column-to-column (no UDFs): whole-stage codegen keeps this stage in
  * one pass over the scan, and it works identically in batch and streaming
  * (Spark's unified Dataset API).
  */
object CdcDecode {

  /** T1+T2: base64 transport payload → envelope columns + raw payload JSON.
    * Input: any DataFrame with a base64-encoded string column (the
    * `kinesis.data` shape). */
  def decodeBase64(raw: DataFrame, dataCol: Column): DataFrame =
    decodeJson(raw.withColumn("_json", unbase64(dataCol).cast(StringType)), col("_json"))
      .drop("_json")

  /** T2+T3: envelope JSON string → header projection. Keeps `payload_json`
    * (the full payload object, dynamic body included) for downstream
    * re-typing against the entity catalog. */
  def decodeJson(raw: DataFrame, jsonCol: Column): DataFrame = {
    val env = from_json(jsonCol, CdcModel.envelopeType)
    raw
      .withColumn("_env", env)
      .withColumn("payload_json", get_json_object(jsonCol, "$.payload"))
      .select(
        raw.columns.map(col).toIndexedSeq ++ Seq(
          col("_env.schema").as("schema_fingerprint"),
          col("_env.event.replayId").as("replayId"),
          col("_env.payload.ChangeEventHeader.entityName").as("entityName"),
          col("_env.payload.ChangeEventHeader.changeType").as("changeType"),
          timestamp_millis(col("_env.payload.ChangeEventHeader.commitTimestamp"))
            .as("commitTimestamp"),
          col("_env.payload.ChangeEventHeader.commitNumber").as("commitNumber"),
          col("_env.payload.ChangeEventHeader.sequenceNumber").as("sequenceNumber"),
          col("_env.payload.ChangeEventHeader.transactionKey").as("transactionKey"),
          col("_env.payload.ChangeEventHeader.changedFields").as("changedFields"),
          array_distinct(col("_env.payload.ChangeEventHeader.recordIds")).as("recordIds"),
          col("payload_json")): _*)
      .drop("_env")
  }

  /** D1+T5: one row per (deduped) changed record id. */
  def explodeIds(decoded: DataFrame): DataFrame =
    decoded.withColumn("Id", explode(col("recordIds"))).drop("recordIds")

  /** Dead-letter split: rows whose envelope failed to parse (no
    * entityName/changeType after from_json) go to a quarantine branch
    * instead of vanishing — the idiomatic upgrade of the reference's
    * swallow-and-log (quirk Q8, `KinesisExample.java:143-147`). Both
    * branches are filters over the same decode, so the scan is shared. */
  def partitionValid(decoded: DataFrame): (DataFrame, DataFrame) = {
    val bad = col("entityName").isNull || col("changeType").isNull ||
      col("recordIds").isNull
    (decoded.filter(!bad), decoded.filter(bad))
  }

  /** §1.3 catalog re-typing: parse the dynamic body with the entity's
    * registered schema (the cached `describe()` — fixes quirk Q5). Only
    * valid on a single-entity slice, like the reference's per-entity loop. */
  def typedBody(decoded: DataFrame, entity: String, registry: EntitySchemaRegistry): DataFrame =
    registry.get(entity) match {
      case Some(schema) =>
        decoded.filter(col("entityName") === entity)
          .withColumn("body", from_json(col("payload_json"), schema))
      case None =>
        decoded.filter(col("entityName") === entity)
          .withColumn("body", from_json(col("payload_json"), MapType(StringType, StringType)))
    }

  /** Schema-evolution-aware re-typing: events re-type with the schema
    * registered for THEIR fingerprint (falling back to the entity's current
    * schema), then union by name — new fields are null on old-schema rows.
    * This is what carrying the wire fingerprint (ignored by the reference)
    * buys: an in-flight mix of schema versions decodes losslessly. */
  def typedBodyEvolving(
      decoded: DataFrame, entity: String, registry: EntitySchemaRegistry): DataFrame = {
    val slice = decoded.filter(col("entityName") === entity)
    val fps = registry.fingerprints(entity)
    if (fps.isEmpty) typedBody(decoded, entity, registry)
    else {
      val known = fps.map { fp =>
        val schema = registry.get(entity, fp).get
        slice.filter(col("schema_fingerprint") === fp)
          .withColumn("body", from_json(col("payload_json"), schema))
      }
      val rest = slice.filter(!col("schema_fingerprint").isin(fps: _*))
        .withColumn("body", from_json(col("payload_json"),
          registry.get(entity).getOrElse(MapType(StringType, StringType))))
      (known :+ rest).reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
    }
  }
}

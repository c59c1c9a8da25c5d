package graft.model

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.types._

/** Data model of the CDC event envelope.
  *
  * Mirrors the reference's event shape (decoded fixture
  * `/root/reference/worker/events/event.json:8`; field accesses
  * `worker/lambda/app.py:57-62`, `subscriber/.../ReplayExtension.java:77-82`):
  * a nested JSON envelope `{schema, payload:{ChangeEventHeader, <entity
  * fields...>}, event:{replayId}}`. The envelope and header are fixed
  * structs; the entity body is dynamic (schema-on-read, SURVEY.md §1.3) and
  * is carried as raw JSON until re-typed against [[EntitySchemaRegistry]].
  */
object CdcModel {

  /** `payload.ChangeEventHeader` — fixed across all entities. */
  val headerType: StructType = StructType(Seq(
    StructField("commitNumber", LongType),
    StructField("commitUser", StringType),
    StructField("sequenceNumber", IntegerType),
    StructField("entityName", StringType),
    StructField("changeType", StringType),
    StructField("changedFields", ArrayType(StringType)),
    StructField("changeOrigin", StringType),
    StructField("transactionKey", StringType),
    StructField("commitTimestamp", LongType),
    StructField("recordIds", ArrayType(StringType))))

  /** The fixed part of the envelope. Unknown payload fields (the entity
    * body) are simply not bound here — `from_json` ignores them; the body
    * travels separately as raw JSON (see CdcDecode.payloadJson). */
  val envelopeType: StructType = StructType(Seq(
    StructField("schema", StringType),
    StructField("payload", StructType(Seq(
      StructField("ChangeEventHeader", headerType)))),
    StructField("event", StructType(Seq(
      StructField("replayId", LongType))))))

  /** Change types observed in the reference (`README.md:13-14`; the code
    * passes them through verbatim — quirk Q2 in SURVEY.md §2.9). */
  object ChangeType {
    val Create = "CREATE"
    val Update = "UPDATE"
    val Delete = "DELETE"
    val Undelete = "UNDELETE"
  }

  /** Replay sentinels (`EmpConnector.java:103-104`): map onto Structured
    * Streaming `startingOffsets`. */
  val ReplayFromEarliest: Long = -2L
  val ReplayFromTip: Long = -1L
}

/** Per-entity schema catalog — the Spark-side equivalent of the reference's
  * `describe()` metadata call (`worker/lambda/app.py:115-118`), with the
  * caching the reference lacks (quirk Q5: it re-fetched per batch).
  *
  * Schema EVOLUTION: the wire envelope carries a schema fingerprint
  * (`"schema": "8_j4..."` — SURVEY.md §1.3) that the reference ignores;
  * here a schema may additionally be registered per (entity, fingerprint),
  * so in-flight events from before a field was added re-type with the
  * schema they were written with. Lookup falls back fingerprint → entity.
  * Thread-safe; consulted by the decode stage.
  */
final class EntitySchemaRegistry {
  private val schemas = TrieMap.empty[String, StructType]
  private val byFingerprint = TrieMap.empty[(String, String), StructType]

  def register(entity: String, schema: StructType): Unit = schemas.put(entity, schema)
  def register(entity: String, fingerprint: String, schema: StructType): Unit =
    byFingerprint.put((entity, fingerprint), schema)

  def get(entity: String): Option[StructType] = schemas.get(entity)
  def get(entity: String, fingerprint: String): Option[StructType] =
    byFingerprint.get((entity, fingerprint)).orElse(schemas.get(entity))

  def fields(entity: String): Seq[String] =
    schemas.get(entity).map(_.fieldNames.toSeq).getOrElse(Seq.empty)
  def entities: Seq[String] = schemas.keys.toSeq.sorted
  def fingerprints(entity: String): Seq[String] =
    byFingerprint.keys.collect { case (e, f) if e == entity => f }.toSeq.sorted
}

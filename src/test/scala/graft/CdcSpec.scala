package graft

import java.nio.charset.StandardCharsets
import java.util.Base64

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{CdcDecode, CdcEnrich}
import graft.streaming.CdcPipeline

/** Per-operator + end-to-end specs for the CDC pipeline, covering the
  * reference semantics catalogued in SURVEY.md §2 (T1-T9, D1, J1) including
  * the quirk decisions Q1 (clean tombstone ids), Q2 (UIND = changeType
  * verbatim), Q6 (dedupe scope = one event only). */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  /** Synthesized envelope in the reference's wire shape (same schema as the
    * decoded fixture at reference worker/events/event.json:8). */
  def envelope(replayId: Long, entity: String, changeType: String,
      ids: Seq[String], body: String = "\"Name\":\"Acme\","): String = {
    val idList = ids.map(i => "\"" + i + "\"").mkString(",")
    s"""{"schema":"fp_1","payload":{$body"ChangeEventHeader":{""" +
      s""""commitNumber":109179514333,"commitUser":"005xx","sequenceNumber":1,""" +
      s""""entityName":"$entity","changeType":"$changeType","changedFields":[],""" +
      s""""changeOrigin":"com/test","transactionKey":"tk-$replayId",""" +
      s""""commitTimestamp":1583300894000,"recordIds":[$idList]}},""" +
      s""""event":{"replayId":$replayId}}"""
  }

  def b64(s: String): String =
    Base64.getEncoder.encodeToString(s.getBytes(StandardCharsets.UTF_8))

  lazy val snapshot =
    Seq(("001A", "Alice Corp", 10.5), ("001B", "Bob Ltd", 20.0), ("001C", "Cy Inc", 7.25))
      .toDF("Id", "Name", "Balance")

  test("T1+T2+T3: base64 decode, envelope parse, header projection") {
    val raw = Seq(b64(envelope(381, "Account", "CREATE", Seq("001A")))).toDF("data")
    val d = CdcDecode.decodeBase64(raw, col("data")).collect().head
    assert(d.getAs[String]("entityName") == "Account")
    assert(d.getAs[String]("changeType") == "CREATE")
    assert(d.getAs[Long]("replayId") == 381L)
    assert(d.getAs[String]("schema_fingerprint") == "fp_1")
    assert(d.getAs[java.sql.Timestamp]("commitTimestamp").getTime == 1583300894000L)
    assert(d.getAs[scala.collection.Seq[String]]("recordIds").toSeq == Seq("001A"))
    assert(d.getAs[String]("payload_json").contains("\"Name\":\"Acme\""))
  }

  test("D1: recordIds dedupe is first-seen order-preserving, per event (Q6)") {
    val raw = Seq(
      envelope(1, "Account", "UPDATE", Seq("001B", "001A", "001B", "001A")),
      envelope(2, "Account", "UPDATE", Seq("001A"))).toDF("value")
    val decoded = CdcDecode.decodeJson(raw, col("value"))
    val perEvent = decoded.select("replayId", "recordIds").as[(Long, Seq[String])]
      .collect().toMap
    assert(perEvent(1L) == Seq("001B", "001A")) // first-seen order
    // Q6: cross-event duplicates are NOT deduped — replay 2 still carries 001A
    assert(perEvent(2L) == Seq("001A"))
    assert(CdcDecode.explodeIds(decoded).count() == 3)
  }

  test("T7+T9+J1: routing, tombstone shape (Q1 clean id), inner-join drop") {
    val raw = Seq(
      envelope(1, "Account", "CREATE", Seq("001A")),
      envelope(2, "Account", "UPDATE", Seq("001B", "001MISSING")),
      envelope(3, "Account", "DELETE", Seq("001C"))).toDF("value")
    val changes = CdcDecode.explodeIds(CdcDecode.decodeJson(raw, col("value")))
    val out = CdcEnrich(changes, snapshot)

    val rows = out.collect()
    assert(rows.length == 3) // 001MISSING silently dropped (inner-join semantics)

    val byId = rows.map(r => r.getAs[String]("Id") -> r).toMap
    // Q2: UIND passes changeType through verbatim — CREATE stays CREATE
    assert(byId("001A").getAs[String]("UIND") == "CREATE")
    assert(byId("001A").getAs[String]("Name") == "Alice Corp")
    assert(byId("001B").getAs[String]("UIND") == "UPDATE")
    assert(byId("001B").getAs[Double]("Balance") == 20.0)
    // tombstone: clean id (Q1), null snapshot fields, attributes.type set
    val tomb = byId("001C")
    assert(tomb.getAs[String]("UIND") == "DELETE")
    assert(tomb.getAs[org.apache.spark.sql.Row]("attributes").getAs[String]("type") == "Account")
    assert(tomb.isNullAt(tomb.fieldIndex("Name")))
  }

  test("GAP events route to enrichment — the full-record re-fetch IS gap recovery") {
    // Salesforce emits GAP_CREATE/GAP_UPDATE/GAP_DELETE/GAP_UNDELETE/
    // GAP_OVERFLOW when it cannot deliver change payloads; the envelope
    // carries recordIds but no field values. The reference routes on
    // `changeType == 'DELETE'` exactly (worker/lambda/app.py:77), so every
    // GAP_* variant — including GAP_DELETE — falls into the enrichment
    // branch and re-queries the CURRENT full record, which is precisely
    // the documented consumer recovery for gap events (re-sync the record;
    // a hard-deleted GAP_DELETE id drops via inner-join semantics, same as
    // a missing id). UIND carries the raw GAP_* marker through (Q2).
    val raw = Seq(
      envelope(1, "Account", "GAP_UPDATE", Seq("001A")),
      envelope(2, "Account", "GAP_CREATE", Seq("001B")),
      envelope(3, "Account", "GAP_DELETE", Seq("001C")),
      envelope(4, "Account", "GAP_DELETE", Seq("001GONE"))).toDF("value")
    val changes = CdcDecode.explodeIds(CdcDecode.decodeJson(raw, col("value")))
    val out = CdcEnrich(changes, snapshot).collect()
    assert(out.length == 3) // 001GONE hard-deleted -> dropped, not tombstoned
    val byId = out.map(r => r.getAs[String]("Id") -> r).toMap
    assert(byId("001A").getAs[String]("UIND") == "GAP_UPDATE")
    assert(byId("001A").getAs[String]("Name") == "Alice Corp") // full re-fetch
    assert(byId("001B").getAs[String]("UIND") == "GAP_CREATE")
    assert(byId("001C").getAs[String]("UIND") == "GAP_DELETE")
    assert(!byId("001C").isNullAt(byId("001C").fieldIndex("Name")),
      "GAP_DELETE re-fetches state; only literal DELETE tombstones")
  }

  test("J1 is point-in-time: enrichment sees CURRENT snapshot state, not as-of") {
    // two updates to the same id: both emit the (single) current state
    val raw = Seq(
      envelope(1, "Account", "UPDATE", Seq("001A")),
      envelope(2, "Account", "UPDATE", Seq("001A"))).toDF("value")
    val changes = CdcDecode.explodeIds(CdcDecode.decodeJson(raw, col("value")))
    val names = CdcEnrich(changes, snapshot).select("Name").as[String].collect()
    assert(names.toSeq == Seq("Alice Corp", "Alice Corp"))
  }

  test("end-to-end streaming: MemoryStream → decode → route/enrich → sink rows") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val routed = CdcPipeline.transform(stream.toDF(), snapshot)
    val q = CdcPipeline.toJsonLines(routed)
      .writeStream.format("memory").queryName("cdc_out").outputMode("append").start()
    try {
      stream.addData(
        envelope(1, "Account", "CREATE", Seq("001A")),
        envelope(2, "Account", "DELETE", Seq("001B")))
      q.processAllAvailable()
      val batch1 = spark.table("cdc_out").collect()
      assert(batch1.length == 2)
      val vals = batch1.map(_.getAs[String]("value")).sorted
      assert(vals.exists(v => v.contains("\"UIND\":\"CREATE\"") && v.contains("Alice Corp")))
      assert(vals.exists(v => v.contains("\"UIND\":\"DELETE\"") && v.contains("\"Id\":\"001B\"")))
      assert(batch1.forall(_.getAs[String]("entityName") == "Account"))

      // incremental micro-batch: only new offsets processed
      stream.addData(envelope(3, "Account", "UPDATE", Seq("001C")))
      q.processAllAvailable()
      assert(spark.table("cdc_out").count() == 3)
    } finally q.stop()
  }

  test("multiEntity: one micro-batch mixing entities routes each to its snapshot (Q7)") {
    val accounts = Seq(("001A", "Alice Corp", 10.5)).toDF("Id", "Name", "Balance")
    val contacts = Seq(("003X", "carol@x.io")).toDF("Id", "Email")
    val raw = Seq(
      envelope(1, "Account", "UPDATE", Seq("001A")),
      envelope(2, "Contact", "UPDATE", Seq("003X")),
      envelope(3, "Case", "DELETE", Seq("500Z"))).toDF("value")
    val changes = CdcDecode.explodeIds(CdcDecode.decodeJson(raw, col("value")))
    val out = CdcEnrich.multiEntity(changes,
      Map("Account" -> accounts, "Contact" -> contacts))
    val rows = out.collect().map(r =>
      r.getAs[org.apache.spark.sql.Row]("attributes").getAs[String]("type") -> r).toMap
    assert(rows.size == 3)
    assert(rows("Account").getAs[String]("Name") == "Alice Corp")
    assert(rows("Contact").getAs[String]("Email") == "carol@x.io")
    assert(rows("Contact").isNullAt(rows("Contact").fieldIndex("Name"))) // schema union
    assert(rows("Case").getAs[String]("UIND") == "DELETE") // unregistered entity tombstone
    assert(rows("Case").getAs[String]("Id") == "500Z")
  }

  test("materialize: change log compacts to latest state; DELETE tombstones drop rows") {
    import graft.operators.CdcMaterialize
    val log = Seq(
      // (entity, id, uind, commitNumber, seq, replay, name)
      ("Account", "001A", "CREATE", 10L, 1, 1L, "v1"),
      ("Account", "001A", "UPDATE", 20L, 1, 2L, "v2"),
      ("Account", "001B", "CREATE", 10L, 1, 3L, "b1"),
      ("Account", "001B", "DELETE", 30L, 1, 4L, null),
      ("Account", "001C", "CREATE", 10L, 1, 5L, "c1"),
      ("Account", "001C", "DELETE", 20L, 1, 6L, null),
      ("Account", "001C", "CREATE", 30L, 1, 7L, "c2"), // undelete pattern
      ("Contact", "001A", "CREATE", 5L, 1, 8L, "contact-a")) // same Id, other entity
      .toDF("entityName", "Id", "UIND", "commitNumber", "sequenceNumber", "replayId", "Name")
    val state = CdcMaterialize.latestState(log)
      .select("entityName", "Id", "Name").as[(String, String, String)]
      .collect().toSet
    assert(state == Set(
      ("Account", "001A", "v2"), // latest update wins
      ("Account", "001C", "c2"), // resurrection after delete
      ("Contact", "001A", "contact-a"))) // keys are (entity, Id)
    // 001B stays deleted
  }

  test("scd2: versions chain on the envelope clock; tombstones close without opening") {
    import graft.operators.CdcMaterialize
    val log = Seq(
      // arrival order is deliberately NOT clock order (the v2 row arrives first)
      ("Account", "001A", "UPDATE", 20L, 1, 2L, 2000L, "v2"),
      ("Account", "001A", "CREATE", 10L, 1, 1L, 1000L, "v1"),
      ("Account", "001B", "CREATE", 10L, 1, 3L, 1000L, "b1"),
      ("Account", "001B", "DELETE", 30L, 1, 4L, 3000L, null),
      ("Contact", "001A", "CREATE", 5L, 1, 8L, 500L, "contact-a"))
      .toDF("entityName", "Id", "UIND", "commitNumber", "sequenceNumber",
        "replayId", "commitTimestamp", "Name")
    val hist = CdcMaterialize.scd2History(log).collect()
      .map(r => (r.getAs[String]("entityName"), r.getAs[String]("Id"),
        r.getAs[String]("Name")) ->
        (r.getAs[Long]("valid_from"), Option(r.getAs[Any]("valid_to")),
          r.getAs[Boolean]("is_current"))).toMap
    assert(hist.size == 4) // the DELETE row opens no version
    // v1 closed by v2's timestamp despite v2 arriving first
    assert(hist(("Account", "001A", "v1")) == ((1000L, Some(2000L), false)))
    assert(hist(("Account", "001A", "v2")) == ((2000L, None, true)))
    // tombstone closes b1 and leaves 001B with NO current version
    assert(hist(("Account", "001B", "b1")) == ((1000L, Some(3000L), false)))
    assert(hist(("Contact", "001A", "contact-a")) == ((500L, None, true)))
    // interval chaining: within a key, valid_to == next version's valid_from
    // and exactly one current version per live key (checked above by shape)
  }

  test("materialize: idempotent under redelivery and insensitive to arrival order") {
    import graft.operators.CdcMaterialize
    val log = Seq(
      ("Account", "001A", "CREATE", 10L, 1, 1L, "v1"),
      ("Account", "001A", "UPDATE", 20L, 1, 2L, "v2"),
      ("Account", "001B", "CREATE", 10L, 1, 3L, "b1"),
      ("Account", "001B", "DELETE", 30L, 1, 4L, null))
      .toDF("entityName", "Id", "UIND", "commitNumber", "sequenceNumber", "replayId", "Name")
    val once = CdcMaterialize.latestState(log).collect().toSet
    // at-least-once transport: the whole log redelivered is a no-op
    val redelivered = CdcMaterialize.latestState(log.union(log)).collect().toSet
    assert(redelivered == once)
    // compaction ranks by the envelope clock, not arrival order
    val shuffled = CdcMaterialize.latestState(log.orderBy(rand(42))).collect().toSet
    assert(shuffled == once)
  }

  test("scd2 streaming: foreachBatch merge splices late changes; equals batch recompute") {
    import graft.operators.CdcMaterialize
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[(String, String, String, Long, Int, Long, Long, String)]
    val stateDir = java.nio.file.Files.createTempDirectory("scd2_state").toString + "/hist"
    val cols = Seq("entityName", "Id", "UIND", "commitNumber", "sequenceNumber",
      "replayId", "commitTimestamp", "Name")
    val b1 = Seq(
      ("Account", "001A", "CREATE", 10L, 1, 1L, 1000L, "a1"),
      ("Account", "001B", "CREATE", 10L, 1, 2L, 1000L, "b1"))
    val b2 = Seq(
      ("Account", "001A", "UPDATE", 30L, 1, 3L, 3000L, "a3"),
      ("Account", "001B", "DELETE", 20L, 1, 4L, 2000L, null))
    val b3 = Seq(
      // late change splicing BETWEEN A's existing versions
      ("Account", "001A", "UPDATE", 20L, 1, 5L, 2000L, "a2"),
      // late change OLDER than B's delete: must close at the delete, not resurrect
      ("Account", "001B", "UPDATE", 15L, 1, 6L, 1500L, "b2"))
    val q = stream.toDF().toDF(cols: _*)
      .writeStream.foreachBatch(CdcMaterialize.foreachBatchScd2(stateDir) _)
      .outputMode("append").start()
    try {
      Seq(b1, b2, b3).foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    import spark.implicits._
    // foreachBatch is at-least-once: re-applying the last batch (the
    // restart-after-uncommitted-batch case) must be a no-op
    CdcMaterialize.foreachBatchScd2(stateDir)(b3.toDF(cols: _*), 99L)
    val streamed = spark.read.parquet(stateDir)
      .filter($"UIND" =!= "DELETE")
      .select("Id", "Name", "valid_from", "valid_to", "is_current")
      .as[(String, String, Long, Option[Long], Boolean)].collect().toSet
    val batch = graft.operators.CdcMaterialize.scd2History(
      (b1 ++ b2 ++ b3).toDF(cols: _*))
      .select("Id", "Name", "valid_from", "valid_to", "is_current")
      .as[(String, String, Long, Option[Long], Boolean)].collect().toSet
    assert(streamed == batch, "streaming merge must equal batch recompute")
    assert(streamed == Set(
      ("001A", "a1", 1000L, Some(2000L), false),
      ("001A", "a2", 2000L, Some(3000L), false), // spliced in
      ("001A", "a3", 3000L, None, true),
      ("001B", "b1", 1000L, Some(1500L), false),
      ("001B", "b2", 1500L, Some(2000L), false))) // closed by the delete
    // B has no current version: the tombstone marker kept it closed
    assert(!streamed.exists(r => r._1 == "001B" && r._5))
  }

  test("scd2 streaming: an interrupted state swap is recovered from staging") {
    import graft.operators.CdcMaterialize
    val cols = Seq("entityName", "Id", "UIND", "commitNumber", "sequenceNumber",
      "replayId", "commitTimestamp", "Name")
    val b1 = Seq(("Account", "001A", "CREATE", 10L, 1, 1L, 1000L, "a1"))
    val b2 = Seq(("Account", "001A", "UPDATE", 20L, 1, 2L, 2000L, "a2"))
    val b3 = Seq(("Account", "001B", "CREATE", 10L, 1, 3L, 1000L, "b1"))
    val stateDir = java.nio.file.Files.createTempDirectory("scd2_crash").toString + "/hist"
    CdcMaterialize.foreachBatchScd2(stateDir)(b1.toDF(cols: _*), 0L)
    CdcMaterialize.foreachBatchScd2(stateDir)(b2.toDF(cols: _*), 1L)
    // simulate the crash window of batch 2's swap: the old state dir was
    // deleted, the fully-written staging dir was never renamed into place
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(stateDir),
      new org.apache.hadoop.fs.Path(s"$stateDir.staging-2")))
    CdcMaterialize.foreachBatchScd2(stateDir)(b3.toDF(cols: _*), 3L)
    val streamed = spark.read.parquet(stateDir)
      .select("Id", "Name", "valid_from", "valid_to", "is_current")
      .as[(String, String, Long, Option[Long], Boolean)].collect().toSet
    // pre-crash history survived: a1 closed by a2, a2 current, b1 current
    assert(streamed == Set(
      ("001A", "a1", 1000L, Some(2000L), false),
      ("001A", "a2", 2000L, None, true),
      ("001B", "b1", 1000L, None, true)))
  }

  test("materialize streaming: foreachBatch upsert maintains state across batches") {
    import graft.operators.CdcMaterialize
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[(String, String, String, Long, Int, Long, String)]
    val stateDir = java.nio.file.Files.createTempDirectory("cdc_state").toString + "/state"
    val cols = Seq("entityName", "Id", "UIND", "commitNumber", "sequenceNumber", "replayId", "Name")
    val q = stream.toDF().toDF(cols: _*)
      .writeStream.foreachBatch(CdcMaterialize.foreachBatchUpsert(stateDir) _)
      .outputMode("append").start()
    try {
      stream.addData(("Account", "001A", "CREATE", 10L, 1, 1L, "v1"),
        ("Account", "001B", "CREATE", 10L, 1, 2L, "b1"))
      q.processAllAvailable()
      stream.addData(("Account", "001A", "UPDATE", 20L, 1, 3L, "v2"),
        ("Account", "001B", "DELETE", 20L, 1, 4L, null),
        // late change OLDER than 001B's delete must NOT resurrect it
        ("Account", "001B", "UPDATE", 15L, 1, 5L, "late"))
      q.processAllAvailable()
      val live = spark.read.parquet(stateDir)
        .filter($"UIND" =!= "DELETE")
        .select("Id", "Name").as[(String, String)].collect().toSet
      assert(live == Set(("001A", "v2")))
    } finally q.stop()
  }

  test("cdc10: continuity audit counts gap runs, missing totals, and ranges exactly") {
    val delivered = Seq(
      ("Account", 1L), ("Account", 2L), ("Account", 5L), ("Account", 9L),
      ("Contact", 100L)).toDF("entity_name", "replay_id")
    val rows = graft.operators.CdcQueries.replayContinuityAudit(delivered)
      .collect().map(r => r.getAs[String]("entity_name") -> r).toMap
    val acc = rows("Account")
    // Account: 3-4 missing (one run of 2) and 6-8 missing (one run of 3)
    assert(acc.getAs[Long]("n_delivered") == 4L)
    assert(acc.getAs[Long]("first_replay_id") == 1L)
    assert(acc.getAs[Long]("last_replay_id") == 9L)
    assert(acc.getAs[Long]("n_gaps") == 2L)
    assert(acc.getAs[Long]("missing_total") == 5L)
    assert(acc.getAs[Long]("max_gap") == 3L)
    // a single delivered event is a trivially continuous stream
    val con = rows("Contact")
    assert(con.getAs[Long]("n_gaps") == 0L)
    assert(con.getAs[Long]("missing_total") == 0L)
    assert(con.getAs[Long]("max_gap") == 0L)
  }

  test("partitionValid: malformed envelopes quarantine instead of vanishing (Q8 upgrade)") {
    val raw = Seq(
      envelope(1, "Account", "CREATE", Seq("001A")),
      """{"this is": "not a cdc envelope"}""",
      """not even json""").toDF("value")
    val decoded = CdcDecode.decodeJson(raw, col("value"))
    val (valid, quarantined) = CdcDecode.partitionValid(decoded)
    assert(valid.count() == 1)
    assert(quarantined.count() == 2)
    // quarantined rows keep the raw value for offline inspection/replay
    assert(quarantined.select("value").as[String].collect().forall(_.nonEmpty))
  }

  test("typedBodyEvolving: fingerprint-keyed schemas decode a mixed-version stream") {
    import org.apache.spark.sql.types._
    val reg = new graft.model.EntitySchemaRegistry
    reg.register("Account", "fp_v1", StructType(Seq(StructField("Name", StringType))))
    reg.register("Account", "fp_v2", StructType(Seq(
      StructField("Name", StringType), StructField("Tier", StringType))))
    reg.register("Account", StructType(Seq( // current schema, for unknown fps
      StructField("Name", StringType), StructField("Tier", StringType))))
    def env(fp: String, body: String, id: Long) =
      s"""{"schema":"$fp","payload":{$body"ChangeEventHeader":{"commitNumber":1,""" +
        s""""commitUser":"u","sequenceNumber":1,"entityName":"Account","changeType":"UPDATE",""" +
        s""""changedFields":[],"changeOrigin":"t","transactionKey":"tk",""" +
        s""""commitTimestamp":1583300894000,"recordIds":["001A"]}},"event":{"replayId":$id}}"""
    val raw = Seq(
      env("fp_v1", "\"Name\":\"Old\",", 1),
      env("fp_v2", "\"Name\":\"New\",\"Tier\":\"gold\",", 2),
      env("fp_v3", "\"Name\":\"Unknown\",\"Tier\":\"silver\",", 3)).toDF("value")
    val typed = CdcDecode.typedBodyEvolving(
      CdcDecode.decodeJson(raw, col("value")), "Account", reg)
      .select($"replayId", $"body.Name", $"body.Tier").as[(Long, String, String)]
      .collect().sortBy(_._1)
    assert(typed.toSeq == Seq(
      (1L, "Old", null), // v1 schema has no Tier → null, not an error
      (2L, "New", "gold"),
      (3L, "Unknown", "silver"))) // unknown fp → current entity schema
  }

  test("typedBody: catalog re-typing of the dynamic payload (§1.3)") {
    import org.apache.spark.sql.types._
    val reg = new graft.model.EntitySchemaRegistry
    reg.register("Account", StructType(Seq(StructField("Name", StringType))))
    val raw = Seq(envelope(1, "Account", "CREATE", Seq("001A"))).toDF("value")
    val d = CdcDecode.typedBody(CdcDecode.decodeJson(raw, col("value")), "Account", reg)
    assert(d.select("body.Name").as[String].collect().head == "Acme")
  }

  test("snapshot diff: classification, changed-field list, null transitions") {
    import graft.operators.SnapshotDiff
    val old = Seq(
      ("k1", Option("a"), Option(1.0)),   // unchanged -> no event
      ("k2", Option("b"), Option(2.0)),   // value change -> UPDATE(bal)
      ("k3", Option("c"), Option(3.0)),   // gone -> DELETE
      ("k4", None: Option[String], Option(4.0)), // null -> value = change
      ("k5", Option("e"), Option(5.0))    // value -> null = change
    ).toDF("id", "name", "bal")
    val nu = Seq(
      ("k1", Option("a"), Option(1.0)),
      ("k2", Option("b"), Option(2.5)),
      ("k4", Option("d"), Option(4.0)),
      ("k5", Option("e"), None: Option[Double]),
      ("k6", Option("f"), Option(6.0))    // new -> CREATE
    ).toDF("id", "name", "bal")
    val got = SnapshotDiff.diff(old, nu, "id", Seq("name", "bal"))
      .select("id", "change_type", "changed_fields")
      .as[(String, String, String)].collect()
      .map { case (k, ct, cf) => k -> ((ct, cf)) }.toMap
    assert(!got.contains("k1"), "unchanged row must emit nothing")
    assert(got("k2") == (("UPDATE", "bal")))
    assert(got("k3") == (("DELETE", "")))
    assert(got("k4") == (("UPDATE", "name")), "null -> value must register")
    assert(got("k5") == (("UPDATE", "bal")), "value -> null must register")
    assert(got("k6") == (("CREATE", "")))
    // both fields changed -> sorted comma-joined list
    val both = SnapshotDiff.diff(
      Seq(("x", "p", 1.0)).toDF("id", "name", "bal"),
      Seq(("x", "q", 9.0)).toDF("id", "name", "bal"),
      "id", Seq("name", "bal"))
    assert(both.select("changed_fields").as[String].collect().head == "bal,name")
  }

  test("snapshot diff round trip: applying the events to v1 reproduces v2") {
    // the defining invariant of CDC generation — the emitted events must
    // carry EXACTLY the information separating the snapshots (cdc14's
    // oracle pins values; this pins completeness)
    import graft.operators.CdcQueries
    val dir = sf()
    val events = CdcQueries.snapshotDiffEvents(spark, dir)
      .select("record_id", "change_type", "new_c_name", "new_c_acctbal",
        "new_c_mktsegment")
      .as[(String, String, Option[String], Option[Double], Option[String])]
      .collect()
    val v1 = spark.read.parquet(s"$dir/customer.parquet")
      .selectExpr("concat('001', CAST(c_custkey AS STRING)) AS id",
        "c_name", "c_acctbal", "c_mktsegment")
      .as[(String, String, Double, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val deletes = events.filter(_._2 == "DELETE").map(_._1).toSet
    val upserts = events.filter(e => e._2 == "CREATE" || e._2 == "UPDATE")
      .map(e => e._1 -> ((e._3.get, e._4.get, e._5.get))).toMap
    val applied = (v1 -- deletes) ++ upserts
    // v2 rebuilt independently, mirroring the fixture mutation
    val v2 = spark.read.parquet(s"$dir/customer.parquet")
      .selectExpr("c_custkey AS k", "c_name", "c_acctbal", "c_mktsegment")
      .as[(Long, String, Double, String)].collect()
      .filter(_._1 % 7 != 0)
      .map { case (k, n, b, s) =>
        s"001$k" -> ((if (k % 3 == 0) s"$n-r" else n,
          if (k % 3 == 0) b + 10.25 else b,
          if (k % 5 == 0) "MACHINERY" else s)) }.toMap ++
      spark.read.parquet(s"$dir/supplier.parquet")
        .selectExpr("s_suppkey AS k", "s_acctbal")
        .as[(Long, Double)].collect()
        .map { case (k, b) => s"009$k" -> ((s"Acct-$k", b, "BUILDING")) }.toMap
    assert(applied == v2, "diff-apply must reproduce the new snapshot exactly")
  }
}

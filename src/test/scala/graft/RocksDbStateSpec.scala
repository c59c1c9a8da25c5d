package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.ReplayBus
import graft.streaming.EventStreamOps

/** The streaming tier's state at 100 TB: the default HDFS-backed state
  * store holds every key in executor HEAP — fine for the reference's tiny
  * replay-offset map, a lie-in-waiting for our upgrades (stream-stream
  * join buffers, dedupe key sets, sessionization state). RocksDB spills
  * state to local disk with an in-heap write buffer, which is the
  * provider a real deployment runs. These specs pin that the SAME
  * operators produce IDENTICAL results under
  * `RocksDBStateStoreProvider`, and that RocksDB state survives a
  * restart — so flipping the one config at deployment time is
  * semantics-free. */
class RocksDbStateSpec extends SparkSpec {
  import spark.implicits._

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  /** Runs `body` with the session-level state-store provider set; the
    * provider is captured into each query's checkpoint at start, so
    * setting it around query START is sufficient and the reset cannot
    * affect running queries. */
  private def withProvider[A](provider: String)(body: => A): A = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, provider)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  test("attribution join under RocksDB matches the batch twin (and really ran RocksDB)") {
    import org.apache.spark.sql.types._
    val dir = sf()
    val rawSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampNTZType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val staged = Files.createTempDirectory("rocks_join_src")
    Files.createSymbolicLink(
      staged.resolve("events.parquet"), java.nio.file.Paths.get(s"$dir/events.parquet"))
    def side(tpe: String) = spark.readStream.schema(rawSchema)
      .parquet(staged.toString)
      .withColumn("ts", col("ts").cast("timestamp"))
      .filter($"event_type" === tpe)
    val streamed = withProvider(RocksDb) {
      val q = EventStreamOps.attributionJoin(side("click"), side("purchase"))
        .writeStream.format("memory").queryName("rocks_join")
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // the join must have buffered in ROCKSDB state, not the default
      // in-memory map — the provider surfaces its own custom metrics
      val stateOps = q.recentProgress.flatMap(_.stateOperators)
      assert(stateOps.exists(s => s.operatorName.contains("symmetricHashJoin") &&
        s.numRowsTotal > 0), "expected symmetricHashJoin state")
      import scala.jdk.CollectionConverters._
      val metricKeys = stateOps.flatMap(_.customMetrics.keySet().asScala)
      assert(metricKeys.exists(_.toLowerCase.contains("rocksdb")),
        s"state metrics carry no rocksdb counters: ${metricKeys.distinct.toSeq}")
      spark.table("rocks_join")
        .select($"purchase_id", $"click_id").as[(Long, Long)].collect().toSet
    }
    val ev = graft.sources.Tables.load(spark, dir, "events")
    val c = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id".as("c_user"), $"ts".as("c_ts"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id".as("p_user"), $"ts".as("p_ts"))
    val batchPairs = p.join(c,
        $"p_user" === $"c_user" && $"c_ts" <= $"p_ts" &&
          $"c_ts" >= $"p_ts" - expr("INTERVAL 3600 SECONDS"))
      .select($"purchase_id", $"click_id").as[(Long, Long)].collect().toSet
    assert(streamed == batchPairs)
    assert(batchPairs.nonEmpty)
  }

  test("dedupeRedeliveries state survives a restart under BOTH providers") {
    // a replayId seen before the restart and redelivered after it must
    // stay suppressed — that requires the dedupe key set to come back
    // from the checkpointed state store, whichever provider owns it
    val hdfsDefault =
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
    for (provider <- Seq(hdfsDefault, RocksDb)) {
      val topic = s"t_rocks_dedup_${provider.hashCode.abs}"
      ReplayBus.clear(topic)
      def env(id: Long): String =
        s"""{"schema":"fp","payload":{"ChangeEventHeader":{"commitNumber":1,""" +
          s""""commitUser":"u","sequenceNumber":1,"entityName":"Account",""" +
          s""""changeType":"UPDATE","changedFields":[],"changeOrigin":"t",""" +
          s""""transactionKey":"tk","commitTimestamp":${1583300894000L + id},""" +
          s""""recordIds":["001A"]}},"event":{"replayId":$id}}"""
      val out = Files.createTempDirectory("rocks_dedup_out").toString
      val ckpt = Files.createTempDirectory("rocks_dedup_ckpt").toString
      def runOnce(): Unit = withProvider(provider) {
        val raw = spark.readStream.format("cdc-replay")
          .option("topic", topic).option("replayFrom", "-2").load()
        // the source itself exposes a replayId offset column; keep only
        // the envelope text so the decoded replayId is unambiguous
        val decoded = graft.operators.CdcDecode.decodeJson(
          raw.select(col("value")), col("value"))
        val q = graft.streaming.CdcPipeline.dedupeRedeliveries(decoded)
          .select(col("replayId"))
          .writeStream.format("json").option("path", out)
          .option("checkpointLocation", ckpt)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      ReplayBus.publish(topic, env(1))
      ReplayBus.publish(topic, env(1)) // in-batch redelivery
      ReplayBus.publish(topic, env(2))
      runOnce()
      ReplayBus.publish(topic, env(2)) // CROSS-RESTART redelivery
      ReplayBus.publish(topic, env(3))
      runOnce()
      val ids = spark.read.json(out).select("replayId").as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L),
        s"provider $provider: expected each replayId once, got $ids")
      ReplayBus.clear(topic)
    }
  }

  test("native session_window sessions are identical under RocksDB") {
    // the MERGING window state (one row per open session, merged as
    // events extend it) is the state shape most sensitive to a provider
    // swap — pin append-mode output equality across providers
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStreamOps.Event
    implicit val ctx = spark.sqlContext
    def ev(id: Long, t: String, user: Long = 1L): Event =
      Event(id, Timestamp.valueOf(t), user, "click", 1.0)
    val data = Seq(
      ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:05:00"),
      ev(4, "2024-01-01 10:30:00", user = 2L),
      ev(3, "2024-01-01 12:00:00"),
      ev(99, "2024-01-02 00:00:00", user = 99L))
    val hdfsDefault =
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
    def run(provider: String): Set[(Long, Long, Long, Long)] = withProvider(provider) {
      val name = s"rocks_sw_${provider.hashCode.abs}"
      val stream = MemoryStream[Event]
      val q = EventStreamOps.sessionWindowCounts(
          stream.toDF(), "10 minutes", "0 seconds")
        .writeStream.format("memory").queryName(name)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
      try {
        data.foreach { e => stream.addData(e); q.processAllAvailable() }
      } finally q.stop()
      spark.table(name).filter($"user_id" =!= 99L)
        .select($"user_id", unix_millis($"session_start"),
          unix_millis($"session_end"), $"n_events")
        .as[(Long, Long, Long, Long)].collect().toSet
    }
    val rocks = run(RocksDb)
    val hdfs = run(hdfsDefault)
    assert(rocks == hdfs, "session windows must not depend on the provider")
    assert(rocks.size == 3)
  }

  test("hllDayRegisters under RocksDB survives a mid-stream kill: day " +
      "tables finalized AFTER the restart carry registers maxed BEFORE " +
      "it, byte-equal to the batch build (the ev16-ev18 sketch " +
      "warehouse's streaming leg — r17 verdict task 6)") {
    // the windowed MAX-per-(day, type, register) aggregation is the
    // sketch warehouse's streaming state; under at-least-once delivery a
    // restart that loses register state silently UNDER-COUNTS (MAX is
    // idempotent, so nothing downstream would flag it). The kill lands
    // while day 1 is still open: its final table emits only after the
    // restart, so equality with the batch build proves the registers
    // came back from RocksDB.
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.EventStreamOps.Event
    implicit val ctx = spark.sqlContext
    def evt(id: Long, t: String, user: Long, typ: String): Event =
      Event(id, Timestamp.valueOf(t), user, typ, 1.0)
    val preKill = Seq(
      evt(1, "2024-01-01 10:00:00", 1, "click"),
      evt(2, "2024-01-01 11:00:00", 2, "click"),
      evt(3, "2024-01-01 12:00:00", 3, "view"))
    val postKill = Seq(
      evt(4, "2024-01-01 13:00:00", 4, "click"),
      evt(5, "2024-01-01 14:00:00", 1, "view"),
      evt(6, "2024-01-02 09:00:00", 5, "click"),
      evt(7, "2024-01-02 10:00:00", 6, "click"))
    val all = preKill ++ postKill
    val ckpt = Files.createTempDirectory("rocks_hll_ckpt").toString
    val out = Files.createTempDirectory("rocks_hll_out").toString
    val stream = MemoryStream[Event]
    // the memory sink cannot recover from a checkpoint — finalized day
    // rows land as json files, accumulated across the restart like the
    // dedupe case above
    def start() = withProvider(RocksDb) {
      EventStreamOps.hllDayRegisters(stream.toDF())
        .select($"day".cast("string").as("day"), $"event_type", $"reg", $"mr")
        .writeStream.format("json").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start()
    }
    def emitted() = spark.read.schema("day STRING, event_type STRING, " +
        "reg BIGINT, mr INT").json(out)
    var q = start()
    try {
      stream.addData(preKill: _*); q.processAllAvailable()
      // nothing may finalize yet (watermark is 2h behind a mid-day max),
      // so everything below rides on recovered state
      assert(emitted().isEmpty, "day 1 must still be open at the kill point")
      // the aggregation state really lives in RocksDB
      val stateOps = q.recentProgress.flatMap(_.stateOperators)
      assert(stateOps.exists(_.numRowsTotal > 0), "expected register state rows")
      import scala.jdk.CollectionConverters._
      val metricKeys = stateOps.flatMap(_.customMetrics.keySet().asScala)
      assert(metricKeys.exists(_.toLowerCase.contains("rocksdb")),
        s"state metrics carry no rocksdb counters: ${metricKeys.distinct.toSeq}")
      q.stop() // mid-stream kill while every register is state-only …
      q = start() // … resume from the RocksDB checkpoint
      stream.addData(postKill: _*); q.processAllAvailable()
      // advance the watermark far past day 2 so both day tables finalize
      stream.addData(evt(8, "2024-01-04 09:00:00", 9, "view"))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = emitted()
      .select($"day", $"event_type", $"reg", $"mr")
      .as[(String, String, Long, Int)].collect().toSet
    // batch twin over the same events: byte-equal day tables — register
    // 1's MAX must reflect pre-kill users 1-3, which only RocksDB held
    val h = md5($"user_id".cast("string"))
    val batch = all.toDF()
      .select(date_trunc("day", $"ts").cast("date").cast("string").as("day"),
        $"event_type",
        graft.relational.EventsAnalytics.hllRegOf(h).as("reg"),
        graft.relational.EventsAnalytics.hllRankOf(h).as("rank"))
      .groupBy($"day", $"event_type", $"reg")
      .agg(max($"rank").as("mr"))
      .as[(String, String, Long, Int)].collect().toSet
    assert(streamed == batch,
      "restart-recovered day registers must equal the batch build")
    assert(streamed.nonEmpty)
  }

  test("packStream + shard-segment sink under RocksDB: placements row-" +
      "identical to batch tx26 across a kill+restart, incremental segments " +
      "equal the batch shard files, and RocksDB really held the state") {
    // packStream's keyed state (per-source offset) is EXACTLY the state
    // that outgrows heap at 100 TB of arbitrary-cardinality sources —
    // the r15 verdict's uncovered case. Drive the full streaming
    // tokenize→pack→shard closure under RocksDBStateStoreProvider with a
    // kill between micro-batches: the offset must come back from RocksDB
    // (a reset offset would shift every later placement and corrupt the
    // segment tiling, so the batch-equality assertions below are a
    // restart-survival proof, not just a parity check).
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.PackingIngest
    implicit val ctx = spark.sqlContext
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .filter($"text".isNotNull)
      .select($"source", $"doc_id", $"text").as[(String, Long, String)]
      .collect().sortBy(_._2)
    val chunks = Seq(docs.take(9), docs.slice(9, 130), docs.drop(130))
    val dir = Files.createTempDirectory("rocks_pack").toString
    val out = s"$dir/segs"
    val stream = MemoryStream[(String, Long, String)]
    def start() = withProvider(RocksDb) {
      PackingIngest.packStream(stream.toDF.toDF("source", "doc_id", "text"))
        .writeStream
        .foreachBatch(PackingIngest.foreachBatchShardSegments(out) _)
        .option("checkpointLocation", s"$dir/ckpt")
        .outputMode(OutputMode.Append).start()
    }
    var q = start()
    try {
      stream.addData(chunks(0).toSeq); q.processAllAvailable()
      // the flatMapGroupsWithState state really lives in RocksDB
      val stateOps = q.recentProgress.flatMap(_.stateOperators)
      assert(stateOps.exists(s =>
        s.operatorName.contains("flatMapGroupsWithState") && s.numRowsTotal > 0),
        "expected flatMapGroupsWithState state rows")
      import scala.jdk.CollectionConverters._
      val metricKeys = stateOps.flatMap(_.customMetrics.keySet().asScala)
      assert(metricKeys.exists(_.toLowerCase.contains("rocksdb")),
        s"state metrics carry no rocksdb counters: ${metricKeys.distinct.toSeq}")
      q.stop() // kill between micro-batches …
      q = start() // … and resume from the RocksDB-checkpointed offsets
      chunks.drop(1).foreach { c =>
        stream.addData(c.toSeq); q.processAllAvailable()
      }
    } finally q.stop()
    def canon(p: String, drop: Seq[String]): Seq[String] = {
      val df = spark.read.parquet(p)
      df.select(df.columns.filterNot(drop.contains).sorted
          .map(c => col(c).cast("string")): _*)
        .collect().map(_.toString).sorted.toSeq
    }
    val out2 = s"$dir/segs_batch"
    graft.llmdata.Curation.writeShardFiles(spark, sf(), out2)
    val got = canon(out, Seq("batch_id"))
    assert(got.nonEmpty && got == canon(out2, Seq()),
      "RocksDB-stated incremental segments must equal the batch shard files")
  }
}

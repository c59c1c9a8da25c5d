package graft

import org.apache.spark.sql.SparkSession

/** Cold-start cost profiler for the CDC throughput probe (r10 verdict
  * task 2): the fresh 50k AvailableNow run pays ~0.9 s of FIXED cost that
  * the marginal probe subtracts out — this main decomposes it using
  * Spark's own per-batch `durationMs` phases plus wall-clock brackets
  * around query construction / start / termination, at several event
  * counts (the n→0 limit isolates pure overhead).
  *
  * Output: one human-readable block per n with
  *   wall_total, dataframe_build, start_to_firstbatch, and the batch's
  *   triggerExecution breakdown (latestOffset, getBatch, queryPlanning,
  *   walCommit, addBatch, commitOffsets).
  */
object ColdStartProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.extensions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def snapshot(parts: Int) = {
      import org.apache.spark.sql.functions._
      spark.range(0, 1000, 1, parts)
        .select(concat(lit("001"), col("id")).as("Id"),
          concat(lit("Name"), col("id")).as("Name"), (col("id") * 1.5).as("Balance"))
    }
    def eventJson(i: Int): String =
      s"""{"schema":"fp","payload":{"Name":"N$i","ChangeEventHeader":{""" +
        s""""commitNumber":$i,"commitUser":"u","sequenceNumber":1,""" +
        s""""entityName":"Account","changeType":"UPDATE",""" +
        s""""changedFields":[],"changeOrigin":"t","transactionKey":"tk$i",""" +
        s""""commitTimestamp":${1583300894000L + i},"recordIds":["001${i % 1000}"]}},""" +
        s""""event":{"replayId":${i + 1}}}"""

    // Spark-level accounting: how many jobs/stages/tasks one probe runs,
    // and how much of the wall is actual task time vs scheduling gaps.
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val runMs = new java.util.concurrent.atomic.AtomicLong
    val deserMs = new java.util.concurrent.atomic.AtomicLong
    val gcMs = new java.util.concurrent.atomic.AtomicLong
    val cpuMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          stages.incrementAndGet()
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          tasks.incrementAndGet()
          if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
          if (t.taskMetrics != null) {
            runMs.addAndGet(t.taskMetrics.executorRunTime)
            deserMs.addAndGet(t.taskMetrics.executorDeserializeTime)
            gcMs.addAndGet(t.taskMetrics.jvmGCTime)
            cpuMs.addAndGet(t.taskMetrics.executorCpuTime / 1000000L)
          }
        }
      })

    def probe(n: Int, label: String, snapParts: Int = 32, shards: Int = 4): Unit = {
      import graft.sources.ReplayBus
      val topic = s"profile_$label"
      ReplayBus.clear(topic)
      var i = 0
      while (i < n) { ReplayBus.publish(topic, eventJson(i)); i += 1 }
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
      runMs.set(0); deserMs.set(0); gcMs.set(0); cpuMs.set(0)
      val t0 = System.nanoTime()
      val raw = spark.readStream.format("cdc-replay")
        .option("topic", topic).option("replayFrom", "-2")
        .option("numShards", shards.toString).load()
      val sink = graft.streaming.CdcPipeline.toJsonLines(
        graft.streaming.CdcPipeline.transform(raw, snapshot(snapParts)))
        .writeStream.format("noop")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      val t1 = System.nanoTime()
      val q = sink.start()
      val t2 = System.nanoTime()
      q.awaitTermination()
      val t3 = System.nanoTime()
      ReplayBus.clear(topic)
      def ms(a: Long, b: Long): Double = (b - a) / 1e6
      Thread.sleep(200) // listener bus drains async
      println(f"== n=$n%6d snap=$snapParts%2d shards=$shards%2d  wall_total=${ms(t0, t3)}%8.1f ms  " +
        f"build=${ms(t0, t1)}%6.1f  start()=${ms(t1, t2)}%7.1f  run=${ms(t2, t3)}%8.1f  " +
        f"jobs=${jobs.get}%2d stages=${stages.get}%2d tasks=${tasks.get}%3d " +
        f"taskTime=${taskMs.get}%5d ms run=${runMs.get}%5d deser=${deserMs.get}%5d " +
        f"gc=${gcMs.get}%4d cpu=${cpuMs.get}%5d")
      q.recentProgress.foreach { p =>
        val d = p.durationMs
        def g(k: String): Long = Option(d.get(k)).map(_.toLong).getOrElse(-1L)
        println(f"   batch ${p.batchId}%2d rows=${p.numInputRows}%6d " +
          f"trigger=${g("triggerExecution")}%5d lo=${g("latestOffset")}%4d " +
          f"gb=${g("getBatch")}%4d plan=${g("queryPlanning")}%4d " +
          f"wal=${g("walCommit")}%4d add=${g("addBatch")}%5d " +
          f"co=${g("commitOffsets")}%4d")
      }
    }

    // warm-up VOLUME experiment: JIT, not codegen, owns the position
    // effect (pos2→pos5 of identical 50k probes: 1.64→0.98 s, task CPU
    // halves) — so warm with enough EVENT VOLUME, then measure position 3
    probe(25000, "warm1", snapParts = 4, shards = 16)
    probe(25000, "warm2", snapParts = 4, shards = 16)
    probe(50000, "fresh_pos3", snapParts = 4, shards = 16)
    probe(50000, "fresh_pos4", snapParts = 4, shards = 16)
    probe(50000, "fresh_pos5", snapParts = 4, shards = 16)
    spark.stop()
  }
}

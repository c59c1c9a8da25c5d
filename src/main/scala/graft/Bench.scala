package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // CDC pipeline throughput (events/s): end-to-end decode→route→enrich
    // over the in-memory replay source. The reference's implied ceiling is
    // ~50 records/s per worker (BASELINE.md BATCH_SIZE/INTERVAL).
    val eps = try cdcThroughput(spark) catch { case _: Throwable => -1.0 }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""cdc_pipeline_events_per_sec":$eps,"sf":"$sfDir"}""")
    spark.stop()
  }

  private def cdcThroughput(spark: SparkSession, n: Int = 50000): Double = {
    import graft.sources.ReplayBus
    val topic = "bench_cdc"
    ReplayBus.clear(topic)
    var i = 0
    while (i < n) {
      ReplayBus.publish(topic,
        s"""{"schema":"fp","payload":{"Name":"N$i","ChangeEventHeader":{""" +
          s""""commitNumber":$i,"commitUser":"u","sequenceNumber":1,""" +
          s""""entityName":"Account","changeType":"${if (i % 5 == 0) "DELETE" else "UPDATE"}",""" +
          s""""changedFields":[],"changeOrigin":"t","transactionKey":"tk$i",""" +
          s""""commitTimestamp":${1583300894000L + i},"recordIds":["001${i % 1000}"]}},""" +
          s""""event":{"replayId":${i + 1}}}""")
      i += 1
    }
    import org.apache.spark.sql.functions._
    val snapshot = spark.range(1000)
      .select(concat(lit("001"), col("id")).as("Id"),
        concat(lit("Name"), col("id")).as("Name"), (col("id") * 1.5).as("Balance"))
    val raw = spark.readStream.format("cdc-replay")
      .option("topic", topic).option("replayFrom", "-2").load()
    val t0 = System.nanoTime()
    val q = graft.streaming.CdcPipeline.toJsonLines(
      graft.streaming.CdcPipeline.transform(raw, snapshot))
      .writeStream.format("noop")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9
    ReplayBus.clear(topic)
    n / secs
  }
}

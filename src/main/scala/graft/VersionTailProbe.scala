package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SCALING probe (r15): serve-read cost of AnnIngest's versioned
  * delta-log index as the upsert version tail grows, and after
  * compaction folds it back into the base.
  *
  * The latest view is one window over every delta partition, so each
  * read pays (a) partition/file enumeration linear in version count and
  * (b) the window over base+delta rows. This probe quantifies both on
  * the sf fixture: build the base index minus a holdout, upsert the
  * holdout in fixed-size batches, and at checkpoints time the serving
  * read ([[graft.streaming.AnnIngest.latestGraph]] → count, min of 3)
  * and count the artifact's parquet files; then compact and measure
  * again. One JSON line per checkpoint → SCALING.md's version-tail
  * table.
  *
  * Run: sbt "runMain graft.VersionTailProbe [sfDir] [nBatches] [perBatch]"
  */
object VersionTailProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(48)
    val per = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.extensions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val tmp = java.nio.file.Files.createTempDirectory("ann_tail").toString
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val maxId = emb.agg(max(col("vec_id"))).collect()(0).getLong(0)
    val holdOut = maxId - nBatches.toLong * per + 1
    emb.filter(col("vec_id") < holdOut)
      .write.parquet(s"$tmp/fixture/embeddings.parquet")
    val idx = s"$tmp/idx"
    graft.streaming.AnnIngest.writeAnnIndex(spark, s"$tmp/fixture", idx)

    def graphFiles(): Long = {
      val dir = java.nio.file.Paths.get(s"$idx/graph")
      var n = 0L
      java.nio.file.Files.walk(dir).forEach { p =>
        if (p.toString.endsWith(".parquet")) n += 1
      }
      n
    }
    def measure(compacted: Boolean): Unit = {
      val ms = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.streaming.AnnIngest.latestGraph(spark, idx).count()
        (System.nanoTime() - t0) / 1e6
      }.min
      val st = graft.streaming.AnnIngest.tailStats(spark, idx)
      println(s"""{"probe":"ann_version_tail","versions":${st.nVersions},""" +
        s""""graph_files":${graphFiles()},"delta_rows":${st.deltaRows},""" +
        s""""base_rows":${st.baseRows},"latest_graph_ms":${math.round(ms)},""" +
        s""""compacted":$compacted}""")
    }

    val checkpoints = Set(0L, 8L, 16L, 32L, nBatches.toLong)
    measure(compacted = false)
    (0 until nBatches).foreach { i =>
      val lo = holdOut + i.toLong * per
      val batch = emb.filter(col("vec_id") >= lo && col("vec_id") < lo + per)
        .select(col("vec_id"), col("embedding"))
      graft.streaming.AnnIngest.upsertVectors(spark, idx, batch, batchId = i.toLong)
      if (checkpoints.contains(i + 1L)) measure(compacted = false)
    }
    graft.streaming.AnnIngest.compact(spark, idx)
    measure(compacted = true)
    spark.stop()
  }
}

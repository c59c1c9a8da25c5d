package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary profiling harness — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("scratch")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIMER $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val g = time("descent build") {
      val d = graft.llmdata.Similarity.knnGraphDescent(spark, dir)
      d.count()
      d.select(col("src_id"), col("neighbor_id"))
    }
    val seed = graft.llmdata.Similarity.corpusSeedGraph(spark, dir)
    val rich = g.union(seed).distinct()
    val conv = time("converged build") {
      val c = graft.llmdata.Similarity.knnGraphConverged(spark, dir)
        .select(col("src_id"), col("neighbor_id")).localCheckpoint()
      c.count(); c
    }
    locally {
      val rc = time("serve over converged") {
        graft.llmdata.Similarity.graphServeOver(spark, dir, conv).collect()
      }
      val recallC = rc.count(_.getAs[Boolean]("in_exact")).toDouble / rc.length
      println(f"RECALL converged recall=$recallC%.3f")
      // fixed point check: one more descent round over conv changes nothing
      val again = graft.llmdata.Similarity.descentRound(spark, dir, conv)
        .select(org.apache.spark.sql.functions.col("src_id"),
          org.apache.spark.sql.functions.col("neighbor_id"))
      println("FIXEDPOINT diff=" + again.except(conv).count())
    }
    spark.stop()
  }
}

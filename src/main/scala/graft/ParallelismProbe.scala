package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Executor-side parallelism evidence (r19 verdict item 5): at sf0.1 the
  * whole battery is fixed-overhead-dominated, so a 32-core run is SLOWER
  * than an 8-core run and "is this operator parallel?" is unmeasurable
  * from wall-clock alone. This probe runs the named queries (default: the
  * battery's most expensive rows) under a task-metrics listener and
  * reports, per query: wall seconds (min of 3 warm runs), the SUM of task
  * executor run times inside the best run, the task count, and the
  * achieved parallelism (task-time / wall). A genuinely serial operator
  * shows parallelism ~1 no matter the core count; a parallel one shows
  * task-time >> wall once its data step dominates the job floor.
  *
  * Honors SPARK_GRAFT_CPUS / SPARK_GRAFT_SF_DIR like Bench. Output: one
  * JSON line per query, `{"query":..., "cpus":N, "wall_s":..,
  * "task_time_s":.., "tasks":.., "parallelism":..}`.
  */
object ParallelismProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.extensions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val taskTime = new AtomicLong(0L) // executor run time, ms
    val taskCount = new AtomicInteger(0)
    // per-stage task-time breakdown (SPARK_GRAFT_STAGES=1): stageId ->
    // (tasks, task ms, deser ms, gc ms) — names resolved via stage info
    val stageAgg = scala.collection.concurrent.TrieMap
      .empty[Int, (Int, Long, Long, Long)]
    val stageNames = scala.collection.concurrent.TrieMap.empty[Int, String]
    val dumpStages = sys.env.get("SPARK_GRAFT_STAGES").contains("1")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          taskTime.addAndGet(m.executorRunTime)
          val (n0, r0, d0, g0) = stageAgg.getOrElse(t.stageId, (0, 0L, 0L, 0L))
          stageAgg(t.stageId) = (n0 + 1, r0 + m.executorRunTime,
            d0 + m.executorDeserializeTime, g0 + m.jvmGCTime)
        }
        taskCount.incrementAndGet()
      }
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        stageNames(s.stageInfo.stageId) = s.stageInfo.name.takeWhile(_ != '\n').take(80)
    })

    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("dd6_ngram_jaccard", "ss19_serve_sweep", "q38_above_avg_supplier",
        "cur12_trigram_lm_filter", "q35_sole_late_supplier", "ss10_ann_ivf_refined",
        "q17_small_qty_revenue", "q18_big_orders", "dd21_pagerank", "ss24_ivf_sweep")

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // family warm-up: build session caches untimed, as the bench does
      val warmOk =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[parprobe] $name failed warm-up: $e"); false
        }
      if (warmOk) {
        // three timed runs; keep the one with min wall and report ITS task
        // totals (listener counters snapshotted around each run with a
        // short drain pause; jobs are sequential here so attribution is
        // near-exact — a few ms of listener lag at worst)
        val samples = (1 to 3).map { _ =>
          Thread.sleep(300) // drain async listener events of the prior run
          val (t0, c0) = (taskTime.get(), taskCount.get())
          val w0 = System.nanoTime()
          fn(spark, sfDir).count()
          val wall = (System.nanoTime() - w0) / 1e9
          Thread.sleep(300)
          (wall, (taskTime.get() - t0) / 1000.0, taskCount.get() - c0)
        }
        val (wall, tt, n) = samples.minBy(_._1)
        println(f"""{"query":"$name","cpus":$cpus,"wall_s":$wall%.3f,""" +
          f""""task_time_s":$tt%.3f,"tasks":$n,"parallelism":${tt / wall}%.2f}""")
        if (dumpStages) {
          stageAgg.toSeq.sortBy(-_._2._2).take(12).foreach {
            case (sid, (nt, rt, dt, gc)) =>
              println(f"[stage] $sid%5d tasks=$nt%4d run=${rt / 1000.0}%8.2fs " +
                f"deser=${dt / 1000.0}%6.2fs gc=${gc / 1000.0}%6.2fs  " +
                stageNames.getOrElse(sid, "?"))
          }
          stageAgg.clear(); stageNames.clear()
        }
      }
    }
    spark.stop()
  }
}

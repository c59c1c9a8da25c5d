package graft

import graft.operators.RangeJoin

/** Bucketized range join must be row-identical to the naive range
  * predicate, across bin widths (intervals spanning 1..many bins,
  * boundary-inclusive ends, empty intervals). */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed matches the naive BETWEEN join for every bin width") {
    val points = (0L to 200L).toDF("p")
    val intervals = Seq(
      (1L, 0L, 0L),     // single-point interval
      (2L, 5L, 36L),    // spans multiple bins at small widths
      (3L, 31L, 33L),   // straddles a bin boundary at width 32
      (4L, 190L, 300L), // runs past the point domain
      (5L, 120L, 110L)) // empty (hi < lo): sequence would be invalid
      .toDF("ikey", "lo", "hi")
      .filter($"hi" >= $"lo") // guard empty intervals out, as callers must
    val naive = points.join(intervals,
      $"p" >= $"lo" && $"p" <= $"hi").select("p", "ikey")
      .as[(Long, Long)].collect().toSet
    for (w <- Seq(1L, 7L, 32L, 1000L)) {
      val fast = RangeJoin.bucketed(points, intervals, "p", "lo", "hi", w)
        .select("p", "ikey").as[(Long, Long)].collect().toSet
      assert(fast == naive, s"binWidth=$w diverges from the naive range join")
    }
  }
}

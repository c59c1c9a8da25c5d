package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Point-in-interval range join — `points.p BETWEEN intervals.lo AND
  * intervals.hi`. Spark plans a raw range predicate as a broadcast
  * nested-loop (or cartesian) join: every point against every interval,
  * O(|P|·|I|) — the classic scale killer for interval joins. This is the
  * bucketized rendering: intervals explode into the fixed-width bins they
  * cover, points key into their single bin, and the join becomes an
  * EQUI-join on the bin followed by the exact BETWEEN filter on the
  * (tiny) per-bin candidate set.
  *
  * Cost: one shuffle on the bin key (or a broadcast if one side is
  * small — Catalyst picks), candidate set per point = intervals covering
  * its bin. Pick `binWidth` near the typical interval width: each
  * interval lands in O(1 + width/binWidth) bins, so bin replication
  * stays constant-factor. A point matches an interval at most once (its
  * bin is unique), so no post-join dedup is needed.
  */
object RangeJoin {

  /** `points` must carry `pointCol`; `intervals` carry `loCol`/`hiCol`
    * (inclusive both ends, integral types). Column names across the two
    * sides must be disjoint. Returns matched (point × interval) rows. */
  def bucketed(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(!points.columns.contains("_bin") && !intervals.columns.contains("_bin"),
      "inputs must not carry a _bin column (it would be silently overwritten)")
    def bin(c: Column): Column = floor(c / binWidth).cast(LongType)
    val ivb = intervals.withColumn("_bin",
      explode(sequence(bin(col(loCol)), bin(col(hiCol)))))
    val ptb = points.withColumn("_bin", bin(col(pointCol)))
    ptb.join(ivb, "_bin")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_bin")
  }
}

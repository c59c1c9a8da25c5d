package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Skew-resilient equi-join via key salting (the 100 TB tool for heavy-
  * hitter keys that AQE's skew-join splitting can't always save, e.g. a
  * single entityName dominating a CDC stream — the reference's Kinesis
  * partitionKey has exactly this failure mode,
  * `/root/reference/subscriber/.../KinesisExample.java:105-108`).
  *
  * The skewed (probe) side gets a DETERMINISTIC salt in [0, salts) hashed
  * from the whole row (not `rand()` — replay/retry safety in streaming);
  * the smaller (build) side is replicated `salts` times. The join key
  * becomes (key, salt): one hot key now spreads over `salts` shuffle
  * partitions. Result equality with the unsalted join is asserted in
  * SkewJoinSpec.
  */
object SkewJoin {

  /** Inner equi-join `left ⋈ right` on `key`, with `left` salted and
    * `right` replicated. Use when `left` is large and skewed on `key` and
    * `right` is too big to broadcast but much smaller than `left`. */
  def salted(left: DataFrame, right: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val leftCols: Array[Column] = left.columns.map(col)
    val salt = pmod(xxhash64(leftCols.toIndexedSeq: _*), lit(salts)).cast(IntegerType)
    val l = left.withColumn("_salt", salt)
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}

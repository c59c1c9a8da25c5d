package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** K-minimum-values distinct-count sketch as a typed `Aggregator`
  * (SURVEY.md §4 "custom pieces": sketch-based distinct beyond
  * approx_count_distinct).
  *
  * KMV keeps the k smallest md5 digests seen; the estimate is
  * (k-1) / normalized(kth-minimum). Because the sketch is an order-
  * independent set-minimum, the result is DETERMINISTIC for a given input
  * set — unlike HLL it can be hash-compared against a DuckDB oracle that
  * computes the same k minima with ORDER BY/LIMIT. Fixed-width hex compares
  * lexicographically == numerically; the first 12 hex chars (48 bits) fit a
  * double exactly, so the final arithmetic is bit-identical across engines.
  *
  * Scale posture: the buffer is O(k); merge is a k-way min-union, so the
  * aggregation is a standard partial-agg shuffle of k-sized sketches — this
  * is how one counts distinct shingles across 100 TB without a
  * count(distinct) shuffle of the raw values.
  */
object KmvDistinct {

  val DefaultK = 256

  final case class Buf(hashes: List[String])

  /** Estimate from the k smallest NORMALIZED hashes (hex/16^12 ∈ [0,1)). */
  def estimate(sorted: List[String], k: Int): Double =
    if (sorted.size < k) sorted.size.toDouble
    else {
      val kth = sorted(k - 1)
      val v = java.lang.Long.parseLong(kth.substring(0, 12), 16).toDouble
      (k - 1).toDouble * math.pow(16.0, 12.0) / v
    }

  class Agg(k: Int) extends Aggregator[String, Buf, Double] {
    override def zero: Buf = Buf(Nil)

    private def trim(sorted: List[String]): List[String] =
      if (sorted.size <= k) sorted else sorted.take(k)

    override def reduce(b: Buf, hash: String): Buf =
      // fast path: sketch full and candidate ≥ current max → no-op
      if (b.hashes.size >= k && hash >= b.hashes.last) b
      else if (b.hashes.contains(hash)) b
      else Buf(trim((hash :: b.hashes).sorted))

    override def merge(a: Buf, b: Buf): Buf =
      Buf(trim((a.hashes ++ b.hashes).distinct.sorted))

    override def finish(b: Buf): Double = estimate(b.hashes, k)

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column form: kmvDistinct(md5Hex) — input must be md5 hex strings. */
  def kmvDistinct(hashCol: Column, k: Int = DefaultK): Column =
    udaf(new Agg(k), Encoders.STRING).apply(hashCol)
}

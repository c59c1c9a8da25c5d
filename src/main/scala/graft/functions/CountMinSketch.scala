package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Count-Min sketch as a typed `Aggregator`: approximate per-key counts
  * in O(d·w) space regardless of key cardinality — the streaming/huge-
  * cardinality companion to exact groupBy counting (heavy hitters over
  * 100 TB of events without shuffling every key).
  *
  * Each input increments one cell per depth row (`cell = md5-hash of
  * "i:key" mod width`); merge is elementwise addition, so the sketch is
  * ORDER- and PARTITION-independent and therefore deterministic — like
  * KMV (and unlike HLL), even the ESTIMATE can be hash-compared against
  * a DuckDB oracle computing the identical md5 buckets. A point estimate
  * is the min over depth rows of the addressed cells; it always
  * upper-bounds the true count (collisions only add).
  *
  * Scale posture: partial aggregation ships one long[d·w] per partition
  * (d=4, w=64 → 2 KB), not the key universe.
  */
object CountMinSketch {

  val DefaultDepth = 4
  val DefaultWidth = 64

  /** Deterministic bucket: first 60 bits of md5("i:key") mod width —
    * reproducible as `('0x' || substr(md5(...), 1, 15))::BIGINT % w` in
    * DuckDB and `conv(substring(md5(...), 1, 15), 16, 10) % w` in Spark
    * SQL (60 bits fit a signed long; md5 of UTF-8 agrees everywhere).
    * Hot-path form: the digest instance is reused per thread and the 60
    * bits come straight off the first 8 digest bytes ((b0..b7 big-endian)
    * >>> 4 ≡ parseLong(hex.take(15), 16)) — no hex string, no formatter;
    * this runs d times per input row inside the Aggregator's reduce. */
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def bucket(depth: Int, key: String, width: Int): Int = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s"$depth:$key".getBytes("UTF-8"))
    var bits = 0L
    var i = 0
    while (i < 8) { bits = (bits << 8) | (d(i) & 0xffL); i += 1 }
    ((bits >>> 4) % width).toInt
  }

  final case class Buf(cells: Array[Long])

  class Agg(d: Int, w: Int) extends Aggregator[String, Buf, Array[Long]] {
    override def zero: Buf = Buf(new Array[Long](d * w))

    override def reduce(b: Buf, key: String): Buf = {
      // null keys are EXCLUDED (interpolating would count them under the
      // literal string "null"; the SQL estimate path and the oracle both
      // treat null keys as null) — callers filter nulls on the exact side
      if (key == null) return b
      var i = 0
      while (i < d) { b.cells(i * w + bucket(i, key, w)) += 1L; i += 1 }
      b
    }

    override def merge(a: Buf, b: Buf): Buf = {
      var i = 0
      while (i < a.cells.length) { a.cells(i) += b.cells(i); i += 1 }
      a
    }

    override def finish(b: Buf): Array[Long] = b.cells

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Column form: the flattened d×w cell matrix (row-major). */
  def countMin(keyCol: Column, d: Int = DefaultDepth, w: Int = DefaultWidth): Column =
    udaf(new Agg(d, w), Encoders.STRING).apply(keyCol)
}

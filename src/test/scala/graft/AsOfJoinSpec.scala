package graft

import org.apache.spark.sql.execution.ExplainMode

import graft.operators.AsOfJoin

/** Semantics + plan shape of the union-window as-of join. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private val versions = Seq(
    ("a", 10L, "v0"), ("a", 20L, "v1"), ("a", 30L, "v2"),
    ("b", 10L, "v0"))
    .toDF("id", "ts", "name")

  test("backward as-of: latest right row at-or-before each left ts, per key") {
    val queries = Seq(
      ("a", 5L), // before every version -> null
      ("a", 10L), // exactly v0's ts -> v0 (<= convention)
      ("a", 25L), // between v1 and v2 -> v1
      ("a", 99L), // after all -> v2
      ("b", 15L), // other key -> its own v0
      ("c", 50L)) // key with no versions -> null
      .toDF("id", "ts")
    val out = AsOfJoin.asOfBackward(queries, versions, Seq("id"), "ts")
      .as[(String, Long, String)].collect().toSet
    assert(out == Set(
      ("a", 5L, null), ("a", 10L, "v0"), ("a", 25L, "v1"), ("a", 99L, "v2"),
      ("b", 15L, "v0"), ("c", 50L, null)))
  }

  test("as-of is join-free: one keyed window, no join operator in the plan") {
    val queries = Seq(("a", 25L)).toDF("id", "ts")
    val p = AsOfJoin.asOfBackward(queries, versions, Seq("id"), "ts")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("Join"), "as-of must compile to union + window, not a join")
    assert(p.contains("Window"))
  }

  test("left columns and multiple right payload columns survive intact") {
    val right = Seq(("a", 10L, "v0", 1.5)).toDF("id", "ts", "name", "score")
    val left = Seq(("a", 12L, "X")).toDF("id", "ts", "tag")
    val out = AsOfJoin.asOfBackward(left, right, Seq("id"), "ts").collect().head
    assert(out.getAs[String]("tag") == "X")
    assert(out.getAs[String]("name") == "v0")
    assert(out.getAs[Double]("score") == 1.5)
    assert(out.getAs[Long]("ts") == 12L)
  }
}

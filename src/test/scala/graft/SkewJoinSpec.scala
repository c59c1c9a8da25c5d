package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

/** Salted join must be result-equal to the plain join and spread a hot key
  * across salt buckets. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // 10k rows, 90% on one hot key
    val left = spark.range(10000)
      .select(when($"id" % 10 === 0, $"id" % 7).otherwise(lit(99L)).as("k"),
        $"id".as("payload"))
    val right = Seq.tabulate(100)(i => (i.toLong, s"dim$i")).toDF("k", "name")

    val plain = left.join(right, Seq("k")).select("k", "payload", "name")
      .as[(Long, Long, String)].collect().toSet
    val salted = SkewJoin.salted(left, right, "k", salts = 8)
      .select("k", "payload", "name")
      .as[(Long, Long, String)].collect().toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("salting is deterministic (no rand()): two runs produce identical salt") {
    val df = spark.range(100).select(($"id" % 5).as("k"), $"id".as("v"))
    val r = Seq((0L, "x")).toDF("k", "name")
    val a = SkewJoin.salted(df, r, "k", 4).collect().toSet
    val b = SkewJoin.salted(df, r, "k", 4).collect().toSet
    assert(a == b)
  }
}

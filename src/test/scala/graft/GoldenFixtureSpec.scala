package graft

import scala.io.Source

import org.apache.spark.sql.functions._

import graft.operators.{CdcDecode, CdcEnrich}

/** Golden end-to-end test on the reference's OWN fixture (the base64
  * kinesis payload from `/root/reference/worker/events/event.json:8`,
  * staged at test resources) — the de-facto golden input per SURVEY.md §5.
  * Asserts the decoded header matches the documented values and that the
  * full pipeline reconstitutes the enriched record exactly as the
  * reference's worker would. */
class GoldenFixtureSpec extends SparkSpec {
  import spark.implicits._

  private lazy val b64: String = {
    val src = Source.fromResource("golden_cdc_event.b64")
    try src.mkString.trim finally src.close()
  }

  test("golden decode: header fields match the reference fixture exactly") {
    val raw = Seq(b64).toDF("data")
    val d = CdcDecode.decodeBase64(raw, col("data")).collect().head
    assert(d.getAs[String]("schema_fingerprint") == "8_j4Jvbl5vY1cUg6ykKsKw")
    assert(d.getAs[String]("entityName") == "Account")
    assert(d.getAs[String]("changeType") == "CREATE")
    assert(d.getAs[Long]("replayId") == 381L)
    assert(d.getAs[Long]("commitNumber") == 109179514333L)
    assert(d.getAs[Int]("sequenceNumber") == 1)
    assert(d.getAs[String]("transactionKey") == "00016048-2da9-6719-46a4-fda6cda9e2d4")
    assert(d.getAs[java.sql.Timestamp]("commitTimestamp").getTime == 1583300894000L)
    assert(d.getAs[scala.collection.Seq[String]]("recordIds").toSeq ==
      Seq("0012w000005FSzVAAW"))
    // the dynamic entity body traveled intact (schema-on-read)
    assert(d.getAs[String]("payload_json").contains("\"CleanStatus\":\"Pending\""))
  }

  test("golden pipeline: full-record reconstruction with UIND=CREATE (Q2 semantics)") {
    // snapshot row for the changed id, FIXTURES.md §A field list
    val snapshot = Seq((
      "0012w000005FSzVAAW", "GenePoint", "0052w0000025KPGAA2",
      "0052w0000025KPGAA2", "Pending", "2020-03-04T05:48:14.000Z"))
      .toDF("Id", "Name", "OwnerId", "CreatedById", "CleanStatus", "CreatedDate")
    val changes = CdcDecode.explodeIds(
      CdcDecode.decodeBase64(Seq(b64).toDF("data"), col("data")))
    val out = CdcEnrich(changes, snapshot).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[org.apache.spark.sql.Row]("attributes").getAs[String]("type") == "Account")
    assert(r.getAs[String]("Id") == "0012w000005FSzVAAW") // clean id (Q1 decision)
    assert(r.getAs[String]("Name") == "GenePoint") // full CURRENT record, not payload
    assert(r.getAs[String]("UIND") == "CREATE") // changeType verbatim (Q2)
  }
}

package graft

/** The driver's smoke contract: SparkEntry.entry returns rows on sf0.001,
  * and every query has either an oracle or a documented rows-only check. */
class EntrySpec extends SparkSpec {

  test("entry: flagship query returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key names a query and every query has an oracle") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"orphan oracles: ${o -- q}")
    assert((q -- o).isEmpty, s"missing oracles: ${q -- o}")
  }

  test("module query maps are disjoint (a name collision silently drops a query)") {
    import graft.llmdata.{Curation, Dedup, Multimodal, Similarity, TextAnalysis}
    import graft.operators.{CdcQueries, FuzzyMatch}
    import graft.relational.{EventsAnalytics, Relational, SqlSurface}
    val modules = Seq(
      Relational.queries, TextAnalysis.queries, Dedup.queries,
      Similarity.queries, Multimodal.queries, EventsAnalytics.queries,
      SqlSurface.queries, CdcQueries.queries, Curation.queries,
      FuzzyMatch.queries)
    assert(modules.map(_.size).sum == SparkEntry.queries.size,
      "duplicate query name across modules")
  }

  test("no oracle SQL carries init-cycle artifacts — a lowercase 'null' " +
      "or '% 0' means an object-initialization cycle interpolated an " +
      "unassigned constant into a twin (the 7bcaca9 failure mode)") {
    // legit SQL NULL in the twins is uppercase by convention; a baked
    // Scala null/0 interpolates lowercase 'null' / '% 0'
    val bakedNull = "(?<![A-Za-z0-9_])null(?![A-Za-z0-9_])".r
    val bakedZeroMod = "% 0(?![0-9.])".r
    val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1).collect {
      case (name, sql)
        if bakedNull.findFirstIn(sql).isDefined ||
          bakedZeroMod.findFirstIn(sql).isDefined => name
    }
    assert(bad.isEmpty, s"oracle SQL with baked null/zero artifacts: $bad")
  }

  test("gate outputs are scalar atomic columns only — the driver's row " +
      "comparator cannot sort array/map/struct cells (r16: cur16/tx33)") {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        fn(spark, sf()).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
    }
    assert(offenders.isEmpty,
      s"non-scalar top-level gate columns (render as md5(array_join(..)) " +
        s"or a joined string instead): ${offenders.mkString(", ")}")
  }

  test("all queries run on sf0.001 and return rows") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (name, fn) =>
      fn(spark, sf()).count() == 0
    }.map(_._1)
    assert(empty.isEmpty, s"queries with empty results at sf0.001: $empty")
  }
}

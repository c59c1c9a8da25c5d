package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Tables

/** SQL-text query surface: the same engine through `spark.sql` over
  * registered views — exercising parser/analyzer paths the DataFrame
  * battery doesn't (correlated EXISTS, scalar subqueries, IN subqueries,
  * UNION ALL, explicit CROSS JOIN). Oracle SQL is near-identical text, so
  * this doubles as a dialect-compatibility statement.
  */
object SqlSurface {

  private def sql(q: String)(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(q)
  }

  val q21: String =
    """SELECT n_name, COUNT(*) AS n_active_suppliers
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_suppkey = s_suppkey
      |                AND l_shipdate >= TIMESTAMP '1997-01-01'
      |                AND l_shipdate < TIMESTAMP '1998-01-01')
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  val q22: String =
    """SELECT COUNT(*) AS n_premium, MIN(p_retailprice) AS min_price,
      |  MAX(p_retailprice) AS max_price
      |FROM part
      |WHERE p_retailprice > (
      |  SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      |  FROM part)""".stripMargin

  val q23: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_mktsegment = 'MACHINERY'
      |  AND c_custkey IN (SELECT o_custkey FROM orders
      |                    WHERE o_orderdate >= TIMESTAMP '1997-06-01')
      |ORDER BY c_custkey""".stripMargin

  val q24: String =
    """SELECT side, COUNT(*) AS n, CAST(SUM(CAST(amount AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM (
      |  SELECT 'orders' AS side, o_totalprice AS amount FROM orders
      |  UNION ALL
      |  SELECT 'lineitem' AS side, l_extendedprice AS amount FROM lineitem)
      |GROUP BY side ORDER BY side""".stripMargin

  val q25: String =
    """SELECT r_name, o_orderstatus, COUNT(*) AS n_combos
      |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
      |GROUP BY r_name, o_orderstatus ORDER BY r_name, o_orderstatus""".stripMargin

  /** The registered NATIVE functions through pure SQL text (q34): the
    * SparkSessionExtensions path end-to-end under the oracle gate —
    * `simhash64` and `hamming` composed in the dialect (bits_set =
    * hamming against the zero string = popcount). Requires a session
    * built with GraftExtensions (Verify/Bench and the shared test
    * session enable it); the oracle reproduces the signature bit math
    * in DuckDB SQL like dd4's. */
  val q34: String =
    """SELECT doc_id, simhash64(split(text, ' ')) AS simhash,
      |  hamming(simhash64(split(text, ' ')), repeat('0', 64)) AS bits_set
      |FROM documents ORDER BY doc_id""".stripMargin

  private val q34Oracle: String =
    s"""SELECT doc_id, simhash,
       |  CAST(len(replace(simhash, '0', '')) AS BIGINT) AS bits_set
       |FROM (${graft.llmdata.Dedup.simhashCoreSql})
       |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q21_exists_subquery" -> sql(q21) _,
    "q22_scalar_subquery" -> sql(q22) _,
    "q23_in_subquery" -> sql(q23) _,
    "q24_union_all" -> sql(q24) _,
    "q25_cross_join" -> sql(q25) _,
    "q34_sql_native_fns" -> sql(q34) _)

  /** Same text runs in DuckDB verbatim (q34's oracle re-derives the
    * signature instead — DuckDB has no simhash64). */
  val oracle: Map[String, String] = Map(
    "q21_exists_subquery" -> q21,
    "q22_scalar_subquery" -> q22,
    "q23_in_subquery" -> q23,
    "q24_union_all" -> q24,
    "q25_cross_join" -> q25,
    "q34_sql_native_fns" -> q34Oracle)
}

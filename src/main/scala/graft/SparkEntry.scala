package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{Declared, Oracle}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every oracle-checked query surface of the engine:
  * the declared relational inventory (SURVEY §2.4). */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the TPC-H-Q5-shaped 6-way join + decimal aggregate. */
  def entry(spark: SparkSession): DataFrame =
    Declared.q05(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Declared.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Oracle.oracleSql
}

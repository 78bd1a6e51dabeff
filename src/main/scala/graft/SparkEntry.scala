package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{Declared, EtlDemo, Oracle}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every oracle-checked query surface of the engine: the
  * declared relational inventory (SURVEY §2.4), the ETL transform
  * semantics (§2.1 O11-O13), and the LLM-data-pipeline operators
  * (dedup / similarity / text analysis / multimodal). */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the TPC-H-Q5-shaped 6-way join + decimal aggregate. */
  def entry(spark: SparkSession): DataFrame =
    Declared.q05(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Declared.queries ++ graft.queries.Declared2.queries ++
      graft.queries.Declared3.queries ++ graft.queries.Declared4.queries ++
      graft.queries.Declared5.queries ++ graft.queries.Declared6.queries ++
      graft.queries.Declared7.queries ++ graft.queries.Declared8.queries ++
      EtlDemo.queries ++ graft.queries.Profiles.queries ++
      graft.text.TextAnalysis.queries ++ graft.dedup.Dedup.queries ++
      graft.sim.Similarity.queries ++ graft.multimodal.Multimodal.queries ++
      graft.queries.UnicodeParity.queries ++
      graft.queries.TxLogParity.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted only for the genuinely
    * non-SQL-expressible ops (minhash/simhash — Spark-xxhash64-dependent;
    * profile_hll — HLL sketch internals; sim_label_centroids —
    * float-order-sensitive VectorAvg) → driver records a rows-only check;
    * their semantics are invariant-tested in ScalaTest instead. The
    * cosine/LSH/multimodal queries ARE oracle-checked as of round 2
    * (see [[graft.queries.Oracle2]] for the bit-exactness argument). */
  def oracleSql: Map[String, String] =
    Oracle.oracleSql ++ graft.queries.Oracle2.oracleSql ++
      graft.queries.Oracle3.oracleSql ++ graft.queries.Oracle4.oracleSql ++
      graft.queries.Oracle5.oracleSql ++ graft.queries.Oracle6.oracleSql ++
      graft.queries.Oracle7.oracleSql ++ graft.queries.Oracle8.sql ++
      graft.queries.Oracle9.sql ++ graft.queries.Declared8.sql ++
      graft.queries.Profiles.oracleSql ++ graft.queries.TxLogParity.oracleSql
}

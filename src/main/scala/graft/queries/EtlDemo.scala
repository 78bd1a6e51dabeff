package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.etl.Transforms

/** Oracle-checked demonstrations of the ETL scalar transforms (SURVEY
  * §2.1 O11-O13) over the shared testdata tables, so the reference's
  * string semantics — Python capitalize, comma-job rewrite, name
  * prefix/suffix extraction — are covered by the driver's DuckDB gate in
  * addition to the golden ETL tests. Inputs are constructed from `part`
  * columns to exercise every branch. */
object EtlDemo {

  /** O12: job rewrite over a constructed "General, Specialization" string
    * (p_type has no commas, so appending one comma group gives the
    * exactly-two-parts shape; rows with p_size%5==0 get a comma-free job
    * to exercise the pass-through branch). */
  def jobRewrite(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val job = when($"p_size" % 5 === 0, $"p_type")
      .otherwise(concat($"p_type", lit(", "), $"p_brand"))
    Tables(s, dir, "part")
      .select($"p_partkey", job.as("job_raw"),
        Transforms.fixJob(job).as("job_fixed"),
        Transforms.pyCapitalize($"p_name").as("name_cap"))
      .orderBy($"p_partkey")
  }

  /** O13 + O11: name-part extraction over constructed 2-5 token names
    * (title/suffix presence varies by p_size), plus newline cleanup. */
  def nameParts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val name = concat(
      element_at(typedlit(Seq("Dr. ", "Mr. ", "", "Xx ")), ($"p_size" % 4).cast("int") + 1),
      $"p_name",
      element_at(typedlit(Seq(" PhD", "", " Jr.")), ($"p_size" % 3).cast("int") + 1))
    val parts = Transforms.nameParts(name)
    val addr = concat($"p_name", lit("\nline2"))
    Tables(s, dir, "part")
      .select($"p_partkey", name.as("name_raw"),
        parts.getField("prefix").as("prefix"),
        parts.getField("name").as("name_out"),
        parts.getField("suffix").as("suffix"),
        Transforms.addressClean(addr).as("addr_clean"))
      .orderBy($"p_partkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_job_rewrite" -> jobRewrite _,
    "etl_name_parts" -> nameParts _)
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** STORAGE-PARTITIONED JOINS: two txlog tables `PARTITIONED BY
  * (bucket(n, k))` report a `KeyGroupedPartitioning` over the
  * catalog-resolved `bucket` function ([[graft.storage.GraftFunctions]]),
  * so an equi-join on the bucket key plans WITHOUT any exchange —
  * the co-located join that makes a 100 TB fact⋈fact join a local
  * merge per bucket instead of a full-corpus shuffle. Opt-in via
  * `spark.sql.sources.v2.bucketing.enabled` (one partition per bucket
  * trades scan parallelism for exchange elimination). */
class TxSpjSpec extends AnyFunSuite {
  lazy val spark = {
    val s = TestSpark.spark
    val wh = Files.createTempDirectory("spj_wh_").toString
    s.conf.set("spark.sql.catalog.spjcat", "graft.storage.GraftCatalog")
    s.conf.set("spark.sql.catalog.spjcat.warehouse", wh)
    s
  }

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { kvs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def mk(name: String, n: Int, buckets: Int): Unit = {
    spark.sql(s"""CREATE TABLE spjcat.ns.$name (k BIGINT, v STRING)
                  USING txlog PARTITIONED BY (bucket($buckets, k))""")
    spark.sql(s"""INSERT INTO spjcat.ns.$name
                  SELECT id, concat('$name', id) FROM range($n)""")
  }

  test("co-bucketed join plans with ZERO exchange; results exact") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS spjcat.ns")
    mk("a", 5000, 8)
    mk("b", 3000, 8)
    def q() = spark.table("spjcat.ns.a").join(spark.table("spjcat.ns.b"), "k")
      .select(col("k"), col("a.v").as("va"), col("b.v").as("vb"))
    val expected = 3000L
    withConfs(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // conf OFF: ordinary shuffled join
      withConfs("spark.sql.sources.v2.bucketing.enabled" -> "false") {
        val plan = q().queryExecution.executedPlan.toString
        assert(plan.contains("Exchange hashpartitioning"),
          s"expected a shuffled join with SPJ off:\n$plan")
        assert(q().count() == expected)
      }
      // conf ON: the join consumes both scans' KeyGroupedPartitioning
      withConfs("spark.sql.sources.v2.bucketing.enabled" -> "true") {
        val df = q()
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange hashpartitioning"),
          s"expected an exchange-free storage-partitioned join:\n$plan")
        assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
          s"no join?\n$plan")
        assert(df.count() == expected)
        // row-identity to the shuffled plan
        val rows = df.orderBy("k").collect().map(_.toString).toSeq
        assert(rows.length == 3000 && rows.head.contains("a0") &&
          rows.head.contains("b0"))
      }
    }
  }

  test("groupBy on the bucket key aggregates without an exchange") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS spjcat.ns")
    mk("g", 4000, 8)
    withConfs(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.sources.v2.bucketing.enabled" -> "true") {
      val df = spark.table("spjcat.ns.g").groupBy("k")
        .agg(count(lit(1)).as("n"))
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected the bucket partitioning to satisfy the aggregation:\n$plan")
      assert(df.count() == 4000L)
    }
  }

  test("mismatched bucket counts fall back to a shuffled join, still exact") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS spjcat.ns")
    mk("c", 2000, 8)
    mk("d", 2000, 4)
    withConfs(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.sources.v2.bucketing.enabled" -> "true") {
      val df = spark.table("spjcat.ns.c").join(spark.table("spjcat.ns.d"), "k")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("Exchange hashpartitioning"),
        s"8 vs 4 buckets must not be judged co-partitioned:\n$plan")
      assert(df.count() == 2000L)
    }
  }

  test("bucket-grouped scan stays correct for plain reads and DML fallbacks") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS spjcat.ns")
    mk("e", 4000, 8)
    withConfs("spark.sql.sources.v2.bucketing.enabled" -> "true") {
      // plain read under bucket-grouped partitions
      assert(spark.table("spjcat.ns.e").count() == 4000L)
      assert(spark.table("spjcat.ns.e").where(col("k") === 7L).count() == 1L)
      // DML works (op scans never group); post-DML reads stay exact
      spark.sql("DELETE FROM spjcat.ns.e WHERE k % 10 = 3")
      assert(spark.table("spjcat.ns.e").count() == 3600L)
      // MoR DVs disable the grouping (packed-alone rule) but not reads
      spark.sql("ALTER TABLE spjcat.ns.e SET TBLPROPERTIES " +
        "('graft.dml.mode' = 'mergeOnRead')")
      spark.sql("DELETE FROM spjcat.ns.e WHERE k % 10 = 4")
      assert(spark.table("spjcat.ns.e").count() == 3200L)
    }
  }
}

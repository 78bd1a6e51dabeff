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

  test("partially-clustered distribution splits a skewed hot bucket across its files") {
    // r15: the scan emits one keyed partition PER FILE and Spark groups
    // them — so under partiallyClusteredDistribution the planner can
    // leave the larger side's splits ungrouped and replicate the small
    // side over them: the hot bucket fans across its files' tasks
    // instead of serializing the join on one partition.
    spark.sql("CREATE NAMESPACE IF NOT EXISTS spjcat.ns")
    mk("pd", 400, 4)
    spark.sql("""CREATE TABLE spjcat.ns.pf (k BIGINT, v STRING)
                 USING txlog PARTITIONED BY (bucket(4, k))""")
    // skew: ~90% of rows carry k=0; five inserts pile several files
    // onto the hot bucket
    (0 until 5).foreach { b =>
      spark.sql(s"""INSERT INTO spjcat.ns.pf
                    SELECT CASE WHEN id % 10 = 0 THEN id % 400 ELSE 0 END,
                           concat('f', id, '_', $b)
                    FROM range(2000)""")
    }
    def q() = spark.table("spjcat.ns.pf").join(spark.table("spjcat.ns.pd"), "k")
    withConfs(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.sources.v2.bucketing.enabled" -> "true") {
      // grouped baseline: one partition per bucket tuple
      val grouped = q()
      assert(!grouped.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
      val groupedParts = grouped.queryExecution.executedPlan.execute()
        .getNumPartitions
      assert(groupedParts <= 4, s"expected <=4 grouped partitions, $groupedParts")
      assert(grouped.count() == 10000L)
      withConfs(
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
        "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled" -> "true") {
        val df = q()
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange hashpartitioning"),
          s"partially-clustered must not reintroduce the shuffle:\n$plan")
        val parts = df.queryExecution.executedPlan.execute().getNumPartitions
        assert(parts > 4,
          s"the hot bucket must split across its files: $parts partitions")
        assert(df.count() == 10000L)
      }
    }
  }

  test("compatible bucket counts (8 over 4) join without a full exchange") {
    // r15: BucketBound is a ReducibleFunction — pmod(h,8) % 4 ==
    // pmod(h,4), so the 8-bucket side folds onto the 4-bucket layout
    // under allowCompatibleTransforms instead of shuffling both sides.
    spark.sql("CREATE NAMESPACE IF NOT EXISTS spjcat.ns")
    mk("ca", 2000, 8)
    mk("cb", 2000, 4)
    withConfs(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled" -> "true") {
      val df = spark.table("spjcat.ns.ca").join(spark.table("spjcat.ns.cb"), "k")
        .select(col("k"), col("ca.v").as("va"), col("cb.v").as("vb"))
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"8-over-4 buckets must fold, not shuffle:\n$plan")
      assert(df.count() == 2000L)
      val r = df.where(col("k") === 7L).first()
      assert(r.getString(1) == "ca7" && r.getString(2) == "cb7")
    }
  }

  test("storage-partitioned SHUFFLE: an unbucketed side shuffles TO the bucket layout") {
    // v2.bucketing.shuffle.enabled: joining a bucketed table with a
    // plain (unbucketed) relation shuffles ONLY the plain side, using
    // the catalog-resolved bucket function — the 100 TB fact table
    // never moves
    spark.sql("CREATE NAMESPACE IF NOT EXISTS spjcat.ns")
    mk("sf", 5000, 8)
    spark.sql("CREATE TABLE spjcat.ns.sd (k BIGINT, w STRING) USING txlog")
    spark.sql("INSERT INTO spjcat.ns.sd SELECT id, concat('w', id) FROM range(2500)")
    withConfs(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.shuffle.enabled" -> "true") {
      val df = spark.table("spjcat.ns.sf").join(spark.table("spjcat.ns.sd"), "k")
      val plan = df.queryExecution.executedPlan.toString
      val exchanges = "Exchange ".r.findAllIn(plan).length
      assert(exchanges <= 1,
        s"expected at most ONE exchange (the unbucketed side only):\n$plan")
      assert(df.count() == 2500L)
    }
  }

  test("join keys a SUBSET of a compound bucket layout still avoid the full exchange") {
    // allowJoinKeysSubsetOfPartitionKeys: tables laid out as
    // (bucket(4,k), bucket(4,j)) joined on k alone — the planner groups
    // the richer partitioning down to the join key instead of
    // shuffling both sides
    spark.sql("CREATE NAMESPACE IF NOT EXISTS spjcat.ns")
    def mk2(name: String, n: Int): Unit = {
      spark.sql(s"""CREATE TABLE spjcat.ns.$name (k BIGINT, j BIGINT, v STRING)
                    USING txlog PARTITIONED BY (bucket(4, k), bucket(4, j))""")
      spark.sql(s"""INSERT INTO spjcat.ns.$name
                    SELECT id, id % 97, concat('$name', id) FROM range($n)""")
    }
    mk2("ja", 3000)
    mk2("jb", 1500)
    withConfs(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.allowJoinKeysSubsetOfPartitionKeys.enabled" -> "true",
      // the subset mode is gated on this being false (SQLConf doc)
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false") {
      // both bucket sources stay in the scan output: a clustering whose
      // reference is pruned away is (correctly) not reported at all —
      // the documented safe fallback, not the case under test
      val df = spark.table("spjcat.ns.ja").join(spark.table("spjcat.ns.jb"), "k")
        .select(col("k"), col("ja.j").as("ja_j"), col("jb.j").as("jb_j"),
          col("ja.v").as("va"), col("jb.v").as("vb"))
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"join on a subset of the bucket tuple must not full-shuffle:\n$plan")
      assert(df.count() == 1500L)
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

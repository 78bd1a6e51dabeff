package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.TxLog

/** Manifest column statistics → CBO ([[TxLogScan.estimateStatistics]]
  * `columnStats`): per-column null counts, integral min/max and the
  * dense-key distinct bound flow from the manifest zone maps into
  * Spark's cost-based optimizer — so a FILTERED txlog scan gets a
  * real cardinality estimate and a join flips to broadcast WITHOUT
  * any ANALYZE TABLE ever running. */
class TxCboSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("txcbo_").resolve("t").toString

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { kvs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  // ~64 incompressible bytes per row, ONE file: the table's parquet
  // footprint must sit ABOVE the broadcast threshold AND zone-map file
  // pruning must be powerless (a single file always survives it), so
  // only the CBO column-stats ESTIMATE of the post-filter size can
  // flip the join — exactly the thing under test. (Multi-file builds
  // defeat the pin for the happy reason that static pruning alone
  // already shrinks the ranged scan.)
  private def build(t: String, n: Int): Unit = {
    val df = spark.range(n).select(col("id"),
      concat(md5(col("id").cast("string")),
        md5((col("id") + 1).cast("string"))).as("payload"))
    df.coalesce(1).write.format("txlog").mode("append").save(t)
  }

  test("column stats are served from the manifest: min/max/ndv/nulls visible to CBO") {
    val t = fresh()
    build(t, 50000)
    withConfs("spark.sql.cbo.enabled" -> "true") {
      val plan = spark.read.format("txlog").load(t).queryExecution.optimizedPlan
      val st = plan.stats
      assert(st.rowCount.contains(BigInt(50000)), s"rowCount ${st.rowCount}")
      val idStat = st.attributeStats.toSeq
        .collectFirst { case (a, cs) if a.name == "id" => cs }
      assert(idStat.isDefined, s"no column stats for id: ${st.attributeStats}")
      assert(idStat.get.min.contains(0L), s"min ${idStat.get.min}")
      assert(idStat.get.max.contains(49999L), s"max ${idStat.get.max}")
      assert(idStat.get.nullCount.contains(BigInt(0)))
      // dense surrogate key: the range bound IS the true NDV
      assert(idStat.get.distinctCount.contains(BigInt(50000)),
        s"ndv ${idStat.get.distinctCount}")
    }
  }

  test("a selective filter flips SMJ to broadcast under CBO — no ANALYZE") {
    val big = fresh(); val dim = fresh()
    build(big, 200000) // ~13 MB parquet — above the 1 MB test threshold
    build(dim, 40000)  // ~2.6 MB — also above it
    withConfs(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> (1L << 20).toString) {

      def planOf(): String = {
        val b = spark.read.format("txlog").load(big)
          .where(col("id") < 2000L) // 1% of the key range, provable from min/max
        val d = spark.read.format("txlog").load(dim)
        b.join(d, "id").groupBy().agg(count(lit(1)))
          .queryExecution.executedPlan.toString
      }
      withConfs("spark.sql.cbo.enabled" -> "false") {
        val p = planOf()
        assert(p.contains("SortMergeJoin"), s"expected SMJ without CBO:\n$p")
      }
      withConfs("spark.sql.cbo.enabled" -> "true") {
        val p = planOf()
        assert(p.contains("BroadcastHashJoin"),
          s"expected broadcast from manifest column stats under CBO:\n$p")
      }
    }
  }

  test("strings serve bounds to the estimator; NDV stays absent without a sketch") {
    val t = fresh()
    build(t, 10000)
    withConfs("spark.sql.cbo.enabled" -> "true") {
      val st = spark.read.format("txlog").load(t)
        .queryExecution.optimizedPlan.stats
      val pStat = st.attributeStats.toSeq
        .collectFirst { case (a, cs) if a.name == "payload" => cs }
      // r15: string min/max are served (truncated footer bounds are
      // fine for a COST MODEL — the exact-extrema meta-agg still
      // refuses them); distinct count stays empty without the opt-in
      // KMV sketch
      assert(pStat.exists(cs => cs.min.isDefined && cs.max.isDefined),
        s"$pStat")
      assert(pStat.forall(_.distinctCount.isEmpty), s"$pStat")
    }
  }

  test("opt-in KMV sketches serve a real NDV, merged across files and commits") {
    val t = fresh()
    val schema = spark.range(0).select(col("id"),
      concat(lit("g"), (col("id") % 37).cast("string")).as("grp")).schema
    TxLog.createTable(spark, t, schema,
      props = Map(TxLog.NdvColsProp -> "grp, id"))
    // three commits, several files each; grp has exactly 37 distincts,
    // id is dense-unique (50k — well past the sketch size, so the
    // ESTIMATOR path is exercised, not the exhaustive-union one)
    (0 until 3).foreach { b =>
      spark.range(b * 17000, (b + 1) * 17000 - (if (b == 2) 1000 else 0))
        .select(col("id"), concat(lit("g"), (col("id") % 37).cast("string")).as("grp"))
        .repartition(3)
        .write.format("txlog").mode("append").save(t)
    }
    withConfs("spark.sql.cbo.enabled" -> "true") {
      val st = spark.read.format("txlog").load(t)
        .queryExecution.optimizedPlan.stats
      def ndvOf(n: String): Option[BigInt] = st.attributeStats.toSeq
        .collectFirst { case (a, cs) if a.name == n => cs }.flatMap(_.distinctCount)
      // small-cardinality string column: exact (union under k)
      assert(ndvOf("grp").contains(BigInt(37)), s"grp ndv ${ndvOf("grp")}")
      // high-cardinality key: KMV estimate within ±20% of 50,000
      val idNdv = ndvOf("id").map(_.toLong).getOrElse(0L)
      assert(idNdv > 40000L && idNdv < 60000L, s"id ndv $idNdv")
    }
  }

  test("a string-keyed join flips to broadcast from manifest sketches alone") {
    val big = fresh(); val dim = fresh()
    def strDf(n: Int) = spark.range(n).select(
      md5(col("id").cast("string")).as("skey"),
      concat(md5((col("id") + 7).cast("string")),
        md5((col("id") + 8).cast("string"))).as("payload"))
    val schema = strDf(0).schema
    // single-file tables (zone pruning provably isn't the cause) with
    // the NDV opt-in declared BEFORE the data lands
    TxLog.createTable(spark, big, schema, props = Map(TxLog.NdvColsProp -> "skey"))
    TxLog.createTable(spark, dim, schema, props = Map(TxLog.NdvColsProp -> "skey"))
    strDf(200000).coalesce(1).write.format("txlog").mode("append").save(big)
    strDf(40000).coalesce(1).write.format("txlog").mode("append").save(dim)
    withConfs(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> (1L << 20).toString) {
      def planOf(): String = {
        val d = spark.read.format("txlog").load(dim)
        // a string-equality filter: selectivity 1/ndv — estimable ONLY
        // because the sketch serves a distinct count for skey
        val probe = spark.read.format("txlog").load(big)
          .where(col("skey") === md5(lit("42")))
        probe.join(d, "skey").groupBy().agg(count(lit(1)))
          .queryExecution.executedPlan.toString
      }
      withConfs("spark.sql.cbo.enabled" -> "false") {
        val p = planOf()
        assert(p.contains("SortMergeJoin"), s"expected SMJ without CBO:\n$p")
      }
      withConfs("spark.sql.cbo.enabled" -> "true") {
        val p = planOf()
        assert(p.contains("BroadcastHashJoin"),
          s"expected broadcast from the string NDV sketch under CBO:\n$p")
      }
    }
  }

  test("column stats survive a rename (mapping translates to physical stats)") {
    val t = fresh()
    build(t, 20000)
    TxLog.renameColumn(spark, t, "id", "key")
    withConfs("spark.sql.cbo.enabled" -> "true") {
      val st = spark.read.format("txlog").load(t)
        .queryExecution.optimizedPlan.stats
      val kStat = st.attributeStats.toSeq
        .collectFirst { case (a, cs) if a.name == "key" => cs }
      assert(kStat.isDefined, s"${st.attributeStats}")
      assert(kStat.get.max.contains(19999L), s"${kStat.get.max}")
    }
  }
}

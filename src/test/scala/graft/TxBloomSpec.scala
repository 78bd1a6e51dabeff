package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

import graft.storage.{TxBloom, TxLog}

/** Bloom-filter point-lookup file skipping (the `bloomCols` table
  * property): staged files carry parquet split-block bloom filters for
  * the opted-in columns, and equality/IN probes drop zone-map-surviving
  * files whose blooms prove the value absent. Every file here holds
  * sentinel keys spanning the whole string range, so min/max zone maps
  * provably keep everything and any skipping observed is the blooms'. */
class TxBloomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("txbloom_").resolve("t").toString

  /** One file per call: 300 unique keys `u-<file>-<row>` plus range
    * sentinels "a!" and "zz!" so every file's zone map spans [a!, zz!]. */
  private def batch(fileNo: Int): DataFrame =
    ((0 until 300).map(j => (f"u-$fileNo%02d-$j%04d", (fileNo * 1000 + j).toLong, s"f$fileNo"))
      :+ (("a!", fileNo * 1000L + 900, s"f$fileNo"))
      :+ (("zz!", fileNo * 1000L + 901, s"f$fileNo")))
      .toDF("key", "id", "grp")

  /** 6-file table blooming `key`, small ndv so filters stay KB-sized. */
  private def bloomTable(): String = {
    val t = freshTable()
    TxLog.setProperties(spark, t, Map(
      TxBloom.BloomColsProp -> "key", TxBloom.BloomNdvProp -> "1000"))
    (0 until 6).foreach(i => TxLog.commit(batch(i).coalesce(1), t, "w", i.toLong))
    t
  }

  private def dataFiles(t: String): Seq[java.io.File] = {
    def walk(d: java.io.File): Seq[java.io.File] =
      Option(d.listFiles).toSeq.flatten.flatMap(f =>
        if (f.isDirectory) walk(f) else Seq(f))
    walk(new java.io.File(t, "data")).filter(_.getName.endsWith(".parquet"))
  }

  private def bloomOf(f: java.io.File, col: String): Boolean = {
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(
      new Path(f.getAbsolutePath), spark.sparkContext.hadoopConfiguration))
    try r.getFooter.getBlocks.asScala.forall { b =>
      b.getColumns.asScala.find(_.getPath.toDotString == col)
        .exists(cc => r.readBloomFilter(cc) != null)
    } finally r.close()
  }

  test("staged files carry blooms for bloomCols and only those columns") {
    val t = bloomTable()
    val fs = dataFiles(t)
    assert(fs.nonEmpty)
    assert(fs.forall(bloomOf(_, "key")), "every staged file must bloom `key`")
    assert(!fs.exists(bloomOf(_, "grp")), "non-bloom columns stay bloom-free")
  }

  test("the V2 writer path (format(\"txlog\")) blooms too") {
    val t = freshTable()
    TxLog.setProperties(spark, t, Map(
      TxBloom.BloomColsProp -> "key", TxBloom.BloomNdvProp -> "1000"))
    batch(0).coalesce(1).write.format("txlog").mode("append").save(t)
    assert(dataFiles(t).forall(bloomOf(_, "key")))
  }

  test("a point lookup prunes files zone maps cannot, and stays row-identical") {
    val t = bloomTable()
    val df = spark.read.format("txlog").load(t)
    TxBloom.lastPrune.set((0, 0))
    val got = df.where($"key" === "u-03-0123").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(3123L))
    val (kept, cand) = TxBloom.lastPrune.get()
    assert(cand == 6, s"zone maps must keep all 6 (sentinels overlap), got $cand candidates")
    assert(kept < cand, s"blooms must drop files ($kept/$cand kept)")
    assert(kept >= 1)
  }

  test("IN probes prune to the union of their values' files") {
    val t = bloomTable()
    val df = spark.read.format("txlog").load(t)
    TxBloom.lastPrune.set((0, 0))
    val got = df.where($"key".isin("u-01-0007", "u-04-0008")).collect()
    assert(got.map(_.getLong(1)).toSeq.sorted == Seq(1007L, 4008L))
    val (kept, cand) = TxBloom.lastPrune.get()
    assert(cand == 6 && kept < cand, s"($kept/$cand)")
  }

  test("a probe for an absent value keeps (almost) nothing and returns zero rows") {
    val t = bloomTable()
    val df = spark.read.format("txlog").load(t)
    TxBloom.lastPrune.set((0, 0))
    assert(df.where($"key" === "u-99-9999").count() == 0L)
    val (kept, cand) = TxBloom.lastPrune.get()
    assert(cand == 6 && kept <= 1, s"expected ~0 survivors, got $kept/$cand")
  }

  test("long-typed bloom columns probe too") {
    val t = freshTable()
    TxLog.setProperties(spark, t, Map(
      TxBloom.BloomColsProp -> "id", TxBloom.BloomNdvProp -> "1000"))
    // ids interleave mod 4 so every file's [min,max] spans the domain
    (0 until 4).foreach { i =>
      TxLog.commit((0 until 300).map(j => ((j * 4 + i).toLong, s"f$i"))
        .toDF("id", "grp").coalesce(1), t, "w", i.toLong)
    }
    val df = spark.read.format("txlog").load(t)
    TxBloom.lastPrune.set((0, 0))
    assert(df.where($"id" === 402L).select($"grp").collect()
      .map(_.getString(0)).toSeq == Seq("f2")) // 402 = 100*4 + 2
    val (kept, cand) = TxBloom.lastPrune.get()
    assert(cand == 4 && kept < cand, s"($kept/$cand)")
  }

  test("pre-widen files keep their bloom skipping after ALTER COLUMN TYPE") {
    // r15: a widened column's predicates carry the WIDE literal; the
    // cross-width probe hashes the narrow rendering the old files used
    // when the value fits, so INT32-era blooms still skip — and a
    // beyond-int probe of an int file degrades to keep (sound floor)
    val t = freshTable()
    TxLog.setProperties(spark, t, Map(
      TxBloom.BloomColsProp -> "id", TxBloom.BloomNdvProp -> "1000"))
    // INT-typed id, interleaved mod 4 so zone maps are useless
    (0 until 4).foreach { i =>
      TxLog.commit((0 until 300).map(j => (j * 4 + i, s"f$i"))
        .toDF("id", "grp").coalesce(1), t, "w", i.toLong)
    }
    TxLog.widenColumnType(spark, t, "id",
      org.apache.spark.sql.types.LongType)
    // one post-widen INT64 file, same interleave
    TxLog.commit((0 until 300).map(j => (5000000000L + j, "f9"))
      .toDF("id", "grp").coalesce(1), t, "w", 9L)
    val df = spark.read.format("txlog").load(t)
    TxBloom.lastPrune.set((0, 0))
    // long literal that fits int: the 4 old files' blooms probe via the
    // int rendering — only the matching file survives (+ the new file
    // is zone-pruned before blooms see it)
    assert(df.where($"id" === 402L).select($"grp").collect()
      .map(_.getString(0)).toSeq == Seq("f2"))
    val (kept, cand) = TxBloom.lastPrune.get()
    assert(kept < cand, s"widened probes must still skip ($kept/$cand)")
    // beyond-int probe: zone maps already isolate the new file; the
    // result stays exact either way
    assert(df.where($"id" === 5000000042L).count() == 1L)
  }

  test("DML with an equality predicate narrows its candidates through the blooms") {
    val t = bloomTable()
    TxBloom.lastPrune.set((0, 0))
    val r = TxLog.delete(spark, t, $"key" === "u-02-0042", "del", 0L)
    val (kept, cand) = TxBloom.lastPrune.get()
    assert(cand == 6 && kept < cand, s"($kept/$cand)")
    assert(r.removedFiles == 1, "only the holding file rewrites")
    val df = spark.read.format("txlog").load(t)
    assert(df.where($"key" === "u-02-0042").count() == 0L)
    assert(df.count() == 6 * 302L - 1)
  }

  test("tables without bloomCols never pay the probe") {
    val t = freshTable()
    (0 until 3).foreach(i => TxLog.commit(batch(i).coalesce(1), t, "w", i.toLong))
    TxBloom.lastPrune.set((-1, -1))
    assert(spark.read.format("txlog").load(t)
      .where($"key" === "u-01-0001").count() == 1L)
    assert(TxBloom.lastPrune.get() == ((-1, -1)), "no probe must have run")
  }

  test("a probe that blows up on one file degrades to KEEP, never fails the scan planning") {
    // the degrade-to-keep contract covers the WHOLE per-file probe:
    // any escape (not just open/readBloomFilter) must keep the file,
    // not surface through parFilter and kill planning (r12 review)
    val t = bloomTable()
    // garble one live data file in place: footer unreadable
    val root = new org.apache.hadoop.fs.Path(t)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataFile = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(root, "data"), true)
      var p: org.apache.hadoop.fs.Path = null
      while (it.hasNext && p == null) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet")) p = st.getPath
      }
      p
    }
    val out = fs.create(dataFile, true)
    out.write("not parquet at all".getBytes); out.close()
    TxBloom.lastPrune.set((0, 0))
    // planning alone: build the pruned scan without executing it. The
    // probed key lives in NO file, so every healthy bloom proves it
    // absent — the ONLY file kept is the corrupt one (degrade-to-keep)
    val plan = spark.read.format("txlog").load(t)
      .where($"key" === "u-99-0000").queryExecution.executedPlan
    assert(plan != null)
    val (kept, cand) = TxBloom.lastPrune.get()
    assert(cand == 6, s"probe must have run over all 6 files, got $cand")
    assert(kept == 1, s"exactly the corrupt file must be KEPT (degrade), got kept=$kept")
  }
}

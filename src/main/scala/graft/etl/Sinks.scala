package graft.etl

import java.io.{BufferedWriter, FileOutputStream, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter
import java.util.Locale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** O14 CSV sink. Two modes (SURVEY.md §4.3, §7.6):
  *
  *  - FIDELITY: reference-faithful single-file append with header-once
  *    (v2 `tell()==0` semantics, `main2.py:307-315`; v1's
  *    write-header-every-run duplicate-header bug is deliberately NOT
  *    reproduced — divergence D5). Python csv excel dialect:
  *    QUOTE_MINIMAL + CRLF. Rows stream through `toLocalIterator`, so the
  *    driver holds one partition at a time — the sink is driver-side by
  *    nature (append + header-once to ONE file is inherently sequential),
  *    which is exactly why scale mode exists.
  *
  *  - SCALE: distributed `df.write.csv` append — one part-file per task,
  *    header per file, no driver bottleneck; the mode to use on a real
  *    cluster where "one growing CSV" is an anti-pattern.
  */
object CsvSink {

  /** df must already be projected to string columns in final order.
    * collect() (one job) rather than toLocalIterator (one job per
    * partition — measured as the dominant overhead of a 20k-file run):
    * fidelity mode's single-growing-file semantic already implies the
    * result fits driver memory; scale mode is the unbounded path. */
  def appendFidelity(df: DataFrame, outFile: String): Unit = {
    val path = Paths.get(outFile)
    val needHeader = !Files.exists(path) || Files.size(path) == 0
    val w = new BufferedWriter(new OutputStreamWriter(
      new FileOutputStream(outFile, true), StandardCharsets.UTF_8))
    try {
      if (needHeader) w.write(PyFormat.csvLine(df.columns.toSeq) + "\r\n")
      df.collect().foreach { row =>
        val fields = (0 until row.length).map(i =>
          if (row.isNullAt(i)) "" else row.getString(i))
        w.write(PyFormat.csvLine(fields) + "\r\n")
      }
    } finally w.close()
  }

  def appendScale(df: DataFrame, outDir: String): Unit =
    df.write.mode("append").option("header", "true").csv(outDir)
}

/** O6 error-log sink: `DD/MM/YYYY hh:mm:ss AM/PM, ERROR, SCHEMA ERR,
  * <path>, <msg>` lines appended to errors.log (`main.py:48-56,127-130`).
  * The reference's infinite retry loop on IO error is an availability
  * hazard, not a semantic — normal failure semantics here (divergence D3).
  * Timestamps are write-time wall clock, as in the reference; golden
  * comparisons match on (class, field, filename), not prose/time
  * (SURVEY §7.4).
  *
  * Two modes, mirroring CsvSink: FIDELITY appends ordered lines to the
  * single reference-shaped log file (driver-side by nature); SCALE
  * writes the same line format as a distributed text append under
  * `<logFile>.d/` — the invalid set never touches the driver, so a
  * majority-invalid corpus (bad upstream) cannot OOM it. */
object ErrorLogSink {
  private val fmt = DateTimeFormatter.ofPattern("dd/MM/yyyy hh:mm:ss a", Locale.ENGLISH)

  /** rows: (src_path, errMsg), already ordered. */
  def append(rows: Seq[(String, String)], logFile: String): Unit = {
    if (rows.isEmpty) return
    val w = new BufferedWriter(new OutputStreamWriter(
      new FileOutputStream(logFile, true), StandardCharsets.UTF_8))
    try rows.foreach { case (path, msg) =>
      val ts = LocalDateTime.now().format(fmt)
      w.write(s"$ts, ERROR, SCHEMA ERR, $path, $msg\n")
    } finally w.close()
  }

  /** invalid: (src_path, errMsg) DataFrame; lines land as text part
    * files under logDir. Timestamps are executor write-time wall clock
    * (same semantic as the reference's append-time stamp); Spark's
    * `date_format` renders the identical `dd/MM/yyyy hh:mm:ss a`
    * pattern codegen'd, so the whole sink is one distributed
    * projection + append with no driver materialization. */
  def appendDistributed(invalid: DataFrame, logDir: String): Unit =
    invalid
      .select(concat(
        date_format(current_timestamp(), "dd/MM/yyyy hh:mm:ss a"),
        lit(", ERROR, SCHEMA ERR, "), col("src_path"),
        lit(", "), col("errMsg")).as("value"))
      .write.mode("append").text(logDir)
}

/** O7 quarantine sink: copy (not move — `shutil.copy`, `main.py:34-38`)
  * each offending source file verbatim into the quarantine dir, creating
  * it on demand.
  *
  * FIDELITY mode keeps the reference's driver-side NIO copy over the
  * collected (small) invalid list; SCALE mode ships the path list to the
  * executors and copies through the Hadoop FileSystem API inside
  * `foreachPartition` — file bytes and path lists both stay off the
  * driver, and the FS abstraction covers local disk, HDFS, or object
  * stores alike (SURVEY §2.1 O7's named alternative). */
object QuarantineSink {
  def copyAll(srcPaths: Seq[String], quarantineDir: String): Unit = {
    if (srcPaths.nonEmpty) Files.createDirectories(Paths.get(quarantineDir))
    srcPaths.foreach { p =>
      val src: Path = Paths.get(p)
      Files.copy(src, Paths.get(quarantineDir).resolve(src.getFileName),
        StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** srcPaths: single-string-column DataFrame of offending file paths
    * (pre-deduplicated). Each task copies its partition's files; the
    * Hadoop Configuration is rebuilt per task from defaults, which is
    * correct for any FS reachable by URI from the executors. */
  def copyAllDistributed(srcPaths: DataFrame, quarantineDir: String): Unit = {
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.{FileUtil, Path => HPath}
    val enc = org.apache.spark.sql.Encoders.STRING
    srcPaths.as(enc).foreachPartition { (it: Iterator[String]) =>
      if (it.hasNext) {
        val conf = new Configuration()
        val qd = new HPath(quarantineDir)
        val qfs = qd.getFileSystem(conf)
        // verbatim copy: no client-side .crc sidecars next to the
        // quarantined files (no-op where checksums are FS-internal)
        qfs.setWriteChecksum(false)
        qfs.mkdirs(qd)
        it.foreach { p =>
          val src = new HPath(p)
          FileUtil.copy(src.getFileSystem(conf), src,
            qfs, new HPath(qd, src.getName), false, true, conf)
        }
      }
    }
  }
}

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
  * (SURVEY §7.4). */
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
}

/** O7 quarantine sink: copy (not move — `shutil.copy`, `main.py:34-38`)
  * each offending source file verbatim into the quarantine dir, creating
  * it on demand. File-granular side effect → driver-side NIO by design
  * (SURVEY §2.1 O7); at 100 TB scale the equivalent is a distributed
  * `binaryFile` read + write of the quarantine set. */
object QuarantineSink {
  def copyAll(srcPaths: Seq[String], quarantineDir: String): Unit = {
    if (srcPaths.nonEmpty) Files.createDirectories(Paths.get(quarantineDir))
    srcPaths.foreach { p =>
      val src: Path = Paths.get(p)
      Files.copy(src, Paths.get(quarantineDir).resolve(src.getFileName),
        StandardCopyOption.REPLACE_EXISTING)
    }
  }
}

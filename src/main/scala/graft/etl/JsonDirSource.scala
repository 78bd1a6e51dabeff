package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Note two inherited Spark file-listing conventions (documented
  * divergences, D7-spirit): paths starting with `_` or `.` are treated
  * as hidden and skipped (the reference's endswith('.json') would
  * process them), and Spark lists files before the glob filter so only
  * visible `*.json` files count. */

/** O1/O2: per-FILE JSON event source.
  *
  * The reference scans a flat directory non-recursively, keeps `*.json`
  * names only (skipped files are NOT counted — `main.py:163-167`), and
  * treats each file as one record. We read with the `wholetext` text
  * source so the raw file text and its path stay paired — required for
  * quarantine (verbatim file copy, O7) and the error log (per-file
  * message, O6). A multiline JSON reader would lose that pairing
  * (SURVEY.md §1.4).
  *
  * Scale note (§7.6): wholetext is one task per file — exactly right for
  * the file-per-record model (embarrassingly parallel, no shuffle). For
  * 100 TB of small files the knobs are
  * `spark.sql.files.maxPartitionBytes` / `openCostInBytes` (Spark packs
  * many small files into one task) and driver-side listing batches; the
  * plan itself is unchanged on a 1000-executor cluster.
  */
object JsonDirSource {

  /** → DataFrame(src_path: String, value: String), deterministically
    * ordered downstream by src_path (divergence D1: the reference's row
    * order is os.walk's, which is nondeterministic). */
  /** input_file_name() returns a percent-ENCODED file: URI — a plain
    * prefix strip would leave "%20" in paths with spaces, and the
    * quarantine copy / error log would then reference nonexistent files.
    * java.net.URI.getPath decodes correctly (and, unlike URLDecoder,
    * leaves literal '+' alone). Shared with the streaming source. */
  val uriToPath = udf { (raw: String) =>
    try new java.net.URI(raw).getPath
    catch { case _: Exception => raw.replaceFirst("^file:(//)?", "") }
  }

  def read(spark: SparkSession, dataDir: String): DataFrame = {
    // Event files are ~hundreds of bytes; the default 4 MB per-file open
    // cost would scatter a 20k-file corpus over ~600 tasks of ~30 files
    // each — task overhead swamps the work. 64 KB keeps partition counts
    // proportional to real IO+parse cost while still fanning out.
    // (Session-global by necessity — it is consulted at ACTION time, not
    // read time; EntityPipeline restores the previous value after its
    // actions complete.)
    spark.conf.set("spark.sql.files.openCostInBytes", (64 * 1024).toString)
    spark.read
      .option("wholetext", "true")
      .option("pathGlobFilter", "*.json")
      .option("recursiveFileLookup", "false")
      .text(dataDir)
      .select(uriToPath(input_file_name()).as("src_path"), col("value"))
  }
}

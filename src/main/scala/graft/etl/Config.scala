package graft.etl

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** O17 pipeline config. The reference hardcodes a per-entity dict
  * (`main.py:17-31`, `main2.py:16-32`) and DECLARES an equivalent TOML
  * shape that is never wired (`config.toml:15-27`; the `toml` import is
  * commented out at `main.py:6`). We make the declared surface real with a
  * minimal hand-rolled TOML-subset parser (offline deps — no TOML library
  * resolves, SURVEY §7.2 step 6).
  *
  * Subset: `[[data]]` table-arrays, `key = "string"` / `key = true|false`
  * pairs, `#` comments, blank lines. Entity order = file order (the
  * reference's dict preserves insertion order).
  */
final case class EntityConf(
    name: String,
    schemaFile: String,
    dataDir: String,
    outputFile: String,
    metadataFile: Option[String],
    quarantineDir: String,
    replaceMissingData: Boolean = true)

object Config {

  /** The reference's hardcoded v1/v2 config (users then cards), rooted at
    * `baseDir`. v2 points both entities' metadata_file at ONE shared
    * metadata.csv (`main2.py:21,29` — the unified metadata dimension). */
  def builtin(baseDir: String, mode: EtlMode,
              replaceMissingData: Boolean = true): Seq[EntityConf] = {
    def p(s: String) = Paths.get(baseDir, s).toString
    val meta = if (mode == V2) Some(p("metadata.csv")) else None
    Seq(
      EntityConf("users", p("user-events-schema.json"), p("users"),
        p("users.csv"), meta, p("users_schema_mismatches"), replaceMissingData),
      EntityConf("cards", p("card-events-schema.json"), p("cards"),
        p("cards.csv"), meta, p("cards_schema_mismatches"), replaceMissingData))
  }

  /** Parse the declared TOML shape (`config.toml` spec comments lines
    * 1-13). Paths in the file are relative to `baseDir`, like the
    * reference's CWD-relative layout. */
  def fromToml(tomlPath: String, baseDir: String, mode: EtlMode): Seq[EntityConf] = {
    val entries = TomlSubset.parseTableArray(tomlPath, "data")
    entries.map { kv =>
      def req(k: String) = kv.getOrElse(k,
        sys.error(s"config $tomlPath: missing key '$k' in [[data]] entry"))
      def p(s: String) = Paths.get(baseDir, s).toString
      EntityConf(
        name = req("name"),
        schemaFile = p(req("schema_file")),
        dataDir = p(req("data_dir")),
        outputFile = p(req("output_file")),
        metadataFile = kv.get("metadata_file").map(p)
          .orElse(if (mode == V2) Some(p("metadata.csv")) else None),
        quarantineDir = p(req("schema_mismatch_dir")),
        replaceMissingData = kv.get("replace_missing_data").forall(_ == "true"))
    }
  }
}

/** Minimal TOML subset parser (strings, booleans, comments, [[table]]
  * arrays). Deliberately tiny — parse only what the declared config shape
  * uses. */
object TomlSubset {

  def parseTableArray(path: String, tableName: String): Seq[Map[String, String]] = {
    val lines = Files.readAllLines(Paths.get(path)).asScala.toSeq
    var entries = Vector.empty[Map[String, String]]
    var current: Option[Map[String, String]] = None
    var inTarget = false
    val kvRe = """^\s*([A-Za-z0-9_-]+)\s*=\s*(.+?)\s*$""".r
    val tableRe = """^\s*\[\[\s*([A-Za-z0-9_.-]+)\s*\]\]\s*$""".r
    // single-bracket [table] headers end the current [[...]] scope —
    // without this, a following plain table's keys would silently be
    // absorbed into (and overwrite) the last table-array entry
    val plainTableRe = """^\s*\[[^\[\]]+\]\s*$""".r

    def flush(): Unit = { current.foreach(m => entries :+= m); current = None }

    for (raw <- lines) {
      val line = stripComment(raw)
      if (line.trim.nonEmpty) line match {
        case tableRe(name) =>
          flush()
          inTarget = name == tableName
          if (inTarget) current = Some(Map.empty)
        case plainTableRe() =>
          flush()
          inTarget = false
        case kvRe(k, v) if inTarget =>
          current = current.map(_ + (k -> parseValue(v)))
        case _ => // keys outside our table, or other TOML we don't model
      }
    }
    flush()
    entries
  }

  private def stripComment(line: String): String = {
    // '#' starts a comment unless inside a basic string; an escaped \"
    // inside a basic string must not toggle the string scope
    var inStr = false
    var escaped = false
    val sb = new StringBuilder
    for (ch <- line) {
      if (escaped) { escaped = false; sb += ch }
      else if (inStr && ch == '\\') { escaped = true; sb += ch }
      else if (ch == '"') { inStr = !inStr; sb += ch }
      else if (ch == '#' && !inStr) return sb.toString
      else sb += ch
    }
    sb.toString
  }

  private def parseValue(v: String): String = {
    val t = v.trim
    if (t.length >= 2 && t.head == '"' && t.last == '"')
      t.substring(1, t.length - 1)
        .replace("\\\"", "\"").replace("\\\\", "\\")
        .replace("\\n", "\n").replace("\\t", "\t")
    else t // bare booleans/numbers kept as text
  }
}

package graft.storage

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Partition SPEC language of txlog tables: identity plus the
  * Iceberg-style temporal/bucket transforms, so a 100 TB table can be
  * laid out `PARTITIONED BY (days(ts), bucket(32, user_id))` and the
  * manifest prunes scans on the TRANSFORMED values without ever
  * listing directories.
  *
  * A spec is the string recorded in the manifest's `pcols` — identity
  * fields are the bare column name (byte-compatible with every
  * pre-transform manifest), transforms render canonically as
  * `days(col)` / `months(col)` / `years(col)` / `hours(col)` /
  * `bucket(n,col)`.
  *
  * Three evaluation paths MUST agree bit-for-bit on the partition
  * value, and each is exact integer arithmetic (never a double in the
  * value path):
  *   1. staging SQL ([[Field.columnSql]]) — the driver's
  *      `stagePartitioned` and the DML rewrite repartitioning,
  *   2. the executor row renderer ([[Field.render]]) — the V2 rolling
  *      writer's hive path segments,
  *   3. the prune-time literal transform ([[Field.boundOf]]) — maps a
  *      predicate bound on the SOURCE column into the partition-value
  *      domain.
  * Temporal transforms are defined in UTC straight off the Catalyst
  * internal value (epoch days for DATE, epoch micros for TIMESTAMP),
  * so no session-timezone setting can desynchronize the three.
  * Buckets are Spark's own `hash()` (Murmur3, seed 42) mod n, so a
  * user can reproduce the bucket of a row with plain
  * `pmod(hash(col), n)`. */
object TxPart {

  /** Hive's null-partition path token (a transform of a NULL source is
    * NULL and stages under this segment, exactly like identity). */
  private val NullToken =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.DEFAULT_PARTITION_NAME

  private val MicrosPerDay = 86400000000L
  private val MicrosPerHour = 3600000000L

  sealed trait Field {
    /** Canonical manifest/DDL string of this field. */
    def spec: String
    /** The SOURCE data column the transform reads. */
    def source: String
    /** The `__p_<phys>` key the hive path segment (and so the per-file
      * `pv` metadata) is recorded under. */
    def phys: String
    /** Declaration-time type check (loud — a partition layout the
      * writers cannot render must never reach a manifest). */
    def validate(dt: DataType): Unit
    /** Staging expression: the partition VALUE of each row, as SQL over
      * the (backtick-escaped) source column. NULL source -> NULL. */
    def columnSql(dt: DataType): String
    /** Executor-side render of one NON-NULL internal value (the exact
      * hive segment string the staging SQL would produce). */
    def render(raw: Any, dt: DataType): String
    /** Prune-time transform of a comparison-domain bound (TxStats'
      * "i" = long-widened integral/date-days/timestamp-micros, "s" =
      * java String) into the partition-value domain; None = this
      * field cannot interpret the bound (keep the file). */
    def boundOf(tag: String, v: Any, dt: DataType): Option[Long]
    /** Monotone non-decreasing in the source ordering? (range
      * predicates on the source then prune the partition value). */
    def monotone: Boolean
  }

  private def esc(n: String): String = "`" + n.replace("`", "``") + "`"

  /** Exact floorDiv as SQL: pmod is non-negative, so the numerator is
    * an exact multiple and integral DIV is floorDiv for either sign —
    * no double ever enters the value path. */
  private def floorDivSql(inner: String, d: Long): String =
    s"(($inner - pmod($inner, ${d}L)) DIV ${d}L)"

  /** Epoch-day SQL of a date/timestamp source. */
  private def epochDaysSql(n: String, dt: DataType): String = dt match {
    case DateType => s"datediff(${esc(n)}, DATE'1970-01-01')"
    case _ => s"CAST(${floorDivSql(s"unix_micros(${esc(n)})", MicrosPerDay)} AS INT)"
  }
  /** A DATE column carrying the source's UTC calendar day. */
  private def utcDateSql(n: String, dt: DataType): String = dt match {
    case DateType => esc(n)
    case _ => s"date_add(DATE'1970-01-01', ${epochDaysSql(n, dt)})"
  }

  private def epochDaysOf(tag: String, v: Any, dt: DataType): Option[Long] =
    (tag, dt) match {
      case ("i", DateType) => Some(v.asInstanceOf[Long])
      case ("i", TimestampType) =>
        Some(Math.floorDiv(v.asInstanceOf[Long], MicrosPerDay))
      case _ => None
    }

  final case class Identity(source: String) extends Field {
    def spec: String = source
    def phys: String = source
    def validate(dt: DataType): Unit =
      require(TxLog.partitionableType(dt),
        s"cannot partition by $source: $dt has no unambiguous hive path form " +
          "(supported: string, byte/short/int/long, boolean, date)")
    def columnSql(dt: DataType): String = esc(source)
    def render(raw: Any, dt: DataType): String = dt match {
      case DateType => java.time.LocalDate.ofEpochDay(
        raw.asInstanceOf[Int].toLong).toString
      case _ => raw.toString
    }
    def boundOf(tag: String, v: Any, dt: DataType): Option[Long] = None
    def monotone: Boolean = false
  }

  /** `days`/`months`/`years` of a DATE or TIMESTAMP source, `hours` of
    * a TIMESTAMP — each the count since the epoch (UTC), rendered as a
    * plain integer path segment. All monotone in the source. */
  final case class Temporal(unit: String, source: String) extends Field {
    def spec: String = s"$unit($source)"
    def phys: String = s"${source}_$unit"
    def validate(dt: DataType): Unit = dt match {
      case TimestampType => ()
      case DateType if unit != "hours" => ()
      case _ => throw new IllegalArgumentException(
        s"cannot partition by $spec: $unit() needs a " +
          (if (unit == "hours") "timestamp" else "date or timestamp") +
          s" source, got $dt")
    }
    def columnSql(dt: DataType): String = unit match {
      case "days" => epochDaysSql(source, dt)
      case "hours" =>
        s"CAST(${floorDivSql(s"unix_micros(${esc(source)})", MicrosPerHour)} AS INT)"
      case "months" =>
        val d = utcDateSql(source, dt)
        s"CAST((year($d) - 1970) * 12 + month($d) - 1 AS INT)"
      case "years" => s"CAST(year(${utcDateSql(source, dt)}) - 1970 AS INT)"
    }
    private def fromDays(days: Long): Long = {
      val d = java.time.LocalDate.ofEpochDay(days)
      unit match {
        case "months" => (d.getYear - 1970).toLong * 12 + d.getMonthValue - 1
        case "years" => (d.getYear - 1970).toLong
        case _ => days
      }
    }
    def render(raw: Any, dt: DataType): String = {
      val v = dt match {
        case DateType => fromDays(raw.asInstanceOf[Int].toLong)
        case _ =>
          val micros = raw.asInstanceOf[Long]
          if (unit == "hours") Math.floorDiv(micros, MicrosPerHour)
          else fromDays(Math.floorDiv(micros, MicrosPerDay))
      }
      v.toString
    }
    def boundOf(tag: String, v: Any, dt: DataType): Option[Long] =
      if (unit == "hours") (tag, dt) match {
        case ("i", TimestampType) =>
          Some(Math.floorDiv(v.asInstanceOf[Long], MicrosPerHour))
        case _ => None
      }
      else epochDaysOf(tag, v, dt).map(fromDays)
    def monotone: Boolean = true
  }

  /** `bucket(n, col)`: Spark `hash()` (Murmur3, seed 42) mod n. Only
    * EQUALITY on the source prunes (the hash is order-destroying);
    * that is exactly the probe shape zone maps cannot serve — every
    * file of a key-ordered-by-ingest table spans the full key range,
    * while the bucket value pins 1/n of the files from the manifest
    * alone. */
  final case class Bucket(n: Int, source: String) extends Field {
    require(n > 1, s"bucket($n, $source): bucket count must be > 1")
    def spec: String = s"bucket($n,$source)"
    def phys: String = s"${source}_bucket$n"
    def validate(dt: DataType): Unit = dt match {
      case StringType | ByteType | ShortType | IntegerType | LongType => ()
      case _ => throw new IllegalArgumentException(
        s"cannot partition by $spec: bucket() needs a string or integral " +
          s"source, got $dt")
    }
    def columnSql(dt: DataType): String = {
      val c = esc(source)
      s"CASE WHEN $c IS NULL THEN NULL ELSE pmod(hash($c), $n) END"
    }
    private def bucketOf(value: Any, dt: DataType): Int = {
      val h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
        .hash(value, dt, 42L).toInt
      ((h % n) + n) % n
    }
    def render(raw: Any, dt: DataType): String = bucketOf(raw, dt).toString
    def boundOf(tag: String, v: Any, dt: DataType): Option[Long] = (tag, dt) match {
      // narrow the long-widened comparison value back to the source's
      // exact width — Murmur3 hashes int-backed and long-backed types
      // differently, so the width must match the column's
      case ("i", ByteType) => Some(bucketOf(v.asInstanceOf[Long].toByte, dt).toLong)
      case ("i", ShortType) => Some(bucketOf(v.asInstanceOf[Long].toShort, dt).toLong)
      case ("i", IntegerType) => Some(bucketOf(v.asInstanceOf[Long].toInt, dt).toLong)
      case ("i", LongType) => Some(bucketOf(v.asInstanceOf[Long], dt).toLong)
      case ("s", StringType) =>
        Some(bucketOf(UTF8String.fromString(v.asInstanceOf[String]), dt).toLong)
      case _ => None
    }
    def monotone: Boolean = false
  }

  private val TransformRe = """^(days|months|years|hours)\(\s*([^(),]+)\s*\)$""".r
  private val BucketRe = """^bucket\(\s*(\d+)\s*,\s*([^(),]+)\s*\)$""".r

  /** Parse one manifest/DDL spec string. Bare names are identity —
    * every pre-transform manifest parses unchanged. */
  def parse(spec: String): Field = spec.trim match {
    case TransformRe(unit, c) => Temporal(unit, c.trim)
    case BucketRe(n, c) => Bucket(n.toInt, c.trim)
    case s if s.nonEmpty && !s.contains("(") && !s.contains(")") => Identity(s)
    case s => throw new IllegalArgumentException(
      s"unparseable partition spec '$s' — expected a column name, " +
        "days|months|years|hours(col), or bucket(n,col)")
  }

  def parseAll(specs: Seq[String]): Seq[Field] = specs.map(parse)

  /** The distinct SOURCE columns behind `specs`. */
  def sources(specs: Seq[String]): Seq[String] =
    parseAll(specs).map(_.source).distinct

  /** Rewrite each spec's SOURCE column through `f` (the column-mapping
    * translation — recorded specs speak physical names, user-facing
    * surfaces speak logical). */
  def mapSources(specs: Seq[String], f: String => String): Seq[String] =
    parseAll(specs).map {
      case Identity(s) => Identity(f(s)).spec
      case Temporal(u, s) => Temporal(u, f(s)).spec
      case Bucket(n, s) => Bucket(n, f(s)).spec
    }

  /** Manifest specs -> the Spark connector Transforms DESCRIBE / the
    * catalog report. */
  def toV2Transforms(specs: Seq[String])
      : Array[org.apache.spark.sql.connector.expressions.Transform] = {
    import org.apache.spark.sql.connector.expressions.Expressions
    parseAll(specs).map {
      case Identity(s) => Expressions.identity(s)
      case Temporal("days", s) => Expressions.days(s)
      case Temporal("months", s) => Expressions.months(s)
      case Temporal("years", s) => Expressions.years(s)
      case Temporal("hours", s) => Expressions.hours(s)
      case Temporal(u, s) => Expressions.apply(u, Expressions.column(s))
      case Bucket(n, s) => Expressions.bucket(n, s)
    }.toArray
  }

  /** A Spark connector Transform (CREATE TABLE ... PARTITIONED BY) ->
    * canonical spec string. Loud on transforms txlog cannot lay out. */
  def fromV2Transform(t: org.apache.spark.sql.connector.expressions.Transform)
      : String = {
    def colOf: String = t.references.headOption.map(_.fieldNames) match {
      case Some(Array(c)) => c
      case Some(nested) => throw new UnsupportedOperationException(
        s"cannot partition by nested field ${nested.mkString(".")}")
      case None => throw new UnsupportedOperationException(
        s"partition transform $t references no column")
    }
    t.name match {
      case "identity" => Identity(colOf).spec
      case u @ ("days" | "months" | "years" | "hours") => Temporal(u, colOf).spec
      case "bucket" =>
        val n = t.arguments.collectFirst {
          case l: org.apache.spark.sql.connector.expressions.Literal[_]
              if l.value.isInstanceOf[Number] => l.value.asInstanceOf[Number].intValue
        }.getOrElse(throw new UnsupportedOperationException(
          s"bucket transform $t carries no bucket count literal"))
        Bucket(n, colOf).spec
      case other => throw new UnsupportedOperationException(
        s"txlog tables support identity, days/months/years/hours and " +
          s"bucket(n, col) partitioning; got: $other($t)")
    }
  }

  /** Declaration-time validation against `schema`: sources exist,
    * types renderable, physical path keys distinct. Returns the
    * canonicalized spec strings (what the manifest records). */
  def validate(specs: Seq[String], schema: StructType): Seq[String] = {
    val fields = parseAll(specs)
    fields.foreach { f =>
      val i = schema.fieldNames.indexOf(f.source)
      require(i >= 0, s"partition source column ${f.source} not in the schema " +
        s"(${f.spec})")
      f.validate(schema(i).dataType)
    }
    val phys = fields.map(_.phys)
    require(phys.distinct.size == phys.size,
      s"partition fields collide on physical path keys: $phys")
    fields.map(_.spec)
  }

  /** The staging/repartition Columns of `specs` over `df` (each the
    * row's partition VALUE — what the hive layout groups by). */
  def exprs(specs: Seq[String], df: DataFrame): Seq[Column] =
    parseAll(specs).map { f =>
      expr(f.columnSql(df.schema(f.source).dataType))
    }

  /** `(field, __p_ physical key, staging Column)` triples for
    * [[TxLog.stagePartitioned]]'s duplicated path columns. */
  def stagingCols(specs: Seq[String], df: DataFrame): Seq[(Field, String, Column)] =
    parseAll(specs).map { f =>
      (f, f.phys, expr(f.columnSql(df.schema(f.source).dataType)))
    }

  // ------------------------------------------------------------------
  // pruning: may a file's recorded partition tuple match a predicate?
  // ------------------------------------------------------------------

  /** True unless the file's recorded `pv` values PROVE no row can
    * match `pred` (a [[TxStats.Pred]] built from the same resolved
    * conjuncts / pushed Filters the zone maps consume). Files with no
    * recorded value for a field (compacted blobs, pre-layout files)
    * are kept; fields whose recorded value fails to parse are kept.
    *
    * Soundness per node:
    *  - a partitioned file holds EXACTLY ONE partition tuple (the hive
    *    staging layout), so a single recorded value speaks for every
    *    row of the file;
    *  - eq/In on a monotone transform T: `src = v` implies
    *    `T(src) = T(v)`; range: `src >= v` implies `T(src) >= T(v)`
    *    (non-decreasing), dually for <=; `>`/`<` weaken to their
    *    inclusive forms (the boundary partition may still hold
    *    matches);
    *  - bucket: equality only — `src = v` implies
    *    `bucket(src) = bucket(v)`;
    *  - the null-partition token: every transform of NULL is NULL, so
    *    a null-token file has only null sources — any comparison
    *    matches nothing there, `IsNotNull(src)` matches nothing, and
    *    `IsNull(src)` matches nothing on a NON-null-token file. (For
    *    identity STRING fields the token is ambiguous — a real string
    *    value equal to the token renders identically — so string
    *    identity keeps the file instead.)
    *  - identity eq compares in the parsed comparison domain (exact
    *    for the integral/date/boolean renders; raw string equality
    *    for strings). */
  private[storage] def mayMatchPv(pred: TxStats.Pred, fields: Seq[Field],
                 srcType: Map[String, DataType],
                 pv: Map[String, String]): Boolean = {
    import TxStats.{AndP, OrP, InP, Cmp, NullP, Unknown}
    val bySource = fields.groupBy(_.source)

    def nullFile(f: Field): Option[Boolean] = pv.get(f.phys) match {
      case Some(NullToken) =>
        f match {
          case Identity(s) if srcType.get(s).contains(StringType) => None
          case _ => Some(true)
        }
      case Some(_) => Some(false)
      case None => None
    }

    /** Recorded partition value in the long domain; None = keep. */
    def recLong(f: Field): Option[Long] = pv.get(f.phys).flatMap { raw =>
      if (raw == NullToken) None
      else f match {
        case Identity(s) => srcType.get(s).flatMap {
          case DateType =>
            try Some(java.time.LocalDate.parse(raw).toEpochDay)
            catch { case _: Exception => None }
          case ByteType | ShortType | IntegerType | LongType => raw.toLongOption
          case _ => None
        }
        case _ => raw.toLongOption // transforms render plain integers
      }
    }

    def evalCmp(op: String, source: String, tag: String, v: Any): Boolean = {
      val fs = bySource.getOrElse(source, Seq.empty)
      fs.forall { f =>
        // a null-token file has only null sources: no comparison matches
        if (nullFile(f).contains(true)) false
        else {
        val dt = srcType.getOrElse(source, NullType)
        (f, op) match {
          case (Identity(_), "eq") =>
            (tag, dt) match {
              case ("s", StringType) =>
                pv.get(f.phys).forall(r => r == NullToken || r == v.asInstanceOf[String])
              case ("b", BooleanType) =>
                pv.get(f.phys).forall(r => r == NullToken || r == v.toString)
              case _ => (recLong(f), f.boundOf(tag, v, dt)) match {
                case (Some(r), _) if tag == "i" =>
                  // identity integral/date: recorded value IS the source
                  r == v.asInstanceOf[Long]
                case _ => true
              }
            }
          case (_, _) if !f.monotone && op != "eq" => true
          case _ =>
            (recLong(f), f.boundOf(tag, v, dt)) match {
              case (Some(r), Some(b)) => op match {
                case "eq" => r == b
                case "gt" | "ge" => r >= b // monotone: src > v needs T(src) >= T(v)
                case "lt" | "le" => r <= b
                case _ => true
              }
              case _ => true
            }
        }
        }
      }
    }

    def eval(p: TxStats.Pred): Boolean = p match {
      case Unknown => true
      case AndP(l, r) => eval(l) && eval(r)
      case OrP(l, r) => eval(l) || eval(r)
      case InP(c, tag, vs) => vs.exists(v => evalCmp("eq", c, tag, v))
      case NullP(c, isNull) =>
        bySource.getOrElse(c, Seq.empty).forall { f =>
          nullFile(f) match {
            case Some(fileIsNull) => fileIsNull == isNull
            case None => true
          }
        }
      case Cmp(op, c, tag, v) => evalCmp(op, c, tag, v)
    }
    eval(pred)
  }

  /** Partition-prune `files` with resolved Catalyst conjuncts (the
    * [[TxLog.pruned]] path). */
  def pruneCatalyst(conjuncts: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
                    specs: Seq[String], schema: Option[StructType],
                    files: Seq[String],
                    stats: Map[String, TxStats.FileStats]): Seq[String] =
    pruneWith(conjuncts.map(TxStats.toPred), specs, schema, files, stats)

  /** Partition-prune `files` with pushed-down source Filters (the V2
    * scan path). */
  def pruneFilters(filters: Seq[org.apache.spark.sql.sources.Filter],
                   specs: Seq[String], schema: Option[StructType],
                   files: Seq[String],
                   stats: Map[String, TxStats.FileStats]): Seq[String] =
    pruneWith(filters.map(TxStats.fromSourceFilter), specs, schema, files, stats)

  private def pruneWith(preds: Seq[TxStats.Pred], specs: Seq[String],
                        schema: Option[StructType], files: Seq[String],
                        stats: Map[String, TxStats.FileStats]): Seq[String] = {
    if (specs.isEmpty) return files
    val fields = parseAll(specs)
    val srcType: Map[String, DataType] = schema match {
      case Some(sch) => fields.flatMap(f =>
        sch.fields.find(_.name == f.source).map(sf => f.source -> sf.dataType)).toMap
      case None => Map.empty
    }
    // without the schema the value domains are ambiguous (legacy log):
    // only string-identity equality would be safe; keep everything
    if (srcType.size != fields.map(_.source).distinct.size) return files
    files.filter { f =>
      stats.get(f).forall(st =>
        preds.forall(mayMatchPv(_, fields, srcType, st.byPart)))
    }
  }
}

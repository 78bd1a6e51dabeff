package graft.storage

import org.apache.hadoop.fs.Path
import org.apache.parquet.column.values.bloomfilter.BloomFilter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.metadata.ColumnChunkMetaData
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Cast, EqualNullSafe, EqualTo, Expression, In, InSet, Literal}
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** BLOOM-FILTER file skipping for point lookups ([[TxLog]] tables).
  *
  * Zone maps ([[TxStats]]) prune on VALUE RANGES — useless for an
  * equality probe on an unsorted high-cardinality column, where every
  * file's [min,max] spans the whole domain and nothing skips. The
  * classic fix is a per-file membership sketch, and parquet already
  * has one: split-block bloom filters (parquet-format BloomFilter,
  * xxHash64), written into the data file and addressed from the
  * footer's column-chunk metadata. This module uses that native
  * feature end to end:
  *
  *  - WRITE: the `bloomCols` table property (comma-separated column
  *    names) switches parquet bloom writing on for those columns in
  *    every staged file — appends, DML rewrites, compaction, the V2
  *    batch/streaming writers. Dictionary encoding is disabled for
  *    bloom columns (`parquet.enable.dictionary#col=false`): the
  *    property targets high-cardinality point-lookup keys, where the
  *    1 MB dictionary attempt always falls back anyway and a
  *    dict-encoded chunk may omit its bloom. `bloomNdv` (optional)
  *    sizes the filter (`parquet.bloom.filter.expected.ndv`).
  *  - PRUNE: for pushed equality / IN predicates on bloom columns,
  *    candidate files that SURVIVED partition + zone-map pruning get a
  *    membership test: footer-addressed bloom reads (metadata-sized
  *    I/O, never data pages), drop the file iff EVERY row group's
  *    bloom proves every probed value absent. Missing bloom, missing
  *    column chunk (schema evolution), physical-type mismatch, or an
  *    unsupported value shape all degrade to KEEP — the residual
  *    predicate re-applies on survivors, so skipping can only remove
  *    provably-dead I/O ([[TxStats]]' soundness contract).
  *
  * SCALE: the probe costs one footer + one bloom page per surviving
  * candidate — only for equality probes on opted-in columns, after
  * the metadata-only prunes have already cut the list. At the 100 TB
  * point this is the same read a query engine pays to open the file,
  * spent instead to NOT open it: a point lookup that would scan every
  * file of a uuid-keyed table touches a few KB per file and reads
  * data from almost none. The probes are independent per file
  * (trivially parallelizable across a planning thread pool; driver-
  * sequential here, local-mode sized). */
object TxBloom {

  /** Comma-separated column names to bloom at write time and probe at
    * prune time. Point-lookup keys only: high cardinality, equality-
    * probed. */
  val BloomColsProp = "bloomCols"

  /** Optional expected-distinct-values sizing hint for the written
    * filters (applies to every bloom column; parquet default 1M). */
  val BloomNdvProp = "bloomNdv"

  def colsFrom(props: Map[String, String]): Set[String] =
    props.get(BloomColsProp)
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)

  /** Parquet write options enabling blooms for the property's columns
    * — passed as DataFrameWriter options (driver-side stages) or baked
    * into the job conf (the V2 executor writers). */
  def writeOptions(props: Map[String, String]): Map[String, String] = {
    val cols = colsFrom(props)
    val ndv = props.get(BloomNdvProp)
      .flatMap(s => scala.util.Try(s.trim.toLong).toOption)
    cols.flatMap { c =>
      Seq(s"parquet.bloom.filter.enabled#$c" -> "true",
          s"parquet.enable.dictionary#$c" -> "false") ++
        ndv.map(n => s"parquet.bloom.filter.expected.ndv#$c" -> n.toString)
    }.toMap
  }

  /** (kept, candidates) of the most recent bloom prune on this JVM —
    * the spec/bench observable, like [[TxLogV2.lastPrune]]. Only set
    * when a probe actually ran (bloom columns + equality predicates
    * both present). */
  val lastPrune =
    new java.util.concurrent.atomic.AtomicReference[(Int, Int)]((0, 0))

  // ------------------------------------------------------------------
  // probe values: one canonical shape per parquet physical type
  // ------------------------------------------------------------------

  sealed private[storage] trait HashVal
  private[storage] case class HInt(v: Int) extends HashVal
  private[storage] case class HLong(v: Long) extends HashVal
  private[storage] case class HBytes(v: Array[Byte]) extends HashVal
  private[storage] case class HFloat(v: Float) extends HashVal
  private[storage] case class HDouble(v: Double) extends HashVal

  /** A catalyst literal (internal representation + DataType) → probe
    * value. None = unsupported, never prunes. */
  private def ofLiteral(l: Literal): Option[HashVal] =
    if (l.value == null) None
    else l.dataType match {
      case IntegerType | DateType => Some(HInt(l.value.asInstanceOf[Int]))
      case ShortType => Some(HInt(l.value.asInstanceOf[Short].toInt))
      case ByteType => Some(HInt(l.value.asInstanceOf[Byte].toInt))
      case LongType | TimestampType => Some(HLong(l.value.asInstanceOf[Long]))
      case StringType => Some(HBytes(l.value.asInstanceOf[UTF8String].getBytes))
      case BinaryType => Some(HBytes(l.value.asInstanceOf[Array[Byte]]))
      case FloatType => Some(HFloat(l.value.asInstanceOf[Float]))
      case DoubleType => Some(HDouble(l.value.asInstanceOf[Double]))
      case _ => None
    }

  /** A V2 source-filter value (external representation) → probe value. */
  private def ofExternal(v: Any): Option[HashVal] = v match {
    case null => None
    case i: Int => Some(HInt(i))
    case s: Short => Some(HInt(s.toInt))
    case b: Byte => Some(HInt(b.toInt))
    case d: java.sql.Date => Some(HInt(DateTimeUtils.fromJavaDate(d)))
    case d: java.time.LocalDate => Some(HInt(DateTimeUtils.localDateToDays(d)))
    case l: Long => Some(HLong(l))
    case t: java.sql.Timestamp => Some(HLong(DateTimeUtils.fromJavaTimestamp(t)))
    case t: java.time.Instant => Some(HLong(DateTimeUtils.instantToMicros(t)))
    case s: String => Some(HBytes(UTF8String.fromString(s).getBytes))
    case u: UTF8String => Some(HBytes(u.getBytes))
    case a: Array[Byte] => Some(HBytes(a))
    case f: Float => Some(HFloat(f))
    case d: Double => Some(HDouble(d))
    case _ => None
  }

  /** Hash `v` the way the file encoded the column, or None when the
    * physical type and the probe shape disagree (evolution, INT96
    * timestamps, …) — the caller keeps the file. Cross-width cases
    * cover files written BEFORE a type widening ([[TxLog.widenColumnType]]):
    * post-widen predicates carry the wide literal, and when the value
    * round-trips to the file's narrow physical type exactly we probe
    * with the narrow rendering the file hashed; a value that does NOT
    * fit cannot be in the narrow file at all, but None (keep) stays the
    * conservative floor. */
  private def hashOf(bloom: BloomFilter, cc: ColumnChunkMetaData,
                     v: HashVal): Option[Long] =
    (cc.getPrimitiveType.getPrimitiveTypeName, v) match {
      case (PrimitiveTypeName.INT32, HInt(i)) => Some(bloom.hash(i))
      case (PrimitiveTypeName.INT64, HLong(l)) => Some(bloom.hash(l))
      case (PrimitiveTypeName.BINARY, HBytes(b)) =>
        Some(bloom.hash(Binary.fromConstantByteArray(b)))
      case (PrimitiveTypeName.FLOAT, HFloat(f)) => Some(bloom.hash(f))
      case (PrimitiveTypeName.DOUBLE, HDouble(d)) => Some(bloom.hash(d))
      // widened-column probes against pre-widen files
      case (PrimitiveTypeName.INT32, HLong(l)) if l.isValidInt =>
        Some(bloom.hash(l.toInt))
      case (PrimitiveTypeName.INT64, HInt(i)) => Some(bloom.hash(i.toLong))
      case (PrimitiveTypeName.DOUBLE, HFloat(f)) => Some(bloom.hash(f.toDouble))
      case (PrimitiveTypeName.FLOAT, HDouble(d))
          if java.lang.Double.compare(d.toFloat.toDouble, d) == 0 =>
        Some(bloom.hash(d.toFloat))
      case _ => None
    }

  // ------------------------------------------------------------------
  // predicate extraction: (column, probed values) per conjunct
  // ------------------------------------------------------------------

  /** Strip sound widening casts, mirror [[TxStats]]' attribute rule. */
  private def attrName(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case c: Cast => attrName(c.child)
    case _ => None
  }

  /** Catalyst conjuncts (the DML path) → probes. A conjunct yields a
    * probe only when EVERY branch is a supported literal: `c IN (1, x)`
    * with a non-literal can match rows the bloom never saw. */
  private[storage] def probesOf(conjuncts: Seq[Expression],
                                cols: Set[String]): Seq[(String, Seq[HashVal])] =
    conjuncts.flatMap {
      case EqualTo(a, l: Literal) =>
        attrName(a).filter(cols).flatMap(c => ofLiteral(l).map(v => c -> Seq(v)))
      case EqualTo(l: Literal, a) =>
        attrName(a).filter(cols).flatMap(c => ofLiteral(l).map(v => c -> Seq(v)))
      case EqualNullSafe(a, l: Literal) if l.value != null =>
        attrName(a).filter(cols).flatMap(c => ofLiteral(l).map(v => c -> Seq(v)))
      case In(a, list) if list.nonEmpty && list.forall(_.isInstanceOf[Literal]) =>
        attrName(a).filter(cols).flatMap { c =>
          // a null element never equals; dropping it is sound — but an
          // UNSUPPORTED non-null element means unknown, keep the file
          val nonNull = list.collect { case l: Literal if l.value != null => l }
          val hv = nonNull.map(ofLiteral)
          if (nonNull.isEmpty || hv.exists(_.isEmpty)) None
          else Some(c -> hv.flatten)
        }
      case InSet(a, hset) if hset.nonEmpty =>
        (attrName(a).filter(cols), a.dataType) match {
          case (Some(c), dt) =>
            val nonNull = hset.toSeq.filter(_ != null)
            val hv = nonNull.map(v => ofLiteral(Literal.create(v, dt)))
            if (nonNull.isEmpty || hv.exists(_.isEmpty)) None
            else Some(c -> hv.flatten)
          case _ => None
        }
      case _ => None
    }

  /** V2 source filters (the scan path) → probes. */
  private[storage] def probesOfFilters(
      filters: Seq[org.apache.spark.sql.sources.Filter],
      cols: Set[String]): Seq[(String, Seq[HashVal])] = {
    import org.apache.spark.sql.{sources => sf}
    filters.flatMap {
      case sf.EqualTo(a, v) if cols(a) => ofExternal(v).map(h => a -> Seq(h))
      case sf.EqualNullSafe(a, v) if cols(a) && v != null =>
        ofExternal(v).map(h => a -> Seq(h))
      case sf.In(a, vs) if cols(a) && vs.nonEmpty =>
        val nonNull = vs.filter(_ != null)
        val hv = nonNull.map(ofExternal)
        if (nonNull.isEmpty || hv.exists(_.isEmpty)) None
        else Some(a -> hv.toSeq.flatten)
      case _ => None
    }
  }

  // ------------------------------------------------------------------
  // the probe itself
  // ------------------------------------------------------------------

  /** Keep `rel` iff some row group may contain, for EVERY probed
    * column, at least one of its probed values. Unknown anywhere →
    * keep. Footer + bloom-page I/O only. */
  private def fileMayMatch(spark: SparkSession, table: String, rel: String,
                           probes: Seq[(String, Seq[HashVal])]): Boolean = {
    // the WHOLE body degrades to `keep` on any exception — partial
    // catches around open()/readBloomFilter() alone would let a footer-
    // iteration or findHash failure escape, and parFilter's f.get()
    // would rethrow it and fail the whole scan planning instead of
    // just skipping one file's skip opportunity
    try {
      val p = new Path(new Path(table), rel)
      val conf = spark.sparkContext.hadoopConfiguration
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try {
        reader.getFooter.getBlocks.asScala.exists { block =>
          probes.forall { case (col, vs) =>
            block.getColumns.asScala.find(_.getPath.toDotString == col) match {
              case None => true // evolution: file predates the column
              case Some(cc) =>
                val bloom = try reader.readBloomFilter(cc) catch { case _: Exception => null }
                if (bloom == null) true // no filter written -> unknown
                else vs.exists(v =>
                  hashOf(bloom, cc, v).forall(bloom.findHash))
            }
          }
        }
      } finally reader.close()
    } catch { case _: Exception => true } // unknown -> scan decides
  }

  /** Narrow `candidates` by bloom membership for the probes extractable
    * from `filters`/`conjuncts` (pass whichever side has them). No-op
    * (no I/O, counter untouched) when the table blooms no columns or
    * the predicates carry no equality probe on them. */
  private[storage] def prune(spark: SparkSession, table: String,
                             props: Map[String, String], candidates: Seq[String],
                             probes: Seq[(String, Seq[HashVal])]): Seq[String] = {
    if (probes.isEmpty || candidates.isEmpty) return candidates
    val kept = parFilter(candidates)(fileMayMatch(spark, table, _, probes))
    lastPrune.set((kept.size, candidates.size))
    kept
  }

  /** One shared planning pool for every prune call — daemon threads, so
    * it never pins the JVM; spinning a fresh pool per point lookup
    * would pay 16 thread births on the planning path each time. */
  private lazy val probePool = java.util.concurrent.Executors.newFixedThreadPool(
    16,
    new java.util.concurrent.ThreadFactory {
      private val n = new java.util.concurrent.atomic.AtomicInteger
      override def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"txbloom-probe-${n.incrementAndGet()}")
        t.setDaemon(true); t
      }
    })

  /** Probe candidates on the shared planning pool — each test is an
    * independent footer-sized read, so wall-clock is candidates/16
    * round-trips, not candidates (the object-store latency that would
    * otherwise dominate a large point lookup's planning). Order
    * preserved; a probe that throws was already mapped to `keep`
    * inside [[fileMayMatch]]'s catch-all. */
  private def parFilter(xs: Seq[String])(p: String => Boolean): Seq[String] = {
    if (xs.size <= 4) return xs.filter(p)
    val futs = xs.map(x => probePool.submit(new java.util.concurrent.Callable[Boolean] {
      override def call(): Boolean = p(x)
    }))
    xs.zip(futs).collect { case (x, f) if f.get() => x }
  }

  private[storage] def pruneFilters(
      spark: SparkSession, table: String, props: Map[String, String],
      filters: Seq[org.apache.spark.sql.sources.Filter],
      candidates: Seq[String]): Seq[String] = {
    val cols = colsFrom(props)
    if (cols.isEmpty) candidates
    else prune(spark, table, props, candidates, probesOfFilters(filters, cols))
  }

  private[storage] def pruneConjuncts(
      spark: SparkSession, table: String, props: Map[String, String],
      conjuncts: Seq[Expression], candidates: Seq[String]): Seq[String] = {
    val cols = colsFrom(props)
    if (cols.isEmpty) candidates
    else prune(spark, table, props, candidates, probesOf(conjuncts, cols))
  }
}

package graft.storage

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}

/** ROW LINEAGE — stable row ids surviving rewrites (the Iceberg v3
  * row-lineage shape re-expressed on the txlog manifest protocol).
  *
  * Identity rule: every data file gets a FIRST ROW ID allocated at
  * commit time ([[TxLog]] `assignRowIds` — recorded in the file's
  * manifest stats entry, immutable for the file's lifetime, minted
  * from a global high-water that survives log truncation via the
  * checkpoint's `nrid` marker). A row's id is
  *
  *   `coalesce(stored GridCol, firstRowId + parquet position)`
  *
  * — appends pay NOTHING (ids are derived, never written), while
  * rewrites (COW DML, compact, cluster) MATERIALIZE the ids of the
  * rows they carry into a hidden physical [[GridCol]] column; rows
  * born in a rewrite (merge inserts/replacements) leave it null and
  * derive fresh ids from the output file's own allocation. The same
  * coalesce serves every reader: the library doors
  * ([[TxLog.snapshotLineage]] / `snapshotLineageAt`) and the V2 scan's
  * `_row_id` metadata column (this file's reader factory).
  *
  * Semantics (r18/r19): EVERY update door preserves ids — COW UPDATE
  * carries the grid column through the rewrite, merge-on-read UPDATE
  * rides it through the SET projection, SQL COW DML through Spark's
  * ReplaceData metadata writeback, SQL MoR DML through the delta
  * writer's reinsert adoption (PRESERVE_ON_REINSERT), and keyed
  * upserts/merges ADOPT the replaced row's id by key
  * ([[graft.storage.TxLog]] `adoptGrid`, rank-paired 1:1). The change
  * feed diffs on (values, id): a value-identical re-upsert is a no-op
  * in BOTH spaces (adoption keeps cancelation), and an update's
  * retract/add pair SHARES one id — the pairing an id-keyed consumer
  * needs. Genuinely-new rows mint fresh: their capture rows store NO
  * absolute id — only a commit-relative OFFSET ([[GoffCol]], staged
  * as `-i2` change files) resolved at read against the publishing
  * manifest's recorded allocation base (`nrid`), so the commit's id
  * allocation can REBASE under concurrent id-minting commits
  * (writeSerializable appends keep flowing) without invalidating the
  * staged capture.
  *
  * At 100 TB this is what makes CDC-era joins row-true across layout
  * churn: two snapshots of one table join on `_row_id` through any
  * number of compactions, with zero stored bytes on the append path. */
object TxRowId {

  /** The hidden PHYSICAL column rewrites materialize carried ids into.
    * Reserved — never part of a table contract, never user-writable. */
  val GridCol = "__grid"

  /** The hidden capture-file column holding a fresh-mint row's OFFSET
    * into its commit's contiguous id allocation (`-i2` change files
    * only): the served id is `manifest.nrid + offset`, resolved at
    * read — absolute ids are stored only for ADOPTED/carried rows
    * (race-free, they are historical). Reserved like [[GridCol]]. */
  val GoffCol = "__goff"

  /** The served metadata/lineage column name. */
  val RowIdCol = "_row_id"
  val RowIdField: StructField = StructField(RowIdCol, LongType, nullable = true)

  /** V2 serving spec, bound to a scan's AUGMENTED read layout
    * `[visible data...] ++ [grid, ri, probe key cols...] ++ [__rid,
    * pv...]`: ordinals of the stored-grid and row-index columns, the
    * visible output width (data columns the query asked for), the
    * `__rid` constant's ordinal, where the REAL partition constants
    * begin (`blockEnd` = ridPvOrd + 1), and the types the row-based
    * reader needs.
    *
    * The file's firstRowId rides as a HIDDEN LEADING partition-value
    * constant (`__rid`, ordinal [[Spec.ridPvOrd]]) rather than a
    * per-partition scalar: partition values are per-FILE, so CLEAN
    * rid-bearing files coalesce into shared partitions (task count ∝
    * bytes, not files, on many-file tables) while each file's batches
    * still resolve their own allocation. Null `__rid` = the file
    * pre-dates row-id minting — derived ids serve null. */
  private[storage] case class Spec(gridOrd: Int, riOrd: Int,
                                   visibleLen: Int, ridPvOrd: Int,
                                   visibleTypes: Array[DataType],
                                   pvTypes: Array[DataType],
                                   emitPos: Boolean,
                                   goffOrd: Int = -1) extends Serializable {
    def blockEnd: Int = ridPvOrd + 1
    def pvCount: Int = pvTypes.length
  }

  /** Reader factory serving `_row_id` (and optionally `_pos`) over the
    * augmented parquet factory `aug` — layout: [visible data columns]
    * ++ [working block: grid, row-index, any eqdel key columns] ++
    * [partition constants]. Output: [visible] ++ [_row_id] ++ [_pos?]
    * ++ [partition constants]. Composes the merge-on-read row filters
    * ([[TxEqDel.FileWork]] — DVs and equality-delete probes) in the
    * same pass, so lineage reads see exactly the live row multiset. */
  private[storage] case class RowIdReaderFactory(
      aug: PartitionReaderFactory, spec: Spec,
      work: Map[String, TxEqDel.FileWork], table: String,
      conf: org.apache.spark.util.SerializableConfiguration)
      extends PartitionReaderFactory {

    private def fileOf(p: InputPartition): Option[String] = p match {
      case fp: FilePartition if fp.files.nonEmpty =>
        Some(TxDv.tailKey(fp.files.head.filePath.toString))
      case _ => None
    }

    // sound on head-file alone: files needing row filters are packed
    // ALONE by the scan's planner; coalesced partitions are all-clean
    private def workOf(p: InputPartition): Option[TxEqDel.FileWork] =
      fileOf(p).flatMap(work.get)

    override def supportColumnarReads(p: InputPartition): Boolean =
      aug.supportColumnarReads(p)

    override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] =
      new RowIdColumnarReader(aug.createColumnarReader(p), spec,
        loaded(workOf(p)))

    override def createReader(p: InputPartition): PartitionReader[InternalRow] =
      new RowIdRowReader(aug.createReader(p), spec, loaded(workOf(p)))

    private def loaded(w: Option[TxEqDel.FileWork])
        : (Option[TxDv.Dv], Array[TxEqDel.LoadedProbe]) = w match {
      case None => (None, Array.empty)
      case Some(fw) =>
        val dv = fw.dvRel.map(rel =>
          TxDv.cachedDecode(rel, TxDv.readBytes(conf.value, table, rel)))
        val ps = fw.probes.map(pr => new TxEqDel.LoadedProbe(
          TxEqDel.cachedDecode(pr.sidecarRel,
            TxEqDel.readBytes(conf.value, table, pr.sidecarRel)),
          pr.ordinals, pr.types)).toArray
        (dv, ps)
    }
  }

  /** A computed long vector (the id column) — dense, nullable. */
  private final class LongVector(vals: Array[Long], nulls: Array[Boolean])
      extends ColumnVector(LongType) {
    override def close(): Unit = ()
    override def hasNull: Boolean = nulls.exists(identity)
    override def numNulls: Int = nulls.count(identity)
    override def isNullAt(i: Int): Boolean = nulls(i)
    override def getLong(i: Int): Long = vals(i)
    override def getBoolean(i: Int): Boolean = throw new UnsupportedOperationException
    override def getByte(i: Int): Byte = throw new UnsupportedOperationException
    override def getShort(i: Int): Short = throw new UnsupportedOperationException
    override def getInt(i: Int): Int = throw new UnsupportedOperationException
    override def getFloat(i: Int): Float = throw new UnsupportedOperationException
    override def getDouble(i: Int): Double = throw new UnsupportedOperationException
    override def getArray(i: Int): org.apache.spark.sql.vectorized.ColumnarArray =
      throw new UnsupportedOperationException
    override def getMap(i: Int): org.apache.spark.sql.vectorized.ColumnarMap =
      throw new UnsupportedOperationException
    override def getDecimal(i: Int, p: Int, sc: Int): org.apache.spark.sql.types.Decimal =
      throw new UnsupportedOperationException
    override def getUTF8String(i: Int): org.apache.spark.unsafe.types.UTF8String =
      throw new UnsupportedOperationException
    override def getBinary(i: Int): Array[Byte] = throw new UnsupportedOperationException
    override def getChild(i: Int): ColumnVector = throw new UnsupportedOperationException
  }

  private final class RowIdColumnarReader(
      inner: PartitionReader[ColumnarBatch], spec: Spec,
      filters: (Option[TxDv.Dv], Array[TxEqDel.LoadedProbe]))
      extends PartitionReader[ColumnarBatch] {
    private val (dv, probes) = filters
    private var current: ColumnarBatch = _
    private var sel: Array[Int] = new Array[Int](4096)

    override def next(): Boolean = {
      while (inner.next()) {
        val batch = inner.get()
        val rows = batch.numRows()
        val cols = Array.tabulate(batch.numCols())(batch.column)
        val grid = cols(spec.gridOrd)
        val ri = cols(spec.riOrd)
        if (sel.length < rows) sel = new Array[Int](rows)
        var i = 0; var k = 0
        while (i < rows) {
          var keep = dv.forall(d => !d.contains(ri.getLong(i)))
          var j = 0
          while (keep && j < probes.length) {
            if (probes(j).hitCol(cols, i)) keep = false
            j += 1
          }
          if (keep) { sel(k) = i; k += 1 }
          i += 1
        }
        if (k > 0) {
          val ridCol = cols(spec.ridPvOrd) // per-file constant (pv)
          val goff = if (spec.goffOrd >= 0) cols(spec.goffOrd) else null
          val vals = new Array[Long](k)
          val nulls = new Array[Boolean](k)
          var j = 0
          while (j < k) {
            val r = sel(j)
            if (!grid.isNullAt(r)) vals(j) = grid.getLong(r)
            else if (goff != null && !goff.isNullAt(r)) {
              // `-i2` change entry fresh mint: allocation base + offset
              if (!ridCol.isNullAt(r)) vals(j) = ridCol.getLong(r) + goff.getLong(r)
              else nulls(j) = true
            }
            else if (!ridCol.isNullAt(r)) vals(j) = ridCol.getLong(r) + ri.getLong(r)
            else nulls(j) = true
            j += 1
          }
          val idVec = new LongVector(vals, nulls)
          val s = if (k == rows) null else java.util.Arrays.copyOf(sel, k)
          def pick(c: ColumnVector): ColumnVector =
            if (s == null) c else TxDv.selected(c, s)
          // output: visible data ++ _row_id ++ (_pos?) ++ partition
          // constants (which sit PAST the working block)
          val out = Array.newBuilder[ColumnVector]
          var m = 0
          while (m < spec.visibleLen) { out += pick(cols(m)); m += 1 }
          out += idVec
          if (spec.emitPos) out += pick(cols(spec.riOrd))
          var t = spec.blockEnd
          while (t < batch.numCols()) { out += pick(cols(t)); t += 1 }
          current = new ColumnarBatch(out.result(), k)
          return true
        }
      }
      false
    }
    override def get(): ColumnarBatch = current
    override def close(): Unit = inner.close()
  }

  private final class RowIdRowReader(
      inner: PartitionReader[InternalRow], spec: Spec,
      filters: (Option[TxDv.Dv], Array[TxEqDel.LoadedProbe]))
      extends PartitionReader[InternalRow] {
    private val (dv, probes) = filters
    private var current: InternalRow = _
    override def next(): Boolean = {
      while (inner.next()) {
        val row = inner.get()
        var keep = dv.forall(d => !d.contains(row.getLong(spec.riOrd)))
        var j = 0
        while (keep && j < probes.length) {
          if (probes(j).hitRow(row)) keep = false
          j += 1
        }
        if (keep) {
          val width = spec.visibleLen + 1 + (if (spec.emitPos) 1 else 0) +
            (spec.pvCount)
          val out = new Array[Any](width)
          var m = 0
          while (m < spec.visibleLen) {
            out(m) = if (row.isNullAt(m)) null
              else InternalRow.copyValue(row.get(m, spec.visibleTypes(m)))
            m += 1
          }
          out(m) =
            if (!row.isNullAt(spec.gridOrd)) row.getLong(spec.gridOrd)
            else if (spec.goffOrd >= 0 && !row.isNullAt(spec.goffOrd)) {
              // `-i2` change entry fresh mint: allocation base + offset
              if (!row.isNullAt(spec.ridPvOrd))
                row.getLong(spec.ridPvOrd) + row.getLong(spec.goffOrd)
              else null
            }
            else if (!row.isNullAt(spec.ridPvOrd))
              row.getLong(spec.ridPvOrd) + row.getLong(spec.riOrd)
            else null
          m += 1
          if (spec.emitPos) { out(m) = row.getLong(spec.riOrd); m += 1 }
          var t = spec.blockEnd
          var ti = 0
          while (ti < spec.pvCount) {
            out(m) = if (row.isNullAt(t)) null
              else InternalRow.copyValue(row.get(t, spec.pvTypes(ti)))
            m += 1; t += 1; ti += 1
          }
          current = InternalRow.fromSeq(out.toIndexedSeq)
          return true
        }
      }
      false
    }
    override def get(): InternalRow = current
    override def close(): Unit = inner.close()
  }
}

package graft.storage

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, Reducer, ReducibleFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The V2 FUNCTION behind the `bucket(n, col)` partition transform —
  * what lets Spark RESOLVE the transform when two bucket-partitioned
  * txlog tables meet in a join: `V2ExpressionUtils` loads `bucket`
  * from the table's catalog, binds it, and the planner can then prove
  * both sides share a `KeyGroupedPartitioning` over the SAME function
  * — the storage-partitioned join that reads co-bucketed tables with
  * ZERO exchange (`spark.sql.sources.v2.bucketing.enabled`).
  *
  * The definition is EXACTLY the layout's ([[TxPart.Bucket]]): Spark's
  * own `hash()` (Murmur3, seed 42) pmod n — so the function, the
  * staged hive segments, the executor row renderer and the prune-time
  * bound are one arithmetic. `canonicalName` includes the INPUT TYPE:
  * Murmur3 hashes int-backed and long-backed values differently, so
  * `bucket(8, int_col)` and `bucket(8, bigint_col)` must never be
  * judged co-partitioned. */
object GraftFunctions {

  object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(numBuckets, col): pmod(hash(col), numBuckets) — the txlog " +
        "bucket partition transform (Murmur3 seed 42, Spark hash() parity)"

    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"bucket takes (numBuckets, col), got ${inputType.catalogString}")
      val nType = inputType.fields(0).dataType
      require(nType == IntegerType,
        s"bucket's first argument is the bucket count (int), got $nType")
      val dt = inputType.fields(1).dataType
      dt match {
        case StringType | ByteType | ShortType | IntegerType | LongType =>
          new BucketBound(dt)
        case other => throw new UnsupportedOperationException(
          s"bucket() needs a string or integral column, got $other " +
            "(the partitionable set — TxPart.Bucket.validate)")
      }
    }
  }

  /** Bound bucket. [[ReducibleFunction]] (r15): `pmod(h, a) % b ==
    * pmod(h, b)` whenever `b` divides `a`, so a `bucket(16, k)` layout
    * REDUCES onto a `bucket(8, k)` one by folding each bucket id mod 8
    * — Spark uses this (under `spark.sql.sources.v2.bucketing
    * .allowCompatibleTransforms.enabled`) to storage-partition-join
    * tables whose bucket counts differ by an integer factor without a
    * full exchange: the finer side's partitions regroup under the
    * folded ids; only same-canonical-name functions reduce (Murmur3
    * hashes int and long differently, so cross-type folds stay out). */
  final class BucketBound(dt: DataType) extends ScalarFunction[Integer]
      with ReducibleFunction[Integer, Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = s"graft.bucket(${dt.catalogString})"
    override def isResultNullable: Boolean = true

    override def reducer(thisNumBuckets: Int,
                         otherFunc: ReducibleFunction[_, _],
                         otherNumBuckets: Int): Reducer[Integer, Integer] =
      otherFunc match {
        case o: BucketBound if o.canonicalName() == canonicalName() &&
            otherNumBuckets > 0 && thisNumBuckets > otherNumBuckets &&
            thisNumBuckets % otherNumBuckets == 0 =>
          new BucketFold(otherNumBuckets)
        case _ => null // no reduction (identical counts or incompatible)
      }

    override def produceResult(input: InternalRow): Integer = {
      if (input.isNullAt(1)) return null // null source -> null bucket (TxPart)
      val n = input.getInt(0)
      val v: Any = dt match {
        case StringType => input.getUTF8String(1)
        case ByteType => input.getByte(1)
        case ShortType => input.getShort(1)
        case IntegerType => input.getInt(1)
        case LongType => input.getLong(1)
        case other => throw new IllegalStateException(s"unbindable type $other")
      }
      val h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
        .hash(v, dt, 42L).toInt
      Integer.valueOf(((h % n) + n) % n)
    }
  }

  /** Fold a finer bucket id onto a coarser compatible layout. Ships
    * inside StoragePartitionJoinParams to the executors — Serializable. */
  final class BucketFold(divisor: Int) extends Reducer[Integer, Integer]
      with Serializable {
    override def reduce(bucket: Integer): Integer =
      if (bucket == null) null else Integer.valueOf(bucket.intValue % divisor)
  }
}

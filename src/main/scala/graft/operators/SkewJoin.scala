package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual fallback when AQE's runtime
  * skew-join split isn't available (e.g. the skew is in a non-shuffle
  * stage, or the build side must stay shuffled).
  *
  * Standard construction: the probe (large, skewed) side gets a random-
  * but-DETERMINISTIC salt in [0, buckets) derived by hashing a unique
  * column (no runtime entropy — reruns produce identical plans/results);
  * the build side is exploded `buckets`× with every salt value, and the
  * join key becomes (key, salt). A hot key's rows now spread over
  * `buckets` reducers instead of one straggler task.
  *
  * Cost model: build side replicates `buckets`×, so pick
  * `buckets ≈ hot-key rows / normal-partition rows` and keep the build
  * side the smaller input. At 100 TB this is the difference between a
  * 6-hour straggler tail and an even stage.
  */
object SkewJoin {

  /** Inner equi-join `large ⋈ small` on `key`, salting `large`'s hot keys
    * across `buckets` reducers. `saltSource` must be a column of `large`
    * that varies within a key group (a row id / line number) so the salt
    * distributes; it is hashed, never random. */
  def saltedInnerJoin(large: DataFrame, small: DataFrame, key: String,
                      saltSource: Column, buckets: Int): DataFrame = {
    val l = large.withColumn("__salt", pmod(hash(saltSource), lit(buckets)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    l.join(s, Seq(key, "__salt")).drop("__salt")
  }
}

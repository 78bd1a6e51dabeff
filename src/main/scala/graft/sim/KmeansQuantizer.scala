package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-point Lloyd k-means building blocks — THE single Scala
  * definition of the bit-exact distributed k-means step, consumed by
  * both the declared q63 query (one audited Lloyd iteration with
  * before/after populations) and the IVF codebook trainer
  * ([[Similarity.trainedCodebook]]). Everything is integer arithmetic:
  * coordinates quantize to `floor(x·2²⁰ + ½)`, distances are exact
  * i64 sums of squared diffs, argmin ties break to the lower centroid
  * id, and the centroid update is the floor of an exact integer mean —
  * so any engine (the DuckDB oracle included) reproduces the codebook
  * bit-for-bit from the same corpus.
  *
  * Physical shapes (MLlib's distributed Lloyd): assignment broadcasts
  * the k centroids against the vector stream (k·d multiply-adds per
  * row, no shuffle of the vectors); the update is one partial-agg
  * shuffle of (cluster, dim) cells — k·d rows, not the corpus. */
object KmeansQuantizer {

  /** Fixed-point scale 2^20. Embedding coords are |x| < 0.58, so scaled
    * values fit ±607k, squared diffs ×64 dims ≤ 9.4e13 ≪ 2^63, and
    * per-(cluster, dim) sums ≤ 3e9 ≪ 2^53 — every quantity is EXACT in
    * both engines. */
  val Scale = 1048576L

  /** Exact i64 squared L2 distance between quantized vectors. */
  private[graft] val distUdf = udf((v: Seq[Long], c: Seq[Long]) => {
    var d = 0L; var i = 0
    val n = math.min(v.length, c.length)
    while (i < n) { val t = v(i) - c(i); d += t * t; i += 1 }
    d
  })

  /** (vec_id, qv: array<long>) — the corpus in fixed-point. */
  def quantized(embeddings: DataFrame): DataFrame = {
    val s = embeddings.sparkSession
    import s.implicits._
    embeddings.select($"vec_id",
      transform($"embedding".cast("array<double>"),
        x => floor(x * Scale + 0.5).cast("long")).as("qv"))
  }

  /** Every (vector, centroid) pair ranked by exact distance (ties →
    * lower cid): rn=1 is the home cell, rn ≤ nprobe are probe cells.
    * Centroids broadcast; the vector stream never shuffles here. */
  def assignRanked(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val s = vecs.sparkSession
    import s.implicits._
    val wd = Window.partitionBy($"vec_id").orderBy($"dist", $"cid")
    vecs.crossJoin(broadcast(cents))
      .select($"vec_id", $"qv", $"cid", distUdf($"qv", $"cv").as("dist"))
      .withColumn("rn", row_number().over(wd))
  }

  /** Hard assignment: each vector's single nearest centroid. */
  def assign(vecs: DataFrame, cents: DataFrame): DataFrame =
    assignRanked(vecs, cents).filter(col("rn") === 1)
      .select(col("vec_id"), col("qv"), col("cid"))

  /** Lloyd update in exact integer arithmetic: floored mean per
    * (cluster, dim) cell — one k·d-row partial-agg shuffle. */
  def lloydCells(assigned: DataFrame): DataFrame = {
    val s = assigned.sparkSession
    import s.implicits._
    assigned.select($"cid", posexplode($"qv").as(Seq("pos", "x")))
      .groupBy($"cid", $"pos")
      .agg(floor(sum($"x").cast("double") / count(lit(1))).cast("long").as("cval"))
  }

  /** Reassemble (cid, pos, cval) cells into (cid, cv: array<long>). */
  def cellVectors(cells: DataFrame): DataFrame = {
    val s = cells.sparkSession
    import s.implicits._
    cells.groupBy($"cid")
      .agg(array_sort(collect_list(struct($"pos", $"cval"))).as("pc"))
      .select($"cid", transform($"pc", e => e("cval")).as("cv"))
  }

  /** One-Lloyd-step codebook: seeds = vectors 0..k−1, one assignment,
    * one exact-integer update → (cid, cv) centroid vectors. Fully
    * deterministic, so a SQL engine rebuilds the identical codebook
    * from the corpus (the oracle path for sim_topk_ivf_trained). */
  def trainedCodebook(embeddings: DataFrame, k: Int): DataFrame = {
    val s = embeddings.sparkSession
    import s.implicits._
    val q = quantized(embeddings)
    val seeds = q.filter($"vec_id" < k)
      .select($"vec_id".cast("int").as("cid"), $"qv".as("cv"))
    cellVectors(lloydCells(assign(q, seeds)))
  }
}

package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) building blocks — the compression rung of
  * the ANN ladder (ref behavior target: similarity search over
  * `embeddings.embedding`, SURVEY §2.5 S1; architecture per the public
  * FAISS/Jégou-et-al. IVFADC design, re-expressed relationally).
  *
  * Why PQ at 100 TB: a 64-dim float corpus is 256 bytes/vector; PQ
  * stores [[M]] sub-codes of log2([[KS]]) = 4 bits each — ~4
  * bytes/vector packed (the codes column is `array<int>` logically;
  * parquet's dictionary/bit-packing encodings store the 0..15 values
  * at close to their 4-bit entropy) — and approximate (ADC) scoring
  * reads ONLY the codes column. Column pruning therefore turns every
  * scoring scan of the persisted index into a codes-only scan: the
  * float vectors are touched just once per query for the exact
  * re-rank of the top [[Similarity.PqRerank]] candidates.
  *
  * Determinism contract (the oracle story): everything reuses
  * [[KmeansQuantizer]]'s fixed-point arithmetic — coordinates quantize
  * to i64 at scale 2^20, per-subspace codebooks are one exact-integer
  * Lloyd step seeded from the first [[KS]] vectors' subvectors,
  * assignment/encode argmins are exact i64 L2 with ties to the lower
  * code id, and ADC distances are exact i64 sums of table entries — so
  * the DuckDB oracle rebuilds codebooks, codes, and every ADC distance
  * bit-for-bit ([[graft.queries.Oracle9]]).
  *
  * Physical shapes: codebooks are M·KS·SubDim longs (4k values — always
  * broadcast); encode is a broadcast-join argmin whose exchange carries
  * n·M compact partial rows (min_by partials), never the corpus
  * vectors; ADC scoring is one codes-only scan against a broadcast of
  * the per-query distance tables with the top-R cut taken map-side by
  * the WindowGroupLimit pushdown. */
object PqQuantizer {

  /** Subspaces per vector (64 dims → 8 subspaces of 8). */
  val M = 8

  /** Dims per subspace. */
  val SubDim = 8

  /** Codes per subspace codebook (4 bits; a code row is M small ints —
    * 8 bytes/vector in the persisted index). */
  val KS = 16

  import KmeansQuantizer.distUdf

  /** (vec_id, sub, sqv: array<long>) — the quantized corpus split into
    * M contiguous SubDim-wide subvectors. The explode is M dimension
    * indices per row (no shuffle); slice is positional, so sub s covers
    * qv[s·SubDim+1 .. (s+1)·SubDim] in 1-based terms. */
  def subvectors(quantized: DataFrame): DataFrame = {
    val s = quantized.sparkSession
    import s.implicits._
    quantized
      .select($"vec_id", $"qv",
        explode(sequence(lit(0), lit(M - 1))).as("sub"))
      .select($"vec_id", $"sub",
        slice($"qv", $"sub" * SubDim + 1, lit(SubDim)).as("sqv"))
  }

  /** Per-subspace codebooks: (sub, cid, cv: array<long>) — one
    * exact-integer Lloyd step per subspace, seeds = the subvectors of
    * vec_id 0..KS−1 (the [[KmeansQuantizer.trainedCodebook]] recipe,
    * run M times in ONE pass via the sub column). Seeds broadcast; the
    * update is a (sub, cid, pos)-cell partial-agg shuffle of
    * M·KS·SubDim rows — codebook-sized, not corpus-sized. */
  def codebooks(sub: DataFrame): DataFrame = {
    val s = sub.sparkSession
    import s.implicits._
    val seeds = sub.filter($"vec_id" < KS)
      .select($"sub", $"vec_id".cast("int").as("cid"), $"sqv".as("cv"))
    // argmin via min_by on struct(dist, cid): cid is unique per group,
    // so the ordering struct is totally ordered — exact tie→lower-cid
    val assigned = sub.join(broadcast(seeds), "sub")
      .select($"vec_id", $"sub", $"sqv", $"cid",
        distUdf($"sqv", $"cv").as("dist"))
      .groupBy($"vec_id", $"sub")
      .agg(min_by(struct($"cid", $"sqv"), struct($"dist", $"cid")).as("m"))
      .select($"sub", $"m.cid".as("cid"), $"m.sqv".as("sqv"))
    val cells = assigned
      .select($"sub", $"cid", posexplode($"sqv").as(Seq("pos", "x")))
      .groupBy($"sub", $"cid", $"pos")
      .agg(floor(sum($"x").cast("double") / count(lit(1))).cast("long").as("cval"))
    cells.groupBy($"sub", $"cid")
      .agg(array_sort(collect_list(struct($"pos", $"cval"))).as("pc"))
      .select($"sub", $"cid", transform($"pc", e => e("cval")).as("cv"))
  }

  /** (vec_id, codes: array<int>) — each vector's M nearest-sub-centroid
    * code ids, ordered by subspace. Codebooks broadcast; the exchange
    * carries n·M min_by partials then n collect partials — compact
    * rows, never the vectors. */
  def encoded(sub: DataFrame, cb: DataFrame): DataFrame = {
    val s = sub.sparkSession
    import s.implicits._
    sub.join(broadcast(cb), "sub")
      .select($"vec_id", $"sub", $"cid", distUdf($"sqv", $"cv").as("dist"))
      .groupBy($"vec_id", $"sub")
      .agg(min_by($"cid", struct($"dist", $"cid")).as("code"))
      .groupBy($"vec_id")
      .agg(transform(array_sort(collect_list(struct($"sub", $"code"))),
        e => e("code")).as("codes"))
  }

  /** Never selected: no code can reference a sub-centroid id absent
    * from the codebook (codes are argmins OVER the codebook), so the
    * sentinel only fills table slots of vanished cluster ids. Large
    * enough to lose any rank comparison, small enough that M of them
    * cannot overflow i64. */
  val AbsentDist: Long = 1L << 59

  /** Per-query ADC distance tables, packed for broadcast: (query_id,
    * qdt: array<array<long>>) with qdt[sub][cid] = exact i64 L2 between
    * the query's subvector `sub` and sub-centroid `cid`. One row per
    * query, M·KS longs each. The cid axis is packed DENSE over
    * 0..KS−1 via a map lookup (not positionally from the collected
    * list) so [[adcDist]]'s `qdt[sub][code]` indexing stays correct
    * even if a sub-centroid lost all members in the Lloyd step and
    * vanished from the codebook — its slot gets [[AbsentDist]], which
    * no code can reference. */
  def queryTables(sub: DataFrame, cb: DataFrame, numQueries: Int): DataFrame = {
    val s = sub.sparkSession
    import s.implicits._
    sub.filter($"vec_id" < numQueries)
      .select($"vec_id".as("query_id"), $"sub", $"sqv")
      .join(broadcast(cb), "sub")
      .select($"query_id", $"sub", $"cid", distUdf($"sqv", $"cv").as("d"))
      .groupBy($"query_id", $"sub")
      .agg(map_from_entries(collect_list(struct($"cid", $"d"))).as("dm"))
      .select($"query_id", $"sub",
        transform(sequence(lit(0), lit(KS - 1)),
          c => coalesce(element_at($"dm", c), lit(AbsentDist))).as("ds"))
      .groupBy($"query_id")
      .agg(transform(array_sort(collect_list(struct($"sub", $"ds"))),
        e => e("ds")).as("qdt"))
  }

  /** Exact-i64 ADC distance of a codes array against a packed query
    * table: Σ_sub qdt[sub][codes[sub]] — pure codegen HOFs over the
    * broadcast table; the corpus side contributes only `codes`. */
  def adcDist(codes: Column, qdt: Column): Column =
    aggregate(
      zip_with(codes, qdt, (c, ds) => element_at(ds, c + 1)),
      lit(0L), (acc, x) => acc + x)
}

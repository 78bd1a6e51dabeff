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
    graft.functions.VectorFunctions.register(s)
    // seeds = the subvectors of vec_id 0..KS−1: M·KS·SubDim longs —
    // dimension-sized, so collect them and run the assignment as a
    // per-row argmin kernel inside the scan (first index of the
    // minimum = tie→lower cid, the exact min_by(struct(dist, cid))
    // order of the r19 broadcast-join form). The trainer's only
    // remaining exchange is the (sub, cid, pos) cell partial-agg —
    // the r19 form paid an extra n·M-row argmin aggregation exchange
    // for the same bit-identical codebook (opt guide §2.4).
    val seedRows = sub.filter($"vec_id" < KS)
      .select($"sub", $"vec_id".cast("int").as("cid"), $"sqv")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Long](2)))
    val seedsLit = typedlit(denseCodebook(seedRows.toIndexedSeq))
    // fan out BEFORE the corpus-wide subCid kernel (the seeds collect
    // above stays on the raw frame so its vec_id filter hits the scan)
    val assigned = KmeansQuantizer.fanOut(sub).select($"sub", $"sqv",
      subCid($"sqv", $"sub", seedsLit).as("cid"))
    val cells = assigned
      .select($"sub", $"cid", posexplode($"sqv").as(Seq("pos", "x")))
      .groupBy($"sub", $"cid", $"pos")
      .agg(floor(sum($"x").cast("double") / count(lit(1))).cast("long").as("cval"))
    cells.groupBy($"sub", $"cid")
      .agg(array_sort(collect_list(struct($"pos", $"cval"))).as("pc"))
      .select($"sub", $"cid", transform($"pc", e => e("cval")).as("cv"))
  }

  /** Per-row argmin code id of an ALREADY-SLICED subvector against
    * sub-codebook `sub` of a literal codebook (ties → lower cid). */
  def subCid(sqv: Column, sub: Column, cbLit: Column): Column = {
    val ds = subDists(sqv, element_at(cbLit, sub + 1))
    (array_position(ds, array_min(ds)) - 1).cast("int")
  }

  /** (vec_id, codes: array<int>) — each vector's M nearest-sub-centroid
    * code ids, ordered by subspace. Codebooks broadcast; the exchange
    * carries n·M min_by partials then n collect partials — compact
    * rows, never the vectors. */
  def encoded(sub: DataFrame, cb: DataFrame): DataFrame = {
    val s = sub.sparkSession
    import s.implicits._
    graft.functions.VectorFunctions.register(s)
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
    graft.functions.VectorFunctions.register(s)
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

  // ------------------- per-row kernels over a LITERAL codebook (r20)
  // The PQ codebook is always dimension-sized (M·KS·SubDim = 1,024
  // longs), so once it is materialized on the driver, encode and
  // query-table construction need no join, no aggregation and no
  // exchange AT ALL — they are per-row expressions computed inside the
  // scan stage (opt guide §2.4 "remove shuffles outright"; §1.1
  // first-principles: the only fundamentally required shuffles in the
  // PQ family are the trainer's cell partial-agg and the final top-K).
  // Arithmetic and tie-breaks are IDENTICAL to the join-based
  // [[encoded]]/[[queryTables]] (same [[KmeansQuantizer.distUdf]]
  // distances, argmin ties → lower cid via FIRST-index-of-min, absent
  // sub-centroids filled with [[AbsentDist]]).

  /** Dense [M][KS][SubDim] literal matrix from (sub, cid, cv) codebook
    * rows; a sub-centroid that lost all members in the Lloyd step gets
    * an EMPTY slot (mapped to [[AbsentDist]] by [[subDists]]). */
  def denseCodebook(rows: Seq[(Int, Int, Seq[Long])]): Seq[Seq[Seq[Long]]] = {
    val m = rows.map(r => (r._1, r._2) -> r._3).toMap
    (0 until M).map(sub => (0 until KS).map(cid =>
      m.getOrElse((sub, cid), Seq.empty[Long])))
  }

  /** Subvector `sub` (0-based) of a quantized vector — positional slice,
    * the same arithmetic as [[subvectors]]' slice. */
  def subSlice(qv: Column, sub: Column): Column =
    slice(qv, sub * SubDim + 1, lit(SubDim))

  /** Distance vector of one subvector against one sub-codebook slot
    * list: element cid = exact i64 L2, or [[AbsentDist]] for an absent
    * slot. */
  def subDists(sqv: Column, subCb: Column): Column =
    transform(subCb,
      cv => when(size(cv) === 0, lit(AbsentDist))
        .otherwise(graft.functions.VectorFunctions.l2_dist(sqv, cv)))

  /** Per-row PQ codes straight from the quantized vector: for each
    * subspace, the argmin code id over the literal codebook (ties →
    * lower cid = first index of the minimum). Row-identical to
    * [[encoded]] over the same codebook. */
  def codesFromQv(qv: Column, cbLit: Column): Column =
    transform(sequence(lit(0), lit(M - 1)), sub => {
      val ds = subDists(subSlice(qv, sub), element_at(cbLit, sub + 1))
      (array_position(ds, array_min(ds)) - 1).cast("int")
    })

  /** Per-row packed ADC distance table straight from the quantized
    * query vector: qdt[sub][cid] — row-identical to [[queryTables]]
    * over the same codebook (absent slots = [[AbsentDist]]). */
  def qdtFromQv(qv: Column, cbLit: Column): Column =
    transform(sequence(lit(0), lit(M - 1)),
      sub => subDists(subSlice(qv, sub), element_at(cbLit, sub + 1)))
}

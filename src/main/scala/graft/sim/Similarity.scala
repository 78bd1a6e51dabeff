package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Approximate-nearest-neighbor search over the embedding column.
  *
  *  - `bruteForceTopK`: exact cosine top-k — the correctness baseline.
  *    The query set broadcasts (it is small by construction); the data
  *    side streams — no shuffle except the per-query top-k, which Spark
  *    plans as partial top-k per partition via the rank window on a
  *    (query-partitioned) exchange of only `k·|queries|`-bounded rows.
  *  - `lshTopK`: the scale path — signed-random-projection LSH: bucket =
  *    sign bits of `planes·v`; candidates are fetched from the query's
  *    bucket and its Hamming-1 probes (multi-probe), so the data side is
  *    touched once to build buckets and candidate lists stay tiny vs a
  *    full scan. At 100 TB the bucketed table is what you'd persist
  *    (bucketBy on `bucket`), making every query a partition-pruned
  *    lookup instead of a scan.
  *
  * Cosine math is double (cast from float) — float-order-sensitive →
  * rows-only driver check; invariants (self-similarity, recall vs brute
  * force) are asserted in SimilaritySpec.
  */
object Similarity {

  val K = 10
  val NumQueries = 5
  val NumPlanes = 4

  /** Deterministic random hyperplanes (seeded — no runtime entropy;
    * java.util.Random's LCG + nextGaussian are platform-stable, so the
    * oracle SQL generated from these constants in Oracle2 sees the exact
    * same doubles). */
  private[graft] def planes: Seq[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(NumPlanes)(Array.fill(64)(rnd.nextGaussian()))
  }

  import graft.functions.VectorFunctions.dot_product

  private def vcol(df: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.register(df.sparkSession)
    // repartition: the scan is one small file, but the pairwise cosine
    // work downstream is quadratic — partition for the compute
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, col("vec_id"))
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(dot_product(col("v"), col("v"))))
  }

  /** Codegen'd primitive-loop dot product (graft.functions.DotProduct). */
  private def dot(a: Column, b: Column): Column = dot_product(a, b)

  /** Exact brute-force cosine top-K for the first NumQueries vec_ids. */
  def bruteForceTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = vcol(Tables(s, dir, "embeddings"))
    val q = e.filter($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"norm".as("qnorm"))
    val w = Window.partitionBy($"query_id").orderBy($"cos_sim".desc, $"vec_id")
    e.crossJoin(broadcast(q))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id",
        (dot($"qv", $"v") / ($"qnorm" * $"norm")).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= K)
      .select($"query_id", $"vec_id", $"rank", $"cos_sim")
      .orderBy($"query_id", $"rank")
  }

  /** LSH bucket id: NumPlanes sign bits of the plane projections. */
  def bucketCol(v: Column): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(typedlit(p.toSeq), v) > 0, 1 << i).otherwise(0)
    }.reduce(_ + _)

  /** Approximate top-K: candidates from the query's bucket plus all
    * Hamming-1 probe buckets, ranked by exact cosine within candidates. */
  def lshTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = vcol(Tables(s, dir, "embeddings"))
      .withColumn("bucket", bucketCol($"v"))
    val probes = array((lit(0) +: (0 until NumPlanes).map(i => lit(1 << i))): _*)
    val q = e.filter($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"norm".as("qnorm"),
        explode(transform(probes, m => $"bucket".bitwiseXOR(m))).as("bucket"))
    val w = Window.partitionBy($"query_id").orderBy($"cos_sim".desc, $"vec_id")
    e.join(broadcast(q), Seq("bucket"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id",
        (dot($"qv", $"v") / ($"qnorm" * $"norm")).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= K)
      .select($"query_id", $"vec_id", $"rank", $"cos_sim")
      .orderBy($"query_id", $"rank")
  }

  /** Persist the embeddings as the on-disk ANN index this file's doc
    * claims for 100 TB: rows bucketed (and sorted) by their LSH
    * sign-projection bucket via StorageLayout.writeBucketed. Probes
    * against the persisted table then join bucket-to-bucket with ZERO
    * exchange on the index side, and a single-bucket lookup prunes the
    * scan to 1-of-N bucket files (both asserted in StorageLayoutSpec —
    * the wired demonstration of the claim). */
  def writeLshIndex(s: SparkSession, dir: String, table: String,
                    numBuckets: Int = 1 << NumPlanes): Unit = {
    val e = vcol(Tables(s, dir, "embeddings"))
      .withColumn("bucket", bucketCol(col("v")))
      .select(col("vec_id"), col("label"), col("v"), col("norm"), col("bucket"))
    graft.operators.StorageLayout.writeBucketed(e, table, "bucket", numBuckets)
  }

  /** Candidate probe over the persisted LSH index: home-bucket
    * candidates for the first NumQueries vectors, generated by a bucket
    * equi-join of two reads of the SAME bucketed table — both sides
    * arrive hash-distributed on `bucket` from disk, so the join plans
    * with no shuffle Exchange at all. (Multi-probe — the Hamming-1
    * buckets lshTopK adds — costs one tiny exchange on the exploded
    * query side only; the index side stays shuffle-free either way.) */
  def probePersistedIndex(s: SparkSession, table: String,
                          bucketCol: String = "bucket"): DataFrame = {
    import s.implicits._
    graft.functions.VectorFunctions.register(s)
    val idx = s.table(table)
    val q = idx.filter($"vec_id" < NumQueries)
      .select(col(bucketCol), $"vec_id".as("query_id"), $"v".as("qv"), $"norm".as("qnorm"))
    idx.join(q, bucketCol)
      .filter($"vec_id" =!= $"query_id")
      .select(col(bucketCol), $"query_id", $"vec_id",
        (dot($"qv", $"v") / ($"qnorm" * $"norm")).as("cos_sim"))
  }

  // ------------------------- Exactly-once embedding ingestion (r11)
  /** [[writeLshIndex]] made REPLAY-IDEMPOTENT for streaming embedding
    * ingestion — the [[graft.dedup.Dedup.bandIndexAdmitIdempotent]]
    * pattern applied to the ANN index (the r10 verdict's carry-over):
    * every admitted row carries its `batch_id`, and a replayed admit
    * appends exactly the complement of what the crashed attempt
    * published (anti-join on `vec_id`, which uniquely keys a batch's
    * rows) — convergent under partial job commits, where a
    * skip-on-presence ledger would permanently lose rows. The table is
    * bucketed by the LSH bucket like the one-shot writer, so probes
    * keep their shuffle-free index side. */
  def lshIndexAdmitIdempotent(batch: DataFrame, table: String,
                              batchId: Long,
                              numBuckets: Int = 1 << NumPlanes): Unit = {
    val s = batch.sparkSession
    import s.implicits._
    val rows = vcol(batch)
      .withColumn("bucket", bucketCol(col("v")))
      .select($"vec_id", $"label", $"v", $"norm", $"bucket",
        lit(batchId).as("batch_id"))
    def append(df: DataFrame): Unit = df.write
      .bucketBy(numBuckets, "bucket")
      .sortBy("bucket")
      .format("parquet")
      .mode(org.apache.spark.sql.SaveMode.Append)
      .saveAsTable(table)
    val published =
      if (!s.catalog.tableExists(table)) None
      else {
        val p = s.table(table).filter($"batch_id" === batchId).select($"vec_id")
        if (p.isEmpty) None else Some(p)
      }
    published match {
      case None => append(rows)
      case Some(p) =>
        val missing = rows.join(p, Seq("vec_id"), "left_anti")
        if (!missing.isEmpty) append(missing)
    }
  }

  /** Cosine candidates of an ARRIVING embedding batch against the
    * `batch_id < batchId` snapshot of an idempotent-admit index — the
    * replay-stable probe ([[graft.dedup.Dedup.bandIndexProbeBatchBefore]]
    * argument): a replay after its own admit committed still sees
    * exactly the pre-batch index, so recomputed candidates are
    * identical. Home-bucket equi-join; the small arriving side
    * broadcasts, the index side stays bucket-distributed on disk and
    * never shuffles. Missing table = empty corpus (batch 0 bootstrap). */
  def lshIndexProbeBatchBefore(batch: DataFrame, table: String,
                               batchId: Long): DataFrame = {
    val s = batch.sparkSession
    import s.implicits._
    val q = vcol(batch).withColumn("bucket", bucketCol(col("v")))
      .select($"bucket", $"vec_id".as("vec_new"),
        $"v".as("qv"), $"norm".as("qnorm"))
    if (!s.catalog.tableExists(table))
      q.select($"vec_new", $"vec_new".as("vec_old"),
        lit(0.0).as("cos_sim")).limit(0)
    else
      s.table(table).filter($"batch_id" < batchId)
        .join(broadcast(q), "bucket")
        .select($"vec_new", $"vec_id".as("vec_old"),
          (dot($"qv", $"v") / ($"qnorm" * $"norm")).as("cos_sim"))
  }

  /** The embedding probe→admit loop as a Structured Streaming query
    * with EXACTLY-ONCE output effects under at-least-once replay —
    * [[graft.dedup.Dedup.dedupIngestionStream]]'s three-step shape over
    * the ANN index: (1) probe the arriving vectors against the
    * snapshot, (2) overwrite the batch's own candidates partition
    * (idempotent sink), (3) admit via [[lshIndexAdmitIdempotent]].
    * Crash-injected in SimIngestionRecoverySpec across the same
    * windows as the band-index loop (probe/admit gap, post-admit,
    * partial publish). `beforeAdmit` is the spec's injection seam. */
  def simIngestionStream(stream: DataFrame, table: String,
                         pairsDir: String, checkpoint: String,
                         beforeAdmit: (DataFrame, Long) => Unit = (_, _) => ())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val onBatch: (DataFrame, Long) => Unit = { (batch, id) =>
      lshIndexProbeBatchBefore(batch, table, id)
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$pairsDir/batch_id=$id")
      beforeAdmit(batch, id)
      lshIndexAdmitIdempotent(batch, table, id)
    }
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(onBatch)
      .start()
  }

  val NProbe = 2

  /** IVF (inverted-file) approximate top-K — the second scale path next
    * to LSH, and the shape you'd persist at 100 TB: a coarse quantizer
    * (here: per-label centroids in exact scaled-int arithmetic, so the
    * whole index is deterministic and oracle-checkable), every vector
    * assigned to its nearest cell (bucketBy(cell) on disk), and queries
    * probing only their NProbe nearest cells — candidate lists scale with
    * cell occupancy, not corpus size. All cosine math goes through the
    * codegen'd sequential DotProduct, so every value is bit-identical to
    * the DuckDB oracle's list_inner_product. */
  /** Exact per-(label, pos) centroid components in scaled-int64
    * arithmetic — THE single Scala definition of the deterministic
    * quantizer, consumed by both sim_centroids_exact (as rows) and
    * ivfTopK (reassembled into cell vectors); its SQL twin is
    * Oracle2.centroidCte. */
  def exactCentroidRows(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "embeddings")
      .select($"label", posexplode($"embedding".cast("array<double>")).as(Seq("pos", "x")))
      .groupBy($"label", $"pos")
      .agg((sum(floor($"x" * 1000000.0).cast("long")).cast("double")
        / count(lit(1)) / 1000000.0).as("c"))
  }

  def ivfTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = vcol(Tables(s, dir, "embeddings"))
    // deterministic coarse quantizer: exact per-label centroids, dims
    // reassembled in order
    val cents = exactCentroidRows(s, dir)
      .groupBy($"label")
      .agg(transform(array_sort(collect_list(struct($"pos", $"c"))),
        el => el.getField("c")).as("cv"))
      .select($"label".as("cell"), $"cv",
        sqrt(dot_product($"cv", $"cv")).as("cnorm"))
    // assignment: home = the argmax-cosine cell via max_by over the
    // totally-ordered (cos_c, −cell) struct — exactly the old window's
    // rn=1 row (same doubles, same tie→lower cell) but partial-aggregable
    // (the shuffle carries |corpus| rows, not cells·|corpus|, and the
    // per-partition window sort disappears — guide §2.3/§2.4). The
    // rank-needing probe selection filters to the query vectors FIRST
    // and pays the window only on |queries|·cells rows.
    val asgCos = (df: DataFrame) => df.crossJoin(broadcast(cents))
      .select($"vec_id", $"cell",
        (dot($"v", $"cv") / ($"norm" * $"cnorm")).as("cos_c"))
    val home = asgCos(e)
      .groupBy($"vec_id")
      .agg(max_by($"cell", struct($"cos_c", -$"cell")).as("cell"))
    val wCell = Window.partitionBy($"vec_id").orderBy($"cos_c".desc, $"cell")
    val qprobe = asgCos(e.filter($"vec_id" < NumQueries))
      .withColumn("rn", row_number().over(wCell))
      .filter($"rn" <= NProbe)
      .select($"vec_id".as("query_id"), $"cell")
    val qv = e.filter($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"norm".as("qnorm"))
    // candidates: vectors whose home cell is among the query's probes
    // (home is unique per vector — no duplicate candidates possible)
    val wRank = Window.partitionBy($"query_id").orderBy($"cos_sim".desc, $"vec_id")
    qprobe.join(home, "cell")
      .filter($"vec_id" =!= $"query_id")
      .join(broadcast(qv), "query_id")
      .join(e.select($"vec_id", $"v", $"norm"), "vec_id")
      .select($"query_id", $"vec_id",
        (dot($"qv", $"v") / ($"qnorm" * $"norm")).as("cos_sim"))
      .withColumn("rank", row_number().over(wRank))
      .filter($"rank" <= K)
      .select($"query_id", $"vec_id", $"rank", $"cos_sim")
      .orderBy($"query_id", $"rank")
  }

  /** Trained-codebook cell count. Sized for the test corpus (500–2000
    * vectors → ~30–125 vectors/cell); at 100 TB the same trainer runs
    * with k in the hundreds-to-thousands (cells stay k·d integers — a
    * broadcast-sized codebook either way) and more Lloyd rounds, each
    * round one broadcast-assign + one k·d-cell shuffle. */
  val KCells = 16

  /** The k-means-TRAINED coarse quantizer: one fixed-point Lloyd step
    * ([[KmeansQuantizer.trainedCodebook]], the exact machinery behind
    * q63) over the embedding corpus, seeds = vectors 0..k−1. Unlike the
    * per-label quantizer ([[exactCentroidRows]], ~10 cells fixed by the
    * label vocabulary), this scales its cell count with the corpus —
    * the real 100 TB codebook path — while staying bit-exact integer
    * arithmetic, so the DuckDB oracle rebuilds the identical codebook
    * in SQL and the whole train → assign → probe → rank path
    * hash-checks. */
  def trainedCodebook(s: SparkSession, dir: String): DataFrame =
    KmeansQuantizer.trainedCodebook(Tables(s, dir, "embeddings"), KCells)

  /** IVF top-K over the TRAINED codebook: cell assignment and probe
    * selection rank cells by EXACT i64 squared-L2 in quantized space
    * (deterministic, ties → lower cell id); candidate ranking is the
    * exact double cosine through the codegen'd sequential DotProduct —
    * the same split FAISS uses (integer/coarse metric for routing,
    * exact metric for scoring). Candidates scale with cell occupancy
    * (NProbe/k of the corpus), not corpus size; the persisted form is
    * [[writeIvfIndex]] (bucketBy cell → shuffle-free probes). */
  /** One-scan corpus frame for the codebook-literal paths: vcol plus
    * the fixed-point quantization as a per-row column — the SAME
    * arithmetic as [[KmeansQuantizer.quantized]] (floor(x·Scale + ½) of
    * the double-cast embedding), so home cells, codes and distances are
    * bit-identical while home assignment / encode / residuals all
    * compute inside this single scan instead of re-reading and joining
    * (opt guide §2.4/§8: decide with small rows, scan the payload once). */
  private def vq(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    graft.functions.VectorFunctions.register(s)
    // no repartition (unlike [[vcol]]): the literal-kernel paths do
    // per-row work only — at cluster scale the scan's own file splits
    // provide the parallelism, and locally the extra Exchange just
    // adds a 32-task round-trip per pass over a 2,000-row corpus
    // (guide §2.4: a repartition "for parallelism" is an accidental
    // shuffle when the downstream work is map-only)
    df.select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(dot_product(col("v"), col("v"))))
      .withColumn("qv",
        transform($"v", x => floor(x * KmeansQuantizer.Scale + 0.5).cast("long")))
  }

  /** Collect a (cid, cv) codebook to the driver (k·d longs — the
    * bounded [[materializeCoarse]] pull, as an array for literal use). */
  private def collectCoarse(cb: DataFrame): IndexedSeq[(Int, Seq[Long])] =
    cb.collect().map(r => (r.getInt(0), r.getSeq[Long](1))).toIndexedSeq

  /** The standard query set (vec_id < [[NumQueries]]) as a LOCAL
    * relation: ONE filter-pushdown scan collects (vec_id, v, norm, qv)
    * — query-set-sized by construction, the same bounded driver-pull
    * class as the codebook literals — so the query-side subtrees
    * (probe selection, ADC tables, re-rank query vectors) evaluate
    * against an in-memory relation instead of each re-scanning the
    * corpus per evaluation (2–3 scan + broadcast-build jobs per query
    * path at r20; opt guide §1.2 bounded driver work, §2.4). The
    * kernel EXPRESSIONS applied downstream are unchanged, and doubles
    * round-trip the driver exactly, so every value is bit-identical. */
  private def queryRows(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    vq(Tables(s, dir, "embeddings"))
      .filter($"vec_id" < NumQueries)
      .select($"vec_id", $"v", $"norm", $"qv")
      .collect().toIndexedSeq
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2),
        r.getSeq[Long](3)))
      .toDF("vec_id", "v", "norm", "qv")
  }

  /** Collect a (sub, cid, cv) PQ codebook to the driver (M·KS·SubDim
    * longs) as the dense [M][KS] literal matrix. */
  private def collectPq(cb: DataFrame): Seq[Seq[Seq[Long]]] =
    PqQuantizer.denseCodebook(
      cb.collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Long](2))).toIndexedSeq)

  def ivfTrainedTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // r20 plan shape: the trained codebook is collected once
    // (dimension-sized) and becomes a LITERAL; home assignment and
    // probe-cell selection are then per-row kernels inside the single
    // corpus scan — the r19 form paid a corpus-sized assignment
    // exchange (crossJoin fan-out + per-vector argmin window) plus a
    // second corpus scan joined back on vec_id for the re-rank
    // vectors. Candidates remain an equi-join on cell with the
    // query-probe side broadcast; the only exchanges left are the
    // top-K windows (guide §2.4 "remove shuffles outright").
    // the query-row collect is independent of the trainer — overlap the
    // two from driver threads (guide §2.6), as ivfPqTopK's trainers do
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val qrowsF = Future { queryRows(s, dir) }
    val cells = KmeansQuantizer.denseCells(collectCoarse(trainedCodebook(s, dir)))
    val cellsLit = typedlit(cells)
    val data = vq(Tables(s, dir, "embeddings"))
      .withColumn("cell", KmeansQuantizer.homeCid($"qv", cellsLit))
    // query sides evaluate the collected [[queryRows]] local relation —
    // no corpus re-scan per subtree (the kernels below are unchanged)
    val qrows = Await.result(qrowsF, Duration.Inf)
    val qprobe = qrows
      .select($"vec_id".as("query_id"),
        explode(KmeansQuantizer.probeCids($"qv", cellsLit, cells.size, NProbe)).as("cell"))
    val qv = qrows
      .select($"vec_id".as("query_id"), $"v".as("qvec"), $"norm".as("qnorm"))
    val wRank = Window.partitionBy($"query_id").orderBy($"cos_sim".desc, $"vec_id")
    data.select($"vec_id", $"v", $"norm", $"cell")
      .join(broadcast(qprobe), "cell")
      .filter($"vec_id" =!= $"query_id")
      .join(broadcast(qv), "query_id")
      .select($"query_id", $"vec_id",
        (dot($"qvec", $"v") / ($"qnorm" * $"norm")).as("cos_sim"))
      .withColumn("rank", row_number().over(wRank))
      .filter($"rank" <= K)
      .select($"query_id", $"vec_id", $"rank", $"cos_sim")
      .orderBy($"query_id", $"rank")
  }

  /** Persist the trained-codebook IVF index the way [[writeLshIndex]]
    * persists the LSH one: rows bucketed by home cell, so probes join
    * bucket-to-bucket with no exchange on the index side and a probe of
    * NProbe cells prunes the scan to NProbe-of-k bucket files. */
  def writeIvfIndex(s: SparkSession, dir: String, table: String,
                    numBuckets: Int = KCells): Unit = {
    import s.implicits._
    // codebook → literal; home assignment is a per-row kernel in the
    // single scan feeding the bucketed write (no assignment exchange,
    // no vec_id self-join — guide §2.4)
    val cellsLit = typedlit(
      KmeansQuantizer.denseCells(collectCoarse(trainedCodebook(s, dir))))
    val idx = vq(Tables(s, dir, "embeddings"))
      .select($"vec_id", $"label", $"v", $"norm",
        KmeansQuantizer.homeCid($"qv", cellsLit).as("cell"))
    graft.operators.StorageLayout.writeBucketed(idx, table, "cell", numBuckets)
  }

  /** Materialize a trained (cid, cv) codebook through the driver —
    * k rows of d longs, dimension-sized by construction (the bounded
    * driver-pull pattern of q78b's seeds). The codebook DataFrame is
    * referenced by several plan subtrees (home assignment, query
    * probes, distance tables); left lazy, Spark re-runs the ENTIRE
    * trainer (corpus scan + Lloyd shuffle) once per subtree
    * evaluation. A local relation costs one training pass total and
    * broadcasts identically. Row order is irrelevant downstream
    * (keyed joins; argmins totally ordered by (dist, cid)). */
  private def materializeCoarse(cb: DataFrame): DataFrame = {
    val s = cb.sparkSession
    import s.implicits._
    cb.collect().map(r => (r.getInt(0), r.getSeq[Long](1)))
      .toIndexedSeq.toDF("cid", "cv")
  }

  /** [[materializeCoarse]] for the per-subspace PQ codebooks
    * ((sub, cid, cv) — M·KS rows of SubDim longs). */
  private def materializePq(cb: DataFrame): DataFrame = {
    val s = cb.sparkSession
    import s.implicits._
    cb.collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Long](2)))
      .toIndexedSeq.toDF("sub", "cid", "cv")
  }

  /** Shared exact-cosine re-rank tail of every PQ path: fetch the
    * candidates' float vectors by vec_id, rank by exact cosine within
    * the candidate set, keep top-K. ONE definition, so the four
    * paths' "row-identical by construction" equalities cannot drift
    * apart on a tie-break or schema change. `idx` supplies (vec_id,
    * v, norm) for both candidates and the standard query set. */
  private def rerankExact(cand: DataFrame, idx: DataFrame): DataFrame = {
    val s = idx.sparkSession
    import s.implicits._
    rerankExact(cand, idx, idx.filter($"vec_id" < NumQueries))
  }

  /** [[rerankExact]] with an explicit query-row frame (the collected
    * [[queryRows]] relation on the dir-based paths; the index-filtered
    * frame on the persisted-index paths). */
  private def rerankExact(cand: DataFrame, idx: DataFrame,
                          qrows: DataFrame): DataFrame = {
    val s = cand.sparkSession
    import s.implicits._
    val qv = qrows
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"norm".as("qnorm"))
    val wK = Window.partitionBy($"query_id").orderBy($"cos_sim".desc, $"vec_id")
    cand.join(idx.select($"vec_id", $"v", $"norm"), "vec_id")
      .join(broadcast(qv), "query_id")
      .select($"query_id", $"vec_id", $"adist",
        (dot($"qv", $"v") / ($"qnorm" * $"norm")).as("cos_sim"))
      .withColumn("rank", row_number().over(wK))
      .filter($"rank" <= K)
      .select($"query_id", $"vec_id", $"rank", $"cos_sim", $"adist")
      .orderBy($"query_id", $"rank")
  }

  /** Exact re-rank window for the PQ paths: ADC keeps the [[PqRerank]]
    * approximately-nearest candidates per query; only those rows touch
    * the float vectors again. The production recall/cost knob. */
  val PqRerank = 64

  /** Product-quantized top-K over the FULL corpus — ADC scoring on the
    * 8-byte codes column, exact cosine re-rank of the top [[PqRerank]]:
    * the memory-compression rung of the ANN ladder
    * ([[PqQuantizer]] — 32× smaller scoring scan than the float
    * corpus). Every stage is exact integer arithmetic until the final
    * double cosine, so codebooks, codes, ADC distances, the candidate
    * cut, and the re-rank all hash-check against the DuckDB twin
    * ([[graft.queries.Oracle9]]). Plan shape: codebooks and the packed
    * per-query distance tables broadcast (M·KS longs per query); the
    * scoring scan reads codes only; the top-R cut is a WindowGroupLimit
    * (map-side partial); the re-rank joins [[PqRerank]]·|queries| rows
    * back to the vectors.
    *
    * Like [[bruteforceTopK]], this rung scores corpus × queries — a
    * deliberate EXHAUSTIVE scan, the compression baseline of the
    * ladder. At 100 TB one would run [[ivfPqTopK]] (cell-pruned
    * candidates) or the persisted [[probeIvfPqIndex]], never this. */
  def pqTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import PqQuantizer._
    // r20 plan shape: the trained PQ codebook is collected once
    // (M·KS·SubDim longs) and becomes a LITERAL; encode and the packed
    // per-query tables are then per-row kernels — the r19 form paid two
    // n·M-row aggregation exchanges (encode min_by + codes reassembly)
    // per evaluation for the same bit-identical codes (guide §2.4)
    // the query-row collect is independent of the trainer — overlap the
    // two from driver threads (guide §2.6), as ivfPqTopK's trainers do
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val qrowsF = Future { queryRows(s, dir) }
    val data = KmeansQuantizer.fanOut(vq(Tables(s, dir, "embeddings")))
    val cbLit = typedlit(collectPq(codebooks(subvectors(
      KmeansQuantizer.quantized(Tables(s, dir, "embeddings"))))))
    val codes = data.select($"vec_id", codesFromQv($"qv", cbLit).as("codes"))
    // query side evaluates the collected [[queryRows]] local relation —
    // no corpus re-scan per subtree (the qdt kernel is unchanged)
    val qrows = Await.result(qrowsF, Duration.Inf)
    val qdt = qrows
      .select($"vec_id".as("query_id"), qdtFromQv($"qv", cbLit).as("qdt"))
    val wR = Window.partitionBy($"query_id").orderBy($"adist", $"vec_id")
    val cand = codes.crossJoin(broadcast(qdt))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id", adcDist($"codes", $"qdt").as("adist"))
      .withColumn("rn", row_number().over(wR))
      .filter($"rn" <= PqRerank)
    rerankExact(cand, data, qrows)
  }

  /** IVF-PQ top-K — the full FAISS-style IVFADC composition and the
    * layout you'd actually persist at 100 TB: the trained coarse
    * quantizer ([[trainedCodebook]]) routes queries to NProbe cells,
    * ADC scores ONLY the codes of vectors homed in probed cells, and
    * the exact re-rank touches [[PqRerank]] float vectors per query.
    * Scoring cost per query is (NProbe/k)·n table lookups over 8-byte
    * codes — both the scan volume AND the bytes-per-row collapse.
    * Deterministic end-to-end (coarse routing by exact i64 L2, ADC by
    * exact i64 tables) → hash-checked ([[graft.queries.Oracle9]]). */
  def ivfPqTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import PqQuantizer._
    // r20 plan shape: BOTH codebooks are collected once
    // (dimension-sized) and become LITERALS; home routing, encode,
    // probe selection and the per-query ADC tables are all per-row
    // kernels inside ONE corpus scan. Candidates remain the cell
    // equi-join with the broadcast query side; the only exchanges left
    // are the two top-K windows. The r19 form paid a corpus assignment
    // exchange, two encode exchanges, and a corpus-side vec_id join
    // for the same bit-identical rows (guide §2.4, §8).
    // the two trainers are INDEPENDENT (coarse routes raw vectors; PQ
    // codebooks train on raw subvectors) — overlap their jobs from two
    // driver threads so the second trainer back-fills the first's tail
    // (guide §2.6); each is still one training pass
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val cellsF = Future {
      KmeansQuantizer.denseCells(collectCoarse(trainedCodebook(s, dir))) }
    val cbF = Future { collectPq(codebooks(subvectors(
      KmeansQuantizer.quantized(Tables(s, dir, "embeddings"))))) }
    val qrowsF = Future { queryRows(s, dir) }
    val cells = Await.result(cellsF, Duration.Inf)
    val cellsLit = typedlit(cells)
    val cbLit = typedlit(Await.result(cbF, Duration.Inf))
    val data = KmeansQuantizer.fanOut(vq(Tables(s, dir, "embeddings")))
      .withColumn("cell", KmeansQuantizer.homeCid($"qv", cellsLit))
    // query sides evaluate the collected [[queryRows]] local relation —
    // no corpus re-scan per subtree (the kernels below are unchanged)
    val qrows = Await.result(qrowsF, Duration.Inf)
    val qprobe = qrows
      .select($"vec_id".as("query_id"),
        explode(KmeansQuantizer.probeCids($"qv", cellsLit, cells.size, NProbe)).as("cell"))
    val qdt = qrows
      .select($"vec_id".as("query_id"), qdtFromQv($"qv", cbLit).as("qdt"))
    // candidates: codes of vectors homed in the query's probe cells —
    // cell equi-join (broadcast query side), never a corpus cross join
    val wR = Window.partitionBy($"query_id").orderBy($"adist", $"vec_id")
    val cand = data.select($"vec_id", $"cell", codesFromQv($"qv", cbLit).as("codes"))
      .join(broadcast(qprobe), "cell")
      .filter($"vec_id" =!= $"query_id")
      .join(broadcast(qdt), "query_id")
      .select($"query_id", $"vec_id", adcDist($"codes", $"qdt").as("adist"))
      .withColumn("rn", row_number().over(wR))
      .filter($"rn" <= PqRerank)
    rerankExact(cand, data)
  }

  /** RESIDUAL IVF-PQ top-K — the full-fidelity IVFADC encoding (the
    * published FAISS design): PQ codebooks are trained on and codes
    * encode the RESIDUAL `qv − centroid(home cell)` rather than the
    * raw vector, so the quantizer spends its 8 bytes describing the
    * vector's offset within its cell instead of re-describing the
    * cell — the standard recall win at the same code budget. The ADC
    * tables become per-(query, probed cell): the query's residual
    * against THAT cell's centroid, M·KS longs per (query, cell) — one
    * broadcast row per probe, joined to candidates on their home cell.
    * Arithmetic stays exact end-to-end (residuals are i64 differences
    * of i64 quantities; |qv−cc| ≤ 2·2^20·0.58 keeps every squared sum
    * far under 2^63), so the whole train-on-residuals → encode → route
    * → ADC → re-rank path hash-checks ([[graft.queries.Oracle9]]). */
  def ivfPqResTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import PqQuantizer._
    // r20 plan shape: the coarse codebook becomes a LITERAL, so home
    // routing AND the residual computation are per-row kernels —
    // `rqv = qv − cells[cell]` needs no join at all. The residual PQ
    // codebook is trained from the same per-row residual column
    // (collected once, dimension-sized) and then encode and the
    // per-(query, probed cell) residual ADC tables are per-row kernels
    // too. The r19 form paid a corpus assignment exchange, a
    // corpus-sized residual join (vec_id + cell), two encode
    // exchanges, and a two-level qdt aggregation for the same
    // bit-identical rows (guide §2.4, §8).
    // the query-row collect is independent of both trainers — overlap
    // it with the coarse trainer from a driver thread (guide §2.6)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val qrowsF = Future { queryRows(s, dir) }
    val cells = KmeansQuantizer.denseCells(collectCoarse(trainedCodebook(s, dir)))
    val cellsLit = typedlit(cells)
    // residual corpus: qv − home-cell centroid, elementwise i64
    // (fanned out before the kernels — guide §2.5; see
    // [[KmeansQuantizer.fanOut]])
    val withRes = KmeansQuantizer.fanOut(vq(Tables(s, dir, "embeddings")))
      .withColumn("cell", KmeansQuantizer.homeCid($"qv", cellsLit))
      .withColumn("rqv",
        zip_with($"qv", element_at(cellsLit, $"cell" + 1), (a, b) => a - b))
    val cbLit = typedlit(collectPq(codebooks(subvectors(
      withRes.select($"vec_id", $"rqv".as("qv"))))))
    // per-(query, probed cell) residual distance tables, dense-packed —
    // one row per probe, M·KS longs each; the query side evaluates the
    // collected [[queryRows]] local relation — no corpus re-scan per
    // subtree (the probe/residual-table kernels are unchanged)
    val qrows = Await.result(qrowsF, Duration.Inf)
    val qdt = qrows
      .select($"vec_id".as("query_id"), $"qv",
        explode(KmeansQuantizer.probeCids($"qv", cellsLit, cells.size, NProbe)).as("cell"))
      .select($"query_id", $"cell",
        qdtFromQv(zip_with($"qv", element_at(cellsLit, $"cell" + 1),
          (a, b) => a - b), cbLit).as("qdt"))
    // candidates: the cell equi-join delivers (query, table) pairs —
    // ≤ NumQueries·NProbe broadcast rows of M·KS longs
    val wR = Window.partitionBy($"query_id").orderBy($"adist", $"vec_id")
    val cand = withRes.select($"vec_id", $"cell", codesFromQv($"rqv", cbLit).as("codes"))
      .join(broadcast(qdt), "cell")
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id", adcDist($"codes", $"qdt").as("adist"))
      .withColumn("rn", row_number().over(wR))
      .filter($"rn" <= PqRerank)
    rerankExact(cand, withRes, qrows)
  }

  /** Persist the IVF-PQ index — the layout the 100 TB deployment
    * actually serves from: rows bucketed by coarse home cell, carrying
    * BOTH the M-byte PQ codes (the scoring payload) and the float
    * vector (the re-rank payload). Parquet's columnar layout is what
    * makes the separation real: ADC scoring scans read (vec_id, cell,
    * codes) and never materialize the 256-byte vector column
    * (ReadSchema pruning pinned in StorageLayoutSpec). The PQ and
    * coarse codebooks persist alongside as dimension-sized side tables
    * (M·KS and KCells rows). */
  def writeIvfPqIndex(s: SparkSession, dir: String, table: String): Unit = {
    import s.implicits._
    import PqQuantizer._
    // train ONCE: persist both codebooks first, then build the index
    // from the persisted tables — embedding the trainer DataFrames in
    // the index job would re-run the full Lloyd/encode passes a second
    // time inside it
    trainedCodebook(s, dir).write.format("parquet")
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .saveAsTable(table + "_coarse")
    val q = KmeansQuantizer.quantized(Tables(s, dir, "embeddings"))
    codebooks(subvectors(q)).write.format("parquet")
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .saveAsTable(table + "_pqcb")
    val idx = encodeForIvfPqIndex(Tables(s, dir, "embeddings"),
      s.table(table + "_pqcb"), s.table(table + "_coarse"))
    graft.operators.StorageLayout.writeBucketed(idx, table, "cell", KCells)
  }

  /** ADC candidate generation against an IVF-PQ index RELATION (rows
    * shaped like [[writeIvfPqIndex]]'s table — vec_id, label, v, norm,
    * cell, codes — however they are stored): route the standard query
    * set through the coarse codebook, score codes of vectors homed in
    * probed cells, keep the top [[PqRerank]] per query. Reads ONLY
    * (vec_id, cell, codes) from the index — the float column stays on
    * disk. */
  def probeIvfPqCandidatesOf(idx: DataFrame, cb: DataFrame,
                             coarse: DataFrame): DataFrame = {
    val s = idx.sparkSession
    import s.implicits._
    import PqQuantizer._
    graft.functions.VectorFunctions.register(s)
    // both codebooks are dimension-sized side tables — collect them once
    // and run probe routing + ADC-table construction as per-row kernels
    // over the query rows (no joins, no aggregation exchanges; guide §2.4)
    val cells = KmeansQuantizer.denseCells(collectCoarse(coarse))
    val cellsLit = typedlit(cells)
    val cbLit = typedlit(collectPq(cb))
    val qvecs = idx.filter($"vec_id" < NumQueries)
      .select($"vec_id",
        transform($"v", x => floor(x * KmeansQuantizer.Scale + 0.5).cast("long")).as("qv"))
    val qdt = qvecs.select($"vec_id".as("query_id"), qdtFromQv($"qv", cbLit).as("qdt"))
    val qprobe = qvecs.select($"vec_id".as("query_id"),
      explode(KmeansQuantizer.probeCids($"qv", cellsLit, cells.size, NProbe)).as("cell"))
    val wR = Window.partitionBy($"query_id").orderBy($"adist", $"vec_id")
    idx.select($"vec_id", $"cell", $"codes")
      .join(broadcast(qprobe), "cell")
      .filter($"vec_id" =!= $"query_id")
      .join(broadcast(qdt), "query_id")
      .select($"query_id", $"vec_id", adcDist($"codes", $"qdt").as("adist"))
      .withColumn("rn", row_number().over(wR))
      .filter($"rn" <= PqRerank)
      .select($"query_id", $"vec_id", $"adist")
  }

  /** [[probeIvfPqCandidatesOf]] against the bucketed managed table
    * written by [[writeIvfPqIndex]]. */
  def probeIvfPqCandidates(s: SparkSession, table: String): DataFrame =
    probeIvfPqCandidatesOf(s.table(table), s.table(table + "_pqcb"),
      s.table(table + "_coarse"))

  /** Full probe of an IVF-PQ index relation: ADC candidates, then the
    * exact re-rank fetching only the candidates' float vectors by
    * vec_id. Row-identical to [[ivfPqTopK]] by construction when the
    * index holds the same corpus and codebooks (StorageLayoutSpec and
    * PqIngestionRecoverySpec assert the equalities). */
  def probeIvfPqIndexOf(idx: DataFrame, cb: DataFrame,
                        coarse: DataFrame): DataFrame = {
    val s = idx.sparkSession
    import s.implicits._
    graft.functions.VectorFunctions.register(s)
    rerankExact(probeIvfPqCandidatesOf(idx, cb, coarse), idx)
  }

  /** [[probeIvfPqIndexOf]] against the bucketed managed table. */
  def probeIvfPqIndex(s: SparkSession, table: String): DataFrame =
    probeIvfPqIndexOf(s.table(table), s.table(table + "_pqcb"),
      s.table(table + "_coarse"))

  /** Route + encode an embedding batch for the IVF-PQ index with
    * FROZEN codebooks — the ingestion-time half of the index: arriving
    * vectors never retrain anything (retraining would silently shift
    * every existing code's meaning); they are assigned a home cell by
    * the persisted coarse codebook and PQ-encoded against the
    * persisted subspace codebooks, yielding rows in exactly
    * [[writeIvfPqIndex]]'s schema. Codebooks broadcast; the batch
    * never shuffles except the n·M encode partials. */
  def encodeForIvfPqIndex(batch: DataFrame, cb: DataFrame,
                          coarse: DataFrame): DataFrame = {
    val s = batch.sparkSession
    import s.implicits._
    import PqQuantizer._
    // frozen codebooks are dimension-sized — collect once per batch and
    // route + encode as per-row kernels in the single batch scan (the
    // r19 form paid an assignment exchange, two encode exchanges and
    // two vec_id self-joins per micro-batch; guide §2.4)
    val cellsLit = typedlit(KmeansQuantizer.denseCells(collectCoarse(coarse)))
    val cbLit = typedlit(collectPq(cb))
    vq(batch).select($"vec_id", $"label", $"v", $"norm",
      KmeansQuantizer.homeCid($"qv", cellsLit).as("cell"),
      codesFromQv($"qv", cbLit).as("codes"))
  }

  /** Streaming ingestion into a [[graft.storage.TxLog]]-committed
    * IVF-PQ index: each arriving micro-batch is encoded with the
    * frozen codebooks and committed as ONE transaction keyed by the
    * epoch — the TxLog idempotence token makes replay exactly-once
    * with no anti-join repair, and a crash at ANY point (before the
    * data write, between data write and manifest publish, after
    * publish) leaves the index either without the batch or with all
    * of it, never partial (PqIngestionRecoverySpec crash-injects all
    * three windows and checks probe equality against the one-shot
    * index). The TxLog data files are plain parquet — the
    * cell-bucketed layout optimization stays with the one-shot
    * [[writeIvfPqIndex]] table; a production variant would carry
    * per-file cell ranges in the manifest for scan pruning. */
  def ivfPqIngestionStream(stream: DataFrame, indexDir: String,
                           cbTable: String, coarseTable: String,
                           checkpoint: String,
                           beforeCommit: (DataFrame, Long) => Unit = (_, _) => ())
      : org.apache.spark.sql.streaming.StreamingQuery =
    // ONE exactly-once sink implementation (TxLog.sink) — the encode
    // is its per-batch transform, so the commit/replay contract lives
    // in a single place
    graft.storage.TxLog.sink(stream, indexDir, "ivfpq-ingest", checkpoint,
      beforeCommit,
      batch => encodeForIvfPqIndex(batch,
        batch.sparkSession.table(cbTable), batch.sparkSession.table(coarseTable)))

  /** CODEBOOK DRIFT of a TxLog-committed IVF-PQ index: the fraction of
    * index rows whose FROZEN home cell disagrees with a router freshly
    * trained on the index's CURRENT corpus. The frozen-codebook
    * ingestion contract ([[encodeForIvfPqIndex]]) is what keeps codes
    * stable, but it means a corpus whose distribution shifts slowly
    * degrades routing quality with no error anywhere — this scalar is
    * the operational signal. Deterministic (the trainer is exact
    * integer arithmetic), so thresholds are stable: ≈0 right after
    * (re)training, rising as shifted data accumulates. Cost: one
    * trainer pass + one broadcast-assign over the index — a maintenance
    * job, not a query. */
  def ivfPqCellDrift(s: SparkSession, indexDir: String): Double = {
    import s.implicits._
    val idx = graft.storage.TxLog.snapshot(s, indexDir).getOrElse(
      return 0.0)
    val corpus = idx.select($"vec_id", $"v".as("embedding"))
    val fresh = KmeansQuantizer.trainedCodebook(corpus, KCells)
    val q = KmeansQuantizer.quantized(corpus)
    val freshCellsLit = typedlit(KmeansQuantizer.denseCells(collectCoarse(fresh)))
    val freshHome = q.select($"vec_id",
      KmeansQuantizer.homeCid($"qv", freshCellsLit).as("fresh_cell"))
    val row = idx.select($"vec_id", $"cell").join(freshHome, "vec_id")
      .agg(count(lit(1)).as("n"),
        sum(when($"cell" =!= $"fresh_cell", 1L).otherwise(0L)).as("moved"))
      .first()
    if (row.getLong(0) == 0L) 0.0 else row.getLong(1).toDouble / row.getLong(0)
  }

  /** RETRAIN a TxLog-committed IVF-PQ index in place: train both
    * codebooks from the index's current corpus, re-encode every row,
    * and swap atomically — the index overwrite is one TxLog checkpoint
    * (readers see the old index or the new, never a mix; the old
    * generation time-travels until vacuum), and the codebook tables
    * are saved AFTER the data swap so a crash between the two leaves
    * time travel as the recovery door. Ordering note: probes read
    * (index, cb, coarse) as one logical unit — production would version
    * codebooks inside the index table's own log; here the swap window
    * is documented and the spec drives the happy path. Post-retrain,
    * [[ivfPqCellDrift]] is ≈0 by construction and probes serve from
    * codes that match the corpus again. */
  /** Train BOTH IVF-PQ codebooks from a corpus DataFrame (vec_id,
    * label, embedding) and persist them as the probe/encode tables —
    * the bootstrap half of [[retrainIvfPqIndex]], exposed so a curated
    * index ([[CuratedIvfPq]]) can freeze codebooks on its initial
    * corpus before the maintenance loop starts encoding against them. */
  def trainIvfPqCodebooks(corpus: DataFrame, cbTable: String,
                          coarseTable: String): Unit = {
    val (coarse, cb) = trainedIvfPqPair(corpus)
    coarse.write.format("parquet")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).saveAsTable(coarseTable)
    cb.write.format("parquet")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).saveAsTable(cbTable)
  }

  /** THE training recipe — coarse router + M×256 subspace codebooks
    * from one corpus pass, materialized (driver-pinned literals, so no
    * plan subtree re-runs the Lloyd trainer). The single definition
    * both the bootstrap ([[trainIvfPqCodebooks]]) and the drift repair
    * ([[retrainIvfPqIndex]]) freeze from — the two paths must never
    * diverge on what "trained" means. */
  private def trainedIvfPqPair(corpus: DataFrame): (DataFrame, DataFrame) = {
    import PqQuantizer._
    val coarse = materializeCoarse(
      KmeansQuantizer.trainedCodebook(corpus, KCells))
    val cb = materializePq(codebooks(subvectors(KmeansQuantizer.quantized(corpus))))
    (coarse, cb)
  }

  def retrainIvfPqIndex(s: SparkSession, indexDir: String,
                        cbTable: String, coarseTable: String): Unit = {
    import s.implicits._
    import PqQuantizer._
    val idx = graft.storage.TxLog.snapshot(s, indexDir).getOrElse(return)
    val corpus = idx.select($"vec_id", $"label", $"v".as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val (coarse, cb) = trainedIvfPqPair(corpus)
      val reencoded = encodeForIvfPqIndex(corpus,
        cb.hint("broadcast"), coarse.hint("broadcast"))
      graft.storage.TxLog.overwrite(reencoded, indexDir)
      coarse.write.format("parquet")
        .mode(org.apache.spark.sql.SaveMode.Overwrite).saveAsTable(coarseTable)
      cb.write.format("parquet")
        .mode(org.apache.spark.sql.SaveMode.Overwrite).saveAsTable(cbTable)
    } finally { corpus.unpersist(); () }
  }

  /** Per-label centroids via the typed VectorAvg Aggregator (the typed
    * UDAF surface), plus each centroid's norm and the label's mean
    * cosine-to-centroid — a cluster-quality profile. Float-order
    * sensitive (mean over doubles) → rows-only; invariants in
    * SimilaritySpec. */
  def labelCentroids(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.VectorFunctions.register(s)
    val e = vcol(Tables(s, dir, "embeddings"))
    val centroids = e.select($"label", $"v").as[(Int, Seq[Double])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(graft.functions.VectorAvg.toColumn.name("centroid"))
      .toDF("label", "centroid")
    e.join(broadcast(centroids), "label")
      .select($"label", $"centroid",
        (dot_product($"v", $"centroid") /
          (sqrt(dot_product($"v", $"v")) * sqrt(dot_product($"centroid", $"centroid"))))
          .as("cos_to_centroid"))
      .groupBy($"label")
      .agg(count(lit(1)).as("n"),
        avg($"cos_to_centroid").as("mean_cos_to_centroid"),
        sqrt(max(dot_product($"centroid", $"centroid"))).as("centroid_norm"))
      .orderBy($"label")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_topk_bruteforce" -> bruteForceTopK _,
    "sim_topk_lsh" -> lshTopK _,
    "sim_topk_ivf" -> ivfTopK _,
    "sim_topk_ivf_trained" -> ivfTrainedTopK _,
    "sim_topk_pq" -> pqTopK _,
    "sim_topk_ivfpq" -> ivfPqTopK _,
    "sim_topk_ivfpq_res" -> ivfPqResTopK _,
    "sim_label_centroids" -> labelCentroids _)
}

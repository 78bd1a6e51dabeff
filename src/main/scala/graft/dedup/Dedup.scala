package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextAnalysis.tokens

/** Deduplication operators for training-data pipelines, each designed for
  * the 100 TB shape first and demonstrated on the `documents` table:
  *
  *  - exact:   hash-groupBy — one shuffle on the content hash, the
  *             canonical first pass at any scale;
  *  - jaccard: exact token-set Jaccard over BLOCKED pairs (never all
  *             pairs: blocking key = (lang, length bucket) bounds the
  *             quadratic term to within-block);
  *  - minhash: MinHash signatures + LSH banding — the scale path: one
  *             narrow signature per doc, band-bucket shuffle, candidate
  *             pairs only within colliding buckets, then exact
  *             verification of candidates alone;
  *  - simhash: 64-bit SimHash + multi-band blocking on 16-bit chunks,
  *             Hamming-distance verification via bit_count(xor).
  *
  * Exact dedup and Jaccard are DuckDB-oracle-checked; minhash/simhash use
  * Spark's xxhash64 (no portable SQL form → rows-only checks, SURVEY
  * §2.5) but are invariant-tested in DedupSpec against planted
  * near-duplicates.
  */
object Dedup {

  /** Exact dedup on content hash: canonical keep = min doc_id per group.
    * At 100 TB this is the right first pass — map-side partial agg on
    * md5, single shuffle, output is the keep-list. */
  def exact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .groupBy(md5($"text".cast("binary")).as("content_hash"))
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy($"keep_id")
  }

  private def distinctTokens(c: Column): Column = array_distinct(tokens(c))

  /** Blocking key: same lang + 100-char length bucket. Bounds candidate
    * pairs to within-block — the difference between O(n²) and feasible at
    * scale. */
  private def blocked(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import s.implicits._
    val d = Tables(s, dir, "documents")
      .select($"doc_id", $"lang", floor(length($"text") / 100).cast("int").as("len_bucket"),
        distinctTokens($"text").as("toks"))
    val a = d.select($"lang", $"len_bucket", $"doc_id".as("doc_a"), $"toks".as("toks_a"))
    val b = d.select($"lang", $"len_bucket", $"doc_id".as("doc_b"), $"toks".as("toks_b"))
    (a, b)
  }

  /** Exact token-set Jaccard near-dup pairs over blocked pairs,
    * threshold 0.5. Oracle-checked (integer intersect/union sizes; the
    * one division is the same IEEE op in both engines). */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (a, b) = blocked(s, dir)
    val inter = size(array_intersect($"toks_a", $"toks_b")).cast("bigint")
    val uni = (size($"toks_a") + size($"toks_b")).cast("bigint") - inter
    a.join(b, Seq("lang", "len_bucket")).filter($"doc_a" < $"doc_b")
      .select($"lang", $"doc_a", $"doc_b", inter.as("n_inter"), uni.as("n_union"),
        (inter.cast("double") / uni.cast("double")).as("jaccard"))
      .filter($"jaccard" >= 0.5)
      .orderBy($"doc_a", $"doc_b")
  }

  // ----------------------------------------------------------- MinHash
  private val P = 2147483647L // 2^31-1, Mersenne prime
  val NumHashes = 32
  val Bands = 8 // × 4 rows per band

  /** MinHash signature as NumHashes affine permutations of a 31-bit token
    * hash: sig_j = min over tokens of (a_j·h + b_j mod P). Stays within
    * long range (h < 2^31, a_j < 2^7) — overflow-free under ANSI mode. */
  def minhashSignature(toksCol: Column): Seq[Column] = {
    val h31 = (t: Column) => pmod(xxhash64(t), lit(P))
    (0 until NumHashes).map { j =>
      val a = 2L * j + 1 // odd multipliers
      val b = (j * 40503L + 1) % P
      array_min(transform(toksCol, t => pmod(h31(t) * a + b, lit(P))))
        .as(s"sig_$j")
    }
  }

  /** Word 3-gram shingles — the standard near-dup unit: random documents
    * share almost no shingles (candidate sets stay tiny at any corpus
    * size), while true near-duplicates share most. Built with a SQL-lambda
    * sliding window over the token array. */
  def shingles(toksCol: String): Column = expr(
    s"""array_distinct(transform(
       |  sequence(0, greatest(size($toksCol) - 3, 0) - 1),
       |  i -> concat_ws(' ', element_at($toksCol, i + 1),
       |       element_at($toksCol, i + 2), element_at($toksCol, i + 3))))""".stripMargin)

  /** MinHash + LSH banding over 3-token shingles: docs sharing ANY band
    * bucket become candidate pairs; candidates (alone) are then verified
    * with exact shingle Jaccard. The only wide operation is the
    * groupBy-shaped self-join on (band, band_hash) — candidate count, not
    * corpus², drives cost; with shingles that count tracks the true
    * near-dup rate (on this synthetic corpus: ~none — recall is
    * invariant-tested against planted duplicates in DedupSpec). */
  def minhashLsh(s: SparkSession, dir: String): DataFrame =
    minhashLshOver(Tables(s, dir, "documents"))

  def minhashLshOver(documents: DataFrame): DataFrame = {
    val s = documents.sparkSession
    import s.implicits._
    val d = documents
      .select($"doc_id", tokens($"text").as("raw_toks"))
      .select($"doc_id", shingles("raw_toks").as("toks"))
      .filter(size($"toks") > 0)
    val sigs = d.select(($"doc_id" +: $"toks" +: minhashSignature($"toks")): _*)
    // band j hash = murmur3 over its 4 signature rows
    val bandCols = (0 until Bands).map { j =>
      struct(lit(j).as("band"),
        hash((j * 4 until (j + 1) * 4).map(i => col(s"sig_$i")): _*).as("bh"))
    }
    val banded = sigs.select($"doc_id", $"toks", explode(array(bandCols: _*)).as("b"))
      .select($"doc_id", $"toks", $"b.band", $"b.bh")
    val a = banded.select($"band", $"bh", $"doc_id".as("doc_a"), $"toks".as("toks_a"))
    val b = banded.select($"band", $"bh", $"doc_id".as("doc_b"), $"toks".as("toks_b"))
    val inter = size(array_intersect($"toks_a", $"toks_b")).cast("bigint")
    val uni = (size($"toks_a") + size($"toks_b")).cast("bigint") - inter
    a.join(b, Seq("band", "bh")).filter($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b", $"toks_a", $"toks_b").distinct() // candidate set
      .select($"doc_a", $"doc_b",
        (inter.cast("double") / uni.cast("double")).as("jaccard"))
      .filter($"jaccard" >= 0.3)
      .orderBy($"doc_a", $"doc_b")
  }

  // ----------------------------------------------------------- SimHash
  /** 64-bit SimHash over tokens: per-bit votes ±1 by token hash bits,
    * sign of the vote sum becomes the bit. Pure higher-order expressions
    * (SQL text form for column-indexed bit shifts). */
  def simhashCol(toksCol: String): Column = {
    val votes =
      s"""aggregate($toksCol, array_repeat(cast(0 as bigint), 64),
         |  (acc, t) -> zip_with(acc,
         |     transform(sequence(0, 63), i ->
         |       CASE WHEN (shiftright(xxhash64(t), i) & 1) = 1 THEN 1 ELSE -1 END),
         |     (a, v) -> a + v))""".stripMargin
    expr(
      s"""aggregate(
         |  zip_with($votes, sequence(0, 63),
         |    (v, i) -> CASE WHEN v > 0 THEN shiftleft(cast(1 as bigint), i)
         |              ELSE cast(0 as bigint) END),
         |  cast(0 as bigint), (a, b) -> a + b)""".stripMargin)
  }

  /** SimHash near-dup pairs: block on the four 16-bit chunks (a pair
    * within Hamming distance 3 must agree on ≥1 chunk — pigeonhole), then
    * verify Hamming via bit_count(xor). */
  def simhash(s: SparkSession, dir: String): DataFrame =
    simhashOver(Tables(s, dir, "documents"))

  def simhashOver(documents: DataFrame): DataFrame = {
    val s = documents.sparkSession
    import s.implicits._
    val d = documents
      .select($"doc_id", distinctTokens($"text").as("toks"))
      .filter(size($"toks") > 0)
      .select($"doc_id", simhashCol("toks").as("sh"))
    val chunks = (0 until 4).map(j =>
      struct(lit(j).as("chunk"),
        (shiftright($"sh", j * 16).bitwiseAND(lit(0xFFFFL))).as("ch")))
    val blocked = d.select($"doc_id", $"sh", explode(array(chunks: _*)).as("c"))
      .select($"doc_id", $"sh", $"c.chunk", $"c.ch")
    val a = blocked.select($"chunk", $"ch", $"doc_id".as("doc_a"), $"sh".as("sh_a"))
    val b = blocked.select($"chunk", $"ch", $"doc_id".as("doc_b"), $"sh".as("sh_b"))
    a.join(b, Seq("chunk", "ch")).filter($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b",
        bit_count($"sh_a".bitwiseXOR($"sh_b")).cast("int").as("hamming"))
      .distinct()
      .filter($"hamming" <= 12)
      .orderBy($"doc_a", $"doc_b")
  }

  /** Embedding-cosine near-dup pairs (brute force within a<b — correct
    * baseline at test scale; the LSH-bucketed scale path lives in
    * graft.sim.Similarity). Float-order-sensitive → rows-only check. */
  def embeddingCosine(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables(s, dir, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .withColumn("norm", sqrt(aggregate($"v", lit(0.0), (a, x) => a + x * x)))
    val a = e.select($"vec_id".as("vec_a"), $"v".as("va"), $"norm".as("na"))
    val b = e.select($"vec_id".as("vec_b"), $"v".as("vb"), $"norm".as("nb"))
    val dot = aggregate(zip_with($"va", $"vb", (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    a.crossJoin(b).filter($"vec_a" < $"vec_b")
      .select($"vec_a", $"vec_b", (dot / ($"na" * $"nb")).as("cos_sim"))
      .filter($"cos_sim" >= 0.35)
      .orderBy($"vec_a", $"vec_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> exact _,
    "dedup_jaccard" -> ngramJaccard _,
    "dedup_minhash_lsh" -> minhashLsh _,
    "dedup_simhash" -> simhash _,
    "dedup_embedding_cosine" -> embeddingCosine _)
}

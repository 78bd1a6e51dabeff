package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Declared6

/** Round-6 invariants. Each query is already DuckDB-hash-checked via
  * Verify; these specs pin the properties the oracle can't see — the
  * sketch pass losing nothing, the sweep matching brute-force
  * dominance, bloom-vs-plain row identity, and a driver-recomputed
  * fixed-point PageRank reference. */
class Declared6Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  private def norm(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted.map(c => col(c).cast("string"))
    df.select(cols.toIndexedSeq: _*).collect().map(_.mkString("|")).toSeq.sorted
  }

  test("q65: the Misra-Gries candidate pass loses nothing vs the full-stream groupBy") {
    import spark.implicits._
    import graft.text.TextAnalysis.tokens
    val toks = tokens($"text")
    val bigrams = Tables(spark, sf, "documents")
      .filter(size(tokens($"text")) >= 2)
      .select(explode(zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat_ws(" ", a, b))).as("bg"))
    val brute = bigrams.groupBy($"bg").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(bigrams.agg(count(lit(1)).as("n"))))
      .filter($"cnt" * Declared6.HhPhi > $"n")
      .select($"bg".as("bigram"), $"cnt")
    assert(norm(Declared6.q65(spark, sf)) == norm(brute))
  }

  test("q66: merge applies deletes/updates/inserts with exact key accounting") {
    import spark.implicits._
    val out = Declared6.q66(spark, sf).cache()
    // output keys unique
    assert(out.groupBy($"c_custkey").count().filter($"count" > 1).count() == 0)
    // every customer whose latest order is 'F' is gone; all others kept
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey").orderBy($"o_orderdate".desc, $"o_orderkey".desc)
    val latest = Tables(spark, sf, "orders")
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
    val deleted = latest.filter($"o_orderstatus" === "F").select($"o_custkey")
    assert(out.join(deleted, out("c_custkey") === deleted("o_custkey")).count() == 0)
    val nCust = Tables(spark, sf, "customer").count()
    val nDel = deleted.count()
    val nIns = Tables(spark, sf, "orders")
      .filter($"o_orderkey" % Declared6.MergeInsertMod === 0).count()
    assert(out.count() == nCust - nDel + nIns)
    // inserted rows carry the synthetic key range and op marker
    assert(out.filter($"c_custkey" >= Declared6.MergeInsertBase)
      .filter($"last_op" =!= "insert").count() == 0)
    out.unpersist()
  }

  test("q67: two-phase sweep equals brute-force dominance") {
    import spark.implicits._
    val parts = Tables(spark, sf, "part")
      .select($"p_partkey", floor($"p_retailprice" * 100).cast("long").as("cents"),
        $"p_size")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val brute = parts.filter { case (_, c, s0) =>
      !parts.exists { case (_, bc, bs) =>
        bc <= c && bs >= s0 && (bc < c || bs > s0)
      }
    }.map { case (k, c, s0) => s"$k|$c|$s0" }.sorted.toSeq
    val got = Declared6.q67(spark, sf).collect()
      .map(r => s"${r.getLong(0)}|${r.getLong(1)}|${r.getInt(2)}").sorted.toSeq
    assert(got == brute)
  }

  test("q68: quotas are a largest-remainder apportionment of the budget") {
    import spark.implicits._
    val out = Declared6.q68(spark, sf).cache()
    // budget fully spent (every source has >= its quota available here)
    assert(out.count() == Declared6.MixBudget)
    // per-source takes are the smallest doc_ids of that source
    val joined = out.groupBy($"source").agg(max($"doc_id").as("maxSel"),
      count(lit(1)).as("take"))
    val viol = Tables(spark, sf, "documents").join(joined, "source")
      .filter($"doc_id" < $"maxSel")
      .groupBy($"source", $"take").agg(count(lit(1)).as("below"))
      // rows strictly below the max selected id must number take-1 —
      // i.e. the take is a doc_id prefix of the source
      .filter($"below" =!= $"take" - 1)
    assert(viol.count() == 0)
    out.unpersist()
  }

  test("q56b: bloom-prefiltered contamination is row-identical to q56") {
    assert(norm(Declared6.q56b(spark, sf)) ==
      norm(graft.queries.Declared5.q56(spark, sf)))
  }

  test("q70: PosNgrams kernel — positions and windows match a naive reimplementation") {
    import spark.implicits._
    val samples = Seq("a b c d", "", "  x  ", "a a a a a", null,
      "one two three four five six seven eight nine")
    val got = samples.toDF("text")
      .select(explode_outer(graft.functions.TokenFunctions.pos_ngrams($"text", 3)).as("s"))
      .select($"s.pos", $"s.gram").collect()
      .map(r => if (r.isNullAt(0)) null else (r.getInt(0), r.getString(1))).toSeq
    val expect = samples.flatMap { t =>
      val toks = Option(t).getOrElse("").split(" ").filter(_.nonEmpty)
      if (toks.length < 3) Seq(null)
      else (0 to toks.length - 3).map(i => (i + 1, toks.slice(i, i + 3).mkString(" ")))
    }
    assert(got == expect)
  }

  test("q70: per-doc dup-span counters are internally consistent") {
    import spark.implicits._
    val out = Declared6.q70(spark, sf).cache()
    assert(out.filter($"n_dup_spans" > $"n_spans").count() == 0)
    assert(out.filter($"n_dup_spans" > 0 && $"first_dup_pos".isNull).count() == 0)
    assert(out.filter($"n_dup_spans" === 0 && $"first_dup_pos".isNotNull).count() == 0)
    assert(out.filter($"first_dup_pos" > $"n_spans").count() == 0) // pos ≤ window count
    out.unpersist()
  }

  test("q71: the sample is a deterministic pure function of the data") {
    val a = Declared6.q71(spark, sf).collect().map(_.toSeq).toSeq
    val b = Declared6.q71(spark, sf).collect().map(_.toSeq).toSeq
    assert(a == b && a.nonEmpty)
    // exactly k docs per source (every source has ≥ k docs here)
    val perSrc = Declared6.q71(spark, sf).groupBy("source").count().collect()
    assert(perSrc.forall(_.getLong(1) == Declared6.HsK))
  }

  test("q72: base+delta partial merge equals a single full recompute (IVM losslessness)") {
    import spark.implicits._
    val full = Tables(spark, sf, "events")
      .select($"user_id", floor($"value" * 100).cast("long").as("cents"))
      .groupBy($"user_id").agg(count(lit(1)).as("n_events"),
        sum($"cents").as("sum_cents"), min($"cents").as("min_cents"),
        max($"cents").as("max_cents"))
    assert(norm(Declared6.q72(spark, sf)) == norm(full))
  }

  test("q73: the partition-accumulated Gram pass and iteration converge to an eigenvector") {
    import spark.implicits._
    val d = Declared6.PiDim
    // driver-recomputed quantized Gram matrix (naive reference)
    val vecs = Tables(spark, sf, "embeddings").select($"embedding")
      .as[Array[Float]].collect()
      .map(_.map(x => math.floor(x.toDouble * Declared6.PiScale).toLong))
    val gram = Array.ofDim[Long](d * d)
    vecs.foreach(q => for (i <- 0 until d; j <- 0 until d) gram(i * d + j) += q(i) * q(j))
    val v3 = Declared6.q73(spark, sf).collect().map(r => r.getLong(1).toDouble)
    assert(v3.length == d)
    // v3 should be near the dominant eigendirection: cos(Gv, v) ≈ 1
    val gv = Array.tabulate(d)(i => (0 until d).map(j => gram(i * d + j).toDouble * v3(j)).sum)
    def dot(a: Array[Double], b: Array[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
    val cos = dot(gv, v3) / math.sqrt(dot(gv, gv) * dot(v3, v3))
    assert(cos > 0.995, s"not an eigendirection: cos(Gv,v)=$cos")
  }

  test("q69: distributed fixed-point PageRank matches a driver-computed reference") {
    import spark.implicits._
    val li = Tables(spark, sf, "lineitem")
      .select($"l_suppkey", $"l_partkey").distinct()
      .collect().map(r => (r.getLong(0) * 2, r.getLong(1) * 2 + 1))
    val edges = li.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val nodes = deg.keys.toSeq
    var ranks = nodes.map(_ -> Declared6.PrScale).toMap
    val base = 15L * Declared6.PrScale / 100
    for (_ <- 1 to Declared6.PrIters) {
      val sums = scala.collection.mutable.HashMap.empty[Long, Long]
      edges.foreach { case (s0, d) =>
        sums(d) = sums.getOrElse(d, 0L) + ranks(s0) / deg(s0)
      }
      ranks = nodes.map(n => n -> (base + 85L * sums.getOrElse(n, 0L) / 100)).toMap
    }
    val expect = ranks.toSeq.map { case (nid, pr) =>
      val t = if (nid % 2 == 0) "supplier" else "part"
      s"$t|${nid / 2}|$pr"
    }.sorted
    val got = Declared6.q69(spark, sf).collect()
      .map(r => s"${r.getString(0)}|${r.getLong(1)}|${r.getLong(2)}").sorted.toSeq
    assert(got == expect)
  }
}

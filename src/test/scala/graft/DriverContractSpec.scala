package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver-facing contract: Verify must dump every query +
  * a parseable oracle_sql.json even under partial failure — a crash here
  * zeroes a round's correctness score. */
class DriverContractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("oracle_sql.json escaping handles control characters") {
    // mirror of Verify.q — the JSON escape must round-trip via a strict
    // parser for every SQL text we ship
    val texts = SparkEntry.oracleSql.values.toSeq :+ "line\nbreak\ttab \"q\" \\ "
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = texts.zipWithIndex
      .map { case (t, i) => s""""k$i": ${q(t)}""" }.mkString("{", ",", "}")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val parsed = mapper.readTree(json)
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(parsed.get(s"k$i").asText == t)
    }
  }

  test("every query map key is a valid file/dir name for Verify's dumps") {
    SparkEntry.queries.keys.foreach { k =>
      assert(k.matches("[A-Za-z0-9_]+"), s"unsafe query key: $k")
    }
  }

  test("ETL run on missing and empty data dirs degrades gracefully") {
    val base = Files.createTempDirectory("etl_empty_")
    Files.writeString(base.resolve("user-events-schema.json"),
      graft.etl.EtlFixtures.userSchemaJson)
    val conf = graft.etl.EntityConf("users",
      base.resolve("user-events-schema.json").toString,
      base.resolve("users").toString, // does not exist
      base.resolve("users.csv").toString, None,
      base.resolve("users_schema_mismatches").toString)
    val r1 = graft.etl.EntityPipeline.run(spark, conf, graft.etl.V1,
      base.resolve("errors.log").toString)
    assert(r1.metrics == graft.etl.EtlMetrics(0, 0, 0))
    assert(!Files.exists(base.resolve("users.csv"))) // nothing written

    Files.createDirectories(base.resolve("users")) // now empty dir
    val r2 = graft.etl.EntityPipeline.run(spark, conf, graft.etl.V1,
      base.resolve("errors.log").toString)
    assert(r2.metrics == graft.etl.EtlMetrics(0, 0, 0))
    // header-only CSV — the reference's open-and-writeheader parity
    val lines = Files.readAllLines(base.resolve("users.csv")).asScala
    assert(lines.size == 1 && lines.head.startsWith("id,name,address"))
  }
}

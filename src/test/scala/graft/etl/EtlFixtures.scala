package graft.etl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

/** Fixture corpus per /root/repo/FIXTURES.md §1: the three reference
  * samples (verbatim values) + the survey's edge cases F4-F14. */
object EtlFixtures {

  val userSchemaJson: String =
    """{
      |  "$schema": "http://json-schema.org/draft-07/schema#",
      |  "title": "Users",
      |  "type": "object",
      |  "properties": {
      |    "metadata": {
      |      "type": "object",
      |      "properties": {
      |        "type": { "type": "string" },
      |        "event_at": { "type": "string", "format": "date-time" },
      |        "event_id": { "type": "string", "format": "uuid" }
      |      },
      |      "required": ["type", "event_at", "event_id"]
      |    },
      |    "payload": {
      |      "type": "object",
      |      "properties": {
      |        "id": { "type": "integer" },
      |        "name": { "type": "string" },
      |        "address": { "type": "string" },
      |        "job": { "type": "string" },
      |        "score": { "type": "number" }
      |      },
      |      "required": ["id", "name", "address", "job", "score"]
      |    }
      |  },
      |  "required": ["metadata", "payload"]
      |}""".stripMargin

  val cardSchemaJson: String =
    """{
      |  "$schema": "http://json-schema.org/draft-07/schema#",
      |  "title": "Cards",
      |  "type": "object",
      |  "properties": {
      |    "payload": {
      |      "type": "object",
      |      "properties": {
      |        "id": { "type": "integer" },
      |        "user_id": { "type": "integer" },
      |        "created_by_name": { "type": "string" },
      |        "updated_at": { "type": "string", "format": "date-time" },
      |        "created_at": { "type": "string", "format": "date-time" },
      |        "active": { "type": "boolean" }
      |      },
      |      "required": ["id", "user_id", "created_by_name", "updated_at", "created_at", "active"]
      |    },
      |    "metadata": {
      |      "type": "object",
      |      "properties": {
      |        "type": { "type": "string" },
      |        "event_at": { "type": "string", "format": "date-time" },
      |        "event_id": { "type": "string", "format": "uuid" }
      |      },
      |      "required": ["type", "event_at", "event_id"]
      |    }
      |  },
      |  "required": ["payload", "metadata"]
      |}""".stripMargin

  private def userEvent(id: Int, name: String, address: String, job: String,
                        score: String, eventId: String,
                        eventAt: String = "2023-10-23 22:55:01",
                        dropFields: Set[String] = Set.empty): String = {
    val payload = Seq(
      "id" -> id.toString, "name" -> s""""$name"""",
      "address" -> s""""${address.replace("\n", "\\n")}"""",
      "job" -> s""""$job"""", "score" -> score)
      .filterNot(kv => dropFields.contains(kv._1))
      .map { case (k, v) => s""""$k": $v""" }.mkString(", ")
    s"""{"metadata": {"type": "user", "event_at": "$eventAt", "event_id": "$eventId"},
       | "payload": {$payload}}""".stripMargin
  }

  private def cardEvent(id: Int, userId: Option[Int], name: Option[String],
                        active: Boolean, eventId: String,
                        at: String, createdAt: String = "",
                        dropActive: Boolean = false): String = {
    val cAt = if (createdAt.isEmpty) at else createdAt
    val payload = (Seq(s""""id": $id""") ++
      userId.map(u => s""""user_id": $u""") ++
      name.map(n => s""""created_by_name": "$n"""") ++
      Seq(s""""updated_at": "$at"""", s""""created_at": "$cAt"""") ++
      (if (dropActive) Nil else Seq(s""""active": $active"""))).mkString(", ")
    s"""{"payload": {$payload},
       | "metadata": {"type": "card", "event_at": "$at", "event_id": "$eventId"}}""".stripMargin
  }

  /** Lays out baseDir like the reference CWD: schema files + users/ +
    * cards/ data dirs. File names are ordered so src_path order == Fn
    * order. Returns baseDir. */
  def writeCorpus(baseDir: Path): Path = {
    val users = Files.createDirectories(baseDir.resolve("users"))
    val cards = Files.createDirectories(baseDir.resolve("cards"))
    def w(p: Path, s: String) = Files.write(p, s.getBytes(StandardCharsets.UTF_8))
    w(baseDir.resolve("user-events-schema.json"), userSchemaJson)
    w(baseDir.resolve("card-events-schema.json"), cardSchemaJson)

    // F1: reference users-sample.json values (newline in address)
    w(users.resolve("f01.json"), userEvent(945, "Lawrence Welch",
      "8279 Rodriguez Ports\nPaulbury, VI 89148", "Commercial horticulturist",
      "0.8627791036375512", "0a1bc396-f73d-4919-94c4-84077fdf7456"))
    // F4: comma job → python-capitalize rewrite
    w(users.resolve("f04.json"), userEvent(101, "Alice Stone", "1 Main St",
      "Engineer, site reliability", "0.5", "00000000-0000-4000-8000-000000000004"))
    // F5: 4-token name
    w(users.resolve("f05.json"), userEvent(102, "Dr. Jane Doe PhD", "2 Oak Ave",
      "Architect", "0.25", "00000000-0000-4000-8000-000000000005"))
    // F6: 3-token name with title
    w(users.resolve("f06.json"), userEvent(103, "Mr. Bob Smith", "3 Elm Rd",
      "Baker", "0.75", "00000000-0000-4000-8000-000000000006"))
    // F7: 3-token name, no title → unconditional suffix (dead suffix list)
    w(users.resolve("f07.json"), userEvent(104, "Ann Lee Jr.", "4 Pine Ln",
      "Chef", "0.125", "00000000-0000-4000-8000-000000000007"))
    // F8: 6-token name untouched
    w(users.resolve("f08.json"), userEvent(105, "Juan de la Cruz Santos III",
      "5 Birch Blvd", "Pilot", "1.5", "00000000-0000-4000-8000-000000000008"))
    // F9: type mismatch (score string) → dropped
    w(users.resolve("f09.json"), userEvent(106, "Bad Score", "6 Cedar Ct",
      "Clerk", "\"high\"", "00000000-0000-4000-8000-000000000009"))
    // F10: non-date event_at + non-uuid event_id pass (format unenforced)
    w(users.resolve("f10.json"), userEvent(107, "Odd Dates", "7 Walnut Way",
      "Scribe", "0.0625", "not-a-uuid", eventAt = "not-a-date"))
    // F11: missing job (address present) → reference crashes; engine keeps
    w(users.resolve("f11.json"), userEvent(108, "No Job", "8 Maple Dr",
      "", "0.375", "00000000-0000-4000-8000-000000000011",
      dropFields = Set("job")))
    // F14: non-.json file → skipped, not counted
    w(users.resolve("notes.txt"), "not an event")

    // F2: reference cards-complete-sample.json values
    w(cards.resolve("f02.json"), cardEvent(2079, Some(745), Some("Troy Rosario"),
      active = true, "0a4d29d2-b6dd-42a9-88af-840ead26202f", "2023-10-23 23:18:15",
      createdAt = "2023-10-23 23:16:17"))
    // F3: reference cards-incomplete-sample.json values (missing user_id)
    w(cards.resolve("f03.json"), cardEvent(4965, None, Some("Justin Miller"),
      active = false, "0088d1de-f426-4dce-bc7f-3207e151f337", "2023-10-23 23:26:31"))
    // F12: missing created_by_name → required, kept with blanks
    w(cards.resolve("f12.json"), cardEvent(5001, Some(300), None,
      active = true, "00000000-0000-4000-8000-000000000012", "2023-10-23 23:30:00"))
    // F13b: missing required BOOLEAN → kept with blank active (a null
    // boolean must stringify to '', not a fabricated "False")
    w(cards.resolve("f13.json"), cardEvent(5002, Some(301), Some("No Active"),
      active = true, "00000000-0000-4000-8000-000000000013", "2023-10-23 23:31:00",
      dropActive = true))
    baseDir
  }
}

package graft.etl

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** One declared property of an envelope part. `jsonType` is the JSON
  * Schema type name (`string`/`integer`/`number`/`boolean`). */
final case class FieldSpec(name: String, jsonType: String) {
  def sparkType: DataType = jsonType match {
    case "integer" => LongType
    case "number"  => DoubleType
    case "boolean" => BooleanType
    case _         => StringType
  }
}

/** Compiled form of an event JSON Schema (draft-07 subset actually used by
  * the reference: `type` ∈ {object,string,integer,number,boolean},
  * `properties`, `required`; `format` is annotation-only and deliberately
  * NOT enforced — `/root/reference/main.py:59-65` calls validate() without
  * a FormatChecker, verified in SURVEY.md §1.2).
  *
  * Field/part ORDER is normative: output CSV columns are derived from the
  * schema's `required` lists, payload-first (`main.py:87-97`), and v2
  * post-processes them (`main2.py:148-184`): append `event_id`, insert
  * `prefix`/`suffix` around `name`/`created_by_name`.
  */
final case class CompiledSchema(
    /** top-level parts (metadata/payload) in schema property order —
      * drives validation error ordering */
    partOrder: Seq[String],
    topRequired: Seq[String],
    payloadFields: Seq[FieldSpec],
    metadataFields: Seq[FieldSpec],
    payloadRequired: Seq[String],
    metadataRequired: Seq[String]) {

  /** Spark envelope struct for from_json: all DECLARED properties (not
    * just required) so extra declared fields parse; undeclared fields are
    * dropped by the struct itself (= extrasaction='ignore'). */
  def envelopeStruct: StructType = StructType(Seq(
    StructField("metadata", StructType(
      metadataFields.map(f => StructField(f.name, f.sparkType)))),
    StructField("payload", StructType(
      payloadFields.map(f => StructField(f.name, f.sparkType))))))

  def fieldType(part: String, name: String): Option[String] = {
    val fs = if (part == "payload") payloadFields else metadataFields
    fs.find(_.name == name).map(_.jsonType)
  }

  /** v1 output columns: payload required ++ metadata required
    * (`main.py:87-97`; metadata wins on name collision — none occur). */
  def v1Columns: Seq[String] = payloadRequired ++ metadataRequired

  /** v2 payload-table columns (`main2.py:148-184`): required + event_id FK,
    * then prefix/suffix inserted around the name-ish column. */
  def v2PayloadColumns: Seq[String] = {
    val base = (payloadRequired :+ "event_id").toBuffer
    val nameCol = Seq("name", "created_by_name").find(base.contains)
    nameCol.foreach { nc =>
      val i = base.indexOf(nc)
      base.insert(i, "prefix")
      base.insert(i + 2, "suffix")
    }
    base.toSeq
  }

  /** v2 metadata-table columns — the shared/unified metadata dimension. */
  def v2MetadataColumns: Seq[String] = metadataRequired
}

object SchemaCompiler {
  private val mapper = new ObjectMapper()

  def compile(schemaPath: String): CompiledSchema = {
    val root = mapper.readTree(new java.io.File(schemaPath))
    compileNode(root)
  }

  def compileJson(schemaJson: String): CompiledSchema =
    compileNode(mapper.readTree(schemaJson))

  private def compileNode(root: JsonNode): CompiledSchema = {
    val props = root.get("properties")
    val partOrder = props.fieldNames().asScala.toSeq
    def fields(part: String): Seq[FieldSpec] = {
      val p = props.get(part).get("properties")
      p.fieldNames().asScala.toSeq.map { n =>
        FieldSpec(n, Option(p.get(n).get("type")).map(_.asText).getOrElse("string"))
      }
    }
    def required(node: JsonNode): Seq[String] =
      Option(node.get("required")).map(_.elements().asScala.toSeq.map(_.asText))
        .getOrElse(Nil)
    CompiledSchema(
      partOrder = partOrder,
      topRequired = required(root),
      payloadFields = fields("payload"),
      metadataFields = fields("metadata"),
      payloadRequired = required(props.get("payload")),
      metadataRequired = required(props.get("metadata")))
  }
}

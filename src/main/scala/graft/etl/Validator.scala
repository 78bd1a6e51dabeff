package graft.etl

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Row-level JSON Schema validation (reference O4/O5,
  * `/root/reference/main.py:59-65,176-189`).
  *
  * Checks exactly what python-jsonschema checks for the draft-07 subset the
  * reference uses: `type` and `required`. `format` annotations (date-time,
  * uuid) are NOT enforced — `"not-a-date"` passes, verified against the
  * reference (SURVEY.md §1.2).
  *
  * Classification drives the 3-way routing (`main.py:176-189`, substring
  * test `'is a required property' in message`):
  *  - "ok"       → fully valid, emitted
  *  - "required" → recoverable (missing required field) → logged +
  *                 quarantined + still emitted with blanks when
  *                 `replace_missing_data` is on
  *  - "other"    → type mismatch etc. → logged + quarantined + dropped
  *  - "parse"    → malformed JSON; the reference crashes
  *                 (`json.JSONDecodeError`, `main.py:172`) — we route it
  *                 like "other" (documented divergence D2, SURVEY §7.5)
  *
  * Error ordering when multiple defects exist: parts in schema property
  * order, within a part fields in declared order, presence before type —
  * deterministic, vs jsonschema's relevance heuristic (the reference only
  * surfaces one error per file anyway).
  */
object Validator extends Serializable {

  final case class Verdict(errClass: String, errField: String, errMsg: String)
  val ok: Verdict = Verdict("ok", "", "")

  @transient private lazy val mapper = new ObjectMapper()

  /** Python-repr-ish rendering of a JSON value for jsonschema-style
    * messages: `'high' is not of type 'number'`, `True is not of type
    * 'integer'`. */
  private def pyRepr(n: JsonNode): String =
    if (n.isTextual) s"'${n.asText}'"
    else if (n.isBoolean) { if (n.asBoolean) "True" else "False" }
    else if (n.isNull) "None"
    else n.toString

  private def typeMatches(n: JsonNode, jsonType: String): Boolean = jsonType match {
    case "string"  => n.isTextual
    case "boolean" => n.isBoolean
    // jsonschema draft-07: booleans are NOT integers/numbers (python bool
    // is excluded explicitly); floats with zero fraction ARE integers.
    case "integer" => n.isIntegralNumber ||
      (n.isFloatingPointNumber && n.asDouble() == Math.floor(n.asDouble()) &&
        !n.asDouble().isInfinite)
    case "number"  => n.isNumber
    case "object"  => n.isObject
    case _         => true
  }

  def validate(raw: String, schema: CompiledSchema): Verdict = {
    val root =
      try mapper.readTree(raw)
      catch { case e: Exception =>
        return Verdict("parse", "", s"malformed JSON: ${e.getMessage}")
      }
    // Jackson returns null for EMPTY input (no exception) — the reference
    // would raise JSONDecodeError there, so route it as a parse failure;
    // pyRepr must never see null.
    if (root == null || root.isMissingNode)
      return Verdict("parse", "", "malformed JSON: empty input")
    if (!root.isObject)
      return Verdict("other", "", s"${pyRepr(root)} is not of type 'object'")

    // Top-level parts in schema property order: presence, then type, then
    // the part's own required/type checks. For multi-defect files this
    // first-error order can differ from python-jsonschema's traversal
    // order and flip routing — documented divergence D6 (SURVEY §7.5).
    for (part <- schema.partOrder) {
      val node = root.get(part)
      if (node == null) {
        if (schema.topRequired.contains(part))
          return Verdict("required", part, s"'$part' is a required property")
      } else {
        if (!node.isObject)
          return Verdict("other", part, s"${pyRepr(node)} is not of type 'object'")
        val (fields, required) =
          if (part == "payload") (schema.payloadFields, schema.payloadRequired)
          else (schema.metadataFields, schema.metadataRequired)
        for (f <- fields) {
          val v = node.get(f.name)
          if (v == null) {
            if (required.contains(f.name))
              return Verdict("required", f.name, s"'${f.name}' is a required property")
          } else if (!typeMatches(v, f.jsonType)) {
            return Verdict("other", f.name,
              s"${pyRepr(v)} is not of type '${f.jsonType}'")
          }
        }
        // required names not among declared properties (none in practice)
        for (r <- required if node.get(r) == null && !fields.exists(_.name == r))
          return Verdict("required", r, s"'$r' is a required property")
      }
    }
    ok
  }

  /** Column form: struct(errClass, errField, errMsg). Registered as a UDF —
    * the validation is a per-row pure function over the raw file text, so
    * it parallelizes embarrassingly; the envelope data itself is parsed by
    * the codegen'd from_json, not here. */
  def validateCol(schema: CompiledSchema): Column => Column = {
    val s = schema // serializable case class captured by the closure
    val f = udf((raw: String) => validate(raw, s))
    c => f(c)
  }
}

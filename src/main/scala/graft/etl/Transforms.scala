package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's scalar transforms (O10-O13) as pure built-in Column
  * compositions — fully codegen'd, no UDFs (SURVEY.md §4.3).
  *
  * Null handling is divergence D4 (SURVEY §7.5): where the reference
  * crashes on unexpected shapes (missing job/name, multi-comma job), we
  * pass the value through untouched and keep the record.
  */
object Transforms {

  /** Python `str.capitalize()`: first char upper, ALL the rest lower —
    * `"Engineer, SITE"`-style input must become `"Site engineer"`, which
    * Spark's initcap gets wrong (`/root/reference/main.py:121`,
    * SURVEY §2.1 O12). */
  def pyCapitalize(c: Column): Column =
    concat(upper(substring(c, 1, 1)), lower(substring(c, 2, Int.MaxValue)))

  /** O11 address clean: replace every newline with a space
    * (`main.py:111`, `main2.py:230` — Python str.replace replaces all). */
  def addressClean(c: Column): Column = regexp_replace(c, "\n", " ")

  /** O12 job-title rewrite (`main.py:118-124`): only when the job splits
    * on ',' into exactly two parts — `general, spec` →
    * capitalize("{lstrip(spec)} {general}"). The reference raises
    * ValueError on ≥2 commas and KeyError on missing job (D4: we pass
    * through / keep nulls). */
  def fixJob(c: Column): Column = {
    val parts = split(c, ",", -1)
    when(c.isNotNull && size(parts) === 2,
      pyCapitalize(concat(ltrim(element_at(parts, 2)), lit(" "), element_at(parts, 1))))
      .otherwise(c)
  }

  /** O13 name prefix/suffix extraction (`main2.py:234-256`). Returns
    * struct(prefix, name, suffix). Split on single space (Python
    * `split(' ')` keeps empty tokens — so does split(.., -1)):
    *  - 4 tokens → prefix=t0, name="t1 t2", suffix=t3 (unconditional);
    *  - 3 tokens → t0 ∈ {Dr., Mr., Mrs., Ms.} ? prefix=t0, name="t1 t2"
    *               : name="t0 t1", suffix=t2 — the `suffixes` list at
    *               `main2.py:245` is dead code, never consulted
    *               (verified: "Ann Lee Zzz" would also yield suffix Zzz);
    *  - other token counts → untouched, prefix/suffix empty
    *    (DictWriter restval='' semantics);
    *  - null name (reference: UnboundLocalError crash, D4) → untouched. */
  def nameParts(c: Column): Column = {
    val toks = split(c, " ", -1)
    val n = size(toks)
    val t = (i: Int) => element_at(toks, i + 1)
    val titles = array(Seq("Dr.", "Mr.", "Mrs.", "Ms.").map(lit): _*)
    val two = (a: Column, b: Column) => concat(a, lit(" "), b)
    when(c.isNull, struct(lit("").as("prefix"), c.as("name"), lit("").as("suffix")))
      .when(n === 4, struct(
        t(0).as("prefix"), two(t(1), t(2)).as("name"), t(3).as("suffix")))
      .when(n === 3 && array_contains(titles, t(0)), struct(
        t(0).as("prefix"), two(t(1), t(2)).as("name"), lit("").as("suffix")))
      .when(n === 3, struct(
        lit("").as("prefix"), two(t(0), t(1)).as("name"), t(2).as("suffix")))
      .otherwise(struct(lit("").as("prefix"), c.as("name"), lit("").as("suffix")))
  }

  /** O10 event_id FK denormalization (`main2.py:226`): copy
    * metadata.event_id into the payload row, '' when absent. */
  def eventIdFk(metadataEventId: Column): Column =
    coalesce(metadataEventId, lit(""))
}

package graft.etl

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based equivalence (SURVEY §5.2 item 3): the Column
  * implementations must match a direct Scala reimplementation of the
  * Python semantics on generated inputs, and be total (null-safe). */
object TransformsProps extends Properties("Transforms") {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  // ---- oracle reimplementations of the Python semantics ----
  def pyCap(s: String): String =
    if (s.isEmpty) s else s.head.toUpper.toString + s.tail.toLowerCase

  def pyFixJob(job: String): String = {
    val parts = job.split(",", -1)
    if (parts.length == 2) {
      val spec = parts(1).replaceAll("^[\\s]+", "") // lstrip
      pyCap(s"$spec ${parts(0)}")
    } else job
  }

  def pyNameParts(name: String): (String, String, String) = {
    val t = name.split(" ", -1)
    val titles = Set("Dr.", "Mr.", "Mrs.", "Ms.")
    t.length match {
      case 4 => (t(0), s"${t(1)} ${t(2)}", t(3))
      case 3 if titles(t(0)) => (t(0), s"${t(1)} ${t(2)}", "")
      case 3 => ("", s"${t(0)} ${t(1)}", t(2))
      case _ => ("", name, "")
    }
  }

  // batch evaluation through Spark keeps the property runs fast
  def sparkJob(ins: Seq[String]): Seq[String] =
    ins.toDF("x").select(Transforms.fixJob($"x")).collect().map(_.getString(0)).toSeq
  def sparkParts(ins: Seq[String]): Seq[(String, String, String)] =
    ins.toDF("x").select(Transforms.nameParts($"x").as("p"))
      .select($"p.prefix", $"p.name", $"p.suffix").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq

  val word: Gen[String] = Gen.oneOf(
    Gen.alphaStr.map(_.take(8)),
    Gen.oneOf("Dr.", "Mr.", "Mrs.", "Ms.", "PhD", "Jr.", "II", "SITE", "x"))
  val jobGen: Gen[String] = for {
    parts <- Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, word))
    sep <- Gen.oneOf(", ", ",", " ,", ",  ")
  } yield parts.mkString(sep)
  val nameGen: Gen[String] = Gen.chooseNum(0, 6)
    .flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  property("fixJob ≡ python semantics") = forAll(Gen.listOfN(30, jobGen)) { jobs =>
    jobs.isEmpty || sparkJob(jobs) == jobs.map(pyFixJob)
  }

  property("nameParts ≡ python semantics") = forAll(Gen.listOfN(30, nameGen)) { names =>
    names.isEmpty || sparkParts(names) == names.map(pyNameParts)
  }

  property("null safety: transforms never throw on null input") = Prop {
    val df = Seq[Option[String]](None, Some("a, b"), Some("x y z")).toDF("x")
    df.select(Transforms.fixJob($"x"), Transforms.nameParts($"x"),
      Transforms.addressClean($"x"), Transforms.pyCapitalize($"x")).collect()
    true
  }
}

package graft.functions

import java.sql.Timestamp
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property tests for template expansion (SURVEY.md §5.2.3): the Spark
  * expression chain vs. an independent pure-Scala model of the
  * reference's `str.format` call (`data_harvester.py:34-35`), over
  * randomized templates and offsets.
  */
class TemplatesSpec extends SparkSpec {

  /** Reference model: python str.format with the six supported holes. */
  private def model(template: String, utcTs: Timestamp, offsetHours: Int,
      legacy: Boolean): String = {
    val local = utcTs.toInstant.atOffset(ZoneOffset.UTC).plusHours(offsetHours)
    def p(fmt: String) = local.format(DateTimeFormatter.ofPattern(fmt))
    val lastmonth =
      if (legacy) "0" + (local.getMonthValue - 1)              // the f'0{m-1}' bug
      else local.minusMonths(1).format(DateTimeFormatter.ofPattern("MM"))
    template
      .replace("{year}", p("yyyy")).replace("{month}", p("MM"))
      .replace("{lastmonth}", lastmonth).replace("{day}", p("dd"))
      .replace("{hour}", p("HH")).replace("{minute}", p("mm"))
  }

  test("property: expansion agrees with the reference model (seeded random)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val holes = Seq("{year}", "{month}", "{lastmonth}", "{day}", "{hour}", "{minute}")
    val frags = Seq("http://h/", "x", "_", "/", "a{", "}b", ".csv", "{unknown}")
    val cases = (1 to 200).map { _ =>
      val template = Seq.fill(rnd.nextInt(6) + 1)(
        if (rnd.nextBoolean()) holes(rnd.nextInt(holes.length))
        else frags(rnd.nextInt(frags.length))).mkString
      val ts = Timestamp.valueOf(f"20${10 + rnd.nextInt(30)}%d-${1 + rnd.nextInt(12)}%02d-${1 + rnd.nextInt(28)}%02d " +
        f"${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00")
      val off = rnd.nextInt(29) - 14
      (template, ts, off)
    }
    for (legacy <- Seq(false, true)) {
      val got = cases.toDF("template", "ts", "off")
        .select(Templates.expandTemplate(col("template"),
          Templates.localClock(col("ts"), col("off")), legacy).as("e"))
        .as[String].collect()
      cases.zip(got).foreach { case ((template, ts, off), g) =>
        assert(g === model(template, ts, off, legacy),
          s"template=$template ts=$ts off=$off legacy=$legacy")
      }
    }
  }

  test("unknown holes and stray braces pass through untouched") {
    import spark.implicits._
    val got = Seq(("a{unknown}{yearx}{b", Timestamp.valueOf("2026-08-12 09:30:00")))
      .toDF("t", "ts")
      .select(Templates.expandTemplate(col("t"),
        Templates.localClock(col("ts"), lit(0))).as("e"))
      .as[String].collect().head
    assert(got === "a{unknown}{yearx}{b")
  }
}

package graft.functions

import org.apache.spark.sql.functions._

import graft.{GraftExtensions, SparkSpec}
import graft.functions.expressions.UrlResolveExpr

/** The native url_resolve Catalyst expression: SQL registration, parity
  * with the UDF form, codegen participation.
  */
class NativeFunctionsSpec extends SparkSpec {

  private val cases = Seq(
    ("http://host.example/reports/2026/08/", "prices.csv"),
    ("http://host.example/reports/2026/08/", "/abs/vol.zip"),
    ("http://host.example/a/", "http://other.example/x/r.json"),
    ("http://h/a/b.html", "c.csv"),
    ("http://h", "x"),
    ("ftp://ftp.example/pub/", "data_1.zip"))

  test("native expression matches the UDF and the Scala function") {
    import spark.implicits._
    val df = cases.toDF("base", "rel")
      .withColumn("native", UrlResolveExpr.urlResolveNative(col("base"), col("rel")))
      .withColumn("viaUdf", Urls.urlResolve(col("base"), col("rel")))
    df.collect().foreach { r =>
      assert(r.getString(2) === Urls.resolve(r.getString(0), r.getString(1)))
      assert(r.getString(2) === r.getString(3))
    }
  }

  test("SQL registration: url_resolve callable from spark.sql") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT url_resolve('http://h/a/', 'b.csv') AS u").head().getString(0)
    assert(got === "http://h/a/b.csv")
  }

  test("null-intolerant semantics") {
    import spark.implicits._
    val df = Seq(("http://h/", null: String), (null: String, "x"))
      .toDF("base", "rel")
      .select(UrlResolveExpr.urlResolveNative(col("base"), col("rel")))
    assert(df.collect().forall(_.isNullAt(0)))
  }

  test("stays out of ScalaUDF path (plan shows the expression, not a UDF)") {
    import spark.implicits._
    val plan = cases.toDF("base", "rel")
      .select(UrlResolveExpr.urlResolveNative(col("base"), col("rel")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("url_resolve"))
    assert(!plan.contains("UDF"), plan)
  }

  test("extensions class registers via withExtensions on a fresh session") {
    import org.apache.spark.sql.SparkSession
    val prior = spark  // force shared-session init before we clear defaults
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val got = s2.sql("SELECT url_resolve('http://h/a/', 'x/y.bin') AS u")
        .head().getString(0)
      assert(got === "http://h/a/x/y.bin")
    } finally {
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
  }
}

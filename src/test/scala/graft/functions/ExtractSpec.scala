package graft.functions

import org.apache.spark.sql.functions._

import graft.{Fixtures, SparkSpec}

/** X2/X6/X7 extraction fidelity over the FIXTURES.md corpora. */
class ExtractSpec extends SparkSpec {

  test("anchor hrefs: double/single/unquoted, no-href dropped") {
    import spark.implicits._
    val html = Fixtures.htmlPage + """<a href='single_quoted.bin'>sq</a>"""
    val got = Seq(html).toDF("html")
      .select(explode(Extract.anchorHrefs(col("html"))).as("href"))
      .as[String].collect().toSet
    assert(got === Set("prices_20260812.csv", "/abs/path/vol_20260812.zip",
      "http://other.example/x/rates.json", "subdir/", "single_quoted.bin",
      "raw_20260812.txt", "pixel_20260812.gif"))
    assert(!got.contains("tracker.js"),
      "data-href is not an href attribute (BeautifulSoup matches the name exactly)")
  }

  test("html_links pipeline drops directory links via empty basename (F2)") {
    import spark.implicits._
    val got = Seq(Fixtures.htmlPage).toDF("html")
      .select(explode(Extract.anchorHrefs(col("html"))).as("href"))
      .select(Urls.urlResolve(lit(Fixtures.htmlBase), col("href")).as("u"))
      .withColumn("name", Urls.basename(col("u")))
      .filter(length(col("name")) > 0)
      .select("name").as[String].collect().toSet
    assert(got === Set("prices_20260812.csv", "vol_20260812.zip", "rates.json",
      "raw_20260812.txt", "pixel_20260812.gif"))
  }

  test("ftp listing names: CRLF split, trailing empty dropped, last token") {
    import spark.implicits._
    val got = Seq(Fixtures.ftpListing).toDF("listing")
      .select(explode(Extract.listingNames(col("listing"))).as("name"))
      .as[String].collect().toSeq
    assert(got === Seq("data_20260811.zip", "data_20260812.zip", "readme.txt", "archive"))
  }

  test("glob filter narrows listing to the pattern (F3)") {
    import spark.implicits._
    val regex = Globs.globToRegex(Fixtures.ftpGlob)
    val got = Seq(Fixtures.ftpListing).toDF("listing")
      .select(explode(Extract.listingNames(col("listing"))).as("name"))
      .filter(col("name").rlike(regex))
      .as[String].collect().toSeq
    assert(got === Seq("data_20260811.zip", "data_20260812.zip"))
  }
}

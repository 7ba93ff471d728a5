package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** X3 url resolution vs urljoin semantics (SURVEY.md §5.2.3). */
class UrlsSpec extends AnyFunSuite {

  test("relative resolution against directory base") {
    assert(Urls.resolve("http://host.example/reports/2026/08/", "prices.csv")
      === "http://host.example/reports/2026/08/prices.csv")
  }

  test("absolute-path href replaces path") {
    assert(Urls.resolve("http://host.example/reports/2026/08/", "/abs/vol.zip")
      === "http://host.example/abs/vol.zip")
  }

  test("absolute href wins") {
    assert(Urls.resolve("http://host.example/a/", "http://other.example/x/r.json")
      === "http://other.example/x/r.json")
  }

  test("directory href keeps trailing slash (empty basename downstream)") {
    assert(Urls.resolve("http://host.example/a/", "subdir/")
      === "http://host.example/a/subdir/")
  }

  test("relative against file (not dir) base drops last segment") {
    assert(Urls.resolve("http://h/a/b.html", "c.csv") === "http://h/a/c.csv")
  }

  test("authority-only base gets a synthesized root path") {
    assert(Urls.resolve("http://h", "x") === "http://h/x")
  }

  test("dot segments are normalized") {
    assert(Urls.resolve("http://h/a/b/", "../c") === "http://h/a/c")
  }

  test("ftp scheme") {
    assert(Urls.resolve("ftp://ftp.example/pub/", "data_1.zip")
      === "ftp://ftp.example/pub/data_1.zip")
  }

  test("null-safety and empties") {
    assert(Urls.resolve(null, "x") === null)
    assert(Urls.resolve("http://h/", null) === null)
    assert(Urls.resolve("http://h/a", "") === "http://h/a")
  }

  test("basename column behavior matches url.split('/')[-1]") {
    assert("http://h/a/b.csv".split("/").last === "b.csv")
  }
}

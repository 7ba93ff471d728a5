package graft.operators

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("equal-width histogram buckets cover [min,max] and sum to n") {
    val df = (0 to 100).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val rows = Profile.valueHistogram(df, "grp", "v", nBuckets = 4)
      .collect().map(r => r.getInt(1) -> (r.getDouble(2), r.getDouble(3), r.getLong(4)))
      .toMap
    assert(rows.keySet == Set(0, 1, 2, 3))
    assert(rows(0)._1 == 0.0 && rows(3)._2 == 100.0)
    assert(rows.values.map(_._3).sum == 101L)
    // max value lands in the LAST bucket, not an overflow bucket 4
    assert(rows(3)._3 == 26L) // 75..100 inclusive
  }

  test("degenerate group (min == max) collapses to bucket 0") {
    val df = Seq(("g", 5.0), ("g", 5.0)).toDF("grp", "v")
    val rows = Profile.valueHistogram(df, "grp", "v").collect()
    assert(rows.length == 1)
    assert(rows.head.getInt(1) == 0 && rows.head.getLong(4) == 2L)
  }

  test("groups get independent bounds") {
    val df = Seq(("a", 0.0), ("a", 10.0), ("b", 100.0), ("b", 200.0))
      .toDF("grp", "v")
    val rows = Profile.valueHistogram(df, "grp", "v", nBuckets = 2)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(4)).toMap
    assert(rows(("a", 0)) == 1L && rows(("a", 1)) == 1L)
    assert(rows(("b", 0)) == 1L && rows(("b", 1)) == 1L)
  }
}

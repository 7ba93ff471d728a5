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

  test("psiDrift: identical distributions score ~0, a shift scores high") {
    val ref = (1 to 100).map(i => i.toDouble % 10).toDF("v")
    val same = Profile.psiDrift(ref, ref, "v", nBuckets = 5).collect()
    assert(same.map(_.getDouble(3)).sum === 0.0)
    assert(same.map(_.getLong(1)).sum === 100L)
    // current shifted way right of the reference bounds → piles into the
    // top edge bin, PSI total well above the 0.25 "shifted" rule of thumb
    val cur = (1 to 100).map(i => 50.0 + i % 10).toDF("v")
    val drift = Profile.psiDrift(ref, cur, "v", nBuckets = 5).collect()
    assert(drift.map(_.getDouble(3)).sum > 0.25)
    val top = drift.find(_.getInt(0) == 4).get
    assert(top.getLong(2) === 100L) // all current rows clamp to bin 4
  }

  test("psiDrift: bins missing on one side get the eps floor, not NaN/err") {
    val ref = Seq(0.0, 1.0, 2.0, 3.0, 4.0).toDF("v")
    val cur = Seq(0.0, 0.1).toDF("v") // bins 1..4 empty on the cur side
    val rows = Profile.psiDrift(ref, cur, "v", nBuckets = 5).collect()
    assert(rows.length === 5)
    assert(rows.forall(r => !r.getDouble(3).isNaN))
  }

  test("psiDrift: null values bucket nowhere (same population as totals)") {
    val ref = Seq[Option[Double]](Some(0.0), Some(1.0), Some(2.0), Some(3.0),
      Some(4.0), None, None).toDF("v")
    val rows = Profile.psiDrift(ref, ref, "v", nBuckets = 5).collect()
    // without the null filter the 2 nulls land in the TOP bin while the
    // totals (count(v) = 5) exclude them → inflated top-bin rates
    assert(rows.map(_.getLong(1)).sum === 5L)
    assert(rows.map(_.getLong(2)).sum === 5L)
    val top = rows.find(_.getInt(0) == 4).get
    assert(top.getLong(1) === 1L && top.getLong(2) === 1L)
    assert(rows.map(_.getDouble(3)).sum === 0.0)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Record-linkage behavior on seeded corruptions: exact matches, edits
  * confined to one blocking zone (guaranteed caught by the OTHER pass),
  * edits spanning both zones (the documented blocking miss), and the
  * deterministic best-match tie-break.
  */
class LinkageSpec extends SparkSpec {

  // 9-digit keys; zones = chars 6-7 and 8-9 (1-based), like the
  // link_customer_supplier registration.
  private def sided(rows: Seq[(Long, String)], pre: String): DataFrame = {
    import spark.implicits._
    rows.toDF(s"${pre}_id", s"${pre}_key")
      .withColumn(s"${pre}_label", concat(lit("E#"), col(s"${pre}_key")))
      .withColumn(s"${pre}_block_0", substring(col(s"${pre}_key"), 6, 2))
      .withColumn(s"${pre}_block_1", substring(col(s"${pre}_key"), 8, 2))
  }

  test("linkBest: exact, one-zone-corrupted, cross-zone-missed, ties") {
    val left = sided(Seq(
      1L -> "000001234", // exact copy on the right
      2L -> "000005678", // right copy corrupted in zone A only (56->96)
      3L -> "000002468", // right copy corrupted in BOTH zones (miss)
      4L -> "000007777"  // two right matches at dist 1 -> smallest r_id
    ), "l")
    val right = sided(Seq(
      10L -> "000001234",
      11L -> "000009678", // zone A edit: dist 1, zone B "78" agrees
      12L -> "000003469", // zone A (24->34) AND zone B (68->69) edited
      13L -> "000007771", // dist 1 from l4
      14L -> "000007772"  // dist 1 from l4 too -> tie, loses on r_id
    ), "r")

    val got = Linkage.linkBest(left, right, passes = 2, maxDist = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getInt(4)))).toMap

    assert(got(1L) === ((10L, 0)))  // exact
    assert(got(2L) === ((11L, 1)))  // caught via the untouched zone's pass
    assert(!got.contains(3L))       // both zones edited: no pass agrees —
                                    // the documented multi-pass recall bound
    assert(got(4L) === ((13L, 1)))  // tie at dist 1 -> smallest r_id
  }

  test("linkBest: candidates outside maxDist are dropped") {
    val left = sided(Seq(1L -> "000001111"), "l")
    val right = sided(Seq(10L -> "000991111"), "r") // shares zone B block
    assert(Linkage.linkBest(left, right, 2, maxDist = 1).count() === 0)
    assert(Linkage.linkBest(left, right, 2, maxDist = 2).count() === 1)
  }
}

package graft.queries

import graft.SparkSpec

/** Operating-point recall floor for the √N dynamic-width quantizer
  * (r15 VERDICT task #3): the driver gate hash-pins
  * `sim_dedup_blocking_recall`'s exact value at every SF and its 0.07
  * crater guard; THIS spec asserts the stronger documented floor at
  * sf0.1 — the SF where C = ⌈√2000⌉ = 45 sits well above the 16-cell
  * floor (the dynamic law, not the floored one, is what's measured) and
  * the 288-true-pair sample is large enough that the floor isn't
  * one-pair fragile. Fails if a future width/dial change craters the
  * blocking recall of the semantic-dedup family.
  */
class RecallFloorSpec extends SparkSpec {

  test("√N blocking pair recall at sf0.1 (C=45) holds the 0.2 floor") {
    val row = SimilarityQueries.queries("sim_dedup_blocking_recall")(
      spark, "/root/testdata/sf0.1").collect().head
    val nPairs = row.getLong(0)
    val recall = row.getDouble(1)
    assert(nPairs > 100, s"true-pair sample collapsed to $nPairs — the " +
      "floor below is only meaningful on a stable sample")
    assert(recall >= SimilarityQueries.BLOCKING_RECALL_FLOOR_SF01,
      s"blocking pair recall $recall at the sf0.1 operating point " +
        s"broke the ${SimilarityQueries.BLOCKING_RECALL_FLOOR_SF01} " +
        "floor — a quantizer/width change traded away too much recall " +
        "(measured 0.25 when the floor was set, r16)")
    assert(row.getBoolean(2), "in-gate crater guard must also hold")
  }
}

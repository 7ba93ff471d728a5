package graft.operators

import graft.SparkSpec

class BasketSpec extends SparkSpec {
  import spark.implicits._

  test("pair rules score support/confidence/lift; duplicates collapse") {
    // 4 baskets: {A,B} {A,B} {A,C} {C}; part 1→A, 2→B, 3→C.
    // Order 1 lists part 1 twice — the basket must still count A once.
    val li = Seq(
      (1L, 1L), (1L, 1L), (1L, 2L),
      (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 3L),
      (4L, 3L)
    ).toDF("l_orderkey", "l_partkey")
    val part = Seq((1L, "A"), (2L, "B"), (3L, "C"))
      .toDF("p_partkey", "p_brand")
    val rows = Basket.brandPairRules(li, part, minPairs = 1L, topK = 10)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    // n(A)=3, n(B)=2, n(C)=2, orders=4
    // (A,B): n=2, support .5, conf(A→B)=2/3, lift = 2*4/(3*2)=4/3
    val (nab, sup, conf, lift) = rows(("A", "B"))
    assert(nab == 2L && sup == 0.5)
    assert(math.abs(conf - 0.666667) < 1e-9)
    assert(math.abs(lift - 1.333333) < 1e-9)
    // (A,C): n=1, lift = 1*4/(3*2) = 2/3 < 1 (anti-correlated)
    assert(rows(("A", "C"))._4 < 1.0)
    // (B,C) never co-occur → absent entirely
    assert(!rows.contains(("B", "C")))
  }

  test("minPairs prunes singleton co-occurrences") {
    val li = Seq((1L, 1L), (1L, 2L)).toDF("l_orderkey", "l_partkey")
    val part = Seq((1L, "A"), (2L, "B")).toDF("p_partkey", "p_brand")
    assert(Basket.brandPairRules(li, part, minPairs = 2L, topK = 10).count() == 0)
  }
}

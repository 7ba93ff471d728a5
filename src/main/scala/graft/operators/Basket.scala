package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association mining over the order fact: which item
  * attributes co-occur in the same basket more often than independence
  * predicts (support / confidence / lift — the Apriori readout for the
  * frequent-pair case).
  */
object Basket {

  /** Brand-pair association rules over orders-as-baskets.
    *
    * support(a,b) = P(a,b), confidence(a→b) = P(b|a),
    * lift = P(a,b)/(P(a)P(b)); pairs are unordered (a < b) and pruned to
    * `minPairs` co-occurrences before any scoring.
    *
    * Scale shape: baskets are the DISTINCT (order, brand) projection —
    * one partial-aggregable shuffle on the order key; the pair
    * generation is a self-join on that same key, so fan-out per order is
    * bounded by the basket's distinct-brand count (single-digit), never
    * corpus-quadratic. Pair counts collapse map-side to a |brands|²
    * frame; brand marginals (|brands| rows, schema-bounded) broadcast
    * onto it, and the basket total is a one-row broadcast. The
    * lineitem→part attribute join is left to the planner/AQE — `part` is
    * a real dimension, not assumed broadcastable.
    */
  def brandPairRules(lineitem: DataFrame, part: DataFrame, minPairs: Long,
      topK: Int): DataFrame = {
    val baskets = lineitem.select(col("l_orderkey"), col("l_partkey"))
      .join(part.select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("okey"), col("p_brand").as("brand"))
      .distinct()
    val nOrders = baskets.select(col("okey")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val marginals = baskets.groupBy(col("brand"))
      .agg(count(lit(1)).as("n_brand"))
    val pairs = baskets.select(col("okey"), col("brand").as("brand_a"))
      .join(baskets.select(col("okey"), col("brand").as("brand_b")), "okey")
      .filter(col("brand_a") < col("brand_b"))
      .groupBy(col("brand_a"), col("brand_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairs)
    pairs
      .join(broadcast(marginals.select(col("brand").as("brand_a"),
        col("n_brand").as("n_a"))), "brand_a")
      .join(broadcast(marginals.select(col("brand").as("brand_b"),
        col("n_brand").as("n_b"))), "brand_b")
      .crossJoin(broadcast(nOrders))
      .select(col("brand_a"), col("brand_b"), col("n_ab"),
        (floor((col("n_ab").cast("double") / col("n_orders")) * 1e6 + 0.5) / 1e6).as("support"),
        (floor((col("n_ab").cast("double") / col("n_a")) * 1e6 + 0.5) / 1e6).as("confidence"),
        (floor((col("n_ab").cast("double") * col("n_orders") /
          (col("n_a").cast("double") * col("n_b"))) * 1e6 + 0.5) / 1e6).as("lift"))
      .orderBy(col("lift").desc, col("brand_a"), col("brand_b"))
      .limit(topK)
  }
}

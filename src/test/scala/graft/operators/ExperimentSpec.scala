package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-01-01 10:00:00")

  test("two-proportion z-test matches hand computation") {
    // variant 0 (even ids): users 2,4,6,8 — 1 converts.
    // variant 1 (odd ids): users 1,3,5,7 — 3 convert.
    val events = (1L to 8L).map(u => (u, t0, "view", 1.0)) ++
      Seq(2L, 1L, 3L, 5L).map(u => (u, t0, "purchase", 10.0))
    val df = events.toDF("user_id", "ts", "event_type", "value")
    val r = Experiment.conversionZTest(df).head()
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_b") == 4L)
    assert(r.getAs[Long]("conv_a") == 1L && r.getAs[Long]("conv_b") == 3L)
    assert(r.getAs[Double]("rate_a") == 0.25 && r.getAs[Double]("rate_b") == 0.75)
    // p̂ = 0.5; se = sqrt(0.5*0.5*(1/4+1/4)) = sqrt(0.125); z = 0.5/se
    val z = 0.5 / math.sqrt(0.125)
    assert(math.abs(r.getAs[Double]("z") - math.round(z * 1e6) / 1e6) < 1e-9)
    assert(!r.getAs[Boolean]("significant")) // |z| ≈ 1.414 < 1.96
  }

  test("conversion is per-user and value-gated") {
    val df = Seq(
      (1L, t0, "purchase", 10.0), (1L, t0, "purchase", 10.0), // two buys, one user
      (2L, t0, "purchase", 3.0), // below the 5.0 gate
      (3L, t0, "view", 1.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val r = Experiment.conversionZTest(df, minValue = 5.0).head()
    assert(r.getAs[Long]("conv_b") == 1L) // only user 1
    assert(r.getAs[Long]("conv_a") == 0L)
  }

  test("degenerate (saturated) outcome yields NULL z, not an error") {
    val df = Seq(
      (1L, t0, "purchase", 10.0), (2L, t0, "purchase", 10.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val r = Experiment.conversionZTest(df).head()
    assert(r.isNullAt(r.fieldIndex("z")))
    assert(r.isNullAt(r.fieldIndex("significant")))
  }
}

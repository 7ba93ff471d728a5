package graft.queries

import graft.SparkSpec

/** Keeps the r14 hash-canonicalization experiment alive after its two
  * red-by-design probes were deregistered from the driver gate
  * (BASELINE.md "Driver hash canonicalization"; r14 ADVICE: a standing
  * expected-red row normalizes red). Asserts (a) the diagnostic probes
  * still compute exact values, and (b) the rendering divergence that
  * made them red at the driver — dump-scale decimal strings vs the
  * float64 rendering DuckDB's pandas bridge produces — is still present
  * in the emitted types, so the documented rule stays true of the code.
  */
class ProbeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("diagnostic probes are runnable and value-exact") {
    val s4 = ProbeQueries.diagnostics("probe_hash_decimal_s4")(spark, sf)
      .collect().map(r => r.getInt(0) -> r.getDecimal(1)).toMap
    val tz = ProbeQueries.diagnostics("probe_hash_decimal_s2_tz")(spark, sf)
      .collect().map(r => r.getInt(0) -> r.getDecimal(1)).toMap
    assert(s4.size == 25 && tz.size == 25)
    s4.foreach { case (k, v) =>
      assert(v == new java.math.BigDecimal(s"$k.37").setScale(4)) }
    tz.foreach { case (k, v) =>
      assert(v == new java.math.BigDecimal(s"$k.50").setScale(2)) }
  }

  test("red class: dump-scale rendering diverges from float rendering") {
    // scale-4: exact decimal renders "x.3700", float64 renders "x.37"
    val s4 = ProbeQueries.diagnostics("probe_hash_decimal_s4")(spark, sf)
      .collect().map(r => (r.getDecimal(1).toPlainString,
        r.getDecimal(1).doubleValue().toString))
    assert(s4.forall { case (dec, dbl) => dec != dbl },
      "scale-4 probe no longer diverges — re-run the probe family " +
        "before trusting decimal outputs at the driver")
    // trailing-zero cents: "x.50" vs the float's "x.5"
    val tz = ProbeQueries.diagnostics("probe_hash_decimal_s2_tz")(spark, sf)
      .collect().map(r => (r.getDecimal(1).toPlainString,
        r.getDecimal(1).doubleValue().toString))
    assert(tz.forall { case (dec, dbl) => dec != dbl })
  }

  // The pack-wide ban ("no registered query emits a decimal output
  // column") is enforced by tools/check.py on the Verify dumps — a
  // pyarrow schema walk costs nothing there, while constructing all
  // registered DataFrames here would run the mv_* families' eager
  // lakehouse setup inside the unit suite.
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Governance._

class GovernanceSpec extends SparkSpec {
  import spark.implicits._

  test("expectations evaluates all checks in one pass and flags violations") {
    val df = Seq(
      (1L, Some(5.0), "A"),
      (2L, Some(0.5), "A"),  // out of [0, 0.1] range
      (3L, None, "Z"),       // null value, bad flag
      (1L, Some(0.1), "N")   // duplicate id
    ).toDF("id", "v", "flag")

    val rep = Governance.expectations(df, Seq(
      NotNull("v", maxNullRate = 0.3),
      InRange("v", 0.0, 0.1, maxViolRate = 0.0),
      InSet("flag", Seq("A", "N", "R")),
      UniqueKey(Seq("id")),
      MinNdv("flag", 3L)
    )).collect().map(r => (r.getString(0), r.getString(1),
      r.getDouble(2), r.getDouble(3), r.getBoolean(4))).toList

    // null rate 1/4 = 0.25 <= 0.3 -> pass
    assert(rep.contains(("not_null", "v", 0.25, 0.3, true)))
    // violations: 5.0 and 0.5 of 4 rows (null not counted) -> 0.5 > 0
    assert(rep.contains(("in_range", "v", 0.5, 0.0, false)))
    // 'Z' is 1 of 4 -> 0.25 > 0
    assert(rep.contains(("in_set", "flag", 0.25, 0.0, false)))
    // ids {1,2,3,1}: ndv 3 of 4 -> dup share 0.25
    assert(rep.contains(("unique_key", "id", 0.25, 0.0, false)))
    // flags ndv 3 >= 3
    assert(rep.contains(("min_ndv", "flag", 3.0, 3.0, true)))
  }

  test("expectations passes on the unrounded metric, not the round-6 report") {
    // 1 violation in 4M rows: rate 2.5e-7 rounds to 0.0 at 6 digits — the
    // report shows 0.0 but the gate must still fail a zero threshold
    val df = spark.range(4000000)
      .select(when(col("id") === 0L, lit(null)).otherwise(col("id")).as("v"))
    val r = Governance.expectations(df, Seq(NotNull("v"))).collect().head
    assert(r.getDouble(2) == 0.0)   // reported metric rounds to zero...
    assert(!r.getBoolean(4))        // ...but the verdict sees the violation
  }

  test("expectations over an empty table fails explicitly, never null") {
    val df = Seq((1L, 2.0)).toDF("id", "v").where(lit(false))
    val rep = Governance.expectations(df, Seq(
      NotNull("v"), InRange("v", 0.0, 1.0), UniqueKey(Seq("id")),
      MinNdv("id", 1L))).collect()
    assert(rep.length == 4)
    rep.foreach { r =>
      assert(!r.isNullAt(4), s"pass must not be null: $r")
      assert(!r.getBoolean(4), s"empty publish must fail the gate: $r")
    }
  }

  test("referentialAudit handles fk and pk sharing a column name") {
    // self-referencing shape: manager_id -> id within one table, both read
    // from frames where the join key name collides
    val emp = Seq((1L, Option.empty[Long]), (2L, Some(1L)), (3L, Some(99L)))
      .toDF("id", "manager_id")
    val parent = emp.select(col("id").as("manager_id"))
    val r = Governance.referentialAudit(Seq(
      FkRel("emp->mgr", emp, "manager_id", parent, "manager_id")))
      .collect().head
    assert(r.getLong(1) == 3L)  // n_child
    assert(r.getLong(2) == 2L)  // orphans: null + 99
  }

  test("expectations plans as a single aggregation over one scan") {
    val df = Seq((1L, 2.0), (2L, 3.0)).toDF("id", "v")
    val plan = Governance.expectations(df, Seq(
      NotNull("v"), InRange("v", 0.0, 10.0), UniqueKey(Seq("id"))))
      .queryExecution.optimizedPlan
    val scans = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }
    assert(scans.size == 1, s"expected one scan, got ${scans.size}")
  }

  test("referentialAudit counts missing parents and null fks as orphans") {
    val child = Seq((1L, Some(10L)), (2L, Some(99L)), (3L, None))
      .toDF("id", "fk")
      .select(col("id"), col("fk").as("fk"))
    val parent = Seq(10L, 20L).toDF("pk")
    val rows = Governance.referentialAudit(Seq(
      FkRel("child->parent", child, "fk", parent, "pk"))).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(1) == 3L)          // n_child
    assert(r.getLong(2) == 2L)          // orphans: 99 + null
    assert(r.getDouble(3) == 0.666667)  // rounded rate
  }

  test("kAnonymityReport histograms class sizes with worst-case l-diversity") {
    // classes: (a)->3 rows sens {1,1,2}; (b)->1 row sens {9}; (c)->3 rows sens {5,5,5}
    val df = Seq(
      ("a", 1), ("a", 1), ("a", 2),
      ("b", 9),
      ("c", 5), ("c", 5), ("c", 5)
    ).toDF("qi", "sens")
    val rep = Governance.kAnonymityReport(df, Seq(col("qi")), col("sens"), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toList
    assert(rep == List(
      (1L, 1L, 1L, 1L, true),   // class b: size 1, at risk
      (3L, 2L, 6L, 1L, false))) // classes a+c: min l-diversity = 1 (c)
  }

  test("seededNoisyCounts is deterministic, integer, clamped at zero") {
    val df = (1 to 100).map(i => ("g" + (i % 3), i)).toDF("g", "v")
    val a = Governance.seededNoisyCounts(df, "g", epsilon = 0.5, seed = 7L).collect()
    val b = Governance.seededNoisyCounts(df, "g", epsilon = 0.5, seed = 7L).collect()
    assert(a.sameElements(b))
    assert(a.forall(_.getLong(1) >= 0L))
    // noise is bounded by b*ln(2^31) ~ 43 at eps=0.5; counts are ~33
    assert(a.forall(r => math.abs(r.getLong(1) - 33L) <= 90L))
    // a different seed should perturb at least one group differently
    val c = Governance.seededNoisyCounts(df, "g", epsilon = 0.5, seed = 8L).collect()
    assert(!a.sameElements(c))
  }

  test("seededNoisyCounts clamps heavily-negative noise on tiny counts to zero") {
    // eps small enough that some group's noise can exceed its count
    val df = Seq(("x", 1), ("y", 1)).toDF("g", "v")
    val rows = Governance.seededNoisyCounts(df, "g", epsilon = 0.01, seed = 3L)
      .collect()
    assert(rows.forall(_.getLong(1) >= 0L))
  }
}

package graft

/** Mechanical scale-guard over EVERY registered query's physical plan at
  * sf0.001: no cartesian products (a `crossJoin(broadcast(1-row))` plans
  * as BroadcastNestedLoopJoin and is allowed), no Python evaluation, and
  * no Scala UDFs outside the documented whitelist (the Bloom guard's
  * `mightContain` probe is inherently a function of a driver-built
  * sketch). Catches future plan regressions — an accidental cross
  * product or a UDF slipping onto a hot path — without hand-auditing 80+
  * queries each round.
  */
class PlanAuditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // queries whose construction is eager (run jobs while building: CC
  // iteration, Bloom sketch build, localCheckpoint stages) still finish
  // in well under a second at sf0.001
  private val udfWhitelist = Set("bloom_customers_no_orders")

  test("no registered query plans a cartesian product, Python eval, or unlisted UDF") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan =
        try fn(spark, sfDir).queryExecution.executedPlan.toString
        catch { case e: Throwable => s"PLAN_FAILED: $e" }
      val findings = Seq(
        "CartesianProduct" -> plan.contains("CartesianProduct"),
        "PythonEval" -> plan.contains("BatchEvalPython"),
        "UDF" -> (plan.contains("UDF") && !udfWhitelist.contains(name)),
        "PLAN_FAILED" -> plan.startsWith("PLAN_FAILED")
      ).collect { case (what, true) => what }
      if (findings.isEmpty) Nil else Seq(s"$name: ${findings.mkString(", ")}")
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  // The r4 verdict's three scale-killers were all forced broadcasts of
  // unbounded sides (whole embeddings table, whole vocabulary). Ratchet:
  // these queries may force-broadcast ONLY sides that are provably ≤ 1
  // row (a groupless aggregate — corpus totals); anything else must be
  // left to the planner/AQE, which broadcasts small sides adaptively
  // from RUNTIME sizes and degrades to a shuffle join at 100 TB instead
  // of dying at the broadcast limit.
  test("cell-blocked kNN, vocabulary, and model joins force no unbounded broadcast") {
    import org.apache.spark.sql.catalyst.expressions.{LessThan, Literal, Pmod, Remainder}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, BROADCAST, Filter, Join, LocalRelation, Range}
    // The model-training family broadcasts its weight/component frames —
    // legal ONLY because those are bounded by construction: a scalar
    // (groupless) aggregate, a spark.range(dims) root, a driver-built
    // LocalRelation of model rows, or a row-count bound proven by a
    // `col < literal` filter (the recall queries' fixed samples: vec_id %
    // stride == 0 AND vec_id < stride·maxQueries ⇒ ≤ maxQueries rows).
    // Anything else (a corpus-derived side) must be left to AQE.
    val audited = Seq("graph_knn_pagerank", "sim_nn_within_label",
      "text_unigram_logprob", "learn_logreg_predict", "learn_nb_predict",
      "learn_calibration", "learn_model_agreement", "sim_pca_project",
      "sim_ivf_recall", "graph_knn_recall", "sim_recall_curve",
      "sim_dim_recall_curve", "learn_threshold_sweep")
    val offenders = audited.flatMap { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir).queryExecution.optimizedPlan
      val forced = plan.collect {
        case j: Join =>
          Seq(j.hint.leftHint -> j.left, j.hint.rightHint -> j.right).collect {
            case (Some(h), side) if h.strategy.contains(BROADCAST) => side
          }
      }.flatten
      val unbounded = forced.filterNot { side =>
        val scalarAgg = side.collectFirst {
          case a: Aggregate if a.groupingExpressions.isEmpty => a
        }.isDefined
        val modelRoot = side.collectLeaves().forall {
          case _: Range => true
          case _: LocalRelation => true
          case _ => false
        }
        // A filter proves a row-count bound only in the recall queries'
        // exact shape: BOTH a `col < literal` cap AND a stride predicate
        // (`col % stride == 0`) in the same condition — together ≤
        // cap/stride rows. A lone `<` on an arbitrary column (quality,
        // length, ...) bounds nothing and must NOT pass the ratchet.
        val literalCap = side.collectFirst {
          case f: Filter
            if f.condition.collectFirst {
              case LessThan(_, _: Literal) => ()
            }.isDefined &&
              f.condition.collectFirst {
                case _: Pmod => ()
                case _: Remainder => ()
              }.isDefined => f
        }.isDefined
        scalarAgg || modelRoot || literalCap
      }
      if (unbounded.isEmpty) Nil
      else Seq(s"$name: forces broadcast of ${unbounded.size} non-bounded side(s)")
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}

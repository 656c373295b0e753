package graft.lakehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical._

/** Pre-flight plan linting — the scale foot-gun checks this repo's own
  * test suite enforces (QueriesSmokeSpec / PlanHygieneSpec), packaged as
  * a library operator so a PIPELINE can gate itself before burning a
  * 1000-executor hour: a plan that cartesian-products, windows an
  * unbounded input without partitioning, or globally sorts an unbounded
  * input with no limit is almost never what the author meant at 100 TB.
  *
  * Rules (each deliberately sharp — no style opinions):
  *  - `cartesian-product`: a physical CartesianProduct anywhere (a
  *    broadcast nested-loop against a tiny side is NOT flagged — the
  *    1-row-aggregate crossJoin is a legitimate pattern).
  *  - `unpartitioned-window-unbounded`: a partition-less Window whose
  *    input is not bounded below by an aggregate/limit/distinct — the
  *    single-partition global sort of the whole corpus.
  *  - `global-sort-unbounded`: a global Sort over an unbounded input
  *    with no enclosing limit (a top-k plans as TakeOrdered and never
  *    trips this; a deterministic ORDER BY over an aggregate is bounded
  *    and fine).
  *  - `unpartitioned-window-grouped-agg`: a partition-less Window whose
  *    only cardinality bound is an aggregate grouped by an
  *    unbounded-domain key (per-user, per-doc) — the aggregate's output
  *    is input-proportional, so the window is still a corpus-scale
  *    single-partition sort. Calendar/bucket/literal-domain groupings
  *    (dates, year(), x % k, time windows) do not trip this.
  *
  * Linting inspects plans only — nothing executes. Reference provenance:
  * the reference library's display/debug helpers (common.py:139-170)
  * print plans for humans; this is the machine-checkable version.
  */
object PlanLint {

  /** A plan is bounded below when every path to a leaf passes through
    * something that bounds cardinality (the QueriesSmokeSpec rule). */
  private def bounded(p: LogicalPlan): Boolean = p match {
    case _: Aggregate | _: GlobalLimit | _: Deduplicate => true
    case _: LocalRelation => true
    case leaf if leaf.children.isEmpty =>
      leaf.getClass.getSimpleName == "InMemoryRelation" &&
        leaf.toString.matches("(?s).*(Aggregate|Limit|TakeOrdered).*")
    case other => other.children.forall(bounded)
  }

  /** A grouping expression whose value DOMAIN is bounded regardless of
    * input size: literals, small/bounded types, temporal extractions
    * (calendar-bounded), time buckets, and modulo-by-literal. A plain
    * per-user / per-doc key is none of these — an aggregate on it has
    * input-proportional cardinality and does NOT tame a downstream
    * partition-less window (round-10 advice: the previous rule let any
    * Aggregate bound, a false negative on the lint's own target). */
  private def boundedDomain(e: org.apache.spark.sql.catalyst.expressions
      .Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types._
    e match {
      case _: Literal => true
      case _ if e.dataType == DateType || e.dataType == BooleanType ||
        e.dataType == ByteType || e.dataType == ShortType => true
      case a: Alias => boundedDomain(a.child)
      case c: Cast => boundedDomain(c.child)
      case r: Remainder => r.right.isInstanceOf[Literal]
      case p: Pmod => p.right.isInstanceOf[Literal]
      case _ => Set("Year", "Month", "Quarter", "DayOfMonth", "DayOfWeek",
        "DayOfYear", "WeekOfYear", "Hour", "Minute", "Second",
        "TruncDate", "TruncTimestamp", "TimeWindow")
        .contains(e.getClass.getSimpleName)
    }
  }

  /** The first cardinality-bounding node on each path below `p` — the
    * nodes [[bounded]] credits. */
  private def firstBounders(p: LogicalPlan): Seq[LogicalPlan] = p match {
    case a: Aggregate => Seq(a)
    case b @ (_: GlobalLimit | _: Deduplicate | _: LocalRelation) => Seq(b)
    case leaf if leaf.children.isEmpty => Seq(leaf)
    case other => other.children.flatMap(firstBounders)
  }

  /** Resolve an attribute back to the expression that computed it by
    * walking Alias definitions in descendant Projects — the optimizer
    * pushes groupBy(expr.as("b")) into a Project below the Aggregate,
    * leaving only the bare attribute in groupingExpressions. */
  private def resolveThroughProjects(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      plan: LogicalPlan)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    e match {
      case a: AttributeReference =>
        def find(p: LogicalPlan): Option[Expression] = p match {
          case proj: Project =>
            proj.projectList.collectFirst {
              case al: Alias if al.exprId == a.exprId =>
                resolveThroughProjects(al.child, proj.child)
            }.orElse(find(proj.child))
          case other => other.children.flatMap(find(_)).headOption
        }
        find(plan).getOrElse(a)
      case other => other
    }
  }

  /** True when `p`'s boundedness rests on an aggregate grouped by an
    * unbounded-domain key (per-user, per-doc): its output is
    * input-proportional, so a partition-less window over it is still a
    * corpus-scale single-partition sort. */
  private def groupedAggBounded(p: LogicalPlan): Boolean =
    firstBounders(p).exists {
      case a: Aggregate => a.groupingExpressions.nonEmpty &&
        !a.groupingExpressions.forall(g =>
          boundedDomain(resolveThroughProjects(g, a.child)))
      case _ => false
    }

  /** All (rule, offendingNode) pairs for one frame.
    *
    * `ignoreOutputSort = true` skips a single root-level global Sort
    * (unwrapped through Projects/aliases): a deterministic ORDER BY on
    * the final result dump is a presentation contract, not a pipeline
    * stage — a registry-wide gate would otherwise flag every query's
    * output ordering instead of real mid-pipeline foot-guns. */
  def violations(df: DataFrame,
      ignoreOutputSort: Boolean = false): Seq[(String, String)] = {
    def walk(p: LogicalPlan, underLimit: Boolean): Seq[(String, String)] =
      p match {
        case l @ (_: GlobalLimit | _: LocalLimit) =>
          l.children.flatMap(walk(_, underLimit = true))
        case s: Sort if s.global && !underLimit && !bounded(s.child) =>
          ("global-sort-unbounded", s.simpleString(120)) +:
            s.children.flatMap(walk(_, underLimit = false))
        case w: Window if w.partitionSpec.isEmpty && !bounded(w.child) =>
          ("unpartitioned-window-unbounded", w.simpleString(120)) +:
            w.children.flatMap(walk(_, underLimit = false))
        case w: Window if w.partitionSpec.isEmpty &&
            groupedAggBounded(w.child) =>
          ("unpartitioned-window-grouped-agg", w.simpleString(120)) +:
            w.children.flatMap(walk(_, underLimit = false))
        case other => other.children.flatMap(walk(_, underLimit = false))
      }
    def stripOutputSort(p: LogicalPlan): LogicalPlan = p match {
      case proj: Project => proj.copy(child = stripOutputSort(proj.child))
      case s: Sort if s.global => s.child
      case other => other
    }
    val root = df.queryExecution.optimizedPlan
    val logical = walk(
      if (ignoreOutputSort) stripOutputSort(root) else root,
      underLimit = false)
    // physical checks string-match the final/initial plan text (AQE
    // wraps the tree; the PlanHygieneSpec convention)
    val phys = df.queryExecution.executedPlan.toString
    val physical =
      if (phys.contains("CartesianProduct"))
        Seq(("cartesian-product", "CartesianProduct in physical plan"))
      else Seq.empty
    logical ++ physical
  }

  /** Lint a set of named frames into a (query, n_violations, rules)
    * report frame — the CI-gate shape: assert the n_violations column
    * is all zero, or read the rules of the ones that aren't. */
  def report(spark: SparkSession,
      frames: Seq[(String, DataFrame)]): DataFrame = {
    import spark.implicits._
    frames.map { case (name, df) =>
      val vs = violations(df)
      (name, vs.size.toLong,
        vs.map(_._1).distinct.sorted.mkString(","))
    }.toDF("query", "n_violations", "rules")
  }
}

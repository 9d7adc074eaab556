package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Pre-flight plan audit — the "would this survive 100 TB" checklist as a
  * library call instead of an eyeballed `.explain`. Walks the physical
  * plan (through AQE wrappers) and reports the structural facts that
  * decide scalability:
  *
  *  - every file scan's pushed filters and read schema (a scan reading 40
  *    columns for a 2-column projection, or no pushed filter under a
  *    selective WHERE, is the single most common 100 TB plan bug);
  *  - join strategies (broadcast / shuffled-hash / sort-merge) and any
  *    cartesian product;
  *  - `Window` operators with an EMPTY partition spec — the one-reducer
  *    global sort that works at test scale and dies at a billion rows;
  *  - shuffle count and whole-stage-codegen coverage (non-codegen
  *    operators in the hot path break the Tungsten pipeline).
  *
  * `PlanAudit.audit(df)` returns the report; `report.scaleHazards` is the
  * actionable subset (cartesians + unpartitioned windows + filterless
  * full scans). The house specs assert plan shapes with string matching;
  * this API gives library users the same discipline programmatically —
  * e.g. a CI gate: `assert(PlanAudit.audit(q).scaleHazards.isEmpty)`.
  */
object PlanAudit {

  case class ScanInfo(relation: String, readColumns: Seq[String], pushedFilters: Seq[String], partitionFilters: Seq[String])
  case class JoinInfo(strategy: String, keys: Seq[String])
  case class WindowInfo(partitionKeys: Seq[String], orderKeys: Seq[String])

  case class Report(
      scans: Seq[ScanInfo],
      joins: Seq[JoinInfo],
      windows: Seq[WindowInfo],
      cartesianProducts: Int,
      shuffles: Int,
      codegenSpans: Int,
      nonCodegenOperators: Seq[String]) {

    /** Windows with no partition key: a global total-order sort. */
    def unpartitionedWindows: Seq[WindowInfo] = windows.filter(_.partitionKeys.isEmpty)

    /** Scans with neither data nor partition filters pushed. Fine for a
      * genuine full-table pass; a hazard under a selective query.
      */
    def unfilteredScans: Seq[ScanInfo] =
      scans.filter(s => s.pushedFilters.isEmpty && s.partitionFilters.isEmpty)

    /** The plan shapes that stop scaling 100× regardless of tuning. */
    def scaleHazards: Seq[String] =
      (if (cartesianProducts > 0) Seq(s"$cartesianProducts cartesian product(s)") else Nil) ++
        unpartitionedWindows.map(w => s"window with no partition key (order: ${w.orderKeys.mkString(",")})")

    def summary: String =
      s"scans=${scans.size} (${unfilteredScans.size} unfiltered) joins=${joins.size} " +
        s"windows=${windows.size} (${unpartitionedWindows.size} unpartitioned) " +
        s"cartesian=$cartesianProducts shuffles=$shuffles codegenSpans=$codegenSpans " +
        (if (scaleHazards.nonEmpty) s"HAZARDS: ${scaleHazards.mkString("; ")}" else "clean")
  }

  /** Audit a DataFrame's executed plan (AQE-wrapped plans are unwrapped;
    * run after an action for final AQE shapes, or before for the initial
    * plan — both are meaningful).
    */
  def audit(df: DataFrame): Report = {
    val root = df.queryExecution.executedPlan
    val nodes = collectThroughAqe(root)
    val scans = nodes.collect { case s: FileSourceScanExec =>
      ScanInfo(
        s.relation.location.rootPaths.headOption.map(_.getName).getOrElse("?"),
        s.output.map(_.name),
        s.metadata.get("PushedFilters").toSeq.flatMap(parseBracketList),
        s.partitionFilters.map(_.sql))
    }
    val joins = nodes.collect {
      case j: BroadcastHashJoinExec => JoinInfo("broadcast-hash", j.leftKeys.map(_.sql))
      case j: ShuffledHashJoinExec  => JoinInfo("shuffled-hash", j.leftKeys.map(_.sql))
      case j: SortMergeJoinExec     => JoinInfo("sort-merge", j.leftKeys.map(_.sql))
    }
    val windows = nodes.collect { case w: WindowExec =>
      WindowInfo(w.partitionSpec.map(_.sql), w.orderSpec.map(_.sql))
    }
    val nonCodegen = outsideCodegen(root)
    Report(
      scans = scans,
      joins = joins,
      windows = windows,
      cartesianProducts = nodes.count(_.isInstanceOf[CartesianProductExec]),
      shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec]),
      codegenSpans = nodes.count(_.isInstanceOf[WholeStageCodegenExec]),
      nonCodegenOperators = nonCodegen.distinct)
  }

  /** Collect every node, descending through AQE wrappers (AdaptiveSparkPlan
    * and QueryStageExec hide their subplans from a plain `collect`).
    */
  private def collectThroughAqe(p: SparkPlan): Seq[SparkPlan] = {
    val here = p match {
      case a: AdaptiveSparkPlanExec => collectThroughAqe(a.executedPlan)
      case q: QueryStageExec        => collectThroughAqe(q.plan)
      case other                    => Seq(other) ++ other.children.flatMap(collectThroughAqe)
    }
    here ++ p.subqueries.flatMap(collectThroughAqe)
  }

  /** Operator names sitting OUTSIDE every WholeStageCodegen span —
    * the codegen-break list (wrappers, exchanges, and scans excluded:
    * those are never code-generated themselves).
    */
  private def outsideCodegen(root: SparkPlan): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(p: SparkPlan, in: Boolean): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan, in)
      case q: QueryStageExec        => walk(q.plan, in)
      case w: WholeStageCodegenExec => w.children.foreach(walk(_, in = true))
      case other =>
        val structural = other.isInstanceOf[ShuffleExchangeExec] ||
          other.isInstanceOf[FileSourceScanExec] ||
          other.nodeName == "InputAdapter" || other.nodeName.startsWith("Broadcast")
        if (!in && !structural) out += other.nodeName
        // inside a span the flag survives until an InputAdapter ends it
        val childIn = in && other.nodeName != "InputAdapter"
        other.children.foreach(walk(_, childIn))
    }
    walk(root, in = false)
    out.distinct.toSeq
  }

  /** "[A, B(x,y), C]" -> Seq("A", "B(x,y)", "C") — the PushedFilters
    * metadata format (commas inside parens are not separators).
    */
  private def parseBracketList(s: String): Seq[String] = {
    val inner = s.stripPrefix("[").stripSuffix("]").trim
    if (inner.isEmpty) Nil
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var depth = 0
      val cur = new StringBuilder
      inner.foreach {
        case ',' if depth == 0 => out += cur.result().trim; cur.clear()
        case c =>
          if (c == '(') depth += 1 else if (c == ')') depth -= 1
          cur += c
      }
      val last = cur.result().trim
      if (last.nonEmpty) out += last
      out.toSeq
    }
  }
}

package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.Bridge

/** Native as-of join — the canonical TSDB operator Spark lacks, built the
  * full Catalyst way: logical node → planner strategy → physical sort-merge
  * operator (SURVEY.md §4.2 path (c)).
  *
  * Semantics: for every left row, attach the latest right row of the same
  * key with `rightTs <= leftTs` (equal timestamps qualify; among equal
  * timestamps the greatest `rightTie` wins); unmatched left rows get nulls.
  *
  * Scale: both children hash-partition on the key and sort by (key, ts
  * [, tie]) — exactly a sort-merge join's shuffle shape — then a single
  * forward merge pass per partition holds ONE candidate row of state. No
  * range blow-up, no per-key buffering, 100 TB-safe. Versus the union+
  * window formulation ([[graft.operators.TimeSeriesOps.asOfJoin]]) this
  * avoids materializing the unioned table and the window's full-partition
  * sort buffer.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTs: Attribute,
    rightTs: Attribute,
    rightTie: Attribute)
    extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): LogicalPlan =
    copy(left = l, right = r)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lts, rts, tie) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, tie) :: Nil
    case _ => Nil
  }
}

/** Column pruning through the custom node — the `Rule[LogicalPlan]` leg
  * of the Catalyst extension surface (SURVEY §4.2 path (c)). Catalyst's
  * own ColumnPruning only knows built-in node types, so a Project above
  * [[AsOfJoinNode]] would otherwise leave BOTH scans reading every
  * column — at 100 TB, a wide right table shipped through the shuffle
  * for one carried value. The rule pushes the referenced-attribute set
  * (plus the join's own key/ts/tie columns) into each child as a
  * Project, which then keeps folding down to the parquet ReadSchema via
  * the built-in rules (plan-asserted in AsOfJoinSpec). Fixpoint-safe:
  * fires only when it removes at least one column.
  */
object PruneAsOfJoinColumns
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.Project

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(projectList, a: AsOfJoinNode) =>
      val needed = AttributeSet(projectList.flatMap(_.references)) ++
        AttributeSet(Seq(a.leftKey, a.rightKey, a.leftTs, a.rightTs, a.rightTie))
      val lKeep = a.left.output.filter(needed.contains)
      val rKeep = a.right.output.filter(needed.contains)
      if (lKeep.length == a.left.output.length && rKeep.length == a.right.output.length) p
      else
        p.copy(child =
          a.copy(left = Project(lKeep, a.left), right = Project(rKeep, a.right)))
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTs: Attribute,
    rightTs: Attribute,
    rightTie: Attribute)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))

  /** SQL metrics, surfaced in the Spark UI / `metrics` like any built-in
    * join: output rows and how many of them actually carried a match —
    * the observability a production as-of enrichment needs (a collapsing
    * match rate is usually upstream data lag, visible here before it is
    * visible in results).
    */
  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "output rows with an as-of match"))

  /** Hash-cluster both sides on the key: EnsureRequirements inserts the
    * exchanges; identical key values land in identical partition ids on
    * both sides (same hash function, same partition count). The partition
    * count is pinned explicitly: doExecute zips the two children partition-
    * by-partition, so AQE must never coalesce one side independently —
    * a required count makes that contract structural, not incidental.
    */
  override def requiredChildDistribution: Seq[Distribution] = {
    val n = Some(conf.numShufflePartitions)
    ClusteredDistribution(Seq(leftKey), requiredNumPartitions = n) ::
      ClusteredDistribution(Seq(rightKey), requiredNumPartitions = n) :: Nil
  }

  /** Sorted merge input: (key, ts) left; (key, ts, tie) right so the last
    * candidate seen at equal ts is the max-tie row.
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending), SortOrder(rightTie, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExpr = BindReferences.bindReference(leftKey: Expression, lOut)
    val lTsExpr = BindReferences.bindReference(leftTs: Expression, lOut)
    val rKeyExpr = BindReferences.bindReference(rightKey: Expression, rOut)
    val rTsExpr = BindReferences.bindReference(rightTs: Expression, rOut)
    val keyType = leftKey.dataType
    val allOut = output
    val outRows = longMetric("numOutputRows")
    val matchedRows = longMetric("numMatched")

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      val toUnsafe = UnsafeProjection.create(allOut, allOut)

      new Iterator[InternalRow] {
        private var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
        private var candidate: InternalRow = null
        private var candidateKey: Any = null

        private def advanceRight(): Unit =
          rHead = if (rIter.hasNext) rIter.next() else null

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          outRows += 1
          val lkv = lKeyExpr.eval(l)
          val ltvBoxed = lTsExpr.eval(l)
          // null key or null ts on the left can never match anything
          if (lkv == null || ltvBoxed == null) return toUnsafe(joined(l, nullRight))
          val ltv = ltvBoxed.asInstanceOf[Long]
          var scanning = true
          while (scanning && rHead != null) {
            val rkv = rKeyExpr.eval(rHead)
            val rtv = rTsExpr.eval(rHead)
            if (rkv == null || rtv == null) advanceRight() // non-matchable; nulls sort first
            else {
              val c = keyOrd.compare(rkv, lkv)
              if (c < 0) advanceRight()
              else if (c == 0 && rtv.asInstanceOf[Long] <= ltv) {
                candidate = rHead.copy() // rows from sorted exchanges are reused buffers
                candidateKey = rkv
                advanceRight()
              } else scanning = false
            }
          }
          val matched = candidate != null && keyOrd.compare(candidateKey, lkv) == 0
          if (matched) matchedRows += 1
          toUnsafe(joined(l, if (matched) candidate else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): SparkPlan =
    copy(left = l, right = r)
}

object AsOfJoin {

  /** Register the planner strategy on a session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val es = spark.experimental
    if (!es.extraStrategies.contains(AsOfJoinStrategy)) {
      es.extraStrategies = es.extraStrategies :+ AsOfJoinStrategy
    }
    if (!es.extraOptimizations.contains(PruneAsOfJoinColumns)) {
      es.extraOptimizations = es.extraOptimizations :+ PruneAsOfJoinColumns
    }
    // runtime fallback for sessions built without spark.sql.extensions:
    // extraOptimizations run AFTER scan building, so MvRewrite's scan
    // case (DataSourceV2ScanRelation) carries this path
    if (!es.extraOptimizations.contains(MvRewrite)) {
      es.extraOptimizations = es.extraOptimizations :+ MvRewrite
    }
  }

  /** As-of join two DataFrames through the native operator. Column names on
    * the right should be pre-renamed to avoid duplicates in the output.
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      leftKeyCol: String,
      rightKeyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      rightTieCol: String): DataFrame = {
    register(left.sparkSession)
    val lp = Bridge.logicalPlan(left)
    val rp = Bridge.logicalPlan(right)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(s"no column $n"))
    val (lk, rk) = (attr(lp, leftKeyCol), attr(rp, rightKeyCol))
    val (lts, rts) = (attr(lp, leftTsCol), attr(rp, rightTsCol))
    // Type equality is load-bearing, not cosmetic: the two sides'
    // ClusteredDistributions hash the key with its own type, so e.g. an
    // int key vs a bigint key lands equal values in DIFFERENT partitions
    // and zipPartitions silently merges misaligned data. Fail loudly here.
    require(
      lk.dataType == rk.dataType,
      s"as-of join key types must match exactly: $leftKeyCol is ${lk.dataType}, " +
        s"$rightKeyCol is ${rk.dataType} — cast one side first")
    require(
      lts.dataType == rts.dataType,
      s"as-of join timestamp types must match exactly: $leftTsCol is ${lts.dataType}, " +
        s"$rightTsCol is ${rts.dataType} — cast one side first")
    Bridge.ofRows(
      left.sparkSession,
      AsOfJoinNode(lp, rp, lk, rk, lts, rts, attr(rp, rightTieCol)))
  }
}

/** `SparkSessionExtensions` installer for builder-time wiring:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` (the
  * runtime path is [[AsOfJoin.register]] via experimental strategies).
  *
  * Besides the as-of planner strategy, this publishes the native
  * expressions to the SQL function registry, so `spark.sql` users reach
  * the codegen'd kernels without touching the Scala API:
  * `graft_cosine_sim(a, b)`, `graft_l2_sq(a, b)`, `graft_hash60(s)`,
  * `graft_lsh_bucket(v, planes, dims)`, `graft_shingle_hashes(text, n)`,
  * `graft_minhash_sig(text, n)`.
  */
object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.Expression

  /** Runtime-path twin of the builder-path installer: register the same
    * native SQL functions on an ALREADY-BUILT session (the driver hands
    * Verify/Bench a plain builder session, where `withExtensions` is no
    * longer reachable). Idempotent — createOrReplaceTempFunction.
    */
  def registerRuntime(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    new GraftExtensions().functionTriples.foreach { case (name, _, builder) =>
      reg.createOrReplaceTempFunction(name, (args: Seq[Expression]) => builder(args), "built-in")
    }
  }
}

class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "", "", "", "", "", "", "built-in")

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other =>
      throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  private[plans] val functionTriples: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    (
      "graft_hour_split",
      "graft_hour_split(start_us, end_us) - UDTF: one (hour_us, overlap_us) row per hour the interval touches",
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_hour_split(start_us, end_us) takes 2 arguments")
        HourSplitGenerator(args(0), args(1))
      }),
    (
      "graft_cosine_sim",
      "graft_cosine_sim(a, b) - cosine similarity of two float/double arrays",
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_cosine_sim(a, b) takes 2 arguments")
        CosineSimExpr(args(0), args(1))
      }),
    (
      "graft_l2_sq",
      "graft_l2_sq(a, b) - squared L2 distance of two float/double arrays",
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_l2_sq(a, b) takes 2 arguments")
        L2SqExpr(args(0), args(1))
      }),
    (
      "graft_hash60",
      "graft_hash60(s) - portable 60-bit md5-prefix hash of a string",
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_hash60(s) takes 1 argument")
        Md5Prefix60Expr(args(0))
      }),
    (
      "graft_lsh_bucket",
      "graft_lsh_bucket(v, planes, dims) - random-hyperplane LSH bucket of an embedding",
      (args: Seq[Expression]) => {
        require(args.length == 3, "graft_lsh_bucket(v, planes, dims) takes 3 arguments")
        LshBucketExpr(args(0), intArg(args(1), "planes"), intArg(args(2), "dims"))
      }),
    (
      "graft_shingle_hashes",
      "graft_shingle_hashes(text, n) - 60-bit hashes of the text's word n-grams",
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_shingle_hashes(text, n) takes 2 arguments")
        ShingleHashesExpr(args(0), intArg(args(1), "n"))
      }),
    (
      "graft_minhash_sig",
      "graft_minhash_sig(text, n) - 16-component minhash signature over word n-grams (NULL if fewer than n tokens)",
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_minhash_sig(text, n) takes 2 arguments")
        MinhashSigExpr(args(0), intArg(args(1), "n"))
      }),
    (
      "graft_jaro",
      "graft_jaro(a, b) - Jaro similarity of two strings (DuckDB-parity semantics)",
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_jaro(a, b) takes 2 arguments")
        JaroSimExpr(args(0), args(1))
      }),
    (
      "graft_jaro_winkler",
      "graft_jaro_winkler(a, b) - Jaro-Winkler similarity (boost above 0.7, prefix <= 4)",
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_jaro_winkler(a, b) takes 2 arguments")
        JaroWinklerSimExpr(args(0), args(1))
      }),
    (
      "graft_hilbert",
      "graft_hilbert(order, c1, c2, ...) - k-dim Hilbert curve index of non-negative long coordinates (< 2^order each)",
      (args: Seq[Expression]) => {
        require(args.length >= 3, "graft_hilbert(order, c1, c2, ...) takes an order plus >= 2 coordinates")
        // cast coordinates to long like the Scala wrapper does — the
        // expression's eval unboxes Long, so an int column would succeed
        // under codegen (implicit widening) but CCE in interpreted mode
        HilbertNExpr(
          args.tail.map(c =>
            org.apache.spark.sql.catalyst.expressions
              .Cast(c, org.apache.spark.sql.types.LongType)),
          intArg(args.head, "order"))
      }),
    (
      "graft_zorder",
      "graft_zorder(bits, c1, c2, ...) - k-way Morton interleave of the low `bits` bits of long columns",
      (args: Seq[Expression]) => {
        require(args.length >= 3, "graft_zorder(bits, c1, c2, ...) takes a bit width plus >= 2 columns")
        // raw catalyst nodes, not a Column composition: a registry builder's
        // result embeds directly in the plan, where a ColumnNodeExpression
        // is unevaluable — same flat shift-term sum as Layout.zorderN
        import org.apache.spark.sql.catalyst.expressions.{Add, BitwiseAnd, Cast, Literal, ShiftLeft, ShiftRight}
        import org.apache.spark.sql.types.LongType
        val bits = intArg(args.head, "bits")
        val cols = args.tail.map(c => Cast(c, LongType))
        val k = cols.length
        require(bits >= 1 && bits * k <= 63, s"graft_zorder($k cols, $bits bits) overflows a long")
        val terms = for { i <- 0 until bits; j <- 0 until k } yield
          ShiftLeft(BitwiseAnd(ShiftRight(cols(j), Literal(i)), Literal(1L)), Literal(k * i + j))
        terms.reduceLeft[Expression]((a, b) => Add(a, b))
      }))

  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectOptimizerRule(_ => PruneAsOfJoinColumns)
    // automatic MV query rewrite — operator-batch placement, so the
    // grafted view scan still rides column pruning / later batches
    e.injectOptimizerRule(_ => MvRewrite)
    // MV DDL (`CREATE/REFRESH/DROP MATERIALIZED VIEW`) — a thin wrapper
    // that delegates everything else to Spark's own parser verbatim
    e.injectParser((_, delegate) => new GraftSqlParser(delegate))
    functionTriples.foreach { case (name, usage, builder) =>
      e.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
  }

}

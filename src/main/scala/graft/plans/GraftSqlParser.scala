package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{
  Alias,
  And,
  Attribute,
  AttributeReference,
  EqualTo,
  Expression,
  Literal,
  SubqueryExpression
}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.{FullOuter, Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate,
  Filter,
  Join,
  LogicalPlan,
  SubqueryAlias
}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType}

import graft.sources.Mv

/** SQL DDL for materialized views — the parser extension that makes the
  * MV feature reachable from the surface it exists for:
  *
  * {{{
  *   CREATE MATERIALIZED VIEW cat.mv AS
  *     SELECT category, count(*) AS n, sum(v * wt) AS wv
  *     FROM cat.fact JOIN cat.dim d ON fact_fk = d.pk
  *     WHERE v > 0 GROUP BY category;
  *   REFRESH MATERIALIZED VIEW cat.mv;
  *   DROP MATERIALIZED VIEW cat.mv;
  * }}}
  *
  * Installed by [[GraftExtensions]] via `injectParser`; every statement
  * that is not MV DDL delegates verbatim, so the wrapped parser is
  * behavior-identical for the rest of SQL. The CREATE's SELECT is parsed
  * by the DELEGATE (Spark's own grammar — no hand-rolled SQL parsing)
  * and the unresolved plan pattern-matched into an [[Mv.create]] call:
  * `Aggregate` over optional `Filter` over a left-deep chain of INNER
  * equi-joins on `UnresolvedRelation`s. The supported shape is exactly
  * what the MV engine can maintain incrementally; anything else refuses
  * with a message naming the constraint, never a silent reinterpretation.
  *
  * Shape rules (each mirrors an engine invariant):
  *  - relations are `catalog.table` against a [[graft.sources.snap
  *    .GraftCatalog]] (resolved at RUN time through the session's
  *    catalog manager, like every other DSv2 identifier);
  *  - the select list is the GROUP BY keys first (bare attributes), then
  *    explicitly aliased aggregates — the MV's column order;
  *  - joins are INNER with equi-conditions; the DIM side of each `ON`
  *    pair must be qualified with the dim's name or alias (that is how
  *    the parser learns which side is which); the dim's join columns
  *    drop after the join, so keys/filter/aggs reference the flat
  *    namespace with BARE names.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.interceptMv(sqlText, delegate).getOrElse(delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): org.apache.spark.sql.types.StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): org.apache.spark.sql.types.StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {

  private val CreateRe =
    """(?is)\A\s*CREATE\s+MATERIALIZED\s+VIEW\s+(.+?)\s+AS\s+(SELECT\b.*?)\s*;?\s*\z""".r
  private val RefreshRe = """(?is)\A\s*REFRESH\s+MATERIALIZED\s+VIEW\s+(.+?)\s*;?\s*\z""".r
  private val DropRe = """(?is)\A\s*DROP\s+MATERIALIZED\s+VIEW\s+(.+?)\s*;?\s*\z""".r

  private[plans] def interceptMv(
      sqlText: String,
      delegate: ParserInterface): Option[LogicalPlan] =
    sqlText match {
      case CreateRe(ident, select) =>
        Some(parseCreate(delegate.parseMultipartIdentifier(ident.trim), select, delegate))
      case RefreshRe(ident) =>
        Some(RefreshMaterializedViewCommand(delegate.parseMultipartIdentifier(ident.trim)))
      case DropRe(ident) =>
        Some(DropMaterializedViewCommand(delegate.parseMultipartIdentifier(ident.trim)))
      case _ => None
    }

  private def fail(msg: String): Nothing =
    sys.error(s"materialized-view DDL: $msg")

  /** Every column reference in `e` must be BARE (single part): the MV
    * engine evaluates keys/filter/aggs over the flat joined namespace,
    * where a qualifier would fail to resolve later and worse.
    */
  private def requireBare(e: Expression, where: String): Unit = e.foreach {
    case ua: UnresolvedAttribute =>
      if (ua.nameParts.length != 1)
        fail(
          s"$where references '${ua.name}' with a qualifier — the joined namespace is flat; " +
            "use the bare column name")
    case _: SubqueryExpression => fail(s"$where may not contain a subquery")
    case _ => ()
  }

  /** The relation at the leaf of (a possibly aliased) scan: its
    * multipart identifier plus the name the ON clause may qualify its
    * columns with (the alias if present, else the identifier's last
    * part).
    */
  private def relOf(p: LogicalPlan): (Seq[String], String) = p match {
    case SubqueryAlias(ident, r: UnresolvedRelation) =>
      (r.multipartIdentifier, ident.name)
    case r: UnresolvedRelation =>
      (r.multipartIdentifier, r.multipartIdentifier.last)
    case other =>
      fail(
        s"FROM must name snapshot tables (got ${other.nodeName}) — subqueries and views " +
          "are not maintainable incrementally")
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case one => Seq(one)
  }

  private def parseCreate(
      mvIdent: Seq[String],
      select: String,
      delegate: ParserInterface): LogicalPlan = {
    val plan = delegate.parsePlan(select)
    val (groupExprs, selectList, below) = plan match {
      case Aggregate(g, a, child, _) => (g, a, child)
      case _ => fail("the SELECT must aggregate — write GROUP BY over the group keys")
    }
    val (filterSql, fromPlan) = below match {
      case Filter(cond, child) =>
        requireBare(cond, "WHERE")
        (Some(cond.sql), child)
      case child => (None, child)
    }
    // unroll the left-deep join chain into (fact, dims) — INNER and LEFT
    // (OUTER) both maintainable; LEFT keeps unmatched fact rows with
    // NULL dim attributes
    def unroll(
        p: LogicalPlan): (Seq[String], Seq[(Seq[String], String, Expression, String)]) = p match {
      case Join(l, r, jt, cond, _) if jt == Inner || jt == LeftOuter || jt == FullOuter =>
        val on = cond.getOrElse(fail("every JOIN needs an ON clause of equi-conditions"))
        val (fact, dims) = unroll(l)
        val (parts, name) = relOf(r)
        val t = jt match {
          case LeftOuter => "left"
          case FullOuter => "full"
          case _ => "inner"
        }
        (fact, dims :+ ((parts, name, on, t)))
      case Join(_, _, other, _, _) =>
        fail(s"only INNER, LEFT and FULL OUTER joins are maintainable (got ${other.sql}; " +
          "for RIGHT, reverse the join)")
      case leaf => (relOf(leaf)._1, Seq.empty)
    }
    val (factParts, rawDims) = unroll(fromPlan)
    val dims = rawDims.map { case (parts, dimName, on, joinType) =>
      val pairs = conjuncts(on).map {
        case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute) =>
          val aDim = a.nameParts.length > 1 && a.nameParts.init.last == dimName
          val bDim = b.nameParts.length > 1 && b.nameParts.init.last == dimName
          (aDim, bDim) match {
            case (true, false) => (b.nameParts.last, a.nameParts.last)
            case (false, true) => (a.nameParts.last, b.nameParts.last)
            case _ =>
              fail(
                s"ON ${a.name} = ${b.name}: qualify exactly the DIM side with '$dimName' " +
                  "(the dim's name or alias) so the join orientation is unambiguous")
          }
        case other =>
          fail(s"ON condition '${other.sql}' — only equi-conditions (col = col) are supported")
      }
      (parts, pairs.map(_._1), pairs.map(_._2), joinType)
    }
    // the leading select entries ARE the keys: bare attributes (bare
    // keys) or explicitly aliased expressions (DERIVED keys — the
    // time-bucketed rollup `date_trunc('hour', ts) AS h`)
    val nKeys = groupExprs.size
    if (nKeys == 0 || selectList.size <= nKeys)
      fail(
        "the select list must be the GROUP BY keys first, then explicitly aliased " +
          "aggregates (the materialized column order)")
    val leadingEntries: Seq[(String, Option[String])] = selectList.take(nKeys).map {
      case ua: UnresolvedAttribute if ua.nameParts.length == 1 => (ua.nameParts.head, None)
      case al: Alias =>
        requireBare(al.child, s"group key '${al.name}'")
        al.child match {
          case ua: UnresolvedAttribute => (al.name, Some(ua.name)) // a plain rename
          case other => (al.name, Some(other.sql))
        }
      case other =>
        fail(
          s"select the GROUP BY keys first — bare columns or aliased expressions " +
            s"(got '${other.sql}')")
    }
    val names = leadingEntries.map(_._1)
    if (names.distinct.size != names.size) fail(s"duplicate group key among ${names.mkString(", ")}")
    // every GROUP BY entry must name a leading key: by ordinal, by the
    // key's (alias) name, or by repeating the derived expression
    def byOrdinal(i: Int): String =
      if (i >= 1 && i <= nKeys) names(i - 1)
      else fail(s"GROUP BY ordinal $i is outside the $nKeys leading select-list key(s)")
    val matched = groupExprs.map {
      // `GROUP BY 1`: a plain literal pre-Spark-4, an UnresolvedOrdinal
      // node from Spark 4's parser
      case o: org.apache.spark.sql.catalyst.analysis.UnresolvedOrdinal => byOrdinal(o.ordinal)
      case l @ Literal(_, IntegerType) => byOrdinal(l.value.asInstanceOf[Int])
      case ua: UnresolvedAttribute
          if ua.nameParts.length == 1 && names.contains(ua.nameParts.head) =>
        ua.nameParts.head
      case other =>
        val sql = other.sql
        leadingEntries
          .collectFirst { case (n, Some(e)) if e == sql => n }
          .getOrElse(fail(
            s"GROUP BY '${other.sql}' does not match any select-list key — group by the " +
              "key's column, its alias, or its ordinal"))
    }
    if (matched.toSet != names.toSet)
      fail(
        s"the GROUP BY (${matched.mkString(", ")}) must cover exactly the leading " +
          s"select-list keys (${names.mkString(", ")})")
    // the MATERIALIZED column order is the user's SELECT order — `SELECT
    // b, a … GROUP BY a, b` materializes (b, a, …), never a silent
    // rewrite to GROUP BY order (same groups either way)
    val keys = names
    val keyExprs = leadingEntries.collect { case (n, Some(e)) => n -> e }.toMap
    val aggs = selectList.drop(keys.size).map {
      case al: Alias =>
        requireBare(al.child, s"aggregate '${al.name}'")
        s"${al.child.sql} AS ${al.name}"
      case other =>
        fail(s"aggregate '${other.sql}' needs an explicit alias (… AS name)")
    }
    CreateMaterializedViewCommand(mvIdent, factParts, keys, aggs, filterSql, dims, keyExprs)
  }

  /** Resolve `catalog.…ns.table` to a snapshot directory through the
    * session's registered catalogs — run-time resolution, like every
    * DSv2 identifier (the command may be planned before the catalog
    * conf exists).
    */
  private[plans] def dirFor(spark: SparkSession, parts: Seq[String], what: String): String = {
    if (parts.length < 2)
      fail(
        s"$what '${parts.mkString(".")}' must be qualified as <catalog>.<table> where " +
          "<catalog> is a GraftCatalog (spark.sql.catalog.<name> = …GraftCatalog)")
    val plugin =
      try org.apache.spark.sql.graft.Bridge.catalogPlugin(spark, parts.head)
      catch {
        case e: Exception =>
          fail(s"$what: no catalog named '${parts.head}' is registered (${e.getMessage})")
      }
    plugin match {
      case g: graft.sources.snap.GraftCatalog => (g.root +: parts.tail).mkString("/")
      case other =>
        fail(
          s"$what: catalog '${parts.head}' is ${other.getClass.getName}, not a graft " +
            "snapshot catalog")
    }
  }
}

/** `CREATE MATERIALIZED VIEW <ident> AS SELECT …` — resolves the
  * identifiers against the session's catalogs and delegates to
  * [[Mv.create]]; returns the view's first version.
  */
case class CreateMaterializedViewCommand(
    mvIdent: Seq[String],
    factIdent: Seq[String],
    keys: Seq[String],
    aggs: Seq[String],
    filterSql: Option[String],
    dims: Seq[(Seq[String], Seq[String], Seq[String], String)],
    keyExprs: Map[String, String] = Map.empty)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    import GraftSqlParser.dirFor
    val specs = dims.map { case (parts, factCols, dimCols, joinType) =>
      Mv.MvJoinSpec(dirFor(spark, parts, "dim table"), factCols, dimCols, joinType)
    }
    Seq(Row(Mv.create(
      spark,
      dirFor(spark, factIdent, "source table"),
      dirFor(spark, mvIdent, "materialized view"),
      keys,
      aggs,
      filterSql,
      specs,
      keyExprs)))
  }
}

/** `REFRESH MATERIALIZED VIEW <ident>` → [[Mv.refresh]]'s report row. */
case class RefreshMaterializedViewCommand(mvIdent: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("from_version", LongType, nullable = false)(),
    AttributeReference("to_version", LongType, nullable = false)(),
    AttributeReference("groups_recomputed", LongType, nullable = false)(),
    AttributeReference("groups_deleted", LongType, nullable = false)(),
    AttributeReference("full_resync", BooleanType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val r = Mv.refresh(spark, GraftSqlParser.dirFor(spark, mvIdent, "materialized view"))
    Seq(Row(r.fromVersion, r.toVersion, r.groupsRecomputed, r.groupsDeleted, r.fullResync))
  }
}

/** `DROP MATERIALIZED VIEW <ident>` → [[Mv.drop]]; `existed` row. */
case class DropMaterializedViewCommand(mvIdent: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("existed", BooleanType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(Mv.drop(spark, GraftSqlParser.dirFor(spark, mvIdent, "materialized view"))))
}

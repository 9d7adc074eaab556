package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries._

/** Registry integrity — the driver contract lives or dies on these maps.
  * `Map ++ Map` silently overwrites duplicate keys, so a name collision
  * between two query modules would VANISH a query from the gate without
  * any failure; this spec makes that loud.
  */
class SparkEntrySpec extends AnyFunSuite {

  private val moduleQueryMaps = Seq(
    Relational.queries, EventQueries.queries, TextQueries.queries,
    VectorQueries.queries, Extended.queries, Retrieval.queries,
    Corpus.queries, Analytics.queries, Pipeline.queries,
    Advanced.queries, Frontier.queries, Frontier2.queries)

  test("no query name collides across modules (++ would silently drop one)") {
    val perModule = moduleQueryMaps.map(_.size).sum
    val merged = moduleQueryMaps.map(_.keySet).reduce(_ ++ _)
    assert(merged.size == perModule, {
      val all = moduleQueryMaps.flatMap(_.keys)
      val dups = all.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
      s"duplicate query names across modules: ${dups.mkString(", ")}"
    })
  }

  test("every registered query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted.mkString(", ")}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted.mkString(", ")}")
    assert(q.size >= 180)
  }

  test("query numbering is contiguous (a hole invites driver off-by-ones)") {
    val nums = SparkEntry.queries.keySet
      .map(n => "^q(\\d+)".r.findFirstMatchIn(n).get.group(1).toInt)
    val expected = (1 to nums.max).toSet
    val holes = expected -- nums
    assert(holes.isEmpty, s"registry holes: ${holes.toSeq.sorted.mkString(", ")}")
  }

  test("query names follow the registry convention (qN..._snake)") {
    val re = "^q\\d+[a-z]?_[a-z0-9_]+$".r
    SparkEntry.queries.keySet.foreach(n => assert(re.matches(n), s"bad name: $n"))
  }

  test("oracle SQL strings are DuckDB-shaped (no Spark-only escapes)") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, name)
      // Spark-only syntax that DuckDB rejects silently creeps in through
      // copy-paste: `float(...)` casts, backtick quoting, DIV operator
      assert(!sql.contains("`"), s"$name: backtick quoting is Spark-only")
      assert(!sql.toLowerCase.contains(" div "), s"$name: DIV is Spark-only; use //")
    }
  }
}

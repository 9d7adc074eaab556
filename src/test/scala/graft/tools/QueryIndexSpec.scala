package graft.tools

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

class QueryIndexSpec extends AnyFunSuite {

  test("QUERIES.md is in sync with the live registry") {
    val checkedIn = new String(Files.readAllBytes(Paths.get("QUERIES.md")), UTF_8)
    assert(
      checkedIn == QueryIndex.render,
      "QUERIES.md drifted from SparkEntry — regenerate with `sbt \"runMain graft.tools.QueryIndex\"`")
  }

  test("registry ids are contiguous with no holes") {
    val ids = SparkEntry.queries.keySet.map(_.drop(1).takeWhile(_.isDigit).toInt)
    val missing = (1 to ids.max).filterNot(ids)
    assert(missing.isEmpty, s"registry holes: ${missing.mkString(",")}")
  }

  test("every oracle key names a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: ${orphans.mkString(",")}")
  }
}

package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Operator-law checks for the lexical-retrieval queries (q67–q69); the
  * engine-vs-oracle hash check runs in Verify/selfcheck.
  */
class RetrievalSpec extends SparkSpec {

  test("q67 ratios live in (0,1] and the flag matches its rounded inputs") {
    val r = Retrieval.q67(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val distinctRatio = row.getAs[Double]("distinct_ratio")
      val topFrac = row.getAs[Double]("top_frac")
      val dup2Frac = row.getAs[Double]("dup2_frac")
      assert(distinctRatio > 0.0 && distinctRatio <= 1.0)
      assert(topFrac > 0.0 && topFrac <= 1.0)
      assert(dup2Frac >= 0.0 && dup2Frac <= 1.0)
      val expected = if (topFrac > 0.10 || dup2Frac > 0.10) 1L else 0L
      assert(row.getAs[Long]("repetitive") == expected)
      // a doc's distinct tokens can't exceed its total tokens
      assert(row.getAs[Long]("n_distinct") <= row.getAs[Long]("n_tok"))
      assert(row.getAs[Long]("top_tf") <= row.getAs[Long]("n_tok"))
    }
  }

  test("q68 postings are sorted, capped at 8, and df is consistent") {
    val r = Retrieval.q68(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val ids = row.getAs[String]("postings_head").split(",").map(_.toLong)
      assert(ids.sameElements(ids.sorted), s"postings not sorted: ${ids.mkString(",")}")
      assert(ids.length == math.min(row.getAs[Long]("df"), 8L), s"postings_head length ${ids.length} != min(df=${row.getAs[Long]("df")}, 8)")
      assert(row.getAs[Long]("cf") >= row.getAs[Long]("df")) // cf counts multiplicity
    }
  }

  test("q68 df equals the number of distinct docs containing the term") {
    val docs = graft.core.Tables.documents(spark, sf)
    val manual = docs
      .select(explode(array_distinct(graft.functions.Text.tokens(col("text")))).as("term"))
      .groupBy("term")
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    Retrieval.q68(spark, sf).collect().foreach { row =>
      assert(row.getAs[Long]("df") == manual(row.getAs[String]("term")))
    }
  }

  test("q69 returns 10 ranked docs with non-increasing positive scores") {
    val r = Retrieval.q69(spark, sf).collect()
    assert(r.length == 10)
    val scores = r.map(_.getAs[Double]("score"))
    assert(scores.forall(_ > 0.0))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(r.map(_.getAs[Long]("rk")).sameElements(1L to 10L))
  }

  test("q69 plans the global top-10 as TakeOrderedAndProject, not a full sort") {
    val plan = Retrieval
      .q69(spark, sf)
      .queryExecution
      .executedPlan
      .toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan missing TakeOrderedAndProject:\n$plan")
  }

  test("q72 winnowing selects between 1/w and all of the full windows") {
    val npos = graft.core.Tables
      .documents(spark, sf)
      .select(
        col("doc_id"),
        size(graft.functions.Text.shingles(graft.functions.Text.tokens(col("text")), 3))
          .cast("long")
          .as("npos"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    // Density law lives on the PRE-distinct selection: a position is the
    // window minimum for at most w consecutive windows, so distinct selected
    // positions >= nWindows / w. Post-distinct fp VALUES can legitimately
    // fall below that in repetitive docs (same value at distant positions).
    val selPos = Retrieval
      .winnowingSelections(graft.core.Tables.documents(spark, sf))
      .groupBy("doc_id")
      .agg(countDistinct(col("selpos")).as("n_sel"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_sel"))
      .toMap
    val rows = Retrieval.q72(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val nWindows = npos(id) - 3 // full w=4 windows
      val nFp = r.getAs[Long]("n_fp")
      assert(nWindows >= 1, s"doc $id unexpectedly short")
      assert(selPos(id) >= math.ceil(nWindows / 4.0).toLong, s"doc $id: too few selected positions (${selPos(id)} of $nWindows windows)")
      assert(nFp >= 1 && nFp <= selPos(id), s"doc $id: fp value count $nFp outside (0, selected=${selPos(id)}]")
      assert(nFp <= nWindows, s"doc $id: more fingerprints than windows")
      assert(r.getAs[Long]("fp_min") <= r.getAs[Long]("fp_max"))
    }
    // docs too short for a full window are absent, not zero-row artifacts
    val present = rows.map(_.getAs[Long]("doc_id")).toSet
    npos.filter(_._2 < 4).keys.foreach(id => assert(!present.contains(id)))
  }

  test("q68 per-term aggregation state is bounded: rank-gated collect, one post-tf exchange") {
    spark.catalog.clearCache() // q69's persisted tf would otherwise inline its cached plan (and its exchanges) here
    val qe = Retrieval.q68(spark, sf).queryExecution
    val optimized = qe.optimizedPlan.toString
    // collect_list input must be the rank-conditional, not the raw doc_id
    assert(
      optimized.contains("collect_list(CASE WHEN"),
      s"collect_list is not rank-gated:\n$optimized")
    assert(optimized.contains("row_number()"), "missing row_number rank")
    // the window's hash-partitioning on tok must be reused by the final
    // groupBy: hash exchanges = tf-agg shuffle + window/term shuffle and
    // nothing else (the final groupBy adds none; orderBy's range exchange
    // and the fixture's scan-spread round-robin don't hash-shuffle)
    val hashExchanges =
      "Exchange hashpartitioning".r.findAllIn(qe.executedPlan.toString).length
    assert(hashExchanges == 2, s"expected 2 hash exchanges, got $hashExchanges:\n${qe.executedPlan}")
  }

  test("q69 only ranks docs that actually contain a query term") {
    val hits = Retrieval.q69(spark, sf).select("doc_id").collect().map(_.getLong(0)).toSet
    val containing = graft.core.Tables
      .documents(spark, sf)
      .select(col("doc_id"), graft.functions.Text.tokens(col("text")).as("toks"))
      .filter(Retrieval.Bm25Terms.map(t => array_contains(col("toks"), t)).reduce(_ || _))
      .collect()
      .map(_.getLong(0))
      .toSet
    assert(hits.subsetOf(containing))
  }
}

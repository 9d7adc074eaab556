package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.functions.Text
import graft.llm.Dedup

/** Operator-law checks for the web-corpus curation queries (q101–q105);
  * the engine-vs-oracle hash check runs in Verify/selfcheck.
  */
class PipelineSpec extends SparkSpec {

  test("q101 domain partition: kept + blocked = corpus, every domain parses") {
    val total = Tables.documents(spark, sf).count()
    val kept = Pipeline.q101(spark, sf).agg(sum(col("n_docs"))).collect()(0).getLong(0)
    // recompute the blocklist directly from the same synthesis rule
    val blocked = Tables
      .documents(spark, sf)
      .select(
        concat(col("source"), lit("-"), (col("doc_id") % 7).cast("string"), lit(".example.com"))
          .as("domain"))
      .filter(Text.hash60(col("domain")) % 5 === 0)
      .count()
    assert(kept + blocked == total, s"kept $kept + blocked $blocked != $total")
    Pipeline.q101(spark, sf).collect().foreach { r =>
      assert(r.getAs[String]("domain").endsWith(".example.com"))
      assert(r.getAs[Long]("n_docs") >= 1L)
    }
  }

  test("q102 weighted sample: exactly min(5, stratum size) rows per source, reproducible") {
    val docs = Tables.documents(spark, sf)
    val perSource = docs.groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sample = Pipeline.q102(spark, sf).collect()
    val got = sample.groupBy(_.getAs[String]("source")).view.mapValues(_.length.toLong).toMap
    perSource.foreach { case (src, n) =>
      assert(got.getOrElse(src, 0L) == math.min(5L, n), s"source $src: ${got.get(src)} of $n")
    }
    // keys are ln(u)/w with u in (0,1] → strictly non-positive
    sample.foreach(r => assert(r.getAs[Double]("skey") <= 0.0))
    // determinism: a second run is row-identical (no RNG state anywhere)
    val again = Pipeline.q102(spark, sf).collect()
    assert(sample.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("q102 heavier rows win the sample more often than uniform") {
    // A-ES law (coarse): the sampled rows' mean weight should exceed the
    // corpus mean weight — weighting must bias selection toward heavy rows.
    val corpusMean = Tables.documents(spark, sf).agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    val sampleMean = Pipeline.q102(spark, sf).agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    assert(sampleMean > corpusMean, s"sample mean $sampleMean !> corpus mean $corpusMean")
  }

  test("q103 projection is linear and matches a driver-side recomputation") {
    val rows = Pipeline.q103(spark, sf).limit(3).collect()
    val embs = Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 3)
      .orderBy(col("vec_id"))
      .collect()
      .map(r => r.getAs[Seq[Float]]("embedding").toArray)
    rows.zip(embs).foreach { case (row, e) =>
      (0 until 16).foreach { j =>
        val raw = (0 until 64).map { i =>
          val w = ((1103515245L * (j * 64 + i) + 12345L) % 65536L) - 32768L
          e(i).toDouble * w.toDouble
        }.sum
        val expected = math.floor(raw * 10000.0 + 0.5) / 10000.0
        assert(row.getAs[Double](s"p$j") == expected, s"p$j mismatch")
      }
    }
  }

  test("q103 plans with no aggregation shuffle — per-row arithmetic only") {
    val plan = Pipeline.q103(spark, sf).queryExecution.executedPlan.toString
    // allowed exchanges: the final orderBy's range partitioning and the
    // fixture-only scan spread (round-robin). A hash exchange would mean
    // the projection snuck in an aggregation or join.
    assert(!plan.contains("hashpartitioning"), s"unexpected hash exchange:\n$plan")
    assert(!plan.contains("HashAggregate"), s"unexpected aggregate:\n$plan")
  }

  test("q104 keeps the top 60% of each source by rank construction") {
    val perSource = Tables.documents(spark, sf).groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Pipeline.q104(spark, sf).collect().groupBy(_.getAs[String]("source"))
      .view.mapValues(_.length.toLong).toMap
    perSource.foreach { case (src, n) =>
      // percent_rank = (r-1)/(n-1) >= 0.4 → kept = n - ceil(0.4*(n-1))
      val expected = if (n == 1) 1L else n - math.ceil(0.4 * (n - 1)).toLong
      assert(kept.getOrElse(src, 0L) == expected, s"source $src: ${kept.get(src)} of $n")
    }
  }

  test("q106 BPE reproduces the textbook merge sequence with tie-breaks") {
    import spark.implicits._
    // Sennrich et al.'s example vocabulary: (e,s) and (s,t) tie at 9,
    // lexicographic tie-break picks (e,s); then (es,t); then (l,o) wins
    // its 7-7 tie with (o,w).
    val tk = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("tok", "freq")
    val m = Pipeline.bpeMerges(tk, 3).collect()
      .map(r => (r.getAs[Long]("step"), r.getAs[String]("lhs"), r.getAs[String]("rhs"),
        r.getAs[String]("merged"), r.getAs[Long]("pair_count")))
    assert(m.toSeq == Seq(
      (1L, "e", "s", "es", 9L),
      (2L, "es", "t", "est", 9L),
      (3L, "l", "o", "lo", 7L)))
  }

  test("q106 BPE greedy merge is left-to-right non-overlapping on runs") {
    import spark.implicits._
    // "aaaa": pair (a,a) occurs at positions 1,2,3 (count 3); a greedy
    // scan merges positions 1 and 3 only -> "aa","aa"; round 2 merges
    // (aa,aa) once. "aaa" contributes count 2 in round 1, merges once.
    val tk = Seq(("aaaa", 1L), ("aaa", 1L)).toDF("tok", "freq")
    val m = Pipeline.bpeMerges(tk, 2).collect()
      .map(r => (r.getAs[Long]("step"), r.getAs[String]("lhs"), r.getAs[String]("rhs"),
        r.getAs[Long]("pair_count")))
    assert(m.toSeq == Seq(
      (1L, "a", "a", 5L), // 3 from aaaa + 2 from aaa
      // round 2: aaaa -> (aa,aa), aaa -> (aa,a); 1-1 tie and "a" < "aa",
      // so the lexicographic tie-break picks (aa, a)
      (2L, "aa", "a", 1L)))
  }

  test("q105 estimate tracks exact jaccard on the candidate pairs") {
    val docs = Tables.documents(spark, sf)
    val est = Pipeline.q105(spark, sf).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) -> r.getAs[Double]("est_jaccard"))
      .toMap
    assert(est.nonEmpty, "no LSH candidates in fixture")
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.0).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) -> r.getAs[Double]("jaccard"))
      .toMap
    val errs = est.toSeq.map { case (pair, e) => math.abs(e - exact.getOrElse(pair, 0.0)) }
    val mae = errs.sum / errs.length
    // 16 components → per-pair σ ≤ 0.125; the mean over pairs is far tighter
    assert(mae <= 0.15, s"mean |est - exact| = $mae over ${errs.length} pairs")
    errs.foreach(e => assert(e <= 0.45, s"single-pair estimator error $e"))
  }
}

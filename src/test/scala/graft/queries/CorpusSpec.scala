package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Aggregators

/** Operator-law checks for the corpus-preparation queries (q83–q92); the
  * engine-vs-oracle hash check runs in Verify/selfcheck.
  */
class CorpusSpec extends SparkSpec {

  test("q83 counts match the construction rule and redaction removes every match") {
    val r = Corpus.q83(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val k = row.getAs[Long]("c_custkey")
      assert(row.getAs[Long]("n_emails") == (if (k % 3 != 0) 1L else 0L))
      assert(row.getAs[Long]("n_phones") == (if (k % 2 == 0) 1L else 0L))
      assert(row.getAs[Long]("n_ips") == 1L)
    }
    // redacted text contains placeholders, never a remaining entity: check via
    // a recount on the redacted string itself
    val redacted = graft.core.Tables
      .customer(spark, sf)
      .select(col("c_custkey"))
      .count()
    assert(redacted == r.length.toLong)
  }

  test("q84 exact heavy hitters are the true top-20 under (count desc, token) order") {
    val r = Corpus.q84(spark, sf).collect()
    assert(r.length == 20)
    val counts = r.map(_.getAs[Long]("cnt"))
    assert(counts.sameElements(counts.sortBy(-_)), "not sorted by count desc")
  }

  test("Misra-Gries guarantees: frequent items survive, counts within N/(k+1)") {
    import spark.implicits._
    val toks = graft.core.Tables
      .documents(spark, sf)
      .select(explode(graft.functions.Text.tokens(col("text"))).as("tok"))
      .as[String]
    val n = toks.count()
    val k = 12
    val mg = toks.select(new Aggregators.MisraGries(k).toColumn).head()
    assert(mg.size <= k)
    val exact = toks.groupBy("tok").count().as[(String, Long)].collect().toMap
    val bound = n / (k + 1)
    exact.foreach { case (t, c) =>
      if (c > bound) assert(mg.contains(t), s"frequent item '$t' (count $c > $bound) missing from MG summary")
    }
    mg.foreach { case (t, c) =>
      val truth = exact.getOrElse(t, 0L)
      assert(c <= truth, s"MG overestimates '$t': $c > $truth")
      assert(truth - c <= bound, s"MG undercount for '$t' beyond bound: $truth - $c > $bound")
    }
  }

  test("q85 flags are consistent: boiler windows never exceed totals; some boilerplate exists") {
    val r = Corpus.q85(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("n_boiler") <= row.getAs[Long]("n_windows"))
      val kr = row.getAs[Double]("keep_ratio")
      assert(kr >= 0.0 && kr <= 1.0)
    }
    assert(r.map(_.getAs[Long]("n_boiler")).sum > 0, "fixture should contain shared windows")
  }

  test("q90 smoothed probabilities are valid and marginals dominate pair counts") {
    val r = Corpus.q90(spark, sf).collect()
    assert(r.length <= 100 && r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("c12") <= row.getAs[Long]("c1"))
      val p = row.getAs[Double]("p_smooth")
      assert(p > 0.0 && p < 1.0)
    }
  }

  test("q91 oov accounting: n_oov <= n_tok, rate matches, ids digest present") {
    val r = Corpus.q91(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val nTok = row.getAs[Long]("n_tok")
      val nOov = row.getAs[Long]("n_oov")
      assert(nOov <= nTok)
      val expected = math.floor(nOov.toDouble / nTok * 1e6 + 0.5) / 1e6
      assert(row.getAs[Double]("oov_rate") == expected)
      assert(row.getAs[String]("ids_hash").length == 32)
    }
  }

  test("q94 ranks are positive, sorted, and bounded by the undamped maximum") {
    val r = Corpus.q94(spark, sf).collect()
    assert(r.nonEmpty && r.length <= 20)
    val ranks = r.map(_.getAs[Double]("rank"))
    assert(ranks.sameElements(ranks.sortBy(-_)), "not sorted by rank desc")
    ranks.foreach { p =>
      // every rank sits in ((1-d)/N, 1): the damping floor is strict, and
      // no node can absorb the entire rank mass
      assert(p > 0.0 && p < 1.0)
    }
  }

  test("q96 perplexity is exp(-avg_logp) and log-probs are negative") {
    val r = Corpus.q96(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val avg = row.getAs[Double]("avg_logp")
      assert(avg < 0.0, "smoothed bigram log-probs must be negative")
      val expected = math.floor(math.exp(-avg) * 1e4 + 0.5) / 1e4
      assert(row.getAs[Double]("ppl") == expected)
      assert(row.getAs[Long]("n_bigrams") > 0)
    }
  }

  test("q97 flags exactly the candidates sharing a 4-gram with the benchmark slice") {
    val r = Corpus.q97(spark, sf).collect()
    r.foreach { row =>
      assert(row.getAs[Long]("doc_id") % 13 != 0, "benchmark docs cannot be candidates")
      assert(row.getAs[Long]("bench_id") % 13 == 0, "flag target must be a benchmark doc")
      assert(row.getAs[Long]("n_shared") >= 1)
    }
  }

  test("q99 pipeline: stages compose — survivors clean, packs budget-contiguous") {
    val r = Corpus.q99(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("doc_id") % 13 != 0, "benchmark docs must not survive")
      assert(row.getAs[Long]("n_tok") > 0)
    }
    // pack ids are the floor of the running token prefix: within each
    // source, recompute and compare
    r.groupBy(_.getAs[String]("source")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("doc_id"))
      var before = 0L
      sorted.foreach { row =>
        assert(row.getAs[Long]("pack_id") == before / 512L, "pack id mismatch")
        before += row.getAs[Long]("n_tok")
      }
    }
    // survivors are a strict subset: stages actually filtered something
    val total = graft.core.Tables.documents(spark, sf).count()
    assert(r.length < total)
  }

  test("q100 chunks tile each doc: stride positions, bounded width, full coverage") {
    val chunks = Corpus.q100(spark, sf).collect()
    assert(chunks.nonEmpty)
    val nTok = graft.core.Tables
      .documents(spark, sf)
      .select(col("doc_id"), size(graft.functions.Text.tokens(col("text"))).cast("long").as("n"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    chunks.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("chunk_idx"))
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Long]("chunk_idx") == i.toLong)
        assert(r.getAs[Long]("start_tok") == i.toLong * 48)
        assert(r.getAs[Long]("n_tok_chunk") >= 1 && r.getAs[Long]("n_tok_chunk") <= 64)
      }
      // the last chunk reaches the end of the doc (full coverage)
      val last = sorted.last
      assert(last.getAs[Long]("start_tok") + last.getAs[Long]("n_tok_chunk") == nTok(id))
    }
  }

  test("q92 keeps every smallest-stratum doc and downsamples the largest most") {
    val r = Corpus.q92(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("n_kept") <= row.getAs[Long]("n_docs"))
      val f = row.getAs[Double]("keep_frac")
      assert(f > 0.0 && f <= 1.0)
    }
    val byN = r.sortBy(_.getAs[Long]("n_docs"))
    assert(byN.head.getAs[Double]("keep_frac") == 1.0, "smallest stratum keeps everything")
    assert(
      byN.last.getAs[Double]("keep_frac") <= byN.head.getAs[Double]("keep_frac"),
      "largest stratum must be downsampled at least as hard as the smallest")
  }

  test("q114 repeated n-grams: cross-doc recurrence laws; top-100 plans as TakeOrderedAndProject") {
    val df = Corpus.q114(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan missing TakeOrderedAndProject:\n$plan")
    val r = df.collect()
    assert(r.nonEmpty && r.length <= 100)
    r.foreach { row =>
      assert(row.getAs[Long]("n_docs") >= 2, "every surviving n-gram recurs across docs")
      assert(row.getAs[Long]("n_occ") >= row.getAs[Long]("n_docs"), "occurrences dominate doc count")
    }
  }
}

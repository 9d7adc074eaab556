package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Det, Tables}
import graft.functions.Text
import graft.llm.Dedup

/** Web-scale corpus-curation queries that round out the pipeline surface:
  * URL/domain analytics and blocklisting, weighted reservoir sampling,
  * random-projection dimensionality reduction, per-stratum quantile
  * gating, and sketch-estimated (not exact) near-dup similarity — the
  * forms these operators actually take at 100 TB, where per-pair exact
  * work or corpus-wide RNG state are off the table.
  *
  * Same discipline as the other registries: codegen'd built-ins only,
  * portable md5-derived hashes, `Det` rounding at every float divergence
  * point, and a DuckDB oracle twin per query.
  */
object Pipeline {

  type Q = (SparkSession, String) => DataFrame

  private val sqlToks = Text.sqlToks

  // -- q101: domain extraction + per-domain stats + blocklist ----------

  /** Domain-level corpus analytics: parse the host out of each document's
    * URL, drop blocklisted domains (hash-derived blocklist — in production
    * a broadcast set), and report per-domain document counts, language
    * spread, and volume. The fixtures carry no URL column, so one is
    * synthesized closed-form from (source, doc_id, lang) first; the
    * operator under test is the parse + filter + aggregate that follows.
    * One hash shuffle on the domain; at 100 TB the domain cardinality is
    * ~1e8 — far below corpus size — and heavy domains are exactly what
    * AQE skew-split handles.
    */
  def q101(s: SparkSession, d: String): DataFrame = {
    val url = concat(
      lit("https://"),
      col("source"),
      lit("-"),
      (col("doc_id") % 7).cast("string"),
      lit(".example.com/"),
      col("lang"),
      lit("/doc/"),
      col("doc_id").cast("string"))
    Tables
      .documents(s, d)
      .select(col("doc_id"), col("lang"), col("n_chars"), url.as("url"))
      // the operator: host extraction from the URL string itself
      .withColumn("domain", regexp_extract(col("url"), "^https?://([^/]+)/", 1))
      .filter(Text.hash60(col("domain")) % 5 =!= 0) // blocklist gate
      .groupBy(col("domain"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_chars")).as("total_chars"))
      .withColumn("avg_chars", Det.r2(col("total_chars").cast("double") / col("n_docs")))
      .orderBy(col("domain"))
  }

  val q101Sql: String =
    s"""WITH u AS (
       |  SELECT doc_id, lang, n_chars,
       |    'https://' || source || '-' || CAST(doc_id % 7 AS VARCHAR) || '.example.com/'
       |      || lang || '/doc/' || CAST(doc_id AS VARCHAR) AS url
       |  FROM documents),
       |h AS (
       |  SELECT doc_id, lang, n_chars,
       |    regexp_extract(url, '^https?://([^/]+)/', 1) AS domain
       |  FROM u)
       |SELECT domain, count(*) AS n_docs,
       |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
       |  ${Det.sqlR("CAST(sum(n_chars) AS DOUBLE) / count(*)", 2)} AS avg_chars
       |FROM h WHERE (${Text.sqlHash60("domain")}) % 5 <> 0
       |GROUP BY domain ORDER BY domain""".stripMargin

  // -- q102: deterministic weighted sampling (Efraimidis–Spirakis) -----

  /** Weighted reservoir sampling without RNG state: the A-ES scheme keys
    * each row by ln(u)/w (u = hash-derived uniform in (0,1], w = weight)
    * and keeps the top-k keys per stratum — each row's inclusion
    * probability is proportional to its weight, yet the sample is fully
    * reproducible across runs, engines, and (crucially) executors. Here
    * w = n_chars, k = 5 per source. One window per stratum; no global
    * state, no driver round-trip — the distributed form of weighted
    * sampling a mixture builder runs per shard.
    */
  def q102(s: SparkSession, d: String): DataFrame = {
    val u =
      ((Text.hash60(col("doc_id").cast("string")) % lit(1073741824L)) + lit(1L)).cast("double") / 1073741824.0
    val key = Det.r6(log(u) / col("n_chars"))
    Tables
      .documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars"), key.as("skey"))
      .withColumn(
        "rn",
        row_number()
          .over(Window.partitionBy(col("source")).orderBy(col("skey").desc, col("doc_id")))
          .cast("long"))
      .filter(col("rn") <= 5)
      .select(col("doc_id"), col("source"), col("n_chars"), col("skey"), col("rn"))
      .orderBy(col("source"), col("rn"))
  }

  val q102Sql: String = {
    val u = s"((${Text.sqlHash60("CAST(doc_id AS VARCHAR)")}) % 1073741824 + 1) / 1073741824.0"
    s"""WITH k AS (
       |  SELECT doc_id, source, n_chars,
       |    ${Det.sqlR(s"ln($u) / n_chars", 6)} AS skey
       |  FROM documents),
       |r AS (
       |  SELECT doc_id, source, n_chars, skey,
       |    CAST(row_number() OVER (PARTITION BY source ORDER BY skey DESC, doc_id) AS BIGINT) AS rn
       |  FROM k)
       |SELECT doc_id, source, n_chars, skey, rn
       |FROM r WHERE rn <= 5 ORDER BY source, rn""".stripMargin
  }

  // -- q103: random-projection dimensionality reduction (JL) -----------

  /** Johnson–Lindenstrauss random projection: 64-dim float embeddings
    * down to 16 dims via a deterministic integer-mix weight matrix (the
    * q34 hyperplane trick — executors need no broadcast side data, and
    * the oracle can rebuild the exact same matrix in SQL). Entirely
    * per-row codegen'd arithmetic: zero shuffles before the presentation
    * sort. At 100 TB this is the standard 4× shrink applied before any
    * distance-based stage — downstream cosine/cluster work touches 16
    * doubles instead of 64 floats.
    */
  def q103(s: SparkSession, d: String): DataFrame = {
    def weight(j: Column, i: Column): Column =
      ((lit(1103515245L) * (j.cast("long") * lit(64L) + i.cast("long")) + lit(12345L)) % lit(65536L) -
        lit(32768L)).cast("double")
    val proj = transform(
      sequence(lit(0), lit(15)),
      j =>
        Det.r4(
          aggregate(
            zip_with(col("embedding"), sequence(lit(0), lit(63)), (x, i) => x.cast("double") * weight(j, i)),
            lit(0.0),
            (acc, x) => acc + x)))
    Tables
      .embeddings(s, d)
      .select(col("vec_id") +: (0 until 16).map(j => element_at(proj, j + 1).as(s"p$j")): _*)
      .orderBy(col("vec_id"))
  }

  val q103Sql: String = {
    val lam = Det.sqlR(
      "list_sum(list_transform(range(0, 64), i -> " +
        "CAST(embedding[i + 1] AS DOUBLE) * CAST((1103515245*(j*64 + i) + 12345) % 65536 - 32768 AS DOUBLE)))",
      4)
    val cols = (0 until 16).map(j => s"p[${j + 1}] AS p$j").mkString(", ")
    s"""WITH pr AS (
       |  SELECT vec_id, list_transform(range(0, 16), j -> $lam) AS p
       |  FROM embeddings)
       |SELECT vec_id, $cols FROM pr ORDER BY vec_id""".stripMargin
  }

  // -- q104: per-stratum quantile quality gate --------------------------

  /** Quantile-based quality filtering: score every document (q29's
    * formula), rank it against its own source's distribution with
    * percent_rank, and keep the top 60% of each source — the
    * "filter relative to the stratum, not globally" rule that stops a
    * single high-quality source from crowding out every other stratum.
    * The rank window hashes on source; quality is r4-snapped BEFORE
    * ranking so both engines order identically (doc_id breaks ties).
    */
  def q104(s: SparkSession, d: String): DataFrame = {
    val docs = Tables
      .documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars"), Text.tokens(col("text")).as("toks"))
      .select(
        col("doc_id"),
        col("source"),
        size(col("toks")).cast("long").as("n_tok"),
        Text.markerCount(col("toks"), Text.stopwords).as("n_stop"),
        col("n_chars"))
      .withColumn(
        "quality",
        Det.r4(
          least(col("n_tok").cast("double") / 100.0, lit(1.0)) * 0.5 +
            when(col("n_tok") > 0, col("n_stop").cast("double") / col("n_tok")).otherwise(lit(0.0)) * 0.3 +
            when(
              when(col("n_tok") > 0, col("n_chars").cast("double") / col("n_tok"))
                .otherwise(lit(0.0))
                .between(3.0, 8.0),
              lit(0.2)).otherwise(lit(0.0))))
    docs
      .withColumn(
        "pr",
        Det.r6(percent_rank().over(Window.partitionBy(col("source")).orderBy(col("quality"), col("doc_id")))))
      .filter(col("pr") >= 0.4)
      .select(col("doc_id"), col("source"), col("quality"), col("pr"))
      .orderBy(col("doc_id"))
  }

  val q104Sql: String = {
    val stops = Text.stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH d AS (
       |  SELECT doc_id, source, n_chars,
       |    CAST(len($sqlToks) AS BIGINT) AS n_tok,
       |    CAST(len(list_filter($sqlToks, x -> x IN ($stops))) AS BIGINT) AS n_stop
       |  FROM documents),
       |q AS (
       |  SELECT doc_id, source,
       |    ${Det.sqlR(
        "least(CAST(n_tok AS DOUBLE)/100.0, 1.0)*0.5" +
          " + (CASE WHEN n_tok > 0 THEN CAST(n_stop AS DOUBLE)/n_tok ELSE 0.0 END)*0.3" +
          " + (CASE WHEN (CASE WHEN n_tok > 0 THEN CAST(n_chars AS DOUBLE)/n_tok ELSE 0.0 END) BETWEEN 3.0 AND 8.0 THEN 0.2 ELSE 0.0 END)",
        4)} AS quality
       |  FROM d),
       |r AS (
       |  SELECT doc_id, source, quality,
       |    ${Det.sqlR("percent_rank() OVER (PARTITION BY source ORDER BY quality, doc_id)", 6)} AS pr
       |  FROM q)
       |SELECT doc_id, source, quality, pr FROM r WHERE pr >= 0.4 ORDER BY doc_id""".stripMargin
  }

  // -- q105: sketch-estimated near-dup similarity ------------------------

  /** Estimated-similarity near-dup: LSH candidate pairs scored by their
    * minhash signature agreement (matching components / 16) instead of
    * exact shingle-set Jaccard. This is the form near-dup runs at 100 TB:
    * candidates come from the banded join (q26) and the similarity
    * estimate needs only the two 16-component signatures — 128 bytes a
    * side — never a revisit of the documents. The estimator's accuracy
    * against exact Jaccard is law-tested in PipelineSpec.
    */
  def q105(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // ONE shingle+minhash pass: the persisted signatures feed the banded
    // candidate join AND both sides of the signature-agreement join.
    val sig = Dedup
      .minhashSignatures(docs, "doc_id", "text", 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = Dedup.bandsOfSignatures(sig, "doc_id")
    val cand = bands
      .select(col("doc_id").as("a_id"), col("band"), col("bandval"))
      .join(bands.select(col("doc_id").as("b_id"), col("band"), col("bandval")), Seq("band", "bandval"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
    val a = sig.select(col("doc_id").as("a_id") +: (0 until 16).map(j => col(s"m$j").as(s"a$j")): _*)
    val b = sig.select(col("doc_id").as("b_id") +: (0 until 16).map(j => col(s"m$j").as(s"b$j")): _*)
    val agree = (0 until 16)
      .map(j => when(col(s"a$j") === col(s"b$j"), 1L).otherwise(0L))
      .reduce(_ + _)
    cand
      .join(a, Seq("a_id"))
      .join(b, Seq("b_id"))
      .select(col("a_id"), col("b_id"), agree.as("n_agree"))
      .withColumn("est_jaccard", Det.r4(col("n_agree").cast("double") / 16.0))
      .orderBy(col("a_id"), col("b_id"))
  }

  val q105Sql: String = {
    val mins = (0 until 16)
      .map(j => s"min(${Text.sqlMinhashTerm("h", j)}) AS m$j")
      .mkString(", ")
    val bandRows = (0 until 4)
      .map { band =>
        val cols = (4 * band until 4 * band + 4).map(j => s"CAST(m$j AS VARCHAR)").mkString(" || ':' || ")
        s"SELECT doc_id, $band AS band, $cols AS bandval FROM sig"
      }
      .mkString("\n  UNION ALL ")
    val agree = (0 until 16)
      .map(j => s"(CASE WHEN sa.m$j = sb.m$j THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH d AS (SELECT doc_id, $sqlToks AS w FROM documents),
       |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
       |       FROM d, LATERAL (SELECT unnest(range(1, len(w)-1)) AS i) t),
       |hs AS (SELECT doc_id, ${Text.sqlHash60("s")} AS h FROM sh),
       |sig AS (SELECT doc_id, $mins FROM hs GROUP BY doc_id),
       |bands AS (
       |  $bandRows),
       |cand AS (
       |  SELECT DISTINCT l.doc_id AS a_id, r.doc_id AS b_id
       |  FROM bands l JOIN bands r ON l.band = r.band AND l.bandval = r.bandval AND l.doc_id < r.doc_id)
       |SELECT c.a_id, c.b_id,
       |  CAST($agree AS BIGINT) AS n_agree,
       |  ${Det.sqlR(s"CAST($agree AS DOUBLE) / 16.0", 4)} AS est_jaccard
       |FROM cand c JOIN sig sa ON sa.doc_id = c.a_id JOIN sig sb ON sb.doc_id = c.b_id
       |ORDER BY a_id, b_id""".stripMargin
  }

  // -- q106: BPE tokenizer-training merges (3 unrolled rounds) ----------

  /** Byte-pair-encoding vocabulary training, the distributed way: start
    * from the corpus vocabulary as per-character symbol rows, then 3
    * rounds of (count adjacent symbol pairs weighted by word frequency →
    * pick the global top pair → merge its left-to-right non-overlapping
    * occurrences in every word). The sequential "scan each word left to
    * right" of textbook BPE is replaced by pure window algebra: matched
    * positions form runs only when a pair self-overlaps (a == b), and a
    * greedy scan keeps exactly the even offsets of each run — so
    * `(pos − min(pos) OVER run) % 2 = 0` IS the greedy merge, no fold
    * needed. Every window hashes on the word, so all three rounds reuse
    * one partitioning; pair counting is vocabulary-sized (distinct words
    * × word length), never corpus-sized, and the winning pair is a
    * one-row broadcast. Entirely integer/string arithmetic — exact on
    * both engines with no rounding at all.
    */
  def q106(s: SparkSession, d: String): DataFrame = {
    val tk = Tables
      .documents(s, d)
      .select(explode(Text.tokens(col("text"))).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("freq"))
    bpeMerges(tk, 3)
  }

  /** The BPE training rounds over a (tok, freq) vocabulary frame — see
    * [[q106]] for the algorithm; split out so the greedy-merge semantics
    * (especially self-overlapping pairs like "aaaa") are unit-testable on
    * crafted vocabularies.
    */
  def bpeMerges(tk: DataFrame, rounds: Int): DataFrame = {
    val w = Window.partitionBy(col("tok")).orderBy(col("pos"))
    var syms = tk
      .select(
        col("tok"),
        col("freq"),
        posexplode(transform(sequence(lit(1), length(col("tok"))), i => col("tok").substr(i, lit(1))))
          .as(Seq("pos0", "sym")))
      .select(col("tok"), col("freq"), (col("pos0") + 1).cast("long").as("pos"), col("sym"))
    var merges = Seq.empty[DataFrame]
    for (step <- 1 to rounds) {
      val paired = syms.withColumn("nxt", lead(col("sym"), 1).over(w))
      val top = paired
        .filter(col("nxt").isNotNull)
        .groupBy(col("sym").as("a"), col("nxt").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
      merges = merges :+ top.select(
        lit(step.toLong).as("step"),
        col("a").as("lhs"),
        col("b").as("rhs"),
        concat(col("a"), col("b")).as("merged"),
        col("cnt").as("pair_count"))
      val flagged = paired
        .crossJoin(broadcast(top))
        .withColumn("m", coalesce(col("sym") === col("a") && col("nxt") === col("b"), lit(false)))
        // runs of consecutive matched positions (only possible when a == b):
        // greedy left-to-right keeps the even offsets within each run
        .withColumn(
          "grp",
          when(col("m"), col("pos") - row_number().over(Window.partitionBy(col("tok"), col("m")).orderBy(col("pos")))))
        .withColumn(
          "keep",
          when(
            col("m"),
            (col("pos") - min(col("pos")).over(Window.partitionBy(col("tok"), col("grp")))) % 2 === 0)
            .otherwise(lit(false)))
      syms = flagged
        .withColumn("consumed", coalesce(lag(col("keep"), 1).over(w), lit(false)))
        .filter(!col("consumed"))
        .select(
          col("tok"),
          col("freq"),
          row_number().over(w).cast("long").as("pos"),
          when(col("keep"), concat(col("sym"), col("nxt"))).otherwise(col("sym")).as("sym"))
    }
    merges.reduce(_ unionByName _).orderBy(col("step"))
  }

  private def bpeRound(k: Int, in: String): String =
      s"""p_$k AS (SELECT tok, freq, pos, sym, lead(sym) OVER (PARTITION BY tok ORDER BY pos) AS nxt FROM $in),
         |t_$k AS (SELECT sym AS a, nxt AS b, CAST(sum(freq) AS BIGINT) AS cnt
         |         FROM p_$k WHERE nxt IS NOT NULL GROUP BY sym, nxt
         |         ORDER BY cnt DESC, a, b LIMIT 1),
         |m_$k AS (SELECT p.*, t.a, t.b, coalesce(p.sym = t.a AND p.nxt = t.b, false) AS m
         |         FROM p_$k p CROSS JOIN t_$k t),
         |r_$k AS (SELECT *, CASE WHEN m THEN pos - row_number() OVER (PARTITION BY tok, m ORDER BY pos) END AS grp
         |         FROM m_$k),
         |k_$k AS (SELECT *, CASE WHEN m THEN (pos - min(pos) OVER (PARTITION BY tok, grp)) % 2 = 0 ELSE false END AS keep
         |         FROM r_$k),
         |s_${k + 1} AS (
         |  SELECT tok, freq, CAST(row_number() OVER (PARTITION BY tok ORDER BY pos) AS BIGINT) AS pos,
         |         CASE WHEN keep THEN sym || nxt ELSE sym END AS sym
         |  FROM (SELECT *, coalesce(lag(keep) OVER (PARTITION BY tok ORDER BY pos), false) AS consumed FROM k_$k) z
         |  WHERE NOT consumed)""".stripMargin

  /** The BPE training CTE chain (vocabulary -> 3 greedy merge rounds,
    * winners in t_1..t_3) — shared by q106 (which SELECTs the merge table)
    * and q131 (which APPLIES the merges to tokenize the corpus), so the
    * two oracles train identically by construction.
    */
  private val bpeCtes: String =
    s"""tk AS (
       |  SELECT tok, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest($sqlToks) AS tok FROM documents) u GROUP BY tok),
       |s_1 AS (
       |  SELECT tok, freq, CAST(i AS BIGINT) AS pos, tok[CAST(i AS INT)] AS sym
       |  FROM tk, LATERAL (SELECT unnest(range(1, length(tok) + 1)) AS i) t),
       |${bpeRound(1, "s_1")},
       |${bpeRound(2, "s_2")},
       |${bpeRound(3, "s_3")}""".stripMargin

  val q106Sql: String = {
    s"""WITH $bpeCtes
       |SELECT * FROM (
       |  SELECT CAST(1 AS BIGINT) AS step, a AS lhs, b AS rhs, a || b AS merged, cnt AS pair_count FROM t_1
       |  UNION ALL
       |  SELECT CAST(2 AS BIGINT), a, b, a || b, cnt FROM t_2
       |  UNION ALL
       |  SELECT CAST(3 AS BIGINT), a, b, a || b, cnt FROM t_3) m
       |ORDER BY step""".stripMargin
  }

  // -- q131: BPE tokenizer APPLY (encode with the trained merges) -------

  /** The apply half of the tokenizer story: encode every document with the
    * merge table q106 trained. Per word: char-split with spaces, then the
    * 3 merges replace in rank order — single-pass left-to-right
    * non-overlapping `replace` IS the BPE apply step (a merged symbol is a
    * new token, so the same merge can never re-fire on its own output; the
    * self-overlap law is q106's spec). The trained merges are collected to
    * the driver and spliced as literals — an O(model) transfer, the
    * standard deploy shape for a trained tokenizer — so the per-doc
    * encoding is one narrow codegen'd pass, no join against the merge
    * table. Output: per-doc word/unit/char totals + units-per-char ratio
    * (the compression the 3 merges bought).
    */
  def q131(s: SparkSession, d: String): DataFrame = {
    val merges = q106(s, d)
      .orderBy(col("step"))
      .collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3)))
    def esc(x: String) = x.replace("\\", "\\\\").replace("'", "\\'")
    val spaced = "concat_ws(' ', filter(split(x, ''), c -> c != ''))"
    val applied = merges.foldLeft(spaced) { case (acc, (a, b, ab)) =>
      s"replace($acc, '${esc(a)} ${esc(b)}', '${esc(ab)}')"
    }
    Tables
      .documents(s, d)
      .select(col("doc_id"), Text.tokens(col("text")).as("w"))
      .select(
        col("doc_id"),
        size(col("w")).cast("long").as("n_words"),
        expr(s"aggregate(transform(w, x -> size(split($applied, ' '))), 0L, (a, u) -> a + u)")
          .as("n_units"),
        expr("aggregate(transform(w, x -> length(x)), 0L, (a, u) -> a + CAST(u AS BIGINT))")
          .as("n_chars_tok"))
      .select(
        col("doc_id"),
        col("n_words"),
        col("n_units"),
        col("n_chars_tok"),
        Det.r6(col("n_units").cast("double") / col("n_chars_tok")).as("unit_ratio"))
      .orderBy(col("doc_id"))
  }

  /** Oracle retrains the merges via [[bpeCtes]] (same chain as q106's
    * oracle) and applies them with the same single-pass replaces; the
    * winners come through a one-row cross-joined CTE because DuckDB
    * lambdas capture columns, not subqueries. Each winner subquery is
    * coalesce-guarded (find → chr(1), a char tokenization strips; replace
    * → '') so a degenerate corpus whose round-k merge table is empty
    * applies a no-op replace — exactly what the Spark side's fold over
    * however-many trained merges does.
    */
  val q131Sql: String =
    s"""WITH $bpeCtes,
       |mm AS (
       |  SELECT coalesce((SELECT a || ' ' || b FROM t_1), chr(1)) AS f1, coalesce((SELECT a || b FROM t_1), '') AS r1,
       |         coalesce((SELECT a || ' ' || b FROM t_2), chr(1)) AS f2, coalesce((SELECT a || b FROM t_2), '') AS r2,
       |         coalesce((SELECT a || ' ' || b FROM t_3), chr(1)) AS f3, coalesce((SELECT a || b FROM t_3), '') AS r3),
       |d AS (SELECT doc_id, $sqlToks AS w FROM documents),
       |app AS (
       |  SELECT doc_id, len(w) AS n_words,
       |    list_sum(list_transform(w, x -> len(string_split(
       |      replace(replace(replace(array_to_string(string_split(x, ''), ' '), f1, r1), f2, r2), f3, r3),
       |      ' ')))) AS n_units,
       |    list_sum(list_transform(w, x -> length(x))) AS n_chars_tok
       |  FROM d CROSS JOIN mm)
       |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       |  CAST(n_units AS BIGINT) AS n_units,
       |  CAST(n_chars_tok AS BIGINT) AS n_chars_tok,
       |  ${Det.sqlR("CAST(n_units AS DOUBLE) / n_chars_tok", 6)} AS unit_ratio
       |FROM app ORDER BY doc_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q131_bpe_tokenize" -> (q131 _),
    "q106_bpe_merges" -> (q106 _),
    "q101_domain_stats" -> (q101 _),
    "q102_weighted_sample" -> (q102 _),
    "q103_random_projection" -> (q103 _),
    "q104_quantile_gate" -> (q104 _),
    "q105_minhash_estimate" -> (q105 _))

  val oracles: Map[String, String] = Map(
    "q131_bpe_tokenize" -> q131Sql,
    "q106_bpe_merges" -> q106Sql,
    "q101_domain_stats" -> q101Sql,
    "q102_weighted_sample" -> q102Sql,
    "q103_random_projection" -> q103Sql,
    "q104_quantile_gate" -> q104Sql,
    "q105_minhash_estimate" -> q105Sql)
}

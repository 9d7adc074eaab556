package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Det, Tables}
import graft.functions.Text

/** Corpus-preparation query registry — the cleaning/packaging stages of a
  * training-data pipeline that sit between raw documents and shards:
  * PII redaction, boilerplate removal, vocabulary building, n-gram language
  * model statistics, and mixture rebalancing across strata.
  *
  * Same discipline as [[TextQueries]]: codegen'd built-ins only, portable
  * md5-derived hashes, `Det` rounding at every float divergence point, and
  * a DuckDB oracle twin per query.
  */
object Corpus {

  type Q = (SparkSession, String) => DataFrame

  private val sqlToks = Text.sqlToks

  // -- q83: PII extraction + redaction ---------------------------------

  /** PII scrub. The fixtures carry no natural PII, so the query first
    * derives a deterministic "contact card" per customer (email present for
    * 2/3 of keys, phone for 1/2, IP always — giving every count column a
    * non-trivial distribution), then runs the actual operator: regex
    * entity counting + redaction to `<EMAIL>`/`<PHONE>`/`<IP>` placeholders.
    * At scale this is pure per-row codegen'd CPU — no shuffle at all until
    * the final presentation sort.
    */
  def q83(s: SparkSession, d: String): DataFrame = {
    val key = col("c_custkey")
    val note = concat(
      lit("contact "),
      lower(regexp_replace(col("c_name"), "#", "")),
      when(
        key % 3 =!= 0,
        concat(lit(" email "), lower(regexp_replace(col("c_name"), "#", ".")), lit("@example.com")))
        .otherwise(lit("")),
      when(
        key % 2 === 0,
        concat(lit(" phone 555-"), lpad((key % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")),
      lit(" ip 10."),
      (key % 256).cast("string"),
      lit("."),
      ((key / 256).cast("long") % 256).cast("string"),
      lit("."),
      (key % 250 + 1).cast("string"),
      lit(" end"))
    val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phoneRe = "\\b555-[0-9]{4}\\b"
    val ipRe = "\\b10\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
    Tables
      .customer(s, d)
      // stage the multi-referenced note through its own projection
      .select(col("c_custkey"), note.as("note"))
      .select(
        col("c_custkey"),
        regexp_count(col("note"), lit(emailRe)).cast("long").as("n_emails"),
        regexp_count(col("note"), lit(phoneRe)).cast("long").as("n_phones"),
        regexp_count(col("note"), lit(ipRe)).cast("long").as("n_ips"),
        regexp_replace(
          regexp_replace(regexp_replace(col("note"), emailRe, "<EMAIL>"), phoneRe, "<PHONE>"),
          ipRe,
          "<IP>").as("red"))
      .select(
        col("c_custkey"),
        col("n_emails"),
        col("n_phones"),
        col("n_ips"),
        md5(col("red")).as("redacted_hash"),
        length(col("red")).cast("long").as("redacted_len"))
      .orderBy(col("c_custkey"))
  }

  val q83Sql: String = {
    val email = """[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"""
    val phone = """\b555-[0-9]{4}\b"""
    val ip = """\b10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"""
    val red =
      s"""regexp_replace(regexp_replace(regexp_replace(note,
         |      '$email', '<EMAIL>', 'g'),
         |      '$phone', '<PHONE>', 'g'),
         |      '$ip', '<IP>', 'g')""".stripMargin
    s"""WITH note AS (
       |  SELECT c_custkey,
       |    'contact ' || lower(replace(c_name, '#', '')) ||
       |    (CASE WHEN c_custkey % 3 <> 0 THEN ' email ' || lower(replace(c_name, '#', '.')) || '@example.com' ELSE '' END) ||
       |    (CASE WHEN c_custkey % 2 = 0 THEN ' phone 555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') ELSE '' END) ||
       |    ' ip 10.' || CAST(c_custkey % 256 AS VARCHAR) || '.' || CAST((c_custkey // 256) % 256 AS VARCHAR) || '.' || CAST(c_custkey % 250 + 1 AS VARCHAR) ||
       |    ' end' AS note
       |  FROM customer)
       |SELECT c_custkey,
       |  CAST(len(regexp_extract_all(note, '$email')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(note, '$phone')) AS BIGINT) AS n_phones,
       |  CAST(len(regexp_extract_all(note, '$ip')) AS BIGINT) AS n_ips,
       |  md5($red) AS redacted_hash,
       |  CAST(length($red) AS BIGINT) AS redacted_len
       |FROM note ORDER BY c_custkey""".stripMargin
  }

  // -- q84: heavy hitters (exact top-k tokens) -------------------------

  /** Corpus-wide heavy hitters: top-20 tokens by frequency. Plans as a
    * map-side-combined hash aggregate on the token followed by
    * `TakeOrderedAndProject` — no global sort, no single-partition window.
    * The mergeable Misra–Gries sketch ([[graft.functions.Aggregators.MisraGries]])
    * is the bounded-state scale path when the vocabulary itself is too
    * large to aggregate exactly; its frequent-item guarantee is
    * property-tested against this exact query's semantics.
    */
  def q84(s: SparkSession, d: String): DataFrame =
    Tables
      .documents(s, d)
      .select(explode(Text.tokens(col("text"))).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(20)

  val q84Sql: String =
    s"""WITH tk AS (SELECT unnest($sqlToks) AS tok FROM documents)
       |SELECT tok, count(*) AS cnt FROM tk GROUP BY tok
       |ORDER BY cnt DESC, tok LIMIT 20""".stripMargin

  // -- q85: boilerplate window removal stats ---------------------------

  /** C4-style boilerplate detection: sliding 5-token windows; a window is
    * boilerplate when its exact text occurs in ≥2 distinct documents.
    * Output is the per-document cleaning report (window count, flagged
    * count, keep ratio). Shuffles 8-byte window hashes, never window text;
    * the document-frequency side aggregates distinct (hash, doc) pairs —
    * bounded state per key, no postings lists.
    */
  def q85(s: SparkSession, d: String): DataFrame = {
    val win = Tables
      .documents(s, d)
      .select(col("doc_id"), explode(Text.shingleHashes(col("text"), 5)).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfreq = win
      .distinct()
      .groupBy(col("h"))
      .agg(count(lit(1)).as("df"))
    // Bench/Verify clearCache() after each query releases the persist
    win
      .join(dfreq, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_windows"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_boiler"))
      .withColumn(
        "keep_ratio",
        Det.r6(lit(1.0) - col("n_boiler").cast("double") / col("n_windows")))
      .orderBy(col("doc_id"))
  }

  val q85Sql: String =
    s"""WITH d AS (SELECT doc_id, $sqlToks AS w FROM documents),
       |win AS (
       |  SELECT doc_id, ${Text.sqlHash60("w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]")} AS h
       |  FROM d, LATERAL (SELECT unnest(range(1, len(w)-3)) AS i) t),
       |dfreq AS (SELECT h, count(*) AS df FROM (SELECT DISTINCT doc_id, h FROM win) u GROUP BY h),
       |flag AS (SELECT win.doc_id, CASE WHEN df >= 2 THEN 1 ELSE 0 END AS boiler
       |         FROM win JOIN dfreq USING (h))
       |SELECT doc_id, count(*) AS n_windows, CAST(sum(boiler) AS BIGINT) AS n_boiler,
       |  ${Det.sqlR("1.0 - CAST(sum(boiler) AS DOUBLE)/count(*)", 6)} AS keep_ratio
       |FROM flag GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // -- q90: bigram language-model statistics ---------------------------

  /** Bigram LM table: corpus bigram counts with add-1-smoothed conditional
    * probability p(w2|w1) = (c12+1)/(c1+V), top-100 by count. The w1
    * marginal comes from a window over the already-aggregated bigram table
    * (vocab²-sized, not corpus-sized) and V arrives as a one-row broadcast
    * — the same corpus-stats shape as BM25 (q69).
    */
  def q90(s: SparkSession, d: String): DataFrame = {
    val bg = Tables
      .documents(s, d)
      .select(Text.tokens(col("text")).as("w"))
      .select(explode(Text.shingles(col("w"), 2)).as("g"))
      .select(
        element_at(split(col("g"), " "), 1).as("w1"),
        element_at(split(col("g"), " "), 2).as("w2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bc = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val v = bg
      .select(col("w1"))
      .union(bg.select(col("w2")))
      .agg(countDistinct(col("w1")).cast("double").as("v"))
    bc.withColumn("c1", sum(col("c12")).over(Window.partitionBy(col("w1"))))
      .crossJoin(broadcast(v))
      .select(
        col("w1"),
        col("w2"),
        col("c12"),
        col("c1"),
        Det.r6((col("c12") + lit(1.0)) / (col("c1") + col("v"))).as("p_smooth"))
      .orderBy(col("c12").desc, col("w1"), col("w2"))
      .limit(100)
  }

  val q90Sql: String =
    s"""WITH d AS (SELECT doc_id, $sqlToks AS w FROM documents),
       |bg AS (SELECT w[i] AS w1, w[i+1] AS w2 FROM d, LATERAL (SELECT unnest(range(1, len(w))) AS i) t),
       |bc AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
       |c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM bc GROUP BY w1),
       |v AS (SELECT CAST(count(DISTINCT w1) AS DOUBLE) AS v FROM (SELECT w1 FROM bg UNION ALL SELECT w2 FROM bg) u(w1))
       |SELECT bc.w1, bc.w2, bc.c12, c1.c1,
       |  ${Det.sqlR("(bc.c12 + 1.0) / (c1.c1 + v.v)", 6)} AS p_smooth
       |FROM bc JOIN c1 USING (w1) CROSS JOIN v
       |ORDER BY bc.c12 DESC, bc.w1, bc.w2 LIMIT 100""".stripMargin

  // -- q91: vocabulary build + OOV mapping -----------------------------

  /** Tokenizer-vocabulary pipeline: build a top-10 frequency vocabulary
    * (deterministic tie-break on the token), broadcast it, map every
    * token position to its vocab id (-1 for OOV), and report per-document
    * token counts, OOV rate, and a digest of the mapped id sequence —
    * the corpus→ids step of training-data tokenization. The id sequence is
    * reassembled order-correctly from an `array_sort` on (position, id)
    * pairs; per-doc state is bounded by document length, not corpus size.
    */
  def q91(s: SparkSession, d: String): DataFrame = {
    val tk = Tables
      .documents(s, d)
      .select(col("doc_id"), posexplode(Text.tokens(col("text"))).as(Seq("i", "tok")))
    val vocab = tk
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(10)
      // 10 rows: the global window is trivially single-partition by design
      .withColumn(
        "vid",
        (row_number().over(Window.orderBy(col("cnt").desc, col("tok"))) - 1).cast("long"))
      .select(col("tok"), col("vid"))
    tk.join(broadcast(vocab), Seq("tok"), "left")
      .select(col("doc_id"), col("i"), coalesce(col("vid"), lit(-1L)).as("vid"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tok"),
        sum(when(col("vid") === -1L, 1L).otherwise(0L)).as("n_oov"),
        md5(
          array_join(
            transform(
              array_sort(collect_list(struct(col("i"), col("vid")))),
              x => x.getField("vid").cast("string")),
            ",")).as("ids_hash"))
      .withColumn("oov_rate", Det.r6(col("n_oov").cast("double") / col("n_tok")))
      .select(col("doc_id"), col("n_tok"), col("n_oov"), col("oov_rate"), col("ids_hash"))
      .orderBy(col("doc_id"))
  }

  val q91Sql: String =
    s"""WITH tk AS (SELECT doc_id, i, w[i] AS tok
       |            FROM (SELECT doc_id, $sqlToks AS w FROM documents) d,
       |            LATERAL (SELECT unnest(range(1, len(w)+1)) AS i) t),
       |vocab AS (SELECT tok, CAST(row_number() OVER (ORDER BY count(*) DESC, tok) - 1 AS BIGINT) AS vid
       |          FROM tk GROUP BY tok ORDER BY count(*) DESC, tok LIMIT 10),
       |mapped AS (SELECT tk.doc_id, tk.i, coalesce(v.vid, -1) AS vid FROM tk LEFT JOIN vocab v USING (tok))
       |SELECT doc_id, count(*) AS n_tok,
       |  CAST(sum(CASE WHEN vid = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       |  ${Det.sqlR("CAST(sum(CASE WHEN vid = -1 THEN 1 ELSE 0 END) AS DOUBLE)/count(*)", 6)} AS oov_rate,
       |  md5(list_aggregate(list_transform(list(vid ORDER BY i), x -> CAST(x AS VARCHAR)), 'string_agg', ',')) AS ids_hash
       |FROM mapped GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // -- q92: mixture rebalancing across strata --------------------------

  /** Training-mixture rebalancing: flatten an over-represented stratum by
    * keeping each language with probability sqrt(n_min/n_lang) — a
    * temperature-style down-weighting of large strata. `sqrt` (unlike
    * `pow`) is IEEE-754 correctly-rounded, so both engines derive the
    * bit-identical keep fraction; the per-doc gate is the q62 md5 uniform.
    * Stratum stats are 5 rows — broadcast; the corpus is filtered in one
    * shuffle-free map pass.
    */
  def q92(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val n = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val mn = n.agg(min(col("n_docs")).cast("double").as("n_min"))
    val fr = n
      .crossJoin(broadcast(mn))
      .withColumn("keep_frac", sqrt(col("n_min") / col("n_docs")))
      .select(col("lang"), col("n_docs"), col("keep_frac"))
    val u = (Text.hash60(col("doc_id").cast("string")) % lit(1073741824L)).cast("double") / 1073741824.0
    val kept = docs
      .join(broadcast(fr), Seq("lang"))
      .filter(u < col("keep_frac"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"))
    fr.join(broadcast(kept), Seq("lang"), "left")
      .select(
        col("lang"),
        col("n_docs"),
        Det.r6(col("keep_frac")).as("keep_frac"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy(col("lang"))
  }

  val q92Sql: String = {
    val u = s"(${Text.sqlHash60("CAST(doc_id AS VARCHAR)")} % 1073741824) / 1073741824.0"
    s"""WITH n AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
       |mn AS (SELECT CAST(min(n_docs) AS DOUBLE) AS n_min FROM n),
       |fr AS (SELECT lang, n_docs, sqrt(mn.n_min / n_docs) AS keep_frac FROM n CROSS JOIN mn),
       |kept AS (SELECT d.lang, count(*) AS n_kept
       |         FROM documents d JOIN fr USING (lang)
       |         WHERE ($u) < fr.keep_frac
       |         GROUP BY d.lang)
       |SELECT fr.lang, fr.n_docs, ${Det.sqlR("fr.keep_frac", 6)} AS keep_frac,
       |  coalesce(k.n_kept, 0) AS n_kept
       |FROM fr LEFT JOIN kept k USING (lang) ORDER BY fr.lang""".stripMargin
  }

  // -- q94: TextRank keyword extraction (damped PageRank) --------------

  /** TextRank: damped PageRank (d = 0.85, 3 iterations) over the
    * symmetrized token co-occurrence graph, weighted by adjacency counts —
    * corpus-level keyword extraction. Each iteration is the canonical
    * distributed PageRank step: join the rank vector to the edge list on
    * src (hash shuffle), aggregate contributions on dst — two shuffles per
    * iteration regardless of graph size, no driver-side adjacency. The
    * rank is Det-snapped each iteration, so both engines carry bit-identical
    * vectors into the next step and the fixed 3-step unroll is
    * hash-checkable (the q49 technique). The node count is a dimension-
    * sized driver count, as in q56.
    */
  def q94(s: SparkSession, d: String): DataFrame = {
    val e0 = Tables
      .documents(s, d)
      .select(Text.tokens(col("text")).as("w"))
      .select(explode(Text.shingles(col("w"), 2)).as("g"))
      .select(
        element_at(split(col("g"), " "), 1).as("w1"),
        element_at(split(col("g"), " "), 2).as("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c"))
    val edges = e0
      .select(col("w1").as("src"), col("w2").as("dst"), col("c"))
      .union(e0.select(col("w2").as("src"), col("w1").as("dst"), col("c")))
      .groupBy(col("src"), col("dst"))
      .agg(sum(col("c")).cast("double").as("wt"))
    val outw = edges.groupBy(col("src")).agg(sum(col("wt")).as("ow"))
    // per-edge transition probability, computed once, reused every iteration
    val trans = edges
      .join(outw, Seq("src"))
      .select(col("src"), col("dst"), (col("wt") / col("ow")).as("p"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = trans.select(col("src").as("tok")).distinct()
    val n = nodes.count() // dimension-sized count, driver-side by design
    var r = nodes.withColumn("r", lit(1.0 / n))
    for (_ <- 1 to 3) {
      r = trans
        .join(r, trans("src") === r("tok"))
        .groupBy(col("dst"))
        .agg(sum(col("p") * col("r")).as("s"))
        .select(col("dst").as("tok"), Det.r6(lit(0.15 / n) + lit(0.85) * col("s")).as("r"))
    }
    r.select(col("tok"), col("r").as("rank"))
      .orderBy(col("rank").desc, col("tok"))
      .limit(20)
  }

  val q94Sql: String = {
    def step(prev: String, next: String): String =
      s"""$next AS (SELECT s.tok, ${Det.sqlR("0.15/n.n + 0.85*s.s", 6)} AS r
         |  FROM (SELECT e.dst AS tok, sum($prev.r * (e.wt / o.ow)) AS s
         |        FROM edges e JOIN $prev ON $prev.tok = e.src JOIN outw o ON o.src = e.src
         |        GROUP BY e.dst) s CROSS JOIN n)""".stripMargin
    s"""WITH d AS (SELECT doc_id, $sqlToks AS w FROM documents),
       |bg AS (SELECT w[i] AS w1, w[i+1] AS w2 FROM d, LATERAL (SELECT unnest(range(1, len(w))) AS i) t),
       |e0 AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY w1, w2),
       |edges AS (
       |  SELECT src, dst, CAST(sum(c) AS DOUBLE) AS wt FROM (
       |    SELECT w1 AS src, w2 AS dst, c FROM e0 UNION ALL SELECT w2 AS src, w1 AS dst, c FROM e0) u
       |  GROUP BY src, dst),
       |outw AS (SELECT src, sum(wt) AS ow FROM edges GROUP BY src),
       |nodes AS (SELECT src AS tok FROM edges GROUP BY src),
       |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
       |p0 AS (SELECT tok, 1.0/n.n AS r FROM nodes CROSS JOIN n),
       |${step("p0", "p1")},
       |${step("p1", "p2")},
       |${step("p2", "p3")}
       |SELECT tok, r AS rank FROM p3 ORDER BY rank DESC, tok LIMIT 20""".stripMargin
  }

  // -- q96: LM-based quality filtering (pseudo-perplexity) -------------

  /** CCNet-style model-based filtering: score every document by its
    * average bigram log-probability under the corpus LM (q90's model) and
    * report pseudo-perplexity — the filter that ranks documents by how
    * "language-like" they are. The model tables are vocab²-sized; the only
    * corpus-sized shuffle is the doc-bigram join against them on (w1, w2).
    * `ln`/`exp` are within-1-ulp libm on both engines; sums of ~doc-length
    * terms land well inside the Det.r6 snap (the q56 precedent).
    */
  def q96(s: SparkSession, d: String): DataFrame = {
    val bgd = Tables
      .documents(s, d)
      .select(col("doc_id"), Text.tokens(col("text")).as("w"))
      .select(col("doc_id"), explode(Text.shingles(col("w"), 2)).as("g"))
      .select(
        col("doc_id"),
        element_at(split(col("g"), " "), 1).as("w1"),
        element_at(split(col("g"), " "), 2).as("w2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bc = bgd.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val v = bgd
      .select(col("w1"))
      .union(bgd.select(col("w2")))
      .agg(countDistinct(col("w1")).cast("double").as("v"))
    // score the MODEL first (vocab²-sized: marginal via window, V via
    // broadcast), so the corpus-sized bigram stream pays exactly one
    // join — not separate shuffles for c12, c1, and V
    val model = bc
      .withColumn("c1", sum(col("c12")).over(Window.partitionBy(col("w1"))))
      .crossJoin(broadcast(v))
      .select(col("w1"), col("w2"), log((col("c12") + lit(1.0)) / (col("c1") + col("v"))).as("lp"))
    val avg = Det.r6(sum(col("lp")) / count(lit(1)))
    bgd
      .join(model, Seq("w1", "w2"))
      .select(col("doc_id"), col("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), avg.as("avg_logp"), Det.r4(exp(-avg)).as("ppl"))
      .orderBy(col("doc_id"))
  }

  val q96Sql: String = {
    val avg = Det.sqlR("sum(lp)/count(*)", 6)
    s"""WITH d AS (SELECT doc_id, $sqlToks AS w FROM documents),
       |bgd AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2 FROM d, LATERAL (SELECT unnest(range(1, len(w))) AS i) t),
       |bc AS (SELECT w1, w2, count(*) AS c12 FROM bgd GROUP BY w1, w2),
       |c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM bc GROUP BY w1),
       |v AS (SELECT CAST(count(DISTINCT w1) AS DOUBLE) AS v FROM (SELECT w1 FROM bgd UNION ALL SELECT w2 FROM bgd) u(w1)),
       |sc AS (SELECT bgd.doc_id, ln((bc.c12 + 1.0) / (c1.c1 + v.v)) AS lp
       |       FROM bgd JOIN bc USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v)
       |SELECT doc_id, count(*) AS n_bigrams,
       |  $avg AS avg_logp,
       |  ${Det.sqlR(s"exp(-($avg))", 4)} AS ppl
       |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // -- q97: n-gram test-set decontamination ----------------------------

  /** Benchmark decontamination at the n-gram level: flag (candidate,
    * benchmark) pairs sharing any distinct 4-gram — the eval-leakage sweep
    * run before training. Unlike q58's whole-text digests, this catches
    * partial containment. Shuffle keys are 8-byte shingle hashes; the
    * benchmark side of the join is the (tiny) eval set, broadcastable at
    * any corpus scale.
    */
  def q97(s: SparkSession, d: String): DataFrame = {
    val sh = Tables
      .documents(s, d)
      .select(col("doc_id"), explode(Text.shingleHashes(col("text"), 4)).as("h"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bench = sh.filter(col("doc_id") % 13 === 0).select(col("doc_id").as("bench_id"), col("h"))
    val cand = sh.filter(col("doc_id") % 13 =!= 0)
    cand
      .join(broadcast(bench), Seq("h"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy(col("doc_id"), col("bench_id"))
  }

  val q97Sql: String =
    s"""WITH d AS (SELECT doc_id, $sqlToks AS w FROM documents),
       |sh AS (SELECT DISTINCT doc_id, ${Text.sqlHash60("w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]")} AS h
       |       FROM d, LATERAL (SELECT unnest(range(1, len(w)-2)) AS i) t),
       |bench AS (SELECT doc_id AS bench_id, h FROM sh WHERE doc_id % 13 = 0),
       |cand AS (SELECT doc_id, h FROM sh WHERE doc_id % 13 <> 0)
       |SELECT c.doc_id, b.bench_id, count(*) AS n_shared
       |FROM cand c JOIN bench b USING (h)
       |GROUP BY c.doc_id, b.bench_id
       |ORDER BY doc_id, bench_id""".stripMargin

  // -- q99: the full training-data pipeline, end to end ----------------

  /** Capstone composition — the whole corpus-prep pipeline as ONE lazy
    * DataFrame program, every stage an operator verified standalone
    * elsewhere: exact dedup (q23) → near-dup drop (q24 greedy keep-lowest)
    * → quality gate (q29's score ≥ 0.5) → benchmark decontamination
    * (q97's 4-grams vs the doc_id%13 slice) → token-budget packing (q81's
    * two-level distributed prefix sum, capacity 512). Catalyst sees one
    * plan, so stages fuse where possible and nothing materializes between
    * them; the oracle chains the same stages as CTEs.
    */
  def q99(s: SparkSession, d: String): DataFrame = {
    import graft.llm.Dedup
    val docs = Tables.documents(s, d)
    // 1: exact dedup — keep the smallest doc_id per text digest.
    // d0 feeds both the near-dup self-join and the survivor stream —
    // persist instead of recomputing the digest join per branch
    val d0 = docs
      .join(Dedup.exact(docs, "doc_id", "text").select(col("keep_id").as("doc_id")), Seq("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // 2: near-dup drop — greedy keep-lowest over jaccard ≥ 0.2 pairs
    val nd = Dedup
      .jaccardPairs(d0, "doc_id", "text", 3, 0.2)
      .select(col("b_id").as("doc_id"))
      .distinct()
    val d1 = d0.join(nd, Seq("doc_id"), "left_anti")
    // 3: quality gate — q29's formula, keep ≥ 0.5
    val d2 = d1
      .select(col("doc_id"), col("source"), col("text"), col("n_chars"), Text.tokens(col("text")).as("toks"))
      .select(
        col("doc_id"),
        col("source"),
        col("text"),
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
      .filter(col("quality") >= 0.5)
      // d2 feeds the contamination shingle scan AND the survivor stream
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // 4: decontamination — drop candidates sharing any 4-gram with the bench slice
    def grams4(df: DataFrame): DataFrame = df
      .select(col("doc_id"), explode(Text.shingleHashes(col("text"), 4)).as("h"))
      .distinct()
    val benchH = grams4(docs.filter(col("doc_id") % 13 === 0)).select(col("h")).distinct()
    val contaminated = grams4(d2)
      .join(broadcast(benchH), Seq("h"))
      .select(col("doc_id"))
      .distinct()
    val d3 = d2
      .filter(col("doc_id") % 13 =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti")
    // 5: token-budget packing per source stratum
    graft.operators.Packing
      .tokenBudgetPack(
        d3.select(col("doc_id"), col("source"), col("n_tok")),
        "doc_id",
        "source",
        "n_tok",
        capacity = 512L,
        blockSize = 64L)
      .select(col("doc_id"), col("source"), col("n_tok"), col("pack_id"))
      .orderBy(col("doc_id"))
  }

  val q99Sql: String = {
    val stops = Text.stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH d0 AS (
       |  SELECT d.* FROM documents d
       |  JOIN (SELECT md5(text) AS h, min(doc_id) AS keep_id FROM documents GROUP BY 1) k
       |    ON md5(d.text) = k.h AND d.doc_id = k.keep_id),
       |sh AS (
       |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
       |  FROM (SELECT doc_id, $sqlToks AS w FROM d0) dd,
       |  LATERAL (SELECT unnest(range(1, len(w)-1)) AS i) t),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |neardup AS (
       |  SELECT b_id FROM (
       |    SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
       |    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2) p
       |  JOIN sizes sa ON sa.doc_id = a_id JOIN sizes sb ON sb.doc_id = b_id
       |  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.2),
       |d1 AS (SELECT * FROM d0 WHERE doc_id NOT IN (SELECT b_id FROM neardup)),
       |qual AS (
       |  SELECT doc_id, n_tok, quality FROM (
       |    SELECT doc_id,
       |      CAST(len($sqlToks) AS BIGINT) AS n_tok,
       |      ${Det.sqlR(
        s"least(CAST(len($sqlToks) AS DOUBLE)/100.0, 1.0)*0.5" +
          s" + (CASE WHEN len($sqlToks) > 0 THEN CAST(len(list_filter($sqlToks, x -> x IN ($stops))) AS DOUBLE)/len($sqlToks) ELSE 0.0 END)*0.3" +
          s" + (CASE WHEN (CASE WHEN len($sqlToks) > 0 THEN CAST(n_chars AS DOUBLE)/len($sqlToks) ELSE 0.0 END) BETWEEN 3.0 AND 8.0 THEN 0.2 ELSE 0.0 END)",
        4)} AS quality
       |    FROM d1) s WHERE quality >= 0.5),
       |d2 AS (SELECT d1.*, qual.n_tok FROM d1 JOIN qual USING (doc_id)),
       |g4 AS (
       |  SELECT DISTINCT doc_id, ${Text.sqlHash60("w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]")} AS h
       |  FROM (SELECT doc_id, $sqlToks AS w FROM d2) dd, LATERAL (SELECT unnest(range(1, len(w)-2)) AS i) t),
       |bh AS (
       |  SELECT DISTINCT ${Text.sqlHash60("w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]")} AS h
       |  FROM (SELECT doc_id, $sqlToks AS w FROM documents WHERE doc_id % 13 = 0) dd,
       |  LATERAL (SELECT unnest(range(1, len(w)-2)) AS i) t),
       |contaminated AS (SELECT DISTINCT g4.doc_id FROM g4 JOIN bh USING (h)),
       |d3 AS (SELECT * FROM d2 WHERE doc_id % 13 <> 0
       |       AND doc_id NOT IN (SELECT doc_id FROM contaminated))
       |SELECT doc_id, source, n_tok,
       |  CAST(floor((sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
       |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok) / 512.0) AS BIGINT) AS pack_id
       |FROM d3 ORDER BY doc_id""".stripMargin
  }

  // -- q100: overlapping token-window chunking (RAG prep) --------------

  /** Retrieval-corpus chunking: overlapping 64-token windows at stride 48
    * (16-token overlap keeps context across boundaries), each chunk with
    * its position and text digest — the doc→chunk step of RAG/embedding
    * corpus builds. Pure per-row array expansion in codegen (transform +
    * slice + explode): zero shuffles before the presentation sort. A
    * trailing window opens only when more than the overlap (16 tokens)
    * remains, so no chunk is a near-empty sliver of its predecessor.
    */
  def q100(s: SparkSession, d: String): DataFrame = {
    val width = 64
    val stride = 48
    val overlap = width - stride
    Tables
      .documents(s, d)
      .select(col("doc_id"), Text.tokens(col("text")).as("w"))
      .select(
        col("doc_id"),
        explode(
          transform(
            sequence(
              lit(0),
              ceil(greatest(size(col("w")) - overlap, lit(1)) / lit(stride.toDouble)).cast("int") - 1),
            i =>
              struct(
                i.cast("long").as("chunk_idx"),
                (i * stride).cast("long").as("start_tok"),
                slice(col("w"), i * stride + 1, lit(width)).as("cw")))).as("c"))
      .select(
        col("doc_id"),
        col("c.chunk_idx").as("chunk_idx"),
        col("c.start_tok").as("start_tok"),
        size(col("c.cw")).cast("long").as("n_tok_chunk"),
        md5(concat_ws(" ", col("c.cw"))).as("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  val q100Sql: String =
    s"""WITH d AS (SELECT doc_id, $sqlToks AS w FROM documents),
       |ch AS (
       |  SELECT doc_id, i AS chunk_idx, CAST(i * 48 AS BIGINT) AS start_tok,
       |    w[CAST(i*48+1 AS INT):CAST(i*48+64 AS INT)] AS cw
       |  FROM d, LATERAL (SELECT unnest(range(0, CAST(ceil(greatest(len(w) - 16, 1) / 48.0) AS BIGINT))) AS i) t)
       |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, start_tok,
       |  CAST(len(cw) AS BIGINT) AS n_tok_chunk,
       |  md5(list_aggregate(cw, 'string_agg', ' ')) AS chunk_hash
       |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin

  // -- q114: corpus-wide repeated n-gram mining -------------------------

  /** Repeated 6-gram mining: every 6-token window hashed (fused native
    * shingle-hash pass), aggregated corpus-wide, kept where the window
    * recurs across ≥ 2 documents — the exact-substring-dedup primitive
    * (Lee et al. 2022): the surviving hashes ARE the boilerplate/template
    * spans a dedup pass would cut. Distinct-doc counting is the two-phase
    * (hash, doc_id) pre-dedup Spark plans for count(DISTINCT) — per-hash
    * state is a count, never a doc list; the top-100 is a
    * TakeOrderedAndProject, no global sort of the hash space.
    */
  def q114(s: SparkSession, d: String): DataFrame =
    Tables
      .documents(s, d)
      .select(col("doc_id"), explode(Text.shingleHashes(col("text"), 6)).as("ngram_hash"))
      .groupBy(col("ngram_hash"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"),
        min(col("doc_id")).as("example_doc"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("n_occ").desc, col("ngram_hash"))
      .limit(100)

  val q114Sql: String =
    s"""WITH d AS (SELECT doc_id, $sqlToks AS w FROM documents),
       |sh AS (
       |  SELECT doc_id,
       |    ${Text.sqlHash60(
        "w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] || ' ' || w[i+5]")} AS ngram_hash
       |  FROM d, LATERAL (SELECT unnest(range(1, len(w) - 4)) AS i) t)
       |SELECT ngram_hash, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |  count(*) AS n_occ, min(doc_id) AS example_doc
       |FROM sh GROUP BY ngram_hash HAVING count(DISTINCT doc_id) >= 2
       |ORDER BY n_docs DESC, n_occ DESC, ngram_hash LIMIT 100""".stripMargin

  // -- q118: two-sample KS drift between sources ------------------------

  /** Distribution drift between corpus sources: the two-sample
    * Kolmogorov–Smirnov statistic D = sup|F_a − F_b| over the n_chars
    * (document length) distribution, for every source pair — the
    * "did this crawl slice shift?" gate a training-mix pipeline runs per
    * ingest. Computed on the value GRID (source pairs × distinct metric
    * values, both dimension-sized — for a continuous metric you'd bin
    * first): per-value counts, window cumsum → empirical CDFs, max gap.
    * CDF numerators are exact integers; only the final ratio/max is
    * float, r6-snapped.
    */
  def q118(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val vc = docs.groupBy(col("source"), col("n_chars").as("v")).agg(count(lit(1)).as("cnt"))
    val totals = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val pairs = totals
      .select(col("source").as("src_a"), col("n").as("n_a"))
      .join(totals.select(col("source").as("src_b"), col("n").as("n_b")), col("src_a") < col("src_b"))
    val vals = docs.select(col("n_chars").as("v")).distinct()
    val w = Window.partitionBy(col("src_a"), col("src_b")).orderBy(col("v"))
    val grid = pairs
      .crossJoin(vals)
      .join(
        vc.select(col("source").as("src_a"), col("v"), col("cnt").as("ca")),
        Seq("src_a", "v"),
        "left")
      .join(
        vc.select(col("source").as("src_b"), col("v"), col("cnt").as("cb")),
        Seq("src_b", "v"),
        "left")
      .withColumn("fa", sum(coalesce(col("ca"), lit(0L))).over(w).cast("double") / col("n_a"))
      .withColumn("fb", sum(coalesce(col("cb"), lit(0L))).over(w).cast("double") / col("n_b"))
    grid
      .groupBy(col("src_a"), col("src_b"), col("n_a"), col("n_b"))
      .agg(Det.r6(max(abs(col("fa") - col("fb")))).as("d_stat"))
      .orderBy(col("src_a"), col("src_b"))
  }

  val q118Sql: String =
    s"""WITH vc AS (SELECT source, n_chars AS v, count(*) AS cnt FROM documents GROUP BY source, v),
       |totals AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
       |pairs AS (
       |  SELECT a.source AS src_a, a.n AS n_a, b.source AS src_b, b.n AS n_b
       |  FROM totals a JOIN totals b ON a.source < b.source),
       |vals AS (SELECT DISTINCT n_chars AS v FROM documents),
       |grid AS (
       |  SELECT p.src_a, p.src_b, p.n_a, p.n_b, vals.v,
       |    coalesce(ca.cnt, 0) AS ca, coalesce(cb.cnt, 0) AS cb
       |  FROM pairs p CROSS JOIN vals
       |  LEFT JOIN vc ca ON ca.source = p.src_a AND ca.v = vals.v
       |  LEFT JOIN vc cb ON cb.source = p.src_b AND cb.v = vals.v),
       |cdf AS (
       |  SELECT src_a, src_b, n_a, n_b,
       |    CAST(sum(ca) OVER w AS DOUBLE) / n_a AS fa,
       |    CAST(sum(cb) OVER w AS DOUBLE) / n_b AS fb
       |  FROM grid WINDOW w AS (PARTITION BY src_a, src_b ORDER BY v
       |                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT src_a, src_b, n_a, n_b, ${Det.sqlR("max(abs(fa - fb))", 6)} AS d_stat
       |FROM cdf GROUP BY src_a, src_b, n_a, n_b ORDER BY src_a, src_b""".stripMargin

  // -- q119: unigram entropy per source ----------------------------------

  /** Token-distribution entropy per source (unigram Shannon entropy in
    * bits) plus type/token counts — the lexical-diversity readout of a
    * training mix (low entropy = templated/boilerplate-heavy source).
    * Vocabulary-sharded: one (source, token) hash agg, then one
    * source-level agg; p·log₂p terms are each within 1 ulp on both
    * engines and the sum is r6-snapped.
    */
  def q119(s: SparkSession, d: String): DataFrame = {
    val tc = Tables
      .documents(s, d)
      .select(col("source"), explode(Text.tokens(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("source"))
    tc.withColumn("n", sum(col("c")).over(w))
      .withColumn("p", col("c").cast("double") / col("n"))
      .groupBy(col("source"))
      .agg(
        max(col("n")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        Det.r6(-sum(col("p") * log2(col("p")))).as("entropy_bits"))
      .orderBy(col("source"))
  }

  val q119Sql: String =
    s"""WITH tc AS (
       |  SELECT source, tok, count(*) AS c
       |  FROM (SELECT source, unnest($sqlToks) AS tok FROM documents) u
       |  GROUP BY source, tok),
       |pt AS (
       |  SELECT source, c, sum(c) OVER (PARTITION BY source) AS n FROM tc)
       |SELECT source, CAST(max(n) AS BIGINT) AS n_tokens, count(*) AS n_types,
       |  ${Det.sqlR("-sum((CAST(c AS DOUBLE) / n) * log2(CAST(c AS DOUBLE) / n))", 6)} AS entropy_bits
       |FROM pt GROUP BY source ORDER BY source""".stripMargin

  // -- q124: hashed-feature linear quality classifier ------------------

  /** Fasttext-shaped quality scoring: hash each token into one of 4096
    * feature buckets, look up a fixed linear-model weight (derived from
    * the bucket by a Knuth multiplicative hash — a stand-in for trained
    * weights, which would broadcast identically), average, sigmoid. The
    * accumulation runs in the INTEGER domain per row (exact, order-free),
    * so only the final sigmoid touches floats; the classification label
    * branches on the integer sum (`s >= 0`), never on a rounded double.
    * Scale: weights are a 4096-entry broadcast regardless of corpus size;
    * scoring is row-local (one narrow pass, no shuffle before the sort).
    */
  def q124(s: SparkSession, d: String): DataFrame =
    Tables
      .documents(s, d)
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tok"),
        expr(
          "aggregate(toks, 0L, (acc, t) -> acc + " +
            "((graft_hash60(t) % 4096L) * 2654435761L) % 1048576L - 524288L)")
          .as("s_int"))
      .select(
        col("doc_id"),
        col("n_tok"),
        Det.r6(
          when(col("n_tok") > 0, lit(1.0) / (lit(1.0) + exp(-(col("s_int").cast("double") / (col("n_tok") * lit(524288.0))))))
            .otherwise(lit(0.5))).as("quality_score"),
        (col("s_int") >= 0).cast("long").as("keep"))
      .orderBy(col("doc_id"))

  val q124Sql: String =
    s"""WITH d AS (SELECT doc_id, $sqlToks AS w FROM documents),
       |sc AS (
       |  SELECT doc_id, len(w) AS n_tok,
       |    coalesce(list_sum(list_transform(w, t ->
       |      ((CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) % 4096) * 2654435761) % 1048576 - 524288)), 0) AS s_int
       |  FROM d)
       |SELECT doc_id, n_tok,
       |  ${Det.sqlR("CASE WHEN n_tok > 0 THEN 1.0 / (1.0 + exp(-(CAST(s_int AS DOUBLE) / (n_tok * 524288.0)))) ELSE 0.5 END", 6)} AS quality_score,
       |  CAST(CASE WHEN s_int >= 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM sc ORDER BY doc_id""".stripMargin

  // -- q125: span-level exact dedup (ExactSubstr, windowed) ------------

  /** Span-level exact dedup: chop each doc into consecutive 20-token
    * windows, hash each window, keep only the globally-first occurrence
    * (smallest (doc_id, pos)) of every distinct span — the practical
    * window form of Lee et al.'s ExactSubstr dedup. The global winner per
    * span hash is one hash-aggregate on the 8-byte span hash (min over
    * the encoded (doc_id, pos) key — integer, exact); per-doc retention
    * stats follow with a second small aggregate. Nothing is all-pairs and
    * text bodies never shuffle — only (hash, encoded-position) pairs.
    */
  def q125(s: SparkSession, d: String): DataFrame = {
    val spans = Tables
      .documents(s, d)
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(
        col("doc_id"),
        posexplode(
          expr("transform(sequence(0, CAST(ceil(size(toks) / 20.0) AS INT) - 1), " +
            "i -> graft_hash60(concat_ws(' ', slice(toks, i * 20 + 1, 20))))"))
          .as(Seq("pos", "h")))
    // 2^20 spans/doc headroom (a 20M-token document) before the encoded
    // (doc_id, pos) key could collide; doc_id keeps 2^43 of room above it
    val enc = col("doc_id") * lit(1048576L) + col("pos")
    val winners = spans
      .groupBy(col("h"))
      .agg(min(enc).as("first_key"))
    spans
      .join(winners, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_spans"),
        sum((enc === col("first_key")).cast("long")).as("n_kept"))
      .select(
        col("doc_id"),
        col("n_spans"),
        col("n_kept"),
        Det.r6(col("n_kept").cast("double") / col("n_spans")).as("kept_ratio"))
      .orderBy(col("doc_id"))
  }

  val q125Sql: String =
    s"""WITH d AS (SELECT doc_id, $sqlToks AS w FROM documents WHERE len($sqlToks) > 0),
       |sp AS (
       |  SELECT doc_id, i AS pos,
       |    CAST(('0x' || substr(md5(array_to_string(list_slice(w, i * 20 + 1, i * 20 + 20), ' ')), 1, 15)) AS BIGINT) AS h
       |  FROM d, LATERAL (SELECT unnest(range(0, CAST(ceil(len(w) / 20.0) AS INT))) AS i) t),
       |win AS (SELECT h, min(doc_id * 1048576 + pos) AS first_key FROM sp GROUP BY h)
       |SELECT sp.doc_id, count(*) AS n_spans,
       |  CAST(sum(CASE WHEN sp.doc_id * 1048576 + sp.pos = w.first_key THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  ${Det.sqlR("CAST(sum(CASE WHEN sp.doc_id * 1048576 + sp.pos = w.first_key THEN 1 ELSE 0 END) AS DOUBLE) / count(*)", 6)} AS kept_ratio
       |FROM sp JOIN win w USING (h)
       |GROUP BY sp.doc_id ORDER BY doc_id""".stripMargin

  // -- q126: training-shard manifest -----------------------------------

  /** Deterministic shard assignment + manifest for a training-data export:
    * every doc hashes to one of 64 shards; the manifest reports per-shard
    * doc/token/byte totals and an order-independent content digest (sum of
    * bounded per-doc hashes — integers, so partial aggregation order can't
    * change it). This is the write-path bookkeeping of a 100 TB corpus
    * export: one map-side-combined aggregate over 64 keys, then the writer
    * would `partitionBy(shard)` with the same expression.
    */
  def q126(s: SparkSession, d: String): DataFrame =
    Tables
      .documents(s, d)
      .select(
        pmod(Text.hash60(col("doc_id").cast("string")), lit(64)).as("shard"),
        col("doc_id"),
        col("n_chars"),
        size(Text.tokens(col("text"))).cast("long").as("n_tok"),
        pmod(Text.hash60(col("text")), lit(1048576)).as("dh"))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("n_chars")).as("n_bytes"),
        sum(col("dh")).as("content_digest"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(col("shard"))

  val q126Sql: String =
    s"""WITH d AS (
       |  SELECT ${Text.sqlHash60("CAST(doc_id AS VARCHAR)")} % 64 AS shard, doc_id, n_chars,
       |    len($sqlToks) AS n_tok,
       |    ${Text.sqlHash60("text")} % 1048576 AS dh
       |  FROM documents)
       |SELECT shard, count(*) AS n_docs,
       |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       |  CAST(sum(n_chars) AS BIGINT) AS n_bytes,
       |  CAST(sum(dh) AS BIGINT) AS content_digest,
       |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
       |FROM d GROUP BY shard ORDER BY shard""".stripMargin

  val queries: Map[String, Q] = Map(
    "q124_quality_classifier" -> (q124 _),
    "q125_span_dedup" -> (q125 _),
    "q126_shard_manifest" -> (q126 _),
    "q114_repeated_ngrams" -> (q114 _),
    "q118_ks_drift" -> (q118 _),
    "q119_token_entropy" -> (q119 _),
    "q100_token_chunks" -> (q100 _),
    "q99_pipeline_end_to_end" -> (q99 _),
    "q96_lm_perplexity_filter" -> (q96 _),
    "q97_ngram_decontamination" -> (q97 _),
    "q94_textrank" -> (q94 _),
    "q83_pii_scrub" -> (q83 _),
    "q84_heavy_hitters" -> (q84 _),
    "q85_boilerplate_windows" -> (q85 _),
    "q90_bigram_lm" -> (q90 _),
    "q91_vocab_oov" -> (q91 _),
    "q92_mixture_resample" -> (q92 _))

  val oracles: Map[String, String] = Map(
    "q124_quality_classifier" -> q124Sql,
    "q125_span_dedup" -> q125Sql,
    "q126_shard_manifest" -> q126Sql,
    "q114_repeated_ngrams" -> q114Sql,
    "q118_ks_drift" -> q118Sql,
    "q119_token_entropy" -> q119Sql,
    "q100_token_chunks" -> q100Sql,
    "q99_pipeline_end_to_end" -> q99Sql,
    "q96_lm_perplexity_filter" -> q96Sql,
    "q97_ngram_decontamination" -> q97Sql,
    "q94_textrank" -> q94Sql,
    "q83_pii_scrub" -> q83Sql,
    "q84_heavy_hitters" -> q84Sql,
    "q85_boilerplate_windows" -> q85Sql,
    "q90_bigram_lm" -> q90Sql,
    "q91_vocab_oov" -> q91Sql,
    "q92_mixture_resample" -> q92Sql)
}

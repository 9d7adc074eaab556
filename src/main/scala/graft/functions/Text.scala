package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-pipeline surface (tokenize,
  * shingles, portable hashing, minhash, simhash, language-ID, quality).
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * (no Scala UDFs in the hot path), and every hash is *portable*: derived
  * from MD5 hex so the DuckDB oracle can reproduce it bit-for-bit. A
  * xxhash64-based variant would be faster but unverifiable cross-engine;
  * at 100 TB the md5 cost is still per-row CPU, embarrassingly parallel,
  * and dwarfed by shuffle cost in these operators.
  */
object Text {

  /** Lowercased whitespace tokens with empties dropped. SQL twin:
    * `list_filter(string_split(lower(text),' '), x -> x <> '')`.
    */
  def tokens(c: Column): Column =
    filter(split(lower(c), " "), t => t =!= "")

  /** Word n-gram shingles of a token array: array of space-joined n-grams.
    * Built with transform over index range — stays inside codegen. Guarded:
    * `sequence(0, size-n)` would count *down* for short docs, so those
    * yield an empty array instead.
    */
  def shingles(toks: Column, n: Int): Column =
    when(
      size(toks) >= n,
      transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
      .otherwise(typedLit(Seq.empty[String]))

  /** Portable 60-bit hash: first 15 hex chars of md5 as a bigint.
    * DuckDB twin: `CAST(('0x' || substr(md5(s),1,15)) AS BIGINT)`.
    * Computed by the fused native expression
    * ([[graft.plans.Md5Prefix60Expr]]) — no hex-string round trip.
    */
  def hash60(c: Column): Column =
    graft.plans.VectorExpressions.md5Prefix60(c)

  /** Composed form (md5 hex → substr → conv) — the reference the native
    * expression is verified against.
    */
  def hash60Composed(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Fused tokenize→n-gram→hash60 in one native pass
    * ([[graft.plans.ShingleHashesExpr]]): array of 60-bit window hashes,
    * bit-identical to `shingles(tokens(c), n).map(hash60)` (parity
    * property-tested) but with zero intermediate token/shingle strings.
    * Use wherever only the hashes are needed — the dedup hot path.
    */
  def shingleHashes(c: Column, n: Int): Column =
    graft.plans.ShingleHashesExpr.shingleHashes(c, n)

  /** SQL twin of [[hash60]] for oracle strings. */
  def sqlHash60(e: String): String = s"CAST(('0x' || substr(md5($e),1,15)) AS BIGINT)"

  /** DuckDB twin of [[tokens]] — the ONE tokenizer string every text oracle
    * shares (a drift between copies would silently break oracle parity).
    */
  val sqlToks: String = "list_filter(string_split(lower(text), ' '), x -> x <> '')"

  /** Minhash permutation params: 16 independent affine maps over the
    * 31-bit-reduced shingle hash, mod a prime. All arithmetic stays well
    * inside int64 (max a*h31 ≈ 1.7e5 * 2.1e9 ≈ 3.6e14), so Spark and
    * DuckDB agree exactly (DuckDB raises on int64 overflow; Spark wraps —
    * bounded operands sidestep both).
    */
  val MinhashP = 1000000007L
  val M31 = 2147483647L
  val minhashParams: Seq[(Long, Long)] =
    (0 until 16).map(j => (10007L * (j + 1) + 3L, 104729L * (j + 1) + 7L))

  /** One minhash component: min over `shingleHashCol` (already hash60'd,
    * grouped per doc) — use inside an agg: `min(minhashTerm(h, j))`.
    */
  def minhashTerm(h: Column, j: Int): Column = {
    val (a, b) = minhashParams(j)
    (lit(a) * (h % lit(M31)) + lit(b)) % lit(MinhashP)
  }

  def sqlMinhashTerm(h: String, j: Int): String = {
    val (a, b) = minhashParams(j)
    s"($a*(($h)%$M31)+$b)%$MinhashP"
  }

  /** 16-bit simhash from per-token hash60 values: bit j of the result is
    * set when the (+1/-1) vote sum of token-hash bit j is positive.
    * Use after exploding tokens: `simhashBits` are the per-row votes,
    * aggregated with sum, then folded by [[simhashFold]].
    */
  def simhashVote(h: Column, j: Int): Column =
    when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L))

  def sqlSimhashVote(h: String, j: Int): String =
    s"(CASE WHEN ((($h)>>$j)&1)=1 THEN 1 ELSE -1 END)"

  /** Language marker lexicons for the n-gram-heuristic language ID. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "es" -> Seq("el", "la", "los", "de", "que"),
    "fr" -> Seq("le", "les", "et", "des", "un"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "zh" -> Seq("de5", "le5", "shi", "zai", "he2"))

  /** Count of tokens belonging to a marker set (occurrences, not distinct). */
  def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(markers))).cast("long")

  def sqlMarkerCount(toksExpr: String, markers: Seq[String]): String = {
    val lst = markers.map(m => s"'$m'").mkString(", ")
    s"CAST(len(list_filter($toksExpr, x -> x IN ($lst))) AS BIGINT)"
  }

  /** Stopword list for quality scoring. */
  val stopwords: Seq[String] =
    Seq("the", "and", "of", "to", "is", "in", "a", "for", "on", "with")
}

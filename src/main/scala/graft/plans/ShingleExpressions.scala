package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused tokenize → word-n-gram → md5-prefix60 in ONE native pass — the
  * hot inner loop of every shingle-based dedup operator (jaccard, minhash,
  * LSH, fingerprints, boilerplate, decontamination).
  *
  * The composed pipeline (`lower` → `split` → `filter` → `transform`/
  * `concat_ws` → explode → md5 → substr → conv) materializes a UTF8String
  * per token AND per shingle before hashing; this expression walks the
  * lowercased bytes once, records token boundaries, and feeds each window
  * straight into a thread-local MD5 — zero intermediate strings.
  *
  * Value contract (bit-for-bit with the composed form, which the DuckDB
  * oracles mirror): token split on single spaces with empties dropped,
  * windows joined with one 0x20 byte, md5 over those exact UTF-8 bytes,
  * first 15 hex chars as a long ([[Md5Prefix60Expr.hash60]]'s mapping).
  * Byte-level splitting is UTF-8-safe: multi-byte sequences never contain
  * 0x20.
  */
case class ShingleHashesExpr(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(a: Any): Any =
    ShingleHashesExpr.shingleHashes(a.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.ShingleHashesExpr.shingleHashes($a, $n)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Fused text → 16-component minhash signature in ONE native pass: token
  * walk + window MD5 (shared with [[ShingleHashesExpr]] — identical byte
  * contract) and the 16 affine minhash terms tracked as running minima
  * inline. The composed form (16 × `array_min(transform(hashes, …))`)
  * allocates sixteen intermediate arrays per row and rescans the hash
  * array per component; this expression materializes nothing — not even
  * the hash array — and touches each window's digest once.
  *
  * Returns NULL when the text has fewer than `n` tokens (no windows),
  * mirroring the `size(hashes) > 0` guard the composed pipeline needs.
  * Bit-for-bit parity with the composed form is property-tested in
  * ExpressionsSpec; the minhash constants are [[graft.functions.Text.minhashParams]].
  */
case class MinhashSigExpr(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // short texts yield no windows
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(a: Any): Any =
    MinhashSigExpr.minhashSig(a.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      a => s"""
        ${ev.value} = graft.plans.MinhashSigExpr.minhashSig($a, $n);
        ${ev.isNull} = ${ev.value} == null;
      """)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinhashSigExpr {

  private val A: Array[Long] = graft.functions.Text.minhashParams.map(_._1).toArray
  private val B: Array[Long] = graft.functions.Text.minhashParams.map(_._2).toArray
  private val M31 = graft.functions.Text.M31
  private val P = graft.functions.Text.MinhashP

  /** NOT named `eval` — see [[ShingleHashesExpr.shingleHashes]]. */
  def minhashSig(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.toLowerCase.getBytes
    var nTok = 0
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var i = 0
    val len = bytes.length
    while (i < len) {
      while (i < len && bytes(i) == ' ') i += 1
      if (i < len) {
        val s = i
        while (i < len && bytes(i) != ' ') i += 1
        if (nTok == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nTok * 2)
          ends = java.util.Arrays.copyOf(ends, nTok * 2)
        }
        starts(nTok) = s
        ends(nTok) = i
        nTok += 1
      }
    }
    if (nTok < n) return null
    val md = ShingleHashesExpr.digest()
    val mins = new Array[Long](16)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var w = 0
    val nWin = nTok - n + 1
    while (w < nWin) {
      md.reset()
      var j = 0
      while (j < n) {
        if (j > 0) md.update(' '.toByte)
        md.update(bytes, starts(w + j), ends(w + j) - starts(w + j))
        j += 1
      }
      val d = md.digest()
      var acc = 0L
      var k = 0
      while (k < 8) { acc = (acc << 8) | (d(k) & 0xffL); k += 1 }
      val r = (acc >>> 4) % M31
      var c = 0
      while (c < 16) {
        val t = (A(c) * r + B(c)) % P
        if (t < mins(c)) mins(c) = t
        c += 1
      }
      w += 1
    }
    new GenericArrayData(mins)
  }

  /** Column API. */
  def minhashSig(c: Column, n: Int): Column =
    Bridge.column(MinhashSigExpr(Bridge.expression(c), n))
}

object ShingleHashesExpr {

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private[plans] def digest(): java.security.MessageDigest = digests.get()

  private val EmptyResult = new GenericArrayData(Array.emptyLongArray)

  /** NOT named `eval` — a same-named class member would suppress the
    * static forwarder generated code resolves (see [[LshBucketExpr]]).
    */
  def shingleHashes(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.toLowerCase.getBytes
    // token boundaries: [start, end) pairs over single-space splits
    var nTok = 0
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var i = 0
    val len = bytes.length
    while (i < len) {
      while (i < len && bytes(i) == ' ') i += 1
      if (i < len) {
        val s = i
        while (i < len && bytes(i) != ' ') i += 1
        if (nTok == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nTok * 2)
          ends = java.util.Arrays.copyOf(ends, nTok * 2)
        }
        starts(nTok) = s
        ends(nTok) = i
        nTok += 1
      }
    }
    if (nTok < n) return EmptyResult
    val md = digests.get()
    val out = new Array[Long](nTok - n + 1)
    var w = 0
    while (w < out.length) {
      md.reset()
      var j = 0
      while (j < n) {
        if (j > 0) md.update(' '.toByte)
        md.update(bytes, starts(w + j), ends(w + j) - starts(w + j))
        j += 1
      }
      val d = md.digest()
      var acc = 0L
      var k = 0
      while (k < 8) { acc = (acc << 8) | (d(k) & 0xffL); k += 1 }
      out(w) = acc >>> 4
      w += 1
    }
    new GenericArrayData(out)
  }

  /** Column API. */
  def shingleHashes(c: Column, n: Int): Column =
    Bridge.column(ShingleHashesExpr(Bridge.expression(c), n))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `ArrayType(FloatType)` embedding columns.
  *
  * Implemented with higher-order functions (`zip_with` + `aggregate`) —
  * codegen'd, no UDF serialization, executes as a tight loop over the
  * unsafe array data. Accumulation is sequential left-to-right in double,
  * which both makes it deterministic and matches the oracle's summation
  * closely enough for fixed-point rounding.
  */
object Vectors {

  /** Σ aᵢ·bᵢ in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, x) => acc + x)

  /** Σ aᵢ² in double. */
  def sqNorm(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))

  /** Cosine similarity — native codegen'd Catalyst expression
    * ([[graft.plans.CosineSimExpr]]): one fused loop, no intermediate
    * arrays, bit-identical numerics to [[cosineHof]].
    */
  def cosine(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.cosineSim(a, b)

  /** Higher-order-function composition of cosine — kept as the reference
    * implementation the native expression is tested against.
    */
  def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(sqNorm(a)) * sqrt(sqNorm(b)))

  /** Random-hyperplane LSH bucket: `planes` sign bits packed into a long.
    * The hyperplane weights are a deterministic function of (plane, dim)
    * via a cheap integer mix, so executors need no broadcast side data.
    * Delegates to the native fused-loop expression
    * ([[graft.plans.LshBucketExpr]]).
    */
  def lshBucket(v: Column, planes: Int, dims: Int): Column =
    graft.plans.VectorExpressions.lshBucket(v, planes, dims)

  /** Column-composition form (planes x dims expression nodes) — reference
    * implementation the native expression is tested against.
    */
  def lshBucketComposed(v: Column, planes: Int, dims: Int): Column = {
    val bits = (0 until planes).map { p =>
      val proj = (0 until dims)
        .map { i =>
          val w = ((1103515245L * (p * dims + i) + 12345L) % 65536L) - 32768L
          element_at(v, i + 1).cast("double") * lit(w.toDouble)
        }
        .reduce(_ + _)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}

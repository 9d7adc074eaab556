package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Text

class ExpressionsSpec extends SparkSpec {

  test("native md5-prefix hash is bit-identical to the conv/substr/md5 composition") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, sf)
    val toks = docs.select(explode(Text.tokens(col("text"))).as("t"))
    val diff = toks
      .select(Text.hash60(col("t")).as("native"), Text.hash60Composed(col("t")).as("composed"))
      .filter($"native" =!= $"composed")
    assert(diff.count() == 0)
    // also over non-ascii / empty-adjacent inputs
    val edge = Seq("", "a", "ünïcödé", "日本語テスト", "x" * 10000).toDF("t")
    val ediff = edge
      .select(Text.hash60(col("t")).as("n"), Text.hash60Composed(col("t")).as("c"))
      .filter($"n" =!= $"c")
    assert(ediff.count() == 0)
  }

  test("native expressions survive whole-stage codegen paths") {
    // force evaluation through a grouped aggregate (codegen'd hash agg)
    val sig = graft.llm.Dedup.minhashSignatures(graft.core.Tables.documents(spark, sf), "doc_id", "text", 3)
    assert(sig.count() > 0)
  }
}

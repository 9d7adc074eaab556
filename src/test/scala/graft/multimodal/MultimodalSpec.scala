package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("media plumbing: schema, determinism, and per-row feature bounds") {
    val out = Multimodal.featureQuery(spark, sf)
    assert(
      out.columns.toSeq == Seq("doc_id", "media_type", "byte_len", "checksum", "width", "height"))
    val rows = out.collect()
    assert(rows.length == 500)
    assert(rows.forall(r => r.getLong(2) > 0)) // byte_len
    assert(rows.forall(r => r.getLong(4) >= 16 && r.getLong(4) < 80)) // width bounds
    // deterministic: second run identical
    val again = Multimodal.featureQuery(spark, sf).collect()
    assert(rows.sameElements(again))
  }

  test("frame sampling keeps every Nth chunk with correct lengths") {
    val media = Multimodal.asMedia(graft.core.Tables.documents(spark, sf))
    val frames = Multimodal.sampleFrames(media, chunkSize = 64, everyN = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 2 == 0))
    assert(frames.forall(f => f.frame_len > 0 && f.frame_len <= 64))
    // coverage: every doc with a payload contributes frame 0
    val docsWithFrames = frames.map(_.doc_id).distinct.length
    assert(docsWithFrames == 500)
    assert(frames.count(_.frame_idx == 0) == 500)
  }

  test("byte_len matches utf8 length of the source text") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(spark, sf)
    val expected = docs.select(sum(octet_length(col("text")))).head.getLong(0)
    val got = Multimodal.featureQuery(spark, sf).agg(sum(col("byte_len"))).head.getLong(0)
    assert(got == expected)
  }

  test("resize stub halves dimensions and samples a quarter of the bytes") {
    import org.apache.spark.sql.functions._
    val media = Multimodal.asMedia(graft.core.Tables.documents(spark, sf))
    val resized = Multimodal.resizeStub(media, factor = 2).toDF()
    val feats = Multimodal.extractFeatures(media).toDF()
    val joined = resized
      .join(feats.select(col("doc_id"), col("byte_len"), col("width").as("fw"), col("height").as("fh")), "doc_id")
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("new_w") == math.max(1L, r.getAs[Long]("fw") / 2))
      assert(r.getAs[Long]("new_h") == math.max(1L, r.getAs[Long]("fh") / 2))
      val len = r.getAs[Long]("byte_len")
      assert(r.getAs[Long]("resized_len") == (len + 3) / 4) // ceil(len/4) via stride-4
    }
  }
}

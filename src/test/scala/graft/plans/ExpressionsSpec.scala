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

  test("hilbert_n: bijective unit-step curve in 3-D; expression matches the driver walk; zorderN interleaves") {
    import spark.implicits._
    import graft.functions.Layout
    val order = 3
    val side = 1 << order // 8^3 = 512-cell grid
    val table = Layout.hilbertTableN(order, 3)
    // bijection onto 0..511
    assert(table.toSet == (0 until 512).map(_.toLong).toSet)
    // adjacency law, generalized: consecutive keys differ by ONE unit step
    // in exactly one dimension — the locality property box pruning buys
    val bydist = table.zipWithIndex
      .map { case (dv, i) => dv -> (i / (side * side), i / side % side, i % side) }
      .sortBy(_._1)
      .map(_._2)
    bydist.toSeq.sliding(2).foreach {
      case Seq((x1, y1, z1), (x2, y2, z2)) =>
        assert(
          math.abs(x1 - x2) + math.abs(y1 - y2) + math.abs(z1 - z2) == 1,
          s"jump between d=($x1,$y1,$z1) and ($x2,$y2,$z2)")
      case _ => ()
    }
    // the SAME laws at higher order and dimension (driver-side — the
    // q224 DuckDB splice proves cross-engine EVALUATION parity; THESE
    // properties are what pin the curve itself): order-6 3-D (262k
    // cells, the CALL-default territory) and order-4 4-D
    for ((ord, dims) <- Seq((6, 3), (4, 4))) {
      val side2 = 1 << ord
      val t = graft.functions.Layout.hilbertTableN(ord, dims)
      assert(t.toSet.size == t.length, s"order-$ord ${dims}D: not a bijection")
      assert(t.min == 0L && t.max == t.length - 1L, s"order-$ord ${dims}D: range hole")
      val coordsOf = Array.tabulate(t.length) { idx =>
        val c = new Array[Int](dims)
        var rem = idx
        var i = dims - 1
        while (i >= 0) { c(i) = rem % side2; rem /= side2; i -= 1 }
        c
      }
      val byD = new Array[Array[Int]](t.length)
      t.indices.foreach(i => byD(t(i).toInt) = coordsOf(i))
      var i = 1
      while (i < byD.length) {
        val a = byD(i - 1); val b = byD(i)
        var dist = 0
        var j = 0
        while (j < dims) { dist += math.abs(a(j) - b(j)); j += 1 }
        assert(dist == 1, s"order-$ord ${dims}D: non-unit step at d=$i")
        i += 1
      }
    }
    // expression ≡ driver walk over the full grid, 2 uses in ONE projection
    // (scratch-buffer collision case), plus null propagation
    val grid = spark
      .range(side.toLong * side * side)
      .select(
        (col("id") / (side * side)).cast("long").as("x"),
        (col("id") / side % side).cast("long").as("y"),
        (col("id") % side).as("z"))
    val got = grid
      .select(
        col("x"),
        col("y"),
        col("z"),
        Layout.hilbertN(Seq(col("x"), col("y"), col("z")), order).as("h1"),
        Layout.hilbertN(Seq(col("z"), col("y"), col("x")), order).as("h2"))
      .collect()
    got.foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(r.getLong(3) == table((x * side * side + y * side + z).toInt), s"h($x,$y,$z)")
      assert(r.getLong(4) == table((z * side * side + y * side + x).toInt), s"h-rev($x,$y,$z)")
    }
    val nulls = Seq((Some(1L), None: Option[Long])).toDF("a", "b")
    assert(
      nulls.select(Layout.hilbertN(Seq(col("a"), col("b")), 4).as("h")).head().isNullAt(0),
      "null coordinate must null the key")
    // zorderN: k-way interleave against a scala reference, k = 3
    def zref(xs: Seq[Long], bits: Int): Long =
      (for { i <- 0 until bits; j <- xs.indices } yield ((xs(j) >> i) & 1L) << (3 * i + j)).sum
    val probe = Seq((0L, 0L, 0L), (1L, 2L, 4L), (31L, 17L, 5L), (1023L, 511L, 255L))
    val zgot = probe
      .toDF("a", "b", "c")
      .select(
        col("a"),
        col("b"),
        col("c"),
        Layout.zorderN(Seq(col("a"), col("b"), col("c")), 12).as("zv"))
      .collect()
    zgot.foreach { r =>
      assert(
        r.getLong(3) == zref(Seq(r.getLong(0), r.getLong(1), r.getLong(2)), 12),
        s"zorderN(${r.getLong(0)},${r.getLong(1)},${r.getLong(2)})")
    }
  }

  test("native expressions survive whole-stage codegen paths") {
    // force evaluation through a grouped aggregate (codegen'd hash agg)
    val sig = graft.llm.Dedup.minhashSignatures(graft.core.Tables.documents(spark, sf), "doc_id", "text", 3)
    assert(sig.count() > 0)
  }

  test("native expressions compile under CODEGEN_ONLY (no silent interpreter fallback)") {
    // Regression: a broken doGenCode doesn't fail by default — Spark logs
    // "Failed to compile" and silently runs the projection interpreted
    // (exactly what a suppressed static forwarder caused in round 1).
    // CODEGEN_ONLY turns that fallback into a hard error; codegen.fallback
    // = false does the same for whole-stage codegen.
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val docs = graft.core.Tables.documents(spark, sf)
      val emb = graft.core.Tables.embeddings(spark, sf)
      // Md5Prefix60Expr through projection + aggregate
      assert(docs.select(Text.hash60(col("text")).as("h")).agg(max(col("h"))).head.getLong(0) > 0)
      // CosineSimExpr twice in ONE projection (fresh-name collision case)
      val c = emb.select(
        graft.functions.Vectors.cosine(col("embedding"), col("embedding")).as("c1"),
        graft.functions.Vectors.cosine(col("embedding"), col("embedding")).as("c2"))
      assert(c.filter(col("c1") =!= col("c2")).count() == 0)
      // LshBucketExpr
      assert(emb.select(graft.functions.Vectors.lshBucket(col("embedding"), 4, 64).as("b")).distinct().count() > 0)
      // ShingleHashesExpr through explode + aggregate
      assert(
        docs
          .select(explode(Text.shingleHashes(col("text"), 3)).as("h"))
          .agg(max(col("h")))
          .head
          .getLong(0) > 0)
      // MinhashSigExpr (nullable result path) through projection + filter
      assert(
        docs
          .select(graft.plans.MinhashSigExpr.minhashSig(col("text"), 3).as("s"))
          .filter(col("s").isNotNull)
          .agg(max(element_at(col("s"), 1)))
          .head
          .getLong(0) > 0)
      // L2SqExpr twice in ONE projection (fresh-name collision case)
      val l2 = emb.select(
        graft.plans.VectorExpressions.l2Sq(col("embedding"), col("embedding")).as("d1"),
        graft.plans.VectorExpressions.l2Sq(col("embedding"), col("embedding")).as("d2"))
      assert(l2.filter(col("d1") =!= col("d2") || col("d1") =!= 0.0).count() == 0)
      // Jaro / Jaro-Winkler twice in one projection
      val jw = docs.select(
        StringSimExprs.jaro(col("text"), col("source")).as("j1"),
        StringSimExprs.jaroWinkler(col("text"), col("source")).as("j2"))
      assert(jw.filter(col("j1") > col("j2")).count() == 0) // winkler never decreases
      // HilbertNExpr twice in ONE projection (scratch-buffer freshness)
      val hb = spark
        .range(64)
        .select((col("id") / 8).cast("long").as("x"), (col("id") % 8).as("y"))
        .select(
          graft.functions.Layout.hilbertN(Seq(col("x"), col("y")), 3).as("h1"),
          graft.functions.Layout.hilbertN(Seq(col("x"), col("y")), 3).as("h2"))
      assert(hb.filter(col("h1") =!= col("h2")).count() == 0)
    } finally {
      prevFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(v =>
        spark.conf.set("spark.sql.codegen.factoryMode", v))
      prevFallback.fold(spark.conf.unset("spark.sql.codegen.fallback"))(v =>
        spark.conf.set("spark.sql.codegen.fallback", v))
    }
  }

  test("Jaro / Jaro-Winkler match DuckDB's reference values (probed from the oracle engine)") {
    import spark.implicits._
    // (a, b, jaro_similarity, jaro_winkler_similarity) — values read off
    // DuckDB directly; the pinned pairs cover matches-at-window-edge,
    // transpositions, prefix boost, the 0.7 boost threshold, and empties
    val cases = Seq(
      ("martha", "marhta", 0.9444444444444445, 0.9611111111111111),
      ("dixon", "dicksonx", 0.7666666666666666, 0.8133333333333332),
      ("jellyfish", "smellyfish", 0.8962962962962964, 0.8962962962962964),
      ("abc", "abc", 1.0, 1.0),
      ("", "abc", 0.0, 0.0),
      ("", "", 0.0, 0.0),
      ("a", "b", 0.0, 0.0),
      ("crate", "trace", 0.7333333333333334, 0.7333333333333334),
      ("dwayne", "duane", 0.8222222222222223, 0.8400000000000001),
      ("abqqqqqq", "abzzzzzz", 0.5, 0.5), // below threshold: no boost despite prefix
      ("aq", "az", 0.6666666666666666, 0.6666666666666666),
      // non-ASCII: DuckDB scores RAW UTF-8 BYTES (the CJK pair is three
      // 3-byte codepoints = 9 byte units — char-level scoring would give
      // 0.777…); these values were generated by DuckDB 1.0.0 directly
      ("héllo", "hello", 0.8222222222222223, 0.8400000000000001),
      ("müller", "mueller", 0.8095238095238096, 0.8285714285714287),
      ("日本語", "日本誤", 0.9259259259259259, 0.9555555555555556),
      ("crème brûlée", "creme brulee", 0.7462962962962963, 0.7970370370370371),
      ("αβγδ", "αβγε", 0.9166666666666666, 0.95))
    val got = cases
      .map { case (a, b, _, _) => (a, b) }
      .toDF("a", "b")
      .select(
        col("a"),
        col("b"),
        StringSimExprs.jaro(col("a"), col("b")).as("j"),
        StringSimExprs.jaroWinkler(col("a"), col("b")).as("w"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getDouble(3)))
      .toMap
    cases.foreach { case (a, b, j, w) =>
      val (gj, gw) = got((a, b))
      assert(math.abs(gj - j) < 1e-12, s"jaro($a,$b): $gj vs $j")
      assert(math.abs(gw - w) < 1e-12, s"jw($a,$b): $gw vs $w")
    }
  }

  test("fused shingle hashes are bit-identical to the composed pipeline") {
    import spark.implicits._
    val edge = Seq(
      "",
      " ",
      "a",
      "a b",
      "a  b   c",
      "  leading and trailing  ",
      "ünïcödé tökens here too",
      "日本語 テスト 混在 ascii",
      "x " * 200 + "y",
      "SAME same SaMe case folds")
    val docs = graft.core.Tables.documents(spark, sf).select($"text").collect().map(_.getString(0))
    for (n <- Seq(1, 2, 3, 5)) {
      val df = (edge ++ docs).toDF("text")
      val composed = df.select(
        graft.functions.Text
          .shingles(graft.functions.Text.tokens(col("text")), n)
          .as("sh"))
        .select(transform(col("sh"), s => graft.functions.Text.hash60(s)).as("h"))
        .collect()
        .map(_.getSeq[Long](0))
      val fused = df
        .select(graft.plans.ShingleHashesExpr.shingleHashes(col("text"), n).as("h"))
        .collect()
        .map(_.getSeq[Long](0))
      composed.zip(fused).zipWithIndex.foreach { case ((c, f), i) =>
        assert(c == f, s"n=$n row=$i: composed=$c fused=$f")
      }
    }
  }

  test("fused minhash signatures are bit-identical to the composed pipeline") {
    import spark.implicits._
    val edge = Seq(
      "",
      " ",
      "a",
      "a b",
      "a b c",
      "a  b   c  d",
      "ünïcödé tökens here too",
      "x " * 50 + "y",
      "SAME same SaMe case folds")
    val docs = graft.core.Tables.documents(spark, sf).select($"text").collect().map(_.getString(0))
    for (n <- Seq(1, 3, 5)) {
      val df = (edge ++ docs).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val composed = graft.llm.Dedup
        .minhashSignaturesComposed(df, "doc_id", "text", n)
        .orderBy(col("doc_id"))
        .collect()
        .map(r => (0 until 16).map(j => r.getAs[Long](s"m$j")))
      val fused = graft.llm.Dedup
        .minhashSignatures(df, "doc_id", "text", n)
        .orderBy(col("doc_id"))
        .collect()
        .map(r => (0 until 16).map(j => r.getAs[Long](s"m$j")))
      assert(composed.length == fused.length, s"n=$n: dropped-row semantics diverge")
      composed.zip(fused).zipWithIndex.foreach { case ((c, f), i) =>
        assert(c == f, s"n=$n row=$i: composed=$c fused=$f")
      }
    }
  }

  test("GraftExtensions publishes the native expressions to the SQL registry") {
    // getOrCreate returns the existing default session (ignoring
    // withExtensions) unless the default/active slots are cleared first;
    // the underlying SparkContext is shared and must NOT be stopped here.
    val old = spark // force the shared session to exist before we juggle
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s2 = org.apache.spark.sql.SparkSession
      .builder()
      .master(old.sparkContext.master)
      .appName("ExtensionsSql")
      .config("spark.sql.shuffle.partitions", "2")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      graft.core.GraftSession.tune(s2)
      val docs = graft.core.Tables.documents(s2, sf)
      docs.createOrReplaceTempView("docs_ext")
      val emb = graft.core.Tables.embeddings(s2, sf)
      emb.createOrReplaceTempView("emb_ext")
      // SQL path == Scala API path, row for row
      val sqlHash = s2
        .sql("SELECT doc_id, graft_hash60(text) AS h FROM docs_ext ORDER BY doc_id")
        .collect()
      val apiHash = docs
        .select(col("doc_id"), Text.hash60(col("text")).as("h"))
        .orderBy(col("doc_id"))
        .collect()
      assert(sqlHash.map(_.getLong(1)).sameElements(apiHash.map(_.getLong(1))))
      val sqlCos = s2
        .sql("SELECT graft_cosine_sim(embedding, embedding) AS c FROM emb_ext")
        .collect()
      sqlCos.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-9))
      val sqlLsh = s2
        .sql("SELECT count(DISTINCT graft_lsh_bucket(embedding, 4, 64)) AS n FROM emb_ext")
        .head()
      assert(sqlLsh.getLong(0) > 0)
      // the fused shingle/minhash kernels, SQL vs Scala API
      val sqlSig = s2
        .sql(
          "SELECT doc_id, graft_minhash_sig(text, 3) AS s FROM docs_ext " +
            "WHERE graft_minhash_sig(text, 3) IS NOT NULL ORDER BY doc_id")
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1))
      val apiSig = graft.llm.Dedup
        .minhashSignatures(docs, "doc_id", "text", 3)
        .orderBy(col("doc_id"))
        .collect()
        .map(r => r.getLong(0) -> (0 until 16).map(j => r.getAs[Long](s"m$j")))
      assert(sqlSig.length == apiSig.length)
      sqlSig.zip(apiSig).foreach { case ((id1, s1), (id2, s2v)) =>
        assert(id1 == id2 && s1 == s2v)
      }
      val sqlSh = s2
        .sql("SELECT max(h) FROM (SELECT explode(graft_shingle_hashes(text, 3)) AS h FROM docs_ext)")
        .head()
      assert(sqlSh.getLong(0) > 0)
      // the k-dim Hilbert key from raw SQL == the driver-side curve;
      // INT-typed coordinates exercise the registry's Cast (an uncast int
      // would CCE in interpreted mode while succeeding under codegen)
      val table3 = graft.functions.Layout.hilbertTableN(2, 3)
      val sqlHil = s2
        .sql(
          "SELECT x, y, z, graft_hilbert(2, CAST(x AS INT), CAST(y AS INT), CAST(z AS INT)) AS h FROM " +
            "(SELECT CAST(id / 16 AS BIGINT) AS x, CAST(id / 4 AS BIGINT) % 4 AS y, " +
            "id % 4 AS z FROM range(64))")
        .collect()
      sqlHil.foreach { r =>
        val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
        assert(r.getLong(3) == table3((x * 16 + y * 4 + z).toInt), s"graft_hilbert($x,$y,$z)")
      }
      // graft_zorder from SQL == the Scala column composition
      val zres = s2
        .sql("SELECT graft_zorder(4, CAST(5 AS BIGINT), CAST(9 AS BIGINT)) AS zv")
        .head()
        .getLong(0)
      val zexp = (0 until 4).map(i => (((5L >> i) & 1L) << (2 * i)) + (((9L >> i) & 1L) << (2 * i + 1))).sum
      assert(zres == zexp, s"graft_zorder: $zres != $zexp")
    } finally {
      // restore the suite-shared session; the context stays alive
      org.apache.spark.sql.SparkSession.setDefaultSession(old)
      org.apache.spark.sql.SparkSession.setActiveSession(old)
    }
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuantilesSpec extends SparkSpec {

  import spark.implicits._

  test("exact quantiles equal sorted-sequence indexing, including ties and p=1.0") {
    // values with heavy ties and a non-trivial order
    val vals = (1 to 997).map(i => ((i * 7919) % 100).toLong)
    val df = vals.zipWithIndex.map { case (v, i) => (v, i.toLong) }.toDF("v", "id")
    val n = vals.length.toLong
    val ps = Seq(0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    val got = Quantiles
      .exact(df, "v", Seq(col("v").asc, col("id").asc), ps, n, partitions = 4)
      .collect()
      .map(r => r.getAs[Long]("p_pct") -> r.getAs[Long]("v"))
      .toMap
    val sorted = vals.sorted
    ps.foreach { p =>
      val want = sorted((Quantiles.rankOf(p, n) - 1).toInt)
      assert(got(math.round(p * 100)) == want, s"p=$p")
    }
  }

  test("two fractions sharing a rank both surface; single-row frame works") {
    val df = Seq((42L, 0L)).toDF("v", "id")
    val got = Quantiles
      .exact(df, "v", Seq(col("v").asc, col("id").asc), Seq(0.5, 1.0), n = 1L)
      .collect()
      .map(r => (r.getAs[Long]("p_pct"), r.getAs[Long]("v")))
    assert(got.toSeq == Seq((50L, 42L), (100L, 42L)))
  }

  test("rankOf matches ceil(p*n) with the boundary epsilon") {
    assert(Quantiles.rankOf(0.25, 100) == 25L)
    assert(Quantiles.rankOf(0.5, 101) == 51L)
    assert(Quantiles.rankOf(1.0, 7) == 7L)
    assert(Quantiles.rankOf(0.001, 5) == 1L)
  }

  test("grouped quantiles equal per-group sorted-sequence indexing") {
    val rows = for {
      g <- Seq("a", "bb", "c")
      i <- 1 to (g.length * 400 + 37) // uneven group sizes
    } yield (g, ((i * 7919) % 251).toLong, i.toLong)
    val df = rows.toDF("g", "v", "id")
    val ps = Seq(0.25, 0.5, 0.9, 1.0)
    val got = Quantiles
      .exactGrouped(df, "g", "v", Seq(col("g").asc, col("v").asc, col("id").asc), ps, partitions = 5)
      .collect()
      .map(r => (r.getString(0), r.getAs[Long]("p_pct")) -> r.getAs[Long]("v"))
      .toMap
    rows.groupBy(_._1).foreach { case (g, grp) =>
      val sorted = grp.map(_._2).sorted
      ps.foreach { p =>
        val want = sorted((Quantiles.rankOf(p, grp.size.toLong) - 1).toInt)
        assert(got((g, math.round(p * 100))) == want, s"group $g p=$p")
      }
    }
  }

  test("multi-partition path agrees with single-partition path") {
    val vals = (1 to 2000).map(i => ((i * 104729) % 997).toLong)
    val df = vals.zipWithIndex.map { case (v, i) => (v, i.toLong) }.toDF("v", "id")
    val ps = Seq(0.1, 0.5, 0.9)
    def run(parts: Int) = Quantiles
      .exact(df, "v", Seq(col("v").asc, col("id").asc), ps, vals.length.toLong, partitions = parts)
      .collect()
      .map(r => (r.getAs[Long]("p_pct"), r.getAs[Long]("v")))
      .toSeq
    assert(run(1) == run(7))
  }
}

package graft
import org.apache.spark.sql.SparkSession

/** Benchmark runner: times every registered query on the sf dir given by
  * SPARK_GRAFT_SF_DIR and prints the machine-parseable JSON last: the full
  * per-query line, then a short totals-only trailer sized to survive a
  * ~2 KB stdout tail capture.
  *
  * Output discipline: the JSON lines are the final stdout lines before exit
  * (after `spark.stop()` so no executor log can interleave), timings are
  * truncated to ms so the line stays well inside any tail-capture buffer,
  * and a query that throws is recorded with a negative sentinel (-elapsed)
  * plus an `errors` list — a crash must not masquerade as a fast run.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // static conf, so set at build: 133 queries × 2 passes evict the
      // default 100-entry generated-class cache long before pass 2 reaches
      // any given query — every eviction is a fresh janino compile, and the
      // complex plans (q129's two trainings + search: ~30 codegen units)
      // pay it worst. Measured: q129 17.5s inside the full run vs 5.5s in a
      // fresh session before this; the cache is bounded, just sized to the
      // registry.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // parser extensions are builder-time-only: MV DDL queries need this
      .config("spark.sql.extensions", classOf[graft.plans.GraftExtensions].getName)
      .getOrCreate()
    graft.core.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    // warm the JVM/codegen/parquet-reader paths once, untimed, so the
    // first alphabetical query doesn't absorb ~4s of cold-start
    spark.range(1 << 20).selectExpr("sum(id * 2)").collect()
    spark.read.parquet(s"$sfDir/nation.parquet").groupBy("n_regionkey").count().collect()
    // Calibration sentinel: a fixed CPU-bound query timed at start AND end
    // of the run. Query plans don't change between rounds for this probe,
    // so its timing measures only the box (contention, thermal, co-tenant
    // load) — a reader can divide the per-query numbers by the sentinel
    // drift to normalize cross-round comparisons. r5 postmortem: official
    // totals swung 200.7s vs 133.5s purely on box contention.
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      spark.range(256L << 20).selectExpr("sum(id * 7 % 1000003)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    val calibStart = calibrate()
    var errors = List.empty[String]
    // optional args: substrings selecting a subset of queries (local iteration)
    val selected =
      if (args.isEmpty) SparkEntry.queries.toSeq
      else SparkEntry.queries.toSeq.filter { case (n, _) => args.exists(n.contains) }
    // Stall watchdog (diagnostic, stderr-only): if any single query runs
    // past the threshold, dump every thread stack once so a wedged run
    // shows WHERE it is wedged instead of just a large number in the JSON.
    val current = new java.util.concurrent.atomic.AtomicReference[(String, Long)](null)
    val watchdog = new Thread(() => {
      var dumpedFor: String = null
      while (true) {
        Thread.sleep(5000)
        val c = current.get()
        if (c != null && c._1 != dumpedFor && (System.nanoTime() - c._2) / 1e9 > 20.0) {
          dumpedFor = c._1
          val sb = new StringBuilder(s"== graft-bench stall: ${c._1} exceeded 20s; thread dump ==\n")
          import scala.jdk.CollectionConverters._
          java.lang.Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
            sb.append(s"-- ${t.getName} (${t.getState})\n")
            st.take(12).foreach(f => sb.append(s"   at $f\n"))
          }
          System.err.println(sb.result())
          // also to a file: harness greps of stdout routinely drop stderr
          try {
            java.nio.file.Files.write(
              java.nio.file.Paths.get(s"/tmp/graft_stall_${c._1}_${System.nanoTime()}.txt"),
              sb.result().getBytes("UTF-8"))
          } catch { case _: Throwable => }
        }
      }
    })
    watchdog.setDaemon(true)
    watchdog.start()
    // Two passes, per-query minimum: measures steady-state latency (JMH-
    // style) instead of whichever run a transient machine-wide stall landed
    // on — observed run-to-run variance on this box is >5x for individual
    // queries under contention. Declared in the JSON as runs/agg.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    def timeOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      current.set((name, t0))
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => errors ::= name; false }
      val dt = (System.nanoTime() - t0) / 1e9
      current.set(null)
      // operator-internal persists (shingle/band tables) must not leak
      // across queries — clear outside the timed window
      spark.catalog.clearCache()
      if (ok) dt else -dt
    }
    val ordered = selected.sortBy(_._1)
    // Alternate direction between passes: BENCH_r08 postmortem — box
    // contention early in the run inflated the alphabetically-FIRST
    // queries in BOTH passes (q108-q110 read 5-6x high), so per-query
    // min-of-2 couldn't cancel it. With pass 2 reversed, a contended
    // window at either end of the run overlaps a different query prefix
    // in each pass, so the min recovers the uncontended reading.
    val allPasses = (1 to passes).map { p =>
      val order = if (p % 2 == 1) ordered else ordered.reverse
      order.map { case (n, fn) => n -> timeOne(n, fn) }
    }
    // min of successful runs; a query only reports negative if EVERY pass failed
    val results = ordered.map { case (n, _) =>
      val ts = allPasses.map(_.find(_._1 == n).get._2)
      val good = ts.filter(_ >= 0)
      n -> (if (good.nonEmpty) good.min else ts.max)
    }
    // Per-query noise flag: a pass reading >3x the best pass means SOME
    // window of the run was contended — the min is still trustworthy, but
    // a reader comparing totals should know which entries carried noise.
    val noisy = ordered.flatMap { case (n, _) =>
      val good = allPasses.map(_.find(_._1 == n).get._2).filter(_ >= 0)
      if (good.size >= 2 && good.min > 0.15 && good.max > 3.0 * good.min) Some(n) else None
    }
    val calibEnd = calibrate()
    spark.stop()
    def ms(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val calib = s""""calibration_s":{"start":${ms(calibStart)},"end":${ms(calibEnd)}}"""
    // Round-1 postmortem: the driver's stdout tail buffer (~2 KB) truncated
    // the HEAD of the 2.5 KB JSON line → "parsed": null. Keep the stdout
    // line comfortably under that budget by using the short qNN keys (the
    // contract's own example shape, {"q1":sec,…}); the full-name version
    // goes to BENCH_LOCAL.json next to the repo for human/judge reading.
    def short(k: String): String = k.takeWhile(_ != '_')
    val qs = results.map { case (k, v) => "\"" + short(k) + "\":" + ms(v) }.mkString("{", ",", "}")
    val total = results.map { case (_, v) => math.abs(v) }.sum
    // "value" is the sum of per-query minima — a composite, not any single
    // run's wall clock. Also report the final pass's real end-to-end total
    // so a reader wanting an actually-executed run has one in the same line.
    val lastPassTotal = allPasses.last.map { case (_, v) => math.abs(v) }.sum
    val errJson = errors.reverse.distinct.map(e => "\"" + short(e) + "\"").mkString("[", ",", "]")
    val fullQs = results.map { case (k, v) => "\"" + k + "\":" + ms(v) }.mkString("{", ",", "}")
    val fullErr = errors.reverse.distinct.map("\"" + _ + "\"").mkString("[", ",", "]")
    val fullNoisy = noisy.map("\"" + _ + "\"").mkString("[", ",", "]")
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_LOCAL.json"), // cwd = the sbt project root
        s"""{"metric":"total","value":${ms(total)},"unit":"sec","last_pass_total":${ms(lastPassTotal)},$calib,"queries":$fullQs,"errors":$fullErr,"flagged_noisy":$fullNoisy,"runs":$passes,"agg":"min","order":"alternating","sf":"$sfDir"}\n"""
          .getBytes("UTF-8"))
    } catch {
      case e: Throwable => System.err.println(s"[bench] BENCH_LOCAL.json not written: ${e.getMessage}")
    }
    println(s"""{"metric":"total","value":${ms(total)},"unit":"sec","last_pass_total":${ms(lastPassTotal)},$calib,"queries":$qs,"errors":$errJson,"noisy_n":${noisy.size},"runs":$passes,"agg":"min","sf":"$sfDir"}""")
    // Round-6 postmortem: the per-query line above outgrew the driver's
    // 2000-char stdout tail window (184 queries ≈ 2.6 KB), so the head —
    // metric/value/calibration — was truncated and BENCH_r05/r06 recorded
    // "parsed": null. Emit a short totals-only trailer LAST so the tail
    // always retains one complete parseable JSON line regardless of how
    // large the registry grows. Full per-query map: line above + BENCH_LOCAL.json.
    println(s"""{"metric":"total","value":${ms(total)},"unit":"sec","last_pass_total":${ms(lastPassTotal)},$calib,"errors_n":${errors.distinct.size},"queries_n":${results.size},"noisy_n":${noisy.size},"runs":$passes,"agg":"min","sf":"$sfDir"}""")
  }
}

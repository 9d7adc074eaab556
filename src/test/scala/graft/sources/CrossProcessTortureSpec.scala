package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tools.LockTorture

/** The file-lock + tombstone + pending-marker protocols proven against a
  * REAL second process: the suite's JVM (role `a`) and a spawned child
  * JVM (role `b`) hammer one shared fact table and one shared MV root
  * with ≥60 contended upsert/addCheck/dropCheck/validate/create/refresh/
  * drop operations. Every in-process race law ([[MvSpec]]'s `mvfault`
  * injections) models what THIS test actually performs.
  *
  * End-state invariants: zero unexpected failures on either side; no
  * lost updates (each role's final value per key survived); the checks
  * dir holds no orphaned pending markers after a final validate; no lock
  * file left behind; and the MV root is HEALABLE — whatever state the
  * races left it in, the documented drop→create path yields a working
  * view.
  */
class CrossProcessTortureSpec extends SparkSpec {

  import spark.implicits._

  test("cross-process torture: two JVMs race upserts/checks/MV lifecycle — no wedge, no lost update, no orphan marker") {
    val base = Files.createTempDirectory("graft_torture").toString
    val fact = s"$base/fact"
    val mv = s"$base/mv"
    Sources.writeParquet(
      Seq((-1L, 0L, "x"), (-2L, 1L, "x")).toDF("k", "v", "w").repartition(1),
      fact)
    Snapshots.commit(spark, fact, Seq("k", "w"))

    // ---- spawn role b -----------------------------------------------------
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    System.setProperty("graft.lock.trace", s"$base/lock.trace")
    val cmd = Seq(javaBin) ++ LockTorture.Jdk17Opens ++ Seq(
      "-Xmx3g",
      "-Dspark.ui.enabled=false",
      s"-Dgraft.lock.trace=$base/lock.trace",
      "-cp", cp,
      "graft.tools.LockTorture", "b", base, "30", "7", s"$base/b.result")
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(new java.io.File(s"$base/b.log"))
    val proc = pb.start()
    try {
      // wait for the child's session so the two loops actually overlap
      val readyDeadline = System.currentTimeMillis() + 180000L
      while (!Files.exists(java.nio.file.Paths.get(s"$base/.ready")) &&
        proc.isAlive && System.currentTimeMillis() < readyDeadline) Thread.sleep(200)
      assert(
        Files.exists(java.nio.file.Paths.get(s"$base/.ready")),
        s"child JVM never came up:\n${tail(s"$base/b.log")}")

      // ---- role a runs INLINE on the suite's own session -------------------
      val resA = LockTorture.run(spark, "a", base, 30, 13)

      assert(proc.waitFor(15, java.util.concurrent.TimeUnit.MINUTES), "child JVM hung")
      assert(
        proc.exitValue() == 0,
        s"child reported unexpected failures:\n${tail(s"$base/b.log")}\n${tail(s"$base/b.result")}")
      assert(resA.unexpected == 0, resA.failures.mkString("\n"))
      assert(resA.upserts > 0, "role a made no progress")

      // ---- no lost updates --------------------------------------------------
      val bLines = Files.readAllLines(java.nio.file.Paths.get(s"$base/b.result"))
      val bLast: Map[Long, Long] = {
        import scala.jdk.CollectionConverters._
        bLines.asScala.collect { case l if l.startsWith("k ") =>
          val Array(_, k, v) = l.split(" "); k.toLong -> v.toLong
        }.toMap
      }
      assert(bLines.toString.contains("unexpected 0"), bLines.toString)
      assert(bLast.nonEmpty, "role b made no upsert progress")
      val want = resA.lastV ++ bLast
      val got = Snapshots
        .readSnapshot(spark, fact)
        .where($"k" >= 0L)
        .select($"k", $"v")
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      assert(got == want, s"lost updates: got ${got.toSeq.sorted} want ${want.toSeq.sorted}")

      // ---- checks consistent, no orphaned pending markers -------------------
      Constraints.validatePending(spark, fact)
      assert(Constraints.pendingChecks(spark, fact).isEmpty, "orphaned pending markers")
      Constraints.checks(spark, fact) // must parse

      // ---- no lock left behind ----------------------------------------------
      Seq(fact, mv).foreach { root =>
        val dir = new org.apache.hadoop.fs.Path(root, Snapshots.ManifestDirName)
        val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(dir))
          assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, ".lock")), s"stuck lock in $root")
      }

      // ---- the MV root is healable whatever state the races left ------------
      val defExists = {
        val p = new org.apache.hadoop.fs.Path(s"$mv/${Snapshots.ManifestDirName}/mv/def")
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
      }
      if (defExists) Mv.refresh(spark, mv) // a live view must still refresh
      Mv.drop(spark, mv) // heals a tombstoned husk, no-ops on a clean root
      Mv.create(spark, fact, mv, Seq("w"), Seq("count(*) AS n", "sum(v) AS sv"))
      val fresh = Snapshots.readSnapshot(spark, mv).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val expect = Snapshots.readSnapshot(spark, fact).groupBy($"w")
        .agg(count(lit(1)).as("n"), sum($"v").as("sv")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(fresh == expect, "the healed view must equal a recompute")
      assert(Mv.drop(spark, mv))
    } finally {
      System.clearProperty("graft.lock.trace")
      if (proc.isAlive) proc.destroyForcibly()
    }
  }

  test("cross-process maintenance torture: compaction/clustering/vacuum/branch adoption race MoR upserts — content-neutral, nothing lost") {
    val base = Files.createTempDirectory("graft_torture2").toString
    val fact = s"$base/fact"
    // partitioned, so compaction/clustering have real scopes to rewrite
    Sources.writeParquet(
      Seq((-1L, 0L, "a"), (-2L, 1L, "b")).toDF("k", "v", "w").repartition(1),
      fact, partitionCols = Seq("w"))
    Snapshots.commit(spark, fact, Seq("k", "w"))

    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    System.setProperty("graft.lock.trace", s"$base/lock.trace")
    val cmd = Seq(javaBin) ++ LockTorture.Jdk17Opens ++ Seq(
      "-Xmx3g",
      "-Dspark.ui.enabled=false",
      s"-Dgraft.lock.trace=$base/lock.trace",
      "-cp", cp,
      "graft.tools.LockTorture", "b", base, "30", "11", s"maint:$base/b.result")
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(new java.io.File(s"$base/b.log"))
    val proc = pb.start()
    try {
      val readyDeadline = System.currentTimeMillis() + 180000L
      while (!Files.exists(java.nio.file.Paths.get(s"$base/.ready")) &&
        proc.isAlive && System.currentTimeMillis() < readyDeadline) Thread.sleep(200)
      assert(
        Files.exists(java.nio.file.Paths.get(s"$base/.ready")),
        s"child JVM never came up:\n${tail(s"$base/b.log")}")

      val resA = LockTorture.runMaintenance(spark, "a", base, 30, 17)

      assert(proc.waitFor(15, java.util.concurrent.TimeUnit.MINUTES), "child JVM hung")
      assert(
        proc.exitValue() == 0,
        s"child reported unexpected failures:\n${tail(s"$base/b.log")}\n${tail(s"$base/b.result")}")
      assert(resA.unexpected == 0, resA.failures.mkString("\n"))
      assert(resA.upserts > 0, "role a made no progress")

      val bLines = {
        import scala.jdk.CollectionConverters._
        Files.readAllLines(java.nio.file.Paths.get(s"$base/b.result")).asScala.toSeq
      }
      assert(bLines.exists(_ == "unexpected 0"), bLines.mkString("\n"))
      def kv(prefix: String, lines: Seq[String]): Map[Long, Long] =
        lines.collect { case l if l.startsWith(prefix + " ") =>
          val Array(_, k, v) = l.split(" "); k.toLong -> v.toLong
        }.toMap
      val bLast = kv("k", bLines)
      val bAppended = kv("bk", bLines)
      assert(bLast.nonEmpty, "role b made no upsert progress")

      // adopt whatever branch state the races left — the branch protocol's
      // healability contract: rebase (replay onto head) then fast-forward
      Seq("b_a", "b_b").foreach { name =>
        val bdir = new org.apache.hadoop.fs.Path(
          s"$fact/${Snapshots.ManifestDirName}/branches/$name")
        if (bdir.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(bdir)) {
          Snapshots.rebase(spark, fact, name)
          Snapshots.fastForward(spark, fact, name)
        }
      }

      // CONTENT: upsert keys read last-write-wins; every branch append
      // survived adoption to exactly one row; maintenance lost nothing
      def mainContent(): (Map[Long, Long], Map[Long, Long]) = {
        val rows = Snapshots.readSnapshot(spark, fact)
          .where($"k" >= 0L).select($"k", $"v").collect()
        assert(rows.length == rows.map(_.getLong(0)).distinct.length,
          "duplicate keys on the main line — a maintenance pass double-adopted rows")
        val m = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
        (m.filter(_._1 < 2000L), m.filter(_._1 >= 2000L))
      }
      val wantUpserts = resA.lastV ++ bLast
      val wantAppends = resA.appended ++ bAppended
      val (gotUp, gotAp) = mainContent()
      assert(gotUp == wantUpserts,
        s"lost updates: got ${gotUp.toSeq.sorted} want ${wantUpserts.toSeq.sorted}")
      assert(gotAp == wantAppends,
        s"lost/duplicated branch appends: got ${gotAp.toSeq.sorted} want ${wantAppends.toSeq.sorted}")

      // a FINAL maintenance pass over the settled table is content-neutral
      Sources.compactInPlace(spark, fact)
      Sources.clusterInPlace(spark, fact, $"k", 2)
      Snapshots.vacuum(spark, fact, keepLast = 1)
      val (gotUp2, gotAp2) = mainContent()
      assert(gotUp2 == wantUpserts && gotAp2 == wantAppends,
        "compact+cluster+vacuum changed the table's content")

      val dir = new org.apache.hadoop.fs.Path(fact, Snapshots.ManifestDirName)
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, ".lock")), "stuck lock")
    } finally {
      System.clearProperty("graft.lock.trace")
      if (proc.isAlive) proc.destroyForcibly()
    }
  }

  private def tail(path: String): String =
    try {
      val lines = Files.readAllLines(java.nio.file.Paths.get(path))
      import scala.jdk.CollectionConverters._
      lines.asScala.takeRight(40).mkString("\n")
    } catch { case _: Exception => s"($path unreadable)" }
}

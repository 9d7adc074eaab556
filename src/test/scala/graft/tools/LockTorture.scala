package graft.tools

import org.apache.spark.sql.SparkSession

import graft.sources.{Constraints, DeleteVectors, Mv}

/** Cross-process lock torture: one role of a two-writer contention loop
  * over a SHARED fact table + a SHARED materialized-view root. The suite
  * runs role `a` inline on its own session while a SECOND JVM (spawned
  * with this object's `main`) runs role `b` against the same directories
  * — the file-lock / tombstone / pending-marker protocols race between
  * REAL processes, not injected faults.
  *
  * Contract per op class:
  *  - fact upserts (disjoint per-role keyspaces) must NEVER fail — the
  *    table lock queues writers, it does not refuse them; each role's
  *    final value per key must survive to the end (no lost updates).
  *  - check ops (add/drop/validatePending on the fact) must either
  *    succeed or refuse with the documented contention message
  *    (`already exists`).
  *  - MV lifecycle ops (create/refresh/drop of ONE shared root) may
  *    refuse with the documented contention messages (create-on-extant,
  *    tombstoned husk, dropped-underneath refresh) — anything else is an
  *    UNEXPECTED failure and fails the run.
  */
object LockTorture {

  /** Mirror of build.sbt's JDK-17 module opens — the spawned JVM builds a
    * SparkSession outside spark-submit, exactly like forked tests do.
    */
  val Jdk17Opens: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  final case class Result(
      upserts: Int,
      refused: Int,
      unexpected: Int,
      lastV: Map[Long, Long],
      failures: Seq[String])

  /** The documented contention refusals — everything else is a bug. */
  private def benign(m: String): Boolean =
    m.contains("already holds a table or view") ||
      m.contains("holds the remains of a dropped view") ||
      m.contains("is not a materialized view") ||
      m.contains("already exists") || // addCheck on a live name
      m.contains("records no schema") || // refresh racing the drop's sweep
      m.contains("no committed manifest") ||
      m.contains("no longer holds a committed manifest")

  def run(spark: SparkSession, role: String, base: String, nOps: Int, seed: Long): Result = {
    import spark.implicits._
    val fact = s"$base/fact"
    val mv = s"$base/mv"
    val rnd = new scala.util.Random(seed)
    var upserts = 0
    var refused = 0
    var lastV = Map.empty[Long, Long]
    val failures = scala.collection.mutable.Buffer.empty[String]
    val keyBase = if (role == "a") 0L else 1000L
    val opsLog = new java.io.PrintWriter(new java.io.FileWriter(s"$base/$role.ops", true))
    def note(s: String): Unit = { opsLog.println(s"${System.currentTimeMillis()} $role $s"); opsLog.flush() }
    for (i <- 0 until nOps) {
      val op = rnd.nextInt(10)
      note(s"op$i kind$op start")
      try op match {
        case 0 | 1 | 2 | 3 =>
          val k = keyBase + rnd.nextInt(15)
          val v = i.toLong
          DeleteVectors.upsert(spark, fact, Seq((k, v, role)).toDF("k", "v", "w"), Seq("k"))
          lastV += k -> v
          upserts += 1
        case 4 => Constraints.addCheck(spark, fact, s"c_${role}_${i % 3}", "v >= 0")
        case 5 => { Constraints.validatePending(spark, fact); () }
        case 6 => { Constraints.dropCheck(spark, fact, s"c_${role}_${i % 3}"); () }
        case 7 =>
          Mv.create(spark, fact, mv, Seq("w"), Seq("count(*) AS n", "sum(v) AS sv")); ()
        case 8 => { Mv.refresh(spark, mv); () }
        case 9 => { Mv.drop(spark, mv); () }
      } catch {
        case e: Throwable =>
          val m = Option(e.getMessage).getOrElse("")
          if (op <= 3) failures += s"op$i upsert MUST NOT fail: $e"
          else if (benign(m)) { refused += 1; note(s"op$i kind$op refused: ${m.take(80)}") }
          else failures += s"op$i (kind $op) unexpected: $e"
      } finally note(s"op$i kind$op end")
    }
    opsLog.close()
    Result(upserts, refused, failures.size, lastV, failures.toSeq)
  }

  final case class MaintResult(
      upserts: Int,
      refused: Int,
      unexpected: Int,
      lastV: Map[Long, Long],
      appended: Map[Long, Long],
      failures: Seq[String])

  /** The documented contention refusals of the MAINTENANCE op set —
    * branch lifecycle races (create-on-extant, append/ff/rebase on a
    * just-adopted-and-deleted branch, ff on diverged lines) are part of
    * the protocol; anything else is a bug.
    */
  private def maintBenign(m: String): Boolean =
    m.contains("already exists") || // createBranch on a live name
      m.contains("no branch") || // append/ff/rebase racing an adoption's delete
      m.contains("lines diverged") ||
      m.contains("CALL rebase")

  /** Scenario 2: MoR upserts racing the table-MAINTENANCE writers —
    * compaction, clustering, vacuum, and the branch lifecycle
    * (create → lock-free-landed appends → rebase → fast-forward
    * adoption). Same contract shape as [[run]]: upserts must never fail
    * and their last value per key survives; maintenance must be
    * CONTENT-NEUTRAL (compaction/clustering/vacuum may never lose or
    * duplicate a row); branch appends (unique keys ≥ 2000) must each
    * survive to exactly one main-line row once adopted.
    */
  def runMaintenance(spark: SparkSession, role: String, base: String, nOps: Int, seed: Long): MaintResult = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val fact = s"$base/fact"
    val branch = s"b_$role"
    val rnd = new scala.util.Random(seed)
    var upserts = 0
    var refused = 0
    var lastV = Map.empty[Long, Long]
    var appended = Map.empty[Long, Long]
    val failures = scala.collection.mutable.Buffer.empty[String]
    val keyBase = if (role == "a") 0L else 1000L
    val appendBase = if (role == "a") 2000L else 3000L
    val opsLog = new java.io.PrintWriter(new java.io.FileWriter(s"$base/$role.ops", true))
    def note(s: String): Unit = { opsLog.println(s"${System.currentTimeMillis()} $role $s"); opsLog.flush() }
    for (i <- 0 until nOps) {
      val op = rnd.nextInt(12)
      note(s"op$i kind$op start")
      try op match {
        case 0 | 1 | 2 | 3 =>
          val k = keyBase + rnd.nextInt(15)
          val v = i.toLong
          DeleteVectors.upsert(spark, fact, Seq((k, v, role)).toDF("k", "v", "w"), Seq("k"))
          lastV += k -> v
          upserts += 1
        case 4 => { graft.sources.Sources.compactInPlace(spark, fact); () }
        case 5 => { graft.sources.Sources.clusterInPlace(spark, fact, col("k"), 2); () }
        case 6 => { graft.sources.Snapshots.vacuum(spark, fact, keepLast = 2); () }
        case 7 => { graft.sources.Snapshots.createBranch(spark, fact, branch); () }
        case 8 | 9 =>
          val k = appendBase + i
          graft.sources.Snapshots.appendToBranch(
            spark, fact, branch, Seq((k, i.toLong, role)).toDF("k", "v", "w"))
          appended += k -> i.toLong
        case 10 => { graft.sources.Snapshots.rebase(spark, fact, branch); () }
        case 11 =>
          // adopt: rebase first when the lines diverged, then fast-forward
          try graft.sources.Snapshots.fastForward(spark, fact, branch)
          catch {
            case e: Exception
                if Option(e.getMessage).exists(_.contains("CALL rebase")) =>
              graft.sources.Snapshots.rebase(spark, fact, branch)
              graft.sources.Snapshots.fastForward(spark, fact, branch)
          }
          ()
      } catch {
        case e: Throwable =>
          val m = Option(e.getMessage).getOrElse("")
          if (op <= 3) failures += s"op$i upsert MUST NOT fail: $e"
          else if (op <= 6) failures += s"op$i maintenance (kind $op) MUST NOT fail: $e"
          else if (maintBenign(m)) { refused += 1; note(s"op$i kind$op refused: ${m.take(80)}") }
          else failures += s"op$i (kind $op) unexpected: $e"
      } finally note(s"op$i kind$op end")
    }
    opsLog.close()
    MaintResult(upserts, refused, failures.size, lastV, appended, failures.toSeq)
  }

  /** Minimal mutual-exclusion check: under the table lock, write a
    * marker naming this role, settle, read it back — a double-grant
    * shows up as a foreign marker. Returns violations.
    */
  def lockCheck(spark: SparkSession, role: String, base: String, n: Int): Int = {
    val root = s"$base/locktable"
    val marker = java.nio.file.Paths.get(s"$base/.cs-marker")
    var violations = 0
    for (i <- 0 until n)
      graft.sources.Snapshots.withTableLock(spark, root) {
        java.nio.file.Files.writeString(marker, s"$role $i")
        Thread.sleep(5)
        val got = new String(java.nio.file.Files.readAllBytes(marker), "UTF-8")
        if (got != s"$role $i") {
          violations += 1
          System.err.println(s"[lockcheck-$role] iteration $i: marker says '$got'")
        }
        java.nio.file.Files.deleteIfExists(marker)
      }
    violations
  }

  /** args: role base nOps seed resultFile — writes a `.ready` sentinel
    * once the session is up (the suite waits for it so the two loops
    * actually overlap), exits nonzero on any unexpected failure.
    */
  def main(args: Array[String]): Unit = {
    val Array(role, base, nOpsS, seedS, resultFile) = args
    val spark = SparkSession
      .builder()
      .master("local[2]")
      .appName(s"graft-torture-$role")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$base/.ready"), "up")
    if (resultFile == "lockcheck") {
      val v = try lockCheck(spark, role, base, nOpsS.toInt) finally spark.stop()
      sys.exit(if (v == 0) 0 else 3)
    }
    if (resultFile.startsWith("maint:")) {
      val out = resultFile.stripPrefix("maint:")
      val res =
        try runMaintenance(spark, role, base, nOpsS.toInt, seedS.toLong)
        finally spark.stop()
      val sb = new StringBuilder
      sb.append(s"upserts ${res.upserts}\n")
      sb.append(s"refused ${res.refused}\n")
      sb.append(s"unexpected ${res.unexpected}\n")
      res.lastV.toSeq.sorted.foreach { case (k, v) => sb.append(s"k $k $v\n") }
      res.appended.toSeq.sorted.foreach { case (k, v) => sb.append(s"bk $k $v\n") }
      res.failures.foreach(f => sb.append(s"fail ${f.replace('\n', ' ')}\n"))
      java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
      res.failures.foreach(System.err.println)
      sys.exit(if (res.unexpected > 0) 2 else 0)
    }
    val res =
      try run(spark, role, base, nOpsS.toInt, seedS.toLong)
      finally spark.stop()
    val sb = new StringBuilder
    sb.append(s"upserts ${res.upserts}\n")
    sb.append(s"refused ${res.refused}\n")
    sb.append(s"unexpected ${res.unexpected}\n")
    res.lastV.toSeq.sorted.foreach { case (k, v) => sb.append(s"k $k $v\n") }
    res.failures.foreach(f => sb.append(s"fail ${f.replace('\n', ' ')}\n"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(resultFile), sb.toString)
    res.failures.foreach(System.err.println)
    if (res.unexpected > 0) sys.exit(2)
  }
}

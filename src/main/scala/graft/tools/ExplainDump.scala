package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for selected registered queries to files —
  * the plan evidence the optimization rounds commit under `plans/rNN/`.
  *
  * Usage: runMain graft.tools.ExplainDump <outDir> <suffix> [nameSubstr...]
  * Writes `<outDir>/<queryName>_<suffix>.txt`. Data dir from
  * SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), cores from
  * SPARK_GRAFT_CPUS — the bench session's exact configuration, so the
  * captured plans are the plans the bench times.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExplainDump <outDir> <suffix> [nameSubstr...]")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val suffix = args(1)
    val sels = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.extensions", classOf[graft.plans.GraftExtensions].getName)
      .getOrCreate()
    graft.core.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val picked = graft.SparkEntry.queries.toSeq
      .filter { case (n, _) => sels.isEmpty || sels.exists(n.contains) }
      .sortBy(_._1)
    picked.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          outDir.resolve(s"${name}_$suffix.txt"),
          txt.getBytes("UTF-8"))
        println(s"[explain] wrote $name")
      } catch {
        case e: Throwable => println(s"[explain] FAILED $name: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}

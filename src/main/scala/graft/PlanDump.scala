package graft

import java.nio.file.{Files, Paths}

/** Dev harness: write `explain("formatted")` for named SparkEntry queries to
  * files (the optimization rounds' plans/rNN evidence). Usage:
  *   runMain graft.PlanDump <outDir> <suffix> [query ...]
  * (no query names = the whole battery; env: SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_CPUS). Same session config as Bench part 1 / QueryTimer so
  * the dumped plans are the benched plans. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <suffix> [query ...]")
    val outDir = args(0); val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-bench-local"
        else System.getProperty("java.io.tmpdir")))
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted.filterNot(Bench.excluded)
    for (name <- names) {
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(Paths.get(outDir, s"$name$suffix.txt"), plan.getBytes("UTF-8"))
        println(s"[plans] wrote $name$suffix.txt")
      } catch {
        case e: Throwable => println(s"[plans] FAILED $name: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}

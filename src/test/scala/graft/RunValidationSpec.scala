package graft

import graft.suite.CodeTable
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The spark-submit entry point, driven end-to-end: stage + validate +
  * suite checks + resumable re-invocation, all through the CLI surface.
  */
class RunValidationSpec extends SparkSpec {

  private def tmp(): String = Files.createTempDirectory("graft-cli").toString

  test("CLI: stage + validate + suite extras; second invocation is a no-op; incremental picks up a new snapshot") {
    val root = tmp()
    val input = s"$root/input"; val work = s"$root/work"; val dim = s"$root/dim"
    val df = CodeTable.generate(spark, 3000)
    df.write.mode("overwrite").parquet(input)
    CodeTable.dimRepoCommits(df).write.mode("overwrite").parquet(dim)

    val a = RunValidation.parse(Array(
      "--input", input, "--work", work, "--buckets", "8", "--incremental",
      "--dim", dim, "--profile", "repo,lang", "--unique", "repo,path,commit",
      "--fd", "repo:lang"))
    assert(a.fd === Some((Seq("repo"), "lang")))
    intercept[IllegalArgumentException] { RunValidation.parse(Array("--fd", "repolang")) }
    val j1 = RunValidation.run(spark, a)
    assert(j1.contains(""""processed_buckets":8"""), j1)
    assert(j1.contains(""""done_buckets":8"""), j1)
    assert(j1.contains(""""profile":{"repo":"""), j1)
    assert(j1.contains(""""dangling_refs":"""), j1)
    // repo does NOT determine lang in the code table (multi-lang repos) —
    // the summary carries the violating-group count and the repair cost
    assert(j1.contains(""""fd_violating_groups":"""), j1)
    val fdGroups = j1.split("\"fd_violating_groups\":")(1).split(",")(0).toLong
    assert(fdGroups > 0, j1)
    assert(j1.contains(""""fd_minority_rows":"""), j1)
    val viols1 = j1.split("\"violations\":")(1).split(",")(0).toLong
    assert(viols1 > 0) // CodeTable plants violations

    // same staged content: content-addressed completion => nothing to do
    val j2 = RunValidation.run(spark, a)
    assert(j2.contains(""""processed_buckets":0"""), j2)

    // new snapshot: restage with one repo's content touched => only its
    // buckets revalidate
    df.withColumn("content",
        when(col("repo") === "org0/mega", concat(col("content"), lit(" v2")))
          .otherwise(col("content")))
      .withColumn("content_sha256", sha2(col("content"), 256)) // digest must track content
      .write.mode("overwrite").parquet(input)
    val j3 = RunValidation.run(spark, a.copy(restage = true))
    val processed3 = j3.split("\"processed_buckets\":")(1).split(",")(0).toInt
    assert(processed3 > 0 && processed3 <= 8, j3)

    // bad argument fails loudly
    intercept[IllegalArgumentException] { RunValidation.parse(Array("--nope")) }
    intercept[IllegalArgumentException] { RunValidation.parse(Array("--input", input)) }

    // mixing guard: the manifest holds fingerprinted (incremental) done rows,
    // so a non-incremental invocation must refuse — run() would treat
    // content-changed buckets as done forever
    val mixErr = intercept[IllegalArgumentException] {
      RunValidation.run(spark, a.copy(incremental = false))
    }
    assert(mixErr.getMessage.contains("--incremental"), mixErr.getMessage)

    // bucket-count guard: the staged layout owns the number
    val bktErr = intercept[IllegalArgumentException] {
      RunValidation.run(spark, a.copy(buckets = 16))
    }
    assert(bktErr.getMessage.contains("--buckets 8"), bktErr.getMessage)
    // and --restage with the new count rebuilds instead of corrupting
    val j4 = RunValidation.run(spark, a.copy(buckets = 16, restage = true,
      work = s"$root/work16"))
    assert(j4.contains(""""processed_buckets":16"""), j4)

    // restage guards over an EXISTING manifest: a changed --buckets would
    // leave done rows masking re-numbered buckets, and a non-incremental
    // restage would skip the re-staged content entirely — both refuse
    val rsErr = intercept[IllegalArgumentException] {
      RunValidation.run(spark, a.copy(buckets = 16, restage = true))
    }
    assert(rsErr.getMessage.contains("fresh --work"), rsErr.getMessage)
    val niErr = intercept[IllegalArgumentException] {
      RunValidation.run(spark, a.copy(restage = true, incremental = false))
    }
    assert(niErr.getMessage.contains("--incremental"), niErr.getMessage)
  }

  test("CLI --bucketed-table: suite extras plan exchange-free; summary values match the default path; re-attach after catalog loss") {
    val root = tmp()
    val input = s"$root/input"; val dim = s"$root/dim"
    val df = CodeTable.withPlantedDuplicates(CodeTable.generate(spark, 3000), 3200)
    df.write.mode("overwrite").parquet(input)
    CodeTable.dimRepoCommits(df).write.mode("overwrite").parquet(dim)
    def args(work: String, bucketed: Boolean) = RunValidation.parse(
      Array("--input", input, "--work", work, "--buckets", "8",
        "--dim", dim, "--unique", "repo,path,commit") ++
        (if (bucketed) Array("--bucketed-table", "graft_cli_bucketed") else Array.empty[String]))
    def field(j: String, k: String) = j.split(s""""$k":""")(1).split("[,}]")(0).toLong
    try {
      val plain = RunValidation.run(spark, args(s"$root/work_plain", bucketed = false))
      val b = args(s"$root/work_b", bucketed = true)
      assert(b.bucketKeys === Seq("commit")) // default serves both extras
      val bucketed = RunValidation.run(spark, b)
      // identical suite answers through the exchange-free paths
      assert(field(bucketed, "duplicate_keys") === field(plain, "duplicate_keys"))
      assert(field(bucketed, "dangling_refs") === field(plain, "dangling_refs"))
      assert(field(bucketed, "duplicate_keys") > 0 && field(bucketed, "dangling_refs") > 0)
      // the extras' executed plans over the bucketed staging carry NO
      // Exchange (broadcast disabled: at 10^12 rows neither side broadcasts)
      val staged = spark.table("graft_cli_bucketed")
      val pu = RunValidation.suiteUniqueness(staged, b)
        .queryExecution.executedPlan.toString
      assert(!pu.contains("Exchange"), s"bucketed uniqueness must not shuffle:\n$pu")
      val prevThr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val pr = RunValidation.suiteReferential(spark, staged, b, dim)
          .queryExecution.executedPlan.toString
        assert(!pr.contains("Exchange"), s"co-bucketed referential must not shuffle:\n$pr")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThr)
      // catalog loss (new session): tables re-attach from the existing files,
      // same answers, no re-write of the staged layout
      spark.sql("DROP TABLE graft_cli_bucketed")
      spark.sql("DROP TABLE graft_cli_bucketed_dim")
      val mtime = new java.io.File(s"$root/work_b/bucketed").lastModified
      val again = RunValidation.run(spark, b)
      assert(field(again, "duplicate_keys") === field(plain, "duplicate_keys"))
      assert(field(again, "dangling_refs") === field(plain, "dangling_refs"))
      assert(new java.io.File(s"$root/work_b/bucketed").lastModified === mtime)
      // re-attaching with DIFFERENT keys must fail fast: CLUSTERED BY over
      // files hashed on other keys would make the exchange-free checks
      // aggregate partial per-file groups silently
      spark.sql("DROP TABLE graft_cli_bucketed")
      val bad = intercept[IllegalArgumentException] {
        RunValidation.run(spark, b.copy(bucketKeys = Seq("repo")))
      }
      assert(bad.getMessage.contains("bucket"), bad.getMessage)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_cli_bucketed")
      spark.sql("DROP TABLE IF EXISTS graft_cli_bucketed_dim")
    }
  }
}

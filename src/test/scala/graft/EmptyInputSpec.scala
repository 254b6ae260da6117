package graft

import java.nio.file.Files

/** Degenerate-input sweep: every declared query must EXECUTE on
  * zero-row tables (0 output rows is fine; exceptions are not). This is
  * the class of bug the correctness gate can't see — it always runs on
  * populated tables — and exactly where scalar `.head`/null-aggregate
  * assumptions break (connectedComponents' label-sum NPE was this
  * class). At 100 TB an empty PARTITION or an empty filtered subset is
  * routine, so "no rows" must be a value, not a crash.
  */
class EmptyInputSpec extends SparkSpec {

  private val src = "/root/testdata/sf0.001"

  private lazy val emptyDir: String = {
    val dir = Files.createTempDirectory("graft_empty").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      spark.read.parquet(s"$src/$t.parquet").limit(0)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  /** 50 copies of one row per table: every column constant — zero
    * variance, one distinct value, all-tied ranks, self-equal keys. The
    * div-by-zero / log(0) / degenerate-tie class empty inputs can't
    * reach (their aggregates emit no rows at all).
    */
  private lazy val constDir: String = {
    val dir = Files.createTempDirectory("graft_const").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      val one = spark.read.parquet(s"$src/$t.parquet").limit(1)
      val dup = Seq.fill(50)(one).reduce(_ unionAll _)
      dup.coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private def sweep(dir: String, label: String): Unit = {
    val failures = SparkEntry.queries.flatMap { case (name, fn) =>
      try { fn(spark, dir).count(); None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(160)}")
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries crash on $label input:\n${failures.mkString("\n")}")
  }

  test("every declared query executes on empty tables without throwing") {
    sweep(emptyDir, "empty")
  }

  test("every declared query executes on constant (50×-one-row) tables without throwing") {
    sweep(constDir, "constant")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.{GraphOps, SamplingOps}

/** Connected-components clustering and deterministic sampling/hashing. */
class GraphSamplingSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents: chain propagates the min label transitively") {
    // 1-2-3-4 chain plus isolated 9: diameter 3 forces multiple
    // propagation rounds; every chain node must reach label 1.
    val nodes = Seq(1L, 2L, 3L, 4L, 9L).toDF("id")
    val edges = Seq((2L, 3L), (3L, 4L), (1L, 2L)).toDF("a", "b")
    val labels = GraphOps.connectedComponents(nodes, "id", edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 9L -> 9L))
  }

  test("connectedComponents: two components keep distinct min labels") {
    val nodes = (1L to 6L).toDF("id")
    val edges = Seq((5L, 6L), (1L, 3L)).toDF("a", "b")
    val labels = GraphOps.connectedComponents(nodes, "id", edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(labels(5L) == 5L && labels(6L) == 5L)
    assert(labels(1L) == 1L && labels(3L) == 1L)
    assert(labels(2L) == 2L && labels(4L) == 4L)
  }

  test("stratifiedSample is deterministic and rate-ordered") {
    val df = (1L to 2000L).toDF("id").withColumn("stratum", col("id") % 2)
    val rate = when(col("stratum") === 0, 0.5).otherwise(0.1)
    val once = SamplingOps.stratifiedSample(df, "id", rate)
    val twice = SamplingOps.stratifiedSample(df, "id", rate)
    val a = once.select("id").as[Long].collect().sorted
    assert(a.sameElements(twice.select("id").as[Long].collect().sorted))
    val byStratum = once.groupBy("stratum").count().as[(Long, Long)].collect().toMap
    // md5 is uniform: 1000 candidates per stratum → ≈500 vs ≈100 kept
    assert(byStratum(0L) > 400 && byStratum(0L) < 600, s"got $byStratum")
    assert(byStratum(1L) > 60 && byStratum(1L) < 140, s"got $byStratum")
  }

  test("weightedSample: without replacement, heavy weights dominate, deterministic") {
    val df = (0L until 500L).map(i =>
      (i, if (i < 50) 100.0 else 0.01)).toDF("id", "w")
    val out = SamplingOps.weightedSample(df, "id", "w", 60)
      .as[(Long, Double)].collect()
    assert(out.length == 60 && out.map(_._1).distinct.length == 60)
    // the 50 heavy rows are ~10 000× likelier per unit — all must be in
    assert(out.count(_._1 < 50L) == 50)
    val again = SamplingOps.weightedSample(df, "id", "w", 60)
      .as[(Long, Double)].collect()
    assert(out.map(_._1).toSet == again.map(_._1).toSet)
  }

  test("weightedSample plans TakeOrdered, never a full global sort") {
    val df = (0L until 100L).map(i => (i, 1.0)).toDF("id", "w")
    val plan = SamplingOps.weightedSample(df, "id", "w", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected partial top-N, got:\n$plan")
  }

  test("featureHash buckets are stable and in range") {
    val df = Seq("AUTOMOBILE", "BUILDING", "AUTOMOBILE").toDF("seg")
      .select(SamplingOps.featureHash(col("seg"), 64).as("b"))
    val bs = df.as[Long].collect()
    assert(bs(0) == bs(2), "same value must hash to the same bucket")
    assert(bs.forall(b => b >= 0 && b < 64))
  }
}

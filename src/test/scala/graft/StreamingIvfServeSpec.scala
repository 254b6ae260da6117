package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps

/** The sharded-IVF SERVING path must be stream ≡ batch: query vectors
  * driven through the frozen route+search core in micro-batches (shard
  * route → nprobe own-shard cells → exact cosine top-k against the
  * frozen home index) must reproduce exactly (a) the declared batch
  * twin's rows (q453) and (b) the full-corpus ANN's rows for those
  * queries (q441 at the same dials) — per-query results are
  * independent, so serving a request stream and batch-scoring the
  * corpus agree row for row. This is the 100 TB online-recall shape:
  * train once, freeze (codebook + home assignment), then every
  * micro-batch costs kcPerShard + nprobe·cell per request,
  * independent of corpus size.
  */
class StreamingIvfServeSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("micro-batched serve == declared q453 batch twin == q441 rows " +
    "for the served queries") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val bits = SimilarityOps.adaptiveSignBits(emb)
    val sb = math.max(1, bits - 5)

    // the declared batch twin (q453's exact plan)
    val expected = SparkEntry.queries("q453_ivf_serve")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(expected.nonEmpty, "fixture: the serve sample must hit")

    // q441 at the same dials, restricted to the served queries, must
    // agree row for row (per-query independence of the search)
    val servedIds = expected.map(_._1)
    val q441 = SparkEntry.queries("q441_ivf_ann")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(t => servedIds(t._1)).toSet
    assert(q441 == expected,
      "q453 must be q441's rows restricted to the served query sample")

    // freeze the index once, then stream the SAME query sample through
    // the search core in two micro-batches
    val (e, home, cb) = SimilarityOps.ivfShardedFreeze(emb, "vec_id",
      "embedding", kcPerShard = 16, rounds = 2, shardBits = sb)
    val queries = emb
      .filter(pmod(conv(substring(md5(col("vec_id").cast("string")), 1, 8),
        16, 10).cast("long"), lit(10)) === 0)
      .collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Float]]("embedding").toSeq)
    // the two-micro-batch assertion below needs >= 1 query per batch;
    // a 1-query sample would make splitAt(0) yield an empty FIRST batch
    // and fail `afterFirst > 0` spuriously (fixture, not parity)
    assert(queries.length >= 2,
      s"fixture: md5 1-in-10 sample yielded ${queries.length} query(s); " +
        "need >= 2 to exercise two non-empty micro-batches")
    val (batch1, batch2) = queries.splitAt(queries.length / 2)

    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val served = collection.mutable.ArrayBuffer[(Long, Long, Double)]()
    val handle: (DataFrame, Long) => Unit = (bdf, _) => {
      val qs = SimilarityOps.shardQuantized(bdf, "vec_id", "embedding",
        sb)
      served ++= SimilarityOps.ivfShardedSearch(qs, e, home, cb, 8, 5)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      ()
    }
    val q = mem.toDS().toDF("vec_id", "embedding").writeStream
      .foreachBatch(handle)
      .start()
    mem.addData(batch1: _*)
    q.processAllAvailable()
    val afterFirst = served.size
    mem.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()
    assert(afterFirst > 0 && afterFirst < served.size,
      "the serve must actually run across two micro-batches")
    assert(served.toSet == expected,
      "micro-batched serve must reproduce the batch twin exactly")
  }
}

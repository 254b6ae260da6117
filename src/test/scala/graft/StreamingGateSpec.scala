package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.TextOps

/** gopherFlags is a pure row-local projection, so the SAME function
  * must run unchanged on a document stream (no state, no shuffle, no
  * watermark — the live ingestion quality gate) and emit exactly the
  * batch flags for the same documents.
  */
class StreamingGateSpec extends SparkSpec {
  import spark.implicits._

  test("streamed gopherFlags == batch gopherFlags row-for-row") {
    val docs = Seq(
      (1L, (1 to 39).map(i => f"alp$i%02d").mkString(" ") + " the"),
      (2L, "zipp zipp zipp zapp zopp"),
      (3L, Seq.fill(31)("x").mkString(" ")),
      (4L, "the a the a the a")
    ).toDF("doc_id", "text")
    val batch = TextOps.gopherFlags(docs, "doc_id", "text", Seq("the", "a"))
      .collect().map(r => r.getLong(0) ->
        (1 to 5).map(r.getLong(_)).toList).toMap

    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = TextOps.gopherFlags(mem.toDS().toDF("doc_id", "text"),
        "doc_id", "text", Seq("the", "a"))
      .writeStream.format("memory").queryName("gate_stream")
      .outputMode("append").start()
    mem.addData(docs.as[(Long, String)].collect().toSeq: _*)
    q.processAllAvailable()
    val streamed = spark.table("gate_stream")
      .collect().map(r => r.getLong(0) ->
        (1 to 5).map(r.getLong(_)).toList).toMap
    assert(streamed == batch)
    q.stop()
  }
}

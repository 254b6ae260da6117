package graft

/** End-to-end corpus curation: monotone row accounting and survivor
  * integrity on the smallest testdata scale.
  */
class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("stages only ever shrink the corpus, and the result is consistent") {
    val r = CorpusPipeline.run(spark, "/root/testdata/sf0.001")
    val counts = r.report.map(_._2)
    assert(counts.head > 0, "raw corpus must be non-empty")
    assert(counts.sliding(2).forall { case Seq(a, b) => b <= a },
      s"stage counts must be non-increasing: ${r.report}")
    assert(counts.last > 0, "curation must not drop everything")
    // survivors are unique docs with non-empty text and a sampled source
    val out = r.curated.select("doc_id", "source", "text")
      .as[(Long, String, String)].collect()
    assert(out.map(_._1).distinct.length == out.length)
    assert(out.forall(_._3.nonEmpty))
    assert(out.map(_._2).toSet.subsetOf(Set("src0", "src1", "src2")))
    assert(out.length.toLong == counts.last)
  }
}

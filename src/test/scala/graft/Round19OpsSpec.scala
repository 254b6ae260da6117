package graft

import org.apache.spark.sql.functions._
import graft.operators.{GraphOps, MetricOps, SimilarityOps}
import graft.tables.Tables

/** Round-19 specs: the -0.0 normalization class, the full-grid
  * per-period PSI, the exactly-once balanced-panel filter for the
  * blocked-rank family, and the bucketed mutual-kNN scale twin
  * (including the exact-crossJoin modularity composition demoted from
  * q266's declared form to this fixture).
  */
class Round19OpsSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("woeIv: zero-valued woe/iv outputs carry a positive sign bit") {
    // symmetric level: pos == neg within 'b' makes its WOE/IV round to
    // zero; the output must be +0.0 bit-for-bit (doubleToRawLongBits)
    val df = Seq(("a", 1), ("a", 1), ("a", 0),
      ("b", 1), ("b", 0)).toDF("f", "y")
    val rows = MetricOps.woeIv(df, "f", "y").collect()
    for (r <- rows; c <- Seq("woe", "iv", "iv_total")) {
      val v = r.getAs[Double](c)
      if (v == 0.0)
        assert(java.lang.Double.doubleToRawLongBits(v) == 0L,
          s"$c is -0.0")
    }
  }

  test("siegelSlope/theilSen: a flat series yields +0.0 slope bits") {
    val flat = (0 to 5).map(i => ("g", i.toDouble, 7.0))
      .toDF("g", "x", "y")
    val s = MetricOps.siegelSlope(flat, "g", "x", "y").collect()(0)
    assert(java.lang.Double.doubleToRawLongBits(
      s.getAs[Double]("siegel_slope")) == 0L)
    val t = MetricOps.theilSen(flat, "g", "x", "y").collect()(0)
    assert(java.lang.Double.doubleToRawLongBits(
      t.getAs[Double]("ts_slope")) == 0L)
  }

  test("psiByPeriod: drift into a bin ABSENT from the baseline is " +
    "counted (full 0..nBins-1 grid, the psiFromCounts convention)") {
    // baseline week 0 lives in bin 0; week 1 entirely in bin 3
    val df = (Seq.fill(8)((0L, 1.0)) ++ Seq.fill(8)((1L, 35.0)))
      .toDF("per", "v")
    val out = MetricOps.psiByPeriod(df, "v", "per", binWidth = 10.0,
      nBins = 4).orderBy("per").collect()
    assert(out.length == 2)
    val psiSelf = out(0).getAs[Double]("psi")
    val psiDrift = out(1).getAs[Double]("psi")
    assert(psiSelf == 0.0)
    // hand value over the full 4-bin grid, N=8, smoothing (n+1)/(N+4):
    // bins {0,3} swap 9/12 <-> 1/12, bins {1,2} identical -> terms 0
    val hi = 9.0 / 12.0; val lo = 1.0 / 12.0
    val expected = 2.0 * (hi - lo) * math.log(hi / lo)
    assert(math.abs(psiDrift - expected) < 1e-6,
      s"psi=$psiDrift expected=$expected")
  }

  test("kendallW/friedman: a rater with a duplicate item AND a missing " +
    "item is excluded even though its row count matches the slate") {
    // slate = {i1, i2}; rater r3 rates i1 twice and i2 never
    val df = Seq(
      ("r1", "i1", 1.0), ("r1", "i2", 2.0),
      ("r2", "i1", 2.0), ("r2", "i2", 1.0),
      ("r3", "i1", 3.0), ("r3", "i1", 4.0)).toDF("r", "i", "v")
    val w = MetricOps.kendallW(df, "r", "i", "v").collect()(0)
    assert(w.getAs[Long]("m_raters") == 2L, "r3 must be dropped")
    assert(w.getAs[Long]("n_items") == 2L)
    // r1 and r2 disagree perfectly on 2 items -> W = 0
    assert(w.getAs[Double]("w") == 0.0)
    val f = MetricOps.friedman(df, "r", "i", "v")
      .agg(max("n_blocks")).collect()(0).getLong(0)
    assert(f == 2L, "friedman must drop the duplicate/missing block")
  }

  test("robustScale/tokenEntropy: degenerate inputs hit the zero-IQR " +
    "and single-token guards on the declared q127/q121 shapes") {
    val const = Seq(("s", 5.0), ("s", 5.0), ("s", 5.0),
      ("t", 1.0), ("t", 2.0), ("t", 3.0), ("t", 4.0)).toDF("g", "v")
    val rs = graft.operators.EncodeOps.robustScale(const, "g", "v")
    val sRows = rs.filter(col("g") === "s").collect()
    assert(sRows.nonEmpty && sRows.forall(_.isNullAt(
      rs.columns.indexOf("v_robust"))), "zero IQR must null, not +/-Inf")
    assert(rs.filter(col("g") === "t" && col("v_robust").isNotNull)
      .count() == 4L)
    val te = graft.operators.TextOps.tokenEntropy(
      Seq("tok tok tok").toDF("text"), "text").collect()(0)
    assert(te.getAs[Long]("n_distinct") == 1L)
    assert(te.getAs[Double]("entropy_nats") == 0.0)
    assert(te.isNullAt(te.fieldIndex("norm_entropy")),
      "ln(1) divisor must null norm_entropy")
  }

  test("mutualKnnBucketed: pairs are a subset of the exact mutual-kNN " +
    "pairs with identical sims, and recall is high on the fixture") {
    val emb = Tables.embeddings(spark, sfDir)
    val exact = SimilarityOps.mutualKnn(emb, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val ann = SimilarityOps.mutualKnnBucketed(emb, "vec_id",
      "embedding", 5, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // every ANN pair is mutual in SOME candidate sense; sims of pairs
    // present in both must agree bit-for-bit (same dot, same round)
    for ((k, v) <- ann if exact.contains(k))
      assert(exact(k) == v, s"sim mismatch at $k")
    // multi-probe recall on the 490-vector fixture: signBits=4 is the
    // documented ~0.48 recall@10 operating point (LshRecallSpec's
    // dial); mutual pairs track it. Pin the floor just under it so a
    // quantizer regression (e.g. a broken probe list) still fails.
    val hit = ann.keySet.count(exact.contains)
    assert(hit >= (0.40 * exact.size).toInt,
      s"recall ${hit.toDouble / exact.size} too low")
    assert(ann.nonEmpty)
  }

  test("exact modularity composition (q266's pre-round-7 form) still " +
    "holds as a fixture: q_contrib sums into (-0.5, 1]") {
    val emb = Tables.embeddings(spark, sfDir)
    val mk = SimilarityOps.mutualKnn(emb, "vec_id", "embedding", 5)
    val seeds = emb.filter(col("vec_id") % 3 === 0)
      .select(col("vec_id"), col("label"))
    val communities = GraphOps.labelPropagate(mk, "id_a", "id_b",
      seeds, "vec_id", "label")
    val q = GraphOps.modularity(mk, "id_a", "id_b", communities,
        "vec_id", "label_pred")
      .agg(sum("q_contrib")).collect()(0).getDouble(0)
    assert(q > -0.5 && q <= 1.0, s"modularity $q out of range")
  }

  test("importanceWeights matches a literal driver-side DSIR " +
    "reimplementation and ranks target-vocabulary docs on top") {
    val docs = Seq(
      (0L, "alpha beta alpha beta alpha beta", "t"),
      (1L, "alpha beta gamma delta alpha beta", "t"),
      (2L, "omega psi omega psi omega psi", "r"),
      (3L, "omega psi chi phi omega psi", "r"),
      (4L, "alpha beta omega psi", "r"),
      (5L, "solo", "r") // < 2 tokens: no bigram evidence, dropped
    ).toDF("doc_id", "text", "grp")
    val B = 32
    val got = operators.SamplingOps.importanceWeights(
        docs, "doc_id", "text", col("grp") === "t", B)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2))).toMap

    // literal reimplementation: md5 bucket, add-one smoothed
    // log-ratio, 12-dp snapped terms, BigDecimal sum, 6-dp average
    def bucket(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16) % B
    }
    val corpus = Seq(
      (0L, "alpha beta alpha beta alpha beta", true),
      (1L, "alpha beta gamma delta alpha beta", true),
      (2L, "omega psi omega psi omega psi", false),
      (3L, "omega psi chi phi omega psi", false),
      (4L, "alpha beta omega psi", false))
    val perDoc = corpus.map { case (id, txt, tgt) =>
      val toks = txt.split(" ")
      val ks = toks.sliding(2).map(p => bucket(p.mkString(" "))).toSeq
      (id, tgt, ks.groupBy(identity).view.mapValues(_.size.toLong).toMap)
    }
    val ct = perDoc.filter(_._2).flatMap(_._3).groupBy(_._1)
      .view.mapValues(_.map(_._2).sum).toMap
    val cr = perDoc.flatMap(_._3).groupBy(_._1)
      .view.mapValues(_.map(_._2).sum).toMap
    val (tt, tr) = (ct.values.sum, cr.values.sum)
    def snap(v: Double, dp: Int): Double =
      BigDecimal(v).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lr = cr.keys.map { k =>
      k -> snap(math.log((ct.getOrElse(k, 0L) + 1).toDouble * (tr + B) /
        ((cr(k) + 1).toDouble * (tt + B))), 12)
    }.toMap
    for ((id, _, ks) <- perDoc) {
      val n = ks.values.sum
      val s = ks.map { case (k, c) => BigDecimal(snap(c * lr(k), 12)) }
        .sum
      val want = snap(s.toDouble / n, 6)
      val (gotN, gotIw) = got(id)
      assert(gotN == n, s"doc $id n_bigrams $gotN != $n")
      assert(gotIw == want, s"doc $id iw $gotIw != $want")
    }
    assert(!got.contains(5L), "a 1-token doc must carry no weight")
    // target-vocabulary docs outrank raw-vocabulary docs; the mixed
    // doc 4 sits between the two blocks
    assert(got(0L)._2 > got(4L)._2 && got(1L)._2 > got(4L)._2)
    assert(got(4L)._2 > got(2L)._2 && got(4L)._2 > got(3L)._2)
  }

  test("kCenterSelect walks the farthest-point order on a hand case " +
    "and the coverage radius never increases") {
    // four axis points + one near-duplicate of the seed: the traversal
    // must pick the opposite pole first (d=2), then the orthogonals
    // (d=1, min-id tiebreak), and never the near-duplicate
    val pts = Seq(
      (10L, Seq(1.0, 0.0, 0.0)),
      (11L, Seq(0.99, 0.14, 0.0)), // ~8° from seed — picked last
      (20L, Seq(-1.0, 0.0, 0.0)),
      (30L, Seq(0.0, 1.0, 0.0)),
      (31L, Seq(0.0, -1.0, 0.0))
    ).toDF("vec_id", "embedding")
    val got = operators.SimilarityOps.kCenterSelect(
        pts, "vec_id", "embedding", 5)
      .collect().map(r => (r.getInt(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(got.map(_._2).toSeq == Seq(10L, 20L, 30L, 31L, 11L),
      s"selection order was ${got.map(_._2).toSeq}")
    assert(got(0)._3.isEmpty, "seed carries no radius")
    val radii = got.drop(1).flatMap(_._3)
    assert(radii.head == 2.0, "opposite pole is at cosine distance 2")
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a },
      s"radius must be non-increasing: ${radii.toSeq}")
    // fewer vectors than k: stops early, no crash
    val short = operators.SimilarityOps.kCenterSelect(
      pts.limit(2), "vec_id", "embedding", 5).collect()
    assert(short.length == 2)
  }

  test("hardNegatives never pairs same-label vectors and keeps <= k " +
    "descending-sim rows per anchor") {
    val emb = Tables.embeddings(spark, sfDir)
    val hn = SimilarityOps.hardNegatives(emb, "vec_id", "embedding",
      "label", 3, 4)
    val lab = emb.select(col("vec_id"), col("label"))
    val joined = hn
      .join(lab.withColumnRenamed("label", "a_lbl"), Seq("vec_id"))
      .join(lab.select(col("vec_id").as("neighbor_id"),
        col("label").as("b_lbl")), Seq("neighbor_id"))
      .collect()
    assert(joined.nonEmpty)
    assert(joined.forall(r =>
      r.getAs[Int]("a_lbl") != r.getAs[Int]("b_lbl")),
      "a hard negative must carry a different label")
    val byAnchor = joined.groupBy(_.getAs[Long]("vec_id"))
    assert(byAnchor.forall(_._2.length <= 3))
    // within an anchor, rows ordered by sim desc after the declared sort
    for ((_, rows) <- byAnchor) {
      val sims = rows.sortBy(_.getAs[Long]("neighbor_id"))
        .map(_.getAs[Double]("sim"))
      assert(sims.forall(s => s >= -1.0001 && s <= 1.0001))
    }
  }

  test("lshBandingAdvisor: hand-checked S-curve numbers and bucket " +
    "workload on an identical-trio fixture") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "alpha beta gamma delta epsilon"),
      (4L, "omega psi chi phi upsilon")
    ).toDF("doc_id", "text")
    val sh = operators.DedupOps.shingles(docs, "doc_id", "text")
    val got = operators.DedupOps.lshBandingAdvisor(sh, "doc_id", 0.5)
      .collect().map(r => r.getInt(0) ->
        (r.getInt(1), r.getDouble(2), r.getDouble(3),
          r.getLong(4), r.getLong(5))).toMap
    // closed forms: s* = (1/b)^(1/r); p = 1 - (1 - 0.5^r)^b
    assert(got(8) == ((1, 0.125, 0.996094, 16L, 24L)),
      s"b=8 row was ${got(8)}")
    assert(got(1)._2 == 1.0 && got(1)._3 == 0.003906)
    // identical trio: every band bucket holds {1,2,3} (3 pairs) plus
    // doc 4 alone -> n_buckets = 2b, est_pairs = 3b for every banding
    for ((b, (_, _, _, nb, ep)) <- got) {
      assert(nb == 2L * b, s"b=$b n_buckets $nb")
      assert(ep == 3L * b, s"b=$b est_pairs $ep")
    }
  }

  test("dedupThresholdSweep: identical-trio pairs survive every " +
    "threshold; the curve is monotone non-increasing") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "alpha beta gamma delta epsilon"),
      (4L, "omega psi chi phi upsilon")
    ).toDF("doc_id", "text")
    val sh = operators.DedupOps.shingles(docs, "doc_id", "text")
    val got = operators.DedupOps.dedupThresholdSweep(sh, "doc_id")
      .orderBy("tidx").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(got.length == 10)
    // identical docs share every band key: the 3 trio pairs (j = 1.0)
    // survive even the 0.9 cutoff
    assert(got.last._2 == 3L && got.last._3 == 3L)
    for (Seq((_, p1, d1), (_, p2, d2)) <- got.toSeq.sliding(2)) {
      assert(p2 <= p1 && d2 <= d1, "sweep must be non-increasing")
    }
  }

  test("ivfCellAdvisor: hand-checked cells on explicit sign patterns") {
    val vecs = Seq(
      (1L, Seq(1.0, 1.0, 0.5)),
      (2L, Seq(1.0, -1.0, 0.5)),
      (3L, Seq(-1.0, 1.0, 0.5)),
      (4L, Seq(0.5, 0.5, -1.0))
    ).toDF("vec_id", "embedding")
    val got = operators.SimilarityOps.ivfCellAdvisor(
        vecs, "vec_id", "embedding", 2)
      .orderBy("sign_bits").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // b=1: cells by dim-0 sign — {+: 1,2,4} {−: 3} → 2 cells, max 3,
    // pairs 3; b=2: {(+,+): 1,4} {(+,−): 2} {(−,+): 3} → 3 cells,
    // max 2, pairs 1
    assert(got(1) == ((2L, 3L, 3L)), s"b=1 was ${got(1)}")
    assert(got(2) == ((3L, 2L, 1L)), s"b=2 was ${got(2)}")
  }

  test("gopherFlags (row-local HOF form) agrees flag-for-flag with " +
    "gopherRules' shuffle-form counts on real documents") {
    val docs = Tables.documents(spark, sfDir)
    val sums = operators.TextOps.gopherFlags(docs, "doc_id", "text",
        Seq("the", "a"))
      .agg(sum("f_word_count"), sum("f_mean_word_len"),
        sum("f_top_word_share"), sum("f_no_stopword"),
        sum("f_distinct_ratio"))
      .collect()(0)
    val report = operators.TextOps.gopherRules(docs, "doc_id", "text",
        Seq("the", "a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sums.getLong(0) == report("r1_word_count"))
    assert(sums.getLong(1) == report("r2_mean_word_len"))
    assert(sums.getLong(2) == report("r3_top_word_share"))
    assert(sums.getLong(3) == report("r4_has_stopword"))
    assert(sums.getLong(4) == report("r5_distinct_ratio"))
  }

  test("packingAdvisor: hand-walked bins per budget, and agreement " +
    "with packSequences at the same budget") {
    val docs = Seq(
      ("g", 1L, "a b c d e"),      // 5 tokens, before 0  -> bin 0 @6
      ("g", 2L, "a b c d"),        // 4 tokens, before 5  -> bin 0
      ("g", 3L, "a b c"),          // 3 tokens, before 9  -> bin 1
      ("g", 4L, "a b")             // 2 tokens, before 12 -> bin 2
    ).toDF("source", "doc_id", "text")
    val got = operators.TextOps.packingAdvisor(docs, "source", "doc_id",
        "text", Seq(6L, 100L))
      .orderBy("budget").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got(6L) == ((3L, 4L, 14L, 0.777778)), s"b=6 was ${got(6L)}")
    assert(got(100L) == ((1L, 4L, 14L, 0.14)), s"b=100 was ${got(100L)}")
    // the advisor's per-budget totals must equal packSequences' own
    val ps = operators.TextOps.packSequences(docs, "source", "doc_id",
        "text", 6L)
      .agg(count(lit(1)), sum("n_docs"), sum("n_tokens"))
      .collect()(0)
    assert((ps.getLong(0), ps.getLong(1), ps.getLong(2)) == ((3L, 4L, 14L)))
  }

  test("labelAgreement: clean clusters score 1.0; one mislabeled " +
    "vector scores 0 and drags its neighbors to 2/3") {
    def cluster(base: Double, ids: Seq[Long], lbl: Int) =
      ids.map(i => (i, Seq(base, base, base, base + i * 1e-3), lbl))
    val clean = (cluster(1.0, Seq(1L, 2L, 3L, 4L), 1) ++
        cluster(-1.0, Seq(11L, 12L, 13L, 14L), 2))
      .toDF("vec_id", "embedding", "label")
    val a1 = operators.SimilarityOps.labelAgreement(
        clean, "vec_id", "embedding", "label", 3, 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(a1.size == 8 && a1.values.forall(_ == 1.0),
      s"clean clusters must agree fully: $a1")

    val noisy = (cluster(1.0, Seq(1L, 2L, 3L), 1) ++
        cluster(1.0, Seq(4L), 2) ++ // mislabeled member of cluster A
        cluster(-1.0, Seq(11L, 12L, 13L, 14L), 2))
      .toDF("vec_id", "embedding", "label")
    val a2 = operators.SimilarityOps.labelAgreement(
        noisy, "vec_id", "embedding", "label", 3, 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(a2(4L) == 0.0, "the mislabeled vector sees no same-label neighbor")
    for (id <- Seq(1L, 2L, 3L))
      assert(a2(id) == 0.666667, s"vec $id agreement ${a2(id)}")
    for (id <- Seq(11L, 12L, 13L, 14L))
      assert(a2(id) == 1.0, "the far cluster is untouched")
  }

  test("corpusDatasheet: hand-counted per-source volume, dup load, " +
    "and pass rate") {
    val passDoc = (1 to 39).map(i => f"alp$i%02d").mkString(" ") + " the"
    val docs = Seq(
      ("A", 1L, passDoc, "en"),
      ("A", 2L, "zipp zipp zipp zapp zopp", "en"),
      ("A", 3L, "zipp zipp zipp zapp zopp", "de"),
      ("B", 4L, "x", "en")
    ).toDF("source", "doc_id", "text", "lang")
    val got = operators.TextOps.corpusDatasheet(docs, "source", "doc_id",
        "text", "lang", Seq("the", "a"))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("A")
    assert(a.getLong(1) == 3L && a.getLong(2) == 50L &&
      a.getLong(3) == 285L, s"A volume was $a")
    assert(a.getAs[Long]("n_langs") == 2L, "A has 2 langs")
    assert(a.getAs[Double]("mean_tokens") == 16.67) // half-up 50/3
    assert(a.getAs[Long]("n_dup_docs") == 2L &&
      a.getAs[Double]("dup_rate") == 0.666667)
    assert(a.getAs[Double]("gopher_pass_rate") == 0.333333)
    val b = got("B")
    assert(b.getLong(1) == 1L && b.getAs[Long]("n_dup_docs") == 0L &&
      b.getAs[Double]("gopher_pass_rate") == 0.0)
  }

  test("gopherRules reports hand-counted violations per rule") {
    val docs = Seq(
      // 40 in-range words, mean len 5, no word > 20%, has 'the',
      // 40 distinct — passes everything
      (1L, (1 to 39).map(i => f"alp$i%02d").mkString(" ") + " the"),
      // 5 words (mean len 4 — r2 passes): fails r1 (count), r3
      // (share 3/5), r4 (no stopword)
      (2L, "zipp zipp zipp zapp zopp"),
      // 31 one-char words: fails r2 (mean len 1), r3 (all same),
      // r4, r5 (1 distinct)
      (3L, Seq.fill(31)("x").mkString(" "))
    ).toDF("doc_id", "text")
    val got = operators.TextOps.gopherRules(docs, "doc_id", "text",
        Seq("the", "a"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got("r1_word_count") == ((1L, 0.333333)))
    assert(got("r2_mean_word_len") == ((1L, 0.333333)))
    assert(got("r3_top_word_share") == ((2L, 0.666667)))
    assert(got("r4_has_stopword") == ((2L, 0.666667)))
    assert(got("r5_distinct_ratio") == ((1L, 0.333333)))
    assert(got("all_pass") == ((1L, 0.333333)))
  }
}

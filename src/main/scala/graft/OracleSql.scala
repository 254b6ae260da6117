package graft

import scala.collection.immutable.ListMap

/** DuckDB oracle SQL — one ANSI twin per SparkEntry query.
  *
  * Cross-engine determinism contract (SURVEY §7.3):
  *  - total ORDER BY with unique tiebreaker everywhere;
  *  - integer outputs are BIGINT (or INT) in BOTH engines — DuckDB's
  *    HUGEINT sums and INTEGER row_numbers are cast explicitly;
  *  - fractional literals are CAST(x AS DOUBLE) so DuckDB does the same
  *    IEEE-754 arithmetic as Spark instead of exact DECIMAL math;
  *  - hashes are md5 (identical bytes in any engine), never an
  *    engine-private hash function;
  *  - regexp_replace carries the 'g' flag (DuckDB default replaces only
  *    the first match; Spark replaces all);
  *  - NO raw array/map columns in declared query output: the driver's
  *    pandas-based compare sorts frames with sort_values, which raises
  *    "unhashable type: numpy.ndarray" on array cells. Stringify with
  *    array_join (Spark) / string_agg or array_to_string (DuckDB);
  *  - NO DECIMAL→DOUBLE casts on large sums in output: the conversion
  *    rounds differently per engine (1-ulp drift). Ship exact DECIMAL
  *    sums as CAST(... AS VARCHAR) — both engines render full scale
  *    identically (q108);
  *  - NO pow(): libm rounding diverges across engines. ln/log2/exp-free
  *    monotone rewrites (e.g. weighted-sample keys as ln(u)/w, q107)
  *    keep order-based operators portable; ln and log2 themselves match.
  */
object OracleSql {

  // 3-token shingle list, distinct, for docs with ≥3 tokens (DuckDB 1-based
  // list indexing).
  private val shinglesCte =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT DISTINCT doc_id, s FROM
      |  (SELECT doc_id, unnest(list_transform(range(len(t) - 2),
      |     i -> t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3])) AS s
      |   FROM toks WHERE len(t) >= 3))""".stripMargin

  // One-permutation MinHash: hash (b,r) = 4-hex-char slice (b*rows+r) of
  // a single md5 per shingle (mirrors DedupOps.minhashSignature).
  private def minhashSig(bands: Int, rows: Int): String = {
    val aggs = (for (b <- 0 until bands; r <- 0 until rows)
      yield s"min(substr(md5(s), ${(b * rows + r) * 4 + 1}, 4)) AS h_${b}_$r").mkString(", ")
    s"sig AS (SELECT doc_id, $aggs FROM sh GROUP BY doc_id)"
  }

  /** Hilbert xy→d bit walk as a chain of star-REPLACE CTEs (h0..h{bits-1});
    * expects the FROM source to carry x, y and d = 0 (plus untouched
    * copies of any columns the final SELECT needs). Mirrors
    * LayoutOps.hilbertKey level by level.
    */
  private def hilbertCte(bits: Int, from: String): String = {
    val n1 = (1L << bits) - 1
    (bits - 1 to 0 by -1).zipWithIndex.map { case (i, idx) =>
      val s = 1L << i
      val prev = if (idx == 0) from else s"h${idx - 1}"
      s"""h$idx AS (SELECT * REPLACE (
         |  d + ${s * s} * xor(3 * ((x >> $i) & 1), (y >> $i) & 1) AS d,
         |  CASE WHEN ((y >> $i) & 1) = 0 THEN CASE WHEN ((x >> $i) & 1) = 1
         |    THEN $n1 - y ELSE y END ELSE x END AS x,
         |  CASE WHEN ((y >> $i) & 1) = 0 THEN CASE WHEN ((x >> $i) & 1) = 1
         |    THEN $n1 - x ELSE x END ELSE y END AS y) FROM $prev)"""
        .stripMargin
    }.mkString(",\n")
  }

  private def minhashPairs(bands: Int, rows: Int): String =
    (0 until bands).map { b =>
      val on = (0 until rows).map(r => s"a.h_${b}_$r = b.h_${b}_$r").mkString(" AND ")
      s"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM sig a JOIN sig b ON $on AND a.doc_id < b.doc_id"
    }.mkString(" UNION ")

  private val simhashVotes = (0 until 32).map(i =>
    s"sum(tf * (CASE WHEN ((hv >> $i) & 1) = 1 THEN 1 ELSE -1 END)) AS v_$i").mkString(", ")
  private val simhashBits = (0 until 32).map(i =>
    s"(CASE WHEN v_$i > 0 THEN ${1L << i} ELSE 0 END)").mkString(" + ")

  // Shared SimHash signature CTE chain: tok → votes → sg(doc_id, simhash).
  private val simhashCte =
    s"""tok AS (SELECT doc_id, tok, count(*) AS tf,
       |  ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hv FROM
       |  (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
       |  GROUP BY doc_id, tok),
       |v AS (SELECT doc_id, $simhashVotes FROM tok GROUP BY doc_id),
       |sg AS (SELECT doc_id, CAST($simhashBits AS BIGINT) AS simhash FROM v)""".stripMargin

  /** Shared flagship CTE chain (q432/q435): labeled log -> term/seen
    * profiles -> term + multi-probe kNN recall channels (ppm ints) ->
    * hybrid union -> serving-snapshot rank -> `resp(user_id, item,
    * rank_ppm, score, rn)` top-3 response. The events SOURCE is
    * pluggable so q435 can feed the last-event-held-out history.
    */
  private def flagshipCtes(evSrc: String): String =
    s"""ev AS (SELECT user_id, event_type, value, ts, event_id,
      |    CASE WHEN value > 100 THEN 1 ELSE 0 END AS label
      |  FROM ($evSrc) __src),
      |t AS (SELECT user_id, list(event_type ORDER BY event_type) AS terms
      |  FROM (SELECT user_id, event_type FROM ev
      |        GROUP BY user_id, event_type HAVING count(*) >= 3)
      |  GROUP BY user_id),
      |sn AS (SELECT user_id, list(et ORDER BY et) AS seen FROM
      |  (SELECT DISTINCT user_id, event_type AS et FROM ev
      |   WHERE value > 150) GROUP BY user_id),
      |u AS (SELECT t.user_id, t.terms, coalesce(sn.seen, []) AS seen
      |  FROM t LEFT JOIN sn ON t.user_id = sn.user_id),
      |i AS (SELECT item, [item] AS terms FROM
      |  (SELECT DISTINCT event_type AS item FROM ev)),
      |ctc AS (SELECT u.user_id, i.item,
      |    CAST(round(CAST(len(list_intersect(u.terms, i.terms))
      |      AS DOUBLE) * CAST(0.1 AS DOUBLE) * 1000000) AS BIGINT)
      |      AS score
      |  FROM u JOIN i ON len(list_intersect(u.terms, i.terms)) > 0
      |  WHERE NOT list_contains(u.seen, i.item)),
      |ct AS (SELECT user_id, item, score FROM
      |  (SELECT *, row_number() OVER (PARTITION BY user_id
      |     ORDER BY score DESC, item) AS rn FROM ctc) WHERE rn <= 200),
      |uv AS (SELECT vec_id AS user_id, embedding::DOUBLE[] AS uemb
      |  FROM embeddings),
      |cl AS (SELECT DISTINCT user_id, event_type AS item FROM ev
      |  WHERE label = 1),
      |pc AS (SELECT cl.item,
      |    CAST(generate_subscripts(uv.uemb, 1) - 1 AS INT) AS dim,
      |    unnest(uv.uemb) AS v
      |  FROM cl JOIN uv ON cl.user_id = uv.user_id),
      |pm AS (SELECT item, dim,
      |    round(sum(round(v, 12)::DECIMAL(38,12))::DOUBLE
      |      / count(*), 6) AS c
      |  FROM pc GROUP BY item, dim),
      |pr AS (SELECT item, list(c ORDER BY dim) AS pemb FROM pm
      |  GROUP BY item),
      |prb AS (SELECT item, pemb,
      |    sqrt(list_dot_product(pemb, pemb)) AS pnrm,
      |    CAST(pemb[1] > 0 AS INT) + CAST(pemb[2] > 0 AS INT) * 2
      |      + CAST(pemb[3] > 0 AS INT) * 4
      |      + CAST(pemb[4] > 0 AS INT) * 8 AS bucket
      |  FROM pr),
      |us0 AS (SELECT uv.user_id, uv.uemb,
      |    sqrt(list_dot_product(uv.uemb, uv.uemb)) AS unrm,
      |    coalesce(sn.seen, []) AS seen,
      |    CAST(uemb[1] > 0 AS INT) + CAST(uemb[2] > 0 AS INT) * 2
      |      + CAST(uemb[3] > 0 AS INT) * 4
      |      + CAST(uemb[4] > 0 AS INT) * 8 AS b
      |  FROM uv JOIN (SELECT DISTINCT user_id FROM ev) e
      |    ON uv.user_id = e.user_id
      |  LEFT JOIN sn ON sn.user_id = uv.user_id),
      |us AS (SELECT user_id, uemb, unrm, seen,
      |    unnest([b, xor(b, 1), xor(b, 2), xor(b, 4), xor(b, 8)])
      |      AS bucket
      |  FROM us0),
      |ck0 AS (SELECT us.user_id, prb.item,
      |    round(list_dot_product(us.uemb, prb.pemb)
      |      / (us.unrm * prb.pnrm), 6) AS sim
      |  FROM us JOIN prb ON us.bucket = prb.bucket
      |  WHERE us.unrm > 0 AND prb.pnrm > 0
      |    AND NOT list_contains(us.seen, prb.item)),
      |ckc AS (SELECT user_id, item,
      |    (CAST(round(sim * 1000000) AS BIGINT) * 9 + 5) // 10
      |      AS score
      |  FROM ck0 WHERE sim > 0),
      |ck AS (SELECT user_id, item, score FROM
      |  (SELECT *, row_number() OVER (PARTITION BY user_id
      |     ORDER BY score DESC, item) AS rn FROM ckc) WHERE rn <= 200),
      |mg AS (SELECT user_id, item, CAST(sum(score) AS BIGINT) AS score
      |  FROM (SELECT * FROM ct UNION ALL SELECT * FROM ck)
      |  GROUP BY user_id, item),
      |r AS (SELECT user_id, event_type AS item, label,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS rn,
      |    count(*) OVER (PARTITION BY user_id) AS mx
      |  FROM ev),
      |sp AS (SELECT user_id, item,
      |    CAST((sum(label) * 2000000 + count(*)) // (2 * count(*))
      |      AS BIGINT) AS rank_ppm
      |  FROM r WHERE rn > mx - 10 GROUP BY user_id, item),
      |fin AS (SELECT mg.user_id, mg.item, mg.score,
      |    coalesce(sp.rank_ppm, 0) AS rank_ppm
      |  FROM mg LEFT JOIN sp ON sp.user_id = mg.user_id
      |    AND sp.item = mg.item),
      |resp AS (SELECT user_id, item, rank_ppm, score, rn FROM
      |  (SELECT *, row_number() OVER (PARTITION BY user_id
      |     ORDER BY rank_ppm DESC, score DESC, item) AS rn FROM fin)
      |  WHERE rn <= 3)""".stripMargin


  private def profileList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ", ", "]")

  /** q440/q441 shared trainer: exact-integer IVF Lloyd on
    * ppm-quantized embeddings — md5-ranked seeds (kCent from the same
    * count-stepped width schedule, kc = 2^(bits/2+1)), two unrolled
    * rounds of assign (argmin of BIGINT squared-L2, (d, cid) tiebreak)
    * + update (HUGEINT sums, exact floor-division means — the
    * `(s − ((s % c + c) % c)) // c` form, since DuckDB `//` floors
    * while Spark DIV truncates and only exact division agrees), then
    * the final assignment a3 over the trained codebook c2.
    */
  private def ivfBaseCtes(
      kkSql: String = "CAST(1 << (bits // 2 + 1) AS BIGINT)"): String =
    s"""e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS emb,
       |    list_transform(embedding::DOUBLE[],
       |      x -> CAST(round(x * 1000000) AS BIGINT)) AS qemb
       |  FROM embeddings),
       |bb AS (SELECT 4 + (CASE WHEN count(*) >= 1000 THEN 2 ELSE 0 END)
       |    + (CASE WHEN count(*) >= 4000 THEN 2 ELSE 0 END)
       |    + (CASE WHEN count(*) >= 16000 THEN 2 ELSE 0 END)
       |    + (CASE WHEN count(*) >= 64000 THEN 2 ELSE 0 END)
       |    + (CASE WHEN count(*) >= 256000 THEN 2 ELSE 0 END)
       |    + (CASE WHEN count(*) >= 1024000 THEN 2 ELSE 0 END) AS bits
       |  FROM e),
       |kk AS (SELECT $kkSql AS kc FROM bb),
       |rng AS (SELECT unnest(range(64)) AS i)""".stripMargin

  /** The two-round exact-integer Lloyd chain (seeds → d1/a1/m1/c1 →
    * d2/a2/m2/c2 → d3/a3) over training source `$src` — `$src` aliased
    * as `e` inside each CTE so the body is identical whether training
    * sweeps the full corpus (q450's dev-slice audit, src = e) or the
    * md5-sampled slice (q440/q444, src = tr).
    */
  private def ivfLloydCtes(src: String): String = ivfLloydCtes(src, src)

  /** [[ivfLloydCtes]] with the FINAL assignment's sweep source split
    * from the training source: the Lloyd rounds (seeds, d1..c2) read
    * `$src` while d3/a3 read `$asrc` — the q444 shape, where the
    * codebook trains on the sampled slice but every corpus vector
    * still gets its home cell. `sfx` suffixes every chain-internal CTE
    * name (and `kk` names the cell-count CTE) so several chains
    * coexist in one WITH list (q452's dial sweep).
    */
  private def ivfLloydCtes(src: String, asrc: String, sfx: String = "",
                           kk: String = "kk"): String =
    s"""hh$sfx AS (SELECT id, qemb,
       |    ('0x' || substr(md5(id::VARCHAR), 1, 8))::BIGINT AS u FROM $src),
       |seeds$sfx AS (SELECT id AS cid, qemb AS cemb FROM
       |    (SELECT id, qemb, row_number() OVER (ORDER BY u, id) AS rn
       |     FROM hh$sfx)
       |    CROSS JOIN $kk WHERE rn <= kc),
       |d1$sfx AS (SELECT e.id, s.cid,
       |    list_sum(list_transform(range(64), i ->
       |      (e.qemb[i + 1] - s.cemb[i + 1])
       |      * (e.qemb[i + 1] - s.cemb[i + 1]))) AS d
       |  FROM $src e CROSS JOIN seeds$sfx s),
       |a1$sfx AS (SELECT id, cid FROM (SELECT id, cid,
       |    row_number() OVER (PARTITION BY id ORDER BY d, cid) AS rn
       |  FROM d1$sfx) WHERE rn = 1),
       |m1$sfx AS (SELECT a1.cid, r.i AS dim, sum(e.qemb[r.i + 1]) AS s,
       |    count(*) AS c
       |  FROM a1$sfx a1 JOIN $src e USING (id) CROSS JOIN rng r GROUP BY a1.cid, r.i),
       |c1$sfx AS (SELECT cid, list(CAST((s - (((s % c) + c) % c)) // c
       |    AS BIGINT) ORDER BY dim) AS cemb FROM m1$sfx GROUP BY cid),
       |d2$sfx AS (SELECT e.id, s.cid,
       |    list_sum(list_transform(range(64), i ->
       |      (e.qemb[i + 1] - s.cemb[i + 1])
       |      * (e.qemb[i + 1] - s.cemb[i + 1]))) AS d
       |  FROM $src e CROSS JOIN c1$sfx s),
       |a2$sfx AS (SELECT id, cid FROM (SELECT id, cid,
       |    row_number() OVER (PARTITION BY id ORDER BY d, cid) AS rn
       |  FROM d2$sfx) WHERE rn = 1),
       |m2$sfx AS (SELECT a2.cid, r.i AS dim, sum(e.qemb[r.i + 1]) AS s,
       |    count(*) AS c
       |  FROM a2$sfx a2 JOIN $src e USING (id) CROSS JOIN rng r GROUP BY a2.cid, r.i),
       |c2$sfx AS (SELECT cid, list(CAST((s - (((s % c) + c) % c)) // c
       |    AS BIGINT) ORDER BY dim) AS cemb FROM m2$sfx GROUP BY cid),
       |d3$sfx AS (SELECT e.id, s.cid,
       |    list_sum(list_transform(range(64), i ->
       |      (e.qemb[i + 1] - s.cemb[i + 1])
       |      * (e.qemb[i + 1] - s.cemb[i + 1]))) AS d
       |  FROM $asrc e CROSS JOIN c2$sfx s),
       |a3$sfx AS (SELECT id, cid FROM (SELECT id, cid,
       |    row_number() OVER (PARTITION BY id ORDER BY d, cid) AS rn
       |  FROM d3$sfx) WHERE rn = 1)""".stripMargin

  /** The q440/q444 md5-sampled training slice: mod =
    * greatest(1, n // (kc·32)) mirrors SimilarityOps.ivfSampleMod.
    */
  private val ivfTrCtes =
    """mm AS (SELECT greatest(1, (SELECT count(*) FROM e) // (kc * 32))
      |    AS m FROM kk),
      |tr AS (SELECT e.* FROM e CROSS JOIN mm
      |  WHERE ('0x' || substr(md5(id::VARCHAR), 1, 8))::BIGINT % mm.m
      |    = 0)""".stripMargin

  /** md5-sampled training slice (q440): the whole Lloyd chain AND the
    * census assignment run over `tr`.
    */
  private val ivfCtesSampled =
    ivfBaseCtes() + ",\n" + ivfTrCtes + ",\n" + ivfLloydCtes("tr")

  /** q444's round-12 shape: the Lloyd rounds train on the sampled
    * slice `tr`, the FINAL d3/a3 home assignment sweeps the full
    * corpus `e` (every vector needs its home cell for the recall
    * candidates; only that one sweep plus the declared-quadratic
    * exact side still read everything).
    */
  private val ivfCtesTrainSampled =
    ivfBaseCtes() + ",\n" + ivfTrCtes + ",\n" + ivfLloydCtes("tr", "e")

  /** Sharded trained-IVF CTE chain (q441/q449): first-level
    * sign-shard partition (`sbitsSql` leading sign bits from the bb
    * count schedule), per-shard md5 seeds (`kcSql` per shard), two
    * exact-integer Lloyd rounds with shard-local assignment
    * (equi-join on shard, never a cross join), final assignment a3
    * and distance table d3 for the probe stage.
    */
  private def ivfShardedCtes(sbitsSql: String, kcSql: String): String =
    s"""e0 AS (SELECT vec_id AS id, embedding::DOUBLE[] AS emb,
       |    list_transform(embedding::DOUBLE[],
       |      x -> CAST(round(x * 1000000) AS BIGINT)) AS qemb
       |  FROM embeddings),
       |bb AS (SELECT 4 + (CASE WHEN count(*) >= 1000 THEN 2 ELSE 0 END)
       |    + (CASE WHEN count(*) >= 4000 THEN 2 ELSE 0 END)
       |    + (CASE WHEN count(*) >= 16000 THEN 2 ELSE 0 END)
       |    + (CASE WHEN count(*) >= 64000 THEN 2 ELSE 0 END)
       |    + (CASE WHEN count(*) >= 256000 THEN 2 ELSE 0 END)
       |    + (CASE WHEN count(*) >= 1024000 THEN 2 ELSE 0 END) AS bits
       |  FROM e0),
       |ss AS (SELECT $sbitsSql AS s FROM bb),
       |kk AS (SELECT $kcSql AS kc FROM bb),
       |e AS (SELECT id, emb, qemb,
       |    CAST(list_sum(list_transform(range(s), j ->
       |      CASE WHEN emb[j + 1] > 0 THEN 1 << j ELSE 0 END)) AS INT)
       |      AS shard
       |  FROM e0 CROSS JOIN ss),
       |hh AS (SELECT id, shard, qemb,
       |    ('0x' || substr(md5(id::VARCHAR), 1, 8))::BIGINT AS u FROM e),
       |seeds AS (SELECT shard, id AS cid, qemb AS cemb FROM
       |    (SELECT shard, id, qemb, row_number() OVER (PARTITION BY shard
       |       ORDER BY u, id) AS rn FROM hh)
       |    CROSS JOIN kk WHERE rn <= kc),
       |d1 AS (SELECT e.id, s.cid,
       |    list_sum(list_transform(range(64), i ->
       |      (e.qemb[i + 1] - s.cemb[i + 1])
       |      * (e.qemb[i + 1] - s.cemb[i + 1]))) AS d
       |  FROM e JOIN seeds s ON e.shard = s.shard),
       |a1 AS (SELECT id, cid FROM (SELECT id, cid,
       |    row_number() OVER (PARTITION BY id ORDER BY d, cid) AS rn
       |  FROM d1) z WHERE rn = 1),
       |m1 AS (SELECT a1.cid, min(e.shard) AS shard, r.i AS dim,
       |    sum(e.qemb[r.i + 1]) AS s, count(*) AS c
       |  FROM a1 JOIN e USING (id)
       |  CROSS JOIN (SELECT unnest(range(64)) AS i) r GROUP BY a1.cid, r.i),
       |c1 AS (SELECT cid, min(shard) AS shard,
       |    list(CAST((s - (((s % c) + c) % c)) // c AS BIGINT)
       |      ORDER BY dim) AS cemb FROM m1 GROUP BY cid),
       |d2 AS (SELECT e.id, s.cid,
       |    list_sum(list_transform(range(64), i ->
       |      (e.qemb[i + 1] - s.cemb[i + 1])
       |      * (e.qemb[i + 1] - s.cemb[i + 1]))) AS d
       |  FROM e JOIN c1 s ON e.shard = s.shard),
       |a2 AS (SELECT id, cid FROM (SELECT id, cid,
       |    row_number() OVER (PARTITION BY id ORDER BY d, cid) AS rn
       |  FROM d2) z WHERE rn = 1),
       |m2 AS (SELECT a2.cid, min(e.shard) AS shard, r.i AS dim,
       |    sum(e.qemb[r.i + 1]) AS s, count(*) AS c
       |  FROM a2 JOIN e USING (id)
       |  CROSS JOIN (SELECT unnest(range(64)) AS i) r GROUP BY a2.cid, r.i),
       |c2 AS (SELECT cid, min(shard) AS shard,
       |    list(CAST((s - (((s % c) + c) % c)) // c AS BIGINT)
       |      ORDER BY dim) AS cemb FROM m2 GROUP BY cid),
       |d3 AS (SELECT e.id, s.cid,
       |    list_sum(list_transform(range(64), i ->
       |      (e.qemb[i + 1] - s.cemb[i + 1])
       |      * (e.qemb[i + 1] - s.cemb[i + 1]))) AS d
       |  FROM e JOIN c2 s ON e.shard = s.shard),
       |a3 AS (SELECT id, cid FROM (SELECT id, cid,
       |    row_number() OVER (PARTITION BY id ORDER BY d, cid) AS rn
       |  FROM d3) z WHERE rn = 1)""".stripMargin

  /** The shard-local ANN tail over [[ivfShardedCtes]]: probe the
    * `nprobe` nearest own-shard cells, exact cosine within, top-k.
    * `qWhere` (e.g. " WHERE <cond>") restricts the PROBING side to a
    * query sample — the q453 serving twin's request stream — while the
    * index side (a3) stays the full corpus.
    */
  private def ivfShardedAnnTail(nprobe: Int, k: Int,
                                qWhere: String = ""): String =
    s"""n AS (SELECT id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM e),
       |pr AS (SELECT id, cid FROM (SELECT id, cid,
       |    row_number() OVER (PARTITION BY id ORDER BY d, cid) AS rn
       |  FROM d3$qWhere) z WHERE rn <= $nprobe),
       |p AS (SELECT pr.id AS vec_id, a3.id AS neighbor_id,
       |    list_dot_product(na.emb, nb.emb) / (na.nrm * nb.nrm) AS sim
       |  FROM pr JOIN a3 ON pr.cid = a3.cid AND pr.id <> a3.id
       |  JOIN n na ON na.id = pr.id JOIN n nb ON nb.id = a3.id),
       |r AS (SELECT vec_id, neighbor_id, sim,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY sim DESC, neighbor_id) AS rn FROM p)
       |SELECT vec_id, neighbor_id, round(sim, 6) AS sim FROM r
       |WHERE rn <= $k ORDER BY vec_id, neighbor_id""".stripMargin

  /** One shard LEVEL of the q452 dial sweep: the sign-shard partition
    * at `sbitsSql` bits plus its md5-draw table, every name suffixed
    * so two levels coexist in one WITH list (e0/bb/rng are shared).
    */
  private def ivfShardLevelSfx(sbitsSql: String, sfx: String): String =
    s"""ss$sfx AS (SELECT $sbitsSql AS s FROM bb),
       |e$sfx AS (SELECT id, emb, qemb,
       |    CAST(list_sum(list_transform(range(s), j ->
       |      CASE WHEN emb[j + 1] > 0 THEN 1 << j ELSE 0 END)) AS INT)
       |      AS shard
       |  FROM e0 CROSS JOIN ss$sfx),
       |hh$sfx AS (SELECT id, shard, qemb,
       |    ('0x' || substr(md5(id::VARCHAR), 1, 8))::BIGINT AS u
       |  FROM e$sfx)""".stripMargin

  /** One (shardBits level, kcPerShard) dial of the q452 sweep:
    * per-shard seeds + two shard-local exact-integer Lloyd rounds +
    * final assignment, over the level's pre-built sharded table —
    * kc inlined as a literal, every CTE suffixed.
    */
  private def ivfShardedLloydSfx(lvl: String, kc: Int,
                                 sfx: String): String =
    s"""seeds$sfx AS (SELECT shard, id AS cid, qemb AS cemb FROM
       |    (SELECT shard, id, qemb, row_number() OVER (PARTITION BY shard
       |       ORDER BY u, id) AS rn FROM hh$lvl) WHERE rn <= $kc),
       |d1$sfx AS (SELECT e.id, s.cid,
       |    list_sum(list_transform(range(64), i ->
       |      (e.qemb[i + 1] - s.cemb[i + 1])
       |      * (e.qemb[i + 1] - s.cemb[i + 1]))) AS d
       |  FROM e$lvl e JOIN seeds$sfx s ON e.shard = s.shard),
       |a1$sfx AS (SELECT id, cid FROM (SELECT id, cid,
       |    row_number() OVER (PARTITION BY id ORDER BY d, cid) AS rn
       |  FROM d1$sfx) z WHERE rn = 1),
       |m1$sfx AS (SELECT a1.cid, min(e.shard) AS shard, r.i AS dim,
       |    sum(e.qemb[r.i + 1]) AS s, count(*) AS c
       |  FROM a1$sfx a1 JOIN e$lvl e USING (id)
       |  CROSS JOIN rng r GROUP BY a1.cid, r.i),
       |c1$sfx AS (SELECT cid, min(shard) AS shard,
       |    list(CAST((s - (((s % c) + c) % c)) // c AS BIGINT)
       |      ORDER BY dim) AS cemb FROM m1$sfx GROUP BY cid),
       |d2$sfx AS (SELECT e.id, s.cid,
       |    list_sum(list_transform(range(64), i ->
       |      (e.qemb[i + 1] - s.cemb[i + 1])
       |      * (e.qemb[i + 1] - s.cemb[i + 1]))) AS d
       |  FROM e$lvl e JOIN c1$sfx s ON e.shard = s.shard),
       |a2$sfx AS (SELECT id, cid FROM (SELECT id, cid,
       |    row_number() OVER (PARTITION BY id ORDER BY d, cid) AS rn
       |  FROM d2$sfx) z WHERE rn = 1),
       |m2$sfx AS (SELECT a2.cid, min(e.shard) AS shard, r.i AS dim,
       |    sum(e.qemb[r.i + 1]) AS s, count(*) AS c
       |  FROM a2$sfx a2 JOIN e$lvl e USING (id)
       |  CROSS JOIN rng r GROUP BY a2.cid, r.i),
       |c2$sfx AS (SELECT cid, min(shard) AS shard,
       |    list(CAST((s - (((s % c) + c) % c)) // c AS BIGINT)
       |      ORDER BY dim) AS cemb FROM m2$sfx GROUP BY cid),
       |d3$sfx AS (SELECT e.id, s.cid,
       |    list_sum(list_transform(range(64), i ->
       |      (e.qemb[i + 1] - s.cemb[i + 1])
       |      * (e.qemb[i + 1] - s.cemb[i + 1]))) AS d
       |  FROM e$lvl e JOIN c2$sfx s ON e.shard = s.shard),
       |a3$sfx AS (SELECT id, cid FROM (SELECT id, cid,
       |    row_number() OVER (PARTITION BY id ORDER BY d, cid) AS rn
       |  FROM d3$sfx) z WHERE rn = 1)""".stripMargin

  /** One dial's measurement tail for q452: probe ranks from the
    * dial's d3, the distinct candidate-pair table, per-level top-k,
    * and the 3 output rows (layout, shard_bits, kc, nprobe,
    * n_candidates, n_hits) via the always-emitting unnest scaffold.
    */
  private def ivfDialRowsSfx(sfx: String, lvls: Seq[Int],
                             layoutSql: String, sbSql: String,
                             kcSql: String): String = {
    val maxNp = lvls.max
    val lvlList = lvls.mkString("[", ", ", "]")
    s"""pq$sfx AS (SELECT id AS vec_id, cid, rn AS pr FROM (
       |    SELECT id, cid,
       |      row_number() OVER (PARTITION BY id ORDER BY d, cid) AS rn
       |    FROM d3$sfx WHERE id % 20 = 0) z WHERE rn <= $maxNp),
       |cand$sfx AS (SELECT pq.vec_id, a3.id AS neighbor_id,
       |    min(pq.pr) AS pr,
       |    max(list_dot_product(na.emb, nb.emb) / (na.nrm * nb.nrm))
       |      AS sim
       |  FROM pq$sfx pq JOIN a3$sfx a3
       |    ON pq.cid = a3.cid AND pq.vec_id <> a3.id
       |  JOIN n na ON na.id = pq.vec_id JOIN n nb ON nb.id = a3.id
       |  GROUP BY 1, 2),
       |lv$sfx AS (SELECT l.lvl, vec_id, neighbor_id, sim FROM cand$sfx
       |  CROSS JOIN (SELECT unnest($lvlList) AS lvl) l
       |  WHERE pr <= l.lvl),
       |tk$sfx AS (SELECT lvl, vec_id, neighbor_id FROM (
       |    SELECT lvl, vec_id, neighbor_id,
       |      row_number() OVER (PARTITION BY lvl, vec_id
       |        ORDER BY sim DESC, neighbor_id) AS rn FROM lv$sfx) z
       |  WHERE rn <= 5),
       |row$sfx AS (SELECT $layoutSql AS layout,
       |    CAST($sbSql AS BIGINT) AS shard_bits,
       |    CAST($kcSql AS BIGINT) AS kc,
       |    CAST(l.lvl AS BIGINT) AS nprobe,
       |    (SELECT count(*) FROM cand$sfx WHERE pr <= l.lvl)
       |      AS n_candidates,
       |    (SELECT count(*) FROM tk$sfx t JOIN ex
       |      ON ex.vec_id = t.vec_id AND ex.neighbor_id = t.neighbor_id
       |      WHERE t.lvl = l.lvl) AS n_hits
       |  FROM (SELECT unnest($lvlList) AS lvl) l)""".stripMargin
  }

  /** One q446 ladder rung: the per-n keeper/island CTE chain (the
    * q443 machinery with `n` inlined and names suffixed so four rungs
    * coexist in one WITH list).
    */
  private def ladderRung(n: Int): String = {
    val gram = (1 to n).map(j => s"t[i + $j]").mkString(" || ' ' || ")
    s"""pos$n AS (SELECT doc_id, CAST(i AS INT) AS pos, $gram AS s
       |  FROM (SELECT doc_id, t, unnest(range(len(t) - ${n - 1})) AS i
       |        FROM base WHERE len(t) >= $n) z),
       |k$n AS (SELECT s, kid, kpos FROM (
       |    SELECT s, doc_id AS kid, pos AS kpos,
       |      count(*) OVER (PARTITION BY s) AS c,
       |      row_number() OVER (PARTITION BY s
       |        ORDER BY doc_id, pos) AS rn
       |    FROM pos$n) z WHERE c >= 2 AND rn = 1),
       |red$n AS (SELECT p.doc_id, p.pos FROM pos$n p JOIN k$n USING (s)
       |  WHERE NOT (p.doc_id = k$n.kid AND p.pos = k$n.kpos)),
       |isl$n AS (SELECT doc_id, pos,
       |    sum(CASE WHEN prev IS NULL OR pos - prev > ${n - 1}
       |        THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY pos) AS g
       |  FROM (SELECT doc_id, pos, lag(pos) OVER (PARTITION BY doc_id
       |      ORDER BY pos) AS prev FROM red$n) z),
       |exc$n AS (SELECT doc_id, g, max(pos) - min(pos) + $n AS cov
       |  FROM isl$n GROUP BY doc_id, g),
       |row$n AS (SELECT CAST($n AS BIGINT) AS n,
       |  (SELECT count(*) FROM k$n) AS n_dup_grams,
       |  (SELECT count(DISTINCT doc_id) FROM red$n) AS docs_affected,
       |  tt.tokens_total,
       |  coalesce((SELECT sum(cov) FROM exc$n), 0) AS tokens_excised
       |  FROM tt)""".stripMargin
  }

  val all: Map[String, String] = ListMap(
    "q01_scan_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
        |FROM lineitem WHERE l_quantity > 30 AND l_returnflag = 'A'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q02_label_encode" ->
      """SELECT event_id, CASE WHEN value > 100 THEN 1 ELSE 0 END AS label
        |FROM events ORDER BY event_id""".stripMargin,

    "q03_group_count" ->
      "SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id ORDER BY user_id",

    "q04_rownum_split" ->
      """WITH w AS (SELECT event_id, user_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn,
        |  count(*) OVER (PARTITION BY user_id) AS u_cnt FROM events)
        |SELECT event_id, rn,
        |  CASE WHEN rn >= u_cnt - 10 THEN 2
        |       WHEN rn < (u_cnt - 10) * CAST(0.8 AS DOUBLE) THEN 0
        |       ELSE 1 END AS istest,
        |  user_id * 1000000 + rn AS queryid
        |FROM w ORDER BY event_id""".stripMargin,

    "q05_collect_list_ordered" ->
      """SELECT user_id,
        |  string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY ts, event_id) AS event_ids
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q06_collect_set" ->
      """SELECT l_orderkey, string_agg(rf, ',' ORDER BY rf) AS flags
        |FROM (SELECT DISTINCT l_orderkey, l_returnflag AS rf FROM lineitem)
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,

    "q07_left_join" ->
      """SELECT o_orderkey, o_custkey, c_name, n_name
        |FROM orders
        |LEFT JOIN customer ON o_custkey = c_custkey
        |LEFT JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY o_orderkey""".stripMargin,

    "q08_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 200000)
        |ORDER BY c_custkey""".stripMargin,

    "q09_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q10_pit_window" ->
      """WITH l AS (SELECT event_id, user_id, ts,
        |  CASE WHEN value > 100 THEN 1 ELSE 0 END AS label FROM events)
        |SELECT event_id,
        |  count(*) OVER w AS pit_imp,
        |  CAST(coalesce(sum(label) OVER w, 0) AS BIGINT) AS pit_clk
        |FROM l
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
        |ORDER BY event_id""".stripMargin,

    "q11_user_snapshot" ->
      """WITH l AS (SELECT event_id, user_id, ts,
        |  CASE WHEN value > 100 THEN 1 ELSE 0 END AS label FROM events),
        |s AS (SELECT user_id,
        |  count(*) OVER w AS snap_imp,
        |  CAST(coalesce(sum(label) OVER w, 0) AS BIGINT) AS snap_clk,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rdesc
        |FROM l
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 10 PRECEDING AND CURRENT ROW))
        |SELECT user_id, snap_imp, snap_clk FROM s WHERE rdesc = 1
        |ORDER BY user_id""".stripMargin,

    "q12_multi_hot" -> {
      val flags = Seq("widget", "bolt", "rod", "gear", "small", "large")
        .map(v => s"CAST(list_contains(string_split(p_name, ' '), '$v') AS INT) AS has_$v")
        .mkString(", ")
      s"SELECT p_partkey, $flags FROM part ORDER BY p_partkey"
    },

    "q13_dict_encode" ->
      """SELECT c_custkey,
        |  CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 1 WHEN 'BUILDING' THEN 2
        |       WHEN 'FURNITURE' THEN 3 WHEN 'HOUSEHOLD' THEN 4
        |       WHEN 'MACHINERY' THEN 5 ELSE 0 END AS seg_code
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q14_zscore" ->
      """WITH s AS (SELECT
        |  CASE WHEN avg(l_extendedprice) IS NULL THEN CAST(0 AS DOUBLE)
        |       ELSE round(avg(l_extendedprice), 6) END AS m,
        |  CASE WHEN coalesce(round(stddev_samp(l_extendedprice), 6), 0) <= 0 THEN CAST(1 AS DOUBLE)
        |       ELSE round(stddev_samp(l_extendedprice), 6) END AS sd
        |  FROM lineitem WHERE l_returnflag <> 'R')
        |SELECT l_orderkey, l_linenumber,
        |  round((l_extendedprice - s.m) / s.sd, 4) + 0.0 AS z
        |FROM lineitem, s ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q15_const_prune" -> {
      val cols = Seq("l_linestatus", "l_quantity", "l_returnflag", "l_tax")
      cols.map(c =>
        s"SELECT '$c' AS col_name, count(DISTINCT $c) AS n_distinct, " +
          s"CAST(count(DISTINCT $c) > 1 AS INT) AS keep FROM lineitem")
        .mkString("", " UNION ALL ", " ORDER BY col_name")
    },

    "q16_topk_per_group" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM (
        |  SELECT l_orderkey, l_linenumber, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_extendedprice DESC, l_linenumber) AS rn
        |  FROM lineitem) WHERE rn <= 3
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q17_global_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,

    "q18_hybrid_union" ->
      """WITH a AS (SELECT o_custkey, CAST(count(*) AS DOUBLE) * CAST(0.1 AS DOUBLE) AS score
        |  FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey),
        |b AS (SELECT o_custkey, CAST(count(*) AS DOUBLE) * CAST(0.9 AS DOUBLE) AS score
        |  FROM orders WHERE o_totalprice > 150000 GROUP BY o_custkey),
        |u AS (SELECT * FROM a UNION ALL SELECT * FROM b)
        |SELECT o_custkey, round(sum(score), 4) AS score FROM u GROUP BY o_custkey
        |ORDER BY score DESC, o_custkey LIMIT 100""".stripMargin,

    "q19_mean_std_group" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(avg(l_quantity), 4) AS mean_qty,
        |  round(stddev_samp(l_quantity), 4) AS std_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q20_max_cardinality" ->
      """SELECT 'events.user_id' AS feat, CAST(max(user_id) + 1 AS BIGINT) AS cardinality FROM events
        |UNION ALL
        |SELECT 'customer.c_nationkey', CAST(max(c_nationkey) + 1 AS BIGINT) FROM customer
        |UNION ALL
        |SELECT 'lineitem.l_linenumber', CAST(max(l_linenumber) + 1 AS BIGINT) FROM lineitem
        |ORDER BY feat""".stripMargin,

    "q21_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "q22_sessionize" ->
      """WITH w AS (SELECT event_id, user_id, ts,
        |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |b AS (SELECT event_id, user_id, ts,
        |  CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS nb
        |  FROM w)
        |SELECT event_id, user_id,
        |  CAST(sum(nb) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |FROM b ORDER BY event_id""".stripMargin,

    "q23_token_tf" ->
      """SELECT token, count(*) AS tf FROM
        |  (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY token""".stripMargin,

    "q24_dedup_exact" ->
      """SELECT min(doc_id) AS canonical_id, count(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY canonical_id""".stripMargin,

    "q25_auc_sql" ->
      """WITH scored AS (SELECT event_id,
        |  CASE WHEN value > 100 THEN 1 ELSE 0 END AS label,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS score FROM events),
        |ranked AS (SELECT label,
        |  row_number() OVER (ORDER BY score, event_id) AS r FROM scored)
        |SELECT round(
        |  (CAST(sum(CASE WHEN label = 1 THEN r ELSE 0 END) AS DOUBLE)
        |     - CAST(sum(label) AS DOUBLE) * (sum(label) + 1) / 2)
        |  / (CAST(sum(label) AS DOUBLE) * (count(*) - sum(label))), 6) AS auc
        |FROM ranked""".stripMargin,

    "q26_cosine_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM e),
        |p AS (SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
        |  list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) AS sim
        |  FROM n a, n b WHERE a.vec_id <> b.vec_id),
        |r AS (SELECT vec_id, neighbor_id, sim,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id) AS rn
        |  FROM p)
        |SELECT vec_id, neighbor_id, round(sim, 6) AS sim FROM r WHERE rn <= 5
        |ORDER BY vec_id, neighbor_id""".stripMargin,

    "q27_minhash_neardup" ->
      s"""WITH $shinglesCte,
         |${minhashSig(4, 2)},
         |pairs AS (${minhashPairs(4, 2)})
         |SELECT doc_a, doc_b FROM pairs ORDER BY doc_a, doc_b""".stripMargin,

    "q28_simhash" ->
      s"""WITH $simhashCte
         |SELECT doc_id, simhash FROM sg ORDER BY doc_id""".stripMargin,

    "q29_lsh_jaccard" ->
      s"""WITH $shinglesCte,
         |szs AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |${minhashSig(4, 2)},
         |cand AS (${minhashPairs(4, 2)}),
         |com AS (SELECT c.doc_a, c.doc_b, count(*) AS c
         |  FROM cand c
         |  JOIN sh x ON x.doc_id = c.doc_a
         |  JOIN sh y ON y.doc_id = c.doc_b AND y.s = x.s
         |  GROUP BY c.doc_a, c.doc_b)
         |SELECT com.doc_a, com.doc_b,
         |  round(CAST(com.c AS DOUBLE) / (sa.n + sb.n - com.c), 6) AS jaccard
         |FROM com
         |JOIN szs sa ON sa.doc_id = com.doc_a
         |JOIN szs sb ON sb.doc_id = com.doc_b
         |ORDER BY com.doc_a, com.doc_b""".stripMargin,

    "q30_langid" -> {
      val profs = Map(
        "sql" -> Seq("join", "filter", "group", "query", "sort", "agg"),
        "infra" -> Seq("spark", "stream", "batch", "hash", "merge", "scan"),
        "data" -> Seq("data", "row", "column", "table", "value", "vector"))
      val scores = Seq("sql", "infra", "data").map(p =>
        s"CAST(len(list_filter(tk, x -> list_contains(${profileList(profs(p))}, x))) AS BIGINT) AS score_$p")
        .mkString(", ")
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
         |sc AS (SELECT doc_id, $scores FROM t)
         |SELECT doc_id, score_sql, score_infra, score_data,
         |  CASE WHEN score_sql >= score_infra AND score_sql >= score_data THEN 'sql'
         |       WHEN score_infra >= score_data THEN 'infra'
         |       ELSE 'data' END AS lang_pred
         |FROM sc ORDER BY doc_id""".stripMargin
    },

    "q31_quality" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |m AS (SELECT doc_id,
        |  CAST(len(tk) AS BIGINT) AS n_tokens,
        |  round(CAST(len(list_filter(tk, x -> list_contains(['the', 'a'], x))) AS DOUBLE)
        |    / CAST(len(tk) AS DOUBLE), 4) AS stop_ratio
        |  FROM t)
        |SELECT doc_id, n_tokens, stop_ratio,
        |  round(least(CAST(1.0 AS DOUBLE), CAST(n_tokens AS DOUBLE) / CAST(100.0 AS DOUBLE))
        |    * (CAST(1.0 AS DOUBLE) - stop_ratio), 4) AS quality
        |FROM m ORDER BY doc_id""".stripMargin,

    "q32_token_stats" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
        |  CAST(len(regexp_extract_all(text, '[a-z0-9]+', 0)) AS BIGINT) AS n_word_tokens,
        |  CAST(ceil(CAST(length(text) AS DOUBLE) / CAST(4.0 AS DOUBLE)) AS BIGINT) AS bpe_est
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q33_fingerprint" ->
      """SELECT doc_id,
        |  md5(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q47_text_normalize" ->
      """WITH t AS (SELECT doc_id,
        |  string_split(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' ') AS tk
        |  FROM documents)
        |SELECT doc_id,
        |  array_to_string(list_filter(tk, x -> NOT list_contains(['the', 'a'], x)), ' ') AS clean_text,
        |  CAST(len(list_filter(tk, x -> list_contains(['the', 'a'], x))) AS BIGINT) AS n_removed
        |FROM t ORDER BY doc_id""".stripMargin,

    "q60_embedding_neardup_bucketed" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm,
        |  CAST(emb[1] > 0 AS INT) * 1 + CAST(emb[2] > 0 AS INT) * 2
        |    + CAST(emb[3] > 0 AS INT) * 4 + CAST(emb[4] > 0 AS INT) * 8 AS bucket
        |  FROM e),
        |p AS (SELECT vec_id, emb, nrm,
        |  unnest([bucket, xor(bucket, 1), xor(bucket, 2), xor(bucket, 4),
        |          xor(bucket, 8)]) AS bucket
        |  FROM n)
        |SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 6) AS sim
        |FROM p a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        |WHERE list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) > CAST(0.35 AS DOUBLE)
        |ORDER BY id_a, id_b""".stripMargin,

    "q35_ann_ivf" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm,
        |  CAST(emb[1] > 0 AS INT) * 1 + CAST(emb[2] > 0 AS INT) * 2
        |    + CAST(emb[3] > 0 AS INT) * 4 + CAST(emb[4] > 0 AS INT) * 8 AS bucket
        |  FROM e),
        |p AS (SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
        |  list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) AS sim
        |  FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
        |r AS (SELECT vec_id, neighbor_id, sim,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id) AS rn
        |  FROM p)
        |SELECT vec_id, neighbor_id, round(sim, 6) AS sim FROM r WHERE rn <= 3
        |ORDER BY vec_id, neighbor_id""".stripMargin,

    "q36_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS content_md5,
        |  ascii(substr(text, 1, 1)) AS first_byte,
        |  round(CAST(ascii(substr(text, 1, 1)) AS DOUBLE) / CAST(255.0 AS DOUBLE), 6) AS fake_feature
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q37_serving_snapshot" ->
      """WITH f AS (SELECT user_id, count(*) AS n_seen FROM events GROUP BY user_id),
        |t AS (SELECT user_id,
        |  array_to_string(list(event_type ORDER BY event_type), ',') AS term_str
        |  FROM (SELECT user_id, event_type FROM events
        |        GROUP BY user_id, event_type HAVING count(*) >= 3)
        |  GROUP BY user_id)
        |SELECT c_custkey AS user_id,
        |  coalesce(t.term_str, '') AS term_str,
        |  CAST(coalesce(f.n_seen, 0) AS BIGINT) AS n_seen
        |FROM customer
        |LEFT JOIN f ON f.user_id = c_custkey
        |LEFT JOIN t ON t.user_id = c_custkey
        |WHERE c_custkey < 200 ORDER BY user_id""".stripMargin,

    "q39_pit_term_window" ->
      """WITH r AS (SELECT event_id, user_id, ts,
        |  CASE WHEN value > 100 THEN 1 ELSE 0 END AS label,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, event_type
        |  FROM events),
        |rr AS (SELECT event_id, user_id, label, k, event_type,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn
        |  FROM r),
        |e AS (SELECT event_id, user_id, rn, label,
        |  unnest([event_type, 'k' || (k % 3)]) AS term FROM rr)
        |SELECT event_id, term,
        |  count(*) OVER w AS term_imp,
        |  CAST(coalesce(sum(label) OVER w, 0) AS BIGINT) AS term_clk
        |FROM e
        |WINDOW w AS (PARTITION BY user_id, term ORDER BY rn
        |             RANGE BETWEEN 10 PRECEDING AND 1 PRECEDING)
        |ORDER BY event_id, term""".stripMargin,

    "q40_user_term_snapshot" ->
      """WITH r AS (SELECT event_id, user_id, ts,
        |  CASE WHEN value > 100 THEN 1 ELSE 0 END AS label,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, event_type
        |  FROM events),
        |rr AS (SELECT event_id, user_id, label, k, event_type,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn,
        |  count(*) OVER (PARTITION BY user_id) AS u_cnt
        |  FROM r),
        |e AS (SELECT user_id, label,
        |  unnest([event_type, 'k' || (k % 3)]) AS term
        |  FROM rr WHERE rn >= u_cnt - 11),
        |t AS (SELECT user_id, term, sum(label) AS term_clk
        |  FROM e GROUP BY user_id, term HAVING sum(label) >= 2)
        |SELECT user_id, string_agg(term, ',' ORDER BY term) AS terms FROM t
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q46_time_range_window" ->
      """WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS tsu,
        |  CASE WHEN value > 100 THEN 1 ELSE 0 END AS label FROM events)
        |SELECT event_id,
        |  count(*) OVER w AS hour_imp,
        |  CAST(coalesce(sum(label) OVER w, 0) AS BIGINT) AS hour_clk
        |FROM l
        |WINDOW w AS (PARTITION BY user_id ORDER BY tsu
        |             RANGE BETWEEN 3600000000 PRECEDING AND 1 PRECEDING)
        |ORDER BY event_id""".stripMargin,

    "q44_term_recall" ->
      """WITH t AS (SELECT user_id,
        |  list(event_type ORDER BY event_type) AS terms
        |  FROM (SELECT user_id, event_type FROM events
        |        GROUP BY user_id, event_type HAVING count(*) >= 3)
        |  GROUP BY user_id),
        |sn AS (SELECT user_id, list(et ORDER BY et) AS seen FROM
        |  (SELECT DISTINCT user_id, event_type AS et FROM events WHERE value > 150)
        |  GROUP BY user_id),
        |u AS (SELECT t.user_id, t.terms, coalesce(sn.seen, []) AS seen
        |  FROM t LEFT JOIN sn ON t.user_id = sn.user_id),
        |i AS (SELECT item, [item] AS terms FROM
        |  (SELECT unnest(['click', 'error', 'purchase', 'signup', 'view']) AS item)),
        |cand AS (SELECT u.user_id, i.item,
        |  CAST(len(list_intersect(u.terms, i.terms)) AS DOUBLE)
        |    * CAST(0.1 AS DOUBLE) AS score
        |  FROM u JOIN i ON len(list_intersect(u.terms, i.terms)) > 0
        |  WHERE NOT list_contains(u.seen, i.item)),
        |r AS (SELECT user_id, item, score,
        |  row_number() OVER (PARTITION BY user_id ORDER BY score DESC, item) AS rn
        |  FROM cand)
        |SELECT user_id, item, round(score, 4) AS score FROM r WHERE rn <= 2
        |ORDER BY user_id, item""".stripMargin,

    "q45_pit_feature_grid" ->
      """WITH r AS (SELECT event_id, user_id, ts,
        |  CASE WHEN value > 100 THEN 1 ELSE 0 END AS label,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, event_type
        |  FROM events),
        |rr AS (SELECT event_id, user_id, label, event_type,
        |  'k' || (k % 3) AS kterm,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn
        |  FROM r WHERE user_id < 30),
        |v AS (SELECT unnest(['click', 'error', 'purchase', 'signup', 'view',
        |                     'k0', 'k1', 'k2']) AS term),
        |g AS (SELECT rr.event_id, rr.user_id, rr.rn, rr.label, v.term,
        |  CASE WHEN v.term = rr.event_type OR v.term = rr.kterm THEN 1 ELSE 0 END AS occ
        |  FROM rr CROSS JOIN v)
        |SELECT event_id, term,
        |  CAST(coalesce(sum(occ) OVER w, 0) AS BIGINT) AS term_imp,
        |  CAST(coalesce(sum(occ * label) OVER w, 0) AS BIGINT) AS term_clk
        |FROM g
        |WINDOW w AS (PARTITION BY user_id, term ORDER BY rn
        |             ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
        |ORDER BY event_id, term""".stripMargin,

    "q48_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  CAST(grouping(l_returnflag) AS INT) AS g1,
        |  CAST(grouping(l_linestatus) AS INT) AS g2,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY g1, g2, returnflag, linestatus""".stripMargin,

    "q49_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS p50,
        |  round(quantile_cont(l_quantity, 0.95), 6) AS p95,
        |  round(quantile_cont(l_extendedprice, 0.99), 6) AS price_p99
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q50_ntile" ->
      """WITH t AS (SELECT o_orderpriority, o_totalprice,
        |  ntile(4) OVER (PARTITION BY o_orderpriority
        |                 ORDER BY o_totalprice, o_orderkey) AS quartile
        |  FROM orders)
        |SELECT o_orderpriority, CAST(quartile AS INT) AS quartile,
        |  count(*) AS n, round(max(o_totalprice), 2) AS max_price
        |FROM t GROUP BY o_orderpriority, quartile
        |ORDER BY o_orderpriority, quartile""".stripMargin,

    "q51_pivot" -> {
      val counts = Seq("click", "error", "purchase", "signup", "view")
        .map(t => s"count(*) FILTER (WHERE event_type = '$t') AS n_$t")
        .mkString(", ")
      s"SELECT user_id, $counts FROM events GROUP BY user_id ORDER BY user_id"
    },

    "q52_set_ops" ->
      """WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        |big AS (SELECT o_custkey AS c_custkey FROM orders
        |        GROUP BY o_custkey HAVING count(*) >= 12)
        |SELECT 'building_and_big' AS which, c_custkey
        |  FROM (SELECT c_custkey FROM building INTERSECT SELECT c_custkey FROM big)
        |UNION ALL
        |SELECT 'building_only', c_custkey
        |  FROM (SELECT c_custkey FROM building EXCEPT SELECT c_custkey FROM big)
        |ORDER BY which, c_custkey""".stripMargin,

    "q53_string_funcs" ->
      """SELECT c_custkey,
        |  substr(c_name, 1, 8) AS prefix,
        |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
        |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS translated,
        |  CAST(levenshtein(c_mktsegment, 'BUILDING') AS INT) AS lev
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q54_datetime" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  CAST(isodow(o_orderdate) AS INT) AS isodow,
        |  count(*) AS n
        |FROM orders GROUP BY month, isodow ORDER BY month, isodow""".stripMargin,

    "q55_conditional_agg" ->
      """SELECT l_returnflag,
        |  count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
        |  bool_and(l_quantity > 0) AS all_positive,
        |  bool_or(l_tax > 0.07) AS any_high_tax
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q56_array_hof" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
        |SELECT doc_id,
        |  CAST(len(list_filter(tk, x -> len(x) > 3)) AS BIGINT) AS n_long_tokens,
        |  CAST(list_max(list_transform(tk, x -> len(x))) AS BIGINT) AS max_tok_len,
        |  CAST(list_aggregate(list_transform(tk, x -> len(x)), 'sum') AS BIGINT) AS total_chars
        |FROM t ORDER BY doc_id""".stripMargin,

    "q57_rank_functions" ->
      """SELECT o_orderkey,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q58_lag_lead" ->
      """SELECT event_id,
        |  coalesce(round(value - lag(value) OVER w, 4), CAST(0.0 AS DOUBLE)) AS delta,
        |  coalesce(lead(event_type) OVER w, 'none') AS next_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,

    "q59_map_extract" ->
      """SELECT user_id,
        |  CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click_cnt,
        |  CAST(0 AS BIGINT) AS missing_cnt
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q43_asof_join" ->
      """WITH s AS (SELECT user_id, ts, max(value) AS signup_value
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id, ts)
        |SELECT e.event_id,
        |  coalesce(s.signup_value, CAST(-1.0 AS DOUBLE)) AS signup_value
        |FROM events e ASOF LEFT JOIN s
        |  ON e.user_id = s.user_id AND e.ts >= s.ts
        |ORDER BY e.event_id""".stripMargin,

    "q42_salted_group_agg" ->
      """SELECT user_id, count(*) AS cnt,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q41_corpus_clean" -> {
      val sigAggs = (for (b <- 0 until 4; r <- 0 until 2)
        yield s"min(substr(md5(s), ${(b * 2 + r) * 4 + 1}, 4)) AS h_${b}_$r").mkString(", ")
      val bandJoin = (0 until 4).map { b =>
        s"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM sig a JOIN sig b " +
          s"ON a.h_${b}_0 = b.h_${b}_0 AND a.h_${b}_1 = b.h_${b}_1 AND a.doc_id < b.doc_id"
      }.mkString(" UNION ")
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
         |q AS (SELECT doc_id FROM (
         |  SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
         |    round(CAST(len(list_filter(tk, x -> list_contains(['the', 'a'], x))) AS DOUBLE)
         |      / CAST(len(tk) AS DOUBLE), 4) AS stop_ratio FROM t)
         |  WHERE round(least(CAST(1.0 AS DOUBLE), CAST(n_tokens AS DOUBLE) / CAST(100.0 AS DOUBLE))
         |      * (CAST(1.0 AS DOUBLE) - stop_ratio), 4) >= 0.3 AND n_tokens >= 20),
         |kept AS (SELECT d.* FROM documents d JOIN q USING (doc_id)),
         |canon AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY text),
         |uniq AS (SELECT kept.* FROM kept JOIN canon USING (doc_id)),
         |toks AS (SELECT doc_id, string_split(text, ' ') AS tt FROM uniq),
         |sh AS (SELECT DISTINCT doc_id, s FROM
         |  (SELECT doc_id, unnest(list_transform(range(len(tt) - 2),
         |     i -> tt[i + 1] || ' ' || tt[i + 2] || ' ' || tt[i + 3])) AS s
         |   FROM toks WHERE len(tt) >= 3)),
         |sig AS (SELECT doc_id, $sigAggs FROM sh GROUP BY doc_id),
         |pairs AS ($bandJoin)
         |SELECT doc_id, lang, n_chars FROM uniq
         |WHERE doc_id NOT IN (SELECT doc_b FROM pairs)
         |ORDER BY doc_id""".stripMargin
    },

    "q61_stratified_sample" ->
      """SELECT event_id, CASE WHEN value > 100 THEN 1 ELSE 0 END AS label
        |FROM events
        |WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 4))::INT
        |  < (CASE WHEN value > 100 THEN CAST(1.0 AS DOUBLE)
        |          ELSE CAST(0.2 AS DOUBLE) END) * 65536
        |ORDER BY event_id""".stripMargin,

    "q62_tfidf" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
        |dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT tf.doc_id, tf.token, tf.tf,
        |  round(tf.tf * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 6) AS tfidf
        |FROM tf JOIN dfreq USING (token) CROSS JOIN n
        |ORDER BY doc_id, token""".stripMargin,

    "q63_dedup_clusters" ->
      s"""WITH RECURSIVE $shinglesCte,
         |${minhashSig(4, 2)},
         |pairs AS (${minhashPairs(4, 2)}),
         |ed AS (SELECT doc_a AS s, doc_b AS d FROM pairs
         |       UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(node, anc) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.d, r.anc FROM reach r JOIN ed e ON e.s = r.node)
         |SELECT node AS doc_id, min(anc) AS cluster_id FROM reach
         |GROUP BY node ORDER BY doc_id""".stripMargin,

    "q64_feature_hash" ->
      """SELECT c_custkey,
        |  ('0x' || substr(md5(c_mktsegment), 1, 8))::BIGINT % 64 AS seg_bucket,
        |  ('0x' || substr(md5(c_name), 1, 8))::BIGINT % 1024 AS name_bucket
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q65_session_stats" ->
      """WITH w AS (SELECT event_id, user_id, ts, value,
        |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |b AS (SELECT event_id, user_id, ts, value,
        |  CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS nb
        |  FROM w),
        |se AS (SELECT user_id, ts, value,
        |  CAST(sum(nb) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM b)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us,
        |  CAST(sum(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_clicks
        |FROM se GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "q66_event_pairs_range_join" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tsu, event_id FROM events)
        |SELECT a.user_id, count(*) AS n_pairs
        |FROM e a JOIN e b ON a.user_id = b.user_id
        |  AND (b.tsu > a.tsu OR (b.tsu = a.tsu AND b.event_id > a.event_id))
        |  AND b.tsu - a.tsu <= 300000000
        |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin,

    "q67_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  CAST(grouping(l_returnflag) AS INT) AS g1,
        |  CAST(grouping(l_linestatus) AS INT) AS g2,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY g1, g2, returnflag, linestatus""".stripMargin,

    "q68_corr_covar" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
        |  round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_s,
        |  round(covar_pop(l_quantity, l_extendedprice), 2) AS covar_p
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q69_simhash_neardup" -> {
      val bandJoin = (0 until 4).map { b =>
        s"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM sg a JOIN sg b " +
          s"ON ((a.simhash >> ${b * 8}) & 255) = ((b.simhash >> ${b * 8}) & 255) " +
          s"AND a.doc_id < b.doc_id"
      }.mkString(" UNION ")
      s"""WITH $simhashCte,
         |pairs AS ($bandJoin)
         |SELECT p.doc_a, p.doc_b,
         |  CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INT) AS hamming
         |FROM pairs p
         |JOIN sg sa ON sa.doc_id = p.doc_a
         |JOIN sg sb ON sb.doc_id = p.doc_b
         |WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin
    },

    "q70_ivf_centroids" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |n AS (SELECT vec_id, emb,
        |  CAST(emb[1] > 0 AS INT) * 1 + CAST(emb[2] > 0 AS INT) * 2
        |    + CAST(emb[3] > 0 AS INT) * 4 + CAST(emb[4] > 0 AS INT) * 8 AS bucket
        |  FROM e),
        |x AS (SELECT CAST(bucket AS INT) AS bucket,
        |  CAST(generate_subscripts(emb, 1) - 1 AS INT) AS dim,
        |  unnest(emb) AS v FROM n)
        |SELECT bucket, dim, count(*) AS n_vecs, round(avg(v), 6) AS centroid
        |FROM x GROUP BY bucket, dim ORDER BY bucket, dim""".stripMargin,

    "q71_latest_snapshot" ->
      """WITH r AS (SELECT user_id, event_id, event_type, value,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_id, event_type, value FROM r WHERE rn = 1
        |ORDER BY user_id""".stripMargin,

    "q72_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY returnflag, linestatus""".stripMargin,

    "q73_bigram_freq" ->
      """WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
        |g AS (SELECT unnest(list_transform(range(len(t) - 1),
        |    i -> t[i + 1] || ' ' || t[i + 2])) AS ngram
        |  FROM toks WHERE len(t) >= 2)
        |SELECT ngram, count(*) AS freq FROM g GROUP BY ngram
        |ORDER BY ngram""".stripMargin,

    "q74_value_windows" ->
      """SELECT event_id,
        |  first_value(event_type) OVER w AS first_type,
        |  last_value(event_type) OVER w AS last_type,
        |  coalesce(nth_value(event_type, 2) OVER w, 'none') AS second_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY event_id""".stripMargin,

    "q75_running_ctr" ->
      """WITH l AS (SELECT event_id, user_id, ts,
        |  CASE WHEN value > 100 THEN 1 ELSE 0 END AS label FROM events)
        |SELECT event_id,
        |  round(CAST(sum(label) OVER w AS DOUBLE) / (count(*) OVER w), 6) AS ctr
        |FROM l
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q76_regex_extract" ->
      """SELECT event_id,
        |  CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS k_num,
        |  CAST(regexp_matches(props, '\d') AS INT) AS has_digit,
        |  CAST(length(regexp_replace(props, '[^{}:,"]', '', 'g')) AS BIGINT)
        |    AS n_structural
        |FROM events ORDER BY event_id""".stripMargin,

    "q77_mad" ->
      """WITH m AS (SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS med
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l.l_returnflag,
        |  round(quantile_cont(abs(l.l_quantity - m.med), 0.5), 6) AS mad
        |FROM lineitem l JOIN m ON l.l_returnflag = m.l_returnflag
        |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin,

    "q78_histogram" ->
      """SELECT CAST(floor(l_extendedprice / CAST(5000.0 AS DOUBLE)) AS BIGINT) AS bin,
        |  count(*) AS n
        |FROM lineitem GROUP BY bin ORDER BY bin""".stripMargin,

    "q79_topk_aggregator" ->
      """WITH r AS (SELECT user_id, event_id, value,
        |  row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
        |  FROM events)
        |SELECT user_id, event_id, value FROM r WHERE rn <= 3
        |ORDER BY user_id, event_id""".stripMargin,

    "q80_asof_tolerance" ->
      """WITH s AS (SELECT user_id, ts, max(value) AS signup_value
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id, ts)
        |SELECT e.event_id,
        |  CASE WHEN s.ts IS NOT NULL
        |         AND epoch_us(e.ts) - epoch_us(s.ts) <= 259200000000
        |       THEN s.signup_value ELSE CAST(-1.0 AS DOUBLE) END AS signup_value
        |FROM events e ASOF LEFT JOIN s
        |  ON e.user_id = s.user_id AND e.ts >= s.ts
        |ORDER BY e.event_id""".stripMargin,

    "q81_sequence_pattern" ->
      """WITH w AS (SELECT event_id, event_type,
        |  lead(event_type, 1) OVER win AS n1,
        |  lead(event_type, 2) OVER win AS n2,
        |  lead(event_type, 3) OVER win AS n3
        |  FROM events
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_id,
        |  CAST(coalesce(n1 = 'purchase' OR n2 = 'purchase' OR n3 = 'purchase',
        |                false) AS INT) AS recovered
        |FROM w WHERE event_type = 'error' ORDER BY event_id""".stripMargin,

    "q82_weekly_retention" ->
      """WITH uw AS (SELECT DISTINCT user_id,
        |  (epoch_us(ts) // 86400000000) // 7 AS wk FROM events),
        |act AS (SELECT wk, count(*) AS n_active FROM uw GROUP BY wk),
        |ret AS (SELECT a.wk, count(*) AS n_retained FROM uw a
        |  WHERE EXISTS (SELECT 1 FROM uw b
        |                WHERE b.user_id = a.user_id AND b.wk = a.wk + 1)
        |  GROUP BY a.wk)
        |SELECT act.wk, act.n_active,
        |  CAST(coalesce(ret.n_retained, 0) AS BIGINT) AS n_retained,
        |  round(CAST(coalesce(ret.n_retained, 0) AS DOUBLE) / act.n_active, 6)
        |    AS retention
        |FROM act LEFT JOIN ret ON act.wk = ret.wk ORDER BY act.wk""".stripMargin,

    "q83_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tsu FROM events),
        |fc AS (SELECT user_id, min(tsu) AS fc FROM e
        |       WHERE event_type = 'click' GROUP BY user_id),
        |fp AS (SELECT e.user_id, min(e.tsu) AS fp FROM e
        |       JOIN fc ON fc.user_id = e.user_id
        |       WHERE e.event_type = 'purchase' AND e.tsu > fc.fc
        |       GROUP BY e.user_id)
        |SELECT fc.user_id,
        |  CAST(fp.fp IS NOT NULL AS INT) AS converted,
        |  coalesce(fp.fp - fc.fc, -1) AS lag_us
        |FROM fc LEFT JOIN fp ON fc.user_id = fp.user_id
        |ORDER BY fc.user_id""".stripMargin,

    "q84_shipping_priority" ->
      """SELECT l_orderkey,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4)
        |                AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1996-01-01'
        |  AND l_shipdate > TIMESTAMP '1996-01-01'
        |GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q85_region_revenue" ->
      """SELECT n_name,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4)
        |                AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM region
        |JOIN nation ON r_regionkey = n_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q86_salted_join" ->
      """SELECT e.event_id, e.user_id, c.c_mktsegment
        |FROM events e
        |JOIN customer c ON c.c_custkey = e.user_id
        |WHERE c.c_custkey < 150
        |ORDER BY e.event_id""".stripMargin,

    "q87_window_distinct" ->
      """SELECT event_id,
        |  count(DISTINCT event_type) OVER w AS n_types
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q88_click_streaks" ->
      """WITH l AS (SELECT event_id, user_id, ts,
        |  CASE WHEN value > 100 THEN 1 ELSE 0 END AS label FROM events),
        |r AS (SELECT event_id, user_id, label,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn
        |  FROM l),
        |c AS (SELECT user_id, rn,
        |  rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS grp
        |  FROM r WHERE label = 1),
        |g AS (SELECT user_id, grp, count(*) AS len FROM c GROUP BY user_id, grp)
        |SELECT user_id, max(len) AS max_streak FROM g GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "q89_upsert" ->
      """WITH upd AS (SELECT c_custkey, 'VIP' AS c_mktsegment
        |  FROM customer WHERE c_custkey < 50)
        |SELECT c_custkey, c_mktsegment FROM customer
        |WHERE c_custkey NOT IN (SELECT c_custkey FROM upd)
        |UNION ALL SELECT c_custkey, c_mktsegment FROM upd
        |ORDER BY c_custkey""".stripMargin,

    "q90_snapshot_diff" ->
      """WITH oldt AS (SELECT c_custkey, c_mktsegment FROM customer),
        |upd AS (SELECT c_custkey, 'VIP' AS c_mktsegment
        |  FROM customer WHERE c_custkey < 50),
        |newt AS (SELECT * FROM (
        |  SELECT c_custkey, c_mktsegment FROM oldt
        |  WHERE c_custkey NOT IN (SELECT c_custkey FROM upd)
        |  UNION ALL SELECT * FROM upd) WHERE c_custkey < 1400),
        |j AS (SELECT coalesce(o.c_custkey, n.c_custkey) AS c_custkey,
        |  o.c_mktsegment AS fo, n.c_mktsegment AS fn
        |  FROM oldt o FULL OUTER JOIN newt n ON o.c_custkey = n.c_custkey)
        |SELECT c_custkey,
        |  CASE WHEN fo IS NULL THEN 'added'
        |       WHEN fn IS NULL THEN 'removed'
        |       WHEN fo <> fn THEN 'changed' END AS change
        |FROM j
        |WHERE (fo IS NULL) OR (fn IS NULL) OR (fo <> fn)
        |ORDER BY c_custkey""".stripMargin,

    "q91_embedding_quantize" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |s AS (SELECT vec_id, emb, list_min(emb) AS mn,
        |  CASE WHEN list_max(emb) = list_min(emb) THEN CAST(1.0 AS DOUBLE)
        |       ELSE (list_max(emb) - list_min(emb)) / CAST(255.0 AS DOUBLE)
        |  END AS scale FROM e),
        |q AS (SELECT vec_id, emb, mn, scale,
        |  list_transform(emb, x -> CAST(round((x - mn) / scale) AS INT)) AS qv
        |  FROM s)
        |SELECT vec_id, qv[1] AS q0, qv[2] AS q1, qv[3] AS q2, qv[4] AS q3,
        |  round(list_max(list_transform(generate_series(1, len(emb)),
        |    i -> abs(emb[i] - (qv[i] * scale + mn)))), 6) AS max_err
        |FROM q ORDER BY vec_id""".stripMargin,

    "q92_group_sample" ->
      """WITH r AS (SELECT user_id, event_id,
        |  row_number() OVER (PARTITION BY user_id
        |    ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
        |  FROM events)
        |SELECT user_id, event_id FROM r WHERE rn <= 5
        |ORDER BY user_id, event_id""".stripMargin,

    "q93_bigram_lm" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bg AS (SELECT doc_id,
        |  unnest(list_transform(range(len(t) - 1),
        |    i -> {'w1': t[i + 1], 'w2': t[i + 2]})) AS b
        |  FROM toks WHERE len(t) >= 2),
        |bb AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg),
        |c2 AS (SELECT w1, w2, count(*) AS c12 FROM bb GROUP BY w1, w2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM bb GROUP BY w1)
        |SELECT bb.doc_id,
        |  round(-avg(ln(CAST(c12 AS DOUBLE) / c1)), 6) AS cross_entropy
        |FROM bb JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
        |GROUP BY bb.doc_id ORDER BY doc_id""".stripMargin,

    "q94_contamination" ->
      """WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id, source, s FROM
        |  (SELECT doc_id, source, unnest(list_transform(range(len(t) - 2),
        |     i -> t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3])) AS s
        |   FROM toks WHERE len(t) >= 3)),
        |bench AS (SELECT doc_id, s FROM sh WHERE source = 'src0'),
        |corpus AS (SELECT DISTINCT s FROM sh WHERE source <> 'src0'),
        |hits AS (SELECT doc_id, count(*) AS n_hit FROM bench
        |  WHERE s IN (SELECT s FROM corpus) GROUP BY doc_id),
        |tot AS (SELECT doc_id, count(*) AS n_sh FROM bench GROUP BY doc_id)
        |SELECT tot.doc_id, CAST(coalesce(hits.n_hit, 0) AS BIGINT) AS n_hit,
        |  tot.n_sh,
        |  round(CAST(coalesce(hits.n_hit, 0) AS DOUBLE) / tot.n_sh, 6)
        |    AS contamination
        |FROM tot LEFT JOIN hits ON tot.doc_id = hits.doc_id
        |ORDER BY tot.doc_id""".stripMargin,

    "q95_table_profile" -> {
      val cols = Seq("c_custkey", "c_mktsegment", "c_name", "c_nationkey")
      cols.map(c =>
        s"SELECT '$c' AS col_name, " +
          s"CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, " +
          s"count(DISTINCT $c) AS n_distinct, " +
          s"CAST(min($c) AS VARCHAR) AS min_str, " +
          s"CAST(max($c) AS VARCHAR) AS max_str FROM customer")
        .mkString("", " UNION ALL ", " ORDER BY col_name")
    },

    "q96_pii_redact" ->
      """SELECT c_custkey,
        |  regexp_replace(regexp_replace(regexp_replace(c_name,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}', '<PHONE>', 'g'),
        |    '[0-9]{6,}', '<NUM>', 'g') AS clean_text,
        |  CAST(len(regexp_extract_all(c_name,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |    + len(regexp_extract_all(regexp_replace(c_name,
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}'))
        |    + len(regexp_extract_all(regexp_replace(regexp_replace(c_name,
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |        '[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}', '<PHONE>', 'g'),
        |      '[0-9]{6,}')) AS BIGINT) AS n_redactions
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q97_repetition" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
        |agg AS (SELECT doc_id, sum(tf) AS n_tokens, max(tf) AS top_tf
        |  FROM tf GROUP BY doc_id),
        |bl AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bg AS (SELECT doc_id, unnest(list_transform(range(len(t) - 1),
        |    i -> t[i + 1] || ' ' || t[i + 2])) AS bg
        |  FROM bl WHERE len(t) >= 2),
        |bga AS (SELECT doc_id, count(*) AS n_bg, count(DISTINCT bg) AS d_bg
        |  FROM bg GROUP BY doc_id),
        |j AS (SELECT agg.doc_id, CAST(agg.n_tokens AS BIGINT) AS n_tokens,
        |  round(CAST(top_tf AS DOUBLE) / n_tokens, 6) AS top_tok_frac,
        |  coalesce(round(1.0 - CAST(d_bg AS DOUBLE) / n_bg, 6), 0.0)
        |    AS dup_bigram_frac
        |  FROM agg LEFT JOIN bga ON agg.doc_id = bga.doc_id)
        |SELECT doc_id, n_tokens, top_tok_frac, dup_bigram_frac,
        |  CAST(top_tok_frac > CAST(0.12 AS DOUBLE)
        |    OR dup_bigram_frac > CAST(0.3 AS DOUBLE) AS INT) AS junk
        |FROM j ORDER BY doc_id""".stripMargin,

    "q98_chunk_dedup" ->
      """WITH tl AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |ch AS (SELECT doc_id,
        |  CAST((len(t) - 1) // 20 + 1 AS BIGINT) AS n_chunks,
        |  unnest(list_transform(range((len(t) - 1) // 20 + 1),
        |    i -> {'idx': i,
        |          'chunk': array_to_string(t[i * 20 + 1 : i * 20 + 20], ' ')}))
        |    AS c
        |  FROM tl),
        |cf AS (SELECT doc_id, n_chunks, c.idx AS idx, c.chunk AS chunk,
        |  row_number() OVER (PARTITION BY md5(c.chunk)
        |    ORDER BY doc_id, c.idx) AS rn
        |  FROM ch)
        |SELECT doc_id, n_chunks, CAST(count(*) AS BIGINT) AS n_kept,
        |  string_agg(chunk, ' ' ORDER BY idx) AS clean_text
        |FROM cf WHERE rn = 1
        |GROUP BY doc_id, n_chunks ORDER BY doc_id""".stripMargin,

    "q99_mixture_sample" ->
      """WITH w(source, p) AS (VALUES ('src0', CAST(0.5 AS DOUBLE)),
        |  ('src1', CAST(0.3 AS DOUBLE)), ('src2', CAST(0.2 AS DOUBLE))),
        |d AS (SELECT doc_id, documents.source, p
        |  FROM documents JOIN w ON documents.source = w.source),
        |counts AS (SELECT source, p, count(*) AS n_docs FROM d
        |  GROUP BY source, p),
        |t AS (SELECT min(CAST(n_docs AS DOUBLE) / p) AS t FROM counts),
        |rates AS (SELECT source, n_docs,
        |  round(p * t.t / n_docs, 6) AS rate FROM counts, t),
        |kept AS (SELECT d.source, count(*) AS n_keep,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum
        |  FROM d JOIN rates ON d.source = rates.source
        |  WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
        |    / CAST(4294967296 AS DOUBLE) < rate
        |  GROUP BY d.source)
        |SELECT rates.source, CAST(n_docs AS BIGINT) AS n_docs, rate,
        |  CAST(coalesce(n_keep, 0) AS BIGINT) AS n_keep,
        |  CAST(coalesce(id_sum, 0) AS BIGINT) AS id_sum
        |FROM rates LEFT JOIN kept ON rates.source = kept.source
        |ORDER BY rates.source""".stripMargin,

    "q101_quality_gate" ->
      """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS tk
        |  FROM documents),
        |m AS (SELECT doc_id, source,
        |  round(CAST(len(list_filter(tk, x -> list_contains(['the', 'a'], x))) AS DOUBLE)
        |    / CAST(len(tk) AS DOUBLE), 4) AS stop_ratio,
        |  CAST(len(tk) AS BIGINT) AS n_tokens FROM t),
        |sc AS (SELECT doc_id, source,
        |  round(least(CAST(1.0 AS DOUBLE), CAST(n_tokens AS DOUBLE) / CAST(100.0 AS DOUBLE))
        |    * (CAST(1.0 AS DOUBLE) - stop_ratio), 4) AS quality FROM m),
        |thr AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  round(quantile_cont(quality, CAST(0.25 AS DOUBLE)), 6) AS thr
        |  FROM sc GROUP BY source),
        |kept AS (SELECT sc.source, CAST(count(*) AS BIGINT) AS n_keep,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum
        |  FROM sc JOIN thr ON sc.source = thr.source
        |  WHERE quality >= thr.thr GROUP BY sc.source)
        |SELECT thr.source, n_docs, thr,
        |  CAST(coalesce(n_keep, 0) AS BIGINT) AS n_keep,
        |  CAST(coalesce(id_sum, 0) AS BIGINT) AS id_sum
        |FROM thr LEFT JOIN kept ON thr.source = kept.source
        |ORDER BY thr.source""".stripMargin,

    "q102_bm25" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM tk),
        |corpus AS (SELECT count(*) AS n,
        |  round(CAST(sum(dl) AS DOUBLE) / count(*), 6) AS avgdl FROM dl),
        |toks AS (SELECT doc_id, unnest(t) AS tok FROM tk),
        |tf AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf FROM toks
        |  WHERE tok IN ('spark', 'join', 'scan') GROUP BY doc_id, tok),
        |dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        |c AS (SELECT tf.doc_id,
        |  CAST(round(ln(CAST(1.0 AS DOUBLE)
        |      + (n - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE)))
        |    * tf * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE))
        |    / (tf + CAST(1.2 AS DOUBLE)
        |       * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl / avgdl)),
        |    10) AS DECIMAL(28,12)) AS c
        |  FROM tf JOIN dft USING (tok) JOIN dl USING (doc_id) CROSS JOIN corpus)
        |SELECT doc_id, round(CAST(sum(c) AS DOUBLE), 6) AS score
        |FROM c GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    "q103_ranking_metrics" ->
      """WITH s AS (SELECT user_id, event_id, value AS score,
        |  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
        |  FROM events),
        |wt AS (SELECT rnk,
        |  CAST(round(CAST(1.0 AS DOUBLE) / log2(rnk + CAST(1.0 AS DOUBLE)), 10)
        |    AS DECIMAL(28,12)) AS w
        |  FROM (SELECT unnest(range(1, 11)) AS rnk)),
        |pos AS (SELECT user_id, CAST(sum(label) AS BIGINT) AS npos FROM s
        |  GROUP BY user_id HAVING sum(label) > 0),
        |r AS (SELECT user_id, event_id, label,
        |  row_number() OVER (PARTITION BY user_id ORDER BY score DESC, event_id)
        |    AS rnk FROM s),
        |top AS (SELECT * FROM r WHERE rnk <= 10),
        |d AS (SELECT user_id,
        |  sum(CASE WHEN label = 1 THEN w ELSE CAST(0 AS DECIMAL(28,12)) END) AS dcg,
        |  CAST(sum(label) AS BIGINT) AS hits,
        |  min(CASE WHEN label = 1 THEN rnk END) AS first
        |  FROM top JOIN wt USING (rnk) GROUP BY user_id),
        |i AS (SELECT pos.user_id, npos, sum(w) AS idcg
        |  FROM pos CROSS JOIN wt WHERE rnk <= least(npos, 10)
        |  GROUP BY pos.user_id, npos)
        |SELECT d.user_id,
        |  round(CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE), 6) AS ndcg,
        |  coalesce(round(CAST(1.0 AS DOUBLE) / first, 6), CAST(0.0 AS DOUBLE))
        |    AS mrr,
        |  round(CAST(hits AS DOUBLE) / npos, 6) AS recall
        |FROM d JOIN i ON d.user_id = i.user_id
        |ORDER BY d.user_id""".stripMargin,

    "q104_setsim_join" ->
      s"""WITH $shinglesCte,
        |f AS (SELECT s, count(*) AS tf FROM sh GROUP BY s),
        |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |o AS (SELECT sh.doc_id, sh.s,
        |  row_number() OVER (PARTITION BY sh.doc_id ORDER BY f.tf, sh.s) AS pos
        |  FROM sh JOIN f USING (s)),
        |p AS (SELECT o.doc_id, o.s FROM o JOIN n USING (doc_id)
        |  WHERE pos <= n - CAST(ceil(CAST(0.6 AS DOUBLE) * n) AS BIGINT) + 1),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM p a JOIN p b ON a.s = b.s AND a.doc_id < b.doc_id),
        |common AS (SELECT doc_a, doc_b, count(*) AS c FROM cand
        |  JOIN sh sa ON sa.doc_id = cand.doc_a
        |  JOIN sh sb ON sb.doc_id = cand.doc_b AND sa.s = sb.s
        |  GROUP BY doc_a, doc_b),
        |j AS (SELECT doc_a, doc_b,
        |  round(CAST(c AS DOUBLE) / (na.n + nb.n - c), 6) AS jaccard
        |  FROM common JOIN n na ON na.doc_id = common.doc_a
        |  JOIN n nb ON nb.doc_id = common.doc_b)
        |SELECT doc_a, doc_b, jaccard FROM j
        |WHERE jaccard >= CAST(0.6 AS DOUBLE)
        |ORDER BY doc_a, doc_b""".stripMargin,

    "q105_calibration" ->
      """WITH s AS (SELECT
        |  least(value / CAST(200.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) AS score,
        |  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
        |  FROM events),
        |b AS (SELECT CAST(least(floor(score * 10), 9) AS INT) AS bin,
        |  score, label FROM s)
        |SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(sum(CAST(round(score, 6) AS DECIMAL(18,8))) AS DOUBLE)
        |    / count(*), 6) AS mean_score,
        |  round(CAST(sum(label) AS DOUBLE) / count(*), 6) AS pos_rate
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,

    "q106_psi_drift" ->
      """WITH v AS (SELECT value,
        |  CASE WHEN event_id % 2 = 0 THEN 'e' ELSE 'a' END AS side
        |  FROM events),
        |b AS (SELECT CAST(least(floor(value / CAST(50.0 AS DOUBLE)), 9) AS INT)
        |    AS bin, side FROM v),
        |c AS (SELECT bin,
        |  CAST(sum(CASE WHEN side = 'e' THEN 1 ELSE 0 END) AS BIGINT) AS n_exp,
        |  CAST(sum(CASE WHEN side <> 'e' THEN 1 ELSE 0 END) AS BIGINT) AS n_act
        |  FROM b GROUP BY bin),
        |t AS (SELECT sum(n_exp) AS te, sum(n_act) AS ta FROM c),
        |g AS (SELECT bin, n_exp, n_act,
        |  CAST(n_exp + 1 AS DOUBLE) / (te + 10) AS p,
        |  CAST(n_act + 1 AS DOUBLE) / (ta + 10) AS q
        |  FROM c, t),
        |h AS (SELECT bin, n_exp, n_act,
        |  CAST(round((p - q) * ln(p / q), 10) AS DECIMAL(28,12)) AS term
        |  FROM g)
        |SELECT bin, n_exp, n_act, CAST(term AS DOUBLE) AS term,
        |  round(CAST(sum(term) OVER () AS DOUBLE), 6) AS psi_total
        |FROM h ORDER BY bin""".stripMargin,

    "q107_weighted_sample" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |m AS (SELECT doc_id,
        |  round(CAST(len(list_filter(tk, x -> list_contains(['the', 'a'], x))) AS DOUBLE)
        |    / CAST(len(tk) AS DOUBLE), 4) AS stop_ratio,
        |  CAST(len(tk) AS BIGINT) AS n_tokens FROM t),
        |sc AS (SELECT doc_id,
        |  round(least(CAST(1.0 AS DOUBLE), CAST(n_tokens AS DOUBLE) / CAST(100.0 AS DOUBLE))
        |    * (CAST(1.0 AS DOUBLE) - stop_ratio), 4) AS quality FROM m),
        |w AS (SELECT doc_id, greatest(quality, CAST(0.0001 AS DOUBLE)) AS w
        |  FROM sc),
        |k AS (SELECT doc_id, w,
        |  round(ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
        |      + CAST(1.0 AS DOUBLE)) / CAST(4294967296 AS DOUBLE)) / w, 9)
        |    AS skey FROM w)
        |SELECT doc_id, w FROM
        |  (SELECT doc_id, w FROM k ORDER BY skey DESC, doc_id LIMIT 40)
        |ORDER BY doc_id""".stripMargin,

    "q108_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(round(l_quantity, 6) AS DECIMAL(28,10))) AS VARCHAR)
        |    AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice, 6) AS DECIMAL(28,10))) AS VARCHAR)
        |    AS sum_base_price,
        |  CAST(sum(CAST(round(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount), 6)
        |    AS DECIMAL(28,10))) AS VARCHAR) AS sum_disc_price,
        |  CAST(sum(CAST(round(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)
        |    * (CAST(1.0 AS DOUBLE) + l_tax), 6) AS DECIMAL(28,10))) AS VARCHAR)
        |    AS sum_charge,
        |  round(CAST(sum(CAST(round(l_quantity, 6) AS DECIMAL(28,10))) AS DOUBLE)
        |    / count(*), 6) AS avg_qty,
        |  round(CAST(sum(CAST(round(l_extendedprice, 6) AS DECIMAL(28,10))) AS DOUBLE)
        |    / count(*), 6) AS avg_price,
        |  round(CAST(sum(CAST(round(l_discount, 6) AS DECIMAL(28,10))) AS DOUBLE)
        |    / count(*), 6) AS avg_disc,
        |  CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q109_negative_sample" ->
      """WITH seen AS (SELECT o_custkey AS custkey, l_partkey AS partkey
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_custkey < 200),
        |users AS (SELECT DISTINCT custkey FROM seen),
        |cat AS (SELECT DISTINCT p_partkey AS partkey FROM part
        |  WHERE p_partkey < 500),
        |g AS (SELECT u.custkey, c.partkey FROM users u CROSS JOIN cat c),
        |ng AS (SELECT g.custkey, g.partkey FROM g ANTI JOIN seen s
        |  ON g.custkey = s.custkey AND g.partkey = s.partkey),
        |h AS (SELECT custkey, partkey,
        |  ('0x' || substr(md5(custkey::VARCHAR || '|' || partkey::VARCHAR),
        |    1, 8))::BIGINT AS u FROM ng),
        |r AS (SELECT custkey, partkey, row_number() OVER
        |  (PARTITION BY custkey ORDER BY u, partkey) AS rn FROM h)
        |SELECT custkey, partkey FROM r WHERE rn <= 5
        |ORDER BY custkey, partkey""".stripMargin,

    "q110_i2i_pmi" ->
      """WITH ev AS (SELECT user_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS item, ts
        |  FROM events),
        |latest AS (SELECT user_id, item, max(ts) AS mts FROM ev
        |  GROUP BY user_id, item),
        |recent AS (SELECT user_id, item FROM
        |  (SELECT user_id, item, row_number() OVER
        |    (PARTITION BY user_id ORDER BY mts DESC, item) AS rn FROM latest)
        |  WHERE rn <= 20),
        |nu AS (SELECT count(DISTINCT user_id) AS nu FROM recent),
        |m AS (SELECT item, count(*) AS c FROM recent GROUP BY item),
        |p AS (SELECT a.item AS item_a, b.item AS item_b,
        |  count(*) AS c_ab FROM recent a JOIN recent b
        |  ON a.user_id = b.user_id AND a.item < b.item
        |  GROUP BY a.item, b.item HAVING count(*) >= 2),
        |sc AS (SELECT item_a, item_b, c_ab,
        |  round(ln(CAST(c_ab AS DOUBLE) * nu / (ma.c * mb.c)), 6) AS pmi
        |  FROM p JOIN m ma ON ma.item = p.item_a
        |  JOIN m mb ON mb.item = p.item_b CROSS JOIN nu),
        |r AS (SELECT item_a, item_b, c_ab, pmi, row_number() OVER
        |  (PARTITION BY item_a ORDER BY pmi DESC, item_b) AS rn FROM sc)
        |SELECT item_a, item_b, c_ab, pmi FROM r WHERE rn <= 5
        |ORDER BY item_a, item_b""".stripMargin,

    "q111_seq_packing" ->
      """WITH n AS (SELECT source, doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents),
        |c AS (SELECT source, doc_id, n,
        |  coalesce(sum(n) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |  FROM n)
        |SELECT source, CAST(cb // 2048 AS BIGINT) AS bin,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n) AS BIGINT) AS n_tokens
        |FROM c GROUP BY source, bin ORDER BY source, bin""".stripMargin,

    "q112_leakage_audit" ->
      """WITH w AS (SELECT user_id, ts,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn,
        |  count(*) OVER (PARTITION BY user_id) AS u_cnt FROM events),
        |s AS (SELECT user_id, ts,
        |  CASE WHEN rn >= u_cnt - 10 THEN 2
        |       WHEN rn < (u_cnt - 10) * CAST(0.8 AS DOUBLE) THEN 0
        |       ELSE 1 END AS istest FROM w),
        |b AS (SELECT user_id,
        |  max(CASE WHEN istest = 0 THEN ts END) AS mt,
        |  min(CASE WHEN istest <> 0 THEN ts END) AS me FROM s
        |  GROUP BY user_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(coalesce(sum(CASE WHEN mt > me THEN 1 ELSE 0 END), 0) AS BIGINT)
        |    AS n_violations
        |FROM b""".stripMargin,

    "q100_asof_exec" ->
      """WITH c AS (SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts AS p_ts, value AS p_value FROM events
        |  WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id, epoch_us(p.p_ts) AS p_ts_us, p.p_value
        |FROM c ASOF JOIN p
        |  ON c.user_id = p.user_id AND c.ts >= p.p_ts
        |ORDER BY c.event_id""".stripMargin,

    "q113_winnow_fingerprint" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |g AS (SELECT doc_id, len(gl) AS ng,
        |    generate_subscripts(gl, 1) - 1 AS pos, unnest(gl) AS gram
        |  FROM (SELECT doc_id, list_transform(range(len(t) - 2),
        |      i -> t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3]) AS gl
        |    FROM toks WHERE len(t) >= 6)),
        |f AS (SELECT doc_id, pos, ng,
        |    min(substr(md5(gram), 1, 8)) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
        |  FROM g),
        |d AS (SELECT DISTINCT doc_id, fp FROM f WHERE pos <= ng - 4)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fps,
        |  string_agg(fp, ',' ORDER BY fp) AS fingerprints
        |FROM d GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q114_rrf_fusion" ->
      """WITH ev AS (SELECT user_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
        |  event_type, value FROM events
        |  WHERE json_extract_string(props, '$.k') IS NOT NULL),
        |a AS (SELECT user_id, item, count(*) AS s FROM ev
        |  WHERE event_type = 'click' GROUP BY user_id, item),
        |ar AS (SELECT user_id, item, row_number() OVER
        |  (PARTITION BY user_id ORDER BY s DESC, item) AS ra FROM a),
        |b AS (SELECT user_id, item, max(value) AS s FROM ev
        |  WHERE event_type = 'purchase' GROUP BY user_id, item),
        |br AS (SELECT user_id, item, row_number() OVER
        |  (PARTITION BY user_id ORDER BY s DESC, item) AS rb FROM b),
        |f AS (SELECT coalesce(ar.user_id, br.user_id) AS user_id,
        |  coalesce(ar.item, br.item) AS item,
        |  round(coalesce(CAST(1.0 AS DOUBLE) / (60 + ra), 0) +
        |        coalesce(CAST(1.0 AS DOUBLE) / (60 + rb), 0), 6) AS rrf
        |  FROM ar FULL JOIN br
        |    ON ar.user_id = br.user_id AND ar.item = br.item),
        |r AS (SELECT user_id, item, rrf, row_number() OVER
        |  (PARTITION BY user_id ORDER BY rrf DESC, item) AS rnk FROM f)
        |SELECT user_id, item, rrf, CAST(rnk AS BIGINT) AS rank
        |FROM r WHERE rnk <= 3 ORDER BY user_id, rank""".stripMargin,

    "q115_target_encode" ->
      """WITH src AS (SELECT o_orderpriority AS cat,
        |  CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS label
        |  FROM orders),
        |p AS (SELECT round(CAST(sum(label) AS DOUBLE) / count(*), 6)
        |  AS prior FROM src)
        |SELECT cat, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(label) AS BIGINT) AS n_pos,
        |  round((sum(label) + CAST(20.0 AS DOUBLE) * (SELECT prior FROM p))
        |    / (count(*) + CAST(20.0 AS DOUBLE)), 6) AS enc
        |FROM src GROUP BY cat ORDER BY cat""".stripMargin,

    "q116_zorder_layout" -> {
      val zExpr = (0 until 10).map(i =>
        s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")
      s"""WITH src AS (SELECT l_partkey % 1024 AS x, l_suppkey % 1024 AS y
         |  FROM lineitem),
         |z AS (SELECT x, y, ($zExpr) AS zv FROM src)
         |SELECT CAST(zv >> 12 AS BIGINT) AS z_bucket,
         |  CAST(count(*) AS BIGINT) AS n,
         |  CAST(min(x) AS BIGINT) AS x_min, CAST(max(x) AS BIGINT) AS x_max,
         |  CAST(min(y) AS BIGINT) AS y_min, CAST(max(y) AS BIGINT) AS y_max
         |FROM z GROUP BY zv >> 12 ORDER BY z_bucket""".stripMargin
    },

    "q117_kmv_distinct" ->
      """WITH dh AS (SELECT DISTINCT event_type,
        |  ('0x' || substr(md5(user_id::VARCHAR), 1, 12))::BIGINT AS u
        |  FROM events),
        |kth AS (SELECT event_type, u AS uk FROM
        |  (SELECT event_type, u, row_number() OVER
        |    (PARTITION BY event_type ORDER BY u) AS rn FROM dh)
        |  WHERE rn = 64),
        |ex AS (SELECT event_type, count(*) AS exact_distinct FROM dh
        |  GROUP BY event_type),
        |est AS (SELECT ex.event_type,
        |  CAST(ex.exact_distinct AS BIGINT) AS exact_distinct,
        |  CASE WHEN kth.uk IS NULL THEN CAST(ex.exact_distinct AS DOUBLE)
        |    ELSE round(CAST(63 AS DOUBLE) * 281474976710656 / kth.uk, 4)
        |  END AS kmv_est
        |  FROM ex LEFT JOIN kth ON ex.event_type = kth.event_type)
        |SELECT event_type, exact_distinct, kmv_est,
        |  round(abs(kmv_est - exact_distinct) / exact_distinct, 4) AS rel_err
        |FROM est ORDER BY event_type""".stripMargin,

    "q118_mutual_info" ->
      """WITH joint AS (SELECT event_type AS x,
        |  CASE WHEN value > 100 THEN 1 ELSE 0 END AS y, count(*) AS nxy
        |  FROM events GROUP BY 1, 2),
        |mx AS (SELECT x, CAST(sum(nxy) AS BIGINT) AS nx FROM joint GROUP BY x),
        |my AS (SELECT y, CAST(sum(nxy) AS BIGINT) AS ny FROM joint GROUP BY y),
        |nn AS (SELECT CAST(sum(nxy) AS BIGINT) AS n FROM joint),
        |terms AS (SELECT n, CAST(round(
        |    (CAST(nxy AS DOUBLE) / n) *
        |    ln(CAST(nxy AS DOUBLE) * n / (CAST(nx AS DOUBLE) * ny)), 12)
        |  AS DECIMAL(28,14)) AS term
        |  FROM joint JOIN mx USING (x) JOIN my USING (y) CROSS JOIN nn)
        |SELECT round(CAST(sum(term) AS DOUBLE), 6) AS mi_nats,
        |  CAST(count(*) AS BIGINT) AS n_cells,
        |  CAST(max(n) AS BIGINT) AS n_rows
        |FROM terms""".stripMargin,

    "q119_cms_heavy_hitters" ->
      """WITH dd AS (SELECT unnest([0, 1, 2, 3]) AS d),
        |b AS (SELECT d,
        |  ('0x' || substr(md5(user_id::VARCHAR), d * 8 + 1, 8))::BIGINT % 64 AS bkt
        |  FROM events CROSS JOIN dd),
        |sketch AS (SELECT d, bkt, count(*) AS c FROM b GROUP BY d, bkt),
        |heavy AS (SELECT user_id, count(*) AS exact_c FROM events
        |  GROUP BY user_id ORDER BY exact_c DESC, user_id LIMIT 20),
        |est AS (SELECT h.user_id, h.exact_c, min(s.c) AS cms_est
        |  FROM heavy h CROSS JOIN dd
        |  JOIN sketch s ON s.d = dd.d AND s.bkt =
        |    ('0x' || substr(md5(h.user_id::VARCHAR), dd.d * 8 + 1, 8))::BIGINT % 64
        |  GROUP BY h.user_id, h.exact_c)
        |SELECT user_id, CAST(exact_c AS BIGINT) AS exact_c,
        |  CAST(cms_est AS BIGINT) AS cms_est,
        |  CAST(cms_est - exact_c AS BIGINT) AS overcount
        |FROM est ORDER BY exact_c DESC, user_id""".stripMargin,

    "q120_spearman" ->
      """WITH joint AS (SELECT l_returnflag AS g, l_quantity AS x,
        |  l_extendedprice AS y, count(*) AS w FROM lineitem GROUP BY 1, 2, 3),
        |hx AS (SELECT g, x, CAST(sum(w) AS BIGINT) AS n FROM joint GROUP BY g, x),
        |rx AS (SELECT g, x, 2 * coalesce(sum(n) OVER (PARTITION BY g ORDER BY x
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + n + 1 AS r2
        |  FROM hx),
        |hy AS (SELECT g, y, CAST(sum(w) AS BIGINT) AS n FROM joint GROUP BY g, y),
        |ry AS (SELECT g, y, 2 * coalesce(sum(n) OVER (PARTITION BY g ORDER BY y
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + n + 1 AS r2
        |  FROM hy),
        |tt AS (SELECT g, CAST(sum(w) AS HUGEINT) AS t FROM joint GROUP BY g),
        |j AS (SELECT joint.g, CAST(w AS HUGEINT) AS w,
        |  CAST(rx.r2 AS HUGEINT) - tt.t - 1 AS rx,
        |  CAST(ry.r2 AS HUGEINT) - tt.t - 1 AS ry
        |  FROM joint JOIN rx ON rx.g = joint.g AND rx.x = joint.x
        |  JOIN ry ON ry.g = joint.g AND ry.y = joint.y
        |  JOIN tt ON tt.g = joint.g),
        |m AS (SELECT g, sum(w) AS n,
        |  sum(w * rx * ry) AS sxy, sum(w * rx * rx) AS sxx,
        |  sum(w * ry * ry) AS syy FROM j GROUP BY g)
        |SELECT g AS l_returnflag,
        |  CASE WHEN sxx > 0 AND syy > 0 THEN
        |    round(CAST(sxy AS DOUBLE) /
        |      (sqrt(CAST(sxx AS DOUBLE)) * sqrt(CAST(syy AS DOUBLE))), 6)
        |  END AS spearman,
        |  CAST(n AS BIGINT) AS n
        |FROM m ORDER BY g""".stripMargin,

    "q121_token_entropy" ->
      """WITH tf AS (SELECT tok, count(*) AS c FROM
        |  (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY tok),
        |nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM tf),
        |t AS (SELECT n, CAST(round(
        |    -(CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n), 12)
        |  AS DECIMAL(28,14)) AS term FROM tf CROSS JOIN nn)
        |SELECT CAST(max(n) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS n_distinct,
        |  round(CAST(sum(term) AS DOUBLE), 6) AS entropy_nats,
        |  CASE WHEN count(*) > 1 THEN
        |    round(CAST(sum(term) AS DOUBLE) / ln(CAST(count(*) AS DOUBLE)), 6)
        |  END AS norm_entropy
        |FROM t""".stripMargin,

    "q122_js_divergence" ->
      """WITH tf AS (SELECT tok,
        |  CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |  CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok,
        |    CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS side FROM documents)
        |  GROUP BY tok),
        |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |  CAST(sum(cb) AS BIGINT) AS nb FROM tf),
        |pq AS (SELECT ca, cb, na, nb,
        |  CAST(ca AS DOUBLE) / na AS p, CAST(cb AS DOUBLE) / nb AS q
        |  FROM tf CROSS JOIN tot),
        |h AS (SELECT na, nb, CAST(round(
        |    (CASE WHEN ca > 0 THEN p * ln(p / ((p + q) / 2)) ELSE 0 END +
        |     CASE WHEN cb > 0 THEN q * ln(q / ((p + q) / 2)) ELSE 0 END) / 2, 12)
        |  AS DECIMAL(28,14)) AS term FROM pq)
        |SELECT CAST(max(na) AS BIGINT) AS n_tokens_a,
        |  CAST(max(nb) AS BIGINT) AS n_tokens_b,
        |  round(CAST(sum(term) AS DOUBLE), 6) AS js_nats
        |FROM h""".stripMargin,

    "q123_containment_join" ->
      s"""WITH $shinglesCte,
         |szs AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    sa.n AS na, count(*) AS inter
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
         |  JOIN szs sa ON sa.doc_id = a.doc_id
         |  JOIN szs sb ON sb.doc_id = b.doc_id
         |    AND CAST(sb.n AS DOUBLE) >= CAST(0.8 AS DOUBLE) * sa.n
         |  GROUP BY a.doc_id, b.doc_id, sa.n)
         |SELECT doc_a, doc_b,
         |  round(CAST(inter AS DOUBLE) / na, 6) AS containment
         |FROM pairs WHERE CAST(inter AS DOUBLE) >= CAST(0.8 AS DOUBLE) * na
         |ORDER BY doc_a, doc_b""".stripMargin,

    "q124_bloom_membership" ->
      """WITH ii AS (SELECT unnest([0, 1, 2, 3]) AS i),
        |top AS (SELECT o_custkey AS k FROM orders GROUP BY o_custkey
        |  ORDER BY count(*) DESC, o_custkey LIMIT 1000),
        |pos AS (SELECT k,
        |  ('0x' || substr(md5(k::VARCHAR), i * 8 + 1, 8))::BIGINT % 8192 AS p
        |  FROM top CROSS JOIN ii),
        |fw AS (SELECT p // 32 AS w,
        |  bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS mask
        |  FROM pos GROUP BY p // 32),
        |pr AS (SELECT c_custkey, c_mktsegment,
        |  ('0x' || substr(md5(c_custkey::VARCHAR), i * 8 + 1, 8))::BIGINT % 8192 AS p
        |  FROM customer CROSS JOIN ii),
        |pb AS (SELECT c_custkey, c_mktsegment,
        |  min(CASE WHEN fw.mask IS NOT NULL AND
        |    (fw.mask & (1::BIGINT << CAST(pr.p % 32 AS INT))) <> 0
        |    THEN 1 ELSE 0 END) AS pos
        |  FROM pr LEFT JOIN fw ON fw.w = pr.p // 32
        |  GROUP BY c_custkey, c_mktsegment),
        |mem AS (SELECT pb.c_mktsegment, pb.pos,
        |  CASE WHEN t.k IS NULL THEN 0 ELSE 1 END AS istrue
        |  FROM pb LEFT JOIN top t ON t.k = pb.c_custkey)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_probed,
        |  CAST(sum(pos) AS BIGINT) AS n_bloom_pos,
        |  CAST(sum(istrue) AS BIGINT) AS n_member,
        |  CAST(sum(pos) - sum(istrue) AS BIGINT) AS n_false_pos
        |FROM mem GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q125_tpch_q18" ->
      """WITH big AS (SELECT l_orderkey,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty FROM lineitem
        |  GROUP BY l_orderkey HAVING CAST(sum(l_quantity) AS BIGINT) > 150)
        |SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
        |FROM big JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY sum_qty DESC, o_orderkey LIMIT 100""".stripMargin,

    "q126_decayed_popularity" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tsu FROM events
        |  WHERE ts IS NOT NULL),
        |r AS (SELECT max(tsu) AS ref FROM e),
        |w AS (SELECT user_id,
        |  least((ref - tsu) // 2592000000000, 20) AS k FROM e CROSS JOIN r),
        |s AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  sum(CAST(1 AS DOUBLE) / CAST(1::BIGINT << CAST(k AS INT) AS DOUBLE))
        |    AS decayed_score
        |  FROM w GROUP BY user_id)
        |SELECT user_id, n_events, decayed_score FROM s
        |ORDER BY decayed_score DESC, user_id LIMIT 100""".stripMargin,

    "q127_robust_scale" ->
      """WITH st AS (SELECT c_mktsegment,
        |  round(quantile_cont(c_acctbal, 0.5), 6) AS med,
        |  round(quantile_cont(c_acctbal, 0.75) -
        |        quantile_cont(c_acctbal, 0.25), 6) AS iqr
        |  FROM customer GROUP BY c_mktsegment)
        |SELECT c_custkey, c.c_mktsegment, c_acctbal,
        |  CASE WHEN iqr <> 0
        |    THEN round((c_acctbal - med) / iqr, 4) END AS c_acctbal_robust
        |FROM customer c JOIN st ON st.c_mktsegment = c.c_mktsegment
        |ORDER BY c_custkey""".stripMargin,

    "q128_tpch_q10" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4)
        |                AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1995-07-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q130_tpch_q6" ->
      """SELECT CAST(sum(CAST(round(l_extendedprice * l_discount, 4)
        |                AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= CAST(0.05 AS DOUBLE)
        |  AND l_discount <= CAST(0.07 AS DOUBLE)
        |  AND l_quantity < 24""".stripMargin,

    "q131_tpch_q14" ->
      """SELECT round(100 * CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
        |      THEN round(l_extendedprice * (1 - l_discount), 4) ELSE 0 END
        |      AS DECIMAL(18,4))) AS DOUBLE)
        |    / CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4)
        |      AS DECIMAL(18,4))) AS DOUBLE), 6) AS promo_pct,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin,

    "q133_tpch_q13" ->
      """WITH co AS (SELECT c_custkey,
        |  CAST(count(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM co GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q132_histogram_quantile" ->
      """WITH b AS (SELECT o_orderpriority AS g,
        |  CAST(least(floor(o_totalprice / CAST(5000 AS DOUBLE)), 199) AS BIGINT)
        |    AS bin, count(*) AS c
        |  FROM orders GROUP BY 1, 2),
        |cum AS (SELECT g, bin, c,
        |  coalesce(sum(c) OVER (PARTITION BY g ORDER BY bin
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
        |  FROM b),
        |tot AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM b GROUP BY g),
        |est AS (SELECT cum.g,
        |  round(CAST(5000 AS DOUBLE) * (bin +
        |    (CAST(0.95 AS DOUBLE) * n - below) / c), 6) AS q_est
        |  FROM cum JOIN tot ON tot.g = cum.g
        |  WHERE below < CAST(0.95 AS DOUBLE) * n
        |    AND CAST(0.95 AS DOUBLE) * n <= below + c),
        |ex AS (SELECT o_orderpriority AS g,
        |  round(quantile_cont(o_totalprice, 0.95), 6) AS q_exact
        |  FROM orders GROUP BY 1)
        |SELECT est.g AS o_orderpriority, q_est, q_exact,
        |  round(abs(q_est - q_exact), 6) AS abs_err
        |FROM est JOIN ex ON ex.g = est.g ORDER BY 1""".stripMargin,

    "q134_interval_overlap" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS lo,
        |  epoch_us(ts) + CAST(floor(value * 1000000) AS BIGINT) AS hi
        |  FROM events)
        |SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
        |  least(a.hi, b.hi) - greatest(a.lo, b.lo) AS overlap_us
        |FROM e a JOIN e b ON a.user_id = b.user_id
        |  AND a.event_id < b.event_id
        |  AND a.lo <= b.hi AND b.lo <= a.hi
        |ORDER BY 1, 2, 3""".stripMargin,

    "q135_triangle_count" ->
      """WITH raw AS (SELECT l1.l_suppkey AS sa, l2.l_suppkey AS sb
        |  FROM lineitem l1 JOIN lineitem l2
        |    ON l1.l_orderkey = l2.l_orderkey
        |   AND l1.l_suppkey < l2.l_suppkey
        |  WHERE (l1.l_suppkey * 31 + l2.l_suppkey) % 20 = 0),
        |e AS (SELECT DISTINCT least(sa, sb) AS a, greatest(sa, sb) AS b
        |  FROM raw WHERE sa <> sb),
        |nodes AS (SELECT CAST(count(DISTINCT n) AS BIGINT) AS n_nodes FROM
        |  (SELECT a AS n FROM e UNION ALL SELECT b FROM e)),
        |deg AS (SELECT n, count(*) AS d FROM
        |  (SELECT a AS n FROM e UNION ALL SELECT b FROM e) GROUP BY n),
        |o AS (SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND e.a < e.b)
        |    THEN e.a ELSE e.b END AS src,
        |  CASE WHEN da.d < db.d OR (da.d = db.d AND e.a < e.b)
        |    THEN e.b ELSE e.a END AS dst
        |  FROM e JOIN deg da ON da.n = e.a JOIN deg db ON db.n = e.b),
        |w AS (SELECT o1.src, o1.dst AS v, o2.dst AS w FROM o o1
        |  JOIN o o2 ON o1.src = o2.src AND o1.dst < o2.dst),
        |tri AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles FROM w
        |  WHERE EXISTS (SELECT 1 FROM e
        |    WHERE e.a = least(w.v, w.w) AND e.b = greatest(w.v, w.w)))
        |SELECT (SELECT n_nodes FROM nodes) AS n_nodes,
        |  (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
        |  (SELECT CAST(count(*) AS BIGINT) FROM w) AS n_wedges,
        |  (SELECT n_triangles FROM tri) AS n_triangles""".stripMargin,

    "q136_bloom_prefilter_join" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 400000
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q129_pagerank" -> {
      def iter(i: Int) =
        s"""c$i AS (SELECT e.ed AS node,
           |  sum(CAST(round(r.rank / dg.deg, 14) AS DECIMAL(30,16))) AS s
           |  FROM edg e JOIN r${i - 1} r ON r.node = e.es
           |  JOIN dg ON dg.node = e.es
           |  GROUP BY e.ed),
           |r$i AS (SELECT n.node,
           |  round(CAST(0.15 AS DOUBLE) / nn.n + CAST(0.85 AS DOUBLE) *
           |    coalesce(CAST(c.s AS DOUBLE), 0), 12) AS rank
           |  FROM nd n CROSS JOIN nn LEFT JOIN c$i c ON c.node = n.node)""".stripMargin
      s"""WITH $shinglesCte,
         |${minhashSig(4, 2)},
         |pairs AS (${minhashPairs(4, 2)}),
         |edg AS (SELECT doc_a AS es, doc_b AS ed FROM pairs
         |        UNION ALL SELECT doc_b, doc_a FROM pairs),
         |nd AS (SELECT doc_id AS node FROM documents),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nd),
         |dg AS (SELECT es AS node, CAST(count(*) AS DOUBLE) AS deg
         |       FROM edg GROUP BY es),
         |r0 AS (SELECT node, round(CAST(1 AS DOUBLE) / nn.n, 12) AS rank
         |       FROM nd CROSS JOIN nn),
         |${iter(1)},
         |${iter(2)},
         |${iter(3)}
         |SELECT node AS doc_id, round(rank, 6) AS rank
         |FROM r3 ORDER BY doc_id""".stripMargin
    },

    "q137_tpch_q4" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q138_tpch_q12" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q139_tpch_q15" ->
      """WITH rev AS (SELECT l_suppkey,
        |  sum(CAST(round(l_extendedprice * (1 - l_discount), 4)
        |    AS DECIMAL(18,4))) AS r
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE r = (SELECT max(r) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q140_tpch_q17" ->
      """WITH pp AS (SELECT l_partkey AS pk,
        |  CAST(sum(l_quantity) AS BIGINT) AS sq,
        |  CAST(count(*) AS BIGINT) AS cq
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
        |    AS DOUBLE) / 7.0, 4) AS avg_yearly,
        |  CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |  AND p_brand = 'Brand#1' AND p_type = 'SMALL'
        |JOIN pp ON l_partkey = pk
        |WHERE CAST(l_quantity AS BIGINT) * 5 * cq < sq""".stripMargin,

    "q141_tpch_q19" ->
      """SELECT CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4)
        |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 1 AND 11)
        |  OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
        |    AND l_quantity BETWEEN 10 AND 20)
        |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
        |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q142_tpch_q21" ->
      """WITH cand AS (SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
        |  FROM lineitem l1
        |  WHERE EXISTS (SELECT 1 FROM lineitem l2
        |      WHERE l2.l_orderkey = l1.l_orderkey
        |        AND l2.l_suppkey <> l1.l_suppkey)
        |    AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |      WHERE l3.l_orderkey = l1.l_orderkey
        |        AND l3.l_suppkey <> l1.l_suppkey
        |        AND l3.l_shipdate > l1.l_shipdate))
        |SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM cand JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_suppkey, s_name
        |ORDER BY numwait DESC, s_suppkey""".stripMargin,

    "q143_tpch_q22" ->
      """WITH g AS (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS s,
        |  CAST(count(*) AS BIGINT) AS n
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer, g
        |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n > s
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND o_orderpriority = '1-URGENT')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q144_tpch_q7" ->
      """SELECT supp_nation, cust_nation, l_year,
        |  CAST(sum(volume) AS DOUBLE) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_lines
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    CAST(year(l_shipdate) AS INT) AS l_year,
        |    CAST(round(l_extendedprice * (1 - l_discount), 4)
        |      AS DECIMAL(18,4)) AS volume
        |  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |    AND l_shipdate >= TIMESTAMP '1995-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01')
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q145_tpch_q8" ->
      """WITH vol AS (
        |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |    CAST(round(l_extendedprice * (1 - l_discount), 4)
        |      AS DECIMAL(18,4)) AS volume,
        |    n2.n_name AS supp_nation
        |  FROM part JOIN lineitem ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'ASIA' AND p_type = 'PROMO')
        |SELECT o_year,
        |  round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
        |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        |    / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share,
        |  CAST(count(*) AS BIGINT) AS n_lines
        |FROM vol GROUP BY o_year ORDER BY o_year""".stripMargin,

    "q146_chunk_documents" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents),
        |base AS (SELECT doc_id, t, len(t) AS n FROM toks),
        |chunks AS (SELECT doc_id, t, unnest(range(0,
        |    CASE WHEN n <= 16 THEN 1
        |      ELSE CAST(ceil((n - 16) / 12.0) AS BIGINT) + 1 END)) AS cid
        |  FROM base),
        |c AS (SELECT doc_id, cid,
        |    t[cid * 12 + 1 : cid * 12 + 16] AS ct
        |  FROM chunks)
        |SELECT doc_id, CAST(cid AS BIGINT) AS chunk_id,
        |  CAST(cid * 12 + 1 AS BIGINT) AS start_pos,
        |  CAST(len(ct) AS BIGINT) AS chunk_len,
        |  md5(array_to_string(ct, ' ')) AS chunk_md5
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    "q147_random_projection" -> {
      val proj = (0 until 8).map(j =>
        s"max(CASE WHEN j = $j THEN v END) AS p$j").mkString(", ")
      s"""WITH signs AS (SELECT i, j,
         |    CASE WHEN substr(md5(i || ':' || j), 1, 1) < '8'
         |      THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END AS s
         |  FROM (SELECT unnest(range(0, 64)) AS i),
         |    (SELECT unnest(range(0, 8)) AS j)),
         |tok AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
         |    unnest(embedding::DOUBLE[]) AS x
         |  FROM embeddings),
         |terms AS (SELECT vec_id, j,
         |    CAST(round(x * s, 8) AS DECIMAL(20,8)) AS t
         |  FROM tok JOIN signs USING (i)),
         |p AS (SELECT vec_id, j,
         |    round(CAST(sum(t) AS DOUBLE) / sqrt(8.0), 4) AS v
         |  FROM terms GROUP BY vec_id, j)
         |SELECT vec_id, $proj FROM p GROUP BY vec_id
         |ORDER BY vec_id""".stripMargin
    },

    "q148_ks_statistic" ->
      """WITH s AS (SELECT round(value, 6) AS sc,
        |    CASE WHEN event_type IN ('click', 'purchase') THEN 1 ELSE 0
        |      END AS y
        |  FROM events),
        |h AS (SELECT sc, CAST(sum(y) AS DECIMAL(38,0)) AS np,
        |    CAST(count(*) - sum(y) AS DECIMAL(38,0)) AS nn
        |  FROM s GROUP BY sc),
        |c AS (SELECT sc, sum(np) OVER (ORDER BY sc) AS cp,
        |    sum(nn) OVER (ORDER BY sc) AS cn FROM h),
        |tot AS (SELECT CAST(sum(y) AS DECIMAL(38,0)) AS p,
        |    CAST(count(*) - sum(y) AS DECIMAL(38,0)) AS n FROM s)
        |SELECT round(CAST(max(abs(cp * n - cn * p)) AS DOUBLE)
        |    / CAST(p * n AS DOUBLE), 6) AS ks,
        |  CAST(max(p) AS BIGINT) AS n_pos, CAST(max(n) AS BIGINT) AS n_neg
        |FROM c, tot GROUP BY p, n""".stripMargin,

    "q149_decile_lift" ->
      """WITH s AS (SELECT round(value, 6) AS sc,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |h AS (SELECT sc, count(*) AS n, sum(y) AS np FROM s GROUP BY sc),
        |c AS (SELECT sc, n, np,
        |    coalesce(sum(n) OVER (ORDER BY sc DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |  FROM h),
        |tot AS (SELECT count(*) AS tn, sum(y) AS tp FROM s),
        |d AS (SELECT CAST(cb * 10 // tn AS INT) AS decile, n, np
        |  FROM c, tot),
        |g AS (SELECT decile, sum(n) AS n, sum(np) AS np FROM d
        |  GROUP BY decile),
        |cum AS (SELECT decile, n, np, sum(n) OVER (ORDER BY decile) AS cn,
        |    sum(np) OVER (ORDER BY decile) AS cp FROM g)
        |SELECT decile, CAST(n AS BIGINT) AS n,
        |  CAST(np AS BIGINT) AS n_pos, CAST(cn AS BIGINT) AS cum_n,
        |  CAST(cp AS BIGINT) AS cum_pos,
        |  round(CAST(cp * tn AS DOUBLE) / CAST(cn * tp AS DOUBLE), 4)
        |    AS lift,
        |  round(CAST(cp AS DOUBLE) / tp, 4) AS capture
        |FROM cum, tot ORDER BY decile""".stripMargin,

    "q150_dup_spans" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents),
        |sh AS (SELECT doc_id, generate_subscripts(gl, 1) AS pos,
        |    unnest(gl) AS g
        |  FROM (SELECT doc_id, list_transform(range(len(t) - 4),
        |      i -> md5(array_to_string(t[i + 1 : i + 5], ' '))) AS gl
        |    FROM toks WHERE len(t) >= 5)),
        |dup AS (SELECT g FROM sh GROUP BY g
        |  HAVING min(doc_id) <> max(doc_id)),
        |cov AS (SELECT DISTINCT doc_id, pos + o AS p
        |  FROM (SELECT doc_id, pos FROM sh
        |    WHERE g IN (SELECT g FROM dup)),
        |    (SELECT unnest(range(0, 5)) AS o)),
        |cnt AS (SELECT doc_id, count(*) AS dup_tokens FROM cov
        |  GROUP BY doc_id),
        |base AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
        |  FROM documents)
        |SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
        |  CAST(coalesce(c.dup_tokens, 0) AS BIGINT) AS dup_tokens,
        |  round(CAST(coalesce(c.dup_tokens, 0) AS DOUBLE) / b.n_tokens, 4)
        |    AS dup_frac
        |FROM base b LEFT JOIN cnt c ON b.doc_id = c.doc_id
        |ORDER BY b.doc_id""".stripMargin,

    "q151_cohens_kappa" ->
      """WITH r AS (SELECT CASE WHEN value > 100 THEN 1 ELSE 0 END AS r1,
        |    CASE WHEN event_type IN ('purchase', 'signup') THEN 1 ELSE 0
        |      END AS r2
        |  FROM events),
        |cell AS (SELECT r1, r2, CAST(count(*) AS DECIMAL(38,0)) AS c
        |  FROM r GROUP BY r1, r2),
        |m1 AS (SELECT r1 AS cat, sum(c) AS c1 FROM cell GROUP BY r1),
        |m2 AS (SELECT r2 AS cat, sum(c) AS c2 FROM cell GROUP BY r2),
        |agree AS (SELECT sum(CASE WHEN r1 = r2 THEN c ELSE 0 END) AS a,
        |    sum(c) AS n FROM cell),
        |pe AS (SELECT sum(c1 * c2) AS e FROM m1 JOIN m2 USING (cat))
        |SELECT CAST(n AS BIGINT) AS n,
        |  round(CAST(a AS DOUBLE) / CAST(n AS DOUBLE), 6) AS po,
        |  round(CAST(e AS DOUBLE) / CAST(n * n AS DOUBLE), 6) AS pe,
        |  round(CAST(n * a - e AS DOUBLE) / CAST(n * n - e AS DOUBLE), 6)
        |    AS kappa
        |FROM agree, pe""".stripMargin,

    "q152_ab_test" ->
      """WITH u AS (SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS conv,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
        |      % 2 AS arm
        |  FROM events GROUP BY user_id),
        |c AS (SELECT
        |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS na,
        |    CAST(sum(CASE WHEN arm <> 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS nb,
        |    CAST(sum(CASE WHEN arm = 0 AND conv = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN arm <> 0 AND conv = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS cb
        |  FROM u),
        |m AS (SELECT na, nb, ca, cb,
        |    CAST(ca AS DOUBLE) / na AS pa, CAST(cb AS DOUBLE) / nb AS pb,
        |    CAST(ca + cb AS DOUBLE) / (na + nb) AS pp
        |  FROM c),
        |z AS (SELECT *, CASE WHEN na > 0 AND nb > 0
        |      AND pp > 0.0 AND pp < 1.0
        |    THEN (pb - pa) / sqrt(pp * (1.0 - pp) *
        |      (1.0 / na + 1.0 / nb)) END AS zz
        |  FROM m)
        |SELECT na AS n_a, nb AS n_b, ca AS conv_a, cb AS conv_b,
        |  round(pa, 6) AS rate_a, round(pb, 6) AS rate_b,
        |  round(pb - pa, 6) AS diff, round(zz, 4) AS z,
        |  CAST(CASE WHEN abs(zz) > 1.96 THEN 1 ELSE 0 END AS INT)
        |    AS significant
        |FROM z""".stripMargin,

    "q153_vocab_coverage" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |h AS (SELECT token, CAST(count(*) AS BIGINT) AS tf FROM t
        |  GROUP BY token),
        |r AS (SELECT token, tf,
        |    row_number() OVER (ORDER BY tf DESC, token) AS rk FROM h),
        |tot AS (SELECT CAST(sum(tf) AS DOUBLE) AS tt FROM h),
        |top AS (SELECT * FROM r WHERE rk <= 20)
        |SELECT a.token, a.tf, CAST(a.rk AS BIGINT) AS rnk,
        |  CAST(sum(b.tf) AS BIGINT) AS cum_tf,
        |  round(CAST(sum(b.tf) AS DOUBLE) / max(tt), 6) AS coverage
        |FROM top a JOIN top b ON b.rk <= a.rk, tot
        |GROUP BY a.token, a.tf, a.rk
        |ORDER BY rnk""".stripMargin,

    "q154_hll_distinct" ->
      """WITH src AS (SELECT CAST(floor(value / 100.0) AS BIGINT) AS vb,
        |  event_id FROM events),
        |dh AS (SELECT DISTINCT vb,
        |  ('0x' || substr(md5(event_id::VARCHAR), 1, 12))::BIGINT AS u
        |  FROM src),
        |slots AS (SELECT vb, u // 1099511627776 AS b,
        |  u % 1099511627776 AS rem FROM dh),
        |regs AS (SELECT vb, b,
        |  max(CASE WHEN rem = 0 THEN 41 ELSE 41 - length(bin(rem)) END) AS r
        |  FROM slots GROUP BY 1, 2),
        |agg AS (SELECT vb, count(*) AS nregs,
        |  CAST(sum(1::BIGINT << (41 - r)) AS BIGINT) AS s
        |  FROM regs GROUP BY 1),
        |ex AS (SELECT vb, CAST(count(*) AS BIGINT) AS exact_distinct
        |  FROM dh GROUP BY 1),
        |est AS (SELECT ex.vb, exact_distinct, 256 - nregs AS v,
        |  0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 2199023255552.0 /
        |    (s + (256 - nregs) * 2199023255552.0) AS e_raw
        |  FROM ex JOIN agg USING (vb)),
        |fin AS (SELECT vb, exact_distinct,
        |  round(CASE WHEN v > 0 AND e_raw <= 640.0
        |    THEN 256.0 * ln(256.0 / v) ELSE e_raw END, 4) AS hll_est
        |  FROM est)
        |SELECT vb, exact_distinct, hll_est,
        |  round(abs(hll_est - exact_distinct) / exact_distinct, 4)
        |    AS rel_err
        |FROM fin ORDER BY vb""".stripMargin,

    "q155_scd2" ->
      """WITH ordered AS (SELECT user_id, ts, event_id, event_type,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS prev
        |  FROM events),
        |changes AS (SELECT user_id, ts, event_id, event_type FROM ordered
        |  WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id, event_type, epoch_us(ts) AS valid_from,
        |  lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS valid_to,
        |  CAST(CASE WHEN lead(ts) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |    THEN 1 ELSE 0 END AS INT) AS is_current
        |FROM changes ORDER BY user_id, valid_from""".stripMargin,

    "q156_attribution" ->
      """WITH convs AS (SELECT user_id, ts, event_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS rn
        |  FROM events WHERE event_type = 'purchase'),
        |fc AS (SELECT user_id, ts AS cts, event_id AS cid FROM convs
        |  WHERE rn = 1),
        |touches AS (SELECT e.user_id, e.event_type,
        |    row_number() OVER (PARTITION BY e.user_id
        |      ORDER BY e.ts, e.event_id) AS rn_first,
        |    row_number() OVER (PARTITION BY e.user_id
        |      ORDER BY e.ts DESC, e.event_id DESC) AS rn_last
        |  FROM events e JOIN fc ON e.user_id = fc.user_id
        |  WHERE e.ts < fc.cts OR (e.ts = fc.cts AND e.event_id < fc.cid)),
        |ft AS (SELECT event_type AS channel,
        |  CAST(count(*) AS BIGINT) AS first_touch
        |  FROM touches WHERE rn_first = 1 GROUP BY 1),
        |lt AS (SELECT event_type AS channel,
        |  CAST(count(*) AS BIGINT) AS last_touch
        |  FROM touches WHERE rn_last = 1 GROUP BY 1)
        |SELECT coalesce(ft.channel, lt.channel) AS channel,
        |  coalesce(first_touch, 0) AS first_touch,
        |  coalesce(last_touch, 0) AS last_touch
        |FROM ft FULL OUTER JOIN lt
        |  ON ft.channel IS NOT DISTINCT FROM lt.channel
        |ORDER BY channel""".stripMargin,

    "q157_gini" ->
      """WITH cnt AS (SELECT event_type, user_id, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |hist AS (SELECT event_type, c, count(*) AS f FROM cnt
        |  GROUP BY 1, 2),
        |cum AS (SELECT event_type, c, f,
        |  coalesce(sum(f) OVER (PARTITION BY event_type ORDER BY c
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS below
        |  FROM hist),
        |terms AS (SELECT event_type,
        |  CAST(sum(f) AS BIGINT) AS n, CAST(sum(c * f) AS BIGINT) AS tot,
        |  CAST(sum(c * (f * below + (f * (f + 1)) // 2)) AS DECIMAL(38,0))
        |    AS s
        |  FROM cum GROUP BY 1)
        |SELECT event_type, n AS n_keys, tot AS n_total,
        |  round(2.0 * CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * tot) -
        |    (n + 1.0) / n, 6) AS gini
        |FROM terms ORDER BY event_type""".stripMargin,

    "q158_ecdf" ->
      """WITH h AS (SELECT round(value, 6) AS v, count(*) AS c
        |  FROM events GROUP BY 1),
        |cum AS (SELECT v, CAST(c AS BIGINT) AS c,
        |  CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS n_le FROM h),
        |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM events)
        |SELECT v, c, n_le, round(n_le / n, 6) AS ecdf
        |FROM cum, tot ORDER BY v""".stripMargin,

    "q159_kfold_balance" ->
      """WITH f AS (SELECT
        |  ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT % 5
        |    AS fold,
        |  CASE WHEN value > 100 THEN 1 ELSE 0 END AS y, user_id
        |  FROM events)
        |SELECT fold, CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_keys,
        |  CAST(sum(y) AS BIGINT) AS n_pos,
        |  round(CAST(sum(y) AS DOUBLE) / count(*), 6) AS pos_rate
        |FROM f GROUP BY fold ORDER BY fold""".stripMargin,

    "q160_product_quantize" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
        |  FROM embeddings),
        |js AS (SELECT unnest(generate_series(0, 7)) AS j),
        |sub AS (SELECT vec_id, j, emb[j*8+1 : j*8+8] AS sv FROM e, js),
        |cent AS (SELECT vec_id AS c_id, j, sv AS cv FROM sub
        |  WHERE vec_id < 16),
        |d AS (SELECT s.vec_id, s.j, c.c_id,
        |  list_dot_product(s.sv, s.sv) - 2.0 * list_dot_product(s.sv, c.cv)
        |    + list_dot_product(c.cv, c.cv) AS d2
        |  FROM sub s JOIN cent c ON s.j = c.j),
        |best AS (SELECT vec_id, j, c_id, d2,
        |  row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, c_id)
        |    AS rn
        |  FROM d)
        |SELECT vec_id,
        |  CAST(max(CASE WHEN j = 0 THEN c_id END) AS BIGINT) AS code0,
        |  CAST(max(CASE WHEN j = 1 THEN c_id END) AS BIGINT) AS code1,
        |  CAST(max(CASE WHEN j = 2 THEN c_id END) AS BIGINT) AS code2,
        |  CAST(max(CASE WHEN j = 3 THEN c_id END) AS BIGINT) AS code3,
        |  CAST(max(CASE WHEN j = 4 THEN c_id END) AS BIGINT) AS code4,
        |  CAST(max(CASE WHEN j = 5 THEN c_id END) AS BIGINT) AS code5,
        |  CAST(max(CASE WHEN j = 6 THEN c_id END) AS BIGINT) AS code6,
        |  CAST(max(CASE WHEN j = 7 THEN c_id END) AS BIGINT) AS code7,
        |  round(sqrt(CAST(sum(CAST(round(d2, 12) AS DECIMAL(28,14)))
        |    AS DOUBLE)), 6) AS recon_err
        |FROM best WHERE rn = 1 GROUP BY vec_id
        |ORDER BY vec_id""".stripMargin,

    "q161_random_walk" ->
      """WITH cp AS (SELECT DISTINCT l_partkey AS p, o_custkey AS c
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |pn AS (SELECT p, c,
        |  row_number() OVER (PARTITION BY p ORDER BY c) - 1 AS rn,
        |  count(*) OVER (PARTITION BY p) AS deg FROM cp),
        |cn AS (SELECT c, p,
        |  row_number() OVER (PARTITION BY c ORDER BY p) - 1 AS rn,
        |  count(*) OVER (PARTITION BY c) AS deg FROM cp),
        |starts AS (SELECT DISTINCT p FROM cp WHERE p < 100),
        |w AS (SELECT p, unnest([0, 1]) AS wid FROM starts),
        |s1 AS (SELECT w.p, w.wid, pn.c
        |  FROM w JOIN pn ON pn.p = w.p
        |  AND pn.rn = ('0x' || substr(md5(w.p::VARCHAR || ':' || w.wid
        |    || ':1'), 1, 8))::BIGINT % pn.deg),
        |s2 AS (SELECT s1.p, s1.wid, s1.c, cn.p AS p2
        |  FROM s1 JOIN cn ON cn.c = s1.c
        |  AND cn.rn = ('0x' || substr(md5(s1.c::VARCHAR || ':' || s1.wid
        |    || ':2'), 1, 8))::BIGINT % cn.deg)
        |SELECT p AS start_node, CAST(wid AS BIGINT) AS walk_id,
        |  c AS via_node, p2 AS end_node
        |FROM s2 ORDER BY start_node, walk_id""".stripMargin,

    "q162_join_size_estimate" ->
      """WITH dd AS (SELECT unnest([0, 1, 2, 3]) AS d),
        |ba AS (SELECT d,
        |  ('0x' || substr(md5(o_custkey::VARCHAR), d * 8 + 1, 8))::BIGINT
        |    % 1024 AS b,
        |  count(*) AS ca FROM orders CROSS JOIN dd GROUP BY 1, 2),
        |bb AS (SELECT d,
        |  ('0x' || substr(md5(c_custkey::VARCHAR), d * 8 + 1, 8))::BIGINT
        |    % 1024 AS b,
        |  count(*) AS cb FROM customer CROSS JOIN dd GROUP BY 1, 2),
        |est0 AS (SELECT ba.d, CAST(sum(ca * cb) AS DECIMAL(38,0)) AS e
        |  FROM ba JOIN bb ON ba.d = bb.d AND ba.b = bb.b GROUP BY ba.d),
        |est AS (SELECT dd.d, coalesce(e, 0) AS e
        |  FROM dd LEFT JOIN est0 ON dd.d = est0.d),
        |ex AS (SELECT CAST(count(*) AS BIGINT) AS exact_size
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |SELECT exact_size, CAST(min(e) AS BIGINT) AS cms_est,
        |  CAST(CAST(min(e) AS BIGINT) - exact_size AS BIGINT) AS overcount
        |FROM est, ex GROUP BY exact_size""".stripMargin,

    "q163_hits" ->
      """WITH e AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p
        |  FROM lineitem),
        |a1 AS (SELECT p, CAST(count(*) AS DECIMAL(28,9)) AS a FROM e
        |  GROUP BY p),
        |a1n AS (SELECT p, CAST(round(CAST(a AS DOUBLE) /
        |  CAST((SELECT max(a) FROM a1) AS DOUBLE), 9) AS DECIMAL(20,9))
        |    AS a FROM a1),
        |h1 AS (SELECT s, CAST(sum(a) AS DECIMAL(28,9)) AS h
        |  FROM e JOIN a1n USING (p) GROUP BY s),
        |h1n AS (SELECT s, CAST(round(CAST(h AS DOUBLE) /
        |  CAST((SELECT max(h) FROM h1) AS DOUBLE), 9) AS DECIMAL(20,9))
        |    AS h FROM h1),
        |a2 AS (SELECT p, CAST(sum(h) AS DECIMAL(28,9)) AS a
        |  FROM e JOIN h1n USING (s) GROUP BY p),
        |a2n AS (SELECT p, CAST(round(CAST(a AS DOUBLE) /
        |  CAST((SELECT max(a) FROM a2) AS DOUBLE), 9) AS DECIMAL(20,9))
        |    AS a FROM a2)
        |SELECT p AS node, CAST(a AS DOUBLE) AS authority FROM a2n
        |ORDER BY a DESC, p LIMIT 20""".stripMargin,

    "q164_boilerplate" ->
      """WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t
        |  FROM documents),
        |g AS (SELECT DISTINCT doc_id, source,
        |  t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
        |  FROM toks, (SELECT unnest(generate_series(1,
        |    (SELECT max(len(string_split(text, ' '))) FROM documents)))
        |    AS i)
        |  WHERE i + 2 <= len(t)),
        |df AS (SELECT source, gram, count(*) AS dfreq FROM g
        |  GROUP BY 1, 2)
        |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(count(*) FILTER (df.dfreq >= 2) AS BIGINT) AS n_boiler,
        |  round(CAST(count(*) FILTER (df.dfreq >= 2) AS DOUBLE)
        |    / count(*), 6) AS boiler_frac
        |FROM g JOIN df ON g.source = df.source AND g.gram = df.gram
        |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,

    "q165_zipf_fit" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |tf AS (SELECT token, count(*) AS tf FROM tok GROUP BY 1),
        |rk AS (SELECT token, tf,
        |  row_number() OVER (ORDER BY tf DESC, token) AS r FROM tf),
        |terms AS (SELECT
        |  CAST(round(ln(CAST(r AS DOUBLE)), 12) AS DECIMAL(28,14)) AS x,
        |  CAST(round(ln(CAST(tf AS DOUBLE)), 12) AS DECIMAL(28,14)) AS y
        |  FROM rk),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |  CAST(sum(CAST(round(CAST(x AS DOUBLE) * CAST(y AS DOUBLE), 12)
        |    AS DECIMAL(28,14))) AS DOUBLE) AS sxy,
        |  CAST(sum(CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE), 12)
        |    AS DECIMAL(28,14))) AS DOUBLE) AS sxx
        |  FROM terms),
        |sl AS (SELECT n_tokens, sx, sy,
        |  (n_tokens * sxy - sx * sy) / (n_tokens * sxx - sx * sx)
        |    AS slope FROM s)
        |SELECT n_tokens, round(slope, 6) AS slope,
        |  round((sy - slope * sx) / n_tokens, 6) AS intercept
        |FROM sl""".stripMargin,

    "q166_partition_checksum" ->
      """WITH neu AS (SELECT * FROM events
        |  WHERE NOT (event_type = 'click' AND value > 400)),
        |fo AS (SELECT event_type AS part, count(*) AS cnt,
        |  CAST(sum(('0x' || substr(md5(concat_ws(chr(1),
        |    coalesce(user_id::VARCHAR, chr(0)),
        |    coalesce(event_type, chr(0)))), 1, 12))::BIGINT)
        |    AS DECIMAL(38,0)) AS ck
        |  FROM events GROUP BY 1),
        |fn AS (SELECT event_type AS part, count(*) AS cnt,
        |  CAST(sum(('0x' || substr(md5(concat_ws(chr(1),
        |    coalesce(user_id::VARCHAR, chr(0)),
        |    coalesce(event_type, chr(0)))), 1, 12))::BIGINT)
        |    AS DECIMAL(38,0)) AS ck
        |  FROM neu GROUP BY 1)
        |SELECT coalesce(fo.part, fn.part) AS event_type,
        |  CASE WHEN fo.part IS NULL THEN 'added'
        |       WHEN fn.part IS NULL THEN 'removed'
        |       WHEN fo.cnt <> fn.cnt OR fo.ck <> fn.ck THEN 'changed'
        |  END AS status,
        |  CAST(coalesce(fo.cnt, 0) AS BIGINT) AS old_rows,
        |  CAST(coalesce(fn.cnt, 0) AS BIGINT) AS new_rows
        |FROM fo FULL OUTER JOIN fn ON fo.part = fn.part
        |WHERE fo.part IS NULL OR fn.part IS NULL
        |  OR fo.cnt <> fn.cnt OR fo.ck <> fn.ck
        |ORDER BY event_type""".stripMargin,

    "q167_benford" ->
      """WITH d AS (SELECT substr(CAST(CAST(round(value * 100.0, 0)
        |    AS BIGINT) AS VARCHAR), 1, 1)::INT AS digit
        |  FROM events WHERE value > 0),
        |obs AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs
        |  FROM d GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_obs) AS DOUBLE) AS n FROM obs)
        |SELECT digit, n_obs,
        |  round(n * log10(1.0 + 1.0 / digit), 4) AS exp_n,
        |  round((n_obs - n * log10(1.0 + 1.0 / digit)) *
        |    (n_obs - n * log10(1.0 + 1.0 / digit)) /
        |    (n * log10(1.0 + 1.0 / digit)), 4) AS chi2_term
        |FROM obs, tot ORDER BY digit""".stripMargin,

    "q168_typo_pairs" ->
      """WITH names AS (SELECT DISTINCT c_name AS t FROM customer),
        |v AS (SELECT t, CASE WHEN i = 0 THEN t
        |    ELSE substr(t, 1, i - 1) || substr(t, i + 1, length(t)) END
        |    AS var
        |  FROM names, (SELECT unnest(generate_series(0,
        |    (SELECT max(length(t)) FROM names))) AS i)
        |  WHERE i <= length(t)),
        |pairs AS (SELECT DISTINCT a.t AS t1, b.t AS t2
        |  FROM v a JOIN v b ON a.var = b.var AND a.t < b.t)
        |SELECT t1, t2 FROM pairs WHERE levenshtein(t1, t2) <= 1
        |ORDER BY t1, t2""".stripMargin,

    "q169_ri_audit" ->
      """WITH r1 AS (SELECT 'lineitem.l_orderkey->orders' AS relationship,
        |  CAST(count(*) AS BIGINT) AS n_child,
        |  CAST(count(*) FILTER (o_orderkey IS NULL) AS BIGINT)
        |    AS n_orphans
        |  FROM lineitem LEFT JOIN (SELECT DISTINCT o_orderkey
        |    FROM orders) o ON l_orderkey = o_orderkey),
        |r2 AS (SELECT 'orders.o_custkey->customer10',
        |  CAST(count(*) AS BIGINT),
        |  CAST(count(*) FILTER (c_custkey IS NULL) AS BIGINT)
        |  FROM orders LEFT JOIN (SELECT DISTINCT c_custkey
        |    FROM customer WHERE c_custkey >= 10) c
        |    ON o_custkey = c_custkey)
        |SELECT * FROM r1 UNION ALL SELECT * FROM r2
        |ORDER BY relationship""".stripMargin,

    "q170_curation_v2" ->
      """WITH toksb AS (SELECT doc_id, source, string_split(text, ' ') AS t
        |  FROM documents),
        |gb AS (SELECT DISTINCT doc_id, source,
        |  t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
        |  FROM toksb, (SELECT unnest(generate_series(1,
        |    (SELECT max(len(string_split(text, ' '))) FROM documents)))
        |    AS i)
        |  WHERE i + 2 <= len(t)),
        |dfb AS (SELECT source, gram, count(*) AS dfreq FROM gb
        |  GROUP BY 1, 2),
        |boiler AS (SELECT gb.doc_id FROM gb
        |  JOIN dfb ON gb.source = dfb.source AND gb.gram = dfb.gram
        |  GROUP BY gb.doc_id
        |  HAVING round(CAST(count(*) FILTER (dfb.dfreq >= 2) AS DOUBLE)
        |    / count(*), 6) <= 0.03),
        |sh AS (SELECT doc_id, generate_subscripts(gl, 1) AS pos,
        |    unnest(gl) AS g
        |  FROM (SELECT doc_id, list_transform(range(len(t) - 4),
        |      i -> md5(array_to_string(t[i + 1 : i + 5], ' '))) AS gl
        |    FROM toksb WHERE len(t) >= 5)),
        |dup AS (SELECT g FROM sh GROUP BY g
        |  HAVING min(doc_id) <> max(doc_id)),
        |cov AS (SELECT DISTINCT doc_id, pos + o AS p
        |  FROM (SELECT doc_id, pos FROM sh
        |    WHERE g IN (SELECT g FROM dup)),
        |    (SELECT unnest(range(0, 5)) AS o)),
        |spanok AS (SELECT d.doc_id FROM documents d LEFT JOIN
        |    (SELECT doc_id, count(*) AS dt FROM cov GROUP BY doc_id) c
        |    USING (doc_id)
        |  WHERE round(CAST(coalesce(c.dt, 0) AS DOUBLE) /
        |    len(string_split(d.text, ' ')), 4) <= 0.5),
        |kept AS (SELECT d.* FROM documents d
        |  JOIN boiler USING (doc_id) JOIN spanok USING (doc_id)),
        |n AS (SELECT source, doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM kept),
        |c AS (SELECT source, doc_id, n,
        |  coalesce(sum(n) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |  FROM n)
        |SELECT source, CAST(cb // 2048 AS BIGINT) AS bin,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n) AS BIGINT) AS n_tokens
        |FROM c GROUP BY source, bin ORDER BY source, bin""".stripMargin,

    "q171_theil_sen" ->
      """WITH m AS (SELECT o_orderpriority,
        |    CAST(date_diff('month', TIMESTAMP '1992-01-01', o_orderdate)
        |      AS BIGINT) AS mi,
        |    CAST(count(*) AS DOUBLE) AS n
        |  FROM orders GROUP BY 1, 2),
        |p AS (SELECT a.o_orderpriority,
        |    (b.n - a.n) / CAST(b.mi - a.mi AS DOUBLE) AS slope
        |  FROM m a JOIN m b ON a.o_orderpriority = b.o_orderpriority
        |    AND b.mi > a.mi)
        |SELECT o_orderpriority,
        |  round(quantile_cont(slope, 0.5), 6) + 0.0 AS ts_slope,
        |  CAST(count(*) AS BIGINT) AS n_pairs
        |FROM p GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q172_regr_trend" ->
      """WITH e AS (SELECT event_type, value,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS DOUBLE) AS day
        |  FROM events)
        |SELECT event_type,
        |  round(regr_slope(value, day), 6) AS slope,
        |  round(regr_intercept(value, day), 6) AS icept,
        |  round(regr_r2(value, day), 6) AS r2,
        |  CAST(regr_count(value, day) AS BIGINT) AS n
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q173_markov_transitions" ->
      """WITH o AS (SELECT event_type AS src,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS dst
        |  FROM events),
        |t AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS n FROM o
        |  WHERE dst IS NOT NULL GROUP BY 1, 2)
        |SELECT src, dst, n,
        |  round(CAST(n AS DOUBLE) /
        |    CAST(sum(n) OVER (PARTITION BY src) AS DOUBLE), 6) AS p
        |FROM t ORDER BY src, dst""".stripMargin,

    "q174_tukey_outliers" ->
      """WITH st AS (SELECT event_type,
        |    round(quantile_cont(value, 0.25), 6) AS q1,
        |    round(quantile_cont(value, 0.75), 6) AS q3
        |  FROM events GROUP BY 1),
        |f AS (SELECT event_type, q1 - 1.5 * (q3 - q1) AS lo,
        |    q3 + 1.5 * (q3 - q1) AS hi FROM st)
        |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(*) FILTER (value < lo OR value > hi) AS BIGINT)
        |    AS n_out,
        |  round(CAST(count(*) FILTER (value < lo OR value > hi) AS DOUBLE)
        |    / count(*), 6) AS out_frac,
        |  round(min(lo), 6) AS lo_fence,
        |  round(min(hi), 6) AS hi_fence
        |FROM events e JOIN f USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    "q175_cusum" ->
      """WITH daily AS (SELECT event_type,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS day,
        |    round(avg(value), 6) AS m
        |  FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, round(avg(m), 6) AS mu,
        |    round(stddev_samp(m), 6) AS sd
        |  FROM daily GROUP BY 1),
        |z AS (SELECT daily.event_type, day, (m - mu) / sd AS z
        |  FROM daily JOIN st USING (event_type)),
        |c AS (SELECT event_type, day,
        |    sum(z - 0.5) OVER w AS ch, sum(z + 0.5) OVER w AS cl
        |  FROM z WINDOW w AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |s AS (SELECT event_type, day,
        |    ch - least(min(ch) OVER w2, 0) AS s_hi,
        |    greatest(max(cl) OVER w2, 0) - cl AS s_lo
        |  FROM c WINDOW w2 AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_buckets,
        |  round(max(s_hi), 4) AS max_hi, round(max(s_lo), 4) AS max_lo,
        |  CAST(count(*) FILTER (s_hi > 4 OR s_lo > 4) AS BIGINT)
        |    AS n_alarm,
        |  min(day) FILTER (s_hi > 4 OR s_lo > 4) AS first_alarm
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,

    "q176_pareto_frontier" ->
      """WITH pts AS (SELECT CAST(count(*) AS BIGINT) AS n_orders,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
        |  FROM orders GROUP BY o_custkey),
        |d AS (SELECT DISTINCT n_orders, spend FROM pts)
        |SELECT n_orders, CAST(spend AS DOUBLE) AS spend FROM d a
        |WHERE NOT EXISTS (SELECT 1 FROM d b
        |  WHERE b.n_orders >= a.n_orders AND b.spend >= a.spend
        |    AND (b.n_orders > a.n_orders OR b.spend > a.spend))
        |ORDER BY n_orders DESC""".stripMargin,

    "q177_assoc_rules" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
        |  FROM lineitem),
        |ic AS (SELECT i, CAST(count(*) AS BIGINT) AS ci FROM it
        |  GROUP BY 1 HAVING count(*) >= 2),
        |f AS (SELECT it.b, it.i, ic.ci FROM it JOIN ic USING (i)),
        |co AS (SELECT a.i AS ant, b2.i AS cons,
        |    CAST(count(*) AS BIGINT) AS co,
        |    max(a.ci) AS ca, max(b2.ci) AS cc
        |  FROM f a JOIN f b2 ON a.b = b2.b AND a.i < b2.i
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |nb AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n
        |  FROM lineitem)
        |SELECT ant, cons, co, round(co / n, 6) AS support,
        |  round(CAST(co AS DOUBLE) / ca, 6) AS conf_ac,
        |  round(CAST(co AS DOUBLE) / cc, 6) AS conf_ca,
        |  round(co * n / (ca * cc), 6) AS lift
        |FROM co, nb ORDER BY ant, cons""".stripMargin,

    "q178_interarrival" ->
      """WITH g AS (SELECT user_id,
        |    epoch_us(ts) - lag(epoch_us(ts))
        |      OVER (PARTITION BY user_id ORDER BY ts) AS gap
        |  FROM events),
        |s AS (SELECT user_id, CAST(count(gap) AS BIGINT) AS n_gaps,
        |    round(avg(gap) / 1e6, 4) AS mean_gap_s,
        |    round(stddev_samp(gap) / 1e6, 4) AS sd_gap_s
        |  FROM g WHERE gap IS NOT NULL GROUP BY 1
        |  HAVING count(gap) >= 4)
        |SELECT user_id, n_gaps, mean_gap_s, sd_gap_s,
        |  CASE WHEN mean_gap_s > 0
        |    THEN round(sd_gap_s / mean_gap_s, 4) END AS cv,
        |  CASE WHEN sd_gap_s + mean_gap_s > 0
        |    THEN round((sd_gap_s - mean_gap_s)
        |      / (sd_gap_s + mean_gap_s), 4) END AS burstiness
        |FROM s ORDER BY user_id""".stripMargin,

    "q179_rolling_anomaly" ->
      """WITH daily AS (SELECT event_type,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS day,
        |    round(avg(value), 6) AS m
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, day, m,
        |    count(m) OVER win AS n,
        |    round(avg(m) OVER win, 6) AS mu,
        |    round(stddev_samp(m) OVER win, 6) AS sd
        |  FROM daily WINDOW win AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, day, m, mu AS baseline_mu,
        |  round((m - mu) / sd, 4) AS z
        |FROM w WHERE n >= 4 AND sd > 0
        |  AND abs(round((m - mu) / sd, 4)) > 2
        |ORDER BY event_type, day""".stripMargin,

    "q180_jaro_winkler" ->
      """WITH p AS (SELECT DISTINCT p_brand, p_size, p_name FROM part)
        |SELECT a.p_brand, a.p_size, a.p_name AS name_a,
        |  b.p_name AS name_b,
        |  round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw
        |FROM p a JOIN p b
        |  ON a.p_brand = b.p_brand AND a.p_size = b.p_size
        |  AND a.p_name < b.p_name
        |WHERE round(jaro_winkler_similarity(a.p_name, b.p_name), 6) >= 0.8
        |ORDER BY 1, 2, 3, 4""".stripMargin,

    "q181_autocorr" ->
      """WITH daily AS (SELECT event_type,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS day,
        |    CAST(count(*) AS DOUBLE) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT cur.event_type, CAST(count(*) AS BIGINT) AS n_pairs,
        |  round(corr(cur.n, prev.n), 4) AS acf_1
        |FROM daily cur JOIN daily prev
        |  ON cur.event_type = prev.event_type
        |  AND cur.day = prev.day + 1
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q182_rbo" ->
      """WITH rev AS (SELECT c_nationkey, l_partkey,
        |    sum(CAST(l_extendedprice * (1 - l_discount)
        |      AS DECIMAL(18,4))) AS r
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |nat AS (SELECT c_nationkey, l_partkey,
        |    row_number() OVER (PARTITION BY c_nationkey
        |      ORDER BY r DESC, l_partkey) AS ra
        |  FROM rev QUALIFY ra <= 10),
        |grev AS (SELECT l_partkey, sum(r) AS g FROM rev GROUP BY 1),
        |gtop AS (SELECT l_partkey,
        |    row_number() OVER (ORDER BY g DESC, l_partkey) AS rb
        |  FROM grev QUALIFY rb <= 10),
        |j AS (SELECT nat.c_nationkey, greatest(nat.ra, gtop.rb) AS m
        |  FROM nat JOIN gtop USING (l_partkey)),
        |d AS (SELECT c_nationkey, CAST(u.d AS BIGINT) AS d
        |  FROM j, unnest(generate_series(j.m, 10)) AS u(d)),
        |ov AS (SELECT c_nationkey, d, CAST(count(*) AS DOUBLE) AS ov
        |  FROM d GROUP BY 1, 2)
        |SELECT c_nationkey,
        |  round((1 - 0.9) * sum(ov / d * power(0.9, d - 1)), 6) AS rbo
        |FROM ov GROUP BY 1 ORDER BY 1""".stripMargin,

    "q183_kaplan_meier" ->
      """WITH subj AS (SELECT user_id,
        |    CAST(date_diff('day', CAST(min(ts) AS DATE),
        |      CAST(coalesce(min(ts) FILTER (event_type = 'purchase'),
        |        max(ts)) AS DATE)) AS BIGINT) AS dur,
        |    CASE WHEN min(ts) FILTER (event_type = 'purchase')
        |      IS NOT NULL THEN 1 ELSE 0 END AS ev
        |  FROM events GROUP BY 1),
        |h AS (SELECT dur AS t, CAST(sum(ev) AS BIGINT) AS d,
        |    CAST(sum(1 - ev) AS BIGINT) AS c
        |  FROM subj GROUP BY 1),
        |r AS (SELECT t, d, c,
        |    CAST((SELECT count(*) FROM subj)
        |      - (sum(d + c) OVER w - (d + c)) AS BIGINT) AS n_risk
        |  FROM h WINDOW w AS (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |f AS (SELECT t, d, c, n_risk,
        |    CAST(CASE WHEN d > 0 AND d < n_risk
        |      THEN round(ln(1 - CAST(d AS DOUBLE) / n_risk), 12)
        |      ELSE 0 END AS DECIMAL(28,14)) AS lnf,
        |    CASE WHEN d = n_risk THEN 1 ELSE 0 END AS z
        |  FROM r),
        |s AS (SELECT t, n_risk, d, c, sum(lnf) OVER w AS cl,
        |    sum(z) OVER w AS cz
        |  FROM f WINDOW w AS (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT t, n_risk, d, c,
        |  CASE WHEN cz > 0 THEN 0.0
        |    ELSE round(exp(CAST(cl AS DOUBLE)), 6) END AS survival
        |FROM s ORDER BY t""".stripMargin,

    "q205_tpch_q2" ->
      """WITH es AS (SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |ep AS (SELECT p_partkey FROM part
        |  WHERE p_size = 3 AND p_type = 'STANDARD'),
        |pairs AS (SELECT l_partkey, l_suppkey,
        |    min(round(l_extendedprice / l_quantity, 4)) AS cost
        |  FROM lineitem JOIN ep ON l_partkey = p_partkey
        |  JOIN es ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2),
        |mc AS (SELECT l_partkey AS mk, min(cost) AS mcost
        |  FROM pairs GROUP BY 1)
        |SELECT s_acctbal, s_name, n_name, l_partkey AS p_partkey, cost
        |FROM pairs JOIN mc ON l_partkey = mk AND cost = mcost
        |JOIN es ON l_suppkey = s_suppkey
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,

    "q206_tpch_q9" ->
      """SELECT n_name AS nation,
        |  CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4)
        |      AS DECIMAL(18,4))
        |    - CAST(round(p_retailprice * 0.6, 4) AS DECIMAL(18,4))
        |      * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_profit
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%gear%'
        |GROUP BY 1, 2 ORDER BY 1, 2 DESC""".stripMargin,

    "q207_tpch_q11" ->
      """WITH vals AS (SELECT n_name, l_partkey,
        |    sum(CAST(round(l_extendedprice * (1 - l_discount), 4)
        |      AS DECIMAL(18,4))) AS v
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |tot AS (SELECT sum(v) AS t FROM vals)
        |SELECT n_name, l_partkey, CAST(v AS DOUBLE) AS value
        |FROM vals, tot WHERE v * 10000 > t
        |ORDER BY value DESC, n_name, l_partkey""".stripMargin,

    "q208_tpch_q16" ->
      """WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey
        |  FROM lineitem)
        |SELECT p_brand, p_type, p_size,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM pairs JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'SMALL%'
        |  AND p_size IN (1, 2, 3, 4, 5)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |    WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q209_tpch_q20" ->
      """WITH ex AS (SELECT l_partkey, l_suppkey,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qt,
        |    CAST(sum(CASE WHEN year(l_shipdate) = 1996
        |      THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT)
        |      AS qy
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'small%'
        |  GROUP BY 1, 2),
        |sup AS (SELECT DISTINCT l_suppkey FROM ex WHERE qy * 2 > qt)
        |SELECT s_name, round(s_acctbal, 2) AS s_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |JOIN sup ON s_suppkey = l_suppkey
        |WHERE n_name = 'NATION_3'
        |ORDER BY s_name""".stripMargin,

    "q210_woe_iv" ->
      """WITH e AS (SELECT event_type AS f,
        |    CASE WHEN value > 100 THEN 1 ELSE 0 END AS label FROM events),
        |lv AS (SELECT f, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(label) AS BIGINT) AS p FROM e GROUP BY 1),
        |lv2 AS (SELECT f, n, p, n - p AS ng FROM lv),
        |tot AS (SELECT CAST(sum(p) AS BIGINT) AS pt,
        |    CAST(sum(ng) AS BIGINT) AS nt FROM lv2),
        |sc AS (SELECT f, n, p, ng,
        |    CASE WHEN pt > 0 THEN CAST(p AS DOUBLE) / pt END AS pr,
        |    CASE WHEN nt > 0 THEN CAST(ng AS DOUBLE) / nt END AS nr,
        |    CASE WHEN pt > 0 AND nt > 0 THEN
        |      ln(((p + 0.5) / pt) / ((ng + 0.5) / nt)) END AS woe
        |  FROM lv2, tot),
        |sc2 AS (SELECT f, n, p, ng, woe,
        |    CAST(round((pr - nr) * woe, 12) AS DECIMAL(38,12)) AS iv12
        |  FROM sc),
        |ivt AS (SELECT sum(iv12) AS t FROM sc2)
        |SELECT f AS event_type, n, p AS pos, ng AS neg,
        |  round(woe, 6) + 0.0 AS woe,
        |  round(CAST(iv12 AS DOUBLE), 6) + 0.0 AS iv,
        |  round(CAST(t AS DOUBLE), 6) + 0.0 AS iv_total
        |FROM sc2, ivt ORDER BY 1""".stripMargin,

    "q211_avg_precision" ->
      """WITH u AS (SELECT user_id, user_id % 2 AS cohort,
        |    CAST(count(*) AS BIGINT) AS score,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS label
        |  FROM events GROUP BY 1, 2),
        |h AS (SELECT cohort, round(CAST(score AS DOUBLE), 6) AS s,
        |    CAST(sum(label) AS BIGINT) AS ps,
        |    CAST(count(*) AS BIGINT) AS ts
        |  FROM u GROUP BY 1, 2),
        |c AS (SELECT cohort, ps, ts,
        |    sum(ps) OVER (PARTITION BY cohort ORDER BY s DESC) AS cp,
        |    sum(ts) OVER (PARTITION BY cohort ORDER BY s DESC) AS ct,
        |    sum(ps) OVER (PARTITION BY cohort) AS np FROM h)
        |SELECT cohort, CAST(sum(ts) AS BIGINT) AS n,
        |  CAST(max(np) AS BIGINT) AS npos,
        |  CASE WHEN max(np) > 0 THEN round(CAST(sum(
        |    CAST(round(CASE WHEN np > 0 THEN
        |        (CAST(ps AS DOUBLE) / np) * (CAST(cp AS DOUBLE) / ct)
        |      END, 12) AS DECIMAL(38,12))) AS DOUBLE), 6) END AS ap
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    "q212_k_anonymity" ->
      """WITH g AS (SELECT c_nationkey, c_mktsegment,
        |    CAST(count(*) AS BIGINT) AS sz,
        |    CAST(count(DISTINCT CASE WHEN c_acctbal >= 0 THEN 1 ELSE 0
        |      END) AS BIGINT) AS ldiv
        |  FROM customer GROUP BY 1, 2)
        |SELECT CAST(sum(sz) AS BIGINT) AS n_rows,
        |  CAST(count(*) AS BIGINT) AS n_groups,
        |  min(sz) AS min_group_size,
        |  CAST(sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS groups_lt_k,
        |  CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
        |    AS rows_lt_k,
        |  min(ldiv) AS min_l_diversity,
        |  round(CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS DOUBLE)
        |    / sum(sz), 6) AS at_risk_frac
        |FROM g""".stripMargin,

    "q213_local_clustering" ->
      """WITH raw AS (SELECT l1.l_suppkey AS sa, l2.l_suppkey AS sb
        |  FROM lineitem l1 JOIN lineitem l2
        |    ON l1.l_orderkey = l2.l_orderkey
        |   AND l1.l_suppkey < l2.l_suppkey
        |  WHERE (l1.l_suppkey * 31 + l2.l_suppkey) % 20 = 0),
        |e AS (SELECT DISTINCT least(sa, sb) AS a, greatest(sa, sb) AS b
        |  FROM raw WHERE sa <> sb),
        |deg AS (SELECT n AS node, CAST(count(*) AS BIGINT) AS degree FROM
        |  (SELECT a AS n FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
        |o AS (SELECT CASE WHEN da.degree < db.degree
        |      OR (da.degree = db.degree AND e.a < e.b)
        |    THEN e.a ELSE e.b END AS src,
        |  CASE WHEN da.degree < db.degree
        |      OR (da.degree = db.degree AND e.a < e.b)
        |    THEN e.b ELSE e.a END AS dst
        |  FROM e JOIN deg da ON da.node = e.a JOIN deg db ON db.node = e.b),
        |wg AS (SELECT o1.src, o1.dst AS v, o2.dst AS w FROM o o1
        |  JOIN o o2 ON o1.src = o2.src AND o1.dst < o2.dst),
        |tri AS (SELECT src, v, w FROM wg
        |  WHERE EXISTS (SELECT 1 FROM e
        |    WHERE e.a = wg.v AND e.b = wg.w)),
        |tpn AS (SELECT n AS node, CAST(count(*) AS BIGINT) AS triangles
        |  FROM (SELECT src AS n FROM tri UNION ALL SELECT v FROM tri
        |    UNION ALL SELECT w FROM tri) GROUP BY 1)
        |SELECT deg.node, deg.degree,
        |  coalesce(tpn.triangles, 0) AS triangles,
        |  CASE WHEN deg.degree >= 2 THEN
        |    round(CAST(coalesce(tpn.triangles, 0) AS DOUBLE) * 2
        |      / (deg.degree * (deg.degree - 1)), 6) END AS lcc
        |FROM deg LEFT JOIN tpn ON deg.node = tpn.node
        |ORDER BY 1""".stripMargin,

    "q214_wilcoxon" ->
      """WITH r AS (SELECT user_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM events),
        |p AS (SELECT user_id,
        |    max(CASE WHEN rn = 1 THEN value END) AS first_v,
        |    max(CASE WHEN rn = n THEN value END) AS last_v
        |  FROM r WHERE n >= 2 GROUP BY 1),
        |d AS (SELECT round(CAST(first_v AS DOUBLE)
        |      - CAST(last_v AS DOUBLE), 4) AS d FROM p),
        |dd AS (SELECT d FROM d WHERE d IS NOT NULL AND d <> 0),
        |h AS (SELECT abs(d) AS ad, CAST(count(*) AS BIGINT) AS t,
        |    CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS pos
        |  FROM dd GROUP BY 1),
        |c AS (SELECT pos, t, sum(t) OVER (ORDER BY ad) AS cum FROM h),
        |s AS (SELECT
        |    sum(CAST(pos AS DECIMAL(38,0)) *
        |      CAST(2 * (cum - t) + t + 1 AS DECIMAL(38,0))) AS wp2,
        |    CAST(sum(t) AS DECIMAL(38,0)) AS n,
        |    sum(CAST(t AS DECIMAL(38,0)) * t * t - t) AS ties
        |  FROM c)
        |SELECT CAST(n AS BIGINT) AS n,
        |  round(CAST(wp2 AS DOUBLE) / 2, 4) AS w_plus,
        |  CASE WHEN CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1)
        |      * (2 * CAST(n AS DOUBLE) + 1) / 24.0
        |      - CAST(ties AS DOUBLE) / 48.0 > 0
        |    THEN round((CAST(wp2 AS DOUBLE) / 2
        |        - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1) / 4)
        |      / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1)
        |        * (2 * CAST(n AS DOUBLE) + 1) / 24.0
        |        - CAST(ties AS DOUBLE) / 48.0), 6) END AS z
        |FROM s""".stripMargin,

    "q215_jackknife" ->
      """WITH e AS (SELECT dayofweek(ts) AS g,
        |    CASE WHEN value > 100 THEN 1 ELSE 0 END AS label FROM events),
        |gt AS (SELECT g, CAST(sum(label) AS BIGINT) AS c,
        |    CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS ct,
        |    CAST(sum(n) AS BIGINT) AS nt,
        |    CAST(count(*) AS BIGINT) AS gc FROM gt),
        |loo AS (SELECT CAST(CASE WHEN nt > n THEN
        |      round(CAST(ct - c AS DOUBLE) / (nt - n), 12)
        |      END AS DECIMAL(38,12)) AS th, ct, nt, gc
        |  FROM gt, tot),
        |m AS (SELECT CAST(round(CAST(sum(th) AS DOUBLE) / any_value(gc),
        |    12) AS DECIMAL(38,12)) AS thbar FROM loo)
        |SELECT any_value(gc) AS n_groups,
        |  round(CAST(any_value(ct) AS DOUBLE) / any_value(nt), 6)
        |    AS theta,
        |  round(any_value(gc) * (CAST(any_value(ct) AS DOUBLE)
        |      / any_value(nt))
        |    - (any_value(gc) - 1) * CAST(any_value(thbar) AS DOUBLE), 6)
        |    AS theta_jack,
        |  CASE WHEN any_value(gc) > 1 THEN round(sqrt(CAST(sum(
        |      CAST(round(CAST(th - thbar AS DOUBLE)
        |        * CAST(th - thbar AS DOUBLE), 12) AS DECIMAL(38,12)))
        |      AS DOUBLE) * (any_value(gc) - 1) / any_value(gc)), 6)
        |    END AS jk_se
        |FROM loo, m""".stripMargin,

    "q216_key_skew" ->
      """WITH pk AS (SELECT user_id, CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |h AS (SELECT c, CAST(count(*) AS BIGINT) AS f FROM pk GROUP BY 1),
        |cum AS (SELECT c, f, sum(f) OVER (ORDER BY c) AS cf FROM h),
        |tot AS (SELECT CAST(sum(f) AS BIGINT) AS kk,
        |    CAST(sum(c * f) AS BIGINT) AS rw, max(c) AS mx FROM h)
        |SELECT any_value(rw) AS n_rows, any_value(kk) AS n_keys,
        |  any_value(mx) AS max_count,
        |  min(CASE WHEN cf * 2 >= kk + 1 THEN c END) AS p50_count,
        |  min(CASE WHEN cf * 10 >= kk * 9 THEN c END) AS p90_count,
        |  min(CASE WHEN cf * 100 >= kk * 99 THEN c END) AS p99_count,
        |  round(CAST(any_value(rw) AS DOUBLE) / any_value(kk), 6)
        |    AS avg_count,
        |  round(CAST(any_value(mx) AS DOUBLE) * any_value(kk)
        |    / any_value(rw), 6) AS skew_ratio,
        |  round(CAST(any_value(mx) AS DOUBLE) / any_value(rw), 6)
        |    AS top1_share
        |FROM cum, tot""".stripMargin,

    "q217_effect_sizes" ->
      """WITH e AS (SELECT round(CAST(value AS DOUBLE), 4) AS v,
        |    user_id % 2 AS side FROM events),
        |h AS (SELECT v,
        |    CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS na,
        |    CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS nb
        |  FROM e GROUP BY 1),
        |c AS (SELECT v, na, nb,
        |    sum(nb) OVER (ORDER BY v) AS cb FROM h),
        |t AS (SELECT CAST(sum(nb) AS BIGINT) AS nbt FROM h),
        |s AS (SELECT CAST(sum(na) AS DECIMAL(38,0)) AS qa,
        |    CAST(sum(nb) AS DECIMAL(38,0)) AS qb,
        |    sum(CAST(na AS DECIMAL(38,0))
        |      * CAST(cb - nb AS DECIMAL(38,0))) AS gt,
        |    sum(CAST(na AS DECIMAL(38,0))
        |      * CAST(nbt - cb AS DECIMAL(38,0))) AS lt,
        |    sum(CAST(v AS DECIMAL(18,4)) * na) AS sa,
        |    sum(CAST(v AS DECIMAL(18,4)) * nb) AS sb,
        |    sum(CAST(v AS DECIMAL(18,4)) * CAST(v AS DECIMAL(18,4)) * na)
        |      AS ssa,
        |    sum(CAST(v AS DECIMAL(18,4)) * CAST(v AS DECIMAL(18,4)) * nb)
        |      AS ssb
        |  FROM c, t),
        |f AS (SELECT qa, qb, gt, lt,
        |    CAST(sa AS DOUBLE) / CAST(qa AS DOUBLE) AS ma,
        |    CAST(sb AS DOUBLE) / CAST(qb AS DOUBLE) AS mb,
        |    CAST(ssa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
        |      / CAST(qa AS DOUBLE) AS va,
        |    CAST(ssb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)
        |      / CAST(qb AS DOUBLE) AS vb
        |  FROM s)
        |SELECT CAST(qa AS BIGINT) AS n_a, CAST(qb AS BIGINT) AS n_b,
        |  round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
        |  round(CAST(gt - lt AS DOUBLE) / CAST(qa * qb AS DOUBLE), 6)
        |    AS cliffs_delta,
        |  CASE WHEN qa + qb > 2 AND (va + vb)
        |      / CAST(qa + qb - 2 AS DOUBLE) > 0
        |    THEN round((ma - mb)
        |      / sqrt((va + vb) / CAST(qa + qb - 2 AS DOUBLE)), 6)
        |    END AS cohens_d
        |FROM f""".stripMargin,

    "q219_textrank" -> {
      def iter(i: Int) =
        s"""c$i AS (SELECT e.ed AS node,
           |  sum(CAST(round(r.rank / dg.deg, 14) AS DECIMAL(30,16))) AS s
           |  FROM edg e JOIN r${i - 1} r ON r.node = e.es
           |  JOIN dg ON dg.node = e.es
           |  GROUP BY e.ed),
           |r$i AS (SELECT n.node,
           |  round(CAST(0.15 AS DOUBLE) / nn.n + CAST(0.85 AS DOUBLE) *
           |    coalesce(CAST(c.s AS DOUBLE), 0), 12) AS rank
           |  FROM nd n CROSS JOIN nn LEFT JOIN c$i c ON c.node = n.node)"""
          .stripMargin
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
         |  FROM documents),
         |bg AS (SELECT DISTINCT least(t[i], t[i + 1]) AS a,
         |    greatest(t[i], t[i + 1]) AS b
         |  FROM toks, (SELECT unnest(generate_series(1,
         |    (SELECT max(len(string_split(text, ' '))) FROM documents)))
         |    AS i)
         |  WHERE i + 1 <= len(t) AND t[i] <> t[i + 1]),
         |edg AS (SELECT a AS es, b AS ed FROM bg
         |        UNION ALL SELECT b, a FROM bg),
         |nd AS (SELECT DISTINCT unnest(t) AS node FROM toks),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nd),
         |dg AS (SELECT es AS node, CAST(count(*) AS DOUBLE) AS deg
         |       FROM edg GROUP BY es),
         |r0 AS (SELECT node, round(CAST(1 AS DOUBLE) / nn.n, 12) AS rank
         |       FROM nd CROSS JOIN nn),
         |${iter(1)},
         |${iter(2)},
         |${iter(3)}
         |SELECT node AS token, round(rank, 6) AS rank
         |FROM r3 ORDER BY 2 DESC, 1 LIMIT 30""".stripMargin
    },

    "q220_mcnemar" ->
      """WITH u AS (SELECT user_id,
        |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS b
        |  FROM events GROUP BY 1),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c
        |  FROM u)
        |SELECT n_pairs, b, c,
        |  CASE WHEN b + c > 0 THEN round(
        |    CAST(abs(b - c) - 1 AS DOUBLE) * (abs(b - c) - 1)
        |      / (b + c), 6) END AS chi2,
        |  CASE WHEN b + c > 0 THEN round(
        |    CAST(b - c AS DOUBLE) / sqrt(CAST(b + c AS DOUBLE)), 6)
        |    END AS z
        |FROM s""".stripMargin,

    "q221_readability" ->
      """WITH s AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |    CAST(greatest(len(regexp_extract_all(text, '[.!?]')), 1)
        |      AS BIGINT) AS n_sentences,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |      AS BIGINT) AS n_syllables
        |  FROM documents)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  CASE WHEN n_words > 0 THEN round(206.835
        |    - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
        |    - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 4)
        |    END AS flesch
        |FROM s ORDER BY doc_id""".stripMargin,

    "q222_hilbert_layout" ->
      s"""WITH src AS (SELECT c_custkey, c_custkey % 256 AS x,
         |    ((CAST(floor(c_acctbal) AS BIGINT) % 256) + 256) % 256 AS y,
         |    c_custkey % 256 AS ox,
         |    ((CAST(floor(c_acctbal) AS BIGINT) % 256) + 256) % 256 AS oy,
         |    CAST(0 AS BIGINT) AS d
         |  FROM customer),
         |${hilbertCte(8, "src")}
         |SELECT c_custkey, ox AS x, oy AS y, d AS hkey FROM h7
         |ORDER BY hkey, c_custkey""".stripMargin,

    "q223_prune_sim" -> {
      val zExpr = (0 until 8).map(i =>
        s"(((ox >> $i) & 1) << ${2 * i}) + (((oy >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")
      // per-file zone maps then the 1-row report, per layout
      def full(name: String, key: String) =
        s"""SELECT '$name' AS layout,
           |  CAST(count(*) AS BIGINT) AS n_files,
           |  CAST(sum(CASE WHEN mn <= 47 AND mx >= 32 THEN 1 ELSE 0 END)
           |    AS BIGINT) AS files_hit,
           |  round(1.0 - CAST(sum(CASE WHEN mn <= 47 AND mx >= 32
           |      THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS prune_frac
           |FROM (SELECT min(oy) AS mn, max(oy) AS mx
           |  FROM (SELECT (row_number() OVER (ORDER BY $key, c_custkey) - 1)
           |      * 32 // (SELECT count(*) FROM h7) AS f, oy
           |    FROM h7)
           |  GROUP BY f)"""
      s"""WITH src AS (SELECT c_custkey, c_custkey % 256 AS x,
         |    ((CAST(floor(c_acctbal) AS BIGINT) % 256) + 256) % 256 AS y,
         |    c_custkey % 256 AS ox,
         |    ((CAST(floor(c_acctbal) AS BIGINT) % 256) + 256) % 256 AS oy,
         |    CAST(0 AS BIGINT) AS d
         |  FROM customer),
         |${hilbertCte(8, "src")}
         |${full("hilbert", "d")}
         |UNION ALL ${full("natural", "c_custkey")}
         |UNION ALL ${full("zorder", s"($zExpr)")}
         |ORDER BY layout""".stripMargin
    },

    "q224_incremental_agg" ->
      """WITH v AS (SELECT event_type,
        |    CAST(round(CAST(value AS DOUBLE), 4) AS DECIMAL(28,4)) AS v
        |  FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(v) AS DOUBLE) AS sum_v,
        |  CAST(min(v) AS DOUBLE) AS min_v,
        |  CAST(max(v) AS DOUBLE) AS max_v,
        |  round(CAST(sum(v) AS DOUBLE) / count(*), 6) AS avg_v
        |FROM v GROUP BY 1 ORDER BY 1""".stripMargin,

    "q225_bpe_pairs" ->
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |v AS (SELECT w, CAST(count(*) AS BIGINT) AS wf FROM w
        |  WHERE len(w) >= 2 GROUP BY 1),
        |p AS (SELECT substr(w, i, 2) AS pair, wf
        |  FROM v, (SELECT unnest(generate_series(1,
        |    (SELECT max(len(w)) FROM v) - 1)) AS i)
        |  WHERE i <= len(w) - 1)
        |SELECT pair, CAST(sum(wf) AS BIGINT) AS freq FROM p
        |GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 30""".stripMargin,

    "q226_rendezvous" ->
      """WITH k AS (SELECT c_custkey FROM customer),
        |a8 AS (SELECT c_custkey, arg_max(w, md5(
        |    CAST(c_custkey AS VARCHAR) || ':' || CAST(w AS VARCHAR)))
        |    AS w8
        |  FROM k, (SELECT unnest(generate_series(0, 7)) AS w)
        |  GROUP BY c_custkey),
        |a9 AS (SELECT c_custkey, arg_max(w, md5(
        |    CAST(c_custkey AS VARCHAR) || ':' || CAST(w AS VARCHAR)))
        |    AS w9
        |  FROM k, (SELECT unnest(generate_series(0, 8)) AS w)
        |  GROUP BY c_custkey)
        |SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(CASE WHEN w8 <> w9 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS moved,
        |  round(CAST(sum(CASE WHEN w8 <> w9 THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*), 6) AS moved_frac
        |FROM a8 JOIN a9 USING (c_custkey)""".stripMargin,

    "q227_log_odds" ->
      """WITH d AS (SELECT text,
        |    CASE WHEN CAST(substr(source, 4) AS INT) < 10 THEN 0
        |      ELSE 1 END AS side
        |  FROM documents),
        |t AS (SELECT unnest(string_split(text, ' ')) AS tok, side
        |  FROM d),
        |c AS (SELECT tok,
        |    CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ya,
        |    CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS yb
        |  FROM t GROUP BY 1),
        |tt AS (SELECT CAST(sum(ya) AS BIGINT) AS na,
        |    CAST(sum(yb) AS BIGINT) AS nb,
        |    CAST(count(*) AS BIGINT) AS v FROM c),
        |zz AS (SELECT tok, ya, yb,
        |    ln((ya + 0.01) / (na + 0.01 * v - ya - 0.01))
        |      - ln((yb + 0.01) / (nb + 0.01 * v - yb - 0.01)) AS delta
        |  FROM c, tt)
        |SELECT tok AS token, ya AS count_a, yb AS count_b,
        |  round(delta, 6) AS delta,
        |  round(delta / sqrt(1.0 / (ya + 0.01) + 1.0 / (yb + 0.01)), 6)
        |    AS z
        |FROM zz ORDER BY 5 DESC, 1 LIMIT 30""".stripMargin,

    "q228_good_turing" ->
      """WITH d AS (SELECT source, text FROM documents
        |  WHERE source IN ('src0', 'src1')),
        |tf AS (SELECT source AS g, tok, CAST(count(*) AS BIGINT) AS r
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
        |    FROM d) GROUP BY 1, 2),
        |fof AS (SELECT g, r, CAST(count(*) AS BIGINT) AS nr FROM tf
        |  GROUP BY 1, 2),
        |tot AS (SELECT g, CAST(sum(r * nr) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN r = 1 THEN nr ELSE 0 END) AS BIGINT)
        |      AS n1
        |  FROM fof GROUP BY 1)
        |SELECT f.g AS source, f.r, f.nr AS n_r,
        |  round((f.r + 1) * CAST(f2.nr AS DOUBLE) / f.nr, 6) AS r_star,
        |  round(CAST(t.n1 AS DOUBLE) / t.n, 6) AS p0
        |FROM fof f LEFT JOIN fof f2 ON f.g = f2.g AND f2.r = f.r + 1
        |JOIN tot t ON t.g = f.g
        |WHERE f.r <= 50 ORDER BY 1, 2""".stripMargin,

    "q229_dim_profile" ->
      """WITH e AS (SELECT
        |    CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
        |    CAST(round(CAST(unnest(embedding) AS DOUBLE), 6)
        |      AS DECIMAL(18,6)) AS v
        |  FROM embeddings),
        |st AS (SELECT dim, CAST(count(*) AS BIGINT) AS n, sum(v) AS s,
        |    sum(v * v) AS q, min(v) AS mn, max(v) AS mx
        |  FROM e GROUP BY 1)
        |SELECT dim, n, round(CAST(s AS DOUBLE) / n, 6) AS mean,
        |  CASE WHEN n > 1 THEN round(sqrt((CAST(q AS DOUBLE)
        |    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (n - 1)), 6)
        |    END AS std,
        |  CAST(mn AS DOUBLE) AS min_v, CAST(mx AS DOUBLE) AS max_v
        |FROM st ORDER BY dim""".stripMargin,

    "q230_retention_plan" ->
      """WITH r AS (SELECT user_id, ts, row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events),
        |f AS (SELECT CASE WHEN rn > 5
        |    AND ts < TIMESTAMP '2024-01-20 00:00:00' THEN 1 ELSE 0 END
        |    AS rec FROM r)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events)
        |    AS n_keys,
        |  CAST(sum(rec) AS BIGINT) AS reclaimable,
        |  CAST(count(*) - sum(rec) AS BIGINT) AS kept,
        |  round(CAST(sum(rec) AS DOUBLE) / count(*), 6) AS reclaim_frac
        |FROM f""".stripMargin,

    "q231_compaction_plan" ->
      """WITH f AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(count(*) * 128 AS BIGINT) AS b FROM events GROUP BY 1),
        |c AS (SELECT day, b, sum(b) OVER (ORDER BY day) AS cum FROM f),
        |bins AS (SELECT (cum - b) // 131072 AS bin,
        |    CAST(sum(b) AS BIGINT) AS bb FROM c GROUP BY 1),
        |fs AS (SELECT CAST(count(*) AS BIGINT) AS n_files,
        |    CAST(sum(CASE WHEN b * 2 < 131072 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_small,
        |    CAST(sum(b) AS BIGINT) AS total_bytes FROM f),
        |bs AS (SELECT CAST(count(*) AS BIGINT) AS n_bins,
        |    CAST(max(bb) AS BIGINT) AS max_bin_bytes FROM bins)
        |SELECT n_files, n_small, total_bytes, n_bins, max_bin_bytes,
        |  round(CAST(total_bytes AS DOUBLE) / (n_bins * 131072), 6)
        |    AS fill_frac
        |FROM fs, bs""".stripMargin,

    "q232_watermark_advisor" ->
      """WITH e AS (SELECT event_id, epoch_us(ts) AS t FROM events),
        |r AS (SELECT (max(t) OVER (ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t)
        |    // 1000000 AS l FROM e),
        |h AS (SELECT l, CAST(count(*) AS BIGINT) AS f FROM r GROUP BY 1),
        |c AS (SELECT l, f, sum(f) OVER (ORDER BY l) AS cf FROM h),
        |t AS (SELECT CAST(sum(f) AS BIGINT) AS nn, max(l) AS mx FROM h)
        |SELECT any_value(nn) AS n_events,
        |  min(CASE WHEN cf * 2 >= nn + 1 THEN l END) AS p50_late_s,
        |  min(CASE WHEN cf * 20 >= nn * 19 THEN l END) AS p95_late_s,
        |  min(CASE WHEN cf * 100 >= nn * 99 THEN l END) AS p99_late_s,
        |  any_value(mx) AS max_late_s,
        |  min(CASE WHEN cf * 100 >= nn * 99 THEN l END)
        |    AS suggested_watermark_s
        |FROM c, t""".stripMargin,

    "q233_seq_rules" ->
      """WITH f AS (SELECT user_id AS e, event_type AS st, min(ts) AS ts
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT CAST(count(DISTINCT e) AS BIGINT) AS n FROM f),
        |m AS (SELECT st, CAST(count(*) AS BIGINT) AS us FROM f
        |  GROUP BY 1),
        |p AS (SELECT a.st AS antecedent, b.st AS consequent,
        |    CAST(count(*) AS BIGINT) AS n_ab
        |  FROM f a JOIN f b ON a.e = b.e AND a.st <> b.st
        |    AND a.ts < b.ts
        |  GROUP BY 1, 2)
        |SELECT antecedent, consequent, n_ab,
        |  round(CAST(n_ab AS DOUBLE) / t.n, 6) AS support,
        |  round(CAST(n_ab AS DOUBLE) / ma.us, 6) AS confidence,
        |  round(CAST(n_ab AS DOUBLE) * t.n / CAST(ma.us * mb.us
        |    AS DOUBLE), 6) AS lift
        |FROM p JOIN m ma ON ma.st = p.antecedent
        |JOIN m mb ON mb.st = p.consequent, tot t
        |ORDER BY 1, 2""".stripMargin,

    "q234_cuped" ->
      """WITH ev AS (SELECT user_id, ts,
        |    CAST(round(CAST(value AS DOUBLE), 4) AS DECIMAL(18,4)) AS v
        |  FROM events),
        |u AS (SELECT user_id, user_id % 2 AS arm,
        |    sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN v END) AS sx,
        |    count(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 END)
        |      AS nx,
        |    sum(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN v END)
        |      AS sy,
        |    count(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 END)
        |      AS ny
        |  FROM ev GROUP BY 1, 2),
        |p AS (SELECT arm, CAST(sx AS DOUBLE) / nx AS x,
        |    CAST(sy AS DOUBLE) / ny AS y
        |  FROM u WHERE nx > 0 AND ny > 0),
        |q AS (SELECT arm, CAST(round(y, 4) AS DECIMAL(18,4)) AS yy,
        |    CAST(round(x, 4) AS DECIMAL(18,4)) AS xx FROM p),
        |mm AS (SELECT arm, CAST(count(*) AS BIGINT) AS n, sum(yy) AS sy,
        |    sum(yy * yy) AS qy, sum(xx) AS sx, sum(xx * xx) AS qx,
        |    sum(xx * yy) AS sxy
        |  FROM q GROUP BY 1),
        |g AS (SELECT CAST(sum(n) AS BIGINT) AS n, sum(sy) AS sy,
        |    sum(qy) AS qy, sum(sx) AS sx, sum(qx) AS qx,
        |    sum(sxy) AS sxy FROM mm),
        |g2 AS (SELECT n, CAST(sx AS DOUBLE) / n AS mx,
        |    (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
        |      * CAST(sy AS DOUBLE) / n) / n AS cov,
        |    (CAST(qx AS DOUBLE) - CAST(sx AS DOUBLE)
        |      * CAST(sx AS DOUBLE) / n) / n AS vx,
        |    (CAST(qy AS DOUBLE) - CAST(sy AS DOUBLE)
        |      * CAST(sy AS DOUBLE) / n) / n AS vy
        |  FROM g),
        |g3 AS (SELECT mx, cov, vx, vy,
        |    CASE WHEN vx > 0 THEN cov / vx ELSE 0 END AS k FROM g2),
        |ar AS (SELECT arm, n AS na, CAST(sy AS DOUBLE) / n AS my,
        |    CAST(sy AS DOUBLE) / n
        |      - g3.k * (CAST(sx AS DOUBLE) / n - g3.mx) AS madj
        |  FROM mm, g3)
        |SELECT a0.na AS n_0, a1.na AS n_1,
        |  round(g3.k, 6) AS theta_k,
        |  round(a1.my - a0.my, 6) AS effect_raw,
        |  round(a1.madj - a0.madj, 6) AS effect_cuped,
        |  CASE WHEN g3.vx > 0 AND g3.vy > 0 THEN
        |    round(g3.cov * g3.cov / (g3.vx * g3.vy), 6)
        |    END AS var_reduction
        |FROM (SELECT * FROM ar WHERE arm = 0) a0,
        |  (SELECT * FROM ar WHERE arm = 1) a1, g3""".stripMargin,

    "q235_srm_power" ->
      """WITH e AS (SELECT user_id % 2 AS arm,
        |    CAST(round(CAST(CASE WHEN value > 100 THEN 1 ELSE 0 END
        |      AS DOUBLE), 4) AS DECIMAL(18,4)) AS y
        |  FROM events),
        |m AS (SELECT arm, CAST(count(*) AS BIGINT) AS n, sum(y) AS s,
        |    sum(y * y) AS q FROM e GROUP BY 1),
        |t AS (SELECT
        |    CAST(sum(CASE WHEN arm = 0 THEN n ELSE 0 END) AS BIGINT)
        |      AS n0,
        |    CAST(sum(CASE WHEN arm = 1 THEN n ELSE 0 END) AS BIGINT)
        |      AS n1,
        |    sum(q) AS q, sum(s) AS s, CAST(sum(n) AS BIGINT) AS nn
        |  FROM m),
        |v AS (SELECT n0, n1, CASE WHEN nn > 1 THEN (CAST(q AS DOUBLE)
        |    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / nn) / (nn - 1)
        |    END AS var FROM t)
        |SELECT n0 AS n_0, n1 AS n_1,
        |  round(CAST((n0 - n1) * (n0 - n1) AS DOUBLE) / (n0 + n1), 6)
        |    AS srm_chi2,
        |  CASE WHEN var > 0 AND n0 > 0 AND n1 > 0 THEN
        |    round(2.801585 * sqrt(var * (1.0 / n0 + 1.0 / n1)), 6)
        |    END AS mde
        |FROM v""".stripMargin,

    "q236_conformal" ->
      """WITH e AS (SELECT event_type, CAST(event_id % 2 AS INT) AS sp,
        |    CAST(value AS DOUBLE) AS y FROM events),
        |mdl AS (SELECT event_type,
        |    CAST(sum(CAST(round(y, 4) AS DECIMAL(18,4))) AS DOUBLE)
        |      / count(*) AS pred
        |  FROM e WHERE sp = 0 GROUP BY 1),
        |r AS (SELECT e.sp, round(abs(e.y - mdl.pred), 4) AS res
        |  FROM e JOIN mdl USING (event_type)),
        |h AS (SELECT res, CAST(count(*) AS BIGINT) AS f FROM r
        |  WHERE sp = 0 GROUP BY 1),
        |c AS (SELECT res, f, sum(f) OVER (ORDER BY res) AS cf FROM h),
        |nc AS (SELECT CAST(sum(f) AS BIGINT) AS n FROM h),
        |qq AS (SELECT any_value(nc.n) AS n_calib,
        |    min(CASE WHEN cf >= ceil(0.9 * (nc.n + 1)) THEN res END)
        |      AS qh
        |  FROM c, nc)
        |SELECT qq.n_calib, CAST(count(*) AS BIGINT) AS n_test,
        |  round(qq.qh, 4) AS qhat,
        |  round(CAST(sum(CASE WHEN r.res <= qq.qh THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*), 6) AS coverage
        |FROM r, qq WHERE r.sp = 1 GROUP BY qq.n_calib, qq.qh"""
        .stripMargin,

    "q237_offpolicy" ->
      """WITH b AS (SELECT event_type AS a,
        |    CAST(CASE WHEN value > 100 THEN 1 ELSE 0 END AS DOUBLE)
        |      AS r
        |  FROM events),
        |pr AS (SELECT a, CAST(count(*) AS BIGINT) AS na FROM b
        |  GROUP BY 1),
        |t AS (SELECT CAST(sum(na) AS BIGINT) AS n FROM pr),
        |w AS (SELECT b.r, CASE WHEN b.a = 'click' THEN
        |      CAST(t.n AS DOUBLE) / pr.na ELSE 0.0 END AS w
        |  FROM b JOIN pr USING (a), t),
        |w2 AS (SELECT r, w, least(w, 10.0) AS wc FROM w)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(sum(CAST(round(r * w, 12) AS DECIMAL(38,12)))
        |    AS DOUBLE) / count(*), 6) AS ips,
        |  CASE WHEN CAST(sum(CAST(round(w, 12) AS DECIMAL(38,12)))
        |      AS DOUBLE) > 0 THEN
        |    round(CAST(sum(CAST(round(r * w, 12) AS DECIMAL(38,12)))
        |      AS DOUBLE) / CAST(sum(CAST(round(w, 12)
        |      AS DECIMAL(38,12))) AS DOUBLE), 6) END AS snips,
        |  round(CAST(sum(CAST(round(r * wc, 12) AS DECIMAL(38,12)))
        |    AS DOUBLE) / count(*), 6) AS ips_clipped
        |FROM w2""".stripMargin,

    "q238_ece" ->
      """WITH e AS (SELECT event_type, CAST(event_id % 2 AS INT) AS sp,
        |    CASE WHEN value > 100 THEN 1 ELSE 0 END AS label
        |  FROM events),
        |mdl AS (SELECT event_type,
        |    CAST(sum(label) AS DOUBLE) / count(*) AS pred
        |  FROM e WHERE sp = 0 GROUP BY 1),
        |b AS (SELECT CAST(round(pred, 6) AS DECIMAL(18,6)) AS p,
        |    label AS l
        |  FROM e JOIN mdl USING (event_type) WHERE sp = 1),
        |b2 AS (SELECT least(CAST(floor(p * 10) AS BIGINT), 9) AS bin,
        |    p, l FROM b),
        |bins AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |    sum(p) AS sp2, CAST(sum(l) AS BIGINT) AS sl
        |  FROM b2 GROUP BY 1),
        |g AS (SELECT bin, n, CAST(sp2 AS DOUBLE) / n AS conf,
        |    CAST(sl AS DOUBLE) / n AS acc FROM bins)
        |SELECT CAST(sum(n) AS BIGINT) AS n,
        |  CAST(count(*) AS BIGINT) AS n_bins_used,
        |  round(CAST(sum(CAST(round(abs(acc - conf) * n, 12)
        |    AS DECIMAL(38,12))) AS DOUBLE) / sum(n), 6) AS ece,
        |  max(round(abs(acc - conf), 6)) AS mce
        |FROM g""".stripMargin,

    "q239_lift_ci" ->
      """WITH e AS (SELECT user_id % 2 AS arm,
        |    CAST(round(CAST(CASE WHEN value > 100 THEN 1 ELSE 0 END
        |      AS DOUBLE), 4) AS DECIMAL(18,4)) AS y FROM events),
        |m AS (SELECT arm, CAST(count(*) AS BIGINT) AS n, sum(y) AS s,
        |    sum(y * y) AS q FROM e GROUP BY 1),
        |m2 AS (SELECT arm, n, CAST(s AS DOUBLE) / n AS mm,
        |    CASE WHEN n > 1 THEN (CAST(q AS DOUBLE) - CAST(s AS DOUBLE)
        |      * CAST(s AS DOUBLE) / n) / (n - 1) END AS var FROM m),
        |a0 AS (SELECT n AS n0, mm AS m0, var AS v0 FROM m2
        |  WHERE arm = 0),
        |a1 AS (SELECT n AS n1, mm AS m1, var AS v1 FROM m2
        |  WHERE arm = 1),
        |lft AS (SELECT n0, n1, m0, m1,
        |    CASE WHEN m0 <> 0 THEN m1 / m0 - 1 END AS lift,
        |    CASE WHEN m0 <> 0 AND v0 IS NOT NULL AND v1 IS NOT NULL
        |      THEN sqrt(v1 / (n1 * m0 * m0)
        |        + m1 * m1 * v0 / (n0 * m0 * m0 * m0 * m0)) END AS se
        |  FROM a0, a1)
        |SELECT n0 AS n_0, n1 AS n_1, round(m0, 6) AS mean_0,
        |  round(m1, 6) AS mean_1, round(lift, 6) AS lift,
        |  round(lift - 1.959964 * se, 6) AS ci_lo,
        |  round(lift + 1.959964 * se, 6) AS ci_hi
        |FROM lft""".stripMargin,

    "q240_reconciliation" ->
      """WITH s AS (SELECT l_orderkey AS k,
        |    sum(CAST(round(CAST(l_extendedprice AS DOUBLE), 4)
        |      AS DECIMAL(28,4))) AS cs
        |  FROM lineitem GROUP BY 1),
        |p AS (SELECT o_orderkey AS k,
        |    CAST(round(CAST(o_totalprice AS DOUBLE), 4)
        |      AS DECIMAL(28,4)) AS t
        |  FROM orders),
        |j AS (SELECT p.k, p.t, s.cs,
        |    CASE WHEN s.cs IS NOT NULL AND p.t <> 0 THEN
        |      abs(CAST(s.cs - p.t AS DOUBLE))
        |        / abs(CAST(p.t AS DOUBLE)) END AS rd
        |  FROM p LEFT JOIN s ON p.k = s.k)
        |SELECT CAST(count(*) AS BIGINT) AS n_parents,
        |  CAST(sum(CASE WHEN cs IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_childless,
        |  CAST(sum(CASE WHEN rd <= 0.05 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_within_tol,
        |  round(CAST(sum(CAST(round(rd, 12) AS DECIMAL(38,12)))
        |    AS DOUBLE) / (count(*) - sum(CASE WHEN cs IS NULL THEN 1
        |    ELSE 0 END)), 6) AS mean_rel_diff,
        |  max(round(rd, 6)) AS max_rel_diff
        |FROM j""".stripMargin,

    "q241_volume_anomaly" ->
      """WITH daily AS (SELECT event_type AS g, CAST(ts AS DATE) AS d,
        |    CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
        |r AS (SELECT g, d, c, count(c) OVER w AS n, sum(c) OVER w AS s,
        |    sum(c * c) OVER w AS q
        |  FROM daily WINDOW w AS (PARTITION BY g ORDER BY d
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        |z AS (SELECT g, d, c, CAST(s AS DOUBLE) / n AS mean,
        |    (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |      / n) / (n - 1) AS var
        |  FROM r WHERE n >= 2)
        |SELECT g AS event_type, CAST(d AS VARCHAR) AS day, c AS n_rows,
        |  round(mean, 6) AS baseline_mean,
        |  round((c - mean) / sqrt(var), 6) AS z
        |FROM z WHERE var > 0
        |  AND abs((c - mean) / sqrt(var)) >= 2.0
        |ORDER BY 1, 2""".stripMargin,

    "q242_dup_matrix" ->
      s"""WITH $shinglesCte,
         |${minhashSig(4, 2)},
         |pairs AS (${minhashPairs(4, 2)})
         |SELECT least(da.source, db.source) AS source_a,
         |  greatest(da.source, db.source) AS source_b,
         |  CAST(count(*) AS BIGINT) AS n_pairs
         |FROM pairs JOIN documents da ON pairs.doc_a = da.doc_id
         |JOIN documents db ON pairs.doc_b = db.doc_id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q243_fd_audit" -> {
      def fd(table: String, det: String, dep: String) =
        s"""SELECT '$table' AS table_name, '$det' AS determinant,
           |  '$dep' AS dependent, CAST(count(*) AS BIGINT) AS n_det,
           |  CAST(sum(nd) AS BIGINT) AS n_pairs,
           |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS violating_keys,
           |  sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0 AS holds
           |FROM (SELECT $det, count(DISTINCT $dep) AS nd FROM $table
           |  GROUP BY 1)""".stripMargin
      s"""SELECT * FROM (
         |${fd("customer", "c_custkey", "c_mktsegment")}
         |UNION ALL ${fd("customer", "c_nationkey", "c_mktsegment")}
         |UNION ALL ${fd("orders", "o_orderkey", "o_custkey")}
         |UNION ALL ${fd("lineitem", "l_orderkey", "l_suppkey")})
         |ORDER BY table_name, determinant, dependent""".stripMargin
    },

    "q244_sketch_accuracy" -> {
      def one(c: String) =
        s"""SELECT '$c' AS col_name, exact_distinct, kmv_est,
           |  kmv_rel_err, hll_est, hll_rel_err FROM (
           |WITH dh AS (SELECT DISTINCT
           |    ('0x' || substr(md5($c::VARCHAR), 1, 12))::BIGINT AS u
           |  FROM events),
           |kth AS (SELECT u AS uk FROM (SELECT u, row_number() OVER
           |    (ORDER BY u) AS rn FROM dh) WHERE rn = 64),
           |ex AS (SELECT CAST(count(*) AS BIGINT) AS exact_distinct
           |  FROM dh),
           |kmv AS (SELECT exact_distinct,
           |    CASE WHEN (SELECT uk FROM kth) IS NULL
           |      THEN CAST(exact_distinct AS DOUBLE)
           |      ELSE round(CAST(63 AS DOUBLE) * 281474976710656
           |        / (SELECT uk FROM kth), 4) END AS kmv_est
           |  FROM ex),
           |slots AS (SELECT u // 1099511627776 AS b,
           |    u % 1099511627776 AS rem FROM dh),
           |regs AS (SELECT b, max(CASE WHEN rem = 0 THEN 41
           |    ELSE 41 - length(bin(rem)) END) AS r
           |  FROM slots GROUP BY 1),
           |agg AS (SELECT count(*) AS nregs,
           |    CAST(sum(1::BIGINT << (41 - r)) AS BIGINT) AS s
           |  FROM regs),
           |hll AS (SELECT 256 - nregs AS v,
           |    0.7213 / (1.0 + 1.079 / 256.0) * 65536.0
           |      * 2199023255552.0
           |      / (s + (256 - nregs) * 2199023255552.0) AS e_raw
           |  FROM agg),
           |hf AS (SELECT round(CASE WHEN v > 0 AND e_raw <= 640.0
           |    THEN 256.0 * ln(256.0 / v) ELSE e_raw END, 4)
           |    AS hll_est FROM hll)
           |SELECT ex.exact_distinct, kmv.kmv_est,
           |  round(abs(kmv.kmv_est - ex.exact_distinct)
           |    / ex.exact_distinct, 4) AS kmv_rel_err,
           |  hf.hll_est, round(abs(hf.hll_est - ex.exact_distinct)
           |    / ex.exact_distinct, 4) AS hll_rel_err
           |FROM ex, kmv, hf)""".stripMargin
      s"""SELECT * FROM (
         |${one("event_id")}
         |UNION ALL ${one("event_type")}
         |UNION ALL ${one("user_id")})
         |ORDER BY col_name""".stripMargin
    },

    "q245_npmi" ->
      """WITH toks AS (SELECT string_split(text, ' ') AS a
        |  FROM documents),
        |t1 AS (SELECT unnest(a) AS t FROM toks),
        |uni AS (SELECT t, CAST(count(*) AS BIGINT) AS n FROM t1
        |  GROUP BY 1),
        |arr AS (SELECT a FROM toks WHERE len(a) >= 2),
        |bi AS (SELECT a[i] AS x, a[i + 1] AS y
        |  FROM arr, (SELECT unnest(generate_series(1,
        |    (SELECT max(len(a)) FROM arr))) AS i)
        |  WHERE i + 1 <= len(a)),
        |bic AS (SELECT x, y, CAST(count(*) AS BIGINT) AS nab FROM bi
        |  GROUP BY 1, 2),
        |tb AS (SELECT CAST(sum(nab) AS BIGINT) AS tb FROM bic),
        |tu AS (SELECT CAST(sum(n) AS BIGINT) AS tu FROM uni),
        |sc AS (SELECT x, y, nab,
        |    CAST(nab AS DOUBLE) / tb.tb AS pab,
        |    ln((CAST(nab AS DOUBLE) / tb.tb)
        |      / ((CAST(ux.n AS DOUBLE) / tu.tu)
        |        * (CAST(uy.n AS DOUBLE) / tu.tu))) AS pmi
        |  FROM bic JOIN uni ux ON ux.t = bic.x
        |    JOIN uni uy ON uy.t = bic.y, tb, tu
        |  WHERE nab >= 20)
        |SELECT x AS token_a, y AS token_b, nab AS n_pair,
        |  round(pmi, 6) AS pmi, round(pmi / -ln(pab), 6) AS npmi
        |FROM sc ORDER BY 5 DESC, 1, 2 LIMIT 30""".stripMargin,

    "q258_ccf" ->
      """WITH daily AS (SELECT
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS views,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS purchases
        |  FROM events GROUP BY 1),
        |lags AS (SELECT unnest(generate_series(-5, 5)) AS lg),
        |j AS (SELECT l.lg, a.views AS va, b.purchases AS pb
        |  FROM lags l JOIN daily a ON TRUE
        |  JOIN daily b ON a.day = b.day - l.lg)
        |SELECT lg AS "lag", CAST(count(*) AS BIGINT) AS n_pairs,
        |  round(corr(CAST(va AS DOUBLE), CAST(pb AS DOUBLE)), 6) AS ccf
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    "q259_calendar_gaps" ->
      """WITH obs AS (SELECT DISTINCT event_type AS g,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
        |  FROM events),
        |span AS (SELECT g, min(day) AS lo, max(day) AS hi,
        |    CAST(count(*) AS BIGINT) AS nobs FROM obs GROUP BY 1),
        |expd AS (SELECT g, unnest(generate_series(lo, hi)) AS day
        |  FROM span),
        |miss AS (SELECT e.g, e.day FROM expd e
        |  ANTI JOIN obs ON e.g = obs.g AND e.day = obs.day),
        |ms AS (SELECT g, CAST(count(*) AS BIGINT) AS nmiss,
        |    min(day) AS fm FROM miss GROUP BY 1)
        |SELECT span.g AS event_type, hi - lo + 1 AS span_days,
        |  nobs AS observed_days, coalesce(nmiss, 0) AS missing_days,
        |  CAST(DATE '1970-01-01' + CAST(fm AS INT) AS VARCHAR)
        |    AS first_missing_day
        |FROM span LEFT JOIN ms USING (g) ORDER BY 1""".stripMargin,

    "q260_percentile_bands" ->
      """WITH h AS (SELECT event_type,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
        |      AS wk,
        |    round(value, 2) AS v, CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2, 3),
        |c2 AS (SELECT event_type, wk, v, c,
        |    sum(c) OVER (PARTITION BY event_type, wk ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(c) OVER (PARTITION BY event_type, wk) AS n FROM h)
        |SELECT event_type, wk, CAST(max(n) AS BIGINT) AS n,
        |  min(CASE WHEN cum * 10 >= n THEN v END) AS p10,
        |  min(CASE WHEN cum * 2 >= n THEN v END) AS p50,
        |  min(CASE WHEN cum * 10 >= n * 9 THEN v END) AS p90
        |FROM c2 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q261_ljung_box" ->
      """WITH s AS (SELECT event_type AS g,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
        |    CAST(count(*) AS BIGINT) AS y FROM events GROUP BY 1, 2),
        |mom AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS DECIMAL(38,0)) AS sy FROM s GROUP BY 1),
        |dev AS (SELECT s.g, s.x,
        |    round(CAST(y AS DOUBLE) - CAST(sy AS DOUBLE) / n, 6) AS d
        |  FROM s JOIN mom USING (g)),
        |den AS (SELECT g, sum(CAST(round(d * d, 12) AS DECIMAL(38,12)))
        |    AS ss FROM dev GROUP BY 1),
        |lags AS (SELECT unnest(generate_series(1, 5)) AS lg),
        |nm AS (SELECT c.g, l.lg,
        |    sum(CAST(round(c.d * p.d, 12) AS DECIMAL(38,12))) AS num
        |  FROM lags l JOIN dev c ON TRUE
        |  JOIN dev p ON p.g = c.g AND c.x = p.x + l.lg
        |  GROUP BY 1, 2),
        |r2 AS (SELECT nm.g, lg, CASE WHEN CAST(ss AS DOUBLE) > 0
        |    THEN CAST(num AS DOUBLE) / CAST(ss AS DOUBLE)
        |    ELSE 0 END AS rho
        |  FROM nm JOIN den USING (g)),
        |q AS (SELECT r2.g, max(n) AS n,
        |    round(CAST(max(n) AS DOUBLE) * (max(n) + 2)
        |      * CAST(sum(CAST(round(rho * rho / (n - lg), 12)
        |        AS DECIMAL(38,12))) AS DOUBLE), 6) AS q_stat
        |  FROM r2 JOIN mom USING (g) GROUP BY 1)
        |SELECT r2.g AS event_type, lg AS "lag", round(rho, 6) AS rho,
        |  CAST(q.n AS BIGINT) AS n, q.q_stat
        |FROM r2 JOIN q USING (g) ORDER BY 1, 2""".stripMargin,

    "q254_ewma_anomaly" ->
      """WITH s AS (SELECT event_type AS g,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
        |    CAST(count(*) AS BIGINT) AS y FROM events GROUP BY 1, 2),
        |r AS (SELECT g, x, y,
        |    row_number() OVER (PARTITION BY g ORDER BY x) AS rn FROM s),
        |ew AS (SELECT a.g, a.rn,
        |    CAST(sum(h.y * (CAST(1 AS BIGINT)
        |        << CAST(8 - (a.rn - h.rn) AS INT))) AS DOUBLE)
        |    / CAST(sum(CAST(1 AS BIGINT)
        |        << CAST(8 - (a.rn - h.rn) AS INT)) AS DOUBLE) AS ewma
        |  FROM r a JOIN r h
        |    ON a.g = h.g AND h.rn BETWEEN a.rn - 8 AND a.rn - 1
        |  GROUP BY 1, 2),
        |d AS (SELECT r.g, r.x, r.y, ew.ewma,
        |    round(r.y - ew.ewma, 6) AS dv
        |  FROM r LEFT JOIN ew ON r.g = ew.g AND r.rn = ew.rn),
        |sp AS (SELECT g, count(dv) AS nd,
        |    sum(CAST(dv AS DECIMAL(38,6))) AS sd,
        |    sum(CAST(dv * dv AS DECIMAL(38,12))) AS sdd
        |  FROM d WHERE dv IS NOT NULL GROUP BY 1),
        |sp2 AS (SELECT g, CAST(sd AS DOUBLE) / nd AS mu,
        |    sqrt(greatest(CAST(sdd AS DOUBLE) / nd
        |      - (CAST(sd AS DOUBLE) / nd) * (CAST(sd AS DOUBLE) / nd),
        |      0)) AS sig
        |  FROM sp)
        |SELECT d.g AS event_type, d.x AS day, d.y AS y,
        |  round(d.ewma, 6) AS ewma_prev,
        |  round((d.dv - mu) / sig, 6) AS z
        |FROM d JOIN sp2 ON d.g = sp2.g
        |WHERE sig > 0 AND abs((d.dv - mu) / sig) >= 1.5
        |ORDER BY 1, 2""".stripMargin,

    "q255_friedman" ->
      """WITH s AS (SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS b,
        |    event_type AS t,
        |    round(CAST(count(*) AS DOUBLE), 4) AS v
        |  FROM events GROUP BY 1, 2),
        |k AS (SELECT count(DISTINCT t) AS k FROM s),
        |c AS (SELECT s.*, count(*) OVER (PARTITION BY b) AS bn,
        |    count(DISTINCT t) OVER (PARTITION BY b) AS bd FROM s),
        |f AS (SELECT c.* FROM c, k WHERE bn = k.k AND bd = k.k),
        |rk AS (SELECT b, t,
        |    rank() OVER (PARTITION BY b ORDER BY v) * 2
        |      + count(*) OVER (PARTITION BY b, v) - 1 AS r2 FROM f),
        |pt AS (SELECT t,
        |    CAST(CAST(sum(r2) AS DECIMAL(38,0)) / 2 AS DECIMAL(38,1))
        |      AS rsum,
        |    CAST(count(*) AS BIGINT) AS nb FROM rk GROUP BY 1),
        |st AS (SELECT max(nb) AS bb, CAST(count(*) AS BIGINT) AS kk,
        |    sum(rsum * rsum) AS ssq FROM pt)
        |SELECT pt.t AS event_type, nb AS n_blocks,
        |  CAST(rsum AS DOUBLE) AS rank_sum,
        |  round(CAST(rsum AS DOUBLE) / nb, 6) AS mean_rank, kk AS k,
        |  round(12.0 * CAST(ssq AS DOUBLE) / (bb * kk * (kk + 1))
        |    - 3.0 * (bb * (kk + 1)), 6) AS chi2_f
        |FROM pt, st ORDER BY 1""".stripMargin,

    "q256_systematic_sample" ->
      """WITH rk AS (SELECT c_custkey, c_mktsegment, row_number() OVER (
        |    ORDER BY ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)),
        |      1, 4))::INT, c_custkey) AS r FROM customer)
        |SELECT c_custkey, c_mktsegment, r AS sample_rank FROM rk
        |WHERE (r - 1) % 20 = 0 ORDER BY 1""".stripMargin,

    "q257_theil" ->
      """WITH u AS (SELECT user_id, event_type AS g,
        |    CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
        |gr AS (SELECT g, CAST(count(*) AS BIGINT) AS ng,
        |    CAST(sum(x) AS DECIMAL(38,0)) AS sg
        |  FROM u WHERE x > 0 GROUP BY 1),
        |tt AS (SELECT CAST(sum(ng) AS BIGINT) AS n,
        |    CAST(sum(sg) AS DECIMAL(38,0)) AS s FROM gr),
        |wm AS (SELECT u.g, u.x, gr.ng, gr.sg,
        |    CAST(gr.sg AS DOUBLE) / gr.ng AS mug, tt.n AS nn, tt.s AS ss
        |  FROM u JOIN gr USING (g), tt WHERE u.x > 0),
        |terms AS (SELECT g, ng, sg, mug, nn, ss,
        |    CAST(round(CAST(x AS DOUBLE) / CAST(sg AS DOUBLE)
        |      * ln(CAST(x AS DOUBLE) / mug), 12) AS DECIMAL(38,12))
        |      AS term
        |  FROM wm),
        |pg AS (SELECT g, max(ng) AS n, max(sg) AS sgd, max(mug) AS mug,
        |    max(nn) AS nn, max(ss) AS ss, sum(term) AS tg
        |  FROM terms GROUP BY g),
        |pg2 AS (SELECT g, n,
        |    CAST(sgd AS DOUBLE) / CAST(ss AS DOUBLE) AS share, mug,
        |    CAST(ss AS DOUBLE) / nn AS mu, tg FROM pg),
        |st AS (SELECT
        |    sum(CAST(round(share * CAST(tg AS DOUBLE), 12)
        |      AS DECIMAL(38,12))) AS tw,
        |    sum(CAST(round(share * ln(mug / mu), 12)
        |      AS DECIMAL(38,12))) AS tb FROM pg2)
        |SELECT g AS event_type, n, round(mug, 6) AS mean_value,
        |  round(share, 6) AS value_share,
        |  round(CAST(tg AS DOUBLE), 6) AS t_group,
        |  round(CAST(tw AS DOUBLE), 6) AS t_within,
        |  round(CAST(tb AS DOUBLE), 6) AS t_between,
        |  round(CAST(tw + tb AS DOUBLE), 6) AS t_total
        |FROM pg2, st ORDER BY 1""".stripMargin,

    "q250_interval_coverage" ->
      """WITH b AS (SELECT user_id, event_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS lo,
        |    CAST(floor(epoch(ts)) AS BIGINT) + 300 AS hi FROM events),
        |s AS (SELECT user_id, event_id, lo, hi, max(hi) OVER (
        |    PARTITION BY user_id ORDER BY lo, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |  FROM b),
        |f AS (SELECT user_id, event_id, lo, hi,
        |    CASE WHEN pm IS NULL OR lo > pm THEN 1 ELSE 0 END AS nb
        |  FROM s),
        |g AS (SELECT user_id, lo, hi, sum(nb) OVER (
        |    PARTITION BY user_id ORDER BY lo, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg
        |  FROM f),
        |sg AS (SELECT user_id, seg, count(*) AS n, min(lo) AS slo,
        |    max(hi) AS shi
        |  FROM g GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(n) AS BIGINT) AS n_events,
        |  CAST(count(*) AS BIGINT) AS n_segments,
        |  CAST(sum(shi - slo) AS BIGINT) AS covered_s
        |FROM sg GROUP BY 1 ORDER BY 1""".stripMargin,

    "q251_adamic_adar" ->
      """WITH e AS (SELECT l1.l_suppkey AS sa, l2.l_suppkey AS sb
        |  FROM lineitem l1 JOIN lineitem l2
        |    ON l1.l_orderkey = l2.l_orderkey
        |   AND l1.l_suppkey < l2.l_suppkey
        |  WHERE (l1.l_suppkey * 31 + l2.l_suppkey) % 20 = 0),
        |canon AS (SELECT DISTINCT least(sa, sb) AS a,
        |    greatest(sa, sb) AS b FROM e WHERE sa <> sb),
        |und AS (SELECT a AS w, b AS nb FROM canon
        |        UNION ALL SELECT b, a FROM canon),
        |deg AS (SELECT w, CAST(count(*) AS BIGINT) AS dg FROM und
        |  GROUP BY 1),
        |ctr AS (SELECT u.w, u.nb, d.dg FROM und u JOIN deg d USING (w)
        |  WHERE d.dg BETWEEN 2 AND 64),
        |wd AS (SELECT c1.w, c1.dg, c1.nb AS u, c2.nb AS v
        |  FROM ctr c1 JOIN ctr c2 ON c1.w = c2.w AND c1.nb < c2.nb),
        |sc AS (SELECT u, v, CAST(count(*) AS BIGINT) AS n_common,
        |    sum(CAST(round(1.0 / ln(dg), 12) AS DECIMAL(38,12))) AS aa
        |  FROM wd GROUP BY 1, 2),
        |fin AS (SELECT u, v, n_common,
        |    round(CAST(aa AS DOUBLE), 6) AS aa_score
        |  FROM sc ANTI JOIN canon ON sc.u = canon.a AND sc.v = canon.b)
        |SELECT u, v, n_common, aa_score FROM fin
        |ORDER BY aa_score DESC, u, v LIMIT 30""".stripMargin,

    "q252_durbin_watson" ->
      """WITH s AS (SELECT event_type AS g,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
        |    CAST(count(*) AS BIGINT) AS y FROM events GROUP BY 1, 2),
        |m AS (SELECT g, CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
        |    CAST(sum(x * x) AS HUGEINT) AS sxx,
        |    CAST(sum(x * y) AS HUGEINT) AS sxy
        |  FROM s GROUP BY 1),
        |cb AS (SELECT g, n, sx, sy,
        |    CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0
        |      THEN CAST(n * sxy - sx * sy AS DOUBLE)
        |         / CAST(n * sxx - sx * sx AS DOUBLE)
        |      ELSE 0 END AS b
        |  FROM m),
        |c2 AS (SELECT g, n, b,
        |    (CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE))
        |      / CAST(n AS DOUBLE) AS a
        |  FROM cb),
        |r AS (SELECT s.g, s.x,
        |    round(CAST(s.y AS DOUBLE) - c2.a - c2.b * s.x, 6) AS e
        |  FROM s JOIN c2 USING (g)),
        |l AS (SELECT g, x, e,
        |    lag(e) OVER (PARTITION BY g ORDER BY x) AS ep FROM r),
        |t AS (SELECT g,
        |    sum(CAST(round((e - ep) * (e - ep), 12) AS DECIMAL(38,12)))
        |      AS num,
        |    sum(CAST(round(e * e, 12) AS DECIMAL(38,12))) AS den
        |  FROM l GROUP BY 1)
        |SELECT t.g AS event_type, CAST(c2.n AS BIGINT) AS n,
        |  round(c2.b, 6) AS slope,
        |  CASE WHEN CAST(den AS DOUBLE) > 0 THEN
        |    round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6)
        |  END AS dw
        |FROM t JOIN c2 USING (g) ORDER BY 1""".stripMargin,

    "q253_fisher_exact" ->
      """WITH base AS (SELECT event_type AS g,
        |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS a,
        |    CASE WHEN value > 50 THEN 1 ELSE 0 END AS b FROM events),
        |cells AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(a) AS BIGINT) AS r1, CAST(sum(b) AS BIGINT) AS c1,
        |    CAST(sum(a * b) AS BIGINT) AS a11
        |  FROM base GROUP BY 1),
        |li AS (SELECT unnest(generate_series(1,
        |    (SELECT max(n) FROM cells))) AS i),
        |lf0 AS (SELECT i, sum(CAST(round(ln(i), 12) AS DECIMAL(38,12)))
        |    OVER (ORDER BY i) AS lf FROM li),
        |lf AS (SELECT * FROM lf0
        |       UNION ALL SELECT 0, CAST(0 AS DECIMAL(38,12))),
        |ks AS (SELECT g, n, r1, c1, a11,
        |    unnest(generate_series(a11, least(r1, c1))) AS k FROM cells),
        |lp AS (SELECT ks.g, ks.k,
        |    f1.lf - f2.lf - f3.lf + f4.lf - f5.lf - f6.lf - f7.lf
        |      + f8.lf + f9.lf AS logp
        |  FROM ks
        |  JOIN lf f1 ON f1.i = ks.r1 JOIN lf f2 ON f2.i = ks.k
        |  JOIN lf f3 ON f3.i = ks.r1 - ks.k
        |  JOIN lf f4 ON f4.i = ks.n - ks.r1
        |  JOIN lf f5 ON f5.i = ks.c1 - ks.k
        |  JOIN lf f6 ON f6.i = ks.n - ks.r1 - ks.c1 + ks.k
        |  JOIN lf f7 ON f7.i = ks.n JOIN lf f8 ON f8.i = ks.c1
        |  JOIN lf f9 ON f9.i = ks.n - ks.c1),
        |tl AS (SELECT g, sum(CAST(round(exp(CAST(logp AS DOUBLE)), 12)
        |    AS DECIMAL(38,12))) AS p FROM lp GROUP BY 1)
        |SELECT cells.g AS event_type, n, r1, c1, a11,
        |  round(CAST(r1 AS DOUBLE) * c1 / n, 6) AS expected_a11,
        |  least(CAST(round(p, 6) AS DOUBLE), 1.0) AS p_upper
        |FROM cells JOIN tl USING (g) ORDER BY 1""".stripMargin,

    "q246_survivorship" ->
      s"""WITH RECURSIVE $shinglesCte,
         |${minhashSig(4, 2)},
         |pairs AS (${minhashPairs(4, 2)}),
         |ed AS (SELECT doc_a AS s, doc_b AS d FROM pairs
         |       UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(node, anc) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.d, r.anc FROM reach r JOIN ed e ON e.s = r.node),
         |cl AS (SELECT node AS doc_id, min(anc) AS cluster_id FROM reach
         |  GROUP BY node),
         |j AS (SELECT cl.cluster_id, d.doc_id, d.n_chars, d.lang
         |  FROM cl JOIN documents d USING (doc_id)),
         |agg AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars FROM j GROUP BY 1),
         |canon AS (SELECT cluster_id, doc_id, n_chars, row_number() OVER (
         |  PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id) AS rn
         |  FROM j),
         |lc AS (SELECT cluster_id, lang, count(*) AS c FROM j GROUP BY 1, 2),
         |lm AS (SELECT cluster_id, lang, row_number() OVER (
         |  PARTITION BY cluster_id ORDER BY c DESC, lang) AS rn FROM lc)
         |SELECT a.cluster_id, a.n_members, a.total_chars,
         |  c.doc_id AS canonical_doc,
         |  CAST(c.n_chars AS BIGINT) AS canonical_chars,
         |  l.lang AS merged_lang
         |FROM agg a
         |JOIN canon c ON c.cluster_id = a.cluster_id AND c.rn = 1
         |JOIN lm l ON l.cluster_id = a.cluster_id AND l.rn = 1
         |ORDER BY a.cluster_id""".stripMargin,

    "q247_incremental_join" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4)
        |                AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q248_ucb1" ->
      """WITH a AS (SELECT event_type AS arm,
        |    CAST(count(*) AS BIGINT) AS n_pulls,
        |    sum(CAST(round(value, 4) AS DECIMAL(28,4))) AS sr
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(n_pulls) AS BIGINT) AS nt FROM a)
        |SELECT arm, n_pulls,
        |  round(CAST(sr AS DOUBLE) / n_pulls, 6) AS mean_reward,
        |  round(sqrt(2 * ln(nt) / n_pulls), 6) AS explore_bonus,
        |  round(CAST(sr AS DOUBLE) / n_pulls
        |    + sqrt(2 * ln(nt) / n_pulls), 6) AS ucb_score
        |FROM a, t ORDER BY 5 DESC, 1""".stripMargin,

    "q249_kendall_tau" ->
      """WITH h AS (SELECT l_returnflag AS g, round(l_quantity, 4) AS x,
        |    round(l_discount, 4) AS y, CAST(count(*) AS BIGINT) AS n
        |  FROM lineitem GROUP BY 1, 2, 3),
        |cd AS (SELECT a.g,
        |    CAST(sum(CASE WHEN b.y > a.y THEN a.n * b.n ELSE 0 END)
        |      AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN b.y < a.y THEN a.n * b.n ELSE 0 END)
        |      AS BIGINT) AS d
        |  FROM h a JOIN h b ON a.g = b.g AND a.x < b.x GROUP BY 1),
        |t1 AS (SELECT g, CAST(sum(t * (t - 1) / 2) AS BIGINT) AS n1
        |  FROM (SELECT g, x, sum(n) AS t FROM h GROUP BY 1, 2) GROUP BY 1),
        |t2 AS (SELECT g, CAST(sum(t * (t - 1) / 2) AS BIGINT) AS n2
        |  FROM (SELECT g, y, sum(n) AS t FROM h GROUP BY 1, 2) GROUP BY 1),
        |nt AS (SELECT g, CAST(sum(n) AS BIGINT) AS n FROM h GROUP BY 1)
        |SELECT nt.g AS l_returnflag, nt.n,
        |  coalesce(cd.c, 0) AS concordant, coalesce(cd.d, 0) AS discordant,
        |  CASE WHEN (nt.n * (nt.n - 1) / 2 - t1.n1)
        |         * (nt.n * (nt.n - 1) / 2 - t2.n2) > 0
        |    THEN round((coalesce(cd.c, 0) - coalesce(cd.d, 0))
        |      / sqrt(CAST(nt.n * (nt.n - 1) / 2 - t1.n1 AS DOUBLE)
        |           * CAST(nt.n * (nt.n - 1) / 2 - t2.n2 AS DOUBLE)), 6)
        |  END AS tau_b
        |FROM nt LEFT JOIN cd ON cd.g = nt.g
        |JOIN t1 ON t1.g = nt.g JOIN t2 ON t2.g = nt.g
        |ORDER BY 1""".stripMargin,

    "q201_logrank" ->
      """WITH subj AS (SELECT user_id,
        |    CAST(date_diff('day', CAST(min(ts) AS DATE),
        |      CAST(coalesce(min(ts) FILTER (event_type = 'purchase'),
        |        max(ts)) AS DATE)) AS BIGINT) AS dur,
        |    CASE WHEN min(ts) FILTER (event_type = 'purchase')
        |      IS NOT NULL THEN 1 ELSE 0 END AS ev,
        |    CAST(user_id % 2 AS INT) AS side
        |  FROM events GROUP BY 1),
        |h AS (SELECT dur AS t,
        |    CAST(sum(ev) FILTER (side = 0) AS BIGINT) AS da,
        |    CAST(sum(ev) FILTER (side = 1) AS BIGINT) AS db,
        |    CAST(count(*) FILTER (side = 0) AS BIGINT) AS aa,
        |    CAST(count(*) FILTER (side = 1) AS BIGINT) AS ab
        |  FROM subj GROUP BY 1),
        |tot AS (SELECT CAST(sum(aa) AS BIGINT) AS na,
        |    CAST(sum(ab) AS BIGINT) AS nb FROM h),
        |r AS (SELECT t, coalesce(da, 0) AS da, coalesce(db, 0) AS db,
        |    na - (sum(aa) OVER w - aa) AS nra,
        |    nb - (sum(ab) OVER w - ab) AS nrb
        |  FROM h, tot WINDOW w AS (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |f AS (SELECT da, db,
        |    CAST(nra + nrb AS DOUBLE) AS n, da + db AS d,
        |    CAST(nra AS DOUBLE) / (nra + nrb) AS ra
        |  FROM r WHERE da + db > 0),
        |g AS (SELECT da,
        |    CAST(round(CAST(d AS DOUBLE) * ra, 12)
        |      AS DECIMAL(38,12)) AS e,
        |    CAST(CASE WHEN n > 1 THEN round(CAST(d AS DOUBLE) * ra *
        |        (1.0 - ra) * (n - d) / (n - 1), 12)
        |      ELSE 0 END AS DECIMAL(38,12)) AS v
        |  FROM f),
        |s AS (SELECT CAST(sum(da) AS BIGINT) AS oa,
        |    CAST(sum(e) AS DOUBLE) AS ea,
        |    CAST(sum(v) AS DOUBLE) AS vv FROM g)
        |SELECT na AS n_a, nb AS n_b, oa AS obs_a,
        |  round(ea, 4) AS exp_a,
        |  CASE WHEN vv > 0 THEN round((oa - ea) / sqrt(vv), 6) END AS z,
        |  CASE WHEN vv > 0 THEN round(pow(oa - ea, 2) / vv, 6)
        |    END AS chi2
        |FROM s, tot""".stripMargin,

    "q202_pettitt" ->
      """WITH daily AS (SELECT event_type AS g,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS x,
        |    CAST(sum(CAST(round(CAST(value AS DOUBLE), 4)
        |      AS DECIMAL(18,4))) AS DOUBLE) AS y
        |  FROM events GROUP BY 1, 2),
        |rk AS (SELECT g, x,
        |    rank() OVER (PARTITION BY g ORDER BY y)
        |      + count(*) OVER (PARTITION BY g ORDER BY y
        |        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS r2
        |  FROM daily),
        |tm AS (SELECT g, x, r2,
        |    row_number() OVER (PARTITION BY g ORDER BY x) AS t,
        |    sum(r2) OVER (PARTITION BY g ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS w2,
        |    count(*) OVER (PARTITION BY g) AS n
        |  FROM rk),
        |u AS (SELECT g, x, n, w2 - t * (n + 1) AS u, t
        |  FROM tm WHERE t < n),
        |pick AS (SELECT g, x, n, u, abs(u) AS k,
        |    row_number() OVER (PARTITION BY g
        |      ORDER BY abs(u) DESC, t) AS rn
        |  FROM u)
        |SELECT g AS event_type, CAST(n AS BIGINT) AS n,
        |  x AS t_star, CAST(k AS BIGINT) AS k_stat,
        |  CAST(u AS BIGINT) AS u_star,
        |  round(2.0 * exp(-6.0 * CAST(k AS DOUBLE) * k /
        |    (pow(CAST(n AS DOUBLE), 3) + n * n)), 6) AS p_approx
        |FROM pick WHERE rn = 1 ORDER BY 1""".stripMargin,

    "q203_diversity" ->
      """WITH c AS (SELECT event_type AS g, user_id AS u,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |a AS (SELECT g, CAST(sum(c) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS richness,
        |    CAST(sum(CAST(c AS DECIMAL(38,0)) * c) AS DECIMAL(38,0))
        |      AS s2,
        |    CAST(sum(CAST(round(CAST(c AS DOUBLE) *
        |        ln(CAST(c AS DOUBLE)), 8) AS DECIMAL(38,8)))
        |      AS DOUBLE) AS cl
        |  FROM c GROUP BY 1),
        |b AS (SELECT g, n, richness,
        |    CAST(s2 AS DOUBLE) / (CAST(n AS DOUBLE) * n) AS simp,
        |    ln(CAST(n AS DOUBLE)) - cl / n AS h
        |  FROM a)
        |SELECT g AS event_type, n, richness,
        |  round(simp, 6) AS simpson,
        |  round(1.0 / simp, 6) AS inv_simpson,
        |  round(h, 6) AS shannon, round(exp(h), 6) AS hill1
        |FROM b ORDER BY 1""".stripMargin,

    "q204_grubbs" ->
      """WITH v AS (SELECT c_mktsegment AS g,
        |    CAST(round(CAST(c_acctbal AS DOUBLE), 4) AS DECIMAL(18,4))
        |      AS v
        |  FROM customer),
        |st AS (SELECT g, CAST(count(*) AS BIGINT) AS n, sum(v) AS s,
        |    sum(v * v) AS q
        |  FROM v GROUP BY 1),
        |m AS (SELECT g, n, CAST(s AS DOUBLE) / n AS mean,
        |    CASE WHEN n > 1 THEN (CAST(q AS DOUBLE)
        |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (n - 1)
        |      END AS var
        |  FROM st),
        |sd AS (SELECT g, n, mean,
        |    CASE WHEN var > 0 THEN sqrt(var) END AS sd FROM m),
        |d AS (SELECT v.g, n, mean, sd,
        |    abs(CAST(v AS DOUBLE) - mean) AS dev,
        |    CAST(v AS DOUBLE) AS vd,
        |    row_number() OVER (PARTITION BY v.g
        |      ORDER BY abs(CAST(v AS DOUBLE) - mean) DESC,
        |        CAST(v AS DOUBLE) DESC) AS rn
        |  FROM v JOIN sd ON v.g = sd.g)
        |SELECT g AS c_mktsegment, n, round(mean, 6) AS mean,
        |  round(sd, 6) AS sd,
        |  CASE WHEN sd IS NOT NULL THEN round(dev / sd, 6)
        |    END AS g_stat,
        |  round(vd, 4) AS outlier_value
        |FROM d WHERE rn = 1 ORDER BY 1""".stripMargin,

    "q184_wasserstein" ->
      """WITH q AS (SELECT round(value, 4) AS v, event_type
        |  FROM events WHERE event_type IN ('click', 'view')),
        |h AS (SELECT v,
        |    CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS na,
        |    CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS nb
        |  FROM q GROUP BY 1),
        |c AS (SELECT v, sum(na) OVER w AS ca, sum(nb) OVER w AS cb,
        |    lead(v) OVER (ORDER BY v) AS vn
        |  FROM h WINDOW w AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |t AS (SELECT CAST(sum(na) AS DECIMAL(18,0)) AS tna,
        |    CAST(sum(nb) AS DECIMAL(18,0)) AS tnb FROM h)
        |SELECT round(CAST(sum(CAST(round(
        |    CAST(abs(CAST(ca AS DECIMAL(18,0)) * tnb
        |      - CAST(cb AS DECIMAL(18,0)) * tna) AS DOUBLE)
        |    / CAST(tna * tnb AS DOUBLE) * (vn - v), 12)
        |    AS DECIMAL(28,14))) AS DOUBLE), 6) AS wasserstein,
        |  CAST(max(tna) AS BIGINT) AS n_a, CAST(max(tnb) AS BIGINT) AS n_b
        |FROM c, t WHERE vn IS NOT NULL""".stripMargin,

    "q185_assortativity" ->
      """WITH e AS (SELECT DISTINCT o_custkey AS l, l_suppkey AS r
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |dl AS (SELECT l, CAST(count(*) AS BIGINT) AS degl FROM e GROUP BY 1),
        |dr AS (SELECT r, CAST(count(*) AS BIGINT) AS degr FROM e GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_edges,
        |  round(corr(CAST(degl AS DOUBLE), CAST(degr AS DOUBLE)), 4)
        |    AS assortativity
        |FROM e JOIN dl USING (l) JOIN dr USING (r)""".stripMargin,

    "q186_chi_square" ->
      """WITH base AS (SELECT event_type AS x,
        |    CASE WHEN value > 100 THEN 'high' ELSE 'low' END AS y
        |  FROM events),
        |cells AS (SELECT x, y, CAST(count(*) AS BIGINT) AS o
        |  FROM base GROUP BY 1, 2),
        |rm AS (SELECT x, sum(o) AS rx FROM cells GROUP BY 1),
        |cm AS (SELECT y, sum(o) AS cy FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS DOUBLE) AS tn,
        |    count(DISTINCT x) AS nr, count(DISTINCT y) AS nc FROM cells),
        |grid AS (SELECT rm.x, cm.y, rm.rx, cm.cy,
        |    coalesce(cells.o, 0) AS o
        |  FROM rm CROSS JOIN cm
        |  LEFT JOIN cells ON cells.x = rm.x AND cells.y = cm.y),
        |terms AS (SELECT CAST(round(
        |      pow(o - CAST(rx AS DOUBLE) * cy / tn, 2)
        |        / (CAST(rx AS DOUBLE) * cy / tn), 12)
        |    AS DECIMAL(28,14)) AS term, tn, nr, nc
        |  FROM grid, tot)
        |SELECT CAST(max(tn) AS BIGINT) AS n,
        |  CAST((max(nr) - 1) * (max(nc) - 1) AS BIGINT) AS dof,
        |  round(CAST(sum(term) AS DOUBLE), 6) AS chi2,
        |  round(sqrt(CAST(sum(term) AS DOUBLE)
        |    / (max(tn) * least(max(nr) - 1, max(nc) - 1))), 6)
        |    AS cramers_v
        |FROM terms""".stripMargin,

    "q187_mann_whitney" ->
      """WITH q AS (SELECT round(value, 4) AS v, event_type
        |  FROM events WHERE event_type IN ('click', 'view')),
        |h AS (SELECT v,
        |    CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS na,
        |    CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS nb
        |  FROM q GROUP BY 1),
        |c AS (SELECT v, na, nb, na + nb AS t,
        |    sum(na + nb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) - (na + nb) AS bef
        |  FROM h),
        |s AS (SELECT
        |    CAST(sum(CAST(na AS DECIMAL(38,0)) * (2 * bef + t + 1))
        |      AS DECIMAL(38,0)) AS ra2,
        |    CAST(sum(na) AS DECIMAL(38,0)) AS qa,
        |    CAST(sum(nb) AS DECIMAL(38,0)) AS qb,
        |    CAST(sum(CAST(t AS DECIMAL(38,0)) * t * t - t)
        |      AS DECIMAL(38,0)) AS ties
        |  FROM c)
        |SELECT CAST(qa AS BIGINT) AS n_a, CAST(qb AS BIGINT) AS n_b,
        |  round(CAST(ra2 - qa * (qa + 1) AS DOUBLE) / 2, 4) AS u_a,
        |  CASE WHEN CAST(qa AS DOUBLE) * CAST(qb AS DOUBLE) / 12.0 *
        |      ((CAST(qa AS DOUBLE) + CAST(qb AS DOUBLE)) + 1
        |        - CAST(ties AS DOUBLE) /
        |        ((CAST(qa AS DOUBLE) + CAST(qb AS DOUBLE)) *
        |          ((CAST(qa AS DOUBLE) + CAST(qb AS DOUBLE)) - 1))) > 0
        |    THEN round((CAST(ra2 - qa * (qa + 1) AS DOUBLE) / 2
        |        - CAST(qa AS DOUBLE) * CAST(qb AS DOUBLE) / 2) /
        |      sqrt(CAST(qa AS DOUBLE) * CAST(qb AS DOUBLE) / 12.0 *
        |        ((CAST(qa AS DOUBLE) + CAST(qb AS DOUBLE)) + 1
        |          - CAST(ties AS DOUBLE) /
        |          ((CAST(qa AS DOUBLE) + CAST(qb AS DOUBLE)) *
        |            ((CAST(qa AS DOUBLE) + CAST(qb AS DOUBLE)) - 1)))), 6)
        |  END AS z
        |FROM s""".stripMargin,

    "q188_winsorize" ->
      """WITH f AS (SELECT c_mktsegment,
        |    round(quantile_cont(c_acctbal, 0.05), 6) AS lo,
        |    round(quantile_cont(c_acctbal, 0.95), 6) AS hi
        |  FROM customer GROUP BY 1),
        |w AS (SELECT c.c_mktsegment, c_acctbal, lo, hi,
        |    CAST(round(least(greatest(CAST(c_acctbal AS DOUBLE), lo),
        |      hi), 6) AS DECIMAL(12,6)) AS wv,
        |    CAST(round(CAST(c_acctbal AS DOUBLE), 6) AS DECIMAL(12,6))
        |      AS rv
        |  FROM customer c JOIN f ON c.c_mktsegment = f.c_mktsegment)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(*) FILTER (c_acctbal < lo) AS BIGINT) AS n_clip_lo,
        |  CAST(count(*) FILTER (c_acctbal > hi) AS BIGINT) AS n_clip_hi,
        |  round(min(lo), 6) AS lo_fence, round(min(hi), 6) AS hi_fence,
        |  round(CAST(sum(wv) AS DOUBLE) / count(*), 6) AS win_mean,
        |  round(CAST(sum(rv) AS DOUBLE) / count(*), 6) AS raw_mean,
        |  CASE WHEN count(*) > 1 THEN round(sqrt(greatest(
        |      (CAST(sum(CAST(wv AS DECIMAL(20,6)) * wv) AS DOUBLE)
        |        - CAST(sum(wv) AS DOUBLE) *
        |        CAST(sum(wv) AS DOUBLE) / count(*)) / (count(*) - 1),
        |      0.0)), 6)
        |  END AS win_std
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,

    "q189_bh_fdr" ->
      """WITH e AS (SELECT event_type,
        |    CAST(dayofweek(CAST(ts AS DATE)) + 1 AS INT) AS dw,
        |    CAST(round(CAST(value AS DOUBLE), 4) AS DECIMAL(18,4)) AS v
        |  FROM events),
        |cell AS (SELECT event_type, dw, CAST(count(*) AS BIGINT) AS n,
        |    sum(v) AS s, sum(v * v) AS ss
        |  FROM e GROUP BY 1, 2),
        |tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tn,
        |    sum(s) AS tsum, sum(ss) AS tss FROM cell GROUP BY 1),
        |t1 AS (SELECT event_type, dw, n, tn - n AS nr,
        |    CAST(s AS DOUBLE) / n AS md,
        |    CAST(tsum - s AS DOUBLE) / (tn - n) AS mr,
        |    (CAST(ss AS DOUBLE) - n * (CAST(s AS DOUBLE) / n) *
        |      (CAST(s AS DOUBLE) / n)) / (n - 1) AS vd,
        |    (CAST(tss - ss AS DOUBLE) - (tn - n) *
        |      (CAST(tsum - s AS DOUBLE) / (tn - n)) *
        |      (CAST(tsum - s AS DOUBLE) / (tn - n))) / (tn - n - 1) AS vr
        |  FROM cell JOIN tot USING (event_type)
        |  WHERE n > 1 AND tn - n > 1),
        |t2 AS (SELECT event_type || '#' || CAST(dw AS VARCHAR) AS test_id,
        |    CASE WHEN sqrt(vd / n + vr / nr) > 0
        |      THEN round((md - mr) / sqrt(vd / n + vr / nr), 6)
        |    END AS z
        |  FROM t1),
        |t3 AS (SELECT test_id,
        |    round(2.0 / (1.0 + exp(1.702 * abs(z))), 6) AS p FROM t2),
        |rk AS (SELECT test_id, p,
        |    CAST(row_number() OVER (ORDER BY round(p, 6) ASC NULLS LAST,
        |      test_id) AS BIGINT) AS r,
        |    CAST(count(p) OVER () AS BIGINT) AS m
        |  FROM t3),
        |cr AS (SELECT test_id, p, r, round(CAST(r AS DOUBLE) *
        |    CAST(0.1 AS DOUBLE) / m, 12) AS crit
        |  FROM rk),
        |ks AS (SELECT max(r) FILTER (p <= crit) AS k FROM cr)
        |SELECT test_id, p, r, crit,
        |  CAST(CASE WHEN r <= coalesce(k, 0) THEN 1 ELSE 0 END AS INT)
        |    AS is_reject
        |FROM cr, ks ORDER BY test_id""".stripMargin,

    "q190_mann_kendall" ->
      """WITH m AS (SELECT o_orderpriority,
        |    CAST(date_diff('month', TIMESTAMP '1992-01-01', o_orderdate)
        |      AS BIGINT) AS mi,
        |    CAST(count(*) AS DOUBLE) AS cnt
        |  FROM orders GROUP BY 1, 2),
        |s AS (SELECT a.o_orderpriority,
        |    CAST(sum(CAST(sign(b.cnt - a.cnt) AS BIGINT)) AS BIGINT)
        |      AS sstat
        |  FROM m a JOIN m b ON a.o_orderpriority = b.o_orderpriority
        |    AND b.mi > a.mi GROUP BY 1),
        |base AS (SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
        |  FROM m GROUP BY 1),
        |tg AS (SELECT o_orderpriority,
        |    CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tt
        |  FROM (SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS t
        |    FROM m GROUP BY o_orderpriority, cnt) GROUP BY 1)
        |SELECT b.o_orderpriority, b.n, coalesce(sstat, 0) AS s_stat,
        |  CASE WHEN CAST(b.n * (b.n - 1) * (2 * b.n + 5) - tt AS DOUBLE)
        |      / 18.0 > 0
        |    THEN round(CAST(coalesce(sstat, 0)
        |        - sign(coalesce(sstat, 0)) AS DOUBLE) /
        |      sqrt(CAST(b.n * (b.n - 1) * (2 * b.n + 5) - tt AS DOUBLE)
        |        / 18.0), 6)
        |  END AS z
        |FROM base b LEFT JOIN s USING (o_orderpriority)
        |  JOIN tg USING (o_orderpriority)
        |ORDER BY o_orderpriority""".stripMargin,

    "q192_ngram_novelty" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents),
        |g AS (SELECT DISTINCT doc_id,
        |    t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
        |  FROM toks, (SELECT unnest(generate_series(1,
        |    (SELECT max(len(string_split(text, ' '))) FROM documents)))
        |    AS i)
        |  WHERE i + 2 <= len(t)),
        |df AS (SELECT gram, count(*) AS dfreq FROM g GROUP BY 1)
        |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(count(*) FILTER (df.dfreq = 1) AS BIGINT) AS n_novel,
        |  round(CAST(count(*) FILTER (df.dfreq = 1) AS DOUBLE)
        |    / count(*), 6) AS novel_frac
        |FROM g JOIN df ON g.gram = df.gram
        |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,

    "q193_seasonal_dow" ->
      """WITH daily AS (SELECT event_type,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS day,
        |    CAST(dayofweek(CAST(ts AS DATE)) + 1 AS INT) AS dow,
        |    CAST(sum(CAST(round(CAST(value AS DOUBLE), 4)
        |      AS DECIMAL(18,4))) AS DOUBLE) AS daily
        |  FROM events GROUP BY 1, 2, 3),
        |t AS (SELECT event_type, day, dow,
        |    CAST(round(daily, 6) AS DECIMAL(18,6)) AS v
        |  FROM daily),
        |m AS (SELECT event_type, dow, v,
        |    CAST(sum(v) OVER w AS DECIMAL(24,6)) *
        |      CAST(420 / (count(*) OVER w) AS DECIMAL(3,0)) AS tn
        |  FROM t WINDOW w AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))
        |SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n_days,
        |  round((CAST(sum(v) AS DOUBLE) - CAST(sum(tn) AS DOUBLE) / 420)
        |    / count(*), 6) AS effect,
        |  round(CAST(sum(tn) AS DOUBLE) / 420 / count(*), 6)
        |    AS trend_mean
        |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q195_kmv_jaccard" ->
      """WITH hf AS (SELECT
        |    ('0x' || substr(md5(user_id::VARCHAR), 1, 12))::BIGINT AS u,
        |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ia,
        |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS ib
        |  FROM events WHERE event_type IN ('click', 'view')
        |  GROUP BY 1),
        |ka AS (SELECT u, row_number() OVER (ORDER BY u) AS rn FROM hf
        |  WHERE ia = 1),
        |sa AS (SELECT CAST(count(*) FILTER (rn <= 64) AS BIGINT) AS nka,
        |    max(u) FILTER (rn <= 64) AS uak FROM ka),
        |kb AS (SELECT u, row_number() OVER (ORDER BY u) AS rn FROM hf
        |  WHERE ib = 1),
        |sb AS (SELECT CAST(count(*) FILTER (rn <= 64) AS BIGINT) AS nkb,
        |    max(u) FILTER (rn <= 64) AS ubk FROM kb),
        |un AS (SELECT u, ia, ib, row_number() OVER (ORDER BY u) AS rn
        |  FROM hf),
        |su AS (SELECT CAST(count(*) FILTER (rn <= 64) AS BIGINT) AS ku,
        |    max(u) FILTER (rn <= 64) AS uk FROM un),
        |ex AS (SELECT CAST(count(*) AS BIGINT) AS exact_union,
        |    CAST(sum(ia * ib) AS BIGINT) AS exact_inter FROM hf),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS c FROM un, sa, sb
        |  WHERE un.rn <= 64 AND ia = 1 AND ib = 1
        |    AND (nka < 64 OR u <= uak) AND (nkb < 64 OR u <= ubk)),
        |du AS (SELECT ku, CASE WHEN ku < 64 THEN CAST(ku AS DOUBLE)
        |    ELSE CAST(63 AS DOUBLE) * 281474976710656 / uk END AS d
        |  FROM su)
        |SELECT ku AS k_used, round(d, 4) AS union_est,
        |  CASE WHEN ku > 0 THEN round(CAST(c AS DOUBLE) / ku, 6)
        |    END AS jaccard_est,
        |  CASE WHEN ku > 0 THEN round(CAST(c AS DOUBLE) / ku * d, 4)
        |    END AS inter_est,
        |  exact_union, exact_inter,
        |  CASE WHEN exact_union > 0
        |    THEN round(CAST(exact_inter AS DOUBLE) / exact_union, 6)
        |    END AS exact_jaccard
        |FROM c, du, ex""".stripMargin,

    "q196_sax" ->
      """WITH daily AS (SELECT event_type,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS day,
        |    CAST(sum(CAST(round(CAST(value AS DOUBLE), 4)
        |      AS DECIMAL(18,4))) AS DOUBLE) AS daily
        |  FROM events GROUP BY 1, 2),
        |base AS (SELECT event_type, day,
        |    CAST(round(daily, 6) AS DECIMAL(18,6)) AS v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day)
        |      AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM daily),
        |sm AS (SELECT event_type, ((rn - 1) * 8) // n AS sg,
        |    CAST(sum(v) AS DOUBLE) / count(*) AS m
        |  FROM base GROUP BY 1, 2),
        |br AS (SELECT event_type,
        |    round(quantile_cont(CAST(v AS DOUBLE), 0.25), 6) AS q1,
        |    round(quantile_cont(CAST(v AS DOUBLE), 0.5), 6) AS q2,
        |    round(quantile_cont(CAST(v AS DOUBLE), 0.75), 6) AS q3
        |  FROM base GROUP BY 1),
        |sym AS (SELECT sm.event_type, sg,
        |    CASE WHEN m < q1 THEN 'a' WHEN m < q2 THEN 'b'
        |      WHEN m < q3 THEN 'c' ELSE 'd' END AS y
        |  FROM sm JOIN br ON sm.event_type = br.event_type)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_segments,
        |  string_agg(y, '' ORDER BY sg) AS sax
        |FROM sym GROUP BY 1 ORDER BY 1""".stripMargin,

    "q197_anova_f" ->
      """WITH v AS (SELECT event_type AS g,
        |    CAST(round(value, 4) AS DECIMAL(18,4)) AS v FROM events),
        |gr AS (SELECT g, CAST(count(*) AS BIGINT) AS n, sum(v) AS s,
        |    sum(v * v) AS q
        |  FROM v GROUP BY 1),
        |g2 AS (SELECT g, n, s, q,
        |    CAST(round(pow(CAST(s AS DOUBLE), 2) / n, 12)
        |      AS DECIMAL(38,12)) AS sb
        |  FROM gr),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS kk,
        |    CAST(sum(n) AS BIGINT) AS nn,
        |    CAST(sum(s) AS DOUBLE) AS ts, CAST(sum(q) AS DOUBLE) AS tq,
        |    CAST(sum(sb) AS DOUBLE) AS tb
        |  FROM g2)
        |SELECT kk AS k, nn AS n,
        |  round(tb - ts * ts / nn, 6) AS ss_between,
        |  round(tq - tb, 6) AS ss_within,
        |  CASE WHEN kk > 1 AND nn > kk AND tq - tb > 0
        |    THEN round(((tb - ts * ts / nn) / (kk - 1)) /
        |      ((tq - tb) / (nn - kk)), 6) END AS f_stat,
        |  CASE WHEN tq - ts * ts / nn > 0
        |    THEN round((tb - ts * ts / nn) / (tq - ts * ts / nn), 6)
        |    END AS eta_sq
        |FROM t""".stripMargin,

    "q198_kruskal_wallis" ->
      """WITH obs AS (SELECT event_type AS g, round(value, 4) AS v
        |  FROM events),
        |cells AS (SELECT v, g, CAST(count(*) AS BIGINT) AS c
        |  FROM obs GROUP BY 1, 2),
        |hv AS (SELECT v, CAST(sum(c) AS BIGINT) AS t
        |  FROM cells GROUP BY 1),
        |r AS (SELECT v, t, sum(t) OVER (ORDER BY v ROWS BETWEEN
        |    UNBOUNDED PRECEDING AND CURRENT ROW) - t AS bef FROM hv),
        |ar AS (SELECT v, 2 * bef + t + 1 AS ar2 FROM r),
        |grp AS (SELECT g, CAST(sum(c) AS BIGINT) AS n,
        |    CAST(sum(CAST(c AS DECIMAL(38,0)) * ar2) AS DECIMAL(38,0))
        |      AS r2
        |  FROM cells JOIN ar USING (v) GROUP BY 1),
        |gt AS (SELECT g, n, r2,
        |    CAST(round(pow(CAST(r2 AS DOUBLE), 2) / (4.0 * n), 12)
        |      AS DECIMAL(38,12)) AS term
        |  FROM grp),
        |ties AS (SELECT CAST(sum(CAST(t AS DECIMAL(38,0)) * t * t - t)
        |    AS DECIMAL(38,0)) AS tt FROM hv),
        |agg AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
        |    CAST(count(*) AS BIGINT) AS kk,
        |    CAST(sum(term) AS DOUBLE) AS s4 FROM gt)
        |SELECT nn AS n, kk AS k,
        |  CASE WHEN nn > 1 THEN round(12.0 * s4 /
        |    (CAST(nn AS DOUBLE) * (nn + 1)) - 3 * (nn + 1), 6) END AS h,
        |  CASE WHEN nn > 1 AND 1.0 - CAST(tt AS DOUBLE) /
        |      (CAST(nn AS DOUBLE) * nn * nn - nn) > 0
        |    THEN round((12.0 * s4 / (CAST(nn AS DOUBLE) * (nn + 1))
        |        - 3 * (nn + 1)) /
        |      (1.0 - CAST(tt AS DOUBLE) /
        |        (CAST(nn AS DOUBLE) * nn * nn - nn)), 6) END AS h_adj
        |FROM agg, ties""".stripMargin,

    "q199_brown_forsythe" ->
      """WITH med AS (SELECT event_type AS mg,
        |    round(quantile_cont(value, 0.5), 6) AS med
        |  FROM events GROUP BY 1),
        |v AS (SELECT event_type AS g,
        |    CAST(round(abs(value - med), 4) AS DECIMAL(18,4)) AS v
        |  FROM events JOIN med ON event_type = mg),
        |gr AS (SELECT g, CAST(count(*) AS BIGINT) AS n, sum(v) AS s,
        |    sum(v * v) AS q
        |  FROM v GROUP BY 1),
        |g2 AS (SELECT g, n, s, q,
        |    CAST(round(pow(CAST(s AS DOUBLE), 2) / n, 12)
        |      AS DECIMAL(38,12)) AS sb
        |  FROM gr),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS kk,
        |    CAST(sum(n) AS BIGINT) AS nn,
        |    CAST(sum(s) AS DOUBLE) AS ts, CAST(sum(q) AS DOUBLE) AS tq,
        |    CAST(sum(sb) AS DOUBLE) AS tb
        |  FROM g2)
        |SELECT kk AS k, nn AS n,
        |  round(tb - ts * ts / nn, 6) AS ss_between,
        |  round(tq - tb, 6) AS ss_within,
        |  CASE WHEN kk > 1 AND nn > kk AND tq - tb > 0
        |    THEN round(((tb - ts * ts / nn) / (kk - 1)) /
        |      ((tq - tb) / (nn - kk)), 6) END AS f_stat,
        |  CASE WHEN tq - ts * ts / nn > 0
        |    THEN round((tb - ts * ts / nn) / (tq - ts * ts / nn), 6)
        |    END AS eta_sq
        |FROM t""".stripMargin,

    "q200_jarque_bera" ->
      """WITH v AS (SELECT event_type AS g,
        |    CAST(round(value, 4) AS DECIMAL(18,4)) AS v FROM events),
        |m AS (SELECT g AS mg, CAST(sum(v) AS DOUBLE) / count(*) AS mean
        |  FROM v GROUP BY 1),
        |d AS (SELECT g, CAST(v AS DOUBLE) - mean AS d
        |  FROM v JOIN m ON g = mg),
        |a AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(round(d * d, 8) AS DECIMAL(38,8)))
        |      AS DOUBLE) AS s2,
        |    CAST(sum(CAST(round(d * d * d, 8) AS DECIMAL(38,8)))
        |      AS DOUBLE) AS s3,
        |    CAST(sum(CAST(round(d * d * d * d, 8) AS DECIMAL(38,8)))
        |      AS DOUBLE) AS s4
        |  FROM d GROUP BY 1),
        |b AS (SELECT g, n, s2 / n AS m2, s3, s4 FROM a),
        |c AS (SELECT g, n,
        |    CASE WHEN m2 > 0 THEN s3 / n / pow(m2, 1.5) END AS sk,
        |    CASE WHEN m2 > 0 THEN s4 / n / (m2 * m2) END AS ku
        |  FROM b)
        |SELECT g AS event_type, n, round(sk, 6) AS skewness,
        |  round(ku, 6) AS kurtosis,
        |  round(CAST(n AS DOUBLE) / 6 *
        |    (sk * sk + pow(ku - 3, 2) / 4), 6) AS jb
        |FROM c ORDER BY 1""".stripMargin,

    "q38_request_response" ->
      """WITH requests AS (SELECT '{"userid": ' || c_custkey || '}' AS req_json
        |  FROM customer WHERE c_custkey < 100),
        |parsed AS (SELECT CAST(json_extract_string(req_json, '$.userid') AS BIGINT) AS user_id
        |  FROM requests),
        |clicks AS (SELECT user_id, event_type, count(*) AS c FROM events
        |  WHERE value > 100 GROUP BY user_id, event_type),
        |types AS (SELECT unnest(['click', 'error', 'purchase', 'signup', 'view']) AS event_type),
        |cand AS (SELECT p.user_id, t.event_type,
        |  CAST(coalesce(c.c, 0) AS BIGINT) AS score
        |  FROM parsed p CROSS JOIN types t
        |  LEFT JOIN clicks c ON c.user_id = p.user_id AND c.event_type = t.event_type),
        |r AS (SELECT user_id, event_type, score,
        |  row_number() OVER (PARTITION BY user_id ORDER BY score DESC, event_type) AS rn
        |  FROM cand)
        |SELECT user_id, event_type, score, rn,
        |  '{"userid":' || user_id || ',"itemid":"' || event_type || '","score":' || score || '}' AS resp
        |FROM r WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin,

    "q262_cochran_q" ->
      """WITH cells AS (SELECT user_id AS b, event_type AS t,
        |    max(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS x
        |  FROM events GROUP BY 1, 2),
        |grid AS (SELECT bb.b, tt.t, coalesce(c.x, 0) AS x
        |  FROM (SELECT DISTINCT b FROM cells) bb
        |  CROSS JOIN (SELECT DISTINCT t FROM cells) tt
        |  LEFT JOIN cells c ON c.b = bb.b AND c.t = tt.t),
        |rws AS (SELECT b, sum(x) AS bi FROM grid GROUP BY 1),
        |rs AS (SELECT count(*) AS n_blocks, sum(bi) AS tt,
        |    sum(bi * bi) AS b2 FROM rws),
        |cls AS (SELECT t, sum(x) AS gj FROM grid GROUP BY 1),
        |cs AS (SELECT count(*) AS k, sum(gj * gj) AS g2 FROM cls)
        |SELECT CAST(k AS BIGINT) AS k, n_blocks,
        |  CAST(tt AS BIGINT) AS t_total, CAST(k - 1 AS BIGINT) AS df,
        |  CASE WHEN k * tt - b2 > 0 THEN
        |    round(CAST((k - 1) * (k * g2 - tt * tt) AS DOUBLE)
        |      / CAST(k * tt - b2 AS DOUBLE), 6) END AS q_stat
        |FROM rs CROSS JOIN cs""".stripMargin,

    "q263_cochran_armitage" ->
      """WITH s AS (SELECT o_orderpriority AS g,
        |    CAST(month(o_orderdate) AS BIGINT) AS s,
        |    count(*) AS n,
        |    sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS r
        |  FROM orders GROUP BY 1, 2),
        |m AS (SELECT g, sum(n) AS nn, sum(r) AS rr, sum(s * n) AS s1,
        |    sum(s * s * n) AS s2, sum(s * r) AS sr
        |  FROM s GROUP BY 1)
        |SELECT g AS o_orderpriority, CAST(nn AS BIGINT) AS n,
        |  CAST(rr AS BIGINT) AS positives,
        |  round(CAST(sr AS DOUBLE) - CAST(rr AS DOUBLE)
        |    * CAST(s1 AS DOUBLE) / CAST(nn AS DOUBLE), 6) AS t_stat,
        |  CASE WHEN rr > 0 AND rr < nn AND nn * s2 - s1 * s1 > 0 THEN
        |    round(CAST(nn * sr - rr * s1 AS DOUBLE)
        |      / sqrt(CAST(rr * (nn - rr) AS DOUBLE)
        |        * CAST(nn * s2 - s1 * s1 AS DOUBLE)
        |        / CAST(nn AS DOUBLE)), 6) END AS z
        |FROM m ORDER BY 1""".stripMargin,

    "q264_runs_test" ->
      """WITH s AS (SELECT event_type AS g,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
        |    round(CAST(count(*) AS DOUBLE), 4) AS y
        |  FROM events GROUP BY 1, 2),
        |h AS (SELECT g, y, count(*) AS c FROM s GROUP BY 1, 2),
        |hc AS (SELECT g, y, sum(c) OVER (PARTITION BY g ORDER BY y)
        |    AS cum, sum(c) OVER (PARTITION BY g) AS n FROM h),
        |med AS (SELECT g, min(CASE WHEN cum * 2 >= n THEN y END)
        |    AS med FROM hc GROUP BY 1),
        |sg AS (SELECT s.g, s.x,
        |    CASE WHEN s.y > m.med THEN 1 ELSE 0 END AS sgn
        |  FROM s JOIN med m ON s.g = m.g WHERE s.y <> m.med),
        |ch AS (SELECT g, x, sgn,
        |    CASE WHEN lag(sgn) OVER (PARTITION BY g ORDER BY x) IS NULL
        |      OR lag(sgn) OVER (PARTITION BY g ORDER BY x) <> sgn
        |      THEN 1 ELSE 0 END AS chg FROM sg),
        |ag AS (SELECT g, sum(sgn) AS n_above, sum(1 - sgn) AS n_below,
        |    sum(chg) AS runs FROM ch GROUP BY 1),
        |fin AS (SELECT g, n_above, n_below, runs,
        |    n_above + n_below AS n,
        |    2.0 * n_above * n_below / (n_above + n_below) + 1.0 AS mu,
        |    2.0 * n_above * n_below
        |      * (2.0 * n_above * n_below - (n_above + n_below))
        |      / (CAST(n_above + n_below AS DOUBLE) * (n_above + n_below)
        |        * (n_above + n_below - 1)) AS s2
        |  FROM ag)
        |SELECT g AS event_type, CAST(n_above AS BIGINT) AS n_above,
        |  CAST(n_below AS BIGINT) AS n_below, CAST(runs AS BIGINT)
        |    AS runs,
        |  round(mu, 6) AS expected_runs,
        |  CASE WHEN n_above > 0 AND n_below > 0 AND s2 > 0 THEN
        |    round((runs - mu) / sqrt(s2), 6) END AS z
        |FROM fin ORDER BY 1""".stripMargin,

    "q265_energy_distance" ->
      """WITH h AS (SELECT
        |    CAST(round(value * 100, 0) AS DECIMAL(38,0)) AS v,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS cb
        |  FROM events WHERE event_type IN ('view', 'purchase')
        |  GROUP BY 1),
        |c AS (SELECT v, ca, cb, ca * v AS sa, cb * v AS sb,
        |    sum(ca) OVER (ORDER BY v) AS cca,
        |    sum(cb) OVER (ORDER BY v) AS ccb,
        |    sum(ca * v) OVER (ORDER BY v) AS csa,
        |    sum(cb * v) OVER (ORDER BY v) AS csb FROM h),
        |t AS (SELECT sum(ca) AS na, sum(cb) AS nb, sum(ca * v) AS ta,
        |    sum(cb * v) AS tb FROM h),
        |p AS (SELECT
        |    sum(ca * (v * (ccb - cb) - (csb - sb)
        |      + (tb - csb) - v * (nb - ccb))) AS pab,
        |    sum(ca * (v * (cca - ca) - (csa - sa)
        |      + (ta - csa) - v * (na - cca))) AS paa,
        |    sum(cb * (v * (ccb - cb) - (csb - sb)
        |      + (tb - csb) - v * (nb - ccb))) AS pbb
        |  FROM c CROSS JOIN t),
        |e AS (SELECT
        |    CAST(pab AS DOUBLE) / CAST(na * nb AS DOUBLE) / 100.0
        |      AS exy,
        |    CAST(paa AS DOUBLE) / CAST(na * na AS DOUBLE) / 100.0
        |      AS exx,
        |    CAST(pbb AS DOUBLE) / CAST(nb * nb AS DOUBLE) / 100.0
        |      AS eyy,
        |    CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b
        |  FROM p CROSS JOIN t)
        |SELECT n_a, n_b, round(exy, 6) AS e_xy, round(exx, 6) AS e_xx,
        |  round(eyy, 6) AS e_yy,
        |  round(2.0 * exy - exx - eyy, 6) AS energy_dist
        |FROM e""".stripMargin,

    "q266_modularity" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
        |  FROM embeddings),
        |bb AS (SELECT 4 + (CASE WHEN count(*) >= 1000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 4000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 16000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 64000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 256000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 1024000 THEN 2 ELSE 0 END) AS bits
        |  FROM e),
        |n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm,
        |  CAST(list_sum(list_transform(range(bits),
        |    j -> CASE WHEN emb[j + 1] > 0 THEN 1 << j ELSE 0 END))
        |    AS INT) AS bucket
        |  FROM e CROSS JOIN bb),
        |pb AS (SELECT vec_id, emb, nrm,
        |  unnest(list_concat([bucket], list_transform(range(bits),
        |    j -> xor(bucket, CAST(1 << j AS INT))))) AS bucket
        |  FROM n CROSS JOIN bb),
        |p AS (SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
        |    list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) AS sim
        |  FROM pb a JOIN n b ON a.bucket = b.bucket
        |    AND a.vec_id <> b.vec_id),
        |r AS (SELECT vec_id, neighbor_id,
        |    row_number() OVER (PARTITION BY vec_id
        |      ORDER BY sim DESC, neighbor_id) AS rn
        |  FROM p),
        |t AS (SELECT vec_id, neighbor_id FROM r WHERE rn <= 5),
        |mk AS (SELECT a.vec_id AS s, a.neighbor_id AS d
        |  FROM t a JOIN t b ON a.vec_id = b.neighbor_id
        |    AND a.neighbor_id = b.vec_id
        |  WHERE a.vec_id < a.neighbor_id),
        |und AS (SELECT s, d FROM mk UNION ALL SELECT d AS s, s AS d
        |  FROM mk),
        |l0 AS (SELECT vec_id AS id, CAST(label AS BIGINT) AS lbl,
        |    0 AS rnd
        |  FROM embeddings WHERE vec_id % 3 = 0),
        |v1 AS (SELECT und.s AS id, l0.lbl, count(*) AS c
        |  FROM und JOIN l0 ON und.d = l0.id
        |  WHERE und.s NOT IN (SELECT id FROM l0) GROUP BY 1, 2),
        |p1 AS (SELECT id, lbl FROM (SELECT id, lbl, row_number() OVER
        |    (PARTITION BY id ORDER BY c DESC, lbl) AS rn FROM v1)
        |  WHERE rn = 1),
        |l1 AS (SELECT * FROM l0
        |  UNION ALL SELECT id, lbl, 1 AS rnd FROM p1),
        |v2 AS (SELECT und.s AS id, l1.lbl, count(*) AS c
        |  FROM und JOIN l1 ON und.d = l1.id
        |  WHERE und.s NOT IN (SELECT id FROM l1) GROUP BY 1, 2),
        |p2 AS (SELECT id, lbl FROM (SELECT id, lbl, row_number() OVER
        |    (PARTITION BY id ORDER BY c DESC, lbl) AS rn FROM v2)
        |  WHERE rn = 1),
        |l2 AS (SELECT * FROM l1
        |  UNION ALL SELECT id, lbl, 2 AS rnd FROM p2),
        |te AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
        |  FROM mk WHERE s <> d),
        |tg AS (SELECT te.a, te.b, la.lbl AS la, lb.lbl AS lb
        |  FROM te JOIN l2 la ON te.a = la.id
        |  JOIN l2 lb ON te.b = lb.id),
        |mm AS (SELECT count(*) AS m FROM tg),
        |i AS (SELECT la AS c, count(*) AS lc FROM tg WHERE la = lb
        |  GROUP BY 1),
        |dm AS (SELECT c, count(*) AS dc FROM
        |  (SELECT la AS c FROM tg UNION ALL SELECT lb FROM tg)
        |  GROUP BY 1),
        |np AS (SELECT lbl AS c, count(*) AS n_nodes FROM l2 GROUP BY 1)
        |SELECT np.c AS community, n_nodes,
        |  CAST(coalesce(lc, 0) AS BIGINT) AS internal_edges,
        |  CAST(coalesce(dc, 0) AS BIGINT) AS degree_mass,
        |  round(CAST(coalesce(lc, 0) AS DOUBLE) / m
        |    - (CAST(coalesce(dc, 0) AS DOUBLE) / (2.0 * m))
        |      * (CAST(coalesce(dc, 0) AS DOUBLE) / (2.0 * m)), 6)
        |    AS q_contrib
        |FROM np LEFT JOIN dm ON np.c = dm.c LEFT JOIN i ON np.c = i.c
        |CROSS JOIN mm ORDER BY 1""".stripMargin,

    "q267_neyman_allocation" ->
      """WITH s AS (SELECT c_mktsegment AS stratum, count(*) AS n_h,
        |    sum(CAST(round(c_acctbal, 4) AS DECIMAL(28,4))) AS sv,
        |    sum(CAST(round(c_acctbal, 4) AS DECIMAL(28,4))
        |      * CAST(round(c_acctbal, 4) AS DECIMAL(28,4))) AS qv
        |  FROM customer GROUP BY 1),
        |sd AS (SELECT stratum, n_h,
        |    round(sqrt(greatest(CAST(qv AS DOUBLE) / n_h
        |      - (CAST(sv AS DOUBLE) / n_h) * (CAST(sv AS DOUBLE) / n_h),
        |      0)), 6) AS sd_h FROM s),
        |t AS (SELECT sum(n_h) AS nn,
        |    sum(CAST(round(n_h * sd_h, 6) AS DECIMAL(38,6))) AS w
        |  FROM sd)
        |SELECT stratum, CAST(n_h AS BIGINT) AS n_h, sd_h,
        |  round(1000.0 * n_h / nn, 2) AS prop_alloc,
        |  CASE WHEN w > 0 THEN
        |    round(1000.0 * n_h * sd_h / CAST(w AS DOUBLE), 2)
        |    END AS neyman_alloc
        |FROM sd CROSS JOIN t ORDER BY 1""".stripMargin,

    "q268_l_diversity" ->
      """SELECT c_nationkey, c_mktsegment, count(*) AS group_size,
        |  CAST(count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT))
        |    AS BIGINT) AS l_distinct
        |FROM customer
        |GROUP BY 1, 2
        |HAVING count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT))
        |  < 8
        |ORDER BY 1, 2""".stripMargin,

    "q269_quantile_normalize" ->
      """WITH b AS (SELECT event_type AS g, round(value, 2) AS v
        |  FROM events),
        |h AS (SELECT g, v, count(*) AS c FROM b GROUP BY 1, 2),
        |gc AS (SELECT g, v,
        |    sum(c) OVER (PARTITION BY g ORDER BY v) AS cum,
        |    sum(c) OVER (PARTITION BY g) AS n FROM h),
        |qs AS (SELECT CAST(unnest(generate_series(1, 9)) AS INT) AS q),
        |gq AS (SELECT g, q, min(v) AS group_q
        |  FROM gc CROSS JOIN qs WHERE cum * 10 >= q * n GROUP BY 1, 2),
        |p AS (SELECT v, sum(c) AS c FROM h GROUP BY 1),
        |pc AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM p),
        |pt AS (SELECT sum(c) AS nn FROM p),
        |pq AS (SELECT q, min(v) AS pooled_q
        |  FROM pc CROSS JOIN pt CROSS JOIN qs
        |  WHERE cum * 10 >= q * nn GROUP BY 1)
        |SELECT g AS event_type, gq.q, group_q, pooled_q
        |FROM gq JOIN pq ON gq.q = pq.q ORDER BY 1, 2""".stripMargin,

    "q270_mase" ->
      """WITH s AS (SELECT event_type AS g,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
        |    CAST(count(*) AS BIGINT) AS y FROM events GROUP BY 1, 2),
        |j AS (SELECT c.g, c.x, c.y, p1.y AS y1, ps.y AS ys
        |  FROM s c JOIN s p1 ON c.g = p1.g AND c.x = p1.x + 1
        |  JOIN s ps ON c.g = ps.g AND c.x = ps.x + 7)
        |SELECT g AS event_type, CAST(count(*) AS BIGINT) AS n_eval,
        |  round(CAST(sum(abs(y - ys)) AS DOUBLE) / count(*), 6)
        |    AS mae_seasonal,
        |  round(CAST(sum(abs(y - y1)) AS DOUBLE) / count(*), 6)
        |    AS mae_naive,
        |  CASE WHEN sum(abs(y - y1)) > 0 THEN
        |    round(CAST(sum(abs(y - ys)) AS DOUBLE)
        |      / CAST(sum(abs(y - y1)) AS DOUBLE), 6) END AS mase
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    "q271_cvm_drift" ->
      """WITH h AS (SELECT round(value, 4) AS v,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS cb
        |  FROM events WHERE event_type IN ('click', 'view')
        |  GROUP BY 1),
        |c AS (SELECT v, ca, cb,
        |    sum(ca) OVER (ORDER BY v) AS cca,
        |    sum(cb) OVER (ORDER BY v) AS ccb FROM h),
        |t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM h),
        |p AS (SELECT sum(d * d * (ca + cb)) AS s FROM
        |  (SELECT CAST(cca * nb - ccb * na AS HUGEINT) AS d, ca, cb
        |   FROM c CROSS JOIN t))
        |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  round(CAST(s AS DOUBLE)
        |    / CAST((na + nb) * (na + nb) AS DOUBLE)
        |    / CAST(na AS DOUBLE) / CAST(nb AS DOUBLE), 6) AS cvm_stat
        |FROM p CROSS JOIN t""".stripMargin,

    "q272_pacf" ->
      """WITH s AS (SELECT event_type AS g,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
        |    CAST(count(*) AS BIGINT) AS y FROM events GROUP BY 1, 2),
        |mom AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS DECIMAL(38,0)) AS sy FROM s GROUP BY 1),
        |dev AS (SELECT s.g, s.x,
        |    round(CAST(y AS DOUBLE) - CAST(sy AS DOUBLE) / n, 6) AS d
        |  FROM s JOIN mom USING (g)),
        |den AS (SELECT g, sum(CAST(round(d * d, 12) AS DECIMAL(38,12)))
        |    AS ss FROM dev GROUP BY 1),
        |lags AS (SELECT unnest(generate_series(1, 3)) AS lg),
        |nm AS (SELECT c.g, l.lg,
        |    sum(CAST(round(c.d * p.d, 12) AS DECIMAL(38,12))) AS num
        |  FROM lags l JOIN dev c ON TRUE
        |  JOIN dev p ON p.g = c.g AND c.x = p.x + l.lg
        |  GROUP BY 1, 2),
        |rh AS (SELECT nm.g, lg, CASE WHEN CAST(ss AS DOUBLE) > 0
        |    THEN round(CAST(num AS DOUBLE) / CAST(ss AS DOUBLE), 6)
        |    ELSE 0 END AS rho
        |  FROM nm JOIN den USING (g)),
        |piv AS (SELECT g,
        |    max(CASE WHEN lg = 1 THEN rho END) AS r1,
        |    max(CASE WHEN lg = 2 THEN rho END) AS r2,
        |    max(CASE WHEN lg = 3 THEN rho END) AS r3
        |  FROM rh GROUP BY 1),
        |p2t AS (SELECT g, r1, r2, r3, 1.0 - r1 * r1 AS den2 FROM piv),
        |p3t AS (SELECT *, CASE WHEN abs(den2) > 1e-12 THEN
        |    (r2 - r1 * r1) / den2 END AS p2 FROM p2t),
        |p4t AS (SELECT *, r1 * (1.0 - p2) AS p21 FROM p3t),
        |p5t AS (SELECT *, 1.0 - p21 * r1 - p2 * r2 AS den3 FROM p4t),
        |p6t AS (SELECT *, CASE WHEN abs(den3) > 1e-12 THEN
        |    (r3 - p21 * r2 - p2 * r1) / den3 END AS p3 FROM p5t)
        |SELECT g AS event_type, 1 AS "lag", round(r1, 6) AS pacf
        |  FROM p6t
        |UNION ALL SELECT g, 2, round(p2, 6) FROM p6t
        |UNION ALL SELECT g, 3, round(p3, 6) FROM p6t
        |ORDER BY 1, 2""".stripMargin,

    "q273_profile_drift" ->
      """WITH a AS (SELECT * FROM orders
        |  WHERE o_orderdate < TIMESTAMP '1995-07-01'),
        |b AS (SELECT * FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-07-01'),
        |pa AS (
        |  SELECT 'o_orderstatus' AS col_name, count(*) AS n_a,
        |    round(CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1
        |      ELSE 0 END) AS DOUBLE) / greatest(count(*), 1), 6)
        |      AS null_frac_a,
        |    CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS distinct_a,
        |    CAST(NULL AS DOUBLE) AS mean_a FROM a
        |  UNION ALL SELECT 'o_totalprice', count(*),
        |    round(CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1
        |      ELSE 0 END) AS DOUBLE) / greatest(count(*), 1), 6),
        |    CAST(count(DISTINCT o_totalprice) AS BIGINT),
        |    round(avg(o_totalprice), 6) FROM a
        |  UNION ALL SELECT 'o_orderpriority', count(*),
        |    round(CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1
        |      ELSE 0 END) AS DOUBLE) / greatest(count(*), 1), 6),
        |    CAST(count(DISTINCT o_orderpriority) AS BIGINT),
        |    CAST(NULL AS DOUBLE) FROM a),
        |pb AS (
        |  SELECT 'o_orderstatus' AS col_name, count(*) AS n_b,
        |    round(CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1
        |      ELSE 0 END) AS DOUBLE) / greatest(count(*), 1), 6)
        |      AS null_frac_b,
        |    CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS distinct_b,
        |    CAST(NULL AS DOUBLE) AS mean_b FROM b
        |  UNION ALL SELECT 'o_totalprice', count(*),
        |    round(CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1
        |      ELSE 0 END) AS DOUBLE) / greatest(count(*), 1), 6),
        |    CAST(count(DISTINCT o_totalprice) AS BIGINT),
        |    round(avg(o_totalprice), 6) FROM b
        |  UNION ALL SELECT 'o_orderpriority', count(*),
        |    round(CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1
        |      ELSE 0 END) AS DOUBLE) / greatest(count(*), 1), 6),
        |    CAST(count(DISTINCT o_orderpriority) AS BIGINT),
        |    CAST(NULL AS DOUBLE) FROM b)
        |SELECT pa.col_name, n_a, null_frac_a, distinct_a, mean_a,
        |  n_b, null_frac_b, distinct_b, mean_b,
        |  round(mean_b - mean_a, 6) AS mean_shift
        |FROM pa JOIN pb ON pa.col_name = pb.col_name
        |ORDER BY 1""".stripMargin,

    "q274_jonckheere" ->
      """WITH b AS (SELECT CAST(quarter(o_orderdate) AS BIGINT) AS g,
        |    round(o_totalprice, -2) AS v FROM orders),
        |h AS (SELECT g, v, count(*) AS c FROM b GROUP BY 1, 2),
        |f AS (SELECT gg.g, vv.v, coalesce(h.c, 0) AS c
        |  FROM (SELECT DISTINCT g FROM h) gg
        |  CROSS JOIN (SELECT DISTINCT v FROM h) vv
        |  LEFT JOIN h ON h.g = gg.g AND h.v = vv.v),
        |cum AS (SELECT g, v, c, coalesce(sum(c) OVER (PARTITION BY g
        |    ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND 1 PRECEDING), 0) AS lt FROM f),
        |jt AS (SELECT coalesce(sum(2 * j.c * i.lt + j.c * i.c), 0)
        |    AS jt2
        |  FROM cum i JOIN h j ON i.v = j.v AND i.g < j.g),
        |sz AS (SELECT g, count(*) AS n FROM b GROUP BY 1),
        |szs AS (SELECT count(*) AS k, sum(n) AS nn,
        |    sum(n * n) AS s2,
        |    sum(CAST(n * n AS HUGEINT) * (2 * n + 3)) AS s3 FROM sz)
        |SELECT CAST(nn AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
        |  CAST(jt2 AS DOUBLE) / 2 AS jt_stat,
        |  CAST(nn * nn - s2 AS DOUBLE) / 4 AS e_jt,
        |  CASE WHEN CAST(CAST(nn * nn AS HUGEINT) * (2 * nn + 3) - s3
        |      AS DOUBLE) / 72.0 > 0 THEN
        |    round((CAST(jt2 AS DOUBLE)
        |        - CAST(nn * nn - s2 AS DOUBLE) / 2)
        |      / (2.0 * sqrt(CAST(CAST(nn * nn AS HUGEINT)
        |        * (2 * nn + 3) - s3 AS DOUBLE) / 72.0)), 6) END AS z
        |FROM jt CROSS JOIN szs""".stripMargin,

    "q275_page_trend" ->
      """WITH s AS (SELECT CAST(floor(date_diff('day',
        |      DATE '1970-01-01', CAST(ts AS DATE)) / 7) AS BIGINT) AS b,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      % 7 AS BIGINT) AS t,
        |    round(CAST(count(*) AS DOUBLE), 4) AS v
        |  FROM events GROUP BY 1, 2),
        |k AS (SELECT count(DISTINCT t) AS k FROM s),
        |c AS (SELECT s.*, count(*) OVER (PARTITION BY b) AS bn,
        |    count(DISTINCT t) OVER (PARTITION BY b) AS bd FROM s),
        |f AS (SELECT c.* FROM c, k WHERE bn = k.k AND bd = k.k),
        |r AS (SELECT b, t, v,
        |    rank() OVER (PARTITION BY b ORDER BY v) AS rnk,
        |    count(*) OVER (PARTITION BY b, v) AS tie FROM f),
        |r2 AS (SELECT b, t, rnk * 2 + tie - 1 AS rr FROM r),
        |pt AS (SELECT t, sum(rr) AS rs2, count(*) AS bc FROM r2
        |  GROUP BY 1),
        |pts AS (SELECT p.t, p.rs2, p.bc, count(*) AS s
        |  FROM pt p JOIN pt q ON q.t <= p.t GROUP BY 1, 2, 3),
        |st AS (SELECT max(bc) AS bb, count(*) AS kk,
        |    sum(s * rs2) AS l2 FROM pts)
        |SELECT CAST(bb AS BIGINT) AS n_blocks, CAST(kk AS BIGINT) AS k,
        |  CAST(l2 AS DOUBLE) / 2 AS l_stat,
        |  round(CAST(bb * kk * (kk + 1) * (kk + 1) AS DOUBLE) / 2 / 2,
        |    6) AS e_l,
        |  CASE WHEN CAST(bb * kk * kk * (kk + 1) * (kk + 1) * (kk - 1)
        |      AS DOUBLE) / 144.0 > 0 THEN
        |    round((CAST(l2 AS DOUBLE)
        |      - CAST(bb * kk * (kk + 1) * (kk + 1) AS DOUBLE) / 2)
        |      / (2.0 * sqrt(CAST(bb * kk * kk * (kk + 1) * (kk + 1)
        |        * (kk - 1) AS DOUBLE) / 144.0)), 6) END AS z
        |FROM st""".stripMargin,

    "q276_siegel_slope" ->
      """WITH m AS (SELECT o_orderpriority,
        |    CAST(date_diff('month', TIMESTAMP '1992-01-01', o_orderdate)
        |      AS BIGINT) AS mi,
        |    CAST(count(*) AS DOUBLE) AS n
        |  FROM orders GROUP BY 1, 2),
        |p AS (SELECT a.o_orderpriority, a.mi,
        |    (b.n - a.n) / CAST(b.mi - a.mi AS DOUBLE) AS slope
        |  FROM m a JOIN m b ON a.o_orderpriority = b.o_orderpriority
        |    AND b.mi <> a.mi),
        |i AS (SELECT o_orderpriority, mi,
        |    round(quantile_cont(slope, 0.5), 6) AS med_i
        |  FROM p GROUP BY 1, 2)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_points,
        |  round(quantile_cont(med_i, 0.5), 6) + 0.0 AS siegel_slope
        |FROM i GROUP BY 1 ORDER BY 1""".stripMargin,

    "q277_stl_anomaly" ->
      """WITH s AS (SELECT event_type AS g,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS x,
        |    CAST(count(*) AS DOUBLE) AS y FROM events GROUP BY 1, 2),
        |tr AS (SELECT g, x, y,
        |    round(quantile_cont(y, 0.5) OVER (PARTITION BY g ORDER BY x
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING), 6) AS trend
        |  FROM s),
        |dt AS (SELECT g, x, y, trend, round(y - trend, 6) AS det,
        |    x % 7 AS dow FROM tr),
        |se AS (SELECT g, dow, round(quantile_cont(det, 0.5), 6) AS seas
        |  FROM dt GROUP BY 1, 2),
        |re AS (SELECT dt.g, dt.x, dt.y, dt.trend, se.seas,
        |    round(dt.det - se.seas, 6) AS resid
        |  FROM dt JOIN se ON dt.g = se.g AND dt.dow = se.dow),
        |md AS (SELECT g, round(quantile_cont(abs(resid), 0.5), 6)
        |    AS mad FROM re GROUP BY 1)
        |SELECT re.g AS event_type, re.x AS bucket, round(re.y, 6) AS y,
        |  re.trend AS trend, re.seas AS seasonal,
        |  re.resid AS remainder,
        |  round(abs(re.resid) / mad, 6) AS mad_ratio
        |FROM re JOIN md ON re.g = md.g
        |WHERE mad > 0 AND abs(resid) > 2.0 * mad
        |ORDER BY 1, 2""".stripMargin,

    "q278_bootstrap_ci" ->
      """WITH r AS (SELECT CAST(unnest(generate_series(0, 31)) AS INT)
        |    AS rp),
        |b AS (SELECT o_orderpriority AS g,
        |    CAST(o_orderkey AS VARCHAR) AS id,
        |    CAST(round(o_totalprice, 4) AS DECIMAL(28,4)) AS v
        |  FROM orders),
        |u AS (SELECT g, v, rp,
        |    ('0x' || substr(md5(id || '|' || CAST(rp // 8 AS VARCHAR)),
        |      1 + 4 * CAST(rp % 8 AS INT), 4))::INT AS uu
        |  FROM b CROSS JOIN r),
        |w AS (SELECT g, v, rp,
        |    CASE WHEN uu < 24112 THEN 0 WHEN uu < 48224 THEN 1
        |      WHEN uu < 60281 THEN 2 WHEN uu < 64299 THEN 3
        |      WHEN uu < 65296 THEN 4 WHEN uu < 65497 THEN 5
        |      WHEN uu < 65530 THEN 6 ELSE 7 END AS wt FROM u),
        |rm AS (SELECT g, rp, sum(wt) AS wn, sum(v * wt) AS ws
        |  FROM w GROUP BY 1, 2 HAVING sum(wt) > 0),
        |rm2 AS (SELECT g, rp,
        |    round(CAST(ws AS DOUBLE) / CAST(wn AS DOUBLE), 6) AS m
        |  FROM rm),
        |band AS (SELECT g, CAST(count(*) AS BIGINT) AS n_boot,
        |    round(quantile_cont(m, 0.05), 6) AS boot_lo,
        |    round(quantile_cont(m, 0.95), 6) AS boot_hi
        |  FROM rm2 GROUP BY 1),
        |ov AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    round(CAST(sum(v) AS DOUBLE) / count(*), 6) AS mean
        |  FROM b GROUP BY 1)
        |SELECT ov.g AS o_orderpriority, n, mean, n_boot, boot_lo,
        |  boot_hi
        |FROM ov JOIN band ON ov.g = band.g ORDER BY 1""".stripMargin,

    "q279_pinball" ->
      """WITH s AS (SELECT event_type AS g,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS x,
        |    CAST(count(*) AS DOUBLE) AS y FROM events GROUP BY 1, 2),
        |fc AS (SELECT g, x % 7 AS slot,
        |    round(quantile_cont(y, 0.1), 6) AS q1,
        |    round(quantile_cont(y, 0.5), 6) AS q2,
        |    round(quantile_cont(y, 0.9), 6) AS q3
        |  FROM s WHERE x < 19744 GROUP BY 1, 2),
        |m AS (SELECT g, slot, 0.1 AS tau, q1 AS q FROM fc
        |  UNION ALL SELECT g, slot, 0.5, q2 FROM fc
        |  UNION ALL SELECT g, slot, 0.9, q3 FROM fc),
        |j AS (SELECT te.g, m.tau, te.y, m.q
        |  FROM (SELECT g, x % 7 AS slot, y FROM s WHERE x >= 19744) te
        |  JOIN m ON te.g = m.g AND te.slot = m.slot),
        |t AS (SELECT g, tau, CAST(round(greatest(tau * (y - q),
        |      (tau - 1) * (y - q)), 12) AS DECIMAL(28,14)) AS term,
        |    CASE WHEN y <= q THEN 1 ELSE 0 END AS cov FROM j)
        |SELECT g AS event_type, CAST(tau AS DOUBLE) AS tau,
        |  CAST(count(*) AS BIGINT) AS n_test,
        |  round(CAST(sum(term) AS DOUBLE) / count(*), 6) AS pinball_loss,
        |  round(CAST(sum(cov) AS DOUBLE) / count(*), 6) AS coverage
        |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q280_mood_median" ->
      """WITH vv AS (SELECT o_orderpriority AS g,
        |    round(o_totalprice, 2) AS v FROM orders),
        |cells AS (SELECT g, v, CAST(count(*) AS BIGINT) AS n
        |  FROM vv GROUP BY 1, 2),
        |hist AS (SELECT v, sum(n) AS hn FROM cells GROUP BY 1),
        |tot AS (SELECT sum(hn) AS nn FROM hist),
        |cum AS (SELECT v, sum(hn) OVER (ORDER BY v) AS c FROM hist),
        |med AS (SELECT min(v) AS med FROM cum, tot WHERE 2 * c >= nn),
        |g AS (SELECT g AS grp,
        |    sum(CASE WHEN v > med THEN n ELSE 0 END) AS a,
        |    sum(CASE WHEN v <= med THEN n ELSE 0 END) AS b
        |  FROM cells, med GROUP BY 1),
        |mg AS (SELECT sum(a) AS ta, sum(b) AS tb, count(*) AS k FROM g),
        |t AS (SELECT CASE WHEN ta > 0 AND tb > 0 THEN CAST(round(
        |      pow(a - CAST(a + b AS DOUBLE) * ta / (ta + tb), 2)
        |        / (CAST(a + b AS DOUBLE) * ta / (ta + tb))
        |      + pow(b - CAST(a + b AS DOUBLE) * tb / (ta + tb), 2)
        |        / (CAST(a + b AS DOUBLE) * tb / (ta + tb)), 12)
        |    AS DECIMAL(28,14)) END AS term, ta, tb, k
        |  FROM g, mg)
        |SELECT CAST(max(ta) + max(tb) AS BIGINT) AS n,
        |  CAST(max(k) AS BIGINT) AS k, CAST(max(k) - 1 AS BIGINT) AS dof,
        |  round((SELECT med FROM med), 2) AS grand_median,
        |  round(CAST(sum(term) AS DOUBLE), 6) AS chi2
        |FROM t""".stripMargin,

    "q281_t_closeness" ->
      """WITH b AS (SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 2000) AS BIGINT) AS bin
        |  FROM customer),
        |cells AS (SELECT c_nationkey, c_mktsegment, bin,
        |    CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1, 2, 3),
        |grp AS (SELECT c_nationkey, c_mktsegment, sum(c) AS gn
        |  FROM cells GROUP BY 1, 2),
        |bins AS (SELECT bin, sum(c) AS bn FROM cells GROUP BY 1),
        |tot AS (SELECT sum(c) AS nn, count(DISTINCT bin) AS m
        |  FROM cells),
        |grid AS (SELECT g.c_nationkey, g.c_mktsegment, g.gn, bins.bin,
        |    bins.bn, coalesce(cells.c, 0) AS c
        |  FROM grp g CROSS JOIN bins
        |  LEFT JOIN cells ON cells.c_nationkey = g.c_nationkey
        |    AND cells.c_mktsegment = g.c_mktsegment
        |    AND cells.bin = bins.bin),
        |cum AS (SELECT c_nationkey, c_mktsegment, gn,
        |    abs(CAST(sum(c) OVER w AS HUGEINT) * nn
        |      - CAST(sum(bn) OVER w AS HUGEINT) * gn) AS diff
        |  FROM grid, tot
        |  WINDOW w AS (PARTITION BY c_nationkey, c_mktsegment
        |    ORDER BY bin
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT c_nationkey, c_mktsegment,
        |  CAST(max(gn) AS BIGINT) AS group_size,
        |  round(CAST(sum(diff) AS DOUBLE)
        |    / (CAST(max(gn) AS DOUBLE)
        |      * (SELECT CAST(nn AS DOUBLE) FROM tot)
        |      * ((SELECT m FROM tot) - 1)), 6) AS t_closeness
        |FROM cum GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q282_pr_curve" ->
      """WITH h AS (SELECT round(round(value, 1), 6) AS s,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS pos,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |tot AS (SELECT sum(pos) AS p FROM h),
        |c AS (SELECT s, sum(pos) OVER (ORDER BY s DESC) AS tp,
        |    sum(n) OVER (ORDER BY s DESC) AS cn FROM h)
        |SELECT s AS threshold, CAST(tp AS BIGINT) AS tp,
        |  CAST(cn - tp AS BIGINT) AS fp,
        |  round(CAST(tp AS DOUBLE) / cn, 6) AS prec,
        |  round(CAST(tp AS DOUBLE) / p, 6) AS recall,
        |  round(CAST(2 AS DOUBLE) * tp / (cn + p), 6) AS f1
        |FROM c, tot ORDER BY 1""".stripMargin,

    "q283_lorenz" ->
      """WITH h AS (SELECT round(c_acctbal, 2) AS v,
        |    CAST(count(*) AS BIGINT) AS n FROM customer GROUP BY 1),
        |h2 AS (SELECT v, n, CAST(round(v * 100) AS HUGEINT) AS iv
        |  FROM h),
        |c AS (SELECT v, n, iv,
        |    sum(n) OVER (ORDER BY v) AS cn,
        |    sum(iv * n) OVER (ORDER BY v) AS cnv FROM h2),
        |tot AS (SELECT sum(n) AS nn, sum(iv * n) AS s FROM h2),
        |g AS (SELECT range AS d FROM range(1, 11))
        |SELECT d AS point, round(CAST(d AS DOUBLE) / 10, 6) AS pop_frac,
        |  CAST(d * nn // 10 AS BIGINT) AS units,
        |  round(CAST(cnv - (cn - d * nn // 10) * iv AS DOUBLE)
        |    / CAST(s AS DOUBLE), 6) AS value_share
        |FROM c, tot, g
        |WHERE (cn - n) * 10 < d * nn AND d * nn <= cn * 10
        |ORDER BY 1""".stripMargin,

    "q284_g_test" ->
      """WITH cells AS (SELECT o_orderpriority AS x, o_orderstatus AS y,
        |    CAST(count(*) AS BIGINT) AS o FROM orders GROUP BY 1, 2),
        |rm AS (SELECT x, sum(o) AS rx FROM cells GROUP BY 1),
        |cm AS (SELECT y, sum(o) AS cy FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS DOUBLE) AS tn,
        |    count(DISTINCT x) AS nr, count(DISTINCT y) AS nc
        |  FROM cells),
        |t AS (SELECT CAST(round(o * ln(o * tn
        |      / (CAST(rx AS DOUBLE) * cy)), 12)
        |    AS DECIMAL(28,14)) AS term, tn, nr, nc
        |  FROM cells JOIN rm USING (x) JOIN cm USING (y), tot)
        |SELECT CAST(max(tn) AS BIGINT) AS n,
        |  CAST((max(nr) - 1) * (max(nc) - 1) AS BIGINT) AS dof,
        |  round(CAST(2 AS DOUBLE) * CAST(sum(term) AS DOUBLE), 6)
        |    AS g_stat,
        |  round(CAST(sum(term) AS DOUBLE) / max(tn), 6) AS mi_nats
        |FROM t""".stripMargin,

    "q285_ordinal_assoc" ->
      """WITH h AS (SELECT l_returnflag AS g, round(l_quantity, 4) AS x,
        |    round(l_discount, 4) AS y, CAST(count(*) AS BIGINT) AS n
        |  FROM lineitem GROUP BY 1, 2, 3),
        |cd AS (SELECT a.g,
        |    CAST(sum(CASE WHEN b.y > a.y THEN a.n * b.n ELSE 0 END)
        |      AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN b.y < a.y THEN a.n * b.n ELSE 0 END)
        |      AS BIGINT) AS d
        |  FROM h a JOIN h b ON a.g = b.g AND a.x < b.x GROUP BY 1),
        |t1 AS (SELECT g, CAST(sum(t * (t - 1) / 2) AS BIGINT) AS n1
        |  FROM (SELECT g, x, sum(n) AS t FROM h GROUP BY 1, 2) GROUP BY 1),
        |t2 AS (SELECT g, CAST(sum(t * (t - 1) / 2) AS BIGINT) AS n2
        |  FROM (SELECT g, y, sum(n) AS t FROM h GROUP BY 1, 2) GROUP BY 1),
        |nt AS (SELECT g, CAST(sum(n) AS BIGINT) AS n,
        |    CAST(count(DISTINCT x) AS BIGINT) AS rx,
        |    CAST(count(DISTINCT y) AS BIGINT) AS ry FROM h GROUP BY 1),
        |j AS (SELECT nt.g, nt.n, coalesce(cd.c, 0) AS c,
        |    coalesce(cd.d, 0) AS d, t1.n1, t2.n2,
        |    nt.n * (nt.n - 1) / 2 AS n0, least(nt.rx, nt.ry) AS m
        |  FROM nt LEFT JOIN cd ON cd.g = nt.g
        |  JOIN t1 ON t1.g = nt.g JOIN t2 ON t2.g = nt.g)
        |SELECT g AS l_returnflag, n, c AS concordant, d AS discordant,
        |  CASE WHEN c + d > 0
        |    THEN round(CAST(c - d AS DOUBLE) / CAST(c + d AS DOUBLE), 6)
        |  END AS gamma,
        |  CASE WHEN n0 > n1 THEN round(CAST(c - d AS DOUBLE)
        |    / CAST(n0 - n1 AS DOUBLE), 6) END AS somers_d_yx,
        |  CASE WHEN n0 > n2 THEN round(CAST(c - d AS DOUBLE)
        |    / CAST(n0 - n2 AS DOUBLE), 6) END AS somers_d_xy,
        |  CASE WHEN m > 1 THEN round(2.0 * m * CAST(c - d AS DOUBLE)
        |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * (m - 1)), 6)
        |  END AS tau_c
        |FROM j ORDER BY 1""".stripMargin,

    "q286_dunn" ->
      """WITH obs AS (SELECT event_type AS g, round(value, 4) AS v
        |  FROM events),
        |cells AS (SELECT v, g, CAST(count(*) AS BIGINT) AS c
        |  FROM obs GROUP BY 1, 2),
        |hv AS (SELECT v, CAST(sum(c) AS BIGINT) AS t
        |  FROM cells GROUP BY 1),
        |r AS (SELECT v, t, sum(t) OVER (ORDER BY v ROWS BETWEEN
        |    UNBOUNDED PRECEDING AND CURRENT ROW) - t AS bef FROM hv),
        |ar AS (SELECT v, 2 * bef + t + 1 AS ar2 FROM r),
        |grp AS (SELECT g, CAST(sum(c) AS BIGINT) AS n,
        |    CAST(sum(CAST(c AS DECIMAL(38,0)) * ar2) AS DECIMAL(38,0))
        |      AS r2
        |  FROM cells JOIN ar USING (v) GROUP BY 1),
        |mr AS (SELECT g, n, CAST(r2 AS DOUBLE) / (2.0 * n) AS mr
        |  FROM grp),
        |ties AS (SELECT CAST(sum(CAST(t AS DECIMAL(38,0)) * t * t - t)
        |    AS DECIMAL(38,0)) AS tt FROM hv),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM grp),
        |s AS (SELECT CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) + 1) / 12
        |    - CAST(tt AS DOUBLE) / (12.0 * (CAST(nn AS DOUBLE) - 1))
        |    AS s2 FROM tot, ties)
        |SELECT a.g AS g1, b.g AS g2, a.n AS n1, b.n AS n2,
        |  round(a.mr - b.mr, 6) AS mean_rank_diff,
        |  CASE WHEN s2 > 0 AND a.n > 0 AND b.n > 0
        |    THEN round((a.mr - b.mr)
        |      / sqrt(s2 * (1.0 / a.n + 1.0 / b.n)), 6) END AS z
        |FROM mr a JOIN mr b ON a.g < b.g, s ORDER BY 1, 2""".stripMargin,

    "q287_bartlett" ->
      """WITH v AS (SELECT event_type AS g,
        |    CAST(round(value, 4) AS DECIMAL(18,4)) AS v FROM events),
        |g AS (SELECT g, CAST(count(*) AS DECIMAL(38,0)) AS n,
        |    CAST(sum(v) AS DECIMAL(38,4)) AS sv,
        |    CAST(sum(v * v) AS DECIMAL(38,8)) AS svv
        |  FROM v GROUP BY 1),
        |g2 AS (SELECT *, CAST(n * svv - sv * sv AS DOUBLE)
        |    / CAST(n * (n - 1) AS DOUBLE) AS s2 FROM g),
        |a AS (SELECT CAST(sum(n) AS DOUBLE) AS nn,
        |    CAST(count(*) AS DOUBLE) AS k,
        |    CAST(min(n) AS BIGINT) AS minn, min(s2) AS mins2,
        |    sum(CAST(round(CAST(n * svv - sv * sv AS DOUBLE)
        |      / CAST(n AS DOUBLE), 8) AS DECIMAL(38,12))) AS ss,
        |    sum(CASE WHEN n > 1 AND s2 > 0
        |      THEN CAST(round(CAST(n - 1 AS DOUBLE) * ln(s2), 12)
        |        AS DECIMAL(38,12)) END) AS slog,
        |    sum(CASE WHEN n > 1
        |      THEN CAST(round(1.0 / CAST(n - 1 AS DOUBLE), 12)
        |        AS DECIMAL(38,12)) END) AS sinv
        |  FROM g2),
        |b AS (SELECT *, nn - k AS dofp,
        |    CAST(ss AS DOUBLE) / (nn - k) AS sp2 FROM a)
        |SELECT CAST(nn AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
        |  CAST(k - 1 AS BIGINT) AS dof,
        |  CASE WHEN minn > 1 AND mins2 > 0 AND k > 1 AND dofp > 0
        |      AND sp2 > 0
        |    THEN round((dofp * ln(sp2) - CAST(slog AS DOUBLE))
        |      / (1.0 + (CAST(sinv AS DOUBLE) - 1.0 / dofp)
        |        / (3.0 * (k - 1))), 6) END AS chi2
        |FROM b""".stripMargin,

    "q288_brier" ->
      """WITH e AS (SELECT event_type, user_id % 8 AS ub,
        |    event_id % 2 AS sp,
        |    CASE WHEN value > 100.0 THEN 1 ELSE 0 END AS y FROM events),
        |m AS (SELECT event_type, ub, sum(y) * 10000 // count(*) AS p4
        |  FROM e WHERE sp = 0 GROUP BY 1, 2),
        |t AS (SELECT CAST(p4 AS DOUBLE) / 10000 AS pred, y
        |  FROM e JOIN m USING (event_type, ub) WHERE sp = 1),
        |bins AS (SELECT CAST(round(pred, 4) AS DECIMAL(9,4)) AS f,
        |    CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
        |  FROM t GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
        |    CAST(sum(pos) AS BIGINT) AS p FROM bins),
        |x AS (SELECT f, n, pos, CAST(p AS DOUBLE) / nn AS obar,
        |    CAST(pos AS DOUBLE) / n AS ok,
        |    CAST(f * f * n - CAST(2 AS DECIMAL(9,4)) * f * pos + pos
        |      AS DECIMAL(38,8)) AS br,
        |    nn FROM bins, tot),
        |x2 AS (SELECT *,
        |    CAST(round(n * pow(CAST(f AS DOUBLE) - ok, 2), 12)
        |      AS DECIMAL(38,12)) AS rel,
        |    CAST(round(n * pow(ok - obar, 2), 12)
        |      AS DECIMAL(38,12)) AS res FROM x)
        |SELECT max(nn) AS n, CAST(count(*) AS BIGINT) AS n_bins,
        |  round(CAST(sum(br) AS DOUBLE) / max(nn), 6) AS brier,
        |  round(CAST(sum(rel) AS DOUBLE) / max(nn), 6) AS reliability,
        |  round(CAST(sum(res) AS DOUBLE) / max(nn), 6) AS resolution,
        |  round(max(obar) * (1.0 - max(obar)), 6) AS uncertainty
        |FROM x2""".stripMargin,

    "q289_hosmer_lemeshow" ->
      """WITH e AS (SELECT event_type, user_id % 8 AS ub,
        |    event_id % 2 AS sp,
        |    CASE WHEN value > 100.0 THEN 1 ELSE 0 END AS y FROM events),
        |m AS (SELECT event_type, ub, sum(y) * 10000 // count(*) AS p4
        |  FROM e WHERE sp = 0 GROUP BY 1, 2),
        |t AS (SELECT CAST(p4 AS DOUBLE) / 10000 AS pred, y
        |  FROM e JOIN m USING (event_type, ub) WHERE sp = 1),
        |hist AS (SELECT CAST(round(pred, 4) AS DECIMAL(9,4)) AS f,
        |    CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
        |  FROM t GROUP BY 1),
        |h2 AS (SELECT f, n, pos, CAST(f * n AS DECIMAL(38,4)) AS sf
        |  FROM hist),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM hist),
        |c AS (SELECT *, sum(n) OVER (ORDER BY f ROWS BETWEEN
        |    UNBOUNDED PRECEDING AND CURRENT ROW) AS cn FROM h2),
        |b AS (SELECT (cn - n) * 10 // nn AS bin, n, pos, sf
        |  FROM c, tot),
        |g AS (SELECT bin, CAST(sum(n) AS BIGINT) AS ng,
        |    CAST(sum(pos) AS BIGINT) AS o1,
        |    CAST(sum(sf) AS DOUBLE) AS e1 FROM b GROUP BY 1),
        |tr AS (SELECT ng, CASE WHEN e1 > 0 AND e1 < ng
        |    THEN CAST(round(pow(o1 - e1, 2) * ng / (e1 * (ng - e1)), 12)
        |      AS DECIMAL(38,12)) END AS term FROM g)
        |SELECT CAST(sum(ng) AS BIGINT) AS n,
        |  CAST(count(*) AS BIGINT) AS n_bins,
        |  CAST(count(*) - 2 AS BIGINT) AS dof,
        |  round(CAST(sum(term) AS DOUBLE), 6) AS hl_chi2,
        |  CAST(sum(CASE WHEN term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS degenerate_bins
        |FROM tr""".stripMargin,

    "q290_nelson_aalen" ->
      """WITH subj AS (SELECT user_id,
        |    CAST(date_diff('day', CAST(min(ts) AS DATE),
        |      CAST(coalesce(min(ts) FILTER (event_type = 'purchase'),
        |        max(ts)) AS DATE)) AS BIGINT) AS dur,
        |    CASE WHEN min(ts) FILTER (event_type = 'purchase')
        |      IS NOT NULL THEN 1 ELSE 0 END AS ev
        |  FROM events GROUP BY 1),
        |h AS (SELECT dur AS t, CAST(sum(ev) AS BIGINT) AS d,
        |    CAST(sum(1 - ev) AS BIGINT) AS c
        |  FROM subj GROUP BY 1),
        |r AS (SELECT t, d, c,
        |    CAST((SELECT count(*) FROM subj)
        |      - (sum(d + c) OVER w - (d + c)) AS BIGINT) AS n_risk
        |  FROM h WINDOW w AS (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |f AS (SELECT t, d, c, n_risk,
        |    CAST(CASE WHEN n_risk > 0
        |      THEN round(CAST(d AS DOUBLE) / n_risk, 12)
        |      ELSE 0 END AS DECIMAL(28,14)) AS hz
        |  FROM r),
        |s AS (SELECT t, n_risk, d, c, sum(hz) OVER w AS ch
        |  FROM f WINDOW w AS (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT t, n_risk, d, c,
        |  round(CAST(ch AS DOUBLE), 6) AS cum_hazard,
        |  round(exp(-CAST(ch AS DOUBLE)), 6) AS s_na
        |FROM s ORDER BY t""".stripMargin,

    "q291_rmst" ->
      """WITH subj AS (SELECT user_id,
        |    CAST(date_diff('day', CAST(min(ts) AS DATE),
        |      CAST(coalesce(min(ts) FILTER (event_type = 'purchase'),
        |        max(ts)) AS DATE)) AS BIGINT) AS dur,
        |    CASE WHEN min(ts) FILTER (event_type = 'purchase')
        |      IS NOT NULL THEN 1 ELSE 0 END AS ev
        |  FROM events GROUP BY 1),
        |h AS (SELECT dur AS t, CAST(sum(ev) AS BIGINT) AS d,
        |    CAST(sum(1 - ev) AS BIGINT) AS c
        |  FROM subj GROUP BY 1),
        |r AS (SELECT t, d, c,
        |    CAST((SELECT count(*) FROM subj)
        |      - (sum(d + c) OVER w - (d + c)) AS BIGINT) AS n_risk
        |  FROM h WINDOW w AS (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |f AS (SELECT t, d, n_risk,
        |    CAST(CASE WHEN d > 0 AND d < n_risk
        |      THEN round(ln(1 - CAST(d AS DOUBLE) / n_risk), 12)
        |      ELSE 0 END AS DECIMAL(28,14)) AS lnf,
        |    CASE WHEN d = n_risk THEN 1 ELSE 0 END AS z
        |  FROM r),
        |s AS (SELECT t, d, n_risk, lnf, z, sum(lnf) OVER w AS cl,
        |    sum(z) OVER w AS cz
        |  FROM f WINDOW w AS (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |cc AS (SELECT t, d, n_risk,
        |    CASE WHEN cz - z > 0 THEN 0.0
        |      ELSE exp(CAST(cl - lnf AS DOUBLE)) END AS sprev,
        |    CASE WHEN cz > 0 THEN 0.0
        |      ELSE exp(CAST(cl AS DOUBLE)) END AS sv
        |  FROM s),
        |d2 AS (SELECT t, CAST(round(CASE WHEN d = n_risk THEN sprev
        |      ELSE sv * d / (n_risk - d) END, 12) AS DECIMAL(28,14))
        |    AS dr FROM cc),
        |tau AS (SELECT max(t) AS tau FROM d2)
        |SELECT CAST(tau AS BIGINT) AS tau,
        |  round(CAST(tau AS DOUBLE) - CAST(sum(CAST(round(
        |      CAST(dr AS DOUBLE) * CAST(tau - t AS DOUBLE), 12)
        |    AS DECIMAL(38,12))) AS DOUBLE), 6) AS rmst
        |FROM d2, tau GROUP BY tau""".stripMargin,

    "q292_anderson_darling" ->
      """WITH h AS (SELECT round(value, 4) AS v,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS la,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS lb
        |  FROM events WHERE event_type IN ('click', 'view')
        |  GROUP BY 1),
        |h2 AS (SELECT v, la, lb, la + lb AS l FROM h),
        |tot AS (SELECT CAST(sum(la) AS BIGINT) AS na,
        |    CAST(sum(lb) AS BIGINT) AS nb,
        |    CAST(sum(l) AS BIGINT) AS nn FROM h2),
        |c AS (SELECT v, l, la, lb, sum(l) OVER w AS cl,
        |    sum(la) OVER w AS cla, sum(lb) OVER w AS clb
        |  FROM h2 WINDOW w AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |x AS (SELECT l, la, lb, na, nb, nn,
        |    2 * (cl - l) + l AS b2, 2 * cla - la AS m2a,
        |    2 * clb - lb AS m2b FROM c, tot),
        |x2 AS (SELECT *, CAST(CAST(b2 AS DECIMAL(38,0))
        |      * (2 * nn - b2) - CAST(nn AS DECIMAL(38,0)) * l
        |    AS DOUBLE) AS den FROM x),
        |t AS (SELECT na, nb, nn,
        |    CASE WHEN den > 0 THEN CAST(round(l / CAST(nn AS DOUBLE)
        |      * pow(CAST(CAST(nn AS DECIMAL(38,0)) * m2a
        |        - CAST(b2 AS DECIMAL(38,0)) * na AS DOUBLE), 2)
        |      / den, 12) AS DECIMAL(38,12)) END AS ta,
        |    CASE WHEN den > 0 THEN CAST(round(l / CAST(nn AS DOUBLE)
        |      * pow(CAST(CAST(nn AS DECIMAL(38,0)) * m2b
        |        - CAST(b2 AS DECIMAL(38,0)) * nb AS DOUBLE), 2)
        |      / den, 12) AS DECIMAL(38,12)) END AS tb
        |  FROM x2)
        |SELECT max(na) AS n_a, max(nb) AS n_b,
        |  CASE WHEN max(na) > 0 AND max(nb) > 0 AND max(nn) > 1
        |    THEN round(CAST(max(nn) - 1 AS DOUBLE) / max(nn)
        |      * (CAST(sum(ta) AS DOUBLE) / max(na)
        |        + CAST(sum(tb) AS DOUBLE) / max(nb)), 6) END AS a2
        |FROM t""".stripMargin,

    "q293_fleiss_kappa" ->
      """WITH r AS (SELECT user_id, event_type, row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |sel AS (SELECT user_id AS i, event_type AS c FROM r
        |  WHERE rn <= 4),
        |cells AS (SELECT i, c, CAST(count(*) AS BIGINT) AS n
        |  FROM sel GROUP BY 1, 2),
        |items AS (SELECT i, sum(n) AS tot,
        |    CAST(sum(n * n) AS DECIMAL(38,0)) AS sq
        |  FROM cells GROUP BY 1),
        |drp AS (SELECT CAST(count(*) AS BIGINT) AS d FROM items
        |  WHERE tot <> 4),
        |keep AS (SELECT * FROM items WHERE tot = 4),
        |cats AS (SELECT c, CAST(sum(n) AS DECIMAL(38,0)) AS nc
        |  FROM cells JOIN keep USING (i) GROUP BY 1),
        |s2 AS (SELECT CAST(sum(nc * nc) AS DECIMAL(38,0)) AS s2
        |  FROM cats),
        |s1 AS (SELECT CAST(count(*) AS DECIMAL(38,0)) AS ii,
        |    CAST(sum(sq - 4) AS DECIMAL(38,0)) AS s1 FROM keep),
        |p AS (SELECT ii, d, CAST(s1 AS DOUBLE)
        |    / CAST(ii * 4 * 3 AS DOUBLE) AS pbar,
        |    CAST(s2 AS DOUBLE)
        |    / CAST((ii * 4) * (ii * 4) AS DOUBLE) AS pe
        |  FROM s1, s2, drp)
        |SELECT CAST(ii AS BIGINT) AS n_items,
        |  CAST(4 AS BIGINT) AS n_raters, d AS dropped_items,
        |  round(pbar, 6) AS p_bar, round(pe, 6) AS p_e,
        |  CASE WHEN pe < 1
        |    THEN round((pbar - pe) / (1.0 - pe), 6) END AS kappa
        |FROM p""".stripMargin,

    "q294_msprt" ->
      """WITH e AS (SELECT CAST(user_id % 2 AS INT) AS arm,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS x,
        |    CAST(CASE WHEN value > 100.0 THEN 1 ELSE 0 END
        |      AS DECIMAL(18,4)) AS y
        |  FROM events),
        |sig AS (SELECT CAST(CAST(count(*) AS DECIMAL(38,0))
        |      * CAST(sum(y * y) AS DECIMAL(38,8))
        |      - CAST(sum(y) AS DECIMAL(38,4))
        |        * CAST(sum(y) AS DECIMAL(38,4)) AS DOUBLE)
        |    / CAST(CAST(count(*) AS DECIMAL(38,0))
        |      * (CAST(count(*) AS DECIMAL(38,0)) - 1) AS DOUBLE)
        |    AS sig2 FROM e),
        |d AS (SELECT x,
        |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS na,
        |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS nb,
        |    CAST(sum(CASE WHEN arm = 0 THEN y
        |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(38,4))
        |      AS sa,
        |    CAST(sum(CASE WHEN arm = 1 THEN y
        |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(38,4))
        |      AS sb
        |  FROM e GROUP BY 1),
        |c AS (SELECT x, sum(na) OVER w AS cna, sum(nb) OVER w AS cnb,
        |    sum(sa) OVER w AS csa, sum(sb) OVER w AS csb
        |  FROM d WINDOW w AS (ORDER BY x
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |f AS (SELECT x, cna, cnb,
        |    CAST(csa AS DOUBLE) / cna - CAST(csb AS DOUBLE) / cnb
        |      AS diff,
        |    sig2 * (1.0 / cna + 1.0 / cnb) AS vn
        |  FROM c, sig WHERE cna > 0 AND cnb > 0),
        |g AS (SELECT x, cna, cnb, diff, CASE WHEN vn > 0 THEN
        |    round(0.5 * ln(vn / (vn
        |        + CAST(0.1 AS DOUBLE) * CAST(0.1 AS DOUBLE)))
        |      + diff * diff
        |        * (CAST(0.1 AS DOUBLE) * CAST(0.1 AS DOUBLE))
        |        / (2.0 * vn * (vn
        |          + CAST(0.1 AS DOUBLE) * CAST(0.1 AS DOUBLE))), 6)
        |    END AS llr FROM f)
        |SELECT x AS day, CAST(cna AS BIGINT) AS n_a,
        |  CAST(cnb AS BIGINT) AS n_b,
        |  round(diff, 6) AS mean_diff, llr AS log_lambda,
        |  CASE WHEN llr >= 2.995732 THEN 1 ELSE 0 END AS crossed
        |FROM g ORDER BY 1""".stripMargin,

    "q295_dp_counts" ->
      """WITH g AS (SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS tc
        |  FROM customer GROUP BY 1),
        |h AS (SELECT c_mktsegment, tc,
        |    ('0x' || substr(md5(c_mktsegment || '|graft'), 1, 12))
        |      ::BIGINT AS hh FROM g),
        |n AS (SELECT *, (hh + 0.5) / 281474976710656.0 - 0.5 AS cc
        |  FROM h)
        |SELECT c_mktsegment, tc AS true_count,
        |  round(tc + (-sign(cc) * ln(1.0 - 2.0 * abs(cc)) / 1.0), 3)
        |    AS noisy_count,
        |  CAST(1.0 AS DOUBLE) AS epsilon_nominal
        |FROM n ORDER BY 1""".stripMargin,

    "q296_ses_backtest" ->
      """WITH s AS (SELECT event_type AS g,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS x,
        |    CAST(count(*) AS DOUBLE) AS y FROM events GROUP BY 1, 2),
        |tm AS (SELECT g, max(x) AS tmx FROM s WHERE x < 19744
        |  GROUP BY 1),
        |lv AS (SELECT s.g,
        |    CAST(sum(CAST(round(y, 6) AS DECIMAL(28,6))
        |      * (CAST(1 AS BIGINT) << CAST(15 - (tmx - x) AS INT)))
        |      AS DOUBLE)
        |    / CAST(sum(CAST(1 AS BIGINT)
        |      << CAST(15 - (tmx - x) AS INT)) AS DOUBLE) AS f
        |  FROM s JOIN tm ON s.g = tm.g
        |  WHERE x < 19744 AND tmx - x < 16 GROUP BY 1),
        |t AS (SELECT s.g, y, f, abs(y - f) AS ae
        |  FROM s JOIN lv ON s.g = lv.g WHERE x >= 19744)
        |SELECT g AS event_type, CAST(count(*) AS BIGINT) AS n_test,
        |  round(max(f), 6) AS forecast,
        |  round(CAST(sum(CAST(round(CASE WHEN abs(y) + abs(f) > 0
        |      THEN 2.0 * ae / (abs(y) + abs(f)) ELSE 0 END, 12)
        |    AS DECIMAL(38,12))) AS DOUBLE) / count(*), 6) AS smape,
        |  round(CAST(sum(CAST(round(ae, 6) AS DECIMAL(38,6)))
        |      AS DOUBLE)
        |    / CAST(sum(CAST(round(abs(y), 6) AS DECIMAL(38,6)))
        |      AS DOUBLE), 6) AS wape
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    "q297_candidate_keys" ->
      """WITH k1 AS (SELECT count(*) AS c FROM orders
        |  GROUP BY o_orderkey),
        |k2 AS (SELECT count(*) AS c FROM orders GROUP BY o_custkey),
        |k3 AS (SELECT count(*) AS c FROM orders
        |  GROUP BY o_orderstatus),
        |k4 AS (SELECT count(*) AS c FROM orders
        |  GROUP BY o_custkey, o_orderdate)
        |SELECT 'o_orderkey' AS combo, CAST(sum(c) AS BIGINT) AS n_rows,
        |  CAST(count(*) AS BIGINT) AS n_distinct,
        |  CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS dup_keys,
        |  CAST(max(c) AS BIGINT) AS max_group,
        |  CASE WHEN sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) = 0
        |    THEN 1 ELSE 0 END AS is_key FROM k1
        |UNION ALL
        |SELECT 'o_custkey', CAST(sum(c) AS BIGINT),
        |  CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(max(c) AS BIGINT),
        |  CASE WHEN sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) = 0
        |    THEN 1 ELSE 0 END FROM k2
        |UNION ALL
        |SELECT 'o_orderstatus', CAST(sum(c) AS BIGINT),
        |  CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(max(c) AS BIGINT),
        |  CASE WHEN sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) = 0
        |    THEN 1 ELSE 0 END FROM k3
        |UNION ALL
        |SELECT 'o_custkey,o_orderdate', CAST(sum(c) AS BIGINT),
        |  CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(max(c) AS BIGINT),
        |  CASE WHEN sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) = 0
        |    THEN 1 ELSE 0 END FROM k4
        |ORDER BY combo""".stripMargin,

    "q298_rfm" ->
      """WITH mx AS (SELECT max(CAST(ts AS DATE)) AS md FROM events),
        |u AS (SELECT user_id,
        |    CAST(date_diff('day', max(CAST(ts AS DATE)),
        |      (SELECT md FROM mx)) AS BIGINT) AS rec,
        |    CAST(count(*) AS BIGINT) AS freq,
        |    CAST(sum(CAST(round(value, 2) AS DECIMAL(18,2)))
        |      AS DECIMAL(38,2)) AS mon
        |  FROM events GROUP BY 1),
        |rh AS (SELECT rec AS v, CAST(count(*) AS BIGINT) AS n
        |  FROM u GROUP BY 1),
        |rt AS (SELECT sum(n) AS tq FROM rh),
        |rc AS (SELECT v, CAST((sum(n) OVER (ORDER BY v ROWS BETWEEN
        |    UNBOUNDED PRECEDING AND CURRENT ROW) - n) * 5 // tq
        |    AS INT) AS q FROM rh, rt),
        |fh AS (SELECT freq AS v, CAST(count(*) AS BIGINT) AS n
        |  FROM u GROUP BY 1),
        |ft AS (SELECT sum(n) AS tq FROM fh),
        |fc AS (SELECT v, CAST((sum(n) OVER (ORDER BY v ROWS BETWEEN
        |    UNBOUNDED PRECEDING AND CURRENT ROW) - n) * 5 // tq
        |    AS INT) AS q FROM fh, ft),
        |mh AS (SELECT mon AS v, CAST(count(*) AS BIGINT) AS n
        |  FROM u GROUP BY 1),
        |mt AS (SELECT sum(n) AS tq FROM mh),
        |mc AS (SELECT v, CAST((sum(n) OVER (ORDER BY v ROWS BETWEEN
        |    UNBOUNDED PRECEDING AND CURRENT ROW) - n) * 5 // tq
        |    AS INT) AS q FROM mh, mt),
        |j AS (SELECT u.mon, rc.q AS rq, fc.q AS fq, mc.q AS mq
        |  FROM u JOIN rc ON u.rec = rc.v JOIN fc ON u.freq = fc.v
        |  JOIN mc ON u.mon = mc.v)
        |SELECT rq AS r_q, fq AS f_q, mq AS m_q,
        |  CAST(count(*) AS BIGINT) AS n_users,
        |  CAST((2 * CAST(sum(mon) * 100 AS HUGEINT) + count(*))
        |    // (2 * count(*)) AS DOUBLE) / 100 AS avg_monetary,
        |  round(CAST(sum(mon) AS DOUBLE), 2) AS total_monetary
        |FROM j GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q299_km_ci" ->
      """WITH subj AS (SELECT user_id,
        |    CAST(date_diff('day', CAST(min(ts) AS DATE),
        |      CAST(coalesce(min(ts) FILTER (event_type = 'purchase'),
        |        max(ts)) AS DATE)) AS BIGINT) AS dur,
        |    CASE WHEN min(ts) FILTER (event_type = 'purchase')
        |      IS NOT NULL THEN 1 ELSE 0 END AS ev
        |  FROM events GROUP BY 1),
        |h AS (SELECT dur AS t, CAST(sum(ev) AS BIGINT) AS d,
        |    CAST(sum(1 - ev) AS BIGINT) AS c
        |  FROM subj GROUP BY 1),
        |r AS (SELECT t, d, c,
        |    CAST((SELECT count(*) FROM subj)
        |      - (sum(d + c) OVER w - (d + c)) AS BIGINT) AS n_risk
        |  FROM h WINDOW w AS (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |f AS (SELECT t, d, c, n_risk,
        |    CAST(CASE WHEN d > 0 AND d < n_risk
        |      THEN round(ln(1 - CAST(d AS DOUBLE) / n_risk), 12)
        |      ELSE 0 END AS DECIMAL(28,14)) AS lnf,
        |    CAST(CASE WHEN d > 0 AND d < n_risk
        |      THEN round(CAST(d AS DOUBLE)
        |        / (CAST(n_risk AS DOUBLE) * (n_risk - d)), 12)
        |      ELSE 0 END AS DECIMAL(28,14)) AS gw,
        |    CASE WHEN d = n_risk THEN 1 ELSE 0 END AS z
        |  FROM r),
        |s AS (SELECT t, n_risk, d, c, sum(lnf) OVER w AS cl,
        |    sum(gw) OVER w AS cg, sum(z) OVER w AS cz
        |  FROM f WINDOW w AS (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |o AS (SELECT t, n_risk, d, c,
        |    CASE WHEN cz > 0 THEN 0.0
        |      ELSE exp(CAST(cl AS DOUBLE)) END AS sv,
        |    CASE WHEN cz > 0 THEN 0.0
        |      ELSE exp(CAST(cl AS DOUBLE))
        |        * sqrt(CAST(cg AS DOUBLE)) END AS se
        |  FROM s)
        |SELECT t, n_risk, d, c, round(sv, 6) AS survival,
        |  round(se, 6) AS se,
        |  round(greatest(sv - 1.96 * se, 0.0), 6) AS lo,
        |  round(least(sv + 1.96 * se, 1.0), 6) AS hi
        |FROM o ORDER BY t""".stripMargin,

    "q300_granger" ->
      """WITH s AS (SELECT CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(ts AS DATE)) AS BIGINT) AS t,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |      END) AS BIGINT) AS y,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0
        |      END) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |j AS (SELECT a.y AS y, b.y AS l, b.x AS m
        |  FROM s a JOIN s b ON a.t = b.t + 1),
        |mom AS (SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
        |    CAST(sum(y) AS DECIMAL(38,0)) AS sy,
        |    CAST(sum(l) AS DECIMAL(38,0)) AS sl,
        |    CAST(sum(m) AS DECIMAL(38,0)) AS sm,
        |    CAST(sum(y * y) AS DECIMAL(38,0)) AS syy,
        |    CAST(sum(y * l) AS DECIMAL(38,0)) AS syl,
        |    CAST(sum(y * m) AS DECIMAL(38,0)) AS sym,
        |    CAST(sum(l * l) AS DECIMAL(38,0)) AS sll,
        |    CAST(sum(m * m) AS DECIMAL(38,0)) AS smm,
        |    CAST(sum(l * m) AS DECIMAL(38,0)) AS slm FROM j),
        |c AS (SELECT n,
        |    CAST(n * syy - sy * sy AS DOUBLE) AS cyy,
        |    CAST(n * syl - sy * sl AS DOUBLE) AS cyl,
        |    CAST(n * sym - sy * sm AS DOUBLE) AS cym,
        |    CAST(n * sll - sl * sl AS DOUBLE) AS cll,
        |    CAST(n * smm - sm * sm AS DOUBLE) AS cmm,
        |    CAST(n * slm - sl * sm AS DOUBLE) AS clm FROM mom),
        |f AS (SELECT n, cll * cmm - clm * clm AS det, cyy, cyl, cym,
        |    cll, cmm, clm,
        |    CASE WHEN cll > 0 THEN (cyy - cyl * cyl / cll)
        |      / CAST(n AS DOUBLE) END AS rssr FROM c),
        |g AS (SELECT n, rssr,
        |    CASE WHEN det > 0 THEN (cyy
        |      - ((cyl * cmm - cym * clm) / det) * cyl
        |      - ((cym * cll - cyl * clm) / det) * cym)
        |      / CAST(n AS DOUBLE) END AS rssu FROM f)
        |SELECT 'corpus' AS g, CAST(n AS BIGINT) AS n,
        |  round(rssr, 6) AS rss_restricted,
        |  round(rssu, 6) AS rss_unrestricted,
        |  CASE WHEN rssu > 0 AND n > 3
        |    THEN round((rssr - rssu) * CAST(n - 3 AS DOUBLE) / rssu, 6)
        |  END AS granger_f
        |FROM g""".stripMargin,

    "q301_dr_offpolicy" ->
      """WITH e AS (SELECT event_type AS a,
        |    CAST(CASE WHEN value > 100.0 THEN 1 ELSE 0 END AS DOUBLE)
        |      AS r,
        |    event_id % 2 AS sp FROM events),
        |q AS (SELECT a, round(CAST(sum(CAST(round(r, 6)
        |      AS DECIMAL(28,6))) AS DOUBLE) / count(*), 6) AS q
        |  FROM e WHERE sp = 0 GROUP BY 1),
        |qt AS (SELECT q AS qt FROM q WHERE a = 'click'),
        |ev AS (SELECT a, r FROM e WHERE sp = 1),
        |pr AS (SELECT a, CAST(count(*) AS BIGINT) AS na FROM ev
        |  GROUP BY 1),
        |tt AS (SELECT CAST(sum(na) AS BIGINT) AS nt FROM pr),
        |w AS (SELECT ev.r, q.q, qt.qt,
        |    CASE WHEN ev.a = 'click'
        |      THEN least(CAST(nt AS DOUBLE) / na, 10.0) ELSE 0.0 END
        |      AS rho
        |  FROM ev LEFT JOIN q USING (a) JOIN pr USING (a), tt, qt),
        |t AS (SELECT CAST(round(qt + rho * (r - coalesce(q, 0.0)), 12)
        |      AS DECIMAL(38,12)) AS term,
        |    CAST(round(rho * r, 12) AS DECIMAL(38,12)) AS ipst, qt
        |  FROM w)
        |SELECT CAST(count(*) AS BIGINT) AS n_eval,
        |  round(max(qt), 6) AS direct_method,
        |  round(CAST(sum(ipst) AS DOUBLE) / count(*), 6)
        |    AS ips_clipped,
        |  round(CAST(sum(term) AS DOUBLE) / count(*), 6) AS dr
        |FROM t""".stripMargin,

    "q302_hellinger" ->
      """WITH h AS (SELECT round(value, 1) AS v,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS na,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nb
        |  FROM events WHERE event_type IN ('click', 'view')
        |  GROUP BY 1),
        |a AS (SELECT CAST(sum(na) AS BIGINT) AS ta,
        |    CAST(sum(nb) AS BIGINT) AS tb,
        |    sum(CAST(round(sqrt(CAST(na * nb AS DOUBLE)), 12)
        |      AS DECIMAL(38,12))) AS bcn FROM h),
        |b AS (SELECT ta, tb, least(CAST(bcn AS DOUBLE)
        |    / sqrt(CAST(ta AS DOUBLE) * tb), 1.0) AS bc FROM a)
        |SELECT ta AS n_a, tb AS n_b, round(bc, 6) AS bc,
        |  round(sqrt(1.0 - bc), 6) AS hellinger,
        |  CASE WHEN bc > 0 THEN round(-ln(bc), 6) END
        |    AS bhattacharyya
        |FROM b""".stripMargin,

    "q303_cmh" ->
      """WITH e AS (SELECT event_type AS s,
        |    CAST(user_id % 2 AS INT) AS x,
        |    CASE WHEN value > 100.0 THEN 1 ELSE 0 END AS y
        |  FROM events),
        |g AS (SELECT s, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS r1, CAST(sum(y) AS BIGINT) AS c1,
        |    CAST(sum(x * y) AS BIGINT) AS a FROM e GROUP BY 1),
        |t AS (SELECT *, r1 - a AS b, c1 - a AS c,
        |    n - r1 - c1 + a AS d, CAST(n AS DOUBLE) AS nd FROM g),
        |u AS (SELECT *, CAST(r1 AS DOUBLE) * c1 / nd AS e,
        |    CASE WHEN n > 1 THEN CAST(r1 AS DOUBLE) * (n - r1) * c1
        |      * (n - c1) / (nd * nd * (nd - 1)) END AS v FROM t),
        |z AS (SELECT CAST(count(*) AS BIGINT) AS k_strata,
        |    CAST(sum(n) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN v > 0 THEN CAST(round(a - e, 12)
        |      AS DECIMAL(38,12)) END) AS DOUBLE) AS num,
        |    CAST(sum(CASE WHEN v > 0 THEN CAST(round(v, 12)
        |      AS DECIMAL(38,12)) END) AS DOUBLE) AS den,
        |    CAST(sum(CASE WHEN n > 0 THEN CAST(round(
        |      CAST(a AS DOUBLE) * d / nd, 12) AS DECIMAL(38,12)) END)
        |      AS DOUBLE) AS orn,
        |    CAST(sum(CASE WHEN n > 0 THEN CAST(round(
        |      CAST(b AS DOUBLE) * c / nd, 12) AS DECIMAL(38,12)) END)
        |      AS DOUBLE) AS ord FROM u)
        |SELECT k_strata, n,
        |  CASE WHEN den > 0 THEN round(pow(num, 2) / den, 6) END
        |    AS cmh_chi2,
        |  CASE WHEN ord > 0 THEN round(orn / ord, 6) END AS or_mh
        |FROM z""".stripMargin,

    "q304_morans_i" ->
      """WITH nd AS (SELECT s_nationkey AS id,
        |    CAST(sum(CAST(round(s_acctbal, 2) AS DECIMAL(18,2)))
        |      AS DOUBLE) / count(*) AS x
        |  FROM supplier GROUP BY 1),
        |mb AS (SELECT round(CAST(sum(CAST(round(x, 6)
        |      AS DECIMAL(28,6))) AS DOUBLE) / count(*), 6) AS xb
        |  FROM nd),
        |dv AS (SELECT id, x - xb AS d FROM nd, mb),
        |den AS (SELECT sum(CAST(round(d * d, 12) AS DECIMAL(38,12)))
        |    AS dd, CAST(count(*) AS BIGINT) AS nn FROM dv),
        |ed AS (SELECT a.n_nationkey AS src, b.n_nationkey AS dst
        |  FROM nation a JOIN nation b
        |    ON a.n_regionkey = b.n_regionkey
        |  WHERE a.n_nationkey <> b.n_nationkey),
        |nm AS (SELECT CAST(count(*) AS BIGINT) AS w,
        |    sum(CAST(round(i.d * j.d, 12) AS DECIMAL(38,12))) AS cr
        |  FROM ed JOIN dv i ON ed.src = i.id
        |  JOIN dv j ON ed.dst = j.id)
        |SELECT nn AS n_nodes, w AS n_edges,
        |  CASE WHEN w > 0 AND CAST(dd AS DOUBLE) > 0
        |    THEN round(CAST(nn AS DOUBLE) / w * CAST(cr AS DOUBLE)
        |      / CAST(dd AS DOUBLE), 6) END AS morans_i
        |FROM nm, den""".stripMargin,

    "q305_info_gain" ->
      """WITH e AS (SELECT
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
        |    user_id % 8 AS ub,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) % 7 AS dow,
        |    CAST(floor(value / 50) AS BIGINT) AS vb FROM events),
        |c1 AS (SELECT ub AS x, y, CAST(count(*) AS BIGINT) AS nxy
        |  FROM e GROUP BY 1, 2),
        |mx1 AS (SELECT x, CAST(sum(nxy) AS BIGINT) AS nx FROM c1
        |  GROUP BY 1),
        |my1 AS (SELECT y, CAST(sum(nxy) AS BIGINT) AS ny FROM c1
        |  GROUP BY 1),
        |n1 AS (SELECT CAST(sum(nxy) AS BIGINT) AS nt FROM c1),
        |h1 AS (SELECT sum(CAST(round(-(CAST(nx AS DOUBLE) / nt)
        |    * ln(CAST(nx AS DOUBLE) / nt), 12) AS DECIMAL(28,14)))
        |    AS hx FROM mx1, n1),
        |m1 AS (SELECT sum(CAST(round((CAST(nxy AS DOUBLE) / nt)
        |    * ln(CAST(nxy AS DOUBLE) * nt / (CAST(nx AS DOUBLE) * ny)),
        |    12) AS DECIMAL(28,14))) AS mi, max(nt) AS nr
        |  FROM c1 JOIN mx1 USING (x) JOIN my1 USING (y), n1),
        |c2 AS (SELECT dow AS x, y, CAST(count(*) AS BIGINT) AS nxy
        |  FROM e GROUP BY 1, 2),
        |mx2 AS (SELECT x, CAST(sum(nxy) AS BIGINT) AS nx FROM c2
        |  GROUP BY 1),
        |my2 AS (SELECT y, CAST(sum(nxy) AS BIGINT) AS ny FROM c2
        |  GROUP BY 1),
        |n2 AS (SELECT CAST(sum(nxy) AS BIGINT) AS nt FROM c2),
        |h2 AS (SELECT sum(CAST(round(-(CAST(nx AS DOUBLE) / nt)
        |    * ln(CAST(nx AS DOUBLE) / nt), 12) AS DECIMAL(28,14)))
        |    AS hx FROM mx2, n2),
        |m2 AS (SELECT sum(CAST(round((CAST(nxy AS DOUBLE) / nt)
        |    * ln(CAST(nxy AS DOUBLE) * nt / (CAST(nx AS DOUBLE) * ny)),
        |    12) AS DECIMAL(28,14))) AS mi, max(nt) AS nr
        |  FROM c2 JOIN mx2 USING (x) JOIN my2 USING (y), n2),
        |c3 AS (SELECT vb AS x, y, CAST(count(*) AS BIGINT) AS nxy
        |  FROM e GROUP BY 1, 2),
        |mx3 AS (SELECT x, CAST(sum(nxy) AS BIGINT) AS nx FROM c3
        |  GROUP BY 1),
        |my3 AS (SELECT y, CAST(sum(nxy) AS BIGINT) AS ny FROM c3
        |  GROUP BY 1),
        |n3 AS (SELECT CAST(sum(nxy) AS BIGINT) AS nt FROM c3),
        |h3 AS (SELECT sum(CAST(round(-(CAST(nx AS DOUBLE) / nt)
        |    * ln(CAST(nx AS DOUBLE) / nt), 12) AS DECIMAL(28,14)))
        |    AS hx FROM mx3, n3),
        |m3 AS (SELECT sum(CAST(round((CAST(nxy AS DOUBLE) / nt)
        |    * ln(CAST(nxy AS DOUBLE) * nt / (CAST(nx AS DOUBLE) * ny)),
        |    12) AS DECIMAL(28,14))) AS mi, max(nt) AS nr
        |  FROM c3 JOIN mx3 USING (x) JOIN my3 USING (y), n3)
        |SELECT 'ub' AS feature, nr AS n_rows,
        |  round(CAST(mi AS DOUBLE), 6) AS mi_nats,
        |  round(CAST(hx AS DOUBLE), 6) AS h_feature,
        |  CASE WHEN CAST(hx AS DOUBLE) > 0 THEN
        |    round(CAST(mi AS DOUBLE) / CAST(hx AS DOUBLE), 6) END
        |    AS ig_ratio FROM m1, h1
        |UNION ALL
        |SELECT 'dow', nr, round(CAST(mi AS DOUBLE), 6),
        |  round(CAST(hx AS DOUBLE), 6),
        |  CASE WHEN CAST(hx AS DOUBLE) > 0 THEN
        |    round(CAST(mi AS DOUBLE) / CAST(hx AS DOUBLE), 6) END
        |  FROM m2, h2
        |UNION ALL
        |SELECT 'vb', nr, round(CAST(mi AS DOUBLE), 6),
        |  round(CAST(hx AS DOUBLE), 6),
        |  CASE WHEN CAST(hx AS DOUBLE) > 0 THEN
        |    round(CAST(mi AS DOUBLE) / CAST(hx AS DOUBLE), 6) END
        |  FROM m3, h3
        |ORDER BY feature""".stripMargin,

    "q306_chow" ->
      """WITH s AS (SELECT event_type AS g,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS x,
        |    CAST(count(*) AS BIGINT) AS y FROM events GROUP BY 1, 2),
        |b AS (SELECT g, x, y,
        |    CASE WHEN x < 19744 THEN 0 ELSE 1 END AS seg FROM s),
        |sm AS (SELECT g, seg, CAST(count(*) AS DECIMAL(38,0)) AS n,
        |    CAST(sum(x) AS DECIMAL(38,0)) AS sx,
        |    CAST(sum(y) AS DECIMAL(38,0)) AS sy,
        |    CAST(sum(x * x) AS DECIMAL(38,0)) AS sxx,
        |    CAST(sum(x * y) AS DECIMAL(38,0)) AS sxy,
        |    CAST(sum(y * y) AS DECIMAL(38,0)) AS syy
        |  FROM b GROUP BY 1, 2),
        |sr AS (SELECT g, seg, n,
        |    CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0 THEN
        |      (CAST(n * syy - sy * sy AS DOUBLE)
        |        - pow(CAST(n * sxy - sx * sy AS DOUBLE), 2)
        |          / CAST(n * sxx - sx * sx AS DOUBLE))
        |      / CAST(n AS DOUBLE) END AS rss FROM sm),
        |sg AS (SELECT g, CAST(count(*) AS BIGINT) AS nseg,
        |    sum(CASE WHEN seg = 0 THEN n END) AS n1,
        |    sum(CASE WHEN seg = 1 THEN n END) AS n2,
        |    min(n) AS minn,
        |    sum(CAST(round(rss, 8) AS DECIMAL(38,12))) AS rsum
        |  FROM sr GROUP BY 1),
        |pm AS (SELECT g, CAST(count(*) AS DECIMAL(38,0)) AS n,
        |    CAST(sum(x) AS DECIMAL(38,0)) AS sx,
        |    CAST(sum(y) AS DECIMAL(38,0)) AS sy,
        |    CAST(sum(x * x) AS DECIMAL(38,0)) AS sxx,
        |    CAST(sum(x * y) AS DECIMAL(38,0)) AS sxy,
        |    CAST(sum(y * y) AS DECIMAL(38,0)) AS syy
        |  FROM b GROUP BY 1),
        |pr AS (SELECT g,
        |    CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0 THEN
        |      (CAST(n * syy - sy * sy AS DOUBLE)
        |        - pow(CAST(n * sxy - sx * sy AS DOUBLE), 2)
        |          / CAST(n * sxx - sx * sx AS DOUBLE))
        |      / CAST(n AS DOUBLE) END AS rssp FROM pm)
        |SELECT sg.g AS event_type, CAST(n1 AS BIGINT) AS n1,
        |  CAST(n2 AS BIGINT) AS n2, round(rssp, 6) AS rss_pooled,
        |  round(CAST(rsum AS DOUBLE), 6) AS rss_split,
        |  CASE WHEN nseg = 2 AND minn > 2
        |      AND CAST(rsum AS DOUBLE) > 0
        |      AND CAST(n1 + n2 AS DOUBLE) > 4
        |    THEN round((rssp - CAST(rsum AS DOUBLE)) / 2
        |      / (CAST(rsum AS DOUBLE)
        |        / (CAST(n1 + n2 AS DOUBLE) - 4)), 6) END AS chow_f
        |FROM sg JOIN pr ON sg.g = pr.g ORDER BY 1""".stripMargin,

    "q307_kuiper" ->
      """WITH h AS (SELECT round(value, 4) AS v,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS la,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS lb
        |  FROM events WHERE event_type IN ('click', 'view')
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(la) AS BIGINT) AS ta,
        |    CAST(sum(lb) AS BIGINT) AS tb FROM h),
        |c AS (SELECT sum(la) OVER w AS cla, sum(lb) OVER w AS clb
        |  FROM h WINDOW w AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |g AS (SELECT CAST(cla AS DECIMAL(38,0)) * tb
        |    - CAST(clb AS DECIMAL(38,0)) * ta AS gap, ta, tb
        |  FROM c, tot),
        |a AS (SELECT max(ta) AS ta, max(tb) AS tb,
        |    greatest(max(gap), CAST(0 AS DECIMAL(38,0))) AS dp,
        |    greatest(max(-gap), CAST(0 AS DECIMAL(38,0))) AS dm
        |  FROM g)
        |SELECT ta AS n_a, tb AS n_b,
        |  CASE WHEN ta > 0 AND tb > 0 THEN round(CAST(dp AS DOUBLE)
        |    / (CAST(ta AS DOUBLE) * tb), 6) END AS d_plus,
        |  CASE WHEN ta > 0 AND tb > 0 THEN round(CAST(dm AS DOUBLE)
        |    / (CAST(ta AS DOUBLE) * tb), 6) END AS d_minus,
        |  CASE WHEN ta > 0 AND tb > 0 THEN round(CAST(dp + dm
        |    AS DOUBLE) / (CAST(ta AS DOUBLE) * tb), 6) END AS v_stat
        |FROM a""".stripMargin,

    "q308_cronbach" ->
      """WITH r AS (SELECT user_id, value, row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |sel AS (SELECT user_id AS s, rn AS i,
        |    CAST(round(value, 4) AS DECIMAL(18,4)) AS v FROM r
        |  WHERE rn <= 4),
        |subj AS (SELECT s, count(*) AS cnt,
        |    CAST(sum(v) AS DECIMAL(38,4)) AS sm FROM sel GROUP BY 1),
        |keep AS (SELECT s, sm FROM subj WHERE cnt = 4),
        |items AS (SELECT i, CAST(count(*) AS DECIMAL(38,0)) AS n,
        |    CAST(sum(v) AS DECIMAL(38,4)) AS sv,
        |    CAST(sum(v * v) AS DECIMAL(38,8)) AS svv
        |  FROM sel JOIN keep USING (s) GROUP BY 1),
        |iv AS (SELECT CAST(count(*) AS BIGINT) AS ki,
        |    sum(CAST(round(CAST(n * svv - sv * sv AS DOUBLE)
        |      / CAST(n * (n - 1) AS DOUBLE), 8) AS DECIMAL(38,12)))
        |      AS sumv FROM items),
        |tv AS (SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
        |    CAST(sum(sm) AS DECIMAL(38,4)) AS sv,
        |    CAST(sum(sm * sm) AS DECIMAL(38,8)) AS svv FROM keep),
        |tt AS (SELECT CAST(n AS BIGINT) AS ns,
        |    CAST(n * svv - sv * sv AS DOUBLE)
        |      / CAST(n * (n - 1) AS DOUBLE) AS vart FROM tv)
        |SELECT ns AS n_subjects, ki AS k_items,
        |  round(vart, 6) AS var_total,
        |  CASE WHEN vart > 0 AND ki = 4 AND ns > 1
        |    THEN round(CAST(4 AS DOUBLE) / 3
        |      * (1.0 - CAST(sumv AS DOUBLE) / vart), 6) END AS alpha
        |FROM tt, iv""".stripMargin,

    "q309_chapman" ->
      """WITH f AS (SELECT user_id,
        |    max(CASE WHEN CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(ts AS DATE)) AS BIGINT) % 2 = 0 THEN 1 ELSE 0 END)
        |      AS ha,
        |    max(CASE WHEN CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(ts AS DATE)) AS BIGINT) % 2 = 1 THEN 1 ELSE 0 END)
        |      AS hb
        |  FROM events GROUP BY 1)
        |SELECT CAST(sum(ha) AS BIGINT) AS n_a,
        |  CAST(sum(hb) AS BIGINT) AS n_b,
        |  CAST(sum(ha * hb) AS BIGINT) AS n_both,
        |  CAST(count(*) AS BIGINT) AS n_observed,
        |  round(CAST(sum(ha) + 1 AS DOUBLE) * (sum(hb) + 1)
        |    / (sum(ha * hb) + 1) - 1, 2) AS n_hat
        |FROM f""".stripMargin,

    "q310_gumbel" ->
      """WITH s AS (SELECT event_type AS g,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS x,
        |    CAST(count(*) AS BIGINT) AS y FROM events GROUP BY 1, 2),
        |mx AS (SELECT g, x - x % 7 AS b, max(y) AS m
        |  FROM s GROUP BY 1, 2),
        |mom AS (SELECT g, CAST(count(*) AS DECIMAL(38,0)) AS n,
        |    CAST(sum(m) AS DECIMAL(38,0)) AS sm,
        |    CAST(sum(m * m) AS DECIMAL(38,0)) AS smm
        |  FROM mx GROUP BY 1),
        |f AS (SELECT g, n, CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)
        |    AS mean,
        |    CAST(n * smm - sm * sm AS DOUBLE)
        |      / CAST(n * (n - 1) AS DOUBLE) AS var FROM mom),
        |p AS (SELECT g, n, mean, CASE WHEN var > 0
        |    THEN sqrt(var * 6) / pi() END AS beta FROM f),
        |q AS (SELECT g, n, beta,
        |    mean - 0.5772156649015329 * beta AS mu FROM p)
        |SELECT g AS event_type, CAST(n AS BIGINT) AS n_blocks,
        |  round(mu, 6) AS mu, round(beta, 6) AS beta,
        |  CASE WHEN beta > 0 THEN round(1.0
        |    - exp(-exp(-(500.0 - mu) / beta)), 6) END AS p_exceed
        |FROM q ORDER BY 1""".stripMargin,

    "q311_partial_corr" ->
      """WITH v AS (SELECT l_returnflag AS g,
        |    CAST(round(l_quantity, 4) AS DECIMAL(28,4)) AS x,
        |    CAST(round(l_extendedprice, 4) AS DECIMAL(28,4)) AS y,
        |    CAST(round(l_discount, 4) AS DECIMAL(28,4)) AS z
        |  FROM lineitem),
        |m AS (SELECT g, CAST(count(*) AS DECIMAL(38,0)) AS n,
        |    CAST(sum(x) AS DECIMAL(38,4)) AS sx,
        |    CAST(sum(y) AS DECIMAL(38,4)) AS sy,
        |    CAST(sum(z) AS DECIMAL(38,4)) AS sz,
        |    CAST(sum(x * y) AS DECIMAL(38,8)) AS sxy,
        |    CAST(sum(x * z) AS DECIMAL(38,8)) AS sxz,
        |    CAST(sum(y * z) AS DECIMAL(38,8)) AS syz,
        |    CAST(sum(x * x) AS DECIMAL(38,8)) AS sxx,
        |    CAST(sum(y * y) AS DECIMAL(38,8)) AS syy,
        |    CAST(sum(z * z) AS DECIMAL(38,8)) AS szz
        |  FROM v GROUP BY 1),
        |c AS (SELECT g, n,
        |    CAST(n * sxx - sx * sx AS DOUBLE) AS cxx,
        |    CAST(n * syy - sy * sy AS DOUBLE) AS cyy,
        |    CAST(n * szz - sz * sz AS DOUBLE) AS czz,
        |    CAST(n * sxy - sx * sy AS DOUBLE) AS cxy,
        |    CAST(n * sxz - sx * sz AS DOUBLE) AS cxz,
        |    CAST(n * syz - sy * sz AS DOUBLE) AS cyz FROM m),
        |r AS (SELECT g, n,
        |    CASE WHEN cxx > 0 AND cyy > 0
        |      THEN cxy / sqrt(cxx * cyy) END AS rxy,
        |    CASE WHEN cxx > 0 AND czz > 0
        |      THEN cxz / sqrt(cxx * czz) END AS rxz,
        |    CASE WHEN cyy > 0 AND czz > 0
        |      THEN cyz / sqrt(cyy * czz) END AS ryz FROM c),
        |d AS (SELECT *, (1.0 - rxz * rxz) * (1.0 - ryz * ryz) AS den
        |  FROM r)
        |SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n,
        |  round(rxy, 6) AS r_xy, round(rxz, 6) AS r_xz,
        |  round(ryz, 6) AS r_yz,
        |  CASE WHEN den > 0 THEN round((rxy - rxz * ryz)
        |    / sqrt(den), 6) END AS r_xy_given_z
        |FROM d ORDER BY 1""".stripMargin,

    "q312_epi" ->
      """WITH e AS (SELECT CAST(user_id % 2 AS INT) AS x,
        |    CASE WHEN value > 100.0 THEN 1 ELSE 0 END AS y
        |  FROM events),
        |t AS (SELECT
        |    CAST(sum(CASE WHEN x = 1 AND y = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN x = 1 AND y = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN x = 0 AND y = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN x = 0 AND y = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS d FROM e),
        |u AS (SELECT *, a > 0 AND b > 0 AND c > 0 AND d > 0 AS ok,
        |    CAST(a AS DOUBLE) / (a + b) AS p1,
        |    CAST(c AS DOUBLE) / (c + d) AS p0 FROM t),
        |w AS (SELECT *,
        |    CASE WHEN ok THEN CAST(a AS DOUBLE) * d
        |      / (CAST(b AS DOUBLE) * c) END AS orr,
        |    CASE WHEN ok THEN sqrt(1.0 / a + 1.0 / b + 1.0 / c
        |      + 1.0 / d) END AS seor,
        |    CASE WHEN ok THEN p1 / p0 END AS rr,
        |    CASE WHEN ok THEN sqrt(1.0 / a - 1.0 / (a + b) + 1.0 / c
        |      - 1.0 / (c + d)) END AS serr FROM u)
        |SELECT a AS n11, b AS n10, c AS n01, d AS n00,
        |  round(p1 - p0, 6) AS risk_diff,
        |  round(orr, 6) AS odds_ratio,
        |  round(exp(ln(orr) - 1.96 * seor), 6) AS or_lo,
        |  round(exp(ln(orr) + 1.96 * seor), 6) AS or_hi,
        |  round(rr, 6) AS relative_risk,
        |  round(exp(ln(rr) - 1.96 * serr), 6) AS rr_lo,
        |  round(exp(ln(rr) + 1.96 * serr), 6) AS rr_hi,
        |  round(2.0 * asin(sqrt(p1)) - 2.0 * asin(sqrt(p0)), 6)
        |    AS cohen_h
        |FROM w""".stripMargin,

    "q313_bowker" ->
      """WITH r AS (SELECT user_id, event_type, row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |f AS (SELECT user_id, event_type AS frm FROM r WHERE rn = 1),
        |t2 AS (SELECT user_id, event_type AS tto FROM r WHERE rn = 2),
        |p AS (SELECT frm, tto FROM f JOIN t2 USING (user_id)
        |  WHERE frm <> tto),
        |cells AS (SELECT frm AS i, tto AS j,
        |    CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1, 2),
        |jj AS (SELECT coalesce(a.i, b.i) AS i, coalesce(a.j, b.j) AS j,
        |    coalesce(a.n, 0) AS nn, coalesce(b.n2, 0) AS mm
        |  FROM cells a FULL JOIN (SELECT j AS i, i AS j, n AS n2
        |    FROM cells) b ON a.i = b.i AND a.j = b.j),
        |q AS (SELECT nn, mm, CASE WHEN nn + mm > 0
        |    THEN CAST(round(pow(nn - mm, 2) / (nn + mm), 12)
        |      AS DECIMAL(38,12)) END AS term
        |  FROM jj WHERE i < j)
        |SELECT CAST(sum(nn + mm) AS BIGINT) AS n_offdiag,
        |  CAST(sum(CASE WHEN term IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS dof,
        |  round(CAST(sum(term) AS DOUBLE), 6) AS bowker_chi2
        |FROM q""".stripMargin,

    "q314_seasonal_mk" ->
      """WITH s AS (SELECT event_type AS g,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS x,
        |    CAST(count(*) AS BIGINT) AS y FROM events GROUP BY 1, 2),
        |b AS (SELECT g, x, x % 7 AS slot, CAST(y AS DOUBLE) AS y
        |  FROM s),
        |st AS (SELECT a.g,
        |    CAST(sum(CAST(sign(b.y - a.y) AS BIGINT)) AS BIGINT)
        |      AS sstat
        |  FROM b a JOIN b b ON a.g = b.g AND a.slot = b.slot
        |    AND b.x > a.x GROUP BY 1),
        |ps AS (SELECT g, slot, CAST(count(*) AS BIGINT) AS n
        |  FROM b GROUP BY 1, 2),
        |ti AS (SELECT g, slot,
        |    CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tt
        |  FROM (SELECT g, slot, y, CAST(count(*) AS BIGINT) AS t
        |    FROM b GROUP BY 1, 2, 3) GROUP BY 1, 2),
        |vt AS (SELECT g, CAST(sum(n) AS BIGINT) AS ntot,
        |    CAST(sum(n * (n - 1) * (2 * n + 5) - tt) AS BIGINT)
        |      AS v18
        |  FROM ps JOIN ti USING (g, slot) GROUP BY 1)
        |SELECT vt.g AS event_type, ntot AS n,
        |  coalesce(sstat, 0) AS s_stat,
        |  CASE WHEN CAST(v18 AS DOUBLE) / 18.0 > 0
        |    THEN round(CAST(coalesce(sstat, 0)
        |        - sign(coalesce(sstat, 0)) AS DOUBLE)
        |      / sqrt(CAST(v18 AS DOUBLE) / 18.0), 6) END AS z
        |FROM vt LEFT JOIN st ON vt.g = st.g ORDER BY 1""".stripMargin,

    "q315_yuen" ->
      """WITH base AS (SELECT CASE WHEN event_type = 'click' THEN 0
        |    ELSE 1 END AS s, value AS v FROM events
        |  WHERE event_type IN ('click', 'view')),
        |bounds AS (SELECT s, round(quantile_cont(v, 0.1), 6) AS lo,
        |    round(quantile_cont(v, 0.9), 6) AS hi FROM base
        |  GROUP BY 1),
        |w AS (SELECT base.s, v, v >= lo AND v <= hi AS inb,
        |    CAST(round(greatest(least(v, hi), lo), 4)
        |      AS DECIMAL(18,4)) AS wv
        |  FROM base JOIN bounds USING (s)),
        |st AS (SELECT s, CAST(count(*) AS DECIMAL(38,0)) AS n,
        |    CAST(sum(CASE WHEN inb THEN 1 ELSE 0 END)
        |      AS DECIMAL(38,0)) AS h,
        |    CAST(sum(CASE WHEN inb THEN CAST(round(v, 4)
        |      AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END)
        |      AS DECIMAL(38,4)) AS stt,
        |    CAST(sum(wv) AS DECIMAL(38,4)) AS sw,
        |    CAST(sum(wv * wv) AS DECIMAL(38,8)) AS sww
        |  FROM w GROUP BY 1),
        |f AS (SELECT s, n, h,
        |    CAST(stt AS DOUBLE) / CAST(h AS DOUBLE) AS mt,
        |    CAST(n * sww - sw * sw AS DOUBLE)
        |      / CAST(n * (n - 1) AS DOUBLE) AS vw FROM st),
        |g AS (SELECT s, h, mt, CASE WHEN h > 1
        |    THEN vw * CAST(n - 1 AS DOUBLE)
        |      / CAST(h * (h - 1) AS DOUBLE) END AS d FROM f)
        |SELECT CAST(a.h AS BIGINT) AS h_a, CAST(b.h AS BIGINT) AS h_b,
        |  round(a.mt, 6) AS trimmed_mean_a,
        |  round(b.mt, 6) AS trimmed_mean_b,
        |  CASE WHEN a.d + b.d > 0 THEN round((a.mt - b.mt)
        |    / sqrt(a.d + b.d), 6) END AS yuen_t
        |FROM g a, g b WHERE a.s = 0 AND b.s = 1""".stripMargin,

    "q316_dispersion" ->
      """WITH s AS (SELECT event_type AS g,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS x,
        |    CAST(count(*) AS BIGINT) AS y FROM events GROUP BY 1, 2),
        |m AS (SELECT g, CAST(count(*) AS DECIMAL(38,0)) AS n,
        |    CAST(sum(y) AS DECIMAL(38,0)) AS sm,
        |    CAST(sum(y * y) AS DECIMAL(38,0)) AS ss
        |  FROM s GROUP BY 1),
        |f AS (SELECT g, n, CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)
        |    AS mean,
        |    CAST(n * ss - sm * sm AS DOUBLE)
        |      / CAST(n * (n - 1) AS DOUBLE) AS var FROM m)
        |SELECT g AS event_type, CAST(n AS BIGINT) AS n,
        |  round(mean, 6) AS mean, round(var, 6) AS variance,
        |  CASE WHEN mean > 0 AND n > 1
        |    THEN round(var / mean, 6) END AS vmr,
        |  CASE WHEN mean > 0 AND n > 1
        |    THEN round(CAST(n - 1 AS DOUBLE) * var / mean, 6) END
        |    AS chi2
        |FROM f ORDER BY 1""".stripMargin,

    "q317_temperature" ->
      """WITH c AS (SELECT source AS d, CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM c),
        |p AS (SELECT d, n, CAST(n AS DOUBLE) / nn AS p,
        |    round(pow(CAST(n AS DOUBLE) / nn, 0.7), 12) AS w
        |  FROM c, t),
        |z AS (SELECT sum(CAST(w AS DECIMAL(38,12))) AS z FROM p)
        |SELECT d AS source, n, round(p, 6) AS p_natural,
        |  round(w / CAST(z AS DOUBLE), 6) AS weight,
        |  round(w / CAST(z AS DOUBLE) * 100000, 2)
        |    AS expected_samples
        |FROM p, z ORDER BY 1""".stripMargin,

    "q318_psi_period" ->
      """WITH b AS (SELECT CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(ts AS DATE)) AS BIGINT) // 7 AS per,
        |    CAST(least(floor(value / 50), 9) AS INT) AS bin
        |  FROM events),
        |cells AS (SELECT per, bin, CAST(count(*) AS BIGINT) AS n
        |  FROM b GROUP BY 1, 2),
        |bp AS (SELECT min(per) AS bp FROM cells),
        |bins AS (SELECT CAST(range AS INT) AS bin FROM range(0, 10)),
        |base AS (SELECT bins.bin, coalesce(b0.nb, 0) AS nb FROM bins
        |  LEFT JOIN (SELECT bin, n AS nb FROM cells, bp WHERE per = bp)
        |    b0 ON b0.bin = bins.bin),
        |bt AS (SELECT CAST(sum(nb) AS BIGINT) AS tb FROM base),
        |pt AS (SELECT per, CAST(sum(n) AS BIGINT) AS tp FROM cells
        |  GROUP BY 1),
        |grid AS (SELECT pt.per, pt.tp, base.bin, base.nb,
        |    coalesce(cells.n, 0) AS n
        |  FROM pt CROSS JOIN base LEFT JOIN cells
        |    ON cells.per = pt.per AND cells.bin = base.bin),
        |t2 AS (SELECT per, tp, CAST(round(
        |    (CAST(n + 1 AS DOUBLE) / (tp + 10)
        |      - CAST(nb + 1 AS DOUBLE) / (tb + 10))
        |    * ln((CAST(n + 1 AS DOUBLE) / (tp + 10))
        |      / (CAST(nb + 1 AS DOUBLE) / (tb + 10))), 10)
        |    AS DECIMAL(28,12)) AS term FROM grid, bt)
        |SELECT per AS week, CAST(max(tp) AS BIGINT) AS n,
        |  round(CAST(sum(term) AS DOUBLE), 6) AS psi
        |FROM t2 GROUP BY 1 ORDER BY 1""".stripMargin,

    "q319_weighted_median" ->
      """WITH h AS (SELECT l_returnflag AS g,
        |    round(l_extendedprice, 2) AS v,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS gw
        |  FROM lineitem GROUP BY 1, 2),
        |t AS (SELECT g, CAST(sum(gw) AS BIGINT) AS tw FROM h
        |  GROUP BY 1),
        |c AS (SELECT g, v, sum(gw) OVER (PARTITION BY g ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM h)
        |SELECT c.g AS l_returnflag,
        |  CAST(max(t.tw) AS BIGINT) AS total_weight,
        |  min(v) AS weighted_median
        |FROM c JOIN t ON c.g = t.g WHERE 2 * cum >= tw
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q320_kendall_w" ->
      """WITH s AS (SELECT CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(ts AS DATE)) AS BIGINT) // 7 AS b,
        |    event_type AS t, round(CAST(count(*) AS DOUBLE), 4) AS v
        |  FROM events GROUP BY 1, 2),
        |k AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS k FROM s),
        |comp AS (SELECT s.* FROM s JOIN (SELECT b,
        |      CAST(count(*) AS BIGINT) AS bn,
        |      CAST(count(DISTINCT t) AS BIGINT) AS bd
        |      FROM s GROUP BY 1) c
        |    ON s.b = c.b, k WHERE c.bn = k.k AND c.bd = k.k),
        |rk AS (SELECT b, t, v,
        |    rank() OVER (PARTITION BY b ORDER BY v) AS rnk,
        |    count(*) OVER (PARTITION BY b, v) AS tie FROM comp),
        |r2 AS (SELECT t, rnk * 2 + tie - 1 AS r2 FROM rk),
        |pi AS (SELECT t, CAST(CAST(sum(r2) AS DECIMAL(38,0)) / 2
        |      AS DECIMAL(38,1)) AS rsum,
        |    CAST(count(*) AS BIGINT) AS m FROM r2 GROUP BY 1),
        |ts AS (SELECT CAST(sum(tt * tt * tt - tt) AS DECIMAL(38,0))
        |    AS tsum
        |  FROM (SELECT b, v, CAST(count(*) AS BIGINT) AS tt
        |    FROM comp GROUP BY 1, 2)),
        |a AS (SELECT CAST(max(m) AS DECIMAL(38,0)) AS mm,
        |    CAST(count(*) AS DECIMAL(38,0)) AS nn,
        |    CAST(sum(rsum * rsum) AS DECIMAL(38,2)) AS ssq FROM pi),
        |f AS (SELECT mm, nn, ssq, tsum,
        |    CAST(mm * mm * nn * (nn * nn - 1) - mm * tsum AS DOUBLE)
        |      AS den FROM a, ts),
        |w AS (SELECT mm, nn, CASE WHEN den > 0 THEN round(
        |    (12.0 * CAST(ssq AS DOUBLE) - 3.0 * CAST(mm * mm * nn
        |      * (nn + 1) * (nn + 1) AS DOUBLE)) / den, 6) END AS w
        |  FROM f)
        |SELECT CAST(mm AS BIGINT) AS m_raters,
        |  CAST(nn AS BIGINT) AS n_items, w,
        |  CASE WHEN w IS NOT NULL THEN round(CAST(mm AS DOUBLE)
        |    * CAST(nn - 1 AS DOUBLE) * w, 6) END AS chi2
        |FROM w""".stripMargin,

    "q321_gini_split" ->
      """WITH h AS (SELECT round(value, 4) AS f,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |      END) AS BIGINT) AS pos
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
        |    CAST(sum(pos) AS BIGINT) AS tp FROM h),
        |c AS (SELECT f, sum(n) OVER w AS cn0, sum(pos) OVER w AS cp0
        |  FROM h WINDOW w AS (ORDER BY f
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |cand AS (SELECT f, CAST(cn0 AS BIGINT) AS cnl,
        |    CAST(cp0 AS BIGINT) AS cpl,
        |    CAST(cn0 AS DOUBLE) AS cn, CAST(cp0 AS DOUBLE) AS cp,
        |    CAST(tn - cn0 AS DOUBLE) AS rn,
        |    CAST(tp - cp0 AS DOUBLE) AS rp, tn, tp
        |  FROM c, tot WHERE cn0 < tn),
        |g AS (SELECT f, cnl, cpl, round(
        |    2.0 * tp * (tn - tp) / (CAST(tn AS DOUBLE) * tn)
        |    - (2.0 * cp * (cn - cp) / cn
        |      + 2.0 * rp * (rn - rp) / rn) / CAST(tn AS DOUBLE), 10)
        |    AS gain FROM cand),
        |b AS (SELECT max(gain) AS best FROM g)
        |SELECT min(f) AS threshold, round(max(best), 6) AS gain,
        |  CAST(arg_min(cnl, f) AS BIGINT) AS n_left,
        |  CAST(arg_min(cpl, f) AS BIGINT) AS pos_left
        |FROM g, b WHERE gain = best""".stripMargin,

    "q322_youden" ->
      """WITH h AS (SELECT round(round(value, 1), 6) AS s,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |      END) AS BIGINT) AS pos,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(sum(pos) AS BIGINT) AS tp,
        |    CAST(sum(n) AS BIGINT) AS tn FROM h),
        |c AS (SELECT s, sum(pos) OVER w AS cp, sum(n) OVER w AS cn
        |  FROM h WINDOW w AS (ORDER BY s DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |j AS (SELECT s, CAST(cp AS DOUBLE) / tp AS tpr,
        |    CAST(cn - cp AS DOUBLE) / (tn - tp) AS fpr,
        |    round(CAST(cp AS DOUBLE) / tp
        |      - CAST(cn - cp AS DOUBLE) / (tn - tp), 10) AS jj
        |  FROM c, tot WHERE tp > 0 AND tn > tp),
        |b AS (SELECT max(jj) AS best FROM j)
        |SELECT max(s) AS threshold, round(max(best), 6) AS j_stat,
        |  round(arg_max(tpr, s), 6) AS tpr,
        |  round(arg_max(fpr, s), 6) AS fpr
        |FROM j, b WHERE jj = best""".stripMargin,

    "q323_hhi" ->
      """WITH cells AS (SELECT o_orderpriority AS g, o_custkey AS e,
        |    CAST(sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)))
        |      AS DECIMAL(38,2)) AS v
        |  FROM orders GROUP BY 1, 2),
        |t AS (SELECT g, CAST(sum(v) AS DECIMAL(38,2)) AS tv,
        |    CAST(count(*) AS BIGINT) AS ne FROM cells GROUP BY 1),
        |s AS (SELECT cells.g, ne,
        |    CAST(v AS DOUBLE) / CAST(tv AS DOUBLE) AS sh
        |  FROM cells JOIN t ON cells.g = t.g),
        |a AS (SELECT g, max(ne) AS ne,
        |    CAST(sum(CAST(round(sh * sh, 12) AS DECIMAL(38,12)))
        |      AS DOUBLE) AS h FROM s GROUP BY 1)
        |SELECT g AS o_orderpriority, ne AS n_entities,
        |  round(h, 6) AS hhi,
        |  CASE WHEN ne > 1 THEN round((h - 1.0 / ne)
        |    / (1.0 - 1.0 / ne), 6) END AS hhi_normalized
        |FROM a ORDER BY 1""".stripMargin,

    "q324_qq" ->
      """WITH a AS (SELECT unnest(quantile_cont(value,
        |      [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])) AS qa,
        |    CAST(unnest(generate_series(0, 8)) AS INT) AS i
        |  FROM events WHERE event_type = 'click'),
        |b AS (SELECT unnest(quantile_cont(value,
        |      [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])) AS qb,
        |    CAST(unnest(generate_series(0, 8)) AS INT) AS i
        |  FROM events WHERE event_type = 'view')
        |SELECT round(CAST(a.i + 1 AS DOUBLE) / 10, 1) AS quantile,
        |  round(qa, 6) AS q_a, round(qb, 6) AS q_b,
        |  round(qb - qa, 6) AS gap
        |FROM a JOIN b ON a.i = b.i ORDER BY 1""".stripMargin,

    "q325_entropy_rate" ->
      """WITH r AS (SELECT user_id, event_type, lead(event_type)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        |  FROM events),
        |cells AS (SELECT event_type AS i, nxt AS j,
        |    CAST(count(*) AS BIGINT) AS n FROM r
        |  WHERE nxt IS NOT NULL GROUP BY 1, 2),
        |rm AS (SELECT i, CAST(sum(n) AS BIGINT) AS ni FROM cells
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
        |    CAST(count(DISTINCT i) AS BIGINT) AS k FROM cells),
        |t AS (SELECT CAST(round(-(CAST(n AS DOUBLE) / tn)
        |      * ln(CAST(n AS DOUBLE) / ni), 12) AS DECIMAL(28,14))
        |    AS term, tn, k
        |  FROM cells JOIN rm USING (i), tot)
        |SELECT max(tn) AS n_transitions, max(k) AS n_states,
        |  round(CAST(sum(term) AS DOUBLE), 6) AS entropy_rate_nats,
        |  round(exp(CAST(sum(term) AS DOUBLE)), 6) AS perplexity
        |FROM t""".stripMargin,

    "q326_hill" ->
      """WITH cells AS (SELECT event_type AS g, user_id AS e,
        |    CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
        |t AS (SELECT g, CAST(sum(n) AS BIGINT) AS tn,
        |    CAST(count(*) AS BIGINT) AS r FROM cells GROUP BY 1),
        |s AS (SELECT cells.g, r, CAST(n AS DOUBLE) / tn AS p
        |  FROM cells JOIN t ON cells.g = t.g),
        |a AS (SELECT g, max(r) AS r,
        |    sum(CAST(round(-p * ln(p), 12) AS DECIMAL(28,14))) AS h,
        |    sum(CAST(round(p * p, 12) AS DECIMAL(28,14))) AS simp
        |  FROM s GROUP BY 1)
        |SELECT g AS event_type, r AS d0_richness,
        |  round(exp(CAST(h AS DOUBLE)), 6) AS d1_shannon,
        |  round(1.0 / CAST(simp AS DOUBLE), 6) AS d2_simpson,
        |  CASE WHEN r > 1 THEN round(CAST(h AS DOUBLE)
        |    / ln(CAST(r AS DOUBLE)), 6) END AS evenness
        |FROM a ORDER BY 1""".stripMargin,

    "q327_mahalanobis" ->
      """WITH b AS (SELECT l_returnflag AS g,
        |    CAST(round(l_quantity, 4) AS DECIMAL(18,4)) AS v0,
        |    CAST(round(l_extendedprice, 4) AS DECIMAL(18,4)) AS v1,
        |    CAST(round(l_discount, 4) AS DECIMAL(18,4)) AS v2
        |  FROM lineitem),
        |m AS (SELECT g, CAST(count(*) AS DECIMAL(38,0)) AS n,
        |    CAST(sum(v0) AS DECIMAL(38,4)) AS s0,
        |    CAST(sum(CAST(v0 AS DECIMAL(28,4))
        |      * CAST(v0 AS DECIMAL(28,4))) AS DECIMAL(38,8)) AS ss0,
        |    CAST(sum(v1) AS DECIMAL(38,4)) AS s1,
        |    CAST(sum(CAST(v1 AS DECIMAL(28,4))
        |      * CAST(v1 AS DECIMAL(28,4))) AS DECIMAL(38,8)) AS ss1,
        |    CAST(sum(v2) AS DECIMAL(38,4)) AS s2,
        |    CAST(sum(CAST(v2 AS DECIMAL(28,4))
        |      * CAST(v2 AS DECIMAL(28,4))) AS DECIMAL(38,8)) AS ss2
        |  FROM b GROUP BY 1),
        |st AS (SELECT g,
        |    round(CAST(s0 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS m0,
        |    round(sqrt(greatest(CAST(n * ss0 - s0 * s0 AS DOUBLE)
        |      / CAST(n * (n - 1) AS DOUBLE), 0.0)), 6) AS sd0,
        |    round(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS m1,
        |    round(sqrt(greatest(CAST(n * ss1 - s1 * s1 AS DOUBLE)
        |      / CAST(n * (n - 1) AS DOUBLE), 0.0)), 6) AS sd1,
        |    round(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS m2,
        |    round(sqrt(greatest(CAST(n * ss2 - s2 * s2 AS DOUBLE)
        |      / CAST(n * (n - 1) AS DOUBLE), 0.0)), 6) AS sd2
        |  FROM m),
        |d AS (SELECT b.g, round(
        |    (CASE WHEN sd0 > 0 THEN pow((CAST(v0 AS DOUBLE) - m0)
        |      / sd0, 2) ELSE 0.0 END)
        |    + (CASE WHEN sd1 > 0 THEN pow((CAST(v1 AS DOUBLE) - m1)
        |      / sd1, 2) ELSE 0.0 END)
        |    + (CASE WHEN sd2 > 0 THEN pow((CAST(v2 AS DOUBLE) - m2)
        |      / sd2, 2) ELSE 0.0 END), 8) AS d2
        |  FROM b JOIN st ON b.g = st.g)
        |SELECT g AS l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN d2 > 16.27 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers,
        |  round(CAST(sum(CASE WHEN d2 > 16.27 THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*), 6) AS outlier_rate,
        |  round(max(d2), 6) AS max_d2
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,

    "q328_benford2" ->
      """WITH obs AS (SELECT CAST(substr(CAST(CAST(round(
        |      o_totalprice * 100, 0) AS BIGINT) AS VARCHAR), 2, 1)
        |      AS INT) AS digit,
        |    CAST(count(*) AS BIGINT) AS n_obs
        |  FROM orders WHERE o_totalprice > 0
        |    AND CAST(round(o_totalprice * 100, 0) AS BIGINT) >= 10
        |  GROUP BY 1),
        |e AS (SELECT d.d AS digit, CAST(sum(CAST(round(log10(
        |      1.0 + 1.0 / (10 * k.k + d.d)), 12) AS DECIMAL(28,14)))
        |    AS DOUBLE) AS p
        |  FROM (SELECT unnest(generate_series(0, 9)) AS d) d
        |  CROSS JOIN (SELECT unnest(generate_series(1, 9)) AS k) k
        |  GROUP BY 1),
        |t AS (SELECT CAST(sum(n_obs) AS DOUBLE) AS tn FROM obs)
        |SELECT e.digit, coalesce(n_obs, 0) AS n_obs,
        |  round(tn * p, 4) AS exp_n,
        |  round((coalesce(n_obs, 0) - tn * p)
        |    * (coalesce(n_obs, 0) - tn * p) / (tn * p), 4)
        |    AS chi2_term
        |FROM e LEFT JOIN obs ON e.digit = obs.digit, t
        |ORDER BY 1""".stripMargin,

    "q329_mutual_knn_ann" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
        |  FROM embeddings),
        |bb AS (SELECT 4 + (CASE WHEN count(*) >= 1000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 4000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 16000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 64000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 256000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 1024000 THEN 2 ELSE 0 END) AS bits
        |  FROM e),
        |n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm,
        |  CAST(list_sum(list_transform(range(bits),
        |    j -> CASE WHEN emb[j + 1] > 0 THEN 1 << j ELSE 0 END))
        |    AS INT) AS bucket
        |  FROM e CROSS JOIN bb),
        |pb AS (SELECT vec_id, emb, nrm,
        |  unnest(list_concat([bucket], list_transform(range(bits),
        |    j -> xor(bucket, CAST(1 << j AS INT))))) AS bucket
        |  FROM n CROSS JOIN bb),
        |p AS (SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
        |    list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) AS sim
        |  FROM pb a JOIN n b ON a.bucket = b.bucket
        |    AND a.vec_id <> b.vec_id),
        |r AS (SELECT vec_id, neighbor_id, sim,
        |    row_number() OVER (PARTITION BY vec_id
        |      ORDER BY sim DESC, neighbor_id) AS rn
        |  FROM p),
        |t AS (SELECT vec_id, neighbor_id, sim FROM r WHERE rn <= 5)
        |SELECT a.vec_id AS id_a, a.neighbor_id AS id_b,
        |  round(a.sim, 6) AS sim
        |FROM t a JOIN t b ON a.vec_id = b.neighbor_id
        |  AND a.neighbor_id = b.vec_id
        |WHERE a.vec_id < a.neighbor_id
        |ORDER BY id_a, id_b""".stripMargin,

    "q330_label_prop_ann" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
        |  FROM embeddings),
        |bb AS (SELECT 4 + (CASE WHEN count(*) >= 1000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 4000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 16000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 64000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 256000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 1024000 THEN 2 ELSE 0 END) AS bits
        |  FROM e),
        |n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm,
        |  CAST(list_sum(list_transform(range(bits),
        |    j -> CASE WHEN emb[j + 1] > 0 THEN 1 << j ELSE 0 END))
        |    AS INT) AS bucket
        |  FROM e CROSS JOIN bb),
        |pb AS (SELECT vec_id, emb, nrm,
        |  unnest(list_concat([bucket], list_transform(range(bits),
        |    j -> xor(bucket, CAST(1 << j AS INT))))) AS bucket
        |  FROM n CROSS JOIN bb),
        |p AS (SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
        |    list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) AS sim
        |  FROM pb a JOIN n b ON a.bucket = b.bucket
        |    AND a.vec_id <> b.vec_id),
        |r AS (SELECT vec_id, neighbor_id,
        |    row_number() OVER (PARTITION BY vec_id
        |      ORDER BY sim DESC, neighbor_id) AS rn
        |  FROM p),
        |t AS (SELECT vec_id, neighbor_id FROM r WHERE rn <= 5),
        |mk AS (SELECT a.vec_id AS s, a.neighbor_id AS d
        |  FROM t a JOIN t b ON a.vec_id = b.neighbor_id
        |    AND a.neighbor_id = b.vec_id
        |  WHERE a.vec_id < a.neighbor_id),
        |und AS (SELECT s, d FROM mk UNION ALL SELECT d AS s, s AS d
        |  FROM mk),
        |l0 AS (SELECT vec_id AS id, CAST(label AS BIGINT) AS lbl,
        |    0 AS rnd
        |  FROM embeddings WHERE vec_id % 3 = 0),
        |v1 AS (SELECT und.s AS id, l0.lbl, count(*) AS c
        |  FROM und JOIN l0 ON und.d = l0.id
        |  WHERE und.s NOT IN (SELECT id FROM l0) GROUP BY 1, 2),
        |p1 AS (SELECT id, lbl FROM (SELECT id, lbl, row_number() OVER
        |    (PARTITION BY id ORDER BY c DESC, lbl) AS rn FROM v1)
        |  WHERE rn = 1),
        |l1 AS (SELECT * FROM l0
        |  UNION ALL SELECT id, lbl, 1 AS rnd FROM p1),
        |v2 AS (SELECT und.s AS id, l1.lbl, count(*) AS c
        |  FROM und JOIN l1 ON und.d = l1.id
        |  WHERE und.s NOT IN (SELECT id FROM l1) GROUP BY 1, 2),
        |p2 AS (SELECT id, lbl FROM (SELECT id, lbl, row_number() OVER
        |    (PARTITION BY id ORDER BY c DESC, lbl) AS rn FROM v2)
        |  WHERE rn = 1),
        |l2 AS (SELECT * FROM l1
        |  UNION ALL SELECT id, lbl, 2 AS rnd FROM p2)
        |SELECT id AS vec_id, lbl AS label_pred, CAST(rnd AS INT)
        |  AS round
        |FROM l2 ORDER BY vec_id""".stripMargin,

    "q331_rec_list_ann" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
        |  FROM embeddings),
        |bb AS (SELECT 4 + (CASE WHEN count(*) >= 1000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 4000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 16000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 64000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 256000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 1024000 THEN 2 ELSE 0 END) AS bits
        |  FROM e),
        |n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm,
        |  CAST(list_sum(list_transform(range(bits),
        |    j -> CASE WHEN emb[j + 1] > 0 THEN 1 << j ELSE 0 END))
        |    AS INT) AS bucket
        |  FROM e CROSS JOIN bb),
        |pb AS (SELECT vec_id, emb, nrm,
        |  unnest(list_concat([bucket], list_transform(range(bits),
        |    j -> xor(bucket, CAST(1 << j AS INT))))) AS bucket
        |  FROM n CROSS JOIN bb),
        |p AS (SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
        |    list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) AS sim
        |  FROM pb a JOIN n b ON a.bucket = b.bucket
        |    AND a.vec_id <> b.vec_id),
        |r AS (SELECT vec_id, neighbor_id, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY sim DESC, neighbor_id) AS rn
        |  FROM p),
        |recs AS (SELECT vec_id AS lst, neighbor_id AS item FROM r
        |  WHERE rn <= 5),
        |pop AS (SELECT item, CAST(count(*) AS BIGINT) AS c FROM recs
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS tt,
        |    CAST(count(*) AS BIGINT) AS ni FROM pop),
        |nov AS (SELECT any_value(tt) AS nrec, any_value(ni) AS nd,
        |    sum(CAST(round(c * -log2(CAST(c AS DOUBLE) / tt), 12)
        |      AS DECIMAL(38,12))) AS nv
        |  FROM pop, tot),
        |cat AS (SELECT CAST(count(*) AS BIGINT) AS catn FROM embeddings),
        |pr AS (SELECT ra.lst, ra.item AS ia, rb.item AS ib
        |  FROM recs ra JOIN recs rb
        |    ON ra.lst = rb.lst AND ra.item < rb.item),
        |ps AS (SELECT pr.lst,
        |    list_dot_product(na.emb, nb.emb) / (na.nrm * nb.nrm) AS sim
        |  FROM pr JOIN n na ON pr.ia = na.vec_id
        |    JOIN n nb ON pr.ib = nb.vec_id),
        |lm AS (SELECT lst, CAST(sum(CAST(round(sim, 12)
        |      AS DECIMAL(38,12))) AS DOUBLE) / count(*) AS m
        |  FROM ps GROUP BY 1),
        |ils AS (SELECT CAST(count(*) AS BIGINT) AS nl,
        |    sum(CAST(round(m, 12) AS DECIMAL(38,12))) AS s FROM lm)
        |SELECT ils.nl AS n_lists, nov.nrec AS n_recs,
        |  round(CAST(nov.nd AS DOUBLE) / cat.catn, 6) AS coverage,
        |  round(CAST(nov.nv AS DOUBLE) / nov.nrec, 6) AS novelty,
        |  round(CAST(ils.s AS DOUBLE) / ils.nl, 6) AS ils
        |FROM nov, ils, cat""".stripMargin,

    "q332_ann_h2" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
        |  FROM embeddings),
        |n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm,
        |  CAST(emb[1] > 0 AS INT) * 1 + CAST(emb[2] > 0 AS INT) * 2
        |    + CAST(emb[3] > 0 AS INT) * 4 + CAST(emb[4] > 0 AS INT) * 8
        |    AS bucket
        |  FROM e),
        |pb AS (SELECT vec_id, emb, nrm,
        |  unnest([bucket, xor(bucket, 1), xor(bucket, 2), xor(bucket, 4),
        |          xor(bucket, 8), xor(bucket, 3), xor(bucket, 5),
        |          xor(bucket, 9), xor(bucket, 6), xor(bucket, 10),
        |          xor(bucket, 12)]) AS bucket
        |  FROM n),
        |p AS (SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
        |    list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) AS sim
        |  FROM pb a JOIN n b ON a.bucket = b.bucket
        |    AND a.vec_id <> b.vec_id),
        |r AS (SELECT vec_id, neighbor_id, sim,
        |  row_number() OVER (PARTITION BY vec_id
        |    ORDER BY sim DESC, neighbor_id) AS rn
        |  FROM p)
        |SELECT vec_id, neighbor_id, round(sim, 6) AS sim FROM r
        |WHERE rn <= 3
        |ORDER BY vec_id, neighbor_id""".stripMargin,

    "q333_importance_weights" ->
      """WITH toks AS (SELECT doc_id,
        |  CAST(source IN ('src0', 'src1', 'src2') AS INT) AS tgt,
        |  string_split(text, ' ') AS t FROM documents),
        |bg AS (SELECT doc_id, tgt,
        |  ('0x' || substr(md5(b), 1, 8))::BIGINT % 256 AS k
        |  FROM (SELECT doc_id, tgt,
        |    unnest(list_transform(range(len(t) - 1),
        |      i -> t[i + 1] || ' ' || t[i + 2])) AS b
        |    FROM toks WHERE len(t) >= 2)),
        |db AS (SELECT doc_id, tgt, k, count(*) AS c FROM bg GROUP BY 1, 2, 3),
        |hist AS (SELECT k,
        |  sum(CASE WHEN tgt = 1 THEN c ELSE 0 END) AS ct,
        |  sum(c) AS cr FROM db GROUP BY k),
        |tot AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM hist),
        |lr AS (SELECT k, round(ln((ct + 1)::DOUBLE * (tr + 256) /
        |    ((cr + 1)::DOUBLE * (tt + 256))), 12) AS lr FROM hist, tot),
        |s AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
        |    sum(round(c * lr.lr, 12)::DECIMAL(38,12)) AS s
        |  FROM db JOIN lr USING (k) GROUP BY doc_id)
        |SELECT doc_id, n_bigrams,
        |  round(CAST(s AS DOUBLE) / n_bigrams, 6) + 0.0 AS iw
        |FROM s ORDER BY doc_id""".stripMargin,

    "q334_dsir_gate" ->
      """WITH toks AS (SELECT doc_id,
        |  CAST(source IN ('src0', 'src1', 'src2') AS INT) AS tgt,
        |  string_split(text, ' ') AS t FROM documents),
        |bg AS (SELECT doc_id, tgt,
        |  ('0x' || substr(md5(b), 1, 8))::BIGINT % 256 AS k
        |  FROM (SELECT doc_id, tgt,
        |    unnest(list_transform(range(len(t) - 1),
        |      i -> t[i + 1] || ' ' || t[i + 2])) AS b
        |    FROM toks WHERE len(t) >= 2)),
        |db AS (SELECT doc_id, tgt, k, count(*) AS c FROM bg GROUP BY 1, 2, 3),
        |hist AS (SELECT k,
        |  sum(CASE WHEN tgt = 1 THEN c ELSE 0 END) AS ct,
        |  sum(c) AS cr FROM db GROUP BY k),
        |tot AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM hist),
        |lr AS (SELECT k, round(ln((ct + 1)::DOUBLE * (tr + 256) /
        |    ((cr + 1)::DOUBLE * (tt + 256))), 12) AS lr FROM hist, tot),
        |iw AS (SELECT doc_id, round(CAST(s AS DOUBLE) / n_bigrams, 6) + 0.0 AS iw
        |  FROM (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
        |      sum(round(c * lr.lr, 12)::DECIMAL(38,12)) AS s
        |    FROM db JOIN lr USING (k) GROUP BY doc_id)),
        |sc AS (SELECT iw.doc_id, d.source, iw.iw
        |  FROM iw JOIN documents d ON iw.doc_id = d.doc_id),
        |thr AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  round(quantile_cont(iw, CAST(0.8 AS DOUBLE)), 6) AS thr
        |  FROM sc GROUP BY source),
        |kept AS (SELECT sc.source, CAST(count(*) AS BIGINT) AS n_keep,
        |  CAST(sum(sc.doc_id) AS BIGINT) AS id_sum
        |  FROM sc JOIN thr ON sc.source = thr.source
        |  WHERE sc.iw >= thr.thr GROUP BY sc.source)
        |SELECT thr.source, n_docs, thr,
        |  CAST(coalesce(n_keep, 0) AS BIGINT) AS n_keep,
        |  CAST(coalesce(id_sum, 0) AS BIGINT) AS id_sum
        |FROM thr LEFT JOIN kept ON thr.source = kept.source
        |ORDER BY thr.source""".stripMargin,

    "q335_kcenter" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm
        |  FROM e),
        |c0 AS (SELECT min(vec_id) AS id FROM n),
        |d0 AS (SELECT a.vec_id,
        |    1 - list_dot_product(a.emb, c.emb) / (a.nrm * c.nrm) AS d
        |  FROM n a JOIN n c ON c.vec_id = (SELECT id FROM c0)),
        |p1 AS (SELECT vec_id, d FROM d0
        |  WHERE vec_id <> (SELECT id FROM c0)
        |  ORDER BY d DESC, vec_id LIMIT 1),
        |d1 AS (SELECT a.vec_id,
        |    least(d0.d, 1 - list_dot_product(a.emb, c.emb) / (a.nrm * c.nrm)) AS d
        |  FROM n a JOIN d0 ON a.vec_id = d0.vec_id
        |    JOIN n c ON c.vec_id = (SELECT vec_id FROM p1)),
        |p2 AS (SELECT vec_id, d FROM d1 WHERE vec_id NOT IN
        |    ((SELECT id FROM c0), (SELECT vec_id FROM p1))
        |  ORDER BY d DESC, vec_id LIMIT 1),
        |d2 AS (SELECT a.vec_id,
        |    least(d1.d, 1 - list_dot_product(a.emb, c.emb) / (a.nrm * c.nrm)) AS d
        |  FROM n a JOIN d1 ON a.vec_id = d1.vec_id
        |    JOIN n c ON c.vec_id = (SELECT vec_id FROM p2)),
        |p3 AS (SELECT vec_id, d FROM d2 WHERE vec_id NOT IN
        |    ((SELECT id FROM c0), (SELECT vec_id FROM p1),
        |     (SELECT vec_id FROM p2))
        |  ORDER BY d DESC, vec_id LIMIT 1),
        |d3 AS (SELECT a.vec_id,
        |    least(d2.d, 1 - list_dot_product(a.emb, c.emb) / (a.nrm * c.nrm)) AS d
        |  FROM n a JOIN d2 ON a.vec_id = d2.vec_id
        |    JOIN n c ON c.vec_id = (SELECT vec_id FROM p3)),
        |p4 AS (SELECT vec_id, d FROM d3 WHERE vec_id NOT IN
        |    ((SELECT id FROM c0), (SELECT vec_id FROM p1),
        |     (SELECT vec_id FROM p2), (SELECT vec_id FROM p3))
        |  ORDER BY d DESC, vec_id LIMIT 1),
        |d4 AS (SELECT a.vec_id,
        |    least(d3.d, 1 - list_dot_product(a.emb, c.emb) / (a.nrm * c.nrm)) AS d
        |  FROM n a JOIN d3 ON a.vec_id = d3.vec_id
        |    JOIN n c ON c.vec_id = (SELECT vec_id FROM p4)),
        |p5 AS (SELECT vec_id, d FROM d4 WHERE vec_id NOT IN
        |    ((SELECT id FROM c0), (SELECT vec_id FROM p1),
        |     (SELECT vec_id FROM p2), (SELECT vec_id FROM p3),
        |     (SELECT vec_id FROM p4))
        |  ORDER BY d DESC, vec_id LIMIT 1)
        |SELECT 0 AS sel_round, (SELECT id FROM c0) AS vec_id,
        |  CAST(NULL AS DOUBLE) AS dist
        |UNION ALL SELECT 1, vec_id, round(d, 6) + 0.0 FROM p1
        |UNION ALL SELECT 2, vec_id, round(d, 6) + 0.0 FROM p2
        |UNION ALL SELECT 3, vec_id, round(d, 6) + 0.0 FROM p3
        |UNION ALL SELECT 4, vec_id, round(d, 6) + 0.0 FROM p4
        |UNION ALL SELECT 5, vec_id, round(d, 6) + 0.0 FROM p5
        |ORDER BY sel_round""".stripMargin,

    "q336_gopher_rules" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
        |    CAST(length(text) - (len(string_split(text, ' ')) - 1) AS BIGINT)
        |      AS ch
        |  FROM documents),
        |dw AS (SELECT doc_id, w, count(*) AS c FROM
        |    (SELECT doc_id, unnest(tk) AS w FROM t) GROUP BY doc_id, w),
        |ds AS (SELECT doc_id, max(c) AS maxc, count(*) AS ndw,
        |    sum(CASE WHEN w IN ('the', 'a') THEN c ELSE 0 END) AS nstop
        |  FROM dw GROUP BY doc_id),
        |per AS (SELECT
        |    CAST(t.n < 30 OR t.n > 80 AS BIGINT) AS f1,
        |    CAST(t.ch * 2 < t.n * 7 OR t.ch * 2 > t.n * 12 AS BIGINT) AS f2,
        |    CAST(ds.maxc * 5 > t.n AS BIGINT) AS f3,
        |    CAST(ds.nstop = 0 AS BIGINT) AS f4,
        |    CAST(ds.ndw * 5 < t.n * 2 AS BIGINT) AS f5
        |  FROM t JOIN ds USING (doc_id)),
        |ag AS (SELECT CAST(count(*) AS BIGINT) AS nd,
        |    sum(f1) AS s1, sum(f2) AS s2, sum(f3) AS s3, sum(f4) AS s4,
        |    sum(f5) AS s5,
        |    sum(CAST(f1 + f2 + f3 + f4 + f5 > 0 AS BIGINT)) AS sa
        |  FROM per)
        |SELECT rule, CAST(n AS BIGINT) AS n_docs,
        |  round(CAST(n AS DOUBLE) / nd, 6) AS rate
        |FROM (
        |  SELECT 'r1_word_count' AS rule, s1 AS n, nd FROM ag
        |  UNION ALL SELECT 'r2_mean_word_len', s2, nd FROM ag
        |  UNION ALL SELECT 'r3_top_word_share', s3, nd FROM ag
        |  UNION ALL SELECT 'r4_has_stopword', s4, nd FROM ag
        |  UNION ALL SELECT 'r5_distinct_ratio', s5, nd FROM ag
        |  UNION ALL SELECT 'all_pass', nd - sa, nd FROM ag)
        |ORDER BY rule""".stripMargin,

    "q337_hard_negatives" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb
        |  FROM embeddings),
        |n AS (SELECT vec_id, label, emb,
        |  sqrt(list_dot_product(emb, emb)) AS nrm,
        |  CAST(emb[1] > 0 AS INT) * 1 + CAST(emb[2] > 0 AS INT) * 2
        |    + CAST(emb[3] > 0 AS INT) * 4 + CAST(emb[4] > 0 AS INT) * 8
        |    AS bucket
        |  FROM e),
        |pb AS (SELECT vec_id, label, emb, nrm,
        |  unnest([bucket, xor(bucket, 1), xor(bucket, 2), xor(bucket, 4),
        |          xor(bucket, 8)]) AS bucket
        |  FROM n),
        |p AS (SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
        |    list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) AS sim
        |  FROM pb a JOIN n b ON a.bucket = b.bucket
        |    AND a.vec_id <> b.vec_id AND a.label <> b.label),
        |r AS (SELECT vec_id, neighbor_id, sim,
        |  row_number() OVER (PARTITION BY vec_id
        |    ORDER BY sim DESC, neighbor_id) AS rn
        |  FROM p)
        |SELECT vec_id, neighbor_id, round(sim, 6) AS sim FROM r
        |WHERE rn <= 3
        |ORDER BY vec_id, neighbor_id""".stripMargin,

    "q338_lsh_advisor" -> {
      val slices = (0 until 8)
        .map(i => s"min(substr(md5(s), ${i * 4 + 1}, 4)) AS m$i")
        .mkString(", ")
      val cfgs = Seq((1, 8), (2, 4), (4, 2), (8, 1))
      val longSel = cfgs.flatMap { case (b, r) =>
        (0 until b).map { bi =>
          val key = (bi * r until bi * r + r).map(i => s"m$i")
            .mkString(" || '|' || ")
          s"SELECT $b AS bands, $bi AS band, $key AS key FROM sig8"
        }
      }.mkString("\n  UNION ALL ")
      s"""WITH $shinglesCte,
         |sig8 AS (SELECT doc_id, $slices FROM sh GROUP BY doc_id),
         |lng AS (
         |  $longSel),
         |stats AS (SELECT bands, CAST(count(*) AS BIGINT) AS n_buckets,
         |    CAST(sum((n * (n - 1)) // 2) AS BIGINT) AS est_pairs
         |  FROM (SELECT bands, band, key, count(*) AS n FROM lng
         |        GROUP BY bands, band, key)
         |  GROUP BY bands),
         |curve AS (SELECT * FROM (VALUES
         |  (1, 8), (2, 4), (4, 2), (8, 1)) c(bands, rows_per_band))
         |SELECT c.bands, c.rows_per_band,
         |  round(power(1.0 / c.bands, 1.0 / c.rows_per_band), 6) AS s_curve,
         |  round(1.0 - power(1.0 - power(0.5, c.rows_per_band), c.bands), 6)
         |    AS p_at_target,
         |  coalesce(n_buckets, 0) AS n_buckets,
         |  coalesce(est_pairs, 0) AS est_pairs
         |FROM curve c LEFT JOIN stats ON c.bands = stats.bands
         |ORDER BY c.bands""".stripMargin
    },

    "q339_dedup_threshold_sweep" ->
      s"""WITH $shinglesCte,
         |szs AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |${minhashSig(4, 2)},
         |cand AS (${minhashPairs(4, 2)}),
         |com AS (SELECT c.doc_a, c.doc_b, count(*) AS c
         |  FROM cand c
         |  JOIN sh x ON x.doc_id = c.doc_a
         |  JOIN sh y ON y.doc_id = c.doc_b AND y.s = x.s
         |  GROUP BY c.doc_a, c.doc_b),
         |jac AS (SELECT com.doc_a, com.doc_b,
         |  round(CAST(com.c AS DOUBLE) / (sa.n + sb.n - com.c), 6) AS jaccard
         |  FROM com
         |  JOIN szs sa ON sa.doc_id = com.doc_a
         |  JOIN szs sb ON sb.doc_id = com.doc_b),
         |grid AS (SELECT unnest(range(10)) AS tidx),
         |f AS (SELECT g.tidx, j.doc_a, j.doc_b FROM grid g
         |  JOIN jac j ON j.jaccard >= g.tidx / 10.0),
         |p AS (SELECT tidx, CAST(count(*) AS BIGINT) AS n_pairs
         |  FROM f GROUP BY tidx),
         |d AS (SELECT tidx, CAST(count(DISTINCT doc) AS BIGINT) AS n_docs
         |  FROM (SELECT tidx, doc_a AS doc FROM f
         |        UNION ALL SELECT tidx, doc_b FROM f) GROUP BY tidx)
         |SELECT CAST(g.tidx AS BIGINT) AS tidx,
         |  round(g.tidx / 10.0, 1) AS threshold,
         |  coalesce(n_pairs, 0) AS n_pairs,
         |  coalesce(n_docs, 0) AS n_docs
         |FROM grid g LEFT JOIN p ON g.tidx = p.tidx
         |  LEFT JOIN d ON g.tidx = d.tidx
         |ORDER BY tidx""".stripMargin,

    "q340_ivf_advisor" -> {
      val perB = (1 to 6).map { b =>
        val cell = (0 until b)
          .map(j => s"CAST(emb[${j + 1}] > 0 AS INT) * ${1 << j}")
          .mkString(" + ")
        s"SELECT $b AS sign_bits, $cell AS cell FROM e"
      }.mkString("\n  UNION ALL ")
      s"""WITH e AS (SELECT embedding::DOUBLE[] AS emb FROM embeddings),
         |lng AS (
         |  $perB),
         |cells AS (SELECT sign_bits, cell, count(*) AS n FROM lng
         |  GROUP BY sign_bits, cell)
         |SELECT sign_bits, CAST(count(*) AS BIGINT) AS n_cells,
         |  CAST(max(n) AS BIGINT) AS max_cell,
         |  CAST(sum((n * (n - 1)) // 2) AS BIGINT) AS est_pairs
         |FROM cells GROUP BY sign_bits ORDER BY sign_bits""".stripMargin
    },

    "q341_gopher_flags" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
        |    CAST(length(text) - (len(string_split(text, ' ')) - 1) AS BIGINT)
        |      AS ch
        |  FROM documents),
        |m AS (SELECT doc_id, n, ch,
        |  CAST(list_aggregate(list_transform(list_distinct(tk),
        |    w -> len(list_filter(tk, x -> x = w))), 'max') AS BIGINT)
        |    AS maxc,
        |  CAST(len(list_distinct(tk)) AS BIGINT) AS nd,
        |  CAST(len(list_filter(tk, x -> list_contains(['the', 'a'], x)))
        |    AS BIGINT) AS nstop
        |  FROM t)
        |SELECT doc_id,
        |  CAST(n < 30 OR n > 80 AS BIGINT) AS f_word_count,
        |  CAST(ch * 2 < n * 7 OR ch * 2 > n * 12 AS BIGINT)
        |    AS f_mean_word_len,
        |  CAST(maxc * 5 > n AS BIGINT) AS f_top_word_share,
        |  CAST(nstop = 0 AS BIGINT) AS f_no_stopword,
        |  CAST(nd * 5 < n * 2 AS BIGINT) AS f_distinct_ratio
        |FROM m ORDER BY doc_id""".stripMargin,

    "q342_packing_advisor" ->
      """WITH t AS (SELECT source, doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |  FROM documents),
        |c AS (SELECT source, n,
        |  coalesce(sum(n) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS bfr
        |  FROM t),
        |l AS (SELECT CAST(b.budget AS BIGINT) AS budget, c.source, c.n,
        |    c.bfr // b.budget AS bin
        |  FROM c CROSS JOIN
        |    (SELECT unnest([512, 1024, 2048, 4096]) AS budget) b),
        |g AS (SELECT budget, source, bin, count(*) AS nd, sum(n) AS nt
        |  FROM l GROUP BY budget, source, bin)
        |SELECT budget, CAST(count(*) AS BIGINT) AS n_bins,
        |  CAST(sum(nd) AS BIGINT) AS n_docs,
        |  CAST(sum(nt) AS BIGINT) AS n_tokens,
        |  round(CAST(sum(nt) AS DOUBLE) / (count(*) * budget), 6)
        |    AS fill_rate
        |FROM g GROUP BY budget ORDER BY budget""".stripMargin,

    "q343_label_agreement" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb
        |  FROM embeddings),
        |n AS (SELECT vec_id, label, emb,
        |  sqrt(list_dot_product(emb, emb)) AS nrm,
        |  CAST(emb[1] > 0 AS INT) * 1 + CAST(emb[2] > 0 AS INT) * 2
        |    + CAST(emb[3] > 0 AS INT) * 4 + CAST(emb[4] > 0 AS INT) * 8
        |    AS bucket
        |  FROM e),
        |pb AS (SELECT vec_id, label, emb, nrm,
        |  unnest([bucket, xor(bucket, 1), xor(bucket, 2), xor(bucket, 4),
        |          xor(bucket, 8)]) AS bucket
        |  FROM n),
        |p AS (SELECT a.vec_id AS vec_id, a.label AS al,
        |    b.vec_id AS neighbor_id, b.label AS bl,
        |    list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) AS sim
        |  FROM pb a JOIN n b ON a.bucket = b.bucket
        |    AND a.vec_id <> b.vec_id),
        |r AS (SELECT vec_id, al, bl,
        |  row_number() OVER (PARTITION BY vec_id
        |    ORDER BY sim DESC, neighbor_id) AS rn
        |  FROM p)
        |SELECT vec_id, al AS label,
        |  CAST(count(*) AS BIGINT) AS n_neighbors,
        |  CAST(sum(CASE WHEN al = bl THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_same,
        |  round(CAST(sum(CASE WHEN al = bl THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS agreement
        |FROM r WHERE rn <= 5
        |GROUP BY vec_id, al ORDER BY vec_id""".stripMargin,

    "q344_corpus_datasheet" ->
      """WITH t AS (SELECT source, doc_id, text, lang,
        |    string_split(text, ' ') AS tk,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
        |    CAST(length(text) - (len(string_split(text, ' ')) - 1) AS BIGINT)
        |      AS ch
        |  FROM documents),
        |m AS (SELECT source, lang, text, n,
        |  CAST(list_aggregate(list_transform(list_distinct(tk),
        |    w -> len(list_filter(tk, x -> x = w))), 'max') AS BIGINT)
        |    AS maxc,
        |  CAST(len(list_distinct(tk)) AS BIGINT) AS nd,
        |  CAST(len(list_filter(tk, x -> list_contains(['the', 'a'], x)))
        |    AS BIGINT) AS nstop, ch
        |  FROM t),
        |p AS (SELECT source, lang, text, n,
        |  CAST((n >= 30 AND n <= 80) AND (ch * 2 >= n * 7 AND ch * 2 <= n * 12)
        |    AND maxc * 5 <= n AND nstop > 0 AND nd * 5 >= n * 2 AS BIGINT)
        |    AS pass
        |  FROM m),
        |dup AS (SELECT source,
        |  CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
        |    AS n_dup_docs
        |  FROM (SELECT source, md5(text) AS h, count(*) AS c FROM t
        |        GROUP BY source, md5(text))
        |  GROUP BY source),
        |agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n) AS BIGINT) AS n_tokens,
        |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
        |  CAST((sum(n) * 200 + count(*)) // (2 * count(*)) AS DOUBLE) / 100
        |    AS mean_tokens,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(sum(pass) AS BIGINT) AS n_pass
        |  FROM p GROUP BY source)
        |SELECT agg.source, n_docs, n_tokens, n_chars, mean_tokens, n_langs,
        |  n_dup_docs,
        |  round(CAST(n_dup_docs AS DOUBLE) / n_docs, 6) AS dup_rate,
        |  round(CAST(n_pass AS DOUBLE) / n_docs, 6) AS gopher_pass_rate
        |FROM agg JOIN dup ON agg.source = dup.source
        |ORDER BY agg.source""".stripMargin,

    "q345_trigram_backoff" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |occ AS (SELECT doc_id, unnest(list_transform(range(len(t) - 2),
        |    i -> {'w1': t[i + 1], 'w2': t[i + 2], 'w3': t[i + 3]})) AS g
        |  FROM toks WHERE len(t) >= 3),
        |o AS (SELECT doc_id, g.w1 AS w1, g.w2 AS w2, g.w3 AS w3 FROM occ),
        |tr AS (SELECT * FROM o WHERE doc_id % 2 = 0),
        |c3 AS (SELECT w1, w2, w3, count(*) AS m3 FROM tr GROUP BY 1, 2, 3),
        |n3 AS (SELECT w1, w2, count(*) AS k3 FROM tr GROUP BY 1, 2),
        |c2 AS (SELECT w2, w3, count(*) AS m2 FROM tr GROUP BY 1, 2),
        |n2 AS (SELECT w2, count(*) AS k2 FROM tr GROUP BY 1),
        |c1 AS (SELECT w3, count(*) AS m1 FROM tr GROUP BY 1),
        |tot AS (SELECT count(*) AS nn, count(DISTINCT w3) AS vv FROM tr),
        |sc AS (SELECT doc_id, round(ln(CASE
        |    WHEN m3 IS NOT NULL THEN CAST(m3 AS DOUBLE) / k3
        |    WHEN m2 IS NOT NULL THEN 0.4 * (CAST(m2 AS DOUBLE) / k2)
        |    ELSE 0.16 * (CAST(coalesce(m1, 0) + 1 AS DOUBLE)
        |      / CAST(nn + vv AS DOUBLE))
        |  END), 12)::DECIMAL(38,12) AS lp
        |  FROM o LEFT JOIN c3 USING (w1, w2, w3)
        |    LEFT JOIN n3 USING (w1, w2)
        |    LEFT JOIN c2 USING (w2, w3) LEFT JOIN n2 USING (w2)
        |    LEFT JOIN c1 USING (w3) CROSS JOIN tot)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pos,
        |  round(-(CAST(sum(lp) AS DOUBLE)) / count(*), 6) + 0.0 AS xent
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q346_semdedup" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm,
        |  CAST(emb[1] > 0 AS INT) * 1 + CAST(emb[2] > 0 AS INT) * 2
        |    + CAST(emb[3] > 0 AS INT) * 4 + CAST(emb[4] > 0 AS INT) * 8 AS bucket
        |  FROM e),
        |dv AS (SELECT bucket, unnest(list_transform(range(len(emb)),
        |    i -> {'dim': i, 'v': emb[i + 1]})) AS s FROM n),
        |cd AS (SELECT bucket, s.dim AS dim, round(avg(s.v), 6) AS c
        |  FROM dv GROUP BY bucket, s.dim),
        |cent AS (SELECT bucket, list(c ORDER BY dim) AS cent
        |  FROM cd GROUP BY bucket),
        |j AS (SELECT vec_id, n.bucket AS bucket, emb, nrm,
        |  list_dot_product(emb, cent)
        |    / (nrm * sqrt(list_dot_product(cent, cent))) AS s2c
        |  FROM n JOIN cent ON n.bucket = cent.bucket),
        |dup AS (SELECT DISTINCT a.vec_id FROM j a JOIN j b
        |  ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
        |  WHERE list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm)
        |      > CAST(0.3 AS DOUBLE)
        |    AND (b.s2c < a.s2c OR (b.s2c = a.s2c AND b.vec_id < a.vec_id)))
        |SELECT j.vec_id, CAST(j.bucket AS INT) AS bucket,
        |  round(s2c, 6) + 0.0 AS sim_centroid,
        |  CAST(CASE WHEN dup.vec_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
        |    AS is_dup
        |FROM j LEFT JOIN dup ON j.vec_id = dup.vec_id
        |ORDER BY j.vec_id""".stripMargin,

    "q347_davies_bouldin" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb,
        |  CAST(label AS BIGINT) AS lbl FROM embeddings),
        |dv AS (SELECT lbl, unnest(list_transform(range(len(emb)),
        |    i -> {'dim': i, 'v': emb[i + 1]})) AS s FROM e),
        |cd AS (SELECT lbl, s.dim AS dim, round(avg(s.v), 6) AS c
        |  FROM dv GROUP BY lbl, s.dim),
        |cent AS (SELECT lbl, list(c ORDER BY dim) AS cent FROM cd GROUP BY lbl),
        |scat AS (SELECT e.lbl AS lbl, CAST(count(*) AS BIGINT) AS n_vecs,
        |  round(avg(sqrt(list_dot_product(
        |    list_transform(range(len(emb)), i -> emb[i + 1] - cent[i + 1]),
        |    list_transform(range(len(emb)), i -> emb[i + 1] - cent[i + 1])
        |  ))), 6) AS s
        |  FROM e JOIN cent ON e.lbl = cent.lbl GROUP BY e.lbl),
        |pair AS (SELECT a.lbl AS li, b.lbl AS lj,
        |  sqrt(list_dot_product(
        |    list_transform(range(len(a.cent)), i -> a.cent[i + 1] - b.cent[i + 1]),
        |    list_transform(range(len(a.cent)), i -> a.cent[i + 1] - b.cent[i + 1])
        |  )) AS m
        |  FROM cent a, cent b WHERE a.lbl <> b.lbl),
        |r AS (SELECT li, round(max((si.s + sj.s) / m), 6) AS r_max
        |  FROM pair JOIN scat si ON pair.li = si.lbl
        |    JOIN scat sj ON pair.lj = sj.lbl
        |  WHERE m > 0 GROUP BY li)
        |SELECT scat.lbl AS label, n_vecs, scat.s AS scatter, r.r_max
        |FROM scat LEFT JOIN r ON scat.lbl = r.li
        |ORDER BY label""".stripMargin,

    "q348_epoch_capped_mix" ->
      """WITH t AS (SELECT source,
        |  CAST(sum(CAST(ceil(length(text) / 4.0) AS BIGINT)) AS BIGINT)
        |    AS tokens
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS tt FROM t),
        |base AS (SELECT source, tokens,
        |  CAST((12 * tt) // 10 AS BIGINT) AS budget,
        |  round(pow(CAST(tokens AS DOUBLE), 0.5), 6)::DECIMAL(28,6) AS w
        |  FROM t CROSS JOIN tot),
        |sw AS (SELECT sum(w) AS swv FROM base),
        |g1 AS (SELECT source, tokens, budget, w,
        |  CAST(budget AS DOUBLE) * (CAST(w AS DOUBLE) / CAST(swv AS DOUBLE))
        |    AS want,
        |  1.25 * CAST(tokens AS DOUBLE) AS cap
        |  FROM base CROSS JOIN sw),
        |g2 AS (SELECT *, (want > cap) AS capped,
        |  CASE WHEN want > cap THEN cap ELSE want END AS g FROM g1),
        |agg2 AS (SELECT sum(round(g, 6)::DECIMAL(38,6)) AS sg,
        |  sum(CASE WHEN NOT capped THEN w ELSE 0::DECIMAL(28,6) END) AS swu
        |  FROM g2),
        |fin AS (SELECT source, tokens, w, capped,
        |  CASE WHEN capped THEN cap
        |       WHEN swu > 0 THEN least(cap, want
        |         + (CAST(w AS DOUBLE) / CAST(swu AS DOUBLE))
        |           * greatest(CAST(budget AS DOUBLE) - CAST(sg AS DOUBLE),
        |                      0.0))
        |       ELSE g END AS f
        |  FROM g2 CROSS JOIN agg2)
        |SELECT source, tokens, CAST(w AS DOUBLE) AS weight,
        |  CAST(CAST(round(f * 100, 0) AS HUGEINT) AS DOUBLE) / 100
        |    AS alloc_tokens,
        |  CAST((CAST(round(f * 100, 0) AS HUGEINT) * 200 + tokens)
        |    // (2 * tokens) AS DOUBLE) / 10000 AS epochs_used,
        |  CAST(capped AS BIGINT) AS capped
        |FROM fin ORDER BY source""".stripMargin,

    "q349_token_fertility" ->
      """WITH d AS (SELECT lang,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
        |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS b,
        |  CAST(strlen(text) AS BIGINT) AS c FROM documents),
        |a AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(w) AS BIGINT) AS words,
        |  CAST(sum(b) AS BIGINT) AS bpe_tokens,
        |  CAST(sum(c) AS BIGINT) AS bytes FROM d GROUP BY lang)
        |SELECT lang, n_docs, words, bpe_tokens, bytes,
        |  CAST((CAST(bpe_tokens AS HUGEINT) * 2000000 + words)
        |    // (2 * words) AS DOUBLE) / 1000000 AS fertility,
        |  CAST((CAST(bytes AS HUGEINT) * 2000000 + bpe_tokens)
        |    // (2 * bpe_tokens) AS DOUBLE) / 1000000 AS bytes_per_token,
        |  CAST((CAST(bytes AS HUGEINT) * 2000000 + words)
        |    // (2 * words) AS DOUBLE) / 1000000 AS chars_per_word
        |FROM a ORDER BY lang""".stripMargin,

    "q350_contamination_spans" ->
      """WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t
        |  FROM documents),
        |sh AS (SELECT doc_id, source, unnest(list_transform(range(len(t) - 2),
        |    i -> {'p': i,
        |          's': t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3]})) AS g
        |  FROM toks WHERE len(t) >= 3),
        |ss AS (SELECT doc_id, source, g.p AS pos, g.s AS s FROM sh),
        |bench AS (SELECT DISTINCT s FROM ss WHERE source = 'src0'),
        |rest AS (SELECT doc_id, pos, s FROM ss WHERE source <> 'src0'),
        |m AS (SELECT doc_id, pos FROM rest
        |  WHERE s IN (SELECT s FROM bench)),
        |isl AS (SELECT doc_id,
        |  pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
        |  FROM m),
        |rg AS (SELECT doc_id, isl, count(*) AS r FROM isl GROUP BY doc_id, isl),
        |agg AS (SELECT doc_id, CAST(sum(r) AS BIGINT) AS n_matched,
        |  CAST(max(r) AS BIGINT) AS longest_run FROM rg GROUP BY doc_id),
        |np AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pos
        |  FROM rest GROUP BY doc_id)
        |SELECT np.doc_id, n_pos,
        |  coalesce(n_matched, 0) AS n_matched,
        |  coalesce(longest_run, 0) AS longest_run,
        |  CAST((coalesce(n_matched, 0) * 2000000 + n_pos) // (2 * n_pos)
        |    AS DOUBLE) / 1000000 AS contamination
        |FROM np LEFT JOIN agg ON np.doc_id = agg.doc_id
        |ORDER BY np.doc_id""".stripMargin,

    "q351_ccnet_buckets" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bg AS (SELECT doc_id, unnest(list_transform(range(len(t) - 1),
        |    i -> {'w1': t[i + 1], 'w2': t[i + 2]})) AS b
        |  FROM toks WHERE len(t) >= 2),
        |bb AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg),
        |c2 AS (SELECT w1, w2, count(*) AS c12 FROM bb GROUP BY w1, w2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM bb GROUP BY w1),
        |ce AS (SELECT bb.doc_id,
        |  round(-avg(ln(CAST(c12 AS DOUBLE) / c1)), 6) AS xe
        |  FROM bb JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
        |  GROUP BY bb.doc_id),
        |l AS (SELECT ce.doc_id, xe, lang,
        |  ntile(3) OVER (PARTITION BY lang ORDER BY xe, ce.doc_id) AS tercile
        |  FROM ce JOIN documents USING (doc_id))
        |SELECT lang, CAST(tercile AS INT) AS tercile,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  min(xe) AS min_xent, max(xe) AS max_xent,
        |  CAST((sum(CAST(round(xe * 1000000, 0) AS HUGEINT)) * 2 + count(*))
        |    // (2 * count(*)) AS DOUBLE) / 1000000 AS mean_xent
        |FROM l GROUP BY lang, tercile ORDER BY lang, tercile""".stripMargin,

    "q352_shard_plan" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS tokens
        |  FROM documents),
        |r AS (SELECT tokens,
        |  row_number() OVER (ORDER BY tokens DESC, doc_id) - 1 AS idx
        |  FROM t),
        |sa AS (SELECT tokens, CASE WHEN (idx // 8) % 2 = 0 THEN idx % 8
        |    ELSE 7 - (idx % 8) END AS shard FROM r),
        |a AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(tokens) AS BIGINT) AS tokens FROM sa GROUP BY shard),
        |tt AS (SELECT sum(tokens) AS tt FROM a)
        |SELECT CAST(shard AS INT) AS shard, n_docs, tokens,
        |  CAST((tokens * 2000000 + tt) // (2 * tt) AS BIGINT)
        |    AS share_ppm
        |FROM a CROSS JOIN tt ORDER BY shard""".stripMargin,

    "q353_freq_spectrum" ->
      """WITH tok AS (SELECT source, unnest(string_split(text, ' '))
        |    AS token FROM documents),
        |c AS (SELECT source, token, count(*) AS c
        |  FROM tok GROUP BY 1, 2)
        |SELECT source, CAST(length(bin(c)) - 1 AS INT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_types,
        |  CAST(sum(c) AS BIGINT) AS n_tokens
        |FROM c GROUP BY 1, 2 ORDER BY source, bucket""".stripMargin,

    "q354_moore_lewis" ->
      """WITH toks AS (SELECT doc_id, source = 'src0' AS ind,
        |    string_split(text, ' ') AS t FROM documents),
        |og AS (SELECT doc_id, ind, unnest(list_transform(range(len(t) - 1),
        |    i -> {'w1': t[i + 1], 'w2': t[i + 2]})) AS b
        |  FROM toks WHERE len(t) >= 2),
        |o AS (SELECT doc_id, ind, b.w1 AS w1, b.w2 AS w2 FROM og),
        |i2 AS (SELECT w1, w2, count(*) AS i12 FROM o WHERE ind
        |  GROUP BY 1, 2),
        |i1 AS (SELECT w1, count(*) AS i1 FROM o WHERE ind GROUP BY 1),
        |g2 AS (SELECT w1, w2, count(*) AS g12 FROM o GROUP BY 1, 2),
        |g1 AS (SELECT w1, count(*) AS g1 FROM o GROUP BY 1),
        |v AS (SELECT count(DISTINCT w2) AS vv FROM o),
        |sc AS (SELECT doc_id,
        |  round(ln(CAST(coalesce(i12, 0) + 1 AS DOUBLE)
        |      / CAST(coalesce(i1, 0) + vv AS DOUBLE))
        |    - ln(CAST(g12 + 1 AS DOUBLE) / CAST(g1 + vv AS DOUBLE)),
        |    12)::DECIMAL(38,12) AS ld
        |  FROM o LEFT JOIN i2 USING (w1, w2) LEFT JOIN i1 USING (w1)
        |    JOIN g2 USING (w1, w2) JOIN g1 USING (w1) CROSS JOIN v),
        |ag AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pos,
        |  round(CAST(sum(ld) AS DOUBLE) / count(*), 6) + 0.0 AS score
        |  FROM sc GROUP BY doc_id)
        |SELECT doc_id, n_pos, score,
        |  CAST(score > 0 AS BIGINT) AS selected
        |FROM ag ORDER BY doc_id""".stripMargin,

    "q355_silhouette" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb,
        |  CAST(label AS BIGINT) AS lbl FROM embeddings),
        |dv AS (SELECT lbl, unnest(list_transform(range(len(emb)),
        |    i -> {'dim': i, 'v': emb[i + 1]})) AS s FROM e),
        |cd AS (SELECT lbl, s.dim AS dim, round(avg(s.v), 6) AS c
        |  FROM dv GROUP BY lbl, s.dim),
        |cent AS (SELECT lbl AS cl, list(c ORDER BY dim) AS cent
        |  FROM cd GROUP BY lbl),
        |d AS (SELECT vec_id, lbl, cl,
        |  sqrt(list_dot_product(
        |    list_transform(range(len(emb)), i -> emb[i + 1] - cent[i + 1]),
        |    list_transform(range(len(emb)), i -> emb[i + 1] - cent[i + 1])
        |  )) AS dd
        |  FROM e CROSS JOIN cent),
        |ab AS (SELECT vec_id, lbl,
        |  min(CASE WHEN lbl = cl THEN dd END) AS a,
        |  min(CASE WHEN lbl <> cl THEN dd END) AS b
        |  FROM d GROUP BY vec_id, lbl),
        |s AS (SELECT vec_id, lbl,
        |  CASE WHEN b IS NULL OR greatest(a, b) = 0 THEN 0.0
        |       ELSE (b - a) / greatest(a, b) END AS sv
        |  FROM ab)
        |SELECT lbl AS label, CAST(count(*) AS BIGINT) AS n_vecs,
        |  round(CAST(sum(round(sv, 12)::DECIMAL(38,12)) AS DOUBLE)
        |    / count(*), 6) + 0.0 AS mean_sil,
        |  round(min(sv), 6) + 0.0 AS min_sil,
        |  round(max(sv), 6) + 0.0 AS max_sil
        |FROM s GROUP BY lbl ORDER BY label""".stripMargin,

    "q356_knn_outlier" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
        |  FROM embeddings),
        |n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm,
        |  CAST(emb[1] > 0 AS INT) * 1 + CAST(emb[2] > 0 AS INT) * 2
        |    + CAST(emb[3] > 0 AS INT) * 4 + CAST(emb[4] > 0 AS INT) * 8
        |    AS bucket
        |  FROM e),
        |pb AS (SELECT vec_id, emb, nrm,
        |  unnest([bucket, xor(bucket, 1), xor(bucket, 2), xor(bucket, 4),
        |          xor(bucket, 8)]) AS bucket
        |  FROM n),
        |p AS (SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
        |    list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) AS sim
        |  FROM pb a JOIN n b ON a.bucket = b.bucket
        |    AND a.vec_id <> b.vec_id),
        |r AS (SELECT vec_id, sim,
        |  row_number() OVER (PARTITION BY vec_id
        |    ORDER BY sim DESC, neighbor_id) AS rn
        |  FROM p),
        |kd AS (SELECT vec_id, CAST(count(*) AS BIGINT) AS n_cand,
        |  round(1.0 - min(round(sim, 6)), 6) + 0.0 AS kth_dist
        |  FROM r WHERE rn <= 5 GROUP BY vec_id)
        |SELECT e.vec_id, coalesce(n_cand, 0) AS n_cand, kth_dist,
        |  CAST(coalesce(n_cand, 0) < 5 OR kth_dist > 0.7 AS BIGINT)
        |    AS is_outlier
        |FROM e LEFT JOIN kd ON e.vec_id = kd.vec_id
        |ORDER BY e.vec_id""".stripMargin,

    "q357_yield_funnel" ->
      """WITH t AS (SELECT source, doc_id, text, lang,
        |    string_split(text, ' ') AS tk FROM documents),
        |m AS (SELECT source, doc_id, text, lang,
        |  CAST(len(tk) AS BIGINT) AS n,
        |  CAST(length(text) - (len(tk) - 1) AS BIGINT) AS ch,
        |  CAST(list_aggregate(list_transform(list_distinct(tk),
        |    w -> len(list_filter(tk, x -> x = w))), 'max') AS BIGINT)
        |    AS maxc,
        |  CAST(len(list_distinct(tk)) AS BIGINT) AS nd,
        |  CAST(len(list_filter(tk, x -> list_contains(['the', 'a'], x)))
        |    AS BIGINT) AS nstop
        |  FROM t),
        |f AS (SELECT source, doc_id, n AS tok, md5(text) AS h,
        |  list_contains(['en', 'de', 'es'], lang) AS g1,
        |  (list_contains(['en', 'de', 'es'], lang)
        |    AND (n >= 30 AND n <= 80)
        |    AND (ch * 2 >= n * 7 AND ch * 2 <= n * 12) AND maxc * 5 <= n
        |    AND nstop > 0 AND nd * 5 >= n * 2) AS g2
        |  FROM m),
        |k AS (SELECT h, min(doc_id) AS mid FROM f WHERE g2 GROUP BY h)
        |SELECT source,
        |  CAST(count(*) AS BIGINT) AS n_raw,
        |  CAST(sum(tok) AS BIGINT) AS tok_raw,
        |  CAST(sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS n_lang,
        |  CAST(sum(CASE WHEN g1 THEN tok ELSE 0 END) AS BIGINT)
        |    AS tok_lang,
        |  CAST(sum(CASE WHEN g2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_quality,
        |  CAST(sum(CASE WHEN g2 THEN tok ELSE 0 END) AS BIGINT)
        |    AS tok_quality,
        |  CAST(sum(CASE WHEN g2 AND doc_id = mid THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_dedup,
        |  CAST(sum(CASE WHEN g2 AND doc_id = mid THEN tok ELSE 0 END)
        |    AS BIGINT) AS tok_dedup
        |FROM f LEFT JOIN k USING (h) GROUP BY source
        |ORDER BY source""".stripMargin,

    "q358_pair_qa" ->
      s"""WITH $shinglesCte,
         |szs AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |${minhashSig(4, 2)},
         |cand AS (${minhashPairs(4, 2)}),
         |com AS (SELECT c.doc_a, c.doc_b, count(*) AS c
         |  FROM cand c
         |  JOIN sh x ON x.doc_id = c.doc_a
         |  JOIN sh y ON y.doc_id = c.doc_b AND y.s = x.s
         |  GROUP BY c.doc_a, c.doc_b),
         |pq AS (SELECT com.c AS c, sa.n + sb.n - com.c AS u,
         |    least(sa.n, sb.n) AS mn, greatest(sa.n, sb.n) AS mx
         |  FROM com
         |  JOIN szs sa ON sa.doc_id = com.doc_a
         |  JOIN szs sb ON sb.doc_id = com.doc_b),
         |b AS (SELECT CAST(least(9, (c * 10) // u) AS INT) AS decile,
         |    (c * 2000000 + u) // (2 * u) AS jppm,
         |    (c * 2000000 + mn) // (2 * mn) AS cppm,
         |    (mn * 2000000 + mx) // (2 * mx) AS rppm
         |  FROM pq)
         |SELECT decile, CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST((sum(jppm) * 2 + count(*)) // (2 * count(*)) AS DOUBLE)
         |    / 1000000 AS mean_jaccard,
         |  CAST((sum(cppm) * 2 + count(*)) // (2 * count(*)) AS DOUBLE)
         |    / 1000000 AS mean_containment,
         |  CAST((sum(rppm) * 2 + count(*)) // (2 * count(*)) AS DOUBLE)
         |    / 1000000 AS mean_size_ratio
         |FROM b GROUP BY decile ORDER BY decile""".stripMargin,

    "q359_dup_flow" ->
      """WITH t AS (SELECT source AS s, string_split(text, ' ') AS t
        |  FROM documents),
        |u AS (SELECT s, md5(array_to_string(
        |    t[i * 20 + 1 : i * 20 + 20], ' ')) AS h
        |  FROM t, unnest(range((len(t) - 1) // 20 + 1)) AS g(i)),
        |d AS (SELECT h, s, count(*) AS c FROM u GROUP BY 1, 2),
        |dup AS (SELECT h, s, c FROM
        |  (SELECT h, s, c, sum(c) OVER (PARTITION BY h) AS tc FROM d)
        |  WHERE tc > 1)
        |SELECT a.s AS source_a, b.s AS source_b,
        |  CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(sum(CASE WHEN a.s = b.s THEN (a.c * (a.c - 1)) // 2
        |    ELSE a.c * b.c END) AS BIGINT) AS n_unit_pairs
        |FROM dup a JOIN dup b ON a.h = b.h AND a.s <= b.s
        |WHERE a.s <> b.s OR a.c >= 2
        |GROUP BY a.s, b.s ORDER BY source_a, source_b""".stripMargin,

    "q360_cdc_chunks" ->
      """WITH p AS (SELECT doc_id, unnest(list_transform(range(len(t)),
        |    i -> {'pos': i, 'w': t[i + 1]})) AS u
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t
        |        FROM documents)),
        |q AS (SELECT doc_id, u.pos AS pos, u.w AS w,
        |  CASE WHEN substr(md5(u.w), 1, 1) = '0' THEN 1 ELSE 0 END AS b
        |  FROM p),
        |ck AS (SELECT doc_id, pos, w,
        |  coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS chunk FROM q),
        |ch AS (SELECT doc_id, chunk, CAST(count(*) AS BIGINT) AS sz,
        |  md5(string_agg(w, ' ' ORDER BY pos)) AS chash
        |  FROM ck GROUP BY doc_id, chunk),
        |cen AS (SELECT chash, count(*) AS n FROM ch GROUP BY chash)
        |SELECT ch.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST((sum(sz) * 200 + count(*)) // (2 * count(*)) AS DOUBLE)
        |    / 100 AS mean_chunk_tokens,
        |  CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_chunks,
        |  CAST((sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) * 2000000
        |    + count(*)) // (2 * count(*)) AS DOUBLE) / 1000000
        |    AS dup_chunk_rate
        |FROM ch JOIN cen USING (chash) GROUP BY ch.doc_id
        |ORDER BY doc_id""".stripMargin,

    "q361_rank_blend" ->
      """WITH base AS (SELECT doc_id, string_split(text, ' ') AS tk
        |  FROM documents),
        |sigs AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n,
        |  round(CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk), 6)
        |    AS dr,
        |  round(CAST(len(list_filter(tk,
        |    x -> list_contains(['the', 'a'], x))) AS DOUBLE) / len(tk),
        |    6) AS sr
        |  FROM base),
        |nn AS (SELECT count(*) AS nn FROM sigs),
        |r1 AS (SELECT doc_id, (row_number() OVER (ORDER BY
        |    round(CAST(n AS DOUBLE), 6), doc_id) * 1000000) // nn
        |    AS pct_len FROM sigs CROSS JOIN nn),
        |r2 AS (SELECT doc_id, (row_number() OVER (ORDER BY
        |    round(dr, 6), doc_id) * 1000000) // nn
        |    AS pct_distinct FROM sigs CROSS JOIN nn),
        |r3 AS (SELECT doc_id, (row_number() OVER (ORDER BY
        |    round(-sr, 6), doc_id) * 1000000) // nn
        |    AS pct_stop FROM sigs CROSS JOIN nn)
        |SELECT doc_id, pct_len, pct_distinct, pct_stop,
        |  ((pct_len + pct_distinct + pct_stop) * 2 + 3) // 6
        |    AS blend_ppm,
        |  CAST(((pct_len + pct_distinct + pct_stop) * 2 + 3) // 6
        |    >= 750000 AS BIGINT) AS selected
        |FROM r1 JOIN r2 USING (doc_id) JOIN r3 USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q362_bpe_merges" ->
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |pr AS (SELECT unnest(list_transform(range(len(w) - 1),
        |    i -> substr(w, i + 1, 2))) AS pair
        |  FROM w WHERE len(w) >= 2),
        |c AS (SELECT pair, CAST(count(*) AS BIGINT) AS n_occ
        |  FROM pr GROUP BY pair),
        |t AS (SELECT sum(n_occ) AS t FROM c)
        |SELECT pair, n_occ,
        |  CAST((n_occ * 2000000 + t) // (2 * t) AS BIGINT) AS share_ppm
        |FROM c CROSS JOIN t ORDER BY n_occ DESC, pair
        |LIMIT 20""".stripMargin,

    "q363_mixture_correction" ->
      """WITH g AS (SELECT source, md5(text) AS h, count(*) AS c,
        |  min(CAST(len(string_split(text, ' ')) AS BIGINT)) AS tg
        |  FROM documents GROUP BY source, md5(text)),
        |t AS (SELECT source, CAST(sum(tg * c) AS BIGINT) AS tokens_raw,
        |  CAST(sum(tg) AS BIGINT) AS tokens_dedup FROM g
        |  GROUP BY source),
        |w AS (SELECT source, tokens_raw, tokens_dedup,
        |  round(pow(CAST(tokens_raw AS DOUBLE), 0.5), 6)
        |    ::DECIMAL(28,6) AS w FROM t),
        |b AS (SELECT min(CAST(tokens_dedup AS DOUBLE)
        |  / CAST(w AS DOUBLE)) AS b FROM w)
        |SELECT source, tokens_raw, tokens_dedup,
        |  CAST(w AS DOUBLE) AS weight,
        |  round(CAST(w AS DOUBLE) * b / tokens_dedup, 6) AS rate,
        |  CAST(floor(CAST(w AS DOUBLE) * b) AS BIGINT) AS alloc_tokens
        |FROM w CROSS JOIN b ORDER BY source""".stripMargin,

    "q364_kl_novelty" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' '))
        |    AS w FROM documents),
        |tf AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1, 2),
        |cw AS (SELECT w, count(*) AS cw FROM tok GROUP BY 1),
        |nd AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS nd FROM tf
        |  GROUP BY 1),
        |nn AS (SELECT count(*) AS n FROM tok),
        |terms AS (SELECT tf.doc_id AS doc_id,
        |  round((CAST(c AS DOUBLE) / nd)
        |    * ln(CAST(c * n AS DOUBLE) / CAST(nd * cw AS DOUBLE)), 12)
        |    ::DECIMAL(38,12) AS term, nd
        |  FROM tf JOIN cw USING (w) JOIN nd USING (doc_id)
        |    CROSS JOIN nn)
        |SELECT doc_id, CAST(max(nd) AS BIGINT) AS n_tokens,
        |  round(CAST(sum(term) AS DOUBLE), 6) + 0.0 AS kl
        |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q365_prefix_dup" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk
        |  FROM documents),
        |f AS (SELECT doc_id,
        |    md5(array_to_string(tk[1:15], ' ')) AS ph,
        |    md5(array_to_string(tk[-15:], ' ')) AS sh
        |  FROM t WHERE len(tk) >= 15),
        |pg AS (SELECT ph, count(*) AS c FROM f GROUP BY ph),
        |l AS (SELECT a.doc_id AS ad, b.doc_id AS bd FROM f a JOIN f b
        |  ON a.sh = b.ph AND a.doc_id <> b.doc_id),
        |oc AS (SELECT ad, count(*) AS c FROM l GROUP BY ad),
        |ic AS (SELECT bd, count(*) AS c FROM l GROUP BY bd)
        |SELECT d.doc_id,
        |  CAST(coalesce(pg.c, 0) AS BIGINT) AS prefix_group_size,
        |  CAST(coalesce(pg.c, 0) > 1 AS BIGINT) AS shares_prefix,
        |  CAST(coalesce(oc.c, 0) AS BIGINT) AS cont_out,
        |  CAST(coalesce(ic.c, 0) AS BIGINT) AS cont_in
        |FROM documents d
        |LEFT JOIN f ON d.doc_id = f.doc_id
        |LEFT JOIN pg ON f.ph = pg.ph
        |LEFT JOIN oc ON d.doc_id = oc.ad
        |LEFT JOIN ic ON d.doc_id = ic.bd
        |ORDER BY d.doc_id""".stripMargin,

    "q366_heaps_law" ->
      """WITH sig AS (SELECT source,
        |    round(ln(CAST(len(tk) AS DOUBLE)), 12) AS x,
        |    round(ln(CAST(len(list_distinct(tk)) AS DOUBLE)), 12) AS y
        |  FROM (SELECT source, string_split(text, ' ') AS tk
        |        FROM documents)
        |  WHERE len(tk) >= 1),
        |m AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    sum(round(x, 12)::DECIMAL(38,12)) AS sx,
        |    sum(round(y, 12)::DECIMAL(38,12)) AS sy,
        |    sum(round(x * y, 12)::DECIMAL(38,12)) AS sxy,
        |    sum(round(x * x, 12)::DECIMAL(38,12)) AS sxx,
        |    sum(round(y * y, 12)::DECIMAL(38,12)) AS syy
        |  FROM sig GROUP BY source),
        |d AS (SELECT source, n_docs,
        |    CAST(n_docs AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS dx,
        |    CAST(n_docs AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS dy,
        |    CAST(n_docs AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cv
        |  FROM m)
        |SELECT source, n_docs,
        |  CASE WHEN dx > 0 THEN round(cv / dx, 6) END AS beta,
        |  CASE WHEN dx > 0 AND dy > 0
        |    THEN round(cv * cv / (dx * dy), 6) END AS r2,
        |  CASE WHEN dx > 0 THEN round(power(10.0, cv / dx), 6) END
        |    AS growth_10x
        |FROM d ORDER BY source""".stripMargin,

    "q367_selfrep" ->
      """WITH tri AS (SELECT source, doc_id,
        |    array_to_string(tk[i:i + 2], ' ') AS g
        |  FROM (SELECT source, doc_id, string_split(text, ' ') AS tk
        |        FROM documents),
        |    unnest(range(1, len(tk) - 1)) AS r(i)
        |  WHERE len(tk) >= 3),
        |pd AS (SELECT source, g, doc_id, count(*) AS c FROM tri
        |  GROUP BY 1, 2, 3),
        |pt AS (SELECT source, g, count(*) AS nd, sum(c) AS occ
        |  FROM pd GROUP BY 1, 2)
        |SELECT source, CAST(sum(occ) AS BIGINT) AS n_trigram_occ,
        |  CAST(count(*) AS BIGINT) AS n_distinct_trigrams,
        |  CAST((sum(CASE WHEN nd > 1 THEN occ ELSE 0 END) * 2000000
        |    + sum(occ)) // (2 * sum(occ)) AS BIGINT) AS selfrep_ppm
        |FROM pt GROUP BY source ORDER BY source""".stripMargin,

    "q368_truncation_loss" ->
      """WITH n AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT)
        |    AS n FROM documents),
        |e AS (SELECT n.n AS n, CAST(c.cap AS BIGINT) AS cap FROM n,
        |  (VALUES (16), (32), (64), (128), (256)) AS c(cap)),
        |a AS (SELECT cap, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(CASE WHEN n > cap THEN 1 ELSE 0 END) AS BIGINT)
        |      AS docs_truncated,
        |    CAST(sum(least(n, cap)) AS BIGINT) AS tokens_kept,
        |    CAST(sum(greatest(n - cap, 0)) AS BIGINT) AS tokens_lost
        |  FROM e GROUP BY cap)
        |SELECT cap, n_docs, docs_truncated, tokens_kept, tokens_lost,
        |  CAST((tokens_lost * 2000000 + tokens_kept + tokens_lost)
        |    // (2 * (tokens_kept + tokens_lost)) AS BIGINT) AS loss_ppm
        |FROM a ORDER BY cap""".stripMargin,

    "q369_isotropy" ->
      """WITH e AS (SELECT label, embedding::DOUBLE[] AS ed
        |  FROM embeddings),
        |w AS (SELECT label, ed,
        |    sqrt(list_dot_product(ed, ed)) AS nrm FROM e
        |  WHERE sqrt(list_dot_product(ed, ed)) > 0),
        |st AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
        |    sum(round(nrm, 12)::DECIMAL(38,12)) AS snrm
        |  FROM w GROUP BY label),
        |dv AS (SELECT label, unnest(list_transform(range(len(ed)),
        |    i -> {'d': i, 'u': ed[i + 1] / nrm})) AS s FROM w),
        |sd AS (SELECT label, s.d AS d,
        |    sum(round(s.u, 12)::DECIMAL(38,12)) AS sd
        |  FROM dv GROUP BY label, s.d),
        |ss AS (SELECT label, sum(round(CAST(sd AS DOUBLE)
        |    * CAST(sd AS DOUBLE), 12)::DECIMAL(38,12)) AS ss
        |  FROM sd GROUP BY label)
        |SELECT st.label, n_vecs,
        |  round(CAST(snrm AS DOUBLE) / n_vecs, 6) AS mean_norm,
        |  CASE WHEN n_vecs > 1 THEN
        |    round((CAST(ss AS DOUBLE) - n_vecs)
        |      / (CAST(n_vecs AS DOUBLE) * (n_vecs - 1)), 6) + 0.0
        |  END AS mean_pairwise_cos
        |FROM st JOIN ss ON st.label = ss.label
        |ORDER BY st.label""".stripMargin,

    "q370_interleave" ->
      """WITH b AS (SELECT doc_id, source AS s,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |      ::BIGINT % 8 AS INT) AS shard,
        |    md5('o:' || CAST(doc_id AS VARCHAR)) AS ord
        |  FROM documents),
        |r AS (SELECT shard, s, doc_id, ord,
        |    CASE WHEN lag(s) OVER w IS NULL OR lag(s) OVER w <> s
        |      THEN 1 ELSE 0 END AS chg
        |  FROM b WINDOW w AS (PARTITION BY shard ORDER BY ord, doc_id)),
        |r2 AS (SELECT shard, s, chg, sum(chg) OVER (PARTITION BY shard
        |    ORDER BY ord, doc_id ROWS UNBOUNDED PRECEDING) AS rid
        |  FROM r),
        |rl AS (SELECT shard, rid, count(*) AS rl FROM r2
        |  GROUP BY shard, rid),
        |br AS (SELECT shard, CAST(count(*) AS BIGINT) AS runs,
        |    CAST(max(rl) AS BIGINT) AS max_run FROM rl GROUP BY shard),
        |sc AS (SELECT shard, s, count(*) AS c FROM b GROUP BY shard, s),
        |cs AS (SELECT shard, CAST(sum(c) AS BIGINT) AS n_docs,
        |    CAST(count(*) AS BIGINT) AS n_sources,
        |    CAST(sum(c * c) AS BIGINT) AS c2 FROM sc GROUP BY shard)
        |SELECT cs.shard, n_docs, n_sources, runs, max_run,
        |  round(1.0 + (CAST(n_docs AS DOUBLE) - 1)
        |    * (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE) - c2)
        |    / (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE)), 6)
        |    AS expected_runs,
        |  CASE WHEN 1.0 + (CAST(n_docs AS DOUBLE) - 1)
        |      * (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE) - c2)
        |      / (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE)) > 0
        |    THEN round(CAST(runs AS DOUBLE)
        |      / round(1.0 + (CAST(n_docs AS DOUBLE) - 1)
        |        * (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE) - c2)
        |        / (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE)), 6),
        |      6) END AS interleave_ratio
        |FROM cs JOIN br ON cs.shard = br.shard
        |ORDER BY cs.shard""".stripMargin,

    "q371_shard_js" ->
      """WITH tok AS (SELECT CAST(('0x' || substr(md5(CAST(doc_id
        |      AS VARCHAR)), 1, 8))::BIGINT % 8 AS INT) AS shard,
        |    unnest(string_split(text, ' ')) AS tok FROM documents),
        |st AS (SELECT shard, tok, count(*) AS c FROM tok GROUP BY 1, 2),
        |ct AS (SELECT tok, sum(c) AS ct FROM st GROUP BY tok),
        |ns AS (SELECT shard, sum(c) AS ns FROM st GROUP BY shard),
        |nn AS (SELECT sum(ct) AS tn FROM ct),
        |j AS (SELECT shard, ns, ct, tn,
        |    CAST(c AS DOUBLE) / ns AS p, CAST(ct AS DOUBLE) / tn AS q
        |  FROM st JOIN ct USING (tok) JOIN ns USING (shard)
        |    CROSS JOIN nn),
        |t2 AS (SELECT shard, ns, ct, tn, (p + q) / 2 AS m, p, q FROM j),
        |t3 AS (SELECT shard, ns, ct, tn,
        |    round((p * ln(p / m) + q * ln(q / m)) / 2, 12)
        |      ::DECIMAL(38,12) AS term FROM t2),
        |g AS (SELECT shard, CAST(max(ns) AS BIGINT) AS n_tokens,
        |    sum(term) AS s, CAST(sum(ct) AS BIGINT) AS cp,
        |    CAST(max(tn) AS BIGINT) AS nn2 FROM t3 GROUP BY shard)
        |SELECT shard, n_tokens,
        |  round(CAST(s + round(CAST(nn2 - cp AS DOUBLE) / nn2
        |    * ln(2.0) / 2, 12)::DECIMAL(38,12) AS DOUBLE), 6) + 0.0
        |    AS js_nats
        |FROM g ORDER BY shard""".stripMargin,

    "q372_dedup_policy" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk
        |  FROM documents),
        |f AS (SELECT doc_id, md5(array_to_string(tk[1:15], ' ')) AS ph,
        |    CAST(len(tk) AS BIGINT) AS n,
        |    CAST(len(list_distinct(tk)) AS BIGINT) AS nd
        |  FROM t WHERE len(tk) >= 15),
        |r AS (SELECT ph, n,
        |    row_number() OVER (PARTITION BY ph ORDER BY doc_id) AS rf,
        |    row_number() OVER (PARTITION BY ph ORDER BY n DESC,
        |      doc_id) AS rl,
        |    row_number() OVER (PARTITION BY ph ORDER BY nd DESC,
        |      doc_id) AS rd,
        |    count(*) OVER (PARTITION BY ph) AS cnt,
        |    sum(n) OVER (PARTITION BY ph) AS tot
        |  FROM f),
        |cl AS (SELECT ph, max(cnt) AS cnt, max(tot) AS tot,
        |    max(CASE WHEN rf = 1 THEN n END) AS keep_first,
        |    max(CASE WHEN rl = 1 THEN n END) AS keep_longest,
        |    max(CASE WHEN rd = 1 THEN n END) AS keep_dist
        |  FROM r GROUP BY ph HAVING max(cnt) >= 2),
        |m AS (
        |  SELECT 'keep_first' AS policy, keep_first AS kept, cnt, tot
        |    FROM cl
        |  UNION ALL SELECT 'keep_longest', keep_longest, cnt, tot
        |    FROM cl
        |  UNION ALL SELECT 'keep_most_distinct', keep_dist, cnt, tot
        |    FROM cl)
        |SELECT policy, CAST(count(*) AS BIGINT) AS n_clusters,
        |  CAST(sum(cnt) AS BIGINT) AS n_docs,
        |  CAST(sum(kept) AS BIGINT) AS tokens_kept,
        |  CAST(sum(tot - kept) AS BIGINT) AS tokens_dropped,
        |  CAST((sum(kept) * 2000000 + sum(kept) + sum(tot - kept))
        |    // (2 * (sum(kept) + sum(tot - kept))) AS BIGINT)
        |    AS kept_ppm
        |FROM m GROUP BY policy ORDER BY policy""".stripMargin,

    "q373_burstiness" ->
      """WITH tf AS (SELECT tok, doc_id, count(*) AS c FROM
        |    (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |     FROM documents) GROUP BY tok, doc_id),
        |st AS (SELECT tok AS term, CAST(count(*) AS BIGINT) AS df,
        |    CAST(sum(c) AS BIGINT) AS occ,
        |    CAST(sum(c * c) AS BIGINT) AS c2
        |  FROM tf GROUP BY tok HAVING count(*) >= 5),
        |nn AS (SELECT count(*) AS n FROM documents)
        |SELECT term, df, occ,
        |  round(CAST(occ AS DOUBLE) / df, 6) AS burst,
        |  round((CAST(c2 AS DOUBLE) / n
        |    - (CAST(occ AS DOUBLE) / n) * (CAST(occ AS DOUBLE) / n))
        |    / (CAST(occ AS DOUBLE) / n), 6) AS vmr
        |FROM st CROSS JOIN nn ORDER BY term""".stripMargin,

    "q374_vocab_overlap" ->
      """WITH u AS (SELECT source AS s,
        |    unnest(list_distinct(string_split(text, ' '))) AS t
        |  FROM documents),
        |v AS (SELECT DISTINCT s, t FROM u),
        |sz AS (SELECT s, CAST(count(*) AS BIGINT) AS v FROM v
        |  GROUP BY s),
        |p AS (SELECT a.s AS sa, b.s AS sb, CAST(count(*) AS BIGINT)
        |    AS inter
        |  FROM v a JOIN v b ON a.t = b.t AND a.s < b.s GROUP BY 1, 2)
        |SELECT sa AS source_a, sb AS source_b, va.v AS v_a,
        |  vb.v AS v_b, inter,
        |  CAST((inter * 2000000 + va.v + vb.v - inter)
        |    // (2 * (va.v + vb.v - inter)) AS BIGINT) AS jaccard_ppm
        |FROM p JOIN sz va ON p.sa = va.s JOIN sz vb ON p.sb = vb.s
        |ORDER BY source_a, source_b""".stripMargin,

    "q375_topic_lang_grid" -> {
      val profs = Map(
        "sql" -> Seq("join", "filter", "group", "query", "sort", "agg"),
        "infra" -> Seq("spark", "stream", "batch", "hash", "merge", "scan"),
        "data" -> Seq("data", "row", "column", "table", "value", "vector"))
      val scores = Seq("sql", "infra", "data").map(p =>
        s"CAST(len(list_filter(tk, x -> list_contains(${profileList(profs(p))}, x))) AS BIGINT) AS score_$p")
        .mkString(", ")
      s"""WITH t AS (SELECT lang, string_split(text, ' ') AS tk
         |  FROM documents),
         |sc AS (SELECT lang, $scores FROM t),
         |p AS (SELECT lang,
         |  CASE WHEN score_sql >= score_infra AND score_sql >= score_data
         |         THEN 'sql'
         |       WHEN score_infra >= score_data THEN 'infra'
         |       ELSE 'data' END AS lang_pred FROM sc),
         |g AS (SELECT lang, lang_pred, CAST(count(*) AS BIGINT)
         |    AS n_docs FROM p GROUP BY lang, lang_pred),
         |tt AS (SELECT lang, sum(n_docs) AS t FROM g GROUP BY lang)
         |SELECT g.lang, lang_pred, n_docs,
         |  CAST((n_docs * 2000000 + t) // (2 * t) AS BIGINT)
         |    AS share_ppm
         |FROM g JOIN tt ON g.lang = tt.lang
         |ORDER BY g.lang, lang_pred""".stripMargin
    },

    "q376_gopher_ablation" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
        |    CAST(length(text) - (len(string_split(text, ' ')) - 1)
        |      AS BIGINT) AS ch
        |  FROM documents),
        |m0 AS (SELECT doc_id, n, ch,
        |  CAST(list_aggregate(list_transform(list_distinct(tk),
        |    w -> len(list_filter(tk, x -> x = w))), 'max') AS BIGINT)
        |    AS maxc,
        |  CAST(len(list_distinct(tk)) AS BIGINT) AS nd,
        |  CAST(len(list_filter(tk, x -> list_contains(['the', 'a'], x)))
        |    AS BIGINT) AS nstop
        |  FROM t),
        |fl AS (SELECT doc_id, n,
        |  CAST(n < 30 OR n > 80 AS BIGINT) AS f1,
        |  CAST(ch * 2 < n * 7 OR ch * 2 > n * 12 AS BIGINT) AS f2,
        |  CAST(maxc * 5 > n AS BIGINT) AS f3,
        |  CAST(nstop = 0 AS BIGINT) AS f4,
        |  CAST(nd * 5 < n * 2 AS BIGINT) AS f5
        |  FROM m0),
        |m AS (SELECT n, f1, f2, f3, f4, f5,
        |  f1 + f2 + f3 + f4 + f5 AS tot FROM fl),
        |tt AS (SELECT sum(n) AS tt FROM m),
        |mm AS (
        |  SELECT 'word_count' AS rule, f1 AS flag, n, tot FROM m
        |  UNION ALL SELECT 'mean_word_len', f2, n, tot FROM m
        |  UNION ALL SELECT 'top_word_share', f3, n, tot FROM m
        |  UNION ALL SELECT 'no_stopword', f4, n, tot FROM m
        |  UNION ALL SELECT 'distinct_ratio', f5, n, tot FROM m)
        |SELECT rule, CAST(sum(flag) AS BIGINT) AS docs_fail,
        |  CAST(sum(CASE WHEN flag = 1 AND tot = 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS docs_fail_solo,
        |  CAST(sum(n * flag) AS BIGINT) AS tokens_lost_any,
        |  CAST(sum(CASE WHEN flag = 1 AND tot = 1 THEN n ELSE 0 END)
        |    AS BIGINT) AS tokens_lost_solo,
        |  CAST((sum(n * flag) * 2000000 + tt) // (2 * tt) AS BIGINT)
        |    AS lost_any_ppm
        |FROM mm CROSS JOIN tt GROUP BY rule, tt
        |ORDER BY rule""".stripMargin,

    "q377_source_js" ->
      """WITH tok AS (SELECT source, unnest(string_split(text, ' '))
        |    AS tok FROM documents),
        |st AS (SELECT source, tok, count(*) AS c FROM tok
        |  GROUP BY 1, 2),
        |ct AS (SELECT tok, sum(c) AS ct FROM st GROUP BY tok),
        |ns AS (SELECT source, sum(c) AS ns FROM st GROUP BY source),
        |nn AS (SELECT sum(ct) AS tn FROM ct),
        |j AS (SELECT source, ns, ct, tn,
        |    CAST(c AS DOUBLE) / ns AS p, CAST(ct AS DOUBLE) / tn AS q
        |  FROM st JOIN ct USING (tok) JOIN ns USING (source)
        |    CROSS JOIN nn),
        |t2 AS (SELECT source, ns, ct, tn, (p + q) / 2 AS m, p, q
        |  FROM j),
        |t3 AS (SELECT source, ns, ct, tn,
        |    round((p * ln(p / m) + q * ln(q / m)) / 2, 12)
        |      ::DECIMAL(38,12) AS term FROM t2),
        |g AS (SELECT source, CAST(max(ns) AS BIGINT) AS n_tokens,
        |    sum(term) AS s, CAST(sum(ct) AS BIGINT) AS cp,
        |    CAST(max(tn) AS BIGINT) AS nn2 FROM t3 GROUP BY source)
        |SELECT source, n_tokens,
        |  round(CAST(s + round(CAST(nn2 - cp AS DOUBLE) / nn2
        |    * ln(2.0) / 2, 12)::DECIMAL(38,12) AS DOUBLE), 6) + 0.0
        |    AS js_nats
        |FROM g ORDER BY source""".stripMargin,

    "q378_quality_length_grid" ->
      """WITH base AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS l,
        |    round(CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk), 6)
        |      AS dr
        |  FROM (SELECT doc_id, string_split(text, ' ') AS tk
        |        FROM documents) WHERE len(tk) >= 1),
        |nn AS (SELECT count(*) AS n FROM base),
        |dl AS (SELECT doc_id, ((row_number() OVER (ORDER BY
        |    round(CAST(l AS DOUBLE), 6), doc_id) - 1) * 10) // n
        |    AS len_decile FROM base CROSS JOIN nn),
        |dq AS (SELECT doc_id, ((row_number() OVER (ORDER BY
        |    round(dr, 6), doc_id) - 1) * 10) // n
        |    AS q_decile FROM base CROSS JOIN nn),
        |g AS (SELECT len_decile, q_decile, CAST(count(*) AS BIGINT)
        |    AS n_docs FROM dl JOIN dq USING (doc_id) GROUP BY 1, 2),
        |rt AS (SELECT len_decile, sum(n_docs) AS rt FROM g
        |  GROUP BY len_decile),
        |ct AS (SELECT q_decile, sum(n_docs) AS ct FROM g
        |  GROUP BY q_decile)
        |SELECT len_decile, q_decile, n_docs,
        |  round(CAST(n_docs AS DOUBLE) * n
        |    / (CAST(rt AS DOUBLE) * ct), 6) AS lift
        |FROM g JOIN rt USING (len_decile) JOIN ct USING (q_decile)
        |  CROSS JOIN nn
        |ORDER BY len_decile, q_decile""".stripMargin,

    "q379_dedup_savings" ->
      """WITH t AS (SELECT doc_id, source, md5(text) AS h,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |  FROM documents),
        |cl AS (SELECT h, min(n) AS tg, arg_min(source, doc_id) AS ssrc
        |  FROM t GROUP BY h),
        |cs AS (SELECT h, source, count(*) AS c FROM t GROUP BY 1, 2),
        |j AS (SELECT cs.source AS source, c, tg, ssrc
        |  FROM cs JOIN cl USING (h))
        |SELECT source, CAST(sum(c * tg) AS BIGINT) AS tokens_raw,
        |  CAST(sum((c - 1) * tg) AS BIGINT) AS dup_tokens_within,
        |  CAST(sum((c - CASE WHEN source = ssrc THEN 1 ELSE 0 END)
        |      * tg) - sum((c - 1) * tg) AS BIGINT)
        |    AS dup_tokens_cross_extra,
        |  CAST((sum((c - CASE WHEN source = ssrc THEN 1 ELSE 0 END)
        |      * tg) * 2000000 + sum(c * tg)) // (2 * sum(c * tg))
        |    AS BIGINT) AS savings_ppm
        |FROM j GROUP BY source ORDER BY source""".stripMargin,

    "q380_corpus_delta" ->
      """WITH u AS (SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
        |      / CAST(4294967296 AS DOUBLE) AS mem
        |  FROM documents),
        |o AS (SELECT doc_id, source AS so, n AS no FROM u
        |  WHERE mem < 0.9),
        |nw AS (SELECT doc_id, source AS sn, n AS nn FROM u
        |  WHERE mem >= 0.1),
        |f AS (SELECT coalesce(nw.sn, o.so) AS source, o.so, nw.sn,
        |    o.no, nw.nn
        |  FROM o FULL JOIN nw USING (doc_id))
        |SELECT source,
        |  CAST(sum(CASE WHEN so IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS docs_added,
        |  CAST(sum(CASE WHEN sn IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS docs_removed,
        |  CAST(sum(CASE WHEN so IS NOT NULL AND sn IS NOT NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS docs_common,
        |  CAST(sum(CASE WHEN so IS NULL THEN nn ELSE 0 END) AS BIGINT)
        |    AS tokens_added,
        |  CAST(sum(CASE WHEN sn IS NULL THEN no ELSE 0 END) AS BIGINT)
        |    AS tokens_removed
        |FROM f GROUP BY source ORDER BY source""".stripMargin,

    "q381_semdedup_sweep" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
        |  FROM embeddings),
        |n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb))
        |    AS nrm,
        |  CAST(emb[1] > 0 AS INT) * 1 + CAST(emb[2] > 0 AS INT) * 2
        |    + CAST(emb[3] > 0 AS INT) * 4 + CAST(emb[4] > 0 AS INT) * 8
        |    AS bucket
        |  FROM e),
        |dv AS (SELECT bucket, unnest(list_transform(range(len(emb)),
        |    i -> {'dim': i, 'v': emb[i + 1]})) AS s FROM n),
        |cd AS (SELECT bucket, s.dim AS dim, round(avg(s.v), 6) AS c
        |  FROM dv GROUP BY bucket, s.dim),
        |cent AS (SELECT bucket, list(c ORDER BY dim) AS cent
        |  FROM cd GROUP BY bucket),
        |j AS (SELECT vec_id, n.bucket AS bucket, emb, nrm,
        |  list_dot_product(emb, cent)
        |    / (nrm * sqrt(list_dot_product(cent, cent))) AS s2c
        |  FROM n JOIN cent ON n.bucket = cent.bucket),
        |m AS (SELECT a.vec_id AS vec_id,
        |    max(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm))
        |      AS ms
        |  FROM j a JOIN j b ON a.bucket = b.bucket
        |    AND a.vec_id <> b.vec_id
        |  WHERE b.s2c < a.s2c OR (b.s2c = a.s2c
        |    AND b.vec_id < a.vec_id)
        |  GROUP BY a.vec_id),
        |tot AS (SELECT count(*) AS nv FROM j),
        |taus AS (SELECT CAST(tau AS BIGINT) AS tau_pct FROM (VALUES
        |  (20), (30), (40), (50), (60), (70), (80)) v(tau)),
        |c AS (SELECT tau_pct, CAST(sum(CASE WHEN ms >
        |    CAST(tau_pct AS DOUBLE) / 100 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS nd
        |  FROM taus CROSS JOIN m GROUP BY tau_pct)
        |SELECT t.tau_pct, CAST(nv AS BIGINT) AS n_vecs,
        |  coalesce(c.nd, 0) AS n_dup,
        |  CAST(nv - coalesce(c.nd, 0) AS BIGINT) AS n_survivors,
        |  CAST((coalesce(c.nd, 0) * 2000000 + nv) // (2 * nv)
        |    AS BIGINT) AS dup_ppm
        |FROM taus t LEFT JOIN c USING (tau_pct) CROSS JOIN tot
        |ORDER BY t.tau_pct""".stripMargin,

    "q382_sttr" ->
      """WITH t AS (SELECT source, string_split(text, ' ') AS tk
        |  FROM documents),
        |pref AS (SELECT source,
        |    (CAST(len(list_distinct(tk[1:30])) AS BIGINT) * 2000000
        |      + 30) // 60 AS ttr
        |  FROM t WHERE len(tk) >= 30),
        |p AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs_sttr,
        |    CAST((sum(ttr) * 2 + count(*)) // (2 * count(*))
        |      AS BIGINT) AS mean_sttr_ppm
        |  FROM pref GROUP BY source),
        |tok AS (SELECT source, unnest(string_split(text, ' ')) AS tk2
        |  FROM documents),
        |sc AS (SELECT source, tk2, count(*) AS c FROM tok
        |  GROUP BY 1, 2),
        |v AS (SELECT source, CAST(count(*) AS BIGINT) AS vocab,
        |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS hapax
        |  FROM sc GROUP BY source)
        |SELECT source,
        |  CAST(coalesce(n_docs_sttr, 0) AS BIGINT) AS n_docs_sttr,
        |  mean_sttr_ppm, vocab,
        |  CAST((hapax * 2000000 + vocab) // (2 * vocab) AS BIGINT)
        |    AS hapax_ppm
        |FROM p FULL JOIN v USING (source)
        |ORDER BY source""".stripMargin,

    "q383_position_novelty" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk
        |  FROM documents),
        |p AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n,
        |    unnest(tk) AS tok, unnest(range(len(tk))) AS pos
        |  FROM t WHERE len(tk) >= 1),
        |f AS (SELECT (pos * 10) // n AS decile,
        |    CASE WHEN row_number() OVER (PARTITION BY doc_id, tok
        |      ORDER BY pos) = 1 THEN 1 ELSE 0 END AS nw
        |  FROM p)
        |SELECT CAST(decile AS BIGINT) AS decile,
        |  CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(nw) AS BIGINT) AS n_new,
        |  CAST((sum(nw) * 2000000 + count(*)) // (2 * count(*))
        |    AS BIGINT) AS novelty_ppm
        |FROM f GROUP BY decile ORDER BY decile""".stripMargin,

    "q384_lang_confusion" -> {
      val profs = Seq(
        "sql" -> Seq("join", "filter", "group", "query", "sort", "agg"),
        "infra" -> Seq("spark", "stream", "batch", "hash", "merge", "scan"),
        "data" -> Seq("data", "row", "column", "table", "value", "vector"))
      val scores = profs.map { case (p, ws) =>
        s"CAST(len(list_filter(tk, x -> list_contains(${profileList(ws)}, x))) AS BIGINT) AS score_$p"
      }.mkString(", ")
      s"""WITH t AS (SELECT lang, string_split(text, ' ') AS tk
         |  FROM documents),
         |sc AS (SELECT lang, $scores FROM t),
         |p AS (SELECT lang,
         |    CASE WHEN score_sql >= score_infra AND score_sql >= score_data
         |      THEN 'sql'
         |      WHEN score_infra >= score_data THEN 'infra'
         |      ELSE 'data' END AS lang_pred FROM sc),
         |g AS (SELECT lang, lang_pred, CAST(count(*) AS BIGINT)
         |    AS n_docs FROM p GROUP BY 1, 2),
         |rt AS (SELECT lang, sum(n_docs) AS rt FROM g GROUP BY lang)
         |SELECT lang, lang_pred, n_docs,
         |  CAST((n_docs * 2000000 + rt) // (2 * rt) AS BIGINT)
         |    AS share_ppm
         |FROM g JOIN rt USING (lang)
         |ORDER BY lang, lang_pred""".stripMargin
    },

    "q385_embedding_drift" ->
      """WITH e0 AS (SELECT vec_id, label, embedding::DOUBLE[] AS e,
        |    ('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::BIGINT
        |      / CAST(4294967296 AS DOUBLE) AS mem
        |  FROM embeddings),
        |u AS (SELECT 0 AS snap, label, e FROM e0 WHERE mem < 0.9
        |  UNION ALL
        |  SELECT 1 AS snap, label, e FROM e0 WHERE mem >= 0.1),
        |cnt AS (SELECT snap, label, CAST(count(*) AS BIGINT) AS n
        |  FROM u GROUP BY 1, 2),
        |d AS (SELECT snap, label, unnest(e) AS v,
        |    unnest(range(len(e))) AS dim FROM u),
        |ce AS (SELECT snap, label, dim, round(avg(v), 6) AS c
        |  FROM d GROUP BY 1, 2, 3),
        |cl AS (SELECT snap, label, list(c ORDER BY dim) AS cent
        |  FROM ce GROUP BY 1, 2),
        |j AS (SELECT cl.snap, cl.label, cent, n
        |  FROM cl JOIN cnt ON cnt.snap = cl.snap
        |    AND cnt.label = cl.label),
        |o AS (SELECT label, cent AS co, n AS n_old FROM j
        |  WHERE snap = 0),
        |nw AS (SELECT label, cent AS cn, n AS n_new FROM j
        |  WHERE snap = 1)
        |SELECT CAST(label AS BIGINT) AS label, n_old, n_new,
        |  CASE WHEN sqrt(list_dot_product(co, co)) = 0
        |      OR sqrt(list_dot_product(cn, cn)) = 0 THEN NULL
        |    ELSE round(list_dot_product(co, cn) /
        |      (sqrt(list_dot_product(co, co)) *
        |       sqrt(list_dot_product(cn, cn))), 6) + 0.0 END
        |    AS centroid_cos,
        |  round(sqrt(list_dot_product(cn, cn)) -
        |    sqrt(list_dot_product(co, co)), 6) + 0.0 AS norm_delta
        |FROM o JOIN nw USING (label) ORDER BY label""".stripMargin,

    "q386_dup_length_profile" ->
      """WITH b AS (SELECT doc_id, md5(text) AS h,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS l
        |  FROM documents),
        |nn AS (SELECT count(*) AS n FROM b),
        |f AS (SELECT doc_id, l,
        |    CASE WHEN count(*) OVER (PARTITION BY h) > 1 THEN 1
        |      ELSE 0 END AS dup FROM b),
        |r AS (SELECT dup, ((row_number() OVER (ORDER BY
        |    round(CAST(l AS DOUBLE), 6), doc_id) - 1) * 10) // n
        |    AS len_decile FROM f CROSS JOIN nn),
        |g AS (SELECT len_decile, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(dup) AS BIGINT) AS n_dup FROM r GROUP BY 1),
        |tot AS (SELECT sum(n_docs) AS td, sum(n_dup) AS tdup FROM g)
        |SELECT CAST(len_decile AS BIGINT) AS len_decile, n_docs, n_dup,
        |  CAST((n_dup * 2000000 + n_docs) // (2 * n_docs) AS BIGINT)
        |    AS dup_ppm,
        |  CASE WHEN tdup = 0 THEN NULL
        |    ELSE round(CAST(n_dup AS DOUBLE) * td /
        |      (CAST(n_docs AS DOUBLE) * tdup), 6) END AS lift
        |FROM g CROSS JOIN tot ORDER BY len_decile""".stripMargin,

    "q387_minhash_fidelity" -> {
      val slices = for (b <- 0 until 4; r <- 0 until 2) yield s"h_${b}_$r"
      val mcols = slices.zipWithIndex.map { case (c, i) =>
        s"CASE WHEN sa.$c = sb.$c THEN 1 ELSE 0 END AS m$i"
      }.mkString(", ")
      val cum = Seq(2, 4, 8).map(h =>
        s"${(0 until h).map(i => s"m$i").mkString(" + ")} AS mt$h")
        .mkString(", ")
      s"""WITH $shinglesCte,
         |szs AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |${minhashSig(4, 2)},
         |cand AS (${minhashPairs(4, 2)}),
         |com AS (SELECT c.doc_a, c.doc_b, count(*) AS c
         |  FROM cand c
         |  JOIN sh x ON x.doc_id = c.doc_a
         |  JOIN sh y ON y.doc_id = c.doc_b AND y.s = x.s
         |  GROUP BY c.doc_a, c.doc_b),
         |pr AS (SELECT cand.doc_a, cand.doc_b,
         |    CAST(coalesce(com.c, 0) AS DOUBLE)
         |      / (sa2.n + sb2.n - coalesce(com.c, 0)) AS j, $mcols
         |  FROM cand
         |  LEFT JOIN com ON com.doc_a = cand.doc_a
         |    AND com.doc_b = cand.doc_b
         |  JOIN sig sa ON sa.doc_id = cand.doc_a
         |  JOIN sig sb ON sb.doc_id = cand.doc_b
         |  JOIN szs sa2 ON sa2.doc_id = cand.doc_a
         |  JOIN szs sb2 ON sb2.doc_id = cand.doc_b),
         |mm AS (SELECT j, $cum FROM pr),
         |sw AS (SELECT CAST(h.n_hashes AS BIGINT) AS n_hashes, j,
         |    CASE WHEN h.n_hashes = 2 THEN mt2
         |      WHEN h.n_hashes = 4 THEN mt4 ELSE mt8 END
         |      / CAST(h.n_hashes AS DOUBLE) AS est
         |  FROM mm CROSS JOIN
         |    (SELECT unnest([2, 4, 8]) AS n_hashes) h)
         |SELECT n_hashes, CAST(count(*) AS BIGINT) AS n_pairs,
         |  round(CAST(sum(CAST(round(abs(est - j), 12)
         |    AS DECIMAL(38,12))) AS DOUBLE) / count(*), 6) AS mae,
         |  round(CAST(sum(CAST(round(est - j, 12)
         |    AS DECIMAL(38,12))) AS DOUBLE) / count(*), 6) + 0.0 AS bias
         |FROM sw GROUP BY n_hashes ORDER BY n_hashes""".stripMargin
    },

    "q388_sample_overlap" ->
      """WITH b AS (SELECT
        |    ('0x' || substr(md5('a' || '|' || doc_id::VARCHAR), 1, 8))
        |      ::BIGINT / CAST(4294967296 AS DOUBLE) AS ma,
        |    ('0x' || substr(md5('b' || '|' || doc_id::VARCHAR), 1, 8))
        |      ::BIGINT / CAST(4294967296 AS DOUBLE) AS mb
        |  FROM documents),
        |m AS (SELECT r.rate_pct, ma, mb FROM b CROSS JOIN
        |  (SELECT unnest([1, 5, 10, 25]) AS rate_pct) r),
        |g AS (SELECT rate_pct, CAST(count(*) AS BIGINT) AS nn,
        |    CAST(sum(CASE WHEN ma < rate_pct / 100.0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN mb < rate_pct / 100.0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN ma < rate_pct / 100.0
        |      AND mb < rate_pct / 100.0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_both
        |  FROM m GROUP BY rate_pct)
        |SELECT CAST(rate_pct AS BIGINT) AS rate_pct, n_a, n_b, n_both,
        |  CAST((n_both * 2000000 + nn) // (2 * nn) AS BIGINT)
        |    AS obs_joint_ppm,
        |  CAST((n_a::HUGEINT * n_b * 2000000 + nn::HUGEINT * nn)
        |    // (2 * nn::HUGEINT * nn) AS BIGINT) AS exp_joint_ppm
        |FROM g ORDER BY rate_pct""".stripMargin,

    "q389_source_cohesion" ->
      """WITH e AS (SELECT d.source AS label, embedding::DOUBLE[] AS ed
        |  FROM embeddings em JOIN documents d ON d.doc_id = em.vec_id),
        |w AS (SELECT label, ed,
        |    sqrt(list_dot_product(ed, ed)) AS nrm FROM e
        |  WHERE sqrt(list_dot_product(ed, ed)) > 0),
        |st AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
        |    sum(round(nrm, 12)::DECIMAL(38,12)) AS snrm
        |  FROM w GROUP BY label),
        |dv AS (SELECT label, unnest(list_transform(range(len(ed)),
        |    i -> {'d': i, 'u': ed[i + 1] / nrm})) AS s FROM w),
        |sd AS (SELECT label, s.d AS d,
        |    sum(round(s.u, 12)::DECIMAL(38,12)) AS sd
        |  FROM dv GROUP BY label, s.d),
        |ss AS (SELECT label, sum(round(CAST(sd AS DOUBLE)
        |    * CAST(sd AS DOUBLE), 12)::DECIMAL(38,12)) AS ss
        |  FROM sd GROUP BY label)
        |SELECT st.label AS source, n_vecs,
        |  round(CAST(snrm AS DOUBLE) / n_vecs, 6) AS mean_norm,
        |  CASE WHEN n_vecs > 1 THEN
        |    round((CAST(ss AS DOUBLE) - n_vecs)
        |      / (CAST(n_vecs AS DOUBLE) * (n_vecs - 1)), 6) + 0.0
        |  END AS mean_pairwise_cos
        |FROM st JOIN ss ON st.label = ss.label
        |ORDER BY source""".stripMargin,

    "q390_neardup_cluster_purity" ->
      s"""WITH RECURSIVE $shinglesCte,
         |${minhashSig(4, 2)},
         |pairs AS (${minhashPairs(4, 2)}),
         |ed AS (SELECT doc_a AS s, doc_b AS d FROM pairs
         |       UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(node, anc) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.d, r.anc FROM reach r JOIN ed e ON e.s = r.node),
         |cc AS (SELECT node, min(anc) AS label FROM reach GROUP BY node),
         |lab AS (SELECT cc.label, d.source FROM cc
         |  JOIN documents d ON d.doc_id = cc.node),
         |per AS (SELECT label, source, count(*) AS c FROM lab
         |  GROUP BY 1, 2),
         |cl AS (SELECT label, CAST(sum(c) AS BIGINT) AS sz,
         |    CAST(count(*) AS BIGINT) AS ns FROM per GROUP BY label)
         |SELECT ns AS n_sources, CAST(count(*) AS BIGINT) AS n_clusters,
         |  CAST(sum(sz) AS BIGINT) AS n_docs,
         |  CAST(max(sz) AS BIGINT) AS max_cluster
         |FROM cl WHERE sz > 1 GROUP BY ns
         |ORDER BY n_sources""".stripMargin,

    "q391_quality_delta" ->
      """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS tk,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
        |    CAST(length(text) - (len(string_split(text, ' ')) - 1)
        |      AS BIGINT) AS ch,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
        |      / CAST(4294967296 AS DOUBLE) AS mem
        |  FROM documents),
        |m AS (SELECT source, mem,
        |  CASE WHEN NOT (n < 30 OR n > 80)
        |    AND NOT (ch * 2 < n * 7 OR ch * 2 > n * 12)
        |    AND NOT (CAST(list_aggregate(list_transform(list_distinct(tk),
        |      w -> len(list_filter(tk, x -> x = w))), 'max') AS BIGINT)
        |      * 5 > n)
        |    AND len(list_filter(tk, x -> list_contains(['the', 'a'], x)))
        |      > 0
        |    AND NOT (CAST(len(list_distinct(tk)) AS BIGINT) * 5 < n * 2)
        |    THEN 1 ELSE 0 END AS pass
        |  FROM t),
        |o AS (SELECT source, CAST(count(*) AS BIGINT) AS n_old,
        |    CAST(sum(pass) AS BIGINT) AS po FROM m WHERE mem < 0.9
        |  GROUP BY source),
        |nw AS (SELECT source, CAST(count(*) AS BIGINT) AS n_new,
        |    CAST(sum(pass) AS BIGINT) AS pn FROM m WHERE mem >= 0.1
        |  GROUP BY source)
        |SELECT source, n_old, n_new,
        |  CAST((po * 2000000 + n_old) // (2 * n_old) AS BIGINT)
        |    AS pass_ppm_old,
        |  CAST((pn * 2000000 + n_new) // (2 * n_new) AS BIGINT)
        |    AS pass_ppm_new,
        |  CAST((pn * 2000000 + n_new) // (2 * n_new)
        |    - (po * 2000000 + n_old) // (2 * n_old) AS BIGINT)
        |    AS delta_ppm
        |FROM o JOIN nw USING (source) ORDER BY source""".stripMargin,

    "q392_hubness" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
        |  FROM embeddings),
        |n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm,
        |  CAST(emb[1] > 0 AS INT) * 1 + CAST(emb[2] > 0 AS INT) * 2
        |    + CAST(emb[3] > 0 AS INT) * 4 + CAST(emb[4] > 0 AS INT) * 8
        |    AS bucket
        |  FROM e),
        |pb AS (SELECT vec_id, emb, nrm,
        |  unnest([bucket, xor(bucket, 1), xor(bucket, 2), xor(bucket, 4),
        |          xor(bucket, 8)]) AS bucket
        |  FROM n),
        |p AS (SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
        |    list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) AS sim
        |  FROM pb a JOIN n b ON a.bucket = b.bucket
        |    AND a.vec_id <> b.vec_id),
        |r AS (SELECT vec_id, neighbor_id,
        |    row_number() OVER (PARTITION BY vec_id
        |      ORDER BY sim DESC, neighbor_id) AS rn
        |  FROM p),
        |t AS (SELECT vec_id, neighbor_id FROM r WHERE rn <= 5),
        |deg AS (SELECT neighbor_id AS id, CAST(count(*) AS BIGINT)
        |    AS dg FROM t GROUP BY 1),
        |sp AS (SELECT vec_id AS id FROM embeddings)
        |SELECT coalesce(dg, 0) AS in_degree,
        |  CAST(count(*) AS BIGINT) AS n_vecs
        |FROM sp LEFT JOIN deg USING (id)
        |GROUP BY 1 ORDER BY in_degree""".stripMargin,

    "q393_metadata_consistency" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_mismatch,
        |  CAST((sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)
        |    * 2000000 + count(*)) // (2 * count(*)) AS BIGINT)
        |    AS mismatch_ppm,
        |  CAST(max(abs(n_chars - length(text))) AS BIGINT)
        |    AS max_abs_delta
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q394_oov_transfer" ->
      """WITH u AS (SELECT source, string_split(text, ' ') AS tk,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
        |      / CAST(4294967296 AS DOUBLE) AS mem
        |  FROM documents),
        |vt AS (SELECT unnest(tk) AS token FROM u WHERE mem < 0.9),
        |h AS (SELECT token, count(*) AS tf FROM vt GROUP BY token),
        |v AS (SELECT token, 1 AS iv FROM
        |  (SELECT token, row_number() OVER (ORDER BY tf DESC, token)
        |    AS rk FROM h) WHERE rk <= 100),
        |et AS (SELECT source, unnest(tk) AS token FROM u
        |  WHERE mem >= 0.1)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN iv IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_oov,
        |  CAST((sum(CASE WHEN iv IS NULL THEN 1 ELSE 0 END) * 2000000
        |    + count(*)) // (2 * count(*)) AS BIGINT) AS oov_ppm
        |FROM et LEFT JOIN v USING (token)
        |GROUP BY source ORDER BY source""".stripMargin,

    "q395_pack_contamination" ->
      """WITH t AS (SELECT doc_id % 8 AS shard, doc_id, source,
        |    len(string_split(text, ' ')) AS n FROM documents),
        |c AS (SELECT shard, source,
        |    coalesce(sum(n) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS bf
        |  FROM t),
        |m AS (SELECT b.budget, shard, source, bf // b.budget AS bin
        |  FROM c CROSS JOIN
        |    (SELECT unnest([64, 128, 256]) AS budget) b),
        |g AS (SELECT budget, shard, bin, count(DISTINCT source) AS ns,
        |    count(*) AS nd FROM m GROUP BY 1, 2, 3)
        |SELECT CAST(budget AS BIGINT) AS budget,
        |  CAST(count(*) AS BIGINT) AS n_windows,
        |  CAST(sum(nd) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_mixed,
        |  CAST((sum(CASE WHEN ns > 1 THEN 1 ELSE 0 END) * 2000000
        |    + count(*)) // (2 * count(*)) AS BIGINT) AS mixed_ppm,
        |  CAST((sum(ns) * 200 + count(*)) // (2 * count(*)) AS DOUBLE)
        |    / 100 AS mean_sources
        |FROM g GROUP BY budget ORDER BY budget""".stripMargin,

    "q396_srp_fidelity" -> {
      val cosList = (w: Int) =>
        (0 to w).map(h => Math.cos(Math.PI * h / w))
          .mkString("[", ", ", "]")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
         |  FROM embeddings),
         |bb AS (SELECT 4 + (CASE WHEN count(*) >= 1000 THEN 2 ELSE 0 END)
         |    + (CASE WHEN count(*) >= 4000 THEN 2 ELSE 0 END)
         |    + (CASE WHEN count(*) >= 16000 THEN 2 ELSE 0 END)
         |    + (CASE WHEN count(*) >= 64000 THEN 2 ELSE 0 END)
         |    + (CASE WHEN count(*) >= 256000 THEN 2 ELSE 0 END)
         |    + (CASE WHEN count(*) >= 1024000 THEN 2 ELSE 0 END) AS bits
         |  FROM e),
         |n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm,
         |  CAST(list_sum(list_transform(range(bits),
         |    j -> CASE WHEN emb[j + 1] > 0 THEN 1 << j ELSE 0 END))
         |    AS INT) AS bucket
         |  FROM e CROSS JOIN bb),
         |signs AS (SELECT i, j,
         |    CASE WHEN substr(md5(i || ':' || j), 1, 1) < '8'
         |      THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END AS s
         |  FROM (SELECT unnest(range(0, 64)) AS i),
         |    (SELECT unnest(range(0, 16)) AS j)),
         |tok AS (SELECT vec_id, generate_subscripts(emb, 1) - 1 AS i,
         |    unnest(emb) AS x
         |  FROM e),
         |bits AS (SELECT vec_id, j,
         |    CASE WHEN sum(CAST(round(x * s, 8) AS DECIMAL(20,8))) > 0
         |      THEN 1 ELSE 0 END AS bit
         |  FROM tok JOIN signs USING (i) GROUP BY vec_id, j),
         |pb AS (SELECT vec_id, emb, nrm,
         |  unnest(list_concat([bucket], list_transform(range(bits),
         |    j -> xor(bucket, CAST(1 << j AS INT))))) AS bucket
         |  FROM n CROSS JOIN bb),
         |p AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
         |    list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) AS sim
         |  FROM pb a JOIN n b ON a.bucket = b.bucket
         |    AND a.vec_id < b.vec_id
         |  WHERE a.nrm > 0 AND b.nrm > 0),
         |hm AS (SELECT p.id_a, p.id_b, p.sim, w.w,
         |    CAST(sum(CASE WHEN ba.bit <> bb.bit THEN 1 ELSE 0 END)
         |      AS INT) AS h
         |  FROM p
         |  JOIN bits ba ON ba.vec_id = p.id_a
         |  JOIN bits bb ON bb.vec_id = p.id_b AND bb.j = ba.j
         |  CROSS JOIN (SELECT unnest([4, 8, 16]) AS w) w
         |  WHERE ba.j < w.w
         |  GROUP BY 1, 2, 3, 4),
         |er AS (SELECT w,
         |    round(est - sim, 12)::DECIMAL(38,12) AS err,
         |    round(abs(est - sim), 12)::DECIMAL(38,12) AS ab
         |  FROM (SELECT w, sim,
         |    CASE WHEN w = 4 THEN (${cosList(4)})[h + 1]
         |      WHEN w = 8 THEN (${cosList(8)})[h + 1]
         |      ELSE (${cosList(16)})[h + 1] END AS est FROM hm))
         |SELECT CAST(w AS BIGINT) AS width,
         |  CAST(count(*) AS BIGINT) AS n_pairs,
         |  round(CAST(sum(ab) AS DOUBLE) / count(*), 6) AS mae,
         |  round(CAST(sum(err) AS DOUBLE) / count(*), 6) + 0.0 AS bias
         |FROM er GROUP BY w ORDER BY width""".stripMargin
    },

    "q397_ann_recall" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
        |  FROM embeddings),
        |n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm,
        |  CAST(emb[1] > 0 AS INT) * 1 + CAST(emb[2] > 0 AS INT) * 2
        |    + CAST(emb[3] > 0 AS INT) * 4 + CAST(emb[4] > 0 AS INT) * 8
        |    AS bucket
        |  FROM e),
        |q AS (SELECT * FROM n WHERE vec_id % 20 = 0),
        |ex AS (SELECT vec_id, neighbor_id FROM (
        |  SELECT q.vec_id, b.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_dot_product(q.emb, b.emb) / (q.nrm * b.nrm)
        |        DESC, b.vec_id) AS rn
        |  FROM q, n b WHERE b.vec_id <> q.vec_id) WHERE rn <= 5),
        |pb AS (SELECT vec_id, emb, nrm, unnest([
        |    {'pb': bucket, 'hd': 0},
        |    {'pb': xor(bucket, 1), 'hd': 1}, {'pb': xor(bucket, 2), 'hd': 1},
        |    {'pb': xor(bucket, 4), 'hd': 1}, {'pb': xor(bucket, 8), 'hd': 1},
        |    {'pb': xor(bucket, 3), 'hd': 2}, {'pb': xor(bucket, 5), 'hd': 2},
        |    {'pb': xor(bucket, 9), 'hd': 2}, {'pb': xor(bucket, 6), 'hd': 2},
        |    {'pb': xor(bucket, 10), 'hd': 2}, {'pb': xor(bucket, 12), 'hd': 2}
        |  ]) AS pr FROM q),
        |cand AS (SELECT a.vec_id, b.vec_id AS neighbor_id,
        |    min(a.pr.hd) AS hd,
        |    max(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm)) AS sim
        |  FROM pb a JOIN n b ON b.bucket = a.pr.pb
        |    AND b.vec_id <> a.vec_id
        |  GROUP BY 1, 2),
        |lv AS (SELECT l.lvl, vec_id, neighbor_id, sim FROM cand
        |  CROSS JOIN (SELECT unnest([0, 1, 2]) AS lvl) l
        |  WHERE hd <= l.lvl),
        |tk AS (SELECT lvl, vec_id, neighbor_id FROM (
        |  SELECT lvl, vec_id, neighbor_id,
        |    row_number() OVER (PARTITION BY lvl, vec_id
        |      ORDER BY sim DESC, neighbor_id) AS rn
        |  FROM lv) WHERE rn <= 5),
        |nq AS (SELECT count(*) AS nq FROM q),
        |h AS (SELECT lvl, count(ex.vec_id) AS n_hits
        |  FROM tk LEFT JOIN ex ON ex.vec_id = tk.vec_id
        |    AND ex.neighbor_id = tk.neighbor_id
        |  GROUP BY lvl)
        |SELECT CAST(lvl AS BIGINT) AS level,
        |  CAST(nq AS BIGINT) AS n_queries,
        |  CAST(n_hits AS BIGINT) AS n_hits,
        |  CAST((n_hits * 2000000 + 5 * nq) // (2 * 5 * nq) AS BIGINT)
        |    AS recall_ppm
        |FROM h, nq ORDER BY level""".stripMargin,

    "q398_crosslang_neardup" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
        |  FROM embeddings),
        |n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm,
        |  CAST(emb[1] > 0 AS INT) * 1 + CAST(emb[2] > 0 AS INT) * 2
        |    + CAST(emb[3] > 0 AS INT) * 4 + CAST(emb[4] > 0 AS INT) * 8
        |    AS bucket
        |  FROM e),
        |pb AS (SELECT vec_id, emb, nrm,
        |  unnest([bucket, xor(bucket, 1), xor(bucket, 2), xor(bucket, 4),
        |          xor(bucket, 8)]) AS bucket
        |  FROM n),
        |p AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
        |    round(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 6)
        |      AS sim
        |  FROM pb a JOIN n b ON a.bucket = b.bucket
        |    AND a.vec_id < b.vec_id
        |  WHERE list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) > 0.35),
        |g AS (SELECT least(la.lang, lb.lang) AS lang_lo,
        |    greatest(la.lang, lb.lang) AS lang_hi, sim
        |  FROM p JOIN documents la ON la.doc_id = p.id_a
        |  JOIN documents lb ON lb.doc_id = p.id_b)
        |SELECT lang_lo, lang_hi,
        |  CAST(lang_lo <> lang_hi AS INT) AS is_cross,
        |  CAST(count(*) AS BIGINT) AS n_pairs,
        |  round(CAST(sum(round(sim, 12)::DECIMAL(38,12)) AS DOUBLE)
        |    / count(*), 6) AS mean_sim
        |FROM g GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q399_dedup_transitivity" ->
      s"""WITH $shinglesCte,
         |szs AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |${minhashSig(4, 2)},
         |cand AS (${minhashPairs(4, 2)}),
         |com AS (SELECT c.doc_a, c.doc_b, count(*) AS c
         |  FROM cand c
         |  JOIN sh x ON x.doc_id = c.doc_a
         |  JOIN sh y ON y.doc_id = c.doc_b AND y.s = x.s
         |  GROUP BY c.doc_a, c.doc_b),
         |ed AS (SELECT com.doc_a AS a, com.doc_b AS b FROM com
         |  JOIN szs sa ON sa.doc_id = com.doc_a
         |  JOIN szs sb ON sb.doc_id = com.doc_b
         |  WHERE round(CAST(com.c AS DOUBLE) / (sa.n + sb.n - com.c), 6)
         |    >= 0.5),
         |deg AS (SELECT v, count(*) AS d FROM
         |  (SELECT a AS v FROM ed UNION ALL SELECT b AS v FROM ed)
         |  GROUP BY v),
         |p2 AS (SELECT coalesce(sum(d * (d - 1) // 2), 0) AS n_paths2,
         |    count(*) AS n_nodes FROM deg),
         |tri AS (SELECT count(*) AS n_triangles FROM ed e1
         |  JOIN ed e2 ON e2.a = e1.a AND e2.b > e1.b
         |  JOIN ed e3 ON e3.a = e1.b AND e3.b = e2.b),
         |ne AS (SELECT count(*) AS n_edges FROM ed)
         |SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
         |  CAST(n_edges AS BIGINT) AS n_edges,
         |  CAST(n_paths2 AS BIGINT) AS n_paths2,
         |  CAST(n_triangles AS BIGINT) AS n_triangles,
         |  CASE WHEN n_paths2 > 0 THEN
         |    CAST((n_triangles * 3 * 2000000 + n_paths2)
         |      // (2 * n_paths2) AS BIGINT) END AS transitivity_ppm
         |FROM p2, tri, ne""".stripMargin,

    "q400_char_compressibility" ->
      """WITH p AS (SELECT source, substr(text, i + 1, 2) AS b
        |  FROM documents, unnest(range(len(text) - 1)) AS g(i)
        |  WHERE len(text) >= 2),
        |bg AS (SELECT source, b, count(*) AS c FROM p GROUP BY 1, 2),
        |j AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_bigrams,
        |    CAST(count(*) AS BIGINT) AS n_distinct_bigrams,
        |    sum(round(c * ln(c), 12)::DECIMAL(38,12)) AS sj
        |  FROM bg GROUP BY source),
        |mg AS (SELECT source, substr(b, 1, 1) AS c1, sum(c) AS m
        |  FROM bg GROUP BY 1, 2),
        |m AS (SELECT source, sum(round(m * ln(m), 12)::DECIMAL(38,12))
        |    AS sm
        |  FROM mg GROUP BY source)
        |SELECT j.source AS source, n_bigrams, n_distinct_bigrams,
        |  round(CAST(sm - sj AS DOUBLE)
        |    / (CAST(n_bigrams AS DOUBLE) * 0.6931471805599453), 6) + 0.0
        |    AS cond_bits,
        |  round(CAST(sm - sj AS DOUBLE)
        |    / (CAST(n_bigrams AS DOUBLE) * 0.6931471805599453 * 8.0), 6)
        |    + 0.0 AS compress_ratio
        |FROM j JOIN m ON m.source = j.source ORDER BY source""".stripMargin,

    "q401_matryoshka_fidelity" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
        |  FROM embeddings),
        |bb AS (SELECT 4 + (CASE WHEN count(*) >= 1000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 4000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 16000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 64000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 256000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 1024000 THEN 2 ELSE 0 END) AS bits
        |  FROM e),
        |n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm,
        |  sqrt(list_dot_product(emb[1:8], emb[1:8])) AS n8,
        |  sqrt(list_dot_product(emb[1:16], emb[1:16])) AS n16,
        |  sqrt(list_dot_product(emb[1:32], emb[1:32])) AS n32,
        |  CAST(list_sum(list_transform(range(bits),
        |    j -> CASE WHEN emb[j + 1] > 0 THEN 1 << j ELSE 0 END))
        |    AS INT) AS bucket
        |  FROM e CROSS JOIN bb),
        |pb AS (SELECT vec_id, emb, nrm, n8, n16, n32,
        |  unnest(list_concat([bucket], list_transform(range(bits),
        |    j -> xor(bucket, CAST(1 << j AS INT))))) AS bucket
        |  FROM n CROSS JOIN bb),
        |p AS (SELECT a.emb AS ae, b.emb AS be,
        |    list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) AS sim,
        |    a.n8 AS n8a, b.n8 AS n8b, a.n16 AS n16a, b.n16 AS n16b,
        |    a.n32 AS n32a, b.n32 AS n32b
        |  FROM pb a JOIN n b ON a.bucket = b.bucket
        |    AND a.vec_id < b.vec_id
        |  WHERE a.n8 > 0 AND b.n8 > 0),
        |w AS (SELECT d.d, sim,
        |    CASE d.d
        |      WHEN 8 THEN list_dot_product(ae[1:8], be[1:8]) / (n8a * n8b)
        |      WHEN 16 THEN list_dot_product(ae[1:16], be[1:16])
        |        / (n16a * n16b)
        |      ELSE list_dot_product(ae[1:32], be[1:32]) / (n32a * n32b)
        |    END AS sd
        |  FROM p CROSS JOIN (SELECT unnest([8, 16, 32]) AS d) d),
        |er AS (SELECT d, round(sd - sim, 12)::DECIMAL(38,12) AS err,
        |    round(abs(sd - sim), 12)::DECIMAL(38,12) AS ab FROM w)
        |SELECT CAST(d AS BIGINT) AS dim,
        |  CAST(count(*) AS BIGINT) AS n_pairs,
        |  round(CAST(sum(ab) AS DOUBLE) / count(*), 6) AS mae,
        |  round(CAST(sum(err) AS DOUBLE) / count(*), 6) + 0.0 AS bias
        |FROM er GROUP BY d ORDER BY dim""".stripMargin,

    "q402_split_leakage" ->
      s"""WITH $shinglesCte,
         |szs AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |${minhashSig(4, 2)},
         |cand AS (${minhashPairs(4, 2)}),
         |com AS (SELECT c.doc_a, c.doc_b, count(*) AS c
         |  FROM cand c
         |  JOIN sh x ON x.doc_id = c.doc_a
         |  JOIN sh y ON y.doc_id = c.doc_b AND y.s = x.s
         |  GROUP BY c.doc_a, c.doc_b),
         |ed AS (SELECT com.doc_a AS a, com.doc_b AS b FROM com
         |  JOIN szs sa ON sa.doc_id = com.doc_a
         |  JOIN szs sb ON sb.doc_id = com.doc_b
         |  WHERE round(CAST(com.c AS DOUBLE) / (sa.n + sb.n - com.c), 6)
         |    >= 0.5),
         |lab AS (SELECT doc_id, source,
         |    CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
         |      / CAST(4294967296 AS DOUBLE) >= 0.9 AS INT) AS ev
         |  FROM documents),
         |dir AS (SELECT a AS s, b AS p FROM ed
         |  UNION ALL SELECT b AS s, a AS p FROM ed),
         |lk AS (SELECT DISTINCT d.s FROM dir d
         |  JOIN lab ls ON ls.doc_id = d.s AND ls.ev = 1
         |  JOIN lab lp ON lp.doc_id = d.p AND lp.ev = 0)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_eval,
         |  CAST(count(lk.s) AS BIGINT) AS n_leaked,
         |  CAST((count(lk.s) * 2000000 + count(*)) // (2 * count(*))
         |    AS BIGINT) AS leak_ppm
         |FROM lab LEFT JOIN lk ON lk.s = lab.doc_id
         |WHERE lab.ev = 1 GROUP BY source ORDER BY source""".stripMargin,

    "q403_trigram_accretion" ->
      s"""WITH $shinglesCte,
         |dd AS (SELECT doc_id,
         |    CAST(floor(('0x' || substr(md5(doc_id::VARCHAR), 1, 8))
         |      ::BIGINT / CAST(4294967296 AS DOUBLE) * 10) AS INT) AS d
         |  FROM documents),
         |fs AS (SELECT sh.s, min(dd.d) AS d FROM sh
         |  JOIN dd USING (doc_id) GROUP BY sh.s),
         |fh AS (SELECT d, count(*) AS n_new FROM fs GROUP BY d),
         |dc AS (SELECT d, count(*) AS n_docs FROM dd GROUP BY d),
         |g AS (SELECT dc.d, dc.n_docs, coalesce(fh.n_new, 0) AS n_new
         |  FROM dc LEFT JOIN fh USING (d))
         |SELECT CAST(d AS BIGINT) AS decile,
         |  CAST(n_docs AS BIGINT) AS n_docs,
         |  CAST(n_new AS BIGINT) AS n_new_trigrams,
         |  CAST(sum(n_new) OVER (ORDER BY d) AS BIGINT) AS cum_trigrams
         |FROM g ORDER BY decile""".stripMargin,

    "q404_filter_bias" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
        |    CAST(length(text) - (len(string_split(text, ' ')) - 1)
        |      AS BIGINT) AS ch
        |  FROM documents),
        |m AS (SELECT tk,
        |  CAST(n < 30 OR n > 80 AS BIGINT) AS f1,
        |  CAST(ch * 2 < n * 7 OR ch * 2 > n * 12 AS BIGINT) AS f2,
        |  CAST(CAST(list_aggregate(list_transform(list_distinct(tk),
        |    w -> len(list_filter(tk, x -> x = w))), 'max') AS BIGINT)
        |    * 5 > n AS BIGINT) AS f3,
        |  CAST(len(list_filter(tk, x -> list_contains(['the', 'a'], x)))
        |    = 0 AS BIGINT) AS f4,
        |  CAST(CAST(len(list_distinct(tk)) AS BIGINT) * 5 < n * 2
        |    AS BIGINT) AS f5
        |  FROM t),
        |rt AS (SELECT unnest(tk) AS tok, f1, f2, f3, f4, f5 FROM m),
        |ru AS (SELECT tok, u.r AS rule FROM rt, unnest([
        |    {'r': 'word_count', 'p': CASE WHEN f1 = 0 THEN 1 ELSE 0 END},
        |    {'r': 'mean_word_len',
        |     'p': CASE WHEN f2 = 0 THEN 1 ELSE 0 END},
        |    {'r': 'top_word_share',
        |     'p': CASE WHEN f3 = 0 THEN 1 ELSE 0 END},
        |    {'r': 'no_stopword', 'p': CASE WHEN f4 = 0 THEN 1 ELSE 0 END},
        |    {'r': 'distinct_ratio',
        |     'p': CASE WHEN f5 = 0 THEN 1 ELSE 0 END},
        |    {'r': 'all_rules',
        |     'p': CASE WHEN f1 + f2 + f3 + f4 + f5 = 0 THEN 1 ELSE 0 END},
        |    {'r': 'corpus', 'p': 1}]) AS g(u)
        |  WHERE u.p = 1),
        |st AS (SELECT rule, tok, count(*) AS c FROM ru GROUP BY 1, 2),
        |ct AS (SELECT tok, c AS ct FROM st WHERE rule = 'corpus'),
        |ns AS (SELECT rule, sum(c) AS ns FROM st WHERE rule <> 'corpus'
        |  GROUP BY rule),
        |nn AS (SELECT sum(ct) AS tn FROM ct),
        |j AS (SELECT rule, ns, ct, tn,
        |    CAST(c AS DOUBLE) / ns AS p, CAST(ct AS DOUBLE) / tn AS q
        |  FROM st JOIN ct USING (tok) JOIN ns USING (rule)
        |    CROSS JOIN nn
        |  WHERE rule <> 'corpus'),
        |t3 AS (SELECT rule, ns, ct, tn,
        |    round((p * ln(p / ((p + q) / 2))
        |      + q * ln(q / ((p + q) / 2))) / 2, 12)
        |      ::DECIMAL(38,12) AS term FROM j),
        |g AS (SELECT rule, CAST(max(ns) AS BIGINT) AS n_tokens,
        |    sum(term) AS s, CAST(sum(ct) AS BIGINT) AS cp,
        |    CAST(max(tn) AS BIGINT) AS nn2 FROM t3 GROUP BY rule)
        |SELECT rule, n_tokens,
        |  round(CAST(s + round(CAST(nn2 - cp AS DOUBLE) / nn2
        |    * ln(2.0) / 2, 12)::DECIMAL(38,12) AS DOUBLE), 6) + 0.0
        |    AS js_nats
        |FROM g ORDER BY rule""".stripMargin,

    "q405_quant_fidelity" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
        |  FROM embeddings),
        |bb AS (SELECT 4 + (CASE WHEN count(*) >= 1000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 4000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 16000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 64000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 256000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 1024000 THEN 2 ELSE 0 END) AS bits
        |  FROM e),
        |s AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm,
        |  list_min(emb) AS mn,
        |  CASE WHEN list_max(emb) = list_min(emb) THEN CAST(1.0 AS DOUBLE)
        |       ELSE (list_max(emb) - list_min(emb)) / CAST(15.0 AS DOUBLE)
        |  END AS s15,
        |  CASE WHEN list_max(emb) = list_min(emb) THEN CAST(1.0 AS DOUBLE)
        |       ELSE (list_max(emb) - list_min(emb)) / CAST(255.0 AS DOUBLE)
        |  END AS s255,
        |  CAST(list_sum(list_transform(range(bits),
        |    j -> CASE WHEN emb[j + 1] > 0 THEN 1 << j ELSE 0 END))
        |    AS INT) AS bucket
        |  FROM e CROSS JOIN bb),
        |r AS (SELECT vec_id, emb, nrm, bucket,
        |  list_transform(emb, x -> CAST(round((x - mn) / s15) AS INT)
        |    * s15 + mn) AS r15,
        |  list_transform(emb, x -> CAST(round((x - mn) / s255) AS INT)
        |    * s255 + mn) AS r255
        |  FROM s),
        |n AS (SELECT vec_id, emb, nrm, bucket, r15, r255,
        |  sqrt(list_dot_product(r15, r15)) AS q15,
        |  sqrt(list_dot_product(r255, r255)) AS q255
        |  FROM r),
        |pb AS (SELECT vec_id, emb, nrm, r15, r255, q15, q255,
        |  unnest(list_concat([bucket], list_transform(range(bits),
        |    j -> xor(bucket, CAST(1 << j AS INT))))) AS bucket
        |  FROM n CROSS JOIN bb),
        |p AS (SELECT
        |    list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) AS sim,
        |    a.r15 AS r15a, b.r15 AS r15b, a.q15 AS q15a, b.q15 AS q15b,
        |    a.r255 AS r255a, b.r255 AS r255b,
        |    a.q255 AS q255a, b.q255 AS q255b
        |  FROM pb a JOIN n b ON a.bucket = b.bucket
        |    AND a.vec_id < b.vec_id
        |  WHERE a.nrm > 0 AND b.nrm > 0),
        |w AS (SELECT u.l AS l, sim, u.s AS sq FROM p, unnest([
        |    {'l': 15, 's': CASE WHEN q15a > 0 AND q15b > 0
        |      THEN list_dot_product(r15a, r15b) / (q15a * q15b) END},
        |    {'l': 255, 's': CASE WHEN q255a > 0 AND q255b > 0
        |      THEN list_dot_product(r255a, r255b) / (q255a * q255b) END}
        |  ]) AS g(u)
        |  WHERE u.s IS NOT NULL),
        |er AS (SELECT l, round(sq - sim, 12)::DECIMAL(38,12) AS err,
        |    round(abs(sq - sim), 12)::DECIMAL(38,12) AS ab FROM w)
        |SELECT CAST(l AS BIGINT) AS level,
        |  CAST(count(*) AS BIGINT) AS n_pairs,
        |  round(CAST(sum(ab) AS DOUBLE) / count(*), 6) AS mae,
        |  round(CAST(sum(err) AS DOUBLE) / count(*), 6) + 0.0 AS bias
        |FROM er GROUP BY l ORDER BY level""".stripMargin,

    "q406_cluster_spectrum" ->
      s"""WITH RECURSIVE $shinglesCte,
         |${minhashSig(4, 2)},
         |pairs AS (${minhashPairs(4, 2)}),
         |ed AS (SELECT doc_a AS s, doc_b AS d FROM pairs
         |       UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(node, anc) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.d, r.anc FROM reach r JOIN ed e ON e.s = r.node),
         |cc AS (SELECT node, min(anc) AS label FROM reach GROUP BY node),
         |cl AS (SELECT label, CAST(count(*) AS BIGINT) AS sz FROM cc
         |  GROUP BY label),
         |o AS (SELECT CAST(length(bin(sz)) - 1 AS INT) AS octave, sz
         |  FROM cl WHERE sz > 1)
         |SELECT octave, CAST(count(*) AS BIGINT) AS n_clusters,
         |  CAST(sum(sz) AS BIGINT) AS n_docs,
         |  CAST(max(sz) AS BIGINT) AS max_cluster
         |FROM o GROUP BY octave ORDER BY octave""".stripMargin,

    "q407_quant_recall" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
        |  FROM embeddings),
        |bb AS (SELECT 4 + (CASE WHEN count(*) >= 1000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 4000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 16000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 64000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 256000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 1024000 THEN 2 ELSE 0 END) AS bits
        |  FROM e),
        |s AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm,
        |  list_min(emb) AS mn,
        |  CASE WHEN list_max(emb) = list_min(emb) THEN CAST(1.0 AS DOUBLE)
        |       ELSE (list_max(emb) - list_min(emb)) / CAST(15.0 AS DOUBLE)
        |  END AS s15,
        |  CASE WHEN list_max(emb) = list_min(emb) THEN CAST(1.0 AS DOUBLE)
        |       ELSE (list_max(emb) - list_min(emb)) / CAST(255.0 AS DOUBLE)
        |  END AS s255,
        |  CAST(list_sum(list_transform(range(bits),
        |    j -> CASE WHEN emb[j + 1] > 0 THEN 1 << j ELSE 0 END))
        |    AS INT) AS bucket
        |  FROM e CROSS JOIN bb),
        |r AS (SELECT vec_id, emb, nrm, bucket,
        |  list_transform(emb, x -> CAST(round((x - mn) / s15) AS INT)
        |    * s15 + mn) AS r15,
        |  list_transform(emb, x -> CAST(round((x - mn) / s255) AS INT)
        |    * s255 + mn) AS r255
        |  FROM s),
        |n AS (SELECT vec_id, emb, nrm, bucket, r15, r255,
        |  sqrt(list_dot_product(r15, r15)) AS q15,
        |  sqrt(list_dot_product(r255, r255)) AS q255
        |  FROM r),
        |pb AS (SELECT vec_id, emb, nrm, r15, r255, q15, q255,
        |  unnest(list_concat([bucket], list_transform(range(bits),
        |    j -> xor(bucket, CAST(1 << j AS INT))))) AS bucket
        |  FROM n CROSS JOIN bb),
        |cand AS (SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
        |    list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) AS sim,
        |    CASE WHEN a.q15 > 0 AND b.q15 > 0
        |      THEN list_dot_product(a.r15, b.r15) / (a.q15 * b.q15)
        |    END AS s15,
        |    CASE WHEN a.q255 > 0 AND b.q255 > 0
        |      THEN list_dot_product(a.r255, b.r255) / (a.q255 * b.q255)
        |    END AS s255
        |  FROM pb a JOIN n b ON a.bucket = b.bucket
        |    AND a.vec_id <> b.vec_id
        |  WHERE a.nrm > 0 AND b.nrm > 0),
        |ft AS (SELECT vec_id, neighbor_id FROM (
        |  SELECT vec_id, neighbor_id, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY sim DESC, neighbor_id) AS rn
        |  FROM cand) WHERE rn <= 5),
        |t15 AS (SELECT vec_id, neighbor_id FROM (
        |  SELECT vec_id, neighbor_id, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY s15 DESC, neighbor_id) AS rn
        |  FROM cand WHERE s15 IS NOT NULL) WHERE rn <= 5),
        |t255 AS (SELECT vec_id, neighbor_id FROM (
        |  SELECT vec_id, neighbor_id, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY s255 DESC, neighbor_id) AS rn
        |  FROM cand WHERE s255 IS NOT NULL) WHERE rn <= 5),
        |nt AS (SELECT count(*) AS nt FROM ft),
        |lv AS (SELECT 15 AS level, count(*) AS n_hits
        |    FROM t15 JOIN ft USING (vec_id, neighbor_id)
        |  UNION ALL SELECT 255, count(*)
        |    FROM t255 JOIN ft USING (vec_id, neighbor_id))
        |SELECT CAST(level AS BIGINT) AS level,
        |  CAST(nt AS BIGINT) AS n_top,
        |  CAST(n_hits AS BIGINT) AS n_hits,
        |  CASE WHEN nt > 0 THEN
        |    CAST((n_hits * 2000000 + nt) // (2 * nt) AS BIGINT)
        |  END AS agree_ppm
        |FROM lv, nt ORDER BY level""".stripMargin,

    "q408_incremental_dedup" ->
      """WITH lab AS (SELECT source, text,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
        |      / CAST(4294967296 AS DOUBLE) AS mem
        |  FROM documents),
        |oldh AS (SELECT DISTINCT md5(text) AS h FROM lab
        |  WHERE mem < 0.9),
        |nw AS (SELECT source, md5(text) AS h,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
        |  FROM lab WHERE mem >= 0.9)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_new,
        |  CAST(count(oldh.h) AS BIGINT) AS n_hit,
        |  CAST((count(oldh.h) * 2000000 + count(*)) // (2 * count(*))
        |    AS BIGINT) AS hit_ppm,
        |  CAST(sum(CASE WHEN oldh.h IS NOT NULL THEN tok ELSE 0 END)
        |    AS BIGINT) AS tokens_dropped
        |FROM nw LEFT JOIN oldh USING (h)
        |GROUP BY source ORDER BY source""".stripMargin,

    "q409_dup_position" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents),
        |ch AS (SELECT doc_id, (len(t) - 1) // 20 + 1 AS nc, i AS idx,
        |    md5(array_to_string(t[i * 20 + 1 : i * 20 + 20], ' ')) AS h
        |  FROM t, unnest(range((len(t) - 1) // 20 + 1)) AS g(i)),
        |d AS (SELECT idx, nc,
        |    count(*) OVER (PARTITION BY h) AS f FROM ch),
        |p AS (SELECT least(9, (idx * 10) // nc) AS pos_decile,
        |    CASE WHEN f > 1 THEN 1 ELSE 0 END AS dup FROM d)
        |SELECT CAST(pos_decile AS BIGINT) AS pos_decile,
        |  CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(dup) AS BIGINT) AS n_dup,
        |  CAST((sum(dup) * 2000000 + count(*)) // (2 * count(*))
        |    AS BIGINT) AS dup_ppm
        |FROM p GROUP BY pos_decile ORDER BY pos_decile""".stripMargin,

    "q410_bloom_dedup_cost" ->
      """WITH ii AS (SELECT unnest([0, 1, 2, 3]) AS i),
        |lab AS (SELECT source, text,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
        |      / CAST(4294967296 AS DOUBLE) AS mem
        |  FROM documents),
        |bld AS (SELECT DISTINCT md5(text) AS k FROM lab
        |  WHERE mem < 0.9),
        |pos AS (SELECT k,
        |  ('0x' || substr(md5(k), i * 8 + 1, 8))::BIGINT % 8192 AS p
        |  FROM bld CROSS JOIN ii),
        |fw AS (SELECT p // 32 AS w,
        |  bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS mask
        |  FROM pos GROUP BY p // 32),
        |nw AS (SELECT md5(text) AS h, source FROM lab WHERE mem >= 0.9),
        |pr AS (SELECT h, source,
        |  ('0x' || substr(md5(h), i * 8 + 1, 8))::BIGINT % 8192 AS p
        |  FROM nw CROSS JOIN ii),
        |pb AS (SELECT h, source,
        |  min(CASE WHEN fw.mask IS NOT NULL AND
        |    (fw.mask & (1::BIGINT << CAST(pr.p % 32 AS INT))) <> 0
        |    THEN 1 ELSE 0 END) AS pos
        |  FROM pr LEFT JOIN fw ON fw.w = pr.p // 32
        |  GROUP BY h, source),
        |mem_ AS (SELECT pb.source, pb.pos,
        |  CASE WHEN t.k IS NULL THEN 0 ELSE 1 END AS istrue
        |  FROM pb LEFT JOIN bld t ON t.k = pb.h),
        |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_probed,
        |  CAST(sum(pos) AS BIGINT) AS n_bloom_pos,
        |  CAST(sum(istrue) AS BIGINT) AS n_member,
        |  CAST(sum(pos) - sum(istrue) AS BIGINT) AS n_false_pos
        |  FROM mem_ GROUP BY source)
        |SELECT source, n_probed, n_member, n_bloom_pos, n_false_pos,
        |  CASE WHEN n_probed > n_member THEN
        |    CAST((n_false_pos * 2000000 + (n_probed - n_member))
        |      // (2 * (n_probed - n_member)) AS BIGINT)
        |  END AS fp_ppm
        |FROM g ORDER BY source""".stripMargin,

    "q411_candidate_precision" -> {
      val bandConds = (0 until 4).map { b =>
        val conds = (0 until 2).map(r =>
          s"sa.h_${b}_$r = sb.h_${b}_$r").mkString(" AND ")
        s"(CASE WHEN $conds THEN 1 ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH $shinglesCte,
         |szs AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |${minhashSig(4, 2)},
         |cand AS (${minhashPairs(4, 2)}),
         |bb AS (SELECT cand.doc_a, cand.doc_b, $bandConds AS nb
         |  FROM cand JOIN sig sa ON sa.doc_id = cand.doc_a
         |  JOIN sig sb ON sb.doc_id = cand.doc_b),
         |com AS (SELECT c.doc_a, c.doc_b, count(*) AS c
         |  FROM cand c
         |  JOIN sh x ON x.doc_id = c.doc_a
         |  JOIN sh y ON y.doc_id = c.doc_b AND y.s = x.s
         |  GROUP BY c.doc_a, c.doc_b),
         |pq AS (SELECT bb.nb, coalesce(com.c, 0) AS c, sa2.n AS na,
         |    sb2.n AS nb2
         |  FROM bb
         |  LEFT JOIN com ON com.doc_a = bb.doc_a
         |    AND com.doc_b = bb.doc_b
         |  JOIN szs sa2 ON sa2.doc_id = bb.doc_a
         |  JOIN szs sb2 ON sb2.doc_id = bb.doc_b),
         |jj AS (SELECT nb,
         |    CAST(c AS DOUBLE) / (na + nb2 - c) AS j FROM pq)
         |SELECT CAST(nb AS BIGINT) AS n_bands,
         |  CAST(count(*) AS BIGINT) AS n_cands,
         |  CAST(sum(CASE WHEN round(j, 6) >= 0.5 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_verified,
         |  CAST((sum(CASE WHEN round(j, 6) >= 0.5 THEN 1 ELSE 0 END)
         |    * 2000000 + count(*)) // (2 * count(*)) AS BIGINT)
         |    AS precision_ppm,
         |  round(CAST(sum(round(j, 12)::DECIMAL(38,12)) AS DOUBLE)
         |    / count(*), 6) AS mean_jaccard
         |FROM jj GROUP BY nb ORDER BY n_bands""".stripMargin
    },

    "q412_chunk_scheme_census" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents),
        |fx AS (SELECT 'fixed' AS scheme, doc_id AS doc,
        |    md5(array_to_string(t[i * 20 + 1 : i * 20 + 20], ' ')) AS h
        |  FROM t, unnest(range((len(t) - 1) // 20 + 1)) AS g(i)),
        |p AS (SELECT doc_id, unnest(list_transform(range(len(t)),
        |    i -> {'pos': i, 'w': t[i + 1]})) AS u FROM t),
        |q AS (SELECT doc_id, u.pos AS pos, u.w AS w,
        |  CASE WHEN substr(md5(u.w), 1, 1) = '0' THEN 1 ELSE 0 END AS b
        |  FROM p),
        |ck AS (SELECT doc_id, pos, w,
        |  coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS chunk FROM q),
        |cd AS (SELECT 'cdc' AS scheme, doc_id AS doc,
        |  md5(string_agg(w, ' ' ORDER BY pos)) AS h
        |  FROM ck GROUP BY doc_id, chunk),
        |al AS (SELECT * FROM fx UNION ALL SELECT * FROM cd),
        |fam AS (SELECT scheme, h, count(*) AS f FROM al
        |  GROUP BY scheme, h HAVING count(*) > 1),
        |cen AS (SELECT scheme, CAST(count(*) AS BIGINT) AS n_families,
        |  CAST(sum(f) AS BIGINT) AS n_dup_chunks,
        |  CAST(sum(f * (f - 1) // 2) AS BIGINT) AS n_verify_pairs,
        |  CAST(max(f) AS BIGINT) AS max_family
        |  FROM fam GROUP BY scheme),
        |dt AS (SELECT al.scheme,
        |    CAST(count(DISTINCT al.doc) AS BIGINT) AS n_docs_touched
        |  FROM al JOIN fam ON fam.scheme = al.scheme AND fam.h = al.h
        |  GROUP BY al.scheme)
        |SELECT cen.scheme AS scheme, n_families, n_dup_chunks,
        |  coalesce(n_docs_touched, 0) AS n_docs_touched,
        |  n_verify_pairs, max_family
        |FROM cen LEFT JOIN dt ON dt.scheme = cen.scheme
        |ORDER BY scheme""".stripMargin,

    "q413_deletion_radius" ->
      s"""WITH $shinglesCte,
         |szs AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |${minhashSig(4, 2)},
         |cand AS (${minhashPairs(4, 2)}),
         |com AS (SELECT c.doc_a, c.doc_b, count(*) AS c
         |  FROM cand c
         |  JOIN sh x ON x.doc_id = c.doc_a
         |  JOIN sh y ON y.doc_id = c.doc_b AND y.s = x.s
         |  GROUP BY c.doc_a, c.doc_b),
         |ed AS (SELECT com.doc_a AS a, com.doc_b AS b FROM com
         |  JOIN szs sa ON sa.doc_id = com.doc_a
         |  JOIN szs sb ON sb.doc_id = com.doc_b
         |  WHERE round(CAST(com.c AS DOUBLE) / (sa.n + sb.n - com.c), 6)
         |    >= 0.5),
         |lab AS (SELECT doc_id, source,
         |    CAST(('0x' || substr(md5('del' || '|' || doc_id::VARCHAR),
         |      1, 8))::BIGINT / CAST(4294967296 AS DOUBLE) >= 0.97
         |      AS INT) AS ev
         |  FROM documents),
         |dir AS (SELECT a AS s, b AS p FROM ed
         |  UNION ALL SELECT b AS s, a AS p FROM ed),
         |lk AS (SELECT DISTINCT d.s FROM dir d
         |  JOIN lab ls ON ls.doc_id = d.s AND ls.ev = 1
         |  JOIN lab lp ON lp.doc_id = d.p AND lp.ev = 0)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_deleted,
         |  CAST(count(lk.s) AS BIGINT) AS n_residual,
         |  CAST((count(lk.s) * 2000000 + count(*)) // (2 * count(*))
         |    AS BIGINT) AS residual_ppm
         |FROM lab LEFT JOIN lk ON lk.s = lab.doc_id
         |WHERE lab.ev = 1 GROUP BY source ORDER BY source""".stripMargin,

    "q414_noise_matrix" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb, label
        |  FROM embeddings),
        |n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm,
        |  CAST(emb[1] > 0 AS INT) * 1 + CAST(emb[2] > 0 AS INT) * 2
        |    + CAST(emb[3] > 0 AS INT) * 4 + CAST(emb[4] > 0 AS INT) * 8
        |    AS bucket
        |  FROM e),
        |pb AS (SELECT vec_id, emb, nrm,
        |  unnest([bucket, xor(bucket, 1), xor(bucket, 2), xor(bucket, 4),
        |          xor(bucket, 8)]) AS bucket
        |  FROM n),
        |p AS (SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
        |    list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) AS sim
        |  FROM pb a JOIN n b ON a.bucket = b.bucket
        |    AND a.vec_id <> b.vec_id),
        |t AS (SELECT vec_id, neighbor_id FROM (
        |  SELECT vec_id, neighbor_id, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY sim DESC, neighbor_id) AS rn
        |  FROM p) WHERE rn <= 5),
        |cnt AS (SELECT t.vec_id, lb.label AS nl, count(*) AS c
        |  FROM t JOIN e lb ON lb.vec_id = t.neighbor_id
        |  GROUP BY 1, 2),
        |prd AS (SELECT vec_id, nl AS pred FROM (
        |  SELECT vec_id, nl, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY c DESC, nl) AS rn FROM cnt) WHERE rn = 1),
        |j AS (SELECT CAST(g.label AS BIGINT) AS given_label,
        |    CAST(prd.pred AS BIGINT) AS predicted_label
        |  FROM prd JOIN e g ON g.vec_id = prd.vec_id),
        |jc AS (SELECT given_label, predicted_label,
        |    CAST(count(*) AS BIGINT) AS n_vectors
        |  FROM j GROUP BY 1, 2),
        |tt AS (SELECT given_label, sum(n_vectors) AS t FROM jc
        |  GROUP BY 1)
        |SELECT jc.given_label, jc.predicted_label, jc.n_vectors,
        |  CAST((n_vectors * 2000000 + t) // (2 * t) AS BIGINT)
        |    AS class_share_ppm
        |FROM jc JOIN tt USING (given_label)
        |ORDER BY given_label, predicted_label""".stripMargin,

    "q415_temporal_split" ->
      """WITH e AS (SELECT event_type, user_id, epoch_us(ts) AS t
        |  FROM events),
        |b AS (SELECT (min(t) + max(t)) // 2 AS mid FROM e),
        |g AS (SELECT event_type, user_id,
        |    sum(CASE WHEN t < mid THEN 1 ELSE 0 END) AS nb,
        |    sum(CASE WHEN t >= mid THEN 1 ELSE 0 END) AS na
        |  FROM e, b GROUP BY 1, 2)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_entities,
        |  CAST(sum(CASE WHEN nb > 0 AND na > 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_straddling,
        |  CAST((sum(CASE WHEN nb > 0 AND na > 0 THEN 1 ELSE 0 END)
        |    * 2000000 + count(*)) // (2 * count(*)) AS BIGINT)
        |    AS straddle_ppm,
        |  CAST(sum(nb) AS BIGINT) AS n_before,
        |  CAST(sum(na) AS BIGINT) AS n_after
        |FROM g GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q416_cluster_split" ->
      s"""WITH RECURSIVE $shinglesCte,
         |${minhashSig(4, 2)},
         |pairs AS (${minhashPairs(4, 2)}),
         |ed AS (SELECT doc_a AS s, doc_b AS d FROM pairs
         |       UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(node, anc) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.d, r.anc FROM reach r JOIN ed e ON e.s = r.node),
         |cc AS (SELECT node, min(anc) AS label FROM reach GROUP BY node),
         |lab AS (SELECT d.source,
         |    CASE WHEN ('0x' || substr(md5(cc.label::VARCHAR), 1, 8))
         |      ::BIGINT / CAST(4294967296 AS DOUBLE) >= 0.9
         |      THEN 1 ELSE 0 END AS ev
         |  FROM documents d JOIN cc ON cc.node = d.doc_id)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(ev) AS BIGINT) AS n_eval,
         |  CAST((sum(ev) * 2000000 + count(*)) // (2 * count(*))
         |    AS BIGINT) AS eval_ppm
         |FROM lab GROUP BY source ORDER BY source""".stripMargin,

    "q417_maxsim" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
        |  FROM embeddings),
        |n AS (SELECT vec_id, vec_id // 4 AS g, emb,
        |  sqrt(list_dot_product(emb, emb)) AS nrm,
        |  CAST(emb[1] > 0 AS INT) * 1 + CAST(emb[2] > 0 AS INT) * 2
        |    + CAST(emb[3] > 0 AS INT) * 4 + CAST(emb[4] > 0 AS INT) * 8
        |    AS bucket
        |  FROM e),
        |q AS (SELECT * FROM n WHERE g % 10 = 0),
        |pb AS (SELECT vec_id, g, emb, nrm,
        |  unnest([bucket, xor(bucket, 1), xor(bucket, 2), xor(bucket, 4),
        |          xor(bucket, 8)]) AS bucket
        |  FROM q),
        |cd AS (SELECT a.g AS qgroup, b.g AS cgroup, a.vec_id AS qv,
        |    max(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm)) AS mx
        |  FROM pb a JOIN n b ON a.bucket = b.bucket
        |  WHERE a.g <> b.g AND a.nrm > 0 AND b.nrm > 0
        |  GROUP BY 1, 2, 3),
        |sc AS (SELECT qgroup, cgroup,
        |    CAST(sum(round(mx, 12)::DECIMAL(38,12)) AS DOUBLE) AS score
        |  FROM cd GROUP BY 1, 2),
        |tk AS (SELECT qgroup, cgroup, score FROM (
        |  SELECT qgroup, cgroup, score, row_number() OVER (
        |    PARTITION BY qgroup ORDER BY score DESC, cgroup) AS rn
        |  FROM sc) WHERE rn <= 3)
        |SELECT qgroup, cgroup, round(score, 6) AS score FROM tk
        |ORDER BY qgroup, cgroup""".stripMargin,

    "q418_scaling_proxy" ->
      """WITH dd AS (SELECT CAST(floor(('0x' || substr(
        |      md5(doc_id::VARCHAR), 1, 8))::BIGINT
        |      / CAST(4294967296 AS DOUBLE) * 10) AS INT) AS d, text
        |  FROM documents),
        |tok AS (SELECT d, unnest(string_split(text, ' ')) AS tok
        |  FROM dd),
        |tr AS (SELECT d, tok, count(*) AS c FROM tok WHERE d < 9
        |  GROUP BY 1, 2),
        |cum AS (SELECT sp.s, tr.tok, sum(tr.c) AS cs FROM tr
        |  JOIN (SELECT unnest(range(9)) AS s) sp ON tr.d <= sp.s
        |  GROUP BY 1, 2),
        |ns AS (SELECT s, sum(cs) AS ns FROM cum GROUP BY s),
        |v AS (SELECT count(DISTINCT tok) AS v FROM tr),
        |ev AS (SELECT tok, count(*) AS ce FROM tok WHERE d = 9
        |  GROUP BY tok),
        |ne AS (SELECT sum(ce) AS ne FROM ev),
        |m AS (SELECT cum.s, ns.ns, v.v, ne.ne,
        |    sum(round(ce * ln((cs + 1)::DOUBLE / (ns.ns + v.v + 1)), 12)
        |      ::DECIMAL(38,12)) AS sm,
        |    sum(ce) AS me
        |  FROM cum JOIN ev USING (tok) JOIN ns USING (s)
        |    CROSS JOIN v CROSS JOIN ne
        |  GROUP BY 1, 2, 3, 4)
        |SELECT CAST(s AS BIGINT) AS train_slices,
        |  CAST(ns AS BIGINT) AS n_train_tokens,
        |  CAST(ne AS BIGINT) AS n_eval_tokens,
        |  round(-CAST(sm + round((ne - me)
        |    * ln(CAST(1.0 AS DOUBLE) / (ns + v + 1)), 12)
        |    ::DECIMAL(38,12) AS DOUBLE) / ne, 6) AS cross_entropy_nats
        |FROM m ORDER BY train_slices""".stripMargin,

    "q419_phrase_merges" -> {
      // Empty merge round (corpus ran dry of bigrams): t$i has 0 rows,
      // so the rewrite must be an IDENTITY (left join + CASE), never a
      // corpus-annihilating cross join — matches the Spark trainer's
      // early stop. Same guard in the q433 twin.
      def step(i: Int) =
        s"""b$i AS (SELECT tk[i + 1] AS w1, tk[i + 2] AS w2,
           |    count(*) AS c
           |  FROM (SELECT string_split(trim(t), ' ') AS tk FROM c$i),
           |    unnest(range(len(tk) - 1)) AS g(i)
           |  WHERE len(tk) >= 2 GROUP BY 1, 2),
           |t$i AS (SELECT w1, w2, c FROM b$i
           |  ORDER BY c DESC, w1, w2 LIMIT 1),
           |c${i + 1} AS (SELECT CASE WHEN t$i.w1 IS NULL THEN t
           |    ELSE replace(t,
           |      ' ' || t$i.w1 || ' ' || t$i.w2 || ' ',
           |      ' ' || t$i.w1 || '@' || t$i.w2 || ' ') END AS t
           |  FROM c$i LEFT JOIN t$i ON TRUE)"""
          .stripMargin
      s"""WITH c0 AS (SELECT ' ' || text || ' ' AS t FROM documents),
         |${(0 until 5).map(step).mkString(",\n")}
         |${(0 until 5).map(i =>
             s"SELECT CAST(${i + 1} AS BIGINT) AS step, w1, w2, " +
               s"CAST(c AS BIGINT) AS n_occ FROM t$i")
           .mkString("\nUNION ALL ")}
         |ORDER BY step""".stripMargin
    },

    "q420_bfs_hops" ->
      s"""WITH RECURSIVE $shinglesCte,
         |${minhashSig(4, 2)},
         |pairs AS (${minhashPairs(4, 2)}),
         |ed AS (SELECT DISTINCT s, d FROM (
         |  SELECT doc_a AS s, doc_b AS d FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs)),
         |reach(node, h) AS (
         |  SELECT doc_id, 0 FROM documents WHERE source = 'src0'
         |  UNION
         |  SELECT e.d, r.h + 1 FROM reach r JOIN ed e ON e.s = r.node
         |  WHERE r.h < 3),
         |hops AS (SELECT node, min(h) AS h FROM reach GROUP BY node)
         |SELECT CAST(coalesce(h, -1) AS BIGINT) AS hop,
         |  CAST(count(*) AS BIGINT) AS n_nodes
         |FROM documents LEFT JOIN hops ON hops.node = documents.doc_id
         |GROUP BY 1 ORDER BY hop""".stripMargin,

    "q421_source_pagerank" -> {
      def iter(i: Int) =
        s"""c$i AS (SELECT e.ed AS node,
           |  sum(CAST(round(r.rank / dg.deg, 14) AS DECIMAL(30,16))) AS s
           |  FROM edg e JOIN r${i - 1} r ON r.node = e.es
           |  JOIN dg ON dg.node = e.es
           |  GROUP BY e.ed),
           |r$i AS (SELECT n.node,
           |  round(CAST(0.15 AS DOUBLE) / nn.n + CAST(0.85 AS DOUBLE) *
           |    coalesce(CAST(c.s AS DOUBLE), 0), 12) AS rank
           |  FROM nd n CROSS JOIN nn LEFT JOIN c$i c ON c.node = n.node)"""
          .stripMargin
      s"""WITH hs AS (SELECT DISTINCT md5(text) AS h, source
         |  FROM documents),
         |edg AS (SELECT DISTINCT a.source AS es, b.source AS ed
         |  FROM hs a JOIN hs b ON a.h = b.h AND a.source <> b.source),
         |nd AS (SELECT DISTINCT source AS node FROM documents),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nd),
         |dg AS (SELECT es AS node, CAST(count(*) AS DOUBLE) AS deg
         |       FROM edg GROUP BY es),
         |r0 AS (SELECT node, round(CAST(1 AS DOUBLE) / nn.n, 12) AS rank
         |       FROM nd CROSS JOIN nn),
         |${iter(1)},
         |${iter(2)},
         |${iter(3)}
         |SELECT node AS source, round(rank, 6) AS rank
         |FROM r3 ORDER BY source""".stripMargin
    },

    "q422_snapshot_rotation" ->
      """WITH lab AS (SELECT source, text,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
        |      / CAST(4294967296 AS DOUBLE) AS mem
        |  FROM documents),
        |o AS (SELECT DISTINCT source, md5(text) AS h FROM lab
        |  WHERE mem < 0.9),
        |n AS (SELECT DISTINCT source, md5(text) AS h FROM lab
        |  WHERE mem >= 0.1),
        |u AS (SELECT coalesce(o.source, n.source) AS source,
        |    CASE WHEN o.h IS NULL THEN 0 ELSE 1 END AS io,
        |    CASE WHEN n.h IS NULL THEN 0 ELSE 1 END AS inw
        |  FROM o FULL OUTER JOIN n
        |    ON n.source = o.source AND n.h = o.h)
        |SELECT source, CAST(sum(io) AS BIGINT) AS n_old,
        |  CAST(sum(inw) AS BIGINT) AS n_new,
        |  CAST(sum(CASE WHEN io = 1 AND inw = 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_common,
        |  CAST((sum(CASE WHEN io = 1 AND inw = 1 THEN 1 ELSE 0 END)
        |    * 2000000 + count(*)) // (2 * count(*)) AS BIGINT)
        |    AS jaccard_ppm
        |FROM u GROUP BY source ORDER BY source""".stripMargin,

    "q423_mmr_rerank" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
        |  FROM embeddings),
        |bb AS (SELECT 4 + (CASE WHEN count(*) >= 1000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 4000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 16000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 64000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 256000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 1024000 THEN 2 ELSE 0 END) AS bits
        |  FROM e),
        |n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm,
        |  CAST(list_sum(list_transform(range(bits),
        |    j -> CASE WHEN emb[j + 1] > 0 THEN 1 << j ELSE 0 END))
        |    AS INT) AS bucket
        |  FROM e CROSS JOIN bb),
        |pb AS (SELECT vec_id, emb, nrm,
        |  unnest(list_concat([bucket], list_transform(range(bits),
        |    j -> xor(bucket, CAST(1 << j AS INT))))) AS bucket
        |  FROM n CROSS JOIN bb),
        |p AS (SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
        |    list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) AS sim
        |  FROM pb a JOIN n b ON a.bucket = b.bucket
        |    AND a.vec_id <> b.vec_id),
        |cd AS (SELECT vec_id, neighbor_id,
        |    CAST(round(round(sim, 6) * 1000000) AS BIGINT) AS sp FROM (
        |  SELECT vec_id, neighbor_id, sim, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY sim DESC, neighbor_id) AS rn
        |  FROM p) WHERE rn <= 5),
        |ps AS (SELECT c1.vec_id, c1.neighbor_id AS ca,
        |    c2.neighbor_id AS cb,
        |    CAST(round(list_dot_product(na.emb, nb.emb)
        |      / (na.nrm * nb.nrm) * 1000000) AS BIGINT) AS pp
        |  FROM cd c1 JOIN cd c2 ON c2.vec_id = c1.vec_id
        |    AND c1.neighbor_id <> c2.neighbor_id
        |  JOIN n na ON na.vec_id = c1.neighbor_id
        |  JOIN n nb ON nb.vec_id = c2.neighbor_id
        |  WHERE na.nrm > 0 AND nb.nrm > 0),
        |s1 AS (SELECT vec_id, neighbor_id AS sel, sp * 2 AS u FROM (
        |  SELECT vec_id, neighbor_id, sp, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY sp DESC, neighbor_id) AS rn
        |  FROM cd) WHERE rn = 1),
        |m2 AS (SELECT cd.vec_id, cd.neighbor_id,
        |    cd.sp * 2 - ps.pp AS u
        |  FROM cd JOIN s1 ON s1.vec_id = cd.vec_id
        |    AND cd.neighbor_id <> s1.sel
        |  JOIN ps ON ps.vec_id = cd.vec_id
        |    AND ps.ca = cd.neighbor_id AND ps.cb = s1.sel),
        |s2 AS (SELECT vec_id, neighbor_id AS sel, u FROM (
        |  SELECT vec_id, neighbor_id, u, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY u DESC, neighbor_id) AS rn
        |  FROM m2) WHERE rn = 1),
        |m3 AS (SELECT cd.vec_id, cd.neighbor_id,
        |    cd.sp * 2 - greatest(p1.pp, p2.pp) AS u
        |  FROM cd JOIN s1 ON s1.vec_id = cd.vec_id
        |    AND cd.neighbor_id <> s1.sel
        |  JOIN s2 ON s2.vec_id = cd.vec_id
        |    AND cd.neighbor_id <> s2.sel
        |  JOIN ps p1 ON p1.vec_id = cd.vec_id
        |    AND p1.ca = cd.neighbor_id AND p1.cb = s1.sel
        |  JOIN ps p2 ON p2.vec_id = cd.vec_id
        |    AND p2.ca = cd.neighbor_id AND p2.cb = s2.sel),
        |s3 AS (SELECT vec_id, neighbor_id AS sel, u FROM (
        |  SELECT vec_id, neighbor_id, u, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY u DESC, neighbor_id) AS rn
        |  FROM m3) WHERE rn = 1)
        |SELECT vec_id, CAST(1 AS BIGINT) AS rank, sel AS selected,
        |  CAST(u AS DOUBLE) / 2000000 AS score FROM s1
        |UNION ALL SELECT vec_id, 2, sel, CAST(u AS DOUBLE) / 2000000
        |  FROM s2
        |UNION ALL SELECT vec_id, 3, sel, CAST(u AS DOUBLE) / 2000000
        |  FROM s3
        |ORDER BY vec_id, rank""".stripMargin,

    "q424_coec" ->
      """WITH b AS (SELECT event_type AS segment,
        |    least(greatest(CAST(json_extract_string(props, '$.k')
        |      AS BIGINT) // 10, 0), 9) AS bucket,
        |    CASE WHEN value > 100 THEN 1 ELSE 0 END AS y
        |  FROM events),
        |curve AS (SELECT bucket,
        |    CAST((sum(y) * 2000000 + count(*)) // (2 * count(*))
        |      AS BIGINT) AS rate_ppm
        |  FROM b GROUP BY bucket),
        |g AS (SELECT segment, CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(sum(y) AS BIGINT) AS n_pos,
        |    CAST(sum(rate_ppm) AS BIGINT) AS expected_ppm_sum
        |  FROM b JOIN curve USING (bucket) GROUP BY segment)
        |SELECT segment, n_events, n_pos, expected_ppm_sum,
        |  CASE WHEN expected_ppm_sum > 0 THEN
        |    CAST((CAST(n_pos AS HUGEINT) * 1000000 * 2000000
        |      + expected_ppm_sum) // (2 * CAST(expected_ppm_sum
        |      AS HUGEINT)) AS BIGINT)
        |  END AS coec_ppm
        |FROM g ORDER BY segment""".stripMargin,

    "q425_assortativity" ->
      s"""WITH $shinglesCte,
         |${minhashSig(4, 2)},
         |cand AS (${minhashPairs(4, 2)}),
         |deg AS (SELECT v, count(*) AS d FROM
         |  (SELECT doc_a AS v FROM cand
         |   UNION ALL SELECT doc_b AS v FROM cand) GROUP BY v),
         |sym AS (SELECT da.d AS x, db.d AS y FROM cand
         |    JOIN deg da ON da.v = cand.doc_a
         |    JOIN deg db ON db.v = cand.doc_b
         |  UNION ALL SELECT db.d, da.d FROM cand
         |    JOIN deg da ON da.v = cand.doc_a
         |    JOIN deg db ON db.v = cand.doc_b),
         |m AS (SELECT count(*) AS m,
         |    sum(x::DECIMAL(38,0)) AS sx,
         |    sum((x * x)::DECIMAL(38,0)) AS sxx,
         |    sum((x * y)::DECIMAL(38,0)) AS sxy FROM sym),
         |nn AS (SELECT count(*) AS n_nodes FROM deg)
         |SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
         |  CAST(m // 2 AS BIGINT) AS n_edges,
         |  CASE WHEN m * sxx - sx * sx > 0 THEN
         |    round(CAST(m * sxy - sx * sx AS DOUBLE)
         |      / CAST(m * sxx - sx * sx AS DOUBLE), 6) + 0.0
         |  END AS assortativity
         |FROM m, nn""".stripMargin,

    "q426_corpus_build" ->
      s"""WITH RECURSIVE $shinglesCte,
         |${minhashSig(4, 2)},
         |prs AS (${minhashPairs(4, 2)}),
         |ed AS (SELECT doc_a AS s, doc_b AS d FROM prs
         |       UNION ALL SELECT doc_b, doc_a FROM prs),
         |reach(node, anc) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.d, r.anc FROM reach r JOIN ed e ON e.s = r.node),
         |cc AS (SELECT node, min(anc) AS label FROM reach GROUP BY node),
         |tt AS (SELECT doc_id, source, text, string_split(text, ' ')
         |    AS tk,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
         |    CAST(length(text) - (len(string_split(text, ' ')) - 1)
         |      AS BIGINT) AS ch
         |  FROM documents),
         |pass AS (SELECT doc_id, source, n FROM tt
         |  WHERE NOT (n < 30 OR n > 80)
         |    AND NOT (ch * 2 < n * 7 OR ch * 2 > n * 12)
         |    AND NOT (CAST(list_aggregate(list_transform(
         |      list_distinct(tk), w -> len(list_filter(tk, x -> x = w))),
         |      'max') AS BIGINT) * 5 > n)
         |    AND len(list_filter(tk, x -> list_contains(['the', 'a'], x)))
         |      > 0
         |    AND NOT (CAST(len(list_distinct(tk)) AS BIGINT) * 5 < n * 2)),
         |lab AS (SELECT p.doc_id, p.source, p.n,
         |    CASE WHEN ('0x' || substr(md5(cc.label::VARCHAR), 1, 8))
         |      ::BIGINT / CAST(4294967296 AS DOUBLE) >= 0.9
         |      THEN 1 ELSE 0 END AS ev
         |  FROM pass p JOIN cc ON cc.node = p.doc_id),
         |tr AS (SELECT doc_id, source, n FROM lab WHERE ev = 0),
         |c AS (SELECT source, n,
         |    coalesce(sum(n) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS bfr
         |  FROM tr),
         |bins AS (SELECT source, bfr // 256 AS bin, sum(n) AS nt
         |  FROM c GROUP BY 1, 2),
         |pk AS (SELECT source, CAST(count(*) AS BIGINT) AS n_bins,
         |    CAST(sum(nt) AS BIGINT) AS n_train_tokens
         |  FROM bins GROUP BY source),
         |ec AS (SELECT source, CAST(count(*) AS BIGINT) AS n_pass,
         |    CAST(sum(ev) AS BIGINT) AS n_eval
         |  FROM lab GROUP BY source)
         |SELECT source, n_pass, n_pass - n_eval AS n_train, n_eval,
         |  n_bins, n_train_tokens,
         |  CAST((n_train_tokens * 2000000 + n_bins * 256)
         |    // (2 * n_bins * 256) AS BIGINT) AS fill_ppm
         |FROM pk JOIN ec USING (source) ORDER BY source""".stripMargin,

    "q427_hash_collisions" ->
      """WITH cr AS (SELECT DISTINCT event_type || '|'
        |    || CAST(user_id // 10 AS VARCHAR) AS k FROM events),
        |h AS (SELECT ('0x' || substr(md5(k), 1, 8))::BIGINT AS h
        |  FROM cr),
        |x AS (SELECT h, b FROM h CROSS JOIN
        |  (SELECT unnest([8, 12, 16]) AS b) bb),
        |g AS (SELECT b, CAST(count(*) AS BIGINT) AS n_crosses,
        |    CAST(count(DISTINCT h % (1::BIGINT << b)) AS BIGINT)
        |      AS n_buckets_hit
        |  FROM x GROUP BY b)
        |SELECT CAST(b AS BIGINT) AS bits, n_crosses, n_buckets_hit,
        |  n_crosses - n_buckets_hit AS n_collided,
        |  CAST(((n_crosses - n_buckets_hit) * 2000000 + n_crosses)
        |    // (2 * n_crosses) AS BIGINT) AS collision_ppm
        |FROM g ORDER BY bits""".stripMargin,

    "q428_threshold_transfer" ->
      """WITH base AS (SELECT source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS l
        |  FROM documents),
        |g AS (SELECT CAST((sum(CASE WHEN l >= 30 THEN 1 ELSE 0 END)
        |    * 2000000 + count(*)) // (2 * count(*)) AS BIGINT)
        |    AS kppm FROM base),
        |ns AS (SELECT source, count(*) AS ns FROM base
        |  GROUP BY source),
        |h AS (SELECT source, l, count(*) AS c FROM base
        |  GROUP BY 1, 2),
        |cum AS (SELECT source, l, sum(c) OVER (PARTITION BY source
        |    ORDER BY l DESC ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW) AS keep FROM h),
        |q AS (SELECT cum.source, ns.ns, g.kppm, l, keep
        |  FROM cum JOIN ns USING (source) CROSS JOIN g
        |  WHERE keep * 1000000 >= kppm * ns)
        |SELECT source, CAST(ns AS BIGINT) AS n_docs,
        |  kppm AS global_keep_ppm,
        |  CAST(l AS BIGINT) AS threshold_tokens,
        |  CAST((keep * 2000000 + ns) // (2 * ns) AS BIGINT)
        |    AS achieved_keep_ppm
        |FROM (SELECT *, row_number() OVER (PARTITION BY source
        |    ORDER BY l DESC) AS rn FROM q) WHERE rn = 1
        |ORDER BY source""".stripMargin,

    "q429_ams_f2" -> {
      val zs = (0 until 8).map(j =>
        s"""sum(CASE WHEN substr(md5(k || '|' || $j), 1, 1) < '8'
           |    THEN c ELSE -c END) AS z$j""".stripMargin).mkString(",\n")
      val zsq = (0 until 8).map(j =>
        s"(z$j::DECIMAL(38,0) * z$j::DECIMAL(38,0))").mkString(" + ")
      s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS k
         |  FROM documents),
         |c AS (SELECT k, count(*) AS c FROM tok GROUP BY k),
         |z AS (SELECT sum((c * c)::DECIMAL(38,0)) AS f2,
         |$zs
         |  FROM c),
         |zz AS (SELECT CAST(f2 AS BIGINT) AS exact_f2,
         |    -- HUGEINT, not DECIMAL: DuckDB's // on DECIMAL rounds
         |    -- the quotient instead of flooring it
         |    CAST((CAST(($zsq) AS HUGEINT) * 2 + 8) // (2 * 8)
         |      AS BIGINT) AS est_f2
         |  FROM z)
         |SELECT exact_f2, est_f2,
         |  CASE WHEN exact_f2 > 0 THEN
         |    CAST(((est_f2 - exact_f2) * 2000000
         |      + CAST(sign(est_f2 - exact_f2) AS BIGINT) * exact_f2)
         |      // (2 * exact_f2) AS BIGINT)
         |  END AS err_ppm
         |FROM zz""".stripMargin
    },

    "q430_best_match" ->
      s"""WITH $shinglesCte,
         |szs AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |${minhashSig(4, 2)},
         |cand AS (${minhashPairs(4, 2)}),
         |com AS (SELECT c.doc_a, c.doc_b, count(*) AS c
         |  FROM cand c
         |  JOIN sh x ON x.doc_id = c.doc_a
         |  JOIN sh y ON y.doc_id = c.doc_b AND y.s = x.s
         |  GROUP BY c.doc_a, c.doc_b),
         |pj AS (SELECT com.doc_a, com.doc_b,
         |    CAST(round(round(CAST(com.c AS DOUBLE)
         |      / (sa.n + sb.n - com.c), 6) * 1000000) AS BIGINT) AS jp
         |  FROM com
         |  JOIN szs sa ON sa.doc_id = com.doc_a
         |  JOIN szs sb ON sb.doc_id = com.doc_b),
         |lab AS (SELECT doc_id, source,
         |    CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
         |      / CAST(4294967296 AS DOUBLE) >= 0.9 AS INT) AS nw
         |  FROM documents),
         |onr AS (SELECT
         |    CASE WHEN la.nw = 0 THEN pj.doc_a ELSE pj.doc_b END AS o,
         |    CASE WHEN la.nw = 0 THEN pj.doc_b ELSE pj.doc_a END AS w,
         |    jp
         |  FROM pj JOIN lab la ON la.doc_id = pj.doc_a
         |  JOIN lab lb ON lb.doc_id = pj.doc_b
         |  WHERE la.nw <> lb.nw),
         |bo AS (SELECT o, w, jp FROM (SELECT o, w, jp,
         |    row_number() OVER (PARTITION BY o ORDER BY jp DESC, w)
         |      AS rn FROM onr) WHERE rn = 1),
         |bn AS (SELECT o, w FROM (SELECT o, w,
         |    row_number() OVER (PARTITION BY w ORDER BY jp DESC, o)
         |      AS rn FROM onr) WHERE rn = 1),
         |mu AS (SELECT bo.o, bo.jp FROM bo
         |  JOIN bn ON bn.w = bo.w AND bn.o = bo.o),
         |old AS (SELECT doc_id, source FROM lab WHERE nw = 0)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_old,
         |  CAST(count(mu.o) AS BIGINT) AS n_matched,
         |  CAST((count(mu.o) * 2000000 + count(*)) // (2 * count(*))
         |    AS BIGINT) AS match_ppm,
         |  CASE WHEN count(mu.o) > 0 THEN
         |    CAST((sum(jp) * 2 + count(mu.o)) // (2 * count(mu.o))
         |      AS BIGINT)
         |  END AS mean_match_jaccard_ppm
         |FROM old LEFT JOIN mu ON mu.o = old.doc_id
         |GROUP BY source ORDER BY source""".stripMargin,

    "q431_stump_split" ->
      """WITH b AS (SELECT
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS x,
        |    CASE WHEN value > 100 THEN 1 ELSE 0 END AS y FROM events),
        |h AS (SELECT x, count(*) AS n, sum(y) AS p FROM b GROUP BY x),
        |c AS (SELECT x, sum(n) OVER (ORDER BY x) AS cn,
        |    sum(p) OVER (ORDER BY x) AS cp FROM h),
        |t AS (SELECT max(cn) AS tn, max(cp) AS tp FROM c),
        |s AS (SELECT x, cn AS nl, cp AS pl, tn - cn AS nr,
        |    tp - cp AS pr, tn, tp
        |  FROM c, t WHERE cn < tn),
        |g AS (SELECT *,
        |    round(nl - (pl * pl + (nl - pl) * (nl - pl))::DOUBLE / nl,
        |      12)::DECIMAL(38,12)
        |    + round(nr - (pr * pr + (nr - pr) * (nr - pr))::DOUBLE / nr,
        |      12)::DECIMAL(38,12) AS gg
        |  FROM s),
        |w AS (SELECT * FROM g ORDER BY gg, x LIMIT 1)
        |SELECT CAST(x AS BIGINT) AS threshold,
        |  CAST(nl AS BIGINT) AS n_left, CAST(pl AS BIGINT) AS n_pos_left,
        |  CAST(nr AS BIGINT) AS n_right,
        |  CAST(pr AS BIGINT) AS n_pos_right,
        |  round(CAST(gg AS DOUBLE) / tn, 6) AS weighted_gini,
        |  round(CAST(2.0 AS DOUBLE) * tp * (tn - tp) / (tn * tn)
        |    - CAST(gg AS DOUBLE) / tn, 6) + 0.0 AS gini_gain
        |FROM w""".stripMargin,

    "q432_flagship_recommend" ->
      s"""WITH ${flagshipCtes("SELECT * FROM events")}
        |SELECT user_id, item, rank_ppm, score AS recall_ppm
        |FROM resp ORDER BY user_id, item""".stripMargin,

    "q433_phrase_apply" -> {
      // Same empty-round identity guard as the q419 twin.
      def step(i: Int) =
        s"""b$i AS (SELECT tk[i + 1] AS w1, tk[i + 2] AS w2,
           |    count(*) AS c
           |  FROM (SELECT string_split(trim(t), ' ') AS tk FROM c$i),
           |    unnest(range(len(tk) - 1)) AS g(i)
           |  WHERE len(tk) >= 2 GROUP BY 1, 2),
           |t$i AS (SELECT w1, w2, c FROM b$i
           |  ORDER BY c DESC, w1, w2 LIMIT 1),
           |c${i + 1} AS (SELECT source, CASE WHEN t$i.w1 IS NULL THEN t
           |    ELSE replace(t,
           |      ' ' || t$i.w1 || ' ' || t$i.w2 || ' ',
           |      ' ' || t$i.w1 || '@' || t$i.w2 || ' ') END AS t
           |  FROM c$i LEFT JOIN t$i ON TRUE)"""
          .stripMargin
      s"""WITH c0 AS (SELECT source, ' ' || text || ' ' AS t
         |  FROM documents),
         |${(0 until 5).map(step).mkString(",\n")},
         |tb AS (SELECT source,
         |    CAST(sum(len(string_split(trim(t), ' '))) AS BIGINT)
         |      AS tokens_before
         |  FROM c0 GROUP BY source),
         |ta AS (SELECT source,
         |    CAST(sum(len(string_split(trim(t), ' '))) AS BIGINT)
         |      AS tokens_after
         |  FROM c5 GROUP BY source)
         |SELECT tb.source, tokens_before, tokens_after,
         |  tokens_before - tokens_after AS merged_occ,
         |  CAST((tokens_after * 2000000 + tokens_before)
         |    // (2 * tokens_before) AS BIGINT) AS compression_ppm
         |FROM tb JOIN ta ON ta.source = tb.source
         |ORDER BY tb.source""".stripMargin
    },

    "q434_dedup_method_census" -> {
      val bandJoin = (0 until 4).map { b =>
        s"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM sg a JOIN sg b " +
          s"ON ((a.simhash >> ${b * 8}) & 255) = ((b.simhash >> ${b * 8}) & 255) " +
          s"AND a.doc_id < b.doc_id"
      }.mkString(" UNION ")
      s"""WITH $shinglesCte,
         |szs AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |${minhashSig(4, 2)},
         |cand AS (${minhashPairs(4, 2)}),
         |com AS (SELECT c.doc_a, c.doc_b, count(*) AS c
         |  FROM cand c
         |  JOIN sh x ON x.doc_id = c.doc_a
         |  JOIN sh y ON y.doc_id = c.doc_b AND y.s = x.s
         |  GROUP BY c.doc_a, c.doc_b),
         |mh AS (SELECT com.doc_a AS a, com.doc_b AS b FROM com
         |  JOIN szs sa ON sa.doc_id = com.doc_a
         |  JOIN szs sb ON sb.doc_id = com.doc_b
         |  WHERE 3 * com.c >= sa.n + sb.n),
         |$simhashCte,
         |sbands AS ($bandJoin),
         |sp AS (SELECT DISTINCT p.doc_a AS a, p.doc_b AS b
         |  FROM sbands p
         |  JOIN sg s1 ON s1.doc_id = p.doc_a
         |  JOIN sg s2 ON s2.doc_id = p.doc_b
         |  WHERE bit_count(xor(s1.simhash, s2.simhash)) <= 3),
         |ex AS (SELECT a.doc_id AS a, b.doc_id AS b
         |  FROM (SELECT doc_id, md5(text) AS h FROM documents) a
         |  JOIN (SELECT doc_id, md5(text) AS h FROM documents) b
         |    ON a.h = b.h AND a.doc_id < b.doc_id),
         |tagged AS (
         |  SELECT a, b, 1 AS e, 0 AS m, 0 AS s FROM ex
         |  UNION ALL SELECT a, b, 0, 1, 0 FROM mh
         |  UNION ALL SELECT a, b, 0, 0, 1 FROM sp),
         |flags AS (SELECT a, b, max(e) AS e, max(m) AS m, max(s) AS s
         |  FROM tagged GROUP BY a, b)
         |SELECT CAST(e AS BIGINT) AS exact_dup,
         |  CAST(m AS BIGINT) AS minhash_j05,
         |  CAST(s AS BIGINT) AS simhash_h3,
         |  CAST(count(*) AS BIGINT) AS n_pairs
         |FROM flags GROUP BY e, m, s
         |ORDER BY exact_dup DESC, minhash_j05 DESC, simhash_h3 DESC"""
        .stripMargin
    },

    "q436_ann_adaptive" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
        |  FROM embeddings),
        |bb AS (SELECT 4 + (CASE WHEN count(*) >= 1000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 4000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 16000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 64000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 256000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 1024000 THEN 2 ELSE 0 END) AS bits
        |  FROM e),
        |n AS (SELECT vec_id, emb,
        |    sqrt(list_dot_product(emb, emb)) AS nrm,
        |    CAST(list_sum(list_transform(range(bits),
        |      j -> CASE WHEN emb[j + 1] > 0 THEN 1 << j ELSE 0 END))
        |      AS INT) AS bucket
        |  FROM e CROSS JOIN bb),
        |p AS (SELECT vec_id, emb, nrm,
        |    unnest(list_concat([bucket], list_transform(range(bits),
        |      j -> xor(bucket, CAST(1 << j AS INT))))) AS bucket
        |  FROM n CROSS JOIN bb),
        |pr AS (SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
        |    list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) AS sim
        |  FROM p a JOIN n b ON a.bucket = b.bucket
        |    AND a.vec_id <> b.vec_id),
        |r AS (SELECT vec_id, neighbor_id, sim,
        |    row_number() OVER (PARTITION BY vec_id
        |      ORDER BY sim DESC, neighbor_id) AS rn
        |  FROM pr)
        |SELECT vec_id, neighbor_id, round(sim, 6) AS sim FROM r
        |WHERE rn <= 3 ORDER BY vec_id, neighbor_id""".stripMargin,

    "q437_flagship_ndcg" ->
      s"""WITH b0 AS (SELECT *, row_number() OVER (PARTITION BY user_id
         |    ORDER BY ts DESC, event_id DESC) AS rrn FROM events),
         |hq AS (SELECT user_id, event_type, value, ts, event_id
         |  FROM b0 WHERE rrn > 1),
         |tst AS (SELECT user_id, event_type AS test_item FROM b0
         |  WHERE rrn = 1),
         |${flagshipCtes(
            "SELECT user_id, event_type, value, ts, event_id FROM hq")},
         |pu AS (SELECT r.user_id,
         |    max(CASE WHEN r.item = tst.test_item THEN
         |      CASE r.rn WHEN 1 THEN 1000000 WHEN 2 THEN 630930
         |        ELSE 500000 END ELSE 0 END) AS g,
         |    max(CASE WHEN r.item = tst.test_item THEN r.rn
         |      ELSE 0 END) AS hr
         |  FROM resp r JOIN tst ON tst.user_id = r.user_id
         |  GROUP BY r.user_id)
         |SELECT CAST(count(*) AS BIGINT) AS n_users,
         |  CAST(sum(CASE WHEN hr = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS hits_at_1,
         |  CAST(sum(CASE WHEN hr = 2 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS hits_at_2,
         |  CAST(sum(CASE WHEN hr = 3 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS hits_at_3,
         |  CAST((sum(g) * 2 + count(*)) // (2 * count(*)) AS BIGINT)
         |    AS ndcg_ppm
         |FROM pu""".stripMargin,

    "q438_ann_adaptive_recall" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
        |  FROM embeddings),
        |bb AS (SELECT 4 + (CASE WHEN count(*) >= 1000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 4000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 16000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 64000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 256000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 1024000 THEN 2 ELSE 0 END) AS bits
        |  FROM e),
        |n AS (SELECT vec_id, emb,
        |    sqrt(list_dot_product(emb, emb)) AS nrm,
        |    CAST(list_sum(list_transform(range(bits),
        |      j -> CASE WHEN emb[j + 1] > 0 THEN 1 << j ELSE 0 END))
        |      AS INT) AS bucket
        |  FROM e CROSS JOIN bb),
        |q AS (SELECT * FROM n WHERE vec_id % 20 = 0),
        |ex AS (SELECT vec_id, neighbor_id FROM (
        |  SELECT q.vec_id, b.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_dot_product(q.emb, b.emb) / (q.nrm * b.nrm)
        |        DESC, b.vec_id) AS rn
        |  FROM q, n b WHERE b.vec_id <> q.vec_id) WHERE rn <= 5),
        |pb AS (SELECT vec_id, emb, nrm, unnest(list_concat(list_concat(
        |    [{'pb': bucket, 'hd': 0}],
        |    list_transform(range(bits),
        |      j -> {'pb': xor(bucket, CAST(1 << j AS INT)), 'hd': 1})),
        |    flatten(list_transform(range(bits),
        |      i -> list_transform(range(i),
        |        j -> {'pb': xor(bucket, CAST((1 << i) | (1 << j) AS INT)),
        |              'hd': 2})))
        |  )) AS pr FROM q CROSS JOIN bb),
        |cand AS (SELECT a.vec_id, b.vec_id AS neighbor_id,
        |    min(a.pr.hd) AS hd,
        |    max(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm)) AS sim
        |  FROM pb a JOIN n b ON b.bucket = a.pr.pb
        |    AND b.vec_id <> a.vec_id
        |  GROUP BY 1, 2),
        |lv AS (SELECT l.lvl, vec_id, neighbor_id, sim FROM cand
        |  CROSS JOIN (SELECT unnest([0, 1, 2]) AS lvl) l
        |  WHERE hd <= l.lvl),
        |tk AS (SELECT lvl, vec_id, neighbor_id FROM (
        |  SELECT lvl, vec_id, neighbor_id,
        |    row_number() OVER (PARTITION BY lvl, vec_id
        |      ORDER BY sim DESC, neighbor_id) AS rn
        |  FROM lv) WHERE rn <= 5),
        |nq AS (SELECT count(*) AS nq FROM q),
        |h AS (SELECT lvl, count(ex.vec_id) AS n_hits
        |  FROM tk LEFT JOIN ex ON ex.vec_id = tk.vec_id
        |    AND ex.neighbor_id = tk.neighbor_id
        |  GROUP BY lvl)
        |SELECT CAST(lvl AS BIGINT) AS level,
        |  CAST(nq AS BIGINT) AS n_queries,
        |  CAST(n_hits AS BIGINT) AS n_hits,
        |  CAST((n_hits * 2000000 + 5 * nq) // (2 * 5 * nq) AS BIGINT)
        |    AS recall_ppm
        |FROM h CROSS JOIN nq ORDER BY level""".stripMargin,

    "q439_ann_srp_recall" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
        |  FROM embeddings),
        |bb AS (SELECT 4 + (CASE WHEN count(*) >= 1000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 4000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 16000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 64000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 256000 THEN 2 ELSE 0 END)
        |    + (CASE WHEN count(*) >= 1024000 THEN 2 ELSE 0 END) AS bits
        |  FROM e),
        |signs AS (SELECT i, j,
        |    CASE WHEN substr(md5(i || ':' || j), 1, 1) < '8'
        |      THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END AS s
        |  FROM (SELECT unnest(range(0, 64)) AS i),
        |    (SELECT unnest(range(0, 8)) AS j)),
        |tok AS (SELECT vec_id, generate_subscripts(emb, 1) - 1 AS i,
        |    unnest(emb) AS x
        |  FROM e),
        |bt AS (SELECT vec_id, j,
        |    CASE WHEN sum(CAST(round(x * s, 8) AS DECIMAL(20,8))) > 0
        |      THEN 1 ELSE 0 END AS bit
        |  FROM tok JOIN signs USING (i) CROSS JOIN bb
        |  WHERE j < bits GROUP BY vec_id, j),
        |mk AS (SELECT vec_id, CAST(sum(bit * (1 << j)) AS INT) AS bucket
        |  FROM bt GROUP BY vec_id),
        |n AS (SELECT e.vec_id, emb,
        |    sqrt(list_dot_product(emb, emb)) AS nrm, bucket
        |  FROM e JOIN mk ON mk.vec_id = e.vec_id),
        |q AS (SELECT * FROM n WHERE vec_id % 20 = 0),
        |ex AS (SELECT vec_id, neighbor_id FROM (
        |  SELECT q.vec_id, b.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_dot_product(q.emb, b.emb) / (q.nrm * b.nrm)
        |        DESC, b.vec_id) AS rn
        |  FROM q, n b WHERE b.vec_id <> q.vec_id) WHERE rn <= 5),
        |pb AS (SELECT vec_id, emb, nrm, unnest(list_concat(list_concat(
        |    [{'pb': bucket, 'hd': 0}],
        |    list_transform(range(bits),
        |      j -> {'pb': xor(bucket, CAST(1 << j AS INT)), 'hd': 1})),
        |    flatten(list_transform(range(bits),
        |      i -> list_transform(range(i),
        |        j -> {'pb': xor(bucket, CAST((1 << i) | (1 << j) AS INT)),
        |              'hd': 2})))
        |  )) AS pr FROM q CROSS JOIN bb),
        |cand AS (SELECT a.vec_id, b.vec_id AS neighbor_id,
        |    min(a.pr.hd) AS hd,
        |    max(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm)) AS sim
        |  FROM pb a JOIN n b ON b.bucket = a.pr.pb
        |    AND b.vec_id <> a.vec_id
        |  GROUP BY 1, 2),
        |lv AS (SELECT l.lvl, vec_id, neighbor_id, sim FROM cand
        |  CROSS JOIN (SELECT unnest([0, 1, 2]) AS lvl) l
        |  WHERE hd <= l.lvl),
        |tk AS (SELECT lvl, vec_id, neighbor_id FROM (
        |  SELECT lvl, vec_id, neighbor_id,
        |    row_number() OVER (PARTITION BY lvl, vec_id
        |      ORDER BY sim DESC, neighbor_id) AS rn
        |  FROM lv) WHERE rn <= 5),
        |nq AS (SELECT count(*) AS nq FROM q),
        |h AS (SELECT lvl, count(ex.vec_id) AS n_hits
        |  FROM tk LEFT JOIN ex ON ex.vec_id = tk.vec_id
        |    AND ex.neighbor_id = tk.neighbor_id
        |  GROUP BY lvl)
        |SELECT CAST(lvl AS BIGINT) AS level,
        |  CAST(nq AS BIGINT) AS n_queries,
        |  CAST(n_hits AS BIGINT) AS n_hits,
        |  CAST((n_hits * 2000000 + 5 * nq) // (2 * 5 * nq) AS BIGINT)
        |    AS recall_ppm
        |FROM h CROSS JOIN nq ORDER BY level""".stripMargin,

    "q435_flagship_loo_eval" ->
      s"""WITH b0 AS (SELECT *, row_number() OVER (PARTITION BY user_id
         |    ORDER BY ts DESC, event_id DESC) AS rrn FROM events),
         |hq AS (SELECT user_id, event_type, value, ts, event_id
         |  FROM b0 WHERE rrn > 1),
         |tst AS (SELECT user_id, event_type AS test_item FROM b0
         |  WHERE rrn = 1),
         |${flagshipCtes(
            "SELECT user_id, event_type, value, ts, event_id FROM hq")},
         |pu AS (SELECT r.user_id,
         |    max(CASE WHEN r.item = tst.test_item THEN 1 ELSE 0 END)
         |      AS hit,
         |    max(CASE WHEN r.item = tst.test_item
         |        THEN 1000000 // r.rn ELSE 0 END) AS rr
         |  FROM resp r JOIN tst ON tst.user_id = r.user_id
         |  GROUP BY r.user_id)
         |SELECT CAST(count(*) AS BIGINT) AS n_users,
         |  CAST(sum(hit) AS BIGINT) AS n_hits,
         |  CAST((sum(hit) * 2000000 + count(*)) // (2 * count(*))
         |    AS BIGINT) AS hit_rate_ppm,
         |  CAST((sum(rr) * 2 + count(*)) // (2 * count(*))
         |    AS BIGINT) AS mrr_ppm
         |FROM pu""".stripMargin,

    "q440_ivf_train" ->
      s"""WITH $ivfCtesSampled,
         |mem AS (SELECT cid, count(*) AS n_members FROM a3 GROUP BY cid)
         |SELECT c2.cid, coalesce(mem.n_members, 0) AS n_members,
         |  CAST(list_sum(list_transform(c2.cemb, x -> abs(x)))
         |    AS BIGINT) AS centroid_l1,
         |  CAST(list_sum(list_transform(range(64), i ->
         |    abs(c2.cemb[i + 1] - c1.cemb[i + 1]))) AS BIGINT)
         |    AS shift_l1
         |FROM c2 LEFT JOIN mem USING (cid) JOIN c1 USING (cid)
         |ORDER BY cid""".stripMargin,

    "q441_ivf_ann" ->
      s"""WITH ${ivfShardedCtes("greatest(1, bits - 5)", "16")},
         |${ivfShardedAnnTail(8, 5)}""".stripMargin,

    "q442_dupsubstr_census" ->
      """WITH b AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents),
        |base AS (SELECT doc_id, len(t) AS n_tokens, t FROM b),
        |pos AS (SELECT doc_id, CAST(i AS INT) AS pos,
        |    t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3] || ' ' ||
        |      t[i + 4] || ' ' || t[i + 5] AS s
        |  FROM (SELECT doc_id, t, unnest(range(len(t) - 4)) AS i
        |        FROM base WHERE len(t) >= 5) z),
        |dup AS (SELECT s FROM pos GROUP BY s HAVING count(*) >= 2),
        |dp AS (SELECT p.doc_id, p.pos FROM pos p SEMI JOIN dup USING (s)),
        |isl AS (SELECT doc_id, pos,
        |    sum(CASE WHEN prev IS NULL OR pos - prev > 4
        |        THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY pos) AS g
        |  FROM (SELECT doc_id, pos, lag(pos) OVER (PARTITION BY doc_id
        |      ORDER BY pos) AS prev FROM dp) z),
        |sp AS (SELECT doc_id, g, count(*) AS r,
        |    max(pos) - min(pos) + 5 AS cov
        |  FROM isl GROUP BY doc_id, g),
        |agg AS (SELECT doc_id, count(*) AS n_spans, max(r) AS longest_run,
        |    sum(cov) AS dup_tokens FROM sp GROUP BY doc_id)
        |SELECT base.doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  coalesce(n_spans, 0) AS n_spans,
        |  CAST(coalesce(longest_run, 0) AS BIGINT) AS longest_run,
        |  CAST(coalesce(dup_tokens, 0) AS BIGINT) AS dup_tokens,
        |  CAST((coalesce(dup_tokens, 0) * 2000000 + n_tokens)
        |    // (2 * n_tokens) AS BIGINT) AS dup_ppm
        |FROM base LEFT JOIN agg USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q443_dupsubstr_excise" ->
      """WITH b AS (SELECT doc_id, source, string_split(text, ' ') AS t
        |  FROM documents),
        |base AS (SELECT doc_id, source, len(t) AS n_tokens, t FROM b),
        |pos AS (SELECT doc_id, CAST(i AS INT) AS pos,
        |    t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3] || ' ' ||
        |      t[i + 4] || ' ' || t[i + 5] AS s
        |  FROM (SELECT doc_id, t, unnest(range(len(t) - 4)) AS i
        |        FROM base WHERE len(t) >= 5) z),
        |k AS (SELECT s, kid, kpos FROM (
        |    SELECT s, doc_id AS kid, pos AS kpos,
        |      count(*) OVER (PARTITION BY s) AS c,
        |      row_number() OVER (PARTITION BY s
        |        ORDER BY doc_id, pos) AS rn
        |    FROM pos) z WHERE c >= 2 AND rn = 1),
        |red AS (SELECT p.doc_id, p.pos FROM pos p JOIN k USING (s)
        |  WHERE NOT (p.doc_id = k.kid AND p.pos = k.kpos)),
        |isl AS (SELECT doc_id, pos,
        |    sum(CASE WHEN prev IS NULL OR pos - prev > 4
        |        THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY pos) AS g
        |  FROM (SELECT doc_id, pos, lag(pos) OVER (PARTITION BY doc_id
        |      ORDER BY pos) AS prev FROM red) z),
        |exc AS (SELECT doc_id, sum(cov) AS exc FROM (
        |    SELECT doc_id, g, max(pos) - min(pos) + 5 AS cov
        |    FROM isl GROUP BY doc_id, g) z GROUP BY doc_id),
        |roll AS (SELECT source, count(*) AS n_docs,
        |    sum(CASE WHEN exc IS NOT NULL THEN 1 ELSE 0 END)
        |      AS docs_affected,
        |    sum(n_tokens) AS tokens_total,
        |    sum(coalesce(exc, 0)) AS tokens_excised
        |  FROM base LEFT JOIN exc USING (doc_id) GROUP BY source)
        |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(docs_affected AS BIGINT) AS docs_affected,
        |  CAST(tokens_total AS BIGINT) AS tokens_total,
        |  CAST(tokens_excised AS BIGINT) AS tokens_excised,
        |  CAST(((tokens_total - tokens_excised) * 2000000 + tokens_total)
        |    // (2 * tokens_total) AS BIGINT) AS retained_ppm
        |FROM roll ORDER BY source""".stripMargin,

    "q444_ivf_recall" ->
      s"""WITH $ivfCtesTrainSampled,
         |n AS (SELECT id, emb, sqrt(list_dot_product(emb, emb)) AS nrm
         |  FROM e),
         |q AS (SELECT * FROM n WHERE id % 20 = 0),
         |ex AS (SELECT vec_id, neighbor_id FROM (
         |    SELECT q.id AS vec_id, b.id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.id ORDER BY
         |        list_dot_product(q.emb, b.emb) / (q.nrm * b.nrm) DESC,
         |        b.id) AS rn
         |    FROM q, n b WHERE q.id <> b.id) z WHERE rn <= 5),
         |pq AS (SELECT id AS vec_id, cid, rn AS pr FROM (
         |    SELECT id, cid,
         |      row_number() OVER (PARTITION BY id ORDER BY d, cid) AS rn
         |    FROM d3 WHERE id % 20 = 0) z WHERE rn <= 3),
         |cand AS (SELECT pq.vec_id, a3.id AS neighbor_id,
         |    min(pq.pr) AS pr,
         |    max(list_dot_product(na.emb, nb.emb) / (na.nrm * nb.nrm))
         |      AS sim
         |  FROM pq JOIN a3 ON pq.cid = a3.cid AND pq.vec_id <> a3.id
         |  JOIN n na ON na.id = pq.vec_id JOIN n nb ON nb.id = a3.id
         |  GROUP BY 1, 2),
         |lv AS (SELECT l.lvl, vec_id, neighbor_id, sim FROM cand
         |  CROSS JOIN (SELECT unnest([1, 2, 3]) AS lvl) l
         |  WHERE pr <= l.lvl),
         |tk AS (SELECT lvl, vec_id, neighbor_id FROM (
         |    SELECT lvl, vec_id, neighbor_id,
         |      row_number() OVER (PARTITION BY lvl, vec_id
         |        ORDER BY sim DESC, neighbor_id) AS rn FROM lv) z
         |  WHERE rn <= 5),
         |nq AS (SELECT count(*) AS nq FROM q),
         |h AS (SELECT lvl, count(ex.vec_id) AS n_hits
         |  FROM tk LEFT JOIN ex ON ex.vec_id = tk.vec_id
         |    AND ex.neighbor_id = tk.neighbor_id
         |  GROUP BY lvl)
         |SELECT CAST(lvl AS BIGINT) AS nprobe,
         |  CAST(nq AS BIGINT) AS n_queries,
         |  CAST(n_hits AS BIGINT) AS n_hits,
         |  CAST((n_hits * 2000000 + 5 * nq) // (2 * 5 * nq) AS BIGINT)
         |    AS recall_ppm
         |FROM h CROSS JOIN nq ORDER BY nprobe""".stripMargin,

    "q445_dupsubstr_provenance" ->
      """WITH b AS (SELECT doc_id, source, string_split(text, ' ') AS t
        |  FROM documents),
        |pos AS (SELECT doc_id, source, CAST(i AS INT) AS pos,
        |    t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3] || ' ' ||
        |      t[i + 4] || ' ' || t[i + 5] AS s
        |  FROM (SELECT doc_id, source, t,
        |        unnest(range(len(t) - 4)) AS i
        |        FROM b WHERE len(t) >= 5) z),
        |k AS (SELECT s, kid, kpos FROM (
        |    SELECT s, doc_id AS kid, pos AS kpos,
        |      count(*) OVER (PARTITION BY s) AS c,
        |      row_number() OVER (PARTITION BY s
        |        ORDER BY doc_id, pos) AS rn
        |    FROM pos) z WHERE c >= 2 AND rn = 1),
        |ks AS (SELECT k.s, k.kid, k.kpos, d.source AS src_from
        |  FROM k JOIN (SELECT DISTINCT doc_id AS kid, source FROM
        |    documents) d USING (kid))
        |SELECT src_from, p.source AS src_to,
        |  CAST(count(*) AS BIGINT) AS n_occurrences,
        |  CAST(count(DISTINCT p.s) AS BIGINT) AS n_grams
        |FROM pos p JOIN ks USING (s)
        |WHERE NOT (p.doc_id = ks.kid AND p.pos = ks.kpos)
        |GROUP BY 1, 2 ORDER BY src_from, src_to""".stripMargin,

    "q446_dupsubstr_ladder" ->
      s"""WITH b AS (SELECT doc_id, string_split(text, ' ') AS t
         |  FROM documents),
         |base AS (SELECT doc_id, len(t) AS n_tokens, t FROM b),
         |tt AS (SELECT sum(len(t)) AS tokens_total FROM base),
         |${Seq(3, 5, 7, 9, 25).map(ladderRung).mkString(",\n")},
         |u AS (SELECT * FROM row3 UNION ALL SELECT * FROM row5
         |  UNION ALL SELECT * FROM row7 UNION ALL SELECT * FROM row9
         |  UNION ALL SELECT * FROM row25)
         |SELECT n, CAST(n_dup_grams AS BIGINT) AS n_dup_grams,
         |  CAST(docs_affected AS BIGINT) AS docs_affected,
         |  CAST(tokens_total AS BIGINT) AS tokens_total,
         |  CAST(tokens_excised AS BIGINT) AS tokens_excised,
         |  CAST(((tokens_total - tokens_excised) * 2000000 +
         |    tokens_total) // (2 * tokens_total) AS BIGINT)
         |    AS retained_ppm
         |FROM u ORDER BY n""".stripMargin,

    "q447_gram_spectrum" ->
      """WITH b AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents),
        |pos AS (SELECT doc_id, CAST(i AS INT) AS pos,
        |    t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3] || ' ' ||
        |      t[i + 4] || ' ' || t[i + 5] AS s
        |  FROM (SELECT doc_id, t, unnest(range(len(t) - 4)) AS i
        |        FROM b WHERE len(t) >= 5) z),
        |c AS (SELECT s, count(*) AS c FROM pos GROUP BY s),
        |o AS (SELECT CAST(length(bin(c)) - 1 AS INT) AS octave, c
        |  FROM c)
        |SELECT octave, CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(sum(c) AS BIGINT) AS n_occurrences,
        |  CAST(max(c) AS BIGINT) AS max_count
        |FROM o GROUP BY octave ORDER BY octave""".stripMargin,

    "q448_ivf_sharded_ann" ->
      s"""WITH ${ivfShardedCtes("4",
           "greatest(2, (1 << (bits // 2 + 1)) // 4)")},
         |${ivfShardedAnnTail(2, 5)}""".stripMargin,

    "q449_ivf_sharded_recall" ->
      s"""WITH ${ivfShardedCtes("greatest(2, bits - 4)", "8")},
         |n AS (SELECT id, emb, sqrt(list_dot_product(emb, emb)) AS nrm
         |  FROM e),
         |q AS (SELECT * FROM n WHERE id % 20 = 0),
         |ex AS (SELECT vec_id, neighbor_id FROM (
         |    SELECT q.id AS vec_id, b.id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.id ORDER BY
         |        list_dot_product(q.emb, b.emb) / (q.nrm * b.nrm) DESC,
         |        b.id) AS rn
         |    FROM q, n b WHERE q.id <> b.id) z WHERE rn <= 5),
         |pq AS (SELECT id AS vec_id, cid, rn AS pr FROM (
         |    SELECT id, cid,
         |      row_number() OVER (PARTITION BY id ORDER BY d, cid) AS rn
         |    FROM d3 WHERE id % 20 = 0) z WHERE rn <= 3),
         |cand AS (SELECT pq.vec_id, a3.id AS neighbor_id,
         |    min(pq.pr) AS pr,
         |    max(list_dot_product(na.emb, nb.emb) / (na.nrm * nb.nrm))
         |      AS sim
         |  FROM pq JOIN a3 ON pq.cid = a3.cid AND pq.vec_id <> a3.id
         |  JOIN n na ON na.id = pq.vec_id JOIN n nb ON nb.id = a3.id
         |  GROUP BY 1, 2),
         |lv AS (SELECT l.lvl, vec_id, neighbor_id, sim FROM cand
         |  CROSS JOIN (SELECT unnest([1, 2, 3]) AS lvl) l
         |  WHERE pr <= l.lvl),
         |tk AS (SELECT lvl, vec_id, neighbor_id FROM (
         |    SELECT lvl, vec_id, neighbor_id,
         |      row_number() OVER (PARTITION BY lvl, vec_id
         |        ORDER BY sim DESC, neighbor_id) AS rn FROM lv) z
         |  WHERE rn <= 5),
         |nq AS (SELECT count(*) AS nq FROM q),
         |h AS (SELECT lvl, count(ex.vec_id) AS n_hits
         |  FROM tk LEFT JOIN ex ON ex.vec_id = tk.vec_id
         |    AND ex.neighbor_id = tk.neighbor_id
         |  GROUP BY lvl)
         |SELECT CAST((SELECT s FROM ss) AS BIGINT) AS shard_bits,
         |  CAST(lvl AS BIGINT) AS nprobe,
         |  CAST(nq AS BIGINT) AS n_queries,
         |  CAST(n_hits AS BIGINT) AS n_hits,
         |  CAST((n_hits * 2000000 + 5 * nq) // (2 * 5 * nq) AS BIGINT)
         |    AS recall_ppm
         |FROM h CROSS JOIN nq ORDER BY nprobe""".stripMargin,

    "q450_recall_per_candidate" ->
      s"""WITH e0 AS (SELECT vec_id AS id, embedding::DOUBLE[] AS emb,
         |    list_transform(embedding::DOUBLE[],
         |      x -> CAST(round(x * 1000000) AS BIGINT)) AS qemb
         |  FROM embeddings),
         |md AS (SELECT greatest(1, count(*) // 1000) AS m FROM e0),
         |e AS (SELECT e0.* FROM e0 CROSS JOIN md
         |  WHERE ('0x' || substr(md5(id::VARCHAR), 1, 8))::BIGINT % md.m
         |    = 0),
         |bb AS (SELECT 4 + (CASE WHEN count(*) >= 1000 THEN 2 ELSE 0 END)
         |    + (CASE WHEN count(*) >= 4000 THEN 2 ELSE 0 END)
         |    + (CASE WHEN count(*) >= 16000 THEN 2 ELSE 0 END)
         |    + (CASE WHEN count(*) >= 64000 THEN 2 ELSE 0 END)
         |    + (CASE WHEN count(*) >= 256000 THEN 2 ELSE 0 END)
         |    + (CASE WHEN count(*) >= 1024000 THEN 2 ELSE 0 END) AS bits
         |  FROM e),
         |kk AS (SELECT CAST(1 << bits AS BIGINT) AS kc FROM bb),
         |rng AS (SELECT unnest(range(64)) AS i),
         |${ivfLloydCtes("e")},
         |n AS (SELECT id, emb, sqrt(list_dot_product(emb, emb)) AS nrm,
         |    CAST(list_sum(list_transform(range(bits), j ->
         |      CASE WHEN emb[j + 1] > 0 THEN 1 << j ELSE 0 END))
         |      AS INT) AS bucket
         |  FROM e CROSS JOIN bb),
         |q AS (SELECT * FROM n WHERE id % 20 = 0),
         |ex AS (SELECT vec_id, neighbor_id FROM (
         |    SELECT q.id AS vec_id, b.id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.id ORDER BY
         |        list_dot_product(q.emb, b.emb) / (q.nrm * b.nrm) DESC,
         |        b.id) AS rn
         |    FROM q, n b WHERE q.id <> b.id) z WHERE rn <= 5),
         |pb AS (SELECT id, emb, nrm, unnest(list_concat(list_concat(
         |    [{'pb': bucket, 'hd': 0}],
         |    list_transform(range(bits),
         |      j -> {'pb': xor(bucket, CAST(1 << j AS INT)), 'hd': 1})),
         |    flatten(list_transform(range(bits),
         |      i -> list_transform(range(i),
         |        j -> {'pb': xor(bucket, CAST((1 << i) | (1 << j) AS INT)),
         |              'hd': 2})))
         |  )) AS pr FROM q CROSS JOIN bb),
         |scand AS (SELECT a.id AS vec_id, b.id AS neighbor_id,
         |    min(a.pr.hd) AS lv,
         |    max(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm)) AS sim
         |  FROM pb a JOIN n b ON b.bucket = a.pr.pb AND b.id <> a.id
         |  GROUP BY 1, 2),
         |pq AS (SELECT id AS vec_id, cid, rn AS pr FROM (
         |    SELECT id, cid,
         |      row_number() OVER (PARTITION BY id ORDER BY d, cid) AS rn
         |    FROM d3 WHERE id % 20 = 0) z WHERE rn <= 3),
         |icand AS (SELECT pq.vec_id, a3.id AS neighbor_id,
         |    min(pq.pr) AS lv,
         |    max(list_dot_product(na.emb, nb.emb) / (na.nrm * nb.nrm))
         |      AS sim
         |  FROM pq JOIN a3 ON pq.cid = a3.cid AND pq.vec_id <> a3.id
         |  JOIN n na ON na.id = pq.vec_id JOIN n nb ON nb.id = a3.id
         |  GROUP BY 1, 2),
         |nq AS (SELECT count(*) AS nq FROM q),
         |slv AS (SELECT l.lvl, vec_id, neighbor_id, sim FROM scand
         |  CROSS JOIN (SELECT unnest([0, 1, 2]) AS lvl) l
         |  WHERE lv <= l.lvl),
         |stk AS (SELECT lvl, vec_id, neighbor_id FROM (
         |    SELECT lvl, vec_id, neighbor_id,
         |      row_number() OVER (PARTITION BY lvl, vec_id
         |        ORDER BY sim DESC, neighbor_id) AS rn FROM slv) z
         |  WHERE rn <= 5),
         |ilv AS (SELECT l.lvl, vec_id, neighbor_id, sim FROM icand
         |  CROSS JOIN (SELECT unnest([1, 2, 3]) AS lvl) l
         |  WHERE lv <= l.lvl),
         |itk AS (SELECT lvl, vec_id, neighbor_id FROM (
         |    SELECT lvl, vec_id, neighbor_id,
         |      row_number() OVER (PARTITION BY lvl, vec_id
         |        ORDER BY sim DESC, neighbor_id) AS rn FROM ilv) z
         |  WHERE rn <= 5),
         |u AS (
         |  SELECT 'sign_bucket' AS method, CAST(l.lvl AS BIGINT) AS setting,
         |    (SELECT count(*) FROM scand WHERE lv <= l.lvl) AS n_candidates,
         |    (SELECT count(*) FROM stk JOIN ex
         |      ON ex.vec_id = stk.vec_id
         |      AND ex.neighbor_id = stk.neighbor_id
         |      WHERE stk.lvl = l.lvl) AS n_hits
         |  FROM (SELECT unnest([0, 1, 2]) AS lvl) l
         |  UNION ALL
         |  SELECT 'ivf_trained' AS method, CAST(l.lvl AS BIGINT) AS setting,
         |    (SELECT count(*) FROM icand WHERE lv <= l.lvl) AS n_candidates,
         |    (SELECT count(*) FROM itk JOIN ex
         |      ON ex.vec_id = itk.vec_id
         |      AND ex.neighbor_id = itk.neighbor_id
         |      WHERE itk.lvl = l.lvl) AS n_hits
         |  FROM (SELECT unnest([1, 2, 3]) AS lvl) l)
         |SELECT method, setting, CAST(nq AS BIGINT) AS n_queries,
         |  CAST(n_candidates AS BIGINT) AS n_candidates,
         |  CAST((n_candidates * 2 + nq) // (2 * nq) AS BIGINT)
         |    AS cand_per_query,
         |  CAST(n_hits AS BIGINT) AS n_hits,
         |  CAST((n_hits * 2000000 + 5 * nq) // (2 * 5 * nq) AS BIGINT)
         |    AS recall_ppm
         |FROM u CROSS JOIN nq ORDER BY method, setting""".stripMargin,

    "q451_negsample_rejection" ->
      """WITH seen AS (SELECT o_custkey AS custkey, l_partkey AS partkey
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_custkey < 200),
        |users AS (SELECT DISTINCT custkey FROM seen),
        |cat AS (SELECT DISTINCT p_partkey AS partkey FROM part
        |  WHERE p_partkey < 500),
        |mx AS (SELECT max(partkey) + 1 AS m FROM cat),
        |cand AS (SELECT custkey, slot,
        |    ('0x' || substr(md5(custkey::VARCHAR || '|' || slot::VARCHAR),
        |      1, 8))::BIGINT % m AS v
        |  FROM users CROSS JOIN (SELECT unnest(range(40)) AS slot) s
        |  CROSS JOIN mx),
        |hit AS (SELECT c.custkey, cat.partkey, c.slot
        |  FROM cand c JOIN cat ON cat.partkey = c.v),
        |ded AS (SELECT h.custkey, h.partkey, min(h.slot) AS slot
        |  FROM hit h ANTI JOIN seen s
        |    ON h.custkey = s.custkey AND h.partkey = s.partkey
        |  GROUP BY 1, 2),
        |r AS (SELECT custkey, partkey, row_number() OVER
        |  (PARTITION BY custkey ORDER BY slot, partkey) AS rn FROM ded)
        |SELECT custkey, partkey FROM r WHERE rn <= 5
        |ORDER BY custkey, partkey""".stripMargin,

    "q452_ivf_dial_sweep" -> {
      val shardDials = for {
        lvl <- Seq("a", "b"); kc <- Seq(8, 16, 32)
      } yield (lvl, kc)
      val chains = shardDials.map { case (lvl, kc) =>
        ivfShardedLloydSfx(lvl, kc, s"_$lvl$kc")
      }.mkString(",\n")
      val tails = shardDials.map { case (lvl, kc) =>
        ivfDialRowsSfx(s"_$lvl$kc", Seq(2, 4, 8), "'sharded'",
          s"(SELECT s FROM ss$lvl)", kc.toString)
      }.mkString(",\n")
      val unions = ("rowf" +: shardDials.map { case (l, kc) => s"row_$l$kc" })
        .map(r => s"SELECT * FROM $r").mkString("\n  UNION ALL ")
      s"""WITH e0 AS (SELECT vec_id AS id, embedding::DOUBLE[] AS emb,
         |    list_transform(embedding::DOUBLE[],
         |      x -> CAST(round(x * 1000000) AS BIGINT)) AS qemb
         |  FROM embeddings),
         |bb AS (SELECT 4 + (CASE WHEN count(*) >= 1000 THEN 2 ELSE 0 END)
         |    + (CASE WHEN count(*) >= 4000 THEN 2 ELSE 0 END)
         |    + (CASE WHEN count(*) >= 16000 THEN 2 ELSE 0 END)
         |    + (CASE WHEN count(*) >= 64000 THEN 2 ELSE 0 END)
         |    + (CASE WHEN count(*) >= 256000 THEN 2 ELSE 0 END)
         |    + (CASE WHEN count(*) >= 1024000 THEN 2 ELSE 0 END) AS bits
         |  FROM e0),
         |rng AS (SELECT unnest(range(64)) AS i),
         |n AS (SELECT id, emb, sqrt(list_dot_product(emb, emb)) AS nrm
         |  FROM e0),
         |q AS (SELECT * FROM n WHERE id % 20 = 0),
         |ex AS (SELECT vec_id, neighbor_id FROM (
         |    SELECT q.id AS vec_id, b.id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.id ORDER BY
         |        list_dot_product(q.emb, b.emb) / (q.nrm * b.nrm) DESC,
         |        b.id) AS rn
         |    FROM q, n b WHERE q.id <> b.id) z WHERE rn <= 5),
         |nq AS (SELECT count(*) AS nq FROM q),
         |${ivfShardLevelSfx("greatest(2, bits - 4)", "a")},
         |${ivfShardLevelSfx("greatest(1, bits - 5)", "b")},
         |kkf AS (SELECT CAST(1 << (bits // 2 + 1) AS BIGINT) AS kc
         |  FROM bb),
         |mmf AS (SELECT greatest(1, (SELECT count(*) FROM e0)
         |    // (kc * 32)) AS m FROM kkf),
         |trf AS (SELECT e0.* FROM e0 CROSS JOIN mmf
         |  WHERE ('0x' || substr(md5(id::VARCHAR), 1, 8))::BIGINT % mmf.m
         |    = 0),
         |${ivfLloydCtes("trf", "e0", "f", "kkf")},
         |$chains,
         |${ivfDialRowsSfx("f", Seq(1, 2, 3), "'flat'", "0",
             "(SELECT kc FROM kkf)")},
         |$tails,
         |u AS ($unions)
         |SELECT layout, shard_bits, kc, nprobe,
         |  CAST(nq AS BIGINT) AS n_queries,
         |  CAST(n_candidates AS BIGINT) AS n_candidates,
         |  CAST((n_candidates * 2 + nq) // (2 * nq) AS BIGINT)
         |    AS cand_per_query,
         |  CAST(n_hits AS BIGINT) AS n_hits,
         |  CAST((n_hits * 2000000 + 5 * nq) // (2 * 5 * nq) AS BIGINT)
         |    AS recall_ppm
         |FROM u CROSS JOIN nq
         |ORDER BY layout, shard_bits, kc, nprobe""".stripMargin
    },

    "q453_ivf_serve" ->
      s"""WITH ${ivfShardedCtes("greatest(1, bits - 5)", "16")},
         |${ivfShardedAnnTail(8, 5,
           " WHERE ('0x' || substr(md5(id::VARCHAR), 1, 8))::BIGINT" +
           " % 10 = 0")}""".stripMargin,

    // q454: the engine serializes REAL BMP/PPM payloads and decodes
    // them with its codec; the oracle never sees a byte of either —
    // it recomputes the DECODED pixel values closed-form from the same
    // md5 seed (BMP: raw ramp; PPM: raw % (maxv+1) then the decoder's
    // integer maxval rescale ·255//maxv), so the file round-trip is
    // exactly what the hash gate checks. All-integer outputs.
    "q454_image_decode_stats" ->
      """WITH p AS (SELECT doc_id,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
        |      % 100000 AS seed
        |  FROM documents),
        |d AS (SELECT doc_id, seed,
        |    CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS fmt,
        |    4 + seed % 5 AS w,
        |    4 + (seed // 7) % 5 AS h,
        |    CASE WHEN doc_id % 2 = 0 OR seed % 3 <> 0 THEN 255
        |         ELSE 63 END AS maxv
        |  FROM p),
        |gx AS (SELECT d.*, unnest(range(w)) AS x FROM d),
        |gxy AS (SELECT gx.*, unnest(range(h)) AS y FROM gx),
        |raw AS (SELECT doc_id, fmt, w, h, maxv, x, y,
        |    md5(seed::VARCHAR || '_' || (y*w + x)::VARCHAR) AS hx
        |  FROM gxy),
        |px AS (SELECT doc_id, fmt, w, h, x, y,
        |    CASE WHEN fmt = 1 THEN ('0x' || substr(hx, 1, 2))::BIGINT
        |      ELSE ((('0x' || substr(hx, 1, 2))::BIGINT % (maxv+1))
        |        * 255) // maxv END AS r,
        |    CASE WHEN fmt = 1 THEN ('0x' || substr(hx, 3, 2))::BIGINT
        |      ELSE ((('0x' || substr(hx, 3, 2))::BIGINT % (maxv+1))
        |        * 255) // maxv END AS g,
        |    CASE WHEN fmt = 1 THEN ('0x' || substr(hx, 5, 2))::BIGINT
        |      ELSE ((('0x' || substr(hx, 5, 2))::BIGINT % (maxv+1))
        |        * 255) // maxv END AS b
        |  FROM raw)
        |SELECT doc_id, CAST(fmt AS INT) AS fmt, CAST(w AS INT) AS w,
        |  CAST(h AS INT) AS h, CAST(w * h AS BIGINT) AS n_px,
        |  CAST(sum(r) AS BIGINT) AS sum_r,
        |  CAST(sum(g) AS BIGINT) AS sum_g,
        |  CAST(sum(b) AS BIGINT) AS sum_b,
        |  CAST(sum(299*r + 587*g + 114*b) AS BIGINT) AS luma1k,
        |  CAST(sum((x+1) * (299*r + 587*g + 114*b)) AS BIGINT)
        |    AS luma1k_xw,
        |  CAST(sum((y+1) * (299*r + 587*g + 114*b)) AS BIGINT)
        |    AS luma1k_yw
        |FROM px GROUP BY doc_id, fmt, w, h
        |ORDER BY doc_id""".stripMargin,

    // q455: closed-form 8×8 rasters (cluster base seed + per-doc pixel
    // inversion) → integer aHash as two 32-bit halves → the SAME
    // banded 16-bit bucket join + bit_count(xor) verify the engine
    // runs. Candidate generation is mirrored exactly (4 bands,
    // DISTINCT pairs), so engine and oracle agree row-for-row
    // regardless of LSH recall.
    "q455_image_phash_neardup" ->
      """WITH nn AS (SELECT greatest(1, count(*) // 16) AS nc
        |  FROM documents),
        |p AS (SELECT doc_id AS id,
        |    ('0x' || substr(md5('c' || (doc_id % nc)::VARCHAR), 1, 8))
        |      ::BIGINT % 100000 AS cseed,
        |    ('0x' || substr(md5('d' || doc_id::VARCHAR), 1, 8))
        |      ::BIGINT % 100000 AS pseed,
        |    (doc_id // nc) % 9 AS noise
        |  FROM documents CROSS JOIN nn),
        |g0 AS (SELECT p.*, unnest(range(64)) AS i FROM p),
        |raw AS (SELECT id, i, noise, pseed,
        |    md5(cseed::VARCHAR || '_' || i::VARCHAR) AS hx
        |  FROM g0),
        |px0 AS (SELECT id, i,
        |    ('0x' || substr(hx, 1, 2))::BIGINT AS r0,
        |    ('0x' || substr(hx, 3, 2))::BIGINT AS g0,
        |    ('0x' || substr(hx, 5, 2))::BIGINT AS b0,
        |    CASE WHEN (pseed + 31*i) % 64 < noise THEN 1
        |         ELSE 0 END AS fl
        |  FROM raw),
        |lum AS (SELECT id, i,
        |    299*(CASE WHEN fl = 1 THEN 255 - r0 ELSE r0 END)
        |    + 587*(CASE WHEN fl = 1 THEN 255 - g0 ELSE g0 END)
        |    + 114*(CASE WHEN fl = 1 THEN 255 - b0 ELSE b0 END) AS l
        |  FROM px0),
        |tot AS (SELECT id, sum(l) AS t FROM lum GROUP BY id),
        |hs AS (SELECT lum.id,
        |    CAST(sum(CASE WHEN i < 32 AND l*64 > t
        |      THEN 1::BIGINT << i ELSE 0 END) AS BIGINT) AS h_lo,
        |    CAST(sum(CASE WHEN i >= 32 AND l*64 > t
        |      THEN 1::BIGINT << (i - 32) ELSE 0 END) AS BIGINT) AS h_hi
        |  FROM lum JOIN tot ON tot.id = lum.id GROUP BY lum.id),
        |bd AS (SELECT id, unnest([0, 1, 2, 3]) AS bi,
        |    unnest([h_lo % 65536, h_lo >> 16, h_hi % 65536, h_hi >> 16])
        |      AS bv
        |  FROM hs),
        |cand AS (SELECT DISTINCT a.id AS doc_a, b.id AS doc_b
        |  FROM bd a JOIN bd b
        |  ON a.bi = b.bi AND a.bv = b.bv AND a.id < b.id)
        |SELECT doc_a, doc_b,
        |  CAST(bit_count(xor(ha.h_lo, hb.h_lo))
        |    + bit_count(xor(ha.h_hi, hb.h_hi)) AS INT) AS hamming
        |FROM cand JOIN hs ha ON ha.id = doc_a
        |JOIN hs hb ON hb.id = doc_b
        |WHERE bit_count(xor(ha.h_lo, hb.h_lo))
        |  + bit_count(xor(ha.h_hi, hb.h_hi)) <= 6
        |ORDER BY doc_a, doc_b""".stripMargin,

    // q456: the engine slices real BINARY frames and fingerprints
    // their bytes; docs are ASCII, so the VARCHAR substring here
    // hashes the same bytes. Kept frames: full 8-byte frames at
    // indices ≡ 0 (mod 3); partial tails and sub-frame payloads drop.
    "q456_frame_sample" ->
      """WITH f AS (SELECT doc_id, text, length(text) // 8 AS nf
        |  FROM documents),
        |k AS (SELECT doc_id, text, unnest(range(nf)) AS i
        |  FROM f WHERE nf > 0)
        |SELECT doc_id, CAST(i AS INT) AS frame_idx,
        |  md5(substring(text, CAST(i*8 + 1 AS BIGINT), 8)) AS frame_md5
        |FROM k WHERE i % 3 = 0
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // q457: the engine serializes real RIFF/WAV PCM16 and decodes it
    // with its chunk-walking codec; the oracle recomputes the DECODED
    // interleaved samples closed-form (first 16 md5 bits − 32768) and
    // aggregates the same integer statistics. Zero crossings are
    // strict sign products over the lag window.
    "q457_audio_decode_stats" ->
      """WITH p AS (SELECT doc_id,
        |    ('0x' || substr(md5('a' || doc_id::VARCHAR), 1, 8))::BIGINT
        |      % 100000 AS aseed
        |  FROM documents),
        |d AS (SELECT doc_id, aseed,
        |    1 + doc_id % 2 AS channels,
        |    CASE WHEN aseed % 2 = 0 THEN 8000 ELSE 16000 END
        |      AS sample_rate,
        |    (48 + aseed % 17) * (1 + doc_id % 2) AS n
        |  FROM p),
        |g AS (SELECT d.*, unnest(range(n)) AS i FROM d),
        |v AS (SELECT doc_id, channels, sample_rate, n, i,
        |    ('0x' || substr(md5(aseed::VARCHAR || '_' || i::VARCHAR),
        |      1, 4))::BIGINT - 32768 AS v
        |  FROM g),
        |w AS (SELECT *, lag(v) OVER (PARTITION BY doc_id ORDER BY i)
        |    AS pv FROM v)
        |SELECT doc_id, CAST(channels AS INT) AS channels,
        |  CAST(sample_rate AS INT) AS sample_rate,
        |  CAST(n AS BIGINT) AS n_samples,
        |  CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
        |  CAST(max(abs(v)) AS BIGINT) AS max_abs,
        |  CAST(sum(v * v) AS BIGINT) AS energy,
        |  CAST(sum(CASE WHEN pv IS NOT NULL AND v * pv < 0 THEN 1
        |    ELSE 0 END) AS BIGINT) AS zero_crossings
        |FROM w GROUP BY doc_id, channels, sample_rate, n
        |ORDER BY doc_id""".stripMargin
  )
}

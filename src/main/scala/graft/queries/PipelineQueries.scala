package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.pipeline.{Bpe, C4Clean, Chunking, Classifier, Clusters, Contamination, Curation, Dedup, Dsir, Fuzzy, GraphAnn, Lines, Multimodal, Packing, Pii, Quantization, Repetition, Reporting, Sampling, Similarity, Snapshots, Spans, TextAnalysis}

/** LLM-training-data pipeline operators (dedup, similarity search,
  * text analysis) gate-checked over the driver's `documents` /
  * `embeddings` tables.
  *
  * Oracle policy: EVERY query here gets a DuckDB oracle. The hash
  * families behind MinHash/LSH/SimHash are md5-derived (round-4
  * change), sign-LSH hyperplanes and IVF centroid selection are
  * md5-derived driver-side constants — so even the ANN/near-dup
  * candidate sets are reproducible in any engine with md5, and the
  * oracles below recompute signatures, buckets, cells and verified
  * pairs end-to-end in SQL.
  */
object PipelineQueries {

  /** DuckDB-side mirror of [[TextAnalysis.tokens]] +
    * [[Dedup.wordShingles]] (word 3-grams, distinct per doc; docs with
    * <3 tokens yield none — range(1, len-1) is empty for len<3).
    */
  private[queries] val shingleSql =
    """toks AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(trim(text), '\s+'),
      |                     t -> t <> '') AS w
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, shingle FROM (
      |    SELECT doc_id,
      |           unnest(list_transform(range(1, len(w) - 1),
      |                  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
      |    FROM toks))""".stripMargin

  private def stopwordRegex(words: Seq[String]): String =
    "\\b(" + words.mkString("|") + ")\\b"

  /** The complete p08 MinHash+LSH verified-pair pipeline as a CTE
    * chain ending in `pairs(doc_a, doc_b, jaccard)` — single-sourced
    * so the pair gate (p08) and the cluster gate (p28, which runs
    * connected components OVER these pairs) can never drift apart.
    * Mirrors [[Dedup.minHashSignatures]]/[[Dedup.lshCandidatePairs]]/
    * [[Dedup.minHashNearDups]] at threshold 0.8.
    */
  private def minhashPairsCtes =
    s"""$shingleSql,
       |hv AS (SELECT doc_id,
       |              ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS ha,
       |              ('0x' || substr(md5(shingle), 9, 8))::BIGINT AS hb
       |       FROM sh),
       |mh AS (SELECT doc_id, i, min(ha + i * hb) AS mv
       |       FROM hv CROSS JOIN (SELECT unnest(range(16)) AS i) idx
       |       GROUP BY doc_id, i),
       |bands AS (SELECT doc_id, i // 4 AS band,
       |                 md5(string_agg(CAST(mv AS VARCHAR), ',' ORDER BY i)) AS bucket
       |          FROM mh GROUP BY doc_id, i // 4),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |         FROM bands a JOIN bands b
       |           ON a.band = b.band AND a.bucket = b.bucket
       |          AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS set_size
       |          FROM sh GROUP BY doc_id),
       |common AS (SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS common
       |           FROM cand c
       |           JOIN sh a ON a.doc_id = c.doc_a
       |           JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
       |           GROUP BY c.doc_a, c.doc_b),
       |pairs AS (SELECT doc_a, doc_b,
       |                 common / (sa.set_size + sb.set_size - common) AS jaccard
       |          FROM common
       |          JOIN sizes sa ON sa.doc_id = doc_a
       |          JOIN sizes sb ON sb.doc_id = doc_b
       |          WHERE common / (sa.set_size + sb.set_size - common) >= 0.8)""".stripMargin

  /** Shared oracle fragments mirroring [[TextAnalysis]] — single
    * source for the quality/lang formulas so the unit gates (p04/p05)
    * and the composed pipeline gate (p15) can never drift apart.
    */
  private[queries] val qualityColsSql =
    s"""CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
       |                     t -> t <> '')) AS BIGINT) AS n_tokens,
       |CAST(len(regexp_extract_all(text,
       |     '${stopwordRegex(TextAnalysis.EnglishStopwords)}')) AS BIGINT) AS n_stopwords,
       |CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS alpha_chars,
       |CAST(length(text) AS BIGINT) AS n_chars_total""".stripMargin

  private[queries] val qualityScoreSql =
    """least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) * 0.4
      |  + least(coalesce(n_stopwords / nullif(n_tokens, 0), 0.0), 1.0) * 0.3
      |  + coalesce(alpha_chars / nullif(n_chars_total, 0), 0.0) * 0.3""".stripMargin

  private[queries] val langHitsSql = TextAnalysis.LangMarkers.map { case (l, ws) =>
    s"CAST(len(regexp_extract_all(text, '${stopwordRegex(ws)}')) AS BIGINT) AS ${l}_hits"
  }.mkString(",\n")

  private[queries] val langCaseSql =
    """CASE WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
      |     WHEN es_hits >= de_hits AND es_hits >= fr_hits THEN 'es'
      |     WHEN de_hits >= fr_hits THEN 'de'
      |     ELSE 'fr' END AS predicted_lang""".stripMargin

  /** Root for gate-written side artifacts (the p16b BPE vocab, the
    * p19 LSH / p20 IVF indexes). [[graft.Verify]] pins the
    * `graft.artifact.dir` system property to the SIBLING
    * `<outDir>_artifacts` before anything runs (sibling, not child —
    * the driver globs everything under outDir as query results), so each Verify
    * cycle is ISOLATED: two concurrent runs (or runs at different
    * scale factors) never clobber each other's artifacts, and the
    * oracle SQL a run dumps joins exactly the files that same run
    * wrote. Outside Verify (Bench, ad-hoc sessions) the fixed /tmp
    * default applies — no oracle is in play there.
    *
    * [[defs]] is a `def` (not a val) so the SQL strings below read the
    * property at access time, not at first-classload.
    */
  private def artifactRoot: String =
    sys.props.getOrElse("graft.artifact.dir", "/tmp/graft_artifacts")

  /** Artifact path for the p16b BPE vocab side table: the gate query
    * writes it, the dumped oracle SQL joins it.
    */
  private def bpeVocabPath = s"$artifactRoot/bpe_vocab_p16b.parquet"

  /** Artifact path for the p19 LSH dedup index (same per-run contract
    * as [[bpeVocabPath]]).
    */
  private def lshIndexPath = s"$artifactRoot/lsh_index_p19"

  /** The even-half-indexed / odd-half-deduped verdict oracle, shared
    * VERBATIM by the batch gate (p19) and its streaming twin (st17):
    * identical semantics by construction — index-wins and batch-blind
    * verdicts are a pure per-row function of (doc, index), so
    * micro-batching cannot change the union. Both sides' signatures,
    * the cross-side candidates and the verified jaccard recomputed
    * from scratch in SQL.
    */
  private[queries] def indexNeardupsOracleSql: String =
    indexNeardupsOracleSqlWhere("TRUE")

  /** [[indexNeardupsOracleSql]] with an extra predicate on the INDEX
    * side of the candidate join (`od` = indexed docs) — how the
    * eviction gate (p91) states "these ids are no longer in the
    * index" in pure SQL.
    */
  private[queries] def indexNeardupsOracleSqlWhere(oldPred: String): String =
    s"""WITH ${indexNeardupCtesWhere(oldPred)}
       |SELECT doc_new, doc_old, jaccard FROM dups""".stripMargin

  /** The verdict chain as a composable CTE fragment ending in
    * `dups(doc_new, doc_old, jaccard)` — shared by the st17/st19
    * wrappers above and the st28 composed-pipeline oracle.
    */
  private[queries] def indexNeardupCtesWhere(oldPred: String): String =
    s"""$shingleSql,
       |hv AS (SELECT doc_id,
       |              ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS ha,
       |              ('0x' || substr(md5(shingle), 9, 8))::BIGINT AS hb
       |       FROM sh),
       |mh AS (SELECT doc_id, i, min(ha + i * hb) AS mv
       |       FROM hv CROSS JOIN (SELECT unnest(range(16)) AS i) idx
       |       GROUP BY doc_id, i),
       |bands AS (SELECT doc_id, i // 4 AS band,
       |                 md5(string_agg(CAST(mv AS VARCHAR), ',' ORDER BY i)) AS bucket
       |          FROM mh GROUP BY doc_id, i // 4),
       |cand AS (SELECT DISTINCT nw.doc_id AS doc_new, od.doc_id AS doc_old
       |         FROM bands nw JOIN bands od
       |           ON nw.band = od.band AND nw.bucket = od.bucket
       |         WHERE nw.doc_id % 2 = 1 AND od.doc_id % 2 = 0
       |           AND ($oldPred)),
       |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS set_size
       |          FROM sh GROUP BY doc_id),
       |common AS (SELECT c.doc_new, c.doc_old, CAST(count(*) AS BIGINT) AS common
       |           FROM cand c
       |           JOIN sh a ON a.doc_id = c.doc_new
       |           JOIN sh b ON b.doc_id = c.doc_old AND b.shingle = a.shingle
       |           GROUP BY c.doc_new, c.doc_old),
       |dups AS (SELECT doc_new, doc_old,
       |           common / (sn.set_size + so.set_size - common) AS jaccard
       |         FROM common
       |         JOIN sizes sn ON sn.doc_id = doc_new
       |         JOIN sizes so ON so.doc_id = doc_old
       |         WHERE common / (sn.set_size + so.set_size - common) >= 0.8)""".stripMargin

  /** The p58 PQ-ADC construction as a composable CTE fragment ending
    * in `pqscore(vec_id, qscore)` — shared verbatim by the p58 gate
    * and the p112 shortlist-rerank gate so the ADC arithmetic (code
    * assignment tie-breaks, left-associated 8-term sum) has ONE
    * definition.
    */
  private[queries] val pqAdcCtesSql: String =
    s"""stride AS (SELECT greatest(count(*) // 16, 1) AS bkt
       |                FROM embeddings),
       |cent AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS c
       |         FROM embeddings, stride
       |         WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR) || '/ivf'), 1, 8))::BIGINT
       |               % bkt = 0
       |         ORDER BY vec_id LIMIT 16),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |subs AS (SELECT CAST(unnest(range(8)) AS INT) AS s),
       |cw AS (SELECT s, cid, c[s*8+1 : s*8+8] AS csub FROM cent, subs),
       |asg0 AS (SELECT e.vec_id, w.s, w.cid,
       |           2*list_dot_product(e.v[w.s*8+1 : w.s*8+8], w.csub)
       |             - list_dot_product(w.csub, w.csub) AS score
       |         FROM e CROSS JOIN cw w),
       |asg AS (SELECT *, row_number() OVER (PARTITION BY vec_id, s
       |                    ORDER BY score DESC, cid DESC) AS rn
       |        FROM asg0),
       |codes AS (SELECT vec_id,
       |            max(CASE WHEN s=0 THEN cid END) AS c0,
       |            max(CASE WHEN s=1 THEN cid END) AS c1,
       |            max(CASE WHEN s=2 THEN cid END) AS c2,
       |            max(CASE WHEN s=3 THEN cid END) AS c3,
       |            max(CASE WHEN s=4 THEN cid END) AS c4,
       |            max(CASE WHEN s=5 THEN cid END) AS c5,
       |            max(CASE WHEN s=6 THEN cid END) AS c6,
       |            max(CASE WHEN s=7 THEN cid END) AS c7
       |          FROM asg WHERE rn = 1 GROUP BY vec_id),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |adc AS (SELECT w.s, w.cid,
       |               list_dot_product(q.qv[w.s*8+1 : w.s*8+8], w.csub) AS t
       |        FROM cw w, q),
       |pqscore AS (
       |  SELECT cv.vec_id,
       |         (((((((a0.t + a1.t) + a2.t) + a3.t) + a4.t) + a5.t) + a6.t) + a7.t)
       |           AS qscore
       |  FROM codes cv
       |  JOIN adc a0 ON a0.s = 0 AND a0.cid = cv.c0
       |  JOIN adc a1 ON a1.s = 1 AND a1.cid = cv.c1
       |  JOIN adc a2 ON a2.s = 2 AND a2.cid = cv.c2
       |  JOIN adc a3 ON a3.s = 3 AND a3.cid = cv.c3
       |  JOIN adc a4 ON a4.s = 4 AND a4.cid = cv.c4
       |  JOIN adc a5 ON a5.s = 5 AND a5.cid = cv.c5
       |  JOIN adc a6 ON a6.s = 6 AND a6.cid = cv.c6
       |  JOIN adc a7 ON a7.s = 7 AND a7.cid = cv.c7
       |  WHERE cv.vec_id <> 0)""".stripMargin

  /** The p59 IVF-probe + PQ-ADC construction as a composable CTE
    * fragment ending in `ivfpqscore(vec_id, qscore)` (and exposing
    * `e`/`q` for rerank consumers) — shared verbatim by the p59 gate
    * and the p114 shortlist-rerank gate, the same single-sourcing
    * contract as [[pqAdcCtesSql]]. Probe CTEs are p13's; code/ADC
    * CTEs are p58's restricted to the probed candidates.
    */
  private[queries] def ivfPqAdcCtesSql: String =
    s"""stride AS (SELECT greatest(count(*) // 16, 1) AS bkt
       |                FROM embeddings),
       |cent AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS c
       |         FROM embeddings, stride
       |         WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR) || '/ivf'), 1, 8))::BIGINT
       |               % bkt = 0
       |         ORDER BY vec_id LIMIT 16),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |assigned AS (
       |  SELECT vec_id, v, cid,
       |         row_number() OVER (PARTITION BY vec_id
       |           ORDER BY list_dot_product(v, c) / sqrt(list_dot_product(c, c)) DESC,
       |                    cid DESC) AS rn
       |  FROM e CROSS JOIN cent),
       |celled AS (SELECT vec_id, v, cid AS cell FROM assigned WHERE rn = 1),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |probes AS (
       |  SELECT cid,
       |         row_number() OVER (ORDER BY
       |           ${cosineSql("c", "q.qv")} DESC, cid DESC) AS pr
       |  FROM cent, q),
       |cand AS (SELECT d.vec_id, d.v FROM celled d
       |         JOIN probes p ON d.cell = p.cid AND p.pr <= 4
       |         WHERE d.vec_id <> 0),
       |subs AS (SELECT CAST(unnest(range(8)) AS INT) AS s),
       |cw AS (SELECT s, cid, c[s*8+1 : s*8+8] AS csub FROM cent, subs),
       |asg0 AS (SELECT d.vec_id, w.s, w.cid,
       |           2*list_dot_product(d.v[w.s*8+1 : w.s*8+8], w.csub)
       |             - list_dot_product(w.csub, w.csub) AS score
       |         FROM cand d CROSS JOIN cw w),
       |asg AS (SELECT *, row_number() OVER (PARTITION BY vec_id, s
       |                    ORDER BY score DESC, cid DESC) AS rn
       |        FROM asg0),
       |codes AS (SELECT vec_id,
       |            max(CASE WHEN s=0 THEN cid END) AS c0,
       |            max(CASE WHEN s=1 THEN cid END) AS c1,
       |            max(CASE WHEN s=2 THEN cid END) AS c2,
       |            max(CASE WHEN s=3 THEN cid END) AS c3,
       |            max(CASE WHEN s=4 THEN cid END) AS c4,
       |            max(CASE WHEN s=5 THEN cid END) AS c5,
       |            max(CASE WHEN s=6 THEN cid END) AS c6,
       |            max(CASE WHEN s=7 THEN cid END) AS c7
       |          FROM asg WHERE rn = 1 GROUP BY vec_id),
       |adc AS (SELECT w.s, w.cid,
       |               list_dot_product(q.qv[w.s*8+1 : w.s*8+8], w.csub) AS t
       |        FROM cw w, q),
       |ivfpqscore AS (
       |  SELECT cv.vec_id,
       |         (((((((a0.t + a1.t) + a2.t) + a3.t) + a4.t) + a5.t) + a6.t) + a7.t)
       |           AS qscore
       |  FROM codes cv
       |  JOIN adc a0 ON a0.s = 0 AND a0.cid = cv.c0
       |  JOIN adc a1 ON a1.s = 1 AND a1.cid = cv.c1
       |  JOIN adc a2 ON a2.s = 2 AND a2.cid = cv.c2
       |  JOIN adc a3 ON a3.s = 3 AND a3.cid = cv.c3
       |  JOIN adc a4 ON a4.s = 4 AND a4.cid = cv.c4
       |  JOIN adc a5 ON a5.s = 5 AND a5.cid = cv.c5
       |  JOIN adc a6 ON a6.s = 6 AND a6.cid = cv.c6
       |  JOIN adc a7 ON a7.s = 7 AND a7.cid = cv.c7)""".stripMargin

  /** Artifact path for the p53 delta-dedup LSH index (same per-run
    * contract as [[bpeVocabPath]]).
    */
  private def deltaIndexPath = s"$artifactRoot/lsh_index_p53"

  /** Artifact path for the p20 materialized IVF ANN index (same
    * per-run contract as [[bpeVocabPath]]).
    */
  private def ivfIndexPath = s"$artifactRoot/ivf_index_p20"
  private def filteredIvfPath = s"$artifactRoot/ivf_index_p140"
  /** The p146/p149 shared match-derivation CTE chain: windows →
    * df-capped duplicated hashes → canonical occurrence pairs →
    * diagonal runs (gap tolerance k−1 = 20−1, see
    * [[graft.pipeline.Spans.maximalDuplicateSubstrings]]) → run ids.
    * One definition so the two gates can never certify different
    * match sets.
    */
  private[queries] val maximalMatchCtesSql: String =
    """win AS (
      |  SELECT doc_id, CAST(i AS INT) AS pos,
      |         ('0x' || substr(md5(substr(text, CAST(i AS INT)+1, 20)), 1, 15))::BIGINT AS h
      |  FROM (SELECT doc_id, text,
      |               unnest(range(greatest(length(text) - 20 + 1, 0))) AS i
      |        FROM documents)),
      |keep AS (SELECT h FROM win GROUP BY h
      |         HAVING count(*) >= 2 AND count(*) <= 1000),
      |occ AS (SELECT win.* FROM win JOIN keep USING (h)),
      |pairs AS (SELECT a.doc_id AS doc_a, a.pos AS pos_a,
      |                 b.doc_id AS doc_b, b.pos AS pos_b,
      |                 a.pos - b.pos AS diag
      |          FROM occ a JOIN occ b USING (h)
      |          WHERE a.doc_id < b.doc_id
      |             OR (a.doc_id = b.doc_id AND a.pos < b.pos)),
      |runs AS (SELECT *,
      |           CASE WHEN lag(pos_a) OVER w IS NULL
      |                  OR pos_a - lag(pos_a) OVER w > 20
      |                THEN 1 ELSE 0 END AS new_run
      |         FROM pairs
      |         WINDOW w AS (PARTITION BY doc_a, doc_b, diag
      |                      ORDER BY pos_a)),
      |rid AS (SELECT *,
      |          sum(new_run) OVER (PARTITION BY doc_a, doc_b, diag
      |                             ORDER BY pos_a) AS run_id
      |        FROM runs)""".stripMargin

  /** The p142 gapfill/locf oracle — shared verbatim by the st42
    * streaming twin (the accumulated stateful emissions equal the
    * batch grid exactly).
    */
  private[queries] def gapfillLocfOracleSql: String =
    """WITH s AS (SELECT l_partkey AS item_id,
      |                 CAST(l_shipdate AS DATE) AS d,
      |                 AVG(l_extendedprice) AS price
      |          FROM lineitem WHERE l_partkey <= 20
      |          GROUP BY 1, 2),
      |span AS (SELECT item_id, min(d) AS lo, max(d) AS hi
      |         FROM s GROUP BY 1),
      |grid AS (SELECT item_id,
      |                CAST(unnest(generate_series(lo, hi,
      |                  INTERVAL 1 DAY)) AS DATE) AS d
      |         FROM span),
      |j AS (SELECT g.item_id, g.d, s.price
      |      FROM grid g LEFT JOIN s
      |        ON s.item_id = g.item_id AND s.d = g.d)
      |SELECT item_id, d AS snapshot_date,
      |       last_value(price IGNORE NULLS) OVER (
      |         PARTITION BY item_id ORDER BY d
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |         AS price
      |FROM j""".stripMargin

  /** The p144 bfill oracle — shared verbatim by the st44 streaming
    * twin (same retroactive-emission equality as locf/st42).
    */
  private[queries] def gapfillBfillOracleSql: String =
    """WITH s AS (SELECT l_partkey AS item_id,
      |                 CAST(l_shipdate AS DATE) AS d,
      |                 AVG(l_extendedprice) AS price
      |          FROM lineitem WHERE l_partkey <= 20
      |          GROUP BY 1, 2),
      |span AS (SELECT item_id, min(d) AS lo, max(d) AS hi
      |         FROM s GROUP BY 1),
      |grid AS (SELECT item_id,
      |                CAST(unnest(generate_series(lo, hi,
      |                  INTERVAL 1 DAY)) AS DATE) AS d
      |         FROM span),
      |j AS (SELECT g.item_id, g.d, s.price
      |      FROM grid g LEFT JOIN s
      |        ON s.item_id = g.item_id AND s.d = g.d)
      |SELECT item_id, d AS snapshot_date,
      |       first_value(price IGNORE NULLS) OVER (
      |         PARTITION BY item_id ORDER BY d
      |         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |         AS price
      |FROM j""".stripMargin

  /** The p150 month-grain oracle — shared verbatim by the st46
    * streaming twin (round 16): the calendar-interval grid
    * (generate_series INTERVAL 1 MONTH), locf + real-day-linear
    * interp over the same monthly buckets. Batch and stream agree by
    * the same argument as the fixed-step twins: the stream's
    * month-arithmetic walk (LocalDate.plusMonths on month starts)
    * emits exactly the sequence() grid, and the arriving observation
    * is interp's forward anchor.
    */
  private[queries] def gapfillMonthlyOracleSql: String =
    """WITH s AS (SELECT l_suppkey AS supp_id,
      |                  CAST(date_trunc('month', l_shipdate) AS DATE) AS m,
      |                  AVG(l_extendedprice) AS v
      |           FROM lineitem
      |           WHERE l_suppkey <= 40
      |             AND date_part('day', l_shipdate) = 3
      |           GROUP BY 1, 2),
      |span AS (SELECT supp_id, min(m) AS lo, max(m) AS hi
      |         FROM s GROUP BY 1),
      |grid AS (SELECT supp_id,
      |                CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
      |                  CAST(hi AS TIMESTAMP),
      |                  INTERVAL 1 MONTH)) AS DATE) AS m
      |         FROM span),
      |j AS (SELECT g.supp_id, g.m, s.v
      |      FROM grid g LEFT JOIN s
      |        ON s.supp_id = g.supp_id AND s.m = g.m),
      |a AS (SELECT supp_id, m, v,
      |        last_value(v IGNORE NULLS) OVER (
      |          PARTITION BY supp_id ORDER BY m
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |          AS prev_v,
      |        last_value(CASE WHEN v IS NOT NULL THEN m END
      |          IGNORE NULLS) OVER (
      |          PARTITION BY supp_id ORDER BY m
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |          AS prev_d,
      |        first_value(v IGNORE NULLS) OVER (
      |          PARTITION BY supp_id ORDER BY m
      |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |          AS next_v,
      |        first_value(CASE WHEN v IS NOT NULL THEN m END
      |          IGNORE NULLS) OVER (
      |          PARTITION BY supp_id ORDER BY m
      |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |          AS next_d
      |      FROM j)
      |SELECT supp_id, m AS month_start,
      |       prev_v AS v_locf,
      |       CASE WHEN next_d IS NULL OR next_d = prev_d THEN prev_v
      |            ELSE prev_v + (next_v - prev_v) *
      |                 (CAST(m - prev_d AS DOUBLE) /
      |                  CAST(next_d - prev_d AS DOUBLE))
      |       END AS v_interp
      |FROM a""".stripMargin

  /** The p143 interpolation oracle — shared verbatim by the st43
    * streaming twin: the arriving observation IS the forward anchor,
    * so retroactive emission reproduces the batch formula exactly
    * (identical double arithmetic: ratio first, then multiply-add).
    */
  private[queries] def gapfillInterpOracleSql: String =
    """WITH s AS (SELECT l_partkey AS item_id,
      |                 CAST(l_shipdate AS DATE) AS d,
      |                 AVG(l_extendedprice) AS price
      |          FROM lineitem WHERE l_partkey <= 20
      |          GROUP BY 1, 2),
      |span AS (SELECT item_id, min(d) AS lo, max(d) AS hi
      |         FROM s GROUP BY 1),
      |grid AS (SELECT item_id,
      |                CAST(unnest(generate_series(lo, hi,
      |                  INTERVAL 1 DAY)) AS DATE) AS d
      |         FROM span),
      |j AS (SELECT g.item_id, g.d, s.price
      |      FROM grid g LEFT JOIN s
      |        ON s.item_id = g.item_id AND s.d = g.d),
      |a AS (SELECT item_id, d, price,
      |        last_value(price IGNORE NULLS) OVER (
      |          PARTITION BY item_id ORDER BY d
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |          AS prev_v,
      |        last_value(CASE WHEN price IS NOT NULL THEN d END
      |          IGNORE NULLS) OVER (
      |          PARTITION BY item_id ORDER BY d
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |          AS prev_d,
      |        first_value(price IGNORE NULLS) OVER (
      |          PARTITION BY item_id ORDER BY d
      |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |          AS next_v,
      |        first_value(CASE WHEN price IS NOT NULL THEN d END
      |          IGNORE NULLS) OVER (
      |          PARTITION BY item_id ORDER BY d
      |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |          AS next_d
      |      FROM j)
      |SELECT item_id, d AS snapshot_date,
      |       CASE WHEN next_d IS NULL OR next_d = prev_d THEN prev_v
      |            ELSE prev_v + (next_v - prev_v) *
      |                 (CAST(d - prev_d AS DOUBLE) /
      |                  CAST(next_d - prev_d AS DOUBLE))
      |       END AS price
      |FROM a""".stripMargin

  private def nswLifePath = s"$artifactRoot/nsw_index_p135"

  /** The SHARED NSW index (round-16, verdict ask #1a): p132, p139,
    * p148 and st40 all need the IDENTICAL deterministic index (same
    * embeddings table, same md5-strided hubs, same writeIndex
    * defaults), and until round 15 each gate rebuilt its own copy —
    * the build, not the search, dominated every one of them in the
    * bench (p148: 11.66 s of which ~9.7 s build). Gates whose
    * certified contract is SEARCH/SERVING call [[ensureSharedNswIndex]]
    * (build-if-missing); p132 — whose contract IS the construction —
    * forces a rebuild every call, so the construction is still timed
    * and hash-pinned end-to-end once per pass.
    *
    * Staleness safety: the memo key is (artifactRoot, data dir) and
    * lives only for the JVM — every Bench/Verify invocation is a fresh
    * JVM, so an index is never reused across runs (a driver that
    * regenerated testdata between rounds can't serve stale edges);
    * the path is ALSO keyed by the data dir so a warmup build at
    * sf0.001 never aliases the timed sf0.1 index within one session.
    * Construction is fully deterministic (md5 planes/stride,
    * ascending-id tie-breaks), so WHICH gate builds first is
    * irrelevant to every consumer's hash gate.
    */
  private val nswSharedBuilt =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private[queries] def ensureSharedNswIndex(s: SparkSession, dir: String,
      hubs: Array[(Long, Array[Float])], force: Boolean = false): String = {
    // Path and memo key carry (a) an md5 of the RAW dir — two distinct
    // dirs that sanitize identically must never share a path (the
    // sanitized name alone would let each win the memo race and
    // clobber the other's edges) — and (b) a hub discriminator, so a
    // future caller with different hub geometry gets its own index
    // instead of silently searching a mismatched one (round-16
    // ADVICE). md5 keeps the key deterministic across JVMs.
    val sig = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(dir.getBytes("UTF-8"))
      hubs.foreach(h => md.update(java.nio.ByteBuffer.allocate(8)
        .putLong(h._1).array()))
      md.digest().take(6).map("%02x".format(_)).mkString
    }
    val key = s"${dir.replaceAll("[^A-Za-z0-9._-]", "_")}_$sig"
    val path = s"$artifactRoot/nsw_index_shared_$key"
    val first = nswSharedBuilt.add(s"$artifactRoot|$key")
    if (first || force)
      // splitBucket = None: every consumer's hash oracle replays the
      // UNSPLIT construction in SQL; the production default (writeIndex
      // without the pin) is the sub-bucketed scale-safe build
      GraphAnn.writeIndex(Tables.embeddings(s, dir), hubs, path,
        dim = Some(EmbeddingDim), splitBucket = None)
    path
  }

  /** Artifact path for the p91 eviction-gate LSH index. */
  private def evictLshIndexPath = s"$artifactRoot/lsh_index_p91"

  /** Artifact path for the p92 eviction-gate IVF index. */
  private def evictIvfIndexPath = s"$artifactRoot/ivf_index_p92"

  /** The p95 classifier training + scoring recomputed end-to-end in
    * SQL — shared verbatim by the batch gate (p95) and its streaming
    * twin (st20): the inline scan scorer must reproduce the trained
    * model's scores batch-for-stream (stateless projection, so
    * micro-batching cannot change a single row).
    */
  private[queries] def qualityClassifierOracleSql: String =
    s"""WITH $classifierCtesSql
       |SELECT doc_id, score FROM clf""".stripMargin

  /** The p95 training+scoring cascade as a composable CTE fragment
    * ending in `clf(doc_id, score)` — shared by the p95/st20 wrapper
    * above and the st28 composed-pipeline oracle. (Internal names
    * carr/... chosen not to collide with the LM cascade's.)
    */
  private[queries] def classifierCtesSql: String =
    """carr AS (
           |  SELECT doc_id, source,
           |         list_filter(string_split_regex(trim(text), '\s+'),
           |                     t -> t <> '') AS w
           |  FROM documents),
           |feats AS (
           |  SELECT doc_id, unnest(w) AS ft FROM carr
           |  UNION ALL
           |  SELECT doc_id,
           |         unnest(list_transform(range(1, len(w)),
           |                i -> w[i] || ' ' || w[i+1])) AS ft
           |  FROM carr),
           |dc AS (SELECT doc_id,
           |              ('0x' || substr(md5(ft), 1, 15))::BIGINT % 256 AS b,
           |              CAST(count(*) AS BIGINT) AS c
           |       FROM feats GROUP BY 1, 2),
           |nf AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS nfc FROM dc GROUP BY 1),
           |xf AS (SELECT dc.doc_id, dc.b, dc.c::DOUBLE / nf.nfc AS x
           |       FROM dc JOIN nf USING (doc_id)),
           |lab AS (SELECT doc_id,
           |               CASE WHEN source = 'src0' THEN 1.0 ELSE 0.0 END AS y
           |        FROM documents),
           |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
           |e1 AS (SELECT doc_id, 0.5 - y AS err FROM lab),
           |gb1 AS (SELECT CAST(CAST(sum(err) AS REAL) AS DOUBLE) AS g FROM e1),
           |gw1 AS (SELECT xf.b, CAST(CAST(sum(e1.err * xf.x) AS REAL) AS DOUBLE) AS g
           |        FROM e1 JOIN xf USING (doc_id) GROUP BY 1),
           |w1 AS (SELECT ids.b,
           |              COALESCE(-4.0 * gw1.g / nn.n, 0.0) AS w
           |       FROM (SELECT unnest(range(256)) AS b) ids
           |       LEFT JOIN gw1 ON gw1.b = ids.b
           |       CROSS JOIN nn),
           |b1 AS (SELECT -4.0 * g / nn.n AS bias FROM gb1 CROSS JOIN nn),
           |d2 AS (SELECT xf.doc_id, sum(xf.x * w1.w) AS dot
           |       FROM xf JOIN w1 ON w1.b = xf.b GROUP BY 1),
           |e2 AS (SELECT lab.doc_id,
           |              1.0 / (1.0 + exp(-(COALESCE(d2.dot, 0.0) + b1.bias))) - lab.y AS err
           |       FROM lab LEFT JOIN d2 USING (doc_id) CROSS JOIN b1),
           |gb2 AS (SELECT CAST(CAST(sum(err) AS REAL) AS DOUBLE) AS g FROM e2),
           |gw2 AS (SELECT xf.b, CAST(CAST(sum(e2.err * xf.x) AS REAL) AS DOUBLE) AS g
           |        FROM e2 JOIN xf USING (doc_id) GROUP BY 1),
           |w2 AS (SELECT w1.b, w1.w - COALESCE(4.0 * gw2.g / nn.n, 0.0) AS w
           |       FROM w1 LEFT JOIN gw2 ON gw2.b = w1.b CROSS JOIN nn),
           |b2 AS (SELECT b1.bias - 4.0 * gb2.g / nn.n AS bias
           |       FROM b1 CROSS JOIN gb2 CROSS JOIN nn),
           |df AS (SELECT xf.doc_id, sum(xf.x * w2.w) AS dot
           |       FROM xf JOIN w2 ON w2.b = xf.b GROUP BY 1),
           |clf AS (SELECT lab.doc_id,
           |          1.0 / (1.0 + exp(-(COALESCE(df.dot, 0.0) + b2.bias))) AS score
           |        FROM lab LEFT JOIN df USING (doc_id) CROSS JOIN b2)""".stripMargin

  /** Artifact path for the p94 incremental-ingest LSH index. */
  private def incrIndexPath = s"$artifactRoot/lsh_index_p94"

  /** The p20/p92 construction recomputed from scratch in SQL:
    * centroids md5-spread-sampled from the EVEN half, every row
    * assigned to its argmax-cosine cell, the 4 probe cells ranked for
    * query vec 0, candidates scored exactly. `dPred` filters the
    * INDEXED rows (`d`) — p92 states its eviction ("these vec_ids
    * are out of the index") there; p20 passes TRUE.
    */
  private def ivfIndexedTopkOracleSql(dPred: String): String =
    s"""WITH half AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |             FROM embeddings WHERE vec_id % 2 = 0),
       |stride AS (SELECT greatest(count(*) // 16, 1) AS bkt FROM half),
       |cent AS (SELECT vec_id AS cid, v AS c
       |         FROM half, stride
       |         WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR) || '/ivf'), 1, 8))::BIGINT
       |               % bkt = 0
       |         ORDER BY vec_id LIMIT 16),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |assigned AS (
       |  SELECT vec_id, v, cid,
       |         row_number() OVER (PARTITION BY vec_id
       |           ORDER BY list_dot_product(v, c) / sqrt(list_dot_product(c, c)) DESC,
       |                    cid DESC) AS rn
       |  FROM e CROSS JOIN cent),
       |celled AS (SELECT vec_id, v, cid AS cell FROM assigned WHERE rn = 1),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |probes AS (
       |  SELECT cid,
       |         row_number() OVER (ORDER BY
       |           ${cosineSql("c", "q.qv")} DESC, cid DESC) AS pr
       |  FROM cent, q)
       |SELECT d.vec_id,
       |       ${cosineSql("d.v", "q.qv")} AS cosine
       |FROM celled d
       |JOIN probes p ON d.cell = p.cid AND p.pr <= 4
       |CROSS JOIN q
       |WHERE ($dPred)
       |ORDER BY cosine DESC, d.vec_id ASC
       |LIMIT 10""".stripMargin

  /** Artifact path for the p75 incremental-semdedup IVF index (same
    * per-run contract as [[bpeVocabPath]]).
    */
  private def semDedupIndexPath = s"$artifactRoot/ivf_index_p75"

  /** Artifact path for the p55 training-export shards (same per-run
    * contract as [[bpeVocabPath]]; the gate's manifest is computed by
    * reading these files back, the oracle recomputes it from the raw
    * corpus — a mismatch means the written files lost/changed rows).
    */
  private def shardExportPath = s"$artifactRoot/shard_export_p55"

  /** Artifact path for the p96 JSONL export gate. */
  private def jsonlExportPath = s"$artifactRoot/jsonl_export_p96"

  /** The driver-generated embeddings tables are 64-dimensional at
    * every scale factor (TESTDATA.md); [[Similarity.dimOf]] resolves
    * this value at plan time, the oracles pin it.
    */
  private[queries] val EmbeddingDim = 64

  /** [[Similarity.plane]]'s ±1 components as a DuckDB DOUBLE[]
    * literal — the oracle scores the exact hyperplanes the engine
    * derives from md5("plane:b:i").
    */
  private def planeListSql(b: Int): String =
    graft.pipeline.Similarity.plane(b, EmbeddingDim)
      .map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ", ", "]")

  /** The p12 embedding near-dup pair pipeline as a CTE chain ending
    * in `epairs(id_a, id_b, cosine)` — single-sourced for the pair
    * gate (p12) and the semantic-cluster gate (p30, components over
    * these pairs). Mirrors [[Similarity.embeddingNearDups]] at
    * threshold 0.3, bits 2, with the hot-bucket cap and the
    * malformed-vector len filter.
    */
  private def embPairsCtes =
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |      FROM embeddings
       |      WHERE len(embedding) = $EmbeddingDim),
       |b AS (SELECT vec_id, v,
       |        ${bucketSql("v", 2)} AS bucket
       |      FROM e),
       |keep AS (SELECT bucket FROM b GROUP BY bucket HAVING count(*) <= 100000),
       |epairs AS (SELECT a.vec_id AS id_a, c.vec_id AS id_b,
       |                  ${cosineSql("a.v", "c.v")} AS cosine
       |           FROM b a
       |           JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
       |           JOIN keep k ON k.bucket = a.bucket
       |           WHERE ${cosineSql("a.v", "c.v")} >= 0.3)""".stripMargin

  /** Sign-LSH bucket id of DOUBLE[] expression `vecExpr`, mirroring
    * [[Similarity.lshBucket]]: bit b set iff vec . plane(b) > 0.
    */
  private[queries] def bucketSql(vecExpr: String, bits: Int): String =
    (0 until bits).map(b =>
      s"(CASE WHEN list_dot_product($vecExpr, ${planeListSql(b)}) > 0 THEN ${1L << b} ELSE 0 END)")
      .mkString("\n          + ")

  /** DuckDB cosine between two DOUBLE[] expressions — identical
    * product/accumulation order to the engine's FloatVectorDot
    * (proven bit-exact by the p10/p14 gates).
    */
  private def cosineSql(a: String, b: String): String =
    s"""list_dot_product($a, $b)
       |  / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))""".stripMargin

  /** SimHash signature CTEs mirroring [[Dedup.simHashSignatures]]:
    * per-token 60-bit md5 hash, per-bit +1/-1 votes, sign bits
    * assembled into `sig`. Produces CTEs `tok`, `toksh`, `votes`,
    * `sigs(doc_id, sig)`.
    */
  private val simHashSigSql: String = {
    val votes = (0 until graft.pipeline.Dedup.SimHashBits).map(b =>
      s"sum(CASE WHEN ((h >> $b) & 1) = 1 THEN 1 ELSE -1 END) AS v$b")
      .mkString(",\n         ")
    val sig = (0 until graft.pipeline.Dedup.SimHashBits).map(b =>
      s"(CASE WHEN v$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")
    s"""tok AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
       |  FROM documents),
       |toksh AS (
       |  SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h
       |  FROM tok WHERE t <> ''),
       |votes AS (
       |  SELECT doc_id,
       |         $votes
       |  FROM toksh GROUP BY doc_id),
       |sigs AS (SELECT doc_id, $sig AS sig FROM votes)""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(

    // Exact dedup: content-hash groups with deterministic keeper.
    QueryDef("p01_exact_dup_groups",
      (s, dir) => Dedup.exactDuplicateGroups(Tables.documents(s, dir)),
      Some("""SELECT md5(text) AS content_hash,
             |       count(*) AS dup_count,
             |       min(doc_id) AS keeper_doc_id
             |FROM documents GROUP BY md5(text)""".stripMargin)),

    QueryDef("p02_drop_exact_dups",
      (s, dir) => Dedup.dropExactDuplicates(Tables.documents(s, dir))
        .select("doc_id", "text", "lang", "source", "n_chars"),
      Some("""SELECT doc_id, text, lang, source, n_chars
             |FROM (SELECT *, row_number() OVER (
             |        PARTITION BY md5(text) ORDER BY doc_id) AS rn
             |      FROM documents)
             |WHERE rn = 1""".stripMargin)),

    // Canonical content fingerprint (rolling-normalization hash).
    QueryDef("p03_fingerprint",
      (s, dir) => Tables.documents(s, dir).select(
        col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp")),
      Some("""SELECT doc_id,
             |       md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
             |FROM documents""".stripMargin)),

    // Quality scoring: token/stopword/alpha ratios + composite score.
    QueryDef("p04_quality_features",
      (s, dir) => TextAnalysis.qualityFeatures(Tables.documents(s, dir))
        .select("doc_id", "n_tokens", "n_stopwords", "alpha_chars",
          "n_chars_total", "stopword_ratio", "alpha_ratio", "quality_score"),
      Some(s"""WITH f AS (SELECT doc_id, $qualityColsSql FROM documents)
              |SELECT doc_id, n_tokens, n_stopwords, alpha_chars, n_chars_total,
              |       n_stopwords / nullif(n_tokens, 0) AS stopword_ratio,
              |       alpha_chars / nullif(n_chars_total, 0) AS alpha_ratio,
              |       $qualityScoreSql AS quality_score
              |FROM f""".stripMargin)),

    // Language ID: per-language marker-word hit counts, fixed-priority argmax.
    QueryDef("p05_lang_id",
      (s, dir) => TextAnalysis.langId(Tables.documents(s, dir))
        .select("doc_id", "en_hits", "es_hits", "de_hits", "fr_hits",
          "predicted_lang"),
      Some(
        s"""WITH f AS (SELECT doc_id, $langHitsSql FROM documents)
           |SELECT doc_id, en_hits, es_hits, de_hits, fr_hits,
           |       $langCaseSql
           |FROM f""".stripMargin)),

    // Shingle inverted index (the substrate for all n-gram dedup).
    QueryDef("p06_word_shingles",
      (s, dir) => Dedup.wordShingles(Tables.documents(s, dir), n = 3),
      Some(s"""WITH $shingleSql
              |SELECT doc_id, shingle FROM sh""".stripMargin)),

    // Exact n-gram Jaccard near-dup pairs (frequency-capped index).
    QueryDef("p07_jaccard_pairs",
      (s, dir) => Dedup.jaccardPairs(
        Dedup.wordShingles(Tables.documents(s, dir), n = 3),
        threshold = 0.8, maxShingleDf = 1000),
      Some(s"""WITH $shingleSql,
              |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS set_size
              |          FROM sh GROUP BY doc_id),
              |capped AS (SELECT s.* FROM sh s
              |           JOIN (SELECT shingle FROM sh
              |                 GROUP BY shingle HAVING count(*) <= 1000) c
              |           USING (shingle)),
              |common AS (
              |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |         CAST(count(*) AS BIGINT) AS common
              |  FROM capped a JOIN capped b
              |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              |  GROUP BY a.doc_id, b.doc_id)
              |SELECT doc_a, doc_b, common,
              |       sa.set_size AS size_a, sb.set_size AS size_b,
              |       common / (sa.set_size + sb.set_size - common) AS jaccard
              |FROM common
              |JOIN sizes sa ON sa.doc_id = doc_a
              |JOIN sizes sb ON sb.doc_id = doc_b
              |WHERE common / (sa.set_size + sb.set_size - common) >= 0.8""".stripMargin)),

    // Containment (overlap coefficient) pairs over the same index —
    // catches short-doc-quoted-in-long-doc dups whose Jaccard is low.
    // Threshold 0.5 so partial containment also surfaces at sf scale.
    QueryDef("p07b_containment_pairs",
      (s, dir) => Dedup.containmentPairs(
        Dedup.wordShingles(Tables.documents(s, dir), n = 3),
        threshold = 0.5, maxShingleDf = 1000),
      Some(s"""WITH $shingleSql,
              |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS set_size
              |          FROM sh GROUP BY doc_id),
              |capped AS (SELECT s.* FROM sh s
              |           JOIN (SELECT shingle FROM sh
              |                 GROUP BY shingle HAVING count(*) <= 1000) c
              |           USING (shingle)),
              |common AS (
              |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |         CAST(count(*) AS BIGINT) AS common
              |  FROM capped a JOIN capped b
              |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              |  GROUP BY a.doc_id, b.doc_id)
              |SELECT doc_a, doc_b, common,
              |       sa.set_size AS size_a, sb.set_size AS size_b,
              |       common / least(sa.set_size, sb.set_size) AS containment
              |FROM common
              |JOIN sizes sa ON sa.doc_id = doc_a
              |JOIN sizes sb ON sb.doc_id = doc_b
              |WHERE common / least(sa.set_size, sb.set_size) >= 0.5""".stripMargin)),

    // Character 5-gram shingles (canonical-form text) — the
    // whitespace-free dedup substrate; composes with the same
    // jaccard/minhash machinery as word shingles.
    QueryDef("p06b_char_shingles",
      (s, dir) => Dedup.charShingles(Tables.documents(s, dir), n = 5),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |         lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS s
             |  FROM documents)
             |SELECT DISTINCT doc_id, shingle FROM (
             |  SELECT doc_id,
             |         unnest(list_transform(range(1, length(s) - 3),
             |                i -> substring(s, CAST(i AS INTEGER), 5))) AS shingle
             |  FROM t)""".stripMargin)),

    // MinHash+LSH near-dups: linear candidate generation, exact
    // verify. The oracle recomputes the md5-derived double-hashing
    // signatures (h_i = a + i*b over two md5 halves), the md5 band
    // buckets, the candidate pairs AND the exact-Jaccard verification
    // — the full pipeline hash-matches across engines.
    QueryDef("p08_minhash_neardups",
      (s, dir) => Dedup.minHashNearDups(
        Tables.documents(s, dir), threshold = 0.8),
      Some(s"""WITH $minhashPairsCtes
              |SELECT doc_a, doc_b, jaccard FROM pairs""".stripMargin)),

    // Duplicate CLUSTERS: connected components over the p08 verified
    // near-dup pairs (label propagation + pointer shortcut in the
    // engine). The oracle rebuilds the SAME pair set via the shared
    // CTE chain, then computes each node's component as the min id
    // reachable through a recursive CTE — two entirely different
    // component algorithms agreeing bit-for-bit on (doc, cluster,
    // size).
    QueryDef("p28_dup_clusters",
      (s, dir) => Clusters.nearDupClusters(
        Tables.documents(s, dir), threshold = 0.8),
      Some(s"""WITH RECURSIVE $minhashPairsCtes,
              |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
              |          UNION SELECT doc_b, doc_a FROM pairs),
              |reach AS (SELECT src AS node, dst AS r FROM edges
              |          UNION
              |          SELECT e.src, rc.r FROM edges e JOIN reach rc ON rc.node = e.dst),
              |lbl AS (SELECT node AS doc_id, least(node, min(r)) AS cluster_id
              |        FROM reach GROUP BY node)
              |SELECT doc_id, cluster_id, n_members
              |FROM lbl JOIN (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members
              |               FROM lbl GROUP BY cluster_id) USING (cluster_id)""".stripMargin)),

    // SimHash near-dups: banded hamming join. The banding is
    // output-invisible (pigeonhole: hamming <= 3 over 4 chunks always
    // shares a chunk — RecallGateSpec proves set equality with brute
    // force), so the oracle verifies via the brute-force hamming join
    // over the same md5-derived signatures.
    QueryDef("p09_simhash_neardups",
      (s, dir) => Dedup.simHashNearDups(Tables.documents(s, dir)),
      Some(s"""WITH $simHashSigSql
              |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |       CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
              |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
              |WHERE bit_count(xor(a.sig, b.sig)) <= 3""".stripMargin)),

    // Incremental corpus dedup against a MATERIALIZED LSH index: the
    // even-id half of documents is indexed (written once to parquet —
    // bands + shingles), the odd-id half arrives as the "new batch"
    // and dedups against the index without re-shingling the corpus.
    // The oracle recomputes both sides' signatures, the cross-side
    // candidates and the verified jaccard from scratch in SQL.
    QueryDef("p19_index_neardups",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Dedup.writeLshIndex(docs.where(col("doc_id") % 2 === 0), lshIndexPath)
        Dedup.nearDupsAgainstIndex(
          docs.where(col("doc_id") % 2 === 1), lshIndexPath, threshold = 0.8)
      },
      Some(indexNeardupsOracleSql)),

    // Materialized INCREMENTAL IVF index: build from the even half of
    // the corpus, append the odd half as a maintenance batch, then
    // answer a top-k through the cell-partitioned parquet (directory-
    // pruned probes — PlanSpec proves the PartitionFilters). The
    // oracle recomputes the whole construction in SQL: centroids
    // md5-spread-sampled from the EVEN half only, every row (both
    // halves) assigned to its argmax-cosine cell, the 4 probe cells
    // ranked for the query, candidates scored exactly. The query row
    // itself is in the index, so it leads the result at cosine 1.
    QueryDef("p20_ivf_index_topk",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val base = emb.where(col("vec_id") % 2 === 0)
        val batch = emb.where(col("vec_id") % 2 === 1)
        val centroids = Similarity.sampleCentroids(base, nlist = 16)
        Similarity.writeIvfIndex(base, centroids, ivfIndexPath)
        Similarity.appendToIvfIndex(batch, centroids, ivfIndexPath, batchId = "b1")
        val qVec = emb.where(col("vec_id") === 0L)
          .select("embedding").head().getSeq[Float](0).toArray
        Similarity.ivfTopKIndexed(s, ivfIndexPath, centroids, qVec,
          k = 10, nprobe = 4)
      },
      Some(ivfIndexedTopkOracleSql("TRUE"))),

    // FILTERED IVF search (round 14, the graph family's p139 twin):
    // the metadata predicate applies to the probe scan ITSELF —
    // IVF's shortlist is exact within probed cells, so pre-filtering
    // keeps that exactness and the predicate reaches the parquet
    // index scan as a pushed filter (PlanSpec pins the pushdown).
    // Same index fixture as p20; the oracle is p20's probe/score SQL
    // with the predicate on the candidate set.
    QueryDef("p140_filtered_ivf",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val base = emb.where(col("vec_id") % 2 === 0)
        val batch = emb.where(col("vec_id") % 2 === 1)
        val centroids = Similarity.sampleCentroids(base, nlist = 16)
        Similarity.writeIvfIndex(base, centroids, filteredIvfPath)
        Similarity.appendToIvfIndex(batch, centroids, filteredIvfPath,
          batchId = "b1")
        val qVec = emb.where(col("vec_id") === 0L)
          .select("embedding").head().getSeq[Float](0).toArray
        Similarity.ivfTopKIndexed(s, filteredIvfPath, centroids, qVec,
          k = 10, nprobe = 4,
          filter = Some(col("vec_id") % 3 === 0))
      },
      Some(ivfIndexedTopkOracleSql("d.vec_id % 3 = 0"))),

    // IVF with k-means-REFINED centroids: the full Lloyd training
    // loop (2 iterations) recomputed in the oracle as unrolled SQL —
    // md5-spread seeds, argmax-cosine assignment, per-(cell, dim)
    // means ROUNDED THROUGH FLOAT exactly like the engine
    // (kmeansCentroids stores Float components; the REAL cast absorbs
    // double summation-order noise, which is what makes the hash
    // stable cross-engine), empty-cell fallback to the previous
    // centroid, then the standard probe/score tail under the refined
    // list. kmeansCentroids stops being a trust-me component.
    QueryDef("p22_ivf_kmeans_topk",
      (s, dir) => Similarity.ivfTopK(
        Tables.embeddings(s, dir), queryId = 0L, k = 10, nlist = 16,
        nprobe = 4, refineIters = 2),
      Some {
        def iter(inCent: String, out: String): String =
          s"""assigned_$out AS (
             |  SELECT e.vec_id, e.v, c.cid,
             |         row_number() OVER (PARTITION BY e.vec_id
             |           ORDER BY list_dot_product(e.v, c.c) / sqrt(list_dot_product(c.c, c.c)) DESC,
             |                    c.cid DESC) AS rn
             |  FROM e CROSS JOIN $inCent c),
             |celled_$out AS (SELECT vec_id, v, cid AS cell FROM assigned_$out WHERE rn = 1),
             |means_$out AS (
             |  SELECT cell, r.d AS d,
             |         CAST(CAST(avg(v[CAST(r.d AS INT) + 1]) AS REAL) AS DOUBLE) AS m
             |  FROM celled_$out, range($EmbeddingDim) r(d)
             |  GROUP BY cell, r.d),
             |rebuilt_$out AS (SELECT cell, list(m ORDER BY d) AS c
             |                 FROM means_$out GROUP BY cell),
             |$out AS (
             |  SELECT c0.cid, COALESCE(rb.c, c0.c) AS c
             |  FROM $inCent c0 LEFT JOIN rebuilt_$out rb ON rb.cell = c0.cid)"""
        s"""WITH stride AS (SELECT greatest(count(*) // 16, 1) AS bkt
           |                FROM embeddings),
           |cent0 AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS c
           |          FROM embeddings, stride
           |          WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR) || '/ivf'), 1, 8))::BIGINT
           |                % bkt = 0
           |          ORDER BY vec_id LIMIT 16),
           |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |${iter("cent0", "cent1")},
           |${iter("cent1", "cent2")},
           |assigned_f AS (
           |  SELECT e.vec_id, e.v, c.cid,
           |         row_number() OVER (PARTITION BY e.vec_id
           |           ORDER BY list_dot_product(e.v, c.c) / sqrt(list_dot_product(c.c, c.c)) DESC,
           |                    c.cid DESC) AS rn
           |  FROM e CROSS JOIN cent2 c),
           |celled_f AS (SELECT vec_id, v, cid AS cell FROM assigned_f WHERE rn = 1),
           |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
           |probes AS (
           |  SELECT cid,
           |         row_number() OVER (ORDER BY
           |           ${cosineSql("c", "q.qv")} DESC, cid DESC) AS pr
           |  FROM cent2, q)
           |SELECT d.vec_id,
           |       ${cosineSql("d.v", "q.qv")} AS cosine
           |FROM celled_f d
           |JOIN probes p ON d.cell = p.cid AND p.pr <= 4
           |CROSS JOIN q
           |WHERE d.vec_id <> 0
           |ORDER BY cosine DESC, d.vec_id ASC
           |LIMIT 10""".stripMargin
      }),

    // Sequence packing: every document's deterministic (shard, chunk,
    // offset) coordinate in the concatenated per-shard token stream a
    // training loader slices into fixed seqLen windows. One shuffle
    // by md5-derived shard, a per-shard running sum — the oracle
    // recomputes shard, whitespace token counts (p16's definition)
    // and the window arithmetic verbatim.
    QueryDef("p21_sequence_packing",
      (s, dir) => Packing.packSequences(
        Tables.documents(s, dir), seqLen = 512, nShards = 8),
      Some(s"""WITH t AS (SELECT doc_id,
              |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '/pack'), 1, 8))::BIGINT
              |           % 8 AS shard,
              |         CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
              |                              t -> t <> '')) AS BIGINT) AS n_tokens
              |       FROM documents),
              |w AS (SELECT doc_id, shard, n_tokens,
              |             COALESCE(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
              |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tb
              |      FROM t)
              |SELECT doc_id, shard, n_tokens,
              |       CAST(tb // 512 AS BIGINT) AS chunk_id,
              |       CAST(tb % 512 AS BIGINT) AS chunk_offset
              |FROM w""".stripMargin)),

    // Context-window chunking: fixed-size token windows with overlap
    // (chunk 32, overlap 8 => step 24; fixture docs span 1..~400
    // tokens so short last chunks AND multi-chunk docs are both
    // exercised). Narrow, shuffle-free plan — the oracle recomputes
    // the start offsets and 1-based inclusive list slices verbatim
    // on p16's tokenizer.
    QueryDef("p43_context_chunks",
      (s, dir) => Chunking.tokenChunks(
        Tables.documents(s, dir), chunkTokens = 32, overlap = 8),
      Some(s"""WITH toks AS (
              |  SELECT doc_id,
              |         list_filter(string_split_regex(trim(text), '\\s+'),
              |                     t -> t <> '') AS w
              |  FROM documents),
              |nz AS (SELECT doc_id, w, len(w) AS n FROM toks WHERE len(w) > 0)
              |SELECT doc_id,
              |       CAST(s // 24 AS BIGINT) AS chunk_id,
              |       array_to_string(w[s + 1 : least(s + 32, n)], ' ') AS chunk_text,
              |       CAST(least(32, n - s) AS BIGINT) AS n_tokens
              |FROM (SELECT doc_id, w, n, unnest(range(0, n, 24)) AS s FROM nz)""".stripMargin)),

    // Gopher-style within-doc repetition signals. The fixture text is
    // single-line, so the gate splits "lines" on the frequent token
    // ' a ' (a literal separator both engines split identically) to
    // exercise the line path on real structure; the n-gram fractions
    // are live on the fixture as-is (~70% of docs repeat a bigram).
    // Every fraction is one exact-integer division — hash-stable.
    QueryDef("p23_repetition_signals",
      (s, dir) => Repetition.signals(Tables.documents(s, dir),
        lineSep = " a ", topNs = Seq(2, 3), dupNs = Seq(2)),
      Some {
        // occurrence-counted (NOT distinct) word n-gram CTE: g<n>
        def gramCte(n: Int): String = {
          val gram = (0 until n).map(j => if (j == 0) "w[i]" else s"w[i+$j]")
            .mkString(" || ' ' || ")
          val rangeEnd = if (n == 2) "len(w)" else s"len(w) - ${n - 2}"
          s"""g$n AS (SELECT doc_id, gram, count(*) AS cnt FROM (
             |  SELECT doc_id, unnest(list_transform(range(1, $rangeEnd),
             |         i -> $gram)) AS gram FROM tk)
             |  GROUP BY doc_id, gram)"""
        }
        def topCte(n: Int): String =
          s"""t$n AS (SELECT doc_id, cnt * length(gram) AS top_chars FROM (
             |  SELECT doc_id, gram, cnt, row_number() OVER (PARTITION BY doc_id
             |    ORDER BY cnt DESC, gram ASC) AS rn FROM g$n) WHERE rn = 1)"""
        s"""WITH lines0 AS (
           |  SELECT doc_id,
           |         unnest(list_filter(string_split(text, ' a '), l -> l <> '')) AS line
           |  FROM documents),
           |lc AS (SELECT doc_id, line, count(*) AS cnt FROM lines0 GROUP BY doc_id, line),
           |ls AS (SELECT doc_id,
           |         CAST(sum(cnt) AS BIGINT) AS n_lines,
           |         CAST(sum(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS BIGINT) AS n_dup,
           |         CAST(sum(cnt * length(line)) AS BIGINT) AS line_chars,
           |         CAST(sum(CASE WHEN cnt >= 2 THEN cnt * length(line) ELSE 0 END) AS BIGINT) AS dup_chars
           |       FROM lc GROUP BY doc_id),
           |tk AS (SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'),
           |                                  t -> t <> '') AS w
           |       FROM documents),
           |${gramCte(2)},
           |${topCte(2)},
           |${gramCte(3)},
           |${topCte(3)},
           |d2 AS (SELECT doc_id,
           |         CAST(sum(CASE WHEN cnt >= 2 THEN cnt * length(gram) ELSE 0 END) AS BIGINT) AS dup_gram_chars
           |       FROM g2 GROUP BY doc_id),
           |base AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars FROM documents)
           |SELECT b.doc_id, b.n_chars,
           |       COALESCE(ls.n_lines, 0) AS n_lines,
           |       COALESCE(CAST(ls.n_dup AS DOUBLE) / nullif(ls.n_lines, 0), 0.0) AS dup_line_fraction,
           |       COALESCE(CAST(ls.dup_chars AS DOUBLE) / nullif(ls.line_chars, 0), 0.0) AS dup_line_char_fraction,
           |       COALESCE(CAST(t2.top_chars AS DOUBLE) / nullif(b.n_chars, 0), 0.0) AS top2gram_char_fraction,
           |       COALESCE(CAST(t3.top_chars AS DOUBLE) / nullif(b.n_chars, 0), 0.0) AS top3gram_char_fraction,
           |       least(COALESCE(CAST(d2.dup_gram_chars AS DOUBLE) / nullif(b.n_chars, 0), 0.0), 1.0) AS dup2gram_char_fraction
           |FROM base b
           |LEFT JOIN ls USING(doc_id) LEFT JOIN t2 USING(doc_id)
           |LEFT JOIN t3 USING(doc_id) LEFT JOIN d2 USING(doc_id)""".stripMargin
      }),

    // Benchmark decontamination: corpus docs sharing a verbatim word
    // 4-gram with the held-out "benchmark" slice (doc_id % 50 == 0 —
    // a deterministic eval-set stand-in). The benchmark shingle set is
    // broadcast in the engine; corpus text never shuffles.
    // Materialized-aggregate navigation: the engine's first
    // OPTIMIZER rule — a (returnflag, linestatus) rollup of lineitem
    // registered, then a subset-group query (filter on a grouping
    // column, SUM/COUNT/MIN/MAX/AVG) that the rule must redirect to
    // the rollup. The gate REFUSES to pass on a fact-table scan
    // (plan checked before materialization), and the hash oracle
    // computes from the BASE table — so the re-aggregation algebra
    // must be exact (l_quantity is integral-valued: re-associated
    // sums are bit-identical). Catalog scoped to the gate.
    QueryDef("p116_mv_rewrite",
      (s, dir) => {
        val basePath = s"$dir/lineitem.parquet"
        val mvDir = java.nio.file.Files.createTempDirectory("graft_mv")
        val mvPath = mvDir.resolve("mv.parquet").toString
        graft.plans.MaterializedAggregate.buildAndRegister(s, basePath,
          mvPath, Seq("l_returnflag", "l_linestatus"), Seq("l_quantity"))
        try {
          val q = s.read.parquet(basePath)
            .where(col("l_linestatus") === "F")
            .groupBy(col("l_returnflag"))
            .agg(sum("l_quantity").as("sum_qty"),
              count(lit(1)).as("n_rows"),
              min("l_quantity").as("min_qty"),
              max("l_quantity").as("max_qty"),
              avg("l_quantity").as("avg_qty"))
          val scanned = q.queryExecution.optimizedPlan.collect {
            case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
              r.relation match {
                case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                  fs.location.rootPaths.map(_.toUri.getPath)
                case _ => Seq.empty[String]
              }
          }.flatten
          require(scanned.exists(_.contains("mv.parquet")),
            s"MV rewrite did not fire; scans: $scanned")
          require(!scanned.exists(_.contains("lineitem.parquet")),
            s"fact table still scanned: $scanned")
          // materialize while the catalog is registered
          val rows = q.collect()
          s.createDataFrame(
            s.sparkContext.parallelize(rows.toSeq, 1), q.schema)
        } finally {
          graft.plans.MvCatalog.clear()
          try {
            import scala.jdk.CollectionConverters._
            java.nio.file.Files.walk(mvDir).iterator().asScala.toSeq
              .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
          } catch { case _: java.io.IOException => () }
        }
      },
      Some(mvRewriteOracleSql)),

    // MV navigation, round-11 second act: NULL-aware derivation +
    // coarsest-covering-rollup selection. The fact side injects NULL
    // quantities (l_orderkey % 7 — deterministic, oracle-restatable),
    // TWO rollups register — fine (returnflag, linestatus) and coarse
    // (returnflag) — and the gate REQUIRES the plan to land on the
    // coarse one (fewest grouping columns ≈ fewest rows; hash-map
    // iteration order would be nondeterministic plan choice).
    // COUNT(qty) must derive from the rollup's per-measure non-null
    // count and AVG(qty) must divide by it — dividing by the row
    // count under NULLs is the classic unsound MV rewrite, and the
    // base-table hash oracle fails on it (group sizes differ from
    // non-null counts by construction).
    QueryDef("p117_mv_nav_nulls",
      (s, dir) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft_mv2")
        val basePath = tmp.resolve("fact.parquet").toString
        val finePath = tmp.resolve("fine.parquet").toString
        val coarsePath = tmp.resolve("coarse.parquet").toString
        s.read.parquet(s"$dir/lineitem.parquet")
          .select(col("l_returnflag"), col("l_linestatus"),
            when(col("l_orderkey") % 7 === 0, lit(null))
              .otherwise(col("l_quantity")).as("qty"))
          .write.mode("overwrite").parquet(basePath)
        graft.plans.MaterializedAggregate.buildAndRegister(s, basePath,
          finePath, Seq("l_returnflag", "l_linestatus"), Seq("qty"))
        graft.plans.MaterializedAggregate.buildAndRegister(s, basePath,
          coarsePath, Seq("l_returnflag"), Seq("qty"))
        try {
          val q = s.read.parquet(basePath)
            .groupBy(col("l_returnflag"))
            .agg(count(lit(1)).as("n_rows"),
              count(col("qty")).as("n_qty"),
              sum("qty").as("sum_qty"),
              avg("qty").as("avg_qty"))
          val scanned = q.queryExecution.optimizedPlan.collect {
            case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
              r.relation match {
                case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                  fs.location.rootPaths.map(_.toUri.getPath)
                case _ => Seq.empty[String]
              }
          }.flatten
          require(scanned.exists(_.contains("coarse.parquet")),
            s"coarsest rollup not navigated; scans: $scanned")
          require(!scanned.exists(p =>
            p.contains("fine.parquet") || p.contains("fact.parquet")),
            s"finer-than-needed scan: $scanned")
          val rows = q.collect()
          s.createDataFrame(
            s.sparkContext.parallelize(rows.toSeq, 1), q.schema)
        } finally {
          graft.plans.MvCatalog.clear()
          try {
            import scala.jdk.CollectionConverters._
            java.nio.file.Files.walk(tmp).iterator().asScala.toSeq
              .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
          } catch { case _: java.io.IOException => () }
        }
      },
      Some("""SELECT l_returnflag,
             |       COUNT(*) AS n_rows,
             |       COUNT(qty) AS n_qty,
             |       SUM(qty) AS sum_qty,
             |       AVG(qty) AS avg_qty
             |FROM (SELECT l_returnflag,
             |             CASE WHEN l_orderkey % 7 = 0 THEN NULL
             |                  ELSE l_quantity END AS qty
             |      FROM lineitem)
             |GROUP BY l_returnflag""".stripMargin)),

    // Approximate-COUNT-DISTINCT navigable MV (the BigQuery/Druid
    // sketch-rollup trick): the rollup stores per-group HLL register
    // partials of the engine's 60-bit canonical-string hash, and the
    // optimizer rule rewrites a matching hyper_log_log(hash, p)
    // query aggregate to an elementwise-max register fold over the
    // rollup — BIT-identical to the one-shot sketch (max is
    // associative/commutative), so digest, zero-register count,
    // harmonic sum and estimate all hash-match the base-table oracle
    // while the plan never touches the fact table (gate-required).
    // The navigation fires only on an exact hash-tree + precision
    // match; count_distinct in the same aggregate would refuse it.
    QueryDef("p119_mv_distinct_nav",
      (s, dir) => {
        import graft.functions.{SketchFunctions => SK, Md5Hash}
        val basePath = s"$dir/lineitem.parquet"
        val mvDir = java.nio.file.Files.createTempDirectory("graft_mv3")
        val mvPath = mvDir.resolve("mv.parquet").toString
        graft.plans.MaterializedAggregate.buildAndRegister(s, basePath,
          mvPath, Seq("l_returnflag", "l_linestatus"), Seq("l_quantity"),
          distinctCols = Seq("l_suppkey"), hllP = 4)
        try {
          val q = s.read.parquet(basePath)
            .where(col("l_linestatus") === "F")
            .groupBy(col("l_returnflag"))
            .agg(sum("l_quantity").as("sum_qty"),
              SK.hyperLogLog(Md5Hash.h60String(col("l_suppkey")), 4)
                .as("__regs"))
            .select(col("l_returnflag"), col("sum_qty"),
              md5(array_join(transform(col("__regs"), _.cast("string")), ","))
                .as("register_digest"),
              SK.hllZeroRegisters(col("__regs")).as("n_zero_registers"),
              SK.hllHarmonicScaled(col("__regs")).as("harmonic_scaled"),
              SK.hllEstimate(col("__regs"), 4).as("est_distinct"))
          val scanned = q.queryExecution.optimizedPlan.collect {
            case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
              r.relation match {
                case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                  fs.location.rootPaths.map(_.toUri.getPath)
                case _ => Seq.empty[String]
              }
          }.flatten
          require(scanned.exists(_.contains("mv.parquet")),
            s"sketch navigation did not fire; scans: $scanned")
          require(!scanned.exists(_.contains("lineitem.parquet")),
            s"fact table still scanned: $scanned")
          val rows = q.collect()
          s.createDataFrame(
            s.sparkContext.parallelize(rows.toSeq, 1), q.schema)
        } finally {
          graft.plans.MvCatalog.clear()
          try {
            import scala.jdk.CollectionConverters._
            java.nio.file.Files.walk(mvDir).iterator().asScala.toSeq
              .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
          } catch { case _: java.io.IOException => () }
        }
      },
      Some(mvDistinctNavOracleSql)),

    // PARTIAL-rollup navigation (the partition-MV shape every
    // warehouse maintains: "this year's rollup", "shipped lines
    // only"): the rollup is built over a FILTERED base and navigates
    // only queries that repeat its build predicate conjunct-for-
    // conjunct (name-normalized syntactic subsumption — never
    // implication guessing); the residual returnflag conjunct
    // applies over the rollup as a grouping-column filter. Gate
    // requires the plan to land on the partial rollup with the fact
    // scan gone; oracle recomputes from the base table under both
    // predicates.
    QueryDef("p121_mv_partial_nav",
      (s, dir) => {
        val basePath = s"$dir/lineitem.parquet"
        val mvDir = java.nio.file.Files.createTempDirectory("graft_mv4")
        val mvPath = mvDir.resolve("pmv.parquet").toString
        graft.plans.MaterializedAggregate.buildAndRegister(s, basePath,
          mvPath, Seq("l_returnflag"), Seq("l_quantity"),
          baseFilter = Some("l_linestatus = 'F'"))
        try {
          val q = s.read.parquet(basePath)
            .where(col("l_linestatus") === "F" && col("l_returnflag") =!= "N")
            .groupBy(col("l_returnflag"))
            .agg(sum("l_quantity").as("sum_qty"),
              count(lit(1)).as("n_rows"),
              min("l_quantity").as("min_qty"),
              max("l_quantity").as("max_qty"),
              avg("l_quantity").as("avg_qty"))
          val scanned = q.queryExecution.optimizedPlan.collect {
            case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
              r.relation match {
                case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                  fs.location.rootPaths.map(_.toUri.getPath)
                case _ => Seq.empty[String]
              }
          }.flatten
          require(scanned.exists(_.contains("pmv.parquet")),
            s"partial rollup not navigated; scans: $scanned")
          require(!scanned.exists(_.contains("lineitem.parquet")),
            s"fact table still scanned: $scanned")
          val rows = q.collect()
          s.createDataFrame(
            s.sparkContext.parallelize(rows.toSeq, 1), q.schema)
        } finally {
          graft.plans.MvCatalog.clear()
          try {
            import scala.jdk.CollectionConverters._
            java.nio.file.Files.walk(mvDir).iterator().asScala.toSeq
              .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
          } catch { case _: java.io.IOException => () }
        }
      },
      Some("""SELECT l_returnflag,
             |       SUM(l_quantity) AS sum_qty,
             |       COUNT(*) AS n_rows,
             |       MIN(l_quantity) AS min_qty,
             |       MAX(l_quantity) AS max_qty,
             |       AVG(l_quantity) AS avg_qty
             |FROM lineitem
             |WHERE l_linestatus = 'F' AND l_returnflag <> 'N'
             |GROUP BY l_returnflag""".stripMargin)),

    // EXPRESSION-measure navigation — the TPC-H Q1 revenue shape:
    // the rollup registers "revenue" as price arithmetic (not a
    // column), and a query summing the EXACT same expression
    // (matched on the name-normalized, constant-folded tree)
    // navigates to sum_revenue/nnz_revenue. The measure is cast in
    // integer CENTS × integer discount-complement so re-associated
    // sums are bit-exact (prices/discounts are 2-decimal by
    // construction; fractional-double measures are the documented
    // MV-admission trade-off). AVG divides by the expression's
    // non-null count.
    QueryDef("p122_mv_expr_measure",
      (s, dir) => {
        val basePath = s"$dir/lineitem.parquet"
        val mvDir = java.nio.file.Files.createTempDirectory("graft_mv5")
        val mvPath = mvDir.resolve("emv.parquet").toString
        val revenue = "round(l_extendedprice * 100) * (100 - round(l_discount * 100))"
        graft.plans.MaterializedAggregate.buildAndRegister(s, basePath,
          mvPath, Seq("l_returnflag", "l_linestatus"), Seq("l_quantity"),
          exprMeasures = Map("revenue_c4" -> revenue))
        try {
          val q = s.read.parquet(basePath)
            .where(col("l_linestatus") === "F")
            .groupBy(col("l_returnflag"))
            .agg(sum("l_quantity").as("sum_qty"),
              sum(expr(revenue)).as("sum_revenue_c4"),
              avg(expr(revenue)).as("avg_revenue_c4"),
              count(lit(1)).as("n_rows"))
          val scanned = q.queryExecution.optimizedPlan.collect {
            case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
              r.relation match {
                case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                  fs.location.rootPaths.map(_.toUri.getPath)
                case _ => Seq.empty[String]
              }
          }.flatten
          require(scanned.exists(_.contains("emv.parquet")),
            s"expression measure not navigated; scans: $scanned")
          require(!scanned.exists(_.contains("lineitem.parquet")),
            s"fact table still scanned: $scanned")
          val rows = q.collect()
          s.createDataFrame(
            s.sparkContext.parallelize(rows.toSeq, 1), q.schema)
        } finally {
          graft.plans.MvCatalog.clear()
          try {
            import scala.jdk.CollectionConverters._
            java.nio.file.Files.walk(mvDir).iterator().asScala.toSeq
              .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
          } catch { case _: java.io.IOException => () }
        }
      },
      Some("""SELECT l_returnflag,
             |       SUM(l_quantity) AS sum_qty,
             |       SUM(round(l_extendedprice * 100)
             |           * (100 - round(l_discount * 100))) AS sum_revenue_c4,
             |       AVG(round(l_extendedprice * 100)
             |           * (100 - round(l_discount * 100))) AS avg_revenue_c4,
             |       COUNT(*) AS n_rows
             |FROM lineitem
             |WHERE l_linestatus = 'F'
             |GROUP BY l_returnflag""".stripMargin)),

    // MV navigation THROUGH A JOIN — the star-schema shape the
    // reference's own marts take (fact ⋈ dim_items then aggregate,
    // reference backend_api/app/models.py:36-37): a (l_suppkey)
    // rollup of lineitem registered, then a query that filters the
    // fact on the grouping column, joins supplier on it, and groups
    // by the DIM attribute s_name. The rule must rewrite to
    // Join(rollup, supplier) — the gate REFUSES to pass if the fact
    // scan survives, and REQUIRES the dim scan to remain (its rows
    // are real inputs, not navigable state). Soundness pinned by the
    // base-table hash oracle: each rollup row stands for the fact
    // rows sharing its l_suppkey, the join key IS that key, so
    // re-aggregated pairs fold exactly like the original fact⋈dim
    // rows (l_quantity integral => bit-identical sums).
    QueryDef("p125_mv_join_nav",
      (s, dir) => {
        val basePath = s"$dir/lineitem.parquet"
        val mvDir = java.nio.file.Files.createTempDirectory("graft_mv6")
        val mvPath = mvDir.resolve("jmv.parquet").toString
        graft.plans.MaterializedAggregate.buildAndRegister(s, basePath,
          mvPath, Seq("l_suppkey"), Seq("l_quantity"))
        try {
          val fact = s.read.parquet(basePath)
          val dim = s.read.parquet(s"$dir/supplier.parquet")
          val q = fact.where(col("l_suppkey") <= 50)
            .join(dim, fact("l_suppkey") === dim("s_suppkey"))
            .groupBy(col("s_name"))
            .agg(sum("l_quantity").as("sum_qty"),
              count(lit(1)).as("n_rows"),
              min("l_quantity").as("min_qty"),
              max("l_quantity").as("max_qty"),
              avg("l_quantity").as("avg_qty"))
          val scanned = q.queryExecution.optimizedPlan.collect {
            case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
              r.relation match {
                case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                  fs.location.rootPaths.map(_.toUri.getPath)
                case _ => Seq.empty[String]
              }
          }.flatten
          require(scanned.exists(_.contains("jmv.parquet")),
            s"star-join navigation did not fire; scans: $scanned")
          require(!scanned.exists(_.contains("lineitem.parquet")),
            s"fact table still scanned: $scanned")
          require(scanned.exists(_.contains("supplier.parquet")),
            s"dim side must survive the rewrite: $scanned")
          val rows = q.collect()
          s.createDataFrame(
            s.sparkContext.parallelize(rows.toSeq, 1), q.schema)
        } finally {
          graft.plans.MvCatalog.clear()
          try {
            import scala.jdk.CollectionConverters._
            java.nio.file.Files.walk(mvDir).iterator().asScala.toSeq
              .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
          } catch { case _: java.io.IOException => () }
        }
      },
      Some("""SELECT s_name,
             |       SUM(l_quantity) AS sum_qty,
             |       COUNT(*) AS n_rows,
             |       MIN(l_quantity) AS min_qty,
             |       MAX(l_quantity) AS max_qty,
             |       AVG(l_quantity) AS avg_qty
             |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |WHERE l_suppkey <= 50
             |GROUP BY s_name""".stripMargin)),

    // MV navigation through a SNOWFLAKE chain — the TPC-H shape:
    // lineitem ⋈ supplier (on the rollup's grouping column) ⋈ nation
    // (on supplier's s_nationkey — NO fact column at the outer
    // level, so the inner dim rides the re-applied chain verbatim
    // and no grouping restriction applies to it). Group by the
    // outermost dim attribute n_name. Gate requires the fact scan
    // gone and BOTH dim scans kept; base-table hash oracle.
    QueryDef("p126_mv_snowflake_nav",
      (s, dir) => {
        val basePath = s"$dir/lineitem.parquet"
        val mvDir = java.nio.file.Files.createTempDirectory("graft_mv7")
        val mvPath = mvDir.resolve("smv.parquet").toString
        graft.plans.MaterializedAggregate.buildAndRegister(s, basePath,
          mvPath, Seq("l_suppkey"), Seq("l_quantity"))
        try {
          val fact = s.read.parquet(basePath)
          val supp = s.read.parquet(s"$dir/supplier.parquet")
          val nat = s.read.parquet(s"$dir/nation.parquet")
          val q = fact
            .join(supp, fact("l_suppkey") === supp("s_suppkey"))
            .join(nat, supp("s_nationkey") === nat("n_nationkey"))
            .groupBy(col("n_name"))
            .agg(sum("l_quantity").as("sum_qty"),
              count(lit(1)).as("n_rows"),
              avg("l_quantity").as("avg_qty"))
          val scanned = q.queryExecution.optimizedPlan.collect {
            case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
              r.relation match {
                case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                  fs.location.rootPaths.map(_.toUri.getPath)
                case _ => Seq.empty[String]
              }
          }.flatten
          require(scanned.exists(_.contains("smv.parquet")),
            s"snowflake navigation did not fire; scans: $scanned")
          require(!scanned.exists(_.contains("lineitem.parquet")),
            s"fact table still scanned: $scanned")
          require(scanned.exists(_.contains("supplier.parquet")) &&
            scanned.exists(_.contains("nation.parquet")),
            s"both dim scans must survive the rewrite: $scanned")
          val rows = q.collect()
          s.createDataFrame(
            s.sparkContext.parallelize(rows.toSeq, 1), q.schema)
        } finally {
          graft.plans.MvCatalog.clear()
          try {
            import scala.jdk.CollectionConverters._
            java.nio.file.Files.walk(mvDir).iterator().asScala.toSeq
              .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
          } catch { case _: java.io.IOException => () }
        }
      },
      Some("""SELECT n_name,
             |       SUM(l_quantity) AS sum_qty,
             |       COUNT(*) AS n_rows,
             |       AVG(l_quantity) AS avg_qty
             |FROM lineitem
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |GROUP BY n_name""".stripMargin)),

    // Coarser-TIME-GRAIN navigation — the dashboard shape MV systems
    // exist for: a DAILY (day) rollup registered, the query groups by
    // trunc(day, 'month') and filters a year — both EXPRESSIONS of
    // the grouping column, which re-aggregate exactly because each
    // rollup row holds a single day. The year filter must commute to
    // the rollup (residual remap over an expression, not just a bare
    // column). Gate requires the fact scan gone; base-table hash
    // oracle restates the month/year arithmetic in DuckDB.
    QueryDef("p127_mv_time_grain",
      (s, dir) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft_mv8")
        val basePath = tmp.resolve("dayfact.parquet").toString
        val mvPath = tmp.resolve("tmv.parquet").toString
        s.read.parquet(s"$dir/lineitem.parquet")
          .select(col("l_shipdate").cast("date").as("day"),
            col("l_quantity").as("qty"))
          .write.mode("overwrite").parquet(basePath)
        graft.plans.MaterializedAggregate.buildAndRegister(s, basePath,
          mvPath, Seq("day"), Seq("qty"))
        try {
          val q = s.read.parquet(basePath)
            .where(year(col("day")) === 1996)
            .groupBy(trunc(col("day"), "month").as("month"))
            .agg(sum("qty").as("sum_qty"),
              count(lit(1)).as("n_rows"),
              avg("qty").as("avg_qty"))
          val scanned = q.queryExecution.optimizedPlan.collect {
            case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
              r.relation match {
                case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                  fs.location.rootPaths.map(_.toUri.getPath)
                case _ => Seq.empty[String]
              }
          }.flatten
          require(scanned.exists(_.contains("tmv.parquet")),
            s"time-grain navigation did not fire; scans: $scanned")
          require(!scanned.exists(_.contains("dayfact.parquet")),
            s"fact table still scanned: $scanned")
          val rows = q.collect()
          s.createDataFrame(
            s.sparkContext.parallelize(rows.toSeq, 1), q.schema)
        } finally {
          graft.plans.MvCatalog.clear()
          try {
            import scala.jdk.CollectionConverters._
            java.nio.file.Files.walk(tmp).iterator().asScala.toSeq
              .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
          } catch { case _: java.io.IOException => () }
        }
      },
      Some("""WITH f AS (SELECT CAST(l_shipdate AS DATE) AS day,
             |                  l_quantity AS qty
             |           FROM lineitem)
             |SELECT CAST(date_trunc('month', day) AS DATE) AS month,
             |       SUM(qty) AS sum_qty,
             |       COUNT(*) AS n_rows,
             |       AVG(qty) AS avg_qty
             |FROM f WHERE year(day) = 1996
             |GROUP BY 1""".stripMargin)),

    // Workload-driven rollup ADVISOR — the recommender loop closed
    // end-to-end: three lineitem aggregates go in, the advisor
    // extracts one merged candidate (keys = groupings ∪ filter
    // columns so the filters commute; measures unioned), the
    // compression gate measures base rows / approx-distinct grain
    // (~60k/6 — an easy clear), the recommendation BUILDS and
    // REGISTERS, and the gate then requires the original p116-shape
    // query to navigate to the recommended rollup (fact scan gone).
    // Oracle: p116's base-table SQL verbatim — recommendation must
    // change the plan, never the answer.
    QueryDef("p128_mv_advisor",
      (s, dir) => {
        val mvDir = java.nio.file.Files.createTempDirectory("graft_adv")
        def q1 = s.read.parquet(s"$dir/lineitem.parquet")
          .where(col("l_linestatus") === "F")
          .groupBy(col("l_returnflag"))
          .agg(sum("l_quantity").as("sum_qty"),
            count(lit(1)).as("n_rows"),
            min("l_quantity").as("min_qty"),
            max("l_quantity").as("max_qty"),
            avg("l_quantity").as("avg_qty"))
        val workload = Seq(
          q1,
          s.read.parquet(s"$dir/lineitem.parquet")
            .groupBy(col("l_returnflag"), col("l_linestatus"))
            .agg(sum("l_quantity").as("sum_qty")),
          s.read.parquet(s"$dir/lineitem.parquet")
            .groupBy(col("l_linestatus"))
            .agg(count(lit(1)).as("n")))
        val recs = graft.plans.MvAdvisor.recommend(s, workload)
        require(recs.length == 1, s"expected one merged candidate, got $recs")
        require(recs.head.groupCols.toSet ==
          Set("l_returnflag", "l_linestatus"),
          s"wrong recommended grain: ${recs.head.groupCols}")
        require(recs.head.measureCols.contains("l_quantity"),
          s"missing measure: ${recs.head.measureCols}")
        graft.plans.MvAdvisor.buildRecommended(s, recs, mvDir.toString)
        try {
          val scanned = q1.queryExecution.optimizedPlan.collect {
            case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
              r.relation match {
                case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                  fs.location.rootPaths.map(_.toUri.getPath)
                case _ => Seq.empty[String]
              }
          }.flatten
          require(scanned.exists(_.contains("/mv_")),
            s"recommended rollup not navigated; scans: $scanned")
          require(!scanned.exists(_.contains("lineitem.parquet")),
            s"fact table still scanned: $scanned")
          val rows = q1.collect()
          s.createDataFrame(
            s.sparkContext.parallelize(rows.toSeq, 1), q1.schema)
        } finally {
          graft.plans.MvCatalog.clear()
          try {
            import scala.jdk.CollectionConverters._
            java.nio.file.Files.walk(mvDir).iterator().asScala.toSeq
              .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
          } catch { case _: java.io.IOException => () }
        }
      },
      Some(mvRewriteOracleSql)),

    // Advisor over a STAR workload — the reference's real mart shape
    // recommended end-to-end: the p125 query (fact filtered on
    // l_suppkey, joined to supplier on it, grouped by the dim
    // attribute) goes in; the advisor must extract keys = {fact
    // filter col ∪ fact join key} = {l_suppkey} with measure
    // l_quantity (the dim grouping rides the re-applied join and
    // constrains nothing), clear the compression gate, build, and
    // the SAME star query must then navigate to the recommendation
    // (fact scan gone, supplier scan kept). Oracle: p125's
    // base-table SQL verbatim.
    QueryDef("p129_mv_advisor_star",
      (s, dir) => {
        val mvDir = java.nio.file.Files.createTempDirectory("graft_adv2")
        def q1 = {
          val fact = s.read.parquet(s"$dir/lineitem.parquet")
          val dim = s.read.parquet(s"$dir/supplier.parquet")
          fact.where(col("l_suppkey") <= 50)
            .join(dim, fact("l_suppkey") === dim("s_suppkey"))
            .groupBy(col("s_name"))
            .agg(sum("l_quantity").as("sum_qty"),
              count(lit(1)).as("n_rows"),
              min("l_quantity").as("min_qty"),
              max("l_quantity").as("max_qty"),
              avg("l_quantity").as("avg_qty"))
        }
        val recs = graft.plans.MvAdvisor.recommend(s, Seq(q1))
        require(recs.length == 1, s"expected one star candidate, got $recs")
        require(recs.head.groupCols.toSet == Set("l_suppkey"),
          s"wrong recommended grain: ${recs.head.groupCols}")
        require(recs.head.measureCols.contains("l_quantity"),
          s"missing measure: ${recs.head.measureCols}")
        graft.plans.MvAdvisor.buildRecommended(s, recs, mvDir.toString)
        try {
          val scanned = q1.queryExecution.optimizedPlan.collect {
            case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
              r.relation match {
                case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                  fs.location.rootPaths.map(_.toUri.getPath)
                case _ => Seq.empty[String]
              }
          }.flatten
          require(scanned.exists(_.contains("/mv_")),
            s"recommended rollup not navigated; scans: $scanned")
          require(!scanned.exists(_.contains("lineitem.parquet")),
            s"fact table still scanned: $scanned")
          require(scanned.exists(_.contains("supplier.parquet")),
            s"dim scan must survive: $scanned")
          val rows = q1.collect()
          s.createDataFrame(
            s.sparkContext.parallelize(rows.toSeq, 1), q1.schema)
        } finally {
          graft.plans.MvCatalog.clear()
          try {
            import scala.jdk.CollectionConverters._
            java.nio.file.Files.walk(mvDir).iterator().asScala.toSeq
              .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
          } catch { case _: java.io.IOException => () }
        }
      },
      Some("""SELECT s_name,
             |       SUM(l_quantity) AS sum_qty,
             |       COUNT(*) AS n_rows,
             |       MIN(l_quantity) AS min_qty,
             |       MAX(l_quantity) AS max_qty,
             |       AVG(l_quantity) AS avg_qty
             |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |WHERE l_suppkey <= 50
             |GROUP BY s_name""".stripMargin)),

    // Sketch rollup navigated THROUGH the star chain — p119's
    // register fold composed with p125/p126's join navigation:
    // approximate distinct ORDERS per NATION answered from an
    // (l_suppkey)-grain rollup's HLL registers, folded across the
    // suppkeys of each nation AND across duplicate dim matches (the
    // elementwise max is idempotent, so join multiplicity cannot
    // perturb a register — the property the composition leans on).
    // Digest/zero-count/harmonic/estimate are all hash-pinned by the
    // base-table oracle; fact scan must be gone, both dim scans kept.
    QueryDef("p130_mv_hll_star",
      (s, dir) => {
        import graft.functions.{SketchFunctions => SK, Md5Hash}
        val basePath = s"$dir/lineitem.parquet"
        val mvDir = java.nio.file.Files.createTempDirectory("graft_mv9")
        val mvPath = mvDir.resolve("hmv.parquet").toString
        graft.plans.MaterializedAggregate.buildAndRegister(s, basePath,
          mvPath, Seq("l_suppkey"), Seq("l_quantity"),
          distinctCols = Seq("l_orderkey"), hllP = 4)
        try {
          val fact = s.read.parquet(basePath)
          val supp = s.read.parquet(s"$dir/supplier.parquet")
          val nat = s.read.parquet(s"$dir/nation.parquet")
          val q = fact
            .join(supp, fact("l_suppkey") === supp("s_suppkey"))
            .join(nat, supp("s_nationkey") === nat("n_nationkey"))
            .groupBy(col("n_name"))
            .agg(sum("l_quantity").as("sum_qty"),
              SK.hyperLogLog(Md5Hash.h60String(col("l_orderkey")), 4)
                .as("__regs"))
            .select(col("n_name"), col("sum_qty"),
              md5(array_join(transform(col("__regs"), _.cast("string")), ","))
                .as("register_digest"),
              SK.hllZeroRegisters(col("__regs")).as("n_zero_registers"),
              SK.hllHarmonicScaled(col("__regs")).as("harmonic_scaled"),
              SK.hllEstimate(col("__regs"), 4).as("est_distinct"))
          val scanned = q.queryExecution.optimizedPlan.collect {
            case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
              r.relation match {
                case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                  fs.location.rootPaths.map(_.toUri.getPath)
                case _ => Seq.empty[String]
              }
          }.flatten
          require(scanned.exists(_.contains("hmv.parquet")),
            s"sketch star navigation did not fire; scans: $scanned")
          require(!scanned.exists(_.contains("lineitem.parquet")),
            s"fact table still scanned: $scanned")
          require(scanned.exists(_.contains("supplier.parquet")) &&
            scanned.exists(_.contains("nation.parquet")),
            s"dim scans must survive: $scanned")
          val rows = q.collect()
          s.createDataFrame(
            s.sparkContext.parallelize(rows.toSeq, 1), q.schema)
        } finally {
          graft.plans.MvCatalog.clear()
          try {
            import scala.jdk.CollectionConverters._
            java.nio.file.Files.walk(mvDir).iterator().asScala.toSeq
              .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
          } catch { case _: java.io.IOException => () }
        }
      },
      Some("""WITH f AS (SELECT n.n_name AS g, l.l_orderkey, l.l_quantity
             |           FROM lineitem l
             |           JOIN supplier s ON l.l_suppkey = s.s_suppkey
             |           JOIN nation n ON s.s_nationkey = n.n_nationkey),
             |h AS (SELECT DISTINCT g,
             |        ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT AS h
             |      FROM f),
             |rho AS (SELECT g, h % 16 AS bucket,
             |               CASE WHEN h // 16 = 0 THEN 57
             |                    ELSE 56 - length(bin(h // 16)) + 1 END AS rho
             |        FROM h),
             |base AS (SELECT DISTINCT g FROM f),
             |regs AS (SELECT base.g, b.bucket, COALESCE(mx.mr, 0) AS reg
             |         FROM base
             |         CROSS JOIN (SELECT unnest(range(16)) AS bucket) b
             |         LEFT JOIN (SELECT g, bucket, max(rho) AS mr
             |                    FROM rho GROUP BY g, bucket) mx
             |           ON mx.g = base.g AND mx.bucket = b.bucket),
             |agg AS (SELECT g,
             |          md5(string_agg(CAST(reg AS VARCHAR), ',' ORDER BY bucket))
             |            AS register_digest,
             |          CAST(sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS BIGINT)
             |            AS n_zero_registers,
             |          CAST(sum(1::HUGEINT << (61 - CAST(reg AS INT))) AS DOUBLE)
             |            AS harmonic_scaled
             |        FROM regs GROUP BY g),
             |q AS (SELECT g, SUM(l_quantity) AS sum_qty FROM f GROUP BY g)
             |SELECT q.g AS n_name, q.sum_qty, a.register_digest,
             |       a.n_zero_registers, a.harmonic_scaled,
             |       (0.7213 / (1 + 1.079 / 16.0)) * 256.0
             |         * 2305843009213693952.0 / a.harmonic_scaled
             |         AS est_distinct
             |FROM q JOIN agg a ON a.g = q.g""".stripMargin)),

    // FULL-surface advisor loop (round-13 verdict ask #2): a mixed
    // workload exercising every family the advisor can extract — the
    // TPC-H Q1 revenue shape (EXPRESSION measure), an
    // approx-distinct-orders sketch over the engine's canonical hash
    // (HLL register column), and a second grain with a plain-column
    // measure — all three repeating the same `l_linestatus = 'F'`
    // conjunct, which must become the recommendation's baseFilter
    // (partial rollup) rather than a grouping key. ONE
    // `MvAdvisor.advise` call recommends, builds and registers the
    // merged candidate; the gate then re-issues all three queries and
    // refuses to pass unless each navigates (fact scan GONE, every
    // time). The result joins the three navigated answers so the
    // DuckDB oracle hash-pins expression-measure arithmetic, register
    // digests/estimates and plain sums through the one advised rollup.
    QueryDef("p131_mv_advisor_full",
      (s, dir) => {
        import graft.functions.{SketchFunctions => SK, Md5Hash}
        val basePath = s"$dir/lineitem.parquet"
        val mvDir = java.nio.file.Files.createTempDirectory("graft_adv3")
        val revenue = "round(l_extendedprice * 100) * (100 - round(l_discount * 100))"
        def q1 = s.read.parquet(basePath)
          .where(col("l_linestatus") === "F")
          .groupBy(col("l_returnflag"))
          .agg(sum(expr(revenue)).as("sum_revenue_c4"),
            count(lit(1)).as("n_rows"))
        def q2 = s.read.parquet(basePath)
          .where(col("l_linestatus") === "F")
          .groupBy(col("l_returnflag"))
          .agg(SK.hyperLogLog(Md5Hash.h60String(col("l_orderkey")), 4)
            .as("__regs"))
          .select(col("l_returnflag"),
            md5(array_join(transform(col("__regs"), _.cast("string")), ","))
              .as("register_digest"),
            SK.hllZeroRegisters(col("__regs")).as("n_zero_registers"),
            SK.hllHarmonicScaled(col("__regs")).as("harmonic_scaled"),
            SK.hllEstimate(col("__regs"), 4).as("est_distinct"))
        def q3 = s.read.parquet(basePath)
          .where(col("l_linestatus") === "F")
          .groupBy(col("l_returnflag"), col("l_suppkey"))
          .agg(sum("l_quantity").as("sum_qty"))
        val defs = graft.plans.MvAdvisor.advise(
          s, Seq(q1, q2, q3), mvDir.toString)
        require(defs.length == 1, s"expected one merged advised def, got $defs")
        val d = defs.head
        require(d.groupCols.toSet == Set("l_returnflag", "l_suppkey"),
          s"wrong advised grain: ${d.groupCols}")
        require(d.baseFilter.contains("(l_linestatus = 'F')") ||
          d.baseFilter.exists(_.contains("l_linestatus")),
          s"shared conjunct did not become the baseFilter: ${d.baseFilter}")
        require(d.exprMeasures.size == 1,
          s"revenue expression measure missing: ${d.exprMeasures}")
        require(d.distinctCols == Seq("l_orderkey") && d.hllP == 4,
          s"sketch family missing: ${d.distinctCols} p=${d.hllP}")
        try {
          def scans(df: org.apache.spark.sql.DataFrame) =
            df.queryExecution.optimizedPlan.collect {
              case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
                r.relation match {
                  case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                    fs.location.rootPaths.map(_.toUri.getPath)
                  case _ => Seq.empty[String]
                }
            }.flatten
          Seq(("q1", q1), ("q2", q2), ("q3", q3)).foreach { case (n, q) =>
            val sc = scans(q)
            require(sc.exists(_.contains("/mv_")),
              s"advised rollup not navigated by $n; scans: $sc")
            require(!sc.exists(_.contains("lineitem.parquet")),
              s"fact table still scanned by $n: $sc")
          }
          val joined = q3
            .join(q1, Seq("l_returnflag"))
            .join(q2, Seq("l_returnflag"))
          val rows = joined.collect()
          s.createDataFrame(
            s.sparkContext.parallelize(rows.toSeq, 1), joined.schema)
        } finally {
          graft.plans.MvCatalog.clear()
          try {
            import scala.jdk.CollectionConverters._
            java.nio.file.Files.walk(mvDir).iterator().asScala.toSeq
              .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
          } catch { case _: java.io.IOException => () }
        }
      },
      Some("""WITH f AS (SELECT l_returnflag AS g, l_orderkey, l_suppkey,
             |                 l_quantity, l_extendedprice, l_discount
             |           FROM lineitem WHERE l_linestatus = 'F'),
             |q1 AS (SELECT g,
             |         SUM(round(l_extendedprice * 100)
             |             * (100 - round(l_discount * 100))) AS sum_revenue_c4,
             |         COUNT(*) AS n_rows
             |       FROM f GROUP BY g),
             |q3 AS (SELECT g, l_suppkey, SUM(l_quantity) AS sum_qty
             |       FROM f GROUP BY g, l_suppkey),
             |h AS (SELECT DISTINCT g,
             |        ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT AS h
             |      FROM f),
             |rho AS (SELECT g, h % 16 AS bucket,
             |               CASE WHEN h // 16 = 0 THEN 57
             |                    ELSE 56 - length(bin(h // 16)) + 1 END AS rho
             |        FROM h),
             |base AS (SELECT DISTINCT g FROM f),
             |regs AS (SELECT base.g, b.bucket, COALESCE(mx.mr, 0) AS reg
             |         FROM base
             |         CROSS JOIN (SELECT unnest(range(16)) AS bucket) b
             |         LEFT JOIN (SELECT g, bucket, max(rho) AS mr
             |                    FROM rho GROUP BY g, bucket) mx
             |           ON mx.g = base.g AND mx.bucket = b.bucket),
             |agg AS (SELECT g,
             |          md5(string_agg(CAST(reg AS VARCHAR), ',' ORDER BY bucket))
             |            AS register_digest,
             |          CAST(sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS BIGINT)
             |            AS n_zero_registers,
             |          CAST(sum(1::HUGEINT << (61 - CAST(reg AS INT))) AS DOUBLE)
             |            AS harmonic_scaled
             |        FROM regs GROUP BY g)
             |SELECT q3.g AS l_returnflag, q3.l_suppkey, q3.sum_qty,
             |       q1.sum_revenue_c4, q1.n_rows,
             |       a.register_digest, a.n_zero_registers, a.harmonic_scaled,
             |       (0.7213 / (1 + 1.079 / 16.0)) * 256.0
             |         * 2305843009213693952.0 / a.harmonic_scaled
             |         AS est_distinct
             |FROM q3 JOIN q1 ON q1.g = q3.g
             |JOIN agg a ON a.g = q3.g""".stripMargin)),

    // Graph-index ANN (the HNSW shape, round-13 verdict ask #8 /
    // round-12 #6): the navigable-small-world index materialized
    // ([[GraphAnn.writeIndex]] — LSH-bucketed kNN edges with the
    // M_max prune + md5-strided hub layer) and beam-searched for a
    // query batch. Everything is deterministic — planes, hub stride,
    // ascending-id tie-breaks — so the oracle recomputes the WHOLE
    // construction and all three beam rounds in SQL: buckets, top-m
    // per node, symmetrize + 2m prune, hub argmax assignment (ties
    // to the larger hub id, the IVF rule), up/down hub edges, entry
    // beam, three expand-score-prune rounds with visited-set
    // anti-joins, final top-10 per query. Recall quality is gated by
    // GraphAnnSpec (>= 0.9 at these defaults on the clustered
    // reference corpus); THIS gate hash-pins the construction and
    // search semantics end-to-end.
    QueryDef("p132_hnsw_topk",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val hubs = Similarity.sampleCentroids(emb, nlist = 16)
        // force = construction is THIS gate's contract; the built
        // index is the shared one p139/p148/st40 then search without
        // rebuilding (ensureSharedNswIndex scaladoc).
        val idx = ensureSharedNswIndex(s, dir, hubs, force = true)
        val queries = emb.where(col("vec_id") % 31 === 0)
          .select(col("vec_id").as("query_id"),
            col("embedding").as("query_vec"))
        GraphAnn.searchAll(GraphAnn.readEdges(s, idx), hubs,
          queries, k = 10)
      },
      Some(nswTopkOracleSql)),

    // FILTERED graph ANN (round 14): vector search under a metadata
    // predicate — the production shape ("nearest among source=web",
    // "among the last 30 days") that IVF/graph indexes must answer
    // without a second index per predicate. Standard filtered-HNSW
    // semantics: the beam ROUTES through every node (restricting the
    // walk to the filtered subgraph disconnects it at selective
    // predicates), only ids passing the predicate RANK, applied to
    // the accumulated visited set BEFORE the final top-k so matches
    // are never truncated by non-matching neighbors. The allowed set
    // may be corpus-scale — the small visited accumulation is the
    // broadcast side and `allowed` streams in place. The oracle is
    // the full p132 construction + beam with the rank-time predicate
    // in SQL.
    QueryDef("p139_filtered_topk",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val hubs = Similarity.sampleCentroids(emb, nlist = 16)
        // search is the contract — reuse the shared index if a prior
        // gate in this session already built it (deterministic build,
        // so provenance cannot change the hash)
        val idx = ensureSharedNswIndex(s, dir, hubs)
        val queries = emb.where(col("vec_id") % 31 === 0)
          .select(col("vec_id").as("query_id"),
            col("embedding").as("query_vec"))
        GraphAnn.searchAll(GraphAnn.readEdges(s, idx), hubs,
          queries, k = 10,
          allowed = Some(emb.where(col("vec_id") % 3 === 0)
            .select(col("vec_id"))))
      },
      Some(nswFilteredOracleSql)),

    // ACORN filtered graph ANN (round 15, verdict ask #1): the
    // predicate-AWARE walk for selective filters, where p139's
    // route-all/rank-allowed semantics waste beam slots on
    // non-matching nodes (recorded recall 0.26-0.41 at selectivity
    // 1/8). Traversal stays on the filtered subgraph; connectivity
    // is restored by ACORN-1's two-hop rule (a failing one-hop
    // neighbor contributes its passing neighbors) and the entry beam
    // is doubled with the top PASSING hubs (predicate-subgraph
    // entry) so predicate-correlated filters — whole semantic
    // regions allowed or not — stay navigable. Measured on the
    // clustered reference corpus (BASELINE.md round-15 sweep):
    // recall@10 at selectivity 1/8 is 0.95 at beam 32 and 0.90 at
    // beam 16/rounds 4, vs route-all's 0.41/0.26 — and recall is
    // nearly flat in selectivity where route-all decayed with 1/m.
    // The oracle replays the construction,
    // both entry beams, and all three two-hop rounds in SQL at
    // selectivity 1/8.
    QueryDef("p148_filtered_topk_acorn",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val hubs = Similarity.sampleCentroids(emb, nlist = 16)
        // round-16 (verdict ask #1a/#3-r15): the ACORN SEARCH is this
        // gate's contract; searching a prebuilt shared index stops the
        // heaviest bench gate from being a measurement of index
        // construction (11.66 s → the search's own ~2 s)
        val idx = ensureSharedNswIndex(s, dir, hubs)
        val queries = emb.where(col("vec_id") % 31 === 0)
          .select(col("vec_id").as("query_id"),
            col("embedding").as("query_vec"))
        GraphAnn.searchAllAcorn(GraphAnn.readEdges(s, idx), hubs,
          queries,
          allowed = emb.where(col("vec_id") % 8 === 0).select(col("vec_id")),
          k = 10)
      },
      Some(nswAcornOracleSql)),

    // Graph-index LIFECYCLE (the p19/p91/p92 discipline for the NSW
    // family): base batch from the EVEN half, the odd half LINKED IN
    // as a maintenance batch (edges over the full corpus restricted
    // to those touching the batch — new nodes get adjacency, old
    // nodes get reverse links), a tombstone eviction, then compaction
    // folding both batches, applying the tombstones physically and
    // re-capping per-(src, kind) degree. The searched answers over
    // the compacted index hash-match an oracle that recomputes BOTH
    // constructions, the union, the eviction and the re-cap in SQL —
    // evicted ids must neither rank nor route.
    QueryDef("p135_nsw_lifecycle",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val hubs = Similarity.sampleCentroids(emb, nlist = 16)
        val even = emb.where(col("vec_id") % 2 === 0)
        val odd = emb.where(col("vec_id") % 2 =!= 0)
        // splitBucket = None pins the oracle-replayed unsplit
        // construction (the production default is the sub-bucketed
        // build; this gate's DuckDB oracle replays the coarse-bucket
        // pair step verbatim)
        GraphAnn.writeIndex(even, hubs, nswLifePath, dim = Some(EmbeddingDim),
          splitBucket = None)
        GraphAnn.appendToIndex(odd, emb, hubs, nswLifePath,
          batchId = "b1", dim = Some(EmbeddingDim), splitBucket = None)
        GraphAnn.tombstoneIndex(
          emb.where(col("vec_id") % 50 === 7).select("vec_id"),
          nswLifePath, batchId = "t1")
        val folded = GraphAnn.compactIndex(s, nswLifePath)
        require(folded == 2, s"expected 2 batches folded, got $folded")
        val root = new org.apache.hadoop.fs.Path(nswLifePath)
        val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
        val dirs = fs.listStatus(root).toSeq
          .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
        require(dirs.size == 1,
          s"compaction left ${dirs.map(_.getPath.getName)}")
        require(!fs.exists(new org.apache.hadoop.fs.Path(
          nswLifePath + "_tombstones")),
          "tombstones not cleared after physical application")
        val queries = emb.where(col("vec_id") % 31 === 0)
          .select(col("vec_id").as("query_id"),
            col("embedding").as("query_vec"))
        GraphAnn.searchAll(GraphAnn.readEdges(s, nswLifePath), hubs,
          queries, k = 10)
      },
      Some(nswLifecycleOracleSql)),

    // HAVING navigation (round-13 verdict ask #7, the navigable
    // half): a Filter ABOVE the Aggregate — the SQL HAVING shape —
    // must not block navigation. The rule rewrites the Aggregate
    // subtree and re-emits the ORIGINAL output exprIds, so the parent
    // Filter resolves over the rewritten node untouched; this gate
    // pins that contract (fact scan gone WITH the HAVING in place,
    // answers hash-matched under a partial HAVING that drops real
    // groups). The other half of ask #7 — GROUP BY ROLLUP's Expand
    // shape — NAVIGATES as of round 14 by replaying the Expand over
    // the rollup (p136 gates it; MvRewriteSpec pins the mechanism
    // and the residual refusals).
    QueryDef("p133_mv_having_rollup",
      (s, dir) => {
        val basePath = s"$dir/lineitem.parquet"
        val mvDir = java.nio.file.Files.createTempDirectory("graft_mv11")
        val mvPath = mvDir.resolve("hvmv.parquet").toString
        graft.plans.MaterializedAggregate.buildAndRegister(s, basePath,
          mvPath, Seq("l_returnflag", "l_linestatus"), Seq("l_quantity"))
        try {
          val q = s.read.parquet(basePath)
            .groupBy(col("l_returnflag"), col("l_linestatus"))
            .agg(sum("l_quantity").as("sum_qty"),
              count(lit(1)).as("n_rows"),
              avg("l_quantity").as("avg_qty"))
            // HAVING on an aggregate: at sf0.01 this drops 3 of the 6
            // groups (sums are integral-valued doubles — exact — so
            // the membership is stable and the oracle can SEE a
            // rewrite that mishandles the Filter)
            .where(col("sum_qty") > 254000)
          val scanned = q.queryExecution.optimizedPlan.collect {
            case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
              r.relation match {
                case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                  fs.location.rootPaths.map(_.toUri.getPath)
                case _ => Seq.empty[String]
              }
          }.flatten
          require(scanned.exists(_.contains("hvmv.parquet")),
            s"HAVING query did not navigate; scans: $scanned")
          require(!scanned.exists(_.contains("lineitem.parquet")),
            s"fact table still scanned under HAVING: $scanned")
          val rows = q.collect()
          s.createDataFrame(
            s.sparkContext.parallelize(rows.toSeq, 1), q.schema)
        } finally {
          graft.plans.MvCatalog.clear()
          try {
            import scala.jdk.CollectionConverters._
            java.nio.file.Files.walk(mvDir).iterator().asScala.toSeq
              .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
          } catch { case _: java.io.IOException => () }
        }
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |       SUM(l_quantity) AS sum_qty,
             |       COUNT(*) AS n_rows,
             |       AVG(l_quantity) AS avg_qty
             |FROM lineitem
             |GROUP BY l_returnflag, l_linestatus
             |HAVING SUM(l_quantity) > 254000""".stripMargin)),

    // GROUP BY ROLLUP navigation (round 14 — upgrades round-13's
    // decided refusal): grouping-sets aggregates plan through Expand
    // (each row replicated per grouping set, retired keys NULLed,
    // spark_grouping_id a per-projection literal), and the rule now
    // REPLAYS that Expand over the registered rollup — literal and
    // grouping slots keep their output attrs (grouping references
    // substituted for rollup columns), measure passthroughs become
    // appended partial columns folded by the derived aggregates.
    // Super-rows stay super (gid rides), real NULL groups stay data
    // NULLs, and the |fact| × sets replication becomes |groups| ×
    // sets. The gate pins: fact scan GONE, the replayed Expand
    // PRESENT in the optimized plan, and every grouping level's
    // sum/count/min/max/avg hash-matched against DuckDB's own
    // GROUP BY ROLLUP.
    QueryDef("p136_mv_rollup_nav",
      (s, dir) => {
        val basePath = s"$dir/lineitem.parquet"
        val mvDir = java.nio.file.Files.createTempDirectory("graft_mv12")
        val mvPath = mvDir.resolve("gsmv.parquet").toString
        graft.plans.MaterializedAggregate.buildAndRegister(s, basePath,
          mvPath, Seq("l_returnflag", "l_linestatus"), Seq("l_quantity"))
        try {
          val q = s.read.parquet(basePath)
            .rollup(col("l_returnflag"), col("l_linestatus"))
            .agg(grouping_id().cast("long").as("grouping_level"),
              sum("l_quantity").as("sum_qty"),
              count(lit(1)).as("n_rows"),
              min("l_quantity").as("min_qty"),
              max("l_quantity").as("max_qty"),
              avg("l_quantity").as("avg_qty"))
          val opt = q.queryExecution.optimizedPlan
          val scanned = opt.collect {
            case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
              r.relation match {
                case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                  fs.location.rootPaths.map(_.toUri.getPath)
                case _ => Seq.empty[String]
              }
          }.flatten
          require(scanned.exists(_.contains("gsmv.parquet")),
            s"ROLLUP query did not navigate; scans: $scanned")
          require(!scanned.exists(_.contains("lineitem.parquet")),
            s"fact table still scanned under ROLLUP: $scanned")
          require(opt.collectFirst {
            case e: org.apache.spark.sql.catalyst.plans.logical.Expand => e
          }.nonEmpty, "replayed Expand missing from the navigated plan")
          val rows = q.collect()
          s.createDataFrame(
            s.sparkContext.parallelize(rows.toSeq, 1), q.schema)
        } finally {
          graft.plans.MvCatalog.clear()
          try {
            import scala.jdk.CollectionConverters._
            java.nio.file.Files.walk(mvDir).iterator().asScala.toSeq
              .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
          } catch { case _: java.io.IOException => () }
        }
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT)
             |         AS grouping_level,
             |       SUM(l_quantity) AS sum_qty,
             |       COUNT(*) AS n_rows,
             |       MIN(l_quantity) AS min_qty,
             |       MAX(l_quantity) AS max_qty,
             |       AVG(l_quantity) AS avg_qty
             |FROM lineitem
             |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin)),

    // ROLLUP × star join (round 14): the g08 mart shape — fact ⋈ dim
    // then GROUP BY ROLLUP over the DIM attribute — navigates by
    // replaying the Expand ABOVE the re-applied join:
    // Aggregate(Expand(Join(rollup, dim))). Dim references in the
    // grouping slots ride verbatim, the fact join key must be a
    // rollup grouping column, and the measure partials pass through
    // the join to the appended Expand slots. Gate pins: fact scan
    // gone, dim scan kept, Expand present, DuckDB ROLLUP hash over
    // the join.
    QueryDef("p138_mv_rollup_star",
      (s, dir) => {
        val basePath = s"$dir/lineitem.parquet"
        val mvDir = java.nio.file.Files.createTempDirectory("graft_mv13")
        val mvPath = mvDir.resolve("rsmv.parquet").toString
        graft.plans.MaterializedAggregate.buildAndRegister(s, basePath,
          mvPath, Seq("l_suppkey"), Seq("l_quantity"))
        try {
          val fact = s.read.parquet(basePath)
          val dim = s.read.parquet(s"$dir/supplier.parquet")
          val q = fact.where(col("l_suppkey") <= 50)
            .join(dim, fact("l_suppkey") === dim("s_suppkey"))
            .rollup(col("s_name"))
            .agg(grouping_id().cast("long").as("grouping_level"),
              sum("l_quantity").as("sum_qty"),
              count(lit(1)).as("n_rows"),
              min("l_quantity").as("min_qty"))
          val opt = q.queryExecution.optimizedPlan
          val scanned = opt.collect {
            case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
              r.relation match {
                case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                  fs.location.rootPaths.map(_.toUri.getPath)
                case _ => Seq.empty[String]
              }
          }.flatten
          require(scanned.exists(_.contains("rsmv.parquet")),
            s"star ROLLUP did not navigate; scans: $scanned")
          require(!scanned.exists(_.contains("lineitem.parquet")),
            s"fact table still scanned: $scanned")
          require(scanned.exists(_.contains("supplier.parquet")),
            s"dim scan must survive: $scanned")
          require(opt.collectFirst {
            case e: org.apache.spark.sql.catalyst.plans.logical.Expand => e
          }.nonEmpty, "replayed Expand missing from the navigated plan")
          val rows = q.collect()
          s.createDataFrame(
            s.sparkContext.parallelize(rows.toSeq, 1), q.schema)
        } finally {
          graft.plans.MvCatalog.clear()
          try {
            import scala.jdk.CollectionConverters._
            java.nio.file.Files.walk(mvDir).iterator().asScala.toSeq
              .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
          } catch { case _: java.io.IOException => () }
        }
      },
      Some("""SELECT s_name,
             |       CAST(GROUPING(s_name) AS BIGINT) AS grouping_level,
             |       SUM(l_quantity) AS sum_qty,
             |       COUNT(*) AS n_rows,
             |       MIN(l_quantity) AS min_qty
             |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |WHERE l_suppkey <= 50
             |GROUP BY ROLLUP (s_name)""".stripMargin)),

    // Time-series gap-fill with forward fill (round 14) — the
    // warehouse gapfill/locf operator: a sparse per-key daily price
    // series resampled onto its dense [min, max] daily grid, missing
    // days carrying the last observation forward. ONE data shuffle:
    // observed rows and grid rows interleave through a single
    // per-key window (observed sorts first at equal dates), so locf
    // rides the sort the window needs anyway — no (key, date)
    // equi-join of two corpus-scale sides. Oracle: generate_series
    // grid + LEFT JOIN + last_value IGNORE NULLS in DuckDB (the two
    // formulations agree exactly on 1-row-per-(key, date) input).
    QueryDef("p142_gapfill_locf",
      (s, dir) => {
        val sparse = s.read.parquet(s"$dir/lineitem.parquet")
          .where(col("l_partkey") <= 20)
          .select(col("l_partkey").as("item_id"),
            to_date(col("l_shipdate")).as("snapshot_date"),
            col("l_extendedprice"))
          .groupBy(col("item_id"), col("snapshot_date"))
          .agg(avg("l_extendedprice").as("price"))
        graft.operators.Resample.gapFillDaily(
          sparse, Seq("item_id"), "snapshot_date", Seq("price"))
      },
      Some(gapfillLocfOracleSql)),

    // Backward-fill mirror of p142 (pandas bfill): each grid day
    // takes the NEXT observation at-or-after it — the fill direction
    // feature-engineering uses for "known by" semantics. Same
    // one-shuffle interleave, reversed; oracle = first_value IGNORE
    // NULLS over the following frame on the LEFT-JOIN grid.
    QueryDef("p144_gapfill_bfill",
      (s, dir) => {
        val sparse = s.read.parquet(s"$dir/lineitem.parquet")
          .where(col("l_partkey") <= 20)
          .select(col("l_partkey").as("item_id"),
            to_date(col("l_shipdate")).as("snapshot_date"),
            col("l_extendedprice"))
          .groupBy(col("item_id"), col("snapshot_date"))
          .agg(avg("l_extendedprice").as("price"))
        graft.operators.Resample.gapFillDailyBackward(
          sparse, Seq("item_id"), "snapshot_date", Seq("price"))
      },
      Some(gapfillBfillOracleSql)),

    // Linear-interpolation sibling of p142 (pandas interpolate /
    // timescale interpolate): gap days take prev + (next − prev) ×
    // elapsed/gap; the tail after the last observation holds (locf).
    // Same one-shuffle interleave; the oracle states the identical
    // arithmetic over the LEFT-JOIN grid formulation, exact because
    // an observed date's elapsed is 0 and double division of integer
    // day counts is deterministic in both engines.
    QueryDef("p143_gapfill_interp",
      (s, dir) => {
        val sparse = s.read.parquet(s"$dir/lineitem.parquet")
          .where(col("l_partkey") <= 20)
          .select(col("l_partkey").as("item_id"),
            to_date(col("l_shipdate")).as("snapshot_date"),
            col("l_extendedprice"))
          .groupBy(col("item_id"), col("snapshot_date"))
          .agg(avg("l_extendedprice").as("price"))
        graft.operators.Resample.gapFillInterpolate(
          sparse, Seq("item_id"), "snapshot_date", Seq("price"))
      },
      Some(gapfillInterpOracleSql)),

    // Grain-parameterized gap-fill (round 15, verdict ask #2): the
    // TimescaleDB `time_bucket_gapfill` surface at HOUR grain — the
    // reference's own price-history mart is hourly
    // (`backend_api/app/models.py:50`) and the dashboard assumes 48
    // dense bars (`main.py:45-49`), so the daily-only trio left the
    // reference's actual cadence uncovered. One gate pins all three
    // fill modes on the same hourly grid (sparse per-user hourly
    // event values over `events`): locf / bfill / interp as three
    // value columns joined on the identical (user, hour) grid. The
    // interp elapsed/gap ratio is measured in SECONDS
    // (unix_timestamp) at timestamp grains — linear in real time, so
    // the DuckDB restatement via date_diff('second', …) is exact.
    // snapshot_hour emits as epoch seconds (the g02 canonicalization
    // — Spark's tz-aware instant vs DuckDB's naive TIMESTAMP).
    QueryDef("p145_gapfill_hourly",
      (s, dir) => {
        import graft.operators.Resample
        val sparse = s.read.parquet(s"$dir/events.parquet")
          .where(col("user_id") <= 50)
          .select(col("user_id"),
            Resample.timeBucket("hour", col("ts")).as("h"),
            col("value"))
          .groupBy(col("user_id"), col("h"))
          .agg(avg("value").as("v"))
        def one(mode: String, out: String) =
          Resample.gapFill(sparse, Seq("user_id"), "h", Seq("v"),
            mode, "hour").withColumnRenamed("v", out)
        one("locf", "v_locf")
          .join(one("bfill", "v_bfill"), Seq("user_id", "h"))
          .join(one("interp", "v_interp"), Seq("user_id", "h"))
          .select(col("user_id"),
            unix_timestamp(col("h")).as("snapshot_hour"),
            col("v_locf"), col("v_bfill"), col("v_interp"))
      },
      Some("""WITH s AS (SELECT user_id, date_trunc('hour', ts) AS h,
             |                  AVG(value) AS v
             |           FROM events WHERE user_id <= 50
             |           GROUP BY 1, 2),
             |span AS (SELECT user_id, min(h) AS lo, max(h) AS hi
             |         FROM s GROUP BY 1),
             |grid AS (SELECT user_id,
             |                unnest(generate_series(lo, hi,
             |                  INTERVAL 1 HOUR)) AS h
             |         FROM span),
             |j AS (SELECT g.user_id, g.h, s.v
             |      FROM grid g LEFT JOIN s
             |        ON s.user_id = g.user_id AND s.h = g.h),
             |a AS (SELECT user_id, h, v,
             |        last_value(v IGNORE NULLS) OVER (
             |          PARTITION BY user_id ORDER BY h
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |          AS prev_v,
             |        last_value(CASE WHEN v IS NOT NULL THEN h END
             |          IGNORE NULLS) OVER (
             |          PARTITION BY user_id ORDER BY h
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |          AS prev_d,
             |        first_value(v IGNORE NULLS) OVER (
             |          PARTITION BY user_id ORDER BY h
             |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
             |          AS next_v,
             |        first_value(CASE WHEN v IS NOT NULL THEN h END
             |          IGNORE NULLS) OVER (
             |          PARTITION BY user_id ORDER BY h
             |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
             |          AS next_d
             |      FROM j)
             |SELECT user_id, CAST(epoch(h) AS BIGINT) AS snapshot_hour,
             |       prev_v AS v_locf,
             |       coalesce(next_v, prev_v) AS v_bfill,
             |       CASE WHEN next_d IS NULL OR next_d = prev_d THEN prev_v
             |            ELSE prev_v + (next_v - prev_v) *
             |                 (CAST(date_diff('second', prev_d, h) AS DOUBLE) /
             |                  CAST(date_diff('second', prev_d, next_d) AS DOUBLE))
             |       END AS v_interp
             |FROM a""".stripMargin)),

    // Month-grain gap-fill (round 15): the calendar-interval grid
    // path — months are UNEQUAL steps, so the grid comes from
    // sequence(lo, hi, interval 1 month) rather than arithmetic, and
    // interpolation stays linear in REAL days (datediff), not in
    // month ordinals (a Jan→Apr slope hits Feb 1 at 31/90, not 1/3).
    // Fixture: per-(supplier, month) average price, locf + interp on
    // the same monthly grid. Oracle: DuckDB generate_series with
    // INTERVAL 1 MONTH over date_trunc'd months.
    QueryDef("p150_gapfill_monthly",
      (s, dir) => {
        import graft.operators.Resample
        val sparse = s.read.parquet(s"$dir/lineitem.parquet")
          .where(col("l_suppkey") <= 40)
          // sparsify: keep ~1/7 of the (supp, month) observations so
          // real month gaps exist to fill
          .where(dayofmonth(to_date(col("l_shipdate"))) === 3)
          .select(col("l_suppkey").as("supp_id"),
            trunc(to_date(col("l_shipdate")), "month").as("m"),
            col("l_extendedprice"))
          .groupBy(col("supp_id"), col("m"))
          .agg(avg("l_extendedprice").as("v"))
        Resample.gapFill(sparse, Seq("supp_id"), "m", Seq("v"),
          mode = "locf", grain = "month")
          .withColumnRenamed("v", "v_locf")
          .join(Resample.gapFill(sparse, Seq("supp_id"), "m", Seq("v"),
            mode = "interp", grain = "month")
            .withColumnRenamed("v", "v_interp"),
            Seq("supp_id", "m"))
          .select(col("supp_id"), col("m").as("month_start"),
            col("v_locf"), col("v_interp"))
      },
      Some(gapfillMonthlyOracleSql)),

    // Explicit GROUPING SETS navigation (round 14): the third
    // grouping-sets spelling — arbitrary set lists, not the
    // rollup/cube prefixes — through the SQL surface. The set list
    // here mixes widths AND repeats a column across sets, so a slot
    // can be never-NULLed yet still be a grouping slot (the
    // classifier's uniform-passthrough vs grouping distinction is
    // what this gate pins). Same Expand replay, same oracle family.
    QueryDef("p141_mv_grouping_sets",
      (s, dir) => {
        val basePath = s"$dir/lineitem.parquet"
        val mvDir = java.nio.file.Files.createTempDirectory("graft_mv14")
        val mvPath = mvDir.resolve("gsetmv.parquet").toString
        graft.plans.MaterializedAggregate.buildAndRegister(s, basePath,
          mvPath, Seq("l_returnflag", "l_linestatus"), Seq("l_quantity"))
        try {
          s.read.parquet(basePath).createOrReplaceTempView("li_p141")
          val q = s.sql(
            """SELECT l_returnflag, l_linestatus,
              |       CAST(grouping_id() AS BIGINT) AS grouping_level,
              |       SUM(l_quantity) AS sum_qty,
              |       COUNT(*) AS n_rows
              |FROM li_p141
              |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
              |                        (l_returnflag), (l_linestatus))
              |""".stripMargin)
          val opt = q.queryExecution.optimizedPlan
          val scanned = opt.collect {
            case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
              r.relation match {
                case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                  fs.location.rootPaths.map(_.toUri.getPath)
                case _ => Seq.empty[String]
              }
          }.flatten
          require(scanned.exists(_.contains("gsetmv.parquet")),
            s"GROUPING SETS did not navigate; scans: $scanned")
          require(!scanned.exists(_.contains("lineitem.parquet")),
            s"fact table still scanned under GROUPING SETS: $scanned")
          val rows = q.collect()
          s.createDataFrame(
            s.sparkContext.parallelize(rows.toSeq, 1), q.schema)
        } finally {
          graft.plans.MvCatalog.clear()
          s.catalog.dropTempView("li_p141")
          try {
            import scala.jdk.CollectionConverters._
            java.nio.file.Files.walk(mvDir).iterator().asScala.toSeq
              .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
          } catch { case _: java.io.IOException => () }
        }
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT)
             |         AS grouping_level,
             |       SUM(l_quantity) AS sum_qty,
             |       COUNT(*) AS n_rows
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
             |                        (l_returnflag), (l_linestatus))""".stripMargin)),

    // MV navigation UNDER A WINDOW (round 15, verdict ask #5): the
    // moving-average dashboard shape — G3's 7-day stats consume a
    // per-(item, day) aggregate frame, and when that inner aggregate
    // is DERIVABLE (avg = sum/nnz here) the rewrite replaces its
    // fact scan with the rollup while the Window above resolves over
    // the preserved output exprIds (the p133 HAVING contract,
    // exercised one operator higher). The query is the REAL
    // marketOpportunities mart body over a daily avg-quantity frame:
    // rollup grain (l_partkey, l_shipdate), query grain
    // (l_partkey, to_date(l_shipdate)) — a coarser-grain expression
    // derivation — plus a residual grouping-column filter. The gate
    // pins: rollup scanned, fact scan GONE with the Window in place,
    // answers hash-matched. Non-derivable window inputs (G3's exact
    // median) refuse — MvWindowNavSpec pins the refusal.
    QueryDef("p147_mv_window_nav",
      (s, dir) => {
        val basePath = s"$dir/lineitem.parquet"
        val mvDir = java.nio.file.Files.createTempDirectory("graft_mv15")
        val mvPath = mvDir.resolve("winmv.parquet").toString
        graft.plans.MaterializedAggregate.buildAndRegister(s, basePath,
          mvPath, Seq("l_partkey", "l_shipdate"), Seq("l_quantity"))
        try {
          val daily = s.read.parquet(basePath)
            .where(col("l_partkey") <= 200)
            .groupBy(col("l_partkey"),
              to_date(col("l_shipdate")).as("snapshot_date"))
            .agg(avg("l_quantity").as("avg_qty"))
            .select(col("l_partkey").as("item_id"), col("snapshot_date"),
              col("avg_qty"))
          val q = graft.gold.Marts.marketOpportunities(daily,
            priceCol = "avg_qty")
          val scanned = q.queryExecution.optimizedPlan.collect {
            case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
              r.relation match {
                case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                  fs.location.rootPaths.map(_.toUri.getPath)
                case _ => Seq.empty[String]
              }
          }.flatten
          require(scanned.exists(_.contains("winmv.parquet")),
            s"window query did not navigate; scans: $scanned")
          require(!scanned.exists(_.contains("lineitem.parquet")),
            s"fact table still scanned under the Window: $scanned")
          val rows = q.collect()
          s.createDataFrame(
            s.sparkContext.parallelize(rows.toSeq, 1), q.schema)
        } finally {
          graft.plans.MvCatalog.clear()
          try {
            import scala.jdk.CollectionConverters._
            java.nio.file.Files.walk(mvDir).iterator().asScala.toSeq
              .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
          } catch { case _: java.io.IOException => () }
        }
      },
      Some("""WITH s AS (SELECT l_partkey AS item_id,
             |                  CAST(l_shipdate AS DATE) AS snapshot_date,
             |                  AVG(l_quantity) AS current_price
             |           FROM lineitem WHERE l_partkey <= 200
             |           GROUP BY 1, 2),
             |win AS (SELECT item_id, snapshot_date, current_price,
             |          avg(current_price) OVER w AS avg_price_7d,
             |          stddev_samp(current_price) OVER w AS std_dev_7d
             |        FROM s
             |        WINDOW w AS (PARTITION BY item_id
             |                     ORDER BY snapshot_date - DATE '1970-01-01'
             |                     RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
             |SELECT item_id, snapshot_date, current_price, avg_price_7d,
             |       std_dev_7d,
             |       (current_price - avg_price_7d) /
             |         nullif(std_dev_7d, 0) AS z_score,
             |       CASE WHEN (current_price - avg_price_7d) /
             |                   nullif(std_dev_7d, 0) <= -2.0 THEN 'BUY'
             |            WHEN (current_price - avg_price_7d) /
             |                   nullif(std_dev_7d, 0) >= 2.0 THEN 'SELL'
             |            ELSE 'HOLD' END AS recommendation
             |FROM win""".stripMargin)),

    // Advisor × grouping sets (round 14): a workload CONTAINING a
    // GROUP BY ROLLUP query advises the finest grain the grouping
    // sets touch (merged with the flat queries over the same base),
    // and the Expand-replay navigation then serves the ROLLUP query
    // itself — the closed advise() loop with zero manual
    // registration, extended to the grouping-sets family. The gate
    // pins the advised grain, the fact scan gone under ROLLUP, and
    // the DuckDB ROLLUP hash.
    QueryDef("p137_mv_advisor_rollup",
      (s, dir) => {
        val basePath = s"$dir/lineitem.parquet"
        val mvDir = java.nio.file.Files.createTempDirectory("graft_adv4")
        def r = s.read.parquet(basePath)
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(grouping_id().cast("long").as("grouping_level"),
            sum("l_quantity").as("sum_qty"),
            count(lit(1)).as("n_rows"))
        def flat = s.read.parquet(basePath)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(max("l_quantity").as("max_qty"))
        // everything after advise() sits inside the try: a failed
        // require must still clear MvCatalog and the temp dir, or the
        // leaked registration contaminates later gates in the session
        try {
          val defs = graft.plans.MvAdvisor.advise(
            s, Seq(r, flat), mvDir.toString)
          require(defs.length == 1, s"expected one advised def, got $defs")
          require(defs.head.groupCols.toSet ==
            Set("l_returnflag", "l_linestatus"),
            s"wrong advised grain: ${defs.head.groupCols}")
          val scanned = r.queryExecution.optimizedPlan.collect {
            case rel: org.apache.spark.sql.execution.datasources.LogicalRelation =>
              rel.relation match {
                case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                  fs.location.rootPaths.map(_.toUri.getPath)
                case _ => Seq.empty[String]
              }
          }.flatten
          require(scanned.exists(_.contains("/mv_")),
            s"advised rollup not navigated by ROLLUP query; scans: $scanned")
          require(!scanned.exists(_.contains("lineitem.parquet")),
            s"fact table still scanned under ROLLUP: $scanned")
          val rows = r.collect()
          s.createDataFrame(
            s.sparkContext.parallelize(rows.toSeq, 1), r.schema)
        } finally {
          graft.plans.MvCatalog.clear()
          try {
            import scala.jdk.CollectionConverters._
            java.nio.file.Files.walk(mvDir).iterator().asScala.toSeq
              .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
          } catch { case _: java.io.IOException => () }
        }
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT)
             |         AS grouping_level,
             |       SUM(l_quantity) AS sum_qty,
             |       COUNT(*) AS n_rows
             |FROM lineitem
             |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin)),

    // Retention × maintained MV — the round-12 verdict's one open
    // soundness composition: the medallion's retention delete (S7,
    // Pipeline.runRetention's partition drop) composed with a
    // maintained rollup whose stream only ever ADDS partials. The
    // gate walks the full lifecycle on a date-partitioned fact:
    // two-batch maintained partials -> register (maintained) ->
    // partition drop below the cutoff -> the un-retracted rollup
    // must REFUSE navigation (delete-guard: a registered first-level
    // entry vanished), falling back to the post-delete base ->
    // StreamingMvMaintenance.retract with the delete's predicate +
    // re-registration re-arms -> the navigated query's answers
    // hash-match DuckDB over the post-delete base, fact scan gone.
    // Retraction is row-filtering on GROUP-commuting predicates —
    // exact for min/max too, because whole groups vanish (negative
    // partials could never retract a MIN).
    QueryDef("p134_mv_retention_retract",
      (s, dir) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft_mv10")
        val stage = tmp.resolve("fact_part").toString
        val mvPath = tmp.resolve("rmv.parquet").toString
        // MONTH-grain partitions (round-13 verdict "What's wrong" #2:
        // the original ~2.4k single-date dirs made this the most
        // expensive gate on the surface at 21.9 s — ~84 month dirs
        // prove the identical lifecycle at a tenth the fixture I/O)
        val silver = TestdataAdapter.silverFromLineitem(s, dir)
          .withColumn("snapshot_month", trunc(col("snapshot_date"), "month"))
          .select("item_id", "quantity", "unit_price", "snapshot_month")
        // one shuffle keyed on the partition column so the month dirs
        // get a few files each, not one per writing task — the same
        // small-file discipline a real medallion write uses
        silver.repartition(8, col("snapshot_month"))
          .write.partitionBy("snapshot_month").parquet(stage)
        val f = s.read.parquet(stage)
        graft.streaming.StreamingMvMaintenance.processBatch(
          f.where(col("item_id") % 2 === 0), 0L, mvPath,
          Seq("snapshot_month"), Seq("unit_price", "quantity"))
        graft.streaming.StreamingMvMaintenance.processBatch(
          f.where(col("item_id") % 2 =!= 0), 1L, mvPath,
          Seq("snapshot_month"), Seq("unit_price", "quantity"))
        graft.plans.MaterializedAggregate.registerExisting(
          s, stage, mvPath, Seq("snapshot_month"),
          Seq("unit_price", "quantity"), maintained = true)
        // the delete happens BETWEEN navigations below — observe it
        // immediately rather than through the production 30 s
        // freshness-TTL amortization window
        s.conf.set("spark.graft.mv.freshnessTtlMs", "0")
        try {
          def q = s.read.parquet(stage)
            .groupBy(col("snapshot_month"))
            .agg(sum("quantity").as("sum_qty"),
              min("unit_price").as("min_price"),
              max("unit_price").as("max_price"),
              count(lit(1)).as("n_rows"))
          def scans(df: org.apache.spark.sql.DataFrame) =
            df.queryExecution.optimizedPlan.collect {
              case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
                r.relation match {
                  case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                    fs.location.rootPaths.map(_.toUri.getPath)
                  case _ => Seq.empty[String]
                }
            }.flatten
          require(scans(q).exists(_.contains("rmv.parquet")),
            "maintained rollup must navigate before the delete")
          // S7 retention discipline: partition-dir drop, no data read
          val cutoff = java.time.LocalDate.parse("1998-01-01")
          val root = java.nio.file.Paths.get(stage)
          import scala.jdk.CollectionConverters._
          val doomed = java.nio.file.Files.list(root).iterator().asScala
            .filter { p =>
              val n = p.getFileName.toString
              n.startsWith("snapshot_month=") &&
                scala.util.Try(java.time.LocalDate.parse(
                  n.stripPrefix("snapshot_month="))).toOption
                  .exists(_.isBefore(cutoff))
            }.toSeq
          require(doomed.nonEmpty, "cutoff dropped nothing — bad fixture")
          doomed.foreach { d =>
            java.nio.file.Files.walk(d).iterator().asScala.toSeq
              .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
          }
          s.catalog.refreshByPath(stage)
          // un-retracted: the delete-guard must refuse (correct
          // answers via the post-delete base, never the stale rollup)
          require(scans(q).exists(_.contains("fact_part")),
            "stale maintained rollup navigated after the retention drop")
          require(graft.streaming.StreamingMvMaintenance.retract(
            s, mvPath, s"snapshot_month < DATE '$cutoff'") == 2,
            "retraction should fold the two maintained batches")
          graft.plans.MaterializedAggregate.registerExisting(
            s, stage, mvPath, Seq("snapshot_month"),
            Seq("unit_price", "quantity"), maintained = true)
          val q2 = q
          require(scans(q2).exists(_.contains("rmv.parquet")),
            "retraction + re-registration must re-arm navigation")
          require(!scans(q2).exists(_.contains("fact_part")),
            "fact table still scanned after re-arm")
          val rows = q2.collect()
          s.createDataFrame(
            s.sparkContext.parallelize(rows.toSeq, 1), q2.schema)
        } finally {
          s.conf.unset("spark.graft.mv.freshnessTtlMs")
          graft.plans.MvCatalog.clear()
          try {
            import scala.jdk.CollectionConverters._
            java.nio.file.Files.walk(tmp).iterator().asScala.toSeq
              .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
          } catch { case _: java.io.IOException => () }
        }
      },
      Some(s"""WITH ${TestdataAdapter.silverSql}
             |SELECT CAST(date_trunc('month', snapshot_date) AS DATE)
             |         AS snapshot_month,
             |       CAST(SUM(quantity) AS BIGINT) AS sum_qty,
             |       MIN(unit_price) AS min_price,
             |       MAX(unit_price) AS max_price,
             |       COUNT(*) AS n_rows
             |FROM silver
             |WHERE date_trunc('month', snapshot_date) >= DATE '1998-01-01'
             |GROUP BY 1""".stripMargin)),

    // Link-graph quality prior: integer-arithmetic PageRank
    // (graft.pipeline.LinkGraph) over a deterministic synthetic link
    // graph on the document ids: every doc links to (31d+7)%N, and
    // docs with d % 3 != 0 also to (17d+3)%N. Both affine maps are
    // bijections mod N, so WITHOUT the filter every in-degree is 2
    // and PageRank degenerates to uniform — the filter varies
    // out-degree {1,2} and in-degree {1,2} independently, giving a
    // real rank spread (112 distinct values at sf0.01, ~0.32–2.2
    // of scale). Integer units make the rank a BIGINT the hash
    // oracle can pin: every contribution is a floor division and
    // every Σ an integer sum — order- and engine-independent, unlike
    // the textbook float formulation. Oracle = the three rounds
    // unrolled as CTEs with DuckDB's `//` floor division.
    QueryDef("p118_link_prior",
      (s, dir) => {
        val docs = s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id").cast("long").as("doc_id"))
        // one bounded scalar to the driver (modulus for the synthetic
        // edge maps), same discipline as the centroid collects
        val n = docs.agg(max(col("doc_id"))).first().getLong(0) + 1L
        val edges = docs
          .select(col("doc_id").as("src"),
            ((col("doc_id") * 31 + 7) % n).as("dst"))
          .unionAll(docs.where(col("doc_id") % 3 =!= 0)
            .select(col("doc_id").as("src"),
              ((col("doc_id") * 17 + 3) % n).as("dst")))
        graft.pipeline.LinkGraph.pageRankUnits(edges, "src", "dst",
          iterations = 3)
          .select(col("src").as("doc_id"), col("rank_units"))
      },
      Some {
        def round(k: Int): String =
          s"""c$k AS (SELECT e.dst AS id,
             |  CAST(SUM((r.r * 85) // (100 * od.outd)) AS BIGINT) AS c
             |  FROM e JOIN r${k - 1} r ON r.id = e.src
             |         JOIN od ON od.id = e.src
             |  GROUP BY e.dst),
             |r$k AS (SELECT v.id,
             |  CAST(150000 + COALESCE(c.c, 0) AS BIGINT) AS r
             |  FROM v LEFT JOIN c$k c USING(id))"""
        s"""WITH nn AS (SELECT max(doc_id) + 1 AS n FROM documents),
           |e AS (SELECT doc_id AS src,
           |             (doc_id * 31 + 7) % (SELECT n FROM nn) AS dst
           |      FROM documents
           |      UNION ALL
           |      SELECT doc_id, (doc_id * 17 + 3) % (SELECT n FROM nn)
           |      FROM documents WHERE doc_id % 3 <> 0),
           |v AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
           |od AS (SELECT src AS id, count(*) AS outd FROM e GROUP BY src),
           |r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS r FROM v),
           |${round(1)},
           |${round(2)},
           |${round(3)}
           |SELECT id AS doc_id, r AS rank_units FROM r3""".stripMargin
      }),

    // HYBRID retrieval fusion — reciprocal-rank fusion (RRF,
    // Cormack et al.) of the engine's two retrieval modalities:
    // lexical BM25 (p79's terms) and embedding cosine (p10's query),
    // the standard two-signal shape every modern retrieval stack
    // ships. Each list is top-20 FIRST (TakeOrdered — the corpus
    // never feeds a global window; the rank windows run over the
    // bounded 20-row lists), fused as Σ 1/(60 + rank) with doc-id
    // tie-break. The fusion arithmetic is two correctly-rounded
    // divisions and one fixed-order addition — engine-exact, so the
    // oracle recomputes BOTH lists (the p79 BM25 chain + the p10
    // cosine) and the fused ranking end-to-end.
    QueryDef("p124_hybrid_rrf",
      (s, dir) => {
        import graft.pipeline.Retrieval
        val lexRank = Retrieval.topKRanks(
          TextAnalysis.bm25Scores(
            Tables.documents(s, dir), Seq("spark", "dup", "vector")),
          "doc_id", "score", 20)
        val semRank = Retrieval.topKRanks(
          Similarity.bruteForceTopK(
            Tables.embeddings(s, dir), queryId = 0L, k = 20)
            .select(col("vec_id").as("doc_id"), col("cosine")),
          "doc_id", "cosine", 20)
        Retrieval.rrfFuse(Seq("lex" -> lexRank, "sem" -> semRank),
          "doc_id", k = 60, topK = 10)
      },
      Some("""WITH arr AS (
             |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
             |                             t -> t <> '') AS w
             |  FROM documents),
             |dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM arr),
             |stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |                 CAST(sum(dl) AS BIGINT) AS tot
             |          FROM dl),
             |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
             |       FROM (SELECT doc_id, unnest(w) AS term FROM arr)
             |       WHERE term IN ('spark', 'dup', 'vector')
             |       GROUP BY 1, 2),
             |dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df
             |        FROM tf GROUP BY 1),
             |bm AS (SELECT t.doc_id,
             |         sum(ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
             |             * (t.tf * 2.2) /
             |             (t.tf + 1.2 * (0.25 + 0.75 *
             |                (l.dl / (s.tot::DOUBLE / s.n))))) AS score
             |       FROM tf t JOIN dft d USING (term)
             |            JOIN dl l ON l.doc_id = t.doc_id
             |            CROSS JOIN stats s
             |       GROUP BY t.doc_id),
             |lexr AS (SELECT doc_id, CAST(rn AS INTEGER) AS r_lex FROM (
             |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id)
             |    AS rn FROM bm) WHERE rn <= 20),
             |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
             |      FROM embeddings WHERE vec_id = 0),
             |cosv AS (SELECT e.vec_id AS doc_id,
             |           list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe)
             |           / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
             |                                    CAST(e.embedding AS DOUBLE[])))
             |              * sqrt(list_dot_product(q.qe, q.qe))) AS cosine
             |         FROM embeddings e, q WHERE e.vec_id <> 0),
             |semr AS (SELECT doc_id, CAST(rn AS INTEGER) AS r_sem FROM (
             |  SELECT doc_id, row_number() OVER (ORDER BY cosine DESC, doc_id)
             |    AS rn FROM cosv) WHERE rn <= 20),
             |fused AS (SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
             |            l.r_lex, s.r_sem,
             |            COALESCE(1.0 / (60 + l.r_lex), 0.0)
             |              + COALESCE(1.0 / (60 + s.r_sem), 0.0) AS rrf
             |          FROM lexr l FULL JOIN semr s ON s.doc_id = l.doc_id)
             |SELECT doc_id, r_lex, r_sem, rrf FROM fused
             |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin)),

    // Anchor-text aggregation — the OTHER web-graph curation signal
    // next to the p118 rank prior: for every page, the top-2 anchor
    // terms its in-links carry (what the web "calls" the page — a
    // quality/topic signal search stacks have used since AltaVista,
    // and document-expansion pipelines attach to pretraining pages).
    // Anchor for edge src→dst = src's first token (deterministic,
    // oracle-restatable). Scale shape: one (dst, anchor) map-side-
    // combinable count, then the NATIVE top_k_by_score aggregate —
    // O(pages × k) state on the wire, never a per-page sort of every
    // distinct anchor (the window formulation the operator exists to
    // avoid); the string rides a bounded (dst, hash)-grain join back.
    // Keys are the anchors' 60-bit hashes, so the tie-break is
    // (count DESC, hash ASC) — pinned in the oracle the same way.
    QueryDef("p123_anchor_text",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val ids = docs.select(col("doc_id").cast("long").as("doc_id"))
        val n = ids.agg(max(col("doc_id"))).first().getLong(0) + 1L
        val edges = ids
          .select(col("doc_id").as("src"),
            ((col("doc_id") * 31 + 7) % n).as("dst"))
          .unionAll(ids.where(col("doc_id") % 3 =!= 0)
            .select(col("doc_id").as("src"),
              ((col("doc_id") * 17 + 3) % n).as("dst")))
        val anchors = docs.select(col("doc_id").as("src"),
          split(trim(col("text")), "\\s+").getItem(0).as("anchor"))
        graft.pipeline.Retrieval.anchorTopK(edges, anchors, k = 2)
      },
      Some("""WITH nn AS (SELECT max(doc_id) + 1 AS n FROM documents),
             |e AS (SELECT doc_id AS src,
             |             (doc_id * 31 + 7) % (SELECT n FROM nn) AS dst
             |      FROM documents
             |      UNION ALL
             |      SELECT doc_id, (doc_id * 17 + 3) % (SELECT n FROM nn)
             |      FROM documents WHERE doc_id % 3 <> 0),
             |a AS (SELECT e.dst,
             |             list_filter(string_split_regex(trim(d.text), '\s+'),
             |                         t -> t <> '')[1] AS anchor
             |      FROM e JOIN documents d ON d.doc_id = e.src),
             |af AS (SELECT * FROM a
             |       WHERE anchor IS NOT NULL AND anchor <> ''),
             |c AS (SELECT dst, anchor, CAST(count(*) AS BIGINT) AS cnt,
             |             ('0x' || substr(md5(anchor), 1, 15))::BIGINT AS h
             |      FROM af GROUP BY dst, anchor),
             |r AS (SELECT dst, anchor, cnt,
             |             row_number() OVER (PARTITION BY dst
             |               ORDER BY cnt DESC, h ASC) AS rnk
             |      FROM c)
             |SELECT dst AS doc_id, CAST(rnk AS INT) AS rank, anchor, cnt
             |FROM r WHERE rnk <= 2""".stripMargin)),

    // Composed web-corpus release gate — the consumer a link prior
    // exists FOR: crawl-side curation keeps pages that carry at
    // least the uniform share of link mass (rank_units >= scale —
    // the "not a sink/spam-farm leaf" test) AND pass the content
    // quality score. Both signals reuse their fragment gates
    // verbatim (p118's three unrolled rounds, p04's quality chain),
    // so this gate can only drift if the composition does. Verdict
    // grain — every doc with both signals and the release bit — is
    // the audit contract; at 100 TB both sides are id-grain joins
    // (the rank table is two longs per page).
    QueryDef("p120_web_release",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val ids = docs.select(col("doc_id").cast("long").as("doc_id"))
        val n = ids.agg(max(col("doc_id"))).first().getLong(0) + 1L
        val edges = ids
          .select(col("doc_id").as("src"),
            ((col("doc_id") * 31 + 7) % n).as("dst"))
          .unionAll(ids.where(col("doc_id") % 3 =!= 0)
            .select(col("doc_id").as("src"),
              ((col("doc_id") * 17 + 3) % n).as("dst")))
        val rank = graft.pipeline.LinkGraph.pageRankUnits(edges, "src", "dst",
          iterations = 3)
          .select(col("src").as("doc_id"), col("rank_units"))
        val quality = TextAnalysis.qualityFeatures(docs)
          .select(col("doc_id"), col("quality_score"))
        rank.join(quality, "doc_id")
          .select(col("doc_id"), col("rank_units"), col("quality_score"),
            (col("rank_units") >= 1000000L && col("quality_score") >= 0.6)
              .as("kept"))
      },
      Some {
        def round(k: Int): String =
          s"""c$k AS (SELECT e.dst AS id,
             |  CAST(SUM((r.r * 85) // (100 * od.outd)) AS BIGINT) AS c
             |  FROM e JOIN r${k - 1} r ON r.id = e.src
             |         JOIN od ON od.id = e.src
             |  GROUP BY e.dst),
             |r$k AS (SELECT v.id,
             |  CAST(150000 + COALESCE(c.c, 0) AS BIGINT) AS r
             |  FROM v LEFT JOIN c$k c USING(id))"""
        s"""WITH nn AS (SELECT max(doc_id) + 1 AS n FROM documents),
           |e AS (SELECT doc_id AS src,
           |             (doc_id * 31 + 7) % (SELECT n FROM nn) AS dst
           |      FROM documents
           |      UNION ALL
           |      SELECT doc_id, (doc_id * 17 + 3) % (SELECT n FROM nn)
           |      FROM documents WHERE doc_id % 3 <> 0),
           |v AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
           |od AS (SELECT src AS id, count(*) AS outd FROM e GROUP BY src),
           |r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS r FROM v),
           |${round(1)},
           |${round(2)},
           |${round(3)},
           |f AS (SELECT doc_id, $qualityColsSql FROM documents),
           |q AS (SELECT doc_id, $qualityScoreSql AS quality_score FROM f)
           |SELECT r3.id AS doc_id, r3.r AS rank_units, q.quality_score,
           |       (r3.r >= 1000000 AND q.quality_score >= 0.6) AS kept
           |FROM r3 JOIN q ON q.doc_id = r3.id""".stripMargin
      }),

    // SURGICAL decontamination — mask, don't drop: excise exactly
    // the tokens covered by a benchmark-shared 4-gram, keep the rest
    // of the page (dropping a long doc over one quoted benchmark
    // sentence wastes everything else). Oracle rebuilds coverage at
    // the token-position grain and reassembles with an ordered
    // string_agg — position arithmetic, coverage union and
    // reassembly all independently restated.
    QueryDef("p115_decontamination_excise",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Contamination.exciseOverlaps(
          docs.where(col("doc_id") % 50 =!= 0),
          docs.where(col("doc_id") % 50 === 0), n = 4)
      },
      Some(decontaminationExciseOracleSql)),

    QueryDef("p24_decontamination",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Contamination.overlap(
          docs.where(col("doc_id") % 50 =!= 0),
          docs.where(col("doc_id") % 50 === 0), n = 4)
      },
      Some(decontaminationOracleSql)),

    // Substring-level exact dedup: repeated 20-char windows (60-bit
    // md5-hashed — same family in the oracle) merged into maximal
    // removable spans per doc. No pair materialization: a hot
    // boilerplate string costs its own occurrences, never C(n,2).
    QueryDef("p27_repeated_spans",
      (s, dir) => Spans.duplicatedWindowSpans(
        Tables.documents(s, dir), k = 20),
      Some("""WITH win AS (
             |  SELECT doc_id, CAST(i AS INT) AS pos,
             |         ('0x' || substr(md5(substr(text, CAST(i AS INT)+1, 20)), 1, 15))::BIGINT AS h
             |  FROM (SELECT doc_id, text,
             |               unnest(range(greatest(length(text) - 20 + 1, 0))) AS i
             |        FROM documents)),
             |dup AS (SELECT h FROM win GROUP BY h HAVING count(*) >= 2),
             |marked AS (SELECT doc_id, pos FROM win JOIN dup USING(h)),
             |isl AS (SELECT doc_id, pos,
             |          CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
             |                 OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 1
             |               THEN 1 ELSE 0 END AS new_span
             |        FROM marked),
             |sp AS (SELECT doc_id, pos,
             |              CAST(sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT) AS span_id
             |       FROM isl)
             |SELECT doc_id, span_id,
             |       min(pos) AS span_start,
             |       max(pos) - min(pos) + 20 AS span_len,
             |       CAST(count(*) AS BIGINT) AS n_windows
             |FROM sp GROUP BY doc_id, span_id""".stripMargin)),

    // MAXIMAL duplicated substrings (round 15, verdict ask #4 — the
    // Lee et al. 2022 exact-substring operator, variable-length):
    // where p27 marks positions whose window is duplicated SOMEWHERE
    // (adjacent positions may match different partners), this emits
    // aligned match PAIRS certified maximal by window-chain
    // extension — same-hash occurrences pair up, runs on one
    // alignment diagonal (pos_a − pos_b) merge tolerating gaps up to
    // k−1 (flanking matches PROVE the gap content equal; only the
    // df-cap creates such gaps), and a run that stops is a match
    // that cannot extend by one char (a real mismatch breaks all k
    // windows covering the differing char).
    // The one pair step is per-hash occurrence pairing under a
    // df-cap (maxOcc 1000; audit via Spans.overloadedWindowHashes) —
    // never corpus². Oracle restates windows, the cap, canonical
    // pairing, diagonal runs and the merge via the shared
    // maximalMatchCtesSql (one definition for p146 and p149).
    QueryDef("p146_maximal_substrings",
      (s, dir) => Spans.maximalDuplicateSubstrings(
        Tables.documents(s, dir), k = 20, minLen = 40),
      Some(s"""WITH $maximalMatchCtesSql
             |SELECT doc_a, min(pos_a) AS pos_a, doc_b,
             |       min(pos_a) - diag AS pos_b,
             |       max(pos_a) - min(pos_a) + 20 AS match_len
             |FROM rid GROUP BY doc_a, doc_b, diag, run_id
             |HAVING max(pos_a) - min(pos_a) + 20 >= 40""".stripMargin)),

    // Keep-FIRST excision over the maximal matches (round 15 —
    // Lee et al. 2022's actual dedup policy: keep one copy, excise
    // the rest). An occurrence is excised iff it is the doc_b side
    // of some canonical match pair — i.e. a strictly earlier
    // (doc, offset) occurrence of the same content exists — so the
    // earliest member of every transitive duplicate group survives
    // untouched. Reassembly must survive ARBITRARY span overlap
    // (different diagonals): the Spark walk clamps the resume offset
    // monotonically; the oracle re-derives coverage at char grain
    // and string_aggs the survivors (a fully covered doc must come
    // out EMPTY, not fall back to its original text).
    QueryDef("p149_maximal_excision",
      (s, dir) => Spans.removeMaximalDuplicates(
        Tables.documents(s, dir), k = 20, minLen = 40)
        .select(col("doc_id"), col("clean_text")),
      Some(s"""WITH $maximalMatchCtesSql,
             |m AS (SELECT doc_a, min(pos_a) AS pos_a, doc_b,
             |             min(pos_a) - diag AS pos_b,
             |             max(pos_a) - min(pos_a) + 20 AS match_len
             |      FROM rid GROUP BY doc_a, doc_b, diag, run_id
             |      HAVING max(pos_a) - min(pos_a) + 20 >= 40),
             |sp AS (SELECT DISTINCT doc_b AS doc_id, pos_b AS s,
             |              match_len AS l FROM m),
             |chars AS (SELECT doc_id, CAST(i AS INT) AS i,
             |                 substr(text, CAST(i AS INT)+1, 1) AS ch
             |          FROM (SELECT doc_id, text,
             |                       unnest(range(length(text))) AS i
             |                FROM documents)),
             |cov AS (SELECT DISTINCT c.doc_id, c.i
             |        FROM sp JOIN chars c
             |          ON c.doc_id = sp.doc_id
             |         AND c.i >= sp.s AND c.i < sp.s + sp.l),
             |kept AS (SELECT c.doc_id, c.i, c.ch FROM chars c
             |         WHERE NOT EXISTS (SELECT 1 FROM cov v
             |                           WHERE v.doc_id = c.doc_id
             |                             AND v.i = c.i)),
             |agg AS (SELECT doc_id, string_agg(ch, '' ORDER BY i)
             |          AS clean_text
             |        FROM kept GROUP BY doc_id)
             |SELECT d.doc_id,
             |       CASE WHEN EXISTS (SELECT 1 FROM sp
             |                         WHERE sp.doc_id = d.doc_id)
             |            THEN coalesce(a.clean_text, '')
             |            ELSE d.text END AS clean_text
             |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin)),

    // Corpus token-frequency rarity profile — the unigram-LM-flavored
    // quality signal kept EXACT: every emitted number is an integer
    // aggregate or a single integer division (the engine-wide rule —
    // corpus-order float sums would be nondeterministic), so the
    // gate hash-matches without tolerance. Gibberish scores low
    // avg_freq / high singleton_frac; boilerplate scores the
    // opposite — the standard cheap quality-filter axis next to p04.
    QueryDef("p31_token_rarity",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val occ = docs.select(col("doc_id"),
            explode(TextAnalysis.tokens(col("text"))).as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("mult"))
        val uni = occ.groupBy("tok").agg(sum("mult").as("cnt"))
        val prof = occ.join(uni, Seq("tok"))
          .groupBy("doc_id").agg(
            sum("mult").as("n_tokens"),
            count(lit(1)).as("n_distinct"),
            sum(col("mult") * col("cnt")).as("sum_freq"),
            min("cnt").as("min_freq"),
            sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("n_singletons"))
        docs.select("doc_id").join(prof, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
            coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
            coalesce(col("sum_freq"), lit(0L)).as("sum_freq"),
            col("min_freq"),
            coalesce(col("n_singletons"), lit(0L)).as("n_singletons"),
            (col("sum_freq") / col("n_tokens")).as("avg_freq"),
            (col("n_singletons") / col("n_tokens")).as("singleton_frac"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |         list_filter(string_split_regex(trim(text), '\s+'),
             |                     t -> t <> '') AS w
             |  FROM documents),
             |occ AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS mult
             |        FROM (SELECT doc_id, unnest(w) AS tok FROM toks)
             |        GROUP BY doc_id, tok),
             |uni AS (SELECT tok, CAST(sum(mult) AS BIGINT) AS cnt
             |        FROM occ GROUP BY tok),
             |prof AS (SELECT doc_id,
             |                CAST(sum(mult) AS BIGINT) AS n_tokens,
             |                CAST(count(*) AS BIGINT) AS n_distinct,
             |                CAST(sum(mult * cnt) AS BIGINT) AS sum_freq,
             |                CAST(min(cnt) AS BIGINT) AS min_freq,
             |                CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |                  AS n_singletons
             |         FROM occ JOIN uni USING (tok)
             |         GROUP BY doc_id)
             |SELECT d.doc_id,
             |       coalesce(n_tokens, 0) AS n_tokens,
             |       coalesce(n_distinct, 0) AS n_distinct,
             |       coalesce(sum_freq, 0) AS sum_freq,
             |       min_freq,
             |       coalesce(n_singletons, 0) AS n_singletons,
             |       CAST(sum_freq AS DOUBLE) / n_tokens AS avg_freq,
             |       CAST(n_singletons AS DOUBLE) / n_tokens AS singleton_frac
             |FROM (SELECT doc_id FROM documents) d LEFT JOIN prof USING (doc_id)""".stripMargin)),

    // Corpus-level exact LINE dedup (RefinedWeb/C4-style): every
    // non-blank line keeps only its corpus-wide first occurrence
    // (min packed (doc_id, pos)); blank lines always survive. The
    // oracle re-derives the line explosion, the 60-bit line hashes,
    // the packed-order winners and the per-doc reconstruction.
    QueryDef("p29_line_dedup",
      (s, dir) => Lines.dedupLines(Tables.documents(s, dir)),
      Some("""WITH lsrc AS (SELECT doc_id, string_split(text, chr(10)) AS ls
             |              FROM documents),
             |occ AS (SELECT doc_id, CAST(i AS INT) AS pos,
             |               ls[CAST(i AS INT) + 1] AS ln
             |        FROM (SELECT doc_id, ls, unnest(range(len(ls))) AS i
             |              FROM lsrc)),
             |keyed AS (SELECT doc_id, pos, trim(ln) = '' AS blank,
             |                 ('0x' || substr(md5(ln), 1, 15))::BIGINT AS h
             |          FROM occ),
             |win AS (SELECT h, min(doc_id * 4294967296 + pos) AS w
             |        FROM keyed WHERE NOT blank GROUP BY h),
             |verdict AS (SELECT k.doc_id, k.pos,
             |                   (k.blank OR k.doc_id * 4294967296 + k.pos = w.w) AS keep
             |            FROM keyed k LEFT JOIN win w USING (h)),
             |kept AS (SELECT doc_id,
             |                CAST(count(*) AS BIGINT) AS n_lines,
             |                CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             |                list_sort(list(pos) FILTER (WHERE keep)) AS kp
             |         FROM verdict GROUP BY doc_id)
             |SELECT k.doc_id, n_lines, n_kept,
             |       array_to_string(list_transform(kp, p -> l.ls[CAST(p AS INT) + 1]),
             |                       chr(10)) AS clean_text
             |FROM kept k JOIN lsrc l ON l.doc_id = k.doc_id""".stripMargin)),

    // PII redaction. The fixture has no PII, so the gate synthesizes
    // one of each shape per doc (identically in both engines: plain
    // concat arithmetic on doc_id) and verifies counts AND the fully
    // redacted text. Patterns/replacements are embedded from
    // Pii.DefaultRules — the oracle can never drift from the engine.
    QueryDef("p25_pii_redaction",
      (s, dir) => Pii.redact(Tables.documents(s, dir).select(col("doc_id"),
          concat(col("text"), lit(" reach user"), col("doc_id").cast("string"),
            lit("@mail.example.com or 10.2."), (col("doc_id") % 256).cast("string"),
            lit(".9 ref 123-45-6789 call 555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("text")))
        .select(col("doc_id"), col("n_email"), col("n_ipv4"), col("n_ssn"),
          col("n_phone"), col("redacted_text")),
      Some {
        val Seq(em, ip, ssn, ph) = Pii.DefaultRules
        s"""WITH aug AS (SELECT doc_id,
           |  text || ' reach user' || CAST(doc_id AS VARCHAR)
           |    || '@mail.example.com or 10.2.' || CAST(doc_id % 256 AS VARCHAR)
           |    || '.9 ref 123-45-6789 call 555-'
           |    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
           |  FROM documents),
           |s1 AS (SELECT doc_id,
           |  CAST(len(regexp_extract_all(t, '${em.pattern}')) AS BIGINT) AS n_email,
           |  regexp_replace(t, '${em.pattern}', '${em.replacement}', 'g') AS t1 FROM aug),
           |s2 AS (SELECT doc_id, n_email,
           |  CAST(len(regexp_extract_all(t1, '${ip.pattern}')) AS BIGINT) AS n_ipv4,
           |  regexp_replace(t1, '${ip.pattern}', '${ip.replacement}', 'g') AS t2 FROM s1),
           |s3 AS (SELECT doc_id, n_email, n_ipv4,
           |  CAST(len(regexp_extract_all(t2, '${ssn.pattern}')) AS BIGINT) AS n_ssn,
           |  regexp_replace(t2, '${ssn.pattern}', '${ssn.replacement}', 'g') AS t3 FROM s2)
           |SELECT doc_id, n_email, n_ipv4, n_ssn,
           |  CAST(len(regexp_extract_all(t3, '${ph.pattern}')) AS BIGINT) AS n_phone,
           |  regexp_replace(t3, '${ph.pattern}', '${ph.replacement}', 'g') AS redacted_text
           |FROM s3""".stripMargin
      }),

    // Int8-range scalar-quantized ANN: per-dim corpus min/max ranges,
    // codes via floor((v-lo)*255/(hi-lo)+0.5) (floor, not round —
    // half-case conventions differ across engines; floor doesn't),
    // ranking by EXACT integer dot product, so score and order are
    // engine- and partitioning-independent. The memory-bound scale
    // path: 4x smaller vectors than float32.
    QueryDef("p26_quantized_topk",
      (s, dir) => Quantization.quantizedTopK(
        Tables.embeddings(s, dir), queryId = 0L, k = 10),
      Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              |dims AS (SELECT r.d AS d,
              |           min(v[CAST(r.d AS INT)+1]) AS lo,
              |           max(v[CAST(r.d AS INT)+1]) AS hi
              |         FROM e, range($EmbeddingDim) r(d) GROUP BY r.d),
              |rng AS (SELECT list(lo ORDER BY d) AS los, list(hi ORDER BY d) AS his FROM dims),
              |q AS (SELECT vec_id, list_transform(range($EmbeddingDim), d ->
              |        CASE WHEN his[CAST(d AS INT)+1] = los[CAST(d AS INT)+1] THEN 0
              |             ELSE CAST(least(greatest(floor((v[CAST(d AS INT)+1] - los[CAST(d AS INT)+1]) * 255.0
              |                    / (his[CAST(d AS INT)+1] - los[CAST(d AS INT)+1]) + 0.5), 0.0), 255.0) AS INT)
              |        END) AS qv
              |      FROM e, rng),
              |qq AS (SELECT qv AS query_qv FROM q WHERE vec_id = 0)
              |SELECT q.vec_id,
              |       CAST(list_dot_product(list_transform(q.qv, x -> CAST(x AS DOUBLE)),
              |              list_transform(qq.query_qv, x -> CAST(x AS DOUBLE))) AS BIGINT) AS qscore
              |FROM q, qq WHERE q.vec_id <> 0
              |ORDER BY qscore DESC, q.vec_id ASC
              |LIMIT 10""".stripMargin)),

    // Brute-force cosine top-k: the exact ANN baseline.
    QueryDef("p10_brute_force_topk",
      (s, dir) => Similarity.bruteForceTopK(
        Tables.embeddings(s, dir), queryId = 0L, k = 10),
      Some("""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
             |           FROM embeddings WHERE vec_id = 0)
             |SELECT e.vec_id,
             |       list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe)
             |       / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
             |                                CAST(e.embedding AS DOUBLE[])))
             |          * sqrt(list_dot_product(q.qe, q.qe))) AS cosine
             |FROM embeddings e, q
             |WHERE e.vec_id <> 0
             |ORDER BY cosine DESC, e.vec_id ASC
             |LIMIT 10""".stripMargin)),

    // Sign-LSH ANN top-k: scores only the query's bucket. bits=4 so
    // the bucket is populated at sf0.01 corpus size; at 100 TB bits
    // grows with the corpus and the bucket column becomes a partition
    // key. The oracle embeds the engine's md5-derived hyperplanes as
    // literal DOUBLE[]s and recomputes every bucket in SQL.
    QueryDef("p11_lsh_topk",
      (s, dir) => Similarity.lshTopK(
        Tables.embeddings(s, dir), queryId = 0L, k = 10, bits = 4,
        dim = Some(EmbeddingDim)),
      Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              |           FROM embeddings),
              |b AS (SELECT vec_id, v,
              |        CASE WHEN len(v) = $EmbeddingDim THEN
              |            ${bucketSql("v", 4)}
              |        END AS bucket
              |      FROM e),
              |q AS (SELECT v AS qv, bucket AS qb FROM b WHERE vec_id = 0)
              |SELECT b.vec_id,
              |       ${cosineSql("b.v", "q.qv")} AS cosine
              |FROM b, q
              |WHERE b.bucket = q.qb AND b.vec_id <> 0
              |ORDER BY cosine DESC, b.vec_id ASC
              |LIMIT 10""".stripMargin)),

    // IVF-Flat ANN top-k: nprobe/nlist cell probing with exact
    // in-cell scoring. The oracle recomputes the md5-spread centroid
    // sample (non-empty at gate scale, so the tiny-corpus fallback
    // path is not mirrored), the argmax-cosine cell assignment with
    // the engine's (score, cid) lexicographic tie-break, the probe
    // set, and the in-cell top-k — end-to-end in SQL.
    QueryDef("p13_ivf_topk",
      (s, dir) => Similarity.ivfTopK(
        Tables.embeddings(s, dir), queryId = 0L, k = 10, nlist = 16, nprobe = 4),
      Some(s"""WITH stride AS (SELECT greatest(count(*) // 16, 1) AS bkt
              |                FROM embeddings),
              |cent AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS c
              |         FROM embeddings, stride
              |         WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR) || '/ivf'), 1, 8))::BIGINT
              |               % bkt = 0
              |         ORDER BY vec_id LIMIT 16),
              |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              |assigned AS (
              |  SELECT vec_id, v, cid,
              |         row_number() OVER (PARTITION BY vec_id
              |           ORDER BY list_dot_product(v, c) / sqrt(list_dot_product(c, c)) DESC,
              |                    cid DESC) AS rn
              |  FROM e CROSS JOIN cent),
              |celled AS (SELECT vec_id, v, cid AS cell FROM assigned WHERE rn = 1),
              |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
              |probes AS (
              |  SELECT cid,
              |         row_number() OVER (ORDER BY
              |           ${cosineSql("c", "q.qv")} DESC, cid DESC) AS pr
              |  FROM cent, q)
              |SELECT d.vec_id,
              |       ${cosineSql("d.v", "q.qv")} AS cosine
              |FROM celled d
              |JOIN probes p ON d.cell = p.cid AND p.pr <= 4
              |CROSS JOIN q
              |WHERE d.vec_id <> 0
              |ORDER BY cosine DESC, d.vec_id ASC
              |LIMIT 10""".stripMargin)),

    // Embedding-cosine near-dup pairs within LSH buckets, with the
    // hot-bucket cap and malformed-vector quarantine mirrored
    // (len-filter + HAVING — both deterministic, both no-ops on the
    // well-formed gate corpus, both load-bearing at 100 TB).
    QueryDef("p12_embedding_neardups",
      (s, dir) => Similarity.embeddingNearDups(
        Tables.embeddings(s, dir), threshold = 0.3, bits = 2,
        dim = Some(EmbeddingDim)),
      Some(s"""WITH $embPairsCtes
              |SELECT id_a, id_b, cosine FROM epairs""".stripMargin)),

    // SEMANTIC dup clusters (SemDeDup shape): connected components
    // over the p12 embedding-cosine near-dup pairs — groups of
    // semantically near-identical vectors under one representative,
    // the embedding-space counterpart of the p28 text clusters. Same
    // engine operator (Clusters.connectedComponents), same
    // recursive-reachability oracle, driven by the shared p12 pair
    // CTE chain.
    QueryDef("p30_semantic_clusters",
      (s, dir) => {
        val cc = Clusters.connectedComponents(
          Similarity.embeddingNearDups(Tables.embeddings(s, dir),
            threshold = 0.3, bits = 2, dim = Some(EmbeddingDim)),
          aCol = "id_a", bCol = "id_b")
        cc.join(cc.groupBy("cluster_id").agg(count(lit(1)).as("n_members")),
            Seq("cluster_id"))
          .select(col("doc_id").as("vec_id"), col("cluster_id"), col("n_members"))
      },
      Some(s"""WITH RECURSIVE $embPairsCtes,
              |edges AS (SELECT id_a AS src, id_b AS dst FROM epairs
              |          UNION SELECT id_b, id_a FROM epairs),
              |reach AS (SELECT src AS node, dst AS r FROM edges
              |          UNION
              |          SELECT e2.src, rc.r FROM edges e2 JOIN reach rc ON rc.node = e2.dst),
              |lbl AS (SELECT node AS vec_id, least(node, min(r)) AS cluster_id
              |        FROM reach GROUP BY node)
              |SELECT vec_id, cluster_id, n_members
              |FROM lbl JOIN (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members
              |               FROM lbl GROUP BY cluster_id) USING (cluster_id)""".stripMargin)),

    // Composed curation pipeline — the operators as a user would chain
    // them: quality-score filter -> exact dedup -> language ID ->
    // per-language corpus stats. Hash-checked end-to-end (aggregates
    // kept integral: doubles summed across engine-specific orders
    // would not be).
    QueryDef("p15_curation_pipeline",
      (s, dir) => {
        val scored = TextAnalysis.qualityFeatures(Tables.documents(s, dir))
          .where(col("quality_score") >= 0.5)
        val deduped = Dedup.dropExactDuplicates(scored)
        TextAnalysis.langId(deduped)
          .groupBy(col("predicted_lang"), col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("total_tokens"),
            max(col("quality_score")).as("max_quality"))
      },
      Some(s"""WITH f AS (SELECT *, $qualityColsSql FROM documents),
              |scored AS (SELECT *, $qualityScoreSql AS quality_score FROM f),
              |kept AS (SELECT * FROM scored WHERE quality_score >= 0.5),
              |deduped AS (
              |  SELECT * FROM (SELECT *, row_number() OVER (
              |                   PARTITION BY md5(text) ORDER BY doc_id) AS rn
              |                 FROM kept) WHERE rn = 1),
              |langs AS (SELECT *, $langHitsSql FROM deduped)
              |SELECT $langCaseSql,
              |       source,
              |       count(*) AS n_docs,
              |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
              |       max(quality_score) AS max_quality
              |FROM langs GROUP BY 1, 2""".stripMargin)),

    // Token counting, whitespace baseline + BPE-ish pretokenizer —
    // the corpus "token budget" estimators. The pretokenizer pattern
    // is lookahead-free so Java regex (Spark) and RE2 (DuckDB) match
    // identically; '' doubles the SQL-quoted apostrophe.
    QueryDef("p16_token_counts",
      (s, dir) => Tables.documents(s, dir).select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_ws_tokens"),
        TextAnalysis.bpeTokenCount(col("text")).as("n_bpe_tokens")),
      Some(s"""SELECT doc_id,
              |       CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
              |                            t -> t <> '')) AS BIGINT)
              |         AS n_ws_tokens,
              |       CAST(len(regexp_extract_all(text,
              |         '${TextAnalysis.BpeTokenPattern.replace("'", "''")}'))
              |         AS BIGINT) AS n_bpe_tokens
              |FROM documents""".stripMargin)),

    // REAL BPE token counts: merges trained on the corpus (driver
    // loop over the distributed pretoken histogram), applied to the
    // distinct-pretoken set, joined back — next to the pretoken lower
    // bound. The vocab table (pretoken -> token count) is written to
    // a fixed path by the query itself and the oracle joins the SAME
    // parquet, so DuckDB independently re-derives every document's
    // count from its own pretokenization (pretokenizer parity is
    // itself oracle-proven by p16); BpeSpec verifies the merge
    // application against an independent min-rank implementation.
    QueryDef("p16b_bpe_token_counts",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val merges = Bpe.trainMerges(docs, numMerges = 64)
        // one vocab derivation: materialize, then count against the
        // read-back artifact (the exact table the oracle joins)
        Bpe.writeVocab(Bpe.corpusVocab(docs, merges), bpeVocabPath)
        Bpe.tokenCounts(docs, merges, vocab = Some(s.read.parquet(bpeVocabPath)))
      },
      Some(s"""WITH pt AS (SELECT doc_id,
              |              unnest(regexp_extract_all(text,
              |                '${TextAnalysis.BpeTokenPattern.replace("'", "''")}')) AS pt
              |            FROM documents),
              |v AS (SELECT * FROM '$bpeVocabPath/*.parquet'),
              |c AS (SELECT doc_id, CAST(sum(v.n_tokens) AS BIGINT) AS n_bpe_real
              |      FROM pt JOIN v USING (pt) GROUP BY doc_id)
              |SELECT d.doc_id,
              |       CAST(len(regexp_extract_all(d.text,
              |         '${TextAnalysis.BpeTokenPattern.replace("'", "''")}'))
              |         AS BIGINT) AS n_pretokens,
              |       coalesce(c.n_bpe_real, 0) AS n_bpe_real
              |FROM documents d LEFT JOIN c USING (doc_id)""".stripMargin)),

    // Winnowed rolling-hash fingerprints (Rabin-Karp over code
    // points, min per 4-window band, distinct). The oracle recomputes
    // each window hash as the direct 8-term polynomial — bit-equal to
    // the Scala rolling form because mod is ring-homomorphic — and
    // mirrors the banding with 1-based inclusive list slices.
    QueryDef("p17_winnowed_fingerprints",
      (s, dir) => TextAnalysis.winnowedFingerprints(
        Tables.documents(s, dir), window = 8, band = 4),
      Some("""WITH h AS (
             |  SELECT doc_id,
             |    list_transform(range(1, greatest(length(text) - 8 + 2, 1)),
             |      i -> (CAST(unicode(substr(text, CAST(i AS INT), 1)) AS BIGINT) * 27512614111
             |          + CAST(unicode(substr(text, CAST(i+1 AS INT), 1)) AS BIGINT) * 887503681
             |          + CAST(unicode(substr(text, CAST(i+2 AS INT), 1)) AS BIGINT) * 28629151
             |          + CAST(unicode(substr(text, CAST(i+3 AS INT), 1)) AS BIGINT) * 923521
             |          + CAST(unicode(substr(text, CAST(i+4 AS INT), 1)) AS BIGINT) * 29791
             |          + CAST(unicode(substr(text, CAST(i+5 AS INT), 1)) AS BIGINT) * 961
             |          + CAST(unicode(substr(text, CAST(i+6 AS INT), 1)) AS BIGINT) * 31
             |          + CAST(unicode(substr(text, CAST(i+7 AS INT), 1)) AS BIGINT)) % 1000000007) AS hs
             |  FROM documents),
             |w AS (
             |  SELECT doc_id, unnest(list_transform(range(0, (len(hs)+3)//4),
             |    b -> list_min(hs[CAST(b*4+1 AS INT):CAST(b*4+4 AS INT)]))) AS fp
             |  FROM h)
             |SELECT DISTINCT doc_id, fp FROM w""".stripMargin)),

    // Deterministic stratified sampling (corpus mixture weighting):
    // keep iff u(doc) < per-language threshold, u = 32 md5 bits of
    // the length-prefixed (len(key) ++ ':' ++ key ++ '/' ++ salt)
    // encoding — a pure row function, so the kept set is
    // engine-reproducible and the oracle recomputes it exactly.
    QueryDef("p18_stratified_sample",
      (s, dir) => Sampling.stratified(
        Tables.documents(s, dir), "lang",
        Map("en" -> 0.5, "zh" -> 1.0), defaultFraction = 0.2,
        keyCol = "doc_id", salt = "mix")
        .select("doc_id", "lang"),
      Some("""SELECT doc_id, lang FROM documents
             |WHERE ('0x' || substr(md5(
             |          CAST(length(CAST(doc_id AS VARCHAR)) AS VARCHAR)
             |          || ':' || CAST(doc_id AS VARCHAR) || '/mix'), 1, 8))::BIGINT
             |        / 4294967296.0
             |      < CASE WHEN lang = 'en' THEN 0.5
             |             WHEN lang = 'zh' THEN 1.0
             |             ELSE 0.2 END""".stripMargin)),

    // Temperature-based corpus mixing (multilingual-pretraining
    // rebalance): per-language keep fractions DERIVED from corpus
    // shares, f_lang = sqrt(cnt_min / cnt_lang) at alpha = 0.5 —
    // unlike p18 where the mix is given. sqrt + division are
    // correctly-rounded IEEE ops, so the derived thresholds (and the
    // md5 variates) compare identically in both engines: a full hash
    // gate on DERIVED fractions.
    QueryDef("p44_temperature_mix",
      (s, dir) => Sampling.temperatureMix(
        Tables.documents(s, dir), stratumCol = "lang", alpha = 0.5,
        keyCol = "doc_id", salt = "temp")
        .select("doc_id", "lang"),
      Some("""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS cnt
             |           FROM documents GROUP BY lang),
             |m AS (SELECT min(cnt) AS mn FROM c),
             |f AS (SELECT lang, sqrt(CAST(mn AS DOUBLE) / cnt) AS keep_f
             |      FROM c CROSS JOIN m),
             |u AS (SELECT doc_id, lang,
             |        ('0x' || substr(md5(
             |           CAST(length(CAST(doc_id AS VARCHAR)) AS VARCHAR)
             |           || ':' || CAST(doc_id AS VARCHAR) || '/temp'), 1, 8))::BIGINT
             |         / 4294967296.0 AS u
             |      FROM documents)
             |SELECT u.doc_id, u.lang
             |FROM u JOIN f USING (lang) WHERE u.u < f.keep_f""".stripMargin)),

    // Quality-percentile gate: keep documents at or above the exact
    // corpus-wide P75 quality score — the "train on the top quartile"
    // filter. The threshold is the DISCRETE exact quantile (a score
    // that occurs, integer rank arithmetic — g09's engine), so the
    // kept set is engine-exact, not approximate.
    QueryDef("p45_quality_percentile_filter",
      (s, dir) => graft.operators.Medians.filterAtOrAboveQuantile(
        TextAnalysis.qualityFeatures(Tables.documents(s, dir))
          .select(col("doc_id"), col("quality_score")),
        valueCol = "quality_score", num = 3, den = 4),
      Some(s"""WITH f AS (SELECT doc_id, $qualityColsSql FROM documents),
              |q AS (SELECT doc_id, $qualityScoreSql AS quality_score FROM f),
              |pg AS (SELECT quality_score AS v, CAST(count(*) AS BIGINT) AS c
              |       FROM q WHERE quality_score IS NOT NULL GROUP BY 1),
              |r AS (SELECT v, c, sum(c) OVER (ORDER BY v) AS cum,
              |             sum(c) OVER () AS n
              |      FROM pg),
              |t AS (SELECT max(CASE WHEN cum - c <= ((n-1) * 3) // 4
              |                       AND cum - 1 >= ((n-1) * 3) // 4
              |                      THEN v END) AS thr FROM r)
              |SELECT q.doc_id, q.quality_score
              |FROM q, t WHERE q.quality_score >= t.thr""".stripMargin)),

    // Unigram-LM quality proxy: per-doc avg token log-probability
    // under the corpus's own unigram distribution. Doubles compare
    // through the harness's 6-dp rounding (ln is libm-rounded; the
    // effect is ~1e-12 — see the operator's determinism note).
    QueryDef("p46_unigram_logprob",
      (s, dir) => TextAnalysis.unigramLogProb(Tables.documents(s, dir)),
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(list_filter(
             |           string_split_regex(trim(text), '\s+'),
             |           t -> t <> '')) AS term
             |  FROM documents),
             |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
             |       FROM toks GROUP BY 1, 2),
             |vocab AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cnt
             |          FROM tf GROUP BY 1),
             |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM vocab)
             |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
             |       sum(tf * ln(CAST(cnt AS DOUBLE) / n)) / sum(tf)
             |         AS avg_logprob
             |FROM tf JOIN vocab USING (term) CROSS JOIN tot
             |GROUP BY doc_id""".stripMargin)),

    // Interpolated bigram-LM scoring (the CCNet-style LM filter's
    // score): per-doc avg ln of 0.75*bigram + 0.25*unigram, first
    // token unigram-only. lambda = 0.75 is binary-exact (see the
    // operator doc); ln + per-doc float sums ride p46's 6-dp-rounding
    // determinism note. The oracle rebuilds tokens WITH positions
    // (prev = w[i-1]), both count tables, the pinned-order mixture
    // arithmetic and the average in SQL.
    QueryDef("p73_bigram_logprob",
      (s, dir) => TextAnalysis.bigramLogProb(Tables.documents(s, dir)),
      Some(bigramLogProbOracleSql)),

    // Fixed-size deterministic reservoir: EXACTLY k rows per stratum
    // (the k smallest md5 variates; fraction sampling can't build
    // fixed-size eval sets). Oracle re-ranks the same variates in SQL.
    QueryDef("p40_fixed_sample",
      (s, dir) => Sampling.fixedSizeStratified(
        Tables.documents(s, dir), stratumCol = "source", k = 15,
        keyCol = "doc_id", salt = "eval")
        .select("doc_id", "source"),
      Some("""WITH u AS (SELECT doc_id, source,
             |  ('0x' || substr(md5(
             |     CAST(length(CAST(doc_id AS VARCHAR)) AS VARCHAR)
             |     || ':' || CAST(doc_id AS VARCHAR) || '/eval'), 1, 8))::BIGINT
             |   / 4294967296.0 AS u
             |  FROM documents),
             |r AS (SELECT *, row_number() OVER (
             |        PARTITION BY source ORDER BY u, doc_id) AS rn
             |      FROM u)
             |SELECT doc_id, source FROM r WHERE rn <= 15""".stripMargin)),

    // Single-pass column profiling: nulls + KMV distinct sketch +
    // exact distinct for every column in one scan. The oracle
    // re-derives each column's profile (union of per-column blocks,
    // same md5-60bit hash family + estimator arithmetic as p34).
    QueryDef("p42_profile",
      (s, dir) => graft.operators.Profiling.profile(
        Tables.documents(s, dir),
        columns = Seq("doc_id", "text", "lang", "source", "n_chars"),
        k = 128),
      Some {
        val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
        cols.map { c =>
          s"""SELECT '$c' AS "column",
             |  (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_rows,
             |  (SELECT CAST(count(*) AS BIGINT) FROM documents
             |    WHERE $c IS NULL) AS n_nulls,
             |  (WITH h AS (SELECT DISTINCT
             |          ('0x' || substr(md5(CAST($c AS VARCHAR)), 1, 15))::BIGINT AS h
             |        FROM documents WHERE $c IS NOT NULL),
             |    r AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM h),
             |    a AS (SELECT CAST(count(*) AS BIGINT) AS ex,
             |                 max(CASE WHEN rn <= 128 THEN h END) AS kth
             |          FROM r)
             |    SELECT CASE WHEN ex < 128 THEN CAST(ex AS DOUBLE)
             |                ELSE CAST(127 AS DOUBLE) * 1152921504606846976
             |                       / CAST(kth AS DOUBLE) END FROM a)
             |    AS distinct_est,
             |  (SELECT CAST(count(DISTINCT $c) AS BIGINT) FROM documents)
             |    AS distinct_exact""".stripMargin
        }.mkString("\nUNION ALL\n")
      }),

    // Native expression through the SQL surface: vec_dot registered
    // via SparkSessionExtensions / runtime registry (Engine.configure),
    // hash-checked against DuckDB's DOUBLE[] dot product.
    QueryDef("p14_sql_vec_dot",
      (s, dir) => {
        // defensive, like Tables.eventsRaw's conf set: the driver may
        // hand over a session that skipped Engine.configure
        graft.functions.GraftFunctions.register(s)
        Tables.embeddings(s, dir).createOrReplaceTempView("graft_embeddings")
        s.sql("""SELECT vec_id, vec_dot(embedding, embedding) AS norm2
                |FROM graft_embeddings""".stripMargin)
      },
      Some("""SELECT vec_id,
             |       list_dot_product(CAST(embedding AS DOUBLE[]),
             |                        CAST(embedding AS DOUBLE[])) AS norm2
             |FROM embeddings""".stripMargin)),

    // ---- multimodal plumbing over a media view of documents
    // (payload = UTF-8 bytes of text — an opaque binary column with
    // the same schema/partitioning a real image/audio corpus has).

    // Typed metadata derived in-scan from the binary payload.
    QueryDef("mm01_media_metadata",
      (s, dir) => Multimodal.withMetadata(mediaFromDocuments(s, dir))
        .select(col("media_id"), col("meta.size_bytes").as("size_bytes"),
          col("meta.checksum").as("checksum"), col("meta.source").as("source")),
      Some("""SELECT doc_id AS media_id,
             |       CAST(octet_length(encode(text)) AS BIGINT) AS size_bytes,
             |       md5(text) AS checksum,
             |       source
             |FROM documents""".stripMargin)),

    // Per-partition decode through the stub codec seam. The stub
    // derives its fake dims from md5(payload) hex nibbles precisely so
    // this oracle can recompute them in SQL (nibble = hex digit via
    // substr+ascii; md5 hex is lowercase, so 'a'..'f' -> ascii-87).
    QueryDef("mm02_decode_features",
      (s, dir) => Multimodal.decodeFeatures(
        mediaFromDocuments(s, dir), Multimodal.StubDecoder).toDF()
        .select("media_id", "width", "height", "n_frames"),
      Some("""WITH m AS (SELECT doc_id AS media_id, md5(text) AS h,
             |                  octet_length(encode(text)) AS len
             |           FROM documents),
             |n AS (SELECT media_id, len,
             |             CASE WHEN substr(h,1,1) BETWEEN '0' AND '9'
             |                  THEN ascii(substr(h,1,1))-48 ELSE ascii(substr(h,1,1))-87 END AS n0,
             |             CASE WHEN substr(h,2,1) BETWEEN '0' AND '9'
             |                  THEN ascii(substr(h,2,1))-48 ELSE ascii(substr(h,2,1))-87 END AS n1,
             |             CASE WHEN substr(h,3,1) BETWEEN '0' AND '9'
             |                  THEN ascii(substr(h,3,1))-48 ELSE ascii(substr(h,3,1))-87 END AS n2,
             |             CASE WHEN substr(h,4,1) BETWEEN '0' AND '9'
             |                  THEN ascii(substr(h,4,1))-48 ELSE ascii(substr(h,4,1))-87 END AS n3
             |      FROM m)
             |SELECT media_id,
             |       CAST(16 + n0*16 + n1 AS INTEGER) AS width,
             |       CAST(16 + n2*16 + n3 AS INTEGER) AS height,
             |       CAST(1 + len % 16 AS INTEGER) AS n_frames
             |FROM n""".stripMargin)),

    // Resize seam: per-partition batch transform; dims + resized
    // payload length and checksum are all exactly oracle-able (the
    // stub's "resized" bytes are a deterministic prefix slice).
    QueryDef("mm04_resize",
      (s, dir) => {
        import org.apache.spark.sql.functions.{col, length, md5}
        Multimodal.resizeStub(mediaFromDocuments(s, dir), targetW = 16, targetH = 16)
          .toDF()
          .select(col("media_id"), col("width"), col("height"),
            length(col("payload")).cast("long").as("payload_len"),
            md5(col("payload")).as("payload_md5"))
      },
      Some("""SELECT doc_id AS media_id,
             |       CAST(16 AS INTEGER) AS width,
             |       CAST(16 AS INTEGER) AS height,
             |       CAST(octet_length(encode(substr(text, 1, 256))) AS BIGINT)
             |         AS payload_len,
             |       md5(substr(text, 1, 256)) AS payload_md5
             |FROM documents""".stripMargin)),

    // REAL codec through the decode seam: driver-generated synthetic
    // PNGs (deterministic pixel formulas of doc_id) are decoded by the
    // javax.imageio path on executors; dims + exact integer channel
    // sums hash-match an oracle that recomputes the same pixels from
    // (doc_id, w, h) arithmetic alone. PNG is lossless, so the decoded
    // pixels ARE the formula's — this gate fails if the codec, the
    // RGB unpacking, or the sum accumulation is wrong.
    QueryDef("mm05_real_decode",
      (s, dir) => Multimodal.decodeFeatures(
        syntheticPngMedia(s, dir), Multimodal.ImageIoDecoder).toDF()
        .select(col("media_id"), col("width"), col("height"), col("n_frames"),
          element_at(col("feature"), 1).cast("long").as("sum_r"),
          element_at(col("feature"), 2).cast("long").as("sum_g"),
          element_at(col("feature"), 3).cast("long").as("sum_b")),
      Some(s"""WITH dims AS (SELECT doc_id, 8 + doc_id % 8 AS w, 8 + doc_id % 5 AS h
              |              FROM documents),
              |px AS (
              |  SELECT doc_id, w, h, gx.x AS x, gy.y AS y
              |  FROM dims
              |  CROSS JOIN (SELECT unnest(range(16)) AS x) gx
              |  CROSS JOIN (SELECT unnest(range(16)) AS y) gy
              |  WHERE gx.x < w AND gy.y < h)
              |SELECT doc_id AS media_id,
              |       CAST(w AS INTEGER) AS width,
              |       CAST(h AS INTEGER) AS height,
              |       CAST(1 AS INTEGER) AS n_frames,
              |       CAST(sum((doc_id*7 + x*3 + y*5) % 256) AS BIGINT) AS sum_r,
              |       CAST(sum((doc_id*11 + x + y*2) % 256) AS BIGINT) AS sum_g,
              |       CAST(sum((doc_id*13 + x*2 + y) % 256) AS BIGINT) AS sum_b
              |FROM px GROUP BY doc_id, w, h""".stripMargin)),

    // REAL resize round trip: decode -> nearest-neighbor resample
    // (integer mapping sx = x*w/W) -> PNG re-encode -> re-DECODE. The
    // oracle recomputes the resampled pixels' channel sums from
    // arithmetic; a hash match proves the full codec round trip, not
    // just metadata.
    QueryDef("mm06_real_resize",
      (s, dir) => Multimodal.decodeFeatures(
        Multimodal.resizeImage(syntheticPngMedia(s, dir),
          targetW = 12, targetH = 12).toDF(),
        Multimodal.ImageIoDecoder).toDF()
        .select(col("media_id"), col("width"), col("height"),
          element_at(col("feature"), 1).cast("long").as("sum_r"),
          element_at(col("feature"), 2).cast("long").as("sum_g"),
          element_at(col("feature"), 3).cast("long").as("sum_b")),
      Some(s"""WITH dims AS (SELECT doc_id, 8 + doc_id % 8 AS w, 8 + doc_id % 5 AS h
              |              FROM documents),
              |spx AS (
              |  SELECT doc_id,
              |         (gx.x * w) // 12 AS sx, (gy.y * h) // 12 AS sy
              |  FROM dims
              |  CROSS JOIN (SELECT unnest(range(12)) AS x) gx
              |  CROSS JOIN (SELECT unnest(range(12)) AS y) gy)
              |SELECT doc_id AS media_id,
              |       CAST(12 AS INTEGER) AS width,
              |       CAST(12 AS INTEGER) AS height,
              |       CAST(sum((doc_id*7 + sx*3 + sy*5) % 256) AS BIGINT) AS sum_r,
              |       CAST(sum((doc_id*11 + sx + sy*2) % 256) AS BIGINT) AS sum_g,
              |       CAST(sum((doc_id*13 + sx*2 + sy) % 256) AS BIGINT) AS sum_b
              |FROM spx GROUP BY doc_id""".stripMargin)),

    // The LOSSY branch of the javax.imageio seam: JPEG fixtures
    // (engine-generated on executors) encoded and re-DECODED through
    // the same ImageIoDecoder as mm05/mm06. What a lossy codec
    // preserves exactly — decoded dimensions and frame count — is
    // hash-oracled for every doc; n_frames = 1 everywhere also proves
    // no payload hit the quarantine path (a decoder that only
    // sniffed headers, or a broken JPEG writer, fails here). Pixel
    // values do NOT survive JPEG; their channel sums are spec-gated
    // within a lossy tolerance (MultimodalSpec), the honest contract
    // for lossy media in a corpus.
    QueryDef("mm07_jpeg_decode",
      (s, dir) => Multimodal.decodeFeatures(
        syntheticJpegMedia(s, dir), Multimodal.ImageIoDecoder).toDF()
        .select(col("media_id"), col("width"), col("height"),
          col("n_frames")),
      Some("""SELECT doc_id AS media_id,
             |       CAST(8 + doc_id % 8 AS INTEGER) AS width,
             |       CAST(8 + doc_id % 5 AS INTEGER) AS height,
             |       CAST(1 AS INTEGER) AS n_frames
             |FROM documents""".stripMargin)),

    // REAL JPEG resize through the lossy codec end-to-end: JPEG
    // fixture decoded, nearest-neighbor resampled, re-encoded JPEG,
    // re-DECODED. The oracle pins everything a lossy codec preserves
    // EXACTLY — output geometry (12x12 for every doc) and
    // n_frames = 1 (no payload hit the quarantine path anywhere in
    // decode -> resample -> encode -> decode). Channel sums do not
    // survive two lossy trips bit-exactly; their bounded-drift
    // contract is spec-pinned (MultimodalSpec), mirroring the
    // mm07 contract one codec pass deeper.
    QueryDef("mm08_jpeg_resize",
      (s, dir) => Multimodal.decodeFeatures(
        Multimodal.resizeImage(syntheticJpegMedia(s, dir),
          targetW = 12, targetH = 12, format = "jpg").toDF(),
        Multimodal.ImageIoDecoder).toDF()
        .select(col("media_id"), col("width"), col("height"),
          col("n_frames")),
      Some("""SELECT doc_id AS media_id,
             |       CAST(12 AS INTEGER) AS width,
             |       CAST(12 AS INTEGER) AS height,
             |       CAST(1 AS INTEGER) AS n_frames
             |FROM documents""".stripMargin)),

    // Content-level image dedup THROUGH the codec seam: 50 pattern
    // classes, each encoded as a MIX of PNG and BMP (different bytes,
    // identical decoded pixels) — byte-level md5 finds nothing; the
    // engine must decode and hash PIXELS to recover the classes. The
    // oracle knows the planted partition (class = doc_id % 50, rep =
    // the class's minimal id = the class index itself for 0-based
    // ids) without being able to decode — the right oracle shape for
    // an opaque-payload operator.
    QueryDef("mm09_pixel_dedup",
      (s, dir) => Multimodal.dedupByPixelHash(
        syntheticCrossFormatMedia(s, dir)),
      Some("""SELECT doc_id AS media_id,
             |       CAST(doc_id % 50 AS BIGINT) AS group_rep
             |FROM documents""".stripMargin)),

    // AUDIO through the opaque-binary contract: REAL RIFF/PCM bytes
    // parsed executor-side (chunk walk, not fixed offsets), each
    // payload reduced to 5 exact-integer statistics — the oracle
    // recomputes every sample from the generator formula and must
    // agree to the last bit (audio's analog of the mm05 PNG sums).
    QueryDef("mm11_audio_features",
      (s, dir) => {
        import s.implicits._
        val media = Tables.documents(s, dir).select(col("doc_id")).as[Long]
          .mapPartitions(ids => ids.map(id =>
            (id, Multimodal.syntheticWav(id))))
          .toDF("media_id", "payload")
        Multimodal.decodeAudioFeatures(media).toDF()
      },
      Some("""WITH n AS (SELECT doc_id,
             |              CAST(400 + doc_id % 100 AS BIGINT) AS ns
             |           FROM documents),
             |s AS (SELECT doc_id, ns,
             |             ((doc_id*31 + i*17) % 65536) - 32768 AS v
             |      FROM (SELECT doc_id, ns, unnest(range(ns)) AS i FROM n))
             |SELECT doc_id AS media_id, ns AS n_samples,
             |       CAST(8000 AS INTEGER) AS sample_rate,
             |       CAST(ns * 1000 // 8000 AS BIGINT) AS duration_ms,
             |       CAST(max(abs(v)) AS BIGINT) AS peak_abs,
             |       CAST(sum(v*v) AS BIGINT) AS sum_squares
             |FROM s GROUP BY doc_id, ns""".stripMargin)),

    // Composed media curation (the multimodal p93): decode ->
    // content dedup -> resize with a per-stage yield report. One
    // decode pass serves stages 2-3; resize decodes only survivors
    // (dedup BEFORE the expensive pass — the composition order is
    // the operator). Oracle: every count and pixel volume closed-form
    // in doc_id (50 planted classes, 144 px per resized survivor).
    QueryDef("mm13_media_pipeline",
      (s, dir) => Multimodal.mediaCurationReport(
        crossFormatMediaForStreaming(s, dir), targetW = 12, targetH = 12),
      Some("""WITH px AS (SELECT doc_id,
             |              (8 + (doc_id % 50) % 8) * (8 + (doc_id % 50) % 5) AS p
             |            FROM documents),
             |cls AS (SELECT DISTINCT doc_id % 50 AS c,
             |              (8 + (doc_id % 50) % 8) * (8 + (doc_id % 50) % 5) AS p
             |        FROM documents)
             |SELECT 1 AS stage_order, 'raw' AS stage,
             |       CAST(count(*) AS BIGINT) AS n_media,
             |       CAST(NULL AS BIGINT) AS n_pixels FROM documents
             |UNION ALL SELECT 2, 'decoded', CAST(count(*) AS BIGINT),
             |       CAST(sum(p) AS BIGINT) FROM px
             |UNION ALL SELECT 3, 'content_deduped', CAST(count(*) AS BIGINT),
             |       CAST(sum(p) AS BIGINT) FROM cls
             |UNION ALL SELECT 4, 'resized', CAST(count(*) AS BIGINT),
             |       CAST(count(*) * 144 AS BIGINT) FROM cls""".stripMargin)),

    // MJPEG-shaped frame container: [int32-LE len][JPEG frame]*
    // records exploded in-scan, every frame decoded through the real
    // codec — video as "container seam + the image operators". JPEG
    // preserves geometry exactly, so the oracle pins every frame's
    // decoded dims from the seed; the composite id (media*4 + frame,
    // k <= 4) threads frame identity through the single-id decoder.
    QueryDef("mm14_frame_decode",
      (s, dir) => {
        import s.implicits._
        val media = Tables.documents(s, dir).select(col("doc_id")).as[Long]
          .mapPartitions(ids => ids.map(id =>
            (id, Multimodal.syntheticFrameContainer(id))))
          .toDF("media_id", "payload")
        val frames = Multimodal.extractFrames(media).toDF()
          .select((col("media_id") * 4 + col("frame_idx")).as("media_id"),
            col("frame_payload").as("payload"))
        Multimodal.decodeFeatures(frames, Multimodal.ImageIoDecoder).toDF()
          .select(expr("media_id div 4").cast("long").as("media_id"),
            (col("media_id") % 4).cast("int").as("frame_idx"),
            col("width"), col("height"))
      },
      Some("""WITH f AS (SELECT doc_id, unnest(range(2 + doc_id % 3)) AS j
             |           FROM documents)
             |SELECT doc_id AS media_id, CAST(j AS INT) AS frame_idx,
             |       CAST(8 + (doc_id + j) % 8 AS INTEGER) AS width,
             |       CAST(8 + (doc_id + j) % 5 AS INTEGER) AS height
             |FROM f""".stripMargin)),

    // Image–text PAIR curation (the LAION/CLIP-filter shape): real
    // decoded dims vs the caption's claimed WxH (the deterministic
    // stand-in for the CLIP-score threshold — the model seam),
    // caption token-count quality, content dedup among survivors.
    // Planted defects: ids % 5 claim one-off dims (misaligned), ids
    // % 7 get a 1-token caption (junk alt-text); classes ≡ 0 mod 5
    // lose EVERY member to alignment (all ids ≡ cls mod 50 share
    // cls's divisibility by 5), so the no-survivor branch of the
    // keeper join lives in the gate. Oracle: every verdict closed-
    // form in doc_id.
    QueryDef("mm15_pair_curation",
      (s, dir) => {
        val media = crossFormatMediaForStreaming(s, dir)
        val cls = col("media_id") % 50
        val w = (lit(8) + cls % 8).cast("int")
        val h = (lit(8) + cls % 5).cast("int")
        val claimW = when(col("media_id") % 5 === 0, w + 1).otherwise(w)
        val dims = concat(claimW.cast("string"), lit("x"), h.cast("string"))
        val pairs = media.select(col("media_id").as("pair_id"),
          col("payload"),
          when(col("media_id") % 7 === 0, dims)
            .otherwise(concat(lit("a photo of class "),
              cls.cast("string"), lit(" size "), dims)).as("caption"))
        Multimodal.pairCuration(pairs, minCaptionTokens = 3)
      },
      Some("""WITH p AS (SELECT doc_id AS pair_id, doc_id % 50 AS cls,
             |                  8 + (doc_id % 50) % 8 AS w,
             |                  8 + (doc_id % 50) % 5 AS h,
             |                  (doc_id % 5 <> 0) AS aligned,
             |                  (doc_id % 7 <> 0) AS cap_ok
             |           FROM documents),
             |k AS (SELECT cls, min(pair_id) AS rep FROM p
             |      WHERE aligned AND cap_ok GROUP BY cls)
             |SELECT p.pair_id, CAST(p.w AS INTEGER) AS width,
             |       CAST(p.h AS INTEGER) AS height,
             |       CAST(CASE WHEN p.cap_ok THEN 7 ELSE 1 END AS BIGINT)
             |         AS n_tokens,
             |       p.aligned, p.cap_ok AS caption_ok,
             |       COALESCE(p.aligned AND p.cap_ok AND p.pair_id = k.rep,
             |                false) AS kept
             |FROM p LEFT JOIN k ON k.cls = p.cls""".stripMargin)),

    // Silence/energy segmentation (the VAD preprocessing a speech
    // pipeline runs): real WAV bytes with planted zero-sample
    // regions, fixed 80-sample windows, exact BIGINT energies,
    // consecutive same-class windows merged in the scan task. The
    // oracle recomputes every sample from the generator formula and
    // rebuilds the segments with a gaps-and-islands window — a
    // structurally different merge that must agree row-for-row.
    // Regions (120) deliberately misalign with windows (80), and
    // n % 80 != 0 for most docs — boundary and partial-window paths
    // live in the gate, not just the spec.
    QueryDef("mm12_audio_segments",
      (s, dir) => {
        import s.implicits._
        val media = Tables.documents(s, dir).select(col("doc_id")).as[Long]
          .mapPartitions(ids => ids.map(id =>
            (id, Multimodal.syntheticSpeechWav(id))))
          .toDF("media_id", "payload")
        Multimodal.audioSegments(media).toDF()
      },
      Some("""WITH n AS (SELECT doc_id,
             |              CAST(960 + (doc_id % 7) * 120 AS BIGINT) AS ns
             |           FROM documents),
             |smp AS (SELECT doc_id, ns, i,
             |          CASE WHEN (doc_id + (i // 120)) % 3 = 0 THEN 0
             |               ELSE ((doc_id*31 + i*17) % 65536) - 32768
             |          END AS v
             |        FROM (SELECT doc_id, ns, unnest(range(ns)) AS i FROM n)),
             |win AS (SELECT doc_id, ns, i // 80 AS w, sum(v*v) AS energy
             |        FROM smp GROUP BY doc_id, ns, i // 80),
             |fl AS (SELECT doc_id, ns, w, energy,
             |              (energy < 1000) AS silent FROM win),
             |isl AS (SELECT *, w - row_number() OVER (
             |                 PARTITION BY doc_id, silent ORDER BY w) AS g
             |        FROM fl),
             |seg AS (SELECT doc_id, ns, silent, min(w) AS w0, max(w) AS w1,
             |               CAST(count(*) AS BIGINT) AS n_windows,
             |               CAST(sum(energy) AS BIGINT) AS energy
             |        FROM isl GROUP BY doc_id, ns, silent, g)
             |SELECT doc_id AS media_id,
             |       CAST(row_number() OVER (PARTITION BY doc_id
             |              ORDER BY w0) AS INT) AS seg_idx,
             |       silent,
             |       CAST(w0 * 80 * 1000 // 8000 AS BIGINT) AS start_ms,
             |       CAST(least((w1 + 1) * 80, ns) * 1000 // 8000 AS BIGINT)
             |         AS end_ms,
             |       n_windows, energy
             |FROM seg""".stripMargin)),

    // Perceptual near-dup PAIRS: dHash signatures through the real
    // codec, candidates from the 4x16-bit chunk banding (the p09
    // SimHash machinery generalized to any 64-bit fingerprint —
    // never C(n,2)). Fixture: 50 block-pattern classes (the
    // structured fixture; gradient patterns degenerate to one dHash)
    // mixing PNG/BMP containers — within-class pairs land at hamming
    // 0, distinct md5-seeded classes ~24 bits apart, so the planted
    // partition IS the expected pair set and the oracle knows it
    // from doc_id alone.
    QueryDef("mm10_perceptual_neardups",
      (s, dir) => graft.pipeline.Dedup.hammingNearDups(
        Multimodal.pixelSignatures(syntheticBlockMedia(s, dir)).toDF()
          .where(col("width") > 0)
          .select(col("media_id"), col("dhash")),
        maxHamming = 3, sigCol = "dhash", idCol = "media_id")
        .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"),
          col("hamming")),
      Some("""SELECT a.doc_id AS media_a, b.doc_id AS media_b,
             |       CAST(0 AS INTEGER) AS hamming
             |FROM documents a JOIN documents b
             |  ON a.doc_id % 50 = b.doc_id % 50 AND a.doc_id < b.doc_id""".stripMargin)),

    // Frame sampling: byte-range explode — the frame COUNT and LENGTH
    // math is oracle-checkable even though payload slicing is opaque.
    QueryDef("mm03_frame_sampling",
      (s, dir) => Multimodal.sampleFrames(mediaFromDocuments(s, dir), everyNBytes = 64)
        .select(col("media_id"), col("frame_no"),
          length(col("frame_bytes")).as("frame_len")),
      Some("""WITH m AS (SELECT doc_id AS media_id,
             |                  octet_length(encode(text)) AS len
             |           FROM documents)
             |SELECT media_id, CAST(frame_no AS INTEGER) AS frame_no,
             |       CAST(least(64, len - frame_no * 64) AS INTEGER) AS frame_len
             |FROM (SELECT media_id, len,
             |             unnest(range(0, greatest((len - 1) // 64, 0) + 1)) AS frame_no
             |      FROM m)""".stripMargin)),

    // KMV distinct-count sketch (native bounded-k aggregate): per
    // source, the 128 smallest distinct 60-bit token hashes + the
    // cardinality estimate, NEXT TO the exact distinct count — the
    // gate pins sketch contents, estimator arithmetic, and ground
    // truth in one row. The oracle re-derives the sketch as sorted
    // distinct + row_number (the shuffle-everything plan the native
    // aggregate exists to avoid) and the estimate with the same
    // exact-product / correctly-rounded-division float path.
    QueryDef("p34_kmv_distinct",
      (s, dir) => {
        val k = 128
        Tables.documents(s, dir)
          .select(col("source"),
            explode(TextAnalysis.tokens(col("text"))).as("tok"))
          .select(col("source"),
            graft.functions.Md5Hash.h60(col("tok")).as("h"))
          .groupBy(col("source"))
          .agg(
            graft.functions.SketchFunctions.kminValues(col("h"), k)
              .as("sketch"),
            count_distinct(col("h")).as("exact_distinct"))
          .select(
            col("source"),
            lit(k.toLong).as("k_used"),
            size(col("sketch")).cast("long").as("sketch_size"),
            when(size(col("sketch")) > 0,
              element_at(col("sketch"), size(col("sketch")))).as("kth_min"),
            graft.functions.SketchFunctions.kmvEstimate(col("sketch"), k)
              .as("est_distinct"),
            col("exact_distinct"))
      },
      Some("""WITH toks AS (
             |  SELECT source,
             |         unnest(list_filter(string_split_regex(trim(text), '\s+'),
             |                            t -> t <> '')) AS tok
             |  FROM documents),
             |h AS (SELECT DISTINCT source,
             |             ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
             |      FROM toks),
             |r AS (SELECT source, h,
             |             row_number() OVER (PARTITION BY source ORDER BY h) AS rn
             |      FROM h),
             |agg AS (SELECT source,
             |               CAST(count(*) AS BIGINT) AS exact_distinct,
             |               CAST(sum(CASE WHEN rn <= 128 THEN 1 ELSE 0 END)
             |                    AS BIGINT) AS sketch_size,
             |               max(CASE WHEN rn <= 128 THEN h END) AS kth_min
             |        FROM r GROUP BY source)
             |SELECT source, CAST(128 AS BIGINT) AS k_used, sketch_size, kth_min,
             |       CASE WHEN exact_distinct < 128
             |            THEN CAST(exact_distinct AS DOUBLE)
             |            ELSE CAST(127 AS DOUBLE) * 1152921504606846976
             |                   / CAST(kth_min AS DOUBLE) END AS est_distinct,
             |       exact_distinct
             |FROM agg""".stripMargin)),

    // KMV sketch MERGEABILITY, driver-visible: sketch the even-id and
    // odd-id halves of each source INDEPENDENTLY, merge with kmvUnion,
    // and the result must hash-equal the sketch the full corpus would
    // have produced — the property that lets 100 TB pipelines maintain
    // per-partition/per-day sketch artifacts and combine them at read
    // time instead of re-scanning. The oracle computes the FULL-corpus
    // sketch only; any merge defect (lost value, wrong k-bound, order)
    // breaks the hash.
    QueryDef("p54_sketch_merge",
      (s, dir) => {
        import graft.functions.SketchFunctions._
        val k = 128
        val hashed = Tables.documents(s, dir)
          .select(col("source"), col("doc_id"),
            explode(TextAnalysis.tokens(col("text"))).as("tok"))
          .select(col("source"), col("doc_id"),
            graft.functions.Md5Hash.h60(col("tok")).as("h"))
        def half(parity: Int) = hashed.where(col("doc_id") % 2 === parity)
          .groupBy(col("source"))
          .agg(kminValues(col("h"), k).as(s"sk$parity"))
        half(0).join(half(1), Seq("source"), "full_outer")
          .select(col("source"),
            kmvUnion(
              coalesce(col("sk0"), array().cast("array<bigint>")),
              coalesce(col("sk1"), array().cast("array<bigint>")),
              k).as("sketch"))
          .select(col("source"),
            size(col("sketch")).cast("long").as("sketch_size"),
            when(size(col("sketch")) > 0,
              element_at(col("sketch"), size(col("sketch")))).as("kth_min"),
            md5(concat_ws(",", col("sketch"))).as("sketch_md5"),
            kmvEstimate(col("sketch"), k).as("est_distinct"))
      },
      Some("""WITH toks AS (
             |  SELECT source,
             |         unnest(list_filter(string_split_regex(trim(text), '\s+'),
             |                            t -> t <> '')) AS tok
             |  FROM documents),
             |h AS (SELECT DISTINCT source,
             |             ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
             |      FROM toks),
             |r AS (SELECT source, h,
             |             row_number() OVER (PARTITION BY source ORDER BY h) AS rn
             |      FROM h),
             |sk AS (SELECT source,
             |              CAST(count(*) AS BIGINT) AS sketch_size,
             |              max(h) AS kth_min,
             |              md5(string_agg(CAST(h AS VARCHAR), ',' ORDER BY h)) AS sketch_md5
             |       FROM r WHERE rn <= 128 GROUP BY source)
             |SELECT source, sketch_size, kth_min, sketch_md5,
             |       CASE WHEN sketch_size < 128
             |            THEN CAST(sketch_size AS DOUBLE)
             |            ELSE CAST(127 AS DOUBLE) * 1152921504606846976
             |                   / CAST(kth_min AS DOUBLE) END AS est_distinct
             |FROM sk""".stripMargin)),

    // KMV set-operation estimates: pairwise corpus overlap between
    // sources from their k=128 sketches — union sketch (the KMV merge
    // property), Jaccard estimate (fraction of the union sample in
    // both sides), intersection estimate — NEXT TO the exact pairwise
    // Jaccard (the shuffle-both-corpora ground-truth path the sketch
    // replaces at 100 TB: sketches are O(sources x k), exact is a
    // token-grain self-join). The 5x5 crossJoin is group-grain
    // (bounded by source count), not row-grain.
    QueryDef("p47_kmv_overlap",
      (s, dir) => {
        import graft.functions.SketchFunctions._
        val k = 128
        val hashed = Tables.documents(s, dir)
          .select(col("source"),
            explode(TextAnalysis.tokens(col("text"))).as("tok"))
          .select(col("source"), graft.functions.Md5Hash.h60(col("tok")).as("h"))
        val sk = hashed.groupBy(col("source"))
          .agg(kminValues(col("h"), k).as("sketch"),
            count_distinct(col("h")).as("nd"))
        val a = sk.select(col("source").as("source_a"),
          col("sketch").as("sa"), col("nd").as("na"))
        val b = sk.select(col("source").as("source_b"),
          col("sketch").as("sb"), col("nd").as("nb"))
        val dist = hashed.distinct()
        val inter = dist.as("x")
          .join(dist.as("y"),
            col("x.h") === col("y.h") && col("x.source") < col("y.source"))
          .groupBy(col("x.source").as("source_a"),
            col("y.source").as("source_b"))
          .agg(count(lit(1)).as("ni"))
        a.crossJoin(broadcast(b)).where(col("source_a") < col("source_b"))
          .join(inter, Seq("source_a", "source_b"), "left")
          .select(col("source_a"), col("source_b"),
            kmvJaccard(col("sa"), col("sb"), k).as("jaccard_est"),
            kmvEstimate(kmvUnion(col("sa"), col("sb"), k), k).as("union_est"),
            col("na"), col("nb"), coalesce(col("ni"), lit(0L)).as("ni"))
          .select(col("source_a"), col("source_b"),
            col("jaccard_est"), col("union_est"),
            (col("jaccard_est") * col("union_est")).as("intersection_est"),
            (col("ni").cast("double") /
              (col("na") + col("nb") - col("ni"))).as("jaccard_exact"))
      },
      Some("""WITH toks AS (
             |  SELECT source,
             |         unnest(list_filter(string_split_regex(trim(text), '\s+'),
             |                            t -> t <> '')) AS tok
             |  FROM documents),
             |d AS (SELECT DISTINCT source,
             |             ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
             |      FROM toks),
             |r AS (SELECT source, h,
             |             row_number() OVER (PARTITION BY source ORDER BY h) AS rn
             |      FROM d),
             |sk AS (SELECT source, h FROM r WHERE rn <= 128),
             |cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS nd FROM d GROUP BY 1),
             |pairs AS (SELECT a.source AS source_a, b.source AS source_b,
             |                 a.nd AS na, b.nd AS nb
             |          FROM cnt a JOIN cnt b ON a.source < b.source),
             |uall AS (SELECT p.source_a, p.source_b, s.h
             |         FROM pairs p JOIN sk s
             |           ON s.source IN (p.source_a, p.source_b)
             |         GROUP BY 1, 2, 3),
             |usk AS (SELECT source_a, source_b, h,
             |               row_number() OVER (
             |                 PARTITION BY source_a, source_b ORDER BY h) AS rn
             |        FROM uall),
             |agree AS (SELECT u.source_a, u.source_b,
             |                 CAST(count(*) AS BIGINT) AS usize,
             |                 CAST(count(CASE WHEN sa.h IS NOT NULL
             |                                  AND sb.h IS NOT NULL
             |                                 THEN 1 END) AS BIGINT) AS both_cnt,
             |                 max(CASE WHEN u.rn = 128 THEN u.h END) AS kth
             |          FROM usk u
             |          LEFT JOIN sk sa ON sa.source = u.source_a AND sa.h = u.h
             |          LEFT JOIN sk sb ON sb.source = u.source_b AND sb.h = u.h
             |          WHERE u.rn <= 128
             |          GROUP BY 1, 2),
             |inter AS (SELECT x.source AS source_a, y.source AS source_b,
             |                 CAST(count(*) AS BIGINT) AS ni
             |          FROM d x JOIN d y ON x.h = y.h AND x.source < y.source
             |          GROUP BY 1, 2),
             |est AS (SELECT p.source_a, p.source_b,
             |               CAST(both_cnt AS DOUBLE) / usize AS jaccard_est,
             |               CASE WHEN usize < 128 THEN CAST(usize AS DOUBLE)
             |                    ELSE CAST(127 AS DOUBLE) * 1152921504606846976
             |                           / CAST(kth AS DOUBLE) END AS union_est,
             |               na, nb, coalesce(ni, 0) AS ni
             |        FROM pairs p
             |        JOIN agree USING (source_a, source_b)
             |        LEFT JOIN inter USING (source_a, source_b))
             |SELECT source_a, source_b, jaccard_est, union_est,
             |       jaccard_est * union_est AS intersection_est,
             |       CAST(ni AS DOUBLE) / (na + nb - ni) AS jaccard_exact
             |FROM est""".stripMargin)),

    // Count-Min heavy hitters: one fixed 4x16 counter grid (width deliberately NARROW — the 31-term sf0.01 vocab must collide, so the error path is exercised) over the
    // corpus token stream (the native `count_min` aggregate — map-side
    // partials are the grid, the exchange never carries the term
    // histogram), probed for the top-100 exact terms NEXT TO their
    // exact counts. `overcount = est - exact` is the sketch's
    // collision error, >= 0 by construction (CMS never
    // underestimates). Grid, probes, and min are pure integer
    // arithmetic on md5-derived 60-bit hashes (Kirsch-Mitzenmacher
    // rows: (h_lo30 + i * h_hi30) mod width) — the oracle rebuilds
    // the identical grid in SQL and hash-matches end-to-end, which
    // Spark's own opaque `count_min_sketch` binary cannot offer.
    QueryDef("p48_cms_heavy_hitters",
      (s, dir) => {
        import graft.functions.SketchFunctions.{cmEstimate, countMin}
        val depth = 4
        val width = 16
        val hashed = Tables.documents(s, dir)
          .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
          .select(col("tok"), graft.functions.Md5Hash.h60(col("tok")).as("h"))
        val grid = hashed.agg(countMin(col("h"), depth, width).as("sketch"))
        val top = hashed.groupBy(col("tok"), col("h"))
          .agg(count(lit(1)).as("exact_cnt"))
          .orderBy(col("exact_cnt").desc, col("tok").asc)
          .limit(100)
        top.crossJoin(broadcast(grid))
          .select(col("tok").as("term"), col("exact_cnt"),
            cmEstimate(col("sketch"), col("h"), depth, width).as("est_cnt"))
          .withColumn("overcount", col("est_cnt") - col("exact_cnt"))
      },
      Some("""WITH toks AS (
             |  SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
             |                            t -> t <> '')) AS tok
             |  FROM documents),
             |h AS (SELECT tok,
             |             ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
             |      FROM toks),
             |parts AS (SELECT tok, h, h & 1073741823 AS h1, h >> 30 AS h2 FROM h),
             |grid AS (SELECT d.i, (h1 + d.i * h2) % 16 AS b,
             |                CAST(count(*) AS BIGINT) AS c
             |         FROM parts CROSS JOIN (SELECT unnest(range(4)) AS i) d
             |         GROUP BY 1, 2),
             |top AS (SELECT tok AS term, h1, h2,
             |               CAST(count(*) AS BIGINT) AS exact_cnt
             |        FROM parts GROUP BY 1, 2, 3
             |        ORDER BY exact_cnt DESC, term LIMIT 100),
             |est AS (SELECT t.term, t.exact_cnt, min(g.c) AS est_cnt
             |        FROM top t
             |        CROSS JOIN (SELECT unnest(range(4)) AS i) d
             |        JOIN grid g ON g.i = d.i
             |                   AND g.b = (t.h1 + d.i * t.h2) % 16
             |        GROUP BY 1, 2)
             |SELECT term, exact_cnt, est_cnt,
             |       est_cnt - exact_cnt AS overcount
             |FROM est""".stripMargin)),

    // Leakage-safe train/test split: near-duplicates never straddle
    // the held-out boundary — the split variate is keyed by the
    // near-dup CLUSTER id (whole cluster moves atomically), by the
    // doc's own id for unclustered docs. Oracle recomputes the full
    // chain in SQL: MinHash pairs -> recursive-CTE connected
    // components (p28's formulation) -> md5 split variate on the
    // cluster-or-self key (p18's encoding). Full hash gate — every
    // doc's assignment must match, so a single cluster member drawing
    // its own variate would fail the gate.
    QueryDef("p49_leakage_safe_split",
      (s, dir) => Clusters.leakageSafeSplit(
        Tables.documents(s, dir), threshold = 0.8,
        testFraction = 0.25, salt = "held")
        .select("doc_id", "split_key", "split"),
      Some(s"""WITH RECURSIVE $minhashPairsCtes,
              |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
              |          UNION SELECT doc_b, doc_a FROM pairs),
              |reach AS (SELECT src AS node, dst AS r FROM edges
              |          UNION
              |          SELECT e.src, rc.r FROM edges e JOIN reach rc ON rc.node = e.dst),
              |lbl AS (SELECT node AS doc_id, least(node, min(r)) AS cluster_id
              |        FROM reach GROUP BY node),
              |k AS (SELECT d.doc_id,
              |             coalesce(l.cluster_id, d.doc_id) AS split_key
              |      FROM documents d LEFT JOIN lbl l ON l.doc_id = d.doc_id)
              |SELECT doc_id, split_key,
              |       CASE WHEN ('0x' || substr(md5(
              |                CAST(length(CAST(split_key AS VARCHAR)) AS VARCHAR)
              |                || ':' || CAST(split_key AS VARCHAR) || '/held'), 1, 8))::BIGINT
              |              / 4294967296.0 < 0.25
              |            THEN 'test' ELSE 'train' END AS split
              |FROM k""".stripMargin)),

    // Corpus snapshot diff — dataset versioning: v1 = 3/4 of the
    // corpus, v2 = an overlapping 3/4 with every (id % 6 == 1) text
    // edited, so all four statuses materialize (added / removed /
    // changed / unchanged). The engine diffs via id-grain content
    // hashes (text never crosses the join exchange); the oracle
    // full-outer-joins the raw texts — hash-equality == text-equality
    // modulo md5 collisions, so the gate also guards the injective
    // encoding (a concat collision would misreport 'unchanged').
    QueryDef("p52_snapshot_diff",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        val v1 = docs.where(col("doc_id") % 4 =!= 3)
        val v2 = docs.where(col("doc_id") % 4 =!= 0)
          .withColumn("text",
            when(col("doc_id") % 6 === 1, concat(col("text"), lit(" edited")))
              .otherwise(col("text")))
        Snapshots.diff(v1, v2)
      },
      Some("""WITH v1 AS (SELECT doc_id, text FROM documents WHERE doc_id % 4 <> 3),
             |v2 AS (SELECT doc_id,
             |              CASE WHEN doc_id % 6 = 1 THEN text || ' edited'
             |                   ELSE text END AS text
             |       FROM documents WHERE doc_id % 4 <> 0)
             |SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
             |       CASE WHEN a.doc_id IS NULL THEN 'added'
             |            WHEN b.doc_id IS NULL THEN 'removed'
             |            WHEN a.text <> b.text THEN 'changed'
             |            ELSE 'unchanged' END AS status
             |FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id""".stripMargin)),

    // Delta-scoped incremental dedup — the p52 + p19 composition that
    // closes the versioning loop: diff the two snapshots, index ONLY
    // the unchanged corpus (materialized LSH band/shingle tables),
    // and dedup ONLY the added/changed delta against that index. At
    // 100 TB this is the difference between re-shingling the corpus
    // per crawl and paying for the delta; the statuses come from the
    // same id-grain hash diff p52 gates. Oracle recomputes the whole
    // chain: diff statuses -> shingles over v2 -> MinHash bands ->
    // cross-STATUS candidates (new side = added/changed, old side =
    // unchanged) -> exact-Jaccard verification.
    QueryDef("p53_delta_dedup",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        val v1 = docs.where(col("doc_id") % 4 =!= 3)
        val v2 = docs.where(col("doc_id") % 4 =!= 0)
          .withColumn("text",
            when(col("doc_id") % 6 === 1, concat(col("text"), lit(" edited")))
              .otherwise(col("text")))
        val st = Snapshots.diff(v1, v2)
        val unchanged = v2.join(
          st.where(col("status") === "unchanged").select("doc_id"), Seq("doc_id"))
        val delta = v2.join(
          st.where(col("status").isin("added", "changed")).select("doc_id"),
          Seq("doc_id"))
        Dedup.writeLshIndex(unchanged, deltaIndexPath)
        Dedup.nearDupsAgainstIndex(delta, deltaIndexPath, threshold = 0.8)
      },
      Some("""WITH v1 AS (SELECT doc_id, text FROM documents WHERE doc_id % 4 <> 3),
             |v2 AS (SELECT doc_id,
             |              CASE WHEN doc_id % 6 = 1 THEN text || ' edited'
             |                   ELSE text END AS text
             |       FROM documents WHERE doc_id % 4 <> 0),
             |st AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
             |              CASE WHEN a.doc_id IS NULL THEN 'added'
             |                   WHEN b.doc_id IS NULL THEN 'removed'
             |                   WHEN a.text <> b.text THEN 'changed'
             |                   ELSE 'unchanged' END AS status
             |       FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id),
             |tkv AS (SELECT doc_id,
             |               list_filter(string_split_regex(trim(text), '\s+'),
             |                           t -> t <> '') AS w
             |        FROM v2),
             |shv AS (SELECT DISTINCT doc_id, shingle FROM (
             |          SELECT doc_id,
             |                 unnest(list_transform(range(1, len(w) - 1),
             |                        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
             |          FROM tkv)),
             |hv AS (SELECT doc_id,
             |              ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS ha,
             |              ('0x' || substr(md5(shingle), 9, 8))::BIGINT AS hb
             |       FROM shv),
             |mh AS (SELECT doc_id, i, min(ha + i * hb) AS mv
             |       FROM hv CROSS JOIN (SELECT unnest(range(16)) AS i) idx
             |       GROUP BY doc_id, i),
             |bands AS (SELECT doc_id, i // 4 AS band,
             |                 md5(string_agg(CAST(mv AS VARCHAR), ',' ORDER BY i)) AS bucket
             |          FROM mh GROUP BY doc_id, i // 4),
             |cand AS (SELECT DISTINCT nw.doc_id AS doc_new, od.doc_id AS doc_old
             |         FROM bands nw
             |         JOIN st sn ON sn.doc_id = nw.doc_id
             |                   AND sn.status IN ('added', 'changed')
             |         JOIN bands od ON nw.band = od.band AND nw.bucket = od.bucket
             |         JOIN st so ON so.doc_id = od.doc_id
             |                   AND so.status = 'unchanged'),
             |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS set_size
             |          FROM shv GROUP BY doc_id),
             |common AS (SELECT c.doc_new, c.doc_old, CAST(count(*) AS BIGINT) AS common
             |           FROM cand c
             |           JOIN shv a ON a.doc_id = c.doc_new
             |           JOIN shv b ON b.doc_id = c.doc_old AND b.shingle = a.shingle
             |           GROUP BY c.doc_new, c.doc_old)
             |SELECT doc_new, doc_old,
             |       common / (sn.set_size + so.set_size - common) AS jaccard
             |FROM common
             |JOIN sizes sn ON sn.doc_id = doc_new
             |JOIN sizes so ON so.doc_id = doc_old
             |WHERE common / (sn.set_size + so.set_size - common) >= 0.8""".stripMargin)),

    // Per-document curation VERDICTS — the audit surface of the
    // filter chain: every doc gets a machine-readable keep/drop
    // reason, first matching rule wins (too_short -> repetitive ->
    // non_english -> low_quality -> keep; lang-ID precedes quality
    // because the stopword-based quality score is English-centric —
    // quality-first would misfile every foreign doc as low_quality).
    // Filters that only emit
    // survivors make drop rates uninspectable; production curation
    // reports WHY each doc fell. The repetition rule compares exact
    // integer 2-gram char counts cross-multiplied (dup*25 > total*3
    // == dup/total > 0.12, NO IEEE division anywhere in the rule);
    // quality and lang-id reuse the p04/p05 exact fragments; docs
    // with fewer than 2 tokens have no 2-grams and coalesce to
    // not-repetitive. Thresholds sit inside the corpus' actual
    // signal spread (p90 dup-2-gram fraction ~0.13), so 4 of the 5
    // branches fire at sf0.01 (keep/too_short/repetitive/
    // low_quality); non_english cannot fire on this corpus — its
    // synthetic vocabulary contains no language-marker words, every
    // doc's hits are all-zero, and the p05 tie-break lands on 'en'
    // (the branch is still hash-checked as always-false on both
    // engines).
    QueryDef("p51_curation_verdicts",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val scored = TextAnalysis.langId(TextAnalysis.qualityFeatures(docs))
        val g2 = docs.select(col("doc_id"),
            explode(graft.functions.NGramFunctions.wordNGrams(
              TextAnalysis.tokens(col("text")), 2)).as("gram"))
          .groupBy("doc_id", "gram").agg(count(lit(1)).as("cnt"))
          .groupBy("doc_id").agg(
            sum(col("cnt") * length(col("gram"))).as("tot2"),
            sum(when(col("cnt") >= 2, col("cnt") * length(col("gram")))
              .otherwise(0L)).as("dup2"))
        scored.join(g2, Seq("doc_id"), "left")
          .select(col("doc_id"),
            when(col("n_tokens") < 12, "too_short")
              .when(coalesce(col("dup2") * 25 > col("tot2") * 3,
                lit(false)), "repetitive")
              .when(col("predicted_lang") =!= "en", "non_english")
              .when(col("quality_score") < 0.5, "low_quality")
              .otherwise("keep").as("verdict"))
      },
      Some(s"""WITH f AS (SELECT *, $qualityColsSql FROM documents),
              |q AS (SELECT *, $qualityScoreSql AS quality_score FROM f),
              |langs AS (SELECT *, $langHitsSql FROM q),
              |pl AS (SELECT doc_id, n_tokens, quality_score, $langCaseSql
              |       FROM langs),
              |tk AS (SELECT doc_id,
              |              list_filter(string_split_regex(trim(text), '\\s+'),
              |                          x -> x <> '') AS w
              |       FROM documents),
              |g2 AS (SELECT doc_id, gram, count(*) AS cnt FROM (
              |         SELECT doc_id,
              |                unnest(list_transform(range(1, len(w)),
              |                       i -> w[i] || ' ' || w[i+1])) AS gram
              |         FROM tk)
              |       GROUP BY doc_id, gram),
              |d2 AS (SELECT doc_id,
              |              CAST(sum(cnt * length(gram)) AS BIGINT) AS tot2,
              |              CAST(sum(CASE WHEN cnt >= 2 THEN cnt * length(gram)
              |                            ELSE 0 END) AS BIGINT) AS dup2
              |       FROM g2 GROUP BY doc_id)
              |SELECT p.doc_id,
              |       CASE WHEN p.n_tokens < 12 THEN 'too_short'
              |            WHEN coalesce(d2.dup2 * 25 > d2.tot2 * 3, false)
              |              THEN 'repetitive'
              |            WHEN p.predicted_lang <> 'en' THEN 'non_english'
              |            WHEN p.quality_score < 0.5 THEN 'low_quality'
              |            ELSE 'keep' END AS verdict
              |FROM pl p LEFT JOIN d2 ON d2.doc_id = p.doc_id""".stripMargin)),

    // Token-budget-proportional sampling: keep probability
    // min(1, n_tokens * c) with c scaling the expected kept ROW
    // fraction to 30% — a kept row is ~a uniform draw over TOKENS
    // ("select ~30% of the corpus by content, not by doc count").
    // Fully deterministic: ΣW sums integer token counts through an
    // exact Decimal (order-independent), c is one pinned-order
    // double expression, the variate is the md5 contract — so the
    // oracle reproduces the kept SET, not a statistic of it.
    QueryDef("p50_token_weighted_sample",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"),
            size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
        Sampling.weightedByKey(docs, "n_tokens",
          targetFraction = 0.3, keyCol = "doc_id", salt = "tw")
      },
      Some("""WITH t AS (
             |  SELECT doc_id,
             |         CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
             |                              x -> x <> '')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |s AS (SELECT CAST(sum(CAST(n_tokens AS DECIMAL(38, 6))) AS DOUBLE) AS sw,
             |             CAST(count(n_tokens) AS BIGINT) AS n
             |      FROM t)
             |SELECT doc_id, n_tokens
             |FROM t CROSS JOIN s
             |WHERE ('0x' || substr(md5(
             |          CAST(length(CAST(doc_id AS VARCHAR)) AS VARCHAR)
             |          || ':' || CAST(doc_id AS VARCHAR) || '/tw'), 1, 8))::BIGINT
             |        / 4294967296.0
             |      < least(1.0, CAST(n_tokens AS DOUBLE) * ((0.3 * n) / sw))""".stripMargin)),

    // Rarity-weighted keyword extraction (TF-IDF shape, tf/df weight
    // — a single exact-integer IEEE division, deterministic where
    // ln(N/df) is not). Ties break by term ascending (binary
    // collation in both engines).
    QueryDef("p35_rarity_terms",
      (s, dir) => TextAnalysis.topRarityTerms(Tables.documents(s, dir), n = 5),
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |         unnest(list_filter(string_split_regex(trim(text), '\s+'),
             |                            t -> t <> '')) AS term
             |  FROM documents),
             |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
             |       FROM toks GROUP BY doc_id, term),
             |dfx AS (SELECT term, CAST(count(*) AS BIGINT) AS df
             |        FROM tf GROUP BY term),
             |sc AS (SELECT tf.doc_id, tf.term, tf.tf, dfx.df,
             |              CAST(tf.tf AS DOUBLE) / dfx.df AS score
             |       FROM tf JOIN dfx USING (term)),
             |r AS (SELECT *, row_number() OVER (
             |        PARTITION BY doc_id ORDER BY score DESC, term) AS rank
             |      FROM sc)
             |SELECT doc_id, term, tf, df, score, CAST(rank AS BIGINT) AS rank
             |FROM r WHERE rank <= 5""".stripMargin)),

    // Training-export shard writer: hash-shard the corpus, WRITE it
    // as shard-partitioned parquet, manifest the files by reading
    // them back (docs, tokens, id range, order-independent XOR
    // content checksum per shard). The oracle recomputes the manifest
    // from the RAW corpus — so the gate certifies the round trip
    // through the written files: a lost, duplicated or corrupted row
    // in any shard flips n_docs/xor_h60 and fails the hash match.
    QueryDef("p55_shard_export",
      (s, dir) => Packing.writeShards(
        Tables.documents(s, dir), nShards = 8, path = shardExportPath),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '/pack'), 1, 8))::BIGINT
             |           % 8 AS shard,
             |         CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
             |                              t -> t <> '')) AS BIGINT) AS n_tokens,
             |         ('0x' || substr(md5(text), 1, 15))::BIGINT AS h60
             |  FROM documents)
             |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             |       min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id,
             |       bit_xor(h60) AS xor_h60
             |FROM t GROUP BY shard""".stripMargin)),

    // JSONL training export: the same shard/manifest contract as p55
    // through the format loaders actually read — one JSON object per
    // line. The manifest derives ENTIRELY from the read-back files
    // (token counts + XOR content checksums recomputed from the
    // decoded text), so the hash match certifies the full JSON
    // escape/round-trip of every document, not just the writer's
    // intent; the oracle recomputes the manifest from the raw corpus.
    QueryDef("p96_jsonl_export",
      (s, dir) => Packing.writeJsonlShards(
        Tables.documents(s, dir), nShards = 8, path = jsonlExportPath),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '/pack'), 1, 8))::BIGINT
             |           % 8 AS shard,
             |         CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
             |                              t -> t <> '')) AS BIGINT) AS n_tokens,
             |         ('0x' || substr(md5(text), 1, 15))::BIGINT AS h60
             |  FROM documents)
             |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             |       min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id,
             |       bit_xor(h60) AS xor_h60
             |FROM t GROUP BY shard""".stripMargin)),

    // Snapshot token-distribution drift: p52's two corpus versions
    // compared as hashed-feature distributions — Jensen-Shannon
    // divergence + total-variation distance, the text-side twin of
    // p64's embedding drift guard (rising JS = the DSIR/classifier
    // bucket tables went stale, retrain). Oracle: both snapshots'
    // feature streams, the 256 smoothed bucket probabilities and the
    // identically-parenthesized JS/TV sums in SQL (ln rides the 6-dp
    // note; everything else is exact integers + single divisions).
    QueryDef("p97_token_drift",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        val v1 = docs.where(col("doc_id") % 4 =!= 3)
        val v2 = docs.where(col("doc_id") % 4 =!= 0)
          .withColumn("text",
            when(col("doc_id") % 6 === 1, concat(col("text"), lit(" edited")))
              .otherwise(col("text")))
        Snapshots.tokenDrift(v1, v2)
      },
      Some("""WITH v1 AS (SELECT doc_id, text FROM documents WHERE doc_id % 4 <> 3),
             |v2 AS (SELECT doc_id,
             |              CASE WHEN doc_id % 6 = 1 THEN text || ' edited'
             |                   ELSE text END AS text
             |       FROM documents WHERE doc_id % 4 <> 0),
             |a1 AS (SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
             |                                  t -> t <> '') AS w FROM v1),
             |a2 AS (SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
             |                                  t -> t <> '') AS w FROM v2),
             |f1 AS (SELECT unnest(w) AS ft FROM a1
             |       UNION ALL
             |       SELECT unnest(list_transform(range(1, len(w)),
             |              i -> w[i] || ' ' || w[i+1])) AS ft FROM a1),
             |f2 AS (SELECT unnest(w) AS ft FROM a2
             |       UNION ALL
             |       SELECT unnest(list_transform(range(1, len(w)),
             |              i -> w[i] || ' ' || w[i+1])) AS ft FROM a2),
             |c1 AS (SELECT ('0x' || substr(md5(ft), 1, 15))::BIGINT % 256 AS b,
             |              CAST(count(*) AS BIGINT) AS co
             |       FROM f1 GROUP BY 1),
             |c2 AS (SELECT ('0x' || substr(md5(ft), 1, 15))::BIGINT % 256 AS b,
             |              CAST(count(*) AS BIGINT) AS cc
             |       FROM f2 GROUP BY 1),
             |j AS (SELECT ids.b, COALESCE(c1.co, 0) AS co, COALESCE(c2.cc, 0) AS cc
             |      FROM (SELECT unnest(range(256)) AS b) ids
             |      LEFT JOIN c1 ON c1.b = ids.b
             |      LEFT JOIN c2 ON c2.b = ids.b),
             |tots AS (SELECT CAST(sum(co) AS BIGINT) AS toto,
             |                CAST(sum(cc) AS BIGINT) AS totc
             |         FROM j),
             |pq AS (SELECT co, cc,
             |              (co + 1)::DOUBLE / (toto + 256)::DOUBLE AS p,
             |              (cc + 1)::DOUBLE / (totc + 256)::DOUBLE AS q
             |       FROM j CROSS JOIN tots)
             |SELECT CAST(sum(co) AS BIGINT) AS n_old_feats,
             |       CAST(sum(cc) AS BIGINT) AS n_cur_feats,
             |       sum(p * ln(p / ((p + q) / 2.0))) / 2.0 +
             |         sum(q * ln(q / ((p + q) / 2.0))) / 2.0 AS js_divergence,
             |       sum(abs(p - q)) / 2.0 AS tv_distance
             |FROM pq""".stripMargin)),

    // Corpus data card: per-(source, lang) docs/tokens/chars and each
    // stratum's exact share of the corpus — the composition report a
    // training run ships with (and the auditable input to p44's
    // temperature mixing). Shares are single divisions of exact
    // integers, so the doubles hash-match across engines.
    QueryDef("p56_data_card",
      (s, dir) => Reporting.dataCard(Tables.documents(s, dir)),
      Some("""WITH strata AS (
             |  SELECT source, lang,
             |         CAST(count(*) AS BIGINT) AS n_docs,
             |         CAST(sum(len(list_filter(string_split_regex(trim(text), '\s+'),
             |                                  t -> t <> ''))) AS BIGINT) AS total_tokens,
             |         CAST(sum(n_chars) AS BIGINT) AS total_chars
             |  FROM documents GROUP BY source, lang),
             |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS corpus_docs,
             |               CAST(sum(total_tokens) AS BIGINT) AS corpus_tokens
             |        FROM strata)
             |SELECT source, lang, n_docs, total_tokens, total_chars,
             |       CAST(n_docs AS DOUBLE) / corpus_docs AS doc_share,
             |       CAST(total_tokens AS DOUBLE) / corpus_tokens AS token_share
             |FROM strata, tot""".stripMargin)),

    // ANN recall@10 evaluation: IVF (p13's md5-strided centroids)
    // scored against exact brute force for every 31st vector as a
    // query — per-query hit counts and recall, the harness that
    // justifies an nlist/nprobe choice. Both search paths run BATCHED
    // (one corpus pass each, per-query window ranks) — not Q point
    // lookups. The oracle replays assignment, per-query probe
    // selection (cosine DESC, cid DESC — the engine's tie-break),
    // both top-10s and the hit join, end-to-end in SQL.
    QueryDef("p57_ann_recall",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val centroids = Similarity.sampleCentroids(emb, nlist = 16)
        val queries = emb.where(col("vec_id") % 31 === 0)
          .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
        Similarity.ivfRecallAtK(emb, queries, centroids, k = 10, nprobe = 4)
      },
      Some(s"""WITH stride AS (SELECT greatest(count(*) // 16, 1) AS bkt
              |                FROM embeddings),
              |cent AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS c
              |         FROM embeddings, stride
              |         WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR) || '/ivf'), 1, 8))::BIGINT
              |               % bkt = 0
              |         ORDER BY vec_id LIMIT 16),
              |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              |qs AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 31 = 0),
              |assigned AS (
              |  SELECT vec_id, v, cid,
              |         row_number() OVER (PARTITION BY vec_id
              |           ORDER BY list_dot_product(v, c) / sqrt(list_dot_product(c, c)) DESC,
              |                    cid DESC) AS rn
              |  FROM e CROSS JOIN cent),
              |celled AS (SELECT vec_id, v, cid AS cell FROM assigned WHERE rn = 1),
              |probes AS (
              |  SELECT query_id, cid,
              |         row_number() OVER (PARTITION BY query_id
              |           ORDER BY ${cosineSql("c", "qv")} DESC, cid DESC) AS pr
              |  FROM cent CROSS JOIN qs),
              |ivf AS (
              |  SELECT q.query_id, d.vec_id,
              |         row_number() OVER (PARTITION BY q.query_id
              |           ORDER BY ${cosineSql("d.v", "q.qv")} DESC, d.vec_id ASC) AS rn
              |  FROM celled d
              |  JOIN probes p ON d.cell = p.cid AND p.pr <= 4
              |  JOIN qs q ON q.query_id = p.query_id
              |  WHERE d.vec_id <> q.query_id),
              |brute AS (
              |  SELECT q.query_id, e.vec_id,
              |         row_number() OVER (PARTITION BY q.query_id
              |           ORDER BY ${cosineSql("e.v", "q.qv")} DESC, e.vec_id ASC) AS rn
              |  FROM e CROSS JOIN qs q
              |  WHERE e.vec_id <> q.query_id)
              |SELECT b.query_id,
              |       CAST(count(i.vec_id) AS BIGINT) AS n_hits,
              |       CAST(count(i.vec_id) AS DOUBLE) / 10 AS recall
              |FROM brute b
              |LEFT JOIN (SELECT query_id, vec_id FROM ivf WHERE rn <= 10) i
              |       ON i.query_id = b.query_id AND i.vec_id = b.vec_id
              |WHERE b.rn <= 10
              |GROUP BY b.query_id""".stripMargin)),

    // Product-quantization ADC top-k: m=8 subspaces of the 64-dim
    // corpus, codebooks = slices of the p13 md5-strided sample,
    // candidate score = sum of 8 query-side table lookups (the
    // RAM-resident-index compression path: m bytes per vector).
    // The oracle replays subspace slicing, argmin-L2 code assignment
    // (via the argmax 2ab-b² form with the engine's cid DESC
    // tie-break), the ADC tables, and the LEFT-ASSOCIATED 8-term sum
    // (parenthesized identically, so the doubles are bit-equal) —
    // end-to-end in SQL.
    QueryDef("p58_pq_topk",
      (s, dir) => Quantization.pqTopK(
        Tables.embeddings(s, dir), queryId = 0L, k = 10, m = 8, ksub = 16),
      Some(s"""WITH $pqAdcCtesSql
              |SELECT vec_id, qscore FROM pqscore
              |ORDER BY qscore DESC, vec_id ASC
              |LIMIT 10""".stripMargin)),

    // ADC-shortlist -> EXACT rerank: the deployment shape the recall
    // curves justify (BASELINE round-11): PQ resolves only to code
    // granularity (whole clusters tie on identical codes — recall@10
    // floors near k/cluster-size), but its top-50 shortlist covers
    // the true top-10 at ~1.0, so reranking the 50 candidates with
    // exact cosine recovers full recall at 1/40th the float scoring.
    // Oracle: p58's ADC chain (shared fragment) shortlisted at 50,
    // reranked by the same cosineSql the brute-force gates pin.
    QueryDef("p112_pq_rerank",
      (s, dir) => Quantization.pqRerankTopK(
        Tables.embeddings(s, dir), queryId = 0L, k = 10, shortlist = 50,
        m = 8, ksub = 16),
      Some(s"""WITH $pqAdcCtesSql,
              |sl AS (SELECT vec_id FROM pqscore
              |       ORDER BY qscore DESC, vec_id ASC LIMIT 50)
              |SELECT e.vec_id, ${cosineSql("e.v", "q.qv")} AS cosine
              |FROM e JOIN sl USING (vec_id) CROSS JOIN q
              |ORDER BY cosine DESC, e.vec_id ASC
              |LIMIT 10""".stripMargin)),

    // C4-family line-rule cleaning (Raffel et al. 2020 §2.2) — line
    // SHAPE screens next to p23's repetition screens: keep lines
    // passing {min-words, no banned token, terminal pattern}, drop
    // pages on {banned phrase, too few sentences, nothing kept}.
    // ENTIRELY row-local (one projection, no explode/exchange — the
    // "filter at the scan" operator, PlanSpec-asserted). The fixture
    // text is single-line, so the gate splits pseudo-lines on the
    // literal token ' a ' (the p23 trick); terminal punct generalizes
    // to "ends in a letter", sentences to 'row' hits — rule MACHINERY
    // exercised with corpus-discriminating parameters (500 pages:
    // 18 banned-phrase, 164 sentence-fail, 300 dropped total).
    QueryDef("p113_c4_page_rules",
      (s, dir) => C4Clean.pageVerdicts(Tables.documents(s, dir),
        C4Clean.Config(lineSep = " a ", terminalPunct = Some("[a-z]$"),
          minWordsPerLine = 3, banLineTokens = Seq("vector"),
          banPagePhrases = Seq("table table"), minSentences = 1,
          minKeptLines = 1, sentencePattern = "row")),
      Some("""WITH pages AS (SELECT doc_id, text,
             |                      string_split(text, ' a ') AS lines
             |               FROM documents),
             |v AS (SELECT doc_id, text, len(lines) AS n_lines,
             |  list_filter(lines, l ->
             |      len(list_filter(string_split_regex(trim(l), '\s+'),
             |          t -> t <> '')) >= 3
             |      AND strpos(lower(l), 'vector') = 0
             |      AND regexp_matches(trim(l), '[a-z]$')) AS kept
             |  FROM pages),
             |-- array_to_string([]) is NULL in DuckDB; the engine's
             |-- array_join is '' — coalesce to the engine contract
             |w AS (SELECT *, coalesce(array_to_string(kept, chr(10)), '')
             |                  AS clean_text FROM v)
             |SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
             |       CAST(len(kept) AS BIGINT) AS n_kept,
             |       CAST(len(regexp_extract_all(clean_text, 'row')) AS BIGINT)
             |         AS n_sentences,
             |       (strpos(lower(text), 'table table') > 0
             |        OR len(regexp_extract_all(clean_text, 'row')) < 1
             |        OR len(kept) < 1) AS page_dropped,
             |       clean_text
             |FROM w""".stripMargin)),

    // IVF + PQ composed (the FAISS IVFPQ shape): probe the 4 nearest
    // of 16 cells, PQ-ADC-score ONLY the candidates inside them —
    // candidate-set and per-candidate cost cut at once. Cells and
    // codebooks share the md5-strided sample; scoring, association
    // order and every tie-break are p58's, so the oracle is p13's
    // probe CTEs fused with p58's code/ADC CTEs, restricted to the
    // probed candidates.
    QueryDef("p59_ivfpq_topk",
      (s, dir) => Quantization.ivfPqTopK(
        Tables.embeddings(s, dir), queryId = 0L, k = 10,
        nlist = 16, nprobe = 4, m = 8, ksub = 16),
      Some(s"""WITH $ivfPqAdcCtesSql
              |SELECT vec_id, qscore FROM ivfpqscore
              |ORDER BY qscore DESC, vec_id ASC
              |LIMIT 10""".stripMargin)),

    // The COMPLETE production serving shape (FAISS IVFPQ + refine):
    // probe 4/16 cells, ADC-score only their members, exact-rerank
    // the top-50 shortlist — each stage justified by a recall curve
    // (probing bounds candidates, ADC bounds per-candidate cost,
    // rerank restores full precision where code granularity ties).
    // Oracle: p59's probe+ADC chain (shared fragment) shortlisted at
    // 50, reranked by the same cosineSql as the brute-force gates.
    QueryDef("p114_ivfpq_rerank",
      (s, dir) => Quantization.ivfPqRerankTopK(
        Tables.embeddings(s, dir), queryId = 0L, k = 10, shortlist = 50,
        nlist = 16, nprobe = 4, m = 8, ksub = 16),
      Some(s"""WITH $ivfPqAdcCtesSql,
              |sl AS (SELECT vec_id FROM ivfpqscore
              |       ORDER BY qscore DESC, vec_id ASC LIMIT 50)
              |SELECT e.vec_id, ${cosineSql("e.v", "q.qv")} AS cosine
              |FROM e JOIN sl USING (vec_id) CROSS JOIN q
              |ORDER BY cosine DESC, e.vec_id ASC
              |LIMIT 10""".stripMargin)),

    // IVF + scalar quantization composed — completing the
    // {flat, PQ, int8} x IVF matrix (p13 / p59 / here): probe the 4
    // nearest of 16 cells, score ONLY those candidates by the exact
    // INTEGER dot of corpus-calibrated int8 codes. The oracle fuses
    // p13's probe CTEs with p26's quantization CTEs over the probed
    // candidate set; BIGINT scores make the ranking engine-exact.
    QueryDef("p67_ivf_quantized_topk",
      (s, dir) => Quantization.ivfQuantizedTopK(
        Tables.embeddings(s, dir), queryId = 0L, k = 10,
        nlist = 16, nprobe = 4),
      Some(s"""WITH stride AS (SELECT greatest(count(*) // 16, 1) AS bkt
              |                FROM embeddings),
              |cent AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS c
              |         FROM embeddings, stride
              |         WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR) || '/ivf'), 1, 8))::BIGINT
              |               % bkt = 0
              |         ORDER BY vec_id LIMIT 16),
              |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              |assigned AS (
              |  SELECT vec_id, v, cid,
              |         row_number() OVER (PARTITION BY vec_id
              |           ORDER BY list_dot_product(v, c) / sqrt(list_dot_product(c, c)) DESC,
              |                    cid DESC) AS rn
              |  FROM e CROSS JOIN cent),
              |celled AS (SELECT vec_id, cid AS cell FROM assigned WHERE rn = 1),
              |qx AS (SELECT v AS qv FROM e WHERE vec_id = 0),
              |probes AS (
              |  SELECT cid,
              |         row_number() OVER (ORDER BY
              |           ${cosineSql("c", "qx.qv")} DESC, cid DESC) AS pr
              |  FROM cent, qx),
              |cand AS (SELECT d.vec_id FROM celled d
              |         JOIN probes p ON d.cell = p.cid AND p.pr <= 4
              |         WHERE d.vec_id <> 0),
              |dims AS (SELECT r.d AS d,
              |           min(v[CAST(r.d AS INT)+1]) AS lo,
              |           max(v[CAST(r.d AS INT)+1]) AS hi
              |         FROM e, range($EmbeddingDim) r(d) GROUP BY r.d),
              |rng AS (SELECT list(lo ORDER BY d) AS los, list(hi ORDER BY d) AS his FROM dims),
              |codes AS (SELECT vec_id, list_transform(range($EmbeddingDim), d ->
              |        CASE WHEN his[CAST(d AS INT)+1] = los[CAST(d AS INT)+1] THEN 0
              |             ELSE CAST(least(greatest(floor((v[CAST(d AS INT)+1] - los[CAST(d AS INT)+1]) * 255.0
              |                    / (his[CAST(d AS INT)+1] - los[CAST(d AS INT)+1]) + 0.5), 0.0), 255.0) AS INT)
              |        END) AS qv
              |      FROM e, rng),
              |qq AS (SELECT qv AS query_qv FROM codes WHERE vec_id = 0)
              |SELECT c.vec_id,
              |       CAST(list_dot_product(list_transform(c.qv, x -> CAST(x AS DOUBLE)),
              |              list_transform(qq.query_qv, x -> CAST(x AS DOUBLE))) AS BIGINT) AS qscore
              |FROM codes c JOIN cand USING (vec_id), qq
              |ORDER BY qscore DESC, c.vec_id ASC
              |LIMIT 10""".stripMargin)),

    // Curriculum export order: quality tier (fixed thresholds — no
    // data-dependent quantile pass) descending, md5-shuffled within
    // tier, doc_id tiebreak to totality; every doc gets its GLOBAL
    // 1-based rank. The engine computes the rank WITHOUT a
    // single-partition window: range-repartitioned parallel sort +
    // per-partition offset zip (GlobalOrder.withGlobalRank) — rank
    // depends only on the total order, so the oracle's plain
    // row_number() OVER (ORDER BY ...) must hash-match it exactly.
    QueryDef("p60_curriculum_order",
      (s, dir) => {
        val scored = TextAnalysis.qualityFeatures(Tables.documents(s, dir))
          .select(col("doc_id"),
            least(floor(col("quality_score") * 4), lit(3.0)).cast("long").as("tier"),
            conv(substring(md5(concat(col("doc_id").cast("string"), lit("/cur"))),
              1, 8), 16, 10).cast("long").as("shuf"))
        graft.operators.GlobalOrder.withGlobalRank(scored, "rank",
          Seq(col("tier").desc, col("shuf").asc, col("doc_id").asc))
      },
      Some(s"""WITH f AS (SELECT doc_id, $qualityColsSql FROM documents),
              |q AS (SELECT doc_id, $qualityScoreSql AS qs FROM f),
              |t AS (SELECT doc_id,
              |             CAST(least(floor(qs * 4), 3) AS BIGINT) AS tier,
              |             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '/cur'), 1, 8))::BIGINT
              |               AS shuf
              |      FROM q)
              |SELECT doc_id, tier, shuf,
              |       CAST(row_number() OVER (ORDER BY tier DESC, shuf ASC, doc_id ASC)
              |            AS BIGINT) AS rank
              |FROM t""".stripMargin)),

    // Embedding drift report — dataset versioning for the vector
    // modality (the p52 snapshot-diff analog): same-id vectors from
    // two corpus versions joined, per-id cosine between the versions
    // — re-embedding QA ("which vectors moved after the encoder
    // update"). v2 simulates an encoder update by flipping one
    // dimension's sign for every odd id (cosine drops measurably) and
    // leaving even ids bit-identical (cosine 1). Per-row cosines only
    // — no cross-row double aggregation, so every value is
    // engine-exact.
    QueryDef("p64_embedding_drift",
      (s, dir) => {
        val v1 = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
        val v2 = v1.select(col("vec_id"),
          when(col("vec_id") % 2 === 1,
            transform(col("embedding"),
              (x, i) => when(i === 0, -x).otherwise(x)))
            .otherwise(col("embedding")).as("embedding"))
        v1.as("a").join(v2.as("b"), Seq("vec_id"))
          .select(col("vec_id"),
            Similarity.cosine(col("a.embedding"), col("b.embedding"))
              .as("cosine_v1_v2"))
      },
      Some(s"""WITH v1 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              |           FROM embeddings),
              |v2 AS (SELECT vec_id,
              |              CASE WHEN vec_id % 2 = 1
              |                   THEN list_prepend(-v[1], v[2:len(v)])
              |                   ELSE v END AS v
              |       FROM v1)
              |SELECT a.vec_id,
              |       ${cosineSql("a.v", "b.v")} AS cosine_v1_v2
              |FROM v1 a JOIN v2 b ON a.vec_id = b.vec_id""".stripMargin)),

    // Per-group top-k: each source's 3 highest-quality docs (quality
    // ties by doc_id) — the grouped-ranking shape users reach for
    // constantly; windows partition by GROUP (parallel across
    // sources), never a global sort.
    QueryDef("p65_per_source_topk",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source"))
          .orderBy(col("quality_score").desc, col("doc_id").asc)
        TextAnalysis.qualityFeatures(Tables.documents(s, dir))
          .select(col("source"), col("doc_id"), col("quality_score"))
          .withColumn("rank", row_number().over(w).cast("long"))
          .where(col("rank") <= 3)
      },
      Some(s"""WITH f AS (SELECT doc_id, source, $qualityColsSql FROM documents),
              |q AS (SELECT source, doc_id, $qualityScoreSql AS quality_score FROM f),
              |r AS (SELECT *, CAST(row_number() OVER (
              |        PARTITION BY source
              |        ORDER BY quality_score DESC, doc_id ASC) AS BIGINT) AS rank
              |      FROM q)
              |SELECT source, doc_id, quality_score, rank FROM r WHERE rank <= 3""".stripMargin)),

    // Batched sign-LSH search — the third member of the batched ANN
    // trio (p57 gates brute+IVF): every 31st vector as a query, each
    // probing its own bucket, one corpus bucketing pass serving the
    // whole batch. The oracle recomputes the literal hyperplane
    // buckets for corpus AND queries and the per-query rank.
    QueryDef("p66_lsh_batch_topk",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val queries = emb.where(col("vec_id") % 31 === 0)
          .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
        Similarity.lshSearchAll(emb, queries, k = 10, bits = 4,
          dim = Some(EmbeddingDim))
          .select(col("query_id"), col("vec_id"), col("cosine"),
            col("rank").cast("long").as("rank"))
      },
      Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              |           FROM embeddings),
              |b AS (SELECT vec_id, v,
              |        CASE WHEN len(v) = $EmbeddingDim THEN
              |            ${bucketSql("v", 4)}
              |        END AS bucket
              |      FROM e),
              |qs AS (SELECT vec_id AS query_id, v AS qv, bucket AS qb
              |       FROM b WHERE vec_id % 31 = 0 AND bucket IS NOT NULL),
              |r AS (SELECT q.query_id, b.vec_id,
              |             ${cosineSql("b.v", "q.qv")} AS cosine,
              |             row_number() OVER (PARTITION BY q.query_id
              |               ORDER BY ${cosineSql("b.v", "q.qv")} DESC,
              |                        b.vec_id ASC) AS rn
              |      FROM b JOIN qs q ON b.bucket = q.qb
              |      WHERE b.vec_id <> q.query_id AND b.bucket IS NOT NULL)
              |SELECT query_id, vec_id, cosine, CAST(rn AS BIGINT) AS rank
              |FROM r WHERE rn <= 10""".stripMargin)),

    // MinHash recall harness — the text twin of p57's ANN recall
    // eval: exact-Jaccard ground-truth pairs (p07's df-capped
    // inverted index) vs the banded MinHash+verify pairs (p08), with
    // the measured recall of the banding stage — the number that
    // justifies a (numHashes, bands) choice the way p57 justifies
    // nlist/nprobe. One summary row; both chains share the shingle
    // substrate. The RecallGateSpec proves the measurement machinery
    // catches injected recall bugs; this gate makes the measured
    // value driver-visible.
    QueryDef("p63_neardup_recall",
      (s, dir) => {
        // ONE shingle scan + cache feeds both chains (the
        // minHashNearDupsFromShingles seam exists for exactly this)
        val shingled = graft.operators.SessionCache.pin(
          Dedup.wordShingles(Tables.documents(s, dir), n = 3))
        val exact = Dedup.jaccardPairs(shingled, threshold = 0.8,
          maxShingleDf = 1000).select(col("doc_a"), col("doc_b"))
        val lsh = Dedup.minHashNearDupsFromShingles(shingled,
          threshold = 0.8, persistShingles = false)
          .select(col("doc_a"), col("doc_b"))
        val common = exact.join(lsh, Seq("doc_a", "doc_b"), "left_semi")
        exact.agg(count(lit(1)).as("n_exact"))
          .crossJoin(broadcast(lsh.agg(count(lit(1)).as("n_lsh"))))
          .crossJoin(broadcast(common.agg(count(lit(1)).as("n_common"))))
          .select(col("n_exact"), col("n_lsh"), col("n_common"),
            (col("n_common").cast("double") / col("n_exact")).as("recall"))
      },
      Some(s"""WITH $minhashPairsCtes,
              |sizes2 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS set_size
              |           FROM sh GROUP BY doc_id),
              |capped2 AS (SELECT s.* FROM sh s
              |            JOIN (SELECT shingle FROM sh
              |                  GROUP BY shingle HAVING count(*) <= 1000) c
              |            USING (shingle)),
              |common2 AS (
              |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |         CAST(count(*) AS BIGINT) AS common
              |  FROM capped2 a JOIN capped2 b
              |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              |  GROUP BY a.doc_id, b.doc_id),
              |ex AS (SELECT doc_a, doc_b FROM common2
              |       JOIN sizes2 sa ON sa.doc_id = doc_a
              |       JOIN sizes2 sb ON sb.doc_id = doc_b
              |       WHERE common / (sa.set_size + sb.set_size - common) >= 0.8),
              |lsh AS (SELECT doc_a, doc_b FROM pairs),
              |com AS (SELECT * FROM ex JOIN lsh USING (doc_a, doc_b))
              |SELECT CAST((SELECT count(*) FROM ex) AS BIGINT) AS n_exact,
              |       CAST((SELECT count(*) FROM lsh) AS BIGINT) AS n_lsh,
              |       CAST((SELECT count(*) FROM com) AS BIGINT) AS n_common,
              |       CAST((SELECT count(*) FROM com) AS DOUBLE)
              |         / (SELECT count(*) FROM ex) AS recall""".stripMargin)),

    // Composed export pipeline — curation to loader index in one
    // chain, the operators as a training-data team would run them:
    // quality filter -> exact dedup (keep min id per content hash) ->
    // sequence packing -> per-(shard, chunk) manifest. Also the gate
    // for chunkManifest itself (spec-only until now). The oracle
    // recomputes the whole chain from p45's quality CTE, p02's
    // keeper formulation and p21's packing arithmetic.
    QueryDef("p61_export_pipeline",
      (s, dir) => {
        val kept = TextAnalysis.qualityFeatures(Tables.documents(s, dir))
          .where(col("quality_score") >= 0.5)
          .select("doc_id", "text")
        val deduped = Dedup.dropExactDuplicates(kept)
        Packing.chunkManifest(
          Packing.packSequences(deduped, seqLen = 512, nShards = 4))
      },
      Some(s"""WITH f AS (SELECT doc_id, text, $qualityColsSql FROM documents),
              |q AS (SELECT doc_id, text, $qualityScoreSql AS qs FROM f),
              |kept AS (SELECT doc_id, text FROM q WHERE qs >= 0.5),
              |k AS (SELECT doc_id, text FROM kept
              |      WHERE doc_id IN (SELECT min(doc_id) FROM kept GROUP BY md5(text))),
              |t AS (SELECT doc_id,
              |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '/pack'), 1, 8))::BIGINT
              |           % 4 AS shard,
              |         CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
              |                              t -> t <> '')) AS BIGINT) AS n_tokens
              |       FROM k),
              |w AS (SELECT doc_id, shard, n_tokens,
              |             COALESCE(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
              |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tb
              |      FROM t)
              |SELECT shard, CAST(tb // 512 AS BIGINT) AS chunk_id,
              |       CAST(count(*) AS BIGINT) AS n_docs,
              |       CAST(sum(n_tokens) AS BIGINT) AS tokens_started,
              |       min(doc_id) AS first_doc_id
              |FROM w GROUP BY shard, CAST(tb // 512 AS BIGINT)""".stripMargin)),

    // Salted two-phase aggregation under a PLANTED hot key: ~70% of
    // documents collapse onto key 0 (the single-key skew AQE cannot
    // split — it re-splits partitions, not keys), aggregated via
    // Skew.saltedAgg's (key, salt) partial pass + natural-key combine.
    // All aggregates are integral (token counts), so the salted plan
    // is BIT-IDENTICAL to the plain group-by — which is exactly what
    // the oracle asserts: DuckDB computes the straight aggregate, and
    // any partial lost or double-counted across the two phases breaks
    // the hash. avg divides two exact BIGINTs (one double op, order
    // independent).
    QueryDef("p68_skewed_agg",
      (s, dir) => {
        val hot = Tables.documents(s, dir).select(
          when(pmod(col("doc_id"), lit(10)) < 7, lit(0L))
            .otherwise(pmod(col("doc_id"), lit(100))).as("key"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        graft.operators.Skew.saltedAgg(hot, Seq("key"), saltBuckets = 8,
          aggs = Map(
            "n_docs" -> (lit(1L), "count"),
            "total_tokens" -> (col("n_tokens"), "sum"),
            "min_tokens" -> (col("n_tokens"), "min"),
            "max_tokens" -> (col("n_tokens"), "max"),
            "avg_tokens" -> (col("n_tokens"), "avg")))
      },
      Some("""WITH toks AS (
             |  SELECT CASE WHEN doc_id % 10 < 7 THEN 0 ELSE doc_id % 100 END AS key,
             |         CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
             |                              t -> t <> '')) AS BIGINT) AS n_tokens
             |  FROM documents)
             |SELECT key,
             |       CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             |       min(n_tokens) AS min_tokens,
             |       max(n_tokens) AS max_tokens,
             |       CAST(sum(n_tokens) AS DOUBLE) / count(n_tokens) AS avg_tokens
             |FROM toks GROUP BY key""".stripMargin)),

    // SemDeDup end-to-end: cell-scoped semantic dedup with per-row
    // keep/drop verdicts (Similarity.semDedup — the pruning operator,
    // where p30 only labels groups). The oracle recomputes EVERYTHING
    // in SQL: md5-spread centroid sample, argmax-cosine cell
    // assignment (tie = larger cid, matching array_max), within-cell
    // pairs at cosine >= 0.3 under the hot-cell HAVING cap, recursive
    // min-label components, and the keeper election (lowest
    // centroid_cos, then smallest id — the SemDeDup paper's
    // keep-the-marginal-member policy). eps=0.3 fits the synthetic
    // fixture's cosine range (real-embedding deployments run ~0.95);
    // nlist=16 matches the IVF gates.
    QueryDef("p69_semdedup",
      (s, dir) => Similarity.semDedup(Tables.embeddings(s, dir),
        nlist = 16, eps = 0.3, dim = Some(EmbeddingDim)),
      Some(s"""WITH RECURSIVE
              |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              |      FROM embeddings WHERE len(embedding) = $EmbeddingDim),
              |stride AS (SELECT greatest(count(*) // 16, 1) AS bkt FROM e),
              |cent AS (SELECT vec_id AS cid, v AS c FROM e, stride
              |         WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR) || '/ivf'), 1, 8))::BIGINT
              |               % bkt = 0
              |         ORDER BY vec_id LIMIT 16),
              |assigned AS (
              |  SELECT vec_id, v, cid,
              |         row_number() OVER (PARTITION BY vec_id
              |           ORDER BY list_dot_product(v, c) / sqrt(list_dot_product(c, c)) DESC,
              |                    cid DESC) AS rn
              |  FROM e CROSS JOIN cent),
              |celled AS (SELECT a.vec_id, a.v, a.cid AS cell,
              |                  ${cosineSql("a.v", "ct.c")} AS centroid_cos
              |           FROM assigned a JOIN cent ct ON ct.cid = a.cid
              |           WHERE a.rn = 1),
              |keepc AS (SELECT cell FROM celled GROUP BY cell
              |          HAVING count(*) <= 100000),
              |prs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
              |        FROM celled a
              |        JOIN celled b ON a.cell = b.cell AND a.vec_id < b.vec_id
              |        JOIN keepc k ON k.cell = a.cell
              |        WHERE ${cosineSql("a.v", "b.v")} >= 0.3),
              |edges AS (SELECT id_a AS src, id_b AS dst FROM prs
              |          UNION SELECT id_b, id_a FROM prs),
              |reach AS (SELECT src AS node, dst AS r FROM edges
              |          UNION
              |          SELECT e2.src, rc.r FROM edges e2 JOIN reach rc ON rc.node = e2.dst),
              |lbl AS (SELECT node, least(node, min(r)) AS cluster_id
              |        FROM reach GROUP BY node),
              |labeled AS (SELECT c.vec_id, c.cell,
              |                   COALESCE(l.cluster_id, c.vec_id) AS cluster_id,
              |                   c.centroid_cos
              |            FROM celled c LEFT JOIN lbl l ON l.node = c.vec_id),
              |reps AS (SELECT cluster_id, vec_id AS rep FROM (
              |           SELECT cluster_id, vec_id,
              |                  row_number() OVER (PARTITION BY cluster_id
              |                    ORDER BY centroid_cos ASC, vec_id ASC) AS rn
              |           FROM labeled) WHERE rn = 1)
              |SELECT l.vec_id, l.cell, l.cluster_id, l.centroid_cos,
              |       (l.vec_id = r.rep) AS keeper
              |FROM labeled l JOIN reps r USING (cluster_id)
              |UNION ALL
              |SELECT vec_id, CAST(NULL AS BIGINT), vec_id,
              |       CAST(NULL AS DOUBLE), TRUE
              |FROM embeddings WHERE len(embedding) <> $EmbeddingDim""".stripMargin)),

    // Hard-negative mining for contrastive training: per query (every
    // 50th vector), the 10 most-similar DIFFERENT-label vectors under
    // a 0.35 similarity ceiling (the false-negative guard — a
    // near-identical vector with another label is a labeling error,
    // not a negative; live on this fixture, whose hottest cross-label
    // cosines exceed it). Exact one-pass path gated; the LSH-pruned
    // variant is spec-proven against it (HardNegativesSpec).
    QueryDef("p71_hard_negatives",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val queries = emb.where(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("query_id"),
            col("embedding").as("query_vec"), col("label").as("query_label"))
        Similarity.hardNegatives(emb, queries, k = 10, maxCos = 0.35)
          .select(col("query_id"), col("vec_id"), col("label"),
            col("cosine"), col("rank").cast("long").as("rank"))
      },
      Some(s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
              |           FROM embeddings),
              |q AS (SELECT vec_id AS query_id, label AS qlab, v AS qv
              |      FROM e WHERE vec_id % 50 = 0),
              |scored AS (
              |  SELECT q.query_id, e.vec_id, e.label,
              |         ${cosineSql("e.v", "q.qv")} AS cosine,
              |         row_number() OVER (PARTITION BY q.query_id
              |           ORDER BY ${cosineSql("e.v", "q.qv")} DESC,
              |                    e.vec_id ASC) AS rn
              |  FROM e CROSS JOIN q
              |  WHERE e.vec_id <> q.query_id AND e.label <> q.qlab
              |    AND ${cosineSql("e.v", "q.qv")} <= 0.35)
              |SELECT query_id, vec_id, label, cosine,
              |       CAST(rn AS BIGINT) AS rank
              |FROM scored WHERE rn <= 10""".stripMargin)),

    // Contrastive training-pair assembly: per anchor, the hardest
    // positive (LEAST similar same-label — the one that stretches the
    // space) + the p71 hard negatives, flattened to loader-ready
    // (anchor, positive, negative) rows. The oracle scores both roles
    // from the same cross join and re-derives both windows.
    QueryDef("p89_contrastive_pairs",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val queries = emb.where(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("query_id"),
            col("embedding").as("query_vec"), col("label").as("query_label"))
        Similarity.contrastivePairs(emb, queries, kNeg = 5, maxCos = 0.35)
          .withColumn("neg_rank", col("neg_rank").cast("long"))
      },
      Some(s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
              |           FROM embeddings),
              |q AS (SELECT vec_id AS query_id, label AS qlab, v AS qv
              |      FROM e WHERE vec_id % 50 = 0),
              |scored AS (
              |  SELECT q.query_id, q.qlab, e.vec_id, e.label,
              |         ${cosineSql("e.v", "q.qv")} AS cosine
              |  FROM e CROSS JOIN q
              |  WHERE e.vec_id <> q.query_id),
              |pos AS (
              |  SELECT query_id, vec_id AS pos_id, cosine AS pos_cosine
              |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
              |                    ORDER BY cosine ASC, vec_id ASC) AS rn
              |        FROM scored WHERE label = qlab)
              |  WHERE rn = 1),
              |neg AS (
              |  SELECT query_id, vec_id AS neg_id, label AS neg_label,
              |         cosine AS neg_cosine, CAST(rn AS BIGINT) AS neg_rank
              |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
              |                    ORDER BY cosine DESC, vec_id ASC) AS rn
              |        FROM scored WHERE label <> qlab AND cosine <= 0.35)
              |  WHERE rn <= 5)
              |SELECT query_id, pos_id, pos_cosine,
              |       neg_id, neg_label, neg_cosine, neg_rank
              |FROM neg JOIN pos USING (query_id)""".stripMargin)),
    // Canonical (NFC-aware) dedup composition - WHY p80 exists: every
    // doc gains an encoding-mangled twin (decomposed accent + BEL +
    // doubled spaces vs the composed form on the original), and exact
    // dedup over fingerprint(cleanText(text)) must reunite each pair
    // under the original as keeper. Without the NFC step the two
    // encodings hash apart and every twin survives - the silent
    // dedup-miss this chain closes. Oracle: DuckDB nfc_normalize +
    // the same clean/fingerprint/min-keeper chain.
    QueryDef("p90_canonical_dedup",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        val composedSide = docs.select(col("doc_id"),
          concat(col("text"), lit(" caf\u00e9")).as("text"))
        val decomposedSide = docs.select(
          (col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit("  cafe\u0301\u0007")).as("text"))
        val fps = composedSide.unionByName(decomposedSide)
          .select(col("doc_id"),
            TextAnalysis.fingerprint(
              TextAnalysis.cleanText(col("text"))).as("fp"))
        val win = fps.groupBy(col("fp")).agg(min(col("doc_id")).as("__keeper"))
        fps.join(win, Seq("fp"))
          .select(col("doc_id"), col("fp"),
            (col("doc_id") === col("__keeper")).as("keeper"))
      },
      Some("""WITH u AS (
             |  SELECT doc_id, text || ' caf' || chr(233) AS text
             |  FROM documents
             |  UNION ALL
             |  SELECT doc_id + 1000000,
             |         text || '  cafe' || chr(769) || chr(7) AS text
             |  FROM documents),
             |c AS (SELECT doc_id,
             |             trim(regexp_replace(regexp_replace(
             |               nfc_normalize(text),
             |               '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
             |               '[ \t]+', ' ', 'g')) AS clean
             |      FROM u),
             |fp AS (SELECT doc_id,
             |              md5(lower(regexp_replace(trim(clean), '\s+', ' ', 'g')))
             |                AS fp
             |       FROM c),
             |win AS (SELECT fp, min(doc_id) AS keeper FROM fp GROUP BY fp)
             |SELECT f.doc_id, f.fp, (f.doc_id = w.keeper) AS keeper
             |FROM fp f JOIN win w USING (fp)""".stripMargin)),

    // INDEX EVICTION under retention — the full versioning loop
    // diff -> evict -> dedup: the even half of the corpus is indexed
    // (p19's artifact layout); a retention pass then drops every
    // (id % 10 == 0) doc from the corpus, Snapshots.diff derives the
    // removed set, and tombstoneLshIndex evicts it from the index
    // (id-grain logical delete — O(removed), no corpus rewrite; the
    // next compaction applies it physically, LshIndexSpec proves the
    // rebuild equivalence). The odd half dedups against the surviving
    // index: without eviction the dead docs would keep claiming
    // near-dup verdicts forever — a deleted doc would silently
    // suppress its re-crawled twin. The oracle recomputes signatures,
    // cross-side candidates and verified jaccard from scratch in SQL,
    // stating the eviction as "indexed docs exclude id % 10 == 0".
    QueryDef("p91_index_eviction",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val cur = docs.where(col("doc_id") % 10 =!= 0)
        Dedup.writeLshIndex(docs.where(col("doc_id") % 2 === 0),
          evictLshIndexPath)
        val removed = Snapshots.diff(docs, cur)
          .where(col("status") === "removed")
        Dedup.tombstoneLshIndex(removed, evictLshIndexPath, batchId = "ret1")
        Dedup.nearDupsAgainstIndex(docs.where(col("doc_id") % 2 === 1),
          evictLshIndexPath, threshold = 0.8)
      },
      Some(indexNeardupsOracleSqlWhere("od.doc_id % 10 != 0"))),

    // IVF index eviction: p20's incremental construction (even half
    // as base, odd half appended) followed by a retention eviction of
    // every (vec_id % 7 == 0) vector — tombstoneIvfIndex, the
    // embedding-space twin of p91's logical delete. The probe query
    // (vec 0 — itself evicted, so the cosine-1 self-hit must NOT
    // lead the result) answers from the surviving rows only, under
    // the UNCHANGED centroid geometry (eviction never retrains: cells
    // must not move under rows already written). Oracle: the p20
    // construction in SQL with the evicted ids excluded from the
    // indexed side.
    QueryDef("p92_ivf_eviction",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val base = emb.where(col("vec_id") % 2 === 0)
        val batch = emb.where(col("vec_id") % 2 === 1)
        val centroids = Similarity.sampleCentroids(base, nlist = 16)
        Similarity.writeIvfIndex(base, centroids, evictIvfIndexPath)
        Similarity.appendToIvfIndex(batch, centroids, evictIvfIndexPath,
          batchId = "b1")
        Similarity.tombstoneIvfIndex(
          emb.where(col("vec_id") % 7 === 0).select("vec_id"),
          evictIvfIndexPath, batchId = "ret1")
        val qVec = emb.where(col("vec_id") === 0L)
          .select("embedding").head().getSeq[Float](0).toArray
        Similarity.ivfTopKIndexed(s, evictIvfIndexPath, centroids, qVec,
          k = 10, nprobe = 4)
      },
      Some(ivfIndexedTopkOracleSql("d.vec_id % 7 != 0"))),

    // CLASSIFIER-BASED QUALITY FILTERING — the learned filter every
    // major LLM pipeline runs (GPT-3's reference-vs-crawl LR): full-
    // batch logistic regression over the SAME hashed uni+bigram
    // feature space as DSIR (p78), label = "is reference source"
    // (src0), 2 gradient steps, L1-normalized features. The oracle
    // unrolls BOTH training iterations in SQL — feature hash, per-doc
    // margins, per-bucket gradient sums ROUNDED THROUGH FLOAT exactly
    // like the engine (the p22 k-means discipline — the REAL cast
    // absorbs double summation-order noise, making the trained
    // weights bit-stable cross-engine), weight updates, and the final
    // per-doc sigmoid scores. The trainer stops being a trust-me
    // component: a drift in the feature hash, the gradient math, the
    // update rule or the normalization breaks the hash.
    QueryDef("p95_quality_classifier",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        // train + score over ONE shared feature substrate (round-17):
        // the two-call chain paid the tokenize+hash corpus scan twice
        Classifier.trainAndScoreLogReg(docs,
          (col("source") === "src0").cast("double"),
          buckets = 256, iterations = 2, learningRate = 4.0)
      },
      Some(qualityClassifierOracleSql)),

    // THE DAILY INCREMENTAL INGEST LOOP — diff -> evict -> dedup the
    // delta, composed end-to-end: yesterday's corpus is indexed once;
    // today's crawl drops every (id % 10 == 0) doc (retention),
    // re-crawls every surviving (id % 7 == 1) doc with an edit, and
    // adds clones of every (id % 9 == 0) doc under new ids.
    // Snapshots.diff derives the statuses; the index evicts removed
    // AND changed ids (a changed doc's STALE version must neither
    // claim verdicts nor near-dup its own re-crawl); only the
    // added+changed batch is shingled (delta-proportional daily
    // cost); verdicts come from the surviving index. The decisive
    // rows: a clone of a RETAINED doc is dropped (jaccard 1 against
    // the index), a clone of a RETENTION-REMOVED doc survives — the
    // eviction payoff, impossible with append-only indexes — and
    // every re-crawled doc survives because its own stale version was
    // evicted, not judged. The oracle rebuilds both sides' texts from
    // the same formulas and recomputes signatures, cross-side
    // candidates and verified jaccard in SQL.
    QueryDef("p94_incremental_ingest",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("text"), col("source"))
        Dedup.writeLshIndex(docs, incrIndexPath)
        val cur = docs.where(col("doc_id") % 10 =!= 0)
          .withColumn("text",
            when(col("doc_id") % 7 === 1, concat(col("text"), lit(" edited")))
              .otherwise(col("text")))
          .unionByName(docs.where(col("doc_id") % 9 === 0).select(
            (col("doc_id") + 2000000L).as("doc_id"), col("text"),
            col("source")))
        val st = Snapshots.diff(docs, cur)
        Dedup.tombstoneLshIndex(
          st.where(col("status").isin("removed", "changed")),
          incrIndexPath, batchId = "day1")
        val batch = cur.join(
          st.where(col("status").isin("added", "changed")).select("doc_id"),
          Seq("doc_id"), "left_semi")
        val dropped = Dedup.nearDupsAgainstIndex(batch, incrIndexPath,
          threshold = 0.8)
          .select(col("doc_new").as("doc_id")).distinct()
          .withColumn("__dropped", lit(true))
        batch.select("doc_id").join(dropped, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("__dropped"), lit(false)).as("dropped"))
      },
      Some("""WITH idx AS (
             |  SELECT doc_id, text FROM documents
             |  WHERE doc_id % 10 <> 0 AND doc_id % 7 <> 1),
             |bat AS (
             |  SELECT doc_id, text || ' edited' AS text FROM documents
             |  WHERE doc_id % 7 = 1 AND doc_id % 10 <> 0
             |  UNION ALL
             |  SELECT doc_id + 2000000, text FROM documents
             |  WHERE doc_id % 9 = 0),
             |u AS (SELECT doc_id, text FROM idx UNION ALL SELECT doc_id, text FROM bat),
             |toks AS (SELECT doc_id,
             |           list_filter(string_split_regex(trim(text), '\s+'),
             |                       t -> t <> '') AS w
             |         FROM u),
             |sh AS (SELECT DISTINCT doc_id, shingle FROM (
             |         SELECT doc_id,
             |                unnest(list_transform(range(1, len(w) - 1),
             |                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
             |         FROM toks)),
             |hv AS (SELECT doc_id,
             |              ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS ha,
             |              ('0x' || substr(md5(shingle), 9, 8))::BIGINT AS hb
             |       FROM sh),
             |mh AS (SELECT doc_id, i, min(ha + i * hb) AS mv
             |       FROM hv CROSS JOIN (SELECT unnest(range(16)) AS i) idxs
             |       GROUP BY doc_id, i),
             |bands AS (SELECT doc_id, i // 4 AS band,
             |                 md5(string_agg(CAST(mv AS VARCHAR), ',' ORDER BY i)) AS bucket
             |          FROM mh GROUP BY doc_id, i // 4),
             |cand AS (SELECT DISTINCT nw.doc_id AS doc_new, od.doc_id AS doc_old
             |         FROM bands nw JOIN bands od
             |           ON nw.band = od.band AND nw.bucket = od.bucket
             |         WHERE nw.doc_id IN (SELECT doc_id FROM bat)
             |           AND od.doc_id IN (SELECT doc_id FROM idx)),
             |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS set_size
             |          FROM sh GROUP BY doc_id),
             |common AS (SELECT c.doc_new, c.doc_old, CAST(count(*) AS BIGINT) AS common
             |           FROM cand c
             |           JOIN sh a ON a.doc_id = c.doc_new
             |           JOIN sh b ON b.doc_id = c.doc_old AND b.shingle = a.shingle
             |           GROUP BY 1, 2),
             |dropped AS (SELECT DISTINCT doc_new AS doc_id
             |            FROM common
             |            JOIN sizes sn ON sn.doc_id = doc_new
             |            JOIN sizes so ON so.doc_id = doc_old
             |            WHERE common / (sn.set_size + so.set_size - common) >= 0.8)
             |SELECT b.doc_id,
             |       (b.doc_id IN (SELECT doc_id FROM dropped)) AS dropped
             |FROM bat b""".stripMargin)),

    // THE END-TO-END CURATION PIPELINE — every fragment gate's stage
    // chained in production order inside ONE lazy plan (Curation):
    // quality floor -> canonical NFC-fingerprint dedup -> MinHash
    // near-dedup (greedy smaller-id-wins) -> 4-gram benchmark
    // decontamination -> DSIR Gumbel-top-200 resample -> sequence
    // packing, hashed at the chunk-manifest grain. Corpus: the live
    // docs plus a whitespace-mangled "re-crawl" rendition of each
    // (id + 1e6) so the canonical stage has real work (384 copies
    // die there); benchmark = the held-out doc_id % 50 == 0 slice
    // (19 docs contaminated at n=4). The oracle recomputes all six
    // stages in one CTE cascade — each stage's SQL is the SAME text
    // its fragment oracle pins (p15/p90/p19-family/p84/p78/p61), so
    // a drift in any stage OR in the wiring between stages breaks
    // the hash. PlanSpec proves the composed plan never carries
    // corpus text through a shuffle; BASELINE records the sf0.1/sf1
    // walls.
    QueryDef("p93_curation_e2e",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("text"), col("source"))
        val live = docs.where(col("doc_id") % 50 =!= 0)
        val recrawl = live.select(
          (col("doc_id") + 1000000L).as("doc_id"),
          concat(lit(" "), col("text"), lit("  ")).as("text"),
          col("source"))
        Curation.curateManifest(
          live.unionByName(recrawl),
          docs.where(col("doc_id") % 50 === 0),
          Curation.Config(contaminationN = 4))
      },
      Some(s"""WITH u AS (
              |  SELECT doc_id, text, source FROM documents WHERE doc_id % 50 <> 0
              |  UNION ALL
              |  SELECT doc_id + 1000000, ' ' || text || '  ', source
              |  FROM documents WHERE doc_id % 50 <> 0),
              |f AS (SELECT doc_id, text, source, $qualityColsSql FROM u),
              |q AS (SELECT doc_id, text, source, $qualityScoreSql AS qs FROM f),
              |kept AS (SELECT doc_id, text, source FROM q WHERE qs >= 0.5),
              |cf AS (SELECT doc_id, text, source,
              |         trim(regexp_replace(regexp_replace(
              |           nfc_normalize(text),
              |           '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'),
              |           '[ \\t]+', ' ', 'g')) AS clean
              |       FROM kept),
              |fp AS (SELECT doc_id, text, source,
              |         md5(lower(regexp_replace(trim(clean), '\\s+', ' ', 'g'))) AS fp
              |       FROM cf),
              |canon AS (SELECT doc_id, text, source FROM fp
              |          WHERE doc_id IN (SELECT min(doc_id) FROM fp GROUP BY fp)),
              |toks3 AS (SELECT doc_id,
              |            list_filter(string_split_regex(trim(text), '\\s+'),
              |                        t -> t <> '') AS w
              |          FROM canon),
              |sh3 AS (SELECT DISTINCT doc_id, shingle FROM (
              |          SELECT doc_id,
              |                 unnest(list_transform(range(1, len(w) - 1),
              |                        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
              |          FROM toks3)),
              |hv AS (SELECT doc_id,
              |              ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS ha,
              |              ('0x' || substr(md5(shingle), 9, 8))::BIGINT AS hb
              |       FROM sh3),
              |mh AS (SELECT doc_id, i, min(ha + i * hb) AS mv
              |       FROM hv CROSS JOIN (SELECT unnest(range(16)) AS i) idx
              |       GROUP BY doc_id, i),
              |bands AS (SELECT doc_id, i // 4 AS band,
              |                 md5(string_agg(CAST(mv AS VARCHAR), ',' ORDER BY i)) AS bucket
              |          FROM mh GROUP BY doc_id, i // 4),
              |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              |         FROM bands a JOIN bands b
              |           ON a.band = b.band AND a.bucket = b.bucket
              |         WHERE a.doc_id < b.doc_id),
              |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS set_size
              |          FROM sh3 GROUP BY doc_id),
              |common AS (SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS common
              |           FROM cand c
              |           JOIN sh3 x ON x.doc_id = c.doc_a
              |           JOIN sh3 y ON y.doc_id = c.doc_b AND y.shingle = x.shingle
              |           GROUP BY 1, 2),
              |losers AS (SELECT DISTINCT doc_b AS doc_id
              |           FROM common
              |           JOIN sizes sa ON sa.doc_id = doc_a
              |           JOIN sizes sb ON sb.doc_id = doc_b
              |           WHERE common / (sa.set_size + sb.set_size - common) >= 0.8),
              |near AS (SELECT * FROM canon
              |         WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
              |ntoks AS (SELECT doc_id,
              |            list_filter(string_split_regex(trim(text), '\\s+'),
              |                        t -> t <> '') AS w
              |          FROM near),
              |nsh AS (SELECT DISTINCT doc_id, shingle FROM (
              |          SELECT doc_id,
              |                 unnest(list_transform(range(1, len(w) - 2),
              |                        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle
              |          FROM ntoks)),
              |btoks AS (SELECT doc_id,
              |            list_filter(string_split_regex(trim(text), '\\s+'),
              |                        t -> t <> '') AS w
              |          FROM documents WHERE doc_id % 50 = 0),
              |bsh AS (SELECT DISTINCT shingle FROM (
              |          SELECT unnest(list_transform(range(1, len(w) - 2),
              |                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle
              |          FROM btoks)),
              |contaminated AS (SELECT DISTINCT doc_id FROM nsh JOIN bsh USING (shingle)),
              |dec AS (SELECT * FROM near
              |        WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
              |darr AS (SELECT doc_id, source,
              |           list_filter(string_split_regex(trim(text), '\\s+'),
              |                       t -> t <> '') AS w
              |         FROM dec),
              |feats AS (
              |  SELECT doc_id, source, unnest(w) AS ft FROM darr
              |  UNION ALL
              |  SELECT doc_id, source,
              |         unnest(list_transform(range(1, len(w)),
              |                i -> w[i] || ' ' || w[i+1])) AS ft
              |  FROM darr),
              |dc AS (SELECT doc_id, source,
              |              ('0x' || substr(md5(ft), 1, 15))::BIGINT % 256 AS b,
              |              CAST(count(*) AS BIGINT) AS c
              |       FROM feats GROUP BY 1, 2, 3),
              |tgt AS (SELECT b, CAST(sum(c) AS BIGINT) AS cnt
              |        FROM dc WHERE source = 'src0' GROUP BY 1),
              |raw AS (SELECT b, CAST(sum(c) AS BIGINT) AS cnt
              |        FROM dc GROUP BY 1),
              |tots AS (SELECT
              |           (SELECT COALESCE(sum(cnt), 0) FROM tgt) AS tt,
              |           (SELECT COALESCE(sum(cnt), 0) FROM raw) AS tr),
              |delta AS (
              |  SELECT ids.b,
              |         ln(((COALESCE(t.cnt, 0) + 1)::DOUBLE * (tr + 256)::DOUBLE)
              |            / ((tt + 256)::DOUBLE * (COALESCE(r.cnt, 0) + 1)::DOUBLE))
              |           AS d
              |  FROM (SELECT unnest(range(256)) AS b) ids
              |  LEFT JOIN tgt t ON t.b = ids.b
              |  LEFT JOIN raw r ON r.b = ids.b
              |  CROSS JOIN tots),
              |per AS (SELECT doc_id, sum(c::DOUBLE * d) AS lw
              |        FROM dc JOIN delta ON delta.b = dc.b
              |        GROUP BY 1),
              |wdocs AS (SELECT d.doc_id, COALESCE(per.lw, 0.0) AS lw
              |          FROM (SELECT doc_id FROM dec) d
              |          LEFT JOIN per USING (doc_id)),
              |g AS (SELECT doc_id,
              |             lw + -ln(-ln(
              |               ((('0x' || substr(md5(
              |                   CAST(length(CAST(doc_id AS VARCHAR)) AS VARCHAR)
              |                   || ':' || CAST(doc_id AS VARCHAR) || '/dsir'),
              |                 1, 8))::BIGINT)::DOUBLE + 0.5) / 4294967296.0))
              |               AS gk
              |      FROM wdocs),
              |sel AS (SELECT doc_id FROM g ORDER BY gk DESC, doc_id LIMIT 200),
              |t AS (SELECT doc_id,
              |        ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '/pack'), 1, 8))::BIGINT
              |          % 4 AS shard,
              |        CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
              |                             t -> t <> '')) AS BIGINT) AS n_tokens
              |      FROM dec WHERE doc_id IN (SELECT doc_id FROM sel)),
              |w2 AS (SELECT doc_id, shard, n_tokens,
              |              COALESCE(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
              |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tb
              |       FROM t)
              |SELECT shard, CAST(tb // 512 AS BIGINT) AS chunk_id,
              |       CAST(count(*) AS BIGINT) AS n_docs,
              |       CAST(sum(n_tokens) AS BIGINT) AS tokens_started,
              |       min(doc_id) AS first_doc_id
              |FROM w2 GROUP BY shard, CAST(tb // 512 AS BIGINT)""".stripMargin)),

    // Incremental SemDeDup against a MATERIALIZED IVF index: the even
    // half of embeddings is indexed once (p20's artifact layout), the
    // odd half arrives as the "new batch" and is judged cell-by-cell
    // against indexed members only — the p19/p53 ingestion shape in
    // embedding space (index wins; claimant = highest cosine, then
    // smallest index id). The oracle recomputes the even-half centroid
    // sample, BOTH halves' cell assignment, the cross-side cell join
    // at cosine >= 0.3 under the index-side cap, and the claimant
    // election end-to-end in SQL.
    QueryDef("p75_semdedup_index",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val base = emb.where(col("vec_id") % 2 === 0)
        val batch = emb.where(col("vec_id") % 2 === 1)
        val centroids = Similarity.sampleCentroids(base, nlist = 16)
        Similarity.writeIvfIndex(base, centroids, semDedupIndexPath)
        Similarity.semDedupAgainstIndex(s, batch, semDedupIndexPath,
          centroids, eps = 0.3, dim = Some(EmbeddingDim))
      },
      Some(s"""WITH half AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              |             FROM embeddings
              |             WHERE vec_id % 2 = 0 AND len(embedding) = $EmbeddingDim),
              |stride AS (SELECT greatest(count(*) // 16, 1) AS bkt FROM half),
              |cent AS (SELECT vec_id AS cid, v AS c FROM half, stride
              |         WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR) || '/ivf'), 1, 8))::BIGINT
              |               % bkt = 0
              |         ORDER BY vec_id LIMIT 16),
              |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              |      FROM embeddings WHERE len(embedding) = $EmbeddingDim),
              |assigned AS (
              |  SELECT vec_id, v, cid,
              |         row_number() OVER (PARTITION BY vec_id
              |           ORDER BY list_dot_product(v, c) / sqrt(list_dot_product(c, c)) DESC,
              |                    cid DESC) AS rn
              |  FROM e CROSS JOIN cent),
              |celled AS (SELECT vec_id, v, cid AS cell FROM assigned WHERE rn = 1),
              |idxc AS (SELECT * FROM celled WHERE vec_id % 2 = 0),
              |keepc AS (SELECT cell FROM idxc GROUP BY cell
              |          HAVING count(*) <= 100000),
              |claims AS (SELECT * FROM (
              |  SELECT o.vec_id, i.vec_id AS claimed_by,
              |         ${cosineSql("o.v", "i.v")} AS claim_cosine,
              |         row_number() OVER (PARTITION BY o.vec_id
              |           ORDER BY ${cosineSql("o.v", "i.v")} DESC,
              |                    i.vec_id ASC) AS rn
              |  FROM celled o
              |  JOIN idxc i ON i.cell = o.cell
              |  JOIN keepc k ON k.cell = o.cell
              |  WHERE o.vec_id % 2 = 1
              |    AND ${cosineSql("o.v", "i.v")} >= 0.3) WHERE rn = 1)
              |SELECT b.vec_id, b.cell, c.claimed_by, c.claim_cosine,
              |       (c.claimed_by IS NULL) AS keeper
              |FROM celled b LEFT JOIN claims c ON c.vec_id = b.vec_id
              |WHERE b.vec_id % 2 = 1
              |UNION ALL
              |SELECT vec_id, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
              |       CAST(NULL AS DOUBLE), TRUE
              |FROM embeddings
              |WHERE vec_id % 2 = 1 AND len(embedding) <> $EmbeddingDim""".stripMargin)),

    // The LSH-pruned hard-negative path (p71's scale variant): same
    // mining semantics, but candidates come from each query's sign-LSH
    // bucket plus a one-bit flip (multi-probe) instead of the full
    // corpus — at 100 TB the label filter then sees ~corpus/2^bits
    // rows per query. The oracle embeds the same md5-derived
    // hyperplanes as SQL literals (the p11 contract), rebuilds the
    // probe sets and ranks the label-filtered candidates.
    QueryDef("p77_hard_negatives_lsh",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val queries = emb.where(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("query_id"),
            col("embedding").as("query_vec"), col("label").as("query_label"))
        Similarity.hardNegatives(emb, queries, k = 10, maxCos = 0.35,
          bits = Some(2), probes = 2, dim = Some(EmbeddingDim))
          .select(col("query_id"), col("vec_id"), col("label"),
            col("cosine"), col("rank").cast("long").as("rank"))
      },
      Some(s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
              |           FROM embeddings),
              |b AS (SELECT vec_id, label, v,
              |        CASE WHEN len(v) = $EmbeddingDim THEN
              |            ${bucketSql("v", 2)}
              |        END AS bucket
              |      FROM e),
              |q AS (SELECT vec_id AS query_id, label AS qlab, v AS qv,
              |             bucket AS qb
              |      FROM b WHERE vec_id % 50 = 0 AND bucket IS NOT NULL),
              |probes AS (SELECT query_id, qlab, qv,
              |                  unnest([qb, xor(qb, 1)]) AS bucket
              |           FROM q),
              |scored AS (
              |  SELECT p.query_id, c.vec_id, c.label,
              |         ${cosineSql("c.v", "p.qv")} AS cosine,
              |         row_number() OVER (PARTITION BY p.query_id
              |           ORDER BY ${cosineSql("c.v", "p.qv")} DESC,
              |                    c.vec_id ASC) AS rn
              |  FROM probes p
              |  JOIN b c ON c.bucket = p.bucket
              |  WHERE c.vec_id <> p.query_id AND c.label <> p.qlab
              |    AND ${cosineSql("c.v", "p.qv")} <= 0.35)
              |SELECT query_id, vec_id, label, cosine,
              |       CAST(rn AS BIGINT) AS rank
              |FROM scored WHERE rn <= 10""".stripMargin)),

    // q-gram-blocked edit-distance join (ed-join) over the corpus
    // vocabulary — the entity-resolution / vocab-reconciliation
    // operator: every distinct-token pair within 2 edits, blocked by
    // shared char 2-grams under the df cap plus the exact length
    // filter, verified with levenshtein. The oracle mirrors the
    // blocking (the p08 banding precedent: candidates are part of the
    // operator's definition) and recomputes grams, cap, candidates
    // and distances in SQL.
    QueryDef("p76_fuzzy_vocab",
      (s, dir) => Fuzzy.fuzzyPairs(
        Tables.documents(s, dir)
          .select(explode(TextAnalysis.tokens(col("text"))).as("w")),
        strCol = "w", maxDist = 2, q = 2),
      Some("""WITH w AS (
             |  SELECT DISTINCT unnest(list_filter(
             |           string_split_regex(trim(text), '\s+'),
             |           t -> t <> '')) AS s
             |  FROM documents),
             |g AS (SELECT DISTINCT s,
             |             unnest(list_transform(range(1, length(s)),
             |                    i -> substring(s, CAST(i AS INTEGER), 2))) AS g
             |      FROM w),
             |keep AS (SELECT g FROM g GROUP BY g HAVING count(*) <= 10000),
             |cand AS (SELECT DISTINCT a.s AS str_a, b.s AS str_b
             |         FROM g a
             |         JOIN g b ON a.g = b.g AND a.s < b.s
             |         JOIN keep k ON k.g = a.g
             |         WHERE abs(length(a.s) - length(b.s)) <= 2)
             |SELECT str_a, str_b,
             |       CAST(levenshtein(str_a, str_b) AS BIGINT) AS dist
             |FROM cand WHERE levenshtein(str_a, str_b) <= 2""".stripMargin)),

    // Salted JOIN under the p68 planted hot key: ~70% of probe rows
    // share key 0; Skew.saltedJoin replicates the small build side
    // over 8 salts and salts the probe with a content hash, so the
    // hot key's probe rows spread over 8 tasks instead of one. The
    // join is row-level (no floats, no aggregation), so the salted
    // plan is BIT-IDENTICAL to the plain join the oracle computes —
    // any lost or duplicated replication row breaks the hash.
    QueryDef("p72_skewed_join",
      (s, dir) => {
        val probe = Tables.documents(s, dir).select(
          col("doc_id"),
          when(pmod(col("doc_id"), lit(10)) < 7, lit(0L))
            .otherwise(pmod(col("doc_id"), lit(100))).as("key"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        val build = s.range(100).select(col("id").as("key"),
          concat(lit("grp_"), pmod(col("id"), lit(7))).as("bucket_label"))
        graft.operators.Skew.saltedJoin(probe, build, "key", saltBuckets = 8)
          .select(col("doc_id"), col("key"), col("bucket_label"),
            col("n_tokens"))
      },
      Some("""WITH probe AS (
             |  SELECT doc_id,
             |         CASE WHEN doc_id % 10 < 7 THEN 0 ELSE doc_id % 100 END AS key,
             |         CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
             |                              t -> t <> '')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |build AS (SELECT r AS key, 'grp_' || CAST(r % 7 AS VARCHAR) AS bucket_label
             |          FROM (SELECT unnest(range(100)) AS r))
             |SELECT doc_id, key, bucket_label, n_tokens
             |FROM probe JOIN build USING (key)""".stripMargin)),

    // DSIR importance weights (Xie et al. 2023): every doc scored by
    // how much more likely its hashed unigram+bigram features are
    // under the TARGET corpus (source='src0' — the curated-reference
    // stand-in) than under the raw corpus itself. The oracle rebuilds
    // the feature stream, the md5 bucket hash, both Laplace-smoothed
    // bucket tables and the identically-parenthesized one-ln-per-
    // bucket log-ratio in SQL; per-doc float sums ride the 6-dp note.
    QueryDef("p78_dsir_weights",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Dsir.importanceWeights(docs, docs.where(col("source") === "src0"),
          buckets = 256)
      },
      Some("""WITH arr AS (
             |  SELECT doc_id, source,
             |         list_filter(string_split_regex(trim(text), '\s+'),
             |                     t -> t <> '') AS w
             |  FROM documents),
             |feats AS (
             |  SELECT doc_id, source, unnest(w) AS f FROM arr
             |  UNION ALL
             |  SELECT doc_id, source,
             |         unnest(list_transform(range(1, len(w)),
             |                i -> w[i] || ' ' || w[i+1])) AS f
             |  FROM arr),
             |dc AS (SELECT doc_id, source,
             |              ('0x' || substr(md5(f), 1, 15))::BIGINT % 256 AS b,
             |              CAST(count(*) AS BIGINT) AS c
             |       FROM feats GROUP BY 1, 2, 3),
             |tgt AS (SELECT b, CAST(sum(c) AS BIGINT) AS cnt
             |        FROM dc WHERE source = 'src0' GROUP BY 1),
             |raw AS (SELECT b, CAST(sum(c) AS BIGINT) AS cnt
             |        FROM dc GROUP BY 1),
             |tots AS (SELECT
             |           (SELECT COALESCE(sum(cnt), 0) FROM tgt) AS tt,
             |           (SELECT COALESCE(sum(cnt), 0) FROM raw) AS tr),
             |delta AS (
             |  SELECT ids.b,
             |         ln(((COALESCE(t.cnt, 0) + 1)::DOUBLE * (tr + 256)::DOUBLE)
             |            / ((tt + 256)::DOUBLE * (COALESCE(r.cnt, 0) + 1)::DOUBLE))
             |           AS d
             |  FROM (SELECT unnest(range(256)) AS b) ids
             |  LEFT JOIN tgt t ON t.b = ids.b
             |  LEFT JOIN raw r ON r.b = ids.b
             |  CROSS JOIN tots),
             |per AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS nf,
             |               sum(c::DOUBLE * d) AS lw
             |        FROM dc JOIN delta ON delta.b = dc.b
             |        GROUP BY 1)
             |SELECT d.doc_id, COALESCE(nf, 0) AS n_feats,
             |       COALESCE(lw, 0.0) AS log_weight
             |FROM (SELECT DISTINCT doc_id FROM documents) d
             |LEFT JOIN per USING (doc_id)""".stripMargin)),

    // Okapi BM25 keyword retrieval (Lucene idf): scores for every
    // doc hitting >= 1 of {spark, dup, vector} — "dup" is the rare
    // term (df 25/500 at sf0.01), so the idf contrast is real. The
    // oracle re-derives dl/avgdl, per-term df and the identically-
    // parenthesized score chain; ln + per-doc sums ride the 6-dp
    // note. Ranking cuts (bm25TopK) stay spec-side: 6-dp equality
    // can't ORDER raw transcendental scores.
    QueryDef("p79_bm25_scores",
      (s, dir) => TextAnalysis.bm25Scores(
        Tables.documents(s, dir), Seq("spark", "dup", "vector")),
      Some("""WITH arr AS (
             |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
             |                             t -> t <> '') AS w
             |  FROM documents),
             |dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM arr),
             |stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |                 CAST(sum(dl) AS BIGINT) AS tot
             |          FROM dl),
             |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
             |       FROM (SELECT doc_id, unnest(w) AS term FROM arr)
             |       WHERE term IN ('spark', 'dup', 'vector')
             |       GROUP BY 1, 2),
             |dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df
             |        FROM tf GROUP BY 1)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit_terms,
             |       sum(ln(1.0 + (n - df + 0.5) / (df + 0.5))
             |           * (tf * 2.2) /
             |           (tf + 1.2 * (0.25 + 0.75 * (dl / (tot::DOUBLE / n)))))
             |         AS score
             |FROM tf
             |JOIN dft USING (term)
             |JOIN dl USING (doc_id)
             |CROSS JOIN stats
             |GROUP BY doc_id""".stripMargin)),

    // Unicode NFC + control/whitespace cleaning over a deterministic
    // MESSY rendition of each doc (the ASCII testdata can't exercise
    // composition, so both engines append the same decomposed-accent
    // pairs, a BEL control and tab/space runs, keyed on doc_id % 3).
    // The Spark side is the native codegen'd NfcNormalize expression;
    // the oracle is DuckDB's utf8proc nfc_normalize + the SAME
    // regex/step order — both implement the pinned Unicode canonical
    // composition, so clean_text must hash-match byte-for-byte.
    QueryDef("p80_nfc_clean",
      (s, dir) => {
        val m = pmod(col("doc_id"), lit(3))
        // decomposed base+combining pairs (NFC must compose them) and
        // a BEL control (the strip step must remove it)
        val accent = when(m === 0, lit("e\u0301"))
          .when(m === 1, lit("e\u0300"))
          .otherwise(lit("e\u0302"))
        val messy = concat(col("text"), lit("  caf"), accent,
          lit("\u0007 fin\tal "))
        Tables.documents(s, dir)
          .select(col("doc_id"),
            length(messy).cast("long").as("n_chars_raw"),
            TextAnalysis.cleanText(messy).as("clean_text"))
          .withColumn("n_chars_clean",
            length(col("clean_text")).cast("long"))
      },
      Some("""WITH m AS (
             |  SELECT doc_id,
             |         text || '  caf' ||
             |         CASE doc_id % 3 WHEN 0 THEN 'e' || chr(769)
             |                         WHEN 1 THEN 'e' || chr(768)
             |                         ELSE 'e' || chr(770) END ||
             |         chr(7) || ' fin' || chr(9) || 'al ' AS messy
             |  FROM documents),
             |c AS (
             |  SELECT doc_id, messy,
             |         trim(regexp_replace(regexp_replace(
             |           nfc_normalize(messy),
             |           '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
             |           '[ \t]+', ' ', 'g')) AS clean_text
             |  FROM m)
             |SELECT doc_id,
             |       CAST(length(messy) AS BIGINT) AS n_chars_raw,
             |       clean_text,
             |       CAST(length(clean_text) AS BIGINT) AS n_chars_clean
             |FROM c""".stripMargin)),

    // Per-epoch deterministic global shuffle: epoch 3's full training
    // order as a 1-based rank — md5 variate per (doc, epoch) ranked
    // through the distributed GlobalOrder zip (never a
    // single-partition window). The variate is a 2^-32-scaled 32-bit
    // integer (EXACT in double), so the oracle can rank by the raw
    // integer hash and must reproduce every rank bit-for-bit.
    QueryDef("p81_epoch_shuffle",
      (s, dir) => Sampling.epochShuffle(
        Tables.documents(s, dir).select(col("doc_id"), col("source")),
        epoch = 3, keyCol = "doc_id"),
      Some("""WITH u AS (SELECT doc_id, source,
             |  ('0x' || substr(md5(
             |     CAST(length(CAST(doc_id AS VARCHAR)) AS VARCHAR)
             |     || ':' || CAST(doc_id AS VARCHAR) || '/epoch/3'), 1, 8))::BIGINT
             |   AS h
             |  FROM documents)
             |SELECT doc_id, source,
             |       CAST(row_number() OVER (ORDER BY h, doc_id) AS BIGINT)
             |         AS epoch_rank
             |FROM u""".stripMargin)),

    // Rarity-weighted sparse cosine pairs: tf/df-weighted token
    // vectors, cosine over pairs sharing >= 1 term with df <= 300 —
    // at sf0.01 only 'dup' (df 25) is index-eligible, so the pair set
    // is a real minority-term join, not corpus². The pair SET is an
    // exact integer predicate; weights are single IEEE divisions; the
    // dot/norm sums ride the 6-dp note.
    QueryDef("p82_weighted_cosine",
      (s, dir) => Dedup.weightedCosinePairs(
        Tables.documents(s, dir), maxTermDf = 300),
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(list_filter(
             |           string_split_regex(trim(text), '\s+'),
             |           t -> t <> '')) AS term
             |  FROM documents),
             |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
             |       FROM toks GROUP BY 1, 2),
             |dfr AS (SELECT term, CAST(count(*) AS BIGINT) AS df
             |        FROM tf GROUP BY 1),
             |w AS (SELECT doc_id, term, df, tf::DOUBLE / df AS w
             |      FROM tf JOIN dfr USING (term)),
             |norms AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm
             |          FROM w GROUP BY 1),
             |capped AS (SELECT * FROM w WHERE df <= 300),
             |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |                 CAST(count(*) AS BIGINT) AS n_shared,
             |                 sum(a.w * b.w) AS dot
             |          FROM capped a JOIN capped b
             |            ON a.term = b.term AND a.doc_id < b.doc_id
             |          GROUP BY 1, 2)
             |SELECT doc_a, doc_b, n_shared,
             |       dot / (na.nrm * nb.nrm) AS cosine
             |FROM pairs
             |JOIN norms na ON na.doc_id = doc_a
             |JOIN norms nb ON nb.doc_id = doc_b""".stripMargin)),

    // Per-dimension ROBUST embedding profile: exact discrete
    // quartiles + IQR per dim (the outlier-resistant calibration
    // min/max ranges can't give, and the drift profile embedding QA
    // diffs). Fully deterministic — float values group by BIT
    // equality, quantiles are exact ranks (the g09 counts plan over
    // (dim, value)), IQR one exact double subtraction — so the hash
    // gate needs NO float caveat at all.
    QueryDef("p83_embedding_dim_profile",
      (s, dir) => Quantization.dimRobustProfile(Tables.embeddings(s, dir)),
      Some(s"""WITH x AS (
              |  SELECT CAST(r.d AS INT) AS d,
              |         embedding[CAST(r.d AS INT) + 1] AS v
              |  FROM embeddings, range($EmbeddingDim) r(d)),
              |pg AS (SELECT d, v, CAST(count(*) AS BIGINT) AS c
              |       FROM x WHERE v IS NOT NULL GROUP BY d, v),
              |r AS (SELECT *,
              |        sum(c) OVER (PARTITION BY d ORDER BY v) AS cum,
              |        sum(c) OVER (PARTITION BY d) AS n
              |      FROM pg),
              |q AS (SELECT d,
              |        max(CASE WHEN cum - c <= ((n-1) * 1) // 4
              |                  AND cum - 1 >= ((n-1) * 1) // 4 THEN v END) AS p25,
              |        max(CASE WHEN cum - c <= ((n-1) * 1) // 2
              |                  AND cum - 1 >= ((n-1) * 1) // 2 THEN v END) AS p50,
              |        max(CASE WHEN cum - c <= ((n-1) * 3) // 4
              |                  AND cum - 1 >= ((n-1) * 3) // 4 THEN v END) AS p75,
              |        CAST(max(n) AS BIGINT) AS n_values
              |      FROM r GROUP BY d)
              |SELECT d, p25, p50, p75, n_values,
              |       p75::DOUBLE - p25::DOUBLE AS iqr
              |FROM q""".stripMargin)),

    // FUZZY decontamination (MOSS winnowing): corpus docs scored by
    // winnowed rolling-hash fingerprint hits against the benchmark
    // split — the substring-grain second net behind p24's exact word
    // n-grams (retokenization or small edits around a quoted answer
    // break an exact gram; char-window fingerprints survive them).
    // Oracle rebuilds the p17 hash/winnow chain for BOTH splits.
    QueryDef("p84_fuzzy_decontamination",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Contamination.fingerprintOverlap(
          docs.where(col("doc_id") % 50 =!= 0),
          docs.where(col("doc_id") % 50 === 0),
          window = 8, band = 4)
      },
      Some("""WITH h AS (
             |  SELECT doc_id,
             |    list_transform(range(1, greatest(length(text) - 8 + 2, 1)),
             |      i -> (CAST(unicode(substr(text, CAST(i AS INT), 1)) AS BIGINT) * 27512614111
             |          + CAST(unicode(substr(text, CAST(i+1 AS INT), 1)) AS BIGINT) * 887503681
             |          + CAST(unicode(substr(text, CAST(i+2 AS INT), 1)) AS BIGINT) * 28629151
             |          + CAST(unicode(substr(text, CAST(i+3 AS INT), 1)) AS BIGINT) * 923521
             |          + CAST(unicode(substr(text, CAST(i+4 AS INT), 1)) AS BIGINT) * 29791
             |          + CAST(unicode(substr(text, CAST(i+5 AS INT), 1)) AS BIGINT) * 961
             |          + CAST(unicode(substr(text, CAST(i+6 AS INT), 1)) AS BIGINT) * 31
             |          + CAST(unicode(substr(text, CAST(i+7 AS INT), 1)) AS BIGINT)) % 1000000007) AS hs
             |  FROM documents),
             |w AS (
             |  SELECT doc_id, unnest(list_transform(range(0, (len(hs)+3)//4),
             |    b -> list_min(hs[CAST(b*4+1 AS INT):CAST(b*4+4 AS INT)]))) AS fp
             |  FROM h),
             |fps AS (SELECT DISTINCT doc_id, fp FROM w),
             |cfp AS (SELECT * FROM fps WHERE doc_id % 50 <> 0),
             |bfp AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 50 = 0),
             |per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fps
             |        FROM cfp GROUP BY 1),
             |hits AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp_hits
             |         FROM cfp JOIN bfp USING (fp) GROUP BY 1)
             |SELECT doc_id, n_fps, n_fp_hits,
             |       n_fp_hits / n_fps AS fp_contamination
             |FROM hits JOIN per USING (doc_id)""".stripMargin)),

    // Marginal-novelty curve in ingestion (doc_id) order: per doc the
    // fraction of its shingles no earlier doc contains — the
    // diminishing-returns signal crawl-budget decisions read. All
    // integers + one exact division; first-seen is a min aggregation,
    // never a corpus window.
    QueryDef("p85_novelty_curve",
      (s, dir) => Dedup.noveltyCurve(
        Dedup.wordShingles(Tables.documents(s, dir))),
      Some(s"""WITH $shingleSql,
              |fs AS (SELECT shingle, min(doc_id) AS first FROM sh GROUP BY 1)
              |SELECT doc_id,
              |       CAST(count(*) AS BIGINT) AS n_shingles,
              |       CAST(sum(CASE WHEN doc_id = first THEN 1 ELSE 0 END)
              |            AS BIGINT) AS n_novel,
              |       sum(CASE WHEN doc_id = first THEN 1 ELSE 0 END)
              |         / count(*) AS novelty
              |FROM sh JOIN fs USING (shingle)
              |GROUP BY doc_id""".stripMargin)),

    // Fixed-size reservoir via the NATIVE bounded-state aggregate
    // (reservoir_keys): p40's kept-set semantics (k smallest md5
    // variates per stratum, key tiebreak) but O(strata × k) on the
    // wire instead of a stratum-wide window sort — the hot-stratum
    // scale path. The oracle is the window formulation in SQL: if the
    // aggregate drops, duplicates or mis-orders even one key, the
    // hash breaks.
    QueryDef("p86_reservoir_sample",
      (s, dir) => Sampling.fixedSizeStratifiedAgg(
        Tables.documents(s, dir), stratumCol = "source", k = 12,
        keyCol = "doc_id", salt = "eval2"),
      Some("""WITH u AS (SELECT doc_id, source,
             |  ('0x' || substr(md5(
             |     CAST(length(CAST(doc_id AS VARCHAR)) AS VARCHAR)
             |     || ':' || CAST(doc_id AS VARCHAR) || '/eval2'), 1, 8))::BIGINT
             |   AS h
             |  FROM documents),
             |r AS (SELECT *, row_number() OVER (
             |        PARTITION BY source ORDER BY h, doc_id) AS rn
             |      FROM u)
             |SELECT source, doc_id FROM r WHERE rn <= 12""".stripMargin)),

    // Snapshot-diff composition card: the p52 diff rolled up to a
    // release note — per (status, source) doc and token counts, rows
    // describing the CURRENT snapshot for added/changed/unchanged and
    // the OLD one for removed. Same two-version fixture as p52, with
    // source carried through; all integers.
    QueryDef("p87_diff_card",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("text"), col("source"))
        val v1 = docs.where(col("doc_id") % 4 =!= 3)
        val v2 = docs.where(col("doc_id") % 4 =!= 0)
          .withColumn("text",
            when(col("doc_id") % 6 === 1, concat(col("text"), lit(" edited")))
              .otherwise(col("text")))
        Snapshots.diffCard(v1, v2, stratumCol = "source")
      },
      Some("""WITH v1 AS (SELECT doc_id, text, source FROM documents
             |            WHERE doc_id % 4 <> 3),
             |v2 AS (SELECT doc_id,
             |              CASE WHEN doc_id % 6 = 1 THEN text || ' edited'
             |                   ELSE text END AS text,
             |              source
             |       FROM documents WHERE doc_id % 4 <> 0),
             |st AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
             |              CASE WHEN a.doc_id IS NULL THEN 'added'
             |                   WHEN b.doc_id IS NULL THEN 'removed'
             |                   WHEN a.text <> b.text THEN 'changed'
             |                   ELSE 'unchanged' END AS status
             |       FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id),
             |side AS (
             |  SELECT doc_id, source,
             |         CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
             |                              t -> t <> '')) AS BIGINT) AS nt
             |  FROM v2
             |  UNION ALL
             |  SELECT doc_id, source,
             |         CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
             |                              t -> t <> '')) AS BIGINT) AS nt
             |  FROM v1 WHERE doc_id NOT IN (SELECT doc_id FROM v2))
             |SELECT status, source,
             |       CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(nt) AS BIGINT) AS n_tokens
             |FROM st JOIN side USING (doc_id)
             |GROUP BY status, source""".stripMargin)),

    // Batched BM25 retrieval — a whole query set in ONE corpus pass
    // (eval mining / contamination triage at fleet scale: probe
    // queries share the scan, never rerun it). Scores only (the
    // p79 contract: per-(query, doc) ln-sums ride the 6-dp note;
    // ranking cuts stay spec-side). q2 carries a vocabulary miss
    // ('nosuchterm') to pin the df=0 never-scores rule; 'merge' and
    // 'hash' hit most docs while 'dup' hits 25/500 — real idf
    // contrast inside one batch.
    QueryDef("p98_multiquery_bm25",
      (s, dir) => TextAnalysis.multiQueryBm25(
        Tables.documents(s, dir), RetrievalQueries),
      Some(multiQueryBm25OracleSql)),

    // Bounded-state approximate grouped quantiles: per event type,
    // the 64-row md5 reservoir's lower-interpolated p25/p50/p90 over
    // the event value — every emitted value an ACTUAL data value
    // (selection, no float summation), the mergeable fixed-memory
    // alternative to the exact sort-based g09 quantiles. Keyed by
    // event_id — globally unique, the reservoir contract (the
    // lineitem (orderkey, linenumber) pair is NOT unique in this
    // synthetic corpus). The oracle re-derives the reservoir (rank
    // window over the same raw 32-bit md5 variate) and the same
    // index selection.
    QueryDef("p99_sample_quantiles",
      (s, dir) => Sampling.sampleQuantiles(
        Tables.events(s, dir),
        groupCol = "event_type", valueCol = "value",
        keyCol = "event_id", k = 64, qs = Seq(0.25, 0.5, 0.9), salt = "sq"),
      Some("""WITH u AS (SELECT event_type AS grp, event_id AS k, value AS v
             |           FROM events),
             |h AS (SELECT grp, k, v,
             |        ('0x' || substr(md5(
             |           CAST(length(CAST(k AS VARCHAR)) AS VARCHAR)
             |           || ':' || CAST(k AS VARCHAR) || '/sq'), 1, 8))::BIGINT AS h
             |      FROM u),
             |r AS (SELECT *, row_number() OVER (
             |        PARTITION BY grp ORDER BY h, k) AS rn
             |      FROM h),
             |s AS (SELECT grp, v FROM r WHERE rn <= 64),
             |g AS (SELECT grp, list(v ORDER BY v) AS vals,
             |             CAST(count(*) AS BIGINT) AS n
             |      FROM s GROUP BY grp)
             |SELECT grp AS event_type, n AS n_sample,
             |       vals[CAST(floor(0.25 * (n - 1)) AS INT) + 1] AS p25,
             |       vals[CAST(floor(0.5 * (n - 1)) AS INT) + 1] AS p50,
             |       vals[CAST(floor(0.9 * (n - 1)) AS INT) + 1] AS p90
             |FROM g""".stripMargin)),

    // Autoregressive training-example assembly: each event whose
    // user-stream position exceeds the 3-event look-back becomes one
    // (context, label) next-step-prediction row. Key-partitioned
    // ROWS-bounded window — parallel across users, O(window) eval
    // state, never a global sort; the (ts, event_id) order is total,
    // so every context string is engine-reproducible.
    QueryDef("p100_sequence_examples",
      (s, dir) => graft.pipeline.Sequences.nextEventExamples(
        Tables.events(s, dir), window = 3),
      Some(sequenceExamplesOracleSql)),

    // Embedding-space outlier flags: cosine to the nearest sampled
    // centroid (the p13 md5-spread centroid set) under a FIXED
    // threshold — a pure per-row function of (vector, centroid set),
    // no cross-row float aggregation, so every value and flag is
    // engine-exact. tau=0.12 sits under the 5th percentile of the
    // gate corpus' best-centroid cosines (~4% flagged) — both
    // classes populated, neither degenerate.
    QueryDef("p101_embedding_outliers",
      (s, dir) => Similarity.embeddingOutliers(
        Tables.embeddings(s, dir), nlist = 16, tau = 0.12),
      Some("""WITH stride AS (SELECT greatest(count(*) // 16, 1) AS bkt
             |                FROM embeddings),
             |cent AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS c
             |         FROM embeddings, stride
             |         WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR) || '/ivf'), 1, 8))::BIGINT
             |               % bkt = 0
             |         ORDER BY vec_id LIMIT 16),
             |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |assigned AS (
             |  SELECT vec_id, cid,
             |         CASE WHEN sqrt(list_dot_product(v, v)) > 0
             |              THEN (list_dot_product(v, c) / sqrt(list_dot_product(c, c)))
             |                   / sqrt(list_dot_product(v, v))
             |              ELSE CAST('-Infinity' AS DOUBLE) END AS cell_cosine,
             |         row_number() OVER (PARTITION BY vec_id
             |           ORDER BY list_dot_product(v, c) / sqrt(list_dot_product(c, c)) DESC,
             |                    cid DESC) AS rn
             |  FROM e CROSS JOIN cent),
             |best AS (SELECT vec_id, cid AS cell, cell_cosine
             |         FROM assigned WHERE rn = 1),
             |cn AS (SELECT cell, CAST(count(*) AS BIGINT) AS cell_n
             |       FROM best GROUP BY cell)
             |SELECT vec_id, cell, cell_cosine,
             |       cell_cosine < 0.12 AS is_outlier, cell_n
             |FROM best JOIN cn USING (cell)""".stripMargin)),

    // Token-budget mixture sampling: 30% of the corpus' tokens
    // allocated src0=25% / src1=15% / 3% each to the rest; src0's
    // allocation exceeds its supply so it caps at rate 1.0 (keeps
    // everything — the oversubscription rule), the default strata
    // sample at ~0.19. Rates are one pinned IEEE chain over exact
    // integer token totals; keep is the md5 variate test — kept set
    // deterministic across engines and partitionings.
    QueryDef("p102_token_budget_mix",
      (s, dir) => Sampling.tokenBudgetMix(
        Tables.documents(s, dir)
          .select(col("doc_id"), col("source"),
            TextAnalysis.tokenCount(col("text")).as("n_tokens")),
        stratumCol = "source", tokenCol = "n_tokens",
        shares = Map("src0" -> 0.25, "src1" -> 0.15), defaultShare = 0.03,
        budgetFrac = 0.3, keyCol = "doc_id", salt = "mix"),
      Some("""WITH d AS (SELECT doc_id, source,
             |            CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
             |                                 t -> t <> '')) AS BIGINT) AS n_tokens
             |           FROM documents),
             |st AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS stok
             |       FROM d GROUP BY source HAVING sum(n_tokens) > 0),
             |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS ttok FROM d),
             |rates AS (SELECT source,
             |            least(1.0,
             |              (CASE source WHEN 'src0' THEN 0.25
             |                           WHEN 'src1' THEN 0.15
             |                           ELSE 0.03 END)
             |              * (0.3 * ttok) / stok) AS rate
             |          FROM st CROSS JOIN tot),
             |u AS (SELECT doc_id, source, n_tokens,
             |        ('0x' || substr(md5(
             |           CAST(length(CAST(doc_id AS VARCHAR)) AS VARCHAR)
             |           || ':' || CAST(doc_id AS VARCHAR) || '/mix'), 1, 8))::BIGINT
             |          / 4294967296.0 AS uu
             |      FROM d)
             |SELECT u.source, doc_id, n_tokens, rate
             |FROM u JOIN rates USING (source)
             |WHERE uu < rate""".stripMargin)),

    // Per-source diversity cap: each source contributes its 15 BEST
    // docs by the pinned quality score (ties by doc_id) — the "cap a
    // domain's contribution, keep its best" curation rule, via the
    // bounded-state top_k_by_score aggregate (O(strata x k) on the
    // wire; the window form sorts every row of a hot source). The
    // kept-keys frame broadcasts back for the score column.
    QueryDef("p103_source_cap",
      (s, dir) => {
        val scored = TextAnalysis.qualityFeatures(Tables.documents(s, dir))
          .select(col("source"), col("doc_id"), col("quality_score"))
        scored.join(
          broadcast(Sampling.topKByStratum(
            scored, stratumCol = "source", scoreCol = "quality_score",
            keyCol = "doc_id", k = 15)),
          Seq("source", "doc_id"))
      },
      Some(s"""WITH f AS (SELECT doc_id, source, $qualityColsSql
             |           FROM documents),
             |q AS (SELECT doc_id, source,
             |        $qualityScoreSql AS quality_score
             |      FROM f),
             |r AS (SELECT *, row_number() OVER (
             |        PARTITION BY source
             |        ORDER BY quality_score DESC, doc_id) AS rn
             |      FROM q)
             |SELECT source, doc_id, quality_score
             |FROM r WHERE rn <= 15""".stripMargin)),

    // Adaptive per-language length filter: each language's [p5, p95]
    // n_chars bounds come from ITS OWN 64-row md5 reservoir (every
    // bound an actual data value — engine-exact), then the corpus
    // keeps rows inside their language's bounds. The data-derived
    // alternative to one global hand-tuned length window; bounds
    // frame is languages-sized and broadcasts onto the scan.
    QueryDef("p104_adaptive_length_filter",
      (s, dir) => Sampling.adaptiveSpreadFilter(
        Tables.documents(s, dir).select(
          col("lang"), col("doc_id"), col("n_chars")),
        groupCol = "lang", valueCol = "n_chars", keyCol = "doc_id",
        k = 64, loQ = 0.05, hiQ = 0.95, salt = "len"),
      Some("""WITH u AS (SELECT lang AS grp, doc_id AS k,
             |             CAST(n_chars AS DOUBLE) AS v
             |           FROM documents),
             |h AS (SELECT grp, k, v,
             |        ('0x' || substr(md5(
             |           CAST(length(CAST(k AS VARCHAR)) AS VARCHAR)
             |           || ':' || CAST(k AS VARCHAR) || '/len'), 1, 8))::BIGINT AS h
             |      FROM u),
             |r AS (SELECT *, row_number() OVER (
             |        PARTITION BY grp ORDER BY h, k) AS rn
             |      FROM h),
             |s AS (SELECT grp, v FROM r WHERE rn <= 64),
             |g AS (SELECT grp, list(v ORDER BY v) AS vals,
             |             CAST(count(*) AS BIGINT) AS n
             |      FROM s GROUP BY grp),
             |b AS (SELECT grp AS lang,
             |        vals[CAST(floor(0.05 * (n - 1)) AS INT) + 1] AS lo,
             |        vals[CAST(floor(0.95 * (n - 1)) AS INT) + 1] AS hi
             |      FROM g)
             |SELECT lang, doc_id, n_chars, lo, hi
             |FROM documents JOIN b USING (lang)
             |WHERE CAST(n_chars AS DOUBLE) BETWEEN lo AND hi""".stripMargin)),

    // CCNet-style perplexity-band filter: score every doc under the
    // corpus's own interpolated bigram LM (p73's exact chain), then
    // keep docs inside their LANGUAGE's [p10, p95] score band — the
    // adaptive-threshold composition (p73 x the p104 primitive): the
    // classic "drop the weird tail per language, with thresholds the
    // corpus derives for itself" curation rule. Cache discipline: the
    // scored frame caches only while the languages-sized bounds
    // materialize (one LM pass), then RELEASES — the final filter
    // recomputes one pass instead of pinning a corpus-grain cache for
    // the rest of the 180+-query harness session.
    QueryDef("p105_perplexity_band",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.documents(s, dir)
        val scored = TextAnalysis.bigramLogProb(docs)
          .join(docs.select(col("doc_id"), col("lang")), "doc_id")
          .cache()
        val bounds = Sampling.sampleQuantiles(scored, "lang",
            "avg_logprob", "doc_id", k = 64, qs = Seq(0.1, 0.95),
            salt = "ppl")
          .select(col("lang"), col("p10").as("lo"), col("p95").as("hi"))
          .collect()
          .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
          .toSeq
        scored.unpersist(false)
        scored.join(broadcast(bounds.toDF("lang", "lo", "hi")), Seq("lang"))
          .where(col("avg_logprob").between(col("lo"), col("hi")))
          .select("lang", "doc_id", "n_tokens", "avg_logprob", "lo", "hi")
      },
      Some(s"""WITH $bigramLmCtesSql,
             |d AS (SELECT lang, lm.doc_id, n_tokens, avg_logprob
             |      FROM lm JOIN documents ON documents.doc_id = lm.doc_id),
             |hh AS (SELECT lang AS grp, doc_id AS k, avg_logprob AS v,
             |         ('0x' || substr(md5(
             |            CAST(length(CAST(doc_id AS VARCHAR)) AS VARCHAR)
             |            || ':' || CAST(doc_id AS VARCHAR) || '/ppl'), 1, 8))::BIGINT AS h
             |       FROM d),
             |r AS (SELECT *, row_number() OVER (
             |        PARTITION BY grp ORDER BY h, k) AS rn
             |      FROM hh),
             |sm AS (SELECT grp, v FROM r WHERE rn <= 64),
             |g AS (SELECT grp, list(v ORDER BY v) AS vals,
             |             CAST(count(*) AS BIGINT) AS n
             |      FROM sm GROUP BY grp),
             |bnd AS (SELECT grp AS lang,
             |        vals[CAST(floor(0.1 * (n - 1)) AS INT) + 1] AS lo,
             |        vals[CAST(floor(0.95 * (n - 1)) AS INT) + 1] AS hi
             |      FROM g)
             |SELECT d.lang, d.doc_id, d.n_tokens, d.avg_logprob, bnd.lo, bnd.hi
             |FROM d JOIN bnd USING (lang)
             |WHERE d.avg_logprob BETWEEN bnd.lo AND bnd.hi""".stripMargin)),

    // k-anonymity suppression: publish only docs whose (lang, source)
    // quasi-identifier combo has >= 5 members — the release rule that
    // stops a rare combo from identifying its subject. k=5 splits the
    // gate corpus 42 kept / 55 suppressed combos (both classes real).
    // Survivors carry their anonymity-set size.
    QueryDef("p106_k_anonymity",
      (s, dir) => Pii.kAnonymitySuppress(
        Tables.documents(s, dir).select(
          col("lang"), col("source"), col("doc_id")),
        quasiCols = Seq("lang", "source"), k = 5),
      Some("""WITH c AS (SELECT lang AS cl, source AS cs,
             |             CAST(count(*) AS BIGINT) AS group_n
             |           FROM documents GROUP BY lang, source)
             |SELECT lang, source, doc_id, group_n
             |FROM documents JOIN c
             |  ON lang IS NOT DISTINCT FROM cl
             | AND source IS NOT DISTINCT FROM cs
             |WHERE group_n >= 5""".stripMargin)),

    // Multi-epoch mixture allocation: "train on 2.5 corpus-epochs of
    // tokens, 9% of them src0" — src0's allocation exceeds its supply
    // ~4.5x, so its docs repeat 4 or 5 times (the fractional epoch is
    // the md5-variate subsample); default strata land ~2.25 epochs.
    // The p102 budget mix CAPS at one pass; this REPEATS — together
    // they are the two halves of the pretraining data recipe.
    QueryDef("p107_epoch_allocation",
      (s, dir) => Sampling.epochAllocation(
        Tables.documents(s, dir)
          .select(col("doc_id"), col("source"),
            TextAnalysis.tokenCount(col("text")).as("n_tokens")),
        stratumCol = "source", tokenCol = "n_tokens",
        shares = Map("src0" -> 0.09), defaultShare = 0.045,
        budgetFrac = 2.5, keyCol = "doc_id", salt = "ep"),
      Some("""WITH d AS (SELECT doc_id, source,
             |            CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
             |                                 t -> t <> '')) AS BIGINT) AS n_tokens
             |           FROM documents),
             |st AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS stok
             |       FROM d GROUP BY source HAVING sum(n_tokens) > 0),
             |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS ttok FROM d),
             |rates AS (SELECT source,
             |            (CASE source WHEN 'src0' THEN 0.09
             |                         ELSE 0.045 END)
             |            * (2.5 * ttok) / stok AS rate
             |          FROM st CROSS JOIN tot),
             |u AS (SELECT doc_id, source, n_tokens,
             |        ('0x' || substr(md5(
             |           CAST(length(CAST(doc_id AS VARCHAR)) AS VARCHAR)
             |           || ':' || CAST(doc_id AS VARCHAR) || '/ep'), 1, 8))::BIGINT
             |          / 4294967296.0 AS uu
             |      FROM d),
             |rep AS (SELECT u.source, doc_id, n_tokens, rate,
             |          CAST(floor(rate) AS BIGINT)
             |            + CASE WHEN uu < rate - floor(rate) THEN 1 ELSE 0 END
             |            AS n_repeats
             |        FROM u JOIN rates USING (source))
             |SELECT source, doc_id, n_tokens, rate, n_repeats
             |FROM rep WHERE n_repeats > 0""".stripMargin)),

    // Length-bucketed batch assembly (dynamic batching): bucket by
    // token-length range (width 20 -> padding waste bounded per
    // batch), md5-shuffle within buckets, cut into batches of 8.
    // Ranks via ONE range-partitioned global sort over
    // (bucket, u, id) — buckets are few and huge, the hot-partition
    // shape a per-bucket window dies on; the oracle IS that window.
    QueryDef("p108_bucketed_batches",
      (s, dir) => Packing.bucketedBatches(
        Tables.documents(s, dir), bucketWidth = 20, batchSize = 8),
      Some("""WITH d AS (SELECT doc_id,
             |            CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
             |                                 t -> t <> '')) AS BIGINT) AS n_tokens
             |           FROM documents),
             |b AS (SELECT doc_id, n_tokens, n_tokens // 20 AS bucket,
             |        ('0x' || substr(md5(
             |           CAST(length(CAST(doc_id AS VARCHAR)) AS VARCHAR)
             |           || ':' || CAST(doc_id AS VARCHAR) || '/batch'), 1, 8))::BIGINT
             |          / 4294967296.0 AS u
             |      FROM d),
             |r AS (SELECT doc_id, n_tokens, bucket,
             |        row_number() OVER (
             |          PARTITION BY bucket ORDER BY u, doc_id) - 1 AS rr
             |      FROM b)
             |SELECT doc_id, n_tokens, bucket,
             |       rr // 8 AS batch_id, rr % 8 AS slot
             |FROM r""".stripMargin)),

    // The round-10 "assemble the training set" pipeline, composed
    // end-to-end (the release-side complement of p93's clean-the-
    // corpus pipeline): k-anonymity release gate -> per-source
    // quality cap -> per-language adaptive length filter -> epoch
    // allocation to the token budget -> length-bucketed batch
    // assembly. ONE text scan total, ZERO text shuffles: the quality
    // pass consumes text AT THE SCAN (per-row features commute with
    // the k-anonymity filter, so it runs first), every later stage —
    // including the k-anon combo join — is narrow-column algebra over
    // the cached scored frame (docs x 6 scalars — the p93 cache
    // discipline). Every stage is the SAME formula its fragment gate
    // pins (p106/p103/p104/p107/p108), chained in SQL as one CTE
    // cascade; PlanSpec proves no exchange carries text.
    QueryDef("p109_recipe_e2e",
      (s, dir) => {
        val st = recipeStages(s, dir)
        // provenance columns ride the batch coordinates through the
        // passthrough — the alloc chain executes exactly once
        Packing.bucketedBatchesFromCounts(
          st.alloc.select(col("source"), col("doc_id"),
            col("n_tokens"), col("n_repeats")),
          bucketWidth = 20, batchSize = 8, idCol = "doc_id",
          tokensCol = "n_tokens")
          .select("source", "doc_id", "n_tokens", "n_repeats",
            "bucket", "batch_id", "slot")
      },
      Some(s"""WITH anonc AS (SELECT lang AS al, source AS asrc,
             |                 CAST(count(*) AS BIGINT) AS gn
             |               FROM documents GROUP BY lang, source),
             |pub AS (SELECT d.doc_id, d.source, d.lang, d.text, d.n_chars
             |        FROM documents d JOIN anonc
             |          ON d.lang IS NOT DISTINCT FROM al
             |         AND d.source IS NOT DISTINCT FROM asrc
             |        WHERE gn >= 5),
             |q AS (SELECT doc_id, source, lang, n_chars, $qualityColsSql
             |      FROM pub),
             |qs AS (SELECT doc_id, source, lang, n_chars, n_tokens,
             |         $qualityScoreSql AS quality_score
             |       FROM q),
             |cap AS (SELECT doc_id, source, lang, n_chars, n_tokens
             |        FROM (SELECT qs.*, row_number() OVER (
             |                PARTITION BY source
             |                ORDER BY quality_score DESC, doc_id) AS rn
             |              FROM qs)
             |        WHERE rn <= 15),
             |lh AS (SELECT lang AS grp, doc_id AS k,
             |         CAST(n_chars AS DOUBLE) AS v,
             |         ('0x' || substr(md5(
             |            CAST(length(CAST(doc_id AS VARCHAR)) AS VARCHAR)
             |            || ':' || CAST(doc_id AS VARCHAR) || '/len'), 1, 8))::BIGINT AS h
             |       FROM cap),
             |lr AS (SELECT *, row_number() OVER (
             |         PARTITION BY grp ORDER BY h, k) AS rn
             |       FROM lh),
             |lg AS (SELECT grp, list(v ORDER BY v) AS vals,
             |              CAST(count(*) AS BIGINT) AS n
             |       FROM lr WHERE rn <= 64 GROUP BY grp),
             |lb AS (SELECT grp AS lang,
             |         vals[CAST(floor(0.05 * (n - 1)) AS INT) + 1] AS lo,
             |         vals[CAST(floor(0.95 * (n - 1)) AS INT) + 1] AS hi
             |       FROM lg),
             |sized AS (SELECT cap.doc_id, cap.source, cap.lang, cap.n_tokens
             |          FROM cap JOIN lb USING (lang)
             |          WHERE CAST(n_chars AS DOUBLE) BETWEEN lo AND hi),
             |st AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS stok
             |       FROM sized GROUP BY source HAVING sum(n_tokens) > 0),
             |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS ttok FROM sized),
             |rates AS (SELECT source,
             |            (CASE source WHEN 'src0' THEN 0.09
             |                         ELSE 0.045 END)
             |            * (2.5 * ttok) / stok AS rate
             |          FROM st CROSS JOIN tot),
             |eu AS (SELECT sized.*, rate,
             |         ('0x' || substr(md5(
             |            CAST(length(CAST(doc_id AS VARCHAR)) AS VARCHAR)
             |            || ':' || CAST(doc_id AS VARCHAR) || '/ep'), 1, 8))::BIGINT
             |           / 4294967296.0 AS uu
             |       FROM sized JOIN rates USING (source)),
             |alloc AS (SELECT doc_id, source, n_tokens,
             |            CAST(floor(rate) AS BIGINT)
             |              + CASE WHEN uu < rate - floor(rate) THEN 1 ELSE 0 END
             |              AS n_repeats
             |          FROM eu),
             |kept AS (SELECT * FROM alloc WHERE n_repeats > 0),
             |bu AS (SELECT doc_id, n_tokens, n_tokens // 20 AS bucket,
             |         ('0x' || substr(md5(
             |            CAST(length(CAST(doc_id AS VARCHAR)) AS VARCHAR)
             |            || ':' || CAST(doc_id AS VARCHAR) || '/batch'), 1, 8))::BIGINT
             |           / 4294967296.0 AS u
             |       FROM kept),
             |br AS (SELECT doc_id, n_tokens, bucket,
             |         row_number() OVER (
             |           PARTITION BY bucket ORDER BY u, doc_id) - 1 AS rr
             |       FROM bu)
             |SELECT k.source, b.doc_id, b.n_tokens, k.n_repeats,
             |       b.bucket, b.rr // 8 AS batch_id, b.rr % 8 AS slot
             |FROM br b JOIN kept k USING (doc_id)""".stripMargin)),

    // Pipeline yield report — the funnel every data team tracks: doc
    // and token counts surviving each stage of the p109 recipe, plus
    // token INSTANCES (supply x epoch repeats) for the allocated
    // stage. Built from the SAME staged frames as p109
    // (recipeStages), so the report can never drift from the
    // pipeline it describes; each stage row is one bounded aggregate
    // over the cached narrow frame.
    QueryDef("p110_recipe_yield",
      (s, dir) => {
        val st = recipeStages(s, dir)
        def stage(order: Int, name: String, df: DataFrame,
            repeats: org.apache.spark.sql.Column): DataFrame =
          df.agg(count(lit(1)).as("n_docs"),
            coalesce(sum(col("n_tokens")), lit(0L)).as("n_tokens"),
            coalesce(sum(col("n_tokens") * repeats), lit(0L))
              .as("n_token_instances"))
            .select(lit(order).as("stage_order"), lit(name).as("stage"),
              col("n_docs"), col("n_tokens"), col("n_token_instances"))
        stage(1, "raw", st.scoredAll, lit(1L))
          .unionAll(stage(2, "k_anonymized", st.scored, lit(1L)))
          .unionAll(stage(3, "quality_capped", st.capped, lit(1L)))
          .unionAll(stage(4, "length_filtered", st.sized, lit(1L)))
          .unionAll(stage(5, "epoch_allocated", st.alloc, col("n_repeats")))
      },
      Some(s"""WITH q AS (SELECT doc_id, source, lang, n_chars, $qualityColsSql
             |           FROM documents),
             |qs AS (SELECT doc_id, source, lang, n_chars, n_tokens,
             |         $qualityScoreSql AS quality_score
             |       FROM q),
             |anonc AS (SELECT lang AS al, source AS asrc,
             |            CAST(count(*) AS BIGINT) AS gn
             |          FROM documents GROUP BY lang, source),
             |anon AS (SELECT qs.* FROM qs JOIN anonc
             |           ON lang IS NOT DISTINCT FROM al
             |          AND source IS NOT DISTINCT FROM asrc
             |         WHERE gn >= 5),
             |cap AS (SELECT doc_id, source, lang, n_chars, n_tokens
             |        FROM (SELECT anon.*, row_number() OVER (
             |                PARTITION BY source
             |                ORDER BY quality_score DESC, doc_id) AS rn
             |              FROM anon)
             |        WHERE rn <= 15),
             |lh AS (SELECT lang AS grp, doc_id AS k,
             |         CAST(n_chars AS DOUBLE) AS v,
             |         ('0x' || substr(md5(
             |            CAST(length(CAST(doc_id AS VARCHAR)) AS VARCHAR)
             |            || ':' || CAST(doc_id AS VARCHAR) || '/len'), 1, 8))::BIGINT AS h
             |       FROM cap),
             |lr AS (SELECT *, row_number() OVER (
             |         PARTITION BY grp ORDER BY h, k) AS rn
             |       FROM lh),
             |lg AS (SELECT grp, list(v ORDER BY v) AS vals,
             |              CAST(count(*) AS BIGINT) AS n
             |       FROM lr WHERE rn <= 64 GROUP BY grp),
             |lb AS (SELECT grp AS lang,
             |         vals[CAST(floor(0.05 * (n - 1)) AS INT) + 1] AS lo,
             |         vals[CAST(floor(0.95 * (n - 1)) AS INT) + 1] AS hi
             |       FROM lg),
             |sized AS (SELECT cap.doc_id, cap.source, cap.lang, cap.n_tokens
             |          FROM cap JOIN lb USING (lang)
             |          WHERE CAST(n_chars AS DOUBLE) BETWEEN lo AND hi),
             |stk AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS stok
             |        FROM sized GROUP BY source HAVING sum(n_tokens) > 0),
             |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS ttok FROM sized),
             |rates AS (SELECT source,
             |            (CASE source WHEN 'src0' THEN 0.09
             |                         ELSE 0.045 END)
             |            * (2.5 * ttok) / stok AS rate
             |          FROM stk CROSS JOIN tot),
             |eu AS (SELECT sized.*, rate,
             |         ('0x' || substr(md5(
             |            CAST(length(CAST(doc_id AS VARCHAR)) AS VARCHAR)
             |            || ':' || CAST(doc_id AS VARCHAR) || '/ep'), 1, 8))::BIGINT
             |           / 4294967296.0 AS uu
             |       FROM sized JOIN rates USING (source)),
             |kept AS (SELECT doc_id, n_tokens,
             |           CAST(floor(rate) AS BIGINT)
             |             + CASE WHEN uu < rate - floor(rate) THEN 1 ELSE 0 END
             |             AS n_repeats
             |         FROM eu
             |         WHERE CAST(floor(rate) AS BIGINT)
             |             + CASE WHEN uu < rate - floor(rate) THEN 1 ELSE 0 END > 0)
             |SELECT 1 AS stage_order, 'raw' AS stage,
             |       CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS n_tokens,
             |       CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS n_token_instances
             |FROM qs
             |UNION ALL SELECT 2, 'k_anonymized', CAST(count(*) AS BIGINT),
             |       CAST(coalesce(sum(n_tokens), 0) AS BIGINT),
             |       CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM anon
             |UNION ALL SELECT 3, 'quality_capped', CAST(count(*) AS BIGINT),
             |       CAST(coalesce(sum(n_tokens), 0) AS BIGINT),
             |       CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM cap
             |UNION ALL SELECT 4, 'length_filtered', CAST(count(*) AS BIGINT),
             |       CAST(coalesce(sum(n_tokens), 0) AS BIGINT),
             |       CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM sized
             |UNION ALL SELECT 5, 'epoch_allocated', CAST(count(*) AS BIGINT),
             |       CAST(coalesce(sum(n_tokens), 0) AS BIGINT),
             |       CAST(coalesce(sum(n_tokens * n_repeats), 0) AS BIGINT)
             |FROM kept""".stripMargin)),

    // Multi-benchmark decontamination: the whole eval SUITE checked
    // in ONE corpus pass — per (doc, benchmark) 4-gram overlap, the
    // corpus shingled once and every benchmark's distinct shingles
    // riding a single broadcast (rescanning the corpus per benchmark
    // multiplies the dominant cost by the suite size). Benchmarks =
    // the two held-out slices doc_id % 50 in {0, 1}.
    QueryDef("p111_multi_benchmark",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Contamination.multiOverlap(
          docs.where(col("doc_id") % 50 >= 2),
          Seq(
            "bench_a" -> docs.where(col("doc_id") % 50 === 0),
            "bench_b" -> docs.where(col("doc_id") % 50 === 1)),
          n = 4)
      },
      Some("""WITH tk AS (SELECT doc_id,
             |         list_filter(string_split_regex(trim(text), '\s+'),
             |                     t -> t <> '') AS w
             |       FROM documents),
             |sh AS (SELECT DISTINCT doc_id, gram FROM (
             |  SELECT doc_id, unnest(list_transform(range(1, len(w) - 2),
             |         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS gram
             |  FROM tk)),
             |c AS (SELECT * FROM sh WHERE doc_id % 50 >= 2),
             |b AS (SELECT 'bench_a' AS bench_id, gram
             |      FROM (SELECT DISTINCT gram FROM sh WHERE doc_id % 50 = 0)
             |      UNION ALL
             |      SELECT 'bench_b', gram
             |      FROM (SELECT DISTINCT gram FROM sh WHERE doc_id % 50 = 1)),
             |pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
             |       FROM c GROUP BY doc_id),
             |hits AS (SELECT doc_id, bench_id,
             |           CAST(count(*) AS BIGINT) AS n_overlap
             |         FROM c JOIN b USING(gram) GROUP BY doc_id, bench_id)
             |SELECT h.doc_id, h.bench_id, pd.n_shingles, h.n_overlap,
             |       CAST(h.n_overlap AS DOUBLE) / pd.n_shingles AS contamination
             |FROM hits h JOIN pd USING(doc_id)""".stripMargin))
  )

  /** The p98 retrieval fixture — shared verbatim with the streaming
    * twin (st22) so the two gates can never drift.
    */
  private[queries] val RetrievalQueries: Seq[TextAnalysis.TermQuery] = Seq(
    TextAnalysis.TermQuery(0L, Seq("spark", "dup")),
    TextAnalysis.TermQuery(1L, Seq("vector", "stream", "merge")),
    TextAnalysis.TermQuery(2L, Seq("hash", "nosuchterm")))

  /** The p98 multi-query BM25 oracle, shared VERBATIM by the batch
    * gate and its streaming twin (st22): online scoring under frozen
    * corpus stats is a pure per-row projection, and the frozen stats
    * are computed from the SAME corpus the stream replays — so the
    * two surfaces must hash-match the same SQL.
    */
  /** The p109 recipe chain's staged frames, shared by the e2e gate
    * (p109) and the yield report (p110) so the two can never drift.
    * `scoredAll` (quality features of EVERY doc — the one text scan)
    * is MATERIALIZED as the narrow docs × 6-scalar frame
    * ([[graft.operators.Materialize.boundary]]) rather than cached:
    * each gate leaves nothing pinned in the session cache manager for
    * the rest of a long harness run, and the boundary is exactly the
    * one-time stage write a 100 TB recipe build performs. Every stage
    * after it is column algebra over the read-back.
    */
  private final case class RecipeStages(scoredAll: DataFrame,
      scored: DataFrame, capped: DataFrame, sized: DataFrame,
      alloc: DataFrame)

  private def recipeStages(s: SparkSession, dir: String): RecipeStages = {
    val docs = Tables.documents(s, dir)
    val scoredAll = graft.operators.Materialize.boundary(
      TextAnalysis.qualityFeatures(docs)
        .select(col("source"), col("lang"), col("doc_id"),
          col("n_chars"), col("n_tokens"), col("quality_score")),
      sys.props("java.io.tmpdir") + "/graft_recipe_boundary/scored_all")
    val scored = Pii.kAnonymitySuppress(scoredAll, Seq("lang", "source"),
      k = 5).drop("group_n")
    val capped = scored.join(
      broadcast(Sampling.topKByStratum(scored, "source",
        "quality_score", "doc_id", 15)),
      Seq("source", "doc_id"))
    val sized = Sampling.adaptiveSpreadFilter(capped, "lang",
      "n_chars", "doc_id", k = 64, loQ = 0.05, hiQ = 0.95,
      salt = "len").drop("lo", "hi")
    val alloc = Sampling.epochAllocation(sized, "source", "n_tokens",
      Map("src0" -> 0.09), defaultShare = 0.045, budgetFrac = 2.5,
      keyCol = "doc_id", salt = "ep")
    RecipeStages(scoredAll, scored, capped, sized, alloc)
  }

  /** The interpolated bigram-LM CTE cascade (tokens WITH positions,
    * both count tables, the pinned-order mixture arithmetic, per-doc
    * average) — shared by p73, the p105 band filter and the st25
    * streaming twin so the three gates can never drift. Ends with the
    * `lm(doc_id, n_tokens, avg_logprob)` table.
    */
  private[queries] val bigramLmCtesSql: String =
    """arr AS (
      |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
      |                             t -> t <> '') AS w
      |  FROM documents),
      |tok AS (SELECT doc_id, w[i] AS term,
      |               CASE WHEN i > 1 THEN w[i-1] END AS prev
      |        FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS i
      |              FROM arr)),
      |uni AS (SELECT term, CAST(count(*) AS BIGINT) AS cu
      |        FROM tok GROUP BY term),
      |tot AS (SELECT CAST(sum(cu) AS BIGINT) AS n FROM uni),
      |bi AS (SELECT prev, term, CAST(count(*) AS BIGINT) AS cb
      |       FROM tok WHERE prev IS NOT NULL GROUP BY prev, term),
      |p AS (SELECT t.doc_id,
      |             CASE WHEN t.prev IS NULL
      |                  THEN CAST(u.cu AS DOUBLE) / n
      |                  ELSE (0.75::DOUBLE * CAST(COALESCE(b.cb, 0) AS DOUBLE))
      |                         / up.cup
      |                       + (0.25::DOUBLE * CAST(u.cu AS DOUBLE)) / n
      |             END AS p
      |      FROM tok t
      |      JOIN uni u USING (term)
      |      LEFT JOIN (SELECT term AS pterm, cu AS cup FROM uni) up
      |        ON up.pterm = t.prev
      |      LEFT JOIN bi b ON b.prev = t.prev AND b.term = t.term
      |      CROSS JOIN tot),
      |lm AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |              sum(ln(p)) / count(*) AS avg_logprob
      |       FROM p GROUP BY doc_id)""".stripMargin

  private[queries] val bigramLogProbOracleSql: String =
    s"""WITH $bigramLmCtesSql
       |SELECT doc_id, n_tokens, avg_logprob FROM lm""".stripMargin

  /** The p24 decontamination oracle (corpus = doc_id % 50 <> 0,
    * benchmark = the % 50 == 0 slice, word 4-grams) — shared VERBATIM
    * by the p24 batch gate and the st30 streaming gate (the streaming
    * scorer's emission contract is the batch operator's, so one SQL
    * definition gates both).
    */
  /** The p115 surgical-excision oracle — shared VERBATIM by the
    * p115 batch gate and the st32 streaming gate (one definition for
    * the coverage arithmetic, per the p24/st30 discipline).
    */
  private[queries] val decontaminationExciseOracleSql: String =
    """WITH tk AS (SELECT doc_id,
      |         list_filter(string_split_regex(trim(text), '\s+'),
      |                     t -> t <> '') AS w
      |       FROM documents),
      |pos AS (SELECT doc_id, CAST(i - 1 AS INT) AS pos, w[i] AS tok
      |        FROM (SELECT doc_id, w,
      |                     unnest(range(1, len(w) + 1)) AS i FROM tk)),
      |gr AS (SELECT doc_id, CAST(i - 1 AS INT) AS pos,
      |              w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS gram
      |       FROM (SELECT doc_id, w,
      |                    unnest(range(1, len(w) - 2)) AS i FROM tk)),
      |b AS (SELECT DISTINCT gram FROM gr WHERE doc_id % 50 = 0),
      |cov AS (SELECT DISTINCT g.doc_id, g.pos + ofs.o AS pos
      |        FROM gr g JOIN b USING (gram)
      |        CROSS JOIN (SELECT CAST(unnest(range(4)) AS INT) AS o) ofs
      |        WHERE g.doc_id % 50 <> 0),
      |kept AS (SELECT p.doc_id, p.pos, p.tok FROM pos p
      |         LEFT JOIN cov c ON c.doc_id = p.doc_id AND c.pos = p.pos
      |         WHERE p.doc_id % 50 <> 0 AND c.pos IS NULL),
      |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
      |               string_agg(tok, ' ' ORDER BY pos) AS clean_text
      |        FROM kept GROUP BY doc_id),
      |nt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens
      |       FROM pos WHERE doc_id % 50 <> 0 GROUP BY doc_id)
      |SELECT d.doc_id,
      |       coalesce(nt.n_tokens, 0) AS n_tokens,
      |       coalesce(nt.n_tokens, 0) - coalesce(a.n_kept, 0)
      |         AS n_removed,
      |       coalesce(a.clean_text, '') AS clean_text
      |FROM (SELECT doc_id FROM documents WHERE doc_id % 50 <> 0) d
      |LEFT JOIN nt ON nt.doc_id = d.doc_id
      |LEFT JOIN agg a ON a.doc_id = d.doc_id""".stripMargin

  /** The p116 MV-navigation oracle (base-table arithmetic) — shared
    * verbatim by the p116 batch gate and the st33
    * incremental-maintenance gate.
    */
  private[queries] val mvRewriteOracleSql: String =
    """SELECT l_returnflag,
      |       SUM(l_quantity) AS sum_qty,
      |       COUNT(*) AS n_rows,
      |       MIN(l_quantity) AS min_qty,
      |       MAX(l_quantity) AS max_qty,
      |       AVG(l_quantity) AS avg_qty
      |FROM lineitem
      |WHERE l_linestatus = 'F'
      |GROUP BY l_returnflag""".stripMargin

  /** The p119 sketch-navigation oracle (base-table register
    * arithmetic) — shared verbatim by the p119 batch gate and the
    * st35 incremental-maintenance gate.
    */
  private[queries] val mvDistinctNavOracleSql: String =
    """WITH f AS (SELECT l_returnflag AS g, l_suppkey, l_quantity
             |           FROM lineitem WHERE l_linestatus = 'F'),
             |h AS (SELECT DISTINCT g,
             |        ('0x' || substr(md5(CAST(l_suppkey AS VARCHAR)), 1, 15))::BIGINT AS h
             |      FROM f),
             |rho AS (SELECT g, h % 16 AS bucket,
             |               CASE WHEN h // 16 = 0 THEN 57
             |                    ELSE 56 - length(bin(h // 16)) + 1 END AS rho
             |        FROM h),
             |base AS (SELECT DISTINCT g FROM f),
             |regs AS (SELECT base.g, b.bucket, COALESCE(mx.mr, 0) AS reg
             |         FROM base
             |         CROSS JOIN (SELECT unnest(range(16)) AS bucket) b
             |         LEFT JOIN (SELECT g, bucket, max(rho) AS mr
             |                    FROM rho GROUP BY g, bucket) mx
             |           ON mx.g = base.g AND mx.bucket = b.bucket),
             |agg AS (SELECT g,
             |          md5(string_agg(CAST(reg AS VARCHAR), ',' ORDER BY bucket))
             |            AS register_digest,
             |          CAST(sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS BIGINT)
             |            AS n_zero_registers,
             |          CAST(sum(1::HUGEINT << (61 - CAST(reg AS INT))) AS DOUBLE)
             |            AS harmonic_scaled
             |        FROM regs GROUP BY g),
             |q AS (SELECT g, SUM(l_quantity) AS sum_qty FROM f GROUP BY g)
             |SELECT q.g AS l_returnflag, q.sum_qty, a.register_digest,
             |       a.n_zero_registers, a.harmonic_scaled,
             |       (0.7213 / (1 + 1.079 / 16.0)) * 256.0
             |         * 2305843009213693952.0 / a.harmonic_scaled
             |         AS est_distinct
             |FROM q JOIN agg a ON a.g = q.g""".stripMargin

  /** One NSW construction chain over the subset of `e` where
    * `where` holds, CTE names prefixed `p` — mirrors
    * [[graft.pipeline.GraphAnn.buildEdges]] with the shared `cent`
    * hub CTE (hub geometry is FIXED across base and append batches,
    * like IVF centroids): buckets, within-bucket pairs, per-src
    * top-m, symmetrize + the 2m M_max prune (`${p}knnc`), hub argmax
    * assignment with the IVF tie-break, up-links (`${p}upc`) and
    * capped downlinks (`${p}dwnc`). All three emit (src, dst, cos)
    * so lifecycle oracles can re-cap after unioning batches.
    */
  private def nswChainCtes(p: String, where: String): String =
    s"""${p}b AS (SELECT vec_id, v, ${bucketSql("v", 4)} AS bucket
       |          FROM e WHERE $where),
       |${p}pr AS (SELECT a.vec_id AS src, c.vec_id AS dst,
       |              ${cosineSql("a.v", "c.v")} AS cos
       |       FROM ${p}b a JOIN ${p}b c ON a.bucket = c.bucket
       |                        AND a.vec_id <> c.vec_id),
       |${p}topm AS (SELECT src, dst, cos FROM (
       |           SELECT *, row_number() OVER (PARTITION BY src
       |             ORDER BY cos DESC, dst ASC) AS rn FROM ${p}pr)
       |         WHERE rn <= 8),
       |${p}sym AS (SELECT src, dst, max(cos) AS cos FROM (
       |          SELECT src, dst, cos FROM ${p}topm
       |          UNION ALL
       |          SELECT dst AS src, src AS dst, cos FROM ${p}topm)
       |        GROUP BY src, dst),
       |${p}knnc AS (SELECT src, dst, cos FROM (
       |          SELECT *, row_number() OVER (PARTITION BY src
       |            ORDER BY cos DESC, dst ASC) AS rn FROM ${p}sym)
       |        WHERE rn <= 16),
       |${p}asg AS (SELECT vec_id, v, hid, hv FROM (
       |          SELECT e.vec_id, e.v, c.hid, c.hv,
       |                 row_number() OVER (PARTITION BY e.vec_id
       |                   ORDER BY list_dot_product(e.v, c.hv)
       |                            / sqrt(list_dot_product(c.hv, c.hv)) DESC,
       |                            c.hid DESC) AS rn
       |          FROM e CROSS JOIN cent c WHERE $where)
       |        WHERE rn = 1),
       |${p}upc AS (SELECT vec_id AS src, hid AS dst,
       |              ${cosineSql("v", "hv")} AS cos
       |            FROM ${p}asg WHERE vec_id <> hid),
       |${p}dwnc AS (SELECT hid AS src, vec_id AS dst, cos FROM (
       |          SELECT hid, vec_id, cos,
       |                 row_number() OVER (PARTITION BY hid
       |                   ORDER BY cos DESC, vec_id ASC) AS rn
       |          FROM (SELECT a.hid, a.vec_id,
       |                       ${cosineSql("a.v", "a.hv")} AS cos,
       |                       row_number() OVER (PARTITION BY a.hid, bb.bucket
       |                         ORDER BY ${cosineSql("a.v", "a.hv")} DESC,
       |                                  a.vec_id ASC) AS rq
       |                FROM ${p}asg a JOIN ${p}b bb ON bb.vec_id = a.vec_id
       |                WHERE a.vec_id <> a.hid)
       |          WHERE rq <= 4)
       |        WHERE rn <= 64)""".stripMargin

  /** The md5-strided hub CTEs (`stride`, `cent`) — exactly
    * [[graft.pipeline.Similarity.sampleCentroids]] over the FULL
    * embeddings table, the p20/p22 oracle form.
    */
  private def nswHubCtes: String =
    """stride AS (SELECT greatest(count(*) // 16, 1) AS bkt
      |           FROM embeddings),
      |cent AS (SELECT vec_id AS hid, v AS hv
      |         FROM e, stride
      |         WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR) || '/ivf'), 1, 8))::BIGINT
      |               % bkt = 0
      |         ORDER BY vec_id LIMIT 16)""".stripMargin

  /** The beam-search tail over a prepared `edges(src, dst)` CTE —
    * entry at the top-8 hubs, three expand/score/prune rounds with
    * visited-set anti-joins, final per-query top-10. Mirrors
    * [[graft.pipeline.GraphAnn.searchAll]] at the gate defaults.
    * `rankWhere` (over `node`) mirrors the `allowed` rank-time
    * filter: routing unrestricted, only matching nodes may rank.
    */
  private def nswBeamTailSql(rankWhere: String = "TRUE"): String = {
    def round(i: Int): String = {
      val pf = s"f${i - 1}"
      val pv = s"v${i - 1}"
      s"""c$i AS (SELECT DISTINCT f.qid, ed.dst AS node
         |        FROM $pf f JOIN edges ed ON ed.src = f.node),
         |n$i AS (SELECT c.qid, c.node,
         |          ${cosineSql("e2.v", "q.qv")} AS cos
         |        FROM c$i c
         |        JOIN e e2 ON e2.vec_id = c.node
         |        JOIN q ON q.qid = c.qid
         |        WHERE NOT EXISTS (SELECT 1 FROM $pv v
         |                          WHERE v.qid = c.qid AND v.node = c.node)),
         |v$i AS (SELECT * FROM $pv UNION ALL SELECT * FROM n$i),
         |f$i AS (SELECT qid, node, cos FROM (
         |          SELECT *, row_number() OVER (PARTITION BY qid
         |            ORDER BY cos DESC, node ASC) AS rn FROM n$i)
         |        WHERE rn <= 8)"""
    }
    s"""q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % 31 = 0),
       |f0 AS (SELECT qid, node, cos FROM (
       |         SELECT q.qid, c.hid AS node,
       |                ${cosineSql("c.hv", "q.qv")} AS cos,
       |                row_number() OVER (PARTITION BY q.qid
       |                  ORDER BY ${cosineSql("c.hv", "q.qv")} DESC,
       |                           c.hid ASC) AS rn
       |         FROM cent c CROSS JOIN q)
       |       WHERE rn <= 8),
       |f0r AS (SELECT f0.* FROM f0
       |        WHERE EXISTS (SELECT 1 FROM edges ed WHERE ed.src = f0.node)),
       |v0 AS (SELECT qid, node, cos FROM f0),
       |${round(1)},
       |${round(2)},
       |${round(3)}
       |SELECT qid AS query_id, node AS vec_id, cos AS cosine,
       |       CAST(rank AS INT) AS rank
       |FROM (SELECT qid, node, cos,
       |             row_number() OVER (PARTITION BY qid
       |               ORDER BY cos DESC, node ASC) AS rank
       |      FROM (SELECT * FROM f0r UNION ALL SELECT * FROM n1
       |            UNION ALL SELECT * FROM n2 UNION ALL SELECT * FROM n3)
       |      WHERE node <> qid AND ($rankWhere))
       |WHERE rank <= 10""".stripMargin
  }

  /** The ACORN beam tail (round 15): predicate-aware filtered search
    * over a prepared `edges(src, dst)` CTE — mirrors
    * [[graft.pipeline.GraphAnn.searchAllAcorn]] at the gate defaults
    * (beam 8, rounds 3, k 10). Differences from [[nswBeamTailSql]]:
    * TWO entry beams (top hubs overall UNION top PASSING hubs — the
    * predicate-subgraph entry), candidates restricted to passing
    * nodes, and the two-hop rule — a failing one-hop neighbor
    * contributes its own passing neighbors instead of ranking.
    * `passWhere` is the predicate over a bare node id column.
    */
  private def nswAcornBeamTailSql(passWhere: String => String): String = {
    def round(i: Int): String = {
      val pf = s"f${i - 1}"
      val pv = s"v${i - 1}"
      s"""h$i AS (SELECT DISTINCT f.qid, ed.dst AS node
         |        FROM $pf f JOIN edges ed ON ed.src = f.node),
         |x$i AS (SELECT DISTINCT h.qid, ed2.dst AS node
         |        FROM h$i h JOIN edges ed2 ON ed2.src = h.node
         |        WHERE NOT (${passWhere("h.node")})
         |          AND (${passWhere("ed2.dst")})),
         |c$i AS (SELECT DISTINCT qid, node FROM (
         |          SELECT qid, node FROM h$i WHERE ${passWhere("node")}
         |          UNION ALL SELECT qid, node FROM x$i)),
         |n$i AS (SELECT c.qid, c.node,
         |          ${cosineSql("e2.v", "q.qv")} AS cos
         |        FROM c$i c
         |        JOIN e e2 ON e2.vec_id = c.node
         |        JOIN q ON q.qid = c.qid
         |        WHERE NOT EXISTS (SELECT 1 FROM $pv v
         |                          WHERE v.qid = c.qid AND v.node = c.node)),
         |v$i AS (SELECT qid, node FROM $pv
         |        UNION ALL SELECT qid, node FROM n$i),
         |f$i AS (SELECT qid, node FROM (
         |          SELECT *, row_number() OVER (PARTITION BY qid
         |            ORDER BY cos DESC, node ASC) AS rn FROM n$i)
         |        WHERE rn <= 8)"""
    }
    s"""q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % 31 = 0),
       |sc AS (SELECT q.qid, c.hid AS node,
       |              ${cosineSql("c.hv", "q.qv")} AS cos
       |       FROM cent c CROSS JOIN q),
       |f0 AS (SELECT DISTINCT qid, node, cos FROM (
       |         SELECT qid, node, cos FROM (
       |           SELECT *, row_number() OVER (PARTITION BY qid
       |             ORDER BY cos DESC, node ASC) AS rn FROM sc)
       |         WHERE rn <= 8
       |         UNION ALL
       |         SELECT qid, node, cos FROM (
       |           SELECT *, row_number() OVER (PARTITION BY qid
       |             ORDER BY cos DESC, node ASC) AS rn FROM sc
       |           WHERE ${passWhere("node")})
       |         WHERE rn <= 8)),
       |f0r AS (SELECT f0.* FROM f0
       |        WHERE EXISTS (SELECT 1 FROM edges ed WHERE ed.src = f0.node)
       |          AND (${passWhere("f0.node")})),
       |v0 AS (SELECT qid, node FROM f0),
       |${round(1)},
       |${round(2)},
       |${round(3)}
       |SELECT qid AS query_id, node AS vec_id, cos AS cosine,
       |       CAST(rank AS INT) AS rank
       |FROM (SELECT qid, node, cos,
       |             row_number() OVER (PARTITION BY qid
       |               ORDER BY cos DESC, node ASC) AS rank
       |      FROM (SELECT qid, node, cos FROM f0r
       |            UNION ALL SELECT qid, node, cos FROM n1
       |            UNION ALL SELECT qid, node, cos FROM n2
       |            UNION ALL SELECT qid, node, cos FROM n3)
       |      WHERE node <> qid)
       |WHERE rank <= 10""".stripMargin
  }

  /** The p148 ACORN filtered-search oracle: the p132 construction
    * with the predicate-aware beam tail at selectivity 1/8.
    */
  private[queries] def nswAcornOracleSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |           FROM embeddings),
       |$nswHubCtes,
       |${nswChainCtes("", "TRUE")},
       |edges AS (SELECT src, dst FROM knnc
       |          UNION SELECT src, dst FROM upc
       |          UNION SELECT src, dst FROM dwnc),
       |${nswAcornBeamTailSql(n => s"$n % 8 = 0")}""".stripMargin

  /** The p132 graph-ANN oracle — the FULL NSW construction plus all
    * three beam rounds and the final top-10, in SQL. Shared verbatim
    * by the p132 batch gate and the st40 streaming serving twin: the
    * index is static and per-query beam results are
    * batch-independent, so the replay must hash-equal the batch.
    */
  private[queries] def nswTopkOracleSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |           FROM embeddings),
       |$nswHubCtes,
       |${nswChainCtes("", "TRUE")},
       |edges AS (SELECT src, dst FROM knnc
       |          UNION SELECT src, dst FROM upc
       |          UNION SELECT src, dst FROM dwnc),
       |${nswBeamTailSql()}""".stripMargin

  /** The p139 filtered-search oracle: identical construction and
    * beam, with the rank-time predicate on `node` — routing
    * unrestricted, only matching ids rank.
    */
  private[queries] def nswFilteredOracleSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |           FROM embeddings),
       |$nswHubCtes,
       |${nswChainCtes("", "TRUE")},
       |edges AS (SELECT src, dst FROM knnc
       |          UNION SELECT src, dst FROM upc
       |          UNION SELECT src, dst FROM dwnc),
       |${nswBeamTailSql("node % 3 = 0")}""".stripMargin

  /** The p135 lifecycle oracle: base batch built over the EVEN half
    * ([[graft.pipeline.GraphAnn.writeIndex]]'s full construction on
    * that subset), the odd half LINKED IN batch-proportionally
    * (exactly [[graft.pipeline.GraphAnn.appendToIndex]]: odd-src ×
    * full-corpus bucket-mate candidates → per-src top-m → reversed
    * set for the old side, NO 2m prune at append; odd-only hub
    * up-links and per-(hub, bucket) quota downlinks among the odd),
    * tombstoned ids dropped from BOTH endpoints, then compaction's
    * per-(src, kind) degree re-cap — and the same beam tail over the
    * surviving edge set.
    */
  private[queries] def nswLifecycleOracleSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |           FROM embeddings),
       |$nswHubCtes,
       |${nswChainCtes("ev", "vec_id % 2 = 0")},
       |fb AS (SELECT vec_id, v, ${bucketSql("v", 4)} AS bucket FROM e),
       |appr AS (SELECT a.vec_id AS src, c.vec_id AS dst,
       |                ${cosineSql("a.v", "c.v")} AS cos
       |         FROM fb a JOIN fb c ON a.bucket = c.bucket
       |                            AND a.vec_id <> c.vec_id
       |         WHERE a.vec_id % 2 = 1),
       |aptopm AS (SELECT src, dst, cos FROM (
       |             SELECT *, row_number() OVER (PARTITION BY src
       |               ORDER BY cos DESC, dst ASC) AS rn FROM appr)
       |           WHERE rn <= 8),
       |apknnc AS (SELECT src, dst, max(cos) AS cos FROM (
       |             SELECT src, dst, cos FROM aptopm
       |             UNION ALL
       |             SELECT dst AS src, src AS dst, cos FROM aptopm)
       |           GROUP BY src, dst),
       |apasg AS (SELECT vec_id, v, hid, hv FROM (
       |            SELECT e.vec_id, e.v, c.hid, c.hv,
       |                   row_number() OVER (PARTITION BY e.vec_id
       |                     ORDER BY list_dot_product(e.v, c.hv)
       |                              / sqrt(list_dot_product(c.hv, c.hv)) DESC,
       |                              c.hid DESC) AS rn
       |            FROM e CROSS JOIN cent c WHERE e.vec_id % 2 = 1)
       |          WHERE rn = 1),
       |apupc AS (SELECT vec_id AS src, hid AS dst,
       |            ${cosineSql("v", "hv")} AS cos
       |          FROM apasg WHERE vec_id <> hid),
       |apdwnc AS (SELECT hid AS src, vec_id AS dst, cos FROM (
       |          SELECT hid, vec_id, cos,
       |                 row_number() OVER (PARTITION BY hid
       |                   ORDER BY cos DESC, vec_id ASC) AS rn
       |          FROM (SELECT a.hid, a.vec_id,
       |                       ${cosineSql("a.v", "a.hv")} AS cos,
       |                       row_number() OVER (PARTITION BY a.hid, bb.bucket
       |                         ORDER BY ${cosineSql("a.v", "a.hv")} DESC,
       |                                  a.vec_id ASC) AS rq
       |                FROM apasg a JOIN fb bb ON bb.vec_id = a.vec_id
       |                WHERE a.vec_id <> a.hid)
       |          WHERE rq <= 4)
       |        WHERE rn <= 64),
       |dead AS (SELECT vec_id AS id FROM e WHERE vec_id % 50 = 7),
       |uni AS (SELECT src, dst, cos, 'knn' AS kind FROM evknnc
       |        UNION ALL
       |        SELECT src, dst, cos, 'knn' FROM apknnc
       |        UNION ALL
       |        SELECT src, dst, cos, 'hub' FROM evupc
       |        UNION ALL
       |        SELECT src, dst, cos, 'hub' FROM apupc
       |        UNION ALL
       |        SELECT src, dst, cos, 'hub' FROM evdwnc
       |        UNION ALL
       |        SELECT src, dst, cos, 'hub' FROM apdwnc),
       |ded AS (SELECT src, dst, kind, max(cos) AS cos FROM uni
       |        GROUP BY src, dst, kind),
       |alive AS (SELECT * FROM ded
       |          WHERE src NOT IN (SELECT id FROM dead)
       |            AND dst NOT IN (SELECT id FROM dead)),
       |recap AS (SELECT src, dst, kind FROM (
       |            SELECT *, row_number() OVER (PARTITION BY src, kind
       |              ORDER BY cos DESC, dst ASC) AS rn FROM alive)
       |          WHERE (kind = 'knn' AND rn <= 16)
       |             OR (kind = 'hub' AND rn <= 64)),
       |edges AS (SELECT DISTINCT src, dst FROM recap),
       |${nswBeamTailSql()}""".stripMargin

  private[queries] val decontaminationOracleSql: String =
    """WITH tk AS (SELECT doc_id,
      |         list_filter(string_split_regex(trim(text), '\s+'),
      |                     t -> t <> '') AS w
      |       FROM documents),
      |sh AS (SELECT DISTINCT doc_id, gram FROM (
      |  SELECT doc_id, unnest(list_transform(range(1, len(w) - 2),
      |         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS gram
      |  FROM tk)),
      |c AS (SELECT * FROM sh WHERE doc_id % 50 <> 0),
      |b AS (SELECT DISTINCT gram FROM sh WHERE doc_id % 50 = 0),
      |pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles FROM c GROUP BY doc_id),
      |hits AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_overlap
      |         FROM c JOIN b USING(gram) GROUP BY doc_id)
      |SELECT h.doc_id, pd.n_shingles, h.n_overlap,
      |       CAST(h.n_overlap AS DOUBLE) / pd.n_shingles AS contamination
      |FROM hits h JOIN pd USING(doc_id)""".stripMargin

  private[queries] val multiQueryBm25OracleSql: String =
    """WITH qt(query_id, term) AS (VALUES
      |  (0, 'spark'), (0, 'dup'),
      |  (1, 'vector'), (1, 'stream'), (1, 'merge'),
      |  (2, 'hash'), (2, 'nosuchterm')),
      |arr AS (
      |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
      |                             t -> t <> '') AS w
      |  FROM documents),
      |dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM arr),
      |stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |                 CAST(sum(dl) AS BIGINT) AS tot
      |          FROM dl),
      |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      |       FROM (SELECT doc_id, unnest(w) AS term FROM arr)
      |       WHERE term IN (SELECT DISTINCT term FROM qt)
      |       GROUP BY 1, 2),
      |dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df
      |        FROM tf GROUP BY 1)
      |SELECT CAST(qt.query_id AS BIGINT) AS query_id, doc_id,
      |       CAST(count(*) AS BIGINT) AS n_hit_terms,
      |       sum(ln(1.0 + (n - df + 0.5) / (df + 0.5))
      |           * (tf * 2.2) /
      |           (tf + 1.2 * (0.25 + 0.75 * (dl / (tot::DOUBLE / n)))))
      |         AS score
      |FROM tf
      |JOIN dft USING (term)
      |JOIN qt USING (term)
      |JOIN dl USING (doc_id)
      |CROSS JOIN stats
      |GROUP BY 1, 2""".stripMargin

  /** The p100 sequence-example oracle, shared VERBATIM by the batch
    * gate and its streaming twin (st23): the stateful per-key fold
    * replays the same (ts, event_id) total order the batch window
    * sorts by, so the emitted example set is identical.
    */
  private[queries] val sequenceExamplesOracleSql: String =
    """SELECT user_id, event_id, pos, context, label FROM (
      |  SELECT user_id, event_id,
      |         CAST(row_number() OVER w AS BIGINT) AS pos,
      |         array_to_string(list(event_type) OVER (
      |           PARTITION BY user_id ORDER BY ts, event_id
      |           ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), ' ') AS context,
      |         event_type AS label
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |) WHERE pos > 3""".stripMargin

  /** documents -> media rows: the text bytes stand in for an opaque
    * media payload (no codec libs in this image); schema matches
    * [[Multimodal.mediaSchema]] minus meta.
    */
  private def mediaFromDocuments(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id").as("media_id"),
      lit("text").as("media_type"),
      col("text").cast("binary").as("payload"),
      col("source"))

  /** documents -> REAL PNG media rows for the mm05/mm06 codec gates:
    * per doc_id, a [[Multimodal.syntheticPng]] of deterministic dims
    * (8..15 x 8..12 — small enough that channel sums stay float-exact
    * and the pixel-level oracle stays cheap), generated ON EXECUTORS
    * (narrow mapPartitions; the driver never holds image bytes).
    */
  private def syntheticPngMedia(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          (id, Multimodal.syntheticPng(id, w = 8 + (id % 8).toInt, h = 8 + (id % 5).toInt))
        }
      }.toDF("media_id", "payload")
  }

  /** The same fixture through the LOSSY codec branch (mm07): per
    * doc_id a [[Multimodal.syntheticJpeg]] of the SAME deterministic
    * dims, generated on executors.
    */
  private def syntheticJpegMedia(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          (id, Multimodal.syntheticJpeg(id, w = 8 + (id % 8).toInt, h = 8 + (id % 5).toInt))
        }
      }.toDF("media_id", "payload")
  }

  /** Cross-format duplicate-class fixture for mm09: pattern seed =
    * doc_id % 50 (so each class holds ~10 media at sf0.01), dims a
    * function of the CLASS, and the format alternating PNG / BMP by
    * parity — every class mixes both containers, so byte-level
    * equality finds nothing and only pixel-level content recovers
    * the classes.
    */
  private def syntheticCrossFormatMedia(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    crossFormatMediaForStreaming(s, dir)

  /** The mm09 fixture, package-visible for the st31 streaming twin
    * (one definition — the batch gate and the streaming gate must
    * judge the same planted classes).
    */
  private[queries] def crossFormatMediaForStreaming(
      s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val cls = id % 50
          val w = 8 + (cls % 8).toInt; val h = 8 + (cls % 5).toInt
          // (id / 50) alternates WITHIN a class (members are cls,
          // cls+50, ... — all the same parity, so id % 2 would give
          // every class a single container and reduce the gate to
          // byte-level dedup)
          val payload =
            if ((id / 50) % 2 == 0) Multimodal.syntheticPng(cls, w, h)
            else Multimodal.syntheticBmp(cls, w, h)
          (id, payload)
        }
      }.toDF("media_id", "payload")
  }

  /** Block-pattern duplicate-class fixture for mm10 (perceptual
    * near-dup): class = doc_id % 50, pattern = the structured
    * [[Multimodal.syntheticBlockImage]] (md5-seeded 0/255 blocks, one
    * per dHash cell), container alternating PNG/BMP by parity.
    */
  private def syntheticBlockMedia(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val cls = id % 50
          val payload =
            if ((id / 50) % 2 == 0) Multimodal.syntheticBlockPng(cls)
            else Multimodal.syntheticBlockBmp(cls)
          (id, payload)
        }
      }.toDF("media_id", "payload")
  }
}

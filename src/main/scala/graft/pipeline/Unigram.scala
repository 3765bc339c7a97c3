package graft.pipeline

import graft.{Q, Tables => T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed unigram-LM (SentencePiece-style) subword tokenizer — the
  * probabilistic counterpart of [[Bpe]]'s greedy pair-merge, completing the
  * tokenizer family: seed a substring vocabulary from the corpus, refine it
  * with a hard-EM round (Viterbi segmentation → piece recount), and
  * tokenize by per-word Viterbi under the refined log-probabilities.
  * (Kudo's unigram LM trains by soft EM over the full lattice and prunes
  * by likelihood loss; the hard-EM/Viterbi variant here keeps every count
  * an exact integer — the engine-portability contract. Likelihood-loss
  * pruning landed as [[pruneVocab]]; the soft-EM E-step is documented out
  * AS FINAL: its expected counts are lattice forward-backward RATIOS of
  * exponentials — e^{s/1e6} sums have no exact integer form, different
  * summation orders change low-order bits across engines/partitionings,
  * and rounding the ratios per (word, piece) pair loses the mass-
  * conservation property EM's monotonicity proof needs, so a "determinism-
  * preserving integer soft-EM" would be soft in name only. Hard-EM +
  * loss pruning is the fixed design point, not a pending gap.)
  *
  * Scale shape (same argument as BPE): the corpus is touched ONCE for the
  * word-count aggregation; everything after — seeding, scoring, EM,
  * Viterbi — runs over the DISTINCT-WORD table (vocabulary-scale, orders
  * of magnitude smaller) with the piece vocabulary riding hash joins (arc
  * generation is an equi-join of word substrings against the vocab — never
  * a driver-side model). The only sub-DataFrame state is the 1-row
  * vocabulary total, attached by broadcast (the BM25-stats-row shape).
  *
  * Determinism (hash-match contract): piece scores are integer MICRO-NATS
  * (`round(ln(cnt/total)·1e6)` per piece BEFORE summation — the q_text_lm
  * recipe; integer path sums are order-independent). The Viterbi tie-break
  * is (score DESC, piece count ASC, segmentation ASC): the local DP choice
  * under that order IS the global argmax — two prefixes of the same
  * position spell the same characters, so neither segmentation string can
  * be a proper prefix of the other and lexicographic comparison is decided
  * before any common suffix; score/count totals are prefix+suffix sums
  * with identical suffix contributions. The DuckDB oracle therefore
  * enumerates EVERY segmentation by recursive CTE and takes the same
  * argmax — the naive-spelling-oracle pattern the exact-join rows use.
  */
object Unigram {

  /** Longest piece considered (bounds arc fan-out at 4 per position). */
  val MaxPiece = 4

  /** Seed survival threshold for multi-char pieces (single chars always
    * survive, so every word stays segmentable in round 1).
    */
  val MinSeed = 2

  /** Distinct corpus words with counts — the ONE corpus-scale pass
    * (tokenization identical to [[TextAnalysis.tokens]]).
    */
  def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("wc"))

  /** Seed vocabulary: every ≤[[MaxPiece]]-char substring occurrence,
    * weighted by its word's count; multi-char pieces below [[MinSeed]]
    * drop, single chars always stay.
    */
  def seedVocab(words: DataFrame): DataFrame =
    words
      .withColumn("i", explode(sequence(lit(1), length(col("w")))))
      .withColumn("l", explode(sequence(lit(1),
        least(lit(MaxPiece), length(col("w")) - col("i") + lit(1)))))
      .select(col("w").substr(col("i"), col("l")).as("p"), col("wc"))
      .groupBy("p").agg(sum("wc").as("cnt"))
      .filter(length(col("p")) === 1 || col("cnt") >= MinSeed)

  /** Integer micro-nat scores: lpu = round(ln(cnt / Σcnt)·1e6). The 1-row
    * total attaches by broadcast (PlanSpec-whitelisted stats-row shape).
    */
  def scored(vocab: DataFrame): DataFrame = {
    val tot = vocab.agg(sum("cnt").cast("double").as("t"))
    vocab.crossJoin(broadcast(tot))
      .withColumn("lpu",
        round(log(col("cnt").cast("double") / col("t")) * 1e6, 0)
          .cast("long"))
      .drop("t")
  }

  /** (w, wc, arcs) — every vocab-matching substring occurrence of each
    * word as a DP arc, collected per word (the shared arc-generation
    * equi-join of [[viterbiSegment]] and the pruning pass's banned DP).
    */
  private def arcsFor(words: DataFrame, vocab: DataFrame): DataFrame =
    words
      .withColumn("i", explode(sequence(lit(1), length(col("w")))))
      .withColumn("l", explode(sequence(lit(1),
        least(lit(MaxPiece), col("i")))))
      .withColumn("j", col("i") - col("l"))
      .withColumn("p", col("w").substr(col("j") + 1, col("l")))
      .join(vocab.select(col("p"), col("lpu")), Seq("p"))
      .groupBy("w", "wc")
      .agg(collect_list(struct(col("j"), col("i"), col("p"), col("lpu")))
        .as("arcs"))

  /** Per-word Viterbi under `vocab` (p, lpu): maximize the integer score
    * sum with the (score DESC, pieces ASC, seg ASC) tie-break. Arcs come
    * from an equi-join of word substrings against the vocab; the DP is one
    * higher-order fold over positions per word — no UDF, no driver state.
    * Output: (w, wc, seg "a|bc|d", score_u, n_pieces).
    */
  def viterbiSegment(words: DataFrame, vocab: DataFrame): DataFrame =
    viterbiFromArcs(arcsFor(words, vocab))

  private def viterbiFromArcs(arcs: DataFrame): DataFrame = {
    // DP over positions 1..len(w); acc(k+1) = best path to position k.
    // The candidate struct is built once per arc; comparisons implement
    // the total order, so the fold is order-independent over collect_list.
    val dp = expr(
      """aggregate(
        |  sequence(1, length(w)),
        |  array(named_struct('s', cast(0 as bigint), 'np', 0,
        |                     'seg', '', 'ok', true)),
        |  (acc, i) -> concat(acc, array(
        |    aggregate(
        |      transform(
        |        filter(arcs, a -> a.i = i AND element_at(acc, a.j + 1).ok),
        |        a -> named_struct(
        |          's', element_at(acc, a.j + 1).s + a.lpu,
        |          'np', element_at(acc, a.j + 1).np + 1,
        |          'seg', CASE WHEN element_at(acc, a.j + 1).seg = ''
        |                 THEN a.p
        |                 ELSE concat(element_at(acc, a.j + 1).seg, '|', a.p)
        |                 END,
        |          'ok', true)),
        |      named_struct('s', cast(-1000000000000000 as bigint), 'np', 0,
        |                   'seg', '', 'ok', false),
        |      (b, c) -> CASE WHEN NOT b.ok OR c.s > b.s
        |          OR (c.s = b.s AND (c.np < b.np
        |              OR (c.np = b.np AND c.seg < b.seg)))
        |        THEN c ELSE b END))))
        |""".stripMargin)
    arcs.withColumn("dp", dp)
      .withColumn("best", expr("element_at(dp, length(w) + 1)"))
      .filter(col("best.ok"))
      .select(col("w"), col("wc"), col("best.seg").as("seg"),
        col("best.s").as("score_u"),
        col("best.np").cast("long").as("n_pieces"))
  }

  /** One hard-EM round: Viterbi-segment every word under the seed scores,
    * then recount pieces from the winning segmentations (weighted by word
    * count). Every round-1 winner is composed of surviving pieces, so
    * every word stays segmentable under the refined vocabulary.
    */
  def refine(words: DataFrame, seedScored: DataFrame): DataFrame =
    viterbiSegment(words, seedScored)
      .select(explode(split(col("seg"), "\\|")).as("p"), col("wc"))
      .groupBy("p").agg(sum("wc").as("cnt"))

  /** The full train: seed → score → hard-EM recount → rescore. */
  def trainVocab(docs: DataFrame): DataFrame = {
    val wc = wordCounts(docs)
    scored(refine(wc, scored(seedVocab(wc))))
  }

  // A word unsegmentable with a piece banned keeps the DP's sentinel
  // failure score (−10^15), so loss = wc·(s_best − sentinel) makes such a
  // piece effectively unprunable (removing it would break coverage).

  /** Likelihood-loss VOCABULARY PRUNING — the remaining SentencePiece
    * stage on top of the hard-EM train (Kudo's recipe: score every piece
    * by how much total corpus likelihood its removal costs, drop the
    * cheapest, re-estimate):
    *
    *  1. Viterbi-segment every word under `vocab`; a multi-char piece's
    *     LOSS is Σ over the words whose best segmentation uses it of
    *     wc·(s_best − s_banned), where s_banned is the word's best score
    *     with that one piece removed from the vocabulary — one extra DP
    *     per (word, used-piece) pair, vocabulary-scale fan-out (≤ pieces
    *     per segmentation, never corpus-scale). Pieces no winning
    *     segmentation uses have loss 0 — pruned for free, exactly as in
    *     SentencePiece.
    *  2. Drop the cheapest multi-char pieces: everything with loss ≤ the
    *     exact `dropQuantile` loss percentile (one 1-row aggregate,
    *     attached by broadcast — no global sort, no unpartitioned
    *     window). Single chars never drop, so every word stays
    *     segmentable.
    *  3. One more hard-EM round under the survivors (recount + rescore).
    *
    * Integer micro-nat determinism is preserved end to end: losses are
    * exact long arithmetic; the percentile threshold is the A12
    * cross-engine exact-interpolation contract; ties at the threshold
    * drop together (a pure function of the data, never of partitioning).
    */
  def pruneVocab(words: DataFrame, vocab: DataFrame,
      dropQuantile: Double = 0.2): DataFrame = {
    // the corpus-side arc-generation join (substring explode × vocab) is
    // the expensive stage and feeds BOTH the winning-segmentation DP and
    // the banned DPs — build it once, checkpointed
    val arcs = graft.Ckpt(arcsFor(words, vocab))
    val seg = viterbiFromArcs(arcs)
    // (w, wc, s_best, ban) — one row per multi-char piece each word USES
    val used = seg.select(col("w"), col("wc"), col("score_u"),
        explode(array_distinct(split(col("seg"), "\\|"))).as("ban"))
      .filter(length(col("ban")) > 1)
    // banned DP: the word's best score with `ban` removed — same fold as
    // viterbiSegment with the banned piece filtered out of the arcs; a
    // non-ok result keeps the sentinel init score (= BanFail)
    val dpBanned = expr(
      """aggregate(
        |  sequence(1, length(w)),
        |  array(named_struct('s', cast(0 as bigint), 'ok', true)),
        |  (acc, i) -> concat(acc, array(
        |    aggregate(
        |      transform(
        |        filter(arcs, a -> a.i = i AND a.p != ban
        |                      AND element_at(acc, a.j + 1).ok),
        |        a -> named_struct(
        |          's', element_at(acc, a.j + 1).s + a.lpu, 'ok', true)),
        |      named_struct('s', cast(-1000000000000000 as bigint),
        |                   'ok', false),
        |      (b, c) -> CASE WHEN NOT b.ok OR c.s > b.s THEN c ELSE b END))))
        |""".stripMargin)
    val banScores = arcs
      .join(used.select("w", "ban", "score_u"), Seq("w"))
      .withColumn("dp", dpBanned)
      .withColumn("s_banned", expr("element_at(dp, length(w) + 1).s"))
    // loss accumulates in DECIMAL(38,0) (the E140 widening): a word
    // unsegmentable under a ban contributes wc·(s_best − (−10^15)) ≈
    // wc·10^15 — a few hundred such words already overflow a long; the
    // per-pair difference itself stays comfortably in long range
    val lossByPiece = banScores // carries wc from the arcs side
      .groupBy(col("ban").as("p"))
      .agg(sum(col("wc").cast("decimal(38,0)") *
        (col("score_u") - col("s_banned")).cast("decimal(38,0)"))
        .as("loss"))
    val multi = vocab.filter(length(col("p")) > 1)
      .join(lossByPiece, Seq("p"), "left")
      .withColumn("loss", coalesce(col("loss"), lit(0).cast("decimal(38,0)")))
    // exact dropQuantile'th percentile of losses, broadcast-attached on a
    // derived-constant key (the shared key0 stats-row shape)
    val key0 = graft.operators.Analytics.key0 _
    // threshold and comparisons are double-mediated in BOTH engines
    // (sentinel-laden losses exceed 2^53, but they sit far above any 20th
    // percentile — the interpolation happens in the small-loss region);
    // rounded to 4 decimals (the A12 percentile stabilization) so a
    // cross-engine interpolation ulp can never flip a boundary tie
    val thr = multi.agg(
        round(expr(s"percentile(cast(loss as double), $dropQuantile)"), 4)
          .as("thr"))
      .withColumn("__k0", key0(col("thr")))
    // character coverage, the SentencePiece guarantee: ALL single chars
    // stay in the vocabulary (counts = their corpus occurrence totals,
    // recomputed from the words — the refined vocab may have dropped
    // unused singles, and a SET of multi-piece drops can strand a word
    // even when each individual drop is survivable; the per-piece loss
    // bound only covers one removal at a time)
    val singles = words
      .withColumn("i", explode(sequence(lit(1), length(col("w")))))
      .select(col("w").substr(col("i"), lit(1)).as("p"), col("wc"))
      .groupBy("p").agg(sum("wc").as("cnt"))
    val survivors = multi.withColumn("__k0", key0(col("loss")))
      .join(broadcast(thr), Seq("__k0"))
      .filter(col("loss").cast("double") > col("thr"))
      .select("p", "cnt")
      .unionByName(singles)
    scored(refine(words, scored(survivors)))
  }

  val queries: Map[String, Q] = Map(
    // L4/BPE-sibling: the refined unigram vocabulary — seed counts, EM
    // recount, and micro-nat scores all hash-pinned (the oracle replays
    // the identical pipeline, with round-1 Viterbi as an exhaustive
    // recursive-CTE argmax).
    "q_unigram_vocab" -> ((s, dir) =>
      trainVocab(T.documents(s, dir))),

    // The tokenizer itself: per-word Viterbi segmentation under the
    // refined scores, with the integer path score and piece count bound
    // into the output — DP, tie-breaks, and both EM stages hash-pinned.
    "q_unigram_segment" -> ((s, dir) => {
      val wc = wordCounts(T.documents(s, dir))
      viterbiSegment(wc, trainVocab(T.documents(s, dir)))
    }),

    // The SentencePiece pruning stage (SURVEY E185): likelihood-loss
    // vocabulary pruning + one more hard-EM round on top of the refined
    // vocab — per-piece losses (a banned Viterbi per used (word, piece)
    // pair), the exact-percentile drop threshold, the survivor set, and
    // the re-estimated scores ALL hash-pinned against a DuckDB replay
    // that re-enumerates every (word, banned-piece) segmentation by
    // recursive CTE.
    "q_unigram_prune" -> ((s, dir) => {
      // the word-count table feeds FOUR consumers (train, segment, arc
      // generation, the singles recount) and the refined vocab three —
      // checkpoint each once so the corpus scan and the train chain run
      // once, not per consumer (the q_assoc_rules Ckpt posture)
      val wc = graft.Ckpt(wordCounts(T.documents(s, dir)))
      val v2 = graft.Ckpt(scored(refine(wc, scored(seedVocab(wc)))))
      pruneVocab(wc, v2)
    })
  )

  private val oracleCommon =
    """WITH RECURSIVE
      |t AS (SELECT string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
      |      FROM documents),
      |wrd AS (SELECT w, CAST(count(*) AS BIGINT) AS wc
      |        FROM (SELECT unnest(toks) AS w FROM t) WHERE len(w) > 0 GROUP BY 1),
      |pos1 AS (SELECT w, wc,
      |           unnest(generate_series(1, CAST(len(w) AS INTEGER))) AS i
      |         FROM wrd),
      |occ AS (SELECT substr(w, i, l) AS p, wc FROM (
      |  SELECT w, wc, i,
      |    unnest(generate_series(1, CAST(least(4, len(w) - i + 1) AS INTEGER))) AS l
      |  FROM pos1)),
      |seed AS (SELECT p, CAST(SUM(wc) AS BIGINT) AS cnt FROM occ GROUP BY 1
      |         HAVING len(p) = 1 OR SUM(wc) >= 2),
      |tot1 AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS t FROM seed),
      |v1 AS (SELECT p, cnt,
      |         CAST(round(ln(CAST(cnt AS DOUBLE) / t) * 1000000, 0) AS BIGINT) AS lpu
      |       FROM seed, tot1),
      |r1 AS (
      |  SELECT w, wc, CAST(0 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS s,
      |    0 AS np, '' AS seg FROM wrd
      |  UNION ALL
      |  SELECT r1.w, r1.wc, r1.pos + len(v.p), r1.s + v.lpu, r1.np + 1,
      |    CASE WHEN r1.seg = '' THEN v.p ELSE r1.seg || '|' || v.p END
      |  FROM r1 JOIN v1 v ON r1.pos < len(r1.w)
      |    AND v.p = substr(r1.w, CAST(r1.pos + 1 AS INTEGER), len(v.p))
      |),
      |best1 AS (
      |  SELECT w, wc, seg FROM (
      |    SELECT *, row_number() OVER (PARTITION BY w ORDER BY s DESC, np ASC, seg ASC) AS rn
      |    FROM r1 WHERE pos = len(w)) WHERE rn = 1),
      |ref AS (SELECT p, CAST(SUM(wc) AS BIGINT) AS cnt
      |        FROM (SELECT unnest(string_split(seg, '|')) AS p, wc FROM best1) GROUP BY 1),
      |tot2 AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS t FROM ref),
      |v2 AS (SELECT p, cnt,
      |         CAST(round(ln(CAST(cnt AS DOUBLE) / t) * 1000000, 0) AS BIGINT) AS lpu
      |       FROM ref, tot2)""".stripMargin

  /** The segment-under-v2 recursion shared by the segment and prune
    * oracles (`r2` enumerates every segmentation under the refined
    * vocabulary; `best2` is the tie-broken argmax).
    */
  private val oracleR2 =
    """r2 AS (
      |  SELECT w, wc, CAST(0 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS s,
      |    0 AS np, '' AS seg FROM wrd
      |  UNION ALL
      |  SELECT r2.w, r2.wc, r2.pos + len(v.p), r2.s + v.lpu, r2.np + 1,
      |    CASE WHEN r2.seg = '' THEN v.p ELSE r2.seg || '|' || v.p END
      |  FROM r2 JOIN v2 v ON r2.pos < len(r2.w)
      |    AND v.p = substr(r2.w, CAST(r2.pos + 1 AS INTEGER), len(v.p))
      |)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_unigram_vocab" ->
      s"""$oracleCommon
         |SELECT p, cnt, lpu FROM v2 ORDER BY ALL NULLS FIRST""".stripMargin,

    "q_unigram_prune" ->
      s"""$oracleCommon,
         |$oracleR2,
         |best2 AS (
         |  SELECT w, wc, s, seg FROM (
         |    SELECT *, row_number() OVER (PARTITION BY w
         |      ORDER BY s DESC, np ASC, seg ASC) AS rn
         |    FROM r2 WHERE pos = len(w)) WHERE rn = 1),
         |usedm AS (
         |  SELECT w, wc, s AS s_best, ban FROM (
         |    SELECT w, wc, s,
         |      unnest(list_distinct(string_split(seg, '|'))) AS ban
         |    FROM best2) WHERE len(ban) > 1),
         |r3 AS (
         |  SELECT w, ban, CAST(0 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS s
         |  FROM usedm
         |  UNION ALL
         |  SELECT r3.w, r3.ban, r3.pos + len(v.p), r3.s + v.lpu
         |  FROM r3 JOIN v2 v ON r3.pos < len(r3.w) AND v.p <> r3.ban
         |    AND v.p = substr(r3.w, CAST(r3.pos + 1 AS INTEGER), len(v.p))
         |),
         |sm AS (SELECT w, ban, max(s) AS s_banned
         |       FROM r3 WHERE pos = len(w) GROUP BY 1, 2),
         |lossp AS (
         |  SELECT u.ban AS p,
         |    SUM(CAST(u.wc AS HUGEINT) * (u.s_best -
         |      coalesce(sm.s_banned, -1000000000000000))) AS loss
         |  FROM usedm u LEFT JOIN sm ON u.w = sm.w AND u.ban = sm.ban
         |  GROUP BY 1),
         |multi AS (
         |  SELECT v.p, v.cnt, coalesce(l.loss, 0) AS loss
         |  FROM v2 v LEFT JOIN lossp l ON v.p = l.p WHERE len(v.p) > 1),
         |thr AS (SELECT round(quantile_cont(CAST(loss AS DOUBLE), 0.2), 4)
         |        AS thr FROM multi),
         |surv AS (
         |  SELECT p, cnt FROM multi, thr WHERE CAST(loss AS DOUBLE) > thr
         |  UNION ALL
         |  SELECT substr(w, i, 1) AS p, CAST(SUM(wc) AS BIGINT) AS cnt
         |  FROM pos1 GROUP BY 1),
         |tot3 AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS t FROM surv),
         |v3 AS (SELECT p, cnt,
         |         CAST(round(ln(CAST(cnt AS DOUBLE) / t) * 1000000, 0)
         |           AS BIGINT) AS lpu
         |       FROM surv, tot3),
         |r4 AS (
         |  SELECT w, wc, CAST(0 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS s,
         |    0 AS np, '' AS seg FROM wrd
         |  UNION ALL
         |  SELECT r4.w, r4.wc, r4.pos + len(v.p), r4.s + v.lpu, r4.np + 1,
         |    CASE WHEN r4.seg = '' THEN v.p ELSE r4.seg || '|' || v.p END
         |  FROM r4 JOIN v3 v ON r4.pos < len(r4.w)
         |    AND v.p = substr(r4.w, CAST(r4.pos + 1 AS INTEGER), len(v.p))
         |),
         |best4 AS (
         |  SELECT w, wc, seg FROM (
         |    SELECT *, row_number() OVER (PARTITION BY w
         |      ORDER BY s DESC, np ASC, seg ASC) AS rn
         |    FROM r4 WHERE pos = len(w)) WHERE rn = 1),
         |ref4 AS (SELECT p, CAST(SUM(wc) AS BIGINT) AS cnt FROM (
         |  SELECT unnest(string_split(seg, '|')) AS p, wc FROM best4)
         |  GROUP BY 1),
         |tot4 AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS t FROM ref4)
         |SELECT p, cnt,
         |  CAST(round(ln(CAST(cnt AS DOUBLE) / t) * 1000000, 0) AS BIGINT)
         |    AS lpu
         |FROM ref4, tot4 ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_unigram_segment" ->
      s"""$oracleCommon,
         |r2 AS (
         |  SELECT w, wc, CAST(0 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS s,
         |    0 AS np, '' AS seg FROM wrd
         |  UNION ALL
         |  SELECT r2.w, r2.wc, r2.pos + len(v.p), r2.s + v.lpu, r2.np + 1,
         |    CASE WHEN r2.seg = '' THEN v.p ELSE r2.seg || '|' || v.p END
         |  FROM r2 JOIN v2 v ON r2.pos < len(r2.w)
         |    AND v.p = substr(r2.w, CAST(r2.pos + 1 AS INTEGER), len(v.p))
         |)
         |SELECT w, wc, seg, s AS score_u, CAST(np AS BIGINT) AS n_pieces FROM (
         |  SELECT *, row_number() OVER (PARTITION BY w ORDER BY s DESC, np ASC, seg ASC) AS rn
         |  FROM r2 WHERE pos = len(w)) WHERE rn = 1
         |ORDER BY ALL NULLS FIRST""".stripMargin
  )
}

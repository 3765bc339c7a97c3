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
  * an exact integer — the engine-portability contract — and is documented
  * as such.)
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

  /** Per-word Viterbi under `vocab` (p, lpu): maximize the integer score
    * sum with the (score DESC, pieces ASC, seg ASC) tie-break. Arcs come
    * from an equi-join of word substrings against the vocab; the DP is one
    * higher-order fold over positions per word — no UDF, no driver state.
    * Output: (w, wc, seg "a|bc|d", score_u, n_pieces).
    */
  def viterbiSegment(words: DataFrame, vocab: DataFrame): DataFrame = {
    val arcs = words
      .withColumn("i", explode(sequence(lit(1), length(col("w")))))
      .withColumn("l", explode(sequence(lit(1),
        least(lit(MaxPiece), col("i")))))
      .withColumn("j", col("i") - col("l"))
      .withColumn("p", col("w").substr(col("j") + 1, col("l")))
      .join(vocab.select(col("p"), col("lpu")), Seq("p"))
      .groupBy("w", "wc")
      .agg(collect_list(struct(col("j"), col("i"), col("p"), col("lpu")))
        .as("arcs"))
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

  val oracles: Map[String, String] = Map(
    "q_unigram_vocab" ->
      s"""$oracleCommon
         |SELECT p, cnt, lpu FROM v2 ORDER BY ALL NULLS FIRST""".stripMargin,
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

package graft.pipeline

import graft.{Q, Tables => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted BM25 inverted index + hybrid (lexical ⊕ vector) retrieval —
  * the text-retrieval member of the index-lifecycle family ([[DedupIndex]]
  * for near-dup signatures, [[VectorIndex]] for ANN): build once, persist
  * versioned components, serve batch and streaming lookups that never
  * re-read corpus text.
  *
  * Retrieval is a first-class training-data-pipeline operator: eval-set
  * contamination checks, data attribution ("which training docs does this
  * prompt retrieve?"), and RAG-style corpus probes are all top-k searches
  * over the kept corpus. The components are the classic inverted-index
  * triple:
  *
  *   - `postings` (word, doc, dl, tf)  denormalized posting lists — term
  *                                     frequency plus the doc length needed
  *                                     by BM25's length normalization, so
  *                                     scoring never joins a doc-side table
  *   - `vocab`    (word, df)           document frequencies (idf input)
  *   - `stats`    (n, sdl)             corpus doc count + summed doc length
  *                                     (avgdl input; a single row)
  *
  * A query tokenizes ITSELF only (stateless per-row maps), equi-joins its
  * distinct terms against the persisted postings — only the matching terms'
  * posting rows are ever touched, the inverted-index pruning that makes
  * lexical search linear in result size, not corpus size — and sums exact
  * integer BM25 contributions per candidate. At 100 TB the corpus
  * tokenize/count pass is paid once at build; a query shuffles only its own
  * candidates.
  *
  * Determinism (the DuckDB hash-match contract): BM25 is float math, and
  * float SUMs are order-dependent, so each (term, doc) contribution is
  * computed as the product of two micro-unit-rounded integers —
  * `idf_u = round(idf·1e6)` and `wtf_u = round(tfNorm·1e6)` — and summed
  * as a BIGINT. Integer sums are order-independent, so Spark and DuckDB
  * agree bit-for-bit on every score (`score_u ≈ score·1e12`); ranking uses
  * (score_u DESC, doc) so cross-engine ln() last-ulp drift cannot reorder
  * ties. The same recipe as [[TextAnalysis.lmScore]] / `q_text_entropy`.
  *
  * BM25 parameters are the Robertson defaults k1=1.2, b=0.75 with the
  * Lucene idf variant ln(1 + (N − df + 0.5)/(df + 0.5)); query terms are
  * deduplicated (qtf capped at 1), and the query document itself is
  * excluded from its own result list.
  */
object TextIndex {

  /** The three index components for one corpus, as DataFrames. */
  case class Components(postings: DataFrame, vocab: DataFrame, stats: DataFrame)

  /** Denormalized posting lists (word, doc, dl, tf) from a corpus. `dl`
    * rides every posting row so BM25's length normalization needs no
    * doc-side join at query time — the standard inverted-index layout.
    */
  def postingsOf(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol).as("doc"), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col("doc"), size(col("__toks")).as("dl"),
        explode(col("__toks")).as("word"))
      .groupBy("word", "doc", "dl").agg(count(lit(1)).as("tf"))

  /** POSITIONAL postings (word, doc, pos) — 1-based token positions over
    * the raw token array (empties filtered AFTER position assignment, the
    * `q_bpe_tokenize` oracle convention, so cross-engine positions align).
    * The component behind exact-phrase / proximity queries — the
    * contamination-probe use case ("find this exact benchmark sentence")
    * that tf-only postings cannot answer.
    */
  def positionsOf(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol).as("doc"),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos0", "word")))
      .filter(length(col("word")) > 0)
      .select(col("word"), col("doc"), (col("pos0") + 1).as("pos"))

  /** Exact-phrase search over a positional posting table: for each query
    * document, the phrase is its first `m` non-empty tokens, and a corpus
    * document matches once per ANCHOR position where every phrase word
    * appears at its offset (pos − i constant). Returns
    * (qid, doc_id, n_hits ≥ 1).
    *
    * Scale shape: the posting join touches only the phrase words' posting
    * lists (query side broadcast), the coverage check is one narrow
    * aggregation on (qid, doc, anchor), and nothing ever re-reads corpus
    * text — linear in the matched posting rows, independent of corpus
    * size.
    */
  def phraseTopDocs(queryDocs: DataFrame, positions: DataFrame,
      m: Int = 3): DataFrame = {
    val qp = queryDocs
      .select(col("qid"),
        posexplode(slice(
          filter(TextAnalysis.tokens(col("qtext")), w => length(w) > 0),
          1, m)).as(Seq("i", "w")))
    val plen = qp.groupBy("qid").agg(countDistinct(col("i")).as("plen"))
    positions.join(broadcast(qp), col("word") === col("w"))
      .select(col("qid"), col("doc"), (col("pos") - col("i")).as("anchor"),
        col("i"))
      .groupBy("qid", "doc", "anchor")
      .agg(countDistinct(col("i")).as("cover"))
      .join(broadcast(plen), Seq("qid"))
      .filter(col("cover") === col("plen"))
      .groupBy("qid", "doc")
      .agg(count(lit(1)).as("n_hits"))
      .select(col("qid"), col("doc").as("doc_id"), col("n_hits"))
  }

  /** Window-proximity search over a positional posting table — the looser
    * sibling of [[phraseTopDocs]]: the query is each query doc's first `m`
    * non-empty tokens, and a corpus document matches once per occurrence
    * of the FIRST query word (the anchor) such that EVERY distinct query
    * word appears somewhere in `[anchor, anchor + window − 1]`, in any
    * order. Returns (qid, doc_id, n_windows ≥ 1). Exact-phrase is the
    * window = m, order-fixed special case; proximity is what retrieval
    * engines score when the quote is loose ("these words near each
    * other").
    *
    * Scale shape: only the query words' posting lists are touched, and
    * the anchor↔occurrence range join is BINNED (the `rangeJoinBinned`
    * trick): occurrences replicate into the two width-`window` bins they
    * can serve, anchors join on (qid, doc, bin), so the pre-filter
    * fan-out is ≤ 2× the matched posting rows — never the per-document
    * cross of anchors × occurrences a naive range join would build on
    * stop-word-heavy queries.
    */
  def proximityTopDocs(queryDocs: DataFrame, positions: DataFrame,
      m: Int = 3, window: Int = 8): DataFrame = {
    // distinct query words; mi = 0 marks the anchor word (first token)
    val qw = queryDocs
      .select(col("qid"),
        posexplode(slice(
          filter(TextAnalysis.tokens(col("qtext")), w => length(w) > 0),
          1, m)).as(Seq("i", "w")))
      .groupBy("qid", "w").agg(min(col("i")).as("mi"))
    val nw = qw.groupBy("qid").agg(count(lit(1)).as("nw"))
    val matched = positions.join(broadcast(qw), col("word") === col("w"))
      .select(col("qid"), col("doc"), col("w"), col("mi"), col("pos"))
    val anchors = matched.filter(col("mi") === 0)
      .select(col("qid"), col("doc"), col("pos").as("anchor"),
        floor(col("pos") / window).as("bin"))
    // an occurrence at pos can serve anchors in [pos − window + 1, pos],
    // i.e. anchor-bins floor(pos/window) and floor(pos/window) − 1 — the
    // two replicas below; a (anchor, occurrence) pair joins at most once
    // because the two replica bins are distinct
    val occ = matched
      .withColumn("bin", explode(array(floor(col("pos") / window),
        floor(col("pos") / window) - 1)))
      .select(col("qid"), col("doc"), col("bin"), col("w"), col("pos"))
    anchors.join(occ, Seq("qid", "doc", "bin"))
      .filter(col("pos") >= col("anchor") &&
        col("pos") < col("anchor") + window)
      .groupBy("qid", "doc", "anchor")
      .agg(countDistinct(col("w")).as("cover"))
      .join(broadcast(nw), Seq("qid"))
      .filter(col("cover") === col("nw"))
      .groupBy("qid", "doc")
      .agg(count(lit(1)).as("n_windows"))
      .select(col("qid"), col("doc").as("doc_id"), col("n_windows"))
  }

  /** Sparse TF-IDF cosine top-k over the inverted index — the third
    * retrieval scorer next to BM25 (probabilistic) and dense ANN
    * (embedding): classic vector-space cosine over tf·idf weights, served
    * entirely from the persisted components.
    *
    * Determinism (the BM25 integer recipe extended to cosine): idf in
    * exact 1e5-units (`idf_u = round(ln(N/df)·1e5)` as BIGINT), so dot
    * products and squared norms are INTEGER sums (order-independent,
    * overflow-safe: tf·tf·idf_u² ≤ ~2e14 per term); the only float ops are
    * the final `dot/(√qn²·√dn²)` from exact integers — IEEE sqrt/divide
    * are correctly rounded, so both engines produce the identical double —
    * rounded to 6 decimals with (sim DESC, doc) ranking.
    *
    * Scale shape: words with df > N/2 are PRUNED (stop-word cutoff — the
    * classic sparse-similarity trick that bounds the posting self-join:
    * candidate pairs are Σ df² over kept words, and the heaviest lists are
    * exactly the ones dropped); query terms broadcast; per-doc norms are
    * one narrow aggregation over kept postings. Corpus text is never read.
    */
  def sparseCosineTopK(queryDocs: DataFrame, ix: Components, k: Int = 10,
      maxDfNum: Int = 1, maxDfDen: Int = 2): DataFrame = {
    val n1 = ix.stats.select(col("n"))
    val kept = ix.vocab.crossJoin(broadcast(n1))
      // exact integer fraction: keep df/N ≤ maxDfNum/maxDfDen
      .filter(col("df") * maxDfDen <= col("n") * maxDfNum)
      .select(col("word"), expr(
        "cast(round(ln(cast(n as double) / cast(df as double)) * 100000, 0) as bigint)"
      ).as("idf_u"))
    val cp = ix.postings.join(kept, Seq("word"))
      .select(col("word"), col("doc"), col("tf"), col("idf_u"))
    val dnorm = cp.groupBy("doc")
      .agg(sum(col("tf") * col("tf") * col("idf_u") * col("idf_u")).as("dn2"))
    val qt = queryDocs
      .select(col("qid"), explode(TextAnalysis.tokens(col("qtext"))).as("word"))
      .groupBy("qid", "word").agg(count(lit(1)).as("qtf"))
      .join(kept, Seq("word")) // stop words and OOV drop from dot AND norm
    val qnorm = qt.groupBy("qid")
      .agg(sum(col("qtf") * col("qtf") * col("idf_u") * col("idf_u")).as("qn2"))
    val dots = cp
      .join(broadcast(qt.select(col("qid"), col("word"), col("qtf"))),
        Seq("word"))
      .filter(col("doc") =!= col("qid"))
      .groupBy("qid", "doc")
      .agg(sum(col("qtf") * col("tf") * col("idf_u") * col("idf_u"))
        .as("dot_u"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("doc"))
    dots.join(broadcast(qnorm), Seq("qid")).join(dnorm, Seq("doc"))
      .withColumn("sim", round(col("dot_u").cast("double") /
        (sqrt(col("qn2").cast("double")) * sqrt(col("dn2").cast("double"))),
        6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("doc").as("doc_id"), col("sim"))
  }

  /** Document frequencies (word, df) from a posting table. */
  def vocabOf(postings: DataFrame): DataFrame =
    postings.groupBy("word").agg(count(lit(1)).as("df"))

  /** Corpus stats (n, sdl) — one row — from a posting table. */
  def statsOf(postings: DataFrame): DataFrame =
    postings.select("doc", "dl").distinct()
      .agg(count(lit(1)).as("n"), sum(col("dl").cast("long")).as("sdl"))

  /** All three components, lazily, from a corpus DataFrame. */
  def componentsOf(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): Components = {
    val p = postingsOf(docs, textCol, idCol)
    Components(p, vocabOf(p), statsOf(p))
  }

  /** Append a batch of NEW documents (ids disjoint from the indexed corpus,
    * the [[DedupIndex.appendBatch]] contract) without re-reading corpus
    * text: postings are per-document rows so the batch's postings union in
    * directly; `vocab` merges by exact integer df addition and `stats` by
    * (n, sdl) addition — both pure sums, so append ∪ old is ROW-IDENTICAL
    * to a from-scratch build over old ∪ batch (`q_bm25_append_search`
    * hash-proves it through the search path; PipelineSpec proves all three
    * component tables). At 100 TB this is the daily-ingest shape: cost is
    * proportional to the batch, never the corpus.
    */
  def appendBatch(ix: Components, batch: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): Components = {
    val bp = postingsOf(batch, textCol, idCol)
    val vocab = ix.vocab.unionByName(vocabOf(bp))
      .groupBy("word").agg(sum("df").as("df"))
    val stats = ix.stats.unionByName(statsOf(bp))
      .agg(sum("n").as("n"), sum("sdl").as("sdl"))
    Components(ix.postings.unionByName(bp), vocab, stats)
  }

  /** One (term, doc) BM25 contribution in exact integer micro²-units:
    * round(idf·1e6) · round(tfNorm·1e6), both BIGINT. The expression trees
    * here and in [[bm25Sql]] apply the same IEEE ops in the same order, so
    * the only cross-engine seam is ln()'s last ulp — buried by the
    * micro-rounding before any summation (the lmScore recipe).
    */
  private[graft] def contributionU(tf: Column, df: Column, dl: Column,
      n: Column, sdl: Column): Column = {
    val avgdl = sdl.cast("double") / n.cast("double")
    val wtfU = round(
      tf.cast("double") * lit(2.2) /
        (tf.cast("double") + lit(1.2) *
          (lit(0.25) + lit(0.75) * (dl.cast("double") / avgdl))) * lit(1e6),
      0).cast("long")
    idfUCol(df, n) * wtfU
  }

  private def idfUCol(df: Column, n: Column): Column = round(
    log(((n - df).cast("double") + lit(0.5)) / (df.cast("double") + lit(0.5))
      + lit(1.0)) * lit(1e6), 0).cast("long")

  /** An avgdl-FREE upper bound on a posting's `wtf_u`: wtf is increasing
    * in avgdl with supremum tf·(k1+1)/(tf + k1·(1−b)) = tf·2.2/(tf+0.3)
    * as avgdl→∞, and monotone in tf — so round(maxTf·2.2/(maxTf+0.3)·1e6)
    * bounds every contribution of the word at ANY corpus length profile.
    * That independence is what makes the persisted per-term bound safe
    * across appends (avgdl drifts) and tombstones (bounds only loosen).
    */
  private def wtfUbCol(maxTf: Column): Column = round(
    maxTf.cast("double") * lit(2.2) / (maxTf.cast("double") + lit(0.3))
      * lit(1e6), 0).cast("long")

  /** Per-word maximum term frequency (word, max_tf) — the max-score
    * pruning component. Merges EXACTLY under append (max of maxes) and
    * only loosens under tombstoning, unlike a baked wtf bound.
    */
  def maxTfOf(postings: DataFrame): DataFrame =
    postings.groupBy("word").agg(max(col("tf")).as("max_tf"))

  /** BM25 top-k: for each query document (qid, qtext), the k highest-scoring
    * corpus documents. Returns (qid, rank, doc_id, score_u).
    *
    * Scale shape: the query set is small by contract (it is broadcast), the
    * posting join touches only rows whose word appears in some query —
    * Σ_word |postings(word)| candidate rows, independent of corpus size —
    * and `vocab` is pre-filtered to query words before ITS broadcast. The
    * only shuffle is the per-(qid, doc) score aggregation over candidates.
    */
  def bm25TopK(queryDocs: DataFrame, ix: Components, k: Int = 10): DataFrame = {
    val qt = queryDocs.select(col("qid"),
      explode(array_distinct(TextAnalysis.tokens(col("qtext")))).as("word"))
    scoreTerms(qt, ix, k)
  }

  /** Typo-tolerant BM25 top-k: each query term is expanded to every index
    * vocabulary word within edit distance 1 by the SymSpell deletion-variant
    * equi-join ([[graft.operators.Joins.fuzzyPairsDeletes]]'s shape applied
    * query-vs-vocab instead of self-join), then the expanded (qid, word)
    * set scores exactly like [[bm25TopK]] (qtf capped at 1 — a vocab word
    * reachable from two query words still counts once). Returns
    * (qid, rank, doc_id, score_u).
    *
    * Scale shape: the vocab-side variant expansion is (len+1)× the VOCAB
    * (never the corpus — at 100 TB you'd persist it as one more index
    * component; here it derives from the persisted vocab in-query), the
    * variant join is a hash join with the query side broadcast, and the
    * exact levenshtein refine pays only for candidates. Postings are still
    * touched only for matched terms — the inverted-index pruning survives
    * the fuzz.
    */
  /** {w} ∪ single-deletions of w (array_distinct — "aa" deletes to "a"
    * once); empty strings map to {""}: the fuzzyPairsDeletes2 guard.
    */
  private[graft] def deletionVariants(c: Column): Column =
    when(length(c) >= 1,
      array_distinct(concat(
        array(c),
        transform(sequence(lit(1), length(c)),
          i => concat(c.substr(lit(1), i - 1),
            c.substr(i + 1, length(c) - i))))))
      .otherwise(array(c))

  def bm25FuzzyTopK(queryDocs: DataFrame, ix: Components,
      k: Int = 10, variants: Option[DataFrame] = None): DataFrame = {
    def dels(c: Column): Column = deletionVariants(c)
    val qw = queryDocs.select(col("qid"),
      explode(array_distinct(TextAnalysis.tokens(col("qtext")))).as("qword"))
    val qv = qw.withColumn("variant", explode(dels(col("qword"))))
    // vocab-side neighborhood: the persisted `variants` component when
    // given (the production path — no per-query vocab re-expansion), else
    // derived in-query from ix.vocab (the oracle-anchor / append path)
    val vv = variants.getOrElse(ix.vocab.select(col("word"))
      .withColumn("variant", explode(dels(col("word")))))
    val expanded = vv.join(broadcast(qv), Seq("variant"))
      .filter(levenshtein(col("qword"), col("word")) <= 1)
      .select("qid", "word").distinct()
    scoreTerms(expanded, ix, k)
  }

  /** The BM25 scoring core over a deduplicated (qid, word) term set —
    * shared by the exact and fuzzy entry points. Query side broadcast;
    * the only shuffle is the per-(qid, doc) candidate aggregation.
    */
  private def scoreTerms(qt: DataFrame, ix: Components, k: Int): DataFrame =
    rankTopK(candidates(qt, ix).groupBy("qid", "doc")
      .agg(sum("__c").as("score_u")), k)

  /** The per-(qid, word, doc) candidate rows with their exact integer
    * contribution `__c` — postings touched only for query terms.
    */
  private def candidates(qt: DataFrame, ix: Components): DataFrame = {
    val qdf = ix.vocab
      .join(broadcast(qt.select("word").dropDuplicates("word")), Seq("word"))
    ix.postings
      .join(broadcast(qt), Seq("word"))
      .filter(col("doc") =!= col("qid"))
      .join(broadcast(qdf), Seq("word"))
      .crossJoin(broadcast(ix.stats))
      .withColumn("__c", contributionU(col("tf"), col("df"), col("dl"),
        col("n"), col("sdl")))
  }

  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col("score_u").desc, col("doc"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("doc").as("doc_id"), col("score_u"))
  }

  /** Max-score (WAND-lite) BM25 top-k — LOSSLESS pruning of the scoring
    * aggregation via the persisted per-term `max_tf` bound:
    *
    *  1. per query term, an upper-bound contribution
    *     `maxc = idf_u · wtfUb(max_tf)` (integer, avgdl-free — see
    *     [[wtfUbCol]]); terms rank by impact and the minimal desc prefix
    *     reaching half the total marks the HIGH set (a per-qid window over
    *     the handful of query terms — metadata-scale);
    *  2. phase A scores EXACTLY (all matched terms) only the docs that
    *     match ≥ 1 high term — the candidate aggregation and rank window
    *     shuffle only those docs;
    *  3. certification, per qid: a doc outside phase A scores at most
    *     `ub_low = Σ maxc(low terms)`; if phase A produced a k-th score θ
    *     with `ub_low < θ` (STRICT — an excluded doc tying θ could still
    *     win the doc-asc tie-break), phase A's top-k IS the global top-k;
    *  4. any qid that fails certification falls back to full scoring —
    *     so the result is row-identical to [[bm25TopK]] ALWAYS — and a
    *     cost gate skips phase A entirely for queries whose impact
    *     profile is too flat to plausibly certify (this corpus's
    *     degenerate ~31-word vocabulary gates out, so the declared row
    *     costs plain scoring plus the metadata-scale bounds; the planted
    *     Zipf unit pins the certified path — pruning pays off exactly
    *     where real Zipfian vocabularies live, the E120 note's dual).
    *
    * Staleness safety: `max_tf` merges exactly under append and only
    * loosens under tombstoning; `idf_u` uses the same vocab frame the
    * scorer uses — so `maxc` upper-bounds every `__c` the aggregation can
    * produce, at any index staleness, and certification stays lossless.
    */
  def bm25TopKMaxScore(queryDocs: DataFrame, ix: Components,
      maxTf: DataFrame, k: Int = 10): DataFrame = {
    val qt = queryDocs.select(col("qid"),
      explode(array_distinct(TextAnalysis.tokens(col("qtext")))).as("word"))
    scoreTermsMaxScore(qt, ix, maxTf, k)._1
  }

  /** [[bm25TopKMaxScore]] core; also returns (certified, fallback) qid
    * counts so the planted unit can assert which path ran.
    */
  private[pipeline] def scoreTermsMaxScore(qt: DataFrame, ix: Components,
      maxTf: DataFrame, k: Int): (DataFrame, Int, Int) = {
    // per-(qid, term) upper bound — query-terms-sized, so the windows and
    // collects below are all metadata-scale
    val ub = qt.join(ix.vocab, Seq("word"))
      .join(maxTf, Seq("word"))
      .crossJoin(broadcast(ix.stats))
      .withColumn("maxc", idfUCol(col("df"), col("n")) *
        wtfUbCol(col("max_tf")))
      .select(col("qid"), col("word"), col("maxc"))
    val wq = Window.partitionBy("qid").orderBy(col("maxc").desc, col("word"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val marked = ub
      .withColumn("cum", sum("maxc").over(wq))
      .withColumn("tot", sum("maxc").over(Window.partitionBy("qid")))
      .withColumn("is_high", (col("cum") - col("maxc")) * 2 < col("tot"))
    // ONE collect of the per-(query, term) bound table — query-terms-
    // sized by contract. The cost gate, the high/low split, and the
    // per-query low-mass bound all derive driver-side from these rows, so
    // the vocab-scale joins above run exactly once.
    val mRows = marked.select("qid", "word", "maxc", "is_high").collect()
    val qidType = marked.schema("qid").dataType
    val byQid = mRows.groupBy(_.get(0))
    val ubLowMap = byQid.map { case (q, rs) =>
      q -> rs.filter(!_.getBoolean(3)).map(_.getLong(2)).sum }
    val topMap = byQid.map { case (q, rs) => q -> rs.map(_.getLong(2)).max }
    // cost gate: attempt pruning only where the impact profile is SKEWED
    // enough to plausibly certify (low mass under half the single top
    // bound). A flat profile — this corpus's degenerate vocabulary —
    // would pay phase A and then fall back anyway; the gate sends it
    // straight to full scoring, so the pruned entry point never costs
    // more than the plain one plus the metadata-scale bounds. The gate is
    // a planner heuristic, never a correctness decision: gated-out and
    // uncertified queries both take the exact full-scoring path.
    val attempt = ubLowMap.keys
      .filter(q => ubLowMap(q) * 2 < topMap(q)).toArray
    val allQids = qt.select("qid").distinct().collect().map(_.get(0))
    if (attempt.isEmpty)
      return (scoreTerms(qt, ix, k), 0, allQids.length)
    val qtA = qt.filter(col("qid").isin(attempt.toIndexedSeq: _*))
    // the high-term list is already on the driver: rebuild it as a local
    // broadcastable frame instead of re-running the bound pipeline
    val highRows = mRows
      .filter(r => r.getBoolean(3) && attempt.contains(r.get(0)))
      .map(r => org.apache.spark.sql.Row(r.get(0), r.getString(1)))
    val highDf = qt.sparkSession.createDataFrame(
      java.util.Arrays.asList(highRows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("qid", qidType),
        org.apache.spark.sql.types.StructField("word",
          org.apache.spark.sql.types.StringType))))
    // phase A: exact scores for docs matching >= 1 high term
    val highDocs = ix.postings.join(broadcast(highDf), Seq("word"))
      .filter(col("doc") =!= col("qid"))
      .select("qid", "doc").dropDuplicates("qid", "doc")
    val scoredA = candidates(qtA, ix)
      .join(highDocs, Seq("qid", "doc"), "left_semi")
      .groupBy("qid", "doc").agg(sum("__c").as("score_u"))
    val topA = rankTopK(scoredA, k)
    // certification — one tiny collect (the k-th row per attempted query)
    val kth = topA.filter(col("rank") === k)
      .select("qid", "score_u").collect()
      .map(r => r.get(0) -> r.getLong(1)).toMap
    val certified = attempt
      .filter(q => kth.get(q).exists(th => ubLowMap(q) < th))
    val fallback = allQids.diff(certified)
    val certDf = topA.filter(col("qid").isin(certified.toIndexedSeq: _*))
    val result =
      if (fallback.isEmpty) certDf
      else if (certified.isEmpty)
        scoreTerms(qt.filter(col("qid").isin(fallback.toIndexedSeq: _*)), ix, k)
      else certDf.unionByName(
        scoreTerms(qt.filter(col("qid").isin(fallback.toIndexedSeq: _*)), ix, k))
    (result, certified.length, fallback.length)
  }

  /** Reciprocal-rank fusion of two ranked lists (the hybrid-retrieval
    * standard): rrf_u = Σ round(1e6 / (60 + rank)) over the lists a doc
    * appears in — integer micro-units, order-independent, so the fused
    * ranking hash-matches cross-engine. Inputs are (qid, doc_id, rank_*);
    * returns (qid, rank, doc_id, rrf_u, rank_bm25, rank_vec).
    */
  def rrfFuse(textList: DataFrame, vecList: DataFrame, k: Int = 10): DataFrame = {
    def part(r: Column): Column = coalesce(
      round(lit(1000000.0) / (lit(60.0) + r.cast("double")), 0).cast("long"),
      lit(0L))
    val fused = textList.join(vecList, Seq("qid", "doc_id"), "full")
      .withColumn("rrf_u", part(col("rank_bm25")) + part(col("rank_vec")))
    val w = Window.partitionBy("qid").orderBy(col("rrf_u").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("doc_id"), col("rrf_u"),
        col("rank_bm25"), col("rank_vec"))
  }

  // ---- persistence (documents.parquet of an sfDir) -----------------------

  private val store =
    new IndexStore("SPARK_GRAFT_TEXT_INDEX_DIR", "graft-text-index",
      "documents.parquet")

  /** Index directory for one corpus dir (env-relocatable root). */
  def dir(sfDir: String): String = store.dir(sfDir)

  /** Build-if-absent; returns the current VERSION dir. */
  def ensure(spark: SparkSession, sfDir: String): String =
    store.ensure(sfDir)(buildInto(spark, sfDir, _))

  /** Unconditional build + persist of all three components behind the
    * atomic marker swap. Returns the new version dir.
    */
  def rebuild(spark: SparkSession, sfDir: String): String =
    store.rebuild(sfDir)(buildInto(spark, sfDir, _))

  /** Each component derives from the PERSISTED form of its predecessor
    * (vocab and stats from stored postings) — no re-derivation seam, the
    * [[VectorIndex]]/[[DedupIndex]] build principle: what queries join
    * against is exactly what the build wrote.
    */
  private def buildInto(spark: SparkSession, sfDir: String, vd: String): Unit = {
    // Two independent corpus passes (postings chain, positions), and
    // within the postings chain three independent derivations of the
    // persisted posting table — overlapped per guide §2.6 ([[graft.Par]]);
    // each component still derives from the PERSISTED form of its input.
    graft.Par.run(
      () => {
        postingsOf(T.documents(spark, sfDir))
          .write.mode("overwrite").parquet(s"$vd/postings")
        val p = spark.read.parquet(s"$vd/postings")
        graft.Par.run(
          () => {
            vocabOf(p).write.mode("overwrite").parquet(s"$vd/vocab")
            // the fuzzy-search component: each vocab word's 1-deletion
            // neighborhood, precomputed so typo-tolerant queries never
            // re-expand the vocabulary (the E124 "(len+1)× the vocab"
            // cost paid at build)
            spark.read.parquet(s"$vd/vocab").select(col("word"))
              .withColumn("variant", explode(deletionVariants(col("word"))))
              .write.mode("overwrite").parquet(s"$vd/variants")
          },
          () => statsOf(p).write.mode("overwrite").parquet(s"$vd/stats"),
          // the max-score pruning component: per-word max tf (see maxTfOf)
          () => maxTfOf(p).write.mode("overwrite").parquet(s"$vd/maxtf"))
      },
      () => positionsOf(T.documents(spark, sfDir))
        .write.mode("overwrite").parquet(s"$vd/positions"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(vd, "_meta"),
      "scoring=bm25\nk1=1.2\nb=0.75\nidf=lucene\npositions=1-based\n" +
        "variants=delete1\n")
  }

  /** Tombstoned doc ids for `sfDir`'s index, if any. */
  private def tombstones(s: SparkSession, sfDir: String): Option[DataFrame] = {
    val td = store.tombstoneDir(sfDir)
    if (new java.io.File(td).exists()) Some(s.read.parquet(td)) else None
  }

  /** Logically remove documents (takedowns): ids land in the `_tombstones`
    * side table outside the version dirs — durable across rebuilds and
    * compactions, exactly the [[DedupIndex.tombstone]] contract.
    *
    * Semantics note (the Lucene deleted-docs model): a tombstoned document
    * can never appear in results — its posting rows are anti-joined out —
    * but `vocab`/`stats` keep counting it until [[compact]] rewrites them
    * from the surviving postings. Scores drift by at most the removed
    * fraction of df/avgdl, which is how segment-based engines behave
    * between merges; [[compact]] restores exactness.
    */
  def tombstone(s: SparkSession, sfDir: String, ids: DataFrame): Unit = {
    ensure(s, sfDir)
    ids.select(col(ids.columns.head).cast("long").as("doc"))
      .write.mode("append").parquet(store.tombstoneDir(sfDir))
  }

  /** Physically rewrite the served version without tombstoned rows, and
    * RE-DERIVE vocab/stats from the surviving postings — after compaction
    * the index is row-identical to a from-scratch build over the reduced
    * corpus (PipelineSpec proves it), the [[DedupIndex.compact]] pattern
    * with the extra df/avgdl restore.
    */
  def compact(s: SparkSession, sfDir: String): String = {
    val old = store.servedVersion(sfDir).getOrElse(ensure(s, sfDir))
    store.rewriteVersion(sfDir) { vd =>
      val kept = tombstones(s, sfDir).fold(s.read.parquet(s"$old/postings")) {
        t =>
          s.read.parquet(s"$old/postings")
            .join(broadcast(t.select(col("doc"))), Seq("doc"), "left_anti")
      }
      kept.select("word", "doc", "dl", "tf")
        .write.mode("overwrite").parquet(s"$vd/postings")
      val p = s.read.parquet(s"$vd/postings")
      vocabOf(p).write.mode("overwrite").parquet(s"$vd/vocab")
      statsOf(p).write.mode("overwrite").parquet(s"$vd/stats")
      maxTfOf(p).write.mode("overwrite").parquet(s"$vd/maxtf")
      java.nio.file.Files.copy(java.nio.file.Paths.get(old, "_meta"),
        java.nio.file.Paths.get(vd, "_meta"))
      ()
    }
  }

  /** Persisted posting lists, minus tombstoned docs (broadcast anti-join —
    * the list is tiny; a no-op after compaction).
    */
  def postings(s: SparkSession, sfDir: String): DataFrame = {
    val p = s.read.parquet(ensure(s, sfDir) + "/postings")
    tombstones(s, sfDir).fold(p)(t =>
      p.join(broadcast(t.select(col("doc"))), Seq("doc"), "left_anti")
        .select(p.columns.map(col).toIndexedSeq: _*))
  }

  /** Persisted document frequencies (see [[tombstone]] for staleness). */
  def vocab(s: SparkSession, sfDir: String): DataFrame =
    s.read.parquet(ensure(s, sfDir) + "/vocab")

  /** Persisted corpus stats row (see [[tombstone]] for staleness). */
  def stats(s: SparkSession, sfDir: String): DataFrame =
    s.read.parquet(ensure(s, sfDir) + "/stats")

  /** The persisted components of `sfDir`'s index (builds it if absent). */
  def persisted(s: SparkSession, sfDir: String): Components =
    Components(postings(s, sfDir), vocab(s, sfDir), stats(s, sfDir))

  /** Persisted positional postings (word, doc, pos); builds if absent. A
    * version written before this component existed (artifact-schema
    * evolution) triggers one rebuild.
    */
  def positionsPersisted(s: SparkSession, sfDir: String): DataFrame = {
    val vd = ensure(s, sfDir)
    val pd =
      if (new java.io.File(s"$vd/positions").exists()) vd
      else rebuild(s, sfDir)
    s.read.parquet(s"$pd/positions")
  }

  /** The persisted (word, max_tf) max-score bound — same one-time
    * artifact-schema evolution as [[positionsPersisted]]: a version built
    * before the component existed rebuilds once. (Post-compact versions
    * re-derive it from surviving postings; between tombstone and compact
    * it only loosens, which keeps certification lossless — see
    * [[bm25TopKMaxScore]].)
    */
  def maxTfPersisted(s: SparkSession, sfDir: String): DataFrame = {
    val vd = ensure(s, sfDir)
    val pd =
      if (new java.io.File(s"$vd/maxtf").exists()) vd
      else rebuild(s, sfDir)
    s.read.parquet(s"$pd/maxtf")
  }

  /** The persisted (word, variant) deletion neighborhood — same one-time
    * artifact-schema evolution as [[positionsPersisted]]: a version built
    * before the component existed rebuilds once.
    */
  def variantsPersisted(s: SparkSession, sfDir: String): DataFrame = {
    val vd = ensure(s, sfDir)
    val pd =
      if (new java.io.File(s"$vd/variants").exists()) vd
      else rebuild(s, sfDir)
    s.read.parquet(s"$pd/variants")
  }

  // ---- declared queries --------------------------------------------------

  private def queryDocs(s: SparkSession, dir: String): DataFrame =
    T.documents(s, dir).filter(col("doc_id") < 5)
      .select(col("doc_id").as("qid"), col("text").as("qtext"))

  val queries: Map[String, Q] = Map(
    // L7a: BM25 top-10 per query doc, components derived in-query from raw
    // text (the oracle-anchoring path; exact integer scores end to end).
    "q_text_bm25" -> ((s, dir) =>
      bm25TopK(queryDocs(s, dir), componentsOf(T.documents(s, dir)))),

    // L7b: the SAME search over the PERSISTED index — batch-only query
    // tokenization against stored postings/vocab/stats; corpus text never
    // read. The oracle is byte-identical to q_text_bm25's, so a hash match
    // proves the persisted components lossless (the q_dedup_index_lookup
    // pattern); the bench median measures SEARCH, not build.
    "q_bm25_index_search" -> ((s, dir) =>
      bm25TopK(queryDocs(s, dir), persisted(s, dir))),

    // L7e: max-score (WAND-lite) BM25 through the persisted index + the
    // per-term max_tf bound. LOSSLESS by construction (certify-or-fall-
    // back), so the oracle is byte-identical to q_text_bm25's — a hash
    // match certifies the pruning every round on whichever path each
    // query takes (this corpus's degenerate flat vocabulary mostly falls
    // back; the planted Zipf unit pins the certified path).
    "q_bm25_maxscore" -> ((s, dir) =>
      bm25TopKMaxScore(queryDocs(s, dir), persisted(s, dir),
        maxTfPersisted(s, dir))),

    // L7c: unconditional index rebuild + a summary read over the persisted
    // postings/vocab (word, df, tf_sum) — carries the build cost in its own
    // entry (the q_pq_build pattern) and hash-proves both stored components
    // against a from-scratch DuckDB derivation.
    "q_bm25_index_build" -> ((s, dir) => {
      rebuild(s, dir)
      val p = postings(s, dir)
      vocab(s, dir).join(p.groupBy("word").agg(sum("tf").as("tf_sum")),
        Seq("word"))
        .select(col("word"), col("df"), col("tf_sum"))
    }),

    // L7g: the append path searched end to end — index 4/5 of the corpus,
    // appendBatch the remaining 1/5 (integer df/n/sdl merges, no corpus
    // re-read), then the same BM25 search. The oracle is byte-identical to
    // q_text_bm25's from-scratch derivation over the FULL corpus, so a hash
    // match proves append ∪ old ≡ from-scratch (the q_dedup_append_pairs
    // pattern applied to the text index).
    "q_bm25_append_search" -> ((s, dir) => {
      val docs = T.documents(s, dir)
      val ix = componentsOf(docs.filter(pmod(col("doc_id"), lit(5)) =!= 0))
      bm25TopK(queryDocs(s, dir),
        appendBatch(ix, docs.filter(pmod(col("doc_id"), lit(5)) === 0)))
    }),

    // L7h: exact-phrase retrieval over the PERSISTED positional postings —
    // each query doc's leading trigram searched corpus-wide by the
    // anchor-coverage join (pos − i constant across the phrase). The
    // oracle re-derives positions and the coverage walk from raw text, so
    // a hash match proves the stored positional component lossless AND
    // the phrase semantics; every query's own source doc must surface
    // (n_hits ≥ 1 at its original anchor), which the row's hash pins.
    "q_bm25_phrase" -> ((s, dir) =>
      phraseTopDocs(queryDocs(s, dir), positionsPersisted(s, dir))),

    // L7i: window-proximity retrieval over the same persisted positional
    // component — all of the query's leading distinct words within an
    // 8-token window anchored at the first word's occurrences, any order.
    // The oracle replays positions AND the window-coverage walk from raw
    // text with a direct range join (the Spark side bins it; the hash
    // match proves the binned join ≡ the naive range semantics).
    "q_bm25_proximity" -> ((s, dir) =>
      proximityTopDocs(queryDocs(s, dir), positionsPersisted(s, dir))),

    // L7k: typo-tolerant BM25 over the persisted index — every query word
    // longer than 3 chars is MUTATED (last char dropped), so most query
    // terms are out-of-vocabulary and only the deletion-variant expansion
    // (edit distance ≤ 1 against the stored vocab) recovers them; exact
    // search over the same mutated queries would near-empty. The oracle
    // replays the mutation, both variant neighborhoods, the levenshtein
    // refine, and the BM25 arithmetic from raw text.
    "q_bm25_fuzzy" -> ((s, dir) => {
      val q = T.documents(s, dir).filter(col("doc_id") < 5)
        .select(col("doc_id").as("qid"),
          concat_ws(" ", transform(TextAnalysis.tokens(col("text")),
            w => when(length(w) > 3, w.substr(lit(1), length(w) - 1))
              .otherwise(w))).as("qtext"))
      bm25FuzzyTopK(q, persisted(s, dir),
        variants = Some(variantsPersisted(s, dir)))
    }),

    // L7j: sparse TF-IDF cosine top-10 over the persisted index — the
    // vector-space scorer next to BM25, df-pruned to bound the posting
    // self-join. The synthetic corpus has a ~31-word vocabulary with most
    // dfs near N (every word would fall to the production n/2 stop-word
    // gate and the oracle would go vacuous), so the declared row keeps
    // df/N ≤ 9/10 and the planted unit proves the pruning semantics. The
    // oracle re-derives tf/df/idf and both norms from raw text; integer
    // dots + one final IEEE sqrt/divide make the doubles bit-identical.
    "q_text_cosine_sparse" -> ((s, dir) =>
      sparseCosineTopK(queryDocs(s, dir), persisted(s, dir),
        maxDfNum = 9, maxDfDen = 10)),

    // L7d: hybrid retrieval — reciprocal-rank fusion of the BM25 list and
    // the IVF×SQ8 vector list, BOTH served from persisted indexes (docs and
    // embeddings align 1:1 on id). The oracle re-derives both systems from
    // raw tables and fuses with the same integer RRF arithmetic.
    "q_retrieval_hybrid" -> ((s, dir) => {
      val txt = bm25TopK(queryDocs(s, dir), persisted(s, dir), 10)
        .select(col("qid"), col("doc_id"), col("rank").as("rank_bm25"))
      val e = T.embeddings(s, dir)
      val probes = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val vec = Similarity.sq8IvfTopK(probes, VectorIndex.sq8Codes(s, dir),
          VectorIndex.sq8Stats(s, dir), VectorIndex.cellAssign(s, dir),
          VectorIndex.cells(s, dir), 10)
        .select(col("qid"), col("vec_id").as("doc_id"),
          col("rank").as("rank_vec"))
      rrfFuse(txt, vec, 10)
    })
  )

  // ---- oracles -----------------------------------------------------------

  /** BM25 CTE chain (tokenization → postings → vocab → stats → query terms
    * → integer contributions → scores → ranks), ending at `branked`. CTE
    * names are b-prefixed so the chain composes with the sq8IvfRankedCtes
    * chain inside the hybrid oracle without collision.
    */
  private def bm25Ctes: String =
    """bt AS (
      |  SELECT doc_id,
      |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
      |  FROM documents),
      |bp AS (
      |  SELECT doc_id, len(toks) AS dl, unnest(toks) AS word FROM bt),
      |btf AS (
      |  SELECT word, doc_id, dl, CAST(count(*) AS BIGINT) AS tf
      |  FROM bp GROUP BY 1, 2, 3),
      |bdf AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM btf GROUP BY 1),
      |bst AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS sdl
      |  FROM (SELECT DISTINCT doc_id, dl FROM btf)),
      |bqt AS (
      |  SELECT doc_id AS qid, unnest(list_distinct(toks)) AS word
      |  FROM bt WHERE doc_id < 5),
      |bc AS (
      |  SELECT q.qid, p.doc_id,
      |    CAST(round(ln((CAST(bst.n - f.df AS DOUBLE) + 0.5) /
      |                  (CAST(f.df AS DOUBLE) + 0.5) + 1.0) * 1000000, 0) AS BIGINT) *
      |    CAST(round(CAST(p.tf AS DOUBLE) * 2.2 /
      |                 (CAST(p.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
      |                   (CAST(p.dl AS DOUBLE) /
      |                    (CAST(bst.sdl AS DOUBLE) / CAST(bst.n AS DOUBLE))))) *
      |               1000000, 0) AS BIGINT) AS c
      |  FROM bqt q
      |  JOIN btf p USING (word)
      |  JOIN bdf f USING (word)
      |  CROSS JOIN bst
      |  WHERE p.doc_id <> q.qid),
      |bscored AS (
      |  SELECT qid, doc_id, CAST(SUM(c) AS BIGINT) AS score_u
      |  FROM bc GROUP BY 1, 2),
      |branked AS (
      |  SELECT qid, doc_id, score_u,
      |    CAST(row_number() OVER (PARTITION BY qid
      |      ORDER BY score_u DESC, doc_id) AS INTEGER) AS rank
      |  FROM bscored)""".stripMargin

  private lazy val bm25Sql: String =
    s"""WITH $bm25Ctes
       |SELECT qid, rank, doc_id, score_u FROM branked WHERE rank <= 10
       |ORDER BY ALL NULLS FIRST""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_text_bm25" -> bm25Sql,
    // byte-identical on purpose: hash match proves the persisted index
    // components equal the in-query derivation (see q_bm25_index_search)
    "q_bm25_index_search" -> bm25Sql,
    // byte-identical: lossless max-score pruning cannot change the list
    "q_bm25_maxscore" -> bm25Sql,
    // byte-identical again: append(4/5-index, 1/5-batch) must equal the
    // from-scratch full-corpus build through the whole search path
    "q_bm25_append_search" -> bm25Sql,
    // positions re-derived from raw text (1-based over the raw token
    // array, empties filtered after assignment — the q_bpe_tokenize
    // convention); phrase match = anchor coverage, n_hits = anchors
    "q_bm25_phrase" ->
      """WITH qd AS (
        |  SELECT doc_id AS qid,
        |    list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
        |      w -> length(w) > 0) AS qtoks
        |  FROM documents WHERE doc_id < 5),
        |qp AS (
        |  SELECT qid, i - 1 AS i, qtoks[i] AS w
        |  FROM (SELECT qid, qtoks,
        |          unnest(generate_series(1, least(3, len(qtoks)))) AS i
        |        FROM qd)),
        |plen AS (SELECT qid, count(DISTINCT i) AS plen FROM qp GROUP BY 1),
        |dt AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id AS doc, pos, word
        |  FROM (SELECT doc_id, unnest(generate_series(1, len(toks))) AS pos,
        |          unnest(toks) AS word
        |        FROM dt)
        |  WHERE length(word) > 0),
        |cand AS (
        |  SELECT q.qid, p.doc, p.pos - q.i AS anchor, q.i
        |  FROM pos p JOIN qp q ON p.word = q.w),
        |cov AS (
        |  SELECT qid, doc, anchor, count(DISTINCT i) AS cover
        |  FROM cand GROUP BY 1, 2, 3),
        |hits AS (
        |  SELECT c.qid, c.doc, CAST(count(*) AS BIGINT) AS n_hits
        |  FROM cov c JOIN plen l USING (qid)
        |  WHERE c.cover = l.plen GROUP BY 1, 2)
        |SELECT qid, doc AS doc_id, n_hits FROM hits
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    // positions re-derived from raw text; proximity = anchor-window
    // coverage over DISTINCT query words (naive range join here — the
    // Spark side's binned join must hash-match these semantics exactly)
    "q_bm25_proximity" ->
      """WITH qd AS (
        |  SELECT doc_id AS qid,
        |    list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
        |      w -> length(w) > 0) AS qtoks
        |  FROM documents WHERE doc_id < 5),
        |qp AS (
        |  SELECT qid, i - 1 AS i, qtoks[i] AS w
        |  FROM (SELECT qid, qtoks,
        |          unnest(generate_series(1, least(3, len(qtoks)))) AS i
        |        FROM qd)),
        |qw AS (SELECT qid, w, min(i) AS mi FROM qp GROUP BY 1, 2),
        |nw AS (SELECT qid, count(*) AS nw FROM qw GROUP BY 1),
        |dt AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id AS doc, pos, word
        |  FROM (SELECT doc_id, unnest(generate_series(1, len(toks))) AS pos,
        |          unnest(toks) AS word
        |        FROM dt)
        |  WHERE length(word) > 0),
        |matched AS (
        |  SELECT q.qid, p.doc, q.w, q.mi, p.pos
        |  FROM pos p JOIN qw q ON p.word = q.w),
        |anch AS (SELECT qid, doc, pos AS anchor FROM matched WHERE mi = 0),
        |cov AS (
        |  SELECT a.qid, a.doc, a.anchor, count(DISTINCT m.w) AS cover
        |  FROM anch a JOIN matched m
        |    ON m.qid = a.qid AND m.doc = a.doc
        |    AND m.pos >= a.anchor AND m.pos < a.anchor + 8
        |  GROUP BY 1, 2, 3),
        |hits AS (
        |  SELECT c.qid, c.doc, CAST(count(*) AS BIGINT) AS n_windows
        |  FROM cov c JOIN nw USING (qid)
        |  WHERE c.cover = nw.nw GROUP BY 1, 2)
        |SELECT qid, doc AS doc_id, n_windows FROM hits
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    // the mutation, both deletion-variant neighborhoods, the levenshtein
    // refine and the BM25 arithmetic all re-derived from raw text
    "q_bm25_fuzzy" ->
      """WITH bt AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
        |  FROM documents),
        |bp AS (
        |  SELECT doc_id, len(toks) AS dl, unnest(toks) AS word FROM bt),
        |btf AS (
        |  SELECT word, doc_id, dl, CAST(count(*) AS BIGINT) AS tf
        |  FROM bp GROUP BY 1, 2, 3),
        |bdf AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM btf GROUP BY 1),
        |bst AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS sdl
        |  FROM (SELECT DISTINCT doc_id, dl FROM btf)),
        |fq AS (
        |  SELECT doc_id AS qid,
        |    unnest(list_distinct(list_transform(toks,
        |      w -> CASE WHEN length(w) > 3 THEN substr(w, 1, length(w) - 1)
        |           ELSE w END))) AS qword
        |  FROM bt WHERE doc_id < 5),
        |fqv AS (
        |  SELECT qid, qword, qword AS variant FROM fq
        |  UNION ALL
        |  SELECT qid, qword, substr(qword, 1, i - 1) || substr(qword, i + 1) AS variant
        |  FROM (SELECT qid, qword, unnest(range(1, length(qword) + 1)) AS i FROM fq)),
        |fvv AS (
        |  SELECT word, word AS variant FROM bdf
        |  UNION ALL
        |  SELECT word, substr(word, 1, i - 1) || substr(word, i + 1) AS variant
        |  FROM (SELECT word, unnest(range(1, length(word) + 1)) AS i FROM bdf)),
        |fexp AS (
        |  SELECT DISTINCT q.qid, v.word
        |  FROM fqv q JOIN fvv v USING (variant)
        |  WHERE levenshtein(q.qword, v.word) <= 1),
        |bc AS (
        |  SELECT q.qid, p.doc_id,
        |    CAST(round(ln((CAST(bst.n - f.df AS DOUBLE) + 0.5) /
        |                  (CAST(f.df AS DOUBLE) + 0.5) + 1.0) * 1000000, 0) AS BIGINT) *
        |    CAST(round(CAST(p.tf AS DOUBLE) * 2.2 /
        |                 (CAST(p.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
        |                   (CAST(p.dl AS DOUBLE) /
        |                    (CAST(bst.sdl AS DOUBLE) / CAST(bst.n AS DOUBLE))))) *
        |               1000000, 0) AS BIGINT) AS c
        |  FROM fexp q
        |  JOIN btf p USING (word)
        |  JOIN bdf f USING (word)
        |  CROSS JOIN bst
        |  WHERE p.doc_id <> q.qid),
        |bscored AS (
        |  SELECT qid, doc_id, CAST(SUM(c) AS BIGINT) AS score_u
        |  FROM bc GROUP BY 1, 2),
        |branked AS (
        |  SELECT qid, doc_id, score_u,
        |    CAST(row_number() OVER (PARTITION BY qid
        |      ORDER BY score_u DESC, doc_id) AS INTEGER) AS rank
        |  FROM bscored)
        |SELECT qid, rank, doc_id, score_u FROM branked WHERE rank <= 10
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    // tf/df/idf and both norms re-derived from raw text; query docs are
    // corpus docs (doc_id < 5), so their term stats reuse the posting CTE
    "q_text_cosine_sparse" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
        |  FROM documents),
        |p AS (SELECT doc_id, unnest(toks) AS word FROM t),
        |tf AS (
        |  SELECT word, doc_id, CAST(count(*) AS BIGINT) AS tf
        |  FROM p GROUP BY 1, 2),
        |df AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |st AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM tf),
        |kept AS (
        |  SELECT word,
        |    CAST(round(ln(CAST(st.n AS DOUBLE) / CAST(df AS DOUBLE)) * 100000, 0) AS BIGINT) AS idf_u
        |  FROM df CROSS JOIN st WHERE df * 10 <= st.n * 9),
        |cp AS (
        |  SELECT f.word, f.doc_id AS doc, f.tf, k.idf_u
        |  FROM tf f JOIN kept k USING (word)),
        |dn AS (
        |  SELECT doc, CAST(SUM(tf * tf * idf_u * idf_u) AS BIGINT) AS dn2
        |  FROM cp GROUP BY 1),
        |qt AS (SELECT doc AS qid, word, tf AS qtf, idf_u FROM cp WHERE doc < 5),
        |qn AS (
        |  SELECT qid, CAST(SUM(qtf * qtf * idf_u * idf_u) AS BIGINT) AS qn2
        |  FROM qt GROUP BY 1),
        |dots AS (
        |  SELECT q.qid, c.doc,
        |    CAST(SUM(q.qtf * c.tf * c.idf_u * c.idf_u) AS BIGINT) AS dot_u
        |  FROM qt q JOIN cp c USING (word) WHERE c.doc <> q.qid
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT d.qid, d.doc,
        |    round(CAST(d.dot_u AS DOUBLE) /
        |      (sqrt(CAST(qn.qn2 AS DOUBLE)) * sqrt(CAST(dn.dn2 AS DOUBLE))), 6) AS sim
        |  FROM dots d JOIN qn USING (qid) JOIN dn ON dn.doc = d.doc),
        |ranked AS (
        |  SELECT qid, doc, sim,
        |    CAST(row_number() OVER (PARTITION BY qid
        |      ORDER BY sim DESC, doc) AS INTEGER) AS rank
        |  FROM scored)
        |SELECT qid, rank, doc AS doc_id, sim FROM ranked WHERE rank <= 10
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_bm25_index_build" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, unnest(toks) AS word FROM t),
        |tf AS (SELECT word, doc_id, CAST(count(*) AS BIGINT) AS tf
        |       FROM p GROUP BY 1, 2)
        |SELECT word, CAST(count(*) AS BIGINT) AS df,
        |  CAST(SUM(tf) AS BIGINT) AS tf_sum
        |FROM tf GROUP BY 1 ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_retrieval_hybrid" ->
      s"""${Similarity.sq8IvfRankedCtes("TRUE")},
         |$bm25Ctes,
         |tlist AS (SELECT qid, doc_id, rank AS rank_bm25 FROM branked WHERE rank <= 10),
         |vlist AS (SELECT qid, vec_id AS doc_id, rank AS rank_vec FROM ranked WHERE rank <= 10),
         |fused AS (
         |  SELECT COALESCE(t.qid, v.qid) AS qid,
         |    COALESCE(t.doc_id, v.doc_id) AS doc_id,
         |    t.rank_bm25, v.rank_vec,
         |    COALESCE(CAST(round(1000000.0 / (60.0 + CAST(t.rank_bm25 AS DOUBLE)), 0) AS BIGINT), 0) +
         |    COALESCE(CAST(round(1000000.0 / (60.0 + CAST(v.rank_vec AS DOUBLE)), 0) AS BIGINT), 0) AS rrf_u
         |  FROM tlist t FULL OUTER JOIN vlist v
         |    ON t.qid = v.qid AND t.doc_id = v.doc_id),
         |ffinal AS (
         |  SELECT qid, doc_id, rrf_u, rank_bm25, rank_vec,
         |    CAST(row_number() OVER (PARTITION BY qid
         |      ORDER BY rrf_u DESC, doc_id) AS INTEGER) AS rank
         |  FROM fused)
         |SELECT qid, rank, doc_id, rrf_u, rank_bm25, rank_vec
         |FROM ffinal WHERE rank <= 10
         |ORDER BY ALL NULLS FIRST""".stripMargin
  )
}

package graft.pipeline

import graft.{Q, Tables => T}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data pipelines.
  *
  * Production pipelines sample by HASHING a stable key, not by `rand()`:
  * the sample is then reproducible across reruns, engines, repartitioning,
  * and speculative retries, membership is decidable per row with no state,
  * and up/down-sampling a stratum later keeps prior members (hash buckets
  * nest). `df.stat.sampleBy` (kept here as the API-parity demo) offers none
  * of those at 100 TB.
  */
object Sampling {

  /** Stable [0, 100) bucket of a key: first 8 hex chars of md5 as an int.
    * md5 rather than xxhash64 so any engine (and the DuckDB oracle) can
    * reproduce membership.
    */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Keep `pct`% of rows, decided by key hash — reproducible sampling. */
  def hashSample(df: DataFrame, key: Column, pct: Int): DataFrame =
    df.filter(hashBucket(key) < pct)

  /** Per-stratum rates: keep `rates(stratum)`% (default `otherPct`%). */
  def stratifiedHashSample(df: DataFrame, key: Column, stratum: Column,
      rates: Map[String, Int], otherPct: Int): DataFrame = {
    val rate = rates.foldLeft(lit(otherPct)) { case (acc, (value, pct)) =>
      when(stratum === value, pct).otherwise(acc)
    }
    df.filter(hashBucket(key) < rate)
  }

  /** Epoch-weighted source mixing — the dataset-mixture step of LLM
    * training prep ("Wikipedia × 3 epochs, CommonCrawl × 0.3"): each row is
    * replicated `epochsPct(source)/100` times, with the fractional epoch
    * decided by the row's hash bucket (reproducible, nests across rate
    * changes like all hash sampling here). Rates in integer PERCENT so the
    * copy arithmetic is exact.
    *
    * Scale shape: per-row `explode(sequence(1, copies))` — no shuffle at
    * all; output carries the copy index so downstream shuffles can salt on
    * it (identical copies otherwise co-locate on any content key).
    */
  def mixWithEpochs(df: DataFrame, key: Column, source: Column,
      epochsPct: Map[String, Int], otherPct: Int): DataFrame = {
    val pct = epochsPct.foldLeft(lit(otherPct)) { case (acc, (v, p)) =>
      when(source === v, p).otherwise(acc)
    }
    val copies = (pct / lit(100)).cast("int") +
      when(hashBucket(key) < pct % 100, 1).otherwise(0)
    // Spark's sequence(1, 0) DESCENDS — guard zero-copy rows explicitly
    // (explode of an empty array drops the row, which is the semantics).
    df.withColumn("copy", explode(
      when(copies >= 1, sequence(lit(1), copies))
        .otherwise(lit(Array.empty[Int]))))
  }

  /** Leakage-safe train/val split: the split is decided by the hash bucket
    * of the document's duplicate-CLUSTER label (near-dup components from
    * [[Dedup.duplicateClusters]]; singletons key on their own id), so two
    * near-duplicate documents can never straddle the split — the eval-set
    * leakage a per-document split silently permits whenever the corpus
    * wasn't perfectly deduped first.
    *
    * Scale shape: the component labels are the verified iterative min-label
    * path (narrow joins per round over the LSH pair list); the split itself
    * is one left join on doc_id + a per-row hash — no extra wide state.
    */
  def leakSafeSplit(docs: DataFrame, pairs: DataFrame, valPct: Int = 20): DataFrame = {
    val labels = Dedup.duplicateClusters(pairs)
      .select(col("id").as("doc_id"), col("label"))
    docs.join(labels, Seq("doc_id"), "left")
      .withColumn("split",
        when(hashBucket(coalesce(col("label"), col("doc_id"))) < valPct, lit("val"))
          .otherwise(lit("train")))
      .drop("label")
  }

  /** Pack documents into fixed-token-budget shards, per source: docs are
    * laid out in (source, doc_id) order and a doc's shard is the bin its
    * START offset falls in — the sequence-packing layout step before
    * tokenize-and-concatenate training prep. Per-source windows keep the
    * running sum distributed (one shuffle on source, no global sort).
    */
  def packIntoShards(docs: DataFrame, tokensPerShard: Int): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
    docs
      .withColumn("n_tokens", size(split(trim(regexp_replace(lower(col("text")),
        "\\s+", " ")), " ")))
      .withColumn("start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("shard", expr(s"start div ${tokensPerShard}L"))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("shard"))
  }

  /** Per-source token-budget selection — "take ~N tokens from each source",
    * the sizing step of a training mixture: documents are laid out in a
    * seeded deterministic pseudo-random order (md5 of the doc id — the
    * hash-sampling posture, so membership is reproducible across engines
    * and reruns and the prefix NESTS: raising the budget keeps every
    * previously selected doc), and a doc is kept iff its running token sum
    * STARTS under the budget — so the budget overshoots by at most one
    * document, never truncates mid-doc. One shuffle on source; the window
    * is the packIntoShards running-sum shape.
    */
  def takeTokenBudget(docs: DataFrame, budgetTokens: Long): DataFrame = {
    val w = Window.partitionBy("source")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs
      .withColumn("n_tokens", size(split(trim(regexp_replace(lower(col("text")),
        "\\s+", " ")), " ")).cast("long"))
      .withColumn("start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .filter(col("start") < budgetTokens)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("start"))
  }

  /** Fixed-size mixture allocation: apportion `total` sample slots across
    * sources proportional to MIXTURE WEIGHTS (a config, not the corpus —
    * the "20% code, 5% wiki" knob of a training recipe) by the
    * largest-remainder (Hamilton) method, then fill each source's quota
    * with its deterministic md5-prefix (the [[takeTokenBudget]] ordering,
    * so membership nests and reproduces across engines). All integer
    * arithmetic: base = total·w div Σw, the Σbase shortfall goes to the
    * largest remainders (total·w mod Σw, ties by source name), and a quota
    * is CAPPED at the source's availability (capped slots are reported,
    * not redistributed — the caller widens weights instead, documented).
    * Zero-weight sources drop. Returns (source, doc_id, rn, quota).
    *
    * Scale shape: the apportionment runs over the per-source COUNT frame
    * (metadata-scale — one row per source; the windows on it are a few
    * dozen rows), docs join the broadcast quota row of their source, and
    * the only corpus-sized work is one source-partitioned window for the
    * md5 prefix rank.
    */
  def allocateBySource(docs: DataFrame, weights: Map[String, Int],
      defaultWeight: Int, total: Int): DataFrame = {
    val wExpr = weights.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultWeight.toLong)) { case (acc, (k, v)) =>
        when(col("source") === k, v.toLong).otherwise(acc)
      }
    val srcs = docs.groupBy("source").agg(count(lit(1)).as("n_avail"))
      .withColumn("w", wExpr).filter(col("w") > 0)
    val all = Window.partitionBy()
    val byRem = Window.partitionBy()
      .orderBy(col("rem").desc, col("source"))
    val quotas = srcs
      .withColumn("sw", sum(col("w")).over(all))
      .withColumn("base", expr(s"(${total}L * w) div sw"))
      .withColumn("rem", expr(s"(${total}L * w) % sw"))
      .withColumn("deficit", lit(total.toLong) - sum(col("base")).over(all))
      .withColumn("rk", row_number().over(byRem))
      .withColumn("quota", least(
        col("base") + when(col("rk") <= col("deficit"), 1L).otherwise(0L),
        col("n_avail")))
      .select("source", "quota")
    val w = Window.partitionBy("source")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs.join(broadcast(quotas), Seq("source"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= col("quota"))
      .select(col("source"), col("doc_id"), col("rn"), col("quota"))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    * each doc draws the deterministic uniform u = (md5₃₂(id) + 1)/2³² ∈
    * (0, 1] and keys on u^(1/w); the k largest keys are a weighted
    * without-replacement sample (P(first pick) = wᵢ/Σw — the one-pass
    * priority formulation of weighted sampling). Fully reproducible:
    * same ids → same sample, any engine, any partitioning. Keys round to
    * 6 before ranking so the 1-ulp pow/ln seam between engines cannot
    * reorder; weights clamp to ≥ 1. Ties at the rounded key break on a
    * SECOND, SALTED hash (md5 of "tie|" + doc id), then doc_id — with
    * large weights many keys cluster at 1.0 after rounding, and a raw
    * doc_id tie-break would bias the clustered tail toward low ids
    * instead of a weight-independent uniform pick. The salt matters:
    * the unsalted md5(doc_id) is the very string whose first 8 hex
    * chars define u, so ordering ties by it orders by u ascending —
    * within a rounded-pri cluster higher-weight docs reach lower u, and
    * the tie-break would be weight-BIASED. Prefixing "tie|" makes the
    * tie digest independent of the u digest.
    *
    * Scale shape: a per-row key + TakeOrdered top-k (no global sort
    * materializes; Spark plans TakeOrderedAndProject) and a window over
    * only the k winners for the rank column.
    */
  def weightedSample(docs: DataFrame, weight: Column, k: Int): DataFrame = {
    val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("double") + lit(1.0)) / lit(4294967296.0)
    val w = greatest(weight.cast("double"), lit(1.0))
    val tie = md5(concat(lit("tie|"), col("doc_id").cast("string")))
    val keyed = docs
      .withColumn("w", weight.cast("long"))
      .withColumn("pri", round(pow(u, lit(1.0) / w), 6))
      .select(col("doc_id"), col("w"), col("pri"))
      .orderBy(col("pri").desc, tie, col("doc_id"))
      .limit(k)
    keyed.withColumn("rk", row_number().over(
      Window.orderBy(col("pri").desc, tie, col("doc_id"))))
  }

  /** DSIR-style data selection (Xie et al., "Data Selection for Language
    * Models via Importance Resampling", NeurIPS 2023): surface the raw
    * docs most TARGET-like under hashed-n-gram bag-of-words models — the
    * standard pretraining recipe for "find the wiki-quality slice of a
    * web crawl". Features are per-occurrence bigrams hashed into
    * `buckets` buckets (md5 so any engine reproduces membership — the
    * [[hashBucket]] convention over the positional
    * [[graft.functions.TextHashes.spanMd5Hashes]] grams); the target and
    * raw (= whole corpus, target included — the paper's source
    * distribution) bucket models get add-1 smoothing over the bucket
    * count, each `ln` rounded to integer micro-nats BEFORE the subtract
    * (the q_text_lm recipe — doc scores are then order-independent
    * integer dot products, bitwise-reproducible cross-engine). A doc's
    * importance score is Σ_buckets count·(ln p_target − ln p_raw); the
    * top `k` non-target docs by (score, doc_id) are the selection. Docs
    * under 2 tokens carry no features and never surface.
    *
    * Scale shape: one corpus gram pass → per-(doc, bucket) counts (one
    * shuffle with map-side combine); the bucket models are a second agg
    * at BUCKET cardinality (B rows — metadata-scale however large the
    * corpus); the 1-row totals attach is the q_text_bm25 stats-row
    * family; the B-row log-ratio table broadcast-joins back; the global
    * top-k is TakeOrderedAndProject (per-partition heads, never a full
    * sort) with the rank window riding only the k winners — the
    * [[weightedSample]] posture.
    */
  def dsirSelect(docs: DataFrame, isTarget: Column, k: Int,
      buckets: Int = 256): DataFrame = {
    import graft.functions.TextHashes.spanMd5Hashes
    val grams = docs
      .select(col("doc_id"), isTarget.as("is_target"),
        explode(spanMd5Hashes(col("text"), 2)).as("h"))
      .withColumn("b",
        pmod(conv(substring(col("h"), 1, 8), 16, 10).cast("long"),
          lit(buckets.toLong)))
    val feats = grams.groupBy("doc_id", "is_target", "b")
      .agg(count(lit(1)).as("n"))
    val model = feats.groupBy("b").agg(
      sum(when(col("is_target"), col("n")).otherwise(0L)).as("tc"),
      sum(col("n")).as("rc"))
    val tot = model.agg(sum("tc").as("tt"), sum("rc").as("rt"))
    val lr = model.crossJoin(broadcast(tot))
      .withColumn("lpt", round(log((col("tc") + 1).cast("double") /
        (col("tt") + buckets).cast("double")) * 1e6, 0).cast("long"))
      .withColumn("lpr", round(log((col("rc") + 1).cast("double") /
        (col("rt") + buckets).cast("double")) * 1e6, 0).cast("long"))
      .select(col("b"), (col("lpt") - col("lpr")).as("lru"))
    val scored = feats.filter(!col("is_target"))
      .join(broadcast(lr), Seq("b"))
      .groupBy("doc_id")
      .agg(sum(col("n") * col("lru")).as("score_micro"),
        sum(col("n")).cast("long").as("n_grams"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(k)
    scored.withColumn("rk", row_number().over(
      Window.orderBy(col("score_micro").desc, col("doc_id"))))
      .select("doc_id", "n_grams", "score_micro", "rk")
  }

  val queries: Map[String, Q] = Map(
    // Weighted reservoir: 50 docs drawn without replacement with
    // P ∝ n_chars — the full kept set (ids, weights, keys, ranks)
    // hash-checked, proving the priority formula and the ordering.
    "q_sample_weighted" -> ((s, dir) =>
      weightedSample(T.documents(s, dir), col("n_chars"), 50)),

    // DSIR importance selection: target = src0's docs, raw = the whole
    // corpus, 256 hashed-bigram buckets, top 100 raw docs surfaced. The
    // full selection (ids, gram counts, integer micro-nat scores, ranks)
    // is hash-checked — feature hashing, both smoothed models, the
    // rounding recipe, the dot product, and the top-k boundary all pinned.
    "q_dsir_select" -> ((s, dir) =>
      dsirSelect(T.documents(s, dir), col("source") === "src0", 100)),

    // Stratified reproducible sample: English kept at 80%, the rest at 20%
    // — the rebalancing step of corpus curation, exactly reproducible in any
    // engine (oracle-checked).
    "q_sample_stratified" -> ((s, dir) => {
      stratifiedHashSample(T.documents(s, dir), col("doc_id"), col("lang"),
        Map("en" -> 80), otherPct = 20)
        .groupBy("lang").agg(count(lit(1)).as("n_kept"))
    }),

    // Mixture with epochs: src0 × 2.5 epochs, src1 × 0 (dropped), others
    // × 0.3 — per-source row counts after replication (oracle-checked).
    "q_sample_mix" -> ((s, dir) => {
      mixWithEpochs(T.documents(s, dir), col("doc_id"), col("source"),
        Map("src0" -> 250, "src1" -> 0), otherPct = 30)
        .groupBy("source").agg(count(lit(1)).as("n_rows"),
          countDistinct(col("doc_id")).as("n_docs"))
    }),

    // Leakage-safe split: every doc's split decided by its duplicate-cluster
    // label's hash bucket (oracle re-derives the LSH pairs, resolves the
    // components with a recursive CTE, and replays the bucket arithmetic —
    // the full assignment is hash-checked, not just the counts). The pair
    // list is the persisted index's (q_dedup_index_pairs hash-proves it
    // lossless) — the split job never re-shingles the corpus.
    "q_sample_split_safe" -> ((s, dir) => {
      leakSafeSplit(T.documents(s, dir), DedupIndex.pairs(s, dir))
        .select(col("doc_id"), col("split"))
    }),

    // Token-budget selection: ~700 tokens per source (roughly half of
    // each source's corpus, so the cut binds) in the deterministic
    // md5 order — the full kept set (ids, sizes, offsets) hash-checked, so
    // the oracle proves ordering, running sums, and the boundary rule.
    "q_sample_budget" -> ((s, dir) =>
      takeTokenBudget(T.documents(s, dir), 700)),

    // Largest-remainder mixture allocation: 123 slots over weights
    // src0 → 50, src1 → 0 (dropped), default 10. The remainder pass AND
    // the availability cap both bind (src0's 27-slot quota caps at 25
    // docs at sf0.001); the full kept set (ids, ranks, quotas) is
    // hash-checked, proving the apportionment arithmetic, the md5 fill
    // order, and the cap.
    "q_sample_allocation" -> ((s, dir) =>
      allocateBySource(T.documents(s, dir),
        Map("src0" -> 50, "src1" -> 0), defaultWeight = 10, total = 123)),

    // Token-budget shard packing: per (source, shard) fill profile
    // (oracle-checked; the window arithmetic is integer-exact).
    "q_sample_pack" -> ((s, dir) => {
      packIntoShards(T.documents(s, dir), 512)
        .groupBy("source", "shard")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("long").as("shard_tokens"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_sample_stratified" ->
      """SELECT lang, count(*) AS n_kept FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100
        |      < (CASE WHEN lang = 'en' THEN 80 ELSE 20 END)
        |GROUP BY 1 ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_sample_mix" ->
      """WITH c AS (
        |  SELECT doc_id, source,
        |    CASE WHEN source = 'src0' THEN 250
        |         WHEN source = 'src1' THEN 0 ELSE 30 END AS pct,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS b
        |  FROM documents),
        |e AS (
        |  SELECT doc_id, source,
        |    (pct // 100) + CASE WHEN b < pct % 100 THEN 1 ELSE 0 END AS n
        |  FROM c),
        |x AS (
        |  SELECT doc_id, source, unnest(generate_series(1, n)) AS copy
        |  FROM e WHERE n >= 1)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |FROM x GROUP BY 1 ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_sample_split_safe" ->
      s"""WITH RECURSIVE ${Dedup.lshPairsMd5Sql()},
         |${Dedup.clusterLabelCtesSql},
         |keyed AS (
         |  SELECT d.doc_id, coalesce(l.label, d.doc_id) AS gkey
         |  FROM documents d LEFT JOIN labels l ON d.doc_id = l.id)
         |SELECT doc_id,
         |  CASE WHEN CAST(('0x' || substr(md5(CAST(gkey AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 20
         |       THEN 'val' ELSE 'train' END AS split
         |FROM keyed ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_sample_budget" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, source, n_tokens,
        |    CAST(SUM(n_tokens) OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
        |      - n_tokens AS start
        |  FROM t)
        |SELECT doc_id, source, n_tokens, start FROM s WHERE start < 700
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_sample_weighted" ->
      """WITH p AS (
        |  SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
        |    round(pow((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1.0)
        |            / 4294967296.0,
        |          1.0 / GREATEST(CAST(n_chars AS DOUBLE), 1.0)), 6) AS pri
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, w, pri,
        |    CAST(row_number() OVER (ORDER BY pri DESC,
        |      md5('tie|' || CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER) AS rk
        |  FROM p)
        |SELECT doc_id, w, pri, rk FROM r WHERE rk <= 50
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    // the full DSIR chain re-derived: positional bigrams, md5 bucket
    // hashing, both add-1-smoothed models, per-ln micro-nat rounding,
    // the integer dot product, and the (score DESC, doc_id) top-100 cut
    "q_dsir_select" ->
      """WITH t AS (
        |  SELECT doc_id, source = 'src0' AS is_target,
        |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, is_target,
        |    CAST(('0x' || substr(md5(unnest(
        |      CASE WHEN len(toks) < 2 THEN []
        |           ELSE list_transform(generate_series(1, len(toks) - 1),
        |             i -> toks[i] || ' ' || toks[i + 1]) END)), 1, 8)) AS BIGINT) % 256 AS b
        |  FROM t),
        |f AS (SELECT doc_id, is_target, b, count(*) AS n FROM g GROUP BY 1, 2, 3),
        |m AS (
        |  SELECT b, SUM(CASE WHEN is_target THEN n ELSE 0 END) AS tc,
        |    SUM(n) AS rc
        |  FROM f GROUP BY 1),
        |tot AS (SELECT SUM(tc) AS tt, SUM(rc) AS rt FROM m),
        |lr AS (
        |  SELECT b,
        |    CAST(round(ln((tc + 1.0) / (tt + 256)) * 1000000, 0) AS BIGINT) -
        |    CAST(round(ln((rc + 1.0) / (rt + 256)) * 1000000, 0) AS BIGINT) AS lru
        |  FROM m, tot),
        |s AS (
        |  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_grams,
        |    CAST(SUM(n * lru) AS BIGINT) AS score_micro
        |  FROM f JOIN lr USING (b) WHERE NOT is_target GROUP BY 1),
        |top AS (
        |  SELECT *, CAST(row_number()
        |    OVER (ORDER BY score_micro DESC, doc_id) AS INTEGER) AS rk
        |  FROM s)
        |SELECT doc_id, n_grams, score_micro, rk FROM top WHERE rk <= 100
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_sample_allocation" ->
      """WITH srcs AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_avail,
        |    CAST(CASE WHEN source = 'src0' THEN 50
        |              WHEN source = 'src1' THEN 0 ELSE 10 END AS BIGINT) AS w
        |  FROM documents GROUP BY 1),
        |pos AS (SELECT * FROM srcs WHERE w > 0),
        |app AS (
        |  SELECT source, n_avail,
        |    (123 * w) // SUM(w) OVER () AS base,
        |    (123 * w) % SUM(w) OVER () AS rem
        |  FROM pos),
        |rk AS (
        |  SELECT source, n_avail, base, rem,
        |    123 - SUM(base) OVER () AS deficit,
        |    row_number() OVER (ORDER BY rem DESC, source) AS rk
        |  FROM app),
        |q AS (
        |  SELECT source,
        |    LEAST(base + CASE WHEN rk <= deficit THEN 1 ELSE 0 END,
        |          n_avail) AS quota
        |  FROM rk),
        |ranked AS (
        |  SELECT d.source, d.doc_id, q.quota,
        |    CAST(row_number() OVER (PARTITION BY d.source
        |      ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS BIGINT) AS rn
        |  FROM documents d JOIN q USING (source))
        |SELECT source, doc_id, rn, CAST(quota AS BIGINT) AS quota
        |FROM ranked WHERE rn <= quota
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_sample_pack" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS INTEGER) AS n_tokens
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, source, n_tokens,
        |    CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) - n_tokens AS start
        |  FROM t)
        |SELECT source, start // 512 AS shard, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens
        |FROM s GROUP BY 1, 2 ORDER BY ALL NULLS FIRST""".stripMargin
  )
}

package graft.pipeline

import graft.{Q, Tables => T}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) tokenizer — train the merge table
  * on the corpus, then tokenize with it. The real-tokenizer counterpart of
  * `q_text_tokens`' regex token classes, and a first-class training-data
  * pipeline op: every LLM corpus pass ends in a learned subword
  * segmentation, and the classic BPE trainer (Sennrich et al.'s greedy
  * pair-merge) is exactly the kind of iterative aggregation Spark does
  * well.
  *
  * Scale shape (the reason BPE trains fine at 100 TB): training never
  * iterates over the corpus — it iterates over the AGGREGATED word-count
  * table (one narrow explode+count shuffle over the corpus, then rounds
  * over a vocabulary that is orders of magnitude smaller). Each round is
  *   (1) pair counts: per-row transform + one narrow aggregation,
  *   (2) argmax pair: ONE row, fetched to the driver by a TakeOrdered
  *       collect (metadata-scale — a broadcast build would executeCollect
  *       the identical row to the driver, with an extra job per round;
  *       the fetch also materializes the round's cached symbol table), and
  *   (3) merge application: a per-row higher-order `aggregate` walk with
  *       the pair inlined as literals.
  * Rounds cache (MEMORY_AND_DISK) rather than eagerly checkpoint, so each
  * round costs exactly one Spark job. Tokenizing
  * applies merges to DISTINCT words then joins back to documents — the
  * vocabulary-lookup shape production tokenizers use.
  *
  * Determinism (hash-match contract): everything here is integer counts
  * and string compares — no floats at all. The argmax tie-break is
  * (count DESC, left ASC, right ASC); the greedy merge is leftmost-first
  * non-overlapping, and both engines implement exactly that walk (Spark as
  * a higher-order fold, DuckDB as a gaps-and-islands window rewrite —
  * different texts, same semantics, which the hash compare proves).
  *
  * No end-of-word marker is used (symbols never cross word boundaries and
  * the declared queries never need to invert the segmentation) — a
  * deliberate simplification, documented here.
  */
object Bpe {

  /** Corpus word counts (word, n) over normalized whitespace tokens; empty
    * tokens (empty-text documents) are excluded.
    */
  def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** The character-split symbol array of one word, as an expression. */
  private def charSplitCol(w: Column): Column =
    transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1)))

  /** (word, n, s): `s` is the character-split symbol array. */
  private def charSplit(words: DataFrame): DataFrame =
    words.withColumn("s", charSplitCol(col("word")))

  /** Weighted adjacent-pair counts (l, r, c) over a symbol table. */
  private def pairCounts(w: DataFrame): DataFrame =
    w.filter(size(col("s")) > 1)
      .select(col("n"),
        explode(transform(sequence(lit(1), size(col("s")) - 1),
          i => struct(element_at(col("s"), i).as("l"),
            element_at(col("s"), i + 1).as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("n")).as("c"))

  /** Apply ONE merge (l, r — columns from the broadcast argmax row) to a
    * symbol array: the greedy leftmost-first non-overlapping walk as a
    * higher-order fold with (done, pending) state. A merged symbol never
    * re-pairs with the following symbol in the same pass (the Sennrich
    * scan: i jumps past the merged pair).
    */
  private def applyMerge(s: Column, l: Column, r: Column): Column = {
    val init = struct(
      array().cast("array<string>").as("done"), lit("").as("pending"))
    aggregate(s, init,
      (acc, x) =>
        when(acc.getField("pending") === "",
          struct(acc.getField("done").as("done"), x.as("pending")))
        .when(acc.getField("pending") === l && x === r,
          struct(concat(acc.getField("done"), array(concat(l, r))).as("done"),
            lit("").as("pending")))
        .otherwise(
          struct(concat(acc.getField("done"), array(acc.getField("pending")))
            .as("done"), x.as("pending"))),
      acc =>
        when(acc.getField("pending") === "", acc.getField("done"))
          .otherwise(concat(acc.getField("done"),
            array(acc.getField("pending")))))
  }

  /** Train `steps` merges. Returns (merges, vocab): `merges` = (step, l, r,
    * merged, c) — the learned merge table, one row per round; `vocab` =
    * (word, n, s) with the final symbol segmentation of every corpus word.
    */
  def train(docs: DataFrame, steps: Int): (DataFrame, DataFrame) =
    trainFromCounts(wordCounts(docs), steps)

  /** Merge an ingest batch into a maintained word-count table by pure
    * count addition: append(wc, batch) is ROW-IDENTICAL to
    * wordCounts(old ∪ batch) — the E66/E103 append mold applied to the
    * tokenizer's ONE corpus-sized input. The merge table itself cannot be
    * appended (a new most-frequent pair can reorder every later round —
    * retraining over the count table is inherent to BPE), but the count
    * table CAN, and retraining from it never re-explodes corpus text:
    * `q_bpe_append_train` hash-proves append → retrain ≡ train-from-
    * scratch end to end.
    */
  def appendWordCounts(wc: DataFrame, batch: DataFrame): DataFrame =
    wc.unionByName(wordCounts(batch))
      .groupBy("word").agg(sum("n").as("n"))

  /** [[train]] from an already-aggregated word-count table (the persisted
    * `wordcounts` component, or [[appendWordCounts]] output): the merge
    * rounds only ever touch this table, so training cost after the one
    * corpus explode is a function of VOCABULARY size, not corpus size.
    */
  def trainFromCounts(wc: DataFrame, steps: Int): (DataFrame, DataFrame) = {
    val s = wc.sparkSession
    // Round structure: each round's argmax pair is ONE row; fetching it
    // with a limit(1) collect is the same driver-side data movement the
    // earlier broadcast-crossJoin spelling paid (BroadcastExchange
    // executeCollects to the driver too), and inlining the pair as
    // LITERALS removes the round's second reference to the symbol table
    // (the broadcast subtree) — the reason every round used to need an
    // eager checkpoint. With one reference per round the whole merge
    // chain stays LAZY over the single checkpointed word-count split:
    // round k's TakeOrdered re-applies k−1 per-row merge walks over the
    // vocabulary-scale table (Σk ≈ steps²/2 cheap HOF passes — the
    // corpus-sized explode behind `wc` is paid exactly once, in the
    // checkpoint), and the per-round job count drops from two (eager
    // checkpoint + broadcast build) to one. The merge table assembles as
    // a local 1-row-per-round relation — identical values. Per-round
    // driver traffic is one (l, r, c) row: metadata-scale at any corpus.
    var w = graft.Ckpt(charSplit(wc))
    val learned =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var k = 1
    var exhausted = false
    while (k <= steps && !exhausted) {
      val best = pairCounts(w)
        .orderBy(col("c").desc, col("l").asc, col("r").asc).limit(1)
        .collect()
      if (best.isEmpty) exhausted = true // every word fully merged: no-op
      else {
        val (l, r, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        learned += ((k, l, r, l + r, c))
        w = w.withColumn("s", applyMerge(col("s"), lit(l), lit(r)))
          .select("word", "n", "s")
      }
      k += 1
    }
    import s.implicits._
    (learned.toSeq.toDF("step", "l", "r", "merged", "c"), w)
  }

  /** The step-ordered merge list as a single 1-row DataFrame column `ms`
    * (array of (step, l, r) structs) — the broadcastable form of the merge
    * table that [[segmentExpr]] folds over, so out-of-vocabulary
    * segmentation works as ONE expression in batch and streaming alike.
    */
  def mergesRow(merges: DataFrame): DataFrame =
    merges.agg(array_sort(collect_list(
      struct(col("step"), col("l"), col("r")))).as("ms"))

  /** Segment ONE word by applying every learned merge in step order — the
    * real BPE apply (char split, then fold the merge list, each step the
    * same greedy leftmost-first walk as training) as a nested higher-order
    * expression. This is the out-of-vocabulary path: a word the trainer
    * never saw still segments exactly as training WOULD have segmented it.
    */
  def segmentExpr(word: Column, ms: Column): Column =
    aggregate(ms, charSplitCol(word),
      (acc, m) => applyMerge(acc, m.getField("l"), m.getField("r")))

  /** Tokenize every document with a trained tokenizer: words join their
    * final segmentation (vocabulary lookup, not per-doc re-segmentation);
    * words NOT in the vocabulary — new documents' novel words — fall back
    * to [[segmentExpr]] over the merge list (the production tokenizer
    * contract; a pure-lookup tokenizer would silently DROP them). Token
    * streams reassemble in word order. Returns (doc_id, n_tokens_bpe,
    * tokens_md5) — the md5 of the '|'-joined token stream proves byte-exact
    * segmentation without shipping it.
    */
  def tokenize(docs: DataFrame, vocab: DataFrame,
      merges: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "word")))
      .filter(length(col("word")) > 0)
      .join(vocab.select("word", "s"), Seq("word"), "left")
      .crossJoin(broadcast(mergesRow(merges)))
      .withColumn("s", coalesce(col("s"), segmentExpr(col("word"), col("ms"))))
      .groupBy("doc_id")
      .agg(sum(size(col("s"))).as("n_tokens_bpe"),
        md5(concat_ws("|",
          flatten(transform(
            array_sort(collect_list(struct(col("pos"), col("s")))),
            t => t.getField("s"))))).as("tokens_md5"))

  // ---- persistence (the tokenizer-artifact lifecycle) ---------------------

  private val store =
    new IndexStore("SPARK_GRAFT_BPE_DIR", "graft-bpe", "documents.parquet")

  /** Artifact directory for one corpus dir (env-relocatable root). */
  def dir(sfDir: String): String = store.dir(sfDir)

  /** Build-if-absent; returns the current VERSION dir. */
  def ensure(spark: org.apache.spark.sql.SparkSession, sfDir: String): String =
    store.ensure(sfDir)(buildInto(spark, sfDir, _))

  /** Unconditional train + persist behind the atomic marker swap. */
  def rebuild(spark: org.apache.spark.sql.SparkSession, sfDir: String): String =
    store.rebuild(sfDir)(buildInto(spark, sfDir, _))

  /** The tokenizer artifact is the (merges, vocab) pair: `merges` is the
    * learned merge table and `vocab` the final per-word segmentation — the
    * precomputed form production tokenizers ship. The vocab component is
    * RE-DERIVED from the PERSISTED merge table (re-applying each stored
    * merge in step order to the corpus word-count table), not written from
    * the training run's lineage — the build-from-persisted-predecessor
    * principle: what `q_bpe_vocab_build` hash-proves is that corpus +
    * stored merges reproduce the segmentation exactly.
    */
  private def buildInto(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, vd: String): Unit = {
    // the ONE corpus explode: the word-count table is persisted as a
    // component so incremental maintenance (appendWordCounts) and merge
    // retraining never re-read corpus text
    wordCounts(T.documents(spark, sfDir))
      .write.mode("overwrite").parquet(s"$vd/wordcounts")
    val pwc = spark.read.parquet(s"$vd/wordcounts")
    val (merges, _) = trainFromCounts(pwc, Steps)
    merges.write.mode("overwrite").parquet(s"$vd/merges")
    // replay the PERSISTED merges over the persisted counts: the merge
    // list is Steps rows of metadata — fold it as literals into one lazy
    // expression chain and write in a single job (the former per-round
    // checkpoint + broadcast spelling paid ~2 jobs per step for rounds
    // that, unlike training, have no data-dependent argmax between them)
    val pm = spark.read.parquet(s"$vd/merges")
      .orderBy("step").select("l", "r").collect()
    val w = pm.foldLeft(charSplit(pwc)) { (acc, m) =>
      acc.withColumn("s",
          applyMerge(col("s"), lit(m.getString(0)), lit(m.getString(1))))
        .select("word", "n", "s")
    }
    w.write.mode("overwrite").parquet(s"$vd/vocab")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(vd, "_meta"),
      s"steps=$Steps\ntokens=whitespace-lower\n")
  }

  /** Persisted merge table (step, l, r, merged, c); builds if absent. */
  def merges(s: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame =
    s.read.parquet(ensure(s, sfDir) + "/merges")

  /** Persisted final segmentation (word, n, s); builds if absent. */
  def vocab(s: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame =
    s.read.parquet(ensure(s, sfDir) + "/vocab")

  /** Persisted corpus word-count table (word, n); builds if absent. A
    * version written before this component existed (artifact-schema
    * evolution) triggers one rebuild.
    */
  def wordCountsPersisted(s: org.apache.spark.sql.SparkSession,
      sfDir: String): DataFrame = {
    val vd = ensure(s, sfDir)
    val wc =
      if (new java.io.File(s"$vd/wordcounts").exists()) vd
      else rebuild(s, sfDir)
    s.read.parquet(s"$wc/wordcounts")
  }

  // ---- declared queries ---------------------------------------------------

  /** Fixed merge count for the declared queries (and their oracles). */
  val Steps = 6

  val queries: Map[String, Q] = Map(
    // L7e: the BPE trainer — 6 greedy merges over the corpus word-count
    // table, integer/string arithmetic end to end (oracle re-derives every
    // pair count, argmax, and merge round).
    "q_bpe_train" -> ((s, dir) => train(T.documents(s, dir), Steps)._1),

    // L7f: tokenization against the PERSISTED vocab — the vocabulary-lookup
    // shape; corpus training is NOT re-paid per tokenize job. The oracle
    // replays training AND segmentation from raw text, so a hash match
    // proves the persisted artifact chain (corpus → merges → vocab →
    // token streams) end to end.
    "q_bpe_tokenize" -> ((s, dir) =>
      tokenize(T.documents(s, dir), vocab(s, dir), merges(s, dir))),

    // L7g: unconditional artifact rebuild + a read of the persisted
    // segmentation (the q_pq_build pattern: build cost carried here, and
    // the stored vocab — derived from the stored MERGES, not the training
    // lineage — is hash-proved against DuckDB's from-scratch derivation).
    "q_bpe_vocab_build" -> ((s, dir) => {
      rebuild(s, dir)
      vocab(s, dir).select(col("word"), col("n"),
        concat_ws("|", col("s")).as("seg"))
    }),

    // L7h: incremental tokenizer refresh — the 1/5 batch merged into the
    // 4/5 word-count table by pure count addition, then the merge table
    // RETRAINED from the appended counts ([[appendWordCounts]] →
    // [[trainFromCounts]]; corpus text exploded once per slice, never
    // re-read for training). The oracle is q_bpe_train's full-corpus SQL
    // verbatim: a hash match proves append → retrain ≡ train-from-scratch
    // through every pair count, argmax, and merge round.
    "q_bpe_append_train" -> ((s, dir) => {
      val docs = T.documents(s, dir)
      trainFromCounts(
        appendWordCounts(
          wordCounts(docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)),
          docs.filter(pmod(col("doc_id"), lit(5)) === 0)),
        Steps)._1
    })
  )

  // ---- oracles ------------------------------------------------------------

  /** One merge round as CTEs: pair counts over w{k-1}, the argmax pair
    * b{k}, and the merged vocab w{k}. The greedy leftmost-first walk is a
    * gaps-and-islands rewrite: candidate positions (s[i], s[i+1]) = (l, r)
    * form consecutive streaks only when l = r (runs of one symbol); within
    * a streak the 1st, 3rd, ... candidates merge and each merge consumes
    * its right neighbor — exactly the sequential scan, windowed.
    */
  private def stepSql(k: Int): String = {
    val p = k - 1
    s"""pc$k AS (
       |  SELECT s[i] AS l, s[i + 1] AS r, CAST(SUM(n) AS BIGINT) AS c
       |  FROM (SELECT n, s, unnest(generate_series(1, len(s) - 1)) AS i
       |        FROM w$p WHERE len(s) > 1)
       |  GROUP BY 1, 2),
       |b$k AS (SELECT l, r, c FROM pc$k ORDER BY c DESC, l, r LIMIT 1),
       |m$k AS (
       |  SELECT word, n, i, s[i] AS sym, b.l, b.r,
       |    CASE WHEN i < len(s) AND s[i] = b.l AND s[i + 1] = b.r
       |         THEN 1 ELSE 0 END AS cand
       |  FROM (SELECT word, n, s, unnest(generate_series(1, len(s))) AS i
       |        FROM w$p) CROSS JOIN b$k b),
       |g$k AS (
       |  SELECT *, CASE WHEN cand = 1
       |    THEN i - row_number() OVER (PARTITION BY word, cand ORDER BY i)
       |    ELSE NULL END AS streak
       |  FROM m$k),
       |h$k AS (
       |  SELECT *, CASE WHEN cand = 1
       |    THEN row_number() OVER (PARTITION BY word, streak, cand ORDER BY i)
       |    ELSE 0 END AS srn
       |  FROM g$k),
       |c$k AS (
       |  SELECT word, n, i, sym, l, r,
       |    CASE WHEN cand = 1 AND srn % 2 = 1 THEN 1 ELSE 0 END AS chosen
       |  FROM h$k),
       |d$k AS (
       |  SELECT *, COALESCE(lag(chosen) OVER (PARTITION BY word ORDER BY i), 0)
       |    AS dropped
       |  FROM c$k),
       |w$k AS (
       |  SELECT word, n,
       |    list(CASE WHEN chosen = 1 THEN l || r ELSE sym END ORDER BY i) AS s
       |  FROM d$k WHERE dropped = 0 GROUP BY word, n)""".stripMargin
  }

  private def baseSql: String =
    """wc AS (
      |  SELECT word, CAST(count(*) AS BIGINT) AS n FROM (
      |    SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS word
      |    FROM documents)
      |  WHERE length(word) > 0 GROUP BY 1),
      |w0 AS (
      |  SELECT word, n,
      |    list_transform(generate_series(1, length(word)),
      |      i -> substr(word, i, 1)) AS s
      |  FROM wc)""".stripMargin

  private def chainSql(steps: Int): String =
    s"WITH $baseSql,\n" + (1 to steps).map(stepSql).mkString(",\n")

  /** Apply-only merge round: the same gaps-and-islands greedy walk as
    * [[stepSql]] but consuming the LEARNED pair `b\$k` from the training
    * chain instead of re-computing an argmax, folded over the tokenize
    * corpus's own word table `v\${k-1}` → `v\$k`. This replays
    * [[segmentExpr]] — char split, then each learned merge in step order —
    * so the oracle verifies the out-of-vocabulary fallback path, not just
    * the vocabulary join (for training-corpus words the two coincide).
    */
  private def stepApplySql(k: Int): String = {
    val p = k - 1
    s"""am$k AS (
       |  SELECT word, i, s[i] AS sym, b.l, b.r,
       |    CASE WHEN i < len(s) AND s[i] = b.l AND s[i + 1] = b.r
       |         THEN 1 ELSE 0 END AS cand
       |  FROM (SELECT word, s, unnest(generate_series(1, len(s))) AS i
       |        FROM v$p) CROSS JOIN b$k b),
       |ag$k AS (
       |  SELECT *, CASE WHEN cand = 1
       |    THEN i - row_number() OVER (PARTITION BY word, cand ORDER BY i)
       |    ELSE NULL END AS streak
       |  FROM am$k),
       |ah$k AS (
       |  SELECT *, CASE WHEN cand = 1
       |    THEN row_number() OVER (PARTITION BY word, streak, cand ORDER BY i)
       |    ELSE 0 END AS srn
       |  FROM ag$k),
       |ac$k AS (
       |  SELECT word, i, sym, l, r,
       |    CASE WHEN cand = 1 AND srn % 2 = 1 THEN 1 ELSE 0 END AS chosen
       |  FROM ah$k),
       |ad$k AS (
       |  SELECT *, COALESCE(lag(chosen) OVER (PARTITION BY word ORDER BY i), 0)
       |    AS dropped
       |  FROM ac$k),
       |v$k AS (
       |  SELECT word,
       |    list(CASE WHEN chosen = 1 THEN l || r ELSE sym END ORDER BY i) AS s
       |  FROM ad$k WHERE dropped = 0 GROUP BY word)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_bpe_train" ->
      s"""${chainSql(Steps)}
         |SELECT * FROM (
         |${(1 to Steps).map(k =>
             s"  SELECT CAST($k AS INTEGER) AS step, l, r, l || r AS merged, c FROM b$k")
             .mkString("\n  UNION ALL\n")}
         |) ORDER BY ALL NULLS FIRST""".stripMargin,
    // append → retrain must reproduce full-corpus training exactly, so
    // the oracle is q_bpe_train's SQL verbatim
    "q_bpe_append_train" ->
      s"""${chainSql(Steps)}
         |SELECT * FROM (
         |${(1 to Steps).map(k =>
             s"  SELECT CAST($k AS INTEGER) AS step, l, r, l || r AS merged, c FROM b$k")
             .mkString("\n  UNION ALL\n")}
         |) ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_bpe_vocab_build" ->
      s"""${chainSql(Steps)}
         |SELECT word, n, array_to_string(s, '|') AS seg FROM w$Steps
         |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_bpe_tokenize" ->
      s"""${chainSql(Steps)},
         |dt AS (
         |  SELECT doc_id,
         |    string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
         |  FROM documents),
         |dw0 AS (
         |  SELECT doc_id, unnest(generate_series(1, len(toks))) AS pos,
         |    unnest(toks) AS word
         |  FROM dt),
         |dw AS (SELECT * FROM dw0 WHERE length(word) > 0),
         |v0 AS (
         |  SELECT word,
         |    list_transform(generate_series(1, length(word)),
         |      i -> substr(word, i, 1)) AS s
         |  FROM (SELECT DISTINCT word FROM dw)),
         |${(1 to Steps).map(stepApplySql).mkString(",\n")},
         |j AS (
         |  SELECT d.doc_id, d.pos, v.s
         |  FROM dw d JOIN v$Steps v USING (word)),
         |f AS (
         |  SELECT doc_id, CAST(SUM(len(s)) AS BIGINT) AS n_tokens_bpe,
         |    md5(string_agg(array_to_string(s, '|'), '|' ORDER BY pos)) AS tokens_md5
         |  FROM j GROUP BY 1)
         |SELECT doc_id, n_tokens_bpe, tokens_md5 FROM f
         |ORDER BY ALL NULLS FIRST""".stripMargin
  )
}

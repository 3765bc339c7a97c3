package graft.pipeline

import graft.{Q, Tables => T}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed multinomial Naive Bayes classifier (train + predict) — the
  * supervised-filtering stage of an LLM data pipeline (fastText/CLD-style
  * language ID, quality triage) as pure DataFrame algebra. Training is
  * counting: per-(label, word) occurrence counts, per-label totals, the
  * global vocabulary size, and document priors — four narrow aggregations
  * over ONE explode of the train corpus, nothing iterative. Prediction is
  * the vocabulary-lookup shape: per-doc word counts equi-join the
  * aggregated model on (label, word) — the model is vocabulary-sized, so
  * at 100 TB the join shuffles model-vs-doc-words, never corpus text; the
  * label list is a broadcast constant.
  *
  * Determinism (the hash-match contract): all counts are exact BIGINTs and
  * every log-probability is rounded to integer micro-units BEFORE any
  * summation — round(ln(x)·1e6) per (label, word), the BM25/lmScore recipe
  * — so per-doc scores are order-independent integer sums and the argmax
  * tie-break is total ((score_u DESC, label ASC)). Laplace α=1 smoothing:
  * score_u(l,w) = round(ln((c+1)/(tot_l+V))·1e6); every occurrence of a
  * word with no (l,w) count — whether the word is in another label's
  * vocabulary or entirely unseen — contributes the same
  * default_u(l) = round(ln(1/(tot_l+V))·1e6), a deliberate simplification
  * (standard NB either drops unseen words or smooths them identically)
  * that both engines replay exactly.
  */
object NaiveBayes {

  /** A trained model: `model` = (lang, word, c, score_u) — the smoothed
    * per-(label, word) log-likelihood table; `labels` = one row per label
    * with (lang, tot, v, prior_u, default_u).
    */
  case class Model(model: DataFrame, labels: DataFrame)

  private def microLn(x: Column): Column =
    round(log(x) * lit(1e6), 0).cast("long")

  /** Build the full model from its two count tables — `wc` = (lang, word,
    * c) occurrence counts, `priors` = (lang, nd) document counts. Every
    * scoring constant (tot, V, N, prior_u, default_u, score_u) is a pure
    * function of these counts, which is what makes the model mergeable:
    * train-from-scratch and count-append both end here.
    */
  private def modelFromCounts(wc: DataFrame, priors: DataFrame): Model = {
    val tot = wc.groupBy("lang").agg(sum("c").as("tot"))
    val v = wc.agg(countDistinct(col("word")).as("v"))
    val n = priors.agg(sum("nd").as("n"))
    val labels = priors.crossJoin(broadcast(n)).join(tot, Seq("lang"))
      .crossJoin(broadcast(v))
      .select(col("lang"), col("tot"), col("v"),
        microLn(col("nd").cast("double") / col("n").cast("double"))
          .as("prior_u"),
        microLn(lit(1.0) / (col("tot").cast("double") + col("v").cast("double")))
          .as("default_u"))
    val model = wc.join(tot, Seq("lang")).crossJoin(broadcast(v))
      .select(col("lang"), col("word"), col("c"),
        microLn((col("c").cast("double") + lit(1.0)) /
          (col("tot").cast("double") + col("v").cast("double")))
          .as("score_u"))
    Model(model, labels)
  }

  /** Per-(label, word) occurrence counts of a labeled corpus. */
  private def occurrenceCounts(docs: DataFrame, labelCol: String): DataFrame =
    docs
      .select(col(labelCol).as("lang"),
        explode(TextAnalysis.tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("lang", "word").agg(count(lit(1)).as("c"))

  /** Train on labeled documents (labelCol, text). See object doc for the
    * exact arithmetic.
    */
  def train(docs: DataFrame, labelCol: String = "lang"): Model =
    modelFromCounts(occurrenceCounts(docs, labelCol),
      docs.groupBy(col(labelCol).as("lang")).agg(count(lit(1)).as("nd")))

  /** Merge a labeled batch into the PERSISTED model by pure count
    * addition (the E66/E103 append mold applied to the classifier):
    * merged (lang, word) counts = stored `c` + the batch's counts, priors
    * add document counts, and every scoring constant re-derives from the
    * merged counts with the identical micro-unit arithmetic — so
    * append(old, batch) is ROW-IDENTICAL to train(old ∪ batch)
    * (`q_nb_model_append` hash-proves the merged model table; the unit
    * asserts the labels table too). Cost ∝ |vocabulary| + |batch| — the
    * training corpus is never re-read, re-exploded, or re-counted.
    */
  def appendedModel(s: org.apache.spark.sql.SparkSession, sfDir: String,
      batch: DataFrame, labelCol: String = "lang"): Model = {
    val vd = ensure(s, sfDir)
    val wc = s.read.parquet(s"$vd/model").select("lang", "word", "c")
      .unionByName(occurrenceCounts(batch, labelCol))
      .groupBy("lang", "word").agg(sum("c").as("c"))
    val priors = s.read.parquet(s"$vd/priors")
      .unionByName(
        batch.groupBy(col(labelCol).as("lang")).agg(count(lit(1)).as("nd")))
      .groupBy("lang").agg(sum("nd").as("nd"))
    modelFromCounts(wc, priors)
  }

  /** Predict the label of each document with ≥1 token: argmax over labels
    * of prior_u + Σ_w cnt·score_u(l,w) + (unmatched occurrences)·default_u.
    * Returns (doc_id, lang_pred, score_u).
    */
  def predict(docs: DataFrame, m: Model): DataFrame = {
    val dw = docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("doc_id", "word").agg(count(lit(1)).as("cnt"))
    val nw = dw.groupBy("doc_id").agg(sum("cnt").as("nw"))
    val cand = dw.crossJoin(broadcast(m.labels.select("lang")))
      .join(m.model.select("lang", "word", "score_u"), Seq("lang", "word"),
        "left")
      .groupBy("doc_id", "lang")
      .agg(
        sum(when(col("score_u").isNotNull, col("cnt") * col("score_u"))
          .otherwise(lit(0L))).as("matched_u"),
        sum(when(col("score_u").isNotNull, col("cnt")).otherwise(lit(0L)))
          .as("matched_cnt"))
    val scored = cand
      .join(broadcast(m.labels.select("lang", "prior_u", "default_u")),
        Seq("lang"))
      .join(nw, Seq("doc_id"))
      .withColumn("s_u",
        col("prior_u") + col("matched_u") +
          (col("nw") - col("matched_cnt")) * col("default_u"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("s_u").desc, col("lang").asc)
    scored.withColumn("__rk", row_number().over(w)).filter(col("__rk") === 1)
      .select(col("doc_id"), col("lang").as("lang_pred"),
        col("s_u").as("score_u"))
  }

  // ---- persistence (the classifier-artifact lifecycle) --------------------

  private val store =
    new IndexStore("SPARK_GRAFT_NB_DIR", "graft-nb-model", "documents.parquet")

  /** Artifact directory for one corpus dir (env-relocatable root). */
  def dir(sfDir: String): String = store.dir(sfDir)

  /** Build-if-absent; returns the current VERSION dir. */
  def ensure(spark: org.apache.spark.sql.SparkSession, sfDir: String): String =
    store.ensure(sfDir)(buildInto(spark, sfDir, _))

  /** Unconditional train + persist behind the atomic marker swap. */
  def rebuild(spark: org.apache.spark.sql.SparkSession, sfDir: String): String =
    store.rebuild(sfDir)(buildInto(spark, sfDir, _))

  /** Persisted components: `model` (lang, word, c, score_u) and the tiny
    * `priors` (lang, nd). The per-label table ([[Model.labels]]) is NOT
    * persisted — [[persistedModel]] re-derives it from the persisted pair
    * (tot = Σc and V = #distinct words from `model`, N = Σnd from
    * `priors`), the build-from-persisted-predecessor principle: what
    * prediction joins is provably a function of what was written.
    */
  private def buildInto(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, vd: String): Unit = {
    val d = trainDocs(T.documents(spark, sfDir))
    train(d).model.write.mode("overwrite").parquet(s"$vd/model")
    d.groupBy(col("lang")).agg(count(lit(1)).as("nd"))
      .write.mode("overwrite").parquet(s"$vd/priors")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(vd, "_meta"),
      "smoothing=laplace1\nsplit=mod5\nunits=micro-ln\n")
  }

  /** The persisted classifier, labels re-derived from the stored
    * components with the identical micro-unit arithmetic ([[train]]).
    */
  def persistedModel(s: org.apache.spark.sql.SparkSession,
      sfDir: String): Model = {
    val vd = ensure(s, sfDir)
    val model = s.read.parquet(s"$vd/model")
    val priors = s.read.parquet(s"$vd/priors")
    val tot = model.groupBy("lang").agg(sum("c").as("tot"))
    val v = model.agg(countDistinct(col("word")).as("v"))
    val n = priors.agg(sum("nd").as("n"))
    val labels = priors.crossJoin(broadcast(n)).join(tot, Seq("lang"))
      .crossJoin(broadcast(v))
      .select(col("lang"), col("tot"), col("v"),
        microLn(col("nd").cast("double") / col("n").cast("double"))
          .as("prior_u"),
        microLn(lit(1.0) / (col("tot").cast("double") + col("v").cast("double")))
          .as("default_u"))
    Model(model, labels)
  }

  // ---- declared queries ---------------------------------------------------

  private def trainDocs(d: DataFrame): DataFrame =
    d.filter(pmod(col("doc_id"), lit(5)) =!= 0)
  private def testDocs(d: DataFrame): DataFrame =
    d.filter(pmod(col("doc_id"), lit(5)) === 0)

  val queries: Map[String, Q] = Map(
    // L8a: the trained model table — per-(label, word) counts and smoothed
    // integer micro-unit log-likelihoods, 4/5 train split (oracle re-derives
    // every count and score).
    "q_nb_train" -> ((s, dir) =>
      train(trainDocs(T.documents(s, dir))).model),

    // L8b: held-out prediction — the 1/5 test split classified by the
    // PERSISTED model (training is not re-paid per classify job; the
    // production train-once shape). Leak-free by construction; output
    // carries the true label, and the oracle re-derives training from raw
    // text, so a hash match proves the persisted artifact chain AND the
    // argmax.
    "q_nb_predict" -> ((s, dir) => {
      val d = T.documents(s, dir)
      predict(testDocs(d), persistedModel(s, dir))
        .join(d.select(col("doc_id"), col("lang").as("lang_true")),
          Seq("doc_id"))
        .select(col("doc_id"), col("lang_true"), col("lang_pred"),
          col("score_u"))
    }),

    // L8c: the confusion matrix of L8b — the classifier-evaluation rollup.
    "q_nb_confusion" -> ((s, dir) => {
      val d = T.documents(s, dir)
      predict(testDocs(d), persistedModel(s, dir))
        .join(d.select(col("doc_id"), col("lang").as("lang_true")),
          Seq("doc_id"))
        .groupBy("lang_true", "lang_pred").agg(count(lit(1)).as("n_docs"))
    }),

    // L8e: the classifier feeding the curation sampler — held-out docs are
    // classified by the PERSISTED model, then stratified-hash-sampled on
    // the PREDICTED label (en 80%, rest 20%; the reproducible md5-bucket
    // arithmetic of q_sample_stratified). The model-driven version of
    // quality/language-weighted corpus composition; the oracle replays
    // training, prediction, bucketing, and the rollup in one statement.
    "q_pipeline_classify_sample" -> ((s, dir) => {
      val d = T.documents(s, dir)
      val pred = predict(testDocs(d), persistedModel(s, dir))
      Sampling.stratifiedHashSample(pred, col("doc_id"), col("lang_pred"),
        Map("en" -> 80), otherPct = 20)
        .groupBy("lang_pred").agg(count(lit(1)).as("n_kept"),
          sum(col("score_u")).as("score_sum_u"))
    }),

    // L8d: unconditional artifact rebuild + the per-label table DERIVED
    // from the persisted components (the q_pq_build pattern; the oracle
    // re-derives priors/totals/vocabulary from raw text, hash-proving the
    // stored model sufficient to reconstruct every scoring constant).
    "q_nb_model_build" -> ((s, dir) => {
      rebuild(s, dir)
      persistedModel(s, dir).labels
    }),

    // L8f: incremental model refresh — the 1/5 held-out batch merged into
    // the PERSISTED 4/5 model by pure count addition ([[appendedModel]]).
    // The oracle is the training SQL over old ∪ batch (= the full corpus)
    // verbatim, so a hash match proves append(old, batch) ≡
    // train(old ∪ batch) down to every smoothed micro-unit score — the
    // daily-refresh shape: classifier models stay current without
    // re-reading the training corpus.
    "q_nb_model_append" -> ((s, dir) =>
      appendedModel(s, dir, testDocs(T.documents(s, dir))).model)
  )

  // ---- oracles ------------------------------------------------------------

  /** Training CTEs ending at `model` + `labs` (both splits' tokenization
    * shared); DuckDB replays the identical cast/round/ln sequence.
    * `where` selects the training slice — the 4/5 split for the trained
    * rows, empty (full corpus) for the append row, which makes
    * `q_nb_model_append`'s oracle the training SQL over old ∪ batch
    * verbatim.
    */
  private def nbCtes: String = nbCtesFor("WHERE doc_id % 5 <> 0")

  private def nbCtesFor(where: String): String =
    s"""ntr AS (
      |  SELECT lang,
      |    string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
      |  FROM documents $where),
      |ntrw AS (
      |  SELECT lang, word FROM (SELECT lang, unnest(toks) AS word FROM ntr)
      |  WHERE length(word) > 0),
      |nwc AS (
      |  SELECT lang, word, CAST(count(*) AS BIGINT) AS c
      |  FROM ntrw GROUP BY 1, 2),
      |ntot AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS tot FROM nwc GROUP BY 1),
      |nv AS (SELECT CAST(count(DISTINCT word) AS BIGINT) AS v FROM ntrw),
      |npri AS (
      |  SELECT lang, CAST(count(*) AS BIGINT) AS nd
      |  FROM documents $where GROUP BY 1),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n
      |       FROM documents $where),
      |labs AS (
      |  SELECT p.lang, t.tot, nv.v,
      |    CAST(round(ln(CAST(p.nd AS DOUBLE) / CAST(nn.n AS DOUBLE)) * 1000000, 0) AS BIGINT) AS prior_u,
      |    CAST(round(ln(1.0 / (CAST(t.tot AS DOUBLE) + CAST(nv.v AS DOUBLE))) * 1000000, 0) AS BIGINT) AS default_u
      |  FROM npri p JOIN ntot t USING (lang) CROSS JOIN nv CROSS JOIN nn),
      |model AS (
      |  SELECT w.lang, w.word, w.c,
      |    CAST(round(ln((CAST(w.c AS DOUBLE) + 1.0) /
      |      (CAST(t.tot AS DOUBLE) + CAST(nv.v AS DOUBLE))) * 1000000, 0) AS BIGINT) AS score_u
      |  FROM nwc w JOIN ntot t USING (lang) CROSS JOIN nv)""".stripMargin

  /** Prediction CTEs over the 1/5 test split, ending at `npred` =
    * (doc_id, lang_true, lang_pred, score_u).
    */
  private def nbPredictCtes: String =
    s"""$nbCtes,
       |nte AS (
       |  SELECT doc_id, lang AS lang_true,
       |    string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
       |  FROM documents WHERE doc_id % 5 = 0),
       |ndw AS (
       |  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS cnt
       |  FROM (SELECT doc_id, unnest(toks) AS word FROM nte)
       |  WHERE length(word) > 0 GROUP BY 1, 2),
       |nnw AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS nw FROM ndw GROUP BY 1),
       |ncand AS (
       |  SELECT d.doc_id, l.lang,
       |    CAST(SUM(CASE WHEN m.score_u IS NOT NULL THEN d.cnt * m.score_u ELSE 0 END) AS BIGINT) AS matched_u,
       |    CAST(SUM(CASE WHEN m.score_u IS NOT NULL THEN d.cnt ELSE 0 END) AS BIGINT) AS matched_cnt
       |  FROM ndw d CROSS JOIN (SELECT lang FROM labs) l
       |  LEFT JOIN model m ON m.lang = l.lang AND m.word = d.word
       |  GROUP BY 1, 2),
       |nscored AS (
       |  SELECT c.doc_id, c.lang,
       |    l.prior_u + c.matched_u + (w.nw - c.matched_cnt) * l.default_u AS s_u
       |  FROM ncand c JOIN labs l USING (lang) JOIN nnw w USING (doc_id)),
       |npred AS (
       |  SELECT s.doc_id, t.lang_true, s.lang AS lang_pred, s.s_u AS score_u
       |  FROM (SELECT doc_id, lang, s_u,
       |          row_number() OVER (PARTITION BY doc_id
       |            ORDER BY s_u DESC, lang) AS rk
       |        FROM nscored) s
       |  JOIN (SELECT doc_id, lang_true FROM nte) t USING (doc_id)
       |  WHERE s.rk = 1)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_nb_train" ->
      s"""WITH $nbCtes
         |SELECT lang, word, c, score_u FROM model
         |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_nb_predict" ->
      s"""WITH $nbPredictCtes
         |SELECT doc_id, lang_true, lang_pred, score_u FROM npred
         |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_nb_confusion" ->
      s"""WITH $nbPredictCtes
         |SELECT lang_true, lang_pred, CAST(count(*) AS BIGINT) AS n_docs
         |FROM npred GROUP BY 1, 2
         |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_nb_model_build" ->
      s"""WITH $nbCtes
         |SELECT lang, tot, v, prior_u, default_u FROM labs
         |ORDER BY ALL NULLS FIRST""".stripMargin,
    // the training SQL over old ∪ batch = the FULL corpus (empty WHERE):
    // a hash match proves append(old, batch) ≡ train(old ∪ batch)
    "q_nb_model_append" ->
      s"""WITH ${nbCtesFor("")}
         |SELECT lang, word, c, score_u FROM model
         |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_pipeline_classify_sample" ->
      s"""WITH $nbPredictCtes
         |SELECT lang_pred, CAST(count(*) AS BIGINT) AS n_kept,
         |  CAST(SUM(score_u) AS BIGINT) AS score_sum_u
         |FROM npred
         |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100
         |      < (CASE WHEN lang_pred = 'en' THEN 80 ELSE 20 END)
         |GROUP BY 1 ORDER BY ALL NULLS FIRST""".stripMargin
  )
}

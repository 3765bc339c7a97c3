package graft.pipeline

import graft.{Q, Tables => T}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY.md §2.10 L3 + north-star
  * ANN): exact cosine top-k as the correctness baseline, a random-hyperplane
  * LSH-bucketed variant and an IVF path (deterministic k-means quantizer,
  * broadcast assignment, nprobe cell search) as the scale paths, plus
  * classifier-based quality scoring over the same vector machinery.
  *
  * Scale design: brute force is O(|Q|·|N|) — fine for a handful of probe
  * queries, hopeless at 100 TB. The LSH path buckets vectors by the sign
  * pattern of pseudo-random hyperplane projections (fixed xxhash64-derived
  * components ⇒ deterministic, no stored model): `tables` independent hash
  * tables of `planes` sign bits each, plus 1-bit-flip multi-probe on the
  * query side, so recall doesn't cliff off a single unlucky bucket. One
  * narrow equi-join on (table, bucket), candidate sets ~tables·(planes+1)·
  * n/2^planes, exact rerank on candidates only. All vector math is native
  * Catalyst expressions ([[graft.functions.CosineSim]] /
  * [[graft.functions.CosineLshBucket]]) — one compiled loop per row, no
  * interpreted per-element lambdas, no UDFs.
  */
object Similarity {
  import graft.functions.VectorOps.{cosineLshBucket, cosineSim}

  /** Exact cosine similarity of two float-array columns (double math). */
  def cosine(a: Column, b: Column): Column = cosineSim(a, b)

  /** LSH bucket id of a vector: sign bits of `planes` hyperplane projections
    * (table 0 of the multi-table scheme).
    */
  def lshBucket(vec: Column, planes: Int = 8): Column =
    cosineLshBucket(vec, planes)

  /** Exact top-k neighbors for each row of `queries` (qid, qvec) among
    * `corpus` (id, vec), ranked by cosine rounded to 6 (deterministic).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("qid")
      .orderBy(col("sim").desc, col("vec_id"))
    queries.crossJoin(corpus)
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("sim", round(cosine(col("qvec"), col("vec")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "vec_id", "sim")
  }

  /** ANN top-k: candidates restricted to the query's LSH buckets, exact
    * cosine rerank on candidates only. One equi-join on (table, bucket)
    * instead of a cross join — the 100 TB path.
    *
    * Recall comes from two standard knobs instead of one giant bucket:
    * `tables` independent hyperplane sets (a true neighbor only needs to
    * collide in ONE of them), and 1-bit-flip multi-probe on the query side
    * (`multiProbe`), which rescues neighbors that disagree on exactly one
    * plane. The corpus is indexed `tables`× (the write-side cost of any
    * multi-table ANN index); only the small query side fans out by the
    * probe count. Candidate pairs found by several tables are collapsed by
    * `dropDuplicates(qid, vec_id)` before the rerank pays for cosine.
    */
  def annTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      planes: Int = 8, tables: Int = 4, multiProbe: Boolean = true): DataFrame = {
    // (table, bucket) packed into one long join key: bucket < 2^planes.
    def key(t: Int, b: Column): Column = lit(t.toLong * (1L << planes)) + b
    val cb = corpus.withColumn("tb", explode(array(
      (0 until tables).map(t => key(t, cosineLshBucket(col("vec"), planes, t))): _*)))
    val probeKeys = (0 until tables).flatMap { t =>
      val b0 = cosineLshBucket(col("qvec"), planes, t)
      val base = key(t, b0)
      if (multiProbe)
        base +: (0 until planes).map(bit => key(t, b0.bitwiseXOR(lit(1L << bit))))
      else Seq(base)
    }
    val qb = queries.withColumn("tb", explode(array(probeKeys: _*)))
    val w = Window.partitionBy("qid")
      .orderBy(col("sim").desc, col("vec_id"))
    qb.join(cb, Seq("tb"))
      .filter(col("qid") =!= col("vec_id"))
      .dropDuplicates("qid", "vec_id")
      .withColumn("sim", round(cosineSim(col("qvec"), col("vec")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "vec_id", "sim")
  }

  /** Per-label elementwise centroid of an embedding column, computed from
    * EXACT integer sums (micros-longs) so the result is order-independent —
    * the coarse-quantizer build step of an IVF index (labels stand in for
    * k-means cells; the structure is identical). One posexplode shuffle on
    * (label, dim); output is |labels|·dims rows.
    */
  /** Exact per-(label, dim) integer moments: Σ micro-units + count. */
  private def centroidMoments(e: DataFrame): DataFrame =
    e.select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg(sum(floor(col("v").cast("double") * 1e6).cast("long")).as("sv"),
        count(lit(1)).as("n"))

  def labelCentroids(e: DataFrame): DataFrame =
    centroidMoments(e).select(col("label"), col("dim"),
      ((col("sv").cast("double") / col("n").cast("double")) / 1e6).as("c"))

  /** Centroids as one vector row per label: (clabel, cvec). */
  def centroidVectors(e: DataFrame): DataFrame =
    labelCentroids(e)
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("c")))),
        x => x.getField("c")).as("cvec"))
      .select(col("label").as("clabel"), col("cvec"))

  /** Nearest-centroid assignment of a (vec_id, vec) corpus against a small
    * (cell, cvec) centroid set: centroids broadcast, per-row argmax with a
    * deterministic (sim, cell) tie-break — no shuffle of the corpus.
    */
  def assignCells(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id")
      .orderBy(col("sim").desc, col("cell"))
    corpus.crossJoin(broadcast(centroids))
      .withColumn("sim", round(cosineSim(col("vec"), col("cvec")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("vec_id", "vec", "cell", "sim")
  }

  /** Deterministic k-means coarse quantizer for IVF: cells initialized by
    * vec_id hash (no RNG — same result at any parallelism), then `iters`
    * Lloyd rounds of cosine-argmax assignment + exact-integer-mean update.
    * Fully lazy — the rounds compose into one plan, each round costing one
    * posexplode agg (narrow (cell, dim) keys) and one broadcast argmax; no
    * driver-side loop state. Replaces the label column as the quantizer
    * when no natural partitioning exists.
    */
  def kmeansQuantizer(corpus: DataFrame, k: Int, iters: Int = 2): DataFrame = {
    def centroidsOf(assigned: DataFrame): DataFrame =
      centroidVectors(assigned.select(col("cell").as("label"),
        col("vec").as("embedding")))
        .select(col("clabel").as("cell"), col("cvec"))
    var assigned = corpus.select(col("vec_id"), col("vec"),
      pmod(xxhash64(col("vec_id")), lit(k.toLong)).cast("int").as("cell"))
    var centroids = centroidsOf(assigned)
    var i = 0
    while (i < iters) {
      assigned = assignCells(corpus, centroids).drop("sim")
      centroids = centroidsOf(assigned)
      i += 1
    }
    centroids
  }

  /** IVF top-k: the caller supplies a quantizer (`centroids`: cell → cvec)
    * and a corpus already assigned to cells; each query probes its `nprobe`
    * nearest cells, candidates come from one equi-join on cell, exact rerank
    * on candidates only. Centroids broadcast (they are tiny by construction);
    * the corpus shuffles once on cell — the standard IVF scale shape.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      k: Int, nprobe: Int = 3): DataFrame = {
    val cw = Window.partitionBy("qid")
      .orderBy(col("csim").desc, col("clabel"))
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("csim", round(cosineSim(col("qvec"), col("cvec")), 6))
      .withColumn("crn", row_number().over(cw))
      .filter(col("crn") <= nprobe)
      .select(col("qid"), col("qvec"), col("clabel").as("cell"))
    val w = Window.partitionBy("qid")
      .orderBy(col("sim").desc, col("vec_id"))
    probes.join(corpus, Seq("cell"))
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("sim", round(cosineSim(col("qvec"), col("vec")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "vec_id", "sim")
  }

  /** Deterministic pseudo-random classifier weight for dimension `d`:
    * uniform in [-0.5, 0.5) from md5("w" + d) — reproducible in any engine
    * (stands in for trained weights; the pipeline shape is the point).
    */
  private[pipeline] def classifierWeight(d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(("w" + d).getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex, 16) % 1000L).toDouble / 1000.0 - 0.5
  }

  val queries: Map[String, Q] = Map(
    // Classifier-based quality scoring — the fastText-style filter of a
    // training pipeline: broadcast weight vector (a literal here; tiny
    // either way), one native dot product per row, sigmoid, threshold.
    // No shuffle at all until the tiny final count.
    "q_sim_classify" -> ((s, dir) => {
      import graft.functions.VectorOps.dotProduct
      val w = typedLit((0 until 64).map(classifierWeight))
      val score = round(lit(1.0) /
        (lit(1.0) + exp(-dotProduct(col("embedding"), w))), 6)
      T.embeddings(s, dir)
        .select(col("vec_id"), score.as("score"))
        .withColumn("keep", (col("score") >= 0.5).cast("int"))
    }),

    // IVF quantizer build: per-label centroids from exact integer sums
    // (oracle-checked; one narrow shuffle, deterministic at any parallelism).
    // The 6-decimal rounding happens in INTEGER micro-units (half away from
    // zero on abs values) — sv/n lands on exact .5 micro ties constantly,
    // where double round() diverges between engines (Spark rounds the
    // shortest decimal rendering, DuckDB the binary value).
    "q_sim_centroids" -> ((s, dir) => {
      val r = expr("(2 * abs(sv) + n) DIV (2 * n)")
      centroidMoments(T.embeddings(s, dir)).select(
        col("label"), col("dim"),
        (when(col("sv") >= 0, r).otherwise(-r).cast("double") / 1e6).as("c"))
    }),

    // IVF assignment: every vector → nearest label centroid (broadcast 10
    // centroids, per-row argmax, one small final agg — no n² anywhere).
    // Output is the label×assigned confusion matrix, oracle-checked.
    "q_sim_ivf_assign" -> ((s, dir) => {
      val e = T.embeddings(s, dir)
      val cent = centroidVectors(e)
      val w = Window.partitionBy("vec_id")
        .orderBy(col("sim").desc, col("clabel"))
      e.crossJoin(broadcast(cent))
        .withColumn("sim", round(cosineSim(col("embedding"), col("cvec")), 6))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy("label", "clabel").agg(count(lit(1)).as("n"))
        .select(col("label"), col("clabel").as("assigned"), col("n"))
    }),

    // L3: exact cosine top-5 for 5 probe vectors (oracle-checked).
    "q_sim_topk" -> ((s, dir) => {
      val e = T.embeddings(s, dir)
      val probes = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val corpus = e.select(col("vec_id"), col("embedding").as("vec"))
      bruteForceTopK(probes, corpus, 5)
    }),

    // L3b (no oracle — verified against brute force in SimilaritySpec):
    // LSH-bucketed ANN with exact rerank.
    "q_sim_ann" -> ((s, dir) => {
      val e = T.embeddings(s, dir)
      val probes = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val corpus = e.select(col("vec_id"), col("embedding").as("vec"))
      annTopK(probes, corpus, 5)
    }),

    // Embedding-cosine near-duplicate pairs among same-label vectors
    // (bounded candidate set → oracle-checked).
    "q_sim_neardup" -> ((s, dir) => {
      val e = T.embeddings(s, dir).filter(col("vec_id") < 200)
      val x = e.select(col("label"), col("vec_id").as("a"), col("embedding").as("va"))
      val y = e.select(col("label"), col("vec_id").as("b"), col("embedding").as("vb"))
      x.join(y, Seq("label")).filter(col("a") < col("b"))
        .withColumn("sim", round(cosine(col("va"), col("vb")), 6))
        .filter(col("sim") >= 0.8)
        .select("label", "a", "b", "sim")
    }),

    // L6: doc↔embedding integrity join (ids align 1:1).
    "q_doc_join" -> ((s, dir) => {
      val d = T.documents(s, dir)
      val e = T.embeddings(s, dir)
      d.join(e, d("doc_id") === e("vec_id"), "full")
        .groupBy(e("label"))
        .agg(count(d("doc_id")).as("n_docs"), count(e("vec_id")).as("n_vecs"),
          countDistinct(d("lang")).as("n_langs"))
    })
  )

  private val cosineSql =
    """list_sum(list_transform(generate_series(1, 64),
      |    i -> CAST(a.qvec[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) /
      |  (sqrt(list_sum(list_transform(generate_series(1, 64),
      |    i -> CAST(a.qvec[i] AS DOUBLE) * CAST(a.qvec[i] AS DOUBLE)))) *
      |   sqrt(list_sum(list_transform(generate_series(1, 64),
      |    i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))))""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_sim_classify" ->
      """WITH scored AS (
        |  SELECT vec_id,
        |    round(1.0 / (1.0 + exp(-list_sum(list_transform(generate_series(1, 64),
        |      d -> CAST(embedding[d] AS DOUBLE) *
        |        ((CAST(('0x' || substr(md5('w' || CAST(d - 1 AS VARCHAR)), 1, 8)) AS BIGINT) % 1000)
        |          / 1000.0 - 0.5))))), 6) AS score
        |  FROM embeddings)
        |SELECT vec_id, score,
        |  CAST(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END AS INTEGER) AS keep
        |FROM scored ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_sim_centroids" ->
      """WITH ex AS (
        |  SELECT label, unnest(embedding) AS v, unnest(generate_series(1, 64)) AS dim
        |  FROM embeddings),
        |m AS (
        |  SELECT label, dim,
        |    CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) AS sv,
        |    count(*) AS n
        |  FROM ex GROUP BY 1, 2),
        |r AS (SELECT *, (2 * abs(sv) + n) // (2 * n) AS rr FROM m)
        |SELECT label, CAST(dim - 1 AS INTEGER) AS dim,
        |  CAST(CASE WHEN sv >= 0 THEN rr ELSE -rr END AS DOUBLE) / 1000000 AS c
        |FROM r ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_sim_ivf_assign" ->
      """WITH ex AS (
        |  SELECT label, unnest(embedding) AS v, unnest(generate_series(1, 64)) AS dim
        |  FROM embeddings),
        |cent AS (
        |  SELECT label AS clabel, list(c ORDER BY dim) AS cvec FROM (
        |    SELECT label, dim,
        |      (CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS DOUBLE) /
        |       CAST(count(*) AS DOUBLE)) / 1000000 AS c
        |    FROM ex GROUP BY 1, 2) GROUP BY 1),
        |scored AS (
        |  SELECT e.vec_id, e.label, c.clabel,
        |    round(list_sum(list_transform(generate_series(1, 64),
        |        i -> CAST(e.embedding[i] AS DOUBLE) * c.cvec[i])) /
        |      (sqrt(list_sum(list_transform(generate_series(1, 64),
        |        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))) *
        |       sqrt(list_sum(list_transform(generate_series(1, 64),
        |        i -> c.cvec[i] * c.cvec[i])))), 6) AS sim
        |  FROM embeddings e CROSS JOIN cent c),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, clabel) AS rn
        |  FROM scored)
        |SELECT label, clabel AS assigned, count(*) AS n
        |FROM ranked WHERE rn = 1 GROUP BY 1, 2 ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_sim_topk" ->
      s"""WITH probes AS (
         |  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 5),
         |sims AS (
         |  SELECT a.qid, b.vec_id, round($cosineSql, 6) AS sim
         |  FROM probes a CROSS JOIN embeddings b WHERE a.qid != b.vec_id),
         |ranked AS (
         |  SELECT qid, vec_id, sim,
         |    CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS INTEGER) AS rank
         |  FROM sims)
         |SELECT qid, rank, vec_id, sim FROM ranked WHERE rank <= 5
         |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_sim_neardup" ->
      """WITH e AS (SELECT * FROM embeddings WHERE vec_id < 200),
        |sims AS (
        |  SELECT a.label, a.vec_id AS a, b.vec_id AS b,
        |    round(list_sum(list_transform(generate_series(1, 64),
        |        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) /
        |      (sqrt(list_sum(list_transform(generate_series(1, 64),
        |        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))) *
        |       sqrt(list_sum(list_transform(generate_series(1, 64),
        |        i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))), 6) AS sim
        |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT label, a, b, sim FROM sims WHERE sim >= 0.8
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_doc_join" ->
      """SELECT label, count(doc_id) AS n_docs, count(vec_id) AS n_vecs,
        |  count(DISTINCT lang) AS n_langs
        |FROM documents FULL OUTER JOIN embeddings ON doc_id = vec_id
        |GROUP BY 1 ORDER BY ALL NULLS FIRST""".stripMargin
  )
}

package graft.pipeline

import graft.{Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted near-dup signature index — the index LIFECYCLE around
  * [[Dedup]]'s MinHash-LSH algebra, the dedup analogue of [[VectorIndex]].
  *
  * The most common production dedup job is not "dedup this corpus once";
  * it is "dedup today's crawl against everything already kept". Recomputing
  * the corpus signatures per batch re-pays the whole shingle+MinHash pass
  * over 100 TB for every incremental batch; the index persists them once:
  *
  *   - `sigs`    (doc, hv, sig)    md5-60bit hashed shingle set + k-perm
  *                                 MinHash signature per document
  *   - `buckets` (doc, band, bsig) banded signatures — the LSH join key
  *
  * An incoming batch then computes signatures for ITS documents only, joins
  * its banded signatures against the persisted buckets (one equi-join on
  * (band, bsig) — the same bucketed, never-all-pairs shape as batch LSH),
  * verifies candidates by exact Jaccard over the stored `hv` sets, and
  * appends its own rows into the index ([[appendBatch]]) for the next batch.
  * Signatures are per-document maps, so append ∪ old ≡ a from-scratch build
  * over old ∪ batch — `q_dedup_append_pairs` hash-proves exactly that with
  * an oracle byte-identical to `q_dedup_near_md5`'s.
  *
  * Everything here is the md5 cross-engine algebra (DuckDB re-derives every
  * signature, bucket, candidate, and Jaccard value); the xxhash64 fast path
  * for pure-Spark deployments is [[Dedup.nearDuplicatePairs]] — one column
  * expression swap, same shapes. Freshness + concurrency: the versioned-dir
  * + atomic-marker-swap contract of [[IndexStore]] (shared with
  * [[VectorIndex]]), keyed on the source fingerprint of `documents.parquet`.
  */
object DedupIndex {

  /** The two index components for one corpus, as DataFrames. */
  case class Components(sigs: DataFrame, buckets: DataFrame)

  /** Per-document signature rows (doc, hv, sig): md5-60bit hashed distinct
    * shingle set (`hv`, for the exact-Jaccard verify) and k-perm MinHash
    * signature (`sig`, for banding). Documents with no shingles (shorter
    * than the shingle width) have no signature and can never near-dup —
    * they are excluded, matching batch LSH.
    */
  def signatures(docs: DataFrame, textCol: String, idCol: String,
      k: Int = 8): DataFrame = {
    import graft.functions.TextHashes.{md5Hash60Array, minHashSigMd5, shingleStrings}
    docs.select(col(idCol).as("doc"), shingleStrings(col(textCol)).as("shs"))
      .filter(size(col("shs")) > 0)
      .select(col("doc"), md5Hash60Array(col("shs")).as("hv"),
        minHashSigMd5(col("shs"), k).as("sig"))
  }

  /** The band-key format, in ONE place: `bands` ','-joined slices of a
    * k-row signature. Every producer of (band, bsig) keys — [[banded]],
    * the persisted buckets, and the streaming lookup — must build them
    * with this expression, or the equi-join spans disjoint key spaces and
    * silently matches nothing.
    */
  private[graft] def bandKeys(sig: org.apache.spark.sql.Column, k: Int,
      bands: Int): org.apache.spark.sql.Column = {
    val r = k / bands
    transform(sequence(lit(0), lit(bands - 1)),
      b => concat_ws(",", slice(sig, b * r + 1, lit(r))))
  }

  /** Banded signature rows (doc, band, bsig): the signature sliced into
    * `bands` bands of k/bands rows; `bsig` is the ','-joined slice — the
    * LSH bucket key. 24-ish bytes per row; the shingle arrays never enter
    * the bucket shuffle.
    */
  def banded(sigs: DataFrame, k: Int = 8, bands: Int = 4): DataFrame =
    sigs.select(col("doc"),
      posexplode(bandKeys(col("sig"), k, bands)).as(Seq("band", "bsig")))

  /** Both components, lazily, from a corpus DataFrame. */
  def components(docs: DataFrame, textCol: String, idCol: String,
      k: Int = 8, bands: Int = 4): Components = {
    val s = signatures(docs, textCol, idCol, k)
    Components(s, banded(s, k, bands))
  }

  /** Verified near-dup pairs WITHIN an index: bucket-collision candidates
    * (doc_a < doc_b, deduped as bare id pairs), then exact Jaccard over the
    * stored hashed shingle sets. This is [[Dedup.nearDuplicatePairsMd5]]
    * factored over reusable components — the batch entry point delegates
    * here, so the oracle that hash-checks it checks this path too.
    */
  def selfPairs(ix: Components, threshold: Double = 0.5): DataFrame = {
    import graft.functions.TextHashes.jaccardLong
    val candidates = ix.buckets
      .select(col("band"), col("bsig"), col("doc").as("doc_a"))
      .join(ix.buckets.select(col("band"), col("bsig"), col("doc").as("doc_b")),
        Seq("band", "bsig"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").dropDuplicates("doc_a", "doc_b")
    candidates
      .join(ix.sigs.select(col("doc").as("doc_a"), col("hv").as("hv_a")), Seq("doc_a"))
      .join(ix.sigs.select(col("doc").as("doc_b"), col("hv").as("hv_b")), Seq("doc_b"))
      .withColumn("jaccard", round(jaccardLong(col("hv_a"), col("hv_b")), 6))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Incremental lookup: which documents of a NEW batch near-duplicate a
    * document already in the index? Returns (doc_corpus, doc_new, jaccard).
    *
    * Scale shape: signatures are computed for the BATCH only; the corpus
    * side is the persisted index — one (band, bsig) equi-join between batch
    * bands and stored buckets, candidate pairs deduped as bare ids, exact
    * Jaccard from the stored corpus `hv` + the batch's own. The corpus text
    * is never re-read, never re-shingled, never shuffled.
    *
    * `k`/`bands` must match the values the index was built with: band keys
    * are formatted signature slices, so a mismatch joins disjoint key
    * spaces and silently matches nothing (the persisted index is always
    * built with the defaults).
    */
  def lookup(ix: Components, batch: DataFrame, textCol: String, idCol: String,
      k: Int = 8, bands: Int = 4, threshold: Double = 0.5): DataFrame = {
    import graft.functions.TextHashes.jaccardLong
    val bs = signatures(batch, textCol, idCol, k)
    val candidates = ix.buckets
      .select(col("band"), col("bsig"), col("doc").as("doc_corpus"))
      .join(banded(bs, k, bands)
        .select(col("band"), col("bsig"), col("doc").as("doc_new")),
        Seq("band", "bsig"))
      .filter(col("doc_corpus") =!= col("doc_new"))
      .select("doc_corpus", "doc_new").dropDuplicates("doc_corpus", "doc_new")
    candidates
      .join(ix.sigs.select(col("doc").as("doc_corpus"), col("hv").as("hv_a")),
        Seq("doc_corpus"))
      .join(bs.select(col("doc").as("doc_new"), col("hv").as("hv_b")),
        Seq("doc_new"))
      .withColumn("jaccard", round(jaccardLong(col("hv_a"), col("hv_b")), 6))
      .filter(col("jaccard") >= threshold)
      .select("doc_corpus", "doc_new", "jaccard")
  }

  /** Append a batch of new documents into existing components: compute the
    * batch's signatures + bands, union with the old rows. Signatures are
    * per-document maps (no cross-document state), so the merged index is
    * row-identical to a from-scratch build over old ∪ batch — the property
    * `q_dedup_append_pairs` hash-proves (oracle byte-identical to
    * `q_dedup_near_md5`) and `PipelineSpec` asserts component-wise. The old
    * components are untouched, exactly like a parquet append at scale.
    */
  def appendBatch(ix: Components, batch: DataFrame, textCol: String,
      idCol: String, k: Int = 8, bands: Int = 4): Components = {
    val bs = signatures(batch, textCol, idCol, k)
    Components(ix.sigs.unionByName(bs),
      ix.buckets.unionByName(banded(bs, k, bands)))
  }

  // ---- persistence (documents.parquet of an sfDir) -----------------------

  private val store =
    new IndexStore("SPARK_GRAFT_DEDUP_INDEX_DIR", "graft-dedup-index",
      "documents.parquet")

  /** Index directory for one corpus dir (env-relocatable root). */
  def dir(sfDir: String): String = store.dir(sfDir)

  /** Build-if-absent; returns the current VERSION dir. */
  def ensure(spark: SparkSession, sfDir: String): String =
    store.ensure(sfDir)(buildInto(spark, sfDir, _))

  /** Unconditional build + persist of both components behind the atomic
    * marker swap. Returns the new version dir.
    */
  def rebuild(spark: SparkSession, sfDir: String): String =
    store.rebuild(sfDir)(buildInto(spark, sfDir, _))

  /** Buckets are derived from the PERSISTED signatures (not recomputed from
    * text), so what lookups join against is exactly what the build wrote —
    * no re-derivation seam (the [[VectorIndex]] build principle).
    */
  private def buildInto(spark: SparkSession, sfDir: String, vd: String): Unit = {
    signatures(T.documents(spark, sfDir), "text", "doc_id")
      .write.mode("overwrite").parquet(s"$vd/sigs")
    banded(spark.read.parquet(s"$vd/sigs"))
      .write.mode("overwrite").parquet(s"$vd/buckets")
  }

  def sigs(s: SparkSession, sfDir: String): DataFrame =
    s.read.parquet(ensure(s, sfDir) + "/sigs")
  def buckets(s: SparkSession, sfDir: String): DataFrame =
    s.read.parquet(ensure(s, sfDir) + "/buckets")

  /** The persisted components of `sfDir`'s index (builds it if absent). */
  def persisted(s: SparkSession, sfDir: String): Components =
    Components(sigs(s, sfDir), buckets(s, sfDir))
}

package graft.pipeline

import graft.{Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted ANN index — the index LIFECYCLE around [[Similarity]]'s search
  * algebra. At scale the PQ/SQ8 codebooks, codes, and coarse-cell assignment
  * are built ONCE (an expensive training + encode pass over the corpus) and
  * then REUSED by every search; fusing the build into each query — as the
  * round-5 `q_pq_adc`/`q_pq_ivfadc`/`q_sq8_ivf` did — re-pays ~90% of the
  * query time for work whose whole point is amortization.
  *
  * Components, one parquet side table each (all deterministic, so a rebuild
  * is byte-identical and the DuckDB oracles — which re-derive everything
  * from the raw embeddings — hash-prove the persisted index lossless):
  *
  *   - `pq_books`    (sub, cell, cvec)   Lloyd-refined PQ codebooks
  *   - `pq_codes`    (vec_id, codes)     8-byte PQ codes per vector
  *   - `cells`       (cell, cvec)        IVF coarse centroids
  *   - `cell_assign` (vec_id, cell)      nearest-cell corpus assignment
  *   - `sq8_stats`   (mns, spans)        trained SQ8 quantizer (one row)
  *   - `sq8_codes`   (vec_id, codes)     64-byte SQ8 codes per vector
  *
  * Freshness + concurrency: components live under an immutable VERSION
  * directory; a `_GRAFT_INDEX` marker records the source fingerprint (total
  * size + max mtime of `embeddings.parquet`) plus the current version name,
  * and is replaced by an ATOMIC file move after a build completes. Readers
  * resolve the marker once and only ever see a complete version — a
  * concurrent rebuild (even from another JVM: the snapshot-pointer pattern
  * of the table formats) writes a fresh version dir and swaps the pointer;
  * a crash mid-build leaves the old marker pointing at the old complete
  * version. Superseded versions are swept on later rebuilds (the newest
  * previous version is retained for readers mid-flight on it). On a cluster
  * the same layout lands on shared storage and the marker is the manifest.
  *
  * Incremental maintenance ([[appendBatch]]): new vectors are assigned to
  * the EXISTING cells and encoded against the EXISTING books/stats (encode
  * and assignment are per-row maps, so append ∪ old ≡ full re-encode under
  * a frozen quantizer), then unioned — the vector-index analogue of
  * [[graft.operators.Lake.mergeUpsert]]'s row upsert. Retraining the
  * quantizer itself is deliberately a full [[rebuild]]: centroid drift
  * invalidates every stored code, there is no cheaper correct path.
  */
object VectorIndex {

  private def rootBase: String =
    sys.env.getOrElse("SPARK_GRAFT_INDEX_DIR",
      sys.props("java.io.tmpdir") + "/graft-vector-index")

  /** Index directory for one corpus dir (env-relocatable root). */
  def dir(sfDir: String): String =
    rootBase + "/" + sfDir.replaceAll("[^A-Za-z0-9._-]", "_")

  /** Source fingerprint: total byte size + newest mtime of the embeddings
    * parquet (file or directory). Cheap (pure metadata) and catches the
    * driver regenerating testdata between rounds.
    */
  private def fingerprint(sfDir: String): String = {
    def walk(f: java.io.File): (Long, Long) =
      if (f.isDirectory) {
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
          .map(walk).foldLeft((0L, 0L)) {
            case ((s1, m1), (s2, m2)) => (s1 + s2, math.max(m1, m2))
          }
      } else (f.length(), f.lastModified())
    val (sz, mt) = walk(new java.io.File(s"$sfDir/embeddings.parquet"))
    s"v1:$sz:$mt"
  }

  private val lock = new Object
  private def markerPath(d: String) =
    java.nio.file.Paths.get(d, "_GRAFT_INDEX")

  /** The complete version dir the marker points at, if its fingerprint
    * matches the current source. Marker format: `<fingerprint>\n<version>`.
    */
  private def currentVersion(d: String, sfDir: String): Option[String] = {
    val m = markerPath(d)
    if (!java.nio.file.Files.exists(m)) None
    else java.nio.file.Files.readString(m).split("\n", 2) match {
      case Array(fp, v) if fp == fingerprint(sfDir) &&
          java.nio.file.Files.exists(java.nio.file.Paths.get(d, v)) =>
        Some(s"$d/$v")
      case _ => None
    }
  }

  /** Build-if-absent: reuse a fresh index, rebuild a missing/stale one.
    * Returns the current VERSION dir. Idempotent and cheap when fresh
    * (metadata only).
    */
  def ensure(spark: SparkSession, sfDir: String): String = lock.synchronized {
    val d = dir(sfDir)
    currentVersion(d, sfDir).getOrElse(rebuild(spark, sfDir))
  }

  /** Unconditional build + persist of every component (the index-time write
    * pass — `q_pq_build` benches exactly this). Each downstream component is
    * computed from the PERSISTED form of its inputs, so what searches read
    * is what the build wrote, with no re-derivation seam.
    *
    * Writes into a fresh immutable version dir, then swaps the marker with
    * an atomic move — concurrent readers (any process) keep resolving a
    * complete version throughout. Returns the new version dir.
    */
  def rebuild(spark: SparkSession, sfDir: String): String = lock.synchronized {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val d = dir(sfDir)
    Files.createDirectories(Paths.get(d))
    // nanotime-ordered so the sweep below can retain the newest predecessor
    val v = f"v-${System.nanoTime()}%019d-${ProcessHandle.current().pid()}"
    val vd = s"$d/$v"
    val e = T.embeddings(spark, sfDir)
    val corpus = e.select(col("vec_id"), col("embedding").as("vec"))

    Similarity.pqCodebooksRefined(e)
      .write.mode("overwrite").parquet(s"$vd/pq_books")
    Similarity.pqEncode(e, spark.read.parquet(s"$vd/pq_books"))
      .write.mode("overwrite").parquet(s"$vd/pq_codes")

    Similarity.centroidVectors(e)
      .select(col("clabel").as("cell"), col("cvec"))
      .write.mode("overwrite").parquet(s"$vd/cells")
    Similarity.assignCells(corpus, spark.read.parquet(s"$vd/cells"))
      .select("vec_id", "cell")
      .write.mode("overwrite").parquet(s"$vd/cell_assign")

    Similarity.sq8StatsRow(e)
      .write.mode("overwrite").parquet(s"$vd/sq8_stats")
    Similarity.sq8Encode(e, spark.read.parquet(s"$vd/sq8_stats"))
      .write.mode("overwrite").parquet(s"$vd/sq8_codes")

    val tmp = Paths.get(d, s".marker-$v")
    Files.writeString(tmp, fingerprint(sfDir) + "\n" + v)
    Files.move(tmp, markerPath(d), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    sweepOldVersions(d, keep = Set(v))
    vd
  }

  /** Best-effort GC of superseded version dirs: keeps `keep` plus the
    * newest other version (a reader in another process may still be
    * mid-scan on the immediate predecessor); anything older is removed.
    * Failures are ignored — a later rebuild sweeps again.
    */
  private def sweepOldVersions(d: String, keep: Set[String]): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rm)
      f.delete(); ()
    }
    try {
      val versions = Option(new java.io.File(d).listFiles())
        .getOrElse(Array.empty[java.io.File])
        .filter(f => f.isDirectory && f.getName.startsWith("v-"))
        .sortBy(_.getName).reverse // newest first (zero-padded nanotime)
      versions.filterNot(f => keep(f.getName)).drop(1).foreach(rm)
    } catch { case _: Throwable => () }
  }

  // ---- component accessors (build-if-absent) ----------------------------

  def pqBooks(s: SparkSession, sfDir: String): DataFrame =
    s.read.parquet(ensure(s, sfDir) + "/pq_books")
  def pqCodes(s: SparkSession, sfDir: String): DataFrame =
    s.read.parquet(ensure(s, sfDir) + "/pq_codes")
  def cells(s: SparkSession, sfDir: String): DataFrame =
    s.read.parquet(ensure(s, sfDir) + "/cells")
  def cellAssign(s: SparkSession, sfDir: String): DataFrame =
    s.read.parquet(ensure(s, sfDir) + "/cell_assign")
  def sq8Stats(s: SparkSession, sfDir: String): DataFrame =
    s.read.parquet(ensure(s, sfDir) + "/sq8_stats")
  def sq8Codes(s: SparkSession, sfDir: String): DataFrame =
    s.read.parquet(ensure(s, sfDir) + "/sq8_codes")

  // ---- incremental maintenance -------------------------------------------

  /** Index components for one corpus, as DataFrames — the unit [[appendBatch]]
    * merges. `pqCodes`/`sq8Codes` keyed by vec_id; `cellAssign` (vec_id, cell).
    */
  case class Components(pqCodes: DataFrame, cellAssign: DataFrame,
      sq8Codes: DataFrame)

  /** The persisted components of `sfDir`'s index (builds it if absent). */
  def components(s: SparkSession, sfDir: String): Components =
    Components(pqCodes(s, sfDir), cellAssign(s, sfDir), sq8Codes(s, sfDir))

  /** Append a batch of new vectors (vec_id, embedding) into existing
    * components under a FROZEN quantizer (books/cells/stats unchanged):
    * encode + assign the batch, union with the old rows. Because encode and
    * assignment are per-row maps, the merged components are row-identical
    * to a full re-encode of old ∪ new against the same quantizer — the
    * property `PipelineSpec` asserts and `q_sq8_ivf_append`'s unchanged
    * oracle hash-proves. No shuffle beyond encode's own (the batch side
    * only); the old components are untouched, exactly like a parquet
    * append at scale.
    */
  def appendBatch(old: Components, batch: DataFrame, books: DataFrame,
      cells: DataFrame, sq8StatsRow: DataFrame): Components = {
    val corpus = batch.select(col("vec_id"), col("embedding").as("vec"))
    Components(
      old.pqCodes.unionByName(Similarity.pqEncode(batch, books)),
      old.cellAssign.unionByName(
        Similarity.assignCells(corpus, cells).select("vec_id", "cell")),
      old.sq8Codes.unionByName(Similarity.sq8Encode(batch, sq8StatsRow)))
  }
}

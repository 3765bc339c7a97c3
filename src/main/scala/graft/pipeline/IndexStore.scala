package graft.pipeline

/** Shared plumbing for persisted per-corpus index side tables (the vector
  * index of [[VectorIndex]], the dedup signature index of [[DedupIndex]]):
  * immutable VERSION directories behind an atomically-swapped marker file.
  *
  * Freshness + concurrency contract (identical for every index kind):
  * components live under an immutable version dir; a `_GRAFT_INDEX` marker
  * records the source fingerprint (total size + max mtime of the source
  * parquet) plus the current version name, and is replaced by an ATOMIC file
  * move after a build completes. Readers resolve the marker once and only
  * ever see a complete version — a concurrent rebuild (even from another
  * JVM: the snapshot-pointer pattern of the table formats) writes a fresh
  * version dir and swaps the pointer; a crash mid-build leaves the old
  * marker pointing at the old complete version. Superseded versions are
  * swept on later rebuilds (the newest predecessor is retained for readers
  * mid-flight on it). On a cluster the same layout lands on shared storage
  * and the marker is the manifest.
  */
private[pipeline] final class IndexStore(envVar: String, defaultName: String,
    sourceFileName: String) {

  private def rootBase: String =
    sys.env.getOrElse(envVar, sys.props("java.io.tmpdir") + "/" + defaultName)

  /** Index directory for one corpus dir (env-relocatable root). */
  def dir(sfDir: String): String =
    rootBase + "/" + sfDir.replaceAll("[^A-Za-z0-9._-]", "_")

  /** Source fingerprint: total byte size + newest mtime of the source
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
    val (sz, mt) = walk(new java.io.File(s"$sfDir/$sourceFileName"))
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
  def ensure(sfDir: String)(build: String => Unit): String = lock.synchronized {
    val d = dir(sfDir)
    currentVersion(d, sfDir).getOrElse(rebuild(sfDir)(build))
  }

  // per-JVM monotonic tiebreak for same-millisecond rebuilds
  private val seq = new java.util.concurrent.atomic.AtomicLong()

  /** Unconditional build + persist into a fresh immutable version dir, then
    * marker swap by atomic move — concurrent readers (any process) keep
    * resolving a complete version throughout. Returns the new version dir.
    */
  def rebuild(sfDir: String)(build: String => Unit): String = lock.synchronized {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val d = dir(sfDir)
    Files.createDirectories(Paths.get(d))
    // Fingerprint the source BEFORE building: if the source is regenerated
    // mid-build, the stale marker then mismatches on the next ensure() and
    // triggers a fresh rebuild — stamping the fingerprint afterwards would
    // instead certify an index built from data that no longer exists.
    val fp = fingerprint(sfDir)
    // Wall-clock-ordered names (epoch millis + per-JVM counter + pid) so
    // the sweep's lexicographic "newest first" holds across JVM restarts
    // and machines sharing storage — nanoTime has an arbitrary per-JVM
    // origin and would misorder versions written by different processes.
    val v = f"v-${System.currentTimeMillis()}%015d-${seq.incrementAndGet()}%06d-${ProcessHandle.current().pid()}"
    val vd = s"$d/$v"
    build(vd)
    val tmp = Paths.get(d, s".marker-$v")
    Files.writeString(tmp, fp + "\n" + v)
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
        .sortBy(_.getName).reverse // newest first (zero-padded epoch millis)
      versions.filterNot(f => keep(f.getName)).drop(1).foreach(rm)
    } catch { case _: Throwable => () }
  }
}

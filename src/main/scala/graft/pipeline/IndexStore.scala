package graft.pipeline

/** Shared plumbing for persisted per-corpus index side tables (the vector
  * index of [[VectorIndex]], the dedup signature index of [[DedupIndex]]):
  * immutable VERSION directories behind an atomically-swapped marker file.
  *
  * Freshness + concurrency contract (identical for every index kind):
  * components live under an immutable version dir; a `_GRAFT_INDEX` marker
  * records the source fingerprint (a digest over every file's path, size,
  * and mtime) plus the current version name, and is replaced by an ATOMIC
  * file move after a build completes. Readers resolve the marker once and
  * only ever see a complete version — a concurrent rebuild (even from
  * another JVM: the snapshot-pointer pattern of the table formats) writes a
  * fresh version dir and swaps the pointer; a crash mid-build leaves the old
  * marker pointing at the old complete version. Superseded versions are
  * swept on later rebuilds (the newest predecessor is retained
  * unconditionally, and anything younger than a grace period is retained
  * regardless of position, so a long-lived reader several rebuilds behind
  * is never unlinked mid-scan). On a cluster the same layout lands on
  * shared storage and the marker is the manifest.
  *
  * Deletes: `_tombstones` (a parquet dir of removed ids) lives NEXT TO the
  * versions, not inside one — logical removals survive both compaction and
  * a staleness-triggered rebuild from the (unchanged) source, so a removed
  * document can never be resurrected by index maintenance. Readers always
  * anti-join it (a broadcast of a tiny id list; a no-op after compaction).
  */
private[pipeline] object IndexStore {
  /** Sweep grace period (see `sweepOldVersions`); a var only so tests can
    * exercise both sides of the gate without 30-minute sleeps.
    */
  private[pipeline] var sweepGraceMs: Long = 30L * 60 * 1000

  /** Builder-claim staleness bound: a `_build._claim` older than this is
    * treated as abandoned (crashed builder) and taken over. A var only so
    * the takeover unit doesn't sleep 10 minutes.
    */
  private[pipeline] var claimTimeoutMs: Long = 10L * 60 * 1000
}

private[pipeline] final class IndexStore(envVar: String, defaultName: String,
    sourceFileName: String) {

  private def rootBase: String =
    sys.env.getOrElse(envVar, sys.props("java.io.tmpdir") + "/" + defaultName)

  /** Index directory for one corpus dir (env-relocatable root). The short
    * path hash keeps DISTINCT corpora distinct even when the lossy character
    * sanitization collides (e.g. `/a/b` vs `/a_b`) — without it, alternating
    * `ensure()` calls from two such corpora would see fingerprint mismatches
    * and rebuild/sweep each other's versions in a loop.
    */
  def dir(sfDir: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(sfDir.getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    rootBase + "/" + sfDir.replaceAll("[^A-Za-z0-9._-]", "_") + "-" + h
  }

  /** Tombstone parquet dir for one corpus — OUTSIDE the version dirs (does
    * not start with `v-`, so the sweep never touches it) and not covered by
    * the marker: removals are durable across rebuilds and compactions.
    */
  def tombstoneDir(sfDir: String): String = dir(sfDir) + "/_tombstones"

  /** Source fingerprint: an md5 digest folding every file's (relative path,
    * size, mtime) plus the file count. Pure metadata (no content read), and
    * — unlike the total-size+max-mtime scheme it replaced — detects a
    * regeneration that keeps total bytes identical within the filesystem's
    * mtime resolution, because any per-file size or path change lands in
    * the digest.
    */
  private def fingerprint(sfDir: String): String = {
    val root = new java.io.File(s"$sfDir/$sourceFileName")
    val md = java.security.MessageDigest.getInstance("MD5")
    var n = 0
    def walk(f: java.io.File, rel: String): Unit =
      if (f.isDirectory) {
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
          .sortBy(_.getName)
          .foreach(c => walk(c, rel + "/" + c.getName))
      } else {
        n += 1
        md.update(s"$rel:${f.length()}:${f.lastModified()}\n".getBytes("UTF-8"))
      }
    walk(root, "")
    s"v2:$n:${md.digest().map("%02x".format(_)).mkString}"
  }

  private val lock = new Object
  private def markerPath(d: String) =
    java.nio.file.Paths.get(d, "_GRAFT_INDEX")

  // ---- cross-process builder claim (the Versioned claim/seal posture) ----
  //
  // The JVM `lock` above serializes same-process builders; two PROCESSES
  // sharing one artifact dir additionally serialize on `_build._claim`,
  // created with `Files.createFile` (O_EXCL — atomic on POSIX filesystems
  // and HDFS-style stores with atomic create-if-absent, exactly the
  // `Versioned.claimNext` protocol). The winner builds and swaps the
  // marker; a loser spins until the claim frees, then re-checks the marker
  // — so concurrent `ensure()` calls from N processes build ONCE.
  //
  // Liveness without losing safety:
  //  - the holder HEARTBEATS the claim (mtime touch every timeout/4) for
  //    as long as its build runs, so a build longer than `claimTimeoutMs`
  //    never looks abandoned — the timeout bounds crash detection, not
  //    build duration;
  //  - a crashed builder's orphan claim (no heartbeats) is taken over by
  //    atomically RENAMING it aside (ATOMIC_MOVE — exactly one waiter's
  //    rename succeeds; every other waiter's rename throws and re-loops),
  //    then re-racing the O_EXCL create. A blind delete here would race:
  //    two waiters that both judged the old claim stale could otherwise
  //    have the second delete the first's FRESH claim, yielding two
  //    concurrent holders.
  //
  // Readers never touch the claim: they resolve the marker, which only
  // ever swaps atomically to a COMPLETE version, so a reader is never
  // blocked by (or exposed to) a build in progress.

  private def claimPath(d: String) =
    java.nio.file.Paths.get(d, "_build._claim")

  /** Block until this process holds the exclusive builder claim on `d`,
    * then run `body` while a daemon heartbeat keeps the claim visibly
    * live; always releases.
    */
  private def withClaim[A](d: String)(body: => A): A = {
    import java.nio.file.Files
    val p = claimPath(d)
    // Owner token (same rationale as Versioned.withMutateClaim): after a
    // stale-claim takeover the old holder may still be alive; its
    // heartbeat must not refresh the new holder's claim and its release
    // must not delete it, or a third builder could acquire while the
    // second holds. Builds land in fresh immutable version dirs and the
    // marker swap is atomic, so a doubled build is wasted work, never a
    // correctness hazard — the token only has to stop cross-holder file
    // touches.
    val token =
      s"${ProcessHandle.current().pid()}-${seq.incrementAndGet()}"
    def ownsClaim(): Boolean =
      try Files.readString(p).trim == token
      catch { case _: Throwable => false }
    while (!tryCreateClaim(p, token)) {
      val stale =
        try {
          val age = System.currentTimeMillis() -
            Files.getLastModifiedTime(p).toMillis
          age > IndexStore.claimTimeoutMs
        } catch { case _: Throwable => false } // vanished → just re-race
      if (stale) {
        // exclusive takeover: exactly one waiter wins the atomic rename
        try {
          val aside = p.resolveSibling(
            s".claim-stale-${ProcessHandle.current().pid()}-${seq.incrementAndGet()}")
          Files.move(p, aside, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          Files.deleteIfExists(aside); ()
        } catch { case _: Throwable => () } // lost the rename race → re-loop
      } else Thread.sleep(25)
    }
    // heartbeat: touch the claim so a long build never reads as abandoned
    // — but only while it still carries OUR token (see above)
    val beat = new Thread(() => {
      try {
        var owned = true
        while (!Thread.interrupted() && owned) {
          Thread.sleep(math.max(50L, IndexStore.claimTimeoutMs / 4))
          if (ownsClaim())
            Files.setLastModifiedTime(p,
              java.nio.file.attribute.FileTime.fromMillis(
                System.currentTimeMillis()))
          else owned = false // taken over — never touch the new holder's file
        }
      } catch { case _: Throwable => () } // interrupt or deleted claim: stop
    })
    beat.setDaemon(true)
    beat.start()
    try body
    finally {
      beat.interrupt()
      try { if (ownsClaim()) Files.deleteIfExists(p); () }
      catch { case _: Throwable => () }
    }
  }

  private def tryCreateClaim(p: java.nio.file.Path, token: String): Boolean =
    try {
      // CREATE_NEW keeps the O_EXCL create; the token rides in the same
      // call so every holder can verify ownership before touching the file
      java.nio.file.Files.write(p,
        token.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.CREATE_NEW)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    }

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

  /** The version dir currently being served, regardless of freshness —
    * compaction reads the components it is about to rewrite from here.
    * None if no complete version exists.
    */
  def servedVersion(sfDir: String): Option[String] = lock.synchronized {
    val d = dir(sfDir)
    val m = markerPath(d)
    if (!java.nio.file.Files.exists(m)) None
    else java.nio.file.Files.readString(m).split("\n", 2) match {
      case Array(_, v)
          if java.nio.file.Files.exists(java.nio.file.Paths.get(d, v)) =>
        Some(s"$d/$v")
      case _ => None
    }
  }

  /** Build-if-absent: reuse a fresh index, rebuild a missing/stale one.
    * Returns the current VERSION dir. Idempotent and cheap when fresh
    * (metadata only). Cross-process: stale callers race for the builder
    * claim; the winner builds, the losers wait and re-check the marker —
    * N processes ensure() → one build.
    */
  def ensure(sfDir: String)(build: String => Unit): String = lock.synchronized {
    val d = dir(sfDir)
    currentVersion(d, sfDir).getOrElse {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
      withClaim(d) {
        // double-check under the claim: the process we raced may have
        // built exactly the version we need while we waited
        currentVersion(d, sfDir).getOrElse(rebuildClaimed(sfDir)(build))
      }
    }
  }

  // per-JVM monotonic tiebreak for same-millisecond rebuilds
  private val seq = new java.util.concurrent.atomic.AtomicLong()

  /** Unconditional build + persist into a fresh immutable version dir, then
    * marker swap by atomic move — concurrent readers (any process) keep
    * resolving a complete version throughout. Cross-process mutators
    * (rebuild / append / remove / compact from different JVMs) serialize
    * on the builder claim — without it, two concurrent marker swaps could
    * silently drop one mutation's effect. Returns the new version dir.
    */
  def rebuild(sfDir: String)(build: String => Unit): String = lock.synchronized {
    val d = dir(sfDir)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
    withClaim(d) { rebuildClaimed(sfDir)(build) }
  }

  /** [[rebuild]] body — caller must hold the JVM lock AND the claim. */
  private def rebuildClaimed(sfDir: String)(build: String => Unit): String = {
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

  /** Like [[rebuild]], but certifies the new version against the SAME
    * fingerprint the currently-served marker carries (compaction: the new
    * version derives from the old one, not from a re-read of the source, so
    * re-fingerprinting the source here could certify a version built from
    * components of a source that has since changed).
    */
  def rewriteVersion(sfDir: String)(build: String => Unit): String =
    lock.synchronized {
      import java.nio.file.{Files, Paths, StandardCopyOption}
      val d = dir(sfDir)
      withClaim(d) {
        val m = markerPath(d)
        // the served-marker read happens UNDER the claim: a concurrent
        // mutator's swap either fully precedes (we inherit its version's
        // fingerprint) or fully follows this rewrite
        val fp = java.nio.file.Files.readString(m).split("\n", 2)(0)
        val v = f"v-${System.currentTimeMillis()}%015d-${seq.incrementAndGet()}%06d-${ProcessHandle.current().pid()}"
        val vd = s"$d/$v"
        build(vd)
        val tmp = Paths.get(d, s".marker-$v")
        Files.writeString(tmp, fp + "\n" + v)
        Files.move(tmp, m, StandardCopyOption.REPLACE_EXISTING,
          StandardCopyOption.ATOMIC_MOVE)
        sweepOldVersions(d, keep = Set(v))
        vd
      }
    }

  /** Versions younger than this are never swept, whatever their position —
    * a long-lived reader (e.g. a running streaming lookup holding persisted
    * DataFrames) two rebuilds behind keeps its files for at least this long.
    */
  private def sweepGraceMs = IndexStore.sweepGraceMs

  /** Best-effort GC of superseded version dirs: keeps `keep`, the newest
    * other version (a reader in another process may still be mid-scan on
    * the immediate predecessor), and anything younger than the grace
    * period; older survivors are removed. Failures are ignored — a later
    * rebuild sweeps again.
    */
  private def sweepOldVersions(d: String, keep: Set[String]): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rm)
      f.delete(); ()
    }
    def bornAt(name: String): Long = // v-<epochmillis15>-...
      name.split("-").lift(1).flatMap(_.toLongOption).getOrElse(Long.MaxValue)
    try {
      val now = System.currentTimeMillis()
      val versions = Option(new java.io.File(d).listFiles())
        .getOrElse(Array.empty[java.io.File])
        .filter(f => f.isDirectory && f.getName.startsWith("v-"))
        .sortBy(_.getName).reverse // newest first (zero-padded epoch millis)
      versions.filterNot(f => keep(f.getName)).drop(1)
        .filter(f => now - bornAt(f.getName) > sweepGraceMs)
        .foreach(rm)
    } catch { case _: Throwable => () }
  }
}

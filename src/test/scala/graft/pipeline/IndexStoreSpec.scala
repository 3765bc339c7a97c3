package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Cross-process safety of the shared artifact-index store: the O_EXCL
  * builder claim (the `Versioned.claimNext` protocol, extended to the five
  * persisted artifact families in round 11). Two `IndexStore` INSTANCES
  * here stand in for two JVMs: each instance has its own in-process lock
  * object, so the only thing serializing them is the `_build._claim` file
  * — exactly the cross-process seam.
  */
class IndexStoreSpec extends AnyFunSuite {

  /** A corpus dir with one source file, so fingerprinting has bytes. */
  private def freshCorpus(): String = {
    val c = java.nio.file.Files.createTempDirectory("idxstore-corpus")
    java.nio.file.Files.writeString(c.resolve("documents.parquet"), "src-bytes")
    c.toString
  }

  private def freshStore(tag: String): (IndexStore, IndexStore, String) = {
    // both instances resolve the same root via the same defaultName
    val name = s"graft-idxstore-spec-$tag-${System.nanoTime()}"
    (new IndexStore("GRAFT_IDXSTORE_SPEC_UNSET", name, "documents.parquet"),
      new IndexStore("GRAFT_IDXSTORE_SPEC_UNSET", name, "documents.parquet"),
      name)
  }

  private def doBuild(counter: java.util.concurrent.atomic.AtomicInteger,
      spans: java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)])
      (vd: String): Unit = {
    val t0 = System.nanoTime()
    counter.incrementAndGet()
    Thread.sleep(120)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(vd))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(vd, "component.parquet"), "built")
    spans.add((t0, System.nanoTime()))
    ()
  }

  test("racing ensure() across instances: one claim winner builds, everyone serves its version") {
    val (a, b, _) = freshStore("ensure")
    val corpus = freshCorpus()
    val builds = new java.util.concurrent.atomic.AtomicInteger()
    val spans = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val results = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (0 until 8).map { i =>
      val store = if (i % 2 == 0) a else b
      new Thread(() => results.add(store.ensure(corpus)(doBuild(builds, spans))))
    }
    threads.foreach(_.start()); threads.foreach(_.join(30000))
    import scala.jdk.CollectionConverters._
    assert(builds.get() === 1,
      s"racing ensure() must build exactly once, built ${builds.get()}")
    assert(results.asScala.toSet.size === 1,
      s"all racers must resolve one version: ${results.asScala.toSet}")
    val served = a.servedVersion(corpus)
    assert(served.isDefined && results.asScala.forall(_ == served.get))
    // the claim is released after the build
    assert(!new java.io.File(new java.io.File(served.get).getParent,
      "_build._claim").exists(), "claim must be released")
  }

  test("racing rebuild() across instances: mutations serialize — build intervals never overlap") {
    val (a, b, _) = freshStore("rebuild")
    val corpus = freshCorpus()
    val builds = new java.util.concurrent.atomic.AtomicInteger()
    val spans = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val threads = (0 until 4).map { i =>
      val store = if (i % 2 == 0) a else b
      new Thread(() => { store.rebuild(corpus)(doBuild(builds, spans)); () })
    }
    threads.foreach(_.start()); threads.foreach(_.join(30000))
    import scala.jdk.CollectionConverters._
    assert(builds.get() === 4, "rebuild is unconditional — all four run")
    val sorted = spans.asScala.toSeq.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Seq((_, e1), (s2, _)) =>
        assert(e1 <= s2, "two builders held the claim at once")
      case _ => ()
    }
    // the final marker serves a complete version
    val served = a.servedVersion(corpus)
    assert(served.isDefined &&
      new java.io.File(served.get, "component.parquet").exists())
  }

  test("heartbeat keeps a long build's claim live past the timeout — no mid-build takeover") {
    val (a, b, _) = freshStore("heartbeat")
    val corpus = freshCorpus()
    val old = IndexStore.claimTimeoutMs
    IndexStore.claimTimeoutMs = 200 // build below runs 4x longer than this
    try {
      val builds = new java.util.concurrent.atomic.AtomicInteger()
      val spans = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
      def slowBuild(vd: String): Unit = {
        val t0 = System.nanoTime()
        builds.incrementAndGet()
        Thread.sleep(800) // >> claimTimeoutMs: only the heartbeat keeps it
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(vd))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(vd, "component.parquet"), "built")
        spans.add((t0, System.nanoTime())); ()
      }
      val t1 = new Thread(() => { a.rebuild(corpus)(slowBuild); () })
      t1.start()
      Thread.sleep(150) // let A win the claim and enter its long build
      val t2 = new Thread(() => { b.rebuild(corpus)(slowBuild); () })
      t2.start()
      t1.join(30000); t2.join(30000)
      import scala.jdk.CollectionConverters._
      assert(builds.get() === 2)
      val sorted = spans.asScala.toSeq.sortBy(_._1)
      assert(sorted(0)._2 <= sorted(1)._1,
        "the second builder took over a live (heartbeated) claim mid-build")
    } finally IndexStore.claimTimeoutMs = old
  }

  test("orphan claim from a crashed builder is taken over after the timeout") {
    val (a, _, _) = freshStore("takeover")
    val corpus = freshCorpus()
    val d = a.dir(corpus)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
    val orphan = java.nio.file.Paths.get(d, "_build._claim")
    java.nio.file.Files.writeString(orphan, "dead-pid:0")
    // age the claim past the (test-shrunk) timeout
    val old = IndexStore.claimTimeoutMs
    IndexStore.claimTimeoutMs = 200
    try {
      orphan.toFile.setLastModified(System.currentTimeMillis() - 1000)
      val builds = new java.util.concurrent.atomic.AtomicInteger()
      val spans = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
      val vd = a.ensure(corpus)(doBuild(builds, spans))
      assert(builds.get() === 1 && new java.io.File(vd).exists())
    } finally IndexStore.claimTimeoutMs = old
  }

  test("a live claim blocks a second builder until released") {
    val (a, _, _) = freshStore("block")
    val corpus = freshCorpus()
    val d = a.dir(corpus)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
    val claim = java.nio.file.Paths.get(d, "_build._claim")
    java.nio.file.Files.writeString(claim, "holder")
    val releaseAt = new java.util.concurrent.atomic.AtomicLong()
    val releaser = new Thread(() => {
      Thread.sleep(400)
      releaseAt.set(System.nanoTime())
      java.nio.file.Files.deleteIfExists(claim); ()
    })
    releaser.start()
    val builds = new java.util.concurrent.atomic.AtomicInteger()
    val spans = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val vd = a.ensure(corpus)(doBuild(builds, spans))
    releaser.join()
    import scala.jdk.CollectionConverters._
    val (start, _) = spans.asScala.head
    assert(start >= releaseAt.get(),
      "the build must not start while another process holds the claim")
    assert(builds.get() === 1 && new java.io.File(vd).exists())
  }
}

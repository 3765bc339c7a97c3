package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (not part of the driver
  * contract): run named declared queries under the EXACT Bench session
  * config and consumer, with
  *
  *   - a Spark job listener attributing wall time to individual jobs
  *     (the local-mode stand-in for the UI's job/stage timeline — guide
  *     §1.5/§7.1), so a query that runs N internal actions (DML plants,
  *     index builds, checkpoint materializations) shows where its seconds
  *     actually go;
  *   - `.explain("formatted")` of the returned frame written to
  *     `<outDir>/<name>.txt` (guide §7.2) for the plans/ deliverable.
  *
  * Usage: runMain graft.Prof <outDir> <query>[,query...]
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_PROF_RUNS (default 2:
  * run 1 warms, run 2 is the attributed one — mirrors Bench's median-of-3
  * posture without paying 3x).
  */
object Prof {

  private final class JobLog extends SparkListener {
    case class J(id: Int, desc: String, start: Long)
    private val open = scala.collection.concurrent.TrieMap.empty[Int, J]
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Double)]()
    override def onJobStart(e: SparkListenerJobStart): Unit = {
      val desc = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .orElse(Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))))
        .getOrElse("")
      open.put(e.jobId, J(e.jobId, desc, System.nanoTime()))
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit =
      open.remove(e.jobId).foreach { j =>
        done.add((j.id, j.desc, (System.nanoTime() - j.start) / 1e9))
      }
    def drain(): Seq[(Int, String, Double)] = {
      val b = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Double)]
      var x = done.poll()
      while (x != null) { b += x; x = done.poll() }
      b.toSeq
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Prof <outDir> <query>[,query...]")
    val outDir = args(0)
    val names = args.drop(1).flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.get("SPARK_GRAFT_PROF_RUNS").flatMap(_.toIntOption)
      .getOrElse(2)
    new java.io.File(outDir).mkdirs()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val log = new JobLog
    spark.sparkContext.addSparkListener(log)
    // Bench-identical warm-up so per-query numbers line up with the sweep.
    Seq("lineitem", "orders", "customer", "events", "documents", "embeddings")
      .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
    try Bench.consumeForProf(SparkEntry.queries("q_agg_global")(spark, sfDir))
    catch { case _: Throwable => () }
    try pipeline.VectorIndex.ensure(spark, sfDir)
    catch { case _: Throwable => () }
    try pipeline.DedupIndex.ensure(spark, sfDir)
    catch { case _: Throwable => () }
    try pipeline.TextIndex.ensure(spark, sfDir)
    catch { case _: Throwable => () }
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      var lastJobs = Seq.empty[(Int, String, Double)]
      var lastTotal = 0.0
      (1 to runs).foreach { r =>
        System.gc()
        log.drain()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val tBuild = (System.nanoTime() - t0) / 1e9
        Bench.consumeForProf(df)
        val tAll = (System.nanoTime() - t0) / 1e9
        lastJobs = log.drain()
        lastTotal = tAll
        println(f"[prof] $name run$r: total=$tAll%.3f build=$tBuild%.3f " +
          f"jobs=${lastJobs.size} jobsum=${lastJobs.map(_._3).sum}%.3f")
        if (r == runs) {
          // formatted plan of the returned frame (post-DML read plan for
          // the catalog rows; the full declared plan otherwise)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/$name.txt"), plan)
        }
      }
      lastJobs.sortBy(-_._3).take(25).foreach { case (id, desc, t) =>
        println(f"[prof]   job $id%4d ${t}%7.3f s  ${desc.take(110)}")
      }
    }
    spark.stop()
  }
}

package graft.sources

import graft.operators.Versioned
import org.apache.spark.sql.{DataFrame, Row, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.StructType

/** The versioned table as a STREAMING SOURCE — `spark.readStream
  * .format("graft.versioned").load(dir)` tails the table's commit log,
  * closing the loop that [[graft.streaming.StreamOps.versionedIngest]]
  * opened: one stream appends exactly-once INTO the table, another reads
  * exactly-once OUT of it, with the committed version number as the
  * replayable offset (the Delta streaming-source posture).
  *
  * Two start modes, exactly Delta's:
  *
  *  - DEFAULT: the first micro-batch serves the FULL chain-resolved
  *    snapshot as of the tip at stream start
  *    ([[graft.operators.Versioned.readAtDv]] — DV and append links fold
  *    in, so a history containing deletes bootstraps cleanly), then each
  *    later version streams as its changes;
  *  - `startingVersion=v`: no snapshot — every version from `v` on
  *    serves its CHANGES: an append (delta) version its `_add` rows, a
  *    materialized snapshot version its own data (the all-files-added
  *    reading of an initial or overwrite commit). `v` may exceed the
  *    current tip (tail-only consumers of future commits).
  *
  * Mid-stream non-append versions after the start point:
  *
  *  - a deletion-vector version FAILS the query unless
  *    `ignoreDeletes=true` (then it is skipped) — an append-only consumer
  *    must opt in to missing deletes;
  *  - a materialized snapshot version (overwrite / compact / restore)
  *    FAILS unless `ignoreChanges=true` (skipped): serving it would
  *    re-deliver the whole table.
  *
  * `maxVersionsPerTrigger=n` rate-limits each micro-batch to n commits
  * (backfill throttling); the default mode's initial snapshot is always
  * one batch (it is one plan, not a version range).
  *
  * Batches align to the stream's creation-time schema: a later appended
  * batch's extra columns (additive evolution, E149) are dropped and
  * missing columns null-pad, so every micro-batch has one stable schema —
  * re-create the stream to pick up a widened table.
  *
  * Offsets are plain committed version numbers (`LongOffset`), so
  * checkpoint recovery replays exactly the unprocessed version range and
  * nothing else; uncommitted claim holes are skipped by the same
  * commit-mark-authoritative rule every batch reader uses. The initial
  * snapshot is replayable too: its batch commits the then-tip as the
  * offset, and until that batch commits, recovery simply re-resolves a
  * fresh snapshot.
  */
private[sources] class VersionedStreamSource(ctx: SQLContext, dir: String,
    override val schema: StructType, params: Map[String, String])
    extends Source {

  private def opt(name: String): Option[String] =
    params.get(name.toLowerCase).orElse(params.get(name))

  /** None = default mode (initial snapshot); Some(v) = changes-from-v. */
  private val startVersion: Option[Int] = opt("startingVersion").map(_.toInt)
  private val ignoreDeletes = opt("ignoreDeletes").exists(_.toBoolean)
  private val ignoreChanges = opt("ignoreChanges").exists(_.toBoolean)
  private val maxVersionsPerTrigger: Option[Int] =
    opt("maxVersionsPerTrigger").map(_.toInt)

  // highest version already handed out via getBatch — the rate-limit
  // floor; MinValue = nothing served yet (the initial-snapshot state in
  // default mode). On checkpoint recovery the engine's first getBatch
  // carries the recovered offset, which re-seeds this.
  @volatile private var served: Long = Long.MinValue

  private def off(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong // SerializedOffset after restart
  }

  override def getOffset: Option[Offset] = {
    val tip = Versioned.latest(dir).toLong
    val floor = startVersion match {
      case _ if served != Long.MinValue => served
      case Some(sv) => sv - 1L
      case None => // default mode, snapshot not yet served: offer the
        return if (tip < 0) None else Some(LongOffset(tip)) // tip in one batch
    }
    val capped = maxVersionsPerTrigger.fold(tip)(m => math.min(tip, floor + m))
    if (capped <= floor) None else Some(LongOffset(capped))
  }

  /** Align one version's rows to the stream schema (missing → null,
    * extra → dropped).
    */
  private def align(df: DataFrame): DataFrame =
    df.select(schema.map(f =>
      (if (df.columns.contains(f.name)) col(f.name) else lit(null))
        .cast(f.dataType).as(f.name)): _*)

  /** The change rows version `v` introduced (None = skipped: claim hole,
    * or an opted-out DV/snapshot commit). A materialized version's
    * changes are its own data — self-contained, so no chain resolution.
    */
  private def changesOf(v: Int): Option[DataFrame] = {
    val s = ctx.sparkSession
    if (!Versioned.isCommitted(dir, v)) None // aborted claim hole
    else if (Versioned.isMetaVersion(dir, v))
      // no opt-out: a running stream's schema is fixed at start, and
      // null-padding a retired column (rename) or silently keeping a
      // dropped one would corrupt every later batch
      sys.error(s"graft.versioned stream: version v$v of $dir is a " +
        "column-mapping rename/drop; the stream's schema is fixed at " +
        "start. Restart the stream (optionally with startingVersion " +
        "past it) to observe the evolved schema.")
    else if (Versioned.isAddVersion(dir, v))
      Some(s.read.parquet(Versioned.addPath(dir, v)))
    else if (Versioned.isDvVersion(dir, v)) {
      if (ignoreDeletes) None
      else sys.error(s"graft.versioned stream: version v$v of $dir is a " +
        "deletion-vector commit; an append-only stream cannot serve it. " +
        "Set ignoreDeletes=true to skip delete commits, or start the " +
        "stream past them with startingVersion.")
    } else if (startVersion.contains(v)) {
      // changes-from mode serves its start version's own data whole
      Some(Versioned.readPartitionedOrFlatAt(s, dir, v))
    } else {
      if (ignoreChanges) None
      else sys.error(s"graft.versioned stream: version v$v of $dir is a " +
        "materialized snapshot commit (overwrite/compact/restore); " +
        "serving it would re-deliver the table. Set ignoreChanges=true " +
        "to skip snapshot commits, or restart from it with " +
        "startingVersion.")
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val hi = off(end)
    val snapshotBatch = start.isEmpty && startVersion.isEmpty
    val lo = start.map(off).getOrElse(
      startVersion.map(_ - 1L).getOrElse(hi)) // snapshot batch: no range
    served = math.max(if (served == Long.MinValue) hi else served, hi)
    val frames =
      if (snapshotBatch)
        Seq(Versioned.readAtDv(ctx.sparkSession, dir, hi.toInt))
      else ((lo + 1) to hi).flatMap(w => changesOf(w.toInt))
    val batch =
      if (frames.isEmpty)
        ctx.sparkSession.createDataFrame(
          ctx.sparkSession.sparkContext.emptyRDD[Row], schema)
      else frames.map(align).reduce(_ unionByName _)
    org.apache.spark.sql.graftshim.StreamingBridge.asStreaming(batch)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String =
    s"VersionedStreamSource[$dir, " +
      startVersion.fold("snapshot")(v => s"changes-from=v$v") + "]"
}

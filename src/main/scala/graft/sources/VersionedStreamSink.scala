package graft.sources

import graft.operators.Versioned
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.graftbridge.ColumnBridge

/** The versioned table as a STREAMING SINK — `df.writeStream
  * .format("graft.versioned").start(dir)` — the thin v1 `Sink` face over
  * the exactly-once machinery [[graft.streaming.StreamOps.versionedIngest]]
  * already drives through `foreachBatch` (E148): every micro-batch lands
  * as ONE append (delta) commit — cost ∝ batch rows, never table size —
  * and a crash-replayed batch id is recognized by its committed
  * `_batchid` marker and skipped, so the checkpoint + marker pair gives
  * end-to-end exactly-once. With this class the loop the streaming
  * SOURCE ([[VersionedStreamSource]]) opened closes symmetrically: one
  * stream writes exactly-once INTO the table with `writeStream.format`,
  * another reads exactly-once OUT of it with `readStream.format`, no
  * `foreachBatch` escape hatch required on either side.
  *
  * Expectation gates (E150) ride in as options — one
  * `expectation.<name>` option per gate, each a SQL boolean predicate:
  *
  * {{{
  *   df.writeStream.format("graft.versioned")
  *     .option("checkpointLocation", ckpt)
  *     .option("expectation.nonneg_bal", "bal >= 0")
  *     .start(dir)
  * }}}
  *
  * routes rejects to the `_quarantine` sidecar tagged with the violated
  * gate names and the commit version, exactly like
  * [[graft.streaming.StreamOps.versionedIngestExpect]] (whose per-batch
  * body this sink shares — `ingestExpectBatch`). Option keys arrive
  * case-normalized from the DataSource options map, so gate names are
  * matched (and recorded) lowercase.
  *
  * The batch frame a v1 sink receives is wired to the in-flight
  * incremental execution; it is re-bound to a standalone plan over the
  * same internal rows (`ColumnBridge.stableBatch` — the ForeachBatchSink
  * rebinding) before the parquet write re-executes it.
  */
private[graft] class VersionedStreamSink(dir: String,
    expectations: Seq[(String, String)]) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val batch = ColumnBridge.stableBatch(data)
    if (expectations.isEmpty) {
      Versioned.appendBatchIdempotent(batch, dir, batchId)
      ()
    } else graft.streaming.StreamOps.ingestExpectBatch(batch, dir, batchId,
      expectations.map { case (n, sql) => n -> expr(sql) })
  }

  override def toString: String = s"VersionedStreamSink[$dir]"
}

package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** SQL-visible reader for [[graft.operators.Versioned]] tables — the
  * catalog surface a lakehouse tier needs beyond the programmatic API
  * (reference parity note: the reference exposes its storage through the
  * Hive catalog, `AvroFromXmlSerde.scala:13`; here the versioned store
  * registers as a Spark data source the same way the XML side does,
  * `graft.xml.DefaultSource`):
  *
  * {{{
  *   spark.read.format("graft.versioned").load(dir)                  // latest
  *   spark.read.format("graft.versioned")
  *     .option("versionAsOf", 1).load(dir)                           // time travel
  *   spark.read.format("graft.versioned")
  *     .option("changesFrom", 0).option("changesTo", 2)
  *     .option("key", "k").option("compareCols", "a,b").load(dir)    // CDC
  *   // DDL (SQL-visible):
  *   //   CREATE TEMPORARY VIEW t USING `graft.versioned`
  *   //   OPTIONS (path '<dir>', versionAsOf '1')
  *   df.write.format("graft.versioned").mode("append").save(dir)
  *   //   → one append (delta) commit of df's rows (cost ∝ batch;
  *   //     existing rows survive through the chain fold)
  *   df.write.format("graft.versioned").mode("overwrite").save(dir)
  *   //   → commits df as the next full snapshot (history retained)
  *   // INSERT INTO t ... appends; INSERT OVERWRITE TABLE t ... replaces
  *   df.writeStream.format("graft.versioned")
  *     .option("checkpointLocation", ckpt).start(dir)
  *   //   → exactly-once streaming sink: one append commit per batch
  *   //     (optional expectation.<name> gates, see VersionedStreamSink)
  * }}}
  *
  * Snapshot reads resolve through [[graft.operators.Versioned.readAtDv]],
  * which uniformly serves flat, partition-manifest, and deletion-vector
  * histories (a DV chain anti-joins on top of its nearest materialized
  * base; a `_manifest` base stitches per-owner pruned scans).
  *
  * Scale shape: the relation delegates to the SAME DataFrame plans the
  * programmatic API builds, with requested columns and translatable
  * filters applied to the delegate BEFORE execution — so column pruning
  * and predicate pushdown reach the underlying parquet scans (the inner
  * plan's `PushedFilters`/`ReadSchema`), and `needConversion = false`
  * hands Spark the delegate's internal rows without a per-row
  * Row↔InternalRow round trip. Untranslated filters are simply not
  * pushed; Spark re-evaluates every filter above the scan (the default
  * `unhandledFilters` contract), so pushdown is an optimization, never a
  * correctness dependency.
  */
class VersionedSource extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister
    with StreamSourceProvider with StreamSinkProvider {
  override def shortName(): String = "graft.versioned"

  // ---- streaming sink (see [[VersionedStreamSink]]) ----------------------

  override def createSink(ctx: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    val dir = VersionedSource.normPath(opt(parameters, "path").getOrElse(
      sys.error("graft.versioned requires a 'path' (or .start(dir))")))
    require(outputMode == org.apache.spark.sql.streaming.OutputMode.Append(),
      s"graft.versioned sink: only Append output mode is supported " +
        s"(each micro-batch is one append commit), got $outputMode")
    require(partitionColumns.isEmpty,
      "graft.versioned sink: partitionBy is not supported — appends land " +
        "as flat delta commits; use hidden partitioning on the table")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val expectations = parameters.toSeq.collect {
      case (k, v) if k.toLowerCase.startsWith("expectation.") =>
        k.toLowerCase.stripPrefix("expectation.") -> v
    }.sortBy(_._1)
    new VersionedStreamSink(dir, expectations)
  }

  // ---- streaming source (see [[VersionedStreamSource]]) -----------------

  private def opt(parameters: Map[String, String], name: String) =
    parameters.get(name.toLowerCase).orElse(parameters.get(name))

  private def streamSchema(ctx: SQLContext, schema: Option[StructType],
      parameters: Map[String, String]): StructType =
    schema.getOrElse {
      val dir = VersionedSource.normPath(opt(parameters, "path").getOrElse(
        sys.error("graft.versioned requires a 'path' (or .load(dir))")))
      val tip = graft.operators.Versioned.latest(dir)
      require(tip >= 0, s"graft.versioned stream: $dir has no committed " +
        "versions — commit an initial version or supply .schema(...)")
      graft.operators.Versioned.readAtDv(ctx.sparkSession, dir, tip).schema
    }

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), streamSchema(ctx, schema, parameters))

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): org.apache.spark.sql.execution.streaming.Source = {
    val dir = VersionedSource.normPath(opt(parameters, "path").getOrElse(
      sys.error("graft.versioned requires a 'path' (or .load(dir))")))
    val tip = graft.operators.Versioned.latest(dir)
    opt(parameters, "startingVersion").map(_.toInt).foreach { sv =>
      require(sv > tip || graft.operators.Versioned.isCommitted(dir, sv),
        s"graft.versioned stream: startingVersion v$sv of $dir is an " +
          "uncommitted hole — the initial snapshot batch must be a " +
          "committed version")
    }
    new VersionedStreamSource(ctx, dir,
      streamSchema(ctx, schema, parameters), parameters)
  }

  override def createRelation(ctx: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val dir = VersionedSource.normPath(parameters.getOrElse("path",
      sys.error("graft.versioned requires a 'path' (or .load(dir))")))
    new VersionedRelation(ctx, dir, parameters)
  }

  /** Write path: every save COMMITS a new immutable version through the
    * claim/seal protocol, and overwrite never truncates history (the
    * lakehouse posture: old versions stay time-travelable until
    * [[graft.operators.Versioned.vacuum]]):
    *
    *  - `Append` lands the new rows as an append (DELTA) commit — cost
    *    ∝ batch, existing rows survive through the read-side chain fold
    *    (the SQL append contract); on an empty table it is the initial
    *    commit;
    *  - `Overwrite` commits the new rows as the complete next snapshot;
    *  - `ErrorIfExists` refuses when the table already has a committed
    *    version; `Ignore` is then a no-op.
    */
  override def createRelation(ctx: SQLContext,
      mode: org.apache.spark.sql.SaveMode,
      parameters: Map[String, String],
      data: DataFrame): BaseRelation = {
    import org.apache.spark.sql.SaveMode
    val dir = VersionedSource.normPath(parameters.getOrElse("path",
      sys.error("graft.versioned requires a 'path' (or .save(dir))")))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    // The whole mode dispatch serializes under the RMW mutator claim:
    // Append derives its commit from the tip (read latest ∪ new rows), so
    // two claim-free concurrent INSERTs could both read v_N and the later
    // seal would silently drop the earlier writer's rows — the exact
    // lost-update class `Versioned.withMutateClaim` exists for. The
    // exists-check itself is a check-then-act (ErrorIfExists/Ignore/the
    // initial-commit branch), so it rides inside the claim too.
    graft.operators.Versioned.withMutateClaim(dir) {
      val exists = graft.operators.Versioned.latest(dir) >= 0
      mode match {
        case SaveMode.ErrorIfExists if exists =>
          sys.error(s"graft.versioned: $dir already has committed versions")
        case SaveMode.Ignore if exists => ()
        case SaveMode.Append if exists =>
          VersionedSource.commitAppend(ctx, dir, data)
        case _ => graft.operators.Versioned.commit(data, dir); ()
      }
    }
    new VersionedRelation(ctx, dir, parameters - "versionAsOf")
  }
}

private[sources] object VersionedSource {
  /** Accept `file:` URI spellings of a local path (the form Spark's
    * catalog-table streaming fallback derives from `CatalogTable
    * .location` — see [[GraftTable.v1Table]]) alongside plain paths.
    */
  def normPath(p: String): String =
    if (p.startsWith("file:"))
      java.nio.file.Paths.get(java.net.URI.create(p)).toString
    else p

  /** Best-effort v1-Filter → Column translation for pushdown into a
    * delegate plan. None = not translatable; the filter is skipped and
    * still applied by Spark above the scan (the default
    * `unhandledFilters` contract, so pushdown is an optimization, never
    * a correctness dependency). Shared by the v1 relation and the DSv2
    * catalog table ([[GraftCatalog]]).
    */
  def filterToColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case And(l, r) =>
      for { lc <- filterToColumn(l); rc <- filterToColumn(r) } yield lc && rc
    case Or(l, r) =>
      for { lc <- filterToColumn(l); rc <- filterToColumn(r) } yield lc || rc
    case Not(c) => filterToColumn(c).map(!_)
    case _ => None
  }
  /** Append = an APPEND (delta) commit of only the new rows
    * ([[graft.operators.Versioned.appendRows]]) — cost ∝ batch, never
    * table size. The earlier spelling committed `readAtDv(latest) ∪ data`
    * as a full snapshot: O(table) I/O per `df.write.mode("append")` /
    * `INSERT INTO`, which rewrites a 100 TB table per micro-batch — the
    * exact shape the delta primitive exists to kill.
    *
    * Schema contract (fail-loud, the SQL append posture): the batch must
    * UNION cleanly with the tip snapshot — `unionByName` is analyzed
    * (driver-side only, no job runs) so a missing/extra column or an
    * un-coercible type raises here, exactly as the snapshot spelling did.
    * Coercible type widening (int batch into a long column) is absorbed
    * by the read-side fold the same way programmatic `appendRows` batches
    * are. Widening with NEW columns stays programmatic-only — SQL appends
    * never silently evolve the schema.
    *
    * Still claim-serialized (re-entrant under the SaveMode dispatch):
    * the schema gate reads the tip, and the empty-table/ErrorIfExists
    * branches in the dispatch are check-then-act against it.
    */
  def commitAppend(ctx: SQLContext, dir: String, data: DataFrame): Unit =
    graft.operators.Versioned.withMutateClaim(dir) {
      val cur = graft.operators.Versioned.readAtDv(ctx.sparkSession, dir,
        graft.operators.Versioned.latest(dir))
      cur.unionByName(data).schema // analysis-only schema gate (no job)
      graft.operators.Versioned.appendRows(data, dir)
      ()
    }
}

private[sources] class VersionedRelation(ctx: SQLContext, dir: String,
    params: Map[String, String]) extends BaseRelation
    with PrunedFilteredScan with InsertableRelation {

  import graft.operators.Versioned

  private def intOpt(name: String): Option[Int] = params.get(name).map { v =>
    v.toIntOption.getOrElse(
      sys.error(s"graft.versioned: option '$name' must be an int, got '$v'"))
  }

  /** The snapshot version this relation serves — None in CDC mode.
    * Shared by the delegate plan and [[sizeInBytes]], so stats always
    * size exactly the version being read.
    */
  private lazy val servedVersion: Option[Int] =
    if (intOpt("changesFrom").isDefined) None
    else {
      // versionAsOf: an integer version, or a named tag (E200)
      val asOf = params.get("versionAsOf").map { v =>
        v.toIntOption.orElse(Versioned.tagVersion(dir, v)).getOrElse(
          sys.error(s"graft.versioned: versionAsOf '$v' matches neither " +
            "an integer version nor a tag of this table"))
      }
      require(asOf.isEmpty || params.get("timestampAsOf").isEmpty,
        "graft.versioned: give versionAsOf OR timestampAsOf, not both")
      Some(asOf
        .orElse(params.get("timestampAsOf").map(t =>
          Versioned.versionAtTime(dir, parseTs(t))))
        .getOrElse(Versioned.latest(dir)))
    }

  private lazy val delegate: DataFrame = servedVersion match {
    case None =>
      val v0 = intOpt("changesFrom").get
      val key = params.getOrElse("key",
        sys.error("graft.versioned: CDC reads require the 'key' option"))
      val compare = params.get("compareCols")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(sys.error(
          "graft.versioned: CDC reads require 'compareCols' (comma-separated)"))
      Versioned.changes(ctx.sparkSession, dir, v0,
        intOpt("changesTo").getOrElse(Versioned.latest(dir)), key, compare)
    case Some(v) =>
      Versioned.readAtDv(ctx.sparkSession, dir, v)
  }

  /** `timestampAsOf` accepts epoch millis, an ISO-8601 instant, or the
    * SQL `yyyy-mm-dd hh:mm:ss[.f...]` timestamp spelling.
    */
  private def parseTs(s0: String): Long = {
    val t = s0.trim
    t.toLongOption.getOrElse(
      try java.time.Instant.parse(t).toEpochMilli
      catch {
        case _: java.time.format.DateTimeParseException =>
          java.sql.Timestamp.valueOf(t).getTime
      })
  }

  override def sqlContext: SQLContext = ctx
  override def schema: StructType = delegate.schema
  // rows handed back are the delegate plan's InternalRows (see class doc)
  override def needConversion: Boolean = false

  /** Real size estimate instead of the BaseRelation default
    * (`spark.sql.defaultSizeInBytes` = effectively infinite): summed
    * data-file lengths of the served version's chain, a driver-side
    * listing. This is what lets Catalyst BROADCAST a small versioned
    * dimension table in a join against a big fact — with the default, a
    * 1 MB versioned table would sort-merge-join forever. CDC reads keep
    * the default (their output is churn-sized but derived from two
    * snapshots; over-claiming smallness there could broadcast wrongly).
    */
  override lazy val sizeInBytes: Long = servedVersion match {
    case None => super.sizeInBytes // CDC: churn-sized, don't over-claim
    case Some(v) =>
      val b = Versioned.approxDataBytes(dir, v)
      if (b <= 0L) super.sizeInBytes else b
  }

  private def toColumn(f: Filter): Option[Column] =
    VersionedSource.filterToColumn(f)

  /** `INSERT INTO <view>` over the DDL surface: plain INSERT appends
    * (one DELTA commit of the new rows, cost ∝ batch — existing rows
    * survive through the chain fold, the SQL contract); `INSERT
    * OVERWRITE` commits the new rows as the complete next snapshot.
    * History stays time-travelable either way. The view keeps serving
    * the version it resolved at creation; re-create it (or read without
    * `versionAsOf`) to see the new commit.
    */
  override def insert(data: DataFrame, overwrite: Boolean): Unit =
    // claim-serialized: the empty-table check and the tip-deriving append
    // are a read-modify-write against the tip (see commitAppend)
    graft.operators.Versioned.withMutateClaim(dir) {
      if (overwrite || graft.operators.Versioned.latest(dir) < 0) {
        graft.operators.Versioned.commit(data, dir); ()
      } else VersionedSource.commitAppend(ctx, dir, data)
    }

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    // hidden-partition pruning (E193), same driver-side prune as the v2
    // catalog scan — this is what lets [[VersionedScanStats]] reroute
    // hidden-partitioned catalog reads here without losing pruning (real
    // statistics AND pruned scans on one read path). Skipped when the
    // request names the derived key itself (the pruned read drops it) or
    // in CDC mode; fallback records "full" so the probe always reflects
    // the scan that ran.
    val base = servedVersion match {
      case Some(v) if !requiredColumns.contains("gpart") =>
        AddSkip.composedRead(ctx.sparkSession, dir, v, delegate.schema,
          filters.toIndexedSeq)(delegate)
      case _ => delegate
    }
    val filtered = filters.flatMap(toColumn)
      .foldLeft(base)((df, c) => df.filter(c))
    // always project to exactly the requested columns — an empty request
    // (count(*)) becomes a zero-column projection, as the contract expects
    val pruned = filtered.select(requiredColumns.map(col).toIndexedSeq: _*)
    // needConversion = false: Spark consumes these as InternalRow
    pruned.queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }
}

package graft.sources

import graft.operators.Versioned
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The `CALL` maintenance surface of [[GraftCatalog]] — SQL-visible table
  * procedures in the `system` namespace (the Iceberg
  * `CALL cat.system.<proc>(...)` posture), each a thin face over the
  * programmatic [[Versioned]] op and each returning its metadata-scale
  * result as a driver-local scan (`LocalScan` — no job, no shuffle;
  * the outputs are version numbers and per-version summaries):
  *
  * {{{
  *   CALL graft_cat.system.history('ns.t')          -- DESCRIBE HISTORY rows
  *   CALL graft_cat.system.vacuum('ns.t', 2)        -- retention sweep
  *   CALL graft_cat.system.optimize('ns.t')         -- selective OPTIMIZE
  *   CALL graft_cat.system.compact_dv('ns.t')       -- fold the DV chain
  *   CALL graft_cat.system.restore('ns.t', 0)       -- roll back the tip
  *   CALL graft_cat.system.clone_table('ns.t', 'ns.t2')  -- shallow clone
  *   CALL graft_cat.system.zorder('ns.t', 'a', 'b', 64)  -- OPTIMIZE ZORDER
  *   CALL graft_cat.system.tag('ns.t', 'stable', 3)      -- named version ref
  *   CALL graft_cat.system.untag('ns.t', 'stable')       -- drop the ref
  *   CALL graft_cat.system.tags('ns.t')                  -- list refs
  * }}}
  *
  * Spark's `InvokeProcedures` rule runs the bound procedure and turns the
  * returned scan into rows; the mutating procedures are declared
  * non-deterministic so no rule ever re-invokes them. Concurrency is the
  * underlying op's: optimize/compact_dv/restore hold the mutator claim,
  * vacuum is the documented retention contract, clone claims its own
  * number in the target.
  */
private[sources] object GraftProcedures {

  private def s(v: String) = UTF8String.fromString(v)

  /** (name, parameters, output schema, deterministic, body). The body's
    * resolver maps `'ns.t'` → dir and THROWS NoSuchTableException when
    * `mustExist` (every argument except clone_table's target) — a typo'd
    * identifier must fail like loadTable does, never "succeed" on an
    * empty dir.
    */
  private case class Spec(name: String, params: Seq[ProcedureParameter],
      out: StructType, deterministic: Boolean,
      body: (SparkSession, (String, Boolean) => String, InternalRow)
        => Seq[InternalRow])

  private def tbl(name: String = "table") =
    ProcedureParameter.in(name, StringType)
      .comment("table identifier under this catalog, e.g. 'ns.t'").build()

  private val versionOut =
    StructType(Seq(StructField("version", IntegerType, nullable = false)))

  private val specs: Seq[Spec] = Seq(
    Spec("history", Seq(tbl()),
      StructType(Seq(
        StructField("version", IntegerType, nullable = false),
        StructField("kind", StringType, nullable = false),
        StructField("n_rows", LongType, nullable = false))),
      deterministic = true,
      (spark, dirOf, in) =>
        Versioned.history(spark, dirOf(in.getUTF8String(0).toString, true))
          .collect().toSeq.map(r => new GenericInternalRow(
            Array[Any](r.getInt(0), s(r.getString(1)), r.getLong(2))))),

    Spec("vacuum", Seq(tbl(),
      ProcedureParameter.in("keep_last", IntegerType)
        .comment("number of newest versions to retain").build()),
      StructType(Seq(
        StructField("tip", IntegerType, nullable = false),
        StructField("removed_versions", IntegerType, nullable = false))),
      deterministic = false,
      (spark, dirOf, in) => {
        val dir = dirOf(in.getUTF8String(0).toString, true)
        def committed() = (0 to Versioned.latest(dir))
          .count(Versioned.isCommitted(dir, _))
        val before = committed()
        Versioned.vacuum(dir, in.getInt(1))
        Seq(new GenericInternalRow(
          Array[Any](Versioned.latest(dir), before - committed())))
      }),

    Spec("optimize", Seq(tbl()), versionOut, deterministic = false,
      (spark, dirOf, in) => Seq(new GenericInternalRow(Array[Any](
        Versioned.optimizeScattered(spark,
          dirOf(in.getUTF8String(0).toString, true)))))),

    Spec("compact_dv", Seq(tbl()), versionOut, deterministic = false,
      (spark, dirOf, in) => {
        val dir = dirOf(in.getUTF8String(0).toString, true)
        // hidden-partitioned tables (E193) re-partition on compaction:
        // delta appends land flat, so folding them back under the
        // declared transform is what restores pruning coverage
        val props = GraftCatalog.readProps(dir)
        val v = (props.get("gpart.transform"),
            props.get("gpart.column")) match {
          case (Some(t), Some(c)) => Versioned.compactHidden(spark, dir, t, c)
          case _ => Versioned.compactDv(spark, dir)
        }
        Seq(new GenericInternalRow(Array[Any](v)))
      }),

    Spec("restore", Seq(tbl(),
      ProcedureParameter.in("version", IntegerType)
        .comment("committed version to restore as the new tip").build()),
      versionOut, deterministic = false,
      (spark, dirOf, in) => Seq(new GenericInternalRow(Array[Any](
        Versioned.restore(spark, dirOf(in.getUTF8String(0).toString, true),
          in.getInt(1)))))),

    Spec("zorder", Seq(tbl(),
      ProcedureParameter.in("col_a", StringType)
        .comment("first clustering column (non-negative integral)").build(),
      ProcedureParameter.in("col_b", StringType)
        .comment("second clustering column (non-negative integral)").build(),
      ProcedureParameter.in("buckets", IntegerType)
        .comment("max partition count for the z-bucketed layout").build()),
      versionOut, deterministic = false,
      (spark, dirOf, in) => {
        val dir = dirOf(in.getUTF8String(0).toString, true)
        // a table with DECLARED hidden partitioning owns its layout: the
        // next compact/overwrite would silently restore the transform
        // layout and discard this one — refuse instead of racing it
        val props = GraftCatalog.readProps(dir)
        require(!props.contains("gpart.transform"),
          s"zorder: the table declares PARTITIONED BY hidden " +
            "partitioning, which owns its layout — zorder applies to " +
            "unpartitioned/stats-tier tables")
        Seq(new GenericInternalRow(Array[Any](
          Versioned.zorderLayout(spark, dir,
            in.getUTF8String(1).toString, in.getUTF8String(2).toString,
            in.getInt(3)))))
      }),

    Spec("clone_table", Seq(tbl("source"), tbl("target")), versionOut,
      deterministic = false,
      (spark, dirOf, in) => {
        val src = dirOf(in.getUTF8String(0).toString, true)
        val dst = dirOf(in.getUTF8String(1).toString, false)
        val v = Versioned.cloneShallow(spark, src, dst)
        // a clone carries the source's TBLPROPERTIES (the Delta shallow-
        // clone contract) — most importantly 'key', without which DV
        // deletes on the clone would silently degrade to table rewrites
        GraftCatalog.writeProps(dst, GraftCatalog.readProps(src))
        Seq(new GenericInternalRow(Array[Any](v)))
      }),

    // E200: named version tags — `CALL cat.system.tag('ns.t', 'stable',
    // 3)` pins a name to a committed version; `VERSION AS OF 'stable'`
    // resolves through it and vacuum never severs a tagged snapshot's
    // chain. Re-tagging MOVES the name; untag releases the pin.
    Spec("tag", Seq(tbl(),
      ProcedureParameter.in("name", StringType)
        .comment("tag name (non-integer; integers are version literals)")
        .build(),
      ProcedureParameter.in("version", IntegerType)
        .comment("committed version to pin").build()),
      versionOut, deterministic = false,
      (spark, dirOf, in) => {
        val dir = dirOf(in.getUTF8String(0).toString, true)
        val v = in.getInt(2)
        Versioned.tag(dir, in.getUTF8String(1).toString, v)
        Seq(new GenericInternalRow(Array[Any](v)))
      }),

    Spec("untag", Seq(tbl(),
      ProcedureParameter.in("name", StringType)
        .comment("tag name to drop").build()),
      versionOut, deterministic = false,
      (spark, dirOf, in) => {
        val dir = dirOf(in.getUTF8String(0).toString, true)
        val name = in.getUTF8String(1).toString
        val v = Versioned.untag(dir, name).getOrElse(sys.error(
          s"untag: no tag '$name' on this table"))
        Seq(new GenericInternalRow(Array[Any](v)))
      }),

    Spec("tags", Seq(tbl()),
      StructType(Seq(
        StructField("name", StringType, nullable = false),
        StructField("version", IntegerType, nullable = false))),
      deterministic = false,
      (spark, dirOf, in) => {
        val dir = dirOf(in.getUTF8String(0).toString, true)
        Versioned.tags(dir).toSeq.sorted.map { case (n, v) =>
          new GenericInternalRow(Array[Any](s(n), v))
        }
      }))

  private val byName: Map[String, Spec] =
    specs.map(sp => sp.name -> sp).toMap

  def names: Array[Identifier] =
    specs.map(sp => Identifier.of(Array("system"), sp.name)).toArray

  /** Resolve `ident` (must be `system.<name>`) to an UnboundProcedure
    * whose bound form runs against tables under `dirOf`.
    */
  def load(ident: Identifier, spark: => SparkSession,
      dirOf: (String, Boolean) => String): Option[UnboundProcedure] =
    if (!(ident.namespace sameElements Array("system"))) None
    else byName.get(ident.name).map { sp =>
      new UnboundProcedure {
        override def name(): String = sp.name
        override def description(): String =
          s"graft versioned-table maintenance: ${sp.name}"
        override def bind(inputType: StructType): BoundProcedure =
          new BoundProcedure {
            override def name(): String = sp.name
            override def description(): String =
              s"graft versioned-table maintenance: ${sp.name}"
            override def parameters(): Array[ProcedureParameter] =
              sp.params.toArray
            override def isDeterministic: Boolean = sp.deterministic
            override def call(input: InternalRow)
                : java.util.Iterator[Scan] =
              java.util.List.of[Scan](new LocalScan {
                private val result = sp.body(spark, dirOf, input).toArray
                override def rows(): Array[InternalRow] = result
                override def readSchema(): StructType = sp.out
                override def description(): String =
                  s"GraftProcedure[${sp.name}]"
              }).iterator()
          }
      }
    }
}

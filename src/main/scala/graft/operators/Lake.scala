package graft.operators

import graft.{Q, Tables => T}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lake-maintenance DML shapes (SURVEY.md §2 extension rows): MERGE/upsert
  * and snapshot diff — the two operations every incremental table pipeline
  * runs daily, spelled as plain joins so they work on any parquet directory
  * (no table-format dependency) and Catalyst picks the physical join.
  *
  * Scale shapes: both ops are ONE full outer join keyed on the primary key —
  * one shuffle per side (or co-located via bucketing, see
  * [[Layout.writeBucketed]]); a small delta side broadcasts under AQE. No
  * driver-side state, no collect.
  */
object Lake {

  /** MERGE INTO (upsert): `updates` rows replace same-key `target` rows,
    * new-key rows append. Column lists must match. Row count =
    * |target keys ∪ update keys|.
    *
    * PRECONDITION: non-null `updates` keys must be unique — like SQL
    * `MERGE INTO`, which raises when a target row matches multiple source
    * rows. Enforced in-plan (a per-key count over the updates side feeds a
    * `raise_error` guard), so a duplicate-keyed delta fails loudly instead
    * of silently fanning each matched target row out once per same-key
    * update. Null-key rows are exempt: they never equi-join and each
    * surfaces as its own insert by design.
    */
  def mergeUpsert(target: DataFrame, updates: DataFrame,
      key: String): DataFrame = {
    val cols = target.columns
    val kcnt = org.apache.spark.sql.expressions.Window.partitionBy(col("u_" + key))
    val t = target.select(cols.map(c => col(c).as("t_" + c)): _*)
    val u = updates.select(cols.map(c => col(c).as("u_" + c)): _*)
      // side-presence FLAG, not a key-null test: a null-KEY update row
      // never equi-joins (SQL null semantics) and must surface as its own
      // inserted row, not collapse into an all-null one
      .withColumn("_u_present",
        when(col("u_" + key).isNotNull && count(lit(1)).over(kcnt) > 1,
          raise_error(concat(lit(s"mergeUpsert: duplicate update key $key="),
            col("u_" + key).cast("string"))).isNull)
          .otherwise(lit(true)))
    // WHEN MATCHED (or insert-only) take the update row WHOLE — so an
    // update may legitimately set a column (even the key) to null.
    t.join(u, t("t_" + key) === u("u_" + key), "full")
      .select(cols.map(c =>
        when(col("_u_present"), col("u_" + c))
          .otherwise(col("t_" + c)).as(c)): _*)
  }

  /** Full MERGE INTO / CDC-apply: `changes` carries the target's columns
    * plus an op column ∈ {"upsert", "delete"} — the shape a change feed
    * delivers. Semantics per key:
    *
    *  - matched + delete  → target row removed
    *  - matched + upsert  → update row taken WHOLE (mergeUpsert contract)
    *  - unmatched + upsert → inserted
    *  - unmatched + delete → no-op (idempotent deletes, the CDC norm)
    *
    * The [[mergeUpsert]] duplicate-key raise applies across ALL change
    * rows of a key regardless of op — SQL MERGE's multi-match error, so a
    * feed carrying both a delete and an upsert for one key fails loudly
    * instead of resolving by luck. Same scale shape: one full outer join
    * on the key.
    */
  def applyChanges(target: DataFrame, changes: DataFrame, key: String,
      opCol: String = "op"): DataFrame = {
    val cols = target.columns
    val kcnt = org.apache.spark.sql.expressions.Window.partitionBy(col("u_" + key))
    val t = target.select(cols.map(c => col(c).as("t_" + c)): _*)
    val u = changes.select((cols.map(c => col(c).as("u_" + c)) :+
        col(opCol).as("_u_op")): _*)
      .withColumn("_u_present",
        when(col("u_" + key).isNotNull && count(lit(1)).over(kcnt) > 1,
          raise_error(concat(lit(s"applyChanges: duplicate change key $key="),
            col("u_" + key).cast("string"))).isNull)
          .otherwise(lit(true)))
    t.join(u, t("t_" + key) === u("u_" + key), "full")
      // delete rows vanish whether they matched (target row removed) or
      // not (idempotent no-op); everything else is the upsert resolution
      .filter(coalesce(col("_u_op") =!= "delete", lit(true)))
      .select(cols.map(c =>
        when(col("_u_present"), col("u_" + c))
          .otherwise(col("t_" + c)).as(c)): _*)
  }

  // ---- multi-clause conditional MERGE -------------------------------------

  /** One WHEN clause of [[mergeConditional]]. Clause conditions and
    * SET / VALUES expressions reference the two join sides through
    * [[tcol]] (target) and [[scol]] (source); a clause with no condition
    * always fires for its branch. Clauses are evaluated IN ORDER and the
    * first whose condition holds wins — the SQL/Delta MERGE clause-order
    * contract.
    */
  sealed trait MergeAction { def cond: Option[Column] }

  /** WHEN [NOT] MATCHED [BY SOURCE] ... THEN UPDATE SET: columns named in
    * `set` take their expression; every other column keeps its target
    * value.
    */
  final case class MergeUpdate(set: Map[String, Column],
      cond: Option[Column] = None) extends MergeAction

  /** WHEN MATCHED / WHEN NOT MATCHED BY SOURCE ... THEN DELETE. */
  final case class MergeDelete(cond: Option[Column] = None) extends MergeAction

  /** WHEN NOT MATCHED ... THEN INSERT: columns named in `values` take
    * their expression; unnamed columns insert as typed nulls.
    */
  final case class MergeInsert(values: Map[String, Column],
      cond: Option[Column] = None) extends MergeAction

  /** Target-side column reference inside a [[mergeConditional]] clause. */
  def tcol(c: String): Column = col("__t_" + c)

  /** Source-side column reference inside a [[mergeConditional]] clause. */
  def scol(c: String): Column = col("__s_" + c)

  /** Multi-clause conditional MERGE INTO — the full SQL:2003 /
    * Delta-`whenMatched(cond)` surface that [[mergeUpsert]] (one
    * unconditional whole-row upsert) and [[applyChanges]] (op-column CDC)
    * don't cover: per-clause predicates over BOTH sides, column-level SET
    * expressions, conditional inserts, and `WHEN NOT MATCHED BY SOURCE`
    * update/delete over target-only rows. Per row:
    *
    *  - MATCHED (key in both): the first `whenMatched` clause whose
    *    condition holds applies ([[MergeUpdate]] rewrites its SET columns,
    *    [[MergeDelete]] drops the row); none → target row kept unchanged;
    *  - NOT MATCHED (source-only): the first firing [[MergeInsert]]
    *    inserts; none → the source row is ignored;
    *  - NOT MATCHED BY SOURCE (target-only): the first firing clause
    *    updates/deletes; none → kept. A null-KEY source row never
    *    equi-joins (SQL null semantics) and resolves as source-only.
    *
    * Duplicate non-null source keys raise in-plan (the SQL MERGE
    * multi-match error, the [[mergeUpsert]] guard). Scale shape: ONE full
    * outer equi-join on the key (the source side broadcasts under AQE
    * when small); clause resolution is a single integer `CASE` column and
    * per-column `CASE` chains — all codegen'd projections, no second
    * join, no window over data, no driver state.
    */
  def mergeConditional(target: DataFrame, source: DataFrame, key: String,
      whenMatched: Seq[MergeAction] = Nil,
      whenNotMatched: Seq[MergeInsert] = Nil,
      whenNotMatchedBySource: Seq[MergeAction] = Nil): DataFrame = {
    require(whenMatched.forall(!_.isInstanceOf[MergeInsert]),
      "mergeConditional: whenMatched clauses must be update/delete")
    require(whenNotMatchedBySource.forall(!_.isInstanceOf[MergeInsert]),
      "mergeConditional: whenNotMatchedBySource clauses must be update/delete")
    val cols = target.columns
    require(source.columns.contains(key),
      s"mergeConditional: source must carry the key column $key")
    val kcnt = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__s_" + key))
    val t = target.select(cols.map(c => col(c).as("__t_" + c)): _*)
      .withColumn("__t_present", lit(true))
    val s = source.select(
        source.columns.map(c => col(c).as("__s_" + c)): _*)
      .withColumn("__s_present",
        when(col("__s_" + key).isNotNull && count(lit(1)).over(kcnt) > 1,
          raise_error(concat(lit(s"mergeConditional: duplicate source key " +
            s"$key="), col("__s_" + key).cast("string"))).isNull)
          .otherwise(lit(true)))
    // first-true-wins clause index per branch: matched → 100+i,
    // source-only inserts → 200+i, target-only → 300+i; −1 = keep the
    // target row untouched, −2 = unmatched source row with no insert
    def firstOf(clauses: Seq[MergeAction], base: Int, default: Int): Column =
      clauses.zipWithIndex.reverse.foldLeft(lit(default)) {
        case (els, (a, i)) =>
          when(a.cond.getOrElse(lit(true)), lit(base + i)).otherwise(els)
      }
    val act =
      when(coalesce(col("__t_present"), lit(false)) &&
          coalesce(col("__s_present"), lit(false)),
        firstOf(whenMatched, 100, -1))
      .when(coalesce(col("__s_present"), lit(false)),
        firstOf(whenNotMatched, 200, -2))
      .otherwise(firstOf(whenNotMatchedBySource, 300, -1))
    val dropCodes: Seq[Int] = -2 +:
      (whenMatched.zipWithIndex.collect {
        case (_: MergeDelete, i) => 100 + i } ++
       whenNotMatchedBySource.zipWithIndex.collect {
         case (_: MergeDelete, i) => 300 + i })
    val joined = t.join(s, t("__t_" + key) === s("__s_" + key), "full")
      .withColumn("__act", act)
      .filter(!col("__act").isin(dropCodes: _*))
    joined.select(cols.map { c =>
      val keep = col("__t_" + c)
      val e0 = whenMatched.zipWithIndex.foldLeft(keep) {
        case (els, (MergeUpdate(set, _), i)) =>
          when(col("__act") === (100 + i), set.getOrElse(c, keep))
            .otherwise(els)
        case (els, _) => els // deletes were filtered above
      }
      val e1 = whenNotMatched.zipWithIndex.foldLeft(e0) {
        case (els, (MergeInsert(values, _), i)) =>
          when(col("__act") === (200 + i),
            values.getOrElse(c,
              lit(null).cast(target.schema(c).dataType))).otherwise(els)
      }
      whenNotMatchedBySource.zipWithIndex.foldLeft(e1) {
        case (els, (MergeUpdate(set, _), i)) =>
          when(col("__act") === (300 + i), set.getOrElse(c, keep))
            .otherwise(els)
        case (els, _) => els
      }.as(c)
    }: _*)
  }

  /** Snapshot diff (CDC between two table versions): one row per key whose
    * state changed, classified `added` / `removed` / `changed` by a full
    * outer join on the key and a whole-row comparison over `compareCols`.
    * Unchanged keys are filtered out BEFORE any downstream consumer — at
    * 100 TB the diff is small even when the snapshots are not.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, key: String,
      compareCols: Seq[String]): DataFrame = {
    // side-presence FLAGS, not key-null tests: a null-key row in either
    // snapshot never equi-joins and classifies as removed/added (it IS
    // unmatched), never as the other side's phantom
    val o = oldSnap.select((key +: compareCols).map(c => col(c).as("o_" + c)): _*)
      .withColumn("_o_present", lit(true))
    val n = newSnap.select((key +: compareCols).map(c => col(c).as("n_" + c)): _*)
      .withColumn("_n_present", lit(true))
    val changed: Column = compareCols
      .map(c => !(col("o_" + c) <=> col("n_" + c)))
      .reduce(_ || _)
    o.join(n, o("o_" + key) === n("n_" + key), "full")
      .withColumn("change_type",
        when(col("_o_present").isNull, lit("added"))
          .when(col("_n_present").isNull, lit("removed"))
          .when(changed, lit("changed")))
      .filter(col("change_type").isNotNull)
      .select(coalesce(col("o_" + key), col("n_" + key)).as(key)
        +: col("change_type")
        +: compareCols.flatMap(c => Seq(col("o_" + c), col("n_" + c))): _*)
  }

  /** Incremental materialized-view maintenance for distributive
    * aggregates: fold a CDC batch ([[snapshotDiff]] rows — `change_type`
    * + o_/n_ copies of the group and value columns) into an existing
    * per-group (cnt, sum_v) aggregate WITHOUT touching the base table.
    * Every change row becomes ± contributions — removed: (−1, −old);
    * added: (+1, +new); changed: both, against the OLD and NEW group
    * respectively, so group migrations maintain correctly — and one
    * narrow re-aggregation merges them with the old state. Groups whose
    * count reaches zero drop (the view never carries empty groups).
    *
    * This is the lakehouse materialized-view loop closed over the E111
    * change feed: maintain cost ∝ |changes|, never |base|. Values should
    * be exact integers (cents) — the maintained view must EQUAL the
    * from-scratch aggregate bit-for-bit, which is what the oracle checks.
    */
  def maintainAgg(oldAgg: DataFrame, cdc: DataFrame,
      groupO: String, groupN: String,
      valO: String, valN: String): DataFrame = {
    val minus = cdc.filter(col("change_type").isin("removed", "changed"))
      .select(col(groupO).as("grp"), lit(-1L).as("cnt"),
        (-col(valO)).cast("long").as("sum_v"))
    val plus = cdc.filter(col("change_type").isin("added", "changed"))
      .select(col(groupN).as("grp"), lit(1L).as("cnt"),
        col(valN).cast("long").as("sum_v"))
    oldAgg.unionByName(minus).unionByName(plus)
      .groupBy("grp").agg(sum("cnt").as("cnt"), sum("sum_v").as("sum_v"))
      .filter(col("cnt") > 0)
  }

  /** SCD Type 2 merge — the history-preserving dimension maintenance every
    * warehouse runs nightly (Kimball's slowly-changing-dimension type 2,
    * the `MERGE`-with-history pattern Delta/Iceberg users hand-roll):
    * `target` carries the dimension's natural key, its attributes, and the
    * SCD bookkeeping columns `valid_from: long`, `valid_to: long?`,
    * `is_current: boolean`; `updates` carries key + attributes only (the
    * incoming batch's ABSOLUTE state per key). At batch time `ts`:
    *
    *  - a CURRENT row whose `compareCols` differ from its update is CLOSED
    *    (`valid_to = ts`, `is_current = false`) and the update opens as the
    *    new current row (`valid_from = ts`, open-ended) — taken WHOLE, the
    *    [[mergeUpsert]] contract, so an update may set non-compared
    *    attributes (even to null);
    *  - a current row whose update matches on every compared column is
    *    UNTOUCHED — re-delivering yesterday's state creates no history
    *    churn (idempotent re-delivery, the property that keeps a replayed
    *    feed from doubling the dimension);
    *  - an update key with no current row (brand-new, or closed without a
    *    successor) INSERTS as current at `ts`;
    *  - current rows with no update, and all HISTORY rows
    *    (`is_current = false`), pass through untouched.
    *
    * Duplicate non-null update keys raise in-plan (SQL MERGE multi-match);
    * a null-key update never equi-joins and inserts as its own row.
    *
    * Scale shape: history rows pass through WITHOUT entering the join —
    * only the current slice (≤ one row per live key) joins the batch, one
    * equi-shuffle per side (the batch side broadcasts under AQE when
    * small), and the close+open fan-out is a single codegen'd
    * explode-of-struct-pair projection over the joined row — never a
    * second join or a self-union of the joined frame. Output row count =
    * |target| + |changed| + |new keys|.
    */
  def scdType2(target: DataFrame, updates: DataFrame, key: String,
      compareCols: Seq[String], ts: Long): DataFrame = {
    val scdCols = Seq("valid_from", "valid_to", "is_current")
    val attrCols = target.columns.filterNot(scdCols.contains)
    require(scdCols.forall(target.columns.contains),
      s"scdType2: target must carry ${scdCols.mkString(", ")}")
    require(attrCols.toSet == updates.columns.toSet,
      s"scdType2: updates columns ${updates.columns.mkString(",")} must " +
        s"equal target attribute columns ${attrCols.mkString(",")}")
    val hist = target.filter(!col("is_current"))
    val curr = target.filter(col("is_current"))
    val kcnt = org.apache.spark.sql.expressions.Window.partitionBy(col("u_" + key))
    val t = curr.select(target.columns.map(c => col(c).as("t_" + c)): _*)
      .withColumn("_t_present", lit(true))
    val u = updates.select(attrCols.map(c => col(c).as("u_" + c)): _*)
      .withColumn("_u_present",
        when(col("u_" + key).isNotNull && count(lit(1)).over(kcnt) > 1,
          raise_error(concat(lit(s"scdType2: duplicate update key $key="),
            col("u_" + key).cast("string"))).isNull)
          .otherwise(lit(true)))
    val changed = compareCols.map(c => !(col("t_" + c) <=> col("u_" + c)))
      .reduce(_ || _)
    // null-safe gates: after the full outer join the presence flags are
    // null on the absent side, and `when` treats a null gate as false
    val closing = col("_t_present") && col("_u_present") && changed
    val opening = col("_u_present") && (col("_t_present").isNull || changed)
    val contRow = struct(
      attrCols.map(c => col("t_" + c).as(c)) ++ Seq(
        col("t_valid_from").as("valid_from"),
        when(closing, lit(ts)).otherwise(col("t_valid_to")).as("valid_to"),
        (!coalesce(closing, lit(false))).as("is_current")): _*)
    val openRow = struct(
      attrCols.map(c => col("u_" + c).as(c)) ++ Seq(
        lit(ts).as("valid_from"),
        lit(null).cast("long").as("valid_to"),
        lit(true).as("is_current")): _*)
    t.join(u, t("t_" + key) === u("u_" + key), "full")
      .select(explode(array(
        when(col("_t_present"), contRow),
        when(coalesce(opening, lit(false)), openRow))).as("r"))
      .filter(col("r").isNotNull)
      .select(col("r.*"))
      .unionByName(hist.select(
        (attrCols ++ scdCols).map(col): _*))
  }

  /** The deterministic delta used by both queries: same-key balance bumps
    * for custkey % 7 = 0, brand-new keys (custkey + 1000000) for
    * custkey % 31 = 0. Derived from the customer table itself so the oracle
    * can re-derive it.
    */
  private[graft] def customerDelta(c: DataFrame): DataFrame =
    c.filter(col("c_custkey") % 7 === 0)
      .withColumn("c_acctbal", col("c_acctbal") + 100.0)
      .unionAll(
        c.filter(col("c_custkey") % 31 === 0)
          .withColumn("c_custkey", col("c_custkey") + 1000000L)
          .withColumn("c_name", concat(lit("New "), col("c_name"))))

  val queries: Map[String, Q] = Map(
    // LK1: MERGE/upsert — every updated, inserted, and untouched row
    // oracle-checked (balances compared in exact cents).
    "q_merge_upsert" -> ((s, dir) => {
      val c = T.customer(s, dir)
      mergeUpsert(c, customerDelta(c), "c_custkey")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          floor(col("c_acctbal") * 100).cast("long").as("acctbal_c"),
          col("c_mktsegment"))
    }),

    // LK8: full MERGE / CDC-apply — one change batch carrying updates
    // (%7, op=upsert, %13-keys excluded so no key gets two ops), inserts
    // (%31 new keys), deletes (%13 existing keys) and GHOST deletes
    // (%41 keys shifted past the key space — unmatched deletes must
    // no-op). The oracle applies the same algebra: merge the upsert set,
    // then anti-filter the delete keys.
    //
    // Key-space ceiling (the +1000000/+2000000 convention, shared with
    // customerDelta): the shifts assume max(c_custkey) < 1000000, true up
    // to sf ≈ 6 (c_custkey ≤ 150000·sf; testdata tops out at the sf1
    // probe). Past that, ghost keys would collide with insert keys
    // (tripping the duplicate-change-key raise — a loud failure, not a
    // silent divergence) and insert keys with real customers. A
    // larger-SF deployment derives the shifts from max(c_custkey)
    // (maxKey / 2·maxKey) on both sides instead.
    "q_merge_apply_cdc" -> ((s, dir) => {
      val c = T.customer(s, dir)
      val ups = c.filter(col("c_custkey") % 7 === 0 &&
          col("c_custkey") % 13 =!= 0)
        .withColumn("c_acctbal", col("c_acctbal") + 100.0)
      val ins = c.filter(col("c_custkey") % 31 === 0 &&
          col("c_custkey") % 13 =!= 0)
        .withColumn("c_custkey", col("c_custkey") + 1000000L)
        .withColumn("c_name", concat(lit("New "), col("c_name")))
      val dels = c.filter(col("c_custkey") % 13 === 0)
      val ghosts = c.filter(col("c_custkey") % 41 === 0)
        .withColumn("c_custkey", col("c_custkey") + 2000000L)
      val changes = ups.unionAll(ins).withColumn("op", lit("upsert"))
        .unionAll(dels.withColumn("op", lit("delete")))
        .unionAll(ghosts.withColumn("op", lit("delete")))
      applyChanges(c, changes, "c_custkey")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          floor(col("c_acctbal") * 100).cast("long").as("acctbal_c"),
          col("c_mktsegment"))
    }),

    // LK16: multi-clause conditional MERGE — one statement carrying all
    // five clause kinds over the shared deterministic delta (%7 bumps,
    // %31 new keys): matched & bumped-balance < $1000 → DELETE (clause 1
    // fires first); matched otherwise → UPDATE (balance +$50, segment
    // VIP); source-only → INSERT only even keys; target-only %11 →
    // UPDATE segment STALE; target-only %17 → DELETE — a key divisible
    // by both 11 and 17 goes STALE, not deleted, proving clause order.
    // The oracle re-derives every branch as explicit set algebra.
    "q_merge_multi" -> ((s, dir) => {
      val c = T.customer(s, dir)
      mergeConditional(c, customerDelta(c), "c_custkey",
        whenMatched = Seq(
          MergeDelete(Some(scol("c_acctbal") < 1000.0)),
          MergeUpdate(Map(
            "c_acctbal" -> (scol("c_acctbal") + 50.0),
            "c_mktsegment" -> lit("VIP")))),
        whenNotMatched = Seq(
          MergeInsert(c.columns.map(x => x -> scol(x)).toMap,
            Some(scol("c_custkey") % 2 === 0))),
        whenNotMatchedBySource = Seq(
          MergeUpdate(Map("c_mktsegment" -> lit("STALE")),
            Some(tcol("c_custkey") % 11 === 0)),
          MergeDelete(Some(tcol("c_custkey") % 17 === 0))))
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          floor(col("c_acctbal") * 100).cast("long").as("acctbal_c"),
          col("c_mktsegment"))
    }),

    // LK2: snapshot diff — old vs merged-new snapshot, minus keys dropped
    // in the new version (custkey % 13 = 0): added/removed/changed rows
    // only, classified and oracle-checked.
    "q_snapshot_diff" -> ((s, dir) => {
      val c = T.customer(s, dir)
      val newSnap = mergeUpsert(c, customerDelta(c), "c_custkey")
        .filter(col("c_custkey") % 13 =!= 0)
      snapshotDiff(
        c.withColumn("acctbal_c", floor(col("c_acctbal") * 100).cast("long")),
        newSnap.withColumn("acctbal_c",
          floor(col("c_acctbal") * 100).cast("long")),
        "c_custkey", Seq("c_name", "acctbal_c"))
        .select(col("c_custkey"), col("change_type"),
          col("o_c_name"), col("n_c_name"),
          col("o_acctbal_c"), col("n_acctbal_c"))
    }),

    // LK14: SCD Type 2 — two update batches folded into a history-keeping
    // dimension. Batch ts=1 bumps %7 balances (+$100) and inserts %31 new
    // keys; batch ts=2 bumps %14 again (+$200 on top) and RE-DELIVERS the
    // unchanged ts=1 state for the other %7 keys (which must create no
    // history churn). The full final dimension — every closed epoch, every
    // open row, validity interval endpoints and currency flags — is
    // re-derived branch-by-branch in the oracle and hash-checked.
    "q_scd2" -> ((s, dir) => {
      val orig = T.customer(s, dir).select(col("c_custkey"), col("c_name"),
        floor(col("c_acctbal") * 100).cast("long").as("acctbal_c"))
      val dim0 = orig
        .withColumn("valid_from", lit(0L))
        .withColumn("valid_to", lit(null).cast("long"))
        .withColumn("is_current", lit(true))
      val upd1 = orig.filter(col("c_custkey") % 7 === 0)
        .withColumn("acctbal_c", col("acctbal_c") + 10000L)
        .unionAll(orig.filter(col("c_custkey") % 31 === 0)
          .withColumn("c_custkey", col("c_custkey") + 1000000L)
          .withColumn("c_name", concat(lit("New "), col("c_name"))))
      val dim1 = scdType2(dim0, upd1, "c_custkey",
        Seq("c_name", "acctbal_c"), ts = 1L)
      val upd2 = orig.filter(col("c_custkey") % 14 === 0)
        .withColumn("acctbal_c", col("acctbal_c") + 30000L)
        .unionAll(orig.filter(col("c_custkey") % 7 === 0 &&
            col("c_custkey") % 14 =!= 0)
          .withColumn("acctbal_c", col("acctbal_c") + 10000L))
      scdType2(dim1, upd2, "c_custkey",
        Seq("c_name", "acctbal_c"), ts = 2L)
        .select(col("c_custkey"), col("c_name"), col("acctbal_c"),
          col("valid_from"), col("valid_to"),
          col("is_current").cast("int").as("is_current"))
    })
  )

  /** Shared oracle CTE: the same deterministic delta + merged snapshot. */
  private[operators] val mergeBaseSql =
    """delta AS (
      |  SELECT c_custkey, c_name, c_nationkey,
      |    c_acctbal + 100.0 AS c_acctbal, c_mktsegment
      |  FROM customer WHERE c_custkey % 7 = 0
      |  UNION ALL
      |  SELECT c_custkey + 1000000, 'New ' || c_name, c_nationkey,
      |    c_acctbal, c_mktsegment
      |  FROM customer WHERE c_custkey % 31 = 0),
      |merged AS (
      |  SELECT
      |    CASE WHEN u.c_custkey IS NOT NULL THEN u.c_custkey ELSE t.c_custkey END AS c_custkey,
      |    CASE WHEN u.c_custkey IS NOT NULL THEN u.c_name ELSE t.c_name END AS c_name,
      |    CASE WHEN u.c_custkey IS NOT NULL THEN u.c_nationkey ELSE t.c_nationkey END AS c_nationkey,
      |    CASE WHEN u.c_custkey IS NOT NULL THEN u.c_acctbal ELSE t.c_acctbal END AS c_acctbal,
      |    CASE WHEN u.c_custkey IS NOT NULL THEN u.c_mktsegment ELSE t.c_mktsegment END AS c_mktsegment
      |  FROM customer t FULL OUTER JOIN delta u ON t.c_custkey = u.c_custkey)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_merge_upsert" ->
      s"""WITH $mergeBaseSql
         |SELECT c_custkey, c_name, c_nationkey,
         |  CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS acctbal_c, c_mktsegment
         |FROM merged ORDER BY ALL NULLS FIRST""".stripMargin,
    // every branch of the five-clause merge as explicit set algebra:
    // matched = %7 keys (the delta's bump set, all present in customer),
    // source-only = the +1000000 insert keys, target-only = the rest
    "q_merge_multi" ->
      """WITH delta AS (
        |  SELECT c_custkey, c_name, c_nationkey,
        |    c_acctbal + 100.0 AS c_acctbal, c_mktsegment
        |  FROM customer WHERE c_custkey % 7 = 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, 'New ' || c_name, c_nationkey,
        |    c_acctbal, c_mktsegment
        |  FROM customer WHERE c_custkey % 31 = 0),
        |matched AS (
        |  SELECT t.c_custkey, t.c_name, t.c_nationkey,
        |    u.c_acctbal + 50.0 AS c_acctbal, 'VIP' AS c_mktsegment
        |  FROM customer t JOIN delta u ON t.c_custkey = u.c_custkey
        |  WHERE NOT (u.c_acctbal < 1000.0)),
        |inserted AS (
        |  SELECT u.* FROM delta u
        |  WHERE u.c_custkey NOT IN (SELECT c_custkey FROM customer)
        |    AND u.c_custkey % 2 = 0),
        |bysource AS (
        |  SELECT c_custkey, c_name, c_nationkey, c_acctbal,
        |    CASE WHEN c_custkey % 11 = 0 THEN 'STALE'
        |         ELSE c_mktsegment END AS c_mktsegment
        |  FROM customer
        |  WHERE c_custkey % 7 != 0
        |    AND NOT (c_custkey % 11 != 0 AND c_custkey % 17 = 0)),
        |final AS (
        |  SELECT * FROM matched UNION ALL
        |  SELECT * FROM inserted UNION ALL
        |  SELECT * FROM bysource)
        |SELECT c_custkey, c_name, c_nationkey,
        |  CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS acctbal_c, c_mktsegment
        |FROM final ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_merge_apply_cdc" ->
      """WITH delta AS (
        |  SELECT c_custkey, c_name, c_nationkey,
        |    c_acctbal + 100.0 AS c_acctbal, c_mktsegment
        |  FROM customer WHERE c_custkey % 7 = 0 AND c_custkey % 13 != 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, 'New ' || c_name, c_nationkey,
        |    c_acctbal, c_mktsegment
        |  FROM customer WHERE c_custkey % 31 = 0 AND c_custkey % 13 != 0),
        |merged AS (
        |  SELECT
        |    CASE WHEN u.c_custkey IS NOT NULL THEN u.c_custkey ELSE t.c_custkey END AS c_custkey,
        |    CASE WHEN u.c_custkey IS NOT NULL THEN u.c_name ELSE t.c_name END AS c_name,
        |    CASE WHEN u.c_custkey IS NOT NULL THEN u.c_nationkey ELSE t.c_nationkey END AS c_nationkey,
        |    CASE WHEN u.c_custkey IS NOT NULL THEN u.c_acctbal ELSE t.c_acctbal END AS c_acctbal,
        |    CASE WHEN u.c_custkey IS NOT NULL THEN u.c_mktsegment ELSE t.c_mktsegment END AS c_mktsegment
        |  FROM customer t FULL OUTER JOIN delta u ON t.c_custkey = u.c_custkey)
        |SELECT c_custkey, c_name, c_nationkey,
        |  CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS acctbal_c, c_mktsegment
        |FROM merged
        |WHERE c_custkey NOT IN
        |  (SELECT c_custkey FROM customer WHERE c_custkey % 13 = 0)
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_snapshot_diff" ->
      s"""WITH $mergeBaseSql,
         |oldsnap AS (
         |  SELECT c_custkey, c_name,
         |    CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS acctbal_c FROM customer),
         |newsnap AS (
         |  SELECT c_custkey, c_name,
         |    CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS acctbal_c
         |  FROM merged WHERE c_custkey % 13 != 0),
         |d AS (
         |  SELECT coalesce(o.c_custkey, n.c_custkey) AS c_custkey,
         |    CASE WHEN o.c_custkey IS NULL THEN 'added'
         |         WHEN n.c_custkey IS NULL THEN 'removed'
         |         WHEN o.c_name IS DISTINCT FROM n.c_name
         |           OR o.acctbal_c IS DISTINCT FROM n.acctbal_c THEN 'changed'
         |    END AS change_type,
         |    o.c_name AS o_c_name, n.c_name AS n_c_name,
         |    o.acctbal_c AS o_acctbal_c, n.acctbal_c AS n_acctbal_c
         |  FROM oldsnap o FULL OUTER JOIN newsnap n ON o.c_custkey = n.c_custkey)
         |SELECT * FROM d WHERE change_type IS NOT NULL
         |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_scd2" ->
      """WITH orig AS (
        |  SELECT c_custkey, c_name,
        |    CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS acctbal_c
        |  FROM customer)
        |SELECT c_custkey, c_name, acctbal_c,
        |  CAST(0 AS BIGINT) AS valid_from,
        |  CAST(CASE WHEN c_custkey % 7 = 0 THEN 1 END AS BIGINT) AS valid_to,
        |  CASE WHEN c_custkey % 7 = 0 THEN 0 ELSE 1 END AS is_current
        |FROM orig
        |UNION ALL
        |SELECT c_custkey, c_name, acctbal_c + 10000,
        |  CAST(1 AS BIGINT),
        |  CAST(CASE WHEN c_custkey % 14 = 0 THEN 2 END AS BIGINT),
        |  CASE WHEN c_custkey % 14 = 0 THEN 0 ELSE 1 END
        |FROM orig WHERE c_custkey % 7 = 0
        |UNION ALL
        |SELECT c_custkey, c_name, acctbal_c + 30000,
        |  CAST(2 AS BIGINT), CAST(NULL AS BIGINT), 1
        |FROM orig WHERE c_custkey % 14 = 0
        |UNION ALL
        |SELECT c_custkey + 1000000, 'New ' || c_name, acctbal_c,
        |  CAST(1 AS BIGINT), CAST(NULL AS BIGINT), 1
        |FROM orig WHERE c_custkey % 31 = 0
        |ORDER BY ALL NULLS FIRST""".stripMargin
  )
}

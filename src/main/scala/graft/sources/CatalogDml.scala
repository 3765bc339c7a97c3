package graft.sources

import graft.Q
import graft.operators.{Lake, Versioned}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Declared queries for the DSv2 catalog DML surface (SURVEY.md §2 E182)
  * — each one drives a REAL SQL statement against a [[GraftCatalog]]
  * table planted from the sf tables, then reads the table back, so the
  * DuckDB oracle hash-checks the STATEMENT's semantics end to end:
  *
  *  - `q_merge_sql`: `MERGE INTO` with multi-clause matched / not-matched
  *    / not-matched-by-source conditions — the SQL spelling of
  *    `q_merge_multi`, oracle BYTE-IDENTICAL to it, so the catalog's
  *    copy-on-write rewrite is hash-proved equal to the programmatic
  *    [[Lake.mergeConditional]] every round;
  *  - `q_delete_sql`: `DELETE FROM ... WHERE` on a keyed table — served
  *    by the metadata-only deletion-vector path (cost ∝ deleted keys,
  *    never a table rewrite; the DV-kind commit is `require`d in-query),
  *    oracle = the plain filtered read;
  *  - `q_update_sql`: `UPDATE ... SET ... WHERE` — the copy-on-write
  *    rewrite, oracle = the same CASE projection over the raw table;
  *  - `q_insert_sql`: `INSERT INTO ... SELECT` — the staged executor
  *    write adopted as one append (delta) commit (`require`d in-query),
  *    oracle = base ∪ inserted projection;
  *  - `q_lake_changes_sql_cat`: the `<table>.changes` CDC metadata table
  *    with `VERSION AS OF '0..2'` bounds (E190), oracle byte-identical
  *    to `q_snapshot_diff`'s;
  *  - `q_expect_sql`: TBLPROPERTIES-declared expectation gates judging
  *    an `INSERT INTO` (E192) — read back = base ∪ passing rows only.
  */
object CatalogDml {

  /** Register (idempotently) a GraftCatalog named uniquely for `root`,
    * returning the catalog name. Catalog instances are cached per name
    * after first use, so the name must be a pure function of the root.
    */
  private def catalogFor(s: SparkSession, root: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(root.getBytes("UTF-8")).map("%02x".format(_))
      .mkString.take(10)
    val name = s"graft_sql_$h"
    s.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$name.root", root)
    name
  }

  /** Plant `<root>/ns/customer` as a keyed versioned table holding the
    * sf customer snapshot (v0).
    */
  private def plantCustomer(s: SparkSession, dir: String,
      tag: String): (String, String) = {
    val root = Versioned.tableDir(dir + tag)
    val cat = catalogFor(s, root)
    val tdir = s"$root/ns/customer"
    new java.io.File(tdir).mkdirs()
    Versioned.commit(graft.Tables.customer(s, dir), tdir)
    GraftCatalog.writeProps(tdir, Map("key" -> "c_custkey"))
    (cat, tdir)
  }

  private def centsRead(s: SparkSession, cat: String) =
    s.table(s"$cat.ns.customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        floor(col("c_acctbal") * 100).cast("long").as("acctbal_c"),
        col("c_mktsegment"))

  val queries: Map[String, Q] = Map(
    // E182: the SQL MERGE spelling of q_merge_multi — clause-for-clause
    // identical semantics (ordered conditional matched/not-matched/
    // not-matched-by-source actions), landed through the catalog's
    // group-based copy-on-write rewrite instead of the programmatic
    // algebra. Oracle byte-identical to q_merge_multi's.
    "q_merge_sql" -> ((s, dir) => {
      val (cat, _) = plantCustomer(s, dir, "#sqlmerge")
      Lake.customerDelta(graft.Tables.customer(s, dir))
        .createOrReplaceTempView("merge_sql_delta")
      s.sql(s"""MERGE INTO $cat.ns.customer t USING merge_sql_delta u
        |ON t.c_custkey = u.c_custkey
        |WHEN MATCHED AND u.c_acctbal < 1000.0 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET
        |  c_acctbal = u.c_acctbal + 50.0, c_mktsegment = 'VIP'
        |WHEN NOT MATCHED AND u.c_custkey % 2 = 0 THEN INSERT *
        |WHEN NOT MATCHED BY SOURCE AND t.c_custkey % 11 = 0 THEN
        |  UPDATE SET c_mktsegment = 'STALE'
        |WHEN NOT MATCHED BY SOURCE AND t.c_custkey % 17 = 0 THEN DELETE
        |""".stripMargin)
      centsRead(s, cat)
    }),

    // E182: SQL UPDATE — the group-based copy-on-write rewrite (CASE
    // projection over the pinned tip, adopted as the next snapshot under
    // the claim + tip-unmoved check). Oracle = the same CASE over the
    // raw table.
    "q_update_sql" -> ((s, dir) => {
      val (cat, _) = plantCustomer(s, dir, "#sqlupd")
      s.sql(s"UPDATE $cat.ns.customer " +
        "SET c_acctbal = c_acctbal + 100.0, c_mktsegment = 'BUMPED' " +
        "WHERE c_custkey % 7 = 0")
      centsRead(s, cat)
    }),

    // E182: SQL INSERT INTO ... SELECT — the staged executor-side v2
    // parquet write adopted as one append (delta) commit; the read back
    // resolves base ∪ delta. Oracle = base rows ∪ the inserted
    // projection.
    "q_insert_sql" -> ((s, dir) => {
      val (cat, tdir) = plantCustomer(s, dir, "#sqlins")
      s.sql(s"INSERT INTO $cat.ns.customer " +
        s"SELECT c_custkey + 5000000, concat('Ins ', c_name), " +
        s"c_nationkey, c_acctbal, c_mktsegment FROM $cat.ns.customer " +
        "WHERE c_custkey % 19 = 0")
      // the scale contract, enforced: INSERT INTO landed as a DELTA
      // commit (cost ∝ inserted rows), never a snapshot rewrite
      require(Versioned.isAddVersion(tdir, Versioned.latest(tdir)),
        "q_insert_sql: expected an append (delta) commit")
      centsRead(s, cat)
    }),

    // E182: catalog-native SQL time travel — VERSION AS OF through the
    // loadTable(ident, version) overload, after a DV delete moved the
    // tip. Oracle = the UNDELETED table: a hash match proves the pinned
    // v0 read resolves the pre-delete snapshot exactly.
    "q_timetravel_sql_cat" -> ((s, dir) => {
      val (cat, tdir) = plantCustomer(s, dir, "#sqltt")
      s.sql(s"DELETE FROM $cat.ns.customer WHERE c_custkey <= 100")
      require(Versioned.isDvVersion(tdir, Versioned.latest(tdir)))
      s.sql(s"SELECT c_custkey, c_name, c_nationkey, " +
        "CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS acctbal_c, " +
        s"c_mktsegment FROM $cat.ns.customer VERSION AS OF 0")
    }),

    // E190: SQL CDC through the catalog — the <table>.changes metadata
    // table with VERSION AS OF '0..2' bounds, over the same v0 → upsert
    // → delete history q_lake_changes builds (cents precomputed into the
    // table so the diff is float-seam-free). Oracle BYTE-IDENTICAL to
    // q_snapshot_diff's: the SQL face must hash-match the purely
    // in-memory snapshot diff every round.
    "q_lake_changes_sql_cat" -> ((s, dir) => {
      val root = Versioned.tableDir(dir + "#sqlcdc")
      val cat = catalogFor(s, root)
      val tdir = s"$root/ns/customer"
      new java.io.File(tdir).mkdirs()
      val c = graft.Tables.customer(s, dir)
      def cents(df: org.apache.spark.sql.DataFrame) =
        df.select(col("c_custkey"), col("c_name"),
          floor(col("c_acctbal") * 100).cast("long").as("acctbal_c"))
      Versioned.commit(cents(c), tdir)                                 // v0
      GraftCatalog.writeProps(tdir, Map("key" -> "c_custkey"))
      Versioned.upsert(s, tdir, cents(Lake.customerDelta(c)),
        "c_custkey")                                                   // v1
      Versioned.deleteWhere(s, tdir, col("c_custkey") % 13 === 0)      // v2
      s.sql(s"SELECT c_custkey, change_type, o_c_name, n_c_name, " +
        s"o_acctbal_c, n_acctbal_c " +
        s"FROM $cat.ns.customer.changes VERSION AS OF '0..2'")
    }),

    // E192: SQL-declared expectation gates — TBLPROPERTIES
    // ('expectation.<name>'='<predicate>') judge every INSERT INTO:
    // valid rows land as the delta commit (require'd), rejects in the
    // version's quarantine. The read back = base ∪ only the inserted
    // rows that passed the gate; oracle re-derives that filter.
    "q_expect_sql" -> ((s, dir) => {
      val (cat, tdir) = plantCustomer(s, dir, "#sqlexp")
      s.sql(s"ALTER TABLE $cat.ns.customer SET TBLPROPERTIES " +
        "('expectation.nonneg_bal' = 'c_acctbal >= 0.0')")
      s.sql(s"INSERT INTO $cat.ns.customer " +
        s"SELECT c_custkey + 7000000, concat('Gated ', c_name), " +
        s"c_nationkey, c_acctbal - 5000.0, c_mktsegment " +
        s"FROM $cat.ns.customer WHERE c_custkey % 23 = 0")
      require(Versioned.isAddVersion(tdir, Versioned.latest(tdir)),
        "q_expect_sql: expected an append (delta) commit")
      centsRead(s, cat)
    }),

    // E193: hidden partitioning read through catalog SQL — orders
    // committed under month(o_orderdate), then a raw-column date range
    // SELECT: the pushed predicates prune the manifest to the admitted
    // months DRIVER-SIDE (the prune probe is require'd — a silent full
    // scan cannot pass), the residual trims the edges, and the result
    // must row-equal the full-table filter. Oracle byte-identical to
    // q_lake_hidden_part's.
    "q_hidden_sql_cat" -> ((s, dir) => {
      val root = Versioned.tableDir(dir + "#sqlhid")
      val cat = catalogFor(s, root)
      val tdir = s"$root/ns/orders"
      new java.io.File(tdir).mkdirs()
      Versioned.commitPartitionedHidden(graft.Tables.orders(s, dir),
        tdir, "month", "o_orderdate")
      GraftCatalog.writeProps(tdir,
        Map("gpart.transform" -> "month", "gpart.column" -> "o_orderdate"))
      val df = s.sql(s"SELECT o_orderkey, o_custkey, o_orderstatus, " +
        "CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c, " +
        "CAST(o_orderdate AS DATE) AS o_date, o_orderpriority " +
        s"FROM $cat.ns.orders " +
        "WHERE o_orderdate >= '1996-02-10' AND o_orderdate <= '1996-05-20'")
      GraftScanPruneProbe.last.set("")
      // buildScan (where pruning decides) runs at physical planning — a
      // 1-row probe execution is enough to pin it without a full scan
      df.limit(1).collect()
      // the pushed literal stringifies per the column's type (a
      // timestamp column gives "1996-02-10T00:00") — pin the mode and
      // the day-resolution bounds, not the exact literal spelling
      val probe = GraftScanPruneProbe.last.get
      require(probe.startsWith("range:1996-02-10") &&
          probe.contains("..1996-05-20"),
        s"q_hidden_sql_cat: expected a driver-side pruned read, got " +
          s"'$probe'")
      df
    }),

    // E194: days() hidden partitioning driven END TO END through SQL —
    // CREATE TABLE ... PARTITIONED BY (days(o_date)), INSERT OVERWRITE
    // lands the day layout (the practical date-partitioned-fact shape),
    // and a raw-column day range prunes driver-side (require'd). The
    // plant is one quarter of orders so the day-partition count stays
    // write-bounded (~90 dirs) at any SF — the READ is admitted-days-
    // sized regardless.
    "q_hidden_day_sql_cat" -> ((s, dir) => {
      val root = Versioned.tableDir(dir + "#sqlhidday")
      val cat = catalogFor(s, root)
      s.sql(s"CREATE TABLE $cat.ns.ord_day (o_orderkey BIGINT, " +
        "o_custkey BIGINT, o_orderstatus STRING, price_c BIGINT, " +
        "o_date DATE, o_orderpriority STRING) PARTITIONED BY (days(o_date))")
      graft.Tables.orders(s, dir).createOrReplaceTempView("hid_day_orders")
      s.sql(s"INSERT OVERWRITE TABLE $cat.ns.ord_day " +
        "SELECT o_orderkey, o_custkey, o_orderstatus, " +
        "CAST(FLOOR(o_totalprice * 100) AS BIGINT), " +
        "CAST(o_orderdate AS DATE), o_orderpriority FROM hid_day_orders " +
        "WHERE o_orderdate >= TIMESTAMP'1996-01-01 00:00:00' " +
        "AND o_orderdate < TIMESTAMP'1996-04-01 00:00:00'")
      val df = s.sql(s"SELECT * FROM $cat.ns.ord_day " +
        "WHERE o_date >= DATE'1996-02-10' AND o_date <= DATE'1996-02-24'")
      GraftScanPruneProbe.last.set("")
      df.limit(1).collect()
      val probe = GraftScanPruneProbe.last.get
      require(probe == "range:1996-02-10..1996-02-24",
        s"q_hidden_day_sql_cat: expected a day-pruned read, got '$probe'")
      df
    }),

    // E194: years() hidden partitioning — full orders under years(o_date)
    // (~7 archival partitions), a two-year range admits exactly two.
    "q_hidden_year_sql_cat" -> ((s, dir) => {
      val root = Versioned.tableDir(dir + "#sqlhidyear")
      val cat = catalogFor(s, root)
      s.sql(s"CREATE TABLE $cat.ns.ord_year (o_orderkey BIGINT, " +
        "o_custkey BIGINT, o_orderstatus STRING, price_c BIGINT, " +
        "o_date DATE, o_orderpriority STRING) " +
        "PARTITIONED BY (years(o_date))")
      graft.Tables.orders(s, dir).createOrReplaceTempView("hid_year_orders")
      s.sql(s"INSERT OVERWRITE TABLE $cat.ns.ord_year " +
        "SELECT o_orderkey, o_custkey, o_orderstatus, " +
        "CAST(FLOOR(o_totalprice * 100) AS BIGINT), " +
        "CAST(o_orderdate AS DATE), o_orderpriority FROM hid_year_orders")
      val df = s.sql(s"SELECT * FROM $cat.ns.ord_year " +
        "WHERE o_date >= DATE'1994-01-01' AND o_date <= DATE'1995-12-31'")
      GraftScanPruneProbe.last.set("")
      df.limit(1).collect()
      val probe = GraftScanPruneProbe.last.get
      require(probe == "range:1994-01-01..1995-12-31",
        s"q_hidden_year_sql_cat: expected a year-pruned read, got '$probe'")
      df
    }),

    // E194: identity partitioning (plain Hive-style PARTITIONED BY (col),
    // the reference's delegated DDL shape) — customer under c_nationkey,
    // an integer range admits exactly the probed nation partitions with
    // NUMERIC partition comparison (lexicographic '9' > '10' covered).
    "q_hidden_id_sql_cat" -> ((s, dir) => {
      val root = Versioned.tableDir(dir + "#sqlhidid")
      val cat = catalogFor(s, root)
      s.sql(s"CREATE TABLE $cat.ns.cust_id (c_custkey BIGINT, " +
        "c_name STRING, c_nationkey BIGINT, acctbal_c BIGINT, " +
        "c_mktsegment STRING) PARTITIONED BY (c_nationkey)")
      graft.Tables.customer(s, dir).createOrReplaceTempView("hid_id_cust")
      s.sql(s"INSERT OVERWRITE TABLE $cat.ns.cust_id " +
        "SELECT c_custkey, c_name, c_nationkey, " +
        "CAST(FLOOR(c_acctbal * 100) AS BIGINT), c_mktsegment " +
        "FROM hid_id_cust")
      val df = s.sql(s"SELECT * FROM $cat.ns.cust_id " +
        "WHERE c_nationkey >= 7 AND c_nationkey <= 11")
      GraftScanPruneProbe.last.set("")
      df.limit(1).collect()
      val probe = GraftScanPruneProbe.last.get
      require(probe == "range:7..11",
        s"q_hidden_id_sql_cat: expected an identity-pruned read, got " +
          s"'$probe'")
      df
    }),

    // E201: the <table>.history metadata table — the SAME four-version
    // lineage q_lake_history builds (snapshot, DV delete, append,
    // rename), planted as a catalog table and read back as `SELECT *
    // FROM cat.ns.hist.history`. Oracle byte-identical to
    // q_lake_history's: the SQL metadata-table face must reproduce the
    // programmatic DESCRIBE HISTORY exactly.
    "q_lake_history_sql_cat" -> ((s, dir) => {
      val root = Versioned.tableDir(dir + "#sqlhist")
      val cat = catalogFor(s, root)
      val tdir = s"$root/ns/hist"
      new java.io.File(tdir).mkdirs()
      val c = graft.Tables.customer(s, dir)
      Versioned.commit(c, tdir)
      Versioned.deleteWhereDv(s, tdir,
        col("c_custkey") % 13 === 0, "c_custkey")
      Versioned.appendRows(c.filter(col("c_custkey") % 31 === 0)
        .withColumn("c_custkey", col("c_custkey") + 1000000), tdir)
      Versioned.renameColumn(s, tdir, "c_mktsegment", "segment")
      s.sql(s"SELECT * FROM $cat.ns.hist.history")
    }),

    // E198: append-link skipping through catalog SQL — a base snapshot
    // plus three INSERT INTO delta commits (each carrying its footer-
    // harvested `_addstats` sidecar), then a date-range SELECT whose
    // pushed predicate excludes the first two links' [min, max]: the
    // chain fold must plan WITHOUT them (require'd via the skip probe —
    // a silent full-chain union cannot pass), and the result must
    // row-equal the logical full-table filter. The 100 TB shape: a
    // time-range query over a long ingest chain reads only the links
    // the predicate admits.
    "q_lake_addskip_sql" -> ((s, dir) => {
      val root = Versioned.tableDir(dir + "#sqladdskip")
      val cat = catalogFor(s, root)
      s.sql(s"CREATE TABLE $cat.ns.ord_add (o_orderkey BIGINT, " +
        "o_custkey BIGINT, price_c BIGINT, o_date DATE)")
      graft.Tables.orders(s, dir).createOrReplaceTempView("addskip_orders")
      def ins(verb: String, where: String): Unit = {
        s.sql(s"$verb TABLE $cat.ns.ord_add SELECT o_orderkey, " +
          "o_custkey, CAST(FLOOR(o_totalprice * 100) AS BIGINT), " +
          s"CAST(o_orderdate AS DATE) FROM addskip_orders WHERE $where")
        ()
      }
      ins("INSERT OVERWRITE",
        "o_orderdate < TIMESTAMP'1996-01-01 00:00:00'") // materialized base
      ins("INSERT INTO", "o_orderdate >= TIMESTAMP'1996-01-01 00:00:00' " +
        "AND o_orderdate < TIMESTAMP'1996-05-01 00:00:00'")
      ins("INSERT INTO", "o_orderdate >= TIMESTAMP'1996-05-01 00:00:00' " +
        "AND o_orderdate < TIMESTAMP'1996-09-01 00:00:00'")
      ins("INSERT INTO", "o_orderdate >= TIMESTAMP'1996-09-01 00:00:00'")
      val df = s.sql(s"SELECT * FROM $cat.ns.ord_add " +
        "WHERE o_date >= DATE'1997-01-01'")
      GraftAddSkipProbe.last.set("")
      df.limit(1).collect()
      val probe = GraftAddSkipProbe.last.get
      require(probe == "skip:2/3",
        s"q_lake_addskip_sql: expected 2 of 3 append links skipped, " +
          s"got '$probe'")
      df
    }),

    // E182: SQL DELETE on a keyed table — the statement plans Spark's
    // metadata-only delete (OptimizeMetadataOnlyDeleteFromTable →
    // SupportsDeleteV2), which lands a deletion-vector commit: cost ∝
    // deleted keys at any table size. Oracle = the surviving rows.
    "q_delete_sql" -> ((s, dir) => {
      val (cat, tdir) = plantCustomer(s, dir, "#sqldel")
      s.sql(s"DELETE FROM $cat.ns.customer " +
        "WHERE c_nationkey = 7 OR c_custkey > 140")
      // the scale contract, enforced: a LOSSLESSLY-translatable delete
      // must have committed a DV version, not a rewritten snapshot
      require(Versioned.isDvVersion(tdir, Versioned.latest(tdir)),
        "q_delete_sql: expected the metadata-only DV path")
      centsRead(s, cat)
    }))

  val oracles: Map[String, String] = Map(
    "q_merge_sql" -> Lake.oracles("q_merge_multi"),
    "q_lake_changes_sql_cat" -> Lake.oracles("q_snapshot_diff"),
    "q_hidden_sql_cat" -> Versioned.oracles("q_lake_hidden_part"),
    "q_hidden_day_sql_cat" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c,
        |  CAST(o_orderdate AS DATE) AS o_date, o_orderpriority
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND CAST(o_orderdate AS DATE) >= DATE '1996-02-10'
        |  AND CAST(o_orderdate AS DATE) <= DATE '1996-02-24'
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_hidden_year_sql_cat" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c,
        |  CAST(o_orderdate AS DATE) AS o_date, o_orderpriority
        |FROM orders
        |WHERE CAST(o_orderdate AS DATE) >= DATE '1994-01-01'
        |  AND CAST(o_orderdate AS DATE) <= DATE '1995-12-31'
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_hidden_id_sql_cat" ->
      """SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT) AS c_nationkey,
        |  CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS acctbal_c, c_mktsegment
        |FROM customer
        |WHERE c_nationkey >= 7 AND c_nationkey <= 11
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_lake_history_sql_cat" -> Versioned.oracles("q_lake_history"),
    "q_lake_addskip_sql" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c,
        |  CAST(o_orderdate AS DATE) AS o_date
        |FROM orders
        |WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_expect_sql" ->
      """WITH allrows AS (
        |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey + 7000000, 'Gated ' || c_name, c_nationkey,
        |    c_acctbal - 5000.0, c_mktsegment
        |  FROM customer
        |  WHERE c_custkey % 23 = 0 AND c_acctbal - 5000.0 >= 0.0)
        |SELECT c_custkey, c_name, c_nationkey,
        |  CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS acctbal_c, c_mktsegment
        |FROM allrows ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_update_sql" ->
      """SELECT c_custkey, c_name, c_nationkey,
        |  CAST(FLOOR(CASE WHEN c_custkey % 7 = 0
        |    THEN c_acctbal + 100.0 ELSE c_acctbal END * 100) AS BIGINT)
        |    AS acctbal_c,
        |  CASE WHEN c_custkey % 7 = 0 THEN 'BUMPED'
        |    ELSE c_mktsegment END AS c_mktsegment
        |FROM customer ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_insert_sql" ->
      """WITH allrows AS (
        |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey + 5000000, 'Ins ' || c_name, c_nationkey,
        |    c_acctbal, c_mktsegment
        |  FROM customer WHERE c_custkey % 19 = 0)
        |SELECT c_custkey, c_name, c_nationkey,
        |  CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS acctbal_c, c_mktsegment
        |FROM allrows ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_delete_sql" ->
      """SELECT c_custkey, c_name, c_nationkey,
        |  CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS acctbal_c, c_mktsegment
        |FROM customer
        |WHERE NOT (c_nationkey = 7 OR c_custkey > 140)
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_timetravel_sql_cat" ->
      """SELECT c_custkey, c_name, c_nationkey,
        |  CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS acctbal_c, c_mktsegment
        |FROM customer ORDER BY ALL NULLS FIRST""".stripMargin)
}

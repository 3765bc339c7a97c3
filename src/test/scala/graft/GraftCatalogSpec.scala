package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** E182: the DSv2 catalog surface — persistent tables, INSERT / INSERT
  * OVERWRITE, DELETE (metadata-only DV path vs COW rewrite), UPDATE,
  * MERGE INTO, time travel on the history the DML built, and the
  * optimistic-concurrency conflict check on row-level rewrites.
  */
class GraftCatalogSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val root =
    java.nio.file.Files.createTempDirectory("graft-cat").toString

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // catalogs instantiate lazily on first reference, so runtime conf
    // works even on a shared session
    s.conf.set("spark.sql.catalog.graft_cat",
      "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.graft_cat.root", root)
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def dirOf(t: String) = s"$root/ns/$t"

  private def rows(t: String): Seq[(Long, String, Long)] =
    spark.sql(s"SELECT k, name, bal FROM graft_cat.ns.$t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq

  test("E182: CREATE TABLE + INSERT INTO lands an append commit; SELECT reads the tip") {
    spark.sql("CREATE TABLE graft_cat.ns.t1 (k BIGINT, name STRING, " +
      "bal BIGINT) TBLPROPERTIES ('key'='k')")
    // v0 = empty schema-bearing snapshot
    assert(operators.Versioned.latest(dirOf("t1")) === 0)
    assert(spark.sql("SELECT * FROM graft_cat.ns.t1").count() === 0)
    spark.sql("INSERT INTO graft_cat.ns.t1 VALUES " +
      "(1, 'a', 10), (2, 'b', 20), (3, 'c', 30)")
    // INSERT INTO = one append (delta) commit, cost ∝ inserted rows
    assert(operators.Versioned.latest(dirOf("t1")) === 1)
    assert(operators.Versioned.isAddVersion(dirOf("t1"), 1))
    assert(rows("t1") === Seq((1L, "a", 10L), (2L, "b", 20L),
      (3L, "c", 30L)))
    // second INSERT stacks another delta
    spark.sql("INSERT INTO graft_cat.ns.t1 VALUES (4, 'd', 40)")
    assert(operators.Versioned.isAddVersion(dirOf("t1"), 2))
    assert(rows("t1").map(_._1) === Seq(1L, 2L, 3L, 4L))
  }

  test("E182: DELETE WHERE with a declared key takes the metadata-only DV path") {
    spark.sql("CREATE TABLE graft_cat.ns.t2 (k BIGINT, name STRING, " +
      "bal BIGINT) TBLPROPERTIES ('key'='k')")
    spark.sql("INSERT INTO graft_cat.ns.t2 VALUES " +
      "(1, 'a', 10), (2, 'b', 20), (3, 'c', 30)")
    spark.sql("DELETE FROM graft_cat.ns.t2 WHERE k = 2")
    val d = dirOf("t2")
    // the delete committed a DELETION VECTOR, not a rewritten snapshot
    assert(operators.Versioned.isDvVersion(d, operators.Versioned.latest(d)),
      "translatable DELETE on a keyed table must take the DV path")
    assert(rows("t2").map(_._1) === Seq(1L, 3L))
    // time travel still serves the pre-delete snapshot
    assert(spark.read.format("graft.versioned").option("versionAsOf", 1)
      .load(d).count() === 3)
  }

  test("E182: UPDATE and MERGE INTO rewrite copy-on-write; results exact") {
    import spark.implicits._
    spark.sql("CREATE TABLE graft_cat.ns.t3 (k BIGINT, name STRING, " +
      "bal BIGINT) TBLPROPERTIES ('key'='k')")
    spark.sql("INSERT INTO graft_cat.ns.t3 VALUES " +
      "(1, 'a', 10), (2, 'b', 20), (3, 'c', 30)")
    spark.sql("UPDATE graft_cat.ns.t3 SET bal = bal + 100 WHERE k <= 2")
    assert(rows("t3") === Seq((1L, "a", 110L), (2L, "b", 120L),
      (3L, "c", 30L)))
    val d = dirOf("t3")
    // COW: the update's version is a full materialized snapshot
    val vUpd = operators.Versioned.latest(d)
    assert(!operators.Versioned.isDvVersion(d, vUpd) &&
      !operators.Versioned.isAddVersion(d, vUpd))
    Seq((3L, "c2", 99L), (4L, "d", 40L)).toDF("k", "name", "bal")
      .createOrReplaceTempView("t3_src")
    spark.sql("MERGE INTO graft_cat.ns.t3 t USING t3_src s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT *")
    assert(rows("t3") === Seq((1L, "a", 110L), (2L, "b", 120L),
      (3L, "c2", 99L), (4L, "d", 40L)))
    // MERGE with a DELETE clause
    spark.sql("MERGE INTO graft_cat.ns.t3 t USING t3_src s ON t.k = s.k " +
      "WHEN MATCHED AND s.k = 3 THEN DELETE " +
      "WHEN MATCHED THEN UPDATE SET t.bal = s.bal")
    assert(rows("t3") === Seq((1L, "a", 110L), (2L, "b", 120L),
      (4L, "d", 40L)))
    // the whole DML history stays time-travelable
    assert(spark.read.format("graft.versioned").option("versionAsOf", 1)
      .load(d).count() === 3)
  }

  test("E182: INSERT OVERWRITE replaces the snapshot, history intact; " +
      "catalog list/drop/rename; column pruning + filter pushdown reach parquet") {
    spark.sql("CREATE TABLE graft_cat.ns.t4 (k BIGINT, name STRING, " +
      "bal BIGINT)")
    spark.sql("INSERT INTO graft_cat.ns.t4 VALUES (1, 'a', 10), (2, 'b', 20)")
    spark.sql("INSERT OVERWRITE TABLE graft_cat.ns.t4 VALUES (9, 'z', 90)")
    assert(rows("t4") === Seq((9L, "z", 90L)))
    assert(spark.read.format("graft.versioned").option("versionAsOf", 1)
      .load(dirOf("t4")).count() === 2)
    // a table WITHOUT a key property still deletes (COW rewrite)
    spark.sql("DELETE FROM graft_cat.ns.t4 WHERE k = 9")
    assert(rows("t4") === Seq.empty)
    // SHOW TABLES sees the directory-backed tables
    val listed = spark.sql("SHOW TABLES IN graft_cat.ns")
      .collect().map(_.getString(1)).toSet
    assert(Set("t1", "t2", "t3", "t4").subsetOf(listed))
    // pushdown: translated filter + pruned columns reach the inner scan
    val planned = spark.sql(
      "SELECT name FROM graft_cat.ns.t3 WHERE bal >= 100")
    val scans = planned.queryExecution.executedPlan.collectLeaves()
      .map(_.toString)
    assert(scans.exists(l => l.contains("PushedFilters") &&
      l.contains("bal")), s"expected bal pushed:\n${scans.mkString("\n")}")
    assert(scans.exists(l => l.contains("ReadSchema") &&
      !l.contains("ReadSchema: struct<k")),
      s"expected k pruned from the scan:\n${scans.mkString("\n")}")
    // rename + drop
    spark.sql("ALTER TABLE graft_cat.ns.t4 RENAME TO ns.t4b")
    assert(spark.sql("SELECT count(*) FROM graft_cat.ns.t4b")
      .collect()(0).getLong(0) === 0)
    spark.sql("DROP TABLE graft_cat.ns.t4b")
    intercept[Exception] { spark.sql("SELECT * FROM graft_cat.ns.t4b") }
  }

  test("E182: SQL time travel — VERSION AS OF / TIMESTAMP AS OF pin a " +
      "snapshot; writes to it are rejected") {
    spark.sql("CREATE TABLE graft_cat.ns.t9 (k BIGINT, name STRING, " +
      "bal BIGINT)")
    spark.sql("INSERT INTO graft_cat.ns.t9 VALUES (1, 'a', 10)") // v1
    spark.sql("INSERT INTO graft_cat.ns.t9 VALUES (2, 'b', 20)") // v2
    def ks(sql: String): Set[Long] =
      spark.sql(sql).collect().map(_.getLong(0)).toSet
    assert(ks("SELECT k FROM graft_cat.ns.t9") === Set(1L, 2L))
    assert(ks("SELECT k FROM graft_cat.ns.t9 VERSION AS OF 1") === Set(1L))
    assert(ks("SELECT k FROM graft_cat.ns.t9 VERSION AS OF 0") === Set())
    // a far-future timestamp resolves to the tip
    assert(ks("SELECT k FROM graft_cat.ns.t9 TIMESTAMP AS OF " +
      "'2099-01-01 00:00:00'") === Set(1L, 2L))
    // nonexistent version fails loudly
    intercept[Exception] {
      spark.sql("SELECT k FROM graft_cat.ns.t9 VERSION AS OF 99").collect()
    }
    // historical snapshots are read-only (the SQL grammar already keeps
    // time-travel clauses out of DML targets; this pins the
    // defense-in-depth guard on the table object itself)
    val gc = new graft.sources.GraftCatalog
    gc.initialize("graft_cat_tt",
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("root", root)))
    val pinned = gc.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("ns"), "t9"), "1")
    val e = intercept[Exception] {
      pinned.asInstanceOf[
        org.apache.spark.sql.connector.catalog.SupportsDeleteV2]
        .truncateTable()
    }
    assert(e.getMessage.contains("time-traveled"))
  }

  test("E182: TRUNCATE TABLE commits an empty snapshot — keyless tables " +
      "included, history intact") {
    spark.sql("CREATE TABLE graft_cat.ns.t8 (k BIGINT, name STRING, " +
      "bal BIGINT)") // NO key property — the DV default path must not run
    spark.sql("INSERT INTO graft_cat.ns.t8 VALUES (1, 'a', 10), (2, 'b', 20)")
    spark.sql("TRUNCATE TABLE graft_cat.ns.t8")
    assert(spark.sql("SELECT * FROM graft_cat.ns.t8").count() === 0)
    // schema preserved, pre-truncate snapshot still time-travelable
    assert(spark.sql("SELECT * FROM graft_cat.ns.t8").columns.toSeq ===
      Seq("k", "name", "bal"))
    assert(spark.read.format("graft.versioned").option("versionAsOf", 1)
      .load(dirOf("t8")).count() === 2)
  }

  test("E182: the _version metadata column is SQL-selectable and carries " +
      "the pinned tip") {
    spark.sql("CREATE TABLE graft_cat.ns.t7 (k BIGINT, name STRING, " +
      "bal BIGINT)")
    spark.sql("INSERT INTO graft_cat.ns.t7 VALUES (1, 'a', 10)")
    spark.sql("INSERT INTO graft_cat.ns.t7 VALUES (2, 'b', 20)")
    // tip is v2 (v0 empty snapshot + two appends); every row reports it
    val got = spark.sql("SELECT k, _version FROM graft_cat.ns.t7 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got === Seq((1L, 2), (2L, 2)))
    // and SELECT * does NOT leak the metadata column
    assert(spark.sql("SELECT * FROM graft_cat.ns.t7").columns.toSeq ===
      Seq("k", "name", "bal"))
  }

  test("E182: DELETE with an UNTRANSLATABLE predicate on a keyed table " +
      "falls back to the COW rewrite — never a lossy DV delete") {
    spark.sql("CREATE TABLE graft_cat.ns.t6 (k BIGINT, name STRING, " +
      "bal BIGINT) TBLPROPERTIES ('key'='k')")
    spark.sql("INSERT INTO graft_cat.ns.t6 VALUES " +
      "(13, 'a', 10), (14, 'b', 20), (26, 'c', 30), (27, 'd', 40)")
    // k % 13 is not losslessly translatable (PredicateUtils.toV1 would
    // LOSSILY drop a branch — the exact hazard the custom translator
    // refuses): the statement must take the row-level rewrite...
    spark.sql("DELETE FROM graft_cat.ns.t6 WHERE k % 13 = 0 OR bal = 20")
    val d = dirOf("t6")
    val v = operators.Versioned.latest(d)
    assert(!operators.Versioned.isDvVersion(d, v),
      "untranslatable DELETE must NOT take the DV path")
    // ...and delete EXACTLY the matching rows
    assert(rows("t6") === Seq((27L, "d", 40L)))
  }

  test("E182: ALTER TABLE — ADD COLUMNS widens via an empty append, " +
      "RENAME COLUMN is metadata-only, TBLPROPERTIES round-trip") {
    spark.sql("CREATE TABLE graft_cat.ns.ta (k BIGINT, name STRING)")
    spark.sql("INSERT INTO graft_cat.ns.ta VALUES (1, 'a')")
    spark.sql("ALTER TABLE graft_cat.ns.ta ADD COLUMNS (tier STRING)")
    // the widened schema serves immediately; old rows null-pad
    assert(spark.table("graft_cat.ns.ta").columns.toSeq ===
      Seq("k", "name", "tier"))
    spark.sql("INSERT INTO graft_cat.ns.ta VALUES (2, 'b', 'gold')")
    val got = spark.sql(
      "SELECT k, tier FROM graft_cat.ns.ta ORDER BY k").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(got === Seq((1L, None), (2L, Some("gold"))))
    // time travel below the widening keeps the old schema
    assert(spark.sql("SELECT * FROM graft_cat.ns.ta VERSION AS OF 1")
      .columns.toSeq === Seq("k", "name"))
    // rename: metadata-only version, data intact
    spark.sql("ALTER TABLE graft_cat.ns.ta RENAME COLUMN tier TO grade")
    assert(spark.table("graft_cat.ns.ta").columns.toSeq ===
      Seq("k", "name", "grade"))
    // properties round-trip through the _props sidecar
    spark.sql("ALTER TABLE graft_cat.ns.ta SET TBLPROPERTIES ('key'='k')")
    assert(spark.table("graft_cat.ns.ta") // forces a reload
      .columns.nonEmpty)
    assert(graft.sources.GraftCatalog.readProps(dirOf("ta"))
      .get("key") === Some("k"))
    spark.sql("ALTER TABLE graft_cat.ns.ta UNSET TBLPROPERTIES ('key')")
    assert(!graft.sources.GraftCatalog.readProps(dirOf("ta"))
      .contains("key"))
    // a TYPE CHANGE is rejected loudly (it rewrites every value — no
    // metadata-only spelling; DROP COLUMN is supported since E196)
    intercept[Exception] {
      spark.sql("ALTER TABLE graft_cat.ns.ta ALTER COLUMN grade TYPE INT")
    }
    // renaming the KEY column follows the 'key' property, so DV deletes
    // keep working after the rename
    spark.sql("ALTER TABLE graft_cat.ns.ta SET TBLPROPERTIES ('key'='k')")
    spark.sql("ALTER TABLE graft_cat.ns.ta RENAME COLUMN k TO kid")
    assert(graft.sources.GraftCatalog.readProps(dirOf("ta"))
      .get("key") === Some("kid"))
    spark.sql("DELETE FROM graft_cat.ns.ta WHERE kid = 1")
    assert(operators.Versioned.isDvVersion(dirOf("ta"),
      operators.Versioned.latest(dirOf("ta"))),
      "post-rename DELETE must still take the DV path")
    assert(spark.sql("SELECT kid FROM graft_cat.ns.ta").collect()
      .map(_.getLong(0)).toSet === Set(2L))
    // multi-column ADD lands as ONE commit
    val tipBefore = operators.Versioned.latest(dirOf("ta"))
    spark.sql("ALTER TABLE graft_cat.ns.ta ADD COLUMNS (x INT, y INT)")
    assert(operators.Versioned.latest(dirOf("ta")) === tipBefore + 1)
    assert(spark.table("graft_cat.ns.ta").columns.toSeq ===
      Seq("kid", "name", "grade", "x", "y"))
  }

  test("E183b: CALL procedures — history/restore/compact_dv/optimize/" +
      "vacuum/clone_table drive the maintenance surface from SQL") {
    spark.sql("CREATE TABLE graft_cat.ns.tp (k BIGINT, name STRING, " +
      "bal BIGINT) TBLPROPERTIES ('key'='k')")
    spark.sql("INSERT INTO graft_cat.ns.tp VALUES " +
      "(1, 'a', 10), (2, 'b', 20), (3, 'c', 30)") // v1 (delta)
    spark.sql("DELETE FROM graft_cat.ns.tp WHERE k = 2") // v2 (dv)
    // history: the 3-kind chain, metadata-only
    val hist = spark.sql("CALL graft_cat.system.history('ns.tp')")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(hist.toSeq === Seq((0, "snapshot", 0L), (1, "append", 3L),
      (2, "dv", 1L)))
    // compact_dv folds the chain into a materialized snapshot
    val vC = spark.sql("CALL graft_cat.system.compact_dv('ns.tp')")
      .collect()(0).getInt(0)
    assert(vC === 3)
    assert(rows("tp").map(_._1) === Seq(1L, 3L))
    // restore rolls the tip back to the pre-delete state
    val vR = spark.sql("CALL graft_cat.system.restore('ns.tp', 1)")
      .collect()(0).getInt(0)
    assert(vR === 4)
    assert(rows("tp").map(_._1) === Seq(1L, 2L, 3L))
    // clone_table forks zero-copy into a new catalog table, CARRYING the
    // source's TBLPROPERTIES (so DV deletes keep their key)
    spark.sql("CALL graft_cat.system.clone_table('ns.tp', 'ns.tp2')")
    assert(rows("tp2").map(_._1) === Seq(1L, 2L, 3L))
    assert(operators.Versioned.isCloneVersion(dirOf("tp2"), 0))
    assert(graft.sources.GraftCatalog.readProps(dirOf("tp2"))
      .get("key") === Some("k"))
    // a typo'd table identifier fails like loadTable does — never an
    // empty "success"
    intercept[Exception] {
      spark.sql("CALL graft_cat.system.history('ns.no_such_table')")
        .collect()
    }
    // vacuum retention: keep the newest 2 of tp's 5 versions
    val vac = spark.sql("CALL graft_cat.system.vacuum('ns.tp', 2)")
      .collect()(0)
    assert(vac.getInt(0) === 4 && vac.getInt(1) > 0)
    assert(rows("tp").map(_._1) === Seq(1L, 2L, 3L)) // tip still serves
    // optimize: selective manifest de-fragmentation on a PARTITIONED
    // table living under the catalog root (partitioned tables come from
    // the programmatic surface; the procedure reaches them by name)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val pdir = dirOf("tpart")
    new java.io.File(pdir).mkdirs()
    val pt = (1L to 100L).map(k => (k, k % 10, s"n$k")).toDF("k", "p", "n")
    operators.Versioned.commitPartitioned(pt, pdir, "p")
    operators.Versioned.upsertPartitioned(spark, pdir,
      pt.filter(col("p") === 0L), "k", "p")
    val vO = spark.sql("CALL graft_cat.system.optimize('ns.tpart')")
      .collect()(0).getInt(0)
    assert(vO === 2)
    assert(operators.Versioned.manifest(pdir, vO).values.toSet.size === 2)
    // unknown procedure fails loudly (Spark wraps the catalog's listing
    // error as FAILED_TO_LOAD_ROUTINE)
    val e = intercept[Exception] {
      spark.sql("CALL graft_cat.system.nope('x')")
    }
    assert(e.getMessage.contains("nope"))
  }

  test("E182: catalog tables STREAM through the format source — same dirs, " +
      "same commit log") {
    import spark.implicits._
    spark.sql("CREATE TABLE graft_cat.ns.t11 (k BIGINT, name STRING, " +
      "bal BIGINT)")
    spark.sql("INSERT INTO graft_cat.ns.t11 VALUES (1, 'a', 10)")
    // a catalog table IS a versioned dir under the root: the streaming
    // SOURCE tails its commit log directly (no per-batch materialization
    // a v2 MicroBatchStream bridge would need — documented design)
    val q = spark.readStream.format("graft.versioned").load(dirOf("t11"))
      .writeStream.outputMode("append").format("memory")
      .queryName("cat_stream").start()
    q.processAllAvailable()
    // a live SQL INSERT is picked up by the next micro-batch
    spark.sql("INSERT INTO graft_cat.ns.t11 VALUES (2, 'b', 20)")
    q.processAllAvailable()
    q.stop()
    assert(spark.table("cat_stream").collect().map(_.getLong(0)).toSet
      === Set(1L, 2L))
  }

  test("E182: concurrent catalog INSERT INTOs never lose rows (staging " +
      "is concurrent; only the metadata-scale adoption claim-serializes)") {
    spark.sql("CREATE TABLE graft_cat.ns.t10 (k BIGINT, name STRING, " +
      "bal BIGINT)")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futures = (1L to 8L).map { k =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = {
            spark.sql(s"INSERT INTO graft_cat.ns.t10 VALUES " +
              s"($k, 'n$k', ${k * 10})")
            ()
          }
        })
      }
      futures.foreach(_.get())
    } finally pool.shutdown()
    // every writer's delta commit survives: 8 appends over the empty v0
    assert(operators.Versioned.latest(dirOf("t10")) === 8)
    assert(spark.sql("SELECT k FROM graft_cat.ns.t10").collect()
      .map(_.getLong(0)).toSet === (1L to 8L).toSet)
  }

  test("E182: racing SQL MERGEs serialize or abort — never a lost update, " +
      "end to end") {
    import spark.implicits._
    spark.sql("CREATE TABLE graft_cat.ns.t12 (k BIGINT, name STRING, " +
      "bal BIGINT)")
    spark.sql("INSERT INTO graft_cat.ns.t12 VALUES (1, 'a', 10)")
    Seq((1L, "a", 0L)).toDF("k", "name", "bal")
      .createOrReplaceTempView("t12_src")
    // two identical increment-MERGEs race: each one that REPORTS success
    // must have its +100 in the final balance (10 + 100·successes);
    // a loser must fail with the concurrent-update conflict, loudly
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val results =
      try {
        val fs = (1 to 2).map { _ =>
          pool.submit(new java.util.concurrent.Callable[Option[String]] {
            def call(): Option[String] =
              try {
                spark.sql("MERGE INTO graft_cat.ns.t12 t USING t12_src s " +
                  "ON t.k = s.k WHEN MATCHED THEN " +
                  "UPDATE SET t.bal = t.bal + 100")
                None
              } catch { case e: Exception => Some(e.getMessage) }
          })
        }
        fs.map(_.get())
      } finally pool.shutdown()
    val failures = results.flatten
    failures.foreach(msg => assert(msg.contains("concurrent update"),
      s"a losing MERGE must abort on the conflict check, got: $msg"))
    val successes = 2 - failures.size
    assert(successes >= 1, "at least one MERGE must win")
    val bal = spark.sql("SELECT bal FROM graft_cat.ns.t12 WHERE k = 1")
      .collect()(0).getLong(0)
    assert(bal === 10L + 100L * successes,
      s"$successes successful merge(s) must yield 10 + 100·$successes, " +
        s"got $bal — a lost update")
  }

  test("E182: row-level rewrite aborts loudly when the tip moved under it " +
      "(optimistic concurrency — no lost update)") {
    import spark.implicits._
    spark.sql("CREATE TABLE graft_cat.ns.t5 (k BIGINT, name STRING, " +
      "bal BIGINT) TBLPROPERTIES ('key'='k')")
    spark.sql("INSERT INTO graft_cat.ns.t5 VALUES (1, 'a', 10)")
    val d = dirOf("t5")
    val tipBefore = operators.Versioned.latest(d)
    // pin the tip the way a row-level operation's scan does, then move
    // the tip underneath it
    operators.Versioned.appendRows(
      Seq((2L, "b", 20L)).toDF("k", "name", "bal"), d)
    // the staged replace must refuse: its snapshot no longer covers k=2
    val staging = s"$d/.staging-conflict-test"
    Seq((1L, "a2", 11L)).toDF("k", "name", "bal")
      .write.mode("overwrite").parquet(staging)
    val e = intercept[Exception] {
      operators.Versioned.adoptStagedReplace(d, staging, tipBefore)
    }
    assert(e.getMessage.contains("concurrent update"))
    // nothing was lost: both rows still live, tip unchanged
    assert(rows("t5").map(_._1) === Seq(1L, 2L))
  }

  test("E189: namespaces — SHOW/CREATE/ALTER/DROP over the directory " +
      "layout; implicit namespaces list; non-empty drop refused") {
    // implicit namespace — created by CREATE TABLE alone, no CREATE
    // NAMESPACE first — lists like a declared one
    spark.sql("CREATE TABLE graft_cat.implied.seed (k BIGINT)")
    val ns0 = spark.sql("SHOW NAMESPACES IN graft_cat")
      .collect().map(_.getString(0)).toSet
    assert(ns0.contains("implied"), s"implicit 'implied' must list, got $ns0")
    // explicit namespace with properties
    spark.sql("CREATE NAMESPACE graft_cat.raw " +
      "WITH PROPERTIES ('zone'='landing')")
    assert(spark.sql("SHOW NAMESPACES IN graft_cat")
      .collect().map(_.getString(0)).toSet.contains("raw"))
    val desc = spark.sql("DESCRIBE NAMESPACE EXTENDED graft_cat.raw")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc.exists(_._2.contains("zone=landing")) ||
      desc.values.exists(_.contains("landing")), desc.toString)
    // duplicate create refused; nested namespaces list under the parent
    intercept[Exception] { spark.sql("CREATE NAMESPACE graft_cat.raw") }
    spark.sql("CREATE NAMESPACE graft_cat.raw.sub")
    assert(spark.sql("SHOW NAMESPACES IN graft_cat.raw")
      .collect().map(_.getString(0)).toSeq === Seq("raw.sub"))
    // ALTER NAMESPACE property round-trip
    spark.sql("ALTER NAMESPACE graft_cat.raw " +
      "SET PROPERTIES ('zone'='bronze')")
    assert(spark.sql("DESCRIBE NAMESPACE EXTENDED graft_cat.raw")
      .collect().exists(_.getString(1).contains("bronze")))
    // a table inside makes the namespace non-empty: DROP refused...
    spark.sql("CREATE TABLE graft_cat.raw.t (k BIGINT)")
    intercept[Exception] { spark.sql("DROP NAMESPACE graft_cat.raw") }
    assert(operators.Versioned.latest(s"$root/raw/t") >= 0,
      "refused drop must leave the table intact")
    // ...CASCADE removes the subtree
    spark.sql("DROP NAMESPACE graft_cat.raw CASCADE")
    assert(!spark.sql("SHOW NAMESPACES IN graft_cat")
      .collect().map(_.getString(0)).toSet.contains("raw"))
    // a TABLE name never lists as a namespace
    assert(!spark.sql("SHOW NAMESPACES IN graft_cat.implied")
      .collect().map(_.getString(0)).exists(_.endsWith(".seed")))
    // missing namespace fails loudly
    intercept[Exception] {
      spark.sql("SHOW NAMESPACES IN graft_cat.nope").collect()
    }
  }

  test("E191: 8-writer mixed SQL DML race (INSERT ∪ UPDATE ∪ DELETE ∪ " +
      "MERGE, disjoint keys) — serialize or abort at statement granularity") {
    spark.sql("CREATE TABLE graft_cat.ns.t13 (k BIGINT, name STRING, " +
      "bal BIGINT) TBLPROPERTIES ('key'='k')")
    spark.sql("INSERT INTO graft_cat.ns.t13 VALUES " +
      "(1, 'a', 10), (2, 'b', 20), (3, 'c', 30), (4, 'd', 40)")
    def mergeSql(k: Long): String =
      s"MERGE INTO graft_cat.ns.t13 t USING (SELECT CAST($k AS BIGINT) " +
        s"AS k, 'm$k' AS name, CAST(${k * 10} AS BIGINT) AS bal) s " +
        "ON t.k = s.k WHEN NOT MATCHED THEN INSERT *"
    // statement → is it on a path that may abort on a COW conflict?
    val stmts: Seq[(String, String, Boolean)] = Seq(
      ("ins101", "INSERT INTO graft_cat.ns.t13 VALUES (101, 'i1', 1)", false),
      ("ins102", "INSERT INTO graft_cat.ns.t13 VALUES (102, 'i2', 2)", false),
      ("upd1", "UPDATE graft_cat.ns.t13 SET bal = 111 WHERE k = 1", true),
      ("upd2", "UPDATE graft_cat.ns.t13 SET bal = 222 WHERE k = 2", true),
      ("del3", "DELETE FROM graft_cat.ns.t13 WHERE k = 3", false),
      ("del4", "DELETE FROM graft_cat.ns.t13 WHERE k = 4", false),
      ("mrg5", mergeSql(5L), true),
      ("mrg6", mergeSql(6L), true))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val outcomes =
      try {
        val fs = stmts.map { case (tag, sql, _) =>
          pool.submit(new java.util.concurrent.Callable[(String, Option[String])] {
            def call(): (String, Option[String]) = {
              gate.await()
              try { spark.sql(sql); (tag, None) }
              catch { case e: Exception => (tag, Some(e.getMessage)) }
            }
          })
        }
        gate.countDown()
        fs.map(_.get(300, java.util.concurrent.TimeUnit.SECONDS))
      } finally pool.shutdown()
    val failed = outcomes.collect { case (t, Some(m)) => t -> m }.toMap
    // losers abort LOUDLY on the conflict check, never silently
    failed.foreach { case (tag, msg) =>
      assert(msg.contains("concurrent update"),
        s"$tag must abort on the conflict check, got: $msg") }
    // additive (INSERT, delta) and claim-serialized (DELETE, DV)
    // statements never abort
    val abortable = stmts.collect { case (t, _, true) => t }.toSet
    failed.keys.foreach(t => assert(abortable.contains(t),
      s"$t is on a serialize-only path and must not abort"))
    // every reported-success statement's effect is visible at the tip;
    // every loser's is absent
    val tipRows = spark.sql(
      "SELECT k, bal FROM graft_cat.ns.t13 ORDER BY k")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tipRows.contains(101L) && tipRows.contains(102L))
    assert(!tipRows.contains(3L) && !tipRows.contains(4L))
    def effect(tag: String, present: => Boolean): Unit =
      if (failed.contains(tag)) assert(!present, s"$tag aborted but its " +
        "effect is at the tip") else assert(present, s"$tag reported " +
        "success but its effect is missing — a lost update")
    effect("upd1", tipRows(1L) === 111L)
    effect("upd2", tipRows(2L) === 222L)
    effect("mrg5", tipRows.contains(5L))
    effect("mrg6", tipRows.contains(6L))
  }

  test("E193: CREATE TABLE PARTITIONED BY — hidden partitioning through " +
      "SQL: overwrite lands partitioned, reads prune, compaction restores " +
      "coverage over flat deltas") {
    import operators.Versioned
    // a DATE column: month-range pruning is type-gated to temporal
    // columns (on a STRING column the pushed predicate compares
    // lexicographically while the residual casts to DATE — divergent on
    // malformed values, so pruning refuses and full-scans instead)
    spark.sql("CREATE TABLE graft_cat.ns.ev (ts DATE, v BIGINT) " +
      "PARTITIONED BY (months(ts)) TBLPROPERTIES ('key'='v')")
    val d = dirOf("ev")
    assert(sources.GraftCatalog.readProps(d)("gpart.transform") === "month")
    // gpart (the derived key) never reaches the logical schema
    assert(!spark.table("graft_cat.ns.ev").columns.contains("gpart"))
    // INSERT OVERWRITE = the full-state write → lands HIDDEN-PARTITIONED
    spark.sql("INSERT OVERWRITE TABLE graft_cat.ns.ev " +
      "SELECT to_date(concat('2003-', lpad(CAST(1 + CAST(id / 31 AS " +
      "INT) AS STRING), 2, '0'), '-', lpad(CAST(1 + id % 28 AS STRING), " +
      "2, '0'))), id FROM range(0, 310)")
    val tip1 = Versioned.latest(d)
    assert(Versioned.manifest(d, tip1).nonEmpty,
      "overwrite on a PARTITIONED BY table must land a manifest version")
    // a raw-column range read PRUNES driver-side (the probe pins it) and
    // row-equals the full filter
    sources.GraftScanPruneProbe.last.set("")
    val pruned = spark.sql("SELECT ts, v FROM graft_cat.ns.ev " +
      "WHERE ts >= DATE'2003-03-01' AND ts <= DATE'2003-04-30' " +
      "ORDER BY v").collect()
    assert(sources.GraftScanPruneProbe.last.get
      .startsWith("range:2003-03-01..2003-04-30"),
      s"expected a pruned read, probe=${sources.GraftScanPruneProbe.last.get}")
    assert(pruned.length === 62 && pruned.forall { r =>
      val ts = r.getDate(0).toString
      ts >= "2003-03-01" && ts <= "2003-04-30" })
    // point lookups prune over any transform shape too (ids 0 and 28
    // both land on 2003-01-01 — the generator wraps days at 28)
    sources.GraftScanPruneProbe.last.set("")
    assert(spark.sql("SELECT v FROM graft_cat.ns.ev " +
      "WHERE ts = DATE'2003-01-01'").collect().length === 2)
    assert(sources.GraftScanPruneProbe.last.get === "in:1")
    // plain INSERT INTO stays a flat delta (cost ∝ batch) — correctness
    // via the chain fold, pruning via the next compaction
    spark.sql("INSERT INTO graft_cat.ns.ev " +
      "VALUES (DATE'2003-03-05', 9999)")
    assert(Versioned.isAddVersion(d, Versioned.latest(d)))
    sources.GraftScanPruneProbe.last.set("")
    val mixed = spark.sql("SELECT v FROM graft_cat.ns.ev " +
      "WHERE ts >= '2003-03-01' AND ts <= '2003-04-30'").collect()
    assert(mixed.length === 63, "the flat delta row must fold in")
    assert(sources.GraftScanPruneProbe.last.get.startsWith("range:"),
      "the hidden BASE still prunes under a delta chain")
    // CALL compact_dv on a hidden table RE-PARTITIONS the folded state
    spark.sql("CALL graft_cat.system.compact_dv('ns.ev')")
    val tip2 = Versioned.latest(d)
    assert(Versioned.manifest(d, tip2).nonEmpty,
      "compaction must land hidden-partitioned, not flat")
    assert(spark.sql("SELECT count(*) FROM graft_cat.ns.ev " +
      "WHERE ts >= '2003-03-01' AND ts <= '2003-04-30'")
      .collect()(0).getLong(0) === 63)
    // a DV delete composes on top of the hidden base, reads stay pruned
    spark.sql("DELETE FROM graft_cat.ns.ev WHERE v = 9999")
    assert(Versioned.isDvVersion(d, Versioned.latest(d)))
    assert(spark.sql("SELECT count(*) FROM graft_cat.ns.ev " +
      "WHERE ts >= '2003-03-01' AND ts <= '2003-04-30'")
      .collect()(0).getLong(0) === 62)
    // type gate: a STRING month column never range-prunes — the pushed
    // predicate compares lexicographically, the partition window is
    // temporal; the read falls back to the full scan and stays correct
    spark.sql("CREATE TABLE graft_cat.ns.evs (ts STRING, v BIGINT) " +
      "PARTITIONED BY (months(ts))")
    spark.sql("INSERT OVERWRITE TABLE graft_cat.ns.evs " +
      "VALUES ('2003-03-05', 1), ('2003-06-05', 2)")
    sources.GraftScanPruneProbe.last.set("")
    assert(spark.sql("SELECT v FROM graft_cat.ns.evs " +
      "WHERE ts >= '2003-03-01' AND ts <= '2003-04-30'")
      .collect().map(_.getLong(0)).toSeq === Seq(1L))
    assert(sources.GraftScanPruneProbe.last.get === "full",
      "string month columns must fall back to the full scan")
    // unsupported shapes fail loudly at CREATE
    intercept[Exception] { spark.sql("CREATE TABLE graft_cat.ns.bad1 " +
      "(ts TIMESTAMP) PARTITIONED BY (hours(ts))") }
    intercept[Exception] { spark.sql("CREATE TABLE graft_cat.ns.bad2 " +
      "(ts STRING, k BIGINT) PARTITIONED BY (months(ts), bucket(4, k))") }
  }

  test("E194: identity / days / years partition transforms — SQL CREATE, " +
      "pruned reads per transform, type gates hold") {
    import operators.Versioned
    // days(ts): the practical date-partitioned-fact layout
    spark.sql("CREATE TABLE graft_cat.ns.evd (ts DATE, v BIGINT) " +
      "PARTITIONED BY (days(ts))")
    assert(sources.GraftCatalog.readProps(dirOf("evd"))("gpart.transform")
      === "day")
    spark.sql("INSERT OVERWRITE TABLE graft_cat.ns.evd " +
      "SELECT date_add(DATE'2003-01-01', CAST(id AS INT)), id " +
      "FROM range(0, 90)")
    sources.GraftScanPruneProbe.last.set("")
    val d3 = spark.sql("SELECT v FROM graft_cat.ns.evd " +
      "WHERE ts >= DATE'2003-02-01' AND ts <= DATE'2003-02-03'")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(d3 === Seq(31L, 32L, 33L))
    assert(sources.GraftScanPruneProbe.last.get
      .startsWith("range:2003-02-01..2003-02-03"),
      s"days() must range-prune, probe=" +
        sources.GraftScanPruneProbe.last.get)
    // the prune actually bit: only the admitted day partitions were kept
    assert(Versioned.manifest(dirOf("evd"),
      Versioned.latest(dirOf("evd"))).size === 90)
    // years(ts): coarse archival layout, range across a year boundary
    spark.sql("CREATE TABLE graft_cat.ns.evy (ts DATE, v BIGINT) " +
      "PARTITIONED BY (years(ts))")
    spark.sql("INSERT OVERWRITE TABLE graft_cat.ns.evy " +
      "SELECT add_months(DATE'2001-06-15', CAST(id * 4 AS INT)), id " +
      "FROM range(0, 24)") // 8 years, 3 rows each
    sources.GraftScanPruneProbe.last.set("")
    val ycnt = spark.sql("SELECT count(*) FROM graft_cat.ns.evy " +
      "WHERE ts >= DATE'2003-01-01' AND ts <= DATE'2004-12-31'")
      .collect()(0).getLong(0)
    assert(ycnt === 6L)
    assert(sources.GraftScanPruneProbe.last.get.startsWith("range:2003-"),
      s"years() must range-prune, probe=" +
        sources.GraftScanPruneProbe.last.get)
    // identity on an integral column: plain Hive-style PARTITIONED BY —
    // point lookups admit exactly the probed partition, integer ranges
    // compare numerically ('9' > '10' lexicographic divergence covered)
    spark.sql("CREATE TABLE graft_cat.ns.evi (region BIGINT, v BIGINT) " +
      "PARTITIONED BY (region)")
    assert(sources.GraftCatalog.readProps(dirOf("evi"))("gpart.transform")
      === "identity")
    spark.sql("INSERT OVERWRITE TABLE graft_cat.ns.evi " +
      "SELECT id % 12, id FROM range(0, 120)")
    sources.GraftScanPruneProbe.last.set("")
    assert(spark.sql("SELECT count(*) FROM graft_cat.ns.evi " +
      "WHERE region = 9").collect()(0).getLong(0) === 10L)
    assert(sources.GraftScanPruneProbe.last.get === "in:1")
    sources.GraftScanPruneProbe.last.set("")
    assert(spark.sql("SELECT count(*) FROM graft_cat.ns.evi " +
      "WHERE region >= 9 AND region <= 11").collect()(0).getLong(0) === 30L)
    assert(sources.GraftScanPruneProbe.last.get === "range:9..11")
    // identity on a STRING column: point/IN prunes (canonical rendering),
    // ranges fall back to the full scan (no residual-safe cast) — correct
    // either way
    spark.sql("CREATE TABLE graft_cat.ns.evs2 (seg STRING, v BIGINT) " +
      "PARTITIONED BY (seg)")
    spark.sql("INSERT OVERWRITE TABLE graft_cat.ns.evs2 VALUES " +
      "('a', 1), ('b', 2), ('b', 3), ('c', 4)")
    sources.GraftScanPruneProbe.last.set("")
    assert(spark.sql("SELECT count(*) FROM graft_cat.ns.evs2 " +
      "WHERE seg = 'b'").collect()(0).getLong(0) === 2L)
    assert(sources.GraftScanPruneProbe.last.get === "in:1")
    sources.GraftScanPruneProbe.last.set("")
    assert(spark.sql("SELECT count(*) FROM graft_cat.ns.evs2 " +
      "WHERE seg >= 'a' AND seg <= 'b'").collect()(0).getLong(0) === 3L)
    assert(sources.GraftScanPruneProbe.last.get === "full",
      "identity string ranges must fall back to the full scan")
    // escaped + NULL partition values through the FULL SQL path: ':' is
    // hive-escaped in the dir name (%3A) and NULL lands in the default
    // partition — both must survive reads (manifest keys are TRUE
    // values, the sentinel binds as IS NULL) and the escaped value must
    // still point-prune
    spark.sql("CREATE TABLE graft_cat.ns.evs3 (seg STRING, v BIGINT) " +
      "PARTITIONED BY (seg)")
    spark.sql("INSERT OVERWRITE TABLE graft_cat.ns.evs3 VALUES " +
      "('a:b', 1), ('plain', 2), (NULL, 3)")
    assert(spark.sql("SELECT count(*) FROM graft_cat.ns.evs3")
      .collect()(0).getLong(0) === 3L,
      "escaped/NULL partition values must not vanish from reads")
    assert(spark.sql("SELECT v FROM graft_cat.ns.evs3 WHERE seg IS NULL")
      .collect().map(_.getLong(0)).toSeq === Seq(3L))
    sources.GraftScanPruneProbe.last.set("")
    assert(spark.sql("SELECT v FROM graft_cat.ns.evs3 WHERE seg = 'a:b'")
      .collect().map(_.getLong(0)).toSeq === Seq(1L))
    assert(sources.GraftScanPruneProbe.last.get === "in:1",
      "escaped identity values must still point-prune")
  }

  test("E200: named version tags — VERSION AS OF 'tag' resolves, re-tag " +
      "moves, vacuum pins the tagged chain, untag releases") {
    import operators.Versioned
    spark.sql("CREATE TABLE graft_cat.ns.tg (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('key'='k')")
    spark.sql("INSERT OVERWRITE TABLE graft_cat.ns.tg " +
      "SELECT id, id FROM range(0, 5)")                      // v1 snapshot
    spark.sql("INSERT INTO graft_cat.ns.tg VALUES (100, 100)") // v2 append
    spark.sql("INSERT OVERWRITE TABLE graft_cat.ns.tg " +
      "SELECT id, id * 2 FROM range(0, 3)")                  // v3 snapshot
    spark.sql("CALL graft_cat.system.tag('ns.tg', 'stable', 2)")
    def readTag(t: String): Set[Long] =
      spark.sql(s"SELECT k FROM graft_cat.ns.tg VERSION AS OF '$t'")
        .collect().map(_.getLong(0)).toSet
    // the tag serves the chain-resolved v2 snapshot (base v1 + append)
    assert(readTag("stable") === (0L until 5L).toSet + 100L)
    // live tip is unaffected
    assert(spark.sql("SELECT k FROM graft_cat.ns.tg").collect()
      .map(_.getLong(0)).toSet === (0L until 3L).toSet)
    // listing (the procedure AND the .tags metadata table) + re-tag
    // moves the name
    assert(spark.sql("CALL graft_cat.system.tags('ns.tg')").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq === Seq("stable" -> 2))
    assert(spark.sql("SELECT * FROM graft_cat.ns.tg.tags").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq === Seq("stable" -> 2))
    spark.sql("CALL graft_cat.system.tag('ns.tg', 'stable', 3)")
    assert(readTag("stable") === (0L until 3L).toSet)
    spark.sql("CALL graft_cat.system.tag('ns.tg', 'old', 2)")
    // vacuum keeps the tagged chain's base: keepLast=1 would normally
    // cut below the tip snapshot, but 'old' pins v2's base (v1)
    val dir = dirOf("tg")
    Versioned.vacuum(dir, 1)
    assert(readTag("old") === (0L until 5L).toSet + 100L,
      "vacuum must not sever a tagged snapshot's chain")
    // a bad name and an unknown tag fail loudly
    assertThrows[RuntimeException] {
      spark.sql("SELECT * FROM graft_cat.ns.tg VERSION AS OF 'nope'")
        .collect() }
    assertThrows[IllegalArgumentException] {
      Versioned.tag(dir, "7", 2) }
    // untag releases the pin: the next vacuum reclaims below the tip
    spark.sql("CALL graft_cat.system.untag('ns.tg', 'old')")
    spark.sql("CALL graft_cat.system.untag('ns.tg', 'stable')")
    Versioned.vacuum(dir, 1)
    assert(!new java.io.File(s"$dir/v1").exists(),
      "untag must release the retention pin")
    assert(spark.sql("SELECT k FROM graft_cat.ns.tg").collect()
      .map(_.getLong(0)).toSet === (0L until 3L).toSet)
  }

  test("E198: append-link skipping — pushed predicates drop whole delta " +
      "commits via footer stats; DVs, nulls, and missing sidecars hold") {
    import operators.Versioned
    spark.sql("CREATE TABLE graft_cat.ns.ask (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('key'='k')")
    spark.sql("INSERT OVERWRITE TABLE graft_cat.ns.ask " +
      "SELECT id, id * 10 FROM range(0, 10)")               // base (v1)
    spark.sql("INSERT INTO graft_cat.ns.ask " +
      "SELECT id, id * 10 FROM range(10, 20)")              // link 1
    spark.sql("INSERT INTO graft_cat.ns.ask " +
      "SELECT id, id * 10 FROM range(20, 30)")              // link 2
    spark.sql("INSERT INTO graft_cat.ns.ask " +
      "SELECT id, id * 10 FROM range(30, 40)")              // link 3
    def q(where: String): (Set[Long], String) = {
      sources.GraftAddSkipProbe.last.set("")
      val got = spark.sql(
        s"SELECT k FROM graft_cat.ns.ask WHERE $where")
        .collect().map(_.getLong(0)).toSet
      (got, sources.GraftAddSkipProbe.last.get)
    }
    // range predicate: two links' [min, max] miss it -> skipped; result
    // is still exact (base rows fail the residual)
    val (r1, p1) = q("k >= 30")
    assert(r1 === (30L until 40L).toSet)
    assert(p1 === "skip:2/3", s"probe '$p1'")
    // point predicate into link 2: links 1 and 3 skipped
    val (r2, p2) = q("k = 25")
    assert(r2 === Set(25L) && p2 === "skip:2/3", s"probe '$p2'")
    // a DV mid-chain neither blocks skipping nor loses the delete
    spark.sql("DELETE FROM graft_cat.ns.ask WHERE k = 35")
    val (r3, p3) = q("k >= 30")
    assert(r3 === (30L until 40L).toSet - 35L)
    assert(p3 === "skip:2/3", s"probe '$p3'")
    // IS NULL: all links are null-free -> every link skipped; a link
    // WITH a null row must be kept and served
    val (r4, p4) = q("k IS NULL")
    assert(r4 === Set.empty[Long] && p4 === "skip:3/3", s"probe '$p4'")
    spark.sql("INSERT INTO graft_cat.ns.ask VALUES (CAST(NULL AS BIGINT), 99)")
    sources.GraftAddSkipProbe.last.set("")
    val nulls = spark.sql(
      "SELECT v FROM graft_cat.ns.ask WHERE k IS NULL")
      .collect().map(_.getLong(0)).toSet
    assert(nulls === Set(99L))
    assert(sources.GraftAddSkipProbe.last.get === "skip:3/4")
    // a sidecar-less link (the pre-sidecar commit shape) disables
    // skipping for the whole chain — conservative, never wrong. The
    // sidecar is removed BEFORE any read touches the link (present
    // sidecars cache — they are sealed-immutable in production)
    val dir = dirOf("ask")
    spark.sql("INSERT INTO graft_cat.ns.ask VALUES (200, 200)")
    val tip = Versioned.latest(dir)
    assert(Versioned.isAddVersion(dir, tip))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(dir, s"v$tip", "_addstats"))
    val (r5, p5) = q("k >= 30")
    assert(r5 === (30L until 40L).toSet - 35L + 200L)
    assert(p5 === "", s"probe '$p5' — missing sidecar must disable skip")
    // compaction folds the chain -> no append links -> no skip, same rows
    spark.sql(s"CALL graft_cat.system.compact_dv('ns.ask')")
    val (r6, p6) = q("k >= 30")
    assert(r6 === (30L until 40L).toSet - 35L + 200L && p6 === "")
  }

  test("E195: streaming by table identifier — readStream.table rides " +
      "the v1 fallback with full option parity; writeStream.toTable " +
      "appends delta commits") {
    import operators.Versioned
    def ckpt() = java.nio.file.Files
      .createTempDirectory("graft-st-ckpt").toString
    spark.sql("CREATE TABLE graft_cat.ns.st (k BIGINT, name STRING, " +
      "bal BIGINT) TBLPROPERTIES ('key'='k')")
    spark.sql("INSERT INTO graft_cat.ns.st VALUES (1,'a',10), (2,'b',20)")
    spark.sql("DELETE FROM graft_cat.ns.st WHERE k = 2")         // v2 (DV)
    spark.sql("INSERT INTO graft_cat.ns.st VALUES (3,'c',30)")   // v3
    // DEFAULT mode by identifier: bootstrap = the DV-folded snapshot,
    // then each later commit tails in
    val q1 = spark.readStream.table("graft_cat.ns.st")
      .writeStream.format("memory").queryName("st_tbl")
      .option("checkpointLocation", ckpt()).start()
    q1.processAllAvailable()
    assert(spark.table("st_tbl").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet === Set(1L -> 10L,
        3L -> 30L))
    spark.sql("INSERT INTO graft_cat.ns.st VALUES (4,'d',40)")   // v4
    q1.processAllAvailable()
    assert(spark.table("st_tbl").collect().map(_.getLong(0)).toSet ===
      Set(1L, 3L, 4L))
    q1.stop()
    // option parity: startingVersion + ignoreDeletes through the
    // identifier ≡ the path-based format source on the same commits
    val q2 = spark.readStream
      .option("startingVersion", 1).option("ignoreDeletes", "true")
      .table("graft_cat.ns.st")
      .writeStream.format("memory").queryName("st_tbl2")
      .option("checkpointLocation", ckpt()).start()
    q2.processAllAvailable(); q2.stop()
    val q3 = spark.readStream.format("graft.versioned")
      .option("startingVersion", 1).option("ignoreDeletes", "true")
      .load(dirOf("st"))
      .writeStream.format("memory").queryName("st_path")
      .option("checkpointLocation", ckpt()).start()
    q3.processAllAvailable(); q3.stop()
    def got(t: String) = spark.table(t).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(got("st_tbl2") === got("st_path"),
      "identifier stream must equal the format-source stream commit-" +
        "for-commit")
    assert(got("st_tbl2").map(_._1) === Seq(1L, 2L, 3L, 4L),
      "changes-from mode: v1's own rows + later adds, deletes skipped")
    // writeStream.toTable: the identifier spelling of the exactly-once
    // streaming SINK — micro-batches land as append (delta) commits
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Long)]
    // writeToV1Table requires the writer's declared format to match the
    // fallback provider (Spark's guard against silently landing a
    // different format at the table's location)
    val q4 = in.toDF.toDF("k", "name", "bal").writeStream
      .format("graft.versioned")
      .option("checkpointLocation", ckpt())
      .toTable("graft_cat.ns.st")
    in.addData((9L, "i", 90L))
    q4.processAllAvailable(); q4.stop()
    val d = dirOf("st")
    assert(Versioned.isAddVersion(d, Versioned.latest(d)),
      "toTable micro-batch must land as one append (delta) commit")
    assert(rows("st").map(_._1) === Seq(1L, 3L, 4L, 9L))
  }

  test("E197: CALL system.zorder — 2-D Morton layout whose conjunctive " +
      "zone-map pruning strictly beats a single-dimension layout") {
    import operators.Versioned
    spark.sql("CREATE TABLE graft_cat.ns.zt (a BIGINT, b BIGINT, v BIGINT)")
    spark.sql("INSERT OVERWRITE TABLE graft_cat.ns.zt " +
      "SELECT id % 32, CAST(id / 32 AS BIGINT), id FROM range(0, 1024)")
    val ver = spark.sql("CALL graft_cat.system.zorder('ns.zt', 'a', 'b', " +
      "16)").collect()(0).getInt(0)
    val d = dirOf("zt")
    assert(Versioned.manifest(d, ver).size === 16,
      "z-bucketed layout must respect the bucket bound")
    // the 4x4 query box lies inside ONE 8x8 Morton tile → 1 of 16
    // partitions admits BOTH range predicates
    val zAdmit = Versioned.prunedPartitionsMulti(d, ver,
      Seq(("a", 4L, 7L), ("b", 4L, 7L))).size
    // the 1-D comparison layout: same rows partitioned by a alone (16
    // partitions), zone maps on both columns — the b predicate cannot
    // prune (every a-partition spans b's whole range)
    val df1 = spark.sql("SELECT id % 32 AS a, CAST(id / 32 AS BIGINT) " +
      "AS b, id AS v FROM range(0, 1024)")
    val oneD = java.nio.file.Files
      .createTempDirectory("graft-zorder-1d").toString
    Versioned.commitPartitionedStatsMulti(spark,
      df1.withColumn("pa", expr("CAST(a / 2 AS BIGINT)")), oneD, "pa",
      Seq("a", "b"))
    val aAdmit = Versioned.prunedPartitionsMulti(oneD, 0,
      Seq(("a", 4L, 7L), ("b", 4L, 7L))).size
    assert(zAdmit < aAdmit,
      s"conjunctive 2-D pruning ($zAdmit parts) must beat the 1-D " +
        s"layout ($aAdmit parts) — the E152 assertion through CALL")
    // the pruned read row-equals the full SQL filter
    val got = Versioned.readPartitionedPrunedMulti(spark, d, ver,
      Seq(("a", 4L, 7L), ("b", 4L, 7L))).count()
    assert(got === spark.sql("SELECT count(*) FROM graft_cat.ns.zt " +
      "WHERE a BETWEEN 4 AND 7 AND b BETWEEN 4 AND 7")
      .collect()(0).getLong(0) && got === 16L)
    // the derived key never reaches the logical schema
    assert(!spark.table("graft_cat.ns.zt").columns.contains("gpart"))
    // declared hidden partitioning owns its layout — zorder refuses
    spark.sql("CREATE TABLE graft_cat.ns.zhid (ts DATE, v BIGINT) " +
      "PARTITIONED BY (months(ts))")
    intercept[Exception] { spark.sql(
      "CALL graft_cat.system.zorder('ns.zhid', 'v', 'v', 8)").collect() }
    // unknown column fails loudly
    intercept[Exception] { spark.sql(
      "CALL graft_cat.system.zorder('ns.zt', 'a', 'nope', 8)").collect() }
  }

  test("E196: ALTER TABLE DROP COLUMN — metadata-only via column " +
      "mapping, time travel keeps the column, guards hold, streams " +
      "fail loudly") {
    import operators.Versioned
    spark.sql("CREATE TABLE graft_cat.ns.tdrop (k BIGINT, name STRING, " +
      "bal BIGINT) TBLPROPERTIES ('key'='k')")
    spark.sql("INSERT INTO graft_cat.ns.tdrop VALUES (1,'a',10), (2,'b',20)")
    spark.sql("ALTER TABLE graft_cat.ns.tdrop DROP COLUMN bal")
    val d = dirOf("tdrop")
    assert(Versioned.isDropVersion(d, 2),
      "DROP COLUMN must land as one metadata-only drop version")
    assert(spark.table("graft_cat.ns.tdrop").columns.toSeq ===
      Seq("k", "name"))
    // time travel below the drop keeps the creation-time schema
    assert(spark.sql("SELECT bal FROM graft_cat.ns.tdrop VERSION AS OF 1 " +
      "ORDER BY bal").collect().map(_.getLong(0)).toSeq === Seq(10L, 20L))
    // DML continues in the narrowed schema: append + DV delete
    spark.sql("INSERT INTO graft_cat.ns.tdrop VALUES (3, 'c')")
    spark.sql("DELETE FROM graft_cat.ns.tdrop WHERE k = 1")
    assert(spark.sql("SELECT k, name FROM graft_cat.ns.tdrop ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq(2L -> "b", 3L -> "c"))
    // guards: the declared key refuses; a missing column refuses unless
    // IF EXISTS; the hidden-partition source column refuses
    intercept[Exception] {
      spark.sql("ALTER TABLE graft_cat.ns.tdrop DROP COLUMN k") }
    intercept[Exception] {
      spark.sql("ALTER TABLE graft_cat.ns.tdrop DROP COLUMN nope") }
    spark.sql("ALTER TABLE graft_cat.ns.tdrop DROP COLUMN IF EXISTS nope")
    spark.sql("CREATE TABLE graft_cat.ns.tdrop2 (ts DATE, v BIGINT) " +
      "PARTITIONED BY (months(ts))")
    intercept[Exception] {
      spark.sql("ALTER TABLE graft_cat.ns.tdrop2 DROP COLUMN ts") }
    // a stream crossing the drop version fails loudly (schema fixed at
    // start — the rename contract, drop parity)
    val q = spark.readStream.option("startingVersion", 1)
      .table("graft_cat.ns.tdrop")
      .writeStream.format("memory").queryName("tdrop_s")
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft-drop-ckpt").toString)
      .start()
    val e = intercept[Exception] { q.processAllAvailable() }
    assert(e.getMessage.contains("rename/drop"),
      s"stream must fail loudly at the drop version: ${e.getMessage}")
    q.stop()
  }

  test("E188 x E193: a small hidden-partitioned dim PRUNES and " +
      "BROADCASTS on one read path (stats reroute no longer excludes " +
      "hidden tables)") {
    import spark.implicits._
    spark.sql("CREATE TABLE graft_cat.ns.hdim (ts DATE, k BIGINT, " +
      "name STRING) PARTITIONED BY (months(ts))")
    spark.sql("INSERT OVERWRITE TABLE graft_cat.ns.hdim " +
      "SELECT add_months(DATE'2003-01-15', CAST(id % 6 AS INT)), id, " +
      "concat('n', id) FROM range(1, 61)")
    // real (tiny) size estimate on the hidden table's logical read
    val rel = spark.table("graft_cat.ns.hdim")
    val stats = rel.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(stats > 0 && stats < 10L * 1024 * 1024,
      s"hidden-partitioned catalog dim must report real stats, got $stats")
    // ...so the fact ⋈ hidden-dim join broadcasts
    val fact = (1L to 20000L).map(i => (i % 80L, i)).toDF("k", "v")
    val joined = fact.join(rel.select("k", "name"), Seq("k"))
    assert(joined.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"),
      "small hidden-partitioned catalog dim must broadcast")
    assert(joined.count() === fact.filter(col("k").between(1, 60)).count())
    // ...and the SAME read path still prunes raw-column ranges
    sources.GraftScanPruneProbe.last.set("")
    val pruned = spark.sql("SELECT k FROM graft_cat.ns.hdim " +
      "WHERE ts >= DATE'2003-03-01' AND ts <= DATE'2003-04-30'")
    assert(pruned.collect().length === 20)
    assert(sources.GraftScanPruneProbe.last.get
      .startsWith("range:2003-03-01..2003-04-30"),
      s"rerouted hidden read must still prune, probe=" +
        sources.GraftScanPruneProbe.last.get)
  }

  test("E192: TBLPROPERTIES expectation gates — INSERT INTO quarantines " +
      "rejects, clean batches adopt by rename, only ingest is gated") {
    spark.sql("CREATE TABLE graft_cat.ns.gated (k BIGINT, name STRING, " +
      "bal BIGINT) TBLPROPERTIES ('key'='k', " +
      "'expectation.nonneg_bal'='bal >= 0', " +
      "'expectation.has_name'='name IS NOT NULL')")
    val d = dirOf("gated")
    // mixed batch: valid rows commit as the delta, rejects quarantine
    // with the violated gate names (NULL name counts as a violation)
    spark.sql("INSERT INTO graft_cat.ns.gated VALUES " +
      "(1, 'a', 10), (2, NULL, 20), (3, 'c', -5), (4, 'd', 40)")
    assert(operators.Versioned.isAddVersion(d, 1))
    assert(spark.sql("SELECT k FROM graft_cat.ns.gated ORDER BY k")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 4L))
    val quar = operators.Versioned.quarantine(spark, d).collect()
      .map(r => r.getAs[Long]("k") ->
        (r.getAs[String]("violations"), r.getAs[Int]("commit_version")))
      .toMap
    assert(quar === Map(2L -> ("has_name", 1), 3L -> ("nonneg_bal", 1)))
    // a fully-clean batch adopts by RENAME (no rewrite) — pinned by the
    // staged part-file names surviving into the committed _add dir
    spark.sql("INSERT INTO graft_cat.ns.gated VALUES (5, 'e', 50)")
    assert(operators.Versioned.isAddVersion(d, 2))
    assert(operators.Versioned.quarantine(spark, d).count() === 2)
    // INSERT OVERWRITE is NOT gated (wholesale replace) and a COW UPDATE
    // must not re-judge carried-over rows it makes temporarily invalid
    spark.sql("UPDATE graft_cat.ns.gated SET bal = -1 WHERE k = 5")
    assert(spark.sql(
      "SELECT bal FROM graft_cat.ns.gated WHERE k = 5")
      .collect()(0).getLong(0) === -1L)
    spark.sql("INSERT OVERWRITE TABLE graft_cat.ns.gated " +
      "VALUES (9, NULL, -9)")
    assert(spark.sql("SELECT k FROM graft_cat.ns.gated")
      .collect().map(_.getLong(0)).toSeq === Seq(9L))
  }

  test("E191b: racing appends vs COW rewrites — a reported-success append " +
      "is never buried under the rewrite's new base") {
    import spark.implicits._
    spark.sql("CREATE TABLE graft_cat.ns.t14 (k BIGINT, name STRING, " +
      "bal BIGINT) TBLPROPERTIES ('key'='k')")
    spark.sql("INSERT INTO graft_cat.ns.t14 VALUES (1, 'a', 10)")
    val d = dirOf("t14")
    // the pre-fix anomaly: an append CLAIMS v_{N+1}, a COW rewrite
    // pinned at v_N passes its tip-unmoved check (the claim is unsealed),
    // seals a full snapshot ABOVE it, and the append then seals BELOW
    // the new materialized base — reported success, rows unreachable.
    // With every seal claim-held, the interleaving is impossible: 6
    // appenders race 2 retrying COW UPDATEs and every appended row must
    // be readable at the final tip.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val appends = (101L to 106L).map { k =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = {
            operators.Versioned.appendRows(
              Seq((k, s"n$k", k)).toDF("k", "name", "bal"), d)
            ()
          }
        })
      }
      val updates = (1 to 2).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = {
            var attempts = 0
            var done = false
            while (!done) {
              attempts += 1
              try {
                spark.sql("UPDATE graft_cat.ns.t14 " +
                  "SET bal = bal + 100 WHERE k = 1")
                done = true
              } catch {
                case e: Exception if attempts < 30 &&
                    e.getMessage.contains("concurrent update") => ()
              }
            }
          }
        })
      }
      (appends ++ updates).foreach(
        _.get(300, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    val tip = spark.sql("SELECT k, bal FROM graft_cat.ns.t14 ORDER BY k")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (101L to 106L).foreach(k => assert(tip.contains(k),
      s"append of k=$k reported success but its rows are unreachable — " +
        "buried under a COW rewrite's base"))
    assert(tip(1L) === 210L, s"both retried UPDATEs must land: ${tip(1L)}")
  }

  test("E190: SQL CDC on catalog tables — the <table>.changes metadata " +
      "table and reader-option forwarding serve the version diff") {
    import spark.implicits._
    spark.sql("CREATE TABLE graft_cat.ns.cdc (k BIGINT, name STRING, " +
      "bal BIGINT) TBLPROPERTIES ('key'='k')")
    spark.sql("INSERT INTO graft_cat.ns.cdc VALUES " +
      "(1, 'a', 10), (2, 'b', 20), (3, 'c', 30)")                 // v1
    spark.sql("UPDATE graft_cat.ns.cdc SET bal = 25 WHERE k = 2") // v2
    spark.sql("DELETE FROM graft_cat.ns.cdc WHERE k = 3")         // v3 (DV)
    spark.sql("INSERT INTO graft_cat.ns.cdc VALUES (4, 'd', 40)") // v4
    // pure-SQL face: bounded VERSION AS OF 'v0..v1' on the .changes table
    val sql = spark.sql("SELECT k, change_type, o_bal, n_bal " +
      "FROM graft_cat.ns.cdc.changes VERSION AS OF '1..4' ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(sql.toSeq === Seq((2L, "changed"), (3L, "removed"),
      (4L, "added")))
    // unbounded = table creation (v0, empty) → tip: everything "added"
    assert(spark.sql("SELECT change_type FROM graft_cat.ns.cdc.changes")
      .collect().map(_.getString(0)).toSet === Set("added"))
    // the path-based v1 option face agrees byte-for-byte
    val opt = spark.read.format("graft.versioned")
      .option("changesFrom", 1).option("changesTo", 4)
      .option("key", "k").option("compareCols", "name,bal")
      .load(dirOf("cdc"))
      .select("k", "change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(opt.toSeq === sql.toSeq)
    // loud failures: uncommitted endpoint, reversed bounds, missing key
    intercept[Exception] { spark.sql(
      "SELECT * FROM graft_cat.ns.cdc.changes VERSION AS OF '1..99'")
      .collect() }
    intercept[Exception] { spark.sql(
      "SELECT * FROM graft_cat.ns.cdc.changes VERSION AS OF '4..1'")
      .collect() }
    spark.sql("CREATE TABLE graft_cat.ns.nokey (k BIGINT)")
    intercept[Exception] { spark.sql(
      "SELECT * FROM graft_cat.ns.nokey.changes").collect() }
  }

  test("E188: catalog-table reads report real statistics — a small " +
      "catalog dim BROADCASTS in a join, pushdown intact") {
    import spark.implicits._
    spark.sql("CREATE TABLE graft_cat.ns.dim (k BIGINT, name STRING, " +
      "bal BIGINT) TBLPROPERTIES ('key'='k')")
    spark.sql("INSERT INTO graft_cat.ns.dim " +
      "SELECT id, concat('n', id), id * 10 FROM range(1, 52)")
    // the logical read claims its true (tiny) footprint instead of the
    // defaultSizeInBytes infinity the V1ScanWrapper path reports
    val rel = spark.table("graft_cat.ns.dim")
    val stats = rel.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(stats > 0 && stats < 10L * 1024 * 1024,
      s"expected a small real size estimate, got $stats")
    // ...which is what lets a fact ⋈ catalog-dim join BROADCAST
    val fact = (1L to 20000L).map(i => (i % 60L, i)).toDF("k", "v")
    val joined = fact.join(rel, Seq("k"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"small catalog dim must broadcast:\n$plan")
    assert(joined.count() ===
      fact.filter(col("k").between(1, 51)).count())
    // pushdown/pruning still reach the inner parquet scans on the
    // rerouted read path
    val planned = spark.sql(
      "SELECT name FROM graft_cat.ns.dim WHERE bal >= 100")
    val scans = planned.queryExecution.executedPlan.collectLeaves()
      .map(_.toString)
    assert(scans.exists(l => l.contains("PushedFilters") &&
      l.contains("bal")), s"expected bal pushed:\n${scans.mkString("\n")}")
    assert(scans.exists(l => l.contains("ReadSchema") &&
      !l.contains("ReadSchema: struct<k")),
      s"expected k pruned from the scan:\n${scans.mkString("\n")}")
    assert(planned.collect().map(_.getString(0)).sorted.take(2).toSeq ===
      Seq("n10", "n11"))
    // the _version metadata column still serves (rewrite skipped there)
    assert(spark.sql("SELECT DISTINCT _version FROM graft_cat.ns.dim")
      .collect().map(_.getInt(0)).toSeq === Seq(1))
    // time travel reads stay pinned through the rerouted path
    assert(spark.sql(
      "SELECT count(*) FROM graft_cat.ns.dim VERSION AS OF 0")
      .collect()(0).getLong(0) === 0L)
  }

  test("E187: DELETE of NULL-keyed rows takes the DV path and actually " +
      "removes them (null-safe anti-join)") {
    import spark.implicits._
    spark.sql("CREATE TABLE graft_cat.ns.tnull (k BIGINT, name STRING, " +
      "bal BIGINT) TBLPROPERTIES ('key'='k')")
    // one NULL-keyed row next to ordinary keys: plain-equality anti-join
    // semantics would commit the DV, report success, and silently KEEP
    // the matched null-keyed row (null never equals null)
    Seq((Some(1L), "a", 10L), (Some(2L), "b", 20L), (None, "ghost", 99L))
      .toDF("k", "name", "bal")
      .write.format("graft.versioned").mode("append").save(dirOf("tnull"))
    spark.sql("DELETE FROM graft_cat.ns.tnull WHERE k IS NULL")
    val d = dirOf("tnull")
    assert(operators.Versioned.isDvVersion(d, operators.Versioned.latest(d)),
      "IS NULL is losslessly translatable — must take the DV path")
    assert(rows("tnull") === Seq((1L, "a", 10L), (2L, "b", 20L)),
      "the null-keyed row must actually be gone")
    // and a delete that does NOT name the null row keeps it intact
    spark.sql("INSERT INTO graft_cat.ns.tnull VALUES (NULL, 'ghost2', 7)")
    spark.sql("DELETE FROM graft_cat.ns.tnull WHERE k = 1")
    assert(spark.sql("SELECT name FROM graft_cat.ns.tnull ORDER BY name")
      .collect().map(_.getString(0)).toSeq === Seq("b", "ghost2"))
  }

  test("E187: stale 'key' property after a rename — the key resolves " +
      "through the rename chain, DV DELETE stays correct") {
    spark.sql("CREATE TABLE graft_cat.ns.tren (k BIGINT, name STRING, " +
      "bal BIGINT) TBLPROPERTIES ('key'='k')")
    spark.sql("INSERT INTO graft_cat.ns.tren VALUES " +
      "(1, 'a', 10), (2, 'b', 20), (3, 'c', 30)")
    spark.sql("ALTER TABLE graft_cat.ns.tren RENAME COLUMN k TO id")
    val d = dirOf("tren")
    // ALTER fixed the property up under one claim...
    assert(sources.GraftCatalog.readProps(d)("key") === "id")
    // ...but simulate the claim-free load that interleaved the rename's
    // seal and the property fix-up: force the RETIRED name back in
    sources.GraftCatalog.writeProps(d,
      sources.GraftCatalog.readProps(d) + ("key" -> "k"))
    spark.sql("DELETE FROM graft_cat.ns.tren WHERE id = 2")
    assert(operators.Versioned.isDvVersion(d, operators.Versioned.latest(d)),
      "stale key name must resolve through the rename chain, not fall " +
        "back to a COW rewrite or fail unresolved")
    assert(spark.sql("SELECT id FROM graft_cat.ns.tren ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 3L))
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Layout/extension mechanics: bucketed joins run shuffle-free, salted joins
  * return exactly the plain-join result, and the GraftExtensions SQL
  * functions resolve.
  */
class LayoutSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val warehouse =
    java.nio.file.Files.createTempDirectory("graft-wh").toString

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir", warehouse)
    .config("spark.ui.enabled", "false")
    .withExtensions(new GraftExtensions)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  test("bucketed tables join without an exchange (co-located sort-merge)") {
    operators.Layout.writeBucketed(
      Tables.orders(spark, sf), "orders_b", "o_custkey", 4)
    operators.Layout.writeBucketed(
      Tables.customer(spark, sf).withColumn("o_custkey", col("c_custkey")),
      "customer_b", "o_custkey", 4)
    val joined = spark.table("orders_b")
      .join(spark.table("customer_b").hint("merge"), "o_custkey")
    joined.collect()
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"),
      s"expected shuffle-free bucketed join:\n$p")
    assert(joined.count() === Tables.orders(spark, sf).count())
  }

  test("salted join returns exactly the plain join's rows") {
    val o = Tables.orders(spark, sf)
    val n = Tables.nation(spark, sf)
      .withColumn("o_custkey", (col("n_nationkey") % 10).cast("long"))
      .select("o_custkey", "n_name")
    val plain = o.join(n, Seq("o_custkey"))
      .select("o_orderkey", "n_name").collect().map(_.toSeq).toSet
    val salted = operators.Layout.saltedJoin(o, n, "o_custkey", 8)
      .select("o_orderkey", "n_name").collect().map(_.toSeq).toSet
    assert(salted === plain && plain.nonEmpty)
  }

  test("GraftExtensions: native expressions callable from SQL") {
    Tables.documents(spark, sf).createOrReplaceTempView("docs_ext")
    val r = spark.sql(
      """SELECT doc_id, simhash64(text) AS sh,
        |  size(minhash_sig(shingle_hashes(text), 8)) AS k,
        |  jaccard_long(shingle_hashes(text), shingle_hashes(text)) AS self_jac
        |FROM docs_ext LIMIT 5""".stripMargin).collect()
    assert(r.length === 5)
    assert(r.forall(_.getInt(2) === 8))
    assert(r.forall(_.getDouble(3) === 1.0))
  }

  test("GraftExtensions: vector expressions callable from SQL") {
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb_ext")
    val r = spark.sql(
      """SELECT vec_id, cosine_sim(embedding, embedding) AS self_sim,
        |  cosine_lsh_bucket(embedding) AS b8,
        |  cosine_lsh_bucket(embedding, 4, 1) AS b4t1
        |FROM emb_ext LIMIT 5""".stripMargin).collect()
    assert(r.length === 5)
    assert(r.forall(x => math.abs(x.getDouble(1) - 1.0) < 1e-12))
    assert(r.forall(x => x.getLong(2) >= 0 && x.getLong(2) < 256))
    assert(r.forall(x => x.getLong(3) >= 0 && x.getLong(3) < 16))
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for SURVEY.md §2 rows that have no DuckDB-portable oracle:
  * F6 (map functions — no map column in testdata), F8 (Hive xpath_* scalar
  * surface — the query-side twin of the reference's XML domain), S8
  * (csv/json sinks), and the cast edge semantics of §1.4.
  */
class CoverageSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("F6: map_keys / map_values / element_at over a map column") {
    import spark.implicits._
    val df = Seq((1, Map("a" -> 10, "b" -> 20)), (2, Map("c" -> 30)))
      .toDF("id", "m")
    val r = df.select(col("id"),
      array_sort(map_keys(col("m"))).as("ks"),
      array_sort(map_values(col("m"))).as("vs"),
      element_at(col("m"), "a").as("a"))
      .orderBy("id").collect()
    assert(r(0).getSeq[String](1).toSeq === Seq("a", "b"))
    assert(r(0).getSeq[Int](2).toSeq === Seq(10, 20))
    assert(r(0).getInt(3) === 10)
    assert(r(1).isNullAt(3))
  }

  test("F8: Hive xpath_* scalar functions work over XML strings") {
    import spark.implicits._
    val xml = "<book><title>Spark</title><price>42.5</price><tag>a</tag><tag>b</tag></book>"
    val df = Seq(xml).toDF("x")
    val r = df.select(
      expr("xpath_string(x, '/book/title')").as("title"),
      expr("xpath_double(x, '/book/price')").as("price"),
      expr("xpath(x, '/book/tag/text()')").as("tags")).collect()(0)
    assert(r.getString(0) === "Spark")
    assert(r.getDouble(1) === 42.5)
    assert(r.getSeq[String](2).toSeq === Seq("a", "b"))
  }

  test("S8: csv and json sinks round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("sinks").toFile
    val df = Tables.nation(spark, "/root/testdata/sf0.001")
    df.write.mode("overwrite").option("header", "true")
      .csv(s"$dir/nation_csv")
    df.write.mode("overwrite").json(s"$dir/nation_json")
    val csvBack = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$dir/nation_csv")
    val jsonBack = spark.read.json(s"$dir/nation_json")
    assert(csvBack.count() === 25 && jsonBack.count() === 25)
    assert(jsonBack.select("n_name").distinct().count() === 25)
  }

  test("§1.4 cast semantics: double→int truncates toward zero, bad strings fail per mode") {
    import spark.implicits._
    val r = Seq((2.7, -2.7)).toDF("a", "b")
      .select(col("a").cast("int"), col("b").cast("int")).collect()(0)
    assert(r.getInt(0) === 2 && r.getInt(1) === -2)
  }

  test("SparkEntry contract: every oracle key has a query; entry returns rows") {
    val qs = SparkEntry.queries.keySet
    val orphan = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphan.isEmpty, s"oracles without queries: $orphan")
    assert(qs.size >= 70, s"expected >= 70 declared queries, got ${qs.size}")
  }
}

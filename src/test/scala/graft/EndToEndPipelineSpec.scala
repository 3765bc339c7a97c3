package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The whole library composed the way a corpus pipeline actually runs:
  * XML ingest → per-doc quality stats → repetition gate → near-dup
  * clustering → survivor selection → reproducible sample → parquet.
  * Every stage is an operator under test elsewhere; this spec pins that they
  * compose (schemas line up, no stage breaks another's assumptions).
  */
class EndToEndPipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("XML corpus -> quality gate -> dedup -> sample -> parquet") {
    import graft.syntax._

    // 1. a small XML corpus: 6 docs — one near-dup pair, one repetitive doc
    val dir = java.nio.file.Files.createTempDirectory("e2e").toFile
    val schemaDir = new java.io.File(dir, "schema"); schemaDir.mkdirs()
    val dataDir = new java.io.File(dir, "data"); dataDir.mkdirs()
    java.nio.file.Files.writeString(new java.io.File(schemaDir, "doc.xsd").toPath,
      """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:complexType name="docType">
        |    <xs:sequence>
        |      <xs:element type="xs:long" name="doc_id"/>
        |      <xs:element type="xs:string" name="text"/>
        |    </xs:sequence>
        |  </xs:complexType>
        |</xs:schema>""".stripMargin)
    val base = "the catalyst optimizer pushes filters and prunes columns " +
      "before the shuffle so large scans stay narrow and fast at scale"
    val docs = Seq(
      1L -> base,
      2L -> base.replace("fast", "quick"),               // near-dup of 1
      3L -> "completely different prose about cooking rice with saffron and butter in a heavy pot",
      4L -> Seq.fill(20)("spam").mkString(" "),           // repetitive: gated out
      5L -> "short unique remark concerning maritime law and its many precedents",
      6L -> "another distinct document describing the migration patterns of arctic terns")
    java.nio.file.Files.writeString(new java.io.File(dataDir, "d.xml").toPath,
      docs.map { case (id, t) => s"<doc><doc_id>$id</doc_id><text>$t</text></doc>" }
        .mkString("<corpus>", "", "</corpus>"))

    // 2. ingest
    val corpus = spark.read.format("graft.xml")
      .option("xml.schema.location", schemaDir.getAbsolutePath)
      .option("xml.separator.tag", "doc")
      .option("xml.separator.tag.type", "docType")
      .load(dataDir.getAbsolutePath)
    assert(corpus.count() === 6)

    // 3. repetition gate (distinct-unigram ratio >= 0.3 as in q_text_repetition)
    val stats = corpus.select(col("doc_id"), col("text"),
      graft.functions.TextHashes.textStatsOne(col("text"), Nil).as("st"))
    val kept = stats.filter(
      col("st.distinct_tokens").cast("double") /
        col("st.n_tokens").cast("double") >= 0.3)
      .select("doc_id", "text")
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSet ===
      Set(1L, 2L, 3L, 5L, 6L)) // the spam doc is gone

    // 4. near-dup pairs -> clusters -> survivors (smallest id per cluster)
    val pairs = kept.nearDupPairs("text", "doc_id", threshold = 0.5)
    val labels = pairs.dupClusters().withColumnRenamed("id", "doc_id")
    val survivors = kept.join(labels, Seq("doc_id"), "left")
      .filter(col("label").isNull || col("label") === col("doc_id"))
      .select("doc_id", "text")
    assert(survivors.select("doc_id").collect().map(_.getLong(0)).toSet ===
      Set(1L, 3L, 5L, 6L)) // doc 2 deduped into doc 1's cluster

    // 5. reproducible sample is a subset and stable across runs
    val s1 = survivors.hashSample(col("doc_id"), 75)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = survivors.hashSample(col("doc_id"), 75)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 === s2 && s1.subsetOf(Set(1L, 3L, 5L, 6L)))

    // 6. write parquet and read back intact
    val out = new java.io.File(dir, "out").getAbsolutePath
    survivors.write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() === 4)
    assert(back.columns.toSeq === Seq("doc_id", "text"))
  }
}

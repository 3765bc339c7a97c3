package graft.xml

import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end `spark.read.format("graft.xml")` tests over the three fixture
  * families — replaces the reference's assertion-free println smoke tests
  * (`TestAvroTranformer.scala:58-66`) with golden rows (SURVEY.md §5.2).
  */
class XmlReadSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val base = "src/test/resources/graftxml"

  private def readLibrary = spark.read.format("graft.xml")
    .option("xml.schema.location", s"$base/library/schema")
    .option("xml.separator.tag", "item")
    .option("xml.separator.tag.type", "itemType")
    .option("xml.separator.tag.type.ns", "")
    .load(s"$base/library/data")

  test("S7: the reference's XML→Avro pipeline — read XML, sink Avro, round-trip") {
    // The reference's whole purpose (AvroFromXmlSerde: XML in, Avro records
    // out), end to end on the Spark-native stack: graft.xml read → the
    // built-in avro sink (bundled in Spark 4's spark-sql) → re-read, full
    // row equality including nested structs and arrays.
    val dir = java.nio.file.Files.createTempDirectory("xml2avro").toString
    val xml = readLibrary
    // Spark 4 bundles the avro classes in spark-sql but not the "avro"
    // DataSourceRegister alias — address the FileFormat by class name.
    val avro = "org.apache.spark.sql.avro.AvroFileFormat"
    xml.write.mode("overwrite").format(avro).save(s"$dir/library_avro")
    val back = spark.read.format(avro).load(s"$dir/library_avro")
    assert(back.schema === xml.schema)
    val a = xml.orderBy("sku").collect().map(_.toString).toSeq
    val b = back.orderBy("sku").collect().map(_.toString).toSeq
    assert(a === b && a.length === 4)
  }

  test("library: full records — nested structs, arrays, trim, coercions") {
    val rows = readLibrary.orderBy("sku").collect()
    // 4 records: the junk:item element counts too — data-side tag matching is
    // namespace-blind by local name (AvroTransormer.scala:106,143 parity).
    assert(rows.length === 4)
    val r1 = rows.find(_.getAs[String]("sku") == "SKU-001").get
    assert(r1.getAs[String]("title") === "Distributed Query Engines")
    assert(r1.getAs[Double]("price") === 54.90)
    assert(r1.getAs[Long]("isbn") === 9780000000017L)
    assert(r1.getAs[Boolean]("in_print") === true)
    assert(r1.getAs[String]("released") === "2021-03-14")
    assert(r1.getAs[Float]("weight_kg") === 1.25f)
    assert(r1.getAs[Row]("publisher").getAs[String]("pub_name") === "Lakeside Press")
    assert(r1.getSeq[String](r1.fieldIndex("tag")).toSeq === Seq("systems", "databases"))
    val reviews = r1.getSeq[Row](r1.fieldIndex("review")).toSeq
    assert(reviews.toSeq.map(x => (x.getAs[String]("reviewer"), x.getAs[Int]("stars")))
      === Seq(("ada", 5), ("grace", 4)))
    assert(r1.getAs[Int]("shelf") === 3)

    val r2 = rows.find(_.getAs[String]("sku") == "SKU-002").get
    assert(r2.getAs[String]("title") === "Padded Title") // text trimmed
    assert(r2.isNullAt(r2.fieldIndex("isbn")))
    assert(r2.isNullAt(r2.fieldIndex("publisher")))
    assert(r2.getSeq[String](r2.fieldIndex("tag")).toSeq === Seq("essays"))
    assert(r2.isNullAt(r2.fieldIndex("shelf"))) // unknown_attr silently dropped

    val r3 = rows.find(_.getAs[String]("sku") == "SKU-003").get
    assert(r3.getAs[Row]("publisher").isNullAt(1)) // city minOccurs=0 absent
  }

  test("column pruning: projecting two fields parses only those subtrees") {
    val df = readLibrary.select("sku", "price")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<price:double,sku:string>") ||
      plan.contains("ReadSchema: struct<sku:string,price:double>"),
      s"pruned schema not pushed to scan:\n$plan")
    val got = df.collect().map(r => (r.getString(0), if (r.isNullAt(1)) -1.0 else r.getDouble(1))).toMap
    assert(got("SKU-001") === 54.90 && got("SKU-002") === 12.0 && got("SKU-003") === 7.5)
  }

  test("xsi:nil reads as null; absent attrs and empty elements take XSD defaults") {
    val df = spark.read.format("graft.xml")
      .option("xml.schema.location", s"$base/nildefaults/schema")
      .option("xml.separator.tag", "reading")
      .option("xml.separator.tag.type", "readingType")
      .option("xml.separator.tag.type.ns", "")
      .load(s"$base/nildefaults/data")
    val rows = df.orderBy("id").collect()
    assert(rows.length === 3)
    val Seq(r1, r2, r3) = rows.toSeq
    // r1: everything explicit — defaults must NOT override present values
    assert(r1.getAs[String]("source") === "sensor")
    assert(r1.getAs[Int]("version") === 1)
    assert(r1.getAs[Double]("value") === 21.5)
    assert(r1.getAs[String]("unit") === "kelvin")
    assert(r1.getAs[String]("note") === "ok")
    // r2: xsi:nil value → null; absent attrs take default/fixed;
    // present-but-empty unit takes its default; absent note stays null
    assert(r2.isNullAt(r2.fieldIndex("value")))
    assert(r2.getAs[String]("source") === "manual")
    assert(r2.getAs[Int]("version") === 2)
    assert(r2.getAs[String]("unit") === "celsius")
    assert(r2.isNullAt(r2.fieldIndex("note")))
    // r3: xsi:nil="false" is not nil; self-closed unit takes the default
    assert(r3.getAs[Double]("value") === 3.5)
    assert(r3.getAs[String]("unit") === "celsius")
  }

  test("venetian blind: namespaced data, attribute-only-ish records") {
    val df = spark.read.format("graft.xml")
      .option("xml.schema.location", s"$base/venetian/schema")
      .option("xml.separator.tag", "Player")
      .option("xml.separator.tag.type", "PlayerType")
      .option("xml.separator.tag.type.ns", "http://example.org/graft/team")
      .load(s"$base/venetian/data")
    val rows = df.orderBy("Number").collect()
    assert(rows.map(r => (r.getAs[Int]("Number"), r.getAs[String]("Alias"),
      r.getAs[String]("Position"))).toSeq ===
      Seq((1, "hawk", "keeper"), (4, "anchor", "back"), (7, "swift", "wing")))
  }

  test("simpleContent: _Value text + attributes on the same element") {
    val df = spark.read.format("graft.xml")
      .option("xml.schema.location", s"$base/simplecontent/schema")
      .option("xml.separator.tag", "sample")
      .option("xml.separator.tag.type", "sampleType")
      .load(s"$base/simplecontent/data")
    val rows = df.orderBy("id").collect()
    assert(rows.length === 2)
    val t1 = rows(0).getAs[Row]("temperature")
    assert(t1.getAs[Double]("_Value") === 21.5)
    assert(t1.getAs[String]("unit") === "C")
    assert(t1.getAs[String]("sensor") === "s1")
    assert(rows(1).isNullAt(rows(1).fieldIndex("humidity")))
    assert(rows(0).getAs[String]("at") === "2024-06-01T10:00:00Z")
  }

  test("many-files contract: a directory of XML files reads as one table") {
    val dir = java.nio.file.Files.createTempDirectory("xmlmany").toFile
    val dataDir = new java.io.File(dir, "data"); dataDir.mkdirs()
    (0 until 8).foreach { f =>
      val recs = (0 until 5).map(i =>
        s"<item sku='F$f-$i'><title>t</title><price>${f * 10 + i}</price>" +
          "<in_print>true</in_print></item>").mkString
      java.nio.file.Files.writeString(
        new java.io.File(dataDir, s"part-$f.xml").toPath,
        s"<library>$recs</library>")
    }
    val df = spark.read.format("graft.xml")
      .option("xml.schema.location", s"$base/library/schema")
      .option("xml.separator.tag", "item")
      .option("xml.separator.tag.type", "itemType")
      .load(dataDir.getAbsolutePath)
    assert(df.count() === 40)
    assert(df.select("sku").distinct().count() === 40)
    // files are non-splittable, so record counts survive any partitioning
    assert(df.rdd.getNumPartitions >= 1)
  }

  test("XML → parquet round-trip preserves rows and schema (S2 contract)") {
    val out = java.nio.file.Files.createTempDirectory("xmlrt").toString
    readLibrary.write.mode("overwrite").parquet(s"$out/lib")
    val back = spark.read.parquet(s"$out/lib")
    assert(back.count() === readLibrary.count())
    assert(back.schema.fieldNames.sorted === readLibrary.schema.fieldNames.sorted)
    val a = readLibrary.orderBy("sku").collect().map(_.toString)
    val b = back.orderBy("sku").collect().map(_.toString)
    assert(a.toSeq === b.toSeq)
  }

  test("mode=DROPMALFORMED skips corrupt records and keeps good ones") {
    val dir = java.nio.file.Files.createTempDirectory("xmldrop").toFile
    val schemaDir = new java.io.File(dir, "schema"); schemaDir.mkdirs()
    val dataDir = new java.io.File(dir, "data"); dataDir.mkdirs()
    java.nio.file.Files.writeString(new java.io.File(schemaDir, "s.xsd").toPath,
      """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:complexType name="rType">
        |    <xs:sequence>
        |      <xs:element type="xs:int" name="n"/>
        |      <xs:element type="xs:string" name="s" minOccurs="0"/>
        |    </xs:sequence>
        |  </xs:complexType>
        |</xs:schema>""".stripMargin)
    java.nio.file.Files.writeString(new java.io.File(dataDir, "d.xml").toPath,
      "<root><r><n>1</n><s>ok</s></r>" +
        "<r><n>bogus</n><s>bad-leaf</s></r>" +            // corrupt mid-record
        "<r><n>not</n><deep><x>y</x></deep></r>" +        // corrupt with subtree
        "<r><n>3</n></r></root>")
    val df = spark.read.format("graft.xml")
      .option("xml.schema.location", schemaDir.getAbsolutePath)
      .option("xml.separator.tag", "r")
      .option("xml.separator.tag.type", "rType")
      .option("mode", "DROPMALFORMED")
      .load(dataDir.getAbsolutePath)
    // single-scan action (no orderBy): accumulator updates count once per
    // scan execution, so a sort's sampling pass would double them.
    val rows = df.collect().sortBy(_.getInt(0))
    assert(rows.map(_.getInt(0)).toSeq === Seq(1, 3))
    assert(rows(0).getString(1) === "ok" && rows(1).isNullAt(1))
    // both dropped records are counted, not silently discarded, and the
    // progress counter reports the survivors
    assert(XmlFileFormat.lastDroppedCounter.map(_.value) === Some(2L))
    assert(XmlFileFormat.lastParsedCounter.map(_.value) === Some(2L))
  }

  test("CDATA sections and comments inside leaves are handled") {
    val dir = java.nio.file.Files.createTempDirectory("xmlcdata").toFile
    val schemaDir = new java.io.File(dir, "schema"); schemaDir.mkdirs()
    val dataDir = new java.io.File(dir, "data"); dataDir.mkdirs()
    java.nio.file.Files.writeString(new java.io.File(schemaDir, "s.xsd").toPath,
      """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:complexType name="rType">
        |    <xs:sequence>
        |      <xs:element type="xs:string" name="body"/>
        |      <xs:element type="xs:int" name="n"/>
        |    </xs:sequence>
        |  </xs:complexType>
        |</xs:schema>""".stripMargin)
    java.nio.file.Files.writeString(new java.io.File(dataDir, "d.xml").toPath,
      "<root><r><body><![CDATA[raw <markup> & stuff]]></body>" +
        "<!-- a comment between elements --><n><![CDATA[42]]></n></r></root>")
    val rows = spark.read.format("graft.xml")
      .option("xml.schema.location", schemaDir.getAbsolutePath)
      .option("xml.separator.tag", "r")
      .option("xml.separator.tag.type", "rType")
      .load(dataDir.getAbsolutePath).collect()
    assert(rows.length === 1)
    assert(rows(0).getString(0) === "raw <markup> & stuff")
    assert(rows(0).getInt(1) === 42)
  }

  test("mode=PERMISSIVE keeps bad records: null leaf + corrupt-record column") {
    val dir = java.nio.file.Files.createTempDirectory("xmlperm").toFile
    val schemaDir = new java.io.File(dir, "schema"); schemaDir.mkdirs()
    val dataDir = new java.io.File(dir, "data"); dataDir.mkdirs()
    java.nio.file.Files.writeString(new java.io.File(schemaDir, "s.xsd").toPath,
      """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:complexType name="rType">
        |    <xs:sequence>
        |      <xs:element type="xs:string" name="id"/>
        |      <xs:element type="xs:int" name="n" minOccurs="0"/>
        |    </xs:sequence>
        |  </xs:complexType>
        |</xs:schema>""".stripMargin)
    java.nio.file.Files.writeString(new java.io.File(dataDir, "d.xml").toPath,
      "<root><r><id>a</id><n>1</n></r>" +
        "<r><id>b</id><n>bogus</n></r>" +
        "<r><id>c</id><n>3</n></r></root>")
    val df = spark.read.format("graft.xml")
      .option("xml.schema.location", schemaDir.getAbsolutePath)
      .option("xml.separator.tag", "r")
      .option("xml.separator.tag.type", "rType")
      .option("mode", "PERMISSIVE")
      .load(dataDir.getAbsolutePath)
    assert(df.schema.fieldNames.toSeq === Seq("id", "n", "_corrupt_record"))
    val rows = df.collect().sortBy(_.getString(0))
    assert(rows.length === 3) // nothing dropped
    assert(rows(0).getInt(1) === 1 && rows(0).isNullAt(2))
    assert(rows(1).isNullAt(1)) // bad leaf null-filled
    assert(rows(1).getString(2).contains("n:"), rows(1).toString) // reported
    assert(rows(2).getInt(1) === 3 && rows(2).isNullAt(2))
  }

  test("PERMISSIVE with the corrupt column pruned away still null-fills") {
    val dir = java.nio.file.Files.createTempDirectory("xmlperm2").toFile
    val schemaDir = new java.io.File(dir, "schema"); schemaDir.mkdirs()
    val dataDir = new java.io.File(dir, "data"); dataDir.mkdirs()
    java.nio.file.Files.writeString(new java.io.File(schemaDir, "s.xsd").toPath,
      """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:complexType name="rType">
        |    <xs:sequence>
        |      <xs:element type="xs:string" name="id"/>
        |      <xs:element type="xs:int" name="n" minOccurs="0"/>
        |    </xs:sequence>
        |  </xs:complexType>
        |</xs:schema>""".stripMargin)
    java.nio.file.Files.writeString(new java.io.File(dataDir, "d.xml").toPath,
      "<root><r><id>a</id><n>1</n></r><r><id>b</id><n>bogus</n></r></root>")
    val df = spark.read.format("graft.xml")
      .option("xml.schema.location", schemaDir.getAbsolutePath)
      .option("xml.separator.tag", "r")
      .option("xml.separator.tag.type", "rType")
      .option("mode", "PERMISSIVE")
      .load(dataDir.getAbsolutePath)
    // projecting only data columns prunes _corrupt_record out of the scan;
    // the rescue path must not depend on the report column being present
    val rows = df.select("id", "n").collect().sortBy(_.getString(0))
    assert(rows.length === 2)
    assert(rows(0).getInt(1) === 1)
    assert(rows(1).isNullAt(1))
  }

  test("xml.decimal.as.decimal=true: price reads as exact BigDecimal") {
    val df = spark.read.format("graft.xml")
      .option("xml.schema.location", s"$base/library/schema")
      .option("xml.separator.tag", "item")
      .option("xml.separator.tag.type", "itemType")
      .option("xml.decimal.as.decimal", "true")
      .load(s"$base/library/data")
    val r = df.filter(org.apache.spark.sql.functions.col("sku") === "SKU-001")
      .select("price").collect()(0)
    val got = r.getDecimal(0)
    assert(got.compareTo(new java.math.BigDecimal("54.90")) === 0, s"got $got")
  }

  test("xml.namespace.aware=true distinguishes same-local-name elements by ns") {
    val dir = java.nio.file.Files.createTempDirectory("xmlns").toFile
    val schemaDir = new java.io.File(dir, "schema"); schemaDir.mkdirs()
    val dataDir = new java.io.File(dir, "data"); dataDir.mkdirs()
    java.nio.file.Files.writeString(new java.io.File(schemaDir, "s.xsd").toPath,
      """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema"
        |    targetNamespace="http://example.org/good" elementFormDefault="qualified">
        |  <xs:complexType name="recType">
        |    <xs:sequence>
        |      <xs:element type="xs:string" name="id"/>
        |      <xs:element type="xs:string" name="payload" minOccurs="0"/>
        |    </xs:sequence>
        |  </xs:complexType>
        |</xs:schema>""".stripMargin)
    // Two namespaces, same local names: g:payload must be read, b:payload
    // skipped; the b:rec record element must not produce a record at all.
    java.nio.file.Files.writeString(new java.io.File(dataDir, "d.xml").toPath,
      """<root xmlns:g="http://example.org/good" xmlns:b="http://example.org/bad">
        |  <g:rec><g:id>1</g:id><g:payload>right</g:payload><b:payload>WRONG</b:payload></g:rec>
        |  <b:rec><b:id>2</b:id><b:payload>WRONG</b:payload></b:rec>
        |</root>""".stripMargin)
    def read(aware: Boolean) = {
      val r = spark.read.format("graft.xml")
        .option("xml.schema.location", schemaDir.getAbsolutePath)
        .option("xml.separator.tag", "rec")
        .option("xml.separator.tag.type", "recType")
        .option("xml.separator.tag.type.ns", "http://example.org/good")
      (if (aware) r.option("xml.namespace.aware", "true") else r)
        .load(dataDir.getAbsolutePath)
    }
    val aware = read(aware = true).orderBy("id").collect()
    assert(aware.length === 1) // b:rec is not a record in strict mode
    assert(aware(0).getString(0) === "1")
    assert(aware(0).getString(1) === "right") // trailing b:payload skipped
    // default (reference parity): namespace-blind — both recs read, and the
    // trailing b:payload clobbers g:payload (last scalar occurrence wins)
    val blind = read(aware = false).orderBy("id").collect()
    assert(blind.length === 2)
    assert(blind(0).getString(1) === "WRONG")
  }

  test("xs:choice records read end-to-end: populated branch set, others null") {
    val dir = java.nio.file.Files.createTempDirectory("xmlchoice").toFile
    val schemaDir = new java.io.File(dir, "schema"); schemaDir.mkdirs()
    val dataDir = new java.io.File(dir, "data"); dataDir.mkdirs()
    java.nio.file.Files.writeString(new java.io.File(schemaDir, "p.xsd").toPath,
      """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:complexType name="paymentType">
        |    <xs:sequence>
        |      <xs:element type="xs:long" name="order_id"/>
        |      <xs:choice>
        |        <xs:element type="xs:string" name="card_number"/>
        |        <xs:element type="xs:string" name="iban"/>
        |      </xs:choice>
        |    </xs:sequence>
        |  </xs:complexType>
        |</xs:schema>""".stripMargin)
    java.nio.file.Files.writeString(new java.io.File(dataDir, "d.xml").toPath,
      """<payments>
        |  <payment><order_id>1</order_id><card_number>4111-x</card_number></payment>
        |  <payment><order_id>2</order_id><iban>DE89-y</iban></payment>
        |</payments>""".stripMargin)
    val rows = spark.read.format("graft.xml")
      .option("xml.schema.location", schemaDir.getAbsolutePath)
      .option("xml.separator.tag", "payment")
      .option("xml.separator.tag.type", "paymentType")
      .load(dataDir.getAbsolutePath)
      .orderBy("order_id").collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[String]("card_number") === "4111-x")
    assert(rows(0).isNullAt(rows(0).fieldIndex("iban")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("card_number")))
    assert(rows(1).getAs[String]("iban") === "DE89-y")
  }

  test("substitution-group records read end-to-end: member branch populated") {
    val dir = java.nio.file.Files.createTempDirectory("xmlsubst").toFile
    val schemaDir = new java.io.File(dir, "schema"); schemaDir.mkdirs()
    val dataDir = new java.io.File(dir, "data"); dataDir.mkdirs()
    java.nio.file.Files.writeString(new java.io.File(schemaDir, "s.xsd").toPath,
      """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:element name="vehicle" type="xs:string" abstract="true"/>
        |  <xs:element name="car" type="xs:string" substitutionGroup="vehicle"/>
        |  <xs:element name="bike" type="xs:string" substitutionGroup="vehicle"/>
        |  <xs:complexType name="garageType">
        |    <xs:sequence>
        |      <xs:element type="xs:long" name="id"/>
        |      <xs:element ref="vehicle"/>
        |    </xs:sequence>
        |  </xs:complexType>
        |</xs:schema>""".stripMargin)
    java.nio.file.Files.writeString(new java.io.File(dataDir, "d.xml").toPath,
      """<garages>
        |  <garage><id>1</id><car>mazda</car></garage>
        |  <garage><id>2</id><bike>brompton</bike></garage>
        |</garages>""".stripMargin)
    val rows = spark.read.format("graft.xml")
      .option("xml.schema.location", schemaDir.getAbsolutePath)
      .option("xml.separator.tag", "garage")
      .option("xml.separator.tag.type", "garageType")
      .load(dataDir.getAbsolutePath)
      .orderBy("id").collect()
    assert(rows.map(r => (r.getLong(0),
      Option(r.getAs[String]("car")), Option(r.getAs[String]("bike")))).toSeq ===
      Seq((1L, Some("mazda"), None), (2L, None, Some("brompton"))))
  }

  test("write path: df.write.format(graft.xml) round-trips through the reader") {
    val out = java.nio.file.Files.createTempDirectory("xmlwrite").toFile
    val outPath = new java.io.File(out, "lib").getAbsolutePath
    readLibrary.write.format("graft.xml")
      .option("xml.separator.tag", "item")
      .option("xml.root.tag", "library")
      .mode("overwrite")
      .save(outPath)
    val files = new java.io.File(outPath).listFiles.filter(_.getName.endsWith(".xml"))
    assert(files.nonEmpty)
    val back = spark.read.format("graft.xml")
      .option("xml.schema.location", s"$base/library/schema")
      .option("xml.separator.tag", "item")
      .option("xml.separator.tag.type", "itemType")
      .load(outPath)
    val orig = readLibrary.collect().map(_.toString).sorted
    val rt = back.collect().map(_.toString).sorted
    assert(rt.toSeq === orig.toSeq)
  }

  test("XSD long-tail primitives: ints, unsigned, token/anyURI, base64Binary, bool 1/0") {
    val dir = java.nio.file.Files.createTempDirectory("xmlprims").toFile
    val schemaDir = new java.io.File(dir, "schema"); schemaDir.mkdirs()
    val dataDir = new java.io.File(dir, "data"); dataDir.mkdirs()
    java.nio.file.Files.writeString(new java.io.File(schemaDir, "p.xsd").toPath,
      """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:complexType name="recType">
        |    <xs:sequence>
        |      <xs:element type="xs:short" name="a"/>
        |      <xs:element type="xs:unsignedInt" name="b"/>
        |      <xs:element type="xs:unsignedLong" name="c"/>
        |      <xs:element type="xs:anyURI" name="u"/>
        |      <xs:element type="xs:base64Binary" name="payload"/>
        |      <xs:element type="xs:boolean" name="flag"/>
        |    </xs:sequence>
        |  </xs:complexType>
        |</xs:schema>""".stripMargin)
    val b64 = java.util.Base64.getEncoder.encodeToString(
      "binary payload!".getBytes("UTF-8"))
    java.nio.file.Files.writeString(new java.io.File(dataDir, "d.xml").toPath,
      s"""<root><r><a>-7</a><b>4294967295</b><c>18446744073709551615</c>
         |<u>https://example.org/x</u><payload>$b64</payload><flag>1</flag></r></root>""".stripMargin)
    val rows = spark.read.format("graft.xml")
      .option("xml.schema.location", schemaDir.getAbsolutePath)
      .option("xml.separator.tag", "r")
      .option("xml.separator.tag.type", "recType")
      .load(dataDir.getAbsolutePath).collect()
    assert(rows.length === 1)
    val r = rows(0)
    assert(r.getInt(0) === -7)
    assert(r.getLong(1) === 4294967295L)
    assert(r.getDecimal(2).toBigInteger.toString === "18446744073709551615")
    assert(r.getString(3) === "https://example.org/x")
    assert(new String(r.getAs[Array[Byte]](4), "UTF-8") === "binary payload!")
    assert(r.getBoolean(5) === true) // XSD "1" is true (plain parseBoolean isn't)
  }

  test("write path round-trips decimal and binary leaves") {
    val dir = java.nio.file.Files.createTempDirectory("xmlwrt2").toFile
    val schemaDir = new java.io.File(dir, "schema"); schemaDir.mkdirs()
    java.nio.file.Files.writeString(new java.io.File(schemaDir, "s.xsd").toPath,
      """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:complexType name="rType">
        |    <xs:sequence>
        |      <xs:element type="xs:long" name="id"/>
        |      <xs:element type="xs:decimal" name="amount"/>
        |      <xs:element type="xs:base64Binary" name="payload"/>
        |    </xs:sequence>
        |  </xs:complexType>
        |</xs:schema>""".stripMargin)
    import spark.implicits._
    val out = new java.io.File(dir, "data").getAbsolutePath
    Seq((7L, new java.math.BigDecimal("12.340000000000000000"),
        Array[Byte](1, 2, -3, 127)))
      .toDF("id", "amount", "payload")
      .selectExpr("id", "CAST(amount AS DECIMAL(38,18)) AS amount", "payload")
      .write.format("graft.xml")
      .option("xml.separator.tag", "r").mode("overwrite").save(out)
    val back = spark.read.format("graft.xml")
      .option("xml.schema.location", schemaDir.getAbsolutePath)
      .option("xml.separator.tag", "r")
      .option("xml.separator.tag.type", "rType")
      .option("xml.decimal.as.decimal", "true")
      .load(out).collect()(0)
    assert(back.getLong(0) === 7L)
    assert(back.getDecimal(1).compareTo(new java.math.BigDecimal("12.34")) === 0)
    assert(back.getAs[Array[Byte]](2).toSeq === Seq[Byte](1, 2, -3, 127))
  }

  test("streaming sink: writeStream format(graft.xml) produces readable files") {
    val dir = java.nio.file.Files.createTempDirectory("xmlsink").toFile
    val schemaDir = new java.io.File(dir, "schema"); schemaDir.mkdirs()
    java.nio.file.Files.writeString(new java.io.File(schemaDir, "s.xsd").toPath,
      """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:complexType name="evType">
        |    <xs:sequence>
        |      <xs:element type="xs:long" name="n"/>
        |    </xs:sequence>
        |  </xs:complexType>
        |</xs:schema>""".stripMargin)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val out = new java.io.File(dir, "out").getAbsolutePath
    val q = input.toDF().toDF("n")
      .writeStream.format("graft.xml")
      .option("xml.separator.tag", "ev")
      .option("checkpointLocation", new java.io.File(dir, "ckpt").getAbsolutePath)
      .start(out)
    input.addData(1L, 2L, 3L)
    q.processAllAvailable()
    q.stop()
    val back = spark.read.format("graft.xml")
      .option("xml.schema.location", schemaDir.getAbsolutePath)
      .option("xml.separator.tag", "ev")
      .option("xml.separator.tag.type", "evType")
      .load(out)
    assert(back.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L))
  }

  test("complexContent extension + xs:list records read end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("xmlext").toFile
    val schemaDir = new java.io.File(dir, "schema"); schemaDir.mkdirs()
    val dataDir = new java.io.File(dir, "data"); dataDir.mkdirs()
    java.nio.file.Files.writeString(new java.io.File(schemaDir, "s.xsd").toPath,
      """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:simpleType name="intList">
        |    <xs:list itemType="xs:int"/>
        |  </xs:simpleType>
        |  <xs:complexType name="BaseType">
        |    <xs:sequence>
        |      <xs:element type="xs:string" name="id"/>
        |    </xs:sequence>
        |    <xs:attribute name="version" type="xs:int"/>
        |  </xs:complexType>
        |  <xs:complexType name="EventType">
        |    <xs:complexContent>
        |      <xs:extension base="BaseType">
        |        <xs:sequence>
        |          <xs:element type="xs:double" name="score"/>
        |          <xs:element type="intList" name="pages" minOccurs="0"/>
        |        </xs:sequence>
        |      </xs:extension>
        |    </xs:complexContent>
        |  </xs:complexType>
        |</xs:schema>""".stripMargin)
    java.nio.file.Files.writeString(new java.io.File(dataDir, "d.xml").toPath,
      """<root>
        |  <ev version="3"><id>a1</id><score>0.5</score><pages>1 2  3</pages></ev>
        |  <ev><id>a2</id><score>1.5</score></ev>
        |</root>""".stripMargin)
    val df = spark.read.format("graft.xml")
      .option("xml.schema.location", schemaDir.getAbsolutePath)
      .option("xml.separator.tag", "ev")
      .option("xml.separator.tag.type", "EventType")
      .load(dataDir.getAbsolutePath)
    // inherited fields come first in the schema
    assert(df.schema.fieldNames.toSeq === Seq("id", "version", "score", "pages"))
    val rows = df.orderBy("id").collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[String]("id") === "a1")
    assert(rows(0).getAs[Int]("version") === 3)
    assert(rows(0).getAs[Double]("score") === 0.5)
    assert(rows(0).getSeq[Int](rows(0).fieldIndex("pages")).toSeq === Seq(1, 2, 3))
    assert(rows(1).getAs[String]("id") === "a2")
    assert(rows(1).isNullAt(rows(1).fieldIndex("version")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("pages")))
  }

  test("missing required option yields a clear error naming the key") {
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft.xml")
        .option("xml.separator.tag", "item")
        .load(s"$base/library/data")
    }
    assert(e.getMessage.contains("xml.schema.location"))
  }

  test("malformed numeric text fails fast (no NULL-on-corrupt mode)") {
    val dir = java.nio.file.Files.createTempDirectory("xmlbad").toFile
    val schemaDir = new java.io.File(dir, "schema"); schemaDir.mkdirs()
    val dataDir = new java.io.File(dir, "data"); dataDir.mkdirs()
    java.nio.file.Files.writeString(new java.io.File(schemaDir, "s.xsd").toPath,
      """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:complexType name="rType">
        |    <xs:sequence><xs:element type="xs:int" name="n"/></xs:sequence>
        |  </xs:complexType>
        |</xs:schema>""".stripMargin)
    java.nio.file.Files.writeString(new java.io.File(dataDir, "d.xml").toPath,
      "<root><r><n>not-a-number</n></r></root>")
    val df = spark.read.format("graft.xml")
      .option("xml.schema.location", schemaDir.getAbsolutePath)
      .option("xml.separator.tag", "r")
      .option("xml.separator.tag.type", "rType")
      .load(dataDir.getAbsolutePath)
    val e = intercept[org.apache.spark.SparkException] { df.collect() }
    assert(e.getCause != null)
  }
}

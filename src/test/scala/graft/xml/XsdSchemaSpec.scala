package graft.xml

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Golden-schema tests for SURVEY.md §1.2/§1.3 — one per XSD construct family
  * (named types + arrays; Venetian Blind inline types; simpleContent +
  * enum degradation), plus the parity-locked minOccurs quirk.
  */
class XsdSchemaSpec extends AnyFunSuite {

  private val base = "src/test/resources/graftxml"

  test("library: named complexTypes, arrays, optional attrs, primitive map") {
    val st = XsdSchema.structTypeFor(s"$base/library/schema", "", "itemType")
    val expected = StructType(Seq(
      StructField("title", StringType, nullable = false),
      StructField("price", DoubleType, nullable = false), // xs:decimal → double
      StructField("isbn", LongType, nullable = true),
      StructField("in_print", BooleanType, nullable = false),
      StructField("released", StringType, nullable = true), // xs:date → string
      StructField("weight_kg", FloatType, nullable = true),
      StructField("publisher", StructType(Seq(
        StructField("pub_name", StringType, nullable = false),
        StructField("city", StringType, nullable = true))), nullable = true),
      StructField("tag", ArrayType(StringType, containsNull = false),
        nullable = true),
      StructField("review", ArrayType(StructType(Seq(
        StructField("reviewer", StringType, nullable = false),
        StructField("stars", IntegerType, nullable = false))),
        containsNull = false), nullable = true),
      StructField("sku", StringType, nullable = false), // use="required"
      StructField("shelf", IntegerType, nullable = true)))
    assert(st === expected)
  }

  test("venetian blind: inline anonymous types get synthesized <elem>Type names") {
    val tns = "http://example.org/graft/team"
    val st = XsdSchema.structTypeFor(s"$base/venetian/schema", tns, "PlayerType")
    val expected = StructType(Seq(
      // inline simpleType restriction of xsd:integer degrades to int
      StructField("Number", IntegerType, nullable = false),
      StructField("Alias", StringType, nullable = true),
      StructField("Position", StringType, nullable = true)))
    assert(st === expected)
  }

  test("simpleContent/extension: _Value field + attrs; enum degrades to base") {
    val st = XsdSchema.structTypeFor(s"$base/simplecontent/schema", "", "sampleType")
    val measurement = StructType(Seq(
      StructField("_Value", DoubleType, nullable = false),
      StructField("unit", StringType, nullable = false), // enum → base string
      StructField("sensor", StringType, nullable = true)))
    val expected = StructType(Seq(
      StructField("at", StringType, nullable = false), // xs:dateTime → string
      StructField("temperature", measurement, nullable = false),
      StructField("humidity", measurement, nullable = true),
      StructField("id", LongType, nullable = false)))
    assert(st === expected)
  }

  test("minOccurs other than 0/1 is rejected (reference MatchError parity)") {
    val dir = java.nio.file.Files.createTempDirectory("xsdquirk").toFile
    val xsd = new java.io.File(dir, "q.xsd")
    java.nio.file.Files.writeString(xsd.toPath,
      """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:complexType name="qType">
        |    <xs:sequence>
        |      <xs:element type="xs:string" name="x" minOccurs="2"/>
        |    </xs:sequence>
        |  </xs:complexType>
        |</xs:schema>""".stripMargin)
    val e = intercept[IllegalArgumentException] {
      XsdSchema.structTypeFor(dir.getAbsolutePath, "", "qType")
    }
    assert(e.getMessage.contains("minOccurs"))
  }

  test("cardinality falls back to the enclosing sequence node") {
    val dir = java.nio.file.Files.createTempDirectory("xsdseq").toFile
    java.nio.file.Files.writeString(new java.io.File(dir, "s.xsd").toPath,
      """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:complexType name="sType">
        |    <xs:sequence minOccurs="0" maxOccurs="unbounded">
        |      <xs:element type="xs:string" name="x"/>
        |      <xs:element type="xs:int" name="y" minOccurs="1" maxOccurs="1"/>
        |    </xs:sequence>
        |  </xs:complexType>
        |</xs:schema>""".stripMargin)
    val st = XsdSchema.structTypeFor(dir.getAbsolutePath, "", "sType")
    // x inherits (0, unbounded) from the sequence; y's own attrs win
    assert(st("x").dataType === ArrayType(StringType, containsNull = false))
    assert(st("x").nullable)
    assert(st("y").dataType === IntegerType && !st("y").nullable)
  }

  test("xs:all is flattened like a sequence") {
    val dir = java.nio.file.Files.createTempDirectory("xsdall").toFile
    java.nio.file.Files.writeString(new java.io.File(dir, "a.xsd").toPath,
      """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:complexType name="aType">
        |    <xs:all>
        |      <xs:element type="xs:string" name="p"/>
        |      <xs:element type="xs:long" name="q" minOccurs="0"/>
        |    </xs:all>
        |  </xs:complexType>
        |</xs:schema>""".stripMargin)
    val st = XsdSchema.structTypeFor(dir.getAbsolutePath, "", "aType")
    assert(st === StructType(Seq(
      StructField("p", StringType, nullable = false),
      StructField("q", LongType, nullable = true))))
  }

  test("schema split across multiple XSD files in one directory resolves") {
    val dir = java.nio.file.Files.createTempDirectory("xsdmulti").toFile
    java.nio.file.Files.writeString(new java.io.File(dir, "a_outer.xsd").toPath,
      """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:complexType name="outerType">
        |    <xs:sequence>
        |      <xs:element type="innerType" name="inner"/>
        |    </xs:sequence>
        |  </xs:complexType>
        |</xs:schema>""".stripMargin)
    java.nio.file.Files.writeString(new java.io.File(dir, "b_inner.xsd").toPath,
      """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:complexType name="innerType">
        |    <xs:sequence>
        |      <xs:element type="xs:double" name="v"/>
        |    </xs:sequence>
        |  </xs:complexType>
        |</xs:schema>""".stripMargin)
    // also verify .avsc files are excluded (HFSReader.scala:15 parity)
    java.nio.file.Files.writeString(new java.io.File(dir, "junk.avsc").toPath,
      "not xml at all {")
    val st = XsdSchema.structTypeFor(dir.getAbsolutePath, "", "outerType")
    assert(st("inner").dataType.asInstanceOf[StructType]("v").dataType === DoubleType)
  }

  test("xs:choice: every branch becomes a nullable field (improvement over reference)") {
    val dir = java.nio.file.Files.createTempDirectory("xsdchoice").toFile
    java.nio.file.Files.writeString(new java.io.File(dir, "c.xsd").toPath,
      """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:complexType name="paymentType">
        |    <xs:sequence>
        |      <xs:element type="xs:long" name="order_id"/>
        |      <xs:choice>
        |        <xs:element type="xs:string" name="card_number"/>
        |        <xs:element type="xs:string" name="iban"/>
        |        <xs:element type="cashType" name="cash"/>
        |      </xs:choice>
        |      <xs:element type="xs:double" name="amount"/>
        |    </xs:sequence>
        |  </xs:complexType>
        |  <xs:complexType name="cashType">
        |    <xs:sequence><xs:element type="xs:string" name="currency"/></xs:sequence>
        |  </xs:complexType>
        |</xs:schema>""".stripMargin)
    val st = XsdSchema.structTypeFor(dir.getAbsolutePath, "", "paymentType")
    assert(st === StructType(Seq(
      StructField("order_id", LongType, nullable = false),
      StructField("card_number", StringType, nullable = true),
      StructField("iban", StringType, nullable = true),
      StructField("cash", StructType(Seq(
        StructField("currency", StringType, nullable = false))), nullable = true),
      StructField("amount", DoubleType, nullable = false))))
  }

  test("xs:choice as the whole content model; nested choice inside sequence") {
    val dir = java.nio.file.Files.createTempDirectory("xsdchoice2").toFile
    java.nio.file.Files.writeString(new java.io.File(dir, "c.xsd").toPath,
      """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:complexType name="eventType">
        |    <xs:choice>
        |      <xs:element type="xs:string" name="click"/>
        |      <xs:element type="xs:string" name="view" minOccurs="1"/>
        |    </xs:choice>
        |  </xs:complexType>
        |</xs:schema>""".stripMargin)
    val st = XsdSchema.structTypeFor(dir.getAbsolutePath, "", "eventType")
    // minOccurs=1 on a branch still yields nullable: only one branch appears.
    assert(st === StructType(Seq(
      StructField("click", StringType, nullable = true),
      StructField("view", StringType, nullable = true))))
  }

  test("xs:union (named and inline) collapses to string") {
    val dir = java.nio.file.Files.createTempDirectory("xsdunion").toFile
    java.nio.file.Files.writeString(new java.io.File(dir, "u.xsd").toPath,
      """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:simpleType name="intOrWord">
        |    <xs:union memberTypes="xs:int xs:string"/>
        |  </xs:simpleType>
        |  <xs:complexType name="uType">
        |    <xs:sequence>
        |      <xs:element type="intOrWord" name="named"/>
        |      <xs:element name="inline">
        |        <xs:simpleType><xs:union memberTypes="xs:date xs:long"/></xs:simpleType>
        |      </xs:element>
        |    </xs:sequence>
        |  </xs:complexType>
        |</xs:schema>""".stripMargin)
    val st = XsdSchema.structTypeFor(dir.getAbsolutePath, "", "uType")
    assert(st === StructType(Seq(
      StructField("named", StringType, nullable = false),
      StructField("inline", StringType, nullable = false))))
  }

  test("xml.decimal.as.decimal: xs:decimal maps to DecimalType(38,18) opt-in") {
    val st = XsdSchema.structTypeFor(s"$base/library/schema", "", "itemType",
      decimalAsDecimal = true)
    assert(st("price").dataType === DecimalType(38, 18))
    // everything else unchanged — and the default stays DoubleType
    assert(st("isbn").dataType === LongType)
    val def0 = XsdSchema.structTypeFor(s"$base/library/schema", "", "itemType")
    assert(def0("price").dataType === DoubleType)
  }

  test("xs:element ref resolves against top-level declarations across files") {
    val dir = java.nio.file.Files.createTempDirectory("xsdref").toFile
    java.nio.file.Files.writeString(new java.io.File(dir, "a_main.xsd").toPath,
      """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:complexType name="orderType">
        |    <xs:sequence>
        |      <xs:element ref="sku" maxOccurs="unbounded"/>
        |      <xs:element ref="note" minOccurs="0"/>
        |    </xs:sequence>
        |  </xs:complexType>
        |</xs:schema>""".stripMargin)
    java.nio.file.Files.writeString(new java.io.File(dir, "b_elems.xsd").toPath,
      """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:element name="sku" type="xs:string"/>
        |  <xs:element name="note">
        |    <xs:complexType>
        |      <xs:sequence><xs:element type="xs:string" name="body"/></xs:sequence>
        |    </xs:complexType>
        |  </xs:element>
        |</xs:schema>""".stripMargin)
    val st = XsdSchema.structTypeFor(dir.getAbsolutePath, "", "orderType")
    assert(st === StructType(Seq(
      StructField("sku", ArrayType(StringType, containsNull = false),
        nullable = false),
      StructField("note", StructType(Seq(
        StructField("body", StringType, nullable = false))), nullable = true))))
  }

  test("substitutionGroup: abstract head expands to nullable member fields") {
    val dir = java.nio.file.Files.createTempDirectory("xsdsubst").toFile
    java.nio.file.Files.writeString(new java.io.File(dir, "s.xsd").toPath,
      """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:element name="vehicle" type="xs:string" abstract="true"/>
        |  <xs:element name="car" type="carType" substitutionGroup="vehicle"/>
        |  <xs:element name="bike" type="xs:string" substitutionGroup="vehicle"/>
        |  <xs:element name="ebike" type="xs:string" substitutionGroup="bike"/>
        |  <xs:complexType name="carType">
        |    <xs:sequence><xs:element type="xs:int" name="doors"/></xs:sequence>
        |  </xs:complexType>
        |  <xs:complexType name="garageType">
        |    <xs:sequence>
        |      <xs:element type="xs:string" name="owner"/>
        |      <xs:element ref="vehicle"/>
        |    </xs:sequence>
        |  </xs:complexType>
        |</xs:schema>""".stripMargin)
    val st = XsdSchema.structTypeFor(dir.getAbsolutePath, "", "garageType")
    // abstract head → no 'vehicle' field; members (incl. transitive ebike)
    // are all nullable branches
    assert(st === StructType(Seq(
      StructField("owner", StringType, nullable = false),
      StructField("car", StructType(Seq(
        StructField("doors", IntegerType, nullable = false))), nullable = true),
      StructField("bike", StringType, nullable = true),
      StructField("ebike", StringType, nullable = true))))
    // non-abstract head keeps its own (nullable) field
    java.nio.file.Files.writeString(new java.io.File(dir, "s.xsd").toPath,
      java.nio.file.Files.readString(
        new java.io.File(dir, "s.xsd").toPath).replace(" abstract=\"true\"", ""))
    val st2 = XsdSchema.structTypeFor(dir.getAbsolutePath, "", "garageType")
    assert(st2.fieldNames.toSeq === Seq("owner", "vehicle", "car", "bike", "ebike"))
    assert(st2("vehicle").nullable)
  }

  test("xs:group and xs:attributeGroup refs splice named fragments in place") {
    val dir = java.nio.file.Files.createTempDirectory("xsdgroup").toFile
    java.nio.file.Files.writeString(new java.io.File(dir, "a_types.xsd").toPath,
      """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:complexType name="orderType">
        |    <xs:sequence>
        |      <xs:element type="xs:long" name="order_id"/>
        |      <xs:group ref="addressGroup"/>
        |      <xs:group ref="addressGroup" minOccurs="0"/>
        |    </xs:sequence>
        |    <xs:attributeGroup ref="auditAttrs"/>
        |  </xs:complexType>
        |</xs:schema>""".stripMargin)
    java.nio.file.Files.writeString(new java.io.File(dir, "b_frags.xsd").toPath,
      """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:group name="addressGroup">
        |    <xs:sequence>
        |      <xs:element type="xs:string" name="street"/>
        |      <xs:element type="xs:string" name="city" minOccurs="0"/>
        |    </xs:sequence>
        |  </xs:group>
        |  <xs:attributeGroup name="auditAttrs">
        |    <xs:attribute type="xs:string" name="created_by" use="required"/>
        |    <xs:attribute type="xs:long" name="version"/>
        |  </xs:attributeGroup>
        |</xs:schema>""".stripMargin)
    val st = XsdSchema.structTypeFor(dir.getAbsolutePath, "", "orderType")
    // first splice keeps member cardinality; the minOccurs=0 splice makes
    // every member nullable; attr group contributes required+optional attrs.
    // (duplicate names from the second splice mirror XSD's behavior of
    // repeated groups; last-write-wins at parse like repeated elements)
    assert(st.fieldNames.count(_ == "street") === 2)
    val fields = st.fields.toSeq
    assert(fields(1).name === "street" && !fields(1).nullable)
    assert(fields(2).name === "city" && fields(2).nullable)
    assert(fields(3).name === "street" && fields(3).nullable) // minOccurs=0 group
    assert(st("created_by").dataType === StringType && !st("created_by").nullable)
    assert(st("version").dataType === LongType && st("version").nullable)
  }

  test("complexContent extension: base fields spliced before own, transitively") {
    val dir = java.nio.file.Files.createTempDirectory("xsdext").toFile
    java.nio.file.Files.writeString(new java.io.File(dir, "e.xsd").toPath,
      """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:complexType name="BaseType">
        |    <xs:sequence>
        |      <xs:element type="xs:string" name="id"/>
        |      <xs:element type="xs:string" name="created" minOccurs="0"/>
        |    </xs:sequence>
        |    <xs:attribute name="version" type="xs:int"/>
        |  </xs:complexType>
        |  <xs:complexType name="MidType">
        |    <xs:complexContent>
        |      <xs:extension base="BaseType">
        |        <xs:sequence>
        |          <xs:element type="xs:double" name="score"/>
        |        </xs:sequence>
        |      </xs:extension>
        |    </xs:complexContent>
        |  </xs:complexType>
        |  <xs:complexType name="LeafType">
        |    <xs:complexContent>
        |      <xs:extension base="MidType">
        |        <xs:sequence>
        |          <xs:element type="xs:string" name="label" maxOccurs="unbounded"/>
        |        </xs:sequence>
        |        <xs:attribute name="kind" type="xs:string" use="required"/>
        |      </xs:extension>
        |    </xs:complexContent>
        |  </xs:complexType>
        |</xs:schema>""".stripMargin)
    val st = XsdSchema.structTypeFor(dir.getAbsolutePath, "", "LeafType")
    // base-chain order: Base fields, then Mid's own, then Leaf's own.
    assert(st.fieldNames.toSeq ===
      Seq("id", "created", "version", "score", "label", "kind"))
    assert(st("id").dataType === StringType && !st("id").nullable)
    assert(st("created").nullable)
    assert(st("version").dataType === IntegerType && st("version").nullable)
    assert(st("score").dataType === DoubleType)
    assert(st("label").dataType === ArrayType(StringType, containsNull = false))
    assert(st("kind").dataType === StringType && !st("kind").nullable)
  }

  test("complexContent restriction: base fields only, own new attrs kept") {
    val dir = java.nio.file.Files.createTempDirectory("xsdres").toFile
    java.nio.file.Files.writeString(new java.io.File(dir, "r.xsd").toPath,
      """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:complexType name="BaseType">
        |    <xs:sequence>
        |      <xs:element type="xs:string" name="a"/>
        |      <xs:element type="xs:int" name="b" minOccurs="0"/>
        |    </xs:sequence>
        |    <xs:attribute name="u" type="xs:string"/>
        |  </xs:complexType>
        |  <xs:complexType name="NarrowType">
        |    <xs:complexContent>
        |      <xs:restriction base="BaseType">
        |        <xs:sequence>
        |          <xs:element type="xs:string" name="a"/>
        |        </xs:sequence>
        |        <xs:attribute name="u" type="xs:string" use="required"/>
        |        <xs:attribute name="extra" type="xs:long"/>
        |      </xs:restriction>
        |    </xs:complexContent>
        |  </xs:complexType>
        |</xs:schema>""".stripMargin)
    val st = XsdSchema.structTypeFor(dir.getAbsolutePath, "", "NarrowType")
    // base's full field list (superset encoding — restricted-away fields
    // just stay null); re-declared attr u keeps the base (nullable) version;
    // genuinely new attrs are appended.
    assert(st.fieldNames.toSeq === Seq("a", "b", "u", "extra"))
    assert(st("u").nullable) // base version wins over the tightened re-decl
    assert(st("extra").dataType === LongType)
  }

  test("xs:list: named, inline, and list-typed attribute map to ArrayType") {
    val dir = java.nio.file.Files.createTempDirectory("xsdlist").toFile
    java.nio.file.Files.writeString(new java.io.File(dir, "l.xsd").toPath,
      """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:simpleType name="intList">
        |    <xs:list itemType="xs:int"/>
        |  </xs:simpleType>
        |  <xs:complexType name="docType">
        |    <xs:sequence>
        |      <xs:element type="intList" name="pages"/>
        |      <xs:element name="scores" minOccurs="0">
        |        <xs:simpleType>
        |          <xs:list itemType="xs:double"/>
        |        </xs:simpleType>
        |      </xs:element>
        |    </xs:sequence>
        |    <xs:attribute name="refs" type="intList"/>
        |  </xs:complexType>
        |</xs:schema>""".stripMargin)
    val st = XsdSchema.structTypeFor(dir.getAbsolutePath, "", "docType")
    assert(st("pages").dataType === ArrayType(IntegerType, containsNull = false))
    assert(st("pages").metadata.contains("xml.list"))
    assert(st("scores").dataType === ArrayType(DoubleType, containsNull = false))
    assert(st("scores").nullable && st("scores").metadata.contains("xml.list"))
    assert(st("refs").dataType === ArrayType(IntegerType, containsNull = false))
    assert(st("refs").metadata.contains("xml.list"))
  }

  test("recursive complexType fails with the type name, not a stack overflow") {
    val dir = java.nio.file.Files.createTempDirectory("xsdrec").toFile
    java.nio.file.Files.writeString(new java.io.File(dir, "t.xsd").toPath,
      """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:complexType name="NodeType">
        |    <xs:sequence>
        |      <xs:element type="xs:string" name="name"/>
        |      <xs:element type="NodeType" name="child" minOccurs="0"/>
        |    </xs:sequence>
        |  </xs:complexType>
        |</xs:schema>""".stripMargin)
    val e = intercept[IllegalArgumentException] {
      XsdSchema.structTypeFor(dir.getAbsolutePath, "", "NodeType")
    }
    assert(e.getMessage.contains("recursive") && e.getMessage.contains("NodeType"))
  }

  test("recursive complexContent inheritance cycle fails with a clear error") {
    val dir = java.nio.file.Files.createTempDirectory("xsdreccc").toFile
    java.nio.file.Files.writeString(new java.io.File(dir, "c.xsd").toPath,
      """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:complexType name="AType">
        |    <xs:complexContent>
        |      <xs:extension base="BType"/>
        |    </xs:complexContent>
        |  </xs:complexType>
        |  <xs:complexType name="BType">
        |    <xs:complexContent>
        |      <xs:extension base="AType"/>
        |    </xs:complexContent>
        |  </xs:complexType>
        |</xs:schema>""".stripMargin)
    val e = intercept[IllegalArgumentException] {
      XsdSchema.structTypeFor(dir.getAbsolutePath, "", "AType")
    }
    assert(e.getMessage.contains("recursive"))
  }

  test("nillable forces nullability; default/fixed land in field metadata") {
    val st = XsdSchema.structTypeFor(s"$base/nildefaults/schema", "", "readingType")
    // nillable="true" overrides minOccurs=1 — a present xsi:nil element is null
    assert(st("value").nullable && st("value").dataType === DoubleType)
    assert(!st("station").nullable)
    assert(st("unit").metadata.getString("xml.default.elem") === "celsius")
    assert(!st("note").metadata.contains("xml.default.elem"))
    assert(st("source").metadata.getString("xml.default.attr") === "manual")
    assert(st("version").metadata.getString("xml.default.attr") === "2") // fixed=
    assert(!st("id").metadata.contains("xml.default.attr"))
  }

  test("maxOccurs=5 (any non-1) becomes an array") {
    val dir = java.nio.file.Files.createTempDirectory("xsdmax").toFile
    java.nio.file.Files.writeString(new java.io.File(dir, "m.xsd").toPath,
      """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:complexType name="mType">
        |    <xs:sequence>
        |      <xs:element type="xs:int" name="x" maxOccurs="5"/>
        |    </xs:sequence>
        |  </xs:complexType>
        |</xs:schema>""".stripMargin)
    val st = XsdSchema.structTypeFor(dir.getAbsolutePath, "", "mType")
    assert(st("x").dataType === ArrayType(IntegerType, containsNull = false))
    assert(!st("x").nullable) // default minOccurs=1
  }
}

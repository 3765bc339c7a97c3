package graft.xml

import java.io.File
import org.apache.spark.sql.types._
import scala.collection.mutable
import scala.xml.{Node, XML}

/** XSD-directory → Spark `StructType` schema inference (SURVEY.md §2.1 S1).
  *
  * Re-expresses the reference's XSD→Avro translator
  * (`/root/reference/src/main/scala/com/github/xmlavrobridge/XMLToAvroSchema.scala:65-346`)
  * as a direct XSD→StructType function — the Avro intermediary was an artifact
  * of piggybacking on Hive's AvroSerDe, not a semantic requirement
  * (SURVEY.md §1.4). Runs once on the driver; the resulting StructType is
  * serialized into the scan tasks (fixing the reference's per-task schema
  * re-derivation, `AvroTransormer.scala:26-43`).
  *
  * Parity-locked semantics (each row cites the reference behavior):
  *  - named/inline complexType → struct; inline types get the synthesized
  *    name `<element>Type` (`XMLToAvroSchema.scala:282-298`)
  *  - sequence / nested sequence / all → flattened field list; substitution
  *    groups unsupported (`XMLToAvroSchema.scala:247-249,329-331`)
  *
  * Deliberate improvements over reference parity (the reference TODOs at
  * `XMLToAvroSchema.scala:329-331` reject these outright):
  *  - `xs:choice` → every branch becomes a nullable field regardless of its
  *    own minOccurs; exactly one is populated per record. A strict superset
  *    encoding: any document the reference could read is unchanged, and
  *    choice-bearing schemas (ubiquitous in real XSDs) now work.
  *  - `xs:union` member types collapse to StringType — the only Spark type
  *    that can hold every member's lexical form without loss.
  *  - `xs:element ref="..."` resolves against top-level element declarations
  *    (cross-file), with cardinality read from the referencing site.
  *  - substitution groups: a ref to a group head expands to one nullable
  *    field per substitutable element (transitively), plus the head itself
  *    unless it is `abstract` — the same nullable-branch encoding as choice.
  *  - `xs:group` / `xs:attributeGroup` named fragments: refs splice the
  *    group's members in place (cross-file), with the ref site's
  *    cardinality applied to every member.
  *  - simpleType restriction → its base primitive; enumeration symbols are
  *    dropped (degenerate enum, `XMLToAvroSchema.scala:69-81`; runtime treats
  *    enums as strings, `AvroTransormer.scala:202`)
  *  - simpleContent/extension → synthetic `_Value` field for the text plus
  *    attribute fields (`XMLToAvroSchema.scala:256,268-272`)
  *  - attributes: `use="required"` ⇒ non-null, else nullable
  *    (`XMLToAvroSchema.scala:92-116,258-266`)
  *  - minOccurs: "0" ⇒ nullable, "1" ⇒ required, anything else rejected
  *    (reference crashes with MatchError, `XMLToAvroSchema.scala:122-125`)
  *  - maxOccurs: "1" ⇒ scalar, anything else ⇒ array
  *    (`XMLToAvroSchema.scala:129-193`)
  *  - cardinality looked up on the element, falling back to the enclosing
  *    sequence, default "1" (`XMLToAvroSchema.scala:300-310`)
  *  - xs:decimal → DoubleType (precision-lossy by design) and
  *    date/dateTime/time → StringType (`XMLToAvroSchema.scala:36-47,332-346`)
  */
object XsdSchema {

  val XsdNs = "http://www.w3.org/2001/XMLSchema"

  /** XSD primitive → Spark type (SURVEY.md §1.3 table, extended with the
    * full XSD built-in datatype long tail real schemas use — the reference
    * maps only the first 11 and rejects the rest).
    */
  val primitives: Map[String, DataType] = Map(
    "string" -> StringType,
    "int" -> IntegerType,
    "integer" -> IntegerType,
    "long" -> LongType,
    "boolean" -> BooleanType,
    "decimal" -> DoubleType,
    "float" -> FloatType,
    "double" -> DoubleType,
    "dateTime" -> StringType,
    "date" -> StringType,
    "time" -> StringType,
    // integer family: everything that fits an int stays an int
    "byte" -> IntegerType,
    "short" -> IntegerType,
    "unsignedByte" -> IntegerType,
    "unsignedShort" -> IntegerType,
    // fits a long
    "unsignedInt" -> LongType,
    "nonNegativeInteger" -> LongType,
    "nonPositiveInteger" -> LongType,
    "positiveInteger" -> LongType,
    "negativeInteger" -> LongType,
    // may exceed a long: exact 20-digit decimal
    "unsignedLong" -> DecimalType(20, 0),
    // string family (lexical forms preserved verbatim)
    "token" -> StringType,
    "normalizedString" -> StringType,
    "anyURI" -> StringType,
    "language" -> StringType,
    "Name" -> StringType,
    "NCName" -> StringType,
    "NMTOKEN" -> StringType,
    "ID" -> StringType,
    "IDREF" -> StringType,
    "ENTITY" -> StringType,
    "QName" -> StringType,
    "duration" -> StringType,
    "gYear" -> StringType,
    "gYearMonth" -> StringType,
    "gMonth" -> StringType,
    "gMonthDay" -> StringType,
    "gDay" -> StringType,
    // binary: base64 decodes to real bytes; hex stays a string (the leaf
    // DataType alone can't tell the runtime which decoder to use, and
    // base64 is what multimodal payloads actually ship as)
    "base64Binary" -> BinaryType,
    "hexBinary" -> StringType)

  private case class Attr(name: String, tpe: (String, String), required: Boolean,
      default: Option[String] = None)
  /** `ref`, when set, points at a top-level element declaration;
    * `groupRef`, when set, at a named model group — in both cases `name`/
    * `tpe` resolve at struct-build time (the target may live in another
    * schema file not yet parsed).
    */
  private case class Elem(name: String, tpe: (String, String), minOccurs: String,
      maxOccurs: String, fromChoice: Boolean = false,
      ref: Option[(String, String)] = None,
      groupRef: Option[(String, String)] = None,
      default: Option[String] = None,
      nillable: Boolean = false)
  /** `complexBase`, when set, names the base complexType of a
    * `complexContent` extension/restriction — its fields are spliced before
    * this type's own at build time (transitively through the chain).
    */
  private case class Complex(elements: Seq[Elem], attrs: Seq[Attr],
      simpleContentBase: Option[(String, String)],
      attrGroupRefs: Seq[(String, String)] = Nil,
      complexBase: Option[(String, String)] = None)
  /** A top-level `<xs:element name=...>` declaration. */
  private case class TopElem(name: String, tpe: (String, String),
      isAbstract: Boolean)

  private class SymbolTables {
    val complex = mutable.Map[(String, String), Complex]()
    val simple = mutable.Map[(String, String), (String, String)]() // -> base
    // xs:list simple types -> item type (space-separated values -> ArrayType)
    val simpleLists = mutable.Map[(String, String), (String, String)]()
    val topElems = mutable.Map[(String, String), TopElem]()
    // substitution-group head -> directly substitutable element keys
    val substGroups = mutable.Map[(String, String),
      mutable.ArrayBuffer[(String, String)]]()
    // named model groups (xs:group) and attribute groups (xs:attributeGroup)
    val groups = mutable.Map[(String, String), Seq[Elem]]()
    val attrGroups = mutable.Map[(String, String), Seq[Attr]]()
  }

  /** Parse every non-.avsc file in `xsdDir` (mirrors `parseXmlSchema`,
    * `XMLToAvroSchema.scala:204-219`, and the `.avsc` exclusion in
    * `HFSReader.scala:15`), then build the StructType rooted at the
    * separator tag's type `(rootTypeNs, rootTypeName)`
    * (`XmlAvroHelper.scala:97-102`).
    *
    * `decimalAsDecimal` (reader option `xml.decimal.as.decimal`) maps
    * `xs:decimal` to `DecimalType(38,18)` instead of the parity-locked lossy
    * DoubleType (`XMLToAvroSchema.scala:41`) — SURVEY §1.3's opt-in
    * improvement; money columns at 100 TB want exact decimals.
    */
  def structTypeFor(xsdDir: String, rootTypeNs: String,
      rootTypeName: String, decimalAsDecimal: Boolean = false): StructType = {
    val tables = new SymbolTables
    listXsdFiles(xsdDir).foreach(f => parseSchemaFile(XML.loadFile(f), tables))
    val prims =
      if (decimalAsDecimal) primitives + ("decimal" -> DecimalType(38, 18))
      else primitives
    resolve(tables, prims, (rootTypeNs, rootTypeName), Nil) match {
      case st: StructType => st
      case other => throw new IllegalArgumentException(
        s"separator tag type ($rootTypeNs, $rootTypeName) is not a complex type: $other")
    }
  }

  private def listXsdFiles(dir: String): Seq[File] = {
    val d = new File(dir)
    require(d.isDirectory, s"xml.schema.location is not a directory: $dir")
    d.listFiles().toSeq.filter(f => f.isFile && !f.getName.endsWith(".avsc"))
      .sortBy(_.getName)
  }

  private def parseSchemaFile(root: Node, tables: SymbolTables): Unit = {
    val tns = root.attribute("targetNamespace").map(_.text).getOrElse("")

    def typeRef(n: Node, ref: String): (String, String) = ref.split(":") match {
      case Array(prefix, local) =>
        (Option(n.scope.getURI(prefix)).getOrElse(""), local)
      case Array(local) =>
        // Unprefixed refs resolve against the default namespace; absent a
        // default, XSD primitives fall through by local name (mirrors the
        // suffix-matching fallback `xsdToAvro`, XMLToAvroSchema.scala:332-346).
        val ns = Option(n.scope.getURI(null)).getOrElse(
          if (primitives.contains(local)) XsdNs else tns)
        (ns, local)
      case _ => throw new IllegalArgumentException(s"bad type ref: $ref")
    }

    // Registers a complexType node under `name`; synthesizes names for the
    // anonymous inline types of its child elements ("<element>Type",
    // XMLToAvroSchema.scala:282-298).
    def shallowAttrs(n: Node): Seq[Attr] = (n \ "attribute").map { a =>
      // default= fills an ABSENT attribute; fixed= is the same fill (we
      // don't validate that present values equal the fixed one).
      val dflt = a.attribute("default").map(_.text)
        .orElse(a.attribute("fixed").map(_.text))
      Attr(a \@ "name", typeRef(a, a \@ "type"),
        required = (a \@ "use") == "required", default = dflt)
    }

    // Collect element children of sequence/all/choice nodes, flattening
    // nested compositors (":247-249") WITHOUT descending into child elements'
    // own inline complexTypes. Elements reached through ANY choice ancestor
    // are flagged: their fields must be nullable (only one branch appears).
    def seqElements(n: Node, inChoice: Boolean): Seq[(Node, Node, Boolean)] =
      n.child.flatMap {
        case e if e.label == "element" => Seq((e, n, inChoice))
        case g if g.label == "group" && (g \@ "ref").nonEmpty =>
          Seq((g, n, inChoice)) // named-model-group ref: expanded at build
        case s if s.label == "sequence" || s.label == "all" =>
          seqElements(s, inChoice)
        case c if c.label == "choice" => seqElements(c, inChoice = true)
        case _ => Nil
      }.toSeq

    // One collected (node, enclosing compositor, choice?) triple → Elem.
    // Used for complexType content and for top-level xs:group definitions.
    def mapElem(registerInline: (String, Node) => Unit)(
        triple: (Node, Node, Boolean)): Elem = {
      val (e, seq, inChoice) = triple
      // Cardinality: element attr, else enclosing compositor, else "1"
      // (":300-310").
      def card(attr: String): String =
        e.attribute(attr).map(_.text)
          .orElse(seq.attribute(attr).map(_.text)).getOrElse("1")
      val refAttr = e \@ "ref"
      if (e.label == "group") {
        Elem("", ("", ""), card("minOccurs"), card("maxOccurs"), inChoice,
          groupRef = Some(typeRef(e, refAttr)))
      } else if (refAttr.nonEmpty) {
        // Reference to a top-level element — resolved at build time
        // (the declaration may live in a not-yet-parsed file).
        Elem("", ("", ""), card("minOccurs"), card("maxOccurs"),
          inChoice, ref = Some(typeRef(e, refAttr)))
      } else {
        val elemName = e \@ "name"
        val tpe = (e \@ "type") match {
          case "" =>
            // Anonymous inline complexType/simpleType.
            val inlineComplex = (e \ "complexType").headOption
            val inlineSimple = (e \ "simpleType" \ "restriction").headOption
            val inlineUnion = (e \ "simpleType" \ "union").headOption
            val inlineList = (e \ "simpleType" \ "list").headOption
            (inlineComplex, inlineSimple, inlineUnion, inlineList) match {
              case (Some(ic), _, _, _) =>
                val genName = elemName + "Type"
                registerInline(genName, ic)
                (tns, genName)
              case (_, Some(r), _, _) => typeRef(r, r \@ "base")
              case (_, _, Some(_), _) => (XsdNs, "string")
              case (_, _, _, Some(l)) =>
                // Inline xs:list gets a synthesized named list type.
                val genName = elemName + "ListType"
                tables.simpleLists((tns, genName)) = listItemType(l)
                (tns, genName)
              case _ => throw new IllegalArgumentException(
                s"element $elemName has neither type nor inline type")
            }
          case ref => typeRef(e, ref)
        }
        Elem(elemName, tpe, card("minOccurs"), card("maxOccurs"), inChoice,
          default = e.attribute("default").map(_.text)
            .orElse(e.attribute("fixed").map(_.text)),
          nillable = (e \@ "nillable") == "true")
      }
    }

    def contentElems(parent: Node, registerInline: (String, Node) => Unit):
        Seq[Elem] = {
      val seqNodes = (parent \ "sequence") ++ (parent \ "all") ++
        (parent \ "choice")
      seqNodes.flatMap(n => seqElements(n, n.label == "choice"))
        .map(mapElem(registerInline))
    }

    def registerComplex(name: String, ct: Node): Unit = {
      val simpleContentExt = (ct \ "simpleContent" \ "extension").headOption
      val complexContentExt = (ct \ "complexContent" \ "extension").headOption
      val complexContentRes = (ct \ "complexContent" \ "restriction").headOption
      (simpleContentExt, complexContentExt, complexContentRes) match {
        case (Some(ext), _, _) =>
          tables.complex((tns, name)) =
            Complex(Nil, shallowAttrs(ext), Some(typeRef(ext, ext \@ "base")),
              attrGroupRefs(ext))
        case (_, Some(ext), _) =>
          // complexContent extension: base fields (transitively) spliced
          // before the extension's own at build time. The reference never
          // handled complexType inheritance (XMLToAvroSchema.scala:256 covers
          // simpleContent only) — same "strict superset" justification as
          // the xs:choice encoding: type hierarchies are the most common
          // industrial-XSD construct after choice.
          tables.complex((tns, name)) = Complex(
            contentElems(ext, registerComplex), shallowAttrs(ext), None,
            attrGroupRefs(ext), Some(typeRef(ext, ext \@ "base")))
        case (_, _, Some(res)) =>
          // complexContent restriction: the derived type repeats a SUBSET of
          // the base's content model, so the base's field list (a strict
          // superset — unrestricted fields just stay null) is the encoding;
          // own attrs still apply (restrictions may re-declare/tighten them;
          // name-dedup at build keeps the base's version).
          tables.complex((tns, name)) = Complex(
            Nil, shallowAttrs(res), None,
            attrGroupRefs(res), Some(typeRef(res, res \@ "base")))
        case _ =>
          tables.complex((tns, name)) = Complex(
            contentElems(ct, registerComplex), shallowAttrs(ct), None,
            attrGroupRefs(ct))
      }
    }

    def attrGroupRefs(n: Node): Seq[(String, String)] =
      (n \ "attributeGroup").flatMap { ag =>
        val r = ag \@ "ref"
        if (r.nonEmpty) Seq(typeRef(ag, r)) else Nil
      }

    // Named model groups and attribute groups (reusable fragments).
    (root \ "group").foreach { g =>
      val name = g \@ "name"
      if (name.nonEmpty) {
        tables.groups((tns, name)) = contentElems(g,
          (n, ct) => registerComplex(n, ct))
      }
    }
    (root \ "attributeGroup").foreach { ag =>
      val name = ag \@ "name"
      if (name.nonEmpty) tables.attrGroups((tns, name)) = shallowAttrs(ag)
    }

    // An xs:list node -> its item-type key (itemType attr, or an inline
    // simpleType restriction; unresolvable item types degrade to string).
    def listItemType(l: Node): (String, String) = (l \@ "itemType") match {
      case "" =>
        (l \ "simpleType" \ "restriction").headOption
          .map(r => typeRef(r, r \@ "base")).getOrElse((XsdNs, "string"))
      case ref => typeRef(l, ref)
    }

    (root \ "complexType").foreach(ct => registerComplex(ct \@ "name", ct))
    (root \ "simpleType").foreach { st =>
      ((st \ "restriction").headOption, (st \ "list").headOption) match {
        case (Some(r), _) =>
          tables.simple((tns, st \@ "name")) = typeRef(r, r \@ "base")
        case (_, Some(l)) =>
          // xs:list: space-separated item lexical forms -> ArrayType(item).
          // Unsupported in the reference; GML/office-format schemas use it.
          tables.simpleLists((tns, st \@ "name")) = listItemType(l)
        case _ => (st \ "union").headOption.foreach { _ =>
          tables.simple((tns, st \@ "name")) = (XsdNs, "string")
        }
      }
    }
    // Top-level element declarations: Venetian Blind roots (inline anonymous
    // types get `<name>Type`), ref targets, and substitution-group members.
    (root \ "element").foreach { e =>
      val name = e \@ "name"
      if (name.nonEmpty) {
        val tpe = (e \@ "type") match {
          case "" =>
            val inlineComplex = (e \ "complexType").headOption
            val inlineSimple = (e \ "simpleType" \ "restriction").headOption
            val inlineUnion = (e \ "simpleType" \ "union").headOption
            val inlineList = (e \ "simpleType" \ "list").headOption
            (inlineComplex, inlineSimple, inlineUnion, inlineList) match {
              case (Some(ct), _, _, _) =>
                registerComplex(name + "Type", ct); (tns, name + "Type")
              case (_, Some(r), _, _) => typeRef(r, r \@ "base")
              case (_, _, Some(_), _) => (XsdNs, "string")
              case (_, _, _, Some(l)) =>
                tables.simpleLists((tns, name + "ListType")) = listItemType(l)
                (tns, name + "ListType")
              case _ => (XsdNs, "string") // no type info: xs:anyType as text
            }
          case ref => typeRef(e, ref)
        }
        tables.topElems((tns, name)) =
          TopElem(name, tpe, (e \@ "abstract") == "true")
        val sg = e \@ "substitutionGroup"
        if (sg.nonEmpty) {
          tables.substGroups.getOrElseUpdate(typeRef(e, sg),
            mutable.ArrayBuffer()) += ((tns, name))
        }
      }
    }
  }

  private def resolve(tables: SymbolTables, prims: Map[String, DataType],
      key: (String, String), stack: List[(String, String)]): DataType = {
    if (stack.contains(key)) throw new IllegalArgumentException(
      s"recursive XSD type not supported: $key (via ${stack.reverse.mkString(" -> ")})")
    val (ns, name) = key
    if (ns == XsdNs) {
      prims.getOrElse(name, throw new IllegalArgumentException(
        s"unsupported XSD primitive: $name"))
    } else tables.simpleLists.get(key) match {
      case Some(item) =>
        ArrayType(resolve(tables, prims, item, key :: stack),
          containsNull = false)
      case None => tables.simple.get(key) match {
        case Some(base) => resolve(tables, prims, base, key :: stack)
        case None => tables.complex.get(key) match {
          case Some(c) => complexToStruct(tables, prims, c, key :: stack)
          case None if prims.contains(name) => prims(name)
          case None => throw new IllegalArgumentException(s"unknown type: $key")
        }
      }
    }
  }

  private def complexToStruct(tables: SymbolTables, prims: Map[String, DataType],
      c: Complex, stack: List[(String, String)]): StructType = {
    val valueField = c.simpleContentBase.map { base =>
      StructField("_Value", resolve(tables, prims, base, stack), nullable = false)
    }
    // complexContent inheritance: the base chain's fields come first
    // (transitively — the base may itself extend). The recursion stack
    // doubles as the inheritance-cycle guard.
    val baseFields: Seq[StructField] = c.complexBase.toSeq.flatMap { bkey =>
      resolve(tables, prims, bkey, stack) match {
        case st: StructType => st.fields.toSeq
        case other => throw new IllegalArgumentException(
          s"complexContent base $bkey is not a complex type: $other")
      }
    }
    def mk(name: String, tpeKey: (String, String), nullable: Boolean,
        maxOccurs: String, default: Option[String] = None): StructField = {
      val inner = resolve(tables, prims, tpeKey, stack)
      // An element type resolving to ArrayType can only come from xs:list
      // (repeated elements wrap below, by maxOccurs): mark the field so the
      // record reader whitespace-splits the TEXT into the array instead of
      // expecting repeated child elements.
      val mb = new MetadataBuilder()
      if (inner.isInstanceOf[ArrayType]) mb.putBoolean("xml.list", true)
      // XSD element default/fixed: fills a PRESENT-but-EMPTY element (an
      // absent one stays null — that's the spec's semantics, not an
      // oversight). The reader applies the lexical form via its own coercion.
      default.foreach(mb.putString("xml.default.elem", _))
      val tpe = maxOccurs match {
        case "1" => inner
        case _ => ArrayType(inner, containsNull = false)
      }
      StructField(name, tpe, nullable, mb.build())
    }
    // Transitive closure of substitutable elements under a group head (a
    // member may itself head another group).
    def substMembers(head: (String, String)): Seq[(String, String)] = {
      val out = mutable.LinkedHashSet[(String, String)]()
      var frontier = tables.substGroups.get(head).map(_.toList).getOrElse(Nil)
      while (frontier.nonEmpty) {
        val k = frontier.head; frontier = frontier.tail
        if (!out.contains(k)) {
          out += k
          frontier ++= tables.substGroups.get(k).map(_.toList).getOrElse(Nil)
        }
      }
      out.toSeq
    }
    def expandElem(e: Elem, groupsSeen: Set[(String, String)]): Seq[StructField] = {
      // Choice branches are nullable no matter what they declare: at most one
      // of the siblings appears in any record.
      val baseNullable = if (e.fromChoice) true else e.minOccurs match {
        case "0" => true
        case "1" => false
        case other => throw new IllegalArgumentException(
          s"unsupported minOccurs=$other on ${e.name} (reference crashes here too, " +
            "XMLToAvroSchema.scala:122-125)")
      }
      (e.groupRef, e.ref) match {
        case (Some(gkey), _) =>
          // Named model group: splice its members here. The group ref's own
          // cardinality applies to every member (minOccurs=0/choice makes
          // them nullable; a repeating group makes each member an array).
          if (groupsSeen.contains(gkey)) throw new IllegalArgumentException(
            s"recursive xs:group not supported: $gkey")
          val members = tables.groups.getOrElse(gkey,
            throw new IllegalArgumentException(s"unknown xs:group ref: $gkey"))
          members.flatMap { m =>
            val adjusted = m.copy(
              fromChoice = m.fromChoice || e.fromChoice || e.minOccurs == "0",
              maxOccurs = if (e.maxOccurs != "1") e.maxOccurs else m.maxOccurs)
            expandElem(adjusted, groupsSeen + gkey)
          }
        case (None, Some(key)) =>
          val head = tables.topElems.getOrElse(key,
            throw new IllegalArgumentException(
              s"element ref to unknown top-level element: $key"))
          val members = substMembers(key)
          if (members.isEmpty) {
            Seq(mk(head.name, head.tpe, baseNullable, e.maxOccurs))
          } else {
            // Substitution group: nullable-branch encoding (like choice) —
            // any substitutable element may stand in; abstract heads never
            // appear in documents, so they get no field of their own.
            val headField =
              if (head.isAbstract) Nil
              else Seq(mk(head.name, head.tpe, nullable = true, e.maxOccurs))
            headField ++ members.map { k =>
              val m = tables.topElems(k)
              mk(m.name, m.tpe, nullable = true, e.maxOccurs)
            }
          }
        case (None, None) =>
          // nillable="true" forces nullability regardless of minOccurs:
          // a present <e xsi:nil="true"/> reads as null.
          Seq(mk(e.name, e.tpe, baseNullable || e.nillable, e.maxOccurs,
            e.default))
      }
    }
    val elemFields = c.elements.flatMap(e => expandElem(e, Set.empty))
    val groupAttrs = c.attrGroupRefs.flatMap { k =>
      tables.attrGroups.getOrElse(k,
        throw new IllegalArgumentException(s"unknown xs:attributeGroup ref: $k"))
    }
    val attrFields = (c.attrs ++ groupAttrs).map { a =>
      val t = resolve(tables, prims, a.tpe, stack)
      val mb = new MetadataBuilder()
      if (t.isInstanceOf[ArrayType]) mb.putBoolean("xml.list", true)
      // Attribute default/fixed fills an ABSENT attribute (unlike element
      // defaults, which need the element present).
      a.default.foreach(mb.putString("xml.default.attr", _))
      StructField(a.name, t, nullable = !a.required, mb.build())
    }
    // Own fields that collide with an inherited base field are dropped (a
    // restriction re-declaring an attribute to tighten it): the base version
    // is the superset encoding. Duplicates WITHIN own fields (repeated
    // xs:group splices) are preserved — that mirrors repeated-element
    // behavior and is pinned by tests.
    val baseNames = baseFields.iterator.map(_.name).toSet
    val own = (elemFields ++ attrFields).filterNot(f => baseNames.contains(f.name))
    StructType(valueField.toSeq ++ baseFields ++ own)
  }
}

package graft.xml

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property test (SURVEY.md §5.2.2): random records → rendered XML →
  * `XmlRecordIterator` → values must round-trip under the reference's
  * semantics (ends-trimmed text, valueOf coercions, absent-optional = null).
  */
class XmlRoundTripSpec extends AnyFunSuite {

  case class Rec(id: Long, name: String, score: Double, active: Boolean,
      tags: List[String], child: Option[(Int, String)])

  private val schema = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("score", DoubleType, nullable = false),
    StructField("active", BooleanType, nullable = false),
    StructField("tag", ArrayType(StringType, containsNull = false),
      nullable = true),
    StructField("child", StructType(Seq(
      StructField("a", IntegerType, nullable = false),
      StructField("b", StringType, nullable = false))), nullable = true),
    StructField("id", LongType, nullable = false))) // attribute

  private val genText: Gen[String] = Gen.listOf(Gen.frequency(
    8 -> Gen.alphaNumChar, 1 -> Gen.const(' '), 1 -> Gen.oneOf('&', '<', '>', '\'', '"')))
    .map(_.mkString)

  private val genRec: Gen[Rec] = for {
    id <- Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)
    name <- genText
    score <- Gen.choose(-1e9, 1e9)
    active <- Gen.oneOf(true, false)
    tags <- Gen.listOfN(3, genText).flatMap(t => Gen.someOf(t).map(_.toList))
    child <- Gen.option(Gen.zip(Gen.choose(Int.MinValue, Int.MaxValue), genText))
  } yield Rec(id, name, score, active, tags, child)

  private def esc(s: String): String = scala.xml.Utility.escape(s)

  private def render(recs: Seq[Rec]): String = {
    val body = recs.map { r =>
      val tags = r.tags.map(t => s"<tag>${esc(t)}</tag>").mkString
      val child = r.child.map { case (a, b) =>
        s"<child><a>$a</a><b>${esc(b)}</b></child>"
      }.getOrElse("")
      s"<rec id='${r.id}'><name>${esc(r.name)}</name><score>${r.score}</score>" +
        s"<active>${r.active}</active>$tags$child</rec>"
    }.mkString
    s"<root>$body</root>"
  }

  test("random records round-trip through render + parse (50 seeded cases)") {
    val params = Gen.Parameters.default
    (0 until 50).foreach { seed =>
      val recs = Gen.listOfN(20, genRec).pureApply(params, Seed(seed.toLong))
      val xml = render(recs)
      val it = new XmlRecordIterator(
        new ByteArrayInputStream(xml.getBytes(StandardCharsets.UTF_8)),
        schema, "rec")
      val rows = it.toList
      assert(rows.length === recs.length)
      rows.zip(recs).foreach { case (row, rec) =>
        assert(row.getString(0) === rec.name.trim) // ends trimmed (parity)
        assert(row.getDouble(1) === rec.score)     // Java toString round-trips
        assert(row.getBoolean(2) === rec.active)
        if (rec.tags.isEmpty) assert(row.isNullAt(3)) // no occurrences = null
        else assert(row.getArray(3).toObjectArray(StringType).map(_.toString)
          .toSeq === rec.tags.map(_.trim))
        rec.child match {
          case None => assert(row.isNullAt(4))
          case Some((a, b)) =>
            val c = row.getStruct(4, 2)
            assert(c.getInt(0) === a && c.getString(1) === b.trim)
        }
        assert(row.getLong(5) === rec.id)
      }
    }
  }
}

package graft.xml

import javax.xml.stream.XMLOutputFactory
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.TaskAttemptContext
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.OutputWriter
import org.apache.spark.sql.types._

/** XML serializer for the write path (`df.write.format("graft.xml")`) — an
  * improvement over the reference, whose SerDe only deserializes
  * (`AvroFromXmlSerde.scala` inherits `serialize` but never implements it).
  *
  * Encoding contract (the inverse of [[XmlRecordIterator]]'s read semantics,
  * so write → read round-trips under this source):
  *  - one `<separatorTag>` element per row inside one `<rootTag>` document
  *    per file; files are the parallelism unit on both sides (isSplitable =
  *    false), so a write with N tasks produces N independently readable files
  *  - struct fields → child elements in schema order; `_Value` → text content
  *  - arrays → repeated same-named elements; empty array = absent (the reader
  *    maps zero occurrences back to null)
  *  - null fields omitted (absent-optional parity)
  *  - attribute-declared XSD fields are written as child elements: the reader
  *    matches fields by name for both attributes and elements, so round-trip
  *    equality holds even though the surface form differs
  *  - text escaped by the StAX writer (lossless for &<>'" content)
  */
final class XmlOutputWriter(val path: String, dataSchema: StructType,
    separatorTag: String, rootTag: String, context: TaskAttemptContext)
    extends OutputWriter {

  private val os = {
    val p = new Path(path)
    p.getFileSystem(context.getConfiguration).create(p, false)
  }
  private val xml = XMLOutputFactory.newInstance()
    .createXMLStreamWriter(new java.io.BufferedOutputStream(os, 256 * 1024),
      "UTF-8")
  xml.writeStartDocument("UTF-8", "1.0")
  xml.writeStartElement(rootTag)

  override def write(row: InternalRow): Unit =
    writeStruct(separatorTag, row, dataSchema)

  private def writeStruct(tag: String, row: InternalRow, st: StructType): Unit = {
    xml.writeStartElement(tag)
    var i = 0
    while (i < st.length) {
      if (!row.isNullAt(i)) {
        val f = st(i)
        if (f.name == "_Value") {
          xml.writeCharacters(leafText(row.get(i, f.dataType), f.dataType))
        } else writeField(f.name, row.get(i, f.dataType), f.dataType)
      }
      i += 1
    }
    xml.writeEndElement()
  }

  private def writeField(name: String, value: Any, dt: DataType): Unit =
    dt match {
      case st: StructType =>
        writeStruct(name, value.asInstanceOf[InternalRow], st)
      case ArrayType(et, _) =>
        val arr = value.asInstanceOf[ArrayData]
        var j = 0
        while (j < arr.numElements()) {
          if (!arr.isNullAt(j)) writeField(name, arr.get(j, et), et)
          j += 1
        }
      case leaf =>
        xml.writeStartElement(name)
        xml.writeCharacters(leafText(value, leaf))
        xml.writeEndElement()
    }

  private def leafText(value: Any, dt: DataType): String = dt match {
    case _: DecimalType =>
      value.asInstanceOf[Decimal].toJavaBigDecimal.toPlainString
    case BinaryType => // round-trips through the reader's xs:base64Binary
      java.util.Base64.getEncoder.encodeToString(value.asInstanceOf[Array[Byte]])
    case _ => value.toString // UTF8String / boxed primitives
  }

  override def close(): Unit = {
    xml.writeEndElement()
    xml.writeEndDocument()
    xml.close()
    os.close()
  }
}

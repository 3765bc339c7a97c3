package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter aggregate (the X2 `Aggregator` extension point applied to
  * a sketch): folds a group's long keys into ONE serialized Bloom filter.
  * Used by the versioned store's `_bloom` sidecar to build every
  * partition's membership filter in a single narrow aggregation — the
  * shuffle carries one partial filter per (task, partition), merged
  * associatively (`mergeInPlace` is a bitwise OR of equal-shaped
  * filters), never the keys themselves.
  *
  * The buffer rides Spark's own `BloomFilterImpl` (java-serializable);
  * all instances are created with the same (expectedItems, fpp) shape so
  * partials always merge. Spark's Bloom hashing is seed-fixed, so the
  * resulting bit set is a pure function of the key multiset — the same
  * determinism contract as the zone-map sidecars.
  */
class BloomAgg(expectedItems: Long, fpp: Double)
    extends Aggregator[java.lang.Long, BloomFilter, Array[Byte]] {
  override def zero: BloomFilter = BloomFilter.create(expectedItems, fpp)
  override def reduce(b: BloomFilter, x: java.lang.Long): BloomFilter = {
    if (x != null) b.putLong(x.longValue())
    b
  }
  override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
    a.mergeInPlace(b)
    a
  }
  override def finish(b: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    b.writeTo(out)
    out.toByteArray
  }
  override def bufferEncoder: Encoder[BloomFilter] =
    Encoders.javaSerialization(classOf[BloomFilter])
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object BloomAgg {
  /** Deserialize a [[finish]]ed filter (driver-side probe path). */
  def read(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
}

package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** T4/T5 streaming-state tests via MemoryStream (SURVEY.md §2.9): watermarked
  * tumbling aggregation emits closed windows and drops late data; stateful
  * dedup suppresses within-watermark duplicates; custom keyed state counts.
  */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  case class Ev(event_id: Long, ts: Timestamp, event_type: String, value: Double)
  case class UEv(user_id: Long, ts: Timestamp)

  test("streaming EWMA twin equals batch q_ts_ewma across arbitrary batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val batch = graft.operators.Analytics.queries("q_ts_ewma")(spark, sf)
      .select("user_id", "event_id", "ewma").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val evs = graft.Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts)").as("ts_us"),
        col("event_id"), floor(col("value") * 100).cast("long").as("c"))
      .as[(Long, Long, Long, Long)].collect()
      .sortBy(e => (e._2, e._3)) // global event-time order feed
    val input = MemoryStream[(Long, Long, Long, Long)]
    val q = StreamOps.ewmaPerKey(input.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("ewma_out").start()
    // 317-row chunks split every key's history mid-stream repeatedly
    evs.grouped(317).foreach { chunk =>
      input.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
    }
    q.stop()
    val got = spark.sql("SELECT * FROM ewma_out").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.size === batch.size)
    got.foreach { case (k, v) =>
      assert(v === batch(k), s"streaming ewma diverged from batch at $k")
    }
  }

  test("T4: watermarked tumbling window — late events beyond watermark dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamOps.tumblingCounts(input.toDF())
      .writeStream.outputMode("append").format("memory")
      .queryName("t4_out").start()
    // hour 10 events, then watermark advanced past 11:10 closes the window
    input.addData(Ev(1, ts(5), "click", 10.0), Ev(2, ts(40), "click", 20.0))
    q.processAllAvailable()
    input.addData(Ev(3, Timestamp.valueOf("2024-01-01 11:30:00"), "click", 5.0))
    q.processAllAvailable()
    // this event is an hour late — beyond the 10-minute watermark: dropped
    input.addData(Ev(4, ts(50), "click", 99.0))
    q.processAllAvailable()
    input.addData(Ev(5, Timestamp.valueOf("2024-01-01 12:30:00"), "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT wstart, n, sum_c FROM t4_out").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2))).toSet
    // hour-10 window closed with ONLY the two on-time events (3000 cents);
    // the late 99.0 never appears.
    assert(rows.contains(("2024-01-01 10:00:00.0", 2L, 3000L)), rows.toString)
  }

  test("T5: dropDuplicatesWithinWatermark suppresses dup event_ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamOps.dedupWithinWatermark(input.toDF())
      .writeStream.outputMode("append").format("memory")
      .queryName("t5_out").start()
    input.addData(Ev(1, ts(0), "click", 1.0), Ev(1, ts(1), "click", 1.0),
      Ev(2, ts(2), "view", 2.0))
    q.processAllAvailable()
    input.addData(Ev(1, ts(3), "click", 1.0)) // still within watermark: dup
    q.processAllAvailable()
    q.stop()
    val ids = spark.sql("SELECT event_id FROM t5_out").collect().map(_.getLong(0))
    assert(ids.sorted.toSeq === Seq(1L, 2L))
  }

  test("stream-static index lookup: arriving near-dup of a kept doc matches once, unrelated docs pass") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog near the old stone bridge today"
    val kept = Seq(
      (1L, base),
      (2L, base + " extra"),
      (3L, "completely different words about spark catalyst expression codegen internals")
    ).toDF("doc_id", "text")
    val ix = graft.pipeline.DedupIndex.components(kept, "text", "doc_id")
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = StreamOps.indexLookupStream(
      input.toDF().toDF("doc_id", "ts", "text"), ix)
      .writeStream.outputMode("append").format("memory")
      .queryName("ixlookup_out").start()
    // batch 1: a near-dup of kept doc 1/2 and an unrelated doc
    input.addData((100L, ts(0), base + " again"),
      (101L, ts(1), "unrelated fresh content on streaming watermarks and state stores"))
    q.processAllAvailable()
    // batch 2: ANOTHER near-dup arriving later still matches the static side
    input.addData((102L, ts(2), base + " once more"))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT doc_corpus, doc_new FROM ixlookup_out").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // every match pairs a corpus doc with a planted near-dup arrival; the
    // unrelated doc 101 matches nothing; the within-watermark dedup means
    // no (corpus, new) pair repeats despite multi-band collisions
    assert(got.nonEmpty && got.forall(p => Set(100L, 102L)(p._2)), got.mkString(","))
    assert(got.length === got.distinct.length, "pair emitted more than once")
    assert(got.contains((1L, 100L)) && got.contains((1L, 102L)), got.mkString(","))
  }

  test("stream-static vector lookup: streamed queries return exactly the batch IVF×SQ8 top-k") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val e = graft.Tables.embeddings(spark, sf)
    // persisted index components (build-if-absent), same as q_sq8_ivf reads
    val cells = graft.pipeline.VectorIndex.cells(spark, sf)
    val assign = graft.pipeline.VectorIndex.cellAssign(spark, sf)
    val codes = graft.pipeline.VectorIndex.sq8Codes(spark, sf)
    val stats = graft.pipeline.VectorIndex.sq8Stats(spark, sf)
    val probeVecs = e.filter(col("vec_id") < 3)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val input = MemoryStream[(Long, Timestamp, Seq[Float])]
    val q = StreamOps.vectorLookupStream(
      input.toDF().toDF("vec_id", "ts", "embedding"),
      cells, assign, codes, stats)
      .writeStream.outputMode("append").format("memory")
      .queryName("veclookup_out").start()
    input.addData(probeVecs.map { case (id, v) => (id, ts(0), v) }.toSeq)
    q.processAllAvailable()
    // a far-future row advances the watermark past the probes' window,
    // flushing their top-k; its own window never closes and never emits
    input.addData((999L, Timestamp.valueOf("2024-01-01 12:00:00"),
      probeVecs.head._2))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT qid, rank, vec_id, approx FROM veclookup_out")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val probes = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val batch = graft.pipeline.Similarity.sq8IvfTopK(
      probes, codes, stats, assign, cells, 10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got === batch,
      s"stream ∖ batch: ${got -- batch}; batch ∖ stream: ${batch -- got}")
    assert(!got.exists(_._1 == 999L), "unflushed window must not emit")
  }

  test("stream-static fuzzy bm25: typo'd streamed queries return exactly the batch fuzzy top-k") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val ix = graft.pipeline.TextIndex.persisted(spark, sf)
    // the q_bm25_fuzzy mutation: every word longer than 3 chars loses its
    // last char, so the deletion-variant expansion is load-bearing
    def mutate(t: String): String = t.toLowerCase.trim
      .split("\\s+").map(w => if (w.length > 3) w.dropRight(1) else w)
      .mkString(" ")
    val qdocs = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") < 3)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), mutate(r.getString(1))))
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = StreamOps.fuzzySearchStream(
      input.toDF().toDF("qid", "ts", "qtext"), ix)
      .writeStream.outputMode("append").format("memory")
      .queryName("fuzzy_out").start()
    val t0 = Timestamp.valueOf("2024-01-01 00:00:05")
    input.addData(qdocs.map { case (id, t) => (id, t0, t) }.toSeq)
    q.processAllAvailable()
    input.addData((999L, Timestamp.valueOf("2024-01-01 12:00:00"), "catalyst"))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT qid, rank, doc_id, score_u FROM fuzzy_out")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val batchQ = qdocs.toSeq.toDF("qid", "qtext")
    val batch = graft.pipeline.TextIndex.bm25FuzzyTopK(batchQ, ix, 10)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(batch.nonEmpty, "fuzzy batch result must not be vacuous")
    assert(got === batch,
      s"stream ∖ batch: ${got -- batch}; batch ∖ stream: ${batch -- got}")
    assert(!got.exists(_._1 == 999L), "unflushed window must not emit")
  }

  test("stream-static bm25 lookup: streamed query docs return exactly the batch top-k") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    // persisted text index (build-if-absent), same components as
    // q_bm25_index_search reads
    val ix = graft.pipeline.TextIndex.persisted(spark, sf)
    val qdocs = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") < 3)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = StreamOps.bm25SearchStream(
      input.toDF().toDF("qid", "ts", "qtext"), ix)
      .writeStream.outputMode("append").format("memory")
      .queryName("bm25_out").start()
    input.addData(qdocs.map { case (id, t) => (id, ts(0), t) }.toSeq)
    q.processAllAvailable()
    // a far-future row advances the watermark past the queries' window,
    // flushing their top-k; its own window never closes and never emits
    input.addData((999L, Timestamp.valueOf("2024-01-01 12:00:00"), "catalyst"))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT qid, rank, doc_id, score_u FROM bm25_out")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val batch = graft.pipeline.TextIndex.bm25TopK(
      graft.Tables.documents(spark, sf).filter(col("doc_id") < 3)
        .select(col("doc_id").as("qid"), col("text").as("qtext")),
      ix, 10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === batch,
      s"stream ∖ batch: ${got -- batch}; batch ∖ stream: ${batch -- got}")
    assert(!got.exists(_._1 == 999L), "unflushed window must not emit")
  }

  test("stream-static bpe tokenize: streamed docs get exactly the batch token streams") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    // persisted tokenizer artifact (build-if-absent) — the same vocab
    // q_bpe_tokenize joins
    val vocab = graft.pipeline.Bpe.vocab(spark, sf)
    val merges = graft.pipeline.Bpe.merges(spark, sf)
    // corpus docs + one synthetic doc whose words are OUT of the trained
    // vocabulary — both sides must take the merge-list fallback identically
    val docs = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") < 3).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))) :+
      (50L, "zzqx unseenword zzqx")
    val batchDocs = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") < 3).select("doc_id", "text")
      .union(Seq((50L, "zzqx unseenword zzqx")).toDF("doc_id", "text"))
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = StreamOps.bpeTokenizeStream(
      input.toDF().toDF("doc_id", "ts", "text"), vocab, merges)
      .writeStream.outputMode("append").format("memory")
      .queryName("bpe_out").start()
    input.addData(docs.map { case (id, t) => (id, ts(0), t) }.toSeq)
    q.processAllAvailable()
    // far-future row advances the watermark past the docs' window, flushing
    // them; its own window never closes and never emits
    input.addData((999L, Timestamp.valueOf("2024-01-01 12:00:00"), "aaa"))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT doc_id, n_tokens_bpe, tokens_md5 FROM bpe_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val batch = graft.pipeline.Bpe.tokenize(batchDocs, vocab, merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got.exists(_._1 == 50L), "the OOV doc must be tokenized, not dropped")
    assert(got === batch,
      s"stream ∖ batch: ${got -- batch}; batch ∖ stream: ${batch -- got}")
    assert(!got.exists(_._1 == 999L), "unflushed window must not emit")
  }

  test("stream-static nb classify: streamed docs get exactly the batch predictions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val m = graft.pipeline.NaiveBayes.persistedModel(spark, sf)
    val docs = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") < 5).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = StreamOps.nbClassifyStream(
      input.toDF().toDF("doc_id", "ts", "text"), m)
      .writeStream.outputMode("append").format("memory")
      .queryName("nb_out").start()
    input.addData(docs.map { case (id, t) => (id, ts(0), t) }.toSeq)
    q.processAllAvailable()
    input.addData((999L, Timestamp.valueOf("2024-01-01 12:00:00"), "aaa"))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT doc_id, lang_pred, score_u FROM nb_out")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batch = graft.pipeline.NaiveBayes.predict(
      graft.Tables.documents(spark, sf).filter(col("doc_id") < 5), m)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === batch,
      s"stream ∖ batch: ${got -- batch}; batch ∖ stream: ${batch -- got}")
    assert(!got.exists(_._1 == 999L), "unflushed window must not emit")
  }

  test("streaming curation: gates + exact/near dedup + classify + tokenize against persisted artifacts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val corpusHashes = graft.pipeline.DedupIndex.contentHashes(spark, sf)
    val corpus = graft.pipeline.DedupIndex.persisted(spark, sf)
    val nb = graft.pipeline.NaiveBayes.persistedModel(spark, sf)
    val vocab = graft.pipeline.Bpe.vocab(spark, sf)
    val merges = graft.pipeline.Bpe.merges(spark, sf)
    val corpusTexts = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") < 2).orderBy("doc_id")
      .select("text").as[String].collect()
    val freshText = "the quick brown fox jumps over the lazy dog tonight"
    // planted batch: an exact corpus dup, a near-dup (one word swapped), a
    // too-short doc, a repetitive doc, a within-stream dup pair, one fresh
    val nearDup = corpusTexts(1).split("\\s+").dropRight(1).mkString(" ") + " zzz"
    val feed = Seq(
      (100L, corpusTexts(0)),                    // exact dup of corpus -> drop
      (101L, nearDup),                           // near-dup of corpus -> drop
      (102L, "too short"),                       // quality: < 5 tokens -> drop
      (103L, "aa aa aa aa aa aa aa aa aa aa"),   // quality: uniq ratio -> drop
      (104L, freshText), (105L, freshText),      // within-stream dup pair
      (106L, "completely novel sentence with many distinct interesting words here")
    )
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = StreamOps.curateStream(
      input.toDF().toDF("doc_id", "ts", "text"),
      corpusHashes, corpus, nb, vocab, merges)
      .writeStream.outputMode("append").format("memory")
      .queryName("curate_out").start()
    input.addData(feed.map { case (id, t) => (id, ts(0), t) })
    q.processAllAvailable()
    input.addData((999L, Timestamp.valueOf("2024-01-01 12:00:00"),
      "alpha beta gamma delta epsilon"))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql(
      "SELECT doc_id, lang_pred, score_u, n_tokens_bpe, tokens_md5 FROM curate_out")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    val ids = got.map(_._1).toSet
    assert(!ids.contains(100L), "exact corpus dup must drop")
    assert(!ids.contains(101L), "near-dup of corpus must drop")
    assert(!ids.contains(102L) && !ids.contains(103L), "gated docs must drop")
    assert(ids.intersect(Set(104L, 105L)).size === 1,
      s"exactly one of the within-stream dup pair survives: $ids")
    assert(ids.contains(106L), "the fresh doc must survive")
    assert(!ids.contains(999L), "unflushed window must not emit")
    // survivor fields ≡ the batch operators over the same rows
    val survivors = got.filter(r => r._1 == 106L || r._1 == 104L || r._1 == 105L)
    val sdf = survivors.map(r => (r._1, feed.find(_._1 == r._1).get._2))
      .toSeq.toDF("doc_id", "text")
    val predB = graft.pipeline.NaiveBayes.predict(sdf, nb).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(survivors.map(r => (r._1, r._2, r._3)).toSet === predB,
      "streamed lang_pred/score_u must equal batch NB predict")
    val tokB = graft.pipeline.Bpe.tokenize(sdf, vocab, merges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(survivors.map(r => (r._1, r._4, r._5)).toSet === tokB,
      "streamed token fields must equal batch Bpe.tokenize")
  }

  test("streaming XML ingestion: readStream over the graft.xml format") {
    val dir = java.nio.file.Files.createTempDirectory("xmlstream").toFile
    val dataDir = new java.io.File(dir, "data"); dataDir.mkdirs()
    def writeFile(n: Int): Unit =
      java.nio.file.Files.writeString(
        new java.io.File(dataDir, s"batch-$n.xml").toPath,
        s"<library><item sku='S$n'><title>t$n</title><price>$n.5</price>" +
          "<in_print>true</in_print></item></library>")
    writeFile(0)
    val schema = graft.xml.XsdSchema.structTypeFor(
      "src/test/resources/graftxml/library/schema", "", "itemType")
    val stream = spark.readStream.format("graft.xml")
      .schema(schema)
      .option("xml.schema.location", "src/test/resources/graftxml/library/schema")
      .option("xml.separator.tag", "item")
      .option("xml.separator.tag.type", "itemType")
      .load(dataDir.getAbsolutePath)
    val q = stream.select("sku", "price")
      .writeStream.outputMode("append").format("memory")
      .queryName("xml_stream_out").start()
    q.processAllAvailable()
    writeFile(1); writeFile(2) // files arriving later = new micro-batches
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT sku, price FROM xml_stream_out").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(got === Set(("S0", 0.5), ("S1", 1.5), ("S2", 2.5)))
  }

  test("stream-stream interval join: clicks attribute to in-horizon impressions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Long, Timestamp)]
    val clks = MemoryStream[(Long, Long, Timestamp)]
    val q = StreamOps.clickAttribution(
      imps.toDF().toDF("imp_id", "imp_user", "imp_ts"),
      clks.toDF().toDF("click_id", "click_user", "click_ts"))
      .writeStream.outputMode("append").format("memory")
      .queryName("attr_out").start()
    // user 1: click 4 min after impression (attributed); user 2: click 30 min
    // after (outside the 15-min horizon); user 3: click with no impression.
    imps.addData((100L, 1L, ts(0)), (200L, 2L, ts(0)))
    clks.addData((900L, 1L, ts(4)), (901L, 2L, ts(30)), (902L, 3L, ts(5)))
    q.processAllAvailable()
    // advance both watermarks so state can be finalized
    imps.addData((300L, 9L, Timestamp.valueOf("2024-01-01 12:00:00")))
    clks.addData((903L, 9L, Timestamp.valueOf("2024-01-01 12:00:00")))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT imp_id, click_id FROM attr_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((100L, 900L)), got.toString)   // in-horizon pair
    assert(!got.exists(_._2 == 901L), got.toString)    // out of horizon
    assert(!got.exists(_._2 == 902L), got.toString)    // no impression
  }

  test("stream-static enrichment: streaming events join a static dimension") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = graft.Tables.customer(spark, "/root/testdata/sf0.001")
      .select(col("c_custkey"), col("c_mktsegment"))
    val input = MemoryStream[(Long, Long)] // (event_id, user_id)
    val q = input.toDF().toDF("event_id", "user_id")
      .join(dim, col("user_id") === col("c_custkey"), "left")
      .select("event_id", "c_mktsegment")
      .writeStream.outputMode("append").format("memory")
      .queryName("enrich_out").start()
    input.addData((1L, 1L), (2L, 999999L)) // known customer + miss
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT event_id, c_mktsegment FROM enrich_out")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L).nonEmpty) // enriched from the static side
    assert(got(2L).isEmpty)  // unmatched stays null (left join)
  }

  test("streaming content dedup drops same-text docs across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = StreamOps.contentDedupWithinWatermark(
      input.toDF().toDF("doc_id", "text", "ts"), "text", "ts")
      .writeStream.outputMode("append").format("memory")
      .queryName("cdedup_out").start()
    input.addData((1L, "Hello  World", ts(0)), (2L, "other doc", ts(1)))
    q.processAllAvailable()
    // same text modulo case/whitespace, later batch: dropped
    input.addData((3L, "hello world", ts(2)), (4L, "third doc", ts(3)))
    q.processAllAvailable()
    q.stop()
    val ids = spark.sql("SELECT doc_id FROM cdedup_out").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(ids === Seq(1L, 2L, 4L))
  }

  test("custom keyed state: running counts per user across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val q = StreamOps.runningCountsPerUser(input.toDS())
      .writeStream.outputMode("update").format("memory")
      .queryName("state_out").start()
    input.addData((7L, 1L), (7L, 2L), (8L, 1L))
    q.processAllAvailable()
    input.addData((7L, 3L))
    q.processAllAvailable()
    q.stop()
    val last = spark.sql("SELECT * FROM state_out").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // user 7 reaches 3 across two batches; user 8 stays at 1
    assert(last.contains((7L, 3L)) && last.contains((8L, 1L)))
  }

  test("transformWithState: running counts via the Spark 4 state API (RocksDB)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(Long, Long)]
      val q = StreamOps.runningCountsTws(input.toDS())
        .writeStream.outputMode("update").format("memory")
        .queryName("tws_out").start()
      input.addData((7L, 1L), (7L, 2L), (8L, 1L))
      q.processAllAvailable()
      input.addData((7L, 3L))
      q.processAllAvailable()
      q.stop()
      val rows = spark.sql("SELECT * FROM tws_out").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // same contract as the mapGroupsWithState spelling
      assert(rows.contains((7L, 3L)) && rows.contains((8L, 1L)), rows.mkString(","))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("arbitrary state: sessionizer emits gap-closed and watermark-timeout sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def us(t: Timestamp): Long = t.getTime * 1000L
    val input = MemoryStream[UEv]
    val q = StreamOps.sessionizeWithState(input.toDF(), gapMinutes = 5)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_state_out").start()
    // batch 1: user 1 opens a session (2 events), user 2 opens a 1-event one
    input.addData(UEv(1, ts(0)), UEv(1, ts(2)), UEv(2, ts(1)))
    q.processAllAvailable()
    // batch 2: user 1 at 10:20 — 18-min gap closes [10:00, 10:02] in-batch,
    // and advances the watermark to 10:10, past user 2's 10:06 timeout
    input.addData(UEv(1, ts(20)))
    q.processAllAvailable()
    // batches 3-4: watermark sweeps past every remaining timeout
    input.addData(UEv(3, ts(40)))
    q.processAllAvailable()
    input.addData(UEv(3, Timestamp.valueOf("2024-01-01 11:00:00")))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT * FROM sess_state_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // gap-closed in-batch:
    assert(rows.contains((1L, us(ts(0)), us(ts(2)), 2L)), rows.toString)
    // closed by event-time timeout once the watermark passed end + gap:
    assert(rows.contains((2L, us(ts(1)), us(ts(1)), 1L)), rows.toString)
    assert(rows.contains((1L, us(ts(20)), us(ts(20)), 1L)), rows.toString)
  }

  test("sessionizer boundary: an event exactly AT prev + gap starts a NEW session") {
    // The session window is [start, last + gap) — same contract as the
    // Temporal T3b session_window path, so an event landing exactly on the
    // boundary must NOT extend the session.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def us(t: Timestamp): Long = t.getTime * 1000L
    val input = MemoryStream[UEv]
    val q = StreamOps.sessionizeWithState(input.toDF(), gapMinutes = 5)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_boundary_out").start()
    // both events in one batch: the in-batch walk hits the boundary directly
    input.addData(UEv(9, ts(0)), UEv(9, ts(5)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT * FROM sess_boundary_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // the first session closes as a singleton — NOT extended to [0, 5]
    assert(rows.contains((9L, us(ts(0)), us(ts(0)), 1L)), rows.toString)
  }

  private val curBase = "the quick brown fox jumps over a lazy dog and runs " +
    "far into the deep green forest of tall old trees on it"

  case class Doc(doc_id: Long, ts: Timestamp, text: String)

  test("streaming signature dedup: normalization twins dropped, near-dups kept") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamOps.signatureDedupWithinWatermark(input.toDF(), "text", "ts")
      .writeStream.outputMode("append").format("memory")
      .queryName("sigdedup_out").start()
    input.addData(Doc(1, ts(0), curBase), Doc(4, ts(1), "tiny doc"))
    q.processAllAvailable()
    // 2 = case/whitespace twin of 1 (same signature: dropped);
    // 5 = one-word edit (signature differs: kept — that near-dup is the
    //     candidate stream's job); 6 = different short doc (content-hash
    //     fallback key: kept, NOT glued to doc 4)
    input.addData(Doc(2, ts(2), curBase.toUpperCase + "  "),
      Doc(5, ts(3), curBase.replace("forest", "jungle")),
      Doc(6, ts(4), "other tiny"))
    q.processAllAvailable()
    q.stop()
    val ids = spark.sql("SELECT doc_id FROM sigdedup_out").collect()
      .map(_.getLong(0)).toSet
    assert(ids === Set(1L, 4L, 5L, 6L), ids.toString)
  }

  test("streaming LSH candidates: band collision emits anchor pair incrementally") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    // same narrow-band geometry as the batch LSH planted-pair test: r=2
    // keeps per-band hit probability s² and 16 bands make a one-word-edit
    // miss vanishingly rare (and deterministic for this fixed text pair)
    val q = StreamOps.nearDupCandidatesStream(input.toDF(), k = 32, bands = 16)
      .writeStream.outputMode("append").format("memory")
      .queryName("lshcand_out").start()
    val base = "spark shuffles partition data across the cluster for joins " +
      "and aggregations while the optimizer prunes columns and pushes filters"
    val unrelated = "a bright sun rises over the calm blue sea and warm " +
      "sand while gulls glide past small white boats in the bay"
    input.addData(Doc(1, ts(0), base), Doc(3, ts(1), unrelated))
    q.processAllAvailable()
    // near-dup of doc 1 arrives a batch LATER: the bucket anchor persisted
    // in the state store still pairs it up
    input.addData(Doc(2, ts(2), base.replace("cluster", "fleet")))
    q.processAllAvailable()
    q.stop()
    val hits = spark.sql("SELECT doc_a, doc_b, band FROM lshcand_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // (1,2) collides in at least one band; the unrelated doc pairs with nobody
    assert(hits === Set((1L, 2L)), hits.toString)
  }

  test("streaming phrase search over static positions ≡ batch anchor-coverage walk") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.TextIndex
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "slow then the quick brown dog"),
      (4L, "a b a b a")
    ).toDF("doc_id", "text")
    val positions = TextIndex.positionsOf(docs)
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = StreamOps.phraseSearchStream(
      input.toDF().toDF("qid", "ts", "qtext"), positions)
      .writeStream.outputMode("append").format("memory")
      .queryName("phrase_out").start()
    input.addData((10L, ts(0), "the quick brown"), (11L, ts(1), "a b a"))
    q.processAllAvailable()
    // advance the watermark past the window so the windowed aggs emit
    input.addData((99L, Timestamp.valueOf("2024-01-01 12:00:00"), "zz zz zz"))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT qid, doc_id, n_hits FROM phrase_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = TextIndex.phraseTopDocs(
      Seq((10L, "the quick brown"), (11L, "a b a")).toDF("qid", "qtext"),
      positions)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === batch, s"stream $got != batch $batch")
    assert(got === Set((10L, 1L, 1L), (10L, 2L, 1L), (11L, 4L, 2L)))
  }

  test("streaming proximity search over static anchor slots ≡ batch binned walk") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.TextIndex
    val docs = Seq(
      (1L, "x a b x a c"),
      (2L, "a b c a b c"),
      (3L, "c b a"),
      (4L, "a x x x x b c")
    ).toDF("doc_id", "text")
    val positions = TextIndex.positionsOf(docs)
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = StreamOps.proximitySearchStream(
      input.toDF().toDF("qid", "ts", "qtext"), positions, m = 3, win = 5)
      .writeStream.outputMode("append").format("memory")
      .queryName("prox_out").start()
    input.addData((10L, ts(0), "a b c"))
    q.processAllAvailable()
    input.addData((99L, Timestamp.valueOf("2024-01-01 12:00:00"), "zz zz zz"))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT qid, doc_id, n_windows FROM prox_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = TextIndex.proximityTopDocs(
      Seq((10L, "a b c")).toDF("qid", "qtext"), positions,
      m = 3, window = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === batch, s"stream $got != batch $batch")
    assert(got === Set((10L, 1L, 1L), (10L, 2L, 2L)))
  }

  test("streaming MV maintenance: the CDC feed folds into the live aggregate, migrations and drops included") {
    import spark.implicits._
    import graft.operators.Versioned
    val dir = java.nio.file.Files.createTempDirectory("graft-vt-mv").toString
    // create → rewrite (b migrates to b2, c appears) → delete (a gone)
    Versioned.commitCdc(spark,
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "name", "bal"),
      dir, "k", Seq("name", "bal"))
    Versioned.commitCdc(spark,
      Seq((1L, "a", 10L), (2L, "b2", 25L), (3L, "c", 30L))
        .toDF("k", "name", "bal"),
      dir, "k", Seq("name", "bal"))
    Versioned.commitCdc(spark,
      Seq((2L, "b2", 25L), (3L, "c", 30L)).toDF("k", "name", "bal"),
      dir, "k", Seq("name", "bal"))
    val schema = Versioned.changes(spark, dir, 0, 1, "k", Seq("name", "bal"))
      .withColumn("commit_version", lit(1)).schema
    val q = StreamOps.maintainAggStream(
      Versioned.cdcStream(spark, dir, schema),
      "o_name", "n_name", "o_bal", "n_bal")
      .writeStream.outputMode("complete").format("memory")
      .queryName("mv_out").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("mv_out").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // the live MV equals a per-name aggregate over the latest snapshot:
    // "a" dropped (count hit zero), "b" migrated to "b2"
    val direct = Versioned.readLatest(spark, dir)
      .groupBy("name").agg(count(lit(1)).as("cnt"), sum("bal").as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got === direct, s"stream MV $got != direct $direct")
    assert(got === Map("b2" -> ((1L, 25L)), "c" -> ((1L, 30L))), got.toString)
  }

  test("streaming versioned-table CDC: the change feed replays each commit as a micro-batch") {
    import spark.implicits._
    import graft.operators.Versioned
    val dir = java.nio.file.Files.createTempDirectory("graft-vt-cdc").toString
    def row(k: Long, name: String, bal: Long) = (k, name, bal)
    // three CDC-enabled commits: create, upsert-ish rewrite, delete
    Versioned.commitCdc(spark,
      Seq(row(1, "a", 10), row(2, "b", 20)).toDF("k", "name", "bal"),
      dir, "k", Seq("name", "bal"))
    Versioned.commitCdc(spark,
      Seq(row(1, "a", 10), row(2, "b2", 25), row(3, "c", 30))
        .toDF("k", "name", "bal"),
      dir, "k", Seq("name", "bal"))
    Versioned.commitCdc(spark,
      Seq(row(2, "b2", 25), row(3, "c", 30)).toDF("k", "name", "bal"),
      dir, "k", Seq("name", "bal"))
    // the streamed feed must equal the batch snapshotDiff chain, each row
    // tagged with the commit that produced it
    val batchChain = (Versioned.changes(spark, dir, 0, 1, "k",
        Seq("name", "bal")).withColumn("commit_version", lit(1))
      unionByName Versioned.changes(spark, dir, 1, 2, "k", Seq("name", "bal"))
        .withColumn("commit_version", lit(2)))
    def keyOf(r: org.apache.spark.sql.Row) =
      (r.getLong(r.fieldIndex("k")), r.getString(r.fieldIndex("change_type")),
        r.getInt(r.fieldIndex("commit_version")))
    val schema = batchChain.schema
    val q = Versioned.cdcStream(spark, dir, schema)
      .writeStream.outputMode("append").format("memory")
      .queryName("cdc_out").start()
    q.processAllAvailable()
    val v0adds = spark.table("cdc_out")
      .filter(col("commit_version") === 0).collect()
    assert(v0adds.map(r => (r.getLong(r.fieldIndex("k")),
      r.getString(r.fieldIndex("change_type")))).toSet ===
      Set((1L, "added"), (2L, "added")),
      "the first commit's feed entry is the full initial snapshot as adds")
    val streamed = spark.table("cdc_out")
      .filter(col("commit_version") > 0).collect().map(keyOf).toSet
    assert(streamed === batchChain.collect().map(keyOf).toSet,
      "replayed CDC stream must equal the batch snapshotDiff chain")
    // a commit made WHILE the stream runs arrives as its own micro-batch
    Versioned.commitCdc(spark,
      Seq(row(2, "b3", 99), row(3, "c", 30)).toDF("k", "name", "bal"),
      dir, "k", Seq("name", "bal"))
    q.processAllAvailable()
    q.stop()
    val live = spark.table("cdc_out").filter(col("commit_version") === 3)
      .collect().map(keyOf).toSet
    assert(live === Set((2L, "changed", 3)),
      "the in-flight commit must surface exactly its own delta")
  }

  test("E148: versionedIngest — each micro-batch is one append commit, exactly-once on replay") {
    import spark.implicits._
    import graft.operators.Versioned
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-vting").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-vting-ck").toString
    val input = MemoryStream[(Long, String)]
    val q = StreamOps.versionedIngest(
      input.toDF().toDF("k", "name"), dir, ckpt)
    input.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    // first batch bootstraps the table (materialized initial commit)
    assert(Versioned.latest(dir) === 0 && !Versioned.isAddVersion(dir, 0))
    input.addData((3L, "c"))
    q.processAllAvailable()
    // each later batch is ONE append (delta) commit — cost ∝ batch rows
    assert(Versioned.latest(dir) === 1 && Versioned.isAddVersion(dir, 1))
    q.stop()
    assert(Versioned.readAtDv(spark, dir, 1).collect()
      .map(_.getAs[Long]("k")).toSet === Set(1L, 2L, 3L))
    // crash-replay: a RESTARTED sink re-running an already-committed batch
    // id is a no-op (the committed _batchid marker wins over the replay)
    assert(Versioned.appendBatchIdempotent(
      Seq((3L, "c")).toDF("k", "name"), dir, 1L) === None)
    assert(Versioned.latest(dir) === 1)
    // downstream composition: the history the sink built serves time
    // travel and chain-resolved reads like any other versioned table
    assert(Versioned.readAt(spark, dir, 0).count() === 2)
  }

  test("E148/E150: versionedIngestExpect — per-batch gates, quarantine reasons, replay skips both writes") {
    import spark.implicits._
    import graft.operators.Versioned
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-vtinge").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-vtinge-ck").toString
    val input = MemoryStream[(Long, String, Long)]
    val q = StreamOps.versionedIngestExpect(
      input.toDF().toDF("k", "name", "bal"), dir, ckpt, Seq(
        "has_name" -> col("name").isNotNull,
        "nonneg_bal" -> (col("bal") >= 0L)))
    input.addData((1L, "a", 10L), (2L, null.asInstanceOf[String], 20L))
    q.processAllAvailable()
    input.addData((3L, "c", -5L), (4L, "d", 40L))
    q.processAllAvailable()
    q.stop()
    // only the fully-valid rows reached the table (batch 0 bootstraps,
    // batch 1 appends)
    assert(Versioned.readAtDv(spark, dir, Versioned.latest(dir)).collect()
      .map(_.getAs[Long]("k")).toSet === Set(1L, 4L))
    // quarantine carries each reject with its gate name and batch version
    val quar = Versioned.quarantine(spark, dir).collect()
      .map(r => r.getAs[Long]("k") ->
        (r.getAs[String]("violations"), r.getAs[Int]("commit_version")))
      .toMap
    assert(quar === Map(2L -> ("has_name", 0), 3L -> ("nonneg_bal", 1)))
    // crash-replay of a committed batch: neither the table NOR the
    // quarantine double-appends (idempotence short-circuits both writes)
    assert(Versioned.appendBatchIdempotent(
      Seq((4L, "d", 40L)).toDF("k", "name", "bal"), dir, 1L) === None)
    assert(Versioned.quarantine(spark, dir).count() === 2)
  }

  test("E187: gated ingest crash between quarantine write and seal — the " +
      "replay repairs BOTH writes, the aborted attempt's debris is invisible") {
    import spark.implicits._
    import graft.operators.Versioned
    val dir = java.nio.file.Files.createTempDirectory("graft-vtingc").toString
    Versioned.commit(Seq((0L, "base", 1L)).toDF("k", "name", "bal"), dir)
    // simulate the crash window the beforeSeal ordering leaves: version 1
    // was CLAIMED, its data + quarantine rows landed INSIDE the v1 dir,
    // but the seal never happened (no _commit mark) — the quarantine
    // write runs BEFORE the seal precisely so this is the only loss shape
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(dir, "v1._claim"))
    Seq((5L, "e", 50L)).toDF("k", "name", "bal")
      .write.mode("overwrite").parquet(s"$dir/v1/_add")
    Seq((9L, "crash", -1L)).toDF("k", "name", "bal")
      .withColumn("violations", lit("nonneg_bal"))
      .withColumn("commit_version", lit(1))
      .write.mode("overwrite").parquet(Versioned.quarantineDir(dir, 1))
    // the debris sits in an UNSEALED version dir: structurally invisible
    // to the quarantine read (which fails loudly — nothing committed was
    // ever quarantined) and to snapshot reads
    intercept[Exception] { Versioned.quarantine(spark, dir) }
    assert(Versioned.readAtDv(spark, dir, Versioned.latest(dir)).count()
      === 1)
    // the replay re-runs the batch in full: valid rows commit (skipping
    // the claimed hole), rejects land tagged with the SEALED version
    StreamOps.ingestExpectBatch(
      Seq((5L, "e", 50L), (9L, "crash", -1L)).toDF("k", "name", "bal"),
      dir, 7L, Seq("nonneg_bal" -> (col("bal") >= 0L)))
    val tip = Versioned.latest(dir)
    assert(tip === 2 && Versioned.isAddVersion(dir, tip))
    assert(Versioned.readAtDv(spark, dir, tip).collect()
      .map(_.getAs[Long]("k")).toSet === Set(0L, 5L))
    val quar = Versioned.quarantine(spark, dir).collect()
    assert(quar.length === 1 &&
      quar.head.getAs[Long]("k") === 9L &&
      quar.head.getAs[Int]("commit_version") === tip)
    // and a replayed batch id still short-circuits both writes
    assert(Versioned.appendBatchIdempotent(
      Seq((5L, "e", 50L)).toDF("k", "name", "bal"), dir, 7L) === None)
    assert(Versioned.quarantine(spark, dir).count() === 1)
    // retention: vacuum removes the hole AND its debris physically (the
    // per-version layout makes this structural — a global sidecar would
    // resurface the debris once vacuum deleted the hole's claim file);
    // vacuumed committed versions drop their quarantine rows with their
    // data, the retention contract
    Versioned.compactDv(spark, dir) // v3: materialized fold
    Versioned.vacuum(dir, 1)
    assert(!new java.io.File(s"$dir/v1").exists,
      "vacuum must remove the hole dir with its debris")
    intercept[Exception] { Versioned.quarantine(spark, dir) }
  }

  test("E155: graft.versioned streaming source — snapshot + appends, live " +
      "commits picked up, schema aligned to creation time") {
    import graft.operators.Versioned
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("vsrc").toString
    Versioned.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), dir) // v0
    Versioned.appendRows(Seq((3L, "c")).toDF("k", "s"), dir) // v1
    val q = spark.readStream.format("graft.versioned").load(dir)
      .writeStream.outputMode("append").format("memory")
      .queryName("vsrc_out").start()
    q.processAllAvailable()
    def got(): Set[(Long, Option[String])] =
      spark.table("vsrc_out").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toSet
    assert(got() === Set(1L -> Some("a"), 2L -> Some("b"), 3L -> Some("c")))
    // a commit landing while the stream runs is served by the next batch
    Versioned.appendRows(Seq((4L, "d")).toDF("k", "s"), dir) // v2
    q.processAllAvailable()
    assert(got().contains(4L -> Some("d")))
    // additive evolution mid-stream: the extra column is dropped (the
    // stream keeps its creation-time schema), the row still arrives; a
    // NARROW append null-pads the missing column
    Versioned.appendRows(Seq((5L, "e", 99L)).toDF("k", "s", "extra"), dir)
    Versioned.appendRows(Seq(Tuple1(6L)).toDF("k"), dir)
    q.processAllAvailable()
    assert(got().contains(5L -> Some("e")) && got().contains(6L -> None))
    q.stop()
  }

  test("E181: graft.versioned streaming SINK — writeStream.format e2e, one " +
      "append commit per batch, replayed batch appends once") {
    import graft.operators.Versioned
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("vsink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("vsink-ck").toString
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("k", "name")
      .writeStream.format("graft.versioned")
      .option("checkpointLocation", ckpt)
      .start(dir)
    input.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    // first batch bootstraps the table (materialized initial commit)
    assert(Versioned.latest(dir) === 0 && !Versioned.isAddVersion(dir, 0))
    input.addData((3L, "c"))
    q.processAllAvailable()
    // each later batch is ONE append (delta) commit — cost ∝ batch rows
    assert(Versioned.latest(dir) === 1 && Versioned.isAddVersion(dir, 1))
    q.stop()
    assert(Versioned.readAtDv(spark, dir, 1).collect()
      .map(_.getAs[Long]("k")).toSet === Set(1L, 2L, 3L))
    // crash-replay through the SINK face: re-delivering an
    // already-committed batch id appends nothing (the _batchid marker
    // short-circuits inside addBatch)
    new graft.sources.VersionedStreamSink(dir, Seq.empty)
      .addBatch(1L, Seq((3L, "c")).toDF("k", "name"))
    assert(Versioned.latest(dir) === 1)
    // a RESTARTED stream from the same checkpoint resumes cleanly and a
    // new batch appends as the next commit
    val q2 = input.toDF().toDF("k", "name")
      .writeStream.format("graft.versioned")
      .option("checkpointLocation", ckpt)
      .start(dir)
    input.addData((4L, "d"))
    q2.processAllAvailable()
    q2.stop()
    assert(Versioned.latest(dir) === 2 && Versioned.isAddVersion(dir, 2))
    assert(Versioned.readAtDv(spark, dir, 2).collect()
      .map(_.getAs[Long]("k")).toSet === Set(1L, 2L, 3L, 4L))
    // source ∘ sink composition: the table the sink built streams back
    // out through the graft.versioned SOURCE
    val rt = spark.readStream.format("graft.versioned").load(dir)
      .writeStream.outputMode("append").format("memory")
      .queryName("vsink_rt").start()
    rt.processAllAvailable()
    assert(spark.table("vsink_rt").collect().map(_.getLong(0)).toSet
      === Set(1L, 2L, 3L, 4L))
    rt.stop()
  }

  test("E181: graft.versioned sink expectation.<name> options gate rows " +
      "into table vs quarantine") {
    import graft.operators.Versioned
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("vsinke").toString
    val ckpt = java.nio.file.Files.createTempDirectory("vsinke-ck").toString
    val input = MemoryStream[(Long, String, Long)]
    val q = input.toDF().toDF("k", "name", "bal")
      .writeStream.format("graft.versioned")
      .option("checkpointLocation", ckpt)
      .option("expectation.has_name", "name IS NOT NULL")
      .option("expectation.nonneg_bal", "bal >= 0")
      .start(dir)
    input.addData((1L, "a", 10L), (2L, null.asInstanceOf[String], 20L))
    q.processAllAvailable()
    input.addData((3L, "c", -5L), (4L, "d", 40L))
    q.processAllAvailable()
    q.stop()
    // only fully-valid rows reached the table
    assert(Versioned.readAtDv(spark, dir, Versioned.latest(dir)).collect()
      .map(_.getAs[Long]("k")).toSet === Set(1L, 4L))
    // quarantine carries each reject with its gate name and batch version
    val quar = Versioned.quarantine(spark, dir).collect()
      .map(r => r.getAs[Long]("k") ->
        (r.getAs[String]("violations"), r.getAs[Int]("commit_version")))
      .toMap
    assert(quar === Map(2L -> ("has_name", 0), 3L -> ("nonneg_bal", 1)))
    // unsupported modes fail loudly at start
    intercept[Exception] {
      input.toDF().toDF("k", "name", "bal")
        .groupBy("k").count()
        .writeStream.format("graft.versioned")
        .outputMode("complete")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("vsinke-ck2").toString)
        .start(java.nio.file.Files.createTempDirectory("vsinke2").toString)
    }
  }

  test("E155: startingVersion tails history; maxVersionsPerTrigger bounds " +
      "each micro-batch to one commit") {
    import graft.operators.Versioned
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("vsrc2").toString
    Versioned.commit(Seq((1L, "a")).toDF("k", "s"), dir) // v0
    Versioned.appendRows(Seq((2L, "b")).toDF("k", "s"), dir) // v1
    Versioned.appendRows(Seq((3L, "c")).toDF("k", "s"), dir) // v2
    // tail from v2: the v0 snapshot and v1 delta are NOT served
    val tail = spark.readStream.format("graft.versioned")
      .option("startingVersion", "2").load(dir)
      .writeStream.outputMode("append").format("memory")
      .queryName("vsrc_tail").start()
    tail.processAllAvailable()
    assert(spark.table("vsrc_tail").collect().map(_.getLong(0)).toSet
      === Set(3L))
    tail.stop()
    // rate-limited changes-from-v0 drain: one version per micro-batch →
    // three non-empty batches (v0's own data, then each delta), content
    // complete
    val lim = spark.readStream.format("graft.versioned")
      .option("startingVersion", "0")
      .option("maxVersionsPerTrigger", "1").load(dir)
      .writeStream.outputMode("append").format("memory")
      .queryName("vsrc_lim").start()
    lim.processAllAvailable()
    assert(spark.table("vsrc_lim").collect().map(_.getLong(0)).toSet
      === Set(1L, 2L, 3L))
    val nonEmpty = lim.recentProgress.count(_.numInputRows > 0)
    assert(nonEmpty >= 3, s"expected >=3 rate-limited batches, $nonEmpty")
    lim.stop()
    // DEFAULT mode bootstraps the whole history as ONE snapshot batch
    // even under the rate limit (the snapshot is one plan, not a range)
    val snap = spark.readStream.format("graft.versioned")
      .option("maxVersionsPerTrigger", "1").load(dir)
      .writeStream.outputMode("append").format("memory")
      .queryName("vsrc_snap").start()
    snap.processAllAvailable()
    assert(spark.table("vsrc_snap").collect().map(_.getLong(0)).toSet
      === Set(1L, 2L, 3L))
    assert(snap.recentProgress.count(_.numInputRows > 0) === 1)
    snap.stop()
    // an uncommitted startingVersion hole is rejected at stream creation
    val e = intercept[Exception] {
      spark.readStream.format("graft.versioned")
        .option("startingVersion", "1")
        .load(java.nio.file.Files.createTempDirectory("vsrc2b").toString)
    }
    assert(e.getMessage.contains("no committed versions"))
  }

  test("E164: a column-mapping rename mid-stream fails the query loudly (no opt-out)") {
    import graft.operators.Versioned
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("vsrc-ren").toString
    Versioned.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), dir) // v0
    val q = spark.readStream.format("graft.versioned").load(dir)
      .writeStream.outputMode("append").format("memory")
      .queryName("vsrc_ren").start()
    q.processAllAvailable()
    assert(spark.table("vsrc_ren").count() === 2)
    Versioned.renameColumn(spark, dir, "s", "txt") // v1, mid-stream
    Versioned.appendRows(Seq((3L, "c")).toDF("k", "txt"), dir) // v2
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    // even ignoreChanges+ignoreDeletes must not skip it: the retired
    // column would silently null-pad in every later batch
    assert(e.getMessage.contains("rename") ||
      Option(e.getCause).exists(_.getMessage.contains("rename")))
    // a RESTARTED stream past the rename serves the new schema
    val q2 = spark.readStream.format("graft.versioned")
      .option("startingVersion", "2").load(dir)
      .writeStream.outputMode("append").format("memory")
      .queryName("vsrc_ren2").start()
    q2.processAllAvailable()
    val rows = spark.table("vsrc_ren2")
    assert(rows.columns.toSeq === Seq("k", "txt"))
    assert(rows.collect().map(_.getLong(0)).toSet === Set(3L))
    q2.stop()
  }

  test("E155: a deletion-vector commit mid-stream fails the query unless " +
      "ignoreDeletes; snapshot commits need ignoreChanges") {
    import graft.operators.Versioned
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("vsrc3").toString
    Versioned.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), dir) // v0
    Versioned.appendRows(Seq((3L, "c")).toDF("k", "s"), dir) // v1
    Versioned.deleteWhereDv(spark, dir, col("k") === 1L, "k") // v2 (DV)
    Versioned.appendRows(Seq((4L, "d")).toDF("k", "s"), dir) // v3
    // changes-from mode crossing the DV version without opt-in fails
    val fail = spark.readStream.format("graft.versioned")
      .option("startingVersion", "0").load(dir)
      .writeStream.outputMode("append").format("memory")
      .queryName("vsrc_fail").start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      fail.processAllAvailable()
    }
    assert(e.getMessage.contains("deletion-vector") ||
      Option(e.getCause).exists(_.getMessage.contains("deletion-vector")))
    // opted in: the DV commit is skipped (append-only consumers see no
    // deletes — Delta's ignoreDeletes contract), all change rows arrive
    val ok = spark.readStream.format("graft.versioned")
      .option("startingVersion", "0")
      .option("ignoreDeletes", "true").load(dir)
      .writeStream.outputMode("append").format("memory")
      .queryName("vsrc_ok").start()
    ok.processAllAvailable()
    assert(spark.table("vsrc_ok").collect().map(_.getLong(0)).toSet
      === Set(1L, 2L, 3L, 4L))
    ok.stop()
    // DEFAULT mode instead FOLDS the delete into its bootstrap snapshot
    // (no opt-in needed to start on a history containing deletes) — and a
    // DV landing while the stream RUNS is the failure case
    val live = spark.readStream.format("graft.versioned").load(dir)
      .writeStream.outputMode("append").format("memory")
      .queryName("vsrc_live").start()
    live.processAllAvailable()
    assert(spark.table("vsrc_live").collect().map(_.getLong(0)).toSet
      === Set(2L, 3L, 4L)) // k=1 deleted by the folded DV
    Versioned.deleteWhereDv(spark, dir, col("k") === 2L, "k") // v4, mid-stream
    val e2 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      live.processAllAvailable()
    }
    assert(e2.getMessage.contains("deletion-vector") ||
      Option(e2.getCause).exists(_.getMessage.contains("deletion-vector")))
    // a materialized snapshot (compact) is a CHANGE commit: skipped only
    // under ignoreChanges
    Versioned.compactDv(spark, dir) // v5 (materialized)
    Versioned.appendRows(Seq((5L, "e")).toDF("k", "s"), dir) // v6
    val chg = spark.readStream.format("graft.versioned")
      .option("startingVersion", "0")
      .option("ignoreDeletes", "true").option("ignoreChanges", "true")
      .load(dir)
      .writeStream.outputMode("append").format("memory")
      .queryName("vsrc_chg").start()
    chg.processAllAvailable()
    // v0 data + v1/v3/v6 deltas; v2/v4 (DV) and v5 (snapshot) skipped
    assert(spark.table("vsrc_chg").collect().map(_.getLong(0)).toSet
      === Set(1L, 2L, 3L, 4L, 5L))
    chg.stop()
  }
}

package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Event, Session, SessionState}

class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  test("streaming windowed counts equal the batch tumbling-window query") {
    val stream = EventStreams.readEventStream(spark, sf)
    val q = EventStreams.windowedCounts(stream)
      .writeStream.format("memory").queryName("win")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("win")
    val batch = operators.Relational.qTumblingWindow(spark, sf)
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("streaming windowed user estimate equals the batch KMV sketch per window") {
    import org.apache.spark.sql.functions._
    val stream = EventStreams.readEventStream(spark, sf)
    val q = EventStreams.windowedUserEstimate(stream)
      .writeStream.format("memory").queryName("userest")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("userest")
    graft.plans.GraftFunctions.register(spark)
    val uh = graft.functions.PortableHash.portableHash(col("user_id"))
    val batch = sources.Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(graft.functions.Sketches.kminBy(uh, uh, 64).as("kmv"))
      .select(col("window.start").as("hour_start"),
        graft.functions.Sketches.kmvEstimate(col("kmv"), 64).as("est_users"))
    assert(streamed.count() == batch.count() && streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    // estimates are sane: never more than 64x off the exact count
    val exact = sources.Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
      .select(col("window.start").as("hour_start"), col("exact_users"))
    val joined = streamed.join(exact, "hour_start").collect()
    joined.foreach { r =>
      val (est, ex) = (r.getLong(1), r.getLong(2))
      assert(est > 0 && math.abs(est - ex).toDouble / ex < 0.5,
        s"window ${r.get(0)}: est $est vs exact $ex")
    }
  }

  test("streaming value anomalies equal the batch screen; stateless plan") {
    val batch = sources.Tables.events(spark, sf)
    val calibration = EventStreams.calibrateValues(batch)
    val minZ = 2.0
    val expected = EventStreams.valueAnomalies(batch, calibration, minZ)
    val stream = EventStreams.readEventStream(spark, sf)
    val q = EventStreams.valueAnomalies(stream, calibration, minZ)
      .writeStream.format("memory").queryName("anomalies")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("anomalies")
    assert(got.count() > 0, "calibration flagged nothing at z >= 2")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    // flagged set is a strict subset (the screen filters, never invents)
    assert(got.count() < batch.count())
  }

  test("value anomalies: an uncalibrated event type is emitted with null z") {
    import org.apache.spark.sql.functions._
    val batch = sources.Tables.events(spark, sf)
    // calibrate WITHOUT 'view' — a genuinely novel type at screen time
    val calibration = EventStreams.calibrateValues(
      batch.filter(col("event_type") =!= "view"))
    val got = EventStreams.valueAnomalies(batch, calibration, 3.0)
    val unknown = got.filter(col("event_type") === "view")
    // admit-unknown-and-mark: every novel-type event passes, z = null
    assert(unknown.count() ==
      batch.filter(col("event_type") === "view").count())
    assert(unknown.filter(col("z").isNotNull).count() == 0)
    // calibrated types still screen on |z| with a concrete score
    assert(got.filter(col("event_type") =!= "view" && col("z").isNull).count() == 0)
  }

  test("streaming funnel completions equal the batch funnel, out of order") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ev = sources.Tables.events(spark, sf)
    def firstTs(t: String) =
      min(when(col("event_type") === t, col("ts").cast("long"))).as(t)
    val batchCompleted = ev.groupBy(col("user_id"))
      .agg(firstTs("view"), firstTs("click"), firstTs("purchase"))
      .filter(col("view") < col("click") && col("click") < col("purchase"))
      .select("user_id").collect().map(_.getLong(0)).toSet
    assert(batchCompleted.nonEmpty)
    // feed the same events SHUFFLED and split across two micro-batches:
    // stage minima make arrival order irrelevant to the final set, and
    // emission waits for the watermark to close each user's horizon so
    // the minima are FINAL (no irrevocable emission from partial state)
    val rows = ev.select(col("user_id"), col("event_type"), col("ts").cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val shuffled = new scala.util.Random(5).shuffle(rows.toSeq)
    val (h1, h2) = shuffled.splitAt(shuffled.length / 2)
    // the feed is fully disordered and every user spans the whole data
    // range, so both the allowed lateness and the funnel horizon must
    // cover the span for stream ≡ batch to be the contract under test
    val maxTs = rows.map(_._3).max
    val spanSec = (maxTs - rows.map(_._3).min) / 1000000L + 10
    val ms = MemoryStream[(Long, String, Long)]
    val out = EventStreams.funnelCompletions(
      ms.toDF().toDF("user_id", "event_type", "ts"),
      horizonSec = spanSec, latenessSec = spanSec)
    val q = out.writeStream.format("memory").queryName("funnel")
      .outputMode("append").start()
    try {
      ms.addData(h1: _*); q.processAllAvailable()
      ms.addData(h2: _*); q.processAllAvailable()
      // nothing may be emitted before the watermark closes a horizon
      assert(spark.table("funnel").count() == 0,
        "emitted from partial state before watermark close")
      // advance the watermark past every user's horizon via a sentinel
      // user (two batches: the watermark used by batch N comes from
      // batch N-1); its timeout fires every real user's emission+evict
      val flushTs = maxTs + (spanSec * 2 + 200) * 1000000L
      ms.addData((-1L, "view", flushTs)); q.processAllAvailable()
      ms.addData((-1L, "view", flushTs + 1000000L)); q.processAllAvailable()
      val got = spark.table("funnel").select("user_id")
        .collect().map(_.getLong(0))
      assert(got.length == got.distinct.length, "completion emitted twice")
      assert(got.toSet == batchCompleted)
      // state is EVICTED on emission/timeout: only the sentinel user's
      // state may remain in the store
      val stateRows = q.recentProgress.reverse
        .find(_.stateOperators.nonEmpty)
        .map(_.stateOperators.head.numRowsTotal)
      assert(stateRows.exists(_ <= 1), s"state not evicted: $stateRows rows remain")
    } finally q.stop()
  }

  test("streaming incremental dedup drops reference and in-stream duplicates") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val reference = Seq((100L, "already in the corpus")).toDF("doc_id", "text")
    val ms = MemoryStream[(Long, java.sql.Timestamp, String)]
    val docs = ms.toDF().toDF("doc_id", "ts", "text")
    val kept = graft.streaming.DocStreams.incrementalDedup(
      docs, reference, "doc_id", "text", "ts", "1 hour")
    val q = kept.writeStream.format("memory").queryName("incdedup")
      .outputMode("append").start()
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000)
    try {
      ms.addData(
        (1L, t(3600), "already in the corpus"),   // exact ref duplicate → drop
        (2L, t(3601), "a brand new document"),    // fresh → keep
        (3L, t(3602), "a brand new document"))    // in-stream duplicate → drop
      q.processAllAvailable()
      ms.addData((4L, t(3700), "another fresh one")) // fresh → keep
      q.processAllAvailable()
      val ids = spark.table("incdedup").select("doc_id").as[Long].collect().toSet
      assert(ids == Set(2L, 4L), s"got $ids")
    } finally q.stop()
  }

  test("streaming line-clean admission: index lines drop, in-doc dups drop, appends picked up") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_linestream").toString
    val ref = Seq((100L, "indexed boilerplate\nmore chrome")).toDF("doc_id", "text")
    graft.operators.Dedup.buildLineIndex(ref, "doc_id", "text", dir)
    val ms = MemoryStream[(Long, java.sql.Timestamp, String)]
    val docs = ms.toDF().toDF("doc_id", "ts", "text")
    val cleaned = graft.streaming.DocStreams.lineCleanAdmission(
      docs, dir, "doc_id", "text", "ts", watermark = "10 seconds")
    val q = cleaned.writeStream.format("memory").queryName("linestream")
      .outputMode("append").start()
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000)
    try {
      ms.addData(
        // fresh + indexed + in-doc duplicate of the fresh line
        (1L, t(100), "fresh alpha\nindexed boilerplate\nfresh alpha\nfresh beta"),
        // every line indexed → not admitted at all
        (2L, t(101), "indexed boilerplate\nmore chrome"))
      q.processAllAvailable()
      ms.addData((9L, t(500), "watermark pusher")) // flush the first window
      q.processAllAvailable()
      val rows = spark.table("linestream")
        .select("doc_id", "n_lines", "n_kept", "clean_text")
        .as[(Long, Int, Int, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(rows(1L) == (4, 2, "fresh alpha\nfresh beta"), rows.toString)
      assert(!rows.contains(2L), s"fully-indexed doc admitted: $rows")
      // batch parity on the admitted doc: same survivors as the batch op
      val batchRow = graft.operators.Dedup.lineDedupIndexed(
        Seq((1L, "fresh alpha\nindexed boilerplate\nfresh alpha\nfresh beta"))
          .toDF("doc_id", "text"), dir, "doc_id", "text")
        .collect().map(r => (r.getInt(1), r.getInt(2), r.getString(3))).head
      assert(batchRow == (4, 2, "fresh alpha\nfresh beta"))
      // append the admitted lines; the static file listing is pinned
      // at query start, so the append is visible from the next stream
      // (re)start — the periodically-restarted-admission pattern
      graft.operators.Dedup.appendToLineIndex(
        Seq((1L, "fresh alpha\nfresh beta")).toDF("doc_id", "text"),
        "doc_id", "text", dir)
      q.stop()
      val q2 = graft.streaming.DocStreams.lineCleanAdmission(
          docs, dir, "doc_id", "text", "ts", watermark = "10 seconds")
        .writeStream.format("memory").queryName("linestream2")
        .outputMode("append").start()
      try {
        ms.addData((3L, t(600), "fresh alpha\nnovel gamma"))
        q2.processAllAvailable()
        ms.addData((9L, t(9999), "watermark pusher two"))
        q2.processAllAvailable()
        val r3 = spark.table("linestream2").filter(col("doc_id") === 3L)
          .select("n_lines", "n_kept", "clean_text")
          .as[(Int, Int, String)].collect().head
        assert(r3 == (2, 1, "novel gamma"), r3.toString)
      } finally q2.stop()
    } finally q.stop()
  }

  test("streaming token-budget admission carries state across batches per source") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, String)]
    val docs = ms.toDF().toDF("doc_id", "source", "text")
    // budget 10: each doc below is 6 tokens
    val admitted = graft.streaming.DocStreams
      .tokenBudgetAdmission(docs, "doc_id", "text", "source", 10L)
    val q = admitted.writeStream.format("memory").queryName("tba")
      .outputMode("append").start()
    try {
      val six = "one two three four five six"
      ms.addData((1L, "a", six), (2L, "a", six), (3L, "b", six))
      q.processAllAvailable()
      // a: doc1 admitted (0<10), doc2 admitted (6<10, overshoot to 12)
      // b: doc3 admitted (0<10)
      ms.addData((4L, "a", six), (5L, "b", six))
      q.processAllAvailable()
      // a is over budget (12 >= 10) → doc4 rejected; b admits doc5 (6<10)
      val ids = spark.table("tba").select("doc_id").as[Long].collect().toSet
      assert(ids == Set(1L, 2L, 3L, 5L), s"got $ids")
      val totals = spark.table("tba").groupBy("source")
        .agg(org.apache.spark.sql.functions.sum("n_tokens").as("t"))
        .as[(String, Long)].collect().toMap
      assert(totals == Map("a" -> 12L, "b" -> 12L))
    } finally q.stop()
  }

  test("streaming windowed term counts equal batch; trending top-k matches rank window") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, java.sql.Timestamp, String)]
    val docs = ms.toDF().toDF("doc_id", "ts", "text")
    val counts = graft.streaming.DocStreams.windowedTermCounts(
      docs, "text", "ts", "1 hour", "1 hour")
    val q = counts.writeStream.format("memory").queryName("trending")
      .outputMode("append").start()
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val batch = Seq(
      (1L, t(100), "spark spark flink"),
      (2L, t(200), "spark beam"),
      (3L, t(3700), "flink flink flink beam"))
    try {
      ms.addData(batch: _*)
      // advance the watermark far enough to close both windows
      ms.addData((9L, t(20000), "sentinel"))
      q.processAllAvailable()
      val streamed = spark.table("trending").select("w_start", "token", "cnt")
      val batchCounts = batch.toDF("doc_id", "ts", "text")
        .select(col("ts"), explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
        .groupBy(window(col("ts"), "1 hour"), col("token"))
        .count()
        .select(col("window.start").as("w_start"), col("token"), col("count").as("cnt"))
      assert(streamed.exceptAll(batchCounts).isEmpty &&
        batchCounts.exceptAll(streamed).isEmpty)
      // top-k cut through TopKPerKey == rank-window formulation
      def asSet(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      val topk = graft.streaming.DocStreams.trendingTopK(streamed, 2)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("w_start").orderBy(col("cnt").desc, col("token"))
      val ref = streamed.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2).select("w_start", "token", "cnt")
      assert(asSet(topk) == asSet(ref))
      assert(topk.groupBy("w_start").count().filter(col("count") > 2).count() == 0)
    } finally q.stop()
  }

  test("streaming count-min cells equal the batch sketch per window") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, java.sql.Timestamp, String)]
    val docs = ms.toDF().toDF("doc_id", "ts", "text")
    val cells = graft.streaming.DocStreams.streamingCellCounts(
      docs, "text", "ts", d = 2, w = 64, "1 hour", "1 hour")
    val q = cells.writeStream.format("memory").queryName("cms_cells")
      .outputMode("append").start()
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val batch = Seq((1L, t(100), "spark spark flink"), (2L, t(200), "spark beam"))
    try {
      ms.addData(batch: _*)
      ms.addData((9L, t(20000), "sentinel"))
      q.processAllAvailable()
      val streamed = spark.table("cms_cells")
        .filter(col("w_start") === t(0)).select("r", "cell", "c")
      val batchCells = batch.toDF("doc_id", "ts", "text")
        .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
        .select(graft.operators.Curation.cmsCellExpr(col("token"), 2, 64).as("rc"))
        .groupBy(col("rc.r").as("r"), col("rc.cell").as("cell"))
        .agg(count(lit(1)).as("c"))
      assert(streamed.exceptAll(batchCells).isEmpty &&
        batchCells.exceptAll(streamed).isEmpty)
    } finally q.stop()
  }

  test("streaming embedding classification equals the batch k-means assignment") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val emb = sources.Tables.embeddings(spark, sf)
    val centroids = graft.operators.Similarity
      .kmeansCentroids(emb, "vec_id", "embedding", k = 4, iters = 1)
    val batchAssign = emb.select(col("vec_id"),
        graft.operators.Similarity.kmeansAssignExpr(col("embedding"), centroids)
          .as("cluster_id"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val sample = emb.limit(20)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val ms = MemoryStream[(Long, Seq[Float])]
    val stream = ms.toDF().toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val out = graft.streaming.DocStreams.classifyEmbeddings(stream, "embedding", centroids)
    val q = out.writeStream.format("memory").queryName("classify")
      .outputMode("append").start()
    try {
      ms.addData(sample.toSeq: _*)
      q.processAllAvailable()
      val got = spark.table("classify").select("vec_id", "cluster_id")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got.size == sample.length)
      got.foreach { case (id, cid) => assert(cid == batchAssign(id), s"vec $id") }
    } finally q.stop()
  }

  test("streaming semantic-decontamination gate equals the batch clean slice") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val emb = sources.Tables.embeddings(spark, sf)
    val isEval = col("vec_id") % 50 === 7
    val evalPath = "target/test_semantic_eval"
    emb.filter(isEval).select("vec_id", "embedding")
      .write.mode("overwrite").parquet(evalPath)
    val train = emb.filter(!isEval)
    // threshold 0.3 actually rejects vectors at driver SFs (the
    // dedup_embedding pair threshold) — the gate must do real work
    val gate = graft.streaming.DocStreams.semanticAdmission(
      train, "vec_id", "embedding", evalPath, minCos = 0.3)
    val ref = graft.operators.Similarity.decontaminateSemantic(
        train, emb.filter(isEval), "vec_id", "embedding", minCos = 0.3)
      .filter(!col("contaminated"))
      .select(col("vec_id"), col("max_eval_cos"), col("nearest_eval_id"))
    assert(gate.count() > 0 && gate.count() < train.count(),
      "gate must admit some and reject some at this threshold")
    assert(gate.exceptAll(ref).isEmpty && ref.exceptAll(gate).isEmpty,
      "kernel gate diverged from the batch operator (cosine/round/tie rule)")
    // stream replay: stateless map-side kernel → append-mode identical
    val ms = MemoryStream[(Long, Seq[Float])]
    val stream = ms.toDF().toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val q = graft.streaming.DocStreams.semanticAdmission(
        stream, "vec_id", "embedding", evalPath, minCos = 0.3)
      .writeStream.format("memory").queryName("semadm")
      .outputMode("append").start()
    try {
      ms.addData(train.select("vec_id", "embedding")
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("semadm")
      assert(streamed.exceptAll(gate).isEmpty && gate.exceptAll(streamed).isEmpty)
    } finally q.stop()
  }

  test("semantic gate survives a zero vector (NaN cosine) and still matches batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val emb = sources.Tables.embeddings(spark, sf)
    val evalPath = "target/test_semantic_eval_nan"
    emb.filter(col("vec_id") % 50 === 7).select("vec_id", "embedding")
      .write.mode("overwrite").parquet(evalPath)
    // plant a ZERO train vector: its cosine to every eval is NaN —
    // the kernel must not throw (BigDecimal.valueOf(NaN) would) and
    // must agree with the batch operator's NaN ordering
    val zero = Seq((999998L, Array.fill(64)(0f).toSeq))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val train = emb.filter(col("vec_id") % 50 =!= 7)
      .select("vec_id", "embedding").unionAll(zero)
    val gate = graft.streaming.DocStreams.semanticAdmission(
      train, "vec_id", "embedding", evalPath, minCos = 0.3)
    val ref = graft.operators.Similarity.decontaminateSemantic(
        train, spark.read.parquet(evalPath), "vec_id", "embedding", minCos = 0.3)
      .filter(!col("contaminated"))
      .select(col("vec_id"), col("max_eval_cos"), col("nearest_eval_id"))
    assert(gate.filter(col("vec_id") === 999998L).count() == 0,
      "NaN max-cos must drop the zero vector (NaN sorts greatest, like batch)")
    assert(gate.exceptAll(ref).isEmpty && ref.exceptAll(gate).isEmpty,
      "gate diverged from batch in the presence of a NaN cosine")
  }

  test("stateful sessionize emits closed sessions; watermark flushes idle state") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Event]
    val watermarked = ms.toDS()
      .withColumn("event_time", timestamp_micros(col("ts")))
      .withWatermark("event_time", "10 minutes")
      .as[Event]
    val sessions = EventStreams.sessionize(watermarked)
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    val M = 1000000L // micros
    val B = 3600L     // base offset: epoch-0 events would equal the
                      // initial watermark and be dropped as late
    try {
      // user 1: two events 10 min apart (one session), then a 2h gap event
      ms.addData(
        Event(1, B * M, 1, "click", 1.0),
        Event(2, (B + 600) * M, 1, "click", 1.0))
      q.processAllAvailable()
      assert(spark.table("sess").count() == 0) // session still open
      ms.addData(Event(3, (B + 7800) * M, 1, "click", 1.0)) // 2h after last → closes it
      q.processAllAvailable()
      val closed = spark.table("sess").as[Session].collect()
      assert(closed.toSeq == Seq(Session(1, B * M, 2, 600.0)))
      // advance the watermark far past user 1's open session via user 2:
      // its event-time timeout (last + 30 min) fires and flushes state
      ms.addData(Event(4, (B + 21600) * M, 2, "click", 1.0))
      q.processAllAvailable()
      ms.addData(Event(5, (B + 22200) * M, 2, "click", 1.0))
      q.processAllAvailable()
      val flushed = spark.table("sess").as[Session].collect().toSet
      assert(flushed.contains(Session(1, (B + 7800) * M, 1, 0.0)),
        s"expected watermark-flushed session, got $flushed")
    } finally q.stop()
  }

  test("sessionize survives LATE events delivered by out-of-order FILE batches") {
    // The file source orders files by MODIFICATION time; a file whose
    // events lie entirely below the watermark still DELIVERS them to
    // flatMapGroupsWithState (the late filter uses the lagged
    // watermark), and Spark throws on a timeout timestamp at or below
    // the eviction watermark — pre-clamp this killed the streaming
    // soak's time-shuffled batches with IllegalArgumentException; the
    // operator now clamps the timeout to watermark+1. This repro uses
    // the REAL file source (MemoryStream batches don't penetrate the
    // late filter the same way): file A (earliest mtime) carries a
    // far-future event, file B (later mtime) carries events a day
    // older, so B's whole session is below A's watermark.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val M = 1000000L
    val B = 3600L
    val base = java.nio.file.Files.createTempDirectory("graft_late_files")
    val dir = s"$base/events"
    new java.io.File(dir).mkdirs()
    def writeFile(name: String, mtime: Long, rows: Event*): Unit = {
      val tmp = s"$base/tmp_$name"
      rows.toDS().coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(dir, s"$name.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(mtime)
    }
    val mt = System.currentTimeMillis() - 60000
    writeFile("a", mt, Event(1, (B + 86400) * M, 9, "click", 1.0))
    writeFile("b", mt + 1000,
      Event(2, B * M, 7, "click", 1.0),
      Event(3, (B + 60) * M, 7, "click", 1.0))
    writeFile("c", mt + 2000, Event(4, (B + 86460) * M, 9, "click", 1.0))
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Event]].schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
      .withColumn("event_time", timestamp_micros(col("ts")))
      .withWatermark("event_time", "10 minutes")
      .as[Event]
    val q = EventStreams.sessionize(stream)
      .writeStream.format("memory").queryName("sess_late")
      .outputMode("append").start()
    // pre-fix: the file-B batch dies with "Timeout timestamp cannot
    // be earlier than the current watermark" and processAllAvailable
    // rethrows; with the engine-faithful late drop the query drains
    // all three files cleanly AND emits nothing — u7's session is
    // built entirely from below-watermark rows an in-order run would
    // never have seen (dropped, not emitted), and u9's session (two
    // events 60 s apart) stays open at end-of-stream.
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("sess_late").as[Session].collect().toSet
    assert(got.isEmpty, s"purely-late session leaked: $got")
  }

  test("streaming politeness: per-host slot counters persist across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, Double)]
    val urls = ms.toDF().toDF("url_id", "host", "delay")
    val q = graft.streaming.DocStreams
      .politenessStream(urls, "url_id", "host", "delay")
      .writeStream.format("memory").queryName("polite")
      .outputMode("append").start()
    try {
      ms.addData((3L, "a.com", 2.0), (1L, "a.com", 2.0), (2L, "b.com", 5.0))
      q.processAllAvailable()
      ms.addData((4L, "a.com", 2.0), (5L, "b.com", 5.0)) // counters continue
      q.processAllAvailable()
      val got = spark.table("polite")
        .as[(Long, String, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got == Map(
        1L -> (("a.com", 0L, 0.0)),  // within-batch order is by id, not arrival
        3L -> (("a.com", 1L, 2.0)),
        4L -> (("a.com", 2L, 4.0)),  // batch 2 continues host a's counter
        2L -> (("b.com", 0L, 0.0)),
        5L -> (("b.com", 1L, 5.0))))
    } finally q.stop()
  }

  test("streaming fetch dedup equals batch revisitClassify on the shared index") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_revisit").toString
    def snap(rows: Seq[(String, String, String, String)]) =
      rows.toDF("target_uri", "warc_type", "warc_date", "block")
    val prev = snap(Seq(
      ("u/1", "response", "2026-01-01T00:00:00Z", "alpha"),
      ("u/1", "response", "2026-01-01T09:00:00Z", "alpha-v2"),
      ("u/2", "response", "2026-01-01T00:00:00Z", "beta"),
      ("u/3", "response", "2026-01-01T00:00:00Z", "gamma")))
    graft.sources.Formats.buildRevisitIndex(prev, dir)
    val curRows = Seq(
      ("u/1", "alpha-v2"),    // == latest prev -> unchanged
      ("u/2", "beta EDITED"), // changed
      ("u/4", "delta"))       // new
    val ms = MemoryStream[(String, String)]
    val cur = ms.toDF().toDF("target_uri", "block")
    val q = graft.streaming.DocStreams
      .fetchDedupStream(cur, "target_uri", "block", dir)
      .writeStream.format("memory").queryName("fetchdedup")
      .outputMode("append").start()
    try {
      ms.addData(curRows(0), curRows(1))
      q.processAllAvailable()
      ms.addData(curRows(2)) // second batch probes the same index
      q.processAllAvailable()
      val got = spark.table("fetchdedup")
        .select("target_uri", "status").as[(String, String)].collect().toMap
      // batch twin minus 'gone' (absence is not a stream event)
      val batch = graft.sources.Formats.revisitClassify(prev,
          snap(curRows.map { case (u, b) => (u, "response", "2026-02-01T00:00:00Z", b) }))
        .filter(org.apache.spark.sql.functions.col("status") =!= "gone")
        .select("target_uri", "status").as[(String, String)].collect().toMap
      assert(got == batch)
      assert(got == Map("u/1" -> "unchanged", "u/2" -> "changed", "u/4" -> "new"))
    } finally q.stop()
  }

  test("streaming host budget: first-k admission per host persists across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val urls = ms.toDF().toDF("url_id", "host")
    val q = graft.streaming.DocStreams
      .hostBudgetStream(urls, "url_id", "host", k = 2)
      .writeStream.format("memory").queryName("hbudget")
      .outputMode("append").start()
    try {
      ms.addData((3L, "a.com"), (1L, "a.com"), (2L, "b.com"))
      q.processAllAvailable()
      // host a is now full (2 admitted); b has one slot left
      ms.addData((4L, "a.com"), (5L, "b.com"), (6L, "b.com"))
      q.processAllAvailable()
      val got = spark.table("hbudget")
        .as[(Long, String, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == Map(
        1L -> (("a.com", 0L)), // within-batch order is by id
        3L -> (("a.com", 1L)),
        2L -> (("b.com", 0L)),
        5L -> (("b.com", 1L)))) // 4 and 6 suppressed: budgets exhausted
    } finally q.stop()
  }

  test("streaming host budget: keyed state survives a query RESTART from checkpoint") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_hb_ck")
    val (ck, out) = (s"$base/ck", s"$base/out")
    val ms = MemoryStream[(Long, String)]
    def start() = graft.streaming.DocStreams
      .hostBudgetStream(ms.toDF().toDF("url_id", "host"), "url_id", "host", k = 2)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck)
      .outputMode("append").start()
    val q1 = start()
    try {
      ms.addData((1L, "a.com"), (2L, "a.com"), (3L, "b.com"))
      q1.processAllAvailable()
    } finally q1.stop()
    // restart a NEW query from the same checkpoint: host a's budget is
    // already exhausted in recovered state, b has one slot left
    val q2 = start()
    try {
      ms.addData((4L, "a.com"), (5L, "b.com"), (6L, "b.com"))
      q2.processAllAvailable()
      val got = spark.read.parquet(out)
        .as[(Long, String, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == Map(
        1L -> (("a.com", 0L)), 2L -> (("a.com", 1L)),
        3L -> (("b.com", 0L)), 5L -> (("b.com", 1L))),
        s"state did not survive the restart: $got")
    } finally q2.stop()
  }

  // ---- kill-and-restart soaks: every keyed-state op must carry its
  // counters/sessions across >= 3 micro-batches with a query KILL and
  // checkpoint-only recovery between each — state continuity must come
  // from the state store alone, never from JVM memory.

  test("restart soak: politenessStream slot counters continue across 3 killed generations") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_pol_ck")
    val (ck, out) = (s"$base/ck", s"$base/out")
    val ms = MemoryStream[(Long, String, Double)]
    def start() = graft.streaming.DocStreams
      .politenessStream(ms.toDF().toDF("url_id", "host", "delay"),
        "url_id", "host", "delay")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck)
      .outputMode("append").start()
    def gen(data: (Long, String, Double)*): Unit = {
      val q = start()
      try { ms.addData(data: _*); q.processAllAvailable() } finally q.stop()
    }
    gen((1L, "a.com", 2.0), (2L, "b.com", 5.0))
    gen((3L, "a.com", 2.0), (4L, "a.com", 2.0), (5L, "b.com", 5.0))
    gen((6L, "a.com", 2.0), (7L, "b.com", 5.0))
    val got = spark.read.parquet(out)
      .as[(Long, String, Long, Double)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    assert(got == Map(
      1L -> ((0L, 0.0)), 3L -> ((1L, 2.0)), 4L -> ((2L, 4.0)), 6L -> ((3L, 6.0)),
      2L -> ((0L, 0.0)), 5L -> ((1L, 5.0)), 7L -> ((2L, 10.0))),
      s"slot continuity broke across restarts: $got")
  }

  test("restart soak: tokenBudgetAdmission budgets continue across 3 killed generations") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_tba_ck")
    val (ck, out) = (s"$base/ck", s"$base/out")
    val ms = MemoryStream[(Long, String, String)]
    def start() = graft.streaming.DocStreams
      .tokenBudgetAdmission(ms.toDF().toDF("doc_id", "source", "text"),
        "doc_id", "text", "source", 10L)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck)
      .outputMode("append").start()
    def gen(data: (Long, String, String)*): Unit = {
      val q = start()
      try { ms.addData(data: _*); q.processAllAvailable() } finally q.stop()
    }
    val six = "one two three four five six"
    gen((1L, "a", six), (2L, "b", six))           // a: 6, b: 6
    gen((3L, "a", six), (4L, "b", six))           // 6 < 10 -> admit; a,b at 12
    gen((5L, "a", six), (6L, "b", six), (7L, "c", six)) // a,b exhausted; c admits
    val ids = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 3L, 4L, 7L),
      s"budget continuity broke across restarts: $ids")
  }

  test("restart soak: hostBudgetStream admission counts continue across 3 killed generations") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_hb3_ck")
    val (ck, out) = (s"$base/ck", s"$base/out")
    val ms = MemoryStream[(Long, String)]
    def start() = graft.streaming.DocStreams
      .hostBudgetStream(ms.toDF().toDF("url_id", "host"), "url_id", "host", k = 2)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck)
      .outputMode("append").start()
    def gen(data: (Long, String)*): Unit = {
      val q = start()
      try { ms.addData(data: _*); q.processAllAvailable() } finally q.stop()
    }
    gen((1L, "a.com"), (2L, "b.com"))               // a: 1/2, b: 1/2
    gen((3L, "a.com"), (4L, "a.com"), (5L, "b.com")) // a fills at 3, 4 suppressed
    gen((6L, "a.com"), (7L, "b.com"), (8L, "c.com")) // a,b full; c admits
    val got = spark.read.parquet(out)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got == Map(1L -> 0L, 3L -> 1L, 2L -> 0L, 5L -> 1L, 8L -> 0L),
      s"admission-count continuity broke across restarts: $got")
  }

  test("restart soak: sessionize carries an OPEN session across 3 killed generations") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_sess_ck")
    val (ck, out) = (s"$base/ck", s"$base/out")
    val ms = MemoryStream[Event]
    def start() = {
      val watermarked = ms.toDS()
        .withColumn("event_time", timestamp_micros(col("ts")))
        .withWatermark("event_time", "10 minutes")
        .as[Event]
      EventStreams.sessionize(watermarked)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append").start()
    }
    def gen(data: Event*): Unit = {
      val q = start()
      try { ms.addData(data: _*); q.processAllAvailable() } finally q.stop()
    }
    val M = 1000000L
    val B = 3600L
    // one user's session grows across three generations (each event
    // within the 30-min gap of the last), then a far-future event
    // closes it — the recovered state must carry start AND count
    gen(Event(1, B * M, 1, "click", 1.0))
    gen(Event(2, (B + 600) * M, 1, "click", 1.0))
    gen(Event(3, (B + 1200) * M, 1, "click", 1.0),
        Event(4, (B + 7800) * M, 1, "click", 1.0)) // 110 min after e3: closes
    val closed = spark.read.parquet(out).as[Session].collect().toSeq
    assert(closed == Seq(Session(1, B * M, 3, 1200.0)),
      s"session continuity broke across restarts: $closed")
  }

  test("streaming frontier admission: robots deny, seen-index drop, in-stream dedup, restart append") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_frontier").toString
    // already-fetched set: one canonical url (spelling-variant on purpose)
    graft.operators.Html.buildFrontierIndex(
      Seq("HTTPS://www.a.com/old?utm_source=x").toDF("url"), "url", dir)
    val rules = graft.operators.Html.robotsRules(
      Seq(("a.com", "User-agent: *\nDisallow: /private\nAllow: /private/ok\n"))
        .toDF("host", "content"), "host", "content")
    val ms = MemoryStream[(Long, java.sql.Timestamp, String)]
    val urls = ms.toDF().toDF("url_id", "ts", "url")
    def admit() = graft.streaming.DocStreams.frontierAdmission(
      urls, rules, "graftbot", dir, "url_id", "url", "ts",
      watermark = "10 seconds")
    val q = admit().writeStream.format("memory").queryName("frontier")
      .outputMode("append").start()
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000)
    try {
      ms.addData(
        (1L, t(100), "https://a.com/fresh"),          // admitted
        (2L, t(100), "https://a.com/private/x"),      // robots deny
        (3L, t(100), "https://a.com/private/ok/x"),   // longest-match allow
        (4L, t(100), "https://a.com/old"),            // in frontier index
        (5L, t(101), "https://www.a.com/fresh/"),     // same canonical as 1
        (6L, t(101), "https://b.com/norules"))        // no robots.txt → admitted
      q.processAllAvailable()
      val got = spark.table("frontier")
        .select("url_id", "canonical_url").as[(Long, String)].collect().toMap
      assert(got.keySet == Set(1L, 3L, 6L), s"got $got")
      assert(got(1L) == "https://a.com/fresh")
      // fetched batch appended → suppressed from the NEXT query start
      graft.operators.Html.appendToFrontierIndex(
        Seq("https://a.com/fresh").toDF("url"), "url", dir)
      q.stop()
      val q2 = admit().writeStream.format("memory").queryName("frontier2")
        .outputMode("append").start()
      try {
        ms.addData(
          (7L, t(200), "https://a.com/fresh"),  // now in the index → drop
          (8L, t(200), "https://a.com/newer"))  // admitted
        q2.processAllAvailable()
        val ids2 = spark.table("frontier2").select("url_id").as[Long].collect().toSet
        assert(ids2 == Set(8L), s"got $ids2")
      } finally q2.stop()
    } finally q.stop()
  }
}

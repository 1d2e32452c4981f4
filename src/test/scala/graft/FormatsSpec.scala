package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Formats, Tables}

class FormatsSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_$name")
    d.toFile.deleteOnExit()
    s"$d/out"
  }

  test("csv round-trip preserves documents") {
    val docs = Tables.documents(spark, sf)
    val path = tmp("csv")
    Formats.writeCsv(docs, path)
    val back = Formats.readCsv(spark, path, docs.schema)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("json round-trip preserves orders") {
    val orders = Tables.orders(spark, sf)
    val path = tmp("json")
    Formats.writeJson(orders, path)
    val back = Formats.readJson(spark, path, orders.schema)
    assert(back.count() == orders.count())
    assert(back.exceptAll(orders).isEmpty && orders.exceptAll(back).isEmpty)
  }

  test("text round-trip preserves lines") {
    val docs = Tables.documents(spark, sf)
    val path = tmp("text")
    Formats.writeText(docs, "text", path)
    val back = Formats.readText(spark, path)
    assert(back.count() == docs.count())
  }

  test("orc round-trip preserves lineitem") {
    val li = Tables.lineitem(spark, sf)
    val path = tmp("orc")
    Formats.writeOrc(li, path)
    val back = Formats.readOrc(spark, path)
    assert(back.count() == li.count())
    assert(back.exceptAll(li).isEmpty && li.exceptAll(back).isEmpty)
  }

  test("bloom-filtered parquet carries the filter and point lookups stay exact") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
      .withColumn("fp", md5(col("text").cast("binary")))
    val path = tmp("bloom")
    Formats.writeParquetBloom(docs, path, "fp", ndv = 10000L)
    // the written footer must record a bloom filter offset for fp
    val file = new java.io.File(path).listFiles()
      .find(f => f.getName.endsWith(".parquet")).get
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file.getAbsolutePath),
      spark.sparkContext.hadoopConfiguration)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val cols = reader.getFooter.getBlocks.get(0).getColumns
      val fpCol = (0 until cols.size).map(cols.get)
        .find(_.getPath.toDotString == "fp").get
      assert(fpCol.getBloomFilterOffset > 0, "no bloom filter written for fp")
    } finally reader.close()
    // and a point membership probe over the layout is exact
    val probe = docs.select(col("fp")).limit(1).collect()(0).getString(0)
    val hit = Formats.readParquet(spark, path).filter(col("fp") === probe)
    assert(hit.count() == docs.filter(col("fp") === probe).count())
    assert(hit.queryExecution.executedPlan.toString.contains("PushedFilters"))
  }

  test("readRecords: delimiter runs and file edges drop, content ids stable") {
    val path = tmp("recs") + ".txt"
    // leading delimiter, a delimiter run, internal single newlines
    // (NOT record breaks), trailing delimiter
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      "\n\nalpha line1\nalpha line2\n\n\n\nbeta\n\ngamma g2\n\n")
    val got = Formats.readRecords(spark, path)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(got.values.toSet ==
      Set("alpha line1\nalpha line2", "beta", "gamma g2"))
    // ids are md5(content) — recomputable, replay-idempotent
    got.foreach { case (id, text) =>
      val want = java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      assert(id == want, s"record_id not content-addressed for ${text.take(20)}")
    }
  }

  test("readRecords: records spanning scan-split boundaries stay whole") {
    import org.apache.spark.sql.functions._
    val path = tmp("bigrecs") + ".txt"
    // ~4 MB file of 2000 records; 64 KB splits force record spans
    val recs = (0 until 2000).map(i => s"record $i " + ("x" * 2000))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      recs.mkString("\n\n"))
    val before = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
      val split = Formats.readRecords(spark, path)
      assert(split.rdd.getNumPartitions > 8,
        "fixture did not force multiple scan splits")
      assert(split.count() == 2000)
      assert(split.select(sum(length(col("text")))).first().getLong(0) ==
        recs.map(_.length).sum, "a split boundary corrupted a record")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", before)
  }

  private def warcRecord(i: Int, block: String,
                         declaredLen: Option[Int] = None): String =
    "WARC/1.0\r\n" +
      s"WARC-Record-ID: <urn:uuid:rec-$i>\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Date: 2026-01-01T00:00:00Z\r\n" +
      s"WARC-Target-URI: https://example.com/$i\r\n" +
      "Content-Type: text/plain\r\n" +
      s"Content-Length: ${declaredLen.getOrElse(block.getBytes("UTF-8").length)}\r\n" +
      s"\r\n$block\r\n\r\n"

  test("readWarc: header grammar — case-insensitive names, missing headers, length check") {
    import org.apache.spark.sql.Row
    val path = tmp("warc") + ".warc"
    val rec0 = warcRecord(0, "hello world")
    // lowercased header names must still bind (spec: names case-insensitive)
    val rec1 = rec0.replace("WARC-Type:", "warc-type:")
      .replace("Content-Length:", "content-length:")
      .replace("<urn:uuid:rec-0>", "<urn:uuid:rec-1>")
    // a record with no Target-URI/Content-Length (warcinfo shape):
    // empty string / null length, length_ok null-safe false
    val rec2 = "WARC/1.0\r\nWARC-Record-ID: <urn:uuid:rec-2>\r\n" +
      "WARC-Type: warcinfo\r\nWARC-Date: 2026-01-01T00:00:01Z\r\n" +
      "\r\nsoftware: graft\r\n\r\n"
    // declared length deliberately wrong → length_ok false
    val rec3 = warcRecord(3, "four byte blck", declaredLen = Some(999))
    // multi-line block containing a blank \n\n line (NOT \r\n\r\n):
    // must stay one record with the block intact
    val rec4 = warcRecord(4, "para one\n\npara two")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      rec0 + rec1 + rec2 + rec3 + rec4)
    val got = Formats.readWarc(spark, path)
      .orderBy("record_id").collect().toSeq
    assert(got.size == 5)
    val byId = got.map(r => r.getString(0) -> r).toMap
    assert(byId("<urn:uuid:rec-0>").getString(1) == "response")
    assert(byId("<urn:uuid:rec-0>").getBoolean(7))
    assert(byId("<urn:uuid:rec-0>").getString(6) == "hello world")
    assert(byId("<urn:uuid:rec-1>").getString(1) == "response",
      "lowercased warc-type header did not bind")
    assert(byId("<urn:uuid:rec-1>").getLong(5) == 11L,
      "lowercased content-length header did not bind")
    val info = byId("<urn:uuid:rec-2>")
    assert(info.getString(3) == "" && info.isNullAt(5),
      "missing headers must yield empty string / null length")
    assert(info.getString(6) == "software: graft")
    assert(!byId("<urn:uuid:rec-3>").getBoolean(7),
      "wrong declared Content-Length must fail length_ok")
    assert(byId("<urn:uuid:rec-4>").getString(6) == "para one\n\npara two",
      "a bare \\n\\n inside a block must not split the record")
  }

  test("httpParse: status/headers/body split, non-HTTP blocks admitted and marked") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ok = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Length: 11\r\n\r\nhello world"
    val notFound = "HTTP/1.0 404 Not Found\r\ncontent-length: 3\r\n\r\nnope" // wrong length
    val multi = "HTTP/1.1 200 OK\r\nContent-Length: 16\r\n\r\nbody\r\n\r\nwith gap" // \r\n\r\n INSIDE body
    val raw = "just bytes, not an http response"
    val out = Formats.httpParse(
      Seq((1L, ok), (2L, notFound), (3L, multi), (4L, raw)).toDF("id", "block"),
      "block").collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Int]("status") == 200)
    assert(out(1L).getAs[String]("http_content_type") == "text/html")
    assert(out(1L).getAs[String]("body") == "hello world")
    assert(out(1L).getAs[Boolean]("body_ok"))
    assert(out(2L).getAs[Int]("status") == 404)
    assert(out(2L).getAs[Long]("http_content_length") == 3L,
      "lowercased content-length did not bind")
    assert(!out(2L).getAs[Boolean]("body_ok"), "wrong declared length must fail body_ok")
    assert(out(3L).getAs[String]("body") == "body\r\n\r\nwith gap",
      "body's own blank line must not truncate it")
    assert(out(3L).getAs[Boolean]("body_ok"))
    assert(out(4L).isNullAt(out(4L).fieldIndex("status")),
      "non-HTTP block must yield NULL status, not drop or throw")
    assert(out(4L).getAs[String]("body") == raw)
  }

  test("readWarcGz: per-record gzip members decode to the plain reader's records") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_warcgz")
    val recs = (0 until 7).map(i => warcRecord(i, s"payload $i " + ("z" * 50)))
    // plain twin
    val plain = dir.resolve("corpus.warc")
    java.nio.file.Files.writeString(plain, recs.mkString(""))
    // one gzip member per record, two files (file-level parallelism)
    Seq(0 until 4, 4 until 7).zipWithIndex.foreach { case (range, f) =>
      val fos = new java.io.FileOutputStream(dir.resolve(s"seg$f.warc.gz").toFile)
      try range.foreach { i =>
        val g = new java.util.zip.GZIPOutputStream(fos)
        g.write(recs(i).getBytes("UTF-8"))
        g.finish()
      } finally fos.close()
    }
    val viaGz = Formats.readWarcGz(spark, s"$dir/*.warc.gz")
    val viaPlain = Formats.readWarc(spark, plain.toString)
    assert(viaGz.count() == 7)
    assert(viaGz.exceptAll(viaPlain).isEmpty && viaPlain.exceptAll(viaGz).isEmpty,
      "gz records differ from the plain reader's")
  }

  test("splitWarcRecords: streams record-by-record — chunk-spanning boundaries, " +
      "records larger than the chunk, no whole-payload buffer") {
    // records sized around and far past the chunk seam; boundary bytes
    // will straddle chunk edges at many offsets
    val recs = (0 until 40).map(i => warcRecord(i, s"r$i " + ("y" * (i * 7 + 1))))
    val whole = recs.mkString("")
    // ground truth: the whole-string split the old reader computed
    val want = whole.split("\r\n\r\nWARC/1\\.0\r\n").toSeq.filter(_.nonEmpty)
    for (chunk <- Seq(1, 7, 64, 4096)) {
      val got = Formats.splitWarcRecords(
        new java.io.ByteArrayInputStream(whole.getBytes("UTF-8")), chunk).toSeq
      assert(got == want, s"chunkSize=$chunk diverged from whole-string split")
    }
    // a single record much larger than the chunk must still come out whole
    val big = warcRecord(0, "B" * 300000) + warcRecord(1, "small")
    val gotBig = Formats.splitWarcRecords(
      new java.io.ByteArrayInputStream(big.getBytes("UTF-8")), 1024).toSeq
    assert(gotBig.size == 2 && gotBig.head.contains("B" * 300000))
    // empty stream yields no records
    assert(Formats.splitWarcRecords(
      new java.io.ByteArrayInputStream(Array.emptyByteArray)).isEmpty)
  }

  test("revisitClassify: new/unchanged/changed/gone; latest capture represents a uri; " +
      "non-response records ignored") {
    import spark.implicits._
    def snap(rows: Seq[(String, String, String, String)]) =
      rows.toDF("target_uri", "warc_type", "warc_date", "block")
    val prev = snap(Seq(
      ("u/1", "response", "2026-01-01T00:00:00Z", "alpha"),
      ("u/1", "response", "2026-01-01T09:00:00Z", "alpha-v2"), // latest wins
      ("u/2", "response", "2026-01-01T00:00:00Z", "beta"),
      ("u/3", "response", "2026-01-01T00:00:00Z", "gamma"),
      ("u/9", "request",  "2026-01-01T00:00:00Z", "not a payload")))
    val cur = snap(Seq(
      ("u/1", "response", "2026-02-01T00:00:00Z", "alpha-v2"),  // == latest prev
      ("u/2", "response", "2026-02-01T00:00:00Z", "beta EDITED"),
      ("u/4", "response", "2026-02-01T00:00:00Z", "delta")))
    val got = Formats.revisitClassify(prev, cur).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("u/1" -> "unchanged", "u/2" -> "changed",
      "u/3" -> "gone", "u/4" -> "new"))
    // blocks must not cross the join: each side reduces to uri+digest
    val plan = Formats.revisitClassify(prev, cur)
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(!exchanges.exists(_.contains("block#")),
      s"payload crossed a shuffle:\n${exchanges.mkString("\n")}")
  }

  test("readWarc: records spanning scan-split boundaries stay whole") {
    import org.apache.spark.sql.functions._
    val path = tmp("bigwarc") + ".warc"
    val blocks = (0 until 2000).map(i => s"record $i " + ("x" * 2000))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      blocks.zipWithIndex.map { case (b, i) => warcRecord(i, b) }.mkString(""))
    val before = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
      val split = Formats.readWarc(spark, path)
      assert(split.rdd.getNumPartitions > 8,
        "fixture did not force multiple scan splits")
      assert(split.count() == 2000)
      assert(split.filter(!col("length_ok")).count() == 0,
        "a split boundary corrupted a payload")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", before)
  }
}

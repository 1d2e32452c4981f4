package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Multimodal, Similarity}

class PipelineOpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val toy = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),          // exact dup of 1
    (3L, "the quick brown fox jumps over the sleepy dog"),        // near dup of 1
    (4L, "spark shuffles partitions across the cluster nodes"),
    (5L, "completely different content about databases and queries tonight")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts under one survivor") {
    val r = Dedup.exact(toy, "doc_id", "text").collect()
    assert(r.length == 4)
    val dupRow = r.find(_.getLong(2) == 2L).get
    assert(dupRow.getLong(1) == 1L) // survivor = min id
  }

  test("minhash LSH finds exact and near duplicates with high est_jaccard") {
    val pairs = Dedup.minhashLsh(toy, "doc_id", "text").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((1L, 2L)) == 1.0)           // identical docs → identical sigs
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L))) // near dup caught
    assert(pairs.values.forall(j => j >= 0.0 && j <= 1.0))
  }

  test("simhash of identical docs collides at hamming 0") {
    val pairs = Dedup.simhashPairs(toy, "doc_id", "text", maxHamming = 10).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs((1L, 2L)) == 0)
  }

  test("simhash canonical (HOF) definition equals the aggregate form") {
    val hof = toy.select(col("doc_id"), Dedup.simhash(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agg = Dedup.simhashByDoc(toy, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hof == agg)
  }

  test("dedup clusters merge transitively (A~B, B~C => one cluster)") {
    // B shares most text with A and with C, but A and C differ more:
    // the chain must still collapse into a single min-labeled cluster
    val chain = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (9L, "totally different content about spark shuffles and joins here")
    ).toDF("doc_id", "text")
    val clusters = Dedup.dedupClusters(chain, "doc_id", "text", minEst = 0.4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters(1L) == 1L && clusters(2L) == 1L)
    assert(clusters.get(3L).forall(_ == 1L)) // if LSH caught 2~3, label must be 1
    assert(!clusters.contains(9L)) // singletons don't appear in the pair graph
  }

  test("ngram jaccard is 1.0 for identical docs (sampleMod=1)") {
    val r = Dedup.ngramJaccard(toy, "doc_id", "text", sampleMod = 1, minJaccard = 0.1)
      .collect().map(r => ((r.getLong(1), r.getLong(0)), r.getDouble(2))).toMap
    // columns: doc_b, doc_a, jaccard — joined keys come first
    assert(r.values.max == 1.0)
  }

  test("containment flags a doc embedded in a larger one where jaccard stays low") {
    import spark.implicits._
    val quote = "alpha beta gamma delta epsilon zeta"
    val container = s"intro words here $quote and then a very long tail " +
      (1 to 60).map(i => s"filler$i").mkString(" ")
    val docs = Seq((2L, quote), (4L, container)).toDF("doc_id", "text")
    val cont = Dedup.ngramContainment(docs, "doc_id", "text",
        sampleMod = 1, minContainment = 0.9)
      .collect()
    assert(cont.length == 1 && cont(0).getDouble(2) == 1.0) // fully contained
    val jac = Dedup.ngramJaccard(docs, "doc_id", "text",
        sampleMod = 1, minJaccard = 0.0)
      .collect()
    assert(jac.forall(_.getDouble(2) < 0.2)) // symmetric jaccard dilutes it
  }

  test("knn_lsh returns valid ranks and scores, subset of bucket-mates") {
    val lsh = SparkEntry.queries("knn_lsh")(spark, sf).collect()
    assert(lsh.nonEmpty)
    assert(lsh.forall(r => r.getInt(3) <= 5))
    assert(lsh.forall(r => math.abs(r.getDouble(2)) <= 1.0))
  }

  test("knn_lsh results agree with brute-force scores where they overlap") {
    val brute = SparkEntry.queries("knn_bruteforce")(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val lsh = SparkEntry.queries("knn_lsh")(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    val overlap = lsh.filter(p => brute.contains(p._1))
    assert(overlap.forall { case (k, s) => brute(k) == s })
    // multi-table union recall floor (measured ~0.4 on this data)
    val recall = overlap.size.toDouble / brute.size
    info(f"LSH recall@5 = $recall%.2f")
    assert(recall >= 0.2)
  }

  test("multimodal ingest carries exact byte counts and digests") {
    val m = Multimodal.meta(toy, "doc_id", "text").collect()
    val byId = m.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getInt(2) == "the quick brown fox jumps over the lazy dog".length)
    assert(byId(1L).getString(3) == byId(2L).getString(3)) // same content → same md5
    assert(byId(1L).getString(3) != byId(4L).getString(3))
  }

  test("multimodal feature extraction is deterministic and shaped [dim]") {
    // plumbing-only fixture (text bytes, nothing decodable) → the
    // spec-only FakeCodec, passed EXPLICITLY: the default codec is the
    // real ImageIoCodec, which rightly throws on these payloads
    val f = Multimodal.extractFeatures(
      Multimodal.ingest(toy, "doc_id", "text"), dim = 16,
      codec = Multimodal.FakeCodec).collect()
    assert(f.length == 5)
    assert(f.forall(_.getSeq[Float](1).length == 16))
    val f2 = Multimodal.extractFeatures(
      Multimodal.ingest(toy, "doc_id", "text"), dim = 16,
      codec = Multimodal.FakeCodec).collect()
    assert(f.map(_.getSeq[Float](1)).toSeq == f2.map(_.getSeq[Float](1)).toSeq)
  }

  test("a custom FeatureCodec plugs into extractFeatures (real-decoder swap point)") {
    // stand-in for a real decoder: "features" = payload byte length in
    // every slot, with the per-partition open() lifecycle observed
    val opened = spark.sparkContext.longAccumulator("codec_opened")
    val codec = new Multimodal.FeatureCodec {
      override def open(): Unit = opened.add(1)
      override def decode(payload: Array[Byte], dim: Int): Array[Float] =
        Array.fill(dim)(payload.length.toFloat)
    }
    val ingested = Multimodal.ingest(toy, "doc_id", "text")
    val f = Multimodal.extractFeatures(ingested, dim = 3, codec = codec).collect()
    val nBytes = Multimodal.meta(toy, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(f.nonEmpty)
    f.foreach { r =>
      val want = nBytes(r.getLong(0)).toFloat
      assert(r.getSeq[Float](1) == Seq(want, want, want))
    }
    assert(opened.value >= 1, "open() must run on the executors")
  }

  test("codec close() fires exactly once per partition after the last row") {
    // accumulators observe the executor-side lifecycle across the
    // task-completion-listener path
    val opened = spark.sparkContext.longAccumulator("lc_opened")
    val closed = spark.sparkContext.longAccumulator("lc_closed")
    val codec = new Multimodal.FeatureCodec {
      override def open(): Unit = opened.add(1)
      override def decode(payload: Array[Byte], dim: Int): Array[Float] =
        new Array[Float](dim)
      override def close(): Unit = closed.add(1)
    }
    val ingested = Multimodal.ingest(toy, "doc_id", "text")
    Multimodal.extractFeatures(ingested, dim = 2, codec = codec).count()
    assert(opened.value == closed.value,
      s"every open() needs its close(): opened=${opened.value} closed=${closed.value}")
    assert(closed.value >= 1)
  }

  test("frame sampling keeps every stride-th frame") {
    val fr = Multimodal.sampleFrames(
      Multimodal.ingest(toy, "doc_id", "text"), frameBytes = 8, stride = 2).collect()
    assert(fr.nonEmpty)
    assert(fr.forall(_.getInt(1) % 2 == 0))
  }

  test("embedding pairs are symmetric-free and thresholded") {
    val p = Similarity.embeddingPairs(
      graft.sources.Tables.embeddings(spark, sf), "vec_id", "embedding", 0.3).collect()
    assert(p.forall(r => r.getLong(0) < r.getLong(1)))
    assert(p.forall(r => r.getDouble(2) >= 0.3))
  }

  test("tfidf_topterms equals the row_number-window formulation") {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextFunctions
    val docs = graft.sources.Tables.documents(spark, sf)
    val got = graft.operators.TextAnalysis.tfIdfTopTerms(docs, "doc_id", "text", 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    val pairs = docs
      .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = pairs.groupBy("token").agg(count(lit(1)).as("df"))
    val n = docs.count()
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("token"))
    val want = pairs.join(dfreq, "token")
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        ((col("tf") * lit(n)).cast("double") / col("df")).as("score"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(got == want)
  }

  test("tfidf: a doc-unique term outranks a corpus-wide term") {
    val corpus = Seq(
      (1L, "zebra zebra zebra common common"),
      (2L, "common common filler words here"),
      (3L, "common filler words again here")
    ).toDF("doc_id", "text")
    val top = graft.operators.TextAnalysis
      .tfIdfTopTerms(corpus, "doc_id", "text", 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1: zebra (tf=3, df=1, score 9.0) beats common (tf=2, df=3, 2.0)
    assert(top(1L) == "zebra")
  }

  test("collocations: counts are exact and lift ranks the bound phrase first") {
    // "quick fox" always co-occurs; its words appear nowhere else
    val corpus = Seq(
      (1L, "quick fox runs far today"),
      (2L, "quick fox runs near today"),
      (3L, "today runs far and near")
    ).toDF("doc_id", "text")
    val rows = graft.operators.TextAnalysis
      .collocations(corpus, "text", minCount = 2, topN = 10).collect()
    val byPair = rows.map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    val (nPair, nW1, nW2, score) = byPair(("quick", "fox"))
    assert(nPair == 2 && nW1 == 2 && nW2 == 2) // T = 15 tokens
    assert(score == 7.5)
    // exclusive phrase has the max lift; scores arrive ranked descending
    assert(rows.head.getString(0) == "quick" && rows.head.getString(1) == "fox")
    val scores = rows.map(_.getDouble(5))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("line dedup: first occurrence wins, later copies drop, order survives") {
    val docs = Seq(
      (1L, "alpha beta\nshared boilerplate line\ngamma delta"),
      (2L, "shared boilerplate line\nepsilon zeta"),
      (3L, "eta theta\nshared boilerplate line")
    ).toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    // doc 1 holds the minimal (doc_id, line_no) for the shared line
    assert(out(1L) == (3, 3, "alpha beta\nshared boilerplate line\ngamma delta"))
    assert(out(2L) == (2, 1, "epsilon zeta"))
    assert(out(3L) == (2, 1, "eta theta"))
  }

  test("line dedup: blank lines don't skew kept-line indices; rerun is idempotent") {
    val docs = Seq(
      // blank + whitespace-only lines between real ones: line numbering
      // must index the FILTERED array or reconstruction picks wrong lines
      (1L, "keep one\n\n   \ndup line\nkeep two"),
      (2L, "dup line\nonly here")
    ).toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, "doc_id", "text")
    val byId = out.collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(byId(1L) == "keep one\ndup line\nkeep two")
    assert(byId(2L) == "only here")
    // a deduped corpus has no repeated lines left: second pass keeps all
    val again = Dedup.lineDedup(
      out.select(col("doc_id"), col("clean_text").as("text")), "doc_id", "text")
    assert(again.filter(col("n_kept") =!= col("n_lines")).count() == 0)
  }

  test("line dedup: doc whose every line loses yields empty text; empty doc is (0,0)") {
    val docs = Seq(
      (1L, "the only line"),
      (2L, "the only line"), // loses both its lines to doc 1... both = its one
      (3L, "")
    ).toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(out(1L) == (1, 1, "the only line"))
    assert(out(2L) == (1, 0, ""))
    assert(out(3L) == (0, 0, ""))
  }

  test("incremental line dedup equals the unioned batch slice; index closes the loop") {
    val ref = Seq(
      (1L, "ingested line one\ncommon footer"),
      (2L, "ingested line two\ncommon footer")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "fresh line alpha\ncommon footer\nbatch dup"),
      (11L, "batch dup\nfresh line beta")
    ).toDF("doc_id", "text")
    val inc = Dedup.lineDedupAgainst(batch, ref, "doc_id", "text")
    // reference ids below batch ids ⇒ equals full lineDedup's batch rows
    val full = Dedup.lineDedup(ref.unionByName(batch), "doc_id", "text")
      .filter(col("doc_id") >= 10L)
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty)
    val byId = inc.collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(byId(10L) == "fresh line alpha\nbatch dup")
    assert(byId(11L) == "fresh line beta")
    // persisted index: same survivors, reference never rescanned
    val dir = java.nio.file.Files.createTempDirectory("graft_lineidx").toString
    Dedup.buildLineIndex(ref, "doc_id", "text", dir)
    val idx = Dedup.lineDedupIndexed(batch, dir, "doc_id", "text")
    assert(idx.exceptAll(inc).isEmpty && inc.exceptAll(idx).isEmpty)
    // append the admitted batch: a later batch's copy of its lines drops
    Dedup.appendToLineIndex(batch, "doc_id", "text", dir)
    val batch2 = Seq((20L, "fresh line alpha\nbrand new line")).toDF("doc_id", "text")
    val out2 = Dedup.lineDedupIndexed(batch2, dir, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out2(20L) == "brand new line")
  }

  test("wrapLines fixture: header/footer wrap 6-token body lines") {
    val docs = Seq((7L, "a b c d e f g h", "src3")).toDF("doc_id", "text", "source")
    val got = docs.select(
      Dedup.wrapLines(col("text"), col("source")).as("w"))
      .head().getString(0)
    assert(got ==
      "share this article\na b c d e f\ng h\nall rights reserved src3")
    val empty = Seq((8L, "", "s")).toDF("doc_id", "text", "source")
      .select(Dedup.wrapLines(col("text"), col("source")).as("w"))
      .head().getString(0)
    assert(empty == "share this article\nall rights reserved s")
  }

  test("knn_join restricted to the probe ids equals knnLsh on the same params") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val got = Similarity.knnJoin(emb, "vec_id", "embedding", k = 5)
      .filter(col("vec_id") < 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = Similarity.knnLsh(emb, "vec_id", "embedding", nQueries = 10, k = 5)
      .select(col("query_id"), col("neighbor_id"), col("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want)
  }
}

package graft.tools

import org.apache.spark.sql.functions._

/** Round-16 attribution probe for the sf1 heavy tail — answers the
  * three "measure, then fix or bound" verdict items with one run:
  *
  *  1. dedup_pagerank: minhash pair MINING span alone vs the full
  *     query (mining + rank rounds) — which half owns the sf1 cost.
  *  2. exact_substr_dedup: the gram SCAN span (tokenize → shingle →
  *     md5 per occurrence, the portable-hash contract) vs the full
  *     query — the >80%-share bound criterion.
  *  3. ngram_lm_backoff / ngram_lm_perplexity: the AQE FINAL executed
  *     plan's join strategies at sf1 (do the model-side joins
  *     broadcast, or flip to SMJ as the model grows?).
  *
  * Usage: runjava.sh graft.tools.TailProbe [sfDir] — same 16-core
  * session shape as Sf1Bench so spans are comparable with
  * BENCH_sf1.json.
  */
object TailProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/testdata/sf1")
    // optional comma-list of sections: pagerank,substr,ngram,deep
    val sections = args.lift(1).map(_.split(',').toSet)
      .getOrElse(Set("pagerank", "substr", "ngram"))
    def on(s: String) = sections.contains(s)
    val spark = graft.GraftSession.builder("local[16]", 16)
      .config("spark.network.timeout", "600s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val spans = graft.Monitoring.installSpans(spark)
    def time(label: String)(df: => org.apache.spark.sql.DataFrame):
        org.apache.spark.sql.DataFrame = {
      // min-of-2, engine spans — the Sf1Bench convention
      var last: org.apache.spark.sql.DataFrame = null
      val engs = (1 to 2).map { _ =>
        org.apache.spark.sql.classic.GraftPlanFactory.flushListeners(spark)
        spans.reset()
        last = df
        last.write.format("noop").mode("overwrite").save()
        org.apache.spark.sql.classic.GraftPlanFactory.flushListeners(spark)
        spans.totalSec
      }
      println(f"[tail] $label%-42s engine ${engs.min}%7.2fs (runs ${engs.map(e => f"$e%.2f").mkString("/")})")
      last
    }

    val docs = graft.sources.Tables.documents(spark, sfDir)
    def joinCensus(name: String,
                   df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.executedPlan.toString
      def n(p: String) = p.r.findAllMatchIn(plan).length
      println(s"[tail] $name plan: BroadcastHashJoin=${n("BroadcastHashJoin")} " +
        s"SortMergeJoin=${n("SortMergeJoin")} ShuffledHashJoin=${n("ShuffledHashJoin")} " +
        s"BroadcastNestedLoopJoin=${n("BroadcastNestedLoopJoin")} Exchange=${n("Exchange")}")
    }

    if (on("pagerank")) {
      // --- 1. dedup_pagerank attribution ---
      time("dedup_pagerank: PAIR MINING alone") {
        graft.operators.Dedup.minhashLsh(docs, "doc_id", "text")
          .filter(col("est_jaccard") >= 0.5)
          .select(col("doc_a"), col("doc_b"))
      }
      time("dedup_pagerank: FULL (mining + rank rounds)") {
        graft.SparkEntry.queries("dedup_pagerank")(spark, sfDir)
      }
    }

    if (on("deep")) {
      // mining sub-attribution: the signature SCAN (tokenize → shingle
      // → md5 per shingle → k min-aggs; the portable-hash contract)
      // alone vs the whole miner
      time("dedup_pagerank: SIGNATURE SCAN alone") {
        graft.operators.Dedup.minhashSignatures(docs, "doc_id", "text", 16)
      }
      // semantic_clusters attribution: LSH pair mining vs the CC tail
      val emb = graft.sources.Tables.embeddings(spark, sfDir)
      time("semantic_clusters: PAIR MINING alone") {
        graft.operators.Similarity
          .embeddingPairsAuto(emb, "vec_id", "embedding", 0.4)
          .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
      }
      time("semantic_clusters: FULL (mining + CC)") {
        graft.SparkEntry.queries("semantic_clusters")(spark, sfDir)
      }
    }

    if (on("substr")) {
      // --- 2. exact_substr_dedup attribution ---
      // the gram scan exactly as dupGramHits builds it (tokenize →
      // shingle(k=8) → positional md5 hash), stopped before the census
      time("exact_substr: GRAM SCAN alone") {
        docs.select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("__t"))
          .select(col("doc_id"), posexplode(
            graft.functions.TextFunctions.shingles(col("__t"), 8)).as(Seq("pos", "__g")))
          .select(col("doc_id"), col("pos"),
            conv(substring(md5(col("__g")), 1, 12), 16, 10).cast("long").as("gh"))
      }
      val full = time("exact_substr_dedup: FULL") {
        graft.SparkEntry.queries("exact_substr_dedup")(spark, sfDir)
      }
      joinCensus("exact_substr_dedup final", full)
    }

    if (on("ngram")) {
      // --- 3. ngram LM final join strategies ---
      Seq("ngram_lm_backoff", "ngram_lm_perplexity").foreach { name =>
        val df = time(s"$name: FULL") {
          graft.SparkEntry.queries(name)(spark, sfDir)
        }
        joinCensus(s"$name final", df)
      }
    }

    if (on("deep")) {
      // perplexity's scoring join is hidden behind the `scored`
      // materialize cut in the registered query — rebuild the same
      // docGrams ⋈ model subtree from public pieces and execute it so
      // the AQE FINAL strategy of the gram-keyed join is visible
      val docGrams = docs
        .select(col("doc_id"), explode(graft.functions.TextFunctions.shingles(
          graft.functions.TextFunctions.tokens(col("text")), 2)).as("gram"))
        .groupBy(col("gram"), col("doc_id"))
        .agg(count(lit(1)).as("tf"))
        .localCheckpoint()
      val gramCounts = docGrams.groupBy(col("gram")).agg(sum(col("tf")).as("c2"))
        .withColumn("w1", substring_index(col("gram"), " ", 1))
      val model = gramCounts
        .join(gramCounts.groupBy(col("w1")).agg(sum(col("c2")).as("c1")), "w1")
        .select(col("gram"), col("c1"), col("c2"))
      val scored = time("perplexity: docGrams ⋈ model subtree") {
        docGrams.join(model, "gram")
          .groupBy(col("doc_id"))
          .agg(sum(col("tf")).as("n"), sum(col("c2")).as("s"))
      }
      joinCensus("perplexity scoring-join subtree", scored)
    }
    spark.stop()
  }
}

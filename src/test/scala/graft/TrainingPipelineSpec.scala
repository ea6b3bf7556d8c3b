package graft

import org.apache.spark.sql.functions._
import graft.operators.TrainingPipeline

class TrainingPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("curate round-6 gates: repetition-degenerate docs pruned when tightened") {
    val good = "the data engine sorts and merges the large table rows and " +
      "joins the filtered partitions for every query in the batch window today"
    val loop = ("spam ham " * 40).trim // dup_2gram_frac ~ 1: degenerate repetition
    val docs = Seq((1L, good), (2L, loop)).toDF("doc_id", "text")
    val strict = TrainingPipeline.curate(docs, "doc_id", "text",
      TrainingPipeline.Config(minQuality = 0.0, keepLangs = Set("en", "und", "de"),
        maxDupNgramFrac = 0.8))
      .select($"doc_id").as[Long].collect().toSet
    assert(!strict.contains(2L), s"repetitive doc must be gated, kept=$strict")
    assert(strict.contains(1L))
    val loose = TrainingPipeline.curate(docs, "doc_id", "text",
      TrainingPipeline.Config(minQuality = 0.0, keepLangs = Set("en", "und", "de"),
        maxDupNgramFrac = 1.0, maxTopNgramCharFrac = 1.0))
      .select($"doc_id").as[Long].collect().toSet
    assert(loose == Set(1L, 2L), s"permissive gates keep both, kept=$loose")
  }

  test("curate drops exact dups, fuzzy dups, and low-quality docs; keeps the rest") {
    val good = "the data engine sorts and merges the large table rows and " +
      "joins the filtered partitions for every query in the batch window today"
    val docs = Seq(
      (1L, good),
      (2L, good),                                   // exact dup of 1
      (3L, good.replace("today", "tonight")),       // near dup of 1
      (4L, "tiny doc"),                             // fails quality (length)
      (5L, "the quick brown fox jumps over the lazy dog and then naps " +
           "under the old oak tree while the afternoon sun warms the field slowly")
    ).toDF("doc_id", "text")

    val curated = TrainingPipeline.curate(docs, "doc_id", "text",
      TrainingPipeline.Config(minQuality = 0.6, fuzzyThreshold = 0.6))
    val kept = curated.select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 5L), s"kept=$kept")
    // bookkeeping survives
    val row1 = curated.filter($"doc_id" === 1).head()
    assert(row1.getAs[Long]("n_exact_dups") == 2L)
    assert(row1.getAs[Long]("ws_tokens") > 10L)
    assert(row1.getAs[String]("lang_pred") == "en")
  }

  test("curation is deterministic: same input, same output") {
    val docs = tables.documents.select($"doc_id", $"text")
    val cfg = TrainingPipeline.Config(keepLangs = Set("en", "und"), minQuality = 0.0)
    val a = TrainingPipeline.curate(docs, "doc_id", "text", cfg)
      .select($"doc_id").as[Long].collect().toSet
    val b = TrainingPipeline.curate(docs.repartition(13), "doc_id", "text", cfg)
      .select($"doc_id").as[Long].collect().toSet
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("stratified sample (q63 shape) is partition-invariant with exact quotas") {
    def sample(parts: Int): Map[(Long, String), Long] = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"lang").orderBy(md5($"doc_id".cast("string")), $"doc_id")
      tables.documents.repartition(parts)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter($"rn" <= 5)
        .select($"doc_id", $"lang", $"rn").as[(Long, String, Long)]
        .collect().map(t => (t._1, t._2) -> t._3).toMap
    }
    val a = sample(1)
    val b = sample(17)
    assert(a == b)
    // exact quota: 5 per language present in the fixture
    val perLang = a.keys.groupBy(_._2).view.mapValues(_.size).toMap
    assert(perLang.values.forall(_ == 5), s"quotas: $perLang")
  }

  test("aggregator-based stratifiedSample equals the window formulation (q63)") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy(md5($"doc_id".cast("string")), $"doc_id")
    val windowed = tables.documents
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 5)
      .select($"doc_id", $"lang", $"rn").as[(Long, String, Long)].collect().toSet
    val agged = TrainingPipeline.stratifiedSample(tables.documents, "lang", "doc_id", 5)
      .select($"doc_id", $"lang", $"rn").as[(Long, String, Long)].collect().toSet
    assert(agged == windowed)
    // and invariant under repartitioning (the property the shape buys)
    val agged13 = TrainingPipeline
      .stratifiedSample(tables.documents.repartition(13), "lang", "doc_id", 5)
      .select($"doc_id", $"lang", $"rn").as[(Long, String, Long)].collect().toSet
    assert(agged13 == windowed)
  }

  test("shard assignment (q66 shape) is a balanced-ish total partition of docs") {
    val shards = tables.documents
      .withColumn("__h", md5($"doc_id".cast("string")))
      .select($"doc_id",
        (expr("position(substring(__h, 1, 1) IN '0123456789abcdef')").cast("long") - 1L)
          .mod(lit(8L)).as("shard"))
    val counts = shards.groupBy($"shard").count().as[(Long, Long)].collect().toMap
    assert(counts.keySet == (0L to 7L).toSet) // every shard populated
    assert(counts.values.sum == tables.documents.count())
    // md5 nibble is uniform: no shard more than 3x the mean at n=500
    val mean = counts.values.sum.toDouble / 8
    assert(counts.values.forall(c => c < mean * 3))
  }

  test("stratifiedSample on STRING doc ids: exact quotas, partition-invariant, same selection") {
    import spark.implicits._
    // string ids (web-corpus shape) — the long-cast path would throw under ANSI
    val docs = tables.documents
      .select(concat(lit("doc-"), $"doc_id".cast("string")).as("doc_id"), $"lang")
    val s1 = TrainingPipeline.stratifiedSample(docs, "lang", "doc_id", 5)
    val quotas = s1.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(quotas.values.forall(_ == 5L), s"expected 5 per stratum, got $quotas")
    // deterministic under repartitioning
    val s2 = TrainingPipeline.stratifiedSample(docs.repartition(13), "lang", "doc_id", 5)
    assert(s1.select("doc_id", "lang").collect().toSet ==
      s2.select("doc_id", "lang").collect().toSet)
    // selection matches the integral path on the same underlying rows:
    // md5 of the string "doc-<n>" differs from md5 of "<n>", so compare
    // against a window twin computed on the same string ids
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy(
        conv(substring(md5($"doc_id"), 1, 13), 16, 10).cast("double").asc, $"doc_id".asc)
    val twin = docs.withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
    assert(s1.select("doc_id").collect().toSet == twin.select("doc_id").collect().toSet)
  }

  test("temperatureMixture: deterministic, τ upweights small sources, budget-ish") {
    import graft.operators.{TextAnalysis, TrainingPipeline}
    val docs = tables.documents
    def kept(tau: Double) = TrainingPipeline.temperatureMixture(
      docs, "doc_id", "source", TextAnalysis.wsTokenCount(col("text")),
      tau = tau, budgetFrac = 0.5)
    // deterministic under repartitioning: pure hash filter
    val a = kept(0.7).collect().map(_.getLong(0)).toSet
    val b = TrainingPipeline.temperatureMixture(
      docs.repartition(13), "doc_id", "source",
      TextAnalysis.wsTokenCount(col("text")), 0.7, 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty)
    // the kept fraction lands near the 50% token budget (binomial slack)
    val frac = a.size.toDouble / docs.count()
    assert(frac > 0.3 && frac < 0.7, s"kept fraction $frac")
    // τ < 1 upweights small sources: the smallest source's keep RATE is
    // >= the largest source's under τ=0.7 (they'd be equal at τ=1)
    val masses = docs.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keptBySrc = kept(0.7).groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val smallest = masses.minBy(_._2)._1
    val largest = masses.maxBy(_._2)._1
    if (smallest != largest) {
      val rSmall = keptBySrc.getOrElse(smallest, 0L).toDouble / masses(smallest)
      val rLarge = keptBySrc.getOrElse(largest, 0L).toDouble / masses(largest)
      assert(rSmall >= rLarge - 0.1,
        s"τ<1 should favor small sources: $smallest=$rSmall vs $largest=$rLarge")
    }
  }

  test("epochShuffle: exact permutation, seed-stable, partitioning-invariant") {
    val docs = tables.documents
    val n = docs.count()
    val e7 = TrainingPipeline.epochShuffle(docs, "doc_id", seed = 7)
    // ord is exactly 1..N, each once
    val ords = e7.select($"ord").as[Long].collect().sorted
    assert(ords.toSeq == (1L to n).toSeq)
    // same seed, different partitioning -> identical permutation
    val again = TrainingPipeline
      .epochShuffle(docs.repartition(13), "doc_id", seed = 7)
      .select($"doc_id", $"ord").as[(Long, Long)].collect().toMap
    val first = e7.select($"doc_id", $"ord").as[(Long, Long)].collect().toMap
    assert(first == again)
    // a different seed is a different permutation (not identity-related)
    val e8 = TrainingPipeline.epochShuffle(docs, "doc_id", seed = 8)
      .select($"doc_id", $"ord").as[(Long, Long)].collect().toMap
    assert(e8 != first)
  }

  test("packSequences: contiguous per-shard seq ids, budget-bounded, partition-invariant") {
    import graft.operators.{TextAnalysis, TrainingPipeline}
    val budget = 200L
    val packed = TrainingPipeline.packSequences(tables.documents,
      "source", "doc_id", TextAnalysis.wsTokenCount(col("text")), budget)
      .withColumn("tok", TextAnalysis.wsTokenCount(col("text")))
    val rows = packed.select($"source", $"doc_id", $"seq_id", $"tok")
      .as[(String, Long, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (src, docs) =>
      val inOrder = docs.sortBy(_._2)
      assert(inOrder.head._3 == 0L, src)
      // concatenated-stream invariant (implies nondecreasing, no skips
      // while the stream advances): a doc's seq is its exclusive prefix
      // divided by the budget
      var prefix = 0L
      inOrder.foreach { case (_, id, seq, tok) =>
        assert(seq == prefix / budget, s"$src doc $id")
        prefix += tok
      }
    }
    // partitioning-invariant
    val again = TrainingPipeline.packSequences(tables.documents.repartition(13),
      "source", "doc_id", TextAnalysis.wsTokenCount(col("text")), budget)
      .select($"doc_id", $"seq_id").as[(Long, Long)].collect().toMap
    assert(again == rows.map(r => r._2 -> r._3).toMap)
  }

  test("curate spanRemoveMinLen gate: survivors get clean text; off by default") {
    val run = (1 to 10).map(i => s"common$i").mkString(" ")
    val docs = Seq(
      (1L, s"the data engine sorts and merges the filtered rows $run today"),
      (2L, s"$run and the batch window joins every large partition for the query"),
      (3L, "the data engine sorts and merges the large table rows and " +
        "joins the filtered partitions for every query in the batch window")
    ).toDF("doc_id", "text")
    val cfg = TrainingPipeline.Config(minQuality = 0.0,
      keepLangs = Set("en", "und", "de"), maxDupNgramFrac = 1.0,
      maxTopNgramCharFrac = 1.0)
    val off = TrainingPipeline.curate(docs, "doc_id", "text", cfg)
    assert(!off.columns.contains("text_clean"), "gate must be off by default")
    val on = TrainingPipeline.curate(docs, "doc_id", "text",
      cfg.copy(spanRemoveMinLen = 8))
      .select($"doc_id", $"tokens_removed", $"text_clean")
      .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(on.size == 3, "span removal must not drop survivors")
    // doc 1 (min id) keeps the shared run; doc 2 loses its copy
    assert(on(1L)._2 == 0L)
    assert(on(2L)._2 == 10L && !on(2L)._3.contains("common1"), on(2L).toString)
    assert(on(3L)._2 == 0L)
  }

  test("heavyHitters: exact results under a capacity that FORCES MG decrements") {
    import graft.operators.TextAnalysis
    // 300×hot + 100×warm + 500 distinct noise words, one word per row,
    // shuffled across partitions: capacity 8 << 502 distinct terms, so
    // the Misra-Gries decrement path runs constantly
    val words = Seq.fill(300)("hot") ++ Seq.fill(100)("warm") ++
      (1 to 500).map(i => s"noise$i")
    val docs = new scala.util.Random(42).shuffle(words).zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
      .repartition(13)
    // N = 900; minCount=120, capacity=8 -> 960 > 900: guarantee holds
    val out = TextAnalysis.heavyHitters(docs, "text", minCount = 120L, capacity = 8)
      .as[(String, Long)].collect().toMap
    assert(out == Map("hot" -> 300L), out.toString)
    // threshold at 100 catches warm too (100x9=900... needs > N=900, use 10)
    assert(TextAnalysis.heavyHitters(docs, "text", minCount = 100L, capacity = 10)
      .as[(String, Long)].collect().toMap == Map("hot" -> 300L, "warm" -> 100L))
    // partition invariance
    assert(TextAnalysis.heavyHitters(docs.repartition(3), "text",
      minCount = 120L, capacity = 8).as[(String, Long)].collect().toMap ==
      Map("hot" -> 300L))
    // when the MG recall premise can't hold (minCount*capacity <= N),
    // the op degrades LOUDLY to the exact aggregation — the answer is
    // still exact, never an exception for a servable query
    assert(TextAnalysis.heavyHitters(docs, "text", minCount = 10L, capacity = 8)
      .as[(String, Long)].collect().toMap ==
      Map("hot" -> 300L, "warm" -> 100L))
    // broadcast guard: when partitions x capacity exceeds the bound,
    // the exact-aggregation fallback gives the identical answer
    assert(TextAnalysis.heavyHitters(docs, "text", minCount = 120L,
      capacity = 3000000).as[(String, Long)].collect().toMap ==
      Map("hot" -> 300L))
  }

  test("tokenBudgetSample: greedy md5-prefix per group, deterministic, budget-exact") {
    // deterministic fixture: 3 groups, known token counts
    val docs = (1L to 30L).map { i =>
      val g = if (i <= 12) "a" else if (i <= 22) "b" else "c"
      (i, g, Seq.fill((i % 5 + 1).toInt)(s"w$i").mkString(" "))
    }.toDF("doc_id", "grp", "text")
    val budgets = Map("a" -> 9L, "b" -> 7L)
    val out = TrainingPipeline.tokenBudgetSample(
      docs, "grp", "doc_id", "text", budgets, defaultBudget = 4L)
      .as[(Long, String, Long, Long)].collect()
    // reference: same md5(g|id)-ordered greedy PREFIX computed in plain
    // Scala (takeWhile: once cum exceeds the budget nothing re-enters)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expectedPrefix = (1L to 30L).map { i =>
      val g = if (i <= 12) "a" else if (i <= 22) "b" else "c"
      (i, g, (i % 5 + 1).toLong)
    }.groupBy(_._2).flatMap { case (g, ds) =>
      val budget = budgets.getOrElse(g, 4L)
      val sorted = ds.sortBy(d => (md5hex(s"$g|${d._1}"), d._1))
      val cums = sorted.scanLeft(0L)(_ + _._3).tail
      sorted.zip(cums).takeWhile(_._2 <= budget)
        .map { case (d, c) => (d._1, g, d._3, c) }
    }.toSet
    assert(out.toSet == expectedPrefix, s"got=${out.toSet}\nexp=$expectedPrefix")
    // per-group budget is never exceeded
    out.groupBy(_._2).foreach { case (g, rows) =>
      assert(rows.map(_._3).sum <= budgets.getOrElse(g, 4L), s"group $g over budget")
    }
    // partition invariance
    val out2 = TrainingPipeline.tokenBudgetSample(
      docs.repartition(7), "grp", "doc_id", "text", budgets, defaultBudget = 4L)
      .as[(Long, String, Long, Long)].collect()
    assert(out2.toSet == out.toSet)
    // shard invariance: the sharded prefix sums (any S) equal the
    // serial S=1 walk — the greedy prefix is a property of the md5
    // order, not of the shard layout
    val serial = TrainingPipeline.tokenBudgetSample(
      docs, "grp", "doc_id", "text", budgets, defaultBudget = 4L,
      shardsPerGroup = 1).as[(Long, String, Long, Long)].collect()
    assert(serial.toSet == out.toSet)
    val wide = TrainingPipeline.tokenBudgetSample(
      docs, "grp", "doc_id", "text", budgets, defaultBudget = 4L,
      shardsPerGroup = 256).as[(Long, String, Long, Long)].collect()
    assert(wide.toSet == out.toSet)
  }

  test("tokenBudgetSample: null-group rows survive sharding under defaultBudget") {
    val docs = Seq(
      (1L, "a", "w w w"), (2L, "a", "w w"),
      (3L, null.asInstanceOf[String], "w w"), (4L, null.asInstanceOf[String], "w"))
      .toDF("doc_id", "grp", "text")
    val out = TrainingPipeline.tokenBudgetSample(
      docs, "grp", "doc_id", "text", Map("a" -> 100L), defaultBudget = 100L)
      .as[(Long, String, Long, Long)].collect()
    assert(out.length == 4, out.mkString(","))
    val nullRows = out.filter(_._2 == null)
    assert(nullRows.map(_._1).toSet == Set(3L, 4L))
    assert(nullRows.map(_._4).max == 3L) // cum over the null group alone
  }

  test("tfidfTopTerms: k per doc, corpus-wide terms rank below rare ones") {
    val docs = Seq(
      (1L, "alpha alpha alpha common common"),
      (2L, "beta beta common common"),
      (3L, "gamma common")).toDS().toDF("doc_id", "text")
    val top = graft.operators.TextAnalysis
      .tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .as[(Long, String, Double)].collect()
    assert(top.count(_._1 == 1L) == 2)
    // `common` appears in every doc -> idf = ln(1) = 0 -> never beats a
    // doc-unique term
    val best = top.groupBy(_._1).map { case (id, rows) => id -> rows.maxBy(_._3)._2 }
    assert(best == Map(1L -> "alpha", 2L -> "beta", 3L -> "gamma"), best.toString)
    assert(top.filter(_._2 == "common").forall(_._3 == 0.0))
    // exactly k rows per doc on the real corpus, deterministic order
    val corpus = graft.operators.TextAnalysis
      .tfidfTopTerms(tables.documents, "doc_id", "text", k = 5)
    val perDoc = corpus.groupBy($"doc_id").count().select($"count").as[Long].collect()
    assert(perDoc.forall(_ == 5L))
  }

  test("importanceWeights: exact integer ratios, self-target fixpoint, partition-invariant") {
    val src = Seq(
      (1L, "aa bb cc"), (2L, "xx yy zz"), (3L, "aa bb"), (4L, "")
    ).toDF("doc_id", "text")
    // target = doc 1 only. Grams: doc1 {aa,bb,cc,"aa bb","bb cc"},
    // doc2 {xx,yy,zz,"xx yy","yy zz"}, doc3 {aa,bb,"aa bb"}, doc4 {}.
    // sc: aa 2, bb 2, cc 1, "aa bb" 2, "bb cc" 1, doc2 grams 1 each.
    // tc (doc1): each of doc1's grams once. Integer weights at the
    // 1e6 scale: shared grams 1e6/2 = 500000, doc1-unique 1e6,
    // doc2 grams 0. (Distinct vocab ⇒ md5-prefix collisions between
    // the 10 grams are possible in principle; this exact fixture is
    // collision-free — the assertions below would catch a drift.)
    val iw = TrainingPipeline.importanceWeights(
        src, src.filter($"doc_id" === 1), "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(iw == Map(
      1L -> (500000L + 500000L + 1000000L + 500000L + 1000000L),
      2L -> 0L,
      3L -> (500000L + 500000L + 500000L),
      4L -> 0L), iw.toString)
    // self-target: every bucket's tc == sc, so every gram scores
    // exactly `scale` and a doc's weight is nGrams x scale
    val self = TrainingPipeline.importanceWeights(src, src, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(self == Map(1L -> 5000000L, 2L -> 5000000L, 3L -> 3000000L, 4L -> 0L),
      self.toString)
    // partition invariance (md5 buckets + integer arithmetic only)
    val rep = TrainingPipeline.importanceWeights(
        src.repartition(7), src.filter($"doc_id" === 1).repartition(3),
        "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(rep == iw)
    // real corpus: English docs must outrank non-English on the
    // English-target profile PER GRAM (iw is a sum, so raw scores are
    // length-biased — the paper's weight is per-feature; normalize by
    // the doc's gram count 2·len−1 before comparing averages)
    val d = tables.documents
    val w = TrainingPipeline.importanceWeights(
      d, d.filter($"lang" === "en"), "doc_id", "text")
    val toks = d.select($"doc_id", $"lang",
      size(graft.operators.Dedup.tokens($"text")).as("nt"))
    val byLang = w.join(toks, Seq("doc_id")).filter($"nt" > 0)
      .groupBy(($"lang" === "en").as("en"))
      .agg(avg($"iw" / ($"nt" * 2 - 1))).as[(Boolean, Double)]
      .collect().toMap
    assert(byLang(true) > byLang(false),
      s"English target must upweight English docs per gram: $byLang")
  }

  test("exportShards: manifest proves completeness; re-export reproduces it; shards balanced") {
    import graft.operators.TrainingPipeline
    val docs = tables.documents.select($"doc_id", $"text")
    val out = java.nio.file.Files.createTempDirectory("export_spec_").toString
    val m1 = TrainingPipeline.exportShards(docs, "doc_id", "text", 8, s"$out/a")
      .orderBy($"shard").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(m1.map(_._1) == (0L until 8L), s"all shards present: ${m1.map(_._1)}")
    assert(m1.map(_._2).sum == docs.count(), "no doc lost or duplicated")
    // re-export to a different dir reproduces the manifest exactly
    // (content-addressed sharding is input-deterministic)
    val m2 = TrainingPipeline.exportShards(docs, "doc_id", "text", 8, s"$out/b")
      .orderBy($"shard").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(m1 == m2)
    // md5-nibble balance: no shard owns more than 3x its fair share
    val fair = docs.count().toDouble / 8
    assert(m1.map(_._2).max <= 3 * fair, s"skewed shards: ${m1.map(_._2)}")
    // a tampered export (one shard dir dropped) changes the manifest
    val back = spark.read.parquet(s"$out/a")
    assert(back.filter($"shard" === 0).count() == m1.head._2)
  }

  test("ClassifierTrain: separable fixture converges; DECIMAL-exact grads are partition-invariant") {
    import graft.operators.ClassifierTrain
    // separable toy: positives contain the marker token
    val docs = (0 until 60).map { i =>
      val marker = if (i % 3 == 0) " zebra" else ""
      (i.toLong, s"alpha beta gamma delta token$i$marker", if (i % 3 == 0) 1 else 0)
    }.toDF("doc_id", "text", "y")
    val fit = ClassifierTrain.fit(docs, "text", "y", dim = 256, iters = 40, lr = 1.0)
    assert(fit.losses.last < fit.losses.head,
      s"loss must decrease: ${fit.losses.head} -> ${fit.losses.last}")
    val scored = docs.withColumn("p",
      ClassifierTrain.score($"text", fit, 256))
    val acc = scored.filter(($"p" >= 0.5) === ($"y" === 1)).count().toDouble / 60
    assert(acc == 1.0, s"separable fixture must fully separate, got $acc")
    // DECIMAL-exact gradient sums -> the fitted weights are
    // BIT-IDENTICAL at any partition count
    val fit7 = ClassifierTrain.fit(docs.repartition(7), "text", "y",
      dim = 256, iters = 40, lr = 1.0)
    assert(fit.bias == fit7.bias)
    assert(fit.weights.toSeq == fit7.weights.toSeq,
      "weights must be partition-invariant bit-for-bit")
    // trained model drops into the scoring dataflow: same bucket fn
    val b1 = docs.select(ClassifierTrain.docBuckets($"text", 256).as("b"))
      .limit(1).collect()(0).getSeq[Long](0)
    assert(b1.forall(b => b >= 0 && b < 256))
  }

  test("curationFunnel: level counts equal per-stage refilters; null predicates fail closed") {
    val df = Seq(
      (1, Some(5), 10L), (2, Some(0), 20L), (3, Some(2), 30L),
      (4, Some(1), 40L), (5, None, 50L)
    ).toDF("id", "v", "nt")
    val out = TrainingPipeline.curationFunnel(df, $"nt", Seq(
        "ge1" -> ($"v" >= 1), "ge2" -> ($"v" >= 2)))
      .as[(Int, String, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (0, "input", 5L, 150L), // null-v doc counts at input...
      (1, "ge1", 3L, 80L),    // ...but its NULL predicate fails closed
      (2, "ge2", 2L, 40L)))
    // funnel is monotone by construction
    assert(out.map(_._3).toSeq == out.map(_._3).sorted.reverse.toSeq)
    // refilter cross-check on the real corpus against the single-scan trick
    val docs = tables.documents
      .withColumn("nt", size(graft.operators.Dedup.tokens($"text")))
    val funnel = TrainingPipeline.curationFunnel(docs, $"nt", Seq(
        "en" -> ($"lang" === "en"), "long" -> ($"n_chars" >= 200)))
      .as[(Int, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(funnel(0)._3 == docs.count())
    assert(funnel(1)._3 == docs.filter($"lang" === "en").count())
    assert(funnel(2)._3 == docs.filter($"lang" === "en" && $"n_chars" >= 200).count())
  }

  test("leakageSafeSplit: cluster coherence by construction; near-dup composition; proportions") {
    val docs = tables.documents
    // exact-dup key: identical text can never straddle the split
    val split = TrainingPipeline.leakageSafeSplit(docs, "doc_id", $"text", 0.125).cache()
    assert(split.count() == docs.count())
    val straddle = docs.join(split, "doc_id")
      .groupBy("text").agg(countDistinct($"side").as("sides"))
      .filter($"sides" > 1).count()
    assert(straddle == 0, "identical text on both sides = leakage")
    val valFrac = split.filter($"side" === "val").count().toDouble / docs.count()
    assert(valFrac > 0.05 && valFrac < 0.25, s"val fraction $valFrac vs 0.125")
    // NEAR-dup composition: split on the MinHash cluster id; every
    // cluster member (jaccard-similar, not identical) shares a side
    val assign = graft.operators.Dedup.dedupAssignments(docs, "doc_id", "text")
    val withKey = docs.join(assign, "doc_id")
    val nearSplit = TrainingPipeline.leakageSafeSplit(withKey, "doc_id", $"keep_id", 0.125)
    val clusterStraddle = withKey.join(nearSplit, "doc_id")
      .groupBy("keep_id").agg(countDistinct($"side").as("sides"))
      .filter($"sides" > 1).count()
    assert(clusterStraddle == 0, "a near-dup cluster must land on one side")
    // determinism
    val again = TrainingPipeline.leakageSafeSplit(docs.repartition(7), "doc_id", $"text", 0.125)
    assert(again.exceptAll(split).isEmpty && split.exceptAll(again).isEmpty)
    split.unpersist()
  }

  test("upsampleRepeat: copy counts per rate class, zero-rate exclusion, determinism") {
    val docs = tables.documents
    val out = TrainingPipeline.upsampleRepeat(docs, "doc_id", "source",
      rates = Map("src0" -> 2.5, "src1" -> 0.25, "src2" -> 0.0)).cache()
    val perDoc = out.groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n"), max($"copy").as("mx"), min($"copy").as("mn"))
      .cache()
    // copies are numbered 1..n with no gaps
    assert(perDoc.filter($"mn" =!= 1 || $"mx" =!= $"n").isEmpty)
    // src0: 2 or 3 copies, roughly half each (md5 draw vs dyadic .5)
    val s0 = perDoc.filter($"source" === "src0").select("n").as[Long].collect()
    assert(s0.forall(n => n == 2 || n == 3))
    val frac3 = s0.count(_ == 3).toDouble / s0.length
    assert(frac3 > 0.25 && frac3 < 0.75, s"src0 3-copy fraction $frac3")
    // src1: docs appear at most once, ~25% kept
    val n1 = perDoc.filter($"source" === "src1").count()
    val d1 = docs.filter($"source" === "src1").count()
    assert(perDoc.filter($"source" === "src1" && $"n" =!= 1).isEmpty)
    assert(n1 > 0 && n1 < d1, s"src1 kept $n1 of $d1")
    // src2 rate 0: fully excluded
    assert(out.filter($"source" === "src2").isEmpty)
    // every other source: exactly its docs, once each
    val rest = perDoc.filter(!$"source".isin("src0", "src1", "src2"))
    assert(rest.filter($"n" =!= 1).isEmpty)
    assert(rest.count() == docs.filter(!$"source".isin("src0", "src1", "src2")).count())
    // deterministic under repartitioning
    val again = TrainingPipeline.upsampleRepeat(docs.repartition(7), "doc_id", "source",
      rates = Map("src0" -> 2.5, "src1" -> 0.25, "src2" -> 0.0))
    assert(again.exceptAll(out).isEmpty && out.exceptAll(again).isEmpty)
    perDoc.unpersist(); out.unpersist()
  }

  test("ppsSystematicSample: equals the serial walk; mult for heavy rows; invariances") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // weights incl. a zero, a null, and one row HEAVIER than step
    val rows = (1L to 40L).map { i =>
      val w: java.lang.Long =
        if (i == 7L) null
        else if (i == 13L) 0L
        else if (i == 21L) 250L // > step -> mult >= 2
        else (i % 9) + 1L
      (i, w)
    }
    val docs = rows.toDF("doc_id", "wt")
    val step = 100L; val off = 17L
    val out = TrainingPipeline.ppsSystematicSample(
        docs, "doc_id", "wt", step, off)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // serial reference walk in plain Scala
    val ordered = rows.map { case (i, w) =>
      (i, Option(w).map(_.longValue).getOrElse(0L)) }
      .sortBy { case (i, _) => (md5hex(s"42|$i"), i) }
    var cum = 0L
    val expected = ordered.flatMap { case (i, w) =>
      val lo = cum; cum += w
      val m = (cum - off + step) / step - (lo - off + step) / step
      if (m >= 1) Some((i, w, cum, m)) else None
    }.sortBy(_._1)
    assert(out.toSeq == expected,
      s"sharded engine walk must equal the serial reference")
    // total multiplicity = number of sampling points under the mass
    val totalW = ordered.map(_._2).sum
    val points = if (totalW >= off) (totalW - off) / step + 1 else 0L
    assert(out.map(_._4).sum == points)
    assert(out.exists(_._4 >= 2), "the 250-weight row must be multi-selected")
    assert(!out.exists(_._1 == 7L) && !out.exists(_._1 == 13L),
      "null/zero weights can never straddle a sampling point")
    // shard-count and partitioning invariance
    val s1 = TrainingPipeline.ppsSystematicSample(
        docs.repartition(7), "doc_id", "wt", step, off, shards = 1)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(s1.toSeq == out.toSeq, "shards=1 vs shards=256 must agree exactly")
    // negative weight refused
    intercept[IllegalArgumentException] {
      TrainingPipeline.ppsSystematicSample(
        Seq((1L, -5L), (2L, 3L)).toDF("doc_id", "wt"), "doc_id", "wt", 10L, 1L)
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.{Relational, StreamThrough}

class OperatorEdgeSpec extends SparkSpec {
  import spark.implicits._

  test("bigramPerplexity: predictable text scores lower; short docs excluded") {
    val docs = Seq(
      (1L, "a a a a a a a a a a"),              // one bigram, fully predictable
      (2L, "q w e r t y u i o p"),              // every bigram unique
      (3L, "solo"),                             // < 2 tokens: no score
      (4L, "")                                  // empty: no score
    ).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.bigramPerplexity(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 2L))
    val Seq((_, n1, p1), (_, _, p2)) = got
    assert(n1 == 9L)
    assert(p1 < p2, s"repeated text should be more predictable: $p1 vs $p2")
  }

  test("assertRows passes valid data through unchanged") {
    val df = Seq(1, 2, 3).toDF("v")
    assert(Relational.assertRows(df, $"v" > 0, "positive").count() == 3)
  }

  test("assertRows fails the job on violation") {
    val df = Seq(1, -2, 3).toDF("v")
    // wrapped as SparkException from a task, or SparkRuntimeException
    // when the plan collapses to a local scan — either way it fails
    val e = intercept[Throwable] {
      Relational.assertRows(df, $"v" > 0, "positive").count()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("|")
    assert(msgs.contains("ASSERT failed"))
  }

  test("StreamThrough pipes rows through an external command") {
    val df = Seq((1L, "abc"), (2L, "xyz")).toDF("id", "s")
    val out = StreamThrough(df, Seq("tr", "a-z", "A-Z"), Seq("id", "s_up"))
    val got = out.as[(String, String)].collect().toSet
    assert(got == Set(("1", "ABC"), ("2", "XYZ")))
  }

  test("StreamThrough surfaces a nonzero exit as a task failure") {
    val df = Seq((1L, "a")).toDF("id", "s")
    val e = intercept[org.apache.spark.SparkException] {
      StreamThrough(df, Seq("false"), Seq("x")).count()
    }
    assert(e.getMessage.contains("exited") || e.getCause != null)
  }

  test("bloomSemiFilter keeps all true matches (no false negatives)") {
    val big = tables.lineitem
    val small = tables.orders.filter($"o_orderpriority" === "1-URGENT").select($"o_orderkey")
    val pre = Relational.bloomSemiFilter(big, "l_orderkey", small, "o_orderkey",
      expectedItems = 10000L)
    val exact = big.join(small, $"l_orderkey" === $"o_orderkey", "left_semi")
    // bloom pass is a superset of the exact semi join
    assert(pre.join(small, $"l_orderkey" === $"o_orderkey", "left_semi").count() == exact.count())
    assert(pre.count() >= exact.count())
    // the probe is the native might_contain expression — the scan-side
    // predicate must stay codegen'd, no ScalaUDF/BatchEvalPython node
    val plan = pre.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEval"),
      s"bloom probe fell out of codegen:\n$plan")
  }

  test("weighted_avg Aggregator is partition-count invariant") {
    graft.functions.Aggregators.register(spark)
    val li = tables.lineitem
    val r1 = li.repartition(1).groupBy($"l_returnflag")
      .agg(expr("weighted_avg(l_extendedprice, l_quantity)").as("w")).as[(String, Double)].collect().toMap
    val r13 = li.repartition(13).groupBy($"l_returnflag")
      .agg(expr("weighted_avg(l_extendedprice, l_quantity)").as("w")).as[(String, Double)].collect().toMap
    assert(r1 == r13) // exact integer buffer -> identical at any parallelism
  }

  test("weighted_avg returns the true weighted mean, not a scaled one") {
    graft.functions.Aggregators.register(spark)
    // hand-computable: (10.00*2 + 40.00*6) / (2+6) = 260/8 = 32.5
    val df = Seq((10.00, 2.0), (40.00, 6.0)).toDF("v", "w")
    val got = df.agg(expr("weighted_avg(v, w)")).as[Double].head()
    assert(math.abs(got - 32.5) < 1e-9, s"got $got, want 32.5")
    // degenerate: all-zero weights -> 0.0, not NaN
    val z = Seq((5.0, 0.0)).toDF("v", "w").agg(expr("weighted_avg(v, w)")).as[Double].head()
    assert(z == 0.0)
  }

  test("StreamThrough SHIP distributes a script file to executors") {
    val script = java.nio.file.Files.createTempFile("ship", ".sh")
    java.nio.file.Files.writeString(script, "#!/bin/sh\ntr a-z A-Z\n")
    script.toFile.setExecutable(true)
    val df = Seq((1L, "abc")).toDF("id", "s")
    val out = StreamThrough(df,
      Seq("sh", s"{SHIP:${script.getFileName}}"), Seq("id", "s_up"),
      ship = Seq(script.toString))
    assert(out.as[(String, String)].collect().toSet == Set(("1", "ABC")))
  }

  test("StreamThrough survives a command flooding stderr") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    // ~1MB of stderr noise before echoing stdin — deadlocks if stderr
    // is not drained (OS pipe buffer is ~64KB)
    val script = "head -c 1000000 /dev/zero | tr '\\0' 'e' >&2; cat"
    val out = StreamThrough(df, Seq("sh", "-c", script), Seq("id", "s"))
    assert(out.count() == 2)
  }

  test("ngramStringsAll kernel equals the HOF window formulation; keeps repeats") {
    import graft.operators.Dedup.tokens
    val texts = Seq(
      "a b c d e", "A  B\tC", "x", "", "  ", "a a a a",
      "one two one two one two", "tab\tand  runs \n lines")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("id", "t")
    val n = 3
    val tk = tokens($"t")
    val hof = when(size(tk) >= n,
        expr(s"transform(sequence(1, size(filter(split(lower(t), '\\\\s+'), x -> x != '')) - ${n - 1}), " +
          s"i -> array_join(slice(filter(split(lower(t), '\\\\s+'), x -> x != ''), i, $n), ' '))"))
      .otherwise(array().cast("array<string>"))
    val out = df.select($"id",
        graft.plans.TextExpressions.ngramStringsAll($"t", n).as("k"),
        hof.as("h"))
      .as[(Long, Seq[String], Seq[String])].collect()
    out.foreach { case (id, k, h) => assert(k == h, s"id=$id k=$k h=$h") }
    // repeats preserved (the distinct-gram kernel would collapse them)
    val rep = out.find(_._1 == 6L).get._2
    assert(rep.count(_ == "one two one") == 2, rep.toString)
  }

  test("IVF-PQ edges: null vectors dropped, zero-norm vectors never surface as neighbors") {
    import graft.operators.Similarity
    val pts = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 0.0f, 0.0f)), // zero-norm: cosine undefined
      (5L, null.asInstanceOf[Array[Float]]) // null embedding
    ).toDF("vec_id", "embedding")
    val clean = pts.filter($"embedding".isNotNull)
    val cents = Similarity.kMeansFit(clean, "embedding", k = 2, iters = 2)
    val pq = Similarity.pqTrain(clean, "embedding", m = 2, nCodes = 8, iters = 1)
    // null rows are dropped by the kernels' null-safe eval (cell/codes
    // null -> join drops); zero-norm rows unitize to themselves and
    // score NaN-free via the adc dot (0.0 contributions)
    val got = Similarity.ivfPqTopK(pts, pts.filter($"vec_id" === 1),
        "vec_id", "vec_id", "embedding", k = 2, centroids = cents, pq = pq,
        nProbe = 2, refine = 2)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    assert(got.nonEmpty)
    assert(!got.exists(_._2 == 5L), "null embedding must never be a neighbor")
    assert(got.head._2 == 2L, s"nearest to v1 must be v2: ${got.toSeq}")
    // pqTrain refuses a non-divisible subspace split loudly
    val e = intercept[IllegalArgumentException] {
      Similarity.pqTrain(clean, "embedding", m = 3)
    }
    assert(e.getMessage.contains("not divisible"))
  }

  test("distinctiveTerms: sides match a BigInt reference; boundary is strict") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      ("A", "alpha alpha alpha shared shared"),
      ("A", "alpha shared common common"),
      ("B", "beta beta shared common common"),
      ("B", "beta shared shared common"),
      ("C", "noise noise noise") // third corpus must be ignored
    ).toDF("corp", "text")
    val thr = 2L
    val got = TextAnalysis.distinctiveTerms(docs, "text", "corp", "A", "B", thr)
      .as[(String, String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // BigInt reference over the same token counts
    val aToks = Seq("alpha", "alpha", "alpha", "shared", "shared",
      "alpha", "shared", "common", "common")
    val bToks = Seq("beta", "beta", "shared", "common", "common",
      "beta", "shared", "shared", "common")
    val aTot = BigInt(aToks.size); val bTot = BigInt(bToks.size)
    val expected = (aToks ++ bToks).distinct.flatMap { term =>
      val a = BigInt(aToks.count(_ == term)); val b = BigInt(bToks.count(_ == term))
      val ps = (a + 1) * (bTot - b + 1); val qr = (aTot - a + 1) * (b + 1)
      if (ps > thr * qr) Some(term -> ("A", a.toLong, b.toLong))
      else if (qr > thr * ps) Some(term -> ("B", a.toLong, b.toLong))
      else None
    }.toMap
    assert(got.keySet == expected.keySet,
      s"got ${got.keySet}, expected ${expected.keySet}")
    expected.foreach { case (term, (side, a, b)) =>
      assert(got(term) == ((term, side, a, b)), s"term $term")
    }
    assert(got.contains("alpha") && got("alpha")._2 == "A")
    assert(got.contains("beta") && got("beta")._2 == "B")
    assert(!got.contains("noise"), "corpus C must not leak in")
    assert(!got.contains("shared") && !got.contains("common"),
      "balanced terms are not distinctive")
    // strictness at the boundary: a term with ps == thr*qr is excluded
    val bdocs = Seq(("A", "x"), ("B", "y")).toDF("corp", "text")
    // x: a=1,b=0 -> ps=(2)*(2)=4, qr=(1)*(1)=1; with thr=4: 4 > 4 false
    val strict = TextAnalysis.distinctiveTerms(bdocs, "text", "corp", "A", "B", 4L)
      .as[(String, String, Long, Long)].collect().map(_._1).toSet
    assert(!strict.contains("x"), "ps == thr*qr must NOT select (strict >)")
  }
}

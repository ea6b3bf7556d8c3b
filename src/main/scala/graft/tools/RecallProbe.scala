package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe: prints the exact recall of the approximate ANN/dedup
  * operators against brute-force truth at a given SF dir, so the
  * CORRECTNESS recall bounds are set from measurement, not guesswork. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master("local[16]")
        .config("spark.sql.shuffle.partitions", 16)
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val qs = emb.filter(col("vec_id") % 100 === 0)
    // truth is CACHED + materialized off the clock: each timed recall
    // join would otherwise re-run the brute-force ground truth and the
    // secs column would measure the oracle, not the operator
    val truth = graft.operators.Similarity.bruteForceTopK(
        emb, qs, "vec_id", "vec_id", "embedding", 5)
      .select(col("query_id"), col("neighbor_id"))
      .cache()
    truth.count()
    def recall(name: String, found: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val nh = truth.join(found, Seq("query_id", "neighbor_id")).count()
      val secs = (System.nanoTime() - t0) / 1e9
      val nt = truth.count()
      println(f"[probe] $name: hit=$nh truth=$nt recall=${nh.toDouble / nt}%.3f secs=$secs%.1f")
    }
    // (planes, bands) sweep: fewer planes per band = wider buckets =
    // more candidates; more bands = more OR-amplification chances.
    for ((p, b) <- Seq((8, 4), (8, 8), (6, 8), (6, 16), (4, 8), (4, 16)))
      recall(s"lsh p$p b$b", graft.operators.Similarity.lshTopK(
        emb, qs, "vec_id", "vec_id", "embedding", 5, planes = p, bands = b)
        .select(col("query_id"), col("neighbor_id")))
    for ((c, pr) <- Seq((16, 6), (16, 8), (8, 4)))
      recall(s"ivf $c/$pr", graft.operators.Similarity.ivfTopK(
        emb, qs, "vec_id", "vec_id", "embedding", 5, nCentroids = c, nProbe = pr)
        .select(col("query_id"), col("neighbor_id")))
    // IVF over FITTED centroids (kMeansFit -> ivfTopKWithCentroids):
    // same nProbe points, centroids from the k-means|| fit instead of
    // the hash sample — the round-8 composition
    // topK=256 @ fitted 16 centroids / nProbe 8 is the r9 sf0.1
    // spec-pin configuration (VERDICT r8 #9)
    locally {
      val truth256 = graft.operators.Similarity.bruteForceTopK(
          emb, qs, "vec_id", "vec_id", "embedding", 256)
        .select(col("query_id"), col("neighbor_id")).cache()
      truth256.count()
      val cents = graft.operators.Similarity.kMeansFit(
        emb, "embedding", k = 16, iters = 3, init = "parallel")
      val found = graft.operators.Similarity.ivfTopKWithCentroids(
          emb, qs, "vec_id", "vec_id", "embedding", 256, centroids = cents, nProbe = 8)
        .select(col("query_id"), col("neighbor_id"))
      val nh = truth256.join(found, Seq("query_id", "neighbor_id")).count()
      val nt = truth256.count()
      println(f"[probe] ivf-fitted topK256 16/8: hit=$nh truth=$nt recall=${nh.toDouble / nt}%.3f")
      truth256.unpersist()
    }
    // (256, 8) centroid config at this corpus size is an UNDERSIZED
    // operating point (8 vectors/cell, 8/256 cells probed) — kept in
    // the sweep as documentation of why the pin is not set there
    for ((c, pr) <- Seq((16, 6), (16, 8), (256, 8))) {
      val cents = graft.operators.Similarity.kMeansFit(
        emb, "embedding", k = c, iters = 3, init = "parallel")
      recall(s"ivf-fitted $c/$pr", graft.operators.Similarity.ivfTopKWithCentroids(
        emb, qs, "vec_id", "vec_id", "embedding", 5, centroids = cents, nProbe = pr)
        .select(col("query_id"), col("neighbor_id")))
    }
    // IVF-PQ (r9): coarse fitted 16 centroids / nProbe 8, PQ over m=8
    // subspaces — recall cost of scoring on m code ids instead of the
    // exact vector, swept over codebook size
    locally {
      val cents = graft.operators.Similarity.kMeansFit(
        emb, "embedding", k = 16, iters = 3, init = "parallel")
      for (nCodes <- Seq(16, 32, 64, 128)) {
        val pq = graft.operators.Similarity.pqTrain(
          emb, "embedding", m = 8, nCodes = nCodes, iters = 3)
        recall(s"ivf-pq 16/8 m8 c$nCodes", graft.operators.Similarity.ivfPqTopK(
          emb, qs, "vec_id", "vec_id", "embedding", 5, centroids = cents,
          pq = pq, nProbe = 8)
          .select(col("query_id"), col("neighbor_id")))
        recall(s"ivf-pq+r4 16/8 m8 c$nCodes", graft.operators.Similarity.ivfPqTopK(
          emb, qs, "vec_id", "vec_id", "embedding", 5, centroids = cents,
          pq = pq, nProbe = 8, refine = 4)
          .select(col("query_id"), col("neighbor_id")))
      }
      for ((m, nCodes, r, np) <- Seq((16, 128, 4, 8), (16, 256, 4, 8),
          (16, 256, 8, 8), (8, 128, 8, 8), (16, 256, 4, 12), (16, 128, 4, 12))) {
        val pq = graft.operators.Similarity.pqTrain(
          emb, "embedding", m = m, nCodes = nCodes, iters = 3)
        recall(s"ivf-pq+r$r 16/$np m$m c$nCodes", graft.operators.Similarity.ivfPqTopK(
          emb, qs, "vec_id", "vec_id", "embedding", 5, centroids = cents,
          pq = pq, nProbe = np, refine = r)
          .select(col("query_id"), col("neighbor_id")))
      }
    }
    // minhash recall vs exact jaccard at 0.8
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val tPairs = graft.operators.Dedup.exactJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("id1", "id2")
    val fPairs = graft.operators.Dedup.fuzzyDupPairs(docs, "doc_id", "text", 3, 0.8)
      .select("id1", "id2")
    val nh = tPairs.join(fPairs, Seq("id1", "id2")).count()
    val nt = tPairs.count()
    val nx = fPairs.join(tPairs, Seq("id1", "id2"), "left_anti").count()
    println(f"[probe] minhash: hit=$nh truth=$nt extra=$nx recall=${nh.toDouble / nt}%.3f")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.TrainingPipeline

class TrainingPipelineSpec extends SparkSpec {
  import spark.implicits._

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
}

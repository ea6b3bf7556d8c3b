package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end training-data curation pipeline — the composition the
  * LLM-pipeline extension operators exist for (SURVEY.md §7.1): filter
  * by language and quality, drop exact duplicates deterministically,
  * collapse fuzzy duplicate clusters to one canonical doc, and annotate
  * token counts — as ONE declarative dataflow.
  *
  * Dataflow (each stage a documented operator, composed with
  * `DataFrame.transform` like Pig macros):
  *
  *   docs
  *     │ langId / qualityScore annotations   (expressions, no shuffle)
  *     │ filter(lang ∈ keep, quality ≥ τ)
  *     │ exact dedup: md5 fingerprint groupBy, keep min id  (1 shuffle)
  *     │ fuzzy dedup: MinHash LSH → Jaccard verify → CC clusters,
  *     │              keep cluster min id                   (LSH shuffles)
  *     │ token counts annotation
  *     ▼
  *   curated corpus
  *
  * At 100 TB: every stage is the scale-shaped variant (banded LSH, no
  * all-pairs; bounded label propagation; fan-out before per-row heavy
  * compute). Nothing collects to the driver.
  */
object TrainingPipeline {

  final case class Config(
      keepLangs: Set[String] = Set("en", "und"),
      minQuality: Double = 0.5,
      fuzzyThreshold: Double = 0.8)

  /** Annotate every doc (kept or not) with the curation signals. */
  def annotate(docs: DataFrame, textCol: Column): DataFrame = docs
    .withColumn("lang_pred", TextAnalysis.langId(textCol))
    .withColumn("quality", TextAnalysis.qualityScore(textCol))
    .withColumn("fp", TextAnalysis.docFingerprint(textCol))
    .withColumn("ws_tokens", TextAnalysis.wsTokenCount(textCol))
    .withColumn("bpeish_tokens", TextAnalysis.bpeishTokenCount(textCol))

  /** Full curation: returns the curated corpus (one row per surviving
    * doc, with annotations and the dedup bookkeeping columns). */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): DataFrame = {
    val annotated = annotate(docs, col(textCol))
    val filtered = annotated
      .filter(col("lang_pred").isin(cfg.keepLangs.toSeq.map(x => x: Any): _*))
      .filter(col("quality") >= cfg.minQuality)

    // exact dedup on the canonical fingerprint: deterministic winner
    val exactWinners = filtered
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_exact_dups"))
      .join(filtered, Seq(idCol, "fp"))

    // fuzzy dedup: cluster near-dups among the exact-unique docs,
    // keep the cluster's min id
    val assignments = Dedup.dedupAssignments(
      exactWinners.select(col(idCol), col(textCol)), idCol, textCol,
      threshold = cfg.fuzzyThreshold)
    exactWinners
      .join(assignments, Seq(idCol))
      .filter(col("keep_id") === col(idCol))
      .drop("keep_id")
  }
}

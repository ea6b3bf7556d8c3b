package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("packMedia + extractMeta agree on byte counts and checksum") {
    val packed = Multimodal.packMedia(tables.documents, "text", "text/plain")
    val m = Multimodal.extractMeta(col("blob"))
    val bad = packed.select(
      ($"media_meta.n_bytes" === m.getField("n_bytes")).as("b1"),
      ($"media_meta.checksum" === m.getField("checksum")).as("b2"))
      .filter(!$"b1" || !$"b2")
    assert(bad.count() == 0)
  }

  test("decodeFeatures is deterministic and matches expression-level meta") {
    val packed = Multimodal.packMedia(tables.documents, "text", "text/plain")
    val dec = Multimodal.decodeFeatures(packed, "doc_id", "blob")
    // stub width/height formulas match extractMeta's
    val joined = dec.as("d").join(
      packed.select($"doc_id", Multimodal.extractMeta($"blob").as("m")).as("p"), "doc_id")
    val bad = joined.filter($"d.width" =!= $"m.width" || $"d.height" =!= $"m.height")
    assert(bad.count() == 0)
    // mean_byte of ASCII text is within the printable range
    val stats = dec.agg(min($"mean_byte"), max($"mean_byte")).head()
    assert(stats.getDouble(0) > 32.0 && stats.getDouble(1) < 127.0)
    // re-running yields identical rows (determinism)
    val again = Multimodal.decodeFeatures(packed, "doc_id", "blob")
    assert(dec.exceptAll(again).count() == 0 && again.exceptAll(dec).count() == 0)
  }
}

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

  test("frameSample keeps every 2nd fixed-size frame; count and sizes line up") {
    val packed = Multimodal.packMedia(tables.documents, "text", "text/plain")
    val frames = Multimodal.frameSample(packed, "doc_id", "blob", frameBytes = 256, everyN = 2)
    val byDoc = frames.groupBy($"doc_id").count().as[(Long, Long)].collect().toMap
    val want = packed.select($"doc_id", octet_length($"blob").cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
      .map { case (id, n) => id -> (math.ceil(n / 256.0).toLong + 1) / 2 }
    assert(byDoc == want.filter(_._2 > 0))
    // every frame except possibly a doc's last is exactly frameBytes
    val short = frames.filter($"frame_bytes" =!= 256).groupBy($"doc_id").count()
      .as[(Long, Long)].collect()
    assert(short.forall(_._2 <= 1))
  }

  test("batchEmbed: batch size does not change the embeddings (GPU-batch shape)") {
    val packed = Multimodal.packMedia(tables.documents.limit(100), "text", "text/plain")
    def run(bs: Int, parts: Int): Map[Long, Seq[Double]] =
      Multimodal.batchEmbed(packed.repartition(parts), "doc_id", "blob", batchSize = bs)
        .as[(Long, Seq[Double])].collect().toMap
    val a = run(32, 1)
    val b = run(7, 5)
    assert(a.keySet.size == 100)
    assert(a == b) // batching and partitioning are execution details only
    assert(a.values.forall(_.length == 8))
    // the toy model is integer-exact: emb[k] = Σ((byte+k) mod 256), and
    // ASCII bytes + small k never wrap, so consecutive dims differ by
    // exactly n_bytes — the invariant a SQL oracle replays (q194)
    assert(a.values.forall(e => e.forall(v => v == math.rint(v))))
    val nb = packed.select($"doc_id", octet_length($"blob").cast("double"))
      .as[(Long, Double)].collect().toMap
    assert(a.forall { case (id, e) =>
      e.sliding(2).forall(p => p(1) - p(0) == nb(id)) })
  }
}

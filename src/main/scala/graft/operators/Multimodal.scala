package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §7.1 extension surface):
  * image/audio/video payloads as opaque `binary` columns with a typed
  * metadata struct, plus a partition-streaming decode/feature stage.
  *
  * The actual codec libraries are NOT in this environment, so the
  * decode kernel is a clearly-marked deterministic STUB — but the
  * Spark-side plumbing (schema, batched iteration, partition sizing,
  * no driver collect) is real and is what carries over to a cluster
  * with real codecs.
  */
object Multimodal {

  /** Metadata carried beside every media blob. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("n_bytes", LongType),
    StructField("checksum", StringType)))

  /** Pack a text/bytes source column into an opaque media blob + typed
    * metadata (how real pipelines stage raw media into a lakehouse). */
  def packMedia(df: DataFrame, srcCol: String, mime: String): DataFrame = {
    val blob = encode(col(srcCol), "UTF-8")
    df.withColumn("blob", blob)
      .withColumn("media_meta", struct(
        lit(mime).as("mime"),
        octet_length(blob).cast("long").as("n_bytes"),
        md5(blob).as("checksum")))
  }

  /** Pure-expression metadata extraction from a blob — stays in codegen,
    * fully oracle-expressible. */
  def extractMeta(blob: Column): Column = struct(
    octet_length(blob).cast("long").as("n_bytes"),
    md5(blob).as("checksum"),
    // STUB dimensions: derived from payload size the way a real header
    // parse would read width/height — deterministic placeholder.
    (octet_length(blob) % 1024).cast("int").as("width"),
    (octet_length(blob) / 1024 + 1).cast("int").as("height"))

  /** Decoded-feature schema produced by [[decodeFeatures]]. */
  val decodedType: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_byte", DoubleType),
    StructField("frames", IntegerType)))

  /** Frame sampling, expression-level: fixed-size byte frames, keep
    * every `everyN`-th. Pure Catalyst (`sequence`+`explode`+`substring`
    * on binary) — stays in codegen and needs no decode at all, which is
    * exactly how you'd pre-slice video containers before shipping the
    * kept frames to a decode stage. Fan-out is lazy: frames materialize
    * per-row in the generator, never a whole blob's frame list per task.
    */
  def frameSample(df: DataFrame, idCol: String, blobCol: String,
      frameBytes: Int, everyN: Int): DataFrame = {
    val n = octet_length(col(blobCol))
    val nFrames = ceil(n.cast("double") / frameBytes).cast("int")
    val idxs = when(n > 0,
      filter(sequence(lit(0), nFrames - 1), i => i % everyN === 0))
      .otherwise(array().cast("array<int>"))
    df.select(col(idCol), col(blobCol).as("__b"), explode(idxs).as("frame_idx"))
      .withColumn("__frame",
        expr(s"substring(__b, frame_idx * $frameBytes + 1, $frameBytes)"))
      .select(col(idCol),
        col("frame_idx").cast("long").as("frame_idx"),
        octet_length(col("__frame")).cast("long").as("frame_bytes"),
        md5(col("__frame")).as("frame_md5"))
  }

  /** Batched-inference stage shape: blobs are fed to the "model" in
    * fixed-size batches (`it.grouped`), one inference call per batch —
    * the structure of GPU embedding at scale (batch amortizes model
    * call overhead; the iterator never materializes a partition).
    * The model here is a deterministic STUB chosen to be
    * INTEGER-EXACT — emb[k] = Σ_i ((byte_i + k) mod 256), an exact
    * BIGINT-ranged sum per dimension — so the whole batched-inference
    * boundary is replayable by an external SQL oracle bit-for-bit
    * (q194), not just batch-invariance-tested. A real build swaps
    * ONLY the `infer` body. */
  def batchEmbed(df: DataFrame, idCol: String, blobCol: String,
      batchSize: Int = 32, dim: Int = 8): DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    // id passes through untyped and keeps its column name/type — a
    // string or int id is as valid as a long one
    val outType = StructType(Seq(
      df.schema(idCol),
      StructField("embedding", ArrayType(DoubleType))))
    val rdd = df.rdd.mapPartitions { it =>
      // real pipeline: val model = Model.load() — once per partition
      def infer(batch: Seq[(Any, Array[Byte])]): Seq[Row] =
        // ---- STUB model: emb[k] = Σ_i ((byte_i + k) mod 256) — a
        // deterministic, batch-size-invariant, INTEGER-EXACT fake
        // (every value < 2^53, so the doubles are exact and a SQL
        // oracle replays them bit-for-bit) ----
        batch.map { case (id, bytes) =>
          val emb = (1 to dim).map { k =>
            var s = 0L; var i = 0
            while (i < bytes.length) {
              s += ((bytes(i) & 0xff) + k) & 0xff; i += 1
            }
            s.toDouble
          }.toArray
          Row(id, emb)
        }
      it.map(r => (r.get(idIdx), r.getAs[Array[Byte]](blobIdx)))
        .grouped(batchSize).flatMap(infer)
    }
    spark.createDataFrame(rdd, outType)
  }

  /** Partition-streaming decode/feature-extract stage.
    *
    * Shape notes for the real-codec version: the iterator is consumed
    * lazily (one blob in memory at a time per task — no
    * whole-partition materialization), decode state would be allocated
    * once per partition (before the iterator map), and output rows are
    * narrow feature rows, not pixel buffers. That structure is what
    * makes this safe on 100 TB of media.
    */
  def decodeFeatures(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    val rdd = df.rdd.mapPartitions { it =>
      // real pipeline: val codec = Codec.open() — once per partition
      it.map { row =>
        val id = row.getLong(idIdx)
        val bytes = row.getAs[Array[Byte]](blobIdx)
        // ---- STUB decode: deterministic fake in place of image/audio
        // libs unavailable in this container. A real build swaps ONLY
        // this block for e.g. an ImageIO/ffmpeg call.
        val n = bytes.length.toLong
        val width = (n % 1024).toInt
        val height = (n / 1024 + 1).toInt
        var s = 0L; var i = 0
        while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
        val meanByte = if (n == 0) 0.0 else s.toDouble / n
        val frames = (n / 256 + 1).toInt
        // ---- end stub
        Row(id, n, width, height, meanByte, frames)
      }
    }
    spark.createDataFrame(rdd, decodedType)
  }
}

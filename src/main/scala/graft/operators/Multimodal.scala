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

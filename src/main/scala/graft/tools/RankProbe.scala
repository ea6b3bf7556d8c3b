package graft.tools

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

/** Dev-only probe: times rankBy (checkpoint + release) against the
  * leak-variant (persist, never release) to attribute the q17 delta. */
object RankProbe {
  def rankByLeaky(df: DataFrame, keys: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val keyCols = keys.map(col)
    val counts = df.groupBy(keyCols: _*).agg(count(lit(1)).as("__cnt"))
      .orderBy(keyCols.map(_.asc): _*)
    val schema = counts.schema
      .add("rank", LongType, nullable = false)
      .add("dense_rank", LongType, nullable = false)
    val cntIdx = counts.schema.fieldIndex("__cnt")
    val sortedRdd = counts.rdd
    sortedRdd.persist(StorageLevel.MEMORY_AND_DISK)
    val perPart = sortedRdd.mapPartitionsWithIndex { (i, it) =>
      var nKeys = 0L; var nRows = 0L
      it.foreach { r => nKeys += 1; nRows += r.getLong(cntIdx) }
      Iterator((i, nKeys, nRows))
    }.collect().sortBy(_._1)
    val keyOffsets = perPart.map(_._2).scanLeft(0L)(_ + _).init
    val rowOffsets = perPart.map(_._3).scanLeft(0L)(_ + _).init
    val offB = spark.sparkContext.broadcast((keyOffsets, rowOffsets))
    val ranked = sortedRdd.mapPartitionsWithIndex { (i, it) =>
      val (ko, ro) = offB.value
      var localKeys = 0L; var localRows = 0L
      it.map { r =>
        val rank = ro(i) + localRows + 1
        val dense = ko(i) + localKeys + 1
        localKeys += 1; localRows += r.getLong(cntIdx)
        Row.fromSeq(r.toSeq :+ rank :+ dense)
      }
    }
    val rankedKeys = spark.createDataFrame(ranked, schema).drop("__cnt")
    df.join(rankedKeys, keys)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", 32)
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    def time(tag: String)(f: => Long): Unit = {
      (1 to 5).foreach(_ => f) // warm
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[rankprobe] $tag median=${ts(2)}%.3f raw=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    time("current")(graft.operators.Relational.rankBy(orders, Seq("o_totalprice")).count())
    time("leaky  ")(rankByLeaky(orders, Seq("o_totalprice")).count())
    spark.stop()
  }
}

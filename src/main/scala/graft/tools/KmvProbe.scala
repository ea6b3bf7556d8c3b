package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sketches}

/** Measures KMV overlap-estimate error on the real corpus so q168's
  * pinned bounds are MEASURED, not guessed (the q154 recall-floor
  * discipline). Deterministic: every number here is a fixed function
  * of the corpus. Usage: runMain graft.tools.KmvProbe <sfDir> [k] */
object KmvProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val k = args.lift(1).map(_.toInt).getOrElse(1024)
    val spark = graft.core.GraftSession.configure(
      org.apache.spark.sql.SparkSession.builder().master("local[16]")
        .config("spark.sql.shuffle.partitions", 16)
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables(spark, sfDir).documents
    val sh = docs.select(col("source"),
      explode(Dedup.wordShingles(Dedup.tokens(col("text")), 5)).as("g"))
    val a = sh.filter(col("source") =!= "src0").select("g")
    val b = sh.filter(col("source") === "src0").select("g")
    val na = a.distinct().count(); val nb = b.distinct().count()
    val inter = a.distinct().join(b.distinct(), "g").count()
    val uni = na + nb - inter
    val jExact = inter.toDouble / uni
    // sketch path = the codegen shingle kernel (mirrors q168)
    val hs = docs.select(col("source"),
      explode(graft.plans.TextExpressions.shingleHash64(col("text"), 5)).as("h"))
    def sk(df: org.apache.spark.sql.DataFrame) =
      Sketches.kmvPerGroup(df.withColumn("grp", lit("x")), "grp", "h", k)
        .select("sketch").collect()(0).getSeq[Long](0)
    val sa = sk(hs.filter(col("source") =!= "src0"))
    val sb = sk(hs.filter(col("source") === "src0"))
    val estA = Sketches.distinctEstimate(sa, k)
    val estB = Sketches.distinctEstimate(sb, k)
    val estJ = Sketches.jaccardEstimate(sa, sb, k)
    val estI = Sketches.intersectionEstimate(sa, sb, k)
    println(f"[kmv] sf=$sfDir k=$k")
    println(f"[kmv] exact: nA=$na nB=$nb inter=$inter union=$uni J=$jExact%.5f")
    println(f"[kmv] est:   nA=$estA%.1f (err ${math.abs(estA - na) / na}%.4f) " +
      f"nB=$estB%.1f (err ${math.abs(estB - nb) / nb}%.4f)")
    println(f"[kmv] est:   J=$estJ%.5f (absErr ${math.abs(estJ - jExact)}%.5f) " +
      f"inter=$estI%.1f (relErr ${if (inter > 0) math.abs(estI - inter) / inter else 0.0}%.4f)")
    val merged = Sketches.mergeSketches(sa, sb, k)
    val direct = sk(hs)
    println(s"[kmv] mergeLaw=${merged == direct}")
    spark.stop(); sys.exit(0)
  }
}

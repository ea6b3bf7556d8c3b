package graft.operators

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Pig `STREAM A THROUGH 'cmd'` (SURVEY.md §2.7): pipe serialized rows
  * through an external process, one process per partition — the same
  * execution shape as the reference's ExecutableManager (and Hadoop
  * Streaming), rebuilt on `mapPartitions`.
  *
  * Wire format: tab-separated fields in, tab-separated fields out (the
  * reference's PigStreaming default). A writer thread feeds stdin while
  * the task thread consumes stdout, so a command that buffers its whole
  * input (sort, awk END-blocks) cannot deadlock the pipe.
  *
  * Scale notes: one process per PARTITION (not per row); stdin/stdout
  * are streamed, never materialized; a nonzero exit fails the task so
  * Spark's retry machinery applies.
  */
object StreamThrough {

  /** Pig `DEFINE cmd \`script\` SHIP('f')`: distribute local files to
    * every executor before streaming through them. The command resolves
    * shipped files via `{SHIP:name}` placeholders, replaced on the
    * executor with `SparkFiles.get(name)` (the reference ships via the
    * MR distributed cache; Spark's addFile is the same mechanism). */
  def apply(df: DataFrame, command: Seq[String], outputCols: Seq[String],
      ship: Seq[String] = Nil): DataFrame = {
    val spark = df.sparkSession
    ship.foreach(spark.sparkContext.addFile)
    val shipNames = ship.map(p => new java.io.File(p).getName)
    val inWidth = df.schema.length
    val outSchema = StructType(outputCols.map(c => StructField(c, StringType)))
    val rdd = df.rdd.mapPartitions { rows =>
      if (!rows.hasNext) Iterator.empty
      else {
        val resolved = command.map { arg =>
          shipNames.foldLeft(arg)((a, n) =>
            a.replace(s"{SHIP:$n}", org.apache.spark.SparkFiles.get(n)))
        }
        val pb = new ProcessBuilder(resolved: _*)
        pb.redirectErrorStream(false)
        val proc = pb.start()
        // stderr must be drained or a chatty command blocks on a full
        // OS pipe buffer (~64KB) and deadlocks the task; keep a bounded
        // tail for the failure message.
        val errTail = new java.util.concurrent.ConcurrentLinkedDeque[String]()
        val errDrain = new Thread {
          override def run(): Unit = {
            val e = new BufferedReader(
              new InputStreamReader(proc.getErrorStream, StandardCharsets.UTF_8))
            try {
              var line = e.readLine()
              while (line != null) {
                errTail.addLast(line)
                while (errTail.size > 20) errTail.pollFirst()
                line = e.readLine()
              }
            } catch { case _: java.io.IOException => () }
          }
        }
        errDrain.setDaemon(true)
        errDrain.start()
        // if the output iterator is abandoned (limit, task kill), the
        // child must not outlive the task
        Option(org.apache.spark.TaskContext.get()).foreach {
          _.addTaskCompletionListener[Unit] { _ =>
            if (proc.isAlive) proc.destroy()
          }
        }
        val writer = new Thread {
          override def run(): Unit = {
            val w = new BufferedWriter(
              new OutputStreamWriter(proc.getOutputStream, StandardCharsets.UTF_8))
            // a command that exits early (closing its stdin) is reported
            // via the exit code on the reader side, not as writer noise
            try {
              rows.foreach { r =>
                var i = 0
                while (i < inWidth) {
                  if (i > 0) w.write('\t')
                  val v = r.get(i)
                  if (v != null) w.write(v.toString)
                  i += 1
                }
                w.write('\n')
              }
              w.close()
            } catch { case _: java.io.IOException => () }
          }
        }
        writer.setDaemon(true)
        writer.start()
        val out = new BufferedReader(
          new InputStreamReader(proc.getInputStream, StandardCharsets.UTF_8))
        new Iterator[Row] {
          private var nextLine: String = out.readLine()
          def hasNext: Boolean = {
            if (nextLine == null) {
              val code = proc.waitFor()
              if (code != 0) {
                // the process can die before the drain thread has read
                // the buffered (usually most diagnostic) stderr lines
                errDrain.join(2000)
                val tail = {
                  val it = errTail.iterator(); val sb = new StringBuilder
                  while (it.hasNext) { sb.append("\n  stderr> ").append(it.next()) }
                  sb.toString
                }
                throw new RuntimeException(
                  s"STREAM THROUGH ${command.mkString(" ")} exited $code$tail")
              }
            }
            nextLine != null
          }
          def next(): Row = {
            val fields = nextLine.split("\t", -1)
            nextLine = out.readLine()
            Row.fromSeq(outputCols.indices.map(i => if (i < fields.length) fields(i) else null))
          }
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}

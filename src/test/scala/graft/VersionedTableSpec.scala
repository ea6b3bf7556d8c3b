package graft

import org.apache.spark.sql.functions._
import graft.operators.VersionedTable
import graft.operators.VersionedTable.CommitConflict

/** Atomic commit protocol (operators/VersionedTable.scala): the
  * concurrent-writer CAS, time travel, retention, and orphan
  * vacuuming. The load-bearing claim: two interleaved committers →
  * one wins, one loses LOUDLY, and the table is never torn. */
class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def df(tag: String, n: Int) =
    spark.range(n).select($"id".as("k"), lit(tag).as("v"))

  test("commit chain, latest read, and time travel") {
    val dir = java.nio.file.Files.createTempDirectory("vt-chain").toString + "/t"
    assert(VersionedTable.latestVersion(spark, dir) == -1L)
    assert(VersionedTable.commit(spark, dir, df("a", 3), -1L, "w1") == 0L)
    assert(VersionedTable.commit(spark, dir, df("b", 5), 0L, "w1") == 1L)
    assert(VersionedTable.latestVersion(spark, dir) == 1L)
    assert(VersionedTable.read(spark, dir).count() == 5)
    assert(VersionedTable.readVersion(spark, dir, 0L)
      .agg(count(lit(1)), first($"v")).as[(Long, String)].collect()
      .toSeq == Seq((3L, "a")))
    // stale expectedVersion refuses up front
    intercept[CommitConflict] {
      VersionedTable.commit(spark, dir, df("c", 1), 0L, "w1")
    }
  }

  test("two interleaved committers: one wins, one loses loudly, never torn") {
    val dir = java.nio.file.Files.createTempDirectory("vt-race").toString + "/t"
    VersionedTable.commit(spark, dir, df("base", 4), -1L, "w0")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val gate = new java.util.concurrent.CyclicBarrier(2)
    def racer(id: String): Future[Either[Throwable, Long]] = Future {
      gate.await()
      try Right(VersionedTable.commit(spark, dir, df(id, 7), 0L, id))
      catch { case t: Throwable => Left(t) }
    }
    val results = Await.result(
      Future.sequence(Seq(racer("wa"), racer("wb"))), 120.seconds)
    val wins = results.collect { case Right(v) => v }
    val losses = results.collect { case Left(t) => t }
    assert(wins == Seq(1L), s"exactly one racer must win: $results")
    assert(losses.length == 1 && losses.head.isInstanceOf[CommitConflict],
      s"the other racer must lose with CommitConflict: $losses")
    // never torn: the table is exactly the winner's content
    val winner = if (results.head.isRight) "wa" else "wb"
    val got = VersionedTable.read(spark, dir)
    assert(got.count() == 7 && got.select($"v").distinct()
      .as[String].collect().toSeq == Seq(winner))
    // the loser's staging is gone; nothing to vacuum
    assert(VersionedTable.vacuum(spark, dir).isEmpty)
    // the loser's documented recovery: re-read, reconcile, retry
    val retried = VersionedTable.commit(spark, dir, df("retry", 2),
      VersionedTable.latestVersion(spark, dir), "loser")
    assert(retried == 2L && VersionedTable.read(spark, dir).count() == 2)
  }

  test("edges: empty-table reads refuse; an empty DataFrame commits fine") {
    val dir = java.nio.file.Files.createTempDirectory("vt-edge").toString + "/t"
    assert(VersionedTable.versions(spark, dir).isEmpty)
    intercept[IllegalArgumentException] { VersionedTable.read(spark, dir) }
    // an empty snapshot is a legitimate version (a full-delete merge)
    VersionedTable.commit(spark, dir, df("x", 3).filter($"k" < 0), -1L, "w")
    assert(VersionedTable.read(spark, dir).count() == 0)
    VersionedTable.commit(spark, dir, df("y", 2), 0L, "w")
    assert(VersionedTable.read(spark, dir).count() == 2)
    // a far-future expectedVersion is stale too, loudly
    intercept[CommitConflict] {
      VersionedTable.commit(spark, dir, df("z", 1), 9L, "w")
    }
    // schema drift refuses unless made explicit (the Delta contract)
    val drifted = spark.range(2).select($"id".as("k"), lit(7L).as("v"))
    val e = intercept[IllegalArgumentException] {
      VersionedTable.commit(spark, dir, drifted, 1L, "w")
    }
    assert(e.getMessage.contains("allowSchemaChange"))
    assert(VersionedTable.commit(spark, dir, drifted, 1L, "w",
      allowSchemaChange = true) == 2L)
    assert(VersionedTable.read(spark, dir).schema("v").dataType ==
      org.apache.spark.sql.types.LongType)
  }

  test("expire keeps the newest versions; vacuum sweeps crashed-writer orphans") {
    val dir = java.nio.file.Files.createTempDirectory("vt-exp").toString + "/t"
    (0 to 3).foreach(i =>
      VersionedTable.commit(spark, dir, df(s"v$i", i + 1), i - 1L, "w"))
    intercept[IllegalArgumentException] {
      VersionedTable.expire(spark, dir, keep = 1)
    }
    assert(VersionedTable.expire(spark, dir, keep = 2) == Seq(0L, 1L))
    assert(VersionedTable.versions(spark, dir) == Seq(2L, 3L))
    assert(VersionedTable.read(spark, dir).count() == 4)
    intercept[Exception] { VersionedTable.readVersion(spark, dir, 0L).collect() }
    // a crashed writer's staged dir (no manifest references it)
    df("crash", 9).write.parquet(s"$dir/data/v9-crashed")
    assert(VersionedTable.vacuum(spark, dir) == Seq("data/v9-crashed"))
    assert(!new java.io.File(s"$dir/data/v9-crashed").exists())
    assert(VersionedTable.read(spark, dir).count() == 4)
  }
}

package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.fed.Federation
import graft.fed.Federation._

/** Two simulated clusters = two isolated SparkSessions with their own
  * scratch dirs (SURVEY.md §7.2 M6). Verifies: degenerate collapse (no
  * transfers when co-located), cut-edge transfer insertion (smaller
  * side shipped), and end-to-end correctness vs a single-session run. */
class FederationSpec extends SparkSpec {

  private def setup() = {
    val tmp = Files.createTempDirectory("fed").toString
    val sessA = spark.newSession()
    val sessB = spark.newSession()
    // Stage: customers on cluster A, orders on cluster B.
    val custUri = s"$tmp/a/customer"
    val ordUri = s"$tmp/b/orders"
    tables.customer.write.mode("overwrite").parquet(custUri)
    tables.orders.write.mode("overwrite").parquet(ordUri)
    val catalog = new Catalog()
      .register("customer", TableLoc("A", "parquet", custUri))
      .register("orders", TableLoc("B", "parquet", ordUri))
    val clusters = Map(
      "A" -> Cluster("A", sessA, s"$tmp/a/scratch"),
      "B" -> Cluster("B", sessB, s"$tmp/b/scratch"))
    (catalog, clusters)
  }

  test("degenerate case: co-located plan has no transfers") {
    val (catalog, clusters) = setup()
    val p = FedStage(FedScan("customer"), _.filter(col("c_acctbal") > 0), "filter")
    val placement = Federation.plan(p, catalog, clusters)
    assert(placement.transfers.isEmpty)
    assert(placement.assignment(p) == "A")
  }

  test("catalog persistence: a restarted coordinator reloads placements and replicas") {
    val (catalog, clusters) = setup()
    val tmp = Files.createTempDirectory("fed-cat").toString
    val catDir = s"$tmp/catalog"
    // a replica registration must survive the round trip as a REPLICA
    // (order encodes primary-vs-replica — failover burns them in order)
    val custUri2 = s"$tmp/b/customer_replica"
    tables.customer.write.mode("overwrite").parquet(custUri2)
    catalog.registerReplica("customer", TableLoc("B", "parquet", custUri2))
    assert(Federation.saveCatalog(spark, catalog, catDir) == 0L)
    // a second save versions up; a pinned load sees the old version
    val cat2 = Federation.loadCatalog(spark, catDir)
    assert(cat2.names == catalog.names)
    catalog.names.foreach(t =>
      assert(cat2.locations(t) == catalog.locations(t),
        s"locations of $t must round-trip exactly"))
    Federation.saveCatalog(spark, cat2, catDir)
    assert(Federation.catalogVersion(spark, catDir) == 1L)
    assert(Federation.loadCatalog(spark, catDir, version = 0L)
      .locations("customer").length == 2)
    // the restarted coordinator: fresh sessions, loaded catalog — the
    // federated job runs and failover machinery still sees the replica
    val loaded = Federation.loadCatalog(spark, catDir)
    val join = FedBinary(FedScan("customer"), FedScan("orders"),
      (c, o) => c.join(o, c("c_custkey") === o("o_custkey"))
        .groupBy(c("c_mktsegment")).count(), "join")
    val orch = new Orchestrator(loaded, clusters)
    val out = orch.executeWithFailover(join).collect()
    assert(out.length == 5)
    // racing coordinator saves: exactly one wins the version CAS
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val gate = new java.util.concurrent.CyclicBarrier(2)
    def racer(id: String) = Future {
      gate.await()
      try Right(Federation.saveCatalog(spark, loaded, catDir, id,
        expectedVersion = 1L))
      catch { case t: Throwable => Left(t) }
    }
    val rs = Await.result(
      Future.sequence(Seq(racer("c1"), racer("c2"))), 120.seconds)
    assert(rs.count(_.isRight) == 1 &&
      rs.collect { case Left(t) => t }
        .forall(_.isInstanceOf[Federation.CatalogConflict]),
      s"exactly one racing save must win: $rs")
  }

  test("cross-cluster join inserts exactly one transfer, shipping the cheaper side") {
    val (catalog, clusters) = setup()
    val join = FedBinary(FedScan("customer"), FedScan("orders"),
      (c, o) => c.join(o, c("c_custkey") === o("o_custkey")), "join")
    val placement = Federation.plan(join, catalog, clusters)
    assert(placement.transfers.size == 1)
    // customer (150 rows) is cheaper than orders (1500 rows): ships A -> B
    val (label, from, dest) = placement.transfers.head
    assert(label.contains("customer") && from == "A" && dest == "B")
    assert(placement.assignment(join) == "B")
  }

  test("three clusters, chained joins: two transfers, both toward the bigger data") {
    val tmp = Files.createTempDirectory("fed3").toString
    val (custUri, ordUri, liUri) = (s"$tmp/a/customer", s"$tmp/b/orders", s"$tmp/c/lineitem")
    tables.customer.write.mode("overwrite").parquet(custUri)
    tables.orders.write.mode("overwrite").parquet(ordUri)
    tables.lineitem.write.mode("overwrite").parquet(liUri)
    val catalog = new Catalog()
      .register("customer", TableLoc("A", "parquet", custUri))
      .register("orders", TableLoc("B", "parquet", ordUri))
      .register("lineitem", TableLoc("C", "parquet", liUri))
    val clusters = Map(
      "A" -> Cluster("A", spark.newSession(), s"$tmp/a/scratch"),
      "B" -> Cluster("B", spark.newSession(), s"$tmp/b/scratch"),
      "C" -> Cluster("C", spark.newSession(), s"$tmp/c/scratch"))
    val co = FedBinary(FedScan("customer"), FedScan("orders"),
      (c, o) => c.join(o, c("c_custkey") === o("o_custkey")), "cust_orders")
    val root = FedBinary(co, FedScan("lineitem"),
      (coDf, li) => coDf.join(li, coDf("o_orderkey") === li("l_orderkey"))
        .groupBy("c_custkey").agg(count(lit(1)).as("n")), "with_lines")
    val placement = Federation.plan(root, catalog, clusters)
    // customer (smaller) ships A->B; then the join result ships B->C
    // because lineitem is the biggest input
    assert(placement.transfers.map(t => (t._2, t._3)) == Seq(("A", "B"), ("B", "C")))
    assert(placement.assignment(root) == "C")
    val fed = new Orchestrator(catalog, clusters).execute(root)
    val local = tables.customer
      .join(tables.orders, col("c_custkey") === col("o_custkey"))
      .join(tables.lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy("c_custkey").agg(count(lit(1)).as("n"))
    assert(fed.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      local.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("selectivity annotation steers the cut: a filtered big side ships instead") {
    val (catalog, clusters) = setup()
    // orders heavily filtered -> estimated tiny -> it ships to A now
    val join = FedBinary(
      FedScan("customer"),
      FedStage(FedScan("orders"), _.filter(col("o_orderpriority") === "1-URGENT"),
        "urgent_only", selectivity = 0.01),
      (c, o) => c.join(o, c("c_custkey") === o("o_custkey")), "join")
    val placement = Federation.plan(join, catalog, clusters)
    assert(placement.transfers.size == 1)
    val (_, from, dest) = placement.transfers.head
    assert(from == "B" && dest == "A")
  }

  test("federated execution matches a single-session run") {
    val (catalog, clusters) = setup()
    val join = FedBinary(
      FedStage(FedScan("customer"), _.filter(col("c_acctbal") > 1000), "filter_cust"),
      FedScan("orders"),
      (c, o) => c.join(o, c("c_custkey") === o("o_custkey"))
        .groupBy("c_custkey").agg(count(lit(1)).as("n"), sum("o_totalprice").as("spent")),
      "join_agg")
    val fed = new Orchestrator(catalog, clusters).execute(join)
    val local = tables.customer.filter(col("c_acctbal") > 1000)
      .join(tables.orders, col("c_custkey") === col("o_custkey"))
      .groupBy("c_custkey").agg(count(lit(1)).as("n"), sum("o_totalprice").as("spent"))
    val got = fed.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = local.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("compute term steers the cut: a slow destination repels the join") {
    val tmp = Files.createTempDirectory("fedslow").toString
    val (custUri, ordUri) = (s"$tmp/a/customer", s"$tmp/b/orders")
    tables.customer.write.mode("overwrite").parquet(custUri)
    tables.orders.write.mode("overwrite").parquet(ordUri)
    val catalog = new Catalog()
      .register("customer", TableLoc("A", "parquet", custUri))
      .register("orders", TableLoc("B", "parquet", ordUri))
    val join = FedBinary(FedScan("customer"), FedScan("orders"),
      (c, o) => c.join(o, c("c_custkey") === o("o_custkey")), "join")
    // equal speeds: min-transfer wins, small customer ships A -> B
    val even = Federation.plan(join, catalog, Map(
      "A" -> Cluster("A", spark.newSession(), s"$tmp/a/scratch"),
      "B" -> Cluster("B", spark.newSession(), s"$tmp/b/scratch")))
    assert(even.assignment(join) == "B")
    // B overloaded (10x compute): shipping the BIG side to fast A is
    // cheaper than joining on slow B — the paper's load term in action
    val skewed = Federation.plan(join, catalog, Map(
      "A" -> Cluster("A", spark.newSession(), s"$tmp/a/scratch"),
      "B" -> Cluster("B", spark.newSession(), s"$tmp/b/scratch", computeFactor = 10.0)))
    assert(skewed.assignment(join) == "A")
    val (_, from, dest) = skewed.transfers.head
    assert(from == "B" && dest == "A")
    assert(skewed.cost < even.cost * 10, "cost must be priced, not NaN")
  }

  test("network topology: an expensive link reverses the cut decision") {
    val tmp = Files.createTempDirectory("fedlink").toString
    val (custUri, ordUri) = (s"$tmp/a/customer", s"$tmp/b/orders")
    tables.customer.write.mode("overwrite").parquet(custUri)
    tables.orders.write.mode("overwrite").parquet(ordUri)
    val catalog = new Catalog()
      .register("customer", TableLoc("A", "parquet", custUri))
      .register("orders", TableLoc("B", "parquet", ordUri))
    val join = FedBinary(FedScan("customer"), FedScan("orders"),
      (c, o) => c.join(o, c("c_custkey") === o("o_custkey")), "join")
    val clusters = Map(
      "A" -> Cluster("A", spark.newSession(), s"$tmp/a/scratch"),
      "B" -> Cluster("B", spark.newSession(), s"$tmp/b/scratch"))
    // default topology: small customer ships A -> B (baseline behavior)
    val flat = Federation.plan(join, catalog, clusters)
    assert(flat.assignment(join) == "B")
    // A -> B link priced 100x (directional; B -> A stays cheap): the
    // planner must now ship the BIG orders side B -> A instead
    val links: Federation.Links = Map(("A", "B") -> 200.0, ("B", "A") -> 2.0)
    val routed = Federation.plan(join, catalog, clusters, links)
    assert(routed.assignment(join) == "A", routed.toString)
    val (_, from, dest) = routed.transfers.head
    assert(from == "B" && dest == "A")
    // the cost model prices the same topology the greedy decided under
    assert(routed.cost ==
      Federation.assignmentCost(join, routed.assignment, catalog, clusters, links))
    // symmetric fallback: an (A,B)-only entry also prices B -> A
    val sym: Federation.Links = Map(("A", "B") -> 7.0)
    val c1 = Federation.assignmentCost(join, routed.assignment, catalog, clusters, sym)
    val c2 = Federation.assignmentCost(join, routed.assignment, catalog, clusters,
      Map(("B", "A") -> 7.0))
    assert(c1 == c2)
  }

  test("greedy is within 1.5x of exhaustive on a 3-table DAG (paper's comparison)") {
    val tmp = Files.createTempDirectory("fedex").toString
    val (custUri, ordUri, liUri) = (s"$tmp/a/customer", s"$tmp/b/orders", s"$tmp/c/lineitem")
    tables.customer.write.mode("overwrite").parquet(custUri)
    tables.orders.write.mode("overwrite").parquet(ordUri)
    tables.lineitem.write.mode("overwrite").parquet(liUri)
    val catalog = new Catalog()
      .register("customer", TableLoc("A", "parquet", custUri))
      .register("orders", TableLoc("B", "parquet", ordUri))
      .register("lineitem", TableLoc("C", "parquet", liUri))
    val co = FedBinary(FedScan("customer"), FedScan("orders"),
      (c, o) => c.join(o, c("c_custkey") === o("o_custkey")), "cust_orders")
    val root = FedBinary(co, FedScan("lineitem"),
      (coDf, li) => coDf.join(li, coDf("o_orderkey") === li("l_orderkey"))
        .groupBy("c_custkey").agg(count(lit(1)).as("n")), "with_lines")
    // asymmetric speeds: C (biggest data) is ALSO the slowest cluster,
    // so the naive "move toward the big data" answer is not optimal
    for (cFactor <- Seq(1.0, 4.0)) {
      val clusters = Map(
        "A" -> Cluster("A", spark.newSession(), s"$tmp/a/scratch"),
        "B" -> Cluster("B", spark.newSession(), s"$tmp/b/scratch"),
        "C" -> Cluster("C", spark.newSession(), s"$tmp/c/scratch", computeFactor = cFactor))
      val greedy = Federation.plan(root, catalog, clusters)
      val best = Federation.planExhaustive(root, catalog, clusters)
      assert(!greedy.cost.isNaN && !best.cost.isNaN)
      assert(best.cost <= greedy.cost + 1e-6,
        s"exhaustive must lower-bound greedy: best=${best.cost} greedy=${greedy.cost}")
      assert(greedy.cost <= best.cost * 1.5,
        s"cFactor=$cFactor: greedy=${greedy.cost} vs exhaustive=${best.cost}")
      // both placements price identically under the shared cost fn
      assert(math.abs(Federation.assignmentCost(root, greedy.assignment, catalog, clusters)
        - greedy.cost) < 1e-6)
    }
  }

  test("catalyst-derived stage estimates see column pruning; explicit selectivity still wins") {
    val (catalog, clusters) = setup()
    val s = clusters("A").session
    val scanBytes = Federation.estimatedBytes(FedScan("customer"), catalog, s)
    // unannotated narrow projection: Catalyst's stats shrink the
    // estimate by the column ratio — a flat byte heuristic cannot
    val narrow = FedStage(FedScan("customer"), _.select(col("c_custkey")), "narrow")
    val narrowBytes = Federation.estimatedBytes(narrow, catalog, s)
    assert(narrowBytes < scanBytes, s"narrow=$narrowBytes scan=$scanBytes")
    // caller annotation overrides: a claimed 1% filter beats any
    // size-only propagation (which cannot model runtime selectivity)
    val annotated = FedStage(FedScan("customer"),
      _.filter(col("c_acctbal") > 9999), "rare", selectivity = 0.01)
    val annotatedBytes = Federation.estimatedBytes(annotated, catalog, s)
    assert(annotatedBytes <= scanBytes / 50)
    // an INNER explicit annotation survives an unannotated outer stage:
    // the outer stage applies its own (Catalyst/default) ratio to the
    // inner estimate rather than re-estimating the whole subtree
    val wrapped = FedStage(annotated, _.select(col("c_custkey")), "outer_proj")
    val wrappedBytes = Federation.estimatedBytes(wrapped, catalog, s)
    assert(wrappedBytes <= annotatedBytes,
      s"inner 1% annotation discarded: wrapped=$wrappedBytes inner=$annotatedBytes")
  }

  // ---- fault paths (r9: VERDICT #6 — orchestrator behavior when a
  // stage dies mid-plan) -------------------------------------------------

  private def crossJoinPlan(shipSideStage: Option[org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame] = None) = {
    val custSide: FedPlan = shipSideStage match {
      case Some(f) => FedStage(FedScan("customer"), f, "flaky_stage")
      case None => FedScan("customer")
    }
    FedBinary(custSide, FedScan("orders"),
      (c, o) => c.join(o, c("c_custkey") === o("o_custkey"))
        .groupBy("c_custkey").agg(count(lit(1)).as("n")), "join")
  }

  test("mid-transfer failure: retry re-ships to a fresh path, no partial dir survives") {
    val (catalog, clusters) = setup()
    FederationFlaky.counter.set(0)
    // the flaky map executes DURING the cut-edge write (that is where
    // the shipped subplan runs); first invocation kills the first write
    val flaky = udf((x: Long) => {
      if (FederationFlaky.counter.incrementAndGet() == 1)
        throw new RuntimeException("injected mid-transfer failure")
      x
    })
    val plan = crossJoinPlan(Some(df =>
      df.coalesce(1).withColumn("c_custkey", flaky(col("c_custkey")))))
    val orch = new Orchestrator(catalog, clusters, maxRetries = 2)
    val got = orch.execute(plan).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = tables.customer.join(tables.orders, col("c_custkey") === col("o_custkey"))
      .groupBy("c_custkey").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && got.nonEmpty)
    assert(FederationFlaky.counter.get() > 1, "the failure was never injected")
    // exactly the successful transfer dirs remain in scratch — the
    // failed partial write was deleted before the retry
    val scratch = new java.io.File(clusters("B").scratchUri)
    val dirs = Option(scratch.listFiles()).getOrElse(Array.empty).map(_.toString).toSet
    assert(dirs == orch.stagedPaths.toSet,
      s"partial staging garbage: on disk $dirs vs staged ${orch.stagedPaths}")
  }

  test("dead destination: abort names the stage and cluster; healthy re-run is clean") {
    val (catalog, clusters) = setup()
    // make cluster B's scratch unwritable: its parent is a plain FILE
    val tmp = Files.createTempDirectory("feddead").toString
    Files.writeString(java.nio.file.Paths.get(s"$tmp/blocker"), "not a dir")
    val broken = clusters.updated("B",
      clusters("B").copy(scratchUri = s"$tmp/blocker/scratch"))
    val plan1 = crossJoinPlan()
    val e = intercept[RuntimeException] {
      new Orchestrator(catalog, broken, maxRetries = 1).execute(plan1).collect()
    }
    assert(e.getMessage.contains("join on cluster B"), e.getMessage)
    assert(e.getCause != null, "abort must carry the underlying cause")
    // identical plan on a healthy orchestrator: idempotent re-run
    val orch = new Orchestrator(catalog, clusters)
    val got = orch.execute(crossJoinPlan()).count()
    assert(got > 0)
  }

  test("cleanupStaged removes every transfer dir once the result is consumed") {
    val (catalog, clusters) = setup()
    val orch = new Orchestrator(catalog, clusters)
    val n1 = orch.execute(crossJoinPlan()).count()
    val n2 = orch.execute(crossJoinPlan()).count() // re-run: fresh unique paths
    assert(n1 == n2 && n1 > 0)
    val paths = orch.stagedPaths
    assert(paths.size == 2 && paths.toSet.size == 2, s"paths=$paths")
    paths.foreach(p => assert(new java.io.File(p).exists(), s"missing staged dir $p"))
    orch.cleanupStaged()
    paths.foreach(p => assert(!new java.io.File(p).exists(), s"staged dir survived $p"))
    assert(orch.stagedPaths.isEmpty)
  }

  test("Spark Connect substrate: clusters behind sc:// URIs run the same plan to the same answer") {
    // SURVEY §3.2/§7.4 full case: an in-process Connect SERVER stands
    // in for each physical cluster's endpoint; the orchestrator talks
    // ONLY gRPC — reads, stage lambdas, cut-edge parquet writes all
    // cross the wire protocol a production deployment would use.
    val port = Federation.ensureConnectServer(spark)
    val tmp = Files.createTempDirectory("fed_connect").toString
    val custUri = s"$tmp/a/customer"
    val ordUri = s"$tmp/b/orders"
    tables.customer.write.mode("overwrite").parquet(custUri)
    tables.orders.write.mode("overwrite").parquet(ordUri)
    val catalog = new Catalog()
      .register("customer", TableLoc("A", "parquet", custUri))
      .register("orders", TableLoc("B", "parquet", ordUri))
    val clusters = Map(
      "A" -> Federation.connectCluster("A", s"sc://localhost:$port", s"$tmp/a/scratch"),
      "B" -> Federation.connectCluster("B", s"sc://localhost:$port", s"$tmp/b/scratch"))
    try {
      // session isolation sanity: a temp view on A is invisible on B
      clusters("A").session.range(3).createOrReplaceTempView("fed_conn_probe")
      assert(clusters("A").session.catalog.tableExists("fed_conn_probe"))
      assert(!clusters("B").session.catalog.tableExists("fed_conn_probe"))
      val join = FedBinary(
        FedStage(FedScan("customer"), _.filter(col("c_acctbal") > 1000), "filter_cust"),
        FedScan("orders"),
        (c, o) => c.join(o, c("c_custkey") === o("o_custkey"))
          .groupBy("c_custkey").agg(count(lit(1)).as("n"), sum("o_totalprice").as("spent")),
        "join_agg")
      val orch = new Orchestrator(catalog, clusters)
      val placement = orch.executionReport(join)
      assert(placement.transfers.nonEmpty, "cross-cluster plan must cut somewhere")
      val fed = orch.execute(join)
      val got = fed.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val local = tables.customer.filter(col("c_acctbal") > 1000)
        .join(tables.orders, col("c_custkey") === col("o_custkey"))
        .groupBy("c_custkey").agg(count(lit(1)).as("n"), sum("o_totalprice").as("spent"))
      val want = local.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == want)
      assert(got.nonEmpty)
      // cut-edge dirs were staged over gRPC and cleanupStaged's
      // driver-side fallback (connect clients have no sparkContext)
      // removes them
      val stagedDirs = orch.stagedPaths
      assert(stagedDirs.nonEmpty)
      orch.cleanupStaged()
      stagedDirs.foreach(p =>
        assert(!new java.io.File(p).exists(), s"staged dir survived cleanup: $p"))
    } finally {
      Federation.closeClusterSessions(clusters)
      Federation.stopConnectServer() // non-daemon gRPC threads
    }
  }

  test("lost Connect cluster MID-JOB: failover re-plans on survivors; data loss stays loud") {
    // r10 VERDICT #5: not just a failed transfer — the cluster itself
    // goes away (its Connect session is closed mid-execution, so every
    // subsequent RPC dies) while the job is running.
    val port = Federation.ensureConnectServer(spark)
    val tmp = Files.createTempDirectory("fed_lost").toString
    tables.customer.write.mode("overwrite").parquet(s"$tmp/a/customer")
    tables.orders.write.mode("overwrite").parquet(s"$tmp/b/orders")
    tables.orders.write.mode("overwrite").parquet(s"$tmp/a/orders_replica")
    // part 1: orders' PRIMARY is on B, its replica on A — losing B is
    // recoverable by re-resolving the scan to the surviving replica
    tables.nation.write.mode("overwrite").parquet(s"$tmp/a/nation")
    val catalog = new Catalog()
      .register("customer", TableLoc("A", "parquet", s"$tmp/a/customer"))
      .register("orders", TableLoc("B", "parquet", s"$tmp/b/orders"))
      .registerReplica("orders", TableLoc("A", "parquet", s"$tmp/a/orders_replica"))
      // registered but NOT scanned by the failing plan: failover must
      // keep them resolvable (nation) / remembered as lost (region)
      .register("nation", TableLoc("A", "parquet", s"$tmp/a/nation"))
      .register("region", TableLoc("B", "parquet", s"$tmp/b/region_only_on_b"))
    val clusters = Map(
      "A" -> Federation.connectCluster("A", s"sc://localhost:$port",
        s"$tmp/a/scratch", computeFactor = 4.0, failFast = true),
      "B" -> Federation.connectCluster("B", s"sc://localhost:$port",
        s"$tmp/b/scratch", computeFactor = 0.25, failFast = true))
    try {
      FederationLostCluster.killed.set(false)
      val killMidJob: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
        df => {
          // first execution kills B WHILE the job is in flight; the
          // failover re-run must pass through untouched
          if (FederationLostCluster.killed.compareAndSet(false, true))
            clusters("B").session match {
              case cs: org.apache.spark.sql.connect.SparkSession => cs.close()
              case _ => ()
            }
          df.filter(col("c_acctbal") > 1000)
        }
      val join = FedBinary(
        FedStage(FedScan("customer"), killMidJob, "kill_then_filter"),
        FedScan("orders"),
        (c, o) => c.join(o, c("c_custkey") === o("o_custkey"))
          .groupBy("c_custkey").agg(count(lit(1)).as("n")), "join")
      val orch = new Orchestrator(catalog, clusters, maxRetries = 1)
      // the planner must have put work on B (orders' primary host) for
      // the kill to be mid-job, not a no-op
      assert(orch.executionReport(join).assignment.values.toSet.contains("B"))
      val got = orch.executeWithFailover(join).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = tables.customer.filter(col("c_acctbal") > 1000)
        .join(tables.orders, col("c_custkey") === col("o_custkey"))
        .groupBy("c_custkey").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(FederationLostCluster.killed.get(), "the kill never fired")
      assert(got == want && got.nonEmpty)
      assert(orch.liveClusters == Set("A"), "B must be marked lost")
      // the failover run resolved orders to the A-side replica
      assert(orch.executionReport(join).assignment.values.toSet == Set("A"))
      // the aborted first attempt left no staging garbage anywhere
      val bScratch = Option(new java.io.File(s"$tmp/b/scratch").listFiles())
        .getOrElse(Array.empty)
      assert(bScratch.isEmpty, s"staged garbage after abort: ${bScratch.toSeq}")
      // failover kept the FULL catalog: a table the failed plan never
      // scanned still resolves and executes on the survivor...
      val nGot = orch.execute(FedStage(FedScan("nation"),
        df => df.groupBy().agg(count(lit(1)).as("n")), "count_nation"))
        .collect()(0).getLong(0)
      assert(nGot == tables.nation.count(), "post-failover scan of an " +
        "unrelated registered table must still work")
      // ...and a table whose every copy was lost fails with the real
      // story when finally scanned, not 'unknown table'
      val eLost = intercept[RuntimeException] {
        orch.execute(FedScan("region"))
      }
      assert(eLost.getMessage.contains("became unavailable"), eLost.getMessage)
    } finally Federation.closeClusterSessions(clusters)
    // part 2: the lost cluster HOSTS a required table -> loud refusal
    tables.orders.limit(10).write.mode("overwrite").parquet(s"$tmp/b/orders")
    val catalog2 = new Catalog()
      .register("customer", TableLoc("A", "parquet", s"$tmp/a/customer"))
      .register("orders", TableLoc("B", "parquet", s"$tmp/b/orders"))
    val clusters2 = Map(
      "A" -> Federation.connectCluster("A", s"sc://localhost:$port",
        s"$tmp/a2/scratch", failFast = true),
      "B" -> Federation.connectCluster("B", s"sc://localhost:$port",
        s"$tmp/b2/scratch", failFast = true))
    try {
      clusters2("B").session match {
        case cs: org.apache.spark.sql.connect.SparkSession => cs.close()
        case _ => ()
      }
      val plan2 = FedBinary(FedScan("customer"), FedScan("orders"),
        (c, o) => c.join(o, c("c_custkey") === o("o_custkey")), "join2")
      val e = intercept[RuntimeException] {
        new Orchestrator(catalog2, clusters2, maxRetries = 0)
          .executeWithFailover(plan2).collect()
      }
      assert(e.getMessage.contains("no surviving copy"), e.getMessage)
    } finally {
      Federation.closeClusterSessions(clusters2)
      Federation.stopConnectServer() // non-daemon gRPC threads
    }
  }

  test("versioned table across failover: the replica serves the SAME pinned snapshot") {
    // Federation × lakehouse (r13 next-round #9): a VERSIONED table's
    // scan pins the source version it first resolved; the primary dies
    // MID-JOB while the source advances AND the replica syncs the new
    // state — failover must serve the replica's version matching the
    // PIN (snapshot isolation across failover), not the replica's
    // latest, located via the ReplicaSrcKey identity.
    import graft.operators.VersionedTable
    val port = Federation.ensureConnectServer(spark)
    val tmp = Files.createTempDirectory("fed_vt").toString
    val src = s"$tmp/b/vt"; val rep = s"$tmp/a/vt_replica"
    VersionedTable.commit(spark, src,
      spark.range(2000).select(col("id").as("k"), (col("id") * 3).as("v")),
      -1L, "w", clusterBy = Seq("k"), clusterFiles = 4)
    VersionedTable.merge(spark, src,
      spark.range(50).select(col("id").as("k"), lit(-1L).as("v")),
      Seq("k"), 0L, "w")
    VersionedTable.replicate(spark, src, rep) // replica holds src v1
    val catalog = new Catalog()
      .register("vt", TableLoc("B", Federation.VersionedFormat, src))
      .registerReplica("vt", TableLoc("A", Federation.VersionedFormat, rep))
    val clusters = Map(
      "A" -> Federation.connectCluster("A", s"sc://localhost:$port",
        s"$tmp/a/scratch", failFast = true),
      "B" -> Federation.connectCluster("B", s"sc://localhost:$port",
        s"$tmp/b/scratch", failFast = true))
    try {
      val killed = new java.util.concurrent.atomic.AtomicBoolean(false)
      val plan = FedStage(FedScan("vt"), df => {
        if (killed.compareAndSet(false, true)) {
          // the world moves while the job is in flight: the source
          // commits v2, the replica syncs it — and the primary dies
          VersionedTable.merge(spark, src,
            spark.range(50).select(col("id").as("k"), lit(-2L).as("v")),
            Seq("k"), 1L, "w")
          VersionedTable.replicate(spark, src, rep)
          clusters("B").session match {
            case cs: org.apache.spark.sql.connect.SparkSession => cs.close()
            case _ => ()
          }
        }
        df.filter(col("k") >= 0)
      }, "filter_vt")
      val orch = new Orchestrator(catalog, clusters, maxRetries = 0)
      val out = orch.executeWithFailover(plan)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(orch.pinnedSnapshot("vt").contains(1L),
        s"the scan must pin the source version it first resolved: " +
          s"${orch.pinnedSnapshot("vt")}")
      val want = VersionedTable.readVersion(spark, src, 1L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(out == want, "failover must serve the PINNED snapshot")
      assert(out.count(_._2 == -1L) == 50 && !out.exists(_._2 == -2L),
        "the replica's newer state (src v2) must NOT leak into the " +
          "pinned read")
      // and the replica genuinely holds BOTH snapshots, newest last
      assert(VersionedTable.readManifest(spark, rep,
        VersionedTable.latestVersion(spark, rep))
        .meta.get(VersionedTable.ReplicaSrcKey).contains("2"))
    } finally {
      Federation.closeClusterSessions(clusters)
      Federation.stopConnectServer() // non-daemon gRPC threads
    }
  }
}

/** Top-level so the UDF closure never captures the spec instance. */
object FederationFlaky {
  val counter = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** Mid-job cluster-kill latch (top-level: no spec-instance capture). */
object FederationLostCluster {
  val killed = new java.util.concurrent.atomic.AtomicBoolean(false)
}

package graft.operators

import graft.core.GraftSession.Materialize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-analysis ranking (SURVEY.md §7.1 extension surface): PageRank
  * (Page et al. 1999) over an edge table, as web-crawl curation uses it
  * — a host-authority prior for URL/domain quality filtering (the
  * Common Crawl host-rank idiom).
  *
  * Fixed-point arithmetic, not floats: ranks are BIGINTs scaled by
  * `scale`, contributions use integer division, damping is the exact
  * rational dampNum/dampDen. Every step is therefore deterministic
  * under any partitioning AND replayable by an external SQL engine —
  * the differential oracle recomputes all iterations hash-exact, which
  * a float formulation (order-dependent sums) could never support. The
  * deliberate cost: each division truncates toward zero, so ranks are
  * a deterministic floor of the real-valued iteration — fine for a
  * ranking prior, where only the order matters.
  *
  * Scale shape (100 TB of edges): one iteration = join(ranks, edges)
  * on src + groupBy(dst) SUM — two shuffles over the EDGE table, with
  * map-side partial sums on the dst aggregation (a hub page's million
  * in-links combine per-task before shuffling). Ranks/degrees are
  * node-sized. Each iteration is materialized (GraftSession.materialize) so the
  * plan stays iteration-sized instead of growing a join tree `iters`
  * deep — the standard Pregel-style practice. Repartition edges by src
  * once up front and every iteration's probe side arrives pre-shuffled.
  *
  * Overflow bound: total rank mass stays ≤ nodes × scale (damping only
  * shrinks it), so SUM of in-contributions × dampNum fits a long while
  * nodes × scale × dampNum < 2^63 — require'd below.
  */
object Graph {

  /** `iters` damped PageRank iterations over distinct directed edges.
    * Input: any DataFrame with src/dst columns (cast to string
    * internally so heterogeneous id spaces can be prefixed by the
    * caller). Output: (node STRING, rank BIGINT) for every node
    * appearing as src or dst; initial rank = scale ("1.0 per node",
    * unnormalized convention). Dangling nodes (in-degree only) keep
    * receiving mass; their out-mass leaks, as in the uniform-teleport
    * formulation without dangling redistribution.
    *
    * `scale = 0` (the default) auto-derives the largest safe power of
    * ten for the graph's node count, capped at 1e12 — so small graphs
    * keep the historical 1e12 precision bit-for-bit while web-scale
    * node counts no longer trip the overflow refusal (a 10^6-node
    * graph gets 1e11, a 10^9-node graph 1e8). Powers of ten keep the
    * differential oracle replayable. An explicit scale is honored
    * as-is and still overflow-require'd.
    */
  def pageRank(edgesIn: DataFrame, srcCol: String, dstCol: String,
      iters: Int, scale: Long = 0L,
      dampNum: Long = 85, dampDen: Long = 100): DataFrame = {
    require(iters >= 1, "at least one iteration")
    require(dampNum > 0 && dampNum < dampDen, "damping must be in (0,1)")
    require(scale >= 0, s"scale must be positive (or 0 = auto), got $scale")
    // materialize the derived graph ONCE: edges may come from an
    // arbitrary upstream dataflow (a join, a dedup, …) and every
    // iteration reads them — without a persist the whole lineage
    // re-executes per iteration (measured 71 s -> 4 s at sf0.1).
    // Safe to unpersist before returning: the final ranks are an eager
    // materialize, so nothing downstream re-reads these.
    // Pre-SHUFFLE the cached edges onto the iteration join's own key:
    // the per-iteration `edges ⋈ contributions` requires hash
    // distribution on s, and a cache whose outputPartitioning already
    // satisfies it ships ZERO edge bytes per iteration — only the
    // (node-sized) contribution side reshuffles. Without this, every
    // one of the `iters` iterations re-exchanged the FULL edge set
    // (the big side at web scale: edges >> nodes).
    // ONE exchange builds the cache: repartition by s, then dedupe —
    // hash(s) satisfies the (s, d) clustering the dedup aggregate
    // requires (same s ⇒ same partition), so no second shuffle is
    // inserted and the cached outputPartitioning stays hash(s). The
    // previous `distinct().repartition(s)` paid a full (s, d) exchange
    // of the raw edge stream and then re-exchanged it all by s.
    val edges = edgesIn
      .select(col(srcCol).cast("string").as("s"), col(dstCol).cast("string").as("d"))
      .filter(col("s").isNotNull && col("d").isNotNull)
      .repartition(col("s")).dropDuplicates(Seq("s", "d")).persist()
    val nodes = edges.select(col("s").as("node"))
      .union(edges.select(col("d").as("node"))).distinct().persist()
    val nNodes = nodes.count()
    require(nNodes > 0, "empty graph")
    val sc = if (scale > 0) scale else {
      var s = 1000000000000L
      while (s > 1 && BigInt(nNodes) * s * dampNum >= BigInt(Long.MaxValue)) s /= 10
      require(s >= 100,
        s"pageRank: $nNodes nodes leave under 2 decimal digits of fixed-point " +
          "precision in a long rank; shard the graph or lower dampDen")
      s
    }
    require(BigInt(nNodes) * sc * dampNum < BigInt(Long.MaxValue),
      s"rank mass may overflow a long: nodes=$nNodes scale=$sc damp=$dampNum")
    // The out-degree rides INSIDE the rank state (node, dg, rank):
    // each iteration then needs exactly ONE edge-sized join (edges ⋈
    // per-node contributions) and ONE node-sized join (node set ⋈
    // aggregated in-mass) — the r17 shape pushed the edge-sized
    // intermediate through a second join just to attach the per-NODE
    // divisor, and attaching deg per iteration instead of carrying it
    // re-joined two node-sized tables every round. dg is null for
    // dangling (in-degree-only) nodes, which contribute no out-mass —
    // the same rows the old inner join with deg dropped.
    // alias both sides: nodes and deg share the edge lineage, and
    // dataset-reference conditions trip Spark's ambiguous-self-join
    // check there (the Incremental.pitJoin note)
    val nodesDeg = nodes.alias("__pr_n")
      .join(edges.groupBy(col("s")).agg(count(lit(1)).as("dg")).alias("__pr_d"),
        col("__pr_n.node") === col("__pr_d.s"), "left")
      .select(col("__pr_n.node").as("node"), col("__pr_d.dg").as("dg"))
      .persist()
    val teleport = (sc * (dampDen - dampNum)) / dampDen
    var ranks = nodesDeg.withColumn("rank", lit(sc))
    try {
      for (_ <- 1 to iters) {
        val outContrib = ranks.filter(col("dg").isNotNull)
          .select(col("node").as("s"), expr("`rank` div dg").as("c"))
        val contribs = edges.join(outContrib, "s")
          .select(col("d").as("node"), col("c"))
          .groupBy("node").agg(sum(col("c")).as("in_mass"))
        ranks = nodesDeg.join(contribs, Seq("node"), "left")
          .select(col("node"), col("dg"),
            (lit(teleport) +
              expr(s"($dampNum * coalesce(in_mass, 0L)) div $dampDen")).as("rank"))
          .materialized()
      }
      ranks.select(col("node"), col("rank"))
    } finally {
      edges.unpersist(); nodes.unpersist(); nodesDeg.unpersist()
    }
  }
}

package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import Det._

/** Dedup clustering — the step AFTER pair generation that an actual
  * dedup pipeline needs: near-dup pairs only say "a ~ b"; deduping the
  * corpus requires the transitive closure (connected components), one
  * canonical representative per component, and a keep/drop decision
  * per document.
  *
  * Components via min-label propagation, the standard shuffle-bounded
  * Spark shape (GraphX's CC without the RDD detour):
  *
  *   l(x) <- min(l(x), min_{y ~ x} l(y))   until fixpoint
  *
  * Each round is one equi-join (labels onto directed edges) + one
  * min-aggregate — both shuffle on node id, both partial-aggregated
  * map-side. Rounds needed = component diameter, which for near-dup
  * clusters (quasi-cliques around a template) is 1-3; a hard cap with
  * a convergence assertion guards pathological chains. Per round the
  * label frame is localCheckpoint'ed: the plan would otherwise nest
  * one join deeper per round and codegen/optimizer cost would grow
  * with iteration count rather than data size (at production scale
  * use a checkpoint dir instead of executor-local blocks).
  *
  * The oracle reproduces the closure with a recursive CTE (DuckDB
  * propagates labels along edges to saturation, then min per node) —
  * so the whole pairs -> components -> representative pipeline is
  * hash-checked, not just the pair stage.
  */
object Clusters {

  private val MaxRounds = 20

  /** init: (doc_id, rep_id) seed labels — pass doc_id as its own seed
    * for plain min-id components, or a precomputed seed to run the
    * propagation in a compressed node space (xd5 seeds each
    * distinct-set GROUP with its min member doc so the component
    * minimum is still a document id). edges: undirected
    * (doc_a, doc_b) pairs over the same node space. Returns
    * (doc_id, rep_id) at fixpoint: rep_id = min seed reachable.
    */
  private[queries] def components(init: DataFrame, edges: DataFrame): DataFrame = {
    // NOTE (measured, not kept): pre-partitioning dir by src to let
    // the per-round join elide its exchange read 8.0 s vs 4.6 s —
    // AQE's coalesced exchanges beat the pinned layout here, so the
    // plain persist stands.
    val dir = edges.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(edges.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist()
    var lbl = init.select(col("doc_id"), col("rep_id"))
      .localCheckpoint(true)
    // Convergence via a monotone checksum: labels can only DECREASE
    // (min-fold), so Σ rep_id strictly shrinks every round that moved
    // any label — equal sums mean fixpoint. One tiny scan over the
    // freshly checkpointed labels instead of a join-and-compare
    // against the previous round.
    def checksum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("rep_id").cast("decimal(38,0)"))).head.getDecimal(0)
    var prev = checksum(lbl)
    var round = 0
    var converged = false
    while (!converged && round < MaxRounds) {
      val prop = dir.join(lbl, col("src") === col("doc_id"))
        .select(col("dst").as("doc_id"), col("rep_id"))
      val next = lbl.unionByName(prop)
        .groupBy("doc_id")
        .agg(min(col("rep_id")).as("rep_id"))
        .localCheckpoint(true)
      val cur = checksum(next)
      lbl.unpersist()
      lbl = next
      converged = cur.compareTo(prev) == 0
      prev = cur
      round += 1
    }
    dir.unpersist()
    assert(converged, s"label propagation did not converge in $MaxRounds rounds")
    if (sys.env.contains("GRAFT_DEBUG_ROUNDS"))
      System.err.println(s"[components] converged in $round rounds")
    lbl
  }

  /** Near-dup clusters over token-set Jaccard >= 0.8 pairs: every doc
    * with its canonical representative (min doc_id of its component),
    * component size, and the keep/drop decision a dedup pass would
    * apply.
    *
    * The propagation runs in the COMPRESSED node space of distinct
    * token-set groups (identical sets are J=1 neighbors by definition,
    * so a group is always wholly inside one component): nodes = groups
    * seeded with their min member doc_id, edges = exact group-level
    * J >= 0.8 (vocabulary-gated — popcount masks when |vocab| <= 64,
    * token co-occurrence otherwise). Member doc-ids rejoin only after
    * the fixpoint, so the iteration never touches per-document rows —
    * on dup-heavy corpora that is the difference between iterating
    * over |distinct sets| and |corpus|.
    */
  val xd5 = GQuery(
    "xd5_dedup_clusters",
    (s, d) => reap {
      val c = Ctx(s, d)
      val groups = Dedup.setGroups(c.documents)
      val edges = Dedup.groupEdgesGated(groups, 0.8)
        .select(col("gid_a").as("doc_a"), col("gid_b").as("doc_b"))
      val init = groups.select(col("gid").as("doc_id"),
        expr("ids[0]").as("rep_id")) // ids sorted: [0] is the min member
      val lbl = components(init, edges)
        .select(col("doc_id").as("gid"), col("rep_id"))
      val byDoc = groups.select(col("gid"), explode(col("ids")).as("doc_id"))
        .join(Scale.maybeBroadcast(lbl), "gid")
      val sizes = byDoc.groupBy("rep_id").agg(count(lit(1)).as("cluster_size"))
      canon(byDoc.join(Scale.maybeBroadcast(sizes), "rep_id")
        .select(col("doc_id"), col("rep_id"), col("cluster_size"),
          (col("doc_id") === col("rep_id")).as("keep")))
    },
    Some(
      // NOTE: the recursive closure is quadratic in component size and
      // DuckDB 1.0 has no keyed recursion — fine at the sf0.01
      // correctness gate, hopeless at sf0.1 (tools/duckbench.py skips
      // it; the Spark side converges in diameter rounds regardless).
      """WITH RECURSIVE tok AS (
        |  SELECT DISTINCT doc_id, t.token FROM documents,
        |    UNNEST(list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')) AS t(token)),
        |sz AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY 1),
        |pr AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS inter
        |  FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |edge AS (
        |  SELECT da, db FROM pr JOIN sz sa ON pr.da = sa.doc_id JOIN sz sb ON pr.db = sb.doc_id
        |  WHERE inter / (sa.sz + sb.sz - inter) >= 0.8),
        |dir AS (SELECT da AS src, db AS dst FROM edge
        |        UNION ALL SELECT db, da FROM edge),
        |walk AS (
        |  SELECT doc_id, doc_id AS lbl FROM documents
        |  UNION
        |  SELECT dir.dst AS doc_id, walk.lbl
        |  FROM walk JOIN dir ON dir.src = walk.doc_id),
        |comp AS (SELECT doc_id, MIN(lbl) AS rep_id FROM walk GROUP BY doc_id),
        |sizes AS (SELECT rep_id, COUNT(*) AS cluster_size FROM comp GROUP BY rep_id)
        |SELECT c.doc_id AS doc_id, c.rep_id AS rep_id,
        |  s.cluster_size AS cluster_size, c.doc_id = c.rep_id AS keep
        |FROM comp c JOIN sizes s ON c.rep_id = s.rep_id""".stripMargin +
        orderAll("doc_id")))

  /** Semantic dedup clusters — xd5's shape for the EMBEDDING space:
    * connected components over xd7's IVF-blocked cos ≥ 0.45 pairs,
    * one representative (min vec_id) per component, keep/drop per
    * vector. Completes the embedding-dedup pipeline the way xd5
    * completes the token-set one: pairs alone don't dedup a corpus —
    * the transitive closure does. Same min-label propagation, same
    * convergence guard; edges come from the blocked candidate path,
    * so the whole pipeline (cells → co-probe pairs → exact verify →
    * closure) is the shape that runs at 100 TB. ⊘ rows-only:
    * ClustersSpec proves it equal to the closure over xd4's exact
    * all-pairs edges (xd7's measured recall is 1.0 on this corpus).
    */
  val xd8 = GQuery(
    "xd8_semantic_clusters",
    (s, d) => reap {
      val c = Ctx(s, d)
      // propagate only over the CONNECTED subgraph (edge endpoints):
      // singletons — the overwhelming majority of a deduped corpus —
      // never enter the iteration and rejoin as their own reps after
      // the fixpoint. At 100 TB the iterated frame is sized by the
      // near-dup population, not the corpus.
      val pairs = own(Similarity.ivfPairs(s, d, 0.45)
        .select("doc_a", "doc_b").persist())
      val endpoints = pairs.select(col("doc_a").as("doc_id"))
        .unionByName(pairs.select(col("doc_b").as("doc_id")))
        .distinct()
      val init = endpoints.select(col("doc_id"), col("doc_id").as("rep_id"))
      val lbl = components(init, pairs)
        .select(col("doc_id").as("vec_id"), col("rep_id"))
      val all = c.embeddings.select(col("vec_id"))
        .join(Scale.maybeBroadcast(lbl), Seq("vec_id"), "left")
        .select(col("vec_id").as("doc_id"),
          coalesce(col("rep_id"), col("vec_id")).as("rep_id"))
      val sizes = all.groupBy("rep_id").agg(count(lit(1)).as("cluster_size"))
      canon(all.join(Scale.maybeBroadcast(sizes), "rep_id")
        .select(col("doc_id"), col("rep_id"), col("cluster_size"),
          (col("doc_id") === col("rep_id")).as("keep")))
    },
    None)

  def queries: Seq[GQuery] = Seq(xd5, xd8)
}

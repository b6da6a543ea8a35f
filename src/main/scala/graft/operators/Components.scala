package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the clustering step after
  * near-duplicate PAIR detection: a training-data pipeline keeps one
  * representative per duplicate CLUSTER, and pairs alone under-remove
  * (a≈b, b≈c ⇒ {a,b,c} is one cluster even when a≉c directly).
  *
  * Min-label propagation with pointer jumping: each round every node takes
  * the minimum label among itself and its neighbors, then compresses one
  * pointer hop (label := label(label)) — the classic Hash-to-Min shape,
  * converging in O(log diameter) rounds instead of O(diameter). Each round
  * is two equi-joins + one aggregate on (id, label) longs — uniform-key
  * shuffles over frames no larger than the node set; the pair list never
  * re-materializes. The loop is driver-side but touches only per-round
  * AGGREGATE results (a limit(1) change probe), never row data.
  */
object Components {

  /** Cluster id (= min node id of the component) for every node.
    * `edges` is an undirected pair list (aCol, bCol); isolated nodes keep
    * their own id. Fails loudly if `maxIters` rounds don't reach the
    * fixpoint (with pointer jumping that needs diameter > 2^maxIters).
    *
    * Each round ends in `localCheckpoint` — iterative self-joins double
    * the logical plan per round, and without lineage truncation the plan
    * itself grows exponentially (OOM in the OPTIMIZER before any data
    * moves). Checkpointing the small (id, label) frame per round is the
    * same discipline GraphFrames' CC uses. */
  def connectedComponents(nodes: DataFrame, idCol: String, edges: DataFrame,
      aCol: String, bCol: String, maxIters: Int = 20): DataFrame = {
    val sym = edges.select(col(aCol).as("s"), col(bCol).as("t"))
      .unionByName(edges.select(col(bCol).as("s"), col(aCol).as("t")))
      .persist()
    // iterate ONLY over nodes the pair graph touches — on a real corpus
    // the duplicate graph covers a small fraction of documents, and
    // isolated nodes can never change label; they rejoin as singletons at
    // the end. Shrinks every per-round frame to the active subgraph.
    val edgeNodes = sym.select(col("s").as("id")).distinct()
    val allNodes = nodes.select(col(idCol).as("id"))
    var labels = allNodes.join(edgeNodes, Seq("id"), "left_semi")
      .select(col("id"), col("id").as("lbl"))
      .localCheckpoint(true)
    // labels only ever DECREASE, so the fixpoint check is a plain sum
    // compare on the checkpointed frame — no join against the previous
    // round's labels. Decimal sum: a 100 TB node set's id sum overflows a
    // long.
    def lblSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("lbl").cast("decimal(38,0)"))).head.getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO) // empty active set (no edges)
    var prevSum = lblSum(labels)
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      it += 1
      val nbrMin = sym
        .join(labels.select(col("id").as("t"), col("lbl").as("nlbl")), Seq("t"))
        .groupBy(col("s")).agg(min(col("nlbl")).as("nmin"))
      val propagated = labels
        .join(nbrMin.withColumnRenamed("s", "id"), Seq("id"), "left_outer")
        .select(col("id"), least(col("lbl"), coalesce(col("nmin"), col("lbl")))
          .as("lbl"))
      // pointer jump: labels are node ids, so label(label) exists; one hop
      // of path compression halves the remaining diameter each round
      val jumped = propagated
        .join(propagated.select(col("id").as("lbl"), col("lbl").as("lbl2")),
          Seq("lbl"), "left_outer")
        .select(col("id"), coalesce(col("lbl2"), col("lbl")).as("lbl"))
        .localCheckpoint(true)
      val newSum = lblSum(jumped)
      labels = jumped
      converged = newSum.compareTo(prevSum) == 0
      prevSum = newSum
    }
    sym.unpersist()
    require(converged,
      s"connectedComponents did not reach a fixpoint in $maxIters rounds")
    val isolated = allNodes.join(edgeNodes, Seq("id"), "left_anti")
      .select(col("id"), col("id").as("lbl"))
    labels.unionByName(isolated)
      .select(col("id").as(idCol), col("lbl").as("cluster_id"))
  }
}

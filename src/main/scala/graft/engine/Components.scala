package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the
  * shuffle-join formulation that scales: each round is
  * `label' = min(label, min(neighbor labels))`, one join + one agg, no
  * driver-side graph state. Converges in O(diameter) rounds; duplicate
  * clusters from LSH candidates have tiny diameters, so a small fixed
  * `maxIter` with an early-exit check is exact.
  *
  * Each iterate is `localCheckpoint`ed: that truncates the lineage (the
  * logical plan would otherwise grow by a join+agg per round, making
  * Catalyst re-optimize an ever-deeper tree and making failure recovery
  * replay the whole loop). Release discipline: `localCheckpoint` persists
  * the materialized RDD directly, BYPASSING the CacheManager — so
  * `Dataset.unpersist()` on the checkpointed frame is a silent no-op.
  * The checkpointed frame's plan is a `LogicalRDD` over exactly that
  * persisted RDD, so the loop holds THAT handle and unpersists it one
  * round later — precise, concurrency-safe, one iterate's blocks alive.
  * On a real cluster with executor loss, swap `localCheckpoint` for
  * reliable `checkpoint` (same contract).
  */
object Components {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** @return DataFrame(id, component) for every node appearing in
    *         `pairs`, component = minimum id in the node's component.
    * @throws IllegalStateException if not converged within `maxIter`
    *         rounds (a silent early exit would return wrong labels). */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // undirected edge list, both directions. localCheckpoint (not
    // cache): every iterate joins against edges, and a cached frame
    // still carries the FULL upstream build in its logical plan — each
    // round's Catalyst pass re-optimizes the pairs build N times and
    // the round-to-round job graph depth grows with it (the r12
    // mm_neardup_clusters drift class). A checkpointed edge set makes
    // every iterate's plan start from one LogicalRDD.
    val fwd = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
    val edges = fwd.union(fwd.select($"dst".as("src"), $"src".as("dst")))
      .distinct()
      .localCheckpoint(eager = true)
    val edgesRdd = Frames.checkpointRdd(edges)
    var labels = edges.select($"src".as("id")).distinct()
      .withColumn("component", $"id")
    // the previous round's checkpointed RDD — the exact persisted handle,
    // extracted from the frame's LogicalRDD plan (see scaladoc)
    var prevRdd: Option[org.apache.spark.rdd.RDD[_]] = None
    def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] = {
      val r = Frames.checkpointRdd(df)
      // Every frame passed here is localCheckpoint'd; if a Spark upgrade
      // changes the analyzed shape away from LogicalRDD we silently fall
      // back to leaking one persisted RDD per iterate — make the
      // regression loud (ComponentsSpec also asserts extraction).
      if (r.isEmpty)
        log.warn(
          "checkpoint RDD extraction failed on an iterate frame; one " +
            "persisted RDD per iterate will leak until the ContextCleaner runs")
      r
    }
    var iter = 0
    var converged = labels.head(1).isEmpty // empty graph: nothing to do
    while (iter < maxIter && !converged) {
      // one shuffle round: min over own label and neighbors' labels;
      // the change flag rides along so convergence costs no extra action
      val minNbr = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy($"dst".as("id")).agg(min($"component").as("nbr"))
      val next = labels
        .join(minNbr, Seq("id"), "left_outer")
        .select($"id",
          least($"component", coalesce($"nbr", $"component")).as("component"),
          ($"nbr" < $"component").as("changed"))
        .localCheckpoint(eager = true) // materialize + truncate lineage
      converged = next
        .agg(max(when($"changed", 1).otherwise(0)).as("c"))
        .first().getInt(0) == 0
      // Dataset.unpersist would be a no-op here (see scaladoc) — release
      // the previous iterate's exact checkpoint RDD
      prevRdd.foreach(_.unpersist(blocking = false))
      prevRdd = checkpointRdd(next)
      labels = next.drop("changed")
      iter += 1
    }
    // On the 0-iteration (empty-graph) path `labels` still reads the
    // edges checkpoint, and a LocalCheckpointRDD cannot recompute after
    // unpersist (review r13) — materialize the empty result BEFORE
    // releasing the edge blocks. The >=1-iteration path returns the
    // last iterate's own checkpoint, independent of edges.
    val result =
      if (iter == 0) labels.select($"id", $"component")
        .localCheckpoint(eager = true)
      else labels.select($"id", $"component")
    // Dataset.unpersist is a no-op on a localCheckpoint frame (see
    // scaladoc) — release the edge set's exact persisted RDD
    edgesRdd.foreach(_.unpersist(blocking = false))
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within maxIter=$maxIter " +
          "rounds; raise maxIter (rounds needed ~ graph diameter)")
    // the final iterate's checkpoint backs the returned frame; it is
    // released by the ContextCleaner when the frame is GC'd
    result
  }
}

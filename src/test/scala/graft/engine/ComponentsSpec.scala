package graft.engine

import org.apache.spark.storage.StorageLevel

import graft.SparkSpec

class ComponentsSpec extends SparkSpec {

  test("empty pair graph: the returned frame stays usable after cleanup") {
    import spark.implicits._
    val pairs = Seq.empty[(Long, Long)].toDF("a", "b")
    val got = Components.connectedComponents(pairs, "a", "b", maxIter = 5)
    // the 0-iteration path must not return a frame backed by the
    // already-unpersisted edges checkpoint (review r13: a
    // LocalCheckpointRDD cannot recompute after unpersist)
    assert(got.count() == 0)
    assert(got.columns.toSeq == Seq("id", "component"))
  }

  test("labels every node with its component's minimum id") {
    import spark.implicits._
    // two chains and a singleton pair: {1-2-3-4}, {10-11}, {20-21}
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L), (21L, 20L))
      .toDF("a", "b")
    val got = Components.connectedComponents(pairs, "a", "b", maxIter = 10)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("iteration checkpoints are released: persisted RDDs stay bounded") {
    import spark.implicits._
    // a diameter-6 path forces ~7 label-propagation rounds
    val pairs = (1L to 7L).sliding(2).map(w => (w.head, w.last)).toSeq
      .toDF("a", "b")
    val before = spark.sparkContext.getPersistentRDDs.size
    val out = Components.connectedComponents(pairs, "a", "b", maxIter = 12)
    assert(out.collect().forall(_.getLong(1) == 1L))
    val after = spark.sparkContext.getPersistentRDDs.count {
      case (_, r) => r.getStorageLevel != StorageLevel.NONE
    }
    // only the FINAL iterate's checkpoint may remain beyond the baseline
    // (localCheckpoint persists 1-2 RDDs per round; earlier rounds must
    // have been unpersisted by handle — Dataset.unpersist is a no-op here)
    assert(after <= before + 2,
      s"checkpoint blocks leaked across rounds: before=$before after=$after")
  }

  test("localCheckpoint frame analyzes to LogicalRDD (extraction contract)") {
    import spark.implicits._
    // Components releases each iterate by extracting the persisted RDD
    // from the checkpointed frame's LogicalRDD plan; if a Spark upgrade
    // changes that plan shape the release degrades to a logged leak —
    // this pins the contract so the regression fails loudly in CI.
    val ckpt = Seq((1L, 2L)).toDF("a", "b").localCheckpoint(eager = true)
    assert(ckpt.queryExecution.analyzed
      .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD],
      s"analyzed plan is ${ckpt.queryExecution.analyzed.getClass.getName}")
  }

  test("throws instead of returning wrong labels at maxIter") {
    import spark.implicits._
    val pairs = (1L to 9L).sliding(2).map(w => (w.head, w.last)).toSeq
      .toDF("a", "b")
    // diameter 8 cannot converge in 2 rounds
    val e = intercept[IllegalStateException] {
      Components.connectedComponents(pairs, "a", "b", maxIter = 2).collect()
    }
    assert(e.getMessage.contains("maxIter"))
  }
}

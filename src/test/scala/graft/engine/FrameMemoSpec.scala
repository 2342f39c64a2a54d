package graft.engine

import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSpec

/** Contract of the shared-frame memo that now backs every materialized
  * index artifact (LSH pairs, components, IVF cells, PQ index, shingle
  * tables, winnow fingerprints, sketches, simhash): one compute per
  * (session, dir), distinct entries per dir, and bounded size with
  * insertion-order eviction — the property that keeps stopped sessions
  * and their checkpointed RDDs releasable. */
class FrameMemoSpec extends SparkSpec {

  test("computes once per key and returns the same frame after") {
    val memo = new FrameMemo
    val builds = new AtomicInteger
    def frame() = { builds.incrementAndGet(); spark.range(3).toDF() }
    val a1 = memo.get(spark, "dirA")(frame())
    val a2 = memo.get(spark, "dirA")(frame())
    assert(builds.get() == 1, "second get must not recompute")
    assert(a1 eq a2, "must return the memoized instance")
  }

  test("distinct dirs get distinct entries") {
    val memo = new FrameMemo
    val builds = new AtomicInteger
    def frame(n: Int) = { builds.incrementAndGet(); spark.range(n).toDF() }
    val a = memo.get(spark, "dirA")(frame(1))
    val b = memo.get(spark, "dirB")(frame(2))
    assert(builds.get() == 2)
    assert(!(a eq b))
    assert(memo.get(spark, "dirB")(frame(2)) eq b)
  }

  test("bounded: eldest entry is evicted and recomputed on next access") {
    val memo = new FrameMemo
    val builds = new AtomicInteger
    def frame() = { builds.incrementAndGet(); spark.range(1).toDF() }
    // fill past MaxEntries (8): dir0 must age out
    (0 to 8).foreach(i => memo.get(spark, s"dir$i")(frame()))
    assert(builds.get() == 9)
    memo.get(spark, "dir8")(frame())
    assert(builds.get() == 9, "dir8 is still resident")
    memo.get(spark, "dir0")(frame())
    assert(builds.get() == 10, "evicted dir0 must recompute")
  }

  test("eviction unpersists the evicted entry's checkpoint blocks") {
    val memo = new FrameMemo
    val sc = spark.sparkContext
    def ckpt(n: Int) = spark.range(n).toDF().localCheckpoint(eager = true)
    val first = memo.get(spark, "dir0")(ckpt(1))
    val firstRdd = Frames.checkpointRdd(first)
    assert(firstRdd.isDefined, "localCheckpoint frame must expose its RDD")
    val id = firstRdd.get.id
    assert(sc.getPersistentRDDs.contains(id), "checkpoint is persisted")
    // fill past MaxEntries (8) so dir0 ages out
    (1 to 8).foreach(i => memo.get(spark, s"dir$i")(ckpt(1)))
    assert(!sc.getPersistentRDDs.contains(id),
      "evicted entry's blocks must be released deterministically, " +
        "not left to GC + ContextCleaner")
    // the surviving entries are untouched
    val last = memo.get(spark, "dir8")(sys.error("must be resident"))
    val lastId = Frames.checkpointRdd(last).get.id
    assert(sc.getPersistentRDDs.contains(lastId))
  }

  test("race loser's checkpoint is released, winner's frame is returned") {
    val memo = new FrameMemo
    val sc = spark.sparkContext
    val winner = spark.range(2).toDF().localCheckpoint(eager = true)
    val loser = spark.range(2).toDF().localCheckpoint(eager = true)
    val loserId = Frames.checkpointRdd(loser).get.id
    // simulate the race: winner inserted while the loser's compute ran
    val got = memo.get(spark, "dirR") {
      memo.get(spark, "dirR")(winner) // "another thread" wins first
      loser
    }
    assert(got eq winner, "winner's instance must be returned")
    assert(!sc.getPersistentRDDs.contains(loserId),
      "losing compute's checkpoint must be released explicitly")
  }
}

package graft.engine

/** q-digest (Shrivastava, Buragohain, Agrawal & Suri 2004) — the
  * DETERMINISTIC mergeable quantile summary over a bounded integer
  * domain: a binary tree over [0, U) (heap node ids, root = 1, leaf
  * for value v = U + v) whose node counts are repeatedly folded into
  * parents while count(v) + count(sibling) + count(parent) stays
  * within t = max(1, n/k). Size stays O(k) after compression, the
  * rank uncertainty of any answer is at most L·t per compression
  * (L = tree depth), and — unlike GK insertion order or KLL coin
  * flips — every operation here is a pure function of the input
  * MULTISET: building is leaf counting (order-free), merging is a
  * count-map sum (order-free), and compression walks node ids in a
  * canonical bottom-up sorted order. That determinism is what lets
  * the declared sketch row run under the cross-engine hash gate.
  *
  * Why this sketch at 100 TB: an exact percentile is a full sort;
  * a histogram (sketch_hist_quantiles) needs the value RANGE up
  * front and its error is a fixed fraction of that range, while the
  * q-digest bounds RANK error regardless of how skewed the value
  * distribution is, merges associatively across partitions/days, and
  * is exactly the summary a per-shard pipeline ships to a combiner.
  *
  * Reference comparison: the reference engine has no sketch surface;
  * this extends the graft sketch family (CMS/Bloom/HLL/KMV/MG/AMS)
  * with its quantile member.
  */
object QDigest {

  /** Leaf-domain bits: values are e2-quantized (2-dp fixed point), so
    * 2^16 covers [0, 655.35] — the events.value domain with headroom.
    * Out-of-range values are the CALLER's accounting (the declared
    * row reports them exactly). */
  val Bits = 16
  val U: Int = 1 << Bits

  def leafId(v: Int): Long = U.toLong + v

  /** Depth of a node id: root (1) -> 0, leaves -> [[Bits]]. */
  def levelOf(id: Long): Int =
    63 - java.lang.Long.numberOfLeadingZeros(id)

  /** Inclusive value range [lo, hi] a node covers. */
  def loOf(id: Long): Int = {
    val lvl = levelOf(id)
    val width = U >>> lvl
    ((id - (1L << lvl)) * width).toInt
  }
  def hiOf(id: Long): Int = loOf(id) + (U >>> levelOf(id)) - 1

  /** Canonical compression: bottom-up by level, node ids in sorted
    * order within a level, fold (v, sibling) into the parent while the
    * triple stays within t = max(1, n/k). Pure function of the count
    * map — the same multiset always compresses identically. */
  def compress(counts: collection.Map[Long, Long], n: Long,
      k: Int): Map[Long, Long] = {
    val t = math.max(1L, n / k)
    val m = scala.collection.mutable.HashMap.empty[Long, Long]
    m ++= counts
    var lvl = Bits
    while (lvl >= 1) {
      val lo = 1L << lvl
      val hi = (1L << (lvl + 1)) - 1
      val ids = m.keysIterator.filter(id => id >= lo && id <= hi)
        .toArray.sorted
      ids.foreach { v =>
        if (m.contains(v)) { // not already folded as a sibling
          val sib = v ^ 1L
          val par = v >> 1
          val s = m.getOrElse(v, 0L) + m.getOrElse(sib, 0L) +
            m.getOrElse(par, 0L)
          if (s <= t) {
            m.update(par, s)
            m.remove(v)
            m.remove(sib)
          }
        }
      }
      lvl -= 1
    }
    m.toMap
  }

  /** Build a compressed digest from raw e2 values (one partition's
    * pass): leaf counting then canonical compression with the LOCAL
    * count — O(distinct values) transient, O(k) after. Returns
    * (digest, n). */
  def fromValues(vs: Iterator[Int], k: Int): (Map[Long, Long], Long) = {
    val leaves = scala.collection.mutable.HashMap.empty[Long, Long]
    var n = 0L
    vs.foreach { v =>
      require(v >= 0 && v < U, s"value $v outside the leaf domain")
      val id = leafId(v)
      leaves.update(id, leaves.getOrElse(id, 0L) + 1L)
      n += 1L
    }
    (compress(leaves, n, k), n)
  }

  /** Merge = count-map sum (order-free, associative, commutative);
    * recompress with the combined n to restore the size bound. */
  def merge(a: collection.Map[Long, Long], b: collection.Map[Long, Long],
      k: Int): Map[Long, Long] = {
    val m = scala.collection.mutable.HashMap.empty[Long, Long]
    m ++= a
    b.foreach { case (id, c) => m.update(id, m.getOrElse(id, 0L) + c) }
    compress(m, m.valuesIterator.sum, k)
  }

  /** The e2 value whose cumulative upper-endpoint mass first reaches
    * `targetRank`: nodes sorted by (hi, lo) ascending, prefix-summed —
    * the standard q-digest rank query. The reported value's true rank
    * differs from targetRank by at most the digest's accumulated
    * L·t uncertainty (verified, not assumed, by the declared row). */
  def quantile(digest: collection.Map[Long, Long],
      targetRank: Long): Int = {
    val nodes = digest.toArray
      .map { case (id, c) => (hiOf(id), loOf(id), c) }
      .sortBy { case (h, l, _) => (h, l) }
    var cum = 0L
    var i = 0
    while (i < nodes.length) {
      cum += nodes(i)._3
      if (cum >= targetRank) return nodes(i)._1
      i += 1
    }
    if (nodes.isEmpty) 0 else nodes.last._1
  }

  def size(digest: collection.Map[Long, Long]): Int = digest.size
}

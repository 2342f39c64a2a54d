package graft.engine

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck merge-law properties for the streaming privacy
  * aggregators ([[TypedAggregators.QiProfile]] /
  * [[TypedAggregators.TClose]]): Spark may split a group's rows across
  * any number of partial buffers in any order, so the monitors are
  * partitioning-independent ONLY if reduce/merge commute with the
  * single-pass fold — the sketch merge-law discipline applied to the
  * privacy state. */
object PrivacyAggProps extends Properties("privacyAggs") {

  private val rowGen: Gen[(Long, String)] = for {
    hb <- Gen.choose(0L, 3L)
    tp <- Gen.oneOf("view", "click", "purchase", "error", "signup")
  } yield (hb, tp)

  private val rowsGen: Gen[List[(Long, String)]] =
    Gen.nonEmptyListOf(rowGen)

  private def foldQi(rows: Seq[(Long, String)]) =
    rows.foldLeft(TypedAggregators.QiProfile.zero)(
      TypedAggregators.QiProfile.reduce)

  property("QiProfile: any split+merge equals the single-pass fold") =
    forAll(rowsGen, Gen.choose(1, 5)) { (rows, cuts) =>
      val whole = TypedAggregators.QiProfile.finish(foldQi(rows))
      // deterministic split into `cuts` chunks, folded separately
      val parts = rows.grouped(math.max(1, rows.size / cuts)).toList
      val merged = parts.map(foldQi)
        .reduce(TypedAggregators.QiProfile.merge)
      TypedAggregators.QiProfile.finish(merged) == whole
    }

  property("QiProfile: row order never changes the profile") =
    forAll(rowsGen, Gen.long) { (rows, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(rows)
      TypedAggregators.QiProfile.finish(foldQi(shuffled)) ==
        TypedAggregators.QiProfile.finish(foldQi(rows))
    }

  private val bandsGen: Gen[List[Long]] =
    Gen.nonEmptyListOf(Gen.choose(0L, 6L))

  // a fixed global distribution over the band domain
  private val glob: Seq[(Long, Long)] =
    (0L to 6L).map(b => b -> (b * 3 + 5))
  private val nn: Long = glob.map(_._2).sum
  private val agg = TypedAggregators.TClose(glob, nn)

  private def foldT(bands: Seq[Long]) =
    bands.foldLeft(agg.zero)(agg.reduce)

  property("TClose: any split+merge equals the single-pass fold") =
    forAll(bandsGen, Gen.choose(1, 5)) { (bands, cuts) =>
      val whole = agg.finish(foldT(bands))
      val parts = bands.grouped(math.max(1, bands.size / cuts)).toList
      agg.finish(parts.map(foldT).reduce(agg.merge)) == whole
    }

  property("TClose: EMD is 0 iff the class matches the global shape") =
    forAll(Gen.choose(1L, 5L)) { scale =>
      // a class that is an exact scalar multiple of the global
      // distribution has CDF distance 0 at every band
      val bands = glob.flatMap { case (b, g) =>
        Seq.fill((g * scale).toInt)(b) }
      agg.finish(foldT(bands)).emd_e6 == 0L
    }

  property("TClose: a class on bands OUTSIDE the global domain fails the gate") =
    forAll(Gen.choose(1, 20), Gen.choose(100L, 200L)) { (k, band) =>
      // every member sits on a band the global snapshot lacks (the
      // sens dimension drifted past the globBands training): the
      // domain walk must extend so the class CDF still closes, and
      // the class must FAIL the house close gate (emd·5 > (B−1)) —
      // the pre-fix walk could read a fully-drifted class as close
      val out = agg.finish(foldT(Seq.fill(k)(band)))
      out.n_users == k.toLong &&
        out.emd_e6 * 5L > (glob.size.toLong - 1L) * 1000000L
    }

  property("TClose: n_users and l_distinct are exact") =
    forAll(bandsGen) { bands =>
      val out = agg.finish(foldT(bands))
      out.n_users == bands.size.toLong &&
        out.l_distinct == bands.distinct.size.toLong
    }
}

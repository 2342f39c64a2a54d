package graft.engine

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.engine.jobs.{LogAnalyzerJob, WordCountJob}

/** ScalaCheck properties for the Spark-free engine pieces
  * (SURVEY.md §5.2: partitioner range, reduce-vs-groupBy equivalence,
  * normalize totality). */
object EngineProps extends Properties("engine") {

  private val keyGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf('ä', 'é', '中', 'ß', ' ', '\t', '!', '0', 'z'))
      .map(_.mkString))

  property("partitioner range is [0, R) for any key") =
    forAll(keyGen, Gen.choose(1, 100)) { (k, r) =>
      val p = FirstBytePartitioner.of(k, r)
      p >= 0 && p < r
    }

  // Go's ToLower(key[0:1]) folds ASCII letters only — the law is
  // ASCII-case-insensitivity (non-ASCII lead bytes pass through raw)
  property("partitioner is ASCII-case-insensitive") =
    forAll(Gen.alphaNumStr, Gen.choose(1, 100)) { (k, r) =>
      FirstBytePartitioner.of(k.toUpperCase(java.util.Locale.ROOT), r) ==
        FirstBytePartitioner.of(k.toLowerCase(java.util.Locale.ROOT), r)
    }

  property("same first char ⇒ same partition") =
    forAll(Gen.alphaChar, Gen.alphaNumStr, Gen.alphaNumStr, Gen.choose(1, 50)) {
      (c, s1, s2, r) =>
        FirstBytePartitioner.of(c + s1, r) == FirstBytePartitioner.of(c + s2, r)
    }

  private val kvsGen: Gen[List[(String, String)]] =
    Gen.listOf(Gen.zip(
      Gen.oneOf("a", "b", "c", "dd", "e1", ""),
      Gen.oneOf("1", "2", "10", "junk", "-3")))

  property("sumByKey over sorted input == groupBy parse-sum") =
    forAll(kvsGen) { kvs =>
      val sorted = kvs.sorted
      val got = WordCountJob.sumByKey(sorted.iterator).toMap
      val want = sorted.groupBy(_._1).map { case (k, vs) =>
        k -> vs.flatMap(v => v._2.trim.toLongOption).sum
      }
      got == want
    }

  property("sumByKey emits keys in sorted order exactly once") =
    forAll(kvsGen) { kvs =>
      val keys = WordCountJob.sumByKey(kvs.sorted.iterator).map(_._1).toList
      keys == keys.sorted && keys.distinct == keys
    }

  property("log normalize never throws and respects the arity filter") =
    forAll(Gen.listOf(Gen.oneOf("a", "http://x.y/z", "https://1.2.3.4:80/p?q",
      "tok", "..", "#?", "http://", "a/b/c"))) { tokens =>
      val arr = tokens.toArray
      LogAnalyzerJob.normalize(arr) match {
        case None          => arr.length < 4
        case Some((c, _, _)) => arr.length >= 4 && c == arr(2)
      }
    }

  property("wc fMap emits one pair per whitespace token") =
    forAll(Gen.listOf(Gen.oneOf("Word", "x-1", "---", "A+B", "42"))) { ws =>
      val line = ws.mkString(" ")
      WordCountJob.fMap("f", 0, line).size == ws.size
    }
}

package graft.engine

/** Frozen multilingual corpus for the PolyCut cross-engine geometry pin
  * (verdict r12 ask #3). [[CdcChunker.PolyCut]] folds a 64-bit wrapping
  * polynomial rolling hash, which DuckDB cannot replay — so its oracle
  * is a FIXTURE: the chunk geometry over this corpus was computed once
  * (by [[graft.GenPolyFixtureSql]]) and frozen as literal VALUES in the
  * `doc_cdc_poly_fixture` oracle SQL. Any later drift in the rolling
  * hash, the window, the cut mask, the UTF-8 code-point walk, or the
  * chunk-hash publication breaks the round gate loudly.
  *
  * The corpus is DETERMINISTIC BY CONSTRUCTION (a fixed-seed LCG over
  * fixed alphabet runs — never Random), and deliberately mixes 1-byte
  * ASCII, 2-byte Latin/Greek/Cyrillic, 3-byte CJK, and 4-byte emoji
  * code points so the geometry pin also exercises every UTF-8 width
  * the offset walk handles.
  */
object PolyCutFixture {

  private val alphabets: Vector[Vector[String]] = Vector(
    "abcdefghijklmnopqrstuvwxyz .,".map(_.toString).toVector,
    "àâçéèêëîïôùûüÿœæß ".map(_.toString).toVector,
    "αβγδεζηθικλμνξοπρστυφχψω ".map(_.toString).toVector,
    "абвгдежзийклмнопрстуфхцчшщэюя ".map(_.toString).toVector,
    "一二三四五六七八九十雨山水火木金土日月人天地".map(_.toString).toVector,
    // 4-byte code points: split into surrogate-pair-safe strings
    Vector("😀", "😁", "😂", "🤣", "😃", "😄", "😅", "🚀", "🌍", "🎉"))

  /** 16 docs, 200–500 code points each, alphabet runs of 4–18 chars. */
  val corpus: Seq[(Long, String)] = (0L until 16L).map { id =>
    var st = id * 2654435761L + 88172645463325252L
    def next(): Long = {
      st = st * 6364136223846793005L + 1442695040888963407L
      st >>> 33
    }
    val sb = new StringBuilder
    var cps = 0
    val targetCps = (200 + id * 37 % 300).toInt
    while (cps < targetCps) {
      val ab = alphabets((next() % alphabets.length).toInt)
      var run = (4 + next() % 15).toInt
      while (run > 0 && cps < targetCps) {
        sb.append(ab((next() % ab.length).toInt))
        cps += 1
        run -= 1
      }
    }
    (id, sb.toString)
  }
}

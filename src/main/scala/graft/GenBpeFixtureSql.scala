package graft

/** Regenerates the frozen VALUES oracle for `text_bpe_encode_fixture`:
  * learns the fixture merge table and prints the DuckDB SQL whose
  * literal rows pin the greedy BPE encode over the fixture corpus
  * (the PolyCut fixture discipline — see [[graft.GenPolyFixtureSql]]).
  * Run ONLY when the fixture corpus itself is deliberately changed —
  * regenerating after a tokenizer change would erase exactly the
  * regression signal the pin exists to give. Usage:
  *   sbt "runMain graft.GenBpeFixtureSql"
  * then paste the printed SQL over the oracle entry in TextAnalysis. */
object GenBpeFixtureSql {
  def main(args: Array[String]): Unit = {
    val rows = graft.queries.TextAnalysis.bpeFixtureRows
    println(s"-- ${rows.size} rows, merges=${
      graft.queries.TextAnalysis.BpeFixtureMerges}")
    println("SELECT CAST(doc_id AS BIGINT) AS doc_id, " +
      "CAST(n_words AS BIGINT) AS n_words, " +
      "CAST(n_cps AS BIGINT) AS n_cps, " +
      "CAST(n_tokens AS BIGINT) AS n_tokens, " +
      "ROUND(CAST(n_cps AS DOUBLE) / n_tokens, 4) AS compression " +
      "FROM (VALUES " +
      rows.map { case (id, w, c, t) => s"($id,$w,$c,$t)" }.mkString(",") +
      ") t(doc_id, n_words, n_cps, n_tokens) ORDER BY doc_id")
  }
}

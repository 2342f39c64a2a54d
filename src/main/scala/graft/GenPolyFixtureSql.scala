package graft

/** Regenerates the frozen VALUES oracle for `doc_cdc_poly_fixture`
  * (see [[graft.engine.PolyCutFixture]]): prints the DuckDB SQL whose
  * literal rows pin the PolyCut chunk geometry over the fixture corpus.
  * Run ONLY when the fixture corpus itself is deliberately changed —
  * regenerating after a chunker change would erase exactly the
  * regression signal the pin exists to give. Usage:
  *   sbt "runMain graft.GenPolyFixtureSql"
  * then paste the printed SQL over the oracle entry in PipelineOps. */
object GenPolyFixtureSql {
  def main(args: Array[String]): Unit = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val rows = graft.engine.PolyCutFixture.corpus.flatMap { case (id, tx) =>
      graft.engine.CdcChunker
        .chunkOne(md, id, "fx", tx, graft.engine.CdcChunker.PolyCut)
        .zipWithIndex
        .map { case (c, i) => s"($id,$i,${c.clen},${c.chash})" }
    }
    println(s"-- ${rows.size} rows")
    println("SELECT CAST(doc_id AS BIGINT) AS doc_id, " +
      "CAST(chunk_idx AS BIGINT) AS chunk_idx, " +
      "CAST(clen AS BIGINT) AS clen, CAST(chash AS BIGINT) AS chash " +
      "FROM (VALUES " + rows.mkString(",") +
      ") t(doc_id, chunk_idx, clen, chash) ORDER BY doc_id, chunk_idx")
  }
}

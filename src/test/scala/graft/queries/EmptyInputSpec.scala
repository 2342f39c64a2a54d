package graft.queries

import java.nio.file.Files

import graft.{SparkEntry, SparkSpec}
import graft.Tables.t

/** Degenerate-input sweep: every declared query must EXECUTE on
  * zero-row tables (schema-preserved) without throwing. At 100 TB a
  * partition-pruned read, an empty date slice, or a fresh ingest
  * routinely hands operators empty inputs — an operator that NPEs or
  * head()s an empty frame there takes the whole job down. */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = Files.createTempDirectory("graft_empty").toString
    graft.Tables.names.foreach { n =>
      t(spark, sf(), n).limit(0).write.parquet(s"$dir/$n.parquet")
    }
    dir
  }

  test("every declared query executes on empty inputs") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, emptyDir).count(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
    }
    assert(failures.isEmpty,
      s"queries crash on empty inputs:\n${failures.mkString("\n")}")
  }
}

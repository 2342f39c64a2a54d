package graft

import org.apache.spark.sql.types.TimestampType

/** Every declared query must EXECUTE against the real driver testdata.
  *
  * The unit/property suites exercise operator semantics on synthetic
  * frames, so a testdata format drift can break declared queries without
  * failing a single test — exactly round 6's silent loss of 11 queries
  * when the regenerated events.parquet switched `ts` from
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS)/NTZ and `unix_micros(ts)`
  * stopped analyzing. This suite is the net for that class: run the
  * ENTIRE SparkEntry.queries inventory at sf0.001 and fail loudly with
  * the query name on any exception. Row counts / hashes stay the
  * oracle's job (tools/check.py, driver t2) — this asserts executability.
  */
class SmokeAllQueriesSpec extends SparkSpec {

  test("events.ts normalizes to session-local TIMESTAMP (unix_micros-safe)") {
    val ts = Tables.t(spark, sf(), "events").schema("ts").dataType
    assert(ts == TimestampType,
      s"events.ts read as $ts — the events family extracts epochs via " +
        "unix_micros(), which rejects TIMESTAMP_NTZ; normalize in Tables.load")
  }

  test("NO table exposes TIMESTAMP_NTZ (uniform Tables.load normalization)") {
    // r7 verdict ask #3: orders.o_orderdate / lineitem.l_shipdate read
    // NTZ after the testdata refresh; one future unix_micros-style
    // expression would re-detonate the round-6 failure class. The loader
    // now normalizes every NTZ column — pin that for all tables.
    for (name <- Tables.names) {
      val ntz = Tables.t(spark, sf(), name).schema.fields
        .filter(_.dataType == org.apache.spark.sql.types.TimestampNTZType)
        .map(_.name)
      assert(ntz.isEmpty,
        s"$name exposes TIMESTAMP_NTZ columns ${ntz.mkString(",")} — " +
          "Tables.load must cast them to session-local TIMESTAMP")
    }
  }

  test("every declared query executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sf()).count(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${Option(e.getMessage).getOrElse(e.getClass.getName).linesIterator.take(2).mkString(" | ")}")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} declared quer${if (failures.size == 1) "y" else "ies"} failed:\n  " +
        failures.mkString("\n  "))
  }
}

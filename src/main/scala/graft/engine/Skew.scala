package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot join keys (SURVEY.md scale rules;
  * complements AQE's runtime skew-join splitting with a plan-level tool
  * usable when skew is known up front, e.g. a null-ish default key or a
  * celebrity entity in a 100 TB fact table).
  */
object Skew {

  /** Salted inner equi-join: the big (skewed) side gets a deterministic
    * salt in [0, salts) derived from the full row hash — spreading a hot
    * key's rows across `salts` shuffle partitions — and the small side is
    * replicated once per salt. Result equals `big.join(small, key)`
    * exactly; only the shuffle layout changes.
    *
    * Cost model: small side inflates ×salts, so pick
    * `salts ≈ hot-key rows / target partition size`, keeping
    * `salts × |small|` well under the shuffle volume saved.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 1, "salts must be > 1")
    val saltCol = "__graft_salt"
    val bigCols = big.columns.map(col).toSeq
    val b = big.withColumn(saltCol, pmod(hash(bigCols: _*), lit(salts)))
    val sm = small.withColumn(saltCol,
      explode(array((0 until salts).map(lit): _*)))
    b.join(sm, Seq(key, saltCol), "inner").drop(saltCol)
  }
}

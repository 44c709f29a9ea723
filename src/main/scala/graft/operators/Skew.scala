package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (builder brief: "salting for skew";
  * complements AQE's runtime skew-join splitting, which only engages for
  * sort-merge joins past its thresholds).
  *
  * A key held by 1% of a 100 TB fact table puts 1 TB in one reducer; salting
  * scatters that key across `salt` reducers by widening the join key with a
  * synthetic component: the big side picks one salt per row, the small side
  * replicates each row once per salt value. Equi-join semantics are
  * preserved exactly — every (bigRow, smallRow) key match still meets on
  * exactly one salt value.
  */
object Skew {

  /** Salted inner equi-join of a skewed `big` side against a `small` side
    * (small is replicated `salt`×, so keep it the dimension side). */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, salt: Int): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    // Deterministic per-row scatter: hash of the whole row mod salt. rand()
    // would work too but breaks retry/replay determinism.
    val bigS = big.withColumn("__salt",
      pmod(hash(big.columns.map(col): _*), lit(salt)))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    bigS.join(smallS,
        bigS(bigKey) === smallS(smallKey) && bigS("__salt") === smallS("__salt"))
      .drop("__salt")
  }
}

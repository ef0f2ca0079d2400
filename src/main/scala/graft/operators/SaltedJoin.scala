package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join: spread each left (large, skewed) row across
  * `salts` sub-keys and replicate the right (small/dim) side once per
  * sub-key, so no single reducer owns a hot key's entire row set.
  *
  * Join semantics are inner-join-identical to `left.join(right, keys)`:
  * every left row meets every matching right row exactly once (the left
  * row carries ONE salt; the right side covers ALL salts), so output
  * multiplicity is preserved even with duplicate keys on both sides.
  *
  * Scale notes:
  *  - AQE's skew-join split (`spark.sql.adaptive.skewJoin`) is the first
  *    line of defense and needs no code. Explicit salting is for the
  *    places AQE can't re-plan: deterministic layouts feeding stateful
  *    ops, bucketed writes, or a key so hot a single post-split partition
  *    still spills.
  *  - The salt is drawn per row from a SEEDED uniform, not hashed from
  *    the row's content: a hot key's skew often comes from *identical*
  *    fact rows (telemetry replays, boilerplate), and any
  *    pure-function-of-content salt collapses those onto one sub-key —
  *    one reducer again owns the hot set while the dim side still pays
  *    `salts`× replication. Seeded rand is position-deterministic (seed
  *    mixes with the partition index), so a fixed input layout replays
  *    the same salt layout; the join RESULT is salt-invariant either
  *    way. Do not feed it shuffle output whose intra-partition order is
  *    unstable if layout reproducibility matters — salt at the scan.
  *  - Cost: the right side is materialized `salts` times. Keep `salts`
  *    small (8-32) and the right side dim-sized.
  */
object SaltedJoin {

  val SaltCol = "__graft_salt"

  /** Inner equi-join on `keys` with the left side salted into `salts`
    * sub-keys. Neither input may already contain [[SaltCol]]. */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String], salts: Int,
           seed: Long = 0L): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    require(!left.columns.contains(SaltCol) && !right.columns.contains(SaltCol),
      s"inputs must not contain the reserved column $SaltCol")
    val l = left.withColumn(SaltCol, saltOf(salts, seed))
    val r = right.withColumn(SaltCol,
      explode(sequence(lit(0L), lit(salts - 1L))))
    l.join(r, keys :+ SaltCol).drop(SaltCol)
  }

  /** The per-row salt assignment — exposed so tests can assert hot keys
    * actually spread across sub-keys, identical rows included. */
  def saltOf(salts: Int, seed: Long = 0L) =
    floor(rand(seed) * salts).cast("long")
}

package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic join salting for skewed keys. AQE's skew-join handling
  * covers sort-merge joins it can split at runtime; salting is the
  * planning-time answer when one join key is so hot (a bot user, a
  * default/sentinel value) that even a split partition hotspots, or when
  * the join must hash-partition for a downstream stage.
  *
  * Measured against `spark.sql.adaptive.skewJoin` on the same hot-key
  * fixture (SaltSpec; SURVEY §8b): AQE splits the hot partition with no
  * code change and is the right default for plain shuffled equi-joins.
  * Salting remains necessary where the AQE rule does not reach:
  * `OptimizeSkewedJoin` only matches SMJ over Sort+ShuffleQueryStage on
  * BOTH sides (an aggregation between shuffle and join — e.g. a
  * `distinct()`ed dim — silently disables it); AQE skew handling is
  * join-only (skewed aggregations need the salt → two-phase-agg shape);
  * and AQE's partition split changes the read geometry, so a join that
  * must keep a stable hash partitioning for a downstream co-partitioned
  * stage cannot use it.
  *
  * Shape: the BIG side gets a deterministic salt in [0, k) hashed from a
  * high-cardinality tiebreak column (stable across retries — never
  * `rand()`, which breaks task retry idempotence); the SMALL side is
  * exploded k-fold so every (key, salt) bucket finds its match. The hot
  * key's rows now spread over k tasks at the cost of a k-fold replication
  * of the small side.
  */
object Salt {

  def withSalt(df: DataFrame, tiebreak: Column, k: Int): DataFrame =
    df.withColumn("_salt", pmod(hash(tiebreak), lit(k)))

  def explodeSalt(df: DataFrame, k: Int): DataFrame =
    df.withColumn("_salt", explode(array((0 until k).map(lit): _*)))

  /** Inner equi-join of a skew-prone big side against a small side,
    * spread over k salt buckets per key. Result equals the unsalted join
    * (asserted in SaltSpec). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      tiebreak: Column, k: Int = 8): DataFrame =
    withSalt(big, tiebreak, k)
      .join(explodeSalt(small, k), Seq(key, "_salt"))
      .drop("_salt")
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resilient equi-join via key salting.
  *
  * AQE's skew-join splitting (on by default in GraftSession) handles
  * most skew at runtime; explicit salting remains the tool when one
  * side has a few pathological hot keys known in advance (the classic
  * null-key / default-value / celebrity-entity cases in web-scale
  * corpora), or when the join sits inside a cached/checkpointed
  * subtree AQE never re-plans.
  *
  * Two variants:
  *   - [[saltedJoin]]: the whole skewed side is salted and the whole
  *     other side replicated `factor` ways — right when skew is known
  *     and the other side is a small dimension (replication is cheap).
  *   - [[hotKeyJoin]]: hot keys are DETECTED (one partial-agg'd count
  *     pass), only their rows are salted/replicated, and the cold
  *     remainder takes the plain join — right when the other side is
  *     too big to replicate wholesale or the hot set isn't known
  *     up front.
  */
object SkewJoin {

  /** Shape: the skewed (big) side gets a uniform random salt in
    * [0, factor); the other side is replicated `factor` times with
    * every salt value. The join key becomes (key, salt), splitting
    * each hot key's rows across `factor` reducers. Replication
    * multiplies the small side by `factor` — keep it the dimension
    * side. */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    // right/full outer would surface each unmatched replicated-side row
    // `factor` times — reject rather than silently multiply rows
    val normalized = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti").contains(normalized),
      s"saltedJoin supports inner/left/left_semi/left_anti joins, got $joinType")
    val salted = skewed.withColumn("__salt", (rand(42) * factor).cast("int"))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Inner equi-join on `key` with automatic heavy-hitter handling:
    * one partial-agg'd key count on the left finds keys hotter than
    * `hotThreshold` — that relation is ≤ |left| / hotThreshold rows BY
    * CONSTRUCTION, so it broadcasts. Hot left rows get a
    * deterministic-by-content salt in [0, salt); hot right rows are
    * replicated `salt` ways; the two join on (key, salt), spreading
    * one hot key's probe work over `salt` reducers instead of one
    * straggler. Cold rows take the plain join unchanged. The result
    * is row-for-row the plain inner join — salting moves work, never
    * changes the match set (spec-pinned, and gate-checked against the
    * plain SQL join by q_skew_join).
    *
    * At 100 TB: the extra cost is the key-count pass (map-side
    * combined, distinct-keys-sized output) and salt× replication of
    * hot RIGHT rows only. The win is eliminating the reducer that
    * holds hotThreshold× the median partition.
    *
    * Result columns: key, left columns, right columns (the
    * using-join layout of `left.join(right, Seq(key))`). */
  def hotKeyJoin(left: DataFrame, right: DataFrame, key: String,
                 hotThreshold: Long = 1000000L, salt: Int = 16): DataFrame = {
    require(salt >= 2, "salt must be >= 2")
    require(hotThreshold >= 1, "hotThreshold must be >= 1")
    val hot = left.groupBy(col(key)).agg(count(lit(1)).as("__c"))
      .filter(col("__c") > hotThreshold)
      .select(col(key))
    // tiny by construction; cached so the three consumers below cost
    // one computation even if exchange reuse doesn't fire (session-
    // scoped cache, same caller-clearCache contract as Dedup's)
    val hotB = broadcast(hot.cache())
    // salt is deterministic BY CONTENT (xxhash64 over the full row) —
    // but correctness never depends on it: every left row still meets
    // every right row with its key; the salt only picks the reducer
    val leftCols = left.columns.map(col).toSeq
    val leftHot = left.join(hotB, Seq(key), "left_semi")
      .withColumn("__salt", pmod(xxhash64(struct(leftCols: _*)), lit(salt.toLong)))
    val rightHot = right.join(hotB, Seq(key), "left_semi")
      .withColumn("__salt", explode(sequence(lit(0L), lit(salt.toLong - 1))))
    val hotJoined = leftHot.join(rightHot, Seq(key, "__salt")).drop("__salt")
    val coldJoined = left.join(hotB, Seq(key), "left_anti").join(right, Seq(key))
    hotJoined.unionByName(coldJoined)
  }
}

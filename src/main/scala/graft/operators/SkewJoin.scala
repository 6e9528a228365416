package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Salted equi-join for skewed keys — the manual fallback when AQE's skew-join split isn't
 * enough (e.g. one key holds >> one partition's worth of rows on BOTH sides, or the
 * skewed side feeds a window right after the join).
 *
 * Mechanics: the skewed (probe) side gets a deterministic salt in [0, salts) hashed from
 * a high-cardinality discriminator column, widening the hot key across `salts` shuffle
 * partitions; the build side is replicated once per salt (explode of a literal range —
 * rows * salts, cheap when the build side is the smaller input). Join key becomes
 * (key, salt), so the result is exactly the plain equi-join's.
 *
 * At 100 TB: salts ≈ ceil(hot-key rows / target-partition rows); replication cost is
 * |build| * salts, so keep the build side the dimension-ish input. AQE's
 * skewJoin.enabled handles the common case automatically — this operator exists for the
 * pathological ones and is spec-verified equal to the unsalted join.
 */
object SkewJoin {

  /**
   * Inner equi-join of `probe` (skewed, large) with `build` (replicated) on `key`.
   * `discriminator` must be a probe-side column with per-row variety (any id works); it
   * only spreads rows, it never affects the result.
   */
  def saltedInner(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      discriminator: Column,
      salts: Int): DataFrame = {
    val salted = probe.withColumn("_salt", pmod(xxhash64(discriminator), lit(salts)).cast("int"))
    val replicated = build.withColumn("_salt", explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}

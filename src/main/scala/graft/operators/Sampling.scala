package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for reproducible corpus
  * curation. `df.sample()` draws from a partition-seeded RNG — the
  * subset changes with partitioning, retries, and engine, which is
  * unacceptable when a training corpus must be re-derivable bit-for-bit
  * years later. Hash-gating on a STABLE KEY gives:
  *
  *  - reproducibility: membership is a pure function of the key,
  *  - engine portability: md5 hex is identical everywhere (the DuckDB
  *    oracle runs the same predicate verbatim),
  *  - consistency: the same key samples identically across tables,
  *    so a sampled `orders` still joins its sampled `lineitem`.
  *
  * Scale shape: a pure per-row filter fused into the scan — no shuffle,
  * no RNG state, trivially parallel at any scale.
  */
object Sampling {

  /** Keep rows whose md5(key) falls below `numerator/256` — fractions in
    * 1/256 steps via a 2-hex-digit prefix compare. md5 rather than
    * xxhash64 because the oracle side must compute the identical value.
    */
  def hashSample(key: Column, numerator: Int): Column = {
    require(numerator >= 0 && numerator <= 256, "numerator in [0, 256]")
    substring(md5(key.cast("string")), 1, 2) < lit(f"$numerator%02x")
  }
}

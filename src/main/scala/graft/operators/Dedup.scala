package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for large-scale corpus curation (SURVEY.md
  * §2c): exact, content-hash, MinHash+LSH banding, SimHash.
  *
  * Scale posture: everything is a bounded number of hash-partitioned
  * shuffles — no O(n²) cross joins. Candidate generation for near-dup is
  * LSH-bucketed (only rows sharing a band bucket ever meet), which is the
  * only formulation that survives 100 TB; the all-pairs n-gram Jaccard in
  * PipelineQueries is deliberately capped to a small corpus and exists as
  * a verifiable oracle for the shingling math.
  */
object Dedup {

  /** Deterministic exact dedup: keep exactly one row per key set — the
    * one minimizing `tiebreak` — unlike `dropDuplicates`, whose survivor
    * is partition-order-dependent. One shuffle on the keys.
    */
  def exact(df: DataFrame, keys: Seq[String], tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tiebreak)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Exact dedup keyed on a collision-resistant content hash instead of
    * the full payload — at scale the shuffle then carries 32 bytes per
    * row instead of whole documents.
    */
  def byContentHash(df: DataFrame, contentCol: String, tiebreak: Column): DataFrame =
    exact(df.withColumn("_h", sha2(col(contentCol), 256)), Seq("_h"), tiebreak)
      .drop("_h")

  /** Distinct word n-gram shingles per document: (id, shingle). */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val words = split(col(textCol), " ")
    df.filter(size(split(col(textCol), " ")) >= n)
      .select(col(idCol), explode(array_distinct(
        transform(sequence(lit(0), size(words) - n),
          i => concat_ws(" ", slice(words, i + 1, lit(n)))))).as("shingle"))
  }

  /** MinHash row signature, long form: (id, pos, minhash) for
    * `numHashes` independent hash permutations, computed in one pass
    * over the shingle set (hash family = seeded xxhash64; map-side
    * partial min keeps the shuffle at |docs| × numHashes rows).
    */
  def minHashLong(sh: DataFrame, idCol: String, numHashes: Int): DataFrame =
    sh.select(col(idCol), posexplode(
        transform(sequence(lit(0), lit(numHashes - 1)),
          i => xxhash64(concat(col("shingle"), lit("#"), i.cast(StringType))))))
      .groupBy(col(idCol), col("pos"))
      .agg(min(col("col")).as("minhash"))

  /** LSH banding over MinHash signatures: (id, band, bucket). Docs
    * sharing ≥1 (band, bucket) are near-dup candidates. `bucket` is a
    * hash of the band's ordered minhash values (sort_array pins the
    * order — collect_list alone is nondeterministic).
    */
  def lshBuckets(df: DataFrame, idCol: String, textCol: String,
                 shingleN: Int = 3, numHashes: Int = 32, bands: Int = 8): DataFrame = {
    val rowsPerBand = numHashes / bands
    minHashLong(shingles(df, idCol, textCol, shingleN), idCol, numHashes)
      .withColumn("band", (col("pos") / rowsPerBand).cast(IntegerType))
      .groupBy(col(idCol), col("band"))
      .agg(xxhash64(to_json(sort_array(collect_list(struct(col("pos"), col("minhash"))))))
        .as("bucket"))
  }

  /** Near-dup candidate pairs from LSH buckets: only rows sharing a
    * bucket are joined — the shuffle is keyed on (band, bucket), never
    * all-pairs.
    */
  def minHashCandidates(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, numHashes: Int = 32,
                        bands: Int = 8): DataFrame = {
    val b = lshBuckets(df, idCol, textCol, shingleN, numHashes, bands)
    val l = b.select(col(idCol).as("id_a"), col("band"), col("bucket"))
    val r = b.select(col(idCol).as("id_b"), col("band"), col("bucket"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** 64-bit SimHash per document over whitespace tokens: per-bit
    * majority vote of token hashes. Laid out as (id, token-hash) ×
    * 64-bit positions → partial sums — one shuffle of |docs|×64 rows.
    */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .select(col(idCol), xxhash64(col("tok")).as("h"))
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), lit(63)),
          b => when(call_function("shiftright", col("h"), b)
            .bitwiseAND(1) === 1, 1).otherwise(-1))))
      .groupBy(col(idCol), col("pos"))
      .agg(sum(col("col")).as("vote"))
      .groupBy(col(idCol))
      .agg(sum(when(col("vote") > 0,
        call_function("shiftleft", lit(1L), col("pos"))).otherwise(0L))
        .cast(LongType).as("simhash"))
}

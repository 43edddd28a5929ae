package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector-similarity operators over an `array<float>` embedding column
  * (SURVEY.md §2c): brute-force cosine top-k as the verifiable baseline,
  * LSH bucketing as the scale path.
  *
  * Scale posture: brute-force is O(|Q|·|C|) — fine for a bounded query
  * set against a broadcastable candidate block, wrong for all-pairs at
  * 100 TB. The LSH variant buckets vectors by random-hyperplane sign
  * signatures so candidate generation is a hash-partitioned equi-join.
  */
object Similarity {

  /** Higher-order-function cosine similarity between two double arrays
    * (codegen'd; one pass, no explode).
    */
  def cosine(a: Column, b: Column): Column = {
    def dbl(c: Column) = transform(c, x => x.cast(DoubleType))
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    val (da, db) = (dbl(a), dbl(b))
    dot(da, db) / (sqrt(dot(da, da)) * sqrt(dot(db, db)))
  }

  /** Brute-force cosine top-k: every vector of `queries` scored against
    * every vector of `candidates` (self-pairs excluded), window top-k
    * per query. `queries` is broadcast — the fact side never shuffles.
    */
  def cosineTopK(queries: DataFrame, candidates: DataFrame, k: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val c = candidates.select(col(idCol).as("cid"), col(vecCol).as("cv"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("cid"))
    c.join(broadcast(q), col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), cosine(col("qv"), col("cv")).as("sim"))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select("qid", "cid", "sim", "rank")
      .orderBy("qid", "rank")
  }

  /** Random-hyperplane LSH signature: `bits` sign-bits, bit j = sign of
    * ⟨v, r_j⟩ where r_j components are deterministic ±1 from xxhash64 —
    * no stored projection matrix, fully codegen'd. Hamming-close
    * signatures ⇒ cosine-close vectors.
    */
  def lshSignature(vec: Column, bits: Int): Column = {
    val planes = (0 until bits).map { j =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, p) =>
          x.cast(DoubleType) *
            (when(pmod(xxhash64(lit(j), p), lit(2)) === 0, 1.0).otherwise(-1.0))),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, call_function("shiftleft", lit(1L), lit(j))).otherwise(0L)
    }
    planes.reduce(_ + _).cast(LongType)
  }

  /** Bucketed ANN: vectors grouped by LSH signature; probing joins on
    * the signature (hash-partitioned equi-join), then exact cosine +
    * top-k only within buckets.
    */
  def lshBuckets(df: DataFrame, bits: Int = 16,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    df.select(col(idCol), col(vecCol),
      lshSignature(col(vecCol), bits).as("bucket"))

  /** IVF-style ANN: a coarse quantizer of `nlist` centroids (picked
    * deterministically from the corpus — at scale you'd k-means a
    * sample, the plumbing is identical), every vector assigned to its
    * nearest centroid (broadcast centroids, partition-local argmin),
    * queries probed against their `nprobe` nearest centroid lists only.
    *
    * Scale shape: assignment is a narrow broadcast pass; the probe join
    * is a hash-partitioned equi-join on centroid id — candidate count
    * per query ≈ nprobe/nlist of the corpus instead of all of it.
    */
  def ivfTopK(queries: DataFrame, candidates: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    def dbl(c: Column) = transform(c, x => x.cast(DoubleType))
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    def withNorm(df: DataFrame, id: String, v: String, n: String): DataFrame =
      df.select(col(idCol).as(id), dbl(col(vecCol)).as(v))
        .withColumn(n, sqrt(dot(col(v), col(v))))

    // deterministic coarse centroids: hash-strided sample of the corpus
    // (at scale: k-means a sample — the probe plumbing is identical)
    val n = candidates.count()
    val step = math.max(1L, n / nlist)
    val centroids = withNorm(
      candidates.filter(pmod(col(idCol), lit(step)) === 0).limit(nlist),
      "centroid_id", "cvec", "cnorm")

    // norms precomputed ONCE per vector; per-pair work is a single dot
    def assign(df: DataFrame, topN: Int, id: String, v: String,
               nn: String): DataFrame = {
      val ww = Window.partitionBy(col(id))
        .orderBy(col("_dist"), col("centroid_id"))
      withNorm(df, id, v, nn)
        .crossJoin(broadcast(centroids))
        .withColumn("_dist",
          lit(1.0) - dot(col(v), col("cvec")) / (col(nn) * col("cnorm")))
        .withColumn("_cr", row_number().over(ww))
        .filter(col("_cr") <= topN)
        .select(col(id), col(v), col(nn), col("centroid_id"))
    }

    val assigned = assign(candidates, 1, "cid", "cv", "cn")
    val probes = assign(queries, nprobe, "qid", "qv", "qn")
    val wk = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    probes.join(assigned, "centroid_id")
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("sim"))
      .withColumn("rank", row_number().over(wk).cast(LongType))
      .filter(col("rank") <= k)
      .orderBy("qid", "rank")
  }

  /** ANN top-k through LSH buckets: candidates limited to the query's
    * bucket. Recall < 1 by construction; raise `bits` ↓ bucket size,
    * add multi-probe for recall at scale.
    */
  def annTopK(queries: DataFrame, candidates: DataFrame, k: Int,
              bits: Int = 8,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = lshBuckets(queries, bits, idCol, vecCol)
      .select(col(idCol).as("qid"), col(vecCol).as("qv"), col("bucket"))
    val c = lshBuckets(candidates, bits, idCol, vecCol)
      .select(col(idCol).as("cid"), col(vecCol).as("cv"), col("bucket"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    q.join(c, Seq("bucket"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), cosine(col("qv"), col("cv")).as("sim"))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .orderBy("qid", "rank")
  }
}

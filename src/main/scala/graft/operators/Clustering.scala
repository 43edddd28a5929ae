package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding-space clustering (SURVEY.md §2c extension surface): the
  * corpus-partitioning step of curriculum bucketing, topic-balanced
  * sampling, and IVF index builds.
  *
  * Cross-engine determinism design: k-means is famously replay-hostile
  * (RNG seeds, IEEE summation order, argmin ties). This implementation
  * removes all three — seeds are hash-picked CORPUS VECTORS (no RNG),
  * distances fold in exact DECIMAL arithmetic (summation-order
  * independent, so Spark's position-fold and DuckDB's unnest/groupBy
  * SUM compute the identical rational number), and the argmin breaks
  * ties by centroid id. The assignment is therefore a pure function of
  * the data — the DuckDB oracle hash-matches it row for row.
  *
  * Scale shape: seeds/centroids broadcast (k rows); assignment is a
  * narrow per-row pass producing k candidate rows that collapse via a
  * map-side partial `min(struct)` BEFORE the keyed shuffle — the only
  * full-width exchange is |corpus| rows keyed by id. The update step
  * shuffles (cluster, pos) partial sums — k·dim rows after map-side
  * combine. General iterative refinement in IEEE doubles (when
  * cross-engine exactness is not required) lives in
  * [[Similarity.ivfTopK]]'s spherical-k-means option.
  */
object Clustering {

  private def dec(c: Column): Column =
    transform(c, x => x.cast(DoubleType).cast(DecimalType(12, 6)))

  /** Exact squared euclidean distance between two DECIMAL(12,6) arrays.
    * Per-position (a-b)² is DECIMAL(27,12); the accumulator adds at
    * (31,12) and casts back to (30,12) — lossless (18 integer digits vs
    * |Σ| ≤ dim·(2·10⁶)², the same budget argument as
    * [[Similarity.cosineExact]]).
    */
  private def sqDist(x: Column, c: Column): Column =
    aggregate(zip_with(x, c, (a, b) => (a - b) * (a - b)),
      lit(0).cast(DecimalType(30, 12)),
      (acc, v) => (acc + v).cast(DecimalType(30, 12)))

  /** The k seed centroids: the minimum-id vector of each `id % k`
    * residue class — deterministic, engine-portable, well spread for
    * dense id spaces, and requiring no driver-side action.
    */
  def seedCentroids(df: DataFrame, k: Int,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    require(k > 0, "k must be positive")
    val seedIds = df.groupBy((col(idCol) % k).as("_b"))
      .agg(min(col(idCol)).as("_cid"))
      .select(col("_cid"))
    df.join(broadcast(seedIds), col(idCol) === col("_cid"))
      .select(col("_cid").as("cluster"), dec(col(vecCol)).as("cvec"))
  }

  /** Assign every vector to its nearest seed centroid (exact decimal
    * distances, ties to the lower cluster id): (id, cluster). The
    * argmin is a `min(struct(dist, cluster))` hash aggregation — the k
    * candidate rows per vector combine map-side, so the exchange
    * carries one row per vector, not k.
    */
  def assignToSeeds(df: DataFrame, k: Int,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val seeds = seedCentroids(df, k, idCol, vecCol)
    df.select(col(idCol), dec(col(vecCol)).as("_x"))
      .crossJoin(broadcast(seeds))
      .groupBy(col(idCol))
      .agg(min(struct(sqDist(col("_x"), col("cvec")).as("_d"),
        col("cluster").as("_c"))).as("_best"))
      .select(col(idCol), col("_best._c").as("cluster"))
  }

  /** One Lloyd update, summarized exactly: per cluster, the member
    * count and the L1 norm of the updated mean centroid. Per-position
    * member sums are exact decimals (order-independent), so
    * Σ_p |S_p| is exact and the final double `CAST(Σ|S_p|) / n` is the
    * same IEEE division in every engine. This pins the update step a
    * full double-precision centroid vector could not (its per-position
    * output would be 64× wider for no extra signal).
    */
  /** Per-cluster mean silhouette (centroid-based variant: a = distance
    * to the nearest centroid — the assignment, b = distance to the
    * second-nearest — so s = (b−a)/b, the clustering-quality score that
    * tells a curriculum/IVF build whether its k actually separates the
    * corpus). Output: (cluster, n_members, mean_silhouette).
    *
    * Cross-engine exactness: a and b are exact decimal distances picked
    * by an exact (distance, cluster-id) sort — no float enters the
    * SELECTION. The per-row ratio is two decimal→double casts and one
    * IEEE division, quantized to DECIMAL(18,6) BEFORE the per-cluster
    * sum (the ta14 pattern: a last-ulp divergence can't flip a 6-dp
    * quantization), so the mean is an exact sum and one identical
    * final division.
    *
    * Scale shape: the k distances of each vector collapse in ONE
    * per-vector aggregation whose buffer is the k-bounded sorted pair
    * list (k = number of clusters, a constant) — no window, no
    * self-join; the only full-width exchange is |corpus| rows keyed by
    * id, identical to [[assignToSeeds]].
    */
  def silhouetteStats(df: DataFrame, k: Int,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame = {
    require(k >= 2, "silhouette needs at least 2 clusters")
    val seeds = seedCentroids(df, k, idCol, vecCol)
    val ranked = df.select(col(idCol), dec(col(vecCol)).as("_x"))
      .crossJoin(broadcast(seeds))
      .select(col(idCol),
        struct(sqDist(col("_x"), col("cvec")).as("d"),
          col("cluster").as("c")).as("_dc"))
      .groupBy(col(idCol))
      .agg(slice(sort_array(collect_list(col("_dc"))), 1, 2).as("_near"))
    val a = col("_near")(0)("d")
    val b = col("_near")(1)("d")
    val s = when(b === lit(0).cast(DecimalType(30, 12)), lit(0.0))
      .otherwise((b - a).cast(DoubleType) / b.cast(DoubleType))
    ranked
      .select(col("_near")(0)("c").as("cluster"),
        s.cast(DecimalType(18, 6)).as("_sq"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"), sum(col("_sq")).as("_ssum"))
      .select(col("cluster"), col("n_members"),
        (col("_ssum").cast(DoubleType) / col("n_members").cast(DoubleType))
          .as("mean_silhouette"))
  }

  def lloydUpdateStats(df: DataFrame, k: Int,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val assigned = assignToSeeds(df, k, idCol, vecCol)
    val members = df.select(col(idCol), dec(col(vecCol)).as("_x"))
      .join(assigned, idCol)
    val posSums = members
      .select(col("cluster"), posexplode(col("_x")))
      .groupBy(col("cluster"), col("pos"))
      .agg(sum(col("col")).as("_sp"))
      .groupBy(col("cluster"))
      .agg(sum(abs(col("_sp"))).as("_sl1"))
    val counts = assigned.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"))
    counts.join(posSums, "cluster")
      .select(col("cluster"), col("n_members"),
        (col("_sl1").cast(DoubleType) / col("n_members").cast(DoubleType))
          .as("centroid_l1"))
  }

  /** Full Lloyd iteration, `rounds` rounds from the hash seeds, with
    * per-round exact inertia — the convergence evidence a k-means
    * training loop actually monitors (km01/km02 pin one assignment and
    * one update; this pins the LOOP: assign → update → re-assign →
    * re-update …). Output: (round, cluster, n_members, inertia) where
    * inertia = Σ members' exact squared distance to the centroid that
    * round assigned against, cast to double once.
    *
    * Cross-engine exactness through the round trip: member-position
    * sums are exact decimals; the updated mean is ONE IEEE division of
    * those exact values (deterministic) quantized back to 6 dp via the
    * sim05 idiom `floor(q·10⁶ + 0.5)` — floor of the identical double
    * is an exactly-representable integer, rebuilt into DECIMAL by an
    * exact integer-decimal product. (A direct double→DECIMAL(12,6)
    * CAST is NOT engine-portable at half boundaries: Spark rounds the
    * double's shortest decimal string, DuckDB the exact binary value —
    * measured one 7e-10 inertia divergence per ~16 centroids.) Next
    * round's distances are then exact decimal arithmetic on identical
    * inputs in both engines; argmin ties break to the lower cluster
    * id. Empty clusters drop out (standard k-means death); inertia
    * decreases round over round up to the ±1e-6 centroid quantization.
    *
    * Scale shape per round: centroids broadcast (≤ k rows); the argmin
    * collapses map-side via `min(struct)` (one exchanged row per
    * vector); the update shuffles (cluster, pos) partial sums — k·dim
    * rows after map-side combine. With the defaults rounds chain
    * lazily in ONE plan (at gate depth the doubled scan is cheaper
    * than materialization); a production loop at depth sets
    * `checkpoint = true` (per-round lineage truncation) and, on a
    * cluster, `checkpointDir` for fault tolerance — the
    * [[Checkpointing]] policy shared with [[farthestPointSeeds]].
    */
  def lloydRounds(df: DataFrame, k: Int, rounds: Int,
                  idCol: String = "vec_id",
                  vecCol: String = "embedding",
                  checkpoint: Boolean = false,
                  checkpointDir: Option[String] = None): DataFrame = {
    require(rounds >= 1, "need at least one round")
    val cp = Checkpointing.truncator(df.sparkSession, checkpoint,
      checkpointDir)
    val e = df.select(col(idCol), dec(col(vecCol)).as("_x"))
    def assignTo(cent: DataFrame): DataFrame =
      e.crossJoin(broadcast(cent))
        .groupBy(col(idCol))
        .agg(min(struct(sqDist(col("_x"), col("cvec")).as("_d"),
          col("cluster").as("_c"))).as("_b"))
        .select(col(idCol), col("_b._c").as("cluster"), col("_b._d").as("_d"))
    def summarize(a: DataFrame, round: Int): DataFrame =
      a.groupBy(col("cluster"))
        .agg(count(lit(1)).as("n_members"), sum(col("_d")).as("_i"))
        .select(lit(round.toLong).as("round"), col("cluster"),
          col("n_members"), col("_i").cast(DoubleType).as("inertia"))
    def updated(a: DataFrame): DataFrame =
      e.join(a.select(col(idCol), col("cluster")), idCol)
        .select(col("cluster"), posexplode(col("_x")))
        .groupBy(col("cluster"), col("pos"))
        .agg(sum(col("col")).as("_sp"), count(lit(1)).as("_n"))
        .select(col("cluster"), col("pos"),
          (floor(col("_sp").cast(DoubleType) / col("_n").cast(DoubleType) *
            1000000.0 + 0.5).cast(DecimalType(20, 0)) *
            lit(new java.math.BigDecimal("0.000001")))
            .cast(DecimalType(12, 6)).as("_m"))
        .groupBy(col("cluster"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("_m")))),
          s => s.getField("_m")).as("cvec"))
    // each round's SUMMARY is checkpointed persistently (tiny: k rows)
    // BEFORE the next round's rolling checkpoint deletes the assignment
    // it was computed from — the final union reads summaries, never a
    // superseded assignment round
    val out = (2 to rounds).foldLeft {
      val a1 = cp.rolling(assignTo(seedCentroids(df, k, idCol, vecCol)))
      (cp(summarize(a1, 1)), a1)
    } { case ((acc, prev), r) =>
      val ar = cp.rolling(assignTo(updated(prev)))
      (acc.unionAll(cp(summarize(ar, r))), ar)
    }._1
    out.orderBy("round", "cluster")
  }

  /** Greedy farthest-point seeding (Gonzalez 1985 k-center; the
    * deterministic cousin of k-means++): start from the minimum-id
    * vector, then k−1 times pick the vector maximizing its distance to
    * the nearest already-chosen center. A 2-approximation to the
    * optimal k-center cover — the spread-out initialization that makes
    * one Lloyd pass (or an IVF coarse quantizer) behave, where the
    * residue-class seeds of [[seedCentroids]] can start clumped.
    *
    * Returns (step, center_id, radius): radius is the chosen vector's
    * exact squared distance to the nearest previous center (0 for step
    * 0) cast to double — step s's radius is the k-center cover radius
    * after s centers.
    *
    * Determinism: distances are exact decimals ([[sqDist]]) and each
    * argmax breaks ties on the lower id, so the chosen set is
    * bit-identical on any engine/partitioning — a DuckDB oracle
    * replays the identical unrolled steps.
    *
    * Scale shape: k passes over the corpus, each a narrow projection
    * against ≤ k broadcast centers with a map-side `min(struct)`
    * partial collapsing to ONE exchanged row per vector, then a 1-row
    * global argmax — no pairwise joins, no windows. The per-round
    * checkpoint keeps round r from re-evaluating rounds 1..r−1
    * (the [[Graph.pageRank]] discipline).
    */
  def farthestPointSeeds(df: DataFrame, k: Int,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding",
                         checkpoint: Boolean = true,
                         checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1, "k must be positive")
    val cp = Checkpointing.truncator(df.sparkSession, checkpoint,
      checkpointDir)
    val pts = cp(df.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast(LongType).as("_id"), dec(col(vecCol)).as("_x")))
    var centers = cp.rolling(pts.orderBy("_id").limit(1)
      .select(lit(0).as("step"), col("_id").as("center_id"),
        lit(0.0).as("radius"), col("_x").as("_cv")))
    for (s <- 1 until k) {
      val dmin = pts.crossJoin(broadcast(centers.select(col("_cv"))))
        .groupBy(col("_id"))
        .agg(min(sqDist(col("_x"), col("_cv"))).as("_d"),
          first(col("_x")).as("_xx")) // _x is constant per id
      val next = dmin
        .agg(min(struct((col("_d") * -1).as("_nd"), col("_id").as("_id"),
          col("_xx").as("_xx"))).as("_m"))
        .select(lit(s).as("step"), col("_m._id").as("center_id"),
          (col("_m._nd") * -1).cast(DoubleType).as("radius"),
          col("_m._xx").as("_cv"))
      centers = cp.rolling(centers.unionAll(next))
    }
    centers.select(col("step"), col("center_id"), col("radius"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Graph analytics over edge tables (SURVEY.md §2c extension surface):
  * PageRank-style importance propagation — the crawl-frontier /
  * source-weighting signal web-corpus curation pipelines attach to
  * documents (OPIC, Common Crawl harmonic centrality). Complements
  * [[Dedup.connectedComponents]] (reachability) with a magnitude.
  *
  * Cross-engine determinism: iterative PageRank is normally hostage to
  * IEEE summation order. Here each edge contribution `r(u)/outdeg(u)`
  * quantizes to DECIMAL(18,12) BEFORE the per-node sum (the ta14
  * pattern — a last-ulp divergence can't flip a 12-dp quantization),
  * so the per-iteration sums are exact rationals and the rank update
  * is three correctly-rounded IEEE ops (`reset/N + d·Σ`) on identical
  * operands — bit-identical on any engine or partitioning, which lets
  * a DuckDB oracle replay the identical unrolled iterations.
  *
  * Scale shape: classic BSP PageRank — per iteration one |E|-row join
  * keyed on src and one |V|-row aggregation keyed on dst; no
  * all-pairs, no driver-side state beyond the node count. Lineage is
  * truncated with a checkpoint per iteration (the
  * [[Dedup.connectedComponents]] discipline: each checkpoint outlives
  * only the next round's materialization).
  */
object Graph {

  /** `iterations` rounds of damped PageRank over a directed edge list
    * (srcCol, dstCol). Returns (v, r) for every node with at least one
    * OUT-edge (symmetrize the input if every endpoint should score).
    * `reset` is passed explicitly rather than derived as `1 − damping`
    * because `1.0 − 0.85` is NOT the double `0.15` — the caller (and
    * any SQL oracle) must state the literal it means.
    */
  def pageRank(edges: DataFrame, iterations: Int,
               damping: Double = 0.85, reset: Double = 0.15,
               srcCol: String = "src", dstCol: String = "dst",
               checkpoint: Boolean = true): DataFrame = {
    require(iterations >= 0, "iterations must be non-negative")
    // checkpoint = false exists for plan inspection only (PlanSpec pins
    // the per-iteration shape, which the checkpoint truncates away)
    def cp(df: DataFrame): DataFrame =
      if (checkpoint) df.localCheckpoint() else df
    val e = edges.select(col(srcCol).cast(LongType).as("src"),
      col(dstCol).cast(LongType).as("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // one materialized (src, dst, outdeg) table feeds every iteration —
    // without it each round re-evaluates the upstream edge pipeline
    val ed = cp(e.join(deg, "src"))
    val nodes = cp(ed.select(col("src").as("v")).distinct())
    val n = nodes.count()
    var ranks = nodes.select(col("v"), lit(1.0 / n).as("r"))
    var prevCp: DataFrame = null
    for (_ <- 1 to iterations) {
      val contrib = ed
        .join(ranks.select(col("v").as("src"), col("r")), "src")
        .select(col("dst"),
          (col("r") / col("outdeg")).cast(DecimalType(18, 12)).as("c"))
        .groupBy("dst").agg(sum(col("c")).as("cs"))
      val next = cp(nodes
        .join(contrib, col("v") === col("dst"), "left")
        .select(col("v"),
          (lit(reset / n) + lit(damping) *
            coalesce(col("cs").cast(DoubleType), lit(0.0))).as("r")))
      if (prevCp != null) prevCp.unpersist()
      prevCp = ranks
      ranks = next
    }
    ranks
  }
}

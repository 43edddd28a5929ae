package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Dev utility: measure LSH/IVF ANN recall against the brute-force
  * cosine top-5 across (bits, tables) / nprobe configurations — the
  * evidence base for the gate rows' recall floors.
  * Usage: runMain graft.tools.RecallProbe [sfDir]
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-recall-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = graft.Tables.load(spark, sfDir, "embeddings")
    val q = e.filter(col("vec_id") < 10)
    val exact = Similarity.cosineTopK(q, e, 5).select("qid", "cid").cache()
    val nExact = exact.count()

    def recallOf(ann: org.apache.spark.sql.DataFrame): Double = {
      val hit = ann.select("qid", "cid").join(exact, Seq("qid", "cid")).count()
      hit.toDouble / nExact
    }

    for ((bits, tables) <- Seq((4, 8), (4, 16), (3, 12))) {
      val t0 = System.nanoTime()
      val r = recallOf(Similarity.annTopK(q, e, 5, bits = bits, tables = tables))
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[recall] lsh bits=$bits%d tables=$tables%2d recall=$r%.3f  ${s}%.1f s")
    }
    for (nprobe <- Seq(4, 6, 8)) {
      val t0 = System.nanoTime()
      val r = recallOf(Similarity.ivfTopK(q, e, 5, nlist = 16, nprobe = nprobe))
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[recall] ivf nlist=16 nprobe=$nprobe%d recall=$r%.3f  ${s}%.1f s")
    }
    // two-level coarse assignment at corpus-scaled nlist: the recall
    // cost of scanning leaderGroups·(nlist/√nlist) cells instead of
    // all nlist during assignment/probing (the 100× rehearsal's
    // assignment-bound fix — see BENCH_NOTES r15)
    for ((nlist, nprobe) <- Seq((160, 6))) {
      val t0 = System.nanoTime()
      val r = recallOf(Similarity.ivfTopK(q, e, 5, nlist = nlist,
        nprobe = nprobe))
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[recall] ivf nlist=$nlist%d nprobe=$nprobe%d exact-assign recall=$r%.3f  ${s}%.1f s")
    }
    for ((np, lg) <- Seq((6, 2), (6, 3), (6, 4), (8, 3), (10, 3), (8, 4))) {
      val t0 = System.nanoTime()
      val r = recallOf(Similarity.ivfTopK(q, e, 5, nlist = 160, nprobe = np,
        twoLevelAssign = true, leaderGroups = lg))
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[recall] ivf nlist=160 nprobe=$np%d two-level lg=$lg%d recall=$r%.3f  ${s}%.1f s")
    }
    // PQ recall is measured against L2 ground truth (ADC approximates
    // squared euclidean, not cosine)
    val exactL2 = Similarity.l2TopK(q, e, 5).select("qid", "cid").cache()
    val nL2 = exactL2.count()
    def recallL2(ann: org.apache.spark.sql.DataFrame): Double =
      ann.select("qid", "cid").join(exactL2, Seq("qid", "cid")).count().toDouble / nL2
    for ((m, codes, shortlist, refine) <- Seq((16, 32, 50, 0), (16, 32, 100, 0),
      (16, 16, 100, 0), (16, 64, 100, 0), (16, 32, 100, 1), (16, 32, 100, 2))) {
      val t0 = System.nanoTime()
      val r = recallL2(Similarity.pqTopK(q, e, 5, m, codes, shortlist, refine))
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[recall] pq m=$m%d codes=$codes%2d short=$shortlist%2d refine=$refine%d recall=$r%.3f  ${s}%.1f s")
    }
    for ((nlist, nprobe, refine) <- Seq((8, 2, 0), (8, 4, 0), (16, 4, 0),
      (16, 8, 0), (16, 8, 1))) {
      val t0 = System.nanoTime()
      val r = recallL2(Similarity.ivfPqTopK(q, e, 5, nlist, nprobe,
        refineIters = refine))
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[recall] ivfpq nlist=$nlist%2d nprobe=$nprobe%d refine=$refine%d recall=$r%.3f  ${s}%.1f s")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity}

/** Behavior specs for the LLM-pipeline operators that the DuckDB oracle
  * can't express (hash-seeded LSH, HLL sketches, FP-ordered HOF math):
  * planted-duplicate recall, cross-implementation agreement, error
  * envelopes.
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("minhash LSH finds planted near-duplicates and skips unrelated docs") {
    val base = "the quick brown fox jumps over the lazy dog again and again " +
      "while the cat sleeps on the warm windowsill every single afternoon"
    val nearDup = base.replace("warm", "cold") // 1-word edit
    val unrelated = "completely different content about spark query engines " +
      "and columnar storage formats with vectorized execution pipelines"
    val docs = Seq((1L, base), (2L, nearDup), (3L, unrelated))
      .toDF("doc_id", "text")
    val pairs = Dedup.minHashCandidates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"near-dup pair missed: $pairs")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      s"unrelated docs bucketed together: $pairs")
  }

  test("simhash: near-dups within small hamming distance, unrelated far") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = Seq(
      (1L, base),
      (2L, base.replace("sigma", "omega")),
      (3L, "one two three four five six seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text")
    val h = Dedup.simHash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(h(1L), h(2L)) <= 12,
      s"near-dup hamming ${hamming(h(1L), h(2L))}")
    assert(hamming(h(1L), h(3L)) > 12,
      s"unrelated hamming ${hamming(h(1L), h(3L))}")
  }

  test("HOF cosine top-k agrees with the exact decimal formulation") {
    val exact = SparkEntry.queries("sim01_cosine_exact")(spark, sf)
      .select("qid", "cid", "rank").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val hof = SparkEntry.queries("sim02_cosine_topk_hof")(spark, sf)
      .select("qid", "cid", "rank").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(exact.toSet == hof.toSet,
      s"rankings diverge: ${exact.toSet.diff(hof.toSet)} vs ${hof.toSet.diff(exact.toSet)}")
  }

  test("HOF cosine values within fp tolerance of exact") {
    val exact = SparkEntry.queries("sim01_cosine_exact")(spark, sf)
      .select("qid", "cid", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val hof = SparkEntry.queries("sim02_cosine_topk_hof")(spark, sf)
      .select("qid", "cid", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    exact.foreach { case (k, v) =>
      assert(math.abs(hof(k) - v) < 1e-5, s"$k: $v vs ${hof(k)}")
    }
  }

  test("ANN LSH results are a subset of brute-force candidates with same scoring") {
    val e = Tables.load(spark, sf, "embeddings")
    val ann = Similarity.annTopK(e.filter($"vec_id" < 10), e, 5, bits = 8)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ann.nonEmpty)
    assert(ann.forall { case (q, c) => q != c })
  }

  test("IVF ANN: sane results and reasonable recall vs brute force") {
    val e = Tables.load(spark, sf, "embeddings")
    val brute = SparkEntry.queries("sim01_cosine_exact")(spark, sf)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(e.filter($"vec_id" < 10), e, 5,
      nlist = 16, nprobe = 8)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ivf.nonEmpty)
    assert(ivf.forall { case (q, c) => q != c })
    // with nprobe=8 of 16 lists, expect to recover a decent share of true top-5
    val recall = ivf.count(brute.contains).toDouble / brute.size
    assert(recall >= 0.3, s"IVF recall too low: $recall")
  }

  test("approx_count_distinct within 5% of exact") {
    val ev = Tables.events(spark, sf)
    val rows = ev.groupBy("event_type")
      .agg(approx_count_distinct($"user_id", 0.02).as("a"),
        countDistinct($"user_id").as("x"))
      .collect()
    rows.foreach { r =>
      val (a, x) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(a - x) / x < 0.05, s"${r.getString(0)}: approx $a exact $x")
    }
  }

  test("sessionize: session count bounded and gaps respected") {
    val s = SparkEntry.queries("ev02_sessionize")(spark, sf)
    val bad = s.filter($"session_end" < $"session_start").count()
    assert(bad == 0)
    assert(s.count() > 0)
  }

  test("connected components: transitive chains merge, islands stay apart") {
    // chain 1-2-3 (1~3 only transitively), pair 10-11, singleton edge 20-21
    val edges = Seq((2L, 1L), (2L, 3L), (10L, 11L), (21L, 20L))
      .toDF("src", "dst")
    val cc = Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc(1L) == 1L && cc(2L) == 1L && cc(3L) == 1L,
      s"chain not merged: $cc")
    assert(cc(10L) == 10L && cc(11L) == 10L)
    assert(cc(20L) == 20L && cc(21L) == 20L)
  }

  test("connected components: long path converges within diameter rounds") {
    // path 1-2-3-...-8: min-label needs ~diameter rounds to reach the end
    val edges = (1L until 8L).map(i => (i, i + 1)).toDF("src", "dst")
    val cc = Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 8L).forall(cc(_) == 1L), s"path not fully labeled: $cc")
  }

  test("entry flagship returns daily rollup rows") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSeq ==
      Seq("day", "n_events", "total_value", "error_rate"))
  }
}

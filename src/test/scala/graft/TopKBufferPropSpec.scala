package graft

import org.scalacheck.{Gen, Arbitrary}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TopKAggExpr, TopKBuffer}

/** Property tests for the k-slot insertion buffer every sim query's
  * bounded top-k aggregate rides on: against the sort-based reference,
  * the buffer must agree under arbitrary insert orders, partial-buffer
  * MERGES (the map-side combine path), and the serialize/deserialize
  * round-trip that carries partial buffers across the exchange.
  */
class TopKBufferPropSpec extends AnyFunSuite {

  private def reference(pairs: Seq[(Double, Long)], k: Int,
                        ascending: Boolean): Seq[(Double, Long)] = {
    val ord = if (ascending) Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)
              else Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.Long)
    pairs.sorted(ord).take(k)
  }

  private def drain(b: TopKBuffer): Seq[(Double, Long)] =
    (0 until b.n).map(i => (b.scores(i), b.ids(i)))

  private val pairGen: Gen[(Double, Long)] = for {
    // scores from a small value pool so ties are COMMON (the tie-break
    // by id is exactly what the window-equivalence claim depends on)
    s <- Gen.oneOf(Gen.choose(-5, 5).map(_.toDouble / 2.0),
      Gen.choose(-1e9, 1e9).map(_ / 1e6))
    i <- Gen.choose(-1000L, 1000L)
  } yield (s, i)

  private def sample[A](g: Gen[A], seed: Long): A =
    g(Gen.Parameters.default, Seed(seed)).get

  test("insert: buffer equals sort-take-k under arbitrary order, heavy ties") {
    for (trial <- 0 until 300) {
      val n = sample(Gen.choose(0, 60), 7000L + trial)
      val pairs = (0 until n).map(j => sample(pairGen, trial * 1000L + j))
      val k = sample(Gen.choose(1, 12), 9000L + trial)
      val asc = trial % 2 == 0
      val buf = new TopKBuffer(k, asc)
      pairs.foreach { case (s, i) => buf.insert(s, i) }
      assert(drain(buf) == reference(pairs, k, asc),
        s"trial $trial k=$k asc=$asc pairs=$pairs")
    }
  }

  test("merge: combining split partial buffers equals one global buffer") {
    for (trial <- 0 until 200) {
      val n = sample(Gen.choose(0, 80), 17000L + trial)
      val pairs = (0 until n).map(j => sample(pairGen, trial * 2000L + j))
      val k = sample(Gen.choose(1, 10), 19000L + trial)
      val cut = if (n == 0) 0 else sample(Gen.choose(0, n), 21000L + trial)
      val asc = trial % 2 == 1
      val (l, r) = pairs.splitAt(cut)
      val a = new TopKBuffer(k, asc); l.foreach { case (s, i) => a.insert(s, i) }
      val b = new TopKBuffer(k, asc); r.foreach { case (s, i) => b.insert(s, i) }
      val expr = TopKAggExpr(null, null, k, asc)
      val merged = expr.merge(a, b)
      assert(drain(merged) == reference(pairs, k, asc),
        s"trial $trial k=$k asc=$asc cut=$cut pairs=$pairs")
    }
  }

  test("serde: serialize/deserialize round-trips the partial buffer exactly") {
    for (trial <- 0 until 100) {
      val n = sample(Gen.choose(0, 40), 31000L + trial)
      val pairs = (0 until n).map(j => sample(pairGen, trial * 3000L + j))
      val k = sample(Gen.choose(1, 8), 33000L + trial)
      val asc = trial % 2 == 0
      val buf = new TopKBuffer(k, asc)
      pairs.foreach { case (s, i) => buf.insert(s, i) }
      val expr = TopKAggExpr(null, null, k, asc)
      val back = expr.deserialize(expr.serialize(buf))
      assert(drain(back) == drain(buf), s"trial $trial")
      // and a deserialized buffer keeps accepting inserts correctly
      val extra = (0 until 5).map(j => sample(pairGen, 37000L + trial * 10 + j))
      extra.foreach { case (s, i) => back.insert(s, i) }
      assert(drain(back) == reference(pairs ++ extra, k, asc), s"trial $trial")
    }
  }
}

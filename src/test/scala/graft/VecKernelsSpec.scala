package graft

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VecKernels._

/** Equivalence pins for the compiled vector kernels (r20 optimization):
  * each kernel must reproduce its original higher-order-function
  * formulation BIT-IDENTICALLY — same IEEE fold order, same decimal
  * promotion and overflow-null, same null poisoning — on adversarial
  * inputs (nulls, length mismatches, empties, float elements, overflow
  * magnitudes). A kernel that diverges on any row would silently change
  * declared-query results, so these pins are the safety net under every
  * call-site swap.
  */
class VecKernelsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(20241207L)

  private def randVec(n: Int, nullEvery: Int = 0): Seq[java.lang.Double] =
    (0 until n).map { i =>
      if (nullEvery > 0 && i % nullEvery == nullEvery - 1) null
      else java.lang.Double.valueOf((rnd.nextDouble() - 0.5) * 2e3)
    }

  /** Pair fixtures: equal-length clean, mismatched lengths, embedded
    * nulls, empty arrays, whole-side null, large magnitudes.
    */
  private def pairRows: Seq[(Seq[java.lang.Double], Seq[java.lang.Double])] = {
    val clean = (1 to 30).map(_ => (randVec(64), randVec(64)))
    val short = (1 to 10).map(n => (randVec(n), randVec(n)))
    val mism = Seq((randVec(5), randVec(7)), (randVec(7), randVec(5)),
      (randVec(0), randVec(3)), (randVec(3), randVec(0)))
    val nulls = Seq((randVec(8, 3), randVec(8)), (randVec(8), randVec(8, 4)),
      (randVec(8, 2), randVec(8, 2)))
    val empty = Seq((Seq.empty[java.lang.Double], Seq.empty[java.lang.Double]))
    val sideNull = Seq((null, randVec(4)), (randVec(4), null),
      (null, null)).asInstanceOf[Seq[(Seq[java.lang.Double], Seq[java.lang.Double])]]
    val big = Seq((Seq[java.lang.Double](9.999999e5, -9.999999e5, 1.5e6),
      Seq[java.lang.Double](9.999999e5, 9.999999e5, 2.0)))
    clean ++ short ++ mism ++ nulls ++ empty ++ sideNull ++ big
  }

  private def assertSame(df: org.apache.spark.sql.DataFrame,
                         kernel: Column, hof: Column, label: String): Unit = {
    val rows = df.select(kernel.as("k"), hof.as("h")).collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.isNullAt(0) == r.isNullAt(1),
        s"$label row $i nullness: kernel=${r.get(0)} hof=${r.get(1)}")
      if (!r.isNullAt(0))
        assert(r.get(0) == r.get(1),
          s"$label row $i value: kernel=${r.get(0)} hof=${r.get(1)}")
    }
  }

  private def dfD = pairRows.toDF("a", "b")

  /** pairRows minus the >1e6 magnitudes: under ANSI (the Spark 4
    * default this suite runs with) those overflow the DECIMAL(12,6)
    * element cast and THROW on both formulations — exercised by the
    * dedicated overflow test below, not by value comparison.
    */
  private def dfDInRange = pairRows.filter { case (a, b) =>
    Seq(a, b).forall(v => v == null ||
      v.forall(x => x == null || math.abs(x) < 1e6))
  }.toDF("a", "b")

  test("vec_dot_d ≡ aggregate(zip_with(*, *), 0.0, +) incl. null poisoning") {
    val hof = aggregate(zip_with(col("a"), col("b"), (p, q) => p * q),
      lit(0.0), (acc, v) => acc + v)
    assertSame(dfD, vec_dot_d(col("a"), col("b")), hof, "dotD")
  }

  test("vec_dot_d on float arrays ≡ HOF over cast(double)") {
    val fdf = pairRows.map { case (a, b) =>
      (if (a == null) null else a.map(x => if (x == null) null
        else java.lang.Float.valueOf(x.floatValue())),
       if (b == null) null else b.map(x => if (x == null) null
        else java.lang.Float.valueOf(x.floatValue())))
    }.toDF("a", "b")
    def dbl(c: Column) = transform(c, x => x.cast(DoubleType))
    val hof = aggregate(zip_with(dbl(col("a")), dbl(col("b")),
      (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    assertSame(fdf, vec_dot_d(col("a"), col("b")), hof, "dotD/float")
  }

  test("vec_sqdist_d ≡ aggregate(zip_with((x-y)²), 0.0, +)") {
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)
    assertSame(dfD, vec_sqdist_d(col("a"), col("b")), hof, "sqDistD")
  }

  test("vec_sub_d ≡ zip_with(x - y) incl. padded/mismatched tails") {
    val hof = zip_with(col("a"), col("b"), (x, y) => x - y)
    assertSame(dfD, vec_sub_d(col("a"), col("b")), hof, "subD")
  }

  test("vec_dot_dec ≡ decimal fold (double inputs, fused dec6 cast)") {
    def dec(c: Column) = transform(c, x => x.cast(DoubleType).cast(DecimalType(12, 6)))
    val hof = aggregate(zip_with(dec(col("a")), dec(col("b")), (p, q) => p * q),
      lit(0).cast(DecimalType(30, 12)),
      (acc, v) => (acc + v).cast(DecimalType(30, 12)))
    assertSame(dfDInRange, vec_dot_dec(col("a"), col("b")), hof, "dotDec/double")
  }

  test("vec_dot_dec ≡ decimal fold (pre-cast decimal(12,6) arrays)") {
    def dec(c: Column) = transform(c, x => x.cast(DoubleType).cast(DecimalType(12, 6)))
    val ddf = dfDInRange.select(dec(col("a")).as("a"), dec(col("b")).as("b"))
    val hof = aggregate(zip_with(col("a"), col("b"), (p, q) => p * q),
      lit(0).cast(DecimalType(30, 12)),
      (acc, v) => (acc + v).cast(DecimalType(30, 12)))
    assertSame(ddf, vec_dot_dec(col("a"), col("b")), hof, "dotDec/decimal")
  }

  test("vec_sqdist_dec ≡ decimal (a-b)² fold (both input forms)") {
    def dec(c: Column) = transform(c, x => x.cast(DoubleType).cast(DecimalType(12, 6)))
    def hofOver(a: Column, b: Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0).cast(DecimalType(30, 12)),
        (acc, v) => (acc + v).cast(DecimalType(30, 12)))
    assertSame(dfDInRange, vec_sqdist_dec(col("a"), col("b")),
      hofOver(dec(col("a")), dec(col("b"))), "sqDistDec/double")
    val ddf = dfDInRange.select(dec(col("a")).as("a"), dec(col("b")).as("b"))
    assertSame(ddf, vec_sqdist_dec(col("a"), col("b")),
      hofOver(col("a"), col("b")), "sqDistDec/decimal")
  }

  test("vec_dot_dec: ANSI element-cast overflow throws on both formulations") {
    val df = Seq((Seq[java.lang.Double](1.5e6), Seq[java.lang.Double](2.0)))
      .toDF("a", "b")
    def dec(c: Column) = transform(c, x => x.cast(DoubleType).cast(DecimalType(12, 6)))
    val hof = aggregate(zip_with(dec(col("a")), dec(col("b")), (p, q) => p * q),
      lit(0).cast(DecimalType(30, 12)),
      (acc, v) => (acc + v).cast(DecimalType(30, 12)))
    assertThrows[Exception](df.select(hof).collect())
    assertThrows[Exception](df.select(vec_dot_dec(col("a"), col("b"))).collect())
  }

  test("vec_dot_l ≡ aggregate(zip_with(*), 0L, +) with long wrap") {
    val rows = (1 to 20).map { _ =>
      val n = 1 + rnd.nextInt(64)
      ((0 until n).map(_ => java.lang.Long.valueOf(rnd.nextInt(255) - 127L)),
       (0 until n).map(_ => java.lang.Long.valueOf(rnd.nextInt(255) - 127L)))
    } ++ Seq((Seq[java.lang.Long](1L, null), Seq[java.lang.Long](2L, 3L)),
      (Seq[java.lang.Long](1L), Seq[java.lang.Long](1L, 2L)))
    val df = rows.toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"), (p, q) => p * q),
      lit(0L), (acc, v) => acc + v)
    assertSame(df, vec_dot_l(col("a"), col("b")), hof, "dotL")
    // ANSI long-multiply overflow throws on both formulations
    val odf = Seq((Seq[java.lang.Long](Long.MaxValue, 3L),
      Seq[java.lang.Long](2L, 5L))).toDF("a", "b")
    assertThrows[Exception](odf.select(hof).collect())
    assertThrows[Exception](odf.select(vec_dot_l(col("a"), col("b"))).collect())
  }

  test("simhash_vote ≡ nested per-bit majority fold (nulls vote -1)") {
    val rows = (1 to 25).map { _ =>
      val n = 1 + rnd.nextInt(120)
      (0 until n).map(_ => java.lang.Long.valueOf(rnd.nextLong()))
    } ++ Seq(Seq[java.lang.Long](), Seq[java.lang.Long](null, 5L, null),
      Seq[java.lang.Long](-1L), Seq[java.lang.Long](0L))
    val df = rows.toDF("hs")
    val hof = aggregate(
      sequence(lit(0), lit(63)), lit(0L),
      (acc, b) => acc + when(
        aggregate(col("hs"), lit(0),
          (v, h) => v + when(call_function("shiftright", h, b)
            .bitwiseAND(1) === 1, 1).otherwise(-1)) > 0,
        call_function("shiftleft", lit(1L), b)).otherwise(0L))
      .cast(LongType)
    assertSame(df, simhash_vote(col("hs")), hof, "simHashVote")
  }

  test("sig_agree ≡ size(filter(zip_with(===), identity)) incl. size(null) = -1") {
    val rows = (1 to 25).map { _ =>
      val n = 1 + rnd.nextInt(32)
      val a = (0 until n).map(_ => java.lang.Long.valueOf(rnd.nextInt(4).toLong))
      val b = (0 until n).map(i =>
        if (rnd.nextBoolean()) a(i) else java.lang.Long.valueOf(rnd.nextInt(4).toLong))
      (a, b)
    } ++ Seq((Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](1L, null, 3L)),
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](1L, 2L, 3L)),
      (null, Seq[java.lang.Long](1L)),
      (Seq[java.lang.Long](1L), null))
      .asInstanceOf[Seq[(Seq[java.lang.Long], Seq[java.lang.Long])]]
    val df = rows.toDF("a", "b")
    val hof = size(filter(zip_with(col("a"), col("b"), (x, y) => x === y), v => v))
    assertSame(df, sig_agree(col("a"), col("b")), hof, "sigAgree")
  }

  test("lsh_sigs ≡ lshTables' per-table xxhash64 hyperplane signatures") {
    val (bits, tables) = (4, 16)
    val rows = (1 to 20).map(_ => randVec(64)) ++
      (1 to 5).map(_ => randVec(1 + rnd.nextInt(16))) ++
      Seq(randVec(8, 3), Seq.empty[java.lang.Double], null)
    val df = rows.toDF("v")
    // verbatim from Similarity.lshTables
    def sig(t: Column): Column = {
      val planes = (0 until bits).map { j =>
        val proj = aggregate(
          zip_with(col("v"), sequence(lit(0), size(col("v")) - 1), (x, p) =>
            x.cast(DoubleType) *
              (when(pmod(xxhash64(t * bits + j, p), lit(2)) === 0, 1.0)
                .otherwise(-1.0))),
          lit(0.0), (acc, v) => acc + v)
        when(proj > 0, call_function("shiftleft", lit(1L), lit(j))).otherwise(0L)
      }
      planes.reduce(_ + _)
    }
    val hof = transform(sequence(lit(0), lit(tables - 1)), sig(_))
    assertSame(df, lsh_sigs(col("v"), bits, tables), hof, "lshSigs")
  }

  test("word_ngrams ≡ array_distinct(transform(sequence, concat_ws(slice)))") {
    val words = Seq("the", "quick", "brown", "fox", "the", "quick", "brown",
      "dog", "a", "b")
    val rows = (1 to 30).map { _ =>
      val len = 3 + rnd.nextInt(40)
      (0 until len).map(_ => words(rnd.nextInt(words.length)))
    }.map(_.map(w => w: String)) ++
      Seq(Seq("a", "b", "c"), Seq("x", "x", "x", "x"))
    val nullRows = Seq(Seq[String]("a", null, "c", "d"))
    for (n <- Seq(3, 5)) {
      val df = (rows ++ nullRows).filter(_.length >= n).toDF("w")
      val hof = array_distinct(
        transform(sequence(lit(0), size(col("w")) - n),
          i => concat_ws(" ", slice(col("w"), i + 1, lit(n)))))
      assertSame(df, word_ngrams(col("w"), n), hof, s"wordNgrams/n=$n")
    }
  }

  test("id_pairs ≡ flatten(transform(ids, a => transform(filter(b > a), struct)))") {
    val rows = (1 to 25).map { _ =>
      val n = 1 + rnd.nextInt(20)
      (0 until n).map(_ => java.lang.Long.valueOf(rnd.nextInt(30).toLong))
    } ++ Seq(Seq[java.lang.Long](), Seq[java.lang.Long](5L),
      Seq[java.lang.Long](3L, null, 7L, 1L))
    val df = rows.toDF("ids")
    val hof = flatten(transform(col("ids"), a =>
      transform(filter(col("ids"), b => b > a),
        b => struct(a.as("da"), b.as("db")))))
    assertSame(df, id_pairs(col("ids")), hof, "idPairs")
  }

  test("to_dec6 ≡ transform(cast(double).cast(decimal(12,6)))") {
    val df = dfDInRange.select(col("a"))
    val hof = transform(col("a"), x => x.cast(DoubleType).cast(DecimalType(12, 6)))
    assertSame(df, to_dec6(col("a")), hof, "toDec6")
  }

  test("hplane_projs ≡ the centered-sketch decimal projection folds") {
    // verbatim hyperplaneSign/hyperplaneProj from Dedup (pre-kernel)
    def hSign(j: Column, p: Column): Column = {
      val idx = (j * 4096 + p + 1).cast(LongType)
      val h1 = pmod(idx * 2654435761L, lit(2147483648L))
      val h2 = h1.bitwiseXOR(call_function("shiftright", h1, lit(16)))
      val h3 = pmod(h2 * 1597334677L, lit(2147483648L))
      val h4 = h3.bitwiseXOR(call_function("shiftright", h3, lit(16)))
      when(pmod(h4, lit(2)) === 0, 1).otherwise(-1)
    }
    def hProj(arr: Column, j: Column): Column =
      aggregate(
        zip_with(arr, sequence(lit(0), size(arr) - 1), (x, p) =>
          (x * hSign(j, p)).cast(DecimalType(22, 6))),
        lit(java.math.BigDecimal.ZERO).cast(DecimalType(22, 6)),
        (a, t) => (a + t).cast(DecimalType(22, 6)))
    val bits = 8
    val rows = (1 to 20).map(_ => randVec(64)) ++
      (1 to 5).map(_ => randVec(1 + rnd.nextInt(16))) ++
      Seq(randVec(8, 3), Seq.empty[java.lang.Double])
    val df = rows.toDF("v")
      .select(transform(col("v"),
        x => x.cast(DoubleType).cast(DecimalType(12, 6))).as("d"), col("v"))
    val hof = transform(sequence(lit(0), lit(bits - 1)), j => hProj(col("d"), j))
    // kernel over the RAW double array (fused dec6 cast) must equal
    // the HOF over the pre-cast decimal array
    assertSame(df, hplane_projs(col("v"), bits), hof, "hplaneProjs")
  }

  test("max_run ≡ the sorted-token run fold (incl. empty-string tokens)") {
    val words = Seq("a", "b", "c", "", "dd", "a", "a", "b")
    val rows = (1 to 30).map { _ =>
      val len = rnd.nextInt(60)
      (0 until len).map(_ => words(rnd.nextInt(words.length)))
    } ++ Seq(Seq(""), Seq("", ""), Seq[String]())
    val df = rows.toDF("t").select(array_sort(col("t")).as("s"))
    def run(acc: Column, x: Column): Column =
      when(x === acc.getField("prev"), acc.getField("run") + 1).otherwise(lit(1L))
    val hof = aggregate(col("s"),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => struct(x.as("prev"), run(acc, x).as("run"),
        greatest(acc.getField("best"), run(acc, x)).as("best")),
      acc => acc.getField("best"))
    assertSame(df, max_run(col("s")), hof, "maxRun")
  }

  test("winnow_fps ≡ md5-gram + window-min + distinct HOF pipeline") {
    val words = Seq("the", "quick", "brown", "fox", "dog", "a")
    val (k, w) = (3, 4)
    val rows = (1 to 30).map { _ =>
      val len = rnd.nextInt(40)
      (0 until len).map(_ => words(rnd.nextInt(words.length)))
    } ++ Seq(Seq("a", "b"), Seq("a", "b", "c"), Seq[String]())
    val df = rows.toDF("t")
    val grams = when(size(col("t")) >= k,
      transform(sequence(lit(0), size(col("t")) - k),
        i => md5(concat_ws(" ", slice(col("t"), i + 1, lit(k))))))
      .otherwise(array().cast(ArrayType(StringType)))
    val hof = array_distinct(transform(
      sequence(lit(0), greatest(size(col("g")) - w, lit(0))),
      j => array_min(slice(col("g"), j + 1, lit(w)))))
    // the HOF pipeline only defines fingerprints for docs WITH grams
    // (the operator filters size(_grams) > 0 first); compare there and
    // pin the kernel's empty-case separately
    val withGrams = df.select(col("t"), grams.as("g")).filter(size(col("g")) > 0)
    assertSame(withGrams, winnow_fps(col("t"), k, w), hof, "winnowFps")
    val empty = df.filter(size(col("t")) < k)
      .select(winnow_fps(col("t"), k, w).as("f")).collect()
    empty.foreach(r => assert(r.getSeq[String](0).isEmpty))
  }

  test("nearest_code_l2 ≡ the argmin when-fold over struct arrays") {
    // codes arrays of (code asc, 4-dim cvec); vectors 4-dim; include a
    // width-mismatched cvec (null distance) first and midway
    val mk = (codes: Seq[(Long, Seq[java.lang.Double])]) => codes
    val rows = (1 to 20).map { _ =>
      val nc = 1 + rnd.nextInt(32)
      (mk((0 until nc).map(c => (c.toLong, randVec(4)))), randVec(4))
    } ++ Seq(
      (mk(Seq((0L, randVec(3)), (1L, randVec(4)), (2L, randVec(4)))), randVec(4)),
      (mk(Seq((5L, randVec(4)), (9L, randVec(3)))), randVec(4)),
      (mk(Seq.empty), randVec(4)))
    val df = rows.toDF("codes", "v")
      .select(transform(col("codes"),
        s => struct(s.getField("_1").as("_code"), s.getField("_2").as("cvec")))
        .as("codes"), col("v"))
    def l2(a: Column, b: Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (a2, t) => a2 + t)
    val hof = aggregate(col("codes"),
      struct(lit(null).cast(DoubleType).as("_d"),
        lit(null).cast(LongType).as("_c")),
      (acc, s) => {
        val d = l2(col("v"), s.getField("cvec"))
        when(acc.getField("_c").isNull || d < acc.getField("_d"),
          struct(d.as("_d"), s.getField("_code").cast(LongType).as("_c")))
          .otherwise(acc)
      }).getField("_c")
    assertSame(df, nearest_code_l2(col("codes"), col("v")), hof, "nearestCodeL2")
  }

  // ---------- r21 kernels ----------

  test("hamming_dist ≡ aggregate(zip_with(bit_count(xor)), 0L, +)") {
    val rows = (1 to 25).map { _ =>
      val n = 1 + rnd.nextInt(8)
      ((0 until n).map(_ => java.lang.Long.valueOf(rnd.nextLong())),
        (0 until n).map(_ => java.lang.Long.valueOf(rnd.nextLong())))
    } ++ Seq(
      (Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](1L, 2L, 3L)),
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](1L, 2L, 3L)),
      (Seq.empty[java.lang.Long], Seq.empty[java.lang.Long]),
      (null, Seq[java.lang.Long](1L)),
      (Seq[java.lang.Long](1L), null))
      .asInstanceOf[Seq[(Seq[java.lang.Long], Seq[java.lang.Long])]]
    val df = rows.toDF("a", "b")
    val hof = aggregate(
      zip_with(col("a"), col("b"),
        (a, b) => bit_count(a.bitwiseXOR(b)).cast(LongType)),
      lit(0L), (acc, v) => acc + v)
    assertSame(df, hamming_dist(col("a"), col("b")), hof, "hammingDist")
  }

  test("binary_code ≡ the transform/aggregate sign-bit packing chain") {
    // lengths straddling the 64-dim word boundary, null elements,
    // exact zeros (strictly-positive test), empty and null vectors
    val rows = (1 to 20).map { _ =>
      randVec(1 + rnd.nextInt(140))
    } ++ Seq(randVec(64), randVec(65), randVec(128), randVec(129),
      randVec(20, 3), Seq[java.lang.Double](0.0, -0.0, 1.0, -1.0),
      Seq.empty[java.lang.Double], null)
    for ((df, label) <- Seq(
      (rows.toDF("v"), "double"),
      (rows.map(r => if (r == null) null else r.map(x =>
        if (x == null) null else java.lang.Float.valueOf(x.floatValue())))
        .toDF("v"), "float"))) {
      val hof = transform(sequence(lit(0),
        ((size(col("v")) - 1) / 64).cast(IntegerType)), w =>
        aggregate(sequence(lit(0), lit(63)), lit(0L), (acc, j) => {
          val idx = w * 64 + j + 1
          acc + when(idx <= size(col("v")) &&
            element_at(col("v"), idx).cast(DoubleType) > 0.0,
            call_function("shiftleft", lit(1L), j)).otherwise(0L)
        }))
      assertSame(df, binary_code(col("v")), hof, s"binaryCode/$label")
    }
  }

  test("to_double ≡ transform(cast(double)) over float/long/double") {
    val base = (1 to 20).map(_ => randVec(1 + rnd.nextInt(32))) ++
      Seq(randVec(8, 3), Seq.empty[java.lang.Double], null)
    def hof = transform(col("v"), x => x.cast(DoubleType))
    assertSame(base.toDF("v"), to_double(col("v")), hof, "toDouble/double")
    val fl = base.map(r => if (r == null) null else r.map(x =>
      if (x == null) null else java.lang.Float.valueOf(x.floatValue())))
    assertSame(fl.toDF("v"), to_double(col("v")), hof, "toDouble/float")
    val lg = base.map(r => if (r == null) null else r.map(x =>
      if (x == null) null else java.lang.Long.valueOf(x.longValue())))
    assertSame(lg.toDF("v"), to_double(col("v")), hof, "toDouble/long")
  }

  test("word_ngrams_all ≡ transform(sequence, concat_ws(slice)) in order") {
    val words = Seq("the", "quick", "brown", "fox", "the", "quick")
    val rows = (1 to 30).map { _ =>
      val len = 3 + rnd.nextInt(40)
      (0 until len).map(_ => words(rnd.nextInt(words.length)): String)
    } ++ Seq(Seq("a", "b", "c"), Seq("x", "x", "x", "x"),
      Seq[String]("a", null, "c", "d", "e"))
    for (n <- Seq(3, 5)) {
      val df = rows.filter(_.length >= n).toDF("w")
      val hof = transform(sequence(lit(0), size(col("w")) - n),
        i => concat_ws(" ", slice(col("w"), i + 1, lit(n))))
      assertSame(df, word_ngrams_all(col("w"), n), hof, s"wordNgramsAll/n=$n")
    }
  }

  test("bigram_heads / bigram_pairs ≡ the when/transform struct chains") {
    val words = Seq("a", "bb", "ccc", "dd", "e")
    val rows = (1 to 30).map { _ =>
      val len = rnd.nextInt(12) // includes 0- and 1-token docs
      (0 until len).map(_ => words(rnd.nextInt(words.length)): String)
    } ++ Seq(Seq[String]("a", null, "c"), Seq[String](null, null),
      Seq.empty[String], null)
    val df = rows.toDF("t")
    val toks = col("t")
    val hofHeads =
      when(size(toks) >= 2, transform(sequence(lit(0), size(toks) - 2),
        i => struct(
          concat_ws(" ", slice(toks, i + 1, lit(2))).as("bg"),
          element_at(toks, i + 1).as("w1"))))
        .otherwise(array().cast(ArrayType(StructType(Seq(
          StructField("bg", StringType), StructField("w1", StringType))))))
    val hofPairs =
      when(size(toks) >= 2, transform(sequence(lit(0), size(toks) - 2),
        i => struct(
          element_at(toks, i + 1).as("w1"),
          element_at(toks, i + 2).as("w2"))))
        .otherwise(array().cast(ArrayType(StructType(Seq(
          StructField("w1", StringType), StructField("w2", StringType))))))
    assertSame(df, bigram_heads(toks), hofHeads, "bigramHeads")
    assertSame(df, bigram_pairs(toks), hofPairs, "bigramPairs")
  }
}

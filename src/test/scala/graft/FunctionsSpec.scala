package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.GraftBridge
import graft.functions.{ArrayDotProduct, BpeApplyMerges, BpeTokenCount, WordShingles}

/** Custom codegen expressions: ArrayDotProduct and WordShingles must agree
  * with straightforward Scala computations (and, by extension, with the
  * declarative HOF formulations they replaced). Both codegen and interpreted
  * paths are exercised: the DataFrame pipeline uses whole-stage codegen,
  * `nullSafeEval` covers the interpreted fallback. */
class FunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("ArrayDotProduct: float arrays, sequential double fold") {
    val a = Array(1.5f, -2.0f, 3.25f)
    val b = Array(2.0f, 0.5f, -1.0f)
    val expected = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val out = Seq((a, b)).toDF("a", "b")
      .select(ArrayDotProduct.dot(col("a"), col("b")).as("d"))
      .collect().head.getDouble(0)
    assert(out === expected)
  }

  test("ArrayDotProduct: double × double and float × double (LSH plane shape)") {
    val v = Array(0.5f, 0.25f)
    val plane = Array(-1.0, 0.75)
    val out = Seq((v, plane)).toDF("v", "p")
      .select(ArrayDotProduct.dot(col("v"), col("p")).as("d"))
      .collect().head.getDouble(0)
    assert(out === (0.5 * -1.0 + 0.25 * 0.75))
    val dd = Seq((plane, plane)).toDF("a", "b")
      .select(ArrayDotProduct.dot(col("a"), col("b")).as("d"))
      .collect().head.getDouble(0)
    assert(dd === (1.0 + 0.75 * 0.75))
  }

  test("ArrayDotProduct: null input yields null; empty arrays yield 0.0") {
    val withNull = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
      .select(ArrayDotProduct.dot(col("a"), col("b")).as("d"))
      .collect().head
    assert(withNull.isNullAt(0))
    val empty = Seq((Array.empty[Float], Array.empty[Float])).toDF("a", "b")
      .select(ArrayDotProduct.dot(col("a"), col("b")).as("d"))
      .collect().head.getDouble(0)
    assert(empty === 0.0)
  }

  test("ArrayDotProduct: a null ELEMENT nulls the product (both engines' semantics)") {
    val withNullElem = Seq((Array[java.lang.Double](1.0, null), Array[java.lang.Double](2.0, 3.0)))
      .toDF("a", "b")
      .select(ArrayDotProduct.dot(col("a"), col("b")).as("d"))
      .collect().head
    assert(withNullElem.isNullAt(0))
    // A dimension MISMATCH yields null, never a silently-truncated score
    // (DuckDB's list_dot_product errors on mismatch; null is the
    // detectable Spark-side analog).
    val mismatch = Seq((Array[java.lang.Double](2.0), Array[java.lang.Double](4.0, 5.0)))
      .toDF("a", "b")
      .select(ArrayDotProduct.dot(col("a"), col("b")).as("d"))
      .collect().head
    assert(mismatch.isNullAt(0))
  }

  test("ArrayDotProduct: interpreted eval agrees with codegen result") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val mk = (xs: Array[Float]) =>
      Literal.create(new GenericArrayData(xs.map(x => x: Any)), ArrayType(FloatType))
    val e = ArrayDotProduct(mk(Array(1.0f, 2.0f)), mk(Array(3.0f, 4.0f)))
    assert(e.eval(null) === 11.0)
  }

  test("SortedIntersectCount ≡ size(array_intersect) on sorted arrays " +
    "(duplicates, empties, disjoint, null arrays)") {
    val cases = Seq(
      (Seq(1L, 3L, 5L, 7L), Seq(3L, 4L, 5L, 9L)),        // partial overlap
      (Seq(1L, 1L, 2L, 2L, 3L), Seq(1L, 2L, 2L, 4L)),    // duplicate runs count once
      (Seq.empty[Long], Seq(1L, 2L)),                    // empty side
      (Seq(1L, 2L), Seq(5L, 6L)),                        // disjoint
      (Seq(-5L, 0L, 2L), Seq(-5L, 0L, 2L)),              // identical incl. negatives
      (Seq(Long.MinValue, Long.MaxValue), Seq(Long.MinValue, Long.MaxValue)))
    val df = cases.toDF("a", "b")
    val out = df.select(
      graft.functions.SortedIntersectCount.count(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .collect()
    out.foreach(r => assert(r.getLong(0) === r.getLong(1), r.toString))
    // A null ARRAY nulls the count (same as array_intersect).
    val withNull = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
      .select(graft.functions.SortedIntersectCount.count(col("a"), col("b")).as("c"))
      .collect().head
    assert(withNull.isNullAt(0))
  }

  test("SortedIntersectCount: interpreted eval agrees with codegen; " +
    "null ELEMENT runs count once when present in both") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    import graft.functions.SortedIntersectCount
    def mk(xs: Seq[Any]) =
      Literal.create(new GenericArrayData(xs.toArray), ArrayType(LongType, containsNull = true))
    assert(SortedIntersectCount(
      mk(Seq(1L, 2L, 2L, 7L)), mk(Seq(2L, 7L, 9L))).eval(null) === 2L)
    // sort_array(asc) places nulls FIRST: null in both sides ⇒ one common
    // distinct value, like array_intersect.
    assert(SortedIntersectCount(
      mk(Seq(null, 1L, 3L)), mk(Seq(null, null, 3L))).eval(null) === 2L)
    assert(SortedIntersectCount(
      mk(Seq(null, 1L)), mk(Seq(2L, 3L))).eval(null) === 0L)
  }

  test("WordShingles: adjacent n-grams, distinct, short-text empty") {
    def sh(text: String, n: Int): Seq[String] =
      Seq(Tuple1(text)).toDF("t")
        .select(WordShingles.shingles(col("t"), n).as("s"))
        .collect().head.getSeq[String](0)
    assert(sh("a b c d", 3) === Seq("a b c", "b c d"))
    assert(sh("a b", 3) === Seq.empty)
    assert(sh("x x x x", 2) === Seq("x x")) // distinct collapses repeats
    assert(sh("one", 1) === Seq("one"))
    // Trailing space ⇒ empty final word, exactly like split(text, ' ').
    assert(sh("a b c ", 3) === Seq("a b c", "b c "))
  }

  test("WordShingles: equivalent to the declarative HOF formulation") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a a a a a b a a",
      "merge batch data query table scan hash key",
      "short one",
      "")
    val df = texts.toDF("text")
    val ws = split(col("text"), " ")
    val hof = array_distinct(
      when(size(ws) >= 3,
        transform(sequence(lit(0), size(ws) - 3), i =>
          concat_ws(" ",
            element_at(ws, i + 1), element_at(ws, i + 2), element_at(ws, i + 3))))
        .otherwise(array().cast("array<string>")))
    val both = df.select(
      WordShingles.shingles(col("text"), 3).as("fast"), hof.as("ref"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[String](0).sorted === r.getSeq[String](1).sorted)
    }
  }

  test("WordNgrams: equivalent to the interpreted transform-lambda " +
    "formulation, positional and duplicate-keeping") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a a a a a b a a",
      "one two",
      "short",
      "",
      " leading and  double  spaces ",
      "x y z x y z x y")
    val df = texts.toDF("text")
    for (n <- Seq(2, 8)) {
      val guard = if (n == 2) "size(ws) - 1" else s"greatest(size(ws) - ${n - 1}, 0)"
      val lambda = (1 until n).map(k => s"ws[i + $k]").mkString(
        "(w, i) -> concat_ws(' ', w, ", ", ", ")")
      val rows = df
        .select(col("text"), split(col("text"), " ").as("ws"))
        .select(
          graft.functions.WordNgrams.ngrams(col("text"), n).as("fast"),
          expr(s"transform(slice(ws, 1, $guard), $lambda)").as("ref"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) === r.getSeq[String](1), s"n=$n")
      }
    }
  }

  test("WinnowFingerprints: equivalent to the declarative " +
    "gram→md5-hash→window-min→distinct chain") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog today",
      "a b c d",          // exactly gramN words: one gram, one window
      "a b c d e f",      // 3 grams < window 4: single whole-array window
      "w w w w w w w w w w w w",
      "join filter agg sort scan merge group table key column row hash")
    val df = texts.toDF("text")
    val rows = df
      .select(col("text"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 4)
      .withColumn("gs", expr(
        "transform(slice(ws, 1, size(ws) - 3), " +
          "(w, i) -> concat_ws(' ', w, ws[i+1], ws[i+2], ws[i+3]))"))
      .withColumn("hs", expr(
        "transform(gs, g -> CAST(conv(substring(md5(g), 1, 8), 16, 10) AS BIGINT))"))
      .select(
        graft.functions.WinnowFingerprints.fingerprints(col("text"), 4, 4)
          .as("fast"),
        expr(
          "array_distinct(transform(sequence(1, greatest(size(hs) - 3, 1)), " +
            "i -> array_min(slice(hs, i, 4))))").as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0).sorted === r.getSeq[Long](1).sorted)
    }
  }

  // Reference model of the greedy BPE fold — the exact semantics of the
  // declarative `aggregate` HOF the compiled kernel replaced. (The
  // executable Column-level reference, BpeTrain.applyMergeReference, is
  // pinned against the kernel in its own test below.)
  private def refFold(syms: Seq[String], merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(syms) { case (cur, (l, r)) =>
      cur.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == l && x == r)
          acc.init :+ (l + r)
        else acc :+ x
      }
    }

  test("BpeApplyMerges/BpeTokenCount ≡ greedy reference fold, " +
    "including chained-merge and self-merge edge cases") {
    val merges = Seq(("a", "b"), ("ab", "c"), ("x", "x"), ("abc", "abc"))
    val words = Seq(
      "abc",        // cascading: ab then abc
      "abcabc",     // then abc+abc self-merge
      "xxxx",       // greedy non-overlap: xx, xx
      "xxx",        // xx, x (the merged symbol does not re-match as left)
      "aab", "ba", "", "a", "zzz",
      "ababab", "cab", "abab")
    val df = words.toDF("w")
    val syms = split(col("w"), "")
    // The reference folds over the ENGINE's split result (same input array
    // the kernel sees), so split semantics are out of scope here — only the
    // fold is under test.
    val got = df.select(col("w"), syms.as("syms"),
      GraftBridge.column(
        BpeApplyMerges(GraftBridge.expression(syms), merges)).as("fast"),
      BpeTokenCount.count(syms, merges).as("cnt"))
      .collect()
    got.foreach { r =>
      val w = r.getString(0)
      val expect = refFold(r.getSeq[String](1), merges)
      assert(r.getSeq[String](2) === expect, s"word '$w'")
      assert(r.getLong(3) === expect.size.toLong, s"count for '$w'")
    }
  }

  test("BpeApplyMerges: interpreted eval agrees with the codegen path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val merges = Seq(("a", "b"), ("ab", "c"))
    val symsLit = Literal.create(Seq("a", "b", "c", "a", "b"),
      ArrayType(StringType))
    val expr = BpeApplyMerges(symsLit, merges)
    val viaEval = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toObjectArray(StringType).map(_.toString).toSeq
    val viaCodegen = spark.range(1)
      .select(GraftBridge.column(
        BpeApplyMerges(GraftBridge.expression(split(lit("abcab"), "")), merges))
        .as("r")).collect()(0).getSeq[String](0)
    assert(viaEval === viaCodegen)
    assert(BpeTokenCount(symsLit, merges).eval(null) === viaCodegen.size.toLong)
  }

  test("BpeApplyMerges ≡ the declarative aggregate-HOF reference " +
    "(BpeTrain.applyMergeReference) it replaced, merge by merge") {
    val merges = Seq(("a", "b"), ("ab", "c"), ("x", "x"))
    val words = Seq("abc", "abcabc", "xxxx", "xxx", "aab", "", "cab", "ababab")
    val df = words.toDF("w").select(col("w"), split(col("w"), "").as("syms"))
    merges.foreach { case (l, r) =>
      val rows = df.select(
        GraftBridge.column(BpeApplyMerges(
          GraftBridge.expression(col("syms")), Seq((l, r)))).as("fast"),
        graft.queries.BpeTrain.applyMergeReference(col("syms"), l, r).as("ref"))
        .collect()
      rows.foreach(rw =>
        assert(rw.getSeq[String](0) === rw.getSeq[String](1), s"merge ($l,$r)"))
    }
  }

  // ------------------------------------------------------------- PQ encode

  // Deterministic synthetic vectors/codebook (md5-free: plain index
  // arithmetic with sign flips is enough to exercise every code path).
  private def synthVec(seed: Int, dims: Int): Array[Float] =
    Array.tabulate(dims)(i =>
      (((seed * 31 + i * 17) % 13) - 6).toFloat / (1 + (i % 3)).toFloat)

  test("PqEncodeCodes ≡ the crossJoin + max_by(-cost,-j) formulation, " +
    "including exact-tie codewords (lowest j wins)") {
    import graft.functions.PqEncodeCodes
    val (m, k, d) = (4, 5, 3)
    val cb = IndexedSeq.tabulate(m) { mi =>
      IndexedSeq.tabulate(k) { ji =>
        // Codewords 1 and 3 of every subspace are IDENTICAL: every vector
        // ties exactly on them, so the argmin tie-break is always hit.
        val base = if (ji == 3) 1 else ji
        Array.tabulate(d)(i => (((mi + base * 7 + i * 5) % 9) - 4).toDouble / 4.0)
      }
    }
    val cn2 = cb.map(_.map(c => { var a = 0.0; var i = 0
      while (i < c.length) { a += c(i) * c(i); i += 1 }; a }).toIndexedSeq)
    val vecs = (0 until 40).map(s => (s.toLong, synthVec(s, m * d)))
    val df = vecs.toDF("vec_id", "embedding")
    val fast = df.select(col("vec_id"),
        posexplode(PqEncodeCodes.encode(col("embedding"), cb, cn2)).as(Seq("m", "j")))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    // Reference: the relational formulation the kernel replaced.
    val cbDf = (for (mi <- 0 until m; ji <- 0 until k)
      yield (mi, ji, cb(mi)(ji).toSeq, cn2(mi)(ji))).toDF("m", "j", "cvec", "cn2")
    val ref = df.crossJoin(broadcast(cbDf))
      .withColumn("cost", col("cn2") - lit(2.0) *
        ArrayDotProduct.dot(expr(s"slice(embedding, m * $d + 1, $d)"), col("cvec")))
      .groupBy(col("vec_id"), col("m"))
      .agg(max_by(col("j"),
        struct((-col("cost")).as("nc"), (-col("j")).as("nj"))).as("j"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(fast.size === vecs.size * m)
    assert(fast === ref)
    // The tied pair (codewords 1 and 3 identical): j=1 must always win.
    assert(fast.values.forall(_ != 3))
  }

  test("PqEncodeCodes: null/short contract and interpreted ≡ codegen") {
    import graft.functions.PqEncodeCodes
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val (m, k, d) = (2, 3, 2)
    val cb = IndexedSeq.tabulate(m)(mi => IndexedSeq.tabulate(k)(ji =>
      Array.tabulate(d)(i => (mi + ji - i).toDouble / 2.0)))
    val cn2 = cb.map(_.map(c => c.map(x => x * x).sum).toIndexedSeq)
    val rows = Seq(
      (1L, synthVec(1, m * d)),            // full length
      (2L, synthVec(2, m * d + 3)),        // longer: extra dims ignored
      (3L, synthVec(3, m * d - 1)),        // short: null
      (4L, null.asInstanceOf[Array[Float]])) // null input: null
    val out = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        PqEncodeCodes.encode(col("embedding"), cb, cn2).as("codes"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).isDefined && out(2L).isDefined)
    assert(out(3L).isEmpty && out(4L).isEmpty)
    // Longer input encodes identically to its m*d prefix.
    val prefixed = Seq((2L, synthVec(2, m * d + 3).take(m * d))).toDF("vec_id", "embedding")
      .select(PqEncodeCodes.encode(col("embedding"), cb, cn2)).collect()(0).getSeq[Int](0)
    assert(out(2L).get.asInstanceOf[scala.collection.Seq[Int]].toSeq === prefixed)
    // Interpreted eval ≡ codegen on the same literal.
    val flatCb = new Array[Double](m * k * d)
    val flatN = new Array[Double](m * k)
    for (mi <- 0 until m; ji <- 0 until k) {
      System.arraycopy(cb(mi)(ji), 0, flatCb, (mi * k + ji) * d, d)
      flatN(mi * k + ji) = cn2(mi)(ji)
    }
    val lit4 = Literal.create(synthVec(7, m * d).toSeq, ArrayType(FloatType))
    val viaEval = graft.functions.PqEncodeCodes(lit4, m, d, k, flatCb, flatN)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toIntArray().toSeq
    val viaCodegen = Seq((7L, synthVec(7, m * d))).toDF("vec_id", "embedding")
      .select(PqEncodeCodes.encode(col("embedding"), cb, cn2))
      .collect()(0).getSeq[Int](0)
    assert(viaEval === viaCodegen)
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Product-quantization encoder as one compiled scan-local pass: for each of
  * `m` subspaces of width `d`, the argmin-by-(cost, j) codeword index over
  * `k` codewords, where `cost = cn2(m,j) − 2·⟨x_m, c_(m,j)⟩` (the ‖x_m‖²
  * term is constant per (vector, subspace) and cancels out of the argmin).
  *
  * This replaces the relational formulation
  * {{{
  *   e.crossJoin(cb)                                    // k·m rows per vector
  *    .withColumn("cost", col("cn2") - lit(2.0) * dot(slice(emb,…), cvec))
  *    .groupBy("vec_id", "m")
  *    .agg(max_by(col("j"), struct(-col("cost"), -col("j"))))
  * }}}
  * which expands every vector k·m× through a join and pays a full shuffle
  * for the argmin — when the codebook is a driver-side constant the whole
  * computation is per-row. Bit-exactness with that formulation (pinned in
  * FunctionsSpec):
  *   - the inner product is the same sequential left-to-right double fold
  *     as [[ArrayDotProduct]] (each element widened to double before the
  *     multiply — the input arrays are float or double);
  *   - the cost is computed as `cn2 - 2.0 * dot` in that exact order;
  *   - the argmin comparison is `java.lang.Double.compare` on the NEGATED
  *     cost (the same total order `max_by(j, struct(-cost, -j))` applies,
  *     including −0.0 < 0.0 and NaN-greatest), ties keeping the lowest j.
  *
  * Null contract: a null input array, an input shorter than `m·d`
  * dimensions, or a null element anywhere in the first `m·d` positions
  * yields NULL (the relational form would produce null costs max_by then
  * skips — a partial code is a plausible-but-wrong answer, a null is
  * detectable). Output: `array<int>` of length `m`, element i = the chosen
  * codeword index of subspace i; `posexplode` recovers the relational
  * `(m, j)` rows.
  *
  * The codebook rides in the expression as a driver-side constant (a
  * trained-codebook refresh re-plans the query — the same lifecycle as
  * re-collecting a trained table to the driver). At real scale this is the
  * broadcast-the-small-side call with the join eliminated entirely: k·m·d
  * doubles (8 KB here) against a corpus-sized scan.
  */
case class PqEncodeCodes(
    child: Expression,
    subspaces: Int,
    subDim: Int,
    codewords: Int,
    codebook: Array[Double], // flattened [m][j][i] = codebook(m*k*d + j*d + i)
    cn2: Array[Double]) // flattened [m][j]
    extends UnaryExpression {

  require(codebook.length == subspaces * codewords * subDim,
    s"codebook length ${codebook.length} != m*k*d = ${subspaces * codewords * subDim}")
  require(cn2.length == subspaces * codewords,
    s"cn2 length ${cn2.length} != m*k = ${subspaces * codewords}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"argument must be array<float> or array<double>, got ${other.sql}")
  }

  override def nullable: Boolean = true

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val need = subspaces * subDim
    if (arr.numElements() < need) return null
    var p = 0
    while (p < need) { if (arr.isNullAt(p)) return null; p += 1 }
    val f = isFloat
    val out = new Array[Int](subspaces)
    var m = 0
    while (m < subspaces) {
      var bestJ = 0
      var bestNeg = Double.NegativeInfinity
      var j = 0
      while (j < codewords) {
        var acc = 0.0
        var i = 0
        val cOff = (m * codewords + j) * subDim
        val eOff = m * subDim
        while (i < subDim) {
          val x = if (f) arr.getFloat(eOff + i).toDouble else arr.getDouble(eOff + i)
          acc += x * codebook(cOff + i)
          i += 1
        }
        val neg = -(cn2(m * codewords + j) - 2.0 * acc)
        if (java.lang.Double.compare(neg, bestNeg) > 0) { bestNeg = neg; bestJ = j }
        j += 1
      }
      out(m) = bestJ
      m += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    val cnRef = ctx.addReferenceObj("pqCn2", cn2, "double[]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val need = subspaces * subDim
      val p = ctx.freshName("p")
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val neg = ctx.freshName("neg")
      val bestJ = ctx.freshName("bestJ")
      val bestNeg = ctx.freshName("bestNeg")
      val out = ctx.freshName("out")
      val cOff = ctx.freshName("cOff")
      s"""
         |if ($a.numElements() < $need) {
         |  ${ev.isNull} = true;
         |} else {
         |  boolean _anyNull = false;
         |  for (int $p = 0; $p < $need; $p++) {
         |    if ($a.isNullAt($p)) { _anyNull = true; break; }
         |  }
         |  if (_anyNull) {
         |    ${ev.isNull} = true;
         |  } else {
         |    int[] $out = new int[$subspaces];
         |    for (int $m = 0; $m < $subspaces; $m++) {
         |      int $bestJ = 0;
         |      double $bestNeg = Double.NEGATIVE_INFINITY;
         |      for (int $j = 0; $j < $codewords; $j++) {
         |        double $acc = 0.0;
         |        int $cOff = ($m * $codewords + $j) * $subDim;
         |        for (int $i = 0; $i < $subDim; $i++) {
         |          $acc += (double) $a.$getter($m * $subDim + $i) * $cbRef[$cOff + $i];
         |        }
         |        double $neg = -($cnRef[$m * $codewords + $j] - 2.0 * $acc);
         |        if (java.lang.Double.compare($neg, $bestNeg) > 0) {
         |          $bestNeg = $neg; $bestJ = $j;
         |        }
         |      }
         |      $out[$m] = $bestJ;
         |    }
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeCodes =
    copy(child = newChild)

  override def prettyName: String = "graft_pq_encode"
}

object PqEncodeCodes {
  /** Column-level entry point: PQ codes of `embedding` as `array<int>`
    * (element m = chosen codeword of subspace m). `codebook(m)(j)` is the
    * d-dim codeword, `cn2(m)(j)` its squared norm. */
  def encode(embedding: Column, codebook: IndexedSeq[IndexedSeq[Array[Double]]],
      cn2: IndexedSeq[IndexedSeq[Double]]): Column = {
    val m = codebook.length
    require(m > 0, "codebook must have at least one subspace")
    val k = codebook.head.length
    val d = codebook.head.head.length
    val flat = new Array[Double](m * k * d)
    val flatN = new Array[Double](m * k)
    for (mi <- 0 until m; ji <- 0 until k) {
      val c = codebook(mi)(ji)
      require(c.length == d, "ragged codebook")
      System.arraycopy(c, 0, flat, (mi * k + ji) * d, d)
      flatN(mi * k + ji) = cn2(mi)(ji)
    }
    GraftBridge.column(
      PqEncodeCodes(GraftBridge.expression(embedding), m, d, k, flat, flatN))
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Whole-stage-codegen distance kernels over `ARRAY<FLOAT>` columns — the
  * Spark-native replacement for the reference's hand-written AVX2 SIMD loops
  * (`/root/reference/src/core/vector_ops.rs:60-136`): a tight scalar JVM loop
  * inside generated code that HotSpot auto-vectorizes, staying inside
  * WholeStageCodegen instead of falling out to an interpreted higher-order
  * function.
  *
  * All kernels accumulate in double (f32 inputs, f64 math) and single-pass
  * fuse dot+norms for cosine. Zero-norm cosine returns 0.0, matching
  * `src/core/vector_ops.rs:44-48`. Null inputs propagate null (standard SQL
  * semantics); null ARRAY ELEMENTS are not supported (vectors are dense).
  * Mismatched dimensions throw (the reference rejects them too) — a
  * silently truncated distance would report spuriously close neighbors.
  */
object kernels {

  abstract class VectorBinaryExpression extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = left.nullable || right.nullable
  }

  /** M1: sum_i a[i]*b[i]. */
  /** Hamming distance between packed sign-bit word arrays (ARRAY<LONG>,
    * [[graft.operators.Bq]] layout): sum of Long.bitCount(xor) per word.
    * A codegen kernel because Spark's higher-order zip_with/aggregate stay
    * INTERPRETED — per-element lambda dispatch would dominate the one
    * xor+popcount of actual work on a 10M-pair scan and forfeit the code
    * tier's entire cost advantage over the raw-vector kernels. */
  case class HammingWords(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = LongType
    override def nullable: Boolean = left.nullable || right.nullable
    override def prettyName: String = "bq_hamming"
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      if (x.numElements() != y.numElements()) throw new IllegalArgumentException(
        s"word-array length mismatch: ${x.numElements()} vs ${y.numElements()}")
      var s = 0L; var i = 0
      while (i < x.numElements()) {
        s += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i)); i += 1
      }
      s
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n"); val s = ctx.freshName("s")
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  throw new IllegalArgumentException(
           |    "word-array length mismatch: " + $n + " vs " + $b.numElements());
           |}
           |long $s = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
           |}
           |${ev.value} = $s;
           |""".stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
  }

  case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
    override def prettyName: String = "vec_dot"
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData].toFloatArray()
      val y = b.asInstanceOf[ArrayData].toFloatArray()
      if (x.length != y.length) throw new IllegalArgumentException(
        s"vector dimension mismatch: ${x.length} vs ${y.length}")
      var s = 0.0; var i = 0
      while (i < x.length) { s += x(i).toDouble * y(i).toDouble; i += 1 }
      s
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        // read straight from ArrayData — toFloatArray() would allocate and
        // copy two arrays per evaluated pair, which dominates the kernel at
        // millions of pairs per task
        val i = ctx.freshName("i"); val n = ctx.freshName("n"); val s = ctx.freshName("s")
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  throw new IllegalArgumentException(
           |    "vector dimension mismatch: " + $n + " vs " + $b.numElements());
           |}
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += (double)$a.getFloat($i) * (double)$b.getFloat($i);
           |}
           |${ev.value} = $s;
           |""".stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
  }

  /** M3: sqrt(sum_i (a[i]-b[i])^2). */
  case class EuclideanDistance(left: Expression, right: Expression) extends VectorBinaryExpression {
    override def prettyName: String = "vec_l2"
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData].toFloatArray()
      val y = b.asInstanceOf[ArrayData].toFloatArray()
      if (x.length != y.length) throw new IllegalArgumentException(
        s"vector dimension mismatch: ${x.length} vs ${y.length}")
      var s = 0.0; var i = 0
      while (i < x.length) { val d = x(i).toDouble - y(i).toDouble; s += d * d; i += 1 }
      math.sqrt(s)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val s = ctx.freshName("s"); val d = ctx.freshName("d")
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  throw new IllegalArgumentException(
           |    "vector dimension mismatch: " + $n + " vs " + $b.numElements());
           |}
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $d = (double)$a.getFloat($i) - (double)$b.getFloat($i); $s += $d * $d;
           |}
           |${ev.value} = java.lang.Math.sqrt($s);
           |""".stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
  }

  /** M2: dot/(|a||b|), zero-norm => 0.0; single fused pass. */
  case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
    override def prettyName: String = "vec_cosine"
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData].toFloatArray()
      val y = b.asInstanceOf[ArrayData].toFloatArray()
      if (x.length != y.length) throw new IllegalArgumentException(
        s"vector dimension mismatch: ${x.length} vs ${y.length}")
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = x.length
      while (i < n) {
        val xv = x(i).toDouble; val yv = y(i).toDouble
        dot += xv * yv; na += xv * xv; nb += yv * yv; i += 1
      }
      val den = math.sqrt(na) * math.sqrt(nb)
      if (den == 0.0) 0.0 else dot / den
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
        val nb = ctx.freshName("nb"); val den = ctx.freshName("den")
        val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  throw new IllegalArgumentException(
           |    "vector dimension mismatch: " + $n + " vs " + $b.numElements());
           |}
           |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $xv = (double)$a.getFloat($i); double $yv = (double)$b.getFloat($i);
           |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
           |}
           |double $den = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
           |${ev.value} = ($den == 0.0) ? 0.0 : $dot / $den;
           |""".stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
  }

  /** J3/X6 fast path: index (0-based) of the nearest centroid in a fixed
    * matrix, fused into one codegen loop over a referenced float[][] —
    * no per-centroid HOF lambda, no allocation. Ties resolve to the lowest
    * index. `metric`: "l2" (squared L2 — same argmin) or "cosine"
    * (1 - cosine).
    *
    * `roundTo` (default -1 = off) exists for oracle parity: when >= 0 the
    * per-centroid distance becomes `round(sqrt(l2), roundTo)` using the
    * same BigDecimal HALF_UP rule as Spark's `round()`, so the argmin +
    * lowest-index tie-break reproduces a SQL
    * `row_number() OVER (ORDER BY round(dist, n), label)` ranking exactly
    * — rounding collapses near-ties that raw squared distance would order
    * differently. Only meaningful for l2. */
  case class NearestCentroid(child: Expression, centroids: Array[Array[Float]],
      metric: String, roundTo: Int = -1) extends UnaryExpression with ExpectsInputTypes {
    require(metric == "l2" || metric == "cosine", s"unsupported metric $metric")
    require(roundTo < 0 || metric == "l2", "roundTo is only supported for l2")
    require(centroids.nonEmpty && centroids.forall(_.length == centroids(0).length),
      "centroid matrix must be non-empty and rectangular")
    override def prettyName: String = "nearest_centroid"
    override def inputTypes = Seq(ArrayType(FloatType))
    override def dataType: DataType = IntegerType

    private def distTo(c: Array[Float], a: ArrayData): Double = {
      if (c.length != a.numElements()) throw new IllegalArgumentException(
        s"vector dimension mismatch: ${a.numElements()} vs centroid ${c.length}")
      val n = c.length
      if (metric == "l2") {
        var s = 0.0; var i = 0
        while (i < n) { val d = a.getFloat(i).toDouble - c(i).toDouble; s += d * d; i += 1 }
        if (roundTo >= 0)
          java.math.BigDecimal.valueOf(math.sqrt(s))
            .setScale(roundTo, java.math.RoundingMode.HALF_UP).doubleValue()
        else s
      } else {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < n) {
          val x = a.getFloat(i).toDouble; val y = c(i).toDouble
          dot += x * y; na += x * x; nb += y * y; i += 1
        }
        val den = math.sqrt(na) * math.sqrt(nb)
        if (den == 0.0) 1.0 else 1.0 - dot / den
      }
    }

    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < centroids.length) {
        val d = distTo(centroids(c), a)
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val cents = ctx.addReferenceObj("centroids", centroids, "float[][]")
        val c = ctx.freshName("c"); val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
        val d = ctx.freshName("d"); val cur = ctx.freshName("cur")
        val body = if (metric == "l2") {
          val t = ctx.freshName("t")
          val rnd = if (roundTo >= 0)
            s"""$d = java.math.BigDecimal.valueOf(java.lang.Math.sqrt($d))
               |  .setScale($roundTo, java.math.RoundingMode.HALF_UP).doubleValue();
               |""".stripMargin
          else ""
          s"""
             |double $d = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  double $t = (double)$a.getFloat($i) - (double)$cur[$i]; $d += $t * $t;
             |}
             |$rnd
             |""".stripMargin
        } else {
          val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
          val nb = ctx.freshName("nb"); val x = ctx.freshName("x"); val y = ctx.freshName("y")
          val den = ctx.freshName("den")
          s"""
             |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  double $x = (double)$a.getFloat($i); double $y = (double)$cur[$i];
             |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
             |}
             |double $den = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
             |double $d = ($den == 0.0) ? 1.0 : 1.0 - $dot / $den;
             |""".stripMargin
        }
        s"""
           |if ($a.numElements() != $cents[0].length) {
           |  throw new IllegalArgumentException("vector dimension mismatch: "
           |    + $a.numElements() + " vs centroid " + $cents[0].length);
           |}
           |int $best = 0; double $bestD = Double.MAX_VALUE;
           |for (int $c = 0; $c < $cents.length; $c++) {
           |  float[] $cur = $cents[$c];
           |  int $n = $cur.length;
           |  $body
           |  if ($d < $bestD) { $bestD = $d; $best = $c; }
           |}
           |${ev.value} = $best;
           |""".stripMargin
      })
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Dense matrix-vector product against a LITERAL row matrix (the OPQ
    * rotation kernel): out[r] = sum_j rows[r][j] * v[j], double
    * accumulate, float result. One codegen loop with the matrix shipped
    * as a reference object — NOT d separate dot expressions over d array
    * literals, whose combined tree blew codegen budgets and ran ~25x
    * slower than this loop on a 64x64 rotation (measured r14, OpqRun). */
  case class MatVec(child: Expression, rows: Array[Array[Float]])
      extends UnaryExpression with ExpectsInputTypes {
    require(rows.nonEmpty && rows.forall(_.length == rows(0).length),
      "row matrix must be non-empty and rectangular")
    override def prettyName: String = "mat_vec"
    override def inputTypes = Seq(ArrayType(FloatType))
    override def dataType: DataType = ArrayType(FloatType, containsNull = false)

    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      if (a.numElements() != rows(0).length) throw new IllegalArgumentException(
        s"vector dimension mismatch: ${a.numElements()} vs matrix ${rows(0).length}")
      val out = new Array[Float](rows.length)
      var r = 0
      while (r < rows.length) {
        val row = rows(r)
        var acc = 0.0; var j = 0
        while (j < row.length) { acc += row(j).toDouble * a.getFloat(j).toDouble; j += 1 }
        out(r) = acc.toFloat
        r += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val mat = ctx.addReferenceObj("matvecRows", rows, "float[][]")
        val r = ctx.freshName("r"); val j = ctx.freshName("j")
        val acc = ctx.freshName("acc"); val row = ctx.freshName("row")
        val out = ctx.freshName("out")
        s"""
           |if ($a.numElements() != $mat[0].length) {
           |  throw new IllegalArgumentException("vector dimension mismatch: "
           |    + $a.numElements() + " vs matrix " + $mat[0].length);
           |}
           |float[] $out = new float[$mat.length];
           |for (int $r = 0; $r < $mat.length; $r++) {
           |  float[] $row = $mat[$r];
           |  double $acc = 0.0;
           |  for (int $j = 0; $j < $row.length; $j++) {
           |    $acc += (double)$row[$j] * (double)$a.getFloat($j);
           |  }
           |  $out[$r] = (float)$acc;
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.expressions
           |  .UnsafeArrayData.fromPrimitiveArray($out);
           |""".stripMargin
      })
    // Case-class equality would compare the Array[Array[Float]] by
    // reference, so two MatVecs built from equal-but-distinct matrices
    // (OPQ encode instantiates m+1 per plan) would never canonicalize
    // equal and Catalyst CSE could not dedup them — compare by content.
    override def equals(other: Any): Boolean = other match {
      case MatVec(c, r) => c == child &&
        java.util.Arrays.deepEquals(
          r.asInstanceOf[Array[AnyRef]], rows.asInstanceOf[Array[AnyRef]])
      case _ => false
    }
    override def hashCode(): Int = 31 * child.hashCode() +
      java.util.Arrays.deepHashCode(rows.asInstanceOf[Array[AnyRef]])
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** A2/M12 ADC kernel for batch PQ search: squared-L2 asymmetric distance
    * read from per-query lookup tables (`tables(qIdx)(sub)(code)` =
    * ||query_sub - centroid||^2, precomputed driver-side for a bounded
    * query batch — the classic PQ framing, `vector_ops.rs:525-577`).
    * Per row the cost is m table reads + adds, independent of dim, and it
    * stays inside whole-stage codegen. left = codes ARRAY<INT>,
    * right = query index INT. */
  case class PqAdcTableDist(left: Expression, right: Expression,
      tables: Array[Array[Array[Double]]]) extends BinaryExpression with ExpectsInputTypes {
    require(tables.nonEmpty, "empty ADC table set")
    override def prettyName: String = "pq_adc_dist"
    override def inputTypes = Seq(ArrayType(IntegerType), IntegerType)
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = left.nullable || right.nullable

    override def nullSafeEval(codesAny: Any, qAny: Any): Any = {
      val codes = codesAny.asInstanceOf[ArrayData]
      val t = tables(qAny.asInstanceOf[Int])
      if (codes.numElements() != t.length) throw new IllegalArgumentException(
        s"code count ${codes.numElements()} != subspace count ${t.length}")
      var s = 0.0; var i = 0
      while (i < t.length) { s += t(i)(codes.getInt(i)); i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (codes, qi) => {
        val tabs = ctx.addReferenceObj("adcTables", tables, "double[][][]")
        val t = ctx.freshName("t"); val i = ctx.freshName("i"); val s = ctx.freshName("s")
        s"""
           |double[][] $t = $tabs[$qi];
           |if ($codes.numElements() != $t.length) {
           |  throw new IllegalArgumentException("code count " + $codes.numElements()
           |    + " != subspace count " + $t.length);
           |}
           |double $s = 0.0;
           |for (int $i = 0; $i < $t.length; $i++) {
           |  $s += $t[$i][$codes.getInt($i)];
           |}
           |${ev.value} = $s;
           |""".stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
  }

  /** M11 at the storage tier: per-vector affine u8 encode to a BINARY
    * column — dim bytes per vector instead of 4·dim, the scalar-quantized
    * analog of the PQ code table (`src/core/vector_ops.rs:349-387`).
    * code_i = round((x_i - vmin) / range * 255); range 0 encodes as all
    * zeros (the same `range == 0 -> 1` guard as quantizeU8/dequantizeU8,
    * so decode returns the constant vmin exactly). */
  case class SqEncodeBytes(first: Expression, second: Expression,
      third: Expression) extends TernaryExpression with ExpectsInputTypes {
    override def prettyName: String = "sq_encode"
    override def inputTypes = Seq(ArrayType(FloatType), FloatType, FloatType)
    override def dataType: DataType = BinaryType
    override def nullable: Boolean =
      first.nullable || second.nullable || third.nullable

    override def nullSafeEval(embAny: Any, mnAny: Any, mxAny: Any): Any = {
      val a = embAny.asInstanceOf[ArrayData]
      val mn = mnAny.asInstanceOf[Float].toDouble
      val mx = mxAny.asInstanceOf[Float].toDouble
      val range = if (mx - mn == 0.0) 1.0 else mx - mn
      val n = a.numElements()
      val out = new Array[Byte](n)
      var i = 0
      while (i < n) {
        // floor(x+0.5) = HALF_UP on the non-negative [0,255] scale — the
        // SAME tie rule as Spark round() in VectorFunctions.quantizeU8
        // (the documented cross-check reference) and a HALF_UP oracle;
        // rint's HALF_EVEN would disagree by one code on exact half-steps
        out(i) = math.floor((a.getFloat(i).toDouble - mn) / range * 255.0 + 0.5).toInt.toByte
        i += 1
      }
      out
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, mn, mx) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val range = ctx.freshName("range"); val out = ctx.freshName("out")
        s"""
           |int $n = $a.numElements();
           |double $range = ((double)$mx - (double)$mn == 0.0) ? 1.0 : (double)$mx - (double)$mn;
           |byte[] $out = new byte[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  $out[$i] = (byte)(int) java.lang.Math.floor(
           |    ((double)$a.getFloat($i) - (double)$mn) / $range * 255.0 + 0.5);
           |}
           |${ev.value} = $out;
           |""".stripMargin
      })
    override protected def withNewChildrenInternal(f: Expression, s: Expression,
        t: Expression): Expression = copy(f, s, t)
  }

  /** Approximate L2 between a raw float query and a [[SqEncodeBytes]]-coded
    * row, dequantizing on the fly (asymmetric distance — per-row affine
    * params rule out a PQ-style lookup table). One fused codegen loop over
    * the byte payload; per row it reads dim bytes instead of 4·dim —
    * the scan-bandwidth win that makes the u8 tier worth storing. */
  case class SqDequantL2(first: Expression, second: Expression,
      third: Expression, fourth: Expression)
      extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression
      with ExpectsInputTypes {
    override def prettyName: String = "sq_l2"
    override def inputTypes = Seq(ArrayType(FloatType), BinaryType, FloatType, FloatType)
    override def dataType: DataType = DoubleType
    override def nullable: Boolean =
      first.nullable || second.nullable || third.nullable || fourth.nullable

    override def nullSafeEval(qAny: Any, cAny: Any, mnAny: Any, mxAny: Any): Any = {
      val a = qAny.asInstanceOf[ArrayData]
      val c = cAny.asInstanceOf[Array[Byte]]
      if (a.numElements() != c.length) throw new IllegalArgumentException(
        s"vector dimension mismatch: ${a.numElements()} vs codes ${c.length}")
      val mn = mnAny.asInstanceOf[Float].toDouble
      val mx = mxAny.asInstanceOf[Float].toDouble
      val range = if (mx - mn == 0.0) 1.0 else mx - mn
      var s = 0.0; var i = 0
      while (i < c.length) {
        val x = (c(i) & 0xFF) / 255.0 * range + mn
        val d = a.getFloat(i).toDouble - x
        s += d * d; i += 1
      }
      math.sqrt(s)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, c, mn, mx) => {
        val i = ctx.freshName("i"); val s = ctx.freshName("s")
        val range = ctx.freshName("range"); val x = ctx.freshName("x")
        val d = ctx.freshName("d")
        s"""
           |if ($a.numElements() != $c.length) {
           |  throw new IllegalArgumentException("vector dimension mismatch: "
           |    + $a.numElements() + " vs codes " + $c.length);
           |}
           |double $range = ((double)$mx - (double)$mn == 0.0)
           |  ? 1.0 : (double)$mx - (double)$mn;
           |double $s = 0.0;
           |for (int $i = 0; $i < $c.length; $i++) {
           |  double $x = (($c[$i]) & 0xFF) / 255.0 * $range + (double)$mn;
           |  double $d = (double)$a.getFloat($i) - $x;
           |  $s += $d * $d;
           |}
           |${ev.value} = java.lang.Math.sqrt($s);
           |""".stripMargin
      })
    override protected def withNewChildrenInternal(f: Expression, s: Expression,
        t: Expression, q: Expression): Expression = copy(f, s, t, q)
  }

  /** Approximate cosine DISTANCE (1 - cos) between a raw float query and a
    * [[SqEncodeBytes]]-coded row: dot(q, dequant) and |dequant| accumulate in
    * the same fused byte loop as [[SqDequantL2]], so the cosine tier scans
    * the identical dim-bytes-per-row payload — no extra norm sidecar, the
    * dequantized vector's own norm is the |v| estimate (exact rerank
    * replaces it with the true value). Zero-norm on either side returns
    * distance 1.0 (similarity 0, `src/core/vector_ops.rs:44-48`). */
  case class SqDequantCosine(first: Expression, second: Expression,
      third: Expression, fourth: Expression)
      extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression
      with ExpectsInputTypes {
    override def prettyName: String = "sq_cosine"
    override def inputTypes = Seq(ArrayType(FloatType), BinaryType, FloatType, FloatType)
    override def dataType: DataType = DoubleType
    override def nullable: Boolean =
      first.nullable || second.nullable || third.nullable || fourth.nullable

    override def nullSafeEval(qAny: Any, cAny: Any, mnAny: Any, mxAny: Any): Any = {
      val a = qAny.asInstanceOf[ArrayData]
      val c = cAny.asInstanceOf[Array[Byte]]
      if (a.numElements() != c.length) throw new IllegalArgumentException(
        s"vector dimension mismatch: ${a.numElements()} vs codes ${c.length}")
      val mn = mnAny.asInstanceOf[Float].toDouble
      val mx = mxAny.asInstanceOf[Float].toDouble
      val range = if (mx - mn == 0.0) 1.0 else mx - mn
      var dot = 0.0; var nq = 0.0; var nv = 0.0; var i = 0
      while (i < c.length) {
        val x = (c(i) & 0xFF) / 255.0 * range + mn
        val q = a.getFloat(i).toDouble
        dot += q * x; nq += q * q; nv += x * x; i += 1
      }
      val den = math.sqrt(nq) * math.sqrt(nv)
      if (den == 0.0) 1.0 else 1.0 - dot / den
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, c, mn, mx) => {
        val i = ctx.freshName("i"); val range = ctx.freshName("range")
        val x = ctx.freshName("x"); val q = ctx.freshName("q")
        val dot = ctx.freshName("dot"); val nq = ctx.freshName("nq")
        val nv = ctx.freshName("nv"); val den = ctx.freshName("den")
        s"""
           |if ($a.numElements() != $c.length) {
           |  throw new IllegalArgumentException("vector dimension mismatch: "
           |    + $a.numElements() + " vs codes " + $c.length);
           |}
           |double $range = ((double)$mx - (double)$mn == 0.0)
           |  ? 1.0 : (double)$mx - (double)$mn;
           |double $dot = 0.0; double $nq = 0.0; double $nv = 0.0;
           |for (int $i = 0; $i < $c.length; $i++) {
           |  double $x = (($c[$i]) & 0xFF) / 255.0 * $range + (double)$mn;
           |  double $q = (double)$a.getFloat($i);
           |  $dot += $q * $x; $nq += $q * $q; $nv += $x * $x;
           |}
           |double $den = java.lang.Math.sqrt($nq) * java.lang.Math.sqrt($nv);
           |${ev.value} = ($den == 0.0) ? 1.0 : 1.0 - $dot / $den;
           |""".stripMargin
      })
    override protected def withNewChildrenInternal(f: Expression, s: Expression,
        t: Expression, q: Expression): Expression = copy(f, s, t, q)
  }

  /** M4: L2 norm. */
  case class VectorNorm(child: Expression) extends UnaryExpression with ExpectsInputTypes {
    override def prettyName: String = "vec_norm"
    override def inputTypes = Seq(ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData].toFloatArray()
      var s = 0.0; var i = 0
      while (i < x.length) { s += x(i).toDouble * x(i).toDouble; i += 1 }
      math.sqrt(s)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val s = ctx.freshName("s"); val v = ctx.freshName("v")
        s"""
           |int $n = $a.numElements();
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $v = (double)$a.getFloat($i); $s += $v * $v;
           |}
           |${ev.value} = java.lang.Math.sqrt($s);
           |""".stripMargin
      })
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }
}

/** Column-level API for the codegen kernels. */
object VectorExpressions {
  import kernels._
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def vecL2(a: Column, b: Column): Column =
    ColumnBridge.column(EuclideanDistance(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def vecCosine(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def vecNorm(a: Column): Column =
    ColumnBridge.column(VectorNorm(ColumnBridge.expression(a)))
  def hammingWords(a: Column, b: Column): Column =
    ColumnBridge.column(HammingWords(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def nearestCentroid(a: Column, centroids: Array[Array[Float]],
      metric: String = "l2", roundTo: Int = -1): Column =
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(a), centroids, metric, roundTo))
  def pqAdcTableDist(codes: Column, qIdx: Column,
      tables: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqAdcTableDist(
      ColumnBridge.expression(codes), ColumnBridge.expression(qIdx), tables))
  def matVec(v: Column, rows: Array[Array[Float]]): Column =
    ColumnBridge.column(MatVec(ColumnBridge.expression(v), rows))
  def sqEncodeBytes(emb: Column, vmin: Column, vmax: Column): Column =
    ColumnBridge.column(SqEncodeBytes(ColumnBridge.expression(emb),
      ColumnBridge.expression(vmin), ColumnBridge.expression(vmax)))
  def sqDequantL2(q: Column, codes: Column, vmin: Column, vmax: Column): Column =
    ColumnBridge.column(SqDequantL2(ColumnBridge.expression(q),
      ColumnBridge.expression(codes), ColumnBridge.expression(vmin),
      ColumnBridge.expression(vmax)))
  def sqDequantCosine(q: Column, codes: Column, vmin: Column, vmax: Column): Column =
    ColumnBridge.column(SqDequantCosine(ColumnBridge.expression(q),
      ColumnBridge.expression(codes), ColumnBridge.expression(vmin),
      ColumnBridge.expression(vmax)))

  /** Register as SQL functions (vec_dot, vec_l2, vec_cosine, vec_norm). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot", es => DotProduct(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_l2", es => EuclideanDistance(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_cosine", es => CosineSimilarity(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_norm", es => VectorNorm(es.head), "built-in")
  }
}

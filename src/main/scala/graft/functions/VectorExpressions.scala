package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the embedding-similarity hot path:
  * dot product of two FLOAT array columns accumulated in double, in
  * index order (deterministic — matches a sequential SQL fold).
  *
  * This is the (b) tier of the custom-operator ladder: a codegen'd
  * `Expression` stays inside whole-stage codegen, so the O(n·k·d)
  * similarity scan runs as a tight primitive loop with no boxing, no
  * UDF serialization, and no Scala closure dispatch per element.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vector_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double)$a.getFloat($i) * (double)$b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All hyperplane-LSH plane dots in ONE codegen pass: bit j of the
  * result is set iff dot(vec, planes(j)) > 0. Arithmetic is float-
  * upcast multiply + in-order double accumulation — bit-identical to
  * the per-plane `aggregate(zip_with(...))` SQL fold it replaces (and
  * to the DuckDB oracle's list_reduce), but codegen'd: the lambda form
  * is CodegenFallback and interprets ~numPlanes×dim closure calls per
  * row. */
case class HyperplaneBucket(child: Expression, planes: Seq[Seq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "hyperplane_bucket"

  @transient private lazy val planeArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  /** element width follows the child's array type — array<float> and
    * array<double> both supported (the SQL fold this replaces accepted
    * either via an implicit cast) */
  private def isFloat: Boolean = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.FloatType, _) => true
    case org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"hyperplane_bucket needs array<float|double>, got $other")
  }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val f = isFloat
    var bucket = 0L
    var j = 0
    while (j < planeArr.length) {
      val p = planeArr(j)
      val n = math.min(x.numElements(), p.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += (if (f) x.getFloat(i).toDouble else x.getDouble(i)) * p(i)
        i += 1
      }
      if (acc > 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ps = ctx.addReferenceObj("planes", planeArr, "double[][]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val (j, i, n, acc, p, bucket) = (ctx.freshName("j"), ctx.freshName("i"),
        ctx.freshName("n"), ctx.freshName("acc"), ctx.freshName("p"),
        ctx.freshName("bucket"))
      s"""
         |long $bucket = 0L;
         |for (int $j = 0; $j < $ps.length; $j++) {
         |  double[] $p = $ps[$j];
         |  int $n = java.lang.Math.min($v.numElements(), $p.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double)$v.$getter($i) * $p[$i];
         |  }
         |  if ($acc > 0) $bucket |= (1L << $j);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Squared-L2 distance of an array<float> column to EVERY row of a
  * small broadcast centroid matrix, in one codegen pass: the
  * assignment kernel of distributed Lloyd's k-means (centroids are
  * driver state, the data never shuffles for assignment — MLlib's own
  * shape). Arithmetic is float-upcast subtract + in-order double
  * accumulation per centroid, bit-identical to the sequential SQL fold
  * `Σ (CAST(e[i] AS DOUBLE) - c[i])²` the DuckDB oracle runs. */
case class SqDistToCentroids(child: Expression, centroids: Seq[Seq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "sq_dist_to_centroids"

  @transient private lazy val cents: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Double](cents.length)
    var k = 0
    while (k < cents.length) {
      val c = cents(k)
      val n = math.min(v.numElements(), c.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = v.getFloat(i).toDouble - c(i)
        acc += d * d
        i += 1
      }
      out(k) = acc
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cRef = ctx.addReferenceObj("centroids", cents, "double[][]")
      val out = ctx.freshName("out")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |double[] $out = new double[$cRef.length];
         |for (int $k = 0; $k < $cRef.length; $k++) {
         |  int $n = java.lang.Math.min($v.numElements(), $cRef[$k].length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = (double)$v.getFloat($i) - $cRef[$k][$i];
         |    $acc += $d * $d;
         |  }
         |  $out[$k] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util
         |  .GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Dense linear map of an embedding column by a small broadcast
  * row-matrix M: out[k] = Σᵢ v[i]·M[k][i] — the projection kernel for
  * Johnson-Lindenstrauss random projection / PCA-style dim reduction
  * before ANN. The matrix is driver state riding the plan via
  * addReferenceObj (like the k-means centroids); arithmetic is
  * float-upcast multiply with in-order double accumulation per output
  * row, bit-identical to the DuckDB oracle's list_reduce fold. */
case class MatVecProduct(child: Expression, mat: Seq[Seq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "mat_vec_product"

  @transient private lazy val rows: Array[Array[Double]] =
    mat.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Double](rows.length)
    var k = 0
    while (k < rows.length) {
      val r = rows(k)
      val n = math.min(v.numElements(), r.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += v.getFloat(i).toDouble * r(i)
        i += 1
      }
      out(k) = acc
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val mRef = ctx.addReferenceObj("mat", rows, "double[][]")
      val out = ctx.freshName("out")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |double[] $out = new double[$mRef.length];
         |for (int $k = 0; $k < $mRef.length; $k++) {
         |  int $n = java.lang.Math.min($v.numElements(), $mRef[$k].length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double)$v.getFloat($i) * $mRef[$k][$i];
         |  }
         |  $out[$k] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util
         |  .GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Product-quantization encoder: split the float vector into
  * `books.length` contiguous subvectors and emit, per subspace j, the
  * index of the nearest codebook centroid (squared-L2, first minimum =
  * lowest index on ties — the same argmin rule the k-means oracle
  * pins). The codebooks are driver state riding the plan via
  * addReferenceObj, so corpus encoding is ONE codegen scan that turns
  * a d-dim float vector into m bytes-worth of codes — the compression
  * step that makes 100 TB of embeddings ADC-searchable from memory.
  * Arithmetic is float-upcast subtract + in-order double accumulation,
  * bit-identical to the DuckDB oracle's list_reduce fold. */
case class PqEncode(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  @transient private lazy val bookArr: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Int](bookArr.length)
    var off = 0
    var j = 0
    while (j < bookArr.length) {
      val cb = bookArr(j)
      var best = 0
      var bestd = Double.PositiveInfinity
      var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        var acc = 0.0
        var i = 0
        while (i < cent.length) {
          val dd = v.getFloat(off + i).toDouble - cent(i)
          acc += dd * dd
          i += 1
        }
        if (acc < bestd) { bestd = acc; best = c }
        c += 1
      }
      out(j) = best
      off += cb(0).length
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val bRef = ctx.addReferenceObj("books", bookArr, "double[][][]")
      val out = ctx.freshName("out")
      val off = ctx.freshName("off")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val cb = ctx.freshName("cb")
      val cent = ctx.freshName("cent")
      val best = ctx.freshName("best")
      val bestd = ctx.freshName("bestd")
      val acc = ctx.freshName("acc")
      val dd = ctx.freshName("dd")
      s"""
         |int[] $out = new int[$bRef.length];
         |int $off = 0;
         |for (int $j = 0; $j < $bRef.length; $j++) {
         |  double[][] $cb = $bRef[$j];
         |  int $best = 0;
         |  double $bestd = Double.POSITIVE_INFINITY;
         |  for (int $c = 0; $c < $cb.length; $c++) {
         |    double[] $cent = $cb[$c];
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $cent.length; $i++) {
         |      double $dd = (double)$v.getFloat($off + $i) - $cent[$i];
         |      $acc += $dd * $dd;
         |    }
         |    if ($acc < $bestd) { $bestd = $acc; $best = $c; }
         |  }
         |  $out[$j] = $best;
         |  $off += $cb[0].length;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util
         |  .GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Asymmetric-distance lookup: given a row's PQ codes and a query
  * index, sum the precomputed per-subspace distances
  * table(q)(j)(codes(j)) in subspace order. The table (queries ×
  * subspaces × centroids) is driver state — ADC scoring per row is m
  * array lookups + m adds, no float-vector math at all, which is the
  * entire point of product quantization at corpus scale. */
case class AdcLookup(left: Expression, right: Expression,
                     table: Seq[Seq[Seq[Double]]])
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_lookup"

  @transient private lazy val tArr: Array[Array[Array[Double]]] =
    table.map(_.map(_.toArray).toArray).toArray

  override def nullSafeEval(codes: Any, qi: Any): Any = {
    val cd = codes.asInstanceOf[ArrayData]
    val tq = tArr(qi.asInstanceOf[Int])
    var acc = 0.0
    var j = 0
    while (j < tq.length) {
      acc += tq(j)(cd.getInt(j))
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (cd, qi) => {
      val tRef = ctx.addReferenceObj("table", tArr, "double[][][]")
      val tq = ctx.freshName("tq")
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      s"""
         |double[][] $tq = $tRef[$qi];
         |double $acc = 0.0;
         |for (int $j = 0; $j < $tq.length; $j++) {
         |  $acc += $tq[$j][$cd.getInt($j)];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sign binarization of a float vector: bit i of word ⌊i/32⌋ is set
  * iff v[i] >= 0. 32 bits per long word — NOT 64 — because the DuckDB
  * oracle rebuilds the signature with `(1::BIGINT << i)` and DuckDB's
  * checked shift refuses `1 << 63`; half-full words keep every shift
  * in range for both engines while still compressing a float32 vector
  * 16× (dim floats → ⌈dim/32⌉ longs). Runs once per row at index
  * build, so the signature — not the vector — is what the retrieval
  * exchange carries. */
case class SignPack(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "sign_pack"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Long]((n + 31) / 32)
    var i = 0
    while (i < n) {
      if (v.getFloat(i) >= 0f) out(i / 32) |= 1L << (i % 32)
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[($n + 31) / 32];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getFloat($i) >= 0f) $out[$i / 32] |= 1L << ($i % 32);
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Hamming distance between two sign signatures (array<long> from
  * [[SignPack]]): Σ bitCount(a[w] ^ b[w]). The binary-retrieval hot
  * loop — |queries|·|corpus| evaluations — so it must stay inside
  * whole-stage codegen: two instructions per word, no boxing. */
case class HammingDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "hamming_dist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0
    var i = 0
    while (i < n) {
      acc += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $acc = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecF {
  /** per-centroid squared distances of an array<float> column. */
  def sqDistToCentroids(v: Column, cents: Seq[Seq[Double]]): Column =
    GraftColumnBridge.column(SqDistToCentroids(
      GraftColumnBridge.expression(v), cents))

  /** dot(a, b) over array<float> columns, as a Column. */
  def dotF(a: Column, b: Column): Column =
    GraftColumnBridge.column(FloatVectorDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** L2 norm of an array<float> column. */
  def normF(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(dotF(a, a))

  /** 32-bit-per-word sign signature of an array<float> column. */
  def signPack(v: Column): Column =
    GraftColumnBridge.column(SignPack(GraftColumnBridge.expression(v)))

  /** Hamming distance between two sign-signature columns. */
  def hamming(a: Column, b: Column): Column =
    GraftColumnBridge.column(HammingDist(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** hyperplane-LSH bucket of an array<float> column. */
  def hyperplaneBucket(v: Column, planes: Array[Array[Double]]): Column =
    GraftColumnBridge.column(HyperplaneBucket(
      GraftColumnBridge.expression(v), planes.map(_.toSeq).toSeq))

  /** dense row-matrix × vector product of an array<float> column. */
  def matVec(v: Column, mat: Array[Array[Double]]): Column =
    GraftColumnBridge.column(MatVecProduct(
      GraftColumnBridge.expression(v), mat.map(_.toSeq).toSeq))

  /** product-quantization codes of an array<float> column. */
  def pqEncode(v: Column, books: Seq[Seq[Seq[Double]]]): Column =
    GraftColumnBridge.column(PqEncode(
      GraftColumnBridge.expression(v), books))

  /** ADC distance of a codes column for query index `qi`. */
  def adcLookup(codes: Column, qi: Column,
                table: Seq[Seq[Seq[Double]]]): Column =
    GraftColumnBridge.column(AdcLookup(
      GraftColumnBridge.expression(codes),
      GraftColumnBridge.expression(qi), table))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Multi-table random-hyperplane LSH codes over an `array<double>`
  * embedding: `tables` codes of `bits` sign bits each, one per hash table.
  *
  * Each bit is the sign of a sparse signed projection (Achlioptas-style
  * ±1/0 components, P(±1)=1/6 each) whose components are a pure hash of
  * (plane, dim) — no stored matrix, any vector length, and the DuckDB
  * oracle regenerates the identical components as literal `±qv[i]` sums
  * ([[HyperplaneCodes.sqlProjection]]). On integer-quantized embeddings
  * the projections are exact integers, so the codes are bit-identical
  * across engines.
  *
  * Scale: bucket count per table is 2^bits — parameterize `bits` with
  * corpus size (`bits ≈ log2(n / target_occupancy)`) so occupancy stays
  * bounded, and `tables` with target recall (`1 - (1 - p^bits)^tables`,
  * p = 1 - θ/π). This replaces the fixed 8-bit single-table code whose
  * 256 buckets made within-bucket pairing O((n/256)²) at any corpus size.
  */
@ExpressionDescription(
  usage = "_FUNC_(v, tables, bits) - array of `tables` hyperplane LSH codes of `bits` bits.")
case class HyperplaneCodes(child: Expression, tables: Int, bits: Int)
    extends UnaryExpression {

  require(tables > 0 && bits > 0 && bits <= 63, "need 1..N tables, 1..63 bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_hyperplane_codes expects array<double>, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_hyperplane_codes"

  override def nullSafeEval(v: Any): Any = {
    val q = v.asInstanceOf[ArrayData]
    val n = q.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var code = 0L
      var j = 0
      while (j < bits) {
        val plane = t * bits + j
        var p = 0.0
        var i = 0
        while (i < n) {
          p += HyperplaneCodes.sign(plane, i) * q.getDouble(i)
          i += 1
        }
        if (p >= 0) code |= 1L << j
        j += 1
      }
      out(t) = code
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val code = ctx.freshName("code")
      s"""
         |int $n = $v.numElements();
         |long[] $out = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $code = 0L;
         |  for (int $j = 0; $j < $bits; $j++) {
         |    double $p = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $p += graft.functions.HyperplaneCodes.sign($t * $bits + $j, $i) * $v.getDouble($i);
         |    }
         |    if ($p >= 0) $code |= 1L << $j;
         |  }
         |  $out[$t] = $code;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneCodes =
    copy(child = newChild)
}

object HyperplaneCodes {

  /** Sparse hyperplane component for (plane, dim): a splitmix64-style
    * avalanche of the pair, mapped to +1 / −1 / 0 with P = 1/6, 1/6, 2/3
    * (Achlioptas sparse random projection). Pure and stateless — the
    * Spark expression, the interpreted eval, and the SQL-oracle literal
    * generation all call this one function. */
  def sign(plane: Int, dim: Int): Int = {
    var x = plane.toLong * 0x9E3779B97F4A7C15L + dim.toLong * 0xC2B2AE3D27D4EB4FL +
      0x165667B19E3779F9L
    x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL; x ^= x >>> 33
    val r = java.lang.Long.remainderUnsigned(x, 6L).toInt
    if (r == 0) 1 else if (r == 1) -1 else 0
  }

  /** Column-API entry point. */
  def codes(v: Column, tables: Int, bits: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      HyperplaneCodes(org.apache.spark.sql.GraftBridge.expression(v), tables, bits))

  /** Oracle-side projection for one plane over `dims` dimensions: the
    * literal `±qv[i]` sum (1-based list index) with the identical signs. */
  def sqlProjection(plane: Int, dims: Int, vec: String = "qv"): String = {
    val terms = (0 until dims).flatMap { i =>
      sign(plane, i) match {
        case 1 => Some(s"+$vec[${i + 1}]")
        case -1 => Some(s"-$vec[${i + 1}]")
        case _ => None
      }
    }
    if (terms.isEmpty) "0" else terms.mkString
  }

  /** Oracle-side `bits`-bit code for table `t` (BIGINT sum of set bits). */
  def sqlCode(t: Int, bits: Int, dims: Int, vec: String = "qv"): String =
    (0 until bits).map { j =>
      s"(CASE WHEN ${sqlProjection(t * bits + j, dims, vec)} >= 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")
}

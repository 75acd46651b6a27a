package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused tokenize → k-shingle → salted-minhash kernel.
  *
  * Semantically identical to the composable pipeline
  * (`TextOps.tokens` → `shinglesOfTokens` → `minhash(salt)`) and to the
  * DuckDB oracle (`list_min(list_transform(sh, s -> md5(salt||':'||s)))`)
  * — same normalization regexes, same md5-hex lexicographic min — in one
  * pass per row with no intermediate Catalyst arrays.
  *
  * MEASURED NEGATIVE RESULT (kept as documentation): at sf0.1 this
  * CodegenFallback kernel is ~3x SLOWER warm than the HOF pipeline it
  * mirrors (d_minhash 0.35s -> 1.2s), because falling out of whole-stage
  * codegen costs more than the HOF lambda dispatch it saves; the HOF
  * form's only real tax is one-time janino compilation. Production code
  * (Dedup.minhashSignatures) therefore uses the HOF form with named
  * intermediate columns; a future win here requires doGenCode, not eval.
  * Returns null for docs with < k tokens (the declared domain filter).
  */
case class MinhashSigs(child: Expression, k: Int, numSigs: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_minhash"

  @transient private lazy val md =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  private def md5Hex(s: String): String = {
    val d = md.get()
    d.reset()
    val bytes = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < bytes.length) {
      sb.append(Character.forDigit((bytes(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(bytes(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  override def nullSafeEval(input: Any): Any = {
    // exact mirror of TextOps.tokens: lower → strip non-[a-z0-9 ] → split
    val text = input.asInstanceOf[UTF8String].toString
    val tokens = text.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("[^a-z0-9 ]", " ")
      .split(" +")
      .filter(_.nonEmpty)
    if (tokens.length < k) return null
    val sigs = new Array[UTF8String](numSigs)
    var s = 0
    while (s < numSigs) {
      var min: String = null
      var i = 0
      while (i <= tokens.length - k) {
        val shingle = new java.lang.StringBuilder()
          .append(s).append(':')
        var j = 0
        while (j < k) {
          if (j > 0) shingle.append(' ')
          shingle.append(tokens(i + j))
          j += 1
        }
        val h = md5Hex(shingle.toString)
        if (min == null || h.compareTo(min) < 0) min = h
        i += 1
      }
      sigs(s) = UTF8String.fromString(min)
      s += 1
    }
    new GenericArrayData(sigs.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSigs =
    copy(child = newChild)
}

object MinhashSigs {
  def sigs(text: Column, k: Int = 3, numSigs: Int = 4): Column =
    org.apache.spark.sql.GraftBridge.column(
      MinhashSigs(org.apache.spark.sql.GraftBridge.expression(text), k, numSigs))
}

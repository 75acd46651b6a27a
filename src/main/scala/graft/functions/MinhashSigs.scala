package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
  * MEASURED NEGATIVE RESULT, twice over (kept as documentation — this is
  * why production `Dedup.minhashSignatures` stays on the HOF form):
  *  1. CodegenFallback variant: ~3x slower than the HOF pipeline at
  *     sf0.1 (0.35s -> 1.2s) — falling out of whole-stage codegen costs
  *     more than the lambda dispatch it saves.
  *  2. This doGenCode variant (stage stays fused, static-call kernel,
  *     precompiled regexes, one UTF-8 encode per shingle shared across
  *     salts): STILL ~1.3-1.6x slower warm (interleaved A/B at sf0.1:
  *     HOF 0.41-0.74s vs fused 0.64-0.76s). The HOF pipeline's
  *     codegen'd lower/regexp_replace/md5 operate on UTF8String bytes
  *     end to end; the kernel pays String round-trips (toString,
  *     toLowerCase, regex-over-String, getBytes) that no amount of
  *     fusion buys back. Lesson: on Spark, beating composed codegen'd
  *     built-ins requires byte-level reimplementation, not just fusion.
  * Returns null for docs with < k tokens (the declared domain filter).
  */
case class MinhashSigs(child: Expression, k: Int, numSigs: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = true // null for docs with < k tokens

  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any =
    MinhashSigs.compute(input.asInstanceOf[UTF8String], k, numSigs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinhashSigs.compute($c, $k, $numSigs);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSigs =
    copy(child = newChild)
}

object MinhashSigs {

  private val md =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  // compiled once — replaceAll/split(String) recompile their regex per
  // call, which alone made the kernel lose to the HOF pipeline
  private val Strip = java.util.regex.Pattern.compile("[^a-z0-9 ]")
  private val Spaces = java.util.regex.Pattern.compile(" +")
  private val HexDigits = "0123456789abcdef".toCharArray
  // salt prefixes "0:", "1:", ... pre-encoded
  private val Prefixes: Array[Array[Byte]] =
    (0 until 64).map(i => (i.toString + ":").getBytes(java.nio.charset.StandardCharsets.US_ASCII)).toArray

  private def md5Hex(prefix: Array[Byte], body: Array[Byte]): String = {
    val d = md.get()
    d.reset()
    d.update(prefix)
    val bytes = d.digest(body)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexDigits((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HexDigits(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** The whole per-row kernel, compiled Scala — codegen emits one static
    * call to it (janino-compiled glue stays tiny; the stage stays fused).
    * Exact mirror of TextOps.tokens: lower → strip non-[a-z0-9 ] → split.
    * Each shingle is built and UTF-8-encoded ONCE, then digested under
    * all `numSigs` salt prefixes (the HOF form re-materializes the salted
    * string per signature). */
  def compute(text: UTF8String, k: Int, numSigs: Int): GenericArrayData = {
    val normalized = Strip.matcher(text.toString.toLowerCase(java.util.Locale.ROOT)).replaceAll(" ")
    val rawTokens = Spaces.split(normalized)
    var n = 0
    var t = 0
    while (t < rawTokens.length) { if (rawTokens(t).nonEmpty) n += 1; t += 1 }
    if (n < k) return null
    val tokens = new Array[String](n)
    n = 0; t = 0
    while (t < rawTokens.length) {
      if (rawTokens(t).nonEmpty) { tokens(n) = rawTokens(t); n += 1 }
      t += 1
    }
    val mins = new Array[String](numSigs)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= n - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      val body = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var s = 0
      while (s < numSigs) {
        val h = md5Hex(Prefixes(s), body)
        if (mins(s) == null || h.compareTo(mins(s)) < 0) mins(s) = h
        s += 1
      }
      i += 1
    }
    val sigs = new Array[Any](numSigs)
    var s = 0
    while (s < numSigs) { sigs(s) = UTF8String.fromString(mins(s)); s += 1 }
    new GenericArrayData(sigs)
  }

  def sigs(text: Column, k: Int = 3, numSigs: Int = 4): Column =
    org.apache.spark.sql.GraftBridge.column(
      MinhashSigs(org.apache.spark.sql.GraftBridge.expression(text), k, numSigs))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the
  * text-cleanup step real corpus builds run BEFORE tokenization and
  * hashing: the same grapheme arrives from the web in composed
  * (`é` U+00E9) and decomposed (`e` + U+0301) forms, plus compatibility
  * singletons (ANGSTROM SIGN U+212B → Å U+00C5); without canonical
  * composition, fingerprint/minhash/substring dedup silently treats
  * equal text as different. Spark ships no normalizer (SPARK built-ins
  * stop at lower/trim), so this is the custom-Expression tier: a
  * `UnaryExpression` with `doGenCode` delegating to one static kernel,
  * staying inside whole-stage codegen.
  *
  * The kernel fast-paths: pure-ASCII rows (the overwhelming majority of
  * an English-heavy corpus) are detected on the raw UTF-8 BYTES and
  * returned as-is with zero allocation; non-ASCII rows check
  * `Normalizer.isNormalized` (no allocation when already NFC) before
  * paying the one `normalize` call. Oracle: DuckDB's `nfc_normalize`
  * over the identical dressed strings (`t_nfc`) — two independent NFC
  * implementations (JDK vs utf8proc) agreeing byte-for-byte on every
  * row IS the correctness statement.
  *
  * NFC, deliberately not NFKC: canonical composition is lossless;
  * compatibility folding (ligatures, full-width forms) changes content
  * and belongs to a quality gate's policy, not a normalizer. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** Static kernel the generated code calls. */
  def compute(s: UTF8String): UTF8String = {
    // ASCII fast path on the raw bytes: no String materialization at all
    val n = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var i = 0L
    var ascii = true
    while (ascii && i < n) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) < 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column-API entry point. */
  def nfc(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      NfcNormalize(org.apache.spark.sql.GraftBridge.expression(text)))
}

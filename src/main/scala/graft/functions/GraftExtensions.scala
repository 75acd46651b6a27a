package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native functions
  * for SQL use (`SELECT graft_dot(a.embedding, b.embedding) ...`).
  * Activate with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getCanonicalName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot takes exactly 2 arguments")
        DotProduct(args.head, args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_hyperplane_codes"),
      new ExpressionInfo(classOf[HyperplaneCodes].getCanonicalName, "graft_hyperplane_codes"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "graft_hyperplane_codes(v, tables, bits)")
        def intLit(e: Expression, name: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case _ => throw new IllegalArgumentException(s"$name must be an integer literal")
        }
        HyperplaneCodes(args.head, intLit(args(1), "tables"), intLit(args(2), "bits"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getCanonicalName, "graft_nfc"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_nfc takes exactly 1 argument")
        NfcNormalize(args.head)
      }))
  }
}

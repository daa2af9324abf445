package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Catalyst extension entry point (SURVEY §7.3): registers the native
  * codegen expressions in the session's FunctionRegistry so they are
  * first-class SQL functions, not UDFs. Activate with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def unary(name: String, build: Expression => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(name),
    new ExpressionInfo("graft.functions.NativeExpressions", name),
    { args =>
      require(args.length == 1, s"$name expects exactly one argument")
      build(args.head)
    },
  )

  /** The injected function set, also usable for direct registration into
    * an existing session's FunctionRegistry. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    unary("rabin_fp64", RabinFp64Expr.apply),
    unary("simhash64", Simhash64Expr.apply),
    unary("band_keys", BandKeysExpr.apply),
    unary("sniff_charset", SniffCharsetExpr.apply),
    unary("nibble_hist16", NibbleHist16Expr.apply),
  )

  /** Register into a live session (equivalent to the extension path for
    * sessions that already exist). */
  def registerInto(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

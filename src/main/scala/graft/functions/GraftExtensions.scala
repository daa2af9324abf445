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

  private def binary(name: String, build: (Expression, Expression) => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(name),
    new ExpressionInfo("graft.functions.NativeExpressions", name),
    { args =>
      require(args.length == 2, s"$name expects exactly two arguments")
      build(args(0), args(1))
    },
  )

  /** Evaluates a foldable argument at registration (SQL literals for the
    * plan-time constants some expressions carry as Scala parameters). */
  private def foldedValue(name: String, arg: Expression): Any = {
    require(arg.foldable, s"$name expects a literal constant argument")
    arg.eval(null)
  }

  /** The injected function set, also usable for direct registration into
    * an existing session's FunctionRegistry. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    unary("rabin_fp64", RabinFp64Expr.apply),
    unary("simhash64", Simhash64Expr.apply),
    unary("band_keys", BandKeysExpr.apply),
    unary("sniff_charset", SniffCharsetExpr.apply),
    unary("nibble_hist16", NibbleHist16Expr.apply),
    unary("shingles3", Shingles3Expr.apply),
    binary("jaccard3", Jaccard3Expr.apply),
    binary("jaccard3_sorted", Jaccard3SortedExpr.apply),
    binary("inter_sorted", InterSortedExpr.apply),
    binary("dot_seq", DotSeqExpr.apply),
    // doc_fp(text[, k]) — k defaults to the winnowing window of 4
    (
      FunctionIdentifier("doc_fp"),
      new ExpressionInfo("graft.functions.NativeExpressions", "doc_fp"),
      { args =>
        require(args.length == 1 || args.length == 2,
          "doc_fp expects (text[, k])")
        val k = if (args.length == 2)
          foldedValue("doc_fp", args(1)).asInstanceOf[Number].intValue
        else 4
        DocFpExpr(args.head, k)
      },
    ),
    // anchor_grams(text[, gram[, nibble]]) — d8's content-defined anchor
    // selection; gram defaults to 12, md5-suffix nibble to 0
    (
      FunctionIdentifier("anchor_grams"),
      new ExpressionInfo("graft.functions.NativeExpressions", "anchor_grams"),
      { args =>
        require(args.nonEmpty && args.length <= 3,
          "anchor_grams expects (text[, gram[, nibble]])")
        val gram = if (args.length >= 2)
          foldedValue("anchor_grams", args(1)).asInstanceOf[Number].intValue
        else 12
        // the nibble selector accepts an int (0..15) or the Scala API's
        // one-hex-char string convention ('a' == 10)
        val nibble = if (args.length == 3)
          foldedValue("anchor_grams", args(2)) match {
            case n: Number =>
              val i = n.intValue
              require(i >= 0 && i <= 15,
                s"anchor_grams nibble must be 0..15 or one hex char, got $i")
              i
            case s =>
              val hex = s.toString
              require(hex.length == 1 &&
                Character.digit(hex.charAt(0), 16) >= 0,
                s"anchor_grams nibble must be 0..15 or one hex char, got '$hex'")
              Character.digit(hex.charAt(0), 16)
          }
        else 0
        AnchorGramsExpr(args.head, gram, nibble)
      },
    ),
    // marker_counts(tokens, 'w1,w2|w3,…') — spec must be a string literal
    (
      FunctionIdentifier("marker_counts"),
      new ExpressionInfo("graft.functions.NativeExpressions", "marker_counts"),
      { args =>
        require(args.length == 2, "marker_counts expects (tokens, spec)")
        MarkerCountsExpr(args.head,
          foldedValue("marker_counts", args(1)).toString)
      },
    ),
  )

  /** Register into a live session (equivalent to the extension path for
    * sessions that already exist). */
  def registerInto(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

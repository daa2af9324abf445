package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made these converters
  * `private[sql]`, so extension libraries reach them from inside the
  * `org.apache.spark.sql` package namespace — the standard pattern for
  * Catalyst extension code. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Strict analysis-time input-type check for the graft native
  * expressions. `AbstractDataType`/`sameType` are `private[sql]` in
  * Spark 4, so the check lives here; semantics match `ExpectsInputTypes`
  * with concrete expected types (nullability ignored, no implicit cast —
  * a wrong-typed call fails at analysis, not with a codegen
  * ClassCastException mid-job). */
object TypeCheckBridge {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types.DataType

  def check(prettyName: String, expected: Seq[DataType],
      actual: Seq[DataType]): TypeCheckResult = {
    val bad = expected.zip(actual).zipWithIndex.collectFirst {
      case ((want, got), i) if !want.sameType(got) => (i, want, got)
    }
    bad match {
      case None => TypeCheckResult.TypeCheckSuccess
      case Some((i, want, got)) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName argument ${i + 1} requires ${want.simpleString}, " +
          s"got ${got.simpleString}")
    }
  }
}

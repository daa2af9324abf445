package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{Hashing, RabinFingerprint}

/** Static entry points the generated Java code calls — Scala `object`
  * methods compile to static forwarders, so codegen emits a plain static
  * call with no closure/boxing on the per-row path. */
object NativeFns {
  def rabinFp64(s: UTF8String): Long = RabinFingerprint.std64.fp(s.toString)
  def simhash64(s: UTF8String): Long = Hashing.simhash64(s.toString)
  def bandKeys(h: Long): ArrayData = new GenericArrayData(Hashing.bandKeys(h))
}

/** Codegen'd Catalyst expressions for the hot scalar functions
  * (SURVEY §7.3: promote UDFs to Expressions). Unlike a Scala UDF, these
  * stay inside WholeStageCodegen: null checks are generated, inputs stay
  * UTF8String (no Row boxing), and the call is a static invoke. */
abstract class NativeUnary(fn: String, out: DataType)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = out
  override def prettyName: String = fn
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NativeFns.$fn($c)")
}

/** 64-bit Rabin fingerprint of a string (FPGenerator.std64 parity). */
case class RabinFp64Expr(child: Expression)
    extends NativeUnary("rabinFp64", LongType) {
  override protected def nullSafeEval(input: Any): Any =
    NativeFns.rabinFp64(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): RabinFp64Expr = copy(child = c)
}

/** 64-bit SimHash of a text (util/SimHash.java:52 semantics). */
case class Simhash64Expr(child: Expression)
    extends NativeUnary("simhash64", LongType) {
  override protected def nullSafeEval(input: Any): Any =
    NativeFns.simhash64(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Simhash64Expr = copy(child = c)
}

/** The 20 C(6,3) LSH band keys of a simhash (DeduperUtils.java:199-300). */
case class BandKeysExpr(child: Expression)
    extends NativeUnary("bandKeys", ArrayType(LongType, containsNull = false)) {
  override protected def nullSafeEval(input: Any): Any =
    NativeFns.bandKeys(input.asInstanceOf[Long])
  override protected def withNewChildInternal(c: Expression): BandKeysExpr = copy(child = c)
}

object NativeExpressions {
  private def e(c: Column): Expression = ColumnBridge.expression(c)

  def rabinFp64(c: Column): Column = ColumnBridge.column(RabinFp64Expr(e(c)))
  def simhash64(c: Column): Column = ColumnBridge.column(Simhash64Expr(e(c)))
  def bandKeys(c: Column): Column = ColumnBridge.column(BandKeysExpr(e(c)))
}

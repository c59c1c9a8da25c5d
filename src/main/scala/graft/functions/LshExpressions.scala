package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Random-hyperplane LSH code as a native expression.
  *
  * The composable form (8 hyperplanes × 64 `lit(sign) * element_at(v, i)`
  * terms) builds a ~1000-node expression tree whose analysis/codegen cost
  * dwarfs the actual arithmetic on small inputs and bloats generated
  * methods on large ones. This expression is one tight loop.
  *
  * Hyperplane signs are derived from md5("hp:<j>:<d>") — top bit of the
  * first digest byte — the same deterministic derivation the DuckDB oracle
  * embeds as literals, and dots accumulate in index order: bit-identical
  * codes across engines.
  */
object HyperplaneLsh {

  val NumHyperplanes = 8
  val Dim = 64

  /** signs(j)(d) ∈ {+1,-1}. */
  lazy val signs: Array[Array[Double]] = {
    val md = MessageDigest.getInstance("MD5")
    Array.tabulate(NumHyperplanes, Dim) { (j, d0) =>
      val hex = md.digest(s"hp:$j:${d0 + 1}".getBytes(StandardCharsets.UTF_8))
      if ((hex(0) & 0x80) != 0) 1.0 else -1.0
    }
  }

  /** 8-char '0'/'1' code of a float/double vector. */
  def code(v: ArrayData, isFloat: Boolean): UTF8String = {
    val n = math.min(v.numElements(), Dim)
    val out = new Array[Byte](NumHyperplanes)
    var j = 0
    while (j < NumHyperplanes) {
      val s = signs(j)
      var dot = 0.0
      var d = 0
      while (d < n) {
        val x = if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)
        dot += s(d) * x
        d += 1
      }
      out(j) = if (dot > 0) '1'.toByte else '0'.toByte
      j += 1
    }
    UTF8String.fromBytes(out)
  }
}

case class HyperplaneLshCode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lsh_code requires array<float> or array<double>, got ${t.catalogString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "lsh_code"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    HyperplaneLsh.code(v.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      v => s"graft.functions.HyperplaneLsh.code($v, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneLshCode =
    copy(child = newChild)
}

object LshFunctions {
  def lshCode(v: Column): Column =
    GraftColumn.of(HyperplaneLshCode(GraftColumn.expr(v)))
}

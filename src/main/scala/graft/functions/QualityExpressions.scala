package graft.functions

import graft.filter.LangIdModel
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Gopher-style within-document repetition: frequency share of the most
  * common word n-gram. O(tokens) per row via open hash counting — a custom
  * Expression because built-in array higher-order functions would be O(n²).
  */
case class RepetitionRatio(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1)
  override def dataType: DataType = DoubleType
  override def prettyName: String = s"repetition_ratio_$n"
  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.trim
      .toLowerCase(java.util.Locale.ROOT).split("\\s+")
    val total = toks.length - n + 1
    if (total <= 0) return 0.0d
    val counts = new java.util.HashMap[String, Int](total * 2)
    var maxC = 0
    var i = 0
    val sb = new java.lang.StringBuilder
    while (i < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
      val k = sb.toString
      val c = counts.merge(k, 1, (a, b) => a + b)
      if (c > maxC) maxC = c
      i += 1
    }
    maxC.toDouble / total
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** langid(text) → struct(lang string, confidence double) via the fastText-
  * style hashed n-gram linear model. The model rides in the expression
  * (serialized once per task closure, weights shared per executor). */
case class LangIdExpression(child: Expression, model: LangIdModel)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("lang", StringType, nullable = false),
    StructField("confidence", DoubleType, nullable = false)))
  override def prettyName: String = "langid"
  override def nullSafeEval(input: Any): Any = {
    val (lang, conf) = model.classify(input.asInstanceOf[UTF8String].toString)
    InternalRow(UTF8String.fromString(lang), conf)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QualityFunctions {
  def repetition_ratio(c: Column, n: Int): Column =
    ColumnBridge.column(RepetitionRatio(ColumnBridge.expression(c), n))
  def langid(c: Column, model: LangIdModel = LangIdModel.default): Column =
    ColumnBridge.column(LangIdExpression(ColumnBridge.expression(c), model))
}

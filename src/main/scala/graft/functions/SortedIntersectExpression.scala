package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** sorted_intersect_count(a, b) → |a ∩ b| for two ASCENDING-sorted long
  * arrays with distinct elements, by a single merge walk — the Jaccard
  * verify's per-pair kernel.
  *
  * `size(array_intersect(a, b))` built a hash set over one side PER PAIR:
  * at hundreds of thousands of candidate pairs per daily batch that is a
  * hash-set allocation plus ~2·|sh| hashed inserts/probes per pair, just to
  * be counted and thrown away. The merge walk is two pointers over the
  * sorted arrays — zero allocation, no hashing — and the sort is paid ONCE
  * per document (in the shingle-table projection), not once per pair.
  *
  * Correctness contract: both inputs must be sorted ascending with no
  * duplicate elements (ShingleHashes emits distinct hashes; the caller
  * sorts with sort_array). Under that contract the merge count equals
  * |a ∩ b| exactly — the same value array_intersect's size produced
  * (DedupSpec pins the identity against the hash-set form).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  // analysis-time type check (the ExpectsStringInput discipline): a
  // non-long-array child must fail at analysis, not per-task with a
  // ClassCastException
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = ArrayType(LongType)
    if (children.forall(c => c.dataType match {
        case ArrayType(LongType, _) => true
        case _ => false
      })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two $ok children, got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < nx && j < ny) {
      val vx = x.getLong(i)
      val vy = y.getLong(j)
      if (vx == vy) { n += 1; i += 1; j += 1 }
      else if (vx < vy) i += 1
      else j += 1
    }
    n
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectFunctions {
  def sorted_intersect_count(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes
import org.apache.spark.sql.types.{AbstractDataType, StringType}

/** [[ExpectsInputTypes]] bound to one string argument — the analysis-time
  * type check every text expression here wants (a non-string child would
  * otherwise launch and die per-task with a ClassCastException mid-batch).
  * `AbstractDataType` is `private[sql]`, so the binding lives in this shim
  * package alongside [[ColumnBridge]]. */
trait ExpectsStringInput extends ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
}

package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Minimal bridge to Spark 4's `private[sql]` Column <-> Expression conversions
 * (org.apache.spark.sql.classic.ExpressionUtils). Lives under org.apache.spark.sql
 * only to satisfy the access modifier; no Spark internals are modified.
 */
object Shim {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}

/** `private[sql]` analysis types re-exported for the graft expression layer. */
object ShimTypes {
  type AbstractDataType = org.apache.spark.sql.types.AbstractDataType
  def typeCollection(types: org.apache.spark.sql.types.AbstractDataType*): AbstractDataType =
    org.apache.spark.sql.types.TypeCollection(types: _*)
  def accepts(t: AbstractDataType, dt: org.apache.spark.sql.types.DataType): Boolean =
    t.acceptsType(dt)
}

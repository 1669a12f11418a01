package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit}

/** eel's pushdown-predicate DSL (reference:
  * eel-core/src/main/scala/io/eels/Predicate.scala) re-expressed as
  * plain `Column` builders.
  *
  * In eel each Predicate carries row-group-statistics logic
  * (`canDropGroup`) so the parquet component can skip row groups; on
  * Spark that machinery is the engine's job — any `Column` predicate
  * on a parquet relation is translated to parquet filters
  * automatically (visible as `PushedFilters` in `.explain`), including
  * row-group and page-level statistics skipping. So the DSL is a thin
  * naming shim for users porting eel code; new code can pass Columns
  * directly.
  */
object Predicates {
  def equals(name: String, value: Any): Column = col(name) === lit(value)
  def notEquals(name: String, value: Any): Column = col(name) =!= lit(value)
  def gt(name: String, value: Any): Column = col(name) > lit(value)
  def gte(name: String, value: Any): Column = col(name) >= lit(value)
  def lt(name: String, value: Any): Column = col(name) < lit(value)
  def lte(name: String, value: Any): Column = col(name) <= lit(value)
  def in(name: String, values: Seq[Any]): Column = col(name).isInCollection(values)
  def isNull(name: String): Column = col(name).isNull
  def isNotNull(name: String): Column = col(name).isNotNull
  def not(p: Column): Column = !p
  def or(l: Column, r: Column): Column = l || r
  def or(ps: Seq[Column]): Column = ps.reduce(_ || _)
  def and(l: Column, r: Column): Column = l && r
  def and(ps: Seq[Column]): Column = ps.reduce(_ && _)
}

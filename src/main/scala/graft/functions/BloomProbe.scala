package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression: membership probe of a pre-built bloom filter
  * against a BIGINT key — the probe half of a BLOOM SEMI-JOIN REDUCTION
  * ([[graft.operators.Joins.qJ12]]).
  *
  * The filter arrives as the serialized bytes of a
  * `org.apache.spark.util.sketch.BloomFilter` (the distributed
  * partial+merge aggregate `DataFrameStatFunctions.bloomFilter` produces —
  * the same build path [[graft.operators.Relational.qV6]] uses), captured as
  * a plan constant: the bytes ship to executors with the serialized
  * expression once per task, and the filter deserializes lazily per
  * executor — never per row. The probe itself participates in whole-stage
  * codegen via [[doGenCode]], so it fuses into the scan's generated loop:
  * at 100 TB the whole point is that the probe runs INSIDE the map stage,
  * before any exchange, at (two-hash + bit-test) cost per row.
  *
  * This is the engine-surface equivalent of Spark's own injected runtime
  * bloom filters (`spark.sql.optimizer.runtime.bloomFilter.enabled`), but
  * available as an EXPLICIT operator: the optimizer's version only fires
  * when its heuristics detect a selective creation side, while a pipeline
  * that KNOWS its dim filter is selective (the qJ12 contract) states the
  * reduction declaratively and keeps it under test.
  *
  * Null key → null (three-valued logic, like any membership predicate);
  * used under a WHERE, null rows drop — matching the join they pre-filter.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects a BIGINT key, got ${child.dataType.sql}")

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(v: Any): Any =
    java.lang.Boolean.valueOf(bloom.mightContainLong(v.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the DESERIALIZED filter: one object per generated class,
    // probe is a direct virtual call inside the fused loop
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** U-3: document flattener — a custom Catalyst `Generator` (UDTF) that
  * explodes one nested document into `(path, value)` rows, generalizing the
  * reference's recursive traversals (pk extraction
  * /root/reference/src/migration.py:24-39, system-field stripping
  * migration.py:214-227, sanitizer walk sanitizer.py:41-63) into a single
  * reusable operator: path syntax `a.b[2].c` for struct fields, array
  * indices, and map keys; scalars render as strings, nulls stay null.
  *
  * As a Generator it fans out executor-side with no shuffle (same plan shape
  * as `explode`). Structure recursion is data-dependent, so this is eval-mode
  * ([[CodegenFallback]]) — acceptable because flattening is a leaf operator
  * feeding aggregations, not an inner-loop predicate.
  */
case class DocFlatten(child: Expression)
  extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("value", StringType, nullable = true)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val out = ArrayBuffer.empty[InternalRow]
    walk(child.eval(input), child.dataType, "", out)
    out
  }

  private def emit(path: String, v: String, out: ArrayBuffer[InternalRow]): Unit =
    out += InternalRow(UTF8String.fromString(path),
      if (v == null) null else UTF8String.fromString(v))

  private def join(prefix: String, name: String): String =
    if (prefix.isEmpty) name else s"$prefix.$name"

  private def walk(v: Any, dt: DataType, path: String,
                   out: ArrayBuffer[InternalRow]): Unit = dt match {
    case _ if v == null => emit(path, null, out)
    case st: StructType =>
      val row = v.asInstanceOf[InternalRow]
      st.fields.zipWithIndex.foreach { case (f, i) =>
        walk(row.get(i, f.dataType), f.dataType, join(path, f.name), out)
      }
    case ArrayType(et, _) =>
      val arr = v.asInstanceOf[ArrayData]
      (0 until arr.numElements()).foreach { i =>
        walk(arr.get(i, et), et, s"$path[$i]", out)
      }
    case MapType(StringType, vt, _) =>
      val m = v.asInstanceOf[MapData]
      val keys = m.keyArray(); val vals = m.valueArray()
      (0 until m.numElements()).foreach { i =>
        walk(vals.get(i, vt), vt, join(path, keys.getUTF8String(i).toString), out)
      }
    case _ => emit(path, scalarToString(v, dt), out)
  }

  private def scalarToString(v: Any, dt: DataType): String = dt match {
    case StringType => v.asInstanceOf[UTF8String].toString
    case BinaryType => java.util.Base64.getEncoder.encodeToString(v.asInstanceOf[Array[Byte]])
    case _          => v.toString
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

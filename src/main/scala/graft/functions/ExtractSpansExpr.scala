package graft.functions

import graft.adapters.Dispatch
import graft.core.{Doc, Model, Span}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document extraction as a Catalyst expression over the RAW row:
  * input is the `spans` array column (InternalRow structs / UTF8Strings),
  * output the full extraction result struct — no `Dataset[Doc]` encoder
  * deserialization, no object-serializer on the way back, no
  * DeserializeToObject/SerializeFromObject plan nodes. The adapter logic is
  * byte-identical to the typed path (both call [[Dispatch.extractDoc]]);
  * only the row plumbing differs. PipelineSpec asserts result equality and
  * that the expression is evaluated exactly once per row (a naive
  * `struct.*` expansion would let CollapseProject duplicate a cheap
  * expression — this one is non-cheap, which blocks inlining).
  *
  * The typed `mapPartitions` path remains the extension surface for
  * adapters needing per-partition setup; this is the tight-loop default.
  */
case class ExtractSpansExpr(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ExtractSpansExpr.outputType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val spans = new Array[Span](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 4)
      spans(i) = Span(
        if (row.isNullAt(0)) "" else row.getUTF8String(0).toString,
        if (row.isNullAt(1)) "" else row.getUTF8String(1).toString,
        if (row.isNullAt(2)) "" else row.getUTF8String(2).toString,
        if (row.isNullAt(3)) 0 else row.getInt(3))
      i += 1
    }
    val t0 = System.nanoTime()
    val out = Dispatch.extractDoc(
      Doc("", scala.collection.immutable.ArraySeq.unsafeWrapArray(spans)))
    val ms = (System.nanoTime() - t0) / 1000000L
    val outSpans = new GenericArrayData(out.spans.iterator.map { s =>
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(s.kind), UTF8String.fromString(s.text),
        UTF8String.fromString(s.media_ref), s.offset)): Any
    }.toArray)
    new GenericInternalRow(Array[Any](
      outSpans,
      UTF8String.fromString(out.status),
      UTF8String.fromString(out.error),
      UTF8String.fromString(out.error_type),
      UTF8String.fromString(out.adapter),
      out.span_count, out.page_count, ms))
  }

  override protected def withNewChildInternal(newChild: Expression): ExtractSpansExpr =
    copy(child = newChild)
}

object ExtractSpansExpr {
  val outputType: StructType = StructType(Seq(
    StructField("spans", ArrayType(Model.spanType, containsNull = false), nullable = false),
    StructField("status", StringType, nullable = false),
    StructField("error", StringType, nullable = false),
    StructField("error_type", StringType, nullable = false),
    StructField("adapter", StringType, nullable = false),
    StructField("span_count", IntegerType, nullable = false),
    StructField("page_count", IntegerType, nullable = false),
    StructField("processing_time_ms", LongType, nullable = false)))

  def extractSpans(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.SqlBridge
    SqlBridge.column(ExtractSpansExpr(SqlBridge.expression(c)))
  }
}

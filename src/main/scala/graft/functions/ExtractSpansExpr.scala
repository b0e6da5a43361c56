package graft.functions

import graft.adapters.Dispatch
import graft.core.{Doc, Model, Span}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document extraction as a Catalyst expression over the RAW row:
  * inputs are the `spans` array column and the `metadata` map column
  * (InternalRow structs / UTF8Strings), output the full extraction result
  * struct — no `Dataset[Doc]` encoder deserialization, no object-serializer
  * on the way back, no DeserializeToObject/SerializeFromObject plan nodes.
  * The adapter logic is byte-identical to the typed path (both call
  * [[Dispatch.extractDoc]]); only the row plumbing differs. PipelineSpec
  * asserts result equality and that the expression is evaluated exactly
  * once per row (a naive `struct.*` expansion would let CollapseProject
  * duplicate a cheap expression — this one is non-cheap, which blocks
  * inlining).
  *
  * The typed `mapPartitions` path remains the extension surface for
  * adapters needing per-partition setup; this is the tight-loop default.
  */
case class ExtractSpansExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ExtractSpansExpr.outputType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val spansIn = left.eval(input)
    val metaIn = right.eval(input)
    // null spans (nullable column in externally-written parquet): pass
    // null through to Dispatch.extractDoc, which degrades it to a failed
    // ROW — an NPE here would kill the task, not the document
    val spans: Array[Span] =
      if (spansIn == null) null
      else {
        val arr = spansIn.asInstanceOf[ArrayData]
        val n = arr.numElements()
        val out = new Array[Span](n)
        var i = 0
        while (i < n) {
          val row = arr.getStruct(i, 4)
          // null ELEMENT (containsNull=true input): pass the null through —
          // Dispatch.extractDoc degrades it to a failed validation row
          out(i) =
            if (row == null) null
            else Span(
              if (row.isNullAt(0)) "" else row.getUTF8String(0).toString,
              if (row.isNullAt(1)) "" else row.getUTF8String(1).toString,
              if (row.isNullAt(2)) "" else row.getUTF8String(2).toString,
              if (row.isNullAt(3)) 0 else row.getInt(3))
          i += 1
        }
        out
      }
    val docMeta: Map[String, String] = metaIn match {
      case null => Map.empty
      case m: MapData =>
        val ks = m.keyArray(); val vs = m.valueArray()
        val b = Map.newBuilder[String, String]
        var j = 0
        while (j < m.numElements()) {
          b += ks.getUTF8String(j).toString ->
            (if (vs.isNullAt(j)) "" else vs.getUTF8String(j).toString)
          j += 1
        }
        b.result()
    }
    val t0 = System.nanoTime()
    val out = Dispatch.extractDoc(
      Doc("",
        if (spans == null) null
        else scala.collection.immutable.ArraySeq.unsafeWrapArray(spans),
        docMeta))
    val ms = (System.nanoTime() - t0) / 1000000L
    val outSpans = new GenericArrayData(out.spans.iterator.map { s =>
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(s.kind), UTF8String.fromString(s.text),
        UTF8String.fromString(s.media_ref), s.offset)): Any
    }.toArray)
    // deterministic (sorted) key order so the map bytes are stable across
    // both extraction paths and across runs
    val entries = out.metadata.toArray.sortBy(_._1)
    val outMeta = new ArrayBasedMapData(
      new GenericArrayData(entries.map(e => UTF8String.fromString(e._1): Any)),
      new GenericArrayData(entries.map(e => UTF8String.fromString(e._2): Any)))
    new GenericInternalRow(Array[Any](
      outSpans,
      UTF8String.fromString(out.status),
      UTF8String.fromString(out.error),
      UTF8String.fromString(out.error_type),
      UTF8String.fromString(out.adapter),
      out.span_count, out.page_count, ms, outMeta))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ExtractSpansExpr =
    copy(left = newLeft, right = newRight)
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
    StructField("processing_time_ms", LongType, nullable = false),
    StructField("metadata", MapType(StringType, StringType, valueContainsNull = false),
      nullable = false)))

  def extractSpans(spans: Column, metadata: Column): Column = {
    import org.apache.spark.sql.graftbridge.SqlBridge
    SqlBridge.column(ExtractSpansExpr(
      SqlBridge.expression(spans), SqlBridge.expression(metadata)))
  }
}

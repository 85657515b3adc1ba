package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation of a word column under a fixed unigram-LM
  * piece-cost table ([[graft.pipeline.UnigramLm.segment]]). The cost
  * table is bounded driver state (≤ 64 entries) embedded as a codegen
  * reference object, so the E-step runs as one generated-code pass
  * over the distinct-word table: a static call per row, no closure
  * dispatch, no Row boxing — the same static-kernel shape as the BPE
  * token counter. */
case class UnigramSegment(child: Expression, pieces: Seq[String],
                          costs: Seq[Long])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_segment"

  @transient private lazy val table: java.util.HashMap[String, java.lang.Long] =
    UnigramSegment.buildTable(pieces.toArray, costs.toArray)

  override def nullSafeEval(w: Any): Any =
    UnigramSegment.run(w.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramTable", table,
      "java.util.HashMap<String, Long>")
    nullSafeCodeGen(ctx, ev, w => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  graft.functions.UnigramSegment.run($w, $ref);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object UnigramSegment {
  def buildTable(pieces: Array[String], costs: Array[Long])
      : java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), costs(i)); i += 1 }
    m
  }

  /** static kernel entry point used from generated code */
  def run(word: UTF8String,
          table: java.util.HashMap[String, java.lang.Long]): ArrayData = {
    val segs = graft.pipeline.UnigramLm.segment(word.toString, table)
    new GenericArrayData(segs.map(UTF8String.fromString(_)))
  }
}

object UnigramF {
  /** segment a word column under driver-state piece costs */
  def segment(word: Column, costs: Map[String, Long]): Column = {
    val entries = costs.toSeq.sortBy(_._1)
    GraftColumnBridge.column(UnigramSegment(
      GraftColumnBridge.expression(word),
      entries.map(_._1), entries.map(_._2)))
  }
}

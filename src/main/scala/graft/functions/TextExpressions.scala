package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst text kernels (SURVEY §2.10 preference order (b)):
  * the gram-stream builders feed every hashed-feature operator (DSIR
  * importance models, n-gram fingerprints), and the higher-order-
  * function formulation (`transform(sequence(...), i =>
  * concat(element_at(w, i), " ", element_at(w, i+1)))`) has no codegen
  * path in Spark — HigherOrderFunction evaluates interpreted, boxing a
  * lambda variable per element (measured: the x42 gram explode at
  * sf0.1 spent ~1.7 s in the interpreted transform; this kernel makes
  * it map-speed). Output order and content are bit-identical to the
  * transform form (FunctionsSpec pins it), so the DuckDB oracle twin
  * (`list_concat(w, list_transform(...))`) is unchanged.
  */
object TextExpressions {

  /** unigrams ++ adjacent-pair bigrams ("a b") of a token array, in
    * token order — the DSIR feature stream. One pass, zero boxing. */
  final case class UnigramBigramConcat(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(StringType, containsNull = true)
    override def prettyName: String = "graft_uni_bigrams"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val m = if (n >= 2) 2 * n - 1 else n
      val out = new Array[AnyRef](m)
      val sp = UTF8String.fromString(" ")
      var i = 0
      while (i < n) { out(i) = arr.getUTF8String(i); i += 1 }
      i = 0
      while (i < n - 1) {
        out(n + i) = UTF8String.concat(arr.getUTF8String(i), sp,
          arr.getUTF8String(i + 1))
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val m = ctx.freshName("m")
        val out = ctx.freshName("out")
        val sp = ctx.addReferenceObj("space", UTF8String.fromString(" "),
          classOf[UTF8String].getName)
        s"""
           |final int $n = $a.numElements();
           |final int $m = ($n >= 2) ? (2 * $n - 1) : $n;
           |final Object[] $out = new Object[$m];
           |for (int $i = 0; $i < $n; $i++) {
           |  $out[$i] = $a.getUTF8String($i);
           |}
           |for (int $i = 0; $i < $n - 1; $i++) {
           |  $out[$n + $i] = org.apache.spark.unsafe.types.UTF8String.concat(
           |    $a.getUTF8String($i), $sp, $a.getUTF8String($i + 1));
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column-API entry: unigrams ++ bigrams of a token-array column. */
  def uniBigrams(tokens: Column): Column =
    ColumnBridge.column(UnigramBigramConcat(ColumnBridge.expr(tokens)))
}

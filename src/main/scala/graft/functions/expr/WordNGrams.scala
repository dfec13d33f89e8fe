package graft.functions.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Space-joined word n-grams of a token array, as one native expression.
  *
  * Replaces the built-in chain
  * `transform(sequence(1, size-n+1), i -> concat_ws(" ", slice(toks,i,n)))`
  * which evaluates five interpreted HigherOrderFunction/collection ops per
  * row and dominated the set-similarity profile (~1.8 ms/doc). A single
  * eval building UTF8Strings directly is ~an order of magnitude cheaper;
  * the shape (per-row projection, no shuffle) is unchanged.
  *
  * Returns fewer-than-n-token docs as an empty array (same contract as
  * TextFunctions.wordGrams).
  */
case class WordNGrams(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), IntegerType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_ngrams"

  private lazy val space = UTF8String.fromString(" ")

  override def nullSafeEval(toksAny: Any, nAny: Any): Any = {
    val toks = toksAny.asInstanceOf[ArrayData]
    val n = nAny.asInstanceOf[Int]
    val m = toks.numElements()
    if (n <= 0 || m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    val words = new Array[UTF8String](m)
    var i = 0
    while (i < m) { words(i) = toks.getUTF8String(i); i += 1 }
    i = 0
    while (i <= m - n) {
      val parts = new Array[UTF8String](2 * n - 1)
      var j = 0
      while (j < n) {
        parts(2 * j) = words(i + j)
        if (j < n - 1) parts(2 * j + 1) = space
        j += 1
      }
      out(i) = UTF8String.concat(parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordNGrams =
    copy(left = newLeft, right = newRight)
}

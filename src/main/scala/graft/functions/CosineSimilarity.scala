package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for cosine similarity over two
  * array<double> columns, with whole-stage codegen (`doGenCode`).
  *
  * Semantics are bit-identical to the composed higher-order form
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, +) / (sqrt(Σx²)·sqrt(Σy²))`
  * — all three sums accumulate in index order — so it is a drop-in
  * replacement that preserves the DuckDB oracle contract. The win over
  * the HOF form is avoiding the materialized product array and the
  * per-element lambda interpretation: one fused primitive loop, inlined
  * into the surrounding codegen stage. As with the HOF form, a length
  * mismatch or a null element yields NULL.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  // Null/shape semantics mirror the HOF composition exactly: a length
  // mismatch or any null element yields NULL (zip_with pads with null and
  // the fold propagates it) — keeping the drop-in-replacement contract.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xi = $a.getDouble($i);
         |    double $yi = $b.getDouble($i);
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Registration + Column-level API for the graft native functions. */
object GraftFunctions {

  /** Idempotent per-session SQL registration of ALL graft native
    * functions — the fallback for sessions built without
    * `spark.sql.extensions=graft.GraftExtensions` (extension-configured
    * sessions already have them injected). */
  def register(spark: SparkSession): Unit = {
    def one(name: String, arity: Int)(
        builder: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
          org.apache.spark.sql.catalyst.expressions.Expression): Unit =
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name,
        exprs => {
          if (exprs.length != arity)
            throw new IllegalArgumentException(
              s"$name requires exactly $arity argument(s), got ${exprs.length}")
          builder(exprs)
        },
        "built-in")
    one("cosine_similarity", 2)(xs => CosineSimilarity(xs.head, xs(1)))
    one("dot_product", 2)(xs => DotProduct(xs.head, xs(1)))
    one("l2_norm", 1)(xs => L2Norm(xs.head))
  }

  def cosine_similarity(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("cosine_similarity", a, b)
  }
}

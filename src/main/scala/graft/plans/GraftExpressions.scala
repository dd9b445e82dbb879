package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot scalar functions (SURVEY §2.11:
  * "consider Expression for the hot two") — they stay inside whole-stage
  * codegen (a generated static call, no ScalaUDF encoder round-trip, no
  * closure serialization) and get proper null semantics for free.
  */

/** Static entry points the generated code calls. */
object GraftExprs {
  def canonicalize(url: UTF8String): UTF8String =
    UTF8String.fromString(graft.urlkit.UrlKit.canonicalizeUrl(url.toString))

  def fingerprintHex(url: UTF8String): UTF8String =
    UTF8String.fromString(graft.urlkit.UrlKit.toHex(
      graft.urlkit.UrlKit.fingerprint(url.toString)))

  def phashHamming(a: Long, b: Long): Long =
    java.lang.Long.bitCount(a ^ b).toLong

  private def toArrayData(vals: Seq[String]): ArrayData =
    new GenericArrayData(vals.map(UTF8String.fromString).toArray[Any])

  def cssSelect(html: UTF8String, query: UTF8String): ArrayData =
    toArrayData(graft.extract.Sel.cssSelectAll(html.toString, query.toString))

  def xpathSelect(html: UTF8String, query: UTF8String): ArrayData =
    toArrayData(graft.extract.Sel.xpathSelectAll(html.toString, query.toString))

  def jmespathSelect(json: UTF8String, query: UTF8String): ArrayData =
    toArrayData(graft.extract.JmesPath.selectAll(json.toString, query.toString))

  /** Dot product over two array<double> columns, bit-identical to the
    * interpreted HOF chain `aggregate(zip_with(a, b, (x,y) -> x*y), 0D,
    * (acc,x) -> acc + x)`: same ascending-index IEEE add/mul sequence, null
    * when the lengths differ or any element is null (zip_with pads the
    * shorter side with null, null products poison the fold). Boxed return
    * so codegen can see the null. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

/** canonicalize_url as a codegen-friendly unary expression. */
case class CanonicalizeUrlExpr(child: Expression)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    GraftExprs.canonicalize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.GraftExprs.canonicalize($c)")
  override protected def withNewChildInternal(newChild: Expression): CanonicalizeUrlExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_canonicalize"
}

/** Request fingerprint (hex) as a codegen-friendly unary expression. */
case class FingerprintHexExpr(child: Expression)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    GraftExprs.fingerprintHex(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.GraftExprs.fingerprintHex($c)")
  override protected def withNewChildInternal(newChild: Expression): FingerprintHexExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_fp_hex"
}

/** Hamming distance of two phash64 values — fully codegen'd (bitCount). */
case class PhashHammingExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    GraftExprs.phashHamming(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"(long) java.lang.Long.bitCount($a ^ $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PhashHammingExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_phash_hamming"
}

/** parsel-subset css extraction (`Sel.cssSelectAll`, parsed-query cached):
  * `graft_css_select(html, 'a::attr(href)')` → array<string>. Stays inside
  * whole-stage codegen as a static call — the Spark-side form of the
  * reference's `response.css(q).getall()` for DataFrame pipelines
  * (`df.select(explode(graft_css_select(...)))`). */
case class CssSelectExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(a: Any, b: Any): Any =
    GraftExprs.cssSelect(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.GraftExprs.cssSelect($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CssSelectExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_css_select"
}

/** parsel-subset xpath extraction: `graft_xpath_select(html, '//a/@href')`
  * → array<string> (`Sel.xpathSelectAll`). */
case class XPathSelectExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(a: Any, b: Any): Any =
    GraftExprs.xpathSelect(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.GraftExprs.xpathSelect($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): XPathSelectExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_xpath_select"
}

/** jmespath-subset extraction over a JSON column:
  * `graft_jmespath(js, 'user[*].name')` → array<string> (strings raw,
  * other values json.dumps-rendered — parsel `.jmespath(q).getall()`
  * semantics; the subset is documented on [[graft.extract.JmesPath]]).
  * Complements Spark's `get_json_object` where a projection fans out. */
case class JmesPathSelectExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(a: Any, b: Any): Any =
    GraftExprs.jmespathSelect(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.GraftExprs.jmespathSelect($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JmesPathSelectExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_jmespath"
}

/** Codegen'd cosine-kernel dot product (r6 optimization round, guide "per-
  * task work": the similarity queries' hot path was the interpreted
  * `aggregate(zip_with(...))` HOF pair, evaluated per candidate pair).
  * `graft_dot(a, b)` → double; FP-identical to the HOF chain it replaces
  * (see [[GraftExprs.dot]]), so DuckDB-verified rankings are unchanged. */
case class DotExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null elements / length mismatch
  override def nullSafeEval(a: Any, b: Any): Any =
    GraftExprs.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotRes")
      s"""java.lang.Double $r = graft.plans.GraftExprs.dot($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
         |""".stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_dot"
}

/** Session extensions: register the expressions as SQL functions —
  * `spark.sql("SELECT graft_canonicalize(url) ...")` — via
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or config
  * `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_canonicalize"),
      new ExpressionInfo(classOf[CanonicalizeUrlExpr].getName, "graft_canonicalize"),
      (children: Seq[Expression]) => CanonicalizeUrlExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_fp_hex"),
      new ExpressionInfo(classOf[FingerprintHexExpr].getName, "graft_fp_hex"),
      (children: Seq[Expression]) => FingerprintHexExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_phash_hamming"),
      new ExpressionInfo(classOf[PhashHammingExpr].getName, "graft_phash_hamming"),
      (children: Seq[Expression]) => PhashHammingExpr(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_css_select"),
      new ExpressionInfo(classOf[CssSelectExpr].getName, "graft_css_select"),
      (children: Seq[Expression]) => CssSelectExpr(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_xpath_select"),
      new ExpressionInfo(classOf[XPathSelectExpr].getName, "graft_xpath_select"),
      (children: Seq[Expression]) => XPathSelectExpr(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotExpr].getName, "graft_dot"),
      (children: Seq[Expression]) => DotExpr(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_jmespath"),
      new ExpressionInfo(classOf[JmesPathSelectExpr].getName, "graft_jmespath"),
      (children: Seq[Expression]) => JmesPathSelectExpr(children.head, children(1))))
  }
}

package graft.plans

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Main-content extraction kernel ([[graft.functions.WebText
  * .mainContent]]) as a codegen expression: block-segmented
  * length/link-density classification in ONE kernel call per row —
  * the block explode→per-block-regex→re-agg formulation would shuffle
  * the corpus by ~block count and run its regexes as CodegenFallback
  * lambdas; this stays a narrow projection inside the scan's
  * whole-stage span. Returns struct(n_blocks INT, n_good INT,
  * main_text STRING). */
case class MainContent(child: Expression, minChars: Int)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_blocks", IntegerType, nullable = false),
    StructField("n_good", IntegerType, nullable = false),
    StructField("main_text", StringType, nullable = false)))
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"main_content requires string input, got ${child.dataType}")
  }
  override def nullSafeEval(v: Any): Any =
    graft.functions.WebText.mainContent(v.asInstanceOf[UTF8String], minChars)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WebText.mainContent($c, $minChars)")
  override protected def withNewChildInternal(newChild: Expression): MainContent =
    copy(child = newChild)
  override def prettyName: String = "main_content"
}

/** HTML character-reference decode ([[graft.functions.HtmlEntities
  * .decode]]) as a codegen expression: numeric `&#D;`/`&#xH;` refs
  * decode to arbitrary code points, which no built-in chain can
  * express (Spark's `chr` is Latin-1-only), and the chained-replace
  * formulation re-scans the string once per named entity — this is
  * ONE pass per row inside the scan's whole-stage span. */
case class HtmlEntityDecode(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"html_entity_decode requires string input, got ${child.dataType}")
  }
  override def nullSafeEval(v: Any): Any =
    graft.functions.HtmlEntities.decode(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlEntities.decode($c)")
  override protected def withNewChildInternal(
      newChild: Expression): HtmlEntityDecode =
    copy(child = newChild)
  override def prettyName: String = "html_entity_decode"
}

/** Legacy-charset decode ([[graft.functions.Charsets.decode]]) as a
  * codegen expression: Spark 4's `decode` whitelists 7 charsets, so
  * Shift_JIS / EUC-KR / GBK / Big5 pages (several % of the web;
  * dominant in the JP/KR/CN crawl segments) cannot decode through the
  * built-in — they would mojibake and poison lang-ID and quality
  * signals downstream. The charset LABEL is a per-row column (each
  * page declares its own); the result is NULL for labels neither the
  * WHATWG alias table nor the JVM knows, so the caller coalesces to
  * the WHATWG UTF-8 default as an explicit, testable fallback. */
case class CharsetDecode(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def checkInputDataTypes() = {
    if (left.dataType == BinaryType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"charset_decode requires (binary, string), got " +
        s"(${left.dataType}, ${right.dataType})")
  }
  override def nullSafeEval(body: Any, label: Any): Any =
    graft.functions.Charsets.decode(
      body.asInstanceOf[Array[Byte]], label.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, l) =>
      s"""${ev.value} = graft.functions.Charsets.decode($b, $l);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharsetDecode =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "charset_decode"
}

object WebTextExpressions {
  /** Main-content extraction over a string column. */
  def mainContent(c: Column, minChars: Int = 25): Column =
    GraftSqlShim.column(MainContent(GraftSqlShim.expression(c), minChars))

  /** HTML character-reference decode over a string column. */
  def htmlEntityDecode(c: Column): Column =
    GraftSqlShim.column(HtmlEntityDecode(GraftSqlShim.expression(c)))

  /** Legacy-charset decode of a binary column under a per-row label
    * column; null when the label is unknown. */
  def charsetDecode(body: Column, label: Column): Column =
    GraftSqlShim.column(CharsetDecode(
      GraftSqlShim.expression(body), GraftSqlShim.expression(label)))
}

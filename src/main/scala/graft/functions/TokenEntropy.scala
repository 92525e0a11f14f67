package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-document token Shannon entropy for
  * [[graft.operators.TextAnalysis.tokenEntropy]].
  *
  * The aggregate formulation (repartition by doc → explode → two grouped
  * aggregates) shuffles every document body just to count tokens that
  * never leave their row — measured 7.6 s at 100× stress. This kernel
  * folds the whole computation into the scan: split into whitespace
  * tokens, count with one hash map, and evaluate
  * H = ln n − (Σ c·ln c)/n in-row.
  *
  * Bit-compatibility contract (property-pinned against the aggregate
  * twin, which is what the DuckDB oracle proves): tokens are the
  * `split("\\s+", -1)` segments INCLUDING leading/trailing empties; each
  * ln is HALF_UP-rounded to 6 dp exactly like Spark's `round(log(x), 6)`
  * (BigDecimal.valueOf(double).setScale(6, HALF_UP)); each rounded ln is
  * scaled to an exact ×10⁶ long (the DECIMAL(18,6) image), c·ln c
  * accumulates as a plain long sum (order-free, exact — the DECIMAL sum's
  * integer image), and the final subtract/divide reproduce the column
  * form's Decimal→Double cast then IEEE ops. */
case class TokenEntropy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_entropy requires string, got ${other.sql}")
  }

  override def dataType: DataType = TokenEntropy.schema
  override def prettyName: String = "token_entropy"

  override protected def nullSafeEval(input: Any): Any =
    TokenEntropy.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.functions.TokenEntropy.compute($input);")

  override protected def withNewChildInternal(newChild: Expression): TokenEntropy =
    copy(child = newChild)
}

object TokenEntropy {

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("entropy", DoubleType, nullable = false)))

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** round(ln(x), 6) exactly as Spark's Round over a DoubleType: the
    * shortest-decimal BigDecimal of the double, HALF_UP at scale 6 —
    * returned as the exact ×10⁶ integer (its DECIMAL(18,6) image). */
  @inline private def lnRounded6(x: Long): Long =
    java.math.BigDecimal.valueOf(Math.log(x.toDouble))
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .movePointRight(6).longValueExact()

  /** Called from generated code — one virtual call per row. */
  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    val n = s.length
    // split("\s+", -1) segments, counted into a hash map: segment
    // boundaries are maximal whitespace runs; leading/trailing runs
    // produce the empty segments Java split keeps at limit -1
    val counts = new java.util.HashMap[String, Array[Long]]()
    var total = 0L
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || isWs(s.charAt(i))) {
        val tok = s.substring(start, i)
        total += 1L
        val slot = counts.get(tok)
        if (slot == null) counts.put(tok, Array(1L)) else slot(0) += 1L
        // skip the whole whitespace run
        var j = i
        while (j < n && isWs(s.charAt(j))) j += 1
        start = j
        i = if (j > i) j else i + 1
      } else i += 1
    }
    var clnc6 = 0L // Σ c·round6(ln c) at the exact ×10⁶ scale
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      clnc6 += c * lnRounded6(c)
    }
    // the column form's tail: DECIMAL(38,6) → Double cast, then IEEE
    val sumD = new java.math.BigDecimal(clnc6)
      .movePointLeft(6).doubleValue()
    val lnN = java.math.BigDecimal.valueOf(Math.log(total.toDouble))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    new GenericInternalRow(Array[Any](
      total, counts.size().toLong, lnN - sumD / total.toDouble))
  }
}

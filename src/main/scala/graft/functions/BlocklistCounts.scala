package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring counting via an Aho–Corasick automaton — the
  * blocklist/safety-term primitive of a corpus filter: per document, the
  * occurrence count of EVERY term of a fixed blocklist in ONE left-to-right
  * scan of the text, however many terms the list carries.
  *
  * Semantics (shared with the property-test twin [[BlocklistCounts.reference]]):
  * counts(i) = number of positions where terms(i) occurs in the input —
  * ALL occurrences, overlapping included, each term counted independently
  * (a term that is a substring of another still counts its own matches).
  * Case-sensitive; callers normalize case upstream (`lower`).
  *
  * Why a kernel: the naive form is one `replace`/`regexp_count` pass PER
  * TERM — T scans of every document, and a regex alternation can't report
  * per-term counts. The automaton ships embedded in the expression
  * (plan-serialized once per stage, like the subword trie), compiles its
  * goto/fail/output tables per executor (@transient lazy), and each row is
  * one scan: O(len + matches) regardless of T — scan-speed at 100 TB,
  * zero shuffle, inside whole-stage codegen via one reference-object call.
  *
  * Oracle contract: for BORDER-FREE terms (no proper prefix that is also a
  * suffix) occurrences cannot self-overlap, so the non-overlapping
  * replace-count formula `(len(t) - len(replace(t, term, ''))) / len(term)`
  * equals this count exactly — the DuckDB oracle uses it per term
  * ([[graft.SparkEntry]] generates both sides from one term list).
  */
case class BlocklistCounts(child: Expression, terms: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"blocklist_counts requires string, got ${other.sql}")
  }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def prettyName: String = "blocklist_counts"

  @transient private lazy val auto: AhoCorasick =
    new AhoCorasick(terms.toArray)

  override protected def nullSafeEval(input: Any): Any =
    auto.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val a = ctx.addReferenceObj("blocklistAuto", auto,
        classOf[AhoCorasick].getName)
      s"${ev.value} = $a.counts($input);"
    })

  override protected def withNewChildInternal(newChild: Expression): BlocklistCounts =
    copy(child = newChild)
}

object BlocklistCounts {

  /** Straight-line reference (per-term startsWith scan, overlapping) —
    * the property-test twin the automaton must stay identical to. */
  def reference(text: String, terms: Seq[String]): Seq[Long] =
    terms.map { t =>
      if (t.isEmpty) 0L
      else {
        var c = 0L
        var i = 0
        while (i + t.length <= text.length) {
          if (text.startsWith(t, i)) c += 1
          i += 1
        }
        c
      }
    }
}

/** Aho–Corasick automaton over the term list, flattened to a full DFA;
  * built once per deserialized expression (executor-local). Two-level
  * layout keeps the per-char step branch-free and allocation-free (the
  * HashMap<Character>-per-char draft measured 15× SLOWER than the naive
  * per-term replace chain — boxing on every input character):
  *
  *  - `code`: a 64 K byte table mapping any char to a dense alphabet
  *    code (0 = "appears in no term" — one shared column of the DFA);
  *  - `delta`: the fail-resolved transition table
  *    (numStates × (alphabet+1) ints, built BFS so delta[fail] is ready);
  *  - `emit`: per state, the term indices ending there (own terminals ++
  *    emit[fail]) — empty for almost every state, so the scan's inner
  *    loop is one array-length check per char.
  */
final class AhoCorasick(terms: Array[String]) extends Serializable {

  require(terms.nonEmpty, "blocklist_counts needs at least one term")
  require(terms.forall(_.nonEmpty), "blocklist terms must be non-empty")
  require(terms.distinct.length == terms.length,
    s"duplicate blocklist terms: ${terms.mkString(",")}")
  // Alphabet contract checked EAGERLY (driver-side, at construction):
  // the dense char→code table is a Byte column, so the automaton supports
  // at most 127 distinct characters across all terms. Validating here —
  // not inside the @transient lazy DFA build — means a too-wide
  // multilingual term list fails at plan time, not per-task on executors.
  require(terms.iterator.flatMap(_.iterator).toSet.size <= 127,
    s"blocklist alphabet too large: ${terms.iterator.flatMap(_.iterator).toSet.size}" +
      " distinct chars (max 127)")

  @transient private lazy val dfa: AhoCorasick.Dfa = {
    // trie with dense codes: alphabet = distinct chars over all terms
    val code = new Array[Byte](Character.MAX_VALUE + 1)
    var alpha = 0
    terms.foreach(_.foreach { ch =>
      if (code(ch) == 0) { alpha += 1; code(ch) = alpha.toByte }
    })
    // alpha <= 127 guaranteed by the eager constructor require above
    val width = alpha + 1
    // trie build over (state, code) — goto as a growable array of rows
    val rows = scala.collection.mutable.ArrayBuffer(new Array[Int](width))
    val terminals = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    var i = 0
    while (i < terms.length) {
      var s = 0
      terms(i).foreach { ch =>
        val c = code(ch)
        if (rows(s)(c) == 0) {
          rows += new Array[Int](width)
          terminals += Nil
          rows(s)(c) = rows.length - 1
        }
        s = rows(s)(c)
      }
      terminals(s) = i :: terminals(s)
      i += 1
    }
    // BFS: resolve fails into a full DFA and precompute emit lists
    val n = rows.length
    val delta = Array.ofDim[Int](n, width)
    val fail = new Array[Int](n)
    val emit = new Array[Array[Int]](n)
    emit(0) = terminals(0).toArray
    val queue = new java.util.ArrayDeque[Integer]
    var c = 1
    while (c < width) {
      val child = rows(0)(c)
      delta(0)(c) = child // 0 when absent -> stay at root
      if (child != 0) {
        fail(child) = 0
        emit(child) = (terminals(child) ++ emit(0).toList).toArray
        queue.add(child)
      }
      c += 1
    }
    while (!queue.isEmpty) {
      val s = queue.poll().intValue()
      var c = 1
      while (c < width) {
        val child = rows(s)(c)
        if (child != 0) {
          fail(child) = delta(fail(s))(c)
          emit(child) = (terminals(child) ++ emit(fail(child)).toList).toArray
          delta(s)(c) = child
          queue.add(child)
        } else {
          delta(s)(c) = delta(fail(s))(c)
        }
        c += 1
      }
    }
    // flatten delta for locality; code-0 column is all zeros already
    val flat = new Array[Int](n * width)
    var s = 0
    while (s < n) {
      System.arraycopy(delta(s), 0, flat, s * width, width); s += 1
    }
    new AhoCorasick.Dfa(code, flat, width, emit)
  }

  /** Called from generated code — one virtual call per row. */
  def counts(text: UTF8String): ArrayData = {
    val d = dfa
    val s = text.toString
    val out = new Array[Long](terms.length)
    var state = 0
    var i = 0
    val len = s.length
    while (i < len) {
      state = d.flat(state * d.width + d.code(s.charAt(i)))
      val em = d.emit(state)
      if (em.length != 0) {
        var k = 0
        while (k < em.length) { out(em(k)) += 1L; k += 1 }
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

object AhoCorasick {
  final class Dfa(val code: Array[Byte], val flat: Array[Int],
      val width: Int, val emit: Array[Array[Int]])
}

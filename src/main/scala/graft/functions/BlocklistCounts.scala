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

/** Aho–Corasick automaton over the term list; built once per deserialized
  * expression (executor-local). Nodes are HashMap-goto (arbitrary
  * alphabet); fail links by BFS; each node's emit list carries every term
  * index ending there (its own terminals plus the fail-chain's). */
final class AhoCorasick(terms: Array[String]) extends Serializable {

  require(terms.nonEmpty, "blocklist_counts needs at least one term")
  require(terms.forall(_.nonEmpty), "blocklist terms must be non-empty")
  require(terms.distinct.length == terms.length,
    s"duplicate blocklist terms: ${terms.mkString(",")}")

  @transient private lazy val root: AhoCorasick.Node = {
    val r = new AhoCorasick.Node
    var i = 0
    while (i < terms.length) {
      var node = r
      val t = terms(i)
      var j = 0
      while (j < t.length) {
        var next = node.next.get(t.charAt(j))
        if (next == null) {
          next = new AhoCorasick.Node
          node.next.put(t.charAt(j), next)
        }
        node = next
        j += 1
      }
      node.terminals = i :: node.terminals
      i += 1
    }
    // BFS fail links; emit = own terminals ++ fail.emit (precomputed so
    // the scan never walks fail chains for output)
    val queue = new java.util.ArrayDeque[AhoCorasick.Node]
    r.fail = r
    r.emit = r.terminals.toArray
    r.next.forEach { (_, child) =>
      child.fail = r
      child.emit = (child.terminals ++ r.terminals).toArray
      queue.add(child)
    }
    while (!queue.isEmpty) {
      val node = queue.poll()
      node.next.forEach { (ch, child) =>
        var f = node.fail
        while (f != r && f.next.get(ch) == null) f = f.fail
        val fnext = if (f.next.get(ch) != null && f.next.get(ch) != child)
          f.next.get(ch) else r
        child.fail = fnext
        child.emit = (child.terminals ++ fnext.emit.toList).toArray
        queue.add(child)
      }
    }
    r
  }

  /** Called from generated code — one virtual call per row. */
  def counts(text: UTF8String): ArrayData = {
    val s = text.toString
    val out = new Array[Long](terms.length)
    var node = root
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      var n = node.next.get(ch)
      while (n == null && node != root) { node = node.fail; n = node.next.get(ch) }
      node = if (n == null) root else n
      val em = node.emit
      var k = 0
      while (k < em.length) { out(em(k)) += 1L; k += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }
}

object AhoCorasick {
  final class Node {
    val next = new java.util.HashMap[Character, Node](4)
    var terminals: List[Int] = Nil
    var fail: Node = _
    var emit: Array[Int] = Array.emptyIntArray
  }
}

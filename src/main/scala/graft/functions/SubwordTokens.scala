package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword segmentation (WordPiece-style MaxMatch)
  * of a word array against a fixed vocabulary — the token-accounting
  * primitive a training-data pipeline needs once "tokens" means model
  * subwords rather than whitespace words.
  *
  * Semantics (shared verbatim with the DuckDB oracle and the property-test
  * reference [[SubwordTokens.reference]]): per word, starting at each
  * position take the LONGEST vocab piece that matches; if none matches,
  * consume exactly one character as a fallback piece (counted in `n_unk`).
  * Pieces concatenate across the document's words in order. No
  * continuation markers — pieces match the same way at every position, so
  * the segmentation is a pure function of (word, vocab).
  *
  * Why a kernel: the per-position longest-match loop is data-dependent
  * iteration that has no `functions._` form (a join against the vocab per
  * position would shuffle corpus-token-sized data per round). The vocab
  * ships embedded in the expression — plan-serialized once per stage like
  * the PQ codebooks — and compiles to a trie per executor
  * (@transient lazy), so each row is one tight trie walk: scan-speed at
  * 100 TB, zero shuffle, and the piece stream stays inside whole-stage
  * codegen via one reference-object call per row.
  */
case class SubwordTokens(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"subword_tokens requires array<string>, got ${other.sql}")
  }

  override def dataType: DataType = SubwordTokens.schema
  override def prettyName: String = "subword_tokens"

  @transient private lazy val trie: SubwordTrie = new SubwordTrie(vocab.toArray)

  override protected def nullSafeEval(input: Any): Any =
    trie.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val t = ctx.addReferenceObj("subwordTrie", trie,
        classOf[SubwordTrie].getName)
      s"${ev.value} = $t.compute($input);"
    })

  override protected def withNewChildInternal(newChild: Expression): SubwordTokens =
    copy(child = newChild)
}

object SubwordTokens {

  val schema: StructType = StructType(Seq(
    StructField("pieces", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("n_unk", LongType, nullable = false)))

  /** Straight-line reference implementation (string ops only, no trie) —
    * the property-test twin the kernel must stay identical to. */
  def reference(words: Seq[String], vocab: Seq[String]): (Seq[String], Long) = {
    val vs = vocab.toSet
    val maxLen = if (vs.isEmpty) 0 else vs.iterator.map(_.length).max
    val out = Seq.newBuilder[String]
    var unk = 0L
    for (w <- words if w.nonEmpty) {
      var pos = 0
      while (pos < w.length) {
        var len = math.min(maxLen, w.length - pos)
        while (len > 0 && !vs.contains(w.substring(pos, pos + len))) len -= 1
        if (len > 0) { out += w.substring(pos, pos + len); pos += len }
        else { out += w.substring(pos, pos + 1); unk += 1; pos += 1 }
      }
    }
    (out.result(), unk)
  }
}

/** Char-trie over the vocabulary; one instance per deserialized expression
  * (executor-local), walked once per (row, word, piece). */
final class SubwordTrie(vocab: Array[String]) extends Serializable {

  @transient private lazy val root: SubwordTrie.Node = {
    val r = new SubwordTrie.Node
    var i = 0
    while (i < vocab.length) {
      val p = vocab(i)
      if (p.nonEmpty) {
        var node = r
        var j = 0
        while (j < p.length) {
          var next = node.next.get(p.charAt(j))
          if (next == null) {
            next = new SubwordTrie.Node
            node.next.put(p.charAt(j), next)
          }
          node = next
          j += 1
        }
        node.terminal = true
      }
      i += 1
    }
    r
  }

  /** Called from generated code — one virtual call per row. */
  def compute(words: ArrayData): InternalRow = {
    val n = words.numElements()
    val pieces = new java.util.ArrayList[UTF8String](n * 2)
    var unk = 0L
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i).toString
      var pos = 0
      while (pos < w.length) {
        // longest vocab match from pos: walk the trie, remember the last
        // terminal depth passed
        var node = root
        var j = pos
        var lastEnd = -1
        var walking = true
        while (walking && j < w.length) {
          node = node.next.get(w.charAt(j))
          if (node == null) walking = false
          else {
            j += 1
            if (node.terminal) lastEnd = j
          }
        }
        if (lastEnd > pos) {
          pieces.add(UTF8String.fromString(w.substring(pos, lastEnd)))
          pos = lastEnd
        } else {
          pieces.add(UTF8String.fromString(w.substring(pos, pos + 1)))
          unk += 1
          pos += 1
        }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(pieces.toArray[AnyRef](new Array[AnyRef](pieces.size()))),
      unk))
  }
}

object SubwordTrie {
  final class Node {
    val next = new java.util.HashMap[Character, Node](4)
    var terminal = false
  }
}

package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{FloatCosine, FloatDotProduct, LzComplexity, MinHashBands, RepetitionStats, ShingleStrings, SimHash64}

/** Session extension point for the engine's native expressions — the
  * idiomatic way to ship custom Catalyst code: users add
  * `.withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.plans.GraftExtensions`) and the kernels
  * become first-class SQL functions, usable from pure SQL alongside the
  * DataFrame API.
  *
  * Registered functions:
  *  - `float_dot(a, b)` — codegen'd array<float> dot product
  *    (see [[graft.functions.FloatDotProduct]]);
  *  - `float_cosine(a, b)` — single-pass codegen'd cosine similarity
  *    (see [[graft.functions.FloatCosine]]);
  *  - `simhash64(tokens)` — zero-shuffle 64-bit SimHash signature
  *    (see [[graft.functions.SimHash64]]);
  *  - `minhash_bands(shingles, numPerm, bands)` — one-pass MinHash
  *    signature + LSH band hashes (see [[graft.functions.MinHashBands]];
  *    numPerm/bands must be integer literals — they shape the kernel);
  *  - `lz_complexity(text)` — LZ78 compressibility quality signal
  *    (see [[graft.functions.LzComplexity]]);
  *  - `repetition_stats(tokens)` — one-pass duplicated token/2-gram/
  *    3-gram fractions (see [[graft.functions.RepetitionStats]]);
  *  - `word_shingles(tokens, n, distinct)` — codegen'd n-gram shingles
  *    (see [[graft.functions.ShingleStrings]]; n/distinct literal).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, build: Seq[Expression] => Expression) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(getClass.getName, name),
    build)

  private def binary(name: String, build: (Expression, Expression) => Expression) =
    fn(name, { children =>
      require(children.size == 2, s"$name takes exactly 2 arguments")
      build(children.head, children(1))
    })

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(binary("float_dot", FloatDotProduct(_, _)))
    ext.injectFunction(binary("float_cosine", FloatCosine(_, _)))
    ext.injectFunction(fn("simhash64", { children =>
      require(children.size == 1, "simhash64 takes exactly 1 argument")
      SimHash64(children.head)
    }))
    ext.injectFunction(fn("minhash_bands", { children =>
      require(children.size == 3,
        "minhash_bands takes (shingles, numPerm, bands)")
      MinHashBands(children.head,
        GraftExtensions.requireIntLiteral(children(1)),
        GraftExtensions.requireIntLiteral(children(2)))
    }))
    ext.injectFunction(fn("lz_complexity", { children =>
      require(children.size == 1, "lz_complexity takes exactly 1 argument")
      LzComplexity(children.head)
    }))
    ext.injectFunction(fn("repetition_stats", { children =>
      require(children.size == 1, "repetition_stats takes exactly 1 argument")
      RepetitionStats(children.head)
    }))
    ext.injectFunction(fn("word_shingles", { children =>
      require(children.size == 3,
        "word_shingles takes (tokens, n, distinct)")
      ShingleStrings(children.head,
        GraftExtensions.requireIntLiteral(children(1)),
        GraftExtensions.requireBoolLiteral(children(2)))
    }))
    ext.injectPlannerStrategy(_ => TopKStrategy)
  }
}

object GraftExtensions {
  /** numPerm/bands SHAPE the generated kernel, so they must be integer
    * literals at resolution time — reject anything else up front. */
  private[graft] def requireIntLiteral(e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"expected an integer literal, got $other")
  }

  private[graft] def requireBoolLiteral(e: Expression): Boolean = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"expected a boolean literal, got $other")
  }
}

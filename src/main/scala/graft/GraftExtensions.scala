package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expressions.{BpeTokens, DeflateLen, DotProduct, HilbertDistance, NormalizeText, Tokens, TopKSketch, WordShingles}

/** Session-wide registration of graft's native Catalyst expressions —
  * the standard library entry point:
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * or programmatically
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  *
  * Every function is also self-registered lazily by the operators that
  * use it (see e.g. [[graft.functions.expressions.DotProduct.register]]),
  * so the extension is a convenience for SQL users, not a hard
  * dependency.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(
      classOf[GraftExtensions].getName,
      null,
      name,
      usage,
      "",
      "",
      "",
      "",
      "",
      "",
      "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        FunctionIdentifier("graft_dot"),
        info(
          "graft_dot",
          "graft_dot(a, b) - dot product of two array<double> columns"),
        (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction(
      (
        FunctionIdentifier("graft_tokens"),
        info(
          "graft_tokens",
          "graft_tokens(text) - whitespace tokens, empties dropped"),
        (exprs: Seq[Expression]) => Tokens(exprs(0))))
    ext.injectFunction(
      (
        FunctionIdentifier("graft_shingles"),
        info(
          "graft_shingles",
          "graft_shingles(text, k[, distinct]) - word k-shingles"),
        (exprs: Seq[Expression]) =>
          WordShingles(
            exprs(0),
            exprs(1).eval(null).asInstanceOf[Number].intValue(),
            if (exprs.size > 2) exprs(2).eval(null).asInstanceOf[Boolean]
            else true)))
    ext.injectFunction(
      (
        FunctionIdentifier("graft_bpe"),
        info(
          "graft_bpe",
          "graft_bpe(text) - greedy BPE tokens over the built-in merge table"),
        (exprs: Seq[Expression]) => BpeTokens(exprs(0))))
    ext.injectFunction(
      (
        FunctionIdentifier("graft_deflate_len"),
        info(
          "graft_deflate_len",
          "graft_deflate_len(text) - DEFLATE-compressed byte length"),
        (exprs: Seq[Expression]) => DeflateLen(exprs(0))))
    ext.injectFunction(
      (
        FunctionIdentifier("graft_normalize"),
        info(
          "graft_normalize",
          "graft_normalize(text) - NFC composition + control/whitespace-run collapse"),
        (exprs: Seq[Expression]) => NormalizeText(exprs(0))))
    ext.injectFunction(
      (
        FunctionIdentifier("graft_hilbert"),
        info(
          "graft_hilbert",
          "graft_hilbert(x, y, bits) - Hilbert-curve distance of a 2-D point"),
        (exprs: Seq[Expression]) =>
          HilbertDistance(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction(
      (
        FunctionIdentifier("graft_topk"),
        info(
          "graft_topk",
          "graft_topk(item, k) - Misra-Gries heavy-hitter summary (aggregate)"),
        (exprs: Seq[Expression]) =>
          TopKSketch(
            exprs(0),
            exprs(1).eval(null).asInstanceOf[Number].intValue())
            .toAggregateExpression()))
  }
}

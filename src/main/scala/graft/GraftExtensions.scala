package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.graft.{CharEntropy, DsirLlrE4, FloatDotProduct, MinhashSig, NormalizeNfc, ShinglePolyHash, SigGroups, Simhash60, SortChars, StringCodepoints, TokenStats, WinnowMins}

/** SparkSessionExtensions entry point: registers graft's custom Catalyst
  * expressions as SQL functions and the native as-of join planner strategy.
  * Activate with `spark.sql.extensions=graft.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graft.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => org.apache.spark.sql.graft.AsOfJoinPushDown)
    ext.injectOptimizerRule(_ => org.apache.spark.sql.graft.LevenshteinBoundRewrite)
    ext.injectFunction((
      new FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "float_dot"),
      (exprs: Seq[Expression]) => FloatDotProduct(exprs.head, exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NormalizeNfc].getName, "nfc_normalize"),
      (exprs: Seq[Expression]) => NormalizeNfc(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("sort_chars"),
      new ExpressionInfo(classOf[SortChars].getName, "sort_chars"),
      (exprs: Seq[Expression]) => SortChars(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("char_entropy"),
      new ExpressionInfo(classOf[CharEntropy].getName, "char_entropy"),
      (exprs: Seq[Expression]) => CharEntropy(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[Simhash60].getName, "simhash60"),
      (exprs: Seq[Expression]) => Simhash60(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("dsir_llr_e4"),
      new ExpressionInfo(classOf[DsirLlrE4].getName, "dsir_llr_e4"),
      (exprs: Seq[Expression]) => DsirLlrE4(exprs.head, exprs(1))))
    def longOf(e: Expression): Long = e.asInstanceOf[Literal].value match {
      case i: Int => i.toLong
      case l: Long => l
      case other => throw new IllegalArgumentException(s"expected int literal, got $other")
    }
    ext.injectFunction((
      new FunctionIdentifier("shingle_poly_hash"),
      new ExpressionInfo(classOf[ShinglePolyHash].getName, "shingle_poly_hash"),
      (exprs: Seq[Expression]) => ShinglePolyHash(exprs.head,
        longOf(exprs(1)).toInt, longOf(exprs(2)), longOf(exprs(3)))))
    // convenience forms bound to graft's published constants, so the full
    // LSH/winnowing/combiner machinery is reachable from plain SQL
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinhashSig].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => MinhashSig(exprs.head,
        graft.operators.Dedup.CoefA, graft.operators.Dedup.CoefB,
        graft.operators.Dedup.P)))
    ext.injectFunction((
      new FunctionIdentifier("winnow_mins"),
      new ExpressionInfo(classOf[WinnowMins].getName, "winnow_mins"),
      (exprs: Seq[Expression]) => WinnowMins(exprs.head, longOf(exprs(1)).toInt)))
    ext.injectFunction((
      new FunctionIdentifier("int8_quant_stats"),
      new ExpressionInfo(classOf[org.apache.spark.sql.graft.Int8QuantStats].getName,
        "int8_quant_stats"),
      (exprs: Seq[Expression]) => org.apache.spark.sql.graft.Int8QuantStats(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("codepoints"),
      new ExpressionInfo(classOf[StringCodepoints].getName, "codepoints"),
      (exprs: Seq[Expression]) => StringCodepoints(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("token_stats"),
      new ExpressionInfo(classOf[TokenStats].getName, "token_stats"),
      (exprs: Seq[Expression]) => TokenStats(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("sig_groups"),
      new ExpressionInfo(classOf[SigGroups].getName, "sig_groups"),
      (exprs: Seq[Expression]) => SigGroups(exprs.head,
        graft.functions.TextFns.Stopwords)))
    // the aggregate tier: the analyzer wraps a returned AggregateFunction
    // in an AggregateExpression automatically, so plain SQL can
    // `SELECT bottom_k(h, id, 8) ... GROUP BY g`
    ext.injectFunction((
      new FunctionIdentifier("bottom_k"),
      new ExpressionInfo(classOf[org.apache.spark.sql.graft.BottomKHashes].getName, "bottom_k"),
      (exprs: Seq[Expression]) => org.apache.spark.sql.graft.BottomKHashes(
        exprs.head, exprs(1), longOf(exprs(2)).toInt)))
    ext.injectFunction((
      new FunctionIdentifier("freq_sketch"),
      new ExpressionInfo(classOf[org.apache.spark.sql.graft.FreqSketch].getName, "freq_sketch"),
      (exprs: Seq[Expression]) => org.apache.spark.sql.graft.FreqSketch(
        exprs.head, longOf(exprs(1)).toInt)))
  }
}

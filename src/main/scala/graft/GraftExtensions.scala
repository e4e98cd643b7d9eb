package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.Exprs

/** SQL surface for the custom codegen kernels, injected through
  * `SparkSessionExtensions` — the supported extension point, so a pure
  * SQL user (spark-sql shell, Thrift server, `spark.sql(...)`) reaches
  * the same expressions the DataFrame facade uses, with identical
  * codegen. Enable with either
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * // or
  * --conf spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * All kernel parameters (shingle width, minhash k, winnow window) must
  * be integer literals — they size per-task buffers at plan time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, arity, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        GraftExtensions.checked(name, arity, builder)))
    }
}

object GraftExtensions {

  /** Register the same functions on an already-running session (the
    * extensions hook only applies at session construction). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, arity, builder) =>
      org.apache.spark.sql.graftshim.Shim.registerFunction(spark, name,
        checked(name, arity, builder))
    }

  /** Arity-validated builder — the one wrapper both registration paths
    * share. */
  private[graft] def checked(name: String, arity: Int,
      builder: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      require(args.length == arity,
        s"$name expects $arity arguments, got ${args.length}")
      builder(args)
    }

  private def intLit(e: Expression, fn: String, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be an INT literal, got $other")
  }

  private def longLit(e: Expression, fn: String, what: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be an integer literal, got $other")
  }

  /** (name, arity, builder). */
  private[graft] val functions: Seq[(String, Int, Seq[Expression] => Expression)] = Seq(
    ("graft_strip_accents", 1, args => Exprs.StripAccents(args(0))),
    ("graft_strip_accents_nfkd", 1, args => Exprs.StripAccentsNfkd(args(0))),
    ("graft_fix_mojibake", 1, args => Exprs.FixMojibake(args(0))),
    ("graft_simhash64", 1, args => Exprs.SimHash64(args(0))),
    ("graft_minhash", 2, args => Exprs.MinHashSig(args(0),
      intLit(args(1), "graft_minhash", "k"))),
    ("graft_word_ngrams", 2, args => Exprs.WordNgrams(args(0),
      intLit(args(1), "graft_word_ngrams", "n"))),
    ("graft_winnow", 3, args => Exprs.Winnow(args(0),
      intLit(args(1), "graft_winnow", "k"),
      intLit(args(2), "graft_winnow", "w"))),
    ("graft_poly_hash", 1, args => Exprs.PolyHash(args(0))),
    ("graft_qlog2", 1, args => Exprs.Qlog2(args(0))),
    ("graft_mulmod61", 2, args => Exprs.MulMod61(args(0),
      longLit(args(1), "graft_mulmod61", "g"))),
    ("graft_cosine", 2, args => Exprs.CosineSim(args(0), args(1))),
    ("graft_dot", 2, args => Exprs.DotF(args(0), args(1))),
    ("graft_repetition_stats", 2, args => Exprs.RepetitionStats(args(0),
      intLit(args(1), "graft_repetition_stats", "n"))),
    ("graft_char_stats", 1, args => Exprs.CharStats(args(0))),
    ("graft_script_stats", 1, args => Exprs.ScriptStats(args(0))))
}

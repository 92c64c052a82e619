package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions._
import graft.sources.MongoFilter

/** SQL-surface registration: the reference exposes everything through
  * SQL, so the custom Catalyst kernels register as SQL functions too.
  *
  * Enable with
  * `spark.sql.extensions=graft.GraftExtensions`, then e.g.
  * {{{
  *   SELECT simhash64(text) FROM documents
  *   SELECT * FROM events WHERE mongo_filter('{"value":{"$gt":50}}')
  *   SELECT cosine_sim(a.embedding, b.embedding) FROM ...
  * }}}
  *
  * All functions are codegen'd Expressions (doGenCode) — they stay inside
  * WholeStageCodegen like built-ins.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // substring(s,1,n) = 'lit' → sargable prefix predicate, so it reaches
    // the docstore/parquet scans (reference: substr_filter_pushdown.test)
    ext.injectOptimizerRule(_ => graft.plans.SargableSubstring)

    def reg(name: String, usage: String)(builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((new FunctionIdentifier(name),
        new ExpressionInfo("graft", name, usage), builder))

    reg("minhash_sig", "minhash_sig(text[, numHashes, shingleK]) - MinHash signature") {
      case Seq(t)       => MinHashSigExpr(t, 64, 3)
      case Seq(t, n)    => MinHashSigExpr(t, intArg(n, "numHashes"), 3)
      case Seq(t, n, k) => MinHashSigExpr(t, intArg(n, "numHashes"), intArg(k, "shingleK"))
      case args => throw new IllegalArgumentException(s"minhash_sig: bad arity ${args.size}")
    }
    reg("simhash64", "simhash64(text) - 64-bit SimHash") {
      case Seq(t) => SimHash64Expr(t)
      case args   => throw new IllegalArgumentException(s"simhash64: bad arity ${args.size}")
    }
    reg("rolling_fingerprint", "rolling_fingerprint(text) - Rabin-Karp document fingerprint") {
      case Seq(t) => RollingFingerprintExpr(t)
      case args   => throw new IllegalArgumentException(s"rolling_fingerprint: bad arity ${args.size}")
    }
    reg("shingle_hashes", "shingle_hashes(text[, k]) - k-word shingle hash array") {
      case Seq(t)    => ShingleHashesExpr(t, 3)
      case Seq(t, k) => ShingleHashesExpr(t, intArg(k, "shingleK"))
      case args => throw new IllegalArgumentException(s"shingle_hashes: bad arity ${args.size}")
    }
    reg("band_hash", "band_hash(sig, from, until) - LSH band hash of a signature slice") {
      case Seq(s, f, u) => BandHashExpr(s, intArg(f, "from"), intArg(u, "until"))
      case args => throw new IllegalArgumentException(s"band_hash: bad arity ${args.size}")
    }
    reg("strip_accents", "strip_accents(text) - drop combining accent marks (NFD)") {
      case Seq(t) => StripAccentsExpr(t)
      case args   => throw new IllegalArgumentException(s"strip_accents: bad arity ${args.size}")
    }
    reg("nibble_quant", "nibble_quant(text) - quantized 16-bin byte-histogram fingerprint") {
      case Seq(t) => NibbleQuantExpr(t)
      case args   => throw new IllegalArgumentException(s"nibble_quant: bad arity ${args.size}")
    }
    reg("dct_sign_hash", "dct_sign_hash(text) - DCT-sign perceptual hash (63 non-DC sign bits of an 8x8 integer DCT-II)") {
      case Seq(t) => DctSignHashExpr(t)
      case args   => throw new IllegalArgumentException(s"dct_sign_hash: bad arity ${args.size}")
    }
    reg("cosine_sim", "cosine_sim(vec, vec) - cosine similarity of float vectors") {
      case Seq(a, b) => CosineSimExpr(a, b)
      case args => throw new IllegalArgumentException(s"cosine_sim: bad arity ${args.size}")
    }
    reg("hyperplane_bucket", "hyperplane_bucket(vec, nPlanes) - sign-LSH bucket id") {
      case Seq(v, p) => HyperplaneBucketExpr(v, intArg(p, "nPlanes"))
      case args => throw new IllegalArgumentException(s"hyperplane_bucket: bad arity ${args.size}")
    }
    // mongo_filter('<json>') — compiled at analysis time into an ordinary
    // boolean expression tree over the table's columns, so it rides every
    // Catalyst optimization (incl. parquet pushdown)
    reg("mongo_filter", "mongo_filter(json) - Mongo filter document as a predicate") {
      case Seq(Literal(s: UTF8String, _)) =>
        MongoFilter.compileExpr(s.toString)
      case args => throw new IllegalArgumentException(
        s"mongo_filter takes one string literal, got $args")
    }
  }
}

package graft

import graft.functions.{CodecColumns, Geo, TextAnalysis}
import org.apache.spark.sql.{Column, GraftExpr, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface of the engine: every graft scalar — the codegen'd
  * kernels (minhash, simhash) and the builtin-composed column functions
  * (token hashing, n-gram shingles, H3 bit math, haversine, codecs) —
  * registered into the session catalog so `spark.sql("SELECT
  * graft_minhash(...)")` works exactly like the Column API.
  *
  * Two wiring paths, same function table:
  *   - `spark.sql.extensions=graft.GraftExtensions` (or
  *     `builder.withExtensions(new GraftExtensions)`) at session build —
  *     the idiomatic deployment path, injected before the session exists;
  *   - [[GraftFunctions.register]] on a live session — the notebook /
  *     test path.
  *
  * Builders return the SAME expression trees the Column API produces
  * (via the [[org.apache.spark.sql.GraftExpr]] bridge), so SQL and
  * DataFrame usage share codegen, optimizer treatment, and semantics —
  * there is no second implementation to drift.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}

object GraftFunctions {

  type FnDesc =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def wrap(e: Expression): Column = GraftExpr.column(e)
  private def unwrap(c: Column): Expression = GraftExpr.toCatalyst(c)

  /** A literal/foldable int argument (band counts, resolutions): these
    * parameterize plan-time constants (e.g. the minhash family size), so
    * a non-foldable expression is a usage error, reported as such.
    */
  private def intArg(name: String, args: Seq[Expression], pos: Int): Int =
    args(pos) match {
      case e if e.foldable => e.eval() match {
        case i: Int => i
        case l: Long => l.toInt
        case s: Short => s.toInt
        case b: Byte => b.toInt
        case other => throw new IllegalArgumentException(
          s"$name: argument ${pos + 1} must be an integer literal, got $other")
      }
      case _ => throw new IllegalArgumentException(
        s"$name: argument ${pos + 1} must be a literal (plan-time constant)")
    }

  private def arity(name: String, args: Seq[Expression], n: Int): Unit =
    if (args.size != n) throw new IllegalArgumentException(
      s"$name expects $n argument(s), got ${args.size}")

  private def fn(name: String, argDoc: String, usage: String)(
      builder: Seq[Expression] => Expression): FnDesc =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.GraftFunctions", null, name,
        s"$name($argDoc) - $usage", ""),
      builder)

  /** One function per column-level scalar; arity-checked, kernel-backed
    * where the Column API is kernel-backed.
    */
  val all: Seq[FnDesc] = Seq(

    fn("graft_tokens", "text", "whitespace tokens, empties dropped") { args =>
      arity("graft_tokens", args, 1)
      unwrap(TextAnalysis.tokens(wrap(args.head)))
    },

    fn("graft_token_hash", "str",
      "portable 32-bit md5-derived hash as BIGINT") { args =>
      arity("graft_token_hash", args, 1)
      unwrap(TextAnalysis.tokenHash(wrap(args.head)))
    },

    fn("graft_shingles3", "tokens", "distinct word 3-gram shingles") { args =>
      arity("graft_shingles3", args, 1)
      unwrap(TextAnalysis.shingles3(wrap(args.head)))
    },

    fn("graft_shingle_hashes", "tokens",
      "distinct int64 hashes of word 3-gram shingles") { args =>
      arity("graft_shingle_hashes", args, 1)
      unwrap(TextAnalysis.shingleHashes(wrap(args.head)))
    },

    fn("graft_ngram_hashes", "tokens, n",
      "distinct int64 hashes of word n-gram shingles") { args =>
      arity("graft_ngram_hashes", args, 2)
      unwrap(TextAnalysis.ngramHashes(wrap(args.head),
        intArg("graft_ngram_hashes", args, 1)))
    },

    fn("graft_minhash", "shingle_hashes, k",
      "k-wide affine MinHash signature (codegen'd kernel)") { args =>
      arity("graft_minhash", args, 2)
      unwrap(TextAnalysis.minhashAffine(wrap(args.head),
        intArg("graft_minhash", args, 1)))
    },

    fn("graft_minhash2", "shingle_hashes, k",
      "k-wide runner-up MinHash signature (multi-probe perturbation " +
        "values; codegen'd kernel)") { args =>
      arity("graft_minhash2", args, 2)
      unwrap(TextAnalysis.minhash2Affine(wrap(args.head),
        intArg("graft_minhash2", args, 1)))
    },

    fn("graft_simhash60", "tokens",
      "60-bit SimHash (the wide dedup geometry)") { args =>
      arity("graft_simhash60", args, 1)
      unwrap(TextAnalysis.simhash60(wrap(args.head)))
    },
    fn("graft_simhash", "tokens",
      "32-bit SimHash over the token multiset (codegen'd kernel)") { args =>
      arity("graft_simhash", args, 1)
      unwrap(TextAnalysis.simhash32(wrap(args.head)))
    },

    fn("graft_char_entropy_terms", "text",
      "struct(n, k, sterm): code points, distinct code points, and " +
        "the floored milli-nat entropy term sum (codegen'd kernel)") {
      args =>
        arity("graft_char_entropy_terms", args, 1)
        graft.expressions.CharEntropyTerms(args.head)
    },

    fn("graft_hamming", "a, b", "Hamming distance between bit patterns") {
      args =>
        arity("graft_hamming", args, 2)
        unwrap(TextAnalysis.hamming(wrap(args(0)), wrap(args(1))))
    },

    fn("graft_fingerprint", "tokens",
      "order-sensitive rolling polynomial document fingerprint") { args =>
      arity("graft_fingerprint", args, 1)
      unwrap(TextAnalysis.fingerprint(wrap(args.head)))
    },

    fn("graft_pii_redact", "text",
      "scrub emails/URLs/IPv4s/phones, each replaced by a typed tag") {
      args =>
        arity("graft_pii_redact", args, 1)
        unwrap(TextAnalysis.redactPii(wrap(args.head)))
    },

    fn("graft_base64url", "str", "base64url without padding") { args =>
      arity("graft_base64url", args, 1)
      unwrap(CodecColumns.base64Url(wrap(args.head)))
    },

    fn("graft_h3_parent", "h3_long, res",
      "H3 parent cell at the given resolution (bit math)") { args =>
      arity("graft_h3_parent", args, 2)
      unwrap(CodecColumns.h3ParentLong(wrap(args.head),
        intArg("graft_h3_parent", args, 1)))
    },

    fn("graft_h3_from_hex", "str", "H3 hex string to BIGINT") { args =>
      arity("graft_h3_from_hex", args, 1)
      unwrap(CodecColumns.h3FromHex(wrap(args.head)))
    },

    fn("graft_subnet_base", "subnet",
      "base of a packed <<base:25,mask:23>> subnet") { args =>
      arity("graft_subnet_base", args, 1)
      unwrap(CodecColumns.subnetBase(wrap(args.head)))
    },

    fn("graft_subnet_mask", "subnet", "mask of a packed subnet") { args =>
      arity("graft_subnet_mask", args, 1)
      unwrap(CodecColumns.subnetMask(wrap(args.head)))
    },

    fn("graft_haversine_km", "lat1, lon1, lat2, lon2",
      "great-circle distance in km") { args =>
      arity("graft_haversine_km", args, 4)
      unwrap(Geo.haversineKm(wrap(args(0)), wrap(args(1)),
        wrap(args(2)), wrap(args(3))))
    },

    fn("graft_geo_point", "lat, lon", "typed (lat, lon) struct") { args =>
      arity("graft_geo_point", args, 2)
      unwrap(Geo.geoPoint(wrap(args(0)), wrap(args(1))))
    },

    fn("graft_gram_hashes", "tokens, n",
      "positional int64 hashes of word n-grams (duplicates kept)") { args =>
      arity("graft_gram_hashes", args, 2)
      unwrap(TextAnalysis.gramHashesPositional(wrap(args.head),
        intArg("graft_gram_hashes", args, 1)))
    },

    fn("graft_winnow", "gram_hashes, w",
      "winnowing fingerprint selection (window-min, SIGMOD 2003)") { args =>
      arity("graft_winnow", args, 2)
      unwrap(TextAnalysis.winnowFingerprints(wrap(args.head),
        intArg("graft_winnow", args, 1)))
    },

    fn("graft_sq8_approx", "vec, mins, maxs",
      "SQ8 encode+midpoint-dequantize round trip (codegen'd kernel)") {
      args =>
        arity("graft_sq8_approx", args, 3)
        graft.expressions.Sq8ApproxDbl(args(0), args(1), args(2))
    },

    fn("graft_hash60", "str",
      "portable 60-bit md5-derived hash (HLL input) as BIGINT") { args =>
      arity("graft_hash60", args, 1)
      unwrap(graft.ops.Sketches.hash60(wrap(args.head)))
    },

    fn("graft_hll_bucket", "hash60", "HLL register bucket (low 8 bits)") {
      args =>
        arity("graft_hll_bucket", args, 1)
        unwrap(graft.ops.Sketches.hllBucket(wrap(args.head)))
    },

    fn("graft_hll_rho", "hash60",
      "HLL rho: leftmost-1 run position of the 52-bit window") { args =>
      arity("graft_hll_rho", args, 1)
      unwrap(graft.ops.Sketches.hllRho(wrap(args.head)))
    }
  )

  /** Register into a live session (notebooks, shared test sessions). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        ident, info, builder)
    }
}

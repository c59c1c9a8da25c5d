package graft.extensions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.catalyst.expressions.Literal

import graft.functions.{BpeDecodeBytes, BpeEncode, BpeEncodeBytes, CosineSimilarity, DamerauLevenshtein, DecodedPhash, DotProduct, HammingDistance, HyperplaneLshCode, JaccardSimilarity, JaroWinklerSim, MinHashSignature, PayloadPhash, SimHashBits, StubReencodeExpr, WinnowFingerprints}

/** SparkSessionExtensions entry point: registers graft's native SQL
  * functions so `spark.sql("SELECT cosine_sim(a, b) ...")` works too.
  * Enable with `.config("spark.sql.extensions", "graft.extensions.GraftExtensions")`
  * (or `.withExtensions(new GraftExtensions)`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def reg(name: String, clazz: Class[_], build: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        build))

    reg("cosine_sim", classOf[CosineSimilarity], args => CosineSimilarity(args(0), args(1)))
    reg("dot_product", classOf[DotProduct], args => DotProduct(args(0), args(1)))
    reg("simhash32", classOf[SimHashBits], args => SimHashBits(args(0), 32))
    reg("simhash64", classOf[SimHashBits], args => SimHashBits(args(0), 64))
    reg("minhash_sig", classOf[MinHashSignature],
      args => MinHashSignature(args(0), intArg(args(1), "minhash_sig")))
    reg("hamming", classOf[HammingDistance], args => HammingDistance(args(0), args(1)))
    reg("jaccard", classOf[JaccardSimilarity], args => JaccardSimilarity(args(0), args(1)))
    reg("lsh_code", classOf[HyperplaneLshCode], args => HyperplaneLshCode(args(0)))
    reg("phash64", classOf[PayloadPhash],
      args => PayloadPhash(args(0), intArg(args(1), "phash64")))
    reg("decoded_phash64", classOf[DecodedPhash],
      args => DecodedPhash(args(0), intArg(args(1), "decoded_phash64")))
    reg("stub_reencode", classOf[StubReencodeExpr], args => StubReencodeExpr(args(0)))
    reg("damerau", classOf[DamerauLevenshtein],
      args => DamerauLevenshtein(args(0), args(1)))
    reg("jaro_winkler", classOf[JaroWinklerSim],
      args => JaroWinklerSim(args(0), args(1)))
    reg("winnow_fps", classOf[WinnowFingerprints],
      args => WinnowFingerprints(args(0), intArg(args(1), "winnow_fps"),
        intArg(args(2), "winnow_fps")))
    reg("bpe_encode", classOf[BpeEncode], args =>
      if (args.length > 1) BpeEncode(args(0), intArg(args(1), "bpe_encode"))
      else BpeEncode(args(0)))
    reg("bpe_encode_bytes", classOf[BpeEncodeBytes], args =>
      if (args.length > 1)
        BpeEncodeBytes(args(0), intArg(args(1), "bpe_encode_bytes"))
      else BpeEncodeBytes(args(0)))
    reg("bpe_decode_bytes", classOf[BpeDecodeBytes],
      args => BpeDecodeBytes(args(0)))
  }
}

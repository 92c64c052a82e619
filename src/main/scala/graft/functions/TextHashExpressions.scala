package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.{toColumn, toExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-hash kernels.
  *
  * Each generates a single static call into [[TextHashes]], so the
  * operator they feed (projection before the LSH shuffle) stays one
  * WholeStageCodegen span — the reference computes its hashes inside the
  * engine's vectorized executor for the same reason; a Scala UDF here
  * would add per-row encoder boxing on the 100 TB hot path.
  */
case class MinHashSigExpr(child: Expression, numHashes: Int, shingleK: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashes.minhashSig(input.asInstanceOf[UTF8String], numHashes, shingleK)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashes.minhashSig($c, $numHashes, $shingleK)")
  override protected def withNewChildInternal(c: Expression): MinHashSigExpr =
    copy(child = c)
  override def prettyName: String = "minhash_sig"
}

case class SimHash64Expr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextHashes.simhash64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64Expr =
    copy(child = c)
  override def prettyName: String = "simhash64"
}

case class RollingFingerprintExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextHashes.rollingFingerprint(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashes.rollingFingerprint($c)")
  override protected def withNewChildInternal(c: Expression): RollingFingerprintExpr =
    copy(child = c)
  override def prettyName: String = "rolling_fingerprint"
}

/** Quantized nibble-histogram fingerprint (16 ints) — the m05 stub
  * perceptual hash; see TextHashes.nibbleQuant. */
case class NibbleQuantExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      TextHashes.nibbleQuant(input.asInstanceOf[UTF8String]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.TextHashes.nibbleQuant($c))")
  override protected def withNewChildInternal(c: Expression): NibbleQuantExpr =
    copy(child = c)
  override def prettyName: String = "nibble_quant"
}

/** DCT-sign perceptual hash (63 sign bits of the non-DC 8×8 DCT-II
  * coefficients over the stub-decoded matrix); see TextHashes.dctSignHash. */
case class DctSignHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextHashes.dctSignHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashes.dctSignHash($c)")
  override protected def withNewChildInternal(c: Expression): DctSignHashExpr =
    copy(child = c)
  override def prettyName: String = "dct_sign_hash"
}

/** Word k-shingle hash set (64-bit) — input to exact Jaccard. */
case class ShingleHashesExpr(child: Expression, shingleK: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      TextHashes.shingleHashes(input.asInstanceOf[UTF8String], shingleK))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.TextHashes.shingleHashes($c, $shingleK))")
  override protected def withNewChildInternal(c: Expression): ShingleHashesExpr =
    copy(child = c)
  override def prettyName: String = "shingle_hashes"
}

/** Accent stripping (NFD + drop combining marks) — DuckDB
  * `strip_accents` parity; normalization preludes for dedup keys.
  */
case class StripAccentsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    TextHashes.stripAccents(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.stripAccents($c)")
  override protected def withNewChildInternal(c: Expression): StripAccentsExpr =
    copy(child = c)
  override def prettyName: String = "strip_accents"
}

/** LSH band key over a slice of a minhash signature. */
case class BandHashExpr(child: Expression, from: Int, until: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextHashes.bandHash(input.asInstanceOf[ArrayData], from, until)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashes.bandHash($c, $from, $until)")
  override protected def withNewChildInternal(c: Expression): BandHashExpr =
    copy(child = c)
  override def prettyName: String = "band_hash"
}

/** BPE token ids of a whole document (split on the kernel charset,
  * per-word merge loop, flattened in doc order) — see [[Bpe]]. A
  * static call like its siblings, so t21's scan→encode→aggregate
  * chain stays one WholeStageCodegen span. */
case class BpeTokenIdsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Bpe.tokenizeIds(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.tokenizeIds($c)")
  override protected def withNewChildInternal(c: Expression): BpeTokenIdsExpr =
    copy(child = c)
  override def prettyName: String = "bpe_token_ids"
}

/** BPE token ids → text (the decoder half, t24): a single static call
  * so decode stays inside the same WholeStageCodegen span as the
  * encode — the interpreted higher-order `transform` form fell out of
  * codegen and cost 3.4× at the corpus decade. */
case class BpeDecodeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    Bpe.decodeIds(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.decodeIds($c)")
  override protected def withNewChildInternal(c: Expression): BpeDecodeExpr =
    copy(child = c)
  override def prettyName: String = "bpe_decode"
}

/** Per-distinct-character counts (whitespace removed) — t25's entropy
  * histogram as ONE kernel pass; see TextHashes.charCountValues. */
case class CharCountValuesExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashes.charCountValues(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashes.charCountValues($c)")
  override protected def withNewChildInternal(c: Expression): CharCountValuesExpr =
    copy(child = c)
  override def prettyName: String = "char_count_values"
}

/** Per-document duplicated-n-gram stats (max gram count, duplicated-gram
  * count sum) over a token array — t18's gram histogram as one kernel
  * pass; see TextHashes.gramStats. */
case class GramStatsExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("maxc", LongType, nullable = false),
    StructField("dupsum", LongType, nullable = false)))
  override def nullSafeEval(input: Any): Any =
    TextHashes.gramStats(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.gramStats($c, $n)")
  override protected def withNewChildInternal(c: Expression): GramStatsExpr =
    copy(child = c)
  override def prettyName: String = "gram_stats"
}

/** Column-API façade (the library's user-facing function surface). */
object text {
  def minhash_sig(c: Column, numHashes: Int = 64, shingleK: Int = 3): Column =
    toColumn(MinHashSigExpr(expression(c), numHashes, shingleK))
  def simhash64(c: Column): Column = toColumn(SimHash64Expr(expression(c)))
  def rolling_fingerprint(c: Column): Column =
    toColumn(RollingFingerprintExpr(expression(c)))
  def band_hash(c: Column, from: Int, until: Int): Column =
    toColumn(BandHashExpr(expression(c), from, until))
  def shingle_hashes(c: Column, shingleK: Int = 3): Column =
    toColumn(ShingleHashesExpr(expression(c), shingleK))
  def strip_accents(c: Column): Column =
    toColumn(StripAccentsExpr(expression(c)))
  def nibble_quant(c: Column): Column =
    toColumn(NibbleQuantExpr(expression(c)))
  def dct_sign_hash(c: Column): Column =
    toColumn(DctSignHashExpr(expression(c)))
  def bpe_token_ids(c: Column): Column =
    toColumn(BpeTokenIdsExpr(expression(c)))
  def bpe_decode(c: Column): Column =
    toColumn(BpeDecodeExpr(expression(c)))
  def char_count_values(c: Column): Column =
    toColumn(CharCountValuesExpr(expression(c)))
  def gram_stats(c: Column, n: Int): Column =
    toColumn(GramStatsExpr(expression(c), n))

  private[graft] def expression(c: Column): Expression = toExpression(c)
}

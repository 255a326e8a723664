package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native SimHash fold — the signature stage of the fast near-dup path
  * (q76, `DedupQueries.simhashFastNative`) as ONE map-side expression
  * instead of explode + 64 vote aggregates.
  *
  * The aggregate formulation shuffles a (doc, token-hash) row per token
  * to vote — at corpus scale that is a corpus-sized exchange for what
  * is conceptually a per-document fold. This expression does the fold
  * where the document already is: 64 int counters over the hash array,
  * one pass, allocation-bounded, inside whole-stage codegen. The plan
  * becomes scan → project — ZERO exchanges for signatures (the later
  * band join still shuffles candidates, which is the part that must).
  *
  * Input is the ARRAY OF TOKEN HASHES (`transform(tokens, xxhash64)`),
  * not the tokens: Spark's own codegen'd xxhash64 keeps hashing
  * semantics bit-identical to the aggregate path, and this expression
  * stays a pure popcount-vote fold. Vote totals are commutative integer
  * sums, so array order vs shuffle order cannot change the fingerprint
  * — DedupSpec pins exact equality against the aggregate path.
  *
  * Semantics: null elements are skipped (they carry no token); a null
  * array yields NULL. An empty array yields fingerprint 0 (every vote
  * ties at 0, and ties round to bit 0 — same as the aggregate path's
  * `when(votes > 0)`).
  */
case class SimHashFold(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash_fold"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = hs.numElements()
    while (i < n) {
      if (!hs.isNullAt(i)) {
        val h = hs.getLong(i)
        var b = 0
        while (b < 64) {
          if (((h >>> (63 - b)) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << (63 - b))
      b += 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val votes = ctx.freshName("votes")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val b = ctx.freshName("b")
      val fp = ctx.freshName("fp")
      s"""
         |int[] $votes = new int[64];
         |int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$c.isNullAt($i)) {
         |    long $h = $c.getLong($i);
         |    for (int $b = 0; $b < 64; $b++) {
         |      if ((($h >>> (63 - $b)) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |    }
         |  }
         |}
         |long $fp = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) $fp |= (1L << (63 - $b));
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashExpression {
  /** Column API: 64-bit SimHash from an `array<bigint>` of token hashes. */
  def simhashFold(hashes: Column): Column =
    GraftColumnBridge.column(SimHashFold(GraftColumnBridge.expression(hashes)))
}

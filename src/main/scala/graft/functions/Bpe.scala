package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic byte-pair encoding (Sennrich et al. 2016, the public BPE
  * algorithm every modern tokenizer family uses): start from single
  * characters and repeatedly merge the adjacent pair with the best (lowest)
  * rank in the merge table, all occurrences left-to-right, until no ranked
  * pair remains.
  *
  * Token-budget lanes (packing, chunking, mixtures) count WHITESPACE tokens
  * unless told otherwise; real pipelines budget in tokenizer tokens — this
  * closes that gap with an oracle-replayable tokenizer: the merge loop is
  * pure data (a [[BpeTable]] of ordered merges, shipped to executors inside
  * the expression — broadcast-by-closure), so DuckDB replays it as a
  * recursive CTE over the same VALUES list (one leftmost-best merge per
  * iteration, equivalent to all-occurrences-at-once because a merge's
  * output token only appears as an operand of LATER merges — creation
  * order, which every real merge table satisfies by construction).
  *
  * Codegen'd via a static call like the ProtoWire codec; per-text cost is
  * O(len · merges applied) with a rank lookup per adjacent pair.
  */
object Bpe {

  /** Ordered merge table. Ranks are the sequence positions; the pair→rank
    * map is rebuilt per JVM (transient) from the serialized pairs. */
  final case class BpeTable(merges: Seq[(String, String)]) extends Serializable {
    require(merges.nonEmpty, "empty merge table")
    @transient lazy val rank: Map[(String, String), Int] =
      merges.zipWithIndex.toMap
    /** The merge table as DuckDB VALUES rows `('l','r',rank)` — the single
      * source of truth for the lane's recursive-CTE oracle. Single quotes
      * are SQL-escaped: real English BPE tables merge apostrophes ("'s" is
      * a canonical early merge), and an unescaped one would break — or
      * inject into — the oracle query (review r13 finding). */
    def sqlValues: String = {
      def q(s: String) = "'" + s.replace("'", "''") + "'"
      merges.zipWithIndex
        .map { case ((l, r), i) => s"(${q(l)},${q(r)},$i)" }.mkString(", ")
    }
  }

  /** The fixture table the BPE lanes use: frequent character pairs of the
    * synthetic documents vocabulary, creation-ordered (every operand is a
    * single char or an earlier merge's output). */
  val fixtureTable: BpeTable = BpeTable(Seq(
    "t" -> "h", "th" -> "e", "a" -> "t", "e" -> "r", "r" -> "o", "ro" -> "w",
    "s" -> "c", "sc" -> "a", "sca" -> "n", "v" -> "a", "va" -> "l",
    "val" -> "u", "valu" -> "e", "d" -> "a", "da" -> "t", "dat" -> "a",
    "the" -> " ", "value" -> " ", "e" -> " ", "t" -> " ", " " -> "s",
    "b" -> "a", "ba" -> "t", "bat" -> "c", "batc" -> "h"))

  def bpe_encode(text: Column, table: BpeTable): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(text), table))

  /** Greedy BPE: merge the best-ranked pair (all occurrences, left to
    * right), repeat until no pair is ranked. */
  def encode(text: String, table: BpeTable): Array[String] = {
    var toks: Array[String] = text.map(_.toString).toArray
    val rank = table.rank
    while (toks.length > 1) {
      var best = Int.MaxValue
      var i = 0
      while (i < toks.length - 1) {
        val r = rank.getOrElse((toks(i), toks(i + 1)), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) return toks
      val (l, r) = table.merges(best)
      val merged = l + r
      val out = new ArrayBuffer[String](toks.length)
      var j = 0
      while (j < toks.length) {
        if (j < toks.length - 1 && toks(j) == l && toks(j + 1) == r) {
          out += merged; j += 2
        } else { out += toks(j); j += 1 }
      }
      toks = out.toArray
    }
    toks
  }

  /** Executor entry for codegen. */
  def encodeUtf8(text: UTF8String, table: BpeTable): GenericArrayData =
    new GenericArrayData(
      encode(text.toString, table).map(s => UTF8String.fromString(s): Any))
}

/** STRING → ARRAY<STRING> of BPE tokens under the reference-object merge
  * table (travels with the plan — broadcast-by-closure). */
case class BpeEncode(child: Expression, table: Bpe.BpeTable)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    Bpe.encodeUtf8(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeTable", table,
      classOf[Bpe.BpeTable].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.Bpe.encodeUtf8($t, $tableRef);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

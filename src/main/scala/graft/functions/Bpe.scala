package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic CHARACTER-level pair encoding (the Sennrich et al. 2016
  * merge algorithm, applied over Unicode code points rather than UTF-8
  * bytes — "byte-level" in the GPT-2 sense would seed from raw bytes;
  * advice r13 naming fix): start from single code points and repeatedly
  * merge the adjacent pair with the best (lowest) rank in the merge table,
  * all occurrences left-to-right, until no ranked pair remains. Seeding is
  * by CODE POINT (not UTF-16 code unit), so non-BMP characters (emoji,
  * rare CJK) stay whole and agree with the DuckDB oracle's per-character
  * `string_split(text, '')` (advice r13 surrogate fix).
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
    /** Code points appearing in ANY merge operand. A code point OUTSIDE
      * this set can never be part of a merged token (a token containing it
      * never equals any operand), so the token stream FACTORIZES at every
      * such char: BPE(text) = concat of BPE(segment) over maximal
      * operand-char runs, breakers passing through as singletons. This is
      * what lifts the oracle's recursive-CTE depth from document length to
      * longest-run length (VERDICT r13 #4) and what a 100 TB pipeline uses
      * to bound per-task state on multi-MB documents. */
    @transient lazy val operandCodePoints: Set[Int] =
      merges.flatMap { case (l, r) =>
        (l + r).codePoints().toArray.toSeq
      }.toSet
    /** ASCII slice of [[operandCodePoints]] as a flat boolean table — the
      * segmentation loop's per-char membership test without Int boxing
      * (r17; the Set[Int] path stays for cp >= 128). */
    @transient lazy val operandAsciiMask: Array[Boolean] = {
      val m = new Array[Boolean](128)
      operandCodePoints.foreach(cp => if (cp < 128) m(cp) = true)
      m
    }
    /** The operand set as a regex character-class BODY (metachars escaped)
      * — shared source of truth for the DuckDB oracle's segment split. */
    def operandClassBody: String =
      operandCodePoints.toSeq.sorted.map { cp =>
        val s = new String(Character.toChars(cp))
        if ("\\^]-[".contains(s)) "\\" + s else s
      }.mkString
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

    /** True when every merge operand is pure ASCII — the precondition for
      * the BYTE-seeded mode: a single-byte operand char hexes to a single
      * byte token, so [[hexed]] preserves creation order (a multi-byte
      * operand char would hex to a token no byte-level merge ever builds,
      * silently dead merges — rejected loudly instead). */
    @transient lazy val allAsciiOperands: Boolean =
      merges.forall { case (l, r) => (l + r).forall(_ < 128) }

    /** The same merges re-expressed over UTF-8 BYTE tokens (2 lowercase hex
      * chars per byte) — the byte-seeded twin table. Only valid when
      * [[allAsciiOperands]] (checked at column construction). */
    @transient lazy val hexed: BpeTable =
      BpeTable(merges.map { case (l, r) => (Bpe.toHex(l), Bpe.toHex(r)) })

    /** [[sqlValues]] for the byte-seeded oracle: the hexed merge pairs. */
    def sqlValuesHex: String = hexed.sqlValues

    /** Interned execution tables (r17 optimization): token strings mapped
      * to dense int ids once per JVM, so the merge loop's inner rank
      * lookup is an open-addressed long-probe instead of a tuple-boxed
      * `Map[(String, String), Int]` hash (two string hashes + a Tuple2
      * allocation per adjacent pair per round — the measured hot path of
      * every full-document encode lane). Output is bit-identical: the
      * interning is a bijection on the token vocabulary and unknown seeds
      * get fresh negative ids that can never match a merge pair, exactly
      * like a pair absent from the rank map. */
    @transient lazy val intern: Bpe.Intern = new Bpe.Intern(merges)
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

  /** The realistic-scale merge table (VERDICT r14 #2): 1,000 merges from
    * the checked-in resource — an 89-merge prefix TRAINED to exhaustion on
    * the sf0.01 corpus (every word merges to a single token, so applied
    * depth per word is maximal) plus a creation-ordered synthetic tail on
    * the A–Z0–9 alphabet, which never matches ADJACENT pairs in the RAW
    * corpus text either — verified by scan: zero `[A-Z0-9][A-Z0-9]`
    * occurrences at sf0.001/0.01/0.1 (advice r15). The tail is the
    * table-size experiment: per-char encode cost must stay flat because
    * the pair→rank lookup is a hash map, not a table scan. Generated by
    * [[graft.TrainBpeTable]]; per-char timing vs the 25-merge fixture is
    * recorded in PLANS.md r15. */
  lazy val table1k: BpeTable = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges_1k.tsv")
    require(in != null, "missing resource graft/bpe_merges_1k.tsv")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try BpeTable(src.getLines().map { line =>
      val i = line.indexOf('\t')
      (line.substring(0, i), line.substring(i + 1))
    }.toVector)
    finally src.close()
  }

  def bpe_encode(text: Column, table: BpeTable): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(text), table))

  /** Full-document variant: segment-factorized merge loop (same tokens,
    * bounded per-run cost — see [[encodeSegmented]]). */
  def bpe_encode_full(text: Column, table: BpeTable): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(text), table,
      segmented = true))

  /** BYTE-seeded full-document variant (see [[encodeBytesSegmented]]):
    * tokens are lowercase-hex byte strings. Rejects tables with non-ASCII
    * operands at plan build — their hexed twin would carry dead merges. */
  def bpe_encode_bytes(text: Column, table: BpeTable): Column = {
    require(table.allAsciiOperands,
      "byte-seeded BPE requires an all-ASCII merge table: a multi-byte " +
        "operand char hexes to a token no byte-level merge ever builds")
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(text), table,
      segmented = true, byteSeeded = true))
  }

  /** Open-addressed (long → int) hash map with linear probing and no
    * boxing — the interned merge loop's pair→rank lookup (r17). Keys are
    * `(leftId << 32) | rightId` pair codes over non-negative ids, so -1
    * can serve as the empty sentinel. Built once per JVM per table,
    * read-only afterwards; sized to ≤ 50 % load. */
  private[functions] final class LongIntMap(n: Int) {
    private val cap = Integer.highestOneBit(math.max(8, n * 2) * 2 - 1) << 1
    private val mask = cap - 1
    private val keys = Array.fill[Long](cap)(-1L)
    private val vals = new Array[Int](cap)
    private def slot(k: Long): Int = {
      val h = k * -7046029254386353131L // Stafford mix step: spread both halves
      ((h ^ (h >>> 32)).toInt) & mask
    }
    def put(k: Long, v: Int): Unit = {
      var i = slot(k)
      while (keys(i) != -1L && keys(i) != k) i = (i + 1) & mask
      keys(i) = k; vals(i) = v
    }
    def get(k: Long, dflt: Int): Int = {
      var i = slot(k)
      while (true) {
        val kk = keys(i)
        if (kk == k) return vals(i)
        if (kk == -1L) return dflt
        i = (i + 1) & mask
      }
      dflt // unreachable: load factor < 1 guarantees an empty slot
    }
  }

  /** Lowercase hex image of every byte value — the byte-seeded mode's seed
    * strings, precomputed once (the previous per-byte `f"%02x"` format call
    * was a measurable constant in the byte lanes). */
  private[functions] val byteHexStr: Array[String] =
    Array.tabulate(256)(b => f"$b%02x")

  /** Interned execution tables for one merge table (see
    * [[BpeTable.intern]]): dense int ids over the token vocabulary (every
    * merge operand and output), the pair→rank map re-keyed on id pairs,
    * and cached output strings/UTF8Strings per id. Unknown seed tokens
    * (chars outside the vocabulary) get fresh NEGATIVE ids at encode time;
    * a negative id never probes the rank map, which is exactly the
    * behaviour of a pair absent from the string-keyed map, so the interned
    * loop is output-identical to the reference loop (BpeSpec pins the
    * differential). */
  private[functions] final class Intern(merges: Seq[(String, String)]) {
    private val vocab = new java.util.HashMap[String, Integer]()
    private val toks = new ArrayBuffer[String]()
    private def idFor(s: String): Int = {
      val got = vocab.get(s)
      if (got != null) got.intValue
      else { val id = toks.size; vocab.put(s, id); toks += s; id }
    }
    val pairL = new Array[Int](merges.size)
    val pairR = new Array[Int](merges.size)
    val mergedId = new Array[Int](merges.size)
    val pairRank = new LongIntMap(merges.size)
    locally {
      var k = 0
      merges.foreach { case (l, r) =>
        pairL(k) = idFor(l); pairR(k) = idFor(r); mergedId(k) = idFor(l + r)
        k += 1
      }
      // insertion in rank order: a duplicate pair's later rank overwrites,
      // matching `merges.zipWithIndex.toMap`
      k = 0
      while (k < merges.size) {
        pairRank.put(Bpe.pairKey(pairL(k), pairR(k)), k); k += 1
      }
    }
    val tokStrings: Array[String] = toks.toArray
    val tokUtf8: Array[UTF8String] = tokStrings.map(UTF8String.fromString)
    /** Single ASCII char → vocab id (or -1): the seed fast path. */
    val asciiSeedId: Array[Int] = Array.tabulate(128) { c =>
      val g = vocab.get(String.valueOf(c.toChar))
      if (g == null) -1 else g.intValue
    }
    /** Byte value → vocab id of its hex-pair token (or -1) — only
      * meaningful on a hexed table's intern. */
    val byteSeedId: Array[Int] = Array.tabulate(256) { b =>
      val g = vocab.get(Bpe.byteHexStr(b))
      if (g == null) -1 else g.intValue
    }
    def idOf(s: String): Int = {
      val g = vocab.get(s)
      if (g == null) -1 else g.intValue
    }
  }

  @inline private def pairKey(l: Int, r: Int): Long =
    (l.toLong << 32) | (r.toLong & 0xffffffffL)

  /** The interned merge loop: merges in place over `ids[from, to)` and
    * returns the new end index. Entries < 0 are unknown seeds (see
    * [[Intern]]) and never participate in a merge. */
  private def mergeIds(ids: Array[Int], from: Int, to: Int, it: Intern): Int = {
    var len = to - from
    val pr = it.pairRank
    while (len > 1) {
      var best = Int.MaxValue
      var i = from
      val last = from + len - 1
      while (i < last) {
        val a = ids(i); val b = ids(i + 1)
        if ((a | b) >= 0) {
          val r = pr.get((a.toLong << 32) | (b.toLong & 0xffffffffL), Int.MaxValue)
          if (r < best) best = r
        }
        i += 1
      }
      if (best == Int.MaxValue) return from + len
      val l = it.pairL(best); val r = it.pairR(best); val m = it.mergedId(best)
      var w = from; var j = from
      val end = from + len
      while (j < end) {
        if (j < end - 1 && ids(j) == l && ids(j + 1) == r) { ids(w) = m; j += 2 }
        else { ids(w) = ids(j); j += 1 }
        w += 1
      }
      len = w - from
    }
    from + len
  }

  /** Greedy BPE: merge the best-ranked pair (all occurrences, left to
    * right), repeat until no pair is ranked. Seed tokens are CODE POINTS
    * (surrogate pairs stay together — `text.map(_.toString)` would split
    * every non-BMP char into two invalid half-tokens, advice r13). */
  def encode(text: String, table: BpeTable): Array[String] = {
    val extra = new ArrayBuffer[String]()
    val (ids, n) = encodeIdsCp(text, table, segmented = false, extra)
    idsToStrings(ids, n, table.intern, extra)
  }

  /** Code-point-seeded interned encode: seeds every code point to an id
    * (unknowns negative), then merges — whole-text or per operand-run
    * (`segmented`), identical outputs (the factorization property). */
  private def encodeIdsCp(text: String, table: BpeTable, segmented: Boolean,
      extra: ArrayBuffer[String]): (Array[Int], Int) = {
    val it = table.intern
    val opsAscii = table.operandAsciiMask
    val ops = table.operandCodePoints
    val ids = new Array[Int](text.length)
    var w = 0        // compacted length (runs already merged)
    var runStart = 0 // seeds of the current operand run live at [runStart, w)
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      val k = Character.charCount(cp)
      val isOp = !segmented ||
        (if (cp < 128) opsAscii(cp) else ops.contains(cp))
      if (isOp) {
        val id =
          if (cp < 128) it.asciiSeedId(cp)
          else it.idOf(text.substring(i, i + k))
        ids(w) =
          if (id >= 0) id
          else { extra += text.substring(i, i + k); -extra.size }
        w += 1
      } else {
        // breaker: close the pending run, pass the char through whole
        w = mergeIds(ids, runStart, w, it)
        extra += text.substring(i, i + k)
        ids(w) = -extra.size
        w += 1
        runStart = w
      }
      i += k
    }
    w = mergeIds(ids, runStart, w, it)
    (ids, w)
  }

  /** Byte-seeded interned encode (GPT-2/LLaMA seeding): seeds every UTF-8
    * byte to its hex-pair token id in the HEXED table, merges whole-text
    * or per operand-run. Breaker chars pass through as raw unmerged bytes
    * (byte fallback), exactly like the reference loop. */
  private def encodeIdsBytes(text: String, table: BpeTable, segmented: Boolean,
      extra: ArrayBuffer[String]): (Array[Int], Int) = {
    val it = table.hexed.intern
    val opsAscii = table.operandAsciiMask
    val ops = table.operandCodePoints
    // worst case 4 UTF-8 bytes per char — but chars below 0x800 (the
    // overwhelming majority) take <= 2, so size for 2 and grow on demand
    var ids = new Array[Int](math.max(8, text.length * 2))
    var w = 0
    var runStart = 0
    var i = 0
    def ensure(extraCap: Int): Unit =
      if (w + extraCap > ids.length)
        ids = java.util.Arrays.copyOf(ids, math.max(ids.length * 2, w + extraCap))
    def pushByte(b: Int, mergeable: Boolean): Unit = {
      val id = if (mergeable) it.byteSeedId(b) else -1
      if (id >= 0) { ids(w) = id }
      else {
        // unknown byte — or a breaker byte that must NOT merge: its hex
        // string renders identically either way
        extra += byteHexStr(b); ids(w) = -extra.size
      }
      w += 1
    }
    while (i < text.length) {
      val cp = text.codePointAt(i)
      val k = Character.charCount(cp)
      val isOp = !segmented ||
        (if (cp < 128) opsAscii(cp) else ops.contains(cp))
      if (isOp) {
        // operand chars are ASCII by the allAsciiOperands precondition of
        // byte mode when segmented; unsegmented mode takes any char here
        if (cp < 128) { ensure(1); pushByte(cp, mergeable = true) }
        else {
          val bytes = text.substring(i, i + k)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          ensure(bytes.length)
          bytes.foreach(b => pushByte(b & 0xff, mergeable = true))
        }
      } else {
        // breaker: close the run, emit the char's bytes unmerged
        w = mergeIds(ids, runStart, w, it)
        val bytes = text.substring(i, i + k)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        ensure(bytes.length)
        bytes.foreach(b => pushByte(b & 0xff, mergeable = false))
        runStart = w
      }
      i += k
    }
    w = mergeIds(ids, runStart, w, it)
    (ids, w)
  }

  private def idsToStrings(ids: Array[Int], n: Int, it: Intern,
      extra: ArrayBuffer[String]): Array[String] = {
    val out = new Array[String](n)
    var k = 0
    while (k < n) {
      val id = ids(k)
      out(k) = if (id >= 0) it.tokStrings(id) else extra(-id - 1)
      k += 1
    }
    out
  }

  // ---- reference implementation (retained verbatim for the r17
  // differential spec: the interned path above must be output-identical) --

  /** One seed token per Unicode CODE POINT. */
  private def seedTokens(text: String): Array[String] = {
    val out = new ArrayBuffer[String](text.length)
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      val n = Character.charCount(cp)
      out += text.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  private[functions] def encodeReference(text: String, table: BpeTable): Array[String] =
    encodeTokens(seedTokens(text), table)

  /** The merge loop over an arbitrary seed-token array — shared by the
    * code-point and byte seedings (reference path). */
  private def encodeTokens(seed: Array[String], table: BpeTable): Array[String] = {
    var toks: Array[String] = seed
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

  /** Segment-factorized BPE — IDENTICAL output to [[encode]] (the
    * factorization property, pinned in BpeSpec), but the merge loop's rank
    * scan is confined to maximal operand-char runs, so worst-case cost per
    * document is O(longest_run · merges) instead of O(len · merges): the
    * full-document lanes' scale path (VERDICT r13 #4). Breaker code points
    * pass through as singleton tokens. */
  def encodeSegmented(text: String, table: BpeTable): Array[String] = {
    val extra = new ArrayBuffer[String]()
    val (ids, n) = encodeIdsCp(text, table, segmented = true, extra)
    idsToStrings(ids, n, table.intern, extra)
  }

  /** Reference twin of [[encodeSegmented]] (pre-r17 loop, verbatim). */
  private[functions] def encodeSegmentedReference(text: String,
      table: BpeTable): Array[String] = {
    val ops = table.operandCodePoints
    val out = new ArrayBuffer[String](text.length / 2 + 1)
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (!ops.contains(cp)) {
        val n = Character.charCount(cp)
        out += text.substring(i, i + n) // breaker: singleton token in place
        i += n
      } else {
        var j = i
        while (j < text.length && ops.contains(text.codePointAt(j)))
          j += Character.charCount(text.codePointAt(j))
        out ++= encodeReference(text.substring(i, j), table)
        i = j
      }
    }
    out.toArray
  }

  /** Lowercase hex of a string's UTF-8 bytes. */
  private[graft] def toHex(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    bytes.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** One seed token per UTF-8 BYTE (2 lowercase hex chars each) — the
    * GPT-2/LLaMA seeding: every byte is in the base vocabulary, so there
    * is no unknown token, only unmerged bytes (byte fallback). */
  private def seedByteTokens(text: String): Array[String] = {
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[String](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = f"${bytes(i) & 0xff}%02x"; i += 1 }
    out
  }

  /** BYTE-level BPE (VERDICT r15 #4 — the GPT-2/LLaMA shape): seed from
    * UTF-8 bytes, apply the table's merges re-expressed over byte tokens
    * ([[BpeTable.hexed]]). On ASCII text this produces exactly the hex of
    * the code-point encode's tokens; non-ASCII characters pass through as
    * their raw bytes (byte fallback) — both properties pinned in BpeSpec. */
  def encodeBytes(text: String, table: BpeTable): Array[String] = {
    val extra = new ArrayBuffer[String]()
    val (ids, n) = encodeIdsBytes(text, table, segmented = false, extra)
    idsToStrings(ids, n, table.hexed.intern, extra)
  }

  /** Reference twin of [[encodeBytes]] (pre-r17 loop, verbatim). */
  private[functions] def encodeBytesReference(text: String,
      table: BpeTable): Array[String] =
    encodeTokens(seedByteTokens(text), table.hexed)

  /** Segment-factorized [[encodeBytes]] — IDENTICAL output (pinned in
    * BpeSpec), run-bounded cost. Segmentation is by the CHAR table's
    * operand code points, which is exactly byte-level factorization when
    * every operand is ASCII (the [[BpeTable.allAsciiOperands]]
    * precondition): a breaker char's bytes are either a non-operand ASCII
    * byte or ≥0x80 continuation/lead bytes, neither of which any hexed
    * merge operand contains, so no merge can ever cross a breaker. */
  def encodeBytesSegmented(text: String, table: BpeTable): Array[String] = {
    val extra = new ArrayBuffer[String]()
    val (ids, n) = encodeIdsBytes(text, table, segmented = true, extra)
    idsToStrings(ids, n, table.hexed.intern, extra)
  }

  /** Reference twin of [[encodeBytesSegmented]] (pre-r17 loop, verbatim). */
  private[functions] def encodeBytesSegmentedReference(text: String,
      table: BpeTable): Array[String] = {
    val ops = table.operandCodePoints
    val out = new ArrayBuffer[String](text.length / 2 + 1)
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (!ops.contains(cp)) {
        val n = Character.charCount(cp)
        out ++= seedByteTokens(text.substring(i, i + n)) // byte fallback
        i += n
      } else {
        var j = i
        while (j < text.length && ops.contains(text.codePointAt(j)))
          j += Character.charCount(text.codePointAt(j))
        out ++= encodeTokens(seedByteTokens(text.substring(i, j)), table.hexed)
        i = j
      }
    }
    out.toArray
  }

  /** Executor entry for codegen. Renders ids straight to the CACHED
    * per-vocab UTF8Strings (r17) — the per-token `UTF8String.fromString`
    * of the old path re-encoded every token's bytes on every row. */
  def encodeUtf8(text: UTF8String, table: BpeTable, segmented: Boolean,
      byteSeeded: Boolean = false): GenericArrayData = {
    val s = text.toString
    val extra = new ArrayBuffer[String]()
    val it = if (byteSeeded) table.hexed.intern else table.intern
    val (ids, n) =
      if (byteSeeded) encodeIdsBytes(s, table, segmented, extra)
      else encodeIdsCp(s, table, segmented, extra)
    val out = new Array[Any](n)
    var k = 0
    while (k < n) {
      val id = ids(k)
      out(k) =
        if (id >= 0) it.tokUtf8(id)
        else UTF8String.fromString(extra(-id - 1))
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** STRING → ARRAY<STRING> of BPE tokens under the reference-object merge
  * table (travels with the plan — broadcast-by-closure). `segmented` picks
  * the factorized loop — identical tokens, run-bounded cost. */
case class BpeEncode(child: Expression, table: Bpe.BpeTable,
    segmented: Boolean = false, byteSeeded: Boolean = false)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    Bpe.encodeUtf8(input.asInstanceOf[UTF8String], table, segmented, byteSeeded)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeTable", table,
      classOf[Bpe.BpeTable].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.Bpe.encodeUtf8($t, $tableRef, $segmented, $byteSeeded);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

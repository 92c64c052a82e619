package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** GPT-2-style byte-pair-encoding tokenizer kernel (VERDICT r10 #2) —
  * the real subword tokenizer behind `t21_bpe_tokenize`, replacing the
  * whitespace/regex stand-ins as the engine's token kernel.
  *
  * The merge table is SEEDED DRIVER-SIDE LITERALS (the s04/p11
  * pattern): 40 merges trained ONCE offline by deterministic greedy
  * BPE — adjacent-pair counts over the corpus vocabulary weighted by
  * word frequency, best pair = (count desc, pair lexicographic asc),
  * all occurrences merged per training step — and inlined identically
  * into this kernel and the DuckDB oracle. Training is data prep, not
  * query time (the reference ships its tokenizers' vocabularies the
  * same way); result strings are pairwise distinct, so token-string →
  * token-id is a bijection.
  *
  * ENCODING semantics (identical, by construction, in both engines —
  * pure integer/string algebra, §5-safe):
  *   start from single characters; repeatedly find the adjacent pair
  *   with the LOWEST merge rank and merge its LEFTMOST occurrence;
  *   stop when no adjacent pair is in the table. One merge per step
  *   keeps the loop trivially replicable as a recursive CTE (GPT-2's
  *   all-occurrences-per-step variant needs a sequential non-overlap
  *   scan that SQL list algebra can't express cleanly, and the two
  *   differ only on overlapping occurrences — a semantics choice, not
  *   an approximation).
  *
  * Token ids: a single-char token is `codepoint − 33` (printable
  * ASCII 33..126 → 0..93; the corpus contract pins text to that range
  * plus whitespace, TablesLayoutSpec); the token of merge rank r is
  * `94 + r`. Pre-tokenization splits on the ONE kernel charset
  * `[ \t\n\r]+` (SURVEY §5), no case folding.
  *
  * Scale: the whole-doc encode is ONE map-side kernel call per row —
  * no vocabulary join, no shuffle (a distinct-words join would
  * shuffle the token stream on a data-sized key). Per-executor word
  * memoization (bounded map) exploits the Zipf working set: the loop
  * runs once per distinct word per executor, not once per occurrence.
  * Memoization is invisible to semantics — encode is a pure function.
  */
object Bpe {

  /** Separator for pair-rank keys — never occurs in corpus tokens
    * (corpus contract: printable ASCII + whitespace only). */
  private final val Sep = '\u001f' // written as escape: raw control bytes render invisibly (tooling rule)

  /** The 40 trained merges, rank = index (see object Scaladoc). */
  val merges: Array[(String, String)] = Array(
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("r", "ow"), ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("cu", "st"), ("cust", "o"),
    ("custo", "mer"), ("f", "i"), ("fi", "l"), ("fil", "t"),
    ("filt", "er"), ("a", "l"), ("al", "l"), ("m", "all"),
    ("s", "mall"), ("g", "e"), ("l", "ow"))

  private val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      val key = merges(i)._1 + Sep + merges(i)._2
      // mirror mergedTokenId's uniqueness check: a duplicate PAIR would
      // silently keep the last rank here while the oracle's
      // MAP([keys],[ranks]) errors on duplicate keys — the table edit
      // must fail identically loudly in both engines (ADVICE r11)
      require(!m.containsKey(key),
        s"duplicate merge pair '${merges(i)._1}'+'${merges(i)._2}'")
      m.put(key, Integer.valueOf(i))
      i += 1
    }
    m
  }

  private val mergedTokenId: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      val tok = merges(i)._1 + merges(i)._2
      require(!m.containsKey(tok), s"duplicate merge result '$tok'")
      m.put(tok, Integer.valueOf(94 + i))
      i += 1
    }
    m
  }

  /** Token string → id (single char: codepoint − 33; else merge id).
    * The base range is ENFORCED, not assumed: a codepoint outside
    * 33..126 would alias into the merge-id space (94 + rank) —
    * silently, and identically in the oracle, so verify could never
    * catch it (review r11). The corpus contract (TablesLayoutSpec)
    * pins text to printable ASCII + whitespace; drift fails loudly
    * here with the byte named. */
  def tokenIdOf(tok: String): Int =
    if (tok.length == 1) {
      val c = tok.charAt(0)
      require(c >= 33 && c <= 126,
        s"Bpe: codepoint ${c.toInt} outside the printable-ASCII base " +
          "token range 33..126 — its id would alias a merge token; the " +
          "corpus charset contract is broken")
      c - 33
    } else mergedTokenId.get(tok).intValue()

  /** Id → token string, the decoder's vocab table (t24's spec replica;
    * the query-side decode rides the same table as a literal array).
    * Total id space: 94 base chars + merges.length merge results. */
  def tokenStringOf(id: Int): String = {
    require(id >= 0 && id < 94 + merges.length, s"Bpe: id $id out of vocab")
    if (id < 94) String.valueOf((id + 33).toChar)
    else merges(id - 94)._1 + merges(id - 94)._2
  }

  /** Decode a flattened id sequence back to text (whitespace is not
    * encoded, so this is the squashed form — t24's roundtrip contract).
    * Same table as [[tokenStringOf]]; static entry point for the
    * codegen'd expression. */
  def decodeIds(ids: ArrayData): UTF8String = {
    val n = ids.numElements()
    val sb = new java.lang.StringBuilder(n * 3)
    var i = 0
    while (i < n) { sb.append(tokenStringOf(ids.getInt(i))); i += 1 }
    UTF8String.fromString(sb.toString)
  }

  /** The merge loop on one word — leftmost occurrence of the
    * minimum-rank adjacent pair, one merge per step. */
  def encodeWord(w: String): Array[Int] = {
    val syms = new java.util.ArrayList[String](w.length)
    var i = 0
    while (i < w.length) { syms.add(String.valueOf(w.charAt(i))); i += 1 }
    var continue = syms.size > 1
    while (continue) {
      var best = Integer.MAX_VALUE
      var pos = -1
      var j = 0
      while (j < syms.size - 1) {
        val r = rank.get(syms.get(j) + Sep + syms.get(j + 1))
        if (r != null && r.intValue() < best) { // strict <: leftmost wins
          best = r.intValue(); pos = j
        }
        j += 1
      }
      if (pos < 0) continue = false
      else {
        syms.set(pos, syms.get(pos) + syms.get(pos + 1))
        syms.remove(pos + 1)
        continue = syms.size > 1
      }
    }
    val out = new Array[Int](syms.size)
    var k = 0
    while (k < syms.size) { out(k) = tokenIdOf(syms.get(k)); k += 1 }
    out
  }

  /** Bounded per-JVM memo (the Zipf working set is tiny; cap keeps a
    * pathological all-distinct corpus from growing driver-of-executor
    * heap — past the cap the kernel just recomputes). */
  private val CacheCap = 1 << 16
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Int]](4096)

  def encodeWordCached(w: String): Array[Int] = {
    val hit = cache.get(w)
    if (hit != null) hit
    else {
      val ids = encodeWord(w)
      if (cache.size < CacheCap) cache.putIfAbsent(w, ids)
      ids
    }
  }

  /** Whole-document encode: split on `[ \t\n\r]+`, per-word BPE,
    * flattened ids in document order. Static entry point for the
    * codegen'd expression. */
  def tokenizeIds(text: UTF8String): ArrayData = {
    val s = text.toString
    val out = new scala.collection.mutable.ArrayBuffer[Int](s.length / 4 + 4)
    var i = 0
    var start = -1
    while (i <= s.length) {
      val ws = i == s.length || {
        val c = s.charAt(i)
        c == ' ' || c == '\t' || c == '\n' || c == '\r'
      }
      if (ws) {
        if (start >= 0) {
          val ids = encodeWordCached(s.substring(start, i))
          var k = 0
          while (k < ids.length) { out += ids(k); k += 1 }
          start = -1
        }
      } else if (start < 0) start = i
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

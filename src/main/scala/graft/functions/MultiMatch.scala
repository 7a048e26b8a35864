package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/**
 * Multi-phrase blocklist matcher on an Aho–Corasick automaton: counts
 * word-boundary-anchored, non-overlapping leftmost occurrences of ANY
 * of N phrases in one O(text) pass per row — the scale path of
 * [[graft.pipeline.TextAnalysis.blocklistStats]]. The regex
 * alternation form is fine at N ≈ dozens; Java's backtracking engine
 * retries alternatives position by position, so cost grows with N
 * while the automaton's per-character work does not — at
 * curation-list sizes (thousands of phrases: bad-words lists, URL
 * fragments, known-contaminant titles) the alternation is the
 * bottleneck and this expression is flat in N (MultiMatchSpec
 * measures the separation).
 *
 * Semantics contract (pinned bit-equal to the regex twin in
 * MultiMatchSpec): matches anchor on ASCII word boundaries
 * (`[A-Za-z0-9_]` on either side blocks — RE2's and java.util.regex's
 * shared default `\b`); counting is leftmost non-overlapping exactly
 * like repeated `Matcher.find` — each counted match is the one with
 * the SMALLEST START at or after the previous match's end, not the
 * smallest end. The automaton discovers matches end-first, so ends
 * are buffered briefly and committed in start order once no
 * longer-spanning match can still precede them (see countMatches);
 * this is what makes suffix phrases ("slow join"/"join") and
 * boundary-blocked long matches shadowing valid short ones agree
 * with the regex. Phrases must be non-empty, distinct, and
 * PREFIX-FREE: prefix-freedom means at most one phrase can match at
 * a given start, so leftmost-FIRST (java.util.regex) and
 * leftmost-LONGEST (POSIX/RE2) alternation semantics coincide and
 * the count is engine-unambiguous — enforced loudly at construction.
 * Suffix-nested phrases ARE allowed (real blocklists carry pairs
 * like "click here"/"here").
 *
 * The automaton builds once per (JVM × phrase list) — ~Σ|phrase|
 * nodes, transitions in one primitive-keyed hash map — and is shared
 * across rows and threads; codegen ships it as a plan reference
 * object, leaving only the scan per row.
 */
case class MultiMatch(child: Expression, phrases: Seq[String])
    extends UnaryExpression {

  MultiMatch.validate(phrases)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"multi_match expects a string column, got $other")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "multi_match"

  @transient private lazy val ac = MultiMatch.automaton(phrases)

  override def nullSafeEval(text: Any): Any =
    ac.countMatches(text.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ac", ac,
      classOf[AcAutomaton].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = $acRef.countMatches($t.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiMatch =
    copy(child = newChild)
}

/** The compiled phrase automaton (top-level so generated code can name
  * the type). Thread-safe after construction (immutable state). */
final class AcAutomaton(phrases: Array[String]) extends Serializable {

  // transitions in one hash map keyed by (node << 16 | char): compact,
  // and a miss is an O(1) probe during the fail-walk
  private val trans = new java.util.HashMap[java.lang.Long, Integer]()
  private val maxNodes = phrases.map(_.length).sum + 1
  private val term = new Array[Int](maxNodes) // own phrase length, 0 = none
  private val fail = new Array[Int](maxNodes)
  // output link: nearest fail-chain ancestor that is a terminal (0 = none),
  // so the per-char suffix-phrase walk only visits actual terminals
  private val out = new Array[Int](maxNodes)
  private val maxLen = phrases.map(_.length).max
  private var nNodes = 1

  private def key(s: Int, c: Char): java.lang.Long =
    java.lang.Long.valueOf((s.toLong << 16) | c)

  locally {
    require(phrases.forall(_.length < (1 << 16)), "phrase too long")
    // trie
    phrases.foreach { p =>
      var s = 0
      var i = 0
      while (i < p.length) {
        val k = key(s, p.charAt(i))
        val nxt = trans.get(k)
        s = if (nxt != null) nxt.intValue()
        else { val n = nNodes; nNodes += 1; trans.put(k, n); n }
        i += 1
      }
      term(s) = p.length
    }
    // BFS fail links
    val children = new java.util.HashMap[Integer, java.util.ArrayList[Character]]()
    trans.keySet().forEach { k =>
      children.computeIfAbsent(Integer.valueOf((k >> 16).toInt),
        _ => new java.util.ArrayList[Character]())
        .add(Character.valueOf((k & 0xffff).toChar))
    }
    val q = new java.util.ArrayDeque[Int]()
    val rootKids = children.get(Integer.valueOf(0))
    if (rootKids != null) rootKids.forEach(c => q.add(trans.get(key(0, c))))
    while (!q.isEmpty) {
      val s = q.poll()
      val kids = children.get(Integer.valueOf(s))
      if (kids != null) kids.forEach { c =>
        val child = trans.get(key(s, c)).intValue()
        var f = fail(s)
        var t = trans.get(key(f, c))
        while (f != 0 && t == null) { f = fail(f); t = trans.get(key(f, c)) }
        fail(child) = if (t != null && t.intValue() != child) t.intValue() else 0
        // phrases ending as proper suffixes of this path also end here;
        // chain them via output links so the scan can enumerate EVERY
        // phrase length ending at a position (a boundary-blocked long
        // match must not shadow a boundary-valid short one)
        out(child) =
          if (term(fail(child)) > 0) fail(child) else out(fail(child))
        q.add(child)
      }
    }
  }

  private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  private def step(state: Int, c: Char): Int = {
    var s = state
    var t = trans.get(key(s, c))
    while (s != 0 && t == null) { s = fail(s); t = trans.get(key(s, c)) }
    if (t != null) t.intValue() else 0
  }

  /** Non-overlapping leftmost count with ASCII-`\b` anchoring. The
    * caller lowercases text iff the phrase list is lowercase (the
    * regex twin's `lower(text)` convention).
    *
    * `Matcher.find` counts the boundary-valid match with the SMALLEST
    * START at or after the previous match's end; the automaton sees
    * matches in END order, and a longer phrase (earlier start) ends
    * later than a shorter one it contains. So boundary-valid
    * candidates go into a tiny start-ordered buffer and commit only
    * once no still-unseen match can start earlier — i.e. when
    * `start <= i + 1 - maxLen` (a match ending past `i` starts at
    * `>= i + 2 - maxLen`). Committing advances the resume point and
    * discards buffered overlaps, exactly regex's skip. The buffer is
    * null for the (dominant) no-match rows and holds at most a
    * handful of entries otherwise — the scan stays O(text). */
  def countMatches(text: String): Long = {
    var count = 0L
    var state = 0
    var pos = 0 // next allowed match start — regex's resume point
    var pending: java.util.TreeMap[Integer, Integer] = null // start -> len
    var i = 0
    val n = text.length
    while (i < n) {
      state = step(state, text.charAt(i))
      // every phrase ending at i: the node's own terminal, then the
      // output-link chain (longest first = start ascending)
      var w = if (term(state) > 0) state else out(state)
      while (w != 0) {
        val len = term(w)
        val start = i - len + 1
        if (start >= pos &&
            (start == 0 || !isWordChar(text.charAt(start - 1))) &&
            (i + 1 >= n || !isWordChar(text.charAt(i + 1)))) {
          if (pending == null)
            pending = new java.util.TreeMap[Integer, Integer]()
          pending.put(start, len) // prefix-freedom: one phrase per start
        }
        w = out(w)
      }
      if (pending != null) {
        var e = pending.firstEntry()
        while (e != null && e.getKey <= i + 1 - maxLen) {
          pending.pollFirstEntry()
          if (e.getKey >= pos) { count += 1; pos = e.getKey + e.getValue }
          e = pending.firstEntry()
        }
      }
      i += 1
    }
    if (pending != null) {
      var e = pending.pollFirstEntry()
      while (e != null) {
        if (e.getKey >= pos) { count += 1; pos = e.getKey + e.getValue }
        e = pending.pollFirstEntry()
      }
    }
    count
  }
}

object MultiMatch {

  // mirrors the scanner's ASCII-\b definition (AcAutomaton.isWordChar)
  private def isWordEdgeChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  private[graft] def isWordEdged(p: String): Boolean =
    p.nonEmpty && isWordEdgeChar(p.head) && isWordEdgeChar(p.last)

  private[functions] def validate(phrases: Seq[String]): Unit = {
    require(phrases.nonEmpty, "phrase list must not be empty")
    require(phrases.forall(_.nonEmpty), "phrases must be non-empty")
    // \b anchoring assumes a phrase's edge chars are word chars: a
    // space-edged phrase INVERTS boundary semantics vs the regex twin
    // (\b(join )\b on "a join b": regex 1, naive AC 0) — reject loudly
    // rather than silently diverge.
    val badEdge = phrases.filterNot(isWordEdged)
    require(badEdge.isEmpty,
      s"phrase edges must be word characters ([A-Za-z0-9_]) for \\b " +
        s"anchoring to match the regex twin; offending: $badEdge")
    val dups = phrases.diff(phrases.distinct)
    require(dups.isEmpty, s"duplicate phrases: $dups")
    phrases.sorted.sliding(2).foreach {
      case Seq(a, b) => require(!b.startsWith(a),
        s"phrase list must be prefix-free ('$a' prefixes '$b') — " +
          "prefix pairs make alternation-order semantics engine-dependent")
      case _ =>
    }
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Seq[String], AcAutomaton]()

  def automaton(phrases: Seq[String]): AcAutomaton = {
    validate(phrases)
    cache.computeIfAbsent(phrases, p => new AcAutomaton(p.toArray))
  }

  /** Register `multi_match(textCol, array('p1','p2',…))` (idempotent;
    * the phrase array must be a literal — it compiles into the plan). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "multi_match",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(text, arr) =>
          val phrases = arr.eval(null) match {
            case a: ArrayData => a.toObjectArray(StringType)
              .map(_.toString).toSeq
            case other => throw new IllegalArgumentException(
              s"multi_match phrases must be a literal array, got $other")
          }
          MultiMatch(text, phrases)
        case _ => throw new IllegalArgumentException(
          "multi_match(text, phrases)")
      },
      "built-in")

  def matchCount(spark: SparkSession, text: Column,
      phrases: Seq[String]): Column = {
    register(spark)
    call_function("multi_match",
      text, org.apache.spark.sql.functions.array(phrases.map(lit): _*))
  }
}

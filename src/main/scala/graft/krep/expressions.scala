package graft.krep

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expressions exposing krep's match semantics as columnar
  * operators. Each expression owns a [[KrepMatcher]] compiled once per task
  * (the analog of the reference compiling trie/regex/shift tables once per
  * file and sharing them across threads, krep.c:2524-2623, 2848-2849).
  *
  * All implement real `doGenCode` (a reference-object method call), so they
  * stay inside whole-stage codegen spans instead of falling back to
  * interpreted eval.
  */
abstract class KrepMatchExpression extends UnaryExpression {
  def params: KrepParams
  override def nullIntolerant: Boolean = true
  @transient protected lazy val matcher: KrepMatcher = new KrepMatcher(params)

  protected def genCall(ctx: CodegenContext, ev: ExprCode,
      method: String): ExprCode = {
    val m = ctx.addReferenceObj("krepMatcher", matcher,
      classOf[KrepMatcher].getName)
    defineCodeGen(ctx, ev, c => s"$m.$method($c)")
  }
}

/** Total match count (reference A1; `-m` cap folded in via params.maxCount). */
case class KrepCount(child: Expression, params: KrepParams)
    extends KrepMatchExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = matcher.count(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    genCall(ctx, ev, "count")
  override protected def withNewChildInternal(c: Expression): KrepCount = copy(child = c)
  override def prettyName: String = "krep_count"
}

/** Short-circuit existence check (reference A4, exit-status semantics). */
case class KrepContains(child: Expression, params: KrepParams)
    extends KrepMatchExpression {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(v: Any): Any = matcher.contains(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    genCall(ctx, ev, "contains")
  override protected def withNewChildInternal(c: Expression): KrepContains = copy(child = c)
  override def prettyName: String = "krep_contains"
}

/** Count of '\n'-separated lines containing >= 1 match (reference P5/A2,
  * the `-c` mode: multiple matches on one line count once).
  */
case class KrepCountLines(child: Expression, params: KrepParams)
    extends KrepMatchExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = matcher.countLines(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    genCall(ctx, ev, "countLines")
  override protected def withNewChildInternal(c: Expression): KrepCountLines = copy(child = c)
  override def prettyName: String = "krep_count_lines"
}

/** All match positions, sorted by (start, end): ARRAY<STRUCT<start,end,pattern>>
  * (reference track_positions + global position sort, krep.c:419-434).
  * Offsets are byte offsets for literal patterns, char offsets for regex.
  */
case class KrepPositions(child: Expression, params: KrepParams)
    extends KrepMatchExpression {
  override def dataType: DataType = KrepPositions.schema
  override def nullSafeEval(v: Any): Any = matcher.positions(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    genCall(ctx, ev, "positions")
  override protected def withNewChildInternal(c: Expression): KrepPositions = copy(child = c)
  override def prettyName: String = "krep_positions"
}
object KrepPositions {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("end", IntegerType, nullable = false),
    StructField("pattern", IntegerType, nullable = false))), containsNull = false)
}

/** Matched substrings in text order (the `-o` only-matching projection,
  * krep.c:517-793; newlines inside a match become spaces).
  */
case class KrepExtract(child: Expression, params: KrepParams)
    extends KrepMatchExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any = matcher.extract(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    genCall(ctx, ev, "extract")
  override protected def withNewChildInternal(c: Expression): KrepExtract = copy(child = c)
  override def prettyName: String = "krep_extract"
}

/** The `-o` only-matching projection WITH grep-style line numbers:
  * ARRAY<STRUCT<ln INT, m STRING>> (reference krep.c:526-653).
  */
case class KrepExtractLines(child: Expression, params: KrepParams)
    extends KrepMatchExpression {
  override def dataType: DataType = KrepExtractLines.schema
  override def nullSafeEval(v: Any): Any =
    matcher.extractLines(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    genCall(ctx, ev, "extractLines")
  override protected def withNewChildInternal(c: Expression): KrepExtractLines =
    copy(child = c)
  override def prettyName: String = "krep_extract_lines"
}
object KrepExtractLines {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("ln", IntegerType, nullable = false),
    StructField("m", StringType, nullable = false))), containsNull = false)
}

/** Binary-content gate over a BINARY column: NUL byte within the first 1024
  * bytes (reference is_binary_file, krep.c:3121-3141) — the filter a corpus
  * scan applies before text operators.
  */
case class KrepIsBinary(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BooleanType
  override def nullSafeEval(v: Any): Any =
    SourcePruning.isBinary(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.krep.SourcePruning.isBinary($c)")
  override protected def withNewChildInternal(c: Expression): KrepIsBinary =
    copy(child = c)
  override def prettyName: String = "krep_is_binary"
}

/** Extension-based source pruning on a file NAME (reference
  * should_skip_extension, krep.c:3090-3119: `.min.` assets + the krep.h skip
  * list, case-insensitive last-dot suffix).
  */
case class KrepSkipName(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BooleanType
  override def nullSafeEval(v: Any): Any =
    SourcePruning.shouldSkipExtension(v.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.krep.SourcePruning.shouldSkipExtension($c.toString())")
  override protected def withNewChildInternal(c: Expression): KrepSkipName =
    copy(child = c)
  override def prettyName: String = "krep_skip_name"
}

/** Directory-name pruning of the recursive walk (reference
  * should_skip_directory, krep.c:3071-3087): hidden dot-dirs (except "." and
  * "..") and the krep.h skip list.
  */
case class KrepSkipDir(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BooleanType
  override def nullSafeEval(v: Any): Any =
    SourcePruning.shouldSkipDirectory(v.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.krep.SourcePruning.shouldSkipDirectory($c.toString())")
  override protected def withNewChildInternal(c: Expression): KrepSkipDir =
    copy(child = c)
  override def prettyName: String = "krep_skip_dir"
}

/** Compiled gitignore chain shared per task (analogous to [[KrepMatcher]]). */
final class GitIgnoreMatcher(lines: Seq[String], isDir: Boolean)
    extends Serializable {
  @transient private lazy val chain =
    Seq(SourcePruning.parseGitignore(lines))
  def ignored(name: UTF8String): Boolean =
    SourcePruning.isIgnored(chain, name.toString, isDir)
}

/** Gitignore filter over basenames: `!` negation, dir-only, fnmatch — the
  * reference's per-directory prune (krep.c:3180-3307) lifted to a columnar
  * predicate with the pattern file as a literal.
  */
case class GitignoreIgnored(child: Expression, lines: Seq[String],
    isDir: Boolean = false) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BooleanType
  @transient private lazy val m = new GitIgnoreMatcher(lines, isDir)
  override def nullSafeEval(v: Any): Any = m.ignored(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gitignoreMatcher", m,
      classOf[GitIgnoreMatcher].getName)
    defineCodeGen(ctx, ev, c => s"$ref.ignored($c)")
  }
  override protected def withNewChildInternal(c: Expression): GitignoreIgnored =
    copy(child = c)
  override def prettyName: String = "gitignore_ignored"
}

/** Byte-wise ASCII-only lowercase (reference lower_table, krep.c:124-134).
  * NOT equivalent to Spark's UTF-8-aware `lower()`.
  */
case class AsciiLower(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    UTF8String.fromBytes(AsciiFold.foldBytes(s.getBytes))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromBytes(" +
        s"graft.krep.AsciiFold.foldBytes($c.getBytes()))")
  override protected def withNewChildInternal(c: Expression): AsciiLower = copy(child = c)
  override def prettyName: String = "ascii_lower"
}

/** Tokenizer pinned to the reference's word-character class: maximal runs of
  * [A-Za-z0-9_] (krep.h:298-303), ASCII-lower-folded. This is the tokenizer
  * of the whole index pipeline — term boundaries == whole-word boundaries.
  */
case class KrepTokenize(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    KrepTokenize.tokenizeArrayData(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.krep.KrepTokenize.tokenizeArrayData($c)")
  override protected def withNewChildInternal(c: Expression): KrepTokenize = copy(child = c)
  override def prettyName: String = "krep_tokenize"
}
object KrepTokenize {
  /** Tokens as folded byte-slices, in text order. */
  def tokenize(s: UTF8String): Array[UTF8String] = {
    val bytes = s.getBytes
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && !AsciiFold.isWordByte(bytes(i))) i += 1
      val start = i
      while (i < n && AsciiFold.isWordByte(bytes(i))) i += 1
      if (i > start) {
        val tok = new Array[Byte](i - start)
        var j = start
        while (j < i) { tok(j - start) = AsciiFold.fold(bytes(j)); j += 1 }
        out += UTF8String.fromBytes(tok)
      }
    }
    out.toArray
  }
  def tokenizeArrayData(s: UTF8String): GenericArrayData =
    new GenericArrayData(tokenize(s).asInstanceOf[Array[Any]])

  /** Token COUNT without materializing the tokens — same boundary rules as
    * [[tokenize]] by construction (the index build computes dl for every
    * document; the array-per-doc allocation was a measurable slice of the
    * corpus step).
    */
  def count(s: UTF8String): Int = {
    val bytes = s.getBytes
    var i = 0
    var c = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && !AsciiFold.isWordByte(bytes(i))) i += 1
      if (i < n) {
        c += 1
        while (i < n && AsciiFold.isWordByte(bytes(i))) i += 1
      }
    }
    c
  }
}

/** [[KrepTermPositions]] with the position list already delta-varint packed
  * ([[graft.index.BlockCodec.packPositions]] format): the index build's wide
  * exchange then moves one compact BINARY strip per (doc, term) instead of an
  * ARRAY<INT>, and block encoding concatenates strips without re-coding.
  */
case class KrepTermPositionsPacked(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = KrepTermPositionsPacked.schema
  override def nullSafeEval(v: Any): Any =
    KrepTermPositionsPacked.packed(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.krep.KrepTermPositionsPacked.packed($c)")
  override protected def withNewChildInternal(c: Expression): KrepTermPositionsPacked =
    copy(child = c)
  override def prettyName: String = "krep_term_positions_packed"
}
object KrepTermPositionsPacked {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", IntegerType, nullable = false),
    StructField("posv", BinaryType, nullable = false))), containsNull = false)

  def packed(s: UTF8String): GenericArrayData =
    KrepTermPositions.runRows(s)((t, ps) =>
      org.apache.spark.sql.catalyst.InternalRow(
        t, ps.length, graft.index.BlockCodec.packPositions(ps)))
}

/** `size(krep_tokenize(text))` without the token array. */
case class KrepTokenCount(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    KrepTokenize.count(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.krep.KrepTokenize.count($c)")
  override protected def withNewChildInternal(c: Expression): KrepTokenCount =
    copy(child = c)
  override def prettyName: String = "krep_token_count"
}

/** Per-row term frequencies: ARRAY<STRUCT<term STRING, tf INT>> sorted by
  * term bytes. Computing tf inside the row (instead of explode + groupBy)
  * removes an entire shuffle from the index build — at 10^12 docs that
  * shuffle would move one row per token instead of one per distinct term.
  */
case class KrepTermFreqs(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = KrepTermFreqs.schema
  override def nullSafeEval(v: Any): Any =
    KrepTermFreqs.termFreqs(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.krep.KrepTermFreqs.termFreqs($c)")
  override protected def withNewChildInternal(c: Expression): KrepTermFreqs = copy(child = c)
  override def prettyName: String = "krep_term_freqs"
}
object KrepTermFreqs {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", IntegerType, nullable = false))), containsNull = false)

  def termFreqs(s: UTF8String): GenericArrayData = {
    // sort + run-length encode: no per-token map nodes or boxing — this is
    // the hottest loop of the whole index build
    val toks = KrepTokenize.tokenize(s)
    if (toks.isEmpty) return new GenericArrayData(Array.empty[Any])
    java.util.Arrays.sort(toks, (a: UTF8String, b: UTF8String) => a.compareTo(b))
    val rows = new java.util.ArrayList[Any](toks.length / 2 + 1)
    var runStart = 0
    var i = 1
    while (i <= toks.length) {
      if (i == toks.length || toks(i).compareTo(toks(runStart)) != 0) {
        rows.add(org.apache.spark.sql.catalyst.InternalRow(
          toks(runStart), i - runStart))
        runStart = i
      }
      i += 1
    }
    new GenericArrayData(rows.toArray)
  }
}

/** Per-row term positions: ARRAY<STRUCT<term STRING, pos ARRAY<INT>>> sorted
  * by term bytes, `pos` the ascending 0-based token ordinals of each
  * occurrence (tf == size(pos)). This is [[KrepTermFreqs]] widened with the
  * positional payload the index needs for shuffle-free phrase search — the
  * engine analog of the reference reporting match positions per file
  * (krep.h:49-60) rather than just counts.
  */
case class KrepTermPositions(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = KrepTermPositions.schema
  override def nullSafeEval(v: Any): Any =
    KrepTermPositions.termPositions(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.krep.KrepTermPositions.termPositions($c)")
  override protected def withNewChildInternal(c: Expression): KrepTermPositions =
    copy(child = c)
  override def prettyName: String = "krep_term_positions"
}
object KrepTermPositions {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("pos", ArrayType(IntegerType, containsNull = false),
      nullable = false))), containsNull = false)

  /** Shared (term, ascending ordinals) run walk — argsort by (term bytes,
    * ordinal) — with a pluggable row payload. The packed and unpacked
    * expressions MUST group identically (their equality is the index
    * format's core invariant), so the pipeline lives once.
    */
  private[krep] def runRows(s: UTF8String)(
      mk: (UTF8String, Array[Int]) => Any): GenericArrayData = {
    val toks = KrepTokenize.tokenize(s)
    if (toks.isEmpty) return new GenericArrayData(Array.empty[Any])
    val idx = new Array[Integer](toks.length)
    var i = 0
    while (i < toks.length) { idx(i) = i; i += 1 }
    java.util.Arrays.sort(idx, (a: Integer, b: Integer) => {
      val c = toks(a).compareTo(toks(b))
      if (c != 0) c else Integer.compare(a, b)
    })
    val rows = new java.util.ArrayList[Any](toks.length / 2 + 1)
    var runStart = 0
    i = 1
    while (i <= toks.length) {
      if (i == toks.length || toks(idx(i)).compareTo(toks(idx(runStart))) != 0) {
        val ps = new Array[Int](i - runStart)
        var j = runStart
        while (j < i) { ps(j - runStart) = idx(j); j += 1 }
        rows.add(mk(toks(idx(runStart)), ps))
        runStart = i
      }
      i += 1
    }
    new GenericArrayData(rows.toArray)
  }

  def termPositions(s: UTF8String): GenericArrayData =
    runRows(s)((t, ps) => org.apache.spark.sql.catalyst.InternalRow(
      t, new GenericArrayData(ps)))
}

/** Column-API surface (the engine's user-facing DSL). */
object functions {
  private def col(e: Expression): Column = GraftSqlBridge.column(e)
  private def ex(c: Column): Expression = GraftSqlBridge.expression(c)

  def krep_count(c: Column, p: KrepParams): Column = col(KrepCount(ex(c), p))
  def krep_contains(c: Column, p: KrepParams): Column = col(KrepContains(ex(c), p))
  def krep_count_lines(c: Column, p: KrepParams): Column = col(KrepCountLines(ex(c), p))
  def krep_positions(c: Column, p: KrepParams): Column = col(KrepPositions(ex(c), p))
  def krep_extract(c: Column, p: KrepParams): Column = col(KrepExtract(ex(c), p))
  def ascii_lower(c: Column): Column = col(AsciiLower(ex(c)))
  def krep_tokenize(c: Column): Column = col(KrepTokenize(ex(c)))
  def krep_token_count(c: Column): Column = col(KrepTokenCount(ex(c)))
  def krep_term_positions_packed(c: Column): Column =
    col(KrepTermPositionsPacked(ex(c)))
  def krep_term_freqs(c: Column): Column = col(KrepTermFreqs(ex(c)))
  def krep_term_positions(c: Column): Column = col(KrepTermPositions(ex(c)))
  def krep_extract_lines(c: Column, p: KrepParams): Column =
    col(KrepExtractLines(ex(c), p))
  def krep_is_binary(c: Column): Column = col(KrepIsBinary(ex(c)))
  def krep_skip_name(c: Column): Column = col(KrepSkipName(ex(c)))
  def krep_skip_dir(c: Column): Column = col(KrepSkipDir(ex(c)))
  def gitignore_ignored(c: Column, lines: Seq[String],
      isDir: Boolean = false): Column = col(GitignoreIgnored(ex(c), lines, isDir))

  // convenience single-literal forms
  def krep_contains(c: Column, pattern: String): Column =
    krep_contains(c, KrepParams(Seq(pattern)))
  def krep_count(c: Column, pattern: String): Column =
    krep_count(c, KrepParams(Seq(pattern)))
  /** Regex matching pinned to the reference's non-overlapping resume-at-end
    * semantics (krep.c:1530-1549).
    */
  def krep_regex_count(c: Column, pattern: String): Column =
    krep_count(c, KrepParams(Seq(pattern), regex = true, overlapping = false))
  def krep_regex_extract(c: Column, pattern: String): Column =
    krep_extract(c, KrepParams(Seq(pattern), regex = true, overlapping = false))
}

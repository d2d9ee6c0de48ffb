package graft.krep

import java.util.regex.Pattern

/** Source-pruning predicates of the reference's recursive directory walk,
  * re-expressed as pure functions usable from Catalyst expressions and
  * DataFrame filters:
  *
  *  - binary-content gate: NUL byte within the first 1024 bytes
  *    (krep.c:3121-3141, BINARY_CHECK_BUFFER_SIZE krep.c:87)
  *  - directory skip list + hidden dirs (krep.c:3071-3087, krep.h:238-244)
  *  - extension skip list + `.min.` assets, case-insensitive on the last
  *    dot suffix (krep.c:3090-3119, krep.h:246-266)
  *  - gitignore patterns: `!` negation, trailing-`/` dir-only, leading-`/`
  *    stripped, fnmatch(pattern, basename, 0) with parent-first last-match-
  *    wins evaluation (krep.c:3180-3307)
  */
object SourcePruning {

  // krep.h:238-244
  val SkipDirectories: Set[String] = Set(
    ".", "..", ".git", "node_modules", ".svn", ".hg", "build", "dist",
    "__pycache__", ".pytest_cache", ".mypy_cache", ".venv", ".env", "venv",
    "env", "target", "bin", "obj")

  // krep.h:246-266 (lowercase, with dot)
  val SkipExtensions: Set[String] = Set(
    ".o", ".so", ".a", ".dll", ".exe", ".lib", ".dylib", ".class", ".pyc",
    ".pyo", ".obj", ".elf", ".wasm",
    ".zip", ".tar", ".gz", ".bz2", ".xz", ".rar", ".7z", ".jar", ".war",
    ".ear", ".iso", ".img", ".pkg", ".deb", ".rpm",
    ".jpg", ".jpeg", ".png", ".gif", ".bmp", ".tiff", ".webp", ".svg",
    ".ico", ".psd", ".ai",
    ".mp3", ".wav", ".ogg", ".flac", ".aac", ".m4a", ".mp4", ".avi", ".mkv",
    ".mov", ".wmv", ".flv",
    ".pdf", ".doc", ".docx", ".xls", ".xlsx", ".ppt", ".pptx", ".odt",
    ".ods", ".odp",
    ".dat", ".bin", ".bak", ".log", ".tmp", ".temp",
    ".swp", ".swo", ".ds_store",
    ".db", ".sqlite", ".mdb",
    ".ttf", ".otf", ".woff", ".woff2", ".eot")

  /** NUL within the first 1024 bytes; empty → not binary (krep.c:3121-3141). */
  def isBinary(bytes: Array[Byte]): Boolean = {
    if (bytes == null) return false
    val n = math.min(bytes.length, 1024)
    var i = 0
    while (i < n) {
      if (bytes(i) == 0) return true
      i += 1
    }
    false
  }

  /** Hidden dot-dirs (except "."/"..") or the predefined list
    * (krep.c:3071-3087).
    */
  def shouldSkipDirectory(name: String): Boolean =
    (name.startsWith(".") && name != "." && name != "..") ||
      SkipDirectories.contains(name)

  /** Reference order (krep.c:3090-3118): the no-dot / leading-dot /
    * trailing-dot guard FIRST (so "x.min." is kept — no checkable
    * extension), then `.min.` assets, then the extension list on the LAST
    * dot suffix, case-insensitive.
    */
  def shouldSkipExtension(fileName: String): Boolean = {
    val dot = fileName.lastIndexOf('.')
    if (dot <= 0 || dot == fileName.length - 1) return false
    if (fileName.contains(".min.")) return true
    SkipExtensions.contains(fileName.substring(dot).toLowerCase)
  }

  // --- gitignore -------------------------------------------------------------

  final case class GitIgnorePattern(glob: String, negated: Boolean,
      dirOnly: Boolean) {
    // fnmatch flags=0 (no FNM_PATHNAME): '*' and '?' match ANY char including
    // '/'; matching is against the basename anyway (krep.c:3295)
    @transient lazy val regex: Pattern = fnmatchToRegex(glob)
  }

  /** fnmatch(3) with flags=0 → anchored Java regex: `*` → `.*`, `?` → `.`,
    * `[...]`/`[!...]` char classes, `\` escapes, everything else literal.
    */
  def fnmatchToRegex(glob: String): Pattern = {
    val sb = new StringBuilder("^")
    var i = 0
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' => sb.append(".*")
        case '?' => sb.append(".")
        case '\\' if i + 1 < glob.length =>
          i += 1
          sb.append(Pattern.quote(glob.charAt(i).toString))
        case '[' =>
          // character class: leading '!' negates; a ']' as the FIRST member
          // (after the optional '!') is a literal member per fnmatch(3), so
          // the closing-bracket scan starts past it; other members are
          // LITERAL except ranges (a-z), so Java-regex metacharacters inside
          // the body are escaped ('\', '&&', ']', a non-leading '^', '[')
          val negMark = i + 1 < glob.length && glob.charAt(i + 1) == '!'
          val close = glob.indexOf(']', i + (if (negMark) 3 else 2))
          val raw = if (close < 0) "" else glob.substring(i + 1, close)
          val neg = raw.startsWith("!")
          val members = if (neg) raw.substring(1) else raw
          if (close < 0 || members.isEmpty) sb.append(Pattern.quote("["))
          else {
            val safe = members
              .replace("\\", "\\\\").replace("&", "\\&")
              .replace("[", "\\[").replace("]", "\\]").replace("^", "\\^")
            sb.append('[').append(if (neg) "^" else "").append(safe).append(']')
            i = close
          }
        case c => sb.append(Pattern.quote(c.toString))
      }
      i += 1
    }
    Pattern.compile(sb.append("$").toString)
  }

  /** Parse .gitignore lines (krep.c gitignore_add_pattern): trim, skip
    * blank/#, `!` negation, trailing `/` dir-only, leading `/` stripped
    * ("anchored to directory root" in the reference — which then matches
    * the stripped pattern against EVERY basename, so '/x' behaves exactly
    * like 'x', NOT like git's anchor). A pattern with an INTERNAL slash
    * ('foo/bar') is kept verbatim and can never match a basename. Both
    * semantics are pinned against the compiled reference binary by
    * scripts/reference_prune_diff.sh's slash-pattern cases.
    */
  def parseGitignore(lines: Seq[String]): Seq[GitIgnorePattern] =
    lines.flatMap { raw =>
      var line = raw.dropWhile(c => c == ' ' || c == '\t')
      if (line.isEmpty || line.startsWith("#")) None
      else {
        val negated = line.startsWith("!")
        if (negated) line = line.substring(1)
        line = line.reverse.dropWhile(c =>
          c == ' ' || c == '\t' || c == '\r' || c == '\n').reverse
        val dirOnly = line.endsWith("/")
        if (dirOnly) line = line.dropRight(1)
        if (line.startsWith("/")) line = line.substring(1)
        if (line.isEmpty) None
        else Some(GitIgnorePattern(line, negated, dirOnly))
      }
    }

  /** Last-match-wins over parent-first chained pattern lists
    * (krep.c:3276-3299): `chain` is outermost gitignore first.
    */
  def isIgnored(chain: Seq[Seq[GitIgnorePattern]], name: String,
      isDir: Boolean): Boolean = {
    var ignored = false
    chain.foreach(_.foreach { p =>
      if ((!p.dirOnly || isDir) && p.regex.matcher(name).matches())
        ignored = !p.negated
    })
    ignored
  }
}

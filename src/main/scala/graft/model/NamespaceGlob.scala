package graft.model

/**
 * flo namespace glob pattern, compiled to an anchored Java regex.
 *
 * Semantics mirror the reference's matcher — the Rust `glob` crate's
 * `Pattern::matches_with` under `MatchOptions { case_sensitive: true,
 * require_literal_separator: true, require_literal_leading_dot: true }`
 * (reference: flo-server/src/engine/event_stream/partition/event_reader/namespace.rs:1-27,
 * behavioral spec in its tests :30-101):
 *
 *  - `*`  matches any run of characters EXCEPT `/` (never crosses a path level);
 *         at the start of a path component it cannot match a leading `.`.
 *  - `?`  matches exactly one character except `/` (and not a leading `.`).
 *  - `**` matches zero or more WHOLE path components; it must itself be a whole
 *         component (`/a/&#42;&#42;/b`, `&#42;&#42;/b`, `/a/&#42;&#42;`) — `/&#42;&#42;&#42;`, `/&#42;&#42;foo`, `/foo&#42;&#42;`
 *         are invalid patterns.
 *  - `[abc]` / `[a-z]` / `[!abc]` character classes; never match `/`;
 *         unclosed `[` is an invalid pattern.
 *  - everything else is literal; matching is case-sensitive and anchored
 *    (a glob with no metacharacters matches only itself — namespace.rs:89-93).
 */
final case class NamespaceGlob(pattern: String, regex: String) {
  @transient private lazy val compiled = java.util.regex.Pattern.compile(regex)
  def matches(namespace: String): Boolean = compiled.matcher(namespace).matches()
}

object NamespaceGlob {

  /** Characters that make a pattern non-literal. */
  def isLiteral(pattern: String): Boolean =
    !pattern.exists(c => c == '*' || c == '?' || c == '[')

  def compile(pattern: String): Either[String, NamespaceGlob] =
    toRegex(pattern).map(rx => NamespaceGlob(pattern, rx))

  /** Unsafe variant for call sites that want the reference's error behavior
    * (`InvalidNamespaceGlob`) as an exception. */
  def compileOrThrow(pattern: String): NamespaceGlob =
    compile(pattern).fold(err => throw new InvalidNamespaceGlob(pattern, err), identity)

  // Component that may not start with a dot (require_literal_leading_dot).
  private val Seg = "[^/.][^/]*"

  /** Translate a flo glob into an anchored Java regex (Left = invalid pattern,
    * matching the reference's `InvalidNamespaceGlob` cases).
    *
    * The leading-dot rule is dynamic (it applies to whichever atom ends up
    * consuming a component's FIRST char), but compiles statically: at each
    * component start, look past any single `*`s (which may match empty) to
    * the first other atom — if that atom is a wildcard (`?`/class), the
    * component as a whole may not start with `.`, emitted as one `(?!\.)`
    * lookahead. A leading literal needs no guard (it only matches itself),
    * and a bare `*`-run is handled by its own dot-free first-char form. */
  def toRegex(pattern: String): Either[String, String] = {
    val sb = new StringBuilder("^")
    val n = pattern.length
    var i = 0
    var componentStart = true // at string start or right after '/'
    var dotGuarded = false // current component already carries (?!\.)
    while (i < n) {
      if (componentStart) {
        // scan past single '*'s to the first decisive atom of the component
        var k = i
        while (k < n && pattern.charAt(k) == '*' &&
          !(k + 1 < n && pattern.charAt(k + 1) == '*')) k += 1
        dotGuarded = k < n && (pattern.charAt(k) == '?' || pattern.charAt(k) == '[')
        if (dotGuarded) sb.append("(?!\\.)")
      }
      pattern.charAt(i) match {
        case '*' =>
          var j = i
          while (j < n && pattern.charAt(j) == '*') j += 1
          val count = j - i
          if (count > 2)
            return Left(s"wildcards are either regular `*` or recursive `**` (at $i)")
          else if (count == 2) {
            // `**` must form a whole path component.
            val precededOk = i == 0 || pattern.charAt(i - 1) == '/'
            val followedBySlash = j < n && pattern.charAt(j) == '/'
            val atEnd = j == n
            if (!precededOk || !(followedBySlash || atEnd))
              return Left(s"recursive wildcard `**` must form a single path component (at $i)")
            if (followedBySlash) {
              // zero or more whole components, each ending in '/'
              sb.append(s"(?:(?:$Seg)?/)*")
              i = j + 1
              componentStart = true
            } else {
              // trailing `/**`: everything below, components never starting with '.'
              sb.append(s"(?:(?:$Seg)?(?:/(?:$Seg)?)*)")
              i = j
              componentStart = false
            }
          } else {
            sb.append(
              if (componentStart && !dotGuarded) s"(?:$Seg)?" else "[^/]*")
            i = j
            componentStart = false
          }
        case '?' =>
          sb.append(if (componentStart && !dotGuarded) "[^/.]" else "[^/]")
          i += 1
          componentStart = false
        case '[' =>
          var j = i + 1
          val negated = j < n && pattern.charAt(j) == '!'
          if (negated) j += 1
          val clsStart = j
          // a ']' immediately after '[' or '[!' is a literal member
          if (j < n && pattern.charAt(j) == ']') j += 1
          while (j < n && pattern.charAt(j) != ']') j += 1
          if (j >= n) return Left(s"unclosed character class (at $i)")
          val body = pattern.substring(clsStart, j)
          val escaped = body.flatMap {
            case c @ ('\\' | '^' | ']' | '[' | '&') => "\\" + c
            case c => c.toString
          }
          // classes never match '/'; nor a leading '.' at a component start
          // (the component-level (?!\.) already covers the guarded case)
          val guard = if (componentStart && !dotGuarded) "(?![/.])" else "(?!/)"
          sb.append(guard).append('[')
          if (negated) sb.append('^')
          sb.append(escaped).append(']')
          i = j + 1
          componentStart = false
        case '/' =>
          sb.append('/')
          i += 1
          componentStart = true
        case c =>
          if ("\\^$.|?*+()[]{}".indexOf(c) >= 0) sb.append('\\')
          sb.append(c)
          i += 1
          componentStart = false
      }
    }
    sb.append('$')
    Right(sb.toString)
  }
}

/** Mirrors the reference's `InvalidNamespaceGlob` error
  * (flo-server/src/engine/connection_handler/consumer/mod.rs:111-118). */
final class InvalidNamespaceGlob(val pattern: String, message: String)
    extends IllegalArgumentException(s"Invalid namespace pattern `$pattern`: $message")

/**
 * The consume-side filter: `/&#42;&#42;/&#42;` (and `&#42;&#42;/&#42;`) short-circuits to match-all,
 * anything else compiles a glob (reference: event_reader/mod.rs:27-34).
 */
sealed trait EventFilter {
  def matches(namespace: String): Boolean
}
object EventFilter {
  case object All extends EventFilter {
    def matches(namespace: String): Boolean = true
  }
  final case class Glob(glob: NamespaceGlob) extends EventFilter {
    def matches(namespace: String): Boolean = glob.matches(namespace)
  }
  def parse(pattern: String): Either[String, EventFilter] =
    if (pattern == "/**/*" || pattern == "**/*") Right(All)
    else NamespaceGlob.compile(pattern).map(Glob(_))
  def parseOrThrow(pattern: String): EventFilter =
    parse(pattern).fold(err => throw new InvalidNamespaceGlob(pattern, err), identity)
}

package graft.model

import org.scalatest.funsuite.AnyFunSuite

/**
 * Property test (SURVEY §5.2): the regex-compiled matcher vs an independent
 * model implementation of the reference's glob semantics (Rust `glob` crate
 * `matches_with` under case_sensitive + require_literal_separator +
 * require_literal_leading_dot). The model is a direct backtracking matcher —
 * any disagreement exposes a bug in the glob→regex translation.
 */
class GlobPropertySpec extends AnyFunSuite {

  // ---- model matcher -------------------------------------------------

  private sealed trait Tok
  private case class Lit(c: Char) extends Tok
  private case object Q extends Tok
  private case object Star extends Tok
  private case object StarStarMid extends Tok // "**/" incl. its trailing slash
  private case object StarStarEnd extends Tok // terminal "/**" or bare "**"
  private case class Cls(neg: Boolean, cs: Set[Char]) extends Tok

  private def parse(pat: String): List[Tok] = {
    val out = List.newBuilder[Tok]
    var i = 0
    while (i < pat.length) {
      pat(i) match {
        case '*' if i + 1 < pat.length && pat(i + 1) == '*' =>
          if (i + 2 < pat.length && pat(i + 2) == '/') { out += StarStarMid; i += 3 }
          else { out += StarStarEnd; i += 2 }
        case '*' => out += Star; i += 1
        case '?' => out += Q; i += 1
        case '[' =>
          var j = i + 1
          val neg = pat(j) == '!'
          if (neg) j += 1
          val start = j
          if (pat(j) == ']') j += 1
          while (pat(j) != ']') j += 1
          out += Cls(neg, pat.substring(start, j).toSet)
          i = j + 1
        case c => out += Lit(c); i += 1
      }
    }
    out.result()
  }

  private def modelMatch(pat: String, path: String): Boolean = {
    val toks = parse(pat)
    val n = path.length
    def compStart(si: Int): Boolean = si == 0 || path(si - 1) == '/'
    // can a wildcard consume path(si)? never '/', nor '.' at component start
    def wildOk(si: Int): Boolean =
      path(si) != '/' && !(path(si) == '.' && compStart(si))

    def go(ts: List[Tok], si: Int): Boolean = ts match {
      case Nil => si == n
      case Lit(c) :: rest => si < n && path(si) == c && go(rest, si + 1)
      case Q :: rest => si < n && wildOk(si) && go(rest, si + 1)
      case Cls(neg, cs) :: rest =>
        si < n && wildOk(si) && (cs.contains(path(si)) != neg) && go(rest, si + 1)
      case Star :: rest =>
        // consume 0..k non-'/' chars; a consumed first char respects the dot rule
        var k = si
        if (go(rest, si)) return true
        while (k < n && path(k) != '/' && !(path(k) == '.' && compStart(k))) {
          // chars after the first inside the same run may be dots (not comp start)
          k += 1
          if (go(rest, k)) return true
        }
        false
      case StarStarMid :: rest =>
        // zero or more WHOLE components (each not starting with '.'), then rest
        if (go(rest, si)) return true
        var k = si
        while (k < n) {
          // advance over one component + '/'
          if (path(k) == '.' && compStart(k)) return false
          while (k < n && path(k) != '/') k += 1
          if (k < n) { k += 1; if (go(rest, k)) return true }
        }
        false
      case StarStarEnd :: rest =>
        // everything below: remaining components must not start with '.'
        rest == Nil && {
          var k = si
          var ok = true
          while (k < n && ok) {
            if (path(k) == '.' && compStart(k)) ok = false
            k += 1
          }
          ok
        }
    }
    go(toks, 0)
  }

  // ---- generators ----------------------------------------------------

  private val rnd = new scala.util.Random(2026)

  private def randSegmentAtom(): String = rnd.nextInt(8) match {
    case 0 => "a"
    case 1 => "b"
    case 2 => "."
    case 3 => "?"
    case 4 => "*"
    case 5 => "[ab]"
    case 6 => "[!a]"
    case 7 => "c"
  }

  private def randPattern(): String = {
    val segs = (0 until 1 + rnd.nextInt(4)).map { _ =>
      if (rnd.nextInt(5) == 0) "**"
      else (0 until 1 + rnd.nextInt(3)).map(_ => randSegmentAtom()).mkString
    }
    val p = segs.mkString("/")
    if (rnd.nextBoolean()) "/" + p else p
  }

  private def randPath(): String = {
    val segs = (0 until 1 + rnd.nextInt(4)).map { _ =>
      (0 until rnd.nextInt(4)).map(_ => "ab.c".charAt(rnd.nextInt(4))).mkString
    }
    val p = segs.mkString("/")
    if (rnd.nextBoolean()) "/" + p else p
  }

  test("regex matcher agrees with the model on 20k random (pattern, path) pairs") {
    var checked = 0
    var skippedInvalid = 0
    (1 to 20000).foreach { _ =>
      val pat = randPattern()
      val path = randPath()
      NamespaceGlob.compile(pat) match {
        case Left(_) => skippedInvalid += 1 // generator can emit e.g. "**" adjacency
        case Right(g) =>
          val got = g.matches(path)
          val want = modelMatch(pat, path)
          assert(got == want,
            s"pattern `$pat` vs path `$path`: regex=$got model=$want rx=${g.regex}")
          checked += 1
      }
    }
    assert(checked > 15000, s"too few valid cases: $checked (skipped $skippedInvalid)")
  }

  test("model agrees with the reference's own test corpus") {
    // sanity-check the MODEL itself against namespace.rs facts
    assert(modelMatch("/*suffix", "/foo_suffix"))
    assert(modelMatch("/*suffix", "/suffix"))
    assert(!modelMatch("/*suffix", "/foo/suffix"))
    assert(modelMatch("/root/**/*suffix", "/root/baz-suffix"))
    assert(modelMatch("/foo/**/bar", "/foo/bar"))
    assert(!modelMatch("/foo/**/bar", "/foo/barrrrrrrr"))
    assert(modelMatch("/*", "/foo"))
    assert(!modelMatch("/*", "/foo/bar"))
    assert(!modelMatch("/this", "/that"))
    assert(!modelMatch("/*", "/.hidden"))
  }
}

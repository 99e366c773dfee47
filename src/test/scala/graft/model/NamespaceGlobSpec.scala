package graft.model

import org.scalatest.funsuite.AnyFunSuite

/**
 * Behavioral spec for the namespace glob matcher, lifted from the reference's
 * tests (flo-server/src/engine/event_stream/partition/event_reader/namespace.rs:30-101)
 * plus the client-routing cases (flo-server/tests/sync_client_tests.rs:179-206,
 * flo-server/tests/embedded_tests.rs:222-251).
 */
class NamespaceGlobSpec extends AnyFunSuite {

  private def glob(p: String): NamespaceGlob =
    NamespaceGlob.compile(p).fold(e => fail(s"pattern `$p` failed to compile: $e"), identity)

  private def assertMatches(p: String, ns: String): Unit =
    assert(glob(p).matches(ns), s"`$p` should match `$ns` [rx=${glob(p).regex}]")
  private def assertNotMatches(p: String, ns: String): Unit =
    assert(!glob(p).matches(ns), s"`$p` should NOT match `$ns` [rx=${glob(p).regex}]")

  test("invalid glob syntax returns an error (namespace.rs:39-44)") {
    assert(NamespaceGlob.compile("/***").isLeft)
    assert(NamespaceGlob.compile("/**foo").isLeft)
    assert(NamespaceGlob.compile("/foo**").isLeft)
    assert(NamespaceGlob.compile("/foo[unclosed").isLeft)
    intercept[InvalidNamespaceGlob](NamespaceGlob.compileOrThrow("/***"))
  }

  test("globbing in subdirectories (namespace.rs:46-67)") {
    assertMatches("/*suffix", "/foo_suffix")
    assertMatches("/*suffix", "/suffix")
    assertNotMatches("/*suffix", "/suffixPlusMore")
    assertNotMatches("/*suffix", "/foo/suffix")

    assertMatches("/root/**/*suffix", "/root/foo/bar/baz-suffix")
    assertMatches("/root/**/*suffix", "/root/baz-suffix")

    assertMatches("/root/**/foo/bar*", "/root/foo/barista")
    assertMatches("/root/**/foo/bar*", "/root/this/that/foo/baritone")
    assertMatches("/root/**/foo/bar*", "/root/foo/foo/bar")
    assertNotMatches("/root/**/foo/bar*", "/root/foo/goo")
    assertNotMatches("/root/**/foo/bar*", "/root/bar")
    assertNotMatches("/root/**/foo/bar*", "/foo/barrel")
  }

  test("double star matches any number of subdirectories (namespace.rs:69-78)") {
    assertMatches("/foo/**/bar", "/foo/bar")
    assertMatches("/foo/**/bar", "/foo/baz/bar")
    assertMatches("/foo/**/bar", "/foo/this/that/the_other/bar")
    assertNotMatches("/foo/**/bar", "/foo/barrrrrrrr")
    assertNotMatches("/foo/**/bar", "/foo")
  }

  test("slash star matches all top-level namespaces (namespace.rs:80-87)") {
    assertMatches("/*", "/foo")
    assertMatches("/*", "/bar")
    assertNotMatches("/*", "/foo/bar")
  }

  test("no metacharacters = literal self-match only (namespace.rs:89-100)") {
    assertNotMatches("/this", "/that")
    assertMatches("/test/namespace", "/test/namespace")
    assertNotMatches("/meals/breakfast", "/meals/breakfast/foods/bacon")
  }

  test("client glob routing fixture (sync_client_tests.rs:179-206)") {
    val all = Seq(
      "/meals", "/meals/breakfast", "/meals/breakfast/foods/bacon",
      "/meals/breakfast/foods/eggs", "/meals/breakfast/drinks/coffee",
      "/meals/lunch", "/meals/lunch/foods/hamburgers", "/meals/lunch/drinks/soda")
    def matching(p: String): Seq[String] = all.filter(glob(p).matches)
    assert(matching("/meals/breakfast/foods/*") ==
      Seq("/meals/breakfast/foods/bacon", "/meals/breakfast/foods/eggs"))
    assert(matching("/**/drinks/*") ==
      Seq("/meals/breakfast/drinks/coffee", "/meals/lunch/drinks/soda"))
    assert(matching("/meals/breakfast") == Seq("/meals/breakfast"))
  }

  test("mid-path glob fixture (embedded_tests.rs:228-249)") {
    val all = Seq("/foo", "/bar", "/foo/bar/baz", "/foo/bar", "/who/bar/qux")
    assert(all.filter(glob("/**/bar/*").matches) == Seq("/foo/bar/baz", "/who/bar/qux"))
  }

  test("character classes") {
    assertMatches("/ev[ae]nts", "/events")
    assertMatches("/ev[ae]nts", "/evants")
    assertNotMatches("/ev[ae]nts", "/evints")
    assertMatches("/e[a-z]ents", "/events")
    assertNotMatches("/e[!v]ents", "/events")
    assertMatches("/e[!x]ents", "/events")
    // classes never match the separator
    assertNotMatches("/a[/]b", "/a/b")
  }

  test("question mark matches one non-separator char") {
    assertMatches("/foo?", "/fooX")
    assertNotMatches("/foo?", "/foo/")
    assertNotMatches("/foo?", "/foo")
  }

  test("require_literal_leading_dot: wildcards do not match a leading dot") {
    assertNotMatches("/*", "/.hidden")
    assertMatches("/.hidden", "/.hidden")
    assertNotMatches("/?oo", "/.oo")
  }

  test("EventFilter: /**/* short-circuits to match-all (event_reader/mod.rs:27-34)") {
    assert(EventFilter.parse("/**/*") == Right(EventFilter.All))
    assert(EventFilter.parse("**/*") == Right(EventFilter.All))
    assert(EventFilter.parseOrThrow("/**/*").matches("literally anything"))
    assert(EventFilter.parse("/meals/*").isRight)
    assert(EventFilter.parse("/***").isLeft)
    intercept[InvalidNamespaceGlob](EventFilter.parseOrThrow("/foo**"))
  }

  test("trailing /** matches everything below") {
    assertMatches("/foo/**", "/foo/bar")
    assertMatches("/foo/**", "/foo/bar/baz")
    // the Rust glob crate also lets a trailing `/**` match the bare prefix path
    // component boundary case: /foo/** does not match /foobar
    assertNotMatches("/foo/**", "/foobar")
  }

  test("isLiteral detects metacharacter-free patterns") {
    assert(NamespaceGlob.isLiteral("/meals/breakfast"))
    assert(!NamespaceGlob.isLiteral("/meals/*"))
    assert(!NamespaceGlob.isLiteral("/meals/ev[ae]nt"))
    assert(!NamespaceGlob.isLiteral("/meals/x?"))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.{Blake2s, CanonicalUrl, GraftFunctions}

class ExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // RFC 7693 / official BLAKE2 test vectors (unkeyed blake2s-256).
  test("blake2s matches public test vectors") {
    assert(Blake2s.toHex(Blake2s.digest("abc".getBytes, Array.empty, 32)) ==
      "508c5e8c327c14e2e1a72ba34eeb452f37458b209ed63a294d999b4c86675982")
    assert(Blake2s.toHex(Blake2s.digest(Array.empty, Array.empty, 32)) ==
      "69217a3079908094e11121d042354a7c1f55b6482ca1a51e1b250dfd1ed0eef9")
  }

  test("blake2s keyed/truncated digests are deterministic and distinct") {
    val d1 = Blake2s.toHex(Blake2s.digest("x".getBytes, "salt".getBytes, 20))
    val d2 = Blake2s.toHex(Blake2s.digest("x".getBytes, "salt".getBytes, 20))
    val d3 = Blake2s.toHex(Blake2s.digest("x".getBytes, "other".getBytes, 20))
    val d4 = Blake2s.toHex(Blake2s.digest("x".getBytes, Array.empty, 20))
    assert(d1 == d2 && d1.length == 40)
    assert(d1 != d3 && d1 != d4)
    // truncated-output digest differs from a truncation of the full one
    // (outLen is part of the parameter block)
    val full = Blake2s.toHex(Blake2s.digest("x".getBytes, Array.empty, 32))
    assert(!full.startsWith(d4))
  }

  test("blake2s column expression evaluates in a plan (codegen path)") {
    val df = Seq("abc", "", "graft").toDF("s")
      .select(GraftFunctions.blake2s(col("s"), 32).as("h"))
    val got = df.collect().map(_.getString(0))
    assert(got(0) ==
      "508c5e8c327c14e2e1a72ba34eeb452f37458b209ed63a294d999b4c86675982")
    assert(got(1) ==
      "69217a3079908094e11121d042354a7c1f55b6482ca1a51e1b250dfd1ed0eef9")
    assert(got(2).length == 64)
  }

  test("event key v2 is 40 hex and identity prefers token_ca") {
    val df = Seq(
      ("listing", Some("PEPE"), Some("0xabc"), "eth"),
      ("listing", Some("PEPE"), None, "eth")
    ).toDF("typ", "symbol", "token_ca", "chain")
      .select(graft.functions.KeyFunctions.eventKeyV2(
        col("typ"), col("symbol"), col("token_ca"), col("chain"),
        lit("t0"), lit("sig"), lit(1700000000L), salt = "s").as("k"))
    val keys = df.collect().map(_.getString(0))
    assert(keys.forall(k => k.matches("[0-9a-f]{40}")))
    assert(keys(0) != keys(1), "CA identity must differ from symbol|chain identity")
  }

  test("entity norm kernel: first-k, synonyms, stops, ordered dedup") {
    val got = Seq(
      "The Spark JOIN dup spark rest beyond the window limit",
      "", "a the a")
      .toDF("s")
      .select(graft.expressions.ShingleFunctions.entityNorm(col("s"),
        Seq("spark" -> "apache", "join" -> "merge", "dup" -> "duplicate"),
        Seq("the", "a"), k = 8).as("e"))
      .collect().map(_.getString(0))
    // first 8 tokens: the spark join dup spark rest beyond the →
    // mapped: the apache merge duplicate apache rest beyond the →
    // stops out, ordered dedup: apache merge duplicate rest beyond
    assert(got(0) == "apache,merge,duplicate,rest,beyond")
    assert(got(1) == "")
    assert(got(2) == "")
  }

  test("nfc normalize composes decomposed unicode") {
    val decomposed = "éclair" // e + combining acute
    val df = Seq(decomposed).toDF("s")
      .select(GraftFunctions.nfcNormalize(col("s")).as("n"))
    assert(df.head.getString(0) == "éclair")
  }

  test("py6g matches Python/C %.6g on ties, exponents, and zeros") {
    import graft.expressions.PyG6Format.fmt
    // expected strings generated with CPython f"{v:.6g}"
    val cases = Seq(
      0.0 -> "0", 150.0 -> "150", 19591.25 -> "19591.2", // half-even tie
      0.099 -> "0.099", 1e7 -> "1e+07", 8123456.25 -> "8.12346e+06",
      0.000123456 -> "0.000123456", -47.35 -> "-47.35",
      999999.5 -> "1e+06", // rounds up INTO scientific range
      1234567.0 -> "1.23457e+06", 0.25 -> "0.25", 1e-5 -> "1e-05",
      3.14159265 -> "3.14159", -0.7 -> "-0.7", 2.5e-7 -> "2.5e-07",
      123456.0 -> "123456")
    cases.foreach { case (v, want) =>
      assert(fmt(v) == want, s"fmt($v) = ${fmt(v)}, want $want")
    }
  }

  test("canonical url: scheme upgrade, host case, tracking params, sort") {
    // :80 is KEPT — the reference upgrades http→https BEFORE checking
    // default ports, so (https, 80) is not a default pair
    assert(CanonicalUrl.canonicalize(
      "HTTP://ExAmple.com:80/p?utm_source=x&b=2&a=1&ref=y#frag") ==
      "https://example.com:80/p?a=1&b=2")
    assert(CanonicalUrl.canonicalize("https://example.com:443/p") ==
      "https://example.com/p")
    assert(CanonicalUrl.canonicalize("https://example.com") ==
      "https://example.com/")
    // trailing slashes collapse on non-root paths; ref_src is tracking
    assert(CanonicalUrl.canonicalize(
      "https://Example.com/a/b///?ref_src=tw&z=1") ==
      "https://example.com/a/b?z=1")
    // non-http schemes are preserved (lowercased), not rejected
    assert(CanonicalUrl.canonicalize("FTP://Files.Example.com/x") ==
      "ftp://files.example.com/x")
    assert(CanonicalUrl.canonicalize("https://MÜNCHEN.de/p") ==
      "https://xn--mnchen-3ya.de/p")
    // schemeless input follows urlsplit/urlunsplit: the host lands in
    // the path and https (a uses_netloc scheme) renders '//' even with
    // an empty netloc — fuzz-verified against CPython (406 cases)
    assert(CanonicalUrl.canonicalize("example.com/path") ==
      "https:///example.com/path")
  }

  test("canonical url: unparseable input passes through unchanged") {
    // invalid port → parts.port raises → reference returns the input
    assert(CanonicalUrl.canonicalize("http://host.com:notaport/x") ==
      "http://host.com:notaport/x")
    assert(CanonicalUrl.canonicalize("http://[half-open/x") ==
      "http://[half-open/x")
  }

  test("top ngram: counts, lexicographic ties, short docs") {
    import graft.text.TextAnalysis
    val df = Seq(
      (1L, "a b a b a"), // "a b"×2 ties "b a"×2 → lexicographic first
      (2L, "x y x y x y z"), // "x y"×3 clear winner
      (3L, "solo"), // shorter than n=2
      (4L, "Go GO go run") // lowercased: "go go"×2
    ).toDF("doc_id", "text")
      .select(col("doc_id"),
        TextAnalysis.topNgram(col("text"), 2).as("g"))
      .select(col("doc_id"), col("g.gram"), col("g.cnt"))
    val got = df.collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(got(1L) == ("a b", 2))
    assert(got(2L) == ("x y", 3))
    assert(got(3L) == ("", 0))
    assert(got(4L) == ("go go", 2))
  }

  test("canonical url column handles null and empty") {
    val df = Seq(Some("example.com/a?utm_x=1"), Some(""), None).toDF("u")
      .select(GraftFunctions.canonicalUrl(col("u")).as("c"))
    val got = df.collect().map(r => Option(r.getString(0)))
    assert(got(0).contains("https:///example.com/a"))
    assert(got(1).isEmpty)
    assert(got(2).isEmpty)
  }
}

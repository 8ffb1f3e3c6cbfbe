package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.UrlCanon

class UrlCanonSpec extends AnyFunSuite with SparkSpec {

  private val cases = Seq(
    // scheme + host case, default port
    "HTTP://Example.COM:80/a" -> "http://example.com/a",
    "https://Host.net:443/x" -> "https://host.net/x",
    "https://host.net:8443/x" -> "https://host.net:8443/x",
    // fragment always drops; empty path gains /
    "http://a.com#frag" -> "http://a.com/",
    "http://a.com/p#s" -> "http://a.com/p",
    "http://a.com?q=1#s" -> "http://a.com/?q=1",
    // dot segments
    "http://a.com/a/./b" -> "http://a.com/a/b",
    "http://a.com/a/../b" -> "http://a.com/b",
    "http://a.com/a/b/.." -> "http://a.com/a/",
    "http://a.com/a/b/../" -> "http://a.com/a/",
    "http://a.com/../a" -> "http://a.com/a",
    "http://a.com/a/." -> "http://a.com/a/",
    // duplicate slashes and userinfo preserved
    "http://a.com/a//b" -> "http://a.com/a//b",
    "http://u:p@A.com/x" -> "http://u:p@a.com/x",
    // percent normalization: hex uppercased, unreserved decoded,
    // malformed untouched; query normalized, order kept
    "http://a.com/%7euser/%2fx" -> "http://a.com/~user/%2Fx",
    "http://a.com/%41sset" -> "http://a.com/Asset",
    "http://a.com/100%" -> "http://a.com/100%",
    "http://a.com/a%2" -> "http://a.com/a%2",
    "http://a.com/p?b=%7e&a=%20" -> "http://a.com/p?b=~&a=%20",
    // IPv6 literal: bracket-aware port split
    "http://[2001:DB8::1]:80/x" -> "http://[2001:db8::1]/x",
    "http://[2001:DB8::1]:8080/x" -> "http://[2001:db8::1]:8080/x",
    // not a URL -> pass through unchanged
    "no scheme here" -> "no scheme here",
    "mailto:a@b.c" -> "mailto:a@b.c",
    "://x" -> "://x")

  test("canonicalization table") {
    cases.foreach { case (in, want) =>
      assert(UrlCanon.canonicalize(in) == want, s"input: $in")
    }
  }

  test("idempotent: canonical forms are fixed points") {
    cases.foreach { case (in, want) =>
      assert(UrlCanon.canonicalize(want) == want, s"fixed point: $want")
    }
  }

  test("interpreted and codegen paths agree with the driver-side walk") {
    import spark.implicits._
    val d = cases.map(_._1).zipWithIndex
      .map { case (u, i) => (i.toLong, u) }.toDF("id", "url")
      // repartition defeats local-relation constant folding so the
      // expression actually runs in each mode
      .repartition(2)
    def run(mode: String): Map[Long, String] = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try d.select(col("id"),
          graft.text.TextOps.canonicalizeUrl(col("url")).as("c"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val cg = run("CODEGEN_ONLY")
    val interp = run("NO_CODEGEN")
    assert(cg == interp)
    cases.zipWithIndex.foreach { case ((_, want), i) =>
      assert(cg(i.toLong) == want)
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextNorm

/** Semantics pins for the `graft_textnorm` NFC + lowercase kernel. */
class TextNormSpec extends AnyFunSuite with SparkSpec {

  private val acute = "\u0301" // combining acute accent

  private val cases = Seq(
    // ASCII fast paths
    "already lower ascii" -> "already lower ascii",
    "MiXeD Case ASCII" -> "mixed case ascii",
    "" -> "",
    // decomposed -> composed (NFC), then lowered
    ("E" + acute) -> "\u00e9",          // E + acute -> E-acute -> e-acute
    ("e" + acute) -> "\u00e9",          // e + acute -> e-acute
    ("Cafe" + acute) -> "caf\u00e9",    // Cafe spelled decomposed
    // precomposed input is a fixed point (modulo case)
    "\u00c9" -> "\u00e9",               // precomposed E-acute lowers
    "caf\u00e9" -> "caf\u00e9",
    // no precomposed form exists: NFC keeps the mark, lowercase the base
    ("Q" + acute) -> ("q" + acute),
    // multiple marks and non-Latin passthrough
    ("A" + acute + "B") -> ("\u00e1b"),
    "\u4e2d\u6587 OK" -> "\u4e2d\u6587 ok")

  test("normalization table (driver-side kernel walk)") {
    cases.foreach { case (in, want) =>
      assert(TextNorm.normalize(in) == want,
        s"input: ${in.map(c => f"U+${c.toInt}%04X").mkString(" ")}")
    }
  }

  test("both spelling families land on one key (the dedup motivation)") {
    val precomposed = "r\u00e9sum\u00e9 CAF\u00c9"
    val decomposed = "re" + acute + "sume" + acute + " CAFE" + acute
    assert(TextNorm.normalize(precomposed) == TextNorm.normalize(decomposed))
  }

  test("idempotent: normal forms are fixed points") {
    cases.foreach { case (_, want) =>
      assert(TextNorm.normalize(want) == want, s"fixed point: $want")
    }
  }

  test("interpreted and codegen paths agree with the driver-side walk") {
    import spark.implicits._
    val d = cases.map(_._1).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
      .repartition(2) // defeat local-relation constant folding
    def run(mode: String): Map[Long, String] = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try d.select(col("id"),
          graft.text.TextOps.normalizeText(col("t")).as("n"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val cg = run("CODEGEN_ONLY")
    val interp = run("NO_CODEGEN")
    assert(cg == interp)
    cases.zipWithIndex.foreach { case ((_, want), i) =>
      assert(cg(i.toLong) == want, s"case $i")
    }
  }

  test("nulls propagate") {
    import spark.implicits._
    val d = Seq((1L, Option("A")), (2L, Option.empty[String]))
      .toDF("id", "t").repartition(2)
    val got = d.select(col("id"),
        graft.text.TextOps.normalizeText(col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got === Map(1L -> Some("a"), 2L -> None))
  }
}

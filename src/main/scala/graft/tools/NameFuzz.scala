package graft.tools

import graft.functions.NameCleaner

/** Dev probe: hunt totality violations in the name-cleaning heuristics
  * (found by PropertySpec's ScalaCheck run going red on a rare Unicode
  * input — this sweeps the whole BMP deterministically instead of waiting
  * for a lucky seed). Checks the PropertySpec invariants: cleanName
  * returns trimmed non-null, shortName non-null. */
object NameFuzz {
  def main(a: Array[String]): Unit = {
    var bad = 0
    def probe(s: String, what: String): Unit = {
      val r = NameCleaner.cleanName(s)
      if (r == null || r != r.trim) {
        bad += 1
        if (bad <= 20) println(s"VIOLATION [$what] in=${s.map(c => f"\\u${c.toInt}%04x").mkString} out=${Option(r).map(_.map(c => f"\\u${c.toInt}%04x").mkString)}")
      }
    }
    (Char.MinValue to Char.MaxValue).filterNot(c => Character.isSurrogate(c.toChar)).foreach { ci =>
      val c = ci.toChar
      probe(c.toString, "single")
      probe(s"x$c", "suffix")
      probe(s"${c}x", "prefix")
      probe(s"x${c}y", "infix")
      probe(s"x $c", "space-suffix")
    }
    println(s"violations: $bad")
  }
}

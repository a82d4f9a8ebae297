package graft

/** Dev harness: compare CanonicalUrl against expected values generated
  * by a Python-stdlib urlsplit reimplementation of the reference
  * semantics (see /tmp/url_cases.json producer).
  */
object UrlFuzz {
  def main(args: Array[String]): Unit = {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/tmp/url_cases.json")), "UTF-8")
    // minimal JSON parse: [[input, expected|null], ...]
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(txt)
    var bad = 0
    (0 until root.size()).foreach { i =>
      val in = root.get(i).get(0).asText()
      val want = if (root.get(i).get(1).isNull) null else root.get(i).get(1).asText()
      val got = graft.expressions.CanonicalUrl.canonicalize(in)
      if (got != want) {
        bad += 1
        if (bad <= 12) println(s"MISMATCH in=[$in]\n  want=[$want]\n  got =[$got]")
      }
    }
    println(s"checked ${root.size()} cases, $bad mismatches")
  }
}

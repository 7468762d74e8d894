package graft

/** Classpath loader for checked-in golden files (r16 advice): specs READ
  * goldens from the test classpath so they survive forked test runs with
  * a different working directory; the `-Dgraft.test.writeGolden=1`
  * regeneration branches keep writing to the source tree by CWD-relative
  * path (regeneration is a deliberate repo-root action). */
object GoldenResource {
  def read(resource: String): String = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"golden resource $resource not on the test classpath " +
      "— regenerate it with -Dgraft.test.writeGolden=1 and recompile")
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8).trim
    finally in.close()
  }
}

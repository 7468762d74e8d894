package graft

/** Classpath loader for checked-in golden files (r16 advice): specs READ
  * goldens from the test classpath so they survive forked test runs with
  * a different working directory; the `-Dgraft.test.writeGolden=1`
  * regeneration branches go through [[write]], which writes the source
  * tree by CWD-relative path (regeneration is a deliberate repo-root
  * action) AND refreshes the live test-classpath copy (r17 advice: the
  * old regen branch wrote only the source tree, so a same-sbt-session
  * re-run compared against the stale classpath resource and failed
  * confusingly until a recompile re-copied resources). */
object GoldenResource {
  def read(resource: String): String = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"golden resource $resource not on the test classpath " +
      "— regenerate it with -Dgraft.test.writeGolden=1 and recompile")
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8).trim
    finally in.close()
  }

  /** Regenerate a golden: write `content` to the source-tree path (the
    * checked-in copy) and, when the running classpath is directory-backed
    * (sbt's test-classes — always, in this repo's forked test JVMs),
    * refresh the classpath copy too so the next read in the SAME session
    * sees the fresh golden without an intervening `Test/copyResources`. */
  def write(resource: String, sourcePath: String, content: String): Unit = {
    val src = java.nio.file.Paths.get(sourcePath)
    if (src.getParent != null) java.nio.file.Files.createDirectories(src.getParent)
    java.nio.file.Files.writeString(src, content)
    val onCp = Option(getClass.getResource(resource))
      .orElse(Option(getClass.getResource("/")).map(root =>
        new java.net.URI(root.toString.stripSuffix("/") + resource).toURL))
    onCp.filter(_.getProtocol == "file").foreach { url =>
      val p = java.nio.file.Paths.get(url.toURI)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, content)
    }
  }
}

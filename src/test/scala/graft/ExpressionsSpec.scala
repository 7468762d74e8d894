package graft

import org.apache.spark.sql.functions._

import graft.expressions.HashExpressions
import graft.functions.TextAnalysis
import graft.functions.TextAnalysis._

/** Native sketch expressions: differential-tested against the pure
  * `functions._` formulations they replace, plus the SQL registration. */
class ExpressionsSpec extends SparkSpec {

  test("MinHashSignatureExpr equals the higher-order-function formulation") {
    val docs = Tables.documents(spark, sfDir).limit(200)
    val both = docs.select(col("doc_id"), wordShingles(col("text"), 3).as("sh"))
      .select(col("doc_id"),
        HashExpressions.minhashSignature(col("sh"), 12).as("native"),
        minhashSignature(col("sh"), 12).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
    assert(both.count() === 200)
  }

  test("SimHashExpr equals the vote-sum formulation, including empty input") {
    val docs = Tables.documents(spark, sfDir).limit(200)
    val both = docs.select(tokens(col("text")).as("toks"))
      .select(
        HashExpressions.simhash64(col("toks"), 16).as("native"),
        simhash(col("toks"), 16).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
    import spark.implicits._
    val empty = Seq("").toDF("t")
      .select(HashExpressions.simhash64(tokens(col("t")), 16).as("fp"))
    assert(empty.head().getLong(0) === 0L)
  }

  test("vector_dot == the aggregate(zip_with(...)) reference, bit-identical doubles") {
    // the native codegen'd dot product must reproduce the interpreted HOF
    // formulation it replaced EXACTLY — same index-order double
    // accumulation, so the same rounding — on real embeddings, float and
    // double element types alike. java.lang.Double.compare-level equality
    // (collect as Double bits), not approximate.
    import org.apache.spark.sql.types.DoubleType
    val emb = Tables.embeddings(spark, sfDir).limit(200)
    def hofDot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast(DoubleType) * q.cast(DoubleType)),
        lit(0.0), (acc, v) => acc + v)
    val pairs = emb.select(col("vec_id"), col("embedding").as("a"))
      .crossJoin(emb.limit(7).select(col("embedding").as("b"),
        transform(col("embedding"), e => e.cast(DoubleType)).as("bd")))
    val got = pairs.select(col("vec_id"),
        graft.expressions.VectorExpressions.dot(col("a"), col("b")).as("nat_ff"),
        hofDot(col("a"), col("b")).as("ref_ff"),
        graft.expressions.VectorExpressions.dot(col("a"), col("bd")).as("nat_fd"),
        hofDot(col("a"), col("bd")).as("ref_fd"))
      .collect()
    assert(got.length === 200 * 7)
    got.foreach { r =>
      assert(java.lang.Double.compare(r.getDouble(1), r.getDouble(2)) === 0,
        s"float/float dot diverged for vec ${r.getLong(0)}: ${r.getDouble(1)} vs ${r.getDouble(2)}")
      assert(java.lang.Double.compare(r.getDouble(3), r.getDouble(4)) === 0,
        s"float/double dot diverged for vec ${r.getLong(0)}: ${r.getDouble(3)} vs ${r.getDouble(4)}")
    }
    // length mismatch fails loudly (the HOF form returned a silent null)
    import spark.implicits._
    val bad = Seq((Array(1.0f, 2.0f), Array(1.0f))).toDF("a", "b")
    val e = intercept[Exception](
      bad.select(graft.expressions.VectorExpressions.dot(col("a"), col("b"))).head())
    assert(e.getMessage != null)
  }

  test("word_ngrams == the transform/slice/array_join reference, raw and distinct") {
    // the native shingling kernel must reproduce the HOF formulation it
    // replaced exactly — order included (array_distinct keeps first
    // occurrence; so does the native LinkedHashSet) — on real documents
    // plus the short-document and empty edge cases.
    def hofRaw(ts: org.apache.spark.sql.Column, n: Int) =
      when(size(ts) < n, array(array_join(ts, " ")))
        .otherwise(transform(
          sequence(lit(1), size(ts) - (n - 1)),
          i => array_join(slice(ts, i, lit(n)), " ")))
    val docs = Tables.documents(spark, sfDir)
    val toks = docs.select(col("doc_id"), tokens(col("text")).as("ts"))
    for (n <- Seq(2, 3, 7)) {
      val diff = toks.select(
          hofRaw(col("ts"), n).as("h"),
          graft.expressions.VectorExpressions.wordNgrams(col("ts"), n, distinct = false).as("nr"),
          array_distinct(hofRaw(col("ts"), n)).as("hd"),
          graft.expressions.VectorExpressions.wordNgrams(col("ts"), n, distinct = true).as("nd"))
        .filter(col("h") =!= col("nr") || col("hd") =!= col("nd")).count()
      assert(diff === 0, s"n=$n diverged from the HOF reference")
    }
    import spark.implicits._
    val edge = Seq("", "one", "two words", "a a a a a").toDF("t")
      .select(tokens(col("t")).as("ts"))
      .select(
        hofRaw(col("ts"), 3).as("h"),
        graft.expressions.VectorExpressions.wordNgrams(col("ts"), 3, distinct = false).as("nr"),
        array_distinct(hofRaw(col("ts"), 3)).as("hd"),
        graft.expressions.VectorExpressions.wordNgrams(col("ts"), 3, distinct = true).as("nd"))
      .collect()
    edge.foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1))
      assert(r.getSeq[String](2) === r.getSeq[String](3))
    }
  }

  test("stopword_hits == the size(filter(...)) reference on real documents") {
    // the native containment count must equal the HOF filter formulation
    // token-for-token (binary string equality both ways) for every
    // language list — langPredict's argmax rides on these counts
    val docs = Tables.documents(spark, sfDir)
    val toks = docs.select(col("doc_id"), tokens(col("text")).as("ts"))
    TextAnalysis.stopwords.foreach { case (lang, sw) =>
      val diff = toks.select(
          size(filter(col("ts"), t => sw.map(w => t === w).reduce(_ || _))).as("h"),
          graft.expressions.VectorExpressions.stopwordHits(col("ts"), sw).as("n"))
        .filter(col("h") =!= col("n")).count()
      assert(diff === 0, s"$lang diverged from the HOF reference")
    }
    // empty token array counts zero
    import spark.implicits._
    val z = Seq("").toDF("t").select(
      graft.expressions.VectorExpressions.stopwordHits(tokens(col("t")),
        TextAnalysis.stopwords("en")))
    assert(z.head().getInt(0) === 0)
  }

  test("tokenize == the lower/regex/split/filter reference: corpus, edges, unicode fuzz") {
    // every MinHash hash and every text operator rides on these exact
    // token strings — the native tokenizer must match the five-pass
    // reference chain byte-for-byte on anything a corpus can contain
    def hofTokens(c: org.apache.spark.sql.Column) =
      filter(split(trim(regexp_replace(lower(c), "\\s+", " ")), " "), t => t =!= "")
    val native = graft.expressions.VectorExpressions.tokenize _
    // 1) the full real corpus
    val docs = Tables.documents(spark, sfDir)
    assert(docs.select(hofTokens(col("text")).as("h"), native(col("text")).as("n"))
      .filter(col("h") =!= col("n")).count() === 0, "corpus diverged")
    // 2) adversarial edges: unicode spaces stay IN tokens (java \s is
    //    ASCII), Greek final sigma (context-sensitive lowercase), Turkish
    //    dotted I, Vietnamese diacritics, every \s byte, astral plane
    import spark.implicits._
    val edges = Seq("", " ", "   ", "\t\r\n", "a", " a ", "a  b",
      "A B", " ", "ΣΟΦΟΣ ΟΔΥΣΣΕΥΣ ΑΣ", "İstanbul I ı İ",
      "ĐẸP ĐẼ đẹp", "ẨM THỰC VIỆT", "𝔘nicode 𝒜stral", "ＦＵＬＬ　ＷＩＤＴＨ",
      "a\tb\rc\ndef", "ß STRASSE", "ǅungla ǆep")
    val edgeDiff = edges.toDF("t")
      .select(hofTokens(col("t")).as("h"), native(col("t")).as("n"))
      .filter(col("h") =!= col("n")).count()
    assert(edgeDiff === 0, "edge strings diverged")
    // 3) seeded fuzz: 500 strings mixing printable ASCII, BMP unicode and
    //    whitespace runs (deterministic — failures reproduce)
    val rnd = new scala.util.Random(20260814L)
    def fuzzString(): String = {
      val n = rnd.nextInt(40)
      (0 until n).map { _ =>
        rnd.nextInt(6) match {
          case 0 => (' ' + rnd.nextInt(95)).toChar // printable ASCII
          case 1 => "\t\n\r "(rnd.nextInt(6)) // \s bytes
          case 2 => "    　"(rnd.nextInt(5)) // unicode space (NOT \s)
          case 3 => ('À' + rnd.nextInt(0x1000)).toChar // BMP letters
          case 4 => "ΣσςİıßĐđẸẹ"(rnd.nextInt(10))
          case _ => ('a' + rnd.nextInt(26)).toChar
        }
      }.mkString
    }
    val fuzz = (0 until 500).map(_ => fuzzString())
    val fuzzDf = fuzz.toDF("t")
      .select(col("t"), hofTokens(col("t")).as("h"), native(col("t")).as("n"))
    val bad = fuzzDf.filter(col("h") =!= col("n")).select("t").collect()
    assert(bad.isEmpty, s"fuzz diverged on: ${bad.take(3).map(_.getString(0)).mkString("; ")}")
  }

  test("expressions are registered as SQL functions on a live session") {
    GraftSession.registerOn(spark)
    val r = spark.sql(
      "SELECT simhash64(array('a','b'), 16) fp, minhash_signature(array('a','b'), 4) sig")
      .head()
    assert(r.getSeq[String](1).length === 4)
    // the r10 vector/text kernels are on the SQL surface too
    val v = spark.sql(
      "SELECT vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) d, " +
        "word_ngrams(array('a','b','c'), 2) raw, " +
        "word_ngrams(array('a','b','a','b'), 2, true) dst").head()
    assert(v.getDouble(0) === 11.0)
    assert(v.getSeq[String](1) === Seq("a b", "b c"))
    assert(v.getSeq[String](2) === Seq("a b", "b a"))
    assert(spark.sql("SELECT tokenize('  Hello\\tWORLD  ')").head()
      .getSeq[String](0) === Seq("hello", "world"))
    // SQL surface agrees with the Column surface
    import spark.implicits._
    val viaCol = Seq(("a b")).toDF("t")
      .select(HashExpressions.simhash64(tokens(col("t")), 16)).head().getLong(0)
    val viaSql = spark.sql("SELECT simhash64(array('a','b'), 16)").head().getLong(0)
    assert(viaCol === viaSql)
  }
}

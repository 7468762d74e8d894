package graft.tools

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Dev probe: native [[graft.expressions.WordNgramsExpr]] vs the
  * `transform(sequence(...), i => array_join(slice(...)))` HOF
  * formulation of word-n-gram shingling — the per-document kernel under
  * every MinHash/Jaccard operator (docs/SCALE.md r10). */
object ShingleProbe {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    // 100k real documents: sf0.1's corpus replicated 20x
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .crossJoin(spark.range(20).select(col("id").as("rep")))
      .select(col("doc_id") * 20 + col("rep"), col("text"))
      .toDF("doc_id", "text")
      .localCheckpoint()
    println(s"[shingleprobe] docs=${docs.count()}")
    val toks = docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__toks"))
      .localCheckpoint()
    toks.count()
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[shingleprobe] $label%-26s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
    }
    // the HOF formulation inlined (TextAnalysis now routes native)
    def hofRaw(ts: org.apache.spark.sql.Column, n: Int) =
      when(size(ts) < n, array(array_join(ts, " ")))
        .otherwise(transform(
          sequence(lit(1), size(ts) - (n - 1)),
          i => array_join(slice(ts, i, lit(n)), " ")))
    for (n <- Seq(3, 5)) {
      time(f"hof    raw    n=$n")(toks.select(sum(size(hofRaw(col("__toks"), n)))).head)
      time(f"native raw    n=$n")(toks.select(
        sum(size(TextAnalysis.rawNgrams(col("__toks"), n)))).head)
      time(f"hof    shingl n=$n")(toks.select(
        sum(size(array_distinct(hofRaw(col("__toks"), n))))).head)
      time(f"native shingl n=$n")(toks.select(
        sum(size(TextAnalysis.shinglesFromTokens(col("__toks"), n)))).head)
    }
    // result equality spot check (full corpus, both variants)
    val diff = toks.select(col("doc_id"),
        hofRaw(col("__toks"), 3).as("h"),
        TextAnalysis.rawNgrams(col("__toks"), 3).as("n1"),
        array_distinct(hofRaw(col("__toks"), 3)).as("hd"),
        TextAnalysis.shinglesFromTokens(col("__toks"), 3).as("n2"))
      .filter(col("h") =!= col("n1") || col("hd") =!= col("n2")).count()
    println(s"[shingleprobe] mismatches=$diff")
    // language-ID kernel: HOF stopword filter (x5 languages under the
    // argmax) vs the native containment count
    def hofScore(ts: org.apache.spark.sql.Column, lang: String) = {
      val sw = TextAnalysis.stopwords(lang)
      val hits = size(filter(ts, t => sw.map(w => t === w).reduce(_ || _)))
      when(size(ts) > 0, round(hits.cast("double") / size(ts), 6)).otherwise(0.0)
    }
    def hofPredict(ts: org.apache.spark.sql.Column) = {
      val langs = TextAnalysis.stopwords.keys.toSeq.sorted
      val scored = langs.zipWithIndex.map { case (l, i) =>
        struct(hofScore(ts, l).as("s"), lit(langs.size - 1 - i).as("inv"), lit(l).as("l"))
      }
      array_max(array(scored: _*)).getField("l")
    }
    time("hof    langPredict")(toks.select(
      count(when(hofPredict(col("__toks")) === "en", 1))).head)
    time("native langPredict")(toks.select(
      count(when(TextAnalysis.langPredict(col("__toks")) === "en", 1))).head)
    val ldiff = toks.select(hofPredict(col("__toks")).as("h"),
        TextAnalysis.langPredict(col("__toks")).as("n"))
      .filter(col("h") =!= col("n")).count()
    println(s"[shingleprobe] lang mismatches=$ldiff")
    // tokenizer: the five-pass lower/regex/split/filter chain vs the
    // one-pass native kernel
    def hofTok(c: org.apache.spark.sql.Column) =
      filter(split(trim(regexp_replace(lower(c), "\\s+", " ")), " "), t => t =!= "")
    for (_ <- 1 to 2) {
      time("hof    tokenize")(docs.select(sum(size(hofTok(col("text"))))).head)
      time("native tokenize")(docs.select(
        sum(size(graft.expressions.VectorExpressions.tokenize(col("text"))))).head)
    }
    val tdiff = docs.select(hofTok(col("text")).as("h"),
        graft.expressions.VectorExpressions.tokenize(col("text")).as("n"))
      .filter(col("h") =!= col("n")).count()
    println(s"[shingleprobe] tokenize mismatches=$tdiff")
    spark.stop()
  }
}

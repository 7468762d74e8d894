package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Curation

/** End-to-end corpus curation: stage arithmetic, near-dup removal
  * direction, and ledger consistency. */
class CurationSpec extends SparkSpec {

  test("curate gates, dedups and logs a consistent ledger") {
    val docs = Tables.documents(spark, sfDir)
    val r = Curation.curate(docs, "doc_id", "text", minQuality = 0.3,
      nearDupThreshold = 0.5, shingleN = 2)
    val ledger = r.ledger.collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(ledger("input") === docs.count())
    assert(ledger("kept") === r.kept.count())
    assert(ledger("input") ===
      ledger("dropped_lang_or_quality") + ledger("dropped_exact_dup") +
      ledger("dropped_near_dup") + ledger("kept"))
    assert(ledger("kept") > 0)
    // kept ids are unique and were all in the input
    assert(r.kept.select("doc_id").distinct().count() === ledger("kept"))
    assert(r.kept.join(docs.select("doc_id"), Seq("doc_id"), "left_anti").count() === 0)
    // no surviving pair of kept docs is an exact duplicate
    val fps = r.kept.select(md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("fp"))
    assert(fps.count() === fps.distinct().count())
  }

  test("empty and fully-filtered corpora flow through every stage without error") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val r0 = Curation.curate(empty, "doc_id", "text")
    assert(r0.kept.count() === 0)
    assert(r0.ledger.collect().map(x => x.getString(0) -> x.getLong(1)).toMap
      .forall(_._2 == 0L))
    // every doc fails the quality gate -> later stages see empty input
    val junk = Seq((1L, ""), (2L, "!!! ??? !!!")).toDF("doc_id", "text")
    val r1 = Curation.curate(junk, "doc_id", "text", minQuality = 0.9)
    assert(r1.kept.count() === 0)
    val l1 = r1.ledger.collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(l1("input") === 2 && l1("dropped_lang_or_quality") === 2 && l1("kept") === 0)
    // the dedup/corpus operators individually tolerate empty input too
    import graft.operators.{Corpus, Dedup}
    assert(Dedup.ngramJaccardPairs(empty, "doc_id", "text", 3, 0.5).count() === 0)
    assert(Dedup.simhashPairs(empty, "doc_id", "text").count() === 0)
    assert(Corpus.topTokens(empty, "text", 5).count() === 0)
    assert(Corpus.mixtureSample(empty, "text", "doc_id", Map("en" -> 0.5)).count() === 0)
    assert(Corpus.assignSplits(empty, "doc_id", Seq("train" -> 1.0)).count() === 0)
  }
}

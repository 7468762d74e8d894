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
}

package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.expressions.HashFns
import graft.functions.{ColumnOps, NameCleaner}
import graft.operators.{Dedup, Merge}

/** Property-based tests (SURVEY.md §5's planned upgrade over the
  * reference's example-based suite): invariants checked over generated
  * inputs — pure JVM functions via ScalaCheck directly, column functions
  * via one generated-batch DataFrame pass. */
class PropertySpec extends SparkSpec {

  private def check(label: String, p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, s"$label: $res")
  }

  private val anyString: Gen[String] =
    Gen.frequency(
      6 -> Gen.asciiPrintableStr,
      2 -> Gen.listOf(Gen.oneOf("  ", "đã", "bán", "₫", "1.5m", "2k", "\t", "xyz")).map(_.mkString(" ")),
      1 -> Gen.const(""),
      1 -> Gen.listOf(Gen.choose(Char.MinValue, Char.MaxValue)).map(_.mkString).map(_.filterNot(_.isSurrogate)))

  test("cleanName is total on garbage and idempotent on realistic names") {
    // totality over arbitrary garbage (the goldens pin exact behavior; the
    // reference heuristic is NOT idempotent on unbalanced-bracket noise)
    check("cleanName total", Prop.forAll(anyString) { s =>
      val r = NameCleaner.cleanName(s)
      r != null && r == r.trim
    })
    check("shortName total", Prop.forAll(anyString) { s =>
      NameCleaner.shortName(s) != null
    })
    // NOT idempotence: removing a year can CREATE a new marketing-phrase
    // adjacency ("cao 2023 cấp" → "cao cấp" → removed on a second pass) —
    // the reference heuristic has the same ordering sensitivity (SURVEY
    // §7.4#4) and the goldens pin it. The contractual invariants are:
    val word = Gen.oneOf("Áo", "thun", "nam", "cotton", "cao", "cấp", "giảm", "giá",
      "hàng", "chính", "hãng", "2023", "size", "XL", "khuyến", "mãi", "laptop", "ELITE")
    val name = Gen.nonEmptyListOf(word).map(_.mkString(" "))
    check("cleanName output is normalized", Prop.forAll(name) { s =>
      val r = NameCleaner.cleanName(s)
      r == r.trim && !r.contains("  ") && !r.matches(".*\\b202\\d\\b.*")
    })
  }

  test("minhash signature is invariant under shingle permutation and duplication") {
    val shingleGen = Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty))
    def arr(xs: Seq[String]) =
      new GenericArrayData(xs.map(x => UTF8String.fromString(x): Any).toArray)
    check("permutation-invariant", Prop.forAll(shingleGen) { xs =>
      val a = HashFns.minhash(arr(xs), 8)
      val b = HashFns.minhash(arr(scala.util.Random.shuffle(xs)), 8)
      a.toSeq[UTF8String](org.apache.spark.sql.types.StringType) ==
        b.toSeq[UTF8String](org.apache.spark.sql.types.StringType)
    })
    check("duplication-invariant", Prop.forAll(shingleGen) { xs =>
      val a = HashFns.minhash(arr(xs), 8)
      val b = HashFns.minhash(arr(xs ++ xs), 8)
      a.toSeq[UTF8String](org.apache.spark.sql.types.StringType) ==
        b.toSeq[UTF8String](org.apache.spark.sql.types.StringType)
    })
  }

  test("simhash is permutation-invariant and hamming-bounded") {
    val tokGen = Gen.listOf(Gen.alphaNumStr)
    def arr(xs: Seq[String]) =
      new GenericArrayData(xs.map(x => UTF8String.fromString(x): Any).toArray)
    check("permutation-invariant", Prop.forAll(tokGen) { xs =>
      HashFns.simhash(arr(xs), 16) == HashFns.simhash(arr(scala.util.Random.shuffle(xs)), 16)
    })
    check("fits bit width", Prop.forAll(tokGen) { xs =>
      val fp = HashFns.simhash(arr(xs), 16)
      fp >= 0L && fp < (1L << 16)
    })
  }

  test("column parsers and normalizers hold invariants over a generated batch") {
    import spark.implicits._
    val samples = Gen.listOfN(300, anyString)
      .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(42L)).get
    val df = samples.toDF("s").select(
      col("s"),
      ColumnOps.normalizeText(col("s")).as("norm"),
      ColumnOps.normalizeText(ColumnOps.normalizeText(col("s"))).as("norm2"),
      ColumnOps.parseSalesCount(col("s")).as("sales"),
      ColumnOps.parsePrice(col("s")).as("price"))
    // idempotence of normalization; parser totality + sign contracts
    assert(df.filter(col("norm") =!= col("norm2")).count() === 0)
    assert(df.filter(col("sales").isNotNull && col("sales") < 0).count() === 0)
    assert(df.filter(col("price").isNotNull && col("price") < 0).count() === 0)
  }

  test("corpus operators hold structural invariants over generated batches") {
    import spark.implicits._
    import graft.operators.Corpus
    val docs = Gen.listOfN(60, Gen.zip(
      Gen.choose(1L, 1000L),
      Gen.listOf(Gen.oneOf("a", "bb", "ccc", "dd", "e", "ffff")).map(_.mkString(" "))))
      .map(_.distinctBy(_._1))
    check("chunkDocs loses no tokens and respects overlap", Prop.forAll(docs) { rows =>
      rows.isEmpty || {
        val df = rows.toDF("doc_id", "text")
        val chunks = Corpus.chunkDocs(df, "text", chunkTokens = 4, overlap = 1)
          .select("doc_id", "chunk_id", "chunk_text")
          .as[(Long, Int, String)].collect()
          .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toList).toMap
        rows.forall { case (id, text) =>
          val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toList
          val cs = chunks(id)
          // stitched = first chunk + each later chunk minus its 1-token overlap
          val stitched = (cs.head.split(" ").filter(_.nonEmpty).toList ::
            cs.tail.map(_.split(" ").filter(_.nonEmpty).drop(1).toList)).flatten
          stitched == toks
        }
      }
    })
    check("stratifiedSample ≤ n per group, deterministic subset", Prop.forAll(docs) { rows =>
      rows.isEmpty || {
        val df = rows.map { case (id, t) => (id, t.length % 3) }.toDF("doc_id", "g")
        val s1 = Corpus.stratifiedSample(df, "g", "doc_id", 3)
          .as[(Long, Int)].collect().toSet
        val s2 = Corpus.stratifiedSample(df, "g", "doc_id", 3)
          .as[(Long, Int)].collect().toSet
        s1 == s2 && s1.subsetOf(rows.map { case (id, t) => (id, t.length % 3) }.toSet) &&
          s1.groupBy(_._2).forall(_._2.size <= 3)
      }
    })
    check("mixtureSample is partitioning-invariant and row-stable", Prop.forAll(docs) { rows =>
      rows.isEmpty || {
        val withG = rows.map { case (id, t) => (id, if (t.length % 2 == 0) "en" else "de") }
        val df = withG.toDF("doc_id", "g")
        val w = Map("en" -> 0.5, "de" -> 0.25)
        val s1 = Corpus.mixtureSample(df, "g", "doc_id", w)
          .as[(Long, String)].collect().toSet
        // same SET under a different physical partitioning (the 100 TB
        // determinism property rank-based sampling cannot give)
        val s2 = Corpus.mixtureSample(df.repartition(7), "g", "doc_id", w)
          .as[(Long, String)].collect().toSet
        // and membership is per-row stable: a row's fate ignores the rest
        val s3 = Corpus.mixtureSample(df.limit(rows.size / 2 + 1), "g", "doc_id", w)
          .as[(Long, String)].collect().toSet
        s1 == s2 && s3.subsetOf(s1) && s1.subsetOf(withG.toSet)
      }
    })
    check("topTokens equals the sequential frequency model", Prop.forAll(docs) { rows =>
      rows.isEmpty || {
        val df = rows.toDF("doc_id", "text")
        val got = Corpus.topTokens(df, "text", 4).as[(String, Long)].collect().toSeq
        val freq = rows.flatMap(_._2.toLowerCase.split("\\s+").filter(_.nonEmpty))
          .groupBy(identity).view.mapValues(_.size.toLong).toSeq
        val expect = freq.sortBy { case (t, n) => (-n, t) }.take(4)
        got == expect
      }
    })
    check("tokenBudgetPack equals the sequential takeWhile model", Prop.forAll(docs) { rows =>
      rows.isEmpty || {
        val withG = rows.map { case (id, t) => (id, t.length % 3, t) }
        val df = withG.toDF("doc_id", "g", "text")
        val kept = Corpus.tokenBudgetPack(df, "g", "doc_id", "text", budget = 6L)
          .select("doc_id").as[Long].collect().toSet
        val expect = withG.groupBy(_._2).values.flatMap { grp =>
          var cum = 0L
          grp.sortBy(_._1).takeWhile { case (_, _, t) =>
            cum += t.split("\\s+").count(_.nonEmpty); cum <= 6L
          }.map(_._1)
        }.toSet
        kept == expect
      }
    })
  }

  test("precedenceMerge equals the sequential first-truthy model") {
    import spark.implicits._
    val rows = Gen.listOfN(30, Gen.zip(Gen.choose(1, 8),
      Gen.oneOf("", "x", "yy", "zzz"), Gen.option(Gen.choose(1, 99))))
    check("3-source precedence", Prop.forAll(rows, rows, rows) { (a, b, c) =>
      val srcs = Seq(a, b, c).map(_.distinctBy(_._1))
      val dfs = srcs.map(_.toDF("k", "s", "n"))
      val got = Merge.precedenceMerge(dfs, "k")
        .as[(Int, Option[String], Option[Int])].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      val keys = srcs.flatMap(_.map(_._1)).toSet
      val model = keys.map { k =>
        val hits = srcs.flatMap(_.find(_._1 == k))
        k -> (hits.collectFirst { case (_, s, _) if s != null && s.nonEmpty => s },
          hits.collectFirst { case (_, _, Some(n)) => n })
      }.toMap
      got == model
    })
  }

  test("exactDedup equals the sequential model on garbage-mixed corpora") {
    import spark.implicits._
    // the three-tier fingerprint contract fuzzed end to end: clean rows
    // dedup on normalized text (min id wins, null id sorts first), null-text
    // rows dedup on the per-id sentinel (same id + no text = the same
    // document crawled twice), anon rows (no id, no text) ALL pass through.
    // Generator mixes all three tiers plus case/whitespace variants that
    // normalize equal.
    val row = Gen.zip(
      Gen.option(Gen.choose(1L, 20L)),
      Gen.frequency(
        5 -> Gen.oneOf("a b", "A  b", " a b ", "c", "C", "d e f", "").map(Option(_)),
        2 -> Gen.const(None: Option[String])))
    val corpora = Gen.listOfN(40, row)
    check("exactDedup sequential model", Prop.forAll(corpora) { rows =>
      rows.isEmpty || {
        val df = rows.map { case (id, t) => (id, t.orNull) }.toDF("doc_id", "text")
        val got = Dedup.exactDedup(df, "doc_id", "text")
          .as[(Option[Long], Option[String])].collect().toSeq
          .map { case (id, t) => (id, t) }
        def norm(s: String) = s.trim.toLowerCase.split("\\s+").mkString(" ")
        val optOrd = Ordering.Option(Ordering.Long)
        // tier 1: per normalized text, min id wins (None < Some: nulls-first asc)
        val keptClean = rows.collect { case (id, Some(t)) => (id, t) }
          .groupBy { case (_, t) => norm(t) }
          .values.map(g => g.minBy(_._1)(optOrd)).toSeq
          .map { case (id, t) => (id, Option(t)) }
        // tier 2: null-text rows with an id — one survivor per id
        val keptNullText = rows.collect { case (Some(id), None) => id }
          .distinct.map(id => (Option(id), None: Option[String]))
        // tier 3: anon rows all pass through
        val keptAnon = rows.collect { case (None, None) => (None: Option[Long], None: Option[String]) }
        val want = keptClean ++ keptNullText ++ keptAnon
        got.map(_.toString).sorted == want.map(_.toString).sorted
      }
    })
  }

  test("upsertMerge is idempotent and exactDedup keeps the minimum id per fingerprint") {
    import spark.implicits._
    val old = Seq(("1", "a", 10.0), ("2", "b", 20.0)).toDF("product_id", "name", "price")
    val batch = Seq(("2", "", 25.0), ("3", "c", 30.0)).toDF("product_id", "name", "price")
    val once = Merge.upsertMerge(old, batch, Seq("product_id"))
    val twice = Merge.upsertMerge(once, batch, Seq("product_id"))
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)

    val docs = Seq((5L, "x  y"), (3L, "x y"), (9L, "z")).toDF("doc_id", "text")
    val kept = Dedup.exactDedup(docs, "doc_id", "text").select("doc_id")
      .as[Long].collect().toSet
    assert(kept === Set(3L, 9L))
  }
}

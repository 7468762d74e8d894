package graft

import org.apache.spark.sql.functions._
import graft.functions.ColumnOps

/** Golden tests mirroring the reference's tests/test_utils.py cases
  * (parse_sales_count :28-72, parse_price :73-108, extract ids :109-143). */
class ColumnOpsSpec extends SparkSpec {
  import spark.implicits._

  private def evalStr(c: org.apache.spark.sql.Column, input: String): Any =
    Seq(Option(input)).toDF("v").select(c).collect()(0).get(0)

  test("parsePrice golden cases (test_utils.py:73-108)") {
    val cases = Seq(
      "389.000" -> 389000L, "1.500.000" -> 1500000L, "100" -> 100L,
      "389.000₫" -> 389000L, "" -> null, null.asInstanceOf[String] -> null)
    cases.foreach { case (in, want) =>
      assert(evalStr(ColumnOps.parsePrice(col("v")), in) == want, s"parsePrice($in)")
    }
  }

  test("parseSalesCount golden cases (test_utils.py:28-72)") {
    val cases = Seq(
      "1000" -> 1000L, "2k" -> 2000L, "1.5k" -> 1500L, "3m" -> 3000000L,
      "100" -> 100L, "" -> null, null.asInstanceOf[String] -> null,
      "Đã bán 16" -> 16L,          // dict text branch equivalent
      "389.000" -> 389L)           // float-parse then int(), NOT digit-strip
    cases.foreach { case (in, want) =>
      assert(evalStr(ColumnOps.parseSalesCount(col("v")), in) == want, s"parseSalesCount($in)")
    }
  }

  test("extractProductId golden cases (test_utils.py:109-143)") {
    val cases = Seq(
      "https://tiki.vn/p/123456" -> "123456",
      "https://tiki.vn/product-p123456.html" -> "123456",
      "https://tiki.vn/something-p789012.html" -> "789012",
      "invalid" -> null)
    cases.foreach { case (in, want) =>
      assert(evalStr(ColumnOps.extractProductId(col("v")), in) == want, s"extractProductId($in)")
    }
  }

  test("extractCategoryId + normalizeCategoryId") {
    assert(evalStr(ColumnOps.extractCategoryId(col("v")), "https://tiki.vn/amplifier/c68289") == "c68289")
    assert(evalStr(ColumnOps.extractCategoryId(col("v")), "no-category") == null)
    assert(evalStr(ColumnOps.normalizeCategoryId(col("v")), " C1234 ") == "c1234")
    assert(evalStr(ColumnOps.normalizeCategoryId(col("v")), "1234") == "c1234")
    assert(evalStr(ColumnOps.normalizeCategoryId(col("v")), "abc") == null)
  }

  test("normalizeUrl canonicalization (tracking params stripped, query sorted)") {
    assert(evalStr(ColumnOps.normalizeUrl(col("v")),
      "https://tiki.vn/x?b=2&utm_source=g&a=1&spid=3#frag") == "https://tiki.vn/x?a=1&b=2")
    assert(evalStr(ColumnOps.normalizeUrl(col("v")),
      "https://tiki.vn/x?utm_a=1") == "https://tiki.vn/x")
  }

  test("discount math + flash-sale flag (transformer.py:264-274, postgres_storage.py:1375-1380)") {
    val df = Seq((200000.0, 120000.0)).toDF("orig", "cur")
    val row = df.select(
      ColumnOps.discountPercent(col("orig"), col("cur")),
      ColumnOps.discountAmount(col("orig"), col("cur")),
      ColumnOps.isFlashSale(lit(25.0), lit(150000.0)),
      ColumnOps.isFlashSale(lit(35.0), lit(0.0)),
      ColumnOps.isFlashSale(lit(5.0), lit(10.0))).collect()(0)
    assert(row.getDouble(0) == 40.0)
    assert(row.getDouble(1) == 80000.0)
    assert(row.getBoolean(2))   // amount >= 100k
    assert(row.getBoolean(3))   // percent >= 30
    assert(!row.getBoolean(4))
  }

  test("validSellerName nulls out junk (transformer.py:474-544)") {
    val junk = Seq("123", "đã mua hàng", "loading", "x", "12 abc", "!!!")
    junk.foreach(j => assert(evalStr(ColumnOps.validSellerName(col("v")), j) == null, s"junk: $j"))
    assert(evalStr(ColumnOps.validSellerName(col("v")), " Shop ABC ") == "Shop ABC")
  }

  test("parseDatetimeMulti accepts the reference's formats") {
    val ok = Seq("2025-01-15 14:00:00", "2025-01-15T14:00:00", "2025-01-15")
    ok.foreach(v => assert(evalStr(ColumnOps.parseDatetimeMulti(col("v")), v) != null, v))
    assert(evalStr(ColumnOps.parseDatetimeMulti(col("v")), "not a date") == null)
  }
}

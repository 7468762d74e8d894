package graft.tools

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis._

/** Dev probe: per-stage wall time of the q26 dense n-gram-Jaccard path. */
object JaccardProbe {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.1", "documents")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[jprobe] $label%-18s ${(System.nanoTime() - t0) / 1e9}%6.2fs"); r
    }
    val sh = time("ckpt shingles") {
      docs.select(col("doc_id").as("id"), tokens(col("text")).as("__toks"))
        .repartition(col("id"))
        .select(col("id"), explode(shinglesFromTokens(col("__toks"), 2)).as("s"))
        .localCheckpoint()
    }
    val sh2 = time("ckpt shingles v2") {
      docs.select(col("doc_id").as("id"), tokens(col("text")).as("__toks"))
        .repartition(col("id"))
        .select(col("id"), explode(rawNgrams(col("__toks"), 2)).as("s"))
        .distinct()
        .localCheckpoint()
    }
    println(s"[jprobe] v1 rows=${sh.count()} v2 rows=${sh2.count()}")
    val vocabSize = time("count distinct")(sh.agg(count_distinct(col("s"))).head.getLong(0))
    println(s"[jprobe] vocabSize=$vocabSize words=${(vocabSize + 63) / 64}")
    val n = time("full query") {
      graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 2, 0.5).count()
    }
    println(s"[jprobe] pairs=$n")
    val n2 = time("full query warm") {
      graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 2, 0.5).count()
    }
    // dense-path stage breakdown (mirrors ngramJaccardDense)
    locally {
      import spark.implicits._
      val threshold = 0.5
      val probeV = time("vocab probe") {
        sh2.select("s").distinct().limit(1025).collect().map(_.getString(0))
      }
      val vocab = probeV.sorted.zipWithIndex.toSeq.toDF("s", "v")
      val words = (probeV.length + 63) / 64
      val bitAggs = (0 until words).map { w =>
        expr(s"bit_or(if(v div 64 = $w, shiftleft(cast(1 as bigint), cast(v % 64 as int)), 0L))").as(s"w$w")
      }
      val unblocked = time("bit vectors") {
        sh2.join(broadcast(vocab), Seq("s"))
          .groupBy("id")
          .agg(count(lit(1)).as("n"), bitAggs: _*)
          .localCheckpoint()
      }
      val nDocs = time("nDocs count")(unblocked.count())
      println(s"[jprobe] nDocs=$nDocs words=$words")
      val blocks = math.max(16, math.ceil(nDocs.toDouble / 4096).toInt)
      val vecs = unblocked.withColumn("b", pmod(hash(col("id")), lit(blocks)))
      val blockPairs = spark.range(blocks.toLong * blocks)
        .select((col("id") / blocks).cast("int").as("b1"),
          pmod(col("id"), lit(blocks)).cast("int").as("b2"))
        .filter(col("b1") <= col("b2"))
      val interCol = (0 until words).map { w =>
        bit_count(col(s"x.w$w").bitwiseAND(col(s"y.w$w"))).cast("long")
      }.reduce(_ + _)
      val tr = threshold - 1e-6
      val joined = vecs.as("x").join(broadcast(blockPairs), col("x.b") === col("b1"))
        .join(broadcast(vecs.as("y")),
          col("y.b") === col("b2") &&
          (col("b1") < col("b2") || col("x.id") < col("y.id")) &&
          col("x.n") >= col("y.n") * tr && col("y.n") >= col("x.n") * tr &&
          interCol.cast("double") * (1.0 + tr) >= (col("x.n") + col("y.n")).cast("double") * tr)
      val c1 = time("pair join") (joined.count())
      println(s"[jprobe] relaxed survivors=$c1")
      val c2 = time("pair join warm") (joined.count())
    }
    // route bypass: shingleN=3 puts the vocabulary far past the dense
    // cutoff, so the probe's only contribution is the routing decision —
    // forceInverted must return identical pairs with the vocabulary-wide
    // distinct probe gone from the plan (its cost is the delta here)
    val viaProbe = time("route via probe") {
      graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5).count()
    }
    val viaBypass = time("route bypassed") {
      graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5,
        forceInverted = true).count()
    }
    println(s"[jprobe] viaProbe=$viaProbe viaBypass=$viaBypass equal=${viaProbe == viaBypass}")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.expressions.{MinHashSignatureExpr, SimHashExpr}

/** Session extensions: registers the native sketch expressions as SQL
  * functions so `spark.sql("SELECT minhash_signature(sh, 12) ...")` works
  * without the Scala Column API. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal int argument, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignatureExpr].getName, "minhash_signature"),
      (args: Seq[Expression]) =>
        MinHashSignatureExpr(args.head, intArg(args(1), "minhash_signature"))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHashExpr].getName, "simhash64"),
      (args: Seq[Expression]) =>
        SimHashExpr(args.head, intArg(args(1), "simhash64"))))
  }
}

/** Session factory with the engine's scale defaults: AQE with partition
  * coalescing and skew-join splitting, UTC, the graft SQL functions and
  * name-cleaning UDFs registered. `shufflePartitions` is the LOCAL default;
  * on a real cluster leave it to AQE's advisory sizing. */
object GraftSession {

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // S3: the reference zlib-compresses its JSON artifacts; here
      // compression is a storage-codec concern — zstd on every parquet write
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.ui.enabled", "false")

  /** Build and finish setup (UDF registration needs a live session; the
    * function registrations are repeated at runtime so an already-existing
    * session — where `withExtensions` is ignored — still gets them). */
  def create(master: String, shufflePartitions: Int): SparkSession = {
    // dead-pid scratch trees from SIGKILLed runs are unreachable by their
    // owner's shutdown hook — reap them before this session makes new ones
    ScratchJanitor.reapStale()
    val s = builder(master, shufflePartitions).getOrCreate()
    registerOn(s)
    s
  }

  /** Register the graft SQL functions + UDFs on a live session. */
  def registerOn(s: SparkSession): Unit = {
    import org.apache.spark.sql.graftx.Bridge
    Bridge.registerFunction(s, "minhash_signature",
      args => MinHashSignatureExpr(args.head,
        args(1).asInstanceOf[Literal].value.asInstanceOf[Int]))
    Bridge.registerFunction(s, "simhash64",
      args => SimHashExpr(args.head,
        args(1).asInstanceOf[Literal].value.asInstanceOf[Int]))
    Bridge.registerFunction(s, "vector_dot",
      args => graft.expressions.DotProductExpr(args.head, args(1)))
    Bridge.registerFunction(s, "tokenize",
      args => graft.expressions.TokenizeExpr(args.head))
    Bridge.registerFunction(s, "word_ngrams",
      args => graft.expressions.WordNgramsExpr(args.head,
        args(1).asInstanceOf[Literal].value.asInstanceOf[Int],
        if (args.length > 2) args(2).asInstanceOf[Literal].value.asInstanceOf[Boolean]
        else false))
    graft.functions.NameCleaner.register(s)
  }
}

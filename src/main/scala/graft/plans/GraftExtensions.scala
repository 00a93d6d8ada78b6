package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers this engine's native
  * expressions as SQL functions, so `spark.sql` users get them too:
  *
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *   // or: --conf spark.sql.extensions=graft.plans.GraftExtensions
  *   spark.sql("SELECT graft_dot_product(a, b) FROM vectors")
  * }}}
  *
  * (The DataFrame API reaches the same expressions directly through
  * `VectorExpressions` / `TextHashExpressions` without extensions.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions.All

  override def apply(ext: SparkSessionExtensions): Unit = {
    All.foreach { case (name, usage, builder) =>
      ext.injectFunction(
        (FunctionIdentifier(name), GraftExtensions.info(name, usage), builder)
      )
    }
    // declarative HOF dot products → native codegen'd expression
    ext.injectOptimizerRule(_ => NativeDotProductRule)
    // native as-of join physical operator (AsOfJoinNative.asof also
    // self-registers on live sessions via experimental.extraStrategies)
    ext.injectPlannerStrategy(_ => AsOfJoinNative.AsOfJoinStrategy)
  }
}

object GraftExtensions {

  private[plans] def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "", "", "", "", "", "", "scala_udf")

  /** (name, usage, expression builder) for every exposed SQL function. */
  val All: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    (
      "graft_dot_product",
      "_FUNC_(a, b) - sequential-fold dot product of two double arrays",
      (children: Seq[Expression]) => DotProduct(children(0), children(1))
    ),
    (
      "graft_word_shingles",
      "_FUNC_(text) - distinct word-trigram shingles",
      (children: Seq[Expression]) => WordShingles(children.head)
    ),
    (
      "graft_minhash_bands",
      "_FUNC_(shingles) - MinHash-LSH band keys",
      (children: Seq[Expression]) => MinHashBandKeys(children.head)
    ),
    (
      "graft_simhash60",
      "_FUNC_(text) - 60-bit SimHash fingerprint",
      (children: Seq[Expression]) => SimHash60(children.head)
    ),
    (
      "graft_span_fingerprints",
      "_FUNC_(text, width) - md5 fingerprints of non-overlapping width-token spans",
      (children: Seq[Expression]) => SpanFingerprints(children(0), litInt(children(1), "width"))
    ),
    (
      "graft_hyperplane_bands",
      "_FUNC_(v, bits, bands) - banded random-hyperplane LSH keys for a double array",
      (children: Seq[Expression]) =>
        HyperplaneBandKeys(children(0), litInt(children(1), "bits"), litInt(children(2), "bands"))
    )
  )

  /** Shape parameters must be literals — they pick the generated code. */
  private def litInt(e: Expression, name: String): Int = {
    require(e.foldable, s"graft function argument '$name' must be a literal integer")
    e.eval().asInstanceOf[Number].intValue()
  }

  /** Register all functions on an already-running session. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    All.foreach { case (name, _, builder) =>
      org.apache.spark.sql.GraftBridge.registerFunction(spark, name, builder)
    }
}

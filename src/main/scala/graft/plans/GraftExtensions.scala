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
    )
  )

  /** Register all functions on an already-running session. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    All.foreach { case (name, _, builder) =>
      org.apache.spark.sql.GraftBridge.registerFunction(spark, name, builder)
    }
}

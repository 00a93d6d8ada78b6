package graft.tools

import graft.{GraftSession, SparkEntry}

/** Print the formatted physical plan of the named registered queries —
  * the `.explain` feedback loop for plan-shape work. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val dir   = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.get("local[8]", 8)
    args.foreach { name =>
      println(s"===== $name =====")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}

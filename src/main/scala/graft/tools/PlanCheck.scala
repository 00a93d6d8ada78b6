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
      val df = SparkEntry.queries(name)(spark, dir)
      df.explain("formatted")
      // simple mode carries the *(n) whole-stage-codegen markers the
      // formatted dump omits — the §4 audit channel
      if (sys.env.get("SPARK_GRAFT_PLAN_SIMPLE").contains("1")) {
        // execute first: AQE final plans carry the *(n) codegen markers
        // only once the stages have actually planned/run
        df.queryExecution.toRdd.count()
        println(s"----- $name simple (codegen stars) -----")
        println(df.queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}

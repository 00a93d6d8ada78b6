package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // GraftSession.builder carries the engine-wide confs (UTC, AQE,
    // nanosAsLong parquet contract) — a bare builder would read the
    // nanos-timestamp events table differently.
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Optional subset for local iteration (driver runs leave it unset):
    // comma-separated name prefixes, e.g. SPARK_GRAFT_VERIFY_ONLY=q77,q78.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY").map(_.split(',').map(_.trim).filter(_.nonEmpty))
    val selected = only match {
      case Some(ps) =>
        val sel = SparkEntry.queries.filter { case (n, _) => ps.exists(n.startsWith) }
        require(
          sel.nonEmpty,
          s"SPARK_GRAFT_VERIFY_ONLY=${ps.mkString(",")} matched no queries — " +
            "a typo here would otherwise produce an empty-but-green verify run"
        )
        sel
      case None => SparkEntry.queries
    }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // dir-aware renderings override the static entry: a corpus-adaptive
    // query knob (q61's LSH bits) needs its oracle rendered for THIS dir.
    // A rendering failure falls back to the static floor SQL, loudly —
    // better a possibly-stale oracle (the compare still runs and fails
    // visibly on divergence) than a silently absent one.
    val dynamic = SparkEntry.oracleSqlDynamic
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => selected.contains(k) }
      .map { case (k, static) =>
        val sql = dynamic.get(k).flatMap { render =>
          try Some(render(spark, sfDir))
          catch {
            case e: Throwable =>
              System.err.println(s"[verify] dynamic oracle for $k failed (static fallback): ${e.getMessage}")
              None
          }
        }.getOrElse(static)
        s"${q(k)}: ${q(sql)}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}

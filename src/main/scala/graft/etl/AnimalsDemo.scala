package graft.etl

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.GraftSession
import graft.sources.{HttpResponse, HttpTransport}

/** In-memory demo service with the reference's fixture data
  * (`/root/reference/tests/test_pipeline.py:23-32`) — lets the full REST
  * pipeline run end-to-end with no network. Swap for a real transport in
  * production.
  */
class DemoTransport extends HttpTransport {
  private val pages = Map(
    1 -> """{"page": 1, "total_pages": 2, "items": [{"id": 1, "name": "Dog"}, {"id": 2, "name": "Cat"}]}""",
    2 -> """{"page": 2, "total_pages": 2, "items": [{"id": 3, "name": "Mouse"}]}"""
  )
  private val details = Map(
    1L -> """{"id": 1, "name": "Dog", "friends": "Kangaroo, Sea Lions", "born_at": null}""",
    2L -> """{"id": 2, "name": "Cat", "friends": "", "born_at": 1348692957651}""",
    3L -> """{"id": 3, "name": "Mouse", "friends": "Dog", "born_at": null}"""
  )
  override def request(method: String, path: String, body: Option[String], headers: Map[String, String]): HttpResponse =
    (method, path) match {
      case ("GET", p) if p.startsWith("/animals/v1/animals?page=") =>
        HttpResponse(200, pages(p.stripPrefix("/animals/v1/animals?page=").toInt))
      case ("GET", p) if p.matches("/animals/v1/animals/\\d+") =>
        HttpResponse(200, details(p.split("/").last.toLong))
      case ("POST", "/animals/v1/home") =>
        DemoTransport.posted.add(body.getOrElse(""))
        HttpResponse(200, """{"message": "ok"}""")
      case other => HttpResponse(404, s"no route $other")
    }
}
object DemoTransport {
  val posted = new java.util.concurrent.ConcurrentLinkedQueue[String]()
}

/** `sbt "runMain graft.etl.AnimalsDemo [--concurrency N --batch-size N …]"`
  * — runs the reference pipeline end-to-end against the demo service and
  * prints what was POSTed. Parameters resolve exactly like the reference
  * CLI: flag > env (CONCURRENCY, BATCH_SIZE, MAX_RETRIES, …) > default. */
object AnimalsDemo {

  /** Exit mapping mirroring the reference CLI
    * (`/root/reference/src/animals_etl/cli.py:46-53`): a 422 validation
    * error prints "Validation error: <detail>" to stderr and exits 2; an
    * interrupt prints "Aborted." and exits 0 (the reference catches
    * KeyboardInterrupt and falls through to a normal return). Spark
    * surfaces executor-side failures wrapped (SparkException chains), so
    * the cause chain is walked. Anything unmapped propagates. */
  def exitFor(t: Throwable): Option[(Int, String)] = {
    val chain = Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(16).toSeq
    chain.collectFirst {
      case graft.sources.ValidationHttpException(detail, _, _) => (2, s"Validation error: $detail")
      case _: InterruptedException                              => (0, "Aborted.")
    }
  }

  def main(args: Array[String]): Unit = {
    val spark  = GraftSession.get("local[4]", 4)
    val asOf   = lit("2026-01-01 00:00:00").cast(TimestampType)
    val config = EtlConfig.resolve(args.toSeq)
    try {
      val res = AnimalsPipeline.run(spark, classOf[DemoTransport].getName, asOf, config)
      println(s"posted_batches=${res.postedBatches}")
      DemoTransport.posted.forEach(b => println(s"POST /animals/v1/home $b"))
    } catch {
      case t: Throwable =>
        exitFor(t) match {
          case Some((code, msg)) =>
            System.err.println(msg)
            spark.stop()
            sys.exit(code)
          case None => throw t
        }
    }
    spark.stop()
  }
}

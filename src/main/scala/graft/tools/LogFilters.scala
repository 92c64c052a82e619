package graft.tools

/** Targeted log hygiene for the driver-facing mains (Bench): AQE cancels
  * speculative stages mid-flight and their late accumulator updates log
  * benign-but-alarming `DAGScheduler ERROR Failed to update accumulator`
  * lines into the captured stderr tail (VERDICT r8 #9). Deny exactly
  * that message class — NOT the whole logger: a real stage failure's
  * narrative must keep flowing.
  *
  * Wiring note (found live): a Configuration-level `addFilter` is not
  * consulted for these events — the filter must be STARTED and attached
  * to a LoggerConfig registered under the exact logger name (created
  * here if the lookup falls back to an ancestor). GraftApiSpec proves
  * the deny/pass behavior through a real log call.
  */
object LogFilters {

  def installAccumulatorFilter(): Unit = try {
    import org.apache.logging.log4j.core.{Filter, LogEvent}
    import org.apache.logging.log4j.core.config.LoggerConfig
    val ctx = org.apache.logging.log4j.LogManager.getContext(false)
      .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
    val cfg = ctx.getConfiguration
    val name = "org.apache.spark.scheduler.DAGScheduler"
    val f = new org.apache.logging.log4j.core.filter.AbstractFilter() {
      override def filter(e: LogEvent): Filter.Result =
        // exact message class only — a real failure narrative that merely
        // MENTIONS accumulators must keep flowing (review r9)
        if (String.valueOf(e.getMessage.getFormattedMessage)
            .startsWith("Failed to update accumulator")) Filter.Result.DENY
        else Filter.Result.NEUTRAL
    }
    f.start()
    val lc =
      if (cfg.getLoggerConfig(name).getName == name) cfg.getLoggerConfig(name)
      else {
        val nlc = new LoggerConfig(name, null, true) // null level = inherit
        cfg.addLogger(name, nlc)
        nlc
      }
    lc.addFilter(f)
    ctx.updateLoggers()
  } catch { case _: Throwable => () } // best effort: worst case is noise
}

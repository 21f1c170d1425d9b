package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
import org.apache.logging.log4j.core.appender.AbstractAppender

/** Detector for silent whole-stage-codegen compile failures.
  *
  * When generated Java fails Janino compilation (e.g. a method growing
  * past 64KB), Spark logs ONE error through
  * `o.a.s.sql.catalyst.expressions.codegen.CodeGenerator` and falls
  * back to interpreting the whole stage — queries stay correct but run
  * 10-20x slower, and nothing in the API surface reports it. At 100 TB
  * an interpreted scan stage is an outage, so this class turns the log
  * line into something testable: [[install]] hooks a counting appender
  * onto the log4j2 root logger, and the test harness asserts
  * [[failures]] is unchanged across every suite (SparkSpec.afterAll).
  *
  * Counted events: ERROR "Failed to compile" (hard Janino failure) and
  * the hugeMethodLimit fallback INFO line if it is ever raised to a
  * visible level. The session's log level must admit ERROR (all graft
  * sessions run at ERROR).
  */
object CodegenGuard {
  private val counter = new AtomicLong(0)
  private val lastMsg = new java.util.concurrent.atomic.AtomicReference[String]("")
  @volatile private var installed = false

  /** Number of codegen compile failures observed since [[install]]. */
  def failures: Long = counter.get()

  /** Most recent failure message head, for assertion diagnostics. */
  def lastFailure: String = lastMsg.get()

  /** Idempotently attach the counting appender to the log4j2 root
    * logger config (events from every logger reach root unless
    * additivity is off, which Spark's default config does not do). */
  def install(): Unit = synchronized {
    if (installed) return
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val appender = new AbstractAppender(
      "graft-codegen-guard", null, null, false, null) {
      override def append(event: LogEvent): Unit = {
        val logger = event.getLoggerName
        if (logger != null && logger.endsWith("CodeGenerator")) {
          val m = event.getMessage.getFormattedMessage
          if (m != null && m.contains("Failed to compile")) {
            counter.incrementAndGet()
            lastMsg.set(m.linesIterator.take(3).mkString(" | ").take(500))
          }
        }
      }
    }
    appender.start()
    val config = ctx.getConfiguration
    config.getRootLogger.addAppender(appender, Level.ERROR, null)
    ctx.updateLoggers()
    installed = true
  }
}

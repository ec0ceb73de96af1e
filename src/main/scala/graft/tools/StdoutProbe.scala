package graft.tools

/** Prints exactly one JSON line and exits. Exists to verify the build.sbt
  * output plumbing the bench artifact depends on: under
  * `sbt -batch "runMain graft.tools.StdoutProbe" | tail -1` the tail line
  * must parse as bare JSON — no `[info] ` prefix (outputStrategy :=
  * StdoutOutput) and no trailing `[success]` banner (showSuccess := false).
  * BENCH_r11–r13 all shipped "parsed": null because sbt's default log
  * decoration broke exactly this invariant; this probe makes the check
  * cheap enough to run before every bench round (vs a ~9-minute Bench run).
  */
object StdoutProbe {
  def main(args: Array[String]): Unit =
    println("""{"probe":"stdout","decorated":false}""")
}

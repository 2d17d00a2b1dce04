package graft.tools

/** Output-decoration canary: prints one JSON line and exits.
  *
  * The driver parses the LAST line of `sbt "runMain graft.Bench"` output
  * as JSON. That only works when build.sbt routes forked-run output
  * through StdoutOutput (no "[info] " prefix) and suppresses the
  * "[success] Total time" banner. Running this main costs seconds and
  * verifies the whole capture path without a full bench run.
  */
object EchoProbe {
  def main(args: Array[String]): Unit =
    println("""{"metric":"echo_probe","value":1,"unit":"ok"}""")
}

package graft.examples

/** Alias main kept for scripts: delegates to [[graft.Explain]], the one
  * plan-inspection tool (two diverging copies of the explain loop meant
  * behavior fixes had to land twice).
  *
  * Usage: runMain graft.examples.PlanDump [sfDir] [query...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = graft.Explain.main(args)
}

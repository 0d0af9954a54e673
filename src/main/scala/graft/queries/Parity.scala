package graft.queries

/** Reference-parity operators (SURVEY.md §2) exercised on the driver's
  * testdata stand-ins (FIXTURES.md §6). Filled in by slices 1-3.
  */
object Parity {
  def all: Seq[Q] = Seq()
}

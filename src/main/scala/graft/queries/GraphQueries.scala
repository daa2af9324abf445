package graft.queries

object GraphQueries {
  def defs: Seq[Q] = Seq()
}

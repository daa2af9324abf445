package graft.queries

object InteractiveQueries {
  def defs: Seq[Q] = Seq()
}

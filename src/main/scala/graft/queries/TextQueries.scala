package graft.queries

object TextQueries {
  def defs: Seq[Q] = Seq()
}

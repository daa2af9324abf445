package graft.queries

object DedupeQueries {
  def defs: Seq[Q] = Seq()
}

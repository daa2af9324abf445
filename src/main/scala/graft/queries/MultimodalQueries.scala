package graft.queries

object MultimodalQueries {
  def defs: Seq[Q] = Seq()
}

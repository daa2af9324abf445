package graft.queries

object ListGenQueries {
  def defs: Seq[Q] = Seq()
}

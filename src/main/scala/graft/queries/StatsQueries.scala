package graft.queries

object StatsQueries {
  def defs: Seq[Q] = Seq()
}

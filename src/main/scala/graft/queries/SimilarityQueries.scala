package graft.queries

object SimilarityQueries {
  def defs: Seq[Q] = Seq()
}

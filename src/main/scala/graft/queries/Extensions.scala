package graft.queries

/** North-star extension surface (SURVEY.md §7.5): dedup, similarity
  * search, text analysis, multimodal plumbing.
  */
object Extensions {
  def all: Seq[Q] = Seq()
}

package graft.queries

/** Audit-log + merge/upsert operator queries (SURVEY.md §2.3-§2.6, Q5). */
object AuditMerge {
  def all: Seq[Q] = Seq()
}

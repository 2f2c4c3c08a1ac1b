package graft.queries

/** Text-analysis & dedup operators over `documents` (filled in below). */
object TextOps {
  val all: Seq[Q] = Seq()
}

package graft.queries

/** Embedding similarity-search operators over `embeddings`. */
object VectorOps {
  val all: Seq[Q] = Seq()
}

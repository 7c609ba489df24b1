package graft.queries

/** Single source of truth for the declared query inventory (SURVEY §2.B).
  * SparkEntry, Verify, and Bench all read from here.
  */
object Registry {
  def all: Seq[GQuery] =
    Scans.queries ++ Aggregates.queries ++ Joins.queries ++
      Windows.queries ++ SetOps.queries ++ Scalars.queries ++
      Reshape.queries ++
      EventOps.queries ++ Udx.queries ++ Llm.queries ++
      Dedup.queries ++ Similarity.queries ++ TextAnalysis.queries ++
      Bpe.queries ++
      Media.queries ++ Pipeline.queries ++ Clusters.queries ++
      Curation.queries ++ Sql.queries ++ Recall.queries

  def byName: Map[String, GQuery] = all.map(q => q.name -> q).toMap
}

package graft.queries

/** Single source of truth for every operator query the engine exposes to the
  * driver contract (SparkEntry.queries / oracleSql). */
object Registry {
  lazy val all: Seq[Q] =
    RefParity.all ++ EtlOps.all ++ LlmOps.all ++ CorpusOps.all ++
      CurationOps.all ++ EmbedOps.all ++ WindowOps.all ++ JoinOps.all ++
      IoOps.all ++ MultimodalOps.all ++ RelOps.all ++ GraphOps.all ++
      LakeOps.all

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap

  require(all.map(_.name).distinct.size == all.size,
    "duplicate query names in Registry")
}

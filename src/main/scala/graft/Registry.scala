package graft

import graft.ops._

/** Single assembly point for every engine query (SURVEY.md §2.2).
  * `SparkEntry.queries`/`oracleSql` are derived views of this list —
  * add a Q here and it is wired into the driver contract automatically.
  */
object Registry {
  val all: Seq[Q] =
    ScanFilterOps.all ++ JoinOps.all ++ AggOps.all ++ WindowOps.all ++
      SortSetOps.all ++ SetOps.all ++ ScalarOps.all ++ CdcOps.all ++
      StreamShapeOps.all ++ TextSimOps.all ++ CurateOps.all ++
      SketchOps.all ++ GovernOps.all ++ ReshapeOps.all ++
      JoinScaleOps.all ++ VectorOps.all ++ TextRankOps.all ++ StatOps.all ++
      LayoutOps.all ++ GraphOps.all ++ SampleOps.all ++ SimJoinOps.all ++
      LmOps.all ++ AuditOps.all ++ ImplOps.all ++ BpeOps.all ++
      RetrievalOps.all ++ ClassifierOps.all ++ TpchOps.all ++
      RecursiveOps.all ++ AnsiOps.all ++ OlapExtraOps.all ++
      OlapStatOps.all ++ OlapRankOps.all ++ TrendOps.all ++ EngageOps.all ++
      AssocOps.all ++ SnapshotSqlOps.all

  require(all.map(_.name).distinct.size == all.size,
    "duplicate query names in Registry")
}

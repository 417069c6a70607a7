package graft.api

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext}
import org.apache.spark.sql.sources.{BaseRelation, RelationProvider, TableScan}
import org.apache.spark.sql.types._

/** Pathless batch source (DataSource V1): yields rows 0..n-1 from option
  * `n`. Exists only to prove `readLake`'s non-path fall-through reaches a
  * plain `load()` with the caller's options (the reference passes kafka /
  * jdbc through the same way, `readwriter.py:57-81`). */
class PathlessTestSource extends RelationProvider {
  override def createRelation(
      ctx: SQLContext, parameters: Map[String, String]): BaseRelation = {
    val n = parameters.getOrElse("n", "3").toInt
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = ctx
      override def schema: StructType =
        StructType(Seq(StructField("i", IntegerType, nullable = false)))
      override def buildScan(): RDD[Row] =
        ctx.sparkContext.parallelize(0 until n, 1).map(Row(_))
    }
  }
}

package graft.queries
import org.apache.spark.sql.{DataFrame, SparkSession}
object VectorQueries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracle: Map[String, String] = Map()
}

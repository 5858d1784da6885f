package graft.tools
import org.apache.spark.sql.functions._
object Dbg {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("4", "dbg")
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f g"), (2L, "x y a b c d e z"), (3L, "p q r s t")).toDF("doc_id", "text")
    val out = graft.functions.Dedup.removeDuplicatedWindows(docs, "doc_id", "text", 5)
    out.orderBy("doc_id").show(false)
    spark.stop()
  }
}

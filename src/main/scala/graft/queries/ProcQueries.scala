package graft.queries

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Elem
import graft.operators.ProcessKernel

/** External-process kernel queries — the reference's arbitrary-language
  * kernel surface (`scanner/engine/python_kernel.cpp`,
  * `python/scannerpy/kernel.py:81-117`) proven end-to-end: a python3
  * stdlib kernel computes per-document word counts through the
  * [[ProcessKernel]] pipe bridge, and DuckDB replays the same tokenizer
  * in SQL for the hash gate.
  */
object ProcQueries {

  /** idempotent: the word-count kernel script (python3 stdlib only);
    * public so Bench's pipe-throughput row forks the same kernel */
  def ensureKernelScript(): String = {
    val script =
      """import sys, base64
        |for line in sys.stdin:
        |    parts = line.rstrip("\n").split("\t")
        |    if parts[0] == "elem":
        |        data = b"" if parts[3] == "-" else base64.b64decode(parts[3])
        |        n = len(data.decode("utf-8").split())
        |        sys.stdout.write("out\t" + base64.b64encode(str(n).encode()).decode() + "\n")
        |        sys.stdout.flush()
        |""".stripMargin
    val p = Paths.get(sys.props("java.io.tmpdir"), "graft_kernel_wordcount.py")
    if (!Files.exists(p)) {
      val tmp = Paths.get(p.toString + ".tmp." + ProcessHandle.current().pid())
      Files.write(tmp, script.getBytes(UTF_8))
      try Files.move(tmp, p, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.nio.file.FileAlreadyExistsException => Files.deleteIfExists(tmp) }
    }
    p.toString
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "proc_kernel_wordcount" -> ((s: SparkSession, dir: String) => {
      val kernel = ensureKernelScript()
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val elemEnc = Encoders.product[Elem]
      // documents → byte-payload sequence: one stream per doc, the same
      // opaque-element shape every other kernel sees
      val seq = docs.select(col("doc_id"), col("text"))
        .map(r => Elem(r.getLong(0), 0L, r.getString(1).getBytes(UTF_8)))(elemEnc)
      val counted = ProcessKernel.run(seq, ProcessKernel.Spec(Seq("python3", kernel)))
      counted
        .select(col("streamId").as("doc_id"),
          col("payload").cast("string").cast("long").as("n_words"))
        .orderBy("doc_id")
    }))

  val oracles: Map[String, String] = Map(
    "proc_kernel_wordcount" ->
      """SELECT doc_id,
        |       CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
        |                            x -> x <> '')) AS BIGINT) AS n_words
        |FROM documents ORDER BY doc_id""".stripMargin)
}

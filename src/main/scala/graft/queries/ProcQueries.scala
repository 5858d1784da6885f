package graft.queries

import java.nio.charset.StandardCharsets.UTF_8

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

  /** The word-count kernel script (python3 stdlib only); public so
    * Bench's pipe-throughput row forks the same kernel. Shipped to
    * wherever the fork happens via `Spec.shipFiles` (task-closure bytes,
    * executor-local content-hashed materialization) — a driver-written
    * tmp path would not exist on a real cluster's executors.
    *
    * Tokenizer is the EXPLICIT class `[ \t\n\r\f]+` on both sides —
    * python's bare `str.split()` splits on Unicode whitespace while the
    * oracle's RE2 `\s` is ASCII-only, a latent divergence on e.g. U+00A0.
    */
  val wordcountScript: Array[Byte] =
    """import sys, base64, re
      |for line in sys.stdin:
      |    parts = line.rstrip("\n").split("\t")
      |    if parts[0] == "elem":
      |        data = b"" if parts[3] == "-" else base64.b64decode(parts[3])
      |        toks = re.split(r'[ \t\n\r\f]+', data.decode("utf-8"))
      |        n = sum(1 for t in toks if t)
      |        sys.stdout.write("out\t" + base64.b64encode(str(n).encode()).decode() + "\n")
      |        sys.stdout.flush()
      |""".stripMargin.getBytes(UTF_8)

  /** the Spec both the oracle query and the bench row fork */
  def wordcountSpec: ProcessKernel.Spec = ProcessKernel.Spec(
    Seq("python3", "{{wordcount.py}}"),
    shipFiles = Map("wordcount.py" -> wordcountScript))

  /** The same word count speaking the BATCHED frame protocol (`elems` in,
    * `outs` out): one read/parse/answer/flush per n elements instead of
    * per element — the bridge analogue of the reference kernel `batch`
    * attribute (`kernel.h:59-66`). Identical tokenizer, so any output
    * divergence from [[wordcountScript]] is a protocol bug
    * (ProcessKernelSpec pins the parity).
    */
  val wordcountBatchedScript: Array[Byte] =
    """import sys, base64, re
      |ws = re.compile(r'[ \t\n\r\f]+')
      |def count(b64):
      |    data = b"" if b64 == "-" else base64.b64decode(b64)
      |    return sum(1 for t in ws.split(data.decode("utf-8")) if t)
      |for line in sys.stdin:
      |    parts = line.rstrip("\n").split("\t")
      |    if parts[0] == "elems":
      |        n = int(parts[2])
      |        outs = [base64.b64encode(str(count(parts[4 + 2 * i])).encode()).decode()
      |                for i in range(n)]
      |        sys.stdout.write("outs\t%d\t%s\n" % (n, "\t".join(outs)))
      |        sys.stdout.flush()
      |    elif parts[0] == "elem":
      |        sys.stdout.write("out\t" + base64.b64encode(
      |            str(count(parts[3])).encode()).decode() + "\n")
      |        sys.stdout.flush()
      |""".stripMargin.getBytes(UTF_8)

  def wordcountBatchedSpec(batch: Int = 256): ProcessKernel.Spec =
    ProcessKernel.Spec(
      Seq("python3", "{{wordcount_batched.py}}"),
      shipFiles = Map("wordcount_batched.py" -> wordcountBatchedScript),
      batch = batch)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "proc_kernel_wordcount" -> ((s: SparkSession, dir: String) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val elemEnc = Encoders.product[Elem]
      // documents → byte-payload sequence: one stream per doc, the same
      // opaque-element shape every other kernel sees
      val seq = docs.select(col("doc_id"), col("text"))
        .map(r => Elem(r.getLong(0), 0L, r.getString(1).getBytes(UTF_8)))(elemEnc)
      val counted = ProcessKernel.run(seq, wordcountSpec)
      counted
        .select(col("streamId").as("doc_id"),
          col("payload").cast("string").cast("long").as("n_words"))
        .orderBy("doc_id")
    }),

    // the SAME word count through the BATCHED frame protocol (elems/outs,
    // 64 elements per pipe frame) — the batch surface gets its own
    // DuckDB-gated row, not just spec parity with the unbatched kernel
    "proc_kernel_wordcount_batched" -> ((s: SparkSession, dir: String) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val elemEnc = Encoders.product[Elem]
      val seq = docs.select(col("doc_id"), col("text"))
        .map(r => Elem(r.getLong(0), 0L, r.getString(1).getBytes(UTF_8)))(elemEnc)
      ProcessKernel.run(seq, wordcountBatchedSpec(batch = 64))
        .select(col("streamId").as("doc_id"),
          col("payload").cast("string").cast("long").as("n_words"))
        .orderBy("doc_id")
    }))

  /** one tokenizer replay serves both protocol variants */
  private val wordcountSql =
    """SELECT doc_id,
      |       CAST(len(list_filter(regexp_split_to_array(text, '[ \t\n\r\f]+'),
      |                            x -> x <> '')) AS BIGINT) AS n_words
      |FROM documents ORDER BY doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "proc_kernel_wordcount" -> wordcountSql,
    "proc_kernel_wordcount_batched" -> wordcountSql)
}

package graft.operators

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64
import java.util.concurrent.{ConcurrentLinkedQueue, TimeUnit}

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Dataset, Encoder, Encoders}

import graft.model.Elem

/** External-process kernel bridge — the reference's arbitrary-language
  * kernel surface (Python kernels run in forked interpreter pools over
  * pipes: host `scanner/engine/python_kernel.cpp:1-429`, process loop
  * `python/scannerpy/kernel.py:81-117`, registration
  * `python/scannerpy/client.py:910-963`) re-expressed Spark-first.
  *
  * Model mapping: the reference forks one kernel process per pipeline
  * instance per node and streams protobuf-framed elements over pipes.
  * Here `mapPartitions` forks ONE child process per partition (Spark's
  * executor-core parallelism plays the role of the reference's
  * `pipeline_instances_per_node`), and elements stream over the child's
  * stdin/stdout as a line protocol. The child can be python3, awk, a
  * compiled binary — anything that speaks the protocol; this is strictly
  * more general than the reference's Python-only bridge.
  *
  * Line protocol (UTF-8, tab-separated, payloads base64; `-` = null
  * payload, the reference NullElement):
  *
  *   driver → child:
  *     `init\t<b64(initArgs)>`                    once, first line
  *       (reference per-op constructor args, `kernel.h:171-180`)
  *     `stream\t<streamId>\t<b64(config)>`        on every streamId change
  *       (reference `new_stream(args)` — also the state-reset point,
  *        `kernel.h:182-191`)
  *     `elem\t<streamId>\t<index>\t<b64|->`       one per element (batch=1)
  *     `elems\t<streamId>\t<n>\t<idx1>\t<b64|->\t...\t<idxn>\t<b64|->`
  *       n same-stream elements in ONE frame (Spec.batch > 1) — the
  *       reference's kernel `batch` attribute (`kernel.h:59-66`), which
  *       amortizes per-element dispatch; here it amortizes the pipe's
  *       per-LINE cost (child read/parse/flush per element is what bounds
  *       the unbatched bridge). A frame never spans a stream boundary, so
  *       `stream` state-reset points stay exact.
  *   child → driver:
  *     `out\t<b64|->`                             one output payload
  *     `outs\t<n>\t<b64|->\t...\t<b64|->`         n output payloads
  *       (any mix — outputs map to inputs in feed order; EXACTLY one
  *        payload per element in total)
  *     `err\t<b64(message)>`                      abort with message
  *
  * Contract enforcement: the 1→1 rate (`docs/guide/graphs.rst:103-105`)
  * is checked — a child that drops or duplicates elements fails the task
  * with a diagnostic including the child's captured stderr tail, as does
  * a nonzero exit.
  *
  * Scale shape: zero shuffle for stateless kernels (runs on the incoming
  * partitioning); stateful kernels get one hash exchange + in-partition
  * sort so each stream's elements reach its child process in index order
  * with state-reset boundaries intact — the same single-shuffle shape as
  * `Kernels.unboundedState`. Throughput is pipe-bound, not memory-bound:
  * a writer thread feeds stdin while the task thread consumes stdout, so
  * in-flight data is bounded by the OS pipe buffers plus whatever the
  * child itself buffers (a well-behaved kernel answers as it reads; the
  * in-flight key queue then stays O(pipe buffer / elem size)).
  */
object ProcessKernel {

  /** Kernel launch spec — mirrors the reference's op registration payload
    * (command ≈ the pickled kernel class, initArgs ≈ constructor proto,
    * streamConfigs ≈ per-stream `new_stream` args, `op.py:24-44`).
    * `streamConfigs` is shipped in the task closure: per-stream CONFIG is
    * driver-small by construction (the reference sends it inline in the
    * job proto too, `client.py:1434-1527`).
    */
  final case class Spec(
      command: Seq[String],
      initArgs: Array[Byte] = Array.empty,
      streamConfigs: Map[Long, Array[Byte]] = Map.empty,
      env: Map[String, String] = Map.empty,
      stateful: Boolean = false,
      shipFiles: Map[String, Array[Byte]] = Map.empty,
      // elements per `elems` frame (1 = the per-element `elem` protocol);
      // the reference's batch attribute, kernel.h:59-66 — opt-in because
      // the child's parser must understand the frame
      batch: Int = 1) {
    require(batch >= 1, s"batch must be >= 1: $batch")
  }

  /** Materialize `shipFiles` on the machine about to fork (executor-local
    * tmp, content-hashed path — idempotent and collision-safe across
    * concurrent tasks) and substitute `{{name}}` occurrences in the
    * command with the materialized absolute paths. This is what makes a
    * script-backed kernel CLUSTER-correct: the script's bytes travel in
    * the task closure like any other kernel state (the reference ships
    * the cloudpickled kernel class the same way, `client.py:910-963`) —
    * a driver-local path would not exist on executors.
    */
  private def resolveCommand(spec: Spec): Seq[String] = {
    if (spec.shipFiles.isEmpty) return spec.command
    val paths = spec.shipFiles.map { case (name, bytes) =>
      val hash = java.security.MessageDigest.getInstance("MD5").digest(bytes)
        .take(8).map(b => f"${b & 0xff}%02x").mkString
      val p = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        s"graft-pk-$hash-$name")
      if (!java.nio.file.Files.exists(p)) {
        val tmp = java.nio.file.Paths.get(
          p.toString + ".tmp." + Thread.currentThread().getId)
        java.nio.file.Files.write(tmp, bytes)
        try java.nio.file.Files.move(tmp, p,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch { case _: java.nio.file.FileAlreadyExistsException =>
          java.nio.file.Files.deleteIfExists(tmp)
        }
      }
      name -> p.toString
    }
    spec.command.map(arg =>
      paths.foldLeft(arg) { case (a, (n, p)) => a.replace(s"{{$n}}", p) })
  }

  private val elemEnc: Encoder[Elem] = Encoders.product[Elem]
  private val B64E = Base64.getEncoder
  private val B64D = Base64.getDecoder

  private def enc(b: Array[Byte]): String =
    if (b == null) "-" else B64E.encodeToString(b)
  private def dec(s: String): Array[Byte] =
    if (s == "-") null else B64D.decode(s)

  /** Run the external kernel over a sequence. Stateless kernels execute on
    * the existing partitioning (narrow); `spec.stateful` adds the one
    * exchange+sort that stateful semantics require (all of a stream's
    * elements, in index order, through one kernel instance).
    */
  def run(ds: Dataset[Elem], spec: Spec): Dataset[Elem] = {
    val routed =
      if (spec.stateful)
        ds.repartition(ds.col("streamId"))
          .sortWithinPartitions("streamId", "index")
      else ds
    routed.mapPartitions(it => runPartition(it, spec))(elemEnc)
  }

  private def runPartition(it: Iterator[Elem], spec: Spec): Iterator[Elem] = {
    if (!it.hasNext) return Iterator.empty
    val pb = new ProcessBuilder(resolveCommand(spec): _*)
    spec.env.foreach { case (k, v) => pb.environment().put(k, v) }
    val proc = pb.start()
    val ctx  = TaskContext.get()
    if (ctx != null) ctx.addTaskCompletionListener[Unit] { _ =>
      if (proc.isAlive) proc.destroyForcibly()
    }

    // stderr drain — keep the tail for diagnostics (bounded)
    val errBuf = new StringBuilder
    val errThread = new Thread(() => {
      val r = new BufferedReader(new InputStreamReader(proc.getErrorStream, UTF_8))
      var line = r.readLine()
      while (line != null) {
        errBuf.synchronized {
          errBuf.append(line).append('\n')
          if (errBuf.length > 8192) errBuf.delete(0, errBuf.length - 8192)
        }
        line = r.readLine()
      }
    }, "graft-prockernel-stderr")
    errThread.setDaemon(true)
    errThread.start()

    def stderrTail: String = errBuf.synchronized(errBuf.toString)

    // in-flight (streamId, index) keys, written by the feeder, consumed by
    // the reader to rebuild full elements from payload-only responses
    val inFlight = new ConcurrentLinkedQueue[(Long, Long)]()
    @volatile var fed       = 0L
    @volatile var feedError: Throwable = null

    val feeder = new Thread(() => {
      // propagate the task's TaskContext thread-local before touching the
      // upstream iterator — the same move Spark's own RDD.pipe stdin-writer
      // thread makes (core/src/main/scala/org/apache/spark/rdd/
      // PipedRDD.scala); the setter is Spark-internal, hence reflection
      if (ctx != null) try {
        val m = TaskContext.getClass.getDeclaredMethod(
          "setTaskContext", classOf[TaskContext])
        m.setAccessible(true)
        m.invoke(TaskContext, ctx)
      } catch { case _: Throwable => () }
      val w = new BufferedWriter(new OutputStreamWriter(proc.getOutputStream, UTF_8))
      try {
        w.write(s"init\t${enc(spec.initArgs)}\n")
        var curStream = Long.MinValue
        // batched framing state: payload fragments of the open frame
        // ("\tidx\tb64" repeated) — flushed on stream change / frame full
        val frame  = new java.lang.StringBuilder
        var frameN = 0
        def flushFrame(): Unit = if (frameN > 0) {
          w.write(s"elems\t$curStream\t$frameN$frame\n")
          frame.setLength(0); frameN = 0
        }
        while (it.hasNext) {
          val e = it.next()
          if (e.streamId != curStream) {
            flushFrame() // a frame never spans a stream boundary
            curStream = e.streamId
            val cfg = spec.streamConfigs.getOrElse(e.streamId, Array.empty[Byte])
            w.write(s"stream\t${e.streamId}\t${enc(cfg)}\n")
          }
          inFlight.add((e.streamId, e.index))
          fed += 1
          if (spec.batch == 1)
            w.write(s"elem\t${e.streamId}\t${e.index}\t${enc(e.payload)}\n")
          else {
            frame.append('\t').append(e.index).append('\t').append(enc(e.payload))
            frameN += 1
            if (frameN >= spec.batch) flushFrame()
          }
        }
        flushFrame()
        w.flush()
      } catch {
        case t: Throwable => feedError = t
      } finally {
        try w.close() catch { case _: Throwable => () } // EOF = no more elements
      }
    }, "graft-prockernel-feeder")
    feeder.setDaemon(true)
    feeder.start()

    val out = new BufferedReader(new InputStreamReader(proc.getInputStream, UTF_8))

    def fail(msg: String): Nothing = {
      proc.destroyForcibly()
      throw new RuntimeException(
        s"ProcessKernel ${spec.command.mkString(" ")}: $msg" +
          (if (stderrTail.nonEmpty) s"\n--- child stderr tail ---\n$stderrTail" else ""))
    }

    new Iterator[Elem] {
      // decoded-but-unconsumed outputs: an `outs` frame yields n elements
      // from one line, so the iterator drains this before reading again
      private val pending  = new java.util.ArrayDeque[Elem]()
      private var finished = false
      private var emitted  = 0L

      /** match one output payload to the oldest in-flight input key */
      private def takeOne(b64: String, line: String): Unit = {
        val key = inFlight.poll()
        if (key == null)
          fail(s"1-to-1 contract violated: output with no pending element")
        val payload =
          try dec(b64)
          catch { case _: IllegalArgumentException =>
            fail(s"bad protocol line from child (invalid base64): '${line.take(120)}'")
          }
        emitted += 1
        pending.add(Elem(key._1, key._2, payload))
      }

      private def advance(): Unit = {
        while (!finished && pending.isEmpty) {
          val line = out.readLine()
          if (line == null) {
            finished = true
            // child closed stdout: it must have answered every element
            feeder.join()
            if (feedError != null) fail(s"feeding stdin failed: $feedError")
            if (!proc.waitFor(30, TimeUnit.SECONDS)) fail("child did not exit after EOF")
            errThread.join(2000)
            if (proc.exitValue() != 0) fail(s"child exited ${proc.exitValue()}")
            if (emitted != fed)
              fail(s"1-to-1 contract violated: $fed elements in, $emitted out")
          } else {
            val tab  = line.indexOf('\t')
            val kind = if (tab < 0) line else line.substring(0, tab)
            // a keyword with no tab (bare "out"/"err") is malformed too —
            // route it to the diagnostic path, not a raw Base64/NPE crash
            kind match {
              case "out" if tab >= 0 =>
                takeOne(line.substring(tab + 1), line)
              case "outs" if tab >= 0 =>
                // outs\t<n>\t<b64>...: n payloads, feed-order mapping.
                // Cursor walk, not split(): a frame line is O(batch) long
                // and this is the per-element hot path
                val tab2 = line.indexOf('\t', tab + 1)
                val n =
                  try (if (tab2 < 0) line.substring(tab + 1)
                       else line.substring(tab + 1, tab2)).toInt
                  catch { case _: NumberFormatException =>
                    fail(s"bad outs frame from child: '${line.take(120)}'")
                  }
                if (n < 1 || tab2 < 0)
                  fail(s"outs frame declares $n payloads but carries 0: " +
                    s"'${line.take(120)}'")
                var i = 0
                var cur = tab2 + 1
                while (i < n) {
                  if (cur > line.length)
                    fail(s"outs frame declares $n payloads but carries $i: " +
                      s"'${line.take(120)}'")
                  val next = line.indexOf('\t', cur)
                  val end  = if (next < 0) line.length else next
                  takeOne(line.substring(cur, end), line)
                  cur = end + 1
                  i += 1
                }
                if (cur <= line.length)
                  fail(s"outs frame declares $n payloads but carries more: " +
                    s"'${line.take(120)}'")
              case "err" if tab >= 0 =>
                val msg =
                  try Option(dec(line.substring(tab + 1)))
                    .map(new String(_, UTF_8)).getOrElse("(no message)")
                  catch { case _: IllegalArgumentException => line.take(120) }
                fail(s"kernel error: $msg")
              case _ =>
                fail(s"bad protocol line from child: '${line.take(120)}'")
            }
          }
        }
      }

      override def hasNext: Boolean = { advance(); !pending.isEmpty }

      override def next(): Elem = {
        advance()
        if (pending.isEmpty) throw new NoSuchElementException
        pending.poll()
      }
    }
  }
}

package graft.tools

import java.lang.management.ManagementFactory

import graft.operators.StdKernels
import graft.sources.{H264GopCodec, Simd}

/** In-process SIMD on/off A/B for the decoder: one JVM, one fixture,
  * alternating timed blocks toggling [[Simd.disabled]] — immune to the
  * host's slow contention drift that makes back-to-back JVM runs
  * incomparable (BENCHNOTES r13: 5-25x swings). cpu-time based.
  *
  * {{{ sbt "runMain graft.tools.SimdAb [nGops] [tier] [h] [w]" }}}
  */
object SimdAb {
  def main(args: Array[String]): Unit = {
    val nGops = args.headOption.map(_.toInt).getOrElse(3)
    val tier = args.drop(1).headOption.getOrElse("default")
    val h = args.drop(2).headOption.map(_.toInt).getOrElse(720)
    val w = args.drop(3).headOption.map(_.toInt).getOrElse(1280)
    val codec = tier match {
      case "default" => H264GopCodec.Default
      case "cabac"   => H264GopCodec.Cabac
      case "high"    => H264GopCodec.High
      case "parts"   => H264GopCodec.Parts
      case "bframes" => H264GopCodec.BFrames
      case other     => sys.error(s"unknown tier $other")
    }
    val gopSize = 16
    val gops = (0 until nGops).map { g =>
      codec.encodeGop((0 until gopSize).map(i =>
        StdKernels.syntheticFrame(0L, (g * gopSize + i).toLong, h, w, 1)))
    }
    val tmx = ManagementFactory.getThreadMXBean
    // warm both paths
    Seq(false, true).foreach { off =>
      Simd.disabled = off
      (0 until 3).foreach(_ => gops.foreach(g =>
        codec.decodeGop(g, 0L, 0L, Int.MaxValue, None).size))
    }
    def block(off: Boolean): (Long, Double) = {
      Simd.disabled = off
      val c0 = tmx.getCurrentThreadCpuTime
      val t0 = System.nanoTime()
      var frames = 0L
      while (System.nanoTime() - t0 < 2.5e9) {
        gops.foreach(g =>
          frames += codec.decodeGop(g, 0L, 0L, Int.MaxValue, None).size)
      }
      (frames, (tmx.getCurrentThreadCpuTime - c0) / 1e9)
    }
    var onF = 0L; var onC = 0.0; var offF = 0L; var offC = 0.0
    (0 until 4).foreach { _ =>
      val (f1, c1) = block(off = false); onF += f1; onC += c1
      val (f0, c0) = block(off = true); offF += f0; offC += c0
    }
    Simd.disabled = false
    println(f"== simd ON : ${onF / onC}%.1f fps/core ($onF frames, $onC%.2f cpu s)")
    println(f"== simd OFF: ${offF / offC}%.1f fps/core ($offF frames, $offC%.2f cpu s)")
    println(f"== speedup: ${offC / onC * onF / offF}%.2fx")
  }
}

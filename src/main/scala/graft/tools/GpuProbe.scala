package graft.tools

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.spark.TaskContext

import graft.GraftSession
import graft.model.Elem
import graft.operators.Placement
import graft.operators.Placement.{Device, Registry}

/** End-to-end GPU STAGE EXECUTION under a stub discovery script — the
  * drive the refusal-only PlacementSpec tests can't provide (reference:
  * GPU kernel groups actually running on devices,
  * `scanner/engine/worker.cpp:1190-1292`).
  *
  * Spark's resource discovery accepts ANY executable printing the
  * resource JSON (`spark.worker.resource.gpu.discoveryScript` on
  * standalone workers), so a one-line `echo` fakes a GPU on
  * `local-cluster`: the worker "discovers" it, the executor registers
  * it, and a `Placement.place(..., Device.GPU, taskOnly = true)` stage
  * (task-only profile — the static-allocation path, SPARK-39853) is
  * actually SCHEDULED onto the GPU slot. Each placed task asserts it
  * was handed the gpu address via `TaskContext.resources()`; an
  * unplaced stage in the same session asserts it was NOT.
  *
  * Prints `GPU-PROBE OK ...` and exits 0 on success — forked as a
  * separate JVM by PlacementSpec (two SparkContexts can't share a JVM
  * with the suite's local session).
  */
object GpuProbe {
  def main(args: Array[String]): Unit = {
    // the stub "GPU": one device, address 0, in Spark's discovery JSON
    val script = Files.createTempFile("graft-gpu-discover", ".sh")
    Files.write(script,
      "#!/bin/sh\necho '{\"name\":\"gpu\",\"addresses\":[\"0\"]}'\n".getBytes(UTF_8))
    script.toFile.setExecutable(true)

    val spark = GraftSession.localCluster(
      workers = 1, cores = 2, memMb = 1024, appName = "graft-gpu-probe",
      extraConfs = Map(
        // standalone worker discovers the (fake) device...
        "spark.worker.resource.gpu.amount" -> "1",
        "spark.worker.resource.gpu.discoveryScript" -> script.toString,
        // ...and the default executors claim it (no task amount at the
        // app level: ONLY gpu-placed stages may occupy the slot)
        "spark.executor.resource.gpu.amount" -> "1"))
    try {
      val enc = org.apache.spark.sql.Encoders.product[Elem]
      val ds  = spark.createDataset(
        (0 until 8).map(i => Elem(0L, i.toLong, Array[Byte](i.toByte))))(enc)
        .repartition(2)

      val registry = new Registry().register("histogram",
        Set[Device](Device.CPU, Device.GPU))

      // the GPU-placed stage: every task must hold the gpu address
      val placed = Placement
        .place(ds, "histogram", registry, Device.GPU, taskOnly = true)
        .mapPartitions { it =>
          val res = TaskContext.get().resources()
          val gpu = res.getOrElse("gpu",
            throw new IllegalStateException(
              s"gpu-placed task got no gpu resource; resources=${res.keySet}"))
          require(gpu.addresses.sameElements(Array("0")),
            s"unexpected gpu addresses: ${gpu.addresses.mkString(",")}")
          it
        }(enc)
      val nPlaced = placed.collect().length
      require(nPlaced == 8, s"placed stage returned $nPlaced of 8 elements")

      // control: an UNPLACED stage in the same session runs without the
      // gpu resource (the default profile requested no task gpus)
      val nUnplaced = ds.mapPartitions { it =>
        require(!TaskContext.get().resources().contains("gpu"),
          "unplaced task was handed a gpu it never requested")
        it
      }(enc).collect().length
      require(nUnplaced == 8, s"control stage returned $nUnplaced of 8 elements")

      println(s"GPU-PROBE OK placed=$nPlaced unplaced=$nUnplaced addr=0")
    } finally {
      spark.stop()
      Files.deleteIfExists(script)
    }
  }
}

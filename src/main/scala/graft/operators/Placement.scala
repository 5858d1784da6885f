package graft.operators

import scala.collection.mutable

import org.apache.spark.resource.{ExecutorResourceRequests, ResourceProfile, ResourceProfileBuilder, TaskResourceRequests}
import org.apache.spark.sql.{Dataset, Encoders}

import graft.model.Elem

/** Device placement — the reference's CPU/GPU kernel placement surface
  * (`scanner/metadata.proto:25-28` DeviceType, DAG validation
  * `scanner/engine/dag_analysis.cpp:262-269`, kernel grouping by device
  * `scanner/engine/worker.cpp:1190-1292`) mapped to Spark's stage-level
  * scheduling (public `ResourceProfile` API, SPARK-27495).
  *
  * Mapping:
  *  - reference: each op declares the devices its kernels were compiled
  *    for; validation fails fast if a job requests a device with no
  *    kernel; the worker groups adjacent same-device ops into one
  *    pipeline instance so data stays in one address space.
  *  - here: [[Registry]] records per-kernel device capabilities and
  *    [[Registry.validate]] reproduces the fail-fast check; [[place]]
  *    attaches a GPU `ResourceProfile` to the placed segment's RDD.
  *    Spark's stage is the kernel group: everything inside the placed
  *    segment runs in the stage that carries the profile, and the RDD
  *    boundary that stage-level scheduling requires is exactly the
  *    reference's cross-device handoff point
  *    (`evaluate_worker.h:33-36` `move_if_different_address_space`).
  *
  * On a real cluster this schedules the placed stage onto executors with
  * the requested `gpu` resources (YARN/k8s/standalone discovery scripts —
  * public Spark machinery); `local[n]` has no GPU discovery, so execution
  * of a GPU-placed stage is refused by Spark at submit time — the same
  * posture as the reference, which errors when a GPU kernel is requested
  * on a CPU-only worker pool. CPU placement is the identity (no profile,
  * no extra boundary).
  */
object Placement {

  /** Reference `DeviceType` (`metadata.proto:25-28`). */
  sealed trait Device
  object Device {
    case object CPU extends Device
    case object GPU extends Device
  }

  final class ValidationException(msg: String) extends RuntimeException(msg)

  /** Per-kernel device capabilities — the reference's registry of compiled
    * kernel variants (`scanner/api/kernel.h` registration macros carry the
    * device type; validation walk `dag_analysis.cpp:262-269`).
    */
  final class Registry extends Serializable {
    private val caps = mutable.Map.empty[String, Set[Device]]

    def register(kernel: String, devices: Set[Device]): this.type = {
      caps(kernel) = caps.getOrElse(kernel, Set.empty) ++ devices
      this
    }

    def devicesFor(kernel: String): Set[Device] = caps.getOrElse(kernel, Set.empty)

    /** Fail-fast DAG validation: every (kernel, requested device) pair must
      * have a registered kernel variant. Collects ALL failures into one
      * message like the reference's validation pass.
      */
    def validate(placements: Seq[(String, Device)]): Unit = {
      val missing = placements.collect {
        case (k, d) if !caps.contains(k) =>
          s"op $k is not registered"
        case (k, d) if !caps(k).contains(d) =>
          s"no kernel for op $k was compiled for device type $d"
      }
      if (missing.nonEmpty)
        throw new ValidationException(missing.mkString("; "))
    }
  }

  /** The ResourceProfile a GPU placement attaches: `gpusPerTask` gpus per
    * task, executors sized to `gpusPerExecutor` (cluster managers match
    * executor containers to this request).
    */
  def gpuProfile(gpusPerTask: Double = 1.0, gpusPerExecutor: Int = 1): ResourceProfile =
    new ResourceProfileBuilder()
      .require(new TaskResourceRequests().resource("gpu", gpusPerTask))
      .require(new ExecutorResourceRequests().resource("gpu", gpusPerExecutor))
      .build()

  /** Task-only GPU profile (Spark `TaskResourceProfile`): the placed
    * stage's tasks claim `gpusPerTask` from whatever GPUs the DEFAULT
    * executors already discovered — the static-allocation path (Spark
    * supports task-only profiles on standalone/YARN/k8s with dynamic
    * allocation OFF, SPARK-39853), vs [[gpuProfile]] which also asks the
    * cluster manager for differently-shaped executors and therefore
    * needs dynamic allocation. This is the profile a fixed GPU fleet
    * wants: executors are homogeneous, placement just gates which
    * STAGES may occupy a GPU slot.
    */
  def gpuTaskProfile(gpusPerTask: Double = 1.0): ResourceProfile =
    new ResourceProfileBuilder()
      .require(new TaskResourceRequests().resource("gpu", gpusPerTask))
      .build()

  /** Place a kernel segment on a device. Validates against `registry`,
    * then for GPU attaches [[gpuProfile]] to the segment's RDD — the
    * segment becomes its own stage scheduled onto GPU executors. CPU is
    * the identity.
    */
  def place(
      ds: Dataset[Elem],
      kernel: String,
      registry: Registry,
      device: Device,
      gpusPerTask: Double = 1.0,
      taskOnly: Boolean = false): Dataset[Elem] = {
    registry.validate(Seq(kernel -> device))
    device match {
      case Device.CPU => ds
      case Device.GPU =>
        val spark = ds.sparkSession
        // `withResources` registers the profile with the session's
        // ResourceProfileManager, which refuses deployments without
        // stage-level scheduling (local[n], static-allocation YARN…) —
        // surface that as the same fail-fast placement error the
        // reference raises for a GPU kernel on a CPU-only worker pool
        // (`dag_analysis.cpp:262-269`). `taskOnly` picks the
        // static-fleet [[gpuTaskProfile]] (default executors already
        // carry GPUs) over the executor-reshaping [[gpuProfile]].
        val profile =
          if (taskOnly) gpuTaskProfile(gpusPerTask)
          else gpuProfile(gpusPerTask)
        val placed =
          try ds.rdd.withResources(profile)
          catch {
            case e: org.apache.spark.SparkException =>
              throw new ValidationException(
                s"device GPU requested for op $kernel but this deployment " +
                  s"cannot schedule GPU stages: ${e.getMessage}")
          }
        spark.createDataset(placed)(Encoders.product[Elem])
    }
  }
}

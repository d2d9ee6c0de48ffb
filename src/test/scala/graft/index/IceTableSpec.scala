package graft.index

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

class IceTableSpec extends AnyFunSuite {

  private def table(): IceTable =
    new IceTable(Files.createTempDirectory("ice-").toString, new Configuration())

  test("commits chain snapshots and accumulate steps in order") {
    val ice = table()
    assert(ice.currentSnapshotId.isEmpty)
    ice.commitStep(StepInfo("a", "pa", 10, Seq(("f1", 10)), Map("k" -> "v")))
    ice.commitStep(StepInfo("b", "pb", 20, Seq(("f2", 20)), Map.empty))
    assert(ice.currentSnapshotId.contains(1L))
    val steps = ice.completedSteps
    assert(steps.keySet == Set("a", "b"))
    assert(steps.keys.toSeq == Seq("a", "b")) // commit order preserved
    assert(steps("a").rowCount == 10 && steps("a").metrics("k") == "v")
    assert(steps("b").files == Seq(("f2", 20L)))
  }

  test("replacing a step keeps the others and bumps the snapshot") {
    val ice = table()
    ice.commitStep(StepInfo("a", "pa", 1, Nil, Map.empty))
    ice.commitStep(StepInfo("a", "pa2", 2, Nil, Map.empty))
    assert(ice.currentSnapshotId.contains(1L))
    assert(ice.completedSteps("a").table == "pa2")
  }

  test("commitSteps publishes several steps in ONE snapshot") {
    val ice = table()
    ice.commitStep(StepInfo("a", "pa", 1, Seq(("f1", 1)), Map.empty))
    ice.commitSteps(Seq(
      StepInfo("a", "pa", 3, Seq(("f1", 1), ("f2", 2)), Map.empty),
      StepInfo("b", "pb", 5, Seq(("g1", 5)), Map.empty)))
    assert(ice.currentSnapshotId.contains(1L), "one snapshot for the batch")
    assert(ice.completedSteps("a").rowCount == 3)
    assert(ice.completedSteps("b").rowCount == 5)
    assert(ice.snapshotFiles("a") == Seq("pa/f1", "pa/f2"))
  }

  test("lost LATEST pointer is recovered from the snapshot log") {
    val ice = table()
    ice.commitStep(StepInfo("a", "pa", 1, Nil, Map.empty))
    ice.commitStep(StepInfo("b", "pb", 2, Nil, Map.empty))
    // simulate a crash inside the delete+rename pointer swap
    new java.io.File(ice.root, "LATEST").delete()
    assert(ice.currentSnapshotId.contains(1L))
    assert(ice.completedSteps.keySet == Set("a", "b"))
    // and the next commit proceeds normally
    ice.commitStep(StepInfo("c", "pc", 3, Nil, Map.empty))
    assert(ice.currentSnapshotId.contains(2L))
  }
}

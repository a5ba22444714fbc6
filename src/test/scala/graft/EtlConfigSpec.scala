package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.config.EtlConfig

class EtlConfigSpec extends AnyFunSuite {

  val referenceShapedYaml: String =
    """paths:
      |  raw_csv: /tmp/raw/entregas.csv
      |  output_root: /tmp/processed
      |params:
      |- country: EC
      |  start_date: '2025-01-01'
      |  end_date: '2025-06-30'
      |  proccess: 'NO'
      |- country: PE
      |  start_date: '2025-01-01'
      |  end_date: '2025-06-30'
      |  proccess: 'YES'
      |delivery_types:
      |  routine:
      |  - ZPRE
      |  - ZVE1
      |  bonus:
      |  - Z04
      |  - Z05
      |unit_factors:
      |  CS: 20
      |  ST: 1
      |""".stripMargin

  test("parses the reference config shape") {
    val cfg = EtlConfig.fromYaml(referenceShapedYaml).fold(
      e => fail(s"expected valid config, got $e"), identity)
    assert(cfg.rawCsv == "/tmp/raw/entregas.csv")
    assert(cfg.params.map(_.country) == List("EC", "PE"))
    assert(cfg.params.head.startDate == "2025-01-01")
    assert(!cfg.params.head.process && cfg.params(1).process)
    assert(cfg.routineTypes == List("ZPRE", "ZVE1"))
    assert(cfg.bonusTypes == List("Z04", "Z05"))
    assert(cfg.unitFactors == Map("CS" -> 20.0, "ST" -> 1.0))
  }

  test("collects all validation errors") {
    val bad =
      """paths:
        |  raw_csv: /x
        |params:
        |- country: EC
        |  start_date: '2025-99-99x'
        |  end_date: '2025-06-30'
        |  proccess: 'MAYBE'
        |delivery_types:
        |  routine:
        |  - A
        |  bonus:
        |  - A
        |unit_factors:
        |  CS: -3
        |""".stripMargin
    val errs = EtlConfig.fromYaml(bad).swap.getOrElse(fail("expected errors"))
    assert(errs.exists(_.contains("output_root")))
    assert(errs.exists(_.contains("not yyyy-MM-dd")))
    assert(errs.exists(_.contains("proccess")))
    assert(errs.exists(_.contains("overlap")))
    assert(errs.exists(_.contains("unit_factors.CS")))
  }

  test("markProcessed writes back YES and round-trips") {
    val f = Files.createTempFile("graft-cfg", ".yaml")
    Files.writeString(f, referenceShapedYaml)
    val cfg = EtlConfig.load(f.toString).toOption.get
    val updated = EtlConfig.markProcessed(f.toString, cfg, "EC")
    assert(updated.params.forall(_.process))
    val reloaded = EtlConfig.load(f.toString).toOption.get
    assert(reloaded == updated)
    Files.deleteIfExists(f)
  }
}

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

  test("MiniYaml rejects anchors, aliases, merge keys, block scalars, multi-doc loudly") {
    import graft.config.MiniYaml
    def rejects(yaml: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException] { MiniYaml.parse(yaml) }
      assert(e.getMessage.contains(needle), s"message '${e.getMessage}' lacks '$needle'")
    }
    rejects("a: &shared 5\nb: 2", "anchors/aliases")
    rejects("a: 5\nb: *shared", "anchors/aliases")
    rejects("items:\n- *shared", "anchors/aliases")
    rejects("base:\n  x: 1\nchild:\n  <<: *base", "merge keys")
    rejects("text: |\n  line one\n  line two", "block scalars")
    rejects("text: >-\n  folded", "block scalars")
    rejects("---\na: 1\n---\na: 2", "multi-document")
    rejects("a: 1\n...", "multi-document")
    // the escape hatch: QUOTED &/* are plain strings and still parse
    val ok = MiniYaml.parse("glob: '*.csv'\nref: \"&literal\"")
    assert(ok.str("glob").contains("*.csv") && ok.str("ref").contains("&literal"))
    // and the reference-shaped config is untouched by the guards
    assert(EtlConfig.fromYaml(referenceShapedYaml).isRight)
  }
}

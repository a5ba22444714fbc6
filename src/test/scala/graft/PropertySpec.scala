package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.config.{EtlConfig, MiniYaml}

/** Scalacheck properties for the pure-Scala pieces (no Spark session):
  * config render→parse round-trip and the MiniYaml subset parser.
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(50), p)
    assert(res.passed, res.status.toString)
  }

  private val ident: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(12))

  private val dateGen: Gen[String] = for {
    y <- Gen.choose(2000, 2030)
    m <- Gen.choose(1, 12)
    d <- Gen.choose(1, 28)
  } yield f"$y%04d-$m%02d-$d%02d"

  private val cfgGen: Gen[EtlConfig] = for {
    raw <- ident.map(s => s"/tmp/$s.csv")
    out <- ident.map(s => s"/tmp/out-$s")
    nCountries <- Gen.choose(1, 4)
    countries <- Gen.listOfN(nCountries, Gen.listOfN(2, Gen.alphaUpperChar).map(_.mkString))
    d1 <- dateGen
    d2 <- dateGen
    flags <- Gen.listOfN(nCountries, Gen.oneOf(true, false))
    routine <- Gen.nonEmptyListOf(ident.map("R" + _)).map(_.distinct.take(4))
    bonus <- Gen.nonEmptyListOf(ident.map("B" + _)).map(_.distinct.take(4))
    nf <- Gen.choose(1, 4)
    units <- Gen.listOfN(nf, ident.map("U" + _)).map(_.distinct)
    factors <- Gen.listOfN(units.size, Gen.choose(1, 1000))
  } yield {
    val (lo, hi) = if (d1 <= d2) (d1, d2) else (d2, d1)
    EtlConfig(
      rawCsv = raw,
      outputRoot = out,
      params = countries.distinct.zip(flags).map { case (c, f) =>
        graft.config.CountryParam(c, lo, hi, f)
      },
      routineTypes = routine,
      bonusTypes = bonus.filterNot(routine.contains),
      unitFactors = units.zip(factors.map(_.toDouble)).toMap
    )
  }

  test("EtlConfig render → parse is the identity") {
    check(Prop.forAll(cfgGen) { cfg =>
      EtlConfig.fromYaml(EtlConfig.render(cfg)) == Right(cfg)
    })
  }

  test("markProcessed is idempotent and monotone") {
    check(Prop.forAll(cfgGen) { cfg =>
      val f = java.nio.file.Files.createTempFile("graft-prop", ".yaml")
      try {
        java.nio.file.Files.writeString(f, EtlConfig.render(cfg))
        val all = cfg.params.map(_.country).foldLeft(cfg) { (c, country) =>
          EtlConfig.markProcessed(f.toString, c, country)
        }
        all.params.forall(_.process) &&
        EtlConfig.load(f.toString) == Right(all)
      } finally { java.nio.file.Files.deleteIfExists(f); }
    })
  }

  test("MiniYaml scalar quoting round-trips") {
    check(Prop.forAll(ident) { s =>
      val parsed = MiniYaml.parse(s"key: '$s'\n")
      parsed.str("key").contains(s)
    })
  }
}

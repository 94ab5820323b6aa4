package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.chem.Elements

class ElementsSpec extends AnyFunSuite {

  test("formula weights match published molar masses") {
    assert(math.abs(Elements.weightOf("SiO2").get - 60.083) < 0.01)
    assert(math.abs(Elements.weightOf("Al2O3").get - 101.961) < 0.01)
    assert(math.abs(Elements.weightOf("Fe2O3").get - 159.687) < 0.01)
    assert(math.abs(Elements.weightOf("MgO").get - 40.304) < 0.01)
    assert(math.abs(Elements.weightOf("H2O").get - 18.015) < 0.01)
    assert(math.abs(Elements.weightOf("P2O5").get - 141.943) < 0.01)
  }

  test("fractional formulas parse (FeO1.5, Ti1/2O)") {
    assert(math.abs(Elements.weightOf("FeO1.5").get -
      (55.845 + 1.5 * 15.999)) < 1e-9)
    assert(math.abs(Elements.weightOf("Ti1/2O").get -
      (47.867 / 2 + 15.999)) < 1e-9)
  }

  test("classification: chemistry vs junk columns") {
    for (ok <- Seq("SiO2", "FeO", "Fe2O3", "Na2O", "F", "S", "Cl", "Fe3", "CO2"))
      assert(Elements.isChemical(ok), ok)
    for (junk <- Seq("sample", "notes", "Total2x", "XYZ", ""))
      assert(!Elements.isChemical(junk), junk)
  }

  test("cation naming follows the default-oxidation-state convention") {
    assert(Elements.cationName("FeO") == "Fe")
    assert(Elements.cationName("Fe2O3") == "Fe3")
    assert(Elements.cationName("TiO2") == "Ti")
    assert(Elements.cationName("Na2O") == "Na")
    assert(Elements.cationName("Al2O3") == "Al")
    assert(Elements.cationName("P2O5") == "P")
    assert(Elements.cationName("F") == "F")
  }

  test("oxide naming inverts cation naming") {
    for (ox <- Seq("SiO2", "TiO2", "Al2O3", "FeO", "Fe2O3", "MnO", "MgO",
      "CaO", "Na2O", "K2O", "P2O5", "NiO", "Cr2O3"))
      assert(Elements.oxideName(Elements.cationName(ox)) == ox, ox)
    assert(Elements.oxideNameWithState("Fe", 3) == "Fe2O3")
    assert(Elements.oxideNameWithState("Fe", 2) == "FeO")
  }

  test("cation and oxygen counts") {
    assert(Elements.cationAmount("Al2O3") == 2.0)
    assert(Elements.oxygenAmount("Al2O3") == 3.0)
    assert(Elements.cationAmount("SiO2") == 1.0)
    assert(Elements.oxygenAmount("F") == 0.0)
  }
}

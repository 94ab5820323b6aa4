package graft.chem

/** Periodic table + chemical-formula parser.
  *
  * Re-implements the element/oxide classification the reference performs via
  * the `elementMass` package (see call sites in
  * `/root/reference/src/MagmaPandas/core/Elements.py:91-146` and
  * `/root/reference/src/MagmaPandas/core/MagmaFrames/magmaFrame.py:280-313`):
  * parse a column name like "Al2O3" into (element, count) pairs, compute its
  * molar weight, derive cation names ("Al2O3"->"Al", "Fe2O3"->"Fe3"),
  * cation/oxygen counts, and build oxide names back from cations.
  *
  * Atomic weights are the IUPAC/CIAAW conventional standard atomic weights.
  */
object Elements {

  /** Standard atomic weights (g/mol). */
  val atomicWeight: Map[String, Double] = Map(
    "H" -> 1.008, "He" -> 4.002602, "Li" -> 6.94, "Be" -> 9.0121831,
    "B" -> 10.81, "C" -> 12.011, "N" -> 14.007, "O" -> 15.999,
    "F" -> 18.998403163, "Ne" -> 20.1797, "Na" -> 22.98976928,
    "Mg" -> 24.305, "Al" -> 26.9815385, "Si" -> 28.085,
    "P" -> 30.973761998, "S" -> 32.06, "Cl" -> 35.45, "Ar" -> 39.948,
    "K" -> 39.0983, "Ca" -> 40.078, "Sc" -> 44.955908, "Ti" -> 47.867,
    "V" -> 50.9415, "Cr" -> 51.9961, "Mn" -> 54.938044, "Fe" -> 55.845,
    "Co" -> 58.933194, "Ni" -> 58.6934, "Cu" -> 63.546, "Zn" -> 65.38,
    "Ga" -> 69.723, "Ge" -> 72.63, "As" -> 74.921595, "Se" -> 78.971,
    "Br" -> 79.904, "Kr" -> 83.798, "Rb" -> 85.4678, "Sr" -> 87.62,
    "Y" -> 88.90584, "Zr" -> 91.224, "Nb" -> 92.90637, "Mo" -> 95.95,
    "Ru" -> 101.07, "Rh" -> 102.9055, "Pd" -> 106.42, "Ag" -> 107.8682,
    "Cd" -> 112.414, "In" -> 114.818, "Sn" -> 118.71, "Sb" -> 121.76,
    "Te" -> 127.6, "I" -> 126.90447, "Xe" -> 131.293, "Cs" -> 132.90545196,
    "Ba" -> 137.327, "La" -> 138.90547, "Ce" -> 140.116, "Pr" -> 140.90766,
    "Nd" -> 144.242, "Sm" -> 150.36, "Eu" -> 151.964, "Gd" -> 157.25,
    "Tb" -> 158.92535, "Dy" -> 162.5, "Ho" -> 164.93033, "Er" -> 167.259,
    "Tm" -> 168.93422, "Yb" -> 173.045, "Lu" -> 174.9668, "Hf" -> 178.49,
    "Ta" -> 180.94788, "W" -> 183.84, "Re" -> 186.207, "Os" -> 190.23,
    "Ir" -> 192.217, "Pt" -> 195.084, "Au" -> 196.966569, "Hg" -> 200.592,
    "Tl" -> 204.38, "Pb" -> 207.2, "Bi" -> 208.9804, "Th" -> 232.0377,
    "U" -> 238.02891
  )

  /** Default cation oxidation states: an oxide at the default state keeps the
    * bare element symbol as its cation name ("FeO"->"Fe"); non-default states
    * get the state appended ("Fe2O3"->"Fe3"), matching the reference's
    * ("Fe","Fe3") convention (`core/MagmaFrames/magnetite.py:53`).
    */
  val defaultOxidationState: Map[String, Int] = Map(
    "H" -> 1, "Li" -> 1, "Na" -> 1, "K" -> 1, "Rb" -> 1, "Cs" -> 1,
    "Be" -> 2, "Mg" -> 2, "Ca" -> 2, "Sr" -> 2, "Ba" -> 2,
    "Fe" -> 2, "Mn" -> 2, "Ni" -> 2, "Co" -> 2, "Cu" -> 2, "Zn" -> 2,
    "Pb" -> 2, "Cd" -> 2, "Sn" -> 2, "Eu" -> 2,
    "B" -> 3, "Al" -> 3, "Cr" -> 3, "Sc" -> 3, "Y" -> 3, "Ga" -> 3,
    "La" -> 3, "Ce" -> 3, "Pr" -> 3, "Nd" -> 3, "Sm" -> 3, "Gd" -> 3,
    "Tb" -> 3, "Dy" -> 3, "Ho" -> 3, "Er" -> 3, "Tm" -> 3, "Yb" -> 3,
    "Lu" -> 3, "Bi" -> 3,
    "C" -> 4, "Si" -> 4, "Ti" -> 4, "Zr" -> 4, "Hf" -> 4, "Ge" -> 4,
    "Th" -> 4, "U" -> 4, "Mo" -> 4, "Ru" -> 4,
    "P" -> 5, "V" -> 5, "Nb" -> 5, "Ta" -> 5, "As" -> 5,
    "S" -> 6, "Se" -> 6, "Te" -> 6, "W" -> 6, "Re" -> 7
  )

  /** One (element, count) component of a formula; count may be fractional
    * (e.g. "FeO1.5", "Ti1/2O"). */
  final case class Component(element: String, count: Double)

  private val token = "([A-Z][a-z]?)((\\d+/\\d+)|(\\d+\\.\\d+)|(\\d+))?".r

  /** Parse a chemical formula into components. Returns None when the string
    * is not a formula made of known element symbols (the classification test
    * the reference does by attempting a weight calculation,
    * `parse_io/readers.py:50-57`).
    *
    * Memoised: the name universe is tiny (~tens of oxide strings) but these
    * lookups sit under per-row solver loops on executors — regex parsing per
    * call dominated the Shishkina saturation solve before caching. The
    * reference memoises weights the same way (`core/Elements.py:91-146`). */
  def parseFormula(name: String): Option[List[Component]] = {
    if (name == null || name.isEmpty) return None
    parseCache.computeIfAbsent(name, parseUncached(_))
  }

  private val parseCache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[List[Component]]]()

  private def parseUncached(name: String): Option[List[Component]] = {
    val ms = token.findAllMatchIn(name).toList
    if (ms.isEmpty || ms.map(_.matched.length).sum != name.length) return None
    val comps = ms.map { m =>
      val el = m.group(1)
      if (!atomicWeight.contains(el)) return None
      val cnt = Option(m.group(2)) match {
        case None => 1.0
        case Some(c) if c.contains('/') =>
          val Array(n, d) = c.split('/'); n.toDouble / d.toDouble
        case Some(c) => c.toDouble
      }
      Component(el, cnt)
    }
    Some(comps)
  }

  /** Molar weight of a formula, e.g. "Al2O3" -> 101.960. */
  def weightOf(formula: String): Option[Double] =
    parseFormula(formula).map(_.map(c => atomicWeight(c.element) * c.count).sum)

  /** Classification used for column typing: a name is "chemical" if it parses
    * as a formula, after stripping digits when it contains no oxygen — the
    * reference strips digits from cation names like "Fe3"
    * (`core/Elements.py:110-114`). */
  def isChemical(name: String): Boolean = chemicalWeight(name).isDefined

  /** Weight keyed the way the reference keys it: cation names with charge
    * digits ("Fe3") weigh as the bare element. Memoised like
    * [[parseFormula]]. */
  def chemicalWeight(name: String): Option[Double] =
    weightCache.computeIfAbsent(name, { n: String =>
      val lookup = if (n.contains("O")) n else n.replaceAll("\\d+", "")
      weightOf(lookup)
    })

  private val weightCache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[Double]]()

  /** Number of cations (non-oxygen atoms of the leading element) per formula
    * unit: Al2O3 -> 2, SiO2 -> 1, Fe -> 1. */
  def cationAmount(oxide: String): Double =
    parseFormula(oxide).flatMap(_.find(_.element != "O")).map(_.count).getOrElse(1.0)

  /** Oxygen atoms per formula unit: Al2O3 -> 3, MgO -> 1, F -> 0. */
  def oxygenAmount(oxide: String): Double =
    parseFormula(oxide).flatMap(_.find(_.element == "O")).map(_.count).getOrElse(0.0)

  /** The cation element symbol of an oxide ("Al2O3" -> "Al"; cation names
    * pass through with digits stripped: "Fe3" -> "Fe"). */
  def cationElement(name: String): String =
    parseFormula(if (name.contains("O")) name else name.replaceAll("\\d+", ""))
      .flatMap(_.find(_.element != "O")).map(_.element)
      .getOrElse(name.replaceAll("\\d+", ""))

  /** Cation NAME of an oxide: element symbol, plus the oxidation state when
    * it differs from the element's default ("FeO"->"Fe", "Fe2O3"->"Fe3",
    * "TiO2"->"Ti"). Non-oxides (F, S, Cl) keep their symbol. */
  def cationName(oxide: String): String =
    cationNameCache.computeIfAbsent(oxide, { ox: String =>
      val el = cationElement(ox)
      val nO = oxygenAmount(ox)
      if (nO == 0.0) el
      else {
        val nCat = cationAmount(ox)
        val state = math.round(2.0 * nO / nCat).toInt
        if (defaultOxidationState.get(el).contains(state)) el else s"$el$state"
      }
    })

  private val cationNameCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Inverse of [[cationName]]: build the oxide formula for a cation name.
    * "Fe3" -> "Fe2O3"; "Ti" -> "TiO2" (default state); "Na" -> "Na2O".
    * Elements with no default state (F, Cl) are returned unchanged. */
  def oxideName(cation: String): String = {
    val el = cation.replaceAll("\\d+", "")
    val stateOpt = "\\d+".r.findFirstIn(cation).map(_.toInt)
      .orElse(defaultOxidationState.get(el))
    stateOpt match {
      case None => el
      case Some(state) =>
        if (state % 2 == 0) {
          val nO = state / 2
          if (nO == 1) s"${el}O" else s"${el}O$nO"
        } else if (state == 1) s"${el}2O"
        else s"${el}2O$state"
    }
  }

  /** Oxide name with an explicit oxidation state override (reference
    * `oxides(oxidation_state={"Fe":3})`, `magmaFrame.py:266-313`). */
  def oxideNameWithState(cation: String, state: Int): String = {
    val el = cation.replaceAll("\\d+", "")
    oxideName(s"$el$state")
  }
}

package graft.functions

/** The VIAF cluster name-resolution brain (ref `viaf.py:541-640`
  * extract_viaf_info + `viaf.py:652-696` best_choice /
  * `viaf.py:707-726` combine_nameparts): given one parsed cluster
  * (sort names, UNIMARC nameparts, Wikipedia source) and the caller's
  * working names, derive the sort name (popularity consensus), display
  * name (Wikipedia page beats namepart reconstruction beats the
  * working name), and family name. Pure Scala over the
  * `XmlKernels.ViafCluster` fields — no Spark imports; the Spark-side
  * use is a map over parsed cluster rows.
  *
  * Counter semantics follow Python's `Counter.most_common`: ties break
  * toward the FIRST-seen value.
  */
object ViafNames {

  final case class UnimarcParts(given: Option[String], family: Option[String],
                                extra: Option[String], sortName: Option[String])

  final case class NameInfo(viaf: Option[String], sortName: Option[String],
                            displayName: Option[String],
                            familyName: Option[String],
                            wikipediaName: Option[String])

  /** Most common value, first-seen wins ties (Counter.most_common). */
  private[functions] def firstSeenMostCommon(items: Seq[String]): Option[String] =
    if (items.isEmpty) None
    else {
      val counts = scala.collection.mutable.LinkedHashMap[String, Int]()
      items.foreach(i => counts.update(i, counts.getOrElse(i, 0) + 1))
      Some(counts.maxBy(_._2)._1)
    }

  /** combine_nameparts (ref `viaf.py:707-724`): 3-tuple → display
    * name; a `pseud...` extra is never appended. */
  def combineNameparts(given: Option[String], family: Option[String],
                       extra: Option[String]): Option[String] = {
    if (given.isEmpty && family.isEmpty) return None
    var display = (given, family) match {
      case (None, Some(f)) => f
      case (Some(g), None) => g
      case (Some(g), Some(f)) => g + " " + f
      case _ => return None
    }
    extra.filter(!_.startsWith("pseud")).foreach { e =>
      display += (if (given.nonEmpty && family.nonEmpty) ", " + e else " " + e)
    }
    Some(display)
  }

  /** best_choice (ref `viaf.py:652-696`): most common family name,
    * then most common given for that family, then the most common
    * extra for that (family, given) — unless "no extra" is equally
    * viable, in which case no extra. */
  def bestChoice(possibilities: Seq[(Option[String], Option[String], Option[String])])
      : (Option[String], Option[String], Option[String]) = {
    if (possibilities.isEmpty) return (None, None, None)
    if (possibilities.length == 1) return possibilities.head
    val families = scala.collection.mutable.LinkedHashMap[String, Int]()
    val givenFor = scala.collection.mutable.LinkedHashMap[(String, String), Int]()
    val extraFor = scala.collection.mutable.LinkedHashMap[(String, String, Option[String]), Int]()
    possibilities.foreach { case (g, f, e) =>
      f.foreach { family =>
        families.update(family, families.getOrElse(family, 0) + 1)
        g.foreach { given =>
          givenFor.update((family, given), givenFor.getOrElse((family, given), 0) + 1)
          extraFor.update((family, given, e),
            extraFor.getOrElse((family, given, e), 0) + 1)
        }
      }
    }
    if (families.isEmpty) return (None, None, None)
    val family = families.maxBy(_._2)._1
    val givens = givenFor.collect { case ((`family`, g), n) => g -> n }.toSeq
    if (givens.isEmpty) return (None, Some(family), None)
    val given = givens.maxBy(_._2)._1
    val extras = extraFor.collect { case ((`family`, `given`, e), n) => e -> n }.toSeq
    var extra: Option[String] = None
    if (extras.nonEmpty) {
      val (top, topCount) = extras.maxBy(_._2)
      val noneCount = extras.collectFirst { case (None, n) => n }.getOrElse(0)
      // don't add extra stuff if "no extra" is a viable option
      extra = if (noneCount == topCount) None else top
    }
    (Some(given), Some(family), extra)
  }

  private def dropTrailingComma(s: String): String =
    if (s.endsWith(",")) s.dropRight(1) else s

  /** extract_viaf_info (ref `viaf.py:541-640`), minus the
    * match-confidence scoring (that is M2's `ViafScoring`): resolve
    * sort / display / family names for one cluster.
    *
    * @param sortNamesRaw MARC21 100/110 $a values, document order
    * @param unimarcs     parsed UNIMARC nameparts (comma-stripped)
    */
  def extractNameInfo(viafId: Option[String], sortNamesRaw: Seq[String],
                      unimarcs: Seq[UnimarcParts],
                      wikipediaName: Option[String],
                      workingSortName: Option[String] = None,
                      workingDisplayName: Option[String] = None): NameInfo = {
    // popularity prior over the cluster's sort names (viaf.py:533-539)
    val popularity = scala.collection.mutable.ListBuffer[String]()
    sortNamesRaw.foreach(n => popularity += dropTrailingComma(n))

    // a Wikipedia page name beats everything for the display name
    val wikiDisplay = wikipediaName.map(Names.wikipediaNameToDisplayName)
    val effectiveWorkingDisplay = wikiDisplay.orElse(workingDisplayName)
    val knownName = workingSortName.orElse(effectiveWorkingDisplay)

    // UNIMARC candidates must resemble the known name (viaf.py:584-610)
    val candidates =
      scala.collection.mutable.ListBuffer[(Option[String], Option[String], Option[String])]()
    unimarcs.foreach { u =>
      val include = Seq(u.given, u.family, u.extra).flatten
        .exists(v => knownName.isEmpty || knownName.get.contains(v))
      if (include) {
        candidates += ((u.given, u.family, u.extra))
        u.sortName.foreach(s => popularity += dropTrailingComma(s))
      }
    }

    // corroboration gate (ref viaf.py:324-331): a working sort name is
    // never returned verbatim — it selects the CLUSTER's first sort name
    // that fuzzy-matches it > 90 (the cluster's matched form, kept
    // verbatim as the reference does); with no such match the popularity
    // consensus decides, exactly as in the no-working-name case
    // (viaf.py:612-613 gates on `not contributor_data.sort_name`).
    // NOTE the reference asymmetry is preserved deliberately: the
    // corroborated form keeps a trailing comma if the heading has one,
    // while the consensus path strips it (viaf.py:534-537) — matching
    // viaf.py exactly beats internal consistency here.
    val corroborated = workingSortName.flatMap { w =>
      sortNamesRaw.find(n => Fuzzy.contributorNameMatchRatio(n, w) > 90)
    }
    val sortName = corroborated.orElse(firstSeenMostCommon(popularity.toSeq))

    // a clean two-part Wikipedia display name is itself a candidate
    wikiDisplay.foreach { d =>
      val parts = d.split(" ")
      if (parts.length == 2)
        candidates += ((Some(parts(0)), Some(parts(1)), None))
    }

    val (given, family, extra) = bestChoice(candidates.toSeq)
    val display = wikiDisplay
      .orElse(combineNameparts(given, family, extra))
      .orElse(workingDisplayName)
    NameInfo(viafId, sortName, display, family, wikipediaName)
  }
}

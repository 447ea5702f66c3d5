package graft.model

/** The in-flight metadata DTO layer (SURVEY.md §1.2) — the nested-row
  * representation external sources are parsed into and merged from
  * (ref `core.metadata_layer` usage at `controller.py:50-56`,
  * `oclc/classify.py:97-128`, `content_cafe.py:190-216`).
  * Encoded as a Spark `Dataset[Metadata]` via product encoders.
  */
final case class IdentifierData(idType: String, identifier: String)

final case class ContributorData(
    sortName: String = null,
    displayName: String = null,
    familyName: String = null,
    viaf: String = null,
    lc: String = null,
    wikipediaName: String = null,
    roles: Seq[String] = Seq.empty,
    extra: Map[String, String] = Map.empty)

final case class SubjectData(
    subjectType: String, identifier: String,
    name: String = null, weight: Int = 1)

final case class MeasurementData(quantity: String, value: Double)

final case class LinkData(rel: String, href: String, mediaType: String = null)

final case class Metadata(
    dataSource: String,
    primaryIdentifier: IdentifierData,
    title: String = null,
    subtitle: String = null,
    language: String = null,
    publisher: String = null,
    publishedYear: String = null,
    identifiers: Seq[IdentifierData] = Seq.empty,
    contributors: Seq[ContributorData] = Seq.empty,
    subjects: Seq[SubjectData] = Seq.empty,
    measurements: Seq[MeasurementData] = Seq.empty,
    links: Seq[LinkData] = Seq.empty)

/** An edition row — the merge target (SURVEY.md §1.1 Edition). */
final case class Edition(
    editionId: Long,
    identifierType: String,
    identifier: String,
    title: String = null,
    subtitle: String = null,
    language: String = null,
    publisher: String = null,
    author: String = null,
    sortAuthor: String = null,
    permanentWorkId: String = null)

/** Which post-merge presentation recalculations run (ref the
  * `PresentationCalculationPolicy` built all-false at
  * `controller.py:609-618`). Each flag maps to an engine stage:
  * chooseEdition → M6 election, setEditionMetadata → work-id/sort-name
  * recompute, classify → A4 subject rollup, chooseSummary/chooseCover →
  * link election, calculateQuality → A8-style calibration,
  * regenerateOpdsEntries → S10 render.
  */
final case class PresentationCalculationPolicy(
    chooseEdition: Boolean = true,
    setEditionMetadata: Boolean = true,
    classify: Boolean = true,
    chooseSummary: Boolean = true,
    calculateQuality: Boolean = true,
    chooseCover: Boolean = true,
    regenerateOpdsEntries: Boolean = false)

object PresentationCalculationPolicy {
  /** The all-false policy of `controller.py:609-618`: apply the
    * metadata, recalculate nothing. */
  val recalculateNothing: PresentationCalculationPolicy =
    PresentationCalculationPolicy(false, false, false, false, false, false, false)
}

/** Field-gated merge policy (ref `ReplacementPolicy` /
  * `PresentationCalculationPolicy` built at `coverage_utils.py:20-49`,
  * all-false example at `controller.py:609-618`).
  *
  * Scalar edition fields are filled from metadata when the metadata has
  * a value (source data wins); `replaceScalars = false` restricts the
  * merge to filling NULL edition fields only. List-valued children
  * carry INDEPENDENT flags: replace = drop the edition's existing rows
  * from the same data source, then add the incoming rows; non-replace =
  * union-dedup additively (identifiers are always additive in the
  * reference — equivalencies are added, never retracted — so
  * `replaceIdentifiers` defaults false), and non-replace contributions
  * leave the edition's contributor list untouched.
  */
final case class ReplacementPolicy(
    replaceScalars: Boolean = true,
    replaceSubjects: Boolean = false,
    replaceLinks: Boolean = false,
    replaceIdentifiers: Boolean = false,
    replaceContributions: Boolean = false,
    presentation: PresentationCalculationPolicy = PresentationCalculationPolicy())

object ReplacementPolicy {
  /** Trusted-metadata-source defaults (the wrangler's posture,
    * `coverage_utils.py:20-49`): bibliographic children come from the
    * source; licensing data untouched. */
  val fromMetadataSource: ReplacementPolicy = ReplacementPolicy(
    replaceSubjects = true, replaceLinks = true, replaceContributions = true)

  /** Apply the metadata, recalculate nothing (`controller.py:609-628`):
    * child lists additive, presentation untouched. */
  val passThrough: ReplacementPolicy = ReplacementPolicy(
    presentation = PresentationCalculationPolicy.recalculateNothing)
}

package graft.queries

import graft.{Env, Q}
import graft.syntax._
import graft.operators.ViafScoring
import graft.streaming.Streams
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scoring/orchestration queries: M2+M3 candidate ranking, M5
  * equivalency strength blend, T1 sweep batch leg. Candidate frames
  * are synthesized deterministically; oracles mirror the arithmetic
  * term-for-term (addition order preserved).
  */
object ScoringQueries {

  /** M2+M3 — score synthesized VIAF candidates per request (customer),
    * apply the popularity override from the rank-1 candidate, pick the
    * accepted winner (ref `viaf.py:144-231`, `393-450`). */
  def m2ViafRank(env: Env): DataFrame = {
    val cands = env.orders.select(
      $"o_custkey".as("request_id"),
      $"o_orderkey".as("candidate_id"),
      row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"o_custkey").orderBy($"o_orderkey"))
        .cast("double").as("library_popularity"),
      when($"o_orderkey" % 5 =!= 0, ($"o_orderkey" * 7 % 101).cast("double"))
        .as("sort_name_match"),
      when($"o_orderkey" % 5 === 0, ($"o_orderkey" * 13 % 101).cast("double"))
        .as("guessed_sort_match"),
      ($"o_orderkey" % 2 === 0).as("has_display_name"),
      ($"o_orderkey" % 3 === 0).as("has_viaf"),
      when($"o_orderkey" % 4 === 0, lit(48.0)).as("title_evidence"))
    ViafScoring.rankCandidates(cands)
      .orderBy($"request_id")
  }

  /** M2 end-to-end over PARSED clusters: synthesize one VIAF cluster
    * per candidate order (MARC21 100$a sort name; odd keys add a
    * UNIMARC a/b datafield, every 3rd a 400$a alternate form, every
    * 4th a WKP| source), single-parse with the kernel, compute fuzzy
    * evidence against the request's working name, and rank with ALL
    * `weigh` evidence terms live — sort/display/unimarc/alternate
    * (ref `viaf.py:144-231` weigh_contributor; name extraction
    * `viaf.py:277-304`, `522-530`, `707-726`). Unlike `m2_viaf_rank`
    * (which scores a pre-built evidence frame), this exercises the
    * parse→evidence→score pipeline the reference runs per contributor.
    */
  def m2ViafEvidence(env: Env): DataFrame = {
    // localCheckpoint: the narrow request frame feeds BOTH the cluster
    // synthesis/parse and the evidence join-back — without it the
    // orders⋈customer join runs twice.
    val requests = env.spread(env.orders) // single-row-group input: see Env.spread
      .join(env.customer, $"o_custkey" === $"c_custkey")
      .select($"o_custkey".as("request_id"), $"c_name".as("working"),
              $"o_orderkey".as("cand_key"))
      .localCheckpoint(eager = false)
    val k = $"cand_key"
    val uni = when(k % 2 === 1, concat(
        lit("<datafield dtype=\"UNIMARC\" tag=\"200\"><subfield code=\"a\">"),
        $"working", lit(",</subfield><subfield code=\"b\">G"), k % 10,
        lit("</subfield></datafield>"))).otherwise(lit(""))
    val wkp = when(k % 4 === 0, concat(
        lit("<sources><source>WKP|"), $"working",
        lit("_(Author)</source></sources>"))).otherwise(lit(""))
    val alt = when(k % 3 === 0, concat(
        lit("<datafield dtype=\"MARC21\" tag=\"400\"><subfield code=\"a\">"),
        $"working", lit("y</subfield></datafield>"))).otherwise(lit(""))
    val sortName = when(k % 2 === 0, $"working")
      .otherwise(concat($"working", lit(" X")))
    // cluster titles: k%3==0 an unfluff-exact variant of known title 1,
    // k%3==1 a fuzzy (>80 ratio) variant, k%3==2 no match; every 4th
    // cluster adds a second title exactly matching known title 2 so the
    // per-known-title accumulation of weigh_titles is exercised
    val titles = concat(
      lit("<titles><work><title>"),
      when(k % 3 === 0, concat(lit("The Book "), $"request_id", lit(".")))
        .when(k % 3 === 1, concat(lit("Book "), $"request_id", lit("x")))
        .otherwise(concat(lit("Zzz "), k)),
      lit("</title></work>"),
      when(k % 4 === 0, concat(lit("<work><title>The Saga "), $"request_id",
        lit(": special edition!!</title></work>"))).otherwise(lit("")),
      lit("</titles>"))
    val xml = concat(
      lit("<VIAFCluster><viafID>"), k, lit("</viafID>"), wkp,
      lit("<datafield dtype=\"MARC21\" tag=\"100\"><subfield code=\"a\">"),
      sortName, lit("</subfield></datafield>"), uni, alt, titles,
      lit("</VIAFCluster>"))
    val snap = requests.select(k.as("cand_key"), xml.as("xml"))
    val parsed = graft.sources.BiblioXml.parseViafFull(snap, "cand_key", "xml")
    val withReq = parsed.join(
      requests.select($"request_id", $"working", $"cand_key"),
      parsed("key") === $"cand_key")
    def ratio(b: org.apache.spark.sql.Column) =
      graft.functions.ColumnFunctions.levenshteinRatio($"working", b)
    // the request's known titles (ref weigh_titles known_titles arg);
    // cluster titles come from the parsed <titles> section
    val weighTitlesUdf = udf((known: Seq[String], contrib: Seq[String]) =>
      ViafScoring.weighTitles(known, contrib))
    val knownTitles = array(
      concat(lit("Book "), $"request_id"),
      concat(lit("Saga "), $"request_id", lit(": special edition")))
    val cands = withReq.select(
      $"request_id", $"key".as("candidate_id"),
      row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"request_id").orderBy($"key"))
        .cast("double").as("library_popularity"),
      ratio(get($"sort_names", lit(0))).cast("double").as("sort_name_match"),
      when($"wikipedia_name".isNotNull,
        ratio(graft.functions.GraftFunctions.wikipediaToDisplay($"wikipedia_name")))
        .cast("double").as("display_name_match"),
      when(size($"unimarc_names") > 0,
        ratio(get($"unimarc_names", lit(0)).getField("sort_name")))
        .cast("double").as("unimarc_match"),
      lit(null).cast("double").as("guessed_sort_match"),
      when(size($"alternate_names") > 0,
        ratio(get($"alternate_names", lit(0))))
        .cast("double").as("alternate_match"),
      $"wikipedia_name".isNotNull.as("has_display_name"),
      ($"viaf_id" =!= "").as("has_viaf"),
      weighTitlesUdf(knownTitles, $"titles")
        .cast("double").as("title_evidence"))
    ViafScoring.rankCandidates(cands)
      .orderBy($"request_id")
  }

  /** M2c — cluster name RESOLUTION over parsed clusters (ref
    * `viaf.py:541-640` via `ViafNames.extractNameInfo`): popularity
    * consensus for the sort name, Wikipedia-beats-reconstruction for
    * the display name, best_choice nameparts for the family name.
    * Each customer's cluster carries two identical 100$a headings, a
    * UNIMARC namepart record, and (every 4th) a Wikipedia source that
    * overrides the reconstructed display name. */
  def m2NameResolution(env: Env): DataFrame = {
    import org.apache.spark.sql.Encoders
    implicit val clusterEnc: org.apache.spark.sql.Encoder[graft.sources.XmlKernels.ViafCluster] =
      Encoders.product[graft.sources.XmlKernels.ViafCluster]
    implicit val outEnc: org.apache.spark.sql.Encoder[(Long, String, String, String)] =
      Encoders.product[(Long, String, String, String)]
    val k = $"c_custkey"
    val wkp = when(k % 4 === 0, concat(
      lit("<sources><source>WKP|Wiki"), k,
      lit("_Page</source></sources>"))).otherwise(lit(""))
    val marc = concat(
      lit("<datafield dtype=\"MARC21\" tag=\"100\"><subfield code=\"a\">"),
      $"c_name", lit("</subfield></datafield>"))
    val xml = concat(
      lit("<VIAFCluster><viafID>"), k, lit("</viafID>"), wkp, marc, marc,
      lit("<datafield dtype=\"UNIMARC\" tag=\"200\"><subfield code=\"a\">Fam"),
      k % 50, lit(",</subfield><subfield code=\"b\">Giv"), k % 20,
      lit("</subfield></datafield></VIAFCluster>"))
    val snap = env.customer.select(k.as("kk"), xml.as("xml"))
    graft.sources.BiblioXml.parseViafFull(snap, "kk", "xml")
      .withColumn("key", $"key".cast("string"))
      .as[graft.sources.XmlKernels.ViafCluster]
      .map { c =>
        val info = graft.functions.ViafNames.extractNameInfo(
          Some(c.viaf_id).filter(_.nonEmpty), c.sort_names.toSeq,
          c.unimarc_names.toSeq.map(u => graft.functions.ViafNames.UnimarcParts(
            u.given, u.family, u.extra, Some(u.sort_name).filter(_.nonEmpty))),
          c.wikipedia_name)
        (c.key.toLong, info.sortName.orNull, info.displayName.orNull,
         info.familyName.orNull)
      }
      .toDF("key", "sort_name", "display_name", "family_name")
      .orderBy($"key")
  }

  /** M5 — equivalency strength setter (ref
    * `oclc/linked_data.py:1082-1116`): 0.8·title-similarity +
    * 0.2·author-set overlap over blocked candidate pairs; emits the new
    * equivalency rows above the 0.5 floor.
    *
    * Pair stage is a compiled per-cell kernel (like the cosine pair
    * scan): sub-blocks are grouped once, each cell enumerates its pairs
    * with primitive-loop levenshtein and sorted-set overlap — the
    * expression form spent 14µs/pair in interpreted
    * array_intersect/union. Same formula, same rounding, identical
    * results.
    *
    * Scale shape (same move as [[Functions.f3BlockedSimilarity]], which
    * documents the band/bucket/dedup-rule math): strength > 0.5 (6dp
    * HALF_UP) needs ts ≥ 0.375, i.e. lev ≤ 0.625·maxlen ≥ |Δlen|, so a
    * qualifying pair has maxlen/minlen ≤ 1/0.375 < 2.67 — geometric
    * length bands with r = 2.67 put every qualifying pair in the same
    * or adjacent band. Rows shuffle to buckets {band, band−1}; a pair
    * is compared once, in the bucket of its smaller band. Inside the
    * kernel the length-sorted scan breaks at the first j with
    * (len_j−len_i)·100 ≥ 63·len_j (monotone; such pairs fail the
    * |Δlen| prune and can never emit). Integer-arithmetic prunes only —
    * the emitted set is bit-identical to the unbanded form, verified by
    * the unchanged oracle.
    */
  def m5EquivStrength(env: Env): DataFrame = {
    val sups = env.lineitem.groupBy($"l_partkey")
      .agg(sort_array(collect_set($"l_suppkey")).as("sups"))
    m5Banded(env.part, sups)
  }

  /** The banded plan over explicit (parts, sups) frames — split out so
    * FunctionsPropertySpec can drive it with adversarial inputs against
    * a local brute-force reference (see [[graft.queries.Functions.f3Banded]]). */
  private[graft] def m5Banded(parts: DataFrame, sups: DataFrame): DataFrame = {
    val spark = parts.sparkSession
    import org.apache.spark.sql.Encoders
    implicit val enc =
      Encoders.product[(Int, Seq[(Long, String, Seq[Long], Int)])]
    implicit val outEnc = Encoders.product[(Long, Long, Double)]
    // ln(1/0.375) = 0.9808 < ln 2.67 = 0.9821 → qualifying pairs span ≤ 1
    // band. UTF-16 units, not code points — must match the kernel's
    // String.length (see f3Banded).
    val len16 = octet_length(encode($"p_name", "UTF-16BE")) / 2
    val band = floor(log(greatest(len16, lit(1)).cast("double"))
                       / lit(math.log(2.67))).cast("int")
    val cells = parts
      .select($"p_partkey", $"p_name", $"p_brand",
              split($"p_name", " ").getItem(0).as("tok0"), band.as("band"))
      .join(sups, $"p_partkey" === $"l_partkey")
      .select($"p_partkey", $"p_name", $"p_brand", $"tok0", $"band", $"sups",
              explode(array($"band", $"band" - 1)).as("bucket"))
      .groupBy($"p_brand", $"tok0", $"bucket")
      .agg(collect_list(struct($"p_partkey", $"p_name", $"sups", $"band"))
             .as("members"))
      .select($"bucket", $"members")
      .as[(Int, Seq[(Long, String, Seq[Long], Int)])]

    cells.flatMap { case (bucket, members) =>
      // Sort by (len, name, key): identical names form adjacent RUNS, so
      // the O(len²) DP runs once per distinct-name pair and per-key-pair
      // work is only the O(|sups|) sorted-merge — output-bound on
      // dup-heavy data. Unbox once per member: parallel primitive
      // arrays, not tuple/Seq access in the pair loops.
      val ms = members.sortBy(m => (m._2.length, m._2, m._1)).toArray
      val n = ms.length
      val keys = ms.map(_._1)
      val names = ms.map(_._2)
      val supsArr = ms.map(_._3.toArray)
      val bands = ms.map(_._4)
      // run(i) = exclusive end of the identical-name run starting at i
      val runEnd = new Array[Int](n)
      var r0 = 0
      while (r0 < n) {
        var r1 = r0 + 1
        while (r1 < n && names(r1) == names(r0)) r1 += 1
        var t = r0; while (t < r1) { runEnd(t) = r1; t += 1 }
        r0 = r1
      }
      val out = Seq.newBuilder[(Long, Long, Double)]
      // round6 HALF_UP; cheap double precheck (conservatively low
      // threshold) skips the BigDecimal for clearly-failing pairs
      def emitIfAbove(ki: Long, kj: Long, ts: Double,
                      sa: Array[Long], sb: Array[Long]): Unit = {
        var x = 0; var y = 0; var inter = 0
        while (x < sa.length && y < sb.length) { // sorted-merge intersect
          if (sa(x) == sb(y)) { inter += 1; x += 1; y += 1 }
          else if (sa(x) < sb(y)) x += 1 else y += 1
        }
        val as = inter.toDouble / (sa.length + sb.length - inter)
        val v = ts * 0.8 + as * 0.2 // same float order as the oracle form
        if (v > 0.49999) {
          val strength = java.math.BigDecimal.valueOf(v)
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
          if (strength > 0.5) {
            if (ki < kj) out += ((ki, kj, strength))
            else out += ((kj, ki, strength))
          }
        }
      }
      var i = 0
      while (i < n) { // i is a run head; advance run-by-run
        val iEnd = runEnd(i)
        val na = names(i); val la = na.length
        // identical names within the run: ts = 1 — home bucket only
        if (bands(i) == bucket) {
          var x = i
          while (x < iEnd) {
            var y = x + 1
            while (y < iEnd) { // run pre-sorted by key
              emitIfAbove(keys(x), keys(y), 1.0, supsArr(x), supsArr(y))
              y += 1
            }
            x += 1
          }
        }
        // cross-run pairs: ONE DP per distinct-name pair, reused across
        // the key-pair expansion
        var j = iEnd
        var inWindow = true
        while (j < n && inWindow) {
          val nb = names(j); val lb = nb.length // ≥ la (length-sorted)
          if ((lb - la) * 100 >= 63 * lb) inWindow = false
          else {
            val jEnd = runEnd(j)
            if (bands(i) == bucket || bands(j) == bucket) {
              val lev = graft.functions.Fuzzy.levenshtein(na, nb)
              val ts = 1.0 - lev.toDouble / lb
              // SOUND skip: jaccard ≤ 1 caps every key pair of this name
              // pair at round6(0.8·ts + 0.2) — under the floor, skip all
              if (ts * 0.8 + 0.2 > 0.49999) {
                var x = i
                while (x < iEnd) {
                  var y = j
                  while (y < jEnd) {
                    emitIfAbove(keys(x), keys(y), ts, supsArr(x), supsArr(y))
                    y += 1
                  }
                  x += 1
                }
              }
            }
            j = jEnd
          }
        }
        i = iEnd
      }
      out.result()
    }.toDF("src", "dst", "strength")
      .orderBy($"src", $"dst")
  }

  /** T1 — one sweep over a synthesized coverage-state table (ref
    * `monitor.py:30-96`; batch leg of the streaming drain). */
  def t1Sweep(env: Env): DataFrame = {
    val records = env.customer.select(
      $"c_custkey".cast("string").as("identifier"),
      when($"c_custkey" % 4 === 0, "REGISTERED")
        .when($"c_custkey" % 4 === 1, "TRANSIENT_FAILURE")
        .when($"c_custkey" % 4 === 2, "SUCCESS")
        .otherwise("TRANSIENT_FAILURE").as("status"),
      when($"c_custkey" % 4 === 1, 1)
        .when($"c_custkey" % 4 === 3, 3)
        .otherwise(lit(1)).as("attempts"))
    val swept = Streams.sweepOnce(records, needing =>
      needing.select($"identifier",
        when($"identifier".cast("long") % 3 =!= 0, "SUCCESS")
          .otherwise("TRANSIENT_FAILURE").as("status"),
        ($"attempts" + 1).as("attempts")))
    swept
      .select($"identifier".cast("long").as("key"), $"status", $"attempts")
      .orderBy($"key")
  }

  val entries: Seq[Q] = Seq(
    Q.sql("m2_viaf_rank", m2ViafRank,
      """WITH cand AS (
        |  SELECT o_custkey AS request_id, o_orderkey AS candidate_id,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_orderkey) AS DOUBLE) AS pop,
        |    CASE WHEN o_orderkey % 5 <> 0
        |         THEN CAST(o_orderkey * 7 % 101 AS DOUBLE) END AS sn,
        |    CASE WHEN o_orderkey % 5 = 0
        |         THEN CAST(o_orderkey * 13 % 101 AS DOUBLE) END AS gsn,
        |    o_orderkey % 2 = 0 AS hdn,
        |    o_orderkey % 3 = 0 AS hv,
        |    CASE WHEN o_orderkey % 4 = 0 THEN 48.0 END AS te
        |  FROM orders),
        |topflag AS (
        |  SELECT request_id,
        |    ((sn IS NOT NULL AND sn < 50) OR (gsn IS NOT NULL AND gsn < 50)
        |     OR (sn IS NULL AND gsn IS NULL)) AS ignore_pop
        |  FROM cand WHERE pop = 1),
        |scored AS (
        |  SELECT c.request_id, c.candidate_id, c.pop,
        |    COALESCE(t.ignore_pop, FALSE) AS ignore_pop,
        |    round(
        |      (CASE WHEN COALESCE(t.ignore_pop, FALSE) OR c.pop IS NULL
        |            THEN 0.0 ELSE -10.0 * c.pop END)
        |      + COALESCE(c.sn, 0.0) * 2.0
        |      + COALESCE(c.gsn, 0.0) * 0.5
        |      + (CASE WHEN c.hdn THEN 0.2 ELSE 0.0 END)
        |      + (CASE WHEN c.hv THEN 0.2 ELSE 0.0 END)
        |      + COALESCE(c.te, 0.0), 2) AS score
        |  FROM cand c LEFT JOIN topflag t USING (request_id)),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY request_id
        |    ORDER BY score DESC, pop ASC) AS rn
        |  FROM scored)
        |SELECT request_id, candidate_id, score, ignore_pop
        |FROM ranked WHERE rn = 1 AND score >= 70.0
        |ORDER BY request_id""".stripMargin),

    Q.sql("m2_viaf_evidence", m2ViafEvidence,
      """WITH cand AS (
        |  SELECT o_custkey AS request_id, o_orderkey AS k, c_name AS w,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_orderkey) AS DOUBLE) AS pop
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |tl AS (
        |  SELECT request_id, k,
        |    'Book ' || request_id AS kt1,
        |    'Saga ' || request_id || ': special edition' AS kt2,
        |    CASE WHEN k % 3 = 0 THEN 'The Book ' || request_id || '.'
        |         WHEN k % 3 = 1 THEN 'Book ' || request_id || 'x'
        |         ELSE 'Zzz ' || k END AS ct1,
        |    CASE WHEN k % 4 = 0
        |         THEN 'The Saga ' || request_id || ': special edition!!'
        |    END AS ct2
        |  FROM cand),
        |tn AS (
        |  SELECT request_id, k,
        |    trim(regexp_replace(regexp_replace(lower(kt1),
        |      '^((the|a|an) )+', ''), '[[:punct:]]+$', '')) AS u_kt1,
        |    trim(regexp_replace(regexp_replace(lower(kt2),
        |      '^((the|a|an) )+', ''), '[[:punct:]]+$', '')) AS u_kt2,
        |    trim(regexp_replace(regexp_replace(lower(ct1),
        |      '^((the|a|an) )+', ''), '[[:punct:]]+$', '')) AS u_ct1,
        |    trim(regexp_replace(regexp_replace(lower(ct2),
        |      '^((the|a|an) )+', ''), '[[:punct:]]+$', '')) AS u_ct2,
        |    trim(regexp_replace(lower(kt1), '[^a-z0-9]+', ' ', 'g')) AS n_kt1,
        |    trim(regexp_replace(lower(kt2), '[^a-z0-9]+', ' ', 'g')) AS n_kt2,
        |    trim(regexp_replace(lower(ct1), '[^a-z0-9]+', ' ', 'g')) AS n_ct1,
        |    trim(regexp_replace(lower(ct2), '[^a-z0-9]+', ' ', 'g')) AS n_ct2
        |  FROM tl),
        |tr AS (
        |  SELECT request_id, k, u_kt1, u_kt2, u_ct1, u_ct2,
        |    CAST(round(100.0 * (1.0 - CAST(levenshtein(n_kt1, n_ct1) AS DOUBLE)
        |      / greatest(length(n_kt1), length(n_ct1)))) AS INT) AS r11,
        |    CAST(round(100.0 * (1.0 - CAST(levenshtein(n_kt1, n_ct2) AS DOUBLE)
        |      / greatest(length(n_kt1), length(n_ct2)))) AS INT) AS r12,
        |    CAST(round(100.0 * (1.0 - CAST(levenshtein(n_kt2, n_ct1) AS DOUBLE)
        |      / greatest(length(n_kt2), length(n_ct1)))) AS INT) AS r21,
        |    CAST(round(100.0 * (1.0 - CAST(levenshtein(n_kt2, n_ct2) AS DOUBLE)
        |      / greatest(length(n_kt2), length(n_ct2)))) AS INT) AS r22
        |  FROM tn),
        |te_ AS (
        |  -- weigh_titles in integer tenths: first matching cluster title
        |  -- per known title (exact-unfluffed 720, fuzzy>80 6·r),
        |  -- accumulated across known titles, one exact final division
        |  SELECT request_id, k, CAST(
        |      COALESCE(CASE WHEN replace(u_ct1, '.', '') = replace(u_kt1, '.', '')
        |                    THEN 720 WHEN r11 > 80 THEN 6 * r11 END,
        |               CASE WHEN replace(u_ct2, '.', '') = replace(u_kt1, '.', '')
        |                    THEN 720 WHEN r12 > 80 THEN 6 * r12 END, 0)
        |    + COALESCE(CASE WHEN replace(u_ct1, '.', '') = replace(u_kt2, '.', '')
        |                    THEN 720 WHEN r21 > 80 THEN 6 * r21 END,
        |               CASE WHEN replace(u_ct2, '.', '') = replace(u_kt2, '.', '')
        |                    THEN 720 WHEN r22 > 80 THEN 6 * r22 END, 0)
        |    AS DOUBLE) / 10.0 AS te
        |  FROM tr),
        |strs AS (
        |  SELECT request_id, k, pop, w,
        |    CASE WHEN k % 2 = 0 THEN w ELSE w || ' X' END AS sn_str,
        |    CASE WHEN k % 4 = 0 THEN w END AS dm_str,
        |    CASE WHEN k % 2 = 1 THEN w || ', G' || (k % 10) END AS um_str,
        |    CASE WHEN k % 3 = 0 THEN w || 'y' END AS am_str
        |  FROM cand),
        |ev AS (
        |  SELECT request_id, k, pop,
        |    CAST(round(100.0 * (1.0 - levenshtein(w, sn_str)
        |      / greatest(length(w), length(sn_str)))) AS DOUBLE) AS sn,
        |    CASE WHEN dm_str IS NOT NULL THEN
        |      CAST(round(100.0 * (1.0 - levenshtein(w, dm_str)
        |        / greatest(length(w), length(dm_str)))) AS DOUBLE) END AS dm,
        |    CASE WHEN um_str IS NOT NULL THEN
        |      CAST(round(100.0 * (1.0 - levenshtein(w, um_str)
        |        / greatest(length(w), length(um_str)))) AS DOUBLE) END AS um,
        |    CASE WHEN am_str IS NOT NULL THEN
        |      CAST(round(100.0 * (1.0 - levenshtein(w, am_str)
        |        / greatest(length(w), length(am_str)))) AS DOUBLE) END AS am,
        |    dm_str IS NOT NULL AS hdn
        |  FROM strs),
        |topflag AS (
        |  SELECT request_id,
        |    ((sn IS NOT NULL AND sn < 50) OR sn IS NULL) AS ignore_pop
        |  FROM ev WHERE pop = 1),
        |scored AS (
        |  SELECT e.request_id, e.k AS candidate_id, e.pop,
        |    COALESCE(t.ignore_pop, FALSE) AS ignore_pop,
        |    round(
        |      (CASE WHEN COALESCE(t.ignore_pop, FALSE) OR e.pop IS NULL
        |            THEN 0.0 ELSE -10.0 * e.pop END)
        |      + COALESCE(e.sn, 0.0) * 2.0
        |      + COALESCE(e.dm, 0.0) * 0.5
        |      + COALESCE(e.um, 0.0) * 0.3
        |      + COALESCE(e.am, 0.0) * 0.2
        |      + (CASE WHEN e.hdn THEN 0.2 ELSE 0.0 END)
        |      + 0.2
        |      + tt.te, 2) AS score
        |  FROM ev e LEFT JOIN topflag t USING (request_id)
        |       JOIN te_ tt ON tt.request_id = e.request_id AND tt.k = e.k),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY request_id
        |    ORDER BY score DESC, pop ASC) AS rn
        |  FROM scored)
        |SELECT request_id, candidate_id, score, ignore_pop
        |FROM ranked WHERE rn = 1 AND score >= 70.0
        |ORDER BY request_id""".stripMargin),

    Q.sql("m2_name_resolution", m2NameResolution,
      """SELECT c_custkey AS key,
        |  c_name AS sort_name,
        |  CASE WHEN c_custkey % 4 = 0
        |       THEN 'Wiki' || c_custkey || ' Page'
        |       ELSE 'Giv' || (c_custkey % 20) || ' Fam' || (c_custkey % 50)
        |  END AS display_name,
        |  CASE WHEN c_custkey % 4 = 0 THEN 'Page'
        |       ELSE 'Fam' || (c_custkey % 50) END AS family_name
        |FROM customer
        |ORDER BY key""".stripMargin),

    Q.sql("m5_equiv_strength", m5EquivStrength,
      """WITH sups AS (
        |  SELECT l_partkey, array_agg(DISTINCT l_suppkey) AS s
        |  FROM lineitem GROUP BY l_partkey),
        |p AS (
        |  SELECT p_partkey, p_name, p_brand,
        |         string_split(p_name, ' ')[1] AS tok0, s
        |  FROM part JOIN sups ON p_partkey = l_partkey)
        |SELECT a.p_partkey AS src, b.p_partkey AS dst,
        |  round((1.0 - CAST(levenshtein(a.p_name, b.p_name) AS DOUBLE)
        |         / greatest(length(a.p_name), length(b.p_name))) * 0.8
        |      + (CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |         / len(list_distinct(list_concat(a.s, b.s)))) * 0.2, 6)
        |    AS strength
        |FROM p a JOIN p b
        |  ON a.p_brand = b.p_brand AND a.tok0 = b.tok0
        | AND a.p_partkey < b.p_partkey
        |WHERE round((1.0 - CAST(levenshtein(a.p_name, b.p_name) AS DOUBLE)
        |         / greatest(length(a.p_name), length(b.p_name))) * 0.8
        |      + (CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |         / len(list_distinct(list_concat(a.s, b.s)))) * 0.2, 6) > 0.5
        |ORDER BY src, dst""".stripMargin),

    Q.sql("t1_sweep", t1Sweep,
      """SELECT c_custkey AS key,
        |  CASE
        |    WHEN c_custkey % 4 = 2 THEN 'SUCCESS'
        |    WHEN c_custkey % 4 = 3 THEN 'TRANSIENT_FAILURE'
        |    WHEN c_custkey % 3 <> 0 THEN 'SUCCESS'
        |    ELSE 'TRANSIENT_FAILURE' END AS status,
        |  CAST(CASE
        |    WHEN c_custkey % 4 = 2 THEN 1
        |    WHEN c_custkey % 4 = 3 THEN 3
        |    WHEN c_custkey % 4 = 0 THEN 2
        |    ELSE 2 END AS INT) AS attempts
        |FROM customer
        |ORDER BY key""".stripMargin),
  )
}

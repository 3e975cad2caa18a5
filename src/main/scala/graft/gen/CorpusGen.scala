package graft.gen

import graft.model._
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic corpus generator (FIXTURES.md §1).
  *
  * Produces the engine's primary input relation — interleaved text+media
  * documents shaped per BASELINE.json's input_hint — plus the plant-time
  * gold tables (mentions, expected triples, alias dictionary, GT tokens).
  *
  * Determinism contract: every random draw is keyed by the document index
  * through a splittable counter-based mix (no partition/task ids, no
  * wall-clock), so `local[8]` and `local[32]` produce bit-identical
  * corpora and gold sets — the precondition for the scaling-efficiency
  * evidence demanded by BASELINE.md.
  *
  * Sentence shapes mirror the reference's GT corpora: CoNLL/GermEval-style
  * German sentences with planted PER/LOC/ORG mentions
  * (ground_truth/conll.py, germeval.py); surface frequency is Zipfian so
  * head-entity skew is real and the salted-join path is exercised.
  */
object CorpusGen {

  // ---- deterministic splittable PRNG (SplitMix64 over (docIdx, stream)) ----
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  final class Rng(docIdx: Long) {
    private var ctr = 0L
    def nextLong(): Long = { ctr += 1; mix64(mix64(docIdx) ^ ctr) }
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
    def nextInt(n: Int): Int = ((nextLong() >>> 1) % n).toInt
  }

  // ---- entity catalog (unique surfaces per entity; head skew via Zipf) ----
  private val firstNames = Vector("Anna", "Karl", "Maria", "Otto", "Clara",
    "Hans", "Ida", "Paul", "Emma", "Franz", "Luise", "Georg", "Berta",
    "Ernst", "Martha", "Wilhelm", "Frieda", "Hermann", "Elsa", "Gustav")
  private val lastNames = Vector("Müller", "Schmidt", "Meyer", "Wagner",
    "Becker", "Hoffmann", "Schulz", "Richter", "Koch", "Bauer", "Weber",
    "Braun", "Krüger", "Lehmann", "Vogel", "Winter", "Sommer", "Brandt",
    "Arnold", "Berger")
  private val cities = Vector("Berlin", "Paris", "München", "Hamburg",
    "Wien", "London", "Dresden", "Leipzig", "Köln", "Frankfurt", "Stuttgart",
    "Bremen", "Hannover", "Nürnberg", "Mainz", "Kassel", "Erfurt", "Weimar",
    "Potsdam", "Augsburg", "Heidelberg", "Freiburg", "Regensburg", "Trier",
    "Bamberg")
  private val orgWords = Vector("Bank", "Verlag", "Werke", "Gesellschaft",
    "Verein", "Institut", "Akademie", "Theater", "Museum", "Brauerei")
  private val orgQuals = Vector("Deutsche", "Berliner", "Königliche",
    "Allgemeine", "Vereinigte", "Norddeutsche", "Süddeutsche", "Städtische",
    "Nationale", "Historische")

  /** (entity_id, surface words, type). Surfaces are unique per entity. */
  val persons: Vector[(String, Vector[String], String)] =
    (0 until 20).toVector.map { i =>
      (f"PER_$i%03d", Vector(firstNames(i), lastNames(i)), "PER")
    }
  val locations: Vector[(String, Vector[String], String)] =
    cities.zipWithIndex.map { case (c, i) => (f"LOC_$i%03d", Vector(c), "LOC") }
  val orgs: Vector[(String, Vector[String], String)] =
    (0 until 20).toVector.map { i =>
      (f"ORG_$i%03d", Vector(orgQuals(i % 10), orgWords((i * 3 + i / 10) % 10)), "ORG")
    }

  /** Zipf pick over n items: weight 1/(k+1). */
  private def zipfCum(n: Int): Array[Double] = {
    val w = Array.tabulate(n)(k => 1.0 / (k + 1))
    val c = w.scanLeft(0.0)(_ + _).drop(1)
    val t = c.last
    c.map(_ / t)
  }
  private val perCum = zipfCum(persons.size)
  private val locCum = zipfCum(locations.size)
  private val orgCum = zipfCum(orgs.size)
  private def pick(cum: Array[Double], u: Double): Int = {
    val i = java.util.Arrays.binarySearch(cum, u)
    val k = if (i >= 0) i else -i - 1
    math.min(k, cum.length - 1)
  }

  /** Alias dictionary: each entity has two records (`ID#0`, `ID#1`) both
    * aliased by the full surface (so canonicalization via connected
    * components is load-bearing); persons get an extra last-name alias on
    * record #0. Canonical id := min record id = `ID#0`.
    */
  def aliasDict: Seq[Alias] = {
    val all = persons ++ locations ++ orgs
    all.flatMap { case (id, words, typ) =>
      val surf = normSurface(words.mkString(" "))
      val base = Seq(
        Alias(surf, id + "#0", typ, 0.9),
        Alias(surf, id + "#1", typ, 0.8))
      val extra =
        if (typ == "PER") Seq(Alias(normSurface(words.last), id + "#0", typ, 0.7))
        else Seq.empty
      base ++ extra
    }
  }

  /** Surface normalization shared by generator and linker. */
  def normSurface(s: String): String = graft.text.TextCore.normalizeSurface(s)

  // ---- sentence templates ----
  // E slots are 0=PER 1=LOC 2=ORG; words are plain literals otherwise.
  private val templates: Vector[Vector[String]] = Vector(
    Vector("<PER>", "besuchte", "<LOC>", "."),
    Vector("<ORG>", "wurde", "in", "<LOC>", "gegründet", "."),
    Vector("<PER>", "arbeitet", "für", "<ORG>", "."),
    Vector("Die", "Stadt", "<LOC>", "ist", "heute", "groß", "."),
    Vector("<PER>", "traf", "<PER>", "in", "<LOC>", "."),
    Vector("Das", "Jahr", "war", "gut", "und", "ruhig", "."),
    Vector("<PER>", "sprach", "mit", "<PER>", "über", "<ORG>", "."),
    Vector("<ORG>", "eröffnete", "ein", "Haus", "in", "<LOC>", "."),
  )
  private val fillers = Vector("und", "wieder", "weiter", "durch", "das",
    "Land", "über", "Berge", "Täler", "Flüsse")

  case class GenSentence(words: Vector[String], tags: Vector[String],
                         mentions: Vector[(Int, Int, String, String, String)],
                         relations: Vector[(Int, String, Int)])
  // mention tuple: (startWord, endWordExcl, surface, type, entityId)
  // relation tuple: (subj mention idx, relation, obj mention idx)

  /** Typed relations planted per template (mention indices in template
    * order) — the extractor's verb lexicon (kg.Relations) must recover
    * exactly these.
    */
  private val templateRelations: Map[Int, Vector[(Int, String, Int)]] = Map(
    0 -> Vector((0, "visited", 1)),      // PER besuchte LOC
    1 -> Vector((0, "founded_in", 1)),   // ORG wurde in LOC gegründet
    2 -> Vector((0, "works_for", 1)),    // PER arbeitet für ORG
    4 -> Vector((0, "met", 1)),          // PER traf PER in LOC
    6 -> Vector((0, "spoke_with", 1)),   // PER sprach mit PER über ORG
    7 -> Vector((0, "opened_in", 1)),    // ORG eröffnete ein Haus in LOC
  )

  /** Generate one sentence from a template; ~3% of sentences are long
    * (>128 wordpieces) to exercise multi-window packing + re-glue.
    */
  def genSentence(rng: Rng): GenSentence = {
    val tIdx = rng.nextInt(templates.size)
    val t = templates(tIdx)
    val words = scala.collection.mutable.ArrayBuffer.empty[String]
    val tags = scala.collection.mutable.ArrayBuffer.empty[String]
    val ments = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String, String, String)]
    t.foreach {
      case "<PER>" =>
        val (id, ws, typ) = persons(pick(perCum, rng.nextDouble()))
        // 40% of person mentions use the bare last name (alias record #0)
        val use = if (rng.nextDouble() < 0.4) Vector(ws.last) else ws
        val s = words.length
        words ++= use
        tags += ("B-" + typ); tags ++= Vector.fill(use.length - 1)("I-" + typ)
        ments += ((s, s + use.length, use.mkString(" "), typ, id))
      case "<LOC>" =>
        val (id, ws, typ) = locations(pick(locCum, rng.nextDouble()))
        val s = words.length
        words ++= ws
        tags += ("B-" + typ); tags ++= Vector.fill(ws.length - 1)("I-" + typ)
        ments += ((s, s + ws.length, ws.mkString(" "), typ, id))
      case "<ORG>" =>
        val (id, ws, typ) = orgs(pick(orgCum, rng.nextDouble()))
        val s = words.length
        words ++= ws
        tags += ("B-" + typ); tags ++= Vector.fill(ws.length - 1)("I-" + typ)
        ments += ((s, s + ws.length, ws.mkString(" "), typ, id))
      case w =>
        words += w; tags += "O"
    }
    if (rng.nextDouble() < 0.03) { // long-sentence path (multi-window)
      val extra = 120 + rng.nextInt(80)
      var i = 0
      while (i < extra) { words += fillers(rng.nextInt(fillers.size)); tags += "O"; i += 1 }
      words += "."; tags += "O"
    }
    GenSentence(words.toVector, tags.toVector, ments.toVector,
      templateRelations.getOrElse(tIdx, Vector.empty))
  }

  case class GenDoc(doc: Doc, gold: Vector[GoldMention],
                    gt: Vector[GtToken], sentences: Vector[Sentence],
                    relations: Vector[(String, String, String)]) // (subjEid, rel, objEid)

  def docId(i: Long): String = f"doc_$i%010d"

  /** Generate one full document: 2-6 text spans, media spans interleaved
    * with p=0.25, media linked at plant time to entities of the adjacent
    * text spans.
    */
  def genDoc(i: Long): GenDoc = {
    val rng = new Rng(i)
    val id = docId(i)
    val nSent = 2 + rng.nextInt(5)
    val spans = scala.collection.mutable.ArrayBuffer.empty[Span]
    val gold = scala.collection.mutable.ArrayBuffer.empty[GoldMention]
    val gt = scala.collection.mutable.ArrayBuffer.empty[GtToken]
    val sents = scala.collection.mutable.ArrayBuffer.empty[Sentence]
    val rels = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    var offset = 0
    var sentIdx = 0
    var mediaIdx = 0
    while (sentIdx < nSent) {
      val s = genSentence(rng)
      val text = s.words.mkString(" ")
      spans += Span("text", text, null, offset)
      val guid = s"$id/$offset/$sentIdx" // doc_id / span offset / sentence idx
      sents += Sentence(guid, s.words.toArray, s.tags.toArray)
      s.mentions.foreach { case (a, b, surf, typ, eid) =>
        gold += GoldMention(id, offset, sentIdx, a, b, surf, typ, eid)
      }
      s.relations.foreach { case (si, rel, oi) =>
        rels += ((s.mentions(si)._5, rel, s.mentions(oi)._5))
      }
      s.words.indices.foreach { w =>
        gt += GtToken(i * 64 + offset, w, s.words(w), s.tags(w), "SYNTH")
      }
      offset += 1
      sentIdx += 1
      if (rng.nextDouble() < 0.25) {
        spans += Span("media", "", s"media://img/${i}_$mediaIdx", offset)
        offset += 1
        mediaIdx += 1
      }
    }
    GenDoc(Doc(id, spans.toArray), gold.toVector, gt.toVector, sents.toVector,
      rels.toVector)
  }

  /** Expected triples (the golden fixture the pipeline must reproduce).
    * Canonical entity id is `<entity>#0` — the min alias record in each
    * connected component by construction.
    */
  def expectedTriples(gd: GenDoc): Vector[GoldTriple] = {
    val id = gd.doc.doc_id
    def canon(eid: String) = eid + "#0"
    val mentions = gd.gold.map(m => GoldTriple(id, "mentions", canon(m.entity_id), id)).distinct
    val ents = gd.gold.map(m => canon(m.entity_id)).distinct.sorted
    val co = for {
      a <- ents; b <- ents if a < b
    } yield GoldTriple(a, "co_occurs_with", b, id)
    val byOffset = gd.gold.groupBy(_.span_offset)
    val media = gd.doc.spans.filter(_.kind == "media").toVector.flatMap { sp =>
      val adj = byOffset.getOrElse(sp.offset - 1, Vector.empty) ++
                byOffset.getOrElse(sp.offset + 1, Vector.empty)
      adj.map(m => GoldTriple(canon(m.entity_id), "depicted_in", sp.media_ref, id)).distinct
    }
    // typed verb relations (template-planted)
    val rels = gd.relations
      .map { case (s, r, o) => GoldTriple(canon(s), r, canon(o), id) }.distinct
    mentions ++ co ++ media ++ rels
  }

  // ---- Spark-side table constructors (partition-independent) ----
  def docs(spark: SparkSession, n: Long, parts: Int = 32): Dataset[Doc] = {
    import spark.implicits._
    spark.range(0, n, 1, parts).mapPartitions(_.map(i => genDoc(i).doc))
  }
  def goldMentions(spark: SparkSession, n: Long, parts: Int = 32): Dataset[GoldMention] = {
    import spark.implicits._
    spark.range(0, n, 1, parts).mapPartitions(_.flatMap(i => genDoc(i).gold))
  }
  def goldTriples(spark: SparkSession, n: Long, parts: Int = 32): Dataset[GoldTriple] = {
    import spark.implicits._
    spark.range(0, n, 1, parts).mapPartitions(_.flatMap(i => expectedTriples(genDoc(i))))
  }
  def gtTokens(spark: SparkSession, n: Long, parts: Int = 32): Dataset[GtToken] = {
    import spark.implicits._
    spark.range(0, n, 1, parts).mapPartitions(_.flatMap(i => genDoc(i).gt))
  }
  def aliases(spark: SparkSession): Dataset[Alias] = {
    import spark.implicits._
    spark.createDataset(aliasDict)
  }

  // ---- context-disambiguation fixture (for the co-mention linking
  //      feature): a SELF-CONTAINED dictionary with genuinely ambiguous
  //      surfaces. Deliberately separate from aliasDict: there every
  //      surface belongs to one entity (shared surfaces are what folds an
  //      entity's #0/#1 records into one connected component), so a
  //      truly ambiguous surface would make CC merge two real entities.
  //      Here entities are single-record and NO canonical map is used. ----

  /** "neustadt" is held by two LOC entities (prior favors A); "franken"
    * crosses types (ORG prior dominates, but type match outranks
    * context and prior, so a LOC-typed mention still picks the LOC
    * entity). "adlerburg"/"falkenburg"/"werra"/"franken werke" are
    * unambiguous — their doc co-mentions are the context anchors.
    */
  def ctxAliasDict: Seq[Alias] = Seq(
    Alias(normSurface("Neustadt"), "LOCX_A#0", "LOC", 0.9),
    Alias(normSurface("Neustadt"), "LOCX_B#0", "LOC", 0.6),
    Alias(normSurface("Adlerburg"), "LOCX_A#0", "LOC", 0.8),
    Alias(normSurface("Falkenburg"), "LOCX_B#0", "LOC", 0.8),
    Alias(normSurface("Werra"), "LOCX_C#0", "LOC", 0.5),
    Alias(normSurface("Franken"), "ORGX_F#0", "ORG", 0.95),
    Alias(normSurface("Franken"), "LOCX_F#0", "LOC", 0.55),
    Alias(normSurface("Franken Werke"), "ORGX_F#0", "ORG", 0.8))

  /** Deterministic mention stream over the ctx dictionary: every doc
    * mentions the ambiguous "neustadt"; anchor mentions appear with
    * fixed per-doc probabilities so ALL four outcomes occur (no anchor →
    * prior winner A; B-anchor only → context FLIPS the winner to B;
    * A-anchor / both → A; plus the cross-type "franken" case). Rows are
    * (doc_id, span_offset, sentence_idx, surface_norm, entity_type).
    */
  def genCtxMentions(i: Long): Seq[(String, Int, Int, String, String)] = {
    val rng = new Rng(i * 31 + 7) // distinct stream family from genDoc(i)
    val id = docId(i)
    val rows = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int, String, String)]
    rows += ((id, 0, 0, normSurface("Neustadt"), "LOC"))
    if (rng.nextDouble() < 0.35)
      rows += ((id, 0, 1, normSurface("Falkenburg"), "LOC"))
    if (rng.nextDouble() < 0.25)
      rows += ((id, 0, 2, normSurface("Adlerburg"), "LOC"))
    if (rng.nextDouble() < 0.3) {
      rows += ((id, 1, 0, normSurface("Franken"), "LOC"))
      if (rng.nextDouble() < 0.5)
        rows += ((id, 1, 1, normSurface("Franken Werke"), "ORG"))
    }
    if (rng.nextDouble() < 0.4)
      rows += ((id, 2, 0, normSurface("Werra"), "LOC"))
    rows.toSeq
  }

  def ctxMentions(spark: SparkSession, n: Long, parts: Int = 32): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, parts).mapPartitions(_.flatMap(i => genCtxMentions(i)))
      .toDF("doc_id", "span_offset", "sentence_idx", "surface_norm",
        "entity_type")
  }

  def ctxAliases(spark: SparkSession): Dataset[Alias] = {
    import spark.implicits._
    spark.createDataset(ctxAliasDict)
  }

  // ---- language-planted corpus (for evaluating language-ID with REAL
  //      signal — the driver's documents table has none, see q44 note) ----

  /** Per-language filler vocabularies: each language's marker words
    * (shared with TextOps.langId) plus language-specific neutral words.
    * fr/es deliberately share "la" — the realistic confusion source.
    */
  val langNames: Vector[String] = Vector("en", "de", "fr", "es")
  private val langVocab: Map[String, Vector[String]] = Map(
    "en" -> Vector("the", "and", "is", "house", "city", "river", "old",
      "new", "year", "man", "woman", "from"),
    "de" -> Vector("der", "und", "das", "haus", "stadt", "fluss", "alt",
      "neu", "jahr", "mann", "frau", "von"),
    "fr" -> Vector("le", "et", "la", "maison", "ville", "fleuve", "vieux",
      "nouveau", "annee", "homme", "femme", "avec"),
    "es" -> Vector("el", "y", "la", "casa", "ciudad", "rio", "viejo",
      "nuevo", "ano", "hombre", "mujer", "con"))

  /** One language-consistent document: (doc_id, planted lang, text of
    * 30-60 uniform vocabulary draws). Deterministic per index.
    */
  def genLangDoc(i: Long): (Long, String, String) = {
    val rng = new Rng(~i) // distinct stream family from genDoc(i)
    val lang = langNames(rng.nextInt(langNames.size))
    val vocab = langVocab(lang)
    val n = 30 + rng.nextInt(31)
    val words = Vector.fill(n)(vocab(rng.nextInt(vocab.size)))
    (i, lang, words.mkString(" "))
  }

  /** Language-planted corpus table (doc_id, lang, text). */
  def langDocs(spark: SparkSession, n: Long, parts: Int = 32): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, parts).mapPartitions(_.map(i => genLangDoc(i)))
      .toDF("doc_id", "lang", "text")
  }
}

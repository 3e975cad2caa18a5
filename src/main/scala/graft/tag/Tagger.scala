package graft.tag

import graft.model._

/** The heavyweight "model" operator interface — the Spark analog of the
  * reference's batched `BertForTokenClassification` forward
  * (models/bert.py:363-393): consume a BATCH of encoded windows, emit
  * per-token tag predictions. Implementations must be Serializable and
  * cheap to broadcast; one instance is reused per executor JVM (the
  * reference keeps a warm singleton model per process, webapp/app.py:126-149).
  *
  * The production implementation would wrap an ONNX-exported BERT session;
  * no ONNX runtime jar exists in this sandbox, so [[GazetteerTagger]] is
  * the deterministic mention-detection oracle with the same interface and
  * batch shape.
  */
trait MentionTagger extends Serializable {
  /** MUST return one TaggedWindow per input, in input order — the fused
    * pipeline stage zips results back to sentences positionally.
    */
  def tagBatch(batch: Seq[EncodedWindow]): Seq[TaggedWindow]
}

/** Deterministic oracle tagger: reconstructs words from window wordpieces
  * (`##` continuation marks) and greedily matches a broadcast gazetteer of
  * normalized surfaces (longest match first, up to 3 words). Continuation
  * pieces receive `X` — exactly the label scheme the encoder plants
  * (data_processor.py:388-402) — so the decode rule "last non-X wins"
  * (app.py:292-293) recovers word-level tags.
  *
  * gazetteer: normalized surface (space-joined lowercase words) → type.
  */
final class GazetteerTagger(gazetteer: Map[String, String], maxWords: Int = 3)
    extends MentionTagger {

  /** first word → longest phrase length starting with it; lets the match
    * loop skip non-trigger words with a single probe instead of building
    * maxWords candidate strings per position.
    */
  @transient private lazy val triggerMaxLen: java.util.HashMap[String, Int] = {
    val m = new java.util.HashMap[String, Int]()
    gazetteer.keysIterator.foreach { k =>
      val sp = k.indexOf(' ')
      val first = if (sp < 0) k else k.substring(0, sp)
      val len = k.count(_ == ' ') + 1
      val prev = m.getOrDefault(first, 0)
      if (len > prev) m.put(first, len)
    }
    m
  }

  override def tagBatch(batch: Seq[EncodedWindow]): Seq[TaggedWindow] =
    batch.map(tagWindow)

  private def tagWindow(w: EncodedWindow): TaggedWindow = {
    val toks = w.tokens
    val preds = Array.fill(toks.length)("O")
    // group token indices into words: a word starts at a non-## token
    val wordStarts = scala.collection.mutable.ArrayBuffer.empty[Int]
    val words = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t == "[CLS]" || t == "[SEP]" || t == "[PAD]") {
        preds(i) = "O"
        i += 1
      } else if (!t.startsWith("##")) {
        wordStarts += i
        val b = new StringBuilder(t)
        i += 1
        while (i < toks.length && toks(i).startsWith("##")) {
          b.append(toks(i).substring(2)); preds(i) = "X"; i += 1
        }
        words += b.toString
      } else { // stray continuation at window start (hard-cut fallback)
        preds(i) = "X"; i += 1
      }
    }
    // greedy longest-match over reconstructed words (trigger-indexed)
    var wi = 0
    while (wi < words.length) {
      var matched = 0
      var typ: String = null
      val cap = triggerMaxLen.getOrDefault(words(wi), 0)
      var len = math.min(math.min(maxWords, cap), words.length - wi)
      while (len > 0 && typ == null) {
        val key = if (len == 1) words(wi) else words.slice(wi, wi + len).mkString(" ")
        gazetteer.get(key) match {
          case Some(t) => typ = t; matched = len
          case None => len -= 1
        }
      }
      if (typ != null) {
        var k = 0
        while (k < matched) {
          preds(wordStarts(wi + k)) = (if (k == 0) "B-" else "I-") + typ
          k += 1
        }
        wi += matched
      } else wi += 1
    }
    TaggedWindow(w.guid, w.winIdx, toks, preds)
  }
}

/** Deterministic dense scorer with the cost profile of a small neural
  * tagger: embedding lookup (vocab × dim floats) → ±2 context mean-pool →
  * linear layer to the label space → per-token argmax. Consumes
  * inputIds/inputMask exactly as an ONNX session would (the north star's
  * broadcast BERT encoder slot, models/bert.py:363-393); weights are
  * derived from SplitMix64 so every executor materializes identical
  * parameters with no model file. Predictions are NOT meaningful — this
  * class exists to exercise and benchmark the batched harness under real
  * per-window FLOPs; GazetteerTagger is the accuracy oracle.
  */
final class DenseStubTagger(vocabSize: Int, dim: Int = 64,
                            labels: Array[String] = graft.text.Tags.labelList)
    extends MentionTagger {

  @transient private lazy val emb: Array[Float] = {
    val a = new Array[Float](vocabSize * dim)
    var i = 0
    while (i < a.length) {
      a(i) = ((graft.gen.CorpusGen.mix64(i.toLong) >>> 40) / 16777216.0f) - 0.5f
      i += 1
    }
    a
  }
  @transient private lazy val w: Array[Float] = {
    val a = new Array[Float](dim * labels.length)
    var i = 0
    while (i < a.length) {
      a(i) = ((graft.gen.CorpusGen.mix64(0x5EED + i.toLong) >>> 40) / 16777216.0f) - 0.5f
      i += 1
    }
    a
  }

  override def tagBatch(batch: Seq[EncodedWindow]): Seq[TaggedWindow] =
    batch.map { win =>
      val n = win.tokens.length
      val preds = new Array[String](n)
      val h = new Array[Float](dim)
      var p = 0
      while (p < n) {
        java.util.Arrays.fill(h, 0.0f)
        var c = math.max(0, p - 2)
        val hi = math.min(n - 1, p + 2)
        var cnt = 0
        while (c <= hi) {
          val base = (win.inputIds(c) % vocabSize) * dim
          var d = 0
          while (d < dim) { h(d) += emb(base + d); d += 1 }
          cnt += 1
          c += 1
        }
        var best = 0
        var bestScore = Float.NegativeInfinity
        var l = 0
        while (l < labels.length) {
          var s = 0.0f
          var d = 0
          while (d < dim) { s += h(d) / cnt * w(d * labels.length + l); d += 1 }
          if (s > bestScore) { bestScore = s; best = l }
          l += 1
        }
        preds(p) = labels(best)
        p += 1
      }
      TaggedWindow(win.guid, win.winIdx, win.tokens, preds)
    }
}

/** Gold-label passthrough tagger — the eval-path analog of
  * `model_predict_compare` (bert.py:312-360) run with a perfect model:
  * predictions are the window's own gold labelIds decoded to tags. Used
  * to validate the encode→decode round trip independently of detection.
  */
final class GoldLabelTagger(invLabelMap: Array[String]) extends MentionTagger {
  override def tagBatch(batch: Seq[EncodedWindow]): Seq[TaggedWindow] =
    batch.map { w =>
      val preds = w.tokens.indices.map(i => invLabelMap(w.labelIds(i))).toArray
      TaggedWindow(w.guid, w.winIdx, w.tokens, preds)
    }
}

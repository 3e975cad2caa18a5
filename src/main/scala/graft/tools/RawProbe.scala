package graft.tools
object RawProbe {
  def main(args: Array[String]): Unit = {
    var okDocs = 0; var badDocs = 0
    var firstBad: String = null
    (0 until 2000).foreach { i =>
      val gd = graft.gen.CorpusGen.genDoc(i.toLong)
      val raw = gd.doc.spans.filter(_.kind == "text").sortBy(_.offset)
        .map(_.text).mkString(" ")
      val got = graft.text.SentenceSplitter.sentences(raw).map(_.toSeq).toSeq
      val want = gd.doc.spans.filter(_.kind == "text").sortBy(_.offset)
        .map(sp => graft.text.TextCore.whitespaceTokenize(sp.text).toSeq).toSeq
      if (got == want) okDocs += 1 else {
        badDocs += 1
        if (firstBad == null)
          firstBad = s"doc $i\nwant=${want.map(_.mkString("|")).mkString(" // ")}\n got=${got.map(_.mkString("|")).mkString(" // ")}"
      }
    }
    println(s"[rawprobe] ok=$okDocs bad=$badDocs")
    if (firstBad != null) println("[rawprobe] first mismatch:\n" + firstBad.take(2000))
  }
}

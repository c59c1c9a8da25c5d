package graft

/** Test fixture: the 40-merge documents-only BPE table trained at sf0.01
  * by tools/train_bpe.py's algorithm (the r14 baked artifact, kept as the
  * tx28 oracle's expected output after the shipped [[graft.llmdata.BpeMerges]]
  * artifact moved to the 2000-merge union-corpus table). Three
  * implementations still reconcile on THIS table: the Spark trainer
  * (tx28 at sf0.01), the DuckDB 40-level unrolled twin (the tx28 oracle
  * row), and the Python trainer that originally generated it.
  */
object BpeMergesDoc40 {
  val Merges: IndexedSeq[(String, String)] = IndexedSeq(
    ("e", "r"),
    ("i", "n"),
    ("o", "w"),
    ("o", "r"),
    ("s", "t"),
    ("m", "er"),
    ("a", "t"),
    ("l", "u"),
    ("a", "r"),
    ("p", "ar"),
    ("j", "o"),
    ("jo", "in"),
    ("a", "s"),
    ("as", "h"),
    ("h", "ash"),
    ("r", "ow"),
    ("at", "c"),
    ("atc", "h"),
    ("b", "atch"),
    ("a", "n"),
    ("c", "an"),
    ("s", "can"),
    ("c", "o"),
    ("c", "u"),
    ("co", "lu"),
    ("colu", "m"),
    ("colum", "n"),
    ("cu", "st"),
    ("cust", "o"),
    ("custo", "mer"),
    ("f", "i"),
    ("fi", "l"),
    ("fil", "t"),
    ("filt", "er"),
    ("a", "l"),
    ("al", "l"),
    ("m", "all"),
    ("s", "mall"),
    ("g", "e"),
    ("l", "ow"))
}

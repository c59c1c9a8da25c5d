package graft.llmdata

/** Cross-module pipeline constants, DEPENDENCY-FREE BY DESIGN.
  *
  * TextAnalysis, Dedup, and Curation reference each other's SQL-twin
  * fragments during object initialization, so their init order forms a
  * cycle. A constant living on any of those objects can be read
  * MID-CYCLE — before its own line has initialized — and Scala then
  * yields the field's default (0 / null), which string interpolation
  * silently bakes into an oracle twin as `% 0` or `null` (the exact
  * failure commit 7bcaca9 fixed, and EntrySpec's artifact lint now
  * guards against). Constants interpolated into SQL twins from MORE
  * THAN ONE object therefore live here, where initialization can never
  * be mid-cycle because this object references nothing.
  *
  * RULE: nothing in this object may reference any other graft object.
  */
object Constants {

  /** Eval-set slice: every 20th doc plays the held-out benchmark whose
    * n-grams must not leak into training data (Dedup/TextAnalysis
    * decontamination families). */
  val EvalMod = 20

  /** Window width (words) for exact-substring duplicate detection
    * (tx16 family, tx38 span decontamination). */
  val SubstrW = 8

  /** Deterministic training-shard fan-out (cur8/cur13/cur16 export
    * manifests and the shard writers). */
  val NumShards = 16

  /** Tokens per packed training sequence — the context-window budget
    * (tx14/tx26 packing, cur13/cur16 shards, the streaming packer). */
  val PackBudget = 256
}

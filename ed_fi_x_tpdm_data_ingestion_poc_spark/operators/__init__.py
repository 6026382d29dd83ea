"""Semantic operator library — the reference's hand-written ETL behaviors
re-expressed as composable DataFrame transforms (SURVEY.md §7 step 5):

  rename      column-map rename layer (ref R5/R6)
  casts       string->date/boolean/typed casts with strict mode (ref R8/R9)
  enrich      descriptor URI enrichment w/ fallback (ref R10)
  nest        nested document assembly + address dedup/period merge (R11-R14)
  relational  last-row-wins, top-k per group, snapshot reconciliation (R15/R21)
  dedup       exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding dup
  similarity  brute-force + LSH cosine top-k over embedding columns
  text        language-ID, quality scoring, token counts, fingerprinting
  multimodal  opaque binary column plumbing (decode stubbed)
"""

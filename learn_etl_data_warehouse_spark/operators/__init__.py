"""Relational + LLM-pipeline operators.

- :mod:`.joins` — star-schema broadcast joins (SURVEY §2.3 J1-J6)
- :mod:`.rollups` — group enumeration, top-N per group, monthly rollups
  (SURVEY §2.4 A4-A6)
- :mod:`.dedup` — exact / MinHash-LSH / SimHash / n-gram-Jaccard /
  embedding near-dup deduplication
- :mod:`.similarity` — ANN over embedding columns (brute cosine top-k,
  LSH-bucketed scale path)
- :mod:`.text` — language-ID, quality scoring, token counting,
  fingerprinting
- :mod:`.multimodal` — opaque binary columns + typed metadata plumbing
"""

"""LLM-data-pipeline extension operators (SURVEY.md §2 Part C).

- ``dedup``      — exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding
  cosine near-duplicate detection.
- ``similarity`` — vector similarity search (brute-force and LSH-bucketed
  top-k).
- ``text``       — language ID, quality scoring, token counting, document
  fingerprinting.
- ``sessions``   — event sessionization (gap-and-islands).
- ``multimodal`` — binary-column plumbing with stubbed decoders.
"""

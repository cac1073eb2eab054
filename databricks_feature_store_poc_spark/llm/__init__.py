"""LLM data-pipeline operators: dedup, similarity search, text analysis,
multimodal columns (SURVEY §2/M5). Shared scale rule: candidate
generation is always a bucket join (shingle inverted index, MinHash/
SimHash bands, hyperplane/IVF cells) — never an unguarded cross product.
"""

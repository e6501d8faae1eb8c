"""LLM-data-pipeline operators (SURVEY.md §2.2 north-star rows):
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard),
similarity search (brute-force cosine / SRP-LSH), text analysis
(tokens, quality, language-ID, fingerprints), multimodal binary
columns, and the durable-log operators surfaced inside the graded
query gate.
"""

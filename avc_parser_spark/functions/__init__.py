"""Training-data-pipeline operations over document/embedding tables.

First-class components alongside the forensic pipeline (per the build brief):
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity search
(brute-force + LSH-bucketed ANN), text analysis (lang-id, quality, tokens,
fingerprints), and multimodal column plumbing.
"""

"""Training-data pipeline operators over web-scale text/embedding tables:
deduplication (exact, MinHash-LSH, SimHash), similarity search (brute-force
and LSH-bucketed ANN), text analysis (token counts, quality, language id,
fingerprints), multimodal column plumbing. All built DataFrame-first; Pandas
UDFs only where set-algebra over shingles genuinely needs NumPy."""

"""Index models: approximate (Hnsw/HnswMap) and exact (BruteForce)."""

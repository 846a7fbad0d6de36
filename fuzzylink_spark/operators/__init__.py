"""Pipeline operators: blocking, candidate generation, scoring, cutoff,
sampling, labeling, clustering, dedup, similarity search."""

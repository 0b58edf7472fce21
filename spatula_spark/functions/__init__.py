"""Column-function library: text analysis, dedup, similarity, images."""

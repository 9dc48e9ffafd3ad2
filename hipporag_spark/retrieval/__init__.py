"""Retrieval path: embeddings, KNN, fact/DPR scoring, reset build, ranking."""

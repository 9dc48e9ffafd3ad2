"""Iterative graph algorithms: PPR, components, label propagation, triangles."""

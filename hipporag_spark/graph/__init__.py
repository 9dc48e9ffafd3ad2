"""Graph construction: vertices, edges, dense ids, CSR blocks."""

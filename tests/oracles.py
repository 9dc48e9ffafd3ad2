"""Single-node oracles implementing the reference semantics verbatim.

``ppr_reference`` is a line-by-line NumPy transcription of the reference's
own explicit PPR spec (/root/reference/kotlin/src/main/kotlin/hipporag/
graph/SimpleGraph.kt:130-182 — the Kotlin port's reimplementation of what
igraph prpack computes for HippoRAG). Cross-checked against
networkx.pagerank in the tests.

``lp_reference`` pins the deterministic label-propagation semantics
(max weight, ties → min label, bounded rounds) that the Spark job and the
oracle share.
"""

from __future__ import annotations

import numpy as np


def ppr_reference(n, undirected_edges, reset, damping, tol=1e-6, max_iter=100):
    """undirected_edges: list of (u, v, w) — parallel edges allowed."""
    if n == 0:
        return np.zeros(0)
    reset = np.asarray(reset, dtype=np.float64)
    s = reset.sum()
    reset_prob = reset / s if s > 0 else np.full(n, 1.0 / n)

    adj = [[] for _ in range(n)]
    for u, v, w in undirected_edges:
        adj[u].append((v, w))
        adj[v].append((u, w))
    out_w = np.array([sum(w for _, w in a) for a in adj])

    scores = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        dangling = scores[out_w == 0.0].sum()
        nxt = (1.0 - damping) * reset_prob + damping * dangling * reset_prob
        for i in range(n):
            if out_w[i] == 0.0:
                continue
            c = damping * scores[i] / out_w[i]
            for j, w in adj[i]:
                nxt[j] += c * w
        delta = np.abs(nxt - scores).sum()
        scores = nxt
        if delta < tol:
            break
    return scores


def cc_reference(n, undirected_edges):
    """Min-reachable-id per vertex via union-find."""
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v, _ in undirected_edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # canonical component id = min vertex id in component
    comp = {}
    for v in range(n):
        r = find(v)
        comp.setdefault(r, min(comp.get(r, v), v))
    return np.array([find(v) for v in range(n)])


def lp_reference(n, undirected_edges, max_iter=10):
    """Deterministic synchronous LPA: max weight-sum, ties → min label."""
    W = {}
    for u, v, w in undirected_edges:
        W[(u, v)] = W.get((u, v), 0.0) + w
        W[(v, u)] = W.get((v, u), 0.0) + w
    nbrs = [{} for _ in range(n)]
    for (u, v), w in W.items():
        nbrs[u][v] = w
    labels = np.arange(n)
    for _ in range(max_iter):
        new = labels.copy()
        for v in range(n):
            if not nbrs[v]:
                continue
            votes = {}
            for u, w in nbrs[v].items():
                votes[labels[u]] = votes.get(labels[u], 0.0) + w
            best = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[v] = best
        if (new == labels).all():
            labels = new
            break
        labels = new
    return labels


def random_multigraph(n, m, seed, self_loops=False):
    """Deterministic random staged edge list (directed pairs, parallel dups)."""
    rng = np.random.default_rng(seed)
    edges = []
    for _ in range(m):
        u = int(rng.integers(0, n))
        v = int(rng.integers(0, n))
        if u == v and not self_loops:
            continue
        w = float(rng.integers(1, 4))
        edges.append((u, v, w))
    return edges

"""Union-find with deterministic lexicographically-smallest representatives.

Used by canonicalization (SURVEY.md §7.1 step 7) to merge
``owl:sameAs`` clusters — the replacement for the reference's
clear-context + insert + dump ``relate`` pass
(``ferenda/documentrepository.py:1731-1883``).  Determinism matters:
the representative of a cluster must not depend on edge order, so
after all unions the representative is recomputed as the minimum
member URI.
"""

from __future__ import annotations


class UnionFind:
    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        # Iterative (no recursion limit): walk to the root, then a
        # second pass compresses the whole path.  A 10^6-long sameAs
        # chain must not blow the driver's stack.
        parent = self.parent
        root = parent.setdefault(x, x)
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # smaller string as parent keeps trees deterministic-ish,
            # but the final mapping re-minimizes anyway
            if rb < ra:
                ra, rb = rb, ra
            self.parent[rb] = ra

    def canonical_map(self) -> dict:
        """member -> min(member URIs of its cluster); identity entries
        are omitted (lookups fall back to the key itself)."""
        clusters: dict = {}
        for x in list(self.parent):
            clusters.setdefault(self.find(x), []).append(x)
        out = {}
        for members in clusters.values():
            canon = min(members)
            for m in members:
                if m != canon:
                    out[m] = canon
        return out


def canonical_map_from_edges(edges) -> dict:
    """edges: iterable of (a, b) pairs → {variant: canonical}."""
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    return uf.canonical_map()

"""Graph statistics (Stats.java:53-67 parity).

Offline single-scan computation of degree distributions and derived
statistics; writes the reference's stat file family
(``.stats``, ``.outdegrees``/``.indegrees`` distribution files).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..core.graph import ImmutableGraph

__all__ = ["compute_stats", "write_stats"]


def compute_stats(g: ImmutableGraph,
                  component: Optional[np.ndarray] = None) -> Dict[str, object]:
    """Degree distributions + min/max/avg (+ SCC-derived stats if a
    component array is provided)."""
    n = g.num_nodes
    outd = np.zeros(n, dtype=np.int64)
    ind_count: Dict[int, int] = {}
    indeg = np.zeros(n, dtype=np.int64)
    m = 0
    loops = 0
    for x, succ in g.iter_nodes():
        outd[x] = len(succ)
        m += len(succ)
        loops += int((succ == x).sum())
        np.add.at(indeg, succ, 1)
    stats: Dict[str, object] = {
        "nodes": n,
        "arcs": m,
        "loops": loops,
        "minoutdegree": int(outd.min(initial=0)),
        "maxoutdegree": int(outd.max(initial=0)),
        "avgoutdegree": m / n if n else 0.0,
        "minindegree": int(indeg.min(initial=0)),
        "maxindegree": int(indeg.max(initial=0)),
        "avgindegree": m / n if n else 0.0,
        "dangling": int((outd == 0).sum()),
        "terminal": int((indeg == 0).sum()),
        "outdegree_distribution": np.bincount(outd) if n else np.zeros(0),
        "indegree_distribution": np.bincount(indeg) if n else np.zeros(0),
    }
    if component is not None:
        sizes = np.bincount(component)
        stats["sccs"] = len(sizes)
        stats["maxsccsize"] = int(sizes.max(initial=0))
        stats["sccsizes"] = sizes
    return stats


def write_stats(stats: Dict[str, object], basename: str) -> None:
    """Write ``basename.stats`` (key=value lines) and the degree
    distribution files (one count per line, index = degree)."""
    with open(basename + ".stats", "w") as f:
        for k, v in stats.items():
            if isinstance(v, np.ndarray):
                continue
            f.write(f"{k}={v}\n")
    for key, ext in (("outdegree_distribution", ".outdegrees"),
                     ("indegree_distribution", ".indegrees")):
        if key in stats:
            with open(basename + ext, "w") as f:
                for c in np.asarray(stats[key]).tolist():
                    f.write(f"{c}\n")

"""Star-vs-minlabel crossover measurement (ROADMAP r5 #7).

Generates a synthetic verified-pair graph shaped like real near-dup
output — many small cliques (duplicate clusters) plus a few long
chains and one dense hub — then times the two distributed
connected-components implementations on identical input and verifies
their labels match.  Usage:

    python scripts/bench_components.py [n_clusters] [cpus]

Prints one JSON line.  Run it ALONE (sandbox bench rules apply).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_pair_graph(n_clusters: int, seed: int = 9):
    """Edges for n_clusters cliques of size 2-6, 5 chains of length
    200, and one 2000-leaf star — ids disjoint."""
    from dabloomray.fixtures import splitmix64

    rng = splitmix64(seed, np.arange(n_clusters, dtype=np.uint64))
    sizes = (rng % np.uint64(5) + np.uint64(2)).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    a_parts, b_parts = [], []
    for s, k in zip(starts, sizes):
        ids = np.arange(s, s + k)
        ai, bi = np.triu_indices(k, 1)
        a_parts.append(ids[ai])
        b_parts.append(ids[bi])
    base = int(starts[-1] + sizes[-1])
    for c in range(5):
        ids = np.arange(base + 200 * c, base + 200 * (c + 1))
        a_parts.append(ids[:-1])
        b_parts.append(ids[1:])
    hub = base + 1000 + 2000
    leaves = np.arange(hub - 2000, hub)
    a_parts.append(np.full(2000, hub, dtype=np.int64))
    b_parts.append(leaves)
    return np.concatenate(a_parts), np.concatenate(b_parts)


def main() -> None:
    import pyarrow as pa
    import ray
    import ray.data as rd

    n_clusters = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from dabloomray.pipelines.dedup import minlabel_components, star_components

    a, b = make_pair_graph(n_clusters)
    t = pa.table({"left_id": pa.array(a, pa.int64()),
                  "right_id": pa.array(b, pa.int64())})
    ds = rd.from_arrow(t).repartition(4 * cpus).materialize()

    out = {"n_edges": len(a), "cpus": cpus}
    labels = {}
    for name, fn in [("minlabel", minlabel_components),
                     ("star", star_components)]:
        t0 = time.time()
        res = fn(ds, num_partitions=cpus)
        labels[name] = {r["node"]: r["label"] for r in res.take_all()}
        out[f"sec_{name}"] = round(time.time() - t0, 2)
    out["labels_match"] = labels["minlabel"] == labels["star"]
    out["n_nodes"] = len(labels["star"])
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()

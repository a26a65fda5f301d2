"""graph_triangles property tests: the degree-ordered census must
match a brute-force triangle enumeration exactly, and the orientation
must bound out-degrees even under a hub-vertex adversary (the m^1.5
guarantee the 100 TB story rests on)."""

import random

from nova_pulsar_spark.operators.graphs import MAX_BASKET, graph_triangles


def _write_lineitem(spark, d, baskets):
    rows = [(o, int(p)) for o, parts in enumerate(baskets) for p in parts]
    spark.createDataFrame(rows, "l_orderkey bigint, l_partkey bigint").write.parquet(
        f"{d}/lineitem.parquet"
    )


def _brute(baskets):
    """Reference census in plain Python (capped baskets -> edge set ->
    adjacency -> triangles/wedges)."""
    edges = set()
    for parts in baskets:
        capped = sorted(set(parts))[:MAX_BASKET]
        for i, a in enumerate(capped):
            for b in capped[i + 1 :]:
                edges.add((a, b))
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = sum(
        1
        for a, b in edges
        for c in adj[a] & adj[b]
        if b < c  # count each triangle once at its lexicographic (a<b<c) root
    )
    wedges = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
    return {
        "n_nodes": len(adj),
        "n_edges": len(edges),
        "n_triangles": tri,
        "n_wedges": wedges,
    }


def test_triangles_match_bruteforce(spark, tmp_path):
    rng = random.Random(7)
    parts = list(range(1, 60))
    baskets = [rng.sample(parts, rng.randint(2, 6)) for _ in range(120)]
    d = str(tmp_path / "g1")
    _write_lineitem(spark, d, baskets)
    got = graph_triangles(spark, d).collect()[0].asDict()
    want = _brute(baskets)
    for k, v in want.items():
        assert got[k] == v, (k, got, want)
    if want["n_wedges"]:
        assert abs(got["global_clustering"] - 3 * want["n_triangles"] / want["n_wedges"]) < 1e-12


def test_hub_adversary_stays_bounded(spark, tmp_path):
    """A hub part co-purchased with everything (500 orders) plus one
    oversized 500-part order: the basket cap bounds pair-gen and the
    degree orientation keeps every out-degree O(sqrt(m)) — the wedge
    join never quadratically explodes at the hub."""
    rng = random.Random(11)
    hub = 0
    baskets = [[hub, 1000 + i, 2000 + rng.randint(0, 40)] for i in range(500)]
    baskets.append(list(range(3000, 3500)))  # oversized basket, capped to 32
    d = str(tmp_path / "g2")
    _write_lineitem(spark, d, baskets)
    got = graph_triangles(spark, d).collect()[0].asDict()
    want = _brute(baskets)
    for k, v in want.items():
        assert got[k] == v, (k, got, want)

    # the oversized basket contributed C(32,2) edges, not C(500,2)
    assert want["n_edges"] < 500 * 40 + MAX_BASKET * (MAX_BASKET - 1) // 2 + 3 * 500

    # orientation bound: rebuild the oriented graph the operator's way
    # and check the forward-algorithm invariant max_outdeg = O(sqrt(m))
    edges = set()
    for parts in baskets:
        capped = sorted(set(parts))[:MAX_BASKET]
        for i, a in enumerate(capped):
            for b in capped[i + 1 :]:
                edges.add((a, b))
    deg: dict[int, int] = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    out: dict[int, int] = {}
    for a, b in edges:
        src = a if (deg[a], a) < (deg[b], b) else b
        out[src] = out.get(src, 0) + 1
    m = len(edges)
    assert max(out.values()) ** 2 <= 4 * m, (max(out.values()), m)
    # the hub itself (degree ~500) must NOT be a high-out-degree source
    assert out.get(hub, 0) <= max(out.values())

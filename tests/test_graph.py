"""Triangle counting: planted cliques, triangle-free graphs, hub
wedges, clustering coefficients."""

from pyspark.sql import functions as F

from confluent_kafka_vector_search_prompt_inference_spark.operators.graph import triangle_counts


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src bigint, dst bigint"
    )


def test_single_triangle(spark):
    out = triangle_counts(_edges(spark, [(1, 2), (2, 3), (1, 3)])).collect()
    assert sorted((r.node, r.degree, r.tri_cnt, r.clustering) for r in out) == [
        (1, 2, 1, 1.0),
        (2, 2, 1, 1.0),
        (3, 2, 1, 1.0),
    ]


def test_triangle_free_path_and_star(spark):
    # path 1-2-3-4 plus a star hub 10 with 5 leaves: wedges but no closure
    pairs = [(1, 2), (2, 3), (3, 4)] + [(10, 20 + i) for i in range(5)]
    assert triangle_counts(_edges(spark, pairs)).count() == 0


def test_k4_counts(spark):
    # K4: every node in C(3,2)=3 triangles, degree 3, clustering 1.0
    pairs = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    out = triangle_counts(_edges(spark, pairs)).collect()
    assert len(out) == 4
    for r in out:
        assert (r.degree, r.tri_cnt, r.clustering) == (3, 3, 1.0)


def test_hub_with_one_closure(spark):
    # hub 1 connected to 2..6; only edge (2,3) closes a wedge
    pairs = [(1, i) for i in range(2, 7)] + [(2, 3)]
    out = {r.node: r for r in triangle_counts(_edges(spark, pairs)).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].tri_cnt == 1 and out[1].degree == 5
    # hub clustering: 2*1/(5*4) = 0.1
    assert out[1].clustering == 0.1
    assert out[2].tri_cnt == 1 and out[2].clustering == 1.0


def test_orientation_matches_bruteforce(spark):
    # deterministic pseudo-random graph; brute-force reference in Python
    import itertools

    nodes = range(12)
    pairs = [
        (a, b)
        for a, b in itertools.combinations(nodes, 2)
        if (a * 7 + b * 13 + a * b) % 3 == 0
    ]
    adj = {n: set() for n in nodes}
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    expected = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                expected[n] = expected.get(n, 0) + 1
    out = {r.node: r.tri_cnt for r in triangle_counts(_edges(spark, pairs)).collect()}
    assert out == expected

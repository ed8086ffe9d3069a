"""GraphDB sampling client: nGQL query-shape contract (data/graphdb.py).

Ref: NebulaGraphDBClient.scala:151-241 (client lifecycle/query protocol),
NebulaHeteroKHopSampler.scala:195-222 (GO-query text), :39-140 (two-hop
metapath assembly).
"""

import numpy as np
import pytest

from gigl_tpu.data.graphdb import (
    GraphDBKHopSampler,
    InMemoryGraphDBClient,
    Metapath,
    ResultSet,
    first_hop_go_query,
)
from gigl_tpu.data.mocking import BIPARTITE_TOY_GRAPH_LP, get_mocked_graph


@pytest.fixture(scope="module")
def graph():
    return get_mocked_graph(BIPARTITE_TOY_GRAPH_LP)


@pytest.fixture()
def client(graph):
    c = InMemoryGraphDBClient(graph, args={"space": "toy", "retries": "2"})
    c.connect()
    yield c
    c.terminate()


class TestQueryShape:
    def test_matches_reference_go_query_text(self):
        q = first_hop_go_query(42, "user-buys-item", 5)
        # The reference's exact clause shape (NebulaHeteroKHopSampler:202-207)
        assert q.startswith("GO 1 STEP FROM 42 OVER user-buys-item ")
        assert "YIELD user-buys-item._src AS dst" in q
        assert "user-buys-item._dst AS src" in q
        assert "TYPE(EDGE) AS edge_type" in q
        assert q.endswith("LIMIT [5]")
        assert "REVERSELY" not in q
        assert "REVERSELY" in first_hop_go_query(42, "e", 5, reversely=True)


class TestInMemoryClient:
    def test_lifecycle(self, graph):
        c = InMemoryGraphDBClient(graph)
        assert not c.is_connected()
        c.connect()
        assert c.is_connected()
        c.terminate()
        assert not c.is_connected()
        assert not c.execute_query(
            first_hop_go_query(0, "user-buys-item", 3)).is_succeeded()

    def test_go_query_returns_true_neighbors(self, client, graph):
        et = list(graph.edges)[0]
        src = np.asarray(graph.edges[et][0])
        dst = np.asarray(graph.edges[et][1])
        u = int(src[0])
        rs = client.execute_query(first_hop_go_query(u, str(et), 100))
        assert rs.is_succeeded()
        got = sorted(r.src for r in rs.rows)
        want = sorted(int(d) for s, d in zip(src, dst) if s == u)
        assert got == want
        # rows carry the reference's dst/src aliasing
        assert all(r.dst == u for r in rs.rows)
        assert all(r.edge_type == str(et) for r in rs.rows)

    def test_limit_truncates(self, client, graph):
        et = str(list(graph.edges)[0])
        rs = client.execute_query(first_hop_go_query(0, et, 2))
        assert len(rs.rows) <= 2

    def test_reversely_walks_incoming(self, client, graph):
        et = list(graph.edges)[0]
        dst = np.asarray(graph.edges[et][1])
        item = int(dst[0])
        rs = client.execute_query(
            first_hop_go_query(item, str(et), 100, reversely=True))
        src = np.asarray(graph.edges[et][0])
        want = sorted(int(s) for s, d in zip(src, dst) if d == item)
        assert sorted(r.src for r in rs.rows) == want

    def test_unsupported_query_errors(self, client):
        rs = client.execute_query("MATCH (n) RETURN n")
        assert not rs.is_succeeded()
        assert "GO-query" in rs.error

    def test_batch_loops(self, client, graph):
        et = str(list(graph.edges)[0])
        qs = [first_hop_go_query(i, et, 3) for i in range(4)]
        out = client.execute_query_batch(qs)
        assert len(out) == 4
        assert all(isinstance(r, ResultSet) for r in out)


class TestKHopSampler:
    def test_two_hop_metapath_assembly(self, client, graph):
        ets = [str(e) for e in graph.edges]
        mp = Metapath(path=(ets[0], ets[0]))
        sampler = GraphDBKHopSampler(client, num_neighbors=(3, 2))
        nodes, edges = sampler.k_hop_subgraph(0, [mp])
        assert 0 in nodes
        # first hop <= 3 edges from root, each expanding <= 2 more
        first = [e for e in edges if e[1] == 0]
        assert 1 <= len(first) <= 3
        assert len(edges) <= 3 + 3 * 2

    def test_isolated_root_returns_self_only(self, graph):
        c = InMemoryGraphDBClient(graph)
        c.connect()
        ets = [str(e) for e in graph.edges]
        sampler = GraphDBKHopSampler(c, num_neighbors=(3, 2))
        # node id far outside the edge set: no rows, root-only neighborhood
        nodes, edges = sampler.k_hop_subgraph(10 ** 6,
                                              [Metapath((ets[0], ets[0]))])
        assert nodes == [10 ** 6]
        assert edges == []

    def test_batch_of_roots(self, client, graph):
        ets = [str(e) for e in graph.edges]
        sampler = GraphDBKHopSampler(client, num_neighbors=(2, 2))
        out = sampler.k_hop_subgraphs([0, 1, 2], [Metapath((ets[0], ets[0]))])
        assert set(out) == {0, 1, 2}


class TestGraphDbMaterialization:
    def test_round_trip_through_tfrecord_shards(self, client, graph,
                                                tmp_path):
        """GraphDB SGS variant: nGQL-sampled neighborhoods materialize as
        TFRecord shards and read back (the RootedNodeNeighborhood artifact
        contract of the reference's GraphDB task)."""
        from gigl_tpu.sampling.materialize import (
            materialize_graphdb_neighborhoods,
            read_graphdb_neighborhoods,
        )

        ets = [str(e) for e in graph.edges]
        mp = Metapath(path=(ets[0], ets[0]))
        roots = [0, 1, 2, 5]
        shards = materialize_graphdb_neighborhoods(
            client, roots, [mp], num_neighbors=(3, 2),
            out_dir=str(tmp_path))
        assert shards
        rows = list(read_graphdb_neighborhoods(str(tmp_path)))
        assert [r[0] for r in rows] == roots
        sampler = GraphDBKHopSampler(client, num_neighbors=(3, 2))
        for root, node_ids, edges in rows:
            nodes_ref, edges_ref = sampler.k_hop_subgraph(root, [mp])
            assert list(node_ids) == nodes_ref
            assert edges.shape[1] == len(edges_ref)
        assert (tmp_path / "edge_types.txt").read_text().strip()


class _FakeValue:
    def __init__(self, v):
        self._v = v

    def as_int(self):
        return int(self._v)

    def as_string(self):
        return str(self._v)


class _FakeNebulaResultSet:
    """nebula3 ResultSet surface backed by a protocol ResultSet."""

    def __init__(self, rs):
        self._rs = rs

    def is_succeeded(self):
        return self._rs.is_succeeded()

    def error_msg(self):
        return self._rs.error or ""

    def keys(self):
        return ["dst", "src", "edge_type"]

    def row_size(self):
        return len(self._rs.rows)

    def row_values(self, i):
        r = self._rs.rows[i]
        return [_FakeValue(r.dst), _FakeValue(r.src),
                _FakeValue(r.edge_type)]


class _FakeSessionPool:
    """Recorded-fixture backend: executes the query text against the
    in-memory dialect engine, returns nebula3-shaped results."""

    def __init__(self, inner):
        self._inner = inner
        self.closed = False

    def execute(self, q):
        return _FakeNebulaResultSet(self._inner.execute_query(q))

    def close(self):
        self.closed = True


class TestNebulaClientAdapter:
    """Dialect equivalence (ref NebulaGraphDBClient.scala:151-241): same
    query text in -> same protocol rows out as InMemoryGraphDBClient."""

    def _nebula(self, graph):
        from gigl_tpu.data.graphdb import NebulaGraphDBClient

        inner = InMemoryGraphDBClient(graph)
        inner.connect()
        c = NebulaGraphDBClient({"space": "s", "hosts": "10.0.0.1:9669",
                                 "retries": "2"})
        c._make_pool = lambda: _FakeSessionPool(inner)
        c.connect()
        return c, inner

    def test_requires_space(self):
        from gigl_tpu.data.graphdb import NebulaGraphDBClient

        with pytest.raises(ValueError, match="space"):
            NebulaGraphDBClient({})

    def test_rows_match_in_memory_dialect(self, graph):
        neb, inner = self._nebula(graph)
        et = str(next(iter(graph.edges)))
        for nid in range(6):
            for rev in (False, True):
                q = first_hop_go_query(nid, et, 4, reversely=rev)
                a = neb.execute_query(q)
                b = inner.execute_query(q)
                assert a.is_succeeded() and b.is_succeeded()
                assert ([(r.dst, r.src, r.edge_type) for r in a.rows]
                        == [(r.dst, r.src, r.edge_type) for r in b.rows])

    def test_khop_sampler_runs_through_adapter(self, graph):
        neb, inner = self._nebula(graph)
        ets = [str(k) for k in graph.edges]
        mp = Metapath(path=(ets[0], ets[1] if len(ets) > 1 else ets[0]))
        s_neb = GraphDBKHopSampler(neb, num_neighbors=[3, 2])
        s_mem = GraphDBKHopSampler(inner, num_neighbors=[3, 2])
        nodes_a, edges_a = s_neb.k_hop_subgraph(0, [mp])
        nodes_b, edges_b = s_mem.k_hop_subgraph(0, [mp])
        assert nodes_a == nodes_b and edges_a == edges_b

    def test_error_surfaces_after_retries(self, graph):
        neb, _ = self._nebula(graph)
        rs = neb.execute_query("MATCH (n) RETURN n")  # not GO dialect
        assert not rs.is_succeeded()
        assert "unsupported nGQL" in rs.error

    def test_lifecycle(self, graph):
        neb, _ = self._nebula(graph)
        assert neb.is_connected()
        pool = neb._pool
        neb.terminate()
        assert pool.closed and not neb.is_connected()
        assert not neb.execute_query("x").is_succeeded()

    def test_import_gate_message_without_nebula3(self, monkeypatch):
        import sys

        from gigl_tpu.data.graphdb import NebulaGraphDBClient

        # Simulate the package being absent even on machines where
        # nebula3-python IS installed (a None entry makes the import
        # machinery raise ImportError for nebula3 and its submodules).
        monkeypatch.setitem(sys.modules, "nebula3", None)
        monkeypatch.setitem(sys.modules, "nebula3.Config", None)
        monkeypatch.setitem(sys.modules, "nebula3.gclient.net.SessionPool",
                            None)
        c = NebulaGraphDBClient({"space": "s"})
        with pytest.raises(ImportError, match="nebula3-python"):
            c.connect()

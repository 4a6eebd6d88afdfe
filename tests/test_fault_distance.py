"""Exact per-observable fault distance (decode/fault_distance.py).

The round-5 diagnosis tool: the shortest odd cycle in the parity double
cover IS the minimum number of faults whose combined detector signature
is empty while the observable flips — the spacetime analogue of code
distance. These tests pin it against models whose fault distance is
known by construction.
"""

import numpy as np
import pytest

from qcss_tpu.codes import families
from qcss_tpu.decode.fault_distance import (
    model_fault_distances,
    observable_fault_distance,
)
from qcss_tpu.decode.uf import MatchingGraph, spacetime_graph


class TestKnownGraphs:
    def test_repetition_line(self):
        """A 1D matching line of length L (repetition code, single
        round): the only undetectable logical fault set crosses the
        whole line — fault distance L."""
        # odd L: the full-line crossing flips the parity observable
        # (even L would flip it an even number of times — no logical)
        for L in (3, 5, 9):
            edges = [(-1, 0)] + [(i, i + 1) for i in range(L - 2)] \
                + [(L - 2, -1)]
            obs = np.zeros(len(edges), np.uint32)
            obs[:] = 1  # every edge crosses the logical cut once
            g = MatchingGraph(
                num_nodes=L - 1,
                edges=np.asarray(edges, np.int32),
                edge_qubit=np.arange(len(edges), dtype=np.int32),
                edge_obs=obs,
                n_qubits=len(edges),
            )
            fd, _ = observable_fault_distance(g, 0)
            assert fd == L

    def test_surface_spacetime_distance(self):
        """Spacetime graph of the rotated surface code: the space-like
        logical cut costs d data faults (time-like cuts carry no
        observable), so fault distance = d at any number of rounds."""
        for d in (3, 5):
            code = families.rotated_surface(d, max_table_weight=0, t=1)
            g = spacetime_graph(code.raw_parity_check_c2,
                                code.z_operator_matrix(), d)
            fd, n_min = observable_fault_distance(g, 0)
            assert fd == d
            assert n_min > 0

    def test_weighted_distance(self):
        """Likelihood weighting: doubling every edge weight doubles the
        reported (weighted) distance."""
        code = families.rotated_surface(3, max_table_weight=0, t=1)
        g = spacetime_graph(code.raw_parity_check_c2,
                            code.z_operator_matrix(), 3)
        fd_u, _ = observable_fault_distance(g, 0, weighted=True)
        g2 = MatchingGraph(num_nodes=g.num_nodes, edges=g.edges,
                           edge_qubit=g.edge_qubit, edge_obs=g.edge_obs,
                           n_qubits=g.n_qubits,
                           edge_weight=(g.edge_weight.astype(np.int64) * 2
                                        ).clip(0, 250).astype(np.uint8))
        fd_w, _ = observable_fault_distance(g2, 0, weighted=True)
        assert fd_w == 2 * fd_u

    def test_witness_is_closed_odd_cycle(self):
        code = families.rotated_surface(3, max_table_weight=0, t=1)
        g = spacetime_graph(code.raw_parity_check_c2,
                            code.z_operator_matrix(), 3)
        fd, _, wit = observable_fault_distance(g, 0, with_witness=True)
        assert len(wit) == fd
        # closed: every real detector touched an even number of times
        V = g.num_nodes
        deg = np.zeros(V, np.int64)
        par = 0
        for e in wit:
            u, v = g.edges[e]
            if u >= 0:
                deg[u] += 1
            if v >= 0:
                deg[v] += 1
            par ^= int(g.edge_obs[e]) & 1
        assert (deg % 2 == 0).all()
        assert par == 1


class TestBespokeGadget:
    def test_t_gadget_channels_scale(self):
        """The bespoke T gadget's channels carry full fault distance d
        in both sectors (the round-5 anchor that proved the compiled
        op-set's round-4 flattening was a model defect, not physics)."""
        from qcss_tpu.experiments import surgery_t

        for d in (3, 5):
            mz = surgery_t.build_zz_merge_split(d, d, d, d)
            for bit in range(mz.obs.shape[0]):
                fd, _ = observable_fault_distance(mz.graph, bit)
                assert fd == d, (d, bit)
            mx = surgery_t.build_merge_readout_sector(d, d, d, d)
            fd, _ = observable_fault_distance(mx.graph, 0)
            assert fd == d


class TestCompiledOpSet:
    @pytest.mark.parametrize("op", ["s", "mx", "t", "mz"])
    def test_all_channels_full_distance(self, op):
        """Round-5 invariant: EVERY channel of every compiled op
        carries fault distance d (encoded ancilla arrival + encoded
        data init + mid-phase joint reads — see BASELINE.md round 5)."""
        from qcss_tpu.experiments.logical import LogicalProgram

        for d in (3, 5):
            lp = LogicalProgram(d, 1)
            getattr(lp, op)(0)
            lp.measure()
            for sec_model in ([lp.build()]
                              + ([lp.build_x()] if lp._x_obs else [])):
                for name, (fd, _) in model_fault_distances(
                        sec_model).items():
                    assert fd == d, (op, d, name, fd)

    def test_product_init_regression(self):
        """data_init='product' documents the round-4 defect: the open
        X-sector birth boundary pins X̄-sensitive channels at fd 3."""
        from qcss_tpu.experiments.logical import LogicalProgram

        lp = LogicalProgram(5, 1, data_init="product").mx(0)
        lp.measure()
        fd, _ = observable_fault_distance(lp.build_x().graph, 0)
        assert fd == 3

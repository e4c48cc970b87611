"""ckt_noise tests: DEM conversion, edge coloring, overlapping-window
decoding — driven by a duck-typed mock DetectorErrorModel so they run
without stim (reference test model: python_test/test_dem_matrices.py,
test_bipartite_edge_coloring.py)."""

import numpy as np
import pytest
from scipy.sparse import csr_matrix

from ldpc_tpu.ckt_noise import (
    BpOsdOverlappingWindowDecoder,
    LsdOverlappingWindowDecoder,
    bipartite_edge_coloring,
    detector_error_model_to_check_matrices,
    is_valid_bipartite_edge_coloring,
)
from ldpc_tpu.ckt_noise.css_code_memory_circuit import (
    _is_valid_time_steps_matrix,
)
from ldpc_tpu.codes import hamming_code, rep_code, surface_code


# ----------------------------------------------------------------------
# mock stim.DetectorErrorModel
# ----------------------------------------------------------------------
class MockTarget:
    def __init__(self, kind, val=0):
        self.kind = kind
        self.val = val

    def is_relative_detector_id(self):
        return self.kind == "det"

    def is_logical_observable_id(self):
        return self.kind == "obs"

    def is_separator(self):
        return self.kind == "sep"


class MockInstruction:
    def __init__(self, prob, targets):
        self.type = "error"
        self._prob = prob
        self._targets = targets

    def args_copy(self):
        return [self._prob]

    def targets_copy(self):
        return self._targets


class MockDem:
    def __init__(self, instructions, num_detectors, num_observables):
        self._instructions = instructions
        self.num_detectors = num_detectors
        self.num_observables = num_observables

    def flattened(self):
        return self._instructions


def error(prob, dets, obs=()):
    targets = [MockTarget("det", d) for d in dets]
    targets += [MockTarget("obs", o) for o in obs]
    return MockInstruction(prob, targets)


def rep_code_memory_dem(n_checks=2, rounds=6, p=0.01, q=0.02):
    """Phenomenological rep-code memory DEM with difference-syndrome
    detectors: data error on bit j at round r flips its adjacent checks
    at round r (and the observable for bit 0); measurement error at
    round r flips detectors r and r+1."""
    H = np.asarray(rep_code(n_checks + 1).todense(), np.uint8)
    instructions = []
    det = lambda r, c: r * n_checks + c
    for r in range(rounds):
        for j in range(n_checks + 1):
            dets = [det(r, c) for c in np.flatnonzero(H[:, j])]
            obs = (0,) if j == 0 else ()
            instructions.append(error(p, dets, obs))
        if r < rounds - 1:
            for c in range(n_checks):
                instructions.append(error(q, [det(r, c), det(r + 1, c)]))
    return MockDem(instructions, n_checks * rounds, 1)


# ----------------------------------------------------------------------
# dem_matrices
# ----------------------------------------------------------------------
def test_dem_to_matrices_basic():
    dem = MockDem(
        [
            error(0.1, [0, 1], (0,)),
            error(0.2, [1, 2]),
            error(0.05, [0, 1], (0,)),  # same detector set: priors compound
        ],
        num_detectors=3,
        num_observables=1,
    )
    m = detector_error_model_to_check_matrices(dem)
    assert m.check_matrix.shape == (3, 2)
    assert m.observables_matrix.shape == (1, 2)
    # p <- 0.1(1-0.05) + 0.05(1-0.1) = 0.14
    assert np.isclose(m.priors[0], 0.1 * 0.95 + 0.05 * 0.9)
    assert np.isclose(m.priors[1], 0.2)
    dense = np.asarray(m.check_matrix.todense())
    assert np.array_equal(dense[:, 0], [1, 1, 0])
    assert np.array_equal(dense[:, 1], [0, 1, 1])


def test_dem_hyperedge_decomposition():
    targets = [
        MockTarget("det", 0),
        MockTarget("det", 1),
        MockTarget("sep"),
        MockTarget("det", 2),
    ]
    dem = MockDem([MockInstruction(0.1, targets)], 3, 0)
    m = detector_error_model_to_check_matrices(dem)
    # one hyperedge {0,1,2} decomposed into edges {0,1} and {2}
    assert m.check_matrix.shape == (3, 1)
    assert m.edge_check_matrix.shape == (3, 2)
    assert m.hyperedge_to_edge_matrix.shape == (2, 1)
    assert m.hyperedge_to_edge_matrix.nnz == 2


def test_dem_undecomposed_hyperedge_raises():
    dem = MockDem(
        [error(0.1, [0, 1, 2])],
        3,
        0,
    )
    with pytest.raises(ValueError, match="decomposed"):
        detector_error_model_to_check_matrices(dem)
    m = detector_error_model_to_check_matrices(
        dem, allow_undecomposed_hyperedges=True
    )
    assert m.check_matrix.shape == (3, 1)


# ----------------------------------------------------------------------
# bipartite edge coloring
# ----------------------------------------------------------------------
@pytest.mark.parametrize(
    "mat",
    [
        rep_code(6),
        hamming_code(3),
        surface_code(5).hx,
        csr_matrix(np.ones((4, 5), np.uint8)),
    ],
)
def test_bipartite_edge_coloring_valid(mat):
    colored = bipartite_edge_coloring(mat)
    assert is_valid_bipartite_edge_coloring(mat, colored)


def test_edge_coloring_random_graphs():
    rng = np.random.default_rng(0)
    for _ in range(10):
        mat = csr_matrix((rng.random((8, 12)) < 0.4).astype(np.uint8))
        if mat.nnz == 0:
            continue
        colored = bipartite_edge_coloring(mat)
        assert is_valid_bipartite_edge_coloring(mat, colored)


def test_time_steps_validation():
    H = csr_matrix(hamming_code(3))
    colored = bipartite_edge_coloring(H)
    assert _is_valid_time_steps_matrix(H, colored)
    bad = colored.copy()
    bad.data[:] = 1  # duplicate steps within a row
    assert not _is_valid_time_steps_matrix(H, bad)


# ----------------------------------------------------------------------
# overlapping-window decoding
# ----------------------------------------------------------------------
@pytest.mark.parametrize(
    "cls", [BpOsdOverlappingWindowDecoder, LsdOverlappingWindowDecoder]
)
def test_overlapping_window_rep_code(cls):
    dem = rep_code_memory_dem(n_checks=2, rounds=6)
    dec = cls(
        dem,
        decodings=2,
        window=4,
        commit=2,
        num_checks=2,
        decoder_config={"max_iter": 20},
    )
    m = detector_error_model_to_check_matrices(
        dem, allow_undecomposed_hyperedges=True
    )
    Hd = np.asarray(m.check_matrix.todense(), np.uint8)
    Od = np.asarray(m.observables_matrix.todense(), np.uint8)
    # every weight-1 mechanism decodes to the right observable prediction
    wrong = 0
    for e_idx in range(Hd.shape[1]):
        e = np.zeros(Hd.shape[1], np.uint8)
        e[e_idx] = 1
        shot = (Hd @ e) % 2
        expect = (Od @ e) % 2
        pred = dec.decode(shot)
        wrong += int(not np.array_equal(pred % 2, expect))
    assert wrong == 0

    # batched decode agrees with single-shot decode
    rng = np.random.default_rng(3)
    errs = (rng.random((16, Hd.shape[1])) < 0.05).astype(np.uint8)
    shots = (errs @ Hd.T) % 2
    batch_preds = dec.decode_batch(shots.astype(np.uint8))
    for i in range(16):
        single = dec.decode(shots[i].astype(np.uint8))
        assert np.array_equal(batch_preds[i].astype(int) % 2, single % 2)


def test_overlapping_window_round_mismatch_raises():
    dem = rep_code_memory_dem(n_checks=2, rounds=6)
    with pytest.raises(ValueError, match="multiple"):
        BpOsdOverlappingWindowDecoder(
            dem, decodings=2, window=4, commit=3, num_checks=2
        )


# ---------------------------------------------------------------------------
# BipartiteGraph class API + legacy circuit-sim module
# (reference: bipartite_edge_coloring.py:11-253, not_an_arb_ckt_simulator.py)
# ---------------------------------------------------------------------------


def test_bipartite_graph_class_coloring():
    import warnings
    from scipy.sparse import csr_matrix
    from ldpc_tpu.ckt_noise import BipartiteGraph
    from ldpc_tpu.ckt_noise.not_an_arb_ckt_simulator import (
        get_stabilizer_time_steps,
        rep_code,
    )

    H, L = rep_code(6)
    g = BipartiteGraph.from_biadjacency_matrix(H)
    assert g.degree == 2
    g.bipartite_edge_coloring()
    g.assert_has_edge_coloring()
    assert (g.to_biadjacency_matrix() != csr_matrix(H)).nnz == 0

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        ts, mb = get_stabilizer_time_steps(H)
    covered = {
        (k, q)
        for row in ts
        for k, q in enumerate(row)
        if q is not None
    }
    assert covered == set(zip(*H.nonzero()))
    # measured_bits is the transpose view
    for k, row in enumerate(mb):
        for t, q in enumerate(row):
            if q is not None:
                assert ts[t][k] == q


def test_legacy_sim_deprecation_warnings():
    import warnings
    from ldpc_tpu.ckt_noise.not_an_arb_ckt_simulator import (
        get_stabilizer_time_steps,
        rep_code,
    )

    H, _ = rep_code(4)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        get_stabilizer_time_steps(H)
    assert any(issubclass(w.category, DeprecationWarning) for w in caught)


# ----------------------------------------------------------------------
# device-scan overlapping windows (ckt_noise/device_scan.py)
# ----------------------------------------------------------------------
@pytest.mark.parametrize(
    "cls", [BpOsdOverlappingWindowDecoder, LsdOverlappingWindowDecoder]
)
def test_device_scan_owd_matches_host_loop(cls):
    """On a time-translation-invariant DEM the middle windows compile
    into one device scan; predictions must equal the pure host loop's."""
    dem = rep_code_memory_dem(n_checks=3, rounds=14)
    kwargs = dict(
        decodings=6,
        window=4,
        commit=2,
        num_checks=3,
        decoder_config={"max_iter": 20},
    )
    dec = cls(dem, **kwargs)
    scan = dec._maybe_device_scan()
    assert scan is not None, "uniform windows not detected"
    assert scan[0].w_lo == 1 and scan[0].w_hi == 5

    host = cls(dem, **kwargs)
    host._device_scan = None  # force the pure host loop

    m = detector_error_model_to_check_matrices(
        dem, allow_undecomposed_hyperedges=True
    )
    Hd = np.asarray(m.check_matrix.todense(), np.uint8)
    rng = np.random.default_rng(9)
    errs = (rng.random((24, Hd.shape[1])) < 0.03).astype(np.uint8)
    shots = ((errs @ Hd.T) % 2).astype(np.uint8)
    pred_scan = dec.decode_batch(shots.copy())
    pred_host = host.decode_batch(shots.copy())
    assert np.array_equal(pred_scan % 2, pred_host % 2)

    # weight-1 mechanisms predict their own observables exactly
    Od = np.asarray(m.observables_matrix.todense(), np.uint8)
    wrong = 0
    for e_idx in range(0, Hd.shape[1], 3):
        e = np.zeros(Hd.shape[1], np.uint8)
        e[e_idx] = 1
        shot = (Hd @ e) % 2
        pred = dec.decode(shot)
        wrong += int(not np.array_equal(pred % 2, (Od @ e) % 2))
    assert wrong == 0


def test_device_scan_rejects_irregular():
    """A DEM whose windows are not shift-invariant keeps the host loop."""
    dem = rep_code_memory_dem(n_checks=2, rounds=6)
    dec = BpOsdOverlappingWindowDecoder(
        dem, decodings=2, window=4, commit=2, num_checks=2,
        decoder_config={"max_iter": 10},
    )
    assert dec._maybe_device_scan() is None  # too few windows

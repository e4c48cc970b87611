"""LSD decoder tests (reference behavior: src_cpp/lsd.hpp,
python_test/test_bplsd.py / test_qcodes.py patterns)."""

import numpy as np
import pytest

from ldpc_tpu import BpLsdDecoder, LsdDecoder
from ldpc_tpu.codes import hamming_code, rep_code, ring_code, surface_code


def all_syndromes(m):
    return (
        (np.arange(2**m)[:, None] >> np.arange(m)[None, :]) & 1
    ).astype(np.uint8)


def test_lsd0_hamming_exhaustive():
    H = hamming_code(3)
    Hd = np.asarray(H.todense(), np.uint8)
    dec = LsdDecoder(H, bits_per_step=1)
    syn = all_syndromes(3)
    weights = np.ones(Hd.shape[1])
    out = dec.decode_batch(syn, weights)
    assert dec.valid_batch.all()
    assert np.array_equal((out @ Hd.T) % 2, syn)


@pytest.mark.parametrize("method,order", [("lsd_cs", 3), ("lsd_e", 3)])
def test_lsdw_hamming_exhaustive(method, order):
    H = hamming_code(3)
    Hd = np.asarray(H.todense(), np.uint8)
    dec = LsdDecoder(H, bits_per_step=1, lsd_method=method, lsd_order=order)
    syn = all_syndromes(3)
    weights = 0.3 + 0.1 * np.arange(Hd.shape[1])
    out = dec.decode_batch(syn, weights)
    assert dec.valid_batch.all()
    assert np.array_equal((out @ Hd.T) % 2, syn)


def test_lsdw_not_heavier_than_lsd0():
    """Higher-order candidates may only lower the solution weight."""
    code = surface_code(5)
    Hd = np.asarray(code.hx.todense(), np.uint8)
    rng = np.random.default_rng(3)
    errors = (rng.random((64, Hd.shape[1])) < 0.08).astype(np.uint8)
    syn = (errors @ Hd.T % 2).astype(np.uint8)
    w = rng.random(Hd.shape[1]) + 0.5
    d0 = LsdDecoder(code.hx, bits_per_step=1)
    d5 = LsdDecoder(code.hx, bits_per_step=1, lsd_method="lsd_cs", lsd_order=5)
    out0 = d0.decode_batch(syn, w)
    out5 = d5.decode_batch(syn, w)
    assert np.array_equal((out0 @ Hd.T) % 2, syn)
    assert np.array_equal((out5 @ Hd.T) % 2, syn)
    assert (out5.sum(axis=1) <= out0.sum(axis=1)).all()
    assert (out5.sum(axis=1) < out0.sum(axis=1)).any()


def test_bplsd_surface_code():
    code = surface_code(5)
    Hd = np.asarray(code.hx.todense(), np.uint8)
    dec = BpLsdDecoder(
        code.hx,
        error_rate=0.05,
        max_iter=5,
        bp_method="minimum_sum",
        ms_scaling_factor=0.625,
        bits_per_step=1,
        lsd_method="lsd_cs",
        lsd_order=3,
    )
    rng = np.random.default_rng(149)
    errors = (rng.random((128, Hd.shape[1])) < 0.05).astype(np.uint8)
    syn = (errors @ Hd.T % 2).astype(np.uint8)
    out = dec.decode_batch(syn)
    assert np.array_equal((out @ Hd.T) % 2, syn)
    assert (~dec.converge_batch).any()  # LSD actually exercised


def test_bplsd_osd_compat_kwargs():
    dec = BpLsdDecoder(
        rep_code(10), error_rate=0.1, osd_method="osd_cs", osd_order=2
    )
    assert dec.lsd_method == "LSD_CS"
    assert dec.lsd_order == 2


def test_bplsd_validation():
    with pytest.raises(ValueError):
        BpLsdDecoder(rep_code(10), error_rate=0.1, lsd_order=-1)
    with pytest.raises(ValueError):
        BpLsdDecoder(rep_code(10), error_rate=0.1, lsd_method="bogus")
    dec = BpLsdDecoder(rep_code(10), error_rate=0.1)
    with pytest.raises(ValueError):
        dec.lsd_order = 2  # method is LSD_0
    with pytest.warns(UserWarning):
        d2 = BpLsdDecoder(
            rep_code(10), error_rate=0.1, lsd_method="lsd_e", lsd_order=16
        )


def test_bplsd_always_run_lsd():
    H = rep_code(10)
    Hd = np.asarray(H.todense(), np.uint8)
    dec = BpLsdDecoder(
        H, error_rate=0.1, max_iter=20, always_run_lsd=True, bits_per_step=1
    )
    e = np.zeros(10, np.uint8)
    e[4] = 1
    s = (Hd @ e % 2).astype(np.uint8)
    out = dec.decode(s)
    assert np.array_equal(Hd @ out % 2, s)


def test_bplsd_stats_plumbing():
    """Mirrors the reference's test_stats_reset
    (reference: python_test/test_bplsd.py:169-192): max_iter=1 forces
    LSD, stats fill; a converged decode clears them."""
    H = rep_code(5)
    dec = BpLsdDecoder(
        H, error_rate=0.1, max_iter=1, bp_method="min_sum",
        ms_scaling_factor=1.0,
    )
    assert dec.do_stats is False
    dec.set_do_stats(True)
    assert dec.do_stats is True
    s = np.array([1, 1, 0, 1], np.uint8)
    dec.decode(s)
    stats = dec.statistics
    assert stats["lsd_order"] == 0
    assert stats["lsd_method"] == 1  # reference OsdMethod enum: OSD_0 == 1
    assert stats.elapsed_time > 0
    assert stats["syndrome"] == list(map(int, s))
    assert len(stats["bit_llrs"]) == H.shape[1]
    assert len(stats["individual_cluster_stats"]) > 0
    assert len(stats["global_timestep_bit_history"]) > 0
    dec.set_additional_stat_fields([0], [1], [0])
    assert dec.statistics.error == [0]
    dec.reset_cluster_stats()
    assert dec.statistics.syndrome == []
    assert isinstance(dec.statistics.to_json(), str)
    # a decode the BP stage converges on resets the stats
    # (_bplsd_decoder.pyx:146-150)
    dec2 = BpLsdDecoder(H, error_rate=0.1, max_iter=20)
    dec2.set_do_stats(True)
    dec2.decode(np.array([1, 0, 0, 0], np.uint8))
    assert dec2.statistics["individual_cluster_stats"] == {}


def test_bplsd_stats_content():
    """Per-cluster records carry real growth history: two separated
    flipped checks on a rep code form two clusters that grow and merge
    or validate; every active cluster has a consistent solution and
    size history (reference semantics: lsd.hpp:652-816)."""
    H = rep_code(12)
    Hd = np.asarray(H.todense(), np.uint8)
    dec = BpLsdDecoder(
        H, error_rate=0.1, max_iter=1, bits_per_step=1,
        always_run_lsd=True,
    )
    dec.set_do_stats(True)
    e = np.zeros(12, np.uint8)
    e[3] = 1
    e[7] = 1
    s = (Hd @ e % 2).astype(np.uint8)
    out = dec.decode(s)
    assert np.array_equal(Hd @ out % 2, s)
    stats = dec.statistics
    clusters = stats["individual_cluster_stats"]
    # one cluster per flipped syndrome check (lsd.hpp:702-712)
    assert set(clusters.keys()) == set(map(int, np.flatnonzero(s)))
    active = [c for c in clusters.values() if c.active]
    assert active, "at least one cluster survives"
    for cid, cs in clusters.items():
        assert cs.cluster_id == cid
        assert cs.size_history[0] == 0  # created empty
        if cs.active:
            assert cs.got_valid_in_timestep >= 0
            assert cs.final_bit_count == len(cs.final_bits) > 0
            assert len(cs.solution) == cs.final_bit_count
            # solution equals the global decoding restricted to the bits
            assert cs.solution == [int(out[b]) for b in cs.final_bits]
            assert cs.nr_of_non_zero_check_matrix_entries > 0
            assert 0.0 <= cs.cluster_pcm_sparsity < 1.0
        else:
            assert cs.absorbed_by_cluster in clusters
            assert cs.got_inactive_in_timestep >= 0
    # the timestep history covers every bit of every final cluster that
    # was ever added
    added_bits = sorted(
        b
        for per in stats["global_timestep_bit_history"].values()
        for bits in per.values()
        for b in bits
    )
    final_bits = sorted(b for c in clusters.values() for b in (c.final_bits if c.active else []))
    assert set(final_bits) <= set(added_bits)
    # json export round-trips with reference field names
    import json

    j = json.loads(dec.statistics.to_json())
    assert "elapsed_time_mu" in j
    assert j["individual_cluster_stats"]


def test_bplsd_zero_syndrome():
    dec = BpLsdDecoder(rep_code(5), error_rate=0.1)
    x = dec.decode(np.zeros(4, np.uint8))
    assert not x.any() and dec.converge


def test_bplsd_stats_row_selection():
    """`set_do_stats(True, row=k)` records statistics for batch row k
    (beyond-reference: the reference only ever decodes one syndrome per
    call; `statistics.stats_row` documents which row the record
    describes)."""
    H = rep_code(12)
    Hd = np.asarray(H.todense(), np.uint8)
    dec = BpLsdDecoder(
        H, error_rate=0.1, max_iter=1, bits_per_step=1, always_run_lsd=True
    )
    dec.set_do_stats(True, row=2)
    assert dec.stats_row == 2
    errs = np.zeros((3, 12), np.uint8)
    errs[0, 1] = 1
    errs[1, 5] = 1
    errs[2, 3] = 1
    errs[2, 8] = 1
    syn = (errs @ Hd.T % 2).astype(np.uint8)
    out = dec.decode_batch(syn)
    stats = dec.statistics
    assert stats.stats_row == 2
    assert stats["syndrome"] == list(map(int, syn[2]))
    clusters = stats["individual_cluster_stats"]
    assert set(clusters.keys()) == set(map(int, np.flatnonzero(syn[2])))
    for cs in clusters.values():
        if cs.active:
            assert cs.solution == [int(out[2][b]) for b in cs.final_bits]
    with pytest.raises(ValueError):
        dec.set_do_stats(True, row=-1)


def test_stats_json_global_history_shape():
    """`to_json` mirrors the reference serializer's shape for
    global_timestep_bit_history: stringified timestep keys mapping
    stringified cluster ids to bit lists (lsd.hpp:583-599)."""
    import json

    H = rep_code(10)
    Hd = np.asarray(H.todense(), np.uint8)
    dec = BpLsdDecoder(
        H, error_rate=0.1, max_iter=1, bits_per_step=1, always_run_lsd=True
    )
    dec.set_do_stats(True)
    e = np.zeros(10, np.uint8)
    e[4] = 1
    s = (Hd @ e % 2).astype(np.uint8)
    dec.decode(s)
    d = json.loads(dec.statistics.to_json())
    assert "elapsed_time_mu" in d
    hist = d["global_timestep_bit_history"]
    assert hist, "history must be populated"
    for ts, per_cluster in hist.items():
        int(ts)  # stringified int keys
        assert isinstance(per_cluster, dict)
        for cid, bits in per_cluster.items():
            int(cid)
            assert isinstance(bits, list)
            assert all(isinstance(b, int) for b in bits)

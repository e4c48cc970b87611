"""Compiled-reference parity for the flip, soft-info and MBP families.

test_ler_parity.py pins the BP+{OSD,LSD,UF} pipelines against the actual
compiled reference; these three decoders have subtle update rules
(sequential in-sweep syndrome updates, the soft-syndrome virtual-update
cutoff, per-Pauli alpha memory) where silent divergence would otherwise
be invisible — the reference modes were added to
native/bench_baseline.cpp for exactly this test (the reference's own
mbp extension is unbuildable upstream; see
ldpc_tpu/utils/reference_baseline.py for the iterator shim).
"""

import numpy as np
import pytest

from ldpc_tpu.codes import rep_code, surface_code
from ldpc_tpu.utils import reference_baseline as rb

pytestmark = pytest.mark.skipif(
    not rb.available(), reason="reference tree or C++ toolchain unavailable"
)


def test_flip_parity_bitwise():
    """Plain flip (no p-flip randomness) is fully deterministic on both
    sides — the sequential sweep with immediate syndrome updates must
    reproduce the reference decision-for-decision
    (flip.hpp:61-137)."""
    from ldpc_tpu import FlipDecoder

    code = surface_code(9)
    H = np.asarray(code.hx.todense(), np.uint8)
    m, n = H.shape
    rng = np.random.default_rng(42)
    errors = (rng.random((400, n)) < 0.04).astype(np.uint8)
    syndromes = (errors @ H.T % 2).astype(np.uint8)

    stdin = rb.make_input(H, [0.04] * n, syndromes)
    _, ref = rb.run(
        stdin, max_iter=0, decoder="flip", dump=True, extra1=0, extra2=1
    )
    ours = np.asarray(FlipDecoder(code.hx, max_iter=0).decode_batch(syndromes))
    assert ref.shape == ours.shape
    assert (ref == ours).all(), (
        f"flip decisions diverge on {(ref != ours).any(axis=1).sum()} "
        "syndromes"
    )


def test_pflip_parity_ler():
    """P-flip tie-breaks are random (independent streams), so parity is
    statistical: the solve rate (syndrome reproduced) must agree within
    Monte-Carlo error (flip.hpp:109-123)."""
    from ldpc_tpu import FlipDecoder

    code = rep_code(40)
    H = np.asarray(code.todense(), np.uint8)
    m, n = H.shape
    rng = np.random.default_rng(7)
    errors = (rng.random((600, n)) < 0.06).astype(np.uint8)
    syndromes = (errors @ H.T % 2).astype(np.uint8)

    stdin = rb.make_input(H, [0.06] * n, syndromes)
    _, ref = rb.run(
        stdin, max_iter=0, decoder="flip", dump=True, extra1=3, extra2=99
    )
    dec = FlipDecoder(code, max_iter=0, pfreq=3, seed=123)
    ours = np.asarray(dec.decode_batch(syndromes))
    solved_ref = ((ref @ H.T) % 2 == syndromes).all(axis=1).mean()
    solved_our = ((ours @ H.T) % 2 == syndromes).all(axis=1).mean()
    sigma = np.sqrt(2 * 0.25 / syndromes.shape[0])
    assert abs(solved_ref - solved_our) <= max(4 * sigma, 0.05), (
        solved_ref,
        solved_our,
    )


def test_soft_info_parity():
    """Soft-syndrome serial min-sum BP vs the reference
    soft_info_decode_serial (bp.hpp:547-665): same soft syndromes, same
    cutoff/sigma — decisions must agree on almost every syndrome (the
    engines differ only in summation order / f.p. precision)."""
    from ldpc_tpu import SoftInfoBpDecoder

    code = rep_code(30)
    H = np.asarray(code.todense(), np.uint8)
    m, n = H.shape
    rng = np.random.default_rng(11)
    errors = (rng.random((300, n)) < 0.05).astype(np.uint8)
    hard = (errors @ H.T % 2).astype(np.uint8)
    sigma = 0.6
    soft = (1.0 - 2.0 * hard) + sigma * rng.normal(size=hard.shape)

    cutoff = 5.0
    stdin = rb.make_input(H, [0.05] * n, None, soft_syndromes=soft)
    _, ref = rb.run(
        stdin,
        max_iter=20,
        ms_factor=1.0,
        decoder="softinfo",
        dump=True,
        extra1=cutoff,
        extra2=sigma,
    )
    dec = SoftInfoBpDecoder(
        code, error_rate=0.05, max_iter=20, cutoff=cutoff, sigma=sigma
    )
    ours = np.stack([dec.decode(s) for s in soft]).astype(np.uint8)
    agree = (ref == ours).all(axis=1).mean()
    assert agree > 0.97, f"soft-info decision agreement {agree}"


def test_mbp_parity():
    """GF(4) MBP (min-sum, alpha/beta/gamma) vs the compiled reference
    mbp_decoder (mbp.hpp:112-307) on a CSS code with explicit per-Pauli
    channels: deterministic serial updates, decisions must agree."""
    from ldpc_tpu import MbpDecoder

    code = surface_code(5)
    hx = np.asarray(code.hx.todense(), np.uint8)
    hz = np.asarray(code.hz.todense(), np.uint8)
    Hgf4 = np.vstack([hz * 3, hx * 1]).astype(np.uint8)
    m, n = Hgf4.shape
    rng = np.random.default_rng(5)
    # GF(4) errors -> reference pauli_syndrome (mbp.hpp:43-56)
    errs = rng.choice(4, size=(200, n), p=[0.94, 0.02, 0.02, 0.02])
    syndromes = np.zeros((200, m), np.uint8)
    for s in range(200):
        for i in range(m):
            acc = 0
            for j in range(n):
                if Hgf4[i, j] and errs[s, j] and errs[s, j] != Hgf4[i, j]:
                    acc += 1
            syndromes[s, i] = acc % 2

    p = 0.02
    ch3 = np.full((3, n), p)
    alpha, beta, gamma = 1.0, 0.0, 0.9
    stdin = rb.make_input(Hgf4, None, syndromes, channel3=ch3)
    _, ref = rb.run(
        stdin,
        max_iter=15,
        ms_factor=gamma,
        decoder="mbp",
        dump=True,
        extra1=alpha,
        extra2=beta,
    )
    dec = MbpDecoder(
        Hgf4=Hgf4,
        error_channel=ch3,
        max_iter=15,
        alpha_parameter=alpha,
        beta_parameter=beta,
        bp_method="min_sum",
        gamma_parameter=gamma,
    )
    ours = np.stack([np.asarray(dec.decode(s)) for s in syndromes]).astype(
        np.uint8
    )
    assert ref.shape == ours.shape
    agree = (ref == ours).all(axis=1).mean()
    assert agree > 0.95, f"mbp decision agreement {agree}"


def test_belief_find_peeling_parity_ler():
    """BP + union-find PEELING vs the compiled reference's uf-peel
    composition (union_find.hpp:431-480): logical error rates agree
    within Monte-Carlo error (forest choice differs — any spanning
    forest's tree solution is an equally valid correction)."""
    code = surface_code(7, compute_logicals=True)
    H = np.asarray(code.hx.todense(), np.uint8)
    lx = np.asarray(code.lx.todense(), np.uint8)
    m, n = H.shape
    rng = np.random.default_rng(21)
    B = 512
    errors = (rng.random((B, n)) < 0.04).astype(np.uint8)
    syndromes = (errors @ H.T % 2).astype(np.uint8)

    stdin = rb.make_input(H, [0.04] * n, syndromes)
    _, ref = rb.run(
        stdin, max_iter=12, ms_factor=0.625, decoder="uf-peel", dump=True
    )
    from ldpc_tpu import BeliefFindDecoder

    dec = BeliefFindDecoder(
        code.hx,
        error_rate=0.04,
        max_iter=12,
        bp_method="minimum_sum",
        ms_scaling_factor=0.625,
        uf_method="peeling",
    )
    ours = np.asarray(dec.decode_batch(syndromes))
    assert ((ours @ H.T) % 2 == syndromes).all()
    assert ((ref @ H.T) % 2 == syndromes).all()
    fail_ref = ((errors ^ ref) @ lx.T % 2).any(axis=1).mean()
    fail_our = ((errors ^ ours) @ lx.T % 2).any(axis=1).mean()
    sigma = np.sqrt(2 * max(fail_ref, 1e-3) / B)
    assert abs(fail_ref - fail_our) <= max(4 * sigma, 16 / B), (
        fail_ref,
        fail_our,
    )


def test_standalone_uf_parity_ler():
    """Standalone (no BP) UnionFindDecoder matrix + peeling vs the
    compiled reference's unguided UfDecoder
    (union_find.hpp:431,485 single-argument overloads)."""
    from ldpc_tpu import UnionFindDecoder

    code = surface_code(7, compute_logicals=True)
    H = np.asarray(code.hx.todense(), np.uint8)
    lx = np.asarray(code.lx.todense(), np.uint8)
    m, n = H.shape
    rng = np.random.default_rng(33)
    B = 384
    errors = (rng.random((B, n)) < 0.03).astype(np.uint8)
    syndromes = (errors @ H.T % 2).astype(np.uint8)
    stdin = rb.make_input(H, [0.03] * n, syndromes)
    for mode, uf_method in [("uf-matrix-nobp", True), ("uf-peel-nobp", False)]:
        _, ref = rb.run(stdin, decoder=mode, dump=True)
        dec = UnionFindDecoder(code.hx, uf_method=uf_method)
        ours = np.asarray(dec.decode_batch(syndromes))
        assert ((ours @ H.T) % 2 == syndromes).all(), mode
        assert ((ref @ H.T) % 2 == syndromes).all(), mode
        fail_ref = ((errors ^ ref) @ lx.T % 2).any(axis=1).mean()
        fail_our = ((errors ^ ours) @ lx.T % 2).any(axis=1).mean()
        sigma = np.sqrt(2 * max(fail_ref, 1e-3) / B)
        assert abs(fail_ref - fail_our) <= max(4 * sigma, 16 / B), (
            mode,
            fail_ref,
            fail_our,
        )


def test_soft_info_parity_quantum_code_two_sigmas():
    """Soft-info parity beyond the single rep-code workload: a surface
    code (quantum, irregular degree) at two noise scales — decision
    agreement with the compiled reference soft_info_decode_serial
    (bp.hpp:547-665) at each sigma."""
    from ldpc_tpu import SoftInfoBpDecoder

    code = surface_code(5)
    H = np.asarray(code.hx.todense(), np.uint8)
    m, n = H.shape
    rng = np.random.default_rng(23)
    errors = (rng.random((200, n)) < 0.03).astype(np.uint8)
    hard = (errors @ H.T % 2).astype(np.uint8)
    cutoff = 4.0
    for sigma in (0.4, 0.8):
        soft = (1.0 - 2.0 * hard) + sigma * rng.normal(size=hard.shape)
        stdin = rb.make_input(H, [0.03] * n, None, soft_syndromes=soft)
        _, ref = rb.run(
            stdin,
            max_iter=18,
            ms_factor=1.0,
            decoder="softinfo",
            dump=True,
            extra1=cutoff,
            extra2=sigma,
        )
        dec = SoftInfoBpDecoder(
            code.hx, error_rate=0.03, max_iter=18, cutoff=cutoff,
            sigma=sigma,
        )
        ours = np.asarray(dec.decode_batch(soft)).astype(np.uint8)
        agree = (ref == ours).all(axis=1).mean()
        assert agree > 0.95, f"sigma={sigma}: agreement {agree}"


def test_mbp_parity_second_code_asymmetric_bias():
    """MBP on a second CSS family (toric) with an ASYMMETRIC per-Pauli
    channel and non-unit alpha — exercises the per-Pauli alpha memory
    and xyz bias handling (mbp.hpp:112-307) beyond the d=5 surface
    workload."""
    from ldpc_tpu import MbpDecoder
    from ldpc_tpu.codes import toric_code

    code = toric_code(4)
    hx = np.asarray(code.hx.todense(), np.uint8)
    hz = np.asarray(code.hz.todense(), np.uint8)
    Hgf4 = np.vstack([hz * 3, hx]).astype(np.uint8)
    m, n = Hgf4.shape
    rng = np.random.default_rng(31)
    px, py, pz = 0.03, 0.005, 0.015  # asymmetric xyz bias
    errs = rng.choice(
        4, size=(150, n), p=[1 - px - py - pz, px, py, pz]
    ).astype(np.uint8)
    syndromes = np.zeros((150, m), np.uint8)
    Hnz = Hgf4 != 0
    for s in range(150):
        anti = (errs[s][None, :] != 0) & Hnz & (errs[s][None, :] != Hgf4)
        syndromes[s] = anti.sum(axis=1) % 2
    ch3 = np.stack([
        np.full(n, px), np.full(n, py), np.full(n, pz)
    ])
    alpha, beta, gamma = 0.65, 0.0, 0.875
    stdin = rb.make_input(Hgf4, None, syndromes, channel3=ch3)
    _, ref = rb.run(
        stdin,
        max_iter=12,
        ms_factor=gamma,
        decoder="mbp",
        dump=True,
        extra1=alpha,
        extra2=beta,
    )
    dec = MbpDecoder(
        Hgf4=Hgf4,
        error_channel=ch3,
        max_iter=12,
        alpha_parameter=alpha,
        beta_parameter=beta,
        bp_method="min_sum",
        gamma_parameter=gamma,
    )
    ours = np.asarray(dec.decode_batch(syndromes)).astype(np.uint8)
    assert ref.shape == ours.shape
    agree = (ref == ours).all(axis=1).mean()
    assert agree > 0.93, f"mbp toric asymmetric agreement {agree}"


def test_bp_flip_composition_parity_ler():
    """BpFlipDecoder (flip -> residual -> BP -> XOR, _bp_flip.pyx:44-61)
    vs the reference composition run by the compiled driver's bpflip
    mode: identical flip stages (deterministic), so solve rates and
    logical error rates must agree within Monte-Carlo error."""
    from ldpc_tpu import BpFlipDecoder

    code = surface_code(7, compute_logicals=True)
    H = np.asarray(code.hx.todense(), np.uint8)
    lx = np.asarray(code.lx.todense(), np.uint8)
    m, n = H.shape
    rng = np.random.default_rng(17)
    B = 400
    errors = (rng.random((B, n)) < 0.03).astype(np.uint8)
    syndromes = (errors @ H.T % 2).astype(np.uint8)
    stdin = rb.make_input(H, [0.03] * n, syndromes)
    _, ref = rb.run(
        stdin, max_iter=25, ms_factor=0.625, decoder="bpflip",
        dump=True, extra1=0, extra2=1,
    )
    dec = BpFlipDecoder(
        code.hx,
        error_rate=0.03,
        max_iter=25,
        bp_method="minimum_sum",
        ms_scaling_factor=0.625,
        flip_iterations=0,
    )
    ours = np.asarray(dec.decode_batch(syndromes)).astype(np.uint8)
    solved_ref = ((ref @ H.T) % 2 == syndromes).all(axis=1)
    solved_our = ((ours @ H.T) % 2 == syndromes).all(axis=1)
    sigma = np.sqrt(2 * 0.25 / B)
    assert abs(solved_ref.mean() - solved_our.mean()) <= max(
        4 * sigma, 0.05
    ), (solved_ref.mean(), solved_our.mean())
    # logical error rate agreement on the solved subset
    both = solved_ref & solved_our
    fail_ref = ((errors[both] ^ ref[both]) @ lx.T % 2).any(axis=1).mean()
    fail_our = ((errors[both] ^ ours[both]) @ lx.T % 2).any(axis=1).mean()
    sig = np.sqrt(2 * max(fail_ref, 1e-3) / max(int(both.sum()), 1))
    assert abs(fail_ref - fail_our) <= max(4 * sig, 20 / B), (
        fail_ref,
        fail_our,
    )

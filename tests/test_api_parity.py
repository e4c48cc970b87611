"""Import-path and surface parity with the reference package layout
(reference: src_python/ldpc/*/__init__.py): a reference user should be
able to port scripts by renaming ``ldpc`` -> ``ldpc_tpu`` only.
"""

import json

import numpy as np
import pytest

from ldpc_tpu.codes import rep_code, hamming_code


def test_subpackage_import_paths():
    # reference: src_python/ldpc/bp_decoder/__init__.py:1-7
    from ldpc_tpu.bp_decoder import (  # noqa: F401
        BpDecoder,
        SoftInfoBpDecoder,
        io_test,
        BpDecoderBase,
        bp_decoder,
    )
    # reference: src_python/ldpc/bposd_decoder/__init__.py:1-2
    from ldpc_tpu.bposd_decoder import (  # noqa: F401
        BpOsdDecoder,
        SoftInfoBpOsdDecoder,
        bposd_decoder,
    )
    from ldpc_tpu.bplsd_decoder import BpLsdDecoder  # noqa: F401
    from ldpc_tpu.belief_find_decoder import BeliefFindDecoder  # noqa: F401
    from ldpc_tpu.union_find_decoder import UnionFindDecoder  # noqa: F401
    from ldpc_tpu.lsd_decoder import LsdDecoder  # noqa: F401
    from ldpc_tpu.bp_flip import BpFlipDecoder  # noqa: F401
    from ldpc_tpu.mbp_decoder import mbp_decoder  # noqa: F401

    import ldpc_tpu

    # reference root exports (src_python/ldpc/__init__.py:5-15)
    for name in (
        "BpDecoder",
        "BpOsdDecoder",
        "BpLsdDecoder",
        "SoftInfoBpDecoder",
        "BeliefFindDecoder",
        "SinterBpOsdDecoder",
        "UnionFindDecoder",
        "bp_decoder",
        "bposd_decoder",
    ):
        assert getattr(ldpc_tpu, name) is not None


def test_code_util_legacy_compute_code_distance():
    # reference: src_python/ldpc/code_util/_legacy_v1.py:4-24
    from ldpc_tpu.code_util import compute_code_distance

    assert compute_code_distance(rep_code(5)) == 5
    assert compute_code_distance(hamming_code(3)) == 3


def test_mbp_update_alpha():
    # reference: _mbp_decoder.pyx:144-175
    from ldpc_tpu import MbpDecoder

    Hgf4 = np.array([[1, 2, 0], [0, 3, 1]], dtype=np.uint8)
    dec = MbpDecoder(Hgf4=Hgf4, error_rate=0.1, max_iter=5)
    dec.update_alpha(0.5)
    assert (dec.alpha == 0.5).all()
    dec.update_alpha(np.array([0.5, 0.75, 1.0]))
    assert (dec.alpha[1] == 0.75).all()
    per_qubit = np.full((3, 3), 0.9)
    dec.update_alpha(per_qubit)
    assert (dec.alpha == 0.9).all()
    dec.update_alpha(None)  # no-op, as upstream
    assert (dec.alpha == 0.9).all()
    with pytest.raises(ValueError):
        dec.update_alpha(np.ones(7))
    # the rebuilt program still decodes
    out = dec.decode(np.array([1, 0]))
    assert out.shape == (3,)


def test_save_results(tmp_path):
    # reference: simulation_utils.py:246-288
    from ldpc_tpu.monte_carlo_simulation.simulation_utils import save_results

    outfile = tmp_path / "res.json"
    out = save_results(
        success_cnt=900,
        nr_runs=1000,
        p=0.01,
        s=0.02,
        input_vals={"bias": [1.0, np.inf, 0.5]},
        outfile=str(outfile),
        code_params={"k": 2, "n": 10},
        err_side="X",
        bp_iterations=5000,
    )
    assert out["X_success_cnt"] == 900
    assert out["avg_bp_iterations"] == 5.0
    assert out["bias"] == [1.0, "i", 0.5]
    reloaded = json.loads(outfile.read_text())
    assert reloaded["code_K"] == 2
    assert abs(reloaded["X_ler"] - 0.1) < 1e-12


def test_soft_info_bposd_decoder():
    """The reference declares SoftInfoBpOsdDecoder but ships it commented
    out (_bposd_decoder.pyx:302-582); ours is live: soft-info BP, then
    OSD on the hardened post-BP syndrome."""
    from ldpc_tpu import SoftInfoBpOsdDecoder

    H = rep_code(8)
    dec = SoftInfoBpOsdDecoder(
        H, error_rate=0.1, max_iter=20, osd_method="osd_cs", osd_order=2,
        sigma=0.5,
    )
    rng = np.random.default_rng(3)
    Hd = np.asarray(H.todense())
    for _ in range(5):
        err = (rng.random(Hd.shape[1]) < 0.1).astype(np.uint8)
        syn = Hd @ err % 2
        soft = np.where(syn == 1, -2.0, 2.0)
        out = dec.decode(soft)
        # a valid correction reproduces the (hard) syndrome
        assert ((Hd @ out) % 2 == syn).all()
    assert dec.osd_method == "OSD_CS"
    assert dec.osd_order == 2


def test_simulation_utils_alist_reexport():
    # reference simulation_utils.py:29-49 defines a local alist2numpy
    from ldpc_tpu.monte_carlo_simulation.simulation_utils import alist2numpy  # noqa: F401

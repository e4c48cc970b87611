"""Real 2-process ``jax.distributed`` rendezvous exercise.

test_distributed.py covers the single-host no-op branches; this test
spawns TWO actual OS processes with a localhost coordinator, runs
``ldpc_tpu.parallel.initialize_distributed`` (env-var plumbing included)
in each, builds a GLOBAL mesh spanning both processes' CPU devices, and
executes one psum'd sharded decode-statistics step — asserting the
multi-process tallies equal the single-process computation. This is the
rendezvous path SURVEY.md §2.4 promised that nothing previously
executed.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, os.environ["LDPC_TPU_REPO"])
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)  # match the suite's conftest
    from ldpc_tpu.parallel import initialize_distributed, is_distributed

    pid = initialize_distributed()  # env-configured rendezvous
    assert is_distributed(), "rendezvous branch not taken"
    assert jax.process_count() == 2, jax.process_count()
    assert pid == jax.process_index()
    assert jax.device_count() == 4 and jax.local_device_count() == 2

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ldpc_tpu.codes import rep_code
    from ldpc_tpu.ops import bp as bp_ops
    from ldpc_tpu.ops.pcm import compile_pcm

    # deterministic global workload, identical in every process
    H = rep_code(16)
    Hd = np.asarray(H.todense(), np.uint8)
    graph = compile_pcm(H)
    rng = np.random.default_rng(0)
    B = 32
    errors = (rng.random((B, Hd.shape[1])) < 0.1).astype(np.uint8)
    syndromes = (errors @ Hd.T % 2).astype(np.uint8)

    mesh = Mesh(np.array(jax.devices()), ("batch",))
    sharding = NamedSharding(mesh, P("batch"))
    # each process materialises only its addressable shards
    gsyn = jax.make_array_from_callback(
        syndromes.shape, sharding, lambda idx: syndromes[idx]
    )
    decode = bp_ops.make_parallel_decoder(
        graph, bp_ops.MINIMUM_SUM, 20, 1.0, dtype=jnp.float32
    )
    init_llr = jnp.asarray(
        bp_ops.channel_llr(np.full(Hd.shape[1], 0.1), dtype=np.float32)
    )

    def step(syn):
        res = decode(syn, init_llr)
        conv = jax.lax.psum(res.converged.sum(), "batch")
        weight = jax.lax.psum(res.decoding.sum(), "batch")
        return conv, weight

    sharded = jax.jit(
        jax.shard_map(
            step, mesh=mesh, in_specs=P("batch"), out_specs=P(),
            check_vma=False,
        )
    )
    conv, weight = sharded(gsyn)

    # single-process truth (local replicated computation)
    res = decode(jnp.asarray(syndromes), init_llr)
    print(
        "RESULT",
        pid,
        int(conv),
        int(weight),
        int(np.asarray(res.converged).sum()),
        int(np.asarray(res.decoding).sum()),
        flush=True,
    )
    assert int(conv) == int(np.asarray(res.converged).sum())
    assert int(weight) == int(np.asarray(res.decoding).sum())
    """
)


def test_two_process_rendezvous(tmp_path):
    port = None
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            LDPC_TPU_COORDINATOR=f"127.0.0.1:{port}",
            LDPC_TPU_NUM_PROCESSES="2",
            LDPC_TPU_PROCESS_ID=str(pid),
            LDPC_TPU_REPO=root,
        )
        env.pop("JAX_PLATFORMS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)
    results = [
        line.split()[1:]
        for out in outs
        for line in out.splitlines()
        if line.startswith("RESULT")
    ]
    assert len(results) == 2
    # both processes saw identical global tallies
    assert results[0][1:] == results[1][1:]

"""Multi-host initialization harness (SURVEY.md §2.4 comm backend)."""

from ldpc_tpu.parallel import (
    global_device_count,
    initialize_distributed,
    is_distributed,
    local_device_count,
    process_count,
)


def test_single_host_noop(monkeypatch):
    monkeypatch.delenv("LDPC_TPU_COORDINATOR", raising=False)
    monkeypatch.delenv("LDPC_TPU_NUM_PROCESSES", raising=False)
    assert initialize_distributed() == 0
    assert not is_distributed()
    assert process_count() == 1
    assert local_device_count() == global_device_count() >= 1


def test_idempotent(monkeypatch):
    monkeypatch.delenv("LDPC_TPU_COORDINATOR", raising=False)
    assert initialize_distributed() == initialize_distributed() == 0

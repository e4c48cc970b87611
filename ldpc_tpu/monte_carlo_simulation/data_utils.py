"""Simulation configuration and result-merging utilities
(reference: src_python/ldpc/monte_carlo_simulation/data_utils.py).
"""

import json
import os
from dataclasses import dataclass, field, fields
from itertools import product
from typing import Any, Dict, List, Optional, Union

import numpy as np


@dataclass
class BpParams:
    """Decoder-configuration record (reference: data_utils.py:15-34)."""

    bp_method: str = "msl"
    max_bp_iter: int = 30
    osd_order: int = 10
    osd_method: str = "osd_cs"
    ms_scaling_factor: float = 0.75
    schedule: str = "parallel"
    omp_thread_count: int = 1
    random_serial_schedule: int = 0
    serial_schedule_order: Optional[List[int]] = None
    cutoff: float = np.inf

    @classmethod
    def from_dict(cls, dict_):
        class_fields = {f.name for f in fields(cls)}
        return cls(**{k: v for k, v in dict_.items() if k in class_fields})


def calculate_error_rates(success_cnt: int, runs: int, code_params: Dict):
    """Word/logical error rates with binomial error bars
    (reference: data_utils.py:77-95)."""
    runs = float(runs)
    ler = 1.0 - (success_cnt / runs)
    ler_eb = np.sqrt((1.0 - ler) * ler / runs)
    wer = 1.0 - (1.0 - ler) ** (1.0 / code_params["k"])
    wer_eb = ler_eb * ((1.0 - ler_eb) ** (1.0 / code_params["k"] - 1)) / code_params["k"]
    return ler, ler_eb, wer, wer_eb


def is_converged(
    x_success: int, z_success: int, runs: int, code_params: Dict, precission: float
) -> bool:
    """(reference: data_utils.py:98-105)"""
    return _check_convergence(
        x_success, runs, code_params, precission
    ) and _check_convergence(z_success, runs, code_params, precission)


def _check_convergence(success_cnt, runs, code_params, precission_cutoff):
    if success_cnt == runs:
        return False
    _, _, _, wer_eb = calculate_error_rates(success_cnt, runs, code_params)
    return wer_eb < precission_cutoff


def replace_inf(lst: List) -> List:
    """json-safe: np.inf -> "i" (reference: data_utils.py:190-197)."""
    return ["i" if np.isinf(x) else x for x in lst]


def product_dict(**kwargs):
    """Cartesian product of configuration values
    (reference: data_utils.py:200-207)."""
    keys = kwargs.keys()
    for instance in product(*kwargs.values()):
        yield dict(zip(keys, instance))


def zip_dict(**kwargs):
    """Elementwise zip of configuration values
    (reference: data_utils.py:210-233)."""
    keys = kwargs.keys()
    for instance in zip(*kwargs.values()):
        yield dict(zip(keys, instance))


def _update_error_rates(success_cnt, runs, code_K):
    """(reference: data_utils.py:236-252)"""
    ler, ler_eb, wer, wer_eb = calculate_error_rates(
        success_cnt, runs, {"k": code_K}
    )
    return ler, ler_eb, wer, wer_eb


def merge_datasets(datasets: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Aggregate result dicts from independent runs of one experiment
    (reference: data_utils.py:255-303): run counts and success counts
    add; error rates recompute from the merged tallies."""
    if not datasets:
        return {}
    merged = dict(datasets[0])
    runs = sum(int(d.get("nr_runs", 0)) for d in datasets)
    x_success = sum(int(d.get("x_success_cnt", 0)) for d in datasets)
    z_success = sum(int(d.get("z_success_cnt", 0)) for d in datasets)
    merged["nr_runs"] = runs
    merged["x_success_cnt"] = x_success
    merged["z_success_cnt"] = z_success
    if "code_K" in merged and runs:
        for prefix, cnt in (("x", x_success), ("z", z_success)):
            ler, ler_eb, wer, wer_eb = _update_error_rates(
                cnt, runs, merged["code_K"]
            )
            merged[f"{prefix}_ler"] = ler
            merged[f"{prefix}_ler_eb"] = ler_eb
            merged[f"{prefix}_wer"] = wer
            merged[f"{prefix}_wer_eb"] = wer_eb
    return merged


def merge_json_files(input_path: str) -> None:
    """Merge per-worker JSON result files under ``input_path`` into
    ``<input_path>_merged`` (reference: data_utils.py:429-463)."""
    output = []
    for folder in sorted(os.listdir(input_path)):
        folder_path = os.path.join(input_path, folder)
        if not os.path.isdir(folder_path):
            continue
        data = []
        for fname in os.listdir(folder_path):
            if fname.endswith(".json"):
                with open(os.path.join(folder_path, fname)) as f:
                    data.append(json.load(f))
        if data:
            output.append(merge_datasets(data))
    if output:
        out_dir = input_path.rstrip("/") + "_merged"
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "merged.json"), "w") as f:
            json.dump(output, f, ensure_ascii=False, indent=4)

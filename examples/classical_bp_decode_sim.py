"""Classical BP decoding Monte-Carlo simulation
(reference workload: examples/classical_bp_decode_sim.py — rep_code(500),
p=0.3, min-sum BP, 30 iterations)."""

from ldpc_tpu.codes import rep_code
from ldpc_tpu.bp_decode_sim import classical_decode_sim

d = 500
pcm = rep_code(d)
error_rate = 0.3

output_dict = {"code_type": f"rep_code_{d}"}
output_dict = classical_decode_sim(
    pcm,
    error_rate,
    target_runs=1000,
    max_iter=30,
    seed=100,
    bp_method="ms",
    ms_scaling_factor=1,
    output_dict=output_dict,
)
print(output_dict)

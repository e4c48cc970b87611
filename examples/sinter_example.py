"""sinter integration example (requires stim + sinter installed;
reference workload: examples/sinter_example.py — rotated surface code
d in {5,7,9}, p in [0.001, 0.01], BP+OSD / BeliefFind / BP+LSD)."""

import numpy as np


def generate_example_tasks():
    import sinter
    import stim

    for p in np.arange(0.001, 0.01, 0.002):
        for d in [5, 7, 9]:
            circuit = stim.Circuit.generated(
                rounds=d,
                distance=d,
                after_clifford_depolarization=p,
                after_reset_flip_probability=p,
                before_measure_flip_probability=p,
                before_round_data_depolarization=p,
                code_task="surface_code:rotated_memory_z",
            )
            yield sinter.Task(
                circuit=circuit,
                json_metadata={"p": p, "d": d, "rounds": d},
            )


def main():
    import sinter

    from ldpc_tpu.sinter_decoders import (
        SinterBeliefFindDecoder,
        SinterBpOsdDecoder,
        SinterLsdDecoder,
    )

    samples = sinter.collect(
        num_workers=2,  # decode batches are device-wide; few workers suffice
        max_shots=20_000,
        max_errors=100,
        tasks=generate_example_tasks(),
        decoders=["bposd", "belief_find", "bplsd"],
        custom_decoders={
            "bposd": SinterBpOsdDecoder(
                max_iter=30, bp_method="ms", ms_scaling_factor=0.625,
                osd_method="osd_0",
            ),
            "belief_find": SinterBeliefFindDecoder(
                max_iter=30, bp_method="ms", ms_scaling_factor=0.625,
            ),
            "bplsd": SinterLsdDecoder(
                max_iter=30, bp_method="ms", ms_scaling_factor=0.625,
                lsd_order=0,
            ),
        },
    )
    for sample in samples:
        print(sample.to_csv_line())


if __name__ == "__main__":
    main()

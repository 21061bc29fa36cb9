"""Append reference seed-variance runs for individual models to
benchmarks/quality_parity.json without re-running the whole harness.

Usage: python benchmarks/quality_parity_extra_seed.py UCML [WRMF ...]

Reruns the requested models' TF reference with a different init + sampler
seed to calibrate run-to-run variance (same purpose as the built-in BPR
``reference_seed2`` run in quality_parity.main). The planted dataset is
regenerated deterministically (make_low_rank is seed-fixed), so curves
are directly comparable with the recorded ones.
"""

import json
import sys

import quality_parity as qp

RUNNERS = {
    "BPR": qp.run_reference_bpr,
    "UCML": qp.run_reference_ucml,
}


def main():
    models = sys.argv[1:] or ["UCML"]
    train_data, test_data = qp.make_low_rank()
    with open(qp.OUT_PATH) as f:
        out = json.load(f)
    for name in models:
        qp._log(f"=== {name}: reference seed-variance run ===")
        out[name]["reference_seed2"] = RUNNERS[name](
            train_data, test_data, seeds=(11, 12),
            sampler_seed=qp.SEED + 7)
        with open(qp.OUT_PATH, "w") as f:
            json.dump(out, f, indent=1)
    qp._log(f"updated {qp.OUT_PATH}")


if __name__ == "__main__":
    main()

"""Estimate the UCML 10k fp-chaos floor with MULTIPLE perturbed runs
(VERDICT r3 #5).

BASELINE.md's UCML row shows ours-vs-ref |ΔRecall@100| = 2.0e-4 at iter
10k while the single recorded fp-perturbation control shows 5.0e-5 —
4× outside. The early checkpoints' Recall values match EXACTLY
(quality_parity.json: ours == ref_dedup to the last digit at iters
250-1000), so the metric itself is parity-clean; the 10k delta is
fp-level trajectory divergence amplified by the discrete rank-K
boundary. A SINGLE control run understates the spread of that discrete
amplification, so this script runs the reference UCML from N additional
1e-7-perturbed inits (different perturbation seeds) and reports the
max pairwise spread across all reference replicas — the properly
estimated chaos band for this metric at this horizon.

All band members and the decisive pair are run by THIS script on the
current code (same batch stream): `ref_dedup_r4stream` + perturbed
replicas form the band, `ours_r4stream` vs `ref_dedup_r4stream` is the
comparison — r3-era entries in quality_parity.json trained on the
pre-r4 sampler stream and are never mixed into the band. Appends runs
to benchmarks/quality_parity.json under UCML/* and writes a summary
into benchmarks/ucml_chaos_floor.json.
"""

import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import quality_parity as qp

N_EXTRA = 3
METRICS = ("AUC", "Recall@50", "Recall@100")


def perturbed_inits(pseed):
    inits = qp.make_inits()
    rp = np.random.default_rng(pseed)
    return {k: (v + rp.normal(0, 1e-7, v.shape).astype(np.float32))
            if v.size else v for k, v in inits.items()}


def main():
    with open(qp.OUT_PATH) as f:
        out = json.load(f)
    ucml = out["UCML"]

    train_data, test_data = qp.make_low_rank()
    # STREAM CONSISTENCY (r4 review finding): this round changed the
    # native PairwiseSampler's batch stream (sequential epoch windows).
    # The r3-recorded `ours`/`ref_dedup` entries trained on the OLD
    # stream; replicas run now train on the NEW one — mixing eras into
    # one band would measure stream divergence, not fp chaos. So the
    # band is computed over SAME-STREAM replicas only: a fresh
    # unperturbed reference (`ref_dedup_r4stream`) + the perturbed
    # replicas, all run by this script on the current code, and the
    # decisive pair is a fresh `ours_r4stream` vs `ref_dedup_r4stream`.
    jobs = [("ref_dedup_r4stream",
             lambda: qp.run_reference_ucml(
                 train_data, test_data, qp.make_inits(),
                 grad_mode="dedup", tag="ref_dedup_r4stream",
                 iters=10000))]
    for k in range(2, 2 + N_EXTRA):
        key = f"ref_dedup_fp_perturbed_s{k}"
        jobs.append((key, lambda key=key, k=k: qp.run_reference_ucml(
            train_data, test_data, perturbed_inits(2000 + k),
            grad_mode="dedup", tag=key, iters=10000)))
    from openrec_tpu.models import UCML
    jobs.append(("ours_r4stream", lambda: qp.run_ours(
        UCML(total_users=qp.USERS, total_items=qp.ITEMS,
             dim_user_embed=qp.DIM, dim_item_embed=qp.DIM, margin=0.5),
        "pairwise", train_data, test_data, qp.make_inits(),
        iters=10000)))
    for key, fn in jobs:
        if key in ucml:
            qp._log(f"skip {key} (recorded)")
            continue
        qp._log(f"running {key}")
        ucml[key] = fn()
        out["UCML"] = ucml
        with open(qp.OUT_PATH, "w") as f:
            json.dump(out, f, indent=1)

    # spread across the SAME-STREAM reference replicas at 10k
    replicas = ["ref_dedup_r4stream"] + \
        [f"ref_dedup_fp_perturbed_s{k}" for k in range(2, 2 + N_EXTRA)]

    def at10k(run):
        for c in ucml[run]["curve"]:
            if c["iter"] == 10000:
                return c
        raise KeyError(run)

    spread = {}
    for m in METRICS:
        vals = [at10k(r)[m] for r in replicas]
        spread[m] = max(abs(a - b)
                        for a, b in itertools.combinations(vals, 2))
    ours = at10k("ours_r4stream")
    ref = at10k("ref_dedup_r4stream")
    delta_ours = {m: abs(ours[m] - ref[m]) for m in METRICS}
    summary = {
        "replicas": replicas,
        "stream": "r4 native sequential-window sampler (all runs)",
        "chaos_floor_max_pairwise_at_10k": spread,
        "ours_vs_ref_dedup_at_10k": delta_ours,
        "ours_inside_band": {m: delta_ours[m] <= spread[m]
                             for m in METRICS},
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "ucml_chaos_floor.json")
    with open(path, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()

"""Summarize benchmarks/quality_parity.json into judgeable deltas.

For every model and checkpoint: |ours - ref_dedup| (the decisive pair —
identical semantics, must be fp-small), |ref_keras3 - ref_dedup| (the
reference's own cross-version drift band), and where present the
seed-spread / fp-perturbation bands. Prints a markdown table; exits
nonzero if ours-vs-ref_dedup exceeds the fp control anywhere it exists.
"""

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def _by_iter(run):
    return {c["iter"]: c for c in run["curve"]}


def _delta(a, b, keys=("AUC", "Recall@50", "Recall@100")):
    return {k: abs(a[k] - b[k]) for k in keys if k in a and k in b}


def main(path=None):
    with open(path or os.path.join(HERE, "quality_parity.json")) as f:
        d = json.load(f)
    failures = []
    for model in [m for m in d if m != "config"]:
        runs = d[model]
        if "ours" not in runs or "ref_dedup" not in runs:
            continue
        ours, dedup = _by_iter(runs["ours"]), _by_iter(runs["ref_dedup"])
        k3 = _by_iter(runs["ref_keras3"]) if "ref_keras3" in runs else {}
        fp = (_by_iter(runs["ref_dedup_fp_perturbed"])
              if "ref_dedup_fp_perturbed" in runs else {})
        print(f"\n## {model}")
        print("| iter | AUC ours | |ours-dedup| | |keras3-dedup| "
              "| |fp-dedup| |")
        print("|---|---|---|---|---|")
        for it in sorted(ours):
            if it not in dedup:
                continue
            dv = _delta(ours[it], dedup[it])
            k3v = _delta(k3[it], dedup[it]) if it in k3 else None
            fpv = _delta(fp[it], dedup[it]) if it in fp else None

            def fmt(x):
                return "—" if x is None else f"{max(x.values()):.2e}"

            print(f"| {it} | {ours[it]['AUC']:.6f} | {fmt(dv)} "
                  f"| {fmt(k3v)} | {fmt(fpv)} |")
            # decisive criterion: ours tracks dedup at least as closely
            # as the fp-perturbed reference tracks itself (chaos floor),
            # with a small absolute slack for metric discreteness
            if fpv is not None:
                if max(dv.values()) > max(2 * max(fpv.values()), 2e-3):
                    failures.append((model, it, dv, fpv))
    if failures:
        print("\nFAILURES (ours-vs-dedup outside 2x fp band):")
        for f in failures:
            print(" ", f)
        return 1
    print("\nall decisive pairs within the fp-control band "
          "(or no control at that iter)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else None))

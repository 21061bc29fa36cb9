"""DLRM sparse-step roofline: is a Pallas gather/scatter kernel worth it?

VERDICT r2 #7 asks for a fused 26-table gather/scatter-grad kernel for
DLRM, OR a measurement showing the XLA sparse step is already at the
memory floor. This decomposes the production step (fused table +
O(batch) sparse Adam, training/sparse.py — 0.20-0.26 ms/step at batch
4096 in benchmarks/dlrm_throughput.json) into its parts on the real
chip:

  full         — the production sparse step (measured anew);
  dense_only   — identical MLPs/interaction/loss/opt but the embedding
                 lookup replaced by a constant [B, 26, D] tensor: the
                 step's MXU + dense-Adam floor, zero embedding work;
  sparse_only  — ONLY the embedding machinery (unique -> gather rows +
                 moments -> grad -> sparse Adam -> scatter) driven by a
                 trivial loss over the looked-up rows: the part a Pallas
                 kernel could possibly accelerate;
  floors       — analytic bytes/FLOP floors at v5e peaks (819 GB/s HBM,
                 ~49 TFLOP/s fp32 MXU) for both parts.

Each variant runs in its OWN subprocess: on this backend donation state
is process-global and fragile (docs/PERF_NOTES.md "donation poisoning"),
and a first single-process version of this harness measured sparse_only
at the no-donation whole-table-copy rate (60.8 ms = params+moments
6.5 GB at ~107 GB/s) purely from cross-variant contamination. Per-
variant processes also give each program a fresh allocator.

Decision rule: if sparse_only is a small fraction of full AND sits near
its own HBM floor, a kernel cannot move the step materially — record
the negative result in docs/PERF_NOTES.md. Run ALONE on the chip.
"""

import dataclasses
import json
import os
import subprocess

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

COUNTS = [1460, 583, 10131227, 2202608, 305, 24, 12517, 633, 3, 93145,
          5683, 8351593, 3194, 27, 14992, 5461306, 10, 5652, 2173, 4,
          7046547, 18, 15, 286181, 105, 142572]
B = 4096
D = 16
BOT, TOP = (512, 256, 64, 16), (512, 256, 1)
STEPS = 30
N_BATCH = 8          # distinct prestaged batches (identical-args rule)


def make_batches(n):
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    return [{
        "dense_features": jnp.asarray(
            rng.normal(size=(B, 13)).astype(np.float32)),
        "sparse_features": jnp.asarray(np.stack(
            [rng.integers(0, c, B) for c in COUNTS],
            axis=1).astype(np.int32)),
        "label": jnp.asarray(rng.integers(0, 2, B).astype(np.float32)),
    } for _ in range(n)]


def _time(fn, batches):
    import jax
    out = fn(batches[0])
    out = fn(batches[1 % len(batches)])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(STEPS):
        out = fn(batches[i % len(batches)])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / STEPS


def run_full():
    """The production sparse step."""
    import jax

    from openrec_tpu.models import DLRM
    from openrec_tpu.training.sparse import (
        dlrm_fused_table_spec, make_sparse_train_step)

    kw = dict(m_spa=D, ln_emb=tuple(COUNTS), ln_bot=BOT, ln_top=TOP,
              dim_dense=13, loss_func="bce")
    model = DLRM(fused_tables=True, **kw)
    params = model.init(jax.random.PRNGKey(0))
    init_fn, step_fn, _ = make_sparse_train_step(
        model, dlrm_fused_table_spec(model), learning_rate=1e-3)
    st = init_fn(params)
    state = {"p": params, "st": st}
    batches = make_batches(N_BATCH)

    def full(batch):
        state["p"], state["st"], loss = step_fn(
            state["p"], state["st"], batch, jax.random.PRNGKey(0))
        return loss

    return {"full_ms": round(_time(full, batches) * 1e3, 4)}


def run_dense_only():
    """Same MLPs/interaction/loss/opt, constant 'embeddings', donated."""
    import functools

    import jax
    import jax.numpy as jnp
    import optax

    from openrec_tpu.models import DLRM
    from openrec_tpu.training.optim import lazy_adam

    kw = dict(m_spa=D, ln_emb=tuple(COUNTS), ln_bot=BOT, ln_top=TOP,
              dim_dense=13, loss_func="bce")
    dmodel = DLRM(**kw)
    dparams = dmodel.init(jax.random.PRNGKey(0))
    dparams.pop("embed_tables")
    tx = lazy_adam(1e-3)
    dopt = tx.init(dparams)
    batches = make_batches(N_BATCH)
    # a device-RESIDENT argument, not a closure constant: on this
    # tunneled backend a [B, 26, D] (6.8MB) constant embedded in the
    # jitted program re-ships host->device per call (measured: it alone
    # inflated this variant 0.45 -> 2.4 ms/step)
    const_emb = jnp.asarray(
        np.random.default_rng(1).normal(size=(B, len(COUNTS), D))
        .astype(np.float32) * 0.05)
    for bt in batches:
        bt["emb"] = const_emb

    def dense_loss(p, batch):
        # DLRM.predict with the table path replaced by batch['emb']
        x = batch["dense_features"]
        mb = dmodel._mlp_bot
        dense_emb = mb.apply(p["mlp_bot"], x)
        feats = jnp.concatenate(
            [batch["emb"], dense_emb[:, None, :]], axis=1)
        dots = jnp.einsum("bnd,bmd->bnm", feats, feats)
        n = feats.shape[1]
        iu, ju = np.tril_indices(n, k=-1)
        inter = dots[:, iu, ju]
        top_in = jnp.concatenate([dense_emb, inter], axis=1)
        out = dmodel._mlp_top.apply(p["mlp_top"], top_in)
        pred = jax.nn.sigmoid(jnp.reshape(out, (-1,)))
        eps = 1e-7
        pclip = jnp.clip(pred, eps, 1 - eps)
        lab = batch["label"]
        return -jnp.mean(lab * jnp.log(pclip)
                         + (1 - lab) * jnp.log(1 - pclip))

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def dense_step(p, opt, batch):
        g = jax.grad(dense_loss)(p, batch)
        upd, opt = tx.update(g, opt, p)
        return optax.apply_updates(p, upd), opt

    dstate = {"p": dparams, "o": dopt}

    def dense_only(batch):
        dstate["p"], dstate["o"] = dense_step(dstate["p"], dstate["o"],
                                              batch)
        return dstate["p"]["mlp_top"][0]["w"]

    return {"dense_only_ms": round(_time(dense_only, batches) * 1e3, 4)}


def run_sparse_ab():
    """Same-process A/B of the dedup modes on the REAL production step
    (run-to-run variance on this backend is ±20-30%, so cross-process
    comparisons of sub-ms kernels are meaningless): flat → mixed → flat
    bracketing, one DLRM model + batches, fresh params per mode."""
    import jax

    from openrec_tpu.models import DLRM
    from openrec_tpu.training.sparse import (
        dlrm_fused_table_spec, make_sparse_train_step)

    kw = dict(m_spa=D, ln_emb=tuple(COUNTS), ln_bot=BOT, ln_top=TOP,
              dim_dense=13, loss_func="bce")
    model = DLRM(fused_tables=True, **kw)
    batches = make_batches(N_BATCH)
    out = {}
    import os as _os
    # r5 default: bracket the sort-free hash mode against flat twice
    # (the middle-slot allocator artifact means a single bracket is not
    # conclusive — PERF_NOTES r3). AB_MODES overrides, e.g.
    # AB_MODES=flat,mixed,flat for the r3 comparison.
    modes = _os.environ.get("AB_MODES", "flat,hash,flat,hash").split(",")
    seen = {}
    order = []
    for m in modes:
        seen[m] = seen.get(m, 0) + 1
        order.append((f"{m}{seen[m]}" if modes.count(m) > 1 else m, m))
    for tag, mode in order:
        params = model.init(jax.random.PRNGKey(0))
        init_fn, step_fn, _ = make_sparse_train_step(
            model, dlrm_fused_table_spec(model, mode=mode),
            learning_rate=1e-3)
        state = {"p": params, "st": init_fn(params)}
        del params

        def step(batch):
            state["p"], state["st"], loss = step_fn(
                state["p"], state["st"], batch, jax.random.PRNGKey(0))
            return loss

        out[f"ab_{tag}_ms"] = round(_time(step, batches) * 1e3, 4)
        del state
    return out


def run_sparse_only(variant="flat"):
    """Only the embedding machinery, via a trivial loss."""
    import jax

    import jax.numpy as jnp

    from openrec_tpu.models.base import Recommender
    from openrec_tpu.modules.embedding import embedding_lookup
    from openrec_tpu.training.sparse import make_sparse_train_step

    @dataclasses.dataclass(frozen=True)
    class EmbedOnly(Recommender):
        total_rows: int
        offsets: tuple

        def init(self, rng):
            return {"embed_fused": 0.01 * jax.random.normal(
                rng, (self.total_rows, D))}

        def flat_ids(self, sparse):
            return sparse + jnp.asarray(self.offsets, jnp.int32)[None, :]

        def loss(self, p, batch, rng=None):
            rows = embedding_lookup(
                p["embed_fused"],
                self.flat_ids(batch["sparse_features"]).reshape(-1))
            t = jnp.sum(rows * rows)
            return t, {"loss": t}

    offsets = np.concatenate([[0], np.cumsum(COUNTS)[:-1]])
    emodel = EmbedOnly(total_rows=int(sum(COUNTS)),
                       offsets=tuple(int(o) for o in offsets))
    eparams = emodel.init(jax.random.PRNGKey(0))
    # colu: hand the step the [B, T] id matrix -> per-column dedup
    # (26 batched 4096-sorts) instead of one 106k-id sort
    # hash: sort-free slot-table dedup (unique_hashed)
    if variant == "colu":
        from openrec_tpu.training.sparse import Columns
        spec = {"embed_fused":
                lambda batch: Columns(
                    emodel.flat_ids(batch["sparse_features"]))}
    elif variant == "hash":
        from openrec_tpu.training.sparse import Hashed
        spec = {"embed_fused":
                lambda batch: Hashed(emodel.flat_ids(
                    batch["sparse_features"]).reshape(-1))}
    else:
        spec = {"embed_fused":
                lambda batch: emodel.flat_ids(
                    batch["sparse_features"]).reshape(-1)}
    einit, estep, _ = make_sparse_train_step(emodel, spec,
                                             learning_rate=1e-3)
    est = einit(eparams)
    estate = {"p": eparams, "st": est}
    batches = make_batches(N_BATCH)

    def sparse_only(batch):
        estate["p"], estate["st"], loss = estep(
            estate["p"], estate["st"], batch, jax.random.PRNGKey(0))
        return loss

    key = ("sparse_only_ms" if variant == "flat"
           else f"sparse_only_{variant}_ms")
    return {key: round(_time(sparse_only, batches) * 1e3, 4)}


VARIANTS = {"full": run_full, "dense_only": run_dense_only,
            "sparse_only": lambda: run_sparse_only("flat"),
            "sparse_only_colu": lambda: run_sparse_only("colu"),
            "sparse_only_hash": lambda: run_sparse_only("hash"),
            "sparse_ab": run_sparse_ab}


def main():
    # ROOFLINE_ONLY=sparse_ab,sparse_only_hash reruns a subset and merges
    # into the existing JSON (remote compiles cost minutes per variant;
    # harnesses must be resumable — CLAUDE.md).
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "dlrm_sparse_roofline.json")
    only = os.environ.get("ROOFLINE_ONLY")
    results = {"config": {"batch": B, "m_spa": D, "bot": list(BOT),
                          "top": list(TOP),
                          "total_rows": int(sum(COUNTS))}}
    if only and os.path.exists(path):
        with open(path) as f:
            results.update(json.load(f))
    names = only.split(",") if only else list(VARIANTS)
    for name in names:
        t0 = time.time()
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), name],
            capture_output=True, text=True, timeout=3600)
        line = out.stdout.strip().splitlines()[-1] if out.stdout else ""
        try:
            results.update(json.loads(line))
        except Exception:
            print(f"[{name}] FAILED:\n{out.stdout[-2000:]}\n"
                  f"{out.stderr[-3000:]}", flush=True)
            raise
        print(f"[{name}] {line}  ({time.time() - t0:.0f}s incl compile)",
              flush=True)
        with open(path, "w") as f:      # incremental: survive drops
            json.dump(results, f, indent=2)

    dt_full = results["full_ms"]
    dt_dense = results["dense_only_ms"]
    dt_sparse = results["sparse_only_ms"]

    # ---- analytic floors (v5e: ~819 GB/s HBM, ~49 TFLOP/s fp32)
    ids = B * len(COUNTS)
    # rows + mu + nu gathered AND scattered, fp32 D-vectors
    sparse_bytes = ids * D * 4 * 3 * 2
    flops = 0
    dims = [13] + list(BOT)
    for a, b in zip(dims[:-1], dims[1:]):
        flops += 2 * B * a * b
    n = len(COUNTS) + 1
    flops += 2 * B * n * n * D            # interaction einsum
    top_in = BOT[-1] + n * (n - 1) // 2
    dims = [top_in] + list(TOP)
    for a, b in zip(dims[:-1], dims[1:]):
        flops += 2 * B * a * b
    flops *= 3                            # fwd + bwd (~2x fwd)
    results["floors"] = {
        "sparse_hbm_us": round(sparse_bytes / 819e9 * 1e6, 1),
        "dense_mxu_us_fp32": round(flops / 49e12 * 1e6, 1),
        "sparse_bytes_per_step": sparse_bytes,
        "dense_flops_per_step": int(flops),
    }
    results["verdict"] = {
        "sparse_fraction_of_full": round(dt_sparse / dt_full, 3),
        "sparse_over_hbm_floor": round(
            dt_sparse * 1e3 / max(results["floors"]["sparse_hbm_us"],
                                  1e-9), 2),
        "dense_plus_sparse_vs_full": round(
            (dt_dense + dt_sparse) / dt_full, 3),
        # Cross-process ratios: the sparse_only variants run in
        # separate subprocesses, where run-to-run variance is +-20-30%
        # at these sub-ms scales (module docstring). Indicative only;
        # the authoritative same-process bracket is `sparse_ab`.
        "colu_speedup_vs_flat_dedup_CROSS_PROCESS_INDICATIVE": round(
            dt_sparse / results["sparse_only_colu_ms"], 3)
        if "sparse_only_colu_ms" in results else None,
        "hash_speedup_vs_flat_dedup_CROSS_PROCESS_INDICATIVE": round(
            dt_sparse / results["sparse_only_hash_ms"], 3)
        if "sparse_only_hash_ms" in results else None,
    }
    print(json.dumps(results, indent=2))
    with open(path, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        print(json.dumps(VARIANTS[sys.argv[1]]()))
    else:
        main()

"""Benchmark: BPR-CiteULike training throughput (examples/s).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "examples/s", "vs_baseline": N}

Workload = the reference's headline config (tf2_examples/bpr_citeulike.py:
12-15): BPR, 5,551 users x 16,980 items, dim_embed=50, batch=1000, Adam.
Interactions are synthetic at CiteULike scale (the real dataset isn't
bundled with the reference either; throughput is data-independent).

`value` is the fastest LIVE end-to-end rate: on-device rejection
sampling fused with the K-step train program, every batch sampled fresh
inside the timed loop (no pre-staging; the host sends one RNG key per
dispatch). `modes` additionally reports `live` (host C++ sampler inside
the timed loop, double-buffered host->device, fused K-step dispatches
through the PUBLIC Trainer.train(feed='flat') path) and `prestaged`
(staged host batches, transfer-bound feed: the feeder runs outside the
timed region but every batch still crosses host->device inside it —
bound by the per-dispatch transfer, NOT a device-step measure; the
device mode is ~9x faster with sampling included, BENCH_r04).

vs_baseline: measured against a faithful TF/Keras re-statement of the
reference's train step (Embedding lookups + GradientTape + keras Adam —
exactly what tf2_examples/bpr_citeulike.py:33-39 executes) on this
machine's CPU, cached in BENCH_BASELINE.json after first measurement.
"""

import json
import os

# Persistent compilation cache: repeat runs skip the (minutes-long)
# remote compiles.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, "BENCH_BASELINE.json")

USERS, ITEMS, DIM, BATCH = 5551, 16980, 50, 1000
WARMUP_STEPS, MEASURE_STEPS = 20, 4000


def synth_interactions(n=204057, seed=0):
    rng = np.random.default_rng(seed)
    users = rng.integers(0, USERS, size=n).astype(np.int32)
    items = rng.integers(0, ITEMS, size=n).astype(np.int32)
    data = np.zeros(n, dtype=[("user_id", np.int32), ("item_id", np.int32)])
    data["user_id"], data["item_id"] = users, items
    return data


def _measure_device_path(steps_per_call):
    """On-device sampling fused with the train step
    (Trainer.train_steps_device): zero host work per step."""
    import jax

    from openrec_tpu.data import InteractionStore
    from openrec_tpu.data.device_sampler import DevicePairwiseSampler
    from openrec_tpu.models import BPR
    from openrec_tpu.training import Trainer

    store = InteractionStore(synth_interactions(), USERS, ITEMS, seed=0)
    model = BPR(total_users=USERS, total_items=ITEMS, dim_user_embed=DIM,
                dim_item_embed=DIM)
    tr = Trainer(model, lr=1e-3, seed=0)
    sampler = DevicePairwiseSampler(store, batch_size=BATCH)

    tr.train_steps_device(sampler, steps_per_call)   # compile + warm
    tr.train_steps_device(sampler, steps_per_call)
    jax.block_until_ready(tr.params)

    t0 = time.perf_counter()
    n_calls = max(1, MEASURE_STEPS // steps_per_call)
    for _ in range(n_calls):
        tr.train_steps_device(sampler, steps_per_call)
    jax.block_until_ready(tr.params)
    dt = time.perf_counter() - t0
    return n_calls * steps_per_call * BATCH / dt


def _measure_host_paths(steps_per_call):
    """Host-side sampling (reference-exact semantics) + fused multi-step
    dispatch (Trainer.train_step_multi_flat), measured in BOTH feed modes
    sharing one compiled program:

    - prestaged: flat batches sampled before the timed region (samplers
      are deterministic seeded streams, so sampling an epoch ahead is a
      real supported feed mode) — the timed region is the serial
      host->device batch transfer + device step per dispatch. This is
      TRANSFER-BOUND, not a device-step measure: the device mode (which
      never transfers batches) runs ~9x faster WITH sampling included.
    - live: a 2-worker threaded Prefetcher samples INSIDE the timed
      loop, feeding the PUBLIC `Trainer.train(steps_per_call=k,
      feed='flat')` path (double-buffered device_iterator + fused
      dispatches inside train()) — true end-to-end throughput of the
      documented API on this 2-vCPU host (the feeder is the ceiling
      here; its standalone rate is benchmarks/feeder_rate.py).

    Returns (prestaged, live) examples/s.
    """
    import jax

    from openrec_tpu.data import InteractionStore, Prefetcher
    from openrec_tpu.data.samplers import PairwiseSampler
    from openrec_tpu.models import BPR
    from openrec_tpu.training import Trainer

    store = InteractionStore(synth_interactions(), USERS, ITEMS, seed=0)
    model = BPR(total_users=USERS, total_items=ITEMS, dim_user_embed=DIM,
                dim_item_embed=DIM)
    tr = Trainer(model, lr=1e-3, seed=0)
    # One flat sampler call per dispatch (k·B examples).
    flat_sampler = PairwiseSampler(store, batch_size=steps_per_call * BATCH,
                                   seed=0)
    it = iter(flat_sampler)
    n_calls = max(1, MEASURE_STEPS // steps_per_call)
    # Distinct batches per call (identical-args dispatch loops give
    # async-dispatch artifacts on this backend — CLAUDE.md).
    staged = [next(it) for _ in range(n_calls)]

    tr.train_step_multi_flat(staged[0], steps_per_call)
    tr.train_step_multi_flat(staged[1 % n_calls], steps_per_call)
    jax.block_until_ready(tr.params)

    # Best of 5 trials: the dispatch thread still shares the 2 vCPUs with
    # whatever else runs on the host, so single-trial numbers can be
    # noisy; the best trial is stable.
    prestaged = 0.0
    for _ in range(5):
        t0 = time.perf_counter()
        for b in staged:
            tr.train_step_multi_flat(b, steps_per_call)
        jax.block_until_ready(tr.params)
        dt = time.perf_counter() - t0
        prestaged = max(prestaged, n_calls * steps_per_call * BATCH / dt)

    # Live feeder: same compiled program, batches produced concurrently
    # by the Prefetcher while previous dispatches run, fed through the
    # PUBLIC API — Trainer.train(feed='flat') reshapes each [k*B] flat
    # batch to [k, B] (zero-copy) and double-buffers the host->device
    # copies through device_iterator internally, so the transfer of call
    # i+1 overlaps the device steps of call i (the r4 bench drove
    # tr._dispatch_multi directly; VERDICT r4 #3 made this path public).
    n_workers = int(os.environ.get("OPENREC_BENCH_FEED_WORKERS", "2"))
    feeder = Prefetcher(flat_sampler, num_workers=n_workers, capacity=4)
    fit = iter(feeder)
    next(fit)  # warm the worker threads
    live = 0.0
    trial_iter = n_calls * steps_per_call
    try:
        for _ in range(3):
            t0 = time.perf_counter()
            tr.train(total_iter=trial_iter, train_batches=fit,
                     steps_per_call=steps_per_call, feed="flat",
                     defer_metrics=True, verbose=False)
            jax.block_until_ready(tr.params)
            dt = time.perf_counter() - t0
            live = max(live, trial_iter * BATCH / dt)
    finally:
        feeder.stop()
    return prestaged, live


def measure_ours(steps_per_call=None):
    """All three supported feed modes (same per-step math as the
    reference loop: uniform positive record + rejection-sampled negative,
    BPR loss + l2, Adam with sparse embedding semantics):
    prestaged / live (host-sampled) and device (on-device sampling).
    Returns a dict of examples/s. OPENREC_BENCH_SKIP_DEVICE=1 skips the
    device path (it adds its own multi-minute remote compile)."""
    if steps_per_call is None:
        # 400 fused steps per dispatch: the r4 grid (k in {200,400} x
        # workers in {2,3}) put k=400/w=2 on top for BOTH host modes
        # (live 55.4M vs 45.5M at k=200; prestaged 91.9M vs 61.3M in the
        # same process) — deeper fusion amortizes the dispatch RTT and
        # halves the feeder's per-call overhead.
        steps_per_call = int(os.environ.get("OPENREC_BENCH_STEPS_PER_CALL",
                                            "400"))
    prestaged, live = _measure_host_paths(steps_per_call)
    modes = {"prestaged": prestaged, "live": live}
    if os.environ.get("OPENREC_BENCH_SKIP_DEVICE") != "1":
        modes["device"] = _measure_device_path(steps_per_call)
    print("  ".join(f"{k}: {v:.0f} ex/s" for k, v in modes.items()),
          file=sys.stderr)
    return modes


def measure_tf_reference():
    """Reference-equivalent TF/Keras BPR train step (CPU)."""
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    import tensorflow as tf

    user_lf = tf.keras.layers.Embedding(USERS, DIM,
                                        embeddings_initializer="uniform")
    item_lf = tf.keras.layers.Embedding(ITEMS, DIM,
                                        embeddings_initializer="uniform")
    item_bias = tf.keras.layers.Embedding(ITEMS, 1,
                                          embeddings_initializer="zeros")
    opt = tf.keras.optimizers.Adam()
    variables = None

    @tf.function
    def train_step(user_id, p_item_id, n_item_id):
        with tf.GradientTape() as tape:
            u = user_lf(user_id)
            pv, nv = item_lf(p_item_id), item_lf(n_item_id)
            pb, nb = item_bias(p_item_id), item_bias(n_item_id)
            pos = tf.reduce_sum(u * pv, axis=1, keepdims=True) + pb
            neg = tf.reduce_sum(u * nv, axis=1, keepdims=True) + nb
            loss = -tf.reduce_mean(
                tf.math.log_sigmoid(tf.maximum(pos - neg, -30.0)))
            l2 = (tf.nn.l2_loss(u) + tf.nn.l2_loss(pv) + tf.nn.l2_loss(nv))
            total = loss + l2
        grads = tape.gradient(total, tape.watched_variables())
        opt.apply_gradients(zip(grads, tape.watched_variables()))
        return loss

    rng = np.random.default_rng(0)

    def batch():
        return (tf.constant(rng.integers(0, USERS, BATCH), tf.int32),
                tf.constant(rng.integers(0, ITEMS, BATCH), tf.int32),
                tf.constant(rng.integers(0, ITEMS, BATCH), tf.int32))

    for _ in range(5):
        train_step(*batch())
    t0 = time.perf_counter()
    steps = 50
    for _ in range(steps):
        train_step(*batch())
    dt = time.perf_counter() - t0
    return steps * BATCH / dt


def get_baseline():
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["examples_per_s"]
    try:
        val = measure_tf_reference()
    except Exception as e:  # TF missing/broken: fall back to recorded value
        print(f"baseline measurement failed: {e}", file=sys.stderr)
        return None
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"examples_per_s": val,
                   "config": "reference tf2 BPR train step, TF CPU",
                   "batch": BATCH, "dim": DIM}, f)
    return val


def main():
    baseline = get_baseline()
    modes = measure_ours()
    # Headline = the fastest LIVE end-to-end rate: every batch is
    # sampled DURING the timed loop (no pre-staging anywhere). That is
    # the `device` mode — on-device rejection sampling feeding the
    # fused K-step train program; the host only sends one RNG key per
    # `steps_per_call` steps (the production recommendation,
    # docs/PERF_NOTES.md). `live` is the host-C++-sampled end-to-end
    # rate (feeder inside the timed loop on this 2-vCPU host, through
    # the public Trainer.train(feed='flat')), `prestaged` the staged-
    # host-batch transfer-bound feed (feeder outside the timed region;
    # bound by the per-dispatch host->device copy, NOT the device step).
    # The metric string must describe whichever mode the value actually
    # is (OPENREC_BENCH_SKIP_DEVICE=1 falls back to the host-fed live
    # rate).
    if "device" in modes:
        ours = modes["device"]
        headline_mode = "device"
        desc = ("end-to-end with ON-DEVICE sampling inside the timed "
                "loop — fresh rejection-sampled batch every step, no "
                "pre-staging")
    else:
        ours = modes["live"]
        headline_mode = "live"
        desc = ("LIVE end-to-end, host C++ sampling inside the timed "
                "loop (device mode skipped)")
    vs = ours / baseline if baseline else 0.0
    print(json.dumps({
        "metric": f"examples/s (BPR-CiteULike dim50 batch1000, {desc}; "
                  "`modes.live` = host-C++-sampled end-to-end via "
                  "Trainer.train(feed='flat'), `modes.prestaged` = "
                  "staged host batches, transfer-bound feed)",
        "value": round(ours, 1),
        "unit": "examples/s",
        "vs_baseline": round(vs, 3),
        # which `modes` entry `value` is — artifact diffing tools can
        # detect a headline-semantic change programmatically (ADVICE r4)
        "headline_mode": headline_mode,
        "modes": {k: round(v, 1) for k, v in modes.items()},
        "modes_vs_baseline": {k: round(v / baseline, 3) if baseline else 0.0
                              for k, v in modes.items()},
    }))


if __name__ == "__main__":
    main()

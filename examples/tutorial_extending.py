"""Executable walkthrough: EXTENDING the framework with your own model —
the runnable mirror of the reference's model-customization tutorials
(tf1_tutorials/*.ipynb "build your own recommender" and the `.extend()`
mechanism of the macro DSL, reference recommender.py:83-100, whose
canonical use is BPR → VBPR, vbpr.py:6-58).

Where the reference extends models by registering extra subgraphs and
re-wiring ports, here a model is a frozen dataclass with four pure
functions — extension is ordinary subclassing/composition:

  Part 1 — add a feature pathway: BPR → a mini visual-BPR in ~25 lines
           (override init/loss/score; reuse the parent's math).
  Part 2 — post_step projection hooks: a hinge variant with norm
           censoring (what the reference does with post-training ops
           under control_dependencies, legacy recommender.py:630-638).
  Part 3 — grad_transform: per-subtree gradient rescaling (the legacy
           `_grad_post_processing` hook, recommender.py:601-616).

Run top to bottom: `python examples/tutorial_extending.py`.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from openrec_tpu import Dataset, Trainer
from openrec_tpu.models import BPR
from openrec_tpu.modules.embedding import censor_norm, embedding_lookup
from openrec_tpu.modules.losses import pairwise_log_loss

_SMALL = os.environ.get("OPENREC_EXAMPLE_SMALL") == "1"
total_users, total_items = (60, 300) if _SMALL else (300, 2000)
dim = 16
total_iter = int(os.environ.get("OPENREC_EXAMPLE_ITERS", 2000))
eval_interval = int(os.environ.get("OPENREC_EXAMPLE_EVAL_INTERVAL",
                                   total_iter // 2))

# planted low-rank interactions so AUC visibly rises
rng = np.random.default_rng(0)
U = rng.normal(size=(total_users, 8)).astype(np.float32)
V = rng.normal(size=(total_items, 8)).astype(np.float32)
top = np.argsort(-(U @ V.T), axis=1)[:, :20]
rows = [(u, i) for u in range(total_users) for i in top[u]]
data = np.array(rows, dtype=[("user_id", np.int32),
                             ("item_id", np.int32)])
rng.shuffle(data)
split = int(len(data) * 0.8)
train = Dataset(data[:split], total_users, total_items, seed=0)
test = Dataset(data[split:], total_users, total_items, seed=0)

# item "visual" features correlated with the planted structure
visual = (V + 0.3 * rng.normal(size=V.shape)).astype(np.float32)

# ------------------------------------------------------------- Part 1 #
# The reference's VBPR extends BPR by adding a visual subgraph and
# re-wiring the item port (`bpr.extend(itemgraph=...)`). Here: subclass,
# append the projected feature to the item vector, done. The Trainer,
# samplers, eval, checkpointing all work unchanged because they only
# see init/loss/score.


@dataclasses.dataclass(frozen=True)
class MiniVisualBPR(BPR):
    dim_visual_embed: int = 8

    def init(self, rng_):
        params = super().init(rng_)
        r = jax.random.fold_in(rng_, 7)
        params["visual_proj"] = 0.1 * jax.random.normal(
            r, (visual.shape[1], self.dim_visual_embed))
        return params

    def _item_vecs(self, params, item_id):
        latent = embedding_lookup(params["item_embed"], item_id)
        vis = jnp.asarray(visual)[item_id] @ params["visual_proj"]
        return jnp.concatenate([latent, vis], axis=-1)

    def loss(self, params, batch, rng_=None):
        # user dim must match the wider item vector
        user_vec = embedding_lookup(params["user_embed"],
                                    batch["user_id"])
        p_vec = self._item_vecs(params, batch["p_item_id"])
        n_vec = self._item_vecs(params, batch["n_item_id"])
        p_b = embedding_lookup(params["item_bias"], batch["p_item_id"])
        n_b = embedding_lookup(params["item_bias"], batch["n_item_id"])
        task = pairwise_log_loss(user_vec, p_vec, n_vec, p_b, n_b)
        return task, {"loss": task}

    def score(self, params, batch):
        user_vec = embedding_lookup(params["user_embed"],
                                    batch["user_id"])
        all_items = jnp.concatenate(
            [params["item_embed"],
             jnp.asarray(visual) @ params["visual_proj"]], axis=-1)
        return user_vec @ all_items.T \
            + jnp.reshape(params["item_bias"], (-1,))


model = MiniVisualBPR(total_users=total_users, total_items=total_items,
                      dim_user_embed=dim + 8, dim_item_embed=dim,
                      l2_weight=0.0)
tr = Trainer(model, lr=0.02, seed=0)
print("== Part 1: MiniVisualBPR (BPR + feature pathway by subclassing)")
tr.train(total_iter=total_iter,
         train_batches=train.pairwise(batch_size=256,
                                      num_parallel_calls=1),
         eval_samplers={"test": test.evaluation(
             batch_size=128, excl_datasets=[train])},
         eval_interval=eval_interval, at=(10, 50))

# ------------------------------------------------------------- Part 2 #
# post_step: a pure params -> params projection applied after every
# optimizer step inside the SAME jitted program — the functional form of
# the reference's censor ops (ucml_citeulike.py:28-34 runs
# operations_id='censor_embedding' after each train call).


@dataclasses.dataclass(frozen=True)
class CensoredBPR(BPR):
    def post_step(self, params, batch):
        ids = jnp.concatenate([batch["p_item_id"], batch["n_item_id"]])
        return dict(params, item_embed=censor_norm(
            params["item_embed"], ids))


model2 = CensoredBPR(total_users=total_users, total_items=total_items,
                     dim_user_embed=dim, dim_item_embed=dim,
                     l2_weight=0.0)
tr2 = Trainer(model2, lr=0.05, seed=0)
print("== Part 2: CensoredBPR (post_step norm projection)")
tr2.train(total_iter=total_iter,
          train_batches=train.pairwise(batch_size=256,
                                       num_parallel_calls=1),
          eval_samplers={"test": test.evaluation(
              batch_size=128, excl_datasets=[train])},
          eval_interval=eval_interval, at=(10, 50))
norms = np.linalg.norm(np.asarray(tr2.params["item_embed"]), axis=1)
print(f"   max item-embedding norm after censoring: {norms.max():.3f} "
      "(<= 1 + eps)")

# ------------------------------------------------------------- Part 3 #
# grad_transform: rescale a parameter subtree's gradients before the
# optimizer — the legacy `_grad_post_processing` hook (VisualBPR divides
# its visual-MLP grads by the batch size, visual_bpr.py:74-82).


@dataclasses.dataclass(frozen=True)
class RescaledVisualBPR(MiniVisualBPR):
    def grad_transform(self, grads, batch):
        b = batch["p_item_id"].shape[0]
        grads = dict(grads)
        grads["visual_proj"] = grads["visual_proj"] / b
        return grads


model3 = RescaledVisualBPR(
    total_users=total_users, total_items=total_items,
    dim_user_embed=dim + 8, dim_item_embed=dim, l2_weight=0.0)
tr3 = Trainer(model3, lr=0.02, seed=0)
print("== Part 3: grad_transform (visual grads scaled by 1/batch)")
tr3.train(total_iter=total_iter,
          train_batches=train.pairwise(batch_size=256,
                                       num_parallel_calls=1),
          eval_samplers={"test": test.evaluation(
              batch_size=128, excl_datasets=[train])},
          eval_interval=eval_interval, at=(10, 50))

print("done — three extensions, zero framework changes: the harness "
      "only ever sees init/loss/score/post_step/grad_transform.")

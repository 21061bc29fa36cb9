"""Device mesh construction and sharding rules.

The reference has NO distribution layer (SURVEY.md §2.9 — grep-verified:
no tf.distribute/NCCL/MPI anywhere); this subsystem is designed from the
workload's needs:

  axes: 'data'  — batch dimension (DP); gradients psum over it (XLA inserts
                  the collective from sharding annotations).
        'model' — embedding-row dimension (the catalog axis, the only axis
                  that grows unboundedly in this domain, SURVEY.md §5.7);
                  tables shard rows here, lookups exchange over ICI.

Multi-host: jax.distributed.initialize() gives a global device list; the
same mesh code lays 'data' across DCN (hosts) and 'model' across ICI
(within-host chips) because mesh axes are laid out major-to-minor over the
device list.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: Optional[int] = None, model: int = 1, devices=None
              ) -> Mesh:
    """Mesh over available devices; data axis absorbs the remainder."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim across 'data', replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Shard rows (dim 0) across 'model' — embedding tables."""
    return NamedSharding(mesh, P(MODEL_AXIS, None))


def match_partition_rules(rules: Sequence, params, mesh: Mesh):
    """Map each param leaf to a NamedSharding via regex rules over its
    tree path (first match wins; scalars replicate). rules entries:
    (pattern, PartitionSpec)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)

    def path_name(path):
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
            elif hasattr(p, "name"):
                parts.append(str(p.name))
        return "/".join(parts)

    out = []
    for path, leaf in flat:
        name = path_name(path)
        if np.ndim(leaf) == 0 or np.size(leaf) == 1:
            out.append(NamedSharding(mesh, P()))
            continue
        spec = P()
        for pattern, ps in rules:
            if re.search(pattern, name):
                spec = ps
                break
        out.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, out)


# Default rules: shard every embedding table's rows over 'model', replicate
# dense towers. Works for the whole zoo (tables are named *_embed /
# embed_tables / out_weight).
DEFAULT_RULES = (
    (r"(item_embed|user_embed|embed_tables/\d+|embed_fused|out_weight"
     r"|item_bias)", P(MODEL_AXIS, None)),
    (r"out_bias", P(MODEL_AXIS)),
)


def shard_params(params, mesh: Mesh, rules=DEFAULT_RULES):
    """device_put params according to rules; returns (params, shardings)."""
    shardings = match_partition_rules(rules, params, mesh)
    placed = jax.tree_util.tree_map(jax.device_put, params, shardings)
    return placed, shardings


def initialize_multihost(coordinator_address=None, num_processes=None,
                         process_id=None):
    """Join a multi-host (DCN) training job, then build meshes as usual —
    jax.devices() becomes the global device list and 'data' lays out
    across hosts (major axis) while 'model' stays within-host (ICI).

    On TPU pods with standard env metadata all arguments are inferred;
    pass them explicitly for manual (e.g. localhost multi-process) setups.
    """
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_index(), jax.process_count()

"""openrec_tpu — a TPU-native recommender-systems framework.

A from-scratch JAX/XLA/Pallas re-design with the full capability surface of
OpenRec (ylongqi/openrec): modular model zoo, negative-sampling data pipelines,
full-catalog ranking evaluation, checkpoint/resume, cached-embedding serving,
plus TPU-native distribution (mesh data parallelism + row-sharded embedding
tables) that the reference never had.

Design (vs. reference /root/reference/openrec):
  - One params pytree + pure jitted functions replace dual tf.Graph/Session
    machinery (reference openrec/tf1/recommenders/recommender.py:297-506).
  - Vectorized numpy samplers + threaded prefetch replace multiprocessing
    generators (reference openrec/tf2/data/utils.py:164-214).
  - vmapped on-device ranking metrics replace tf.map_fn loops (reference
    openrec/tf2/metrics/ranking_metrics.py:8-69).
"""

__version__ = "0.1.0"

from openrec_tpu.data import Dataset, InteractionStore
from openrec_tpu.training import ParallelTrainer, Trainer

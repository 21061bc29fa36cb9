from openrec_tpu.data.store import InteractionStore
from openrec_tpu.data.dataset import Dataset
from openrec_tpu.data.pipeline import (
    Prefetcher, ShuffledArrayLoader, device_iterator, to_device)
from openrec_tpu.data.samplers import (
    BatchSampler,
    EvaluationSampler,
    ExplicitSampler,
    FeatureJoinedSampler,
    NPairwiseSampler,
    PairwiseSampler,
    PerPosStratifiedPointwiseSampler,
    RandomPointwiseSampler,
    StratifiedPointwiseSampler,
    TemporalEvaluationSampler,
    TemporalSampler,
)

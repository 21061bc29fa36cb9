from openrec_tpu.data.store import InteractionStore
from openrec_tpu.data.dataset import Dataset
from openrec_tpu.data.pipeline import (
    Prefetcher, ShuffledArrayLoader, device_iterator, to_device)
from openrec_tpu.data.device_sampler import (
    DevicePairwiseSampler, DevicePointwiseSampler, DeviceTemporalSampler)
from openrec_tpu.data.samplers import (
    BatchSampler,
    EvaluationSampler,
    RegressionEvalSampler,
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

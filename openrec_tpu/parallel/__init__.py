from openrec_tpu.parallel.mesh import (
    DATA_AXIS, DEFAULT_RULES, MODEL_AXIS, batch_sharding, make_mesh,
    match_partition_rules, replicated, row_sharding, shard_params)
from openrec_tpu.parallel.train import (
    make_parallel_device_sparse_train_step, make_parallel_device_train_step,
    make_parallel_eval_step, make_parallel_sparse_train_step,
    make_parallel_train_step)
from openrec_tpu.parallel.embedding import (
    pad_rows, sharded_lookup, sharded_pallas_topk, sharded_scores,
    sharded_topk)
from openrec_tpu.parallel.bucketed import (
    alltoall_lookup, bucket_batch, bucket_batch_2d, bucket_ids,
    gathered_lookup)
from openrec_tpu.parallel.metrics import (
    sharded_dot_eval_metrics, sharded_eval_metrics)
from openrec_tpu.parallel import checkpoint as sharded_checkpoint

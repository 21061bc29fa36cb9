from openrec_tpu.ops.topk import fused_score_topk, topk_approx, topk_xla
from openrec_tpu.ops.bucketed_topk import (
    bucket_max_scores, pallas_score_topk)

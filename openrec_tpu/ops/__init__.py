from openrec_tpu.ops.topk import fused_score_topk, topk_approx, topk_xla
